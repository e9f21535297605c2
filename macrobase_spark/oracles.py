"""DuckDB oracle SQL for each queries() entry in __spark_entry__.py.

Each statement runs against pre-registered views (region nation customer
supplier part orders lineitem events documents embeddings) and must match
the Spark result on column names, row count, and order-insensitive value
hash. Mirrors the exact formula + rounding of the Spark side.

Composite queries (round-3 restructure so all 50 gates fit the driver's
correctness window) union/join the same per-operator SQL the round-2
oracles used — each leg is unchanged semantics, only the projection is
shared.
"""

TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

ORACLES: dict[str, str] = {}

ORACLES["q01_scan_filter_topk"] = """
SELECT l_orderkey, l_quantity, l_extendedprice AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05 AND l_quantity < 10
ORDER BY l_orderkey, price, l_quantity
LIMIT 500
"""

ORACLES["q02_agg_groupby"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q03_join_inner_semi_anti"] = """
WITH inner_a AS (
  SELECT c_mktsegment, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
),
semi_a AS (
  SELECT c_mktsegment, COUNT(*) AS n_big_cust
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 100000)
  GROUP BY c_mktsegment
),
anti_a AS (
  SELECT c_mktsegment, COUNT(*) AS n_no_orders
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
),
base AS (SELECT DISTINCT c_mktsegment FROM customer)
SELECT base.c_mktsegment,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, 0.0) AS revenue,
       COALESCE(n_big_cust, 0) AS n_big_cust,
       COALESCE(n_no_orders, 0) AS n_no_orders
FROM base
LEFT JOIN inner_a USING (c_mktsegment)
LEFT JOIN semi_a USING (c_mktsegment)
LEFT JOIN anti_a USING (c_mktsegment)
ORDER BY c_mktsegment
"""

ORACLES["q04_join_outer_natural"] = """
WITH big AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
             GROUP BY o_custkey HAVING COUNT(*) >= 12),
geo AS (SELECT n_nationkey, n_name AS nation, r_name AS region
        FROM nation JOIN region ON n_regionkey = r_regionkey),
rich AS (SELECT c_custkey, c_acctbal, nation, region
         FROM customer JOIN geo ON c_nationkey = n_nationkey
         WHERE c_acctbal > 9000)
SELECT COALESCE(o_custkey, c_custkey) AS custkey,
       COALESCE(n_orders, 0) AS n_orders,
       ROUND(COALESCE(c_acctbal, 0.0), 2) AS acctbal,
       COALESCE(nation, 'none') AS nation,
       COALESCE(region, 'none') AS region
FROM big FULL OUTER JOIN rich ON o_custkey = c_custkey
ORDER BY custkey
"""

ORACLES["q05_set_ops"] = """
WITH inter AS (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 1000
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bag AS (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT ALL
  SELECT c_nationkey FROM customer
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 0
),
uni AS (
  SELECT DISTINCT c_nationkey FROM (
    SELECT c_nationkey FROM customer WHERE c_acctbal < 100
    UNION ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
  )
),
counted AS (
  SELECT c_nationkey, COUNT(*) AS n
  FROM bag WHERE c_nationkey IN (SELECT c_nationkey FROM inter)
  GROUP BY c_nationkey
)
SELECT counted.c_nationkey, n,
       COALESCE(u.in_union, 0) AS in_poor_or_machinery
FROM counted
LEFT JOIN (SELECT c_nationkey, 1 AS in_union FROM uni) u USING (c_nationkey)
ORDER BY c_nationkey
"""

ORACLES["q06_window_rank_moving_avg"] = """
SELECT user_id, event_id, rk, mov_avg FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk,
         ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
           AS mov_avg
  FROM events WHERE user_id < 5
) WHERE rk <= 5
ORDER BY user_id, rk
"""

ORACLES["q07_rollup"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

ORACLES["q08_classifiers"] = """
WITH cut AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
         quantile_cont(l_extendedprice, 0.99) AS hi
  FROM lineitem
)
SELECT 'percentile' AS classifier, l_returnflag AS "key",
       CAST(SUM(CASE WHEN l_extendedprice > (SELECT hi FROM cut)
                      OR l_extendedprice < (SELECT lo FROM cut)
                THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
       COUNT(*) AS total
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'predicate' AS classifier, CAST(user_id AS VARCHAR) AS "key",
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS outliers,
       COUNT(*) AS total
FROM events GROUP BY user_id
HAVING SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0
UNION ALL
SELECT 'raw' AS classifier, o_orderpriority AS "key",
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS BIGINT)
         AS outliers,
       COUNT(*) AS total
FROM orders GROUP BY o_orderpriority
ORDER BY classifier, "key"
"""

ORACLES["q09_count_mean_shift"] = """
WITH agg AS (
  SELECT user_id % 10 AS cohort,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS oc,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 0.0 ELSE 1.0 END) AS DOUBLE) AS ic,
         ROUND(SUM(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END), 4) AS oms,
         ROUND(SUM(CASE WHEN event_type = 'error' THEN 0.0 ELSE value END), 4) AS ims
  FROM events GROUP BY user_id % 10
)
SELECT cohort, oc, ic, oms, ims,
       ROUND((oms / oc) / (ims / ic), 6) AS mean_shift
FROM agg ORDER BY cohort
"""

ORACLES["q10_mad_zscore"] = """
WITH med AS (SELECT quantile_cont(l_extendedprice, 0.5) AS m FROM lineitem),
     mad AS (SELECT quantile_cont(ABS(l_extendedprice - (SELECT m FROM med)), 0.5) AS d
             FROM lineitem),
     zs AS (SELECT AVG(value) AS m, stddev_pop(value) AS sd FROM events)
SELECT 'mad' AS scorer, l_returnflag AS "key",
       CAST(SUM(CASE WHEN ABS(l_extendedprice - (SELECT m FROM med))
                          / ((SELECT d FROM mad) * 1.4826) > 3.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'zscore' AS scorer, event_type AS "key",
       CAST(SUM(CASE WHEN ABS((value - (SELECT m FROM zs)) / (SELECT sd FROM zs)) > 2.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM events GROUP BY event_type
ORDER BY scorer, "key"
"""

ORACLES["q11_percentile_normalize_udf"] = """
WITH s AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
p AS (
  SELECT o_orderpriority,
         CAST(RANK() OVER (ORDER BY o_totalprice ASC) AS DOUBLE)
           / COUNT(*) OVER () AS pct,
         (o_totalprice + CASE WHEN (SELECT lo FROM s) <= 0
                              THEN -(SELECT lo FROM s) ELSE 0 END)
         / ((SELECT hi FROM s) + CASE WHEN (SELECT lo FROM s) <= 0
                                      THEN -(SELECT lo FROM s) ELSE 0 END) AS norm
  FROM orders
)
SELECT o_orderpriority, ROUND(AVG(pct), 9) AS avg_pct,
       ROUND(AVG(norm), 9) AS avg_norm
FROM p GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["q12_winsorize"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
                    quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem)
SELECT l_returnflag,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, (SELECT lo FROM cut)),
                                 (SELECT hi FROM cut)) AS DECIMAL(18,4)))
                  AS DOUBLE), 2) AS sum_wins
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

ORACLES["q13_diff_ratios"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem),
lab1 AS (SELECT l_returnflag, l_linestatus,
                CASE WHEN l_extendedprice > (SELECT hi FROM cut) THEN 1.0 ELSE 0.0 END AS o
         FROM lineitem),
g1 AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab1),
gs1 AS (SELECT l_returnflag, l_linestatus, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
        FROM lab1 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                          (l_returnflag, l_linestatus))),
leg1 AS (
  SELECT 'global_ratio' AS metric,
         array_to_string(list_sort(list_filter(
           ['l_returnflag=' || l_returnflag, 'l_linestatus=' || l_linestatus],
           x -> x IS NOT NULL)), ',') AS attrs,
         ROUND(oc / g1.g_out, 6) AS support,
         ROUND((oc / tc) / (g1.g_out / g1.g_tot), 6) AS ratio,
         CAST(oc AS BIGINT) AS outlier_count,
         CAST(tc AS BIGINT) AS total_count
  FROM gs1, g1 WHERE oc / g1.g_out >= 0.01
),
lab2 AS (SELECT CAST(user_id % 5 AS VARCHAR) AS cohort,
                CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS o
         FROM events),
g2 AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab2),
gs2 AS (SELECT cohort, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
        FROM lab2 GROUP BY cohort),
leg2 AS (
  SELECT 'risk_ratio' AS metric, 'cohort=' || cohort AS attrs,
         ROUND(oc / g2.g_out, 6) AS support,
         ROUND(CASE WHEN tc = 0 THEN 0.0
                    WHEN g2.g_tot - tc = 0 THEN 0.0
                    WHEN g2.g_out - oc = 0 THEN CAST('inf' AS DOUBLE)
                    ELSE (oc / tc) / ((g2.g_out - oc) / (g2.g_tot - tc)) END, 6) AS ratio,
         CAST(oc AS BIGINT) AS outlier_count,
         CAST(tc AS BIGINT) AS total_count
  FROM gs2, g2
),
lab3 AS (SELECT o_orderpriority,
                CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS o
         FROM orders),
g3 AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab3),
gs3 AS (SELECT o_orderpriority, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
        FROM lab3 GROUP BY o_orderpriority),
leg3 AS (
  SELECT 'prevalence_ratio' AS metric,
         'o_orderpriority=' || o_orderpriority AS attrs,
         ROUND(oc / g3.g_out, 6) AS support,
         ROUND((oc / ((CASE WHEN tc = oc THEN tc + 1.0 ELSE tc END) - oc))
               / ((CASE WHEN g3.g_out = 0 THEN 1.0 ELSE g3.g_out END)
                  / (g3.g_tot - CASE WHEN g3.g_out = 0 THEN 1.0 ELSE g3.g_out END)), 6)
           AS ratio,
         CAST(oc AS BIGINT) AS outlier_count,
         CAST(tc AS BIGINT) AS total_count
  FROM gs3, g3
)
SELECT * FROM leg1
UNION ALL SELECT * FROM leg2
UNION ALL SELECT * FROM leg3
ORDER BY metric, attrs
"""

ORACLES["q14_diff_join"] = """
WITH j AS (SELECT p_brand,
                  CASE WHEN l_discount >= 0.08 THEN 1.0 ELSE 0.0 END AS o
           FROM lineitem JOIN part ON l_partkey = p_partkey),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM j),
gs AS (SELECT p_brand, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM j GROUP BY p_brand)
SELECT p_brand,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g ORDER BY p_brand
"""

_LANGS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}
_lang_scores = ",\n".join(
    f"       len(list_intersect(toks, {words!r})) AS s_{lang}"
    for lang, words in _LANGS.items()
)

def _pii_scrub_sql(expr: str) -> str:
    """Build the DuckDB scrub chain from the CANONICAAL pattern list in
    functions/text.py — never inline regex text into an f-string template
    (f-string brace interpolation corrupted `{2,}`-style quantifiers and
    non-raw escapes turned \\b into backspace; caught by r4 self-review)."""
    from macrobase_spark.functions.text import PII_PATTERNS

    out = expr
    for kind, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '[{kind}]', 'g')"
    return out


# planted PII: the corpus itself contains none, so the scrub leg would be
# vacuously green; both sides append a deterministic synthetic email+IP so
# the hash check proves the chain actually fires on every row
_PII_PLANT = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
              "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) "
              "|| '.7'")
_scrub_fp_sql = "md5(" + _pii_scrub_sql(_PII_PLANT) + ")"

# pack leg (r5): replay pack_sequences' sharded greedy fold — shard =
# doc_id % 4 (passed explicitly via shard_col so it is SQL-expressible),
# order = doc_id, budget 64 — as a recursive CTE advancing every shard's
# rows in lockstep. Transition: overflow starts a new pack; the first row
# of a shard always opens pack 0 (oversize docs are singleton packs).
ORACLES["q15_text_features"] = f"""
WITH RECURSIVE
t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, text,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS nu,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
           AS n_alnum,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
{_lang_scores}
  FROM t
),
pk AS (
  SELECT doc_id, CAST(n AS BIGINT) AS ntok, CAST(doc_id % 4 AS INT) AS shard,
         CAST(row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
              AS BIGINT) AS rn
  FROM s),
-- r5c Gopher line-repetition legs over the same planted multi-line
-- rendering as the engine: [text, shared, text, shared|solo<id>]
mlines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id,
               text || chr(10) || 'shared tail line' || chr(10) || text
                 || chr(10)
                 || CASE WHEN doc_id % 3 = 0 THEN 'shared tail line'
                         ELSE 'solo ' || CAST(doc_id AS VARCHAR) END AS ml
        FROM documents),
       unnest(string_split(ml, chr(10))) AS u(l)
  WHERE trim(l) <> ''),
lcount AS (SELECT doc_id, line, COUNT(*) AS c FROM mlines
           GROUP BY doc_id, line),
rep AS (
  SELECT doc_id AS rp_doc,
         ROUND(1.0 - CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(c) AS DOUBLE), 6) AS rep_line_frac,
         ROUND(CAST(SUM(CASE WHEN c > 1 THEN c * length(line)
                             ELSE 0 END) AS DOUBLE)
               / CAST(SUM(c * length(line)) AS DOUBLE), 6) AS rep_char_frac
  FROM lcount GROUP BY doc_id),
-- r5c Gopher rule-filter legs: whitespace-word stats, required-stopword
-- count, and the keep boolean under the paper-default thresholds (this
-- corpus is single-line, so the line rules hold trivially)
gop AS (
  SELECT doc_id AS gp_doc,
         CAST(len(w) AS BIGINT) AS gop_words,
         CASE WHEN len(w) > 0
              THEN ROUND(CAST(list_sum(list_transform(w, x -> length(x)))
                              AS DOUBLE) / len(w), 6)
              ELSE 0.0 END AS gop_mwl,
         CAST(len(list_intersect(list_distinct(toks),
              ['the','be','to','of','and','that','have','with']))
              AS INT) AS gop_req,
         ROUND((CAST(length(text) - length(replace(text, '#', ''))
                     AS DOUBLE)
                + (length(text) - length(replace(text, '...', ''))) / 3.0)
               / GREATEST(len(w), 1), 6) AS gop_sym,
         CASE WHEN len(w) > 0
              THEN ROUND(CAST(len(list_filter(w,
                   x -> regexp_matches(lower(x), '[a-z]'))) AS DOUBLE)
                   / len(w), 6)
              ELSE 0.0 END AS gop_alpha
  FROM (SELECT doc_id, text, toks,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS w
        FROM t)),
gopk AS (
  SELECT gp_doc, gop_words, gop_mwl, gop_req,
         (gop_words >= 50 AND gop_words <= 100000
          AND gop_mwl >= 3.0 AND gop_mwl <= 10.0
          AND gop_sym <= 0.1 AND gop_alpha >= 0.8
          AND gop_req >= 2) AS gop_keep
  FROM gop),
-- top-2-gram char fraction over the raw text (deterministic tie: the
-- lexicographically smallest gram among the most frequent)
g2 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(0, len(toks) - 1),
                       i -> array_to_string(toks[i + 1 : i + 2], ' '))
                ELSE [array_to_string(toks, ' ')] END) AS gram,
         CAST(length(array_to_string(toks, ' ')) AS DOUBLE) AS norm_len
  FROM t),
g2c AS (SELECT doc_id, gram, norm_len, CAST(COUNT(*) AS INT) AS c
        FROM g2 GROUP BY doc_id, gram, norm_len),
topg AS (
  SELECT doc_id AS tg_doc,
         ROUND(CAST(c AS DOUBLE) * length(gram) / norm_len, 6) AS top2_frac
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, gram ASC) AS rnk
        FROM g2c)
  WHERE rnk = 1),
g AS (
  SELECT shard, rn, doc_id, ntok, CAST(0 AS BIGINT) AS pidx,
         CAST(0 AS BIGINT) AS ppos, ntok AS used
  FROM pk WHERE rn = 1
  UNION ALL
  SELECT p.shard, p.rn, p.doc_id, p.ntok,
         CASE WHEN g.used + p.ntok > 64 THEN g.pidx + 1 ELSE g.pidx END,
         CASE WHEN g.used + p.ntok > 64 THEN CAST(0 AS BIGINT)
              ELSE g.ppos + 1 END,
         CASE WHEN g.used + p.ntok > 64 THEN p.ntok ELSE g.used + p.ntok END
  FROM g JOIN pk p ON p.shard = g.shard AND p.rn = g.rn + 1)
SELECT s.doc_id,
       {_scrub_fp_sql} AS scrub_fp,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(s.text,
            '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+'))
            AS BIGINT) AS n_bpe,
       ROUND(GREATEST(0.0, LEAST(1.0,
           (CASE WHEN n > 0 THEN nu / n ELSE 0.0 END)
         * (1.0 - CASE WHEN n_chars > 0 THEN 1.0 - n_alnum / n_chars ELSE 1.0 END)
         * (CASE WHEN n >= 5 AND n <= 5000 THEN 1.0 ELSE 0.5 END))), 6) AS quality,
       CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
            WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
            ELSE 'de' END AS lang_pred,
       fp,
       rep.rep_line_frac, rep.rep_char_frac, topg.top2_frac,
       gopk.gop_words, gopk.gop_mwl, gopk.gop_req, gopk.gop_keep,
       CONCAT(CAST(g.shard AS VARCHAR), ':', CAST(g.pidx AS VARCHAR))
         AS pack_id,
       g.ppos AS pack_pos,
       g.ntok > 64 AS oversize
FROM s JOIN (SELECT doc_id AS g_doc, shard, pidx, ppos, ntok FROM g) g
  ON g.g_doc = s.doc_id
  JOIN rep ON rep.rp_doc = s.doc_id
  JOIN topg ON topg.tg_doc = s.doc_id
  JOIN gopk ON gopk.gp_doc = s.doc_id
ORDER BY s.doc_id LIMIT 500
"""

ORACLES["q16_dedup_exact"] = f"""
WITH RECURSIVE
exact AS (
  SELECT 'exact' AS part, md5(text) AS key, COUNT(*) AS n_copies,
         MIN(doc_id) AS rep_id
  FROM documents GROUP BY md5(text) HAVING COUNT(*) >= 1),
d AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id < 100),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_distinct(list_transform(range(0, len(toks) - 2 + 1),
                                 i -> array_to_string(toks[i + 1 : i + 2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM d),
e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
sz AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS sz FROM e GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS DOUBLE) AS i
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE i / (sa.sz + sb.sz - i) >= 0.05),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
clusters AS (
  SELECT 'cluster' AS part, CAST(u AS VARCHAR) AS key, CAST(1 AS BIGINT)
           AS n_copies,
         LEAST(u, MIN(v)) AS rep_id
  FROM reach GROUP BY u),
-- r5c deterministic-sampling legs: keep iff the first 8 hex chars of
-- md5('<seed>:<id>') sort below the fraction's 8-hex threshold — pure
-- string ops, byte-identical to the engine (pipelines/sample.py)
samp AS (
  SELECT 'sample:0.25' AS part, CAST(doc_id AS VARCHAR) AS key,
         CAST(1 AS BIGINT) AS n_copies, doc_id AS rep_id
  FROM documents
  WHERE substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'),
doms AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'wiki' WHEN 1 THEN 'web'
              ELSE 'logs' END AS domain,
         substr(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 8) AS u
  FROM documents),
mix AS (
  SELECT 'mix:' || domain AS part, CAST(doc_id AS VARCHAR) AS key,
         CAST(1 AS BIGINT) AS n_copies, doc_id AS rep_id
  FROM doms
  WHERE (domain = 'wiki')
     OR (domain = 'web'  AND u < '80000000')
     OR (domain = 'logs' AND u < '19999999')),
doms9 AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'wiki' WHEN 1 THEN 'web'
              ELSE 'logs' END AS domain
  FROM documents),
strat AS (
  SELECT 'strat:' || domain AS part, CAST(doc_id AS VARCHAR) AS key,
         CAST(1 AS BIGINT) AS n_copies, doc_id AS rep_id
  FROM (SELECT doc_id, domain,
               row_number() OVER (PARTITION BY domain
                                  ORDER BY substr(md5('9:' ||
                                    CAST(doc_id AS VARCHAR)), 1, 8),
                                  doc_id) AS rnk
        FROM doms9)
  WHERE rnk <= 5),
shuf AS (
  SELECT 'shuffle:head20' AS part, u AS key,
         CAST(row_number() OVER (ORDER BY u, doc_id) AS BIGINT) AS n_copies,
         doc_id AS rep_id
  FROM (SELECT doc_id,
               substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8) AS u
        FROM documents)
  ORDER BY u, doc_id LIMIT 20)
SELECT * FROM exact UNION ALL SELECT * FROM clusters
UNION ALL SELECT * FROM samp UNION ALL SELECT * FROM mix
UNION ALL SELECT * FROM strat UNION ALL SELECT * FROM shuf
ORDER BY part, rep_id, key
"""

ORACLES["q17_term_stats"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df, COUNT(*) AS cf
FROM toks GROUP BY term ORDER BY df DESC, term ASC LIMIT 50
"""

ORACLES["q18_bm25_relational"] = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
consts AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                  (SELECT AVG(dl) FROM dl) AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
       WHERE term IN ('merge', 'scan', 'row') GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(s, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

ORACLES["q19_cosine_topk"] = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 3),
sims AS (
  SELECT q.q_id, v.vec_id,
         CASE WHEN list_aggregate(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
                AND list_aggregate(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
              THEN list_aggregate(list_transform(list_zip(v.embedding, q.q_vec),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(v.embedding,
                                          x -> CAST(x AS DOUBLE) * x), 'sum'))
                      * sqrt(list_aggregate(list_transform(q.q_vec,
                                            x -> CAST(x AS DOUBLE) * x), 'sum')))
              ELSE 0.0 END AS cs
  FROM v CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT q_id, vec_id, ROUND(cs, 6) AS cos_sim, rank
FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""

ORACLES["q20_window_sessionize"] = """
WITH hourly AS (
  SELECT 'hourly' AS part,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') || '|' || event_type AS key,
         COUNT(*) AS n, ROUND(SUM(value), 4) AS val
  FROM events
  GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00'), event_type
),
g AS (
  SELECT user_id, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
),
sess AS (
  SELECT 'session' AS part, CAST(user_id AS VARCHAR) AS key,
         COUNT(*) AS n, CAST(MAX(sess_id) AS DOUBLE) AS val
  FROM s GROUP BY user_id
)
SELECT * FROM hourly UNION ALL SELECT * FROM sess
ORDER BY part, key
"""

ORACLES["q21_ngram_jaccard"] = f"""
WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id < 100),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_distinct(list_transform(range(0, len(toks) - 2 + 1),
                                 i -> array_to_string(toks[i + 1 : i + 2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM d
),
e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
sz AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS sz FROM e GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS DOUBLE) AS i
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT 'jac' AS part, id_a, id_b,
         ROUND(i / (sa.sz + sb.sz - i), 6) AS metric
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE i / (sa.sz + sb.sz - i) >= 0.05
),
-- r5b decontamination leg: 6-gram collision rule, train doc_id<200,
-- eval doc_id<10 (a subset of train); shared = distinct shared
-- shingles, overlap = shared / eval doc's distinct-shingle count
td AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id < 200),
tsh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 6
              THEN list_distinct(list_transform(range(0, len(toks) - 6 + 1),
                                 i -> array_to_string(toks[i + 1 : i + 6], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM td
),
te AS (SELECT doc_id AS train_id, unnest(shs) AS sh FROM tsh),
ee AS (SELECT doc_id AS eval_id, unnest(shs) AS sh FROM tsh
       WHERE doc_id < 10),
esz AS (SELECT eval_id, CAST(COUNT(*) AS DOUBLE) AS sz FROM ee
        GROUP BY eval_id),
cinter AS (SELECT train_id, eval_id, COUNT(*) AS shared
           FROM te JOIN ee USING (sh) GROUP BY train_id, eval_id),
contam AS (
  SELECT 'contam' AS part, train_id AS id_a, eval_id AS id_b,
         ROUND(shared / esz.sz, 6) AS metric
  FROM cinter JOIN esz USING (eval_id)
  WHERE shared >= 1
),
-- r5c chunking leg: 32-token windows, overlap 8 (stride 24); chunk i
-- covers tokens [i*24, i*24+32); the chunk TEXT is hashed into `part`
cd AS (SELECT doc_id, {TOKS} AS toks, len({TOKS}) AS n FROM documents
       WHERE doc_id < 50),
cidx AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n <= 32 THEN 1
                         ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) + 1
                         END)) AS ci
  FROM cd WHERE n > 0),
chunks AS (
  SELECT 'chunk:' || md5(array_to_string(
             toks[ci * 24 + 1 : ci * 24 + 32], ' ')) AS part,
         doc_id AS id_a, ci AS id_b,
         CAST(LEAST(32, n - ci * 24) AS DOUBLE) AS metric
  FROM cidx
)
SELECT part, id_a, id_b, metric FROM jac
UNION ALL
SELECT part, id_a, id_b, metric FROM contam
UNION ALL
SELECT part, id_a, id_b, metric FROM chunks
ORDER BY part, id_a, id_b
"""

ORACLES["q22_diff_mean"] = """
WITH g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(l_extendedprice) AS m,
                  stddev_pop(l_extendedprice) AS sd FROM lineitem),
gs AS (SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS DOUBLE) AS cnt,
              SUM(l_extendedprice) AS m1
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                               (l_returnflag, l_linestatus)))
SELECT l_returnflag, l_linestatus,
       ROUND(cnt / g.n, 6) AS support,
       ROUND(ABS(m1 / cnt - g.m) / g.sd, 6) AS mean_deviation,
       CAST(cnt AS BIGINT) AS total_count
FROM gs, g
WHERE cnt / g.n >= 0.01 AND ABS(m1 / cnt - g.m) / g.sd >= 0.005
ORDER BY mean_deviation DESC, l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""

ORACLES["q23_grouped_mad"] = """
WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
             FROM events GROUP BY event_type),
mad AS (SELECT e.event_type, quantile_cont(ABS(e.value - med.m), 0.5) AS d
        FROM events e JOIN med USING (event_type) GROUP BY e.event_type)
SELECT e.event_type,
       CAST(SUM(CASE WHEN ABS(e.value - med.m)
                          / ((CASE WHEN mad.d > 0 THEN mad.d ELSE 1e-12 END) * 1.4826)
                          > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mad3,
       COUNT(*) AS n
FROM events e JOIN med USING (event_type) JOIN mad ON mad.event_type = e.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""

ORACLES["q24_heavy_hitters"] = """
WITH j AS (SELECT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT COUNT(*) AS total FROM j)
SELECT p_brand, COUNT(*) AS est_count
FROM j, n GROUP BY p_brand, n.total
HAVING COUNT(*) >= 0.02 * n.total
ORDER BY est_count DESC, p_brand ASC
"""

ORACLES["q25_count_mean_shift_diff"] = """
WITH lab AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS oc1,
         CASE WHEN o_orderstatus = 'F' THEN 0.0 ELSE 1.0 END AS ic1,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS oms1,
         CASE WHEN o_orderstatus = 'F' THEN 0.0 ELSE o_totalprice END AS ims1
  FROM orders),
g AS (SELECT CAST(SUM(oc1) AS DOUBLE) AS g_out FROM lab),
gs AS (SELECT o_orderpriority, CAST(SUM(oc1) AS DOUBLE) AS oc,
              CAST(SUM(ic1) AS DOUBLE) AS ic,
              SUM(oms1) AS oms, SUM(ims1) AS ims
       FROM lab GROUP BY o_orderpriority)
SELECT o_orderpriority,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oms / oc) / (ims / ic), 6) AS mean_shift,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(oc + ic AS BIGINT) AS total_count
FROM gs, g ORDER BY o_orderpriority
"""

ORACLES["q26_bm25_index_path"] = f"""
-- the INDEX path (build -> compressed postings -> block-max topk) must
-- reproduce the relational BM25 exactly (same tokenizer, same formula,
-- float64 throughout, ascending-term sums) — this oracle is the q18
-- relational twin's SQL, so the driver now hash-checks the index
-- end-to-end instead of rows-only. The r5 phrase legs restrict the same
-- relational BM25 (over each phrase's distinct terms) to docs whose
-- TOKEN-ARRAY rendering contains the phrase consecutively — position
-- decoding verified, not just term co-occurrence.
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
joined AS (SELECT doc_id,
                  ' ' || array_to_string({TOKS}, ' ') || ' ' AS jt
           FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
consts AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                  (SELECT AVG(dl) FROM dl) AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
       WHERE term IN ('merge', 'scan', 'row', 'table') GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan', 'row')
  GROUP BY tf.doc_id
),
ph1 AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan')
    AND tf.doc_id IN (SELECT doc_id FROM joined
                      WHERE jt LIKE '% merge scan %')
  GROUP BY tf.doc_id
),
ph2 AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term = 'table'
    AND tf.doc_id IN (SELECT doc_id FROM joined
                      WHERE jt LIKE '% table table %')
  GROUP BY tf.doc_id
),
-- r5 conjunctive leg: same scores, only docs containing EVERY term rank
andq AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan', 'row')
  GROUP BY tf.doc_id
  HAVING COUNT(DISTINCT tf.term) = 3
),
-- r5c suggestion legs: the term dictionary is (term, doc frequency);
-- autocomplete ranks a prefix's terms by (df desc, term asc), spellcheck
-- ranks ≤2-edit neighbours by (distance asc, df desc, term asc)
dict AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         FROM toks GROUP BY term),
-- r5c recency-decay leg: hourly synthetic timestamps, weight =
-- 0.5^(age_days / 7) against the corpus max ts, applied to the same
-- disjunctive scores as 'topk'
recq AS (
  SELECT scored.doc_id,
         scored.s * pow(0.5,
           (((SELECT MAX(1700000000.0 + doc_id * 3600) FROM documents)
             - (1700000000.0 + scored.doc_id * 3600)) / 86400.0) / 7.0)
           AS s
  FROM scored
),
-- r5c regexp-term leg: /s(can|ort)/ = anchored whole-term dictionary
-- expansion scored with 'merge' as a disjunction, per-term idf
rterms AS (SELECT term FROM dict
           WHERE regexp_full_match(term, 's(can|ort)') OR term = 'merge'),
tfr AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
        WHERE term IN (SELECT term FROM rterms) GROUP BY doc_id, term),
dfsr AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
         FROM tfr GROUP BY term),
regq AS (
  SELECT tfr.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfsr.df + 0.5) / (dfsr.df + 0.5))
             * (tfr.tf * 2.2)
             / (tfr.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tfr JOIN dfsr USING (term) JOIN dl USING (doc_id), consts
  GROUP BY tfr.doc_id
),
-- r5c minimum_should_match leg: same disjunctive scores, only docs
-- matching at least 2 distinct query terms rank
msmq AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan', 'row')
  GROUP BY tf.doc_id
  HAVING COUNT(DISTINCT tf.term) >= 2
),
-- r5 doc_filter leg: the engine synthesizes role from doc_id % 4
-- (0 user, 1 assistant, 2 system, 3 tool) and filters role='assistant'
-- BEFORE top-k — the oracle restricts the rankable docs identically
-- while corpus stats (idf, avgdl) stay global
filtq AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan', 'row') AND tf.doc_id % 4 = 1
  GROUP BY tf.doc_id
),
-- r5 prefix-wildcard leg: 's*' = disjunction over every dictionary term
-- starting with 's', each with its own idf (scoring-boolean rewrite)
tfp AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
        WHERE term LIKE 's%' GROUP BY doc_id, term),
dfsp AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
         FROM tfp GROUP BY term),
prefq AS (
  SELECT tfp.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfsp.df + 0.5) / (dfsp.df + 0.5))
             * (tfp.tf * 2.2)
             / (tfp.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tfp JOIN dfsp USING (term) JOIN dl USING (doc_id), consts
  GROUP BY tfp.doc_id
),
-- r5 exclusion leg: 'merge -scan' ranks merge-matching docs that do NOT
-- contain scan; the excluded term never contributes to the score
notq AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term = 'merge'
    AND tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'scan')
  GROUP BY tf.doc_id
),
-- r5 boost leg: 'merge^2 scan' — merge's per-doc contribution is
-- multiplied by 2 before the per-doc sum (query-time boost)
boostq AS (
  SELECT tf.doc_id,
         SUM((ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl)))
             * (CASE WHEN tf.term = 'merge' THEN 2.0 ELSE 1.0 END)) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'scan')
  GROUP BY tf.doc_id
),
-- r5 tombstone-delete leg: docs with doc_id % 7 = 2 are deleted and the
-- index purge-compacted, so corpus stats (n_docs, avgdl, df) recompute
-- over the REDUCED corpus — a fully self-contained CTE chain
toksd AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents
          WHERE doc_id % 7 <> 2),
dld AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toksd
        GROUP BY doc_id),
constsd AS (SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 7 <> 2)
                   AS n_docs,
                   (SELECT AVG(dl) FROM dld) AS avgdl),
tfd AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toksd
        WHERE term IN ('merge', 'scan', 'row') GROUP BY doc_id, term),
dfsd AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
         FROM tfd GROUP BY term),
delq AS (
  SELECT tfd.doc_id,
         SUM(ln(1.0 + (constsd.n_docs - dfsd.df + 0.5) / (dfsd.df + 0.5))
             * (tfd.tf * 2.2)
             / (tfd.tf + 1.2 * (1.0 - 0.75 + 0.75 * dld.dl / constsd.avgdl))) AS s
  FROM tfd JOIN dfsd USING (term) JOIN dld USING (doc_id), constsd
  GROUP BY tfd.doc_id
)
SELECT part, doc_id, score FROM (
  SELECT 'topk' AS part, doc_id, ROUND(s, 6) AS score FROM scored
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'and:merge scan row' AS part, doc_id, ROUND(s, 6) AS score FROM andq
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'msm2:merge scan row' AS part, doc_id, ROUND(s, 6) AS score FROM msmq
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  -- synonym expansion of 'merge' to scan/row IS the 3-term disjunction
  SELECT 'syn:merge+scan,row' AS part, doc_id, ROUND(s, 6) AS score
  FROM scored ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
-- ids-only match export: the exclusion population, unranked and unlimited
SELECT 'ids:merge -scan' AS part, doc_id, 0.0 AS score FROM notq
UNION ALL
SELECT part, doc_id, score FROM (
  -- merged shards == the monolith: same relational BM25 as 'topk'
  SELECT 'merged:merge scan row' AS part, doc_id, ROUND(s, 6) AS score
  FROM scored ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'regex:s(can|ort)+merge' AS part, doc_id, ROUND(s, 6) AS score
  FROM regq ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'recency:hl7' AS part, doc_id, ROUND(s, 6) AS score
  FROM recq ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'suggest:me:' || term AS part, df AS doc_id, 0.0 AS score
  FROM dict WHERE term LIKE 'me%'
  ORDER BY df DESC, term ASC LIMIT 5
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'spell:mergee:' || term AS part, df AS doc_id,
         CAST(levenshtein(term, 'mergee') AS DOUBLE) AS score
  FROM dict WHERE levenshtein(term, 'mergee') <= 2
  ORDER BY score ASC, df DESC, term ASC LIMIT 5
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'filter:role=assistant' AS part, doc_id, ROUND(s, 6) AS score
  FROM filtq ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'prefix:s*' AS part, doc_id, ROUND(s, 6) AS score FROM prefq
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'not:merge -scan' AS part, doc_id, ROUND(s, 6) AS score FROM notq
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'boost:merge^2 scan' AS part, doc_id, ROUND(s, 6) AS score
  FROM boostq ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'del:merge scan row' AS part, doc_id, ROUND(s, 6) AS score
  FROM delq ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'phrase:merge scan' AS part, doc_id, ROUND(s, 6) AS score FROM ph1
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
SELECT part, doc_id, score FROM (
  SELECT 'phrase:table table' AS part, doc_id, ROUND(s, 6) AS score FROM ph2
  ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
-- r5b field collapsing: best-scoring doc per role (doc_id % 4), the 4
-- group winners ranked by score; and the match cardinality (COUNT)
SELECT part, doc_id, score FROM (
  SELECT 'collapse:role' AS part, doc_id, ROUND(s, 6) AS score FROM (
    SELECT doc_id, s,
           ROW_NUMBER() OVER (PARTITION BY doc_id % 4
                              ORDER BY s DESC, doc_id ASC) AS grn
    FROM scored) WHERE grn = 1
  ORDER BY s DESC, doc_id ASC LIMIT 4
) UNION ALL
SELECT 'count:merge scan row' AS part,
       (SELECT COUNT(*) FROM scored) AS doc_id, 0.0 AS score
UNION ALL
-- r5b hybrid retrieval: RRF over (BM25 rank ≤30, cosine rank ≤30);
-- query vector = doc 0's embedding; absent-run docs contribute 0
SELECT part, doc_id, score FROM (
  WITH lexr AS (
    SELECT doc_id, br FROM (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS br
      FROM scored ORDER BY s DESC, doc_id ASC LIMIT 30)
  ),
  qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
  semr AS (
    SELECT doc_id, cr FROM (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (
               ORDER BY list_cosine_similarity(
                 embedding::DOUBLE[], (SELECT v FROM qv)) DESC,
               vec_id ASC) AS cr
      FROM embeddings
      ORDER BY list_cosine_similarity(
                 embedding::DOUBLE[], (SELECT v FROM qv)) DESC,
               vec_id ASC
      LIMIT 30)
  )
  SELECT 'hybrid:merge scan row' AS part,
         COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / (60 + br), 0)
               + COALESCE(1.0 / (60 + cr), 0), 6) AS score
  FROM lexr FULL JOIN semr ON lexr.doc_id = semr.doc_id
  ORDER BY COALESCE(1.0 / (60 + br), 0)
           + COALESCE(1.0 / (60 + cr), 0) DESC,
           COALESCE(lexr.doc_id, semr.doc_id) ASC
  LIMIT 10
) UNION ALL
-- r5b sharded search: two physical shards + global stats must reproduce
-- the monolithic ranking exactly — same scored CTE as the topk leg
SELECT part, doc_id, score FROM (
  SELECT 'shard:merge scan row' AS part, doc_id, ROUND(s, 6) AS score
  FROM scored ORDER BY s DESC, doc_id ASC LIMIT 10
) UNION ALL
-- r5b stopword analyzer: stoplist ('a','the') — every stat (dl, avgdl,
-- df) recomputed over the FILTERED token stream; all-stopword docs keep
-- counting in n_docs with dl 0; the query's 'the' is dropped
SELECT part, doc_id, score FROM (
  WITH toksf AS (SELECT doc_id, term FROM toks
                 WHERE term NOT IN ('a', 'the')),
  dlf AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toksf
          GROUP BY doc_id),
  constsf AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                     (SELECT SUM(dl) FROM dlf)
                     / (SELECT COUNT(*) FROM documents) AS avgdl),
  tfs2 AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toksf
           WHERE term IN ('merge', 'scan', 'row') GROUP BY doc_id, term),
  dfs2 AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
           FROM tfs2 GROUP BY term)
  SELECT 'stop:merge scan row the' AS part, tfs2.doc_id,
         ROUND(SUM(ln(1.0 + (constsf.n_docs - dfs2.df + 0.5)
                      / (dfs2.df + 0.5))
               * (tfs2.tf * 2.2)
               / (tfs2.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dlf.dl / constsf.avgdl))), 6)
         AS score
  FROM tfs2 JOIN dfs2 USING (term) JOIN dlf USING (doc_id), constsf
  GROUP BY tfs2.doc_id, constsf.n_docs, constsf.avgdl
  ORDER BY SUM(ln(1.0 + (constsf.n_docs - dfs2.df + 0.5) / (dfs2.df + 0.5))
               * (tfs2.tf * 2.2)
               / (tfs2.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dlf.dl / constsf.avgdl))) DESC,
           tfs2.doc_id ASC
  LIMIT 10
) UNION ALL
-- r5b fuzzy: 'merge~1' = disjunction over every vocabulary term within
-- 1 edit of 'merge', each with its own idf (same rewrite as prefixes)
SELECT part, doc_id, score FROM (
  WITH tff AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
               FROM toks WHERE levenshtein(term, 'merge') <= 1
               GROUP BY doc_id, term),
  dfsf AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
           FROM tff GROUP BY term)
  SELECT 'fuzzy:merge~1' AS part, tff.doc_id,
         ROUND(SUM(ln(1.0 + (consts.n_docs - dfsf.df + 0.5)
                      / (dfsf.df + 0.5))
               * (tff.tf * 2.2)
               / (tff.tf + 1.2 * (1.0 - 0.75
                                  + 0.75 * dl.dl / consts.avgdl))), 6)
         AS score
  FROM tff JOIN dfsf USING (term) JOIN dl USING (doc_id), consts
  GROUP BY tff.doc_id, consts.n_docs, consts.avgdl
  ORDER BY SUM(ln(1.0 + (consts.n_docs - dfsf.df + 0.5) / (dfsf.df + 0.5))
               * (tff.tf * 2.2)
               / (tff.tf + 1.2 * (1.0 - 0.75
                                  + 0.75 * dl.dl / consts.avgdl))) DESC,
           tff.doc_id ASC
  LIMIT 10
) UNION ALL
-- r5b search-after pagination: page 2 is rows 11-20 of the ranking
SELECT part, doc_id, score FROM (
  SELECT 'page2:merge scan row' AS part, doc_id, ROUND(s, 6) AS score
  FROM scored ORDER BY s DESC, doc_id ASC LIMIT 10 OFFSET 10
) UNION ALL
-- r5b metadata sort: matching docs by turn_idx desc (== doc_id desc)
SELECT part, doc_id, score FROM (
  SELECT 'sort:turn_idx desc' AS part, doc_id, ROUND(s, 6) AS score
  FROM scored ORDER BY doc_id DESC LIMIT 10
) UNION ALL
-- r5b facet counts over ALL matching docs (role synthesized from
-- doc_id % 4: 0 user, 1 assistant, 2 system, 3 tool), encoded as
-- (part='facet:<col>=<value>', doc_id=count, score=0.0)
SELECT 'facet:__total__=' AS part,
       (SELECT COUNT(*) FROM scored) AS doc_id, 0.0 AS score
UNION ALL
SELECT 'facet:role=' || CASE r WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                               WHEN 2 THEN 'system' ELSE 'tool' END AS part,
       c AS doc_id, 0.0 AS score
FROM (SELECT doc_id % 4 AS r, COUNT(*) AS c FROM scored GROUP BY doc_id % 4)
UNION ALL
-- r5b scoring explain: per-term contributions of the ranking's top doc
SELECT 'explain:' || tf.term AS part, tf.doc_id,
       ROUND(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl)),
             6) AS score
FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
WHERE tf.term IN ('merge', 'scan', 'row')
  AND tf.doc_id = (SELECT doc_id FROM scored
                   ORDER BY s DESC, doc_id ASC LIMIT 1)
ORDER BY part, score DESC, doc_id
"""

ORACLES["q50_bm25_batch"] = f"""
-- batched index-path BM25 vs the relational twin, one leg per query
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
consts AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                  (SELECT AVG(dl) FROM dl) AS avgdl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
       WHERE term IN ('merge', 'scan', 'row', 'index', 'table', 'join')
       GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT 'q1' AS query_id, tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('merge', 'row', 'scan')
  GROUP BY tf.doc_id
  UNION ALL
  SELECT 'q2' AS query_id, tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('index')
  GROUP BY tf.doc_id
  UNION ALL
  SELECT 'q3' AS query_id, tf.doc_id,
         SUM(ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term IN ('join', 'table')
  GROUP BY tf.doc_id
  UNION ALL
  -- r5b: per-query boost + exclusion through the batch path
  SELECT 'q4' AS query_id, tf.doc_id,
         SUM((ln(1.0 + (consts.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl)))
             * 2.0) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id), consts
  WHERE tf.term = 'merge'
    AND tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'scan')
  GROUP BY tf.doc_id
  UNION ALL
  -- r5b: prefix expansion through the batch path
  SELECT 'q5' AS query_id, t5.doc_id,
         SUM(ln(1.0 + (consts.n_docs - d5.df + 0.5) / (d5.df + 0.5))
             * (t5.tf * 2.2)
             / (t5.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))) AS s
  FROM (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
        WHERE term LIKE 'tabl%' GROUP BY doc_id, term) t5
  JOIN (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks WHERE term LIKE 'tabl%' GROUP BY term) d5 USING (term)
  JOIN dl USING (doc_id), consts
  GROUP BY t5.doc_id
),
ranked AS (
  SELECT query_id, doc_id, s,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, ROUND(s, 6) AS score, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

ORACLES["q29_windowed_diff"] = """
WITH base AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 * 1000000) AS ws,
         CAST(user_id % 5 AS VARCHAR) AS cohort,
         CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS o
  FROM events),
g AS (SELECT ws, SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot
      FROM base GROUP BY ws),
c AS (SELECT ws, cohort, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
      FROM base GROUP BY ws, cohort)
SELECT strftime(c.ws, '%Y-%m-%d %H:%M') AS window_start,
       strftime(c.ws + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M') AS window_end,
       cohort,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM c JOIN g USING (ws)
WHERE oc / g.g_out >= 0.0 AND (oc / tc) / (g.g_out / g.g_tot) >= 1.05
ORDER BY window_start, cohort
"""

ORACLES["q30_multimodal_features"] = """
-- structural contract of pipelines/multimodal.py derived by rule (not a
-- value dump): synth_media kinds cycle image/audio/video by id%3, every
-- 11th row is an undecodable fake-JPEG (ok=false, empty feature); feature
-- dims are image 3+3+8=14, audio 2+16=18, video 3*2=6.
SELECT CAST(i AS BIGINT) AS media_id,
       CASE WHEN i % 11 = 10 THEN 'image'
            ELSE ['image', 'audio', 'video'][(i % 3) + 1] END AS kind,
       CAST(CASE WHEN i % 11 = 10 THEN 0
                 WHEN i % 3 = 0 THEN 14
                 WHEN i % 3 = 1 THEN 18
                 ELSE 6 END AS INTEGER) AS feat_dim,
       i % 11 <> 10 AS ok
FROM range(64) t(i)
ORDER BY media_id
"""

ORACLES["q31_lsh_ann"] = """
-- LSH-bucketed ANN: the sign-random-projection planes are deterministic
-- (seed 3), embedded here as literals, so DuckDB reproduces bucket
-- assignment AND the within-bucket exact rescoring — the approximate
-- path's semantics verified end-to-end, not just rows-only
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec,
         (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [2.0409191213851825, -2.5556650313141818, 0.41809884672577885, -0.5677696061279298, -0.45264929211044586, -0.2155971630897659, -2.019986129147251, -0.23193237764418947, -0.8652130762749417, 3.3229995166448827, 0.22578661322792176, -0.3526307943415954, -0.2812874181513504, -0.6680463461089501, -1.0551505512051214, -0.39080097723465473, 0.48194538850678587, -0.2385536065733667, 0.9577587029597641, -0.19980212906658, 0.024259565076664623, 1.545820851212812, 0.5451055226876446, -0.505228735614018, -0.1828389745977349, 0.5405251317548021, 1.9350880340988528, -0.2696203273419135, -0.24355867907910456, 1.0023136012756912, -0.8864599431605871, -0.291720232439864, 0.8825389674564839, 0.5803500161908991, 0.09151670328235219, 0.6701043548284794, -2.8281623068437627, 1.02130681750008, -0.9596447598081417, -1.6686198426559695, 0.27644575952099965, 0.7005448853493901, -0.4447674556827841, -1.0764058401008076, 0.026124833534033623, -0.05274730824287927, 1.4055981660180925, 0.7474079874793504, 0.19381564626462, 1.1116332052239921, -0.20552304990579248, -0.9258995736483681, 0.584058311025248, 0.5825384186556901, -0.2148289111268558, -0.7828085779639662, 0.22915390521326254, -2.4938942784579905, 0.690124770162812, 0.4913682607449912, -1.6388571438904884, 0.06135350983817159, -0.9640996635412404, 0.7572210447581504]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [-2.034167273443428, -0.9144945379945887, 0.7095799877420675, 1.156401048432157, -2.158005380126208, -0.49803984475130336, 0.32802009254257697, -0.6092161379498706, 1.5906402313231438, -1.1912266816177808, 0.354531946286926, -1.0484055185445111, 1.4059629431348852, -0.021651229055558368, -0.3722505640006159, -1.7181849497326165, 1.6818255450666806, 0.7527785926973876, 0.753563837509362, 1.1378812589177814, 0.3492265781230293, -0.6392466105764212, -0.8002412270301018, -0.800199979361005, 1.3700723413337117, -1.4603812011954127, -0.5963695117707888, -0.32124391928619556, 0.22461902534909414, 0.5753493885078089, -1.2490970090955427, -1.730013451272522, -0.004414232621967487, 1.2135638252860816, 0.7570580592965243, 0.21565078369996044, -0.3171556440173552, 0.2932336958002246, -0.24333508574217566, 0.817206580492595, -0.7944473388868819, 0.13423994708633882, -0.11078013611159404, 0.5433593895301524, 0.22463852364937692, 2.550034636307906, 1.498654758135483, 1.4967371655185107, -2.0395038375946424, -0.3403166247023773, -0.6086106159129299, 0.5327215998890392, -2.279026489055327, 1.1744986790091876, 1.0669833108953142, -1.3020708582457947, -0.9785485286214127, -0.8011720107811816, 0.043295900283144985, 0.6409710646894711, 2.0478860553573326, -0.19744542988767094, 0.7675025589036195, 0.15541781005943467]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [1.7599262839082537, 0.7421578612115688, 1.3685504508744795, -1.0776751897834627, -0.19224071152595104, -0.8137724218420405, 1.5049474040083073, 0.6576399038177728, -0.3051444257775161, -0.4524678870704014, 0.4846648782067015, -0.7014955301795535, -0.9305888762121555, 0.4812744922715323, 2.463132032105226, -0.24613355406481327, -0.5558657807935545, -1.171156834025543, -1.3350109575593827, 0.524983234564226, 0.8508030327785525, 0.0091747208824902, 0.3325759886762084, 0.11591657750710396, 0.13865484604722084, -1.5261590525828475, -0.45811827304922115, 0.11147930758994773, -0.7831667805636854, -0.47642974385981746, -0.8191201803277345, -0.3334966741984413, 0.8531082743251359, -0.40658035065559817, -0.15387068019710476, 0.813718359438118, 0.6447702141569163, 1.6952075589596332, -2.090485078128588, 0.856858944523106, -0.4822840867730822, 0.13469181881788084, 0.837719384899064, 1.0832531556913447, 1.0393506903088359, 0.15510669107825276, 1.6096626830183138, -0.2829742272161367, -0.14098191307078672, 0.7993511888940862, -0.5513724079804637, 2.160906258701247, 1.019206565354622, 2.1755753226203938, -0.026589187155779802, -0.38308855026130717, 0.16704800216692559, 0.7345765026061907, -0.5874276868740115, 0.3797017469724474, -0.01680427892083426, 1.6156817605764437, -0.6627018123008657, 1.046161771728719]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [-0.6438635355400087, -0.9606341931074224, -0.7102994273756232, -1.1901858618422472, 0.1463503600664521, 1.0312607960786646, 0.1643148785347983, 0.6243251121848756, 1.6321741955751323, 0.27002644717885166, 0.19516236096309458, -0.27506146796027464, -1.6082422850112825, 0.7597389318680837, -1.7564604476259789, 0.6526764363838281, -0.014320335733954404, 1.1267814508104348, -0.067770260510462, -0.8232001579576669, 0.3579102667525859, -0.5602361357081261, -0.1809568246618137, 0.0418707868620003, -0.13454971174566932, -0.18880227497381663, -0.8324449882870513, -0.18913378409281006, -2.13834060712102, -0.15733209522523053, -1.198055985931922, 1.1202636903470218, 1.2699267473212534, -1.951025780521256, 0.14491679036588978, -0.12636392216675604, -1.0467156300808687, 0.5316531426489993, -0.46168954465474565, -1.7675990956866041, -0.2666766520569678, -0.14825311830009477, 0.10643101824147437, -1.2312329987327657, 0.6156809269215894, 0.7354570881988916, -1.1458272768549103, -0.6588555689831765, -0.08033731382935666, -0.5659253270123664, 1.7437546098496857, 0.20837211615824647, -1.010582036354199, -0.7881089276247821, -0.05747025825572099, 2.2957788082586084, -0.17826432182306642, 0.12747641923980615, 0.5140453781581755, -0.0401259362630417, 2.280660872566708, -0.5315249470251602, 0.7442031251457859, 0.16043796898357113]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 8 ELSE 0 END) AS bkt
  FROM embeddings WHERE vec_id < 2),
v AS (
  SELECT vec_id, embedding,
         (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [2.0409191213851825, -2.5556650313141818, 0.41809884672577885, -0.5677696061279298, -0.45264929211044586, -0.2155971630897659, -2.019986129147251, -0.23193237764418947, -0.8652130762749417, 3.3229995166448827, 0.22578661322792176, -0.3526307943415954, -0.2812874181513504, -0.6680463461089501, -1.0551505512051214, -0.39080097723465473, 0.48194538850678587, -0.2385536065733667, 0.9577587029597641, -0.19980212906658, 0.024259565076664623, 1.545820851212812, 0.5451055226876446, -0.505228735614018, -0.1828389745977349, 0.5405251317548021, 1.9350880340988528, -0.2696203273419135, -0.24355867907910456, 1.0023136012756912, -0.8864599431605871, -0.291720232439864, 0.8825389674564839, 0.5803500161908991, 0.09151670328235219, 0.6701043548284794, -2.8281623068437627, 1.02130681750008, -0.9596447598081417, -1.6686198426559695, 0.27644575952099965, 0.7005448853493901, -0.4447674556827841, -1.0764058401008076, 0.026124833534033623, -0.05274730824287927, 1.4055981660180925, 0.7474079874793504, 0.19381564626462, 1.1116332052239921, -0.20552304990579248, -0.9258995736483681, 0.584058311025248, 0.5825384186556901, -0.2148289111268558, -0.7828085779639662, 0.22915390521326254, -2.4938942784579905, 0.690124770162812, 0.4913682607449912, -1.6388571438904884, 0.06135350983817159, -0.9640996635412404, 0.7572210447581504]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [-2.034167273443428, -0.9144945379945887, 0.7095799877420675, 1.156401048432157, -2.158005380126208, -0.49803984475130336, 0.32802009254257697, -0.6092161379498706, 1.5906402313231438, -1.1912266816177808, 0.354531946286926, -1.0484055185445111, 1.4059629431348852, -0.021651229055558368, -0.3722505640006159, -1.7181849497326165, 1.6818255450666806, 0.7527785926973876, 0.753563837509362, 1.1378812589177814, 0.3492265781230293, -0.6392466105764212, -0.8002412270301018, -0.800199979361005, 1.3700723413337117, -1.4603812011954127, -0.5963695117707888, -0.32124391928619556, 0.22461902534909414, 0.5753493885078089, -1.2490970090955427, -1.730013451272522, -0.004414232621967487, 1.2135638252860816, 0.7570580592965243, 0.21565078369996044, -0.3171556440173552, 0.2932336958002246, -0.24333508574217566, 0.817206580492595, -0.7944473388868819, 0.13423994708633882, -0.11078013611159404, 0.5433593895301524, 0.22463852364937692, 2.550034636307906, 1.498654758135483, 1.4967371655185107, -2.0395038375946424, -0.3403166247023773, -0.6086106159129299, 0.5327215998890392, -2.279026489055327, 1.1744986790091876, 1.0669833108953142, -1.3020708582457947, -0.9785485286214127, -0.8011720107811816, 0.043295900283144985, 0.6409710646894711, 2.0478860553573326, -0.19744542988767094, 0.7675025589036195, 0.15541781005943467]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [1.7599262839082537, 0.7421578612115688, 1.3685504508744795, -1.0776751897834627, -0.19224071152595104, -0.8137724218420405, 1.5049474040083073, 0.6576399038177728, -0.3051444257775161, -0.4524678870704014, 0.4846648782067015, -0.7014955301795535, -0.9305888762121555, 0.4812744922715323, 2.463132032105226, -0.24613355406481327, -0.5558657807935545, -1.171156834025543, -1.3350109575593827, 0.524983234564226, 0.8508030327785525, 0.0091747208824902, 0.3325759886762084, 0.11591657750710396, 0.13865484604722084, -1.5261590525828475, -0.45811827304922115, 0.11147930758994773, -0.7831667805636854, -0.47642974385981746, -0.8191201803277345, -0.3334966741984413, 0.8531082743251359, -0.40658035065559817, -0.15387068019710476, 0.813718359438118, 0.6447702141569163, 1.6952075589596332, -2.090485078128588, 0.856858944523106, -0.4822840867730822, 0.13469181881788084, 0.837719384899064, 1.0832531556913447, 1.0393506903088359, 0.15510669107825276, 1.6096626830183138, -0.2829742272161367, -0.14098191307078672, 0.7993511888940862, -0.5513724079804637, 2.160906258701247, 1.019206565354622, 2.1755753226203938, -0.026589187155779802, -0.38308855026130717, 0.16704800216692559, 0.7345765026061907, -0.5874276868740115, 0.3797017469724474, -0.01680427892083426, 1.6156817605764437, -0.6627018123008657, 1.046161771728719]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN list_aggregate(list_transform(list_zip(embedding, [-0.6438635355400087, -0.9606341931074224, -0.7102994273756232, -1.1901858618422472, 0.1463503600664521, 1.0312607960786646, 0.1643148785347983, 0.6243251121848756, 1.6321741955751323, 0.27002644717885166, 0.19516236096309458, -0.27506146796027464, -1.6082422850112825, 0.7597389318680837, -1.7564604476259789, 0.6526764363838281, -0.014320335733954404, 1.1267814508104348, -0.067770260510462, -0.8232001579576669, 0.3579102667525859, -0.5602361357081261, -0.1809568246618137, 0.0418707868620003, -0.13454971174566932, -0.18880227497381663, -0.8324449882870513, -0.18913378409281006, -2.13834060712102, -0.15733209522523053, -1.198055985931922, 1.1202636903470218, 1.2699267473212534, -1.951025780521256, 0.14491679036588978, -0.12636392216675604, -1.0467156300808687, 0.5316531426489993, -0.46168954465474565, -1.7675990956866041, -0.2666766520569678, -0.14825311830009477, 0.10643101824147437, -1.2312329987327657, 0.6156809269215894, 0.7354570881988916, -1.1458272768549103, -0.6588555689831765, -0.08033731382935666, -0.5659253270123664, 1.7437546098496857, 0.20837211615824647, -1.010582036354199, -0.7881089276247821, -0.05747025825572099, 2.2957788082586084, -0.17826432182306642, 0.12747641923980615, 0.5140453781581755, -0.0401259362630417, 2.280660872566708, -0.5315249470251602, 0.7442031251457859, 0.16043796898357113]),
             p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 THEN 8 ELSE 0 END) AS bkt
  FROM embeddings WHERE vec_id >= 2),
sims AS (
  SELECT q.q_id, v.vec_id,
         CASE WHEN list_aggregate(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
                AND list_aggregate(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
              THEN list_aggregate(list_transform(list_zip(v.embedding, q.q_vec),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(v.embedding,
                                          x -> CAST(x AS DOUBLE) * x), 'sum'))
                      * sqrt(list_aggregate(list_transform(q.q_vec,
                                            x -> CAST(x AS DOUBLE) * x), 'sum')))
              ELSE 0.0 END AS cs
  FROM v JOIN q ON v.bkt = q.bkt),
ranked AS (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS rank
  FROM sims)
SELECT q_id, vec_id, ROUND(cs, 6) AS cos_sim, rank
FROM ranked WHERE rank <= 5
"""

ORACLES["q32_fpgrowth_diff"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem),
lab AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
               CASE WHEN l_extendedprice > (SELECT hi FROM cut) THEN 1.0 ELSE 0.0 END AS o
        FROM lineitem),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
gs AS (SELECT array_to_string(list_sort(list_filter(
                ['l_returnflag=' || rf, 'l_linestatus=' || ls],
                x -> x IS NOT NULL)), ',') AS items,
              SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((rf), (ls), (rf, ls)))
SELECT items,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND(CASE WHEN tc = 0 THEN 0.0
                  WHEN g.g_tot - tc = 0 THEN 0.0
                  WHEN g.g_out - oc = 0 THEN CAST('inf' AS DOUBLE)
                  ELSE (oc / tc) / ((g.g_out - oc) / (g.g_tot - tc)) END, 6)
         AS risk_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.05
ORDER BY items
"""

_CTX_ONE = """
  SELECT {sel_a} AS event_type, {sel_b} AS cohort,
         SUM(CASE WHEN ABS(e.value - m._med)
                  / ((CASE WHEN d._mad > 0 THEN d._mad ELSE 1e-12 END) * 1.4826)
                  > 2.0 THEN 1.0 ELSE 0.0 END) AS outlier_count,
         COUNT(*) AS context_size
  FROM ev e
  JOIN (SELECT {keys}, quantile_cont(value, 0.5) AS _med, COUNT(*) AS _csize
        FROM ev GROUP BY {keys} HAVING COUNT(*) >= 50) m ON {on_m}
  JOIN (SELECT {keys3}, quantile_cont(ABS(ev.value - m2._med), 0.5) AS _mad
        FROM ev JOIN (SELECT {keys2}, quantile_cont(value, 0.5) AS _med,
                             COUNT(*) AS _c FROM ev GROUP BY {keys2}
                      HAVING COUNT(*) >= 50) m2 ON {on_m2}
        GROUP BY {keys3}) d ON {on_d}
  GROUP BY {gb_outer}
"""


def _ctx_sql(keys: list[str]) -> str:
    k_plain = ", ".join(keys)
    sel_a = "e.event_type" if "event_type" in keys else "CAST(NULL AS VARCHAR)"
    sel_b = "e.cohort" if "cohort" in keys else "CAST(NULL AS VARCHAR)"
    on_m = " AND ".join(f"e.{k} = m.{k}" for k in keys)
    on_m2 = " AND ".join(f"ev.{k} = m2.{k}" for k in keys)
    on_d = " AND ".join(f"e.{k} = d.{k}" for k in keys)
    keys3 = ", ".join(f"ev.{k}" for k in keys)
    gb_outer = ", ".join(f"e.{k}" for k in keys)
    return _CTX_ONE.format(sel_a=sel_a, sel_b=sel_b, keys=k_plain,
                           keys2=k_plain, keys3=keys3, on_m=on_m,
                           on_m2=on_m2, on_d=on_d, gb_outer=gb_outer)


ORACLES["q33_cubed_classifiers"] = """
WITH cube AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS DOUBLE) AS cnt,
         MIN(l_extendedprice) AS q0,
         quantile_cont(l_extendedprice, 0.5) AS q50,
         MAX(l_extendedprice) AS q100,
         AVG(l_extendedprice) AS mu,
         stddev_pop(l_extendedprice) AS sd
  FROM lineitem GROUP BY l_returnflag, l_linestatus),
qpts AS (
  SELECT q0 AS v, cnt * 0.25 AS w FROM cube
  UNION ALL SELECT q50, cnt * 0.5 FROM cube
  UNION ALL SELECT q100, cnt * 0.25 FROM cube),
qtot AS (SELECT SUM(w) AS t FROM qpts),
qcum AS (SELECT v, SUM(w) OVER (ORDER BY v DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM qpts),
qhi AS (SELECT MAX(v) AS hi FROM qcum
        WHERE cw >= (5.0 / 100.0) * (SELECT t FROM qtot)),
qlo AS (SELECT MAX(v) AS lo FROM qcum
        WHERE cw >= (1.0 - 5.0 / 100.0) * (SELECT t FROM qtot)),
qcls AS (
  SELECT l_returnflag, l_linestatus,
         LEAST((1.0 - (CASE WHEN q0 > qhi.hi THEN 0.0 WHEN q0 <= qhi.hi AND q50 >= qhi.hi THEN 0.0 + (0.5 - 0.0) * ((qhi.hi - q0) / (q50 - q0)) WHEN q50 <= qhi.hi AND q100 >= qhi.hi THEN 0.5 + (1.0 - 0.5) * ((qhi.hi - q50) / (q100 - q50)) ELSE 1.0 END)) * cnt
               + (CASE WHEN q0 > qlo.lo THEN 0.0 WHEN q0 <= qlo.lo AND q50 >= qlo.lo THEN 0.0 + (0.5 - 0.0) * ((qlo.lo - q0) / (q50 - q0)) WHEN q50 <= qlo.lo AND q100 >= qlo.lo THEN 0.5 + (1.0 - 0.5) * ((qlo.lo - q50) / (q100 - q50)) ELSE 1.0 END) * cnt, cnt) AS eq
  FROM cube, qhi, qlo),
atot AS (SELECT SUM(cnt) AS t FROM cube),
acum AS (SELECT mu AS v, SUM(cnt) OVER (ORDER BY mu DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM cube),
ahi AS (SELECT MAX(v) AS hi FROM acum
        WHERE cw >= (1.0 - (100.0 - 2.0) / 100.0) * (SELECT t FROM atot)),
alo AS (SELECT MAX(v) AS lo FROM acum
        WHERE cw >= (1.0 - 2.0 / 100.0) * (SELECT t FROM atot)),
az AS (
  SELECT l_returnflag, l_linestatus, cnt, mu, sd, ahi.hi AS hi,
         (ahi.hi - mu) / (sd * sqrt(2.0)) AS zh,
         (alo.lo - mu) / (sd * sqrt(2.0)) AS zl
  FROM cube, ahi, alo),
az2 AS (
  SELECT *, abs(zh) AS xh, abs(zl) AS xl,
         1.0 / (1.0 + 0.3275911 * abs(zh)) AS th,
         1.0 / (1.0 + 0.3275911 * abs(zl)) AS tl
  FROM az),
acls AS (
  SELECT l_returnflag, l_linestatus,
         CASE WHEN sd IS NULL OR isnan(sd) OR sd = 0
              THEN CASE WHEN mu > hi OR mu < hi THEN cnt ELSE 0.0 END
              ELSE LEAST((1.0 - ((1.0 + (CASE WHEN zh < 0 THEN -1.0 ELSE 1.0 END) * (1.0 - (0.254829592*th - 0.284496736*th*th + 1.421413741*th*th*th - 1.453152027*th*th*th*th + 1.061405429*th*th*th*th*th) * exp(-xh*xh))) / 2.0)) * cnt
                         + ((1.0 + (CASE WHEN zl < 0 THEN -1.0 ELSE 1.0 END) * (1.0 - (0.254829592*tl - 0.284496736*tl*tl + 1.421413741*tl*tl*tl - 1.453152027*tl*tl*tl*tl + 1.061405429*tl*tl*tl*tl*tl) * exp(-xl*xl))) / 2.0) * cnt, cnt)
         END AS ea
  FROM az2)
SELECT l_returnflag, l_linestatus,
       ROUND(eq, 4) AS expected_outliers_quantile,
       ROUND(ea, 4) AS expected_outliers_arith
FROM qcls JOIN acls USING (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q35_contextual_mad"] = (
    "WITH ev AS (SELECT *, CAST(user_id % 3 AS VARCHAR) AS cohort FROM events),\n"
    "allctx AS (" + "\nUNION ALL\n".join(
        _ctx_sql(k) for k in (["event_type"], ["cohort"], ["event_type", "cohort"])
    ) + ")\n"
    "SELECT event_type, cohort, CAST(outlier_count AS BIGINT) AS outlier_count,\n"
    "       context_size, ROUND(outlier_count / context_size, 6) AS outlier_rate\n"
    "FROM allctx\n"
    "ORDER BY outlier_rate DESC, event_type NULLS LAST, cohort NULLS LAST"
)

ORACLES["q36_ew_percentile"] = """
WITH b AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / 7200) AS BIGINT) * 7200 * 1000000) AS pane,
         value FROM events),
pq AS (
  SELECT pane, CAST(COUNT(*) AS DOUBLE) AS n,
         quantile_cont(value, [0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 0.96, 0.97, 0.98, 0.99, 0.995, 0.999, 1.0]) AS qs
  FROM b GROUP BY pane),
idx AS (SELECT pane, CAST(row_number() OVER (ORDER BY pane) - 1 AS DOUBLE) AS i
        FROM pq),
-- parallel unnest: grid values zipped with their band weights (mirrors
-- streaming/ew.py EW_GRID_QS / EW_GRID_BANDS verbatim)
grid AS (SELECT pane, n, unnest(qs) AS v,
                unnest([0.025, 0.05, 0.049999999999999996, 0.05, 0.05, 0.04999999999999999, 0.04999999999999999, 0.05000000000000002, 0.05000000000000002, 0.04999999999999999, 0.05000000000000002, 0.04999999999999999, 0.04999999999999999, 0.04999999999999999, 0.04999999999999999, 0.050000000000000044, 0.04999999999999999, 0.04999999999999999, 0.04999999999999999, 0.02999999999999997, 0.010000000000000009, 0.010000000000000009, 0.010000000000000009, 0.007500000000000007, 0.004500000000000004, 0.0025000000000000022, 0.0005000000000000004]) AS band
         FROM pq),
pairs AS (
  SELECT t.pane AS tpane, g.v,
         pow(0.5, (t.i - s.i) / 4.0) * g.n * g.band AS w
  FROM grid g JOIN idx s ON g.pane = s.pane
  JOIN idx t ON s.i <= t.i),
tot AS (SELECT tpane, SUM(w) AS tw FROM pairs GROUP BY tpane),
cum AS (
  SELECT tpane, v,
         SUM(w) OVER (PARTITION BY tpane ORDER BY v DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM pairs),
cut AS (
  SELECT c.tpane, MAX(c.v) AS cutoff
  FROM cum c JOIN tot USING (tpane)
  WHERE c.cw >= (1.0 - 95.0 / 100.0) * tot.tw
  GROUP BY c.tpane),
lab AS (
  SELECT b.pane,
         CASE WHEN b.value > cut.cutoff THEN 1.0 ELSE 0.0 END AS o
  FROM b LEFT JOIN cut ON b.pane = cut.tpane)
SELECT strftime(pane, '%Y-%m-%d %H:%M') AS pane,
       CAST(SUM(o) AS BIGINT) AS n_outliers,
       COUNT(*) AS n
FROM lab GROUP BY pane ORDER BY pane
"""

ORACLES["q37_transcript_anomaly_diff"] = f"""
WITH f AS (
  SELECT lang, source,
         CAST(len({TOKS}) AS DOUBLE) AS n,
         CAST(len(list_distinct({TOKS})) AS DOUBLE) AS nu
  FROM documents),
r AS (
  SELECT lang, source,
         CASE WHEN n > 0 THEN 1.0 - nu / n ELSE 0.0 END AS rep,
         ln(1.0 + n) AS ll
  FROM f),
med AS (SELECT quantile_cont(ll, 0.5) AS m FROM r),
madv AS (SELECT quantile_cont(abs(ll - (SELECT m FROM med)), 0.5) AS mad FROM r),
lab AS (
  SELECT lang, source,
         CASE WHEN rep > 0.5 OR
                   abs(ll - (SELECT m FROM med))
                     / ((SELECT mad FROM madv) * 1.4826) / 6.0
                   > 0.5 * ln(3.0)
              THEN 1.0 ELSE 0.0 END AS o
  FROM r),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
gs AS (SELECT lang, source, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((lang), (source), (lang, source)))
SELECT lang, source,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.05 AND (oc / tc) / (g.g_out / g.g_tot) >= 1.2
ORDER BY lang, source
"""

ORACLES["q38_ivf_ann"] = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 2),
v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 2),
sims AS (
  SELECT q.q_id, v.vec_id,
         CASE WHEN list_aggregate(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
                AND list_aggregate(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * x), 'sum') > 0
              THEN list_aggregate(list_transform(list_zip(v.embedding, q.q_vec),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(v.embedding,
                                          x -> CAST(x AS DOUBLE) * x), 'sum'))
                      * sqrt(list_aggregate(list_transform(q.q_vec,
                                            x -> CAST(x AS DOUBLE) * x), 'sum')))
              ELSE 0.0 END AS cs
  FROM v CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT q_id, vec_id, ROUND(cs, 6) AS cos_sim, rank
FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""

ORACLES["q40_sql_diff_surface"] = """
WITH lab AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
                    CASE WHEN l_discount >= 0.08 THEN 1.0 ELSE 0.0 END AS o
             FROM lineitem),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
-- containment (reference APriori): with min_ratio = 0 every order-1 itemset
-- with support >= 0.01 is KEEP, so the NEXT set is empty and no order-2
-- candidate is ever explored -> exactly the order-1 grouping sets
gs AS (SELECT rf, ls, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((rf), (ls)))
SELECT rf AS l_returnflag, ls AS l_linestatus,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.01
ORDER BY l_returnflag, l_linestatus
"""

# q41: the SAME fixed-seed projection matrix the Spark operator samples
import numpy as _np

_rp = _np.random.default_rng(11).normal(0.0, _np.sqrt(1.0 / 3), size=(2, 3))
_MCOLS = ["l_quantity", "l_extendedprice", "l_discount"]
_mm = ", ".join(
    f"LEAST(0.0, MIN({c})) AS lo{i}, GREATEST(0.0, MAX({c})) AS hi{i}"
    for i, c in enumerate(_MCOLS))
_norm = ", ".join(
    f"({c} - lo{i}) / (hi{i} - lo{i}) AS n{i}" for i, c in enumerate(_MCOLS))
_proj = ", ".join(
    "ROUND(" + " + ".join(f"n{j} * {_rp[i, j]!r}" for j in range(3))
    + f", 6) AS rp_{i}" for i in range(2))
ORACLES["q41_random_projection"] = f"""
WITH mm AS (SELECT {_mm} FROM lineitem),
n AS (SELECT l_orderkey, l_linenumber, {_norm} FROM lineitem, mm)
SELECT l_orderkey, l_linenumber, {_proj}
FROM n ORDER BY l_orderkey, l_linenumber LIMIT 2000
"""

ORACLES["q42_embedding_dedup"] = """
WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 250),
d AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             sqrt(list_aggregate(list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * x), 'sum')) AS nn
      FROM v),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN a.nn > 0 AND b.nn > 0
              THEN list_aggregate(list_transform(list_zip(a.e, b.e),
                                  p -> p[1] * p[2]), 'sum') / (a.nn * b.nn)
              ELSE 0.0 END AS cs
  FROM d a JOIN d b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(cs, 6) AS cos_sim
FROM pairs WHERE cs >= 0.25 ORDER BY id_a, id_b
"""

ORACLES["q43_pipeline_runner"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
                    quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem),
lab AS (SELECT l_returnflag, l_linestatus,
               CASE WHEN l_extendedprice > (SELECT hi FROM cut)
                      OR l_extendedprice < (SELECT lo FROM cut)
                    THEN 1.0 ELSE 0.0 END AS o
        FROM lineitem),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
gs AS (SELECT l_returnflag, l_linestatus, SUM(o) AS oc,
              CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                        (l_returnflag, l_linestatus)))
SELECT l_returnflag, l_linestatus,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.01
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""

ORACLES["q44_metric_bucketize"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                    quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem)
SELECT CASE WHEN l_extendedprice < (SELECT q1 FROM cut) THEN 0
            WHEN l_extendedprice < (SELECT q3 FROM cut) THEN 1
            ELSE 2 END AS bucket,
       COUNT(*) AS n,
       ROUND(AVG(l_discount), 6) AS avg_disc
FROM lineitem GROUP BY 1 ORDER BY bucket
"""

ORACLES["q45_fd_pruning"] = """
WITH cut AS (SELECT quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem),
lab AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(year(l_shipdate) AS VARCHAR) AS sm,
               CASE WHEN l_extendedprice > (SELECT hi FROM cut) THEN 1.0 ELSE 0.0 END AS o
        FROM lineitem),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
-- FD pair (rf, ls) excluded from the lattice
gs AS (SELECT rf, ls, sm, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((rf), (ls), (sm), (rf, sm), (ls, sm)))
SELECT rf AS l_returnflag, ls AS l_linestatus, sm AS ship_year,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.01
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST,
         ship_year NULLS LAST
"""

ORACLES["q46_prefilter_min_support"] = """
WITH lab AS (SELECT o_orderpriority AS op,
                    CAST(year(o_orderdate) AS VARCHAR) AS sp,
                    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS o
             FROM orders),
g AS (SELECT SUM(o) AS g_out, CAST(COUNT(*) AS DOUBLE) AS g_tot FROM lab),
gs AS (SELECT op, sp, SUM(o) AS oc, CAST(COUNT(*) AS DOUBLE) AS tc
       FROM lab GROUP BY GROUPING SETS ((op), (sp), (op, sp)))
SELECT op AS o_orderpriority, sp AS order_year,
       ROUND(oc / g.g_out, 6) AS support,
       ROUND((oc / tc) / (g.g_out / g.g_tot), 6) AS global_ratio,
       CAST(oc AS BIGINT) AS outlier_count,
       CAST(tc AS BIGINT) AS total_count
FROM gs, g
WHERE oc / g.g_out >= 0.05
ORDER BY o_orderpriority NULLS LAST, order_year NULLS LAST
"""

ORACLES["q47_autocorrelation"] = """
WITH s AS (SELECT user_id, value, event_id FROM events WHERE user_id < 10),
m AS (SELECT user_id, AVG(value) AS mu FROM s GROUP BY user_id),
c AS (SELECT s.user_id, (s.value - m.mu) AS xc,
             ROW_NUMBER() OVER (PARTITION BY s.user_id ORDER BY s.event_id) AS rn
      FROM s JOIN m ON s.user_id = m.user_id),
l AS (SELECT user_id, xc,
             LEAD(xc, 1) OVER (PARTITION BY user_id ORDER BY rn) AS x1,
             LEAD(xc, 2) OVER (PARTITION BY user_id ORDER BY rn) AS x2,
             LEAD(xc, 3) OVER (PARTITION BY user_id ORDER BY rn) AS x3
      FROM c)
SELECT user_id,
       ROUND(SUM(xc * x1) / SUM(xc * xc), 6) AS acf1,
       ROUND(SUM(xc * x2) / SUM(xc * xc), 6) AS acf2,
       ROUND(SUM(xc * x3) / SUM(xc * xc), 6) AS acf3
FROM l GROUP BY user_id ORDER BY user_id
"""
