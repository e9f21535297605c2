"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship classify→DIFF explanation on sf0.001.
`queries()` — one entry per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline ops), each (spark, sf_dir) → DataFrame.
`oracle_sql()` — DuckDB-equivalent SQL per query (omitted only for ops whose
semantics aren't SQL-expressible: index-path BM25, MinHash/SimHash with
engine-specific hashes, streaming state, multimodal stubs → rows-only checks).

Determinism discipline for value-hash parity:
- every computed column aliased identically on both sides;
- money sums in DECIMAL (exact) then cast to double;
- float ratios/scores rounded (6-9 dp) AFTER identical-formula computation;
- rankings ordered by (rounded score, id) so ties break identically;
- timestamps formatted to strings (Spark session TZ pinned to UTC).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------- entry ---

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: percentile-classify lineitem prices, DIFF ON order/line
    attributes (the reference's classify→summarize pipeline,
    core/.../BasicBatchPipeline.java:193-215)."""
    from macrobase_spark.operators import classify_percentile, diff

    sf = "/root/testdata/sf0.001"
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    joined = li.join(
        F.broadcast(orders.select("o_orderkey", "o_orderpriority")),
        li.l_orderkey == orders.o_orderkey,
    )
    labeled = classify_percentile(joined, "l_extendedprice", percentile=1.0,
                                  include_low=False)
    return diff(
        labeled,
        ["l_returnflag", "l_linestatus", "o_orderpriority"],
        min_support=0.05, min_ratio=1.1, max_order=2,
    )


# ------------------------------------------------------------- helpers ---

_DEC = "decimal(18,4)"


def _dec_sum(col):
    return F.sum(F.col(col).cast(_DEC))


# -------------------------------------------------------------- queries ---

def q01_scan_project_filter(spark, sf):
    """Projection + predicate pushdown to the parquet scan (§2.2)."""
    return (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .filter((F.col("l_shipdate") >= "1995-06-01") & (F.col("l_discount") > 0.05)
                & (F.col("l_quantity") < 10))
        .select("l_orderkey", "l_quantity",
                F.col("l_extendedprice").alias("price"))
        .orderBy("l_orderkey", "price", "l_quantity")
        .limit(500)
    )


def q02_agg_groupby(spark, sf):
    """TPC-H Q1-style grouped aggregation (§2.4 two-phase agg)."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").cast("double").alias("sum_qty"),
            _dec_sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice").cast(_DEC) *
                   (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)))
                  .cast(_DEC)).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q03_orderby_limit(spark, sf):
    """Top-k = orderBy + limit (§2.7)."""
    return (
        _t(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


def q04_join_inner(spark, sf):
    """Inner equi-join, broadcast dim (§2.3)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             _dec_sum("o_totalprice").cast("double").alias("revenue"))
        .orderBy("c_mktsegment")
    )


def q05_join_left(spark, sf):
    """Left outer join with null-group (§2.3 join types)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .groupBy(F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


def q06_join_semi(spark, sf):
    """Left-semi join (EXISTS) (§2.3 semi-join / DIFF-JOIN step 2)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


def q07_join_anti(spark, sf):
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n_no_orders"))
        .orderBy("c_mktsegment")
    )


def q08_natural_join(spark, sf):
    """NATURAL-join equivalent: join on the single common key (§2.3)."""
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .orderBy("region", "nation")
    )


def q09_union_distinct(spark, sf):
    """unionAll + DISTINCT (§2.7)."""
    e = _t(spark, sf, "events")
    a = e.filter(F.col("value") > 15).select("event_type")
    b = e.filter(F.col("user_id") < 10).select("event_type")
    return a.unionByName(b).distinct().orderBy("event_type")


def q10_window_topk_per_group(spark, sf):
    """Top-3 orders per customer via ranking window (§2.7 top-k)."""
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("o_custkey") < 50))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


def q11_rollup(spark, sf):
    """ROLLUP grouping (§2.4 grouping free in Spark)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


def q12_moving_avg(spark, sf):
    """Trailing moving average (reference MovingAverage §2.8)."""
    e = _t(spark, sf, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-9, 0)
    return (
        e.withColumn("mov_avg", F.round(F.avg("value").over(w), 6))
        .select("event_id", "user_id", "mov_avg")
        .orderBy("event_id")
        .limit(1000)
    )


def q13_classify_percentile(spark, sf):
    """PercentileClassifier semantics (§2.5): two-sided 1% cutoffs on
    l_extendedprice → outlier counts by return flag."""
    from macrobase_spark.operators import classify_percentile

    li = _t(spark, sf, "lineitem")
    labeled = classify_percentile(li, "l_extendedprice", percentile=1.0)
    return (
        labeled.groupBy("l_returnflag")
        .agg(F.sum("_OUTLIER").cast("long").alias("n_outliers"),
             F.count("*").alias("n_rows"))
        .orderBy("l_returnflag")
    )


def q14_classify_predicate(spark, sf):
    """PredicateClassifier (§2.5)."""
    from macrobase_spark.operators import classify_predicate

    e = _t(spark, sf, "events")
    labeled = classify_predicate(e, "event_type", "==", "error")
    return (
        labeled.groupBy("user_id")
        .agg(F.sum("_OUTLIER").cast("long").alias("n_errors"))
        .filter(F.col("n_errors") > 0)
        .orderBy("user_id")
    )


def q15_count_mean_shift(spark, sf):
    """CountMeanShiftClassifier 4 sufficient-stat columns (§2.5) aggregated
    per event_type + the mean_shift quality metric (§2.4)."""
    from macrobase_spark.operators import classify_count_mean_shift

    e = _t(spark, sf, "events")
    labeled = classify_count_mean_shift(e, "event_type", "value", "==", "error")
    return (
        labeled.groupBy(F.expr("user_id % 10").alias("cohort"))
        .agg(
            F.sum("_OUTLIERCOUNT").alias("oc"),
            F.sum("_INLIERCOUNT").alias("ic"),
            F.round(F.sum("_OUTLIERMEANSUM"), 4).alias("oms"),
            F.round(F.sum("_INLIERMEANSUM"), 4).alias("ims"),
        )
        .withColumn(
            "mean_shift",
            F.round((F.col("oms") / F.col("oc")) / (F.col("ims") / F.col("ic")), 6),
        )
        .orderBy("cohort")
    )


def q16_mad_score(spark, sf):
    """MAD scorer (§2.6, legacy/.../stats/MAD.java): robust outlier counts."""
    from macrobase_spark.operators import mad_score

    li = _t(spark, sf, "lineitem")
    scored = mad_score(li, "l_extendedprice")
    return (
        scored.groupBy("l_returnflag")
        .agg(F.sum(F.when(F.col("_SCORE") > 3.0, 1).otherwise(0)).alias("n_mad3"))
        .orderBy("l_returnflag")
    )


def q17_zscore(spark, sf):
    """ZScore (§2.6)."""
    from macrobase_spark.operators import zscore

    e = _t(spark, sf, "events")
    scored = zscore(e, "value")
    return (
        scored.groupBy("event_type")
        .agg(F.sum(F.when(F.abs(F.col("_SCORE")) > 2.0, 1).otherwise(0)).alias("n_z2"))
        .orderBy("event_type")
    )


def q18_percentile_udf(spark, sf):
    """Reference `percentile()` UDF semantics: (1-indexed MIN rank)/n, ties
    share the min position (lib/.../analysis/MBFunction.java:128-161) — NOT
    percent_rank."""
    from macrobase_spark.operators import percentile_col

    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    p = percentile_col(o, "o_totalprice", output_col="pct")
    return (
        p.groupBy("o_orderpriority")
        .agg(F.round(F.avg("pct"), 9).alias("avg_pct"))
        .orderBy("o_orderpriority")
    )


def q19_normalize_udf(spark, sf):
    """Reference `normalize()` UDF: shift-to-positive /(max+offset)
    (MBFunction.java:102-126)."""
    from macrobase_spark.operators import normalize_col

    o = _t(spark, sf, "orders").select("o_orderpriority", "o_totalprice")
    nrm = normalize_col(o, "o_totalprice", output_col="norm")
    return (
        nrm.groupBy("o_orderpriority")
        .agg(F.round(F.avg("norm"), 9).alias("avg_norm"))
        .orderBy("o_orderpriority")
    )


def q20_winsorize(spark, sf):
    """Winsorizer (§2.6)."""
    from macrobase_spark.operators import winsorize

    li = _t(spark, sf, "lineitem")
    wz = winsorize(li, "l_extendedprice", p=5.0, output_col="wp")
    return (
        wz.groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("wp").cast(_DEC)).cast("double"), 2).alias("sum_wins"))
        .orderBy("l_returnflag")
    )


def q21_diff_global_ratio(spark, sf):
    """DIFF (§2.4): outliers = price > p99, ON (l_returnflag, l_linestatus),
    order ≤ 2, global_ratio metric — the APrioriLinear pipeline as one
    grouping-sets pass."""
    from macrobase_spark.operators import classify_percentile, diff

    li = _t(spark, sf, "lineitem")
    labeled = classify_percentile(li, "l_extendedprice", percentile=1.0,
                                  include_low=False)
    expl = diff(labeled, ["l_returnflag", "l_linestatus"],
                min_support=0.01, min_ratio=0.0, max_order=2)
    return expl.select(
        "l_returnflag", "l_linestatus",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy(F.col("global_ratio").desc(),
              F.col("l_returnflag").asc_nulls_last(),
              F.col("l_linestatus").asc_nulls_last())


def q22_diff_risk_ratio(spark, sf):
    """DIFF with risk_ratio incl. reference edge cases (RiskRatio.java)."""
    from macrobase_spark.operators import classify_predicate, diff

    e = _t(spark, sf, "events")
    labeled = classify_predicate(e, "event_type", "==", "error")
    expl = diff(labeled.withColumn("cohort", F.expr("cast(user_id % 5 as string)")),
                ["cohort"], min_support=0.0, ratio_metric="risk_ratio",
                min_ratio=0.0, max_order=1)
    return expl.select(
        "cohort",
        F.round("support", 6).alias("support"),
        F.round("risk_ratio", 6).alias("risk_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("cohort")


def q23_diff_prevalence_ratio(spark, sf):
    """DIFF with prevalence_ratio (+1 smoothing semantics)."""
    from macrobase_spark.operators import classify_predicate, diff

    o = _t(spark, sf, "orders")
    labeled = classify_predicate(o, "o_orderstatus", "==", "F")
    expl = diff(labeled, ["o_orderpriority"], min_support=0.0,
                ratio_metric="prevalence_ratio", min_ratio=0.0, max_order=1)
    return expl.select(
        "o_orderpriority",
        F.round("support", 6).alias("support"),
        F.round("prevalence_ratio", 6).alias("prevalence_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("o_orderpriority")


def q24_diff_join(spark, sf):
    """DIFF-JOIN co-optimization (§2.3/QueryEngine.java:271-318): DIFF of
    (high-discount lineitem ⋈ part) vs (low-discount ⋈ part) ON p_brand
    without materializing either join."""
    from macrobase_spark.operators.diff import diff_join

    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    out_fk = li.filter(F.col("l_discount") >= 0.08).select(F.col("l_partkey").alias("p_partkey"))
    in_fk = li.filter(F.col("l_discount") < 0.08).select(F.col("l_partkey").alias("p_partkey"))
    expl = diff_join(out_fk, in_fk, part, "p_partkey", ["p_brand"],
                     min_support=0.0, min_ratio=0.0, max_order=1)
    return expl.select(
        "p_brand",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("p_brand")


def q25_token_count(spark, sf):
    """Token counting over documents (§ text analysis)."""
    from macrobase_spark.functions import token_count

    d = _t(spark, sf, "documents")
    return (
        d.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
        .orderBy("doc_id")
    )


def q26_dedup_exact(spark, sf):
    """Exact dedup by content hash (§ dedup): group count per digest."""
    d = _t(spark, sf, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_key"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("rep_id"))
        .filter(F.col("n_copies") >= 1)
        .orderBy("rep_id")
    )


def q27_fingerprint(spark, sf):
    """Token-set fingerprint (order/dup-insensitive near-dup key)."""
    from macrobase_spark.functions import fingerprint

    d = _t(spark, sf, "documents")
    return (
        d.groupBy(fingerprint("text").alias("fp"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("rep_id"))
        .orderBy("rep_id")
    )


def q28_quality_score(spark, sf):
    """Document quality heuristic (§ text analysis)."""
    from macrobase_spark.functions import quality_score

    d = _t(spark, sf, "documents")
    return (
        d.select("doc_id", quality_score("text").alias("quality"))
        .orderBy("doc_id").limit(500)
    )


def q29_lang_id(spark, sf):
    """Stopword-overlap language ID (§ text analysis)."""
    from macrobase_spark.functions import lang_id

    d = _t(spark, sf, "documents")
    return (
        d.select("doc_id", lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred").agg(F.count("*").alias("n"))
        .orderBy("lang_pred")
    )


def q30_term_stats(spark, sf):
    """Inverted-index term statistics (df, cf) — the posting-list aggregate
    expressed relationally."""
    from macrobase_spark.functions.text import tokenize_expr

    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(tokenize_expr("text")).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(50)
    )


def q31_bm25_relational(spark, sf):
    """BM25 top-10 (k1=1.2, b=0.75) for a fixed query over `documents`,
    expressed as pure relational ops (tokenize→tf→df→score) — the oracle-
    checkable twin of the index path (index path itself is rank-identity
    tested in tests/test_index_bm25.py)."""
    from macrobase_spark.functions.text import tokenize_expr

    d = _t(spark, sf, "documents")
    q_terms = ["merge", "scan", "row"]
    toks = d.select("doc_id", F.explode(tokenize_expr("text")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs = d.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    tf = (
        toks.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            idf * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)


def q32_cosine_topk(spark, sf):
    """Brute-force cosine top-k ANN baseline over embeddings (§ similarity)."""
    from macrobase_spark.pipelines import cosine_topk_bruteforce

    emb = _t(spark, sf, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    vectors = emb.filter(F.col("vec_id") >= 3)
    res = cosine_topk_bruteforce(vectors, queries, k=5)
    return res.select(
        "q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("q_id", "rank")


def q33_tumbling_window(spark, sf):
    """Tumbling-window aggregation (§2.8 WindowedOperator)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


def q34_sessionize(spark, sf):
    """Sessionization: gap > 30 min starts a new session (§2.8 analogue)."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; NTZ→long needs an LTZ hop (session
    # TZ is pinned to UTC so epoch seconds equal DuckDB's epoch())
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    sess = (
        e.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_s").over(
            w.rowsBetween(W.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id")
        .agg(F.max("sess_id").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


def q35_ngram_jaccard(spark, sf):
    """Exact 3-gram Jaccard near-dup pairs over a document subset (§ dedup)."""
    from macrobase_spark.pipelines import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    pairs = ngram_jaccard_pairs(d, n=2, min_jaccard=0.05)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q36_diff_mean(spark, sf):
    """Mean-deviation summarizer (APLMeanSummarizer §2.4): combos whose mean
    price deviates ≥0.05 global std."""
    from macrobase_spark.operators.diff import diff_mean

    li = _t(spark, sf, "lineitem")
    expl = diff_mean(li, ["l_returnflag", "l_linestatus"], "l_extendedprice",
                     min_support=0.01, min_mean_dev=0.005, max_order=2)
    return expl.select(
        "l_returnflag", "l_linestatus",
        F.round("support", 6).alias("support"),
        F.round("mean_deviation", 6).alias("mean_deviation"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy(F.col("mean_deviation").desc(),
              F.col("l_returnflag").asc_nulls_last(),
              F.col("l_linestatus").asc_nulls_last())


def q37_grouped_mad(spark, sf):
    """Per-group train-then-score (MBGroupBy §2.8): MAD within event_type."""
    from macrobase_spark.operators.transform import grouped_mad_score

    e = _t(spark, sf, "events")
    scored = grouped_mad_score(e, ["event_type"], "value")
    return (
        scored.groupBy("event_type")
        .agg(F.sum(F.when(F.col("_SCORE") > 3.0, 1).otherwise(0)).alias("n_mad3"),
             F.count("*").alias("n"))
        .orderBy("event_type")
    )


def q38_heavy_hitters(spark, sf):
    """Heavy hitters (AMC §2.8): part brands covering ≥2% of lineitems."""
    from macrobase_spark.operators.transform import heavy_hitters

    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    joined = li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                     li.l_partkey == part.p_partkey)
    return heavy_hitters(joined, "p_brand", threshold_frac=0.02, exact=True)


def q39_count_mean_shift_diff(spark, sf):
    """CountMeanShift classify → summarize (§2.4/2.5 full pipeline)."""
    from macrobase_spark.operators import classify_count_mean_shift
    from macrobase_spark.operators.diff import diff_count_mean_shift

    o = _t(spark, sf, "orders")
    labeled = classify_count_mean_shift(o, "o_orderstatus", "o_totalprice", "==", "F")
    expl = diff_count_mean_shift(labeled, ["o_orderpriority"],
                                 min_support=0.0, min_mean_shift=0.0, max_order=1)
    return expl.select(
        "o_orderpriority",
        F.round("support", 6).alias("support"),
        F.round("mean_shift", 6).alias("mean_shift"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("o_orderpriority")


# ------- rows-only entries (no SQL-expressible oracle; driver records a
# ------- weaker rows-only check; semantics are pytest-verified instead)

def q40_bm25_index_path(spark, sf):
    """BM25 through the real inverted index (build → query). Rank-identity
    vs the exact oracle is asserted in tests/test_index_bm25.py; here the
    driver checks stable schema/rows."""
    import hashlib
    import tempfile

    from macrobase_spark.index import build_index, bm25_topk

    d = _t(spark, sf, "documents").withColumn("conv_id", F.lit("d")).withColumn(
        "turn_idx", F.col("doc_id").cast("int"))
    key = hashlib.md5(sf.encode()).hexdigest()[:10]
    cache = os.path.join(tempfile.gettempdir(), f"mb_idx_{key}")
    if not os.path.exists(os.path.join(cache, "stats.json")):
        build_index(d, cache, num_buckets=4, hot_df_threshold=10**9)
    return bm25_topk(spark, cache, "merge scan row", k=10).select(
        "doc_id", F.round("score", 6).alias("score"))


def q41_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup candidate pairs (engine-specific hashes →
    rows-only; estimator accuracy pytest-verified)."""
    from macrobase_spark.pipelines import minhash_lsh_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_pairs(d, num_hashes=32, bands=8, min_jaccard=0.5).orderBy(
        "id_a", "id_b")


def q42_simhash(spark, sf):
    """SimHash fingerprints + near-pairs (xxhash64-specific → rows-only)."""
    from macrobase_spark.pipelines.dedup import simhash_64, simhash_near_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return simhash_near_pairs(simhash_64(d), max_hamming=6).orderBy("id_a", "id_b")


def q43_windowed_diff(spark, sf):
    """Sliding-window DIFF over the events stream (§2.8)."""
    from macrobase_spark.operators import classify_predicate
    from macrobase_spark.streaming import windowed_diff

    e = _t(spark, sf, "events")
    labeled = classify_predicate(e, "event_type", "==", "error")
    return windowed_diff(
        labeled.withColumn("cohort", F.expr("cast(user_id % 5 as string)")),
        "ts", ["cohort"], window_length="6 hours",
        min_support=0.0, min_ratio=1.05, max_order=1,
    ).withColumn("support", F.round("support", 6)).withColumn(
        "global_ratio", F.round("global_ratio", 6))


def q44_multimodal_features(spark, sf):
    """Multimodal binary-column plumbing (stubbed decode, real schema/UDF
    batch shape)."""
    from macrobase_spark.pipelines.multimodal import extract_features, synth_media

    media = synth_media(spark, n=64)
    feats = extract_features(media)
    return feats.select("media_id", "kind", F.size("feature").alias("feat_dim"), "ok")


def q50_set_ops(spark, sf):
    """INTERSECT / EXCEPT (§2.7 — grammar-only in the reference, native
    here): nations appearing in both halves of a customer split, minus a
    filtered set."""
    c = _t(spark, sf, "customer")
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_nationkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    neg = c.filter((F.col("c_mktsegment") == "BUILDING")
                   & (F.col("c_acctbal") < 0)).select("c_nationkey")
    # INTERSECT (set) of nation sets + EXCEPT ALL (bag) multiplicity math
    inter = rich.intersect(bld)
    bag = bld.exceptAll(neg)
    return (
        bag.join(inter, "c_nationkey", "left_semi")
        .groupBy("c_nationkey").agg(F.count("*").alias("n"))
        .orderBy("c_nationkey")
    )


def q51_join_outer(spark, sf):
    """FULL OUTER join (§2.3 — grammar-only in the reference, native here)."""
    big_cust = (
        _t(spark, sf, "orders").groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders")).filter(F.col("n_orders") >= 12)
    )
    rich_cust = (
        _t(spark, sf, "customer").filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey"), "c_acctbal")
    )
    j = big_cust.join(rich_cust, big_cust.o_custkey == rich_cust.c_custkey, "full_outer")
    return (
        j.select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("acctbal"),
        ).orderBy("custkey")
    )


def q52_contextual_mad(spark, sf):
    """Contextual outlier detection (§2.9): per-context MAD outlier rates
    over (event_type, cohort) contexts."""
    from macrobase_spark.operators.contextual import contextual_mad_outliers

    e = _t(spark, sf, "events").withColumn(
        "cohort", F.expr("cast(user_id % 3 as string)"))
    res = contextual_mad_outliers(e, ["event_type", "cohort"], "value",
                                  score_cutoff=2.0, min_context_size=50,
                                  max_order=2)
    return res.select(
        "event_type", "cohort",
        F.col("outlier_count").cast("long").alias("outlier_count"),
        "context_size",
        F.round("outlier_rate", 6).alias("outlier_rate"),
    ).orderBy(F.col("outlier_rate").desc(),
              F.col("event_type").asc_nulls_last(),
              F.col("cohort").asc_nulls_last())


def q53_ew_percentile(spark, sf):
    """EW streaming percentile classifier (§2.5/2.8 v0 semantics) — decayed
    per-pane thresholds; rows-only (decayed weighted percentile has no
    closed-form SQL)."""
    from macrobase_spark.streaming.ew import ew_percentile_classify

    e = _t(spark, sf, "events")
    out = ew_percentile_classify(e, "ts", "value", percentile=95.0,
                                 pane="2 hours", half_life_panes=4.0)
    return (
        out.groupBy("_pane").agg(
            F.sum("_OUTLIER").cast("long").alias("n_outliers"),
            F.count("*").alias("n"))
        .orderBy("_pane")
        .select(F.date_format("_pane", "yyyy-MM-dd HH:mm").alias("pane"),
                "n_outliers", "n")
    )


def q46_fpgrowth_diff(spark, sf):
    """FP-Growth emerging-itemset summarizer (§2.4 FPGrowthSummarizer).
    Itemsets are projected as a sorted comma-joined string so the result is
    hashable/oracle-comparable (grouping-sets enumeration is the DuckDB
    oracle — identical itemset lattice at max_order ≤ |attrs|)."""
    from macrobase_spark.operators import classify_percentile
    from macrobase_spark.operators.fpgrowth import fpgrowth_diff

    li = _t(spark, sf, "lineitem")
    labeled = classify_percentile(li, "l_extendedprice", percentile=1.0,
                                  include_low=False)
    expl = fpgrowth_diff(labeled, ["l_returnflag", "l_linestatus"],
                         min_support=0.05, min_risk_ratio=0.0, max_order=2)
    return expl.select(
        F.concat_ws(",", "items").alias("items"),
        F.round("support", 6).alias("support"),
        F.round("risk_ratio", 6).alias("risk_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("items")


def q47_quantile_classifier(spark, sf):
    """Cubed quantile classifier (§2.5 QuantileClassifier) — piecewise
    interpolation; rows-only (no closed-form SQL oracle)."""
    from macrobase_spark.operators.classify import classify_quantile_cubed

    li = _t(spark, sf, "lineitem")
    cube = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("double").alias("count"),
        F.min("l_extendedprice").alias("q0"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("q50"),
        F.max("l_extendedprice").alias("q100"),
    )
    out = classify_quantile_cubed(cube, "count", {0.0: "q0", 0.5: "q50", 1.0: "q100"},
                                  percentile=5.0)
    return out.select("l_returnflag", "l_linestatus",
                      F.round("_OUTLIER", 4).alias("expected_outliers"))


def q48_arithmetic_classifier(spark, sf):
    """Cubed arithmetic classifier (§2.5 ArithmeticClassifier: weighted
    percentile + normal-CDF tails) — rows-only (erf not in DuckDB)."""
    from macrobase_spark.operators.classify import classify_arithmetic_cubed

    li = _t(spark, sf, "lineitem")
    cube = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("double").alias("count"),
        F.avg("l_extendedprice").alias("mean"),
        F.stddev_pop("l_extendedprice").alias("std"),
    )
    out = classify_arithmetic_cubed(cube, "count", "mean", "std", percentile=2.0)
    return out.select("l_returnflag", "l_linestatus",
                      F.round("_OUTLIER", 4).alias("expected_outliers"))


def q49_weighted_sample(spark, sf):
    """Weighted reservoir sampling (AChao §2.8) — stochastic → rows-only."""
    from macrobase_spark.operators.transform import weighted_reservoir_sample

    e = _t(spark, sf, "events")
    s = weighted_reservoir_sample(e, frac=0.05, weight_col="value", seed=1)
    return s.agg(F.count("*").alias("n_sampled"),
                 F.round(F.avg("value"), 2).alias("avg_value"))


def q45_lsh_ann(spark, sf):
    """LSH-bucketed approximate cosine top-k (scale path; recall<1 →
    rows-only; bucketing correctness pytest-verified)."""
    from macrobase_spark.pipelines import lsh_bucketed_topk

    emb = _t(spark, sf, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 2)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return lsh_bucketed_topk(emb.filter(F.col("vec_id") >= 2), queries, k=5,
                             n_planes=4).select(
        "q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")


def q55_ivf_ann(spark, sf):
    """IVF coarse-quantizer ANN (k-means cells + n_probe rescoring) — the
    second scale path for similarity search; recall<1 → rows-only (exactness
    at full probe pytest-verified)."""
    from macrobase_spark.pipelines.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    queries_df = (
        emb.filter(F.col("vec_id") < 2)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    res = ivf_topk(emb.filter(F.col("vec_id") >= 2), queries_df, k=5,
                   n_centroids=8, n_probe=3)
    return res.select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
                      "rank").orderBy("q_id", "rank")


def q54_transcript_anomaly_diff(spark, sf):
    """Track A+B synthesis (north star: 'DIFF/explanation capability layered
    on top'): fused-pass anomaly scores over synthetic transcripts →
    classify → DIFF ON (role, tool). The generator plants degenerate turns
    3x as often under tool='browser'; the explanation must surface it
    (asserted in tests/test_index_bm25.py). Deterministic synthetic input →
    rows-only gate."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.tokenize import turn_features, with_anomaly_score
    from macrobase_spark.operators import diff

    t = with_doc_id(synth_transcripts(spark, n_convs=300, seed=42, p_anomaly=0.05))
    feats = with_anomaly_score(turn_features(t).drop("text"))
    labeled = feats.withColumn(
        "_OUTLIER", F.when(F.col("anomaly") > 0.5, 1.0).otherwise(0.0))
    expl = diff(labeled.fillna("none", ["tool"]), ["role", "tool"],
                min_support=0.05, min_ratio=1.2, max_order=2)
    return expl.select(
        "role", "tool",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    )


def q56_mcd_mahalanobis(spark, sf):
    """MinCovDet robust multi-dim Mahalanobis scoring (§2.6 — the
    reference's DEFAULT scorer for >1 metric, MacroBaseConf.java:180) —
    deterministic fit (hash-sampled, fixed seed) but the FAST-MCD iteration
    has no SQL form → rows-only; planted-covariance pytest in
    tests/test_mcd.py."""
    from macrobase_spark.operators.mcd import mcd_score

    li = _t(spark, sf, "lineitem")
    scored = mcd_score(li, ["l_quantity", "l_extendedprice"], seed=11)
    return (
        scored.groupBy("l_returnflag")
        .agg(F.sum(F.when(F.col("_SCORE") > 3.0, 1).otherwise(0))
             .cast("long").alias("n_md3"),
             F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


def q57_sql_diff_surface(spark, sf):
    """The MacroBase SQL surface end-to-end (SqlBase.g4 DIFF/SPLIT grammar →
    diff() with the reference's containment pruning): with min_ratio=0 every
    passing order-1 itemset is emitted and (by containment,
    APrioriLinear.java:340-383) no higher order survives — SQL-expressible,
    hash-gated."""
    from macrobase_spark.sql import MacroBaseSQL

    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    mb = MacroBaseSQL(spark)
    res = mb.execute(
        "SELECT * FROM DIFF (SPLIT lineitem WHERE l_discount >= 0.08) "
        "ON l_returnflag, l_linestatus "
        "WITH MIN RATIO 0.0 MIN SUPPORT 0.01 MAX COMBO 2"
    )
    return res.select(
        "l_returnflag", "l_linestatus",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy("l_returnflag", "l_linestatus")


def q58_random_projection(spark, sf):
    """Johnson–Lindenstrauss random projection + linear min-max normalizer
    (§2.6 Truncate/RandomProjection/LinearMetricNormalizer) — fixed-seed
    projection matrix embedded in the DuckDB oracle too → hash-gated."""
    from macrobase_spark.operators.transform import (
        linear_metric_normalizer, random_projection,
    )

    li = _t(spark, sf, "lineitem")
    norm = linear_metric_normalizer(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                  "l_discount"),
        ["l_quantity", "l_extendedprice", "l_discount"])
    proj = random_projection(
        norm, ["l_quantity", "l_extendedprice", "l_discount"], k=2, seed=11)
    return (
        proj.select("l_orderkey", "l_linenumber",
                    F.round("rp_0", 6).alias("rp_0"),
                    F.round("rp_1", 6).alias("rp_1"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(2000)
    )


def q59_embedding_dedup(spark, sf):
    """Embedding-cosine near-dup pairs (§ dedup family, exact baseline —
    the oracle twin of the LSH scale path; LSH recall pytest-verified)."""
    from macrobase_spark.pipelines.dedup import embedding_cosine_pairs

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 250)
    pairs = embedding_cosine_pairs(emb, threshold=0.25, method="exact")
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


def q60_pipeline_runner(spark, sf):
    """Config-driven pipeline (§3.2 BasicBatchPipeline YAML contract):
    percentile classify → aplinear DIFF, from a reference-style config
    dict — SQL-expressible, hash-gated."""
    from macrobase_spark.pipelines.runner import run_pipeline

    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_q60")
    conf = {
        "pipeline": "BasicBatchPipeline",
        "inputURI": "table://lineitem_q60",
        "classifier": "percentile",
        "metric": "l_extendedprice",
        "cutoff": 1.0,
        "includeHi": True,
        "includeLo": True,
        "summarizer": "aplinear",
        "attributes": ["l_returnflag", "l_linestatus"],
        "ratioMetric": "globalratio",
        "minRatioMetric": 0.0,
        "minSupport": 0.01,
        "maxOrder": 2,
    }
    expl = run_pipeline(spark, conf)
    return expl.select(
        "l_returnflag", "l_linestatus",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy(F.col("l_returnflag").asc_nulls_last(),
              F.col("l_linestatus").asc_nulls_last())


def q61_raw_classifier(spark, sf):
    """RawClassifier pass-through (§2.5, RawClassifier.java:17-24): the
    outlier count column is already present in cubed data."""
    from macrobase_spark.operators.classify import classify_raw

    cube = (
        _t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum(F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0))
             .alias("n_bad"),
             F.count("*").alias("n"))
    )
    out = classify_raw(cube, "n_bad")
    return out.select(
        "o_orderpriority",
        F.col("_OUTLIER").cast("long").alias("outliers"),
        F.col("n").alias("total"),
    ).orderBy("o_orderpriority")


def q62_metric_bucketize(spark, sf):
    """MetricBucketTransformer (§2.6): percentile-edge buckets turn a
    numeric metric into an explanation attribute; integer bucket ids keep
    the oracle engine-agnostic."""
    from macrobase_spark.operators.transform import metric_bucketize

    li = _t(spark, sf, "lineitem")
    b = metric_bucketize(li, "l_extendedprice", pcts=(25.0, 75.0),
                         output_col="bucket", as_index=True)
    return (
        b.groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"))
        .orderBy("bucket")
    )


def q63_fd_pruning(spark, sf):
    """Functional-dependency pruning (§2.4, APrioriLinear.java:231-233):
    combos containing an FD pair are never enumerated."""
    from macrobase_spark.operators import classify_percentile, diff

    li = _t(spark, sf, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("string"))
    labeled = classify_percentile(li, "l_extendedprice", percentile=1.0,
                                  include_low=False)
    expl = diff(labeled, ["l_returnflag", "l_linestatus", "ship_year"],
                min_support=0.01, min_ratio=0.0, max_order=2,
                fd_pairs=[("l_returnflag", "l_linestatus")])
    return expl.select(
        "l_returnflag", "l_linestatus", "ship_year",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy(F.col("l_returnflag").asc_nulls_last(),
              F.col("l_linestatus").asc_nulls_last(),
              F.col("ship_year").asc_nulls_last())


def q64_prefilter_min_support(spark, sf):
    """AttributeEncoder min-support prefilter (§2.4,
    AttributeEncoder.java:61-181): below-support order-1 values are NULLed
    before the grouping-sets pass — result-identical to the plain DIFF
    (any combo containing a dropped value is below support anyway), so the
    plain-DIFF SQL is the oracle while the prefilter code path executes."""
    from macrobase_spark.operators import classify_predicate, diff

    o = _t(spark, sf, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("string"))
    labeled = classify_predicate(o, "o_orderstatus", "==", "F")
    expl = diff(labeled, ["o_orderpriority", "order_year"],
                min_support=0.05, min_ratio=0.0, max_order=2,
                prefilter_min_support=True)
    return expl.select(
        "o_orderpriority", "order_year",
        F.round("support", 6).alias("support"),
        F.round("global_ratio", 6).alias("global_ratio"),
        F.col("outlier_count").cast("long").alias("outlier_count"),
        F.col("total_count").cast("long").alias("total_count"),
    ).orderBy(F.col("o_orderpriority").asc_nulls_last(),
              F.col("order_year").asc_nulls_last())


def q65_autocorrelation(spark, sf):
    """Per-series ACF (§2.6 Autocorrelation, FFT method) — the padded-FFT
    autocovariance equals the direct lag-sum definition, so the DuckDB
    oracle computes the same r_k/r_0 with LEAD windows."""
    from macrobase_spark.operators.timeseries import autocorrelation

    e = _t(spark, sf, "events").filter(F.col("user_id") < 10)
    res = autocorrelation(e, ["user_id"], "event_id", "value", max_lag=3)
    return res.select(
        "user_id",
        F.round(F.col("acf")[0], 6).alias("acf1"),
        F.round(F.col("acf")[1], 6).alias("acf2"),
        F.round(F.col("acf")[2], 6).alias("acf3"),
    ).orderBy("user_id")


def q66_kalman_ar(spark, sf):
    """Kalman smoothing + AR(p) one-step anomaly scores (§2.6 contrib
    time-series family) — sequential per-series recursions have no SQL
    form → rows-only; planted-signal pytest in
    tests/test_timeseries_density.py."""
    from macrobase_spark.operators.timeseries import ar_scores, kalman_smooth

    e = _t(spark, sf, "events").filter(F.col("user_id") < 20)
    sm = kalman_smooth(e, ["user_id"], "event_id", "value", q_scale=1e-3)
    sc = ar_scores(sm, ["user_id"], "event_id", "_SMOOTHED", p=2,
                   output_col="_AR")
    return (
        sc.groupBy("user_id")
        .agg(F.round(F.avg("_SMOOTHED"), 6).alias("avg_smoothed"),
             F.round(F.max("_AR"), 6).alias("max_ar_score"))
        .orderBy("user_id")
    )


def q67_kde_gmm(spark, sf):
    """KDE + GMM density scorers (§2.6 contrib KDE/mixture family) —
    sampled-kernel sums / EM fits have no SQL form → rows-only;
    planted-outlier pytest."""
    from macrobase_spark.operators.density import gmm_score, kde_score

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber",
                                          "l_quantity", "l_extendedprice")
    kde = kde_score(li, ["l_quantity", "l_extendedprice"], output_col="_KDE",
                    sample_limit=1024)
    both = gmm_score(kde, ["l_quantity", "l_extendedprice"], k=3,
                     output_col="_GMM", fit_sample_limit=5000, max_iter=25)
    return (
        both.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("_KDE") > F.lit(-1e-12), 1).otherwise(0))
            .cast("long").alias("n_kde_isolated"),
            F.round(F.min("_GMM"), 4).alias("min_gmm_nll"),
        )
    )


def q68_bm25_batch(spark, sf):
    """Batched BM25 (N queries, ONE scoring job) through the real index —
    per-query equality to bm25_topk is pytest-asserted exactly; rows-only
    driver gate on the stable output contract."""
    import hashlib
    import tempfile

    from macrobase_spark.index import build_index
    from macrobase_spark.index.bm25 import bm25_topk_batch

    d = _t(spark, sf, "documents").withColumn("conv_id", F.lit("d")).withColumn(
        "turn_idx", F.col("doc_id").cast("int"))
    key = hashlib.md5(sf.encode()).hexdigest()[:10]
    cache = os.path.join(tempfile.gettempdir(), f"mb_idx_{key}")
    if not os.path.exists(os.path.join(cache, "stats.json")):
        build_index(d, cache, num_buckets=4, hot_df_threshold=10**9)
    res = bm25_topk_batch(
        spark, cache,
        {"q1": "merge scan row", "q2": "index", "q3": "table join"}, k=5)
    return res.select("query_id", "doc_id",
                      F.round("score", 6).alias("score"), "rank").orderBy(
        "query_id", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_scan_project_filter": q01_scan_project_filter,
        "q02_agg_groupby": q02_agg_groupby,
        "q03_orderby_limit": q03_orderby_limit,
        "q04_join_inner": q04_join_inner,
        "q05_join_left": q05_join_left,
        "q06_join_semi": q06_join_semi,
        "q07_join_anti": q07_join_anti,
        "q08_natural_join": q08_natural_join,
        "q09_union_distinct": q09_union_distinct,
        "q10_window_topk_per_group": q10_window_topk_per_group,
        "q11_rollup": q11_rollup,
        "q12_moving_avg": q12_moving_avg,
        "q13_classify_percentile": q13_classify_percentile,
        "q14_classify_predicate": q14_classify_predicate,
        "q15_count_mean_shift": q15_count_mean_shift,
        "q16_mad_score": q16_mad_score,
        "q17_zscore": q17_zscore,
        "q18_percentile_udf": q18_percentile_udf,
        "q19_normalize_udf": q19_normalize_udf,
        "q20_winsorize": q20_winsorize,
        "q21_diff_global_ratio": q21_diff_global_ratio,
        "q22_diff_risk_ratio": q22_diff_risk_ratio,
        "q23_diff_prevalence_ratio": q23_diff_prevalence_ratio,
        "q24_diff_join": q24_diff_join,
        "q25_token_count": q25_token_count,
        "q26_dedup_exact": q26_dedup_exact,
        "q27_fingerprint": q27_fingerprint,
        "q28_quality_score": q28_quality_score,
        "q29_lang_id": q29_lang_id,
        "q30_term_stats": q30_term_stats,
        "q31_bm25_relational": q31_bm25_relational,
        "q32_cosine_topk": q32_cosine_topk,
        "q33_tumbling_window": q33_tumbling_window,
        "q34_sessionize": q34_sessionize,
        "q35_ngram_jaccard": q35_ngram_jaccard,
        "q36_diff_mean": q36_diff_mean,
        "q37_grouped_mad": q37_grouped_mad,
        "q38_heavy_hitters": q38_heavy_hitters,
        "q39_count_mean_shift_diff": q39_count_mean_shift_diff,
        "q40_bm25_index_path": q40_bm25_index_path,
        "q41_minhash_lsh": q41_minhash_lsh,
        "q42_simhash": q42_simhash,
        "q43_windowed_diff": q43_windowed_diff,
        "q44_multimodal_features": q44_multimodal_features,
        "q45_lsh_ann": q45_lsh_ann,
        "q46_fpgrowth_diff": q46_fpgrowth_diff,
        "q47_quantile_classifier": q47_quantile_classifier,
        "q48_arithmetic_classifier": q48_arithmetic_classifier,
        "q49_weighted_sample": q49_weighted_sample,
        "q50_set_ops": q50_set_ops,
        "q51_join_outer": q51_join_outer,
        "q52_contextual_mad": q52_contextual_mad,
        "q53_ew_percentile": q53_ew_percentile,
        "q54_transcript_anomaly_diff": q54_transcript_anomaly_diff,
        "q55_ivf_ann": q55_ivf_ann,
        "q56_mcd_mahalanobis": q56_mcd_mahalanobis,
        "q57_sql_diff_surface": q57_sql_diff_surface,
        "q58_random_projection": q58_random_projection,
        "q59_embedding_dedup": q59_embedding_dedup,
        "q60_pipeline_runner": q60_pipeline_runner,
        "q61_raw_classifier": q61_raw_classifier,
        "q62_metric_bucketize": q62_metric_bucketize,
        "q63_fd_pruning": q63_fd_pruning,
        "q64_prefilter_min_support": q64_prefilter_min_support,
        "q65_autocorrelation": q65_autocorrelation,
        "q66_kalman_ar": q66_kalman_ar,
        "q67_kde_gmm": q67_kde_gmm,
        "q68_bm25_batch": q68_bm25_batch,
    }


def oracle_sql() -> dict[str, str]:
    from macrobase_spark.oracles import ORACLES

    return dict(ORACLES)
