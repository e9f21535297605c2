"""The reference's complete golden-SQL corpus, executed from the ACTUAL SQL
text through the MacroBase SQL surface and compared against the reference's
own golden output CSVs.

Corpus (read directly from the read-only reference checkout at test time —
never copied into this repo):
- sql/src/test/resources/{1..20}.sql      (DIFF / SPLIT / percentile UDF)
- sql/src/test/resources/joins/{1..4}.sql (equi / USING / NATURAL joins)
- sql/src/test/resources/diff-joins/{1..11}.sql (DIFF over joined relations)

Harness semantics mirror MacroBaseSQLTest.java:48-77: run the .sql file,
compare against the golden CSV — here value-identical and order-insensitive
(floats at rel_tol 1e-9; the reference's Java doubles round-trip exactly
through its CSV writer).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from macrobase_spark.sql import MacroBaseSQL

REF_SQL = "/root/reference/sql"
RES = os.path.join(REF_SQL, "src/test/resources")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference checkout not available")


@pytest.fixture(scope="module")
def mbsql(spark, tmp_path_factory):
    # outfiles land in a temp dir — the reference checkout is read-only
    mb = MacroBaseSQL(spark, base_dir=REF_SQL,
                      outfile_dir=str(tmp_path_factory.mktemp("outfiles")))
    # MacroBaseSQLTest.setUp loads import.sql once for queries 1..20
    mb.execute(open(os.path.join(RES, "import.sql")).read())
    return mb


def _assert_matches(got: pd.DataFrame, golden_path: str):
    """Order-insensitive value comparison. Column ORDER is not compared:
    the reference assembles join/DIFF outputs from HashMaps
    (QueryEngine.java:712-752), so its own golden column order is hash-
    arbitrary; names and values must match exactly (floats at 1e-9)."""
    import numpy as np

    exp = pd.read_csv(golden_path)
    assert set(got.columns) == set(exp.columns), (
        f"column mismatch: {sorted(got.columns)} vs golden {sorted(exp.columns)}")
    got = got[list(exp.columns)].copy()
    assert len(got) == len(exp), f"row count {len(got)} != golden {len(exp)}"
    # align dtypes: pandas reads numeric-looking join keys as ints/floats
    # that Spark returns as strings; NULL-bearing int columns read as float
    num_cols = []
    for c in exp.columns:
        if pd.api.types.is_numeric_dtype(exp[c]) or pd.api.types.is_numeric_dtype(got[c]):
            exp[c] = pd.to_numeric(exp[c])
            got[c] = pd.to_numeric(got[c])
            num_cols.append(c)
        else:
            exp[c] = exp[c].astype(object)
            got[c] = got[c].astype(object)

    def canon(df):
        k = df.copy()
        for c in num_cols:  # round the SORT key so near-equal floats align
            k[c] = k[c].round(6)
        order = k.sort_values(list(df.columns), na_position="last",
                              kind="mergesort").index
        return df.loc[order].reset_index(drop=True)

    got, exp = canon(got), canon(exp)
    for c in exp.columns:
        if c in num_cols:
            g = got[c].to_numpy(dtype=float)
            e = exp[c].to_numpy(dtype=float)
            assert np.allclose(g, e, rtol=1e-9, atol=1e-12, equal_nan=True), (
                c, g[~np.isclose(g, e, rtol=1e-9, atol=1e-12, equal_nan=True)][:5])
        else:
            gl = [None if pd.isna(x) else str(x) for x in got[c]]
            el = [None if pd.isna(x) else str(x) for x in exp[c]]
            assert gl == el, (c, [p for p in zip(gl, el) if p[0] != p[1]][:5])


def _run(mbsql, sql_rel: str, golden_rel: str):
    text = open(os.path.join(RES, sql_rel)).read()
    df = mbsql.execute(text)
    _assert_matches(df.toPandas(), os.path.join(RES, golden_rel))


def test_sql_surface_edge_cases(spark):
    """Grammar corners the goldens don't hit: WITH clause order reversed
    (MIN SUPPORT before MIN RATIO — SqlBase.g4:71 allows both), quoted ';'
    inside IMPORT paths, aliases on both DIFF relations, MAX COMBO 1."""
    import pandas as pd

    from macrobase_spark.sql import MacroBaseSQL

    pdf = pd.DataFrame({
        "usage": [1.0] * 50 + [2000.0] * 10,
        "location": ["USA"] * 50 + ["CAN"] * 10,
        "version": ["v1"] * 30 + ["v2"] * 20 + ["v3"] * 10,
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("edge_sample")
    mb = MacroBaseSQL(spark)
    r1 = mb.execute(
        "SELECT * FROM DIFF (SPLIT edge_sample WHERE usage > 1000.0) "
        "ON location, version WITH MIN SUPPORT 0.5 MIN RATIO 2.0 MAX COMBO 1"
    ).collect()
    assert r1 and all(r["support"] >= 0.5 and r["global_ratio"] >= 2.0
                      for r in r1)
    assert all((r["location"] is None) != (r["version"] is None) for r in r1)
    def canon(rows):
        return sorted(tuple("" if x is None else str(x) for x in r)
                      for r in rows)

    # reversed clause order → identical result
    r2 = mb.execute(
        "SELECT * FROM DIFF (SPLIT edge_sample WHERE usage > 1000.0) "
        "ON location, version WITH MIN RATIO 2.0 MIN SUPPORT 0.5 MAX COMBO 1"
    ).collect()
    assert canon(r1) == canon(r2)
    # two aliased relations
    r3 = mb.execute(
        "SELECT * FROM DIFF (SELECT * FROM edge_sample WHERE usage > 1000.0) "
        "outliers, (SELECT * FROM edge_sample WHERE usage < 1000.0) inliers "
        "ON location, version WITH MIN SUPPORT 0.5 MIN RATIO 2.0 MAX COMBO 1"
    ).collect()
    assert canon(r3) == canon(r1)
    # ';' inside a quoted path must not split the statement
    from macrobase_spark.sql.interface import _split_statements

    stmts = _split_statements(
        "IMPORT FROM CSV FILE 'a;b.csv' INTO t(x string); SELECT 1")
    assert len(stmts) == 2 and "a;b.csv" in stmts[0]


@pytest.mark.parametrize("i", range(1, 21))
def test_golden_main(mbsql, i):
    _run(mbsql, f"{i}.sql", f"{i}.csv")


@pytest.mark.parametrize("i", range(1, 5))
def test_golden_joins(mbsql, i):
    _run(mbsql, f"joins/{i}.sql", f"joins/{i}.csv")


@pytest.mark.parametrize("i", range(1, 12))
def test_golden_diff_joins(mbsql, i):
    _run(mbsql, f"diff-joins/{i}.sql", f"diff-joins/{i}.csv")


def test_outfile_guard_small_and_large(spark, tmp_path):
    """INTO OUTFILE (r3 verdict What's-wrong #5): explanation-size results
    still land as ONE driver-written CSV; results beyond the bound fall
    back to a distributed directory write instead of OOMing the driver."""
    import os

    import pandas as pd

    from macrobase_spark.sql import MacroBaseSQL

    spark.range(10).selectExpr("id", "id * 2 AS v").createOrReplaceTempView(
        "_of_small")
    spark.range(50).selectExpr("id", "id * 3 AS v").createOrReplaceTempView(
        "_of_big")
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.OUTFILE_DRIVER_ROWS = 20  # shrink the bound for the test

    mb.execute("SELECT * FROM _of_small INTO OUTFILE 'small.csv';")
    assert mb.last_outfile.endswith("small.csv")
    assert len(pd.read_csv(mb.last_outfile)) == 10

    mb.execute("SELECT * FROM _of_big INTO OUTFILE 'big.csv';")
    assert mb.last_outfile.endswith("big.csv.d")
    assert os.path.isdir(mb.last_outfile)
    got = spark.read.option("header", "true").csv(mb.last_outfile)
    assert got.count() == 50


def test_search_relation_in_sql(spark, tmp_path):
    """attach_index + SEARCH(name, 'terms', k) as a FROM relation: the BM25
    engine surfaced through the SQL front-end, composable with joins."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "sql_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5)
    t.select("doc_id", "role", "text").createOrReplaceTempView("turns")

    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("transcripts", idx)
    got = mb.execute(
        "SELECT s.doc_id, s.score, t.role "
        "FROM SEARCH(transcripts, 'rare7 the', 5) s "
        "JOIN turns t USING (doc_id) ORDER BY s.score DESC;").collect()
    want = bm25_topk(spark, idx, "rare7 the", k=5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want]
    assert all(r["role"] is not None for r in got)

    with pytest.raises(ValueError, match="no index attached"):
        mb.execute("SELECT * FROM SEARCH(nope, 'x');")


def test_search_composes_with_diff(spark, tmp_path):
    """SEARCH(...) inside a DIFF SPLIT subrelation: subqueries route through
    the same translator, so the BM25 engine composes with the explanation
    surface in one SQL statement."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "sqldiff_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5)
    t.select("doc_id", "role", "tool").createOrReplaceTempView("turns2")

    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)
    out = mb.execute(
        "SELECT * FROM DIFF (SPLIT ("
        "  SELECT t.role, s.score FROM SEARCH(tr, 'the', 300) s"
        "  JOIN turns2 t USING (doc_id)"
        ") WHERE score > 1.0) ON role "
        "WITH MIN RATIO 0.0 MIN SUPPORT 0.0;").collect()
    assert out, "expected explanation rows"
    assert {"role", "support", "global_ratio"} <= set(out[0].asDict())


def test_sql_parser_edge_cases(spark, tmp_path):
    """r4 review batch: (a) real ON expressions pass through verbatim (the
    bare-column USING quirk only fires at a clause boundary); (b) nested
    calls after a percentile() item split correctly; (c) DIFF inside a
    subquery does not hijack the outer statement; (d) a malformed DIFF
    relation list raises a parse error, not AttributeError."""
    from macrobase_spark.sql import MacroBaseSQL

    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    spark.createDataFrame(
        [("A", "a", 1.0), ("B", "b", 9.0)], "x string, y string, usage double"
    ).createOrReplaceTempView("t_edge")
    spark.createDataFrame(
        [("a", 10.0), ("b", 20.0)], "y string, v double"
    ).createOrReplaceTempView("u_edge")

    # (a) expression ON conditions are NOT rewritten to USING
    got = mb.execute(
        "SELECT t_edge.x, u_edge.v FROM t_edge JOIN u_edge "
        "ON lower(t_edge.y) = lower(u_edge.y) ORDER BY x;").collect()
    assert [(r["x"], r["v"]) for r in got] == [("A", 10.0), ("B", 20.0)]

    # (b) nested call after a percentile item
    got = mb.execute(
        "SELECT percentile(usage) AS p, greatest(usage, abs(usage)) AS g "
        "FROM t_edge ORDER BY g;").collect()
    assert len(got) == 2 and got[-1]["g"] == 9.0

    # (c) DIFF mentioned inside a subquery: outer statement is plain SQL
    got = mb.execute(
        "SELECT x FROM t_edge WHERE y IN (SELECT y FROM u_edge) ORDER BY x;"
    ).collect()
    assert [r["x"] for r in got] == ["A", "B"]

    # (d) malformed DIFF relation list → parse error, not AttributeError
    import pytest as _pytest

    with _pytest.raises(ValueError, match="DIFF expects two relations"):
        mb.execute("SELECT * FROM DIFF (SELECT * FROM t_edge) ON x;")


def test_search_anomaly_modifier(spark, tmp_path):
    """r5: SEARCH(..., ANOMALY_MAX=x, ANOMALY_WEIGHT=y) must equal
    bm25_topk with the same modifier args — the north-rule anomaly score
    modifier reachable from the SQL surface — and compose inside DIFF."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "anom_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5)
    t.select("doc_id", "role").createOrReplaceTempView("turns3")

    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)
    got = mb.execute(
        "SELECT doc_id, score FROM "
        "SEARCH(tr, 'rare7 the', 8, ANOMALY_MAX=0.8, ANOMALY_WEIGHT=0.5) "
        "ORDER BY score DESC;").collect()
    want = bm25_topk(spark, idx, "rare7 the", k=8,
                     anomaly_max=0.8, anomaly_weight=0.5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want]
    # the modifier actually changes the ranking vs the unmodified query
    plain = bm25_topk(spark, idx, "rare7 the", k=8).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] != \
           [(r["doc_id"], round(r["score"], 9)) for r in plain]
    # weight-only spelling, composed inside a DIFF SPLIT subrelation
    out = mb.execute(
        "SELECT * FROM DIFF (SPLIT ("
        "  SELECT t.role, s.score "
        "  FROM SEARCH(tr, 'the', 300, ANOMALY_WEIGHT=0.3) s"
        "  JOIN turns3 t USING (doc_id)"
        ") WHERE score > 1.0) ON role "
        "WITH MIN RATIO 0.0 MIN SUPPORT 0.0;").collect()
    assert out, "expected explanation rows"


def test_search_phrase_query(spark, tmp_path):
    """r5: SEARCH(idx, '"a b"'[, k][, SLOP=w]) routes to the positional
    phrase engine — equal to bm25_phrase_topk with the same args, slop
    spelled as an option, and loud errors for the two invalid mixes
    (SLOP without quotes, ANOMALY_* with quotes)."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_phrase_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "phrase_sql_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5, positions=True)
    t.select("doc_id", "role").createOrReplaceTempView("turns4")

    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)
    for q, slop_sql, slop_kw in [
            ("tok0001 tok0000", "", 0),
            ("tok0001 tok0000", ", SLOP=2", 2)]:
        got = mb.execute(
            f"SELECT doc_id, score FROM SEARCH(tr, '\"{q}\"', 7{slop_sql}) "
            "ORDER BY score DESC;").collect()
        want = bm25_phrase_topk(spark, idx, q, k=7, slop=slop_kw).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
               [(r["doc_id"], round(r["score"], 9)) for r in want], slop_kw
    assert got, "expected phrase hits"

    # composes with a join like any relation
    j = mb.execute(
        "SELECT s.doc_id, t.role FROM SEARCH(tr, '\"the the\"', 5) s "
        "JOIN turns4 t USING (doc_id);").collect()
    assert all(r["role"] is not None for r in j)

    with pytest.raises(ValueError, match="SLOP applies only to phrase"):
        mb.execute("SELECT * FROM SEARCH(tr, 'the', 5, SLOP=1);")
    with pytest.raises(ValueError, match="do not apply to phrase"):
        mb.execute(
            "SELECT * FROM SEARCH(tr, '\"the the\"', 5, ANOMALY_WEIGHT=0.5);")


def test_search_match_all(spark, tmp_path):
    """r5: SEARCH(..., MATCH=ALL) equals bm25_topk(mode='and'); MATCH=ANY
    is the default; MATCH on a phrase query errors."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "matchall_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5, positions=True)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042 tok0007', 8, "
        "MATCH=ALL) ORDER BY score DESC;").collect()
    want = bm25_topk(spark, idx, "tok0042 tok0007", k=8,
                     mode="and").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want]
    any_ = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042 tok0007', 8, "
        "MATCH=ANY) ORDER BY score DESC;").collect()
    plain = bm25_topk(spark, idx, "tok0042 tok0007", k=8).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in any_] == \
           [(r["doc_id"], round(r["score"], 9)) for r in plain]
    # MATCH composes with the anomaly modifier in one option list
    mixed = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042 tok0007', 8, "
        "ANOMALY_WEIGHT=0.3, MATCH=ALL) ORDER BY score DESC;").collect()
    want_m = bm25_topk(spark, idx, "tok0042 tok0007", k=8, mode="and",
                       anomaly_weight=0.3).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in mixed] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want_m]

    with pytest.raises(ValueError, match="MATCH does not apply to phrase"):
        mb.execute(
            "SELECT * FROM SEARCH(tr, '\"the the\"', 5, MATCH=ALL);")

    # MATCH=<n> is minimum_should_match (plain + COUNT forms)
    m2 = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042 tok0007 the', 8, "
        "MATCH=2) ORDER BY score DESC;").collect()
    want2 = bm25_topk(spark, idx, "tok0042 tok0007 the", k=8,
                      min_should_match=2).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in m2] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want2]
    from macrobase_spark.index.bm25 import bm25_count

    c2 = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 tok0007 the', 8, MATCH=2, "
        "COUNT);").collect()
    wantc = bm25_count(spark, idx, "tok0042 tok0007 the",
                       min_should_match=2).collect()
    assert [r["n_matches"] for r in c2] == [r["n_matches"] for r in wantc]
    with pytest.raises(ValueError, match="not supported with FACETS"):
        mb.execute("SELECT * FROM SEARCH(tr, 'tok0042 the', 8, MATCH=2, "
                   "FACETS='role');")

    # SYNONYMS='src:alt1 alt2;...' expands through bm25_topk(synonyms=)
    sy = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042', 8, "
        "SYNONYMS='tok0042:tok0007 tok0001;zzz:the') "
        "ORDER BY score DESC;").collect()
    want_sy = bm25_topk(spark, idx, "tok0042", k=8,
                        synonyms={"tok0042": ["tok0007", "tok0001"],
                                  "zzz": ["the"]}).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in sy] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want_sy]
    with pytest.raises(ValueError, match="SYNONYMS applies to plain"):
        mb.execute("SELECT * FROM SEARCH(tr, 'tok0042', 8, "
                   "SYNONYMS='a:b', COUNT);")
    with pytest.raises(ValueError, match="SYNONYMS entries"):
        mb.execute("SELECT * FROM SEARCH(tr, 'tok0042', 8, "
                   "SYNONYMS='justaterm');")

    # RECENCY=<half_life_days> routes to bm25_topk(recency_half_life=)
    rc = mb.execute(
        "SELECT doc_id, score FROM SEARCH(tr, 'tok0042 the', 8, "
        "RECENCY=0.5) ORDER BY score DESC;").collect()
    want_rc = bm25_topk(spark, idx, "tok0042 the", k=8,
                        recency_half_life=0.5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rc] == \
           [(r["doc_id"], round(r["score"], 9)) for r in want_rc]
    with pytest.raises(ValueError, match="RECENCY applies to plain"):
        mb.execute("SELECT * FROM SEARCH(tr, 'tok0042', 8, RECENCY=1, "
                   "COUNT);")


def test_search_filter_and_wildcard_options(spark, tmp_path):
    """SEARCH FILTER='<expr>' (with '' quote escaping) equals bm25_topk
    doc_filter; a * wildcard token flows through to prefix expansion; the
    FILTER composes with phrase queries too."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_phrase_topk, bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "sqlf_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5, positions=True)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'rare7 the', 5, "
        "FILTER='role = ''assistant''') s;").collect()
    want = bm25_topk(spark, idx, "rare7 the", k=5,
                     doc_filter="role = 'assistant'").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]

    got = mb.execute("SELECT * FROM SEARCH(tr, 'tok00*', 5) s;").collect()
    want = bm25_topk(spark, idx, "tok00*", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]

    # exclusion micro-syntax flows through the quoted query string
    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 -tok0007', 5) s;").collect()
    want = bm25_topk(spark, idx, "tok0042 -tok0007", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, '\"tok0000 tok0000\"', 8, "
        "FILTER='role = ''assistant''') s;").collect()
    want = bm25_phrase_topk(spark, idx, "tok0000 tok0000", k=8,
                            doc_filter="role = 'assistant'").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert got, "phrase+filter leg must be non-empty"


def test_search_snippet_option(spark, tmp_path):
    """SEARCH(..., SNIPPET=view): the relation becomes the hits page
    (doc_id, score, snippet, n_matched) rendered from the named view —
    for both bag-of-words and phrase queries."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.snippets import highlight_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "sqlsnip_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5, positions=True)
    t.select("doc_id", "text").createOrReplaceTempView("corpus_v")
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'rare7 the', 5, SNIPPET=corpus_v) s;"
    ).collect()
    want = highlight_topk(spark, idx, t, "rare7 the", k=5).collect()
    assert [(r["doc_id"], r["score"], r["snippet"]) for r in got] == \
           [(r["doc_id"], r["score"], r["snippet"]) for r in want]
    assert all("**" in r["snippet"] for r in got)

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, '\"tok0000 tok0000\"', 5, "
        "SNIPPET=corpus_v) s;").collect()
    want = highlight_topk(spark, idx, t, '"tok0000 tok0000"', k=5).collect()
    assert [(r["doc_id"], r["score"], r["snippet"]) for r in got] == \
           [(r["doc_id"], r["score"], r["snippet"]) for r in want]
    assert got


def test_search_sort_facets_and_scopes(spark, tmp_path):
    """SEARCH SORT='col dir' equals bm25_topk sort_by; FACETS='a,b'
    yields the bm25_facets relation; field scopes (role:assistant) inside
    the quoted query work through the SQL surface; invalid combinations
    fail loudly."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_facets, bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    idx = str(tmp_path / "sqlsort_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 tok0007', 6, "
        "SORT='turn_idx desc') s;").collect()
    want = bm25_topk(spark, idx, "tok0042 tok0007", k=6,
                     sort_by="turn_idx desc").collect()
    assert [(r["doc_id"], r["turn_idx"]) for r in got] == \
           [(r["doc_id"], r["turn_idx"]) for r in want]
    assert got

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 the', 10, MATCH=ALL, "
        "FACETS='role,tool') s;").collect()
    want = bm25_facets(spark, idx, "tok0042 the", ["role", "tool"],
                       mode="and").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert ("__total__", "", want[0]["doc_count"]) in [tuple(r) for r in got]

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'role:assistant tok0042 the', 5) s;"
    ).collect()
    want = bm25_topk(spark, idx, "tok0042 the", k=5,
                     doc_filter="role = 'assistant'").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert got

    with pytest.raises(ValueError, match="FACETS composes"):
        mb.execute("SELECT * FROM SEARCH(tr, 'the', 5, FACETS='role', "
                   "SORT='turn_idx desc') s;")
    with pytest.raises(ValueError, match="SORT applies"):
        mb.execute("SELECT * FROM SEARCH(tr, '\"the the\"', 5, "
                   "SORT='turn_idx desc') s;")


def test_search_sharded_attachment(spark, tmp_path):
    """attach_index(name, [dir1, dir2]): SEARCH routes to
    bm25_topk_sharded (global stats — identical to a monolithic index);
    unsupported option combos fail loudly."""
    from pyspark.sql import functions as F

    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=30, seed=42)).cache()
    full = str(tmp_path / "m_full")
    s1, s2 = str(tmp_path / "m_s1"), str(tmp_path / "m_s2")
    build_index(t, full, num_buckets=4, hot_df_threshold=10 ** 9)
    build_index(t.filter(F.col("doc_id") % 2 == 0), s1, num_buckets=2,
                hot_df_threshold=10 ** 9)
    build_index(t.filter(F.col("doc_id") % 2 == 1), s2, num_buckets=2,
                hot_df_threshold=10 ** 9)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", [s1, s2])

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'role:assistant tok0042 the', 6, "
        "MATCH=ANY) s;").collect()
    want = bm25_topk(spark, full, "tok0042 the", k=6,
                     doc_filter="role = 'assistant'").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert got
    with pytest.raises(ValueError, match="sharded attachment"):
        mb.execute("SELECT * FROM SEARCH(tr, '\"a b\"', 5) s;")
    with pytest.raises(ValueError, match="sharded attachment"):
        mb.execute("SELECT * FROM SEARCH(tr, 'the', 5, FACETS='role') s;")


def test_search_count_and_collapse_options(spark, tmp_path):
    from pyspark.sql import functions as F

    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_count, bm25_topk
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=30, seed=42)).cache()
    idx = str(tmp_path / "cc_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=10 ** 9)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 the', 5, COUNT) s;").collect()
    want = bm25_count(spark, idx, "tok0042 the").collect()
    assert [r["n_matches"] for r in got] == [r["n_matches"] for r in want]
    assert got[0]["n_matches"] > 0

    got = mb.execute(
        "SELECT * FROM SEARCH(tr, 'tok0042 the', 5, COLLAPSE=conv_id) s;"
    ).collect()
    want = bm25_topk(spark, idx, "tok0042 the", k=5,
                     collapse="conv_id").collect()
    assert [(r["doc_id"], r["score"], r["conv_id"]) for r in got] == \
           [(r["doc_id"], r["score"], r["conv_id"]) for r in want]
    assert got

    with pytest.raises(ValueError, match="COUNT composes"):
        mb.execute("SELECT * FROM SEARCH(tr, 'the', 5, COUNT, "
                   "SORT='turn_idx desc') s;")
    with pytest.raises(ValueError, match="COLLAPSE applies"):
        mb.execute("SELECT * FROM SEARCH(tr, '\"the the\"', 5, "
                   "COLLAPSE=conv_id) s;")


def test_sql_suggest_and_spellcheck_relations(spark, tmp_path):
    """SUGGEST(idx, 'prefix', k) and SPELLCHECK(idx, 'token', edits, k)
    are FROM-able relations equal to the Python API; both compose with
    ordinary SQL (WHERE/ORDER/LIMIT); unattached index errors."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.suggest import spellcheck, suggest_terms
    from macrobase_spark.sql import MacroBaseSQL

    t = with_doc_id(synth_transcripts(spark, n_convs=30, seed=42)).cache()
    idx = str(tmp_path / "sugg_idx")
    build_index(t, idx, num_buckets=4, hot_df_threshold=10 ** 9)
    mb = MacroBaseSQL(spark, base_dir=str(tmp_path))
    mb.attach_index("tr", idx)

    got = mb.execute("SELECT * FROM SUGGEST(tr, 'rar', 5);").collect()
    want = suggest_terms(spark, idx, "rar", k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got

    got2 = mb.execute(
        "SELECT term, distance FROM SPELLCHECK(tr, 'rarr7', 2, 3) "
        "WHERE distance <= 2;").collect()
    want2 = spellcheck(spark, idx, "rarr7", max_edits=2, k=3).collect()
    assert [(r["term"], r["distance"]) for r in got2] == \
           [(r["term"], r["distance"]) for r in want2] and got2

    # joins like any relation
    j = mb.execute(
        "SELECT s.term, s.df FROM SUGGEST(tr, 'rar', 50) s "
        "ORDER BY s.df DESC, s.term LIMIT 3;").collect()
    assert len(j) == 3

    with pytest.raises(ValueError, match="no index attached"):
        mb.execute("SELECT * FROM SUGGEST(nope, 'a', 5);")
