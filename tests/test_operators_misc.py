"""New-operator semantics: exact quantiles vs Spark percentile, diff_mean,
diff_count_mean_shift, FPGrowth-diff equivalence, grouped MAD, heavy hitters,
CSV source conventions, quantile classifier sanity."""

import math

import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.sample import synth_sample


def test_exact_quantiles_match_percentile(spark):
    """Bit-exact vs DuckDB quantile_cont (the oracle engine); within 1 ulp of
    Spark's percentile (Spark uses the two-sided weighted interpolation form,
    ours/DuckDB's is lo + (hi−lo)·frac)."""
    import duckdb

    from macrobase_spark.operators.quantiles import exact_quantiles

    df = synth_sample(spark, n_inliers=500, n_outliers=10)
    qs = [0.01, 0.05, 0.5, 0.95, 0.99]
    got = exact_quantiles(df, "usage", qs)
    pdf = df.select("usage").toPandas()
    for q in qs:
        duck = duckdb.sql(
            f"SELECT quantile_cont(usage, {q!r}) FROM pdf").fetchone()[0]
        assert got[q] == duck, (q, got[q], duck)
    want = df.agg(*[F.expr(f"percentile(usage, {q!r})").alias(f"q{i}")
                    for i, q in enumerate(qs)]).collect()[0]
    for i, q in enumerate(qs):
        assert math.isclose(got[q], float(want[f"q{i}"]), rel_tol=1e-13)


def test_diff_mean_finds_shifted_group(spark):
    from macrobase_spark.operators.diff import diff_mean

    df = synth_sample(spark)  # outliers (CAN, v3) have usage ~5 vs ~50
    res = diff_mean(df, ["location", "version"], "usage",
                    min_support=0.01, min_mean_dev=0.2, max_order=2).collect()
    assert res
    assert (res[0]["location"], res[0]["version"]) == ("CAN", "v3")


def test_diff_count_mean_shift(spark):
    from macrobase_spark.operators import classify_count_mean_shift
    from macrobase_spark.operators.diff import diff_count_mean_shift

    df = synth_sample(spark)
    labeled = classify_count_mean_shift(df, "location", "latency", "==", "CAN")
    res = diff_count_mean_shift(labeled, ["version"], min_support=0.0,
                                min_mean_shift=0.0, max_order=1)
    rows = {r["version"]: r for r in res.collect()}
    assert set(rows) == {"v1", "v2", "v3", "v4"}
    # cross-check one group against pandas
    pdf = labeled.toPandas()
    sub = pdf[pdf["version"] == "v3"]
    want = (sub["_OUTLIERMEANSUM"].sum() / sub["_OUTLIERCOUNT"].sum()) / (
        sub["_INLIERMEANSUM"].sum() / sub["_INLIERCOUNT"].sum())
    assert math.isclose(rows["v3"]["mean_shift"], want, rel_tol=1e-9)


def test_fpgrowth_diff_matches_diff(spark):
    """FP-Growth kernel and grouping-sets kernel agree on risk ratios for the
    planted combination (same output contract, different physical plan)."""
    from macrobase_spark.operators import classify_percentile, diff
    from macrobase_spark.operators.fpgrowth import fpgrowth_diff

    df = synth_sample(spark)
    labeled = classify_percentile(df, "usage", percentile=2.5, include_high=False)
    fp = fpgrowth_diff(labeled, ["location", "version"], min_support=0.5,
                       min_risk_ratio=2.0, max_order=2)
    gs = diff(labeled, ["location", "version"], min_support=0.5,
              ratio_metric="risk_ratio", min_ratio=2.0, max_order=2)
    fp_top = {tuple(r["items"]): r["risk_ratio"] for r in fp.collect()}
    gs_rows = gs.collect()
    for r in gs_rows:
        items = tuple(sorted(
            f"{k}={r[k]}" for k in ("location", "version") if r[k] is not None))
        assert items in fp_top, (items, sorted(fp_top))
        assert math.isclose(fp_top[items], r["risk_ratio"], rel_tol=1e-9)


def test_grouped_mad(spark):
    from macrobase_spark.operators.transform import grouped_mad_score

    df = synth_sample(spark)
    scored = grouped_mad_score(df, ["version"], "usage")
    # per-group medians differ from global; score must be ≥ 0 and finite
    row = scored.agg(F.min("_SCORE"), F.max("_SCORE")).collect()[0]
    assert row[0] >= 0.0 and row[1] < float("inf")
    assert scored.count() == df.count()


def test_heavy_hitters_exact(spark):
    from macrobase_spark.operators.transform import heavy_hitters

    df = synth_sample(spark)
    hh = {r["location"]: r["est_count"] for r in
          heavy_hitters(df, "location", threshold_frac=0.1).collect()}
    truth = {r["location"]: r["n"] for r in
             df.groupBy("location").agg(F.count("*").alias("n")).collect()}
    for loc, cnt in hh.items():
        assert cnt == truth[loc] and cnt >= 0.1 * sum(truth.values())


def test_csv_source_conventions(spark, tmp_path):
    from macrobase_spark.sources.csv import read_csv_macrobase, write_csv

    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("usage,version,location\n1.5,27,USA\n,v2,\n3.0,v3,CAN\n")
    df = read_csv_macrobase(spark, p, {"usage": "double"})
    types = dict(df.dtypes)
    assert types == {"usage": "double", "version": "string", "location": "string"}
    rows = df.orderBy("version").collect()
    assert rows[1]["usage"] is None  # real NULL by default

    ref = read_csv_macrobase(spark, p, {"usage": "double"},
                             reference_null_convention=True).orderBy("version").collect()
    assert math.isnan(ref[1]["usage"]) and ref[1]["location"] == "NULL"

    out = str(tmp_path / "out")
    write_csv(df, out, field_delimiter="|")
    back = spark.read.csv(out, header=True, sep="|")
    assert back.count() == 3


def test_quantile_classifier_flags_extreme_group(spark):
    from macrobase_spark.operators.classify import classify_quantile_cubed

    rows = [
        # location, count, q0, q50, q100
        ("A", 100.0, 10.0, 50.0, 90.0),
        ("B", 100.0, 12.0, 52.0, 88.0),
        ("C", 100.0, 500.0, 600.0, 700.0),  # extreme group
    ]
    df = spark.createDataFrame(
        rows, "location string, count double, q0 double, q50 double, q100 double")
    out = {r["location"]: r["_OUTLIER"] for r in classify_quantile_cubed(
        df, "count", {0.0: "q0", 0.5: "q50", 1.0: "q100"}, percentile=10.0,
        include_low=False).collect()}
    assert out["C"] > out["A"] and out["C"] > out["B"]
    # the global p90 cutoff lands at C's median (600) → exactly half of C
    assert out["C"] >= 50.0


def test_percentile_col_null_and_min_rank(spark):
    """NULL metrics are excluded from ranks AND n (the round-2 bug gave the
    minimum 0.5 instead of 1/3 on [1,2,NULL,3]); ties share the MIN rank."""
    from macrobase_spark.operators.transform import percentile_col

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 3.0), (5, 2.0)], "id int, v double")
    got = {r["id"]: r["p"] for r in
           percentile_col(df, "v", output_col="p").collect()}
    assert got[3] is None
    assert abs(got[1] - 1.0 / 4.0) < 1e-12          # min gets 1/n, n=4 non-null
    assert abs(got[2] - 2.0 / 4.0) < 1e-12          # tie group min rank = 2
    assert abs(got[5] - 2.0 / 4.0) < 1e-12
    assert abs(got[4] - 1.0) < 1e-12                # unique max → exactly 1


def test_percentile_col_bucketed_matches_reference_ranks(spark):
    """The bucketed two-phase cumulative count equals the single-window
    min-rank/n on a continuous column (distinct ≈ rows), at several bucket
    counts including more buckets than values."""
    import random

    from macrobase_spark.operators.transform import percentile_col

    rnd = random.Random(7)
    data = [(i, round(rnd.gauss(0, 100), 2)) for i in range(2000)]
    df = spark.createDataFrame(data, "id int, v double")
    pdf = sorted(v for _, v in data)
    n = len(pdf)
    want = {}
    for i, v in enumerate(pdf):
        want.setdefault(v, (i + 1) / n)  # min rank of the tie group
    for nb in (1, 7, 64, 5000):
        got = {r["id"]: r["p"] for r in
               percentile_col(df, "v", output_col="p", n_buckets=nb).collect()}
        for i, v in data:
            assert abs(got[i] - want[v]) < 1e-12, (nb, i, v)


def test_exact_quantiles_deep_tail_falls_back(spark):
    """A 'tail' quantile whose order statistic exceeds DEEP_CAP routes to the
    exact percentile aggregate instead of collecting ~15% of the column."""
    from macrobase_spark.operators import quantiles as qmod

    df = spark.range(50_000).selectExpr("cast(id as double) as v")
    old = qmod.DEEP_CAP
    qmod.DEEP_CAP = 1000  # force the fallback at this size
    try:
        got = qmod.exact_quantiles(df, "v", [0.15, 0.5, 0.999])
    finally:
        qmod.DEEP_CAP = old
    import math
    for q in (0.15, 0.999):
        idx = (50_000 - 1) * q
        lo, hi = math.floor(idx), math.ceil(idx)
        want = lo * (1 - (idx - lo)) + hi * (idx - lo)
        assert abs(got[q] - want) < 1e-9, (q, got[q], want)


def test_empty_and_all_null_inputs(spark):
    """Fit-style operators on empty or all-NULL inputs return schema-correct
    empty/zero results instead of surfacing numpy/NoneType errors: a
    filtered-to-empty pane is a legal input in every streaming composition."""
    import pyspark.sql.functions as F

    from macrobase_spark.operators.classify import (classify_percentile,
                                                    classify_quantile_cubed)
    from macrobase_spark.operators.transform import (mad_score, normalize_col,
                                                     winsorize)

    base = spark.createDataFrame([("a", 1.0)], "g string, m double")
    empty = base.limit(0)
    assert classify_percentile(empty, "m").columns[-1] == "_OUTLIER"
    assert classify_percentile(empty, "m").count() == 0
    assert mad_score(empty, "m").count() == 0
    assert normalize_col(empty, "m").count() == 0
    assert winsorize(empty, "m").count() == 0
    assert classify_quantile_cubed(
        spark.createDataFrame([], "g string, count double, q0 double, q1 double"),
        "count", {0.0: "q0", 1.0: "q1"}).count() == 0

    # all-NULL metric: quantiles are NaN; like Java, NOTHING is an outlier
    # (Spark alone would rank NaN greatest and mislabel the low side)
    allnull = spark.createDataFrame([("a", None), ("b", None)],
                                    "g string, m double")
    out = classify_percentile(allnull, "m").collect()
    assert [r["_OUTLIER"] for r in out] == [0.0, 0.0]
