"""Contextual outlier detection and the EW streaming percentile classifier."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.contextual import contextual_mad_outliers
from macrobase_spark.streaming.ew import ew_percentile_classify


def test_contextual_finds_planted_context(spark):
    """Values are tight per context except context (B, x) which carries 10%
    planted spikes → highest contextual outlier rate."""
    rng = np.random.default_rng(3)
    n = 6000
    a = rng.choice(["A", "B", "C"], n)
    b = rng.choice(["x", "y"], n)
    v = rng.normal(100, 5, n)
    planted = (a == "B") & (b == "x") & (rng.random(n) < 0.10)
    v[planted] += 200.0
    df = spark.createDataFrame(pd.DataFrame({"a": a, "b": b, "v": v}))
    res = contextual_mad_outliers(df, ["a", "b"], "v", score_cutoff=3.0,
                                  min_context_size=50, max_order=2).collect()
    top = res[0]
    assert (top["a"], top["b"]) == ("B", "x")
    assert top["outlier_rate"] > 0.05


def test_ew_percentile_adapts_to_drift(spark):
    """Metric level shifts upward over time; the decayed threshold follows,
    so late panes are not wholesale flagged."""
    rng = np.random.default_rng(5)
    n = 8000
    ts = pd.Timestamp("2025-04-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 8 * 3600, n)), unit="s")
    hours = (ts - pd.Timestamp("2025-04-01")).total_seconds() // 3600
    v = rng.normal(100, 5, n) + hours.to_numpy() * 50.0  # strong drift
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "v": v}))
    out = ew_percentile_classify(df, "ts", "v", percentile=95.0,
                                 pane="1 hour", half_life_panes=2.0)
    rates = {r["_pane"].hour: r["rate"] for r in (
        out.groupBy("_pane")
        .agg((F.sum("_OUTLIER") / F.count("*")).alias("rate"))
        .collect())}
    # without adaptation, final pane would be ~100% outliers; decayed
    # threshold keeps every pane's rate way below that
    assert all(r <= 0.6 for r in rates.values()), rates
    # and some outliers exist overall
    assert out.agg(F.sum("_OUTLIER")).collect()[0][0] > 0


def test_contextual_job_count_constant_in_combos(spark):
    """The melted lattice plan must scan the input a constant number of
    times: the whole max_order=2 run (3 combos) fits in a handful of Spark
    jobs, not 2 shuffles + 2 joins per combo."""
    rng = np.random.default_rng(9)
    n = 2000
    df = spark.createDataFrame(pd.DataFrame({
        "a": rng.choice(["A", "B", "C"], n),
        "b": rng.choice(["x", "y"], n),
        "v": rng.normal(0, 1, n),
    }))
    sc = spark.sparkContext
    sc.setJobGroup("ctxjobs", "contextual job count probe")
    try:
        contextual_mad_outliers(df, ["a", "b"], "v", max_order=2,
                                min_context_size=10).collect()
        jobs = sc.statusTracker().getJobIdsForGroup("ctxjobs")
    finally:
        sc.setJobGroup("", "")
    # 3 combos; old plan ran ~2 jobs per combo + unions. New plan: final
    # collect + 2 broadcast-exchange jobs (+ AQE re-plans) — bounded.
    assert 0 < len(jobs) <= 8, f"expected a constant-job plan, got {len(jobs)}"


def test_contextual_key_encoding_no_collision(spark):
    """ADVICE r3: the old concat_ws('\\x01') context key merged distinct
    contexts whose values embedded the separator — ("x\\x01y", "z") and
    ("x", "y\\x01z") shared a key. The length-prefixed encoding keeps them
    separate: each shows its own context_size, not a merged 80."""
    rows = ([("x\x01y", "z", float(i % 7)) for i in range(40)]
            + [("x", "y\x01z", float(i % 7)) for i in range(40)])
    df = spark.createDataFrame(rows, "a string, b string, v double")
    res = contextual_mad_outliers(df, ["a", "b"], "v", score_cutoff=3.0,
                                  min_context_size=10, max_order=2).collect()
    both = {(r["a"], r["b"]): r["context_size"] for r in res
            if r["a"] is not None and r["b"] is not None}
    assert both[("x\x01y", "z")] == 40
    assert both[("x", "y\x01z")] == 40


def test_contextual_null_values_join_no_context(spark):
    """r4 review: rows with NULL in-combo values belong to no context, so a
    (A=x, B=NULL) output row is unambiguously the order-1 context A=x."""
    rows = ([("x", "p", float(i % 5)) for i in range(60)]
            + [("x", None, float(i % 5) + 100.0) for i in range(60)])
    df = spark.createDataFrame(rows, "a string, b string, v double")
    res = contextual_mad_outliers(df, ["a", "b"], "v", min_context_size=10,
                                  max_order=2).collect()
    # exactly ONE (a=x, b=NULL) row — the order-1 context over ALL 120 rows
    ax = [r for r in res if r["a"] == "x" and r["b"] is None]
    assert len(ax) == 1
    assert ax[0]["context_size"] == 120
    # no context ever formed around the NULL b value
    assert not [r for r in res if r["a"] is None and r["b"] is None]


def test_ew_percentile_resolves_default_99(spark):
    """r4 review: the old uniform 21-point grid weighting quantized away any
    percentile above ~95.2 — a single pane at the default percentile=99
    flagged ZERO rows. The band-weighted tail-refined grid must flag ~1%."""
    import datetime

    from macrobase_spark.streaming.ew import ew_percentile_classify

    base_ts = datetime.datetime(2024, 1, 1)
    rows = [(base_ts, float(i)) for i in range(1000)]  # one pane, 0..999
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = ew_percentile_classify(df, "ts", "value", percentile=99.0,
                                 pane="1 hour", exact=True)
    n_out = out.agg(F.sum("_OUTLIER")).collect()[0][0]
    assert 5 <= n_out <= 15, n_out  # ~10 of 1000 above the 99th percentile
