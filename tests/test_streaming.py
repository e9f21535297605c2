"""Windowed / streaming operators: planted-anomaly property test in the style
of the reference's StreamingSummarizationTest (lib/src/test/java/.../
StreamingSummarizationTest.java:16-90) — a k-way attribute combination is
over-represented among outliers ONLY inside a time interval; the windowed
DIFF must surface it in exactly those windows."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.streaming import moving_average, windowed_diff


@pytest.fixture(scope="module")
def stream(spark):
    """10k events over 10 hours; outliers (p=0.02 noise) everywhere, plus a
    planted bug: (a0=1, a1=1) rows are 100% outliers during hours 4-6."""
    rng = np.random.default_rng(0)
    n = 10_000
    ts = pd.Timestamp("2025-03-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10 * 3600, n)), unit="s")
    a0 = rng.integers(0, 4, n).astype(str)
    a1 = rng.integers(0, 4, n).astype(str)
    outlier = (rng.random(n) < 0.02).astype(float)
    in_bug_window = (ts >= pd.Timestamp("2025-03-01 04:00:00")) & (
        ts < pd.Timestamp("2025-03-01 06:00:00"))
    bug = in_bug_window & (a0 == "1") & (a1 == "1")
    outlier[bug] = 1.0
    pdf = pd.DataFrame({"ts": ts, "a0": a0, "a1": a1, "_OUTLIER": outlier})
    return spark.createDataFrame(pdf).cache()


def test_windowed_diff_finds_planted_combo_only_in_window(spark, stream):
    res = windowed_diff(stream, "ts", ["a0", "a1"], window_length="1 hour",
                        min_support=0.3, min_ratio=3.0, max_order=2).collect()
    assert res, "expected windowed explanations"
    hits = [r for r in res
            if r["a0"] == "1" and r["a1"] == "1"]
    assert hits, "planted combination not found"
    for r in hits:
        h = r["window_start"].hour
        assert 4 <= h < 6, f"combo surfaced outside planted window: {r}"
    # and it is found in both planted hours
    assert {r["window_start"].hour for r in hits} == {4, 5}


def test_moving_average_trailing(spark):
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2025-01-01 00:00:00", "2025-01-01 00:00:30",
                              "2025-01-01 00:01:00", "2025-01-01 00:10:00"]),
        "v": [1.0, 2.0, 3.0, 10.0],
    })
    df = spark.createDataFrame(pdf)
    out = {r["ts"].second + r["ts"].minute * 60: r["m"] for r in
           moving_average(df, "ts", "v", window_seconds=60, output_col="m").collect()}
    assert out[0] == 1.0
    assert out[30] == 1.5
    assert out[60] == 2.0           # covers 0,30,60
    assert out[600] == 10.0         # far from the rest


def test_structured_streaming_micro_batch(spark, stream, tmp_path):
    """Drive the windowed count through a real Structured Streaming query
    (micro-batch over file source, memory sink)."""
    src = str(tmp_path / "stream_src")
    stream.write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema(stream.schema).parquet(src)
    agg = (
        sdf.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"), "a0")
        .agg(F.count("*").alias("n"))
    )
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_counts").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS c FROM win_counts").collect()[0]["c"]
        assert got > 0
        total = spark.sql("SELECT sum(n) AS s FROM win_counts").collect()[0]["s"]
        assert total == stream.count()
    finally:
        q.stop()


def test_stateful_decayed_diff(spark, tmp_path):
    """applyInPandasWithState: decayed per-key counters across two
    micro-batches must equal the hand-computed decay recurrence."""
    import time

    from macrobase_spark.streaming.stateful import streaming_decayed_diff

    src = str(tmp_path / "src")
    schema = "a0 string, _OUTLIER double"
    batch1 = spark.createDataFrame(
        [("x", 1.0)] * 6 + [("x", 0.0)] * 4 + [("y", 0.0)] * 10, schema)
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_decayed_diff(stream, ["a0"], decay=0.5)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("decayed").start())
    try:
        q.processAllAvailable()
        r1 = {r["key"]: r for r in spark.sql("SELECT * FROM decayed").collect()}
        assert r1["x"]["outlier_decayed"] == 6.0
        assert r1["x"]["total_decayed"] == 10.0

        batch2 = spark.createDataFrame([("x", 0.0)] * 10, schema)
        batch2.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.5)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM decayed WHERE key = 'x' ORDER BY n_batches DESC"
        ).collect()
        latest = rows[0]
        # decay 0.5: o = 6*0.5 + 0 = 3; t = 10*0.5 + 10 = 15
        assert latest["outlier_decayed"] == 3.0
        assert latest["total_decayed"] == 15.0
        assert abs(latest["ratio"] - 0.2) < 1e-12
    finally:
        q.stop()
