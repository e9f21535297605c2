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
    """applyInPandasWithState with EVENT-TIME decay periods: counters across
    two micro-batches must equal the hand-computed decay recurrence with
    decay**(elapsed periods); a key idle while the watermark advances must
    ALSO decay (event-time timeout tick), not stay frozen; the multi-column
    key keeps attribute values as separate typed columns."""
    import time

    from macrobase_spark.streaming.stateful import streaming_decayed_diff

    src = str(tmp_path / "src")
    schema = "a0 string, a1 string, ts timestamp, _OUTLIER double"
    t0 = pd.Timestamp("2025-01-01 00:00:05").to_pydatetime()  # 60 s periods
    t2 = pd.Timestamp("2025-01-01 00:02:05").to_pydatetime()  # +2 periods
    batch1 = spark.createDataFrame(
        [("x", "u", t0, 1.0)] * 6 + [("x", "u", t0, 0.0)] * 4
        + [("y", "v", t0, 0.0)] * 10, schema)
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_decayed_diff(stream, ["a0", "a1"], ts_col="ts",
                                 decay=0.5, period_seconds=60)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("decayed").start())
    try:
        q.processAllAvailable()
        r1 = {(r["a0"], r["a1"]): r for r in spark.sql("SELECT * FROM decayed").collect()}
        assert r1[("x", "u")]["outlier_decayed"] == 6.0
        assert r1[("x", "u")]["total_decayed"] == 10.0
        assert r1[("y", "v")]["total_decayed"] == 10.0

        # batch 2: x gets data at period 2; y stays idle but the watermark
        # advances past its period-1 timeout → event-time tick
        batch2 = spark.createDataFrame([("x", "u", t2, 0.0)] * 10, schema)
        batch2.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.5)
        q.processAllAvailable()
        # absolute epoch-based period index (naive ts == UTC: session TZ
        # pinned, pandas .value is ns-since-epoch for naive timestamps)
        p0 = int(pd.Timestamp(t0).value // 10 ** 9 // 60)
        latest = spark.sql(
            "SELECT * FROM decayed WHERE a0 = 'x' ORDER BY period DESC"
        ).collect()[0]
        # two elapsed periods at decay 0.5: o = 6*0.25; t = 10*0.25 + 10
        assert latest["period"] == p0 + 2
        assert latest["outlier_decayed"] == 1.5
        assert latest["total_decayed"] == 12.5
        assert abs(latest["ratio"] - 0.12) < 1e-12
        idle = spark.sql(
            "SELECT * FROM decayed WHERE a0 = 'y' ORDER BY period DESC"
        ).collect()[0]
        assert idle["period"] == p0 + 2
        assert idle["total_decayed"] == 10.0 * 0.25
    finally:
        q.stop()


def test_stateful_decayed_diff_no_key_collision(spark, tmp_path):
    """('ab','c') and ('a','bc') are distinct keys (the old concat-based key
    collided them)."""
    from macrobase_spark.streaming.stateful import streaming_decayed_diff

    src = str(tmp_path / "src2")
    schema = "a0 string, a1 string, ts timestamp, _OUTLIER double"
    t0 = pd.Timestamp("2025-01-01 00:00:05").to_pydatetime()
    spark.createDataFrame(
        [("ab", "c", t0, 1.0)] * 3 + [("a", "bc", t0, 0.0)] * 5, schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_decayed_diff(stream, ["a0", "a1"], ts_col="ts", decay=1.0)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("collide").start())
    try:
        q.processAllAvailable()
        rows = {(r["a0"], r["a1"]): r for r in
                spark.sql("SELECT * FROM collide").collect()}
        assert rows[("ab", "c")]["total_decayed"] == 3.0
        assert rows[("a", "bc")]["total_decayed"] == 5.0
    finally:
        q.stop()
