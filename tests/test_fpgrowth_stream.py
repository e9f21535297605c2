"""Incremental streaming FP-Growth: tree exactness vs brute force, PFP
shard completeness/disjointness, and the stateful decay recurrence across
real micro-batches."""

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.streaming.fpgrowth_stream import (
    _py_group, mine_paths, shard_prefixes, streaming_fpgrowth, tree_decay,
    tree_insert, tree_mine, tree_prune, tree_weighted_paths)


def brute_supports(txns, weights=None):
    """All itemsets' supports by enumeration (ground truth)."""
    weights = weights or [1.0] * len(txns)
    out = {}
    for t, w in zip(txns, weights):
        canon = sorted(set(t))
        for r in range(1, len(canon) + 1):
            for s in itertools.combinations(canon, r):
                out[s] = out.get(s, 0.0) + w
    return out


TXNS = [
    ["a", "b", "c"], ["a", "b"], ["a", "c"], ["b", "c"], ["a", "b", "c", "d"],
    ["d", "e"], ["a", "d"], ["b"], ["c", "d", "e"], ["a", "b", "c"],
]


def test_tree_mine_matches_bruteforce():
    tree = {}
    for t in TXNS:
        tree_insert(tree, sorted(set(t)))
    got = tree_mine(tree, min_count=2.0)
    want = {s: c for s, c in brute_supports(TXNS).items() if c >= 2.0}
    assert got == want


def test_tree_decay_and_prune():
    tree = {}
    for t in TXNS:
        tree_insert(tree, sorted(set(t)))
    tree_decay(tree, 0.5)
    got = tree_mine(tree, min_count=1.0)
    want = {s: c * 0.5 for s, c in brute_supports(TXNS).items() if c * 0.5 >= 1.0}
    assert got.keys() == want.keys()
    for s in got:
        assert abs(got[s] - want[s]) < 1e-9
    # pruning below eps removes low-weight subtrees but keeps the frequent ones
    tree_prune(tree, 1.0)
    still = tree_mine(tree, min_count=2.0)
    for s in still:
        assert want.get(s, 0.0) >= 1.0


@pytest.mark.parametrize("num_groups", [1, 3, 8])
def test_pfp_shards_are_disjoint_and_complete(num_groups):
    """Union over groups of (per-group tree mine, last-item-owned filter)
    must equal the single-tree mine; no itemset may come from two groups."""
    trees = {g: {} for g in range(num_groups)}
    for t in TXNS:
        for g, prefix in shard_prefixes(t, num_groups):
            tree_insert(trees[g], list(prefix))
    merged = {}
    for g, tree in trees.items():
        for s, c in tree_mine(tree, min_count=2.0).items():
            if _py_group(s[-1], num_groups) != g:
                continue
            assert s not in merged, f"itemset {s} emitted by two groups"
            merged[s] = c
    want = {s: c for s, c in brute_supports(TXNS).items() if c >= 2.0}
    assert merged == want


def test_streaming_fpgrowth_incremental_decay(spark, tmp_path):
    """Two micro-batches two periods apart: supports must follow
    count1 · decay² + count2 — the incremental insert into decayed state,
    not a recompute; and the Spark-side shard projection must agree with
    the Python twin."""
    src = str(tmp_path / "fp_src")
    schema = "items array<string>, ts timestamp"
    t0 = pd.Timestamp("2025-01-01 00:00:05").to_pydatetime()
    t2 = pd.Timestamp("2025-01-01 00:02:05").to_pydatetime()
    batch1 = [(["a", "b"], t0)] * 6 + [(["a", "b", "c"], t0)] * 2
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_fpgrowth(stream, min_support_count=0.4, decay=0.5,
                             period_seconds=60, num_groups=4)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("fpg").start())
    try:
        q.processAllAvailable()
        r1 = {r["itemset"]: r["support"]
              for r in spark.sql("SELECT * FROM fpg").collect()}
        assert r1["a b"] == 8.0 and r1["a"] == 8.0 and r1["a b c"] == 2.0

        spark.createDataFrame([(["a", "b"], t2)] * 4, schema) \
            .coalesce(1).write.mode("append").parquet(src)
        import time

        time.sleep(0.5)
        q.processAllAvailable()
        latest = {r["itemset"]: r for r in spark.sql(
            "SELECT * FROM fpg").collect() if r["period"] ==
            int(pd.Timestamp(t2).value // 10 ** 9 // 60)}
        # two elapsed periods at decay 0.5: 8·0.25 + 4 = 6.0
        assert latest["a b"]["support"] == 6.0
        assert latest["a"]["support"] == 6.0
        # 'c' itemsets decayed to 0.5, no new arrivals
        assert latest["a b c"]["support"] == 0.5
    finally:
        q.stop()


def test_streaming_fpgrowth_period_emit(spark, tmp_path):
    """emit='period': a second batch inside the SAME event-time period is
    insert-only (no mined rows emitted for it); a batch that advances the
    period mines and its supports include the silent batch's inserts."""
    src = str(tmp_path / "fp_src_period")
    schema = "items array<string>, ts timestamp"
    t0 = pd.Timestamp("2025-01-01 00:00:05").to_pydatetime()
    t0b = pd.Timestamp("2025-01-01 00:00:40").to_pydatetime()  # same period
    t1 = pd.Timestamp("2025-01-01 00:01:10").to_pydatetime()   # next period
    spark.createDataFrame([(["a", "b"], t0)] * 4, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_fpgrowth(stream, min_support_count=0.4, decay=0.5,
                             period_seconds=60, num_groups=4, emit="period")
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("fpg_period").start())
    try:
        q.processAllAvailable()
        n_first = spark.sql("SELECT count(*) c FROM fpg_period").collect()[0]["c"]
        assert n_first > 0  # fresh state counts as a period start

        # same-period batch: insert-only, emits nothing new
        spark.createDataFrame([(["a", "b"], t0b)] * 3, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        import time
        time.sleep(0.5)
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM fpg_period"
                         ).collect()[0]["c"] == n_first

        # period-advancing batch: mines, and includes the silent inserts
        spark.createDataFrame([(["a", "b"], t1)] * 2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(0.5)
        q.processAllAvailable()
        latest = {r["itemset"]: r["support"] for r in spark.sql(
            "SELECT * FROM fpg_period").collect()
            if r["period"] == int(pd.Timestamp(t1).value // 10 ** 9 // 60)}
        # (4+3 in period p) decayed once at 0.5 + 2 new = 5.5
        assert latest["a b"] == 5.5
    finally:
        q.stop()
