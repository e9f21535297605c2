"""merge_indexes: shard consolidation via blob-level segment append —
rank+score identity vs a from-scratch build over the union corpus,
pre- AND post-compaction, update-after-merge, and the v1 guardrails."""

import math

import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
from macrobase_spark.index.build import (build_index, bucket_versions,
                                         compact_index, delete_docs,
                                         merge_indexes, update_index)
from macrobase_spark.index.bm25 import bm25_topk

QUERIES = ["the", "tok0042 tok0007", "rare11 the call", "tok0001"]


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    df = with_doc_id(synth_transcripts(spark, n_convs=40, seed=7)).cache()
    root = tmp_path_factory.mktemp("merge")
    full = str(root / "full")
    s1, s2, s3 = (str(root / f"s{i}") for i in (1, 2, 3))
    build_index(df, full, num_buckets=4, hot_df_threshold=10 ** 9)
    for i, sd in enumerate([s1, s2, s3]):
        build_index(df.filter(F.col("doc_id") % 3 == i), sd,
                    num_buckets=4, hot_df_threshold=10 ** 9)
    out = str(root / "merged")
    report = merge_indexes(spark, [s1, s2, s3], out)
    return df, full, [s1, s2, s3], out, report


def _topk(spark, idx, q, k=12):
    return [(r["doc_id"], r["score"]) for r in
            bm25_topk(spark, idx, q, k=k).collect()]


def test_merged_identical_to_monolith_pre_compaction(spark, merged):
    df, full, _, out, report = merged
    assert report["n_docs"] == df.count() and report["shards"] == 3
    for q in QUERIES:
        got, want = _topk(spark, out, q), _topk(spark, full, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), q


def test_compaction_restores_pruning_and_identity(spark, merged):
    import json
    import os

    _, full, _, out, _ = merged
    compact_index(spark, out)
    with open(os.path.join(out, "stats.json")) as f:
        stats = json.load(f)
    assert stats["segmented_buckets"] == []
    bv = bucket_versions(out)
    assert bv and all(v == stats["version"] for v in bv.values())
    for q in QUERIES:
        got, want = _topk(spark, out, q), _topk(spark, full, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), q


def test_update_after_merge(spark, merged, tmp_path):
    """The merged index is a first-class LSM citizen: update_index
    appends, queries stay identical to a from-scratch build over the
    grown corpus."""
    df, _, _, out, _ = merged
    delta = (with_doc_id(synth_transcripts(spark, n_convs=6, seed=99))
             .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    update_index(delta, out)
    grown = str(tmp_path / "grown_full")
    build_index(df.unionByName(delta.select(*df.columns)), grown,
                num_buckets=4, hot_df_threshold=10 ** 9)
    for q in ["the", "tok0042 tok0007"]:
        got, want = _topk(spark, out, q), _topk(spark, grown, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), q


def test_merge_guardrails(spark, merged, tmp_path):
    df, full, shards, out, _ = merged
    s1, s2, _ = shards
    # duplicate dir (normalized) and overlapping doc ids
    with pytest.raises(ValueError, match="duplicate"):
        merge_indexes(spark, [s1, s1 + "/"], str(tmp_path / "m0"))
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, [full, s1], str(tmp_path / "m1"))
    # bucket-count mismatch
    nb2 = str(tmp_path / "nb2")
    build_index(df.filter(F.col("doc_id") % 3 == 0).limit(10)
                .withColumn("doc_id", F.col("doc_id") + 20_000_000),
                nb2, num_buckets=2, hot_df_threshold=10 ** 9)
    with pytest.raises(ValueError, match="num_buckets"):
        merge_indexes(spark, [s1, nb2], str(tmp_path / "m2"))
    # stoplist mismatch
    st = str(tmp_path / "st")
    build_index(df.filter(F.col("doc_id") % 3 == 0).limit(10)
                .withColumn("doc_id", F.col("doc_id") + 30_000_000),
                st, num_buckets=4, hot_df_threshold=10 ** 9,
                stopwords=["the"])
    with pytest.raises(ValueError, match="stoplist"):
        merge_indexes(spark, [s1, st], str(tmp_path / "m3"))
    # pending tombstones
    tb = str(tmp_path / "tb")
    build_index(df.filter(F.col("doc_id") % 3 == 0).limit(10)
                .withColumn("doc_id", F.col("doc_id") + 40_000_000),
                tb, num_buckets=4, hot_df_threshold=10 ** 9)
    delete_docs(spark, tb, spark.range(40_000_000, 40_000_001)
                .withColumnRenamed("id", "doc_id"))
    with pytest.raises(ValueError, match="tombstone"):
        merge_indexes(spark, [s1, tb], str(tmp_path / "m4"))
    # refuse an occupied output dir and a single shard
    with pytest.raises(ValueError, match="already holds"):
        merge_indexes(spark, [s1, s2], out)
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, [s1], str(tmp_path / "m5"))


def test_positional_merge_phrase_identity(spark, tmp_path):
    """Shards built with positions=True merge including the positional
    layer: phrase queries over the merged index are rank+score identical
    to a from-scratch positional build, pre- and post-compaction; a
    mixed positional/non-positional merge refuses."""
    from macrobase_spark.index.bm25 import bm25_phrase_topk

    df = with_doc_id(synth_transcripts(spark, n_convs=24, seed=13)).cache()
    full = str(tmp_path / "pfull")
    s1, s2 = str(tmp_path / "ps1"), str(tmp_path / "ps2")
    build_index(df, full, num_buckets=4, hot_df_threshold=10 ** 9,
                positions=True)
    for i, sd in enumerate([s1, s2]):
        build_index(df.filter(F.col("doc_id") % 2 == i), sd,
                    num_buckets=4, hot_df_threshold=10 ** 9,
                    positions=True)
    out = str(tmp_path / "pmerged")
    merge_indexes(spark, [s1, s2], out)

    def phrase_top(idx, q):
        return [(r["doc_id"], r["score"]) for r in
                bm25_phrase_topk(spark, idx, q, k=10).collect()]

    for q in ["tok0001 tok0000", "the the"]:
        got, want = phrase_top(out, q), phrase_top(full, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), q
    compact_index(spark, out)
    for q in ["tok0001 tok0000", "the the"]:
        got, want = phrase_top(out, q), phrase_top(full, q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), q
    # mixed positional/non-positional refuses
    nopos = str(tmp_path / "nopos")
    build_index(df.filter(F.col("doc_id") % 2 == 0).limit(5)
                .withColumn("doc_id", F.col("doc_id") + 50_000_000),
                nopos, num_buckets=4, hot_df_threshold=10 ** 9)
    with pytest.raises(ValueError, match="positional"):
        merge_indexes(spark, [s1, nopos], str(tmp_path / "pm2"))
