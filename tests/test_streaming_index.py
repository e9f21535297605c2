"""Streaming ingest into the full-text index (streaming/index_ingest.py):
foreachBatch → LSM update path. Covers the epoch-idempotency contract
(re-delivered batches are no-ops), build-then-update-then-compact
sequencing, rank+score identity vs a from-scratch build over everything
ingested, and a real Structured Streaming file-source run where a SECOND
invocation with the same checkpoint processes only newly-arrived files."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
from macrobase_spark.index.bm25 import bm25_topk
from macrobase_spark.streaming.index_ingest import (apply_stream_batch,
                                                    stream_index_updates)

QUERIES = ["the", "rare7", "tok0042 tok0007", "rare23 the call"]


def _slice(df, lo, hi):
    return df.filter((F.col("conv_id") >= f"conv{lo:08d}")
                     & (F.col("conv_id") < f"conv{hi:08d}"))


def _assert_matches_scratch(spark, out, full_df, tmp, tag):
    from macrobase_spark.index.build import build_index

    scratch = str(tmp / f"scratch_{tag}")
    build_index(full_df, scratch, num_buckets=8, hot_df_threshold=120,
                hot_sample_frac=0.5, resume=False)
    for q in QUERIES:
        got = [(r["doc_id"], r["score"]) for r in
               bm25_topk(spark, out, q, k=10).collect()]
        want = [(r["doc_id"], r["score"]) for r in
                bm25_topk(spark, scratch, q, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], (tag, q)
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), (tag, q, gs, ws)


def test_apply_stream_batch_sequence(spark, tmp_path):
    """epoch 0 builds, epoch 1 updates, replayed epoch 1 is a no-op,
    epoch 2 triggers compaction (compact_every=2); after every step the
    index is rank+score identical to a from-scratch build."""
    all_df = with_doc_id(synth_transcripts(spark, n_convs=90, seed=42)).cache()
    d0, d1, d2 = (_slice(all_df, 0, 50), _slice(all_df, 50, 70),
                  _slice(all_df, 70, 90))
    out = str(tmp_path / "stream_idx")
    kw = dict(compact_every=2, build_kwargs=dict(
        num_buckets=8, hot_df_threshold=120, hot_sample_frac=0.5))

    assert apply_stream_batch(d0, 0, out, **kw) == "build"
    assert apply_stream_batch(d1, 1, out, **kw) == "update"
    n_after_1 = bm25_topk(spark, out, "the", k=10).count()
    # failure re-delivery of epoch 1: must not double-apply the delta
    assert apply_stream_batch(d1, 1, out, **kw) == "skip_replayed"
    assert bm25_topk(spark, out, "the", k=10).count() == n_after_1
    _assert_matches_scratch(spark, out, _slice(all_df, 0, 70), tmp_path, "e1")

    # empty batch: no index mutation, no epoch burn
    assert apply_stream_batch(d2.limit(0), 99, out, **kw) == "skip_empty"

    assert apply_stream_batch(d2, 2, out, **kw) == "update+compact"
    _assert_matches_scratch(spark, out, all_df, tmp_path, "e2")


def test_stream_index_updates_file_source(spark, tmp_path):
    """End-to-end Structured Streaming: parquet file source, availableNow
    trigger. Run 1 ingests the first two deltas; more files arrive; run 2
    with the SAME checkpoint ingests only the new arrivals (source offsets)
    and replays nothing (epoch ledger). Final index == scratch build."""
    all_df = with_doc_id(synth_transcripts(spark, n_convs=80, seed=42)).cache()
    src = tmp_path / "arrivals"
    src.mkdir()
    schema = all_df.schema
    _slice(all_df, 0, 40).coalesce(1).write.parquet(str(src / "d0"))
    _slice(all_df, 40, 60).coalesce(1).write.parquet(str(src / "d1"))

    out = str(tmp_path / "s_idx")
    ckpt = str(tmp_path / "ckpt")
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*"))
    q = stream_index_updates(
        reader, out, ckpt, compact_every=0,
        trigger={"availableNow": True},
        build_kwargs=dict(num_buckets=8, hot_df_threshold=120,
                          hot_sample_frac=0.5))
    q.awaitTermination(300)
    _assert_matches_scratch(spark, out, _slice(all_df, 0, 60), tmp_path, "r1")

    from macrobase_spark.streaming.index_ingest import _load_epochs

    epochs_r1 = list(_load_epochs(out)["committed"])
    assert len(epochs_r1) >= 2  # one per arrival file (maxFilesPerTrigger=1)

    _slice(all_df, 60, 80).coalesce(1).write.parquet(str(src / "d2"))
    reader2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1")
               .parquet(str(src) + "/*"))
    q2 = stream_index_updates(
        reader2, out, ckpt, compact_every=0,
        trigger={"availableNow": True},
        build_kwargs=dict(num_buckets=8, hot_df_threshold=120,
                          hot_sample_frac=0.5))
    q2.awaitTermination(300)
    epochs_r2 = _load_epochs(out)["committed"]
    # run 2 applied ONLY the new arrival(s): the run-1 ledger is a prefix
    assert epochs_r2[: len(epochs_r1)] == epochs_r1
    assert len(epochs_r2) > len(epochs_r1)
    _assert_matches_scratch(spark, out, all_df, tmp_path, "r2")
