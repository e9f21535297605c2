"""Dedup-on-ingest: drop exact-duplicate documents from a micro-batch
stream BEFORE they enter downstream sinks (the full-text index, a corpus
table) — the standard training-data ingest shape where re-crawled or
re-delivered content must not inflate the corpus.

Design (foreachBatch, composes with streaming/index_ingest.py):
- per batch: compute the content key (normalized fingerprint or raw md5 —
  same options as pipelines/dedup.dedup_exact), drop in-batch duplicates
  (keep min id), then LEFT ANTI join against the persisted seen-keys
  table and append the survivors' keys.
- the seen-keys store is a parquet table of (key, doc_id) HASH-BUCKETED by
  key into a fixed directory layout, so the anti-join reads only the
  bucket files matching the batch's keys (a micro-batch touches a bounded
  key set; the store grows with the corpus but each epoch's join is
  O(batch + matching buckets)).
- exactly-once: key appends are idempotent at the semantic level (a replay
  re-appends keys that are already present, which cannot change future
  dedup decisions — duplicate key rows are harmless to the anti-join), so
  this layer needs no epoch ledger of its own; pair it with
  index_ingest.apply_stream_batch (which has one) for the index mutation.

Scale shape: everything is one anti-join per batch keyed on the content
hash; the text column never shuffles (keys are computed in place, the join
projects keys + ids only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.functions.text import fingerprint

_N_KEY_BUCKETS = 64


def _keyed(df: DataFrame, id_col: str, text_col: str,
           normalize: bool) -> DataFrame:
    key = fingerprint(text_col) if normalize else F.md5(F.col(text_col))
    return df.withColumn("_key", key).withColumn(
        "_kb", F.pmod(F.xxhash64("_key"), F.lit(_N_KEY_BUCKETS)).cast("int"))


def dedup_filter(
    batch_df: DataFrame,
    seen_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Batch minus (a) in-batch duplicate content (min id kept) and (b)
    content already recorded in `seen_dir`. Keeps the internal `_key`/`_kb`
    columns so `record_keys` can persist the survivors WITHOUT recomputing;
    drop them (or call record_keys) before handing the rows on."""
    spark = batch_df.sparkSession
    keyed = _keyed(batch_df, id_col, text_col, normalize)
    # in-batch dedup: keep the min id per key (deterministic)
    from pyspark.sql import Window as W

    keep = keyed.withColumn(
        "_min", F.min(id_col).over(W.partitionBy("_key"))
    ).filter(F.col(id_col) == F.col("_min")).drop("_min")
    path = os.path.join(seen_dir, "keys.parquet")
    if os.path.exists(path):
        # Scale shape: the seen-keys store grows with the corpus and must
        # NEVER shuffle per batch. Two broadcast passes instead of a plain
        # anti-join (which would hash-partition the whole store):
        #   1. matched = store ⋉ broadcast(batch keys) — one partition-
        #      pruned SCAN of the matching buckets, no store shuffle;
        #      |matched| ≤ |batch|.
        #   2. batch anti-join broadcast(matched) — driver-free, tiny.
        kbs = [r["_kb"] for r in keep.select("_kb").distinct().collect()]
        seen = (spark.read.parquet(path)
                .filter(F.col("_kb").isin(kbs))
                .select("_key", "_kb"))
        batch_keys = keep.select("_key", "_kb").distinct()
        matched = seen.join(F.broadcast(batch_keys), ["_key", "_kb"],
                            "left_semi").distinct()
        return keep.join(F.broadcast(matched), ["_key", "_kb"], "left_anti")
    return keep


def record_keys(fresh: DataFrame, seen_dir: str,
                id_col: str = "doc_id") -> None:
    """Append the surviving rows' content keys to the store. Append is
    idempotent at the semantic level: a replayed append adds duplicate key
    rows, which cannot change any future anti-join decision."""
    path = os.path.join(seen_dir, "keys.parquet")
    (fresh.select("_key", "_kb", F.col(id_col).alias("first_id"))
     .repartition("_kb")
     .write.mode("append").partitionBy("_kb").parquet(path))


def dedup_batch(
    batch_df: DataFrame,
    seen_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """One-shot batch dedup: filter + record in one call (batch-job use;
    the streaming body orders record_keys AFTER the downstream apply — see
    stream_dedup_index_updates for why)."""
    fresh = dedup_filter(batch_df, seen_dir, id_col, text_col, normalize)
    record_keys(fresh, seen_dir, id_col)
    return fresh.drop("_key", "_kb")


def stream_dedup_index_updates(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    compact_every: int = 8,
    trigger: dict | None = None,
    build_kwargs: dict | None = None,
):
    """Dedup-on-ingest feeding the full-text index: each micro-batch is
    exact-deduped against everything already ingested, then applied to the
    LSM index via apply_stream_batch (which supplies the effectively-once
    epoch protocol). The seen-keys store lives inside the index dir, so
    index + dedup state travel together. Returns the StreamingQuery."""
    from macrobase_spark.streaming.index_ingest import apply_stream_batch

    seen_dir = os.path.join(out_dir, "_dedup")
    run_id = os.path.abspath(checkpoint_dir)

    def _body(batch_df: DataFrame, epoch_id: int) -> None:
        # ORDER MATTERS: keys are recorded AFTER the index apply. Recording
        # first would make a crash-then-replay anti-join the batch against
        # its own keys and silently drop the docs from the index. With this
        # order a crash between apply-commit and record leaves the keys
        # unrecorded; the replay skips the apply (epoch committed) and
        # re-records — duplicate key rows are harmless to the anti-join.
        fresh = dedup_filter(batch_df, seen_dir, doc_id_col, text_col,
                             normalize).localCheckpoint(eager=True)
        action = apply_stream_batch(fresh.drop("_key", "_kb"), epoch_id,
                                    out_dir, doc_id_col=doc_id_col,
                                    text_col=text_col,
                                    compact_every=compact_every,
                                    build_kwargs=build_kwargs, run_id=run_id)
        if action != "skip_empty":
            record_keys(fresh, seen_dir, doc_id_col)

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
