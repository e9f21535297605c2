"""Dedup-on-ingest: drop exact-duplicate documents from a micro-batch
stream BEFORE they enter downstream sinks (the full-text index, a corpus
table) — the standard training-data ingest shape where re-crawled or
re-delivered content must not inflate the corpus.

Design (foreachBatch, composes with streaming/index_ingest.py):
- per batch: compute content keys on an (id, key) PROJECTION — document
  text never enters any dedup shuffle (the same discipline as
  pipelines/dedup.dedup_exact); decide drop-ids from metadata only, then
  anti-join the batch rows by id (drop sets are duplicate-sized, so the
  join broadcasts under AQE).
- the seen-keys store is a parquet table of (key, first_id) hash-bucketed
  by key; its bucket count + normalization flag are persisted in
  `_meta.json` (a silently changed constant would otherwise disable dedup
  against existing stores). The store is only ever SCANNED, never
  shuffled: matches are found by broadcasting the batch's key set into a
  left-semi scan of the pruned buckets.
- replays append duplicate key rows (harmless to the anti-join semantics);
  `compact_seen` periodically rewrites the store to distinct keys and one
  file set per bucket — without it a year-long stream accumulates one
  small file per bucket per epoch. The streaming wrapper runs it on the
  same cadence as index compaction.
- crash ordering: keys are recorded AFTER the downstream apply commits
  (see stream_dedup_index_updates) — recording first would make a
  crash-then-replay anti-join the batch against its own keys and silently
  drop the documents.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.functions.text import fingerprint

_DEFAULT_KEY_BUCKETS = 64


def _store_meta(seen_dir: str, normalize: bool) -> dict:
    """Load (or create) the store's layout contract."""
    path = os.path.join(seen_dir, "_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            meta = json.load(f)
        if bool(meta.get("normalize")) != bool(normalize):
            raise ValueError(
                f"seen-keys store at {seen_dir!r} was built with "
                f"normalize={meta.get('normalize')} — mixing key schemes "
                "would silently stop matching previously seen content")
        return meta
    os.makedirs(seen_dir, exist_ok=True)
    meta = {"n_buckets": _DEFAULT_KEY_BUCKETS, "normalize": bool(normalize)}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return meta


def _key_expr(text_col: str, normalize: bool):
    """Content-key expression: NULL text keys as empty content (a NULL
    _key would never equi-join and the row would be re-ingested on every
    redelivery)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return fingerprint(text) if normalize else F.md5(text)


def _keyed_ids(df: DataFrame, id_col: str, text_col: str, normalize: bool,
               n_buckets: int) -> DataFrame:
    """(id, _key, _kb) projection — text is consumed to COMPUTE the key and
    never survives into the relation, so no dedup stage shuffles it."""
    return df.select(
        F.col(id_col), _key_expr(text_col, normalize).alias("_key"),
    ).withColumn("_kb", F.pmod(F.xxhash64("_key"), F.lit(n_buckets))
                 .cast("int"))


def dedup_filter(
    batch_df: DataFrame,
    seen_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (fresh_rows, fresh_keys): the batch minus in-batch duplicate
    content (min id kept) and minus content already in the store, plus the
    (id, _key, _kb) metadata of the survivors for `record_keys`. All dedup
    decisions happen on metadata projections; the batch rows are filtered
    with one id anti-join at the end."""
    from pyspark.sql import Window as W

    from macrobase_spark.atomic import recover_swap

    spark = batch_df.sparkSession
    meta = _store_meta(seen_dir, normalize)
    # recover a crashed compact_seen swap BEFORE the existence check: in
    # the crash window keys.parquet is ABSENT (history sits in _old), and
    # skipping recovery here would dedup against nothing, then a later
    # compaction would delete the _old history for good
    recover_swap(os.path.join(seen_dir, "keys.parquet"))
    # the keyed projection fans into several branches below — pin it once
    # (metadata-sized) so the fingerprint pass over text runs exactly once
    ids = _keyed_ids(batch_df, id_col, text_col, normalize,
                     meta["n_buckets"]).localCheckpoint(eager=True)
    # deterministic same-id collapse FIRST: per id keep the MIN key, so the
    # key recorded in the store always describes the content this batch
    # elects for that id — two independent dropDuplicates picks could
    # otherwise record key A while ingesting content B when one batch
    # carries the same id with DIFFERENT content (r5 advice); a later
    # redelivery of B would then pass the filter as fresh
    per_id = (ids.withColumn(
        "_kmin", F.min("_key").over(W.partitionBy(id_col)))
        .filter(F.col("_key") == F.col("_kmin")).drop("_kmin")
        .dropDuplicates([id_col]))  # at-least-once sources can redeliver
    # the SAME (id, content) twice within one batch — collapse exact twins
    keep_ids = (per_id.withColumn(
        "_min", F.min(id_col).over(W.partitionBy("_key")))
        .filter(F.col(id_col) == F.col("_min")).drop("_min"))

    path = os.path.join(seen_dir, "keys.parquet")
    if os.path.exists(path):
        # store side is only SCANNED: broadcast the batch key set into a
        # left-semi over the pruned buckets (matches ≤ batch size), then
        # broadcast the matches back — the store never shuffles.
        kbs = [r["_kb"] for r in keep_ids.select("_kb").distinct().collect()]
        seen = (spark.read.parquet(path)
                .filter(F.col("_kb").isin(kbs))
                .select("_key", "_kb"))
        batch_keys = keep_ids.select("_key", "_kb").distinct()
        matched = seen.join(F.broadcast(batch_keys), ["_key", "_kb"],
                            "left_semi").distinct()
        fresh_keys = keep_ids.join(F.broadcast(matched), ["_key", "_kb"],
                                   "left_anti")
    else:
        fresh_keys = keep_ids
    fresh_keys = fresh_keys.localCheckpoint(eager=True)
    # drop set = batch ids NOT surviving — duplicate-sized, so this final
    # anti-join broadcasts under AQE and the text column never shuffles
    # DISTINCT before the multiset difference: a same-id twin would
    # otherwise survive in the drop set and anti-join away its own keeper
    drop_ids = (ids.select(id_col).distinct()
                .exceptAll(fresh_keys.select(id_col)))
    fresh_candidates = batch_df.join(drop_ids, id_col, "left_anti")
    # same-id twins with IDENTICAL keys: any row satisfies the recorded
    # key, dropDuplicates is fine. Same-id rows with DIFFERENT keys (rare
    # contract violation) must ingest exactly the row whose key was
    # elected above — detected on the metadata projection, and only then
    # is the key recomputed on the candidate rows (second fingerprint
    # pass confined to the anomalous batch)
    has_conflicts = bool(
        ids.groupBy(id_col).agg(F.count_distinct("_key").alias("_nk"))
        .filter(F.col("_nk") > 1).limit(1).count())
    if has_conflicts:
        elected = fresh_keys.select(
            F.col(id_col), F.col("_key").alias("_rowkey"))
        fresh_rows = (fresh_candidates
                      .withColumn("_rowkey", _key_expr(text_col, normalize))
                      .join(F.broadcast(elected), [id_col, "_rowkey"],
                            "left_semi")
                      .drop("_rowkey").dropDuplicates([id_col]))
    else:
        fresh_rows = fresh_candidates.dropDuplicates([id_col])
    return fresh_rows, fresh_keys


def record_keys(fresh_keys: DataFrame, seen_dir: str,
                id_col: str = "doc_id") -> None:
    """Append the surviving (key, id) metadata to the store. Semantically
    idempotent: a replayed append adds duplicate key rows, which cannot
    change any future anti-join decision (compact_seen clears them)."""
    from macrobase_spark.atomic import recover_swap

    path = os.path.join(seen_dir, "keys.parquet")
    recover_swap(path)
    (fresh_keys.select("_key", "_kb", F.col(id_col).alias("first_id"))
     .repartition("_kb")
     .write.mode("append").partitionBy("_kb").parquet(path))


def compact_seen(spark, seen_dir: str) -> dict:
    """Rewrite the seen-keys store to distinct keys (min first_id) and one
    compacted file set per bucket — bounds the per-batch scan cost that
    epoch appends (plus replay duplicates) would otherwise grow without
    limit. Same crash-safe rename-swap protocol as the ANN compactors."""
    from macrobase_spark.atomic import recover_swap as _recover_swap
    from macrobase_spark.atomic import swap_in as _swap_in

    path = os.path.join(seen_dir, "keys.parquet")
    _recover_swap(path)  # BEFORE the existence probe: in the swap crash
    # window the live dir is absent and only recovery can bring it back
    if not os.path.exists(path):
        return {"compacted": False}
    tmp = path + "_compact"
    (spark.read.parquet(path)
     .groupBy("_key", "_kb").agg(F.min("first_id").alias("first_id"))
     .repartition("_kb")
     .write.mode("overwrite").partitionBy("_kb").parquet(tmp))
    _swap_in(path, tmp)
    return {"compacted": True}


def dedup_batch(
    batch_df: DataFrame,
    seen_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    sink=None,
) -> DataFrame:
    """One-shot batch dedup. `sink(fresh_rows)` — your durable write — runs
    BETWEEN filtering and key recording: recording first would mean a
    crash before your write permanently loses those documents (the rerun
    would anti-join them against their own keys). If you have no durable
    side effect, sink=None just filters and records."""
    fresh_rows, fresh_keys = dedup_filter(batch_df, seen_dir, id_col,
                                          text_col, normalize)
    if sink is not None:
        sink(fresh_rows)
    record_keys(fresh_keys, seen_dir, id_col)
    return fresh_rows


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
    on_run_id_change: str = "error",
):
    """Dedup-on-ingest feeding the full-text index: each micro-batch is
    exact-deduped against everything already ingested, then applied to the
    LSM index via apply_stream_batch (which supplies the effectively-once
    epoch protocol; on_run_id_change passes through for checkpoint-reset
    handling). The seen-keys store lives inside the index dir and is
    compacted on the index's compaction cadence. Returns the
    StreamingQuery."""
    from macrobase_spark.streaming.index_ingest import apply_stream_batch

    seen_dir = os.path.join(out_dir, "_dedup")
    run_id = os.path.abspath(checkpoint_dir)

    def _body(batch_df: DataFrame, epoch_id: int) -> None:
        # ORDER MATTERS: keys are recorded AFTER the index apply (see the
        # module docstring). A crash between apply-commit and record leaves
        # keys unrecorded; the replay skips the apply (epoch committed) and
        # re-records — duplicate key rows are harmless and compacted away.
        fresh_rows, fresh_keys = dedup_filter(
            batch_df, seen_dir, doc_id_col, text_col, normalize)
        action = apply_stream_batch(fresh_rows, epoch_id, out_dir,
                                    doc_id_col=doc_id_col,
                                    text_col=text_col,
                                    compact_every=compact_every,
                                    build_kwargs=build_kwargs,
                                    run_id=run_id,
                                    on_run_id_change=on_run_id_change)
        if action != "skip_empty":
            record_keys(fresh_keys, seen_dir, doc_id_col)
        if action.endswith("+compact"):
            compact_seen(batch_df.sparkSession, seen_dir)

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
