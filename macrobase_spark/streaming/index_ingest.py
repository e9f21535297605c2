"""Streaming ingest into the full-text index: Structured Streaming source →
`foreachBatch` → the LSM incremental update path, with idempotent epoch
tracking and periodic background compaction.

Reference parity: MacroBase v0's engine is a push-streaming pipeline fed by
ingesters (`legacy/src/main/java/macrobase/ingest/*.java`,
`legacy/.../analysis/pipeline/stream/*`); its analysis state updates per
tuple. Here the same continuously-arriving-transcripts story runs on
Structured Streaming: each micro-batch appends an O(delta) LSM segment
(`index/build.py:update_index`), queries stay exact between updates
(cross-row df sums + version-gated block pruning), and `compact_index`
runs every `compact_every` epochs to merge segments back into single rows.

Exactly-once: `foreachBatch` re-delivers a batch after a failure, and a
re-applied delta would duplicate postings (update_index's append-only
doc_id contract). Committed progress is therefore recorded in
`_stream_epochs.json` inside the index directory and re-delivered epochs
are skipped — the standard idempotent-foreachBatch pattern, giving
effectively-once index mutation on top of the checkpointed source offsets.
The ledger is O(1): epoch ids are monotonically increasing per checkpoint
(a failure replays the SAME id, never an older one), so a high-water mark
plus the recent-ids window is sufficient — the file does not grow with
stream lifetime (a year at 1 epoch/30 s stays a few hundred bytes).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

_EPOCHS_FILE = "_stream_epochs.json"


def _load_epochs(out_dir: str) -> dict:
    path = os.path.join(out_dir, _EPOCHS_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"committed": [], "since_compact": 0}


def _save_epochs(out_dir: str, rec: dict) -> None:
    path = os.path.join(out_dir, _EPOCHS_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)  # atomic on POSIX: a crash never half-writes


def apply_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    out_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 0,
    build_kwargs: dict | None = None,
) -> str:
    """Apply one micro-batch to the index at `out_dir`. Returns what was
    done: 'skip_empty' | 'skip_replayed' | 'build' | 'update' |
    'update+compact'. Usable directly as a foreachBatch body or standalone
    (tested standalone so the logic is exercised without a streaming query).
    """
    from macrobase_spark.index.build import (build_index, compact_index,
                                             update_index)

    rec = _load_epochs(out_dir) if os.path.isdir(out_dir) else {
        "committed": [], "since_compact": 0}
    high_water = max(rec["committed"], default=-1)
    if epoch_id in rec["committed"] or epoch_id <= high_water:
        return "skip_replayed"  # failure re-delivery: already applied
    # cheap emptiness probe on the projected columns only
    if batch_df.select(doc_id_col).limit(1).count() == 0:
        return "skip_empty"

    fresh = not os.path.exists(os.path.join(out_dir, "stats.json"))
    if fresh:
        build_index(batch_df, out_dir, doc_id_col=doc_id_col,
                    text_col=text_col, resume=False,
                    **(build_kwargs or {}))
        action = "build"
    else:
        update_index(batch_df, out_dir, doc_id_col=doc_id_col,
                     text_col=text_col)
        action = "update"

    # bounded ledger: high-water mark + a short recent window (see module
    # docstring — epoch ids only ever move forward per checkpoint)
    rec["committed"] = sorted(set(rec["committed"]) | {epoch_id})[-64:]
    if action == "update":
        rec["since_compact"] += 1
    if action == "update" and compact_every and (
            rec["since_compact"] >= compact_every):
        compact_index(batch_df.sparkSession, out_dir)
        rec["since_compact"] = 0
        action = "update+compact"
    _save_epochs(out_dir, rec)
    return action


def stream_index_updates(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 8,
    trigger: dict | None = None,
    build_kwargs: dict | None = None,
):
    """Attach the index-maintenance sink to a streaming DataFrame of turns
    (doc_id, text, ...). Returns the started StreamingQuery.

    trigger: passed to DataStreamWriter.trigger — e.g.
    {"availableNow": True} to drain what's currently available and stop
    (batch-incremental ingest), or {"processingTime": "30 seconds"}.

    Scale shape: every epoch is one O(delta) distributed job (the same
    salted (term, salt) shuffle as the fresh build — a hot term's delta
    shards across reducers); the driver-side bookkeeping here is a handful
    of file ops per epoch. Compaction cost is amortized background work
    bounded by the buckets the deltas touched.
    """

    def _body(batch_df: DataFrame, epoch_id: int) -> None:
        apply_stream_batch(batch_df, epoch_id, out_dir,
                           doc_id_col=doc_id_col, text_col=text_col,
                           compact_every=compact_every,
                           build_kwargs=build_kwargs)

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
