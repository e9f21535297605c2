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


def test_crash_between_mutation_and_ledger_commit(spark, tmp_path):
    """The effectively-once crash window (ADVICE r3): update_index ran but
    the ledger commit did not. Simulated exactly: after a committed epoch-1
    update, reconstruct the crash state (inflight journal with the
    pre-epoch-1 snapshot + epoch 1 absent from the ledger). The replayed
    epoch must roll the partial apply back and re-apply ONCE — no
    duplicated postings, rank+score identical to a scratch build."""
    import json as _json
    import os

    from macrobase_spark.streaming.index_ingest import (_EPOCHS_FILE,
                                                        _INFLIGHT_FILE,
                                                        _take_snapshot)

    all_df = with_doc_id(synth_transcripts(spark, n_convs=70, seed=42)).cache()
    d0, d1 = _slice(all_df, 0, 40), _slice(all_df, 40, 70)
    out = str(tmp_path / "crash_idx")
    kw = dict(build_kwargs=dict(num_buckets=8, hot_df_threshold=120,
                                hot_sample_frac=0.5))
    assert apply_stream_batch(d0, 0, out, **kw) == "build"

    pre = _take_snapshot(out)  # the snapshot epoch 1 would journal
    assert apply_stream_batch(d1, 1, out, **kw) == "update"
    # reconstruct "crash after mutation, before ledger commit"
    with open(os.path.join(out, _EPOCHS_FILE)) as f:
        rec = _json.load(f)
    rec["committed"] = [e for e in rec["committed"] if e != 1]
    with open(os.path.join(out, _EPOCHS_FILE), "w") as f:
        _json.dump(rec, f)
    with open(os.path.join(out, _INFLIGHT_FILE), "w") as f:
        _json.dump({"epoch_id": 1, "run_id": None, "snapshot": pre}, f)

    # foreachBatch replays epoch 1: must rollback the orphaned postings
    # first (the old code would re-append them → every epoch-1 doc twice)
    assert apply_stream_batch(d1, 1, out, **kw) == "rollback+update"
    assert not os.path.exists(os.path.join(out, _INFLIGHT_FILE))
    _assert_matches_scratch(spark, out, all_df, tmp_path, "crash")
    # df sanity: each doc counted once
    from macrobase_spark.index.build import read_index
    docs = read_index(spark, out)[1]
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_fresh_checkpoint_against_existing_index_raises(spark, tmp_path):
    """ADVICE r3: a restarted stream with a fresh checkpoint resets epoch
    ids to 0; against an existing index the old code silently skipped every
    batch (epoch <= high_water). Now: run_id mismatch raises, and the
    explicit reset escape hatch applies the batch."""
    all_df = with_doc_id(synth_transcripts(spark, n_convs=60, seed=42)).cache()
    d0, d1 = _slice(all_df, 0, 40), _slice(all_df, 40, 60)
    out = str(tmp_path / "runid_idx")
    kw = dict(build_kwargs=dict(num_buckets=8, hot_df_threshold=120,
                                hot_sample_frac=0.5))
    assert apply_stream_batch(d0, 0, out, run_id="ckptA", **kw) == "build"
    assert apply_stream_batch(d0, 0, out, run_id="ckptA", **kw) == \
        "skip_replayed"
    with pytest.raises(RuntimeError, match="checkpoint changed"):
        apply_stream_batch(d1, 0, out, run_id="ckptB", **kw)
    # explicit opt-in: ledger resets, the new stream's batch applies
    assert apply_stream_batch(d1, 0, out, run_id="ckptB",
                              on_run_id_change="reset", **kw) == "update"
    _assert_matches_scratch(spark, out, all_df, tmp_path, "runid")


def test_crashed_compaction_restores_and_stays_rank_identical(spark, tmp_path):
    """compact_index's overwrite deletes the stale buckets' old segment
    rows — a crash mid-overwrite must not lose postings. Simulate the two
    crash states: (a) backup complete + bucket contents destroyed → any
    entry point restores the pre-compaction state (queries rank-identical
    to scratch); (b) backup partial (no _complete) → dropped, originals
    untouched."""
    import os
    import shutil

    from macrobase_spark.index.build import (build_index, compact_index,
                                             read_index,
                                             restore_compact_backup,
                                             update_index)
    from macrobase_spark.index.build import _compact_backup_dir

    all_df = with_doc_id(synth_transcripts(spark, n_convs=80, seed=42)).cache()
    out = str(tmp_path / "ccrash")
    build_index(_slice(all_df, 0, 50), out, num_buckets=8,
                hot_df_threshold=120, hot_sample_frac=0.5)
    update_index(_slice(all_df, 50, 80), out)

    # (a) reproduce "backup written, overwrite destroyed a bucket, commit
    # never happened": run a real compaction to produce its backup, then
    # reinstate the backup and wreck the live bucket dirs it covers.
    rep = compact_index(spark, out)
    assert rep["compacted_buckets"]
    # rebuild the exact crash state: redo update over a fresh copy
    out2 = str(tmp_path / "ccrash2")
    build_index(_slice(all_df, 0, 50), out2, num_buckets=8,
                hot_df_threshold=120, hot_sample_frac=0.5)
    update_index(_slice(all_df, 50, 80), out2)
    import json as _json
    backup = _compact_backup_dir(out2)
    os.makedirs(backup)
    with open(os.path.join(out2, "stats.json")) as f:
        stats_txt = f.read()
    man = os.path.join(out2, "manifest.jsonl")
    with open(os.path.join(backup, "_meta.json"), "w") as f:
        _json.dump({"stats": stats_txt,
                    "manifest_len": os.path.getsize(man)}, f)
    seg_buckets = _json.loads(stats_txt)["segmented_buckets"]
    assert seg_buckets
    for b in seg_buckets:
        shutil.copytree(os.path.join(out2, "postings", f"bucket={b}"),
                        os.path.join(backup, f"bucket={b}"))
    with open(os.path.join(backup, "_complete"), "w") as f:
        f.write("1")
    # the "crash": overwrite half-done — one covered bucket emptied, one
    # stray new file in another
    wreck = os.path.join(out2, "postings", f"bucket={seg_buckets[0]}")
    shutil.rmtree(wreck)
    # read path must transparently restore before serving
    read_index(spark, out2)
    assert not os.path.isdir(backup)
    for q in ["the", "rare7", "tok0042 tok0007"]:
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               bm25_topk(spark, out2, q, k=10).collect()]
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                bm25_topk(spark, out, q, k=10).collect()]
        assert got == want, q

    # (b) partial backup (no _complete): dropped, nothing else touched
    os.makedirs(os.path.join(backup, "bucket=0"))
    before = sorted(os.listdir(os.path.join(out2, "postings")))
    assert restore_compact_backup(out2) is False
    assert not os.path.isdir(backup)
    assert sorted(os.listdir(os.path.join(out2, "postings"))) == before


def test_stream_dedup_index_updates(spark, tmp_path):
    """Dedup-on-ingest: re-delivered/duplicated documents across micro-
    batches must enter the index exactly once; the final index is
    rank+score identical to a scratch build over the UNIQUE corpus."""
    from macrobase_spark.streaming.dedup_ingest import (
        dedup_batch, stream_dedup_index_updates)

    all_df = with_doc_id(synth_transcripts(spark, n_convs=60, seed=42)).cache()
    uniq = _slice(all_df, 0, 60)
    # arrival files: second file re-delivers convs 20..40 under NEW doc_ids
    # (id+10^6) — content duplicates with different ids, the hard case
    dup = (_slice(all_df, 20, 40)
           .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    src = tmp_path / "arrivals"
    src.mkdir()
    _slice(all_df, 0, 40).coalesce(1).write.parquet(str(src / "d0"))
    dup.unionByName(_slice(all_df, 40, 60)).coalesce(1).write.parquet(
        str(src / "d1"))

    out = str(tmp_path / "dd_idx")
    q = stream_dedup_index_updates(
        (spark.readStream.schema(all_df.schema)
         .option("maxFilesPerTrigger", "1").parquet(str(src) + "/*")),
        out, str(tmp_path / "ckpt"), compact_every=0,
        trigger={"availableNow": True},
        build_kwargs=dict(num_buckets=8, hot_df_threshold=120,
                          hot_sample_frac=0.5))
    q.awaitTermination(300)

    from macrobase_spark.index.build import read_index
    from macrobase_spark.pipelines.dedup import dedup_exact

    # content-dedup also collapses legitimately identical turns WITHIN the
    # unique corpus (the synthetic corpus contains such a pair) — the
    # expected index corpus is dedup_exact(uniq), min id kept
    expected = dedup_exact(uniq).cache()
    docs = read_index(spark, out)[1]
    assert docs.count() == expected.count()
    assert docs.filter(F.col("doc_id") >= 1_000_000).count() == 0
    _assert_matches_scratch(spark, out, expected, tmp_path, "dd")

    # batch-level API: a whole re-delivered batch dedups to nothing
    left = dedup_batch(_slice(all_df, 0, 40),
                       str(tmp_path / "dd_idx" / "_dedup"))
    assert left.count() == 0


def test_dedup_ingest_null_text_meta_and_compaction(spark, tmp_path):
    """r4 review follow-ups: NULL-text rows dedup across batches (keys
    coalesce, never NULL); a normalize-scheme mismatch on an existing store
    raises; compact_seen shrinks the store's file count without changing
    dedup behavior; dedup_batch's sink callback runs BEFORE keys are
    recorded."""
    import glob

    from macrobase_spark.streaming.dedup_ingest import (compact_seen,
                                                        dedup_batch,
                                                        dedup_filter)

    seen = str(tmp_path / "seen")
    b1 = spark.createDataFrame(
        [(1, None), (2, "hello world"), (3, "hello world")],
        "doc_id long, text string")
    sunk = {}

    def sink(rows):
        sunk["n"] = rows.count()  # must be callable before record

    out1 = dedup_batch(b1, seen, sink=sink)
    assert sunk["n"] == 2  # null-text row + one copy of 'hello world'
    assert sorted(r["doc_id"] for r in out1.collect()) == [1, 2]

    # redelivered null-text + dup content in a later batch: both dropped
    b2 = spark.createDataFrame(
        [(10, None), (11, "hello world"), (12, "brand new text")],
        "doc_id long, text string")
    out2 = dedup_batch(b2, seen)
    assert sorted(r["doc_id"] for r in out2.collect()) == [12]

    with pytest.raises(ValueError, match="normalize"):
        dedup_filter(b2, seen, normalize=False)

    # replay appends pile up files; compaction shrinks them, behavior same
    for _ in range(4):
        dedup_batch(b1, seen)  # all-replay batches (record empty appends)
    files_before = len(glob.glob(f"{seen}/keys.parquet/_kb=*/part-*"))
    compact_seen(spark, seen)
    files_after = len(glob.glob(f"{seen}/keys.parquet/_kb=*/part-*"))
    assert files_after <= files_before
    out3 = dedup_batch(b2, seen)
    assert out3.count() == 0  # batch 2 fully seen now


def test_direct_update_crash_rolls_back(spark, tmp_path):
    """r4 review: update_index (the PUBLIC entry point, outside the
    streaming epoch protocol) appends docs+postings before its stats/
    manifest commit. Simulate a crash mid-update (journal present, owner
    dead, partial mutation on disk): the next entry point must roll the
    index back so queries are rank-identical to pre-update and a retried
    update cannot duplicate rows."""
    import json as _json
    import os

    from macrobase_spark.index.build import (_UPDATE_INFLIGHT, build_index,
                                             read_index,
                                             take_index_snapshot,
                                             update_index)

    all_df = with_doc_id(synth_transcripts(spark, n_convs=70, seed=42)).cache()
    out = str(tmp_path / "upd_crash")
    build_index(_slice(all_df, 0, 40), out, num_buckets=8,
                hot_df_threshold=120, hot_sample_frac=0.5)
    pre = take_index_snapshot(out)
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            bm25_topk(spark, out, "the", k=10).collect()]

    # the "crash": run a real update, then reinstate the pre-update journal
    # with a dead owner pid — exactly the state a killed update leaves
    update_index(_slice(all_df, 40, 70), out)
    with open(os.path.join(out, _UPDATE_INFLIGHT), "w") as f:
        _json.dump({"pid": 2 ** 22 + 54321, "snapshot": pre}, f)

    got = [(r["doc_id"], round(r["score"], 9)) for r in
           bm25_topk(spark, out, "the", k=10).collect()]  # read recovers
    assert got == want
    assert not os.path.exists(os.path.join(out, _UPDATE_INFLIGHT))
    # retry lands cleanly: no duplicated docs, matches scratch
    update_index(_slice(all_df, 40, 70), out)
    docs = read_index(spark, out)[1]
    assert docs.count() == docs.select("doc_id").distinct().count()
    _assert_matches_scratch(spark, out, all_df, tmp_path, "updcrash")


def test_rebuild_over_updated_index_requires_overwrite(spark, tmp_path):
    """r4 review: build_index(resume=True) over an index with incremental
    updates would treat update/compact manifest records as completed build
    buckets and silently index nothing — it must refuse instead."""
    from macrobase_spark.index.build import build_index, update_index

    all_df = with_doc_id(synth_transcripts(spark, n_convs=50, seed=42)).cache()
    out = str(tmp_path / "reb")
    build_index(_slice(all_df, 0, 30), out, num_buckets=8,
                hot_df_threshold=120, hot_sample_frac=0.5)
    update_index(_slice(all_df, 30, 50), out)
    with pytest.raises(ValueError, match="resume=False"):
        build_index(all_df, out, num_buckets=8, hot_df_threshold=120,
                    hot_sample_frac=0.5, resume=True)
    # overwrite path still works and matches scratch
    build_index(all_df, out, num_buckets=8, hot_df_threshold=120,
                hot_sample_frac=0.5, resume=False)
    _assert_matches_scratch(spark, out, all_df, tmp_path, "reb")


def test_overwrite_rebuild_clears_manifest(spark, tmp_path):
    """resume=False rebuild truncates the old manifest, so a later
    resume=True no longer trips over stale update/compact records."""
    from macrobase_spark.index.build import build_index, update_index

    all_df = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    out = str(tmp_path / "man")
    build_index(_slice(all_df, 0, 25), out, num_buckets=8,
                hot_df_threshold=120, hot_sample_frac=0.5)
    update_index(_slice(all_df, 25, 40), out)
    build_index(all_df, out, num_buckets=8, hot_df_threshold=120,
                hot_sample_frac=0.5, resume=False)
    # resume over the rebuilt index: fast no-op, no error
    rep = build_index(all_df, out, num_buckets=8, hot_df_threshold=120,
                      hot_sample_frac=0.5, resume=True)
    assert rep["n_docs"] == all_df.count()
    _assert_matches_scratch(spark, out, all_df, tmp_path, "man")


def test_dedup_ingest_swap_crash_and_same_id_twins(spark, tmp_path):
    """r4 review: (a) a crash inside compact_seen's rename window leaves no
    live keys.parquet — every store entry point must recover from _old
    before the existence check (the old code deduped against NOTHING and a
    later compaction deleted the history); (b) the SAME (id, content) row
    redelivered twice within one batch must collapse to one survivor."""
    import os

    from macrobase_spark.streaming.dedup_ingest import dedup_batch

    seen = str(tmp_path / "seen2")
    b1 = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")],
                               "doc_id long, text string")
    dedup_batch(b1, seen)
    # simulate the swap crash: live dir renamed away, history in _old
    path = os.path.join(seen, "keys.parquet")
    os.rename(path, path + "_old")
    # (a) next batch must still know b1's content
    b2 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "fresh text"), (11, "fresh text")],
        "doc_id long, text string")
    out = dedup_batch(b2, seen)
    rows = sorted((r["doc_id"], r["text"]) for r in out.collect())
    # (b) the id-11 twins collapsed; the redelivered content dropped
    assert rows == [(11, "fresh text")]
    assert os.path.isdir(path) and not os.path.isdir(path + "_old")


def test_windowed_diff_null_attr_values(spark):
    """r4 review: genuinely-NULL attribute values must not masquerade as
    grouped-out NULLs — no phantom a=NULL explanations, no duplicate-keyed
    rows from different grouping sets."""
    import datetime

    from macrobase_spark.streaming.windows import windowed_diff

    t0 = datetime.datetime(2024, 1, 1)
    rows = ([(t0, "x", "p", 1.0)] * 5 + [(t0, "x", None, 1.0)] * 5
            + [(t0, "y", "p", 0.0)] * 10)
    df = spark.createDataFrame(rows, "ts timestamp, a string, b string, "
                                     "_OUTLIER double")
    out = windowed_diff(df, "ts", ["a", "b"], window_length="1 hour",
                        min_support=0.0, min_ratio=0.0, max_order=2).collect()
    keyed = {}
    for r in out:
        k = (r["a"], r["b"])
        assert k not in keyed, f"duplicate-keyed explanation row {k}"
        keyed[k] = r
    # (a=x, b=NULL) can only be the order-1 context over ALL x rows (10)
    assert keyed[("x", None)]["total_count"] == 10
    # (a=NULL, b=p) is the legitimate order-1 "b=p" context (a grouped
    # out): 5 x-rows + 10 y-rows with b='p' — NULL-b rows excluded
    assert keyed[(None, "p")]["total_count"] == 15
    # and the order-2 (x, p) context counts only the non-NULL pairs
    assert keyed[("x", "p")]["total_count"] == 5
    assert all(not (r["a"] is None and r["b"] is None) for r in out)


def test_fresh_build_rollback_deletes_dirs(spark, tmp_path):
    """r5 advice (high): rollback of a FRESH build (snapshot of an empty
    dir) takes the directory-level rmtree paths that previously raised
    NameError (build.py had no module-level shutil import). A crashed
    first epoch must roll back to an empty dir, not wedge the index."""
    import os

    from macrobase_spark.index.build import (build_index,
                                             rollback_index_snapshot,
                                             take_index_snapshot)

    out = str(tmp_path / "fresh_rb")
    os.makedirs(out)
    snap = take_index_snapshot(out)  # stats None, docs None, no postings
    df = with_doc_id(synth_transcripts(spark, n_convs=15, seed=7))
    build_index(df, out, num_buckets=4, hot_df_threshold=120,
                hot_sample_frac=0.5)
    rollback_index_snapshot(out, snap)
    assert not os.path.isdir(os.path.join(out, "docs.parquet"))
    assert not os.path.isdir(os.path.join(out, "postings"))
    assert not os.path.exists(os.path.join(out, "stats.json"))
    assert not os.path.exists(os.path.join(out, "manifest.jsonl"))
    # the dir is clean — a fresh build lands as if the crash never happened
    build_index(df, out, num_buckets=4, hot_df_threshold=120,
                hot_sample_frac=0.5)
    assert bm25_topk(spark, out, "the", k=5).count() == 5


def test_rollback_removes_new_bucket_dirs(spark, tmp_path):
    """r5 advice (high): rollback must rmtree bucket dirs the failed
    attempt CREATED (the other previously-NameError path) and drop new
    files inside existing buckets, leaving queries rank-identical."""
    import os

    from macrobase_spark.index.build import (build_index,
                                             rollback_index_snapshot,
                                             take_index_snapshot)

    out = str(tmp_path / "bdir_rb")
    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=3))
    build_index(df, out, num_buckets=4, hot_df_threshold=120,
                hot_sample_frac=0.5)
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            bm25_topk(spark, out, "the", k=10).collect()]
    snap = take_index_snapshot(out)
    # simulate a crashed update that created a brand-new bucket dir plus a
    # stray file inside an existing bucket
    newdir = os.path.join(out, "postings", "bucket=999")
    os.makedirs(newdir)
    with open(os.path.join(newdir, "part-zzz.parquet"), "w") as f:
        f.write("junk")
    existing = next(d for d in sorted(os.listdir(os.path.join(out, "postings")))
                    if d.startswith("bucket=") and d != "bucket=999")
    stray = os.path.join(out, "postings", existing, "part-stray.parquet")
    with open(stray, "w") as f:
        f.write("junk")
    rollback_index_snapshot(out, snap)
    assert not os.path.isdir(newdir)
    assert not os.path.exists(stray)
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           bm25_topk(spark, out, "the", k=10).collect()]
    assert got == want


def test_same_pid_live_mutation_not_recovered(spark, tmp_path):
    """r5 advice (medium): a journal/backup owned by THIS pid must not be
    rolled back while the mutation is live on another thread of this
    process (query-server usage) — only once no in-process registration
    exists (a previous failed call) may same-pid recovery proceed."""
    import json as _json
    import os

    from macrobase_spark.index import build as B

    all_df = with_doc_id(synth_transcripts(spark, n_convs=40, seed=11)).cache()
    out = str(tmp_path / "live_mut")
    B.build_index(_slice(all_df, 0, 25), out, num_buckets=4,
                  hot_df_threshold=120, hot_sample_frac=0.5)
    pre = B.take_index_snapshot(out)
    B.update_index(_slice(all_df, 25, 40), out)
    post = [(r["doc_id"], round(r["score"], 9)) for r in
            bm25_topk(spark, out, "the", k=10).collect()]

    # fabricate the exact state a LIVE same-process update presents:
    # journal with our pid + an active in-process registration
    inflight = os.path.join(out, B._UPDATE_INFLIGHT)
    with open(inflight, "w") as f:
        _json.dump({"pid": os.getpid(), "snapshot": pre}, f)
    key = B._mutation_begin(out)
    try:
        assert B.recover_update_inflight(out) is False  # live → untouched
        assert os.path.exists(inflight)
        # a second in-process mutation on the same index must refuse loudly
        # rather than interleave
        with pytest.raises(RuntimeError, match="concurrent"):
            B._mutation_begin(out)
    finally:
        B._mutation_end(key)
    # registration gone → same-pid journal is a previous failed call: recover
    assert B.recover_update_inflight(out) is True
    assert not os.path.exists(inflight)
    # recovery rolled back to pre-update; re-apply and verify identity
    B.update_index(_slice(all_df, 25, 40), out)
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           bm25_topk(spark, out, "the", k=10).collect()]
    assert got == post

    # same contract for the compaction backup
    backup = B._compact_backup_dir(out)
    os.makedirs(backup, exist_ok=True)
    with open(os.path.join(backup, "_meta.json"), "w") as f:
        _json.dump({"stats": _json.dumps({"n_docs": 0}), "manifest_len": 0,
                    "pid": os.getpid()}, f)
    with open(os.path.join(backup, "_complete"), "w") as f:
        f.write("1")
    key = B._mutation_begin(out)
    try:
        assert B.restore_compact_backup(out) is False  # live → untouched
        assert os.path.isdir(backup)
    finally:
        B._mutation_end(key)


def test_dedup_ingest_same_id_conflicting_content(spark, tmp_path):
    """r5 advice: one batch carrying the same id with DIFFERENT content
    must ingest exactly the row whose key is recorded in the seen store —
    redelivering the ingested content later is a duplicate, while the
    never-ingested content (under a new id) must pass as fresh."""
    from macrobase_spark.streaming.dedup_ingest import dedup_batch

    seen = str(tmp_path / "seen_conflict")
    b1 = spark.createDataFrame(
        [(7, "content xx"), (7, "content yy"), (8, "other doc")],
        "doc_id long, text string")
    out1 = {r["doc_id"]: r["text"] for r in dedup_batch(b1, seen).collect()}
    assert set(out1) == {7, 8}
    ingested = out1[7]
    other = "content yy" if ingested == "content xx" else "content xx"
    # batch 2: redeliver BOTH contents under fresh ids
    b2 = spark.createDataFrame([(20, ingested), (21, other)],
                               "doc_id long, text string")
    out2 = {r["doc_id"]: r["text"] for r in dedup_batch(b2, seen).collect()}
    # the ingested content is seen → dropped; the non-ingested one is fresh
    assert out2 == {21: other}


def test_stream_ingest_positional_layer(spark, tmp_path):
    """r5: the positional (phrase) layer follows the streaming LSM
    lifecycle too — epoch 0 builds it (build_kwargs positions=True),
    epoch 1's update appends positional segments (phrase queries see the
    delta), the crash window replays WITHOUT duplicating positional
    segments, and the compaction epoch merges them; phrase rank+score
    identical to the single-threaded oracle at every stage."""
    import json as _json
    import os

    from macrobase_spark.index.bm25 import bm25_phrase_topk, phrase_oracle
    from macrobase_spark.streaming.index_ingest import (_EPOCHS_FILE,
                                                        _INFLIGHT_FILE,
                                                        _take_snapshot)

    all_df = with_doc_id(synth_transcripts(spark, n_convs=70, seed=42)).cache()
    d0, d1, d2 = (_slice(all_df, 0, 40), _slice(all_df, 40, 55),
                  _slice(all_df, 55, 70))
    out = str(tmp_path / "pos_stream_idx")
    kw = dict(compact_every=2, build_kwargs=dict(
        num_buckets=8, hot_df_threshold=120, hot_sample_frac=0.5,
        positions=True))

    def check(stage, df):
        docs = [(r["doc_id"], r["text"]) for r in
                df.select("doc_id", "text").collect()]
        for phrase, slop in [("tok0001 tok0000", 0), ("the the", 0),
                             ("tok0001 tok0000", 2)]:
            got = [(r["doc_id"], r["score"]) for r in
                   bm25_phrase_topk(spark, out, phrase, k=15,
                                    slop=slop).collect()]
            want = phrase_oracle(docs, phrase, k=15, slop=slop)
            assert [d for d, _ in got] == [d for d, _ in want], (stage, phrase)
            for (_, gs), (_, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-12), (stage, phrase)

    assert apply_stream_batch(d0, 0, out, **kw) == "build"
    check("e0", d0)

    pre = _take_snapshot(out)
    assert apply_stream_batch(d1, 1, out, **kw) == "update"
    check("e1", _slice(all_df, 0, 55))

    # crash after epoch-1 mutation, before ledger commit: the replay must
    # roll back the appended positional segment files too, else phrase dfs
    # double and scores drift
    with open(os.path.join(out, _EPOCHS_FILE)) as f:
        rec = _json.load(f)
    rec["committed"] = [e for e in rec["committed"] if e != 1]
    # a pre-commit crash also leaves the pre-epoch compaction counter
    rec["since_compact"] = max(0, rec["since_compact"] - 1)
    with open(os.path.join(out, _EPOCHS_FILE), "w") as f:
        _json.dump(rec, f)
    with open(os.path.join(out, _INFLIGHT_FILE), "w") as f:
        _json.dump({"epoch_id": 1, "run_id": None, "snapshot": pre}, f)
    assert apply_stream_batch(d1, 1, out, **kw) == "rollback+update"
    check("e1-replayed", _slice(all_df, 0, 55))

    # epoch 2 hits compact_every=2 → segments merge; results unchanged
    assert apply_stream_batch(d2, 2, out, **kw) == "update+compact"
    check("e2-compacted", all_df)
    pos = spark.read.parquet(os.path.join(out, "positions"))
    dup = (pos.groupBy("bucket", "term").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0
