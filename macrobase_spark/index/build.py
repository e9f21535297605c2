"""Inverted-index build: transcripts → compressed posting lists + doc stats.

Pipeline (all lazy DataFrame stages; Python only inside Arrow batches):

  transcripts (conv_id, turn_idx, role, text, tool, ts)
    → fused Arrow pass: terms+tfs+doc_len+anomaly   (tokenize.py)
    → docs table + global stats (N, avgdl)
    → explode to (term, doc_id, tf, dl)
    → hot-term detection (sampled approx df counts → broadcast set)
    → PHASE 1: groupBy(term, salt)   salt = doc_id % S for hot terms else 0
        applyInPandas → partial posting blob (sorted, delta+varint)
    → PHASE 2: groupBy(term) merge salted partials → final blob
        + df/cf stats + block-max impact metadata (BM25 upper bounds)
    → write parquet range-partitioned & sorted by term (row-group pruning
      for term-lookup queries), partitioned by bucket for resumability.

Skew story: a hot term ("the" — in ~90% of turns) would send its entire
posting list to ONE reducer in a naive groupBy(term). Salting splits it into
S shards built in parallel; phase 2 merges S pre-compressed blobs (decode +
merge-sort + re-encode of numpy arrays — cheap relative to shuffle). Cold
terms take salt=0 and pass through phase 2 untouched. This mirrors the
two-phase parallel aggregation the reference uses for itemset counting
(per-thread FastFixedHashTable then merge, lib/.../aplinear/
APrioriLinear.java:113-338) — re-expressed as Spark shuffle stages.

Resumability: terms are bucketed by hash into `num_buckets`; buckets are
processed in `num_groups` independent jobs, each committing its buckets'
parquet partitions plus a manifest line (lineage + metrics: terms, postings,
bytes, merge fan-in) per bucket. A restarted build skips buckets already in
the manifest. Granularity = num_groups re-scans of the input (configurable;
1 = single pass, no mid-build resume).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from macrobase_spark.index.codec import delta_varint_encode, delta_varint_decode
from macrobase_spark.index.tokenize import tokenize_turns, with_anomaly_score

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128

_PARTIAL_SCHEMA = (
    "term string, salt int, n_docs long, cf long, blob binary"
)
_POSTINGS_SCHEMA = (
    "term string, df long, cf long, fan_in int, max_impact double, "
    "block_max array<double>, blob binary"
)


def _encode_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase 1 kernel: one (term, salt) group → one compressed partial blob.
    Posting payload carries (doc_id, tf, dl) so queries never join docs."""
    doc_ids = pdf["doc_id"].to_numpy(np.uint64)
    tfs = pdf["tf"].to_numpy(np.uint64)
    dls = pdf["dl"].to_numpy(np.uint64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    # layout: main stream (delta ids, tfs) then a raw varint stream of dls
    from macrobase_spark.index.codec import varint_encode

    blob = delta_varint_encode(doc_ids, tfs) + varint_encode(dls)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "n_docs": [len(doc_ids)],
            "cf": [int(tfs.sum())],
            "blob": [blob],
        }
    )


def _decode_partial(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from macrobase_spark.index.codec import varint_decode

    ids, tfs = delta_varint_decode(blob)
    # dls stream sits after the main stream; re-scan to find its offset
    n_arr, off = varint_decode(blob, count=1)
    n = int(n_arr[0])
    _, off = varint_decode(blob, count=n, offset=off)
    _, off = varint_decode(blob, count=n, offset=off)
    dls, _ = varint_decode(blob, count=n, offset=off)
    return ids, tfs, dls


def _merge_final(avgdl: float):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [_decode_partial(b) for b in pdf["blob"]]
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        from macrobase_spark.index.codec import varint_encode

        blob = delta_varint_encode(ids, tfs) + varint_encode(dls)
        # BM25 impact upper bound per block: tf/(tf + k1·(1−b+b·dl/avgdl))
        tf_f = tfs.astype(np.float64)
        impact = tf_f / (tf_f + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl))
        n_blocks = (len(ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
        block_max = [
            float(impact[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max())
            for i in range(n_blocks)
        ]
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "df": [len(ids)],
                "cf": [int(tfs.sum())],
                "fan_in": [len(parts)],
                "max_impact": [float(impact.max())],
                "block_max": [block_max],
                "blob": [blob],
            }
        )

    return merge


def detect_hot_terms(postings: DataFrame, sample_frac: float, threshold: int) -> list[str]:
    """Approximate hot-term (heavy-hitter) detection via sampling — the
    AmortizedMaintenanceCounter role (legacy/.../count/
    AmortizedMaintenanceCounter.java:35-110) re-expressed as a sampled count:
    terms whose sampled df exceeds threshold·frac get salted."""
    hot = (
        postings.sample(fraction=sample_frac, seed=1)
        .groupBy("term")
        .count()
        .filter(F.col("count") >= max(1.0, threshold * sample_frac))
        .select("term")
        .collect()
    )
    return [r["term"] for r in hot]


def build_index(
    df: DataFrame,
    out_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    num_groups: int = 1,
    salt_partitions: int = 8,
    hot_df_threshold: int = 50_000,
    hot_sample_frac: float = 0.02,
    resume: bool = True,
) -> dict:
    """Build the index at `out_dir`; returns the build report (metrics).

    `df` must contain doc_id (stable, partition-independent) and text.
    """
    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done: dict[int, dict] = {}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done[rec["bucket"]] = rec

    t0 = time.time()
    tok = tokenize_turns(df, text_col)
    docs = with_anomaly_score(tok.drop("terms", "tfs"))
    docs_path = os.path.join(out_dir, "docs.parquet")
    docs_done = os.path.exists(os.path.join(out_dir, "stats.json")) and resume
    if not docs_done:
        (docs.select(doc_id_col, "conv_id", "turn_idx", "doc_len", "rep_ratio", "anomaly")
             .write.mode("overwrite").parquet(docs_path))
    docs_written = spark.read.parquet(docs_path)
    stats_row = docs_written.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"])
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump({"n_docs": n_docs, "avgdl": avgdl, "k1": K1, "b": B,
                   "block_size": BLOCK_SIZE, "num_buckets": num_buckets}, f)

    postings = (
        tok.select(
            F.col(doc_id_col).alias("doc_id"),
            F.col("doc_len").alias("dl"),
            F.explode(F.arrays_zip("terms", "tfs")).alias("p"),
        )
        .select("doc_id", "dl", F.col("p.terms").alias("term"), F.col("p.tfs").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int"))
    )

    hot_terms = detect_hot_terms(postings, hot_sample_frac, hot_df_threshold)
    hot_set = set(hot_terms)

    groups: list[list[int]] = [
        [b for b in range(num_buckets) if b % num_groups == g] for g in range(num_groups)
    ]
    postings_root = os.path.join(out_dir, "postings")
    report_buckets = dict(done)
    for g, buckets in enumerate(groups):
        todo = [b for b in buckets if b not in done]
        if not todo:
            continue
        part = postings.filter(F.col("bucket").isin(todo))
        salted = part.withColumn(
            "salt",
            F.when(
                F.col("term").isin(list(hot_set)) if hot_set else F.lit(False),
                F.pmod(F.col("doc_id"), F.lit(salt_partitions)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        partials = salted.groupBy("term", "salt").applyInPandas(
            lambda pdf: _encode_partial(pdf), schema=_PARTIAL_SCHEMA
        )
        merged = (
            partials.groupBy("term")
            .applyInPandas(_merge_final(avgdl), schema=_POSTINGS_SCHEMA)
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int"))
            .repartition("bucket")
            .sortWithinPartitions("term")
        )
        merged.write.mode("overwrite").partitionBy("bucket").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(postings_root)
        # per-bucket lineage + metrics from the committed files
        stats = (
            spark.read.parquet(postings_root)
            .filter(F.col("bucket").isin(todo))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("terms"),
                F.sum("df").alias("postings"),
                F.sum(F.length("blob")).alias("bytes"),
                F.max("fan_in").alias("max_fan_in"),
            )
            .collect()
        )
        with open(manifest_path, "a") as f:
            for r in stats:
                rec = {
                    "bucket": int(r["bucket"]), "status": "done", "group": g,
                    "terms": int(r["terms"]), "postings": int(r["postings"]),
                    "bytes": int(r["bytes"]), "max_fan_in": int(r["max_fan_in"]),
                    "ts": time.time(),
                }
                report_buckets[rec["bucket"]] = rec
                f.write(json.dumps(rec) + "\n")

    elapsed = time.time() - t0
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "hot_terms": sorted(hot_set),
        "buckets": len(report_buckets),
        "postings": sum(r.get("postings", 0) for r in report_buckets.values()),
        "bytes": sum(r.get("bytes", 0) for r in report_buckets.values()),
        "elapsed_sec": elapsed,
        "turns_per_sec": n_docs / elapsed if elapsed > 0 else None,
    }


def read_index(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame, dict]:
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    docs = spark.read.parquet(os.path.join(out_dir, "docs.parquet"))
    return postings, docs, stats
