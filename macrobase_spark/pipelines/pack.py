"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget packs (the pre-tokenization step that turns a deduped
corpus into dense training sequences).

Greedy packing is inherently sequential (each pack boundary depends on the
previous one), so the distributed shape is sharded greedy: documents are
split deterministically into `n_groups` shards, each shard packs
independently (one applyInPandas group — only (id, token_count) metadata
moves, never text), and pack ids are (shard, local-index) pairs. The cost
of sharding is at most ONE underfull pack per shard — negligible against
corpus size at scale, and the price of not serializing 10¹² rows through a
single packer. Determinism: shard assignment is a hash of the id, order
within a shard is (order_col, id), so the output is independent of input
partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack(toks: np.ndarray, max_tokens: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """The sequential greedy kernel (pure, property-tested): given token
    counts in pack order, return (pack index, position-in-pack) per doc.
    Invariants: pack totals ≤ max_tokens except single oversize docs; pack
    indexes are 0..K contiguous; positions restart at 0 per pack."""
    pack_idx = np.empty(len(toks), dtype=np.int64)
    pack_pos = np.empty(len(toks), dtype=np.int64)
    cur, used, pos = 0, 0, 0
    for i, t in enumerate(toks):
        # boundary on pack NON-EMPTINESS (pos), not tokens used: with a
        # used>0 test, zero-token docs kept the pack 'empty' and an
        # oversize doc could share their pack, breaking the
        # oversize-packs-are-singletons invariant (hypothesis-caught)
        if pos > 0 and used + t > max_tokens:
            cur += 1
            used, pos = 0, 0
        pack_idx[i] = cur
        pack_pos[i] = pos
        used += t
        pos += 1
    return pack_idx, pack_pos


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    n_groups: int | None = None,
    rows_per_shard: int = 2_000_000,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document a `pack_id` (string "shard:index") and
    `pack_pos` (0-based position within its pack) such that every pack's
    token total is ≤ max_tokens — except documents individually longer
    than the budget, which get a singleton pack (flagged `oversize=true`;
    filter or split them upstream).

    Returns the ASSIGNMENT relation only — (id, token count, pack_id,
    pack_pos, oversize) — so nothing but metadata ever shuffles; join it
    back to the corpus on the id when materializing packed text (an
    id-keyed join the caller can co-locate with bucketed storage). A
    convenience that returned the full corpus would smuggle a
    text-by-id shuffle into every call.

    Greedy first-fit-in-order within each shard: rows ordered by
    (order_col or id_col, id_col) accumulate until the next row would
    overflow, then a new pack starts.

    n_groups=None auto-scales the shard count so each shard's metadata
    (~24 B/row) stays task-sized (`rows_per_shard`, default 2M rows ≈
    50 MB per pandas group) — a fixed shard count would make each shard a
    single applyInPandas group and stop fitting one task at corpus scale.

    shard_col: use an EXISTING integer column as the shard assignment
    instead of hashing the id — lets callers co-locate packing with the
    corpus's own bucketing (no extra shuffle when df is already
    partitioned by it) and makes the assignment reproducible by external
    systems. Each distinct value is one greedy group; the caller owns the
    balance of the split.
    """
    order = order_col or id_col
    if shard_col is not None:
        shard = F.col(shard_col).cast("int")
    else:
        if n_groups is None:
            n = df.select(id_col).count()
            n_groups = max(8, -(-n // rows_per_shard))
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int")
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(order).alias("_ord"),
        F.col(token_col).cast("long").alias("_tok"),
        shard.alias("_shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "_id"], kind="mergesort")
        toks = pdf["_tok"].to_numpy(np.int64)
        shard = int(pdf["_shard"].iloc[0])
        pack_idx, pack_pos = greedy_pack(toks, max_tokens)
        return pd.DataFrame({
            "_id": pdf["_id"].to_numpy(),
            "_tok": toks,
            "pack_id": [f"{shard}:{p}" for p in pack_idx],
            "pack_pos": pack_pos,
        })

    packed = src.groupBy("_shard").applyInPandas(
        pack, schema="_id long, _tok long, pack_id string, pack_pos long")
    return packed.select(
        F.col("_id").alias(id_col),
        F.col("_tok").alias(token_col),
        "pack_id", "pack_pos",
        (F.col("_tok") > F.lit(max_tokens)).alias("oversize"))


def pack_stats(packed: DataFrame, token_col: str,
               max_tokens: int) -> DataFrame:
    """Per-pack totals + fill ratio — the packing-quality report."""
    return (
        packed.groupBy("pack_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.col(token_col).cast("long")).alias("pack_tokens"))
        .withColumn("fill", F.col("pack_tokens") / F.lit(float(max_tokens)))
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split long documents into overlapping fixed-token windows — the
    retrieval/RAG chunking step (and packing's sibling: packing merges
    short docs up to the budget, chunking splits long ones down to it).

    Windows are taken over the canonical token stream (tokenize_expr —
    the BM25 analyzer, so a chunk's tokens are exactly what the index
    would see) at stride = max_tokens − overlap: chunk i covers tokens
    [i·stride, i·stride + max_tokens). The last chunk may be shorter;
    every token is covered; consecutive chunks share `overlap` tokens.
    Output: one row per chunk — (id, chunk_idx, n_chunks, chunk_tokens,
    chunk_text with tokens re-joined by single spaces).

    Entirely per-row Catalyst (tokenize → window starts via sequence →
    slice/array_join → posexplode): no shuffle, no Python — each input
    partition chunks independently, the 100 TB shape. Token-less
    documents produce no chunks (filter them through gopher_keep /
    quality gates first)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens!r}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap!r}")
    from macrobase_spark.functions.text import tokenize_expr

    stride = max_tokens - overlap
    toks = tokenize_expr(text_col)
    n = F.size(toks)
    n_chunks = F.when(
        n <= max_tokens, F.lit(1)
    ).otherwise(
        F.ceil((n - max_tokens).cast("double") / float(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(F.slice(toks, i * stride + 1, max_tokens), " ")
            .alias("chunk_text"),
            F.least(F.lit(max_tokens), n - i * stride)
            .cast("int").alias("chunk_tokens")))
    out = (df.filter(n > 0)
           .select(F.col(id_col).alias("id"), n_chunks.alias("n_chunks"),
                   F.posexplode(chunks).alias("chunk_idx", "c"))
           .select("id", F.col("chunk_idx").cast("int"), "n_chunks",
                   F.col("c.chunk_tokens").alias("chunk_tokens"),
                   F.col("c.chunk_text").alias("chunk_text")))
    return out
