"""Relevance evaluation harness: graded ranking metrics for a query set
against judged relevance labels (qrels) — the Elasticsearch `_rank_eval`
API shape, computed as one batched retrieval plus tiny DataFrame math.

Metrics per query (all at cutoff k):
- precision@k        — judged-relevant hits / k
- recall@k           — judged-relevant hits / total relevant for the query
- mrr@k              — 1 / rank of the first relevant hit (0 if none)
- ndcg@k             — DCG with graded gains (2^rel − 1) / log2(rank + 1),
                       normalized by the ideal DCG of the query's qrels

The retrieval side is ONE bm25_topk_batch job for the whole query set
(the serving-throughput shape), so evaluating 100 queries costs one
scan of the union of their terms' postings, not 100 jobs. The metric
side is a broadcast join of the (tiny) qrels against the top-k rows and
a per-query aggregate — no collect until the caller asks.

Determinism: rankings are bitwise-reproducible (see bm25.py), so metric
values are too — a regression in any scoring path shows up as a moved
ndcg in CI, which is the point of keeping this harness in-repo.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rank_eval(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, str],
    qrels: dict[str, dict[int, int]],
    k: int = 10,
    **batch_kwargs,
) -> DataFrame:
    """Evaluate `queries` ({query_id: query text}) against `qrels`
    ({query_id: {doc_id: grade}}, grade ≥ 1 = relevant; higher = more
    relevant for ndcg's graded gain). Returns one row per query —
    (query_id, precision, recall, mrr, ndcg, n_retrieved, n_relevant) —
    plus retrieval options forwarded to bm25_topk_batch via kwargs
    (mode, doc_filter, ...). Queries with no qrels entry error loudly
    (a silent zero would read as a retrieval regression)."""
    if not queries:
        raise ValueError("rank_eval: empty query set")
    missing = sorted(set(queries) - set(qrels))
    if missing:
        raise ValueError(
            f"rank_eval: queries {missing!r} have no qrels — every "
            "evaluated query needs judged labels")
    bad = [(q, d) for q, g in qrels.items() for d, r in g.items() if r < 1]
    if bad:
        raise ValueError(
            f"rank_eval: non-positive relevance grades {bad[:3]!r} — "
            "omit non-relevant docs instead of grading them 0")
    from macrobase_spark.index.bm25 import bm25_topk_batch

    top = bm25_topk_batch(spark, index_dir, queries, k=k, **batch_kwargs)
    rel_rows = [(qid, int(d), int(g))
                for qid in queries for d, g in qrels[qid].items()]
    rels = spark.createDataFrame(
        rel_rows, "query_id string, doc_id long, grade int")
    # ideal DCG per query from the qrels alone (grades sorted descending,
    # cut at k) — driver-side math over the tiny label set
    idcg = {
        qid: sum((2 ** g - 1) / math.log2(i + 2)
                 for i, g in enumerate(
                     sorted(qrels[qid].values(), reverse=True)[:k]))
        for qid in queries
    }
    idcg_df = spark.createDataFrame(
        [(qid, float(v)) for qid, v in idcg.items()],
        "query_id string, idcg double")
    n_rel = spark.createDataFrame(
        [(qid, len(qrels[qid])) for qid in queries],
        "query_id string, n_relevant long")
    judged = top.join(F.broadcast(rels), ["query_id", "doc_id"], "left")
    per_q = (
        judged.groupBy("query_id")
        .agg(
            F.count("*").alias("n_retrieved"),
            F.sum(F.when(F.col("grade").isNotNull(), 1)
                  .otherwise(0)).alias("n_hits"),
            F.min(F.when(F.col("grade").isNotNull(), F.col("rank")))
            .alias("first_rel_rank"),
            F.sum(F.when(
                F.col("grade").isNotNull(),
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("rank") + 1.0)).otherwise(0.0)).alias("dcg"),
        )
    )
    # queries whose retrieval returned NOTHING still get a metrics row
    all_q = spark.createDataFrame([(qid,) for qid in queries],
                                  "query_id string")
    per_q = all_q.join(per_q, "query_id", "left").fillna(
        {"n_retrieved": 0, "n_hits": 0, "dcg": 0.0})
    out = (
        per_q.join(F.broadcast(idcg_df), "query_id")
        .join(F.broadcast(n_rel), "query_id")
        .select(
            "query_id",
            (F.col("n_hits") / float(k)).alias("precision"),
            (F.col("n_hits") / F.col("n_relevant").cast("double"))
            .alias("recall"),
            F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0))
            .alias("mrr"),
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(0.0).alias("ndcg"),
            "n_retrieved", "n_relevant",
        )
    )
    return out.orderBy("query_id")
