"""Search-result presentation over the inverted index: deterministic
snippet/highlight extraction for BM25 top-k hits, and an operational
per-bucket index statistics surface.

The reference engine (stanford-futuredata/macrobase) surfaces query results
as bare relations; a fulltext serving path additionally needs the classic
"hits page": for each top-k document, the best window of text around the
query terms with the terms marked. This module keeps that presentation
layer deterministic (rank-identity extends to the rendered snippet) and
scale-shaped:

- the hit set is top-k, i.e. tiny and bounded, so its doc ids are collected
  and pushed into the SOURCE scan as an `doc_id IN (...)` predicate —
  parquet row-group statistics skip everything else; no shuffle of the
  corpus, no broadcast of the corpus. The only full-width text read is the
  k hit documents themselves.
- window selection runs in one Arrow pass over those k rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from macrobase_spark.index.bm25 import bm25_topk, _tokenize_query_wild
from macrobase_spark.index.tokenize import TOKEN_PATTERN


def _best_window(text: str, terms: set[str], prefixes: list[str],
                 window: int) -> tuple[str, int]:
    """Deterministic best-window snippet: over all windows of `window`
    consecutive tokens, pick the one matching the most DISTINCT query
    terms (prefix patterns count as their own slot each); ties break to
    the earliest start. Returns (rendered snippet, n_matched) with matched
    tokens wrapped in ``**``. Pure function — same text, same query, same
    snippet at any parallelism."""
    matches = list(re.finditer(TOKEN_PATTERN, text.lower()))
    if not matches:
        return "", 0

    def slot(tok: str):
        if tok in terms:
            return ("t", tok)
        for p in prefixes:
            if tok.startswith(p):
                return ("p", p)
        return None

    slots = [slot(m.group()) for m in matches]
    n = len(matches)
    w = min(window, n)
    best_start, best_count = 0, -1
    for s in range(0, n - w + 1):
        c = len({x for x in slots[s:s + w] if x is not None})
        if c > best_count:
            best_start, best_count = s, c
    s, e = best_start, best_start + w - 1
    lo, hi = matches[s].start(), matches[e].end()
    # render from the ORIGINAL text (case/punctuation preserved), wrapping
    # matched tokens back-to-front so spans stay valid while splicing
    out = text[lo:hi]
    for i in range(e, s - 1, -1):
        if slots[i] is None:
            continue
        a, b = matches[i].start() - lo, matches[i].end() - lo
        out = out[:a] + "**" + out[a:b] + "**" + out[b:]
    if lo > 0:
        out = "…" + out
    if hi < len(text):
        out = out + "…"
    return out, best_count


def highlight_topk(
    spark: SparkSession,
    index_dir: str,
    source_df: DataFrame,
    query: str,
    k: int = 10,
    window: int = 12,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    **topk_kwargs,
) -> DataFrame:
    """BM25 top-k with rendered snippets: (doc_id, score, snippet,
    n_matched), ranked exactly like bm25_topk (all of its options —
    doc_filter, mode, anomaly modifiers, prefix wildcards — pass through
    via **topk_kwargs). A double-quoted query ('"exact phrase"') routes
    to bm25_phrase_topk (slop= and doc_filter= pass through) and
    highlights the phrase's terms.

    `source_df` is the corpus the index was built from (the index stores
    postings and doc metadata, not text). The k hit ids are collected
    (bounded by k) and pushed down as an IN-filter on the source scan —
    at 100 TB this reads only the row groups containing the k docs."""
    phrase = (len(query) >= 2 and query.startswith('"')
              and query.endswith('"'))
    if phrase:
        from macrobase_spark.index.bm25 import bm25_phrase_topk

        hits = bm25_phrase_topk(spark, index_dir, query[1:-1], k=k,
                                **topk_kwargs).collect()
        terms, prefixes = _tokenize_query_wild(query[1:-1])
    else:
        hits = bm25_topk(spark, index_dir, query, k=k,
                         **topk_kwargs).collect()
        terms, prefixes = _tokenize_query_wild(query)
    # on a stopworded index, stoplisted query tokens contribute nothing
    # to the ranking — highlighting them (and counting them in n_matched)
    # would misreport what actually matched
    from macrobase_spark.index.build import read_index

    _, _, _stats = read_index(spark, index_dir)
    _stop = set(_stats.get("stopwords", []))
    if _stop:
        terms = [t for t in terms if t not in _stop]
    tset, plist = set(terms), sorted(prefixes)
    out_schema = ("doc_id long, score double, snippet string, "
                  "n_matched int")
    if not hits:
        return spark.createDataFrame([], out_schema)
    scores = {r["doc_id"]: r["score"] for r in hits}
    src = (source_df.select(F.col(doc_id_col).alias("doc_id"),
                            F.col(text_col).alias("text"))
           .filter(F.col("doc_id").isin(list(scores))))

    def render(batches):
        import pandas as pd

        for pdf in batches:
            snips, counts = [], []
            for txt in pdf["text"]:
                snip, c = _best_window(txt or "", tset, plist, window)
                snips.append(snip)
                counts.append(c)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "snippet": snips,
                "n_matched": counts,
            })

    rendered = src.mapInPandas(
        render, schema="doc_id long, snippet string, n_matched int")
    score_df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in scores.items()],
        "doc_id long, score double")
    # left join FROM the hits: a doc missing from source_df (stale corpus
    # handle) keeps its rank with a NULL snippet instead of vanishing
    return (score_df.join(rendered, "doc_id", "left")
            .select("doc_id", "score", "snippet", "n_matched")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Operational per-bucket view of a persisted index: one row per
    bucket with term count, segment rows (rows > terms ⇒ the bucket holds
    un-compacted update segments), posting bytes, total postings (df sum),
    and the bucket's version vs the index version (stale ⇒ block-max
    pruning disabled there until compact_index). Column-pruned scan — the
    blob column contributes only its length, computed storage-side."""
    from macrobase_spark.index.build import (bucket_versions, read_index,
                                             tombstone_ids)

    postings, _, stats = read_index(spark, index_dir)
    tomb = tombstone_ids(spark, index_dir)
    n_tomb = int(tomb.distinct().count()) if tomb is not None else 0
    per_bucket = (postings
                  .groupBy("bucket")
                  .agg(F.countDistinct("term").alias("n_terms"),
                       F.count("*").alias("n_rows"),
                       F.sum("df").alias("postings"),
                       F.sum(F.length("blob")).alias("blob_bytes")))
    bv = bucket_versions(index_dir)
    sv = int(stats.get("version", 1))
    bv_df = spark.createDataFrame(
        [(int(b), int(v)) for b, v in bv.items()] or [(0, sv)],
        "bucket int, bucket_version int")
    return (per_bucket.join(F.broadcast(bv_df), "bucket", "left")
            .withColumn("bucket_version",
                        F.coalesce("bucket_version", F.lit(1)))
            .withColumn("index_version", F.lit(sv))
            .withColumn("segmented", F.col("n_rows") > F.col("n_terms"))
            .withColumn("pending_tombstones", F.lit(n_tomb))
            .withColumn("n_stopwords",
                        F.lit(len(stats.get("stopwords", []))))
            .withColumn("prunable",
                        (F.col("bucket_version") == F.col("index_version"))
                        & F.lit(n_tomb == 0))
            .orderBy("bucket"))
