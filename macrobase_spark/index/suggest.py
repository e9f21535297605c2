"""Query-suggestion surface over the index's term dictionary: prefix
autocomplete and did-you-mean spelling correction.

Both operate on the (term, df) projection of the postings parquet —
column pruning keeps the posting blobs untouched, so at 100 TB these are
dictionary scans, not index scans (same access shape as the prefix/fuzzy
query expansions in bm25.py). Everything stays JVM-side: the prefix match
is a `startswith` filter and the edit distance is Spark's built-in
levenshtein — no Python in the scan.

Reference capability context: the reference's SQL shell exposes the data
through exact relational operators only; the suggestion surface is part
of the Lucene-class query engine this graft adds on top (Lucene
`PrefixQuery`-backed suggesters and `DirectSpellChecker`'s
dictionary-intersection rewrite, re-expressed as DataFrame plans).

Both accept a LIST of index dirs too (time-partitioned shards): the
dictionaries union and df sums globally, so the suggestion ranking over
shards equals the merged monolith's (pytest-pinned).

Semantics notes shared by both functions:
- A segmented index (post-update, pre-compaction) may carry one row per
  (term, segment); df is summed across segments before ranking.
- Tombstoned documents still count toward df until `compact_index`
  purges them (Lucene docFreq-includes-deleted semantics, same policy as
  scoring).
- Index-time stoplisted terms have no postings rows, so they are never
  suggested — the analyzer and the suggester cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from macrobase_spark.index.build import read_index


def _dictionary(postings: DataFrame) -> DataFrame:
    """(term, df) dictionary view: df summed across segment rows."""
    return postings.groupBy("term").agg(F.sum("df").alias("df"))


def _open_dictionary(spark: SparkSession,
                     index_dir: str | list[str]) -> DataFrame:
    """One (term, df) dictionary over a single index OR a list of
    physical shards — the sharded case unions the shards' postings
    (term+df columns only) and sums df per term, the same
    global-statistics treatment bm25_topk_sharded gives scoring: an
    autocomplete ranking over era shards equals the merged monolith's."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    if not dirs:
        raise ValueError("suggest: empty shard list")
    u, stops = None, set()
    for d in dirs:
        postings, _docs, stats = read_index(spark, d)
        stops.add(tuple(stats.get("stopwords", [])))
        p = postings.select("term", "df")
        u = p if u is None else u.unionByName(p)
    if len(stops) > 1:
        # mirror bm25_topk_sharded/bm25_facets_sharded: shards built with
        # different analyzers have incompatible dictionaries — merging
        # them would silently break the sharded-equals-monolith guarantee
        raise ValueError(
            "suggest: shards were built with DIFFERENT stoplists "
            f"{sorted(stops)!r} — rebuild with one list")
    return _dictionary(u)


def suggest_terms(
    spark: SparkSession,
    index_dir: str | list[str],
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """Prefix autocomplete: the k most frequent indexed terms starting
    with `prefix`, as (term, df) ordered by (df desc, term asc) — the
    completion ranking a search-as-you-type box wants (popularity first,
    deterministic tiebreak). Empty prefix suggests the corpus's top
    terms; an unindexable prefix (no token characters) returns empty."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    prefix = prefix.strip().lower()
    d = _open_dictionary(spark, index_dir)
    if prefix:
        d = d.filter(F.col("term").startswith(prefix))
    return d.orderBy(F.col("df").desc(), F.col("term").asc()).limit(k)


def spellcheck(
    spark: SparkSession,
    index_dir: str | list[str],
    token: str,
    max_edits: int = 2,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Did-you-mean: the k dictionary terms within `max_edits` edits of
    `token`, as (term, df, distance) ordered by (distance asc, df desc,
    term asc) — closer corrections beat popular ones, popularity breaks
    distance ties (Lucene DirectSpellChecker's comparator shape). An
    exact dictionary hit ranks first at distance 0, which callers use as
    the "no correction needed" signal. min_df drops hapax-noise
    corrections (a misspelling suggesting OTHER one-off misspellings).

    The scan is length-banded before the levenshtein evaluates
    (|len(term) − len(token)| ≤ max_edits), the same codegen'd
    pre-filter the fuzzy-query expansion uses; the scan reads only the
    term and df columns either way."""
    if max_edits not in (1, 2):
        raise ValueError(
            f"max_edits must be 1 or 2 (Lucene fuzzy bound), got {max_edits!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df!r}")
    token = token.strip().lower()
    if not token:
        raise ValueError("spellcheck token must be non-empty")
    d = _open_dictionary(spark, index_dir)
    band = ((F.length("term") >= len(token) - max_edits)
            & (F.length("term") <= len(token) + max_edits))
    d = (d.filter(band)
         .withColumn("distance",
                     F.levenshtein(F.col("term"), F.lit(token)))
         .filter(F.col("distance") <= max_edits)
         .filter(F.col("df") >= min_df))
    return d.orderBy(F.col("distance").asc(), F.col("df").desc(),
                     F.col("term").asc()).limit(k)
