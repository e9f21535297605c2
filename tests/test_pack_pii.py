"""Training-data pipeline extras (r4): PII scrubbing (Catalyst regex chain,
RE2-safe so DuckDB reproduces it exactly) and sequence packing (sharded
greedy, metadata-only shuffle)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.text import PII_PATTERNS, pii_counts, scrub_pii
from macrobase_spark.pipelines.pack import pack_sequences, pack_stats


def test_scrub_pii_basic(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp.example.com or call +1 (415) 555-0199"),
        (2, "server 10.0.42.7 handled it; ssn 123-45-6789 leaked"),
        (3, "nothing sensitive here, just 42 tokens"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["s"] for r in
           df.select("id", scrub_pii("text").alias("s")).collect()}
    assert "[email]" in got[1] and "@" not in got[1]
    assert "[phone]" in got[1]
    assert "[ipv4]" in got[2] and "10.0.42.7" not in got[2]
    assert "[ssn]" in got[2]
    assert got[3] == rows[2][1]  # untouched
    counts = {r["id"]: r["c"].asDict() for r in
              df.select("id", pii_counts("text").alias("c")).collect()}
    assert counts[1] == {"email": 1, "ipv4": 0, "ssn": 0, "phone": 1}
    assert counts[2] == {"email": 0, "ipv4": 1, "ssn": 1, "phone": 0}


def test_scrub_pii_matches_duckdb_on_corpus(spark):
    """The patterns are RE2-safe by design: Spark's Java regex and DuckDB's
    RE2 must scrub the sf0.01 documents corpus identically — the property
    that makes the op oracle-checkable."""
    sf = "/root/testdata/sf0.01/documents.parquet"
    d = spark.read.parquet(sf).limit(2000)
    got = [(r["doc_id"], r["s"]) for r in
           d.select("doc_id", scrub_pii("text").alias("s"))
           .orderBy("doc_id").collect()]
    expr = "text"
    for kind, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '[{kind}]', 'g')"
    want = duckdb.sql(
        f"SELECT doc_id, {expr} AS s FROM '{sf}' ORDER BY doc_id LIMIT 2000"
    ).fetchall()
    assert got == [(a, b) for a, b in want]


def test_pack_sequences_budget_and_coverage(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(900)) + 1).alias("n_tok"))
    packed = pack_sequences(df, "n_tok", max_tokens=2048, n_groups=8)
    # every doc exactly once
    assert packed.count() == 500
    assert packed.select("doc_id").distinct().count() == 500
    stats = pack_stats(packed, "n_tok", 2048)
    over = stats.filter(F.col("pack_tokens") > 2048).count()
    assert over == 0  # no doc exceeds the budget here → no oversize packs
    # greedy fill should be reasonably dense (not one doc per pack)
    avg_fill = stats.agg(F.avg("fill")).collect()[0][0]
    assert avg_fill > 0.6
    assert packed.filter(F.col("oversize")).count() == 0


def test_pack_sequences_oversize_and_determinism(spark):
    rows = [(1, 5000), (2, 100), (3, 200), (4, 4096), (5, 50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    p1 = pack_sequences(df, "n_tok", max_tokens=4096, n_groups=4)
    # oversize doc flagged and alone in its pack
    big = p1.filter(F.col("doc_id") == 1).collect()[0]
    assert big["oversize"]
    mates = p1.filter(F.col("pack_id") == big["pack_id"]).count()
    assert mates == 1
    # determinism across input partitioning
    p2 = pack_sequences(df.repartition(7), "n_tok", max_tokens=4096,
                        n_groups=4)
    a = sorted((r["doc_id"], r["pack_id"], r["pack_pos"])
               for r in p1.collect())
    b = sorted((r["doc_id"], r["pack_id"], r["pack_pos"])
               for r in p2.collect())
    assert a == b


def test_greedy_pack_invariants_property():
    """Hypothesis fuzz of the pure packing kernel: full coverage, budget
    respected (oversize docs alone), contiguous pack ids, positions restart
    per pack, greediness (a new pack only opens when the next doc would
    overflow)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from macrobase_spark.pipelines.pack import greedy_pack

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=3000), max_size=200),
           st.integers(min_value=1, max_value=2048))
    def run(sizes, budget):
        toks = np.asarray(sizes, dtype=np.int64)
        idx, pos = greedy_pack(toks, budget)
        assert len(idx) == len(pos) == len(toks)
        if len(toks) == 0:
            return
        # contiguous pack ids starting at 0
        assert idx[0] == 0
        assert ((np.diff(idx) == 0) | (np.diff(idx) == 1)).all()
        # positions restart per pack and increment within
        for k in np.unique(idx):
            p = pos[idx == k]
            assert (p == np.arange(len(p))).all()
        # budget: totals <= budget unless the pack is a single oversize doc
        for k in np.unique(idx):
            total = toks[idx == k].sum()
            if total > budget:
                assert (idx == k).sum() == 1 and toks[idx == k][0] > budget
        # greedy: consecutive packs could not be merged
        for k in range(int(idx.max())):
            total_k = toks[idx == k].sum()
            first_next = toks[idx == k + 1][0]
            assert total_k + first_next > budget

    run()


def test_scrub_pii_phone_precision(spark):
    """r5: the phone pattern must be digit-count anchored — ISO dates,
    timestamps, long decimals, version strings, epoch ints, and money pass
    through UNCHANGED while NANP/E.164-style phone formats are redacted.
    (The r4 pattern counted separators toward its length and destroyed
    every date and decimal in the corpus.)"""
    keep = [
        "2026-08-17", "logged 2026-08-17 08:58:32 UTC",
        "pi = 3.14159265358979", "release 1.2.3.4500", "v1.2.3",
        "years 1999-2026", "08-17-2026", "17.08.2026",
        "order 1234567 shipped", "epoch 1723881600",
        "x = 0.123456789", "version 10.15.7 beta",
        "1,234,567.89 dollars", "sum +1 23", "+12 34",
        "ticket id 123-4567", "123.4567 and 999.8888 are floats",
    ]
    redact = [
        "+15551234567", "call +1 (555) 123-4567", "(555) 123-4567",
        "555-123-4567", "dial 555.123.4567 now", "+44 20 7946 0958",
        "+1-555-123-4567", "(415)555-0199",
    ]
    rows = [(i, s) for i, s in enumerate(keep + redact)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["s"] for r in
           df.select("id", scrub_pii("text").alias("s")).collect()}
    for i, s in enumerate(keep):
        assert got[i] == s, f"false positive: {s!r} -> {got[i]!r}"
    for j, s in enumerate(redact):
        assert "[phone]" in got[len(keep) + j], f"missed phone: {s!r}"
    # and the three engines agree (Java regex above; RE2 here)
    import duckdb as _dk
    for i, s in enumerate(keep + redact):
        expr = f"'{s}'"
        for kind, pat in PII_PATTERNS:
            lit = pat.replace("'", "''")
            expr = f"regexp_replace({expr}, '{lit}', '[{kind}]', 'g')"
        want = _dk.sql(f"SELECT {expr}").fetchone()[0]
        assert got[i] == want, (s, got[i], want)


def test_pack_sequences_shard_col(spark):
    """r5: an explicit shard_col must drive the grouping (one greedy fold
    per distinct value) with all invariants intact, and must equal the
    hash path when it carries the same assignment."""
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 13, F.lit(400)) + 1).alias("n_tok"),
        F.pmod(F.col("id"), F.lit(3)).cast("int").alias("shard"))
    p = pack_sequences(df, "n_tok", max_tokens=1024, shard_col="shard")
    assert p.count() == 300
    # pack ids are namespaced by the provided shard values
    shards = {r["pack_id"].split(":")[0] for r in p.collect()}
    assert shards == {"0", "1", "2"}
    stats = pack_stats(p, "n_tok", 1024)
    assert stats.filter(F.col("pack_tokens") > 1024).count() == 0
    # parity: shard_col replicating pmod(xxhash64(id), g) == hash path
    g = 4
    df2 = df.withColumn(
        "hshard", F.pmod(F.xxhash64("doc_id"), F.lit(g)).cast("int"))
    via_col = pack_sequences(df2, "n_tok", max_tokens=1024,
                             shard_col="hshard")
    via_hash = pack_sequences(df, "n_tok", max_tokens=1024, n_groups=g)
    a = {(r["doc_id"], r["pack_id"], r["pack_pos"])
         for r in via_col.collect()}
    b = {(r["doc_id"], r["pack_id"], r["pack_pos"])
         for r in via_hash.collect()}
    assert a == b


# ----------------------------------------------- r5: document chunking


def _chunks_expected(text, max_tokens, overlap):
    import re as _re

    toks = [t for t in _re.split("[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return []
    stride = max_tokens - overlap
    n = len(toks)
    n_chunks = 1 if n <= max_tokens else -(-(n - max_tokens) // stride) + 1
    return [(" ".join(toks[i * stride:i * stride + max_tokens]),
             min(max_tokens, n - i * stride), n_chunks)
            for i in range(n_chunks)]


def test_chunk_documents_matches_python_recount(spark):
    from macrobase_spark.pipelines.pack import chunk_documents

    rows = [
        (0, "one two three four five six seven eight nine ten"),
        (1, "short doc"),
        (2, " ".join(f"w{i}" for i in range(25))),
        (3, ""),
        (4, "exact four word doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mt, ov in [(4, 0), (4, 1), (7, 3), (10, 0)]:
        got = {}
        for r in chunk_documents(df, mt, overlap=ov).collect():
            got.setdefault(r["id"], []).append(
                (r["chunk_idx"], r["chunk_text"], r["chunk_tokens"],
                 r["n_chunks"]))
        for d, text in rows:
            want = _chunks_expected(text, mt, ov)
            gl = sorted(got.get(d, []))
            assert [(i, t, n, nc) for i, (t, n, nc) in enumerate(want)] \
                == gl, (d, mt, ov)
            # coverage: concatenating stride prefixes re-yields the stream
            if want and ov == 0:
                joined = " ".join(t for t, _, _ in want).split()
                import re as _re
                assert joined == [x for x in _re.split(
                    "[^a-z0-9]+", text.lower()) if x]
    # chunks feed packing: same token column shapes compose
    ch = chunk_documents(df, 4)
    from macrobase_spark.pipelines.pack import pack_sequences

    packed = pack_sequences(
        ch.select(F.monotonically_increasing_id().alias("doc_id"),
                  "chunk_tokens"),
        "chunk_tokens", max_tokens=8)
    assert packed.count() == ch.count()
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, overlap=4)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, 0)
