"""Deterministic sampling / mixture / seeded shuffle (pipelines.sample):
hash-rule exactness vs a hashlib recount, partition-independence, split
stability under corpus growth, and the range-partitioned order path."""

import hashlib

import pytest
from pyspark.sql import functions as F

from macrobase_spark.pipelines.sample import (
    deterministic_sample, sample_mixture, seeded_shuffle, split_train_eval)


def _u(seed, i) -> str:
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]


def _keep(seed, i, fraction) -> bool:
    return _u(seed, i) < format(int(fraction * 16 ** 8), "08x")


@pytest.fixture(scope="module")
def ids(spark):
    return (spark.range(0, 2000).withColumnRenamed("id", "doc_id")
            .withColumn("domain",
                        F.element_at(F.array(F.lit("wiki"), F.lit("web"),
                                             F.lit("logs")),
                                     (F.col("doc_id") % 3 + 1).cast("int"))))


def test_deterministic_sample_exact_ids(spark, ids):
    got = {r["doc_id"] for r in
           deterministic_sample(ids, 0.25, seed=7).collect()}
    want = {i for i in range(2000) if _keep(7, i, 0.25)}
    assert got == want
    assert 0.18 < len(got) / 2000 < 0.32  # roughly the asked fraction
    # partition-independence: same rows at a different layout
    got13 = {r["doc_id"] for r in
             deterministic_sample(ids.repartition(13), 0.25,
                                  seed=7).collect()}
    assert got13 == got
    # different seed → a different (but same-rule) sample
    got2 = {r["doc_id"] for r in
            deterministic_sample(ids, 0.25, seed=8).collect()}
    assert got2 != got
    # edges + validation
    assert deterministic_sample(ids, 1.0).count() == 2000
    assert deterministic_sample(ids, 0.0).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(ids, 1.5)


def test_sample_mixture_is_union_of_per_domain_samples(spark, ids):
    fr = {"wiki": 1.0, "web": 0.5, "logs": 0.1}
    got = {r["doc_id"] for r in
           sample_mixture(ids, fr, seed=3).collect()}
    want = set()
    for d, f in fr.items():
        sub = ids.filter(F.col("domain") == d)
        want |= {r["doc_id"] for r in
                 deterministic_sample(sub, f, seed=3).collect()}
    assert got == want
    # unlisted domain drops by default, kept via default_fraction
    part = sample_mixture(ids, {"wiki": 1.0}, seed=3)
    assert part.filter(F.col("domain") != "wiki").count() == 0
    dflt = sample_mixture(ids, {"wiki": 1.0}, seed=3, default_fraction=1.0)
    assert dflt.count() == 2000
    with pytest.raises(ValueError, match="domain 'web'"):
        sample_mixture(ids, {"web": 2.0})


def test_seeded_shuffle_total_order_and_range_path(spark, ids):
    flat = [r["doc_id"] for r in seeded_shuffle(ids, seed=11).collect()]
    assert sorted(flat) == list(range(2000))  # a permutation
    want = sorted(range(2000), key=lambda i: (_u(11, i), i))
    assert flat == want
    # the range-partitioned path materializes the SAME global order:
    # partition i's rows all precede partition i+1's
    ranged = seeded_shuffle(ids.repartition(7), seed=11, partitions=5)
    by_part = (ranged.withColumn("pid", F.spark_partition_id())
               .select("pid", "doc_id", "_shuffle_key").collect())
    order = [r["doc_id"] for r in
             sorted(by_part, key=lambda r: (r["pid"],
                                            r["_shuffle_key"], r["doc_id"]))]
    assert order == want
    # a different seed produces a different permutation
    assert [r["doc_id"] for r in
            seeded_shuffle(ids, seed=12).collect()] != flat


def test_split_train_eval_disjoint_exhaustive_stable(spark, ids):
    train, ev = split_train_eval(ids, 0.2, seed=5)
    tr = {r["doc_id"] for r in train.collect()}
    ev_ = {r["doc_id"] for r in ev.collect()}
    assert tr | ev_ == set(range(2000)) and not (tr & ev_)
    assert ev_ == {i for i in range(2000) if _keep(5, i, 0.2)}
    # growth stability: on a SUBSET of the corpus every row keeps its side
    sub_train, sub_ev = split_train_eval(
        ids.filter(F.col("doc_id") < 500), 0.2, seed=5)
    assert {r["doc_id"] for r in sub_ev.collect()} == \
           {i for i in ev_ if i < 500}
    assert {r["doc_id"] for r in sub_train.collect()} == \
           {i for i in tr if i < 500}
    with pytest.raises(ValueError, match="eval_fraction"):
        split_train_eval(ids, 0.0)


def test_sample_n_per_domain_exact_ids(spark, ids):
    from macrobase_spark.pipelines.sample import sample_n_per_domain

    want = {}
    for i in range(2000):
        d = ["wiki", "web", "logs"][i % 3]
        want.setdefault(d, []).append((_u(9, i), i))
    want = {d: {i for _, i in sorted(v)[:7]} for d, v in want.items()}

    got = {}
    for r in sample_n_per_domain(ids, 7, seed=9).collect():
        got.setdefault(r["domain"], set()).add(r["doc_id"])
    assert got == want
    # partition-independence
    got13 = {}
    for r in sample_n_per_domain(ids.repartition(13), 7, seed=9).collect():
        got13.setdefault(r["domain"], set()).add(r["doc_id"])
    assert got13 == want
    # a domain smaller than n returns whole
    small = ids.filter((F.col("doc_id") < 4) | (F.col("domain") == "wiki"))
    out = sample_n_per_domain(small, 500, seed=9)
    assert out.filter(F.col("domain") == "web").count() == \
        small.filter(F.col("domain") == "web").count()
    # the deficient-domain fallback (forced via a hostile margin) still
    # returns the exact per-domain top-n
    got_fb = {}
    for r in sample_n_per_domain(ids, 7, seed=9, margin=-20).collect():
        got_fb.setdefault(r["domain"], set()).add(r["doc_id"])
    assert got_fb == want
    with pytest.raises(ValueError, match="n must be"):
        sample_n_per_domain(ids, 0)


def test_sample_n_per_domain_high_cardinality_plan(spark):
    """r6 scale-shape gate (r5 verdict #1): 10^5 distinct domains must
    build AND execute in bounded time — the pre-r6 implementation
    compiled one Catalyst `when` node per domain (a 10^5-node expression
    that stalls analysis long before execution) plus two domain-sized
    driver collects. The broadcast-join shape is cardinality-independent
    in plan size; with n=1 and unique (domain, doc_id) rows every domain
    yields exactly its one row."""
    import time

    from pyspark.sql import functions as F

    from macrobase_spark.pipelines.sample import sample_n_per_domain

    n_dom = 100_000
    df = spark.range(n_dom).select(
        F.concat(F.lit("d"), F.col("id")).alias("domain"),
        F.col("id").alias("doc_id"))
    t0 = time.time()
    out = sample_n_per_domain(df, 1, seed=5)
    assert out.count() == n_dom
    assert time.time() - t0 < 120.0


def test_corpus_report_matches_python_recount(spark):
    """corpus_report's metrics equal a pure-Python recount over a small
    corpus with planted duplicates, PII, quality spread, and languages."""
    import re as _re
    from collections import Counter

    from macrobase_spark.pipelines.profile import corpus_report

    rows = [
        (0, "the quick brown fox jumps over the lazy dog and then it"
            " rests easily under that big shady tree with friends"),
        (1, "el gato que esta en la casa de los vecinos por la tarde"),
        (2, "contact me at someone@example.com for the files"),
        (3, "dup dup dup dup dup"),
        (4, "dup dup dup dup dup"),
        (5, "short one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # exact mode: the reproducible / oracle-checkable report
    got = {r["metric"]: r["value"]
           for r in corpus_report(df, exact=True).collect()}

    toks = {d: [t for t in _re.split("[^a-z0-9]+", t_.lower()) if t]
            for d, t_ in rows}
    counts = sorted(len(v) for v in toks.values())
    assert got["n_docs"] == 6.0
    # exact percentile (linear interpolation) recount for p50
    import numpy as np

    for p, key in [(0.25, "tokens_p25"), (0.5, "tokens_p50"),
                   (0.95, "tokens_p95")]:
        assert got[key] == pytest.approx(
            float(np.percentile(counts, p * 100, method="linear")),
            abs=1e-9), key
    assert got["exact_dup_fraction"] == pytest.approx(1 - 5 / 6, abs=1e-9)
    assert got["pii_docs_fraction"] == pytest.approx(1 / 6, abs=1e-9)
    langs = Counter()
    # lang fractions sum to 1 and spanish doc detected
    lang_keys = {k for k in got if k.startswith("lang:")}
    assert sum(got[k] for k in lang_keys) == pytest.approx(1.0, abs=1e-9)
    assert got.get("lang:es", 0) >= 1 / 6 - 1e-9
    assert 0.0 <= got["gopher_keep_fraction"] <= 1.0
    assert got["bpe_tokens_total"] > 0

    # DEFAULT mode (r6): percentile_approx — the scale-safe path users
    # get. Non-percentile metrics are identical to exact mode; the approx
    # percentiles land on actual data values within the observed range.
    ga = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    for key in got:
        if not key.startswith("tokens_p"):
            assert ga[key] == pytest.approx(got[key], abs=1e-12), key
    for key in ("tokens_p25", "tokens_p50", "tokens_p75", "tokens_p95"):
        assert counts[0] <= ga[key] <= counts[-1], key
    assert ga["tokens_p25"] <= ga["tokens_p50"] <= ga["tokens_p95"]

    # empty input fails loudly (not an opaque float(None) TypeError)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty input"):
        corpus_report(empty)
