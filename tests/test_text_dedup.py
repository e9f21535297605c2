"""Text functions, dedup family, similarity search, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.text import (
    fingerprint, lang_id, ngrams, quality_score, token_count, tokenize_expr,
)
from macrobase_spark.pipelines.dedup import (
    dedup_exact, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_64,
    simhash_near_pairs,
)
from macrobase_spark.pipelines.similarity import (
    cosine_topk_bruteforce, lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # case dup of 0
        (2, "The quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (3, "el gato que esta en la casa de los vecinos por la tarde"),
        (4, "completely different content about spark engines and indexes"),
        (5, "The quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (6, "a a a a a a a a a a a a a a a a"),               # degenerate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_tokenize_and_count(spark, docs):
    r = {x["doc_id"]: x["n"] for x in
         docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert r[0] == 9
    assert r[6] == 16


def test_fingerprint_collapses_case_and_order(spark, docs):
    fps = {x["doc_id"]: x["fp"] for x in
           docs.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert fps[0] == fps[1] == fps[5]
    assert fps[0] != fps[2]


def test_lang_id(spark, docs):
    langs = {x["doc_id"]: x["l"] for x in
             docs.select("doc_id", lang_id("text").alias("l")).collect()}
    assert langs[0] == "en"
    assert langs[3] == "es"
    assert langs[6] == "und"


def test_quality_degenerate_low(spark, docs):
    q = {x["doc_id"]: x["q"] for x in
         docs.select("doc_id", quality_score("text").alias("q")).collect()}
    assert q[6] < 0.2 < q[0]


def test_ngrams(spark, docs):
    row = docs.filter("doc_id = 0").select(ngrams("text", 3).alias("g")).collect()[0]
    assert row["g"][0] == "the quick brown"
    assert len(row["g"]) == 9 - 3 + 1


def test_dedup_exact(spark, docs):
    kept = dedup_exact(docs, normalize=False)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids and 5 not in ids and 1 in ids  # case-sensitive without normalize
    kept_norm = dedup_exact(docs, normalize=True)
    ids_n = {r["doc_id"] for r in kept_norm.select("doc_id").collect()}
    assert 0 in ids_n and 1 not in ids_n and 5 not in ids_n


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(docs, num_hashes=64, bands=32, shingle_n=2,
                              min_jaccard=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 5) in got and (1, 5) in got
    assert (0, 2) in got  # near-dup (one word differs)
    assert not any({a, b} & {4} and {a, b} & {0, 1, 2, 5} for a, b in got)


def test_minhash_estimates_jaccard(spark):
    """Estimator accuracy: planted overlap → est within ±0.2 of truth."""
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(50)) + " " + " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, num_hashes=128, bands=64, shingle_n=1,
                              min_jaccard=0.0)
    est = pairs.collect()[0]["est_jaccard"]
    true_j = 50 / 150
    assert abs(est - true_j) < 0.2


def test_simhash_near_pairs(spark, docs):
    with_h = simhash_64(docs)
    pairs = simhash_near_pairs(with_h, max_hamming=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 5) in got
    h = {r["doc_id"]: r["simhash"] for r in with_h.collect()}
    assert h[0] == h[1] == h[5]  # identical token multisets


def test_ngram_jaccard_exact(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=2, min_jaccard=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert rows[(0, 1)] == 1.0
    assert (0, 2) in rows and rows[(0, 2)] < 1.0


def test_cosine_topk_exact(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in vecs[7]])], "q_id long, q_vec array<float>")
    top = cosine_topk_bruteforce(vdf, qdf, k=3).collect()
    assert top[0]["vec_id"] == 7 and math.isclose(top[0]["cos_sim"], 1.0, rel_tol=1e-6)
    # verify rank-2 against numpy
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms[7]
    sims[7] = -2
    assert top[1]["vec_id"] == int(np.argmax(sims))


def test_lsh_ann_recall(spark):
    import numpy as np

    rng = np.random.default_rng(1)
    base = rng.standard_normal((100, 16)).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(100)],
        "vec_id long, embedding array<float>")
    # query = near-copy of vector 11 → same LSH bucket with high probability
    q = base[11] + rng.standard_normal(16).astype("float32") * 0.01
    qdf = spark.createDataFrame([(0, [float(x) for x in q])],
                                "q_id long, q_vec array<float>")
    got = lsh_bucketed_topk(vdf, qdf, k=3, n_planes=6).collect()
    assert got and got[0]["vec_id"] == 11


def test_mulmod_m61_matches_bigint_arithmetic():
    """The vectorized Mersenne-field multiply (split 32-bit products +
    shift-add folds) must equal exact Python bigint arithmetic for any
    operands < 2^61 — the universal-hash guarantee rests on this kernel."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from macrobase_spark.pipelines.dedup import _MERSENNE, _mod_m61, _mulmod_m61

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, _MERSENNE - 1), st.integers(0, _MERSENNE - 1))
    def check(a, h):
        got = int(_mulmod_m61(np.array([a], dtype=np.uint64),
                              np.array([h], dtype=np.uint64))[0])
        assert got == (a * h) % _MERSENNE

    check()

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, 2 ** 64 - 1))
    def check_mod(x):
        got = int(_mod_m61(np.array([x], dtype=np.uint64))[0])
        assert got == x % _MERSENNE

    check_mod()


def test_embedding_cosine_pairs_lsh_recall(spark):
    """Planted near-duplicate embeddings must surface through the LSH
    bucket path, and the exact path must equal a numpy brute force."""
    import numpy as np

    from macrobase_spark.pipelines.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16)).astype("float32")
    base[20] = base[3] + rng.standard_normal(16).astype("float32") * 0.01
    base[31] = base[7] + rng.standard_normal(16).astype("float32") * 0.01
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    lsh = {(r["id_a"], r["id_b"])
           for r in embedding_cosine_pairs(vdf, 0.95, method="lsh",
                                           n_planes=6).collect()}
    assert {(3, 20), (7, 31)} <= lsh
    exact = {(r["id_a"], r["id_b"])
             for r in embedding_cosine_pairs(vdf, 0.95, method="exact").collect()}
    x = base.astype(np.float64)
    nrm = np.linalg.norm(x, axis=1)
    cos = (x @ x.T) / np.outer(nrm, nrm)
    want = {(i, j) for i in range(40) for j in range(i + 1, 40)
            if cos[i, j] >= 0.95}
    assert exact == want
    assert lsh <= exact  # LSH candidates are verified exactly


def test_multimodal_real_decode(spark):
    """Media payloads are REAL byte formats: BMP images, WAV audio, RAWV
    frame containers; features are real signal stats. Undecodable payloads
    (codec-less formats) surface as ok=false, not job failures."""
    from macrobase_spark.pipelines.multimodal import extract_features, synth_media

    media = synth_media(spark, n=24)
    feats = extract_features(media).collect()
    assert len(feats) == 24
    ok = [r for r in feats if r["ok"]]
    bad = [r for r in feats if not r["ok"]]
    assert bad and all(not r["feature"] for r in bad)  # JPEG-ish rows
    by_kind = {r["kind"]: len(r["feature"]) for r in ok}
    # image: 3 mean + 3 std + 8-bin histogram; audio: rms+zc+16 mags;
    # video: 3 sampled frames × (mean, std)
    assert by_kind["image"] == 14 and by_kind["audio"] == 18 and by_kind["video"] == 6


def test_multimodal_codecs_roundtrip():
    """BMP/WAV/RAWV encode→decode are exact inverses; resize and
    frame-sample behave."""
    import numpy as np

    from macrobase_spark.pipelines.multimodal import (
        decode_bmp, decode_rawv, decode_wav, encode_bmp, encode_rawv,
        encode_wav, frame_sample, resize_nearest,
    )

    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()

    x = (rng.standard_normal(1000) * 10000).astype(np.int16)
    got, rate = decode_wav(encode_wav(x, rate=8000))
    assert rate == 8000
    assert np.allclose(got, x / 32768.0)

    frames = rng.integers(0, 256, size=(7, 5, 6, 3), dtype=np.uint8)
    assert (decode_rawv(encode_rawv(frames)) == frames).all()
    samp = frame_sample(frames, 3)
    assert (samp[0] == frames[0]).all() and (samp[-1] == frames[-1]).all()

    r = resize_nearest(px, 8, 8)
    assert r.shape == (8, 8, 3)


def test_ivf_ann_recall(spark):
    """IVF coarse-quantizer ANN: near-duplicate query must recall its
    source vector; n_probe=all centroids ⇒ exact."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import ivf_topk

    rng = np.random.default_rng(4)
    # clustered data so the quantizer has real structure
    centers = rng.standard_normal((4, 12)) * 5
    base = np.concatenate([
        centers[i] + rng.standard_normal((30, 12)) for i in range(4)
    ]).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    qv = base[37] + rng.standard_normal(12).astype("float32") * 0.01
    qdf = spark.createDataFrame([(0, [float(x) for x in qv])],
                                "q_id long, q_vec array<float>")
    got = ivf_topk(vdf, qdf, k=3, n_centroids=4, n_probe=2).collect()
    assert got and got[0]["vec_id"] == 37
    # full probe = exact brute force
    exact = cosine_topk_bruteforce(vdf, qdf, k=3).collect()
    full = ivf_topk(vdf, qdf, k=3, n_centroids=4, n_probe=4).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]


def test_ann_batch_pairs_scale_per_query(spark):
    """Batch ANN must rescore each query against ITS OWN candidates only:
    scored-pair count = Σ_q |candidates(q)|, NOT |∪ candidates| × Q.
    Two well-separated query clusters ⇒ disjoint buckets/cells; the pair
    relation must be half the union-×-Q size."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import _ivf_pairs, _lsh_pairs

    rng = np.random.default_rng(7)
    # two antipodal clusters → distinct LSH buckets and IVF cells
    c = rng.standard_normal(16) * 10
    a = (c + rng.standard_normal((40, 16))).astype("float32")
    b = (-c + rng.standard_normal((40, 16))).astype("float32")
    base = np.concatenate([a, b])
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in a[0]]), (1, [float(x) for x in b[0]])],
        "q_id long, q_vec array<float>")

    lsh = _lsh_pairs(vdf, qdf, n_planes=4, dim=16, seed=3,
                     id_col="vec_id", vec_col="embedding",
                     q_id_col="q_id", q_vec_col="q_vec")
    per_q = {r["q_id"]: r["n"] for r in
             lsh.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    n_pairs = sum(per_q.values())
    union_sz = lsh.select("vec_id").distinct().count()
    # per-query join: strictly below union × Q (old behavior scored exactly that)
    assert n_pairs < union_sz * 2
    # and each query's pair set is bounded by its own bucket, not the union
    assert all(v <= union_sz for v in per_q.values())

    ivf = _ivf_pairs(vdf, qdf, n_centroids=2, n_probe=1, sample_frac=1.0,
                     seed=11, id_col="vec_id", vec_col="embedding",
                     q_id_col="q_id", q_vec_col="q_vec")
    ivf_pairs = ivf.count()
    ivf_union = ivf.select("vec_id").distinct().count()
    assert ivf_pairs < ivf_union * 2


def test_ivf_persisted_index(spark, tmp_path):
    """ivf_build/ivf_query (the serving shape): full-probe query of the
    persisted index is exactly brute force; the scan carries a partition
    filter on _cell (directory pruning), and results match ivf_topk at the
    same quantizer seed."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import (ivf_build, ivf_query,
                                                      ivf_topk)

    rng = np.random.default_rng(4)
    centers = rng.standard_normal((4, 12)) * 5
    base = np.concatenate([
        centers[i] + rng.standard_normal((30, 12)) for i in range(4)
    ]).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    qv = base[37] + rng.standard_normal(12).astype("float32") * 0.01
    qdf = spark.createDataFrame([(0, [float(x) for x in qv])],
                                "q_id long, q_vec array<float>")

    out = str(tmp_path / "ivf_idx")
    rep = ivf_build(vdf, out, n_centroids=4, seed=11)
    assert rep["n_centroids"] == 4

    got = ivf_query(spark, out, qdf, k=3, n_probe=2)
    rows = got.collect()
    assert rows and rows[0]["vec_id"] == 37

    # full probe == exact brute force == in-memory ivf_topk full probe
    exact = cosine_topk_bruteforce(vdf, qdf, k=3).collect()
    full = ivf_query(spark, out, qdf, k=3, n_probe=4).collect()
    assert [(r["vec_id"], round(r["cos_sim"], 12)) for r in full] == \
           [(r["vec_id"], round(r["cos_sim"], 12)) for r in exact]
    mem = ivf_topk(vdf, qdf, k=3, n_centroids=4, n_probe=2, seed=11).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in mem]

    # behavioral proof of directory-level pruning (LAST — it mutates the
    # index): with n_probe=1 the query touches exactly one cell directory;
    # delete every OTHER cell dir and the same query still succeeds with
    # identical results, proving the pruned directories are never read
    import os
    import shutil as _sh

    one = ivf_query(spark, out, qdf, k=3, n_probe=1).collect()
    cells_root = os.path.join(out, "cells.parquet")
    cell37 = spark.read.parquet(cells_root).filter(
        "vec_id = 37").select("_cell").collect()[0]["_cell"]
    for d in sorted(os.listdir(cells_root)):
        if d.startswith("_cell=") and d != f"_cell={cell37}":
            _sh.rmtree(os.path.join(cells_root, d))
    after = ivf_query(spark, out, qdf, k=3, n_probe=1).collect()
    assert [r["vec_id"] for r in after] == [r["vec_id"] for r in one]


def test_lsh_persisted_index(spark, tmp_path):
    """lsh_build/lsh_query: bucket-sorted parquet + pushed _bkt IN filter
    must reproduce lsh_bucketed_topk exactly at the same planes/seed, and
    the scan must carry the pushed bucket filter."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import (lsh_bucketed_topk,
                                                      lsh_build, lsh_query)

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((3, 16)) * 4
    base = np.concatenate([
        centers[i] + rng.standard_normal((40, 16)) * 0.05 for i in range(3)
    ]).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    qv = base[50] + rng.standard_normal(16).astype("float32") * 0.01
    qdf = spark.createDataFrame([(0, [float(x) for x in qv])],
                                "q_id long, q_vec array<float>")

    out = str(tmp_path / "lsh_idx")
    lsh_build(vdf, out, n_planes=4, seed=3)
    got = lsh_query(spark, out, qdf, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "_bkt" in plan  # filter reaches parquet
    rows = got.collect()
    mem = lsh_bucketed_topk(vdf, qdf, k=5, n_planes=4, seed=3).collect()
    assert [(r["vec_id"], round(r["cos_sim"], 12)) for r in rows] == \
           [(r["vec_id"], round(r["cos_sim"], 12)) for r in mem]
    assert rows and rows[0]["vec_id"] == 50


def test_lsh_persisted_index_multi_query_batch(spark, tmp_path):
    """Persisted LSH with a BATCH of queries spanning different buckets:
    the IN-filter covers the union of buckets but rescoring stays the
    per-query bucket equi-join — per-query results identical to running
    each query alone."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import lsh_build, lsh_query

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((3, 16)) * 4
    base = np.concatenate([
        centers[i] + rng.standard_normal((40, 16)) * 0.05 for i in range(3)
    ]).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    qvs = [base[10], base[50], base[100]]
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in q + rng.standard_normal(16).astype("float32") * 0.01])
         for i, q in enumerate(qvs)],
        "q_id long, q_vec array<float>")

    out = str(tmp_path / "lsh_idx_mq")
    lsh_build(vdf, out, n_planes=4, seed=3)
    batch = {(r["q_id"], r["rank"]): (r["vec_id"], round(r["cos_sim"], 12))
             for r in lsh_query(spark, out, qdf, k=3).collect()}
    for qid in range(3):
        solo = lsh_query(spark, out, qdf.filter(f"q_id = {qid}"), k=3).collect()
        for r in solo:
            assert batch[(qid, r["rank"])] == (r["vec_id"],
                                               round(r["cos_sim"], 12)), qid


def test_simhash_combo_scheme_recall_and_keyspace(spark):
    """r3 verdict What's-wrong #1: the 4x16-bit pigeonhole join saturates at
    ~10^8 docs. The (n_blocks=6, combo_blocks=3) scheme must (a) keep the
    r<=3 pigeonhole guarantee on planted near-dups, and (b) collapse the
    candidate count on a corpus skewed into one shared 16-bit block."""
    import numpy as np

    from macrobase_spark.pipelines.dedup import (simhash_candidate_pairs,
                                                 simhash_near_pairs)

    rng = np.random.default_rng(7)
    # (a) planted pairs: base fingerprints + <=3 flipped bits
    bases = rng.integers(-(2 ** 63), 2 ** 63, size=30, dtype=np.int64)
    rows, want = [], set()
    for i, h in enumerate(bases):
        rows.append((2 * i, int(h)))
        flips = rng.choice(64, size=int(rng.integers(1, 4)), replace=False)
        h2 = int(h)
        for b in flips:
            h2 ^= 1 << int(b)
        h2 = int(np.int64(np.uint64(h2 % 2 ** 64)))
        rows.append((2 * i + 1, h2))
        want.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {(r["id_a"], r["id_b"])
           for r in simhash_near_pairs(df, max_hamming=3, n_blocks=6,
                                       combo_blocks=3).collect()}
    assert want <= got  # guarantee: every planted r<=3 pair found

    # (b) skewed corpus: bits 0-15 zeroed everywhere, rest random
    skew = [(i, int(np.int64(np.uint64(h) & np.uint64(0xFFFFFFFFFFFF0000))))
            for i, h in enumerate(
                rng.integers(-(2 ** 63), 2 ** 63, size=200, dtype=np.int64))]
    sdf = spark.createDataFrame(skew, "doc_id long, simhash long")
    n_classic = simhash_candidate_pairs(sdf, n_blocks=4, combo_blocks=1).count()
    n_combo = simhash_candidate_pairs(sdf, n_blocks=6, combo_blocks=3).count()
    assert n_classic == 200 * 199 // 2  # every pair collides in block 0
    assert n_combo < n_classic / 20  # combination keys break the hot block


def test_simhash_default_scheme_unchanged(spark):
    """The default (4x16) scheme must produce the identical pair set as the
    pre-refactor union-based implementation (q28 fixture stability)."""
    import numpy as np

    from macrobase_spark.pipelines.dedup import simhash_near_pairs

    rng = np.random.default_rng(11)
    rows = [(i, int(h)) for i, h in enumerate(
        rng.integers(-(2 ** 63), 2 ** 63, size=120, dtype=np.int64))]
    # sprinkle exact blocks shared: copy one 16-bit block across some rows
    rows += [(200 + i, (rows[i][1] & ~0xFFFF) | (rows[0][1] & 0xFFFF))
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash_near_pairs(df, max_hamming=20).collect()}
    # reference re-implementation of the old 4-union scheme, driver-side
    import itertools
    byid = dict(rows)
    cand = set()
    for a, b in itertools.combinations(sorted(byid), 2):
        ha, hb = byid[a], byid[b]
        for blk in range(4):
            if (ha >> (blk * 16)) & 0xFFFF == (hb >> (blk * 16)) & 0xFFFF:
                cand.add((a, b))
                break
    want = set()
    for a, b in cand:
        ham = bin((byid[a] ^ byid[b]) & (2 ** 64 - 1)).count("1")
        if ham <= 20:
            want.add((a, b, ham))
    assert got == want


def test_auto_n_planes_scales_with_corpus():
    from macrobase_spark.pipelines.dedup import auto_n_planes

    assert auto_n_planes(100) == 8          # floor
    assert auto_n_planes(10 ** 6) == 10     # 2^20 / 2^10 target occupancy
    assert auto_n_planes(10 ** 9) == 20
    assert auto_n_planes(1) == 8


def test_lsh_bucket_occupancy_guard(spark):
    """r3 verdict What's-wrong #2: a 10^6-vector synthetic with only 8
    planes piles ~4k vectors per bucket; max_bucket splits over-occupied
    buckets a second SRP level down and bounds the max occupancy."""
    from macrobase_spark.pipelines.dedup import lsh_bucket_assign

    vecs = spark.range(10 ** 6).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.hash(F.col("id") * (i + 1)) % 2001) / 1000.0).cast("double")
            for i in range(4)
        ]).alias("embedding"),
    )
    guarded = lsh_bucket_assign(vecs, n_planes=8, max_bucket=30_000)
    occ = guarded.groupBy("_bkt").count().agg(
        F.max("count").alias("mx"), F.count("*").alias("nb")).collect()[0]
    assert occ["mx"] <= 30_000
    assert occ["nb"] > 256  # hot buckets actually split

    # recall sanity under the guard: duplicate directions still pair up
    from macrobase_spark.pipelines.dedup import embedding_cosine_pairs

    dup = spark.createDataFrame(
        [(10**7 + i, [1.0, 2.0, 3.0, 4.0]) for i in range(3)],
        "vec_id long, embedding array<double>")
    pairs = embedding_cosine_pairs(
        vecs.unionByName(dup), threshold=0.9999, method="lsh",
        n_planes=8, max_bucket=30_000)
    got = {(r["id_a"], r["id_b"]) for r in
           pairs.filter(F.col("id_a") >= 10**7).collect()}
    assert {(10**7, 10**7 + 1), (10**7, 10**7 + 2),
            (10**7 + 1, 10**7 + 2)} <= got


def test_dedup_clusters_matches_union_find(spark):
    """Connected components (large-star/small-star) over random pair sets
    must match a driver-side union-find exactly — including transitive
    chains the pairwise operators never emit directly."""
    import numpy as np

    from macrobase_spark.pipelines.dedup import dedup_clusters

    rng = np.random.default_rng(3)
    n = 400
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(300, 2))
             if a != b]
    # union-find oracle
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in pairs:
        touched |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in touched}
    # min-id canonical labels
    label = {}
    for x, r in want.items():
        label.setdefault(r, min(y for y in touched if find(y) == r))
    want = {x: label[find(x)] for x in touched}

    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    # both paths must produce the identical unique fixpoint
    got_driver = {r["id"]: r["cluster_id"] for r in dedup_clusters(pdf).collect()}
    got_dist = {r["id"]: r["cluster_id"] for r in
                dedup_clusters(pdf, collect_threshold=0).collect()}
    assert got_driver == want
    assert got_dist == want


def test_dedup_clusters_long_chain_converges(spark):
    """A 300-node path a0-a1-...-a299 (diameter 299) must resolve to ONE
    cluster rooted at 0 — the O(log n) star rounds, not diameter-bound
    propagation, within dedup_clusters' iteration cap."""
    from macrobase_spark.pipelines.dedup import dedup_clusters

    pdf = spark.createDataFrame([(i, i + 1) for i in range(299)],
                                "id_a long, id_b long")
    got = dedup_clusters(pdf, collect_threshold=0).collect()
    assert len(got) == 300
    assert {r["cluster_id"] for r in got} == {0}


def test_drop_near_duplicates_end_to_end(spark):
    """minhash pairs → clusters → one representative per cluster kept,
    non-duplicates untouched (the corpus-level dedup contract)."""
    from macrobase_spark.pipelines.dedup import (drop_near_duplicates,
                                                 minhash_lsh_pairs)

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    rows = []
    for i in range(3):  # near-identical trio → chain of pairs
        rows.append((10 + i, base + f" variant {i}"))
    rows.append((50, "completely different text about spark query engines "
                     "and distributed joins at terabyte scale"))
    rows.append((60, "yet another unrelated document mentioning inverted "
                     "indexes compression and posting lists"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, num_hashes=64, bands=16, min_jaccard=0.5)
    assert pairs.count() >= 2
    kept = sorted(r["doc_id"] for r in
                  drop_near_duplicates(df, pairs).select("doc_id").collect())
    assert kept == [10, 50, 60]


def test_dedup_clusters_empty_pairs(spark):
    from macrobase_spark.pipelines.dedup import (dedup_clusters,
                                                 drop_near_duplicates)

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(empty).count() == 0
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    assert drop_near_duplicates(df, empty).count() == 2


def test_ivf_incremental_add_and_compact(spark, tmp_path):
    """ivf_add: frozen-quantizer append — full-probe queries over the
    updated index are exactly brute force over the COMBINED corpus; a
    planted near-duplicate added incrementally is found at n_probe=1; and
    ivf_compact merges the appended files without changing results."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import (cosine_topk_bruteforce,
                                                      ivf_add, ivf_build,
                                                      ivf_compact, ivf_query)

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 12)) * 5
    base = np.concatenate([
        centers[i] + rng.standard_normal((30, 12)) for i in range(4)
    ]).astype("float32")
    a = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(100)],
        "vec_id long, embedding array<float>")
    b_rows = [(i, [float(x) for x in base[i]]) for i in range(100, 120)]
    qv = base[110] + rng.standard_normal(12).astype("float32") * 0.01
    b_rows.append((999, [float(x) for x in qv]))  # planted near-dup of query
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<float>")
    both = a.unionByName(b)
    qdf = spark.createDataFrame([(0, [float(x) for x in qv])],
                                "q_id long, q_vec array<float>")

    out = str(tmp_path / "ivf_inc")
    ivf_build(a, out, n_centroids=4, seed=11)
    assert ivf_add(b, out)["n_added"] == 21

    # appended near-dup retrievable at the cheapest probe depth
    got = ivf_query(spark, out, qdf, k=3, n_probe=1).collect()
    assert got and got[0]["vec_id"] == 999

    # full probe over the updated index == brute force over A ∪ B
    exact = cosine_topk_bruteforce(both, qdf, k=5).collect()
    full = ivf_query(spark, out, qdf, k=5, n_probe=4).collect()
    assert [(r["vec_id"], round(r["cos_sim"], 12)) for r in full] == \
           [(r["vec_id"], round(r["cos_sim"], 12)) for r in exact]

    ivf_compact(spark, out)
    again = ivf_query(spark, out, qdf, k=5, n_probe=4).collect()
    assert [(r["vec_id"], round(r["cos_sim"], 12)) for r in again] == \
           [(r["vec_id"], round(r["cos_sim"], 12)) for r in exact]


def test_lsh_incremental_add_matches_rebuild(spark, tmp_path):
    """lsh_add: appended segments bucket with the persisted planes, so the
    updated index answers EXACTLY like a from-scratch rebuild over the
    combined corpus (deterministic planes); lsh_compact merges segments
    into fewer files without changing results."""
    import glob
    import numpy as np

    from macrobase_spark.pipelines.similarity import (lsh_add, lsh_build,
                                                      lsh_compact, lsh_query)

    rng = np.random.default_rng(12)
    base = rng.standard_normal((160, 10)).astype("float32")
    a = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(120)],
        "vec_id long, embedding array<float>")
    b = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(120, 160)],
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(j, [float(x) for x in (base[5 * j] + 0.01 * rng.standard_normal(10))])
         for j in range(4)], "q_id long, q_vec array<float>")

    inc = str(tmp_path / "lsh_inc")
    lsh_build(a, inc, n_planes=4, seed=3)
    assert lsh_add(b, inc)["n_added"] == 40
    scratch = str(tmp_path / "lsh_scratch")
    lsh_build(a.unionByName(b), scratch, n_planes=4, seed=3)

    want = [(r["q_id"], r["vec_id"], round(r["cos_sim"], 12)) for r in
            lsh_query(spark, scratch, qdf, k=5).orderBy("q_id", "rank").collect()]
    got = [(r["q_id"], r["vec_id"], round(r["cos_sim"], 12)) for r in
           lsh_query(spark, inc, qdf, k=5).orderBy("q_id", "rank").collect()]
    assert got == want

    files_before = len(glob.glob(f"{inc}/buckets.parquet/part-*"))
    lsh_compact(spark, inc)
    files_after = len(glob.glob(f"{inc}/buckets.parquet/part-*"))
    assert files_after < files_before
    again = [(r["q_id"], r["vec_id"], round(r["cos_sim"], 12)) for r in
             lsh_query(spark, inc, qdf, k=5).orderBy("q_id", "rank").collect()]
    assert again == want


def test_ann_compact_swap_recovery(spark, tmp_path):
    """A crash between the two renames of ivf_compact/lsh_compact leaves no
    live table; the next query entry point must recover from _old (and a
    complete _compact staging dir must win over _old)."""
    import os
    import shutil
    import numpy as np

    from macrobase_spark.pipelines.similarity import (ivf_build, ivf_query,
                                                      lsh_build, lsh_query)

    rng = np.random.default_rng(21)
    base = rng.standard_normal((60, 8)).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame([(0, [float(x) for x in base[7]])],
                                "q_id long, q_vec array<float>")

    ivf = str(tmp_path / "ivf_sw")
    ivf_build(vdf, ivf, n_centroids=4)
    want = [r["vec_id"] for r in ivf_query(spark, ivf, qdf, k=3, n_probe=4).collect()]
    cells = os.path.join(ivf, "cells.parquet")
    os.rename(cells, cells + "_old")  # crash between the renames
    got = [r["vec_id"] for r in ivf_query(spark, ivf, qdf, k=3, n_probe=4).collect()]
    assert got == want
    assert os.path.isdir(cells) and not os.path.isdir(cells + "_old")

    lsh = str(tmp_path / "lsh_sw")
    lsh_build(vdf, lsh, n_planes=3)
    wantl = [r["vec_id"] for r in lsh_query(spark, lsh, qdf, k=3).collect()]
    buckets = os.path.join(lsh, "buckets.parquet")
    # crash AFTER staging completed but before any rename: _compact with
    # _SUCCESS and the live dir both present → stale staging cleared
    shutil.copytree(buckets, buckets + "_compact")
    gotl = [r["vec_id"] for r in lsh_query(spark, lsh, qdf, k=3).collect()]
    assert gotl == wantl
    assert not os.path.isdir(buckets + "_compact")


def test_compact_backup_pid_liveness(spark, tmp_path):
    """restore_compact_backup must NOT roll back a backup whose owning
    process is still alive (in-progress compaction seen by a concurrent
    reader), and MUST recover one whose owner is dead."""
    import json
    import os

    from macrobase_spark.index.build import restore_compact_backup

    out = str(tmp_path / "pidx")
    os.makedirs(os.path.join(out, "_compact_backup"))
    with open(os.path.join(out, "_compact_backup", "_meta.json"), "w") as f:
        json.dump({"stats": json.dumps({"n_docs": 0}),
                   "manifest_len": 0, "pid": 1}, f)  # pid 1: always alive
    with open(os.path.join(out, "_compact_backup", "_complete"), "w") as f:
        f.write("1")
    assert restore_compact_backup(out) is False  # owner alive → untouched
    assert os.path.isdir(os.path.join(out, "_compact_backup"))

    meta = os.path.join(out, "_compact_backup", "_meta.json")
    with open(meta, "w") as f:
        json.dump({"stats": json.dumps({"n_docs": 0}),
                   "manifest_len": 0, "pid": 2 ** 22 + 12345}, f)  # dead
    assert restore_compact_backup(out) is True
    assert not os.path.isdir(os.path.join(out, "_compact_backup"))


def test_simhash_wide_combo_schemes(spark):
    """(8,5) is a legitimate r<=3 scheme (8-bit blocks, 40-bit keys) and
    must work; (4,4) needs 64 bits and must raise, not overflow."""
    import numpy as np

    from macrobase_spark.pipelines.dedup import (simhash_candidate_pairs,
                                                 simhash_near_pairs)

    rng = np.random.default_rng(5)
    rows = []
    want = set()
    for i, h in enumerate(rng.integers(-(2 ** 63), 2 ** 63, size=20,
                                       dtype=np.int64)):
        rows.append((2 * i, int(h)))
        h2 = int(h) ^ (1 << int(rng.integers(0, 64)))
        h2 = int(np.int64(np.uint64(h2 % 2 ** 64)))
        rows.append((2 * i + 1, h2))
        want.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_pairs(df, max_hamming=3, n_blocks=8,
                              combo_blocks=5).collect()}
    assert want <= got

    with pytest.raises(ValueError, match="exceeds a signed long"):
        simhash_candidate_pairs(df, n_blocks=4, combo_blocks=4)


def test_simhash_fingerprints_not_degenerate(spark):
    """r4 review (verified uint64 underflow): minority-vote bits wrapped to
    huge positives, so EVERY document fingerprinted to ~all-ones and
    everything looked like a near-duplicate. Fingerprints must now have
    ~balanced bits and unrelated docs must be far apart."""
    rows = [(1, "alpha beta gamma delta"),
            (2, "totally different words entirely unrelated content"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from macrobase_spark.pipelines.dedup import simhash_64

    fp = {r["doc_id"]: r["simhash"] for r in simhash_64(df).collect()}
    pc1 = bin(fp[1] & (2 ** 64 - 1)).count("1")
    pc2 = bin(fp[2] & (2 ** 64 - 1)).count("1")
    assert 10 <= pc1 <= 54 and 10 <= pc2 <= 54, (pc1, pc2)  # not all-ones
    ham = bin((fp[1] ^ fp[2]) & (2 ** 64 - 1)).count("1")
    assert ham > 10  # unrelated docs are far apart
    assert fp[3] == 0  # NULL text: empty sentinel, no crash


def test_lsh_bucket_udf_parity_bit_identical(spark):
    """r5: above _LSH_EXPR_MAX_TERMS the SRP bucket moves from per-literal
    Catalyst expressions to an Arrow UDF with the plane matrix in its
    closure. The two paths must be BIT-identical — including near-zero
    projections where a different summation order would flip the sign —
    so an index built on one path is queryable on the other."""
    import numpy as np

    from macrobase_spark.pipelines import similarity as S

    rng = np.random.default_rng(0)
    dim, n_planes, n = 16, 6, 1500
    planes = S._lsh_planes(n_planes, dim, seed=1)
    vecs = rng.standard_normal((n, dim))
    # adversarial rows: (nearly) orthogonal to a plane → projection at
    # rounding scale, where pairwise/BLAS summation could disagree with
    # the sequential fold
    for j in range(300):
        p = planes[j % n_planes]
        v = vecs[j]
        vecs[j] = v - (np.dot(v, p) / np.dot(p, p)) * p
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    assert planes.size < S._LSH_EXPR_MAX_TERMS  # expression path active
    a = {(r["id"], int(r["b"])) for r in df.select(
        "id", S._lsh_bucket_expr(F.col("v"), planes).alias("b")).collect()}
    b = {(r["id"], int(r["b"])) for r in df.select(
        "id", S._lsh_bucket_udf(planes)(F.col("v")).alias("b")).collect()}
    assert a == b


def test_lsh_highdim_uses_udf_and_plans_fast(spark, tmp_path):
    """r5: d=1024 × 20 planes (20480 literals under the old path) must
    route through the UDF, plan in bounded time, and round-trip through
    the persisted index (build → query) with self-hits at rank 1."""
    import time

    import numpy as np

    from macrobase_spark.pipelines import similarity as S
    from macrobase_spark.pipelines.similarity import lsh_build, lsh_query

    dim, n_planes = 1024, 20
    planes = S._lsh_planes(n_planes, dim, seed=2)
    assert planes.size > S._LSH_EXPR_MAX_TERMS
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    vdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = str(tmp_path / "lsh_hd")
    t0 = time.time()
    lsh_build(vdf, out, n_planes=n_planes, seed=2)
    qdf = spark.createDataFrame(rows[:5],
                                "q_id long, q_vec array<double>")
    got = lsh_query(spark, out, qdf, k=1).collect()
    elapsed = time.time() - t0
    assert elapsed < 120, f"high-dim LSH took {elapsed:.0f}s"
    # SRP buckets guarantee the identical vector shares its own bucket:
    # every query's top-1 is itself
    top = {r["q_id"]: r["vec_id"] for r in got}
    assert top == {i: i for i in range(5)}


def test_dedup_clusters_checkpoint_dir(spark, tmp_path):
    """r5: checkpoint_dir switches round-lineage truncation to reliable
    checkpoint() files (executor-loss resilience at cluster scale) —
    same unique fixpoint as localCheckpoint on the 300-node chain, and
    checkpoint files actually land under the directory."""
    import os

    from macrobase_spark.pipelines.dedup import dedup_clusters

    ckpt = str(tmp_path / "cc_ckpt")
    pdf = spark.createDataFrame([(i, i + 1) for i in range(299)],
                                "id_a long, id_b long")
    got = dedup_clusters(pdf, collect_threshold=0,
                         checkpoint_dir=ckpt).collect()
    assert len(got) == 300
    assert {r["cluster_id"] for r in got} == {0}
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no reliable checkpoint files written under checkpoint_dir"


# ------------------------------------------------------- decontamination

def test_find_contamination_13gram_rule(spark):
    """Classic any-13-gram-collision rule, pinned against a python
    recount: shared counts, eval sizes, overlap fractions exact."""
    import re

    from macrobase_spark.pipelines.decontam import (drop_contaminated,
                                                    find_contamination)

    leak = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet grey town tonight")
    train_rows = [
        (0, "clean document about spark joins and shuffles with "
            "nothing shared beyond ordinary words"),
        (1, f"prefix text then {leak} and a suffix"),
        (2, f"{leak}"),
        (3, "short one"),
    ]
    eval_rows = [
        (100, f"eval question contains {leak} exactly"),
        (101, "totally unrelated eval item about databases and btrees"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {(r["train_id"], r["eval_id"]): (r["shared"], r["eval_sz"],
                                           r["overlap"])
           for r in find_contamination(train, ev, n=13).collect()}

    def sh13(t):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        if len(toks) < 13:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 13]) for i in range(len(toks) - 12)}

    want = {}
    for tid, tt in train_rows:
        for eid, et in eval_rows:
            shared = len(sh13(tt) & sh13(et))
            if shared >= 1:
                want[(tid, eid)] = (shared, len(sh13(et)),
                                    shared / len(sh13(et)))
    assert set(got) == set(want) and want
    for k, (s, z, o) in want.items():
        gs, gz, go = got[k]
        assert (gs, gz) == (s, z) and abs(go - o) < 1e-12, k
    # docs 1 and 2 leak into eval 100; 0 and 3 are clean
    assert {t for t, _ in got} == {1, 2}

    clean = drop_contaminated(train, ev, n=13)
    assert sorted(r["doc_id"] for r in clean.collect()) == [0, 3]


def test_contamination_thresholds_and_hot_guard(spark):
    from macrobase_spark.pipelines.decontam import find_contamination

    boiler = "standard header text repeated across every training document here now"
    train = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail") for i in range(6)],
        "doc_id long, text string")
    ev = spark.createDataFrame([(0, boiler)], "doc_id long, text string")
    # the boilerplate shingle hits every train doc → hot guard drops it
    got = find_contamination(train, ev, n=10, max_train_df=3).collect()
    assert got == []
    # without the guard the same call flags everything
    got2 = find_contamination(train, ev, n=10, max_train_df=10 ** 9).collect()
    assert len(got2) == 6
    # min_overlap filters partial matches
    got3 = find_contamination(train, ev, n=10, max_train_df=10 ** 9,
                              min_overlap=2.0).collect()
    assert got3 == []


# -------------------------------------- r5: Gopher repetition signals


def _rep_expected(text, n=2):
    """Pure-Python recount of the three repetition signals."""
    import re as _re
    from collections import Counter

    lines = [l.strip() for l in text.split("\n") if l.strip()]
    lc = Counter(lines)
    nl = len(lines)
    dup_frac = round(1.0 - len(lc) / nl, 6) if nl else 0.0
    tot = sum(c * len(l) for l, c in lc.items())
    dup = sum(c * len(l) for l, c in lc.items() if c > 1)
    dup_char = round(dup / tot, 6) if tot else 0.0
    toks = [t for t in _re.split("[^a-z0-9]+", text.lower()) if t]
    grams = ([" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
             if len(toks) >= n else [" ".join(toks)])
    gc = Counter(grams)
    top = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
    norm = len(" ".join(toks))
    top_frac = round(top[1] * len(top[0]) / norm, 6) if norm else 0.0
    return dup_frac, dup_char, top_frac


def test_repetition_signals_match_python_recount(spark):
    from macrobase_spark.functions.text import (
        duplicate_line_char_fraction, duplicate_line_fraction,
        top_ngram_char_fraction)

    rows = [
        (0, "alpha beta\nalpha beta\ngamma delta\n\n  alpha beta  "),
        (1, "one line only"),
        (2, "x\ny\nz"),
        (3, "big repeated block of text here\nbig repeated block of text"
            " here\nshort\nshort"),
        (4, "spam spam spam spam spam and some other words after"),
        (5, ""),
        (6, "a"),                       # shorter than the shingle width
        (7, "tie tie bar bar baz"),     # 2-gram tie → smallest gram wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["a"], r["b"], r["c"]) for r in df.select(
        "doc_id",
        duplicate_line_fraction("text").alias("a"),
        duplicate_line_char_fraction("text").alias("b"),
        top_ngram_char_fraction("text", 2).alias("c")).collect()}
    for d, text in rows:
        want = _rep_expected(text, 2)
        assert got[d] == pytest.approx(want, abs=1e-9), (d, text)
    # boilerplate-heavy doc scores higher on every signal than clean prose
    assert got[3][0] > got[2][0] and got[3][1] > got[2][1]
    assert got[4][2] > got[1][2]
    # n=3 shingles flow through the same fold
    g3 = df.filter("doc_id = 4").select(
        top_ngram_char_fraction("text", 3).alias("c")).collect()[0]["c"]
    assert g3 == pytest.approx(_rep_expected(rows[4][1], 3)[2], abs=1e-9)


def _gopher_expected(text):
    """Pure-Python recount of the Gopher rule signals."""
    import re as _re

    words = [w for w in _re.split(r"\s+", text) if w]
    nw = max(len(words), 1)
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    nl = max(len(lines), 1)
    toks = set(_re.findall("[a-z0-9]+", text.lower()))
    req = {"the", "be", "to", "of", "and", "that", "have", "with"}
    return {
        "n_words": len(words),
        "mean_word_len": (round(sum(len(w) for w in words) / nw, 6)
                          if words else 0.0),
        "symbol_ratio": round((text.count("#") + text.count("...")) / nw, 6),
        "bullet_line_frac": round(
            sum(bool(_re.match(r"^(\-|\*|•|●|‣)", l)) for l in lines) / nl, 6),
        "ellipsis_line_frac": round(
            sum(bool(_re.search(r"(\.\.\.|…)$", l)) for l in lines) / nl, 6),
        "alpha_word_frac": (round(
            sum(bool(_re.search("[a-z]", w.lower())) for w in words) / nw, 6)
            if words else 0.0),
        "n_required": len(toks & req),
    }


def test_gopher_signals_and_keep(spark):
    from macrobase_spark.functions.text import gopher_keep, gopher_signals

    good = ("the quick brown fox likes to run with friends and they have "
            "seen that many good things come of patient daily work " * 3)
    rows = [
        (0, good),                                  # passes every rule
        (1, "too short to pass"),                   # word count
        (2, "- bullet\n- bullet\n- bullet"),        # bullets + count
        (3, "wait...\nmore...\nhmm...\nok..."),     # ellipsis lines
        (4, "#### " * 60 + good),                   # symbol ratio
        (5, "12 34 " * 40),                         # alpha fraction
        (6, ""),                                    # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", gopher_signals("text").alias("s"),
        gopher_keep("text").alias("keep")).select(
            "doc_id", "s.*", "keep").collect()}
    for d, text in rows:
        want = _gopher_expected(text)
        for k, v in want.items():
            assert got[d][k] == pytest.approx(v, abs=1e-9), (d, k)
    assert got[0]["keep"] is True
    for d in (1, 2, 3, 4, 5, 6):
        assert got[d]["keep"] is False, d
    # thresholds are overridable
    relaxed = df.filter(gopher_keep("text", min_words=1,
                                    min_required_words=0,
                                    min_alpha_word_frac=0.0)).count()
    assert relaxed > 1


def test_bpe_token_count_matches_python_recount(spark):
    """BPE-ish pre-tokenizer count: Spark regexp_count equals a Python
    re.findall recount of the identical pattern, and behaves like a
    subword-budget proxy (punctuation and contractions cost tokens;
    whitespace doesn't)."""
    import re as _re

    from macrobase_spark.functions.text import _BPE_TOKEN_RE, bpe_token_count, token_count

    rows = [
        (0, "don't stop believing!"),
        (1, "a1 b2 3.14159, x-ray..."),
        (2, "hello   world"),
        (3, ""),
        (4, "it'll we've 'quoted' -- dashes--everywhere"),
        (5, "plain words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["b"], r["w"]) for r in df.select(
        "doc_id", bpe_token_count("text").alias("b"),
        token_count("text").alias("w")).collect()}
    for d, text in rows:
        want = len(_re.findall(_BPE_TOKEN_RE, text))
        assert got[d][0] == want, (d, text)
    # punctuation-heavy text costs more BPE-ish tokens than words
    assert got[1][0] > got[1][1]
    assert got[5][0] == got[5][1]  # plain words: the proxies agree
