"""Similarity search over an embedding column (`array<float>`):
brute-force cosine top-k baseline + IVF / LSH-bucketed variants as the
scale path.

Brute force: entirely JVM-side (`F.zip_with`/`F.aggregate` dot products) —
exact, one scan per query batch, no shuffle until the final top-k. The
query set is broadcast (small); at 100 TB the scan parallelizes per
partition and the top-k is a per-partition heap + global limit.

IVF / LSH: candidates are joined to queries ON BUCKET EQUALITY (queries
exploded by probe cell), so the scored-pair count is Σ_q |candidates(q)| —
NOT |∪ candidates| × Q. With a 10⁴-query batch the work stays proportional
to the per-query bucket sizes instead of converging back to brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from macrobase_spark.atomic import (atomic_json_write as _atomic_json_write,
                                    recover_swap as _recover_swap,
                                    swap_in as _swap_in)


def _norm(col) -> "F.Column":
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _prep_vectors(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to (id, _v float64, _vn) — float64 throughout so results are
    deterministic and oracle-matchable."""
    arr = F.col(vec_col).cast("array<double>")
    return vectors.select(F.col(id_col), arr.alias("_v"), _norm(arr).alias("_vn"))


def _prep_queries(queries: DataFrame, q_id_col: str, q_vec_col: str) -> DataFrame:
    arr = F.col(q_vec_col).cast("array<double>")
    return queries.select(F.col(q_id_col), arr.alias("_q"), _norm(arr).alias("_qn"))


def _pair_topk(pairs: DataFrame, k: int, id_col: str, q_id_col: str) -> DataFrame:
    """Exact cosine + per-query top-k over a (query, candidate) pair relation
    carrying `_v`,`_vn`,`_q`,`_qn`. The window partitions by query, so the
    sort is per-query — never global."""
    dot = F.aggregate(
        F.zip_with("_v", "_q", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    scored = pairs.withColumn(
        "cos_sim",
        F.when((F.col("_vn") > 0) & (F.col("_qn") > 0),
               dot / (F.col("_vn") * F.col("_qn"))).otherwise(0.0),
    )
    w = W.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos_sim", "rank")
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k of every query against the vector table.
    Returns (q_id, vec_id, cos_sim, rank). Query side is broadcast."""
    v = _prep_vectors(vectors, id_col, vec_col)
    q = _prep_queries(queries, q_id_col, q_vec_col)
    return _pair_topk(v.crossJoin(F.broadcast(q)), k, id_col, q_id_col)


def _fit_centroids(
    vectors: DataFrame,
    n_centroids: int,
    sample_frac: float,
    seed: int,
    vec_col: str,
) -> np.ndarray:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors if sample_frac >= 1.0 else vectors.sample(sample_frac, seed=seed)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="_fv")
    model = km.fit(train.select(array_to_vector(F.col(vec_col).cast(
        "array<double>")).alias("_fv")))
    return np.stack([np.asarray(c) for c in model.clusterCenters()])


def _nearest_cells_udf(centroids: np.ndarray, top_n: int):
    """Arrow-batched top_n nearest centroids (expanded L2:
    |c|² − 2·c·x); ties broken by centroid index (stable argsort).
    Centroids travel inside the UDF closure (one (B,D)×(D,C) matmul per
    batch) — inlining 10⁴ centroids as column literals would explode
    Catalyst."""
    from pyspark.sql.functions import pandas_udf

    c2 = (centroids * centroids).sum(axis=1)

    @pandas_udf("array<int>")
    def f(vecs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = c2[None, :] - 2.0 * (x @ centroids.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :top_n]
        return pd.Series(list(idx.astype(np.int32)))

    return f


def _ivf_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    n_centroids: int,
    n_probe: int,
    sample_frac: float,
    seed: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """Candidate (query, vector) pairs for the IVF path: each vector is
    assigned to ONE cell, each query explodes to its n_probe nearest cells,
    and the pair relation is an equi-join on `_cell` — so a pair exists iff
    the vector's cell is probed BY THAT QUERY. Exposed separately so tests
    can count scored pairs."""
    centroids = _fit_centroids(vectors, n_centroids, sample_frac, seed, vec_col)
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_cell", _nearest_cells_udf(centroids, 1)(F.col("_v"))[0])
    qx = (
        _prep_queries(queries, q_id_col, q_vec_col)
        .withColumn("_cell",
                    F.explode(_nearest_cells_udf(centroids, n_probe)(F.col("_q"))))
    )
    # vector side is the big relation; the exploded query side broadcasts.
    # A (q, v) pair joins at most once because each vector has exactly one
    # cell and a query's probe cells are distinct.
    return v.join(F.broadcast(qx), "_cell").drop("_cell")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_frac: float = 1.0,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k: k-means coarse quantizer
    (pyspark.ml KMeans, fitted on a sample) partitions the vector table by
    nearest centroid; a query probes its n_probe nearest centroids and
    exact-rescores ONLY the vectors in cells it probed (per-query equi-join,
    not union-×-all-queries).

    Scale path: write the vector table partitioned by `_cell` once, and each
    query's scan touches n_probe/n_centroids of the data (partition-prunable).
    Recall < 1 by design; raise n_probe → recall → cost."""
    pairs = _ivf_pairs(vectors, queries, n_centroids, n_probe, sample_frac,
                       seed, id_col, vec_col, q_id_col, q_vec_col)
    return _pair_topk(pairs, k, id_col, q_id_col)


def ivf_build(
    vectors: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    sample_frac: float = 1.0,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist an IVF index: k-means centroids (tiny JSON) + the vector
    table written ONCE, hive-partitioned by `_cell` — the serving shape.
    `ivf_topk` refits the quantizer and re-assigns every vector per call;
    after `ivf_build`, each `ivf_query` reads ONLY the n_probe cells its
    queries probe (directory-level partition pruning — the FileScan's
    PartitionFilters, same design as the BM25 bucket layout), so per-query
    scan cost is n_probe/n_centroids of the table regardless of how many
    times you query."""
    import json
    import os

    centroids = _fit_centroids(vectors, n_centroids, sample_frac, seed, vec_col)
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_cell", _nearest_cells_udf(centroids, 1)(F.col("_v"))[0])
    os.makedirs(out_dir, exist_ok=True)
    (v.repartition("_cell")
     .write.mode("overwrite").partitionBy("_cell")
     .parquet(os.path.join(out_dir, "cells.parquet")))
    meta = {"n_centroids": int(n_centroids), "id_col": id_col,
            "dim": int(centroids.shape[1]),
            "centroids": centroids.tolist()}
    _atomic_json_write(os.path.join(out_dir, "ivf_meta.json"), meta)
    return {"n_centroids": int(n_centroids), "dim": int(centroids.shape[1])}


def ivf_query(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Query a persisted IVF index. The query set's probed-cell union is
    computed driver-side (queries are the SMALL serving-side relation) and
    pushed as a partition filter, so the scan touches only those cell
    directories; per-query candidate identity is then the same `_cell`
    equi-join as ivf_topk — never union-×-all-queries."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    qx = (
        _prep_queries(queries, q_id_col, q_vec_col)
        .withColumn("_cell",
                    F.explode(_nearest_cells_udf(centroids, n_probe)(F.col("_q"))))
    )
    probed = sorted({r["_cell"] for r in qx.select("_cell").distinct().collect()})
    _recover_swap(os.path.join(index_dir, "cells.parquet"))
    cells = (
        spark.read.parquet(os.path.join(index_dir, "cells.parquet"))
        .filter(F.col("_cell").isin(probed))
    )
    pairs = cells.join(F.broadcast(qx), "_cell").drop("_cell")
    return _pair_topk(pairs, k, meta["id_col"], q_id_col)


def lsh_build(
    vectors: DataFrame,
    out_dir: str,
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist an LSH index: hyperplanes (tiny JSON) + the vector table
    written ONCE, SORTED by `_bkt` — the row-group-pruning twin of the BM25
    postings layout. With 2^n_planes buckets, hive partitioning would
    explode into thousands of directories, so the bucket is a sorted DATA
    column instead: parquet min/max statistics make a `_bkt IN (...)` filter
    skip every non-matching row group (same discipline as the term-sorted
    postings files). Queries with the same planes/seed reproduce
    lsh_bucketed_topk exactly."""
    import json
    import os

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _lsh_planes(n_planes, dim, seed)
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_bkt", _lsh_bucket_expr(F.col("_v"), planes))
    os.makedirs(out_dir, exist_ok=True)
    (v.repartitionByRange(max(vectors.rdd.getNumPartitions(), 4), "_bkt")
     .sortWithinPartitions("_bkt")
     .write.mode("overwrite").parquet(os.path.join(out_dir, "buckets.parquet")))
    meta = {"n_planes": int(n_planes), "dim": int(dim), "seed": int(seed),
            "id_col": id_col, "planes": planes.tolist()}
    _atomic_json_write(os.path.join(out_dir, "lsh_meta.json"), meta)
    return {"n_planes": int(n_planes), "dim": int(dim)}


def lsh_query(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Query a persisted LSH index: the query batch's bucket set is computed
    driver-side (queries are the small serving-side relation) and pushed as
    a `_bkt IN (...)` filter into the parquet scan — row-group statistics on
    the bucket-sorted file skip everything else; rescoring stays the
    per-query bucket equi-join."""
    import json
    import os

    with open(os.path.join(index_dir, "lsh_meta.json")) as f:
        meta = json.load(f)
    planes = np.asarray(meta["planes"], dtype=np.float64)
    q = _prep_queries(queries, q_id_col, q_vec_col).withColumn(
        "_bkt", _lsh_bucket_expr(F.col("_q"), planes))
    probed = sorted({r["_bkt"] for r in q.select("_bkt").distinct().collect()})
    _recover_swap(os.path.join(index_dir, "buckets.parquet"))
    v = (spark.read.parquet(os.path.join(index_dir, "buckets.parquet"))
         .filter(F.col("_bkt").isin(probed)))
    pairs = v.join(F.broadcast(q), "_bkt").drop("_bkt")
    return _pair_topk(pairs, k, meta["id_col"], q_id_col)


def _lsh_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


# Above this many plane literals (n_planes × dim), the Catalyst expression
# would carry one F.lit node per plane coefficient — 15k–80k nodes at real
# embedding dims (768–4096) with auto_n_planes at 10⁹-vector scale, the
# same plan-size explosion _nearest_cells_udf avoids for IVF centroids.
# Past the threshold the bucket is computed in an Arrow UDF with the plane
# matrix in the closure; both paths are bit-identical (test-pinned).
_LSH_EXPR_MAX_TERMS = 4096


def _lsh_bucket_udf(planes: np.ndarray):
    """Arrow-batched SRP bucket id with `planes` in the UDF closure.

    Bit-identity with the expression path: Catalyst's aggregate() folds the
    products strictly left-to-right from 0.0, so the projection here is a
    cumsum over the elementwise products (sequential accumulation), NOT a
    BLAS matmul — a dot product's pairwise/blocked summation could flip the
    sign of a near-zero projection and bucket the vector differently."""
    from pyspark.sql.functions import pandas_udf

    pl = np.ascontiguousarray(planes, dtype=np.float64)

    @pandas_udf("long")
    def f(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.zeros(len(x), dtype=np.int64)
        # row-chunked: x*plane materializes a (chunk, dim) temp per plane
        chunk = max(1, int(4_000_000 // max(x.shape[1], 1)))
        for lo in range(0, len(x), chunk):
            xs = x[lo:lo + chunk]
            acc = np.zeros(len(xs), dtype=np.int64)
            for i in range(len(pl)):
                proj = np.cumsum(xs * pl[i][None, :], axis=1)[:, -1]
                acc += (proj > 0).astype(np.int64) << i
            out[lo:lo + chunk] = acc
        return pd.Series(out)

    return f


def _lsh_bucket_expr(col, planes: np.ndarray):
    if planes.size > _LSH_EXPR_MAX_TERMS:
        return _lsh_bucket_udf(planes)(col)
    bit_terms = []
    for i in range(len(planes)):
        proj = F.aggregate(
            F.zip_with(
                col,
                F.array(*[F.lit(float(x)) for x in planes[i]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bit_terms.append(F.when(proj > 0, F.lit(2 ** i)).otherwise(0))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def _lsh_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    n_planes: int,
    dim: int | None,
    seed: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """Candidate (query, vector) pairs for the LSH path: equi-join on the
    sign-random-projection bucket, so each query rescoring touches only ITS
    bucket. Exposed separately so tests can count scored pairs."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _lsh_planes(n_planes, dim, seed)
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_bkt", _lsh_bucket_expr(F.col("_v"), planes))
    q = _prep_queries(queries, q_id_col, q_vec_col).withColumn(
        "_bkt", _lsh_bucket_expr(F.col("_q"), planes))
    return v.join(F.broadcast(q), "_bkt").drop("_bkt")


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate cosine top-k: sign-random-projection LSH bucket join, then
    exact rescoring within each query's OWN bucket (per-query equi-join —
    scored pairs = Σ_q |bucket(q)|, independent of the batch size's union).
    Recall < 1 by design (scale path: the scan touches only matching
    buckets — partition-prunable if the vector table is written partitioned
    by bucket)."""
    pairs = _lsh_pairs(vectors, queries, n_planes, dim, seed,
                       id_col, vec_col, q_id_col, q_vec_col)
    return _pair_topk(pairs, k, id_col, q_id_col)


def ivf_add(
    vectors: DataFrame,
    index_dir: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> dict:
    """Incremental append to a persisted IVF index: new vectors are assigned
    to the EXISTING centroids (frozen coarse quantizer — the standard IVF
    incremental contract) and appended into their cell partitions. O(delta)
    work; the query path needs no change (a probed cell's scan picks up the
    appended files automatically), and results are exactly what a fresh
    assignment of the combined corpus under the same centroids would give.

    Centroid drift: additions do not refit the quantizer, so recall at a
    given n_probe can degrade if the data distribution shifts — rebuild
    (ivf_build) to refresh centroids; `ivf_compact` only merges small
    appended files. Contract: append-only, new ids only (same as the text
    index's update path)."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    # recover a crashed compaction FIRST: in its rename window the live dir
    # is absent, and an append would recreate it with only the delta — the
    # next recover_swap would then delete the _old full index for good
    _recover_swap(os.path.join(index_dir, "cells.parquet"))
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    id_col = id_col or meta["id_col"]
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_cell", _nearest_cells_udf(centroids, 1)(F.col("_v"))[0])
    n = v.count()
    (v.repartition("_cell")
     .write.mode("append").partitionBy("_cell")
     .parquet(os.path.join(index_dir, "cells.parquet")))
    meta["appended"] = int(meta.get("appended", 0)) + int(n)
    _atomic_json_write(os.path.join(index_dir, "ivf_meta.json"), meta)
    return {"n_added": int(n)}


def ivf_compact(spark, index_dir: str) -> dict:
    """Merge the small files incremental ivf_add calls leave behind: rewrite
    each cell's partition as one compacted file set. Pure maintenance — cell
    assignment and query results are unchanged."""
    import os

    path = os.path.join(index_dir, "cells.parquet")
    _recover_swap(path)  # clear any crashed previous attempt first
    v = spark.read.parquet(path)
    tmp = path + "_compact"
    (v.repartition("_cell")
     .write.mode("overwrite").partitionBy("_cell").parquet(tmp))
    _swap_in(path, tmp)
    return {"compacted": True}


def lsh_add(
    vectors: DataFrame,
    index_dir: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> dict:
    """Incremental append to a persisted LSH index: bucket the new vectors
    with the PERSISTED hyperplanes and append them as additional
    bucket-sorted parquet files. Each appended segment carries its own
    row-group min/max stats on `_bkt`, so the `_bkt IN (...)` pruning in
    lsh_query keeps skipping non-matching row groups per segment file —
    query results are identical to a from-scratch rebuild over the combined
    corpus (same planes/seed → same buckets). O(delta) work; run
    `lsh_compact` occasionally to merge segments back into one globally
    sorted file set. Contract: append-only, new ids only."""
    import json
    import os

    with open(os.path.join(index_dir, "lsh_meta.json")) as f:
        meta = json.load(f)
    _recover_swap(os.path.join(index_dir, "buckets.parquet"))  # see ivf_add
    planes = np.asarray(meta["planes"], dtype=np.float64)
    id_col = id_col or meta["id_col"]
    v = _prep_vectors(vectors, id_col, vec_col).withColumn(
        "_bkt", _lsh_bucket_expr(F.col("_v"), planes))
    n = v.count()
    (v.repartitionByRange(max(vectors.rdd.getNumPartitions(), 2), "_bkt")
     .sortWithinPartitions("_bkt")
     .write.mode("append").parquet(os.path.join(index_dir, "buckets.parquet")))
    meta["appended"] = int(meta.get("appended", 0)) + int(n)
    _atomic_json_write(os.path.join(index_dir, "lsh_meta.json"), meta)
    return {"n_added": int(n)}


def lsh_compact(spark, index_dir: str) -> dict:
    """Rewrite the LSH bucket table as one globally range-sorted file set
    (merging incremental segments): restores the single-segment row-group
    locality; results unchanged."""
    import os
    import shutil

    path = os.path.join(index_dir, "buckets.parquet")
    _recover_swap(path)  # clear any crashed previous attempt first
    v = spark.read.parquet(path)
    tmp = path + "_compact"
    (v.repartitionByRange(max(v.rdd.getNumPartitions() // 2, 2), "_bkt")
     .sortWithinPartitions("_bkt")
     .write.mode("overwrite").parquet(tmp))
    _swap_in(path, tmp)
    return {"compacted": True}
