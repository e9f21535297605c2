"""Similarity search over an embedding column (`array<float>`):
brute-force cosine top-k baseline + an LSH-bucketed (random hyperplane)
variant as the scale path.

Brute force: entirely JVM-side (`F.zip_with`/`F.aggregate` dot products) —
exact, one scan per query batch, no shuffle until the final top-k. The
query set is broadcast (small); at 100 TB the scan parallelizes per
partition and the top-k is a per-partition heap + global limit.

LSH: sign-random-projection buckets; only same-bucket vectors are scored —
sublinear candidate sets at the cost of recall (probing multiplies tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _norm(col) -> "F.Column":
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


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
    # compute in float64 throughout (deterministic, oracle-matchable)
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_vn"),
    )
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col).cast("array<double>").alias("_q"),
        _norm(F.col(q_vec_col).cast("array<double>")).alias("_qn"),
    )
    dot = F.aggregate(
        F.zip_with("_v", "_q", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    joined = v.crossJoin(F.broadcast(q)).withColumn(
        "cos_sim",
        F.when((F.col("_vn") > 0) & (F.col("_qn") > 0),
               dot / (F.col("_vn") * F.col("_qn"))).otherwise(0.0),
    )
    w = W.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos_sim", "rank")
    )


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
    exact-rescores only those cells.

    Scale path: write the vector table partitioned by `_cell` once, and each
    query's scan touches n_probe/n_centroids of the data (partition-prunable).
    Recall < 1 by design; raise n_probe → recall → cost. Centroids travel to
    workers inside the Arrow-batched assignment UDF (one (B,D)×(D,C) matmul
    per batch), so the PLAN stays O(1) regardless of the centroid count —
    inlining 10⁴ centroids as column literals would explode Catalyst."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors if sample_frac >= 1.0 else vectors.sample(sample_frac, seed=seed)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="_fv")
    model = km.fit(train.select(array_to_vector(F.col(vec_col).cast(
        "array<double>")).alias("_fv")))
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])

    def nearest_cells_udf(top_n: int):
        """Arrow-batched top_n nearest centroids (expanded L2:
        |c|² − 2·c·x); ties broken by centroid index (stable argsort)."""
        from pyspark.sql.functions import pandas_udf

        c2 = (centroids * centroids).sum(axis=1)

        @pandas_udf("array<int>")
        def f(vecs: pd.Series) -> pd.Series:
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            d = c2[None, :] - 2.0 * (x @ centroids.T)
            idx = np.argsort(d, axis=1, kind="stable")[:, :top_n]
            return pd.Series(list(idx.astype(np.int32)))

        return f

    v = vectors.withColumn("_cell", nearest_cells_udf(1)(
        F.col(vec_col).cast("array<double>"))[0])
    q = queries.withColumn("_cells", nearest_cells_udf(n_probe)(
        F.col(q_vec_col).cast("array<double>")))
    probe_cells = q.select(F.explode("_cells").alias("_cell")).distinct()
    cand = v.join(F.broadcast(probe_cells), "_cell", "left_semi").drop("_cell")
    return cosine_topk_bruteforce(
        cand, queries, k=k, id_col=id_col, vec_col=vec_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col)


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
    exact rescoring within buckets. Recall < 1 by design (scale path: the
    scan touches only matching buckets — partition-prunable if the vector
    table is written partitioned by bucket)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_expr(col):
        bit_terms = []
        for i in range(n_planes):
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

    v = vectors.withColumn("_bkt", bucket_expr(F.col(vec_col)))
    q = queries.withColumn("_bkt", bucket_expr(F.col(q_vec_col)))
    cand_v = v.join(
        F.broadcast(q.select("_bkt").distinct()), "_bkt", "left_semi"
    ).drop("_bkt")
    # exact rescore on the candidate subset only
    joined = cosine_topk_bruteforce(
        cand_v, queries, k=k, id_col=id_col, vec_col=vec_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col,
    )
    return joined
