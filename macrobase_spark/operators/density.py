"""Density scorers: Gaussian KDE and GMM (the reference's contrib KDE /
mixture family, contrib/.../stats/KDE.java:50-130, BinnedKDE, TreeKDE;
contrib/.../stats/mixture/*).

Spark split:
- KDE: kernel centers come from a bounded DETERMINISTIC hash-sample of the
  data (the reference trains on the batch itself; at 10¹² rows an exact
  all-pairs KDE is quadratic, so the sampled estimator is the scale form).
  Bandwidth: Scott's rule per dimension (the reference's
  NormalScaleBandwidth analogue). Scoring ships the (centers, bandwidth)
  matrix inside an Arrow-batched UDF — one (B,C) matmul-shaped kernel-sum
  per batch, no per-row Python, plan size O(1) in the center count.
- GMM: pyspark.ml.clustering.GaussianMixture (Catalyst-native EM), score =
  per-row max posterior cluster probability or summed log-likelihood —
  the home the SURVEY §2.6 table names for the mixture family.

Score convention follows the reference (KDE.score returns the NEGATIVE
density — higher score = more anomalous, KDE.java:125-130).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kde_fit(df: DataFrame, cols: list[str], sample_limit: int = 2048,
            bandwidth_multiplier: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic-sample KDE fit → (centers (C,d), bandwidth (d,))."""
    clean = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).na.drop()
    n = clean.count()
    if n > sample_limit:
        k = int(np.ceil(n / sample_limit))
        clean = clean.filter(F.pmod(F.xxhash64(*cols), F.lit(k)) == 0)
    x = np.array(clean.collect(), dtype=np.float64)
    if x.size == 0:
        raise ValueError(
            f"kde_fit: no non-null rows in {cols} — nothing to fit")
    x = x[np.lexsort(x.T[::-1])]  # partition-independent
    c, d = x.shape
    # Scott's rule: h_j = σ_j · C^(−1/(d+4))
    h = x.std(axis=0, ddof=1) * (c ** (-1.0 / (d + 4))) * bandwidth_multiplier
    h = np.where(h > 0, h, 1e-9)
    return x, h


def kde_score(df: DataFrame, cols: list[str], output_col: str = "_SCORE",
              sample_limit: int = 2048,
              bandwidth_multiplier: float = 1.0,
              fit_df: DataFrame | None = None) -> DataFrame:
    """Adds the negative-KDE-density score column (higher = more
    anomalous). Product Gaussian kernel with per-dimension bandwidth.
    `fit_df`: fit the kernel centers/bandwidth on a separate (clean)
    relation and score `df` against it — train-on-reference,
    score-everything, same split the reference's train-then-score
    classifiers use."""
    centers, h = kde_fit(fit_df if fit_df is not None else df,
                         cols, sample_limit, bandwidth_multiplier)
    c, d = centers.shape
    norm = 1.0 / (c * np.prod(h) * (2.0 * np.pi) ** (d / 2.0))
    scaled_centers = centers / h  # pre-scale once

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(*series: pd.Series) -> pd.Series:
        x = np.stack([s.to_numpy(np.float64) for s in series], axis=1) / h
        # squared distances via the expansion |a|² − 2ab + |b|²
        d2 = ((x * x).sum(axis=1)[:, None]
              - 2.0 * x @ scaled_centers.T
              + (scaled_centers * scaled_centers).sum(axis=1)[None, :])
        dens = norm * np.exp(-0.5 * d2).sum(axis=1)
        return pd.Series(-dens)

    return df.withColumn(output_col, score(*[F.col(c_).cast("double")
                                             for c_ in cols]))


def _gmm_logpdf(x: np.ndarray, weights: np.ndarray, mus: np.ndarray,
                invs: np.ndarray, logdets: np.ndarray) -> np.ndarray:
    """Per-component log w_j + log N(x; μ_j, Σ_j) → (n, k) matrix."""
    n, d = x.shape
    out = np.empty((n, len(weights)))
    for j in range(len(weights)):
        dx = x - mus[j]
        out[:, j] = (np.log(max(weights[j], 1e-300))
                     - 0.5 * (d * np.log(2 * np.pi) + logdets[j])
                     - 0.5 * np.einsum("ij,jk,ik->i", dx, invs[j], dx))
    return out


def _em_fit_numpy(x: np.ndarray, k: int, seed: int, max_iter: int,
                  tol: float = 1e-3, reg: float = 1e-6):
    """Standard EM for a full-covariance GMM, driver-side numpy. Same
    convergence criterion as pyspark.ml GaussianMixture (mean log-likelihood
    delta < tol); k-means++-style seeding for deterministic, spread-out
    initial means."""
    n, d = x.shape
    rng = np.random.default_rng(seed)
    means = [x[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(np.stack([((x - m) ** 2).sum(axis=1) for m in means]),
                    axis=0)
        tot = d2.sum()
        p = d2 / tot if tot > 0 else None
        means.append(x[rng.choice(n, p=p)])
    mus = np.stack(means)
    base_cov = np.atleast_2d(np.cov(x.T, ddof=1)) + reg * np.eye(d)
    covs = np.stack([base_cov.copy() for _ in range(k)])
    weights = np.full(k, 1.0 / k)

    prev_ll = -np.inf
    for _ in range(max_iter):
        invs = np.stack([np.linalg.inv(c) for c in covs])
        logdets = np.array([np.linalg.slogdet(c)[1] for c in covs])
        lls = _gmm_logpdf(x, weights, mus, invs, logdets)
        m = lls.max(axis=1)
        lse = m + np.log(np.exp(lls - m[:, None]).sum(axis=1))
        resp = np.exp(lls - lse[:, None])  # (n, k) responsibilities
        ll = lse.mean()
        if ll - prev_ll < tol:
            break
        prev_ll = ll
        nk = resp.sum(axis=0) + 1e-12
        weights = nk / n
        mus = (resp.T @ x) / nk[:, None]
        for j in range(k):
            dx = x - mus[j]
            covs[j] = (resp[:, j][:, None] * dx).T @ dx / nk[j] \
                + reg * np.eye(d)
    return weights, mus, covs


def gmm_score(df: DataFrame, cols: list[str], k: int = 3, seed: int = 11,
              output_col: str = "_SCORE",
              fit_sample_limit: int = 10_000,
              max_iter: int = 100,
              distributed_fit: bool = False,
              fit_df: DataFrame | None = None) -> DataFrame:
    """Gaussian-mixture anomaly score: score = −log Σ_j w_j · N(x; μ_j, Σ_j)
    — the mixture's negative log-likelihood (a posterior would stay ≈1 for
    far points and hide anomalies). The k fitted components travel inside
    one Arrow-batched UDF with precomputed inverses/log-dets.

    The fit sample is bounded (fit_sample_limit) and hash-deterministic, so
    by default EM runs DRIVER-SIDE in numpy over the collected sample —
    ~25 distributed EM jobs to fit ≤10k rows was the most expensive query in
    the suite for no accuracy gain. Set distributed_fit=True to fit with
    pyspark.ml GaussianMixture when the train set genuinely exceeds driver
    memory (raise fit_sample_limit accordingly). `fit_df`: fit the
    mixture on a separate (clean) relation and score `df` against it."""
    from pyspark.sql.functions import pandas_udf

    dbl = ((fit_df if fit_df is not None else df)
           .select(*[F.col(c).cast("double").alias(c) for c in cols])
           .na.drop())
    n = dbl.count()
    if n > fit_sample_limit:
        kk = int(np.ceil(n / fit_sample_limit))
        dbl = dbl.filter(F.pmod(F.xxhash64(*cols), F.lit(kk)) == 0)

    if not distributed_fit:
        x = np.array(dbl.collect(), dtype=np.float64)
        if x.size == 0:
            raise ValueError(
                f"gmm_score: no non-null rows in {cols} — nothing to fit")
        x = x[np.lexsort(x.T[::-1])]  # partition-independent
        weights, mus, covs = _em_fit_numpy(x, k, seed, max_iter)
        gaussians = [(mus[j], covs[j]) for j in range(k)]
    else:
        from pyspark.ml.clustering import GaussianMixture
        from pyspark.ml.functions import array_to_vector

        # EM runs one distributed pass PER ITERATION over the train
        # relation — cache it so iterations read columnar batches
        train = dbl.select(array_to_vector(
            F.array(*[F.col(c) for c in cols])).alias("_fv")).cache()
        gm = GaussianMixture(k=k, seed=seed, featuresCol="_fv",
                             predictionCol="_CLUSTER", maxIter=max_iter)
        model = gm.fit(train)
        train.unpersist()
        weights = np.asarray(model.weights, dtype=np.float64)
        gaussians = [(np.asarray(g.mean.toArray(), dtype=np.float64),
                      np.asarray(g.cov.toArray(), dtype=np.float64))
                     for g in model.gaussians]

    comps = []
    for mu, cov in gaussians:
        try:
            inv = np.linalg.inv(cov)
            _, logdet = np.linalg.slogdet(cov)
        except np.linalg.LinAlgError:
            inv = np.linalg.pinv(cov)
            logdet = np.linalg.slogdet(cov + 1e-9 * np.eye(len(mu)))[1]
        comps.append((mu, inv, logdet))
    d = len(comps[0][0])
    log_norms = np.array([
        np.log(max(weights[j], 1e-300)) - 0.5 * (d * np.log(2 * np.pi) + ld)
        for j, (_, _, ld) in enumerate(comps)
    ])

    @pandas_udf("double")
    def score(*series: pd.Series) -> pd.Series:
        x = np.stack([s.to_numpy(np.float64) for s in series], axis=1)
        lls = np.empty((x.shape[0], len(comps)))
        for j, (mu, inv, _) in enumerate(comps):
            dx = x - mu
            lls[:, j] = log_norms[j] - 0.5 * np.einsum(
                "ij,jk,ik->i", dx, inv, dx)
        m = lls.max(axis=1)
        ll = m + np.log(np.exp(lls - m[:, None]).sum(axis=1))
        return pd.Series(-ll)

    return df.withColumn(output_col, score(*[F.col(c).cast("double")
                                             for c in cols]))
