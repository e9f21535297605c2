"""MinCovDet (MCD) — robust multi-dimensional Mahalanobis outlier scoring,
the reference's DEFAULT scorer for multi-dimension metrics
(MAD_OR_MCD auto-choice, legacy/src/main/java/macrobase/conf/
MacroBaseConf.java:180; algorithm legacy/.../stats/MinCovDet.java:85-229).

Algorithm (FAST-MCD, Rousseeuw & Van Driessen 1999, as in the reference):
  h = floor((n + p + 1)·alpha); start from a random h-subset; C-steps:
  (mean, cov) of the subset → keep the h points with smallest Mahalanobis
  distance → recompute, until the covariance determinant stops shrinking.
  Score(x) = sqrt((x−μ)ᵀ Σ⁻¹ (x−μ)) under the robust (μ, Σ).

Spark-first split:
- FIT on a bounded driver-side sample (numpy): the C-step iteration is a
  sequential fixed-point loop over h points — inherently driver-shaped. The
  sample is drawn with a DETERMINISTIC hash filter (xxhash64 of the metric
  columns), so the fit is reproducible regardless of partitioning, and its
  size is capped (FAST-MCD on a subsample is the standard large-n variant).
- SCORE distributed as a pure Catalyst column expression: the quadratic
  form Σ_{i≤j} (x_i−μ_i)(x_j−μ_j)·Σ⁻¹[i,j] expands to p(p+1)/2 codegen'd
  terms (diag + 2·off-diag, exactly the reference's accumulation order,
  MinCovDet.java:99-113) — no Python in the row path, scales to any n.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ALPHA = 0.5  # MacroBaseDefaults.MCD_ALPHA


def _fast_mcd(x: np.ndarray, alpha: float, seed: int, max_iter: int,
              stopping_delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side FAST-MCD over a sample matrix (n, p) → (mean, inv_cov)."""
    n, p = x.shape
    h = int(np.floor((n + p + 1) * alpha))
    h = max(min(h, n), p + 1)
    rng = np.random.default_rng(seed)
    subset = x[rng.choice(n, size=h, replace=False)]

    def mean_cov(s):
        m = s.mean(axis=0)
        c = np.cov(s, rowvar=False, bias=False)
        c = np.atleast_2d(c)
        try:
            inv = np.linalg.inv(c)
        except np.linalg.LinAlgError:
            inv = np.linalg.pinv(c)  # SVD fallback (MinCovDet.java:151-157)
        return m, c, inv

    mean, cov, inv = mean_cov(subset)
    det = np.linalg.det(cov)
    for _ in range(max_iter):
        d = x - mean
        md = np.einsum("ij,jk,ik->i", d, inv, d)
        keep = np.argsort(md, kind="stable")[:h]
        mean, cov, inv = mean_cov(x[keep])
        new_det = np.linalg.det(cov)
        if new_det == 0 or det - new_det < stopping_delta:
            break
        det = new_det
    return mean, inv


def mcd_fit(
    df: DataFrame,
    cols: list[str],
    alpha: float = DEFAULT_ALPHA,
    sample_limit: int = 50_000,
    seed: int = 11,
    max_iter: int = 30,
    stopping_delta: float = 1e-3,
) -> tuple[list[float], list[list[float]]]:
    """Fit robust (mean, inverse covariance) on a deterministic sample."""
    clean = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).na.drop()
    n = clean.count()
    if n > sample_limit:
        # deterministic hash-sample: row kept iff xxhash64(cols) mod k == 0
        k = int(np.ceil(n / sample_limit))
        clean = clean.filter(F.pmod(F.xxhash64(*cols), F.lit(k)) == 0)
    x = np.array(clean.collect(), dtype=np.float64)
    if x.shape[0] <= len(cols) + 1:
        raise ValueError(f"too few rows ({x.shape[0]}) to fit MCD over {cols}")
    # canonical row order: collect() order depends on partitioning; the fit
    # (initial random subset + argsort ties) must not
    x = x[np.lexsort(x.T[::-1])]
    mean, inv = _fast_mcd(x, alpha, seed, max_iter, stopping_delta)
    return mean.tolist(), inv.tolist()


def mahalanobis_expr(cols: list[str], mean: list[float],
                     inv_cov: list[list[float]]) -> Column:
    """sqrt(diag + 2·offdiag) quadratic form as a codegen'd column
    expression — the reference's exact accumulation (MinCovDet.java:99-113)."""
    centered = [F.col(c).cast("double") - F.lit(float(m))
                for c, m in zip(cols, mean)]
    diag = None
    off = None
    p = len(cols)
    for i in range(p):
        for j in range(i, p):
            term = centered[i] * centered[j] * F.lit(float(inv_cov[i][j]))
            if i == j:
                diag = term if diag is None else diag + term
            else:
                off = term if off is None else off + term
    quad = diag if off is None else diag + F.lit(2.0) * off
    return F.sqrt(quad)


def mcd_score(
    df: DataFrame,
    cols: list[str],
    output_col: str = "_SCORE",
    alpha: float = DEFAULT_ALPHA,
    sample_limit: int = 50_000,
    seed: int = 11,
) -> DataFrame:
    """Robust Mahalanobis score column over the metric columns."""
    mean, inv = mcd_fit(df, cols, alpha=alpha, sample_limit=sample_limit,
                        seed=seed)
    return df.withColumn(output_col, mahalanobis_expr(cols, mean, inv))


def mad_or_mcd(df: DataFrame, cols: list[str],
               output_col: str = "_SCORE", **kwargs) -> DataFrame:
    """The reference's default scorer auto-choice: 1-d metrics → MAD,
    multi-d → MCD (MacroBaseConf.java:180, MacroBaseDefaults.java)."""
    if len(cols) == 1:
        from macrobase_spark.operators.transform import mad_score

        return mad_score(df, cols[0], output_col=output_col)
    return mcd_score(df, cols, output_col=output_col, **kwargs)
