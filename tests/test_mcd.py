"""MCD (MinCovDet) robust Mahalanobis scorer — planted-covariance-outlier
tests in the spirit of the reference's MinCovDetTest: points that are
marginally unremarkable but violate the correlation structure must score
highest, and a planted contamination CLUSTER must not mask itself (the
failure mode of the classical covariance estimate that MCD exists to fix)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.mcd import (
    _fast_mcd, mad_or_mcd, mahalanobis_expr, mcd_fit, mcd_score,
)


@pytest.fixture(scope="module")
def corr_df(spark):
    """3000 points from a corr=0.95 2-D gaussian + 30 'cross' outliers at
    (2σ, −2σ) — inside both marginals, far outside the covariance."""
    rng = np.random.default_rng(5)
    n = 3000
    z = rng.normal(size=n)
    x = z + rng.normal(scale=0.3, size=n)
    y = z + rng.normal(scale=0.3, size=n)
    xo = np.concatenate([x, np.full(30, 2.0)])
    yo = np.concatenate([y, np.full(30, -2.0)])
    flag = np.concatenate([np.zeros(n), np.ones(30)])
    pdf = pd.DataFrame({"mx": xo, "my": yo, "planted": flag})
    return spark.createDataFrame(pdf).cache()


def test_mcd_scores_cross_outliers_top(spark, corr_df):
    scored = mcd_score(corr_df, ["mx", "my"], seed=11)
    top = scored.orderBy(F.col("_SCORE").desc()).limit(30).collect()
    # all 30 planted cross-structure points rank in the top 30
    assert sum(r["planted"] for r in top) == 30


def test_mcd_resists_masking(spark):
    """A 15% contamination cluster at (6, 6)·σ-ish must still score high:
    the classical covariance would absorb it (masking); the h-subset fit
    must not."""
    rng = np.random.default_rng(7)
    n = 2000
    x = rng.normal(size=n)
    y = 0.5 * x + rng.normal(scale=0.5, size=n)
    k = 300
    pdf = pd.DataFrame({
        "mx": np.concatenate([x, rng.normal(6.0, 0.1, k)]),
        "my": np.concatenate([y, rng.normal(6.0, 0.1, k)]),
        "planted": np.concatenate([np.zeros(n), np.ones(k)]),
    })
    df = spark.createDataFrame(pdf)
    scored = mcd_score(df, ["mx", "my"], seed=11).cache()
    cut = scored.filter(F.col("planted") == 0).agg(
        F.expr("percentile(_SCORE, 0.99)")).collect()[0][0]
    planted_above = scored.filter(
        (F.col("planted") == 1) & (F.col("_SCORE") > cut)).count()
    assert planted_above == k, "contamination cluster was masked"


def test_mahalanobis_expr_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 3))
    mean, inv = _fast_mcd(x, alpha=0.75, seed=1, max_iter=20,
                          stopping_delta=1e-9)
    pdf = pd.DataFrame(x, columns=["a", "b", "c"])
    df = spark.createDataFrame(pdf)
    got = np.array([
        r["s"] for r in df.select(
            mahalanobis_expr(["a", "b", "c"], mean.tolist(), inv.tolist())
            .alias("s")).collect()
    ])
    d = x - np.asarray(mean)
    want = np.sqrt(np.einsum("ij,jk,ik->i", d, np.asarray(inv), d))
    # same quadratic form; expression groups diag + 2·offdiag like the
    # reference, so allow float-assoc noise only
    # (collect order == input order for a local createDataFrame... not
    # guaranteed — compare as sorted multisets)
    assert np.allclose(np.sort(got), np.sort(want), rtol=1e-9)


def test_mcd_fit_deterministic(spark, corr_df):
    m1, i1 = mcd_fit(corr_df, ["mx", "my"], seed=11)
    m2, i2 = mcd_fit(corr_df.repartition(7), ["mx", "my"], seed=11)
    assert m1 == m2 and i1 == i2, "fit must be partitioning-independent"


def test_mad_or_mcd_dispatch(spark, corr_df):
    one = mad_or_mcd(corr_df, ["mx"])
    assert "_SCORE" in one.columns
    two = mad_or_mcd(corr_df, ["mx", "my"])
    assert "_SCORE" in two.columns
