"""Time-series (FFT/ACF/Kalman/AR) and density (KDE/GMM) scorers —
planted-signal property tests in the reference's test style
(AutocorrelationTest / FFTTest / KalmanScalarFilterTest / MinCovDetTest
analogues)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.density import gmm_score, kde_score
from macrobase_spark.operators.timeseries import (
    _kalman_1d, ar_scores, autocorrelation, fft_features, kalman_smooth,
)


@pytest.fixture(scope="module")
def series_df(spark):
    """Three series: a period-8 square wave, a noisy AR process, and pure
    noise — each 256 points."""
    rng = np.random.default_rng(6)
    n = 256
    rows = []
    sq = np.tile([1.0] * 4 + [-1.0] * 4, n // 8)
    ar = np.zeros(n)
    for t in range(2, n):
        ar[t] = 0.75 * ar[t - 1] - 0.25 * ar[t - 2] + rng.standard_normal()
    noise = rng.standard_normal(n)
    for name, x in (("square", sq), ("ar", ar), ("noise", noise)):
        for t in range(n):
            rows.append((name, t, float(x[t])))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "t", "v"])).cache()


def test_autocorrelation_finds_period(spark, series_df):
    res = {r["series"]: r for r in
           autocorrelation(series_df, ["series"], "t", "v", max_lag=20).collect()}
    assert res["square"]["max_lag"] == 8       # the planted period
    assert res["square"]["max_acf"] > 0.9
    assert res["noise"]["max_acf"] < 0.3
    # ACF vs direct numpy definition for the AR series
    acf = np.array(res["ar"]["acf"])
    x = np.array([r["v"] for r in series_df.filter("series='ar'")
                  .orderBy("t").collect()])
    xc = x - x.mean()
    want1 = np.dot(xc[:-1], xc[1:]) / np.dot(xc, xc)
    assert abs(acf[0] - want1) < 1e-9


def test_fft_features_shape_and_dc(spark, series_df):
    res = {r["series"]: np.array(r["fft"]) for r in
           fft_features(series_df, ["series"], "t", "v", n_coeffs=8).collect()}
    assert all(len(v) == 16 for v in res.values())
    # DC term (re of coeff 0) = sum of the series
    assert abs(res["square"][0] - 0.0) < 1e-9  # balanced square wave


def test_kalman_smooth_denoises(spark):
    rng = np.random.default_rng(2)
    n = 300
    truth = np.linspace(0, 30, n)  # constant-velocity trajectory
    obs = truth + rng.standard_normal(n) * 2.0
    pdf = pd.DataFrame({"s": ["a"] * n, "t": range(n), "v": obs})
    out = (kalman_smooth(spark.createDataFrame(pdf), ["s"], "t", "v",
                         q_scale=1e-3, r_scale=4.0)
           .orderBy("t").toPandas())
    sm = out["_SMOOTHED"].to_numpy()
    # smoothing reduces error vs raw observations on the back half
    raw_err = np.abs(obs[100:] - truth[100:]).mean()
    sm_err = np.abs(sm[100:] - truth[100:]).mean()
    assert sm_err < raw_err * 0.6
    # and matches the sequential reference port exactly
    assert np.allclose(sm, _kalman_1d(obs, 1e-3, 4.0))


def test_ar_scores_flag_planted_break(spark):
    rng = np.random.default_rng(8)
    n = 400
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.9 * x[t - 1] + rng.standard_normal() * 0.1
    x[300] += 5.0  # planted level shock
    pdf = pd.DataFrame({"s": ["a"] * n, "t": range(n), "v": x})
    out = (ar_scores(spark.createDataFrame(pdf), ["s"], "t", "v", p=2)
           .orderBy("t").toPandas())
    top = out["_SCORE"].to_numpy().argmax()
    assert top == 300


def test_kde_scores_isolated_point_highest(spark):
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((800, 2))
    pts = np.vstack([pts, [[8.0, 8.0]]])  # isolated outlier
    pdf = pd.DataFrame(pts, columns=["mx", "my"])
    pdf["i"] = range(len(pdf))
    scored = kde_score(spark.createDataFrame(pdf), ["mx", "my"])
    top = scored.orderBy(F.col("_SCORE").desc()).limit(1).collect()[0]
    assert top["i"] == 800


def test_gmm_scores_between_cluster_point(spark):
    rng = np.random.default_rng(4)
    a = rng.standard_normal((400, 2)) * 0.3 + [-4, 0]
    b = rng.standard_normal((400, 2)) * 0.3 + [4, 0]
    pts = np.vstack([a, b, [[0.0, 0.0]]])  # point between the clusters
    pdf = pd.DataFrame(pts, columns=["mx", "my"])
    pdf["i"] = range(len(pdf))
    scored = gmm_score(spark.createDataFrame(pdf), ["mx", "my"], k=2)
    top = scored.orderBy(F.col("_SCORE").desc()).limit(1).collect()[0]
    assert top["i"] == 800


def test_hannan_rissanen_recovers_arma_params():
    """HR estimation on a long synthetic ARMA(1,1) series must recover
    φ and θ to within loose tolerance (it's a consistent estimator)."""
    from macrobase_spark.operators.timeseries import _hannan_rissanen

    rng = np.random.default_rng(11)
    n = 20000
    phi_true, theta_true = 0.7, 0.4
    e = rng.standard_normal(n)
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = phi_true * x[t - 1] + e[t] + theta_true * e[t - 1]
    phi, theta, mu = _hannan_rissanen(x, 1, 1)
    assert abs(phi[0] - phi_true) < 0.05, phi
    assert abs(theta[0] - theta_true) < 0.08, theta
    assert abs(mu) < 0.1


def test_arima_scores_flag_spike_on_trend(spark):
    """ARIMA(1,1,1) on a trending series: differencing removes the trend, so
    the planted spike carries the max relative forecast error — the
    reference's |value − prediction|/|prediction| score."""
    from macrobase_spark.operators.timeseries import arima_scores

    rng = np.random.default_rng(12)
    n = 500
    t = np.arange(n, dtype=float)
    v = 100.0 + 2.5 * t + rng.standard_normal(n)  # strong linear trend
    v[311] += 400.0                                # planted spike
    pdf = pd.DataFrame({"s": "a", "t": t, "v": v})
    out = (arima_scores(spark.createDataFrame(pdf), ["s"], "t", "v",
                        p=1, d=1, q=1)
           .orderBy(F.col("_SCORE").desc()).limit(1).collect()[0])
    assert out["t"] == 311.0
