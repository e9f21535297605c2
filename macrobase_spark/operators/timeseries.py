"""Time-series scorers/transforms (the reference's legacy/contrib set),
per-series via applyInPandas — the grouping key is the series id, each
series is processed as one numpy array (these algorithms are inherently
sequential per series; across series they parallelize perfectly, which is
the axis that matters at 10¹² rows).

- fft_features: zero-pad to the next power of two, forward FFT, interleaved
  re/im (legacy/.../stats/FFT.java:36-50 semantics).
- autocorrelation: ACF via FFT — F = FFT(x − μ) zero-padded to ≥2n,
  S = F·F*, R = IFFT(S), normalized by R(0); reports the requested lags and
  the max peak past lag 0 (legacy/.../stats/Autocorrelation.java:17-100).
- kalman_smooth: constant-velocity Kalman filter, H=[1,0], F=[[1,t],[0,1]],
  Q = qScale·ggᵀ (g=[t²/2, t]), R = rScale·t² — a faithful port of
  contrib/.../kalmanfilter/KalmanVectorFilter.java:29-86 for scalar series.
- ar_scores: AR(p) one-step-ahead forecasts via Yule–Walker, score =
  |residual|/σ̂ (fast pure-AR path).
- arima_scores: full ARIMA(p,d,q) via difference → Hannan–Rissanen
  two-stage least squares → one-step forecasts on the original scale. The
  reference bridges to R's CSS-ML fit (contrib/.../stats/ARIMA.java:1-117,
  `forecast` package); same model class, different estimator — the R
  runtime is out of environment (documented deviation, see the
  arima_scores docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _next_pow2(n: int) -> int:
    return max(2, 1 << (int(n - 1).bit_length()))


def fft_features(df: DataFrame, keys: list[str], order_col: str,
                 value_col: str, n_coeffs: int = 16) -> DataFrame:
    """Per-series FFT: first n_coeffs (re, im) pairs of the forward
    transform of the zero-padded series."""
    key_t = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (", ".join(f"{k} {key_t[k]}" for k in keys)
              + ", fft array<double>")

    def fx(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(order_col)[value_col].to_numpy(np.float64)
        # pad to at least n_coeffs so every series yields the same
        # fixed-width 2*n_coeffs feature vector (a short series padded only
        # to its own next pow2 would emit a ragged row)
        padded = np.zeros(max(_next_pow2(len(x)), _next_pow2(n_coeffs)))
        padded[: len(x)] = x
        out = np.fft.fft(padded)[:n_coeffs]
        inter = np.empty(2 * len(out))
        inter[0::2], inter[1::2] = out.real, out.imag
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["fft"] = [inter.tolist()]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(fx, schema=schema)


def autocorrelation(df: DataFrame, keys: list[str], order_col: str,
                    value_col: str, max_lag: int = 32,
                    acf_threshold: float = 0.2) -> DataFrame:
    """Per-series ACF (FFT method) at lags 1..max_lag + the max peak."""
    key_t = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (", ".join(f"{k} {key_t[k]}" for k in keys)
              + ", acf array<double>, max_acf double, max_lag int")

    def fx(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(order_col)[value_col].to_numpy(np.float64)
        n = len(x)
        padded = np.zeros(_next_pow2(2 * n - 1))
        padded[:n] = x - x.mean()
        fr = np.fft.fft(padded)
        r = np.fft.ifft(fr * np.conj(fr)).real
        r0 = r[0] if r[0] != 0 else 1.0
        acf = r[1: max_lag + 1] / r0
        # max peak past lag 0, counted only when it clears the threshold
        # (Autocorrelation.java:80-96: peaks below ACF_THRESH are ignored)
        if len(acf) and acf.max() >= acf_threshold:
            mx = float(acf.max())
            mi = int(np.argmax(acf)) + 1
        else:
            mx, mi = 0.0, 0
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update({"acf": [acf.tolist()], "max_acf": [mx], "max_lag": [mi]})
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(fx, schema=schema)


def _kalman_1d(obs: np.ndarray, q_scale: float, r_scale: float,
               dt: int = 1) -> np.ndarray:
    """Scalar constant-velocity Kalman filter, faithful to
    KalmanVectorFilter.step (2-state position/velocity, scalar measure)."""
    g = np.array([0.5 * dt * dt, dt])
    q = q_scale * np.outer(g, g)
    r = r_scale * dt * dt
    f = np.array([[1.0, dt], [0.0, 1.0]])
    h = np.array([[1.0, 0.0]])
    state = np.array([obs[0], 0.0])
    cov = np.eye(2)
    out = np.empty_like(obs)
    out[0] = obs[0]
    for i in range(1, len(obs)):
        prior = f @ state
        prior_cov = f @ cov @ f.T + q
        resid = obs[i] - prior[0]
        s = (h @ prior_cov @ h.T)[0, 0] + r
        gain = (prior_cov @ h.T / s)[:, 0]
        state = prior + gain * resid
        cov = (np.eye(2) - np.outer(gain, h[0])) @ prior_cov
        out[i] = state[0]
    return out


def kalman_smooth(df: DataFrame, keys: list[str], order_col: str,
                  value_col: str, q_scale: float = 1e-4,
                  r_scale: float = 1.0,
                  output_col: str = "_SMOOTHED") -> DataFrame:
    """Per-series Kalman-filtered value column (same rows + output_col)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {output_col} double"

    def fx(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        obs = pdf[value_col].to_numpy(np.float64)
        pdf[output_col] = _kalman_1d(obs, q_scale, r_scale)
        return pdf

    return df.groupBy(*keys).applyInPandas(fx, schema=schema)


def ar_scores(df: DataFrame, keys: list[str], order_col: str,
              value_col: str, p: int = 3,
              output_col: str = "_SCORE") -> DataFrame:
    """Per-series AR(p) one-step-ahead anomaly score: fit Yule–Walker on
    the series, score_t = |x_t − x̂_t| / σ̂_resid (first p points score 0)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {output_col} double"

    def fx(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(np.float64)
        n = len(x)
        if n <= p + 1:
            pdf[output_col] = 0.0
            return pdf
        mu = x.mean()
        xc = x - mu
        # Yule–Walker: solve Toeplitz(r[0..p-1]) · φ = r[1..p]; p is tiny,
        # build the p×p system explicitly (numpy only)
        r = np.array([np.dot(xc[: n - k], xc[k:]) / n for k in range(p + 1)])
        toep = np.array([[r[abs(i - j)] for j in range(p)] for i in range(p)])
        try:
            phi = np.linalg.solve(toep, r[1: p + 1])
        except np.linalg.LinAlgError:
            phi = np.linalg.lstsq(toep, r[1: p + 1], rcond=None)[0]
        # one-step-ahead forecasts for t ≥ p
        pred = np.full(n, mu)
        for k in range(1, p + 1):
            pred[p:] += phi[k - 1] * xc[p - k: n - k]
        resid = x[p:] - pred[p:]
        sigma = resid.std() or 1e-12
        score = np.zeros(n)
        score[p:] = np.abs(resid) / sigma
        pdf[output_col] = score
        return pdf

    return df.groupBy(*keys).applyInPandas(fx, schema=schema)


def _hannan_rissanen(x: np.ndarray, p: int, q: int
                     ) -> tuple[np.ndarray, np.ndarray, float]:
    """ARMA(p, q) parameter estimation via the Hannan–Rissanen two-stage
    regression (numpy lstsq only — deterministic, no iterative optimizer):
    stage 1 fits a long AR to proxy the innovations, stage 2 regresses x_t
    on its own lags and the proxied innovation lags. Returns (φ, θ, μ)."""
    n = len(x)
    mu = float(x.mean())
    xc = x - mu
    e = np.zeros(n)
    if q > 0:
        m = int(min(max(20, 2 * (p + q)), max(p + q + 1, n // 4)))
        if n > 2 * m:
            X = np.column_stack([xc[m - k: n - k] for k in range(1, m + 1)])
            a = np.linalg.lstsq(X, xc[m:], rcond=None)[0]
            e[m:] = xc[m:] - X @ a
    r = max(p, q)
    cols = [xc[r - k: n - k] for k in range(1, p + 1)]
    cols += [e[r - k: n - k] for k in range(1, q + 1)]
    if not cols or n <= r + 1:
        return np.zeros(p), np.zeros(q), mu
    X2 = np.column_stack(cols)
    beta = np.linalg.lstsq(X2, xc[r:], rcond=None)[0]
    return beta[:p], beta[p:], mu


def _arima_predict(x: np.ndarray, p: int, d: int, q: int
                   ) -> tuple[np.ndarray, int]:
    """One-step-ahead ARIMA(p,d,q) forecasts on the ORIGINAL scale.
    Differences d times, fits ARMA via Hannan–Rissanen, runs the recursive
    innovation filter, and integrates the forecast back. Returns
    (predictions, warmup) where the first `warmup` points are unforecast."""
    y = x.astype(np.float64)
    for _ in range(d):
        y = np.diff(y)
    phi, theta, mu = _hannan_rissanen(y, p, q)
    ny = len(y)
    r = max(p, q)
    yc = y - mu
    pred_c = np.zeros(ny)       # centered one-step forecasts of y
    eps = np.zeros(ny)          # recursive innovations
    for t in range(r, ny):
        acc = 0.0
        for k in range(1, p + 1):
            acc += phi[k - 1] * yc[t - k]
        for k in range(1, q + 1):
            acc += theta[k - 1] * eps[t - k]
        pred_c[t] = acc
        eps[t] = yc[t] - acc
    y_hat = pred_c + mu
    warmup = r + d
    n = len(x)
    x_hat = np.copy(x)
    # integrate: x̂_t = ŷ_t + Σ (the d-th difference reconstruction)
    if d == 0:
        x_hat = y_hat
    elif d == 1:
        x_hat = np.empty(n)
        x_hat[1:] = x[:-1] + y_hat
        x_hat[0] = x[0]
    elif d == 2:
        x_hat = np.empty(n)
        x_hat[2:] = 2.0 * x[1:-1] - x[:-2] + y_hat
        x_hat[:2] = x[:2]
    else:
        raise ValueError("d > 2 not supported")
    return x_hat, warmup


def arima_scores(df: DataFrame, keys: list[str], order_col: str,
                 value_col: str, p: int = 2, d: int = 0, q: int = 1,
                 output_col: str = "_SCORE") -> DataFrame:
    """Per-series ARIMA(p,d,q) one-step-ahead anomaly score — full parity
    with the reference's windowed scorer semantics
    (contrib/.../stats/ARIMA.java:63-116: forecast the next value, score =
    |value − prediction| / |prediction|), with the R `forecast` dependency
    replaced by a native Hannan–Rissanen fit (deviation: HR least-squares
    instead of R's CSS-ML optimizer; same model family, deterministic).
    The first max(p,q)+d points of each series score 0."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {output_col} double"

    def fx(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(np.float64)
        n = len(x)
        if n <= max(p, q) + d + 1:
            pdf[output_col] = 0.0
            return pdf
        x_hat, warmup = _arima_predict(x, p, d, q)
        denom = np.where(np.abs(x_hat) > 1e-9, np.abs(x_hat), 1e-9)
        score = np.abs(x - x_hat) / denom
        score[:warmup] = 0.0
        pdf[output_col] = score
        return pdf

    return df.groupBy(*keys).applyInPandas(fx, schema=schema)
