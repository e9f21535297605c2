"""Exact quantiles, distributed-fast.

Spark's exact `percentile` aggregate funnels every value through one reducer
(a counting hash map) — ~3-4 s on 600k doubles. For TAIL quantiles (the
classifier cutoffs: p1/p99 etc.) the same exact values come from
per-partition head/tail extremes merged on the driver: each partition
contributes its k smallest and k largest values (tiny numpy partial-sorts),
ONE job total for BOTH tails, and the global order statistics are exact
because any global top-k is contained in the union of per-partition top-ks.
Scales with executors instead of bottlenecking on one reducer, and replaces
the two TakeOrderedAndProject jobs (one per tail) of the naive approach.

Interpolation replicates percentile_cont (and DuckDB quantile_cont):
idx = (n−1)·q; v = v[floor]·(1−frac) + v[ceil]·frac — bit-identical to the
oracle because the source values are exact and the float expression matches
both engines' evaluation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAIL = 0.15  # use the tail path when q ≤ TAIL or q ≥ 1-TAIL
DEEP_CAP = 262144  # deepest per-partition order statistic the tail path
# will ship to the driver (k × num_partitions × 8 B); deeper order
# statistics fall back to Spark's exact percentile aggregate instead of
# collecting an unbounded slice of the column


def _partition_extremes(k_lo: int, k_hi: int):
    def fn(batches):
        lo: np.ndarray | None = None
        hi: np.ndarray | None = None
        n = 0
        for pdf in batches:
            v = pdf["_v"].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            n += len(v)
            if len(v) == 0:
                continue
            lo_c = v if lo is None else np.concatenate([lo, v])
            if k_lo and len(lo_c) > k_lo:
                lo_c = np.partition(lo_c, k_lo - 1)[:k_lo]
            lo = lo_c if k_lo else np.empty(0)
            hi_c = v if hi is None else np.concatenate([hi, v])
            if k_hi and len(hi_c) > k_hi:
                hi_c = np.partition(hi_c, len(hi_c) - k_hi)[len(hi_c) - k_hi:]
            hi = hi_c if k_hi else np.empty(0)
        yield pd.DataFrame({
            "lo": [(lo if lo is not None else np.empty(0)).tolist()],
            "hi": [(hi if hi is not None else np.empty(0)).tolist()],
            "n": [n],
        })

    return fn


def exact_quantiles(df: DataFrame, col: str, qs: list[float],
                    n: int | None = None) -> dict[float, float]:
    """Exact percentile_cont values for each q in qs.

    NULLs are excluded on BOTH paths (Spark `percentile` skips them; the
    tail path filters them in the kernel). `n`, when passed, must be the
    NON-NULL count."""
    df = df.filter(F.col(col).isNotNull())
    out: dict[float, float] = {}
    mids = [q for q in qs if TAIL < q < 1.0 - TAIL]
    tails = [q for q in qs if q not in mids]
    if mids:
        row = df.agg(*[
            F.expr(f"percentile({col}, {q!r})").alias(f"q{i}")
            for i, q in enumerate(mids)
        ]).collect()[0]
        out.update({q: float(row[f"q{i}"]) if row[f"q{i}"] is not None
                    else float("nan") for i, q in enumerate(mids)})
    if not tails:
        return out

    # both tails in ONE pass: per-partition k smallest + k largest, merged
    # driver-side. k must cover the deepest requested order statistic; we
    # need n for that — if unknown, overshoot with a bound from the first
    # computation (n is returned by the same job, so compute k from the
    # requested fractions against a cheap upper bound: use fraction·n after
    # the job by re-running only if the initial k was too shallow).
    lo_qs = [q for q in tails if q <= 0.5]
    hi_qs = [q for q in tails if q > 0.5]

    def run(k_lo: int, k_hi: int):
        rows = (
            df.select(F.col(col).cast("double").alias("_v"))
            .mapInPandas(_partition_extremes(k_lo, k_hi),
                         schema="lo array<double>, hi array<double>, n long")
            .collect()
        )
        if not rows:
            return np.array([]), np.array([]), 0
        lo = np.sort(np.concatenate([np.asarray(r["lo"]) for r in rows]))
        hi = np.sort(np.concatenate([np.asarray(r["hi"]) for r in rows]))
        return lo, hi, int(sum(r["n"] for r in rows))

    def _depth_lo(q: float, nn: int) -> int:
        return math.ceil((nn - 1) * q) + 1

    def _depth_hi(q: float, nn: int) -> int:
        return nn - math.floor((nn - 1) * q)

    if n is None:
        # first pass with a generous guess (covers p1/p99 up to ~6.5M rows
        # in one job); deepen only if the guess was shallow, and never past
        # DEEP_CAP — a "tail" quantile whose order statistic is deeper than
        # that (q=0.15 on a huge column) is really a middle quantile and
        # routes to the exact percentile aggregate instead.
        guess = 65536
        k_lo_used = guess if lo_qs else 0
        k_hi_used = guess if hi_qs else 0
        lo_v, hi_v, n = run(k_lo_used, k_hi_used)
    else:
        k_lo_used = k_hi_used = -1  # nothing collected yet
    if n == 0:
        # empty (or all-NULL) column: every quantile is NaN, like Java's
        # Percentile on no data — callers treat NaN cutoffs as "no rows
        # beyond the cutoff" (all NaN comparisons are false in Java)
        out.update({q: float("nan") for q in tails})
        return out
    deep = [q for q in tails
            if (q <= 0.5 and _depth_lo(q, n) > DEEP_CAP)
            or (q > 0.5 and _depth_hi(q, n) > DEEP_CAP)]
    if deep:
        row = df.agg(*[F.expr(f"percentile({col}, {q!r})").alias(f"q{i}")
                       for i, q in enumerate(deep)]).collect()[0]
        out.update({q: float(row[f"q{i}"]) if row[f"q{i}"] is not None
                    else float("nan") for i, q in enumerate(deep)})
        tails = [q for q in tails if q not in deep]
        lo_qs = [q for q in lo_qs if q not in deep]
        hi_qs = [q for q in hi_qs if q not in deep]
        if not tails:
            return out
    need_lo = max((_depth_lo(q, n) for q in lo_qs), default=0)
    need_hi = max((_depth_hi(q, n) for q in hi_qs), default=0)
    # the union-of-per-partition-top-k guarantee requires per-partition
    # depth k ≥ the requested order statistic
    if need_lo > k_lo_used or need_hi > k_hi_used:
        lo_v, hi_v, n = run(need_lo, need_hi)

    for q in tails:
        idx = (n - 1) * q
        lo_i, hi_i = math.floor(idx), math.ceil(idx)
        if q <= 0.5:
            v_lo, v_hi = lo_v[lo_i], lo_v[hi_i]
        else:
            # hi_v holds the k largest in ascending order: global rank r
            # (0-based) maps to hi_v[len(hi_v) - (n - r)]
            v_lo = hi_v[len(hi_v) - (n - lo_i)]
            v_hi = hi_v[len(hi_v) - (n - hi_i)]
        frac = idx - lo_i
        # two-sided weighted form — bit-identical to DuckDB quantile_cont
        # AND Spark percentile (verified in tests/test_operators_misc.py)
        out[q] = float(v_lo) * (1.0 - frac) + float(v_hi) * frac
    return out
