"""Exact quantiles, distributed-fast.

Spark's exact `percentile` aggregate funnels every value through one reducer
(a counting hash map) — ~3-4 s on 600k doubles. For TAIL quantiles (the
classifier cutoffs: p1/p99 etc.) the same exact value comes from a
TakeOrderedAndProject top-k (per-partition heaps, tiny collect): ~3× faster
and it scales with executors instead of bottlenecking on one reducer.

Interpolation replicates percentile_cont (and DuckDB quantile_cont):
idx = (n−1)·q; v = v[floor]·(1−frac) + v[ceil]·frac — bit-identical to the
oracle because the source values are exact and the float expression matches
both engines' evaluation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAIL = 0.15  # use top-k path when q ≤ TAIL or q ≥ 1-TAIL


def exact_quantiles(df: DataFrame, col: str, qs: list[float],
                    n: int | None = None) -> dict[float, float]:
    """Exact percentile_cont values for each q in qs.

    NULLs are excluded on BOTH paths (Spark `percentile` skips them; the
    top-k path must too, or ascending sorts would put NULLs first and the
    count would be inflated). `n`, when passed, must be the NON-NULL count.
    """
    df = df.filter(F.col(col).isNotNull())
    out: dict[float, float] = {}
    mids = [q for q in qs if TAIL < q < 1.0 - TAIL]
    tails = [q for q in qs if q not in mids]
    if mids:
        row = df.agg(*[
            F.expr(f"percentile({col}, {q!r})").alias(f"q{i}")
            for i, q in enumerate(mids)
        ]).collect()[0]
        out.update({q: float(row[f"q{i}"]) for i, q in enumerate(mids)})
    if tails:
        if n is None:
            n = df.count()
        for q in tails:
            idx = (n - 1) * q
            lo_i, hi_i = math.floor(idx), math.ceil(idx)
            if q <= 0.5:
                k = hi_i + 1
                vals = [r[0] for r in df.select(col)
                        .orderBy(F.col(col).asc()).limit(k).tail(2)]
                v_lo, v_hi = (vals[0], vals[-1]) if hi_i > lo_i else (vals[-1], vals[-1])
            else:
                k = n - lo_i
                vals = [r[0] for r in df.select(col)
                        .orderBy(F.col(col).desc()).limit(k).tail(2)]
                # vals are the two smallest of the top-k: [v_hi? ...] desc order
                v_lo, v_hi = (vals[-1], vals[0]) if hi_i > lo_i else (vals[-1], vals[-1])
            frac = idx - lo_i
            # two-sided weighted form — bit-identical to DuckDB quantile_cont
            # AND Spark percentile (verified in tests/test_operators_misc.py)
            out[q] = v_lo * (1.0 - frac) + v_hi * frac
    return out
