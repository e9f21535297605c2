"""Classifiers: per-row scoring → `_OUTLIER` column (1.0/0.0, or expected
outlier counts for pre-aggregated "cubed" input).

Semantics from the reference (citations per operator); execution is pure
Catalyst column expressions — the cutoff computation is one tiny aggregate
(percentile over the metric column), the labeling is a `when()` projection
that stays inside whole-stage codegen. No Python in the row path.
"""

from __future__ import annotations

import operator as _op

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OUTLIER_COL = "_OUTLIER"

_PREDICATES = {
    "==": _op.eq, "=": _op.eq, "!=": _op.ne, "<>": _op.ne,
    "<": _op.lt, ">": _op.gt, "<=": _op.le, ">=": _op.ge,
}


def _percentile(df: DataFrame, col: str, q: float, exact: bool) -> Column:
    # exact percentile matches commons-math Percentile (linear interpolation,
    # R-6/EXC variant differences are negligible vs R-7 at our pcts; Spark's
    # `percentile` = SQL exact percentile_cont semantics). At 100 TB use
    # exact=False → percentile_approx (t-digest, no global sort).
    fn = "percentile" if exact else "percentile_approx"
    return F.expr(f"{fn}({col}, {q!r})")


def classify_percentile(
    df: DataFrame,
    metric: str,
    percentile: float = 0.5,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
    exact: bool = True,
) -> DataFrame:
    """Two-sided percentile classifier.

    Reference: lib/.../classify/PercentileClassifier.java:27-47 — cutoffs at
    percentile(p) / percentile(100-p); outlier iff strictly beyond a cutoff
    on an included side.

    Exact tail cutoffs use distributed top-k (operators/quantiles.py) rather
    than the single-reducer percentile aggregate; exact=False switches to
    percentile_approx for the 100 TB path.
    """
    if exact:
        from macrobase_spark.operators.quantiles import exact_quantiles

        q = exact_quantiles(df, metric,
                            [percentile / 100.0, 1.0 - percentile / 100.0])
        lo, hi = q[percentile / 100.0], q[1.0 - percentile / 100.0]
    else:
        cuts = df.agg(
            _percentile(df, metric, percentile / 100.0, exact).alias("lo"),
            _percentile(df, metric, 1.0 - percentile / 100.0, exact).alias("hi"),
        ).collect()[0]
        lo = float(cuts["lo"]) if cuts["lo"] is not None else float("nan")
        hi = float(cuts["hi"]) if cuts["hi"] is not None else float("nan")
    import math as _math

    if _math.isnan(lo) or _math.isnan(hi):
        # empty / all-NULL metric: Java comparisons with NaN cutoffs are all
        # false -> nothing is an outlier (Spark would instead treat NaN as
        # the largest double and mis-label every row on the low side)
        return df.withColumn(output_col, F.lit(0.0))
    from pyspark.sql.types import DoubleType, FloatType

    # NaN metric VALUES: Java's `NaN > hi` is false (inlier); Spark's total
    # order makes NaN the largest double, which would label every NaN row
    # an outlier on the high side — mask them explicitly
    is_float = isinstance(df.schema[metric].dataType, (DoubleType, FloatType))
    not_nan = ~F.isnan(F.col(metric)) if is_float else F.lit(True)
    cond = F.lit(False)
    if include_high:
        cond = cond | ((F.col(metric) > F.lit(hi)) & not_nan)
    if include_low:
        cond = cond | (F.col(metric) < F.lit(lo))
    return df.withColumn(output_col, F.when(cond, 1.0).otherwise(0.0))


def classify_predicate(
    df: DataFrame,
    metric: str,
    predicate: str = "==",
    sentinel: float | str = 1.0,
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Predicate classifier (==, !=, <, >, <=, >= vs a sentinel; double or
    string column). Reference: lib/.../classify/PredicateClassifier.java:65-107."""
    cond = _PREDICATES[predicate](F.col(metric), F.lit(sentinel))
    return df.withColumn(output_col, F.when(cond, 1.0).otherwise(0.0))


def classify_count_mean_shift(
    df: DataFrame,
    metric: str,
    mean_col: str,
    predicate: str = "==",
    sentinel: float | str = 1.0,
    count_col: str | None = None,
) -> DataFrame:
    """Split rows into outlier/inlier by predicate on `metric`; emit the four
    sufficient-statistic columns consumed by the count-mean-shift summarizer.
    Reference: lib/.../classify/CountMeanShiftClassifier.java:68-100 (cubed
    variant weights by `count_col`, CountMeanShiftCubedClassifier.java)."""
    cond = _PREDICATES[predicate](F.col(metric), F.lit(sentinel))
    w = F.col(count_col) if count_col else F.lit(1.0)
    return (
        df.withColumn("_OUTLIERCOUNT", F.when(cond, w).otherwise(0.0))
        .withColumn("_INLIERCOUNT", F.when(~cond, w).otherwise(0.0))
        .withColumn("_OUTLIERMEANSUM", F.when(cond, F.col(mean_col) * w).otherwise(0.0))
        .withColumn("_INLIERMEANSUM", F.when(~cond, F.col(mean_col) * w).otherwise(0.0))
    )


def classify_arithmetic_cubed(
    df: DataFrame,
    count_col: str = "count",
    mean_col: str = "mean",
    std_col: str = "std",
    percentile: float = 1.0,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Cubed-input classifier: global weighted-percentile cutoffs over group
    means, then per-group expected #outliers via normal-CDF tails.

    Reference: lib/.../classify/ArithmeticClassifier.java:35-75;
    WeightedPercentile.java:25-47 (cutoff = smallest value whose cumulative
    weight reaches p% of total, scanning from the top); NormalDist.cdf.

    Spark plan: one window cumulative-sum over means (tiny: #groups rows),
    then a codegen'd erf-based CDF projection. No Python.
    """
    from pyspark.sql import Window as W

    total = df.agg(F.sum(count_col).alias("t")).collect()[0]["t"]
    if total is None:  # empty / all-NULL cube input
        return df.withColumn(output_col, F.lit(0.0))
    w_desc = W.orderBy(F.col(mean_col).desc()).rowsBetween(W.unboundedPreceding, 0)
    cum = df.select(mean_col, F.sum(count_col).over(w_desc).alias("cw"))
    hi_rank = (1.0 - (100.0 - percentile) / 100.0) * total  # weight from top
    lo_rank = (1.0 - percentile / 100.0) * total
    hi = cum.filter(F.col("cw") >= hi_rank).agg(F.max(mean_col)).collect()[0][0]
    lo = cum.filter(F.col("cw") >= lo_rank).agg(F.max(mean_col)).collect()[0][0]

    def cdf(x: Column, mu: Column, sigma: Column) -> Column:
        z = (x - mu) / (sigma * F.lit(2.0 ** 0.5))
        return (F.lit(1.0) + _erf(z)) / F.lit(2.0)

    mu, sg, cnt = F.col(mean_col), F.col(std_col), F.col(count_col)
    n_out = F.lit(0.0)
    if include_high:
        n_out = n_out + (F.lit(1.0) - cdf(F.lit(float(hi)), mu, sg)) * cnt
    if include_low:
        n_out = n_out + cdf(F.lit(float(lo)), mu, sg) * cnt
    # degenerate groups (one metric, or all equal): std is 0/NaN and the
    # normal CDF is undefined (ANSI Spark would error on the division).
    # Replicated EXACTLY from ArithmeticClassifier.java:53-59 — including
    # the reference's quirk of testing the includeLow branch against
    # highCutoff (not lowCutoff): all-or-nothing outliers by mean position.
    degenerate = sg.isNull() | F.isnan(sg) | (sg == 0)
    deg_out = F.when(
        (F.lit(include_high) & (mu > F.lit(float(hi))))
        | (F.lit(include_low) & (mu < F.lit(float(hi)))), cnt).otherwise(0.0)
    return df.withColumn(
        output_col,
        F.when(degenerate, deg_out).otherwise(F.least(n_out, cnt)))


def _erf(z: Column) -> Column:
    """Abramowitz–Stegun 7.1.26 erf approximation as a codegen'd expression
    (|err| ≤ 1.5e-7); sign-symmetric."""
    sign = F.when(z < 0, -1.0).otherwise(1.0)
    x = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    return sign * (F.lit(1.0) - poly * F.exp(-x * x))


def classify_quantile_cubed(
    df: DataFrame,
    count_col: str,
    quantile_cols: dict[float, str],
    percentile: float = 1.0,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Cubed-input quantile classifier: each group carries quantile columns
    (e.g. {0.0:'min', 0.5:'median', 1.0:'max'}); estimate the fraction of
    each group beyond globally-computed cutoffs by linear interpolation of
    the group's quantile curve.

    Reference: lib/.../classify/QuantileClassifier.java:42-95 +
    LinearInterpolator.java:1-48 (piecewise-linear inverse CDF). Global
    cutoffs use the weighted percentile of group quantile points (same
    approach as the reference's flattened weighted percentile). The
    interpolation is a codegen'd piecewise `when` chain — no Python.
    """
    from pyspark.sql import Window as W

    qs = sorted(quantile_cols.items())
    # global cutoffs: weighted percentile over all (quantile value, weight)
    # points, weight = group count × quantile band width
    pts = None
    for i, (q, c) in enumerate(qs):
        band = (
            (qs[min(i + 1, len(qs) - 1)][0] - qs[max(i - 1, 0)][0]) / 2.0
        ) or 1.0 / len(qs)
        p = df.select(F.col(c).alias("v"), (F.col(count_col) * band).alias("w"))
        pts = p if pts is None else pts.unionByName(p)
    total = pts.agg(F.sum("w")).collect()[0][0]
    if total is None:  # empty cube input
        return df.withColumn(output_col, F.lit(0.0))
    w_desc = W.orderBy(F.col("v").desc()).rowsBetween(W.unboundedPreceding, 0)
    cum = pts.select("v", F.sum("w").over(w_desc).alias("cw"))
    hi_rank = (percentile / 100.0) * total
    lo_rank = (1.0 - percentile / 100.0) * total
    hi = cum.filter(F.col("cw") >= hi_rank).agg(F.max("v")).collect()[0][0]
    lo = cum.filter(F.col("cw") >= lo_rank).agg(F.max("v")).collect()[0][0]

    def frac_beyond(cut: float, above: bool):
        """Piecewise-linear estimate of the fraction of the group beyond cut."""
        expr = None
        # below first point / above last point
        first_q, first_c = qs[0]
        last_q, last_c = qs[-1]
        segs = []
        for (q1, c1), (q2, c2) in zip(qs, qs[1:]):
            # fraction at cut within segment [c1, c2] → q1 + (q2-q1)*t;
            # a FLAT segment (c1 == c2 == cut) has no interior — take the
            # segment's upper fraction (t=1). An unguarded division would
            # be NULL (non-ANSI) or error (ANSI), and F.least() SKIPS
            # nulls, silently counting the whole group as outliers.
            t = F.when(F.col(c2) != F.col(c1),
                       (F.lit(cut) - F.col(c1)) / (F.col(c2) - F.col(c1))
                       ).otherwise(F.lit(1.0))
            frac = F.lit(q1) + (F.lit(q2) - F.lit(q1)) * t
            segs.append(((F.col(c1) <= cut) & (F.col(c2) >= cut), frac))
        # NULL quantile columns: no curve to interpolate — contribute zero
        # expected outliers on either side (cdf pinned so 1-cdf or cdf = 0)
        cdf = F.when(F.col(first_c).isNull(), F.lit(1.0 if above else 0.0))
        cdf = cdf.when(F.col(first_c) > cut, F.lit(0.0))
        for cond, frac in segs:
            cdf = cdf.when(cond, frac)
        cdf = cdf.otherwise(F.when(F.col(last_c) < cut, F.lit(1.0)).otherwise(F.lit(1.0)))
        return (F.lit(1.0) - cdf) if above else cdf

    n_out = F.lit(0.0)
    if include_high and hi is not None:
        n_out = n_out + frac_beyond(float(hi), True) * F.col(count_col)
    if include_low and lo is not None:
        n_out = n_out + frac_beyond(float(lo), False) * F.col(count_col)
    return df.withColumn(output_col, F.least(n_out, F.col(count_col).cast("double")))


def classify_raw(df: DataFrame, outlier_col: str, output_col: str = OUTLIER_COL) -> DataFrame:
    """Pass-through classifier: outlier count column already present (cubed
    data). Reference: lib/.../classify/RawClassifier.java:17-24."""
    return df.withColumn(output_col, F.col(outlier_col).cast("double"))
