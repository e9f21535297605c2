"""Feature transforms / scorers: MAD, z-score, winsorize, bucketize, plus the
reference's two SQL-visible scalar UDFs (normalize, percentile) with
reference-exact semantics.

All are Catalyst column expressions over one or two tiny aggregates — the
per-row path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

MAD_TO_ZSCORE = 1.4826  # consistency constant, legacy/.../stats/MAD.java:21


def mad_score(df: DataFrame, col: str, output_col: str = "_SCORE",
              exact: bool = True) -> DataFrame:
    """Median-absolute-deviation score |x − median| / (MAD·1.4826), with the
    reference's trimmed-mean fallback when MAD == 0.
    Reference: legacy/src/main/java/macrobase/analysis/stats/MAD.java:38-99.

    Two global aggregates (median, then median of |x−median|) + a projection.
    At 100 TB pass exact=False → percentile_approx (no global sort).
    """
    fn = "percentile" if exact else "percentile_approx"
    med = df.agg(F.expr(f"{fn}({col}, 0.5)").alias("m")).collect()[0]["m"]
    dev = df.select(F.abs(F.col(col) - F.lit(med)).alias("d"))
    mad = dev.agg(F.expr(f"{fn}(d, 0.5)").alias("m")).collect()[0]["m"]
    if mad == 0.0:
        # fallback: mean absolute deviation over the middle trimmed band
        lo, hi = dev.agg(
            F.expr(f"{fn}(d, 0.05)"), F.expr(f"{fn}(d, 0.95)")
        ).collect()[0]
        mad = (
            dev.filter((F.col("d") >= lo) & (F.col("d") <= hi))
            .agg(F.avg("d"))
            .collect()[0][0]
        ) or 1e-12
    return df.withColumn(
        output_col, F.abs(F.col(col) - F.lit(med)) / F.lit(mad * MAD_TO_ZSCORE)
    )


def zscore(df: DataFrame, col: str, output_col: str = "_SCORE") -> DataFrame:
    """(x − mean)/std. Reference: legacy/.../stats/ZScore.java."""
    s = df.agg(F.avg(col).alias("m"), F.stddev_pop(col).alias("s")).collect()[0]
    return df.withColumn(output_col, (F.col(col) - F.lit(s["m"])) / F.lit(s["s"]))


def normalize_col(df: DataFrame, col: str, output_col: str | None = None) -> DataFrame:
    """normalize(col): shift-to-positive then divide by (max+offset).
    Reference-exact: lib/.../analysis/MBFunction.java:102-126 (offset =
    −min if min ≤ 0 else 0; norm = max + offset)."""
    s = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    offset = -float(s["lo"]) if float(s["lo"]) <= 0.0 else 0.0
    norm = float(s["hi"]) + offset
    return df.withColumn(output_col or col, (F.col(col) + F.lit(offset)) / F.lit(norm))


def percentile_col(df: DataFrame, col: str, output_col: str | None = None) -> DataFrame:
    """percentile(col): per-value percentile = (1-indexed max rank)/n — the
    max value gets exactly 1.0, ties share the max rank of the tie group.
    Reference-exact: lib/.../analysis/MBFunction.java:139-161 (NOT the same
    as percent_rank, which is (rank−1)/(n−1)).

    Spark plan: `rank` over a descending sort gives, for each tie group,
    n − max_ascending_rank + 1; so max_asc_rank = n − rank_desc + 1.
    Global window = single-partition sort; acceptable for the explanation
    result sizes this is applied to; for raw-table scale use
    (count − rank_desc + 1)/count via a groupBy on the value instead.
    """
    n = df.count()
    w = W.orderBy(F.col(col).desc())
    return df.withColumn(
        output_col or col,
        (F.lit(float(n)) - F.rank().over(w) + 1.0) / F.lit(float(n)),
    )


def winsorize(df: DataFrame, col: str, p: float = 1.0, exact: bool = True,
              output_col: str | None = None) -> DataFrame:
    """Clamp to [percentile(p), percentile(100−p)].
    Reference: legacy/.../stats/Winsorizer.java."""
    fn = "percentile" if exact else "percentile_approx"
    s = df.agg(
        F.expr(f"{fn}({col}, {p / 100.0})").alias("lo"),
        F.expr(f"{fn}({col}, {1 - p / 100.0})").alias("hi"),
    ).collect()[0]
    return df.withColumn(
        output_col or col,
        F.least(F.greatest(F.col(col), F.lit(s["lo"])), F.lit(s["hi"])),
    )


def metric_bucketize(df: DataFrame, col: str, boundaries: list[float] | None = None,
                     pcts: tuple[float, ...] = (10.0, 90.0),
                     output_col: str | None = None) -> DataFrame:
    """Double column → categorical range-label buckets at percentile
    boundaries — makes a metric usable as an explanation attribute.
    Reference: lib/.../transform/MetricBucketTransformer.java:47-92."""
    if boundaries is None:
        qs = [p / 100.0 for p in pcts]
        row = df.agg(*[F.expr(f"percentile({col}, {q})").alias(f"q{i}")
                       for i, q in enumerate(qs)]).collect()[0]
        boundaries = [float(row[f"q{i}"]) for i in range(len(qs))]
    edges = [float("-inf")] + sorted(boundaries) + [float("inf")]
    expr = None
    for i in range(len(edges) - 1):
        label = f"{col}:[{edges[i]:.4g},{edges[i+1]:.4g})"
        cond = (F.col(col) >= F.lit(edges[i])) & (F.col(col) < F.lit(edges[i + 1]))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(output_col or f"{col}_bucket", expr)


def low_metric_transform(df: DataFrame, col: str) -> DataFrame:
    """Reciprocal transform for low-bounded metrics (low values anomalous).
    Reference: legacy/.../transform/LowMetricTransform.java."""
    return df.withColumn(col, F.lit(1.0) / F.col(col))
