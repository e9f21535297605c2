"""Contextual outlier detection (contrib §2.9): find CONTEXTS (attribute
combinations) whose within-context outlier rate — under a per-context robust
scorer — is anomalously high.

Reference shape: contrib/.../contextualoutlier/ContextualOutlierDetector.java
:33-723 (lattice of contexts; run detection within each context). Spark home:
the context lattice is a grouping-sets enumeration; the per-context scorer is
a grouped robust statistic (per-context median/MAD via grouped percentile) —
no per-context Python, one shuffle for stats + one broadcast join back.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contextual_mad_outliers(
    df: DataFrame,
    attrs: list[str],
    metric: str,
    score_cutoff: float = 3.0,
    min_context_size: int = 30,
    max_order: int = 2,
    exact: bool = True,
) -> DataFrame:
    """For every context (attr combo ≤ max_order): rate of rows whose
    within-CONTEXT MAD score exceeds score_cutoff, vs the global rate.
    Returns contexts ordered by rate ratio.

    Plan: per-context median via grouped percentile (one shuffle), join back
    (broadcast: #contexts ≪ rows), per-context MAD likewise, then one
    grouping-sets style aggregation of exceed counts. Everything JVM-side.
    """
    combos: list[tuple[str, ...]] = []
    for k in range(1, min(max_order, len(attrs)) + 1):
        combos.extend(combinations(attrs, k))

    # exact grouped percentile for oracle parity; percentile_approx for the
    # 100 TB path (contexts with huge membership)
    pct = "percentile" if exact else "percentile_approx"
    results = None
    for combo in combos:
        keys = list(combo)
        med = df.groupBy(*keys).agg(
            F.expr(f"{pct}({metric}, 0.5)").alias("_med"),
            F.count("*").alias("_csize"),
        ).filter(F.col("_csize") >= min_context_size)
        j = df.join(F.broadcast(med), keys)
        mad = j.groupBy(*keys).agg(
            F.expr(f"{pct}(abs({metric} - _med), 0.5)").alias("_mad"))
        scored = j.join(F.broadcast(mad), keys).withColumn(
            "_exceed",
            F.when(
                F.abs(F.col(metric) - F.col("_med"))
                / (F.when(F.col("_mad") > 0, F.col("_mad")).otherwise(1e-12) * 1.4826)
                > score_cutoff, 1.0).otherwise(0.0),
        )
        agg = scored.groupBy(*keys).agg(
            F.sum("_exceed").alias("outlier_count"),
            F.count("*").alias("context_size"),
        )
        row = agg.select(
            *[F.col(a) if a in keys else F.lit(None).cast("string").alias(a)
              for a in attrs],
            "outlier_count", "context_size",
        )
        results = row if results is None else results.unionByName(row)

    return (
        results.withColumn("outlier_rate",
                           F.col("outlier_count") / F.col("context_size"))
        .orderBy(F.col("outlier_rate").desc(),
                 *[F.col(a).asc_nulls_last() for a in attrs])
    )
