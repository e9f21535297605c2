"""FP-Growth-based emerging-itemset summarizer — the reference's alternative
DIFF kernel (same output contract as the APriori path).

Reference: lib/.../summary/fpg/FPGrowthSummarizer.java:44-80 and
FPGrowthEmerging.java:20-183 (mine frequent itemsets among OUTLIER
transactions, then re-check risk ratio of each itemset against the inlier
population). Spark home: pyspark.ml.fpm.FPGrowth (distributed PFP) for the
mining step; the ratio re-check is a join + column expressions.

Use when attribute cardinality is too high for grouping-sets enumeration
(diff() is preferred otherwise — one shuffle, no ML stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fpgrowth_diff(
    df: DataFrame,
    attrs: list[str],
    outlier_col: str = "_OUTLIER",
    min_support: float = 0.2,
    min_risk_ratio: float = 1.5,
    max_order: int = 3,
) -> DataFrame:
    """Explanation via FP-Growth over outlier transactions.

    Returns (items array<string> of 'col=value', support, risk_ratio,
    outlier_count, total_count)."""
    from pyspark.ml.fpm import FPGrowth

    items = F.array(*[
        F.when(F.col(a).isNotNull(), F.concat(F.lit(f"{a}="), F.col(a))) for a in attrs
    ])
    items = F.filter(items, lambda x: x.isNotNull())
    tx = df.select(items.alias("items"), F.col(outlier_col).cast("double").alias("_o"))
    g = tx.agg(F.sum("_o").alias("o"), F.count("*").alias("t")).collect()[0]
    if g["o"] is None or float(g["o"]) == 0.0:
        # empty input or zero outliers: same contract as diff()
        raise ValueError("no outliers — nothing to explain")
    g_out, g_tot = float(g["o"]), float(g["t"])

    outliers = tx.filter(F.col("_o") > 0).select("items")
    fp = FPGrowth(itemsCol="items", minSupport=min_support, minConfidence=0.0)
    model = fp.fit(outliers)
    itemsets = (
        model.freqItemsets
        .filter(F.size("items") <= max_order)
        .withColumnRenamed("freq", "outlier_count")
    )

    # risk-ratio re-check: count total occurrences of each itemset (outlier +
    # inlier) via a subset-containment join against the full transaction set.
    # Itemset list is small post-mining → broadcast.
    tot = (
        tx.join(F.broadcast(itemsets.select(F.col("items").alias("_iset"))),
                F.expr("size(array_except(_iset, items)) = 0"))
        .groupBy("_iset")
        .agg(F.count("*").alias("total_count"))
        .withColumnRenamed("_iset", "items")
    )
    joined = itemsets.join(tot, "items")
    oc = F.col("outlier_count").cast("double")
    tc = F.col("total_count").cast("double")
    unexposed_out = F.lit(g_out) - oc
    total_minus_exposed = F.lit(g_tot) - tc
    rr = (
        F.when(tc == 0, 0.0)
        .when(total_minus_exposed == 0, 0.0)
        .when(unexposed_out == 0, float("inf"))
        .otherwise((oc / tc) / (unexposed_out / total_minus_exposed))
    )
    return (
        joined.withColumn("support", oc / F.lit(g_out))
        .withColumn("risk_ratio", rr)
        .filter(F.col("risk_ratio") >= min_risk_ratio)
        .select(F.array_sort("items").alias("items"), "support", "risk_ratio",
                "outlier_count", "total_count")
        .orderBy(F.col("risk_ratio").desc(), F.col("items").asc())
    )
