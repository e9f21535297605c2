"""Contextual outlier detection (contrib §2.9): find CONTEXTS (attribute
combinations) whose within-context outlier rate — under a per-context robust
scorer — is anomalously high.

Reference shape: contrib/.../contextualoutlier/ContextualOutlierDetector.java
:33-723 (lattice of contexts; run detection within each context). Spark home:
the whole lattice is melted into ONE exploded relation (row × combo), and the
per-context median / MAD / exceed-rate are three grouped passes over it —
the input is scanned a constant number of times regardless of how many
contexts the lattice enumerates (the old shape was 2 shuffles + 2 joins PER
combo: 25 scans / 50 shuffles at max_order 3 over 5 attrs).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# context-key encoding: each attr contributes a SELF-DELIMITING token —
# "V<len>:<value>" for a present value, "-" for an attr outside the combo
# (rows with a NULL in-combo value join no context — the reference encoder
# never emits NULL items). The length prefix makes the concatenation
# injective: no value (separator bytes, sentinel look-alikes) can collide
# two distinct contexts, unlike the previous concat_ws('\x01') scheme.


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
    within-CONTEXT MAD score exceeds score_cutoff. Returns contexts (NULL =
    attr absent from the combo) ordered by within-context outlier rate
    descending. Rows with a NULL value for an IN-combo attribute belong to
    no context of that combo (the reference encoder never emits NULL items
    — same convention as diff()), which also keeps output rows unambiguous:
    a (A=x, B=NULL) row can only mean "context A=x at order 1", never a
    genuine NULL-valued order-2 context.

    Plan: one explode melts each row into (combo_id, context-key, metric) —
    |combos| rows per input row, ONE scan — then exactly three grouped
    passes: (1) per-context median + size, (2) per-context MAD, (3)
    per-context exceed counts. The two stat relations are context-sized and
    broadcast back. Everything JVM-side; job count is constant in |combos|.
    """
    combos: list[tuple[str, ...]] = []
    for k in range(1, min(max_order, len(attrs)) + 1):
        combos.extend(combinations(attrs, k))

    # melt: one struct per combo carrying (combo id, output attr columns —
    # NULL for attrs outside the combo — a validity flag that drops rows
    # with NULL in-combo values, and a positional join key; see the
    # encoding note above for why it cannot collide)
    ctx_structs = []
    for cid, combo in enumerate(combos):
        fields = [F.lit(cid).alias("_cid")]
        key_parts = []
        valid = F.lit(True)
        for a in attrs:
            if a in combo:
                col = F.col(a).cast("string")
                fields.append(col.alias(a))
                valid = valid & col.isNotNull()
                key_parts.append(
                    F.concat(F.lit("V"), F.length(col), F.lit(":"), col))
            else:
                fields.append(F.lit(None).cast("string").alias(a))
                key_parts.append(F.lit("-"))
        fields.append(F.concat(*key_parts).alias("_ckey"))
        fields.append(valid.alias("_ok"))
        ctx_structs.append(F.struct(*fields))

    exploded = (
        df.select(F.col(metric).alias("_m"),
                  F.explode(F.array(*ctx_structs)).alias("_ctx"))
        .filter(F.col("_ctx._ok"))
        .select("_ctx.*", "_m")
        .drop("_ok")
    )

    # exact grouped percentile for oracle parity; percentile_approx for the
    # 100 TB path (contexts with huge membership)
    pct = "percentile" if exact else "percentile_approx"
    med = (
        exploded.groupBy("_cid", "_ckey")
        .agg(F.expr(f"{pct}(_m, 0.5)").alias("_med"),
             F.count("*").alias("_csize"))
        .filter(F.col("_csize") >= min_context_size)
        .select("_cid", "_ckey", "_med")
    )
    j = exploded.join(F.broadcast(med), ["_cid", "_ckey"])
    mad = j.groupBy("_cid", "_ckey").agg(
        F.expr(f"{pct}(abs(_m - _med), 0.5)").alias("_mad"))
    scored = j.join(F.broadcast(mad), ["_cid", "_ckey"]).withColumn(
        "_exceed",
        F.when(
            F.abs(F.col("_m") - F.col("_med"))
            / (F.when(F.col("_mad") > 0, F.col("_mad")).otherwise(1e-12) * 1.4826)
            > score_cutoff, 1.0).otherwise(0.0),
    )
    agg = scored.groupBy("_cid", "_ckey", *attrs).agg(
        F.sum("_exceed").alias("outlier_count"),
        F.count("*").alias("context_size"),
    )
    return (
        agg.select(*attrs, "outlier_count", "context_size")
        .withColumn("outlier_rate",
                    F.col("outlier_count") / F.col("context_size"))
        .orderBy(F.col("outlier_rate").desc(),
                 *[F.col(a).asc_nulls_last() for a in attrs])
    )
