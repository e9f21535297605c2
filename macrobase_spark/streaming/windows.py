"""Windowed / streaming operators.

Reference semantics:
- WindowedOperator (lib/.../operator/WindowedOperator.java:47-102): time-based
  sliding window of panes over an incremental operator, in-order arrival.
  Spark home: `F.window(ts, windowLength, slideLength)` groupBy — recompute
  per window beats the reference's incremental pane bookkeeping at scale
  (partial aggregation makes each pane a map-side combine).
- MovingAverage (lib/.../summary/MovingAverage.java:9-50): range-frame window
  aggregate.
- IncrementalSummarizer (lib/.../fpg/IncrementalSummarizer.java:23-399):
  pane-based streaming DIFF → windowed grouping-sets aggregation.
- EW streaming pipeline (legacy/.../BasicOneShotEWStreamingPipeline.java:37-82):
  Structured Streaming micro-batches; exponential decay ≈ periodic recompute
  over a decay-weighted window (documented as semantically-equivalent,
  not bit-identical).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def moving_average(df: DataFrame, ts_col: str, value_col: str,
                   window_seconds: int, output_col: str = "moving_avg",
                   partition_by: list[str] | None = None) -> DataFrame:
    """Trailing time-range moving average (reference MovingAverage pane avg).

    `partition_by` names the series keys (sensor id, user id, …): each series
    sorts independently, so the plan scales with the number of series. A
    global average (partition_by=None) funnels every row through ONE task —
    only acceptable on explanation-size relations; at raw-table scale always
    pass the series keys (or pre-aggregate to panes and average the pane
    series, which is the reference's own pane semantics)."""
    w = W.partitionBy(*partition_by) if partition_by else W.partitionBy()
    # NTZ timestamps need the LTZ hop before the epoch-seconds cast
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = w.orderBy(sec).rangeBetween(-window_seconds, 0)
    return df.withColumn(output_col, F.avg(value_col).over(w))


def windowed_diff(
    df: DataFrame,
    ts_col: str,
    attrs: list[str],
    outlier_col: str = "_OUTLIER",
    window_length: str = "1 hour",
    slide_length: str | None = None,
    min_support: float = 0.2,
    min_ratio: float = 1.5,
    max_order: int = 2,
) -> DataFrame:
    """Sliding-window DIFF: per (window, combo) outlier/total counts with
    per-window global rates; returns explanation rows per window.

    One shuffle: groupBy(window × grouping-set combos) with map-side combine;
    the per-window globals come from the order-0 grouping set in the same
    pass (no second scan)."""
    slide = slide_length or window_length
    combos: list[tuple[str, ...]] = [()]  # () = per-window global aggregates
    for k in range(1, min(max_order, len(attrs)) + 1):
        combos.extend(combinations(attrs, k))
    from macrobase_spark.operators.diff import _bt, _sql_over_view

    sets_sql = ", ".join(
        "(" + ", ".join(("_w",) + tuple(_bt(a) for a in c)) + ")"
        for c in combos
    )
    base = df.select(
        F.window(F.col(ts_col), window_length, slide).alias("_w"),
        *[F.col(a) for a in attrs],
        F.col(outlier_col).cast("double").alias("_o"),
    )
    attr_list = ", ".join(_bt(a) for a in attrs)
    grouped = _sql_over_view(base, "wdiff", lambda view: f"""
        SELECT _w, {attr_list},
               sum(_o) AS outlier_count,
               count(*) AS total_count,
               grouping_id(_w, {attr_list}) AS _gid
        FROM {view}
        GROUP BY GROUPING SETS ({sets_sql})
        """)
    # _w is in every grouping set (MSB always 0) → attrs-all-absent mask:
    all_absent = (1 << len(attrs)) - 1
    globals_df = grouped.filter(F.col("_gid") == all_absent).select(
        F.col("_w").alias("_gw"),
        F.col("outlier_count").alias("_g_out"),
        F.col("total_count").alias("_g_tot"),
    )
    # same grouping-id discipline as the batch diff() (operators/diff.py):
    # a NULL attr must mean "grouped out of this set", never a genuine NULL
    # data value — otherwise (a=x) rows and (a=x, b=NULL-data) rows are
    # indistinguishable in the output and NULL items leak as explanations
    present_cond = F.lit(True)
    for i, a in enumerate(attrs):
        is_grouped = (F.shiftright("_gid", len(attrs) - 1 - i)
                      .bitwiseAND(F.lit(1)) == 0)
        present_cond = present_cond & F.when(
            is_grouped, F.col(a).isNotNull()).otherwise(F.col(a).isNull())
    per_combo = grouped.filter((F.col("_gid") != all_absent) & present_cond)
    joined = per_combo.join(globals_df, per_combo["_w"] == globals_df["_gw"]).drop("_gw")
    oc, tc = F.col("outlier_count"), F.col("total_count")
    # a window pane with ZERO outliers has _g_out = 0: the reference's Java
    # doubles make oc/0.0 NaN (every combo dropped — the pane simply emits
    # no explanations); ANSI Spark would error on the division, so
    # try_divide reproduces the drop via NULL thresholds
    support = F.try_divide(oc, F.col("_g_out"))
    global_ratio = F.try_divide(
        oc / tc, F.try_divide(F.col("_g_out"), F.col("_g_tot")))
    return (
        joined.withColumn("support", support)
        .withColumn("global_ratio", global_ratio)
        .filter((F.col("support") >= min_support) & (F.col("global_ratio") >= min_ratio))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *attrs, "support", "global_ratio", "outlier_count", "total_count",
        )
        .orderBy("window_start", F.col("global_ratio").desc())
    )


def streaming_windowed_counts(
    source_df: DataFrame, ts_col: str, attrs: list[str],
    window_length: str = "5 minutes", watermark: str = "1 minute",
):
    """Structured Streaming demo of the windowed pipeline: tumbling-window
    counts per attribute combo with a watermark for late data (the reference
    assumes in-order arrival — WindowedOperator.java:84; the watermark is the
    Spark-native generalization)."""
    return (
        source_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_length), *attrs)
        .agg(F.count("*").alias("n"))
    )
