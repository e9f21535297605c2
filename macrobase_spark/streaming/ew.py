"""Exponentially-weighted (EW) streaming operators — the v0 streaming
engine's decayed-state semantics re-expressed as decay-weighted batch
recomputation (documented semantic-equivalent: the reference maintains a
damped reservoir and periodically retrains; we recompute the decayed
statistic per pane over the retained window — same fixpoint, deterministic,
shuffle-parallel).

Reference:
- EWAppxPercentileOutlierClassifier (legacy/.../classify/
  EWAppxPercentileOutlierClassifier.java:46-120): exponentially-damped
  reservoir of scores; periodic percentile-threshold refresh.
- ExponentiallyDecayingEmergingItemsets (legacy/.../itemset/
  ExponentiallyDecayingEmergingItemsets.java:27-188): decay 0.99 per period.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# Pane summary grid: 21 uniform quantile points PLUS tail refinements, each
# carrying the weight of its band (trapezoid: (next - prev)/2, half-bands at
# the edges; bands sum to exactly 1). A uniform n/|grid| weighting cannot
# resolve tail percentiles: with 21 points the top point alone carries
# ~4.76% of a pane's weight, so the DEFAULT percentile=99 cutoff collapsed
# to the pane max and flagged nothing (r4 review). Exposed as module
# constants so the DuckDB oracle mirrors them verbatim.
EW_GRID_QS: list[float] = sorted(
    set([i / 20.0 for i in range(21)]
        + [0.96, 0.97, 0.98, 0.99, 0.995, 0.999]))
EW_GRID_BANDS: list[float] = [
    ((EW_GRID_QS[min(i + 1, len(EW_GRID_QS) - 1)]
      - EW_GRID_QS[max(i - 1, 0)]) / 2.0)
    for i in range(len(EW_GRID_QS))
]


def ew_percentile_classify(
    df: DataFrame,
    ts_col: str,
    metric: str,
    percentile: float = 99.0,
    pane: str = "1 hour",
    half_life_panes: float = 4.0,
    output_col: str = "_OUTLIER",
    exact: bool = False,
) -> DataFrame:
    """Per-pane decayed percentile threshold: for each time pane, the cutoff
    is the decay-weighted percentile of THIS and all PRIOR panes' metric
    values (weight = 0.5^(age/half_life)); rows above their pane's cutoff are
    outliers.

    Implementation: pane summaries (per-pane metric histogram via exact
    per-pane quantile grid) → cumulative decayed weighted percentile by
    window over pane sequence → broadcast cutoffs back. One shuffle on pane,
    one on (pane grid); no unbounded state.
    """
    base = df.withColumn("_pane", F.window(F.col(ts_col), pane).start)

    # per-pane quantile grid (EW_GRID_QS, band-weighted) — a compact
    # mergeable summary. exact=True swaps the t-digest sketch for the exact
    # interpolated percentile (oracle parity / small panes); the default
    # stays sketch-based for the scale path.
    qs = EW_GRID_QS
    mq = "`" + metric.replace("`", "``") + "`"
    qfn = "percentile({m}, {q!r})" if exact else "percentile_approx({m}, {q!r}, 2000)"
    pane_q = base.groupBy("_pane").agg(
        F.count("*").alias("_n"),
        *[F.expr(qfn.format(m=mq, q=q)).alias(f"_q{i}")
          for i, q in enumerate(qs)],
    )
    # decayed weighted percentile across panes, evaluated per target pane:
    # explode grid points, weight by pane count × band × decay^(age), take
    # the smallest grid value whose cumulative weight ≥ p% of the total.
    grid = pane_q.select(
        "_pane", "_n",
        F.explode(F.array(*[
            F.struct(F.col(f"_q{i}").alias("v"),
                     F.lit(EW_GRID_BANDS[i]).alias("b"))
            for i in range(len(qs))])).alias("_g"),
    ).select("_pane", "_n", F.col("_g.v").alias("_v"),
             F.col("_g.b").alias("_b"))
    panes = [r["_pane"] for r in pane_q.select("_pane")
             .orderBy("_pane").collect()]
    spark = df.sparkSession
    pane_idx = spark.createDataFrame(
        [(p, i) for i, p in enumerate(panes)], "pane timestamp, idx int")
    g = grid.join(F.broadcast(pane_idx), grid["_pane"] == pane_idx["pane"]).drop("pane")
    t = pane_idx.select(F.col("pane").alias("_tpane"), F.col("idx").alias("_tidx"))
    # pair every target pane with all source panes ≤ target (small: P² rows)
    pairs = g.join(F.broadcast(t), g["idx"] <= t["_tidx"])
    decay = F.pow(F.lit(0.5), (F.col("_tidx") - F.col("idx")) / F.lit(half_life_panes))
    weighted = pairs.select("_tpane", "_v",
                            (decay * F.col("_n") * F.col("_b")).alias("_w"))
    w_cum = (
        W.partitionBy("_tpane").orderBy(F.col("_v").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    totals = weighted.groupBy("_tpane").agg(F.sum("_w").alias("_tw"))
    ranked = (
        weighted.withColumn("_cw", F.sum("_w").over(w_cum))
        .join(F.broadcast(totals), "_tpane")
        .filter(F.col("_cw") >= (1.0 - percentile / 100.0) * F.col("_tw"))
        .groupBy("_tpane").agg(F.max("_v").alias("_cutoff"))
    )
    return (
        base.join(F.broadcast(ranked), base["_pane"] == ranked["_tpane"], "left")
        .withColumn(output_col,
                    F.when(F.col(metric) > F.col("_cutoff"), 1.0).otherwise(0.0))
        .drop("_tpane", "_cutoff")
    )
