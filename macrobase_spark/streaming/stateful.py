"""Custom stateful streaming operator: exponentially-decayed per-itemset
outlier/total counters maintained across micro-batches — the reference's
ExponentiallyDecayingEmergingItemsets (legacy/.../itemset/
ExponentiallyDecayingEmergingItemsets.java:27-188, decay 0.99 per period) as
an `applyInPandasWithState` operator. State per attribute combination is two
floats + a batch counter; each micro-batch decays the counters then adds the
batch's sums, emitting the current decayed ratio. No unbounded state: one
row of state per live key, keys idle past the timeout are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECAY_RATE = 0.99  # per micro-batch, matching the reference's default


def streaming_decayed_diff(
    source: DataFrame,
    attrs: list[str],
    outlier_col: str = "_OUTLIER",
    decay: float = DECAY_RATE,
):
    """Streaming DataFrame → per-key decayed (outlier_count, total_count,
    decayed_ratio) updated each micro-batch. `source` must be a streaming
    DataFrame; combine with `.writeStream` by the caller."""
    import pandas as pd

    key_col = F.concat_ws("", *[F.coalesce(F.col(a), F.lit("∅")) for a in attrs])
    keyed = source.select(
        key_col.alias("key"), F.col(outlier_col).cast("double").alias("_o")
    )

    out_schema = ("key string, outlier_decayed double, total_decayed double, "
                  "ratio double, n_batches int")
    state_schema = "o double, t double, n int"

    def update(key, pdfs, state):
        o, t, n = state.get if state.exists else (0.0, 0.0, 0)
        batch_o = batch_t = 0.0
        for pdf in pdfs:
            batch_o += float(pdf["_o"].sum())
            batch_t += float(len(pdf))
        o = o * decay + batch_o
        t = t * decay + batch_t
        n += 1
        state.update((o, t, n))
        yield pd.DataFrame(
            {"key": [key[0]], "outlier_decayed": [o], "total_decayed": [t],
             "ratio": [o / t if t else 0.0], "n_batches": [n]}
        )

    return keyed.groupBy("key").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )
