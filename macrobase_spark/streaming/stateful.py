"""Custom stateful streaming operator: exponentially-decayed per-itemset
outlier/total counters maintained across micro-batches — the reference's
ExponentiallyDecayingEmergingItemsets (legacy/.../itemset/
ExponentiallyDecayingEmergingItemsets.java:27-188, decay per period) as an
`applyInPandasWithState` operator.

Period semantics: decay periods are EVENT-TIME windows of `period_seconds`
(the reference's time-based decay periods, markPeriod() decaying every
itemset each period). Per key, the state stores its last-updated period
index p; counters are multiplied by decay**(elapsed periods) before new
sums are added — a key idle for N periods carries decay^N, exactly like the
reference's decay-all-itemsets-every-period, NOT a single decay on
reappearance.

Idle keys are ticked by EVENT-TIME timeouts: each key arms a timeout at the
end of its next period; when the watermark passes it, the key decays
(by however many periods actually elapsed) and either re-arms or — once its
decayed total falls below `expire_below` — has its state REMOVED (the
reference prunes low-support itemsets each period, lines 120-139), keeping
state bounded at transcript-scale key cardinality. Event-time timeouts fire
only when the watermark advances (i.e. the stream makes progress), so the
query stays idle with no data — no busy-looping no-data micro-batches,
unlike processing-time timeouts with an ASAP trigger.

Keys are the attribute columns THEMSELVES (multi-column grouping key): no
string concatenation, so ('ab','c') and ('a','bc') can never collide and the
output carries each attribute as its own typed column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECAY_RATE = 0.99  # per period, matching the reference's default


def streaming_decayed_diff(
    source: DataFrame,
    attrs: list[str],
    ts_col: str = "ts",
    outlier_col: str = "_OUTLIER",
    decay: float = DECAY_RATE,
    period_seconds: int = 60,
    watermark: str = "0 seconds",
    expire_below: float = 1e-4,
):
    """Streaming DataFrame → per-key decayed (outlier_decayed, total_decayed,
    ratio, period) in update mode. `source` must be a streaming DataFrame
    with an event-time column; combine with `.writeStream` by the caller."""
    import pandas as pd

    attr_types = {f.name: f.dataType.simpleString() for f in source.schema.fields}
    key_schema = ", ".join(f"{a} {attr_types[a]}" for a in attrs)
    keyed = source.withWatermark(ts_col, watermark).select(
        *attrs, F.col(ts_col).alias("_ts"),
        F.col(outlier_col).cast("double").alias("_o"))

    out_schema = (f"{key_schema}, outlier_decayed double, total_decayed double, "
                  "ratio double, period long")
    state_schema = "o double, t double, p long"
    period_ms = period_seconds * 1000

    def emit(key, o, t, p):
        cols = {a: [key[i]] for i, a in enumerate(attrs)}
        cols.update({"outlier_decayed": [o], "total_decayed": [t],
                     "ratio": [o / t if t else 0.0], "period": [p]})
        return pd.DataFrame(cols)

    def arm(state, p, wm):
        # timeout at the end of the key's next period; must exceed watermark
        state.setTimeoutTimestamp(max((p + 1) * period_ms, wm + period_ms))

    def update(key, pdfs, state):
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            o, t, p = state.get
            p_w = wm // period_ms
            elapsed = max(1, p_w - p)
            o, t = o * decay ** elapsed, t * decay ** elapsed
            if t < expire_below:
                state.remove()
                return
            state.update((o, t, int(p_w)))
            arm(state, int(p_w), wm)
            yield emit(key, o, t, int(p_w))
            return
        o, t, p_prev = state.get if state.exists else (0.0, 0.0, None)
        batch_o = batch_t = 0.0
        max_ts = None
        for pdf in pdfs:
            batch_o += float(pdf["_o"].sum())
            batch_t += float(len(pdf))
            m = pdf["_ts"].max()
            max_ts = m if max_ts is None else max(max_ts, m)
        p_cur = int(max(max_ts.value // 10 ** 6, wm) // period_ms)
        if p_prev is not None:
            elapsed = max(0, p_cur - p_prev)
            o, t = o * decay ** elapsed, t * decay ** elapsed
            p_cur = max(p_cur, p_prev)
        o += batch_o
        t += batch_t
        state.update((o, t, p_cur))
        arm(state, p_cur, wm)
        yield emit(key, o, t, p_cur)

    return keyed.groupBy(*attrs).applyInPandasWithState(
        update, out_schema, state_schema, "update", "EventTimeTimeout"
    )
