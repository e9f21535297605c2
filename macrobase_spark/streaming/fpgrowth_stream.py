"""StreamingFPGrowth: incremental decayed FP-tree maintenance across
micro-batches — the reference's StreamingFPGrowth
(legacy/.../itemset/StreamingFPGrowth.java:18-746: insert transactions into
a persistent FP-tree, decay all node weights per period, prune infrequent
items, mine on demand) as a DISTRIBUTED stateful streaming operator.

Spark split (PFP sharding, Li et al. 2008 "PFP: Parallel FP-Growth"):
a single shared tree can't live across executors, so the itemset space is
partitioned by the OWNING GROUP of each itemset's last item (in a fixed
canonical item order): group(item) = hash(item) mod G. Each transaction is
projected, per group g it touches, to its prefix up to the last g-owned
item; group g's decayed FP-tree then mines exactly the itemsets whose last
item is owned by g — disjoint across groups, complete over their union.
State per group = one pickled tree, kept bounded by the same
below-threshold pruning the reference applies (deleteItems, :323-346).

Deviations from the reference (documented):
- item order is canonical lexicographic, not frequency-descending; the
  frequency order is a tree-compression heuristic, not a correctness
  requirement, and a fixed order keeps incremental state deterministic
  (no restructureTree pass — the reference needs one precisely because its
  order drifts, :22,28).
- decay is per event-time period like streaming/stateful.py (the reference
  decays on markPeriod() calls).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pure-python decayed FP-tree (one per group; lives in stream state)
# node := {item: [count, children_dict]}


def tree_insert(tree: dict, items: tuple[str, ...] | list[str],
                w: float = 1.0) -> None:
    cur = tree
    for it in items:
        node = cur.get(it)
        if node is None:
            node = cur[it] = [0.0, {}]
        node[0] += w
        cur = node[1]


def tree_decay(tree: dict, factor: float) -> None:
    """decayWeights (StreamingFPGrowth.java:65-79): every node count decays."""
    for it in tree:
        tree[it][0] *= factor
        tree_decay(tree[it][1], factor)


def tree_prune(tree: dict, eps: float) -> None:
    """deleteItems analogue: drop subtrees whose count decayed below eps —
    this is what keeps per-group state bounded forever."""
    for it in list(tree):
        if tree[it][0] < eps:
            del tree[it]
        else:
            tree_prune(tree[it][1], eps)


def tree_weighted_paths(tree: dict, prefix: tuple = ()) -> list[tuple[tuple, float]]:
    """The tree as weighted transactions: each node contributes its OWN
    weight (count minus children sum) at its root-to-node path."""
    out = []
    for it, (c, ch) in tree.items():
        p = prefix + (it,)
        own = c - sum(v[0] for v in ch.values())
        if own > 1e-12:
            out.append((p, own))
        out.extend(tree_weighted_paths(ch, p))
    return out


def mine_paths(paths: list[tuple[tuple, float]], min_count: float,
               owned: set[str] | None = None) -> dict[tuple, float]:
    """FP-growth over weighted ordered transactions: all itemsets with
    decayed support ≥ min_count. With `owned`, only itemsets whose LAST
    item (in the canonical order) is owned — the PFP shard restriction."""
    results: dict[tuple, float] = {}

    def rec(txns: list[tuple[tuple, float]], suffix: tuple) -> None:
        counts: dict[str, float] = {}
        for items, w in txns:
            for it in items:
                counts[it] = counts.get(it, 0.0) + w
        for it, c in counts.items():
            if c < min_count:
                continue
            if not suffix and owned is not None and it not in owned:
                continue
            newset = (it,) + suffix
            results[newset] = c
            cond = []
            for items, w in txns:
                try:
                    idx = items.index(it)
                except ValueError:
                    continue
                if idx > 0:
                    cond.append((items[:idx], w))
            if cond:
                rec(cond, newset)

    rec(paths, ())
    return results


def tree_mine(tree: dict, min_count: float,
              owned: set[str] | None = None) -> dict[tuple, float]:
    return mine_paths(tree_weighted_paths(tree), min_count, owned)


def _py_group(item: str, num_groups: int) -> int:
    """Python twin of the Spark-side pmod(xxhash64(item), G) shard key."""
    from macrobase_spark.index.xxh64 import term_bucket

    return term_bucket(item, num_groups)


def shard_prefixes(items: list[str], num_groups: int
                   ) -> list[tuple[int, tuple[str, ...]]]:
    """PFP projection of one canonical-sorted transaction: for each group
    that owns ≥1 item, the prefix up to its LAST owned position."""
    canon = sorted(set(items))
    last = {}
    for i, it in enumerate(canon):
        last[_py_group(it, num_groups)] = i
    return [(g, tuple(canon[: i + 1])) for g, i in last.items()]


# ---------------------------------------------------------------------------
# the streaming operator


def streaming_fpgrowth(
    source: DataFrame,
    items_col: str = "items",
    ts_col: str = "ts",
    min_support_count: float = 3.0,
    decay: float = 0.95,
    period_seconds: int = 60,
    num_groups: int = 8,
    watermark: str = "0 seconds",
    expire_below: float = 1e-3,
    emit: str = "batch",
) -> DataFrame:
    """Streaming DataFrame with an array<string> transaction column → the
    frequent itemsets (decayed support ≥ min_support_count) maintained
    INCREMENTALLY: each micro-batch inserts its transactions into per-group
    persistent FP-trees (applyInPandasWithState), decaying by
    decay**(elapsed event-time periods) first — O(batch) work per batch, no
    recompute over history. Output (update mode): itemset (space-joined,
    canonical order), support, period.

    The per-item group fan-out and per-group prefix projection run as pure
    Catalyst expressions (transform/filter/slice over the sorted transaction
    array) — no Python before the stateful stage.

    emit='batch' (default) mines every group's tree each micro-batch —
    freshest results, mining cost per batch. emit='period' mines only when
    the event-time period advances (or on timeout): non-boundary batches are
    INSERT-ONLY (O(batch) tree inserts, no FP-growth), the scale cadence
    matching the reference's mine-on-markPeriod behavior
    (StreamingFPGrowth.java decays/mines on period marks, not per tuple)."""
    if emit not in ("batch", "period"):
        raise ValueError(f"emit must be 'batch' or 'period', got {emit!r}")
    emit_mode = emit
    from pyspark.sql.streaming.state import GroupStateTimeout

    g_of = f"int(pmod(xxhash64(x), {num_groups}))"
    # per position i: (group of items[i], prefix items[0..i]) — kept only when
    # no LATER item belongs to the same group (longest prefix per group)
    proj = (
        f"filter(transform(array_sort(array_distinct({items_col})), "
        f"  (x, i) -> struct({g_of} as g, i as i)), "
        f"  s -> !exists(slice(array_sort(array_distinct({items_col})), s.i + 2, "
        f"       size(array_sort(array_distinct({items_col})))), "
        f"       y -> int(pmod(xxhash64(y), {num_groups})) = s.g))"
    )
    exploded = (
        source.withWatermark(ts_col, watermark)
        .select(F.col(ts_col).alias("_ts"),
                F.array_sort(F.array_distinct(items_col)).alias("_canon"),
                F.explode(F.expr(proj)).alias("_gp"))
        .select(F.col("_gp.g").alias("g"),
                F.slice("_canon", F.lit(1), F.col("_gp.i") + 1).alias("prefix"),
                "_ts")
    )

    out_schema = "itemset string, support double, period long, grp int"
    state_schema = "tree binary, p long"
    period_ms = period_seconds * 1000

    def _emit_rows(g: int, tree: dict, p: int) -> pd.DataFrame:
        # a group's tree holds prefixes ENDING at owned items, but inner
        # items are foreign — mine only itemsets whose LAST item is owned
        # (the PFP shard contract: disjoint across groups, complete in
        # union). Passing `owned` prunes foreign-suffix branches at the
        # first recursion level instead of mining the full lattice and
        # post-filtering (≈ num_groups× wasted work per batch otherwise).
        owned: set = set()
        stack = [tree]
        while stack:  # one cheap walk: every item name in the tree
            t = stack.pop()
            for it, (_c, ch) in t.items():
                if _py_group(it, num_groups) == g:
                    owned.add(it)
                stack.append(ch)
        mined = tree_mine(tree, min_support_count, owned=owned)
        rows = [(" ".join(s), c, p, g) for s, c in mined.items()]
        return pd.DataFrame(rows, columns=["itemset", "support",
                                           "period", "grp"])

    def update(key, pdfs, state):
        g = key[0]
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            blob, p = state.get
            tree = pickle.loads(bytes(blob))
            p_w = wm // period_ms
            elapsed = max(1, p_w - p)
            tree_decay(tree, decay ** elapsed)
            tree_prune(tree, expire_below)
            if not tree:
                state.remove()
                yield _emit_rows(g, {}, p_w).iloc[0:0]
                return
            state.update((pickle.dumps(tree), p_w))
            state.setTimeoutTimestamp(max((p_w + 1) * period_ms,
                                          wm + period_ms))
            yield _emit_rows(g, tree, p_w)
            return
        batches = [pdf for pdf in pdfs]
        all_ts = pd.concat([b["_ts"] for b in batches])
        p_new = int(all_ts.max().value // 10 ** 6 // period_ms)
        advanced = not state.exists
        if state.exists:
            blob, p = state.get
            tree = pickle.loads(bytes(blob))
            if p_new > p:
                tree_decay(tree, decay ** (p_new - p))
                advanced = True
            p_new = max(p_new, p)
        else:
            tree = {}
        for b in batches:
            for pref in b["prefix"]:
                tree_insert(tree, list(pref), 1.0)
        tree_prune(tree, expire_below)
        state.update((pickle.dumps(tree), p_new))
        state.setTimeoutTimestamp(max((p_new + 1) * period_ms,
                                      wm + period_ms))
        if emit_mode == "period" and not advanced:
            # insert-only fast path: defer mining to the period boundary
            yield pd.DataFrame(columns=["itemset", "support",
                                        "period", "grp"])
            return
        yield _emit_rows(g, tree, p_new)

    return exploded.groupBy("g").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.EventTimeTimeout)
