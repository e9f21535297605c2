"""Train/eval decontamination: find training documents that share long
n-grams with an evaluation set, and drop them before training.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM-style
13-gram collision decontamination): any training document sharing at
least `min_shared` distinct word n-grams with an eval document is
flagged, with the overlap fraction of the eval document's shingle set
reported so callers can grade severity.

Scale shape (100 TB train, MB–GB eval): the EVAL side is shingled and
joined against the train side's shingles — eval is orders of magnitude
smaller, so with `broadcast_eval=True` (default) the whole train scan
proceeds without a shuffle of the train corpus: shingle train text in
place, hash-join each shingle against the broadcast eval set, and only
the MATCHED (train_id, eval_id) pairs — a tiny relation — are ever
aggregated. A hot-shingle guard drops shingles that match more than
`max_train_df` training docs (boilerplate headers would otherwise
create |eval|×|train| pair blowup); with 13-gram shingles this removes
only degenerate boilerplate, and the guard's effect is visible (the
dropped shingles are reported via contamination_report's `hot_dropped`).

Reference capability context: MacroBase has no train/eval hygiene op;
this extends the repo's n-gram machinery (pipelines/dedup.py
ngram_jaccard_pairs) to the cross-corpus case a training-data pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.functions.text import ngrams


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int,
              out_id: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(ngrams(text_col, n))).alias("sh"))


def find_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    min_overlap: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    max_train_df: int = 65_536,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(train_id, eval_id, shared, eval_sz, overlap) for every train/eval
    document pair sharing ≥ min_shared distinct word n-grams AND an
    overlap (shared / eval doc's distinct-shingle count) ≥ min_overlap.

    Defaults are the classic 13-gram any-collision rule. Documents
    shorter than n tokens shingle to their whole text (ngrams()
    contract), so short eval items still participate exactly."""
    eval_id_col = eval_id_col or id_col
    eval_text_col = eval_text_col or text_col
    tr = _shingles(train_df, id_col, text_col, n, "train_id")
    ev = _shingles(eval_df, eval_id_col, eval_text_col, n, "eval_id")
    if broadcast_eval:
        ev = F.broadcast(ev)
    eval_sizes = (ev.groupBy("eval_id")
                  .agg(F.count("*").alias("eval_sz")))
    if broadcast_eval:
        eval_sizes = F.broadcast(eval_sizes)
    matched = tr.join(ev, "sh")  # train shingles ∩ eval shingles
    # hot-shingle guard over the MATCHED subset only (tiny): a shingle
    # hitting > max_train_df training docs is boilerplate, not leakage
    hot = (matched.select("sh", "train_id").distinct()
           .groupBy("sh").agg(F.count("*").alias("_tdf"))
           .filter(F.col("_tdf") > max_train_df).select("sh"))
    matched = matched.join(F.broadcast(hot), "sh", "anti")
    pairs = (matched.groupBy("train_id", "eval_id")
             .agg(F.countDistinct("sh").alias("shared")))
    out = (pairs.join(eval_sizes, "eval_id")
           .withColumn("overlap",
                       F.col("shared") / F.col("eval_sz").cast("double"))
           .filter((F.col("shared") >= min_shared)
                   & (F.col("overlap") >= min_overlap)))
    return out.select("train_id", "eval_id", "shared", "eval_sz", "overlap")


def drop_contaminated(
    train_df: DataFrame,
    eval_df: DataFrame,
    **kwargs,
) -> DataFrame:
    """The decontaminated training corpus: train_df minus every document
    find_contamination flags (same kwargs). One anti-join on the tiny
    flagged-ids relation — the train corpus itself never shuffles."""
    id_col = kwargs.get("id_col", "doc_id")
    flagged = (find_contamination(train_df, eval_df, **kwargs)
               .select(F.col("train_id").alias(id_col)).distinct())
    return train_df.join(flagged, id_col, "anti")
