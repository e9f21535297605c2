"""Physical-plan property tests: the optimizer behaviors the engine's scale
story depends on, asserted from explain output so regressions surface in CI
rather than in cluster bills.

- predicate pushdown + column pruning reach the parquet scan
- small dimension joins broadcast
- DIFF runs as ONE grouping-sets aggregate (Expand → partial/final
  HashAggregate), not per-order passes
- per-series windows partition by the series key (no single-partition sort
  of a raw table)
- dedup keep/drop decision never shuffles the text column
"""

import pytest
from pyspark.sql import functions as F


def _plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


@pytest.fixture(scope="module")
def sf(spark):
    return "/root/testdata/sf0.001"


def test_scan_pushdown_and_pruning(spark, sf):
    import __spark_entry__ as e

    p = _plan(e.q01_scan_filter_topk(spark, sf))
    assert "PushedFilters:" in p
    assert "l_shipdate" in p.split("PushedFilters:")[1].split("\n")[0]
    # column pruning: unused wide columns never leave the scan
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_dim_join_broadcasts(spark, sf):
    import __spark_entry__ as e

    p = _plan(e.q03_join_inner_semi_anti(spark, sf))
    assert "BroadcastHashJoin" in p


def test_diff_is_single_grouping_sets_pass(spark, sf):
    """The DIFF lattice = ONE Expand + partial/final HashAggregate pair —
    not one aggregation per order."""
    from macrobase_spark.operators import classify_percentile, diff

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    labeled = classify_percentile(li, "l_extendedprice", percentile=1.0,
                                  include_low=False)
    expl = diff(labeled, ["l_returnflag", "l_linestatus"],
                min_support=0.01, min_ratio=0.0, max_order=2)
    p = _plan(expl, mode="simple")
    # the single shuffle already ran (diff collects the explanation-scale
    # grouped relation); the returned plan must be a local scan, proving no
    # recomputation of the lattice happens per downstream action
    assert "Expand" not in p  # grouped result is materialized once
    # and the lattice plan itself (pre-collect) is one Expand:
    base = labeled.select("l_returnflag", "l_linestatus",
                          F.col("_OUTLIER").alias("_o"))
    base.createOrReplaceTempView("_plan_probe")
    g = spark.sql(
        "SELECT l_returnflag, l_linestatus, sum(_o), count(*) "
        "FROM _plan_probe GROUP BY GROUPING SETS "
        "((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())")
    gp = _plan(g, mode="simple")
    assert gp.count("Expand") == 1
    assert gp.count("Exchange") == 1  # one shuffle for the whole lattice


def test_moving_average_partitions_by_series(spark, sf):
    from macrobase_spark.streaming import moving_average

    e = spark.read.parquet(f"{sf}/events.parquet")
    out = moving_average(e, "ts", "value", 3600, partition_by=["user_id"])
    p = _plan(out, mode="simple")
    assert "SinglePartition" not in p
    assert "hashpartitioning(user_id" in p


def test_dedup_exact_never_shuffles_text(spark, sf):
    from macrobase_spark.pipelines.dedup import dedup_exact

    d = spark.read.parquet(f"{sf}/documents.parquet")
    out = dedup_exact(d)
    p = _plan(out, mode="formatted")
    # every Exchange's output schema must be text-free: the keep/drop
    # decision runs on (id, digest) projections; text only flows through
    # the final anti-join's streamed (non-shuffled) side
    for chunk in p.split("\n\n"):
        if chunk.strip().startswith("(") and "Exchange" in chunk.split("\n")[0]:
            assert "text" not in chunk, chunk.split("\n")[0]


def test_bm25_scan_prunes_buckets(spark, tmp_path):
    """Only the query terms' bucket directories appear in the postings scan
    (driver-side XXH64 partition pruning)."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk
    from macrobase_spark.index.xxh64 import term_bucket

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx")
    build_index(df, out, num_buckets=8, hot_df_threshold=10 ** 9)
    res = bm25_topk(spark, out, "rare7", k=5)
    p = _plan(res, mode="formatted")
    b = term_bucket("rare7", 8)
    assert f"bucket IN ({b})" in p or f"bucket#" in p  # partition filter present
    assert "PartitionFilters" in p


def test_percentile_col_no_single_partition_window(spark, sf):
    """percentile() over a continuous metric (distinct ≈ rows) must never
    funnel through a single-partition window: the running count is bucketed
    (window PARTITIONED BY bucket + driver-side literal offsets)."""
    from macrobase_spark.operators.transform import percentile_col

    o = spark.read.parquet(f"{sf}/orders.parquet")
    out = percentile_col(o.select("o_orderkey", "o_totalprice"),
                         "o_totalprice", output_col="pct")
    p = _plan(out, mode="simple")
    assert "SinglePartition" not in p
    assert "hashpartitioning(_b" in p


def test_ann_bucketed_paths_join_per_query(spark):
    """The LSH/IVF candidate relations must be EQUI-JOINS on the bucket/cell
    key (pair count = Σ per-query candidates) — a CartesianProduct or
    BroadcastNestedLoopJoin against the whole query batch is the
    union-×-Q regression."""
    import numpy as np

    from macrobase_spark.pipelines.similarity import _ivf_pairs, _lsh_pairs

    rng = np.random.default_rng(2)
    base = rng.standard_normal((60, 8)).astype("float32")
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in base[3]]), (1, [float(x) for x in base[9]])],
        "q_id long, q_vec array<float>")

    lsh = _lsh_pairs(vdf, qdf, n_planes=4, dim=8, seed=3,
                     id_col="vec_id", vec_col="embedding",
                     q_id_col="q_id", q_vec_col="q_vec")
    p = _plan(lsh, mode="simple")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "BroadcastHashJoin [_bkt" in p or "_bkt#" in p

    ivf = _ivf_pairs(vdf, qdf, n_centroids=4, n_probe=2, sample_frac=1.0,
                     seed=11, id_col="vec_id", vec_col="embedding",
                     q_id_col="q_id", q_vec_col="q_vec")
    p2 = _plan(ivf, mode="simple")
    assert "CartesianProduct" not in p2 and "NestedLoop" not in p2


def test_bm25_doc_filter_pushes_down_and_semijoins(spark, tmp_path):
    """doc_filter='role = ...': the predicate reaches the docs parquet scan
    (PushedFilters) and the restriction is a semi-join BEFORE the top-k
    sort — never a post-limit filter."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_f")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(bm25_topk(spark, out, "the call", k=5,
                        doc_filter="role = 'assistant'"))
    assert "LeftSemi" in p
    pushed = [ln for ln in p.split("\n") if "PushedFilters:" in ln]
    assert any("role" in ln for ln in pushed), pushed
    # the semi-join sits below the global TakeOrdered/Sort+Limit
    assert p.index("LeftSemi") > p.index("TakeOrderedAndProject") or \
        "Sort" in p  # formatted plans list operators top-down (sink first)


def test_bm25_prefix_expansion_scan_reads_term_only(spark, tmp_path):
    """The wildcard dictionary scan is column-pruned to the tiny term
    column — posting blobs are never read to expand a prefix."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index, read_index

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_p")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    postings, _, _ = read_index(spark, out)
    expansion = (postings.filter(F.col("term").startswith("tok00"))
                 .select("term").distinct())
    p = _plan(expansion)
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "term" in read_schema
    assert "blob" not in read_schema and "block_max" not in read_schema
    # the prefix predicate reaches the scan
    assert "StartsWith" in p or "PushedFilters: [IsNotNull(term)" in p


def test_bm25_no_tombstone_join_when_none_pending(spark, tmp_path):
    """An index without tombstones plans NO anti-join — the delete path
    costs nothing until a delete happens; with pending tombstones the
    anti-join appears."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index, delete_docs
    from macrobase_spark.index.bm25 import bm25_topk

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_t")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p0 = _plan(bm25_topk(spark, out, "the call", k=5))
    assert "LeftAnti" not in p0
    delete_docs(spark, out, [0])
    p1 = _plan(bm25_topk(spark, out, "the call", k=5))
    assert "LeftAnti" in p1


def test_bm25_facets_read_no_blobs_and_prune_docs_columns(spark, tmp_path):
    """Facets are an ids-only operation: the postings scan reads term+blob
    of the QUERY terms' buckets only (never positions), and the docs join
    reads just doc_id + the facet columns."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_facets

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_fc")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(bm25_facets(spark, out, "the call", ["role"]))
    # docs scan pruned to doc_id + facet column — never text-adjacent
    # metadata like rep_ratio/anomaly
    docs_schemas = [ln.split("ReadSchema:")[1] for ln in p.split("\n")
                    if "ReadSchema:" in ln and "role" in ln]
    assert docs_schemas and all(
        "anomaly" not in s and "rep_ratio" not in s for s in docs_schemas)
    # no positional layer touched
    assert "positions" not in p


def test_bm25_sort_by_prunes_docs_to_sort_columns(spark, tmp_path):
    """sort_by joins only (doc_id, sort columns) from the docs table."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_s")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(bm25_topk(spark, out, "the call", k=5,
                        sort_by="turn_idx desc"))
    docs_schemas = [ln.split("ReadSchema:")[1] for ln in p.split("\n")
                    if "ReadSchema:" in ln and "turn_idx" in ln]
    assert docs_schemas and all(
        "role" not in s and "anomaly" not in s for s in docs_schemas)
    # the metadata sort is the global top-k, not a post-score re-sort
    assert "TakeOrderedAndProject" in p or "Sort" in p


def test_bm25_search_after_keeps_single_term_no_shuffle_shape(spark, tmp_path):
    """after= only adds a Filter — the single-term fast path still plans
    without a per-doc aggregation exchange."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_topk

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_a")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(bm25_topk(spark, out, "the", k=5, after=(99.0, -1)))
    assert "HashAggregate" not in p


def test_suggest_and_spellcheck_scan_term_df_only(spark, tmp_path):
    """The suggestion surface plans as a dictionary scan: only the term
    and df columns are read (blobs/block_max untouched), and the prefix
    predicate reaches the scan."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.suggest import spellcheck, suggest_terms

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_sg")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(suggest_terms(spark, out, "tok", k=5))
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "term" in read_schema and "df" in read_schema
    assert "blob" not in read_schema and "block_max" not in read_schema
    assert "StartsWith" in p
    p2 = _plan(spellcheck(spark, out, "tok0001", max_edits=1, k=5))
    read_schema2 = p2.split("ReadSchema:")[1].split("\n")[0]
    assert "blob" not in read_schema2 and "block_max" not in read_schema2
    assert "levenshtein" in p2.lower()


def test_match_ids_plans_no_scoring_aggregate(spark, tmp_path):
    """bm25_match_ids (disjunctive, no exclusions) is an ids-only decode:
    no per-doc sum aggregate over contributions, no window, no sort —
    just scan → decode → distinct."""
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index
    from macrobase_spark.index.bm25 import bm25_match_ids

    df = with_doc_id(synth_transcripts(spark, n_convs=20, seed=42))
    out = str(tmp_path / "plan_idx_mi")
    build_index(df, out, num_buckets=4, hot_df_threshold=10 ** 9)
    p = _plan(bm25_match_ids(spark, out, "tok0001 tok0002"))
    assert "Window" not in p and "TakeOrdered" not in p
    assert "contrib" not in p  # the scoring kernel never runs


def test_deterministic_sample_filter_is_scan_level(spark):
    """deterministic_sample plans as a plain Filter over the scan — no
    shuffle, no join, and the md5 expression evaluates JVM-side (no
    Python workers in the plan)."""
    from macrobase_spark.pipelines.sample import deterministic_sample

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(deterministic_sample(d, 0.25, seed=7))
    assert "Exchange" not in p and "Join" not in p
    assert "Python" not in p and "ArrowEval" not in p
    assert "md5" in p.lower()
