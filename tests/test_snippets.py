"""r5: snippet/highlight rendering for BM25 hits (index/snippets.py) and
the per-bucket index_stats observability surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
from macrobase_spark.index.build import build_index, update_index, compact_index
from macrobase_spark.index.snippets import _best_window, highlight_topk, index_stats


def test_best_window_picks_densest_and_earliest():
    text = "alpha beta gamma. delta MERGE scan epsilon zeta; eta theta"
    snip, n = _best_window(text, {"merge", "scan"}, [], 3)
    assert n == 2
    assert "**MERGE**" in snip and "**scan**" in snip
    assert snip.startswith("…") and snip.endswith("…")
    # tie on density -> earliest window
    snip2, n2 = _best_window("x merge y z merge w", {"merge"}, [], 2)
    assert n2 == 1
    assert snip2.startswith("x **merge**")


def test_best_window_prefix_slots_and_empty():
    snip, n = _best_window("scanning the scanner now", set(), ["scan"], 4)
    assert n == 1  # one prefix slot, however many tokens match it
    assert "**scanning**" in snip and "**scanner**" in snip
    assert _best_window("", {"x"}, [], 5) == ("", 0)


@pytest.fixture(scope="module")
def snip_index(spark, tmp_path_factory):
    t = with_doc_id(synth_transcripts(spark, n_convs=50, seed=42)).cache()
    out = str(tmp_path_factory.mktemp("snipidx") / "idx")
    build_index(t, out, num_buckets=4, hot_df_threshold=100,
                hot_sample_frac=0.5)
    return t, out


def test_highlight_topk_rank_identity_and_marks(spark, snip_index):
    from macrobase_spark.index.bm25 import bm25_topk

    t, out = snip_index
    q = "rare7 the"
    got = highlight_topk(spark, out, t, q, k=5, window=8).collect()
    want = bm25_topk(spark, out, q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert all(r["snippet"] for r in got)
    assert all(r["n_matched"] >= 1 for r in got)
    assert any("**" in r["snippet"] for r in got)


def test_highlight_passes_through_topk_options(spark, snip_index):
    from macrobase_spark.index.bm25 import bm25_topk

    t, out = snip_index
    got = highlight_topk(spark, out, t, "the call", k=4,
                         doc_filter="role = 'assistant'").collect()
    want = bm25_topk(spark, out, "the call", k=4,
                     doc_filter="role = 'assistant'").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    # wildcard query: expansions highlight through the prefix slot
    got = highlight_topk(spark, out, t, "tok00*", k=3).collect()
    assert got and all("**" in r["snippet"] for r in got)


def test_highlight_missing_doc_keeps_rank_null_snippet(spark, snip_index):
    t, out = snip_index
    partial = t.filter(F.col("doc_id") % 2 == 0)  # half the corpus missing
    got = highlight_topk(spark, out, partial, "the", k=6).collect()
    assert len(got) == 6
    for r in got:
        if r["doc_id"] % 2 == 0:
            assert r["snippet"] is not None
        else:
            assert r["snippet"] is None and r["n_matched"] is None


def test_index_stats_fresh_update_compact(spark, tmp_path):
    t = with_doc_id(synth_transcripts(spark, n_convs=30, seed=7)).cache()
    out = str(tmp_path / "statsidx")
    report = build_index(t, out, num_buckets=4, hot_df_threshold=10**9)
    st = index_stats(spark, out).collect()
    assert sum(r["postings"] for r in st) == report["postings"]
    assert all(not r["segmented"] and r["prunable"] for r in st)

    delta = (with_doc_id(synth_transcripts(spark, n_convs=6, seed=99))
             .withColumn("doc_id", F.col("doc_id") + F.lit(10 ** 12)))
    update_index(delta, out)
    st2 = index_stats(spark, out).collect()
    assert any(r["segmented"] for r in st2)
    assert any(not r["prunable"] for r in st2)

    compact_index(spark, out)
    st3 = index_stats(spark, out).collect()
    assert all(not r["segmented"] and r["prunable"] for r in st3)


def test_highlight_phrase_route(spark, snip_index):
    """A double-quoted query routes highlight_topk through the positional
    phrase engine — but this index has no positional layer, so it must
    raise the same loud error as bm25_phrase_topk."""
    t, out = snip_index
    with pytest.raises(ValueError, match="no positional layer"):
        highlight_topk(spark, out, t, '"the call"', k=5).collect()


def test_highlight_phrase_rank_identity(spark, tmp_path):
    from macrobase_spark.index.bm25 import bm25_phrase_topk
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index

    t = with_doc_id(synth_transcripts(spark, n_convs=40, seed=42)).cache()
    out = str(tmp_path / "ph_idx")
    build_index(t, out, num_buckets=4, hot_df_threshold=10 ** 9,
                positions=True)
    got = highlight_topk(spark, out, t, '"tok0000 tok0000"', k=6).collect()
    want = bm25_phrase_topk(spark, out, "tok0000 tok0000", k=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert got and all("**tok0000**" in r["snippet"] for r in got)
