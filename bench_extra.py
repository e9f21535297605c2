"""Round-6 optimization measurement harness (guide §1). NOT the driver
bench — bench.py stays frozen. This file exists so OPTIMIZATION_r06.md can
cite isolated numbers:

  python bench_extra.py phases            # index-build phase breakdown
  python bench_extra.py queries [names..] # noop-sink timing per bench query
  python bench_extra.py serving           # warm serving-path latencies
  python bench_extra.py explain q13_diff_ratios [out.txt]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

BENCH_QUERIES = [
    "q02_agg_groupby", "q03_join_inner_semi_anti", "q08_classifiers",
    "q13_diff_ratios", "q14_diff_join", "q17_term_stats",
    "q18_bm25_relational", "q19_cosine_topk", "q20_window_sessionize",
]


def _spark():
    from macrobase_spark.session import get_spark

    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS)


def cmd_phases():
    from macrobase_spark.fixtures.transcripts import synth_transcripts, with_doc_id
    from macrobase_spark.index.build import build_index

    spark = _spark()
    path = "/tmp/mb_bench/transcripts_48000"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = with_doc_id(synth_transcripts(spark, n_convs=48000, seed=42,
                                           partitions=max(CPUS, 8)))
        df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    out = "/tmp/mb_bench_extra_idx"
    # warm (JIT/codegen) like bench.py does
    shutil.rmtree(out + "_warm", ignore_errors=True)
    build_index(df.sample(0.12, seed=1), out + "_warm", num_buckets=max(CPUS, 8),
                num_groups=1, hot_df_threshold=2000, hot_sample_frac=0.05,
                resume=False)
    shutil.rmtree(out + "_warm", ignore_errors=True)
    for i in range(REPS):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        rep = build_index(df, out, num_buckets=max(CPUS, 8), num_groups=1,
                          hot_df_threshold=2000, hot_sample_frac=0.05,
                          resume=False)
        total = time.time() - t0
        print(json.dumps({"rep": i, "total_sec": round(total, 3),
                          "phases": rep["phases"],
                          "turns_per_sec": round(rep["turns_per_sec"], 1)}))


def cmd_queries(names):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    names = names or BENCH_QUERIES
    for name in names:
        samples = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "samples": samples,
                          "min": min(samples)}))


def cmd_serving():
    import statistics

    from macrobase_spark.index.bm25 import (bm25_facets, bm25_topk,
                                            bm25_topk_batch, more_like_this)
    from macrobase_spark.index.suggest import spellcheck, suggest_terms

    spark = _spark()
    idx = "/tmp/mb_bench/idx_high"
    if not os.path.exists(os.path.join(idx, "stats.json")):
        print("no index at /tmp/mb_bench/idx_high — run bench.py or "
              "`bench_extra.py phases` first", file=sys.stderr)
        sys.exit(1)
    qset = ["the", "call tool", "rare42", "tok0001", "tok0042 tok0007",
            "rare101 the run", "tok0100 tok0200 tok0300", "tok0009",
            "rare7 tok0005"]
    bm25_topk(spark, idx, "warmup", k=10).collect()
    bm25_topk(spark, idx, "warmup the", k=10).collect()
    lat = []
    for q in qset:
        t0 = time.time()
        bm25_topk(spark, idx, q, k=10).collect()
        lat.append(round(time.time() - t0, 3))
    print(json.dumps({"op": "bm25_topk", "lat": lat,
                      "p50": statistics.median(lat)}))
    bm25_topk_batch(spark, idx, ["warmup the", "warmup"], k=10).collect()
    for _ in range(REPS):
        t0 = time.time()
        bm25_topk_batch(spark, idx, qset, k=10).collect()
        print(json.dumps({"op": "bm25_batch_all",
                          "sec": round(time.time() - t0, 3)}))
    bm25_facets(spark, idx, "warmup the", ["role"]).collect()
    for _ in range(REPS):
        t0 = time.time()
        bm25_facets(spark, idx, "call tool the", ["role", "tool"],
                    ranges={"anomaly": [0.0, 0.25, 0.5, 1.0]}).collect()
        print(json.dumps({"op": "bm25_facets",
                          "sec": round(time.time() - t0, 3)}))
    src_df = spark.read.parquet("/tmp/mb_bench/transcripts_48000")
    seed_id = src_df.select("doc_id").first()["doc_id"]
    more_like_this(spark, idx, src_df, seed_id, k=10).collect()
    for _ in range(REPS):
        t0 = time.time()
        more_like_this(spark, idx, src_df, seed_id, k=10).collect()
        print(json.dumps({"op": "more_like_this",
                          "sec": round(time.time() - t0, 3)}))
    suggest_terms(spark, idx, "th", k=10).collect()
    for _ in range(REPS):
        t0 = time.time()
        suggest_terms(spark, idx, "th", k=10).collect()
        spellcheck(spark, idx, "tha", max_edits=1, k=5).collect()
        print(json.dumps({"op": "suggest_spell",
                          "sec": round(time.time() - t0, 3)}))


def cmd_explain(name, out_path=None):
    import contextlib
    import io

    import __spark_entry__ as entry

    spark = _spark()
    df = entry.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
        print(f"wrote {out_path} ({len(text)} bytes)")
    else:
        print(text)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "phases":
        cmd_phases()
    elif cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "serving":
        cmd_serving()
    elif cmd == "explain":
        cmd_explain(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
