"""Every reference demo config (core/demo/*.json) runs unchanged through
run_pipeline, checked against independent pandas/numpy oracles computed from
the reference's formulas (GlobalRatioQualityMetric, MeanDevQualityMetric,
APLMeanSummarizer sufficient statistics). The REST config's GitHub URL is
served by a local HTTP mirror of the same file (the sandbox has no network);
everything else in the config is untouched."""

from __future__ import annotations

import itertools
import json
import math
import os
import threading

import pandas as pd
import pytest

from macrobase_spark.pipelines.runner import run_pipeline

REF = "/root/reference"
DEMO = os.path.join(REF, "core/demo")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="reference checkout not available")


def _combos(attrs, max_order=3):
    for k in range(1, min(max_order, len(attrs)) + 1):
        yield from itertools.combinations(attrs, k)


def _outlier_oracle(pdf, attrs, out_col, count_col, min_support, min_ratio,
                    max_order=3):
    """support + global_ratio explanation over all attr combos, straight
    from GlobalRatioQualityMetric: (oc/go)/(tc/gt)."""
    w = pdf[count_col] if count_col else pd.Series(1.0, index=pdf.index)
    oc_w = pdf[out_col] * w
    go, gt = float(oc_w.sum()), float(w.sum())
    rows = {}
    for combo in _combos(attrs, max_order):
        grp = pdf.groupby(list(combo), sort=False)
        for key, idx in grp.groups.items():
            key = key if isinstance(key, tuple) else (key,)
            oc, tc = float(oc_w[idx].sum()), float(w[idx].sum())
            support = oc / go if go else 0.0
            ratio = (oc / go) / (tc / gt) if oc else 0.0
            if support >= min_support and ratio >= min_ratio:
                rows[tuple(zip(combo, key))] = (support, ratio, oc, tc)
    return rows


def _got_keyed(rows, attrs):
    out = {}
    for r in rows:
        d = r.asDict()
        key = tuple((a, d[a]) for a in attrs if d.get(a) is not None)
        out[key] = d
    return out


def test_double_and_string_predicate(spark):
    """double_predicate.json + string_predicate.json (BasicBatchPipeline,
    predicate classifier; string cutoff compares lexicographically like
    Java compareTo) vs the pandas oracle."""
    pdf = pd.read_csv(os.path.join(DEMO, "tiny_predicate.csv"),
                      dtype={"release": str})
    for cfg_name, pred in [("double_predicate.json",
                            pdf["power"] >= 80.0),
                           ("string_predicate.json",
                            pdf["release"] >= "10-19-17")]:
        cfg = os.path.join(DEMO, cfg_name)
        got = _got_keyed(run_pipeline(spark, cfg, base_dir=REF).collect(),
                         ["location", "version"])
        o = pdf.assign(_o=pred.astype(float))
        want = _outlier_oracle(o, ["location", "version"], "_o", None,
                               min_support=0.2, min_ratio=2.0)
        assert set(got) == set(want), cfg_name
        for key, (support, ratio, oc, tc) in want.items():
            g = got[key]
            assert math.isclose(g["support"], support, rel_tol=1e-9), key
            assert math.isclose(g["global_ratio"], ratio, rel_tol=1e-9), key


def test_cube_predicate(spark):
    """cube_predicate.json: PredicateCubeClassifier with a STRING cutoff on
    the release column of the pre-aggregated cube, count-weighted."""
    pdf = pd.read_csv(os.path.join(DEMO, "sample_cubed.csv"),
                      dtype={"release": str})
    got = _got_keyed(
        run_pipeline(spark, os.path.join(DEMO, "cube_predicate.json"),
                     base_dir=REF).collect(),
        ["location", "version"])
    o = pdf.assign(_o=(pdf["release"] >= "12-11-17").astype(float))
    want = _outlier_oracle(o, ["location", "version"], "_o", "count",
                           min_support=0.2, min_ratio=2.0)
    assert set(got) == set(want)
    for key, (support, ratio, oc, tc) in want.items():
        g = got[key]
        assert math.isclose(g["support"], support, rel_tol=1e-9), key
        assert math.isclose(g["global_ratio"], ratio, rel_tol=1e-9), key


def test_cube_meanshift(spark):
    """cube_meanshift.json: RawClassifier + APLMeanSummarizer — weighted
    sufficient stats n=Σc, m1=Σ mean·c, m2=Σ (std²+mean²)·c; subgroup
    mean_deviation = |subMean − globalMean|/globalStd ≥ minRatioMetric."""
    pdf = pd.read_csv(os.path.join(DEMO, "sample_cubed_meanshift.csv"))
    attrs = ["location", "version", "device"]
    got = _got_keyed(
        run_pipeline(spark, os.path.join(DEMO, "cube_meanshift.json"),
                     base_dir=REF).collect(), attrs)
    n = pdf["count"].astype(float)
    m1 = pdf["mean"] * n
    m2 = (pdf["std"] ** 2 + pdf["mean"] ** 2) * n
    gn, gmean = float(n.sum()), float(m1.sum()) / float(n.sum())
    gstd = math.sqrt(float(m2.sum()) / gn - gmean * gmean)
    want = {}
    for combo in _combos(attrs, 3):
        for key, idx in pdf.groupby(list(combo), sort=False).groups.items():
            key = key if isinstance(key, tuple) else (key,)
            cn, cm1 = float(n[idx].sum()), float(m1[idx].sum())
            support = cn / gn
            dev = abs(cm1 / cn - gmean) / gstd
            if support >= 0.05 and dev >= 2.0:
                want[tuple(zip(combo, key))] = (support, dev)
    assert set(got) == set(want)
    for key, (support, dev) in want.items():
        g = got[key]
        assert math.isclose(g["support"], support, rel_tol=1e-9), key
        assert math.isclose(g["mean_deviation"], dev, rel_tol=1e-9), key


def test_cube_arithmetic_and_quantile_run(spark):
    """cube.json (arithmetic) and cube_quantile.json (quantile) run
    unchanged; config thresholds hold on every emitted row, and the planted
    low-mean group (CAN, v3) — the only group whose mean sits below the
    1 % weighted-percentile cutoff — is surfaced by both."""
    for cfg_name, ratio_min in [("cube.json", 10.0),
                                ("cube_quantile.json", 10.0)]:
        rows = run_pipeline(spark, os.path.join(DEMO, cfg_name),
                            base_dir=REF).collect()
        assert rows, cfg_name
        for r in rows:
            assert r["support"] >= 0.2 - 1e-12, cfg_name
            assert r["global_ratio"] >= ratio_min - 1e-12, cfg_name
        assert any(r["location"] == "CAN" and r["version"] == "v3"
                   for r in rows), cfg_name


def test_cube_quantile_rest_local_mirror(spark, tmp_path):
    """cube_quantile_rest.json through the REST ingest path: the GitHub raw
    URL is mirrored by a local HTTP server serving the reference's own
    sample_cubed_quantiles.csv (no network in the sandbox); every other
    config key is used verbatim. Result must equal the csv:// variant."""
    import http.server

    with open(os.path.join(DEMO, "sample_cubed_quantiles.csv"), "rb") as f:
        payload = f.read()

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with open(os.path.join(DEMO, "cube_quantile_rest.json")) as f:
            cfg = json.load(f)
        cfg["inputURI"] = f"http://127.0.0.1:{srv.server_port}/sample_cubed_quantiles.csv"
        rest_rows = sorted(map(tuple, run_pipeline(spark, cfg).collect()))
        local_rows = sorted(map(tuple, run_pipeline(
            spark, os.path.join(DEMO, "cube_quantile.json"),
            base_dir=REF).collect()))
        assert rest_rows == local_rows and rest_rows
    finally:
        srv.shutdown()


def test_reference_test_resource_yamls(spark):
    """The reference's own test configs (core/src/test/resources/
    tiny_conf.yaml, tiny_predicate.yaml) run unchanged against their
    relative csv:// inputs. tiny_conf.yaml's `minRiskRatio` key is
    faithfully IGNORED like the reference (BasicBatchPipeline.java:75 reads
    only `minRatioMetric`, defaulting 3.0)."""
    core = os.path.join(REF, "core")
    pdf = pd.read_csv(os.path.join(core, "src/test/resources/tiny.csv"))
    # tiny_predicate.yaml: usage == 2.0 marks ONE of three rows; the best
    # combo's global_ratio is (1/1)/(1/3) = 3 < minRatioMetric 10 — the
    # faithful result is EMPTY, exactly like the reference
    rows = run_pipeline(
        spark, os.path.join(core, "src/test/resources/tiny_predicate.yaml"),
        base_dir=core).collect()
    want = _outlier_oracle(pdf.assign(_o=(pdf["usage"] == 2.0).astype(float)),
                           ["location", "version"], "_o", None,
                           min_support=0.2, min_ratio=10.0)
    assert _got_keyed(rows, ["location", "version"]).keys() == want.keys()
    # tiny_conf.yaml: its `minRiskRatio` key is ignored like the reference
    # (only minRatioMetric is read, defaulting 3.0) — just runs clean
    rows = run_pipeline(
        spark, os.path.join(core, "src/test/resources/tiny_conf.yaml"),
        base_dir=core).collect()
    for r in rows:
        assert r["support"] >= 0.2 - 1e-12


def test_cube_countmeanshift_oracle(spark):
    """CubePipeline classifier 'countmeanshift' (no demo config ships, so a
    config dict over the reference's meanshift demo CSV):
    CountMeanShiftCubedClassifier + APLCountMeanShiftSummarizer vs the
    pandas oracle — mean_shift = (oms/oc)/(ims/ic), support = oc/go."""
    pdf = pd.read_csv(os.path.join(DEMO, "sample_cubed_meanshift.csv"))
    cfg = {
        "pipeline": "CubePipeline",
        "inputURI": "csv://core/demo/sample_cubed_meanshift.csv",
        "classifier": "countmeanshift",
        "countColumn": "count", "meanColumn": "mean",
        "metric": "location", "predicate": "==", "cutoff": "AUS",
        "attributes": ["version", "device"],
        "minSupport": 0.1, "meanShiftRatio": 1.1,
    }
    got = _got_keyed(run_pipeline(spark, cfg, base_dir=REF).collect(),
                     ["version", "device"])
    is_out = (pdf["location"] == "AUS").astype(float)
    oc_w = is_out * pdf["count"]
    ic_w = (1 - is_out) * pdf["count"]
    oms = is_out * pdf["mean"] * pdf["count"]
    ims = (1 - is_out) * pdf["mean"] * pdf["count"]
    go = float(oc_w.sum())
    want = {}
    for combo in _combos(["version", "device"], 3):
        for key, idx in pdf.groupby(list(combo), sort=False).groups.items():
            key = key if isinstance(key, tuple) else (key,)
            oc, ic = float(oc_w[idx].sum()), float(ic_w[idx].sum())
            support = oc / go
            if not oc or not ic:
                continue
            shift = (float(oms[idx].sum()) / oc) / (float(ims[idx].sum()) / ic)
            if support >= 0.1 and shift >= 1.1:
                want[tuple(zip(combo, key))] = (support, shift)
    assert set(got) == set(want)
    for key, (support, shift) in want.items():
        assert math.isclose(got[key]["support"], support, rel_tol=1e-9), key
        assert math.isclose(got[key]["mean_shift"], shift, rel_tol=1e-9), key
