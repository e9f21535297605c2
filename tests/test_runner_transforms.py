"""Config-driven pipeline runner + trivial metric transforms."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.sample import synth_sample
from macrobase_spark.operators.transform import (
    linear_metric_normalizer, random_projection, truncate,
)
from macrobase_spark.pipelines.runner import run_pipeline


@pytest.fixture(scope="module")
def sample(spark):
    return synth_sample(spark).cache()


def test_runner_batch_yaml_equivalent(spark, sample):
    """The reference's demo batch.yaml config (core/demo/batch.yaml) as a
    dict: percentile classify → aplinear summarize; result must equal the
    directly-composed operators."""
    from macrobase_spark.operators import classify_percentile, diff

    sample.createOrReplaceTempView("sample_v")
    conf = {
        "pipeline": "BasicBatchPipeline",
        "inputURI": "table://sample_v",
        "classifier": "percentile",
        "metric": "usage",
        "cutoff": 1.0,
        "includeHi": True,
        "includeLo": True,
        "summarizer": "aplinear",
        "attributes": ["location", "version"],
        "ratioMetric": "globalratio",
        "minRatioMetric": 3.0,
        "minSupport": 0.2,
    }
    got = run_pipeline(spark, conf).collect()
    labeled = classify_percentile(sample, "usage", percentile=1.0)
    want = diff(labeled, ["location", "version"], min_support=0.2,
                ratio_metric="global_ratio", min_ratio=3.0, max_order=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got, "expected explanations"


def test_runner_reference_demo_yaml(spark):
    """The reference's OWN demo config (core/demo/batch.yaml) and demo data
    (core/demo/sample.csv) run as-is through run_pipeline — the 'a reference
    user's YAML works unchanged' contract."""
    import os

    ref = "/root/reference"
    yaml_path = os.path.join(ref, "core/demo/batch.yaml")
    if not os.path.exists(yaml_path):
        pytest.skip("reference checkout not available")
    rows = run_pipeline(spark, yaml_path, base_dir=ref).collect()
    assert rows, "demo pipeline must surface explanations"
    for r in rows:
        assert r["support"] >= 0.2 and r["global_ratio"] >= 10.0
    # the demo's planted anomaly region
    assert any(r["location"] == "CAN" for r in rows)


def test_runner_predicate_fpgrowth(spark, sample):
    sample.createOrReplaceTempView("sample_v2")
    conf = {
        "inputURI": "table://sample_v2",
        "classifier": "predicate",
        "metric": "version",
        "predicate": "==",
        "cutoff": "v3",
        "summarizer": "fpgrowth",
        "attributes": ["location", "version"],
        "ratioMetric": "riskratio",
        "minRatioMetric": 0.0,
        "minSupport": 0.2,
    }
    rows = run_pipeline(spark, conf).collect()
    assert rows
    assert {"items", "support", "risk_ratio"} <= set(rows[0].asDict())


def test_truncate_projects_prefix(spark, sample):
    out = truncate(sample, ["usage", "latency"], k=1)
    assert "usage" in out.columns and "latency" not in out.columns


def test_random_projection_preserves_distances(spark):
    """JL property smoke test: projected pairwise distances correlate with
    the originals (same fixed matrix as the operator)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(200, 8))
    pdf = pd.DataFrame(x, columns=[f"m{i}" for i in range(8)])
    df = spark.createDataFrame(pdf)
    proj = random_projection(df, [f"m{i}" for i in range(8)], k=4, seed=11)
    got = proj.select(*[f"rp_{i}" for i in range(4)]).toPandas().to_numpy()
    # same matrix, applied in numpy
    r = np.random.default_rng(11).normal(0.0, np.sqrt(1.0 / 8), size=(4, 8))
    # row order of toPandas follows partition order — compare as sets via sort
    want = x @ r.T
    assert np.allclose(np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-9)


def test_linear_metric_normalizer_zero_seeded(spark):
    """Replicates the reference's zero-initialized min/max accumulators:
    an all-positive column normalizes by max (lo clamped to 0), matching
    LinearMetricNormalizer.java:17-50."""
    df = spark.createDataFrame(
        pd.DataFrame({"a": [2.0, 4.0, 8.0], "b": [-2.0, 0.0, 2.0]}))
    out = {(round(r["a"], 9), round(r["b"], 9))
           for r in linear_metric_normalizer(df, ["a", "b"]).collect()}
    # a: lo=min(0,2)=0, hi=8 → 0.25, 0.5, 1.0 ; b: lo=-2, hi=2 → 0, .5, 1
    assert out == {(0.25, 0.0), (0.5, 0.5), (1.0, 1.0)}


def test_runner_duplicate_quantile_fraction_raises(spark):
    """ADVICE r3: two quantileColumns mapping to the same fraction used to
    silently drop one column in the fraction→column inversion."""
    conf = {
        "pipeline": "CubePipeline", "inputURI": "table://_dupq",
        "classifier": "quantile", "metric": "m", "attributes": ["a"],
        "countColumn": "count",
        "quantileColumns": {"p50_a": 0.5, "p50_b": 0.5},
        "cutoff": 1.0,
    }
    spark.createDataFrame(
        [("x", 2.0, 1.0, 1.0)], "a string, count double, p50_a double, p50_b double"
    ).createOrReplaceTempView("_dupq")
    with pytest.raises(ValueError, match="fractions must be unique"):
        run_pipeline(spark, conf)
