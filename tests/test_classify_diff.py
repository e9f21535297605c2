"""Classify → DIFF end-to-end on the reference's flagship fixture shape:
the `sample` table with 20 planted (CAN, v3) low-usage outliers must explain
to exactly that combination (UnsupervisedCSVTest semantics,
/root/reference/lib/src/test/java/.../UnsupervisedCSVTest.java:21-56)."""

import math

import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.sample import synth_sample
from macrobase_spark.operators.classify import (
    classify_percentile,
    classify_predicate,
    classify_count_mean_shift,
)
from macrobase_spark.operators.diff import diff, diff_split, explanation_columns


@pytest.fixture(scope="module")
def sample(spark):
    return synth_sample(spark).cache()


def test_percentile_classifier_tail_counts(spark, sample):
    out = classify_percentile(sample, "usage", percentile=1.0)
    n = out.filter(F.col("_OUTLIER") == 1.0).count()
    # 1% two-sided on 1020 rows → ≈ 20 planted + ~10 tail inliers
    assert 15 <= n <= 40


def test_diff_finds_planted_combination(spark, sample):
    labeled = classify_percentile(sample, "usage", percentile=2.5, include_high=False)
    expl = diff(labeled, ["location", "version"], min_support=0.5,
                ratio_metric="global_ratio", min_ratio=3.0, max_order=2)
    rows = expl.collect()
    assert rows, "expected at least one explanation"
    top = rows[0]
    assert (top["location"], top["version"]) == ("CAN", "v3")
    # all 20 planted outliers are (CAN, v3) → support vs outlier total ≈ 1
    assert top["support"] >= 0.6
    assert top["outlier_count"] >= 20


def test_diff_metrics_against_python(spark, sample):
    """Cross-check global_ratio / risk_ratio / prevalence_ratio values against
    a direct pandas computation (reference formulas)."""
    labeled = classify_predicate(sample, "location", "==", "CAN")
    pdf = labeled.toPandas()
    g_out = pdf["_OUTLIER"].sum()
    g_tot = float(len(pdf))
    sub = pdf[pdf["version"] == "v3"]
    eo, et = sub["_OUTLIER"].sum(), float(len(sub))

    for metric, expected in [
        ("global_ratio", (eo / et) / (g_out / g_tot)),
        ("risk_ratio", (eo / et) / ((g_out - eo) / (g_tot - et))),
        ("prevalence_ratio", (eo / (et - eo)) / (g_out / (g_tot - g_out))),
    ]:
        expl = diff(labeled, ["version"], min_support=0.0,
                    ratio_metric=metric, min_ratio=0.0, max_order=1)
        got = {r["version"]: r[metric] for r in expl.collect()}
        assert math.isclose(got["v3"], expected, rel_tol=1e-9), (metric, got["v3"], expected)


def test_diff_split(spark, sample):
    expl = diff_split(sample, F.col("usage") < 20.0, ["location", "version"],
                      min_support=0.5, min_ratio=2.0, max_order=2)
    top = expl.collect()[0]
    assert (top["location"], top["version"]) == ("CAN", "v3")


def test_explanation_columns_auto(spark, sample):
    cols = explanation_columns(sample)
    assert set(cols) == {"location", "version"}


def test_count_mean_shift_columns(spark, sample):
    out = classify_count_mean_shift(sample, "location", "latency", "==", "CAN")
    row = out.agg(
        F.sum("_OUTLIERCOUNT").alias("oc"), F.sum("_INLIERCOUNT").alias("ic")
    ).collect()[0]
    assert row["oc"] + row["ic"] == sample.count()
