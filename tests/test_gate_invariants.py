"""r5: the six no-oracle driver gates are self-checking — they emit
`invariant:*` rows only while the computed VALUES are healthy. These tests
prove the property the SimHash underflow exposed (a rows-only gate that
carries no value signal): under a one-line fault injection of each gate's
kernel, the gate's ROW COUNT changes, so the driver's rows-only record
would catch the corruption.

Each test runs the real gate at sf0.001 (small + fast), snapshots the
healthy row count and invariant set, injects the fault via monkeypatch,
and asserts rows changed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    rows = entrymod.queries()[name](spark, SF).collect()
    if not rows:
        return 0, set()
    key0 = rows[0].__fields__[0]
    invs = {str(r[key0]) for r in rows
            if str(r[key0]).startswith("invariant")
            or (isinstance(r[key0], int) and r[key0] < 0)}
    return len(rows), invs


def test_q28_simhash_underflow_class_detected(spark, monkeypatch):
    """Re-inject the EXACT r2 bug class: every fingerprint ~all-ones."""
    from macrobase_spark.pipelines import dedup as D

    n0, invs0 = _run(spark, "q28_simhash")
    assert {"invariant:planted_pair_found", "invariant:popcount_balanced",
            "invariant:fingerprints_nondegenerate"} <= invs0

    orig = D.simhash_64
    monkeypatch.setattr(
        D, "simhash_64",
        lambda df, text_col="text":
            orig(df, text_col).withColumn("simhash", F.lit(-1).cast("long")))
    n1, invs1 = _run(spark, "q28_simhash")
    assert n1 != n0  # all-pairs explosion moves the count
    # degenerate fingerprints still "find" the planted pair (hamming 0),
    # but the two distribution invariants — the ones that target this bug
    # class — are gone
    assert "invariant:popcount_balanced" not in invs1
    assert "invariant:fingerprints_nondegenerate" not in invs1


def test_q27_minhash_corruption_detected(spark, monkeypatch):
    """Per-doc garbage signatures (no band ever collides) must drop the
    planted-pair invariant rows."""
    from macrobase_spark.pipelines import dedup as D

    n0, invs0 = _run(spark, "q27_minhash_lsh")
    assert {"invariant:planted_pair_found",
            "invariant:planted_est_jaccard_high"} <= invs0

    orig = D.minhash_signatures
    monkeypatch.setattr(
        D, "minhash_signatures",
        lambda df, *a, **k: orig(df, *a, **k).withColumn(
            "signature", F.array_repeat(F.xxhash64("doc_id"), 32)))
    n1, invs1 = _run(spark, "q27_minhash_lsh")
    assert n1 != n0
    assert not invs1


def test_q34_unweighted_corruption_detected(spark, monkeypatch):
    """Silently dropping the weights must lose the weighted-mean-shift
    invariant (sample mean collapses to the population mean)."""
    from macrobase_spark.operators import transform as T

    n0, invs0 = _run(spark, "q34_weighted_sample")
    assert "invariant:weighted_mean_shifted_up" in invs0

    orig = T.weighted_reservoir_sample
    monkeypatch.setattr(
        T, "weighted_reservoir_sample",
        lambda df, frac, weight_col=None, seed=1:
            orig(df, frac, None, seed))
    n1, invs1 = _run(spark, "q34_weighted_sample")
    assert n1 == n0 - 1
    assert "invariant:weighted_mean_shifted_up" not in invs1
    assert "invariant:sample_size_in_bounds" in invs1  # size leg unaffected


def test_q39_mcd_corruption_detected(spark, monkeypatch):
    """A constant (or inverted) score kernel must lose planted_top1."""
    from macrobase_spark.operators import mcd as M

    n0, invs0 = _run(spark, "q39_mcd_mahalanobis")
    assert "invariant:planted_top1" in invs0

    monkeypatch.setattr(
        M, "mcd_score",
        lambda df, cols, seed=11, **k: df.withColumn("_SCORE", F.lit(1.0)))
    n1, invs1 = _run(spark, "q39_mcd_mahalanobis")
    assert n1 == n0 - 1
    assert not invs1


def test_q48_timeseries_corruption_detected(spark, monkeypatch):
    """Constant AR/ARIMA scores must lose both spike-top1 invariants."""
    from macrobase_spark.operators import timeseries as TS

    n0, invs0 = _run(spark, "q48_kalman_ar")
    assert {"-1", "-2"} <= invs0

    monkeypatch.setattr(
        TS, "ar_scores",
        lambda df, keys, order_col, col, p=2, output_col="_AR", **k:
            df.withColumn(output_col, F.lit(0.5)))
    monkeypatch.setattr(
        TS, "arima_scores",
        lambda df, keys, order_col, col, p=1, d=1, q=1,
        output_col="_ARIMA", **k: df.withColumn(output_col, F.lit(0.5)))
    n1, invs1 = _run(spark, "q48_kalman_ar")
    assert n1 == n0 - 2
    assert not invs1


def test_q49_density_corruption_detected(spark, monkeypatch):
    """Constant KDE/GMM scores must lose both planted invariants."""
    from macrobase_spark.operators import density as DN

    n0, invs0 = _run(spark, "q49_kde_gmm")
    assert {"invariant:planted_kde_most_isolated",
            "invariant:planted_gmm_max_nll"} <= invs0

    monkeypatch.setattr(
        DN, "kde_score",
        lambda df, cols, output_col="_SCORE", **k:
            df.withColumn(output_col, F.lit(-0.5)))
    monkeypatch.setattr(
        DN, "gmm_score",
        lambda df, cols, k=3, output_col="_SCORE", **kw:
            df.withColumn(output_col, F.lit(7.0)))
    n1, invs1 = _run(spark, "q49_kde_gmm")
    assert n1 == n0 - 2
    assert not invs1
