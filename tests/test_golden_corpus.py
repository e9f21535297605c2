"""Golden-corpus analogues: the reference's SQL test suite shapes
(sql/src/test/resources/{1..20}.sql) re-expressed on the regenerated sample
table, asserting the semantic invariants the golden CSVs encode.

- 1.sql: DIFF high-vs-low usage ON (location, version) — planted (CAN, v3)
  dominates (tests/test_classify_diff.py covers the full pipeline; here we
  assert the output CONTRACT: column names/order and null-absent encoding,
  APLExplanation.toDataFrame:84-142).
- 12.sql: ORDER BY support LIMIT 1 — top-support itemset only.
- 20.sql: WHERE percentile(usage) > p — UDF-in-predicate evaluation
  (QueryEngine.java:1150-1165) with the reference's rank/n semantics.
- joins/1.sql: single-column equi-join golden shape.
"""

import pytest
from pyspark.sql import functions as F

from macrobase_spark.fixtures.sample import synth_sample
from macrobase_spark.operators import classify_percentile, diff, percentile_col


@pytest.fixture(scope="module")
def sample(spark):
    return synth_sample(spark).cache()


def test_golden_1_output_contract(spark, sample):
    labeled = classify_percentile(sample, "usage", percentile=2.5,
                                  include_high=False)
    expl = diff(labeled, ["location", "version"], min_support=0.2,
                ratio_metric="global_ratio", min_ratio=1.5, max_order=2)
    # column contract: ON-columns, support, metric, outlier_count, total_count
    assert expl.columns == ["location", "version", "support", "global_ratio",
                            "outlier_count", "total_count"]
    rows = expl.collect()
    # order-1 itemsets encode the absent attribute as a real NULL
    singles = [r for r in rows if (r["location"] is None) != (r["version"] is None)]
    assert singles, "expected order-1 itemsets with NULL-absent attributes"
    # every surviving row passes both thresholds
    for r in rows:
        assert r["support"] >= 0.2 and r["global_ratio"] >= 1.5


def test_golden_12_order_by_support_limit_1(spark, sample):
    labeled = classify_percentile(sample, "usage", percentile=2.5,
                                  include_high=False)
    expl = diff(labeled, ["location", "version"], min_support=0.2,
                min_ratio=1.0, max_order=2)
    top = expl.orderBy(F.col("support").desc()).limit(1).collect()
    assert len(top) == 1
    # highest-support itemset is an order-1 superset of the planted combo
    assert top[0]["location"] == "CAN" or top[0]["version"] == "v3"


def test_golden_20_percentile_udf_in_where(spark, sample):
    """WHERE percentile(usage) > 0.95 — reference semantics: (1-indexed max
    rank)/n, so EXACTLY ceil(0.05·n)−boundary rows survive (ties share the
    max rank)."""
    p = percentile_col(sample, "usage", output_col="pct")
    picked = p.filter(F.col("pct") > 0.95)
    n = sample.count()
    got = picked.count()
    # no duplicate usage values in the synthetic normals → exactly floor(0.05n)
    assert abs(got - 0.05 * n) <= 1
    # and they are the top values
    min_picked = picked.agg(F.min("usage")).collect()[0][0]
    above = sample.filter(F.col("usage") > min_picked).count()
    assert above == got - 1


def test_golden_join_1_equi(spark):
    a = spark.createDataFrame([(str(i),) for i in range(0, 100, 2)], "A0 string")
    b = spark.createDataFrame([(str(i),) for i in range(0, 100, 3)], "A0 string")
    j = a.join(b, "A0", "inner").orderBy(F.col("A0").cast("int"))
    got = [r["A0"] for r in j.collect()]
    assert got == [str(i) for i in range(0, 100, 6)]
