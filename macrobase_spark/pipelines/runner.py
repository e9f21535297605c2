"""Config-driven pipeline runner — the reference's YAML entry point
(`java ... BasicBatchPipeline batch.yaml`) re-expressed over the Spark
operators.

Reference contracts:
- BasicBatchPipeline (core/.../pipeline/BasicBatchPipeline.java:33-215):
  load → classifier(percentile|predicate|countmeanshift) →
  summarizer(apriori/aplinear|fpgrowth|countmeanshift) → explanation.
- CubePipeline (core/.../pipeline/CubePipeline.java:60-139): pre-aggregated
  cube input with a count column; classifiers arithmetic|quantile|
  countmeanshift; APL summarizer weighted by the count column.
- PipelineConfig key names and defaults match the reference YAML surface
  (core/demo/batch.yaml), so a reference user's config file runs as-is:
  `run_pipeline(spark, "batch.yaml")`.

inputURI schemes: csv://path, parquet://path, table://registered_view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType as _NUMERIC_TYPES

_RATIO_MAP = {
    "globalratio": "global_ratio",
    "global_ratio": "global_ratio",
    "riskratio": "risk_ratio",
    "risk_ratio": "risk_ratio",
    "prevalenceratio": "prevalence_ratio",
    "prevalence_ratio": "prevalence_ratio",
}


def load_config(conf) -> dict:
    if isinstance(conf, dict):
        return dict(conf)
    with open(conf) as f:
        text = f.read()
    try:
        import yaml

        return yaml.safe_load(text)
    except ImportError:
        import json

        return json.loads(text)


def _load_input(spark: SparkSession, uri: str, base_dir: str | None,
                conf: dict | None = None) -> DataFrame:
    scheme, _, path = uri.partition("://")
    if scheme == "table":
        return spark.table(path)
    if scheme in ("http", "https"):
        # the reference's REST loader (PipelineUtils.loadDataFrame routes
        # http(s) URIs through RESTDataFrameLoader with restHeader/usePost/
        # jsonBody — core/demo/cube_quantile_rest.json) → sources/rest.py;
        # numeric columns are cast per the classifier's colTypes contract
        # (CubePipeline.getColTypes) by the caller
        from macrobase_spark.sources.rest import read_rest

        c = conf or {}
        return read_rest(
            spark, uri, method="POST" if c.get("usePost", False) else "GET",
            headers=dict(c.get("restHeader") or {}),
            json_body=c.get("jsonBody"))
    if not os.path.isabs(path) and base_dir:
        path = os.path.join(base_dir, path)
    if scheme == "csv":
        return spark.read.option("header", "true").option(
            "inferSchema", "true").csv(path)
    if scheme == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported inputURI scheme: {uri!r}")


def run_pipeline(spark: SparkSession, conf, base_dir: str | None = None) -> DataFrame:
    """Run a reference-style pipeline config; returns the explanation
    DataFrame (same output contract as diff())."""
    from macrobase_spark.operators.classify import (
        classify_arithmetic_cubed, classify_count_mean_shift,
        classify_percentile, classify_predicate, classify_quantile_cubed,
    )
    from macrobase_spark.operators.diff import diff, diff_count_mean_shift
    from macrobase_spark.operators.fpgrowth import fpgrowth_diff

    c = load_config(conf)
    kind = c.get("pipeline", "BasicBatchPipeline").lower()
    if kind not in ("basicbatchpipeline", "cubepipeline"):
        raise ValueError(
            f"unsupported pipeline: {c.get('pipeline')!r} (want "
            "BasicBatchPipeline or CubePipeline)")
    df = _load_input(spark, c["inputURI"], base_dir, c)
    attrs = list(c["attributes"])
    ratio_key = c.get("ratioMetric", "globalratio").lower()
    if ratio_key not in _RATIO_MAP:
        raise ValueError(
            f"unsupported ratioMetric: {c.get('ratioMetric')!r} "
            f"(want one of {sorted(set(_RATIO_MAP.values()))})")
    metric_name = _RATIO_MAP[ratio_key]
    min_support = float(c.get("minSupport", 0.01))
    min_ratio = float(c.get("minRatioMetric", 3.0))
    max_order = int(c.get("maxOrder", 3))
    classifier = c.get("classifier", "percentile").lower()
    summarizer = c.get("summarizer", "apriori").lower()

    if kind == "cubepipeline":
        count_col = c.get("countColumn", "count")
        # CubePipeline.getColTypes (:141-196): numeric aggregate columns are
        # DOUBLE regardless of source typing (REST sources arrive as strings)
        numeric = {count_col, c.get("meanColumn"), c.get("stdColumn"),
                   *dict(c.get("quantileColumns") or {})}
        if classifier in ("predicate", "countmeanshift") and not isinstance(
                c.get("cutoff"), str):
            numeric.add(c.get("metric"))
        for col in numeric:
            if col and col in df.columns and not isinstance(
                    df.schema[col].dataType, _NUMERIC_TYPES):
                df = df.withColumn(col, F.col(col).cast("double"))
        inc_hi = bool(c.get("includeHi", True))
        inc_lo = bool(c.get("includeLo", True))
        if classifier == "arithmetic":
            labeled = classify_arithmetic_cubed(
                df, count_col, c["meanColumn"], c["stdColumn"],
                percentile=float(c.get("cutoff", 1.0)),
                include_high=inc_hi, include_low=inc_lo)
        elif classifier == "quantile":
            # config maps column → quantile fraction (cube_quantile.json);
            # the operator takes fraction → column. Duplicate fractions
            # would silently drop all but one column in the inversion —
            # reject them instead of skewing the weighted bands.
            qcols: dict[float, str] = {}
            for qcol, frac in dict(c["quantileColumns"]).items():
                fv = float(frac)
                if fv in qcols:
                    raise ValueError(
                        "quantileColumns maps both "
                        f"{qcols[fv]!r} and {qcol!r} to quantile {fv}; "
                        "fractions must be unique")
                qcols[fv] = qcol
            labeled = classify_quantile_cubed(
                df, count_col, qcols,
                percentile=float(c.get("cutoff", 1.0)),
                include_high=inc_hi, include_low=inc_lo)
        elif classifier == "predicate":
            # PredicateCubeClassifier (string or double cutoff; string
            # comparison is Java compareTo == Spark lexicographic): every
            # entry of a matching group is an outlier → count-scale output
            labeled = classify_predicate(
                df, c["metric"], c.get("predicate", "==").strip(),
                c["cutoff"])
            labeled = labeled.withColumn(
                "_OUTLIER", F.col("_OUTLIER") * F.col(count_col))
        elif classifier == "meanshift":
            # reference: RawClassifier(count, mean) + APLMeanSummarizer with
            # minStdDev = minRatioMetric (CubePipeline.java:248-255,275-283)
            from macrobase_spark.operators.diff import diff_mean_cubed

            return diff_mean_cubed(
                df, attrs, count_col=count_col, mean_col=c["meanColumn"],
                std_col=c["stdColumn"], min_support=min_support,
                min_std_dev=min_ratio, max_order=max_order)
        elif classifier == "countmeanshift":
            # CountMeanShiftCubedClassifier (string or double cutoff) +
            # APLCountMeanShiftSummarizer (CubePipeline.java:199-218,262-269)
            labeled = classify_count_mean_shift(
                df, c["metric"], c["meanColumn"],
                c.get("predicate", "==").strip(), c["cutoff"],
                count_col=count_col)
            return diff_count_mean_shift(
                labeled, attrs, min_support=min_support,
                min_mean_shift=float(c.get("meanShiftRatio", 1.0)),
                max_order=max_order)
        else:
            raise ValueError(f"unsupported cube classifier: {classifier!r}")
        return diff(labeled, attrs, outlier_col="_OUTLIER",
                    count_col=count_col, min_support=min_support,
                    ratio_metric=metric_name, min_ratio=min_ratio,
                    max_order=max_order, outlier_is_count=True)

    # BasicBatchPipeline
    metric = c.get("metric")
    if classifier == "percentile":
        labeled = classify_percentile(
            df, metric, percentile=float(c.get("cutoff", 1.0)),
            include_high=bool(c.get("includeHi", True)),
            include_low=bool(c.get("includeLo", True)))
    elif classifier == "predicate":
        labeled = classify_predicate(
            df, metric, c.get("predicate", "==").strip(), c["cutoff"])
    elif classifier == "countmeanshift":
        labeled = classify_count_mean_shift(
            df, metric, c["meanColumn"], c.get("predicate", "==").strip(),
            c["cutoff"])
    else:
        raise ValueError(f"unsupported classifier: {classifier!r}")

    if summarizer in ("apriori", "aplinear"):
        return diff(labeled, attrs, min_support=min_support,
                    ratio_metric=metric_name, min_ratio=min_ratio,
                    max_order=max_order)
    if summarizer == "fpgrowth":
        return fpgrowth_diff(labeled, attrs, min_support=min_support,
                             min_risk_ratio=min_ratio, max_order=max_order)
    if summarizer == "countmeanshift":
        return diff_count_mean_shift(
            labeled, attrs, min_support=min_support,
            min_mean_shift=float(c.get("meanShiftRatio", 1.0)),
            max_order=max_order)
    raise ValueError(f"unsupported summarizer: {summarizer!r}")
