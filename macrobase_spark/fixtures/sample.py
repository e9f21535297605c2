"""Deterministic re-synthesis of the reference's flagship test table
(`sample`: usage double, latency double, location string, version string —
schema per /root/reference/sql/src/test/resources/import.sql:1; planted
structure per /root/reference/lib/src/test/java/.../UnsupervisedCSVTest.java:21-25:
1000 inliers + 20 outliers, outliers have low usage and all (CAN, v3))."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LOCATIONS = ["USA", "CAN", "RUS", "MEX", "FRA"]
VERSIONS = ["v1", "v2", "v3", "v4"]


def synth_sample(spark: SparkSession, n_inliers: int = 1000, n_outliers: int = 20,
                 seed: int = 7) -> DataFrame:
    rng = np.random.default_rng(seed)
    usage_in = rng.normal(50.0, 5.0, n_inliers)
    lat_in = rng.normal(100.0, 10.0, n_inliers)
    loc_in = rng.choice(LOCATIONS, n_inliers)
    ver_in = rng.choice(VERSIONS, n_inliers)
    usage_out = rng.normal(5.0, 1.0, n_outliers)  # far below the 1st pct
    lat_out = rng.normal(100.0, 10.0, n_outliers)
    pdf = pd.DataFrame(
        {
            "usage": np.concatenate([usage_in, usage_out]),
            "latency": np.concatenate([lat_in, lat_out]),
            "location": np.concatenate([loc_in, ["CAN"] * n_outliers]),
            "version": np.concatenate([ver_in, ["v3"] * n_outliers]),
        }
    )
    return spark.createDataFrame(pdf)
