"""Iceberg source (north-rule input: Iceberg table of transcripts).

The sandbox image ships no Iceberg runtime jars, so the connector is gated
behind capability detection: with `spark.sql.catalog.*` configured and the
iceberg-spark-runtime jar on the classpath, reads go through the real
Iceberg catalog (snapshot isolation, partition pruning on (conv_id bucket,
days(ts)) — the layout the build assumes); otherwise identifiers fall back
to parquet paths with identical downstream semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # py4j attribute access on a MISSING class silently yields a JavaPackage
    # (it never raises), so the old attribute probe always said True and the
    # parquet fallback was dead code (r4 review) — Class.forName actually
    # resolves the class
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read an Iceberg table identifier (`catalog.db.table`) or, when the
    Iceberg runtime is absent / the identifier is a path, a parquet path."""
    if "/" not in identifier and iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.parquet(identifier)


def write_table(df: DataFrame, identifier: str, mode: str = "append") -> None:
    """Write to Iceberg when available (fan-out write with distribution by
    partition spec); parquet path otherwise. mode='append' appends to the
    existing table (creating it if absent); 'overwrite' replaces it — the
    old code createOrReplace'd unconditionally, silently dropping prior
    rows on the DEFAULT append mode (r4 review)."""
    spark = df.sparkSession
    if "/" not in identifier and iceberg_available(spark):
        writer = df.writeTo(identifier).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        elif spark.catalog.tableExists(identifier):
            # existence probed explicitly: the old try/append-except/create
            # masked REAL append failures (network, permissions, schema
            # mismatch) as a confusing "table already exists" from create()
            writer.append()
        else:
            writer.create()  # first write: table does not exist yet
        return
    df.write.mode(mode).parquet(identifier)
