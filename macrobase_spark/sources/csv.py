"""Sources/sinks (§2.1): CSV with the reference's conventions, parquet/JSON
passthroughs, table registration.

Reference CSV semantics (lib/.../ingest/CSVDataFrameParser.java:72-150):
- user-supplied column→type map; unlisted columns default to STRING;
- nulls: literal "NULL" string for STRING columns, NaN for DOUBLE columns;
- required-columns projection pushed into the scan.

Spark-first: spark.read.csv with explicit schema (never inferSchema in
production paths — one pass, no sampling job), projection via select (pruned
into the scan by Catalyst).

The SQL layer's IMPORT (sql/.../QueryEngine.java:97-108) maps to
``register_table``; INTO OUTFILE (SqlBase.g4:158-169, CSVDataFrameWriter)
maps to ``write_csv`` with custom delimiters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPES = {"string": T.StringType(), "double": T.DoubleType()}


def read_csv_macrobase(
    spark: SparkSession,
    path: str,
    column_types: dict[str, str],
    required_columns: list[str] | None = None,
    reference_null_convention: bool = False,
) -> DataFrame:
    """CSV → DataFrame with the reference's type-map contract.

    column_types: name → 'string' | 'double'; other header columns load as
    string. With reference_null_convention=True, replicate the "NULL"/NaN
    fill (for golden-CSV parity); default keeps real SQL NULLs.
    """
    bad = {c: t for c, t in column_types.items() if t not in _TYPES}
    if bad:
        raise ValueError(
            f"unsupported column types {bad} — the v0 ingest contract "
            f"knows {sorted(_TYPES)} (a typo here would silently load the "
            "column as string and fail far downstream)")
    header = spark.read.csv(path, header=True).schema.fieldNames()
    fields = [
        T.StructField(c, _TYPES[column_types.get(c, "string")], True)
        for c in header
    ]
    df = spark.read.csv(path, header=True, schema=T.StructType(fields))
    if required_columns:
        df = df.select(*required_columns)
    if reference_null_convention:
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType):
                df = df.withColumn(f.name, F.coalesce(F.col(f.name), F.lit("NULL")))
            elif isinstance(f.dataType, T.DoubleType):
                df = df.withColumn(
                    f.name, F.coalesce(F.col(f.name), F.lit(float("nan"))))
    return df


def write_csv(df: DataFrame, path: str, field_delimiter: str = ",",
              line_delimiter: str = "\n", header: bool = True) -> None:
    """CSV sink with custom delimiters (INTO OUTFILE ... FIELDS TERMINATED BY).
    Reference: lib/.../ingest/CSVDataFrameWriter.java:26-39."""
    (df.write.mode("overwrite")
       .option("sep", field_delimiter)
       .option("lineSep", line_delimiter)
       .csv(path, header=header))


def register_table(spark: SparkSession, df: DataFrame, name: str) -> None:
    """IMPORT ... INTO t: named in-memory table (temp view) —
    sql/.../QueryEngine.java:81,97-108 table catalog."""
    df.createOrReplaceTempView(name)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSONL source with explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)
