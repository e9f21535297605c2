"""JDBC source (§2.1) with the reference's SQL-ingest contract.

Reference: legacy/src/main/java/macrobase/ingest/SQLIngester.java:57-216 —
the v0 primary ingest. Its contract:
- a base query (arbitrary SELECT) with any trailing ``LIMIT n`` and ``;``
  stripped before wrapping (SQLIngester.java:89-95 removeLimit/removeSqlJunk);
- the projection is attributes + metrics (+ optional time column), wrapped as
  ``SELECT cols FROM (base) baseQuery`` (SQLIngester.java:185-195);
- attributes are read as strings (fed to the AttributeEncoder), metrics as
  doubles (the Datum metric vector), SQLIngester.java:216+ getNext();
- equality predicates AND-ed onto the base query (getRowsSql, :117-135).

Spark-first: ``spark.read.jdbc`` with the cleaned base query as a pushed-down
subquery — the projection and predicates reach the remote database as SQL
(Catalyst JDBC pushdown), nothing is fetched then filtered. The 100 TB path
is the partitioned read: ``partition_column`` + bounds fan the fetch out to
``num_partitions`` parallel executor connections instead of one driver-side
cursor (the reference streams through a single ResultSet).

The reference also orders the stream by the time column (its operators are
sequential); Spark operators order within window/group scopes themselves, so
a global ORDER BY would be a needless total sort at scale — opt in with
``order_by_time=True`` only when a collected, time-ordered frame is wanted.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LIMIT_RE = re.compile(r"(?i)\bLIMIT\s+\d+")


def _strip_sql_junk(sql: str) -> str:
    """removeLimit + removeSqlJunk (SQLIngester.java:89-95)."""
    return _LIMIT_RE.sub("", sql).replace(";", "").strip()


def read_jdbc_macrobase(
    spark: SparkSession,
    url: str,
    base_query: str | None = None,
    table: str | None = None,
    attributes: list[str] | tuple[str, ...] = (),
    metrics: list[str] | tuple[str, ...] = (),
    time_column: str | None = None,
    predicates: dict[str, str] | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    order_by_time: bool = False,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """DataFrame over a JDBC base query with the reference's typing contract:
    attributes cast to string, metrics to double, optional time column kept.
    Exactly one of ``base_query`` / ``table`` is required. Column names are
    resolved case-insensitively (JDBC metadata case varies by engine) and
    aliased back to the requested spelling."""
    if (base_query is None) == (table is None):
        raise ValueError("provide exactly one of base_query or table")
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable",
                      table if table is not None
                      else f"({_strip_sql_junk(base_query)}) mb_base"))
    if driver:
        reader = reader.option("driver", driver)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column needs lower_bound, upper_bound "
                             "and num_partitions")
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    df = reader.load()

    by_lower: dict[str, list[str]] = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), []).append(c)

    def _resolve(name: str) -> str:
        if name in df.columns:
            return name
        got = by_lower.get(name.lower())
        if not got:
            raise ValueError(f"column {name!r} not in JDBC result "
                             f"({df.columns})")
        if len(got) > 1:
            # quoted identifiers can make a result carry both "ID" and
            # "id" — binding case-insensitively to either would silently
            # read the wrong data
            raise ValueError(
                f"column {name!r} is ambiguous in the JDBC result: "
                f"{got} differ only in case — use the exact name")
        return got[0]

    # equality predicates — AND semantics like getRowsSql; expressed as
    # Catalyst filters so they push down into the remote query
    for col, val in (predicates or {}).items():
        df = df.filter(F.col(_resolve(col)) == F.lit(val))

    proj = []
    for a in attributes:
        proj.append(F.col(_resolve(a)).cast("string").alias(a))
    for m in metrics:
        proj.append(F.col(_resolve(m)).cast("double").alias(m))
    if time_column is not None:
        proj.append(F.col(_resolve(time_column)).alias(time_column))
    if proj:
        df = df.select(*proj)
    if order_by_time and time_column is not None:
        df = df.orderBy(time_column)
    return df
