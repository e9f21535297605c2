"""REST source — the reference's RESTDataFrameLoader re-expressed for Spark
(core/.../ingest/RESTDataFrameLoader.java:18-140: GET or POST with custom
headers / JSON body, response body parsed as CSV into a typed DataFrame).

Two shapes:
- read_rest: ONE endpoint, fetched driver-side (the reference also loads on
  a single node) and parallelized with spark.createDataFrame — right for
  control-plane-sized payloads.
- read_rest_partitioned: MANY endpoint URLs (pages, shards, per-day
  exports), fetched ON THE EXECUTORS via mapInPandas — the scale path: each
  partition pulls its own URLs, so ingest bandwidth scales with the
  cluster, and a failed fetch fails only its task (Spark retries it).

stdlib urllib only (no HTTP client dependency); the reference's
trust-all-certs behavior is NOT replicated (verification stays on unless
the caller passes an ssl context)."""

from __future__ import annotations

import csv
import io
import json as _json
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fetch(url: str, method: str = "GET", headers: dict | None = None,
           json_body: str | None = None, get_params: dict | None = None,
           timeout: float = 30.0) -> str:
    if get_params:
        from urllib.parse import urlencode

        sep = "&" if "?" in url else "?"
        url = f"{url}{sep}{urlencode(get_params)}"
    data = None
    req_headers = dict(headers or {})
    if method.upper() == "POST":
        data = (json_body or "").encode()
        req_headers.setdefault("Content-Type", "application/json")
    req = urllib.request.Request(url, data=data, headers=req_headers,
                                 method=method.upper())
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read().decode()


def _parse_body(body: str, fmt: str) -> tuple[list[str], list[list[str]]]:
    if fmt == "json":
        rows = _json.loads(body)
        if isinstance(rows, dict):  # common {"data": [...]} envelope
            rows = rows.get("data", rows.get("rows", []))
        cols = list(rows[0].keys()) if rows else []
        return cols, [[str(r.get(c)) if r.get(c) is not None else None
                       for c in cols] for r in rows]
    reader = csv.reader(io.StringIO(body))
    all_rows = [r for r in reader if r]
    return all_rows[0], all_rows[1:]


def read_rest(
    spark: SparkSession,
    url: str,
    method: str = "GET",
    headers: dict | None = None,
    json_body: str | None = None,
    get_params: dict | None = None,
    fmt: str = "csv",
    types: dict[str, str] | None = None,
    timeout: float = 30.0,
) -> DataFrame:
    """Fetch one endpoint → typed DataFrame. `types` maps column → Spark
    type name (unlisted columns stay string), mirroring the reference's
    setColumnTypes."""
    body = _fetch(url, method, headers, json_body, get_params, timeout)
    cols, rows = _parse_body(body, fmt)
    df = spark.createDataFrame(rows or [], ", ".join(f"`{c}` string" for c in cols)
                               if cols else "value string")
    for c, t in (types or {}).items():
        df = df.withColumn(c, F.col(c).cast(t))
    return df


def read_rest_partitioned(
    spark: SparkSession,
    urls: list[str],
    headers: dict | None = None,
    fmt: str = "csv",
    types: dict[str, str] | None = None,
    timeout: float = 30.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fetch many endpoints on the executors; union of all pages. All pages
    must share a schema (the first page of the first partition defines the
    column order)."""
    if not urls:
        raise ValueError("read_rest_partitioned: empty url list — nothing "
                         "to fetch (compute at least one page URL)")
    import pandas as pd

    url_df = spark.createDataFrame([(u,) for u in urls], "url string")
    if num_partitions:
        url_df = url_df.repartition(num_partitions)

    # schema discovery from page one (driver-side, one fetch)
    first_cols, _ = _parse_body(_fetch(urls[0], headers=headers,
                                       timeout=timeout), fmt)
    schema = ", ".join(f"`{c}` string" for c in first_cols)

    def fetch_part(batches):
        for pdf in batches:
            for u in pdf["url"]:
                cols, rows = _parse_body(
                    _fetch(u, headers=headers, timeout=timeout), fmt)
                if rows:
                    out = pd.DataFrame(rows, columns=cols)
                    yield out[first_cols]

    df = url_df.mapInPandas(fetch_part, schema=schema)
    for c, t in (types or {}).items():
        df = df.withColumn(c, F.col(c).cast(t))
    return df
