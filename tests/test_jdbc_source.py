"""JDBC source against an EMBEDDED Derby database (the Derby jars ship with
Spark for the Hive metastore, so the test runs with no external services).
Covers the SQLIngester contract: LIMIT/; stripping, attribute→string +
metric→double typing, equality predicates, and the partitioned parallel
fetch that replaces the reference's single-cursor stream at scale."""

import pytest

from macrobase_spark.sources.jdbc import _strip_sql_junk, read_jdbc_macrobase

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """Create a small Derby DB through the Spark JVM's DriverManager."""
    db = str(tmp_path_factory.mktemp("derby") / "mbdb")
    url = f"jdbc:derby:{db}"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE sensor (id INT, location VARCHAR(8), version VARCHAR(8),"
        " usage_m DOUBLE, ts INT)")
    rows = [
        (1, "USA", "v1", 10.0, 100), (2, "USA", "v2", 20.0, 200),
        (3, "CAN", "v1", 30.0, 300), (4, "CAN", "v3", 99.5, 400),
        (5, "RUS", "v3", 40.0, 500), (6, None, "v2", None, 600),
    ]
    for r in rows:
        loc = "NULL" if r[1] is None else f"'{r[1]}'"
        usage = "NULL" if r[3] is None else str(r[3])
        st.executeUpdate(
            f"INSERT INTO sensor VALUES ({r[0]}, {loc}, '{r[2]}', {usage}, {r[4]})")
    st.close()
    conn.close()
    return url


def test_strip_limit_and_semicolon():
    assert _strip_sql_junk("SELECT * FROM t LIMIT 100;") == "SELECT * FROM t"
    assert _strip_sql_junk("SELECT * FROM t WHERE a = 1") == \
        "SELECT * FROM t WHERE a = 1"
    # LIMIT inside an identifier must survive
    assert "delimit" in _strip_sql_junk("SELECT delimit FROM t")


def test_jdbc_typing_contract(spark, derby):
    """Attributes come back string, metrics double, requested-case aliases —
    even though Derby upper-cases every unquoted identifier. The trailing
    LIMIT would be a Derby syntax error, so its disappearance proves the
    reference's removeLimit behavior."""
    df = read_jdbc_macrobase(
        spark, derby, base_query="SELECT * FROM sensor LIMIT 3;",
        attributes=["location", "version"], metrics=["usage_m"],
        time_column="ts", driver=DERBY_DRIVER)
    assert [f.name for f in df.schema.fields] == \
        ["location", "version", "usage_m", "ts"]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["location"] == "string" and types["usage_m"] == "double"
    collected = df.collect()
    assert len(collected) == 6
    rows = {r["location"]: r for r in collected}
    assert rows["CAN"]["usage_m"] in (30.0, 99.5)
    assert rows[None]["usage_m"] is None  # real SQL NULL, not "NULL"


def test_jdbc_predicates_pushdown(spark, derby):
    """Equality predicates AND together (getRowsSql contract) and reach the
    remote scan as PushedFilters."""
    df = read_jdbc_macrobase(
        spark, derby, table="sensor",
        attributes=["location", "version"], metrics=["usage_m"],
        predicates={"location": "CAN", "version": "v3"}, driver=DERBY_DRIVER)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["usage_m"] == 99.5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LOCATION" in plan.upper()


def test_jdbc_partitioned_parallel_fetch(spark, derby):
    """partition_column + bounds fan the read out to N executor-side
    connections — same rows, N partitions (the scale path)."""
    df = read_jdbc_macrobase(
        spark, derby, table="sensor",
        attributes=["location"], metrics=["usage_m"], time_column="id",
        partition_column="id", lower_bound=1, upper_bound=7,
        num_partitions=3, driver=DERBY_DRIVER)
    assert df.rdd.getNumPartitions() == 3
    single = read_jdbc_macrobase(
        spark, derby, table="sensor",
        attributes=["location"], metrics=["usage_m"], time_column="id",
        driver=DERBY_DRIVER)
    assert sorted(map(tuple, df.collect()), key=repr) == \
        sorted(map(tuple, single.collect()), key=repr)


def test_jdbc_requires_exactly_one_source(spark, derby):
    with pytest.raises(ValueError):
        read_jdbc_macrobase(spark, derby)
    with pytest.raises(ValueError):
        read_jdbc_macrobase(spark, derby, base_query="SELECT 1", table="t")
