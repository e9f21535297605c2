"""Pure-Python XXH64 must agree bit-for-bit with Spark's xxhash64 (seed 42)
— it drives query-side bucket partition pruning."""

from pyspark.sql import functions as F

from macrobase_spark.index.xxh64 import xxh64


def test_xxh64_matches_spark(spark):
    samples = [
        "", "a", "the", "rare7", "tok0042", "x" * 7, "y" * 8, "z" * 9,
        "m" * 31, "n" * 32, "o" * 33, "long-term-" * 20,
        "unicode-éüñ", "tab\tnewline\n", "0123456789abcdef",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {r["t"]: r["h"] for r in df.select("t", F.xxhash64("t").alias("h")).collect()}
    for s in samples:
        assert xxh64(s.encode("utf-8")) == got[s], s
