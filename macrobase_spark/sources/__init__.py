from macrobase_spark.sources.csv import read_csv_macrobase, write_csv  # noqa: F401
from macrobase_spark.sources.rest import read_rest, read_rest_partitioned  # noqa: F401
from macrobase_spark.sources.jdbc import read_jdbc_macrobase  # noqa: F401
