from macrobase_spark.sources.csv import read_csv_macrobase, write_csv  # noqa: F401
