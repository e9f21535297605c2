"""MacroBase SQL surface for the Spark engine."""

from macrobase_spark.sql.interface import MacroBaseSQL

__all__ = ["MacroBaseSQL"]
