from macrobase_spark.streaming.windows import (  # noqa: F401
    windowed_diff,
    moving_average,
    streaming_windowed_counts,
)
