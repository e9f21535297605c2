from macrobase_spark.streaming.windows import (  # noqa: F401
    windowed_diff,
    moving_average,
    streaming_windowed_counts,
)
from macrobase_spark.streaming.stateful import streaming_decayed_diff  # noqa: F401
from macrobase_spark.streaming.ew import ew_percentile_classify  # noqa: F401
from macrobase_spark.streaming.fpgrowth_stream import streaming_fpgrowth  # noqa: F401
from macrobase_spark.streaming.index_ingest import (  # noqa: F401
    apply_stream_batch,
    stream_index_updates,
)
