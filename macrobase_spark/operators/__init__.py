from macrobase_spark.operators.classify import (  # noqa: F401
    classify_percentile,
    classify_predicate,
    classify_count_mean_shift,
    classify_arithmetic_cubed,
    classify_raw,
)
from macrobase_spark.operators.diff import diff  # noqa: F401
from macrobase_spark.operators.transform import (  # noqa: F401
    mad_score,
    zscore,
    normalize_col,
    percentile_col,
    winsorize,
    metric_bucketize,
)
