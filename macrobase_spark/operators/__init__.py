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
from macrobase_spark.operators.mcd import (  # noqa: F401
    mad_or_mcd,
    mcd_fit,
    mcd_score,
)
from macrobase_spark.operators.density import gmm_score, kde_score  # noqa: F401
from macrobase_spark.operators.timeseries import (  # noqa: F401
    ar_scores,
    autocorrelation,
    fft_features,
    kalman_smooth,
)
from macrobase_spark.operators.transform import (  # noqa: F401
    linear_metric_normalizer,
    random_projection,
    truncate,
)
