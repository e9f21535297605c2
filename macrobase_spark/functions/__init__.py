from macrobase_spark.functions.text import (  # noqa: F401
    tokenize_expr,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    scrub_pii,
    pii_counts,
)
