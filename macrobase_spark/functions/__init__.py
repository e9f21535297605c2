from macrobase_spark.functions.text import (  # noqa: F401
    tokenize_expr,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    scrub_pii,
    pii_counts,
    duplicate_line_fraction,
    duplicate_line_char_fraction,
    top_ngram_char_fraction,
    gopher_signals,
    gopher_keep,
)
