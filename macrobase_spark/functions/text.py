"""Text-analysis column expressions for training-data pipelines: tokenization,
token counting, quality scoring, language ID, document fingerprinting.

All JVM-side Catalyst expressions (regexp/split/aggregate) — no Python UDFs —
so they pushdown/codegen and scale linearly with executors. The reference has
no string function library (grammar limited to comparisons/arithmetic,
sql/.../SqlBase.g4:247-253); this is new surface mandated by the target
(BASELINE.json north_star: vectorized tokenization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}


def tokenize_expr(col: str | Column = "text") -> Column:
    """lowercase → split on non-alphanumeric → drop empties.
    The canonical tokenizer for the BM25 index (k1/b fixture spec)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_RE), lambda t: t != "")


def token_count(col: str | Column = "text") -> Column:
    """Whitespace-ish token count (BPE-ish proxy: alnum runs)."""
    return F.size(tokenize_expr(col))


def quality_score(col: str | Column = "text") -> Column:
    """Heuristic document quality in [0,1]: penalize extreme length, high
    punctuation ratio, low lexical diversity (repetition)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokenize_expr(c)
    n = F.size(toks).cast("double")
    n_unique = F.size(F.array_distinct(toks)).cast("double")
    diversity = F.when(n > 0, n_unique / n).otherwise(0.0)
    n_chars = F.length(c).cast("double")
    n_alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")).cast("double")
    punct_ratio = F.when(n_chars > 0, 1.0 - n_alnum / n_chars).otherwise(1.0)
    len_ok = F.when((n >= 5) & (n <= 5000), 1.0).otherwise(0.5)
    return F.round(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0),
            diversity * (F.lit(1.0) - punct_ratio) * len_ok)), 6)


def lang_id(col: str | Column = "text") -> Column:
    """Stopword-overlap language heuristic: the language whose marker set
    overlaps the document's token set most; 'und' (undetermined) on no hit."""
    toks = tokenize_expr(col)
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), lang).otherwise(expr)
    return expr


def fingerprint(col: str | Column = "text") -> Column:
    """Normalized content fingerprint: md5 of the sorted distinct token set
    (whitespace/punct/case/ordering-insensitive) — the classic near-dup
    'fingerprint then exact-match' key."""
    toks = F.array_sort(F.array_distinct(tokenize_expr(col)))
    return F.md5(F.array_join(toks, " "))


def ngrams(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (for Jaccard / MinHash)."""
    toks = tokenize_expr(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))
