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


# GPT-2-style pre-tokenizer shapes, simplified to the lookaround-free
# Java-regex/RE2 common subset (same portability contract as the PII
# patterns): contractions, space-prefixed letter runs, digit runs, and
# punctuation runs. Alternation order matters (leftmost-first agrees
# between engines for lookaround-free patterns): contractions before the
# generic punctuation run, so "don't" counts as ["don", "'t"].
_BPE_TOKEN_RE = (r"'(?:s|d|m|t|ll|ve|re)"
                 r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish token estimate: the number of GPT-2-style pre-tokenizer
    pieces (word / number / punctuation runs, apostrophe contractions) —
    a closer proxy for subword-tokenizer budgets than the whitespace
    count, since punctuation and contractions cost their own tokens.
    True BPE splits long words further, so this is a lower bound; use it
    for packing/chunking budgets where a deterministic, model-free
    estimate is the requirement. One codegen'd regexp_count — no
    Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_BPE_TOKEN_RE))


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


def _lines(col: str | Column) -> Column:
    """Trimmed, non-empty lines of the document as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
                    lambda l: l != "")


def duplicate_line_fraction(col: str | Column = "text") -> Column:
    """Fraction of a document's (trimmed, non-empty) lines that are
    repeats of an earlier line: 1 − distinct/total. One of the Gopher
    repetition signals (Rae et al. 2021, §A1.1) — boilerplate-heavy and
    template-generated pages score high. Pure per-row Catalyst (no
    shuffle); 0.0 for empty / single-line documents."""
    lines = _lines(col)
    n = F.size(lines).cast("double")
    return F.when(
        n > 0,
        F.round(1.0 - F.size(F.array_distinct(lines)).cast("double") / n, 6)
    ).otherwise(0.0)


def duplicate_line_char_fraction(col: str | Column = "text") -> Column:
    """Fraction of line characters that live in DUPLICATED lines (lines
    occurring more than once count all their occurrences) — the
    character-weighted Gopher twin of duplicate_line_fraction: one huge
    repeated block moves this signal even when the line count barely
    shifts. Per-row Catalyst: occurrence counts fold over the distinct
    lines (O(distinct·total) comparisons per document — line counts are
    document-scale, not corpus-scale, so this stays cheap and shuffle-
    free). 0.0 for empty documents."""
    lines = _lines(col)
    stats = F.transform(
        F.array_distinct(lines),
        lambda l: F.struct(
            F.size(F.filter(lines, lambda x: x == l)).alias("cnt"),
            F.length(l).alias("len")))
    tot = F.aggregate(stats, F.lit(0).cast("long"),
                      lambda a, s: a + s["cnt"].cast("long") * s["len"])
    dup = F.aggregate(
        stats, F.lit(0).cast("long"),
        lambda a, s: a + F.when(s["cnt"] > 1,
                                s["cnt"].cast("long") * s["len"])
                          .otherwise(F.lit(0).cast("long")))
    return F.when(tot > 0,
                  F.round(dup.cast("double") / tot.cast("double"), 6)
                  ).otherwise(0.0)


def top_ngram_char_fraction(col: str | Column = "text", n: int = 2) -> Column:
    """Fraction of the normalized text's characters covered by the single
    most frequent word n-gram: count·len(gram) / len(join(tokens)) — the
    Gopher "top n-gram fraction" repetition signal (n=2..4 in the paper).
    Ties break to the lexicographically smallest gram (deterministic).
    Documents shorter than n tokens shingle to one whole-text pseudo-gram
    (fraction 1.0, maximally repetitive-trivial), matching ngrams();
    empty documents score 0.0. Per-row Catalyst, same fold shape as
    duplicate_line_char_fraction.

    NOTE: the value can EXCEED 1.0 for highly repetitive text because
    count·len(gram) double-counts characters shared by overlapping
    shingles (tokens ['a','a','a','a'] at n=2 → 3·3/7 ≈ 1.286). Treat it
    as a repetition *score*, not a bounded proportion, when picking
    Gopher-style thresholds. (Kept unclamped: the q15 driver gate hashes
    these exact values.)"""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokenize_expr(c)
    grams = ngrams(c, n)
    stats = F.transform(
        F.array_distinct(grams),
        lambda g: F.struct(
            F.size(F.filter(grams, lambda x: x == g)).alias("cnt"),
            g.alias("gram")))
    top = F.aggregate(
        stats,
        F.struct(F.lit(-1).alias("cnt"), F.lit("").alias("gram")),
        lambda acc, s: F.when(
            (s["cnt"] > acc["cnt"])
            | ((s["cnt"] == acc["cnt"]) & (s["gram"] < acc["gram"])),
            s).otherwise(acc))
    norm_len = F.length(F.array_join(toks, " ")).cast("double")
    return F.when(
        norm_len > 0,
        F.round(top["cnt"].cast("double") * F.length(top["gram"]) / norm_len,
                6)
    ).otherwise(0.0)


# Gopher quality-filter stopwords (Rae et al. 2021 §A1.1: a document must
# contain at least 2 of these to pass the "required words" rule)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signals(col: str | Column = "text") -> Column:
    """The Gopher rule-based quality signals (Rae et al. 2021 §A1.1) as
    ONE struct column — each field is a per-row Catalyst expression (no
    shuffle, no Python), so the whole battery rides a single projection:

      n_words            whitespace-token count
      mean_word_len      mean characters per whitespace token
      symbol_ratio       '#' + '...' occurrences / words
      bullet_line_frac   fraction of lines starting with a bullet mark
      ellipsis_line_frac fraction of lines ending with '...' or '…'
      alpha_word_frac    fraction of words containing ≥1 [a-z] char
      n_required         how many of the 8 Gopher stopwords appear

    Whitespace tokens (not the BM25 tokenizer) — the paper's rules count
    raw words; empty documents yield zeros."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.aggregate(words, F.lit(0).cast("long"),
                             lambda a, w: a + F.length(w))
    lines = _lines(c)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(F.filter(
        lines, lambda l: l.rlike(r"^(\-|\*|•|●|‣)")))
    ellipsis = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(
        words, lambda w: F.lower(w).rlike("[a-z]")))
    toks = tokenize_expr(c)
    required = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])))
    hashes = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    dots = (F.length(c)
            - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / F.lit(3)
    return F.struct(
        n_words.cast("long").alias("n_words"),
        F.when(n_words > 0,
               F.round(word_chars.cast("double") / nw, 6))
        .otherwise(0.0).alias("mean_word_len"),
        F.round((hashes + dots).cast("double") / nw, 6)
        .alias("symbol_ratio"),
        F.round(bullet.cast("double") / n_lines, 6)
        .alias("bullet_line_frac"),
        F.round(ellipsis.cast("double") / n_lines, 6)
        .alias("ellipsis_line_frac"),
        F.when(n_words > 0, F.round(alpha.cast("double") / nw, 6))
        .otherwise(0.0).alias("alpha_word_frac"),
        required.cast("int").alias("n_required"),
    )


def gopher_keep(
    col: str | Column = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> Column:
    """Boolean keep decision under the Gopher quality rules (paper
    defaults; every threshold overridable). Compose with the repetition
    signals for the full filter:

        df.filter(gopher_keep("text")
                  & (duplicate_line_fraction("text") <= 0.30)
                  & (top_ngram_char_fraction("text", 2) <= 0.20))

    A pure codegen'd boolean — the filter pushes to the scan and drops
    rows before anything downstream shuffles."""
    s = gopher_signals(col)
    return ((s["n_words"] >= min_words) & (s["n_words"] <= max_words)
            & (s["mean_word_len"] >= min_mean_word_len)
            & (s["mean_word_len"] <= max_mean_word_len)
            & (s["symbol_ratio"] <= max_symbol_ratio)
            & (s["bullet_line_frac"] <= max_bullet_line_frac)
            & (s["ellipsis_line_frac"] <= max_ellipsis_line_frac)
            & (s["alpha_word_frac"] >= min_alpha_word_frac)
            & (s["n_required"] >= min_required_words))


# PII patterns: RE2-compatible (no lookaround/backrefs) so the same pattern
# text runs identically under Spark's Java regex and DuckDB's RE2 — keeps
# the scrubbing oracle-checkable. Ordering matters: emails/IPs/SSNs before
# the phone pattern (which would otherwise half-eat their digits).
#
# Phone precision (r5): the old pattern counted SEPARATORS toward its
# length ('\+?[0-9][0-9()\-. ]{7,14}[0-9]'), so every ISO date, long
# decimal, and version string was redacted — corpus corruption at scale.
# The rewrite anchors on DIGIT counts per shape, alternation order
# most-specific first (leftmost-first semantics agree between Java regex
# and RE2 for lookaround-free patterns):
#   1. E.164 compact: '+' then 7-15 contiguous digits
#   2. intl with groups: '+' cc, then a 2-4 digit group and 2-4 more
#      separator-led groups (min 7 digits total; dates never carry '+')
#   3. parenthesized NANP: (3) [sep] 3 sep 4
#   4. bare NANP: 3 sep 3 sep 4 — a date's middle group is 2 digits, a
#      decimal has no interior separators, so neither shape can match
# Bare unseparated 10-digit runs are deliberately NOT redacted (a decimal's
# fraction is indistinguishable without lookbehind) — precision over
# recall, as a pre-training scrub must not destroy numerics.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone",
     r"\+[0-9]{7,15}\b"
     r"|\+[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?([-. ][0-9]{2,4}){2,4}\b"
     r"|\([0-9]{3}\)[-. ]?[0-9]{3}[-. ][0-9]{4}\b"
     r"|\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
]


def scrub_pii(col: str | Column = "text",
              replacement: str = "[{kind}]") -> Column:
    """Replace common PII (emails, IPv4s, phone-like digit runs, SSNs) with
    typed placeholders — the standard pre-training scrub pass. Pure
    Catalyst `regexp_replace` chain: codegen'd, no Python in the row path,
    linear scan per doc. `replacement` may reference {kind}.

    Recall/precision are heuristic by design (regex PII scrubbing always
    is); patterns are deliberately RE2-safe so the exact same behavior is
    reproducible in DuckDB for oracle checks."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, replacement.format(kind=kind))
    return out


def pii_counts(col: str | Column = "text") -> Column:
    """Struct of per-kind PII match counts (for filtering/reporting without
    rewriting the text): `F.col('c.email')` etc. Same patterns as
    scrub_pii, applied progressively (each kind counted on text already
    scrubbed of the previous kinds, so overlapping matches are not
    double-counted — identical semantics to the scrub chain)."""
    c = F.col(col) if isinstance(col, str) else col
    fields = []
    cur = c
    for kind, pat in PII_PATTERNS:
        fields.append(F.size(F.split(cur, pat)) - 1)
        # replace with the SAME typed placeholder scrub_pii uses — deleting
        # with '' would merge surrounding digit runs into phantom matches
        # for later patterns, diverging from what scrub_pii redacts
        cur = F.regexp_replace(cur, pat, f"[{kind}]")
    return F.struct(*[f.alias(k) for f, (k, _) in zip(fields, PII_PATTERNS)])
