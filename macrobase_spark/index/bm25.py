"""BM25 top-k query over the inverted index, plus an exact pure-Python oracle
for rank-identity testing.

Scoring (Robertson/Lucene BM25, k1=1.2, b=0.75):
    idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Query plan:
  postings parquet → filter term IN query_terms   (row-group pruning: the
    postings files are sorted by term within bucket partitions, so parquet
    min/max statistics skip non-matching row groups — index lookup, not scan)
  → mapInPandas decode+score (numpy; per-term block-max pruning keeps only
    blocks whose BM25 upper bound can still reach the per-partition top-k —
    the block-max-WAND idea, safe/exact because bounds are conservative)
  → per-partition top-k candidates → groupBy(doc_id) sum across terms
  → global orderBy(score desc, doc_id asc) LIMIT k.

Determinism/rank-identity: postings are scored in docID order with float64
throughout; ties broken by ascending doc_id. Scores are identical bits to the
oracle because each (term, doc) contribution is computed independently and
the per-doc sum adds terms in ascending-term order both here and in the
oracle.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from macrobase_spark.index.build import read_index, K1, B, BLOCK_SIZE
from macrobase_spark.index.tokenize import TOKEN_PATTERN


def _tokenize_query(q: str) -> list[str]:
    import re

    return sorted(set(re.findall(TOKEN_PATTERN, q.lower())))


import re as _re

# query micro-syntax: `-tok` at a token boundary is an exclusion
# (MUST_NOT), a trailing `*` is a prefix wildcard, a trailing `~N` is a
# fuzzy match within N edits (Lucene FuzzyQuery syntax, N in 1..2), a
# trailing `^2.5` is a query-time boost; a hyphen INSIDE a word
# ("well-known") is not an exclusion — the lookbehind requires whitespace
# or start-of-query before the minus. `*` and `~` are mutually exclusive
# on one token.
_BOOST = r"(?:\^[0-9]+(?:\.[0-9]+)?)?"
_QTOK_RE = _re.compile(
    r"(?:^|(?<=\s))-" + TOKEN_PATTERN + r"(?:\*|~[12])?" +
    r"|" + TOKEN_PATTERN + r"(?:\*|~[12])?" + _BOOST)


class ParsedQuery:
    """Structured query parse. `boosts` maps a term / prefix / fuzzy /
    regex token (as written, without its `*`/`~N` suffix or `/` fences)
    to its multiplier; tokens without `^` are absent (1.0).
    `fuzzies`/`neg_fuzzies` map the token to its max edit distance;
    `regexes`/`neg_regexes` hold `/pat/` patterns (fences stripped)."""

    __slots__ = ("terms", "prefixes", "neg_terms", "neg_prefixes",
                 "boosts", "fuzzies", "neg_fuzzies", "regexes",
                 "neg_regexes")

    def __init__(self):
        self.terms: set[str] = set()
        self.prefixes: set[str] = set()
        self.neg_terms: set[str] = set()
        self.neg_prefixes: set[str] = set()
        self.boosts: dict[str, float] = {}
        self.fuzzies: dict[str, int] = {}
        self.neg_fuzzies: dict[str, int] = {}
        self.regexes: set[str] = set()
        self.neg_regexes: set[str] = set()


# `/pat/` at a token boundary is a regexp term query (Lucene RegexpQuery
# syntax); `-/pat/` excludes, `/pat/^2` boosts. The pattern body may not
# contain whitespace or '/'. Extracted BEFORE ordinary tokenization so
# the pattern's alnum runs never leak in as bare terms.
_QREGEX_RE = _re.compile(
    r"(?:^|(?<=\s))(-?)/([^/\s]+)/(\^[0-9]+(?:\.[0-9]+)?)?(?=\s|$)")


def _parse_query_full(q: str) -> ParsedQuery:
    pq = ParsedQuery()
    ql = q.lower()

    def _take_regex(m: "_re.Match") -> str:
        neg, pat, boost = m.group(1), m.group(2), m.group(3)
        if neg:
            pq.neg_regexes.add(pat)
        else:
            pq.regexes.add(pat)
            if boost:
                pq.boosts[pat] = max(float(boost[1:]),
                                     pq.boosts.get(pat, 0.0))
        return " "

    ql = _QREGEX_RE.sub(_take_regex, ql)
    for tok in _QTOK_RE.findall(ql):
        neg = tok.startswith("-")
        if neg:
            tok = tok[1:]
        boost = None
        if "^" in tok:
            tok, _, b = tok.partition("^")
            boost = float(b)
        star = tok.endswith("*")
        if star:
            tok = tok[:-1]
        fuzz = None
        if "~" in tok:
            tok, _, f = tok.partition("~")
            fuzz = int(f)
        if not tok:
            continue
        if neg:
            if fuzz is not None:
                pq.neg_fuzzies[tok] = max(fuzz, pq.neg_fuzzies.get(tok, 0))
            elif star:
                pq.neg_prefixes.add(tok)
            else:
                pq.neg_terms.add(tok)
            continue
        if fuzz is not None:
            # repeated token with different distances: the wider wins
            pq.fuzzies[tok] = max(fuzz, pq.fuzzies.get(tok, 0))
        elif star:
            pq.prefixes.add(tok)
        else:
            pq.terms.add(tok)
        if boost is not None:
            # repeated token with different boosts: the larger wins
            # (deterministic; Lucene would sum duplicate clauses, but
            # this engine dedups terms)
            pq.boosts[tok] = max(boost, pq.boosts.get(tok, 0.0))
    return pq


def _parse_query(q: str) -> tuple[list[str], list[str], list[str],
                                  list[str], dict[str, float]]:
    """Legacy 5-tuple view of _parse_query_full → (terms, prefixes,
    neg_terms, neg_prefixes, boosts); fuzzy tokens are NOT included —
    callers that support fuzzy use _parse_query_full."""
    pq = _parse_query_full(q)
    return (sorted(pq.terms), sorted(pq.prefixes), sorted(pq.neg_terms),
            sorted(pq.neg_prefixes), pq.boosts)


def _tokenize_query_wild(q: str) -> tuple[list[str], list[str]]:
    """Positive side of the query only: (exact terms, prefix patterns).
    Exclusion tokens (`-tok`) are dropped — callers that render or expand
    positives (snippets) must not treat an excluded term as a match.
    Fuzzy tokens are reported as their base term (a snippet highlights
    the exact spelling; ≥1-edit variants of a fuzzy hit are not
    underlined — they'd need the expansion set, which requires the
    index)."""
    pq = _parse_query_full(q)
    return (sorted(pq.terms | set(pq.fuzzies)), sorted(pq.prefixes))


def _expand_prefixes(postings: DataFrame, prefixes: list[str],
                     max_expansions: int,
                     total_cap: int | None = None) -> list[str]:
    """Expand prefix wildcards against the index's term dictionary.

    The scan cannot bucket-prune (term → bucket is a hash, so a prefix
    spans every bucket) but it reads ONLY the tiny `term` column of the
    postings parquet — column pruning keeps the posting blobs untouched,
    so at 100 TB this is a dictionary scan, not an index scan. Expansion
    is bounded: more than `max_expansions` matching terms raises loudly
    (rank-exactness over silent truncation — Lucene's
    maxClauseCount/TooManyClauses policy)."""
    cap = max_expansions if total_cap is None else total_cap
    cond = F.col("term").startswith(prefixes[0])
    for p in prefixes[1:]:
        cond = cond | F.col("term").startswith(p)
    rows = (postings.filter(cond).select("term").distinct()
            .limit(cap + 1).collect())
    if len(rows) > cap:
        raise ValueError(
            f"prefix wildcard(s) {prefixes!r} expand to more than "
            f"{max_expansions} terms — narrow the prefix or raise "
            "max_expansions")
    return sorted(r["term"] for r in rows)


# field-scoped query sugar: `role:assistant merge scan` restricts the
# rankable docs to role='assistant' — Lucene field-query syntax mapped onto
# the docs-table metadata predicate (doc_filter). Recognized fields are the
# string metadata columns the index persists; values are a conservative
# charset (no quotes), so inlining into the SQL predicate is injection-safe.
_SCOPE_FIELDS = ("conv_id", "role", "tool")
_FIELD_SCOPE_RE = _re.compile(
    r"(?:^|(?<=\s))(-?)(" + "|".join(_SCOPE_FIELDS) +
    r"):([A-Za-z0-9_.\-]+)")


def _split_field_scopes(q: str) -> tuple[str, str | None]:
    """Strip `field:value` tokens from the query and render them as a SQL
    predicate over the docs metadata: same-field values OR together
    (role:user role:tool = either), distinct fields AND (Lucene's implicit
    per-field disjunction under a conjunctive filter). `-field:value`
    negates (MUST_NOT the scope): same-field negatives AND together as a
    NOT IN — a NULL metadata value never matches a positive scope and
    never survives a negative one (SQL three-valued logic is deliberately
    NOT papered over; transcripts carry NULL tool for non-tool turns)."""
    scopes: dict[str, set[str]] = {}
    neg_scopes: dict[str, set[str]] = {}

    def _take(m: "_re.Match[str]") -> str:
        target = neg_scopes if m.group(1) else scopes
        target.setdefault(m.group(2).lower(), set()).add(m.group(3))
        return ""

    stripped = _FIELD_SCOPE_RE.sub(_take, q)
    if not scopes and not neg_scopes:
        return q, None
    preds = []
    for f in sorted(scopes):
        vs = sorted(scopes[f])
        preds.append(f"{f} = '{vs[0]}'" if len(vs) == 1 else
                     f"{f} IN (" + ", ".join(f"'{v}'" for v in vs) + ")")
    for f in sorted(neg_scopes):
        vs = sorted(neg_scopes[f])
        preds.append(f"{f} <> '{vs[0]}'" if len(vs) == 1 else
                     f"{f} NOT IN (" + ", ".join(f"'{v}'" for v in vs) + ")")
    return stripped, " AND ".join(preds)


def _merge_doc_filter(doc_filter: str | None, scope: str | None) -> str | None:
    if scope is None:
        return doc_filter
    return scope if doc_filter is None else f"({doc_filter}) AND ({scope})"


def _sort_columns(sort_by: str):
    """Parse a 'col [asc|desc][, col [asc|desc]]*' spec into Spark sort
    columns (metadata column names only — not expressions; determinism
    comes from the doc_id tiebreak the caller appends)."""
    cols = []
    names = []
    for part in sort_by.split(","):
        toks = part.strip().split()
        if not toks or len(toks) > 2 or not toks[0].isidentifier():
            raise ValueError(
                f"sort_by: expected 'column [asc|desc]' items, got "
                f"{part.strip()!r}")
        direction = toks[1].lower() if len(toks) == 2 else "asc"
        if direction not in ("asc", "desc"):
            raise ValueError(f"sort_by: direction must be asc|desc, got "
                             f"{toks[1]!r}")
        c = F.col(toks[0])
        cols.append(c.desc() if direction == "desc" else c.asc())
        names.append(toks[0])
    return cols, names


def _edit_distance(a: str, b: str, limit: int) -> int:
    """Levenshtein distance with an early exit above `limit` (returns
    limit+1). Driver-side only, over dictionary-scan candidates."""
    if abs(len(a) - len(b)) > limit:
        return limit + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            cur.append(v)
            row_min = min(row_min, v)
        if row_min > limit:
            return limit + 1
        prev = cur
    return prev[-1]


def _expand_fuzzy(postings: DataFrame, fuzzies: dict[str, int],
                  max_expansions: int) -> dict[str, list[str]]:
    """Expand fuzzy tokens (`tok~N`) against the term dictionary: every
    indexed term within N edits of the token (Lucene FuzzyQuery's
    dictionary-intersection rewrite, done as a length-banded levenshtein
    filter instead of a Levenshtein automaton — the same column-pruned
    term-only scan as _expand_prefixes, so blobs are never read).
    Candidate assignment back to tokens happens driver-side with a
    limit-banded DP. Per-token expansions above max_expansions raise
    loudly (the TooManyClauses policy); the combined scan is capped at
    max_expansions·len(fuzzies)."""
    cond = None
    for tok, nmax in sorted(fuzzies.items()):
        c = ((F.length("term") >= len(tok) - nmax)
             & (F.length("term") <= len(tok) + nmax)
             & (F.levenshtein(F.col("term"), F.lit(tok)) <= nmax))
        cond = c if cond is None else (cond | c)
    cap = max_expansions * len(fuzzies)
    rows = (postings.filter(cond).select("term").distinct()
            .limit(cap + 1).collect())
    if len(rows) > cap:
        raise ValueError(
            f"fuzzy token(s) {sorted(fuzzies)!r} expand to more than "
            f"{cap} dictionary terms combined — tighten the distance or "
            "raise max_expansions")
    out: dict[str, list[str]] = {t: [] for t in fuzzies}
    for r in rows:
        term = r["term"]
        for tok, nmax in fuzzies.items():
            if _edit_distance(tok, term, nmax) <= nmax:
                out[tok].append(term)
    for tok in out:
        if len(out[tok]) > max_expansions:
            raise ValueError(
                f"fuzzy token {tok!r}~{fuzzies[tok]} expands to more "
                f"than {max_expansions} terms — tighten the distance or "
                "raise max_expansions")
        out[tok] = sorted(out[tok])
    return out


def _reject_regexes(pq: "ParsedQuery", where: str) -> None:
    """Regexp tokens are a bm25_topk-only surface (v1); paths that would
    otherwise score '/pat/' fragments as ordinary terms refuse loudly."""
    if pq.regexes or pq.neg_regexes:
        raise ValueError(
            f"regexp tokens (/pat/) are not supported in {where} — run "
            "them through bm25_topk, or expand into explicit terms")


def _expand_regex(postings: DataFrame, patterns: list[str],
                  max_expansions: int) -> dict[str, list[str]]:
    """Expand `/pat/` regexp tokens against the term dictionary (Lucene
    RegexpQuery's rewrite): each pattern matches WHOLE terms (anchored),
    evaluated JVM-side by rlike over the same column-pruned term-only
    scan as prefixes/fuzzies — one scan per pattern so expansions assign
    to their pattern without cross-engine regex re-evaluation. Per-pattern
    expansions above max_expansions raise (TooManyClauses policy); an
    invalid pattern surfaces Spark's own parse error."""
    out: dict[str, list[str]] = {}
    for pat in sorted(patterns):
        rows = (postings.filter(
                    F.col("term").rlike(f"^(?:{pat})$"))
                .select("term").distinct()
                .limit(max_expansions + 1).collect())
        if len(rows) > max_expansions:
            raise ValueError(
                f"regexp token /{pat}/ expands to more than "
                f"{max_expansions} dictionary terms — tighten the pattern "
                "or raise max_expansions")
        out[pat] = sorted(r["term"] for r in rows)
    return out


def _after_cursor(after) -> tuple[float, int]:
    """Normalize a search-after cursor: a previous-page Row (or mapping)
    with doc_id/score fields, or an explicit (score, doc_id) tuple."""
    try:
        return float(after["score"]), int(after["doc_id"])
    except (TypeError, IndexError, KeyError):
        pass
    s0, d0 = after
    return float(s0), int(d0)


def _term_doc_ids(postings: DataFrame, terms: list[str],
                  with_term: bool = False) -> DataFrame:
    """doc_ids containing ANY of `terms` — decoded ids only (no scoring).
    Serves the MUST_NOT anti-join and the facet/match-membership paths.
    Bucket pruning was already applied by the caller; duplicates are fine
    for anti-join semantics (facets de-dup downstream). with_term=True
    keeps the term column so a batch can route each exclusion to its own
    query (and so conjunctive matching can count distinct terms)."""

    def ids_only(batches):
        from macrobase_spark.index.build import _decode_partial

        for pdf in batches:
            for term, blob in zip(pdf["term"], pdf["blob"]):
                ids, _, _ = _decode_partial(blob)
                out = {"doc_id": ids.astype(np.int64)}
                if with_term:
                    out["term"] = np.repeat(term, len(ids))
                yield pd.DataFrame(out)

    schema = ("doc_id long, term string" if with_term else "doc_id long")
    return (postings.filter(F.col("term").isin(terms))
            .select("term", "blob").mapInPandas(ids_only, schema=schema))


def _score_partition(n_docs: int, avgdl: float, k: int, single_term: bool,
                     lambdas: dict[str, float] | None = None,
                     idfs: dict[str, float] | None = None):
    """Decode + score posting blobs in one Arrow pass; emits (doc_id, term,
    score contribution). idf is derived from the row's own df stat — no
    separate term-stats job — EXCEPT on a segmented index (post-update,
    pre-compaction), where a term spans several rows and the per-term df
    sums are pre-collected into `idfs`. With a single query term, applies
    block-max pruning while keeping exactness (kth-best lower bound only
    grows). `lambdas` carries per-term block-max-WAND thresholds for
    multi-term pruning (see bm25_topk wand=True)."""

    def fn(batches):
        from macrobase_spark.index.build import _decode_partial

        for pdf in batches:
            out_doc, out_term, out_score = [], [], []
            for term, t_df, blob, block_max in zip(
                    pdf["term"], pdf["df"], pdf["blob"], pdf["block_max"]):
                idf = idfs[term] if idfs is not None else math.log(
                    1.0 + (n_docs - t_df + 0.5) / (t_df + 0.5))
                ids, tfs, dls = _decode_partial(blob)
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                lam = (lambdas or {}).get(term)
                if lam is not None and len(block_max) > 1:
                    # multi-term block-max WAND: skip blocks whose best
                    # possible contribution cannot lift any doc above the
                    # already-established global lower bound θ
                    bm = np.asarray(block_max, dtype=np.float64) * idf * (K1 + 1.0)
                    keep_blocks = np.flatnonzero(bm >= lam)
                    if len(keep_blocks) < len(bm):
                        segs = [
                            np.arange(bi * BLOCK_SIZE,
                                      min((bi + 1) * BLOCK_SIZE, len(ids)))
                            for bi in keep_blocks
                        ]
                        sel = (np.concatenate(segs) if segs
                               else np.empty(0, dtype=np.int64))
                        ids, tf, dl = ids[sel], tf[sel], dl[sel]
                    sc_sel = idf * (tf * (K1 + 1.0)) / (
                        tf + K1 * (1.0 - B + B * dl / avgdl)
                    )
                    doc_sel = ids.astype(np.int64)
                elif single_term and len(block_max) > 1:
                    # block-max prune: visit blocks in descending upper bound,
                    # stop when bound < kth best so far (exact for 1 term)
                    bm = np.asarray(block_max, dtype=np.float64) * idf * (K1 + 1.0)
                    order = np.argsort(-bm, kind="stable")
                    kept: list[np.ndarray] = []
                    best: list[float] = []
                    for bi in order:
                        if len(best) >= k and bm[bi] < best[k - 1]:
                            break
                        s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, len(ids))
                        sc = idf * (tf[s:e] * (K1 + 1.0)) / (
                            tf[s:e] + K1 * (1.0 - B + B * dl[s:e] / avgdl)
                        )
                        kept.append(np.stack([ids[s:e].astype(np.float64), sc]))
                        best = sorted(best + sc.tolist(), reverse=True)[:k]
                    if kept:
                        m = np.concatenate(kept, axis=1)
                        doc_sel, sc_sel = m[0].astype(np.int64), m[1]
                    else:
                        doc_sel = np.empty(0, dtype=np.int64)
                        sc_sel = np.empty(0)
                else:
                    sc_sel = idf * (tf * (K1 + 1.0)) / (
                        tf + K1 * (1.0 - B + B * dl / avgdl)
                    )
                    doc_sel = ids.astype(np.int64)
                out_doc.append(doc_sel)
                out_term.extend([term] * len(doc_sel))
                out_score.append(sc_sel)
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_doc),
                        "term": out_term,
                        "contrib": np.concatenate(out_score),
                    }
                )

    return fn


def bm25_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    anomaly_max: float | None = None,
    anomaly_weight: float = 0.0,
    wand: bool = False,
    mode: str = "or",
    min_should_match: int | None = None,
    doc_filter: str | None = None,
    max_expansions: int = 128,
    after: tuple[float, int] | None = None,
    sort_by: str | None = None,
    collapse: str | None = None,
    synonyms: dict[str, list[str]] | None = None,
    recency_half_life: float | None = None,
    recency_ref: float | None = None,
    recency_col: str = "ts",
) -> DataFrame:
    """Top-k (doc_id, score) for the query. Optional anomaly modifier:
    filter docs with anomaly > anomaly_max, and/or down-weight the score by
    (1 − anomaly_weight·anomaly) — the MacroBase row-score heritage as a
    first-class BM25 modifier.

    doc_filter is a SQL boolean expression over the docs table's metadata
    columns (conv_id, turn_idx, role, tool — persisted at build time from
    the transcripts input), e.g. ``doc_filter="role = 'assistant'"``:
    non-matching docs are excluded BEFORE top-k selection (a semi-join
    against the filtered docs projection — filter pushdown reaches the
    docs parquet scan), so the k results are the best k *within* the
    filtered population, not a post-filter of the unfiltered top-k.
    Because filtering changes which docs can occupy the top-k, every
    block-pruning θ computed from raw scores is invalid — pruning is
    disabled (exactness over speed, same policy as the anomaly gate).

    Query tokens ending in ``*`` are prefix wildcards (``merg*``):
    expanded against the term dictionary (bounded by max_expansions, see
    _expand_prefixes) and scored as a disjunctive query over the
    expansions, each with its own idf — Lucene's scoring-boolean rewrite.
    Wildcards compose with doc_filter/anomaly but not with mode="and"
    (conjunctive wildcard semantics — "at least one expansion per slot" —
    are not implemented; expand explicitly instead).

    Query tokens starting with ``-`` at a token boundary (``merge -scan``)
    are exclusions (Lucene MUST_NOT): docs containing ANY excluded term
    are dropped before top-k and excluded terms never contribute to the
    score. ``-pre*`` excludes every expansion of the prefix. A query with
    ONLY exclusions returns empty (nothing to rank). Exclusions compose
    with every other option; block pruning is disabled when present (an
    exclusion can promote docs from pruned blocks into the top-k).

    ``term~1`` / ``term~2`` are fuzzy tokens (Lucene FuzzyQuery syntax):
    expanded against the term dictionary to every indexed term within N
    edits (length-banded levenshtein over the column-pruned term scan,
    bounded by max_expansions — the TooManyClauses policy) and scored as
    a disjunction, each expansion with its own idf — the same
    scoring-boolean rewrite as prefixes. ``-tok~1`` excludes every
    expansion; ``tok~1^2`` boosts every expansion. Not combinable with
    mode='and' (same policy as prefixes).

    ``/pat/`` is a regexp term query (Lucene RegexpQuery syntax): the
    pattern matches WHOLE dictionary terms (anchored), expanded against
    the column-pruned term scan (bounded by max_expansions — the
    TooManyClauses policy) and scored as a disjunction with per-term idf,
    the same scoring-boolean rewrite as prefixes. ``-/pat/`` excludes
    every match; ``/pat/^2`` boosts them. Pattern syntax is Java regex
    (evaluated JVM-side by rlike); no whitespace or '/' inside the
    fences. Not combinable with mode='and' / min_should_match; a
    bm25_topk-only surface in v1 (batch/count/facets/sharded refuse
    loudly).

    ``term^2`` / ``pre*^1.5`` are query-time boosts (Lucene syntax): the
    term's contribution is multiplied by the boost before the per-doc sum.
    An explicit term boost beats a matching prefix boost; overlapping
    boosts take the max. Boosts compose with everything; the single-term
    block-max prune stays exact (a constant per-term scale preserves
    order) while multi-term WAND is disabled under boosts.

    mode="and" is conjunctive retrieval: only docs containing EVERY query
    term are ranked (Lucene's MUST / +term semantics); scores are the same
    BM25 sums, so mode="and" output is a subset-filter of mode="or" — a
    property the parity test pins. Cost is identical to the disjunctive
    query (the matched-term count rides the existing per-doc aggregate; no
    extra shuffle). WAND block pruning is disabled in "and" mode: its θ is
    a DISJUNCTIVE kth-score bound, and the conjunctive kth score can sit
    below it — exactness over speed, same policy as the anomaly gate.

    min_should_match=m is Lucene's minimum_should_match: only docs
    containing at least m DISTINCT query terms are ranked — the middle
    ground between mode="or" (m=1) and mode="and" (m=all). The matched-term
    count rides the same per-doc aggregate as mode="and" (no extra
    shuffle); scores are unchanged BM25 sums, so the output is a
    subset-filter of the disjunctive ranking. m counts indexable terms —
    stoplisted query tokens are dropped before the threshold applies
    (query-analyzer symmetry), and m greater than the query's indexable
    term count returns empty (no doc can satisfy it). Not combinable with
    mode="and" (redundant: "and" IS m = all), nor with prefix/fuzzy tokens
    in v1 (clause-count vs expansion-count semantics differ; expand
    explicitly instead). Block pruning is disabled when m > 1 (the filter
    can promote docs from pruned blocks), same policy as the other
    restriction modifiers.

    wand=True enables multi-term block-max WAND pruning (exactness-
    preserving): θ = the kth best SINGLE-term score of the rarest query term
    (a valid lower bound on the final kth score); a block of term t is
    skipped iff ub_t(block) + Σ_{u≠t} ub_u < θ. Any doc with true final
    score ≥ θ then sits in no pruned block (its presence would force the
    block's bound above θ), so every candidate that can reach the top-k is
    fully scored and every pruned doc is provably below the kth. Costs two
    extra small jobs (metadata + rarest-term pass) — the cluster-scale path
    for hot multi-term queries; off by default for local latency.

    ``role:assistant`` / ``tool:grep`` / ``conv_id:c17`` tokens in the
    query are field scopes (Lucene field-query sugar): stripped from the
    scored terms and folded into doc_filter (same-field values OR
    together, distinct fields AND; composes with an explicit doc_filter
    via AND).

    ``after=`` is search-after pagination (the search_after cursor
    shape): only docs STRICTLY after the cursor in ranking order
    (score desc, doc_id asc) are returned — pass the previous page's
    last Row (or an explicit (score, doc_id) tuple) to fetch the next
    k. Exact across pages
    because scores are bitwise-reproducible; page boundaries never
    duplicate or skip a doc. Pruning policy is unchanged — the kernel's
    block-max bounds target the UNPAGED top-k, and the cursor cuts
    strictly deeper than the kth unpaged score can reach only when the
    caller pages past k, so `after` simply disables pruning (exactness
    over speed, same policy as the other restriction modifiers). Not
    combinable with sort_by (the cursor is a score-order position).

    ``sort_by="turn_idx desc"`` ranks the MATCHING docs by docs-table
    metadata columns instead of relevance (Lucene sort-by-field): every
    matching doc competes (block pruning is disabled — a low-scoring
    match can win a metadata sort), ties break by ascending doc_id, and
    the BM25 score still rides along in the output together with the
    sort columns.

    ``recency_half_life=7.0`` is recency-decay scoring (the freshness
    modifier a transcript corpus wants — Elasticsearch's exp/gauss decay
    family): score ×= 0.5^(age_days / half_life), where age is measured
    against ``recency_ref`` (epoch seconds) or, when None, the corpus's
    own max ``recency_col`` — deterministic per index state, no
    wall-clock in the plan. The timestamp rides the same docs-projection
    join as the anomaly modifier (column-pruned); docs with a NULL
    timestamp keep weight 1. Block pruning is disabled (the reweighting
    reorders), same policy as anomaly_weight. Requires the index to have
    persisted the ``recency_col`` metadata column (build_index persists
    ``ts`` when the input carries it).

    ``synonyms={"fast": ["quick", "rapid"]}`` is query-time synonym
    expansion (the classic QueryParser expand=true behavior): a query
    term present in the map also matches its alternates, scored as a
    disjunction where each alternate carries its OWN idf — the same
    scoring-boolean rewrite as prefix/fuzzy expansions, so rare
    alternates contribute more than common ones. A boost on the query
    term covers its alternates (largest wins on overlap, prefix-boost
    precedence). Alternates are analyzed like query text (lowercased,
    stoplist-dropped); entries whose key is not in the query are
    ignored, so one corpus-wide synonym map can ride along on every
    query. Not combinable with mode='and' / min_should_match in v1
    (per-slot "any alternate" conjunctive semantics — same policy as
    wildcards).

    ``collapse="conv_id"`` is field collapsing (Elasticsearch collapse /
    Lucene grouping): only the best-ranked doc per collapse-key value
    survives — one turn per conversation in a transcript corpus — and
    the top-k then ranks the group winners; the collapse column rides
    along in the output. Collapsing happens BEFORE the after= cursor so
    pages never show a group twice. Pruning is disabled (a group winner
    can sit below the uncollapsed kth score); not combinable with
    sort_by in v1."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if min_should_match is not None:
        if not isinstance(min_should_match, int) or min_should_match < 1:
            raise ValueError("min_should_match must be a positive int, "
                             f"got {min_should_match!r}")
        if mode == "and":
            raise ValueError(
                "min_should_match does not compose with mode='and' — "
                "'and' already requires every term; pass one or the other")
    if after is not None and sort_by is not None:
        raise ValueError("after= is a score-order cursor — it does not "
                         "compose with sort_by")
    if collapse is not None and sort_by is not None:
        raise ValueError("collapse does not compose with sort_by (v1) — "
                         "collapse ranks group winners by score")
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(doc_filter, _scope)
    postings, docs, stats = read_index(spark, index_dir)
    pq = _parse_query_full(query)
    # index-time stoplist: stoplisted query terms have no postings; drop
    # them up front so mode='and' requires only indexable terms and a
    # stopword exclusion is a no-op (Lucene query-analyzer symmetry)
    _stop = set(stats.get("stopwords", []))
    terms = sorted(pq.terms - _stop)
    prefixes = sorted(pq.prefixes)
    nterms, nprefixes = sorted(pq.neg_terms - _stop), sorted(pq.neg_prefixes)
    qboosts = pq.boosts
    explicit_terms = list(terms)
    if prefixes or pq.fuzzies or pq.regexes:
        if mode == "and" or (min_should_match or 0) > 1:
            raise ValueError(
                "prefix wildcards / fuzzy / regexp tokens are not "
                "supported with mode='and' / min_should_match — expand "
                "into explicit terms for conjunctive retrieval")
    # normalize: m=1 is the disjunctive default (no-op); m above the
    # indexable term count can never be satisfied
    msm = min_should_match if (min_should_match or 0) > 1 else None
    if msm is not None and msm > len(terms):
        # unsatisfiable m: empty result with the SAME schema the non-empty
        # path would produce (sort_by/collapse append metadata columns —
        # an empty bare (doc_id, score) frame would break downstream
        # selects of those columns)
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)

        fields = [StructField("doc_id", LongType()),
                  StructField("score", DoubleType())]
        extra: list[str] = []
        if sort_by is not None:
            _, _names = _sort_columns(sort_by)
            extra = list(dict.fromkeys(_names))
        elif collapse is not None:
            extra = [collapse]
        fields += [docs.schema[c] for c in extra if c in docs.columns]
        return spark.createDataFrame([], StructType(fields))
    # query-time synonym expansion: alternates of query terms join the
    # disjunction, each with its own idf (scoring-boolean rewrite)
    smap: dict[str, list[str]] = {}
    if synonyms:
        if mode == "and" or msm is not None:
            raise ValueError(
                "synonyms are not supported with mode='and' / "
                "min_should_match — expand into explicit terms for "
                "conjunctive retrieval")
        for src, alts in synonyms.items():
            src_l = src.strip().lower()
            if src_l not in pq.terms:
                continue
            added = sorted({a.strip().lower() for a in alts}
                           - _stop - {""})
            if added:
                smap[src_l] = added
        if smap:
            terms = sorted(set(terms) |
                           {a for alts in smap.values() for a in alts})
    if prefixes:
        terms = sorted(set(terms) |
                       set(_expand_prefixes(postings, prefixes,
                                            max_expansions)))
    fmap: dict[str, list[str]] = {}
    if pq.fuzzies:
        fmap = _expand_fuzzy(postings, pq.fuzzies, max_expansions)
        terms = sorted(set(terms) |
                       {t for ts in fmap.values() for t in ts})
    rmap: dict[str, list[str]] = {}
    if pq.regexes:
        rmap = _expand_regex(postings, sorted(pq.regexes), max_expansions)
        terms = sorted(set(terms) |
                       {t for ts in rmap.values() for t in ts})
    # effective per-term boosts: explicit term boost wins; a prefix boost
    # (pre*^2), fuzzy boost (tok~1^2), or regexp boost (/pat/^2) covers
    # its expansions; the largest wins on overlap
    boosts: dict[str, float] | None = None
    if qboosts:
        boosts = {t: qboosts[t] for t in explicit_terms if t in qboosts}
        for t in terms:
            if t in boosts:
                continue
            pbs = [qboosts[p] for p in prefixes
                   if p in qboosts and t.startswith(p)]
            pbs += [qboosts[ftok] for ftok, exps in fmap.items()
                    if ftok in qboosts and t in exps]
            pbs += [qboosts[pat] for pat, exps in rmap.items()
                    if pat in qboosts and t in exps]
            # a boost on a query term covers its synonym alternates
            pbs += [qboosts[src] for src, alts in smap.items()
                    if src in qboosts and t in alts]
            if pbs:
                boosts[t] = max(pbs)
        boosts = boosts or None
    if nprefixes:
        nterms = sorted(set(nterms) |
                        set(_expand_prefixes(postings, nprefixes,
                                             max_expansions)))
    if pq.neg_fuzzies:
        nfmap = _expand_fuzzy(postings, pq.neg_fuzzies, max_expansions)
        nterms = sorted(set(nterms) |
                        {t for ts in nfmap.values() for t in ts})
    if pq.neg_regexes:
        nrmap = _expand_regex(postings, sorted(pq.neg_regexes),
                              max_expansions)
        nterms = sorted(set(nterms) |
                        {t for ts in nrmap.values() for t in ts})
    n, avgdl = stats["n_docs"], stats["avgdl"]
    # anomaly/filter/exclusion/tombstone modifiers change the final ranking
    # AFTER raw-BM25 scoring (filtering can promote docs from pruned
    # blocks; weighting reorders), so every block-pruning θ computed from
    # raw scores is invalid — score fully. Exactness over speed, same
    # policy as the stale-version gate.
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    allow_prune = (anomaly_max is None and not anomaly_weight
                   and doc_filter is None and not nterms and tomb is None
                   and after is None and sort_by is None
                   and collapse is None and msm is None
                   and recency_half_life is None)
    if terms and "num_buckets" in stats:
        # partition pruning: term → bucket = pmod(xxhash64(term), B), computed
        # driver-side (pure-Python XXH64, no Spark round trip) so only the
        # matching bucket directories are even listed
        from macrobase_spark.index.build import bucket_versions
        from macrobase_spark.index.xxh64 import term_bucket

        # bucket pruning covers the EXCLUDED terms too — their postings
        # are scanned (ids only) for the anti-join below
        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in [*terms, *nterms]})
        postings = postings.filter(F.col("bucket").isin(buckets))
        # version gate: after an incremental update, buckets the update did
        # not touch carry block-max metadata computed under an older avgdl —
        # their bounds are not trustworthy, so disable block pruning
        # (exactness over speed) until the bucket is rewritten/compacted
        sv = stats.get("version", 1)
        bv = bucket_versions(index_dir)
        allow_prune = allow_prune and all(
            bv.get(b, 1) == sv for b in buckets)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    cand = postings.filter(F.col("term").isin(terms)).select(
        "term", "df", "max_impact", "blob", "block_max"
    )
    # segmented index (post-update, pre-compaction): a term may span several
    # rows, so idf needs the cross-row df sum — one tiny metadata job over
    # the already-bucket-pruned candidates. Skipped entirely on a compacted
    # index (the common case), keeping the fast path one job.
    idfs: dict[str, float] | None = None
    seg = set(stats.get("segmented_buckets", []))
    if seg and (("num_buckets" not in stats) or (seg & set(buckets))):
        df_rows = cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        idfs = {r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
                for r in df_rows}
    lambdas: dict[str, float] | None = None
    if (wand and len(terms) > 1 and allow_prune and mode == "or"
            and not boosts):
        meta = cand.select("term", "df", "max_impact").collect()
        if meta:
            idfs = {r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
                    for r in meta}
            ubs = {r["term"]: idfs[r["term"]] * (K1 + 1.0) * r["max_impact"]
                   for r in meta}
            rarest = min(meta, key=lambda r: r["df"])
            if rarest["df"] >= k:
                r_top = (
                    cand.filter(F.col("term") == rarest["term"])
                    .mapInPandas(_score_partition(n, avgdl, k, single_term=True),
                                 schema="doc_id long, term string, contrib double")
                    .orderBy(F.col("contrib").desc()).limit(k).collect()
                )
                if len(r_top) >= k:
                    theta = r_top[k - 1]["contrib"]
                    total_ub = sum(ubs.values())
                    lambdas = {t: theta - (total_ub - ubs[t]) for t in ubs}
    contrib = cand.mapInPandas(
        _score_partition(n, avgdl, k,
                         single_term=len(terms) == 1 and allow_prune,
                         lambdas=lambdas, idfs=idfs),
        schema="doc_id long, term string, contrib double",
    )
    if boosts:
        # query-time boost as a post-multiplication on the (term, doc)
        # contribution — the SAME float op as the batch path's per-query
        # boost join, so single and batch stay bitwise-identical. Within a
        # term the boost is a constant scale, so the kernel's per-term
        # block-max pruning (single-term path) remains exact; multi-term
        # WAND is disabled under boosts (its λ bounds are unboosted).
        bmap = F.create_map(*[x for t, b in sorted(boosts.items())
                              for x in (F.lit(t), F.lit(b))])
        contrib = contrib.withColumn(
            "contrib",
            F.col("contrib") * F.coalesce(bmap[F.col("term")], F.lit(1.0)))
    if len(terms) == 1 and idfs is None:
        # single-term fast path (compacted index: exactly one contribution
        # per doc): the per-doc sum is the contribution itself, so the
        # groupBy shuffle stage disappears — the plan is scan → Arrow score
        # → TakeOrdered. Bitwise-identical to the aggregate (0.0 + x == x
        # for positive doubles). Segmented indexes (idfs set) keep the
        # aggregate: a term may span several segment rows.
        scored = contrib.select("doc_id", F.col("contrib").alias("score"))
    else:
        # ascending-term add order for bitwise-reproducible float sums;
        # the matched-term count rides the same aggregate (a (term, doc)
        # pair appears in exactly one segment, so count == distinct terms)
        scored = (
            contrib.groupBy("doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score"),
                F.count("term").alias("_nt"),
            )
        )
        if mode == "and":
            scored = scored.filter(F.col("_nt") == len(terms))
        elif msm is not None:
            # minimum_should_match: the count of distinct matched terms
            # rides the same aggregate — a pure filter, no extra shuffle
            scored = scored.filter(F.col("_nt") >= msm)
        scored = scored.drop("_nt")
    if nterms:
        # MUST_NOT: drop docs containing any excluded term (they never
        # contribute to scores — exclusion is membership, not scoring)
        scored = scored.join(_term_doc_ids(postings, nterms),
                             "doc_id", "anti")
    if tomb is not None:
        # pending deletes vanish from results immediately; corpus stats
        # keep counting them until compact_index purges (Lucene semantics)
        scored = scored.join(tomb, "doc_id", "anti")
    if doc_filter is not None:
        # doc-set restriction BEFORE top-k: the filtered docs projection is
        # a pushed-down parquet scan of the docs table; the semi-join keeps
        # scored rows whose doc survives the predicate. AQE picks
        # broadcast vs shuffle by the filtered side's actual size.
        scored = scored.join(
            docs.filter(F.expr(doc_filter)).select("doc_id"),
            "doc_id", "semi")
    if anomaly_max is not None or anomaly_weight:
        scored = scored.join(docs.select("doc_id", "anomaly"), "doc_id", "inner")
        if anomaly_max is not None:
            scored = scored.filter(F.col("anomaly") <= anomaly_max)
        if anomaly_weight:
            scored = scored.withColumn(
                "score", F.col("score") * (1.0 - anomaly_weight * F.col("anomaly"))
            )
        scored = scored.drop("anomaly")
    if recency_half_life is not None:
        if not recency_half_life > 0:
            raise ValueError("recency_half_life must be > 0 (days), got "
                             f"{recency_half_life!r}")
        if recency_col not in docs.columns:
            raise ValueError(
                f"recency: {recency_col!r} is not a docs-metadata column "
                f"(have {sorted(set(docs.columns) - {'doc_id'})}) — the "
                "index must persist the timestamp at build time")
        from pyspark.sql.types import (DateType, NumericType, StringType,
                                       TimestampNTZType, TimestampType)

        dt = docs.schema[recency_col].dataType
        if isinstance(dt, NumericType):
            # numeric epoch-seconds column persisted verbatim at build
            # time: unix_timestamp() would parse it as a date STRING and
            # return NULL, silently making every weight 1.0 when a caller
            # passes recency_ref — cast directly instead
            ts_sec = F.col(recency_col).cast("double")
        elif isinstance(dt, (TimestampType, TimestampNTZType, DateType,
                             StringType)):
            ts_sec = F.unix_timestamp(F.col(recency_col)).cast("double")
        else:
            raise ValueError(
                f"recency: {recency_col!r} has type {dt.simpleString()} — "
                "need a timestamp/date/numeric-epoch docs column")
        ref = recency_ref
        if ref is None:
            row = docs.agg(F.max(ts_sec).alias("m")).collect()[0]
            if row["m"] is None:
                raise ValueError(
                    f"recency: every {recency_col!r} in the docs table is "
                    "NULL — pass recency_ref explicitly")
            ref = float(row["m"])
        age_days = (F.lit(float(ref)) - ts_sec) / 86400.0
        weight = F.coalesce(
            F.pow(F.lit(0.5), age_days / float(recency_half_life)),
            F.lit(1.0))
        scored = (scored.join(docs.select("doc_id", recency_col), "doc_id",
                              "left")
                  .withColumn("score", F.col("score") * weight)
                  .drop(recency_col))
    if sort_by is not None:
        cols, names = _sort_columns(sort_by)
        missing = [c for c in names
                   if c not in docs.columns or c == "doc_id"]
        if missing:
            raise ValueError(
                f"sort_by: {missing!r} not sortable docs-metadata "
                f"columns (have {sorted(set(docs.columns) - {'doc_id'})})")
        # matching docs ranked by metadata: join the (small, pre-limit)
        # match set to the docs projection of just the sort columns —
        # column pruning reaches the docs parquet scan; AQE broadcasts
        # the smaller side
        out = scored.join(docs.select("doc_id", *dict.fromkeys(names)),
                          "doc_id")
        return out.orderBy(*cols, F.col("doc_id").asc()).limit(k)
    if collapse is not None:
        from pyspark.sql import Window as W

        if collapse not in docs.columns or collapse == "doc_id":
            raise ValueError(
                f"collapse: {collapse!r} not a docs-metadata column "
                f"(have {sorted(set(docs.columns) - {'doc_id'})})")
        scored = scored.join(docs.select("doc_id", collapse), "doc_id")
        cw = W.partitionBy(collapse).orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        scored = (scored.withColumn("_rn", F.row_number().over(cw))
                  .filter(F.col("_rn") == 1).drop("_rn"))
    if after is not None:
        s0, d0 = _after_cursor(after)
        # strict ranking-order cursor: (score desc, doc_id asc) position
        # after (s0, d0) — exact because scores are bitwise-reproducible
        scored = scored.filter(
            (F.col("score") < s0)
            | ((F.col("score") == s0) & (F.col("doc_id") > d0)))
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def _batch_wand_lambdas(
    cand: DataFrame,
    q_terms: dict[str, list[str]],
    n: int,
    avgdl: float,
    k: int,
) -> dict[str, float] | None:
    """Per-term block-skip thresholds for a BATCH of queries, exactness-
    preserving across every query: λ_t = min over queries q∋t of
    (θ_q − Σ_{u∈q, u≠t} ub_u), with θ_q the kth best single-term score of
    q's rarest present term. Skipping a block of t with ub_t < λ_t is safe
    for EVERY query containing t (the min makes pruning at least as
    conservative as each query's own WAND bound): if doc d sat in a pruned
    block, then for any q∋t, score_q(d) ≤ ub_t + Σ_{u≠t} ub_u < θ_q, so d
    can't reach q's top-k. Returns None when nothing is prunable.

    Costs two small jobs (metadata collect + one rarest-terms scoring pass —
    the terms pass is shared across all queries, not per query)."""
    meta = cand.select("term", "df", "max_impact").collect()
    if not meta:
        return None
    dfs: dict[str, int] = {}
    mx: dict[str, float] = {}
    for r in meta:  # a term may span rows on a segmented index
        dfs[r["term"]] = dfs.get(r["term"], 0) + r["df"]
        mx[r["term"]] = max(mx.get(r["term"], 0.0), r["max_impact"])
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in dfs.items()}
    ubs = {t: idf[t] * (K1 + 1.0) * mx[t] for t in dfs}
    rarest: dict[str, str] = {}
    for qid, ts in q_terms.items():
        present = [t for t in ts if t in dfs]
        if present:
            rarest[qid] = min(present, key=lambda t: dfs[t])
    probe = sorted({t for t in rarest.values() if dfs[t] >= k})
    thetas: dict[str, float] = {}
    if probe:
        from pyspark.sql import Window as W

        contrib_r = cand.filter(F.col("term").isin(probe)).mapInPandas(
            _score_partition(n, avgdl, k, single_term=True, idfs=idf),
            schema="doc_id long, term string, contrib double",
        )
        w = W.partitionBy("term").orderBy(
            F.col("contrib").desc(), F.col("doc_id").asc())
        rows = (contrib_r.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == k).select("term", "contrib").collect())
        thetas = {r["term"]: r["contrib"] for r in rows}
    lambdas: dict[str, float] = {}
    for qid, ts in q_terms.items():
        present = [t for t in ts if t in dfs]
        if not present:
            continue
        theta = thetas.get(rarest[qid])
        tot = sum(ubs[t] for t in present)
        for t in present:
            lam = (theta - (tot - ubs[t])) if theta is not None else -math.inf
            lambdas[t] = min(lambdas.get(t, math.inf), lam)
    # λ ≤ 0 prunes nothing (block bounds are non-negative) — drop to skip
    # the per-block bound math in the scorer
    lambdas = {t: l for t, l in lambdas.items() if l > 0.0}
    return lambdas or None


def bm25_topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, str] | list[str],
    k: int = 10,
    wand: bool = False,
    mode: str = "or",
    min_should_match: int | None = None,
    doc_filter: str | None = None,
    max_expansions: int = 128,
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Top-k for MANY queries in ONE scoring job — the throughput shape for
    query serving: a single pass over the union of all query terms'
    postings (bucket- and row-group-pruned once), contributions joined to a
    broadcast (query_id, term) map, per-(query, doc) ascending-term sums
    (bit-identical to bm25_topk per query), then a per-query top-k window.
    Returns (query_id, doc_id, score, rank).

    Amortizes the per-job overhead that dominates single-query p50 in
    local mode; on a cluster it turns q queries × t terms into one shuffle
    instead of q. wand=True adds batch-safe block-max pruning (see
    _batch_wand_lambdas) — exact, two extra small jobs; worth it when hot
    multi-term queries dominate the batch.

    Single-term queries bypass the contribution shuffle entirely (r5): a
    single-term score IS the term's contribution, so those queries are
    answered by a separate tiny scan with per-term block-max pruning (the
    same exact prune bm25_topk's fast path uses) and a per-term top-k —
    a hot single-term query ("the") no longer pushes its whole posting
    list through the (query, doc) aggregate. Bit-identical to the
    aggregate path (0.0 + x == x for doubles), pytest-pinned against
    bm25_topk per query.

    mode="and" applies conjunctive retrieval to every query in the batch
    (see bm25_topk): per-(query, doc) matched-term counts ride the
    existing aggregate and are checked against each query's term count
    from the broadcast map — no extra shuffle. WAND batch pruning is
    disabled in "and" mode (disjunctive θ bound).

    min_should_match=m applies Lucene's minimum_should_match to every
    query in the batch (see bm25_topk): docs matching fewer than m
    distinct terms of a query drop before that query's top-k. Queries
    with fewer than m indexable terms return no rows (unsatisfiable).
    Same v1 restrictions as bm25_topk: not with mode='and', not with
    prefix/fuzzy tokens; WAND batch pruning and the single-term fast
    path are disabled when m > 1 (the filter changes which docs rank).

    synonyms (one corpus-wide map, see bm25_topk) applies to every
    query in the batch: a query term present in the map also matches
    its alternates, each scored with its own idf; a boost on the term
    covers its alternates; entries absent from a query are ignored —
    exactly the per-query bm25_topk semantics, pytest-pinned bitwise.
    Not with mode='and' / min_should_match (same policy as bm25_topk).

    doc_filter (SQL expression over docs metadata, see bm25_topk) applies
    to EVERY query in the batch: one filtered docs projection, one
    semi-join before the per-query top-k windows. Prefix wildcards
    (``merg*``) expand per query against the term dictionary in a single
    combined scan; mode='and' rejects wildcards (same as bm25_topk).
    Exclusions (``-term`` / ``-pre*``, see bm25_topk) apply per query via
    one (query_id, doc_id) anti-join fed by a single ids-only scan over
    the union of every query's excluded terms."""
    from pyspark.sql import Window as W

    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if min_should_match is not None:
        if not isinstance(min_should_match, int) or min_should_match < 1:
            raise ValueError("min_should_match must be a positive int, "
                             f"got {min_should_match!r}")
        if mode == "and":
            raise ValueError(
                "min_should_match does not compose with mode='and' — "
                "'and' already requires every term; pass one or the other")
    msm = min_should_match if (min_should_match or 0) > 1 else None
    if isinstance(queries, list):
        queries = {str(i): q for i, q in enumerate(queries)}
    scoped = [qid for qid, q in queries.items()
              if _split_field_scopes(q)[1] is not None]
    if scoped:
        # a batch runs ONE doc_filter semi-join for every query; a
        # per-query field scope would need per-query doc restriction —
        # refuse loudly rather than silently scoring 'role'/'assistant'
        # as ordinary terms
        raise ValueError(
            f"queries {scoped!r} use field scopes (role:/tool:/conv_id:) "
            "— batch queries share one doc_filter; pass doc_filter= for "
            "the whole batch or run scoped queries via bm25_topk")
    parsed = {qid: _parse_query_full(q) for qid, q in queries.items()}
    for qid, pq_ in parsed.items():
        _reject_regexes(pq_, f"bm25_topk_batch (query {qid!r})")
    out_schema = "query_id string, doc_id long, score double, rank int"
    postings, docs, stats = read_index(spark, index_dir)
    all_prefixes = sorted({p for pq_ in parsed.values()
                           for p in pq_.prefixes})
    all_nprefixes = sorted({p for pq_ in parsed.values()
                            for p in pq_.neg_prefixes})
    all_fuzzies: dict[str, int] = {}
    for pq_ in parsed.values():
        for tok, nv in (*pq_.fuzzies.items(), *pq_.neg_fuzzies.items()):
            all_fuzzies[tok] = max(nv, all_fuzzies.get(tok, 0))
    if (all_prefixes or all_nprefixes or
            any(pq_.fuzzies for pq_ in parsed.values())) and (
            mode == "and" or msm is not None):
        raise ValueError(
            "prefix wildcards / fuzzy tokens are not supported with "
            "mode='and' / min_should_match — expand into explicit terms "
            "for conjunctive retrieval")
    # one combined dictionary scan for the whole batch; the expansion bound
    # is PER QUERY (consistent with bm25_topk), so the scan cap scales with
    # the distinct-prefix count — if the cap is hit, some single prefix
    # already exceeds max_expansions and its query would fail alone too
    scan_prefixes = sorted({*all_prefixes, *all_nprefixes})
    expansions: list[str] = (
        _expand_prefixes(postings, scan_prefixes, max_expansions,
                         total_cap=max_expansions * len(scan_prefixes))
        if scan_prefixes else [])
    # fuzzy: ONE combined dictionary scan at each token's widest distance,
    # then per-query re-restriction driver-side (a query using tok~1 when
    # another uses tok~2 keeps only its own ≤1-edit expansions)
    fmap_all: dict[str, list[str]] = (
        _expand_fuzzy(postings, all_fuzzies, max_expansions)
        if all_fuzzies else {})

    def _fuzzy_terms(fz: dict[str, int]) -> dict[str, list[str]]:
        return {tok: [t for t in fmap_all[tok]
                      if _edit_distance(tok, t, nv) <= nv]
                for tok, nv in fz.items()}

    syn_norm: dict[str, list[str]] = {}
    if synonyms:
        if mode == "and" or msm is not None:
            raise ValueError(
                "synonyms are not supported with mode='and' / "
                "min_should_match — expand into explicit terms for "
                "conjunctive retrieval")
        syn_norm = {src.strip().lower():
                    sorted({a.strip().lower() for a in alts} - {""})
                    for src, alts in synonyms.items()}
    q_terms: dict[str, list[str]] = {}
    q_negs: dict[str, list[str]] = {}
    q_boosts: dict[str, dict[str, float]] = {}
    for qid, pq_ in parsed.items():
        _stop = set(stats.get("stopwords", []))
        ts, ps = sorted(pq_.terms - _stop), sorted(pq_.prefixes)
        ns, nps, qb = (sorted(pq_.neg_terms - _stop),
                       sorted(pq_.neg_prefixes), pq_.boosts)
        ex = {e for e in expansions if any(e.startswith(p) for p in ps)}
        if len(ex) > max_expansions:
            raise ValueError(
                f"query {qid!r}: prefix wildcard(s) {ps!r} expand to more "
                f"than {max_expansions} terms — narrow the prefix or raise "
                "max_expansions")
        fex = _fuzzy_terms(pq_.fuzzies)
        # per-query synonym alternates from the shared corpus-wide map
        sm = {s: [a for a in alts if a not in _stop]
              for s, alts in syn_norm.items() if s in pq_.terms}
        sm = {s: alts for s, alts in sm.items() if alts}
        q_terms[qid] = sorted(set(ts) | ex |
                              {t for l in fex.values() for t in l} |
                              {a for l in sm.values() for a in l})
        q_negs[qid] = sorted(
            set(ns)
            | {e for e in expansions if any(e.startswith(p) for p in nps)}
            | {t for l in _fuzzy_terms(pq_.neg_fuzzies).values()
               for t in l})
        # effective per-term boosts (same precedence as bm25_topk:
        # explicit term boost wins, then the largest matching
        # prefix/fuzzy/synonym boost)
        eff = {t: qb[t] for t in ts if t in qb}
        for t in q_terms[qid]:
            if t in eff:
                continue
            pbs = [qb[p] for p in ps if p in qb and t.startswith(p)]
            pbs += [qb[tok] for tok, l in fex.items()
                    if tok in qb and t in l]
            pbs += [qb[s] for s, l in sm.items() if s in qb and t in l]
            if pbs:
                eff[t] = max(pbs)
        q_boosts[qid] = eff
    any_boost = any(q_boosts.values())
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    all_negs = sorted({t for ts in q_negs.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], out_schema)
    n, avgdl = stats["n_docs"], stats["avgdl"]
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    allow_prune = doc_filter is None and not all_negs and tomb is None
    if "num_buckets" in stats:
        from macrobase_spark.index.build import bucket_versions
        from macrobase_spark.index.xxh64 import term_bucket

        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in [*all_terms, *all_negs]})
        postings = postings.filter(F.col("bucket").isin(buckets))
        # same version gate as bm25_topk: stale block-max metadata after an
        # incremental update means bounds can't be trusted until compaction
        sv = stats.get("version", 1)
        bv = bucket_versions(index_dir)
        allow_prune = allow_prune and all(
            bv.get(b, 1) == sv for b in buckets)
    segmented = bool(stats.get("segmented_buckets"))
    # single-term queries split off the aggregate path when their score is
    # provably one row's contribution: compacted index (one row per term)
    # and trustworthy block-max bounds
    singles: dict[str, str] = {}
    multis: dict[str, list[str]] = {}
    if allow_prune and not segmented and msm is None:
        for qid, ts in q_terms.items():
            if len(ts) == 1:
                singles[qid] = ts[0]
            else:
                multis[qid] = ts
    else:
        # under min_should_match every query takes the aggregate path —
        # the matched-term count lives there; queries with fewer than m
        # terms filter to empty inside the aggregate (_nt <= |terms| < m)
        multis = {qid: ts for qid, ts in q_terms.items() if ts}

    parts = []
    if singles:
        s_terms = sorted(set(singles.values()))
        s_cand = postings.filter(F.col("term").isin(s_terms)).select(
            "term", "df", "max_impact", "blob", "block_max")
        s_contrib = s_cand.mapInPandas(
            _score_partition(n, avgdl, k, single_term=True),
            schema="doc_id long, term string, contrib double")
        sw = W.partitionBy("term").orderBy(
            F.col("contrib").desc(), F.col("doc_id").asc())
        s_top = (s_contrib.withColumn("rank", F.row_number().over(sw))
                 .filter(F.col("rank") <= k))
        s_qmap = spark.createDataFrame(
            [(qid, t, float(q_boosts[qid].get(t, 1.0)))
             for qid, t in singles.items()],
            "query_id string, term string, boost double")
        # boost scales every contribution of the (single) term by a
        # constant → per-term rank order (and thus the windowed top-k) is
        # unchanged; only the reported score scales
        parts.append(
            s_top.join(F.broadcast(s_qmap), "term")
            .select("query_id", "doc_id",
                    (F.col("contrib") * F.col("boost")).alias("score"),
                    "rank"))
    if multis:
        m_terms = sorted({t for ts in multis.values() for t in ts})
        cand = postings.filter(F.col("term").isin(m_terms)).select(
            "term", "df", "max_impact", "blob", "block_max")
        idfs: dict[str, float] | None = None
        if segmented:
            df_rows = cand.groupBy("term").agg(
                F.sum("df").alias("df")).collect()
            idfs = {r["term"]:
                    math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
                    for r in df_rows}
        lambdas = (_batch_wand_lambdas(cand, multis, n, avgdl, k)
                   if wand and allow_prune and mode == "or"
                   and msm is None and not any_boost else None)
        contrib = cand.mapInPandas(
            _score_partition(n, avgdl, k, single_term=False, idfs=idfs,
                             lambdas=lambdas),
            schema="doc_id long, term string, contrib double",
        )
        qmap = spark.createDataFrame(
            [(qid, t, float(q_boosts[qid].get(t, 1.0)))
             for qid, ts in multis.items() for t in ts],
            "query_id string, term string, boost double",
        )
        # per-query boost rides the broadcast map: contributions are
        # computed ONCE per (term, doc) and re-scaled per query at the
        # join — the same c*b float op as bm25_topk's post-multiplication,
        # keeping batch and single bitwise-identical
        joined = (contrib.join(F.broadcast(qmap), "term")
                  .withColumn("contrib",
                              F.col("contrib") * F.col("boost")))
        scored = (
            joined.groupBy("query_id", "doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score"),
                F.count("term").alias("_nt"),
            )
        )
        if mode == "and":
            need = spark.createDataFrame(
                [(qid, len(ts)) for qid, ts in multis.items()],
                "query_id string, _need int")
            scored = (scored.join(F.broadcast(need), "query_id")
                      .filter(F.col("_nt") == F.col("_need")).drop("_need"))
        elif msm is not None:
            scored = scored.filter(F.col("_nt") >= msm)
        scored = scored.drop("_nt")
        if all_negs:
            # per-query MUST_NOT: one ids-only scan over the union of
            # excluded terms, routed to owning queries via the broadcast
            # (query_id, term) map, then a composite-key anti-join
            nqmap = spark.createDataFrame(
                [(qid, t) for qid, ts in q_negs.items() for t in ts],
                "query_id string, term string")
            excl = (_term_doc_ids(postings, all_negs, with_term=True)
                    .join(F.broadcast(nqmap), "term")
                    .select("query_id", "doc_id"))
            scored = scored.join(excl, ["query_id", "doc_id"], "anti")
        if tomb is not None:
            scored = scored.join(tomb, "doc_id", "anti")
        if doc_filter is not None:
            # one filtered docs projection serves the whole batch; the
            # semi-join restricts every query's candidates BEFORE ranking
            scored = scored.join(
                docs.filter(F.expr(doc_filter)).select("doc_id"),
                "doc_id", "semi")
        w = W.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        parts.append(
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bm25_oracle(
    docs: list[tuple[int, str]], query: str, k: int = 10,
    anomaly: dict[int, float] | None = None,
    anomaly_max: float | None = None,
    anomaly_weight: float = 0.0,
    mode: str = "or",
    min_should_match: int | None = None,
    keep_ids: set[int] | None = None,
    stopwords: set[str] | None = None,
    synonyms: dict[str, list[str]] | None = None,
) -> list[tuple[int, float]]:
    """Exact single-threaded reference implementation over (doc_id, text)
    pairs — the rank-identity oracle for tests. Same tokenizer, same float64
    op order (ascending-term accumulation) as the Spark path; mode="and"
    keeps only docs containing every query term; keep_ids (the doc_filter
    twin) restricts the rankable population — corpus stats (idf, avgdl)
    still come from the FULL corpus, exactly like the index path. The
    query micro-syntax matches the engine: ``pre*`` expands against the
    corpus vocabulary, ``-term``/``-pre*`` exclude docs containing any
    matching term, ``term^2``/``pre*^2`` boost contributions (same c·b
    post-multiplication and precedence as the engine)."""
    import re

    stop = set(stopwords or ())
    tokenized = {d: [t for t in re.findall(TOKEN_PATTERN, t_.lower())
                     if t not in stop] for d, t_ in docs}
    n = len(tokenized)
    avgdl = sum(len(v) for v in tokenized.values()) / n
    dfs: Counter[str] = Counter()
    tfs: dict[int, Counter] = {}
    for d, toks in tokenized.items():
        c = Counter(toks)
        tfs[d] = c
        dfs.update(c.keys())
    pq = _parse_query_full(query)
    pq.terms -= stop
    pq.neg_terms -= stop
    terms, prefixes = sorted(pq.terms), sorted(pq.prefixes)
    nterms, nprefixes, qboosts = (sorted(pq.neg_terms),
                                  sorted(pq.neg_prefixes), pq.boosts)
    explicit = list(terms)
    if prefixes:
        terms = sorted(set(terms) | {t for t in dfs
                                     if any(t.startswith(p)
                                            for p in prefixes)})
    fmap = {tok: sorted(t for t in dfs
                        if _edit_distance(tok, t, nv) <= nv)
            for tok, nv in pq.fuzzies.items()}
    if fmap:
        terms = sorted(set(terms) |
                       {t for ts in fmap.values() for t in ts})
    smap: dict[str, list[str]] = {}
    if synonyms:
        for src, alts in synonyms.items():
            s_ = src.strip().lower()
            if s_ not in pq.terms:
                continue
            added = sorted({a.strip().lower() for a in alts} - stop - {""})
            if added:
                smap[s_] = added
        if smap:
            terms = sorted(set(terms) |
                           {a for l in smap.values() for a in l})
    rmap = {pat: sorted(t for t in dfs if re.fullmatch(pat, t))
            for pat in pq.regexes}
    if rmap:
        terms = sorted(set(terms) |
                       {t for ts in rmap.values() for t in ts})
    if pq.neg_regexes:
        nterms = sorted(set(nterms) | {
            t for pat in pq.neg_regexes
            for t in dfs if re.fullmatch(pat, t)})
    if nprefixes:
        nterms = sorted(set(nterms) | {t for t in dfs
                                       if any(t.startswith(p)
                                              for p in nprefixes)})
    if pq.neg_fuzzies:
        nterms = sorted(set(nterms) | {
            t for tok, nv in pq.neg_fuzzies.items()
            for t in dfs if _edit_distance(tok, t, nv) <= nv})
    boosts = {t: qboosts[t] for t in explicit if t in qboosts}
    for t in terms:
        if t not in boosts:
            pbs = [qboosts[p] for p in prefixes
                   if p in qboosts and t.startswith(p)]
            pbs += [qboosts[ftok] for ftok, exps in fmap.items()
                    if ftok in qboosts and t in exps]
            pbs += [qboosts[src] for src, alts in smap.items()
                    if src in qboosts and t in alts]
            pbs += [qboosts[pat] for pat, exps in rmap.items()
                    if pat in qboosts and t in exps]
            if pbs:
                boosts[t] = max(pbs)
    scores: dict[int, float] = {}
    for d, c in tfs.items():
        if keep_ids is not None and d not in keep_ids:
            continue
        if nterms and any(t in c for t in nterms):
            continue
        if mode == "and" and any(t not in c for t in terms):
            continue
        if (min_should_match or 0) > 1 and (
                sum(1 for t in set(terms) if t in c) < min_should_match):
            continue
        s = 0.0
        for t in sorted(terms):
            if t not in c or t not in dfs:
                continue
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = float(c[t])
            dl = float(len(tokenized[d]))
            contrib = (idf * (tf * (K1 + 1.0))
                       / (tf + K1 * (1.0 - B + B * dl / avgdl)))
            if t in boosts:
                contrib = contrib * boosts[t]
            s += contrib
        if s > 0.0:
            if anomaly is not None:
                a = anomaly.get(d, 0.0)
                if anomaly_max is not None and a > anomaly_max:
                    continue
                if anomaly_weight:
                    s *= 1.0 - anomaly_weight * a
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def bm25_phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    candidate_collect_limit: int = 200_000,
    slop: int = 0,
    doc_filter: str | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Exact phrase/proximity top-k over the positional layer
    (build_index(positions=True)): returns (doc_id, score) for documents
    containing the phrase's tokens IN ORDER at strictly increasing
    positions whose span is at most (len(phrase)−1)+slop — slop=0 is the
    exact consecutive phrase, slop=w allows up to w extra tokens
    interleaved (ordered proximity, Lucene-style sloppy phrase with
    order preserved). Ranked by the BM25 sum of the phrase's distinct
    terms (ascending-term float order — the engine-wide reproducibility
    convention).

    Plan: bucket/row-group-pruned scan of the phrase terms' positional
    blobs → Arrow decode+score, pre-filtered to the rarest term's doc set
    when that set is small enough to broadcast in the UDF closure
    (candidate_collect_limit) → per-doc gather of (term, contrib,
    positions) → vectorized adjacency verify + score → top-k. The rarest
    term bounds the candidate count the same way WAND's pivoting does.

    doc_filter (SQL expression over docs metadata, see bm25_topk)
    restricts the phrase match to the filtered doc population before
    top-k selection. after=(score, doc_id) is the same search-after
    pagination cursor as bm25_topk's (strict ranking-order position;
    exact across pages).
    """
    import re

    from macrobase_spark.index.codec import decode_positional

    seq = re.findall(TOKEN_PATTERN, phrase.lower())
    out_schema = "doc_id long, score double"
    if not seq:
        return spark.createDataFrame([], out_schema)
    _, docs, stats = read_index(spark, index_dir)
    if not stats.get("has_positions"):
        raise ValueError(
            f"index at {index_dir!r} has no positional layer — build with "
            "build_index(..., positions=True) to enable phrase queries")
    # index-time stoplist: stoplisted phrase tokens were never indexed but
    # surviving tokens keep original positions (gap-preserving analysis).
    # Drop stoplisted tokens from the chain while keeping the original
    # span BUDGET: "merge the scan" matches any ordered merge..scan within
    # span 2 — both "merge X scan" and adjacent "merge scan". This is
    # span-budget (sloppy-phrase) treatment of the gap, deliberately one
    # notch looser than Lucene's exact position-increment match; the
    # brute-force oracle implements the identical rule.
    _orig_len = len(seq)
    _stop = set(stats.get("stopwords", []))
    if _stop:
        seq = [t for t in seq if t not in _stop]
        if not seq:
            return spark.createDataFrame([], out_schema)
    n, avgdl = stats["n_docs"], stats["avgdl"]
    uterms = sorted(set(seq))
    import os as _os

    pos_df = spark.read.parquet(_os.path.join(index_dir, "positions"))
    from macrobase_spark.index.xxh64 import term_bucket

    buckets = sorted({term_bucket(t, stats["num_buckets"]) for t in uterms})
    pos_df = (pos_df.filter(F.col("bucket").isin(buckets))
              .filter(F.col("term").isin(uterms)))
    meta = pos_df.select("term", "df").collect()
    # a term may span several rows on a segmented index (post-update,
    # pre-compaction): df is the cross-segment sum
    dfs: dict[str, int] = {}
    for r in meta:
        dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["df"])
    if set(dfs) != set(uterms):
        return spark.createDataFrame([], out_schema)  # a term is absent
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
           for t, d in dfs.items()}
    cand_ids: np.ndarray | None = None
    rarest = min(uterms, key=lambda t: dfs[t])
    if len(uterms) > 1 and dfs[rarest] <= candidate_collect_limit:
        blobs = pos_df.filter(F.col("term") == rarest).select(
            "blob").collect()
        cand_ids = np.sort(np.concatenate(
            [decode_positional(r["blob"])[0] for r in blobs]))

    def decode_score(batches):
        for pdf in batches:
            frames = []
            for term, blob in zip(pdf["term"], pdf["blob"]):
                ids, tfs, dls, flat = decode_positional(blob)
                if cand_ids is not None and term != rarest:
                    keep = np.flatnonzero(
                        np.isin(ids, cand_ids, assume_unique=True))
                    if len(keep) < len(ids):
                        starts = np.concatenate(
                            ([0], np.cumsum(tfs)))[:-1].astype(np.int64)
                        segs = [flat[starts[i]:starts[i] + int(tfs[i])]
                                for i in keep]
                        flat = (np.concatenate(segs) if segs
                                else np.empty(0, dtype=np.uint64))
                        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if len(ids) == 0:
                    continue
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                contrib = idf[term] * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * dl / avgdl))
                starts = np.concatenate(
                    ([0], np.cumsum(tfs)))[:-1].astype(np.int64)
                frames.append(pd.DataFrame({
                    "doc_id": ids.astype(np.int64),
                    "term": term,
                    "contrib": contrib,
                    "pos": [flat[s:s + int(t_)].astype(np.int32).tolist()
                            for s, t_ in zip(starts, tfs)],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    parts = pos_df.select("term", "blob").mapInPandas(
        decode_score,
        schema="doc_id long, term string, contrib double, pos array<int>")
    gathered = parts.groupBy("doc_id").agg(
        F.collect_list(F.struct("term", "contrib", "pos")).alias("parts"))

    n_terms = len(uterms)
    seq_local = list(seq)
    max_span = _orig_len - 1 + max(0, int(slop))

    @F.pandas_udf("double")
    def phrase_score(parts_col: pd.Series) -> pd.Series:
        out = np.full(len(parts_col), np.nan)
        for i, plist in enumerate(parts_col):
            by_term = {p["term"]: p for p in plist}
            if len(by_term) != n_terms:
                continue  # missing a phrase term
            pos_sets = {t: np.asarray(by_term[t]["pos"], dtype=np.int64)
                        for t in by_term}
            # greedy ordered match: for each start position of the first
            # token, repeatedly take the SMALLEST position of the next
            # token strictly after the current one — for a fixed start
            # this minimizes the end (exchange argument), so a span-bound
            # match exists iff the greedy chain's span fits. slop=0
            # degenerates to the consecutive-phrase check (span == len-1
            # forces adjacency under strictly increasing positions).
            starts = pos_sets[seq_local[0]]
            cur = starts
            alive = np.ones(len(starts), dtype=bool)
            for j in range(1, len(seq_local)):
                nxt = pos_sets[seq_local[j]]
                idx = np.searchsorted(nxt, cur, side="right")
                alive &= idx < len(nxt)
                if not alive.any():
                    break
                cur = nxt[np.minimum(idx, len(nxt) - 1)]
            if not (alive & (cur - starts <= max_span)).any():
                continue
            s = 0.0
            for t in sorted(by_term):  # ascending-term float order
                s += float(by_term[t]["contrib"])
            out[i] = s
        return pd.Series(out)

    out = (gathered.withColumn("score", phrase_score("parts"))
           .filter(F.col("score").isNotNull())
           .select("doc_id", "score"))
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    if tomb is not None:
        out = out.join(tomb, "doc_id", "anti")
    if doc_filter is not None:
        out = out.join(docs.filter(F.expr(doc_filter)).select("doc_id"),
                       "doc_id", "semi")
    if after is not None:
        s0, d0 = _after_cursor(after)
        out = out.filter(
            (F.col("score") < s0)
            | ((F.col("score") == s0) & (F.col("doc_id") > d0)))
    return (out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def phrase_oracle(docs: list[tuple[int, str]], phrase: str,
                  k: int = 10, slop: int = 0,
                  keep_ids: set[int] | None = None,
                  stopwords: set[str] | None = None) -> list[tuple[int, float]]:
    """Single-threaded exact reference for bm25_phrase_topk (same
    tokenizer, same ascending-term float order, same ordered-proximity
    slop semantics — matched by brute force over every start, not the
    greedy chain, so it independently checks the greedy argument).
    keep_ids mirrors doc_filter: restricts the rankable population while
    corpus stats stay global. `stopwords` mirrors the index-time
    stoplist: removed tokens keep their position slot (None — matches
    nothing) while dl/tf/df count survivors, and stoplisted phrase
    tokens shrink the chain but not the span budget."""
    import re

    stop = set(stopwords or ())
    seq_full = re.findall(TOKEN_PATTERN, phrase.lower())
    seq = [t for t in seq_full if t not in stop]
    if not seq:
        return []
    tokenized = {d: [t if t not in stop else None
                     for t in re.findall(TOKEN_PATTERN, t_.lower())]
                 for d, t_ in docs}
    live = {d: [t for t in toks if t is not None]
            for d, toks in tokenized.items()}
    n = len(tokenized)
    avgdl = sum(len(v) for v in live.values()) / n
    dfs: Counter[str] = Counter()
    tfs: dict[int, Counter] = {}
    for d, toks in live.items():
        c = Counter(toks)
        tfs[d] = c
        dfs.update(c.keys())
    uterms = sorted(set(seq))
    scores: dict[int, float] = {}
    for d, toks in tokenized.items():
        if keep_ids is not None and d not in keep_ids:
            continue
        if any(dfs.get(t, 0) == 0 or t not in tfs[d] for t in uterms):
            continue
        max_span = len(seq_full) - 1 + max(0, int(slop))

        def _matches_from(start: int) -> bool:
            # brute-force DFS over ordered assignments within the span
            def rec(j: int, prev: int) -> bool:
                if j == len(seq):
                    return True
                for p in range(prev + 1, start + max_span + 1):
                    if p < len(toks) and toks[p] == seq[j] and rec(j + 1, p):
                        return True
                return False
            return toks[start] == seq[0] and rec(1, start)

        if not any(_matches_from(i) for i in range(len(toks))):
            continue
        s = 0.0
        dl = float(len(live[d]))
        for t in uterms:
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = float(tfs[d][t])
            s += idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / avgdl))
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def bm25_facets(
    spark: SparkSession,
    index_dir: str,
    query: str,
    facets: list[str] | None = None,
    mode: str = "or",
    doc_filter: str | None = None,
    max_expansions: int = 128,
    ranges: dict[str, list[float]] | None = None,
    metrics: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Facet counts over ALL matching documents (not just the top-k) —
    the Lucene/Elasticsearch faceting shape: for each facet column (a
    docs-table metadata column, e.g. role/tool) the number of matching
    docs per value, plus one ('__total__', '', n_matches) row.

    "Matching" follows the query's retrieval semantics exactly: mode='or'
    is any positive term (or prefix expansion), mode='and' every term;
    exclusions (`-term`), field scopes (`role:user`), doc_filter, and
    pending tombstones all restrict the match set the same way they
    restrict bm25_topk's rankable population — so the total row equals
    the number of docs bm25_topk could ever return for this query.

    Plan (the 100 TB shape): ids-only Arrow decode of the query terms'
    postings (bucket/row-group-pruned; no scores, no positions) →
    distinct/conjunctive-count per doc → restriction joins → ONE join to
    the docs metadata projection (facet columns only — column pruning
    reaches the docs parquet scan) → one tiny groupBy per facet. The
    posting blobs of non-query terms are never read.

    Returns (facet string, value string, doc_count long), ordered by
    (facet, doc_count desc, value) with '__total__' first. NULL metadata
    values count under the '(null)' bucket.

    `ranges` adds numeric range facets (Lucene range faceting) over
    numeric docs columns (anomaly, doc_len, turn_idx, …): for
    ``ranges={"anomaly": [0, 0.25, 0.5, 1.0]}`` each matching doc counts
    into its half-open bucket ``[lo,hi)`` (the LAST bucket is closed —
    ``[lo,hi]`` — so the top boundary value is not silently dropped);
    values outside every bucket land in '(out)', NULLs in '(null)'.
    Bucket labels render with 6-digit precision stripped of trailing
    zeros.

    `metrics` adds numeric aggregations over each bucket (and the
    __total__ row) — the Elasticsearch sub-aggregation shape:
    ``metrics={"anomaly": ["avg", "max"]}`` appends `anomaly_avg` /
    `anomaly_max` columns computed over the matching docs in each
    bucket (fns: avg, min, max, sum)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    facets = facets or []
    ranges = ranges or {}
    if not facets and not ranges:
        raise ValueError(
            "facets: pass at least one docs metadata column (facets=) "
            "or numeric range spec (ranges=)")
    _METRIC_FNS = ("avg", "min", "max", "sum")
    metrics = metrics or {}
    for col, fns in metrics.items():
        bad_fns = [f for f in fns if f not in _METRIC_FNS]
        if bad_fns:
            raise ValueError(
                f"metrics[{col!r}]: unsupported fn(s) {bad_fns!r} — "
                f"supported: {_METRIC_FNS}")
    for col, edges in ranges.items():
        if len(edges) < 2 or sorted(edges) != list(edges)                 or len(set(edges)) != len(edges):
            raise ValueError(
                f"ranges[{col!r}]: need >= 2 strictly increasing edges, "
                f"got {edges!r}")
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(doc_filter, _scope)
    postings, docs, stats = read_index(spark, index_dir)
    bad = [c for c in [*facets, *ranges, *metrics]
           if c not in docs.columns or c == "doc_id"]
    if bad:
        raise ValueError(
            f"facets: {bad!r} not docs-metadata columns "
            f"(have {sorted(set(docs.columns) - {'doc_id'})})")
    pq = _parse_query_full(query)
    _reject_regexes(pq, "bm25_facets")
    _stop = set(stats.get("stopwords", []))
    terms, prefixes = sorted(pq.terms - _stop), sorted(pq.prefixes)
    nterms, nprefixes = sorted(pq.neg_terms - _stop), sorted(pq.neg_prefixes)
    if (prefixes or pq.fuzzies) and mode == "and":
        raise ValueError(
            "prefix wildcards / fuzzy tokens are not supported with "
            "mode='and' — expand into explicit terms for conjunctive "
            "retrieval")
    if prefixes:
        terms = sorted(set(terms) |
                       set(_expand_prefixes(postings, prefixes,
                                            max_expansions)))
    if pq.fuzzies:
        terms = sorted(set(terms) | {
            t for ts in _expand_fuzzy(postings, pq.fuzzies,
                                      max_expansions).values()
            for t in ts})
    if nprefixes:
        nterms = sorted(set(nterms) |
                        set(_expand_prefixes(postings, nprefixes,
                                             max_expansions)))
    if pq.neg_fuzzies:
        nterms = sorted(set(nterms) | {
            t for ts in _expand_fuzzy(postings, pq.neg_fuzzies,
                                      max_expansions).values()
            for t in ts})
    out_schema = "facet string, value string, doc_count long" + "".join(
        f", {col}_{fn} double"
        for col, fns in sorted(metrics.items()) for fn in fns)
    if not terms:
        return spark.createDataFrame([], out_schema)
    if "num_buckets" in stats:
        from macrobase_spark.index.xxh64 import term_bucket

        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in [*terms, *nterms]})
        postings = postings.filter(F.col("bucket").isin(buckets))
    if mode == "and":
        # conjunctive membership: a doc matches iff it carries EVERY query
        # term — distinct-term count per doc ((term, doc) is unique per
        # segment, and a doc's posting for a term lives in exactly one
        # segment, so countDistinct is exact on segmented indexes too)
        matched = (_term_doc_ids(postings, terms, with_term=True)
                   .groupBy("doc_id")
                   .agg(F.countDistinct("term").alias("_nt"))
                   .filter(F.col("_nt") == len(terms)).select("doc_id"))
    else:
        matched = _term_doc_ids(postings, terms).distinct()
    if nterms:
        matched = matched.join(_term_doc_ids(postings, nterms),
                               "doc_id", "anti")
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    if tomb is not None:
        matched = matched.join(tomb, "doc_id", "anti")
    if doc_filter is not None:
        matched = matched.join(
            docs.filter(F.expr(doc_filter)).select("doc_id"),
            "doc_id", "semi")
    fcols = list(dict.fromkeys([*facets, *ranges, *metrics]))
    meta = matched.join(docs.select("doc_id", *fcols), "doc_id")
    return _facet_single_pass(spark, meta, facets, ranges, metrics)


def _facet_single_pass(spark: SparkSession, meta: DataFrame,
                       facets: list[str], ranges: dict[str, list[float]],
                       metrics: dict[str, list[str]]) -> DataFrame:
    """ONE pass over the match set (guide §2.4 — remove repeated subtrees):
    each matching doc explodes into one (facet, value) entry per facet plus
    the __total__ entry, and a single groupBy computes every facet's counts
    and metric sub-aggs together. The old shape unioned one aggregate per
    facet, and Catalyst re-executed the whole ids-decode → restriction-join
    subtree for every union branch."""
    mcols = []
    aggs = [F.sum("_w").cast("long").alias("doc_count")]
    for col, fns in sorted(metrics.items()):
        for fn in fns:
            name = f"{col}_{fn}"
            aggs.append(getattr(F, fn)(F.col(col).cast("double"))
                        .alias(name))
            mcols.append(name)

    def _edge(x: float) -> str:
        s = f"{float(x):.6f}".rstrip("0").rstrip(".")
        return s if s else "0"

    entries = [F.struct(F.lit("__total__").alias("facet"),
                        F.lit("").alias("value"))]
    for f in dict.fromkeys(facets):
        entries.append(F.struct(
            F.lit(f).alias("facet"),
            F.coalesce(F.col(f).cast("string"), F.lit("(null)"))
            .alias("value")))
    for f, edges in ranges.items():
        c = F.col(f).cast("double")
        lab = F.when(c.isNull(), F.lit("(null)"))
        for lo, hi in zip(edges, edges[1:]):
            label = f"[{_edge(lo)},{_edge(hi)}" + (
                "]" if hi == edges[-1] else ")")
            cond = ((c >= float(lo)) & (c <= float(hi))
                    if hi == edges[-1] else
                    (c >= float(lo)) & (c < float(hi)))
            lab = lab.when(cond, F.lit(label))
        lab = lab.otherwise(F.lit("(out)"))
        entries.append(F.struct(F.lit(f).alias("facet"),
                                lab.alias("value")))
    flat = meta.select(
        F.explode(F.array(*entries)).alias("_kv"),
        *[F.col(c) for c in dict.fromkeys(metrics)],
        F.lit(1).alias("_w"),
    ).select(F.col("_kv.facet").alias("facet"),
             F.col("_kv.value").alias("value"),
             *[F.col(c) for c in dict.fromkeys(metrics)], "_w")
    # zero-weight seed: a query with zero matches must still return the
    # ('__total__', '', 0) row (the pre-r6 per-facet-aggregate behavior);
    # metric aggs ignore the seed's NULLs, sum("_w") ignores its 0.
    # Built from spark.range(1) — a plan-only one-row relation — instead of
    # createDataFrame, which pays a Python→JVM conversion round-trip per
    # query (~0.1 s of pure serving latency)
    seed = spark.range(1).select(
        F.lit("__total__").alias("facet"), F.lit("").alias("value"),
        F.lit(0).cast("int").alias("_w"))
    for c in dict.fromkeys(metrics):
        seed = seed.withColumn(c, F.lit(None).cast("double"))
    out = (flat.unionByName(seed.select(*flat.columns))
           .groupBy("facet", "value").agg(*aggs)
           .select("facet", "value", "doc_count", *mcols))
    return out.orderBy("facet", F.col("doc_count").desc(), "value")


def bm25_explain(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    doc_ids: list[int] | None = None,
    max_expansions: int = 128,
    **topk_kwargs,
) -> DataFrame:
    """Per-term scoring breakdown (Lucene Explanation): for each of the
    query's top-k docs (or an explicit doc_ids list), one row per
    contributing term with every input to the BM25 formula:

        (doc_id, term, tf, dl, df, idf, boost, contrib)

    where contrib = idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) · boost —
    summing contrib over a doc's rows reproduces bm25_topk's raw score
    bit-for-bit when summed in ascending-term order (the engine-wide
    float convention), which the identity test pins.

    Plan: one bm25_topk pass selects the target docs (skipped when
    doc_ids is given), then one bucket/row-group-pruned decode of the
    query terms' postings filtered to the target ids inside the Arrow
    kernel (the id set is bounded by k — a closure broadcast, never a
    shuffle). Anomaly/sort modifiers affect WHICH docs are selected via
    **topk_kwargs, not the raw contributions shown."""
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(
        topk_kwargs.pop("doc_filter", None), _scope)
    postings, docs, stats = read_index(spark, index_dir)
    pq = _parse_query_full(query)
    _reject_regexes(pq, "bm25_explain")
    _stop = set(stats.get("stopwords", []))
    terms, prefixes, qboosts = (sorted(pq.terms - _stop),
                                sorted(pq.prefixes), pq.boosts)
    explicit_terms = list(terms)
    if prefixes:
        terms = sorted(set(terms) |
                       set(_expand_prefixes(postings, prefixes,
                                            max_expansions)))
    fmap: dict[str, list[str]] = {}
    if pq.fuzzies:
        fmap = _expand_fuzzy(postings, pq.fuzzies, max_expansions)
        terms = sorted(set(terms) |
                       {t for ts in fmap.values() for t in ts})
    boosts: dict[str, float] = {t: qboosts[t] for t in explicit_terms
                                if t in qboosts}
    for t in terms:
        if t in boosts:
            continue
        pbs = [qboosts[p] for p in prefixes
               if p in qboosts and t.startswith(p)]
        pbs += [qboosts[ftok] for ftok, exps in fmap.items()
                if ftok in qboosts and t in exps]
        if pbs:
            boosts[t] = max(pbs)
    out_schema = ("doc_id long, term string, tf double, dl double, "
                  "df double, idf double, boost double, contrib double")
    if not terms:
        return spark.createDataFrame([], out_schema)
    if doc_ids is None:
        hits = bm25_topk(spark, index_dir, query, k=k,
                         doc_filter=doc_filter,
                         max_expansions=max_expansions,
                         **topk_kwargs).select("doc_id").collect()
        doc_ids = [r["doc_id"] for r in hits]
    if not doc_ids:
        return spark.createDataFrame([], out_schema)
    target = np.sort(np.asarray(sorted(set(int(d) for d in doc_ids)),
                                dtype=np.int64))
    n, avgdl = stats["n_docs"], stats["avgdl"]
    if "num_buckets" in stats:
        from macrobase_spark.index.xxh64 import term_bucket

        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in terms})
        postings = postings.filter(F.col("bucket").isin(buckets))
    cand = postings.filter(F.col("term").isin(terms)).select(
        "term", "df", "blob")
    # segmented index: a term spans several rows — idf needs the
    # cross-segment df sum (same policy as bm25_topk)
    idfs: dict[str, float] | None = None
    if stats.get("segmented_buckets"):
        df_rows = cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        idfs = {r["term"]: float(r["df"]) for r in df_rows}
    bmap = dict(boosts)

    def explain_fn(batches):
        from macrobase_spark.index.build import _decode_partial

        for pdf in batches:
            frames = []
            for term, t_df, blob in zip(pdf["term"], pdf["df"],
                                        pdf["blob"]):
                dfv = idfs[term] if idfs is not None else float(t_df)
                ids, tfs, dls = _decode_partial(blob)
                keep = np.flatnonzero(
                    np.isin(ids, target, assume_unique=True))
                if len(keep) == 0:
                    continue
                tf = tfs[keep].astype(np.float64)
                dl = dls[keep].astype(np.float64)
                idf = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
                b = bmap.get(term, 1.0)
                contrib = (idf * (tf * (K1 + 1.0))
                           / (tf + K1 * (1.0 - B + B * dl / avgdl))) * b
                frames.append(pd.DataFrame({
                    "doc_id": ids[keep].astype(np.int64),
                    "term": term, "tf": tf, "dl": dl,
                    "df": dfv, "idf": idf, "boost": b,
                    "contrib": contrib}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return (cand.mapInPandas(explain_fn, schema=out_schema)
            .orderBy("doc_id", "term"))


def more_like_this(
    spark: SparkSession,
    index_dir: str,
    source_df: DataFrame,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_tf: int = 1,
    min_df: int = 2,
    include_self: bool = False,
    **topk_kwargs,
) -> DataFrame:
    """Find documents similar to a seed document (Lucene MoreLikeThis):
    extract the seed's most informative terms by tf·idf, then run them as
    an ordinary disjunctive BM25 query.

    `source_df` is the corpus the index was built from (the index stores
    postings, not text) — the seed text is fetched with a doc_id pushdown
    filter, so at 100 TB this reads one document's row group. Term
    selection is driver-side over that ONE document: tf from its token
    list, df from the index's per-term stats (a bucket-pruned metadata
    read of just the candidate terms — blobs untouched), ranked by
    tf·idf with (−tfidf, term) tiebreak so the query is deterministic.
    Terms below min_tf/min_df are dropped (Lucene's noise gates); the
    top max_query_terms survive.

    The result is bm25_topk's output for that derived query (every
    modifier — doc_filter, mode, anomaly, after — passes through via
    **topk_kwargs); the seed itself is excluded unless include_self=True.
    Returns (doc_id, score)."""
    import re

    # executeTake short-circuit: the pushed-down doc_id filter hits one row
    # group; limit(1) stops the scan at the first partition that yields the
    # row instead of scanning every input split (same result — the old path
    # also used only rows[0])
    rows = (source_df.filter(F.col("doc_id") == int(doc_id))
            .select("text").limit(1).collect())
    if not rows:
        raise ValueError(f"more_like_this: doc_id {doc_id} not found in "
                         "source_df")
    toks = re.findall(TOKEN_PATTERN, (rows[0]["text"] or "").lower())
    tf = Counter(toks)
    cand = sorted(t for t, c in tf.items() if c >= min_tf)
    out_schema = "doc_id long, score double"
    if not cand:
        return spark.createDataFrame([], out_schema)
    postings, _, stats = read_index(spark, index_dir)
    n = stats["n_docs"]
    if "num_buckets" in stats:
        from macrobase_spark.index.xxh64 import term_bucket

        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in cand})
        postings = postings.filter(F.col("bucket").isin(buckets))
    df_rows = (postings.filter(F.col("term").isin(cand))
               .groupBy("term").agg(F.sum("df").alias("df")).collect())
    dfs = {r["term"]: int(r["df"]) for r in df_rows}
    ranked = sorted(
        ((tf[t] * math.log(1.0 + (n - d + 0.5) / (d + 0.5)), t)
         for t, d in dfs.items() if d >= min_df),
        key=lambda x: (-x[0], x[1]))
    terms = sorted(t for _, t in ranked[:max_query_terms])
    if not terms:
        return spark.createDataFrame([], out_schema)
    hits = bm25_topk(spark, index_dir, " ".join(terms),
                     k=k + (0 if include_self else 1), **topk_kwargs)
    if not include_self:
        hits = (hits.filter(F.col("doc_id") != int(doc_id))
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))
    return hits


def bm25_topk_sharded(
    spark: SparkSession,
    index_dirs: list[str],
    query: str,
    k: int = 10,
    mode: str = "or",
    doc_filter: str | None = None,
) -> DataFrame:
    """Top-k over a corpus SHARDED across several physical indexes
    (time-partitioned transcript eras, per-tenant shards, rolling
    windows) — scored with GLOBAL statistics so the ranking is
    bit-identical to one monolithic index over the union corpus: the
    Lucene MultiReader / Elasticsearch DFS-query-then-fetch shape.

    Global stats: n_docs and avgdl from the shards' persisted integer
    counts; per-term df summed across shards by ONE metadata job over
    the union of the shards' bucket-pruned candidate rows (term+df
    columns only). Scoring is ONE job over that same union — a doc
    lives in exactly one shard (caller contract: globally unique
    doc_ids), so the per-doc ascending-term sum reproduces the
    monolithic float order exactly (identity pinned in pytest).

    Supports mode='and'/'or', field scopes, exclusions, doc_filter
    (applied per shard docs table, unioned), stoplists (which must be
    IDENTICAL across shards — mixing analyzers raises), and pending
    tombstones per shard. Wildcards / fuzzy / boosts are not supported
    in v1 — expand them per query via bm25_topk, or pre-expand.
    Block pruning is disabled (per-shard block-max bounds were computed
    under per-shard stats)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if not index_dirs:
        raise ValueError("index_dirs: pass at least one index")
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(doc_filter, _scope)
    handles = [read_index(spark, d) for d in index_dirs]
    stops = [tuple(h[2].get("stopwords", [])) for h in handles]
    if len(set(stops)) > 1:
        raise ValueError(
            "bm25_topk_sharded: shards were built with DIFFERENT "
            f"stoplists {sorted(set(stops))!r} — global scoring would mix "
            "analyzers; rebuild with one list")
    pq = _parse_query_full(query)
    if pq.prefixes or pq.neg_prefixes or pq.fuzzies or pq.neg_fuzzies \
            or pq.regexes or pq.neg_regexes or pq.boosts:
        raise ValueError(
            "bm25_topk_sharded: wildcard/fuzzy/boost tokens are not "
            "supported across shards — pre-expand the query or use "
            "bm25_topk per shard")
    _stop = set(stops[0])
    terms = sorted(pq.terms - _stop)
    nterms = sorted(pq.neg_terms - _stop)
    out_schema = "doc_id long, score double"
    if not terms:
        return spark.createDataFrame([], out_schema)
    n_docs = sum(h[2]["n_docs"] for h in handles)
    sum_dl = sum(h[2].get("sum_dl",
                          h[2]["avgdl"] * h[2]["n_docs"]) for h in handles)
    avgdl = sum_dl / n_docs
    from macrobase_spark.index.build import tombstone_ids
    from macrobase_spark.index.xxh64 import term_bucket

    cands, neg_parts, filt_parts, tomb_parts = [], [], [], []
    for (postings, docs, stats), d in zip(handles, index_dirs):
        if "num_buckets" in stats:
            buckets = sorted({term_bucket(t, stats["num_buckets"])
                              for t in [*terms, *nterms]})
            postings = postings.filter(F.col("bucket").isin(buckets))
        cands.append(postings.filter(F.col("term").isin(terms))
                     .select("term", "df", "blob"))
        if nterms:
            neg_parts.append(_term_doc_ids(postings, nterms))
        if doc_filter is not None:
            filt_parts.append(
                docs.filter(F.expr(doc_filter)).select("doc_id"))
        tomb = tombstone_ids(spark, d)
        if tomb is not None:
            tomb_parts.append(tomb)
    cand_all = cands[0]
    for c in cands[1:]:
        cand_all = cand_all.unionByName(c)
    # ONE global-df metadata job over the union (term+df column pruned)
    df_rows = cand_all.groupBy("term").agg(F.sum("df").alias("df")).collect()
    idfs = {r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5)
                                / (r["df"] + 0.5)) for r in df_rows}
    # the scorer needs block_max/max_impact columns for its schema; feed
    # constants that disable pruning (single_term=False, no lambdas)
    cand_sc = cand_all.withColumn(
        "max_impact", F.lit(0.0)).withColumn(
        "block_max", F.array().cast("array<double>"))
    contrib = cand_sc.mapInPandas(
        _score_partition(n_docs, avgdl, k, single_term=False, idfs=idfs),
        schema="doc_id long, term string, contrib double")
    scored = (
        contrib.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
            F.count("term").alias("_nt"),
        )
    )
    if mode == "and":
        scored = scored.filter(F.col("_nt") == len(terms))
    scored = scored.drop("_nt")
    for part in neg_parts:
        scored = scored.join(part, "doc_id", "anti")
    for part in tomb_parts:
        scored = scored.join(part, "doc_id", "anti")
    if filt_parts:
        keep = filt_parts[0]
        for p in filt_parts[1:]:
            keep = keep.unionByName(p)
        scored = scored.join(keep, "doc_id", "semi")
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def bm25_phrase_topk_batch(
    spark: SparkSession,
    index_dir: str,
    phrases: dict[str, str] | list[str],
    k: int = 10,
    slop: int = 0,
    doc_filter: str | None = None,
) -> DataFrame:
    """Top-k for MANY phrase queries in one positional scan — the batch
    twin of bm25_phrase_topk (same span-budget semantics, same
    ascending-term scores, pytest-pinned bit-identical per query):
    one bucket/row-group-pruned decode over the union of every phrase's
    terms, one per-doc gather, then a vectorized verify that evaluates
    every phrase whose terms a document carries. Returns (query_id,
    doc_id, score, rank).

    Candidate pre-filtering (the single path's rarest-term doc set) is
    skipped — the batch amortizes one full decode of the union terms
    across all phrases, which is the serving shape when phrases share
    vocabulary. slop and doc_filter apply to every phrase in the batch."""
    import re

    from pyspark.sql import Window as W

    from macrobase_spark.index.codec import decode_positional

    if isinstance(phrases, list):
        phrases = {str(i): p for i, p in enumerate(phrases)}
    out_schema = "query_id string, doc_id long, score double, rank int"
    _, docs, stats = read_index(spark, index_dir)
    if not stats.get("has_positions"):
        raise ValueError(
            f"index at {index_dir!r} has no positional layer — build with "
            "build_index(..., positions=True) to enable phrase queries")
    _stop = set(stats.get("stopwords", []))
    seqs: dict[str, list[str]] = {}
    spans: dict[str, int] = {}
    for qid, p in phrases.items():
        seq_full = re.findall(TOKEN_PATTERN, p.lower())
        seq = [t for t in seq_full if t not in _stop]
        if seq:
            seqs[qid] = seq
            spans[qid] = len(seq_full) - 1 + max(0, int(slop))
    if not seqs:
        return spark.createDataFrame([], out_schema)
    n, avgdl = stats["n_docs"], stats["avgdl"]
    all_terms = sorted({t for s in seqs.values() for t in s})
    import os as _os

    pos_df = spark.read.parquet(_os.path.join(index_dir, "positions"))
    from macrobase_spark.index.xxh64 import term_bucket

    buckets = sorted({term_bucket(t, stats["num_buckets"])
                      for t in all_terms})
    pos_df = (pos_df.filter(F.col("bucket").isin(buckets))
              .filter(F.col("term").isin(all_terms)))
    meta = pos_df.select("term", "df").collect()
    dfs: dict[str, int] = {}
    for r in meta:
        dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["df"])
    # a phrase with an unindexed term can never match — drop it up front
    live = {qid: s for qid, s in seqs.items()
            if all(t in dfs for t in s)}
    if not live:
        return spark.createDataFrame([], out_schema)
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
           for t, d in dfs.items()}

    def decode_score(batches):
        for pdf in batches:
            frames = []
            for term, blob in zip(pdf["term"], pdf["blob"]):
                ids, tfs, dls, flat = decode_positional(blob)
                if len(ids) == 0:
                    continue
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                contrib = idf[term] * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * dl / avgdl))
                starts = np.concatenate(
                    ([0], np.cumsum(tfs)))[:-1].astype(np.int64)
                frames.append(pd.DataFrame({
                    "doc_id": ids.astype(np.int64),
                    "term": term,
                    "contrib": contrib,
                    "pos": [flat[s:s + int(t_)].astype(np.int32).tolist()
                            for s, t_ in zip(starts, tfs)],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    parts = pos_df.select("term", "blob").mapInPandas(
        decode_score,
        schema="doc_id long, term string, contrib double, pos array<int>")
    gathered = parts.groupBy("doc_id").agg(
        F.collect_list(F.struct("term", "contrib", "pos")).alias("parts"))

    live_local = {qid: list(s) for qid, s in live.items()}
    spans_local = dict(spans)

    def verify(pdf_iter):
        for pdf in pdf_iter:
            out_q, out_d, out_s = [], [], []
            for doc_id, plist in zip(pdf["doc_id"], pdf["parts"]):
                by_term = {p["term"]: p for p in plist}
                for qid, seq_local in live_local.items():
                    pos_sets = {}
                    ok = True
                    for t in set(seq_local):
                        if t not in by_term:
                            ok = False
                            break
                        pos_sets[t] = np.asarray(by_term[t]["pos"],
                                                 dtype=np.int64)
                    if not ok:
                        continue
                    starts = pos_sets[seq_local[0]]
                    cur = starts
                    alive = np.ones(len(starts), dtype=bool)
                    for j in range(1, len(seq_local)):
                        nxt = pos_sets[seq_local[j]]
                        idx = np.searchsorted(nxt, cur, side="right")
                        alive &= idx < len(nxt)
                        if not alive.any():
                            break
                        cur = nxt[np.minimum(idx, len(nxt) - 1)]
                    if not (alive
                            & (cur - starts <= spans_local[qid])).any():
                        continue
                    s = 0.0
                    for t in sorted(set(seq_local)):
                        s += float(by_term[t]["contrib"])
                    out_q.append(qid)
                    out_d.append(int(doc_id))
                    out_s.append(s)
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "doc_id": out_d,
                                    "score": out_s})

    scored = gathered.mapInPandas(
        verify, schema="query_id string, doc_id long, score double")
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    if tomb is not None:
        scored = scored.join(tomb, "doc_id", "anti")
    if doc_filter is not None:
        scored = scored.join(
            docs.filter(F.expr(doc_filter)).select("doc_id"),
            "doc_id", "semi")
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def _matched_ids(
    spark: SparkSession,
    index_dir: str,
    query: str,
    mode: str,
    min_should_match: int | None,
    doc_filter: str | None,
    max_expansions: int,
) -> DataFrame | None:
    """The query's full match set as a (doc_id) DataFrame on the ids-only
    decode path, honoring mode / min_should_match / exclusions / field
    scopes / doc_filter / tombstones. None when no document can match
    (no indexable terms, or min_should_match above the term count).
    Shared engine of bm25_count and bm25_match_ids."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if min_should_match is not None:
        if not isinstance(min_should_match, int) or min_should_match < 1:
            raise ValueError("min_should_match must be a positive int, "
                             f"got {min_should_match!r}")
        if mode == "and":
            raise ValueError(
                "min_should_match does not compose with mode='and' — "
                "'and' already requires every term; pass one or the other")
    msm = min_should_match if (min_should_match or 0) > 1 else None
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(doc_filter, _scope)
    postings, docs, stats = read_index(spark, index_dir)
    pq = _parse_query_full(query)
    _reject_regexes(pq, "bm25_count / bm25_match_ids")
    _stop = set(stats.get("stopwords", []))
    terms = sorted(pq.terms - _stop)
    nterms = sorted(pq.neg_terms - _stop)
    if pq.prefixes:
        if mode == "and" or msm is not None:
            raise ValueError(
                "prefix wildcards / fuzzy tokens are not supported with "
                "mode='and' / min_should_match — expand into explicit "
                "terms for conjunctive retrieval")
        terms = sorted(set(terms) |
                       set(_expand_prefixes(postings, sorted(pq.prefixes),
                                            max_expansions)))
    if pq.fuzzies:
        if mode == "and" or msm is not None:
            raise ValueError(
                "prefix wildcards / fuzzy tokens are not supported with "
                "mode='and' / min_should_match — expand into explicit "
                "terms for conjunctive retrieval")
        terms = sorted(set(terms) | {
            t for ts in _expand_fuzzy(postings, pq.fuzzies,
                                      max_expansions).values() for t in ts})
    if pq.neg_prefixes:
        nterms = sorted(set(nterms) |
                        set(_expand_prefixes(postings,
                                             sorted(pq.neg_prefixes),
                                             max_expansions)))
    if pq.neg_fuzzies:
        nterms = sorted(set(nterms) | {
            t for ts in _expand_fuzzy(postings, pq.neg_fuzzies,
                                      max_expansions).values() for t in ts})
    if not terms:
        return None
    if "num_buckets" in stats:
        from macrobase_spark.index.xxh64 import term_bucket

        buckets = sorted({term_bucket(t, stats["num_buckets"])
                          for t in [*terms, *nterms]})
        postings = postings.filter(F.col("bucket").isin(buckets))
    if msm is not None and msm > len(terms):
        return None
    if mode == "and" or msm is not None:
        need = len(terms) if mode == "and" else msm
        cmp_col = (F.col("_nt") == need if mode == "and"
                   else F.col("_nt") >= need)
        matched = (_term_doc_ids(postings, terms, with_term=True)
                   .groupBy("doc_id")
                   .agg(F.countDistinct("term").alias("_nt"))
                   .filter(cmp_col).select("doc_id"))
    else:
        matched = _term_doc_ids(postings, terms).distinct()
    if nterms:
        matched = matched.join(_term_doc_ids(postings, nterms),
                               "doc_id", "anti")
    from macrobase_spark.index.build import tombstone_ids

    tomb = tombstone_ids(spark, index_dir)
    if tomb is not None:
        matched = matched.join(tomb, "doc_id", "anti")
    if doc_filter is not None:
        matched = matched.join(
            docs.filter(F.expr(doc_filter)).select("doc_id"),
            "doc_id", "semi")
    return matched


def bm25_count(
    spark: SparkSession,
    index_dir: str,
    query: str,
    mode: str = "or",
    min_should_match: int | None = None,
    doc_filter: str | None = None,
    max_expansions: int = 128,
) -> DataFrame:
    """Number of documents matching the query under full retrieval
    semantics (mode / min_should_match / exclusions / field scopes /
    doc_filter / tombstones) — a one-row (n_matches long) relation,
    computed on the ids-only path (no scores, no positions, and unlike
    bm25_facets no docs-metadata join unless a doc filter requires
    one)."""
    matched = _matched_ids(spark, index_dir, query, mode,
                           min_should_match, doc_filter, max_expansions)
    if matched is None:
        return spark.createDataFrame([(0,)], "n_matches long")
    return matched.agg(F.count("*").alias("n_matches"))


def bm25_match_ids(
    spark: SparkSession,
    index_dir: str,
    query: str,
    mode: str = "or",
    min_should_match: int | None = None,
    doc_filter: str | None = None,
    max_expansions: int = 128,
) -> DataFrame:
    """EVERY matching doc_id — the scroll/export shape that feeds a
    downstream pipeline stage ("drop all docs matching these boilerplate
    queries", "re-embed everything mentioning X") rather than a results
    page. Same full retrieval semantics as bm25_count over the same
    ids-only decode (no scores computed, no positions read, no top-k
    limit, nothing collected to the driver): the result is a lazy
    (doc_id) relation to join/anti-join against the corpus at 100 TB.
    For a ranked export use bm25_topk with a large k instead — this path
    exists precisely to skip the scoring shuffle."""
    matched = _matched_ids(spark, index_dir, query, mode,
                           min_should_match, doc_filter, max_expansions)
    if matched is None:
        return spark.createDataFrame([], "doc_id long")
    return matched


def hybrid_topk(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame | None,
    query: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 60,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    ann_index: str | None = None,
    ann_kind: str = "ivf",
    n_probe: int = 4,
    **topk_kwargs,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion: run
    BM25 top-`depth` over the index AND exact cosine top-`depth` of
    `query_vec` against the `vectors` table (id_col must be the same
    doc_id space), then fuse with the standard RRF formula

        rrf(d) = Σ_runs 1 / (rrf_k + rank_run(d))

    (docs absent from a run contribute nothing for it — the
    rank-fusion default). Returns (doc_id, rrf_score, bm25_rank,
    cos_rank) top-k by (rrf desc, doc_id asc) — deterministic because
    both input rankings are. Every bm25_topk option (mode, doc_filter,
    field scopes, …) passes through via **topk_kwargs and restricts the
    LEXICAL run only; the semantic run is pure nearest-neighbor.

    Both runs are `depth`-bounded (the serving pattern: fuse two cheap
    deep-ish lists rather than score the union exactly); the fusion
    itself is driver-free — a full-outer join of two k-scale relations.

    The semantic run scans the `vectors` table exactly (brute force) —
    OR, with ``ann_index=`` set, queries a PERSISTED ANN index instead
    (`ann_kind` 'ivf' or 'lsh' — pipelines.similarity ivf_build/
    lsh_build output; `vectors` is then ignored and may be None): the
    100 TB semantic leg, cell/bucket-pruned instead of scanned. At
    full probe (n_probe = the index's n_centroids) IVF is exact, so
    ANN-hybrid equals brute-hybrid bit-for-bit — pytest-pinned."""
    from pyspark.sql import Window as W

    from macrobase_spark.pipelines.similarity import cosine_topk_bruteforce

    lex = (bm25_topk(spark, index_dir, query, k=depth, **topk_kwargs)
           .select("doc_id",
                   F.row_number().over(
                       W.orderBy(F.col("score").desc(),
                                 F.col("doc_id").asc()))
                   .alias("bm25_rank")))
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "q_id long, q_vec array<double>")
    if ann_index is not None:
        from macrobase_spark.pipelines.similarity import ivf_query, lsh_query

        if ann_kind == "ivf":
            raw = ivf_query(spark, ann_index, qdf, k=depth,
                            n_probe=n_probe)
        elif ann_kind == "lsh":
            raw = lsh_query(spark, ann_index, qdf, k=depth)
        else:
            raise ValueError(
                f"ann_kind must be 'ivf' or 'lsh', got {ann_kind!r}")
        sem = raw.select(F.col("vec_id").alias("doc_id"),
                         F.col("rank").alias("cos_rank"))
    else:
        if vectors is None:
            raise ValueError(
                "hybrid_topk: pass a vectors DataFrame (brute force) or "
                "ann_index= (persisted ANN)")
        sem = (cosine_topk_bruteforce(vectors, qdf, k=depth,
                                      id_col=id_col, vec_col=vec_col)
               .select(F.col(id_col).alias("doc_id"),
                       F.col("rank").alias("cos_rank")))
    fused = (lex.join(sem, "doc_id", "full")
             .withColumn(
                 "rrf_score",
                 F.coalesce(1.0 / (F.lit(rrf_k) + F.col("bm25_rank")),
                            F.lit(0.0))
                 + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("cos_rank")),
                              F.lit(0.0))))
    return (fused.select("doc_id", "rrf_score", "bm25_rank", "cos_rank")
            .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
            .limit(k))


def bm25_facets_sharded(
    spark: SparkSession,
    index_dirs: list[str],
    query: str,
    facets: list[str] | None = None,
    mode: str = "or",
    doc_filter: str | None = None,
    max_expansions: int = 128,
    ranges: dict[str, list[float]] | None = None,
    metrics: dict[str, list[str]] | None = None,
) -> DataFrame:
    """bm25_facets over a sharded corpus (see bm25_topk_sharded): facet
    membership is stats-free (a doc matches in exactly one shard), so
    the result is IDENTICAL to a monolithic index over the union —
    pytest-pinned. Each shard contributes its ids-only match set and its
    docs-metadata projection; one union, the same per-facet groupBys.
    Mixed stoplists refuse loudly (they change which query terms
    exist). Wildcards/fuzzies are rejected as in bm25_topk_sharded."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if not index_dirs:
        raise ValueError("index_dirs: pass at least one index")
    query, _scope = _split_field_scopes(query)
    doc_filter = _merge_doc_filter(doc_filter, _scope)
    handles = [read_index(spark, d) for d in index_dirs]
    stops = [tuple(h[2].get("stopwords", [])) for h in handles]
    if len(set(stops)) > 1:
        raise ValueError(
            "bm25_facets_sharded: shards were built with DIFFERENT "
            f"stoplists {sorted(set(stops))!r} — rebuild with one list")
    pq = _parse_query_full(query)
    if pq.prefixes or pq.neg_prefixes or pq.fuzzies or pq.neg_fuzzies \
            or pq.regexes or pq.neg_regexes or pq.boosts:
        raise ValueError(
            "bm25_facets_sharded: wildcard/fuzzy/boost tokens are not "
            "supported across shards — pre-expand the query")
    _stop = set(stops[0])
    terms = sorted(pq.terms - _stop)
    nterms = sorted(pq.neg_terms - _stop)
    facets = facets or []
    ranges = ranges or {}
    metrics = metrics or {}
    if not facets and not ranges:
        raise ValueError(
            "facets: pass at least one docs metadata column (facets=) "
            "or numeric range spec (ranges=)")
    out_schema = "facet string, value string, doc_count long" + "".join(
        f", {col}_{fn} double"
        for col, fns in sorted(metrics.items()) for fn in fns)
    if not terms:
        return spark.createDataFrame([], out_schema)
    from macrobase_spark.index.build import tombstone_ids
    from macrobase_spark.index.xxh64 import term_bucket

    matched_parts, docs_parts = [], []
    for (postings, docs, stats), d in zip(handles, index_dirs):
        if "num_buckets" in stats:
            buckets = sorted({term_bucket(t, stats["num_buckets"])
                              for t in [*terms, *nterms]})
            postings = postings.filter(F.col("bucket").isin(buckets))
        if mode == "and":
            m = (_term_doc_ids(postings, terms, with_term=True)
                 .groupBy("doc_id")
                 .agg(F.countDistinct("term").alias("_nt"))
                 .filter(F.col("_nt") == len(terms)).select("doc_id"))
        else:
            m = _term_doc_ids(postings, terms).distinct()
        if nterms:
            m = m.join(_term_doc_ids(postings, nterms), "doc_id", "anti")
        tomb = tombstone_ids(spark, d)
        if tomb is not None:
            m = m.join(tomb, "doc_id", "anti")
        if doc_filter is not None:
            m = m.join(docs.filter(F.expr(doc_filter)).select("doc_id"),
                       "doc_id", "semi")
        matched_parts.append(m)
        docs_parts.append(docs)
    matched = matched_parts[0]
    for p in matched_parts[1:]:
        matched = matched.unionByName(p)
    fcols = list(dict.fromkeys([*facets, *ranges, *metrics]))
    bad = [c for c in fcols
           if any(c not in dp.columns for dp in docs_parts)
           or c == "doc_id"]
    if bad:
        raise ValueError(
            f"facets: {bad!r} not docs-metadata columns in every shard")
    all_docs = docs_parts[0].select("doc_id", *fcols)
    for dp in docs_parts[1:]:
        all_docs = all_docs.unionByName(dp.select("doc_id", *fcols))
    meta = matched.join(all_docs, "doc_id")
    for col, fns in metrics.items():
        bad_fns = [f for f in fns if f not in ("avg", "min", "max", "sum")]
        if bad_fns:
            raise ValueError(
                f"metrics[{col!r}]: unsupported fn(s) {bad_fns!r}")
    for f, edges in ranges.items():
        if len(edges) < 2 or sorted(edges) != list(edges) \
                or len(set(edges)) != len(edges):
            raise ValueError(
                f"ranges[{f!r}]: need >= 2 strictly increasing edges, "
                f"got {edges!r}")
    return _facet_single_pass(spark, meta, facets, ranges, metrics)
