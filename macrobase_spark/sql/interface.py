"""MacroBase SQL — the reference's SQL dialect over the Spark engine.

The reference's primary UX is a SQL REPL with three extensions on top of
ANSI SQL (grammar: sql/src/main/antlr4/.../SqlBase.g4; engine:
sql/src/main/java/.../QueryEngine.java):

1. `IMPORT FROM CSV FILE '<path>' INTO tbl(col type, ...)`  (SqlBase.g4:33-34)
2. `SELECT * FROM DIFF (<rel>) [alias], (<rel>) [alias] | (SPLIT <rel> WHERE
   <pred>) ON <cols|*> [WITH MIN RATIO r MIN SUPPORT s] [COMPARE BY
   metric(COUNT(*))] [MAX COMBO k] [ORDER BY ...] [LIMIT n]
   [INTO OUTFILE '<f>']`  (SqlBase.g4:67-112; QueryEngine.java:140-253)
3. the scalar UDF `percentile(col)` usable in SELECT and (via its alias) in
   WHERE — evaluated over the FULL relation before filtering
   (QueryEngine.java:1016-1060, 1150-1165; MBFunction.java:139-161)

Everything else is delegated verbatim to `spark.sql` — Catalyst handles the
standard relational surface, so this layer is a thin translator, not a SQL
engine. DIFF subqueries/SPLIT relations are evaluated through the same
translator, so DIFF composes with joins (the diff-joins golden corpus).

DIFF defaults replicate the reference: MIN SUPPORT 0.2, MIN RATIO 1.5,
MAX COMBO 3, metric global_ratio (DiffQuerySpecification.java:31-36).

Reference quirk kept: `a JOIN b ON col` (bare column, no equality) means
USING(col) in the reference grammar — rewritten accordingly.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPE_MAP = {
    "string": "string",
    "double": "double",
    "float": "float",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "boolean": "boolean",
}


def _split_statements(text: str) -> list[str]:
    """Split on ';' outside single-quoted strings."""
    out, cur, in_str = [], [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
            cur.append(ch)
        elif ch == ";" and not in_str:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s.strip() for s in out if s.strip()]


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (quote-aware)."""
    depth, in_str = 0, False
    for i in range(open_idx, len(s)):
        ch = s[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i
    raise ValueError(f"unbalanced parentheses in: {s!r}")


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren depth 0 (quote-aware) — a regex lookahead
    cannot pair nested calls like greatest(x, abs(y))."""
    out, cur, depth, in_str = [], [], 0, False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == sep and depth == 0:
                out.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    out.append("".join(cur))
    return [x for x in out if x.strip()]


def _is_top_level_diff(stmt: str) -> bool:
    """True iff the first PAREN-DEPTH-0 `FROM` is immediately followed by
    DIFF — `DIFF` inside a subquery must not hijack the outer statement."""
    depth, in_str, i, n = 0, False, 0, len(stmt)
    up = stmt.upper()
    while i < n:
        ch = stmt[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and up.startswith("FROM", i) and (
                    i == 0 or not (stmt[i - 1].isalnum() or stmt[i - 1] == "_")
            ) and (i + 4 >= n or not (stmt[i + 4].isalnum()
                                      or stmt[i + 4] == "_")):
                rest = stmt[i + 4:].lstrip()
                return rest.upper().startswith("DIFF") and (
                    len(rest) == 4 or not (rest[4:5].isalnum()
                                           or rest[4:5] == "_"))
        i += 1
    return False


_IMPORT_RE = re.compile(
    r"^\s*IMPORT\s+FROM\s+CSV\s+FILE\s+'(?P<path>[^']+)'\s+INTO\s+"
    r"(?P<table>\w+)\s*(?:\(\s*(?P<cols>[^)]*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OUTFILE_RE = re.compile(r"\s+INTO\s+OUTFILE\s+'(?P<path>[^']+)'\s*$",
                         re.IGNORECASE)
_DIFF_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+DIFF\s+", re.IGNORECASE | re.DOTALL)
# the reference-grammar quirk is a SINGLE bare identifier: require a clause
# boundary right after it, so genuine ON expressions (function calls, NOT,
# AND-chains) are delegated verbatim instead of being mangled into USING
_BARE_ON_RE = re.compile(
    r"(\bJOIN\s+\w+(?:\s+\w+)?)\s+ON\s+(\w+)"
    r"(?=\s*$|\s*;|\s*\)|\s+(?:WHERE|GROUP|ORDER|LIMIT|JOIN|INTO)\b)",
    re.IGNORECASE)
_PCT_RE = re.compile(r"percentile\s*\(\s*(\w+)\s*\)", re.IGNORECASE)
_SEARCH_RE = re.compile(
    r"SEARCH\s*\(\s*(?P<idx>\w+)\s*,\s*'(?P<q>[^']*)'\s*"
    r"(?:,\s*(?P<k>\d+)\s*)?"
    r"(?P<opts>(?:,\s*(?:(?:ANOMALY_(?:MAX|WEIGHT)|SLOP|RECENCY)\s*=\s*[0-9.eE+-]+"
    r"|MATCH\s*=\s*(?:ALL|ANY|\d+)"
    r"|(?:SNIPPET|COLLAPSE)\s*=\s*\w+"
    r"|COUNT"
    r"|(?:FILTER|SORT|FACETS|SYNONYMS)\s*=\s*'(?:[^']|'')*')\s*)*)\)",
    re.IGNORECASE)
_SEARCH_OPT_RE = re.compile(
    r"(?P<key>ANOMALY_MAX|ANOMALY_WEIGHT|SLOP|RECENCY|MATCH|FILTER|SNIPPET"
    r"|SORT|FACETS|SYNONYMS|COLLAPSE|COUNT)(?:\s*=\s*"
    r"(?P<val>'(?:[^']|'')*'|[0-9.eE+-]+|ALL|ANY|\w+))?",
    re.IGNORECASE)


_SUGGEST_RE = re.compile(
    r"(?P<kind>SUGGEST|SPELLCHECK)\s*\(\s*(?P<idx>\w+)\s*,\s*"
    r"'(?P<q>[^']*)'\s*(?:,\s*(?P<a>\d+)\s*)?(?:,\s*(?P<b>\d+)\s*)?\)",
    re.IGNORECASE)


class MacroBaseSQL:
    """Executes MacroBase SQL text against a SparkSession.

    Tables come from `IMPORT FROM CSV` statements or from any temp view
    already registered on the session (`df.createOrReplaceTempView`)."""

    # single-file CSV sink bound: results up to this many rows are written
    # by the driver as ONE file (reference QueryEngine exportToCsv
    # semantics); larger results fall back to a distributed `<path>.d/`
    # directory write so a big SELECT cannot OOM the driver
    OUTFILE_DRIVER_ROWS = 1_000_000

    def __init__(self, spark: SparkSession, base_dir: str | None = None,
                 write_outfiles: bool = True, outfile_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir or os.getcwd()
        # INTO OUTFILE writes a single CSV like the reference
        # (QueryEngine exportToCsv); explanation-size results only.
        # outfile_dir overrides where relative OUTFILE paths land (the
        # reference writes relative to its working directory).
        self.write_outfiles = write_outfiles
        self.outfile_dir = outfile_dir or self.base_dir
        self.last_outfile: str | None = None
        self._view_n = 0
        self._indexes: dict[str, str] = {}

    # ------------------------------------------------------------- public

    def attach_index(self, name: str, index_dir: str) -> None:
        """Register a persisted inverted index (index.build.build_index
        output) under `name`, making `SEARCH(name, 'query terms' [, k])`
        usable as a relation in FROM clauses — the BM25 engine surfaced
        through the SQL front-end:

            SELECT s.doc_id, s.score, d.text
            FROM SEARCH(transcripts, 'merge scan row', 10) s
            JOIN docs d USING (doc_id)

        The SEARCH relation has columns (doc_id, score), ranked by BM25
        over the index (k defaults to 10); it stays a lazy DataFrame, so
        joins/filters around it plan normally.

        `index_dir` may be a LIST of index directories: SEARCH then runs
        bm25_topk_sharded over them with global statistics (rank-
        identical to a monolithic index; see its docstring). Sharded
        attachments support the plain query form plus MATCH/FILTER and
        field scopes — phrase/SNIPPET/SORT/FACETS/ANOMALY_* raise."""
        self._indexes[name] = index_dir

    def execute(self, text: str) -> DataFrame | None:
        """Run one or more ';'-separated statements; returns the last
        statement's DataFrame (IMPORTs return the imported table)."""
        result = None
        for stmt in _split_statements(text):
            result = self._execute_one(stmt)
        return result

    # ---------------------------------------------------------- internals

    def _fresh_view(self, tag: str) -> str:
        self._view_n += 1
        return f"_mbsql_{tag}_{self._view_n}"

    def _execute_one(self, stmt: str) -> DataFrame:
        m = _IMPORT_RE.match(stmt)
        if m:
            return self._import_csv(m)
        stmt, outfile = self._strip_outfile(stmt)
        if _DIFF_RE.match(stmt) and _is_top_level_diff(stmt):
            df = self._diff_query(stmt)
        else:
            df = self._plain_query(stmt)
        if outfile:
            path = outfile if os.path.isabs(outfile) else os.path.join(
                self.outfile_dir, outfile)
            self.last_outfile = path
            if self.write_outfiles:
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                # the reference's CSV sink is a single driver-written file
                # (explanation-scale results); guard it so a big SELECT
                # cannot OOM the driver — above the bound the result is
                # written distributed (a directory of part CSVs) instead.
                # The probe is a row-limited COUNT (no driver
                # materialization); the small path re-executes the
                # explanation-scale query once more, which is the cheap
                # side of the trade.
                n = df.limit(self.OUTFILE_DRIVER_ROWS + 1).count()
                if n <= self.OUTFILE_DRIVER_ROWS:
                    df.toPandas().to_csv(path, index=False)
                else:
                    df.write.mode("overwrite").option("header", "true").csv(
                        path + ".d")
                    self.last_outfile = path + ".d"
        return df

    def _strip_outfile(self, stmt: str) -> tuple[str, str | None]:
        m = _OUTFILE_RE.search(stmt)
        if not m:
            return stmt, None
        return stmt[: m.start()], m.group("path")

    def _import_csv(self, m: re.Match) -> DataFrame:
        path = m.group("path")
        if not os.path.isabs(path):
            path = os.path.normpath(os.path.join(self.base_dir, path))
        table = m.group("table")
        cols = m.group("cols")
        reader = self.spark.read.option("header", "true")
        df = reader.csv(path)
        if cols:
            casts = []
            for colspec in cols.split(","):
                name, typ = colspec.split()
                casts.append(F.col(name).cast(_TYPE_MAP[typ.lower()]).alias(name))
            df = df.select(*casts)
        df.createOrReplaceTempView(table)
        return df

    # ------------------------------------------------------------- plain

    def _plain_query(self, stmt: str) -> DataFrame:
        stmt = self._rewrite_search(stmt)
        stmt = self._rewrite_suggest(stmt)
        stmt = _BARE_ON_RE.sub(lambda m: f"{m.group(1)} USING ({m.group(2)})", stmt)
        stmt = self._qualify_join_dups(stmt)
        if _PCT_RE.search(stmt):
            stmt = self._rewrite_percentile(stmt)
        return self.spark.sql(stmt)

    def _rewrite_search(self, stmt: str) -> str:
        """Replace SEARCH(index, 'terms'[, k][, ANOMALY_MAX=x]
        [, ANOMALY_WEIGHT=y]) with a temp view holding the BM25 top-k
        relation for that query (see attach_index). The anomaly options
        surface bm25_topk's score modifier — the north-rule MacroBase
        row-score heritage — through the SQL front-end: ANOMALY_MAX filters
        docs with anomaly > x; ANOMALY_WEIGHT down-weights scores by
        (1 − y·anomaly).

        MATCH=ALL makes the query conjunctive (bm25_topk mode="and":
        only docs containing every term rank; MATCH=ANY is the default
        disjunctive retrieval). MATCH=<n> is minimum_should_match: only
        docs containing at least n distinct query terms rank
        (bm25_topk min_should_match — the middle ground; supported on
        the plain query form and COUNT).

        FILTER='<sql expr>' restricts the rankable docs by a predicate
        over the docs table's metadata columns (bm25_topk doc_filter),
        e.g. FILTER='role = ''assistant''' — '' escapes a quote, standard
        SQL. Applies to both bag-of-words and phrase queries. Query
        tokens ending in * are prefix wildcards expanded against the
        term dictionary (bm25_topk semantics).

        RECENCY=<half_life_days> is recency-decay scoring (bm25_topk
        recency_half_life): scores weighted by 0.5^(age_days/half_life)
        against the corpus max timestamp. Plain bag-of-words queries on
        a single index only.

        SYNONYMS='fast:quick rapid;big:large' is query-time synonym
        expansion (bm25_topk synonyms): query terms on the left of a
        ':' also match their space-separated alternates, each alternate
        scored with its own idf. Plain bag-of-words queries on a single
        index only.

        SNIPPET=<view> renders the hits page: the relation becomes
        (doc_id, score, snippet, n_matched) via highlight_topk, reading
        document text from the named temp view (which must carry doc_id
        and text columns). Works for bag-of-words AND phrase queries.

        SORT='turn_idx desc' ranks the matching docs by docs-table
        metadata instead of relevance (bm25_topk sort_by); the sort
        columns ride along in the relation. FACETS='role,tool' turns the
        relation into facet counts over ALL matching docs — (facet,
        value, doc_count) with a '__total__' row (bm25_facets; composes
        with MATCH/FILTER and field scopes, not with SNIPPET/SORT/
        ANOMALY_* or phrase queries). Field scopes (role:assistant)
        inside the query string work as in bm25_topk.

        A double-quoted query routes to the positional phrase engine:
        SEARCH(idx, '"exact phrase"'[, k][, SLOP=w]) runs
        bm25_phrase_topk — ordered-proximity match over the index's
        positional layer (build_index(positions=True)), slop=w extra
        tokens allowed between phrase terms. SLOP without quotes, or
        ANOMALY_* with quotes, is rejected loudly rather than silently
        reinterpreted."""

        def sub(m: re.Match) -> str:
            name = m.group("idx")
            if name not in self._indexes:
                raise ValueError(
                    f"no index attached as {name!r} — call "
                    "attach_index(name, index_dir) first")
            k = int(m.group("k") or 10)
            q = m.group("q")
            anomaly_max, anomaly_weight, slop, match = None, 0.0, None, None
            doc_filter, snippet_view, sort_spec, facet_spec = (None,) * 4
            collapse_col, count_flag, syn_map = None, False, None
            recency_hl = None
            for om in _SEARCH_OPT_RE.finditer(m.group("opts") or ""):
                key = om.group("key").upper()
                if key == "COUNT":
                    count_flag = True
                    continue
                if om.group("val") is None:
                    raise ValueError(f"SEARCH: {key} requires a value")
                if key == "COLLAPSE":
                    collapse_col = om.group("val")
                elif key == "RECENCY":
                    recency_hl = float(om.group("val"))
                elif key == "ANOMALY_MAX":
                    anomaly_max = float(om.group("val"))
                elif key == "ANOMALY_WEIGHT":
                    anomaly_weight = float(om.group("val"))
                elif key == "MATCH":
                    match = om.group("val").upper()
                elif key in ("FILTER", "SORT", "FACETS", "SYNONYMS"):
                    # standard SQL string escaping: '' inside the quoted
                    # value is a literal single quote
                    val = om.group("val")[1:-1].replace("''", "'")
                    if key == "FILTER":
                        doc_filter = val
                    elif key == "SORT":
                        sort_spec = val
                    elif key == "SYNONYMS":
                        # 'fast:quick rapid;big:large' → {src: [alts]}
                        syn_map = {}
                        for ent in val.split(";"):
                            ent = ent.strip()
                            if not ent:
                                continue
                            src, sep, alts = ent.partition(":")
                            if not sep or not alts.strip():
                                raise ValueError(
                                    "SEARCH: SYNONYMS entries are "
                                    "'term:alt1 alt2[;...]' — got "
                                    f"{ent!r}")
                            syn_map[src.strip()] = alts.split()
                    else:
                        facet_spec = [c.strip() for c in val.split(",")
                                      if c.strip()]
                elif key == "SNIPPET":
                    snippet_view = om.group("val")
                else:
                    slop = int(float(om.group("val")))
            phrase = len(q) >= 2 and q.startswith('"') and q.endswith('"')
            # MATCH=ALL → conjunctive; MATCH=<n> → minimum_should_match
            s_mode, s_msm = "or", None
            if match == "ALL":
                s_mode = "and"
            elif match is not None and match != "ANY":
                s_msm = int(match)
            view = self._fresh_view("search")
            target = self._indexes[name]
            if syn_map is not None and (
                    phrase or count_flag or snippet_view is not None
                    or facet_spec is not None
                    or isinstance(target, (list, tuple))):
                raise ValueError(
                    "SEARCH: SYNONYMS applies to plain bag-of-words "
                    "queries on a single index")
            if recency_hl is not None and (
                    phrase or count_flag or snippet_view is not None
                    or facet_spec is not None
                    or isinstance(target, (list, tuple))):
                raise ValueError(
                    "SEARCH: RECENCY applies to plain bag-of-words "
                    "queries on a single index")
            if count_flag:
                if (phrase or snippet_view is not None
                        or sort_spec is not None or facet_spec is not None
                        or anomaly_max is not None or anomaly_weight
                        or slop is not None or collapse_col is not None
                        or isinstance(target, (list, tuple))):
                    raise ValueError(
                        "SEARCH: COUNT composes with MATCH/FILTER and "
                        "field scopes only")
                from macrobase_spark.index.bm25 import bm25_count

                bm25_count(
                    self.spark, target, q, mode=s_mode,
                    min_should_match=s_msm,
                    doc_filter=doc_filter).createOrReplaceTempView(view)
                return view
            if collapse_col is not None and (
                    phrase or snippet_view is not None
                    or facet_spec is not None
                    or isinstance(target, (list, tuple))):
                raise ValueError(
                    "SEARCH: COLLAPSE applies to plain bag-of-words "
                    "queries on a single index")
            if isinstance(target, (list, tuple)):
                if (phrase or snippet_view is not None
                        or sort_spec is not None or facet_spec is not None
                        or anomaly_max is not None or anomaly_weight
                        or slop is not None):
                    raise ValueError(
                        "SEARCH over a sharded attachment supports the "
                        "plain query form plus MATCH/FILTER and field "
                        "scopes — not phrase/SNIPPET/SORT/FACETS/"
                        "ANOMALY_*/SLOP")
                if s_msm is not None:
                    raise ValueError(
                        "SEARCH: MATCH=<n> (minimum_should_match) is not "
                        "supported over a sharded attachment — use "
                        "MATCH=ALL/ANY")
                from macrobase_spark.index.bm25 import bm25_topk_sharded

                bm25_topk_sharded(
                    self.spark, list(target), q, k=k, mode=s_mode,
                    doc_filter=doc_filter).createOrReplaceTempView(view)
                return view
            if facet_spec is not None:
                if (phrase or snippet_view is not None
                        or sort_spec is not None
                        or anomaly_max is not None or anomaly_weight):
                    raise ValueError(
                        "SEARCH: FACETS composes with MATCH/FILTER and "
                        "field scopes only — not with phrase queries, "
                        "SNIPPET, SORT, or ANOMALY_* options")
                if s_msm is not None:
                    raise ValueError(
                        "SEARCH: MATCH=<n> (minimum_should_match) is not "
                        "supported with FACETS — use MATCH=ALL/ANY")
                from macrobase_spark.index.bm25 import bm25_facets

                bm25_facets(
                    self.spark, self._indexes[name], q, facet_spec,
                    mode=s_mode,
                    doc_filter=doc_filter).createOrReplaceTempView(view)
                return view
            if sort_spec is not None and (phrase or snippet_view is not None):
                raise ValueError(
                    "SEARCH: SORT applies to plain bag-of-words queries "
                    "only — not phrase queries or SNIPPET rendering")
            if phrase:
                if anomaly_max is not None or anomaly_weight:
                    raise ValueError(
                        "SEARCH: ANOMALY_MAX/ANOMALY_WEIGHT do not apply "
                        "to phrase queries — drop the double quotes for a "
                        "bag-of-words query or the anomaly options for a "
                        "phrase query")
                if match is not None:
                    raise ValueError(
                        "SEARCH: MATCH does not apply to phrase queries — "
                        "a phrase already requires every term (in order)")
                if snippet_view is not None:
                    from macrobase_spark.index.snippets import highlight_topk

                    highlight_topk(
                        self.spark, self._indexes[name],
                        self.spark.table(snippet_view), q, k=k,
                        slop=slop or 0,
                        doc_filter=doc_filter).createOrReplaceTempView(view)
                    return view
                from macrobase_spark.index.bm25 import bm25_phrase_topk

                bm25_phrase_topk(
                    self.spark, self._indexes[name], q[1:-1], k=k,
                    slop=slop or 0,
                    doc_filter=doc_filter).createOrReplaceTempView(view)
                return view
            if slop is not None:
                raise ValueError(
                    "SEARCH: SLOP applies only to phrase queries — wrap "
                    "the query in double quotes: "
                    "SEARCH(idx, '\"a b\"', k, SLOP=1)")
            if snippet_view is not None:
                if s_msm is not None:
                    raise ValueError(
                        "SEARCH: MATCH=<n> (minimum_should_match) is not "
                        "supported with SNIPPET — use MATCH=ALL/ANY")
                from macrobase_spark.index.snippets import highlight_topk

                highlight_topk(
                    self.spark, self._indexes[name],
                    self.spark.table(snippet_view), q, k=k,
                    anomaly_max=anomaly_max, anomaly_weight=anomaly_weight,
                    mode=s_mode,
                    doc_filter=doc_filter).createOrReplaceTempView(view)
                return view
            from macrobase_spark.index.bm25 import bm25_topk

            bm25_topk(self.spark, self._indexes[name], q, k=k,
                      anomaly_max=anomaly_max, anomaly_weight=anomaly_weight,
                      mode=s_mode, min_should_match=s_msm,
                      doc_filter=doc_filter, sort_by=sort_spec,
                      collapse=collapse_col, synonyms=syn_map,
                      recency_half_life=recency_hl,
                      ).createOrReplaceTempView(view)
            return view

        return _SEARCH_RE.sub(sub, stmt)

    def _rewrite_suggest(self, stmt: str) -> str:
        """Replace SUGGEST(index, 'prefix'[, k]) with a temp view of the
        prefix-autocomplete relation (term, df) and
        SPELLCHECK(index, 'token'[, max_edits[, k]]) with the
        did-you-mean relation (term, df, distance) — the suggestion
        surface (index/suggest.py) in the SQL dialect."""

        def sub_s(m: re.Match) -> str:
            name = m.group("idx")
            if name not in self._indexes:
                raise ValueError(
                    f"no index attached as {name!r} — call "
                    "attach_index(name, index_dir) first")
            target = self._indexes[name]
            if isinstance(target, tuple):
                target = list(target)
            from macrobase_spark.index.suggest import (spellcheck,
                                                       suggest_terms)

            view = self._fresh_view("suggest")
            if m.group("kind").upper() == "SUGGEST":
                k = int(m.group("a") or 10)
                suggest_terms(self.spark, target, m.group("q"),
                              k=k).createOrReplaceTempView(view)
            else:
                me = int(m.group("a") or 2)
                k = int(m.group("b") or 5)
                spellcheck(self.spark, target, m.group("q"), max_edits=me,
                           k=k).createOrReplaceTempView(view)
            return view

        return _SUGGEST_RE.sub(sub_s, stmt)

    def _qualify_join_dups(self, stmt: str) -> str:
        """`SELECT * FROM a JOIN b USING (c)` where a and b share NON-join
        columns: the reference qualifies the ambiguous outputs as `a.x` /
        `b.x` (QueryEngine.java:712-752) — replicate by expanding * into an
        explicit projection with those aliases."""
        jm = re.match(
            r"^\s*SELECT\s+\*\s+FROM\s+(\w+)\s+JOIN\s+(\w+)\s+"
            r"USING\s*\(([^)]*)\)(.*)$",
            stmt, re.IGNORECASE | re.DOTALL)
        if not jm:
            return stmt
        t1, t2, using, tail = jm.groups()
        join_cols = [c.strip() for c in using.split(",")]
        c1 = self.spark.table(t1).columns
        c2 = self.spark.table(t2).columns
        dups = (set(c1) & set(c2)) - set(join_cols)
        if not dups:
            return stmt
        sel = list(join_cols)
        for t, cs in ((t1, c1), (t2, c2)):
            sel += [f"{t}.{c} AS `{t}.{c}`" if c in dups else c
                    for c in cs if c not in join_cols]
        return (f"SELECT {', '.join(sel)} FROM {t1} JOIN {t2} "
                f"USING ({using}){tail}")

    def _rewrite_percentile(self, stmt: str) -> str:
        """Evaluate percentile(col) over the FULL base relation, then make
        it (and its SELECT alias) visible to WHERE — the reference computes
        UDF columns before applying the predicate (QueryEngine.java:1150-65).
        """
        from macrobase_spark.operators.transform import percentile_col

        m = re.search(
            r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<table>\w+)"
            r"(?:\s+WHERE\s+(?P<where>.*?))?"
            r"(?P<tail>\s+(?:ORDER|GROUP|LIMIT)\b.*)?$",
            stmt, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot rewrite percentile() in: {stmt!r}")
        table, sel = m.group("table"), m.group("select")
        where, tail = m.group("where"), m.group("tail") or ""
        base = self.spark.table(table)
        aug = base
        subs: dict[str, str] = {}
        for col in {c.lower() for c in _PCT_RE.findall(stmt)}:
            out = f"__pct_{col}"
            aug = percentile_col(aug, col, output_col=out)
            subs[col] = out
        view = self._fresh_view("pct")
        aug.createOrReplaceTempView(view)

        aliases: dict[str, str] = {}

        def sub_pct(match: re.Match) -> str:
            return subs[match.group(1).lower()]

        # SELECT items: replace percentile(c); bare (unaliased) occurrences
        # keep the reference's output column name `percentile(c)`.
        items = []
        for item in _split_top_level(sel):
            item = item.strip()
            if item == "*":  # expand against the BASE columns (the augmented
                items.append(", ".join(base.columns))  # view adds __pct_*)
                continue
            pm = _PCT_RE.fullmatch(item)
            if pm:  # bare `percentile(usage)` — name the column like the ref
                col = pm.group(1).lower()
                items.append(f"{subs[col]} AS `percentile({col})`")
                continue
            am = re.fullmatch(r"(?is)" + _PCT_RE.pattern + r"\s+AS\s+(\w+)", item)
            if am:
                col, alias = am.group(1).lower(), am.group(2)
                aliases[alias] = subs[col]
                items.append(f"{subs[col]} AS {alias}")
                continue
            items.append(_PCT_RE.sub(sub_pct, item))
        new_sel = ", ".join(items)
        # the tail (ORDER BY / GROUP BY / LIMIT) can also reference
        # percentile(c) — left unrewritten it would resolve to Spark's
        # native percentile aggregate (wrong semantics / analysis error)
        tail = _PCT_RE.sub(sub_pct, tail)
        if where:
            where = _PCT_RE.sub(sub_pct, where)
            for alias, expr in aliases.items():
                where = re.sub(rf"\b{alias}\b", expr, where)
            return f"SELECT {new_sel} FROM {view} WHERE {where}{tail}"
        return f"SELECT {new_sel} FROM {view}{tail}"

    # -------------------------------------------------------------- DIFF

    def _diff_query(self, stmt: str) -> DataFrame:
        from macrobase_spark.operators.diff import diff, diff_split

        m = _DIFF_RE.match(stmt)
        select_items = m.group("select")
        rest = stmt[m.end():].lstrip()

        min_support, min_ratio, max_combo = 0.2, 1.5, 3
        metric = "global_ratio"

        if re.match(r"^\(\s*SPLIT\b", rest, re.IGNORECASE | re.DOTALL):
            close = _match_paren(rest, rest.index("("))
            split_body = rest[rest.index("(") + 1: close]
            rest = rest[close + 1:].lstrip()
            sm = re.match(r"^\s*SPLIT\s+(?P<rel>.+?)\s+WHERE\s+(?P<pred>.+)$",
                          split_body, re.IGNORECASE | re.DOTALL)
            rel_txt, pred = sm.group("rel").strip(), sm.group("pred").strip()
            rel = self._relation(rel_txt)
            mode = ("split", rel, pred)
        else:
            first, rest = self._take_subquery(rest)
            am = re.match(r"^\s*(\w+)?\s*,\s*", rest)
            if am is None:
                raise ValueError(
                    "DIFF expects two relations `(q1) [a], (q2) [b]` or a "
                    f"SPLIT relation; could not parse after the first "
                    f"relation: {rest[:80]!r}")
            rest = rest[am.end():].lstrip()
            second, rest = self._take_subquery(rest)
            rest = rest.lstrip()
            am2 = re.match(r"^(\w+)\s+", rest)
            if am2 and am2.group(1).upper() != "ON":  # trailing alias
                rest = rest[am2.end():]
            mode = ("two", first, second)

        om = re.match(r"^\s*ON\s+(?P<cols>\*|[\w\s,]+?)"
                      r"(?=\s+(?:WITH|COMPARE|MAX|ORDER|LIMIT)\b|\s*$)",
                      rest, re.IGNORECASE | re.DOTALL)
        if not om:
            raise ValueError(f"DIFF query missing ON clause: {stmt!r}")
        cols_txt = om.group("cols").strip()
        attrs = None if cols_txt == "*" else [c.strip() for c in cols_txt.split(",")]
        rest = rest[om.end():]

        rm = re.search(r"MIN\s+RATIO\s+([\d.eE+-]+)", rest, re.IGNORECASE)
        if rm:
            min_ratio = float(rm.group(1))
        sm_ = re.search(r"MIN\s+SUPPORT\s+([\d.eE+-]+)", rest, re.IGNORECASE)
        if sm_:
            min_support = float(sm_.group(1))
        cm = re.search(r"COMPARE\s+BY\s+(\w+)\s*(?:\([^)]*\))?", rest, re.IGNORECASE)
        if cm:
            metric = cm.group(1).lower()
        mm = re.search(r"MAX\s+COMBO\s+(\d+)", rest, re.IGNORECASE)
        if mm:
            max_combo = int(mm.group(1))

        # containment=True: reference APriori emit/explore semantics — an
        # itemset covered by an already-passing subset is suppressed
        kwargs = dict(min_support=min_support, ratio_metric=metric,
                      min_ratio=min_ratio, max_order=max_combo,
                      containment=True)
        if mode[0] == "split":
            result = diff_split(mode[1], F.expr(mode[2]), attrs, **kwargs)
        else:
            outliers = mode[1].withColumn("_OUTLIER", F.lit(1.0))
            inliers = mode[2].withColumn("_OUTLIER", F.lit(0.0))
            result = diff(outliers.unionByName(inliers), attrs, **kwargs)

        # outer SELECT / ORDER BY / LIMIT over the explanation relation
        order_m = re.search(r"ORDER\s+BY\s+(?P<ob>[\w\s,]+?(?:\s+(?:ASC|DESC))?)\s*"
                            r"(?=LIMIT\b|$)", rest, re.IGNORECASE)
        limit_m = re.search(r"LIMIT\s+(\d+)", rest, re.IGNORECASE)
        needs_sql = (select_items.strip() != "*") or order_m or limit_m
        if not needs_sql:
            return result
        view = self._fresh_view("diff")
        result.createOrReplaceTempView(view)
        q = f"SELECT {select_items} FROM {view}"
        if order_m:
            q += f" ORDER BY {order_m.group('ob').strip()}"
        if limit_m:
            q += f" LIMIT {limit_m.group(1)}"
        return self.spark.sql(q)

    def _take_subquery(self, s: str) -> tuple[DataFrame, str]:
        """Parse a leading '(query)' group; returns (DataFrame, remainder)."""
        if not s.startswith("("):
            raise ValueError(f"expected '(' at start of DIFF relation: {s!r}")
        close = _match_paren(s, 0)
        inner = s[1:close].strip()
        return self._relation(inner), s[close + 1:]

    def _relation(self, txt: str) -> DataFrame:
        """A relation: bare table name, or any SELECT handled recursively."""
        if re.fullmatch(r"\w+", txt):
            return self.spark.table(txt)
        if txt.startswith("(") and txt.endswith(")"):
            return self._relation(txt[1:-1].strip())
        return self._execute_one(txt)
