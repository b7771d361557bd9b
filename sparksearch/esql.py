"""ES|QL — Elasticsearch's piped query language — compiled to Spark
DataFrames.

ES|QL (GA in Elasticsearch 8.14) is the modern query surface of the
reference family: ``FROM idx | WHERE … | EVAL … | STATS … BY … | SORT …
| LIMIT …``. This module implements a deterministic, value-checkable
subset as a real compiler: a tokenizer, a recursive-descent expression
parser, and a command-by-command translation onto the DataFrame API —
so every pipeline stays a single declarative Catalyst plan (predicate
pushdown, partial aggregation and TakeOrderedAndProject all apply
exactly as if the query had been written against the DataFrame API
directly; the compiler adds zero UDFs and zero driver round-trips).

Supported commands (each ``|``-separated stage transforms the frame of
the previous one, so ``EVAL``/``WHERE`` after ``STATS`` operate on the
aggregated frame, matching ES|QL semantics):

    FROM <table>
    ROW   <name> = <expr> [, …]    — literal one-row source (pipeline seed)
    WHERE <boolean expr>
    EVAL  <name> = <expr> [, <name> = <expr> …]
    STATS <name> = <agg>(…) [WHERE <cond>] [, …] [BY <col> [, <col> …]]
    INLINESTATS <name> = <agg>(…) [WHERE <cond>] [, …] [BY <col> [, <col> …]]
    SORT  <col> [ASC|DESC] [, …]
    LIMIT <n>
    KEEP  <col-or-pattern> [, …]   — wildcards expand (KEEP event_*, *_id)
    DROP  <col-or-pattern> [, …]
    RENAME <old> AS <new> [, …]
    SAMPLE <prob> <key_col>        — deterministic h60-hash sampling (the
                                     seeded-hash dialect variant of ES's
                                     random SAMPLE; 1e-6 granularity)
    FORK (branch) (branch) […]     — ≥2 sub-pipelines from one persisted
                                     parent frame, unioned with a _fork
                                     discriminator + null-filled columns;
                                     stage splitting is paren-depth-aware
    FUSE <key> [, <key> …]         — RRF over the preceding FORK's
                                     branches (9.x): each branch ranks by
                                     its own final SORT, fuse_score =
                                     Σ 1/(60 + rank) as a fixed addition
                                     chain, merged on the key columns
                                     (the explicit _id analog)
    CHANGE_POINT <value> ON <key>  — deterministic mean-shift argmax over
                                     the piped frame (exact BIGINT
                                     cross-products, round6 ratio rank)

INLINESTATS attaches the per-group aggregates to every row without
collapsing: with BY keys it compiles to window functions (one hash
partition, no join); without keys the 1-row global aggregate broadcasts
back.

Expressions: arithmetic (+ - * / %), comparisons (== != < <= > >=),
AND/OR/NOT, IN (…), LIKE "glob*" (ES|QL ``*``/``?`` wildcards), IS
[NOT] NULL, string/number literals, parentheses.

Scalar functions (cross-engine-pinned semantics, the repo's float
discipline baked into the LANGUAGE so every compiled query is oracle-
checkable):
  EPOCH_DAY(ts)   — integer epoch day, floor(floored-epoch / 86400)
                    (the serial_diff/cohort integer-day discipline;
                    DATE_TRUNC on raw timestamps is NOT engine-portable)
  ROUND(x, n)     — decimal(28,9)-quantize then exact-decimal round
                    (stats.round6 generalized to scale n)
  ABS, LENGTH, LOWER, UPPER, CONCAT, TO_LONG, TO_DOUBLE
  BUCKET(x, span) — floor(x/span)·span, single-IEEE-op portable
  STARTS_WITH, ENDS_WITH, TO_UPPER, TO_LOWER
  DATE_EXTRACT("year"|"month"|"day", ts) — calendar fields only
  MV_COUNT, MV_MIN, MV_MAX, MV_CONCAT, MV_SUM (exact decimal fold),
  MV_SORT, MV_SLICE (0-based inclusive; bounds validated at compile
  time), MV_DEDUPE (pinned sorted), MV_FIRST/MV_LAST, MV_REVERSE,
  MV_APPEND, MV_AVG (exact fold + one division), MV_ZIP (null-skip
  concat matches ES's longer-array contract)
  TRIM/LTRIM/RTRIM, REPLACE (regex, global), LEFT/RIGHT, REVERSE,
  LOCATE, GREATEST/LEAST, CEIL/FLOOR (BIGINT), SQRT (IEEE-exact)
  DATE_TRUNC("day"|"month"|"year", ts) — ISO-string rendering (native
  date_trunc is not engine-portable at week boundaries)
  DATE_DIFF("day"|"second", a, b) — floor-both-sides epoch integers
  CIDR_MATCH(ip, "a.b.c.d/n", …) — compile-time block parse, one
  integer shiftright+equality per block at runtime
  IP_PREFIX(ip, n) — top-n-bit mask re-rendered as a dotted quad

Aggregations: COUNT(*), COUNT(x), COUNT_DISTINCT(x), MIN, MAX,
SUM (a DOUBLE argument is quantized to decimal(28,9) per row and summed
EXACTLY — the vsm/training_data_stats order-independent-sum remedy —
returning a scale-9 decimal; integer arguments sum as exact BIGINT),
AVG (exact SUM + one final double division),
MEDIAN / PERCENTILE(x, p) — EXACT interpolated percentile (the
deterministic replacement for ES's TDigest): decimal(28,9)-quantized
sort, h=(n-1)p/100, pure exact-decimal interpolation, round6 output,
TOP(x, k, "asc"|"desc") / VALUES(x) — multivalue aggregates (VALUES
pins SORTED ascending where ES leaves order unspecified),
WEIGHTED_AVG(v, w) — exact decimal(28,9)×(9,0) numerator with ENFORCED
integer weights < 10^9 (fractional weights throw; both sums share the
cap), STD_DEV — exact decimal(18,6) moments with decimal-side squaring
(sidesteps the wide-cast divergence), pinned S2/n − m² order. The
collect-based aggregates (MEDIAN/PERCENTILE/TOP/VALUES) work in STATS
and the no-BY INLINESTATS broadcast form, not the windowed BY form.

Structuring commands: DISSECT (one-literal-separator split → typed
columns, no regex engine), GROK (%{WORD|INT|NUMBER:name} core syntaxes
compiled to ONE anchored regex, capture groups → typed columns),
MV_EXPAND (explode a multi-valued column; SPLIT/SUBSTRING produce the
arrays/slices it consumes), LOOKUP JOIN (broadcast left join).

Fulltext: MATCH(field, "query") (8.17) — the query tokenizes at compile
time through the engine's pinned analyzer and the predicate compiles to
token-set overlap (ES match semantics: analyzed terms, OR operator);
QSTR(field, "query") — query_string with a compile-time boolean
mini-grammar (OR lowest / AND / NOT / parens, bare terms OR by
default). Boolean forms only — scored retrieval stays with the bm25
family.

ENRICH with the RANGE match type (round-4 verdict item #6): ``ENRICH
policy ON field WITH col, …`` — the policy table carries ``range_lo`` /
``range_hi`` columns (standing in for ES's policy metadata; lo
inclusive, hi exclusive — the range field's gte/lt convention) and the
translation is a broadcast LEFT interval join, the physical shape
LOOKUP JOIN's equi-key cannot express. Policies with the exact match
type need no ENRICH — LOOKUP JOIN covers that shape, which is why plain
ENRICH stayed intentionally absent through round 4. Overlapping policy
ranges duplicate rows (the join semantic; ES would multi-value them) —
define disjoint ranges for scalar enrichment.

What is intentionally absent: full GROK pattern library (the three core
syntaxes keep every compiled query DuckDB-twinnable), and scored
fulltext (METADATA _score).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["compile_esql", "EsqlError"]


class EsqlError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<str>"[^"]*")
      | (?P<id>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op>==|!=|<=|>=|[-+*/%(),<>=|])
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM", "WHERE", "EVAL", "STATS", "BY", "SORT", "LIMIT", "KEEP",
    "DROP", "ASC", "DESC", "AND", "OR", "NOT", "IN", "LIKE", "IS", "NULL",
    "LOOKUP", "JOIN", "ON", "DISSECT", "GROK", "MV_EXPAND", "INLINESTATS",
    "RENAME", "AS", "SAMPLE", "FORK", "CHANGE_POINT", "ENRICH", "WITH",
    "ROW", "FUSE",
}


@dataclass
class _Tok:
    kind: str  # num | str | id | op | kw
    text: str


def _tokenize(src: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise EsqlError(f"cannot tokenize at: {src[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup == "id" and m.group("id").upper() in _KEYWORDS:
            toks.append(_Tok("kw", m.group("id").upper()))
        else:
            toks.append(_Tok(m.lastgroup, m.group(m.lastgroup)))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks, self.i = toks, 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise EsqlError("unexpected end of query")
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> _Tok | None:
        t = self.peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise EsqlError(f"expected {text or kind}, got {got and got.text!r}")
        return t

    def done(self) -> bool:
        return self.i >= len(self.toks)


def _round_scale(col: Column, n: int) -> Column:
    """stats.round6 generalized: quantize once to decimal(28,9), then the
    n-dp round is exact decimal arithmetic — identical on both engines."""
    return F.round(col.cast("decimal(28,9)"), n).cast("double")


def _require_lit(args: list[Column], i: int, fn: str):
    """The literal value a function contract requires at position ``i``.
    Column.__getattr__ resolves unknown attributes as FIELD access, so
    hasattr()/direct attribute reads can never detect the marker — only
    the instance dict set by _lit() identifies a real literal."""
    lit = args[i].__dict__.get("_esql_lit") if len(args) > i else None
    if lit is None:
        raise EsqlError(f"{fn} needs a literal at argument {i + 1}")
    return lit


_FUNCS = {
    "EPOCH_DAY": lambda a: F.floor(
        a[0].cast("timestamp").cast("long") / 86400
    ).cast("long"),
    "ROUND": lambda a: _round_scale(a[0], int(_require_lit(a, 1, "ROUND"))),
    "ABS": lambda a: F.abs(a[0]),
    "LENGTH": lambda a: F.length(a[0]).cast("long"),
    "LOWER": lambda a: F.lower(a[0]),
    "UPPER": lambda a: F.upper(a[0]),
    "CONCAT": lambda a: F.concat(*a),
    "TO_LONG": lambda a: a[0].cast("long"),
    "TO_DOUBLE": lambda a: a[0].cast("double"),
    "TO_STRING": lambda a: a[0].cast("string"),
    "COALESCE": lambda a: F.coalesce(*a),
    "CASE": lambda a: _case(a),
    # SPLIT(str, delim) — delim is a LITERAL string (the ES|QL contract),
    # regex-escaped before it reaches Spark's regex-based split.
    "SPLIT": lambda a: F.split(a[0], re.escape(str(_require_lit(a, 1, "SPLIT")))),
    "SUBSTRING": lambda a: F.substring(
        a[0],
        int(_require_lit(a, 1, "SUBSTRING")),
        int(_require_lit(a, 2, "SUBSTRING")),
    ),
    # BUCKET(x, span) — ES|QL's numeric bucketing function: the start of
    # x's span-wide bucket, floor(x/span)·span. The division and the
    # product are single IEEE double ops in the same order on both
    # engines, and floor (TRUE floor, not DuckDB's truncating //) is
    # exact — so compiled buckets twin without quantization.
    "BUCKET": lambda a: F.floor(a[0] / a[1]).cast("double") * a[1],
    # CATEGORIZE(text) — ES|QL 8.18's log-message categorization function
    # (EVAL cat = CATEGORIZE(msg) | STATS … BY cat): the deterministic
    # template key shared verbatim with the categorize_text aggregation —
    # first 4 pinned-tokenizer tokens, digit runs masked to '#' (ES's
    # online drain tree is arrival-order-dependent; the mask+prefix key
    # is the reproducible core, the variable_width_histogram precedent).
    "CATEGORIZE": lambda a: _categorize(a),
    "MATCH": lambda a: _match(a),
    "QSTR": lambda a: _qstr(a),
    "DATE_TRUNC": lambda a: _date_trunc(a),
    "DATE_DIFF": lambda a: _date_diff(a),
    "STARTS_WITH": lambda a: a[0].startswith(a[1]),
    "ENDS_WITH": lambda a: a[0].endswith(a[1]),
    "TO_UPPER": lambda a: F.upper(a[0]),
    "TO_LOWER": lambda a: F.lower(a[0]),
    # DATE_EXTRACT(part, ts): calendar fields both engines compute
    # identically from a UTC-pinned timestamp (only these three parts are
    # admitted — sub-day parts route through the EPOCH_DAY discipline).
    "DATE_EXTRACT": lambda a: _date_extract(a),
    # MV_* multi-valued scalar functions (the SPLIT/MV_EXPAND companions).
    # MV_COUNT/MV_MIN/MV_MAX are direct; MV_SUM keeps the language's exact
    # discipline (per-element decimal(28,9) quantize, exact fold);
    # MV_CONCAT renders with a literal delimiter.
    "MV_COUNT": lambda a: F.size(a[0]).cast("long"),
    "MV_MIN": lambda a: F.array_min(a[0]),
    "MV_MAX": lambda a: F.array_max(a[0]),
    # the merge result must carry the accumulator's EXACT decimal type —
    # Spark's + widens (28,9)+(18,9) → (29,9), and at the 38 cap it DROPS
    # scale silently — so cast back each step (lossless below 10^19).
    "MV_SUM": lambda a: F.aggregate(
        a[0],
        F.lit(0).cast("decimal(28,9)"),
        lambda acc, x: (acc + x.cast("decimal(18,9)")).cast("decimal(28,9)"),
    ),
    "MV_CONCAT": lambda a: F.array_join(
        a[0], str(_require_lit(a, 1, "MV_CONCAT"))
    ),
    # -- session-11 widening: string / math / IP functions ------------------
    "TRIM": lambda a: F.trim(a[0]),
    "LTRIM": lambda a: F.ltrim(a[0]),
    "RTRIM": lambda a: F.rtrim(a[0]),
    # REPLACE(str, regex, new) — the ES|QL contract is REGEX replacement
    # (all occurrences). Spark regexp_replace is always global; the DuckDB
    # twin needs the 'g' flag (first-match-only otherwise — repo sharp edge).
    "REPLACE": lambda a: F.regexp_replace(
        a[0],
        str(_require_lit(a, 1, "REPLACE")),
        str(_require_lit(a, 2, "REPLACE")),
    ),
    "LEFT": lambda a: F.substring(a[0], 1, int(_require_lit(a, 1, "LEFT"))),
    # RIGHT: explicit start arithmetic — Spark's negative-start substring
    # and DuckDB's right() disagree when the string is shorter than n.
    "RIGHT": lambda a: F.substring(
        a[0],
        F.greatest(
            F.length(a[0]) - int(_require_lit(a, 1, "RIGHT")) + 1, F.lit(1)
        ),
        F.lit(int(_require_lit(a, 1, "RIGHT"))),
    ),
    "REVERSE": lambda a: F.reverse(a[0]),
    # LOCATE(string, substring) — 1-based, 0 when absent (both engines'
    # native contract: Spark locate / DuckDB strpos).
    "LOCATE": lambda a: F.locate(str(_require_lit(a, 1, "LOCATE")), a[0]).cast(
        "long"
    ),
    "GREATEST": lambda a: F.greatest(*a),
    "LEAST": lambda a: F.least(*a),
    # CEIL/FLOOR return BIGINT in this dialect (cross-engine-pinned: DuckDB
    # returns DOUBLE natively); SQRT is IEEE-correctly-rounded on both.
    "CEIL": lambda a: F.ceil(a[0]).cast("long"),
    "FLOOR": lambda a: F.floor(a[0]).cast("long"),
    "SQRT": lambda a: F.sqrt(a[0]),
    "CIDR_MATCH": lambda a: _cidr_match(a),
    "IP_PREFIX": lambda a: _ip_prefix(a),
    # -- session-11b: MV_* family completion --------------------------------
    # MV_SORT(mv, "asc"|"desc"); MV_SLICE uses ES's 0-based inclusive
    # [start, end] contract (non-negative literals in this dialect);
    # MV_DEDUPE pins SORTED ascending output (ES leaves order unspecified
    # — the deterministic-variant policy, same as VALUES); MV_AVG keeps
    # the exact-decimal-sum + one-division discipline; MV_APPEND
    # concatenates; MV_ZIP joins element pairs with a literal delimiter
    # (shorter array null-pads, the ES contract via zip_with).
    "MV_SORT": lambda a: F.sort_array(
        a[0], asc=str(_require_lit(a, 1, "MV_SORT")).lower() != "desc"
    ),
    "MV_SLICE": lambda a: _mv_slice(a),
    "MV_DEDUPE": lambda a: F.array_sort(F.array_distinct(a[0])),
    "MV_FIRST": lambda a: F.element_at(a[0], 1),
    "MV_LAST": lambda a: F.element_at(a[0], -1),
    "MV_REVERSE": lambda a: F.reverse(a[0]),
    "MV_APPEND": lambda a: F.concat(a[0], a[1]),
    "MV_AVG": lambda a: F.aggregate(
        a[0],
        F.lit(0).cast("decimal(28,9)"),
        lambda acc, x: (acc + x.cast("decimal(18,9)")).cast("decimal(28,9)"),
    ).cast("double")
    / F.size(a[0]),
    "MV_ZIP": lambda a: F.zip_with(
        a[0],
        a[1],
        lambda x, y: F.concat_ws(str(_require_lit(a, 2, "MV_ZIP")), x, y),
    ),
}


def _mv_slice(a: list[Column]) -> Column:
    """MV_SLICE(mv, start, end) — ES's 0-based INCLUSIVE [start, end].
    This dialect admits only non-negative literals (ES also accepts
    negative from-the-end indices; translating those through Spark's
    sign-sensitive F.slice would silently return wrong elements, so the
    restriction is enforced at compile time rather than mis-translated)."""
    start = int(_require_lit(a, 1, "MV_SLICE"))
    end = int(_require_lit(a, 2, "MV_SLICE"))
    if start < 0 or end < start:
        raise EsqlError(
            "MV_SLICE needs 0 <= start <= end (negative indices are not "
            "supported in this dialect)"
        )
    return F.slice(a[0], start + 1, end - start + 1)


def _ip_int(ip: Column) -> Column:
    """Dotted-quad string → 32-bit integer (exact long arithmetic)."""
    parts = F.split(ip, r"\.")
    c = F.lit(0).cast("long")
    for i in range(4):
        c = c * 256 + F.get(parts, i).cast("long")
    return c


def _parse_cidr(block: str) -> tuple[int, int]:
    """'a.b.c.d/n' → (base >> (32-n), 32-n); raises on malformed blocks."""
    m = re.fullmatch(r"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})/(\d{1,2})", block)
    if not m:
        raise EsqlError(f"malformed CIDR block {block!r}")
    o = [int(m.group(i)) for i in range(1, 5)]
    bits = int(m.group(5))
    if any(x > 255 for x in o) or not 0 <= bits <= 32:
        raise EsqlError(f"malformed CIDR block {block!r}")
    base = ((o[0] * 256 + o[1]) * 256 + o[2]) * 256 + o[3]
    return base >> (32 - bits) if bits < 32 else base, 32 - bits


def _cidr_match(args: list[Column]) -> Column:
    """CIDR_MATCH(ip, "block", …) — true when the ip falls in ANY block.
    The blocks are compile-time literals: each test is one integer
    shiftright + equality (no string ops per block at runtime)."""
    if len(args) < 2:
        raise EsqlError('CIDR_MATCH needs (ip, "block" [, "block" …])')
    ipi = _ip_int(args[0])
    cond = None
    for i in range(1, len(args)):
        prefix, shift = _parse_cidr(str(_require_lit(args, i, "CIDR_MATCH")))
        c = F.shiftright(ipi, shift) == F.lit(prefix)
        cond = c if cond is None else (cond | c)
    return cond


def _ip_prefix(args: list[Column]) -> Column:
    """IP_PREFIX(ip, n) — keep the top n bits, zero the rest, re-render as
    a dotted quad (integer shifts and mods only — exact on both engines)."""
    bits = int(_require_lit(args, 1, "IP_PREFIX"))
    if not 0 <= bits <= 32:
        raise EsqlError("IP_PREFIX bits must be in [0, 32]")
    shift = 32 - bits
    m = _ip_int(args[0])
    if shift:
        m = F.shiftleft(F.shiftright(m, shift), shift)
    return F.concat_ws(
        ".",
        F.shiftright(m, 24).cast("string"),
        (F.shiftright(m, 16) % 256).cast("string"),
        (F.shiftright(m, 8) % 256).cast("string"),
        (m % 256).cast("string"),
    )


_DATE_PARTS = {"YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth}


def _date_extract(args: list[Column]) -> Column:
    part = str(_require_lit(args, 0, "DATE_EXTRACT")).upper()
    if part not in _DATE_PARTS:
        raise EsqlError(f"DATE_EXTRACT part must be one of {sorted(_DATE_PARTS)}")
    return _DATE_PARTS[part](args[1]).cast("long")


def _categorize(args: list[Column]) -> Column:
    """CATEGORIZE(text) — the categorize_text aggregation's template key
    lifted into the language: first 4 pinned-tokenizer tokens with digit
    runs masked to '#', joined by single spaces."""
    from .tokenize import tokens_col

    if len(args) != 1:
        raise EsqlError("CATEGORIZE takes exactly one text argument")
    return F.array_join(
        F.transform(
            F.slice(tokens_col(args[0]), 1, 4),
            lambda x: F.regexp_replace(x, "[0-9]+", "#"),
        ),
        " ",
    )


def _match(args: list[Column]) -> Column:
    """MATCH(field, "query") — ES|QL's fulltext match function (8.17)
    compiled against the engine's pinned tokenizer: the query string
    tokenizes AT COMPILE TIME and the predicate is arrays_overlap between
    the field's token array and the query-term set — ES match semantics
    (analyzed terms, OR operator). Boolean only (the WHERE form); scored
    retrieval is the bm25 catalog family's job, not the compiler's."""
    from .tokenize import py_tokenize, tokens_col

    if len(args) != 2:
        raise EsqlError('MATCH needs (field, "query literal")')
    terms = py_tokenize(str(_require_lit(args, 1, "MATCH")))
    if not terms:
        raise EsqlError("MATCH query has no tokens")
    return F.arrays_overlap(
        tokens_col(args[0]), F.array(*[F.lit(t) for t in terms])
    )


def _qstr(args: list[Column]) -> Column:
    """QSTR(field, "query") — ES|QL's query_string function compiled as a
    BOOLEAN predicate over the pinned tokenizer (the MATCH discipline,
    plus operators): the query literal parses AT COMPILE TIME with a
    mini-grammar — OR (lowest), AND, NOT, parentheses, bare terms
    defaulting to OR (the ES query_string default_operator) — and each
    leaf compiles to array_contains(tokens(field), term). Subset: no
    field overrides, phrases, boosts or wildcards inside the string
    (those live in the engine's query catalog, not the compiler)."""
    from .tokenize import py_tokenize, tokens_col

    if len(args) != 2:
        raise EsqlError('QSTR needs (field, "query literal")')
    q = str(_require_lit(args, 1, "QSTR"))
    toks: list[str] = []
    i = 0
    while i < len(q):
        ch = q[i]
        if ch in "()":
            toks.append(ch)
            i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(q) and not q[j].isspace() and q[j] not in "()":
                j += 1
            toks.append(q[i:j])
            i = j
    fld = tokens_col(args[0])
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def p_or() -> Column:
        left = p_and()
        while peek() is not None and peek() != ")":
            if peek() == "OR":
                pos[0] += 1
            left = left | p_and()
        return left

    def p_and() -> Column:
        left = p_not()
        while peek() == "AND":
            pos[0] += 1
            left = left & p_not()
        return left

    def p_not() -> Column:
        if peek() == "NOT":
            pos[0] += 1
            return ~p_not()
        return p_atom()

    def p_atom() -> Column:
        t = peek()
        if t is None:
            raise EsqlError(f"QSTR: unexpected end of query {q!r}")
        if t in ("AND", "OR", "NOT"):
            # ES query_string raises a parse failure here; silently
            # treating the keyword as the term 'and'/'or'/'not' would
            # diverge from that contract (round-4 ADVICE item).
            raise EsqlError(f"QSTR: operator {t} in term position in {q!r}")
        pos[0] += 1
        if t == "(":
            e = p_or()
            if peek() != ")":
                raise EsqlError(f"QSTR: unbalanced parens in {q!r}")
            pos[0] += 1
            return e
        terms = py_tokenize(t)
        if not terms:
            raise EsqlError(f"QSTR: token-less term {t!r} in {q!r}")
        e = F.array_contains(fld, terms[0])
        for x in terms[1:]:
            e = e & F.array_contains(fld, x)
        return e

    out = p_or()
    if peek() is not None:
        raise EsqlError(f"QSTR: trailing tokens in {q!r}")
    return out


#: DATE_TRUNC renders truncation as ISO strings (engine-identical via
#: date_format/strftime under the pinned UTC session; a native
#: date_trunc would reopen the cohort_retention week-boundary edge).
_TRUNC_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}


def _date_trunc(args: list[Column]) -> Column:
    unit = str(_require_lit(args, 0, "DATE_TRUNC")).lower()
    if unit not in _TRUNC_FMT:
        raise EsqlError(f"DATE_TRUNC unit must be one of {sorted(_TRUNC_FMT)}")
    return F.date_format(args[1].cast("timestamp"), _TRUNC_FMT[unit])


def _date_diff(args: list[Column]) -> Column:
    """DATE_DIFF(unit, start, end) — integer difference, day/second units
    (both via the EPOCH_DAY floor discipline: truncate each side, then
    subtract — engine-identical, unlike interval arithmetic)."""
    unit = str(_require_lit(args, 0, "DATE_DIFF")).lower()
    a = args[1].cast("timestamp").cast("long")
    b = args[2].cast("timestamp").cast("long")
    if unit == "second":
        return (b - a).cast("long")
    if unit == "day":
        return (
            F.floor(b / F.lit(86400)) - F.floor(a / F.lit(86400))
        ).cast("long")
    raise EsqlError("DATE_DIFF unit must be 'day' or 'second'")


def _case(args: list[Column]) -> Column:
    """CASE(cond1, val1, [cond2, val2, …,] default) — the ES|QL variadic
    conditional."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise EsqlError("CASE needs cond/value pairs plus a default")
    c = F.when(args[0], args[1])
    for i in range(2, len(args) - 1, 2):
        c = c.when(args[i], args[i + 1])
    return c.otherwise(args[-1])


def _lit(tok: _Tok) -> Column:
    if tok.kind == "num":
        val = float(tok.text) if "." in tok.text else int(tok.text)
    else:
        val = tok.text[1:-1]
    c = F.lit(val)
    c._esql_lit = val  # type: ignore[attr-defined]  (ROUND needs the int)
    return c


class _ExprParser:
    """Recursive-descent expression → pyspark Column."""

    def __init__(self, p: _Parser):
        self.p = p

    def parse(self) -> Column:
        return self._or()

    def _or(self) -> Column:
        c = self._and()
        while self.p.accept("kw", "OR"):
            c = c | self._and()
        return c

    def _and(self) -> Column:
        c = self._not()
        while self.p.accept("kw", "AND"):
            c = c & self._not()
        return c

    def _not(self) -> Column:
        if self.p.accept("kw", "NOT"):
            return ~self._not()
        return self._cmp()

    def _cmp(self) -> Column:
        c = self._add()
        t = self.p.peek()
        if t and t.kind == "op" and t.text in ("==", "!=", "<=", ">=", "<", ">"):
            self.p.next()
            rhs = self._add()
            return {
                "==": c.__eq__, "!=": c.__ne__, "<=": c.__le__,
                ">=": c.__ge__, "<": c.__lt__, ">": c.__gt__,
            }[t.text](rhs)
        if t and t.kind == "kw" and t.text == "IN":
            self.p.next()
            self.p.expect("op", "(")
            vals = [self.p.next()]
            while self.p.accept("op", ","):
                vals.append(self.p.next())
            self.p.expect("op", ")")
            return c.isin(*[
                (float(v.text) if "." in v.text else int(v.text))
                if v.kind == "num" else v.text[1:-1]
                for v in vals
            ])
        if t and t.kind == "kw" and t.text == "LIKE":
            self.p.next()
            pat = self.p.expect("str").text[1:-1]
            # ES|QL wildcards: * any run, ? one char → SQL LIKE
            sql_pat = (
                pat.replace("%", r"\%").replace("_", r"\_")
                .replace("*", "%").replace("?", "_")
            )
            return c.like(sql_pat)
        if t and t.kind == "kw" and t.text == "IS":
            self.p.next()
            if self.p.accept("kw", "NOT"):
                self.p.expect("kw", "NULL")
                return c.isNotNull()
            self.p.expect("kw", "NULL")
            return c.isNull()
        return c

    def _add(self) -> Column:
        c = self._mul()
        while True:
            t = self.p.peek()
            if t and t.kind == "op" and t.text in "+-":
                self.p.next()
                c = c + self._mul() if t.text == "+" else c - self._mul()
            else:
                return c

    def _mul(self) -> Column:
        c = self._unary()
        while True:
            t = self.p.peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                self.p.next()
                rhs = self._unary()
                c = (
                    c * rhs if t.text == "*"
                    else c / rhs if t.text == "/"
                    else c % rhs
                )
            else:
                return c

    def _unary(self) -> Column:
        if self.p.accept("op", "-"):
            return -self._unary()
        return self._atom()

    def _atom(self) -> Column:
        t = self.p.next()
        if t.kind in ("num", "str"):
            return _lit(t)
        if t.kind == "op" and t.text == "(":
            c = self.parse()
            self.p.expect("op", ")")
            return c
        if t.kind == "id":
            if self.p.accept("op", "("):
                fname = t.text.upper()
                if fname not in _FUNCS:
                    raise EsqlError(f"unknown function {t.text}")
                args = []
                if not self.p.accept("op", ")"):
                    args.append(self.parse())
                    while self.p.accept("op", ","):
                        args.append(self.parse())
                    self.p.expect("op", ")")
                return _FUNCS[fname](args)
            return F.col(t.text)
        raise EsqlError(f"unexpected token {t.text!r}")


_AGGS = {
    "COUNT", "COUNT_DISTINCT", "SUM", "MIN", "MAX", "AVG",
    "MEDIAN", "PERCENTILE", "TOP", "VALUES", "WEIGHTED_AVG", "STD_DEV",
}


def _parse_agg(p: _Parser) -> tuple[str, list[Column | None]]:
    """Parse ``AGG(expr[, …]) [WHERE cond]`` / ``COUNT(*) [WHERE cond]`` →
    (fn, args) without building the final Column, so STATS (grouped) and
    INLINESTATS (windowed) share one grammar. PERCENTILE/TOP carry literal
    extra arguments past the first.

    The per-aggregate WHERE (ES|QL 8.16) folds into the ARGUMENT as a
    conditional — rows failing the filter contribute NULL, which every
    aggregate here ignores (COUNT counts non-nulls; SUM/MIN/MAX/AVG skip
    nulls; collect_list/collect_set drop nulls for TOP/VALUES/PERCENTILE)
    — so filtered aggregates stay one-pass and map-combinable in both the
    grouped and the windowed translation."""
    fn = p.expect("id").text.upper()
    if fn not in _AGGS:
        raise EsqlError(f"unknown aggregation {fn}")
    p.expect("op", "(")
    args: list[Column | None]
    if fn == "COUNT" and p.accept("op", "*"):
        p.expect("op", ")")
        args = [None]
    else:
        args = [_ExprParser(p).parse()]
        while p.accept("op", ","):
            args.append(_ExprParser(p).parse())
        p.expect("op", ")")
    if p.accept("kw", "WHERE"):
        cond = _ExprParser(p).parse()
        args[0] = F.when(cond, F.lit(1) if args[0] is None else args[0])
    return fn, args


def _moment_sums(arg: Column) -> tuple[Column, Column, Column]:
    """Exact first/second moments for STD_DEV: values quantize to
    decimal(18,6) and the SQUARE is computed IN DECIMAL — (18,6)×(18,6)
    = (37,12), exact under the 38 cap on both engines. Squaring the
    double first and casting the product would hit the wide-decimal cast
    divergence (the lineitem_extended_stats sharp edge: above ~4e9 the
    9-dp grid is finer than the double's ulp and the engines' casts
    disagree); decimal-side squaring sidesteps it entirely."""
    d = arg.cast("decimal(18,6)")
    return F.sum(d), F.sum(d * d), F.count(arg)


def _std_from_moments(s1: Column, s2: Column, n: Column) -> Column:
    """Population σ = sqrt(S2/n − (S1/n)²), the ES extended_stats
    definition — pinned op order over exact decimal sums so both engines
    compute identical doubles; greatest(·, 0) absorbs the one negative
    ulp a perfectly-constant series can produce."""
    m = s1.cast("double") / n
    return F.sqrt(F.greatest(s2.cast("double") / n - m * m, F.lit(0.0)))


def _weighted_args(args: list[Column | None]) -> tuple[Column, Column]:
    """Validate WEIGHTED_AVG's (value, weight) pair: the weight must be
    integer-valued (assert_true throws per-row on a fractional weight —
    silently rounding 2.5 to 3 would be a wrong answer, not a contract)
    and casts to decimal(9,0) for the exact-at-38-cap product; NULL
    weights pass through (the row drops from both sums)."""
    if len(args) < 2 or args[1] is None:
        raise EsqlError("WEIGHTED_AVG needs (value, weight)")
    v, w = args[0], args[1]
    ok = w.isNull() | (w == F.floor(w))
    wt = F.when(
        F.assert_true(
            ok, F.lit("WEIGHTED_AVG weights must be integer-valued")
        ).isNull(),
        w,
    ).cast("decimal(9,0)")
    return v, wt


def _percentile_agg(arg: Column, pct: int) -> Column:
    """Exact interpolated percentile (the deterministic variant of ES's
    TDigest PERCENTILE — same "replace the approximate builtin with an
    exact pinned algorithm" policy as boxplot/MAD): values quantize to
    decimal(28,9) (the language's SUM discipline), sort, and interpolate
    at h = (n-1)·pct/100. With integer pct the fractional part of h is
    fm/100 — EXACTLY representable as decimal(m,2)·0.01 — so the
    interpolation lo + frac·(hi−lo) is pure exact-decimal arithmetic;
    the single round6 output quantize is the only precision loss.
    Positive-domain note: ROUND on the exact decimal is half-away-from-
    zero on both engines, identical for the fixture's positive grids."""
    if not 0 <= pct <= 100:
        raise EsqlError("PERCENTILE pct must be in [0, 100]")
    s = F.array_sort(F.collect_list(arg.cast("decimal(28,9)")))
    n = F.size(s)
    tot = (n - 1) * F.lit(pct)
    ridx = F.floor(tot / F.lit(100.0)).cast("int")
    fm = tot % 100
    lo = F.get(s, ridx)
    hi = F.get(s, F.least(ridx + 1, n - 1))
    frac = fm.cast("decimal(3,0)") * F.expr("CAST(0.01 AS DECIMAL(3,2))")
    val = lo + frac * (hi - lo)
    return F.round(val.cast("decimal(28,9)"), 6).cast("double")


def _build_agg(fn: str, args: list[Column | None], name: str) -> Column:
    arg = args[0]
    if fn == "COUNT":
        src = F.lit(1) if arg is None else arg
        return F.count(src).cast("long").alias(name)
    if fn == "COUNT_DISTINCT":
        return F.countDistinct(arg).cast("long").alias(name)
    if fn == "MIN":
        return F.min(arg).alias(name)
    if fn == "MAX":
        return F.max(arg).alias(name)
    if fn == "MEDIAN":
        return _percentile_agg(arg, 50).alias(name)
    if fn == "PERCENTILE":
        return _percentile_agg(arg, int(_require_lit(args, 1, "PERCENTILE"))).alias(name)
    if fn == "TOP":
        # TOP(field, limit, "asc"|"desc") — the top `limit` VALUES
        # (duplicates included) in the given order, as a multivalue.
        k = int(_require_lit(args, 1, "TOP"))
        order = str(_require_lit(args, 2, "TOP")).lower()
        if order not in ("asc", "desc") or k < 1:
            raise EsqlError('TOP needs (field, k >= 1, "asc"|"desc")')
        return F.slice(
            F.sort_array(F.collect_list(arg), asc=order == "asc"), 1, k
        ).alias(name)
    if fn == "VALUES":
        # VALUES(field) — the distinct values as a multivalue. ES leaves
        # the order unspecified; this dialect pins SORTED ascending (the
        # deterministic-variant policy), which also makes MV_CONCAT of the
        # result oracle-checkable.
        return F.array_sort(F.collect_set(arg)).alias(name)
    if fn == "WEIGHTED_AVG":
        # WEIGHTED_AVG(value, weight): Σ(v·w)/Σ(w) with INTEGER-VALUED
        # weights < 10^9 (the dialect's exactness contract — ES's typical
        # weights are counts; both bounds ENFORCED: a fractional weight
        # throws via assert_true, a too-wide one throws the same ANSI
        # decimal(9,0) overflow on BOTH sums). v quantizes to the
        # language's decimal(28,9) grid; the (28,9)×(9,0) product is
        # decimal(38,9) — exact at the 38 cap with NO scale drop (the
        # session-3 sharp edge's remedy: smallest sufficient decimal on
        # the integer side). A NULL value drops the row from BOTH sums
        # (the per-agg WHERE folds into v, so filters compose).
        v, wt = _weighted_args(args)
        num = F.sum(v.cast("decimal(28,9)") * wt)
        den = F.sum(F.when(v.isNotNull(), wt))
        return (num.cast("double") / den.cast("double")).alias(name)
    if fn == "STD_DEV":
        s1, s2, n = _moment_sums(arg)
        return _std_from_moments(s1, s2, n).alias(name)
    # SUM / AVG: exact accumulation — a double argument quantizes to
    # decimal(28,9) per row and sums exactly (order-independent on any
    # partitioning, the engine-wide float-sum remedy); AVG divides once.
    exact = F.sum(arg.cast("decimal(28,9)"))
    if fn == "SUM":
        return exact.alias(name)
    return (exact.cast("double") / F.count(arg)).alias(name)


def _agg_column(p: _Parser, name: str) -> Column:
    fn, args = _parse_agg(p)
    return _build_agg(fn, args, name)


def _window_agg(fn: str, args: list[Column | None], w) -> Column:
    """The windowed twin of _build_agg for INLINESTATS — same float
    discipline (exact decimal SUM, one AVG division), computed over a
    partition window so the frame keeps every input row and the only
    shuffle is the hash partition on the BY keys (no join, no collapse).

    MEDIAN/PERCENTILE/TOP/VALUES are rejected here (their collect-based
    forms would materialize the whole group once per row); the no-BY
    INLINESTATS path routes through _build_agg and supports them."""
    if fn in ("MEDIAN", "PERCENTILE", "TOP", "VALUES"):
        raise EsqlError(f"{fn} is not supported in INLINESTATS")
    arg = args[0]
    if fn == "COUNT":
        src = F.lit(1) if arg is None else arg
        return F.count(src).over(w).cast("long")
    if fn == "COUNT_DISTINCT":
        # countDistinct is not a window function; the set-size rewrite is
        # exact and stays JVM-side.
        return F.size(F.collect_set(arg).over(w)).cast("long")
    if fn == "MIN":
        return F.min(arg).over(w)
    if fn == "MAX":
        return F.max(arg).over(w)
    if fn == "WEIGHTED_AVG":
        v, wt = _weighted_args(args)
        num = F.sum(v.cast("decimal(28,9)") * wt).over(w)
        den = F.sum(F.when(v.isNotNull(), wt)).over(w)
        return num.cast("double") / den.cast("double")
    if fn == "STD_DEV":
        s1, s2, n = _moment_sums(args[0])
        return _std_from_moments(s1.over(w), s2.over(w), n.over(w))
    exact = F.sum(arg.cast("decimal(28,9)")).over(w)
    if fn == "SUM":
        return exact
    return exact.cast("double") / F.count(arg).over(w)


#: RRF rank constant (the ES default k=60): fuse_score = Σ 1/(60 + rank).
FUSE_RANK_CONSTANT = 60


def _final_sort_order(body: list[_Tok]) -> list:
    """The final SORT stage's order of a FORK branch, as Column sort
    expressions — FUSE re-applies it as a row_number to derive the
    branch's result-set row positions (ES ranks by result order; the
    dialect pins that order to the branch's own SORT, which must be a
    total order — add a unique tiebreaker column). The SORT may be
    followed only by LIMIT stages."""
    sort_stage = None
    for st in reversed(_split_stages(body)):
        if st and st[0].kind == "kw" and st[0].text == "LIMIT":
            continue
        if st and st[0].kind == "kw" and st[0].text == "SORT":
            sort_stage = st
        break
    if sort_stage is None:
        raise EsqlError(
            "FUSE needs every FORK branch to end with SORT (+ optional "
            "LIMIT) — the sort order IS the branch's result-set ranking"
        )
    p = _Parser(sort_stage)
    p.expect("kw", "SORT")
    order, names = [], []
    while True:
        col = p.expect("id").text
        desc = bool(p.accept("kw", "DESC"))
        if not desc:
            p.accept("kw", "ASC")
        order.append(F.desc(col) if desc else F.asc(col))
        names.append(col)
        if not p.accept("op", ","):
            break
    return order, names


#: Frames persist()ed by compiled FORK stages (the parent frame feeding
#: every branch — without the persist each branch re-executes the whole
#: upstream DAG).  Bounded LRU: compiling a new FORK past the cap
#: unpersists the OLDEST tracked frame (whose consuming action has almost
#: certainly completed — correctness is unaffected either way, only the
#: cache).  ``release_cached_frames()`` drops them all eagerly; long-lived
#: sessions (driver sweeps) may call it between entries.
_FORK_PERSISTED: list[DataFrame] = []
_FORK_PERSIST_CAP = 8


def _track_fork_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _FORK_PERSISTED.append(df)
    while len(_FORK_PERSISTED) > _FORK_PERSIST_CAP:
        _FORK_PERSISTED.pop(0).unpersist()
    return df


def release_cached_frames() -> int:
    """Unpersist every FORK-cached frame; returns how many were released."""
    n = len(_FORK_PERSISTED)
    while _FORK_PERSISTED:
        _FORK_PERSISTED.pop().unpersist()
    return n


def compile_esql(
    esql: str,
    tables: dict[str, DataFrame] | None = None,
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
) -> DataFrame:
    """Compile an ES|QL pipeline to a DataFrame. Tables resolve from the
    ``tables`` dict, or (spark, sf_dir) parquet lookup when given.

    FORK queries persist() their parent frame (required for branch CSE);
    the cache is tracked in a bounded module registry — see
    :func:`release_cached_frames`."""
    toks = _tokenize(esql)
    return _run_stages(_split_stages(toks), None, tables, spark, sf_dir)


def _split_stages(toks: list[_Tok]) -> list[list[_Tok]]:
    """Split a token stream into pipeline stages on TOP-LEVEL ``|`` only —
    a ``|`` inside parentheses (a FORK branch's own pipeline, grouped
    expressions) stays with its stage.

    Unbalanced parentheses are a parse error HERE: a stray ``)`` would
    drive depth negative so a following top-level ``|`` silently stops
    splitting, surfacing later as a baffling 'unknown command' (round-4
    ADVICE item)."""
    stages: list[list[_Tok]] = [[]]
    depth = 0
    for t in toks:
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
            if depth < 0:
                raise EsqlError("unbalanced ')' in query")
        if t.kind == "op" and t.text == "|" and depth == 0:
            stages.append([])
        else:
            stages[-1].append(t)
    if depth != 0:
        raise EsqlError(f"{depth} unclosed '(' at end of query")
    return stages


def _run_stages(
    stages: list[list[_Tok]],
    df: DataFrame | None,
    tables: dict[str, DataFrame] | None,
    spark: SparkSession | None,
    sf_dir: str | None,
) -> DataFrame:
    fork_n_branches: int | None = None
    for si, stage in enumerate(stages):
        if not stage:
            raise EsqlError("empty pipeline stage")
        nxt = stages[si + 1] if si + 1 < len(stages) else None
        next_is_fuse = bool(nxt) and nxt[0].kind == "kw" and nxt[0].text == "FUSE"
        p = _Parser(stage)
        cmd = p.expect("kw").text
        if cmd == "FROM":
            name = p.expect("id").text
            if tables and name in tables:
                df = tables[name]
            elif spark is not None and sf_dir is not None:
                df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
            else:
                raise EsqlError(f"unknown table {name}")
        elif cmd == "ROW":
            # ROW a = <expr> [, b = <expr> …] — the literal one-row source
            # (ES|QL's constant pipeline seed). Compiles to a projection
            # over a literal one-row frame; expressions share the full
            # EVAL grammar (so ROW x = ROUND(1.0/3.0, 6) works).
            if df is not None:
                raise EsqlError("ROW must start the pipeline")
            if spark is None:
                sess = SparkSession.getActiveSession()
                if sess is None and tables:
                    sess = next(iter(tables.values())).sparkSession
                if sess is None:
                    raise EsqlError("ROW needs a SparkSession")
            else:
                sess = spark
            df = sess.range(1).select()
            while True:
                name = p.expect("id").text
                p.expect("op", "=")
                df = df.withColumn(name, _ExprParser(p).parse())
                if not p.accept("op", ","):
                    break
        elif df is None:
            raise EsqlError("pipeline must start with FROM")
        elif cmd == "WHERE":
            df = df.filter(_ExprParser(p).parse())
        elif cmd == "EVAL":
            while True:
                name = p.expect("id").text
                p.expect("op", "=")
                df = df.withColumn(name, _ExprParser(p).parse())
                if not p.accept("op", ","):
                    break
        elif cmd == "STATS":
            aggs = []
            while True:
                name = p.expect("id").text
                p.expect("op", "=")
                aggs.append(_agg_column(p, name))
                if not p.accept("op", ","):
                    break
            keys: list[str] = []
            if p.accept("kw", "BY"):
                keys.append(p.expect("id").text)
                while p.accept("op", ","):
                    keys.append(p.expect("id").text)
            df = (df.groupBy(*keys) if keys else df.groupBy()).agg(*aggs)
        elif cmd == "INLINESTATS":
            # INLINESTATS (ES|QL 8.16): per-group aggregates attached to
            # every row WITHOUT collapsing the frame. With BY keys the
            # translation is pure window functions — one hash partition on
            # the keys, no join, no group-sized intermediate (the
            # scale-right form at any key cardinality). Without BY the
            # global 1-row aggregate broadcasts back (a partitionBy-less
            # window would drag every row to one partition).
            specs: list[tuple[str, str, list[Column | None]]] = []
            while True:
                name = p.expect("id").text
                p.expect("op", "=")
                fn, aargs = _parse_agg(p)
                specs.append((name, fn, aargs))
                if not p.accept("op", ","):
                    break
            keys = []
            if p.accept("kw", "BY"):
                keys.append(p.expect("id").text)
                while p.accept("op", ","):
                    keys.append(p.expect("id").text)
            if keys:
                w = Window.partitionBy(*keys)
                for name, fn, aargs in specs:
                    df = df.withColumn(name, _window_agg(fn, aargs, w))
            else:
                g = df.groupBy().agg(
                    *[_build_agg(fn, aargs, name) for name, fn, aargs in specs]
                )
                # mirror the BY branch's withColumn SHADOWING: an agg name
                # that collides with an input column replaces it (the ES|QL
                # contract) — a bare crossJoin would duplicate the name and
                # make later references ambiguous.
                df = df.drop(
                    *[name for name, _, _ in specs if name in df.columns]
                ).crossJoin(F.broadcast(g))
        elif cmd == "SORT":
            orders = []
            while True:
                col = F.col(p.expect("id").text)
                if p.accept("kw", "DESC"):
                    orders.append(col.desc())
                else:
                    p.accept("kw", "ASC")
                    orders.append(col.asc())
                if not p.accept("op", ","):
                    break
            df = df.orderBy(*orders)
        elif cmd == "LIMIT":
            df = df.limit(int(p.expect("num").text))
        elif cmd == "DISSECT":
            # DISSECT <col> "%{a}<sep>%{b>…" (ES|QL log-line structuring):
            # literal separators between %{name} fields. This subset
            # requires ONE distinct separator (the overwhelmingly common
            # pattern); the translation is a single JVM-side split —
            # DISSECT's whole point vs GROK is that it needs no regex
            # engine, and the compiled plan honors that.
            import re as _re

            src_col = p.expect("id").text
            pat = p.expect("str").text[1:-1]
            fields = _re.findall(r"%\{(\w+)\}", pat)
            seps = [s for s in _re.split(r"%\{\w+\}", pat) if s]
            if not fields or len(set(seps)) != 1 or not pat.startswith("%{"):
                raise EsqlError(
                    "DISSECT subset needs %{field} parts joined by ONE "
                    f"literal separator, got {pat!r}"
                )
            parts = F.split(F.col(src_col), _re.escape(seps[0]))
            for i, name in enumerate(fields):
                df = df.withColumn(name, parts.getItem(i))
        elif cmd == "GROK":
            # GROK <col> "<pattern>" — regex extraction with the three
            # deterministic core syntaxes (%{WORD:name}, %{INT:name},
            # %{NUMBER:name}) joined by literal text. The pattern compiles
            # to ONE anchored regex whose capture groups become typed
            # columns (INT → long, NUMBER → double); \\w and \\d mean the
            # same thing to Java regex and DuckDB's RE2, so every compiled
            # GROK has an exact twin. Non-matching rows yield NULL fields
            # (the ES contract).
            import re as _re

            src_col = p.expect("id").text
            pat = p.expect("str").text[1:-1]
            _syntax = {
                "WORD": r"\w+",
                "INT": r"-?\d+",
                "NUMBER": r"-?\d+(?:\.\d+)?",
            }
            regex_parts, fields = [], []
            pos = 0
            for m in _re.finditer(r"%\{(\w+):(\w+)\}", pat):
                regex_parts.append(_re.escape(pat[pos:m.start()]))
                syntax, fname = m.group(1), m.group(2)
                if syntax not in _syntax:
                    raise EsqlError(f"unknown GROK syntax %{{{syntax}}}")
                regex_parts.append(f"({_syntax[syntax]})")
                fields.append((fname, syntax))
                pos = m.end()
            regex_parts.append(_re.escape(pat[pos:]))
            if not fields:
                raise EsqlError(f"GROK pattern has no %{{SYNTAX:name}}: {pat!r}")
            regex = "".join(regex_parts)
            for i, (fname, syntax) in enumerate(fields):
                # regexp_extract yields '' on no-match; the ES contract is
                # NULL fields — nullif first, and try_cast (not cast: ANSI
                # mode throws on '' → BIGINT) for the numeric syntaxes.
                c = F.nullif(
                    F.regexp_extract(F.col(src_col), regex, i + 1), F.lit("")
                )
                if syntax == "INT":
                    c = c.try_cast("long")
                elif syntax == "NUMBER":
                    c = c.try_cast("double")
                df = df.withColumn(fname, c)
        elif cmd == "MV_EXPAND":
            # MV_EXPAND <col>: one row per element of a multi-valued column
            # (ES|QL's explode) — empty arrays drop the row, matching both
            # ES and F.explode semantics.
            col = p.expect("id").text
            df = df.withColumn(col, F.explode(F.col(col)))
        elif cmd == "LOOKUP":
            # LOOKUP JOIN <lookup_table> ON <field> (ES|QL 8.18): LEFT join
            # on a field that exists under the SAME NAME on both sides (the
            # ES contract — EVAL a copy first when names differ). Lookup
            # indexes are small by ES's own constraint (single-shard), so
            # the translation broadcasts the lookup side: at any corpus
            # scale this is a map-side hash join, never a shuffle.
            p.expect("kw", "JOIN")
            lname = p.expect("id").text
            p.expect("kw", "ON")
            field = p.expect("id").text
            if tables and lname in tables:
                lk = tables[lname]
            elif spark is not None and sf_dir is not None:
                lk = spark.read.parquet(f"{sf_dir.rstrip('/')}/{lname}.parquet")
            else:
                raise EsqlError(f"unknown lookup table {lname}")
            if field not in lk.columns:
                raise EsqlError(f"lookup field {field} absent from {lname}")
            df = df.join(F.broadcast(lk), field, "left")
        elif cmd == "ENRICH":
            # ENRICH <policy> ON <field> WITH <col> [, <col> …] — RANGE
            # match type: the policy table's (range_lo, range_hi) pair IS
            # the policy metadata (lo inclusive, hi exclusive), and the
            # translation is a broadcast LEFT interval join: policy
            # indexes are tiny by ES's enrich contract, so at any corpus
            # scale this is a map-side theta join against a broadcast
            # table — never a shuffle, never a cartesian of big frames.
            pname = p.expect("id").text
            p.expect("kw", "ON")
            field = p.expect("id").text
            p.expect("kw", "WITH")
            wcols = [p.expect("id").text]
            while p.accept("op", ","):
                wcols.append(p.expect("id").text)
            if tables and pname in tables:
                pol = tables[pname]
            elif spark is not None and sf_dir is not None:
                pol = spark.read.parquet(f"{sf_dir.rstrip('/')}/{pname}.parquet")
            else:
                raise EsqlError(f"unknown enrich policy {pname}")
            for rc in ("range_lo", "range_hi"):
                if rc not in pol.columns:
                    raise EsqlError(
                        f"enrich policy {pname} lacks {rc} — range match "
                        "type needs (range_lo, range_hi); use LOOKUP JOIN "
                        "for the exact match type"
                    )
            missing = [c for c in wcols if c not in pol.columns]
            if missing:
                raise EsqlError(f"WITH columns absent from {pname}: {missing}")
            if field not in df.columns:
                raise EsqlError(f"enrich field {field} absent from frame")
            clash = [c for c in wcols if c in df.columns]
            if clash:
                raise EsqlError(f"WITH columns already in frame: {clash}")
            pol = pol.select("range_lo", "range_hi", *wcols)
            cond = (F.col(field) >= F.col("range_lo")) & (
                F.col(field) < F.col("range_hi")
            )
            df = (
                df.join(F.broadcast(pol), cond, "left")
                .drop("range_lo", "range_hi")
            )
        elif cmd == "RENAME":
            # RENAME <old> AS <new> [, …] — pure projection relabeling.
            while True:
                old = p.expect("id").text
                p.expect("kw", "AS")
                new = p.expect("id").text
                if old not in df.columns:
                    raise EsqlError(f"RENAME: unknown column {old}")
                df = df.withColumnRenamed(old, new)
                if not p.accept("op", ","):
                    break
        elif cmd in ("KEEP", "DROP"):
            # column names or wildcard patterns (ES|QL: KEEP event_*, *_id)
            # — patterns expand against the frame's columns at compile
            # time, first-match-position order, duplicates dropped.
            def _pattern() -> str:
                parts: list[str] = []
                while True:
                    if p.accept("op", "*"):
                        parts.append("*")
                    elif not p.done() and p.peek().kind == "id":
                        if parts and parts[-1] != "*":
                            # two bare identifiers in a row = a missing
                            # comma ('KEEP user id'), not a pattern —
                            # silently merging them could resolve to a
                            # REAL column ('userid') and keep the wrong
                            # data
                            raise EsqlError(
                                f"{cmd}: missing ',' before "
                                f"{p.peek().text!r}"
                            )
                        parts.append(p.next().text)
                    else:
                        break
                if not parts:
                    raise EsqlError(f"{cmd}: expected column name or pattern")
                return "".join(parts)

            pats = [_pattern()]
            while p.accept("op", ","):
                pats.append(_pattern())
            import fnmatch as _fn

            cols: list[str] = []
            for pat in pats:
                if "*" in pat:
                    hits = [c for c in df.columns if _fn.fnmatchcase(c, pat)]
                    if not hits:
                        raise EsqlError(f"{cmd}: pattern {pat!r} matches no columns")
                elif pat in df.columns:
                    hits = [pat]
                else:
                    raise EsqlError(f"{cmd}: unknown column {pat}")
                cols.extend(c for c in hits if c not in cols)
            df = df.select(*cols) if cmd == "KEEP" else df.drop(*cols)
        elif cmd == "CHANGE_POINT":
            # CHANGE_POINT <value> ON <key> (ES|QL 8.18 tech preview):
            # the deterministic mean-shift variant (the events_change_point
            # discipline generalized to the piped frame): collapse to the
            # ONE row whose key-ordered split maximizes the between-
            # segment mean difference. The statistic's numerator
            # |sl·nr − sr·nl| and denominator nl·nr are exact BIGINTs
            # from one prefix-sum window (value must be integer-typed —
            # counts; ES's own CHANGE_POINT runs on ≤1000 piped rows, so
            # the single-partition window is the contract, not a scale
            # hazard); rank on the round6 ratio, key ASC tiebreak.
            from pyspark.sql import Window as _W

            from .stats import round6 as _r6c

            val = p.expect("id").text
            p.expect("kw", "ON")
            key = p.expect("id").text
            w = _W.orderBy(key).rowsBetween(_W.unboundedPreceding, -1)
            tot = df.agg(
                F.count(F.lit(1)).cast("long").alias("nd"),
                F.sum(val).cast("long").alias("st"),
            )
            pre = df.select(
                F.col(key),
                F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
                .cast("long")
                .alias("nl"),
                F.coalesce(F.sum(val).over(w), F.lit(0))
                .cast("long")
                .alias("sl"),
            ).filter(F.col("nl") > 0)
            c = pre.crossJoin(F.broadcast(tot)).select(
                key, "nl", "sl",
                (F.col("nd") - F.col("nl")).alias("nr"),
                (F.col("st") - F.col("sl")).alias("sr"),
            )
            num = F.abs(
                F.col("sl").cast("decimal(38,0)") * F.col("nr")
                - F.col("sr").cast("decimal(38,0)") * F.col("nl")
            ).cast("double")
            den = (F.col("nl").cast("decimal(38,0)") * F.col("nr")).cast(
                "double"
            )
            scored = c.select(
                key, "nl", "nr", "sl", "sr", _r6c(num / den).alias("stat")
            )
            best = scored.orderBy(F.desc("stat"), F.asc(key)).limit(1)
            df = best.select(
                key,
                F.col("nl").alias("n_left"),
                F.col("nr").alias("n_right"),
                _r6c(
                    F.col("sl").cast("double") / F.col("nl").cast("double")
                ).alias("mean_left"),
                _r6c(
                    F.col("sr").cast("double") / F.col("nr").cast("double")
                ).alias("mean_right"),
                "stat",
            )
        elif cmd == "SAMPLE":
            # SAMPLE <prob> <key_col> — the DETERMINISTIC dialect variant
            # of ES|QL's random SAMPLE (same policy as random_score =
            # seeded hash): keep rows where h60(key) % 10^6 < prob·10^6.
            # The explicit key column is the dialect's addition — ES
            # samples per-row at random; a reproducible engine needs the
            # decision to be a pure function of the data. Map-side filter,
            # no shuffle, the sampled fraction is stable under
            # repartitioning/retries at any scale.
            from decimal import Decimal as _Dec

            prob_text = p.expect("num").text
            prob = float(prob_text)
            if not 0.0 < prob <= 1.0:
                raise EsqlError("SAMPLE probability must be in (0, 1]")
            # threshold from the LITERAL text via Decimal — float round()
            # is half-even and would silently zero out probabilities on
            # the 5e-7 boundary (the repo's documented round() hazard).
            thr = int(_Dec(prob_text) * 1_000_000)
            if thr < 1 or _Dec(prob_text) * 1_000_000 != thr:
                raise EsqlError(
                    "SAMPLE probability granularity is 1e-6 in this dialect"
                )
            key = p.expect("id").text
            from .textpipe import h60

            df = df.filter(
                h60(F.col(key).cast("string")) % F.lit(1_000_000) < F.lit(thr)
            )
        elif cmd == "FORK":
            # FORK (branch) (branch) … (ES|QL 8.19): run ≥2 sub-pipelines
            # from the current frame and union their outputs, tagged by a
            # ``_fork`` discriminator ("fork1", "fork2", … in branch
            # order). Missing columns null-fill (unionByName allowMissing
            # — the ES contract). Spark has no cross-subtree CSE, so the
            # parent frame is persist()ed before the branches compile —
            # without it every branch would re-execute the WHOLE upstream
            # DAG (the repo's documented multi-consumer edge). Nested
            # FORK is rejected (the ES contract; the outer tag would
            # silently overwrite the inner discriminator otherwise).
            branches: list[list[_Tok]] = []
            while p.accept("op", "("):
                depth, body = 1, []
                while True:
                    t = p.next()
                    if t.kind == "op" and t.text == "(":
                        depth += 1
                    elif t.kind == "op" and t.text == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    body.append(t)
                branches.append(body)
            if len(branches) < 2:
                raise EsqlError("FORK needs at least two (branch) pipelines")
            df = _track_fork_persist(df)
            outs = []
            for i, body in enumerate(branches, 1):
                sub = _run_stages(
                    _split_stages(body), df, tables, spark, sf_dir
                )
                if "_fork" in sub.columns:
                    raise EsqlError("nested FORK is not supported")
                if next_is_fuse:
                    # FUSE ranks each branch by its OWN row order — ES
                    # derives it from the result-set positions; here the
                    # branch's final SORT spec is re-applied as a
                    # row_number. The sort MUST be a total order per key
                    # (invariant #1: a tie would rank by partition
                    # arrival order, silently nondeterministic) — the
                    # compiler enforces the checkable core: every FUSE
                    # key column appears in the branch's SORT, so rows of
                    # distinct keys can never tie. The window is global
                    # over ONE branch's page — result sets are
                    # LIMIT-bounded by construction, so the single
                    # partition holds a page, never a corpus.
                    order, sort_names = _final_sort_order(body)
                    fuse_keys = [t.text for t in nxt[1:] if t.kind == "id"]
                    # keys absent from the branch's columns entirely get
                    # FUSE's clearer "keys absent" error instead
                    missing_keys = [
                        k for k in fuse_keys
                        if k in sub.columns and k not in sort_names
                    ]
                    if missing_keys:
                        raise EsqlError(
                            "FUSE branch SORT must include every FUSE key "
                            f"as a tiebreaker (missing: {missing_keys}) — "
                            "ties would make the RRF ranks "
                            "nondeterministic"
                        )
                    sub = sub.withColumn(
                        "_rank",
                        F.row_number().over(Window.orderBy(*order)).cast("long"),
                    )
                outs.append(sub.withColumn("_fork", F.lit(f"fork{i}")))
            out = outs[0]
            for o in outs[1:]:
                out = out.unionByName(o, allowMissingColumns=True)
            df = out
            fork_n_branches = len(branches) if next_is_fuse else None
        elif cmd == "FUSE":
            # FUSE <key> [, <key> …] (ES|QL 9.x): reciprocal-rank-fusion
            # of the preceding FORK's branches, merged on the key columns
            # (the dialect's explicit analog of ES's implicit _id/_index).
            # fuse_score = Σ_branches 1/(60 + rank) — built as a FIXED
            # left-to-right addition chain over the compile-time branch
            # list (never a float agg, whose combine order is not
            # deterministic), then round6 (invariant #5); n_sets = how
            # many branches retrieved the key.
            if (
                df is None or fork_n_branches is None
                or "_fork" not in df.columns or "_rank" not in df.columns
            ):
                raise EsqlError("FUSE must immediately follow FORK")
            keys = [p.expect("id").text]
            while p.accept("op", ","):
                keys.append(p.expect("id").text)
            missing = [k for k in keys if k not in df.columns]
            if missing:
                raise EsqlError(f"FUSE keys absent from branches: {missing}")
            tags = [f"fork{i}" for i in range(1, fork_n_branches + 1)]
            aggs = [
                F.max(
                    F.when(F.col("_fork") == t, F.col("_rank"))
                ).alias(f"_r{j}")
                for j, t in enumerate(tags, 1)
            ]
            g = df.groupBy(*keys).agg(*aggs)
            score = F.lit(0.0)
            for j in range(1, len(tags) + 1):
                score = score + F.coalesce(
                    F.lit(1.0) / (F.lit(float(FUSE_RANK_CONSTANT)) + F.col(f"_r{j}")),
                    F.lit(0.0),
                )
            from .stats import round6

            df = g.select(
                *keys,
                round6(score).alias("fuse_score"),
                sum(
                    (F.when(F.col(f"_r{j}").isNotNull(), 1).otherwise(0))
                    for j in range(1, len(tags) + 1)
                ).cast("long").alias("n_sets"),
            )
        else:
            raise EsqlError(f"unknown command {cmd}")
        if not p.done():
            raise EsqlError(f"trailing tokens in {cmd} stage: {p.peek().text!r}")
    if df is None:
        raise EsqlError("empty query")
    return df
