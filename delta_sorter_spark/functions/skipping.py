"""Stats-based file skipping (zone maps) for scans and DML planning.

Delta's per-file ``stats`` (minValues / maxValues / nullCount / numRecords,
written by this engine's stage_write, sources/delta_table.py) are zone maps:
a file whose [min, max] interval on a predicate column is disjoint from the
values the predicate can accept provably contains no matching row and never
needs to be opened.  The reference delegates this to delta-rs / DataFusion's
pruning predicates at scan time; here it is a log-level planner step — the
pruned Add list flows into ``DeltaTable.to_df(adds=...)`` (local and remote
alike), so Spark never schedules a task for a skipped file.

This is the read-path half of the zone-map machinery the DML verbs already
use for write planning (operators/dml.py ``_may_contain`` prunes MERGE
candidates by source key range).  At 100 TB the effect is structural: a
point or range predicate on a clustered column (post `compact` sort or
z-order) turns a million-file scan into a handful of tasks, and
``delete_where`` / ``update_where`` stop paying a full-table scan just to
discover which files they touch.

Soundness model — a file may be skipped only when the predicate is provably
FALSE-or-NULL for every row it contains:

- Stats are treated as BOUNDS, not exact extremes (the Delta protocol allows
  writers to widen string maxValues when truncating; stored min <= true min
  and stored max >= true max).  Every skip decision below stays sound under
  bounds semantics — including the ``!=`` point-collapse case, where
  stored min == stored max pins every non-null value exactly.
- Missing stats, un-coercible literals, or non-comparable types degrade to
  "may match" (scan the file), never to a skip.
- SQL three-valued logic: a comparison on a NULL value yields NULL, which a
  WHERE clause treats as no-match.  Hence ``NOT (c = 5)`` prunes exactly
  like ``c != 5`` (NULL rows satisfy neither), ``c NOT IN (..., NULL, ...)``
  matches no row at all, and an all-NULL file (partition value null, or
  nullCount == numRecords) is skippable by any plain comparison.
- The predicate GRAMMAR is strict: only the subset below parses, and any
  parse failure disables pruning for the whole predicate (``prune_adds``
  returns the input unchanged) rather than guessing at semantics.

Supported grammar (case-insensitive keywords)::

    expr     := and_expr (OR and_expr)*
    and_expr := not_expr (AND not_expr)*
    not_expr := NOT not_expr | '(' expr ')' | predicate
    predicate:= operand cmp_op operand
              | operand IS [NOT] NULL
              | operand [NOT] BETWEEN operand AND operand
              | operand [NOT] IN '(' operand (',' operand)* ')'
              | operand [NOT] LIKE 'pattern'   -- prunes on the prefix
                before the first wildcard (NOT LIKE: trailing-% only)
    operand  := column | literal
    cmp_op   := = | == | != | <> | < | <= | > | >=
    literal  := number | 'string' | TRUE | FALSE | NULL
              | DATE 'yyyy-mm-dd' | TIMESTAMP 'iso'

Column-vs-column comparisons parse but evaluate as "may match" (no bounds
logic relates two zone maps of the same file soundly without row alignment).

Driver cost: O(active files x predicate size) with microsecond constants —
the same order as the log replay that produced the Add list, and strictly
cheaper than the scan tasks it avoids scheduling.
"""

from __future__ import annotations

import datetime as _dt
import re
from collections.abc import Sequence

from pyspark.sql import types as T


class SkippingUnsupported(ValueError):
    """Predicate outside the supported skipping grammar (pruning disabled)."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<num>[-+]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<qident>`[^`]+`|"[^"]+")
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<op><=|>=|==|!=|<>|[=<>(),])
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "between", "in", "is", "null", "true", "false",
    "date", "timestamp", "like",
}


def _tokenize(sql: str) -> list[tuple[str, object]]:
    tokens: list[tuple[str, object]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SkippingUnsupported(f"cannot tokenize predicate at: {rest[:30]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            text = m.group("num")
            val = float(text) if any(c in text for c in ".eE") else int(text)
            tokens.append(("lit", val))
        elif m.lastgroup == "str":
            tokens.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "qident":
            tokens.append(("col", m.group("qident")[1:-1]))
        elif m.lastgroup == "word":
            word = m.group("word")
            low = word.lower()
            if low in _KEYWORDS:
                tokens.append(("kw", low))
            else:
                tokens.append(("col", word))
        else:
            op = m.group("op")
            tokens.append(("op", "=" if op == "==" else ("!=" if op == "<>" else op)))
    return tokens


# ---------------------------------------------------------------------------
# Parser -> tuple AST
#   ("and"|"or", a, b) | ("not", a) | ("cmp", op, col, lit)
#   ("null", col, negated) | ("in", col, [lits], negated) | ("maybe",)
# ---------------------------------------------------------------------------

_CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!="}


class _Parser:
    def __init__(self, tokens: list[tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def _peek(self, kind=None, value=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind is not None and k != kind:
            return None
        if value is not None and v != value:
            return None
        return self.toks[self.i]

    def _eat(self, kind=None, value=None):
        tok = self._peek(kind, value)
        if tok is None:
            got = self.toks[self.i] if self.i < len(self.toks) else "<end>"
            raise SkippingUnsupported(f"expected {value or kind}, got {got}")
        self.i += 1
        return tok

    def parse(self):
        ast = self._or()
        if self.i != len(self.toks):
            raise SkippingUnsupported(f"trailing tokens: {self.toks[self.i:]}")
        return ast

    def _or(self):
        left = self._and()
        while self._peek("kw", "or"):
            self._eat()
            left = ("or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self._peek("kw", "and"):
            self._eat()
            left = ("and", left, self._not())
        return left

    def _not(self):
        if self._peek("kw", "not"):
            self._eat()
            return ("not", self._not())
        if self._peek("op", "("):
            # '(' starts a parenthesized boolean expr here (operand-level
            # parens are not part of the grammar)
            self._eat()
            inner = self._or()
            self._eat("op", ")")
            return inner
        return self._predicate()

    def _operand(self):
        """-> ("col", name) | ("lit", value)"""
        if self._peek("kw", "true"):
            self._eat()
            return ("lit", True)
        if self._peek("kw", "false"):
            self._eat()
            return ("lit", False)
        if self._peek("kw", "null"):
            self._eat()
            return ("lit", None)
        if self._peek("kw", "date"):
            self._eat()
            k, v = self._eat("lit")
            if not isinstance(v, str):
                raise SkippingUnsupported("DATE requires a string literal")
            try:
                return ("lit", _dt.date.fromisoformat(v))
            except ValueError as e:
                raise SkippingUnsupported(f"bad DATE literal {v!r}") from e
        if self._peek("kw", "timestamp"):
            self._eat()
            k, v = self._eat("lit")
            if not isinstance(v, str):
                raise SkippingUnsupported("TIMESTAMP requires a string literal")
            try:
                return ("lit", _dt.datetime.fromisoformat(v))
            except ValueError as e:
                raise SkippingUnsupported(f"bad TIMESTAMP literal {v!r}") from e
        if self._peek("lit"):
            return self._eat()
        if self._peek("col"):
            return self._eat()
        raise SkippingUnsupported(f"expected column or literal near {self.toks[self.i:]}")

    def _predicate(self):
        left = self._operand()
        negated = False
        if self._peek("kw", "is"):
            self._eat()
            if self._peek("kw", "not"):
                self._eat()
                negated = True
            self._eat("kw", "null")
            if left[0] != "col":
                raise SkippingUnsupported("IS NULL requires a column")
            return ("null", left[1], negated)
        if self._peek("kw", "not"):
            self._eat()
            negated = True
            if not (
                self._peek("kw", "between")
                or self._peek("kw", "in")
                or self._peek("kw", "like")
            ):
                raise SkippingUnsupported(
                    "NOT here must precede BETWEEN, IN, or LIKE"
                )
        if self._peek("kw", "like"):
            self._eat()
            k, pat = self._eat("lit")
            if left[0] != "col" or not isinstance(pat, str):
                raise SkippingUnsupported("LIKE requires column LIKE 'pattern'")
            return self._like(left[1], pat, negated)
        if self._peek("kw", "between"):
            self._eat()
            lo = self._operand()
            self._eat("kw", "and")
            hi = self._operand()
            core = ("and", self._cmp(">=", left, lo), self._cmp("<=", left, hi))
            return ("not", core) if negated else core
        if self._peek("kw", "in"):
            self._eat()
            self._eat("op", "(")
            items = [self._operand()]
            while self._peek("op", ","):
                self._eat()
                items.append(self._operand())
            self._eat("op", ")")
            if left[0] != "col":
                raise SkippingUnsupported("IN requires a column on the left")
            if any(it[0] != "lit" for it in items):
                raise SkippingUnsupported("IN list must be literals")
            return ("in", left[1], [it[1] for it in items], negated)
        tok = self._peek("op")
        if tok is None or tok[1] not in _CMP_OPS:
            raise SkippingUnsupported(f"expected comparison near {self.toks[self.i:]}")
        op = self._eat()[1]
        right = self._operand()
        return self._cmp(op, left, right)

    @staticmethod
    def _like(col: str, pattern: str, negated: bool):
        """LIKE prefix pruning.

        A row matching ``LIKE 'ab%cd'`` necessarily starts with the prefix
        before the first wildcard, so the positive form prunes on
        ``("like", col, prefix, exact)`` whenever that prefix is non-empty.
        ``exact`` records whether the prefix fully captures the pattern
        (pure trailing-%% like ``'abc%'``): only then may a NEGATED
        evaluation — direct NOT LIKE, an outer ``NOT (...)``, or De Morgan
        inside ``NOT(a OR b)`` — use the shared-prefix proof.  For any
        other shape the prefix is a lossy over-approximation, sound for
        the positive direction only.  An escape character, whose semantics
        we don't model, degrades to "may match"."""
        if "\\" in pattern:
            return ("maybe",)
        cut = len(pattern)
        for w in ("%", "_"):
            i = pattern.find(w)
            if i != -1:
                cut = min(cut, i)
        prefix = pattern[:cut]
        exact = pattern.endswith("%") and cut == len(pattern) - 1
        if not negated:
            if not prefix:
                return ("maybe",)
            return ("like", col, prefix, exact)
        # NOT LIKE: pure prefix pattern 'abc%' only
        if exact:
            return ("not", ("like", col, prefix, True))
        return ("maybe",)

    @staticmethod
    def _cmp(op, left, right):
        if left[0] == "col" and right[0] == "lit":
            return ("cmp", op, left[1], right[1])
        if left[0] == "lit" and right[0] == "col":
            return ("cmp", _FLIP[op], right[1], left[1])
        # col-op-col or lit-op-lit: parses, but bounds logic cannot skip on it
        return ("maybe",)


def parse_predicate(sql: str):
    """Parse ``sql`` into the skipping AST; raises SkippingUnsupported."""
    tokens = _tokenize(sql)
    if not tokens:
        raise SkippingUnsupported("empty predicate")
    return _Parser(tokens).parse()


# ---------------------------------------------------------------------------
# Per-file evaluation
# ---------------------------------------------------------------------------


class _Facts:
    """Zone-map facts for one column of one file.

    ``lo``/``hi`` are bounds (None = unknown); ``null_count``/``num_records``
    may be None when the writer omitted them."""

    __slots__ = ("known", "lo", "hi", "null_count", "num_records")

    def __init__(self, known, lo=None, hi=None, null_count=None, num_records=None):
        self.known = known
        self.lo = lo
        self.hi = hi
        self.null_count = null_count
        self.num_records = num_records

    @property
    def all_null(self) -> bool:
        return (
            self.null_count is not None
            and self.num_records is not None
            and self.num_records > 0
            and self.null_count == self.num_records
        )


_UNKNOWN = _Facts(known=False)


def _coerce_literal(lit, dtype: T.DataType):
    """Coerce a parsed literal toward the column type for comparison; None
    on failure (caller degrades to may-match)."""
    import decimal

    if lit is None or isinstance(lit, bool):
        return lit
    if isinstance(dtype, T.DateType):
        if isinstance(lit, _dt.date) and not isinstance(lit, _dt.datetime):
            return lit
        if isinstance(lit, str):
            try:
                return _dt.date.fromisoformat(lit)
            except ValueError:
                return None
        return None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(lit, _dt.datetime):
            return lit
        if isinstance(lit, str):
            try:
                return _dt.datetime.fromisoformat(lit)
            except ValueError:
                return None
        return None
    if isinstance(dtype, T.DecimalType):
        if isinstance(lit, (int, float)):
            return lit  # Python compares Decimal with int/float exactly
        if isinstance(lit, str):
            try:
                return decimal.Decimal(lit)
            except decimal.InvalidOperation:
                return None
        return None
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                          T.FloatType, T.DoubleType)):
        if isinstance(lit, (int, float)):
            return lit
        return None  # string-vs-numeric: Spark casts; we stay conservative
    if isinstance(dtype, T.StringType):
        return lit if isinstance(lit, str) else None
    if isinstance(dtype, T.BooleanType):
        return lit if isinstance(lit, bool) else None
    return None


def _cmp_may_match(op: str, facts: _Facts, lit) -> bool:
    """Can any row of the file satisfy ``col op lit``? (bounds logic)"""
    if not facts.known:
        return True
    if lit is None:
        return False  # col <op> NULL is NULL for every row -> no match
    if facts.all_null:
        return False  # every comparison on NULL yields NULL
    lo, hi = facts.lo, facts.hi
    if lo is None or hi is None:
        return True
    try:
        if op == "=":
            return not (lit < lo or lit > hi)
        if op == "!=":
            return not (lo == hi == lit)
        if op == "<":
            return lo < lit
        if op == "<=":
            return lo <= lit
        if op == ">":
            return hi > lit
        if op == ">=":
            return hi >= lit
    except TypeError:
        return True  # non-comparable literal/stat pairing
    return True


def _may_match(ast, facts_for) -> bool:
    kind = ast[0]
    if kind == "maybe":
        return True
    if kind == "and":
        return _may_match(ast[1], facts_for) and _may_match(ast[2], facts_for)
    if kind == "or":
        return _may_match(ast[1], facts_for) or _may_match(ast[2], facts_for)
    if kind == "not":
        return _may_match_not(ast[1], facts_for)
    if kind == "cmp":
        _, op, col, lit = ast
        facts, dtype = facts_for(col)
        if dtype is not None and lit is not None:
            lit = _coerce_literal(lit, dtype)
            if lit is None and ast[3] is not None:
                return True  # coercion failed -> conservative
        return _cmp_may_match(op, facts, lit)
    if kind == "null":
        _, col, negated = ast
        facts, _ = facts_for(col)
        if not facts.known:
            return True
        if negated:  # IS NOT NULL: only an all-null file is skippable
            return not facts.all_null
        return facts.null_count is None or facts.null_count > 0
    if kind == "like":
        _, col, prefix, _exact = ast
        facts, _ = facts_for(col)
        if not facts.known:
            return True
        if facts.all_null:
            return False  # LIKE on NULL is NULL -> no match
        lo, hi = facts.lo, facts.hi
        if not isinstance(lo, str) or not isinstance(hi, str):
            return True
        # a matching value v satisfies v >= prefix and v[:len] == prefix
        if hi < prefix:
            return False
        if lo[: len(prefix)] > prefix:
            return False
        return True
    if kind == "in":
        _, col, lits, negated = ast
        facts, dtype = facts_for(col)
        if negated:
            if any(v is None for v in lits):
                return False  # NOT IN (...NULL...) is never TRUE in SQL
            if not facts.known or facts.lo is None or facts.hi is None:
                return True
            if facts.all_null:
                return False
            if facts.lo == facts.hi:
                pinned = facts.lo
                coerced = [
                    _coerce_literal(v, dtype) if dtype is not None else v
                    for v in lits
                ]
                try:
                    if any(c is not None and c == pinned for c in coerced):
                        return False
                except TypeError:
                    return True
            return True
        vals = [v for v in lits if v is not None]
        if not vals:
            return False  # IN (NULL) matches nothing
        return any(_may_match(("cmp", "=", col, v), facts_for) for v in vals)
    return True


def _may_match_not(ast, facts_for) -> bool:
    """Can any row satisfy NOT(ast)?  (three-valued: NULL stays no-match)"""
    kind = ast[0]
    if kind == "maybe":
        return True
    if kind == "and":  # De Morgan
        return _may_match_not(ast[1], facts_for) or _may_match_not(ast[2], facts_for)
    if kind == "or":
        return _may_match_not(ast[1], facts_for) and _may_match_not(ast[2], facts_for)
    if kind == "not":
        # NOT NOT x is only TRUE where x is TRUE (NULL stays NULL)
        return _may_match(ast[1], facts_for)
    if kind == "cmp":
        _, op, col, lit = ast
        inverse = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}
        return _may_match(("cmp", inverse[op], col, lit), facts_for)
    if kind == "null":
        _, col, negated = ast
        return _may_match(("null", col, not negated), facts_for)
    if kind == "in":
        _, col, lits, negated = ast
        return _may_match(("in", col, lits, not negated), facts_for)
    if kind == "like":
        _, col, prefix, exact = ast
        facts, _ = facts_for(col)
        if not facts.known:
            return True
        if facts.all_null:
            return False  # NOT LIKE on NULL is still NULL -> no match
        if not exact:
            # the prefix only over-approximates the pattern (e.g. 'ab%cd'):
            # values sharing the prefix may still fail the full pattern, so
            # NOT LIKE can be TRUE anywhere — never prune
            return True
        if prefix == "":
            return False  # every non-null value matches LIKE '%'
        lo, hi = facts.lo, facts.hi
        if isinstance(lo, str) and isinstance(hi, str):
            if lo.startswith(prefix) and hi.startswith(prefix):
                # all values between prefix-sharing bounds share the prefix
                return False
        return True
    return True


# ---------------------------------------------------------------------------
# Add-list pruning
# ---------------------------------------------------------------------------


def _facts_for_add(add, schema: T.StructType, partition_columns: Sequence[str]):
    """Build the facts resolver for one AddAction."""
    from delta_sorter_spark.functions.predicates import _parse_typed
    from delta_sorter_spark.sources.delta_table import parse_stat

    stats = add.stats or {}
    mins = stats.get("minValues", {})
    maxs = stats.get("maxValues", {})
    nulls = stats.get("nullCount", {})
    num_records = stats.get("numRecords")
    part_set = set(partition_columns)

    def facts_for(col: str):
        if col not in schema.names:
            return _UNKNOWN, None
        dtype = schema[col].dataType
        if col in part_set:
            raw = (add.partition_values or {}).get(col)
            if raw is None or raw.lower() == "null":
                # the whole file is NULL on this column
                n = num_records if num_records is not None else 1
                return _Facts(True, None, None, n, n), dtype
            typed = _parse_typed(raw, dtype)
            return _Facts(True, typed, typed, 0, num_records), dtype
        md = schema[col].metadata or {}
        pk = md.get("delta.columnMapping.physicalName", col)
        lo = hi = None
        if pk in mins and pk in maxs:
            try:
                lo = parse_stat(mins[pk], dtype)
                hi = parse_stat(maxs[pk], dtype)
            except (ValueError, TypeError):
                lo = hi = None
        nc = nulls.get(pk)
        if lo is None and hi is None and nc is None:
            return _UNKNOWN, dtype
        return _Facts(True, lo, hi, nc, num_records), dtype

    return facts_for


def file_may_match(add, ast, schema: T.StructType,
                   partition_columns: Sequence[str]) -> bool:
    """True unless the zone map PROVES no row of ``add`` matches ``ast``."""
    if (add.stats or {}).get("numRecords") == 0:
        return False  # a zero-row file matches nothing, whatever the predicate
    return _may_match(ast, _facts_for_add(add, schema, partition_columns))


_GEN_EXPR_PATTERNS = [
    # (regex over the normalized generation expression, kind, param group)
    (r"^year\((\w+)\)$", "year", None),
    (r"^cast\(year\((\w+)\) as (?:string|int|bigint)\)$", "year", None),
    (r"^cast\((\w+) as date\)$", "date", None),
    (r"^to_date\((\w+)\)$", "date", None),
    (r"^date_trunc\('(year|month|day)', (\w+)\)$", "trunc", 1),
    (r"^date_format\((\w+), 'yyyy-mm'\)$", "fmt", "%Y-%m"),
    (r"^date_format\((\w+), 'yyyy-mm-dd'\)$", "fmt", "%Y-%m-%d"),
]


def _generated_partition_sources(schema: T.StructType, partition_columns):
    """partition column -> (kind, param, source column) for partition
    columns generated by a MONOTONE expression over another column.  Only
    monotone shapes qualify (year, cast-to-date, date_trunc, fixed-width
    date_format): bounds on the source then imply bounds on the partition.
    ``month(x)`` alone is deliberately absent — it is not monotone across
    years and admits no sound range derivation."""
    import re as _re

    out = {}
    for name in partition_columns:
        if name not in schema.names:
            continue
        md = schema[name].metadata or {}
        gen = md.get("delta.generationExpression")
        if not gen:
            continue
        norm = " ".join(str(gen).split()).strip()
        low = norm.lower()
        for pat, kind, param in _GEN_EXPR_PATTERNS:
            m = _re.match(pat, low)
            if not m:
                continue
            if kind == "trunc":
                unit, src = m.group(1), m.group(2)
                out[name] = ("trunc", unit, src)
            else:
                out[name] = (kind, param, m.group(1))
            break
    return out


def _derive_generated_value(kind, param, v):
    """f(v) for the monotone generation function; None when v isn't a
    date/datetime (derivation proves nothing)."""
    if isinstance(v, _dt.datetime):
        d = v
    elif isinstance(v, _dt.date):
        d = _dt.datetime(v.year, v.month, v.day)
    else:
        return None
    if kind == "year":
        return d.year
    if kind == "date":
        return d.date()
    if kind == "trunc":
        zero = {"hour": 0, "minute": 0, "second": 0, "microsecond": 0}
        if param == "year":
            return d.replace(month=1, day=1, **zero)
        if param == "month":
            return d.replace(day=1, **zero)
        return d.replace(**zero)
    if kind == "fmt":
        return d.strftime(param)
    return None


def _typed_for_partition(value, dtype: T.DataType):
    """Coerce a derived value to the generated partition column's type
    (canonical string forms are monotone: 4-digit years, ISO dates,
    'YYYY-MM-DD HH:MM:SS' timestamps); None when no sound form exists."""
    if isinstance(dtype, T.StringType):
        return str(value)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value) if isinstance(value, int) else None
    if isinstance(dtype, T.DateType):
        return value if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime) else None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return value if isinstance(value, _dt.datetime) else None
    return None


def augment_with_generated_partitions(ast, schema: T.StructType,
                                      partition_columns: Sequence[str]):
    """AND derived partition-column bounds into ``ast``: a top-level
    conjunct bound on a source column implies a bound on any partition
    column GENERATED from it by a monotone expression, so a predicate on
    the raw timestamp prunes the year/date partitions Delta-style without
    the user restating the partition column.  Sound by construction — the
    implied constraints are consequences of the originals, and anything
    underivable is simply not added."""
    gen = _generated_partition_sources(schema, partition_columns)
    if not gen:
        return ast
    cmps: list = []

    def collect(node):
        if node[0] == "and":
            collect(node[1])
            collect(node[2])
        elif node[0] in ("cmp", "in"):
            cmps.append(node)

    collect(ast)
    if not cmps:
        return ast
    for pcol, (kind, param, src) in gen.items():
        if src not in schema.names:
            continue
        src_dtype = schema[src].dataType
        pdtype = schema[pcol].dataType
        lo = hi = None

        def tighten(op, lit):
            nonlocal lo, hi
            v = _coerce_literal(lit, src_dtype)
            if v is None:
                return
            try:
                if op in (">=", ">", "=") and (lo is None or v > lo):
                    lo = v
                if op in ("<=", "<", "=") and (hi is None or v < hi):
                    hi = v
            except TypeError:
                pass

        for node in cmps:
            if node[0] == "cmp" and node[2] == src and node[3] is not None:
                tighten(node[1], node[3])
            elif node[0] == "in" and node[1] == src and not node[3]:
                vals = [v for v in node[2] if v is not None]
                if vals:
                    coerced = [
                        c for c in (
                            _coerce_literal(v, src_dtype) for v in vals
                        ) if c is not None
                    ]
                    if len(coerced) == len(vals):
                        try:
                            tighten(">=", min(coerced))
                            tighten("<=", max(coerced))
                        except TypeError:
                            pass
        for op, bound in ((">=", lo), ("<=", hi)):
            if bound is None:
                continue
            derived = _derive_generated_value(kind, param, bound)
            if derived is None:
                continue
            typed = _typed_for_partition(derived, pdtype)
            if typed is None:
                continue
            ast = ("and", ast, ("cmp", op, pcol, typed))
    return ast


def prune_adds(adds, predicate: str | None, schema: T.StructType,
               partition_columns: Sequence[str]):
    """Zone-map file skipping: the subset of ``adds`` that may contain rows
    matching ``predicate``.  Unparseable predicates disable pruning (the
    full list returns) — callers always re-apply the predicate exactly, so
    this is a pure planner optimization with no semantic surface.
    Predicates over the SOURCE of a generated partition column also prune
    that partition (``augment_with_generated_partitions``)."""
    adds = list(adds)
    if predicate is None:
        return adds
    try:
        ast = parse_predicate(predicate)
    except SkippingUnsupported:
        return adds
    ast = augment_with_generated_partitions(ast, schema, partition_columns)
    return [a for a in adds if file_may_match(a, ast, schema, partition_columns)]
