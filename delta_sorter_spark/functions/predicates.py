"""Typed partition-predicate rendering.

Reproduces the reference's replaceWhere predicate generator semantics
(reference: crates/sorter-core/src/lib.rs:898-983 for the SQL-string form,
lib.rs:985-1064 for the Expr form).  Partition values arrive as *serialized
strings* (that is how the Delta log stores them); rendering is type-directed
by the table schema:

- ``None`` / the string ``"null"`` (case-insensitive)  ->  ``"col" IS NULL``
  (lib.rs:931-935)
- byte/short/integer/long  -> unquoted if it parses as an int, else quoted
  (lib.rs:941-950)
- float/double             -> unquoted if it parses as a float, else quoted
  (lib.rs:951-957)
- boolean                  -> TRUE/FALSE for case-insensitive true/false,
  else quoted (lib.rs:958-965); the Expr form also accepts ``t``/``1``
  (lib.rs:1009-1016)
- decimal(p,s)             -> unquoted when all chars are digit/./-/+
  (lib.rs:966-975) — note the *raw string* is emitted, not a parsed number,
  so ``1234.50`` keeps its trailing zero (golden test lib.rs:1091-1095)
- anything else            -> single-quoted with ``'`` doubled
  (lib.rs:976-980)

Golden expectation (lib.rs:1091-1095)::

    "id" = 42 AND "active" = TRUE AND "amount" = 1234.50
        AND "country" = 'US' AND "region" IS NULL

The SQL-string form is used for report/commit-info parity (double-quoted
identifiers, like the reference/DataFusion).  For actually *filtering* a
DataFrame we never interpolate strings — ``partition_filter_expr`` builds a
Column conjunction (the reference's Expr form, lib.rs:985-1064), which
Catalyst turns into partition pruning for free.
"""

from __future__ import annotations

import datetime as _dt
import functools
import operator
from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_STRINGS = {"null"}


def _is_null_value(value: str | None) -> bool:
    return value is None or value.lower() in NULL_STRINGS


def _quote_str(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def _render_literal(value: str, dtype: T.DataType) -> str:
    """Render one serialized partition value as a typed SQL literal."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        try:
            int(value)
            return value
        except ValueError:
            return _quote_str(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        try:
            float(value)
            return value
        except ValueError:
            return _quote_str(value)
    if isinstance(dtype, T.BooleanType):
        low = value.lower()
        if low in ("true", "false"):
            return low.upper()
        return _quote_str(value)
    if isinstance(dtype, T.DecimalType):
        if value and all(c.isdigit() or c in ".-+" for c in value):
            return value
        return _quote_str(value)
    # DATE/TIMESTAMP literal forms: on the reference's roadmap
    # (README.md:183 "DATE/TIMESTAMP literal forms in typed predicates"),
    # unimplemented there (date/timestamp partition values fall into the
    # quoted-string arm, lib.rs:976-980).  We emit typed ANSI literals when
    # the serialized value parses, falling back to the reference's quoting.
    if isinstance(dtype, T.DateType):
        try:
            _dt.date.fromisoformat(value)
            return f"DATE {_quote_str(value)}"
        except ValueError:
            return _quote_str(value)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        try:
            _dt.datetime.fromisoformat(value)
            return f"TIMESTAMP {_quote_str(value)}"
        except ValueError:
            return _quote_str(value)
    return _quote_str(value)


def render_partition_predicate(
    partition_values: Mapping[str, str | None],
    schema: T.StructType | None = None,
    *,
    ident_quote: str = '"',
) -> str:
    """SQL predicate string for one partition, e.g. for replaceWhere /
    commit-info parity.  Keys are emitted in sorted order, matching the
    reference's BTreeMap iteration (lib.rs:263-281).

    With no schema (untyped fallback, lib.rs:898-910) every non-null value is
    quoted as a string.
    """
    parts: list[str] = []
    for col in sorted(partition_values):
        value = partition_values[col]
        ident = f"{ident_quote}{col}{ident_quote}"
        if _is_null_value(value):
            parts.append(f"{ident} IS NULL")
            continue
        if schema is not None and col in schema.names:
            lit = _render_literal(value, schema[col].dataType)
        else:
            lit = _quote_str(value)
        parts.append(f"{ident} = {lit}")
    return " AND ".join(parts)


_TRUE_STRINGS = ("true", "t", "1")


def _parse_typed(value: str, dtype: T.DataType):
    """Parse a serialized partition value into a Python literal for F.lit.

    Mirrors the Expr-form coercions (lib.rs:996-1064), including the looser
    boolean acceptance of true|t|1 (lib.rs:1009-1016).
    """
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        try:
            return int(value)
        except ValueError:
            return value
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        try:
            return float(value)
        except ValueError:
            return value
    if isinstance(dtype, T.BooleanType):
        return value.lower() in _TRUE_STRINGS
    if isinstance(dtype, T.DateType):
        try:
            return _dt.date.fromisoformat(value)
        except ValueError:
            return value
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        try:
            return _dt.datetime.fromisoformat(value)
        except ValueError:
            return value
    return value


def partition_filter_expr(
    partition_values: Mapping[str, str | None],
    schema: T.StructType | None = None,
) -> Column:
    """Column conjunction for one partition; empty dict -> lit(True)
    (reference returns Expr TRUE for empty, lib.rs:1001)."""
    conds: list[Column] = []
    for col in sorted(partition_values):
        value = partition_values[col]
        if _is_null_value(value):
            conds.append(F.col(col).isNull())
        else:
            typed = (
                _parse_typed(value, schema[col].dataType)
                if schema is not None and col in schema.names
                else value
            )
            conds.append(F.col(col) == F.lit(typed))
    if not conds:
        return F.lit(True)
    return functools.reduce(operator.and_, conds)


def validate_sort_columns(schema: T.StructType, sort_columns: Sequence[str]) -> None:
    """Existence check with the reference's error shape: lists the missing
    columns and the valid fields (lib.rs:557-576).  This is the one error
    dry-run must NOT swallow (lib.rs:184-187)."""
    missing = [c for c in sort_columns if c not in schema.names]
    if missing:
        raise ValueError(
            f"missing sort columns {missing}; valid fields: {list(schema.names)}"
        )
