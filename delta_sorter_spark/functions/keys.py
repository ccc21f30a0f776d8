"""Sort-key helpers: null-placement-aware orderings and comparable key tuples.

The reference compares rows with a hand-rolled lexicographic tuple comparator
(``cmp_tuple_with_nulls``, reference lib.rs:37-91): leading-to-trailing, early
exit on first non-equal column, configurable NULLS FIRST/LAST (default first,
lib.rs:122), ascending only.  Spark's native ordering already implements all
of that — ``asc_nulls_first`` IS the reference's default — so the engine never
does row-at-a-time comparison in Python on the data path.

Two subtleties handled here:

1. **Struct min/max under NULLS LAST.**  ``F.min(F.struct(*cols))`` uses
   Spark's struct ordering, which places null *fields* first.  For
   ``nulls="last"`` we build a surrogate key that prefixes every column with a
   null-rank flag so min/max aggregate to the right tuple (SURVEY §7 hard
   part 1).
2. **Driver-side tuple compare.**  The cross-file boundary check (V3) runs
   over one tiny row per file on the driver; ``key_tuple_cmp`` reproduces the
   comparator there, including the trailing-length tiebreak (lib.rs:90).

Float NaN: the reference uses IEEE total_cmp (lib.rs:57); Spark treats all NaN
as one largest double.  They differ only on negative NaN — documented, not
chased (SURVEY §1.3).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_sort_spec(sort_columns: Sequence[str]) -> tuple[list[str], list[bool]]:
    """Split ``col[:asc|:desc]`` specs into (columns, ascending flags).

    Per-column sort direction is on the reference's roadmap but unimplemented
    there (README.md:183 "per-column sort direction"); we accept it with the
    natural suffix syntax, defaulting to ascending.  Null placement stays a
    table-level flag and means placement in the OUTPUT order regardless of
    direction (Spark's asc_nulls_first / desc_nulls_first semantics)."""
    cols: list[str] = []
    ascending: list[bool] = []
    for spec in sort_columns:
        name, sep, suffix = spec.partition(":")
        if sep:
            low = suffix.strip().lower()
            if low not in ("asc", "desc"):
                raise ValueError(
                    f"bad sort direction {suffix!r} in {spec!r}: use col, col:asc, or col:desc"
                )
            ascending.append(low == "asc")
        else:
            ascending.append(True)
        cols.append(name.strip())
    return cols, ascending


def sort_order_columns(
    sort_columns: Sequence[str],
    nulls_first: bool = True,
    directions: Sequence[bool] | None = None,
) -> list[Column]:
    """Ordering columns for df.orderBy / Window.orderBy with the configured
    null placement (reference lib.rs:801-809 threads the same flag into
    DataFusion's sort) and optional per-column direction (True=asc)."""
    directions = list(directions) if directions is not None else [True] * len(sort_columns)
    out: list[Column] = []
    for c, asc in zip(sort_columns, directions):
        if asc:
            out.append(F.col(c).asc_nulls_first() if nulls_first else F.col(c).asc_nulls_last())
        else:
            out.append(F.col(c).desc_nulls_first() if nulls_first else F.col(c).desc_nulls_last())
    return out


def surrogate_key(sort_columns: Sequence[str], nulls_first: bool = True) -> Column:
    """A struct column whose native (nulls-agnostic) ordering equals the
    configured tuple ordering.  Each key column is prefixed with a null-rank
    tinyint: 0/1 so that NULL ranks first or last as configured.  Used for
    struct min/max aggregation in the validator (V1)."""
    fields: list[Column] = []
    for i, c in enumerate(sort_columns):
        null_rank = 0 if nulls_first else 1
        val_rank = 1 - null_rank
        flag = F.when(F.col(c).isNull(), F.lit(null_rank)).otherwise(F.lit(val_rank))
        fields.append(flag.cast("tinyint").alias(f"n{i}"))
        fields.append(F.col(c).alias(f"v{i}"))
    return F.struct(*fields)


def plain_key(sort_columns: Sequence[str]) -> Column:
    """The raw key tuple as a struct (for reporting/detail strings)."""
    return F.struct(*[F.col(c).alias(c) for c in sort_columns])


def key_tuple_cmp(
    a: Sequence[Any],
    b: Sequence[Any],
    nulls_first: bool = True,
    directions: Sequence[bool] | None = None,
) -> int:
    """Driver-side lexicographic compare of two key tuples with configurable
    null placement; mirrors cmp_tuple_with_nulls (reference lib.rs:75-91):
    element-wise compare with early exit, then tiebreak on tuple length.
    ``directions`` flips the VALUE comparison for descending columns; null
    placement is output-order and direction-independent."""
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None and y is None:
            continue
        if x is None:
            return -1 if nulls_first else 1
        if y is None:
            return 1 if nulls_first else -1
        if directions is not None and not directions[i]:
            x, y = y, x
        if x < y:
            return -1
        if x > y:
            return 1
    return (len(a) > len(b)) - (len(a) < len(b))
