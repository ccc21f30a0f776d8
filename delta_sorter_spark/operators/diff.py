"""Snapshot diffing: row-level insert/update/delete classification between
two relations sharing a key — the data-quality primitive behind "what
changed between corpus v1 and v2" dashboards and regression gates on
training-data rebuilds.

Complement to operators/dml.table_changes (which replays a Delta table's
OWN commit log): diff_snapshots compares ANY two frames — two table
versions, a table against an external rebuild, yesterday's export against
today's — without needing a shared history.

Scale shape: ONE full outer join on the key tuple (the unavoidable
shuffle), change detection via a single sha256 over the canonicalized
non-key columns computed map-side on each side (wide rows never compare
column-by-column through the join), and unchanged rows drop out before
anything else happens.  AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(keys..., change) for every row that differs: ``insert`` (key only in
    ``new``), ``delete`` (key only in ``old``), ``update`` (key in both,
    compared columns differ).  Unchanged keys are absent.

    ``compare_cols`` restricts the update check (default: all shared
    non-key columns, in ``old``'s column order).  Keys must be unique per
    side — duplicate keys make "update" ill-defined; callers dedup first
    (exact_dedup / latest_by_key)."""
    keys = list(keys)
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [c for c in old.columns if c not in keys and c in shared]
    digest = F.sha2(
        F.to_json(F.struct(*[F.col(c) for c in compare_cols])), 256
    )
    o = old.select(*keys, digest.alias("__ho__"))
    n = new.select(*keys, digest.alias("__hn__"))
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("__ho__").isNull(), F.lit("insert"))
        .when(F.col("__hn__").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change"),
        "__ho__",
        "__hn__",
    ).where(
        F.col("__ho__").isNull()
        | F.col("__hn__").isNull()
        | (F.col("__ho__") != F.col("__hn__"))
    ).drop("__ho__", "__hn__")


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """One row per change kind: (change, n).  The regression-gate number —
    "this rebuild inserts 12, deletes 0, updates 3"."""
    return (
        diff_snapshots(old, new, keys, compare_cols)
        .groupBy("change")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
