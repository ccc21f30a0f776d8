"""Skew mitigation: salted join (the manual counterpart to AQE's runtime
skew-join splitting, for when a hot key is known or AQE can't help — e.g.
a broadcast-ineligible dimension joined on a power-law key).

``salted_join`` splits each hot left-side key across ``salt_factor``
sub-partitions by appending a deterministic salt, and replicates the
matching right-side rows across all salt values.  The join then shuffles
``salt_factor`` evenly-sized groups instead of one giant one.  Deterministic:
the salt is ``pmod(hash(whole-left-row), salt_factor)``, so reruns produce
identical partitioning (no rand()).

Plain aggregations rarely need salting in Spark — partial aggregation
already combines map-side — but count-distinct-style or collect-style aggs
over a hot key do; ``salted_agg_count_distinct`` shows the two-stage shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Use when `left` is large with skewed join keys and `right` is too big to
    broadcast but much smaller than `left` (replication costs
    |right| * salt_factor)."""
    on = list(on)
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_factor))
    salted_left = left.withColumn("__salt__", salt)
    replicated_right = right.withColumn(
        "__salt__", F.explode(F.expr(f"sequence(0, {salt_factor - 1})"))
    )
    out = salted_left.join(replicated_right, on + ["__salt__"], how)
    return out.drop("__salt__")


def salted_agg_count_distinct(
    df: DataFrame, key: str, value: str, salt_factor: int = 8
) -> DataFrame:
    """Two-stage distinct count per (possibly hot) key:
    stage 1 dedups (key, value) within salted groups, stage 2 merges.
    Output: (key, n_distinct)."""
    salt = F.pmod(F.hash(F.col(value)), F.lit(salt_factor))
    stage1 = (
        df.select(F.col(key), F.col(value), salt.alias("__salt__"))
        .groupBy(key, "__salt__")
        .agg(F.count_distinct(F.col(value)).alias("__partial__"))
    )
    return stage1.groupBy(key).agg(F.sum("__partial__").cast("long").alias("n_distinct"))
