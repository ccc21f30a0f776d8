"""Scalable global ranking (dense total order) without a single-partition
exchange.

``row_number() OVER (ORDER BY ...)`` funnels every row through ONE partition
(`Exchange SinglePartition` in the plan) — correct at test scale, a
non-starter at 100 TB.  ``global_rank`` computes the identical result with
the classic two-phase shape Spark's own sort uses:

1. ``repartitionByRange(n, keys)`` — sampled range partitioning: partition i
   holds a disjoint key range, ranges ascending with i.
2. per-partition row counts (one cheap count job over partition ids) ->
   cumulative offsets on the driver (n integers).
3. ``row_number()`` windowed *within* each range partition (no global
   exchange; each partition sorts locally) + broadcast-joined offset.

Determinism: ties on the full key tuple land in the same range partition, so
the produced rank multiset is identical to the single-partition form even
though sampling makes the partition boundaries themselves nondeterministic.

Cost: one range exchange + one local materialization (the pinned
partitioning both passes read) instead of a single pass — the standard trade
for removing the single-partition bottleneck.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_sorter_spark.functions.keys import sort_order_columns


def global_rank(
    df: DataFrame,
    keys: Sequence[str],
    rank_col: str = "rn",
    nulls_first: bool = True,
    num_partitions: int | None = None,
    directions: Sequence[bool] | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Add a 1-based global rank column ordered by ``keys`` (per-column
    direction via ``directions``, True=asc, default all-ascending;
    configurable null placement), computed without a global single-partition
    shuffle.  ``partition_col`` optionally keeps the range-partition id
    under that name — consumers that window WITHIN the rank's partitions
    (e.g. sorted-neighborhood leads) key on it instead of re-shuffling on
    the rank itself."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    order = sort_order_columns(keys, nulls_first, directions)
    # The range partitioning MUST be materialized exactly once:
    # repartitionByRange samples its boundaries per execution (seeded by RDD
    # id), so if the count branch and the rank branch each re-executed the
    # exchange they could see DIFFERENT partition assignments and the offsets
    # would be wrong (observed: ~0.03% rank corruption at sf0.01 when relying
    # on Catalyst/AQE exchange reuse, which is not guaranteed across the
    # broadcast-subquery boundary).  localCheckpoint pins the partitioning —
    # one exchange + one local materialization, both branches read the same
    # partitions.  At cluster scale this is the same cost class as the
    # second exchange it replaces, and it is deterministic.
    parted = (
        df.repartitionByRange(n, *order)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = parted.groupBy("__pid__").agg(F.count("*").alias("__cnt__"))
    w_off = Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid__",
        F.coalesce(F.sum("__cnt__").over(w_off), F.lit(0)).alias("__offset__"),
    )
    w = Window.partitionBy("__pid__").orderBy(*order)
    ranked = parted.join(F.broadcast(offsets), "__pid__").withColumn(
        rank_col, (F.row_number().over(w) + F.col("__offset__")).cast("long")
    )
    if partition_col is None:
        return ranked.drop("__pid__", "__offset__")
    ranked = ranked.drop("__offset__")
    if partition_col != "__pid__":
        ranked = ranked.withColumnRenamed("__pid__", partition_col)
    return ranked
