"""Time-series regularization: resample an event stream onto a fixed grid
with forward-fill (the hypertable/monitoring "gap fill" operator; the
reference — a table maintenance tool, `crates/sorter-core/src/lib.rs` — has
no time-series surface, this is north-star extension work over the
``events`` table shape).

Values are quantized to parts-per-million integers (``floor(value * 1e6)``)
so the DuckDB oracle verifies the fill bit-for-bit — IEEE double multiply +
floor is deterministic across engines, unlike aggregate float summation
order.

Scale posture: the per-(key, bucket) reduction is one map-side-combined
groupBy over the raw stream — the only data-scale shuffle.  The generated
grid is |keys| x (span / step) rows, distributed by key via explode; the
forward-fill window partitions by key and orders by bucket, so parallelism
equals key cardinality (entity-level keys in production — thousands to
millions of partitions; a low-cardinality key column caps parallelism at
|keys| and should be resampled at coarser step or split by an auxiliary
key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int = 300,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto a ``step_s``-second grid.

    Per key: bucket timestamps to the epoch-aligned grid, reduce each
    bucket to its max ppm-quantized value (deterministic, order-free),
    generate the full [min_bucket, max_bucket] grid, and forward-fill empty
    buckets from the latest earlier observation.

    Output: (key, bucket_start, value_ppm, filled) — ``filled`` = 1 when
    the row was gap-filled rather than observed."""
    from pyspark.sql.window import Window

    b = F.expr(f"(unix_timestamp({ts_col}) div {step_s}) * {step_s}")
    bucketed = (
        df.select(
            F.col(key_col),
            b.alias("__b__"),
            F.floor(F.col(value_col).cast("double") * 1_000_000)
            .cast("bigint")
            .alias("__v__"),
        )
        .groupBy(key_col, "__b__")
        .agg(F.max("__v__").alias("__v__"))
    )
    span = bucketed.groupBy(key_col).agg(
        F.min("__b__").alias("__lo__"), F.max("__b__").alias("__hi__")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence("__lo__", "__hi__", F.lit(step_s).cast("bigint"))
        ).alias("__b__"),
    )
    joined = grid.join(bucketed, [key_col, "__b__"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.date_format(
            F.timestamp_seconds(F.col("__b__")).cast("timestamp_ntz"), TS_FMT
        ).alias("bucket_start"),
        F.last("__v__", ignorenulls=True).over(w).alias("value_ppm"),
        F.when(F.col("__v__").isNull(), 1).otherwise(0).cast("bigint").alias("filled"),
    )
