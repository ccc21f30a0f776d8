"""Loaders for the driver's synthetic parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet, normalising ``ts`` to TIMESTAMP_NTZ.

    The generator has shipped ``ts`` both as TIMESTAMP(MICROS) (current) and
    as TIMESTAMP(NANOS) (which Spark's reader only accepts as int64 via the
    ``nanosAsLong`` legacy conf), so branch on the dtype Spark actually reads:

    - already a timestamp type -> plain cast to NTZ (no-op for NTZ reads);
    - int64 (nanos-as-long)    -> integer DIV 1000 to micros (float division
      would lose bits above 2^53), then epoch + interval arithmetic.

    NTZ in both branches keeps every downstream window/format
    session-timezone-invariant, matching the DuckDB oracle regardless of the
    driver session's timezone."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    micros = "CAST(ts DIV 1000 AS BIGINT)"
    ntz = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
        f"CAST({micros} AS DECIMAL(24,0)) / 1000000)"
    )
    return df.withColumn("ts", F.expr(ntz))
