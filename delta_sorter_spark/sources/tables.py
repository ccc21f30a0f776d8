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
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects.  Read nanos as long (legacy conf) and convert to a
    microsecond TIMESTAMP_NTZ JVM-side.

    Two deliberate choices:
    - integer DIV (not float division), which would lose bits above 2^53;
    - NTZ, so every downstream window/format is session-timezone-invariant
      and matches the DuckDB oracle no matter what timezone the driver's
      SparkSession runs in (timestamp_micros would yield an LTZ value whose
      hour windows shift under non-UTC sessions)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    micros = "CAST(ts DIV 1000 AS BIGINT)"
    ntz = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
        f"CAST({micros} AS DECIMAL(24,0)) / 1000000)"
    )
    return df.withColumn("ts", F.expr(ntz))
