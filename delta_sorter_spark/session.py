"""SparkSession bootstrap tuned for the deltasort workload.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
- Arrow on: every Pandas-UDF path (validator file scans, multimodal decode)
  moves batches over Arrow, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics are deterministic and
  match the DuckDB oracle.
- ``spark.sql.shuffle.partitions`` defaults to 32 for local[32] testing; on a
  real cluster AQE's coalescing makes the initial number less critical, and
  callers override via config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "delta-sorter-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default configs.

    When the driver hands us an existing session (``__spark_entry__``), we do
    NOT call this — all operators take ``spark`` explicitly and only rely on
    configs they set per-write.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    for k, v in DEFAULT_CONFIGS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
