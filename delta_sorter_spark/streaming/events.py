"""Structured Streaming operators over the events stream (SURVEY §2.9 notes
the reference has NO streaming — this is pure extension surface, expressed
the idiomatic Spark way: readStream -> transform -> writeStream).

Every transformation here is written against a plain DataFrame so the SAME
function works in batch mode (for the DuckDB oracle) and streaming mode
(``spark.readStream.schema(...).parquet(dir)``); that batch/stream parity is
the Structured Streaming contract, and it is how we make streaming operators
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    In streaming mode the watermark bounds state: late rows beyond 2 hours
    are dropped and closed windows are evicted — the standard late-data
    policy.  Output: (window_start, event_type, n_events, total_value)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    agg = (
        src.groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def sessionize(events: DataFrame, gap: str = "30 minutes", streaming: bool = False) -> DataFrame:
    """Session windows per user (session_window — native, stateful in
    streaming).  Output: (user_id, session_start, session_end, n_events)."""
    src = events.withWatermark("ts", gap) if streaming else events
    agg = src.groupBy(
        F.session_window("ts", gap).alias("w"), F.col("user_id")
    ).agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def streaming_dedup(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: drop repeats of the key within the
    watermark horizon (bounded state; exact within the horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def read_event_stream(spark, source_dir: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (one file per
    micro-batch in tests via maxFilesPerTrigger)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
