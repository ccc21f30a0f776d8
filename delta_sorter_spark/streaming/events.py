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

from pyspark.sql import DataFrame, Window
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


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper_s: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within ``[left_ts, left_ts +
    upper_s]`` for equal keys.  Both sides carry a watermark and the join
    condition bounds event-time distance, which is what lets Spark expire
    buffered rows — without both, stream-stream join state grows forever.
    Caller renames columns so the two sides are disjoint.  The same function
    works in batch mode (watermarks are no-ops on batch frames), giving the
    batch/stream parity the oracle checks."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return lw.join(rw, cond)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a dimension table.

    The static side is re-read per micro-batch (so a Delta dim table picks
    up slowly-changing updates between batches) and broadcast — the stream
    side never shuffles and no join state accumulates, which is why this is
    the default enrichment shape at any scale.  Left join keeps events whose
    key has no dimension row (attribute columns NULL) rather than silently
    dropping them."""
    return events.join(F.broadcast(dim), on=key, how=how)


def read_event_stream(spark, source_dir: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (one file per
    micro-batch in tests via maxFilesPerTrigger)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def running_user_totals(
    events: DataFrame, watermark: str = "1 hour", timeout_minutes: int = 60
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: per-user
    running totals that persist across micro-batches and expire after an idle
    timeout (bounded state, the 100 TB requirement for unbounded streams).

    Emits one row per user per micro-batch in which the user appeared:
    (user_id, total_events, total_value).  This is the pattern for stateful
    logic Spark's built-in aggregations can't express (custom expiry,
    arbitrary per-key state machines); state is per-key and Arrow-batched.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("total_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("v", DoubleType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_events": [n], "total_value": [v]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Hopping (sliding) window counts + value sums per event_type — each
    event lands in duration/slide windows (2 here).  Same shape as
    windowed_event_counts but with overlap; in streaming mode the watermark
    bounds the number of open overlapping windows.  Output:
    (window_start, event_type, n_events, total_value)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    agg = src.groupBy(
        F.window("ts", window_duration, slide).alias("w"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def delta_append_sink(table_path: str, app_id: str):
    """Exactly-once foreachBatch sink into a Delta table: each micro-batch
    append carries (app_id, batch_id) as a SetTransaction, so a batch
    replayed after a restart (same batch_id) is a metadata no-op — the
    Delta idempotent-sink pattern.  Usage:

        q = (df.writeStream.foreachBatch(delta_append_sink(path, "job-1"))
               .option("checkpointLocation", ckpt).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from delta_sorter_spark.sources.delta_table import DeltaTable

        DeltaTable(batch_df.sparkSession, table_path).append(
            batch_df, txn_app_id=app_id, txn_version=int(batch_id)
        )

    return write_batch


def delta_merge_sink(
    table_path: str,
    keys: list[str],
    app_id: str,
    sequence_col: str | None = None,
    **merge_kwargs,
):
    """Exactly-once CDC apply: each micro-batch MERGEs into a Delta table
    keyed on ``keys``, carrying (app_id, batch_id) as a SetTransaction so a
    replayed batch is a no-op before any compute.  ``sequence_col`` (e.g. a
    CDC LSN or event timestamp) collapses multiple updates for one key
    inside a batch to the LATEST row (ties broken by the struct compare of
    remaining columns — deterministic), which is what makes the per-batch
    MERGE unambiguous.  Remaining ``merge_kwargs`` pass through to
    ``operators.dml.merge`` (update maps, delete conditions, ...).

        q = (changes.writeStream
               .foreachBatch(delta_merge_sink(path, ["id"], "cdc-apply",
                                              sequence_col="seq"))
               .option("checkpointLocation", ckpt).start())
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from delta_sorter_spark.operators.dml import merge
        from delta_sorter_spark.sources.delta_table import DeltaTable

        src = batch_df
        if sequence_col is not None:
            others = F.struct(
                *[c for c in src.columns if c not in (*keys, sequence_col)]
            )
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col(sequence_col).desc(), others.desc())
            )
            src = (
                src.withColumn("__rn__", F.row_number().over(w))
                .where(F.col("__rn__") == 1)
                .drop("__rn__")
            )
        merge(
            DeltaTable(batch_df.sparkSession, table_path),
            src,
            keys,
            txn_app_id=app_id,
            txn_version=int(batch_id),
            **merge_kwargs,
        )

    return apply_batch
