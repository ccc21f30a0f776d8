"""Incremental time-bucket rollup maintenance (continuous aggregates — the
"hypertable rollup" shape; TimescaleDB continuous aggregates / Delta CDF +
MERGE pattern, rebuilt on this engine's own log).

``incremental_rollup`` keeps a rollup Delta table (window_start, group key,
counts/sums) in sync with an events Delta table WITHOUT re-reading history:

1. diff the source log between the last-processed version and now — only
   files added with ``data_change=true`` count (compaction rewrites commit
   ``data_change=false``, lib.rs:818-828, so re-sorting history never
   re-aggregates it — the property that makes maintenance and rollups
   composable);
2. aggregate just those files into window partials (map-side combine: the
   shuffle carries one row per (window, key) per partition, not raw events);
3. merge partials into the rollup with the zone-map-pruned UPSERT — only
   rollup files holding affected windows are rewritten.

Cost per run is O(new data) + O(affected rollup files); a 100 TB history is
never touched again.  Sum/count aggregates are re-mergeable by addition —
the same decomposability Structured Streaming's state store relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_sorter_spark.operators.dml import upsert
from delta_sorter_spark.sources.delta_table import DeltaTable

ROLLUP_SCHEMA = (
    "window_start string, event_type string, n_events long, total_value double"
)


def changed_data_adds(source: DeltaTable, since_version: int) -> list:
    """Files made active after ``since_version`` that carry NEW data
    (data_change=true).  Compaction/optimize rewrites are excluded."""
    current = source.state()
    if since_version >= current.version:
        return []
    previous = source.state(version=since_version)
    prev_paths = {a.path for a in previous.adds}
    return [a for a in current.adds if a.path not in prev_paths and a.data_change]


def _partials(df, window_duration: str):
    agg = (
        df.groupBy(
            F.window("ts", window_duration).alias("w"), F.col("event_type")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def _signed_partials(changes, window_duration: str):
    """Window partials where deleted rows count NEGATIVE — the general
    incremental-view-maintenance delta for re-mergeable sum/count aggs."""
    # row-level CDC feeds (delta.enableChangeDataFeed) carry update images:
    # the preimage leaves the aggregate, the postimage enters it
    sign = F.when(
        F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1)
    ).otherwise(F.lit(1))
    agg = (
        changes.withColumn("__sign__", sign)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.sum("__sign__").alias("n_events"),
            F.sum(F.col("__sign__") * F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def incremental_rollup_cdc(
    source: DeltaTable,
    rollup: DeltaTable,
    since_version: int,
    window_duration: str = "1 hour",
) -> dict:
    """Like ``incremental_rollup`` but driven by the change feed
    (dml.table_changes), so UPDATEs and DELETEs — not just appends — keep
    the rollup exact: deletes enter the partials with negative sign and the
    merge nets them out.  Compaction still contributes nothing
    (dataChange=false commits are silent in the feed).

    Windows whose counts net to zero remain as explicit zero rows (the
    upsert has no delete branch); consumers filter ``n_events > 0``.

    Streaming twin: feed ``stream_df(change_feed=True)`` through
    ``foreachBatch`` and compute the signed partials INSIDE the batch
    function before the additive merge — a stateful streaming groupBy
    would emit cumulative totals in update mode, which double-count
    through an additive sink (pinned by
    tests/test_delta_source.py::test_change_feed_drives_incremental_rollup)."""
    from delta_sorter_spark.operators.dml import table_changes

    current_version = source.state().version
    if since_version >= current_version:
        return {"source_version": current_version, "merged_windows": 0}
    changes = table_changes(source, since_version, current_version)
    partial = _signed_partials(changes, window_duration)

    keys = ["window_start", "event_type"]
    existing = rollup.to_df()
    affected = partial.select(*keys).distinct()
    merged = (
        existing.join(affected, keys)
        .unionByName(partial)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    n_windows = merged.count()
    upsert(rollup, merged, keys)
    return {"source_version": current_version, "merged_windows": n_windows}


def incremental_rollup(
    source: DeltaTable,
    rollup: DeltaTable,
    since_version: int,
    window_duration: str = "1 hour",
) -> dict:
    """Fold source commits after ``since_version`` into the rollup table.

    Returns {"source_version", "new_files", "merged_windows"} —
    persist ``source_version`` as the next run's ``since_version`` (the
    caller owns checkpointing; a Delta commit of the watermark itself works).
    """
    new_adds = changed_data_adds(source, since_version)
    current_version = source.state().version
    if not new_adds:
        return {
            "source_version": current_version,
            "new_files": 0,
            "merged_windows": 0,
        }

    delta_df = source.to_df(adds=new_adds)
    partial = _partials(delta_df, window_duration)

    existing = rollup.to_df()
    keys = ["window_start", "event_type"]
    affected = partial.select(*keys).distinct()
    merged = (
        existing.join(affected, keys)  # only affected windows leave the rollup
        .unionByName(partial)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    n_windows = merged.count()
    upsert(rollup, merged, keys)
    return {
        "source_version": current_version,
        "new_files": len(new_adds),
        "merged_windows": n_windows,
    }
