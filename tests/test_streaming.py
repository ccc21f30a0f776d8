"""Structured Streaming tests: the batch-defined transformations run as real
streams (file source, availableNow trigger, memory sink) with watermarks."""

import os
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def event_files(spark, tmp_path):
    """Three parquet files simulating micro-batch arrivals."""
    src = str(tmp_path / "stream_src")
    rows = [
        (1, "2024-01-01 00:05:00", 10, "click", 1.0),
        (2, "2024-01-01 00:15:00", 10, "click", 2.0),
        (3, "2024-01-01 01:05:00", 11, "view", 3.0),
        (4, "2024-01-01 01:10:00", 11, "view", 4.0),
        (5, "2024-01-01 02:05:00", 10, "click", 5.0),
        (1, "2024-01-01 00:05:00", 10, "click", 1.0),  # duplicate event_id 1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for i in range(3):
        df.where(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    return src, df.schema


def _run_stream(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_stream_matches_batch(spark, event_files):
    from delta_sorter_spark.streaming.events import windowed_event_counts

    src, schema = event_files
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = windowed_event_counts(stream, streaming=True)
    # complete mode: windowed agg emits full result at the end
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(spark.read.schema(schema).parquet(src)).collect()
    }
    assert got == batch
    assert got[("2024-01-01 00:00:00", "click")] == 3  # incl. the duplicate row


def test_streaming_dedup_drops_repeats(spark, event_files):
    from delta_sorter_spark.streaming.events import streaming_dedup

    src, schema = event_files
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4, 5]  # duplicate event_id=1 dropped


def test_sessionize_stream_runs(spark, event_files):
    from delta_sorter_spark.streaming.events import sessionize

    src, schema = event_files
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = sessionize(stream, gap="30 minutes", streaming=True)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # user 10: events at 00:05 (x2, incl. duplicate), 00:15 (one session)
    # and 02:05 (another)
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[10]) == [1, 3]
    assert by_user[11] == [2]


def test_stateful_running_totals(spark, event_files):
    """applyInPandasWithState: state persists across micro-batches."""
    from delta_sorter_spark.streaming.events import running_user_totals

    src, schema = event_files
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM totals").collect()
    # final (largest) totals per user reflect ALL micro-batches
    final = {}
    for r in rows:
        final[r["user_id"]] = max(
            final.get(r["user_id"], 0), r["total_events"]
        )
    assert final[10] == 4  # 3 clicks + 1 duplicate row
    assert final[11] == 2


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics end-to-end: a row arriving in a later
    micro-batch with an event time already behind the watermark is DROPPED
    from the windowed aggregate, and only watermark-closed windows are
    emitted.  This is the late-data policy every 100 TB streaming rollup
    relies on to bound state."""
    from delta_sorter_spark.streaming.events import windowed_event_counts

    src = str(tmp_path / "late_src")

    def append(rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(src)

    # batch 1: two rows in the 00:00 window + one at 03:00 that pushes the
    # watermark (30 min delay) to 02:30, past the 00:00 window's end
    append(
        [
            (1, "2024-01-01 00:05:00", 10, "click", 1.0),
            (2, "2024-01-01 00:10:00", 10, "click", 1.0),
            (3, "2024-01-01 03:00:00", 10, "click", 1.0),
        ]
    )
    time.sleep(1.1)  # distinct mtimes: file source processes oldest first
    # batch 2: on-time row; at its end the 02:30 watermark evicts + emits
    # the 00:00 window (the watermark is a LOWER bound — eviction happens
    # the batch after it advances, so the late row must arrive after this)
    append([(5, "2024-01-01 03:05:00", 10, "click", 1.0)])
    time.sleep(1.1)
    # batch 3: event-time 00:20 is behind the watermark and its window's
    # state is gone -> dropped
    append([(4, "2024-01-01 00:20:00", 10, "click", 1.0)])

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = windowed_event_counts(stream, watermark="30 minutes", streaming=True)
    q = (
        out.writeStream.format("memory")
        .queryName("late_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM late_win").collect()
    }
    # the 00:00 window finalizes with 2 events (late event_id=4 dropped);
    # the 03:00 window is still open at final watermark 02:35 -> not emitted
    assert got == {("2024-01-01 00:00:00", "click"): 2}


def test_foreachbatch_incremental_rollup_sink(spark, event_files, tmp_path):
    """Streaming -> Delta rollup: foreachBatch merges each micro-batch's
    window partials into a rollup Delta table with the zone-map-pruned
    upsert — the streaming counterpart of operators/rollup.py."""
    from delta_sorter_spark.operators.dml import upsert
    from delta_sorter_spark.operators.rollup import ROLLUP_SCHEMA, _partials
    from delta_sorter_spark.sources.delta_table import DeltaTable

    src, schema = event_files
    rollup_path = str(tmp_path / "stream_rollup")
    rollup = DeltaTable.create(
        spark,
        rollup_path,
        spark.createDataFrame([], ROLLUP_SCHEMA).coalesce(1),
        stat_columns=["window_start"],
    )

    def merge_batch(batch_df, _batch_id):
        partial = _partials(batch_df, "1 hour")
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
        upsert(rollup, merged, keys)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rollup.to_df().collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _partials(spark.read.schema(schema).parquet(src), "1 hour").collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_stream_stream_interval_join_matches_batch(spark, event_files):
    """Stream-stream inner join (clicks x views within 1h, same user) — both
    sides watermarked so buffered state expires; result equals the batch
    form of the same function."""
    from delta_sorter_spark.streaming.events import stream_interval_join

    src, schema = event_files

    def sides(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        views = df.where(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        return clicks, views

    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    sc, sv = sides(s)
    joined = stream_interval_join(sc, sv, "c_user", "v_user", "c_ts", "v_ts", 3600)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["click_id"], r["view_id"]) for r in spark.sql("SELECT * FROM ssj").collect()
    )

    bc, bv = sides(spark.read.schema(schema).parquet(src))
    want = sorted(
        (r["click_id"], r["view_id"])
        for r in stream_interval_join(
            bc, bv, "c_user", "v_user", "c_ts", "v_ts", 3600
        ).collect()
    )
    assert got == want


def test_stream_static_enrichment(spark, event_files):
    """Stream-static broadcast join: every micro-batch row gets its dimension
    attributes; unmatched keys survive with NULLs (left join)."""
    from delta_sorter_spark.streaming.events import enrich_stream, read_event_stream

    src, schema = event_files
    dim = spark.createDataFrame(
        [(10, "gold"), (12, "silver")], "user_id long, tier string"
    )
    stream = read_event_stream(spark, src, schema)
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enriched").collect()
    assert len(rows) == 6  # all events kept, including the dup and user 11
    tiers = {r["user_id"]: r["tier"] for r in rows}
    assert tiers[10] == "gold" and tiers[11] is None


def test_sliding_windows_stream_matches_batch(spark, event_files):
    from delta_sorter_spark.streaming.events import sliding_window_counts

    src, schema = event_files
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = sliding_window_counts(stream, streaming=True)
    q = (
        out.writeStream.format("memory")
        .queryName("slide_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in sliding_window_counts(
            spark.read.schema(schema).parquet(src)
        ).collect()
    }
    assert got == batch
    # every event lands in exactly 2 windows: total weighted count doubles
    n_events = spark.read.schema(schema).parquet(src).count()
    assert sum(got.values()) == 2 * n_events


def test_idempotent_sink_skips_replayed_batch(spark, tmp_path):
    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.streaming.events import delta_append_sink

    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, spark.createDataFrame([(0, "seed")], "id long, v string"))
    sink = delta_append_sink(path, "job-1")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(b0, 0)
    sink(b0, 0)  # replay after simulated restart — must be a no-op
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 3
    sink(spark.createDataFrame([(3, "c")], "id long, v string"), 1)
    assert t.to_df().count() == 4
    # replaying an OLDER batch id is also skipped (watermark is max-seen)
    sink(b0, 0)
    assert t.to_df().count() == 4
    assert t.state().txns == {"job-1": 1}


def test_txn_watermarks_survive_checkpoint(spark, tmp_path):
    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.streaming.events import delta_append_sink

    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, spark.createDataFrame([(0,)], "id long"))
    sink = delta_append_sink(path, "app")
    for b in range(3):
        sink(spark.createDataFrame([(b + 1,)], "id long"), b)
    t = DeltaTable(spark, path)
    t.log.write_checkpoint()
    assert t.state().txns == {"app": 2}
    sink(spark.createDataFrame([(99,)], "id long"), 2)  # replay post-ckpt
    assert t.to_df().count() == 4


def test_restarted_stream_does_not_duplicate(spark, event_files, tmp_path):
    """End-to-end: run the same availableNow stream twice with FRESH
    checkpoints (worst-case restart — batch ids start over); the txn
    watermark, not the engine checkpoint, prevents duplicates."""
    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.streaming.events import delta_append_sink

    src, schema = event_files
    path = str(tmp_path / "sink_table")
    DeltaTable.create(
        spark, path, spark.read.schema(schema).parquet(src).limit(0)
    )
    n_src = spark.read.schema(schema).parquet(src).count()

    def run(ckpt):
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(delta_append_sink(path, "ingest"))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert DeltaTable(spark, path).to_df().count() == n_src
    run("ck2")  # restart from scratch: same batches, same ids -> skipped
    assert DeltaTable(spark, path).to_df().count() == n_src


def test_merge_sink_upserts_and_is_idempotent(spark, tmp_path):
    """CDC apply: per-batch MERGE keyed on id, latest-by-sequence collapse
    inside a batch, SetTransaction no-op on replay."""
    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.streaming.events import delta_merge_sink

    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.createDataFrame([(1, 0, "init"), (2, 0, "init")],
                              "id long, seq long, v string"),
    )
    sink = delta_merge_sink(
        path, ["id"], "cdc", sequence_col="seq",
        when_matched_update={"v": "s.v", "seq": "s.seq"},
    )
    # batch 0: update id=1 twice (seq 5 then 7 -> 7 wins), insert id=3
    b0 = spark.createDataFrame(
        [(1, 5, "old"), (1, 7, "new"), (3, 1, "ins")],
        "id long, seq long, v string",
    )
    sink(b0, 0)
    t = DeltaTable(spark, path)
    got = {r.id: (r.seq, r.v) for r in t.to_df().collect()}
    assert got == {1: (7, "new"), 2: (0, "init"), 3: (1, "ins")}

    v_after = t.log.latest_version()
    sink(b0, 0)  # replay: must not re-merge (no new commit)
    assert DeltaTable(spark, path).log.latest_version() == v_after

    sink(spark.createDataFrame([(2, 9, "upd")], "id long, seq long, v string"), 1)
    got = {r.id: (r.seq, r.v) for r in DeltaTable(spark, path).to_df().collect()}
    assert got[2] == (9, "upd")
