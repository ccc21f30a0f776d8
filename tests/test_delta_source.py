"""Delta table as a readStream source (Python Data Source API): initial
snapshot + version tail, append-only enforcement, skipChangeCommits,
deletion vectors, partition columns, column mapping."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(DeltaStreamDataSource)
    return spark


def _drain(spark, path, out, ck, **opts):
    reader = spark.readStream.format("delta_sorter").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_snapshot_then_tail(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    t = DeltaTable(spark, path)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, path, out, ck)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]

    t.append(spark.createDataFrame([(4, "d"), (5, "e")], "id long, v string"))
    got = _drain(spark, path, out, ck)  # same checkpoint: only new rows land
    assert sorted(r.id for r in got.collect()) == [1, 2, 3, 4, 5]


def test_starting_version_skips_snapshot(registered, tmp_path):
    """startingVersion=N begins the stream AT commit N — no initial
    snapshot batch (Delta semantics)."""
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    t = DeltaTable(spark, path)
    v_before = t.state().version
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, path, out, ck, startingVersion=str(v_before + 1))
    assert sorted(r.id for r in got.collect()) == [3]


def test_starting_version_latest_feeds_only_new_commits(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    t = DeltaTable(spark, path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # reader resolves "latest" at init: the existing row never feeds
    got = _drain(spark, path, out, ck, startingVersion="latest")
    assert got.count() == 0
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    got = _drain(spark, path, out, ck, startingVersion="latest")
    assert sorted(r.id for r in got.collect()) == [9]


def test_starting_version_zero_cdf_feeds_per_commit(registered, tmp_path):
    """startingVersion=0 + readChangeFeed: the whole history feeds as
    per-commit changes (versions tagged), not as one snapshot at the tip."""
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    t = DeltaTable(spark, path)
    v0 = t.state().version
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    v1 = t.state().version
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(
        spark, path, out, ck, startingVersion="0", readChangeFeed="true"
    )
    rows = sorted((r.id, r._change_type, r._commit_version) for r in got.collect())
    assert rows == [(1, "insert", v0), (2, "insert", v1)]


def test_batch_read_matches_to_df(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    DeltaTable.create(spark, path, df, partition_columns=["k"])
    via_source = (
        spark.read.format("delta_sorter").option("path", path).load()
    )
    expect = DeltaTable(spark, path).to_df()
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # partition columns come back typed from directory values
    assert dict(via_source.dtypes)["k"] == "bigint"


def test_change_commit_fails_stream_unless_skipped(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.createDataFrame([(i, "x") for i in range(10)], "id long, v string"),
    )
    t = DeltaTable(spark, path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, path, out, ck)
    assert got.count() == 10

    from delta_sorter_spark.operators.dml import delete_where

    delete_where(t, "id >= 8")  # rewrite: remove with dataChange=true
    t.append(spark.createDataFrame([(100, "y")], "id long, v string"))

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain(spark, path, out, ck)

    # fresh checkpoint with skipChangeCommits: delete commit skipped, the
    # append still arrives; snapshot reflects the delete (8 rows) + append
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    got = _drain(spark, path, out2, ck2, skipChangeCommits="true")
    ids = sorted(r.id for r in got.collect())
    assert ids == [0, 1, 2, 3, 4, 5, 6, 7, 100]


def test_snapshot_applies_deletion_vectors(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.createDataFrame(
            [(i, "x") for i in range(10)], "id long, v string"
        ).coalesce(1),
    )
    t = DeltaTable(spark, path)
    from delta_sorter_spark.operators.dml import delete_where_dv

    delete_where_dv(t, "id % 3 = 0")  # merge-on-read: DV sidecar, no rewrite
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, path, out, ck, skipChangeCommits="true")
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(10) if i % 3 != 0
    ]


def test_renamed_column_streams_via_physical_name(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    t = DeltaTable(spark, path)
    t.rename_column("v", "label")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, path, out, ck)
    assert got.columns == ["id", "label"]
    assert got.collect()[0]["label"] == "a"


def test_end_to_end_delta_to_delta_pipeline(registered, tmp_path):
    """Flagship streaming composition: Delta source -> watermarked tumbling
    window aggregate -> exactly-once Delta sink (update-mode foreachBatch
    MERGE).  Appends arrive across two stream runs sharing one checkpoint;
    final per-window counts must equal the batch recompute."""
    spark = registered
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    rows1 = [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:15:00"),
             (3, "2024-01-01 01:10:00")]
    rows2 = [(4, "2024-01-01 01:20:00"), (5, "2024-01-01 02:30:00")]
    schema = "event_id long, ts string"

    def mk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    DeltaTable.create(spark, src_path, mk(rows1))
    DeltaTable.create(
        spark, dst_path,
        spark.createDataFrame(
            [], "window_start timestamp, n long"
        ),
    )
    from delta_sorter_spark.streaming.events import delta_merge_sink

    sink = delta_merge_sink(
        dst_path, ["window_start"], "agg",
        when_matched_update={"n": "s.n"},
    )

    def run():
        agg = (
            spark.readStream.format("delta_sorter").option("path", src_path)
            .load()
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    DeltaTable(spark, src_path).append(mk(rows2))
    run()

    got = {
        r.window_start.strftime("%H:%M"): r.n
        for r in DeltaTable(spark, dst_path).to_df().collect()
    }
    assert got == {"00:00": 2, "01:00": 2, "02:00": 1}


def test_user_column_named_pos_reads_plainly(registered, tmp_path):
    """A table that legitimately owns __pos__ / __delta_file__ columns must
    read them as ordinary data (no silent positional mode, DVs still apply);
    synthesizing over them via withPositions must refuse loudly."""
    spark = registered
    path = str(tmp_path / "poscol")
    df = spark.createDataFrame(
        [(1, 10, "f1"), (2, 20, "f2")], "id long, __pos__ long, __delta_file__ string"
    )
    DeltaTable.create(spark, path, df.coalesce(1))
    got = {
        r["id"]: (r["__pos__"], r["__delta_file__"])
        for r in spark.read.format("delta_sorter")
        .option("path", path)
        .load()
        .collect()
    }
    assert got == {1: (10, "f1"), 2: (20, "f2")}

    with pytest.raises(Exception, match="already has column"):
        spark.read.format("delta_sorter").option("path", path).option(
            "withPositions", "true"
        ).load().collect()


def test_files_option_accepts_bare_path_strings(registered, tmp_path):
    """Legacy callers (or persisted plans) may pass the ``files`` option as a
    JSON list of bare path strings rather than spec objects; they read as
    {path: s}, and malformed entries fail with a clear ValueError naming
    the spec format."""
    import json

    spark = registered
    path = str(tmp_path / "bare")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1),
    )
    rel_paths = [a.path for a in t.state().adds]
    got = (
        spark.read.format("delta_sorter")
        .option("path", path)
        .option("files", json.dumps(rel_paths))  # bare strings, legacy form
        .load()
        .collect()
    )
    assert sorted((r["id"], r["v"]) for r in got) == [(1, "a"), (2, "b")]

    with pytest.raises(Exception, match="spec objects"):
        (
            spark.read.format("delta_sorter")
            .option("path", path)
            .option("files", json.dumps([{"no_path_key": 1}]))
            .load()
            .collect()
        )


def test_stream_where_prunes_files_and_filters_rows(registered, tmp_path):
    """stream_df(where=...): zone maps prune whole files inside the source's
    planner (snapshot AND tail batches), and the predicate still applies
    exactly to rows.  The planner-side pruning is observed directly via
    DeltaStreamReader.partitions."""
    import json as _json

    from delta_sorter_spark.streaming.delta_source import DeltaStreamReader

    spark = registered
    path = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    DeltaTable.create(
        spark, path, df.repartitionByRange(8, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    t = DeltaTable(spark, path)

    # plan-level: initial snapshot schedules only zone-map survivors
    rd = DeltaStreamReader({"path": path, "where": "k BETWEEN 100 AND 120"})
    parts = rd.partitions({"version": -1}, {"version": t.log.latest_version()})
    assert len(parts) == 1  # 400 rows / 8 range files -> one overlapping file

    # tail batches prune too: one in-range append, one fully out-of-range
    v0 = t.log.latest_version()
    t.append(
        spark.createDataFrame([(110, 1), (111, 2)], "k long, v long"),
    )
    t.append(
        spark.createDataFrame([(9000, 1), (9001, 2)], "k long, v long"),
    )
    parts = rd.partitions({"version": v0}, {"version": t.log.latest_version()})
    assert len(parts) >= 1
    assert all("9000" not in _json.dumps(p.file_path) for p in parts)

    # end-to-end through the public helper: rows are EXACT
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        t.stream_df(where="k BETWEEN 100 AND 120")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == sorted(list(range(100, 121)) + [110, 111])


# ---------------------------------------------------------------------------
# readChangeFeed: streaming change feed (table_changes semantics per
# micro-batch — insert/delete rows tagged _change_type/_commit_version)
# ---------------------------------------------------------------------------


def _drain_cdf(spark, path, out, ck):
    q = (
        spark.readStream.format("delta_sorter")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_change_feed_stream_matches_batch_table_changes(registered, tmp_path):
    """After the initial snapshot, every micro-batch's rows equal the batch
    change feed of its version range — copy-on-write DELETE, merge-on-read
    UPDATE (DV delta), and append all covered."""
    from delta_sorter_spark.operators.dml import (
        delete_where,
        table_changes,
        update_where_dv,
    )

    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.range(0, 40).select(
            F.col("id"), (F.col("id") % 4).alias("v")
        ).coalesce(2),
    )
    t = DeltaTable(spark, path)
    v0 = t.log.latest_version()

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain_cdf(spark, path, out, ck)  # initial snapshot: all inserts
    rows = got.collect()
    assert len(rows) == 40
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["_commit_version"] for r in rows} == {v0}

    delete_where(t, "id % 4 = 3")                      # copy-on-write
    update_where_dv(t, "id % 4 = 1", {"v": "99"})      # merge-on-read
    t.append(spark.createDataFrame([(100, 7)], "id long, v long"))
    v1 = t.log.latest_version()

    got = _drain_cdf(spark, path, out, ck)  # same checkpoint: tail only
    tail = [
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in got.collect()
        if r["_commit_version"] > v0
    ]
    expected = [
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in table_changes(t, v0, v1).collect()
    ]
    assert sorted(tail) == sorted(expected)


def test_change_feed_multiset_equivalence(registered, tmp_path):
    """Applying the whole feed (inserts - deletes) reproduces the final
    table — the contract incremental consumers rely on."""
    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where_dv, upsert

    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.range(0, 30).select(F.col("id"), (F.col("id") * 2).alias("v")),
    )
    t = DeltaTable(spark, path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_cdf(spark, path, out, ck)

    delete_where_dv(t, "id < 5")
    upsert(
        t,
        spark.createDataFrame(
            [(7, 700), (300, 600)], "id long, v long"
        ),
        ["id"],
    )
    # compaction must emit NOTHING into the feed
    compact(path, sort_columns=["id"], spark=spark)

    feed = _drain_cdf(spark, path, out, ck)
    applied = (
        feed.groupBy("id", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
        .where(F.col("n") != 0)
    )
    assert {r["n"] for r in applied.collect()} == {1}
    got = sorted((r["id"], r["v"]) for r in applied.collect())
    want = sorted(
        (r["id"], r["v"])
        for r in DeltaTable(spark, path).to_df().collect()
    )
    assert got == want


def test_change_feed_option_conflicts(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(1, 2)], "id long, v long")
    )
    from delta_sorter_spark.streaming.delta_source import _DeltaSourceCore

    # readStream.load() defers planning; validate at the core directly
    for bad in (
        {"skipChangeCommits": "true"},
        {"withFilePath": "true"},
        {"where": "id > 0"},
    ):
        with pytest.raises(ValueError, match="readChangeFeed"):
            _DeltaSourceCore({"path": path, "readChangeFeed": "true", **bad})
    with pytest.raises(Exception, match="readChangeFeed"):
        (
            spark.read.format("delta_sorter")
            .option("path", path)
            .option("readChangeFeed", "true")
            .load()
            .collect()
        )


def test_change_feed_refuses_user_cdf_column(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.createDataFrame([(1, "x")], "id long, _change_type string"),
    )
    from delta_sorter_spark.streaming.delta_source import _DeltaSourceCore

    with pytest.raises(ValueError, match="_change_type"):
        _DeltaSourceCore({"path": path, "readChangeFeed": "true"})


def test_stream_df_change_feed_helper(registered, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where

    spark = registered
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark, path,
        spark.range(0, 10).select(F.col("id"), (F.col("id") * 3).alias("v")),
    )
    t = DeltaTable(spark, path)
    delete_where(t, "id >= 8")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        t.stream_df(change_feed=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # snapshot-at-latest: the 8 survivors as inserts, no deletes
    assert got.count() == 8
    assert {r["_change_type"] for r in got.collect()} == {"insert"}
    with pytest.raises(ValueError, match="change_feed"):
        t.stream_df(change_feed=True, where="id > 1")


def test_change_feed_drives_incremental_rollup(registered, tmp_path):
    """Streaming incremental view maintenance end to end: the change-feed
    stream feeds signed window partials (deletes count negative) through
    the exactly-once additive merge sink; after an append AND a
    copy-on-write delete the maintained rollup equals the batch
    recompute of the final table."""
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.operators.rollup import _signed_partials
    from delta_sorter_spark.streaming.events import delta_merge_sink

    spark = registered
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    schema = "ts string, event_type string, value double"
    rows1 = [
        ("2024-01-01 00:05:00", "a", 1.0),
        ("2024-01-01 00:15:00", "b", 2.0),
        ("2024-01-01 01:10:00", "a", 3.0),
    ]
    rows2 = [("2024-01-01 00:40:00", "a", 5.0)]

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    DeltaTable.create(spark, src, mk(rows1))
    DeltaTable.create(
        spark, dst,
        spark.createDataFrame(
            [],
            "window_start string, event_type string,"
            " n_events long, total_value double",
        ),
    )
    sink = delta_merge_sink(
        dst, ["window_start", "event_type"], "cdf-ivm",
        when_matched_update={
            "n_events": "t.n_events + s.n_events",
            "total_value": "t.total_value + s.total_value",
        },
    )

    def apply(batch_df, batch_id):
        # aggregate INSIDE foreachBatch: per-batch deltas for the additive
        # merge (a stateful streaming groupBy would emit CUMULATIVE totals
        # in update mode — wrong input for an additive sink)
        sink(_signed_partials(batch_df, "1 hour"), batch_id)

    def run():
        changes = DeltaTable(spark, src).stream_df(change_feed=True)
        q = (
            changes.writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    t = DeltaTable(spark, src)
    delete_where(t, "event_type = 'b'")  # copy-on-write: feeds deletes
    t.append(mk(rows2))
    run()

    got = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in DeltaTable(spark, dst).to_df().where("n_events > 0").collect()
    )
    want = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in _signed_partials(
            DeltaTable(spark, src).to_df().withColumn(
                "_change_type", F.lit("insert")
            ),
            "1 hour",
        ).collect()
    )
    assert got == want


def test_extra_columns_passthrough_and_clash(registered, tmp_path):
    """extraColumns reads out-of-schema physical columns (NULL where a
    file lacks them — the materialized row-tracking read path) and refuses
    names already in the table schema."""
    import json

    from pyspark.sql import types as T

    spark = registered
    path = str(tmp_path / "xc")
    DeltaTable.create(
        spark, path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
    )
    extra = json.dumps(
        T.StructType([T.StructField("_mat_rid", T.LongType(), True)]).jsonValue()
    )
    df = (
        spark.read.format("delta_sorter")
        .option("path", path)
        .option("extraColumns", extra)
        .load()
    )
    assert df.schema.names == ["id", "v", "_mat_rid"]
    rows = df.collect()
    assert len(rows) == 2 and all(r["_mat_rid"] is None for r in rows)

    clash = json.dumps(
        T.StructType([T.StructField("v", T.StringType(), True)]).jsonValue()
    )
    with pytest.raises(Exception, match="extraColumns"):
        spark.read.format("delta_sorter").option("path", path).option(
            "extraColumns", clash
        ).load().collect()


def test_max_files_per_trigger_bounds_batches(registered, tmp_path):
    """Admission control: with maxFilesPerTrigger the reader hands out
    version-granular offsets whose cumulative data-add file count stays
    within the cap (at least one commit per trigger), and the union of
    batches covers the whole log.  Driven through the reader's own
    trigger protocol (initialOffset -> latestOffset -> partitions ->
    commit), the same sequence Spark runs."""
    from delta_sorter_spark.streaming.delta_source import DeltaStreamReader

    spark = registered
    path = str(tmp_path / "adm")
    base = spark.range(10).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, path, base.coalesce(1))
    for i in range(6):  # 6 append commits x 2 files each
        tbl.append(
            spark.range(10 * (i + 1), 10 * (i + 2))
            .select(F.col("id").alias("k"))
            .repartition(2)
        )

    r = DeltaStreamReader({"path": path, "maxFilesPerTrigger": "3"})
    start = r.initialOffset()
    assert start == {"version": -1}
    # initial snapshot batch: uncapped semantics are "snapshot at the
    # admitted version"; with files-per-commit counting the first batch
    # admits versions 0..N within the cap
    offsets = [start]
    seen_parts = 0
    for _ in range(20):
        end = r.latestOffset()
        if end == offsets[-1]:
            break
        parts = r.partitions(offsets[-1], end)
        seen_parts += len(parts)
        r.commit(end)
        offsets.append(end)
    assert offsets[-1]["version"] == tbl.log.latest_version()
    # every non-snapshot batch admitted at most 3 files' worth of commits
    # (commit granularity: a 2-file append can straddle, so <= 4 here),
    # and there were several batches, not one table-sized batch
    assert len(offsets) >= 4
    for a, b in zip(offsets[1:], offsets[2:]):
        sv, ev = a["version"], b["version"]
        files = 0
        for v in range(sv + 1, ev + 1):
            files += sum(
                1
                for act in tbl.log.commit_actions(v)
                if "add" in act and act["add"].get("dataChange", True)
            )
        assert files <= 4  # cap 3 + one straddling 2-file commit
    # uncapped reader: one batch to the tip
    r2 = DeltaStreamReader({"path": path})
    s2 = r2.initialOffset()
    assert r2.latestOffset() == {"version": tbl.log.latest_version()}

    # an oversized single commit still flows (at least one version)
    tbl.append(spark.range(100, 140).select(F.col("id").alias("k")).repartition(8))
    end = r.latestOffset()
    assert end["version"] == tbl.log.latest_version()


def test_max_bytes_per_trigger_bounds_batches(registered, tmp_path):
    """Byte-based admission control, same protocol drive as the files cap;
    whichever set cap fills first wins when combined."""
    from delta_sorter_spark.streaming.delta_source import DeltaStreamReader

    spark = registered
    path = str(tmp_path / "admb")
    tbl = DeltaTable.create(
        spark, path, spark.range(10).select(F.col("id").alias("k")).coalesce(1)
    )
    sizes = {}
    for i in range(5):
        tbl.append(
            spark.range(100 * (i + 1), 100 * (i + 2))
            .select(F.col("id").alias("k"))
            .coalesce(1)
        )
    per_commit = [
        sum(
            int(a["add"].get("size", 0))
            for a in tbl.log.commit_actions(v)
            if "add" in a
        )
        for v in range(1, 6)
    ]
    cap = per_commit[0] + per_commit[1]  # ~2 commits per trigger

    r = DeltaStreamReader({"path": path, "maxBytesPerTrigger": str(cap)})
    offsets = [r.initialOffset()]
    for _ in range(10):
        end = r.latestOffset()
        if end == offsets[-1]:
            break
        r.partitions(offsets[-1], end)
        r.commit(end)
        offsets.append(end)
    assert offsets[-1]["version"] == tbl.log.latest_version()
    # the post-snapshot catch-up took multiple bounded steps
    steps = [b["version"] - a["version"] for a, b in zip(offsets[1:], offsets[2:])]
    assert steps and all(s <= 2 for s in steps)

    # bad option value rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="maxBytesPerTrigger"):
        DeltaStreamReader({"path": path, "maxBytesPerTrigger": "0"})


# ---------------------------------------------------------------------------
# writeStream.format("delta_sorter"): the native append sink (executors
# stage parquet, the driver-side commit moves files + writes ONE log commit
# per micro-batch through the pure-Python log plane)
# ---------------------------------------------------------------------------


def _sink_drain(spark, src_dir, table_path, ck, schema, **opts):
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    writer = reader.writeStream.format("delta_sorter").option("path", table_path)
    for k, v in opts.items():
        writer = writer.option(k, v)
    q = (
        writer.option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_native_sink_appends_with_stats(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "src")
    df = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    df.repartition(2).write.parquet(src)
    table_path = str(tmp_path / "t")
    tbl = DeltaTable.create(
        spark, table_path, df.limit(0).coalesce(1), stat_columns=["k"]
    )
    _sink_drain(spark, src, table_path, str(tmp_path / "ck"), df.schema)
    got = sorted((r["k"], r["v"]) for r in tbl.to_df().collect())
    assert got == [(i, 2 * i) for i in range(40)]
    # write-time stats landed (zone maps + keyStats attestation)
    fresh = [
        a for a in tbl.state().adds
        if a.stats and a.stats.get("numRecords", 0) > 0
    ]
    assert fresh and all("k" in a.stats["minValues"] for a in fresh)
    assert all("keyStats" in a.stats for a in fresh)
    h = tbl.log.history()[0]
    assert h["operation"] == "STREAMING UPDATE"


def test_native_sink_txn_exactly_once_across_checkpoint_loss(registered, tmp_path):
    """txnAppId: batch ids restart at 0 after checkpoint loss; the recorded
    SetTransaction drops the redelivered batches before any log write."""
    spark = registered
    src = str(tmp_path / "src")
    df = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    df.coalesce(1).write.parquet(src)
    table_path = str(tmp_path / "t")
    tbl = DeltaTable.create(spark, table_path, df.limit(0).coalesce(1))
    _sink_drain(spark, src, table_path, str(tmp_path / "ck1"), df.schema,
                txnAppId="sinkq")
    assert tbl.to_df().count() == 10
    # fresh checkpoint, same source, same txnAppId: batch 0 redelivers
    _sink_drain(spark, src, table_path, str(tmp_path / "ck2"), df.schema,
                txnAppId="sinkq")
    assert tbl.to_df().count() == 10  # dropped, not doubled


def test_native_sink_refuses_partitioned_tables(registered, tmp_path):
    spark = registered
    df = spark.range(10).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    table_path = str(tmp_path / "t")
    DeltaTable.create(spark, table_path, df.coalesce(1), partition_columns=["p"])
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    with pytest.raises(Exception, match="partitioned"):
        _sink_drain(
            spark, src, table_path, str(tmp_path / "ck"),
            spark.read.parquet(src).schema,
        )
