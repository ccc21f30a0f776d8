"""Row-level change data feed (delta.enableChangeDataFeed -> protocol
``cdc`` actions + ``_change_data/`` files).

The default remains file-level synthesis (table_changes derives
insert/delete from add/remove actions — multiset-equivalent).  With the
property set, DML verbs MATERIALIZE change rows at write time and the
feed returns full fidelity: update_preimage / update_postimage instead
of whole-file delete+insert.  Delta protocol "Add CDC File" section;
reference parity note: the reference engine has no change feed at all
(SURVEY §2.9) — this is extension surface built on the public protocol.
"""

import os

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.dml import (
    delete_where,
    delete_where_dv,
    table_changes,
    update_where,
    update_where_dv,
)
from delta_sorter_spark.sources.delta_table import DeltaTable


def _cdf_table(spark, path, rows=None, partition_columns=None):
    df = spark.createDataFrame(
        rows
        or [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
        "id long, grp string, amt double",
    )
    tbl = DeltaTable.create(
        spark, path, df.coalesce(1),
        partition_columns=partition_columns or [],
        stat_columns=["id"],
    )
    tbl.set_table_properties({"delta.enableChangeDataFeed": "true"})
    return tbl


def _feed(tbl, from_version):
    return sorted(
        (
            r["id"],
            r["grp"],
            r["amt"],
            r["_change_type"],
            r["_commit_version"],
        )
        for r in table_changes(tbl, from_version).collect()
    )


def test_enable_cdf_declares_writer_feature(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    proto = tbl.state().protocol
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])
    assert proto["minWriterVersion"] >= 7


def test_update_where_feeds_pre_and_post_images(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    update_where(tbl, "grp = 'a'", {"amt": "amt + 1"})
    v1 = tbl.state().version
    got = _feed(tbl, v0)
    assert got == [
        (1, "a", 10.0, "update_preimage", v1),
        (1, "a", 11.0, "update_postimage", v1),
        (2, "a", 20.0, "update_preimage", v1),
        (2, "a", 21.0, "update_postimage", v1),
    ]
    # the cdc files exist under _change_data/ and are referenced by the log
    cdc_dir = os.path.join(tbl.table_path, "_change_data")
    assert os.path.isdir(cdc_dir)


def test_delete_where_feeds_row_level_deletes(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    delete_where(tbl, "id = 3")
    v1 = tbl.state().version
    # file-level synthesis would feed ALL four rows of the rewritten file
    # as delete+insert; row-level CDC feeds exactly the one deleted row
    assert _feed(tbl, v0) == [(3, "b", 30.0, "delete", v1)]


def test_dv_delete_feeds_only_new_deletes(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    delete_where_dv(tbl, "id = 1")
    v1 = tbl.state().version
    delete_where_dv(tbl, "id <= 2")  # id=1 already gone: only id=2 is new
    v2 = tbl.state().version
    assert _feed(tbl, v1 - 1) == [
        (1, "a", 10.0, "delete", v1),
        (2, "a", 20.0, "delete", v2),
    ]


def test_dv_update_feeds_images(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    update_where_dv(tbl, "id = 4", {"amt": "amt * 2"})
    v1 = tbl.state().version
    assert _feed(tbl, v0) == [
        (4, "b", 40.0, "update_preimage", v1),
        (4, "b", 80.0, "update_postimage", v1),
    ]


def test_merge_feeds_clause_level_changes(spark, tmp_path):
    """Copy-on-write MERGE: matched-update rows feed pre/post images,
    matched-delete rows feed deletes, unmatched-source rows feed inserts;
    matched rows no clause touches emit nothing."""
    from delta_sorter_spark.operators.dml import merge

    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    src = spark.createDataFrame(
        [(1, "a", 100.0), (3, "b", 0.0), (9, "z", 90.0)],
        "id long, grp string, amt double",
    )
    merge(
        tbl, src, ["id"],
        when_matched_update={"amt": "s.amt"},
        when_matched_delete="s.amt = 0.0",
    )
    v1 = tbl.state().version
    assert _feed(tbl, v0) == [
        (1, "a", 10.0, "update_preimage", v1),
        (1, "a", 100.0, "update_postimage", v1),
        (3, "b", 30.0, "delete", v1),
        (9, "z", 90.0, "insert", v1),
    ]


def test_merge_dv_feeds_clause_level_changes(spark, tmp_path):
    """Merge-on-read MERGE: same clause-level feed through the DV path."""
    from delta_sorter_spark.operators.dml import merge_dv

    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    src = spark.createDataFrame(
        [(2, "a", 200.0), (4, "b", 0.0), (8, "z", 80.0)],
        "id long, grp string, amt double",
    )
    merge_dv(
        tbl, src, ["id"],
        when_matched_update={"amt": "s.amt"},
        when_matched_delete="s.amt = 0.0",
    )
    v1 = tbl.state().version
    assert _feed(tbl, v0) == [
        (2, "a", 20.0, "update_preimage", v1),
        (2, "a", 200.0, "update_postimage", v1),
        (4, "b", 40.0, "delete", v1),
        (8, "z", 80.0, "insert", v1),
    ]


def test_upsert_feeds_replacements_as_updates(spark, tmp_path):
    from delta_sorter_spark.operators.dml import upsert

    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    src = spark.createDataFrame(
        [(1, "a", 11.0), (7, "c", 70.0)], "id long, grp string, amt double"
    )
    upsert(tbl, src, ["id"])
    v1 = tbl.state().version
    assert _feed(tbl, v0) == [
        (1, "a", 10.0, "update_preimage", v1),
        (1, "a", 11.0, "update_postimage", v1),
        (7, "c", 70.0, "insert", v1),
    ]


def test_append_still_synthesizes_inserts(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    tbl.append(
        spark.createDataFrame([(9, "c", 90.0)], "id long, grp string, amt double")
    )
    v1 = tbl.state().version
    assert _feed(tbl, v0) == [(9, "c", 90.0, "insert", v1)]


def test_partitioned_cdc_files_carry_partition_values(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"), partition_columns=["grp"])
    v0 = tbl.state().version
    update_where(tbl, "id = 2", {"amt": "0.0"})
    v1 = tbl.state().version
    got = _feed(tbl, v0)
    assert got == [
        (2, "a", 0.0, "update_postimage", v1),
        (2, "a", 20.0, "update_preimage", v1),
    ]
    # the cdc action carries Hive-style partitionValues
    cdc_actions = [
        a["cdc"] for a in tbl.log.commit_actions(v1) if "cdc" in a
    ]
    assert cdc_actions and all(
        a["partitionValues"] == {"grp": "a"} for a in cdc_actions
    )


def test_cdc_after_column_rename(spark, tmp_path):
    """Column mapping: cdc files written before AND after a RENAME COLUMN
    carry the original physical name; the feed returns logical names."""
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    update_where(tbl, "id = 1", {"amt": "1.5"})
    tbl.rename_column("amt", "amount")
    update_where(tbl, "id = 2", {"amount": "2.5"})
    rows = sorted(
        (r["id"], r["amount"], r["_change_type"])
        for r in table_changes(tbl, v0).collect()
    )
    assert rows == [
        (1, 1.5, "update_postimage"),
        (1, 10.0, "update_preimage"),
        (2, 2.5, "update_postimage"),
        (2, 20.0, "update_preimage"),
    ]


def test_vacuum_protects_live_cdc_files(spark, tmp_path):
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    update_where(tbl, "id = 1", {"amt": "amt + 5"})
    doomed = tbl.vacuum(dry_run=True, retention_seconds=0)
    assert not any(p.startswith("_change_data/") for p in doomed)
    tbl.vacuum(retention_seconds=0)
    # feed still readable after vacuum
    assert len(_feed(tbl, v0)) == 2


def test_feed_multiset_equivalence_with_cdc(spark, tmp_path):
    """old + inserts/postimages - deletes/preimages == new snapshot, same
    invariant the synthesized feed guarantees."""
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    v0 = tbl.state().version
    before = sorted(
        (r["id"], r["grp"], r["amt"]) for r in tbl.to_df().collect()
    )
    update_where(tbl, "grp = 'a'", {"amt": "amt * 10"})
    delete_where(tbl, "id = 4")
    tbl.append(
        spark.createDataFrame([(5, "c", 50.0)], "id long, grp string, amt double")
    )
    changes = table_changes(tbl, v0).collect()
    plus = [
        (r["id"], r["grp"], r["amt"])
        for r in changes
        if r["_change_type"] in ("insert", "update_postimage")
    ]
    minus = [
        (r["id"], r["grp"], r["amt"])
        for r in changes
        if r["_change_type"] in ("delete", "update_preimage")
    ]
    derived = list(before) + plus
    for row in minus:
        derived.remove(row)
    after = sorted(
        (r["id"], r["grp"], r["amt"]) for r in tbl.to_df().collect()
    )
    assert sorted(derived) == after


def test_streaming_cdf_reads_cdc_files(spark, tmp_path):
    """The streaming change feed serves writer-materialized cdc files with
    row-level fidelity (update images), not file-level synthesis."""
    from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

    spark.dataSource.register(DeltaStreamDataSource)
    tbl = _cdf_table(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, _bid):
        out.extend(batch_df.collect())

    def drain():
        q = (
            spark.readStream.format("delta_sorter")
            .option("path", tbl.table_path)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()  # initial snapshot: current rows feed as insert
    update_where(tbl, "id = 2", {"amt": "99.0"})
    drain()  # the update commit feeds its cdc file
    types = sorted(
        (r["id"], r["_change_type"], r["amt"]) for r in out if r["id"] == 2
    )
    assert (2, "insert", 20.0) in types
    assert (2, "update_preimage", 20.0) in types
    assert (2, "update_postimage", 99.0) in types


def test_incremental_rollup_cdc_exact_under_updates(spark, tmp_path):
    """CDF-driven rollup maintenance stays exact when the source sees
    row-level UPDATEs (preimage leaves, postimage enters)."""
    from delta_sorter_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        incremental_rollup_cdc,
    )

    src_path = str(tmp_path / "src")
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 1.0),
            (2, "2024-01-01 00:20:00", "click", 2.0),
            (3, "2024-01-01 01:10:00", "view", 3.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = DeltaTable.create(spark, src_path, events.coalesce(1), stat_columns=["event_id"])
    src.set_table_properties({"delta.enableChangeDataFeed": "true"})
    rollup = DeltaTable.create(
        spark, str(tmp_path / "ru"),
        spark.createDataFrame([], ROLLUP_SCHEMA),
    )
    v0 = 0
    r = incremental_rollup_cdc(src, rollup, v0)
    update_where(src, "event_id = 2", {"value": "200.0"})
    incremental_rollup_cdc(src, rollup, r["source_version"])
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rollup.to_df().collect()
        if r["n_events"] > 0
    }
    assert got == {
        ("2024-01-01 00:00:00", "click"): (2, 201.0),
        ("2024-01-01 01:00:00", "view"): (1, 3.0),
    }
