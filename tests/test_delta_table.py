"""Delta-log + table wrapper roundtrip tests."""

import pytest
import os

from pyspark.sql import types as T

from delta_sorter_spark.sources.delta_log import DeltaLog
from delta_sorter_spark.sources.delta_table import DeltaTable


def test_create_and_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = spark.createDataFrame(
        [("B", "2021-02-02", 4), ("A", "2021-02-01", 1)],
        "objectId string, dateTime string, value long",
    )
    table = DeltaTable.create(spark, path, df)
    out = table.to_df().orderBy("value").collect()
    assert [r["objectId"] for r in out] == ["A", "B"]
    state = table.state()
    assert state.version == 1
    assert len(state.adds) >= 1
    assert all(os.path.exists(os.path.join(path, a.path)) for a in state.adds)


def test_partitioned_table_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.createDataFrame(
        [(1, True, "2021-01-01", 10), (2, False, "2021-01-02", 20), (1, False, "2021-01-03", 30)],
        "id long, flag boolean, ts string, val long",
    )
    table = DeltaTable.create(spark, path, df, partition_columns=["id", "flag"])
    state = table.state()
    # partition values serialized into the log
    pvals = {frozenset(a.partition_values.items()) for a in state.adds}
    assert frozenset({"id": "1", "flag": "true"}.items()) in pvals
    # data files do NOT contain partition columns
    meta = state.metadata
    assert meta.data_schema.names == ["ts", "val"]
    # full read reconstructs partition columns with log types
    out = table.to_df()
    assert dict(out.dtypes)["id"] == "bigint"
    assert dict(out.dtypes)["flag"] == "boolean"
    rows = {(r["id"], r["flag"], r["ts"], r["val"]) for r in out.collect()}
    assert rows == {(1, True, "2021-01-01", 10), (2, False, "2021-01-02", 20), (1, False, "2021-01-03", 30)}


def test_stats_attested_on_write(spark, tmp_path):
    path = str(tmp_path / "t3")
    df = spark.createDataFrame(
        [("B", 2), ("A", 1), (None, 3)], "k string, v long"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["k"])
    add = table.state().adds[0]
    assert add.stats["numRecords"] == 3
    assert add.stats["minValues"]["k"] == "A"
    assert add.stats["maxValues"]["k"] == "B"
    assert add.stats["nullCount"]["k"] == 1
    ks = add.stats["keyStats"]
    assert ks["cols"] == ["k"]
    assert ks["nullsFirst"]["minKey"] == [None]
    assert ks["nullsLast"]["minKey"] == ["A"]
    assert ks["nullsLast"]["maxKey"] == [None]


def test_commit_conflict(spark, tmp_path):
    import pytest

    from delta_sorter_spark.sources.delta_log import DeltaCommitConflict

    path = str(tmp_path / "t4")
    df = spark.createDataFrame([(1,)], "a long")
    table = DeltaTable.create(spark, path, df)
    log = DeltaLog(path)
    v = log.latest_version()
    log.commit(v + 1, [], operation="TEST")
    with pytest.raises(DeltaCommitConflict):
        log.commit(v + 1, [], operation="TEST")
    # retry path picks the next free version
    assert log.commit_with_retry(lambda s: [], operation="TEST") == v + 2


def test_empty_table_read(spark, tmp_path):
    path = str(tmp_path / "t5")
    schema = T.StructType([T.StructField("a", T.LongType())])
    DeltaLog(path).create_table(schema, [])
    table = DeltaTable(spark, path)
    assert table.to_df().count() == 0
    assert table.to_df().schema == schema


def test_checkpoint_roundtrip(spark, tmp_path):
    """After CHECKPOINT_INTERVAL commits a checkpoint consolidates state;
    reads replay only newer commits and see identical state."""
    path = str(tmp_path / "ckpt")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    log = DeltaLog(path)
    for i in range(12):
        add_df = spark.createDataFrame([(i + 10, "x")], "id long, v string")
        adds = table.stage_write(add_df.coalesce(1))
        log.commit_with_retry(lambda s, adds=adds: list(adds), operation="WRITE")
    import os

    names = os.listdir(os.path.join(path, "_delta_log"))
    assert "_last_checkpoint" in names
    # protocol-layout parquet checkpoint (Delta checkpoint schema)
    assert any(n.endswith(".checkpoint.parquet") for n in names)
    state = log.read_state()
    assert len(state.adds) == 13
    assert table.to_df().count() == 13
    # state from checkpoint equals state from full replay
    os.remove(os.path.join(path, "_delta_log", "_last_checkpoint"))
    full = log.read_state()
    assert {a.path for a in full.adds} == {a.path for a in state.adds}


def test_vacuum_removes_tombstoned_files(spark, tmp_path):
    from delta_sorter_spark.api import compact

    path = str(tmp_path / "vac")
    df = spark.createDataFrame(
        [("B", 1), ("A", 2)], "k string, v long"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1))
    before = set(table.input_files())
    compact(path, ["k"], spark=spark)
    # old file is tombstoned but still on disk
    import os

    old_rel = [os.path.relpath(f, path) for f in before]
    assert all(os.path.exists(f) for f in before)
    doomed = table.vacuum(dry_run=True)
    assert set(doomed) == set(old_rel)
    assert all(os.path.exists(f) for f in before)  # dry run deletes nothing
    table.vacuum()
    assert not any(os.path.exists(f) for f in before)
    assert table.to_df().count() == 2  # active data untouched


def test_time_travel_and_history(spark, tmp_path):
    path = str(tmp_path / "tt")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    table = DeltaTable.create(spark, path, df1.coalesce(1))
    v0 = table.state().version

    # second commit: append two more rows
    adds = table.stage_write(spark.createDataFrame([(3, "c")], "id long, v string"))
    table.log.commit_with_retry(lambda state: list(adds), operation="WRITE")
    v1 = table.state().version
    assert v1 == v0 + 1

    assert sorted(r["id"] for r in table.to_df().collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in table.to_df(version=v0).collect()) == [1, 2]

    hist = table.history()
    # newest first, down to the CREATE TABLE commit at version 0
    assert [h["version"] for h in hist] == list(range(v1, -1, -1))
    assert all(h["operation"] for h in hist)
    assert all(h["timestamp"] for h in hist)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        table.to_df(version=v1 + 5)


def test_time_travel_before_checkpoint(spark, tmp_path):
    """A checkpoint newer than the requested version must be ignored."""
    path = str(tmp_path / "ttc")
    table = DeltaTable.create(
        spark, path, spark.createDataFrame([(1,)], "id long").coalesce(1)
    )
    for i in range(2, 5):
        adds = table.stage_write(spark.createDataFrame([(i,)], "id long"))
        table.log.commit_with_retry(lambda state: list(adds), operation="WRITE")
    table.log.write_checkpoint()  # checkpoint at the latest version
    # v0 = CREATE TABLE, v1 = first data write, v2 = second, ...
    assert sorted(r["id"] for r in table.to_df(version=2).collect()) == [1, 2]
    assert sorted(r["id"] for r in table.to_df().collect()) == [1, 2, 3, 4]


def test_append_with_schema_evolution(spark, tmp_path):
    """mergeSchema append: new column widens the schema atomically with the
    data; pre-evolution files read as NULL; time travel sees the old schema."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolve")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    with _pytest.raises(ValueError, match="merge_schema"):
        t.append(spark.createDataFrame([(3, "c", 1.5)], "id long, v string, w double"))
    v = t.append(
        spark.createDataFrame([(3, "c", 1.5)], "id long, v string, w double"),
        merge_schema=True,
    )
    got = {r["id"]: (r["v"], r["w"]) for r in t.to_df().collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}
    # old snapshot still has the narrow schema
    assert [f.name for f in t.to_df(version=v - 1).schema.fields] == ["id", "v"]
    # appending WITHOUT the evolved column fills NULL
    t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert t.to_df().where(F.col("id") == 4).collect()[0]["w"] is None


def test_check_constraints_enforced_on_append(spark, tmp_path):
    """ADD CONSTRAINT validates existing rows, appends enforce it (NULLs
    pass, FALSE rejects), constraint survives the log round-trip, DROP
    removes enforcement."""
    import pytest as _pytest

    path = str(tmp_path / "constrained")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    )
    # existing data violates -> ADD rejected, nothing committed
    with _pytest.raises(ValueError, match="CHECK"):
        t.add_check_constraint("v_big", "v > 15")
    t.add_check_constraint("v_pos", "v > 0")
    # a fresh handle (re-read from the log) still knows the constraint
    t2 = DeltaTable(spark, path)
    assert t2.metadata.check_constraints == {"v_pos": "v > 0"}
    with _pytest.raises(ValueError, match="v_pos"):
        t2.append(spark.createDataFrame([(3, -1.0)], "id long, v double"))
    # NULL predicate result passes (SQL CHECK semantics)
    t2.append(spark.createDataFrame([(4, None)], "id long, v double"))
    t2.drop_check_constraint("v_pos")
    t2.append(spark.createDataFrame([(5, -2.0)], "id long, v double"))
    assert DeltaTable(spark, path).to_df().count() == 4


def test_column_invariants_enforced(spark, tmp_path):
    """Legacy delta.invariants field metadata (writer version 2): a table
    ported from a pre-CHECK-constraint writer still gets its invariants
    enforced on append and DML, through the same one-pass check."""
    import json as _json

    import pytest as _pytest
    from pyspark.sql import types as T

    from delta_sorter_spark.operators.dml import update_where

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField(
                "v", T.DoubleType(), True,
                metadata={
                    "delta.invariants": _json.dumps(
                        {"expression": {"expression": "v > 0"}}
                    )
                },
            ),
        ]
    )
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], schema)
    path = str(tmp_path / "inv")
    t = DeltaTable.create(spark, path, df)
    t2 = DeltaTable(spark, path)  # invariant survives the log round-trip
    assert t2.metadata.column_invariants == {"invariant(v)": "v > 0"}
    with _pytest.raises(ValueError, match="invariant"):
        t2.append(spark.createDataFrame([(3, -1.0)], schema))
    with _pytest.raises(ValueError, match="invariant"):
        update_where(t2, "id = 1", {"v": "-2.0"})
    # NULL passes (SQL three-valued semantics, same as CHECK)
    t2.append(spark.createDataFrame([(4, None)], schema))
    assert DeltaTable(spark, path).to_df().count() == 3


def test_in_commit_timestamps_monotonic_under_clock_skew(spark, tmp_path, monkeypatch):
    """ICT (delta.enableInCommitTimestamps): commit timestamps stay
    STRICTLY increasing even when the writer's clock runs backwards, the
    enablement commit itself carries the field, the writer feature is
    declared, and timestampAsOf resolves against the monotonic clock."""
    import time as _time

    from delta_sorter_spark.sources import delta_log as dlog

    path = str(tmp_path / "ict")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1,)], "id long")
    )
    v_enable = t.enable_in_commit_timestamps()
    # idempotent
    assert t.enable_in_commit_timestamps() == v_enable
    state = DeltaTable(spark, path).state()
    assert (
        state.metadata.configuration["delta.enableInCommitTimestamps"] == "true"
    )
    assert "inCommitTimestamp" in (state.protocol.get("writerFeatures") or [])
    assert state.protocol["minWriterVersion"] >= 7

    # the enablement commit carries inCommitTimestamp
    enact = t.log.commit_actions(v_enable)
    ci = next(a["commitInfo"] for a in enact if "commitInfo" in a)
    assert "inCommitTimestamp" in ci

    t.append(spark.createDataFrame([(2,)], "id long"))
    ts_before = {h["version"]: h["timestamp"] for h in t.log.history()}

    # a second writer whose clock runs an hour BEHIND
    real_time = _time.time
    monkeypatch.setattr(dlog.time, "time", lambda: real_time() - 3600)
    t2 = DeltaTable(spark, path)
    t2.append(spark.createDataFrame([(3,)], "id long"))
    monkeypatch.undo()

    hist = t2.log.history()  # newest first
    stamps = [h["timestamp"] for h in reversed(hist)]
    assert stamps == sorted(stamps)
    assert len(set(stamps)) == len(stamps), "timestamps must be strictly increasing"
    # the skewed commit's stamp is predecessor+1, not an hour in the past
    newest = hist[0]
    assert newest["timestamp"] == ts_before[hist[1]["version"]] + 1

    # timestampAsOf resolves by the monotonic clock: the instant just
    # before the skewed commit maps to its predecessor
    assert t2.log.version_at_timestamp(newest["timestamp"] - 1) == hist[1]["version"]
    assert t2.log.version_at_timestamp(newest["timestamp"]) == newest["version"]
    assert DeltaTable(spark, path).to_df().count() == 3


def test_in_commit_timestamps_survive_checkpoint_tip(spark, tmp_path, monkeypatch):
    """Checkpoint at the log tip: state replay sees no commitInfo, so the
    next ICT commit must fall back to reading the newest commit file and
    still clamp monotonically."""
    import time as _time

    from delta_sorter_spark.sources import delta_log as dlog

    path = str(tmp_path / "ict_ckpt")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1,)], "id long")
    )
    t.enable_in_commit_timestamps()
    t.append(spark.createDataFrame([(2,)], "id long"))
    t.log.write_checkpoint()
    prev_ts = t.log.history()[0]["timestamp"]

    real_time = _time.time
    monkeypatch.setattr(dlog.time, "time", lambda: real_time() - 3600)
    t2 = DeltaTable(spark, path)
    assert t2.state().last_commit_timestamp is None  # replay starts past tip
    t2.append(spark.createDataFrame([(3,)], "id long"))
    monkeypatch.undo()
    assert t2.log.history()[0]["timestamp"] == prev_ts + 1


def test_check_constraint_survives_checkpoint(spark, tmp_path):
    path = str(tmp_path / "ckpt_cfg")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1,)], "id long")
    )
    t.add_check_constraint("id_pos", "id > 0")
    t.log.write_checkpoint()
    # fresh handle reads state FROM the checkpoint (plus no newer commits)
    assert DeltaTable(spark, path).metadata.check_constraints == {"id_pos": "id > 0"}


def test_generated_columns(spark, tmp_path):
    """Generated column: derived at create, computed on append when omitted,
    enforced when supplied, survives the log round-trip."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "gen")
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00"), (2, "2024-03-06 11:00:00")],
        "id long, ts string",
    )
    t = DeltaTable.create(
        spark, path, df,
        generated_columns={"event_date": ("string", "substring(ts, 1, 10)")},
    )
    got = {r["id"]: r["event_date"] for r in t.to_df().collect()}
    assert got == {1: "2024-03-05", 2: "2024-03-06"}

    # fresh handle: expression round-trips through schemaString metadata
    t2 = DeltaTable(spark, path)
    # append WITHOUT the column -> computed
    t2.append(spark.createDataFrame([(3, "2024-03-07 09:00:00")], "id long, ts string"))
    assert t2.to_df().where(F.col("id") == 3).collect()[0]["event_date"] == "2024-03-07"
    # append WITH a wrong value -> rejected
    bad = spark.createDataFrame(
        [(4, "2024-03-08 09:00:00", "1999-01-01")], "id long, ts string, event_date string"
    )
    with _pytest.raises(ValueError, match="generated column"):
        t2.append(bad)
    # append WITH the correct value -> accepted
    ok = spark.createDataFrame(
        [(4, "2024-03-08 09:00:00", "2024-03-08")], "id long, ts string, event_date string"
    )
    t2.append(ok)
    assert t2.to_df().count() == 4


def test_generated_partition_column_prunes(spark, tmp_path):
    """The canonical generated-column use: a derived date as partition key;
    partition pruning then works without writers deriving it by hand."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "genpart")
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00"), (2, "2024-03-06 11:00:00")],
        "id long, ts string",
    )
    t = DeltaTable.create(
        spark, path, df,
        partition_columns=["event_date"],
        generated_columns={"event_date": ("string", "substring(ts, 1, 10)")},
    )
    t.append(spark.createDataFrame([(3, "2024-03-06 12:00:00")], "id long, ts string"))
    parts = {a.partition_values["event_date"] for a in t.state().adds}
    assert parts == {"2024-03-05", "2024-03-06"}
    got = t.to_df().where(F.col("event_date") == "2024-03-06")
    assert sorted(r["id"] for r in got.collect()) == [2, 3]


class TestIdentityColumns:
    def _mk(self, spark, path, step=1, start=100):
        df = spark.createDataFrame([("a",), ("b",), ("c",)], "name string")
        return DeltaTable.create(
            spark, path, df, identity_columns={"id": (start, step)}
        )

    def test_initial_ids_on_grid_above_start(self, spark, tmp_path):
        t = self._mk(spark, str(tmp_path / "t"), step=3)
        rows = t.to_df().collect()
        ids = [r.id for r in rows]
        assert len(set(ids)) == 3
        assert all(v >= 100 and (v - 100) % 3 == 0 for v in ids)

    def test_append_allocates_above_watermark(self, spark, tmp_path):
        t = self._mk(spark, str(tmp_path / "t"))
        first = {r.id for r in t.to_df().collect()}
        t.append(spark.createDataFrame([("d",), ("e",)], "name string"))
        all_ids = [r.id for r in t.to_df().collect()]
        assert len(all_ids) == len(set(all_ids)) == 5
        assert min(set(all_ids) - first) > max(first)

    def test_supplying_identity_value_rejected(self, spark, tmp_path):
        t = self._mk(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            t.append(spark.createDataFrame([(9, "x")], "id long, name string"))

    def test_watermark_persisted_in_metadata(self, spark, tmp_path):
        t = self._mk(spark, str(tmp_path / "t"))
        md = dict(t.metadata.schema["id"].metadata)
        hwm = md["delta.identity.highWaterMark"]
        assert hwm == max(r.id for r in t.to_df().collect())
        t.append(spark.createDataFrame([("d",)], "name string"))
        md2 = dict(t.metadata.schema["id"].metadata)
        assert md2["delta.identity.highWaterMark"] > hwm


def test_concurrent_appends_all_land(spark, tmp_path):
    """8 writers appending concurrently: optimistic-concurrency retries
    must serialize them — every row lands exactly once, no version gaps."""
    from concurrent.futures import ThreadPoolExecutor

    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, spark.createDataFrame([(-1, -1)], "w long, i long"))
    v0 = DeltaTable(spark, path).log.latest_version()

    def write(w):
        df = spark.createDataFrame([(w, i) for i in range(10)], "w long, i long")
        return DeltaTable(spark, path).append(df)

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(write, range(8)))

    assert sorted(versions) == list(range(v0 + 1, v0 + 9))  # one commit each
    t = DeltaTable(spark, path)
    rows = {(r.w, r.i) for r in t.to_df().collect()}
    assert len(rows) == 81 and all((w, i) in rows for w in range(8) for i in range(10))


def test_distributed_stage_write_stats_match_driver_path(spark, tmp_path):
    """The executor-side stats job (used at/above _DIST_STATS_MIN_FILES
    staged files) must produce byte-identical stats/attestation to the
    driver-side pruned read — same numbers in the log either way."""
    df = spark.createDataFrame(
        [(i, float(i) / 7, f"s{i % 13}") for i in range(2000)],
        "id long, x double, s string",
    )

    def build(path, threshold):
        orig = DeltaTable._DIST_STATS_MIN_FILES
        DeltaTable._DIST_STATS_MIN_FILES = threshold
        try:
            t = DeltaTable.create(
                spark, path, df.repartition(9), stat_columns=["id", "s"]
            )
        finally:
            DeltaTable._DIST_STATS_MIN_FILES = orig
        return {
            # path differs (uuid part names); stats must not
            frozenset((k, str(v)) for k, v in a.stats.items())
            for a in t.state().adds
        }

    dist = build(str(tmp_path / "dist"), 2)      # forced distributed
    drv = build(str(tmp_path / "drv"), 10**9)    # forced driver-side
    assert dist == drv
    assert len(dist) >= 2  # several distinct per-file stat sets


def test_detail_describes_table(spark, tmp_path):
    """DeltaTable.detail(): DESCRIBE DETAIL shape from the snapshot alone —
    file/byte counts, properties, protocol, and DV accounting across a
    merge-on-read delete and time travel."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    df = spark.range(0, 100).selectExpr("id AS k", "id % 5 AS p")
    t = DeltaTable.create(
        spark, str(tmp_path / "td"), df.repartition(4),
        partition_columns=["p"],
    )
    d0 = t.detail()
    assert d0["format"] == "delta" and d0["partitionColumns"] == ["p"]
    assert d0["numFiles"] == len(t.state().adds)
    assert d0["sizeInBytes"] == sum(a.size for a in t.state().adds)
    assert d0["numFilesWithDeletionVectors"] == 0
    assert d0["minReaderVersion"] == 1

    delete_where_dv(t, "k IN (3, 7)")
    d1 = t.detail()
    assert d1["numDeletedRecords"] == 2
    assert d1["numFilesWithDeletionVectors"] >= 1
    assert d1["version"] == d0["version"] + 1
    assert d1["minReaderVersion"] == 3  # DV protocol upgrade
    # time travel reproduces the pre-delete shape
    assert t.detail(version=d0["version"]) == d0


def test_commit_operation_metrics(spark, tmp_path):
    """commitInfo.operationMetrics (DESCRIBE HISTORY parity): derived from
    each commit's own actions — files/bytes/rows out, removed, cdc files."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.dml import update_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "opm")
    tbl = DeltaTable.create(
        spark, path, spark.range(20).select(F.col("id").alias("k")).coalesce(1)
    )
    hist = {h["version"]: h for h in tbl.log.history()}
    data_v = max(hist)
    m = hist[data_v]["operationMetrics"]
    assert m["numOutputFiles"] == "1" and m["numOutputRows"] == "20"
    assert int(m["numOutputBytes"]) > 0 and m["numRemovedFiles"] == "0"

    tbl.set_table_properties({"delta.enableChangeDataFeed": "true"})
    update_where(tbl, "k < 5", {"k": "k + 100"})
    m = tbl.log.history()[0]["operationMetrics"]
    assert m["numRemovedFiles"] == "1" and int(m["numCdcFiles"]) >= 1
    # the metadata-only property commit carries no metrics
    prop_v = [h for h in tbl.log.history() if h["operation"] == "SET TBLPROPERTIES"]
    assert prop_v and prop_v[0]["operationMetrics"] == {}
