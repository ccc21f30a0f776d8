"""Object-store log IO: the Delta log must work against non-POSIX stores
with put-if-absent commit semantics (reference addresses tables by URI,
crates/sorter-cli/src/main.rs:13-15; object-store feature flags in
crates/sorter-core/Cargo.toml:15).

Covers: create / commit / replay / optimistic-concurrency conflict /
parquet checkpoint, on ``memory://`` (hermetic) and ``s3://`` (moto server
exercising the real boto3 conditional-PUT code path).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from delta_sorter_spark.sources.delta_log import (
    AddAction,
    DeltaCommitConflict,
    DeltaLog,
)
from delta_sorter_spark.sources.fs import MemoryFileSystem, resolve

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _add(i: int) -> AddAction:
    return AddAction(
        path=f"part-{i:05d}.parquet",
        size=100 + i,
        stats={"numRecords": 10, "minValues": {"id": i}, "maxValues": {"id": i + 9}},
    )


def _exercise_log(table_uri: str):
    log = DeltaLog(table_uri)
    assert not log.exists()
    log.create_table(SCHEMA, partition_columns=[])
    assert log.exists()
    assert log.latest_version() == 0

    # sequential commits
    for i in range(12):
        log.commit_with_retry(lambda s, i=i: [_add(i)], operation="WRITE")

    state = log.read_state()
    assert state.version == 12
    assert len(state.adds) == 12
    assert state.metadata.schema == SCHEMA

    # put-if-absent: claiming an existing version must conflict
    with pytest.raises(DeltaCommitConflict):
        log.commit(5, [_add(99)])

    # checkpoint fired at version 10 (CHECKPOINT_INTERVAL); state via the
    # checkpoint replay path equals full replay
    assert log._last_checkpoint_version() == 10
    ckpt_state = log.read_state()
    log.fs.delete(log.fs.join(log.log_dir, "_last_checkpoint"))
    full_state = log.read_state()
    assert {a.path for a in ckpt_state.adds} == {a.path for a in full_state.adds}
    # stats survive the parquet checkpoint round trip
    by_path = {a.path: a for a in ckpt_state.adds}
    assert by_path["part-00003.parquet"].stats["minValues"] == {"id": 3}

    # time travel across the checkpoint boundary
    old = log.read_state(at_version=4)
    assert len(old.adds) == 4
    return log


def test_memory_log_lifecycle():
    MemoryFileSystem.reset()
    _exercise_log("memory://tables/t1")


def test_memory_put_if_absent_is_atomic():
    MemoryFileSystem.reset()
    fs, _ = resolve("memory://x")
    fs.put_if_absent("memory://x/obj", b"first")
    with pytest.raises(FileExistsError):
        fs.put_if_absent("memory://x/obj", b"second")
    assert fs.read_bytes("memory://x/obj") == b"first"


def test_legacy_json_checkpoint_still_readable():
    """Tables checkpointed by the previous engine version (JSON-lines
    checkpoint) must still replay."""
    MemoryFileSystem.reset()
    log = DeltaLog("memory://tables/legacy")
    log.create_table(SCHEMA)
    log.commit(1, [_add(1)])
    log.commit(2, [_add(2)])
    state = log.read_state()
    # hand-write a legacy JSON checkpoint at version 2
    lines = [
        json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}),
        json.dumps(
            {
                "metaData": {
                    "id": state.metadata.table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(SCHEMA.jsonValue()),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        ),
    ] + [json.dumps(a.to_json()) for a in state.adds]
    log.fs.write_text(
        log.fs.join(log.log_dir, f"{2:020d}.checkpoint.json"),
        "\n".join(lines) + "\n",
    )
    log.fs.write_text(
        log.fs.join(log.log_dir, "_last_checkpoint"),
        json.dumps({"version": 2, "size": len(state.adds)}),
    )
    log.commit(3, [_add(3)])
    replayed = log.read_state()
    assert {a.path for a in replayed.adds} == {
        "part-00001.parquet",
        "part-00002.parquet",
        "part-00003.parquet",
    }


def test_checkpoint_parquet_is_protocol_shaped():
    """The checkpoint parquet must use the Delta protocol's column layout
    (protocol/metaData/txn/add/remove structs, one action per row)."""
    import io

    import pyarrow.parquet as pq

    MemoryFileSystem.reset()
    log = DeltaLog("memory://tables/shape")
    log.create_table(SCHEMA)
    log.commit(1, [_add(1)])
    path = log.write_checkpoint()
    table = pq.read_table(io.BytesIO(log.fs.read_bytes(path)))
    assert set(table.column_names) == {
        "protocol", "metaData", "txn", "add", "remove", "domainMetadata",
        # v2-checkpoint actions: nullable in every classic checkpoint row
        "checkpointMetadata", "sidecar",
    }
    rows = table.to_pylist()
    assert sum(1 for r in rows if r["protocol"] is not None) == 1
    assert sum(1 for r in rows if r["metaData"] is not None) == 1
    adds = [r["add"] for r in rows if r["add"] is not None]
    assert [a["path"] for a in adds] == ["part-00001.parquet"]
    add_fields = set(adds[0].keys())
    assert {"path", "partitionValues", "size", "modificationTime",
            "dataChange", "stats"} <= add_fields
    # exactly one action per row
    for r in rows:
        assert sum(1 for v in r.values() if v is not None) == 1


# ---------------------------------------------------------------------------
# moto: real S3 wire protocol (conditional PUT -> 412 on the losing writer)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def s3_env():
    moto = pytest.importorskip("moto")
    import os

    import boto3

    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    old_env = {
        k: os.environ.get(k)
        for k in (
            "AWS_ENDPOINT_URL",
            "AWS_ACCESS_KEY_ID",
            "AWS_SECRET_ACCESS_KEY",
            "AWS_DEFAULT_REGION",
        )
    }
    os.environ["AWS_ENDPOINT_URL"] = endpoint
    os.environ["AWS_ACCESS_KEY_ID"] = "testing"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "testing"
    os.environ["AWS_DEFAULT_REGION"] = "us-east-1"
    # drop any client cached with the old endpoint
    from delta_sorter_spark.sources.fs import S3FileSystem

    S3FileSystem._clients.clear()
    boto3.client("s3", endpoint_url=endpoint).create_bucket(Bucket="testbkt")
    yield endpoint
    server.stop()
    S3FileSystem._clients.clear()
    for k, v in old_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_s3_log_lifecycle(s3_env):
    _exercise_log("s3://testbkt/tables/t1")


def test_s3_conditional_put_conflict(s3_env):
    """Two writers racing for the same version: exactly one wins, via the
    S3 conditional-PUT (If-None-Match) code path."""
    log = DeltaLog("s3://testbkt/tables/race")
    log.create_table(SCHEMA)
    log.commit(1, [_add(1)])
    with pytest.raises(DeltaCommitConflict):
        log.commit(1, [_add(2)])
    state = log.read_state()
    assert [a.path for a in state.adds] == ["part-00001.parquet"]


def test_s3_concurrent_writers_all_commit(s3_env):
    """Contended optimistic concurrency against the S3 log: N threads race
    commit_with_retry; every writer must land exactly once, on distinct
    versions, through the conditional-PUT retry loop."""
    import threading

    log = DeltaLog("s3://testbkt/tables/stress")
    log.create_table(SCHEMA)
    n_writers = 8
    results: dict[int, int] = {}
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            v = log.commit_with_retry(
                lambda s, i=i: [_add(i)], operation="WRITE", max_attempts=50
            )
            results[i] = v
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert sorted(results.values()) == list(range(1, n_writers + 1))
    state = log.read_state()
    assert {a.path for a in state.adds} == {
        f"part-{i:05d}.parquet" for i in range(n_writers)
    }


def _upload_tree(local_root: str, bucket: str, prefix: str) -> None:
    import os

    import boto3

    cli = boto3.client("s3")
    for root, _dirs, names in os.walk(local_root):
        for n in names:
            full = os.path.join(root, n)
            key = f"{prefix}/{os.path.relpath(full, local_root)}".replace(os.sep, "/")
            with open(full, "rb") as fh:
                cli.put_object(Bucket=bucket, Key=key, Body=fh.read())


def test_s3_validate_only_end_to_end(s3_env, spark, tmp_path):
    """Validate a table THROUGH its s3:// URI with no Spark connector jars:
    log replay via boto3, per-file scans via pyarrow's S3 filesystem on the
    executors.  The bulk data plane stays gated."""
    from delta_sorter_spark.api import validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    # an unsorted table (no attested key stats -> forces the scan path)
    local = str(tmp_path / "unsorted")
    df = spark.createDataFrame(
        [("B", 4), ("A", 1), ("C", 2), ("A", 3)], "k string, v long"
    )
    DeltaTable.create(spark, local, df.coalesce(1))
    _upload_tree(local, "testbkt", "tables/val_unsorted")

    report = validate("s3://testbkt/tables/val_unsorted", ["k", "v"], spark=spark)
    assert report["checked_files"] == 1
    assert report["boundary_violations"] >= 1

    # a sorted table written by this engine (attested keyStats -> the
    # metadata fast path: ZERO data-file reads, works with only log access)
    from delta_sorter_spark.api import compact

    compact(local, ["k", "v"], repartition_by_sort_key=True, spark=spark)
    _upload_tree(local, "testbkt", "tables/val_sorted")
    report = validate("s3://testbkt/tables/val_sorted", ["k", "v"], spark=spark)
    assert report["boundary_violations"] == 0

    # metadata plane and jar-free reads work
    t = DeltaTable(spark, "s3://testbkt/tables/val_sorted")
    assert t.state().version >= 0
    assert t.to_df().count() == 4  # reads via the Python Data Source
    # raw positional scan works remotely too (withPositions path)
    pos = t.scan_with_positions(t.state().adds)
    assert pos.count() == 4 and {"__file__", "__pos__"} <= set(pos.columns)


def test_s3_delta_source_batch_and_stream(s3_env, spark, tmp_path):
    """Read a remote Delta table through the Python Data Source — batch and
    readStream — with no connector jars: log via boto3, file bytes via
    pyarrow S3 on the workers, DV positions resolved at planning time.
    The ``awsEnv`` option ships the driver's AWS settings to the source's
    planner workers (which never see driver env changes made after the
    SparkSession started)."""
    import json as _json

    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.sources.fs import capture_aws_env
    from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

    spark.dataSource.register(DeltaStreamDataSource)
    aws_env = _json.dumps(capture_aws_env())

    local = str(tmp_path / "src")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string")
    DeltaTable.create(spark, local, df.coalesce(1), stat_columns=["id"])
    delete_where_dv(DeltaTable(spark, local), "id IN (3, 7)")  # parquet DV sidecar
    _upload_tree(local, "testbkt", "tables/src_remote")

    got = (
        spark.read.format("delta_sorter")
        .option("path", "s3://testbkt/tables/src_remote")
        .option("awsEnv", aws_env)
        .load()
    )
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 4, 5, 6, 8, 9]

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("delta_sorter")
        .option("path", "s3://testbkt/tables/src_remote")
        .option("awsEnv", aws_env)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [
        0, 1, 2, 4, 5, 6, 8, 9,
    ]


def test_s3_strict_compact_end_to_end(s3_env, spark, tmp_path):
    """Full remote maintenance loop with NO connector jars: read the s3://
    table through the Python Data Source, sort, write new parquet objects
    from executors via boto3, commit Remove+Add through the conditional-PUT
    log, and validate the result remotely."""
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "uns")
    df = spark.createDataFrame(
        [("B", 4), ("A", 1), ("C", 2), ("A", 3), ("B", 0), (None, 9)],
        "k string, v long",
    )
    DeltaTable.create(spark, local, df.coalesce(2))
    _upload_tree(local, "testbkt", "tables/compact_me")
    uri = "s3://testbkt/tables/compact_me"

    assert validate(uri, ["k", "v"], spark=spark)["boundary_violations"] >= 1

    metrics = compact(uri, ["k", "v"], repartition_by_sort_key=True, spark=spark)
    assert metrics.rewritten_partitions == 1

    report = validate(uri, ["k", "v"], spark=spark)
    assert report["boundary_violations"] == 0
    # content survives the rewrite, read through the remote path
    t = DeltaTable(spark, uri)
    got = sorted(
        ((r["k"], r["v"]) for r in t.to_df().collect()),
        key=lambda kv: (kv[0] is not None, kv[0] or "", kv[1]),
    )
    assert got == [(None, 9), ("A", 1), ("A", 3), ("B", 0), ("B", 4), ("C", 2)]
    # old files are tombstoned, new attested files replace them
    state = t.state()
    assert all(a.stats and a.stats.get("keyStats") for a in state.adds)
    # time travel through the remote batch reader: v0 is the empty
    # CREATE TABLE commit, v1 the initial data
    assert t.to_df(version=0).count() == 0
    assert t.to_df(version=1).count() == 6

    # remote vacuum closes the loop: tombstoned objects are deleted,
    # active ones survive, reads still work
    doomed = t.vacuum()
    assert doomed  # the pre-compact files
    assert t.to_df().count() == 6
    # ...and time travel to pre-compact versions now fails at read (files
    # gone), which is vacuum's documented trade everywhere
    assert t.vacuum(dry_run=True) == []

    # partition-aware mode now works remotely too: on the freshly sorted
    # table it validates via attested metadata and skips everything
    metrics2 = compact(uri, ["k", "v"], spark=spark)
    assert metrics2.rewritten_partitions == 0
    assert metrics2.skipped_partitions == 1

    # z-order clustering rewrite also runs remotely (same strict write path)
    metrics3 = compact(uri, [], zorder_columns=["v"], spark=spark)
    assert metrics3.rewritten_partitions == 1
    assert t.to_df().count() == 6


def test_s3_partition_aware_compact_end_to_end(s3_env, spark, tmp_path):
    """The reference's core loop — partition-scoped rewrites on an object
    store (lib.rs:795-809 scoped SQL + lib.rs:862-885 replaceWhere commit) —
    with NO connector jars: the sorted partition is skipped (work
    avoidance), the unsorted one is read through the Python Data Source's
    pruned ``files`` option, sorted, written from executors via boto3, and
    committed with a replaceWhere predicate; the table then validates
    remotely."""
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "part")
    rows = [(1, "b", 1), (1, "a", 2), (2, "z", 9), (2, "m", 7)]
    df = spark.createDataFrame(rows, "p int, k string, v long")
    DeltaTable.create(spark, local, df.coalesce(1), partition_columns=["p"])
    # sort + attest both partitions locally, then break p=2 with an
    # unattested append whose key range overlaps the existing p=2 file
    compact(local, ["k"], spark=spark)
    DeltaTable(spark, local).append(
        spark.createDataFrame([(2, "n", 8)], "p int, k string, v long").coalesce(1)
    )
    _upload_tree(local, "testbkt", "tables/part_remote")
    uri = "s3://testbkt/tables/part_remote"

    p1_before = {
        a.path
        for a in DeltaTable(spark, uri).state().adds
        if a.partition_values.get("p") == "1"
    }

    metrics = compact(uri, ["k"], spark=spark)
    assert metrics.rewritten_partitions == 1  # only p=2
    assert metrics.skipped_partitions == 1    # p=1 attested sorted -> skipped

    # the rewrite committed replaceWhere-scoped Remove+Add: p=1's file is
    # untouched, p=2 has fresh attested files
    t = DeltaTable(spark, uri)
    state = t.state()
    p1_after = {a.path for a in state.adds if a.partition_values.get("p") == "1"}
    assert p1_after == p1_before
    p2 = [a for a in state.adds if a.partition_values.get("p") == "2"]
    assert p2 and all(a.stats and a.stats.get("keyStats") for a in p2)

    report = validate(uri, ["k"], spark=spark)
    assert report["boundary_violations"] == 0

    got = sorted((r["p"], r["k"], r["v"]) for r in t.to_df().collect())
    assert got == sorted(rows + [(2, "n", 8)])

    # a second pass skips both partitions (attested metadata, zero rewrites)
    metrics2 = compact(uri, ["k"], spark=spark)
    assert metrics2.rewritten_partitions == 0
    assert metrics2.skipped_partitions == 2


def test_s3_dml_end_to_end(s3_env, spark, tmp_path):
    """Row-level DML on a remote table with no connector jars: upsert
    rewrites only zone-map candidate files; delete_where finds hit files
    via the data source's withFilePath column (input_file_name is empty
    under Python Data Sources) and rewrites only those."""
    from delta_sorter_spark.operators.dml import delete_where, upsert
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "dml")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    )
    # range partitioning gives each file a tight, disjoint id interval, so
    # the zone-map pruning assertion below is deterministic
    DeltaTable.create(
        spark, local, df.repartitionByRange(4, "id"), stat_columns=["id"]
    )
    _upload_tree(local, "testbkt", "tables/dml_remote")
    uri = "s3://testbkt/tables/dml_remote"
    t = DeltaTable(spark, uri)
    n_files = len(t.state().adds)
    assert n_files == 4

    res = upsert(
        t, spark.createDataFrame([(3, "UP")], "id long, v string"), ["id"]
    )
    assert res["rewritten_files"] == 1  # zone maps pruned the other files
    res = upsert(
        t, spark.createDataFrame([(100, "NEW")], "id long, v string"), ["id"]
    )
    assert res["rewritten_files"] == 0  # outside every file's interval
    got = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert got[3] == "UP" and got[100] == "NEW" and len(got) == 21

    res = delete_where(t, "id % 2 = 1 AND id < 10")
    assert res["deleted_rows"] == 5  # 1,3,5,7,9
    remaining = sorted(r["id"] for r in t.to_df().collect())
    assert remaining == [0, 2, 4, 6, 8] + list(range(10, 20)) + [100]

    # merge-on-read delete: DV positions scanned via withPositions, the
    # sidecar dataset written by executors over boto3, readers drop the
    # positions at planning time — zero data bytes rewritten
    from delta_sorter_spark.operators.dml import delete_where_dv, purge_deletion_vectors

    files_before = {a.path for a in t.state().adds}
    res = delete_where_dv(t, "id IN (2, 14)")
    assert res["dv_files"] >= 1 and res["deleted_rows"] == 2
    assert {a.path for a in t.state().adds} == files_before  # no rewrites
    remaining = sorted(r["id"] for r in t.to_df().collect())
    assert remaining == [0, 4, 6, 8] + [i for i in range(10, 20) if i != 14] + [100]

    # cumulative second DV delete over an already-DV'd file
    res = delete_where_dv(t, "id = 4")
    assert res["deleted_rows"] == 1
    assert sorted(r["id"] for r in t.to_df().collect()) == [
        0, 6, 8] + [i for i in range(10, 20) if i != 14] + [100]

    # purge materializes the DVs (fresh files, no pointers)
    res = purge_deletion_vectors(t)
    assert res["purged_files"] >= 1
    assert not any(a.deletion_vector for a in t.state().adds)
    assert sorted(r["id"] for r in t.to_df().collect()) == [
        0, 6, 8] + [i for i in range(10, 20) if i != 14] + [100]


def test_read_dv_bytes_resolves_uri_and_absolute_paths(tmp_path):
    """read_dv_bytes is the single DV-payload resolver: URI rels (remote
    shallow-clone "p" descriptors) resolve through fs regardless of the
    table's own locality; absolute local paths open as-is; relative paths
    join under the table (local or remote)."""
    from delta_sorter_spark.sources.delta_table import read_dv_bytes
    from delta_sorter_spark.sources.fs import resolve

    payload = b"\x01binbytes"
    # URI rel, local table: a local clone of a remote source
    fsobj, base = resolve("memory://dvbkt/src")
    fsobj.write_bytes(fsobj.join(base, "deletion_vector_x.bin"), payload)
    assert read_dv_bytes(str(tmp_path), "memory://dvbkt/src/deletion_vector_x.bin") == payload
    # URI rel, remote table (remote clone of another remote table)
    assert read_dv_bytes("memory://dvbkt/dst", "memory://dvbkt/src/deletion_vector_x.bin") == payload
    # absolute local path (local clone source)
    p = tmp_path / "deletion_vector_y.bin"
    p.write_bytes(payload)
    assert read_dv_bytes("memory://dvbkt/dst", str(p)) == payload
    # plain relative under a local table dir
    (tmp_path / "deletion_vector_z.bin").write_bytes(payload)
    assert read_dv_bytes(str(tmp_path), "deletion_vector_z.bin") == payload


def test_s3_bloom_index_end_to_end(s3_env, spark, tmp_path):
    """Bloom-index lifecycle against an s3:// URI with no connector jars:
    build scans through the Python Data Source, the index dataset is PUT
    from executors via pyarrow, the job probe reads it back through
    mapInPandas, the Spark-free probe (the streaming planner's path) reads
    it via pyarrow-S3 directly, and refresh covers a remote append."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.bloom_index import (
        bloom_prune_adds_local,
        build_bloom_index,
        refresh_bloom_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "bl")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        ((F.col("id") * 13) % 400).cast("string").alias("u"),
    )
    DeltaTable.create(
        spark, local,
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    _upload_tree(local, "testbkt", "tables/bloom_me")
    uri = "s3://testbkt/tables/bloom_me"
    tbl = DeltaTable(spark, uri)

    r = build_bloom_index(tbl, "u", m_bits=1 << 13)
    assert r["files"] == 4
    kept = tbl.files_matching("u = '26'")
    assert 1 <= len(kept) <= 2
    assert tbl.to_df(where="u = '26'").count() == 1

    st = tbl.state()
    kept_local = {
        a.path
        for a in bloom_prune_adds_local(uri, st.adds, "u = '26'", st.metadata)
    }
    assert kept_local == {a.path for a in kept}

    tbl.append(spark.createDataFrame([(9000, "zzz")], "k long, u string"))
    r2 = refresh_bloom_index(tbl, "u")
    assert r2["new_files"] == 1 and r2["dropped_files"] == 0
    kept_new = tbl.files_matching("u = 'zzz'")
    assert len(kept_new) == 1
    assert tbl.to_df(where="u = 'zzz'").count() == 1


def test_s3_row_tracking_end_to_end(s3_env, spark, tmp_path):
    """Row tracking on a remote URI, jar-free: enable assigns base row ids
    through the log alone; fresh ids for a remote append come from the
    high-water mark; to_df_with_row_ids reads baseRowId + physical
    position through the Python Data Source's extraColumns/withPositions
    path; compaction and copy-on-write DELETE preserve ids via the
    materialized columns the rewrite wrote to S3."""
    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "rt_remote")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    DeltaTable.create(spark, local, df.coalesce(2), stat_columns=["id"])
    _upload_tree(local, "testbkt", "tables/rt_remote")
    uri = "s3://testbkt/tables/rt_remote"
    t = DeltaTable(spark, uri)

    t.enable_row_tracking()
    t = DeltaTable(spark, uri)
    assert t.state().row_id_high_water_mark == 9

    def ids(tbl):
        return {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in tbl.to_df_with_row_ids().collect()
        }

    before = ids(t)
    assert sorted(rid for rid, _ in before.values()) == list(range(10))

    # fresh ids above the HWM for a remote append
    t.append(spark.createDataFrame([(100, "x"), (101, "y")], "id long, v string"))
    t = DeltaTable(spark, uri)
    assert t.state().row_id_high_water_mark == 11
    appended = ids(t)
    assert sorted(rid for rid, _ in appended.values()) == list(range(12))
    v = t.log.latest_version()
    assert appended[100][1] == v and appended[101][1] == v

    # strict compaction on s3://: ids AND commit versions survive through
    # the materialized columns (read back via extraColumns)
    res = compact(
        uri, sort_columns=["v"], spark=spark, repartition_by_sort_key=True
    )
    assert res.files_out >= 1
    t = DeltaTable(spark, uri)
    assert ids(t) == appended

    # copy-on-write DELETE: survivors keep their ids
    delete_where(t, "id IN (3, 100)")
    t = DeltaTable(spark, uri)
    survivors = ids(t)
    assert set(survivors) == set(appended) - {3, 100}
    assert all(survivors[k] == appended[k] for k in survivors)


def test_s3_ann_index_end_to_end(s3_env, spark, tmp_path):
    """Registered ANN index lifecycle against an s3:// URI, jar-free:
    build writes the codes/codebooks/files datasets from executors via
    boto3, refresh re-encodes only the appended file, and both flat and
    probed serving read the datasets back through the pyarrow path — the
    probed serve additionally pushing its probe list into the remote scan
    as pyarrow row-group filters (read_parquet_dataset isin)."""
    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    DIM = 8

    def vec(i):
        return [float(((i * 7 + j * 3) % 13) - 6) / 6.0 for j in range(DIM)]

    local = str(tmp_path / "ann_remote")
    df = spark.createDataFrame(
        [(int(i), vec(i)) for i in range(40)], "vid long, emb array<float>"
    )
    DeltaTable.create(spark, local, df.coalesce(2))
    _upload_tree(local, "testbkt", "tables/ann_remote")
    uri = "s3://testbkt/tables/ann_remote"
    t = DeltaTable(spark, uri)

    info = build_ann_index(t, "emb", "vid", DIM, m=2, n_codes=4, n_centroids=4)
    assert info["rows"] == 40 and info["files"] >= 1

    t.append(
        spark.createDataFrame(
            [(int(i), vec(i)) for i in range(40, 50)],
            "vid long, emb array<float>",
        ).coalesce(1)
    )
    t = DeltaTable(spark, uri)
    info = refresh_ann_index(t, "emb")
    assert info["reencoded_files"] >= 1 and info["carried_files"] >= 1

    q = spark.createDataFrame([(45, vec(45))], "vid long, emb array<float>")
    flat = ann_topk(t, q, "vid", "emb", "emb", k=49)
    assert {r["id"] for r in flat.collect()} == set(range(50)) - {45}
    probed = ann_topk(t, q, "vid", "emb", "emb", k=5, n_probes=4)
    rows = probed.collect()
    assert len(rows) == 5 and all(r["cosine"] is not None for r in rows)


def test_s3_identity_columns_end_to_end(s3_env, spark, tmp_path):
    """GENERATED ALWAYS AS IDENTITY on a remote URI: appends through the
    jar-free write plane allocate on-grid values above the high-water
    mark, the mark rides the same commit, and supplying the column is
    rejected — q17-shape assertions against s3://."""
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "ident")
    DeltaTable.create(
        spark, local,
        spark.createDataFrame([("a",), ("b",), ("c",)], "v string"),
        identity_columns={"rid": (100, 10)},
    )
    _upload_tree(local, "testbkt", "tables/ident_remote")
    uri = "s3://testbkt/tables/ident_remote"
    t = DeltaTable(spark, uri)

    before = {r["rid"] for r in t.to_df().collect()}
    assert len(before) == 3 and all((r - 100) % 10 == 0 for r in before)
    hwm0 = int(t.metadata.schema["rid"].metadata["delta.identity.highWaterMark"])

    t.append(spark.createDataFrame([("d",), ("e",)], "v string"))
    t = DeltaTable(spark, uri)
    rows = {r["v"]: r["rid"] for r in t.to_df().collect()}
    assert len(set(rows.values())) == 5  # unique
    assert all((rid - 100) % 10 == 0 for rid in rows.values())  # on grid
    assert rows["d"] > hwm0 and rows["e"] > hwm0
    hwm1 = int(t.metadata.schema["rid"].metadata["delta.identity.highWaterMark"])
    assert hwm1 >= max(rows.values())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(spark.createDataFrame([(999, "x")], "rid long, v string"))


def test_s3_liquid_clustering_end_to_end(s3_env, spark, tmp_path):
    """Clustered tables on an object store, jar-free: register clustering
    columns through the conditional-PUT log, OPTIMIZE reads candidates via
    the Python Data Source and writes the Hilbert cube from executors via
    boto3, converges, and the incremental run touches only the append."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.cluster import cluster_status, optimize_clustered
    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "clust")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k1"),
        ((F.col("id") * 2654435761) % 2000).alias("k2"),
    )
    DeltaTable.create(
        spark, local, df.repartition(3), stat_columns=["k1", "k2"]
    )
    _upload_tree(local, "testbkt", "tables/clustered")
    t = DeltaTable(spark, "s3://testbkt/tables/clustered")
    t.set_clustering_columns(["k1", "k2"])
    m1 = optimize_clustered(t, min_zcube_bytes=0, num_partitions=2)
    assert not m1["noop"] and m1["candidate_files"] == 3
    assert optimize_clustered(t, min_zcube_bytes=0)["noop"]
    t.append(df.where("k1 < 50").selectExpr("k1 + 2000 AS k1", "k2").coalesce(1))
    m2 = optimize_clustered(t, min_zcube_bytes=0, num_partitions=2)
    assert m2["candidate_files"] == 1 and m2["stable_zcubes"] == 1
    st = cluster_status(t)
    assert st["unclustered_files"] == 0 and st["zcubes"] == 2
    assert t.to_df().count() == 2050


def test_s3_type_widening_end_to_end(s3_env, spark, tmp_path):
    """Widen int->long on an s3:// table: the metadata commit goes through
    the remote log, old int32 objects read through the data source's arrow
    cast, and beyond-int32 appends land via the remote writer."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    BIG = 3_000_000_000
    local = str(tmp_path / "tw")
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") % 7).alias("v")
    )
    DeltaTable.create(spark, local, df.coalesce(1), stat_columns=["k"])
    _upload_tree(local, "testbkt", "tables/widen_me")
    t = DeltaTable(spark, "s3://testbkt/tables/widen_me")
    t.widen_column("k", "long")
    assert "typeWidening" in t.state().protocol["readerFeatures"]
    t.append(
        spark.range(0, 5).select((F.col("id") + BIG).alias("k"), F.lit(0).alias("v"))
    )
    out = t.to_df()
    assert dict(out.dtypes)["k"] == "bigint"
    assert out.count() == 105
    assert out.where(f"k >= {BIG}").count() == 5
    # int32-era stats still prune under the widened type
    assert len(t.files_matching(f"k = {BIG + 1}")) == 1


def test_s3_v2_checkpoint_end_to_end(s3_env, spark, tmp_path):
    """V2 checkpoint on an object store: the UUID-named top-level object,
    the _sidecars/ manifest object, and the replay through both."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "v2")
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    DeltaTable.create(spark, local, df.repartition(2), stat_columns=["k"])
    _upload_tree(local, "testbkt", "tables/v2ckpt")
    t = DeltaTable(spark, "s3://testbkt/tables/v2ckpt")
    t.append(df.selectExpr("k + 300 AS k").coalesce(1))
    path = t.log.write_checkpoint(v2=True)
    assert ".checkpoint." in path and not path.endswith("checkpoint.parquet")
    fresh = DeltaTable(spark, "s3://testbkt/tables/v2ckpt")
    assert "v2Checkpoint" in fresh.state().protocol["readerFeatures"]
    assert fresh.to_df().count() == 600
    fresh.append(df.selectExpr("k + 600 AS k").coalesce(1))
    assert DeltaTable(spark, "s3://testbkt/tables/v2ckpt").to_df().count() == 900


def test_s3_cleanup_metadata_end_to_end(s3_env, spark, tmp_path):
    """Log metadata cleanup through the object-store fs layer: superseded
    commit objects vanish, replay from the surviving checkpoint is exact."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    local = str(tmp_path / "clean")
    df = spark.range(10).select(F.col("id").alias("k"))
    DeltaTable.create(spark, local, df.coalesce(1))
    _upload_tree(local, "testbkt", "tables/cleanup_me")
    t = DeltaTable(spark, "s3://testbkt/tables/cleanup_me")
    for i in range(11):  # cross the checkpoint cadence remotely
        t.append(df.selectExpr(f"k + {10 * (i + 1)} AS k").coalesce(1))
    assert t.log._last_checkpoint_version() == 10
    r = t.log.cleanup_metadata(retention_seconds=0.0)
    assert r["deleted"] and t.log._commit_versions()[0] == 10
    fresh = DeltaTable(spark, "s3://testbkt/tables/cleanup_me")
    assert fresh.to_df().count() == 120


@pytest.mark.slow
def test_s3_clustered_multi_writer_stress(s3_env, spark, tmp_path):
    """Round-8 concurrency closer (VERDICT r7 #8): 8 concurrent appenders
    plus a merge-on-read DV DELETE race an OPTIMIZE retry loop on ONE
    clustered s3:// table.  Contract under test:

    - every append lands exactly once (conditional-PUT retry);
    - the DV delete's rows NEVER resurrect — if OPTIMIZE planned against
      pre-DV bytes, the DV-aware conflict check (commit_rewrite) must
      raise ConcurrentRewriteError rather than commit stale data;
    - the OPTIMIZE loop converges once writers stop, with all files
      clustered and the exact surviving row multiset.

    The reference assumes a single writer (lib.rs:876-884); this is the
    multi-writer behavior a shared 100 TB table actually needs."""
    import threading
    import time as _time

    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.cluster import (
        cluster_status,
        optimize_clustered,
    )
    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import (
        ConcurrentRewriteError,
        DeltaTable,
    )

    local = str(tmp_path / "mw")
    base = spark.range(0, 1000).select(
        F.col("id").alias("k1"),
        ((F.col("id") * 2654435761) % 1000).alias("k2"),
    )
    DeltaTable.create(spark, local, base.repartition(2),
                      stat_columns=["k1", "k2"])
    _upload_tree(local, "testbkt", "tables/mw_clustered")
    uri = "s3://testbkt/tables/mw_clustered"
    DeltaTable(spark, uri).set_clustering_columns(["k1", "k2"])

    n_appenders = 8
    rows_per_append = 50
    errors: list = []
    conflicts: list = []
    stop_optimizing = threading.Event()

    def appender(i: int) -> None:
        try:
            t = DeltaTable(spark, uri)
            lo = 10_000 + i * rows_per_append
            t.append(
                spark.range(lo, lo + rows_per_append).select(
                    F.col("id").alias("k1"),
                    ((F.col("id") * 2654435761) % 1000).alias("k2"),
                ).coalesce(1)
            )
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    def deleter() -> None:
        # a real DML job retries a lost rewrite race from a fresh snapshot
        # (ConcurrentRewriteError == "someone rewrote my candidate files",
        # the clean loss the conflict check exists to signal)
        try:
            for _ in range(20):
                try:
                    delete_where_dv(DeltaTable(spark, uri), "k1 % 10 = 3")
                    return
                except ConcurrentRewriteError as exc:
                    conflicts.append(exc)
            raise RuntimeError("deleter never won a race in 20 attempts")
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    def optimizer() -> None:
        # maintenance loop: keep optimizing until writers are done AND a
        # final pass converges; a lost race is a clean retry, never an error
        try:
            while True:
                try:
                    optimize_clustered(DeltaTable(spark, uri),
                                       min_zcube_bytes=0, num_partitions=2)
                except ConcurrentRewriteError as exc:
                    conflicts.append(exc)
                    continue
                if stop_optimizing.is_set():
                    break
                _time.sleep(0.05)
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(i,))
               for i in range(n_appenders)]
    threads.append(threading.Thread(target=deleter))
    opt = threading.Thread(target=optimizer)
    opt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    stop_optimizing.set()
    opt.join(300)
    assert not errors, errors

    # final convergence pass on a fresh handle
    final = DeltaTable(spark, uri)
    m = optimize_clustered(final, min_zcube_bytes=0, num_partitions=2)
    if not m.get("noop"):
        assert optimize_clustered(final, min_zcube_bytes=0)["noop"]

    # Deterministic invariants (appends racing the DELETE may land after
    # its snapshot, so THEIR k1%10=3 rows may legitimately survive):
    # - no row duplicated or resurrected: base k1%10=3 rows are gone for
    #   good (the DELETE's snapshot predates the race; a stale OPTIMIZE
    #   commit would have brought them back),
    # - every base keeper and every appended keeper present exactly once.
    got = [r["k1"] for r in final.to_df().select("k1").collect()]
    gset = set(got)
    assert len(got) == len(gset)  # no duplicates anywhere
    base_keep = {k for k in range(0, 1000) if k % 10 != 3}
    base_gone = {k for k in range(0, 1000) if k % 10 == 3}
    assert base_keep <= gset
    assert not (base_gone & gset)  # DV delete never resurrected
    appended_keep = set()
    appended_all = set()
    for i in range(n_appenders):
        lo = 10_000 + i * rows_per_append
        rng = set(range(lo, lo + rows_per_append))
        appended_all |= rng
        appended_keep |= {k for k in rng if k % 10 != 3}
    assert appended_keep <= gset  # every append landed exactly once
    assert gset <= base_keep | appended_all
    st = cluster_status(final)
    assert st["unclustered_files"] == 0
