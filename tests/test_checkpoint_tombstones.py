"""Checkpoint tombstones + DV-aware rewrite conflicts (round 8).

The Delta protocol requires checkpoints to carry ``remove`` tombstones
younger than ``delta.deletedFileRetentionDuration`` (default 1 week), and
— for V2 checkpoints — to place ALL file actions (add AND remove) in
sidecar files.  commit_rewrite must also detect a concurrent re-Add of a
path it plans to remove (e.g. delete_where_dv attaching a deletion
vector), not just a vanished path: committing a rewrite materialized from
the pre-DV bytes would resurrect the concurrently deleted rows.
"""

import io
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import (
    ConcurrentRewriteError,
    DeltaTable,
)


def _make(spark, path, n=100):
    df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    return DeltaTable.create(spark, path, df.coalesce(1))


def _checkpoint_rows(path):
    with open(path, "rb") as fh:
        return pq.read_table(io.BytesIO(fh.read())).to_pylist()


def test_checkpoint_carries_unexpired_tombstones(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where

    tbl = _make(spark, str(tmp_path / "t"))
    delete_where(tbl, "k < 10")  # tombstones the original file
    assert tbl.state().tombstones  # replay tracked the remove

    ckpt = tbl.log.write_checkpoint()
    removes = [r["remove"] for r in _checkpoint_rows(ckpt) if r.get("remove")]
    assert len(removes) == 1
    assert removes[0]["deletionTimestamp"] is not None

    # a fresh reader replaying THROUGH the checkpoint still sees the
    # tombstone (this is what keeps any reader's VACUUM correct after
    # cleanup_metadata deletes the pre-checkpoint commit json)
    tbl.log.cleanup_metadata(retention_seconds=0.0)
    fresh = DeltaTable(spark, tbl.table_path)
    assert removes[0]["path"] in fresh.state().tombstones
    assert fresh.to_df().count() == 90


def test_checkpoint_drops_expired_tombstones(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where

    tbl = _make(spark, str(tmp_path / "t"))
    tbl.set_table_properties(
        {"delta.deletedFileRetentionDuration": "interval 0 seconds"}
    )
    delete_where(tbl, "k < 10")
    ckpt = tbl.log.write_checkpoint()
    assert not [r for r in _checkpoint_rows(ckpt) if r.get("remove")]


def test_readd_clears_tombstone(spark, tmp_path):
    """A re-Add of the same path supersedes its tombstone in replay."""
    from delta_sorter_spark.api import compact

    tbl = _make(spark, str(tmp_path / "t"))
    # the create data is sorted by k, so compact on v forces a rewrite
    compact(tbl.table_path, ["v"], spark=spark)  # removes + adds
    st = tbl.state()
    active = {a.path for a in st.adds}
    assert st.tombstones and active.isdisjoint(st.tombstones)


def test_v2_checkpoint_routes_removes_to_sidecar(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where

    tbl = _make(spark, str(tmp_path / "t"))
    delete_where(tbl, "k < 10")
    ckpt = tbl.log.write_checkpoint(v2=True)

    top = _checkpoint_rows(ckpt)
    # top-level UUID file: NO file actions of either kind
    assert not [r for r in top if r.get("add") or r.get("remove")]
    assert [r for r in top if r.get("checkpointMetadata")]
    sc = [r["sidecar"]["path"] for r in top if r.get("sidecar")]
    assert len(sc) == 1
    sc_rows = _checkpoint_rows(
        os.path.join(tbl.table_path, "_delta_log", "_sidecars", sc[0])
    )
    assert [r for r in sc_rows if r.get("add")]
    assert [r for r in sc_rows if r.get("remove")]
    # and the v2 round-trip still replays tombstones
    fresh = DeltaTable(spark, tbl.table_path)
    assert fresh.state().tombstones
    assert fresh.to_df().count() == 90


def test_tombstone_retains_deletion_vector(spark, tmp_path):
    """A remove of a DV-carrying file keeps the DV descriptor through the
    log AND through a checkpoint round-trip, so any reader's VACUUM can
    still reclaim the DV file after log cleanup (protocol: removes retain
    the removed file version's deletionVector)."""
    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = _make(spark, str(tmp_path / "t"))
    delete_where_dv(tbl, "k < 10")  # attaches a DV to the single file
    dv_before = {a.path: a.deletion_vector for a in tbl.state().adds}
    assert any(dv_before.values())

    # rewrite removes the DV-carrying file (data unsorted on v -> rewrite)
    compact(tbl.table_path, ["v"], spark=spark)
    st = tbl.state()
    carried = {
        p: r.get("deletionVector")
        for p, r in st.tombstones.items()
        if dv_before.get(p) is not None
    }
    assert carried and all(v is not None for v in carried.values())
    assert all(r.get("extendedFileMetadata") for r in st.tombstones.values())

    # checkpoint round-trip: the re-emitted remove still carries the DV
    ckpt = tbl.log.write_checkpoint()
    removes = [r["remove"] for r in _checkpoint_rows(ckpt) if r.get("remove")]
    with_dv = [
        r for r in removes
        if (r.get("deletionVector") or {}).get("pathOrInlineDv")
    ]
    assert with_dv
    tbl.log.cleanup_metadata(retention_seconds=0.0)
    fresh = DeltaTable(spark, tbl.table_path)
    fresh_ts = fresh.state().tombstones
    for p in carried:
        assert fresh_ts[p].get("deletionVector") is not None
    assert fresh.to_df().count() == 90


def test_cleanup_metadata_refuses_stale_pointer(spark, tmp_path):
    """A _last_checkpoint pointing at a missing/corrupt checkpoint must
    make cleanup a no-op instead of destroying the only replayable log."""
    df = spark.range(5).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    for i in range(12):  # auto-checkpoint at v10
        tbl.append(df.selectExpr(f"k + {5 * (i + 1)} AS k").coalesce(1))
    log_dir = os.path.join(tbl.table_path, "_delta_log")

    # stale pointer: names a version with no checkpoint file
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 9, "size": 1}))
    r = tbl.log.cleanup_metadata(retention_seconds=0.0)
    assert r["deleted"] == []
    assert tbl.log._commit_versions()[0] == 0  # nothing destroyed

    # corrupt checkpoint bytes at the pointed version
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 10, "size": 1}))
    ckpt = os.path.join(log_dir, f"{10:020d}.checkpoint.parquet")
    with open(ckpt, "wb") as fh:
        fh.write(b"not a parquet file")
    r = tbl.log.cleanup_metadata(retention_seconds=0.0)
    assert r["deleted"] == []
    assert tbl.log._commit_versions()[0] == 0


def test_rewrite_detects_concurrent_dv_delete(spark, tmp_path):
    """OPTIMIZE-style rewrite planned before a concurrent delete_where_dv
    must lose the race (ConcurrentRewriteError), not resurrect rows."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = _make(spark, str(tmp_path / "t"))
    st = tbl.state()
    # plan a rewrite of every active file (what compact/OPTIMIZE does)
    removes = [a.remove_action(False) for a in st.adds]
    staged = tbl.stage_write(tbl.to_df().orderBy("k"), data_change=False)

    # concurrent writer: DV-delete re-Adds the same path with a deletion
    # vector (path stays ACTIVE — the pre-round-8 check missed this)
    delete_where_dv(tbl, "k < 10")
    assert {a.path for a in tbl.state().adds} == {a.path for a in st.adds}

    with pytest.raises(ConcurrentRewriteError, match="re-added"):
        tbl.commit_rewrite(staged, removes, operation="OPTIMIZE")
    tbl.discard_files(staged)
    # victim's delete is intact
    assert tbl.to_df().count() == 90


def test_rewrite_detects_concurrent_plain_rewrite(spark, tmp_path):
    """The original vanished-path detection still works."""
    from delta_sorter_spark.api import compact

    tbl = _make(spark, str(tmp_path / "t"))
    st = tbl.state()
    removes = [a.remove_action(False) for a in st.adds]
    staged = tbl.stage_write(tbl.to_df().orderBy("k"), data_change=False)
    compact(tbl.table_path, ["v"], spark=spark)  # concurrent rewrite
    with pytest.raises(ConcurrentRewriteError, match="rewritten"):
        tbl.commit_rewrite(staged, removes, operation="OPTIMIZE")
    tbl.discard_files(staged)
    assert tbl.to_df().count() == 100
