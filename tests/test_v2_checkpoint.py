"""V2 checkpoints (protocol ``v2Checkpoint`` feature): UUID-named top-level
file + checkpointMetadata + sidecar-resident file manifest; state equality
with the classic path; replay of post-checkpoint commits."""

import os

from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable


def make_table(spark, path):
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    tbl = DeltaTable.create(spark, path, df.repartition(3), stat_columns=["k"])
    tbl.append(df.selectExpr("k + 200 AS k", "v").coalesce(1))
    return tbl


def state_snapshot(tbl):
    s = tbl.state()
    return (
        sorted((a.path, a.size, a.base_row_id) for a in s.adds),
        s.metadata.configuration,
        sorted(s.txns.items()),
        dict(s.domain_metadata),
    )


def test_v2_checkpoint_roundtrip(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    before = state_snapshot(tbl)
    path = tbl.log.write_checkpoint(v2=True)
    # UUID-named top-level file, sidecar present
    name = os.path.basename(path)
    assert name.endswith(".parquet") and name.count(".") == 3
    sidecars = os.listdir(os.path.join(tbl.table_path, "_delta_log", "_sidecars"))
    assert len(sidecars) == 1
    # the feature was declared in its own commit before the checkpoint
    proto = tbl.state().protocol
    assert "v2Checkpoint" in proto["readerFeatures"]
    assert "v2Checkpoint" in proto["writerFeatures"]
    # a fresh reader replays THROUGH the v2 checkpoint + sidecar
    fresh = DeltaTable(spark, tbl.table_path)
    assert state_snapshot(fresh) == before
    assert fresh.to_df().count() == 400


def test_v2_checkpoint_then_more_commits(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where

    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.log.write_checkpoint(v2=True)
    tbl.append(
        spark.range(400, 420).select(
            F.col("id").alias("k"), F.lit(0).alias("v")
        )
    )
    delete_where(tbl, "k = 5")
    fresh = DeltaTable(spark, tbl.table_path)
    assert fresh.to_df().count() == 419
    # a second v2 checkpoint over the evolved state also round-trips, and
    # the feature declaration is NOT re-committed
    v = tbl.log.latest_version()
    tbl.log.write_checkpoint(v2=True)
    assert tbl.log.latest_version() == v
    assert DeltaTable(spark, tbl.table_path).to_df().count() == 419


def test_v2_checkpoint_preserves_index_and_clustering_metadata(spark, tmp_path):
    from delta_sorter_spark.operators.cluster import cluster_status, optimize_clustered

    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k", "v"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    tbl.log.write_checkpoint(v2=True)
    fresh = DeltaTable(spark, tbl.table_path)
    st = cluster_status(fresh)
    assert st["clustering_columns"] == ["k", "v"]
    assert st["unclustered_files"] == 0 and st["zcubes"] == 1
    assert optimize_clustered(fresh, min_zcube_bytes=0)["noop"]


def test_cli_checkpoint_v2(spark, tmp_path, capsys):
    from delta_sorter_spark import cli

    tbl = make_table(spark, str(tmp_path / "t"))
    assert cli.main(["--table", tbl.table_path, "--checkpoint", "--checkpoint-v2"]) == 0
    out = capsys.readouterr().out
    assert "checkpoint written" in out
    assert DeltaTable(spark, tbl.table_path).to_df().count() == 400


def test_checkpoint_interval_property_honored(spark, tmp_path):
    """delta.checkpointInterval overrides the engine-default cadence (10)."""
    df = spark.range(5).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    tbl.set_table_properties({"delta.checkpointInterval": "3"})
    for i in range(4):
        tbl.append(df.selectExpr(f"k + {5 * (i + 1)} AS k").coalesce(1))
    # commits: v0 create + v1 data + v2 property + v3..v6 appends;
    # interval 3 -> checkpoints at v3 and v6 (default 10 would write none)
    assert tbl.log._last_checkpoint_version() == 6
    assert os.path.exists(
        os.path.join(
            tbl.table_path, "_delta_log", f"{3:020d}.checkpoint.parquet"
        )
    )
    assert DeltaTable(spark, tbl.table_path).to_df().count() == 25


def test_cleanup_metadata_trims_superseded_log(spark, tmp_path):
    """Log metadata cleanup: commits and checkpoints superseded by the
    latest checkpoint vanish (once past retention), replay stays exact,
    and pre-cutoff time travel degrades to a clear range error."""
    df = spark.range(5).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    for i in range(12):  # versions 2..13; auto-checkpoints at v10
        tbl.append(df.selectExpr(f"k + {5 * (i + 1)} AS k").coalesce(1))
    assert tbl.log._last_checkpoint_version() == 10
    n_before = tbl.to_df().count()

    r = tbl.log.cleanup_metadata(retention_seconds=0.0, dry_run=True)
    assert r["cutoff_version"] == 10 and len(r["deleted"]) > 0
    assert all(".json" in d or "checkpoint" in d for d in r["deleted"])
    # dry run deleted nothing
    assert tbl.log._commit_versions()[0] == 0

    r = tbl.log.cleanup_metadata(retention_seconds=0.0)
    assert tbl.log._commit_versions()[0] == 10  # pre-checkpoint json gone
    fresh = DeltaTable(spark, tbl.table_path)
    assert fresh.to_df().count() == n_before
    assert fresh.to_df(version=12).count() == n_before - 5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in log range"):
        fresh.to_df(version=5)
    # retention window protects everything (fresh files)
    assert tbl.log.cleanup_metadata(retention_seconds=3600.0)["deleted"] == []


def test_cleanup_metadata_keeps_referenced_sidecars(spark, tmp_path):
    df = spark.range(50).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    tbl.append(df.selectExpr("k + 50 AS k").coalesce(1))
    tbl.log.write_checkpoint(v2=True)  # v3 (incl. feature commit)
    tbl.append(df.selectExpr("k + 100 AS k").coalesce(1))
    tbl.log.write_checkpoint(v2=True)  # v4: supersedes v3's sidecar
    sc_dir = os.path.join(tbl.table_path, "_delta_log", "_sidecars")
    assert len(os.listdir(sc_dir)) == 2
    r = tbl.log.cleanup_metadata(retention_seconds=0.0)
    # v3's checkpoint + sidecar collected; v4's survive
    assert len(os.listdir(sc_dir)) == 1
    assert any("_sidecars/" in d for d in r["deleted"])
    fresh = DeltaTable(spark, tbl.table_path)
    assert fresh.to_df().count() == 150


def test_cli_cleanup_log(spark, tmp_path, capsys):
    from delta_sorter_spark import cli

    df = spark.range(5).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    for i in range(12):
        tbl.append(df.selectExpr(f"k + {5 * (i + 1)} AS k").coalesce(1))
    assert cli.main(
        ["--table", tbl.table_path, "--cleanup-log", "--dry-run"]
    ) == 0
    out = capsys.readouterr().out
    # default 720h retention: everything is younger -> nothing to delete
    assert "would delete 0 file(s)" in out
    assert cli.main(
        ["--table", tbl.table_path, "--cleanup-log", "--retention-hours", "1e-9"]
    ) == 0
    assert "deleted" in capsys.readouterr().out
    assert DeltaTable(spark, tbl.table_path).to_df().count() == 65


def test_checkpoint_policy_property_drives_auto_v2(spark, tmp_path):
    """delta.checkpointPolicy=v2: interval-driven automatic checkpoints
    use the v2 layout (UUID-named top-level + _sidecars manifest)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "ckpol")
    tbl = DeltaTable.create(
        spark, path, spark.range(5).select(F.col("id").alias("k")).coalesce(1)
    )
    tbl.set_table_properties(
        {"delta.checkpointInterval": "3", "delta.checkpointPolicy": "v2"}
    )
    for i in range(4):
        tbl.append(
            spark.range(5).select((F.col("id") + 10 * i).alias("k")).coalesce(1)
        )
    log_dir = os.path.join(path, "_delta_log")
    uuid_cks = [
        p for p in glob.glob(os.path.join(log_dir, "*.checkpoint.*.parquet"))
        if "compat" not in p
    ]
    assert uuid_cks, "no v2 (UUID-named) checkpoint written by the interval"
    assert glob.glob(os.path.join(log_dir, "_sidecars", "*.parquet"))
    # replay through the v2 checkpoint stays exact
    assert tbl.to_df().count() == 25
