"""Clustered tables (liquid clustering): registration protocol surface,
incremental OPTIMIZE convergence, pruning payoff, checkpoint round-trip,
row-tracking interplay."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.cluster import (
    cluster_status,
    optimize_clustered,
)
from delta_sorter_spark.sources.delta_table import DeltaTable

N = 4_000


def make_table(spark, path, files=4, n=N):
    # k1 ordered by insertion; k2 scrambled relative to k1 so ingest order
    # gives k2 zero locality (every file spans the whole k2 range).
    df = spark.range(0, n).select(
        F.col("id").alias("k1"),
        ((F.col("id") * 2654435761) % n).alias("k2"),
        (F.col("id") % 97).alias("v"),
    )
    return DeltaTable.create(
        spark,
        path,
        df.repartitionByRange(files, "k1").sortWithinPartitions("k1"),
        stat_columns=["k1", "k2"],
    )


def append_batch(tbl, spark, start, n=500):
    df = spark.range(start, start + n).select(
        F.col("id").alias("k1"),
        ((F.col("id") * 2654435761) % N).alias("k2"),
        (F.col("id") % 97).alias("v"),
    )
    tbl.append(df.coalesce(1))


def table_hash(tbl):
    return (
        tbl.to_df()
        .agg(
            F.count("*").alias("n"),
            F.sum(F.hash("k1", "k2", "v").cast("long")).alias("h"),
        )
        .collect()[0]
    )


def test_register_clustering_columns(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    assert tbl.clustering_columns() == []
    v = tbl.set_clustering_columns(["k1", "k2"])
    state = tbl.state()
    assert tbl.clustering_columns(state) == ["k1", "k2"]
    feats = set(state.protocol.get("writerFeatures") or [])
    assert {"clusteredTable", "domainMetadata"} <= feats
    # registration is metadata-only: files untouched, still unclustered
    assert all(a.clustering_provider is None for a in state.adds)
    # idempotent: same columns -> no new commit version
    assert tbl.set_clustering_columns(["k1", "k2"]) == v
    with pytest.raises(ValueError, match="not in schema"):
        tbl.set_clustering_columns(["nope"])


def test_register_rejects_partition_columns(spark, tmp_path):
    df = spark.range(0, 100).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("k")
    )
    tbl = DeltaTable.create(spark, str(tmp_path / "p"), df, partition_columns=["p"])
    # the protocol forbids clustering a partitioned table at all
    with pytest.raises(ValueError, match="must not be partitioned"):
        tbl.set_clustering_columns(["p"])
    with pytest.raises(ValueError, match="must not be partitioned"):
        tbl.set_clustering_columns(["k"])


def test_optimize_converges_and_is_incremental(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    before = table_hash(tbl)
    tbl.set_clustering_columns(["k1", "k2"])

    # first optimize folds every (unclustered) file into one ZCube
    m1 = optimize_clustered(tbl, min_zcube_bytes=0)
    assert not m1["noop"] and m1["candidate_files"] == 4 and m1["files_out"] >= 1
    state = tbl.state()
    assert all(
        a.clustering_provider == DeltaTable.CLUSTERING_PROVIDER for a in state.adds
    )
    zids = {(a.tags or {}).get(DeltaTable.ZCUBE_TAG) for a in state.adds}
    assert zids == {m1["zcube_id"]}
    assert table_hash(tbl) == before

    # no new data -> no-op, no commit
    v = tbl.log.latest_version()
    m2 = optimize_clustered(tbl, min_zcube_bytes=0)
    assert m2["noop"] and tbl.log.latest_version() == v

    # new appends are the ONLY candidates of the next optimize
    append_batch(tbl, spark, N)
    append_batch(tbl, spark, N + 500)
    m3 = optimize_clustered(tbl, min_zcube_bytes=0)
    assert m3["candidate_files"] == 2 and m3["unclustered_files"] == 2
    assert m3["stable_zcubes"] == 1  # the first cube was left alone
    st = cluster_status(tbl)
    assert st["zcubes"] == 2 and st["unclustered_files"] == 0


def test_partial_zcubes_merge(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"), files=2, n=1000)
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl)  # default min size: tiny cube -> partial
    append_batch(tbl, spark, 1000, n=200)
    m = optimize_clustered(tbl)
    # partial cube + new file merged into ONE new cube
    assert m["partial_zcubes"] == 1 and m["unclustered_files"] == 1
    assert cluster_status(tbl)["zcubes"] == 1
    # single partial cube, no new data -> converged
    assert optimize_clustered(tbl)["noop"]


def test_dry_run_commits_nothing(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    v = tbl.log.latest_version()
    m = optimize_clustered(tbl, dry_run=True)
    assert not m["noop"] and m["candidate_files"] == 4 and m["files_out"] == 0
    assert tbl.log.latest_version() == v


def test_clustering_prunes_both_columns(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"), files=8)
    # ingest layout: k1 clusters perfectly, k2 not at all
    assert len(tbl.files_matching(f"k2 = {N // 2 + 1}")) == 8
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=8)
    n_files = len(tbl.state().adds)
    assert n_files >= 4
    # Hilbert layout: point predicates prune files on BOTH dimensions
    kept_k2 = len(tbl.files_matching(f"k2 = {N // 2 + 1}"))
    kept_k1 = len(tbl.files_matching(f"k1 = {N // 4 + 1}"))
    assert kept_k2 < n_files and kept_k1 < n_files
    # rows stay exact through the pruned read
    assert tbl.to_df(where=f"k2 = {N // 2 + 1}").count() == 1


def test_checkpoint_roundtrips_clustering_attestation(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    tbl.log.write_checkpoint()
    fresh = DeltaTable(spark, tbl.table_path)
    st = cluster_status(fresh)
    assert st["clustering_columns"] == ["k1", "k2"]
    assert st["unclustered_files"] == 0 and st["zcubes"] == 1
    # attestation survived the checkpoint -> still converged
    assert optimize_clustered(fresh, min_zcube_bytes=0)["noop"]


def test_reclustering_on_new_columns_rewrites_all(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    tbl.set_clustering_columns(["k2", "v"])
    # old cubes were attested for (k1,k2): they are candidates again
    st = cluster_status(tbl)
    assert st["clustered_files"] == 0
    m = optimize_clustered(tbl, min_zcube_bytes=0)
    assert m["candidate_files"] == st["unclustered_files"] and not m["noop"]
    assert cluster_status(tbl)["unclustered_files"] == 0


def test_row_ids_survive_cluster_rewrite(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"), files=2, n=1000)
    tbl.enable_row_tracking()
    ids_before = {
        (r["k1"], r["_row_id"])
        for r in tbl.to_df_with_row_ids().select("k1", "_row_id").collect()
    }
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    ids_after = {
        (r["k1"], r["_row_id"])
        for r in tbl.to_df_with_row_ids().select("k1", "_row_id").collect()
    }
    assert ids_after == ids_before


def test_string_clustering_falls_back_to_range_sort(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.lpad(((F.col("id") * 7919) % 1000).cast("string"), 4, "0")).alias("u"),
        F.col("id").alias("k"),
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "s"), df.repartition(4), stat_columns=["u"]
    )
    assert len(tbl.files_matching("u = 'u0500'")) == 4
    tbl.set_clustering_columns(["u"])
    optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=4)
    assert len(tbl.files_matching("u = 'u0500'")) == 1
    assert tbl.to_df().count() == 1000


def test_cli_cluster_verbs(spark, tmp_path, capsys):
    from delta_sorter_spark import cli

    tbl = make_table(spark, str(tmp_path / "t"))
    path = tbl.table_path
    assert cli.main(["--table", path, "--cluster-by", "k1,k2"]) == 0
    assert "clustering columns set cols=k1,k2" in capsys.readouterr().out
    assert cli.main(["--table", path, "--optimize-clustered", "--dry-run"]) == 0
    assert "would rewrite 4 file(s)" in capsys.readouterr().out
    assert cli.main(
        ["--table", path, "--optimize-clustered", "--min-zcube-bytes", "0"]
    ) == 0
    assert "rewrote 4 file(s)" in capsys.readouterr().out
    assert cli.main(
        ["--table", path, "--optimize-clustered", "--min-zcube-bytes", "0"]
    ) == 0
    assert "converged" in capsys.readouterr().out
    assert cli.main(["--table", path, "--cluster-status"]) == 0
    out = capsys.readouterr().out
    assert "cols=k1,k2" in out and "unclustered=0" in out and "zcubes=1" in out
    assert cli.main(["--table", path, "--cluster-by", "nope"]) == 2


def test_concurrent_append_during_optimize_survives(spark, tmp_path):
    """An append landing between OPTIMIZE's plan and commit must not be
    lost: the rewrite removes only its candidate files, so the commit
    retries cleanly and the new file simply stays unclustered (the next
    OPTIMIZE's candidate)."""
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])

    from delta_sorter_spark.operators import cluster as cluster_mod

    orig = tbl.read_for_rewrite
    fired = {}

    def hooked(adds, meta=None):
        if not fired:
            fired["x"] = True
            append_batch(tbl, spark, N)  # sneaks in mid-optimize
        return orig(adds, meta)

    tbl.read_for_rewrite = hooked
    m = optimize_clustered(tbl, min_zcube_bytes=0)
    tbl.read_for_rewrite = orig
    assert not m["noop"] and m["candidate_files"] == 4
    assert tbl.to_df().count() == N + 500  # nothing lost
    st = cluster_status(tbl)
    assert st["unclustered_files"] == 1  # the concurrent append
    m2 = optimize_clustered(tbl, min_zcube_bytes=0)
    assert m2["candidate_files"] >= 1 and cluster_status(tbl)["unclustered_files"] == 0


def test_vacuum_collects_pre_cluster_files(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    doomed = tbl.vacuum()
    assert len(doomed) >= 4  # the pre-cluster layout
    assert tbl.to_df().count() == N
    assert optimize_clustered(tbl, min_zcube_bytes=0)["noop"]


def test_clone_carries_clustering(spark, tmp_path):
    """A shallow clone re-Adds the SAME files, so the clustering domain AND
    the per-file ZCube attestation ride along: the clone is born converged
    (unlike index specs, which are layout-local and dropped)."""
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    dst = DeltaTable.clone(spark, tbl.table_path, str(tmp_path / "clone"))
    st = cluster_status(dst)
    assert st["clustering_columns"] == ["k1", "k2"]
    assert st["unclustered_files"] == 0 and st["zcubes"] == 1
    assert optimize_clustered(dst, min_zcube_bytes=0)["noop"]
    # clone-side appends cluster clone-locally; the source is untouched
    append_batch(dst, spark, N)
    m = optimize_clustered(dst, min_zcube_bytes=0)
    assert m["candidate_files"] == 1 and not m["noop"]
    assert cluster_status(tbl)["zcubes"] == 1


def test_detail_reports_clustering_columns(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"), files=2, n=500)
    assert tbl.detail()["clusteringColumns"] == []
    tbl.set_clustering_columns(["k1", "k2"])
    d = tbl.detail()
    assert d["clusteringColumns"] == ["k1", "k2"]
    assert "clusteredTable" in d["tableFeatures"]


def test_dv_delete_keeps_cube_clustered(spark, tmp_path):
    """A merge-on-read DELETE re-Adds the same physical file with a DV —
    the clustering attestation must ride along (the bytes ARE still
    curve-ordered), so the cube is not demoted and OPTIMIZE stays a no-op;
    a later rewrite that folds the cube in applies the DV physically."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    delete_where_dv(tbl, "k1 % 100 = 7")
    st = cluster_status(tbl)
    assert st["unclustered_files"] == 0  # DV'd files stay attested
    assert optimize_clustered(tbl, min_zcube_bytes=0)["noop"]
    assert tbl.to_df().count() == N - N // 100
    # merging the (now partial-by-policy) cube with new data purges the DV
    append_batch(tbl, spark, N)
    optimize_clustered(tbl, min_zcube_bytes=1 << 40)  # everything partial
    state = tbl.state()
    assert all(a.deletion_vector is None for a in state.adds)
    assert tbl.to_df().count() == N - N // 100 + 500


def test_optimize_write_clusters_on_ingest(spark, tmp_path):
    """delta.autoOptimize.optimizeWrite on a clustered table: the batch
    curve-lays itself out and lands as its OWN ZCube, so OPTIMIZE only
    merges partial cubes instead of re-laying raw appends."""
    tbl = make_table(spark, str(tmp_path / "t"), files=2, n=1000)
    tbl.set_clustering_columns(["k1", "k2"])
    optimize_clustered(tbl, min_zcube_bytes=0)
    tbl.set_table_properties({"delta.autoOptimize.optimizeWrite": "true"})

    append_batch(tbl, spark, 1000, n=400)
    st = cluster_status(tbl)
    assert st["unclustered_files"] == 0  # the append IS clustered
    assert st["zcubes"] == 2
    # stable-cube policy: nothing to merge -> converged without a rewrite
    assert optimize_clustered(tbl, min_zcube_bytes=0)["noop"]
    # param override beats the property
    tbl.append(
        spark.range(1400, 1500).select(
            F.col("id").alias("k1"),
            ((F.col("id") * 2654435761) % N).alias("k2"),
            (F.col("id") % 97).alias("v"),
        ),
        optimize_write=False,
    )
    assert cluster_status(tbl)["unclustered_files"] >= 1
    # default min-cube policy merges the small cubes + the raw append
    m = optimize_clustered(tbl)
    assert not m["noop"] and cluster_status(tbl)["zcubes"] == 1
    assert tbl.to_df().count() == 1500
