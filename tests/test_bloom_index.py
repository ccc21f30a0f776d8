"""Per-file Bloom filter index (operators/bloom_index.py).

The shape under test: a table clustered by one column (so zone maps serve
range predicates on it) gets a Bloom index on a second, UNCLUSTERED
high-cardinality column; point lookups on that column must prune to the
bloom-hit files with zero false negatives, DML must ride the same planner,
staleness must fail safe, and vacuum must respect the registered dataset
while collecting replaced ones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.bloom_index import (
    bloom_prune_adds,
    bloom_specs,
    build_bloom_index,
    drop_bloom_index,
    value_positions,
)
from delta_sorter_spark.sources.delta_table import DeltaTable

N = 2_000
FILES = 8


@pytest.fixture()
def indexed_table(spark, tmp_path):
    # clustered by k; doc_id scatters uniformly across every file
    df = spark.range(0, N).select(
        F.col("id").alias("k"),
        F.concat(F.lit("doc-"), ((F.col("id") * 7919) % N).cast("string")).alias(
            "doc_id"
        ),
        (F.col("id") % 13).alias("v"),
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(FILES, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    build_bloom_index(tbl, "doc_id", m_bits=1 << 14)
    return tbl


def test_build_registers_spec_and_prunes_point_lookup(indexed_table):
    tbl = indexed_table
    spec = bloom_specs(tbl)["doc_id"]
    assert spec["m"] == 1 << 14 and spec["k"] == 3

    state = tbl.state()
    # zone maps alone can't prune doc_id (unclustered: every file overlaps)
    from delta_sorter_spark.functions.skipping import prune_adds

    zone_only = prune_adds(
        state.adds, "doc_id = 'doc-123'", state.metadata.schema, []
    )
    assert len(zone_only) == FILES
    # bloom prunes to the file(s) actually containing the value
    kept = tbl.files_matching("doc_id = 'doc-123'")
    assert 1 <= len(kept) <= 2
    got = tbl.to_df(adds=kept).where("doc_id = 'doc-123'").count()
    assert got == 1


def test_no_false_negatives_on_sample(indexed_table):
    tbl = indexed_table
    state = tbl.state()
    rows = (
        tbl.to_df()
        .select("doc_id")
        .where(F.col("k") % 97 == 0)
        .collect()
    )
    assert rows
    for r in rows:
        kept = bloom_prune_adds(
            tbl, state.adds, f"doc_id = '{r['doc_id']}'", state.metadata
        )
        found = (
            tbl.to_df(adds=kept).where(F.col("doc_id") == r["doc_id"]).count()
        )
        assert found >= 1, r["doc_id"]


def test_in_list_and_conjunction(indexed_table):
    tbl = indexed_table
    kept = tbl.files_matching("doc_id IN ('doc-5', 'doc-900') AND v >= 0")
    assert 1 <= len(kept) <= 4
    assert (
        tbl.to_df(adds=kept)
        .where("doc_id IN ('doc-5', 'doc-900')")
        .count()
        == 2
    )
    # OR-side equalities are NOT mandatory -> bloom must not prune on them
    state = tbl.state()
    kept_or = bloom_prune_adds(
        tbl, state.adds, "doc_id = 'doc-5' OR v = 3", state.metadata
    )
    assert len(kept_or) == FILES


def test_absent_value_prunes_everything(indexed_table):
    assert indexed_table.files_matching("doc_id = 'nope'") == []
    # and DML rides the same planner: a no-match delete scans nothing
    from delta_sorter_spark.operators.dml import delete_where

    v = indexed_table.state().version
    res = delete_where(indexed_table, "doc_id = 'no-such-doc'")
    assert res == {"rewritten_files": 0, "deleted_rows": 0, "version": v}


def test_point_delete_touches_only_bloom_hit_files(indexed_table):
    from delta_sorter_spark.operators.dml import delete_where_dv

    res = delete_where_dv(indexed_table, "doc_id = 'doc-77'")
    assert res["deleted_rows"] == 1
    assert res["dv_files"] == 1
    assert indexed_table.to_df().where("doc_id = 'doc-77'").count() == 0


def test_stale_index_fails_safe(indexed_table, spark):
    tbl = indexed_table
    tbl.append(
        spark.createDataFrame(
            [(99_991, "doc-new", 1)], "k long, doc_id string, v long"
        )
    )
    # the new file is not in the index -> it must survive the probe
    kept = tbl.files_matching("doc_id = 'doc-new'")
    assert tbl.to_df(adds=kept).where("doc_id = 'doc-new'").count() == 1


def test_rebuild_drop_and_vacuum(indexed_table, spark):
    tbl = indexed_table
    old_spec = bloom_specs(tbl)["doc_id"]
    build_bloom_index(tbl, "doc_id", m_bits=1 << 14)
    new_spec = bloom_specs(tbl)["doc_id"]
    assert new_spec["path"] != old_spec["path"]
    # replaced dataset is unregistered -> vacuum collects it, keeps the new
    doomed = tbl.vacuum()
    assert any(p.startswith(old_spec["path"]) for p in doomed)
    assert not any(p.startswith(new_spec["path"]) for p in doomed)
    # index still works after the vacuum
    assert 1 <= len(tbl.files_matching("doc_id = 'doc-123'")) <= 2
    drop_bloom_index(tbl, "doc_id")
    assert "doc_id" not in bloom_specs(tbl)
    assert len(tbl.files_matching("doc_id = 'doc-123'")) == FILES
    with pytest.raises(KeyError):
        drop_bloom_index(tbl, "doc_id")


def test_build_validation(indexed_table, spark, tmp_path):
    with pytest.raises(ValueError):
        build_bloom_index(indexed_table, "nope")
    df = spark.createDataFrame([(1.5, "a")], "f double, s string")
    t2 = DeltaTable.create(spark, str(tmp_path / "t2"), df)
    with pytest.raises(ValueError):
        build_bloom_index(t2, "f")  # float: string form is ambiguous
    df3 = spark.createDataFrame([(1, "eu")], "k long, region string")
    t3 = DeltaTable.create(
        spark, str(tmp_path / "t3"), df3, partition_columns=["region"]
    )
    with pytest.raises(ValueError):
        build_bloom_index(t3, "region")  # partition pruning serves it


def test_integer_column_index(spark, tmp_path):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 271) % 500).alias("uid")
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "ti"),
        df.repartitionByRange(5, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    build_bloom_index(tbl, "uid", m_bits=1 << 13)
    kept = tbl.files_matching("uid = 123")
    assert 1 <= len(kept) <= 2
    assert tbl.to_df(adds=kept).where("uid = 123").count() == 1


def test_integer_probe_literal_normalization(spark, tmp_path):
    """The index hashes CAST(col AS STRING) ('5'); the probe must hash the
    SAME canonical form for any literal Spark would treat as equal.
    uid = 5.0 matches uid = 5 in Spark — probing str(5.0) = '5.0' would
    prove absence and silently drop the file that contains the row."""
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 271) % 500).alias("uid")
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "tc"),
        df.repartitionByRange(5, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    build_bloom_index(tbl, "uid", m_bits=1 << 13)
    state = tbl.state()

    # integral float literal: normalized to '5', same files as uid = 5
    kept_f = bloom_prune_adds(tbl, state.adds, "uid = 5.0", state.metadata)
    kept_i = bloom_prune_adds(tbl, state.adds, "uid = 5", state.metadata)
    assert {a.path for a in kept_f} == {a.path for a in kept_i}
    assert tbl.to_df(adds=kept_f).where("uid = 5").count() == 1

    # bool literal: 'True' never matches the stored '1' — must prove
    # nothing (keep everything), not prune on the wrong hash
    kept_b = bloom_prune_adds(tbl, state.adds, "uid = TRUE", state.metadata)
    assert len(kept_b) == len(state.adds)

    # non-integral float: un-normalizable, probe proves nothing
    kept_h = bloom_prune_adds(tbl, state.adds, "uid = 5.5", state.metadata)
    assert len(kept_h) == len(state.adds)

    # IN list mixing shapes normalizes per-value
    kept_in = bloom_prune_adds(
        tbl, state.adds, "uid IN (5.0, 123)", state.metadata
    )
    assert tbl.to_df(adds=kept_in).where("uid IN (5, 123)").count() == 2


def test_string_column_rejects_numeric_literal(indexed_table):
    """doc_id = 5 on a string column: Spark's comparison casts; the probe
    must not pretend str(5) is the value's canonical form."""
    tbl = indexed_table
    state = tbl.state()
    kept = bloom_prune_adds(tbl, state.adds, "doc_id = 5", state.metadata)
    assert len(kept) == len(state.adds)


def test_vacuum_spares_inflight_build(indexed_table):
    """An index dataset written but not yet registered carries a _BUILDING
    marker; vacuum must not collect it inside the grace window, and must
    collect it once the marker ages out (crashed build)."""
    import os
    import time

    from delta_sorter_spark.operators.bloom_index import (
        BUILDING_MARKER,
        _mark_building,
    )

    tbl = indexed_table
    # simulate a build mid-window: marker + a dataset part, no registration
    rel = "_bloom_index/doc_id/deadbeef"
    _mark_building(tbl, rel)
    part = os.path.join(tbl.table_path, rel, "part-00000.parquet")
    with open(part, "wb") as fh:
        fh.write(b"not-a-real-parquet")
    doomed = tbl.vacuum(dry_run=True)
    assert not any(d.startswith(rel) for d in doomed)

    # crashed build: marker ages past the grace window -> collectable
    marker = os.path.join(tbl.table_path, rel, BUILDING_MARKER)
    old = time.time() - 3600
    os.utime(marker, (old, old))
    doomed = tbl.vacuum(dry_run=True)
    assert any(d.startswith(rel) for d in doomed)


def test_completed_build_leaves_no_marker(indexed_table):
    import os

    from delta_sorter_spark.operators.bloom_index import BUILDING_MARKER

    spec = bloom_specs(indexed_table)["doc_id"]
    assert not os.path.exists(
        os.path.join(indexed_table.table_path, spec["path"], BUILDING_MARKER)
    )


def test_positions_are_deterministic():
    assert value_positions("doc-1", 1 << 14, 3, 42) == value_positions(
        "doc-1", 1 << 14, 3, 42
    )
    assert value_positions("doc-1", 1 << 14, 3, 42) != value_positions(
        "doc-2", 1 << 14, 3, 42
    )


def test_refresh_covers_appended_files(indexed_table, spark):
    from delta_sorter_spark.operators.bloom_index import refresh_bloom_index

    tbl = indexed_table
    spec0 = bloom_specs(tbl)["doc_id"]
    tbl.append(
        spark.createDataFrame(
            [(100_000 + i, f"doc-extra-{i}", 1) for i in range(5)],
            "k long, doc_id string, v long",
        ).coalesce(1)
    )
    res = refresh_bloom_index(tbl, "doc_id")
    assert res["new_files"] == 1 and res["dropped_files"] == 0
    assert res["files"] == FILES + 1
    spec1 = bloom_specs(tbl)["doc_id"]
    # fresh dataset, same hash geometry (carried rows stay bit-compatible)
    assert spec1["path"] != spec0["path"]
    assert (spec1["m"], spec1["k"], spec1["seed"]) == (
        spec0["m"], spec0["k"], spec0["seed"],
    )
    # an OLD value now prunes the appended file too (pre-refresh it had to
    # be kept as unindexed)
    kept = tbl.files_matching("doc_id = 'doc-123'")
    assert 1 <= len(kept) <= 2
    assert tbl.to_df(adds=kept).where("doc_id = 'doc-123'").count() == 1
    # a NEW value is found through the refreshed index
    kept_new = tbl.files_matching("doc_id = 'doc-extra-3'")
    assert 1 <= len(kept_new) <= 2
    assert (
        tbl.to_df(adds=kept_new).where("doc_id = 'doc-extra-3'").count() == 1
    )
    # no-change refresh short-circuits without a commit
    v = tbl.log.latest_version()
    res2 = refresh_bloom_index(tbl, "doc_id")
    assert res2["new_files"] == 0 and res2["dropped_files"] == 0
    assert tbl.log.latest_version() == v


def test_refresh_drops_rewritten_files(indexed_table):
    from delta_sorter_spark.operators.bloom_index import refresh_bloom_index
    from delta_sorter_spark.operators.dml import delete_where

    tbl = indexed_table
    # find a doc living OUTSIDE the deleted k-range, in the rewritten file
    victim = (
        tbl.to_df().where("k >= 100 AND k < 120").select("doc_id").first()
    )["doc_id"]
    res_del = delete_where(tbl, "k < 100")  # rewrites the first file only
    assert res_del["rewritten_files"] == 1
    res = refresh_bloom_index(tbl, "doc_id")
    assert res["dropped_files"] == 1 and res["new_files"] == 1
    assert res["files"] == FILES
    kept = tbl.files_matching(f"doc_id = '{victim}'")
    assert 1 <= len(kept) <= 2
    assert (
        tbl.to_df(adds=kept).where(F.col("doc_id") == victim).count() == 1
    )


def test_refresh_requires_existing_index(spark, tmp_path):
    from delta_sorter_spark.operators.bloom_index import refresh_bloom_index

    df = spark.range(0, 10).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "tr"), df)
    with pytest.raises(KeyError):
        refresh_bloom_index(tbl, "k")


def test_local_probe_matches_spark_probe(indexed_table):
    from delta_sorter_spark.operators.bloom_index import bloom_prune_adds_local

    tbl = indexed_table
    state = tbl.state()
    for pred in (
        "doc_id = 'doc-123'",
        "doc_id IN ('doc-5', 'doc-900')",
        "doc_id = 'nope'",
        "doc_id = 'doc-5' OR v = 3",  # OR: not mandatory -> prunes nothing
    ):
        spark_kept = {
            a.path
            for a in bloom_prune_adds(tbl, state.adds, pred, state.metadata)
        }
        local_kept = {
            a.path
            for a in bloom_prune_adds_local(
                tbl.table_path, state.adds, pred, state.metadata
            )
        }
        assert local_kept == spark_kept, pred


def test_local_probe_streams_many_files(spark, tmp_path):
    """>64-file table: the streamed local probe crosses multiple record
    batches (batch_size=64) and must agree with the distributed probe —
    the 10^6-file posture in miniature."""
    from delta_sorter_spark.operators.bloom_index import (
        _LOCAL_PROBE_BATCH_ROWS,
        bloom_prune_adds_local,
    )

    n_files = _LOCAL_PROBE_BATCH_ROWS + 32
    df = spark.range(0, n_files * 10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u-"), ((F.col("id") * 37) % 701).cast("string")).alias(
            "uid"
        ),
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "many"),
        df.repartition(n_files), stat_columns=["k"],
    )
    assert len(tbl.state().adds) == n_files
    build_bloom_index(tbl, "uid", m_bits=1 << 13)
    state = tbl.state()
    for pred in ("uid = 'u-37'", "uid = 'nope'", "uid IN ('u-74', 'u-111')"):
        spark_kept = {
            a.path
            for a in bloom_prune_adds(tbl, state.adds, pred, state.metadata)
        }
        local_kept = {
            a.path
            for a in bloom_prune_adds_local(
                tbl.table_path, state.adds, pred, state.metadata
            )
        }
        assert local_kept == spark_kept, pred
    # the probe actually prunes: a present value keeps only bloom-hit files
    kept = bloom_prune_adds_local(
        tbl.table_path, state.adds, "uid = 'u-37'", state.metadata
    )
    assert 1 <= len(kept) < n_files
    assert tbl.to_df(adds=kept).where("uid = 'u-37'").count() >= 1


def test_stream_where_rides_bloom_probe(indexed_table, spark):
    from delta_sorter_spark.streaming.delta_source import DeltaStreamReader

    tbl = indexed_table
    rd = DeltaStreamReader(
        {"path": tbl.table_path, "where": "doc_id = 'doc-123'"}
    )
    # zone maps alone keep all FILES (unclustered column); the source's
    # planner must ride the Spark-free bloom probe down to the hit file(s)
    parts = rd.partitions(
        {"version": -1}, {"version": tbl.log.latest_version()}
    )
    assert 1 <= len(parts) <= 2
    # a tail append is unindexed -> fail-safe keeps it
    v0 = tbl.log.latest_version()
    tbl.append(
        spark.createDataFrame(
            [(99_990, "doc-tail", 0)], "k long, doc_id string, v long"
        )
    )
    tail = rd.partitions(
        {"version": v0}, {"version": tbl.log.latest_version()}
    )
    assert len(tail) == 1


def test_cli_bloom_verbs(spark, tmp_path, capsys):
    from delta_sorter_spark import cli

    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 50).cast("string").alias("u")
    )
    path = str(tmp_path / "tc")
    DeltaTable.create(
        spark, path, df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    assert cli.main(["--table", path, "--build-bloom-index", "u"]) == 0
    assert "bloom_index column=u files=4" in capsys.readouterr().out
    assert cli.main(["--table", path, "--refresh-bloom-index", "u"]) == 0
    assert "new=0 dropped=0" in capsys.readouterr().out
    assert cli.main(["--table", path, "--drop-bloom-index", "u"]) == 0
    # refresh without a registered index -> usage error, not a stack trace
    assert cli.main(["--table", path, "--refresh-bloom-index", "u"]) == 2
    # compaction still requires --sort-columns
    assert cli.main(["--table", path]) == 2


def test_refresh_rebuilds_when_dataset_is_gone(spark, tmp_path):
    """A registered spec whose dataset is unreadable (never written, or
    collected by an aggressive vacuum) must make refresh REBUILD coverage,
    not crash — the probe then prunes through the fresh dataset."""
    import shutil

    from delta_sorter_spark.operators.bloom_index import refresh_bloom_index

    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        ((F.col("id") * 13) % 200).cast("string").alias("u"),
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "te"),
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    build_bloom_index(tbl, "u", m_bits=1 << 13)
    spec = bloom_specs(tbl)["u"]
    shutil.rmtree(str(tmp_path / "te" / spec["path"]))
    # probe fails SAFE while the dataset is gone
    assert len(tbl.files_matching("u = '26'")) == 4
    r = refresh_bloom_index(tbl, "u")
    assert r["new_files"] == r["files"] == 4 and r["dropped_files"] == 0
    kept = tbl.files_matching("u = '26'")
    assert 1 <= len(kept) <= 2
    assert tbl.to_df(adds=kept).where("u = '26'").count() == 1


def test_compact_refresh_bloom_indexes_option(spark, tmp_path, capsys):
    """compact(refresh_bloom_indexes=True): a rewriting compaction replaces
    every file path — the option catches the index up in the same call, so
    point lookups stay pruned with no manual refresh step."""
    from delta_sorter_spark.api import compact

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 17) % 4000).cast("string").alias("u"),
    )
    path = str(tmp_path / "tcr")
    tbl = DeltaTable.create(spark, path, df.repartition(4))
    build_bloom_index(tbl, "u", m_bits=1 << 14)
    spec0 = bloom_specs(tbl)["u"]
    m = compact(
        path, ["k"], repartition_by_sort_key=True,
        target_file_size_bytes=8_000, refresh_bloom_indexes=True,
        spark=spark,
    )
    assert m.rewritten_partitions >= 1
    spec1 = bloom_specs(tbl)["u"]
    assert spec1["path"] != spec0["path"]  # the refresh re-registered
    n_files = len(tbl.state().adds)
    assert n_files >= 4
    kept = tbl.files_matching("u = '34'")
    assert 1 <= len(kept) <= 2 < n_files
    assert tbl.to_df(adds=kept).where("u = '34'").count() == 1
    # via the CLI flag too: a second (now sorted) run skips the rewrite and
    # therefore the refresh — version stays put
    from delta_sorter_spark import cli

    v = tbl.log.latest_version()
    assert cli.main([
        "--table", path, "--sort-columns", "k",
        "--refresh-bloom-indexes", "--log-level", "warn",
    ]) == 0
    capsys.readouterr()
    assert tbl.log.latest_version() == v


def test_concurrent_refreshes_converge(indexed_table, spark):
    """Two maintenance jobs refreshing the same index race: both commits
    land (conditional-PUT retry), the last registration wins, probes stay
    no-false-negative throughout, and every non-winning dataset (the
    original build's and the loser's) is vacuum-able while the winner's is
    protected."""
    import threading

    tbl = indexed_table
    tbl.append(
        spark.createDataFrame(
            [(77_777, "doc-race", 5)], "k long, doc_id string, v long"
        )
    )
    errs = []

    def run():
        try:
            from delta_sorter_spark.operators.bloom_index import (
                refresh_bloom_index,
            )

            refresh_bloom_index(
                DeltaTable(tbl.spark, tbl.table_path), "doc_id"
            )
        except Exception as exc:  # pragma: no cover - failure reporting
            errs.append(exc)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errs
    # the winning spec serves correct probes (old and new values)
    for val, want in [("doc-123", 1), ("doc-race", 1)]:
        kept = tbl.files_matching(f"doc_id = '{val}'")
        assert (
            tbl.to_df(adds=kept).where(F.col("doc_id") == val).count() == want
        )
    # exactly one dataset registered; all others collectable, winner kept
    spec = bloom_specs(tbl)["doc_id"]
    doomed = tbl.vacuum(dry_run=True)
    assert all(not d.startswith(spec["path"] + "/") for d in doomed)
    assert any(d.startswith("_bloom_index/") for d in doomed)


def test_cli_detail_verb(spark, tmp_path, capsys):
    import json as _json

    from delta_sorter_spark import cli

    df = spark.range(0, 50).selectExpr("id AS k")
    path = str(tmp_path / "tdet")
    DeltaTable.create(spark, path, df.coalesce(2))
    assert cli.main(["--table", path, "--detail"]) == 0
    d = _json.loads(capsys.readouterr().out)
    assert d["format"] == "delta" and d["numFiles"] == 2
    assert d["version"] >= 0 and d["sizeInBytes"] > 0


def test_cli_vacuum_and_checkpoint_verbs(spark, tmp_path, capsys):
    from delta_sorter_spark import cli
    from delta_sorter_spark.operators.dml import delete_where

    df = spark.range(0, 100).selectExpr("id AS k")
    path = str(tmp_path / "tvc")
    DeltaTable.create(spark, path, df.repartition(2))
    delete_where(DeltaTable(spark, path), "k < 50")  # tombstones file(s)

    assert cli.main(["--table", path, "--vacuum", "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "would delete" in out and "would delete 0" not in out
    # retention window protects everything just written
    assert cli.main(
        ["--table", path, "--vacuum", "--retention-hours", "1"]
    ) == 0
    assert "deleted 0 file(s)" in capsys.readouterr().out
    # real vacuum + checkpoint in one invocation; table still reads
    assert cli.main(["--table", path, "--vacuum", "--checkpoint"]) == 0
    out = capsys.readouterr().out
    assert "deleted" in out and "checkpoint written" in out
    assert DeltaTable(spark, path).to_df().count() == 50


def test_clone_starts_indexless_and_rebuilds_locally(indexed_table, spark, tmp_path):
    """A shallow CLONE drops the source's bloom registration (the dataset
    lives under the SOURCE directory, keyed by the source's file paths):
    the clone starts index-less — probes keep every file, rows stay exact —
    and a fresh build on the clone restores pruning without touching the
    source's index."""
    src = indexed_table
    dst = DeltaTable.clone(spark, src.table_path, str(tmp_path / "clone"))
    assert bloom_specs(dst) == {}
    n = len(dst.state().adds)
    # no index -> nothing pruned, rows exact
    assert len(dst.files_matching("doc_id = 'doc-123'")) == n
    assert dst.to_df(where="doc_id = 'doc-123'").count() == 1
    build_bloom_index(dst, "doc_id", m_bits=1 << 14)
    kept = dst.files_matching("doc_id = 'doc-123'")
    assert 1 <= len(kept) <= 2
    assert dst.to_df(adds=kept).where("doc_id = 'doc-123'").count() == 1
    # the source's own index is untouched
    src_kept = src.files_matching("doc_id = 'doc-123'")
    assert 1 <= len(src_kept) <= 2
