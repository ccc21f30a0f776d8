"""UPSERT / DELETE / RESTORE tests (operators/dml.py)."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.dml import delete_where, restore, upsert
from delta_sorter_spark.sources.delta_table import DeltaTable


def _rows(table):
    return sorted(tuple(r) for r in table.to_df().collect())


def test_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "up")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])

    src = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    out = upsert(table, src, ["id"])
    assert out["rewritten_files"] >= 1
    assert _rows(table) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_upsert_prunes_disjoint_files(spark, tmp_path):
    """Files whose key interval cannot contain source keys stay untouched."""
    path = str(tmp_path / "upz")
    low = spark.createDataFrame([(i, "lo") for i in range(10)], "id long, v string")
    table = DeltaTable.create(spark, path, low.coalesce(1), stat_columns=["id"])
    hi = spark.createDataFrame([(i, "hi") for i in range(100, 110)], "id long, v string")
    adds = table.stage_write(hi.coalesce(1), stat_columns=["id"])
    table.log.commit_with_retry(lambda state: list(adds), operation="WRITE")
    files_before = set(table.input_files())

    out = upsert(table, spark.createDataFrame([(105, "HI")], "id long, v string"), ["id"])
    assert out["untouched_files"] == 1  # the low-range file was pruned
    # the low file is still the same physical file
    low_files = {f for f in files_before if f in set(table.input_files())}
    assert len(low_files) == 1
    assert _rows(table)[:1] == [(0, "lo")]
    assert (105, "HI") in _rows(table)


def test_delete_where(spark, tmp_path):
    path = str(tmp_path / "del")
    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop"), (3, "keep"), (4, None)], "id long, v string"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1))
    out = delete_where(table, "v = 'drop'")
    assert out["deleted_rows"] == 1
    # NULL-predicate rows are kept (SQL DELETE semantics)
    assert _rows(table) == [(1, "keep"), (3, "keep"), (4, None)]

    noop = delete_where(table, "v = 'absent'")
    assert noop["rewritten_files"] == 0


def test_delete_only_rewrites_hit_files(spark, tmp_path):
    path = str(tmp_path / "delp")
    a = spark.createDataFrame([(i, "a") for i in range(5)], "id long, v string")
    table = DeltaTable.create(spark, path, a.coalesce(1))
    b = spark.createDataFrame([(i, "b") for i in range(10, 15)], "id long, v string")
    adds = table.stage_write(b.coalesce(1))
    table.log.commit_with_retry(lambda state: list(adds), operation="WRITE")

    out = delete_where(table, "id = 12")  # only in file b
    assert out["rewritten_files"] == 1
    assert out["deleted_rows"] == 1
    assert len(_rows(table)) == 9


def test_restore_round_trip(spark, tmp_path):
    path = str(tmp_path / "rst")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v_orig = table.state().version
    before = _rows(table)

    upsert(table, spark.createDataFrame([(2, "B"), (9, "z")], "id long, v string"), ["id"])
    assert _rows(table) != before

    out = restore(table, v_orig)
    assert _rows(table) == before
    # restore is itself a commit: time travel to the mutated version still works
    assert out["version"] == table.state().version

    # vacuum now removes the files the restore tombstoned...
    table.vacuum()
    # ...so restoring back to the mutated version must fail loudly
    with pytest.raises(FileNotFoundError):
        restore(table, out["version"] - 1)


def test_restore_undoes_dv_delete(spark, tmp_path):
    """Restoring past a merge-on-read DELETE must clear the deletion
    vector even though the data file path is live in both versions (a
    same-path re-Add replaces the DV in log replay)."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "rdv")
    df = spark.range(100).withColumn("k", F.col("id") % 10)
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v0 = table.state().version
    delete_where_dv(table, "k = 3")
    assert table.to_df().count() == 90
    restore(table, v0)
    assert table.to_df().count() == 100
    # and forward again to the deleted state: the DV comes back
    restore(table, v0 + 1)
    assert table.to_df().count() == 90


def test_upsert_concurrent_safety_metadata(spark, tmp_path):
    """Upsert commits carry dataChange=true (streams must see them)."""
    path = str(tmp_path / "dc")
    table = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1)
    )
    upsert(table, spark.createDataFrame([(1, "A")], "id long, v string"), ["id"])
    assert all(a.data_change for a in table.state().adds)


def test_dml_model_based_random_sequence(spark, tmp_path):
    """Model-based check: a random interleaving of upserts and deletes applied
    to the Delta table must match a plain dict model at every step."""
    import random

    rng = random.Random(7)
    path = str(tmp_path / "model")
    init = [(i, f"v{i}") for i in range(0, 30, 2)]
    model = dict(init)
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(init, "id long, v string").coalesce(2),
        stat_columns=["id"],
    )

    for step in range(6):
        if rng.random() < 0.6:
            n = rng.randint(1, 5)
            src_rows = [(rng.randint(0, 40), f"s{step}.{j}") for j in range(n)]
            # upsert requires key-unique sources
            src_rows = list({k: (k, v) for k, v in src_rows}.values())
            upsert(table, spark.createDataFrame(src_rows, "id long, v string"), ["id"])
            model.update(dict(src_rows))
        else:
            lo = rng.randint(0, 35)
            hi = lo + rng.randint(0, 10)
            delete_where(table, f"id BETWEEN {lo} AND {hi}")
            model = {k: v for k, v in model.items() if not (lo <= k <= hi)}
        got = {r["id"]: r["v"] for r in table.to_df().collect()}
        assert got == model, f"diverged at step {step}"

    # every intermediate version is still time-travelable
    assert table.state(version=1).adds


def test_table_changes_replays_every_snapshot(spark, tmp_path):
    """CDF property: applying each version's (deletes, inserts) to the prior
    snapshot reproduces the next snapshot as a multiset; compaction commits
    emit nothing."""
    from collections import Counter

    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where, table_changes, upsert

    path = str(tmp_path / "cdf")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id long, v string"
        ).coalesce(2),
        stat_columns=["id"],
    )
    upsert(
        table,
        spark.createDataFrame([(5, "new5"), (25, "v25")], "id long, v string"),
        ["id"],
    )
    delete_where(table, "id >= 15 AND id <= 18")
    v_before_compact = table.log.latest_version()
    compact(path, ["id"], spark=spark)  # dataChange=false -> silent in the feed

    changes = table_changes(table, 0).collect()
    assert {r["_change_type"] for r in changes} <= {"insert", "delete"}
    # compaction emitted nothing
    assert all(r["_commit_version"] <= v_before_compact for r in changes)

    def rows_at(version):
        return Counter(
            (r["id"], r["v"]) for r in table.to_df(version=version).collect()
        )

    state = rows_at(0)
    by_version = {}
    for r in changes:
        by_version.setdefault(r["_commit_version"], []).append(r)
    for v in sorted(by_version):
        for r in by_version[v]:
            if r["_change_type"] == "delete":
                state[(r["id"], r["v"])] -= 1
            else:
                state[(r["id"], r["v"])] += 1
        state = Counter({k: c for k, c in state.items() if c > 0})
        assert state == rows_at(v), f"replay diverged at version {v}"
    # empty range -> empty frame with the CDF columns
    empty = table_changes(table, table.log.latest_version())
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_merge_update_delete_insert_clauses(spark, tmp_path):
    """Full MERGE: conditional update, delete clause, insert, and
    leave-unchanged all in one statement."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mrg")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, v string, amt double",
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    src = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 99.0), (3, "C", 7.0), (5, "e", 50.0)],
        "id long, v string, amt double",
    )
    out = merge(
        table,
        src,
        ["id"],
        when_matched_update={"v": "s.v", "amt": "t.amt + s.amt"},
        when_matched_delete="s.amt > 90",         # id 2 deleted
        matched_condition="s.amt < 6",             # only id 1 updated
        when_not_matched_insert=True,              # id 5 inserted
    )
    assert out["version"] > 0
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [
        (1, "A", 15.0),   # updated: v from source, amt summed
        (3, "c", 30.0),   # matched but condition false -> unchanged
        (4, "d", 40.0),   # unmatched target -> kept
        (5, "e", 50.0),   # inserted
    ]


def test_merge_rejects_ambiguous_source(spark, tmp_path):
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mrg_dup")
    table = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    src = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
    with pytest.raises(ValueError, match="multiple rows"):
        merge(table, src, ["id"], when_matched_update={"v": "s.v"})


def test_merge_zone_map_pruning_and_no_insert(spark, tmp_path):
    """Disjoint files stay untouched; when_not_matched_insert=False drops
    unmatched source rows instead of inserting."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mrg_z")
    low = spark.createDataFrame([(i, 0.0) for i in range(10)], "id long, amt double")
    table = DeltaTable.create(spark, path, low.coalesce(1), stat_columns=["id"])
    hi = spark.createDataFrame([(i, 0.0) for i in range(100, 110)], "id long, amt double")
    table.append(hi.coalesce(1), stat_columns=["id"])

    src = spark.createDataFrame([(5, 1.0), (7, 1.0), (15, 1.0)], "id long, amt double")
    out = merge(
        table, src, ["id"],
        when_matched_update={"amt": "s.amt"},
        when_not_matched_insert=False,
    )
    assert out["untouched_files"] >= 1  # the 100..109 file never rewritten
    got = dict((r["id"], r["amt"]) for r in DeltaTable(spark, path).to_df().collect())
    assert got[5] == 1.0 and got[7] == 1.0 and 15 not in got and len(got) == 20


def test_deletion_vector_delete_and_purge(spark, tmp_path):
    """Merge-on-read delete: no data files rewritten, reads drop DV
    positions, repeated deletes union, purge materializes."""
    import os
    from delta_sorter_spark.operators.dml import delete_where_dv, purge_deletion_vectors

    path = str(tmp_path / "dv")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    data_files_before = set(table.input_files())

    out = delete_where_dv(table, "id IN (2, 5)")
    assert out == {"dv_files": 1, "deleted_rows": 2, "version": out["version"]}
    # same physical files — nothing rewritten
    assert set(table.input_files()) == data_files_before
    assert sorted(r["id"] for r in table.to_df().collect()) == [0, 1, 3, 4, 6, 7, 8, 9]
    # predicate referencing deleted rows again: no new deletions
    out2 = delete_where_dv(table, "id = 2 OR id = 7")
    assert out2["deleted_rows"] == 1
    assert sorted(r["id"] for r in table.to_df().collect()) == [0, 1, 3, 4, 6, 8, 9]
    # time travel to before the first delete still sees all 10 rows
    assert DeltaTable(spark, path).to_df(version=out["version"] - 1).count() == 10

    out3 = purge_deletion_vectors(table)
    assert out3["purged_files"] == 1
    final = DeltaTable(spark, path)
    assert not any(a.deletion_vector for a in final.state().adds)
    assert sorted(r["id"] for r in final.to_df().collect()) == [0, 1, 3, 4, 6, 8, 9]


def test_deletion_vector_large_match_fraction(spark, tmp_path):
    """Scale path (legacy parquet sidecar format, kept readable + writable
    behind vector_format="parquet"): a delete matching ~40% of a multi-file
    table writes its positions as an executor-side parquet sidecar dataset
    (no per-position driver collect), and repeated deletes still union
    cumulatively."""
    import os

    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "dvbig")
    n = 20_000
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    table = DeltaTable.create(spark, path, df.repartition(4), stat_columns=["id"])
    data_files_before = set(table.input_files())

    out = delete_where_dv(
        table, "id % 5 IN (1, 2)", vector_format="parquet"
    )  # 40% of rows
    assert out["deleted_rows"] == 2 * (n // 5)
    assert out["dv_files"] == 4  # every file holds matches
    assert set(table.input_files()) == data_files_before  # nothing rewritten

    state = table.state()
    sidecars = {a.deletion_vector["storagePath"] for a in state.adds}
    assert len(sidecars) == 1
    sidecar_abs = os.path.join(path, next(iter(sidecars)))
    assert os.path.isdir(sidecar_abs)  # parquet dataset, not a JSON blob
    assert any(f.endswith(".parquet") for f in os.listdir(sidecar_abs))

    remaining = table.to_df()
    assert remaining.count() == n - 2 * (n // 5)
    assert remaining.where("id % 5 IN (1, 2)").count() == 0

    # second, overlapping delete: only the new 20% counts — and the ROARING
    # default composes cumulatively on top of a legacy-sidecar table
    out2 = delete_where_dv(table, "id % 5 IN (2, 3)")
    assert out2["deleted_rows"] == n // 5
    assert DeltaTable(spark, path).to_df().count() == n - 3 * (n // 5)


def test_deletion_vector_composes_with_upsert(spark, tmp_path):
    """DV'd rows are invisible to downstream DML (upsert reads through the
    DV-aware view)."""
    from delta_sorter_spark.operators.dml import delete_where_dv, upsert

    path = str(tmp_path / "dvu")
    df = spark.createDataFrame([(i, 0.0) for i in range(6)], "id long, x double")
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    delete_where_dv(table, "id = 3")
    upsert(table, spark.createDataFrame([(4, 9.0)], "id long, x double"), ["id"])
    got = sorted((r["id"], r["x"]) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [(0, 0.0), (1, 0.0), (2, 0.0), (4, 9.0), (5, 0.0)]


def test_table_changes_with_deletion_vectors(spark, tmp_path):
    """CDF replay stays multiset-exact across DV deletes, repeat DV deletes,
    and a rewrite of a DV'd file."""
    from collections import Counter

    from delta_sorter_spark.operators.dml import (
        delete_where_dv,
        table_changes,
        upsert,
    )

    path = str(tmp_path / "cdf_dv")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(12)], "id long, v string"
        ).coalesce(1),
        stat_columns=["id"],
    )
    delete_where_dv(table, "id IN (1, 5)")      # DV commit: 2 position deletes
    delete_where_dv(table, "id IN (5, 9)")      # repeat: only id 9 is new
    upsert(table, spark.createDataFrame([(3, "NEW3")], "id long, v string"), ["id"])
    # ^ rewrites the DV'd file: removed rows must be fed through the DV

    changes = table_changes(table, 0).collect()
    latest = table.log.latest_version()

    def rows_at(version):
        return Counter(
            (r["id"], r["v"]) for r in table.to_df(version=version).collect()
        )

    state = rows_at(0)
    by_version = {}
    for r in changes:
        by_version.setdefault(r["_commit_version"], []).append(r)
    for v in sorted(by_version):
        for r in by_version[v]:
            if r["_change_type"] == "delete":
                state[(r["id"], r["v"])] -= 1
            else:
                state[(r["id"], r["v"])] += 1
        state = Counter({k: c for k, c in state.items() if c > 0})
        assert state == rows_at(v), f"replay diverged at version {v}"
    assert state == rows_at(latest)


def test_vacuum_keeps_live_dv_sidecars(spark, tmp_path):
    """Vacuum collects orphaned legacy DV sidecars but never a referenced
    one (the roaring sibling is test_roaring_dv_vacuum_and_purge)."""
    from delta_sorter_spark.operators.dml import delete_where_dv, purge_deletion_vectors

    path = str(tmp_path / "dv_vac")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i, i) for i in range(8)], "id long, x long").coalesce(1),
        stat_columns=["id"],
    )
    delete_where_dv(table, "id = 2", vector_format="parquet")
    doomed = table.vacuum(dry_run=True)
    # the live sidecar (parquet dataset dir) must be fully protected
    assert not [d for d in doomed if "_deletion_vectors" in d]
    purge_deletion_vectors(table)
    doomed = table.vacuum()
    assert [d for d in doomed if "_deletion_vectors" in d]  # now orphaned
    import os as _o
    dv_root = _o.path.join(path, "_deletion_vectors")
    leftovers = [
        _o.path.join(r, n) for r, _, ns in _o.walk(dv_root) for n in ns
    ]
    assert not leftovers, leftovers  # orphaned sidecar collected completely
    assert sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect()) == [
        0, 1, 3, 4, 5, 6, 7,
    ]


def test_roaring_dv_standard_layout(spark, tmp_path):
    """Default deletion vectors are STANDARD Delta protocol: storageType "u"
    descriptors whose z85 uuid resolves to a framed roaring-bitmap
    ``deletion_vector_<uuid>.bin`` (version byte, big-endian length, magic
    1681511377 payload, CRC-32) — byte-for-byte what delta-rs/delta-spark
    parse.  Cumulative deletes re-point to fresh bins with merged
    positions."""
    import os
    import struct
    import zlib

    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.roaring import (
        DV_FILE_VERSION,
        MAGIC_NUMBER,
        deserialize_roaring_array,
        dv_uuid_path,
    )

    path = str(tmp_path / "dv_std")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(1),
        stat_columns=["id"],
    )
    out = delete_where_dv(table, "id IN (1, 4, 7)")
    assert out["dv_files"] == 1 and out["deleted_rows"] == 3

    (add,) = table.state().adds
    dv = add.deletion_vector
    assert dv["storageType"] == "u"
    assert dv["cardinality"] == 3 and dv["offset"] == 1
    rel = dv_uuid_path(dv["pathOrInlineDv"])
    assert rel.startswith("deletion_vector_") and rel.endswith(".bin")
    raw = open(os.path.join(path, rel), "rb").read()
    assert raw[0] == DV_FILE_VERSION
    (size,) = struct.unpack_from(">i", raw, dv["offset"])
    assert size == dv["sizeInBytes"]
    data = raw[dv["offset"] + 4 : dv["offset"] + 4 + size]
    (magic,) = struct.unpack_from("<i", data, 0)
    assert magic == MAGIC_NUMBER
    (crc,) = struct.unpack_from(">I", raw, dv["offset"] + 4 + size)
    assert crc == zlib.crc32(data) & 0xFFFFFFFF
    assert deserialize_roaring_array(data) == [1, 4, 7]

    # reads drop exactly those rows
    assert sorted(r["id"] for r in table.to_df().collect()) == [0, 2, 3, 5, 6, 8, 9]

    # cumulative delete: fresh bin, merged positions
    out2 = delete_where_dv(table, "id IN (4, 8)")
    assert out2["deleted_rows"] == 1
    (add2,) = DeltaTable(spark, path).state().adds
    raw2 = open(os.path.join(path, dv_uuid_path(add2.deletion_vector["pathOrInlineDv"])), "rb").read()
    (size2,) = struct.unpack_from(">i", raw2, add2.deletion_vector["offset"])
    data2 = raw2[add2.deletion_vector["offset"] + 4 :][:size2]
    assert deserialize_roaring_array(data2) == [1, 4, 7, 8]
    assert sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect()) == [
        0, 2, 3, 5, 6, 9,
    ]


def test_dv_readd_stats_loose_bounds(spark, tmp_path):
    """A re-Add that attaches a deletion vector WITHOUT recomputing stats
    must mark them ``tightBounds: false`` (Delta protocol) while keeping
    numRecords as the PHYSICAL row count — otherwise a stock reader's
    stats-only MIN/MAX could answer with a deleted row's value.  Both the
    delete path and the legacy→standard migration path carry the flag."""
    from delta_sorter_spark.operators.dml import (
        delete_where_dv,
        migrate_deletion_vectors,
    )

    path = str(tmp_path / "dv_loose")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(1),
        stat_columns=["id"],
    )
    before = table.state().adds[0].stats
    assert before.get("tightBounds") is None  # fresh write: tight by default

    delete_where_dv(table, "id >= 8")  # max id is now 7, stats still say 9
    (add,) = DeltaTable(spark, path).state().adds
    assert add.stats["tightBounds"] is False
    assert add.stats["numRecords"] == 10  # physical count, per protocol
    assert add.stats["maxValues"]["id"] == before["maxValues"]["id"]

    # legacy parquet sidecar -> standard migration also flags the stats
    path2 = str(tmp_path / "dv_loose_legacy")
    t2 = DeltaTable.create(
        spark,
        path2,
        spark.createDataFrame([(i,) for i in range(6)], "id long").coalesce(1),
        stat_columns=["id"],
    )
    delete_where_dv(t2, "id = 5", vector_format="parquet")
    migrate_deletion_vectors(DeltaTable(spark, path2))
    (add2,) = DeltaTable(spark, path2).state().adds
    assert add2.stats["tightBounds"] is False
    assert sorted(
        r["id"] for r in DeltaTable(spark, path2).to_df().collect()
    ) == [0, 1, 2, 3, 4]


def test_roaring_dv_checkpoint_roundtrip(spark, tmp_path):
    """Protocol DV descriptors survive a parquet checkpoint verbatim
    (storageType/pathOrInlineDv/offset/sizeInBytes/cardinality), and a
    post-checkpoint reader still applies them."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "dv_ckpt")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i,) for i in range(6)], "id long").coalesce(1),
        stat_columns=["id"],
    )
    delete_where_dv(table, "id = 2")
    before = DeltaTable(spark, path).state().adds[0].deletion_vector
    table.log.write_checkpoint()
    fresh = DeltaTable(spark, path)
    after = fresh.state().adds[0].deletion_vector
    assert after == before
    assert sorted(r["id"] for r in fresh.to_df().collect()) == [0, 1, 3, 4, 5]


def test_roaring_dv_vacuum_and_purge(spark, tmp_path):
    """Vacuum never collects a referenced DV bin; after purge the orphaned
    bin is collected and the data reads identically."""
    import os

    from delta_sorter_spark.operators.dml import (
        delete_where_dv,
        purge_deletion_vectors,
    )

    path = str(tmp_path / "dv_vac_std")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i, i) for i in range(8)], "id long, x long").coalesce(1),
        stat_columns=["id"],
    )
    delete_where_dv(table, "id = 2")
    doomed = table.vacuum(dry_run=True)
    assert not [d for d in doomed if d.startswith("deletion_vector_")]
    purge_deletion_vectors(table)
    doomed = table.vacuum()
    assert [d for d in doomed if d.startswith("deletion_vector_")]
    assert not [
        n for n in os.listdir(path) if n.startswith("deletion_vector_")
    ]
    assert sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect()) == [
        0, 1, 3, 4, 5, 6, 7,
    ]


def test_upsert_txn_idempotence(spark, tmp_path):
    """A replayed (app_id, version) upsert is a no-op before any compute."""
    path = str(tmp_path / "upsert_txn")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        stat_columns=["id"],
    )
    src = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    out1 = upsert(table, src, ["id"], txn_app_id="app", txn_version=7)
    assert "skipped" not in out1
    # replay of the same batch: skipped, no new version
    out2 = upsert(table, src, ["id"], txn_app_id="app", txn_version=7)
    assert out2["skipped"] and out2["version"] == out1["version"]
    # later batch applies
    out3 = upsert(
        table,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        ["id"],
        txn_app_id="app",
        txn_version=8,
    )
    assert "skipped" not in out3
    rows = {(r["id"], r["v"]) for r in table.to_df().collect()}
    assert rows == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    with pytest.raises(ValueError):
        upsert(table, src, ["id"], txn_app_id="app")


def test_roaring_dv_protocol_upgrade(spark, tmp_path):
    """The first standard-DV commit upgrades the protocol to table features
    (3/7 + deletionVectors) — without it a stock reader would ignore the
    vectors and resurrect deleted rows.  The upgrade happens once, lists
    the table's other active features, and survives a parquet checkpoint."""
    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "dv_proto")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i,) for i in range(6)], "id long").coalesce(1),
        stat_columns=["id"],
    )
    assert table.state().protocol == {"minReaderVersion": 1, "minWriterVersion": 2}

    delete_where_dv(table, "id = 1")
    p = DeltaTable(spark, path).state().protocol
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "deletionVectors" in p["readerFeatures"]
    assert "deletionVectors" in p["writerFeatures"]

    # second DV delete: no duplicate protocol action in the commit
    delete_where_dv(table, "id = 3")
    t2 = DeltaTable(spark, path)
    last = t2.log.commit_actions(t2.log.latest_version())
    assert not [a for a in last if "protocol" in a]

    # checkpoint round-trip preserves the feature lists
    t2.log.write_checkpoint()
    p2 = DeltaTable(spark, path).state().protocol
    assert p2["minReaderVersion"] == 3
    assert sorted(p2["readerFeatures"]) == sorted(p["readerFeatures"])
    assert sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect()) == [
        0, 2, 4, 5,
    ]


def test_migrate_deletion_vectors_to_standard(spark, tmp_path):
    """Legacy sidecar DVs convert to standard roaring bins WITHOUT touching
    data files; reads are identical before/after, the protocol advertises
    deletionVectors, and vacuum collects the orphaned sidecars."""
    from delta_sorter_spark.operators.dml import (
        delete_where_dv,
        migrate_deletion_vectors,
    )
    from delta_sorter_spark.sources.delta_table import _is_protocol_dv

    path = str(tmp_path / "dv_migrate")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(12)], "id long, v string"
        ).repartition(2),
        stat_columns=["id"],
    )
    delete_where_dv(table, "id IN (1, 5)", vector_format="parquet")
    delete_where_dv(table, "id IN (5, 9)", vector_format="parquet")
    before = sorted(tuple(r) for r in table.to_df().collect())
    data_files = {a.path for a in table.state().adds}
    assert any(
        a.deletion_vector and not _is_protocol_dv(a.deletion_vector)
        for a in table.state().adds
    )

    res = migrate_deletion_vectors(table)
    assert res["migrated_files"] >= 1

    t2 = DeltaTable(spark, path)
    state = t2.state()
    assert {a.path for a in state.adds} == data_files  # data untouched
    assert all(
        _is_protocol_dv(a.deletion_vector)
        for a in state.adds
        if a.deletion_vector
    )
    assert state.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in state.protocol["readerFeatures"]
    assert sorted(tuple(r) for r in t2.to_df().collect()) == before

    # idempotent; second call is a no-op
    assert migrate_deletion_vectors(t2)["migrated_files"] == 0

    doomed = t2.vacuum()
    assert [d for d in doomed if "_deletion_vectors" in d]  # old sidecars out
    assert sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect()) == before


def test_dv_delete_loses_race_to_compaction(spark, tmp_path):
    """A DV delete whose target file was rewritten by a concurrent compact
    must raise ConcurrentRewriteError (committing would re-Add a tombstoned
    file and resurrect/duplicate rows) and leave the table consistent."""
    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import ConcurrentRewriteError

    path = str(tmp_path / "dv_race")
    table = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"v{i}") for i in (3, 1, 2, 0)], "id long, v string"
        ).coalesce(1),
        stat_columns=["id"],
    )
    # the deleter plans against the OLD snapshot...
    stale = DeltaTable(spark, path)
    stale_state = stale.state()
    stale.state = lambda version=None: stale_state
    # ...while a compact rewrites every file underneath it
    compact(path, ["id"], repartition_by_sort_key=True, spark=spark)

    with pytest.raises(ConcurrentRewriteError):
        delete_where_dv(stale, "id = 2")

    fresh = DeltaTable(spark, path)
    assert sorted(r["id"] for r in fresh.to_df().collect()) == [0, 1, 2, 3]
    assert not any(a.deletion_vector for a in fresh.state().adds)


def test_merge_not_matched_by_source_clauses(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE: delete-predicate drops target rows the
    source no longer carries, update-dict marks the rest stale; matched and
    insert clauses still compose in the same statement."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mrgsync")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, v string, amt double",
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    src = spark.createDataFrame(
        [(1, "A", 5.0), (5, "e", 50.0)], "id long, v string, amt double"
    )
    merge(
        table,
        src,
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,                      # id 5 inserted
        when_not_matched_by_source_delete="t.amt >= 40",   # id 4 dropped
        when_not_matched_by_source_update={"v": "'stale'"},  # ids 2,3 marked
    )
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [
        (1, "A", 10.0),      # matched update
        (2, "stale", 20.0),  # not matched by source -> marked
        (3, "stale", 30.0),
        (5, "e", 50.0),      # inserted; id 4 deleted by the by-source clause
    ]


def test_merge_by_source_mirror_rewrites_all_files(spark, tmp_path):
    """delete="true" = mirror sync: the target becomes the source even for
    key ranges the source's zone map never touches — which is exactly why
    BY SOURCE widens the candidate set to every file."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mirror")
    low = spark.createDataFrame([(i, float(i)) for i in range(5)], "id long, amt double")
    high = spark.createDataFrame(
        [(i, float(i)) for i in range(100, 105)], "id long, amt double"
    )
    table = DeltaTable.create(
        spark, path, low.coalesce(1), stat_columns=["id"]
    )
    table.append(high.coalesce(1))
    n_files = len(DeltaTable(spark, path).state().adds)
    assert n_files >= 2
    src = spark.createDataFrame([(2, 2.0), (200, 200.0)], "id long, amt double")
    out = merge(
        DeltaTable(spark, path),
        src,
        ["id"],
        when_not_matched_by_source_delete="true",
    )
    assert out["rewritten_files"] == n_files  # zone-map pruning disabled
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [(2, 2.0), (200, 200.0)]


def test_merge_by_source_rewrites_only_changed_files(spark, tmp_path):
    """BY SOURCE reads every file, but files where no clause changes any
    row must keep their Adds intact — a selective by-source delete on a
    100 TB table is not a full-table copy-on-write rewrite."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "bysrc_sel")
    low = spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "id long, amt double"
    )
    high = spark.createDataFrame(
        [(i, float(i)) for i in range(100, 105)], "id long, amt double"
    )
    table = DeltaTable.create(spark, path, low.coalesce(1), stat_columns=["id"])
    table.append(high.coalesce(1), stat_columns=["id"])
    files_before = set(DeltaTable(spark, path).input_files())
    # source matches every low-file row; the by-source delete only fires in
    # the high file -> the low file contains no changed row
    src = spark.createDataFrame(
        [(i, float(i) + 0.5) for i in range(5)], "id long, amt double"
    )
    out = merge(
        DeltaTable(spark, path),
        src,
        ["id"],
        when_not_matched_by_source_delete="t.amt >= 100",
        when_not_matched_insert=False,
    )
    assert out["rewritten_files"] == 1
    assert out["untouched_files"] == 1
    files_after = set(DeltaTable(spark, path).input_files())
    assert len(files_before & files_after) == 1  # the low file survived
    got = sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect())
    assert got == [0, 1, 2, 3, 4]


def test_merge_insert_only_rewrites_nothing(spark, tmp_path):
    """A merge whose matched rows change nothing (no update/delete clauses)
    must append the inserts without rewriting a single target file."""
    from delta_sorter_spark.operators.dml import merge

    path = str(tmp_path / "mrg_insonly")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, amt double"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    files_before = set(table.input_files())
    src = spark.createDataFrame(
        [(5, 99.0), (20, 20.0)], "id long, amt double"
    )
    out = merge(DeltaTable(spark, path), src, ["id"])  # insert-only
    assert out["rewritten_files"] == 0
    tbl = DeltaTable(spark, path)
    assert files_before <= set(tbl.input_files())  # originals untouched
    got = dict((r["id"], r["amt"]) for r in tbl.to_df().collect())
    assert got[5] == 5.0 and got[20] == 20.0 and len(got) == 11


def test_check_constraints_enforced_on_dml(spark, tmp_path):
    """Every data-changing DML verb rejects rows violating a CHECK
    constraint: merge (update clause + insert), upsert, update_where,
    update_where_dv, merge_dv — and a rejected statement commits nothing."""
    import pytest as _pytest

    from delta_sorter_spark.operators.dml import (
        merge,
        merge_dv,
        update_where,
        update_where_dv,
        upsert,
    )

    path = str(tmp_path / "dml_chk")
    t = DeltaTable.create(
        spark, path,
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        stat_columns=["id"],
    )
    t.add_check_constraint("v_pos", "v > 0")
    v0 = t.state().version

    with _pytest.raises(ValueError, match="v_pos"):
        update_where(DeltaTable(spark, path), "id = 1", {"v": "-5.0"})
    with _pytest.raises(ValueError, match="v_pos"):
        update_where_dv(DeltaTable(spark, path), "id = 1", {"v": "-5.0"})
    bad_src = spark.createDataFrame([(3, -1.0)], "id long, v double")
    with _pytest.raises(ValueError, match="v_pos"):
        upsert(DeltaTable(spark, path), bad_src, ["id"])
    with _pytest.raises(ValueError, match="v_pos"):
        merge(DeltaTable(spark, path), bad_src, ["id"])  # insert violates
    with _pytest.raises(ValueError, match="v_pos"):
        merge(
            DeltaTable(spark, path),
            spark.createDataFrame([(1, 1.0)], "id long, v double"),
            ["id"],
            when_matched_update={"v": "-9.0"},  # update clause violates
        )
    with _pytest.raises(ValueError, match="v_pos"):
        merge_dv(
            DeltaTable(spark, path),
            spark.createDataFrame([(1, 1.0)], "id long, v double"),
            ["id"],
            when_matched_update={"v": "-9.0"},
        )
    tbl = DeltaTable(spark, path)
    assert tbl.state().version == v0  # nothing committed
    assert sorted(tuple(r) for r in tbl.to_df().collect()) == [
        (1, 10.0), (2, 20.0),
    ]
    # passing statements still go through
    update_where(tbl, "id = 1", {"v": "5.0"})
    merge(
        DeltaTable(spark, path),
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        ["id"],
    )
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [(1, 5.0), (2, 20.0), (3, 3.0)]


def test_update_where_rewrites_only_hit_files(spark, tmp_path):
    from delta_sorter_spark.operators.dml import update_where

    path = str(tmp_path / "upd")
    low = spark.createDataFrame([(i, float(i), "x") for i in range(5)],
                                "id long, amt double, tag string")
    high = spark.createDataFrame([(i, float(i), "y") for i in range(100, 105)],
                                 "id long, amt double, tag string")
    table = DeltaTable.create(spark, path, low.coalesce(1), stat_columns=["id"])
    table.append(high.coalesce(1))
    out = update_where(
        DeltaTable(spark, path), "id >= 100 AND id < 103",
        {"amt": "amt * 10", "tag": "'hit'"},
    )
    assert out["rewritten_files"] == 1  # only the high file contains hits
    assert out["updated_rows"] == 3
    got = {r["id"]: (r["amt"], r["tag"])
           for r in DeltaTable(spark, path).to_df().collect()}
    assert got[100] == (1000.0, "hit") and got[102] == (1020.0, "hit")
    assert got[103] == (103.0, "y")     # same file, predicate false -> kept
    assert got[0] == (0.0, "x")         # untouched file


def test_update_where_swap_semantics_and_validation(spark, tmp_path):
    """All SET expressions evaluate against the OLD row (SQL semantics), so
    a=b, b=a swaps; unknown columns raise before any compute."""
    import pytest as _pytest

    from delta_sorter_spark.operators.dml import update_where

    path = str(tmp_path / "swap")
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id long, a double, b double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    update_where(table, "id = 1", {"a": "b", "b": "a"})
    row = DeltaTable(spark, path).to_df().collect()[0]
    assert (row["a"], row["b"]) == (20.0, 10.0)
    with _pytest.raises(ValueError, match="unknown columns"):
        update_where(DeltaTable(spark, path), "id = 1", {"nope": "1"})


def test_update_where_dv_merge_on_read(spark, tmp_path):
    """DV-update: matched positions go into deletion vectors, updated values
    append as new files, one atomic commit — the original data files are
    never rewritten."""
    from delta_sorter_spark.operators.dml import update_where_dv

    path = str(tmp_path / "mor_upd")
    df = spark.createDataFrame(
        [(i, float(i), "x") for i in range(10)], "id long, amt double, tag string"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    orig_paths = {a.path for a in table.state().adds}
    out = update_where_dv(
        DeltaTable(spark, path), "id IN (2, 5)", {"amt": "amt * 100", "tag": "'u'"}
    )
    assert out["dv_files"] == 1 and out["updated_rows"] == 2
    t2 = DeltaTable(spark, path)
    adds = t2.state().adds
    # original file still present (with a DV), plus >=1 new file of values
    dv_adds = [a for a in adds if a.deletion_vector]
    assert {a.path for a in dv_adds} == orig_paths
    assert len(adds) > len(orig_paths)
    got = {r["id"]: (r["amt"], r["tag"]) for r in t2.to_df().collect()}
    assert len(got) == 10                     # no duplicates, no losses
    assert got[2] == (200.0, "u") and got[5] == (500.0, "u")
    assert got[3] == (3.0, "x")


def test_update_where_dv_does_not_resurrect_deleted_rows(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where_dv, update_where_dv

    path = str(tmp_path / "mor_upd2")
    df = spark.createDataFrame([(i, float(i)) for i in range(8)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    delete_where_dv(table, "id IN (1, 2)")
    out = update_where_dv(
        DeltaTable(spark, path), "id < 4", {"amt": "amt + 0.5"}
    )
    assert out["updated_rows"] == 2  # ids 0 and 3 only — 1,2 already deleted
    got = {r["id"]: r["amt"] for r in DeltaTable(spark, path).to_df().collect()}
    assert set(got) == {0, 3, 4, 5, 6, 7}
    assert got[0] == 0.5 and got[3] == 3.5 and got[4] == 4.0


def test_merge_dv_clauses_merge_on_read(spark, tmp_path):
    """MoR MERGE: changed rows DV'd + values appended in one commit;
    matched rows no clause touches keep their bytes and positions."""
    from delta_sorter_spark.operators.dml import merge_dv

    path = str(tmp_path / "mor_mrg")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, v string, amt double",
    )
    table = DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])
    orig_paths = {a.path for a in table.state().adds}
    src = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 99.0), (3, "C", 7.0), (5, "e", 50.0)],
        "id long, v string, amt double",
    )
    out = merge_dv(
        table,
        src,
        ["id"],
        when_matched_update={"v": "s.v", "amt": "t.amt + s.amt"},
        when_matched_delete="s.amt > 90",      # id 2 deleted
        matched_condition="s.amt < 6",          # only id 1 updated
        when_not_matched_insert=True,           # id 5 inserted
    )
    assert out["dv_files"] == 1
    assert out["dv_marked_rows"] == 2          # ids 1 (update) and 2 (delete)
    assert out["appended_rows"] == 2           # updated id 1 + inserted id 5
    t2 = DeltaTable(spark, path)
    assert orig_paths <= {a.path for a in t2.state().adds}  # bytes kept
    got = sorted(tuple(r) for r in t2.to_df().collect())
    assert got == [
        (1, "A", 15.0),   # updated copy
        (3, "c", 30.0),   # matched, condition false -> untouched (no DV)
        (4, "d", 40.0),   # unmatched target
        (5, "e", 50.0),   # inserted
    ]


def test_merge_dv_insert_only_still_commits(spark, tmp_path):
    from delta_sorter_spark.operators.dml import merge_dv

    path = str(tmp_path / "mor_ins")
    df = spark.createDataFrame([(1, 1.0)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    src = spark.createDataFrame([(9, 9.0)], "id long, amt double")
    out = merge_dv(table, src, ["id"])
    assert out["dv_files"] == 0 and out["appended_rows"] == 1
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [(1, 1.0), (9, 9.0)]


def test_table_changes_over_mor_update(spark, tmp_path):
    """CDF of a merge-on-read UPDATE: each changed row feeds a delete (old
    values, via the DV delta) plus an insert (new values, via the appended
    file) at the SAME commit version — the standard change shape for
    writers that don't materialize preimage/postimage rows."""
    from delta_sorter_spark.operators.dml import table_changes, update_where_dv

    path = str(tmp_path / "cdf_upd")
    df = spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v0 = table.log.latest_version()
    update_where_dv(table, "id IN (1, 3)", {"amt": "amt * 10"})
    got = sorted(
        (r["id"], r["amt"], r["_change_type"], r["_commit_version"])
        for r in table_changes(DeltaTable(spark, path), v0).collect()
    )
    assert got == [
        (1, 1.0, "delete", v0 + 1),
        (1, 10.0, "insert", v0 + 1),
        (3, 3.0, "delete", v0 + 1),
        (3, 30.0, "insert", v0 + 1),
    ]


def test_merge_dv_insert_only_leaves_matched_rows_untouched(spark, tmp_path):
    """No update clause -> matched rows are not a matched action: no DV
    churn, no spurious change-feed delete/insert pairs for unchanged rows."""
    from delta_sorter_spark.operators.dml import merge_dv, table_changes

    path = str(tmp_path / "mor_noupd")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v0 = table.log.latest_version()
    src = spark.createDataFrame([(2, 99.0), (3, 3.0)], "id long, amt double")
    out = merge_dv(table, src, ["id"])  # insert-only merge; id 2 matched
    assert out["dv_files"] == 0 and out["dv_marked_rows"] == 0
    assert out["appended_rows"] == 1
    t2 = DeltaTable(spark, path)
    got = sorted(tuple(r) for r in t2.to_df().collect())
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]  # matched row unchanged
    feed = [
        (r["id"], r["_change_type"])
        for r in table_changes(t2, v0).collect()
    ]
    assert feed == [(3, "insert")]  # no delete/insert noise for id 2


def test_merge_dv_txn_idempotence(spark, tmp_path):
    """Exactly-once CDC apply: re-delivering a batch with the same
    (app_id, version) is a no-op before any compute; the next version
    applies and records."""
    from delta_sorter_spark.operators.dml import merge_dv

    path = str(tmp_path / "mor_txn")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    batch = spark.createDataFrame([(2, 20.0), (3, 3.0)], "id long, amt double")
    out1 = merge_dv(
        table, batch, ["id"], when_matched_update={"amt": "s.amt"},
        txn_app_id="cdc", txn_version=1,
    )
    assert out1["appended_rows"] == 2
    out2 = merge_dv(  # redelivery: same batch, same version
        DeltaTable(spark, path), batch, ["id"],
        when_matched_update={"amt": "s.amt"}, txn_app_id="cdc", txn_version=1,
    )
    assert out2.get("skipped") and out2["appended_rows"] == 0
    got = sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [(1, 1.0), (2, 20.0), (3, 3.0)]
    nxt = spark.createDataFrame([(4, 4.0)], "id long, amt double")
    out3 = merge_dv(
        DeltaTable(spark, path), nxt, ["id"],
        when_matched_update={"amt": "s.amt"}, txn_app_id="cdc", txn_version=2,
    )
    assert out3["appended_rows"] == 1 and not out3.get("skipped")


def test_dv_delete_and_update_txn_idempotence(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where_dv, update_where_dv

    path = str(tmp_path / "dv_txn")
    df = spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, amt double")
    table = DeltaTable.create(spark, path, df.coalesce(1))
    out1 = delete_where_dv(table, "id = 1", txn_app_id="etl", txn_version=1)
    assert out1["deleted_rows"] == 1
    out2 = delete_where_dv(
        DeltaTable(spark, path), "id = 2", txn_app_id="etl", txn_version=1
    )
    assert out2.get("skipped")  # redelivered version: nothing deleted
    out3 = update_where_dv(
        DeltaTable(spark, path), "id = 3", {"amt": "amt + 100"},
        txn_app_id="etl", txn_version=2,
    )
    assert out3["updated_rows"] == 1
    out4 = update_where_dv(
        DeltaTable(spark, path), "id = 4", {"amt": "amt + 100"},
        txn_app_id="etl", txn_version=2,
    )
    assert out4.get("skipped")
    got = {r["id"]: r["amt"] for r in DeltaTable(spark, path).to_df().collect()}
    assert set(got) == {0, 2, 3, 4, 5}      # only id 1 deleted
    assert got[3] == 103.0 and got[4] == 4.0  # only id 3 updated


def test_merge_changed_file_detection_on_dv_table(spark, tmp_path):
    """Round-8 regression: MERGE's changed-file pass derives row
    provenance from _metadata.file_path, not input_file_name() — the
    positional DV anti-join makes the latter silently '' for every row of
    a DV'd file, which made selective rewrites mis-plan on
    merge-on-read tables.  A selective update hitting ONLY the DV'd file
    must rewrite exactly that file, keep the other intact, and never
    resurrect the DV-hidden rows."""
    from delta_sorter_spark.operators.dml import delete_where_dv, merge

    path = str(tmp_path / "dv_merge_sel")
    low = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "id long, amt double"
    )
    high = spark.createDataFrame(
        [(i, float(i)) for i in range(100, 106)], "id long, amt double"
    )
    table = DeltaTable.create(spark, path, low.coalesce(1), stat_columns=["id"])
    table.append(high.coalesce(1), stat_columns=["id"])
    delete_where_dv(table, "id IN (1, 2)")  # DV on the low file

    # source hits BOTH files' key ranges, but only the low file has a row
    # whose amt actually changes -> exactly one rewrite
    src = spark.createDataFrame(
        [(4, 44.0), (104, 104.0)], "id long, amt double"
    )
    out = merge(
        DeltaTable(spark, path), src, ["id"],
        when_matched_update={"amt": "s.amt"},
        when_not_matched_insert=False,
        matched_condition="t.amt <> s.amt",
    )
    assert out["rewritten_files"] == 1
    got = sorted((r["id"], r["amt"]) for r in DeltaTable(spark, path).to_df().collect())
    assert got == [
        (0, 0.0), (3, 3.0), (4, 44.0), (5, 5.0),
        (100, 100.0), (101, 101.0), (102, 102.0),
        (103, 103.0), (104, 104.0), (105, 105.0),
    ]
