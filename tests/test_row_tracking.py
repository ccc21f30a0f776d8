"""Delta row tracking (``rowTracking`` writer feature + ``domainMetadata``).

The contract under test: every row has a STABLE id.  Fresh ids come from
the Add's ``baseRowId`` + physical position; the ``delta.rowTracking``
domainMetadata carries the id high-water mark, bumped atomically with each
assignment; rewrites that copy rows (compaction, copy-on-write DELETE /
UPDATE, merge-on-read UPDATE) preserve ids through materialized hidden
columns that readers coalesce first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable


def _ids(tbl, order_col="id"):
    return {
        r[order_col]: (r["_row_id"], r["_row_commit_version"])
        for r in tbl.to_df_with_row_ids().collect()
    }


@pytest.fixture()
def rt_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    path = str(tmp_path / "rt")
    t = DeltaTable.create(spark, path, df.coalesce(2), stat_columns=["id"])
    t.enable_row_tracking()
    return DeltaTable(spark, path)


def test_enable_assigns_unique_ids_and_hwm(rt_table):
    t = rt_table
    state = t.state()
    assert state.row_id_high_water_mark == 9
    assert all(a.base_row_id is not None for a in state.adds)
    assert "rowTracking" in state.protocol["writerFeatures"]
    assert "domainMetadata" in state.protocol["writerFeatures"]
    ids = [rid for rid, _ in _ids(t).values()]
    assert sorted(ids) == list(range(10))  # dense, unique
    # idempotent
    v = t.log.latest_version()
    assert DeltaTable(t.spark, t.table_path).enable_row_tracking() == v


def test_append_gets_fresh_ids_above_hwm(rt_table, spark):
    t = rt_table
    t.append(spark.createDataFrame([(100, "x"), (101, "y")], "id long, v string"))
    t2 = DeltaTable(spark, t.table_path)
    assert t2.state().row_id_high_water_mark == 11
    ids = _ids(t2)
    assert sorted(rid for rid, _ in ids.values()) == list(range(12))
    # the appended rows carry the append's commit version
    v = t2.log.latest_version()
    assert ids[100][1] == v and ids[101][1] == v


def test_compaction_preserves_ids(rt_table, spark):
    from delta_sorter_spark.api import compact

    t = rt_table
    before = _ids(t)
    res = compact(
        t.table_path, sort_columns=["v"], spark=spark,
        repartition_by_sort_key=True,  # strict: unconditional global rewrite
    )
    assert res.files_in >= 1
    after = _ids(DeltaTable(spark, t.table_path))
    assert after == before  # ids AND commit versions survive the rewrite


def test_delete_preserves_survivor_ids(rt_table, spark):
    from delta_sorter_spark.operators.dml import delete_where

    t = rt_table
    before = _ids(t)
    delete_where(t, "id IN (3, 7)")
    after = _ids(DeltaTable(spark, t.table_path))
    assert set(after) == set(before) - {3, 7}
    assert all(after[k] == before[k] for k in after)


def test_update_keeps_id_bumps_commit_version(rt_table, spark):
    from delta_sorter_spark.operators.dml import update_where

    t = rt_table
    before = _ids(t)
    update_where(t, "id = 4", {"v": "'updated'"})
    t2 = DeltaTable(spark, t.table_path)
    after = _ids(t2)
    v = t2.log.latest_version()
    assert after[4][0] == before[4][0]  # id stable
    assert after[4][1] == v             # commit version bumps
    untouched = {k: val for k, val in after.items() if k != 4}
    assert untouched == {k: val for k, val in before.items() if k != 4}


def test_dv_delete_and_update_preserve_ids(rt_table, spark):
    from delta_sorter_spark.operators.dml import delete_where_dv, update_where_dv

    t = rt_table
    before = _ids(t)
    delete_where_dv(t, "id = 2")  # merge-on-read: same files, positions stable
    t2 = DeltaTable(spark, t.table_path)
    mid = _ids(t2)
    assert set(mid) == set(before) - {2}
    assert all(mid[k] == before[k] for k in mid)

    update_where_dv(t2, "id = 5", {"v": "'dv-updated'"})
    t3 = DeltaTable(spark, t.table_path)
    after = _ids(t3)
    v = t3.log.latest_version()
    assert after[5][0] == before[5][0]  # id survives the DV update
    assert after[5][1] == v
    assert all(after[k] == mid[k] for k in after if k != 5)
    got = {
        r["id"]: r["v"] for r in t3.to_df().collect()
    }
    assert got[5] == "dv-updated" and 2 not in got


def test_merge_dv_updated_rows_keep_ids(rt_table, spark):
    from delta_sorter_spark.operators.dml import merge_dv

    t = rt_table
    before = _ids(t)
    src = spark.createDataFrame(
        [(6, "merged"), (200, "new")], "id long, v string"
    )
    merge_dv(t, src, ["id"], when_matched_update={"v": "s.v"})
    t2 = DeltaTable(spark, t.table_path)
    after = _ids(t2)
    v = t2.log.latest_version()
    assert after[6][0] == before[6][0]
    assert after[6][1] == v
    assert after[200][0] > max(rid for rid, _ in before.values())  # fresh id
    assert all(after[k] == before[k] for k in after if k not in (6, 200))


def test_merge_cow_preserves_ids(rt_table, spark):
    """Copy-on-write MERGE: unchanged rows in rewritten files carry id AND
    commit version; updated rows keep the id with a bumped version;
    inserts get fresh ids above the high-water mark."""
    from delta_sorter_spark.operators.dml import merge

    t = rt_table
    before = _ids(t)
    src = spark.createDataFrame(
        [(1, "merged"), (8, "gone"), (500, "new")], "id long, v string"
    )
    merge(
        t, src, ["id"],
        when_matched_update={"v": "s.v"},
        matched_condition="s.v <> 'gone'",
        when_matched_delete="s.v = 'gone'",
    )
    t2 = DeltaTable(spark, t.table_path)
    after = _ids(t2)
    v = t2.log.latest_version()
    assert 8 not in after
    assert after[1][0] == before[1][0] and after[1][1] == v
    assert after[500][0] > max(rid for rid, _ in before.values())
    assert all(
        after[k] == before[k] for k in after if k not in (1, 500)
    ), "unchanged rows (same or sibling files) must carry id AND version"
    got = {r["id"]: r["v"] for r in t2.to_df().collect()}
    assert got[1] == "merged" and got[500] == "new"


def test_ids_survive_checkpoint_roundtrip(rt_table, spark):
    t = rt_table
    before = _ids(t)
    t.log.write_checkpoint()
    t2 = DeltaTable(spark, t.table_path)
    assert _ids(t2) == before
    assert t2.state().row_id_high_water_mark == 9
    # and a post-checkpoint append continues above the checkpointed HWM
    t2.append(spark.createDataFrame([(300, "z")], "id long, v string"))
    t3 = DeltaTable(spark, t.table_path)
    assert t3.state().row_id_high_water_mark == 10
    assert _ids(t3)[300][0] == 10


def test_cli_feature_verbs(spark, tmp_path, capsys):
    """--enable-row-tracking / --enable-in-commit-timestamps /
    --add-constraint / --drop-constraint drive the protocol features from
    the maintenance CLI; a violating ADD CONSTRAINT exits 1."""
    from delta_sorter_spark import cli

    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    path = str(tmp_path / "cliverbs")
    DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["id"])

    assert cli.main(["--table", path, "--enable-row-tracking"]) == 0
    assert "row tracking enabled" in capsys.readouterr().out
    assert cli.main(["--table", path, "--enable-in-commit-timestamps"]) == 0
    assert "in-commit timestamps enabled" in capsys.readouterr().out
    assert cli.main(["--table", path, "--add-constraint", "v_pos", "v > 0"]) == 0
    assert "constraint added" in capsys.readouterr().out
    assert cli.main(["--table", path, "--add-constraint", "bad", "v > 10"]) == 1
    assert cli.main(["--table", path, "--drop-constraint", "v_pos"]) == 0
    capsys.readouterr()
    assert cli.main(["--table", path, "--drop-constraint", "nope"]) == 2
    t = DeltaTable(spark, path)
    assert t.row_tracking_enabled()
    assert t.metadata.check_constraints == {}
    assert sorted(r[0] for r in t.to_df_with_row_ids().select("_row_id").collect()) == [0, 1]


def test_clone_carries_hwm_and_protocol(rt_table, spark, tmp_path):
    """A shallow clone of a row-tracked table must carry the id high-water
    mark (fresh clone-side ids would otherwise restart at 0 and collide
    with the cloned rows') and the source's feature protocol."""
    t = rt_table
    before = _ids(t)
    clone = DeltaTable.clone(spark, t.table_path, str(tmp_path / "rtclone"))
    cstate = clone.state()
    assert cstate.row_id_high_water_mark == 9
    assert "rowTracking" in (cstate.protocol.get("writerFeatures") or [])
    assert _ids(clone) == before
    clone.append(
        spark.createDataFrame([(400, "c")], "id long, v string")
    )
    c2 = DeltaTable(spark, clone.table_path)
    ids = _ids(c2)
    assert ids[400][0] == 10  # continues ABOVE the cloned high-water mark
    assert sorted(rid for rid, _ in ids.values()) == list(range(11))


def test_disabled_table_raises(spark, tmp_path):
    t = DeltaTable.create(
        spark, str(tmp_path / "plain"),
        spark.createDataFrame([(1,)], "id long"),
    )
    with pytest.raises(ValueError, match="row tracking"):
        t.to_df_with_row_ids()
