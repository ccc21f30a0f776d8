"""Incremental rollup maintenance tests (operators/rollup.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.rollup import (
    ROLLUP_SCHEMA,
    changed_data_adds,
    incremental_rollup,
)
from delta_sorter_spark.sources.delta_table import DeltaTable


def _events(spark, start_hour: int, n: int):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            start_hour * 1000 + i,
            base + dt.timedelta(hours=start_hour, minutes=i % 60),
            "click" if i % 2 == 0 else "view",
            float(i % 10),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )


def _full_recompute(spark, source):
    from delta_sorter_spark.operators.rollup import _partials

    return {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _partials(source.to_df(), "1 hour").collect()
    }


def _rollup_dict(rollup):
    return {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rollup.to_df().collect()
    }


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    src = DeltaTable.create(
        spark, str(tmp_path / "ev"), _events(spark, 0, 120).coalesce(1)
    )
    rollup = DeltaTable.create(
        spark,
        str(tmp_path / "ru"),
        spark.createDataFrame([], ROLLUP_SCHEMA).coalesce(1),
        stat_columns=["window_start"],
    )

    out1 = incremental_rollup(src, rollup, since_version=0)
    assert out1["new_files"] == 1
    assert _rollup_dict(rollup).keys() == _full_recompute(spark, src).keys()

    # append a batch overlapping hour 1 and adding hour 5
    adds = src.stage_write(_events(spark, 1, 90).coalesce(1))
    src.log.commit_with_retry(lambda state: list(adds), operation="WRITE")
    adds = src.stage_write(_events(spark, 5, 30).coalesce(1))
    src.log.commit_with_retry(lambda state: list(adds), operation="WRITE")

    out2 = incremental_rollup(src, rollup, since_version=out1["source_version"])
    assert out2["new_files"] == 2

    got = _rollup_dict(rollup)
    want = _full_recompute(spark, src)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_compaction_does_not_retrigger_rollup(spark, tmp_path):
    from delta_sorter_spark.api import compact

    src = DeltaTable.create(
        spark, str(tmp_path / "ev2"), _events(spark, 0, 60).repartition(3)
    )
    rollup = DeltaTable.create(
        spark,
        str(tmp_path / "ru2"),
        spark.createDataFrame([], ROLLUP_SCHEMA).coalesce(1),
        stat_columns=["window_start"],
    )
    out = incremental_rollup(src, rollup, since_version=0)
    before = _rollup_dict(rollup)

    # compaction rewrites every file but with data_change=false
    compact(str(tmp_path / "ev2"), ["event_type", "ts"], repartition_by_sort_key=True, spark=spark)
    assert changed_data_adds(src, out["source_version"]) == []

    out2 = incremental_rollup(src, rollup, since_version=out["source_version"])
    assert out2["new_files"] == 0
    assert _rollup_dict(rollup) == before


def test_cdc_rollup_handles_updates_and_deletes(spark, tmp_path):
    """incremental_rollup_cdc nets out deletes/updates via signed change-feed
    partials: after upsert + delete on the source, the rollup equals a full
    recompute (modulo netted-to-zero windows kept as explicit zeros)."""
    from delta_sorter_spark.operators.dml import delete_where, upsert
    from delta_sorter_spark.operators.rollup import incremental_rollup_cdc

    src = DeltaTable.create(
        spark,
        str(tmp_path / "ev3"),
        _events(spark, 0, 120).coalesce(2),
        stat_columns=["event_id"],
    )
    rollup = DeltaTable.create(
        spark,
        str(tmp_path / "ru3"),
        spark.createDataFrame([], ROLLUP_SCHEMA).coalesce(1),
        stat_columns=["window_start"],
    )
    out = incremental_rollup_cdc(src, rollup, since_version=0)
    assert _rollup_dict(rollup) == _full_recompute(spark, src)

    # UPDATE: move event 10's value; DELETE: drop events 30-59 (half hour 0)
    upsert(
        src,
        _events(spark, 0, 120).where("event_id = 10").withColumn(
            "value", F.lit(99.0)
        ),
        ["event_id"],
    )
    delete_where(src, "event_id >= 30 AND event_id < 60")

    out2 = incremental_rollup_cdc(src, rollup, since_version=out["source_version"])
    assert out2["merged_windows"] >= 1
    got = {k: v for k, v in _rollup_dict(rollup).items() if v[0] > 0}
    assert got == _full_recompute(spark, src)
