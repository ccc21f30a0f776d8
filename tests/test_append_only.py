"""delta.appendOnly enforcement: appends and dataChange=false maintenance
stay allowed; every row-removing/modifying verb refuses."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.dml import (
    delete_where,
    delete_where_dv,
    merge,
    restore,
    update_where,
    upsert,
)
from delta_sorter_spark.sources.delta_table import DeltaTable


@pytest.fixture()
def ao_table(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.repartition(2),
                            stat_columns=["k"])
    tbl.set_table_properties({"delta.appendOnly": "true"})
    return tbl


def test_append_only_blocks_mutations(ao_table, spark):
    tbl = ao_table
    src = spark.range(3).select(F.col("id").alias("k"), F.lit(9).alias("v"))
    with pytest.raises(ValueError, match="appendOnly"):
        delete_where(tbl, "k = 1")
    with pytest.raises(ValueError, match="appendOnly"):
        delete_where_dv(tbl, "k = 1")
    with pytest.raises(ValueError, match="appendOnly"):
        update_where(tbl, "k = 1", {"v": "0"})
    with pytest.raises(ValueError, match="appendOnly"):
        upsert(tbl, src, ["k"])
    with pytest.raises(ValueError, match="appendOnly"):
        merge(tbl, src, ["k"], when_matched_update={"v": "s.v"})
    with pytest.raises(ValueError, match="appendOnly"):
        restore(tbl, 0)
    assert tbl.to_df().count() == 100  # nothing happened


def test_append_only_allows_append_and_maintenance(ao_table, spark):
    from delta_sorter_spark.api import compact

    tbl = ao_table
    tbl.append(
        spark.range(100, 120).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    )
    assert tbl.to_df().count() == 120
    # dataChange=false maintenance moves bytes, not data — allowed
    compact(tbl.table_path, sort_columns=["k"], spark=tbl.spark,
            repartition_by_sort_key=True)
    fresh = DeltaTable(tbl.spark, tbl.table_path)
    assert fresh.to_df().count() == 120
    # feature enumeration: a later features upgrade lists appendOnly
    fresh.enable_row_tracking()
    assert "appendOnly" in fresh.state().protocol["writerFeatures"]


def test_vacuum_honors_retention_property(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import _parse_retention_interval

    assert _parse_retention_interval("interval 7 days") == 7 * 86400.0
    assert _parse_retention_interval("INTERVAL 2 Hours") == 7200.0
    assert _parse_retention_interval("interval 1 minute") == 60.0
    # Delta's documented default unit for deletedFileRetentionDuration
    assert _parse_retention_interval("interval 1 week") == 7 * 86400.0
    assert _parse_retention_interval("interval 500 milliseconds") == 0.5
    assert _parse_retention_interval(None) == 0.0
    # present-but-unparseable must raise, NOT silently mean zero retention
    # (vacuum would otherwise delete files in-flight readers reference)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_retention_interval("garbage")
    with _pytest.raises(ValueError):
        _parse_retention_interval("interval 1 fortnight")
    with _pytest.raises(ValueError):
        _parse_retention_interval("interval x days")

    df = spark.range(20).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    tbl.set_table_properties(
        {"delta.deletedFileRetentionDuration": "interval 1 hours"}
    )
    delete_where(tbl, "k < 5")  # tombstones the original file
    # property default: everything is younger than 1h -> protected
    assert tbl.vacuum() == []
    # explicit override still wins
    assert len(tbl.vacuum(retention_seconds=0.0)) >= 1
    assert tbl.to_df().count() == 15


def test_target_file_size_property(spark, tmp_path):
    """delta.targetFileSize: the table-level write-size default every
    staged write honors; explicit arguments win; junk raises at SET time."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "tfs")
    tbl = DeltaTable.create(
        spark, path,
        spark.range(10).select(F.col("id").alias("k")).coalesce(1),
    )
    tbl.set_table_properties({"delta.targetFileSize": "2kb"})
    big = spark.range(5000).select(F.col("id").alias("k")).coalesce(1)
    before = len(tbl.state().adds)
    tbl.append(big)
    appended = len(tbl.state().adds) - before
    assert appended > 1  # the 2 KB cap split one input partition

    # explicit argument beats the property
    adds = tbl.stage_write(big, target_file_size_bytes=1 << 30)
    assert len(adds) == 1
    tbl.discard_files(adds)

    with _pytest.raises(ValueError, match="targetFileSize"):
        tbl.set_table_properties({"delta.targetFileSize": "huge"})
