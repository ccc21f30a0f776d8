"""Type widening (Delta ``typeWidening`` reader-writer feature): widened
log schema over narrower physical files, protocol/metadata bookkeeping,
stats survival, DML-after-widen, rejections."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable

BIG = 3_000_000_000  # > int32 max


def make_table(spark, path):
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 13).cast("float").alias("x"),
        F.col("id").cast("short").alias("s"),
    )
    return DeltaTable.create(
        spark, path, df.repartition(4), stat_columns=["k"]
    )


def test_widen_int_to_long_reads_and_appends(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.widen_column("k", "long")
    meta = tbl.metadata
    f = meta.schema["k"]
    assert f.dataType.simpleString() == "bigint"
    changes = f.metadata["delta.typeChanges"]
    assert changes[-1]["fromType"] == "integer" and changes[-1]["toType"] == "long"
    proto = tbl.state().protocol
    assert "typeWidening" in (proto.get("readerFeatures") or [])
    assert "typeWidening" in (proto.get("writerFeatures") or [])
    assert proto["minReaderVersion"] >= 3
    # old int32 files read through the widened schema
    assert tbl.to_df().where("k = 999").count() == 1
    # values beyond int32 range append and read back
    tbl.append(
        spark.range(0, 10).select(
            (F.col("id") + BIG).alias("k"),
            F.lit(1.5).cast("float").alias("x"),
            F.lit(1).cast("short").alias("s"),
        )
    )
    out = tbl.to_df()
    assert out.where(f"k >= {BIG}").count() == 10
    assert out.count() == 1010
    assert dict(out.dtypes)["k"] == "bigint"


def test_widen_keeps_zone_map_pruning(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.widen_column("k", "long")
    tbl.append(
        spark.range(0, 10).select(
            (F.col("id") + BIG).alias("k"),
            F.lit(0.0).cast("float").alias("x"),
            F.lit(0).cast("short").alias("s"),
        ).coalesce(1)
    )
    n = len(tbl.state().adds)
    # stats written as int32 still prune under the widened type, and the
    # beyond-int32 point lands only in the new file
    assert len(tbl.files_matching(f"k = {BIG + 5}")) == 1
    assert len(tbl.files_matching("k = 1")) < n
    assert tbl.to_df(where=f"k = {BIG + 5}").count() == 1


def test_widen_float_to_double_and_chain(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.widen_column("x", "double")
    assert dict(tbl.to_df().dtypes)["x"] == "double"
    assert tbl.to_df().where("x = 12.0").count() > 0
    # chained widening accumulates typeChanges entries
    tbl.widen_column("s", "int")
    tbl.widen_column("s", "long")
    changes = tbl.metadata.schema["s"].metadata["delta.typeChanges"]
    assert [(c["fromType"], c["toType"]) for c in changes] == [
        ("short", "integer"),
        ("integer", "long"),
    ]
    assert dict(tbl.to_df().dtypes)["s"] == "bigint"


def test_widen_rejections_and_idempotence(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unsupported type change"):
        tbl.widen_column("k", "short")  # narrowing
    with pytest.raises(ValueError, match="unsupported type change"):
        tbl.widen_column("k", "string")
    with pytest.raises(KeyError):
        tbl.widen_column("nope", "long")
    v = tbl.widen_column("k", "long")
    assert tbl.widen_column("k", "long") > v  # empty commit, but no error
    df = spark.range(0, 10).select((F.col("id") % 3).cast("int").alias("p"), F.col("id").alias("v"))
    part = DeltaTable.create(spark, str(tmp_path / "p"), df, partition_columns=["p"])
    with pytest.raises(ValueError, match="partition column"):
        part.widen_column("p", "long")


def test_widen_survives_checkpoint_and_dml(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where, update_where

    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.widen_column("k", "long")
    tbl.log.write_checkpoint()
    fresh = DeltaTable(spark, tbl.table_path)
    f = fresh.metadata.schema["k"]
    assert f.dataType.simpleString() == "bigint"
    assert f.metadata["delta.typeChanges"][-1]["toType"] == "long"
    update_where(fresh, "k = 5", {"x": "99.0"})
    delete_where(fresh, "k = 6")
    out = fresh.to_df()
    assert out.where("k = 5").collect()[0]["x"] == 99.0
    assert out.where("k = 6").count() == 0
    assert out.count() == 999
