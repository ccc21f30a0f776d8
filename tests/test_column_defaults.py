"""Column DEFAULT values (Delta ``allowColumnDefaults`` writer feature):
defaults fill future appends, never backfill; validation and rejections."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable


def make_table(spark, path):
    df = spark.range(10).select(F.col("id").alias("k"))
    return DeltaTable.create(spark, path, df.coalesce(1), stat_columns=["k"])


def test_add_column_with_default(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.add_column("source", "string", default="'backfill-2026'")
    proto = tbl.state().protocol
    assert "allowColumnDefaults" in proto["writerFeatures"]
    assert proto.get("readerFeatures") is None  # writer-only feature
    # existing rows: NULL (no backfill), per Delta's contract
    assert tbl.to_df().where("source IS NULL").count() == 10
    # append omitting the column -> default fills
    tbl.append(spark.range(10, 15).select(F.col("id").alias("k")))
    assert tbl.to_df().where("source = 'backfill-2026'").count() == 5
    # explicit values still win
    tbl.append(
        spark.range(15, 18).select(
            F.col("id").alias("k"), F.lit("explicit").alias("source")
        )
    )
    out = tbl.to_df()
    assert out.where("source = 'explicit'").count() == 3
    assert out.count() == 18


def test_set_and_drop_default_on_existing_column(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.add_column("score", "double")
    tbl.append(spark.range(10, 12).select(F.col("id").alias("k")))
    assert tbl.to_df().where("score IS NULL").count() == 12
    tbl.set_column_default("score", "0.5")
    tbl.append(spark.range(12, 14).select(F.col("id").alias("k")))
    assert tbl.to_df().where("score = 0.5").count() == 2
    tbl.set_column_default("score", None)  # DROP DEFAULT
    tbl.append(spark.range(14, 16).select(F.col("id").alias("k")))
    assert tbl.to_df().where("score IS NULL").count() == 14
    # non-constant deterministic expressions work too
    tbl.set_column_default("score", "CAST(1 AS DOUBLE) / 4")
    tbl.append(spark.range(16, 17).select(F.col("id").alias("k")))
    assert tbl.to_df().where("score = 0.25").count() == 1


def test_default_rejections(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    with pytest.raises(KeyError):
        tbl.set_column_default("nope", "1")
    with pytest.raises(ValueError, match="invalid DEFAULT"):
        tbl.set_column_default("k", "k + 1")  # column-referencing
    with pytest.raises(ValueError, match="invalid DEFAULT"):
        tbl.add_column("z", "long", default="not_a_function()")
    ident = DeltaTable.create(
        spark,
        str(tmp_path / "i"),
        spark.range(3).select(F.col("id").alias("v")),
        identity_columns={"rid": (1, 1)},
    )
    with pytest.raises(ValueError, match="identity"):
        ident.set_column_default("rid", "7")


def test_default_survives_checkpoint_and_feeds_constraints(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    tbl.add_column("source", "string", default="'s3'")
    tbl.add_check_constraint("src_set", "source IS NOT NULL OR k < 10")
    tbl.log.write_checkpoint()
    fresh = DeltaTable(spark, tbl.table_path)
    fresh.append(spark.range(10, 12).select(F.col("id").alias("k")))
    # the default filled BEFORE constraint enforcement, so the commit stands
    assert fresh.to_df().where("source = 's3'").count() == 2
