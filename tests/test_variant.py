"""VARIANT columns (Delta ``variantType`` reader-writer feature): protocol
declaration, write/read/DML on the local plane, Spark-reader stats fallback
(this pyarrow build cannot parse VARIANT footers), capability gates."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.sources.delta_table import DeltaTable


def make_table(spark, path, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.format_string(
                '{"a": %d, "tags": ["t%d"]}', F.col("id"), F.col("id") % 3
            )
        ).alias("props"),
    )
    return DeltaTable.create(
        spark,
        path,
        df.repartitionByRange(2, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )


def test_variant_create_read_append_dml(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    proto = tbl.state().protocol
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    assert proto["minReaderVersion"] == 3
    assert dict(tbl.to_df().dtypes)["props"] == "variant"
    got = (
        tbl.to_df()
        .select(F.expr("variant_get(props, '$.a', 'long')").alias("a"))
        .where("a = 7")
        .count()
    )
    assert got == 1
    # append + copy-on-write delete both rewrite files containing variant
    tbl.append(
        spark.range(40, 50).select(
            F.col("id").alias("k"),
            F.parse_json(F.format_string('{"a": %d}', F.col("id"))).alias("props"),
        )
    )
    from delta_sorter_spark.operators.dml import delete_where

    delete_where(tbl, "k = 45")
    out = tbl.to_df()
    assert out.count() == 49
    # nested array path reads through
    tags = out.select(
        F.expr("variant_get(props, '$.tags[0]', 'string')").alias("t")
    )
    assert tags.where("t = 't1'").count() == 13


def test_variant_stats_fallback_prunes(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"))
    # range-partitioned by k: the Spark-reader stats fallback must still
    # produce zone maps that prune the k files
    n = len(tbl.state().adds)
    assert n == 2
    assert len(tbl.files_matching("k = 1")) == 1
    st = tbl.state().adds[0].stats
    assert st["numRecords"] > 0 and "k" in st["minValues"]
    # keyStats attestation also present (same summarizer as pyarrow path)
    assert "keyStats" in st


def test_variant_compact_roundtrip(spark, tmp_path):
    from delta_sorter_spark.api import compact

    tbl = make_table(spark, str(tmp_path / "t"))
    before = sorted(
        r["a"]
        for r in tbl.to_df()
        .select(F.expr("variant_get(props,'$.a','long')").alias("a"))
        .collect()
    )
    compact(tbl.table_path, sort_columns=["k"], spark=spark,
            repartition_by_sort_key=True)
    after_tbl = DeltaTable(spark, tbl.table_path)
    after = sorted(
        r["a"]
        for r in after_tbl.to_df()
        .select(F.expr("variant_get(props,'$.a','long')").alias("a"))
        .collect()
    )
    assert after == before


def test_variant_rejections_and_gates(spark, tmp_path):
    df = spark.range(5).select(
        F.col("id").alias("k"), F.parse_json(F.lit('{"x":1}')).alias("v")
    )
    with pytest.raises(ValueError, match="VARIANT.*stat"):
        DeltaTable.create(spark, str(tmp_path / "bad"), df, stat_columns=["v"])
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df)
    # the pyarrow-based data source plane refuses loudly
    from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

    spark.dataSource.register(DeltaStreamDataSource)
    with pytest.raises(Exception, match="VARIANT"):
        spark.read.format("delta_sorter").option(
            "path", tbl.table_path
        ).load().count()


def test_add_variant_column_upgrades_protocol(spark, tmp_path):
    df = spark.range(5).select(F.col("id").alias("k"))
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df)
    assert tbl.state().protocol.get("readerFeatures") is None
    tbl.add_column("payload", "variant")
    proto = tbl.state().protocol
    assert "variantType" in proto["readerFeatures"]
    # old files read NULL for the new variant column
    assert tbl.to_df().where("payload IS NULL").count() == 5


def test_variant_survives_checkpoint(spark, tmp_path):
    tbl = make_table(spark, str(tmp_path / "t"), n=10)
    tbl.log.write_checkpoint()
    fresh = DeltaTable(spark, tbl.table_path)
    assert dict(fresh.to_df().dtypes)["props"] == "variant"
    assert "variantType" in fresh.state().protocol["readerFeatures"]
    assert fresh.to_df().count() == 10


def test_timestamp_ntz_declares_feature(spark, tmp_path):
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 3600).cast("timestamp_ntz").alias("ts"),
    )
    tbl = DeltaTable.create(spark, str(tmp_path / "t"), df, stat_columns=["ts"])
    proto = tbl.state().protocol
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["timestampNtz"]
    assert proto["writerFeatures"] == ["timestampNtz"]
    # ntz stats and pruning unaffected (pyarrow reads ntz footers fine)
    assert tbl.to_df().count() == 5
    plain = DeltaTable.create(
        spark, str(tmp_path / "p"),
        spark.range(3).select(F.col("id").alias("k")),
    )
    assert plain.state().protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    plain.add_column("seen_at", "timestamp_ntz")
    assert "timestampNtz" in plain.state().protocol["readerFeatures"]


def test_attest_variant_table_uses_spark_fallback(spark, tmp_path):
    """attest_sort_stats on a VARIANT-carrying table routes stats through
    the Spark reader (pyarrow cannot parse the footers) and still makes
    validation metadata-only."""
    from pyspark.sql import functions as F  # noqa: F401

    from delta_sorter_spark.api import validate
    from delta_sorter_spark.operators.validate import attest_sort_stats
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "attv")
    df = spark.range(30).selectExpr(
        "id AS k", "parse_json(concat('{\"a\":', id, '}')) AS props"
    )
    tbl = DeltaTable.create(spark, path, df.coalesce(1))
    assert not any((a.stats or {}).get("keyStats") for a in tbl.state().adds)
    r = attest_sort_stats(tbl, ["k"])
    assert r["attested"] == 1
    sc = spark.sparkContext
    sc.setJobGroup("att-variant", "metadata-only validate")
    try:
        rep = validate(path, ["k"], spark=spark)
    finally:
        sc.setJobGroup(None, None)
    assert rep["boundary_violations"] == 0
    assert len(sc.statusTracker().getJobIdsForGroup("att-variant")) == 0
