"""Round-trip tests for the generic file-format sources (sources/formats.py)."""

import pytest

from delta_sorter_spark.sources.formats import (
    infer_format,
    read_source,
    register_tables,
    write_sink,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.0)],
        "id long, name string, score double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, tmp_path, sample, fmt):
    path = str(tmp_path / f"t.{fmt}")
    write_sink(sample, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=sample.schema)
    assert sorted((r["id"], r["name"], r["score"]) for r in back.collect()) == sorted(
        (r["id"], r["name"], r["score"]) for r in sample.collect()
    )


def test_infer_format(tmp_path):
    assert infer_format("/x/y/data.csv") == "csv"
    assert infer_format("/x/y/data.jsonl") == "json"
    assert infer_format("/x/y/data.parquet") == "parquet"
    with pytest.raises(ValueError):
        infer_format("/x/y/data.xyz")


def test_partitioned_write(spark, tmp_path, sample):
    path = str(tmp_path / "part.parquet")
    write_sink(sample, path, partition_by=["name"])
    back = read_source(spark, path, schema=None)
    assert back.count() == 3


def test_register_tables_sql(spark):
    register_tables(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"]
    assert n == 25


def test_read_binary_assets(spark, tmp_path):
    from delta_sorter_spark.sources.formats import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.img").write_bytes(b"\x89IMG" + b"\x00" * 10)
    (d / "b.img").write_bytes(b"\x89IMG" + b"\xff" * 2000)
    (d / "skip.txt").write_bytes(b"not an image")
    out = read_binary_assets(spark, str(d), glob="*.img").collect()
    assert {r["path"].rsplit("/", 1)[-1] for r in out} == {"a.img", "b.img"}
    row = {r["path"].rsplit("/", 1)[-1]: r for r in out}
    assert bytes(row["a.img"]["content"])[:4] == b"\x89IMG"
    assert row["b.img"]["length"] == 2004
    # oversized payloads excluded up front
    small = read_binary_assets(spark, str(d), glob="*.img", max_bytes=100).collect()
    assert [r["path"].rsplit("/", 1)[-1] for r in small] == ["a.img"]
