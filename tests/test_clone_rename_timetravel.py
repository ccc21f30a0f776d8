"""Shallow clone, column-mapping rename, and timestamp time travel.

All three are metadata-only operations on the Delta log (no data files
copied or rewritten) — the patterns that make 100 TB experimentation
cheap: branch a table, rename without rewriting, query as-of a time.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.dml import delete_where_dv, upsert
from delta_sorter_spark.sources.delta_table import DeltaTable


def _mk(spark, path, partitioned=False, rows=None):
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
    df = spark.createDataFrame(rows, "id long, cat string, val long").coalesce(1)
    return DeltaTable.create(
        spark,
        path,
        df,
        partition_columns=["cat"] if partitioned else None,
        stat_columns=["id"],
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


class TestShallowClone:
    def test_clone_reads_source_data_without_copying(self, spark, tmp_path):
        src = _mk(spark, str(tmp_path / "src"), partitioned=True)
        dst = DeltaTable.clone(spark, src.table_path, str(tmp_path / "dst"))
        assert _ids(dst.to_df()) == [1, 2, 3]
        # zero parquet files under the clone's directory
        files = [
            f
            for root, _d, names in os.walk(dst.table_path)
            for f in names
            if f.endswith(".parquet")
        ]
        assert files == []

    def test_clone_diverges_from_source_on_write(self, spark, tmp_path):
        src = _mk(spark, str(tmp_path / "src"))
        dst = DeltaTable.clone(spark, src.table_path, str(tmp_path / "dst"))
        dst.append(spark.createDataFrame([(9, "z", 90)], "id long, cat string, val long"))
        assert _ids(dst.to_df()) == [1, 2, 3, 9]
        assert _ids(src.to_df()) == [1, 2, 3]

    def test_clone_vacuum_never_touches_source_files(self, spark, tmp_path):
        src = _mk(spark, str(tmp_path / "src"))
        dst = DeltaTable.clone(spark, src.table_path, str(tmp_path / "dst"))
        # rewrite the clone so the cloned absolute adds become tombstones
        upsert(
            dst,
            spark.createDataFrame([(1, "a", 99)], "id long, cat string, val long"),
            keys=["id"],
        )
        deleted = dst.vacuum()
        assert all(not p.startswith("/") for p in deleted)
        assert _ids(src.to_df()) == [1, 2, 3]  # source intact

    def test_clone_carries_deletion_vectors(self, spark, tmp_path):
        src = _mk(spark, str(tmp_path / "src"))
        delete_where_dv(src, "id = 2")
        dst = DeltaTable.clone(spark, src.table_path, str(tmp_path / "dst"))
        assert _ids(dst.to_df()) == [1, 3]

    def test_clone_of_clone(self, spark, tmp_path):
        src = _mk(spark, str(tmp_path / "src"), partitioned=True)
        c1 = DeltaTable.clone(spark, src.table_path, str(tmp_path / "c1"))
        c2 = DeltaTable.clone(spark, c1.table_path, str(tmp_path / "c2"))
        assert _ids(c2.to_df()) == [1, 2, 3]


class TestRenameColumn:
    def test_rename_is_metadata_only_and_reads_back(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        files_before = sorted(t.input_files())
        t.rename_column("val", "amount")
        assert sorted(t.input_files()) == files_before
        df = t.to_df()
        assert "amount" in df.columns and "val" not in df.columns
        assert sorted(r.amount for r in df.collect()) == [10, 20, 30]

    def test_append_after_rename_keeps_physical_name(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.rename_column("val", "amount")
        t.append(
            spark.createDataFrame([(4, "c", 40)], "id long, cat string, amount long"),
            stat_columns=["id"],
        )
        assert sorted(r.amount for r in t.to_df().collect()) == [10, 20, 30, 40]
        # new file's parquet columns use the ORIGINAL physical name
        import pyarrow.parquet as pq

        newest = max(t.input_files(), key=os.path.getmtime)
        assert "val" in pq.ParquetFile(newest).schema_arrow.names

    def test_old_versions_keep_old_schema(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        v = t.state().version
        t.rename_column("val", "amount")
        assert "val" in t.to_df(version=v).columns

    def test_double_rename(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.rename_column("val", "amount")
        t.rename_column("amount", "price")
        assert sorted(r.price for r in t.to_df().collect()) == [10, 20, 30]

    def test_rename_rejections(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), partitioned=True)
        t.add_check_constraint("pos_val", "val > 0")
        with pytest.raises(ValueError, match="partition"):
            t.rename_column("cat", "category")
        with pytest.raises(ValueError, match="CHECK"):
            t.rename_column("val", "amount")
        with pytest.raises(KeyError):
            t.rename_column("nope", "x")
        with pytest.raises(ValueError, match="exists"):
            t.rename_column("id", "val")

    def test_stats_survive_rename_for_pruning(self, spark, tmp_path):
        """Zone-map upsert pruning still works on the renamed key: files are
        keyed by physical name and the lookup translates."""
        t = _mk(spark, str(tmp_path / "t"))
        t.rename_column("id", "row_id")
        upsert(
            t,
            spark.createDataFrame([(2, "b", 22)], "row_id long, cat string, val long"),
            keys=["row_id"],
        )
        got = {r.row_id: r.val for r in t.to_df().collect()}
        assert got == {1: 10, 2: 22, 3: 30}


class TestTimestampTimeTravel:
    def test_timestamp_resolves_between_commits(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        time.sleep(0.05)
        mid = int(time.time() * 1000)
        time.sleep(0.05)
        t.append(spark.createDataFrame([(4, "d", 40)], "id long, cat string, val long"))
        assert _ids(t.to_df(timestamp=mid)) == [1, 2, 3]
        assert _ids(t.to_df(timestamp=int(time.time() * 1000) + 1000)) == [1, 2, 3, 4]

    def test_timestamp_before_first_commit_raises(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="precedes"):
            t.to_df(timestamp=1)

    def test_version_and_timestamp_exclusive(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="not both"):
            t.to_df(version=0, timestamp=int(time.time() * 1000))

    def test_datetime_and_string_accepted(self, spark, tmp_path):
        import datetime as dt

        t = _mk(spark, str(tmp_path / "t"))
        now = dt.datetime.now() + dt.timedelta(seconds=5)
        assert _ids(t.to_df(timestamp=now)) == [1, 2, 3]
        assert _ids(t.to_df(timestamp=now.strftime("%Y-%m-%d %H:%M:%S"))) == [1, 2, 3]


class TestRenameCompactInterop:
    def test_validate_and_compact_after_rename(self, spark, tmp_path):
        """The sorter itself keeps working on a renamed sort column (the
        validator and scan paths translate logical -> physical)."""
        from delta_sorter_spark.operators.compact import SortConfig, compact_with_sort
        from delta_sorter_spark.operators.validate import validate_global_order

        rows = [(3, "a", 30), (1, "b", 10), (2, "a", 20)]
        t = _mk(spark, str(tmp_path / "t"), rows=rows)
        t.rename_column("id", "row_id")
        rep = validate_global_order(spark, t.table_path, ["row_id"])
        assert rep.boundary_violations >= 1
        compact_with_sort(spark, t.table_path, SortConfig(sort_columns=["row_id"]))
        rep2 = validate_global_order(spark, t.table_path, ["row_id"])
        assert rep2.boundary_violations == 0


class TestAddDropColumn:
    def test_add_column_reads_null_for_old_rows(self, spark, tmp_path):
        path = str(tmp_path / "t")
        DeltaTable.create(
            spark, path, spark.createDataFrame([(1, "a")], "id long, v string")
        )
        t = DeltaTable(spark, path)
        t.add_column("score", "double")
        rows = t.to_df().collect()
        assert rows[0]["score"] is None
        t.append(spark.createDataFrame([(2, "b", 0.5)],
                                       "id long, v string, score double"))
        got = {r["id"]: r["score"] for r in t.to_df().collect()}
        assert got == {1: None, 2: 0.5}

    def test_drop_column_hides_data_without_rewrites(self, spark, tmp_path):
        path = str(tmp_path / "t")
        DeltaTable.create(
            spark, path,
            spark.createDataFrame([(1, "a", 9.0)],
                                  "id long, v string, score double"),
        )
        t = DeltaTable(spark, path)
        files_before = sorted(t.input_files())
        t.drop_column("score")
        assert t.to_df().columns == ["id", "v"]
        assert sorted(t.input_files()) == files_before  # zero data rewrites

    def test_readd_after_drop_never_resurfaces_old_bytes(self, spark, tmp_path):
        path = str(tmp_path / "t")
        DeltaTable.create(
            spark, path,
            spark.createDataFrame([(1, "a", 9.0)],
                                  "id long, v string, score double"),
        )
        t = DeltaTable(spark, path)
        t.drop_column("score")
        t.add_column("score", "double")
        # the old file still physically contains score=9.0, but the re-added
        # column maps to a fresh physical name -> NULL
        assert t.to_df().collect()[0]["score"] is None
        t.append(spark.createDataFrame([(2, "b", 1.5)],
                                       "id long, v string, score double"))
        got = {r["id"]: r["score"] for r in t.to_df().collect()}
        assert got == {1: None, 2: 1.5}

    def test_drop_rejections(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.range(4).select(
            F.col("id"), (F.col("id") % 2).cast("long").alias("p"),
            F.lit(1.0).alias("x"),
        )
        DeltaTable.create(spark, path, df, partition_columns=["p"])
        t = DeltaTable(spark, path)
        with pytest.raises(ValueError, match="partition column"):
            t.drop_column("p")
        t.add_check_constraint("pos_x", "x >= 0")
        with pytest.raises(ValueError, match="CHECK constraint"):
            t.drop_column("x")
        with pytest.raises(KeyError):
            t.drop_column("nope")
        with pytest.raises(ValueError, match="already exists"):
            t.add_column("x", "double")


def test_clone_drops_index_registrations(spark, tmp_path):
    """Bloom/ANN index specs are layout-local (datasets under the SOURCE
    dir, keyed by the source's relative file paths) — a clone must start
    index-less, and building a fresh index on the clone works."""
    import os

    from delta_sorter_spark.operators.ann_index import (
        ann_specs,
        ann_topk,
        build_ann_index,
    )
    from delta_sorter_spark.operators.bloom_index import bloom_specs, build_bloom_index

    DIM = 8
    vec = lambda i: [float(((i * 7 + j * 3) % 13) - 6) / 6.0 for j in range(DIM)]  # noqa: E731
    src_path = os.path.join(str(tmp_path), "src")
    df = spark.createDataFrame(
        [(int(i), f"u{i}", vec(i)) for i in range(20)],
        "vid long, u string, emb array<float>",
    )
    src = DeltaTable.create(spark, src_path, df.coalesce(2))
    build_bloom_index(src, "u")
    build_ann_index(src, "emb", "vid", DIM, m=2, n_codes=4)

    dst = DeltaTable.clone(spark, src_path, os.path.join(str(tmp_path), "dst"))
    assert ann_specs(dst) == {} and bloom_specs(dst) == {}
    q = spark.createDataFrame([(0, vec(0))], "vid long, emb array<float>")
    with pytest.raises(KeyError):
        ann_topk(dst, q, "vid", "emb", "emb", k=3)
    # the clone reads fine and takes its own fresh index
    assert dst.to_df().count() == 20
    info = build_ann_index(dst, "emb", "vid", DIM, m=2, n_codes=4)
    assert info["rows"] == 20
    served = ann_topk(dst, q, "vid", "emb", "emb", k=3)
    assert served.count() == 3
    # source index untouched
    assert "emb" in ann_specs(DeltaTable(spark, src_path))
