"""Cross-engine interop: a STOCK delta-rs reader (``deltalake``, the
reference's own table layer — crates/sorter-core/Cargo.toml:15 pins
``deltalake 0.28``) opens tables written by this engine and reads identical
rows.

The sandbox this repo is built in has no ``deltalake`` wheel and package
installs are disabled, so the whole module auto-skips via ``importorskip``;
in any deployment with ``pip install deltalake`` it runs as-is and becomes
the interop gate for (a) compacted tables, (b) deletion-vector'd tables
after the 3/7 protocol upgrade, and (c) checkpointed tables.  The formats
themselves are byte-pinned against the published protocol in
tests/test_roaring.py and tests/test_delta_table.py regardless.
"""

from __future__ import annotations

import pytest

deltalake = pytest.importorskip("deltalake")

from delta_sorter_spark.sources.delta_table import DeltaTable  # noqa: E402


def _stock_rows(path: str) -> list[tuple]:
    dt = deltalake.DeltaTable(path)
    tbl = dt.to_pyarrow_table()
    cols = sorted(tbl.column_names)
    rows = zip(*(tbl.column(c).to_pylist() for c in cols))
    return sorted(rows)


def _engine_rows(spark, path: str) -> list[tuple]:
    df = DeltaTable(spark, path).to_df()
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stock_reader_compacted_table(spark, tmp_path):
    from delta_sorter_spark.api import compact

    path = str(tmp_path / "interop_compact")
    df = spark.createDataFrame(
        [(i % 7, f"v{i}", i) for i in range(500)], "k long, s string, v long"
    )
    DeltaTable.create(spark, path, df.repartition(4))
    compact(path, ["k", "v"], spark=spark)
    assert _stock_rows(path) == _engine_rows(spark, path)


def test_stock_reader_dv_table(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "interop_dv")
    DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, s string").coalesce(2),
        stat_columns=["id"],
    )
    delete_where_dv(table=DeltaTable(spark, path), predicate="id % 10 = 3")
    # stock reader must apply the roaring vectors (protocol 3/7 upgrade)
    assert _stock_rows(path) == _engine_rows(spark, path)
    ids = [r[0] for r in _stock_rows(path)]
    assert all(i % 10 != 3 for i in ids) and len(ids) == 90


def test_stock_reader_checkpointed_table(spark, tmp_path):
    path = str(tmp_path / "interop_ckpt")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(i,) for i in range(50)], "id long")
    )
    for j in range(3):
        t.append(spark.createDataFrame([(100 + j,)], "id long"))
    t.log.write_checkpoint()
    t.append(spark.createDataFrame([(999,)], "id long"))
    assert _stock_rows(path) == _engine_rows(spark, path)
