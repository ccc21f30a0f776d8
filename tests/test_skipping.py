"""Stats-based file skipping (functions/skipping.py).

Covers three layers:
1. the strict predicate parser (grammar in / garbage out),
2. per-file skip decisions against synthetic zone maps (every decision a
   sound "provably no match" — never skips a file that could match),
3. end-to-end equivalence on a real multi-file Delta table:
   ``to_df(where=p)`` row-for-row equals ``to_df().where(p)`` for a grid of
   predicates (including ones the parser rejects, which must degrade to a
   full scan, not an error), plus effectiveness: a selective range predicate
   on a sorted table actually prunes files.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sorter_spark.functions.skipping import (
    SkippingUnsupported,
    file_may_match,
    parse_predicate,
    prune_adds,
)
from delta_sorter_spark.sources.delta_log import AddAction
from delta_sorter_spark.sources.delta_table import DeltaTable


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def test_parse_comparison_shapes():
    assert parse_predicate("a = 5") == ("cmp", "=", "a", 5)
    assert parse_predicate("a == 5") == ("cmp", "=", "a", 5)
    assert parse_predicate("a <> 5") == ("cmp", "!=", "a", 5)
    # literal-on-left flips the operator
    assert parse_predicate("5 < a") == ("cmp", ">", "a", 5)
    assert parse_predicate("`a b` >= 1.5") == ("cmp", ">=", "a b", 1.5)
    assert parse_predicate("s = 'it''s'") == ("cmp", "=", "s", "it's")
    assert parse_predicate("d = DATE '2020-01-02'") == (
        "cmp", "=", "d", dt.date(2020, 1, 2),
    )


def test_parse_boolean_structure():
    ast = parse_predicate("a = 1 AND (b > 2 OR NOT c <= 3)")
    assert ast == (
        "and",
        ("cmp", "=", "a", 1),
        ("or", ("cmp", ">", "b", 2), ("not", ("cmp", "<=", "c", 3))),
    )


def test_parse_between_in_null():
    assert parse_predicate("a BETWEEN 1 AND 5") == (
        "and", ("cmp", ">=", "a", 1), ("cmp", "<=", "a", 5),
    )
    assert parse_predicate("a NOT BETWEEN 1 AND 5") == (
        "not", ("and", ("cmp", ">=", "a", 1), ("cmp", "<=", "a", 5)),
    )
    assert parse_predicate("a IN (1, 2, 3)") == ("in", "a", [1, 2, 3], False)
    assert parse_predicate("a NOT IN ('x')") == ("in", "a", ["x"], True)
    assert parse_predicate("a IS NULL") == ("null", "a", False)
    assert parse_predicate("a IS NOT NULL") == ("null", "a", True)


def test_parse_like_shapes():
    assert parse_predicate("s LIKE 'ab%'") == ("like", "s", "ab", True)
    # mid-pattern wildcard: positive form still prunes on the prefix, but the
    # node records exact=False so negated evaluation can't use the prefix proof
    assert parse_predicate("s LIKE 'ab%cd'") == ("like", "s", "ab", False)
    assert parse_predicate("s NOT LIKE 'ab%'") == ("not", ("like", "s", "ab", True))
    # shapes where no sound bound exists degrade to may-match
    assert parse_predicate("s LIKE '%x'") == ("maybe",)
    assert parse_predicate("s NOT LIKE 'ab%cd'") == ("maybe",)
    assert parse_predicate("s LIKE 'a\\\\%'") == ("maybe",)  # escapes unmodeled


def test_like_decisions():
    a = _add(mins={"s": "mm"}, maxs={"s": "pp"}, nulls={"s": 0})
    shared = _add(mins={"s": "abc1"}, maxs={"s": "abc9"}, nulls={"s": 0})
    all_null = _add(nulls={"s": 10}, n=10)
    assert not _may(a, "s LIKE 'z%'")
    assert not _may(a, "s LIKE 'a%'")
    assert _may(a, "s LIKE 'n%'")
    assert _may(a, "s LIKE 'm%'")
    assert _may(a, "s LIKE 'p%'")
    assert not _may(all_null, "s LIKE 'a%'")
    assert not _may(all_null, "s NOT LIKE 'a%'")
    # every value shares the prefix -> NOT LIKE can't match
    assert not _may(shared, "s NOT LIKE 'abc%'")
    assert _may(shared, "s NOT LIKE 'abc1%'")
    assert _may(a, "s NOT LIKE 'n%'")
    # LIKE '%' matches every non-null value
    assert not _may(a, "s NOT LIKE '%'")


def test_generated_partition_pruning_unit():
    """Bounds on the SOURCE column of a monotone generated partition
    column imply partition bounds (Delta's generated-column pruning):
    'o_orderdate >= ts' prunes year-partition directories without the
    user restating o_year."""
    from delta_sorter_spark.functions.skipping import (
        augment_with_generated_partitions,
    )

    schema = T.StructType(
        [
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField(
                "o_year", T.StringType(), True,
                metadata={
                    "delta.generationExpression": "CAST(year(o_orderdate) AS STRING)"
                },
            ),
        ]
    )
    ast = parse_predicate(
        "o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    )
    aug = augment_with_generated_partitions(ast, schema, ["o_year"])
    # two derived conjuncts were ANDed on
    flat = repr(aug)
    assert "('cmp', '>=', 'o_year', '1996')" in flat
    assert "('cmp', '<=', 'o_year', '1998')" in flat

    # (the strict '<' bound derives P <= year(1998-01-01) = '1998' — one
    # year conservative, still sound; exactness never depends on pruning)
    # equality derives both bounds
    ast_eq = parse_predicate("o_orderdate = TIMESTAMP '1997-06-15 12:00:00'")
    flat_eq = repr(augment_with_generated_partitions(ast_eq, schema, ["o_year"]))
    assert "('cmp', '>=', 'o_year', '1997')" in flat_eq
    assert "('cmp', '<=', 'o_year', '1997')" in flat_eq
    # OR-guarded bounds derive nothing (not mandatory)
    ast_or = parse_predicate(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' OR o_orderdate IS NULL"
    )
    assert augment_with_generated_partitions(ast_or, schema, ["o_year"]) == ast_or


def test_generated_partition_pruning_end_to_end(spark, tmp_path):
    """File-level: a date-range predicate on the raw timestamp schedules
    only the generated-year partitions it can touch, and results match an
    unpruned read exactly."""
    from delta_sorter_spark.functions.skipping import prune_adds
    from delta_sorter_spark.sources.delta_table import DeltaTable

    df = spark.createDataFrame(
        [
            (i, __import__("datetime").datetime(1995 + (i % 4), 1 + (i % 12), 5))
            for i in range(40)
        ],
        "id long, ts timestamp",
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "genp"), df,
        partition_columns=["y"],
        generated_columns={"y": ("string", "CAST(year(ts) AS STRING)")},
    )
    state = tbl.state()
    years_all = {a.partition_values["y"] for a in state.adds}
    assert years_all == {"1995", "1996", "1997", "1998"}
    pred = "ts >= TIMESTAMP '1997-01-01 00:00:00'"
    kept = prune_adds(
        state.adds, pred, state.metadata.schema,
        state.metadata.partition_columns,
    )
    assert {a.partition_values["y"] for a in kept} == {"1997", "1998"}
    # exactness: pruned read == full read under the predicate
    got = sorted(
        r["id"] for r in tbl.to_df(where=pred).collect()
    )
    want = sorted(r["id"] for r in tbl.to_df().where(pred).collect())
    assert got == want and got


def test_not_over_inexact_like_never_prunes():
    """NOT over a lossy prefix approximation must stay may-match.

    LIKE 'ab%cd' parses to the over-approximate prefix 'ab'; an outer NOT
    (directly, or via De Morgan inside NOT(... OR ...)) must NOT apply the
    shared-prefix proof: values sharing 'ab' can still fail '...cd', making
    NOT LIKE TRUE inside prefix-sharing bounds."""
    shared = _add(mins={"s": "abxx"}, maxs={"s": "abyy"}, nulls={"s": 0})
    assert _may(shared, "NOT (s LIKE 'ab%cd')")
    assert _may(shared, "NOT (s LIKE 'ab%cd' OR s LIKE 'zz%qq')")
    # the pure-prefix proof still prunes through an outer NOT
    assert not _may(shared, "NOT (s LIKE 'ab%')")
    # and un-parenthesized NOT LIKE on the lossy shape stays may-match
    assert _may(shared, "s NOT LIKE 'ab%cd'")


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "a +",
        "f(a) = 1",          # function calls unsupported
        "a = 1 AND",
        "a LIKE 5",          # LIKE needs a string pattern
        "a IN (b)",          # non-literal IN list
        "CASE WHEN a THEN 1 END = 1",
    ],
)
def test_parse_rejects_unsupported(bad):
    with pytest.raises(SkippingUnsupported):
        parse_predicate(bad)


# ---------------------------------------------------------------------------
# Skip decisions against synthetic zone maps
# ---------------------------------------------------------------------------

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("p", T.StringType()),
    ]
)


def _add(mins=None, maxs=None, nulls=None, n=10, part=None):
    stats = {"numRecords": n, "minValues": mins or {}, "maxValues": maxs or {},
             "nullCount": nulls or {}}
    return AddAction(
        path="f.parquet", size=1, partition_values=part or {},
        modification_time=0, data_change=True, stats=stats,
    )


def _may(add, pred, part_cols=()):
    return file_may_match(add, parse_predicate(pred), _SCHEMA, list(part_cols))


def test_range_decisions():
    a = _add(mins={"k": 100, "s": "m"}, maxs={"k": 200, "s": "p"},
             nulls={"k": 0, "s": 0})
    assert not _may(a, "k < 100")
    assert _may(a, "k <= 100")
    assert not _may(a, "k > 200")
    assert _may(a, "k >= 200")
    assert not _may(a, "k = 99")
    assert _may(a, "k = 150")
    assert not _may(a, "k BETWEEN 300 AND 400")
    assert _may(a, "k BETWEEN 150 AND 400")
    assert not _may(a, "301 <= k AND k <= 400")
    assert not _may(a, "s = 'z'")
    assert _may(a, "s = 'n'")


def test_boolean_composition_decisions():
    a = _add(mins={"k": 100}, maxs={"k": 200}, nulls={"k": 0})
    assert not _may(a, "k < 50 OR k > 500")
    assert _may(a, "k < 50 OR k > 150")
    # conjuncts are checked against the FILE's bounds independently (the
    # standard zone-map shape — sound, not complete): a self-contradictory
    # predicate still scans and just matches zero rows
    assert _may(a, "k > 150 AND k < 120")
    assert not _may(a, "k > 250 AND k < 120")  # each conjunct disjoint
    assert _may(a, "NOT k < 50")
    assert not _may(a, "NOT k >= 50")
    # NOT over OR (De Morgan): NOT(k<500 OR k>50) can match no row here
    assert not _may(a, "NOT (k < 500 OR k > 50)")


def test_null_semantics_decisions():
    no_nulls = _add(mins={"k": 1}, maxs={"k": 2}, nulls={"k": 0})
    some_nulls = _add(mins={"k": 1}, maxs={"k": 2}, nulls={"k": 3})
    all_null = _add(nulls={"k": 10}, n=10)
    assert not _may(no_nulls, "k IS NULL")
    assert _may(some_nulls, "k IS NULL")
    assert _may(some_nulls, "k IS NOT NULL")
    assert not _may(all_null, "k IS NOT NULL")
    # comparisons never match an all-null column
    assert not _may(all_null, "k = 1")
    assert not _may(all_null, "k != 1")
    # col <op> NULL is NULL for every row
    assert not _may(no_nulls, "k = NULL")


def test_in_and_point_collapse_decisions():
    a = _add(mins={"k": 100}, maxs={"k": 200}, nulls={"k": 0})
    point = _add(mins={"k": 7}, maxs={"k": 7}, nulls={"k": 0})
    assert not _may(a, "k IN (1, 2, 300)")
    assert _may(a, "k IN (1, 150)")
    assert not _may(point, "k != 7")
    assert _may(point, "k != 8")
    assert not _may(point, "k NOT IN (6, 7)")
    assert _may(point, "k NOT IN (6, 8)")
    # NOT IN with a NULL literal matches no row anywhere in SQL
    assert not _may(a, "k NOT IN (1, NULL)")
    assert not _may(a, "k IN (NULL)")


def test_missing_stats_and_unknown_columns_are_conservative():
    bare = _add()  # no per-column stats at all
    assert _may(bare, "k = 5")
    assert _may(bare, "k IS NULL")
    assert _may(bare, "nosuchcol = 5")  # unknown column -> scan
    # un-coercible literal (string vs long column) -> scan
    assert _may(_add(mins={"k": 1}, maxs={"k": 2}, nulls={"k": 0}), "k = 'x'")


def test_partition_value_decisions():
    a = _add(part={"p": "eu"}, n=5)
    null_part = _add(part={"p": None}, n=5)
    assert not _may(a, "p = 'us'", part_cols=["p"])
    assert _may(a, "p = 'eu'", part_cols=["p"])
    assert not _may(a, "p IS NULL", part_cols=["p"])
    assert not _may(null_part, "p = 'eu'", part_cols=["p"])
    assert _may(null_part, "p IS NULL", part_cols=["p"])
    assert not _may(null_part, "p IS NOT NULL", part_cols=["p"])


def test_date_decisions():
    a = _add(mins={"d": "2020-01-01"}, maxs={"d": "2020-06-30"}, nulls={"d": 0})
    assert not _may(a, "d > DATE '2020-06-30'")
    assert _may(a, "d >= DATE '2020-06-30'")
    # bare ISO string coerces to the DATE column type
    assert not _may(a, "d < '2020-01-01'")


def test_prune_adds_unparseable_returns_all():
    adds = [_add(mins={"k": 0}, maxs={"k": 1}, nulls={"k": 0}) for _ in range(3)]
    assert prune_adds(adds, "substr(s, 1, 2) = 'ab'", _SCHEMA, []) == adds
    assert prune_adds(adds, None, _SCHEMA, []) == adds
    assert prune_adds(adds, "k > 100", _SCHEMA, []) == []


# ---------------------------------------------------------------------------
# End-to-end on a real Delta table
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skip_table(spark, tmp_path_factory):
    """Partitioned multi-file table with known per-file key ranges."""
    path = str(tmp_path_factory.mktemp("skiptbl") / "t")
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                f"s{i:04d}",
                dt.date(2020, 1, 1) + dt.timedelta(days=i % 90),
                "eu" if i % 2 == 0 else "us",
                None if i % 10 == 0 else i * 1.5,
            )
        )
    df = spark.createDataFrame(
        rows, "k long, s string, d date, region string, v double"
    )
    # 8 range-clustered files per partition (what compact produces); stats
    # are collected for the columns we index (stage_write collects zone-map
    # stats for the caller's stat_columns — compact passes its sort keys)
    tbl = DeltaTable.create(
        spark,
        path,
        df.repartitionByRange(8, "k").sortWithinPartitions("k"),
        partition_columns=["region"],
        stat_columns=["k", "s", "d", "v"],
    )
    return tbl


PREDICATES = [
    "k BETWEEN 40 AND 60",
    "k = 123",
    "k < 0",
    "k >= 395",
    "k IN (3, 7, 399)",
    "k NOT IN (3, 7)",
    "NOT k BETWEEN 10 AND 390",
    "v IS NULL",
    "v IS NOT NULL AND k < 25",
    "region = 'eu' AND k > 380",
    "region IS NOT NULL",
    "d < DATE '2020-01-10' AND k <= 200",
    "s = 's0042'",
    "k > 100 OR s < 's0005'",
    # outside the grammar -> must silently fall back to a full scan
    "k % 7 = 0",
    "substr(s, 2, 2) = '00'",
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_where_equals_full_scan_filter(skip_table, pred):
    got = sorted(
        tuple(r) for r in skip_table.to_df(where=pred).collect()
    )
    want = sorted(
        tuple(r) for r in skip_table.to_df().where(pred).collect()
    )
    assert got == want


def test_skipping_actually_prunes(skip_table):
    state = skip_table.state()
    meta = state.metadata
    kept = prune_adds(
        state.adds, "k BETWEEN 40 AND 60", meta.schema, meta.partition_columns
    )
    assert 0 < len(kept) < len(state.adds) / 2
    # partition predicate prunes to one side
    kept_eu = prune_adds(
        state.adds, "region = 'eu'", meta.schema, meta.partition_columns
    )
    assert 0 < len(kept_eu) < len(state.adds)
    assert all(a.partition_values.get("region") == "eu" for a in kept_eu)
    # point lookup on the clustered key touches a single file per partition
    kept_pt = prune_adds(
        state.adds, "k = 123", meta.schema, meta.partition_columns
    )
    assert len(kept_pt) <= 2


def test_dml_uses_skipping(skip_table, spark, tmp_path, monkeypatch):
    """delete_where on a clustered predicate scans only surviving files."""
    import delta_sorter_spark.operators.dml as dml

    path = str(tmp_path / "t2")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl = DeltaTable.create(
        spark, path, df.repartitionByRange(10, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    before = len(tbl.state().adds)
    assert before == 10

    seen = {}
    orig = dml._predicate_hit_paths

    def spy(table, state, predicate):
        from delta_sorter_spark.functions.skipping import prune_adds as pa

        seen["pruned"] = len(
            pa(state.adds, predicate, state.metadata.schema,
               state.metadata.partition_columns)
        )
        return orig(table, state, predicate)

    monkeypatch.setattr(dml, "_predicate_hit_paths", spy)
    res = dml.delete_where(tbl, "k BETWEEN 100 AND 150")
    assert res["deleted_rows"] == 51
    assert seen["pruned"] <= 2  # 1000 rows / 10 range files -> 1-2 files
    assert tbl.to_df().count() == 949


def test_delete_where_dv_prunes_but_stays_exact(spark, tmp_path):
    from delta_sorter_spark.operators.dml import delete_where_dv

    path = str(tmp_path / "t3")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    tbl = DeltaTable.create(
        spark, path, df.repartitionByRange(5, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    res = delete_where_dv(tbl, "k IN (10, 490)")
    assert res["deleted_rows"] == 2
    assert res["dv_files"] == 2  # one vector per touched range file
    assert tbl.to_df().count() == 498
    # predicate provably matching nothing: no scan, no commit
    v = tbl.state().version
    res2 = delete_where_dv(tbl, "k > 10000")
    assert res2 == {"dv_files": 0, "deleted_rows": 0, "version": v}


def test_merge_dv_zone_map_prune(spark, tmp_path):
    """merge_dv restricts its scans to source-key-range candidates; a
    pure-insert batch (all keys beyond the zone maps) scans nothing and
    still commits the inserts atomically."""
    from delta_sorter_spark.operators.dml import merge_dv

    path = str(tmp_path / "t5")
    df = spark.range(0, 600).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    tbl = DeltaTable.create(
        spark, path, df.repartitionByRange(6, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    # update batch confined to one key range: only that file gets a vector
    src = spark.createDataFrame([(10, 99), (20, 98)], "k long, v long")
    res = merge_dv(tbl, src, ["k"], when_matched_update={"v": "s.v"})
    assert res["dv_files"] == 1
    assert res["dv_marked_rows"] == 2
    got = {r["k"]: r["v"] for r in tbl.to_df().where("k in (10, 20)").collect()}
    assert got == {10: 99, 20: 98}
    # pure-insert batch, keys beyond every file's max
    src2 = spark.createDataFrame([(9001, 1), (9002, 2)], "k long, v long")
    res2 = merge_dv(tbl, src2, ["k"], when_matched_update={"v": "s.v"},
                    when_not_matched_insert=True)
    assert res2["dv_files"] == 0
    assert res2["appended_rows"] == 2
    assert tbl.to_df().count() == 602


# ---------------------------------------------------------------------------
# Z-order x skipping synergy: multi-dimensional pruning
# ---------------------------------------------------------------------------


def test_zorder_enables_multidim_skipping(spark, tmp_path):
    """The payoff z-order exists for: after clustering on (x, y), a range
    predicate on EITHER dimension prunes most files — a lexicographic sort
    only serves its leading column.  25 files over a 64x64 grid: a 1/8-wide
    band on x or on y must each skip most files, and results stay exact."""
    from delta_sorter_spark.api import compact

    path = str(tmp_path / "zt")
    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    DeltaTable.create(spark, path, df.repartition(8))
    compact(path, [], zorder_columns=["x", "y"], spark=spark)
    tbl = DeltaTable(spark, path)
    state = tbl.state()
    total = len([a for a in state.adds if (a.stats or {}).get("numRecords")])
    assert total >= 4

    for pred in ("x BETWEEN 0 AND 7", "y BETWEEN 0 AND 7"):
        kept = prune_adds(
            state.adds, pred, state.metadata.schema, state.metadata.partition_columns
        )
        assert len(kept) < total, pred  # both dimensions prune
        got = sorted(r["payload"] for r in tbl.to_df(where=pred).collect())
        want = sorted(r["payload"] for r in tbl.to_df().where(pred).collect())
        assert got == want


# ---------------------------------------------------------------------------
# Persistent stat columns (delta.dataSkippingStatsColumns)
# ---------------------------------------------------------------------------


def test_dml_rewrites_keep_zone_maps(spark, tmp_path):
    """create(stat_columns=...) persists the stat set as table config, so a
    copy-on-write UPDATE's rewritten files keep their zone maps and skipping
    still prunes afterwards."""
    from delta_sorter_spark.operators.dml import update_where

    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    assert tbl.stats_columns() == ["k"]
    update_where(tbl, "k BETWEEN 110 AND 120", {"v": "v + 100"})
    state = tbl.state()
    # every active file (original AND rewritten) still carries k stats
    assert all("k" in (a.stats or {}).get("minValues", {}) for a in state.adds)
    kept = prune_adds(state.adds, "k = 115", state.metadata.schema, [])
    assert len(kept) == 1
    assert tbl.stats_min_max("k") == (0, 399)


def test_stat_columns_follow_rename_and_drop(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, v long"
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "t"), df, stat_columns=["k", "v"]
    )
    tbl.rename_column("k", "key")
    assert tbl.stats_columns() == ["key", "v"]
    # appends after the rename keep writing stats under the physical name,
    # so skipping on the NEW logical name still works across old+new files
    tbl.append(spark.createDataFrame([(9, "z", 90)], "key long, s string, v long"))
    state = tbl.state()
    kept = prune_adds(state.adds, "key = 9", state.metadata.schema, [])
    assert len(kept) == 1
    tbl.drop_column("v")
    assert tbl.stats_columns() == ["key"]


# ---------------------------------------------------------------------------
# Metadata-only aggregates (stats_count / stats_min_max)
# ---------------------------------------------------------------------------


@pytest.fixture()
def agg_table(spark, tmp_path):
    rows = [
        (i, f"s{i:03d}", None if i % 5 == 0 else i * 10, "eu" if i < 50 else "us")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k long, s string, v long, region string")
    return DeltaTable.create(
        spark, str(tmp_path / "agg"),
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        partition_columns=["region"],
        stat_columns=["k", "s", "v"],
    )


def test_stats_count_exact_and_dv_aware(agg_table):
    from delta_sorter_spark.operators.dml import delete_where_dv

    assert agg_table.stats_count() == 100
    v0 = agg_table.log.latest_version()
    delete_where_dv(agg_table, "k IN (3, 14, 15)")
    assert agg_table.stats_count() == 97
    assert agg_table.stats_count() == agg_table.to_df().count()
    # time travel: the pre-delete snapshot still answers from its stats
    assert agg_table.stats_count(version=v0) == 100


def test_stats_count_missing_stats_returns_none(agg_table):
    from unittest import mock

    state = agg_table.state()
    state.adds[0].stats = None
    with mock.patch.object(agg_table, "state", return_value=state):
        assert agg_table.stats_count() is None


def test_stats_min_max_exactness_rules(agg_table):
    from delta_sorter_spark.operators.dml import delete_where_dv

    assert agg_table.stats_min_max("k") == (0, 99)
    # null-bearing column: nulls are ignored, extremes exact
    assert agg_table.stats_min_max("v") == (10, 990)
    # strings need the owner's opt-in (protocol allows truncated bounds)
    assert agg_table.stats_min_max("s") is None
    assert agg_table.stats_min_max("s", trust_string_stats=True) == (
        "s000", "s099",
    )
    # partition column folds the typed partition values
    assert agg_table.stats_min_max("region", trust_string_stats=True) == (
        "eu", "us",
    )
    with pytest.raises(ValueError):
        agg_table.stats_min_max("nope")
    # a DV'd file may have lost its extremum -> refuse the fast answer...
    v0 = agg_table.log.latest_version()
    delete_where_dv(agg_table, "k = 99")
    assert agg_table.stats_min_max("k") is None
    # ...but the pre-delete version still serves it
    assert agg_table.stats_min_max("k", version=v0) == (0, 99)


def test_stats_min_max_all_null_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v string"
    )
    tbl = DeltaTable.create(
        spark, str(tmp_path / "an"), df, stat_columns=["k", "v"]
    )
    assert tbl.stats_min_max("v", trust_string_stats=True) == (None, None)


# ---------------------------------------------------------------------------
# Property: a file DuckDB finds matching rows in is NEVER skipped
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ints = st.integers(min_value=-5, max_value=5)
_strs = st.sampled_from(["a", "b", "c", "it's"])
_rows = st.lists(
    st.tuples(st.one_of(st.none(), _ints), st.one_of(st.none(), _strs)),
    min_size=0, max_size=8,
)


def _leaf():
    int_lit = _ints.map(str)
    str_lit = _strs.map(lambda s: "'" + s.replace("'", "''") + "'")
    return st.one_of(
        st.tuples(st.just("k"), st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
                  int_lit).map(lambda t: f"k {t[1]} {t[2]}"),
        st.tuples(st.just("s"), st.sampled_from(["=", "!=", "<", ">"]),
                  str_lit).map(lambda t: f"s {t[1]} {t[2]}"),
        st.tuples(_ints, _ints).map(lambda t: f"k BETWEEN {min(t)} AND {max(t)}"),
        st.lists(int_lit, min_size=1, max_size=3).map(
            lambda v: f"k IN ({', '.join(v)})"
        ),
        st.lists(st.one_of(int_lit, st.just("NULL")), min_size=1, max_size=3).map(
            lambda v: f"k NOT IN ({', '.join(v)})"
        ),
        st.sampled_from(["k IS NULL", "k IS NOT NULL", "s IS NULL"]),
        st.sampled_from([
            "s LIKE 'a%'", "s LIKE 'b%'", "s LIKE 'it%'", "s LIKE '%t''s'",
            "s NOT LIKE 'a%'", "s NOT LIKE 'it%'", "s NOT LIKE 'b%c'",
        ]),
    )


_preds = st.recursive(
    _leaf(),
    lambda kids: st.one_of(
        st.tuples(kids, kids).map(lambda t: f"({t[0]}) AND ({t[1]})"),
        st.tuples(kids, kids).map(lambda t: f"({t[0]}) OR ({t[1]})"),
        kids.map(lambda p: f"NOT ({p})"),
    ),
    max_leaves=4,
)


@settings(max_examples=300, deadline=None)
@given(rows=_rows, pred=_preds)
def test_property_never_skips_a_matching_file(rows, pred):
    """Soundness oracle: build one file's exact zone map from the rows, ask
    DuckDB whether any row matches the predicate; if so, file_may_match must
    keep the file.  (The converse — skipping aggressiveness — is a quality
    property, not a correctness one.)"""
    import duckdb

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    ks = [r[0] for r in rows if r[0] is not None]
    ss = [r[1] for r in rows if r[1] is not None]
    stats = {
        "numRecords": len(rows),
        "minValues": ({"k": min(ks)} if ks else {}) | ({"s": min(ss)} if ss else {}),
        "maxValues": ({"k": max(ks)} if ks else {}) | ({"s": max(ss)} if ss else {}),
        "nullCount": {
            "k": sum(1 for r in rows if r[0] is None),
            "s": sum(1 for r in rows if r[1] is None),
        },
    }
    add = AddAction(path="f.parquet", size=1, partition_values={},
                    modification_time=0, data_change=True, stats=stats)
    con = duckdb.connect()
    # duckdb's optimizer hits an internal assertion on some NOT(x OR x)
    # shapes over empty tables; the oracle is a count over <=8 rows, so run
    # it unoptimized
    con.execute("PRAGMA disable_optimizer")
    con.execute("CREATE TABLE t (k BIGINT, s VARCHAR)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    n_match = con.execute(f"SELECT count(*) FROM t WHERE {pred}").fetchone()[0]
    con.close()
    if n_match > 0:
        assert file_may_match(add, parse_predicate(pred), schema, [])


def test_skipping_survives_checkpoint(spark, tmp_path):
    """Stats round-trip through a parquet log checkpoint: a reopened table
    whose state replays from the checkpoint still prunes files."""
    path = str(tmp_path / "ckpt")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    )
    tbl = DeltaTable.create(
        spark, path, df.repartitionByRange(6, "k").sortWithinPartitions("k"),
        stat_columns=["k"],
    )
    tbl.log.write_checkpoint()
    fresh = DeltaTable(spark, path)
    state = fresh.state()
    kept = prune_adds(
        state.adds, "k BETWEEN 100 AND 120", state.metadata.schema,
        state.metadata.partition_columns,
    )
    assert len(kept) == 1
    assert fresh.stats_count() == 300
    assert fresh.stats_min_max("k") == (0, 299)
    assert fresh.stats_columns() == ["k"]  # configuration survives too
    got = sorted(r["k"] for r in fresh.to_df(where="k IN (5, 250)").collect())
    assert got == [5, 250]


def test_files_matching_equals_pruned_read(skip_table):
    state = skip_table.state()
    pred = "k BETWEEN 40 AND 60"
    kept = skip_table.files_matching(pred)
    assert kept == prune_adds(
        state.adds, pred, state.metadata.schema, state.metadata.partition_columns
    )
    via_subset = sorted(
        tuple(r) for r in skip_table.to_df(adds=kept).where(pred).collect()
    )
    via_where = sorted(
        tuple(r) for r in skip_table.to_df(where=pred).collect()
    )
    assert via_subset == via_where


def test_num_indexed_cols_property(spark, tmp_path):
    """delta.dataSkippingNumIndexedCols: with no explicit stat-column
    list, the first N orderable columns get zone maps on every write."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "nidx")
    df = spark.range(50).select(
        F.col("id").alias("a"),
        (F.col("id") * 2).alias("b"),
        F.concat(F.lit("x"), F.col("id")).alias("c"),
    )
    tbl = DeltaTable.create(spark, path, df.coalesce(1))
    assert not (tbl.state().adds[0].stats or {}).get("minValues")
    tbl.set_table_properties({"delta.dataSkippingNumIndexedCols": "2"})
    tbl.append(df.coalesce(1))
    fresh = [a for a in tbl.state().adds if (a.stats or {}).get("minValues")]
    assert len(fresh) == 1
    assert sorted(fresh[0].stats["minValues"]) == ["a", "b"]  # first 2 only
