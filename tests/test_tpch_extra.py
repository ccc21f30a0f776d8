"""Semantic checks for the Q2/Q11-Q21 adapted shapes beyond the hash-parity
gate (tests/test_oracle_parity.py covers value equality; these pin the
*decorrelation* equivalences the plans rely on)."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.plans import tpch_extra
from delta_sorter_spark.sources.formats import register_tables
from delta_sorter_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_a30_decorrelation_matches_exists_formulation(spark):
    """The per-order aggregate (n_supp >= 2 AND n_late == 1) must be
    row-identical to the textbook correlated EXISTS / NOT EXISTS pair."""
    register_tables(spark, SF_DIR)
    naive = spark.sql(
        f"""
        SELECT s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
              FROM lineitem l1
              JOIN orders o ON o.o_orderkey = l1.l_orderkey
              WHERE o.o_orderstatus = 'F'
                AND l1.l_shipdate > o.o_orderdate
                                    + INTERVAL {tpch_extra.WAIT_DAYS} DAYS
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey
                                  AND l3.l_shipdate > o.o_orderdate
                                      + INTERVAL {tpch_extra.WAIT_DAYS} DAYS))
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        """
    )
    ours = tpch_extra.q_a30_waiting_suppliers(spark, SF_DIR)
    assert _rows(ours, "s_name", "numwait") == _rows(naive, "s_name", "numwait")


def test_a25_threshold_is_complete(spark):
    """Every part NOT returned must genuinely fall below the 1/2000 cut
    (no rounding gap: the compare is exact DECIMAL, division-free)."""
    out = tpch_extra.q_a25_important_stock(spark, SF_DIR)
    kept = {r.l_partkey for r in out.select("l_partkey").collect()}

    li = load_table(spark, SF_DIR, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    pp = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("value")
    )
    total = pp.agg(F.sum("value")).collect()[0][0]
    for r in pp.collect():
        assert (r.l_partkey in kept) == (
            r.value * tpch_extra.IMPORTANT_STOCK_FRACTION_DEN > total
        )


def test_a31_winners_are_regional_minima(spark):
    """Each returned (part, supplier) pair must price at its part's min,
    and every qualifying part must appear at least once."""
    out = tpch_extra.q_a31_min_cost_supplier(spark, SF_DIR).collect()
    assert out, "expected at least one qualifying part at sf0.001"
    by_part = {}
    for r in out:
        by_part.setdefault(r.p_partkey, set()).add(r.min_price)
    for prices in by_part.values():
        assert len(prices) == 1, "tied winners must share the exact min price"


def test_a34_anti_join_matches_not_in(spark):
    """The broadcast LEFT ANTI must equal the textbook NOT IN subquery
    (safe here: s_suppkey is never NULL, so NOT IN has no three-valued
    surprise)."""
    register_tables(spark, SF_DIR)
    sizes = ", ".join(str(s) for s in tpch_extra.SUPPCNT_SIZES)
    naive = spark.sql(
        f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{tpch_extra.SUPPCNT_EXCL_BRAND}'
          AND p_type NOT LIKE '{tpch_extra.SUPPCNT_EXCL_TYPE_PREFIX}'
          AND p_size IN ({sizes})
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )
    ours = tpch_extra.q_a34_supplier_cnt(spark, SF_DIR)
    cols = ("p_brand", "p_type", "p_size", "supplier_cnt")
    assert _rows(ours, *cols) == _rows(naive, *cols)


def test_a35_decorrelation_matches_correlated_form(spark):
    """The single conditional-aggregation pass must equal the textbook
    Q20 nesting: correlated scalar subqueries computing total vs in-year
    quantity per (part, supplier) pair."""
    register_tables(spark, SF_DIR)
    m = tpch_extra.PROMO_EXCESS_MULTIPLIER
    in_year = (
        f"l.l_shipdate >= TIMESTAMP '{tpch_extra.PROMO_YEAR_LO}' "
        f"AND l.l_shipdate < TIMESTAMP '{tpch_extra.PROMO_YEAR_HI}'"
    )
    naive = spark.sql(
        f"""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT ps.l_suppkey
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE
                                      '{tpch_extra.PROMO_NAME_PREFIX}')) ps
          WHERE (SELECT coalesce(sum(CAST(l_quantity AS DECIMAL(18,2))), 0)
                 FROM lineitem l
                 WHERE l.l_partkey = ps.l_partkey
                   AND l.l_suppkey = ps.l_suppkey AND {in_year}) > 0
            AND (SELECT sum(CAST(l_quantity AS DECIMAL(18,2)))
                 FROM lineitem l
                 WHERE l.l_partkey = ps.l_partkey
                   AND l.l_suppkey = ps.l_suppkey)
                > {m} * (SELECT coalesce(sum(CAST(l_quantity
                                              AS DECIMAL(18,2))), 0)
                         FROM lineitem l
                         WHERE l.l_partkey = ps.l_partkey
                           AND l.l_suppkey = ps.l_suppkey AND {in_year})
        )
        """
    )
    ours = tpch_extra.q_a35_part_promotion(spark, SF_DIR)
    assert _rows(ours, "s_suppkey", "s_name") == _rows(
        naive, "s_suppkey", "s_name"
    )


@pytest.mark.parametrize("name", sorted(tpch_extra.QUERIES))
def test_plans_stay_jvm_side(spark, name):
    """No Python eval nodes and no cartesian products in any adapted shape
    (a25/a27's one-row threshold broadcasts are BroadcastNestedLoop joins
    of a single aggregate row — allowed; true CartesianProduct is not)."""
    df = tpch_extra.QUERIES[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
