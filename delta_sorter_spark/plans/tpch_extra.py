"""TPC-H query shapes Q2/Q6/Q10/Q11/Q12/Q13/Q15/Q16/Q18/Q19/Q20/Q21 adapted to the driver
tables (TESTDATA.md has no partsupp — lineitem's (l_partkey, l_suppkey)
pairs serve as the supply relation; reference has no joins at all, see
SURVEY.md §2.9, so these are north-star E6 coverage).

Every query keeps money math in DECIMAL (exact, engine-independent) and
casts ONCE to DOUBLE at the end; thresholds are division-free integer
multiplies so Spark and DuckDB compare identical rationals
(see __spark_entry__ module docstring for the full determinism rules).

100 TB posture notes per query are in the docstrings: which side
broadcasts, which aggregation is map-side partial, and where AQE picks
the strategy instead of a hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sorter_spark.sources.tables import load_table


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# A24 — Q13 shape: customer distribution of non-urgent order counts.
# Left outer join with a compound join condition (equi key + residual
# filter on the right side), double aggregation.
# ---------------------------------------------------------------------------


def q_a24_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join keeps zero-order customers (count=0 bucket).  At 100 TB
    both sides are big: plain shuffled left-outer on the equi key; the
    residual priority filter is evaluated in the join, never forcing NLJ."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


A24_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# A25 — Q11 shape: parts whose total supply value exceeds 1/2000 of the
# grand total.  Scalar aggregate compared division-free:
# part_value * 2000 > grand_total  (all DECIMAL, exact).
# ---------------------------------------------------------------------------

IMPORTANT_STOCK_FRACTION_DEN = 2000


def q_a25_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-part aggregate is one shuffle with map-side partials; the
    grand total re-aggregates the small per-part result (not the base
    table) and broadcasts one row — no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("grand_total"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") * IMPORTANT_STOCK_FRACTION_DEN > F.col("grand_total"))
        .select("l_partkey", F.col("value").cast("double").alias("supply_value"))
    )


A25_SQL = f"""
WITH pp AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS value
  FROM lineitem GROUP BY l_partkey
), t AS (SELECT sum(value) AS grand_total FROM pp)
SELECT l_partkey, CAST(value AS DOUBLE) AS supply_value
FROM pp, t
WHERE value * {IMPORTANT_STOCK_FRACTION_DEN} > grand_total
"""


# ---------------------------------------------------------------------------
# A26 — Q12 shape: per return-flag (stand-in for shipmode) counts of
# high- vs low-priority orders among 1997 shipments.  Conditional
# aggregation (sum of CASE) — one join, one shuffle.
# ---------------------------------------------------------------------------

SHIPMODE_YEAR_LO = "1997-01-01 00:00:00"
SHIPMODE_YEAR_HI = "1998-01-01 00:00:00"


def q_a26_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on l_shipdate is pushed to the parquet scan (min/max row-group
    pruning at scale); the join then feeds a two-column conditional agg."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(SHIPMODE_YEAR_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(SHIPMODE_YEAR_HI).cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


A26_SQL = f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{SHIPMODE_YEAR_LO}'
  AND l.l_shipdate <  TIMESTAMP '{SHIPMODE_YEAR_HI}'
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A27 — Q15 shape: top supplier(s) by revenue in 1996Q1.  The max is a
# one-row aggregate of the (already small) per-supplier rollup,
# broadcast back; DECIMAL equality picks ties exactly.
# ---------------------------------------------------------------------------

TOP_SUPP_LO = "1996-01-01 00:00:00"
TOP_SUPP_HI = "1996-04-01 00:00:00"


def q_a27_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(TOP_SUPP_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(TOP_SUPP_HI).cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


A27_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_LO}'
    AND l_shipdate <  TIMESTAMP '{TOP_SUPP_HI}'
  GROUP BY l_suppkey
), mx AS (SELECT max(total_rev) AS max_rev FROM rev)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM rev, mx, supplier
WHERE total_rev = max_rev AND l_suppkey = s_suppkey
"""


# ---------------------------------------------------------------------------
# A28 — Q18 shape: large-volume orders (sum quantity > 150), customer
# joined back.  HAVING-filtered aggregate used as a semi-join driver.
# ---------------------------------------------------------------------------

LARGE_ORDER_QTY = 150


def q_a28_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-order qty rollup shrinks lineitem ~4× before any join; the
    HAVING filter shrinks it ~5× again, so the joins move only survivors.
    Customer/orders joins stay unhinted — both sides scale with SF."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_date"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


A28_SQL = f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {LARGE_ORDER_QTY}
) big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# A29 — Q19 shape: disjunctive brand/size/quantity predicate groups.
# One equi-join; the OR-of-ANDs is a residual filter Catalyst can still
# partially push (common l_partkey=p_partkey key; per-branch ranges).
# ---------------------------------------------------------------------------


def q_a29_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & qty.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & qty.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & qty.between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


A29_SQL = """
SELECT count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
       AND p.p_size BETWEEN 1 AND 15)
"""


# ---------------------------------------------------------------------------
# A30 — Q21 shape: suppliers who were the ONLY late shipper in a
# multi-supplier finished order.  The classic EXISTS/NOT-EXISTS double
# self-join is decorrelated into ONE per-order aggregate:
#   n_supp  = distinct suppliers in the order        (EXISTS other)
#   n_late  = distinct late suppliers in the order   (NOT EXISTS other late)
# keep late rows where n_supp >= 2 AND n_late == 1.
# One extra shuffle instead of two lineitem self-joins.
# ---------------------------------------------------------------------------

WAIT_DAYS = 60


def q_a30_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {WAIT_DAYS} DAYS"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late_rows = lo.where(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late_rows.join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


A30_SQL = f"""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL {WAIT_DAYS} DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM lo GROUP BY l_orderkey
), late_rows AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late
)
SELECT s_name, count(*) AS numwait
FROM late_rows lr
JOIN per_order p ON lr.l_orderkey = p.l_orderkey
JOIN supplier s ON lr.l_suppkey = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_late = 1
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# A31 — Q2 shape: cheapest European supplier per small ECONOMY part.
# Supply cost(part, supp) := min lineitem price for the pair; the
# per-part min is computed on the rolled-up pair table and joined back
# on DECIMAL equality (exact, so ties keep all witnesses like Q2 does).
# ---------------------------------------------------------------------------

MIN_COST_REGION = "EUROPE"
MIN_COST_PTYPE = "ECONOMY"
MIN_COST_MAX_SIZE = 10


def q_a31_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dims (region→nation→supplier, filtered part) broadcast; lineitem is
    semi-reduced by the broadcast joins before its (part,supp) rollup —
    the only big shuffle.  The per-part min then reuses that rollup."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == MIN_COST_REGION)
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == MIN_COST_PTYPE) & (F.col("p_size") < MIN_COST_MAX_SIZE)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min(_dec("l_extendedprice")).alias("pair_cost"))
    )
    per_part = pair.groupBy("l_partkey").agg(F.min("pair_cost").alias("min_cost"))
    return (
        pair.join(per_part, "l_partkey")
        .where(F.col("pair_cost") == F.col("min_cost"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.col("min_cost").cast("double").alias("min_price"),
        )
    )


A31_SQL = f"""
WITH eur AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MIN_COST_REGION}'
), pk AS (
  SELECT p_partkey FROM part
  WHERE p_type = '{MIN_COST_PTYPE}' AND p_size < {MIN_COST_MAX_SIZE}
), pair AS (
  SELECT l_partkey, l_suppkey, s_name, n_name,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS pair_cost
  FROM lineitem
  JOIN pk ON l_partkey = p_partkey
  JOIN eur ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey, s_name, n_name
), per_part AS (
  SELECT l_partkey, min(pair_cost) AS min_cost FROM pair GROUP BY l_partkey
)
SELECT pair.l_partkey AS p_partkey, s_name, n_name,
       CAST(min_cost AS DOUBLE) AS min_price
FROM pair JOIN per_part ON pair.l_partkey = per_part.l_partkey
WHERE pair_cost = min_cost
"""


# ---------------------------------------------------------------------------
# A32 — Q6 shape: forecast revenue change.  Pure scan-aggregate: every
# predicate is scan-pushable, the result is one row.
# ---------------------------------------------------------------------------

FORECAST_LO = "1997-01-01 00:00:00"
FORECAST_HI = "1998-01-01 00:00:00"


def q_a32_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates reach the parquet scan (shipdate min/max prunes
    whole row groups; at 100 TB with date-partitioned data this reads one
    year of files, nothing else).  The aggregate is a map-side partial per
    scan task + one single-row reduce — no shuffle of data rows at all."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= F.lit(FORECAST_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(FORECAST_HI).cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return filtered.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


A32_SQL = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_LO}'
  AND l_shipdate <  TIMESTAMP '{FORECAST_HI}'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity <  CAST(24 AS DOUBLE)
"""


# ---------------------------------------------------------------------------
# A33 — Q10 shape: returned-item reporting.  Top 20 customers by revenue
# lost to returns in one quarter; three joins + top-k with a deterministic
# tiebreak.
# ---------------------------------------------------------------------------

RETURN_Q_LO = "1997-07-01 00:00:00"
RETURN_Q_HI = "1997-10-01 00:00:00"


def q_a33_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarter filter cuts orders ~95% before the join, so orders is
    the SMALL side — at 100 TB AQE converts it to broadcast after the
    filter; nation always broadcasts.  The top-20 is a global sort of the
    per-customer aggregate (tiny), not of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(RETURN_Q_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(RETURN_Q_HI).cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


A33_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{RETURN_Q_LO}'
  AND o_orderdate <  TIMESTAMP '{RETURN_Q_HI}'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# A34 — Q16 shape: supplier count per part attribute.  NOT-IN subquery
# (→ broadcast anti join), distinct aggregate.  lineitem (l_partkey,
# l_suppkey) is the supply relation (no partsupp in the driver tables).
# ---------------------------------------------------------------------------

SUPPCNT_EXCL_BRAND = "Brand#13"
SUPPCNT_EXCL_TYPE_PREFIX = "MEDIUM%"
SUPPCNT_SIZES = [1, 4, 9, 14, 19, 23, 36, 45]


def q_a34_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complaints list (negative-balance suppliers) is tiny →
    broadcast LEFT ANTI, no shuffle; part after three filters is small →
    broadcast inner.  The only shuffle is the final distinct-count
    aggregate, whose input was already cut to qualifying parts."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != SUPPCNT_EXCL_BRAND)
            & (~F.col("p_type").like(SUPPCNT_EXCL_TYPE_PREFIX))
            & (F.col("p_size").isin(SUPPCNT_SIZES))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    supply = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        supply.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


A34_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{SUPPCNT_EXCL_BRAND}'
  AND p_type NOT LIKE '{SUPPCNT_EXCL_TYPE_PREFIX}'
  AND p_size IN ({", ".join(str(s) for s in SUPPCNT_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# A35 — Q20 shape: potential part promotion.  Nested IN-subqueries with a
# correlated aggregate, decorrelated into ONE conditional aggregation per
# (part, supplier) pair — one lineitem pass instead of two.
# ---------------------------------------------------------------------------

PROMO_NAME_PREFIX = "small%"
PROMO_YEAR_LO = "1997-01-01 00:00:00"
PROMO_YEAR_HI = "1998-01-01 00:00:00"
PROMO_EXCESS_MULTIPLIER = 12


def q_a35_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's correlated subquery (availqty vs half the year's shipments)
    becomes two sums with a CASE over the SAME grouped scan: total vs
    in-year quantity per supply pair.  A pair whose total exceeds twice
    its in-year quantity 12x-fold marks the supplier
    (division-free DECIMAL compare).  part after the name filter broadcasts; the pair rollup is
    the one shuffle; supplier joins the tiny qualifying set LEFT SEMI."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(PROMO_NAME_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    in_year = (
        F.col("l_shipdate") >= F.lit(PROMO_YEAR_LO).cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit(PROMO_YEAR_HI).cast("timestamp_ntz"))
    pair = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(_dec("l_quantity")).alias("qty_total"),
            F.sum(
                F.when(in_year, _dec("l_quantity")).otherwise(
                    F.lit("0").cast("decimal(18,2)")
                )
            ).alias("qty_year"),
        )
    )
    qualifying = (
        pair.where(
            (F.col("qty_year") > 0)
            & (F.col("qty_total") > F.col("qty_year") * PROMO_EXCESS_MULTIPLIER)
        )
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


A35_SQL = f"""
WITH pk AS (SELECT p_partkey FROM part WHERE p_name LIKE '{PROMO_NAME_PREFIX}'),
pair AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '{PROMO_YEAR_LO}'
                   AND l_shipdate <  TIMESTAMP '{PROMO_YEAR_HI}'
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_year
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM pair
                    WHERE qty_year > 0 AND qty_total > qty_year * {PROMO_EXCESS_MULTIPLIER})
"""


QUERIES = {
    "a24_order_count_dist": q_a24_order_count_dist,
    "a25_important_stock": q_a25_important_stock,
    "a26_shipmode_priority": q_a26_shipmode_priority,
    "a27_top_supplier": q_a27_top_supplier,
    "a28_large_orders": q_a28_large_orders,
    "a29_disjunctive_revenue": q_a29_disjunctive_revenue,
    "a30_waiting_suppliers": q_a30_waiting_suppliers,
    "a31_min_cost_supplier": q_a31_min_cost_supplier,
    "a32_forecast_revenue": q_a32_forecast_revenue,
    "a33_returned_items": q_a33_returned_items,
    "a34_supplier_cnt": q_a34_supplier_cnt,
    "a35_part_promotion": q_a35_part_promotion,
}

ORACLES = {
    "a24_order_count_dist": A24_SQL,
    "a25_important_stock": A25_SQL,
    "a26_shipmode_priority": A26_SQL,
    "a27_top_supplier": A27_SQL,
    "a28_large_orders": A28_SQL,
    "a29_disjunctive_revenue": A29_SQL,
    "a30_waiting_suppliers": A30_SQL,
    "a31_min_cost_supplier": A31_SQL,
    "a32_forecast_revenue": A32_SQL,
    "a33_returned_items": A33_SQL,
    "a34_supplier_cnt": A34_SQL,
    "a35_part_promotion": A35_SQL,
}
