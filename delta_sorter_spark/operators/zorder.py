"""Z-order (Morton) clustering layout — multi-dimensional generalization of
the engine's lexicographic sort (Delta OPTIMIZE ZORDER BY interop surface,
SURVEY §2.8 E6).

A lexicographic sort clusters perfectly on the leading key only; z-ordering
interleaves the bits of several bucketized keys so file-level min/max stats
prune scans on ALL participating columns.  Everything is integer column
arithmetic (whole-stage codegen, no UDF), and the bit-interleave is portable
SQL so the DuckDB oracle reproduces z-values exactly.

Scale shape: bucketize (map-side) -> ``repartitionByRange(z)`` (sampled, no
single partition) -> ``sortWithinPartitions(z)`` -> write; identical to the
strict-sort write path with z as the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr_sql(col: str, lo: int, hi: int, bits: int) -> str:
    """Integer bucket of ``col`` into [0, 2^bits): pure integer arithmetic,
    identical in Spark SQL (DIV) and DuckDB (//) — the caller picks the
    dialect via ``div_op``."""
    nb = 1 << bits
    span = hi - lo + 1
    return (
        f"least(greatest(CAST(((CAST({col} AS BIGINT) - {lo}) * {nb}) DIV {span} AS BIGINT), 0), {nb - 1})"
    )


def interleave_sql(bucket_exprs: Sequence[str], bits: int) -> str:
    """Morton interleave: bit b of column j lands at position b*ncols + j."""
    ncols = len(bucket_exprs)
    terms = []
    for j, be in enumerate(bucket_exprs):
        for b in range(bits):
            terms.append(f"(((({be}) >> {b}) & 1) << {b * ncols + j})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def z_value_expr(cols: Sequence[str], bounds: Sequence[tuple[int, int]], bits: int = 8) -> Column:
    """z-value Column over integer columns with fixed [lo, hi] bounds."""
    buckets = [bucket_expr_sql(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    return F.expr(interleave_sql(buckets, bits))


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bounds: Sequence[tuple[int, int]] | None = None,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` clustered by the z-order of ``cols``.

    ``bounds`` default to each column's observed min/max (one cheap agg job —
    at 100 TB this reads only min/max from parquet footers via pushed-down
    aggregation or a single scan; pass explicit bounds to avoid it)."""
    from pyspark.sql import types as T

    dtypes = dict(df.dtypes)
    bad = [
        c
        for c in cols
        if not isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        )
    ]
    if bad:
        raise ValueError(
            "z-order columns must be integer typed (byte/short/int/long); "
            f"got {', '.join(f'{c}: {dtypes[c]}' for c in bad)}"
        )
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        bounds = [(int(row[f"__lo_{c}"]), int(row[f"__hi_{c}"])) for c in cols]
    with_z = df.withColumn("__z__", z_value_expr(cols, bounds, bits))
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        with_z.repartitionByRange(n, F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )


# ---------------------------------------------------------------------------
# Hilbert curve clustering — the higher-locality sibling of the Morton layout
# ---------------------------------------------------------------------------
#
# Z-order has locality "jumps" at power-of-two seams (cell 0b0111 -> 0b1000
# teleports across the grid); the Hilbert curve visits every cell of the
# 2^bits x 2^bits grid through unit steps only, so file-level min/max ranges
# cover tighter rectangles and prune better on BOTH columns.  Delta's
# OPTIMIZE added Hilbert for exactly this reason (liquid clustering).
#
# The classic xy2d walk (Wikipedia's C version) is a loop over bit levels
# carrying (x, y, d).  A naive expression-substitution unroll would grow
# exponentially (x and y feed each other), so each level becomes ONE
# simultaneous projection: Spark gets a chained select per level (still a
# single whole-stage-codegen stage — no shuffle, no Python), and the DuckDB
# oracle gets the same arithmetic as a CTE chain.  Everything is integer
# CASE/shift/mask, so the oracle matches bit-for-bit.


def hilbert_step_exprs(level: int, bits: int, x: str = "hx", y: str = "hy", d: str = "hd") -> dict[str, str]:
    """SQL expressions (dialect-neutral) for one xy2d bit level.

    Returns replacement expressions for columns {d, x, y} in terms of the
    previous level's values; callers must apply them SIMULTANEOUSLY."""
    s = 1 << level
    n = 1 << bits
    rx = f"((({x}) >> {level}) & 1)"
    ry = f"((({y}) >> {level}) & 1)"
    # (3*rx) XOR ry without an XOR operator (DuckDB's ^ is exponent):
    # rx=0 -> ry ; rx=1 -> 3-ry
    quad = f"(CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    # rot(): if ry==0 reflect (when rx==1) through n-1 then swap x/y
    return {
        d: f"({d}) + {s * s} * {quad}",
        x: f"(CASE WHEN {ry} = 1 THEN ({x}) WHEN {rx} = 1 THEN {n - 1} - ({y}) ELSE ({y}) END)",
        y: f"(CASE WHEN {ry} = 1 THEN ({y}) WHEN {rx} = 1 THEN {n - 1} - ({x}) ELSE ({x}) END)",
    }


def hilbert_value_df(df: DataFrame, x_expr: str, y_expr: str, bits: int, out: str = "hval") -> DataFrame:
    """Append column ``out`` = Hilbert distance of (x_expr, y_expr) on the
    2^bits grid.  Inputs must already lie in [0, 2^bits)."""
    cols = [c for c in df.columns if c not in ("hx", "hy", "hd")]
    cur = df.select(
        *cols,
        F.expr(x_expr).cast("long").alias("hx"),
        F.expr(y_expr).cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    for level in range(bits - 1, -1, -1):
        step = hilbert_step_exprs(level, bits)
        cur = cur.select(
            *cols,
            F.expr(step["hx"]).alias("__nx"),
            F.expr(step["hy"]).alias("__ny"),
            F.expr(step["hd"]).alias("__nd"),
        ).select(
            *cols,
            F.col("__nx").alias("hx"),
            F.col("__ny").alias("hy"),
            F.col("__nd").alias("hd"),
        )
    return cur.select(*cols, F.col("hd").alias(out))


def hilbert_value_cte_sql(source_sql: str, x_expr: str, y_expr: str, bits: int, keep: Sequence[str], out: str = "hval") -> str:
    """DuckDB CTE chain computing the same Hilbert distance as
    :func:`hilbert_value_df` — one CTE per bit level, identical arithmetic."""
    keep_cols = ", ".join(keep)
    parts = [
        f"h{bits} AS (SELECT {keep_cols}, CAST({x_expr} AS BIGINT) AS hx, "
        f"CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM ({source_sql}))"
    ]
    for level in range(bits - 1, -1, -1):
        step = hilbert_step_exprs(level, bits)
        parts.append(
            f"h{level} AS (SELECT {keep_cols}, {step['hx']} AS hx, "
            f"{step['hy']} AS hy, {step['hd']} AS hd FROM h{level + 1})"
        )
    ctes = ",\n".join(parts)
    return f"WITH {ctes}\nSELECT {keep_cols}, hd AS {out} FROM h0"


def hilbert_layout(
    df: DataFrame,
    cols: Sequence[str],
    bounds: Sequence[tuple[int, int]] | None = None,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` clustered along the Hilbert curve of two integer
    columns (same write shape as :func:`zorder_layout`: bucketize map-side ->
    repartitionByRange on the curve position -> sortWithinPartitions)."""
    if len(cols) != 2:
        raise ValueError("hilbert_layout clusters exactly two columns")
    from pyspark.sql import types as T

    for c in cols:
        if not isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            raise ValueError(f"hilbert column {c} must be integer typed")
    if bounds is None:
        row = df.agg(
            F.min(cols[0]), F.max(cols[0]), F.min(cols[1]), F.max(cols[1])
        ).collect()[0]
        bounds = [(int(row[0]), int(row[1])), (int(row[2]), int(row[3]))]
    bx = bucket_expr_sql(cols[0], bounds[0][0], bounds[0][1], bits)
    by = bucket_expr_sql(cols[1], bounds[1][0], bounds[1][1], bits)
    with_h = hilbert_value_df(df, bx, by, bits, out="__h__")
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        with_h.repartitionByRange(n, F.col("__h__"))
        .sortWithinPartitions("__h__")
        .drop("__h__")
    )
