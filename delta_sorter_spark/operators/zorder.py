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
