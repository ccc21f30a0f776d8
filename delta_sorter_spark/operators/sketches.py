"""Streaming-friendly frequency sketches (training-data pipeline surface —
the reference has no aggregation framework at all, SURVEY §2.9).

``count_min_sketch`` builds a Count-Min sketch (Cormode & Muthukrishnan 2005)
over a column: ``depth`` pairwise-independent hash rows x ``width`` buckets,
each cell counting the items that hash into it.  Estimated frequency of v is
``min_j cells[j][h_j(v)]`` — always an over-estimate, within ``eps * N`` with
probability ``1 - delta`` for ``width = e/eps``, ``depth = ln(1/delta)``.

Everything is hash-groupBy: one scan + one explode (depth replication) + one
shuffle of at most ``depth * width`` cells — the sketch is mergeable across
partitions by construction (cells add), which is what makes it the right
shape for 100 TB / streaming frequency estimation where exact per-key counts
would shuffle every distinct key.

Hashes are the portable md5-affine family from functions/hashing.py, so a
DuckDB oracle reproduces every cell exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    minhash_perm_sql,
    spark_md5_long_sql,
)


def _bucket_sql(value_expr: str, a: int, b: int, width: int) -> str:
    base = spark_md5_long_sql(value_expr)
    return f"({minhash_perm_sql(base, a, b)} % {width})"


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) — depth*width cells at most.

    One scan; the depth-times replication happens via a generated array +
    explode, not repeated scans."""
    params = minhash_params(depth, seed)
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                F.expr(_bucket_sql(col, a, b, width)).alias("bucket"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Point-query the sketch for every distinct value of ``col``:
    (value, est_cnt).  est_cnt >= true count always (CM guarantee).

    The sketch side is tiny (depth*width rows) and is broadcast; the probe
    is one scan over distinct values."""
    params = minhash_params(depth, seed)
    values = df.select(F.col(col).alias("value")).distinct()
    probes = values.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        F.expr(_bucket_sql("value", a, b, width)).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )
        ).alias("c"),
    ).select("value", F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"])
    return joined.groupBy("value").agg(F.min("cnt").alias("est_cnt"))
