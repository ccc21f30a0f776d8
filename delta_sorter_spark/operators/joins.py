"""Temporal join operators: as-of join and time-range join.

The reference has no joins at all (SURVEY §2.9 — grep-verified absence); these
are part of the §2.8 extension surface a training-data pipeline needs (align
events to the most recent dimension snapshot, join telemetry within a window).

``asof_join`` deliberately avoids the naive inequality-join formulation
(``l.key = r.key AND r.ts <= l.ts`` + argmax), which Spark executes as a
broadcast-nested-loop or an exploding range join.  Instead it uses the
union-and-carry-forward shape:

1. union the right (build) rows and left (probe) rows into one keyed stream,
2. one shuffle: ``Window.partitionBy(key).orderBy(ts, side)`` with
   ``last(build_payload, ignorenulls=True)`` carrying the most recent build
   row forward across probe rows,
3. keep probe rows.

Cost is a single hash shuffle + per-key sort — linear in |left| + |right|,
no pair explosion, skew-bounded by the hottest key.  This is the standard
scalable as-of/point-in-time join on Spark (same shape Flink's temporal join
and kdb's aj compute with state).

Ties: a build row with ts equal to the probe ts DOES match (<= semantics,
side ordering puts builds first); multiple build rows on the same (key, ts)
must be pre-deduplicated by the caller for deterministic output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """For each left row, attach the right row with the largest ``right_ts``
    satisfying ``right_ts <= left_ts`` within the same ``on`` key (left outer:
    unmatched left rows keep nulls).

    Output columns: all of ``left``'s, then each right payload column (right
    key/ts columns are carried inside the payload struct and surfaced with
    their original names; name collisions with left columns are the caller's
    responsibility to alias away beforehand).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]

    r = right.select(
        *[F.col(k).alias(f"__k{i}__") for i, k in enumerate(keys)],
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.struct(*payload_cols).alias("__build__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *[F.col(k).alias(f"__k{i}__") for i, k in enumerate(keys)],
        F.col(left_ts).cast(dict(right.dtypes)[right_ts]).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(r.schema["__build__"].dataType).alias("__build__"),
        *left.columns,
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*[f"__k{i}__" for i in range(len(keys))])
        .orderBy("__ts__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m__", F.last("__build__", ignorenulls=True).over(w))
    probe = carried.where(F.col("__side__") == 1)
    return probe.select(
        *left.columns,
        *[F.col(f"__m__.{c}").alias(c) for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of rows with ``right_ts`` within ``[left_ts + lower_s,
    left_ts + upper_s]`` (seconds) on the same key, bucketized so Catalyst
    gets an equi-join: both sides are assigned coarse time buckets (left rows
    replicated into each bucket their window can touch), the join runs on
    (key, bucket) hash partitions, and the exact interval predicate filters
    within the bucket.

    Without the bucket key this is a pure inequality join — a cartesian
    per-key explosion; with it, cost is bounded by rows-per-bucket, and the
    replication factor is ``ceil(span / bucket_s) + 1`` (keep ``bucket_s``
    >= the window span so it stays <= 2).
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(  # noqa: E741
        "__b__",
        F.explode(
            F.sequence(
                F.floor((F.unix_timestamp(F.col(left_ts)) + lower_s) / bucket_s),
                F.floor((F.unix_timestamp(F.col(left_ts)) + upper_s) / bucket_s),
            )
        ),
    )
    r = right.withColumn(
        "__b__", F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_s)
    )
    delta = F.unix_timestamp(F.col(right_ts)) - F.unix_timestamp(F.col(left_ts))
    joined = l.join(r, [*keys, "__b__"]).where(
        (delta >= lower_s) & (delta <= upper_s)
    )
    return joined.drop("__b__")
