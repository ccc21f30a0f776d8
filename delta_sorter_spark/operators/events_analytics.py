"""Event-stream analytics: ordered funnels and retention cohorts.

The reference has no aggregation framework at all (SURVEY §2.9); these are
north-star extension operators over the ``events`` table shape
(user_id, ts, event_type, ...), expressed entirely as DataFrame
aggregations and hash joins on ``user_id`` — no windows over the full event
stream, no driver materialization.

Scale posture:

- ``funnel_counts`` reduces events to per-user step timestamps FIRST (one
  filtered aggregation per step — map-side combinable), then chains k-1
  hash joins on user_id over those per-user rows.  At 100 TB of events the
  joins touch |users| rows, not |events|.
- ``retention_cohorts`` is two aggregations (first-seen date per user,
  distinct active days) joined on user_id; the output is
  |cohorts| x |offsets| — tiny.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed ``steps[0]``, then
    ``steps[1]`` STRICTLY AFTER their first ``steps[0]``, then ``steps[2]``
    strictly after that, ...  Uses each user's EARLIEST qualifying timestamp
    per level (the standard greedy funnel; order within the same timestamp
    does not qualify).

    Output: one row per step — (step int, step_name, n_users)."""
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    levels: list[DataFrame] = []
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t__"))
    )
    levels.append(cur)
    for s in steps[1:]:
        cur = (
            events.where(F.col(type_col) == s)
            .join(
                cur.select(F.col(user_col), F.col("__t__").alias("__prev__")),
                user_col,
            )
            .where(F.col(ts_col) > F.col("__prev__"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t__"))
        )
        levels.append(cur)
    parts = [
        lvl.groupBy()
        .agg(F.count("*").alias("n_users"))
        .select(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("step_name"),
            "n_users",
        )
        for i, lvl in enumerate(levels)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def retention_cohorts(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Classic retention triangle: users are cohorted by their first active
    DAY; for each (cohort day, day offset) count the distinct users active
    that day.  Offset 0 row = cohort size.

    Output: (cohort_day 'yyyy-MM-dd', offset_days int, n_users)."""
    first = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("__cohort__")
    )
    active = events.select(
        F.col(user_col), F.to_date(ts_col).alias("__day__")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.col("__cohort__"),
            F.datediff(F.col("__day__"), F.col("__cohort__")).alias("offset_days"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
        .select(
            F.date_format("__cohort__", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_users",
        )
    )


def validity_intervals(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """SCD-2 interval build: turn a change log into validity ranges — each
    row becomes valid at its own ordering tuple and expires at the key's
    NEXT row (open-ended NULL for the current version, ``is_current``
    flagging it).  The standard dimension-history materialization from CDC
    events.

    One window partitioned by the business key (millions of small
    partitions at scale — no skew, no global exchange).  ``order_cols``
    must totally order rows within a key (add a unique id as tiebreak).
    Appends ``valid_to_<c>`` for EVERY order column (the full next-row
    tuple, so multi-column change logs round-trip) plus ``is_current``
    (row-existence based, so a NULL in the next row's first order column
    can't masquerade as open-ended)."""
    from pyspark.sql import Window

    order_cols = list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    out = df
    for c in order_cols:
        out = out.withColumn(f"valid_to_{c}", F.lead(F.col(c)).over(w))
    return out.withColumn("is_current", F.lead(F.lit(1)).over(w).isNull())


def scd2_compress(
    df: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """True SCD-2 compaction: collapse CONSECUTIVE change-log rows whose
    tracked attributes are identical into one validity interval per run —
    a CDC feed that re-emits an unchanged dimension row on every sync
    otherwise inflates the history table with no-op versions.

    Gaps-and-islands over one business-key window: lag the attribute tuple
    (null-safe, so NULL attributes compare equal), running-sum the change
    flags into a segment id, aggregate each segment to its first ordering
    tuple (``min(struct(order_cols))`` — column-wise mins could mix rows),
    then lead to the next segment for the interval close.  Every window and
    aggregation keys on the business key (the segment id only subdivides
    it), so Catalyst plans ONE exchange of the log for the whole pipeline.

    Output: keys + attr_cols + ``valid_from_<c>``/``valid_to_<c>`` per
    order column + ``n_rows`` (collapsed row count) + ``is_current``."""
    from pyspark.sql import Window

    keys, attr_cols, order_cols = list(keys), list(attr_cols), list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    attrs = F.struct(*[F.col(a) for a in attr_cols])
    changed = ~F.lag(attrs).over(w).eqNullSafe(attrs)  # first row: lag NULL -> True
    seg = df.withColumn(
        "__seg__",
        F.sum(F.when(changed, F.lit(1)).otherwise(F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = seg.groupBy(*keys, "__seg__", *attr_cols).agg(
        F.min(F.struct(*[F.col(c) for c in order_cols])).alias("__from__"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_seg = Window.partitionBy(*keys).orderBy("__from__")
    out = runs.withColumn("__to__", F.lead("__from__").over(w_seg)).withColumn(
        "is_current", F.lead(F.lit(1)).over(w_seg).isNull()
    )
    cols = (
        [F.col(k) for k in keys]
        + [F.col(a) for a in attr_cols]
        + [F.col("__from__")[c].alias(f"valid_from_{c}") for c in order_cols]
        + [F.col("__to__")[c].alias(f"valid_to_{c}") for c in order_cols]
        + [F.col("n_rows"), F.col("is_current")]
    )
    return out.select(*cols)
