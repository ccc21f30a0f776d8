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
    Appends: valid_to_<first order col>, is_current."""
    from pyspark.sql import Window

    order_cols = list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    lead_col = F.lead(F.col(order_cols[0])).over(w)
    return df.withColumn(f"valid_to_{order_cols[0]}", lead_col).withColumn(
        "is_current", lead_col.isNull()
    )
