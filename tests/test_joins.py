"""Unit tests for the temporal join operators (operators/joins.py)."""

import datetime as dt

from pyspark.sql import functions as F

from delta_sorter_spark.operators.joins import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:05"), "t1"),
            (1, _ts("2024-01-01 10:00:20"), "t2"),
            (2, _ts("2024-01-01 10:00:10"), "t3"),
            (3, _ts("2024-01-01 10:00:10"), "t4"),  # no quote for key 3
        ],
        "key long, ts timestamp_ntz, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:00:10"), 101.0),
            (1, _ts("2024-01-01 10:00:30"), 102.0),
            (2, _ts("2024-01-01 10:00:10"), 200.0),  # equal ts: must match
        ],
        "key long, qts timestamp_ntz, price double",
    )
    out = asof_join(trades, quotes, on="key", left_ts="ts", right_ts="qts")
    got = {r["trade"]: r["price"] for r in out.collect()}
    assert got == {"t1": 100.0, "t2": 101.0, "t3": 200.0, "t4": None}


def test_asof_join_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 00:01:00"))], "k1 long, k2 string, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00"), "match"),
            (1, "b", _ts("2024-01-01 00:00:30"), "wrong-key"),
        ],
        "k1 long, k2 string, rts timestamp_ntz, v string",
    )
    out = asof_join(left, right, on=["k1", "k2"], left_ts="ts", right_ts="rts")
    assert [r["v"] for r in out.collect()] == ["match"]


def test_asof_join_no_pair_explosion(spark):
    """Plan shape: one window over a union — no nested-loop / cartesian."""
    left = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).cast("timestamp_ntz").alias("ts"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 30).cast("timestamp_ntz").alias("rts"),
        F.lit(1.0).alias("v"),
    )
    plan = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_window_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00")),
            (2, 10, _ts("2024-01-01 00:05:00")),  # +300s from e1
            (3, 10, _ts("2024-01-01 00:12:00")),  # +720s from e1, +420s from e2
            (4, 99, _ts("2024-01-01 00:06:00")),  # other key
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    left = ev.select(F.col("event_id").alias("left_id"), "user_id", F.col("ts").alias("lts"))
    right = ev.select(F.col("event_id").alias("right_id"), "user_id", F.col("ts").alias("rts"))
    out = range_join(left, right, "user_id", "lts", "rts", 1, 600, bucket_s=600)
    pairs = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert pairs == {(1, 2), (2, 3)}


def test_range_join_no_duplicate_rows_across_buckets(spark):
    """A right row on a bucket boundary must appear once per matching pair."""
    ev = spark.createDataFrame(
        [(i, 1, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=i * 100)) for i in range(20)],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    left = ev.select(F.col("event_id").alias("left_id"), "user_id", F.col("ts").alias("lts"))
    right = ev.select(F.col("event_id").alias("right_id"), "user_id", F.col("ts").alias("rts"))
    out = range_join(left, right, "user_id", "lts", "rts", 1, 600, bucket_s=600)
    rows = [(r["left_id"], r["right_id"]) for r in out.collect()]
    assert len(rows) == len(set(rows))
    # every pair within 6 steps of 100s
    assert set(rows) == {(a, b) for a in range(20) for b in range(20) if 1 <= (b - a) * 100 <= 600}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=25
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=_ROWS, right_rows=_ROWS)
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    """asof_join == per-row brute force: latest right ts <= left ts per key."""
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)],
        "lid long, key long, ts timestamp_ntz",
    )
    # dedupe right on (key, ts) to keep the expected value well-defined
    seen, rdata = set(), []
    for i, (k, s) in enumerate(right_rows):
        if (k, s) not in seen:
            seen.add((k, s))
            rdata.append((i, k, base + dt.timedelta(seconds=s)))
    right = spark.createDataFrame(rdata, "rid long, key long, rts timestamp_ntz")

    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on="key", left_ts="ts", right_ts="rts").collect()
    }
    for i, (k, s) in enumerate(left_rows):
        cands = [(rs, ri) for ri, rk, rs in [(x[0], x[1], x[2]) for x in rdata] if rk == k and rs <= base + dt.timedelta(seconds=s)]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"left row {i} (key={k}, s={s})"
