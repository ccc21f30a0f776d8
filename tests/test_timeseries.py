"""Time-series gap fill (operators/timeseries.resample_ffill): grid
construction, forward-fill semantics, per-key independence."""

from datetime import datetime


def test_resample_ffill_fills_gaps_per_key(spark):
    from delta_sorter_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 30), 1.5),
        ("a", datetime(2024, 1, 1, 0, 2, 10), 2.5),   # 2 empty minutes follow
        ("a", datetime(2024, 1, 1, 0, 5, 0), 0.25),
        ("b", datetime(2024, 1, 1, 0, 3, 0), 9.0),    # b spans one bucket only
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {
        (r["k"], r["bucket_start"]): r
        for r in resample_ffill(df, "k", "ts", "v", step_s=60).collect()
    }
    # a: grid 00:00..00:05 inclusive = 6 buckets; b: 1 bucket
    assert len(out) == 7
    a = [out[("a", f"2024-01-01 00:0{i}:00")] for i in range(6)]
    assert [r["value_ppm"] for r in a] == [
        1_500_000, 1_500_000, 2_500_000, 2_500_000, 2_500_000, 250_000
    ]
    assert [r["filled"] for r in a] == [0, 1, 0, 1, 1, 0]
    assert out[("b", "2024-01-01 00:03:00")]["value_ppm"] == 9_000_000
    assert out[("b", "2024-01-01 00:03:00")]["filled"] == 0


def test_resample_ffill_bucket_reduce_is_max(spark):
    from delta_sorter_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 1), 3.0),
        ("a", datetime(2024, 1, 1, 0, 0, 59), 1.0),  # same bucket, smaller
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    got = resample_ffill(df, "k", "ts", "v", step_s=60).collect()
    assert len(got) == 1
    assert got[0]["value_ppm"] == 3_000_000 and got[0]["filled"] == 0
