"""Bucketed-table co-located joins: same bucketing on both sides means the
join runs with NO exchange (sources/formats.py:write_bucketed)."""

from pyspark.sql import functions as F

from delta_sorter_spark.sources.formats import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(
        left, "bk_left", ["k"], n_buckets=4, sort_cols=["k"], path=str(tmp_path / "l")
    )
    write_bucketed(
        right, "bk_right", ["k"], n_buckets=4, sort_cols=["k"], path=str(tmp_path / "r")
    )

    joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located: zero shuffle
    assert joined.count() == 10_000

    # sanity: the same join on unbucketed data DOES shuffle
    plain = left.join(right, "k")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan

    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
