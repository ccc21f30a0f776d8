"""global_rank must equal the single-partition row_number form."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_sorter_spark.operators.ranking import global_rank


def test_global_rank_matches_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 1000).alias("k"),
        F.col("id").alias("tiebreak"),
    )
    keys = ["k", "tiebreak"]
    expected = df.select(
        F.row_number().over(Window.orderBy("k", "tiebreak")).alias("rn"), "k", "tiebreak"
    )
    got = global_rank(df, keys, rank_col="rn", num_partitions=7).select("rn", "k", "tiebreak")
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_global_rank_nulls_last(spark):
    df = spark.createDataFrame([(None,), (2,), (1,)], "k int")
    got = {r["k"]: r["rn"] for r in global_rank(df, ["k"], nulls_first=False, num_partitions=3).collect()}
    assert got == {1: 1, 2: 2, None: 3}


def test_global_rank_is_exact_permutation(spark):
    # ranks must be exactly 1..N regardless of range-boundary sampling
    # (guards the pinned-partitioning contract: count pass and rank pass
    # must see identical partition assignments)
    df = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") * 7 % 1001).alias("b")
    )
    ranked = global_rank(df, ["a", "b"], rank_col="rn", num_partitions=8)
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rn").alias("d"),
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
    ).collect()[0]
    assert stats["n"] == stats["d"] == stats["mx"] == 5000
    assert stats["mn"] == 1
