"""The r10 edge-cache right-sizing must change SCHEDULING only: identical
labels/ranks with the helper active vs no-op'd, and tiny graphs collapse to
one cached partition while the helper never increases a partition count."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators import graph


@pytest.fixture()
def edges(spark):
    # union lineage like the entry queries: 2 x shuffle.partitions sides
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    return pairs


def test_rightsize_coalesces_tiny_and_preserves_rows(spark, edges):
    df = edges.union(edges.select("id_b", "id_a")).repartition(8).persist()
    n = df.count()
    sized = graph._rightsize_cached_edges(df, n)
    assert sized.rdd.getNumPartitions() == 1
    assert sized.count() == n
    sized.unpersist()


def test_rightsize_never_increases_partitions(spark, edges):
    df = edges.persist()
    n = df.count()
    before = df.rdd.getNumPartitions()
    sized = graph._rightsize_cached_edges(df, n * 0)  # n_rows=0 -> target 1
    assert sized.rdd.getNumPartitions() <= before
    sized.unpersist()
    # huge claimed row count: helper must leave the frame alone
    df2 = edges.persist()
    df2.count()
    assert graph._rightsize_cached_edges(df2, 10**9) is df2
    df2.unpersist()


def test_components_and_ranks_identical_with_and_without(spark, edges, monkeypatch):
    nodes = spark.range(0, 30).select(F.col("id"))
    bidir = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))

    def snap():
        comps = sorted(
            (r["id"], r["component"])
            for r in graph.connected_components(nodes, edges).collect()
        )
        ranks = sorted(
            (r["id"], r["rank_q"])
            for r in graph.pagerank(nodes, bidir, n_iters=2).collect()
        )
        return comps, ranks

    with_fix = snap()
    monkeypatch.setattr(graph, "_rightsize_cached_edges", lambda df, n: df)
    without = snap()
    assert with_fix == without
