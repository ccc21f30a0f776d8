"""Z-order layout tests: Morton interleave correctness + clustering effect."""

from pyspark.sql import functions as F

from delta_sorter_spark.operators.zorder import (
    interleave_sql,
    z_value_expr,
    zorder_layout,
)


def _morton2(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_morton(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(0, 16) for b in range(0, 16)], "a long, b long"
    )
    got = df.select(
        "a", "b", F.expr(interleave_sql(["a", "b"], 4)).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["a"], r["b"], 4)


def test_z_value_expr_buckets_with_bounds(spark):
    df = spark.createDataFrame([(0, 0), (100, 100), (50, 50)], "x long, y long")
    out = df.select(
        z_value_expr(["x", "y"], [(0, 100), (0, 100)], bits=2).alias("z")
    ).collect()
    zs = sorted(r["z"] for r in out)
    # corners: (0,0)->0, (~mid)->z(2,2), (max)->z(3,3)=15
    assert zs[0] == 0
    assert zs[-1] == _morton2(3, 3, 2)


def test_zorder_layout_clusters(spark):
    df = spark.createDataFrame(
        [(i % 13, (i * 7) % 13) for i in range(1000)], "x long, y long"
    )
    out = zorder_layout(df, ["x", "y"], bits=4, num_partitions=4)
    assert out.count() == 1000
    assert set(out.columns) == {"x", "y"}
    # each output partition covers a bounded z-range: partition-level spread
    # of x must be narrower than the global spread for most partitions
    import numpy as np

    with_pid = out.withColumn("pid", F.spark_partition_id())
    spans = (
        with_pid.groupBy("pid")
        .agg((F.max("x") - F.min("x")).alias("span_x"), F.count("*").alias("n"))
        .collect()
    )
    avg_span = np.mean([r["span_x"] for r in spans if r["n"] > 10])
    assert avg_span <= 12  # tighter than the full 0..12 domain on average


def test_compact_with_zorder_clustering(spark, tmp_path):
    from delta_sorter_spark.api import compact
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "zt")
    df = spark.range(0, 2000).select(
        (F.col("id") % 53).alias("x"),
        ((F.col("id") * 7) % 41).alias("y"),
        F.col("id").alias("payload"),
    )
    table = DeltaTable.create(spark, path, df.repartition(4))
    before = sorted(r["payload"] for r in table.to_df().collect())

    metrics = compact(path, [], zorder_columns=["x", "y"], spark=spark)
    assert metrics.rewritten_partitions == 1

    after_df = DeltaTable(spark, path).to_df()
    assert sorted(r["payload"] for r in after_df.collect()) == before

    # the rewrite attached min/max stats for the z columns (pruning payoff)
    state = DeltaTable(spark, path).state()
    assert all(a.stats and "x" in a.stats.get("minValues", {}) for a in state.adds)


# -- Hilbert curve ----------------------------------------------------------


def _ref_xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_walk(spark):
    from delta_sorter_spark.operators.zorder import hilbert_value_df

    bits, n = 4, 16
    grid = [(x, y) for x in range(n) for y in range(n)]
    out = hilbert_value_df(
        spark.createDataFrame(grid, "x long, y long"), "x", "y", bits
    ).collect()
    ref = {(x, y): _ref_xy2d(n, x, y) for x, y in grid}
    assert all(r["hval"] == ref[(r["x"], r["y"])] for r in out)
    # the curve is a permutation of the grid visiting neighbors only
    inv = sorted((d, xy) for xy, d in ref.items())
    assert [d for d, _ in inv] == list(range(n * n))
    assert all(
        abs(a[1][0] - b[1][0]) + abs(a[1][1] - b[1][1]) == 1
        for a, b in zip(inv, inv[1:])
    )


def test_hilbert_layout_clusters(spark):
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.zorder import hilbert_layout

    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    out = hilbert_layout(df, ["x", "y"], bits=4, num_partitions=4)
    # each output partition should cover a small sub-rectangle of both dims:
    # spans of x and y per partition must be far below the full 0..31 range
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in spans) == 1024
    big = [r for r in spans if r["n"] > 64]  # ignore slivers at range bounds
    assert big and all(r["sx"] <= 23 and r["sy"] <= 23 for r in big)
