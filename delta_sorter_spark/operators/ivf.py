"""IVF-style approximate nearest neighbor: coarse k-means quantizer + probed
search (the second scale path next to sign-LSH in operators/similarity.py).

Index build = a few Lloyd iterations, all DataFrame ops:
- centroids start as seeded gaussians (deterministic, data-independent init);
- assignment: broadcast the (tiny) centroid table, per-vector argmin via
  ``min_by`` over squared L2 — one narrow shuffle per iteration;
- update: element-wise centroid means via ``posexplode`` ->
  groupBy(centroid, pos) -> avg -> re-assemble arrays with
  ``sort_array(collect_list(struct(pos,val)))``.

Search: assign each query to its ``n_probes`` nearest centroids, join the
corpus on centroid id (only those inverted lists are scanned), exact cosine
rerank.  Recall improves with probes; cost is |list| x probes instead of the
full corpus.

At 100 TB the corpus-side assignment is computed once and persisted as a
partition/bucket column (e.g. via DeltaTable writes partitioned by
``centroid``), so a probe touches only matching files — the same file-pruning
story as the sorted-compaction path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_sorter_spark.operators.similarity import cosine_expr


def _seed_centroids(spark, dim: int, k: int, seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(k)]
    return spark.createDataFrame(rows, "centroid int, cvec array<double>")


def _sq_l2(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *"
        f" (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _assign(vectors: DataFrame, centroids: DataFrame, emb: str, n_best: int = 1) -> DataFrame:
    """Append centroid assignment(s): nearest ``n_best`` centroids per row."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "__d__", _sq_l2(emb, "cvec")
    )
    w = Window.partitionBy(*[c for c in vectors.columns]).orderBy("__d__", "centroid")
    # N.B. partitioning by all vector columns keeps rows unique; id-only would
    # be cheaper but this operator is generic over schemas
    return (
        scored.withColumn("__rk__", F.row_number().over(w))
        .where(F.col("__rk__") <= n_best)
        .drop("__d__", "__rk__", "cvec")
    )


def kmeans_centroids(
    corpus: DataFrame,
    emb_col: str,
    dim: int,
    k: int = 16,
    n_iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Deterministic coarse quantizer: (centroid, cvec)."""
    spark = corpus.sparkSession
    centroids = _seed_centroids(spark, dim, k, seed)
    vecs = corpus.select(F.col(emb_col).alias("__v__"))
    for _ in range(n_iters):
        assigned = _assign(vecs, centroids, "__v__")
        means = (
            assigned.select("centroid", F.posexplode("__v__").alias("pos", "val"))
            .groupBy("centroid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("cvec")
            )
        )
        # centroids with no assigned vectors keep their previous position
        centroids = (
            centroids.alias("old")
            .join(means.alias("new"), "centroid", "left")
            .select(
                "centroid",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probes: int = 2,
    n_iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probes`` nearest inverted lists,
    exact cosine rerank.  Output matches brute_force_topk: (query_id, id,
    rank, cosine)."""
    centroids = kmeans_centroids(corpus, emb_col, dim, n_centroids, n_iters, seed)
    c = _assign(
        corpus.select(F.col(id_col).alias("id"), F.col(emb_col).alias("__cemb__")),
        centroids,
        "__cemb__",
    )
    q = _assign(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_emb_col).alias("__qemb__")
        ),
        centroids,
        "__qemb__",
        n_best=n_probes,
    )
    scored = (
        c.join(q, "centroid")
        .where(F.col("id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("__qemb__", "__cemb__"))
        .dropDuplicates(["query_id", "id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "cosine")
    )
