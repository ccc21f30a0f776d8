"""IVF-style approximate nearest neighbor: coarse k-means quantizer + probed
search (the second scale path next to sign-LSH in operators/similarity.py).

Index build = a few Lloyd iterations, all DataFrame ops:
- centroids seed from the corpus itself: the k vectors with the smallest
  portable hash of their id (md5 -> bigint, functions.hashing) — a
  deterministic, engine-reproducible k-means|| stand-in with no RNG;
- assignment: broadcast the (tiny) centroid table, per-vector argmin via
  a row_number window over squared L2 — one narrow shuffle per iteration;
- update: element-wise centroid means via ``posexplode`` ->
  groupBy(centroid, pos) -> exact mean -> re-assemble arrays with
  ``sort_array(collect_list(struct(pos,val)))``.  The mean quantizes
  values to integers (floor(v * 2^20), bit-reproducible per IEEE), sums
  exactly in BIGINT, and performs ONE double division — so the centroids,
  and therefore every assignment and distance, are bit-identical in any
  engine regardless of aggregation order.  This is what lets an iterative
  distributed k-means be hash-checked against a single-threaded SQL oracle
  (see __spark_entry__ e15).

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

from delta_sorter_spark.functions.hashing import MERSENNE_P, spark_md5_long_sql
from delta_sorter_spark.operators.similarity import cosine_expr

MEAN_QSCALE = 1 << 20  # integer quantization for exact centroid means


def _seed_centroids(corpus: DataFrame, id_col: str, emb_col: str, k: int):
    """k corpus vectors with the smallest portable id-hash: (centroid, cvec).

    orderBy + limit(k) compiles to TakeOrderedAndProject — every partition
    keeps its local top-k and only k rows per partition reach the driver, so
    there is NO single-partition exchange over the corpus (the global
    ``Window.orderBy().row_number()`` form this replaces funneled every
    vector through one task).  The k winners (tiny) are numbered driver-side
    in the same (hash asc, id asc) order the SQL oracle replays."""
    h = F.expr(f"{spark_md5_long_sql(f'CAST({id_col} AS STRING)')} % {MERSENNE_P}")
    seeds = (
        corpus.select(
            F.col(id_col).alias("__sid__"),
            F.expr(f"transform({emb_col}, x -> CAST(x AS DOUBLE))").alias("cvec"),
            h.alias("__h__"),
        )
        .orderBy(F.col("__h__").asc(), F.col("__sid__").asc())
        .limit(k)
    )
    rows = seeds.collect()  # k rows, already in (hash, id) order
    return corpus.sparkSession.createDataFrame(
        [(i, row["cvec"]) for i, row in enumerate(rows)],
        "centroid int, cvec array<double>",
    )


def _assign(vectors: DataFrame, centroids: DataFrame, emb: str, n_best: int = 1) -> DataFrame:
    """Append centroid assignment(s): nearest ``n_best`` centroids per row.

    Zero-shuffle: the (tiny) centroid set folds into ONE row holding an
    ``array<struct<centroid,cvec>>`` which broadcasts as a single-row
    nested-loop join, and the argmin is a map-side ``array_min`` over
    per-centroid squared-L2 distances — struct ordering breaks distance
    ties on centroid id, exactly like the row_number window this replaces.
    No exchange between the corpus scan and the assignment, so the k-means
    iterations and IVF search stay embarrassingly parallel at any corpus
    size (each input row is touched once, k distances computed in place).
    """
    packed = centroids.agg(
        F.expr("sort_array(collect_list(struct(centroid, cvec)))").alias("__cents__")
    )
    dist = (
        f"aggregate(zip_with({emb}, c.cvec, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *"
        f" (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    scored = f"transform(__cents__, c -> struct({dist} AS d, c.centroid AS centroid))"
    joined = vectors.crossJoin(F.broadcast(packed))
    if n_best == 1:
        out = joined.withColumn("centroid", F.expr(f"array_min({scored}).centroid"))
    else:
        out = joined.withColumn(
            "centroid",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({scored}), 1, {n_best}), s -> s.centroid)"
                )
            ),
        )
    return out.drop("__cents__")


def kmeans_centroids(
    corpus: DataFrame,
    emb_col: str,
    dim: int,
    k: int = 16,
    n_iters: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Deterministic coarse quantizer: (centroid, cvec).  ``id_col`` drives
    the hash-based seeding (falls back to the embedding's string form)."""
    if id_col is None:
        seeds_src = corpus.select(
            F.expr(f"CAST({emb_col} AS STRING)").alias("__sid__"),
            F.col(emb_col).alias("__e__"),
        )
        centroids = _seed_centroids(seeds_src, "__sid__", "__e__", k)
    else:
        centroids = _seed_centroids(corpus, id_col, emb_col, k)
    vecs = corpus.select(F.col(emb_col).alias("__v__"))
    for _ in range(n_iters):
        assigned = _assign(vecs, centroids, "__v__")
        # exact mean: quantize -> BIGINT sum (associative) -> ONE division
        means = (
            assigned.select("centroid", F.posexplode("__v__").alias("pos", "val"))
            .groupBy("centroid", "pos")
            .agg(
                (
                    F.sum(
                        F.expr(
                            f"CAST(floor(CAST(val AS DOUBLE) * {MEAN_QSCALE}) AS BIGINT)"
                        )
                    ).cast("double")
                    / (F.count("*") * F.lit(MEAN_QSCALE)).cast("double")
                ).alias("m")
            )
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
) -> DataFrame:
    """Approximate top-k: probe the ``n_probes`` nearest inverted lists,
    exact cosine rerank.  Output matches brute_force_topk: (query_id, id,
    rank, cosine)."""
    centroids = kmeans_centroids(
        corpus, emb_col, dim, n_centroids, n_iters, id_col=id_col
    )
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
