"""Similarity search over embedding columns (north-star E3, SURVEY §2.8).

- ``cosine_expr``: pure-JVM cosine over two array columns via
  ``zip_with`` + ``aggregate`` (no UDF, stays in whole-stage codegen).
  Sums fold left-to-right in index order, which DuckDB's list functions also
  do, so oracle comparisons are bitwise-stable.
- ``brute_force_topk``: the exact baseline — broadcast the (small) query set
  against the corpus, cosine, per-query top-k window.  One shuffle (by
  query id) over ``|queries| x |corpus|`` scored rows; at 100 TB this is the
  verification path, not the serving path.
- ``lsh_bucket_expr`` / ``ann_topk``: the scale path — deterministic sign-LSH
  (seeded hyperplanes, functions.hashing) buckets the corpus once; queries
  join only their bucket, then exact cosine reranks.  An IVF-style coarse
  quantizer would slot in the same shape (bucket column + bucket join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import hyperplanes


def dot_expr(a: str, b: str) -> Column:
    """Dot product of two array<numeric> columns, computed in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, id, rank, cosine).

    The query side is broadcast — Catalyst keeps the corpus un-shuffled and
    streams it once; the only shuffle is the per-query top-k window over
    scored rows."""
    from pyspark.sql import Window

    # norms precomputed per side BEFORE the cross join: the per-pair work is
    # then just the dot product (same float ops and order as cosine_expr, so
    # values are bit-identical — only redundant recomputation is removed)
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_emb_col).alias("__qemb__"),
            norm_expr(query_emb_col).alias("__qn__"),
        )
    )
    scored = corpus.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("__cemb__"),
        norm_expr(emb_col).alias("__cn__"),
    ).crossJoin(q)
    scored = scored.where(F.col("id") != F.col("query_id")).withColumn(
        "cosine", dot_expr("__qemb__", "__cemb__") / (F.col("__qn__") * F.col("__cn__"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "cosine")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for every
    unordered pair with cosine >= threshold (the embedding-space member of
    the dedup family next to MinHash/SimHash in operators/dedup.py).

    With ``block_col=None`` this is the exact all-pairs form: a self-join on
    ``id < id`` — O(n²) scoring, the verification path.  At scale, pass a
    blocking column (e.g. ``lsh_bucket_expr``'s sign-LSH bucket or an IVF
    centroid id from operators/ivf.py): pairs are then only scored within a
    block, turning the join into a bucket-local equi-join — the same
    candidate-generation shape as MinHash banding.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("__ea__"),
        norm_expr(emb_col).alias("__na__"),
        *([F.col(block_col).alias("__blk__")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("__eb__"),
        norm_expr(emb_col).alias("__nb__"),
        *([F.col(block_col).alias("__blk__")] if block_col else []),
    )
    if block_col:
        pairs = a.join(b, "__blk__").where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    # per-side norms precomputed above; same ops/order as cosine_expr
    scored = pairs.withColumn(
        "cosine", dot_expr("__ea__", "__eb__") / (F.col("__na__") * F.col("__nb__"))
    )
    return (
        scored.where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def _plane_array_sql(plane: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"


def lsh_bucket_expr(emb_col: str, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-LSH bucket id: bit j set iff dot(plane_j, emb) > 0.  Planes are
    deterministic literals (seeded, 6-decimal) so the DuckDB oracle can
    reproduce bucket ids exactly."""
    planes = hyperplanes(dim, n_planes, seed)
    terms = []
    for j, plane in enumerate(planes):
        dot = (
            f"aggregate(zip_with({emb_col}, {_plane_array_sql(plane)},"
            f" (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(terms)).cast("long")


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH-bucket join then exact rerank within bucket.

    Misses neighbors that land in other buckets (recall/cost tradeoff —
    lower n_planes for higher recall).  Output matches brute_force_topk's
    shape: (query_id, id, rank, cosine)."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("__cemb__"),
        lsh_bucket_expr(emb_col, dim, n_planes, seed).alias("__bucket__"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_emb_col).alias("__qemb__"),
            lsh_bucket_expr(query_emb_col, dim, n_planes, seed).alias("__bucket__"),
        )
    )
    scored = (
        c.join(q, on="__bucket__")
        .where(F.col("id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("__qemb__", "__cemb__"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "cosine")
    )


def quantize_expr(a: str, scale: int = 127) -> Column:
    """Symmetric int8-style scalar quantization of an array<float> column:
    ``q[i] = floor(v[i] * scale)`` as INT.

    Scale-path compression for 100 TB retrieval: a 64-dim float32 embedding
    (256 B) becomes 64 ints that parquet dictionary/bit-packs to ~64 B, and
    the scoring loop below runs in exact integer arithmetic (associative —
    no float summation-order concerns across engines or partitions).
    ``floor`` after one double multiply is reproducible bit-for-bit anywhere
    IEEE doubles are used, so quantized scores are hash-exact vs any oracle.
    Assumes inputs in [-1, 1] (normalized embeddings); callers with other
    ranges pick ``scale`` accordingly.
    """
    return F.expr(
        f"transform({a}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS INT))"
    )


def quantized_dot_expr(a: str, b: str) -> Column:
    """Integer dot product of two quantized array<int> columns (exact)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    k: int = 5,
    scale: int = 127,
) -> DataFrame:
    """Approximate top-k on int8-quantized vectors: (query_id, id, rank, qdot).

    Same broadcast-queries/stream-corpus shape as brute_force_topk, but the
    per-pair work is a 64-lane integer multiply-add — SIMD-friendly in
    codegen, no doubles until never.  ``qdot`` is the exact integer score of
    the quantized vectors, so ranking ties are deterministic (broken by id).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            quantize_expr(query_emb_col, scale).alias("__qq__"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            quantize_expr(emb_col, scale).alias("__cq__"),
        )
        .crossJoin(q)
        .where(F.col("id") != F.col("query_id"))
        .withColumn("qdot", quantized_dot_expr("__qq__", "__cq__"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "qdot")
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "id",
    k: int = 5,
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one — the
    evaluation loop for tuning ANN parameters (planes/probes/centroids)
    without eyeballing result sets.

    recall_ppm = 1_000_000 * |exact ∩ approx| DIV |exact|, integer
    parts-per-million so the number is bit-identical across engines.  The
    denominator is the ACTUAL exact row count (not n_queries * k, which
    overstates it when a query's exact top-k is short — tiny corpus or
    self-exclusion), and both sides dedup on (query, id) first so a
    multi-probe ANN union cannot fan out the join and push recall past
    1.0.  One hash join over two k*|queries|-sized inputs — the expensive
    parts are the searches themselves, which callers run (and at scale,
    persist) independently."""
    marked = approx.select(query_col, id_col).distinct().withColumn(
        "__hit__", F.lit(1)
    )
    joined = exact.select(query_col, id_col).distinct().join(
        marked, [query_col, id_col], "left"
    )
    return (
        joined.groupBy()
        .agg(
            F.countDistinct(query_col).alias("n_queries"),
            F.count("*").alias("__n_exact__"),
            F.count("__hit__").alias("total_hits"),
        )
        .select(
            "n_queries",
            F.lit(int(k)).alias("k"),
            "total_hits",
            F.expr(
                "CAST(1000000 * total_hits DIV __n_exact__ AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    filter_col: str,
    query_id_col: str,
    query_emb_col: str,
    query_filter_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Metadata-filtered exact top-k by cosine: each query carries a filter
    value and only corpus rows whose ``filter_col`` matches are candidates
    (the "filtered vector search" production shape: per-tenant / per-lang /
    per-label retrieval).  Output: (query_id, id, rank, cosine); self-hits
    (id == query_id) are excluded.

    Scale shape: where :func:`brute_force_topk` must stream every query
    against the whole corpus (broadcast nested loop), the filter turns
    scoring into a broadcast HASH join on the filter key — each corpus row
    is probed once and only matching-filter pairs are ever scored, so cost
    is sum over filter values of |corpus_v| x |queries_v| instead of
    |corpus| x |queries|.  A partition-by-filter corpus layout additionally
    prunes the scan to the filter values present in the query batch."""
    from pyspark.sql import Window

    qf = query_filter_col or filter_col
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_emb_col).alias("__qemb__"),
            F.col(qf).alias("__qfilt__"),
            norm_expr(query_emb_col).alias("__qn__"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(emb_col).alias("__cemb__"),
            F.col(filter_col).alias("__qfilt__"),
            norm_expr(emb_col).alias("__cn__"),
        )
        .join(q, "__qfilt__")
        .where(F.col("id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot_expr("__qemb__", "__cemb__") / (F.col("__qn__") * F.col("__cn__")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "cosine")
    )
