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
from delta_sorter_spark.functions.localframe import local_df

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
    return local_df(corpus.sparkSession, 
        [(i, row["cvec"]) for i, row in enumerate(rows)],
        "centroid int, cvec array<double>",
    )


def _seed_winner_rows(
    corpus: DataFrame, id_col: str, emb_col: str, k: int
) -> list[tuple]:
    """The k ``(id, vec)`` winners by (id-hash asc, id asc) — the shared
    seeding order every trainer over this id space uses, as driver-side
    lists (collected doubles round-trip bit-exactly).  One
    TakeOrderedAndProject job; callers that train several quantizers over
    the SAME ids (coarse + PQ) collect this once and slice."""
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
    return [(row["__sid__"], list(row["cvec"])) for row in seeds.collect()]


def _packed_centroids_df(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """ONE-row local frame holding ``array<struct<centroid,cvec>>`` sorted by
    centroid id — the exact shape ``_assign``'s packed agg produces, minus
    the per-iteration aggregation job (guide §1.2: fewer jobs per Lloyd
    iteration; the values are the same doubles, so every distance computed
    against it is bit-identical)."""
    return local_df(spark, 
        [(sorted(cents),)],
        "__cents__ array<struct<centroid: int, cvec: array<double>>>",
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


def _kmeans_train(
    corpus: DataFrame,
    emb_col: str,
    dim: int,
    k: int = 16,
    n_iters: int = 2,
    id_col: str | None = None,
) -> tuple[list[tuple[int, list[float]]], list[tuple]]:
    """Driver-side Lloyd returning ``(final_cents, seed_winners)``:
    ``final_cents`` is the trained ``[(centroid, cvec), ...]`` list and
    ``seed_winners`` the ``[(id, vec), ...]`` seeding collect in (id-hash,
    id) order.  Callers that train a second quantizer over the SAME id
    space (the IVF-PQ builds: coarse + per-subspace codebooks) reuse the
    winners instead of re-running the TakeOrderedAndProject over the
    corpus — one fewer corpus job per build, identical seeds (guide
    §1.2)."""
    spark = corpus.sparkSession
    if id_col is None:
        seeds_src = corpus.select(
            F.expr(f"CAST({emb_col} AS STRING)").alias("__sid__"),
            F.col(emb_col).alias("__e__"),
        )
        winners = _seed_winner_rows(seeds_src, "__sid__", "__e__", k)
    else:
        winners = _seed_winner_rows(corpus, id_col, emb_col, k)
    cents = [(i, vec) for i, (_sid, vec) in enumerate(winners)]
    vecs = corpus.select(F.col(emb_col).alias("__v__"))
    # Centroid state lives on the DRIVER between iterations (k tiny rows):
    # one Lloyd iteration is ONE corpus job (broadcast-assign -> quantized
    # per-(centroid,pos) means -> collect).  The per-element means are
    # computed by the exact same Spark aggregation as before — only the
    # array re-assembly and the empty-cluster coalesce (no float
    # arithmetic) moved to the driver, so centroids stay bit-identical
    # while the per-iteration localCheckpoint job, the old-vs-new join and
    # the collect_list re-assembly shuffle disappear (guide §1.2, §2.4).
    dist = (
        "aggregate(zip_with(__v__, c.cvec, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    scored = f"transform(__cents__, c -> struct({dist} AS d, c.centroid AS centroid))"
    for _ in range(n_iters):
        packed = _packed_centroids_df(spark, cents)
        assigned = (
            vecs.crossJoin(F.broadcast(packed))
            .withColumn("centroid", F.expr(f"array_min({scored}).centroid"))
            .drop("__cents__")
        )
        # exact mean: quantize -> BIGINT sum (associative) -> ONE division
        mean_rows = (
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
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cent.setdefault(r["centroid"], {})[r["pos"]] = r["m"]
        # centroids with no assigned vectors keep their previous position
        cents = [
            (c, [vals[p] for p in sorted(vals)] if (vals := by_cent.get(c)) else old)
            for c, old in cents
        ]
    return cents, winners


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
    cents, _ = _kmeans_train(corpus, emb_col, dim, k, n_iters, id_col)
    return local_df(
        corpus.sparkSession, cents, "centroid int, cvec array<double>"
    )


def _residual_winner_vecs(
    winners: list[tuple], cents: list[tuple[int, list[float]]]
) -> list[list[float]]:
    """The seed winners' RESIDUAL vectors, computed driver-side with the
    exact ``_assign`` semantics: squared-L2 as a left-to-right IEEE fold
    over ``(x - y)^2`` (the same order ``aggregate(zip_with(...))``
    evaluates), distance ties broken to the smaller centroid id (the
    ``array_min`` over ``struct(d, centroid)``), then the element-wise
    subtraction ``zip_with(x, cvec, x - y)``.  Python float arithmetic IS
    IEEE double arithmetic, so each residual is bit-identical to
    collecting it from the residual frame — which saves the residual
    paths one TakeOrderedAndProject corpus job (guide §1.2)."""
    ordered = sorted(cents)
    out = []
    for _sid, v in winners:
        best_d = best_cv = None
        for _cid, cv in ordered:
            d = 0.0
            for x, y in zip(v, cv):
                t = x - y
                d += t * t
            if best_d is None or d < best_d:
                best_d, best_cv = d, cv
        out.append([x - y for x, y in zip(v, best_cv)])
    return out


def _normalize_expr(emb_col: str) -> str:
    """L2-normalize an array<double> column: PQ's ADC ranks by squared L2,
    and on the unit sphere ``d2 = 2 - 2*cos`` makes that ordering identical
    to cosine — without it, ADC top-k and cosine top-k diverge arbitrarily
    on unnormalized vectors (measured recall 0.0 on the random test
    corpus).  One fold for the norm, one transform for the division."""
    ssq = (
        f"aggregate(transform({emb_col}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return f"transform({emb_col}, x -> CAST(x AS DOUBLE) / sqrt({ssq}))"


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    dim: int,
    m: int = 2,
    n_codes: int = 8,
    n_iters: int = 2,
    normalize: bool = True,
    extra_cols: tuple = (),
    winner_vecs: list | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """Product quantization (Jégou, Douze, Schmid 2011) index build: split
    each ``dim``-vector into ``m`` subvectors, train an independent
    ``n_codes``-word codebook per subspace (the same deterministic
    integer-quantized k-means as the IVF coarse quantizer, so the codebooks
    are bit-reproducible in any engine), and encode every corpus vector as
    its per-subspace nearest-codeword ids.

    Returns ``(codes, codebooks)``: ``codes`` is (id, code_0..code_{m-1})
    and ``codebooks`` one (centroid, cvec) frame per subspace.
    ``extra_cols`` ride the encode unchanged (map-side carry — they save
    the caller an id-keyed re-attach join, guide §8; the training loop
    never sees them thanks to column pruning).

    At 100 TB this is the ANN **memory** scale path: a dim-d float corpus
    (4d bytes/vector) compresses to m small ints — the codes column plus
    m*n_codes codewords is all a serving tier loads, and the encode itself
    is zero-shuffle (broadcast argmin per subspace, each corpus row touched
    once)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    spark = corpus.sparkSession
    emb_expr = _normalize_expr(emb_col) if normalize else emb_col
    base = corpus.select(
        F.col(id_col).alias("__sid__"),
        F.expr(emb_expr).alias("__v__"),
        *[F.col(c) for c in extra_cols],
    )

    # Seeds: ALL subspaces share the same k winner rows (smallest id-hash),
    # each sliced per subspace — one TakeOrderedAndProject job total,
    # identical to running _seed_centroids per subspace.  ``winner_vecs``
    # skips even that job: a caller whose coarse quantizer already
    # collected the winners over the SAME id space passes their ``__v__``
    # values (in the shared (id-hash, id) order — a prefix property, since
    # both seedings sort by the same hash of the same ids), so IVF-PQ
    # builds seed both quantizers from ONE corpus job (guide §1.2).
    if winner_vecs is not None and len(winner_vecs) >= n_codes:
        seed_vecs = [list(v) for v in winner_vecs[:n_codes]]
    else:
        h = F.expr(
            f"{spark_md5_long_sql('CAST(__sid__ AS STRING)')} % {MERSENNE_P}"
        )
        seed_vecs = [
            list(row["__v__"])
            for row in (
                base.select("__sid__", "__v__", h.alias("__h__"))
                .orderBy(F.col("__h__").asc(), F.col("__sid__").asc())
                .limit(n_codes)
                .collect()
            )
        ]
    cent_rows = [
        (j, i, [float(x) for x in v[j * dsub : (j + 1) * dsub]])
        for j in range(m)
        for i, v in enumerate(seed_vecs)
    ]

    # Joint Lloyd iterations: one packed broadcast carries every subspace's
    # codebook, assignment is a map-side array_min per subspace (same
    # struct(d, centroid) tie-break as _assign), and ONE aggregation
    # computes every subspace's integer-quantized means — so an iteration
    # costs one job regardless of m (the sequential per-subspace form paid
    # m x the fixed job overheads; measured 24 s -> this at sf0.1).
    # Codebook state lives on the DRIVER between iterations (m*n_codes tiny
    # rows, same discipline as kmeans_centroids): the per-element means are
    # still computed by the identical Spark aggregation, only array
    # re-assembly and the empty-cluster coalesce (no float arithmetic)
    # happen driver-side — the per-iteration localCheckpoint job, old-vs-new
    # join and collect_list shuffle disappear (guide §1.2, §2.4).
    dist = (
        "aggregate(zip_with(slice(__v__, c.m * {dsub} + 1, {dsub}), c.cvec,"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0 AS DOUBLE), (acc, vv) -> acc + vv)"
    ).format(dsub=dsub)
    codes_arr = (
        f"transform(sequence(0, {m - 1}), j ->"
        f" array_min(transform(filter(__cents__, c -> c.m = j),"
        f" c -> struct({dist} AS d, c.centroid AS centroid))).centroid)"
    )

    def packed_df(rows: list[tuple[int, int, list[float]]]) -> DataFrame:
        # one-row array<struct<m,centroid,cvec>> pre-sorted by (m, centroid)
        # — the shape the collect_list+sort_array agg built, minus the job
        return local_df(spark, 
            [(sorted(rows, key=lambda r: (r[0], r[1])),)],
            "__cents__ array<struct<m: int, centroid: int, cvec: array<double>>>",
        )

    def assign_codes(df: DataFrame, rows) -> DataFrame:
        return df.crossJoin(F.broadcast(packed_df(rows))).withColumn(
            "__codes__", F.expr(codes_arr)
        ).drop("__cents__")

    mean_rows = (
        f"flatten(transform(sequence(0, {m - 1}), j ->"
        f" transform(sequence(1, {dsub}), p -> struct("
        f" j AS m, element_at(__codes__, j + 1) AS centroid, p AS pos,"
        f" element_at(__v__, j * {dsub} + p) AS val))))"
    )
    for _ in range(n_iters):
        assigned = assign_codes(base, cent_rows)
        means = (
            assigned.select(F.explode(F.expr(mean_rows)).alias("__e__"))
            .select("__e__.m", "__e__.centroid", "__e__.pos", "__e__.val")
            .groupBy("m", "centroid", "pos")
            .agg(
                (
                    F.sum(
                        F.expr(
                            f"CAST(floor(CAST(val AS DOUBLE) * {MEAN_QSCALE}) AS BIGINT)"
                        )
                    ).cast("double")
                    / (F.count("*") * F.lit(MEAN_QSCALE)).cast("double")
                ).alias("mn")
            )
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((r["m"], r["centroid"]), {})[r["pos"]] = r["mn"]
        cent_rows = [
            (
                j,
                c,
                [vals[p] for p in sorted(vals)]
                if (vals := by_key.get((j, c)))
                else old,
            )
            for j, c, old in cent_rows
        ]

    codes = assign_codes(
        base.select(
            F.col("__sid__").alias("id"),
            F.col("__v__"),
            *[F.col(c) for c in extra_cols],
        ),
        cent_rows,
    ).withColumnRenamed("__v__", "__cemb__")
    for j in range(m):
        codes = codes.withColumn(f"code_{j}", F.expr(f"element_at(__codes__, {j + 1})"))
    codes = codes.drop("__codes__")
    codebooks = [
        local_df(spark, 
            [(c, v) for mm, c, v in cent_rows if mm == j],
            "centroid int, cvec array<double>",
        )
        for j in range(m)
    ]
    return codes, codebooks


def pq_assign(
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    codebooks,
    dim: int,
    normalize: bool = True,
    extra_cols: tuple = (),
) -> DataFrame:
    """Encode a corpus against FROZEN codebooks (:func:`pq_encode` output,
    or per-subspace (centroid, cvec) frames read back from a persisted
    index) — the incremental-maintenance half of PQ: newly appended rows
    get codes without retraining, so a refresh costs O(new rows) with the
    packed codebooks broadcast (zero shuffle).  Same argmin/tie-break as
    training, so re-encoding an unchanged row reproduces its code
    bit-for-bit.  Output matches ``pq_encode``'s codes frame:
    (id, __cemb__, code_0..code_{m-1}); ``extra_cols`` ride along map-side
    (saves the caller an id-keyed re-attach join, guide §8)."""
    m = len(codebooks)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    emb_expr = _normalize_expr(emb_col) if normalize else emb_col
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(emb_expr).alias("__cemb__"),
        *[F.col(c) for c in extra_cols],
    )
    tagged = None
    for j, cb in enumerate(codebooks):
        part = cb.select(
            F.lit(j).alias("m"), F.col("centroid"), F.col("cvec")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    packed = tagged.agg(
        F.expr("sort_array(collect_list(struct(m, centroid, cvec)))").alias(
            "__cents__"
        )
    )
    dist = (
        "aggregate(zip_with(slice(__cemb__, c.m * {dsub} + 1, {dsub}), c.cvec,"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0 AS DOUBLE), (acc, vv) -> acc + vv)"
    ).format(dsub=dsub)
    codes_arr = (
        f"transform(sequence(0, {m - 1}), j ->"
        f" array_min(transform(filter(__cents__, c -> c.m = j),"
        f" c -> struct({dist} AS d, c.centroid AS centroid))).centroid)"
    )
    out = (
        base.crossJoin(F.broadcast(packed))
        .withColumn("__codes__", F.expr(codes_arr))
        .drop("__cents__")
    )
    for j in range(m):
        out = out.withColumn(
            f"code_{j}", F.expr(f"element_at(__codes__, {j + 1})")
        )
    return out.drop("__codes__")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    m: int = 2,
    n_codes: int = 8,
    n_iters: int = 2,
    normalize: bool = True,
    rerank: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a product-quantized corpus:
    each query precomputes an ``m x n_codes`` table of exact squared-L2
    distances to every codeword; a corpus row's approximate distance is
    then ``m`` table lookups + adds, independent of ``dim``.

    ``normalize`` (default) L2-normalizes corpus and queries first, so the
    ADC ordering approximates COSINE ordering (d2 = 2 - 2*cos on the unit
    sphere); set False for a true-L2 search.

    ``rerank`` enables the production two-stage shape: shortlist the
    ``rerank`` nearest rows by ADC, then order the final top-k by EXACT
    cosine.  Pure ADC cannot break ties between rows that quantize to the
    same code tuple (e.g. a tight cluster collapses to one codeword per
    subspace), so rank@k against an exact baseline is poor even when every
    retrieved row is a good neighbor — the rerank stage pays m lookups for
    the corpus and dim-float ops only for the shortlist.

    Output: (query_id, id, rank, approx_d, cosine) — rank by ascending ADC
    distance (ties to the smaller id), or by descending exact cosine when
    ``rerank`` is set; the EXACT cosine rides along either way so recall
    telemetry is free.

    Scale shape: the query side (tables included) broadcasts like
    brute_force_topk — the corpus never shuffles for scoring, and per-pair
    cost drops from O(dim) float ops to m integer lookups; the final
    per-query top-k is the only exchange (O(candidates))."""
    codes, codebooks = pq_encode(
        corpus, id_col, emb_col, dim, m, n_codes, n_iters, normalize=normalize
    )
    return pq_serve(
        codes,
        codebooks,
        queries,
        query_id_col,
        query_emb_col,
        dim,
        k=k,
        normalize=normalize,
        rerank=rerank,
    )


def adc_query_tables(
    queries: DataFrame,
    query_id_col: str,
    query_emb_col: str,
    codebooks: list[DataFrame],
    dim: int,
    normalize: bool = True,
    extra_cols: tuple = (),
) -> DataFrame:
    """(query_id, __qemb__, __dtab0__..__dtab{m-1}__): per query the m ADC
    distance tables (squared-L2 of its subvector to every codeword), via m
    one-row packed-codebook broadcasts.  Shared by the flat and probed
    serving paths so their scoring can never diverge."""
    m = len(codebooks)
    dsub = dim // m
    q_expr = _normalize_expr(query_emb_col) if normalize else query_emb_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(q_expr).alias("__qemb__"),
        *[F.col(c) for c in extra_cols],
    )
    # ONE packed broadcast carries every subspace's codebook (the previous
    # per-subspace loop paid m broadcast-exchange jobs per serve call —
    # guide §2.4).  sort_array over (m, centroid) structs keeps each
    # subspace's codewords in the same centroid-ascending order the
    # per-codebook agg produced, so every __dtab{j}__ value is unchanged.
    tagged = None
    for j, cb in enumerate(codebooks):
        part = cb.select(F.lit(j).alias("m"), F.col("centroid"), F.col("cvec"))
        tagged = part if tagged is None else tagged.unionByName(part)
    packed = tagged.agg(
        F.expr("sort_array(collect_list(struct(m, centroid, cvec)))").alias("__cbs__")
    )
    q = q.crossJoin(F.broadcast(packed))
    for j in range(m):
        sub = f"slice(__qemb__, {j * dsub + 1}, {dsub})"
        dist_tab = (
            f"transform(transform(filter(__cbs__, s -> s.m = {j}), s -> s.cvec),"
            f" cv -> aggregate(zip_with({sub}, cv,"
            f" (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            f" CAST(0 AS DOUBLE), (acc, vv) -> acc + vv))"
        )
        q = q.withColumn(f"__dtab{j}__", F.expr(dist_tab))
    return q.drop("__cbs__")


def adc_shortlist(
    pairs: DataFrame, m: int, k: int, rerank: int | None
) -> DataFrame:
    """ADC-only shortlist over candidate (code row × query) pairs: the top
    ``max(rerank, k)`` (or ``k``) rows per query by ADC distance, WITHOUT
    exact cosine — the codes-width half of serving.  Same ADC expression
    and (approx_d asc, id asc) tie-break as :func:`adc_rank_pairs`, so a
    caller that fetches original vectors for the shortlist and computes
    the exact cosine afterwards (operators/ann_index.ann_topk) ranks
    identically to the in-memory paths — but the candidate scan never
    touches an embedding column (m ints vs dim doubles per row).

    Keeps every non-table input column (``path``, ``__qemb__``, …) so the
    caller can prune the fetch to the shortlist's files."""
    adc = " + ".join(f"element_at(__dtab{j}__, code_{j} + 1)" for j in range(m))
    pairs = (
        pairs.where(F.col("id") != F.col("query_id"))
        .withColumn("approx_d", F.expr(adc))
        # once approx_d exists the distance tables and code columns are
        # dead weight: drop them BEFORE the per-query top-n exchange so the
        # shuffle carries (query_id, id, approx_d, carried cols) instead of
        # m code ints + m*n_codes doubles per candidate row (guide §2.3 —
        # project before the exchange)
        .drop(*[f"__dtab{j}__" for j in range(m)], *[f"code_{j}" for j in range(m)])
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d"), F.asc("id"))
    n = k if rerank is None else max(rerank, k)
    return (
        pairs.withColumn("__adc_rank__", F.row_number().over(w))
        .where(F.col("__adc_rank__") <= n)
    )


def adc_rank_pairs(
    pairs: DataFrame, m: int, k: int, rerank: int | None
) -> DataFrame:
    """Score candidate (code row × query) pairs by ADC lookups and rank
    top-k per query — the shared tail of every PQ serving path (same
    tie-breaks and ``max(rerank, k)`` shortlist rule everywhere)."""
    adc = " + ".join(f"element_at(__dtab{j}__, code_{j} + 1)" for j in range(m))
    pairs = (
        pairs.where(F.col("id") != F.col("query_id"))
        .withColumn("approx_d", F.expr(adc))
        # project the distance tables and code columns out before the
        # per-query top-n exchange (guide §2.3): only approx_d survives them
        .drop(*[f"__dtab{j}__" for j in range(m)], *[f"code_{j}" for j in range(m)])
    )
    # exact cosine is computed AFTER the ADC shortlist filter, never on the
    # full candidate set: the shortlist ranks purely by (approx_d, id), so
    # deferring the O(dim) fold from O(candidates) to O(shortlist) rows
    # changes no value anywhere (guide §1.2 — don't compute what you throw
    # away; this is the ADC contract: candidates cost m lookups, only
    # survivors touch the embeddings)
    cos = cosine_expr("__qemb__", "__cemb__")
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d"), F.asc("id"))
    if rerank is None:
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .withColumn("cosine", cos)
            .select("query_id", "id", "rank", "approx_d", "cosine")
        )
    shortlist = (
        pairs.withColumn("__adc_rank__", F.row_number().over(w))
        .where(F.col("__adc_rank__") <= max(rerank, k))
        .withColumn("cosine", cos)
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "approx_d", "cosine")
    )


def pq_serve(
    codes: DataFrame,
    codebooks: list[DataFrame],
    queries: DataFrame,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    normalize: bool = True,
    rerank: int | None = None,
) -> DataFrame:
    """Query-time half of :func:`pq_topk`, taking a PREBUILT index (the
    ``(codes, codebooks)`` pair from :func:`pq_encode`, typically persisted
    once per corpus version) — the production serving shape: the corpus is
    never re-encoded per batch, only the ADC tables and lookups run."""
    q = adc_query_tables(
        queries, query_id_col, query_emb_col, codebooks, dim, normalize
    )
    return adc_rank_pairs(
        codes.crossJoin(F.broadcast(q)), len(codebooks), k, rerank
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    m: int = 2,
    n_codes: int = 8,
    n_centroids: int = 16,
    n_probes: int = 2,
    n_iters: int = 2,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ composed search — the full production ANN shape: a coarse
    k-means quantizer restricts each query to its ``n_probes`` nearest
    inverted lists, and WITHIN those lists scoring is PQ's ADC lookup
    (m table hits per candidate instead of dim float ops).  Both stages
    reuse the deterministic integer-quantized k-means, and everything is
    L2-normalized so distance order == cosine order.

    (This is the no-residual variant: codes quantize the vectors
    themselves, not ``x - coarse_centroid`` — simpler, oracle-replayable,
    and the list restriction still provides the candidate pruning; classic
    residual encoding is a drop-in refinement inside ``pq_encode``.)

    Output: (query_id, id, rank, approx_d, cosine) — as :func:`pq_topk`,
    with ``rerank`` enabling the exact-rerank shortlist.

    Scale shape: corpus-side work is zero-shuffle (broadcast argmin coarse
    assignment + broadcast argmin codes, each row touched once); the
    centroid equi-join scans only the probed lists (|corpus| x probes /
    n_centroids candidates in expectation); per-candidate cost is m
    lookups.  At 100 TB the codes+centroid frame is the persisted index —
    partition it by ``centroid`` and a probe prunes files too."""
    emb_expr = _normalize_expr(emb_col)
    q_expr = _normalize_expr(query_emb_col)
    normed = corpus.select(
        F.col(id_col).alias("__nid__"), F.expr(emb_expr).alias("__nemb__")
    )
    cents, winners = _kmeans_train(
        normed, "__nemb__", dim, n_centroids, n_iters, id_col="__nid__"
    )
    coarse = local_df(
        normed.sparkSession, cents, "centroid int, cvec array<double>"
    )
    # corpus index: coarse list id + PQ codes (normalize=False — already
    # unit); the PQ seeds reuse the coarse seeding collect (same ids, same
    # hash order — one fewer corpus job, guide §1.2)
    codes, codebooks = pq_encode(
        normed, "__nid__", "__nemb__", dim, m, n_codes, n_iters,
        normalize=False, winner_vecs=[v for _sid, v in winners],
    )
    listed = _assign(
        codes.withColumnRenamed("id", "__cid__"), coarse, "__cemb__"
    ).withColumnRenamed("__cid__", "id")
    # query side: probes + ADC distance tables (ONE packed broadcast for
    # all m codebooks via adc_query_tables — same exprs, fewer jobs)
    q = adc_query_tables(
        _assign(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.expr(q_expr).alias("__qemb__"),
            ),
            coarse,
            "__qemb__",
            n_best=n_probes,
        ),
        "query_id",
        "__qemb__",
        codebooks,
        dim,
        normalize=False,
        extra_cols=("centroid",),
    )
    adc = " + ".join(f"element_at(__dtab{j}__, code_{j} + 1)" for j in range(m))
    # the query side is (queries x probes) rows — broadcast it so the
    # corpus-scale codes are NEVER shuffled by centroid (guide §3.1: the
    # planner's size estimate after the probe assignment is unknown, so it
    # fell back to a sort-merge join that exchanged the whole codes side)
    pairs = (
        listed.join(F.broadcast(q), "centroid")
        .where(F.col("id") != F.col("query_id"))
        .withColumn("approx_d", F.expr(adc))
        .withColumn("cosine", cosine_expr("__qemb__", "__cemb__"))
        # no dedup needed: each corpus row lives in exactly ONE list, so a
        # (query, id) pair can only match through one probe
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d"), F.asc("id"))
    if rerank is None:
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "id", "rank", "approx_d", "cosine")
        )
    shortlist = pairs.withColumn("__adc_rank__", F.row_number().over(w)).where(
        F.col("__adc_rank__") <= max(rerank, k)
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "approx_d", "cosine")
    )


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
    # broadcast the (queries x probes) side: the corpus stays un-shuffled
    # (guide §3.1) — the per-query top-k window is then the only exchange
    scored = (
        c.join(F.broadcast(q), "centroid")
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


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    emb_col: str,
    query_id_col: str,
    query_emb_col: str,
    dim: int,
    k: int = 5,
    m: int = 2,
    n_codes: int = 8,
    n_centroids: int = 16,
    n_probes: int = 2,
    n_iters: int = 2,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding (the classic Jégou et al. 2011 form;
    :func:`ivfpq_topk` is the simpler no-residual variant): PQ codebooks
    are trained on, and codes quantize, ``x - coarse_centroid(x)`` —
    residuals cluster far tighter than raw vectors, so the same code
    budget buys finer distances.  The query side mirrors it: each probe
    scores its list's candidates with ADC tables built from THAT probe's
    residual ``q - centroid``, so the query frame carries one table set
    per (query, probe) — query-batch scale, never corpus scale.

    Deterministic end to end: residual subtraction is exact IEEE, the
    subspace k-means runs the same integer-quantized means over residual
    vectors, seeds come from id hashes (value-independent) — so the whole
    pipeline replays relationally (oracle e82).  Exact cosine (and the
    optional rerank) uses the ORIGINAL vectors, not residuals.

    Scale shape matches :func:`ivfpq_topk`: corpus-side work zero-shuffle
    (broadcast coarse assign + broadcast residual encode, corpus read
    once into a RESIDUAL-WIDTH checkpointed frame — ids, list id and one
    dim-vector per row, never the originals), candidates restricted by
    the centroid equi-join, and the per-query top-n exchange carrying
    ``(query_id, id, approx_d)`` only; original vectors are fetched for
    the queries x max(rerank, k) shortlist alone, the registered-index
    serving discipline (operators/ann_index._exact_rank)."""
    emb_expr = _normalize_expr(emb_col)
    q_expr = _normalize_expr(query_emb_col)
    normed = corpus.select(
        F.col(id_col).alias("__nid__"), F.expr(emb_expr).alias("__nemb__")
    )
    # _kmeans_train keeps centroid state on the driver, so `coarse` is a
    # LOCAL Arrow frame — no localCheckpoint (pinning driver-local data
    # cost a pointless Spark job), and the seeding collect is reused for
    # the PQ codebook seeds below (guide §1.2: fewer jobs)
    cents, winners = _kmeans_train(
        normed, "__nemb__", dim, n_centroids, n_iters, id_col="__nid__"
    )
    coarse = local_df(
        normed.sparkSession, cents, "centroid int, cvec array<double>"
    )
    sub = "zip_with(__nemb__, cvec, (x, y) -> CAST(x AS DOUBLE) - y)"
    # RESIDUAL-WIDTH checkpoint (r10, guide §5): the one corpus pass that
    # feeds train + encode pins (id, centroid, residual) only — the
    # original vectors are NOT carried (the r9 shape pinned 2 x dim
    # doubles per row); exact cosine re-reads them for the SHORTLIST
    # below, the registered-index discipline (ann_index._exact_rank)
    residuals = (
        _assign(normed, coarse, "__nemb__")
        .join(F.broadcast(coarse), "centroid")
        .select("__nid__", "centroid", F.expr(sub).alias("__res__"))
        .localCheckpoint(eager=True)
    )
    # the list id (probe join) rides the encode map-side — no id-keyed
    # re-attach join (guide §8)
    # PQ seeds: the winners' residuals, computed driver-side from the
    # final coarse centroids with the exact _assign fold — skips the
    # residual frame's TakeOrderedAndProject seeding job (guide §1.2)
    codes, codebooks = pq_encode(
        residuals, "__nid__", "__res__", dim, m, n_codes, n_iters,
        normalize=False, extra_cols=("centroid",),
        winner_vecs=_residual_winner_vecs(winners, cents),
    )
    codes = codes.drop("__cemb__")
    probed = (
        _assign(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.expr(q_expr).alias("__qorig__"),
            ),
            coarse,
            "__qorig__",
            n_best=n_probes,
        )
        .join(F.broadcast(coarse), "centroid")
        .select(
            "query_id", "centroid",
            F.expr(
                "zip_with(__qorig__, cvec, (x, y) -> CAST(x AS DOUBLE) - y)"
            ).alias("__qres__"),
        )
    )
    q = adc_query_tables(
        probed, "query_id", "__qres__", codebooks, dim, normalize=False,
        extra_cols=("centroid",),
    ).drop("__qemb__")
    # broadcast the (queries x probes) side so the corpus-scale codes are
    # never shuffled by centroid (guide §3.1); the candidate top-n
    # exchange then carries (query_id, id, approx_d) ONLY — no dim-wide
    # vector columns (guide §2.3, project before the exchange)
    shortlist = adc_shortlist(
        codes.join(F.broadcast(q), "centroid"), m, k, rerank
    ).select("query_id", "id", "approx_d", "__adc_rank__")
    # exact cosine on shortlist survivors only: re-attach the NORMALIZED
    # original vectors (the same deterministic exprs the r9 shape carried
    # through the pipeline, so every cosine is bit-identical) — the
    # shortlist is queries x max(rerank, k) rows, so it broadcasts and
    # neither corpus nor query frame is shuffled for the fetch
    corp_vec = corpus.select(
        F.col(id_col).alias("id"), F.expr(emb_expr).alias("__cemb__")
    )
    qry_vec = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(q_expr).alias("__qemb__"),
    )
    scored = (
        F.broadcast(shortlist)
        .join(corp_vec, "id")
        .join(F.broadcast(qry_vec), "query_id")
        .withColumn("cosine", cosine_expr("__qemb__", "__cemb__"))
    )
    if rerank is None:
        return scored.select(
            "query_id", "id", F.col("__adc_rank__").alias("rank"),
            "approx_d", "cosine",
        )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "approx_d", "cosine")
    )
