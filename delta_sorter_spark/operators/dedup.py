"""Deduplication operators (north-star E1/E2, SURVEY §2.8).

All operators are DataFrame -> DataFrame transforms with no driver-side
materialization, designed for the 100 TB profile:

- **exact_dedup**: one hash-shuffle on the dedup keys; AQE handles skew.
  Keep-first semantics via min-tiebreak aggregation (not row_number) so the
  shuffle carries pre-aggregated partials (map-side combine).
- **content_hash_dedup**: canonical sha256 over selected columns, then exact
  dedup on the digest — the standard way to dedup wide rows without
  shuffling full payloads: project digest + tiebreak first, join survivors
  back if the full row is needed.
- **minhash_signatures / minhash_lsh_candidates**: shingle -> 60-bit md5
  hash -> k affine permutations -> per-doc min (map-side combinable) ->
  band -> bucket self-join on (band, band-signature).  The self-join is the
  only shuffle that grows with candidate density; banding keeps buckets
  small so the join stays local.  Hashing is portable (functions.hashing) so
  the DuckDB oracle reproduces signatures bit-for-bit.
- **simhash**: token hash sign-sums per bit position — one explode + one
  groupBy, fully JVM-side.
- **ngram_jaccard_pairs**: exact n-gram Jaccard via shingle self-join;
  quadratic in co-bucketed docs, meant for verification of candidate pairs
  (e.g. LSH output), not as the 100 TB primary path.
- **embedding_near_dup**: sign-LSH bucket join + exact cosine verify.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    spark_md5_long_sql,
)

# Production default for the LSH skew guard (``max_bucket``): a band bucket
# with 10k members means ~50M candidate pairs from that bucket alone — at
# that size the members are near-identical as a group and belong in
# exact/content-hash dedup or band-key clustering, not pair enumeration.
# Real near-dup buckets are orders of magnitude smaller, so the default cap
# never changes a legitimate workload's (oracle-exact) pair set.
LSH_MAX_BUCKET_DEFAULT = 10_000

# ---------------------------------------------------------------------------
# E1: exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, keys: Sequence[str], tiebreak: str) -> DataFrame:
    """Keep, per distinct key tuple, the row with the smallest ``tiebreak``
    value.  Implemented as min_by-style aggregation: partial aggregation
    happens map-side before the shuffle, unlike a row_number window which
    shuffles every row."""
    others = [c for c in df.columns if c not in keys]
    agg = [F.min_by(F.struct(*[F.col(c) for c in others]), F.col(tiebreak)).alias("__rest__")]
    out = df.groupBy(*[F.col(k) for k in keys]).agg(*agg)
    return out.select(*keys, *[F.col(f"__rest__.{c}").alias(c) for c in others])


def content_hash_dedup(df: DataFrame, cols: Sequence[str], tiebreak: str) -> DataFrame:
    """Exact content dedup via sha256 of the canonicalized selected columns
    (E1's content variant: F.sha2(to_json(struct(...))))."""
    digest = F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256).alias("__digest__")
    with_digest = df.withColumn("__digest__", digest)
    kept = exact_dedup(with_digest, ["__digest__"], tiebreak)
    return kept.drop("__digest__")


# ---------------------------------------------------------------------------
# shingling / tokenizing expressions (shared, JVM-side)
# ---------------------------------------------------------------------------


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text (JVM-side
    transform/sequence; no UDF).  Short texts yield the whole text.

    ``lower(text)`` is let-bound through a one-element ``transform`` so it
    evaluates once per row — referenced directly inside the per-position
    lambda it would re-lowercase the whole text PER POSITION (O(len²)
    chars; this halved e2's sf0.1 scan)."""
    return F.expr(
        f"array_distinct(element_at(transform(array(lower({text_col})),"
        f" t -> transform(sequence(1, greatest(1, length(t) - {n - 1})),"
        f" i -> substring(t, i, {n}))), 1))"
    )


def tokens_expr(text_col: str) -> Column:
    return F.expr(f"split(lower(trim({text_col})), '\\\\s+')")


def md5_long(col: Column | str) -> Column:
    """Portable 60-bit hash (see functions.hashing docstring)."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("md5_long needs a column name or SQL expression string")
    return F.expr(spark_md5_long_sql(name))


# ---------------------------------------------------------------------------
# E2: MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash_0..minhash_{k-1}) — deterministic, oracle-reproducible.

    Pipeline: explode distinct shingles -> portable md5 hash -> k affine
    permutations -> groupBy(id).min per permutation.  min() partials combine
    map-side, so the shuffle is one row per (doc, k) regardless of text
    size."""
    params = minhash_params(k, seed)
    sh = df.select(
        F.col(id_col), F.explode(shingles_expr(text_col, shingle_n)).alias("__shingle__")
    )
    h = sh.withColumn("__h__", F.expr(spark_md5_long_sql("__shingle__")) % F.lit(MERSENNE_P))
    aggs = [
        F.min((F.lit(a) * F.col("__h__") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"minhash_{j}")
        for j, (a, b) in enumerate(params)
    ]
    return h.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share at least one
    LSH band.  k/bands rows per band; docs agreeing on every minhash within
    any band collide.  ``max_bucket`` is the production skew guard — see
    ``lsh_pairs_from_signatures``."""
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_n, seed)
    return lsh_pairs_from_signatures(sigs, id_col, k, bands, max_bucket)


def _banded_signatures(sigs: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """(id, __band__) — one struct row per LSH band of each signature."""
    assert k % bands == 0, "k must divide into equal bands"
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), *[c.alias(f"m{r}") for r, c in enumerate(cols)])
        )
    return sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("__band__"))


def lsh_pairs_from_signatures(
    sigs: DataFrame, id_col: str, k: int, bands: int,
    max_bucket: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Banded self-join over an EXISTING signature table — callers that
    already hold (or persisted) signatures avoid recomputing the shingle
    explode, which at corpus scale is the dominant cost.

    ``max_bucket``: skip buckets with more than this many members — the
    skew guard for degenerate corpora (a boilerplate page mirrored across
    ten thousand hosts puts 10k ids in one band bucket, and the self-join
    inside it is 50M pairs PER BAND).  Members of an oversized bucket
    share an entire band of minhashes, i.e. they are near-identical as a
    GROUP; route them through exact/content-hash dedup or cluster them by
    the band key directly instead of enumerating every pair.  Capping
    loses pair-level recall ONLY inside those buckets, so the DEFAULT
    (``LSH_MAX_BUCKET_DEFAULT``) is the production posture: any corpus
    whose buckets stay under the cap — every legitimate near-dup workload
    — gets the exhaustive, oracle-exact pair set, while a duplicate army
    can never detonate the self-join.  Pass ``None`` for explicitly
    unbounded enumeration.  The guard's count aggregation shuffles on the
    same band key as the self-join, so AQE reuses the exchange."""
    banded = _banded_signatures(sigs, id_col, k, bands)
    if max_bucket is not None:
        small = (
            banded.groupBy("__band__")
            .agg(F.count("*").alias("__n__"))
            .where(F.col("__n__") <= max_bucket)
            .select("__band__")
        )
        banded = banded.join(small, "__band__")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=(F.col("a.__band__") == F.col("b.__band__")))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate decontamination ACROSS datasets: MinHash+LSH
    candidates between a training corpus and an evaluation benchmark — the
    fuzzy complement to :func:`decontaminate`'s exact n-gram overlap, which
    paraphrased or lightly-edited leakage slips past.

    Defaults band WIDER than dedup LSH (4 bands of 2 rows, not 2 of 4):
    for decontamination a missed leak costs far more than an extra
    candidate to verify, so the curve is tuned for recall.

    Output: (corpus_id, bench_id) candidate pairs (identical ids excluded
    for overlapping inputs); verify candidates with
    :func:`ngram_jaccard_pairs`-style exact scoring or route them to
    review.  Scale shape: the benchmark is eval-suite-sized so its banded
    signatures BROADCAST; the corpus signatures stream past map-side —
    corpus text never shuffles, exactly like the exact-overlap operator."""
    cs = _banded_signatures(
        minhash_signatures(corpus, id_col, text_col, k, shingle_n, seed),
        id_col, k, bands,
    ).select(F.col(id_col).alias("corpus_id"), "__band__")
    bs = _banded_signatures(
        minhash_signatures(benchmark, id_col, text_col, k, shingle_n, seed),
        id_col, k, bands,
    ).select(F.col(id_col).alias("bench_id"), "__band__")
    return (
        cs.join(F.broadcast(bs), "__band__")
        .where(F.col("corpus_id") != F.col("bench_id"))
        .select("corpus_id", "bench_id")
        .distinct()
    )


def minhash_estimate_vs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    seed: int = 42,
    sigs: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Sketch-accuracy audit: for each LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of agreeing signature components) next to
    the EXACT shingle Jaccard.  Output: (id_a, id_b, n_match, est_jaccard,
    jaccard).

    This is the measurement loop a production dedup pipeline needs when
    tuning k/bands: estimate error is observable without ever running the
    quadratic exact join — the exact side here is computed ONLY for the
    banded candidates (same verify-on-candidates shape as e40's edit
    distance), so the cost is |candidates| x shingles, never corpus^2.

    ``sigs`` / ``shingles`` inject precomputed inputs so a production run
    serves from PERSISTED state instead of re-deriving from raw text (the
    same injection contract as :func:`lsh_pairs_from_signatures`):
    ``sigs`` is the output of :func:`minhash_signatures` (or a
    ``.persist()`` of it), ``shingles`` a (``id_col``, ``shingle``) frame
    matching ``explode(shingles_expr(text_col, shingle_n))``.  With both
    supplied the raw corpus is never scanned; with cached inputs the whole
    audit touches the documents table at most twice."""
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, k, shingle_n, seed)
    cands = lsh_pairs_from_signatures(sigs, id_col, k, bands)
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"minhash_{j}").alias(f"__a{j}__") for j in range(k)],
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"minhash_{j}").alias(f"__b{j}__") for j in range(k)],
    )
    match_count = None
    for j in range(k):
        term = F.when(F.col(f"__a{j}__") == F.col(f"__b{j}__"), 1).otherwise(0)
        match_count = term if match_count is None else match_count + term
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            match_count.cast("bigint").alias("n_match"),
        )
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_match").cast("double") / F.lit(float(k)), 6),
        )
    )
    if shingles is None:
        sh = df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles_expr(text_col, shingle_n)).alias("s"),
        )
    else:
        sh = shingles.select(
            F.col(id_col).alias("id"), F.col("shingle").alias("s")
        )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        cands.join(sh.select(F.col("id").alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__inter__"))
    )
    exact = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .withColumn("__inter__", F.coalesce(F.col("__inter__"), F.lit(0)))
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("__na__")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("__nb__")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__inter__").cast("double")
                / (F.col("__na__") + F.col("__nb__") - F.col("__inter__")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return est.join(exact, ["id_a", "id_b"])


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """CDC log compaction / SCD-1 materialization: keep, per key tuple, the
    row GREATEST under ``order_cols`` (e.g. event time with a unique-id
    tiebreak).  The window partitions by the business key — at corpus scale
    that is millions of tiny partitions, no skew and no global exchange.
    The mirror of :func:`exact_dedup` (which keeps the smallest)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash) — sign-sum of token-hash bits over ``bits`` positions.

    explode(tokens) x explode(bit positions) -> +-1 sums -> bit -> weighted
    sum.  All JVM-side; one shuffle on (id)."""
    toks = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("__tok__"))
    h = toks.withColumn("__h__", F.expr(spark_md5_long_sql("__tok__")) % F.lit(1 << bits))
    pos = h.select(
        F.col(id_col),
        F.col("__h__"),
        F.explode(F.expr(f"sequence(0, {bits - 1})")).alias("__bit__"),
    )
    # shiftright/shiftleft need SQL expr form: the Python helpers only take a
    # literal shift amount, and the bit position here is a column
    signed = pos.withColumn("__s__", F.expr("2 * ((__h__ >> __bit__) & 1) - 1"))
    bitsum = signed.groupBy(id_col, "__bit__").agg(F.sum("__s__").alias("__sum__"))
    bitval = bitsum.withColumn(
        "__bitval__",
        F.when(F.col("__sum__") > 0, F.expr("CAST(1 AS BIGINT) << __bit__")).otherwise(F.lit(0)),
    )
    return bitval.groupBy(id_col).agg(F.sum("__bitval__").cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct n-gram shingles, pairs with
    similarity >= threshold.  Output: (id_a, id_b, jaccard).

    Scale note: the shingle self-join is quadratic in docs-per-shingle; use
    it to verify LSH candidates, or pre-bucket inputs.  jaccard is exact
    rational arithmetic (int counts) so the oracle matches bit-for-bit."""
    sh = df.select(F.col(id_col).alias("id"), F.explode(shingles_expr(text_col, shingle_n)).alias("s"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on="s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    with_sizes = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
    )
    jac = with_sizes.withColumn(
        "jaccard",
        F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs: sign-LSH bucket join (cheap, scales)
    then exact cosine verification within buckets.  Output:
    (id_a, id_b, cosine)."""
    from delta_sorter_spark.operators.similarity import cosine_expr, lsh_bucket_expr

    with_bucket = df.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        lsh_bucket_expr(emb_col, dim, n_planes=n_planes, seed=seed).alias("bucket"),
    )
    a, b = with_bucket.alias("a"), with_bucket.alias("b")
    pairs = (
        a.join(b, on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr("a.emb", "b.emb").alias("cosine"),
        )
        # bucket collisions can pair the same ids through multiple buckets
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.where(F.col("cosine") >= threshold)


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003): hash every character k-gram in document order,
    slide a window of ``window`` consecutive hashes, keep each window's
    minimum — the distinct minima are the document's fingerprint set.

    Guarantees: any shared substring of length >= k + window - 1 between two
    documents contributes at least one identical fingerprint, so overlap on
    fingerprints detects partial/plagiarized copies, which whole-document
    digests (``textstats.fingerprint``) cannot.

    All JVM-side: positional k-grams via transform/sequence, the rolling min
    via a windowed ``min`` over the in-document position — one shuffle by
    doc id.  Output: (id, fp) distinct rows."""
    from pyspark.sql import Window as W

    # lower(text) let-bound once per row (the shingles_expr discipline)
    grams = F.expr(
        f"element_at(transform(array(lower({text_col})),"
        f" t -> transform(sequence(1, greatest(1, length(t) - {k - 1})),"
        f" i -> substring(t, i, {k}))), 1)"
    )
    positioned = df.select(
        F.col(id_col), F.posexplode(grams).alias("__pos__", "__gram__")
    ).withColumn("__h__", F.expr(f"{spark_md5_long_sql('__gram__')} % {MERSENNE_P}"))
    roll = W.partitionBy(id_col).orderBy("__pos__").rowsBetween(-(window - 1), 0)
    return (
        positioned.withColumn("__min__", F.min("__h__").over(roll))
        .where(F.col("__pos__") >= window - 1)  # full windows only
        .select(F.col(id_col), F.col("__min__").alias("fp"))
        .distinct()
    )


def word_ngrams_expr(text_col: str, n: int = 7) -> Column:
    """Distinct word n-grams of the lowercased text (whitespace tokens),
    joined by single spaces.  Texts shorter than ``n`` words yield one
    truncated gram (the whole text) so every document is representable.
    JVM-side transform/sequence/slice — no UDF."""
    words = f"split(lower(trim({text_col})), '\\\\s+')"
    return F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(1, size({words}) - {n - 1})),"
        f" i -> array_join(slice({words}, i, {n}), ' ')))"
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 7,
) -> DataFrame:
    """Benchmark decontamination: count word n-gram collisions between each
    corpus document and an evaluation set (the '13-gram overlap' defense
    against test-set leakage, scaled down to n=7 for short documents).

    Returns (id, n_hits) for contaminated documents only.

    Scale shape: the benchmark n-gram set is small (eval suites are MBs, not
    TBs) so it broadcasts; the corpus explodes its distinct n-grams once and
    inner-joins the broadcast set map-side — no shuffle of corpus text, and
    the count aggregation shuffles only (id, hit) pairs for documents that
    collide at all.  At 100 TB the corpus scan dominates and parallelizes
    per-file; nothing funnels through the driver."""
    bench_grams = F.broadcast(
        benchmark.select(
            F.explode(word_ngrams_expr(text_col, n)).alias("__gram__")
        ).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams_expr(text_col, n)).alias("__gram__")
    )
    return (
        corpus_grams.join(bench_grams, "__gram__")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Chunk-level (paragraph-style) exact dedup — the pretraining hygiene pass
# that removes boilerplate repeated ACROSS documents (headers, footers,
# license blocks) rather than whole-document duplicates (E1) or near-dups
# (MinHash).  Documents are split into non-overlapping W-word chunks; a
# chunk is "duplicated" if it occurs in more than one distinct document.
# ---------------------------------------------------------------------------


def doc_chunks(df: DataFrame, chunk_words: int = 10) -> DataFrame:
    """Explode each document into its full non-overlapping word chunks
    (trailing partial chunk dropped).  All JVM-side: split + sequence +
    transform + explode; the explode multiplies rows ~n_words/W, the same
    scan-friendly shape as shingling (no Python, no collect)."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.floor(F.size(words) / chunk_words).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(1), n_chunks)).otherwise(
        F.array().cast("array<int>")
    )
    chunk = F.explode(
        F.transform(
            idx,
            lambda i: F.array_join(
                F.slice(words, (i - F.lit(1)) * chunk_words + 1, chunk_words), " "
            ),
        )
    )
    return df.select("doc_id", "source", chunk.alias("chunk"))


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 10,
    stride: int = 5,
) -> DataFrame:
    """RAG-style overlapping chunking: windows of ``chunk_words`` words
    every ``stride`` words (stride < chunk_words overlaps; == is
    non-overlapping; stride > chunk_words would leave interior gaps and is
    rejected).  Coverage is TOTAL: when the stride pattern would end
    before the last word, one extra window starting at ``n - chunk_words + 1``
    (ending exactly at the last word, overlapping more than usual) is added —
    retrieval corpora must not drop document tails the way dedup chunking
    can; documents shorter than a window become one short chunk.

    Output: (id, chunk_id, chunk_start, chunk) — chunk_id is a stable
    60-bit hash of (id, start), so re-chunking an unchanged corpus yields
    identical ids (the index-upsert key).  All JVM-side (split + sequence +
    transform + explode), same scan shape as shingling."""
    if stride > chunk_words:
        raise ValueError(
            f"stride ({stride}) > chunk_words ({chunk_words}) would leave "
            "words covered by no chunk"
        )
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # starts: 1, 1+stride, ... up to the last full-window start, plus that
    # last start itself so the final words are always covered
    last_full = F.greatest(n - F.lit(chunk_words) + 1, F.lit(1))
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1), last_full, F.lit(stride)), F.array(last_full)
        )
    )
    exploded = df.select(
        F.col(id_col),
        F.explode(starts).alias("chunk_start"),
        words.alias("__w__"),
    )
    return exploded.select(
        F.col(id_col),
        F.expr(
            spark_md5_long_sql(f"concat(CAST({id_col} AS STRING), ':', "
                               f"CAST(chunk_start AS STRING))")
        ).alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.array_join(
            F.slice(F.col("__w__"), F.col("chunk_start"), chunk_words), " "
        ).alias("chunk"),
    ).where(F.col("chunk") != "")  # empty/whitespace-only docs yield no chunks


def chunk_dedup_stats(df: DataFrame, chunk_words: int = 10) -> DataFrame:
    """Per-source chunk dedup profile: total chunks and chunks that also
    appear in ANOTHER document (cross-doc duplicated).  Two shuffles: one
    groupBy on the 60-bit chunk hash (map-side partial distinct-doc counts),
    one broadcast-back join keyed by the same hash.  Output:
    (source, n_chunks, n_dup_chunks)."""
    from delta_sorter_spark.functions.hashing import spark_md5_long_sql

    chunks = doc_chunks(df, chunk_words).withColumn(
        "ch", F.expr(spark_md5_long_sql("chunk"))
    )
    per_chunk = chunks.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(per_chunk, "ch")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with the deterministic k-means quantizer (operators/ivf.py),
    then mark, within each cluster, every item whose cosine to a SMALLER-id
    cluster-mate reaches ``threshold`` — keep-lowest-id semantics, reported
    with the smallest such witness.  Output: (id, centroid, dup_of, cosine)
    — one row per REMOVED item.

    Scale posture: the pairwise compare is quadratic only within a cluster,
    never globally — n_centroids is the knob that bounds cluster size (the
    paper uses ~1 cluster per 10-50k docs at web scale; here 16 for 500
    vectors).  The cluster self-join shuffles on centroid; everything else
    (centroid build, assignment) is broadcast-sized.  Determinism: centroids
    come from integer-quantized exact means (ivf.py), cosines are
    left-to-right double folds — both bit-identical cross-engine, so even
    this iterative pipeline is hash-checkable against a SQL oracle."""
    from delta_sorter_spark.operators.ivf import _assign, kmeans_centroids
    from delta_sorter_spark.operators.similarity import cosine_expr

    centroids = kmeans_centroids(
        corpus, emb_col, dim, n_centroids, n_iters, id_col=id_col
    )
    assigned = _assign(
        corpus.select(F.col(id_col).alias("id"), F.col(emb_col).alias("__e__")),
        centroids,
        "__e__",
    )
    a = assigned.select(
        F.col("centroid"),
        F.col("id").alias("__aid__"),
        F.col("__e__").alias("__ae__"),
    )
    b = assigned.select(
        F.col("centroid"),
        F.col("id").alias("__bid__"),
        F.col("__e__").alias("__be__"),
    )
    pairs = (
        a.join(b, "centroid")
        .where(F.col("__aid__") > F.col("__bid__"))
        .withColumn("__cos__", cosine_expr("__ae__", "__be__"))
        .where(F.col("__cos__") >= threshold)
    )
    # smallest witness id (and ITS cosine) via min(struct): deterministic
    return (
        pairs.groupBy("centroid", F.col("__aid__").alias("id"))
        .agg(F.min(F.struct("__bid__", "__cos__")).alias("__w__"))
        .select(
            "id",
            "centroid",
            F.col("__w__.__bid__").alias("dup_of"),
            F.col("__w__.__cos__").alias("cosine"),
        )
    )

def edit_distance_verify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix: int = 200,
    max_dist: int = 40,
    **lsh_kwargs,
) -> DataFrame:
    """Fuzzy-dedup verification: exact Levenshtein distance over the LSH
    candidate pairs, on a fixed normalized prefix (lower/trim, first
    ``prefix`` chars — bounds the O(n*m) DP per pair regardless of document
    length).  Keeps pairs with distance <= ``max_dist``.

    Scale posture: candidate generation is the banded LSH self-join (never
    all-pairs); the distance DP runs only on candidates, JVM-side
    (``F.levenshtein`` is a builtin), with the id->prefix map joined in —
    broadcast when small, AQE otherwise."""
    cands = minhash_lsh_candidates(df, id_col, text_col, **lsh_kwargs)
    txt = df.select(
        F.col(id_col).alias("__id__"),
        F.substring(F.lower(F.trim(F.col(text_col))), 1, prefix).alias("__t__"),
    )
    pairs = (
        cands.join(
            txt.select(F.col("__id__").alias("id_a"), F.col("__t__").alias("__ta__")),
            "id_a",
        )
        .join(
            txt.select(F.col("__id__").alias("id_b"), F.col("__t__").alias("__tb__")),
            "id_b",
        )
    )
    return (
        pairs.withColumn(
            "edit_distance",
            F.levenshtein(F.col("__ta__"), F.col("__tb__")).cast("bigint"),
        )
        .where(F.col("edit_distance") <= max_dist)
        .select("id_a", "id_b", "edit_distance")
    )


# ---------------------------------------------------------------------------
# incremental corpus dedup (dedup-against-index)
# ---------------------------------------------------------------------------


def dedup_against_index(
    index_df: DataFrame, batch: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Rows of ``batch`` whose content hash appears neither in the corpus
    index (``index_df``: one ``content_hash`` column, bigint) nor earlier in
    the batch itself (first occurrence kept, min ``id_col`` tiebreak).

    The pure half of :func:`incremental_dedup`; one hash shuffle against the
    index, no text ever joins."""
    hashed = batch.withColumn(
        "content_hash", F.expr(spark_md5_long_sql(text_col))
    )
    first = exact_dedup(hashed, ["content_hash"], id_col)
    return first.join(
        index_df.select("content_hash").distinct(), "content_hash", "left_anti"
    )


def incremental_dedup(
    index_table,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Continuously-ingested-corpus dedup: drop batch rows whose content was
    already accepted by ANY previous batch, then register the survivors'
    hashes — the production shape for training-data ingestion, where "the
    corpus" is too big to rescan per batch.

    ``index_table`` is a Delta table (``content_hash bigint, doc_id
    <id type>``) maintained by this function: new batches anti-join its
    current snapshot on the hash (one shuffle of hashes — text bytes never
    join), and the surviving ``(hash, id)`` pairs append in ONE commit with
    optional SetTransaction idempotence, so a replayed batch (foreachBatch
    restart, retried orchestration step) is a no-op instead of
    double-registering.

    At 100 TB the index is small relative to the corpus (two fixed-width
    columns), the anti-join is a plain hash shuffle on uniformly-distributed
    hashes (no skew by construction), and each ingestion run costs O(batch)
    — never O(corpus).

    Returns {"batch_rows", "new_rows", "version"}.  Skipped replays (caught
    by the pre-check or by losing the SetTransaction race inside append)
    uniformly report ``batch_rows=0, new_rows=0, skipped=True`` — this call
    processed nothing, so acceptance-rate aggregation over results stays
    consistent regardless of race timing.  The accepted rows are the batch
    rows whose ids appear in the appended pairs — re-derive them with
    :func:`dedup_against_index` or semi-join the batch against the new index
    snapshot."""
    import json as _json

    if (txn_app_id is None) != (txn_version is None):
        # same contract append() enforces — fail before any compute
        raise ValueError("txn_app_id and txn_version must be passed together")
    if (
        txn_app_id is not None
        and index_table.state().txns.get(txn_app_id, -1) >= txn_version
    ):
        # replayed batch: already registered — no compute at all
        return {
            "batch_rows": 0,
            "new_rows": 0,
            "version": index_table.log.latest_version(),
            "skipped": True,
        }
    index_df = index_table.to_df()
    fresh = dedup_against_index(index_df, batch, id_col, text_col)
    pairs = fresh.select("content_hash", F.col(id_col).alias("doc_id"))
    batch_rows = batch.count()
    version, committed = index_table.append(
        pairs,
        txn_app_id=txn_app_id,
        txn_version=txn_version,
        return_committed=True,
    )
    if not committed:
        # append lost the SetTransaction race (a twin worker registered the
        # same batch first).  The flag is authoritative: the winner's commit
        # carries a txn marker identical to ours, so re-reading the log
        # could NOT distinguish winner from loser — batch_rows=0 matches
        # the pre-check skip path; this call registered nothing.
        return {
            "batch_rows": 0,
            "new_rows": 0,
            "version": version,
            "skipped": True,
        }
    # accepted-row count from THIS commit's Add stats — exact, no extra scan
    actions = list(index_table.log.commit_actions(version))
    accepted = 0
    for r in actions:
        a = r.get("add")
        if not a:
            continue
        stats = a.get("stats") or {}
        if isinstance(stats, str):
            stats = _json.loads(stats)
        accepted += stats.get("numRecords", 0)
    return {"batch_rows": batch_rows, "new_rows": accepted, "version": version}


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-CONTAINMENT pairs: for documents sharing shingles, the directed
    containment ratios ``|A∩B| / |A|`` and ``|A∩B| / |B|``, keeping pairs
    whose larger ratio reaches ``threshold``.  This catches the dedup case
    Jaccard systematically misses: a document quoted or embedded inside a
    much larger one (the intersection is nearly all of the small doc but a
    sliver of the union).  Output: (id_a, id_b, containment_a, containment_b)
    with id_a < id_b; the ratios are rounded to 6 places AFTER thresholding.

    Scale posture: the pair space is generated by the shared-shingle
    self-join (a bucketed equi-join on the shingle — never an all-pairs
    cross), and like :func:`ngram_jaccard_pairs` this is the exact
    VERIFICATION shape: feed ``candidates`` (id_a, id_b) from an LSH pass to
    bound it to candidate pairs at corpus scale."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_expr(text_col, shingle_n)).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        sh.select(F.col("id").alias("id_a"), "s")
        .join(sh.select(F.col("id").alias("id_b"), "s"), "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__i__"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    ca = F.col("__i__").cast("double") / F.col("__na__").cast("double")
    cb = F.col("__i__").cast("double") / F.col("__nb__").cast("double")
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("__na__")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n").alias("__nb__")),
            "id_b",
        )
        .where(F.greatest(ca, cb) >= F.lit(float(threshold)))
        .select(
            "id_a",
            "id_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def repeated_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
    salt_factor: int | None = None,
) -> DataFrame:
    """Substring-level dedup, phase 1 (the Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better' operation, re-expressed
    relationally): find, per document, the merged token spans covered by
    any ``n``-token gram that appears in at least ``min_docs`` DISTINCT
    documents.  Document-level dedup misses this entirely — two otherwise
    different pages sharing a boilerplate paragraph stay, and the model
    memorizes the paragraph.

    Output: (``id_col``, span_start, span_end, span_tokens) with 0-based
    token offsets, end exclusive, overlapping/adjacent gram hits merged.

    Scale shape: one token explode (positions ride along, no self-join on
    text), one map-side-combined groupBy(gram) for document frequencies,
    one join back on the gram, and an interval-merge window partitioned by
    document (bounded by per-doc hit counts).  The full corpus never pairs
    with itself.  At cluster scale the gram string can shrink to an
    xxhash64 key to cut shuffle width; measured at sf0.1 the job is
    CPU-bound, not shuffle-bound (the portable md5 variant ran ~25% SLOWER
    than plain strings), so strings stay the default here.

    Skew: a boilerplate gram appearing in ~every document is NOT a hot key
    for the document-frequency aggregate — Spark plans countDistinct as
    partial-dedup on (gram, id) / exchange / per-partition partial counts,
    so the hot gram's reducer receives O(#partitions) rows, not O(#docs).
    The hits JOIN on the gram IS skewed (every occurrence of the hot gram
    hashes to one partition); by default AQE's runtime skew-join splitting
    handles it (tests/test_graph_skew.py measures a 50 %-duplicated
    corpus), and ``salt_factor`` forces the deterministic salted-join plan
    (operators/skew.py) for deployments running without AQE."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("__toks__")
    )
    grams_arr = (
        f"CASE WHEN size(__toks__) >= {n} THEN"
        f" transform(sequence(1, size(__toks__) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__toks__, i, {n})))"
        f" ELSE array() END"
    )
    grams = toks.selectExpr("id", f"posexplode({grams_arr}) AS (pos, gram)")
    repeated = (
        grams.groupBy("gram")
        .agg(F.countDistinct("id").alias("__nd__"))
        .where(F.col("__nd__") >= min_docs)
        .select("gram")
    )
    if salt_factor:
        from delta_sorter_spark.operators.skew import salted_join

        joined = salted_join(grams, repeated, ["gram"], salt_factor=salt_factor)
    else:
        joined = grams.join(repeated, "gram")
    hits = joined.select("id", "pos", (F.col("pos") + n).alias("__end__"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("__end__").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "__new__",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "__span__",
        F.sum("__new__").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(F.col("id").alias(id_col), "__span__")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            F.max("__end__").cast("bigint").alias("span_end"),
        )
        .withColumn("span_tokens", (F.col("span_end") - F.col("span_start")))
        .drop("__span__")
    )


def remove_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Substring-level dedup, phase 2: rewrite each document's text with the
    repeated spans removed (tokens outside every span, re-joined by single
    spaces).  Documents with no spans pass through with normalized
    whitespace — run phase 1 and this in one pipeline so tokenization is
    identical.

    The spans arrive as a per-document ARRAY via one aggregate + one join
    (never a token-level range join); the token filter is a JVM-side lambda
    over the zipped (token, index) array, with the tokenization and the
    kept-token array each MATERIALIZED ONCE as intermediate columns (three
    inlined copies of split() would tokenize every document up to 3x —
    Catalyst does not reliably CSE across separate projections).  Output:
    the input columns IN ORDER with ``text_col`` replaced in place, plus
    ``tokens_removed`` appended."""
    packed = spans.groupBy(F.col(id_col)).agg(
        F.expr("sort_array(collect_list(struct(span_start, span_end)))").alias(
            "__spans__"
        )
    )
    out = (
        df.join(packed, id_col, "left")
        .withColumn("__toks__", tokens_expr(text_col))
        .withColumn(
            "__kept__",
            F.expr(
                "filter(transform(sequence(0, size(__toks__) - 1),"
                " i -> named_struct('tok', element_at(__toks__, i + 1), 'idx', i)),"
                " p -> NOT exists(coalesce(__spans__, array()),"
                " s -> p.idx >= s.span_start AND p.idx < s.span_end))"
            ),
        )
    )
    ordered = [
        F.expr("concat_ws(' ', transform(__kept__, p -> p.tok))").alias(text_col)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return out.select(
        *ordered,
        F.expr("CAST(size(__toks__) - size(__kept__) AS BIGINT)").alias(
            "tokens_removed"
        ),
    )


def repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Line-level (paragraph) boilerplate detection — the CCNet (Wenzek et
    al. 2020) / RefinedWeb (Penedo et al. 2023) pipeline step: split each
    document on ``sep`` (a regex), normalize each line (lower + trim), and
    count the DISTINCT documents containing it.  Lines appearing in >=
    ``min_docs`` documents and at least ``min_chars`` normalized chars
    long are the nav-text / cookie-banner / footer boilerplate that
    substring dedup (repeated_ngram_spans) over-segments and exact dedup
    never sees.

    Plan shape: one narrow explode + two hash aggregations (the distinct
    (doc, line) pairs combine map-side before the per-line count) — no
    self-join, nothing quadratic.  Returns (line, n_docs) with ``line``
    normalized."""
    lines = df.select(
        F.col(id_col).alias("__id__"),
        F.explode(F.split(F.col(text_col), sep)).alias("__raw__"),
    ).select("__id__", F.lower(F.trim("__raw__")).alias("line"))
    return (
        lines.where((F.col("line") != "") & (F.length("line") >= min_chars))
        .distinct()
        .groupBy("line")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str = "\n",
    min_chars: int = 1,
    joiner: str = "\n",
) -> DataFrame:
    """Line-level dedup, phase 2: drop every line whose normalized form is
    corpus-frequent (``repeated_lines`` semantics), keep everything else in
    document order, and re-join with ``joiner``.  Lines shorter than
    ``min_chars`` (and blank lines) are never removed even when frequent —
    they are document structure, not boilerplate.

    One explode + the exact frequency aggregate + a left-anti join on the
    normalized line + one per-document re-aggregation: the corpus text
    shuffles once by line and once by document id, frequency is computed
    exactly (never sampled), and no step is quadratic.  Output: the input
    columns in order with ``text_col`` rewritten in place (a fully-removed
    document becomes ''), plus ``lines_removed``."""
    lines = df.select(
        F.col(id_col).alias("__id__"),
        F.posexplode(F.split(F.col(text_col), sep)).alias(
            "__pos__", "__line__"
        ),
    ).withColumn("__norm__", F.lower(F.trim("__line__")))
    # the boilerplate definition lives in repeated_lines — removal reuses
    # it verbatim so the detect and remove APIs can never drift
    frequent = repeated_lines(
        df, id_col, text_col,
        min_docs=min_docs, sep=sep, min_chars=min_chars,
    ).select(F.col("line").alias("__norm__"))
    kept = lines.join(frequent, "__norm__", "left_anti")
    rebuilt = (
        kept.groupBy("__id__")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos__", "__line__"))
            ).alias("__k__"),
            F.count("*").alias("__kept_n__"),
        )
        .select(
            "__id__",
            F.array_join(
                F.transform("__k__", lambda p: p["__line__"]), joiner
            ).alias("__text__"),
            "__kept_n__",
        )
    )
    out = df.join(rebuilt, F.col(id_col) == F.col("__id__"), "left")
    ordered = [
        F.coalesce(F.col("__text__"), F.lit("")).alias(text_col)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return out.select(
        *ordered,
        (
            F.size(F.split(F.col(text_col), sep))
            - F.coalesce(F.col("__kept_n__"), F.lit(0))
        )
        .cast("bigint")
        .alias("lines_removed"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_expr: str,
    window: int = 3,
    payload_expr: str | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): candidate
    pairs are records within ``window`` positions of each other when the
    corpus is sorted by a blocking key — the classic record-linkage
    complement to LSH banding (LSH catches token overlap; a sort key like a
    normalized prefix or a simhash catches typo-adjacent records that share
    no shingle bucket).

    Output: (id_a, id_b, dist) with id_a the earlier record in sort order
    and ``dist`` the rank gap (1..window-1).

    Scale shape: the global sort order comes from the two-phase
    ``global_rank`` (range partitioning + broadcast offsets — NO
    single-partition exchange), and neighbors come from ``lead(id, d)``
    windows WITHIN each range partition — the ranked corpus is never
    re-shuffled (the window keys on the range-partition id the rank pass
    already established; one Window operator computes every lead).  The
    only pairs a within-partition lead can't see are the O(partitions x
    window) ones that straddle a partition boundary; those come from a
    broadcast equi-join of the partition tail rows (some lead NULL)
    against the head rows (some lag NULL) on exact rank arithmetic.
    Cost is O(corpus x window), independent of key distribution, with ONE
    full-corpus exchange end to end.

    ``payload_expr`` optionally carries a per-record value THROUGH the
    windows (output gains ``val_a``/``val_b``) so a verification stage —
    e.g. :func:`fuzzy_neighborhood_linkage`'s edit distance — needs no
    join back to the corpus at all."""
    from delta_sorter_spark.operators.ranking import global_rank

    if window < 2:
        raise ValueError("window must be >= 2 (a pair needs two records)")
    exprs = [f"{id_col} AS __snid__", f"({key_expr}) AS __snkey__"]
    if payload_expr is not None:
        exprs.append(f"({payload_expr}) AS __snval__")
    keyed = df.selectExpr(*exprs)
    ranked = global_rank(
        keyed,
        ["__snkey__", "__snid__"],
        rank_col="__rn__",
        partition_col="__pid__",
    )
    w = Window.partitionBy("__pid__").orderBy("__rn__")
    carry = payload_expr is not None
    lead_fields = lambda d: [  # noqa: E731
        F.lead("__snid__", d).over(w).alias("id_b"),
        F.lit(d).cast("bigint").alias("dist"),
    ] + ([F.lead("__snval__", d).over(w).alias("val_b")] if carry else [])
    # One pass computes every neighbor lead plus the boundary flags, then
    # localCheckpoint pins it: the within/tail/head branches below would
    # otherwise each replay the window's __pid__ shuffle (exchange reuse is
    # not guaranteed across these branch boundaries — measured 3x live
    # shuffles of the corpus without the pin).
    windowed = ranked.select(
        "__snid__",
        "__rn__",
        "__pid__",
        *(["__snval__"] if carry else []),
        F.array(
            *[F.struct(*lead_fields(d)) for d in range(1, window)]
        ).alias("__leads__"),
        F.lag("__snid__", window - 1).over(w).isNull().alias("__is_head__"),
    ).localCheckpoint(eager=False)
    pair_cols = ["id_a", "id_b", "dist"] + (["val_a", "val_b"] if carry else [])
    within = (
        windowed.select(
            F.col("__snid__").alias("id_a"),
            *([F.col("__snval__").alias("val_a")] if carry else []),
            F.explode("__leads__").alias("p"),
        )
        .where(F.col("p.id_b").isNotNull())
        .select(
            "id_a",
            F.col("p.id_b").alias("id_b"),
            F.col("p.dist").alias("dist"),
            *([F.col("val_a"), F.col("p.val_b").alias("val_b")] if carry else []),
        )
        .select(*pair_cols)
    )
    # Boundary fix-up: a pair at distance d <= window-1 that crosses a
    # partition edge has its left row in the last d rows of its partition
    # (so lead(window-1) is NULL) and its right row in the first d rows of
    # a later one (lag(window-1) NULL).  Both sets are O(partitions*window)
    # rows — the join is a broadcast over rank arithmetic.
    tail = (
        windowed.where(F.element_at("__leads__", window - 1)["id_b"].isNull())
        .select(
            F.col("__snid__").alias("id_a"),
            F.col("__rn__").alias("__ra__"),
            F.col("__pid__").alias("__pa__"),
            *([F.col("__snval__").alias("val_a")] if carry else []),
        )
        .select(
            "id_a",
            "__ra__",
            "__pa__",
            *(["val_a"] if carry else []),
            F.explode(
                F.array(*[F.lit(d).cast("bigint") for d in range(1, window)])
            ).alias("dist"),
        )
        .withColumn("__rb__", F.col("__ra__") + F.col("dist"))
    )
    head = windowed.where(F.col("__is_head__")).select(
        F.col("__snid__").alias("id_b"),
        F.col("__rn__").alias("__rb__"),
        F.col("__pid__").alias("__pb__"),
        *([F.col("__snval__").alias("val_b")] if carry else []),
    )
    cross = (
        tail.join(F.broadcast(head), "__rb__")
        .where(F.col("__pb__") != F.col("__pa__"))
        .select(*pair_cols)
    )
    return within.unionByName(cross)


def fuzzy_neighborhood_linkage(
    df: DataFrame,
    id_col: str,
    key_expr: str,
    value_expr: str,
    window: int = 3,
    max_dist: int = 3,
) -> DataFrame:
    """Typo-tolerant record linkage: :func:`sorted_neighborhood_pairs`
    candidates verified by Levenshtein edit distance over a normalized
    value expression — the classic merge/purge pipeline (Hernandez &
    Stolfo 1995) completed with its verification stage.  Shingle-based
    near-dup misses single-character typos in short fields (a one-char
    edit rewrites every covering shingle); edit distance on a sort-adjacent
    candidate set catches exactly those.

    Output: (id_a, id_b, edit_dist) for candidate pairs with
    ``levenshtein(value_a, value_b) <= max_dist``.

    Scale shape: candidates are O(corpus x window) from the blocking pass
    (one corpus exchange), with the comparison values CARRIED THROUGH the
    blocking windows (``payload_expr``) — no join back to the corpus at
    all; the distance is Spark's JVM-side ``levenshtein``.  No all-pairs
    anywhere; cost is O(corpus x window x |value|^2)."""
    cands = sorted_neighborhood_pairs(
        df, id_col, key_expr, window=window, payload_expr=value_expr
    )
    return (
        cands.withColumn(
            "edit_dist", F.levenshtein("val_a", "val_b").cast("bigint")
        )
        .where(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )
