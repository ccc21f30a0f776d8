"""Lexical retrieval operators: BM25 top-k search over a document corpus
(LLM-pipeline extension surface; the reference — a Delta table maintenance
tool, `crates/sorter-core/src/lib.rs` — has no retrieval, but a 100 TB
training-data pipeline needs search for decontamination audits, targeted
curation, and retrieval-augmented eval set construction).

Scoring is **float-free** so the driver's DuckDB oracle verifies values
bit-for-bit (same policy as ``textstats.tfidf_top_terms`` /
``unigram_surprisal``: float ``ln`` differs across engines in the last ulp;
integer arithmetic does not):

- idf is the bit-length surrogate ``floor(log2(N DIV df))`` — 0 for
  corpus-wide terms (built-in stopword suppression), growing by 1 per
  halving of document frequency.
- the Robertson tf-saturation factor ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
  with the standard k1=1.2, b=0.75 is computed exactly in parts-per-million
  fixed point: with N docs and L total tokens (avgdl = L/N),

      D_ppm  = 1_000_000*tf + 300_000 + (900_000*dl*N) DIV L
      tf_ppm = (2_200_000_000_000*tf) DIV D_ppm

  (all BIGINT; exact for tf < 4.1e6 and dl*N < 1e13 — rescale the constants
  before running a corpus beyond that envelope).
- score(q, d) = sum over shared terms of ``idf_bits * tf_ppm``.

Scale posture (100 TB corpus, small-to-medium query set):

- one token explode over the corpus; tf is a map-side-combined
  ``groupBy(doc, term)`` — the only data-scale shuffle;
- df and the (N, L) stats row are vocab-/scalar-sized aggregates;
  the stats row broadcasts, df joins tf hash-on-term (AQE picks broadcast
  when the vocabulary is small enough);
- the query-term table broadcasts (``broadcast_queries=True``, the normal
  case: thousands of queries x a few terms), so scoring never shuffles the
  posting table — candidates flow straight into a per-query top-k window
  (many small partitions, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BM25 constants, ppm fixed point: k1 = 1.2, b = 0.75
_K1B_PPM = 300_000  # k1 * (1 - b)
_K1_B_PPM = 900_000  # k1 * b
_NUM_SCALE = 2_200_000_000_000  # 1e6 (ppm) * 1e6 (tf ppm) * (k1 + 1)


def _explode_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) — lowercased whitespace tokens, empties dropped.

    The explicit ``isNotNull`` on the term mirrors the constraint the join
    planner would otherwise infer on only SOME consumers of this subtree;
    stating it here keeps every branch canonically identical so exchange
    reuse can collapse them (see bm25_postings)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("term"),
        )
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
    )


def bm25_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, term) BM25 partial scores: the reusable "index" half.

    Output: (id_col, term, tf, df, idf_bits, tf_ppm, term_score) — persist
    this as a Delta table partitioned/bucketed by term to serve many query
    batches without re-scanning the corpus.

    dl, df, and total_len all derive from the ONE (doc, term) aggregate
    rather than from separate passes over the raw text: every branch shares
    the identical scan->explode->partial-agg->Exchange(doc, term) subtree,
    so Spark's exchange reuse materializes the token explode once — at
    100 TB that is one corpus scan, not four (n_docs reads only the pruned
    id column).  Exchange reuse matches CANONICALIZED subtrees, which is
    why every branch must see bit-identical filters and aggregate outputs:
    null ids are dropped up front (the dl join would infer that filter on
    one branch only) and dfreq keeps a sum the stats branch consumes (so
    column pruning cannot strip the count from just one copy).  Null ids,
    like empty tokens, are excluded from the corpus by contract."""
    docs = docs.where(F.col(id_col).isNotNull())
    toks = _explode_terms(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("bigint").alias("dl"))
    # one tf row per (doc, term), so row count per term == document
    # frequency.  count(nullif(tf, 0)) == count(*) because tf >= 1 by
    # construction, but the optimizer cannot prove that, so this branch
    # keeps consuming the tf column — a plain count(*) (or count(tf), which
    # NullPropagation rewrites to count(1)) lets column pruning strip the
    # count from just this copy of the shared subtree, breaking the
    # canonical equality that exchange reuse needs
    dfreq = tf.groupBy("term").agg(
        F.count(F.nullif(F.col("tf"), F.lit(0))).cast("bigint").alias("df")
    )
    stats = docs.agg(
        F.countDistinct(F.col(id_col)).cast("bigint").alias("n_docs")
    ).crossJoin(
        dl.agg(F.sum("dl").cast("bigint").alias("total_len"))
    )
    posting = (
        tf.join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_bits",
            (
                F.length(F.expr("bin(n_docs div df)")) - F.lit(1)
            ).cast("bigint"),
        )
        .withColumn(
            "d_ppm",
            F.expr(
                f"1000000 * tf + {_K1B_PPM} + ({_K1_B_PPM} * dl * n_docs) div total_len"
            ),
        )
        .withColumn("tf_ppm", F.expr(f"({_NUM_SCALE} * tf) div d_ppm"))
        .withColumn("term_score", (F.col("idf_bits") * F.col("tf_ppm")).cast("bigint"))
    )
    return posting.select(id_col, "term", "tf", "df", "idf_bits", "tf_ppm", "term_score")


def bm25_topk(
    docs: DataFrame | None,
    queries: DataFrame,
    doc_id: str,
    doc_text: str | None,
    query_id: str,
    query_text: str,
    k: int = 5,
    broadcast_queries: bool = True,
    exclude_self: bool = False,
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k documents per query.

    Output: (query_id, doc_id, rank, score) — rank is total (ties break on
    doc id ascending), score is the integer ppm-scaled BM25 sum.
    ``exclude_self`` drops query_id == doc_id hits for queries derived from
    the corpus itself (the decontamination-audit shape).

    ``postings`` serves from a prebuilt index (a persisted
    :func:`bm25_postings` table, e.g. a Delta table bucketed by term)
    instead of rebuilding it — the steady-state shape: build once per
    corpus version, serve every query batch with zero corpus scans
    (pass ``docs=None``/``doc_text=None`` then; ``doc_id`` must name the
    postings' id column).  Supplying BOTH postings and a docs DataFrame is
    rejected — the docs side would be silently ignored otherwise."""
    from pyspark.sql.window import Window

    if postings is None:
        if docs is None or doc_text is None:
            raise ValueError(
                "bm25_topk needs docs + doc_text to build an index, or a "
                "prebuilt postings DataFrame (bm25_postings output)"
            )
        posting = bm25_postings(docs, doc_id, doc_text)
    else:
        if docs is not None:
            raise ValueError(
                "pass either postings= (served as-is) or docs=/doc_text= "
                "(index built here), not both — docs would be ignored"
            )
        posting = postings
    qterms = _explode_terms(queries, query_id, query_text).distinct()
    if broadcast_queries:
        qterms = F.broadcast(qterms)
    scored = posting.join(qterms, "term")
    if exclude_self:
        scored = scored.where(F.col(query_id) != F.col(doc_id))
    scored = (
        scored.groupBy(query_id, doc_id)
        .agg(F.sum("term_score").cast("bigint").alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(doc_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(query_id, doc_id, "rank", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str,
    doc_col: str,
    k: int = 5,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N ranked
    lists into one hybrid ranking — the standard way to combine lexical
    (:func:`bm25_topk`) and dense (``similarity.brute_force_topk`` /
    ``ivf.ivf_topk``) retrieval without score calibration.

    Each input has (query_col, doc_col, ``rank``); a document's fused score
    is ``sum over lists of 1/(k_rrf + rank)``, computed float-free as
    ``1_000_000_000 DIV (k_rrf + rank)`` per hit (exact in both Spark and
    the DuckDB oracle; rank and k_rrf are small, so the ppb quantization
    never reorders: adjacent ranks differ by >100k ppb for rank+k_rrf
    < 3163).  Output: (query_col, doc_col, rank, rrf_score, n_lists) —
    n_lists counts how many input rankings surfaced the document; ties
    break on doc id ascending.

    Scale shape: inputs are already per-query top-k (rows = queries x k x
    N lists, query-scale not corpus-scale); the union + groupBy + window
    all hash on the same query key, so AQE coalesces this into small
    exchanges downstream of the heavy retrieval stages."""
    from pyspark.sql.window import Window

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked DataFrame")
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(query_col),
            F.col(doc_col),
            F.expr(f"CAST(1000000000 DIV ({k_rrf} + rank) AS BIGINT)").alias(
                "__rrf__"
            ),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    fused = contribs.groupBy(query_col, doc_col).agg(
        F.sum("__rrf__").cast("bigint").alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_score"), F.asc(doc_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(query_col, doc_col, "rank", "rrf_score", "n_lists")
    )
