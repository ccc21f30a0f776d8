"""BM25 retrieval + hashed linear classifier (operators/retrieval.py,
textstats.hashed_linear_score): ranking semantics on a controlled corpus,
model-weight broadcast path, and integer determinism."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "rust compiler borrow checker lifetimes"),
        (2, "python interpreter bytecode garbage collector"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the slow brown dog sleeps under the quick fox"),
        (5, "rust memory safety without garbage collector"),
        (6, "common words the the the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rare_terms_outrank_common(spark, corpus):
    from delta_sorter_spark.operators.retrieval import bm25_topk

    queries = spark.createDataFrame(
        [(100, "rust garbage collector")], "query_id long, qtext string"
    )
    got = bm25_topk(
        corpus, queries, "doc_id", "text", "query_id", "qtext", k=10
    ).orderBy("rank").collect()
    # doc 5 matches all three query terms; docs 1/2 match a strict subset of
    # doc 5's matches, so doc 5 must rank first
    assert got[0]["doc_id"] == 5
    hit_ids = {r["doc_id"] for r in got}
    assert {1, 2, 5} <= hit_ids
    # docs 3/4/6 share no query term (the/quick/... are not in the query)
    assert hit_ids.isdisjoint({3, 4, 6})
    # ranks are total and contiguous from 1
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_bm25_corpus_wide_terms_score_zero(spark, corpus):
    from delta_sorter_spark.operators.retrieval import bm25_postings

    posting = bm25_postings(corpus, "doc_id", "text")
    # "the" appears in half the corpus (df=3, N=6): idf_bits = log2(6//3) = 1
    # a df == N term would be 0; check the monotone idf staircase instead of
    # exact floats: rarer terms never get a smaller idf than commoner ones
    rows = posting.select("term", "df", "idf_bits").distinct().collect()
    by_term = {r["term"]: r for r in rows}
    assert by_term["the"]["idf_bits"] == 1
    assert by_term["rust"]["df"] == 2
    assert by_term["rust"]["idf_bits"] >= by_term["the"]["idf_bits"]
    for a in rows:
        for b in rows:
            if a["df"] <= b["df"]:
                assert a["idf_bits"] >= b["idf_bits"]


def test_bm25_exclude_self(spark, corpus):
    from delta_sorter_spark.operators.retrieval import bm25_topk

    queries = corpus.select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    got = bm25_topk(
        corpus, queries, "doc_id", "text", "query_id", "qtext",
        k=3, exclude_self=True,
    )
    assert got.where(F.col("query_id") == F.col("doc_id")).count() == 0


def test_hashed_classifier_deterministic_and_weighted(spark, corpus):
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    a = hashed_linear_score(corpus, "doc_id", "text").orderBy("doc_id").collect()
    b = hashed_linear_score(corpus, "doc_id", "text").orderBy("doc_id").collect()
    assert a == b
    # n_features = unigrams + bigrams = 2 * n_tokens - 1 per document
    n_tok = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    for r in a:
        assert r["n_features"] == 2 * n_tok[r["doc_id"]] - 1
        assert r["label"] == (1 if r["score"] > 0 else 0)


def test_hashed_classifier_custom_weights(spark, corpus):
    """A trained model (bucket -> weight) broadcasts in; unmatched buckets
    drop (sparse model semantics)."""
    from delta_sorter_spark.functions.hashing import spark_md5_long_sql
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    bucket_of_rust = (
        spark.range(1)
        .select((F.expr(spark_md5_long_sql("'rust'")) % 65536).alias("b"))
        .collect()[0]["b"]
    )
    weights = spark.createDataFrame(
        [(int(bucket_of_rust), 7)], "bucket long, weight long"
    )
    got = {
        r["doc_id"]: r
        for r in hashed_linear_score(
            corpus, "doc_id", "text", weights=weights
        ).collect()
    }
    # docs 1 and 5 contain "rust" once each -> score 7, label 1; others absent
    assert set(got) == {1, 5}
    assert got[1]["score"] == 7 and got[1]["label"] == 1
    assert got[5]["n_features"] == 1


def test_hashed_classifier_empty_docs_survive(spark):
    """Empty / whitespace-only documents must not abort the job (slice with
    negative length); they simply contribute no features."""
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "two words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in hashed_linear_score(df, "doc_id", "text").collect()}
    assert set(got) == {3, 4}
    assert got[3]["n_features"] == 1       # 1 unigram, 0 bigrams
    assert got[4]["n_features"] == 3       # 2 unigrams + 1 bigram


def test_sliding_chunks_overlap_and_tail(spark):
    from delta_sorter_spark.operators.dedup import sliding_chunks

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x y")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk_start"], r["chunk"])
        for r in sliding_chunks(df, "doc_id", "text", chunk_words=4, stride=2).collect()
    )
    by_doc = {}
    for d, s, c in got:
        by_doc.setdefault(d, []).append((s, c))
    # doc 1 (7 words): stride starts 1, 3, plus the tail-covering start 4 —
    # every word (incl. the 7th) appears in some chunk
    assert by_doc[1] == [(1, "a b c d"), (3, "c d e f"), (4, "d e f g")]
    assert 2 not in by_doc            # empty doc -> no chunks
    assert by_doc[3] == [(1, "x y")]  # short doc keeps its partial chunk
    # chunk ids stable across invocations
    again = sliding_chunks(df, "doc_id", "text", chunk_words=4, stride=2)
    assert sorted(r["chunk_id"] for r in again.collect()) == sorted(
        r["chunk_id"]
        for r in sliding_chunks(df, "doc_id", "text", chunk_words=4, stride=2).collect()
    )


def test_hashed_classifier_fast_hash_path(spark):
    """portable_hash=False (JVM xxhash64) — same output shape and
    n_features, deterministic, buckets in range."""
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta")], "doc_id long, text string"
    )
    a = hashed_linear_score(df, "doc_id", "text", portable_hash=False).collect()
    b = hashed_linear_score(df, "doc_id", "text", portable_hash=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    got = {r["doc_id"]: r for r in a}
    assert got[1]["n_features"] == 5 and got[2]["n_features"] == 1
    for r in a:
        assert r["label"] in (0, 1)


def test_bm25_topk_serves_from_prebuilt_postings(spark, corpus):
    """bm25_topk(postings=...) must equal the inline-build result — the
    persisted-index serving path."""
    from delta_sorter_spark.operators.retrieval import bm25_postings, bm25_topk

    queries = spark.createDataFrame(
        [(100, "rust garbage collector")], "query_id long, qtext string"
    )
    inline = bm25_topk(
        corpus, queries, "doc_id", "text", "query_id", "qtext", k=5
    ).collect()
    prebuilt = bm25_postings(corpus, "doc_id", "text")
    served = bm25_topk(
        None, queries, "doc_id", None, "query_id", "qtext",
        k=5, postings=prebuilt,
    ).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, served))


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """A near-verbatim copy in the corpus must surface as a candidate pair
    with the benchmark original; an unrelated doc must not."""
    from delta_sorter_spark.operators.dedup import fuzzy_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # same text, one word changed
            (1, "the quick brown fox jumps over the lazy dog near the water"),
            (2, "completely different subject matter entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["corpus_id"], r["bench_id"])
        for r in fuzzy_decontaminate(
            corpus, bench, "doc_id", "text", k=8, bands=4
        ).collect()
    }
    assert (1, 100) in got
    assert (2, 100) not in got


def test_bigram_lm_score_reference_docs_score_lower(spark):
    """Documents drawn from the reference distribution must average fewer
    surprisal bits than out-of-distribution text; unseen bigrams cost the
    backoff."""
    from delta_sorter_spark.operators.textstats import (
        bigram_lm_counts,
        bigram_lm_score,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    lm = bigram_lm_counts(ref, "text")
    cand = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "quantum flux capacitor array")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in bigram_lm_score(cand, lm, "doc_id", "text").collect()
    }
    # doc 1: every bigram seen; "the"->cat/mat splits 50/50 -> 1 bit each,
    # the rest are certain (0 bits)
    assert got[1]["n_bigrams"] == 5
    assert got[1]["total_bits"] == 2
    # doc 2: all bigrams unseen -> 3 * backoff(20)
    assert got[2]["total_bits"] == 60
    assert got[1]["avg_bits_ppm"] < got[2]["avg_bits_ppm"]


def test_bm25_topk_argument_validation(spark):
    """postings/docs are mutually exclusive sources; neither -> clear error,
    both -> clear error (docs would be silently ignored otherwise)."""
    import pytest as _pytest

    from delta_sorter_spark.operators.retrieval import bm25_postings, bm25_topk

    corpus = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    queries = spark.createDataFrame([(9, "alpha")], "query_id long, qtext string")
    with _pytest.raises(ValueError, match="needs docs"):
        bm25_topk(None, queries, "doc_id", None, "query_id", "qtext")
    postings = bm25_postings(corpus, "doc_id", "text")
    with _pytest.raises(ValueError, match="not both"):
        bm25_topk(corpus, queries, "doc_id", "text", "query_id", "qtext",
                  postings=postings)


def test_rrf_fuse_consensus_wins(spark):
    """A doc surfaced by BOTH lists at middling rank beats a doc that tops
    only one list: 2/(60+2)+2... with k_rrf=60, rank-2 hits in two lists
    (2 x 16129032) outscore a single rank-1 hit (16393442)."""
    from delta_sorter_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, id long, rank long"
    )
    dense = spark.createDataFrame(
        [(1, 40, 1), (1, 20, 2), (1, 50, 3)], "query_id long, id long, rank long"
    )
    out = {
        r["id"]: (r["rank"], r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([lex, dense], "query_id", "id", k=10).collect()
    }
    assert out[20][2] == 2 and out[10][2] == 1
    assert out[20][0] == 1  # consensus doc ranks first
    assert out[20][1] == 2 * (1_000_000_000 // 62)
    # the two rank-1 single-list docs tie on score -> id ascending breaks it
    assert out[10][0] == 2 and out[40][0] == 3


def test_rrf_fuse_rejects_empty_input():
    from delta_sorter_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([], "query_id", "id")
