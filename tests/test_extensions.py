"""Unit tests for the extension operators (dedup, similarity, textstats,
multimodal) on small in-memory frames."""

import pytest
from pyspark.sql import functions as F

from delta_sorter_spark.operators.dedup import (
    content_hash_dedup,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from delta_sorter_spark.operators.multimodal import (
    attach_asset_metadata,
    decode_assets,
    frame_sample_plan,
)
from delta_sorter_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_expr,
)
from delta_sorter_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with unique words xylophone"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, k string, v long"
    )
    out = exact_dedup(df, ["k"], "id").orderBy("k").collect()
    assert [(r["k"], r["id"], r["v"]) for r in out] == [("a", 1, 10), ("b", 3, 30)]


def test_content_hash_dedup(docs):
    out = content_hash_dedup(docs, ["text"], "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2, 3}  # 4 deduped into 1


def test_minhash_near_dups_collide(docs):
    sigs = {r["doc_id"]: [r[f"minhash_{j}"] for j in range(8)] for r in minhash_signatures(docs, "doc_id", "text", k=8).collect()}
    assert sigs[1] == sigs[4]  # identical text -> identical signature
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 > agree_13  # near-dup agrees more than unrelated

    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text", k=8, bands=4).collect()
    }
    assert (1, 4) in cands


def test_simhash_distance(docs):
    hs = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert hs[1] == hs[4]
    dist_12 = bin(hs[1] ^ hs[2]).count("1")
    dist_13 = bin(hs[1] ^ hs[3]).count("1")
    assert dist_12 <= dist_13


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert 0.5 <= pairs[(1, 2)] < 1.0
    assert (1, 3) not in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.8, 0.2, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(vectors):
    q = vectors.where(F.col("vec_id") == 0)
    out = brute_force_topk(vectors, q, "vec_id", "embedding", "vec_id", "embedding", k=2).collect()
    assert [(r["rank"], r["id"]) for r in out] == [(1, 1), (2, 4)]


def test_ann_lsh_topk_finds_close_neighbor(vectors):
    q = vectors.where(F.col("vec_id") == 0)
    out = ann_topk(
        vectors, q, "vec_id", "embedding", "vec_id", "embedding", dim=4, k=2, n_planes=2
    ).collect()
    # neighbor 1 is nearly colinear with the query -> same bucket, rank 1
    assert out and out[0]["id"] in (1, 4)


def test_quantized_topk_matches_exact_on_separated_vectors(vectors):
    from delta_sorter_spark.operators.similarity import quantized_topk

    q = vectors.where(F.col("vec_id") == 0)
    out = quantized_topk(
        vectors, q, "vec_id", "embedding", "vec_id", "embedding", k=2, scale=127
    ).collect()
    # well-separated vectors: int8 ranking agrees with exact cosine ranking
    assert [(r["rank"], r["id"]) for r in out] == [(1, 1), (2, 4)]
    # scores are exact integers: floor(.9*127)*127 + floor(.1*127)*floor(0*127)
    assert out[0]["qdot"] == 114 * 127


def test_quantize_expr_floor_semantics(spark):
    from delta_sorter_spark.operators.similarity import quantize_expr

    df = spark.createDataFrame([([1.0, -1.0, 0.004, -0.004],)], "v array<double>")
    got = df.select(quantize_expr("v").alias("q")).collect()[0]["q"]
    # floor, not round: negatives go downward, |q| <= scale stays in int8 range
    assert got == [127, -127, 0, -1]


def test_decontaminate_counts_ngram_collisions(spark):
    from delta_sorter_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a sentence with the quick brown fox inside it"),  # 1 shared 4-gram
            (2, "completely different words here entirely"),
            (3, "the quick brown fox jumps again and again"),  # 2 shared 4-grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in
           decontaminate(corpus, bench, "doc_id", "text", n=4).collect()}
    assert got == {1: 1, 3: 2}


def test_repetition_stats_flags_boilerplate(spark):
    from delta_sorter_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "all words here are unique ones")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text", n=3).collect()}
    # doc 1: 4 trigrams, all identical -> 3 repeats of 4
    assert got[1]["total_ngrams"] == 4 and got[1]["distinct_ngrams"] == 1
    assert got[1]["rep_ratio"] == 0.75
    assert got[2]["rep_ratio"] == 0.0


def test_cosine_expr(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>")
    assert df.select(cosine_expr("a", "b").alias("c")).collect()[0]["c"] == pytest.approx(0.0)


def test_token_stats_and_quality(docs):
    stats = {r["doc_id"]: r for r in token_stats(docs, "doc_id", "text").collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["stopword_ratio"] > 0
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs, "doc_id", "text").collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())


def test_lang_id_deterministic(docs):
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs, "doc_id", "text").collect()}
    assert out[1] == "en"  # 'the' markers


def test_lang_id_pluggable_classifier(docs):
    """classifier= hook (the multimodal decoder= contract): a deployment
    injects a real model; default stays the column-expression heuristic
    (the oracle).  Output schema must be identical either way."""
    def fake_model(text: str) -> str:
        return "xx" if "xylophone" in text else "en"

    hooked = lang_id(docs, "doc_id", "text", classifier=fake_model)
    out = {r["doc_id"]: r["lang_guess"] for r in hooked.collect()}
    assert out == {1: "en", 2: "en", 3: "xx", 4: "en"}
    assert hooked.columns == lang_id(docs, "doc_id", "text").columns


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "hello   world"), (2, " hello world "), (3, "other")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2] != fp[3]
    assert len(fp[1]) == 16


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"payload-one")), (2, bytearray(b"payload-two-longer"))],
        "id long, payload binary",
    ).withColumn("mt", F.lit("image/fake"))
    with_meta = attach_asset_metadata(df, "payload", "image/fake")
    metas = {r["id"]: r["payload_meta"] for r in with_meta.collect()}
    assert metas[1]["n_bytes"] == 11
    assert metas[1]["media_type"] == "image/fake"

    decoded = {r["id"]: r for r in decode_assets(df, "id", "payload", "mt").collect()}
    assert decoded[1]["n_bytes"] == 11
    assert 16 <= decoded[1]["width"] < 80
    # deterministic fake: same payload -> same dims
    again = {r["id"]: r for r in decode_assets(df, "id", "payload", "mt").collect()}
    assert decoded[1]["width"] == again[1]["width"]

    frames = frame_sample_plan(df, "id", "payload", every_n=5)
    assert frames.count() > 0


# stand-ins for a real PIL/ffmpeg call; lambdas so cloudpickle ships them
# by value (a test-module def isn't importable on Spark workers)
_len_decoder = lambda raw: (len(raw), 2 * len(raw))  # noqa: E731
_len_embedder = lambda raw: [float(len(raw))] * 8  # noqa: E731


def test_multimodal_pluggable_codec(spark):
    """A deployment swaps the stub for a real decoder/embedder via the
    ``decoder=`` / ``embedder=`` hooks — no operator fork; the default stays
    the deterministic stub (the oracle path)."""
    from delta_sorter_spark.operators.multimodal import embed_assets, resize_assets

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"abcdefgh"))],
        "id long, payload binary",
    ).withColumn("mt", F.lit("image/fake"))

    dec = {r["id"]: r for r in decode_assets(df, "id", "payload", "mt", decoder=_len_decoder).collect()}
    assert (dec[1]["width"], dec[1]["height"]) == (3, 6)
    assert (dec[2]["width"], dec[2]["height"]) == (8, 16)

    rz = {r["id"]: r for r in resize_assets(df, "id", "payload", max_dim=4, decoder=_len_decoder).collect()}
    assert (rz[2]["width"], rz[2]["height"]) == (8, 16)
    assert rz[2]["resized_height"] == 4  # aspect-preserving fit to max_dim

    emb = {r["id"]: r["embedding"] for r in embed_assets(df, "id", "payload", embedder=_len_embedder).collect()}
    assert emb[1] == [3.0] * 8 and emb[2] == [8.0] * 8

    # default (no hook) is still the md5 stub — the oracle-checked path
    stub = {r["id"]: r for r in decode_assets(df, "id", "payload", "mt").collect()}
    assert 16 <= stub[1]["width"] < 80


# crafted thumbnailer for banding tests: payloads are 64 raw intensity
# bytes, passed through verbatim (lambda so cloudpickle ships it by value)
_raw_thumb = lambda raw: list(raw)  # noqa: E731


def test_phash_exact_dup_found_random_excluded(spark):
    """Same payload ingested twice -> hamming-0 pair; unrelated payloads
    (md5-stub thumbnails, ~32 expected bit flips) stay out at a tight
    Hamming cutoff."""
    from delta_sorter_spark.operators.multimodal import phash_near_dup

    df = spark.createDataFrame(
        [
            (1, bytearray(b"same-image-bytes")),
            (2, bytearray(b"same-image-bytes")),
            (3, bytearray(b"a completely different image")),
            (4, bytearray(b"and a third unrelated payload")),
        ],
        "id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup(df, "id", "payload", max_hamming=4).collect()
    }
    assert pairs == {(1, 2): 0}


def test_phash_banding_guarantee_and_hamming(spark):
    """Pigeonhole: with 4 bands, any pair within 3 flipped bits shares an
    intact band and MUST surface as a candidate; the reported hamming is
    the exact bit distance.  Uses the thumbnailer hook to pass crafted
    pixel grids (the pluggable-decoder contract)."""
    from delta_sorter_spark.operators.multimodal import phash_near_dup

    base = [10] * 32 + [200] * 32  # mean 105 -> bits: 32 zeros, 32 ones
    flipped = list(base)
    # flip 3 bits spread across 3 different bands (pixels 0, 20, 40)
    for p in (0, 20, 40):
        flipped[p] = 200 if flipped[p] == 10 else 10
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(flipped))],
        "id long, payload binary",
    )
    out = phash_near_dup(
        df, "id", "payload", max_hamming=3, thumbnailer=_raw_thumb
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 3)]
    # flipping a 4th bit in the last band removes the guarantee entirely:
    # all 4 bands differ -> no candidate, regardless of the cutoff
    flipped4 = list(flipped)
    flipped4[60] = 200 if flipped4[60] == 10 else 10
    df4 = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(flipped4))],
        "id long, payload binary",
    )
    out4 = phash_near_dup(
        df4, "id", "payload", max_hamming=64, thumbnailer=_raw_thumb
    ).collect()
    assert out4 == []


def test_ahash_bands_match_python_reference(spark):
    """ahash_bands replays the stub thumbnail + average-threshold bit math
    exactly (JVM expressions vs a pure-python reference)."""
    import hashlib

    from delta_sorter_spark.operators.multimodal import (
        ahash_bands,
        thumbnail_assets,
    )

    payloads = [b"img-a", b"img-b", b"img-c"]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id long, payload binary",
    )
    got = {
        r["id"]: list(r["bands"])
        for r in ahash_bands(
            thumbnail_assets(df, "id", "payload"), "id", "pixels"
        ).collect()
    }
    for i, p in enumerate(payloads):
        pixels = []
        for j in range(4):
            pixels.extend(hashlib.md5(p + str(j).encode()).digest())
        avg = sum(pixels) // 64
        want = [
            sum((1 << b) for b in range(16) if pixels[16 * w + b] > avg)
            for w in range(4)
        ]
        assert got[i] == want, f"payload {i}"


def test_cosine_neardup_pairs_exact_and_blocked(spark):
    from delta_sorter_spark.operators.similarity import (
        cosine_neardup_pairs,
        lsh_bucket_expr,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = cosine_neardup_pairs(df, "vec_id", "embedding", threshold=0.9)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} == {(1, 2)}

    blocked_df = df.withColumn("blk", lsh_bucket_expr("embedding", 4, n_planes=4))
    blocked = cosine_neardup_pairs(
        blocked_df, "vec_id", "embedding", threshold=0.9, block_col="blk"
    )
    # blocking never invents pairs; near-identical vectors share every bucket
    assert {(r["id_a"], r["id_b"]) for r in blocked.collect()} == {(1, 2)}


def test_bpe_token_stats(spark):
    from delta_sorter_spark.operators.textstats import bpe_token_stats

    df = spark.createDataFrame(
        [(1, "hello world42, x=1!")], "doc_id long, text string"
    )
    row = bpe_token_stats(df, "doc_id", "text").collect()[0]
    # hello | world | 42 | , | x | = | 1 | !
    assert row["n_bpe_tokens"] == 8
    assert row["n_word_tokens"] == 3
    assert row["n_number_tokens"] == 2
    assert row["n_symbol_tokens"] == 3


def test_count_min_sketch_overestimates(spark):
    from delta_sorter_spark.operators.sketches import cms_estimate, count_min_sketch

    rows = [(f"u{i % 7}",) for i in range(200)] + [("hot",)] * 50
    df = spark.createDataFrame(rows, "k string")
    sketch = count_min_sketch(df, "k", depth=4, width=16)
    cells = sketch.collect()
    assert sum(r["cnt"] for r in cells) == 4 * 250  # every row lands in each depth
    assert all(0 <= r["bucket"] < 16 for r in cells)

    est = {r["value"]: r["est_cnt"] for r in cms_estimate(df, "k", sketch, depth=4, width=16).collect()}
    exact = {f"u{i}": 200 // 7 + (1 if i < 200 % 7 else 0) for i in range(7)}
    exact["hot"] = 50
    for k, true_cnt in exact.items():
        assert est[k] >= true_cnt  # CM never underestimates
    assert est["hot"] < 250  # and the min over depths keeps it bounded


def test_hash_split_deterministic_and_proportional(spark):
    from delta_sorter_spark.operators.sampling import hash_split

    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    assert s1 == s2  # pure function of the id
    from collections import Counter

    c = Counter(s1.values())
    assert 0.75 < c["train"] / 5000 < 0.85
    assert 0.07 < c["val"] / 5000 < 0.13
    assert 0.07 < c["test"] / 5000 < 0.13
    # different seed -> different assignment (salting works)
    s3 = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", seed="v2").collect()}
    assert s3 != s1


def test_pack_sequences_respects_budget(spark):
    from delta_sorter_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", 300) for i in range(10)] + [(99, "s", 5000)],
        "doc_id long, shard string, n_tokens long",
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=1000, shard_col="shard")
    rows = {r["doc_id"]: r for r in packed.collect()}
    # offsets always inside the window
    assert all(0 <= r["bin_offset"] < 1000 for r in rows.values())
    # concatenate-and-cut: doc i starts at 300*i tokens -> bin = (300*i)//1000
    for i in range(10):
        assert rows[i]["bin_id"] == (300 * i) // 1000
        assert rows[i]["bin_offset"] == (300 * i) % 1000
    # oversized doc is capped at one budget for accounting, not split
    assert rows[99]["bin_id"] == 3000 // 1000


def test_resize_assets_shape(spark):
    from delta_sorter_spark.operators.multimodal import resize_assets

    df = spark.createDataFrame(
        [(1, bytearray(b"img-one")), (2, bytearray(b"img-two-bytes"))],
        "id long, payload binary",
    )
    out = {r["id"]: r for r in resize_assets(df, "id", "payload", max_dim=16).collect()}
    for r in out.values():
        assert max(r["resized_width"], r["resized_height"]) <= 16
        assert r["resized_bytes"] == r["resized_width"] * r["resized_height"] * 3
    again = {r["id"]: r for r in resize_assets(df, "id", "payload", max_dim=16).collect()}
    assert out == again


def test_winnowing_detects_partial_overlap(spark):
    from delta_sorter_spark.operators.dedup import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, "INTRO AAA. " + shared + " OUTRO BBB."),
            (2, "totally different prefix text here. " + shared),
            (3, "no overlap with the others at all, completely unrelated words"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=5, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # docs sharing a long substring share fingerprints; unrelated docs share few
    overlap_12 = len(by_doc[1] & by_doc[2])
    overlap_13 = len(by_doc[1] & by_doc[3])
    assert overlap_12 > 5
    assert overlap_13 < overlap_12 // 2


def test_hll_merge_and_accuracy(spark):
    """HLL state is mergeable (max per bucket) and the raw estimator lands
    within the ~13% design error for m=64."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.sketches import hll_estimate, hll_registers

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("v"))
    full = hll_registers(df, "v")

    # merge of two disjoint halves == registers of the whole
    lo = hll_registers(df.where(F.col("v") < "user-25"), "v")  # string split
    hi = hll_registers(df.where(F.col("v") >= "user-25"), "v")
    merged = (
        lo.unionByName(hi)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    est = hll_estimate(full).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 0.2  # 1.04/sqrt(64) ~= 13% + slack


def test_bloom_prefilter_no_false_negatives(spark):
    """Every true member passes the filter (bloom guarantee); non-members
    mostly don't."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.sketches import bloom_bits, bloom_prefilter

    members = spark.range(0, 500).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    probe = spark.range(0, 5000).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    bits = bloom_bits(members, "v")
    passed = {r["v"] for r in bloom_prefilter(probe, "v", bits).collect()}
    assert all(f"k{i}" in passed for i in range(500))  # no false negatives
    fp = len(passed) - 500
    assert fp / 4500 < 0.05  # ~0.1% design FP rate + generous slack


def test_doc_chunks_short_doc_yields_no_chunks(spark):
    from delta_sorter_spark.operators.dedup import doc_chunks

    df = spark.createDataFrame(
        [(1, "only three words", "s"), (2, " ".join(["w"] * 25), "s")],
        "doc_id long, text string, source string",
    )
    out = doc_chunks(df, chunk_words=10).collect()
    # doc 1: 0 chunks (3 words < 10); doc 2: 2 full chunks, trailing 5 dropped
    assert len(out) == 2
    assert all(r.doc_id == 2 and len(r.chunk.split(" ")) == 10 for r in out)


def test_unigram_surprisal_hand_computed(spark):
    """bits(token) = floor(log2(corpus count)), summed per doc: verify on
    a corpus with known counts (x:3, y:1, z:2 -> bits 1, 0, 1)."""
    from delta_sorter_spark.operators.textstats import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x  z"), (3, "z")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_freq_bits"], r["avg_freq_bits"])
        for r in unigram_surprisal(df, "doc_id", "text").collect()
    }
    # doc1: x(1)+x(1)+y(0)=2 over 3; doc2: x(1)+z(1)=2 over 2; doc3: z(1)
    assert got == {
        1: (3, 2, round(2 / 3, 6)),
        2: (2, 2, 1.0),
        3: (1, 1, 1.0),
    }


def test_bigram_surprisal_hand_computed(spark):
    """bits(C(w1 as prefix)) - bits(C(w1 w2)) per bigram occurrence, on a
    corpus with known counts; single-token and empty docs drop."""
    from delta_sorter_spark.operators.textstats import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "a"), (4, "  ")],
        "doc_id long, text string",
    )
    # bigram occurrences: doc1 = (a,b) (b,a) (a,b); doc2 = (a,b) (b,c)
    # prefix counts: C(a·)=3, C(b·)=2; bigram counts: C(a,b)=3, C(b,a)=1,
    # C(b,c)=1.  bits = floor(log2): bits(3)=1, bits(2)=1, bits(1)=0.
    # doc1: (a,b)->1-1=0, (b,a)->1-0=1, (a,b)->0  => sum 1 over 3
    # doc2: (a,b)->0, (b,c)->1-0=1                => sum 1 over 2
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_cond_bits"], r["avg_cond_bits"])
        for r in bigram_surprisal(df, "doc_id", "text").collect()
    }
    assert got == {
        1: (3, 1, round(1 / 3, 6)),
        2: (2, 1, 0.5),
    }


def test_redact_sequential_masking(spark):
    from delta_sorter_spark.operators.textstats import redact

    rows = [
        (1, "mail bob.smith+x@corp.example.com from 10.0.0.1 ref 12345"),
        (2, "no pii here"),
        (3, "ids 42 and 867 and 10.1.2.3"),
    ]
    out = {
        r["rec_id"]: r
        for r in redact(
            spark.createDataFrame(rows, "rec_id long, text string"),
            ["rec_id"],
            "text",
        ).collect()
    }
    r1 = out[1]
    assert r1["clean"] == "mail [EMAIL] from [IPV] ref [IDNUM]"
    # sequential semantics: digits inside the email/IP never double-count
    assert (r1["n_email"], r1["n_ipv4"], r1["n_idnum"]) == (1, 1, 1)
    assert out[2]["clean"] == "no pii here"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_idnum"]) == (0, 0, 0)
    assert out[3]["clean"] == "ids [IDNUM] and [IDNUM] and [IPV]"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_idnum"]) == (0, 1, 2)


def test_deterministic_shuffle_is_stable_and_balanced(spark):
    from delta_sorter_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = deterministic_shuffle(df, "doc_id", n_shards=8).collect()
    b = deterministic_shuffle(df.repartition(13), "doc_id", n_shards=8).collect()
    ka = sorted((r["doc_id"], r["shard"], r["pos"]) for r in a)
    kb = sorted((r["doc_id"], r["shard"], r["pos"]) for r in b)
    assert ka == kb  # identical across physical layouts
    # (shard, pos) is a dense total order: positions are 0..n_i-1 per shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for _, s, p in ka:
        by_shard[s].append(p)
    assert set(by_shard) == set(range(8))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # not the identity order: hash ordering actually permutes
    first_shard = sorted(by_shard.keys())[0]
    ids_in_order = [d for d, s, p in sorted(ka, key=lambda t: (t[1], t[2])) if s == first_shard]
    assert ids_in_order != sorted(ids_in_order)


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Continuously-ingested-corpus dedup: batch 2 drops content already
    accepted from batch 1 (cross-batch, hash-index based), intra-batch
    duplicates collapse to the first id, and a replayed batch is a
    SetTransaction no-op."""
    from delta_sorter_spark.operators.dedup import (
        dedup_against_index,
        incremental_dedup,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    idx_path = str(tmp_path / "dedup_index")
    DeltaTable.create(
        spark,
        idx_path,
        spark.createDataFrame([], "content_hash long, doc_id long"),
    )
    idx = DeltaTable(spark, idx_path)

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    res1 = incremental_dedup(idx, b1, "doc_id", "text",
                             txn_app_id="ingest", txn_version=1)
    assert res1["batch_rows"] == 3
    assert res1["new_rows"] == 2  # alpha (kept as doc 1) + beta

    # batch 2: one repeat of batch-1 content, one intra-batch dup, one new
    b2 = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"), (12, "gamma text")],
        "doc_id long, text string",
    )
    survivors = dedup_against_index(idx.to_df(), b2, "doc_id", "text")
    assert sorted(r["doc_id"] for r in survivors.collect()) == [11]
    res2 = incremental_dedup(idx, b2, "doc_id", "text",
                             txn_app_id="ingest", txn_version=2)
    assert res2["new_rows"] == 1  # only gamma

    # the index now holds exactly the three accepted contents
    got = {(r["content_hash"], r["doc_id"]) for r in idx.to_df().collect()}
    assert {d for _h, d in got} == {1, 2, 11}

    # replaying batch 2 is a no-op before any compute
    res3 = incremental_dedup(idx, b2, "doc_id", "text",
                             txn_app_id="ingest", txn_version=2)
    assert res3.get("skipped") and res3["new_rows"] == 0
    assert idx.to_df().count() == 3


def test_incremental_dedup_lost_race_reports_zero(spark, tmp_path):
    """Twin-worker SetTransaction race: the loser's append lands AFTER a
    winner committed the identical (appId, version) marker.  Re-reading the
    winning commit cannot distinguish winner from loser (the marker matches
    both), so the skip branch must key on append's committed flag — the
    loser reports batch_rows=0/new_rows=0/skipped and registers nothing."""
    from delta_sorter_spark.operators.dedup import incremental_dedup
    from delta_sorter_spark.sources.delta_table import DeltaTable

    idx_path = str(tmp_path / "race_index")
    DeltaTable.create(
        spark,
        idx_path,
        spark.createDataFrame([], "content_hash long, doc_id long"),
    )
    idx = DeltaTable(spark, idx_path)
    batch = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id long, text string"
    )
    # the loser snapshots table state BEFORE the winner commits (both twins
    # pre-checked concurrently and saw no marker)
    stale_state = idx.state()

    winner = incremental_dedup(idx, batch, "doc_id", "text",
                               txn_app_id="ingest", txn_version=1)
    assert winner["new_rows"] == 2 and not winner.get("skipped")

    loser_table = DeltaTable(spark, idx_path)
    # pre-check (and the anti-join read) see the old world
    loser_table.state = lambda version=None: stale_state
    loser = incremental_dedup(loser_table, batch, "doc_id", "text",
                              txn_app_id="ingest", txn_version=1)
    assert loser.get("skipped")
    assert loser["batch_rows"] == 0 and loser["new_rows"] == 0
    # nothing double-registered
    assert idx.to_df().count() == 2


def test_funnel_strictly_after_and_cohorts(spark):
    from delta_sorter_spark.operators.events_analytics import (
        funnel_counts,
        retention_cohorts,
    )

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-02 09:00:00", "purchase"),
        # user 2: click BEFORE first view -> stops at step 1
        (2, "2024-01-01 08:00:00", "click"),
        (2, "2024-01-01 09:00:00", "view"),
        # user 3: click at the SAME instant as view -> not strictly after
        (3, "2024-01-03 12:00:00", "view"),
        (3, "2024-01-03 12:00:00", "click"),
        # user 4: never viewed
        (4, "2024-01-01 10:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(ev, "user_id", "ts", "event_type",
                               ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}

    coh = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in retention_cohorts(ev, "user_id", "ts").collect()
    }
    # users 1,2,4 first seen 01-01; user 1 also active 01-02; user 3 on 01-03
    assert coh[("2024-01-01", 0)] == 3
    assert coh[("2024-01-01", 1)] == 1
    assert coh[("2024-01-03", 0)] == 1
    assert len(coh) == 3


def test_bigram_lm_counts_short_text_guard(spark):
    from delta_sorter_spark.operators.textstats import bigram_lm_counts

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a"), (3, ""), (4, "b a")],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"]): (r["n_bigram"], r["n_context"], r["prob_ppm"])
        for r in bigram_lm_counts(docs, "text").collect()
    }
    # doc 1: (a,b)x2 (b,a)x1 (b,c)x1; doc 4: (b,a)x1; docs 2,3: no bigrams
    assert got[("a", "b")] == (2, 2, 1000000)
    assert got[("b", "a")] == (2, 3, 666666)
    assert got[("b", "c")] == (1, 3, 333333)
    assert len(got) == 3


def test_containment_pairs_detects_embedded_doc(spark):
    """A short doc fully contained in a long one: containment ~1.0 for the
    short side even though Jaccard is far below threshold."""
    from delta_sorter_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    inner = "the quick brown fox jumps over the lazy dog"
    outer = inner + " " + " ".join(
        f"unrelated{i} padding{i} boilerplate{i} navigation{i}" for i in range(12)
    )
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "completely unrelated content here")],
        "doc_id long, text string",
    )
    got = containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    (row,) = got
    assert row["containment_a"] >= 0.99  # nearly all of doc 1 is in doc 2
    assert row["containment_b"] < 0.25  # ...but doc 1 is a sliver of doc 2
    # Jaccard misses the same pair at any comparable threshold
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    assert not [(r["id_a"], r["id_b"]) for r in jac if (r["id_a"], r["id_b"]) == (1, 2)]


def test_containment_candidates_restriction(spark):
    from delta_sorter_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc"), (2, "aaa bbb ccc ddd"), (3, "aaa bbb ccc eee")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = containment_pairs(
        docs, "doc_id", "text", threshold=0.1, candidates=cands
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]


def test_weighted_priority_sample_properties(spark):
    """Deterministic across runs; k rows; heavier weights overrepresented."""
    from delta_sorter_spark.operators.sampling import weighted_priority_sample

    rows = [(i, "x" * (1000 if i < 50 else 10)) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = weighted_priority_sample(docs, "doc_id", "length(text)", k=50)
    b = weighted_priority_sample(docs, "doc_id", "length(text)", k=50)
    ga = sorted((r["doc_id"], r["priority"]) for r in a.collect())
    gb = sorted((r["doc_id"], r["priority"]) for r in b.collect())
    assert ga == gb and len(ga) == 50
    heavy = sum(1 for d, _ in ga if d < 50)
    # 10% of docs hold ~91% of the total weight -> they must dominate the
    # sample (deterministic given the fixed seed)
    assert heavy >= 30
    # a different seed reshuffles
    c = weighted_priority_sample(docs, "doc_id", "length(text)", k=50, seed="other")
    assert sorted((r["doc_id"], r["priority"]) for r in c.collect()) != ga


def test_hll_grouped_estimate_accuracy_and_merge(spark):
    """Grouped-HLL: estimate lands within the expected error band, and
    registers merged from two halves equal the whole (mergeability)."""
    from delta_sorter_spark.operators.sketches import (
        hll_grouped_estimate,
        hll_grouped_registers,
    )

    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    regs = hll_grouped_registers(df, "v", p=9)
    (est,) = hll_grouped_estimate(regs, p=9).collect()
    assert abs(est["estimate"] - n) / n < 0.15  # ~1.04/sqrt(512) = 4.6% expected
    # merge: max per register over the two halves == whole-corpus registers
    h1 = hll_grouped_registers(df.where("CAST(v AS BIGINT) < 2500"), "v", p=9)
    h2 = hll_grouped_registers(df.where("CAST(v AS BIGINT) >= 2500"), "v", p=9)
    merged = (
        h1.unionByName(h2).groupBy("register").agg(F.max("rho").alias("rho"))
    )
    whole = {(r["register"], r["rho"]) for r in regs.collect()}
    assert {(r["register"], r["rho"]) for r in merged.collect()} == whole


def test_dedup_keep_best_prefers_high_score(spark):
    from delta_sorter_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 1), (10, 7)],
        "doc_id long, score long",
    )
    # cluster {1,2,3} (chain), singleton {4}, singleton {10}
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, "doc_id", "score").collect()
    )
    # ties on score 9 break to the SMALLER id (2, not 3)
    assert kept == [2, 4, 10]


def test_dedup_keep_best_string_ids(spark):
    """Tie-break is type-agnostic: string/UUID doc ids break score ties to
    the lexicographically smallest id (a ``-id`` negation trick would cast
    them to null and pick nondeterministically); all-NULL-score clusters
    still keep their smallest id."""
    from delta_sorter_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [("a", 5.0), ("b", 9.0), ("c", 9.0), ("d", None), ("e", None)],
        "doc_id string, score double",
    )
    # cluster {a,b,c}: tie at 9.0 -> "b"; cluster {d,e}: all-null -> "d"
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "id_a string, id_b string"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, "doc_id", "score").collect()
    )
    assert kept == ["b", "d"]


def test_repeated_ngram_spans_and_removal(spark):
    """Two docs share an 8-token boilerplate run; span detection finds the
    merged interval in each, and removal strips exactly those tokens."""
    from delta_sorter_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_ngram_spans,
    )

    boiler = "subscribe to our newsletter for all the latest updates today"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta epsilon"),
            (2, f"{boiler} zeta eta theta iota kappa unique2"),
            (3, "totally different content with no shared runs at all here"),
        ],
        "doc_id long, text string",
    )
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=8, min_docs=2)
    got = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in spans.collect()}
    # doc 1: boiler occupies tokens 3..13; doc 2: tokens 0..10 — the three
    # overlapping 8-gram hits merge into ONE span each
    assert got == {1: (3, 13), 2: (0, 10)}
    assert spans.count() == 2

    cleaned = remove_repeated_spans(docs, spans, "doc_id", "text")
    out = {r["doc_id"]: (r["text"], r["tokens_removed"]) for r in cleaned.collect()}
    assert out[1] == ("alpha beta gamma delta epsilon", 10)
    assert out[2] == ("zeta eta theta iota kappa unique2", 10)
    assert out[3][1] == 0 and "shared runs" in out[3][0]


def test_sorted_neighborhood_pairs(spark):
    """Typo-adjacent records (no shared shingle bucket needed) pair up when
    their normalized prefixes sort next to each other; window bounds the
    candidate count at O(n * window)."""
    from delta_sorter_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [
            (1, "smith john 123 main st"),
            (2, "smith jhon 123 main st"),   # typo neighbor of 1
            (3, "zzz completely elsewhere"),
            (4, "adams mary 9 oak ave"),
        ],
        "doc_id long, text string",
    )
    pairs = sorted_neighborhood_pairs(
        docs, "doc_id", "substring(lower(trim(text)), 1, 8)", window=2
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # sort order: adams(4), smith jhon(2), smith john(1), zzz(3)
    assert got == {(4, 2), (2, 1), (1, 3)}
    assert all(r["dist"] == 1 for r in pairs)
    # window=3 adds the dist-2 pairs
    n3 = sorted_neighborhood_pairs(
        docs, "doc_id", "substring(lower(trim(text)), 1, 8)", window=3
    ).count()
    assert n3 == 3 + 2


def test_embed_assets_deterministic_and_feeds_ann(spark):
    """The stub encoder emits one fixed-dim array<double> per payload,
    deterministic across runs, and its output plugs straight into the
    similarity operators (identical payloads -> cosine 1.0 neighbors)."""
    from delta_sorter_spark.operators.multimodal import EMBED_DIM, embed_assets
    from delta_sorter_spark.operators.similarity import brute_force_topk

    assets = spark.createDataFrame(
        [(1, b"payload-a"), (2, b"payload-a"), (3, b"payload-b")],
        "id long, payload binary",
    )
    emb = embed_assets(assets, "id", "payload")
    rows = {r["id"]: r["embedding"] for r in emb.collect()}
    assert all(len(v) == EMBED_DIM for v in rows.values())
    assert rows[1] == rows[2] != rows[3]
    again = {r["id"]: r["embedding"] for r in embed_assets(assets, "id", "payload").collect()}
    assert again == rows

    top = brute_force_topk(emb, emb.where("id = 1"), "id", "embedding", "id", "embedding", k=1).collect()
    assert [(r["query_id"], r["id"], round(r["cosine"], 6)) for r in top] == [(1, 2, 1.0)]


def test_weighted_priority_sample_fractional_weights(spark):
    """Quality-score weights in (0, 1) must NOT zero out: the ppm weight
    quantization keeps them meaningful (regression for the bare BIGINT cast
    that silently emptied the sample)."""
    from delta_sorter_spark.operators.sampling import weighted_priority_sample

    rows = [(i, 0.9 if i < 20 else 0.05) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    got = weighted_priority_sample(df, "doc_id", "q", k=30).collect()
    assert len(got) == 30  # nothing dropped to zero priority
    heavy = sum(1 for r in got if r["doc_id"] < 20)
    assert heavy >= 12  # 10% of rows hold 18x the weight -> dominate


def test_diff_snapshots_classifies_changes(spark):
    from delta_sorter_spark.operators.diff import diff_snapshots, diff_summary

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, v string, x long"
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "d", 40)],
        "id long, v string, x long",
    )
    got = {r["id"]: r["change"] for r in diff_snapshots(old, new, ["id"]).collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}  # 2 unchanged, absent
    counts = {r["change"]: r["n"] for r in diff_summary(old, new, ["id"]).collect()}
    assert counts == {"delete": 1, "update": 1, "insert": 1}
    # compare_cols restriction: x-only comparison sees no update on id 3
    got2 = {
        r["id"]: r["change"]
        for r in diff_snapshots(old, new, ["id"], compare_cols=["x"]).collect()
    }
    assert got2 == {1: "delete", 4: "insert"}


def test_sorted_neighborhood_window_validation(spark):
    import pytest as _pytest

    from delta_sorter_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(docs, "doc_id", "text", window=1)


def test_delete_where_dv_rejects_unknown_format(spark, tmp_path):
    import pytest as _pytest

    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    t = DeltaTable.create(
        spark, str(tmp_path / "fmt"),
        spark.createDataFrame([(1,)], "id long").coalesce(1),
    )
    with _pytest.raises(ValueError, match="vector_format"):
        delete_where_dv(t, "id = 1", vector_format="json")


def test_validity_intervals_scd2(spark):
    from delta_sorter_spark.operators.events_analytics import validity_intervals

    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        (2, 15, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v string")
    out = {
        (r["k"], r["t"]): (r["valid_to_t"], r["is_current"])
        for r in validity_intervals(df, ["k"], ["t"]).collect()
    }
    assert out == {
        (1, 10): (20, False),
        (1, 20): (30, False),
        (1, 30): (None, True),
        (2, 15): (None, True),
    }


def test_validity_intervals_full_tuple(spark):
    """Multi-column change logs round-trip: EVERY order column gets a
    valid_to_<c>, and is_current is row-existence based."""
    from delta_sorter_spark.operators.events_analytics import validity_intervals

    rows = [(1, 10, 1, "a"), (1, 10, 2, "b"), (1, 20, 1, "c")]
    df = spark.createDataFrame(rows, "k long, t long, seq long, v string")
    out = {
        (r["t"], r["seq"]): (r["valid_to_t"], r["valid_to_seq"], r["is_current"])
        for r in validity_intervals(df, ["k"], ["t", "seq"]).collect()
    }
    assert out == {
        (10, 1): (10, 2, False),
        (10, 2): (20, 1, False),
        (20, 1): (None, None, True),
    }


def test_scd2_compress_collapses_noop_versions(spark):
    """Consecutive identical attribute rows collapse to one interval; a
    value that REVERTS later starts a fresh interval (runs, not groups);
    NULL attributes compare equal within a run."""
    from delta_sorter_spark.operators.events_analytics import scd2_compress

    rows = [
        # key 1: a,a,b,b,b,a  -> three runs (a revert reopens "a")
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b"), (1, 50, "b"),
        (1, 60, "a"),
        # key 2: NULL,NULL -> one run
        (2, 15, None), (2, 25, None),
    ]
    df = spark.createDataFrame(rows, "k long, t long, status string")
    out = sorted(
        (r["k"], r["status"], r["valid_from_t"], r["valid_to_t"], r["n_rows"], r["is_current"])
        for r in scd2_compress(df, ["k"], ["status"], ["t"]).collect()
    )
    assert out == [
        (1, "a", 10, 30, 2, False),
        (1, "a", 60, None, 1, True),
        (1, "b", 30, 60, 3, False),
        (2, None, 15, None, 2, True),
    ]


def test_fuzzy_neighborhood_linkage_catches_typos(spark):
    """A one-character typo rewrites every covering shingle (MinHash-invisible
    for short fields) but sorts adjacent and verifies at edit distance 1."""
    from delta_sorter_spark.operators.dedup import fuzzy_neighborhood_linkage

    rows = [
        (1, "john smith"),
        (2, "john smyth"),   # 1 edit from id 1
        (3, "mary jones"),
        (4, "mary janes"),   # 1 edit from id 3
        (5, "zzz unrelated"),
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in fuzzy_neighborhood_linkage(
            df, "rec_id", "name", "name", window=3, max_dist=2
        ).collect()
    }
    # id_a is the EARLIER record in sort order ("mary janes" < "mary jones")
    assert got == {(4, 3): 1, (1, 2): 1}


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from delta_sorter_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "Ab x")], "doc_id long, text string"
    )
    # vocab: ab=3 (case-folded), abc=1, x=1 (single char -> no pairs)
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(df, "text").collect()}
    assert got == {"ab": 4, "bc": 1}
    # top_n keeps the most frequent with deterministic tie order
    top = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, "text", top_n=1).collect()]
    assert top == [("ab", 4)]


def test_filtered_topk_respects_filter(spark):
    from delta_sorter_spark.operators.similarity import filtered_topk

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [1.0, 0.05], "b"),  # closer than 1, but wrong label
        (3, [0.0, 1.0], "a"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    q = emb.where(F.col("vec_id") == 0)
    out = filtered_topk(
        emb, q, "vec_id", "embedding", "label", "vec_id", "embedding", k=2
    ).collect()
    assert [(r["rank"], r["id"]) for r in out] == [(1, 1), (2, 3)]


def test_heavy_hitters_exact_and_partitioning_invariant(spark):
    from delta_sorter_spark.operators.sketches import heavy_hitters

    # 60 'a', 30 'b', and 30 distinct singletons: N=120; with k=3 the
    # threshold is N/4=30, so only 'a' qualifies (b is exactly at it).
    vals = ["a"] * 60 + ["b"] * 30 + [f"x{i}" for i in range(30)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    for parts in (1, 7):
        got = {
            r["item"]: r["n"]
            for r in heavy_hitters(df.repartition(parts), "tok", k=3).collect()
        }
        assert got == {"a": 60}


def test_misra_gries_candidates_superset_guarantee(spark):
    from delta_sorter_spark.operators.sketches import misra_gries_candidates

    vals = ["hot"] * 50 + [f"cold{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(4)
    cands = {r["item"] for r in misra_gries_candidates(df, "tok", k=2).collect()}
    assert "hot" in cands
    # bounded output: at most k rows per partition
    assert len(cands) <= 2 * 4


def test_pagerank_star_graph_centrality(spark):
    from delta_sorter_spark.operators.graph import PR_SCALE, pagerank

    # hub 1 <-> leaves 2,3; node 4 isolated (pure dangling mass)
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id bigint")
    pairs = [(1, 2), (2, 1), (1, 3), (3, 1)]
    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    got = {r["id"]: r["rank_q"] for r in pagerank(nodes, edges, n_iters=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    # hub most central, symmetric leaves tie, isolated node least
    assert got[1] > got[2] == got[3] > got[4]
    # mass conservation up to floor-division quantization (<= a few ulp/node/iter)
    assert abs(sum(got.values()) - PR_SCALE) < 100
    # float power-iteration reference: same 3 steps in exact arithmetic
    ranks = {v: 0.25 for v in (1, 2, 3, 4)}
    deg = {1: 2, 2: 1, 3: 1}
    for _ in range(3):
        dang = ranks[4]
        inc = {v: 0.0 for v in ranks}
        for s, d in pairs:
            inc[d] += ranks[s] / deg[s]
        ranks = {v: 0.15 / 4 + 0.85 * (inc[v] + dang / 4) for v in ranks}
    for v, want in ranks.items():
        assert abs(got[v] / PR_SCALE - want) < 1e-6


def test_pagerank_partitioning_invariance(spark):
    from delta_sorter_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(30)], "id bigint")
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 30) for i in range(30)]
        + [(i, (i * 11 + 5) % 30) for i in range(0, 30, 2)],
        "src bigint, dst bigint",
    )
    a = {r["id"]: r["rank_q"] for r in pagerank(nodes, edges, n_iters=4).collect()}
    b = {
        r["id"]: r["rank_q"]
        for r in pagerank(
            nodes.repartition(7), edges.repartition(5), n_iters=4
        ).collect()
    }
    assert a == b  # bit-identical: integer fixed-point is order-independent


def test_train_bpe_matches_reference_implementation(spark):
    from delta_sorter_spark.operators.textstats import train_bpe

    texts = [
        "low lower lowest",
        "new newer newest lower",
        "low low new news",
        "widest wide wider new",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, "text", n_merges=8, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]

    # exact Sennrich-style reference on the same word-frequency table
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in freqs.items()}
    want = []
    for rank in range(8):
        counts = {}
        for toks, n in vocab.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = counts.get((toks[i], toks[i + 1]), 0) + n
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        want.append((rank, a, b, n))
        new_vocab = {}
        for toks, cnt in vocab.items():
            out, pend = [], ""
            for x in toks:
                if pend == "":
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = ""
                else:
                    out.append(pend)
                    pend = x
            if pend:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    assert got == want
    assert len(got) == 8  # this corpus supports all 8 merges


def test_bpe_encode_replays_training_segmentation(spark):
    """Encoding the training corpus with the learned merges reproduces the
    trainer's final word segmentations (and a pure-Python apply)."""
    from delta_sorter_spark.operators.textstats import bpe_encode, train_bpe

    texts = [
        "low lower lowest",
        "new newer newest lower",
        "low low new news",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(df, "text", n_merges=6, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    got = {
        r["id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }

    def apply_word(w):
        toks = list(w) + ["</w>"]
        for a, b in merges:
            out, pend = [], ""
            for x in toks:
                if pend == "":
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = ""
                else:
                    out.append(pend)
                    pend = x
            if pend:
                out.append(pend)
            toks = out
        return toks

    for i, t in enumerate(texts):
        want = [tok for w in t.lower().split() for tok in apply_word(w)]
        assert got[i] == (want, len(want)), f"doc {i}"


def test_bpe_encode_no_merges_is_char_split(spark):
    from delta_sorter_spark.operators.textstats import bpe_encode

    df = spark.createDataFrame([(0, "ab c")], "doc_id long, text string")
    row = bpe_encode(df, "doc_id", "text", []).collect()[0]
    assert list(row["tokens"]) == ["a", "b", "</w>", "c", "</w>"]
    assert row["n_tokens"] == 5


def test_unigram_encode_replays_training_segmentation(spark):
    """Encoding the training corpus under the learned piece table must
    reproduce the trainer's final per-piece counts exactly — same DP, same
    tie order, same float-product order (the encode-side functional pin,
    mirroring the BPE encode test)."""
    import collections

    from delta_sorter_spark.operators.textstats import (
        train_unigram_lm,
        unigram_encode,
    )

    df = spark.createDataFrame(
        [
            (1, "low lower lowest new newer newest wide wider widest"),
            (2, "low low lower new new newest wide wide wider"),
            (3, "the new low wide the newest lowest"),
        ],
        "id long, text string",
    )
    pieces = train_unigram_lm(df, "text", vocab_size=24, n_iters=2, max_piece_len=3)
    enc = unigram_encode(df, "id", "text", pieces)
    cnt = collections.Counter()
    for r in enc.collect():
        for p in r["pieces"]:
            cnt[p] += 1
    learned = {r["piece"]: r["n"] for r in pieces.collect() if r["n"] > 0}
    assert dict(cnt) == learned
    # pieces concatenate back to the words, in document order
    row1 = {r["id"]: r["pieces"] for r in enc.collect()}[1]
    assert "".join(row1) == "lowlowerlowestnewnewernewestwidewiderwidest"


def test_unigram_encode_unknown_chars_become_unk(spark):
    from delta_sorter_spark.operators.textstats import unigram_encode

    df = spark.createDataFrame([(1, "ab zq")], "id long, text string")
    # vocabulary knows only a, b, z
    enc = unigram_encode(
        df, "id", "text", [("a", 400_000_000), ("b", 300_000_000), ("z", 200_000_000)]
    ).collect()[0]
    assert list(enc["pieces"]) == ["a", "b", "z", "<unk>"]
    assert enc["n_pieces"] == 4
    # accepts a custom unk marker and a piece list (not just a DataFrame)
    enc2 = unigram_encode(
        df, "id", "text", [("ab", 500_000_000), ("z", 100_000_000)], unk="?"
    ).collect()[0]
    assert list(enc2["pieces"]) == ["ab", "z", "?"]


def test_temperature_mix_flattens_toward_tail_domains(spark):
    from delta_sorter_spark.operators.sampling import temperature_mix

    # head domain 900 docs, tail domain 100 docs
    rows = [(i, "head") for i in range(900)] + [(900 + i, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def rates(alpha_q):
        out = temperature_mix(
            df, "doc_id", "source", budget=200, alpha_quarters=alpha_q
        )
        return {
            r["source"]: r["rate_ppm"]
            for r in out.select("source", "rate_ppm").distinct().collect()
        }

    prop = rates(4)   # alpha=1: proportional — equal keep rates
    temp = rates(2)   # alpha=1/2: tail upweighted
    assert prop["head"] == prop["tail"]
    assert temp["tail"] > temp["head"]
    # alpha=0: uniform budget share (100 docs/domain) -> tail keeps all
    # (cap), head keeps floor(100e6/900)
    unif = rates(0)
    assert unif["tail"] == 1_000_000
    assert unif["head"] == 111_111


def test_temperature_mix_deterministic_and_budget_tracking(spark):
    from delta_sorter_spark.operators.sampling import temperature_mix

    rows = [(i, f"s{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in temperature_mix(df, "doc_id", "source", budget=300).collect()}
    b = {
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(7), "doc_id", "source", budget=300
        ).collect()
    }
    assert a == b  # hash gate: same sample under any partitioning
    assert 200 < len(a) < 400  # tracks the budget (floor + binomial noise)
    c = {
        r["doc_id"]
        for r in temperature_mix(
            df, "doc_id", "source", budget=300, seed="other"
        ).collect()
    }
    assert a != c  # seed-sensitive


def test_repeated_lines_and_removal(spark):
    """CCNet-style line-level boilerplate dedup (dedup.repeated_lines /
    remove_repeated_lines): corpus-frequent lines go, unique bodies stay,
    short lines are structure (never removed), a fully-boilerplate doc
    becomes ''."""
    from delta_sorter_spark.operators.dedup import (
        remove_repeated_lines,
        repeated_lines,
    )

    df = spark.createDataFrame(
        [
            (1, "Subscribe Now\nunique body one\nCopyright 2024"),
            (2, "subscribe now\nanother body\nCopyright 2024"),
            (3, "totally unique\n-\nCopyright 2024"),
            (4, "Subscribe Now\nCopyright 2024"),
        ],
        "id long, text string",
    )
    freq = {
        r["line"]: r["n_docs"]
        for r in repeated_lines(df, "id", "text", min_docs=2).collect()
    }
    # matching is case-insensitive and exact-count
    assert freq == {"subscribe now": 3, "copyright 2024": 4}

    out = {
        r["id"]: (r["text"], r["lines_removed"])
        for r in remove_repeated_lines(
            df, "id", "text", min_docs=2, min_chars=2
        ).collect()
    }
    assert out[1] == ("unique body one", 2)
    assert out[2] == ("another body", 2)
    # '-' survives: below min_chars, structure not boilerplate
    assert out[3] == ("totally unique\n-", 1)
    # every line boilerplate -> empty doc, column order preserved
    assert out[4] == ("", 2)
    # schema: input columns in order + lines_removed appended
    cols = remove_repeated_lines(df, "id", "text").columns
    assert cols == ["id", "text", "lines_removed"]


def test_canonical_url_rules(spark):
    """Crawl-style URL canonicalization (textstats.canonical_url): case,
    www, default ports, fragments, tracking params, param order, trailing
    slashes — each rule pinned; distinct real URLs stay distinct."""
    from delta_sorter_spark.operators.textstats import canonical_url

    cases = [
        # messy variants of one identity all collapse
        ("HTTPS://WWW.Ex.COM:443/a/b/?b=2&utm_source=x&a=1#f",
         "https://ex.com/a/b?a=1&b=2"),
        ("https://ex.com/a/b?a=1&b=2", "https://ex.com/a/b?a=1&b=2"),
        ("https://ex.com/a/b/?b=2&a=1", "https://ex.com/a/b?a=1&b=2"),
        # default ports only for the matching scheme
        ("http://ex.com:80/x", "http://ex.com/x"),
        ("http://ex.com:443/x", "http://ex.com:443/x"),
        # tracking-only query loses the '?'
        ("https://ex.com/p?utm_campaign=z&fbclid=1&gclid=2&msclkid=3&ref=r",
         "https://ex.com/p"),
        # utm_ is a prefix match, 'referrer' is NOT 'ref'
        ("https://ex.com/p?utm_x=1&referrer=keep",
         "https://ex.com/p?referrer=keep"),
        # a literal '?' inside the query stays in it (RFC 3986); the
        # split is on the FIRST '?', for both path and params
        ("https://ex.com/a?x=1?y=2", "https://ex.com/a?x=1?y=2"),
        # bare host, root slash
        ("https://ex.com", "https://ex.com"),
        ("https://ex.com/", "https://ex.com"),
        # different identities stay different
        ("https://ex.com/a?id=1", "https://ex.com/a?id=1"),
        ("https://ex.com/a?id=2", "https://ex.com/a?id=2"),
        ("https://other.com/a?id=1", "https://other.com/a?id=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [want for _, want in cases]


def test_kmv_overlap_estimates_jaccard(spark):
    """KMV corpus-overlap sketch (sketches.kmv_sketch/kmv_overlap): the
    sketch-only Jaccard estimate lands near truth without joining the
    corpora, exact sets report exactly, and output is deterministic."""
    from pyspark.sql import functions as F

    from delta_sorter_spark.operators.sketches import kmv_overlap, kmv_sketch

    # |A|=3000, |B|=3000, |A∩B|=1000 -> J = 1000/5000 = 0.2
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 5000).select(F.col("id").cast("string").alias("v"))
    r = kmv_overlap(a, b, "v", k=512).collect()[0]
    assert r["k_union"] == 512
    assert abs(r["jaccard_ppm"] - 200_000) < 60_000  # ~3 std devs at k=512
    assert (
        kmv_overlap(a, b, "v", k=512).collect()[0].asDict() == r.asDict()
    )
    # small sets fit entirely in the sketch -> the estimate is EXACT
    small = kmv_overlap(a.limit(60), a.limit(60), "v", k=512).collect()[0]
    assert small["jaccard_ppm"] == 1_000_000 and small["k_union"] == 60
    disjoint = kmv_overlap(
        a.where("v = '1'"), a.where("v = '2'"), "v", k=512
    ).collect()[0]
    assert disjoint["matches"] == 0 and disjoint["jaccard_ppm"] == 0
    # the sketch itself is k rows, ascending, distinct
    sk = [row["h"] for row in kmv_sketch(a, "v", k=16).collect()]
    assert len(sk) == 16 == len(set(sk)) and sk == sorted(sk)


def test_audio_near_dup_offset_tolerant(spark):
    """Chromaprint-shape matching: an exact dup aligns at offset 0; a clip
    with a 16-byte (2-frame) prefix aligns at offset +/-2 with 14 matching
    frames; unrelated audio never surfaces."""
    from delta_sorter_spark.operators.multimodal import audio_near_dup

    base = (
        b"the quick brown fox jumps over the lazy dog and keeps running "
        b"through the forest all day long without stopping once at all"
    )
    other = (
        b"completely different audio content that shares nothing with the "
        b"others at all in any eight byte frame window whatsoever here"
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(base)),
            (2, bytearray(b"X" * 16 + base)),  # 2-frame-shifted clip
            (3, bytearray(base)),              # exact dup
            (4, bytearray(other)),
        ],
        "id long, payload binary",
    )
    rows = {
        (r["id_a"], r["id_b"]): (r["offset"], r["matching_frames"], r["hamming"])
        for r in audio_near_dup(df, "id", "payload", min_matching_frames=8).collect()
    }
    assert rows == {
        (1, 2): (-2, 14, 0),
        (1, 3): (0, 16, 0),
        (2, 3): (2, 14, 0),
    }


def test_audio_near_dup_hot_word_guard(spark):
    """A frame word shared by more assets than max_word_freq is dropped
    from candidacy (silence-frame skew guard): all-identical payloads stop
    pairing when the cap is below the corpus size."""
    from delta_sorter_spark.operators.multimodal import audio_near_dup

    same = b"identical audio payload bytes repeated across every asset...."
    df = spark.createDataFrame(
        [(i, bytearray(same)) for i in range(6)], "id long, payload binary"
    )
    # cap above corpus: all 15 exact-dup pairs
    assert audio_near_dup(df, "id", "payload", max_word_freq=10).count() == 15
    # cap below corpus: every word is hot -> no candidates at all
    assert audio_near_dup(df, "id", "payload", max_word_freq=3).count() == 0


def test_audio_near_dup_fingerprinter_hook(spark):
    """The pluggable-fingerprinter contract: a crafted fingerprint with one
    corrupted frame still matches at offset 0 under the hamming budget, and
    the reported hamming is the exact bit distance of that frame."""
    from delta_sorter_spark.operators.multimodal import audio_near_dup

    def fp(raw):
        words = [int.from_bytes(raw[:4], "big")] * 16
        if raw[-1:] == b"!":
            words[5] ^= 0b111  # 3 flipped bits in one frame
        return words

    df = spark.createDataFrame(
        [(1, bytearray(b"\x01\x02\x03\x04 audio")),
         (2, bytearray(b"\x01\x02\x03\x04 audio!"))],
        "id long, payload binary",
    )
    rows = audio_near_dup(
        df, "id", "payload", fingerprinter=fp, min_matching_frames=8,
        max_hamming_per_frame=1, max_word_freq=50,
    ).collect()
    assert [(r["offset"], r["matching_frames"], r["hamming"]) for r in rows] \
        == [(0, 15, 3)]


def test_video_near_dup_offset_and_reuse(spark):
    """m7: frame-sampled window fingerprints (pure SQL, no UDF) feed the
    SAME aligned matcher as audio — a clip trimmed by exactly one sampled
    stride (every_n frames x frame bytes) matches at offset +/-1."""
    from delta_sorter_spark.operators.multimodal import video_near_dup

    base = bytes(bytearray(i % 256 for i in range(395)))
    clip = base[80:]  # one sampled stride (10 frames x 8 bytes)
    other = b"z" * 395
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(clip)),
         (3, bytearray(base)), (4, bytearray(other))],
        "id long, payload binary",
    )
    got = sorted(
        tuple(r)
        for r in video_near_dup(df, "id", "payload", min_matching_frames=2).collect()
    )
    # exact dup at offset 0 over all 10 sampled frames; the clip aligns at
    # +/-1 with its 2 real frames; `other` never passes the hamming budget
    assert got == [(1, 2, 1, 2, 0), (1, 3, 0, 10, 0), (2, 3, -1, 2, 0)]
