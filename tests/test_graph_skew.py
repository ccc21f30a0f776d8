"""Connected components + skew operators."""

from pyspark.sql import functions as F

from delta_sorter_spark.operators.graph import (
    connected_components,
    dedup_representatives,
)
from delta_sorter_spark.operators.skew import salted_agg_count_distinct, salted_join


def test_connected_components_basic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # components: {0,1,2,3} (chain), {4,5}, {6}, {7}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_connected_components_cycle_and_diameter(spark):
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    # a ring 0..9 (diameter 5) — propagation must traverse it fully
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert set(got.values()) == {0}


def test_dedup_representatives(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a'"), (3, "b"), (4, "c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup_representatives(df, pairs, "doc_id").collect())
    assert kept == [1, 3, 4]


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k long, v long"
    )
    right = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt_factor=4).select("k", "v", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_count_distinct(spark):
    df = spark.createDataFrame(
        [("hot", i % 17) for i in range(500)] + [("cold", 1)], "k string, v long"
    )
    got = {r["k"]: r["n_distinct"] for r in salted_agg_count_distinct(df, "k", "v").collect()}
    assert got == {"hot": 17, "cold": 1}


def test_leakage_safe_split_keeps_clusters_together(spark):
    from delta_sorter_spark.operators.graph import leakage_safe_split

    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "id long")
    # components: {1,2,3}, {4,5}, singletons 6..10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = leakage_safe_split(nodes, edges, node_col="id").collect()
    assert len(out) == 10
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    # every cluster lands in exactly one split
    assert all(len(s) == 1 for s in by_comp.values())
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    # deterministic across invocations
    again = leakage_safe_split(nodes, edges, node_col="id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_repeated_spans_skewed_boilerplate_corpus(spark):
    """Degenerate substring-dedup input: one boilerplate paragraph appears
    in HALF the corpus, so its grams are single hot join keys.  Both the
    default plan (AQE runtime skew split) and the forced salted-join plan
    must finish within a sane bound and produce IDENTICAL, exact spans."""
    import time

    from delta_sorter_spark.operators.dedup import repeated_ngram_spans

    n_docs, n = 2000, 4
    boiler = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = []
    for i in range(n_docs):
        # unique filler so non-boilerplate grams never repeat across docs
        filler = " ".join(f"u{i}w{j}" for j in range(10))
        if i % 2 == 0:
            rows.append((i, f"{filler} {boiler}"))
        else:
            rows.append((i, filler))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    t0 = time.monotonic()
    default = sorted(
        tuple(r)
        for r in repeated_ngram_spans(df, "doc_id", "text", n=n).collect()
    )
    elapsed_default = time.monotonic() - t0
    t0 = time.monotonic()
    salted = sorted(
        tuple(r)
        for r in repeated_ngram_spans(
            df, "doc_id", "text", n=n, salt_factor=8
        ).collect()
    )
    elapsed_salted = time.monotonic() - t0

    assert salted == default
    # exact spans: every even doc's boilerplate (tokens 10..18) and nothing else
    assert len(default) == n_docs // 2
    assert all(t == (d, 10, 18, 8) for t in default for d in [t[0]]) and all(
        t[0] % 2 == 0 for t in default
    )
    # generous wall bound — catches quadratic/single-reducer collapse, not noise
    assert elapsed_default < 120, f"default path took {elapsed_default:.1f}s"
    assert elapsed_salted < 120, f"salted path took {elapsed_salted:.1f}s"


def test_lsh_bucket_cap_skips_duplicate_armies(spark):
    """max_bucket (dedup.lsh_pairs_from_signatures): a mirrored-boilerplate
    army lands in one band bucket; the cap routes it away from pair
    enumeration while ordinary near-dup pairs are untouched."""
    from delta_sorter_spark.operators.dedup import minhash_lsh_candidates

    army = [(i, "the same mirrored boilerplate page body text") for i in range(60)]
    pair = [
        (1000, "a quick brown fox jumps over the lazy dog tonight"),
        (1001, "a quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(army + pair, "id long, text string")

    # the production default cap (LSH_MAX_BUCKET_DEFAULT) is far above any
    # legitimate bucket, so the default call equals explicit None here
    uncapped = minhash_lsh_candidates(df, "id", "text", max_bucket=None).collect()
    default = minhash_lsh_candidates(df, "id", "text").collect()
    assert {(r["id_a"], r["id_b"]) for r in default} == {
        (r["id_a"], r["id_b"]) for r in uncapped
    }
    capped = minhash_lsh_candidates(df, "id", "text", max_bucket=10).collect()

    # the army alone is 60*59/2 = 1770 pairs; the cap removes exactly those
    army_pairs = {(a, b) for a, b in [(r["id_a"], r["id_b"]) for r in uncapped]
                  if a < 1000 and b < 1000}
    assert len(army_pairs) == 1770
    capped_set = {(r["id_a"], r["id_b"]) for r in capped}
    assert not (capped_set & army_pairs)
    # the genuine near-dup pair survives the cap
    assert (1000, 1001) in capped_set
    # and capping is EXACTLY bucket-scoped: everything kept was a real
    # uncapped candidate
    assert capped_set <= {(r["id_a"], r["id_b"]) for r in uncapped}
