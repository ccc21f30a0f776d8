"""End-to-end training-data curation over the documents table:
boilerplate-line strip -> profile -> exact-dup removal -> length-band
outlier pruning -> quality filter -> cross-batch incremental dedup against
a persistent hash index -> retrieval + KMV contamination screens ->
domain-mixing sample -> DSIR target-domain selection -> deterministic
split -> token-budget packing.

Every stage is a DataFrame transform (no driver materialization) and every
stage is deterministic, so reruns produce byte-identical corpora — the two
properties that matter when this runs over 100 TB instead of 500 rows.

Run:  PYTHONPATH=. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
      python examples/training_pipeline.py
"""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_sorter_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
)
from delta_sorter_spark.operators.textstats import document_profile
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.tables import load_table


def main() -> None:
    spark = get_spark("training-pipeline")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # -1. markup extraction: a real crawl pipeline starts from raw HTML —
    # strip tags/scripts/boilerplate blocks BEFORE any quality rule sees
    # the text.  The fixture is already plain text, so demonstrate the
    # stage on a deterministic HTML wrapping of it (one projection, no
    # shuffle; on raw WARC text this is the only change needed).
    from delta_sorter_spark.operators.quality import html_extract

    wrapped = docs.select(
        "doc_id", "lang", "source",
        F.expr(
            "'<html><body><nav>Home</nav><p>' || replace(text, '. ',"
            " '.</p><p>') || '</p><footer>nav footer</footer></body></html>'"
        ).alias("html"),
    )
    extracted = html_extract(wrapped, "doc_id", "html")
    docs = docs.drop("text").join(
        extracted.select("doc_id", "text"), "doc_id"
    )

    # 0. line-level boilerplate strip (CCNet/RefinedWeb): lines repeated
    # across >= 50 documents (nav text, cookie banners, footers) come out
    # before anything downstream counts tokens or hashes content
    from delta_sorter_spark.operators.dedup import remove_repeated_lines

    docs = remove_repeated_lines(
        docs, "doc_id", "text", min_docs=50, min_chars=8
    ).drop("lines_removed")

    # 0b. published rule sets up front: C4 line cleaning, then the Gopher
    # document rules — thresholds are corpus config (this corpus is
    # punctuation-free single-line word soup, so the punctuation/sentence
    # knobs relax; a web corpus runs the strict defaults)
    from delta_sorter_spark.operators.quality import c4_clean, gopher_rules

    cleaned = c4_clean(
        docs, "doc_id", "text",
        min_words_per_line=5, min_sentences=0, require_terminal_punct=False,
    )
    docs = (
        docs.join(cleaned.where("doc_kept").select("doc_id"), "doc_id")
    )
    gopher = gopher_rules(
        docs, "doc_id", "text",
        thresholds={"min_stopword_hits": 1, "min_mean_word_len": 2.0,
                    "max_top_ngram_char_frac": 1.0,
                    "max_dup_ngram_char_frac": 1.0},
    )
    docs = docs.join(
        gopher.where("gopher_pass").select("doc_id"), "doc_id"
    )

    # 1. single-pass profile: tokens, quality, language, fingerprint
    prof = document_profile(docs, "doc_id", "text")

    # 2. exact-dup removal (keep lowest doc_id per fingerprint) + quality cut
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = (
        prof.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("quality") >= 0.5))
        .drop("rn")
    )

    # 2b. drop token-length outliers (fragments / boilerplate dumps)
    from delta_sorter_spark.operators.textstats import token_band_filter

    banded_ids = token_band_filter(docs, "doc_id", "text", 5, 95).select("doc_id")
    kept = kept.join(banded_ids, "doc_id", "left_semi")

    # 2c. incremental dedup: register this batch's content hashes in a
    # persistent Delta index so the NEXT ingestion run drops anything this
    # run already accepted (O(batch) per run, never O(corpus))
    import tempfile

    from delta_sorter_spark.operators.dedup import incremental_dedup
    from delta_sorter_spark.sources.delta_table import DeltaTable

    idx_path = os.path.join(tempfile.mkdtemp(prefix="dedup_idx_"), "index")
    DeltaTable.create(
        spark, idx_path,
        spark.createDataFrame([], "content_hash long, doc_id long"),
    )
    stats = incremental_dedup(
        DeltaTable(spark, idx_path),
        docs.join(kept.select("doc_id"), "doc_id", "left_semi"),
        "doc_id", "text", txn_app_id="pipeline", txn_version=1,
    )

    # 2d. model-based quality signal: feature-hashed linear scorer (swap the
    # deterministic stand-in weights for a trained (bucket, weight) table in
    # production); recorded per-document for threshold tuning downstream
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    cls = hashed_linear_score(docs, "doc_id", "text")
    n_flagged = cls.where(F.col("label") == 0).count()

    # 2e. decontamination audit: BM25 search of the corpus with the eval
    # set's opening words as queries — high-scoring hits are manual-review
    # candidates beyond what exact n-gram decontamination catches
    from delta_sorter_spark.operators.retrieval import bm25_topk

    eval_queries = docs.where(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 6), " "
        ).alias("qtext"),
    )
    audit_hits = bm25_topk(
        docs, eval_queries, "doc_id", "text", "query_id", "qtext",
        k=3, exclude_self=True,
    ).count()

    # 2f. corpus-overlap gate: KMV-sketch Jaccard estimate between the kept
    # corpus and the eval set — the join-free contamination screen; a spike
    # here blocks the run before any training token ships
    from delta_sorter_spark.operators.sketches import kmv_overlap

    overlap = kmv_overlap(
        docs.join(kept.select("doc_id"), "doc_id", "left_semi").select("text"),
        docs.where(F.col("doc_id") % 37 == 0).select("text"),
        "text", k=128,
    ).collect()[0]

    # 3. domain mixing: keep curated sources fully, downsample the rest
    mixed = stratified_sample(
        kept.join(docs.select("doc_id", "source"), "doc_id"),
        "doc_id",
        "source",
        rates={"src0": 1.0, "src1": 1.0},
        default_rate=0.5,
    )

    # 3b. epoch-cap audit: before committing to the mixture, plan how many
    # PASSES each domain would need for a target budget — domains that
    # exceed the repetition cap (data-constrained scaling) get clamped and
    # their surplus redistributes; the plan is domain-count rows, free to
    # inspect on every run
    from delta_sorter_spark.operators.sampling import epoch_capped_mix

    epoch_plan = epoch_capped_mix(
        mixed.select("doc_id", "source"), "source",
        budget=3 * n0, max_epochs=4,
    )
    n_capped = epoch_plan.where("capped").count()

    # 3c. DSIR target-domain selection (Xie et al. 2023): score every doc
    # by the hashed-bigram likelihood ratio of the English slice vs the raw
    # corpus (integer bit-length log surrogate — deterministic), then
    # importance-resample with 2^avg_bits as the weight.  At 100 TB the
    # count tables stay <= num_buckets rows (broadcast), the per-doc rollup
    # is the only corpus shuffle, and the top-k is TakeOrderedAndProject.
    from delta_sorter_spark.operators.sampling import weighted_priority_sample
    from delta_sorter_spark.operators.textstats import dsir_weights

    scores = dsir_weights(
        mixed.join(docs.select("doc_id", "text", "lang"), "doc_id"),
        "doc_id", "text", "lang = 'en'", n=2,
    )
    selected = weighted_priority_sample(
        scores, "doc_id", "pow(2.0, avg_bits)", k=max(1, n0 // 2),
        seed="dsir-v1",
    )
    mixed = mixed.join(selected.select("doc_id"), "doc_id")

    # 4. LEAKAGE-SAFE split: near-duplicate clusters (LSH candidate pairs ->
    # connected components) land in one split each, so val/test never hold a
    # paraphrase of a training document; plain hash_split stays the right
    # tool when the corpus is already near-dup-free
    from delta_sorter_spark.operators.dedup import minhash_lsh_candidates
    from delta_sorter_spark.operators.graph import leakage_safe_split

    # strict banding (16 hashes per band): on this synthetic corpus looser
    # settings chain the shared vocabulary into one giant component, which
    # degenerates the split — band width is the similarity threshold knob
    # max_bucket: the duplicate-army guard — a boilerplate page mirrored
    # across thousands of docs stays off the pair-enumeration path
    edges = minhash_lsh_candidates(
        mixed.join(docs.select("doc_id", "text"), "doc_id"),
        "doc_id", "text", k=32, bands=2, max_bucket=256,
    ).select("id_a", "id_b")
    split = mixed.join(
        leakage_safe_split(
            mixed.select("doc_id"), edges, node_col="doc_id"
        ).select(F.col("id").alias("doc_id"), "split"),
        "doc_id",
    )
    train = split.where(F.col("split") == "train")
    packed = pack_sequences(
        train.select("doc_id", "source", F.col("n_tokens")),
        "doc_id",
        "n_tokens",
        budget=2048,
        shard_col="source",
    )

    # 5. tokenizer training on the TRAIN split only (never val/test): the
    # full BPE merge-learning loop — corpus read once into the word table,
    # then vocabulary-scale per merge — plus the unigram-LM alternative
    # (SentencePiece-family Viterbi hard-EM) trained from the same split
    from delta_sorter_spark.operators.textstats import train_bpe, train_unigram_lm

    from delta_sorter_spark.operators.textstats import train_wordpiece

    train_text = train.join(docs.select("doc_id", "text"), "doc_id")
    merges = train_bpe(train_text, "text", n_merges=8)
    uni_pieces = train_unigram_lm(
        train_text, "text", vocab_size=64, n_iters=2
    )
    wp_merges = train_wordpiece(train_text, "text", n_merges=8)

    n_kept, n_mixed = kept.count(), mixed.count()
    n_train = train.count()
    n_bins = packed.agg(F.countDistinct("source", "bin_id")).collect()[0][0]
    n_merges_learned = merges.count()
    n_uni_pieces = uni_pieces.count()
    print(f"documents:      {n0}")
    print(f"index new rows: {stats['new_rows']}")
    print(f"deduped+quality:{n_kept}")
    print(f"classifier lo:  {n_flagged}")
    print(f"audit hits:     {audit_hits}")
    print(f"eval overlap:   {overlap['jaccard_ppm']} ppm"
          f" (matches {overlap['matches']}/{overlap['k_union']})")
    print(f"after mixing:   {n_mixed}")  # post-DSIR selection
    print(f"train shard:    {n_train}")
    print(f"packed bins:    {n_bins}")
    print(f"capped domains: {n_capped}")
    print(f"bpe merges:     {n_merges_learned}")
    print(f"unigram pieces: {n_uni_pieces}")
    print(f"wp merges:      {wp_merges.count()}")


if __name__ == "__main__":
    main()
