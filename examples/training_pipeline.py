"""End-to-end training-data curation over the documents table: profile ->
exact-dup removal -> length-band outlier pruning -> quality filter ->
cross-batch incremental dedup against a persistent hash index ->
domain-mixing sample -> deterministic split -> token-budget packing.

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
    hash_split,
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

    # 3. domain mixing: keep curated sources fully, downsample the rest
    mixed = stratified_sample(
        kept.join(docs.select("doc_id", "source"), "doc_id"),
        "doc_id",
        "source",
        rates={"src0": 1.0, "src1": 1.0},
        default_rate=0.5,
    )

    # 4. leak-free split + context-window packing of the train shard
    split = hash_split(mixed, "doc_id")
    train = split.where(F.col("split") == "train")
    packed = pack_sequences(
        train.select("doc_id", "source", F.col("n_tokens")),
        "doc_id",
        "n_tokens",
        budget=2048,
        shard_col="source",
    )

    n_kept, n_mixed = kept.count(), mixed.count()
    n_train = train.count()
    n_bins = packed.agg(F.countDistinct("source", "bin_id")).collect()[0][0]
    print(f"documents:      {n0}")
    print(f"index new rows: {stats['new_rows']}")
    print(f"deduped+quality:{n_kept}")
    print(f"after mixing:   {n_mixed}")
    print(f"train shard:    {n_train}")
    print(f"packed bins:    {n_bins}")


if __name__ == "__main__":
    main()
