"""End-to-end training-data curation over the documents table: profile ->
exact-dup removal -> quality filter -> domain-mixing sample -> deterministic
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
    print(f"deduped+quality:{n_kept}")
    print(f"after mixing:   {n_mixed}")
    print(f"train shard:    {n_train}")
    print(f"packed bins:    {n_bins}")


if __name__ == "__main__":
    main()
