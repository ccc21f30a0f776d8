"""RAG-style retrieval over the documents table: sliding-window chunking ->
BM25 posting index persisted as a Delta table -> repeated query batches
served from the index with ZERO corpus re-scans.

This is the deployment shape the operators are built for at 100 TB: the
posting build (the expensive part — a token explode over the whole corpus)
happens once per corpus version; every query batch afterwards is a
broadcast join of its terms against the stored postings.

Run:  PYTHONPATH=. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
      python examples/rag_pipeline.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from delta_sorter_spark.operators.dedup import sliding_chunks
from delta_sorter_spark.operators.retrieval import bm25_postings, bm25_topk
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.sources.tables import load_table


def main() -> None:
    spark = get_spark("rag-pipeline")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents")

    # 1. chunk the corpus (overlapping windows, stable hash chunk ids)
    chunks = sliding_chunks(
        docs, "doc_id", "text", chunk_words=12, stride=6
    ).select(F.col("chunk_id").alias("cid"), "chunk")

    # 2. build the BM25 index ONCE and persist it as a Delta table
    #    (stat_columns give the term column zone maps for pruned reads)
    index_path = os.path.join(tempfile.mkdtemp(prefix="bm25_idx_"), "postings")
    DeltaTable.create(
        spark,
        index_path,
        bm25_postings(chunks, "cid", "chunk"),
        stat_columns=["term"],
    )
    index = DeltaTable(spark, index_path)
    n_postings = index.to_df().count()

    # 3. serve two query batches from the SAME stored index — no corpus
    #    scan appears in either query's plan
    postings = index.to_df()

    def ask(qdf):
        return bm25_topk(
            None, qdf, "cid", None, "query_id", "qtext",
            k=3, postings=postings,
        )

    # query text: openings of a few documents (rare-ish terms, so scores are
    # non-trivial; an all-stopword query legitimately scores 0 under the
    # bit-length idf)
    openings = docs.select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 6), " "
        ).alias("qtext"),
    )
    batch1 = ask(openings.where(F.col("query_id") % 111 == 0))
    batch2 = ask(openings.where(F.col("query_id") % 113 == 0))
    hits1, hits2 = batch1.count(), batch2.count()

    print(f"chunks indexed:   {chunks.count()}")
    print(f"postings rows:    {n_postings}")
    print(f"batch1 hits:      {hits1}")
    print(f"batch2 hits:      {hits2}")
    # strongest matches (zero scores are correct for all-stopword queries —
    # the bit-length idf suppresses corpus-wide terms)
    top = batch1.orderBy(F.desc("score"), "query_id").limit(3).collect()
    for r in top:
        print(f"  q{r['query_id']} rank{r['rank']} cid={r['cid']} score={r['score']}")


if __name__ == "__main__":
    main()
