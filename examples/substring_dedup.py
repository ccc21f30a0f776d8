"""Substring-level dedup pipeline (Lee et al. 2022) + GDPR-style merge-on-read
erasure with STANDARD Delta deletion vectors.

Phase 1 removes repeated cross-document n-gram spans from the corpus (the
boilerplate paragraphs document-level dedup can't see), writes the cleaned
corpus as a Delta table, then erases one document's rows merge-on-read: the
delete writes a protocol-standard roaring-bitmap deletion vector
(deletion_vector_<uuid>.bin + a storageType "u" descriptor, readable by stock
delta-rs/delta-spark) instead of rewriting data files, and the same commit
upgrades the table protocol to advertise the deletionVectors feature.
REORG (purge) then materializes the erasure and vacuum collects the orphans.

Run:  PYTHONPATH=. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
      python examples/substring_dedup.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from delta_sorter_spark.operators.dedup import (
    remove_repeated_spans,
    repeated_ngram_spans,
)
from delta_sorter_spark.operators.dml import delete_where_dv, purge_deletion_vectors
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.sources.tables import load_table


def main() -> None:
    spark = get_spark("substring-dedup")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 1. find cross-document repeated 8-gram spans and strip them
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=8, min_docs=2)
    n_spans = spans.count()
    cleaned = remove_repeated_spans(docs, spans, "doc_id", "text")
    removed = cleaned.agg(F.sum("tokens_removed")).first()[0] or 0
    print(f"repeated spans: {n_spans}; tokens stripped: {removed}")

    # 2. persist the cleaned corpus as a Delta table
    work = tempfile.mkdtemp(prefix="substring_dedup_")
    path = os.path.join(work, "corpus")
    table = DeltaTable.create(
        spark, path, cleaned.repartition(4), stat_columns=["doc_id"]
    )

    # 3. GDPR one-document erasure, merge-on-read: no data bytes rewritten
    victim = cleaned.select("doc_id").orderBy("doc_id").first()["doc_id"]
    res = delete_where_dv(table, f"doc_id = {victim}")
    proto = DeltaTable(spark, path).state().protocol
    print(
        f"erased doc {victim}: {res['deleted_rows']} row(s) via "
        f"{res['dv_files']} deletion vector(s); protocol now "
        f"{proto['minReaderVersion']}/{proto['minWriterVersion']} "
        f"{proto.get('readerFeatures')}"
    )
    assert DeltaTable(spark, path).to_df().where(
        F.col("doc_id") == victim
    ).count() == 0

    # 4. materialize + collect: reads stop paying the anti-join
    purge_deletion_vectors(table)
    orphans = table.vacuum()
    print(f"purged; vacuum collected {len(orphans)} orphan object(s)")
    print(f"final rows: {DeltaTable(spark, path).to_df().count()}")


if __name__ == "__main__":
    main()
