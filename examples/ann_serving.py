"""Production ANN serving: build a product-quantized index ONCE per corpus
version, persist the codes as a Delta table partitioned by coarse list, and
serve query batches from the index — the 100 TB shape where the full float
corpus is never rescanned at query time.

Pipeline:
1. ``pq_encode`` + coarse ``kmeans_centroids``: deterministic (seeded,
   integer-quantized means — rebuilds are bit-identical), zero-shuffle
   corpus passes.
2. Persist (id, centroid, code_0..code_m) as a Delta table PARTITIONED BY
   centroid: a probe prunes to matching files, the same file-pruning story
   as sorted compaction.
3. Serve: assign the query batch to its probe lists, read ONLY those
   partitions, score by ADC lookups, exact-rerank the shortlist.

Run:  PYTHONPATH=. python examples/ann_serving.py
"""

import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_sorter_spark.operators.ivf import (
    _assign,
    _normalize_expr,
    kmeans_centroids,
    pq_encode,
)
from delta_sorter_spark.operators.similarity import cosine_expr
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable

DIM, M, N_CODES, N_CENTROIDS, N_PROBES, K = 64, 4, 8, 8, 3, 5


def main() -> None:
    spark = get_spark("ann-serving")
    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    # ---- index build (once per corpus version) ----------------------------
    normed = corpus.select(
        F.col("vec_id").alias("id"),
        F.expr(_normalize_expr("embedding")).alias("emb"),
    )
    coarse = kmeans_centroids(normed, "emb", DIM, N_CENTROIDS, 2, id_col="id")
    codes, codebooks = pq_encode(
        normed, "id", "emb", DIM, M, N_CODES, normalize=False
    )
    listed = _assign(codes, coarse, "__cemb__").withColumnRenamed(
        "__cemb__", "emb"
    )

    index_path = tempfile.mkdtemp(prefix="ann_index_")
    DeltaTable.create(
        spark,
        index_path,
        listed.select(
            "id", "centroid", *[f"code_{j}" for j in range(M)], "emb"
        ),
        partition_columns=["centroid"],
    )
    print(f"index: {listed.count()} vectors in {N_CENTROIDS} lists at {index_path}")

    # ---- serving (per query batch) -----------------------------------------
    index = DeltaTable(spark, index_path).to_df()
    queries = corpus.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.expr(_normalize_expr("embedding")).alias("qemb"),
    )
    probed = _assign(queries, coarse, "qemb", n_best=N_PROBES)
    dsub = DIM // M
    for j in range(M):
        packed = codebooks[j].agg(
            F.expr(
                "transform(sort_array(collect_list(struct(centroid, cvec))), s -> s.cvec)"
            ).alias(f"__cb{j}__")
        )
        sub = f"slice(qemb, {j * dsub + 1}, {dsub})"
        probed = (
            probed.crossJoin(F.broadcast(packed))
            .withColumn(
                f"__dtab{j}__",
                F.expr(
                    f"transform(__cb{j}__, cv -> aggregate(zip_with({sub}, cv,"
                    f" (x, y) -> (x - y) * (x - y)),"
                    f" CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
                ),
            )
            .drop(f"__cb{j}__")
        )
    adc = " + ".join(f"element_at(__dtab{j}__, code_{j} + 1)" for j in range(M))
    cands = (
        index.join(probed, "centroid")  # partition-pruned at scale
        .where(F.col("id") != F.col("query_id"))
        .withColumn("approx_d", F.expr(adc))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d"), F.asc("id"))
    shortlist = cands.withColumn("__r__", F.row_number().over(w)).where(
        F.col("__r__") <= 4 * K
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(cosine_expr("qemb", "emb")), F.asc("id")
    )
    top = (
        shortlist.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= K)
        .withColumn("cosine", F.round(cosine_expr("qemb", "emb"), 4))
        .select("query_id", "id", "rank", "cosine")
    )
    top.orderBy("query_id", "rank").show(15, truncate=False)

    # ---- or: the one-call registered lifecycle -----------------------------
    # operators/ann_index.py folds build/persist/refresh/serve into table
    # metadata: the index lives INSIDE the table directory, vacuum protects
    # it while registered, appends/DML catch up with an O(changed files)
    # refresh against the frozen codebooks, and serving always reflects the
    # live snapshot (stale index = recall loss, never removed rows).
    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )

    table_path = tempfile.mkdtemp(prefix="ann_table_") + "/t"
    tbl = DeltaTable.create(
        spark, table_path, corpus.where(F.col("vec_id") % 2 == 0).coalesce(2)
    )
    build_ann_index(tbl, "embedding", "vec_id", DIM, m=M, n_codes=N_CODES)
    tbl.append(corpus.where(F.col("vec_id") % 2 == 1).coalesce(2))
    r = refresh_ann_index(tbl, "embedding")
    print(
        f"registered index: {r['reencoded_files']} files re-encoded, "
        f"{r['carried_files']} carried"
    )
    ann_topk(
        tbl, queries, "query_id", "qemb", "embedding", k=K
    ).orderBy("query_id", "rank").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
