"""Isolate the non-ENTRY bench lines (maintenance/ANN/streaming) with the
exact setup and timing methodology bench.py uses, so a single line can be
re-measured without a full-suite run (guide §1).

Usage: python tools/bench_maint.py bloom ann pq e82 stream
Groups: bloom, pq, ann, ivf, e82, stream, compact
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
GROUPS = set(sys.argv[1:]) or {"bloom", "pq", "ann", "ivf", "e82"}


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from delta_sorter_spark.sources.delta_table import DeltaTable

    spark = (
        SparkSession.builder.appName("bench-maint")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="dsmaint_")

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    from delta_sorter_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    emb = entrymod.load_table(spark, SF_DIR, "embeddings")
    pq_queries = emb.where(F.col("vec_id") % entrymod.QUERY_VEC_MOD == 0)

    if "bloom" in GROUPS:
        from delta_sorter_spark.api import compact
        from delta_sorter_spark.operators.bloom_index import build_bloom_index

        sort_cols = ["l_shipdate", "l_orderkey", "l_linenumber"]
        t_unsorted = os.path.join(workdir, "li_unsorted")
        DeltaTable.create(spark, t_unsorted, li.repartition(8))
        compact(t_unsorted, sort_cols, repartition_by_sort_key=True, spark=spark)
        tbl_sorted = DeltaTable(spark, t_unsorted)
        timed("bloom_index_build", lambda: build_bloom_index(tbl_sorted, "l_orderkey"))
        b_run = lambda: tbl_sorted.to_df(  # noqa: E731
            where="l_orderkey IN (7, 311, 1234)"
        ).write.format("noop").mode("overwrite").save()
        b_run()
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            b_run()
            samples.append(time.monotonic() - t0)
        timings["bloom_point_lookup"] = round(min(samples), 3)

    if "pq" in GROUPS:
        from delta_sorter_spark.operators.ivf import pq_encode, pq_serve

        t0 = time.monotonic()
        pq_codes, pq_books = pq_encode(
            emb, "vec_id", "embedding", dim=entrymod.EMB_DIM,
            m=entrymod.PQ_M, n_codes=entrymod.PQ_CODES,
        )
        pq_codes = pq_codes.persist()
        pq_codes.count()
        pq_books = [b.persist() for b in pq_books]
        for b in pq_books:
            b.count()
        timings["e60_pq_build"] = round(time.monotonic() - t0, 3)

        def pq_run():
            pq_serve(
                pq_codes, pq_books, pq_queries, "vec_id", "embedding",
                entrymod.EMB_DIM, k=entrymod.TOPK, rerank=4 * entrymod.TOPK,
            ).write.format("noop").mode("overwrite").save()

        pq_run()
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            pq_run()
            samples.append(time.monotonic() - t0)
        timings["e60_pq_serve"] = round(min(samples), 3)
        pq_codes.unpersist()
        for b in pq_books:
            b.unpersist()

    if "ann" in GROUPS:
        from delta_sorter_spark.operators.ann_index import (
            ann_topk,
            build_ann_index,
            refresh_ann_index,
        )

        anndir = tempfile.mkdtemp(prefix="bench_ann_")
        ann_tbl = DeltaTable.create(
            spark, os.path.join(anndir, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        t0 = time.monotonic()
        build_ann_index(
            ann_tbl, "embedding", "vec_id", entrymod.EMB_DIM,
            m=entrymod.PQ_M, n_codes=entrymod.PQ_CODES,
        )
        timings["ann_index_build"] = round(time.monotonic() - t0, 3)
        ann_tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
        t0 = time.monotonic()
        refresh_ann_index(ann_tbl, "embedding")
        timings["ann_index_refresh"] = round(time.monotonic() - t0, 3)

        def ann_run():
            ann_topk(
                ann_tbl, pq_queries, "vec_id", "embedding", "embedding",
                k=entrymod.TOPK,
            ).write.format("noop").mode("overwrite").save()

        ann_run()
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            ann_run()
            samples.append(time.monotonic() - t0)
        timings["ann_registered_serve"] = round(min(samples), 3)
        shutil.rmtree(anndir, ignore_errors=True)

    if "ivf" in GROUPS:
        from delta_sorter_spark.operators.ann_index import ann_topk, build_ann_index

        anndir = tempfile.mkdtemp(prefix="bench_annivf_")
        ivf_tbl = DeltaTable.create(
            spark, os.path.join(anndir, "t"), emb.coalesce(2),
        )
        build_ann_index(
            ivf_tbl, "embedding", "vec_id", entrymod.EMB_DIM,
            m=entrymod.PQ_M, n_codes=entrymod.PQ_CODES,
            n_centroids=entrymod.IVFPQ_CENTROIDS,
        )

        def ivf_run():
            ann_topk(
                ivf_tbl, pq_queries, "vec_id", "embedding", "embedding",
                k=entrymod.TOPK, n_probes=entrymod.IVFPQ_PROBES,
            ).write.format("noop").mode("overwrite").save()

        ivf_run()
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            ivf_run()
            samples.append(time.monotonic() - t0)
        timings["ann_probed_serve"] = round(min(samples), 3)
        shutil.rmtree(anndir, ignore_errors=True)

    if "e82" in GROUPS:
        from delta_sorter_spark.operators.ivf import ivfpq_residual_topk

        t0 = time.monotonic()
        ivfpq_residual_topk(
            emb, pq_queries, "vec_id", "embedding", "vec_id", "embedding",
            dim=entrymod.EMB_DIM, k=entrymod.TOPK, m=entrymod.PQ_M,
            n_codes=entrymod.PQ_CODES, n_centroids=entrymod.IVFPQ_CENTROIDS,
            n_probes=entrymod.IVFPQ_PROBES,
        ).write.format("noop").mode("overwrite").save()
        timings["e82_residual_build_search"] = round(time.monotonic() - t0, 3)

    shutil.rmtree(workdir, ignore_errors=True)
    for k, v in timings.items():
        print(f"RESULT {k:28s} {v:8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
