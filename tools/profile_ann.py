"""Phase-level profiling of the ANN/PQ bench lines (guide §1: measure
first).  Breaks e82_residual_build_search, ann_index_build, e60_pq_build
and ann_index_refresh into their sequential phases and prints the
wall-clock of each, so the optimization targets the measured cost (job
overheads vs codegen vs shuffles) instead of guesses.

Usage: python tools/profile_ann.py   (env knobs same as bench.py)
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


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from delta_sorter_spark.operators.ivf import (
        _assign,
        _normalize_expr,
        adc_query_tables,
        adc_rank_pairs,
        kmeans_centroids,
        pq_encode,
    )

    spark = (
        SparkSession.builder.appName("profile-ann")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    marks: list[tuple[str, float]] = []
    t_last = time.monotonic()

    def mark(label: str) -> None:
        nonlocal t_last
        now = time.monotonic()
        marks.append((label, round(now - t_last, 3)))
        t_last = now

    emb = entrymod.load_table(spark, SF_DIR, "embeddings")
    emb.write.format("noop").mode("overwrite").save()  # page-cache warm
    queries = emb.where(F.col("vec_id") % entrymod.QUERY_VEC_MOD == 0)
    dim = entrymod.EMB_DIM
    m, n_codes = entrymod.PQ_M, entrymod.PQ_CODES
    n_centroids, n_probes = entrymod.IVFPQ_CENTROIDS, entrymod.IVFPQ_PROBES
    mark("warmup")

    # ---- e82 phases (mirrors ivfpq_residual_topk) -------------------------
    spark.sparkContext.setJobDescription("e82: coarse kmeans")
    emb_expr = _normalize_expr("embedding")
    normed = emb.select(
        F.col("vec_id").alias("__nid__"), F.expr(emb_expr).alias("__nemb__")
    )
    coarse = kmeans_centroids(
        normed, "__nemb__", dim, n_centroids, 2, id_col="__nid__"
    ).localCheckpoint(eager=True)
    mark("e82.coarse_kmeans")

    sub = "zip_with(__nemb__, cvec, (x, y) -> CAST(x AS DOUBLE) - y)"
    residuals = (
        _assign(normed, coarse, "__nemb__")
        .join(F.broadcast(coarse), "centroid")
        .select(
            "__nid__", "centroid", F.col("__nemb__").alias("__orig__"),
            F.expr(sub).alias("__res__"),
        )
        .localCheckpoint(eager=True)
    )
    mark("e82.residualize")

    spark.sparkContext.setJobDescription("e82: pq_encode")
    codes, codebooks = pq_encode(
        residuals, "__nid__", "__res__", dim, m, n_codes, 2, normalize=False
    )
    codes = codes.drop("__cemb__").join(
        residuals.select(
            F.col("__nid__").alias("id"), "centroid",
            F.col("__orig__").alias("__cemb__"),
        ),
        "id",
    )
    codes.write.format("noop").mode("overwrite").save()
    mark("e82.pq_encode+codes_join")

    spark.sparkContext.setJobDescription("e82: query side + rank")
    q_expr = _normalize_expr("embedding")
    probed = (
        _assign(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.expr(q_expr).alias("__qorig__"),
            ),
            coarse,
            "__qorig__",
            n_best=n_probes,
        )
        .join(F.broadcast(coarse), "centroid")
        .select(
            "query_id", "centroid", "__qorig__",
            F.expr(
                "zip_with(__qorig__, cvec, (x, y) -> CAST(x AS DOUBLE) - y)"
            ).alias("__qres__"),
        )
    )
    q = adc_query_tables(
        probed, "query_id", "__qres__", codebooks, dim, normalize=False,
        extra_cols=("centroid", "__qorig__"),
    )
    q = q.drop("__qemb__").withColumnRenamed("__qorig__", "__qemb__")
    adc_rank_pairs(codes.join(q, "centroid"), m, entrymod.TOPK, None).write.format(
        "noop"
    ).mode("overwrite").save()
    mark("e82.query+rank")

    # ---- kmeans_centroids internals ---------------------------------------
    spark.sparkContext.setJobDescription("kmeans internals")
    from delta_sorter_spark.operators.ivf import _seed_centroids

    _seed_centroids(normed, "__nid__", "__nemb__", n_centroids)
    mark("kmeans.seed_only")
    kmeans_centroids(normed, "__nemb__", dim, n_centroids, 1, id_col="__nid__")
    mark("kmeans.1iter")
    kmeans_centroids(normed, "__nemb__", dim, n_centroids, 2, id_col="__nid__")
    mark("kmeans.2iter")

    # ---- e60_pq_build phases ----------------------------------------------
    spark.sparkContext.setJobDescription("e60 pq build")
    pq_codes, pq_books = pq_encode(
        emb, "vec_id", "embedding", dim=dim, m=m, n_codes=n_codes
    )
    pq_codes = pq_codes.persist()
    pq_codes.count()
    pq_books = [b.persist() for b in pq_books]
    for b in pq_books:
        b.count()
    mark("e60.pq_build_total")
    pq_codes.unpersist()
    for b in pq_books:
        b.unpersist()

    # ---- ann_index_build / refresh ----------------------------------------
    from delta_sorter_spark.operators.ann_index import (
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    anndir = tempfile.mkdtemp(prefix="profile_ann_")
    ann_tbl = DeltaTable.create(
        spark, os.path.join(anndir, "t"),
        emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
    )
    mark("ann.table_create")
    spark.sparkContext.setJobDescription("ann_index_build")
    build_ann_index(
        ann_tbl, "embedding", "vec_id", dim, m=m, n_codes=n_codes,
    )
    mark("ann.build")
    ann_tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
    mark("ann.append")
    spark.sparkContext.setJobDescription("ann_index_refresh")
    refresh_ann_index(ann_tbl, "embedding")
    mark("ann.refresh")
    shutil.rmtree(anndir, ignore_errors=True)

    for label, sec in marks:
        print(f"{label:36s} {sec:8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
