"""Scale-proof bench (VERDICT r7 #1): run the headline maintenance/pruned
lines at TWO scale factors and measure how each scales, instead of arguing
it structurally at 16 files.  The claim under test: full-rewrite lines
(compact, initial OPTIMIZE, LSH corpus scans) scale ~linearly with rows,
while pruned/incremental lines (zone-map month read, Bloom point lookup,
probed ANN serve, incremental OPTIMIZE, O(new) ANN refresh) scale
sub-linearly because their work is bounded by the pruned/changed subset,
not the corpus.

Usage:
  python tools/make_sf_scale.py 10 /root/testdata/sf0.1 /tmp/sfscale/sf1
  python tools/scale_proof.py /root/testdata/sf0.1   # -> JSON line
  python tools/scale_proof.py /tmp/sfscale/sf1       # -> JSON line

Each invocation prints {"sf_dir", "rows_lineitem", "calibration_s",
"queries": {...}}.  Compare the two runs line by line (BASELINE.md §sf1
records the table).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from bench import _cpu_calibration_probe
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    calibration = _cpu_calibration_probe()
    spark = (
        SparkSession.builder.appName("scale-proof")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="dsscale_")

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    def timed_min(name, *fns):
        samples = []
        for fn in fns:
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        timings[name] = round(min(samples), 3)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_li = li.count()  # also warms the page cache

    # -- sort maintenance: full-rewrite line (expected ~linear) --------------
    t_unsorted = os.path.join(workdir, "li_unsorted")
    # file count scales with rows (sf0.1 -> 8 files, sf1 -> 80), matching
    # how a real table's file count grows with data
    nparts = max(8, n_li // 75_000)
    DeltaTable.create(spark, t_unsorted, li.repartition(nparts))
    sort_cols = ["l_shipdate", "l_orderkey", "l_linenumber"]
    v_run = lambda: validate(t_unsorted, sort_cols, spark=spark)  # noqa: E731
    timed_min("validate_unsorted", v_run, v_run)
    timed("compact_strict",
          lambda: compact(t_unsorted, sort_cols,
                          repartition_by_sort_key=True, spark=spark))
    timed("validate_sorted",
          lambda: validate(t_unsorted, sort_cols, spark=spark))

    # -- pruned reads on the compacted table (expected sub-linear) -----------
    tbl = DeltaTable(spark, t_unsorted)
    _skip_pred = (
        "l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'"
    )
    r_run = lambda: tbl.to_df(where=_skip_pred).write.format(  # noqa: E731
        "noop").mode("overwrite").save()
    timed_min("read_skipped_month", r_run, r_run)
    timed_min("stats_count", lambda: tbl.stats_count(),
              lambda: tbl.stats_count())

    from delta_sorter_spark.operators.bloom_index import build_bloom_index

    timed("bloom_index_build", lambda: build_bloom_index(tbl, "l_orderkey"))
    b_run = lambda: tbl.to_df(  # noqa: E731
        where="l_orderkey IN (7, 311, 1234)"
    ).write.format("noop").mode("overwrite").save()
    timed_min("bloom_point_lookup", b_run, b_run)

    # -- liquid clustering: initial ~linear, incremental ~O(new) -------------
    from delta_sorter_spark.operators.cluster import optimize_clustered

    t_clust = os.path.join(workdir, "li_clustered")
    tc = DeltaTable.create(
        spark, t_clust,
        li.select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .repartition(nparts),
        stat_columns=["l_orderkey", "l_partkey"],
    )
    tc.set_clustering_columns(["l_orderkey", "l_partkey"])
    timed("cluster_initial_optimize",
          lambda: optimize_clustered(tc, min_zcube_bytes=0))
    # FIXED-size append (~30k rows) at both SFs: incremental OPTIMIZE cost
    # should track the append, not the table
    tc.append(
        li.where(F.col("l_orderkey") % (max(1, n_li // 30_000)) == 0)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .coalesce(2)
    )
    timed("cluster_incremental_optimize",
          lambda: optimize_clustered(tc, min_zcube_bytes=0))

    # -- upsert of a FIXED ~6k-key batch (expected: dominated by the
    #    touched-file rewrite, sub-linear once files are narrower) ----------
    from delta_sorter_spark.operators.dml import upsert as dml_upsert

    src = li.where(F.col("l_orderkey") % (max(1, n_li // 6_000)) == 0)
    dst = os.path.join(workdir, "li_upsert")
    shutil.copytree(t_unsorted, dst)
    timed("upsert_fixed_batch",
          lambda: dml_upsert(DeltaTable(spark, dst), src,
                             ["l_orderkey", "l_linenumber"]))

    # -- row-level CDC: FIXED ~5k-row update + feed read (expected FLAT) -----
    # a marker batch with negative keys lands in its own file, so zone maps
    # prune the update's planner scan to that file at BOTH SFs: the whole
    # line (hit scan + rewrite + cdc materialization + row-level feed read)
    # is O(hit rows), independent of table size
    from delta_sorter_spark.operators.dml import table_changes
    from delta_sorter_spark.operators.dml import update_where as dml_update

    t_cdc = os.path.join(workdir, "li_cdc")
    tcdc = DeltaTable.create(
        spark, t_cdc, li.repartition(nparts), stat_columns=["l_orderkey"]
    )
    tcdc.set_table_properties({"delta.enableChangeDataFeed": "true"})
    tcdc.append(
        li.limit(5_000)
        .withColumn("l_orderkey", F.lit(-1).cast("bigint"))
        .coalesce(1)
    )

    def cdc_run():
        v0 = tcdc.state().version
        dml_update(tcdc, "l_orderkey < 0", {"l_quantity": "l_quantity + 1"})
        table_changes(tcdc, v0).write.format("noop").mode("overwrite").save()

    cdc_run()
    timed_min("cdc_update_fixed_batch", cdc_run, cdc_run)

    # -- LSH / span dedup corpus scans (expected ~linear) --------------------
    queries = entrymod.queries()
    for name in ("e2_minhash_sig", "e3_lsh_candidates", "e56_repeated_spans"):
        fn = queries[name]
        run = lambda fn=fn: fn(spark, sf_dir).write.format(  # noqa: E731
            "noop").mode("overwrite").save()
        run()
        samples = []
        for _ in range(2):
            t0 = time.monotonic()
            run()
            samples.append(time.monotonic() - t0)
        timings[name] = round(min(samples), 3)

    # -- registered ANN: build (linear), O(new) refresh, flat vs probed serve
    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )

    emb = entrymod.load_table(spark, sf_dir, "embeddings")
    pq_queries = emb.where(
        F.col("vec_id") % entrymod.QUERY_VEC_MOD == 0
    ).limit(40)
    anndir = os.path.join(workdir, "ann")
    ivf_tbl = DeltaTable.create(spark, anndir, emb.repartition(max(2, nparts // 4)))
    t0 = time.monotonic()
    build_ann_index(
        ivf_tbl, "embedding", "vec_id", entrymod.EMB_DIM,
        m=entrymod.PQ_M, n_codes=entrymod.PQ_CODES,
        n_centroids=entrymod.IVFPQ_CENTROIDS,
    )
    timings["ann_index_build"] = round(time.monotonic() - t0, 3)
    # FIXED-size append (~500 vectors): refresh is O(new) by design now
    ivf_tbl.append(
        emb.where(F.col("vec_id") % (max(1, emb.count() // 500)) == 0)
        .withColumn("vec_id", F.col("vec_id") + 10_000_000).coalesce(1)
    )
    t0 = time.monotonic()
    refresh_ann_index(ivf_tbl, "embedding")
    timings["ann_index_refresh"] = round(time.monotonic() - t0, 3)

    def serve(probes=None):
        ann_topk(
            ivf_tbl, pq_queries, "vec_id", "embedding", "embedding",
            k=entrymod.TOPK, n_probes=probes,
        ).write.format("noop").mode("overwrite").save()

    serve(entrymod.IVFPQ_PROBES)
    timed_min("ann_probed_serve",
              lambda: serve(entrymod.IVFPQ_PROBES),
              lambda: serve(entrymod.IVFPQ_PROBES))
    serve(None)
    timed_min("ann_flat_serve", lambda: serve(None), lambda: serve(None))

    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows_lineitem": n_li,
        "calibration_s": calibration,
        "queries": timings,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
