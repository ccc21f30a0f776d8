"""Per-JOB profile of a bench workload (guide §1 / §7.1): runs one workload
under a job group with the Spark UI's REST API enabled, then prints every
job's wall-clock duration, task count and stage count.  Job/task COUNTS are
deterministic (immune to this host's CPU-steal / IO bursts); durations rank
where the time goes within a single capture.

Usage:
  python tools/profile_jobs.py e66_doc_centrality e67_bpe_train
  python tools/profile_jobs.py attest compact_many stream_lat e82
  SPARK_GRAFT_CPUS=8 python tools/profile_jobs.py e66_doc_centrality

Names that appear in bench.ENTRY_QUERIES resolve to entry queries (noop
sink); the special names attest / compact_many / stream_lat / e82 replicate
the bench.py setup for those maintenance lines.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = int(os.environ.get("PROFILE_UI_PORT", "4049"))


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


def report(group: str, wall: float) -> None:
    apps = _rest("applications")
    app_id = apps[0]["id"]
    jobs = _rest(f"applications/{app_id}/jobs?status=succeeded")
    mine = [j for j in jobs if j.get("jobGroup") == group]
    mine.sort(key=lambda j: j["jobId"])
    total_tasks = sum(j["numTasks"] for j in mine)
    durs = []
    for j in mine:
        t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        # sub-second resolution from the GMT fraction
        f0 = float(j["submissionTime"][19:23] or 0)
        f1 = float(j["completionTime"][19:23] or 0)
        durs.append((time.mktime(t1) + f1) - (time.mktime(t0) + f0))
    print(
        f"\n== {group}: wall={wall:.3f}s  jobs={len(mine)}  tasks={total_tasks}"
        f"  sum(job_dur)={sum(durs):.3f}s"
    )
    ranked = sorted(zip(mine, durs), key=lambda p: -p[1])
    for j, d in ranked[:15]:
        desc = (j.get("description") or j["name"])[:90]
        print(
            f"  job {j['jobId']:>4}  {d:7.3f}s  tasks={j['numTasks']:>4} "
            f" stages={len(j['stageIds']):>2}  {desc}"
        )
    buckets: dict[int, int] = {}
    for j in mine:
        buckets[j["numTasks"]] = buckets.get(j["numTasks"], 0) + 1
    print("  jobs by task-count:", dict(sorted(buckets.items())))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from delta_sorter_spark.sources.delta_table import DeltaTable

    spark = (
        SparkSession.builder.appName("profile-jobs")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from delta_sorter_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    queries = entrymod.queries()
    workdir = tempfile.mkdtemp(prefix="profjobs_")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    sort_cols = ["l_shipdate", "l_orderkey", "l_linenumber"]

    def run_workload(name: str) -> None:
        if name in queries:
            fn = queries[name]
            run = lambda: fn(spark, SF_DIR).write.format("noop").mode(  # noqa: E731
                "overwrite"
            ).save()
            run()  # warm (untimed, outside the group)
            sc.setJobGroup(name, name)
            t0 = time.monotonic()
            run()
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
        elif name == "attest":
            from delta_sorter_spark.operators.validate import attest_sort_stats

            t_att = os.path.join(workdir, "li_att")
            DeltaTable.create(spark, t_att, li.repartition(4))
            sc.setJobGroup(name, name)
            t0 = time.monotonic()
            attest_sort_stats(DeltaTable(spark, t_att), sort_cols)
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
        elif name == "compact_many":
            from delta_sorter_spark.api import compact

            t_many = os.path.join(workdir, "li_many")
            li_many = li.withColumn(
                "part_bucket", (F.abs(F.hash("l_orderkey")) % 100).cast("int")
            )
            DeltaTable.create(
                spark, t_many, li_many.repartition(4),
                partition_columns=["part_bucket"], stat_columns=sort_cols,
            )
            sc.setJobGroup(name, name)
            t0 = time.monotonic()
            compact(t_many, sort_cols, spark=spark)
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
        elif name == "stream_lat":
            from delta_sorter_spark.streaming.delta_source import (
                DeltaStreamDataSource,
            )
            from delta_sorter_spark.streaming.events import (
                delta_append_sink,
                windowed_event_counts,
            )

            spark.dataSource.register(DeltaStreamDataSource)
            lat_src = os.path.join(workdir, "ev_lat_src")
            lat_tbl = DeltaTable.create(
                spark, lat_src,
                load_table(spark, SF_DIR, "events").limit(1000).repartition(2),
            )
            lat_out = os.path.join(workdir, "ev_lat")
            DeltaTable.create(
                spark, lat_out,
                spark.createDataFrame(
                    [],
                    "window_start string, event_type string, n_events long,"
                    " total_value double",
                ),
            )
            lat_ck = os.path.join(workdir, "ev_ck_lat")
            base_sink = delta_append_sink(lat_out, "prof-lat")

            def lat_pass(sink):
                stream = (
                    spark.readStream.format("delta_sorter")
                    .option("path", lat_src).load()
                    .withColumn("ts", F.col("ts").cast("timestamp"))
                )
                agg = windowed_event_counts(stream, streaming=True)
                q = (
                    agg.writeStream.foreachBatch(sink)
                    .option("checkpointLocation", lat_ck)
                    .outputMode("update")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(300)

            lat_pass(base_sink)  # catch-up warm-up
            tiny = load_table(spark, SF_DIR, "events").limit(200)
            lat_tbl.append(tiny.coalesce(1))
            walls = []

            def timed_sink(df, bid):
                t0 = time.monotonic()
                base_sink(df, bid)
                walls.append(time.monotonic() - t0)

            sc.setJobGroup(name, name)
            lat_pass(timed_sink)
            sc.setJobGroup(None, None)
            wall = walls[0] if walls else float("nan")
        elif name == "e82":
            from delta_sorter_spark.operators.ivf import ivfpq_residual_topk

            emb = entrymod.load_table(spark, SF_DIR, "embeddings")
            pq_queries = emb.where(
                F.col("vec_id") % entrymod.QUERY_VEC_MOD == 0
            )
            sc.setJobGroup(name, name)
            t0 = time.monotonic()
            ivfpq_residual_topk(
                emb, pq_queries, "vec_id", "embedding", "vec_id", "embedding",
                dim=entrymod.EMB_DIM, k=entrymod.TOPK, m=entrymod.PQ_M,
                n_codes=entrymod.PQ_CODES, n_centroids=entrymod.IVFPQ_CENTROIDS,
                n_probes=entrymod.IVFPQ_PROBES,
            ).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
        else:
            print(f"unknown workload {name}")
            return
        report(name, wall)

    for name in names:
        run_workload(name)
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
