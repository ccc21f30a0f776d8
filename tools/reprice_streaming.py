"""Idle re-price of the two streaming bench lines (VERDICT r8 item #1).

Reproduces bench.py's ``stream_rollup_exactly_once`` and
``stream_batch_latency`` timed regions byte-for-byte (same source table,
same warm-up policy, same timed boundaries) WITHOUT the rest of the suite,
so the capture can be taken serialized on an idle host.  Prints one JSON
line with the calibration probe at both ends so the reading rule from
BASELINE.md ("line ratio vs probe factor") applies directly.

Usage:  python tools/reprice_streaming.py   (env knobs same as bench.py)
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    from bench import _cpu_calibration_probe

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.sources.tables import load_table as _load
    from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource
    from delta_sorter_spark.streaming.events import (
        delta_append_sink,
        windowed_event_counts,
    )

    calibration_start = _cpu_calibration_probe()

    spark = (
        SparkSession.builder.appName("delta-sorter-reprice-streaming")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DeltaStreamDataSource)

    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="dsreprice_")

    def timed_min(name, *fns):
        samples = []
        for fn in fns:
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        timings[name] = round(min(samples), 3)

    t_stream_src = os.path.join(workdir, "ev_src")
    DeltaTable.create(spark, t_stream_src, _load(spark, SF_DIR, "events").repartition(8))

    def prep_stream(tag):
        out_t = os.path.join(workdir, f"ev_{tag}")
        DeltaTable.create(
            spark,
            out_t,
            spark.createDataFrame(
                [], "window_start string, event_type string, n_events long, total_value double"
            ),
        )

    def run_stream(tag="rollup"):
        out_t = os.path.join(workdir, f"ev_{tag}")
        ck = os.path.join(workdir, f"ev_ck_{tag}")
        stream = (
            spark.readStream.format("delta_sorter").option("path", t_stream_src).load()
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = windowed_event_counts(stream, streaming=True)
        q = (
            agg.writeStream.foreachBatch(delta_append_sink(out_t, f"bench-{tag}"))
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for tag in ("warm", "r1", "r2"):
        prep_stream(tag)
    run_stream("warm")
    timed_min(
        "stream_rollup_exactly_once",
        lambda: run_stream("r1"),
        lambda: run_stream("r2"),
    )

    lat_src = os.path.join(workdir, "ev_lat_src")
    lat_tbl = DeltaTable.create(
        spark, lat_src, _load(spark, SF_DIR, "events").limit(1000).repartition(2)
    )
    prep_stream("lat")
    lat_out = os.path.join(workdir, "ev_lat")
    lat_ck = os.path.join(workdir, "ev_ck_lat")
    batch_times: list[float] = []
    base_sink = delta_append_sink(lat_out, "bench-lat")

    def timed_sink(df, bid):
        t0 = time.monotonic()
        base_sink(df, bid)
        batch_times.append(time.monotonic() - t0)

    def lat_pass():
        stream = (
            spark.readStream.format("delta_sorter").option("path", lat_src).load()
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = windowed_event_counts(stream, streaming=True)
        q = (
            agg.writeStream.foreachBatch(timed_sink)
            .option("checkpointLocation", lat_ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    lat_pass()
    batch_times.clear()
    tiny = _load(spark, SF_DIR, "events").limit(200)
    for _ in range(3):
        lat_tbl.append(tiny.coalesce(1))
        lat_pass()
    if batch_times:
        timings["stream_batch_latency"] = round(
            sorted(batch_times)[len(batch_times) // 2], 3
        )
        timings["stream_batch_latency_all"] = [round(t, 3) for t in batch_times]

    calibration_end = _cpu_calibration_probe()
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()

    print(json.dumps({
        "calibration": {"start": calibration_start, "end": calibration_end},
        "timings": timings,
        "sf_dir": SF_DIR,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
