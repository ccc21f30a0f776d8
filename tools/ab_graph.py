"""Interleaved A/B of the graph.py edge-cache right-sizing (r10): runs the
graph-backed entry queries alternately WITH the fix (current code) and
WITHOUT it (monkeypatched no-op) in ONE warm session, printing wall + job +
task counts per leg.  Job/task counts are host-noise-immune; interleaving
makes the walls comparable on this shared host.

Usage: python tools/ab_graph.py e66_doc_centrality e55_dedup_keep_best [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.isdigit()] or ["e66_doc_centrality"]
    rounds = int(next((a for a in sys.argv[1:] if a.isdigit()), "3"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from delta_sorter_spark.operators import graph

    spark = (
        SparkSession.builder.appName("ab-graph")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from delta_sorter_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    orig = graph._rightsize_cached_edges
    noop = lambda df, n_rows: df  # noqa: E731

    queries = entrymod.queries()
    tracker = sc.statusTracker()

    def run(name: str, leg: str) -> tuple[float, int, int]:
        group = f"{name}-{leg}-{time.monotonic_ns()}"
        sc.setJobGroup(group, group)
        t0 = time.monotonic()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        sc.setJobGroup(None, None)
        jids = tracker.getJobIdsForGroup(group)
        tasks = 0
        for jid in jids:
            ji = tracker.getJobInfo(jid)
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    tasks += si.numTasks
        return wall, len(jids), tasks

    for name in names:
        # one untimed warm pass per leg (codegen)
        graph._rightsize_cached_edges = noop
        run(name, "warm-off")
        graph._rightsize_cached_edges = orig
        run(name, "warm-on")
        offs, ons = [], []
        for r in range(rounds):
            graph._rightsize_cached_edges = noop
            offs.append(run(name, f"off{r}"))
            graph._rightsize_cached_edges = orig
            ons.append(run(name, f"on{r}"))
        graph._rightsize_cached_edges = orig
        fmt = lambda xs: [  # noqa: E731
            f"{w:.2f}s/{j}j/{t}t" for (w, j, t) in xs
        ]
        print(f"{name} OFF: {fmt(offs)}")
        print(f"{name}  ON: {fmt(ons)}")
        print(
            f"{name} best wall off={min(w for w, _, _ in offs):.2f}"
            f" on={min(w for w, _, _ in ons):.2f}"
            f"  tasks off={offs[0][2]} on={ons[0][2]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
