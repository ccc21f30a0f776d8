"""Isolate one or more ENTRY_QUERIES bench lines (guide §1.4): same session
config as bench.py, page-cache warm-up, one untimed pre-run, best-of-3 via
the noop sink.  Optionally dumps .explain("formatted") per query.

Usage:
  python tools/bench_one.py e6_topk_cosine e55_dedup_keep_best
  python tools/bench_one.py --explain plans/r09 --suffix before e6_topk_cosine
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.appName("bench-one")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from delta_sorter_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    queries = entrymod.queries()
    for name in args.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        df = fn(spark, SF_DIR)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
        run = lambda: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # noqa: E731
        run()
        samples = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            run()
            samples.append(time.monotonic() - t0)
        print(
            f"{name:32s} min={min(samples):7.3f}  "
            f"samples={[round(s, 3) for s in samples]}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
