"""Partitioned compaction: partition column = leading sort key, so
per-partition rewrites alone produce global order, and already-sorted
partitions are skipped on re-runs (the work-avoidance core idea).

Mirrors the reference example (examples/python/partitioned_quickstart.py:43-57).

Run:  PYTHONPATH=. python examples/partitioned_quickstart.py
"""

import tempfile

from delta_sorter_spark import SortOptimizer
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("partitioned-quickstart")
    path = tempfile.mkdtemp(prefix="ds_partitioned_")

    df = spark.createDataFrame(
        [
            ("A", "2021-01-02", 1),
            ("A", "2021-01-01", 2),
            ("B", "2021-01-03", 3),
            ("B", "2021-01-01", 4),
            ("A", "2021-01-03", 5),
            ("B", "2021-01-02", 6),
        ],
        "objectId string, dateTime string, value long",
    )
    DeltaTable.create(spark, path, df.coalesce(1), partition_columns=["objectId"])

    opt = SortOptimizer(path, spark=spark)
    m1 = opt.compact(["dateTime"])
    print(f"first run: rewrote {m1.rewritten_partitions} partitions")
    m2 = opt.compact(["dateTime"])
    print(f"second run: rewrote {m2.rewritten_partitions}, skipped {m2.skipped_partitions}")


if __name__ == "__main__":
    main()
