"""Quickstart: create an unsorted Delta table, compact with a sort, validate.

Mirrors the reference example (examples/python/quickstart.py:34-50): create →
compact → validate round-trip, Spark-native.

Run:  PYTHONPATH=. python examples/quickstart.py
"""

import tempfile

from delta_sorter_spark import SortOptimizer
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("quickstart")
    path = tempfile.mkdtemp(prefix="ds_quickstart_")

    df = spark.createDataFrame(
        [
            ("B", "2021-02-02", 4),
            ("A", "2021-02-01", 1),
            ("B", "2021-01-01", 2),
            ("A", "2021-03-01", 3),
        ],
        "objectId string, dateTime string, value long",
    )
    DeltaTable.create(spark, path, df.coalesce(1))

    opt = SortOptimizer(path, spark=spark)
    metrics = opt.compact(["objectId", "dateTime"])
    print(f"compacted: {metrics.files_in} -> {metrics.files_out} files")

    report = opt.validate(["objectId", "dateTime"])  # raises if violated
    print(f"validated {report['checked_files']} files, 0 violations")

    for row in DeltaTable(spark, path).to_df().orderBy("objectId", "dateTime").collect():
        print(tuple(row))


if __name__ == "__main__":
    main()
