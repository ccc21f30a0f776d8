"""Per-column sort direction (reference roadmap README.md:183, implemented
here): compact to (objectId asc, dateTime desc) and validate both orders.

Run:  PYTHONPATH=. python examples/directed_sort.py
"""

import tempfile

from delta_sorter_spark import SortOptimizer
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("directed-sort")
    path = tempfile.mkdtemp(prefix="ds_directed_")

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
    spec = ["objectId", "dateTime:desc"]  # newest-first within each object

    report = opt.compact(spec, repartition_by_sort_key=True)
    print(f"rewritten={report.rewritten_partitions}")

    print("directed validate:", opt.validate(spec)["boundary_violations"], "violations")
    try:  # the plain ascending order is now violated — validate raises
        opt.validate(["objectId", "dateTime"])
    except RuntimeError as exc:
        print(f"ascending validate raises as expected: {str(exc)[:80]}...")


if __name__ == "__main__":
    main()
