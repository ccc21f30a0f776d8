"""Validate-only: report ordering violations without rewriting anything.

Mirrors the reference example (examples/python/validate_only.py).

Run:  PYTHONPATH=. python examples/validate_only.py
"""

import tempfile

from delta_sorter_spark.api import validate
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("validate-only")
    path = tempfile.mkdtemp(prefix="ds_validateonly_")

    df = spark.createDataFrame(
        [("B", 1), ("A", 2), ("C", 3)], "objectId string, value long"
    )
    DeltaTable.create(spark, path, df.coalesce(1))

    report = validate(path, ["objectId"], spark=spark)
    print(f"checked_files={report['checked_files']}")
    print(f"boundary_violations={report['boundary_violations']}")
    for detail in report["details_sample"]:
        print(" ", detail)


if __name__ == "__main__":
    main()
