"""Time travel: read a Delta table as of an earlier version, list history.

The reference's delta-rs dependency supports load_version; the tool itself
never exposes it — this engine does (DeltaTable.to_df(version=...),
.history()), because compaction rewrites are exactly the commits you want to
audit and diff.

Run:  PYTHONPATH=. python examples/time_travel.py
"""

import tempfile

from delta_sorter_spark import SortOptimizer
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("time-travel")
    path = tempfile.mkdtemp(prefix="ds_timetravel_")

    df = spark.createDataFrame(
        [("B", 2), ("A", 1), ("C", 3)], "objectId string, value long"
    )
    table = DeltaTable.create(spark, path, df.coalesce(1))
    v_created = table.state().version

    SortOptimizer(path, spark=spark).compact(["objectId"])

    print("history (newest first):")
    for h in table.history():
        print(f"  v{h['version']}: {h['operation']}")

    now = [tuple(r) for r in table.to_df().orderBy("objectId").collect()]
    then = [tuple(r) for r in table.to_df(version=v_created).orderBy("objectId").collect()]
    print(f"rows now (post-compact): {now}")
    print(f"rows at v{v_created} (pre-compact): {then}")
    assert now == then  # compaction rewrote layout, not data


if __name__ == "__main__":
    main()
