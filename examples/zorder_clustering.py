"""Z-order clustering: compact a table by the Morton interleave of two
columns so file-level min/max stats prune scans on BOTH, not just a leading
sort key.

Run:  PYTHONPATH=. python examples/zorder_clustering.py
"""

import tempfile

from pyspark.sql import functions as F

from delta_sorter_spark.api import compact
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("zorder")
    path = tempfile.mkdtemp(prefix="ds_zorder_")

    df = spark.range(0, 10_000).select(
        (F.col("id") % 101).alias("x"),
        ((F.col("id") * 31) % 97).alias("y"),
        F.col("id").alias("payload"),
    )
    DeltaTable.create(spark, path, df.repartition(8))

    metrics = compact(path, [], zorder_columns=["x", "y"], spark=spark)
    print(f"z-ordered: {metrics.files_in} -> {metrics.files_out} files")

    # per-file min/max on x AND y are now tight rectangles -> a predicate on
    # either column can skip files using the attached stats
    for a in DeltaTable(spark, path).state().adds:
        mins, maxs = a.stats["minValues"], a.stats["maxValues"]
        print(
            f"  {a.path.split('/')[-1][:24]:<26}"
            f" x=[{mins['x']},{maxs['x']}] y=[{mins['y']},{maxs['y']}]"
        )


if __name__ == "__main__":
    main()
