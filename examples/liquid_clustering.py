"""Clustered tables (liquid clustering): register clustering columns once,
append cheaply, and let incremental OPTIMIZE keep the layout — only new
files and still-small ZCubes are ever rewritten, so maintenance cost is
O(new data) while point predicates prune files on EVERY clustering column.

Run:  PYTHONPATH=. python examples/liquid_clustering.py
"""

import tempfile

from pyspark.sql import functions as F

from delta_sorter_spark.operators.cluster import cluster_status, optimize_clustered
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("liquid-clustering")
    path = tempfile.mkdtemp(prefix="ds_liquid_")

    # ingest order clusters user_id perfectly and item_id not at all
    df = spark.range(0, 20_000).select(
        F.col("id").alias("user_id"),
        ((F.col("id") * 2654435761) % 20_000).alias("item_id"),
        (F.col("id") % 5).alias("rating"),
    )
    tbl = DeltaTable.create(
        spark,
        path,
        df.repartitionByRange(8, "user_id").sortWithinPartitions("user_id"),
        stat_columns=["user_id", "item_id"],
    )
    probe = "item_id = 10007"
    print(f"before clustering: {probe} scans {len(tbl.files_matching(probe))} of "
          f"{len(tbl.state().adds)} files")

    tbl.set_clustering_columns(["user_id", "item_id"])  # metadata-only
    m = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=8)
    print(f"optimize #1: rewrote {m['candidate_files']} files into "
          f"{m['files_out']} (Hilbert ZCube {m['zcube_id'][:8]})")
    print(f"after clustering:  {probe} scans {len(tbl.files_matching(probe))} of "
          f"{len(tbl.state().adds)} files")

    # appends land unclustered (cheap ingest)...
    tbl.append(df.where("user_id < 1000").selectExpr(
        "user_id + 20000 AS user_id", "item_id", "rating"))
    # ...and the next OPTIMIZE touches ONLY them
    m = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=8)
    print(f"optimize #2 (incremental): rewrote {m['candidate_files']} file(s); "
          f"{m['stable_zcubes']} stable cube(s) untouched")
    print("converged:", optimize_clustered(tbl, min_zcube_bytes=0)["noop"])
    print("status:", cluster_status(tbl))


if __name__ == "__main__":
    main()
