"""Stats-based file skipping end to end: the read-side payoff of sorted
compaction and z-ordering.

1. Create a table with configured stat columns (persisted as
   ``delta.dataSkippingStatsColumns`` — every later write keeps zone maps).
2. Compact-sort it so the zone maps become selective.
3. Point/range/LIKE reads through ``to_df(where=...)`` schedule only the
   overlapping files; ``files_matching`` shows exactly which.
4. ``stats_count`` / ``stats_min_max`` answer count(*)/min/max with ZERO
   scan tasks — exact across a merge-on-read DV delete.
5. A streaming consumer watching one key range (``stream_df(where=...)``)
   prunes each micro-batch's new files the same way.
6. For the probe zone maps CAN'T serve — equality on a column the table
   is not clustered on — a per-file Bloom index prunes the point lookup,
   and ``refresh_bloom_index`` keeps it covering after appends.

Run:  PYTHONPATH=. python examples/data_skipping.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from delta_sorter_spark.api import compact
from delta_sorter_spark.operators.dml import delete_where_dv
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("data-skipping-example")
    workdir = tempfile.mkdtemp(prefix="skip_example_")
    path = os.path.join(workdir, "events")

    df = spark.range(0, 100_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 500).alias("user_id"),
        F.concat(F.lit("host"), (F.col("id") % 40).cast("string")).alias("host"),
    )
    DeltaTable.create(
        spark, path, df.repartition(16),
        stat_columns=["event_id", "host"],  # persisted: rewrites keep stats
    )
    # target size forces a multi-file layout at this toy scale, so the
    # pruning is visible (at 100 TB the file count comes for free)
    compact(
        path, ["event_id"], repartition_by_sort_key=True,
        target_file_size_bytes=100_000, spark=spark,
    )
    tbl = DeltaTable(spark, path)
    state = tbl.state()

    pred = "event_id BETWEEN 42000 AND 42999"
    kept = tbl.files_matching(pred)
    print(f"range read: {len(kept)} of {len(state.adds)} files scheduled")
    print("rows:", tbl.to_df(where=pred).count())

    # zone maps prune only where the layout clusters the column: on the
    # event_id-sorted layout a host prefix hits every file, so re-cluster
    # by host first — choosing the sort to match the query, the same
    # decision the compact sort exists for
    compact(
        path, ["host", "event_id"], repartition_by_sort_key=True,
        target_file_size_bytes=100_000, spark=spark,
    )
    state = tbl.state()
    like = "host LIKE 'host3%'"
    kept_like = tbl.files_matching(like)
    print(f"LIKE-prefix read: {len(kept_like)} of {len(state.adds)} files")

    # metadata-only aggregates: exact, zero scan tasks, DV-aware
    print("stats_count:", tbl.stats_count())
    print("stats_min_max(event_id):", tbl.stats_min_max("event_id"))
    delete_where_dv(tbl, "event_id IN (7, 8, 9)")  # GDPR-style erasure
    print("after DV delete, stats_count:", tbl.stats_count())
    # the DV'd file may have lost its extremum -> fast path refuses
    print("stats_min_max now:", tbl.stats_min_max("event_id"))

    # streaming: a consumer of one key range prunes every micro-batch
    out = os.path.join(workdir, "out")
    ck = os.path.join(workdir, "ck")
    q = (
        tbl.stream_df(where="event_id BETWEEN 0 AND 99", skip_change_commits=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print("streamed rows in range:", spark.read.parquet(out).count())

    # Bloom index: the table is host-clustered now, so a user_id equality
    # scatters across every file and zone maps keep them all; the index
    # proves most files empty for the probed key
    from delta_sorter_spark.operators.bloom_index import (
        build_bloom_index,
        refresh_bloom_index,
    )

    build_bloom_index(tbl, "user_id")
    kept_bloom = tbl.files_matching("user_id = 123")
    print(f"bloom point lookup: {len(kept_bloom)} of "
          f"{len(tbl.state().adds)} files")
    print("rows:", tbl.to_df(where="user_id = 123").count())
    # appends aren't covered until a refresh — they fail SAFE (kept)
    tbl.append(df.where("event_id < 10"))
    r = refresh_bloom_index(tbl, "user_id")
    print(f"refresh scanned {r['new_files']} new file(s), "
          f"dropped {r['dropped_files']} stale row(s)")


if __name__ == "__main__":
    main()
