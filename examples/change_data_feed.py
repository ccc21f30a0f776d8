"""Change data feed: row-level CDC with delta.enableChangeDataFeed, and
the incremental materialized view it enables.

The reference engine has no change feed at all (SURVEY §2.9) — this is
extension surface on the public Delta protocol.  Two fidelities:

- default: table_changes synthesizes a multiset-equivalent feed from
  add/remove actions (whole rewritten files as delete+insert);
- with ``delta.enableChangeDataFeed``: every DML verb materializes
  change rows (protocol ``cdc`` actions + ``_change_data/`` parquet),
  so the feed carries true update_preimage/update_postimage pairs and
  is independent of file layout.

Run:  PYTHONPATH=. python examples/change_data_feed.py
"""

import tempfile

from delta_sorter_spark.operators.dml import (
    delete_where,
    table_changes,
    update_where,
)
from delta_sorter_spark.operators.rollup import (
    ROLLUP_SCHEMA,
    incremental_rollup_cdc,
)
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("change-data-feed")
    path = tempfile.mkdtemp(prefix="ds_cdf_")

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 1.0),
            (2, "2024-01-01 00:20:00", "click", 2.0),
            (3, "2024-01-01 01:10:00", "view", 3.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    table = DeltaTable.create(spark, path, events.coalesce(1))
    table.set_table_properties({"delta.enableChangeDataFeed": "true"})
    v0 = table.state().version

    update_where(table, "event_id = 2", {"value": "value * 100"})
    delete_where(table, "event_type = 'view'")

    print("row-level feed (pre/post images, not whole-file synthesis):")
    for r in table_changes(table, v0).orderBy("_commit_version", "_change_type", "event_id").collect():
        print(f"  v{r['_commit_version']} {r['_change_type']:17s} "
              f"event {r['event_id']} value={r['value']}")

    # the consumer the feed exists for: a continuously-maintained rollup
    rollup = DeltaTable.create(
        spark, tempfile.mkdtemp(prefix="ds_cdf_ru_"),
        spark.createDataFrame([], ROLLUP_SCHEMA),
    )
    incremental_rollup_cdc(table, rollup, 0)
    print("hourly rollup maintained purely from the feed:")
    for r in rollup.to_df().where("n_events > 0").orderBy("window_start").collect():
        print(f"  {r['window_start']} {r['event_type']}: "
              f"n={r['n_events']} total={r['total_value']}")

    # maintenance == recompute (the IVM contract q29 hash-pins)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rollup.to_df().where("n_events > 0").collect()
    }
    assert got == {("2024-01-01 00:00:00", "click"): (2, 201.0)}


if __name__ == "__main__":
    main()
