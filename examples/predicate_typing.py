"""Typed replaceWhere predicates: numeric/boolean partition columns render as
unquoted/TRUE-FALSE literals in the commit's predicate string.

Mirrors the reference example (examples/python/predicate_typing.py:11-20).

Run:  PYTHONPATH=. python examples/predicate_typing.py
"""

import json
import os
import tempfile

from delta_sorter_spark import SortOptimizer
from delta_sorter_spark.session import get_spark
from delta_sorter_spark.sources.delta_table import DeltaTable


def main() -> None:
    spark = get_spark("predicate-typing")
    path = tempfile.mkdtemp(prefix="ds_predtyping_")

    df = spark.createDataFrame(
        [
            (1, True, "2021-01-02", 1),
            (1, True, "2021-01-01", 2),
            (2, False, "2021-02-02", 3),
            (2, False, "2021-02-01", 4),
        ],
        "id long, flag boolean, ts string, val long",
    )
    DeltaTable.create(spark, path, df.coalesce(1), partition_columns=["id", "flag"])

    SortOptimizer(path, spark=spark).compact(["ts"])

    # partition columns aren't materialized in data files -> validate on ts
    SortOptimizer(path, spark=spark).validate(["ts"])

    log_dir = os.path.join(path, "_delta_log")
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        for line in open(os.path.join(log_dir, name)):
            action = json.loads(line)
            pred = action.get("commitInfo", {}).get("operationParameters", {}).get("predicate")
            if pred:
                print("replaceWhere:", pred)


if __name__ == "__main__":
    main()
