"""Object-store transaction log + remote validate-only.

The reference addresses tables by URI (main.rs:13-15, "Table URI, e.g.
s3://bucket/table").  This engine's log plane works against object stores
natively: put-if-absent commits are an S3 conditional PUT (If-None-Match),
and validate-only reads data files via pyarrow's S3 filesystem on the
executors — no Spark connector jars.  This example uses the hermetic
``memory://`` store so it runs anywhere; point the URI at s3://bucket/table
(with standard AWS env credentials) for the real thing.

Run:  PYTHONPATH=. python examples/object_store_log.py
"""

from pyspark.sql import types as T

from delta_sorter_spark.sources.delta_log import AddAction, DeltaCommitConflict, DeltaLog


def main() -> None:
    uri = "memory://examples/orders"
    log = DeltaLog(uri)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    log.create_table(schema)

    for i in range(12):  # parquet checkpoint fires at version 10
        log.commit_with_retry(
            lambda s, i=i: [AddAction(path=f"part-{i:05d}.parquet", size=100)],
            operation="WRITE",
        )

    state = log.read_state()
    print(f"version={state.version} files={len(state.adds)}")
    print(f"checkpoint at v{log._last_checkpoint_version()} (parquet, protocol layout)")

    try:  # optimistic concurrency: claiming a taken version conflicts
        log.commit(5, [AddAction(path="late.parquet", size=1)])
    except DeltaCommitConflict as exc:
        print(f"conflict as expected: {exc}")

    old = log.read_state(at_version=4)
    print(f"time travel to v4: {len(old.adds)} files")


if __name__ == "__main__":
    main()
