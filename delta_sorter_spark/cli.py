"""CLI mirroring the reference's ``deltasort`` binary (main.rs:12-52):

    python -m delta_sorter_spark.cli --table URI --sort-columns a,b
        [--target-file-size-bytes N] [--predicate EXPR] [--concurrency N]
        [--dry-run] [--validate-only] [--repartition-by-sort-key]
        [--log-level LEVEL] [--nulls first|last]

Extension verbs (each runs and exits; --sort-columns not required):
    --history                     print the commit history
    --detail                      print the DESCRIBE DETAIL summary
    --attest (needs --sort-columns)              backfill key-stat attestation
    --bin-pack [--target-file-size-bytes N]      coalesce small files (no sort)
    --vacuum [--retention-hours H] [--dry-run]   collect unreferenced files
    --checkpoint                  write a parquet log checkpoint
    --build-bloom-index COLUMN    build/rebuild the per-file Bloom index
    --refresh-bloom-index COLUMN  catch the index up (O(new files) scan)
    --drop-bloom-index COLUMN     unregister (vacuum collects the dataset)
    --build-ann-index COL:ID:DIM  train + register the PQ ANN index
    --refresh-ann-index COLUMN    re-encode new/DV-changed files only
    --compact-ann-index COLUMN    consolidate generational code parts
    --drop-ann-index COLUMN       unregister (vacuum collects the datasets)
Extension flag: --refresh-bloom-indexes refreshes every registered index
after a rewriting compaction (the maintenance pairing — rewrites are
exactly when indexes go stale).

Exit codes: 0 ok; 1 validation violations (main.rs:84-86); 2 usage errors.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="deltasort", description=__doc__)
    p.add_argument(
        "--table",
        required=True,
        help="Table URI, e.g. /path/to/table or s3://bucket/table (the log "
        "plane handles object stores natively; data IO on remote schemes "
        "needs the matching Spark filesystem connector jars)",
    )
    p.add_argument(
        "--sort-columns",
        default="",
        help="Comma-separated sort columns, optionally with a per-column "
        "direction suffix, e.g. objectId,dateTime:desc (default asc). "
        "Required unless an index/--history verb is given",
    )
    p.add_argument("--target-file-size-bytes", type=int, default=None)
    p.add_argument("--predicate", default=None, help="Scope compaction to matching partitions")
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument(
        "--single-job-threshold",
        type=int,
        default=64,
        help="When at least this many partitions fail validation, rewrite "
        "them in ONE Spark job + ONE commit instead of a job per partition "
        "(avoids the driver-side job-submission bottleneck at 10k+ failing "
        "partitions); 0 disables",
    )
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--validate-only", action="store_true")
    p.add_argument("--repartition-by-sort-key", action="store_true")
    p.add_argument("--log-level", default="info")
    p.add_argument("--nulls", choices=["first", "last"], default="first")
    p.add_argument(
        "--zorder-by",
        default=None,
        help="Comma-separated columns: cluster by Morton z-order instead of a"
        " lexicographic sort (extension; implies a full-table rewrite)",
    )
    p.add_argument(
        "--history",
        action="store_true",
        help="Print the table's commit history (DESCRIBE HISTORY shape) and exit",
    )
    p.add_argument(
        "--detail",
        action="store_true",
        help="Print the table summary (DESCRIBE DETAIL shape, zero scan "
        "tasks; honors --at-version) and exit",
    )
    p.add_argument(
        "--at-version",
        type=int,
        default=None,
        help="With --validate-only: validate the table snapshot at this"
        " version (time travel)",
    )
    p.add_argument(
        "--build-bloom-index",
        default=None,
        metavar="COLUMN",
        help="Build (or rebuild) the per-file Bloom index for COLUMN — "
        "equality/IN file skipping on columns the table is not clustered "
        "on — then exit",
    )
    p.add_argument(
        "--refresh-bloom-index",
        default=None,
        metavar="COLUMN",
        help="Catch COLUMN's Bloom index up with the current snapshot, "
        "scanning only never-indexed files, then exit",
    )
    p.add_argument(
        "--drop-bloom-index",
        default=None,
        metavar="COLUMN",
        help="Unregister COLUMN's Bloom index (vacuum collects the "
        "dataset), then exit",
    )
    p.add_argument(
        "--refresh-bloom-indexes",
        action="store_true",
        help="After a rewriting compaction, catch every registered Bloom "
        "index up with the new file layout (scans only rewritten files)",
    )
    p.add_argument(
        "--build-ann-index",
        default=None,
        metavar="COLUMN:ID_COL:DIM",
        help="Train + encode + register the PQ ANN index for an embedding "
        "COLUMN (vector search served from table metadata), then exit",
    )
    p.add_argument(
        "--refresh-ann-index",
        default=None,
        metavar="COLUMN",
        help="Catch COLUMN's ANN index up with the current snapshot — "
        "re-encodes only new/DV-changed files against the frozen "
        "codebooks — then exit",
    )
    p.add_argument(
        "--compact-ann-index",
        default=None,
        metavar="COLUMN",
        help="Consolidate COLUMN's generational ANN code parts into one "
        "fresh dataset (superseded refresh parts become vacuum-able), "
        "then exit",
    )
    p.add_argument(
        "--drop-ann-index",
        default=None,
        metavar="COLUMN",
        help="Unregister COLUMN's ANN index (vacuum collects the "
        "datasets), then exit",
    )
    p.add_argument(
        "--cluster-by",
        default=None,
        metavar="COLS",
        help="Register comma-separated clustering columns (Delta clustered "
        "tables / liquid clustering; metadata-only) and exit; run "
        "--optimize-clustered to lay files out",
    )
    p.add_argument(
        "--optimize-clustered",
        action="store_true",
        help="Incrementally OPTIMIZE the clustered table: rewrite "
        "unclustered files and partial ZCubes into one curve-ordered "
        "ZCube, leave stable cubes alone, then exit (no-op when "
        "converged; honors --dry-run and --target-file-size-bytes)",
    )
    p.add_argument(
        "--cluster-status",
        action="store_true",
        help="Print the clustering state (columns, clustered/unclustered "
        "file counts, ZCubes, bytes a next OPTIMIZE would touch) and exit",
    )
    p.add_argument(
        "--min-zcube-bytes",
        type=int,
        default=None,
        help="With --optimize-clustered: ZCubes smaller than this stay "
        "mergeable into later cubes (default 100 MiB)",
    )
    p.add_argument(
        "--attest",
        action="store_true",
        help="Backfill key-stat attestation for files that lack it (one "
        "column-pruned scan of unattested files, one dataChange=false "
        "commit): later validations of --sort-columns become "
        "metadata-only, including on tables written by other engines; "
        "then exit",
    )
    p.add_argument(
        "--bin-pack",
        action="store_true",
        help="OPTIMIZE-style bin-packing compaction (no sort): coalesce "
        "each partition's small files (< half --target-file-size-bytes) "
        "into ~target-sized files in one dataChange=false commit, then "
        "exit; honors --single-job-threshold and --predicate "
        "(OPTIMIZE ... WHERE: only matching partitions are packed)",
    )
    p.add_argument(
        "--convert",
        action="store_true",
        help="CONVERT TO DELTA: adopt the existing plain-parquet directory "
        "at --table in place (flat or Hive-partitioned) — writes a "
        "_delta_log Adding every file, moves no data bytes, then exits. "
        "With --sort-columns, per-file min/max stats for those columns "
        "are computed during the convert (else run --attest later)",
    )
    p.add_argument(
        "--restore",
        type=int,
        default=None,
        metavar="VERSION",
        help="RESTORE TABLE TO VERSION AS OF: one metadata-only commit "
        "makes the active file set equal VERSION's (errors if a needed "
        "data file was vacuumed; history is preserved — a restore is "
        "itself a commit), then exit",
    )
    p.add_argument(
        "--vacuum",
        action="store_true",
        help="Delete unreferenced data files (tombstoned or orphaned) and "
        "exit; combine with --dry-run to list without deleting",
    )
    p.add_argument(
        "--retention-hours",
        type=float,
        default=None,
        help="With --vacuum: skip files modified more recently than this "
        "(protects in-flight writers; default honors the table's "
        "delta.deletedFileRetentionDuration property, else 0). With "
        "--cleanup-log: the log retention window (default 720 = 30 days)",
    )
    p.add_argument(
        "--checkpoint",
        action="store_true",
        help="Write a parquet checkpoint of the current log state and exit "
        "(bounds log-replay cost for all readers)",
    )
    p.add_argument(
        "--cleanup-log",
        action="store_true",
        help="Delete commit json / checkpoint files superseded by the "
        "latest checkpoint and older than --retention-hours (default 720 "
        "= Delta's 30-day logRetentionDuration), then exit; combine with "
        "--dry-run to list. Trades away time travel before the cutoff",
    )
    p.add_argument(
        "--checkpoint-v2",
        action="store_true",
        help="With --checkpoint: write a V2 checkpoint (protocol "
        "v2Checkpoint feature; table metadata reads without the file "
        "manifest, which lives in a _sidecars/ parquet)",
    )
    p.add_argument(
        "--enable-row-tracking",
        action="store_true",
        help="Enable Delta row tracking (stable row ids across compaction "
        "and DML; backfills every existing file in one commit) and exit",
    )
    p.add_argument(
        "--enable-in-commit-timestamps",
        action="store_true",
        help="Enable monotonic in-commit timestamps (timestampAsOf stays "
        "correct under multi-writer clock skew) and exit",
    )
    p.add_argument(
        "--add-constraint",
        nargs=2,
        metavar=("NAME", "EXPR"),
        default=None,
        help="ADD CONSTRAINT NAME CHECK (EXPR): validate all existing rows, "
        "then enforce on every later write; exit 1 if existing data "
        "violates",
    )
    p.add_argument(
        "--drop-constraint",
        default=None,
        metavar="NAME",
        help="Drop the named CHECK constraint and exit",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level.upper(), format="%(asctime)s %(name)s %(message)s")
    sort_columns = [c.strip() for c in args.sort_columns.split(",") if c.strip()]

    from delta_sorter_spark import api

    index_verb = (
        args.build_bloom_index or args.refresh_bloom_index
        or args.drop_bloom_index or args.build_ann_index
        or args.refresh_ann_index or args.compact_ann_index
        or args.drop_ann_index
    )
    maintenance_verb = (
        args.vacuum or args.checkpoint or args.enable_row_tracking
        or args.enable_in_commit_timestamps or args.add_constraint
        or args.drop_constraint or args.cluster_by or args.optimize_clustered
        or args.cluster_status or args.cleanup_log or args.bin_pack
        or args.restore is not None or args.convert
    )
    if not sort_columns and not (
        args.history or args.detail or index_verb or maintenance_verb
    ):
        print("error: --sort-columns is required", file=sys.stderr)
        return 2

    try:
        return _run(args, sort_columns, api)
    except FileNotFoundError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2


def _run(args, sort_columns, api) -> int:
    if args.history:
        from delta_sorter_spark.sources.delta_log import DeltaLog

        for h in DeltaLog(args.table).history():
            params = " ".join(f"{k}={v}" for k, v in (h["operationParameters"] or {}).items())
            print(f"v{h['version']} ts={h['timestamp']} op={h['operation']} {params}".rstrip())
        return 0

    if args.build_bloom_index or args.refresh_bloom_index or args.drop_bloom_index:
        from delta_sorter_spark.operators.bloom_index import (
            build_bloom_index,
            drop_bloom_index,
            refresh_bloom_index,
        )
        from delta_sorter_spark.session import get_spark
        from delta_sorter_spark.sources.delta_table import DeltaTable

        tbl = DeltaTable(get_spark(), args.table)
        try:
            if args.build_bloom_index:
                r = build_bloom_index(tbl, args.build_bloom_index)
                print(
                    f"bloom_index column={r['column']} files={r['files']} "
                    f"version={r['version']}"
                )
            elif args.refresh_bloom_index:
                r = refresh_bloom_index(tbl, args.refresh_bloom_index)
                print(
                    f"bloom_index column={r['column']} files={r['files']} "
                    f"new={r['new_files']} dropped={r['dropped_files']} "
                    f"version={r['version']}"
                )
            else:
                v = drop_bloom_index(tbl, args.drop_bloom_index)
                print(
                    f"bloom_index dropped column={args.drop_bloom_index} "
                    f"version={v}"
                )
        except KeyError as exc:
            # the index verbs signal "no such index" with KeyError — a
            # usage error here; internal KeyErrors elsewhere still traceback
            print(
                f"error: {exc.args[0] if exc.args else exc}", file=sys.stderr
            )
            return 2
        return 0

    if (args.build_ann_index or args.refresh_ann_index
            or args.compact_ann_index or args.drop_ann_index):
        from delta_sorter_spark.operators.ann_index import (
            build_ann_index,
            compact_ann_index,
            drop_ann_index,
            refresh_ann_index,
        )
        from delta_sorter_spark.session import get_spark
        from delta_sorter_spark.sources.delta_table import DeltaTable

        tbl = DeltaTable(get_spark(), args.table)
        try:
            if args.build_ann_index:
                parts = args.build_ann_index.split(":")
                if len(parts) != 3 or not parts[2].isdigit():
                    print(
                        "error: --build-ann-index expects COLUMN:ID_COL:DIM",
                        file=sys.stderr,
                    )
                    return 2
                r = build_ann_index(tbl, parts[0], parts[1], int(parts[2]))
                print(
                    f"ann_index column={r['column']} rows={r['rows']} "
                    f"files={r['files']} version={r['version']}"
                )
            elif args.refresh_ann_index:
                r = refresh_ann_index(tbl, args.refresh_ann_index)
                print(
                    f"ann_index column={r['column']} "
                    f"reencoded={r['reencoded_files']} "
                    f"dropped={r['dropped_files']} "
                    f"carried={r['carried_files']} version={r['version']}"
                )
            elif args.compact_ann_index:
                r = compact_ann_index(tbl, args.compact_ann_index)
                print(
                    f"ann_index column={r['column']} "
                    f"parts_in={r['parts_in']} rows={r['rows']} "
                    f"version={r['version']}"
                )
            else:
                v = drop_ann_index(tbl, args.drop_ann_index)
                print(
                    f"ann_index dropped column={args.drop_ann_index} "
                    f"version={v}"
                )
        except (KeyError, ValueError) as exc:
            # KeyError: no such index; ValueError: unknown column /
            # non-integral id / empty table — usage errors, not tracebacks
            print(
                f"error: {exc.args[0] if exc.args else exc}", file=sys.stderr
            )
            return 2
        return 0

    if args.detail:
        import json as _json

        from delta_sorter_spark.session import get_spark
        from delta_sorter_spark.sources.delta_table import DeltaTable

        d = DeltaTable(get_spark(), args.table).detail(version=args.at_version)
        print(_json.dumps(d, indent=2, default=str))
        return 0

    if (
        args.vacuum or args.checkpoint or args.enable_row_tracking
        or args.enable_in_commit_timestamps or args.add_constraint
        or args.drop_constraint or args.cluster_by or args.optimize_clustered
        or args.cluster_status or args.cleanup_log or args.bin_pack
        or args.restore is not None or args.convert
    ):
        from delta_sorter_spark.session import get_spark
        from delta_sorter_spark.sources.delta_table import DeltaTable

        if args.convert:
            try:
                tbl = DeltaTable.convert_to_delta(
                    get_spark(), args.table, stat_columns=sort_columns or None
                )
            except (FileExistsError, NotImplementedError) as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
            st = tbl.state()
            print(
                f"converted files={len(st.adds)} version={st.version} "
                f"partition_columns={','.join(st.metadata.partition_columns) or '(none)'}"
            )
            return 0

        tbl = DeltaTable(get_spark(), args.table)
        if args.restore is not None:
            from delta_sorter_spark.operators.dml import restore

            r = restore(tbl, args.restore)
            print(
                f"restore to_version={args.restore} "
                f"added={r['added_files']} removed={r['removed_files']} "
                f"version={r['version']}"
            )
        if args.bin_pack:
            from delta_sorter_spark.operators.compact import bin_pack_compact

            m = bin_pack_compact(
                tbl.spark,
                args.table,
                **(
                    {"target_file_size_bytes": args.target_file_size_bytes}
                    if args.target_file_size_bytes
                    else {}
                ),
                single_job_threshold=args.single_job_threshold or None,
                predicate=args.predicate,
            )
            print(
                f"bin-pack planned={m.planned_partitions} "
                f"rewritten={m.rewritten_partitions} "
                f"files {m.files_in}->{m.files_out} "
                f"bytes {m.bytes_in}->{m.bytes_out} "
                f"duration_ms={m.duration_ms}"
            )
        if args.cluster_by:
            cols = [c.strip() for c in args.cluster_by.split(",") if c.strip()]
            try:
                v = tbl.set_clustering_columns(cols)
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
            print(f"clustering columns set cols={','.join(cols)} version={v}")
        if args.cluster_status:
            from delta_sorter_spark.operators.cluster import cluster_status

            st = cluster_status(tbl)
            cols = ",".join(st["clustering_columns"]) or "(none)"
            print(
                f"clustering cols={cols} files={st['files']} "
                f"clustered={st['clustered_files']} "
                f"unclustered={st['unclustered_files']} "
                f"zcubes={st['zcubes']} "
                f"next_optimize_bytes={st['unclustered_bytes']}"
            )
        if args.optimize_clustered:
            from delta_sorter_spark.operators.cluster import (
                DEFAULT_MIN_ZCUBE_BYTES,
                optimize_clustered,
            )

            m = optimize_clustered(
                tbl,
                target_file_size_bytes=args.target_file_size_bytes,
                min_zcube_bytes=(
                    args.min_zcube_bytes
                    if args.min_zcube_bytes is not None
                    else DEFAULT_MIN_ZCUBE_BYTES
                ),
                dry_run=args.dry_run,
            )
            if m["noop"]:
                print("optimize converged: nothing to rewrite")
            else:
                verb = "would rewrite" if args.dry_run else "rewrote"
                print(
                    f"optimize {verb} {m['candidate_files']} file(s) "
                    f"({m['unclustered_files']} unclustered, "
                    f"{m['partial_zcubes']} partial cube(s)) -> "
                    f"{m['files_out']} file(s) version={m['version']}"
                )
        if args.add_constraint:
            name, expr = args.add_constraint
            try:
                v = tbl.add_check_constraint(name, expr)
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 1
            print(f"constraint added name={name} version={v}")
        if args.drop_constraint:
            try:
                v = tbl.drop_check_constraint(args.drop_constraint)
            except KeyError as exc:
                print(
                    f"error: {exc.args[0] if exc.args else exc}",
                    file=sys.stderr,
                )
                return 2
            print(f"constraint dropped name={args.drop_constraint} version={v}")
        if args.enable_row_tracking:
            v = tbl.enable_row_tracking()
            print(f"row tracking enabled version={v}")
        if args.enable_in_commit_timestamps:
            v = tbl.enable_in_commit_timestamps()
            print(f"in-commit timestamps enabled version={v}")
        if args.vacuum:
            doomed = tbl.vacuum(
                dry_run=args.dry_run,
                retention_seconds=(
                    args.retention_hours * 3600.0
                    if args.retention_hours is not None
                    else None
                ),
            )
            verb = "would delete" if args.dry_run else "deleted"
            print(f"vacuum {verb} {len(doomed)} file(s)")
            for rel in doomed[:20]:
                print(f"  {rel}")
        if args.checkpoint:
            path = tbl.log.write_checkpoint(v2=args.checkpoint_v2)
            print(f"checkpoint written: {path}")
        if args.cleanup_log:
            hours = args.retention_hours if args.retention_hours is not None else 720.0
            r = tbl.log.cleanup_metadata(
                retention_seconds=hours * 3600.0, dry_run=args.dry_run
            )
            verb = "would delete" if args.dry_run else "deleted"
            print(
                f"log cleanup {verb} {len(r['deleted'])} file(s); "
                f"replay floor v{r['cutoff_version']}"
            )
        return 0

    if args.attest:
        from delta_sorter_spark.functions.keys import parse_sort_spec
        from delta_sorter_spark.operators.validate import attest_sort_stats
        from delta_sorter_spark.session import get_spark
        from delta_sorter_spark.sources.delta_table import DeltaTable

        cols, ascending = parse_sort_spec(sort_columns)
        r = attest_sort_stats(
            DeltaTable(get_spark(), args.table),
            cols,
            nulls_first=args.nulls == "first",
            directions=None if all(ascending) else ascending,
        )
        print(
            f"attested={r['attested']} already={r['already']} "
            f"skipped_concurrent={r['skipped_concurrent']} "
            f"version={r['version']}"
        )
        return 0

    if args.validate_only:
        report = api.validate(
            args.table, sort_columns, nulls=args.nulls, version=args.at_version
        )
        print(
            f"checked_files={report['checked_files']} "
            f"boundary_violations={report['boundary_violations']}"
        )
        for d in report["details_sample"]:
            print(f"  {d}")
        return 1 if report["boundary_violations"] > 0 else 0

    metrics = api.compact(
        args.table,
        sort_columns,
        target_file_size_bytes=args.target_file_size_bytes,
        predicate=args.predicate,
        concurrency=args.concurrency,
        dry_run=args.dry_run,
        repartition_by_sort_key=args.repartition_by_sort_key,
        nulls=args.nulls,
        zorder_columns=[c.strip() for c in args.zorder_by.split(",") if c.strip()]
        if args.zorder_by
        else None,
        refresh_bloom_indexes=args.refresh_bloom_indexes,
        single_job_threshold=args.single_job_threshold or None,
    )
    print(
        f"planned={metrics.planned_partitions} rewritten={metrics.rewritten_partitions} "
        f"skipped={metrics.skipped_partitions} files {metrics.files_in}->{metrics.files_out} "
        f"bytes {metrics.bytes_in}->{metrics.bytes_out} duration_ms={metrics.duration_ms}"
    )
    return 0


if __name__ == "__main__":
    rc = main()
    # Stop the JVM deliberately: py4j's atexit teardown can race the
    # interpreter under CPU starvation and abort (exit 134) AFTER the verb
    # already printed its result — which would corrupt the CLI's exit-code
    # contract.  (main() itself never stops Spark: tests and embedders call
    # it with a live session they keep using.)
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
    except Exception:
        pass
    sys.exit(rc)
