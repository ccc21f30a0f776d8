"""Compaction with global/per-partition lexicographic ordering
(reference compact_with_sort, lib.rs:166-248; rewrite lib.rs:778-896; strict
overwrite lib.rs:427-481).

Two modes, matching the reference dispatch (lib.rs:169-178):

- **strict** (``repartition_by_sort_key=True``): read all -> global
  ``orderBy(keys)`` -> atomic full-table overwrite.  Spark's global sort is
  sampled *range partitioning* + per-range external sort, so output files
  carry disjoint key ranges and the table comes out globally ordered — the
  100 TB unlock the reference's single-process sort cannot reach (SURVEY §4
  "Global sort strategy").  Empty sort columns -> no-op (lib.rs:437-439).

- **partition-aware** (default): group active files by Hive partition
  (plans.inventory), validate each group (metadata-fast), keep only
  *unsorted* groups (the reference's core work-avoidance idea,
  lib.rs:299-311; validator errors conservatively include the group,
  lib.rs:306-310), then rewrite failing groups largest-first
  (lib.rs:313) under bounded concurrency (lib.rs:209-224) with
  replaceWhere-scoped commits (lib.rs:862-885).

All rewrites are committed with ``dataChange=false`` (lib.rs:818-828) so
downstream streams/CDC see no new data, and with exact key-stat attestation
so the *next* validation of the table is metadata-only.

The reference's ``--predicate`` is parsed but never applied ("Reserved for
future filtering support", lib.rs:97,106).  We implement it (SURVEY M4) with
safe semantics: it *scopes* the partition-aware plan to partitions whose
partition values satisfy the predicate — it never drops data rows.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from delta_sorter_spark.functions.keys import sort_order_columns
from delta_sorter_spark.functions.predicates import (
    partition_filter_expr,
    render_partition_predicate,
    validate_sort_columns,
)
from delta_sorter_spark.operators.validate import partition_is_sorted
from delta_sorter_spark.plans.inventory import RewriteGroup, group_by_partition
from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.functions.localframe import local_df

log = logging.getLogger("delta_sorter_spark.compact")

DEFAULT_CONCURRENCY = 8  # reference default, main.rs:30-31 / lib.rs:119


@dataclass
class SortConfig:
    """Reference SortConfig (lib.rs:102-125)."""

    sort_columns: list[str]
    target_file_size_bytes: int | None = None
    predicate: str | None = None
    concurrency: int = DEFAULT_CONCURRENCY
    dry_run: bool = False
    repartition_by_sort_key: bool = False  # strict mode
    nulls_first: bool = True  # default "first", lib.rs:122
    # per-column sort direction (True=asc), parallel to sort_columns; the
    # reference lists this as roadmap-only (README.md:183) — we implement it.
    # None = all ascending.  Directed compactions attest a direction-specific
    # keyStats entry, so re-validating the same directed order is
    # metadata-only; other orderings fall back to the scan path.
    directions: list[bool] | None = None
    # extension beyond the reference: cluster by the Morton interleave of
    # these (integer-compatible) columns instead of a lexicographic sort —
    # Delta OPTIMIZE ZORDER BY semantics.  Implies a full-table rewrite
    # (z-clustering is not per-partition-skippable by the lexicographic
    # validator).
    zorder_columns: list[str] | None = None
    # extension: after a rewriting compaction, catch every registered
    # Bloom index up with the new file layout (operators/bloom_index.py).
    # A rewrite replaces file paths, which is exactly when indexes go
    # stale (stale = point lookups keep the unindexed new files, correct
    # but unpruned); each refresh scans only the rewritten files.
    refresh_bloom_indexes: bool = False
    # Scale escape hatch for the partition-aware plan (SURVEY §2.3 O2):
    # when at least this many partitions fail validation, rewrite them all
    # in ONE Spark job + ONE commit instead of a job per partition.  The
    # per-partition fan-out (faithful to lib.rs:209-224) is a driver-side
    # job-submission bottleneck at 10k-100k failing Hive partitions — a
    # realistic 100 TB backfill.  None disables the single-job mode.
    single_job_threshold: int | None = 64


@dataclass
class PartitionMetrics:
    """Per-partition rewrite metrics (lib.rs:152-160, 886-895)."""

    partition_key: str
    files_in: int
    files_out: int
    bytes_in: int
    bytes_out: int
    duration_ms: int


@dataclass
class CompactMetrics:
    planned_partitions: int = 0
    rewritten_partitions: int = 0
    skipped_partitions: int = 0
    files_in: int = 0
    files_out: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    duration_ms: int = 0
    dry_run: bool = False
    partitions: list[PartitionMetrics] = field(default_factory=list)


def compact_with_sort(spark: SparkSession, table_uri: str, config: SortConfig) -> CompactMetrics:
    started = time.monotonic()
    table = DeltaTable(spark, table_uri)

    if config.repartition_by_sort_key or config.zorder_columns:
        metrics = _strict_overwrite(table, config)
    else:
        metrics = _partition_aware(table, config)
    if (
        config.refresh_bloom_indexes
        and not config.dry_run
        and metrics.rewritten_partitions > 0
    ):
        from delta_sorter_spark.operators.bloom_index import (
            bloom_specs,
            refresh_bloom_index,
        )

        for col in sorted(bloom_specs(table)):
            r = refresh_bloom_index(table, col)
            log.info(
                "bloom index %s refreshed: %d new file(s), %d dropped",
                col, r["new_files"], r["dropped_files"],
            )
    metrics.duration_ms = int((time.monotonic() - started) * 1000)
    log.info(
        "compact summary: partitions planned=%d rewritten=%d skipped=%d "
        "files %d->%d bytes %d->%d in %dms",
        metrics.planned_partitions,
        metrics.rewritten_partitions,
        metrics.skipped_partitions,
        metrics.files_in,
        metrics.files_out,
        metrics.bytes_in,
        metrics.bytes_out,
        metrics.duration_ms,
    )
    return metrics


def _partition_prefix_order(part_cols):
    """Ascending-nulls-first ordering on the Hive partition columns — the
    prefix every dynamic-partitioned write must present so Spark's writer
    streams the frame instead of inserting its own partition-column sort
    (which does not preserve key order within equal partition values)."""
    from pyspark.sql import functions as F

    return [F.col(c).asc_nulls_first() for c in part_cols]


def _strict_overwrite(table: DeltaTable, config: SortConfig) -> CompactMetrics:
    """C5: full-table sorted overwrite.  Fixes the reference's broken
    strict-from-Python path (xfail upstream issue #17,
    python/tests/test_validate_and_compact.py:53-59)."""
    metrics = CompactMetrics(dry_run=config.dry_run)
    if not config.sort_columns and not config.zorder_columns:
        return metrics  # no-op, lib.rs:437-439
    state = table.state()
    validate_sort_columns(
        state.metadata.data_schema, config.zorder_columns or config.sort_columns
    )
    metrics.planned_partitions = 1
    metrics.files_in = len(state.adds)
    metrics.bytes_in = sum(a.size for a in state.adds)
    if config.dry_run:
        return metrics

    df = table.read_for_rewrite(state.adds)
    rw_schema = table.rewrite_schema()
    if config.zorder_columns:
        from delta_sorter_spark.operators.zorder import zorder_layout

        clustered = zorder_layout(df, config.zorder_columns)
        adds = table.stage_write(
            clustered,
            # per-file min/max on the z columns is the pruning payoff; the
            # files are NOT lexicographically sorted, so no sortedness
            # attestation is written
            stat_columns=config.zorder_columns,
            target_file_size_bytes=config.target_file_size_bytes,
            data_change=False,
            sorted_within_files=False,
            schema=rw_schema,
        )
    else:
        sorted_df = df.orderBy(
            *sort_order_columns(config.sort_columns, config.nulls_first, config.directions)
        )
        if state.metadata.partition_columns:
            # Partitioned table under strict mode: the dynamic-partitioned
            # write needs a partition-column ordering prefix, or Spark
            # inserts its own sort and un-orders the files (see
            # _rewrite_group).  Re-grouping each range-task's slice by
            # partition value keeps every OUTPUT FILE exactly sorted on the
            # keys (the attested property); the cross-partition interleave
            # a Hive layout forces is inherent to partitionBy, not to this
            # step.
            sorted_df = sorted_df.sortWithinPartitions(
                *_partition_prefix_order(state.metadata.partition_columns),
                *sort_order_columns(
                    config.sort_columns, config.nulls_first, config.directions
                ),
            )
        adds = table.stage_write(
            sorted_df,
            stat_columns=config.sort_columns,
            target_file_size_bytes=config.target_file_size_bytes,
            data_change=False,
            # the sortedness attestation describes the all-ASC order; only
            # claim it when that is the order we produced
            sorted_within_files=config.directions is None or all(config.directions),
            # directed orders attest their own keyStats entry so later
            # directed validations stay metadata-only
            attest_directions=config.directions,
            schema=rw_schema,
        )
    removes = [a.remove_action(False) for a in state.adds]
    from delta_sorter_spark.sources.delta_table import ConcurrentRewriteError

    try:
        table.commit_rewrite(adds, removes, predicate=None, operation="OPTIMIZE")
    except ConcurrentRewriteError:
        log.info("strict overwrite lost a concurrent rewrite race; discarding staged files")
        table.discard_files(adds)
        return metrics
    metrics.rewritten_partitions = 1
    metrics.files_out = len(adds)
    metrics.bytes_out = sum(a.size for a in adds)
    return metrics


def _plan_rewrites(table: DeltaTable, config: SortConfig) -> tuple[list[RewriteGroup], int]:
    """C1: inventory -> per-partition validate -> failing groups only,
    largest-first (lib.rs:251-319).

    At or above ``single_job_threshold`` groups the per-partition scans are
    batched: ONE distributed summary job over every unattested file, then
    each group's boundary check runs on the driver over its own summary
    rows.  The per-group loop costs a Spark job per unattested partition —
    at 10k+ partitions that is the planning half of the driver-side
    job-submission bottleneck the single-job rewrite mode removes."""
    state = table.state()
    validate_sort_columns(state.metadata.data_schema, config.sort_columns)
    groups = group_by_partition(state.adds)
    if config.predicate and state.metadata.partition_columns:
        groups = _scope_groups_by_predicate(table, groups, config.predicate)
    total = len(groups)
    if (
        config.single_job_threshold is not None
        and len(groups) >= config.single_job_threshold
    ):
        try:
            return _plan_rewrites_bulk(table, groups, config), total
        except Exception:
            log.warning(
                "bulk validation planning failed; falling back to the"
                " per-partition loop", exc_info=True,
            )
    failing: list[RewriteGroup] = []
    for grp in groups:
        try:
            ok = partition_is_sorted(
                table, grp.files, config.sort_columns, config.nulls_first,
                config.directions,
            )
        except Exception:  # conservatively include (lib.rs:306-310)
            log.warning("validation failed for partition %s; scheduling rewrite", grp.partition_key)
            ok = False
        if not ok:
            failing.append(grp)
    return failing, total


def _plan_rewrites_bulk(
    table: DeltaTable, groups: list[RewriteGroup], config: SortConfig
) -> list[RewriteGroup]:
    """Batched planning: one summary pass over ALL groups' files (attested
    files resolve from log metadata with zero scan; the rest share one
    distributed mapInPandas job), then a driver-side per-group boundary
    check — O(#files) driver work, the same class as the inventory fold."""
    from delta_sorter_spark.operators.validate import check_order, summarize_files

    all_files = [a for g in groups for a in g.files]
    by_path = {
        s.path: s
        for s in summarize_files(
            table, all_files, config.sort_columns, config.nulls_first,
            config.directions,
        )
    }
    failing: list[RewriteGroup] = []
    for grp in groups:
        subs = [by_path[a.path] for a in grp.files if a.path in by_path]
        not_asc, cross, _ = check_order(subs, config.nulls_first, config.directions)
        if not_asc or cross or len(subs) != len(grp.files):
            failing.append(grp)
    return failing


def _scope_groups_by_predicate(
    table: DeltaTable, groups: list[RewriteGroup], predicate: str
) -> list[RewriteGroup]:
    """P5: evaluate the user predicate against each partition's values (one
    tiny local DataFrame, no data scan) and keep matching groups."""
    meta = table.metadata
    part_cols = meta.partition_columns
    spark = table.spark
    rows = []
    for grp in groups:
        rows.append(tuple(grp.partition_values.get(c) for c in part_cols) + (grp.partition_key,))
    schema = ", ".join([f"`{c}` string" for c in part_cols] + ["`__group_key__` string"])
    pdf = local_df(spark, rows, schema)
    for c in part_cols:
        pdf = pdf.withColumn(c, pdf[c].cast(meta.schema[c].dataType))
    keep = {r["__group_key__"] for r in pdf.where(predicate).select("__group_key__").collect()}
    return [g for g in groups if g.partition_key in keep]


def _partition_aware(table: DeltaTable, config: SortConfig) -> CompactMetrics:
    metrics = CompactMetrics(dry_run=config.dry_run)
    failing, total = _plan_rewrites(table, config)
    metrics.planned_partitions = len(failing)
    metrics.skipped_partitions = total - len(failing)
    metrics.files_in = sum(len(g.files) for g in failing)
    metrics.bytes_in = sum(g.estimated_bytes for g in failing)
    if config.dry_run:
        log.info("dry-run: %d partitions would be rewritten", len(failing))
        return metrics

    if (
        config.single_job_threshold is not None
        and len(failing) >= config.single_job_threshold
        and table.metadata.partition_columns
    ):
        return _rewrite_groups_single_job(table, failing, config, metrics)

    concurrency = max(config.concurrency, 1)  # lib.rs:209-224
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        results = list(pool.map(lambda g: _rewrite_group(table, g, config), failing))
    for pm in results:
        metrics.partitions.append(pm)
        metrics.rewritten_partitions += 1
        metrics.files_out += pm.files_out
        metrics.bytes_out += pm.bytes_out
    return metrics


def _range_partitions_for(
    bytes_in: int, n_groups: int, target_file_size_bytes, meta, spark
) -> int:
    """Range-partition count for a single-job rewrite, derived from DATA:

        size_parts = ceil(input bytes / target file size)
        floor      = min(n_groups (>= 1 output file per Hive partition),
                         defaultParallelism)
        n          = max(size_parts, floor), capped at the output-file
                     estimate max(n_groups, size_parts)

    Today the exchange inherits ``spark.sql.shuffle.partitions`` — wrong in
    BOTH directions at scale: a 100 TB backfill on shuffle.partitions=2000
    sorts ~50 GB per task (spill, §5), while a small table pays a fixed
    cluster-wide fan-out for MB-sized slices (§2.2).  ``size_parts`` makes
    the count grow with the table; the floor keeps the parquet-encode of a
    many-partition rewrite parallel (measured at sf0.1: forcing 1 range
    partition serialized a 100-partition write, 3.3-4.3 s -> 5.4-7.2 s, so
    a pure bytes/target rule LOSES locally — the floor is what keeps this
    a no-op at bench scale).  Falls back to the table's
    ``delta.targetFileSize`` then 128 MiB, the bin-pack default."""
    from delta_sorter_spark.sources.delta_table import _parse_size_bytes

    target = (
        target_file_size_bytes
        or _parse_size_bytes((meta.configuration or {}).get("delta.targetFileSize"))
        or 128 * 1024 * 1024
    )
    size_parts = max(1, -(-int(bytes_in) // int(target)))
    est_files = max(int(n_groups), size_parts)
    floor = min(est_files, spark.sparkContext.defaultParallelism)
    return min(est_files, max(size_parts, floor))


def _rewrite_groups_single_job(
    table: DeltaTable,
    failing: list[RewriteGroup],
    config: SortConfig,
    metrics: CompactMetrics,
) -> CompactMetrics:
    """Many-partition rewrite as ONE Spark job + ONE commit (SURVEY §2.3
    O2's single-shot form).  Shape:

        read(all failing files)
          -> repartitionByRange(partition cols + sort keys)
          -> sortWithinPartitions(partition cols + sort keys)
          -> stage_write (dynamic partitionBy split, per-file attestation)
          -> one commit_rewrite

    Range partitioning (not ``repartition(part_cols)``, the survey's
    sketch) because hash-on-partition pins each Hive partition to exactly
    one task — a skewed partition becomes a straggler the executor count
    can't help.  The sampled range exchange splits big partitions across
    tasks and keeps every task's slice contiguous in (partition, key)
    space, so each output file still carries one partition's rows (the
    dynamic ``partitionBy`` write splits residual task-level mixing) in
    fully attested sorted order, and files within a partition get disjoint
    key ranges.  The work-avoidance plan (only FAILING partitions are
    read) is unchanged — only the execution shape differs from the
    reference's bounded fan-out (lib.rs:209-224)."""
    from pyspark.sql import functions as F

    started = time.monotonic()
    meta = table.metadata
    part_cols = meta.partition_columns
    all_files = [a for g in failing for a in g.files]
    df = table.read_for_rewrite(all_files)
    layout_cols = [F.col(c).asc_nulls_first() for c in part_cols] + list(
        sort_order_columns(config.sort_columns, config.nulls_first, config.directions)
    )
    # Size the range exchange from the KNOWN input bytes instead of
    # inheriting spark.sql.shuffle.partitions (guide §2.2/§6): ~one range
    # partition per target-file-size of input, floored by write
    # parallelism — see _range_partitions_for for the measured rationale.
    n_range = _range_partitions_for(
        sum(a.size for a in all_files), len(failing),
        config.target_file_size_bytes, meta, table.spark,
    )
    shaped = df.repartitionByRange(n_range, *layout_cols).sortWithinPartitions(
        *layout_cols
    )
    adds = table.stage_write(
        shaped,
        stat_columns=config.sort_columns,
        target_file_size_bytes=config.target_file_size_bytes,
        data_change=False,
        sorted_within_files=config.directions is None or all(config.directions),
        attest_directions=config.directions,
        schema=table.rewrite_schema(),
    )
    removes = [a.remove_action(False) for a in all_files]
    from delta_sorter_spark.sources.delta_table import ConcurrentRewriteError

    try:
        table.commit_rewrite(adds, removes, predicate=None, operation="OPTIMIZE")
    except ConcurrentRewriteError:
        log.info(
            "single-job rewrite of %d partitions lost a concurrent race;"
            " discarding staged files",
            len(failing),
        )
        table.discard_files(adds)
        return metrics

    duration_ms = int((time.monotonic() - started) * 1000)
    by_key_in = {g.partition_key: g for g in failing}
    out_count: dict[str, int] = {}
    out_bytes: dict[str, int] = {}
    for a in adds:
        key = "/".join(
            f"{k}={'null' if v is None else v}"
            for k, v in sorted(a.partition_values.items())
        )
        out_count[key] = out_count.get(key, 0) + 1
        out_bytes[key] = out_bytes.get(key, 0) + a.size
    for key, grp in by_key_in.items():
        metrics.partitions.append(
            PartitionMetrics(
                partition_key=key,
                files_in=len(grp.files),
                files_out=out_count.get(key, 0),
                bytes_in=grp.estimated_bytes,
                bytes_out=out_bytes.get(key, 0),
                duration_ms=duration_ms,  # shared job: per-partition cost
                # is not separable in single-job mode
            )
        )
        metrics.rewritten_partitions += 1
    metrics.files_out = len(adds)
    metrics.bytes_out = sum(a.size for a in adds)
    log.info(
        "single-job rewrite: %d partitions, files %d->%d in %dms",
        len(failing), len(all_files), len(adds), duration_ms,
    )
    return metrics


def _rewrite_group(table: DeltaTable, grp: RewriteGroup, config: SortConfig) -> PartitionMetrics:
    """One partition rewrite (reference rewrite_partition_tx,
    lib.rs:778-896): scoped read (file-level pruning from the log) -> sort ->
    stage write -> replaceWhere commit with dataChange=false."""
    started = time.monotonic()
    meta = table.metadata
    df = table.read_for_rewrite(grp.files)
    if grp.partition_values:
        # Belt-and-braces: the file list already prunes to the partition;
        # the filter also documents intent to Catalyst (partition pruning).
        df = df.where(partition_filter_expr(grp.partition_values, meta.schema))
    # The partition columns LEAD the sort even though they are constant
    # within the group: the dynamic-partitioned write requires its input
    # ordered by the partition columns, and when the plan's ordering does
    # not carry that prefix Spark inserts its own partition-column sort —
    # which does NOT preserve the key order within equal partition values,
    # silently un-sorting every file (caught by the attested keyStats:
    # ascending=false, so work avoidance never engaged on partitioned
    # tables).  Constant columns add nothing to the range exchange.
    sorted_df = df.orderBy(
        *_partition_prefix_order(meta.partition_columns),
        *sort_order_columns(config.sort_columns, config.nulls_first, config.directions),
    )
    adds = table.stage_write(
        sorted_df,
        stat_columns=config.sort_columns,
        target_file_size_bytes=config.target_file_size_bytes,
        data_change=False,
        sorted_within_files=config.directions is None or all(config.directions),
        attest_directions=config.directions,
        schema=table.rewrite_schema(),
    )
    predicate = (
        render_partition_predicate(grp.partition_values, meta.schema)
        if grp.partition_values
        else None
    )
    removes = [a.remove_action(False) for a in grp.files]
    from delta_sorter_spark.sources.delta_table import ConcurrentRewriteError

    try:
        table.commit_rewrite(adds, removes, predicate=predicate, operation="OPTIMIZE")
    except ConcurrentRewriteError:
        # another writer rewrote this partition first: its result is as good
        # as ours (same sort); drop our staged files and report a no-op
        log.info("partition %s: lost rewrite race, discarding staged files", grp.partition_key)
        table.discard_files(adds)
        return PartitionMetrics(
            partition_key=grp.partition_key,
            files_in=len(grp.files),
            files_out=0,
            bytes_in=grp.estimated_bytes,
            bytes_out=0,
            duration_ms=int((time.monotonic() - started) * 1000),
        )
    pm = PartitionMetrics(
        partition_key=grp.partition_key,
        files_in=len(grp.files),
        files_out=len(adds),
        bytes_in=grp.estimated_bytes,
        bytes_out=sum(a.size for a in adds),
        duration_ms=int((time.monotonic() - started) * 1000),
    )
    log.info(
        "partition %s: files %d->%d bytes %d->%d in %dms",
        pm.partition_key, pm.files_in, pm.files_out, pm.bytes_in, pm.bytes_out, pm.duration_ms,
    )
    return pm


def bin_pack_compact(
    spark: SparkSession,
    table_uri: str,
    target_file_size_bytes: int | None = None,
    min_file_size_bytes: int | None = None,
    single_job_threshold: int | None = 64,
    predicate: str | None = None,
) -> CompactMetrics:
    """Delta OPTIMIZE-style bin-packing compaction — NO sort involved:
    coalesce each partition's small files (< ``min_file_size_bytes``,
    default half the target) into ~target-sized files.  For append-heavy
    streaming tables where the cost is file-count, not order.

    Per qualifying partition: one read of just the small files, a
    size-estimated repartition, and a staged write; all partitions then
    commit as ONE ``dataChange=false`` rewrite, so change feeds and
    streaming sources ignore it and incremental rollups skip it.  Output
    files carry no sortedness attestation (concatenation breaks order) —
    sorted tables should use ``compact_with_sort`` instead.  A partition
    with 1 small file is left alone (nothing to gain).

    At or above ``single_job_threshold`` qualifying partitions the
    per-partition read/write pairs collapse into ONE Spark job (same
    driver-bottleneck escape hatch as the sort path's
    ``_rewrite_groups_single_job``): one read over every partition's
    small files, a ``repartitionByRange(part_cols)`` so each task holds
    contiguous partition values, and one dynamic-partitioned staged
    write — ``maxRecordsPerFile`` keeps output near target size."""
    started = time.monotonic()
    table = DeltaTable(spark, table_uri)
    state = table.state()
    if target_file_size_bytes is None:
        # table-level default (delta.targetFileSize), else 128 MiB
        from delta_sorter_spark.sources.delta_table import _parse_size_bytes

        target_file_size_bytes = (
            _parse_size_bytes(
                (state.metadata.configuration or {}).get("delta.targetFileSize")
            )
            or 128 * 1024 * 1024
        )
    small_cut = min_file_size_bytes or target_file_size_bytes // 2
    metrics = CompactMetrics()
    part_cols = state.metadata.partition_columns

    groups = group_by_partition(state.adds)
    if predicate:
        # OPTIMIZE ... WHERE: partition-scoped bin-packing (the predicate
        # evaluates against partition VALUES — P5's planner-only check)
        groups = _scope_groups_by_predicate(table, groups, predicate)
    qualifying: list[tuple[RewriteGroup, list]] = []
    for grp in sorted(groups, key=lambda g: -g.estimated_bytes):
        small = [a for a in grp.files if a.size < small_cut]
        if len(small) >= 2:
            qualifying.append((grp, small))

    from delta_sorter_spark.sources.delta_table import ConcurrentRewriteError

    if (
        single_job_threshold is not None
        and len(qualifying) >= single_job_threshold
        and part_cols
    ):
        all_small = [a for _, small in qualifying for a in small]
        metrics.planned_partitions = len(qualifying)
        metrics.files_in = len(all_small)
        metrics.bytes_in = sum(a.size for a in all_small)
        # same data-derived exchange sizing as the sort path's single-job
        # mode: one range partition per target-file-size of input
        df = table.read_for_rewrite(all_small).repartitionByRange(
            _range_partitions_for(
                metrics.bytes_in, len(qualifying), target_file_size_bytes,
                state.metadata, spark,
            ),
            *_partition_prefix_order(part_cols),
        )
        adds = table.stage_write(
            df,
            target_file_size_bytes=target_file_size_bytes,
            data_change=False,
            schema=table.rewrite_schema(),
        )
        removes = [a.remove_action(False) for a in all_small]
        try:
            table.commit_rewrite(adds, removes, operation="OPTIMIZE")
        except ConcurrentRewriteError:
            log.info("bin-pack lost a concurrent rewrite race; discarding")
            table.discard_files(adds)
            return CompactMetrics()
        metrics.rewritten_partitions = len(qualifying)
        metrics.files_out = len(adds)
        metrics.bytes_out = sum(a.size for a in adds)
        metrics.duration_ms = int((time.monotonic() - started) * 1000)
        return metrics

    all_adds, all_removes = [], []
    for grp, small in qualifying:
        metrics.planned_partitions += 1
        bytes_in = sum(a.size for a in small)
        n_out = max(1, -(-bytes_in // target_file_size_bytes))  # ceil
        df = table.read_for_rewrite(small).repartition(n_out)
        adds = table.stage_write(
            df,
            target_file_size_bytes=target_file_size_bytes,
            data_change=False,
            schema=table.rewrite_schema(),
        )
        all_adds.extend(adds)
        all_removes.extend(a.remove_action(False) for a in small)
        metrics.rewritten_partitions += 1
        metrics.files_in += len(small)
        metrics.bytes_in += bytes_in
        metrics.files_out += len(adds)
        metrics.bytes_out += sum(a.size for a in adds)

    if all_adds:
        try:
            table.commit_rewrite(all_adds, all_removes, operation="OPTIMIZE")
        except ConcurrentRewriteError:
            log.info("bin-pack lost a concurrent rewrite race; discarding")
            table.discard_files(all_adds)
            return CompactMetrics()
    metrics.duration_ms = int((time.monotonic() - started) * 1000)
    return metrics
