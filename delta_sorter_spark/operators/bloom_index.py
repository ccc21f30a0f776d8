"""Per-file Bloom filter index: point-lookup file skipping for columns the
table is NOT clustered on.

Zone maps (functions/skipping.py) serve range predicates on the sort/z-order
columns; they are useless for an equality probe on a high-cardinality column
whose values scatter across every file — the GDPR "erase doc_id = X" shape
on a table compacted by date.  Databricks' Delta solves this with per-file
Bloom filter indexes; this module is that idea on the engine's own portable
hash primitives (functions/hashing.py — the md5->bigint + affine-permutation
scheme the MinHash/LSH operators already use, identical in Spark SQL,
DuckDB, and Python, so the executor-side build and the driver-side probe
positions can never disagree).

Build (`build_bloom_index`): ONE distributed column-pruned scan — each file
contributes its distinct (path, bit) positions, folded to one
``(path, bits array<bigint>)`` row per file — written as a parquet dataset
under ``_bloom_index/<column>/<uuid>`` inside the table directory and
registered in table configuration (``deltasort.bloomIndex.<column>`` = JSON
{path, m, k, seed, version}).  Bitsets NEVER pass through the driver; at
100 TB the index is file-count-sized rows of <=m-bit arrays, living next to
the data.  ``vacuum`` protects the registered dataset (and collects
unregistered ones, so rebuilds self-clean).

Probe (`bloom_prune_adds`): for the conjunctive equality / IN constraints
of a predicate on indexed columns, compute each literal's k bit positions
in Python (same hash), then run ONE tiny Spark job joining the index rows
of the candidate files against ``array_contains`` tests; only paths whose
filter proves "value absent" are dropped.  Files newer than the index (or
missing from it) are kept — staleness can only cost speed, never rows.
Wired into the predicate-DML planners after zone-map pruning: a one-row
DELETE on an unclustered key scans the few bloom-hit files instead of the
table.

Maintenance (`refresh_bloom_index`): catches the index up with the current
snapshot after appends/compaction/DML by scanning ONLY the files it has
never seen — existing rows carry forward, removed files' rows drop, and
the fresh dataset registers atomically under the spec's original hash
geometry.  The data scanned is O(new files); the index dataset rewrite is
file-count-sized noise.

Indexable column types: string and integer (byte/short/int/long) — both
sides hash ``CAST(col AS STRING)`` / ``str(value)``, which agree exactly
for these types and are ambiguous for floats/dates.  NULLs are never
indexed (equality never matches NULL).
"""

from __future__ import annotations

import hashlib
import json
import uuid as _uuid
from collections.abc import Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sorter_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    minhash_perm_sql,
    spark_md5_long_sql,
)
from delta_sorter_spark.sources.delta_log import AddAction
from delta_sorter_spark.sources.delta_table import DeltaTable
from delta_sorter_spark.functions.localframe import local_df

BLOOM_PROP_PREFIX = "deltasort.bloomIndex."
DEFAULT_M_BITS = 1 << 17  # 16 KiB/file; size m at ~10-16 bits per distinct
DEFAULT_K = 3             # key in the column for ~1% false positives

# A dataset is written BEFORE the commit that registers it; in that window a
# concurrent vacuum (default retention 0) would see an unregistered
# directory and collect it.  The build drops a _BUILDING marker first and
# deletes it after registration; vacuum protects marker-fresh directories
# for this grace window, so only a crashed build's leftovers ever expire
# into collectability.
BUILDING_MARKER = "_BUILDING"
BUILD_GRACE_SECONDS = 900.0


def _building_marker_path(table, dataset_rel: str) -> str:
    fsobj = table.log.fs
    return fsobj.join(table.table_path, dataset_rel, BUILDING_MARKER)


def _mark_building(table, dataset_rel: str) -> None:
    fsobj = table.log.fs
    marker = _building_marker_path(table, dataset_rel)
    fsobj.makedirs(fsobj.parent(marker))
    fsobj.write_bytes(marker, b"")


def _unmark_building(table, dataset_rel: str) -> None:
    try:
        table.log.fs.delete(_building_marker_path(table, dataset_rel))
    except (OSError, FileNotFoundError):
        pass

_INDEXABLE = (T.StringType, T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _py_md5_long(s: str) -> int:
    """Python twin of hashing.spark_md5_long_sql (first 15 hex chars)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def value_positions(value, m_bits: int, k: int, seed: int) -> list[int]:
    """The k bit positions a literal sets — driver-side, for probing."""
    h = _py_md5_long(str(value))
    return [
        (a * (h % MERSENNE_P) + b) % MERSENNE_P % m_bits
        for a, b in minhash_params(k, seed)
    ]


def bloom_specs(table: DeltaTable, meta=None) -> dict[str, dict]:
    """column -> registered index spec ({path, m, k, seed, version})."""
    meta = meta if meta is not None else table.metadata
    out = {}
    for key, raw in (meta.configuration or {}).items():
        if not key.startswith(BLOOM_PROP_PREFIX):
            continue
        try:
            spec = json.loads(raw)
        except ValueError:
            continue
        if isinstance(spec, dict) and "path" in spec:
            out[key[len(BLOOM_PROP_PREFIX):]] = spec
    return out


def _column_scan(table: DeltaTable, adds, column: str, meta):
    """(path, __v__) over the given files — column-pruned locally; the
    remote path rides the Python Data Source's withFilePath scan."""
    from delta_sorter_spark.sources.delta_log import physical_name

    field = meta.schema[column]
    phys = physical_name(field)
    if table.is_remote:
        from delta_sorter_spark.streaming.delta_source import FILE_COL

        df = table._to_df_remote(adds=list(adds), with_file_path=True)
        # the source's file column is the table-relative path verbatim
        return df.select(
            F.col(FILE_COL).alias("path"), F.col(column).alias("__v__")
        )
    import os as _os

    from delta_sorter_spark.operators.dml import _rel_path_col

    read_schema = T.StructType([T.StructField(phys, field.dataType, True)])
    files = [_os.path.join(table.table_path, a.path) for a in adds]
    df = (
        table.spark.read.schema(read_schema)
        .parquet(*files)
        .select(
            F.col("_metadata.file_path").alias("__file__"),
            F.col(phys).alias("__v__"),
        )
    )
    return df.select(_rel_path_col(table).alias("path"), "__v__")


def _index_rows(table, adds, column, meta, m_bits: int, k: int, seed: int):
    """One ``(path, bits)`` row per given file — the distributed index
    build: each file contributes its distinct bit positions, and an
    all-NULL file carries an EMPTY filter (provably matches no equality),
    distinct from "not indexed"."""
    spark = table.spark
    paths_df = local_df(spark, 
        [(a.path,) for a in adds], "path string"
    )
    scan = _column_scan(table, adds, column, meta).where(
        F.col("__v__").isNotNull()
    )
    h = spark_md5_long_sql("CAST(__v__ AS STRING)")
    arms = F.array(
        *[
            F.expr(
                f"CAST({minhash_perm_sql(h, a, b)} % {m_bits} AS BIGINT)"
            )
            for a, b in minhash_params(k, seed)
        ]
    )
    per_file = (
        scan.select(F.col("path"), F.explode(arms).alias("bit"))
        # collect_set IS the per-(file, bit) dedup — and its partial
        # (map-side) aggregation dedups before the one shuffle, where an
        # explicit .distinct() first paid a second full exchange of the
        # exploded rows for nothing (guide §2.3/§2.4)
        .groupBy("path")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
    )
    return paths_df.join(per_file, "path", "left").select(
        "path",
        F.coalesce(F.col("bits"), F.array().cast("array<bigint>")).alias(
            "bits"
        ),
    )


def build_bloom_index(
    table: DeltaTable,
    column: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = 42,
) -> dict:
    """Build (or rebuild) the Bloom index for ``column`` over the current
    snapshot and register it in table configuration — one distributed scan,
    one dataset write, one metadata commit.

    Returns {"column", "files", "dataset", "version"}."""
    state = table.state()
    meta = state.metadata
    if column not in meta.schema.names:
        raise ValueError(f"build_bloom_index: unknown column {column!r}")
    if column in meta.partition_columns:
        raise ValueError(
            f"build_bloom_index: {column!r} is a partition column — "
            "partition pruning already serves it exactly"
        )
    if not isinstance(meta.schema[column].dataType, _INDEXABLE):
        raise ValueError(
            "build_bloom_index: only string/integer columns are indexable "
            f"(got {meta.schema[column].dataType.simpleString()} — float and "
            "date string forms are ambiguous across engines)"
        )
    adds = state.adds

    dataset_rel = f"_bloom_index/{column}/{_uuid.uuid4().hex}"
    if adds:
        full = _index_rows(table, adds, column, meta, m_bits, k, seed)
        _write_index(table, full, dataset_rel, len(adds))
    spec = {
        "path": dataset_rel,
        "m": m_bits,
        "k": k,
        "seed": seed,
        "version": state.version,
    }
    old = bloom_specs(table, meta).get(column)
    version = table.set_table_properties(
        {BLOOM_PROP_PREFIX + column: json.dumps(spec)},
        operation="CREATE BLOOM INDEX",
    )
    if adds:
        _unmark_building(table, dataset_rel)  # registered: spec protects it
    if old and old.get("path") != dataset_rel:
        # the replaced dataset is now unregistered; vacuum collects it
        pass
    return {
        "column": column,
        "files": len(adds),
        "dataset": dataset_rel,
        "version": version,
    }


def _write_index(table, df, dataset_rel: str, n_files: int) -> None:
    """Write the index dataset range-partitioned and sorted by path with a
    BOUNDED part count (~8k file rows per part, not one part per shuffle
    partition): the Spark-free probe opens every part per micro-batch, so
    part count — not row count — is its remote-GET bill, and the path
    ordering lets parquet row-group stats skip candidates-free parts."""
    nparts = max(1, -(-n_files // 8192))
    _mark_building(table, dataset_rel)  # vacuum-protect until registered
    # materialize the (file-count-sized) index rows BEFORE the range
    # exchange: repartitionByRange's range-sampling pass executes its child
    # once and the shuffle re-executes it, so an un-checkpointed layout ran
    # the whole build scan TWICE (guide §1.2 — one pass is the ideal)
    df = df.localCheckpoint(eager=True)
    table.write_parquet_dataset(
        df.repartitionByRange(nparts, "path").sortWithinPartitions("path"),
        dataset_rel,
    )


def refresh_bloom_index(table: DeltaTable, column: str) -> dict:
    """Catch ``column``'s index up with the current snapshot after appends
    or rewrites, scanning ONLY the files the index has never seen.

    Existing rows are carried forward for still-live files, the new files
    (appends, compaction outputs) are indexed, and rows for removed files
    are dropped — then the fresh dataset is registered atomically with the
    spec's original m/k/seed, so carried and new rows stay bit-compatible
    (the replaced dataset becomes vacuum-able, exactly like a rebuild).
    Data scanned is O(new files); the index dataset itself is
    file-count-sized (~m bits per file, <0.01% of the data it indexes), so
    rewriting it costs nothing next to any data scan.  A no-change
    snapshot short-circuits without a commit.

    Returns {"column", "files", "new_files", "dropped_files", "dataset",
    "version"}."""
    spec = bloom_specs(table).get(column)
    if spec is None:
        raise KeyError(
            f"no bloom index on column {column!r} — build_bloom_index first"
        )
    state = table.state()
    meta = state.metadata
    adds = state.adds
    m_bits, k, seed = int(spec["m"]), int(spec["k"]), int(spec["seed"])
    spark = table.spark

    try:
        old = table.read_parquet_dataset(
            spec["path"], ["path", "bits"], "path string, bits array<bigint>"
        )
        # O(files) driver-side path list — the same size class as every
        # planner collect in this engine, never data-scale
        indexed = {r["path"] for r in old.select("path").collect()}
    except Exception:
        # a spec whose dataset was never written (index built on an empty
        # snapshot) or was vacuumed: treat as nothing-indexed — the refresh
        # becomes a full rebuild of coverage instead of a crash
        old = None
        indexed = set()
    live = {a.path for a in adds}
    new_adds = [a for a in adds if a.path not in indexed]
    dropped = indexed - live
    if not new_adds and not dropped:
        return {
            "column": column,
            "files": len(adds),
            "new_files": 0,
            "dropped_files": 0,
            "dataset": spec["path"],
            "version": state.version,
        }

    dataset_rel = f"_bloom_index/{column}/{_uuid.uuid4().hex}"
    keep = sorted(live & indexed)
    parts = []
    if keep and old is not None:
        keep_df = local_df(spark, [(p,) for p in keep], "path string")
        parts.append(old.join(keep_df, "path"))
    if new_adds:
        parts.append(
            _index_rows(table, new_adds, column, meta, m_bits, k, seed)
        )
    wrote = bool(parts)
    if parts:
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        _write_index(table, full, dataset_rel, len(adds))
    new_spec = dict(spec, path=dataset_rel, version=state.version)
    version = table.set_table_properties(
        {BLOOM_PROP_PREFIX + column: json.dumps(new_spec)},
        operation="REFRESH BLOOM INDEX",
    )
    if wrote:
        _unmark_building(table, dataset_rel)  # registered: spec protects it
    return {
        "column": column,
        "files": len(adds),
        "new_files": len(new_adds),
        "dropped_files": len(dropped),
        "dataset": dataset_rel,
        "version": version,
    }


def drop_bloom_index(table: DeltaTable, column: str) -> int:
    """Unregister ``column``'s index (the dataset becomes vacuum-able)."""
    if column not in bloom_specs(table):
        raise KeyError(f"no bloom index on column {column!r}")
    return table.set_table_properties(
        {BLOOM_PROP_PREFIX + column: None}, operation="DROP BLOOM INDEX"
    )


def _conjunctive_value_sets(ast) -> list[tuple[str, list]]:
    """(column, candidate-values) constraints that must ALL hold for a row
    to match: top-level conjuncts of the form ``col = lit`` / ``col IN
    (...)``.  OR/NOT branches contribute nothing (sound: we only shrink the
    file set when a constraint is mandatory)."""
    if ast[0] == "and":
        return _conjunctive_value_sets(ast[1]) + _conjunctive_value_sets(ast[2])
    if ast[0] == "cmp" and ast[1] == "=" and ast[3] is not None:
        return [(ast[2], [ast[3]])]
    if ast[0] == "in" and not ast[3]:
        vals = [v for v in ast[2] if v is not None]
        if vals:
            return [(ast[1], vals)]
    return []


def _bloom_canonical(lit, dtype) -> str | None:
    """The canonical string Spark's ``CAST(col AS STRING)`` produces for a
    column value equal to ``lit``, or None when no such proof exists.

    The index hashes the CAST form ("5", not "5.0"), so the probe must hash
    the same string or it would prove absence of values that ARE present
    (``c = 5.0`` matches ``c = 5`` in Spark, but str(5.0) probes the wrong
    bits).  Integer columns therefore accept only ints and integral floats
    (normalized via int()); bools are rejected — TRUE would stringify as
    'True', never the stored '1'.  Anything un-normalizable returns None:
    the probe proves nothing and prunes nothing."""
    if isinstance(dtype, T.StringType):
        return lit if isinstance(lit, str) else None
    # integer dtypes (the only other _INDEXABLE members)
    if isinstance(lit, bool):
        return None
    if isinstance(lit, int):
        return str(lit)
    if isinstance(lit, float) and lit.is_integer():
        return str(int(lit))
    return None


def _coerced_constraints(predicate: str, meta, specs: dict) -> list:
    """(spec, canonical-values) for each indexed, fully-normalizable
    mandatory equality constraint in the predicate; [] when nothing applies
    (the probe then proves nothing and prunes nothing)."""
    from delta_sorter_spark.functions.skipping import (
        SkippingUnsupported,
        parse_predicate,
    )

    try:
        constraints = _conjunctive_value_sets(parse_predicate(predicate))
    except SkippingUnsupported:
        return []
    out = []
    for col, values in constraints:
        spec = specs.get(col)
        if spec is None or col not in meta.schema.names:
            continue
        dtype = meta.schema[col].dataType
        coerced = []
        for v in values:
            cv = _bloom_canonical(v, dtype)
            if cv is None:
                coerced = None  # un-normalizable literal: probe proves nothing
                break
            coerced.append(cv)
        if coerced:
            out.append((spec, coerced))
    return out


def bloom_prune_adds(
    table: DeltaTable,
    adds: Sequence[AddAction],
    predicate: str | None,
    meta=None,
) -> list[AddAction]:
    """Drop files whose Bloom filters prove the predicate's mandatory
    equality values are absent.  No false negatives: a file is dropped only
    when an index row exists for it AND every candidate value misses.
    Files missing from the index (appended after the build) always stay.
    Cost: one file-count-sized Spark job per indexed, constrained column;
    zero jobs when no index applies."""
    adds = list(adds)
    if predicate is None or not adds:
        return adds
    meta = meta if meta is not None else table.metadata
    specs = bloom_specs(table, meta)
    if not specs:
        return adds
    spark = table.spark
    for spec, coerced in _coerced_constraints(predicate, meta, specs):
        try:
            index = table.read_parquet_dataset(
                spec["path"], ["path", "bits"],
                "path string, bits array<bigint>",
            )
            cand = local_df(spark, 
                [(a.path,) for a in adds], "path string"
            )
            hit = F.lit(False)
            for v in coerced:
                pos = value_positions(v, spec["m"], spec["k"], spec["seed"])
                all_set = F.lit(True)
                for p in pos:
                    all_set = all_set & F.array_contains(
                        F.col("bits"), F.lit(int(p))
                    )
                hit = hit | all_set
            # collect the PROVEN-absent paths: indexed AND no value hits
            dropped = {
                r["path"]
                for r in index.join(F.broadcast(cand), "path")
                .where(~hit)
                .select("path")
                .collect()
            }
        except Exception:
            # a time-traveled spec whose replaced dataset was vacuumed, or
            # a half-written rebuild: staleness fails SAFE — keep the files
            continue
        if dropped:
            adds = [a for a in adds if a.path not in dropped]
        if not adds:
            break
    return adds


_LOCAL_PROBE_BATCH_ROWS = 64  # bits arrays can reach ~m_bits longs per file


def _probe_dropped_local(
    table_path: str, dataset_rel: str, candidate_paths, val_pos: list[list[int]]
) -> set[str]:
    """Candidate paths PROVEN absent by their index rows, via pyarrow — no
    Spark.  STREAMED: the probe never materializes more than one small
    record batch of ``(path, bits)`` rows (a file's bits array can be
    ~m_bits longs, so loading every candidate's row at once — the naive
    read_table — is O(candidates x m) driver memory; at 10^6 files that is
    the probe's own bottleneck, not the scan it prunes).  Row groups whose
    path range (the dataset is written path-sorted) contains no candidate
    are skipped entirely via footer stats; within surviving batches, bits
    arrays are decoded only for candidate rows and membership is a bisect
    over the sorted array — no per-row set build."""
    import bisect

    import pyarrow.parquet as pq

    from delta_sorter_spark.sources.fs import pyarrow_open_input, resolve

    fsobj, base = resolve(table_path)
    dataset_uri = fsobj.join(base, dataset_rel)
    names = [n for n in fsobj.list_dir(dataset_uri) if n.endswith(".parquet")]
    cand_sorted = sorted(candidate_paths)
    cand = set(candidate_paths)
    dropped: set[str] = set()

    def _bits_hit(bits) -> bool:
        for pos in val_pos:
            ok = True
            for p in pos:
                i = bisect.bisect_left(bits, p)
                if i >= len(bits) or bits[i] != p:
                    ok = False
                    break
            if ok:
                return True
        return False

    for name in names:
        pf = pq.ParquetFile(pyarrow_open_input(f"{dataset_uri}/{name}"))
        schema_names = pf.schema_arrow.names
        path_idx = schema_names.index("path")
        groups = []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(path_idx).statistics
            if st is not None and st.has_min_max:
                lo, hi = st.min, st.max
                j = bisect.bisect_left(cand_sorted, lo)
                if j >= len(cand_sorted) or cand_sorted[j] > hi:
                    continue  # no candidate in this group's path range
            groups.append(rg)
        if not groups:
            continue
        for batch in pf.iter_batches(
            batch_size=_LOCAL_PROBE_BATCH_ROWS,
            row_groups=groups,
            columns=["path", "bits"],
        ):
            paths = batch.column("path").to_pylist()
            bits_col = batch.column("bits")
            for i, p in enumerate(paths):
                if p not in cand:
                    continue
                bits = bits_col[i].as_py() or []
                if not _bits_hit(bits):
                    dropped.add(p)
    return dropped


def bloom_prune_adds_local(
    table_path: str,
    adds: Sequence[AddAction],
    predicate: str | None,
    meta,
) -> list[AddAction]:
    """Spark-free twin of ``bloom_prune_adds`` for planning contexts that
    have no session — the streaming source selects each micro-batch's
    files in a plain Python process.  The probe STREAMS the index via
    pyarrow (``_probe_dropped_local``): row groups outside the candidates'
    path range are skipped via footer stats, surviving rows are decoded
    one small batch at a time, and only the dropped-path set — never the
    bits arrays — accumulates, so memory stays O(batch) even when the
    candidate set is the whole table's file list (the 10^6-file posture:
    the probe must not itself become a driver-memory bottleneck).
    Identical no-false-negative semantics and fail-safety: unindexed files
    always stay, and any index-read error (rebuilt/vacuumed dataset
    mid-stream) keeps every candidate."""
    adds = list(adds)
    if predicate is None or not adds:
        return adds
    specs = bloom_specs(None, meta)
    if not specs:
        return adds
    for spec, coerced in _coerced_constraints(predicate, meta, specs):
        try:
            val_pos = [
                sorted(value_positions(v, spec["m"], spec["k"], spec["seed"]))
                for v in coerced
            ]
            dropped = _probe_dropped_local(
                table_path, spec["path"], {a.path for a in adds}, val_pos
            )
        except Exception:
            continue  # staleness fails SAFE — keep the files
        if dropped:
            adds = [a for a in adds if a.path not in dropped]
        if not adds:
            break
    return adds
