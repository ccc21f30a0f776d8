"""Incremental clustered-table OPTIMIZE (Delta clustered tables, a.k.a.
liquid clustering) — the modern successor of the engine's sorted compaction
(SURVEY §2.8 E6 layout family).

The reference maintains ONE lexicographic order per table and re-sorts whole
partitions when the order decays (lib.rs:166-248).  Clustered tables
generalize both halves of that idea:

- the layout key is a SPACE-FILLING CURVE over the clustering columns
  (Hilbert for two, Morton for three+, plain range-sort for one), so
  file-level min/max stats prune on EVERY clustering column, not just the
  leading sort key;
- maintenance is INCREMENTAL: appends land unclustered (ingest pays
  nothing), and OPTIMIZE rewrites only the unclustered files plus
  still-small "partial" ZCubes, leaving stable well-sized clustered files
  alone.  The unit of work is a ZCube — one OPTIMIZE rewrite batch, tagged
  on its Add actions — exactly Delta's OPTIMIZE bin-packing unit, so
  repeated OPTIMIZE converges (second run with no new data is a no-op)
  instead of rewriting 100 TB every time.

At 100 TB the properties that matter:

- OPTIMIZE reads only candidate files (O(new data), not O(table));
- the rewrite is one ``repartitionByRange(curve)`` shuffle + per-range
  sort — the same sampled range-partitioning shape as the strict sort, so
  no single reducer sees more than one range;
- everything is integer column arithmetic inside whole-stage codegen (the
  curve exprs come from operators/zorder.py); no Python in the hot path;
- commits are Remove+Add with ``dataChange=false`` so streams/CDC see no
  new data, and the ZCube/provider attestation rides protocol fields
  (``clusteringProvider``, ``tags``) a stock reader ignores safely.

Protocol surface: writer features ``clusteredTable`` + ``domainMetadata``;
``delta.clustering`` domain holds the physical clustering columns
(DeltaTable.set_clustering_columns); clustered Adds carry
``clusteringProvider`` and a ``deltaSorter.zcubeId`` tag.
"""

from __future__ import annotations

import dataclasses
import time
import uuid

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from delta_sorter_spark.sources.delta_table import DeltaTable

# A ZCube whose total bytes are below this is "partial": the next OPTIMIZE
# is allowed to fold it together with new data into a bigger cube.  At or
# above it the cube is stable and never rewritten again (rewrite amplification
# is bounded: a row is rewritten at most log(stable/first-batch) times).
DEFAULT_MIN_ZCUBE_BYTES = 100 * 1024 * 1024

COLS_TAG = "deltaSorter.clusteringColumns"


def _stats_bounds(candidates, cols: list[str], meta) -> list[tuple[int, int]] | None:
    """Curve-bucketization bounds [(lo, hi), ...] from the candidates' OWN
    log stats — the zone maps every write attests — so the rewrite never
    pays a second scan of 100 TB just to size its grid.  None when any
    file lacks a stat (caller falls back to one agg job).  DV-hidden rows
    may widen the range; bounds only bucketize, wider is harmless."""
    from delta_sorter_spark.sources.delta_table import parse_stat

    schema = meta.schema
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if not all(isinstance(schema[c].dataType, int_types) for c in cols):
        return None  # curve paths need integers; range-sort ignores bounds
    out = []
    for c in cols:
        pc = meta.physical_of(c)
        lo = hi = None
        for a in candidates:
            stats = a.stats or {}
            raw_lo = (stats.get("minValues") or {}).get(pc)
            raw_hi = (stats.get("maxValues") or {}).get(pc)
            if raw_lo is None or raw_hi is None:
                return None
            flo = parse_stat(raw_lo, schema[c].dataType)
            fhi = parse_stat(raw_hi, schema[c].dataType)
            if flo is None or fhi is None:
                return None
            lo = flo if lo is None else min(lo, flo)
            hi = fhi if hi is None else max(hi, fhi)
        out.append((int(lo), int(hi)))
    return out


def _curve_layout(
    df: DataFrame,
    cols: list[str],
    bits: int,
    num_partitions: int | None,
    bounds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Cluster ``df`` for the given columns: Hilbert curve for 2 integer
    columns (tightest 2-D locality), Morton for 3+, multi-column range sort
    otherwise (1 column, or any non-integer type — lexicographic order is
    the best stats-tightener available without bucketizing strings)."""
    from delta_sorter_spark.operators.zorder import hilbert_layout, zorder_layout

    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    all_int = all(isinstance(df.schema[c].dataType, int_types) for c in cols)
    if all_int and len(cols) == 2:
        return hilbert_layout(
            df, cols, bounds=bounds, bits=bits, num_partitions=num_partitions
        )
    if all_int and len(cols) > 2:
        return zorder_layout(
            df, cols, bounds=bounds, bits=bits, num_partitions=num_partitions
        )
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return df.repartitionByRange(n, *[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )


def cluster_status(table: DeltaTable) -> dict:
    """Snapshot of the table's clustering state: registered columns, how
    many files are clustered under the CURRENT columns, ZCube count, and
    the bytes a next OPTIMIZE would touch."""
    state = table.state()
    cols = table.clustering_columns(state)
    attest = ",".join(state.metadata.physical_names(cols)) if cols else ""
    clustered = [
        a
        for a in state.adds
        if a.clustering_provider == DeltaTable.CLUSTERING_PROVIDER
        and (a.tags or {}).get(COLS_TAG) == attest
    ]
    cubes: dict[str, int] = {}
    clustered_paths = set()
    for a in clustered:
        clustered_paths.add(a.path)
        zid = (a.tags or {}).get(DeltaTable.ZCUBE_TAG, "")
        cubes[zid] = cubes.get(zid, 0) + a.size
    unclustered = [a for a in state.adds if a.path not in clustered_paths]
    return {
        "clustering_columns": cols,
        "files": len(state.adds),
        "clustered_files": len(clustered),
        "unclustered_files": len(unclustered),
        "unclustered_bytes": sum(a.size for a in unclustered),
        "zcubes": len(cubes),
        "zcube_bytes": cubes,
    }


def optimize_clustered(
    table: DeltaTable,
    target_file_size_bytes: int | None = None,
    min_zcube_bytes: int = DEFAULT_MIN_ZCUBE_BYTES,
    bits: int = 8,
    num_partitions: int | None = None,
    dry_run: bool = False,
) -> dict:
    """Incremental OPTIMIZE of a clustered table: rewrite unclustered files
    and partial ZCubes into one new curve-ordered ZCube; leave stable cubes
    alone.  No-op (returns ``noop=True``, no commit) when there is nothing
    to improve: zero unclustered files and at most one partial cube.

    The commit is ``dataChange=false`` Remove+Add via ``commit_rewrite``,
    so a concurrent writer appending during the rewrite wins cleanly
    (ConcurrentRewriteError -> caller retries; its new files are simply the
    next OPTIMIZE's candidates).  Row-tracking ids ride the rewrite through
    ``read_for_rewrite``'s materialized columns like every other rewrite in
    this engine."""
    started = time.monotonic()
    state = table.state()
    cols = table.clustering_columns(state)
    if not cols:
        raise ValueError(
            "table has no clustering columns; call set_clustering_columns first"
        )
    attest = ",".join(state.metadata.physical_names(cols))

    cubes: dict[str, list] = {}
    unclustered = []
    for a in state.adds:
        if (
            a.clustering_provider == DeltaTable.CLUSTERING_PROVIDER
            and (a.tags or {}).get(COLS_TAG) == attest
        ):
            zid = (a.tags or {}).get(DeltaTable.ZCUBE_TAG, "")
            cubes.setdefault(zid, []).append(a)
        else:
            unclustered.append(a)  # includes cubes clustered on OLD columns
    partial = {
        zid: files
        for zid, files in cubes.items()
        if sum(f.size for f in files) < min_zcube_bytes
    }
    candidates = unclustered + [f for files in partial.values() for f in files]

    metrics = {
        "clustering_columns": cols,
        "unclustered_files": len(unclustered),
        "partial_zcubes": len(partial),
        "stable_zcubes": len(cubes) - len(partial),
        "candidate_files": len(candidates),
        "bytes_in": sum(a.size for a in candidates),
        "files_out": 0,
        "bytes_out": 0,
        "zcube_id": None,
        "noop": True,
        "dry_run": dry_run,
        "version": None,
    }
    # Nothing to improve: no new data, and no pair of partial cubes to merge.
    if not unclustered and len(partial) <= 1:
        metrics["duration_ms"] = int((time.monotonic() - started) * 1000)
        return metrics
    if dry_run:
        metrics["noop"] = False
        metrics["duration_ms"] = int((time.monotonic() - started) * 1000)
        return metrics

    df = table.read_for_rewrite(candidates, state.metadata)
    bounds = _stats_bounds(candidates, cols, state.metadata)
    clustered_df = _curve_layout(df, cols, bits, num_partitions, bounds=bounds)
    zcube_id = uuid.uuid4().hex
    adds_out = [
        dataclasses.replace(
            a,
            clustering_provider=DeltaTable.CLUSTERING_PROVIDER,
            tags={**(a.tags or {}), DeltaTable.ZCUBE_TAG: zcube_id, COLS_TAG: attest},
        )
        for a in table.stage_write(
            clustered_df,
            stat_columns=cols,
            target_file_size_bytes=target_file_size_bytes,
            data_change=False,
            schema=table.rewrite_schema(state.metadata),
        )
    ]
    version = table.commit_rewrite(
        adds_out,
        [a.remove_action() for a in candidates],
        operation="OPTIMIZE",
    )
    metrics.update(
        files_out=len(adds_out),
        bytes_out=sum(a.size for a in adds_out),
        zcube_id=zcube_id,
        noop=False,
        version=version,
        duration_ms=int((time.monotonic() - started) * 1000),
    )
    return metrics
