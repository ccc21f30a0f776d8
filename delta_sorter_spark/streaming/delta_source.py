"""Delta table as a Structured Streaming SOURCE via the PySpark 4 Python
Data Source API (`pyspark.sql.datasource`) — the `readStream` half of the
engine's Delta integration (the sink half is
``streaming/events.delta_append_sink``).

    spark.dataSource.register(DeltaStreamDataSource)
    df = (spark.readStream.format("delta_sorter")
            .option("path", table_path).load())

Semantics follow Delta's streaming source (public protocol):

- **Initial snapshot**: the first micro-batch covers the table's active
  files at stream start (log replay — removes and deletion vectors
  honored), then the stream tails the log version by version.
- **Append-only tail**: a later commit containing a ``remove`` with
  ``dataChange=true`` (DML, not compaction) fails the stream, unless
  ``skipChangeCommits=true`` skips that whole commit — the same knob
  Delta exposes.  Compaction commits (``dataChange=false`` adds) are
  always skipped: rewrites are not new data.  A tailed commit streams its
  OWN add files (still on disk until vacuum) — a later compaction inside
  the same range cannot drop its rows.
- **Change feed** (``.option("readChangeFeed", "true")``): micro-batches
  carry the CHANGES instead — rows tagged ``_change_type``
  ('insert' | 'delete') and ``_commit_version``, with
  ``operators/dml.table_changes``'s file-level, multiset-equivalent
  semantics (DML removes feed as deletes through their prior deletion
  vector; merge-on-read commits feed only the newly-DV-deleted rows;
  compaction feeds nothing; the initial snapshot feeds as inserts).
  Downstream incremental consumers (operators/rollup.py's signed
  aggregates) apply each batch as old - deletes + inserts.
- **Exactly-once**: offsets are log versions; Spark's checkpoint replays
  ranges deterministically (the file list per version range is a pure
  function of the log).
- The source schema is pinned at stream start (Spark contract); files
  written before a schema evolution read as NULL for newer columns, and
  column mapping (physical names) matches the batch reader
  ``DeltaTable.to_df``.

One InputPartition per data file: parallelism = files per batch, each task
reads one parquet file through pyarrow and emits Arrow RecordBatches (the
vectorized path of the Python source API — rows never materialize as
Python objects).  100 TB posture: this path serves *streaming tail*
volumes (a trigger's worth of fresh files); bulk backfill belongs to the
JVM batch reader (``to_df``).  Reference parity: the reference has no
streaming at all (SURVEY §2.9) — this is north-star E6 surface.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

from delta_sorter_spark.sources.delta_log import AddAction, DeltaLog, physical_name

# appended to the schema when .option("withFilePath", "true") is set: the
# table-relative path of the file each row came from.  The jar-free stand-in
# for F.input_file_name(), which is empty under Python Data Sources — remote
# DML's file-hit detection reads this column instead.
FILE_COL = "__delta_file__"
# appended (with FILE_COL) by .option("withPositions", "true"): the physical
# row index inside the source file, DVs NOT applied — the jar-free stand-in
# for parquet ``_metadata.row_index`` that remote DV deletes address rows by.
POS_COL = "__pos__"
# appended by .option("readChangeFeed", "true"): the Delta CDF columns —
# each micro-batch then carries the CHANGES of its version range
# ('insert' | 'delete' rows, operators/dml.table_changes semantics) instead
# of refusing data-changing commits.
CDF_TYPE_COL = "_change_type"
CDF_VERSION_COL = "_commit_version"


@dataclass
class DeltaFilePartition(InputPartition):
    """One parquet data file of one commit (pickled to the worker)."""

    file_path: str  # absolute
    partition_values: dict = field(default_factory=dict)
    deleted_positions: tuple = ()  # DV row indices, resolved driver-side
    schema_json: str = ""  # logical schema (StructType JSON)
    partition_columns: tuple = ()
    # driver-captured AWS env for remote reads (workers never see driver
    # env changes made after SparkSession creation)
    aws_env: dict = field(default_factory=dict)
    rel_path: str = ""  # table-relative path (FILE_COL payload)
    # explicit flags, NOT inferred from schema field names: a user table
    # may legitimately contain columns named __delta_file__ / __pos__, and
    # name sniffing would silently flip reads into raw positional mode
    # (DVs unapplied) or overwrite the user's values
    emit_file_col: bool = False
    emit_pos_col: bool = False
    # change-feed partitions: emit rows tagged (cdf_type, cdf_version);
    # keep_positions, when set, restricts the read to EXACTLY those row
    # indices (the newly-DV-deleted rows of a merge-on-read commit) —
    # mutually exclusive with deleted_positions-based dropping
    cdf_type: str = ""
    cdf_version: int = -1
    keep_positions: tuple | None = None
    # row-level CDC partition (a protocol cdc file under _change_data/):
    # _change_type comes from the FILE's own column, not a constant
    cdf_from_file: bool = False


def _arrow_type(dtype: T.DataType):
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(dtype)


def _read_file(part: DeltaFilePartition):
    """Worker-side: one file -> Arrow batches in logical-schema order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_sorter_spark.sources.fs import apply_aws_env, pyarrow_open_input

    apply_aws_env(part.aws_env)
    schema = T.StructType.fromJson(json.loads(part.schema_json))
    # local paths pass through; s3:// opens via pyarrow's native S3
    # filesystem on the worker — remote Delta tables stream without any
    # Spark filesystem connector jars
    tbl = pq.read_table(pyarrow_open_input(part.file_path))
    if part.keep_positions is not None:
        # change-feed DV-delta partition: exactly the newly deleted rows
        # (small by construction: one commit's new deletions)
        tbl = tbl.take([i for i in part.keep_positions if i < tbl.num_rows])
    elif part.deleted_positions and not part.emit_pos_col:
        # a positional scan is RAW by contract (existing DVs not applied);
        # plain reads drop the deleted rows here.  Vectorized mask filter:
        # the previous per-row `i not in dead` comprehension was O(rows)
        # interpreted Python per file — on a DV-heavy 100 TB stream that is
        # the read path's per-task hot loop (guide §4.2: hand whole batches
        # to vectorized native code).  filter() keeps row order.
        import numpy as np

        mask = np.ones(tbl.num_rows, dtype=bool)
        dead_idx = [i for i in part.deleted_positions if i < tbl.num_rows]
        if dead_idx:
            mask[dead_idx] = False
        tbl = tbl.filter(pa.array(mask))
    n = tbl.num_rows
    cols, names = [], []
    for f in schema.fields:
        at = _arrow_type(f.dataType)
        if f.name == FILE_COL and part.emit_file_col:
            cols.append(pa.array([part.rel_path] * n, type=pa.string()))
            names.append(f.name)
            continue
        if f.name == POS_COL and part.emit_pos_col:
            # positional scans are raw (no rows dropped above), so the
            # position column is always 0..n-1 — emitted directly instead
            # of slicing a pre-built full-length Python list
            cols.append(pa.array(range(n), type=pa.int64()))
            names.append(f.name)
            continue
        if f.name == CDF_TYPE_COL and part.cdf_from_file:
            cols.append(
                tbl[CDF_TYPE_COL].combine_chunks().cast(pa.string())
            )
            names.append(f.name)
            continue
        if f.name == CDF_TYPE_COL and part.cdf_type:
            cols.append(pa.array([part.cdf_type] * n, type=pa.string()))
            names.append(f.name)
            continue
        if f.name == CDF_VERSION_COL and (part.cdf_type or part.cdf_from_file):
            cols.append(pa.array([part.cdf_version] * n, type=pa.int64()))
            names.append(f.name)
            continue
        if f.name in part.partition_columns:
            raw = part.partition_values.get(f.name)
            arr = (
                pa.nulls(n, at)
                if raw is None
                else pa.array([raw] * n, type=pa.string()).cast(at)
            )
        else:
            phys = physical_name(f)
            if phys in tbl.column_names:
                arr = tbl[phys].combine_chunks().cast(at)
            else:  # written before a schema evolution
                arr = pa.nulls(n, at)
        cols.append(arr)
        names.append(f.name)
    out = pa.table(dict(zip(names, cols)))
    yield from out.to_batches(max_chunksize=1 << 16)


def _dv_positions(table_path: str, add: AddAction) -> tuple:
    """Resolve a file's deletion-vector positions (parquet or legacy JSON
    sidecar; shared reader in sources/delta_table.py)."""
    from delta_sorter_spark.sources.delta_table import dv_sidecar_positions

    return tuple(sorted(dv_sidecar_positions(table_path, add)))


def _apply_env_option(options) -> None:
    """Install the driver-captured AWS env shipped via .option("awsEnv",
    json) — the Python Data Source's planner and schema() calls run in
    python workers that never see driver env changes made after the
    SparkSession started."""
    from delta_sorter_spark.sources.fs import apply_aws_env

    raw = options.get("awsEnv") or options.get("awsenv")
    if raw:
        apply_aws_env(json.loads(raw))


def _parse_extra_columns(options, schema: T.StructType) -> list[T.StructField]:
    """``extraColumns`` option: a StructType JSON of PHYSICAL passthrough
    columns appended to the read schema — columns that live in (some of)
    the data files but not in the table's logical schema, e.g. the
    materialized row-tracking columns a row-id-preserving rewrite wrote
    (sources/delta_table.py ``_read_with_row_ids``).  Files lacking the
    column yield NULLs (the same written-before-schema-evolution rule as
    ordinary columns).  Clashes with logical columns are refused: the
    option is for out-of-schema physical columns only."""
    raw = options.get("extraColumns") or options.get("extracolumns")
    if not raw:
        return []
    fields = list(T.StructType.fromJson(json.loads(raw)).fields)
    clashes = [f.name for f in fields if f.name in schema.names]
    if clashes:
        raise ValueError(
            f"delta_sorter source: extraColumns {clashes} already in the "
            "table schema — the option is for out-of-schema physical "
            "columns only"
        )
    return fields


def _check_reserved_columns(schema: T.StructType, with_file: bool, with_pos: bool):
    """withFilePath/withPositions append synthetic columns; if the table
    already owns a column by those names the read would silently clobber
    it — refuse loudly instead.  Tables that merely CONTAIN such columns
    read fine as long as the options are off (the columns pass through as
    ordinary data)."""
    clashes = [
        c
        for c, wanted in ((FILE_COL, with_file or with_pos), (POS_COL, with_pos))
        if wanted and c in schema.names
    ]
    if clashes:
        raise ValueError(
            f"delta_sorter source: table already has column(s) {clashes}; "
            "withFilePath/withPositions cannot synthesize over user data"
        )


class _DeltaSourceCore:
    """Shared between the batch and stream readers."""

    def __init__(self, options, schema: T.StructType | None = None, at_version=None):
        _apply_env_option(options)
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("delta_sorter source requires .option('path', ...)")
        self.log = DeltaLog(self.table_path)
        self.skip_change_commits = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.with_file = (
            str(options.get("withFilePath", "false")).lower() == "true"
        )
        self.with_pos = str(options.get("withPositions", "false")).lower() == "true"
        self.read_change_feed = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        if self.read_change_feed and (
            self.with_file or self.with_pos or self.skip_change_commits
        ):
            raise ValueError(
                "delta_sorter source: readChangeFeed cannot combine with "
                "withFilePath/withPositions/skipChangeCommits"
            )
        if self.read_change_feed and options.get("where"):
            # pruning either side of the feed breaks old-delete+new-insert
            # pairing for incremental consumers — refuse, never silently
            raise ValueError(
                "delta_sorter source: readChangeFeed cannot combine with "
                "the 'where' file-pruning option"
            )
        meta = self.log.read_state(at_version=at_version).metadata
        from delta_sorter_spark.sources.delta_log import schema_contains_variant

        if schema_contains_variant(meta.schema):
            raise NotImplementedError(
                "delta_sorter source: VARIANT columns need a pyarrow build "
                "that understands the parquet VARIANT logical type (this "
                "source reads file bytes via pyarrow); read the table with "
                "DeltaTable.to_df on the local plane instead"
            )
        _check_reserved_columns(meta.schema, self.with_file, self.with_pos)
        if self.read_change_feed:
            clashes = [
                c for c in (CDF_TYPE_COL, CDF_VERSION_COL) if c in meta.schema.names
            ]
            if clashes:
                raise ValueError(
                    f"delta_sorter source: table already has column(s) "
                    f"{clashes}; readChangeFeed cannot synthesize over user data"
                )
        # .option("where", ...) = zone-map FILE pruning at plan time
        # (functions/skipping.py): a file whose stats exclude the predicate
        # gets no partition.  Rows are NOT filtered here — callers wanting
        # exact row semantics re-apply the predicate on the DataFrame
        # (DeltaTable.stream_df does both).  Unparseable predicates prune
        # nothing, matching to_df(where=...).
        self.where = options.get("where")
        self._where_ast = None
        self._meta = meta  # pinned at stream start (for Bloom-index specs)
        self._meta_schema = meta.schema
        if self.where:
            from delta_sorter_spark.functions.skipping import (
                SkippingUnsupported,
                parse_predicate,
            )

            try:
                self._where_ast = parse_predicate(self.where)
            except SkippingUnsupported:
                self._where_ast = None
        # pin schema at construction (stream start); partition layout is
        # immutable in Delta so the column list never changes
        pinned = schema or meta.schema
        extra = [
            f
            for f in _parse_extra_columns(options, meta.schema)
            if f.name not in pinned.names
        ]
        if (self.with_file or self.with_pos) and FILE_COL not in pinned.names:
            extra.append(T.StructField(FILE_COL, T.StringType()))
        if self.with_pos and POS_COL not in pinned.names:
            extra.append(T.StructField(POS_COL, T.LongType()))
        if self.read_change_feed and CDF_TYPE_COL not in pinned.names:
            extra.append(T.StructField(CDF_TYPE_COL, T.StringType()))
            extra.append(T.StructField(CDF_VERSION_COL, T.LongType()))
        if extra:
            pinned = T.StructType(list(pinned.fields) + extra)
        self.schema_json = json.dumps(pinned.jsonValue())
        self.partition_columns = tuple(meta.partition_columns)

    def _part_for(
        self,
        path,
        partition_values,
        deleted_positions,
        cdf_type: str = "",
        cdf_version: int = -1,
        keep_positions=None,
        cdf_from_file: bool = False,
    ):
        from delta_sorter_spark.sources.fs import capture_aws_env, is_remote_uri

        return DeltaFilePartition(
            file_path=os.path.join(self.table_path, path),
            partition_values=dict(partition_values),
            deleted_positions=tuple(deleted_positions),
            schema_json=self.schema_json,
            partition_columns=self.partition_columns,
            aws_env=capture_aws_env() if is_remote_uri(self.table_path) else {},
            rel_path=path,
            # a positional scan carries the file path too (rows are
            # addressed as (path, pos) pairs)
            emit_file_col=self.with_file or self.with_pos,
            emit_pos_col=self.with_pos,
            cdf_type=cdf_type,
            cdf_version=cdf_version,
            keep_positions=(
                tuple(keep_positions) if keep_positions is not None else None
            ),
            cdf_from_file=cdf_from_file,
        )

    def cdf_partitions_for_version(
        self, v: int, prev: dict | None = None
    ) -> list[DeltaFilePartition]:
        """Change-feed partitions of commit ``v`` — the streaming,
        Spark-free twin of ``operators/dml.table_changes``'s per-version
        loop (same file-level granularity, same multiset-equivalence
        contract: old - deletes + inserts reproduces the next snapshot):

        - same-path remove+add where the add carries a deletion vector
          (merge-on-read DML): feed ONLY the newly deleted positions as
          'delete' (``keep_positions``);
        - other data-changing removes: feed the file's live rows (prior
          DV applied) as 'delete';
        - other data-changing adds: feed the whole file as 'insert';
        - compaction (dataChange=false) emits nothing.

        O(changed files of v): the prior-state lookup is ``prev`` (a
        ``{path: AddAction}`` map at version v-1, rolled forward by the
        caller via ``delta_log.roll_adds`` when walking a version range)
        or, for a single-version call, one replay."""
        adds: dict[str, dict] = {}
        removes: list[str] = []
        cdcs: list[dict] = []
        for action in self.log.commit_actions(v):
            if "add" in action and action["add"].get("dataChange", True):
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action and action["remove"].get("dataChange", True):
                removes.append(action["remove"]["path"])
            elif "cdc" in action and action["cdc"].get("path"):
                cdcs.append(action["cdc"])
        if cdcs:
            # writer-materialized row-level change data (protocol
            # AddCDCFile): these files ARE the version's feed — each row
            # carries its own _change_type (update_preimage/postimage
            # fidelity the synthesis below cannot give)
            return [
                self._part_for(
                    c["path"], c.get("partitionValues", {}), (),
                    cdf_version=v, cdf_from_file=True,
                )
                for c in cdcs
            ]
        if not adds and not removes:
            return []
        if prev is None:
            prev = {a.path: a for a in self.log.read_state(at_version=v - 1).adds}
        parts: list[DeltaFilePartition] = []
        dv_delta = {
            p for p, a in adds.items() if a.get("deletionVector") and p in removes
        }
        for p in sorted(dv_delta):
            new_add = AddAction(
                path=p, size=0, deletion_vector=adds[p].get("deletionVector")
            )
            new_pos = set(_dv_positions(self.table_path, new_add))
            old_pos = (
                set(_dv_positions(self.table_path, prev[p])) if p in prev else set()
            )
            fresh = sorted(new_pos - old_pos)
            if fresh:
                pv = prev[p].partition_values if p in prev else {}
                parts.append(
                    self._part_for(
                        p, pv, (), cdf_type="delete", cdf_version=v,
                        keep_positions=fresh,
                    )
                )
        for p in removes:
            if p in dv_delta:
                continue
            prior = prev.get(p)
            pv = prior.partition_values if prior else {}
            dv = _dv_positions(self.table_path, prior) if prior else ()
            parts.append(
                self._part_for(p, pv, dv, cdf_type="delete", cdf_version=v)
            )
        for p, ad in adds.items():
            if p in dv_delta:
                continue
            parts.append(
                self._part_for(
                    p, ad.get("partitionValues", {}), (),
                    cdf_type="insert", cdf_version=v,
                )
            )
        return parts

    def prune(self, adds):
        """Zone-map + Bloom-index prune an Add list by the ``where`` option
        (no-op when unset or unparseable).  The Bloom probe is the
        Spark-free pyarrow twin — this planning code runs in a plain Python
        process with no session — and reads only the CANDIDATE paths' index
        rows, so its cost tracks the micro-batch, not the table.  Specs are
        pinned at stream start; an index rebuilt mid-stream fails safe
        (read error keeps the files)."""
        if self._where_ast is None:
            return list(adds)
        from delta_sorter_spark.functions.skipping import file_may_match

        kept = [
            a
            for a in adds
            if file_may_match(
                a, self._where_ast, self._meta_schema, list(self.partition_columns)
            )
        ]
        if not kept:
            return kept
        from delta_sorter_spark.operators.bloom_index import (
            bloom_prune_adds_local,
        )

        return bloom_prune_adds_local(
            self.table_path, kept, self.where, self._meta
        )

    def snapshot_partitions(self, at_version=None) -> list[DeltaFilePartition]:
        state = self.log.read_state(at_version=at_version)
        if self.read_change_feed:
            # initial snapshot feeds as 'insert' at the snapshot version
            # (Delta's streaming-CDF convention), DVs applied by replay
            v = state.version if at_version is None else int(at_version)
            return [
                self._part_for(
                    a.path, a.partition_values,
                    _dv_positions(self.table_path, a),
                    cdf_type="insert", cdf_version=v,
                )
                for a in state.adds
            ]
        return [
            self._part_for(
                a.path, a.partition_values, _dv_positions(self.table_path, a)
            )
            for a in self.prune(state.adds)
        ]


class DeltaBatchReader(DataSourceReader):
    """Batch half of the Python source (API completeness locally — the JVM
    parquet scan in ``DeltaTable.to_df`` is the fast path there — and the
    jar-free read path for remote table URIs).  ``versionAsOf`` time-travels
    the snapshot.  ``files`` (JSON list of self-contained spec objects
    ``{"path": <table-relative>, "partitionValues": {...},
    "deletionVector": {...}?}``) restricts the scan to exactly those files,
    with no membership check against the current snapshot — how
    partition-scoped rewrites (compaction's log-driven file pruning,
    reference lib.rs:795-809) read remote tables without connector jars;
    ``DeltaTable._to_df_remote`` is the producer of this option."""

    def __init__(self, options, schema=None):
        if str(options.get("readChangeFeed", "false")).lower() == "true":
            raise ValueError(
                "delta_sorter source: readChangeFeed is a streaming option; "
                "the batch change feed is operators/dml.table_changes"
            )
        v = options.get("versionAsOf")
        self.at_version = int(v) if v is not None else None
        raw_files = options.get("files")
        self.file_subset = json.loads(raw_files) if raw_files else None
        self.core = _DeltaSourceCore(options, schema, at_version=self.at_version)

    def partitions(self):
        if self.file_subset is not None:
            # self-contained specs ({path, partitionValues, deletionVector})
            # are read EXACTLY as given — no current-snapshot membership
            # check, so a file tombstoned by a concurrent commit after the
            # caller planned is still readable (it stays on disk until
            # vacuum) and the race resolves at the caller's commit, same as
            # the local JVM read path.  Metadata (schema, partition layout)
            # still comes from the pinned snapshot.
            parts = []
            for spec in self.file_subset:
                if isinstance(spec, str):
                    # legacy bare-path form (pre-spec-object callers /
                    # persisted plans): accept as {path: s} — an unpartitioned
                    # file with no deletion vector
                    spec = {"path": spec}
                elif not isinstance(spec, dict) or "path" not in spec:
                    raise ValueError(
                        "files option entries must be spec objects "
                        '{"path": <table-relative>, "partitionValues": {...}, '
                        '"deletionVector": {...}?} (or bare path strings for '
                        f"unpartitioned files); got {spec!r}"
                    )
                add = AddAction(
                    path=spec["path"],
                    size=0,
                    partition_values=spec.get("partitionValues") or {},
                    deletion_vector=spec.get("deletionVector"),
                )
                parts.append(
                    self.core._part_for(
                        add.path,
                        add.partition_values,
                        _dv_positions(self.core.table_path, add),
                    )
                )
            return parts
        return self.core.snapshot_partitions(at_version=self.at_version)

    def read(self, partition):
        if partition is None:  # empty snapshot (e.g. versionAsOf=0)
            return iter(())
        return _read_file(partition)


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema=None):
        self.core = _DeltaSourceCore(options, schema)
        raw = options.get("maxFilesPerTrigger")
        self.max_files = int(raw) if raw is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        raw = options.get("maxBytesPerTrigger")
        self.max_bytes = int(raw) if raw is not None else None
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        # startingVersion (Delta semantics): begin the stream AT this
        # commit — no initial-snapshot batch; "latest" = only commits
        # made after the query starts.  Works for plain and change-feed
        # streams alike.
        raw = options.get("startingVersion")
        if raw is None:
            self.starting_version: int | None = None
        elif str(raw).lower() == "latest":
            self.starting_version = self.core.log.latest_version() + 1
        else:
            self.starting_version = int(raw)
            if self.starting_version < 0:
                raise ValueError("startingVersion must be >= 0 or 'latest'")
        # last end version this reader handed out (admission-control
        # anchor).  None until the first initialOffset/partitions call.
        # On a restart with an in-flight WAL batch Spark replays it
        # through partitions() before the next latestOffset, which
        # re-anchors capping; a clean restart (no pending batch) has no
        # start signal in this API, so its FIRST catch-up batch is
        # uncapped and capping resumes from there.
        self._pos: int | None = None
        # version -> (data-add file count, data-add byte size)
        self._vfiles: dict[int, tuple[int, int]] = {}

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            # begin AT startingVersion: offsets are "last consumed", so
            # start one before it and the first batch feeds commits
            # (startingVersion - 1, end].  from_version distinguishes
            # startingVersion=0 (per-commit feed from the beginning) from
            # the -1 snapshot sentinel; it rides the offset so a WAL
            # restart replays the same semantics.
            self._pos = self.starting_version - 1
            return {"version": self._pos, "from_version": True}
        # -1 marks "snapshot not yet emitted": the first batch replays the
        # active-file set at whatever version latestOffset returns.
        self._pos = -1
        return {"version": -1}

    def _weight_of(self, v: int) -> tuple[int, int]:
        w = self._vfiles.get(v)
        if w is None:
            n = b = 0
            for a in self.core.log.commit_actions(v):
                ad = a.get("add")
                if ad and ad.get("dataChange", True):
                    n += 1
                    b += int(ad.get("size", 0) or 0)
            w = self._vfiles[v] = (n, b)
        return w

    def latestOffset(self) -> dict:
        """Tip of the log — or, with ``maxFilesPerTrigger`` /
        ``maxBytesPerTrigger``, the furthest version whose cumulative
        data-add file count / byte size since the last handed-out offset
        stays within EVERY set cap (always admitting at least one version,
        so a single oversized commit still flows).  Offsets stay
        version-granular: admission is whole commits, the unit the
        exactly-once sink contract replays.  Backfill catch-up therefore
        proceeds in bounded micro-batches instead of one table-sized one.

        Caveat (documented): ``availableNow`` captures ONE latestOffset at
        query start, so a capped reader drains at most one cap's worth per
        run — use the caps with processing-time triggers (their purpose),
        or leave them unset for full availableNow drains."""
        tip = self.core.log.latest_version()
        uncapped = self.max_files is None and self.max_bytes is None
        if uncapped or self._pos is None or self._pos >= tip:
            return {"version": tip}
        end, files, size = self._pos, 0, 0
        for v in range(self._pos + 1, tip + 1):
            n, b = self._weight_of(v)
            files += n
            size += b
            over = (
                self.max_files is not None and files > self.max_files
            ) or (self.max_bytes is not None and size > self.max_bytes)
            if over and end > self._pos:
                break
            end = v
            full = (
                self.max_files is not None and files >= self.max_files
            ) or (self.max_bytes is not None and size >= self.max_bytes)
            if full:
                break
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        core, log = self.core, self.core.log
        sv, ev = int(start["version"]), int(end["version"])
        # admission anchor: on restart Spark replays the WAL batch through
        # here before the next latestOffset, so capping resumes from the
        # replayed end, not from scratch
        self._pos = ev if self._pos is None else max(self._pos, ev)
        if ev <= sv:
            return []
        if sv < 0 and not start.get("from_version"):
            # initial snapshot (removes + DVs honored by replay)
            return core.snapshot_partitions(at_version=ev)
        sv = max(sv, -1)
        if core.read_change_feed:
            from delta_sorter_spark.sources.delta_log import roll_adds

            # ONE prior-state replay for the whole batch, rolled forward
            # version by version — not a fresh replay per version (K full
            # replays of an O(#files) checkpoint for a K-version batch).
            parts = []
            prev = (
                {}  # startingVersion=0: nothing exists before commit 0
                if sv < 0
                else {a.path: a for a in log.read_state(at_version=sv).adds}
            )
            for v in range(sv + 1, ev + 1):
                parts.extend(core.cdf_partitions_for_version(v, prev=prev))
                roll_adds(log, prev, v)
            return parts
        parts = []
        for v in range(sv + 1, ev + 1):
            actions = log.commit_actions(v)
            data_removes = [
                r["remove"]
                for r in actions
                if "remove" in r and r["remove"].get("dataChange", False)
            ]
            if data_removes:
                if core.skip_change_commits:
                    continue
                raise ValueError(
                    f"delta_sorter stream: commit {v} of {core.table_path} "
                    f"rewrites or deletes data (remove with dataChange=true);"
                    f" set skipChangeCommits=true to skip such commits"
                )
            batch_adds = []
            for a in actions:
                ad = a.get("add")
                if not ad or not ad.get("dataChange", True):
                    continue  # compaction rewrites are not new data
                stats = ad.get("stats")
                if isinstance(stats, str):
                    try:
                        stats = json.loads(stats)
                    except ValueError:
                        stats = None
                batch_adds.append(
                    AddAction(
                        path=ad["path"],
                        size=ad.get("size", 0),
                        partition_values=ad.get("partitionValues", {}),
                        stats=stats if isinstance(stats, dict) else None,
                        deletion_vector=ad.get("deletionVector"),
                    )
                )
            for add in core.prune(batch_adds):
                parts.append(
                    core._part_for(
                        add.path,
                        add.partition_values,
                        _dv_positions(core.table_path, add),
                    )
                )
        return parts

    def read(self, partition):
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        v = int(end["version"])
        self._pos = v if self._pos is None else max(self._pos, v)
        # committed versions' counts are never consulted again
        self._vfiles = {k: n for k, n in self._vfiles.items() if k > v}


class _SinkCommitMessage(WriterCommitMessage):
    """One staged parquet file written by an executor task."""

    def __init__(self, rel_path: str, size: int, num_records: int):
        self.rel_path = rel_path
        self.size = size
        self.num_records = num_records


class DeltaStreamWriter(DataSourceStreamWriter):
    """``writeStream.format("delta_sorter")`` — the native append sink:
    executors stage one parquet file per non-empty task under
    ``_staging/sink/``, the driver-side ``commit`` moves them into the
    table with exact write-time stats (zone maps + keyStats attestation,
    the same `_file_stats` every other write path uses) and ONE log
    commit per micro-batch — entirely through the pure-Python log plane,
    no Spark session needed at commit time.

    ``.option("txnAppId", ...)`` makes the sink EXACTLY-ONCE beyond the
    checkpoint: each batch commits a SetTransaction (appId, batchId), so
    a redelivered batch — even after checkpoint loss, when batch ids
    restart — is dropped before any log write.  Without the option the
    checkpoint alone dedups (Delta's own sink keys this off the query id,
    which the Python sink API does not expose — the explicit option is
    the honest equivalent).

    v1 capability gates (all refused loudly at query start): remote-URI
    tables, partitioned tables (use ``streaming/events.delta_append_sink``
    via foreachBatch), CHECK constraints / column invariants (enforcement
    needs a scan), identity / generated / DEFAULT-valued columns (writer-
    computed values), column mapping.  ``delta.appendOnly`` tables are
    fine — this sink only appends."""

    def __init__(self, options, schema: T.StructType):
        from delta_sorter_spark.sources.fs import is_remote_uri

        self.table_path = options["path"]
        if is_remote_uri(self.table_path):
            raise NotImplementedError(
                "delta_sorter sink: remote table URIs are not supported; "
                "use a foreachBatch sink (streaming/events.delta_append_sink)"
            )
        state = DeltaLog(self.table_path).read_state()
        meta = state.metadata
        if meta.partition_columns:
            raise NotImplementedError(
                "delta_sorter sink: partitioned tables are not supported; "
                "use a foreachBatch sink (streaming/events.delta_append_sink)"
            )
        if meta.write_constraints:
            raise NotImplementedError(
                "delta_sorter sink: the table declares CHECK constraints / "
                "invariants; enforcement needs a scan — use a foreachBatch "
                "sink with DeltaTable.append"
            )
        cfg = meta.configuration or {}
        if cfg.get("delta.columnMapping.mode") in ("name", "id"):
            raise NotImplementedError(
                "delta_sorter sink: column-mapped tables are not supported"
            )
        for f in meta.schema.fields:
            md = f.metadata or {}
            if any(k.startswith("delta.identity.") for k in md) or (
                "delta.generationExpression" in md
            ) or ("CURRENT_DEFAULT" in md):
                raise NotImplementedError(
                    f"delta_sorter sink: column {f.name!r} needs writer-"
                    "computed values (identity/generated/DEFAULT); use a "
                    "foreachBatch sink with DeltaTable.append"
                )
        want = [(f.name, f.dataType.simpleString()) for f in meta.schema.fields]
        got = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        if want != got:
            raise ValueError(
                f"delta_sorter sink: stream schema {got} does not match the "
                f"table schema {want}"
            )
        self.schema_json = meta.schema.json()
        self.txn_app_id = options.get("txnAppId")
        from delta_sorter_spark.sources.delta_table import stats_columns_for

        self.stat_cols = stats_columns_for(meta)

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return None
        schema = T.StructType.fromJson(json.loads(self.schema_json))
        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        )
        data = {f.name: [r[f.name] for r in rows] for f in schema.fields}
        tbl = pa.table(data, schema=arrow_schema)
        rel = f"_staging/sink/{_uuid.uuid4().hex}.parquet"
        dest = os.path.join(self.table_path, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        pq.write_table(tbl, dest, compression="snappy")
        return _SinkCommitMessage(rel, os.path.getsize(dest), tbl.num_rows)

    def _discard(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.table_path, m.rel_path))
            except OSError:
                pass

    def commit(self, messages, batchId: int) -> None:
        import time as _time
        import uuid as _uuid

        from delta_sorter_spark.sources.delta_table import _file_stats

        msgs = [m for m in messages if m is not None]
        log = DeltaLog(self.table_path)
        if self.txn_app_id is not None:
            state = log.read_state()
            if state.txns.get(self.txn_app_id, -1) >= batchId:
                self._discard(msgs)  # redelivered batch: exactly-once drop
                return
        if not msgs:
            return
        adds = []
        for m in msgs:
            src = os.path.join(self.table_path, m.rel_path)
            name = f"part-{batchId:05d}-{_uuid.uuid4().hex}.snappy.parquet"
            dest = os.path.join(self.table_path, name)
            os.replace(src, dest)
            adds.append(
                AddAction(
                    path=name,
                    size=m.size,
                    modification_time=int(os.path.getmtime(dest) * 1000),
                    data_change=True,
                    stats=_file_stats(dest, self.stat_cols),
                )
            )
        actions: list = []
        if self.txn_app_id is not None:
            actions.append(
                {
                    "txn": {
                        "appId": self.txn_app_id,
                        "version": int(batchId),
                        "lastUpdated": int(_time.time() * 1000),
                    }
                }
            )
        log.commit_with_retry(
            lambda state: list(actions) + list(adds),
            operation="STREAMING UPDATE",
            operation_params={"outputMode": "Append", "epochId": str(batchId)},
        )

    def abort(self, messages, batchId: int) -> None:
        self._discard(messages)


class DeltaStreamDataSource(DataSource):
    """``format("delta_sorter")`` — register with
    ``spark.dataSource.register(DeltaStreamDataSource)``.

    Options: ``path`` (local dir or s3:// URI), ``versionAsOf`` (batch time
    travel), ``skipChangeCommits`` (streaming), ``readChangeFeed``
    (streaming change feed: _change_type/_commit_version-tagged rows,
    exclusive with skipChangeCommits/where/withFilePath/withPositions),
    ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` (streaming admission
    control: bound each micro-batch to ~N data files' / bytes' worth of
    commits — whichever set cap fills first — version-granular, at least
    one commit per trigger, so backfill catch-up proceeds in bounded
    batches; see DeltaStreamReader.latestOffset for the availableNow
    caveat),
    ``awsEnv`` (JSON of the
    driver's AWS settings — ``fs.capture_aws_env()`` — required for remote
    URIs whenever those settings changed after the SparkSession started,
    because the source's planner runs in python workers that inherit the
    older environment).

    Also a streaming SINK: ``writeStream.format("delta_sorter")`` appends
    micro-batches natively (see :class:`DeltaStreamWriter`; ``txnAppId``
    option for exactly-once beyond the checkpoint)."""

    @classmethod
    def name(cls) -> str:
        return "delta_sorter"

    def schema(self):
        _apply_env_option(self.options)
        schema = DeltaLog(self.options["path"]).read_state().metadata.schema
        with_file = str(self.options.get("withFilePath", "false")).lower() == "true"
        with_pos = str(self.options.get("withPositions", "false")).lower() == "true"
        _check_reserved_columns(schema, with_file, with_pos)
        extra = list(_parse_extra_columns(self.options, schema))
        if with_file or with_pos:
            extra.append(T.StructField(FILE_COL, T.StringType()))
        if with_pos:
            extra.append(T.StructField(POS_COL, T.LongType()))
        if str(self.options.get("readChangeFeed", "false")).lower() == "true":
            clashes = [
                c for c in (CDF_TYPE_COL, CDF_VERSION_COL) if c in schema.names
            ]
            if clashes:
                raise ValueError(
                    f"delta_sorter source: table already has column(s) "
                    f"{clashes}; readChangeFeed cannot synthesize over user data"
                )
            extra.append(T.StructField(CDF_TYPE_COL, T.StringType()))
            extra.append(T.StructField(CDF_VERSION_COL, T.LongType()))
        if extra:
            schema = T.StructType(list(schema.fields) + extra)
        return schema

    def reader(self, schema):
        return DeltaBatchReader(self.options, schema)

    def streamReader(self, schema):
        return DeltaStreamReader(self.options, schema)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise NotImplementedError(
                "delta_sorter sink: append output mode only"
            )
        return DeltaStreamWriter(self.options, schema)
