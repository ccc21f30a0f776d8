"""Minimal Delta Lake transaction log (reader + writer), pure Python.

This environment has no ``delta-spark`` JARs, so the engine implements the
(public) Delta transaction-log protocol directly for the subset the reference
exercises:

- versioned JSON commit files ``_delta_log/%020d.json`` containing
  ``protocol`` / ``metaData`` / ``add`` / ``remove`` / ``commitInfo`` actions;
- table state = replay of all commits in version order (last metaData wins,
  adds cancelled by removes keyed on path) — the same replay the reference
  gets from delta-rs (reference lib.rs:252-296 enumerates Add actions of the
  current snapshot);
- per-file ``stats`` JSON (numRecords / minValues / maxValues / nullCount) so
  validation can be O(metadata), which SURVEY §4 calls out as our improvement
  over the reference's full-file scans (lib.rs:609-665);
- optimistic concurrency: a commit targets version N and fails if
  ``%020d.json`` already exists — **put-if-absent**, via ``os.link`` locally
  and a conditional PUT on object stores (sources/fs.py).  Mirrors the
  reference's single-commit CommitBuilder flow (lib.rs:862-885);
- **parquet checkpoints** per the Delta protocol's checkpoint schema
  (``%020d.checkpoint.parquet`` with one-action-per-row structs + a
  ``_last_checkpoint`` pointer), so replay is O(commits since checkpoint) and
  the on-disk layout matches what delta-rs / delta-spark write.  Legacy JSON
  checkpoints written by earlier versions of this engine are still read.

All log IO goes through ``sources/fs.py``; table paths may be local paths or
``s3://`` / ``memory://`` URIs, matching the reference's URI addressing
(crates/sorter-cli/src/main.rs:13-15).

Deletion vectors default to the STANDARD protocol encoding (roaring-bitmap
``deletion_vector_<uuid>.bin`` files, storageType "u"/"i"/"p" — see
sources/roaring.py), so a stock delta-rs / delta-spark reader interprets
them.  Tables written by earlier versions of this engine may still carry
the legacy parquet-positions sidecar (``{"storagePath": ...}`` descriptors,
checkpointed as storageType "p" with a null offset); those remain readable,
and ``purge_deletion_vectors`` materializes them away for full interop.

The ``schemaString`` in metaData uses Spark's StructType JSON, which is the
same format Delta uses, so round-tripping through ``StructType.fromJson`` is
exact.
"""

from __future__ import annotations

import io
import json
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .fs import resolve


class DeltaCommitConflict(Exception):
    """Another writer claimed the target version first."""


def schema_type_features(dtype) -> set[str]:
    """Reader-writer protocol features the (nested) types of ``dtype``
    require: VARIANT -> ``variantType``, TIMESTAMP_NTZ -> ``timestampNtz``
    (a stock reader must understand the physical encoding before trusting
    the rest of the table, so both are declared at reader protocol 3)."""
    if isinstance(dtype, T.StructType):
        out: set[str] = set()
        for f in dtype.fields:
            out |= schema_type_features(f.dataType)
        return out
    if isinstance(dtype, T.ArrayType):
        return schema_type_features(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return schema_type_features(dtype.keyType) | schema_type_features(
            dtype.valueType
        )
    if isinstance(dtype, T.VariantType):
        return {"variantType"}
    if isinstance(dtype, T.TimestampNTZType):
        return {"timestampNtz"}
    return set()


def schema_contains_variant(dtype) -> bool:
    """True when any (nested) field of ``dtype`` is VARIANT — gates the
    pyarrow-based planes (this build cannot parse VARIANT footers) on top
    of the ``variantType`` protocol feature."""
    return "variantType" in schema_type_features(dtype)


def physical_name(field: T.StructField) -> str:
    """Parquet-file column name for a schema field (Delta column mapping,
    ``delta.columnMapping.physicalName`` field metadata).  Defaults to the
    logical name, so tables that never renamed a column are unaffected."""
    md = field.metadata or {}
    return md.get("delta.columnMapping.physicalName", field.name)


@dataclass
class AddAction:
    path: str  # relative, POSIX, possibly "col=val/part-....parquet"
    size: int
    partition_values: dict[str, str | None] = field(default_factory=dict)
    modification_time: int = 0
    data_change: bool = True
    stats: dict | None = None  # numRecords / minValues / maxValues / nullCount
    # Deletion vector (merge-on-read delete).  Standard protocol shape:
    # {"storageType": "u"|"i"|"p", "pathOrInlineDv", "offset",
    # "sizeInBytes", "cardinality"} (roaring bitmap — sources/roaring.py).
    # Legacy shape from earlier engine versions: {"storagePath": <relative
    # sidecar path>, "cardinality"}.  Readers drop the vector's row
    # positions from this file; None = no deleted rows.
    deletion_vector: dict | None = None
    # Row tracking (Delta ``rowTracking`` writer feature): the fresh row id
    # of this file's row i is ``base_row_id + i``; the row commit version is
    # ``default_row_commit_version``.  Rewrites that COPY rows materialize
    # the original ids into hidden physical columns instead (readers
    # coalesce), so ids are stable across compaction and copy-on-write DML.
    base_row_id: int | None = None
    default_row_commit_version: int | None = None
    # Free-form file metadata (protocol optional ``tags``).  The clustering
    # optimizer records the ZCube a clustered file belongs to under
    # ``deltaSorter.zcubeId`` (operators/cluster.py).
    tags: dict | None = None
    # Clustered-table marker (protocol ``clusteringProvider``, clusteredTable
    # writer feature): name of the implementation that clustered this file;
    # absent = the file is unclustered and a candidate for the next OPTIMIZE.
    clustering_provider: str | None = None

    def to_json(self) -> dict:
        d = {
            "path": self.path,
            "partitionValues": self.partition_values,
            "size": self.size,
            "modificationTime": self.modification_time,
            "dataChange": self.data_change,
        }
        if self.stats is not None:
            d["stats"] = json.dumps(self.stats)
        if self.deletion_vector is not None:
            d["deletionVector"] = self.deletion_vector
        if self.base_row_id is not None:
            d["baseRowId"] = int(self.base_row_id)
        if self.default_row_commit_version is not None:
            d["defaultRowCommitVersion"] = int(self.default_row_commit_version)
        if self.tags:
            d["tags"] = dict(self.tags)
        if self.clustering_provider is not None:
            d["clusteringProvider"] = self.clustering_provider
        return {"add": d}

    def remove_action(self, data_change: bool = False) -> "RemoveAction":
        """Tombstone for this file (reference lib.rs:410-415, 831-855)."""
        return RemoveAction(
            path=self.path,
            partition_values=self.partition_values,
            size=self.size,
            data_change=data_change,
            source_deletion_vector=self.deletion_vector,
            source_modification_time=self.modification_time,
        )


@dataclass
class RemoveAction:
    path: str
    partition_values: dict[str, str | None] = field(default_factory=dict)
    size: int = 0
    data_change: bool = False
    deletion_timestamp: int = 0
    # Snapshot of the Add this remove was planned against.  Two jobs:
    # (1) conflict detection — commit_rewrite compares these against the
    # CURRENTLY active Add for the path, so a concurrent writer that
    # re-Adds the same path (e.g. delete_where_dv attaching a deletion
    # vector) is detected, not just a vanished path; without it a rewrite
    # materialized from pre-DV bytes would commit with dataChange=false and
    # resurrect the concurrently deleted rows.  (2) the protocol asks the
    # remove to RETAIN the removed file version's deletionVector so other
    # engines' VACUUM can reclaim the DV file after log cleanup — to_json
    # serializes it.
    source_deletion_vector: dict | None = None
    source_modification_time: int | None = None

    def to_json(self) -> dict:
        r = {
            "path": self.path,
            "deletionTimestamp": self.deletion_timestamp or int(time.time() * 1000),
            "dataChange": self.data_change,
            "extendedFileMetadata": True,
            "partitionValues": self.partition_values,
            "size": self.size,
        }
        if self.source_deletion_vector is not None:
            r["deletionVector"] = self.source_deletion_vector
        return {"remove": r}


@dataclass
class TableMetadata:
    table_id: str
    schema: T.StructType
    partition_columns: list[str]
    configuration: dict = field(default_factory=dict)

    @property
    def check_constraints(self) -> dict[str, str]:
        """CHECK constraints from table configuration, Delta protocol
        convention: ``delta.constraints.<name> -> SQL expression``."""
        prefix = "delta.constraints."
        return {
            k[len(prefix):]: v
            for k, v in self.configuration.items()
            if k.startswith(prefix)
        }

    @property
    def column_invariants(self) -> dict[str, str]:
        """Legacy column invariants (Delta protocol ``delta.invariants``
        field metadata, writer version 2): name -> SQL expression.  The
        metadata value is the protocol's JSON envelope
        ``{"expression": {"expression": "<sql>"}}``; a bare SQL string is
        also accepted (some old writers emitted it).  Tables ported from
        pre-CHECK-constraint writers carry these, and a writer that
        declares the feature must enforce them."""
        out: dict[str, str] = {}
        for f in self.schema.fields:
            md = f.metadata or {}
            raw = md.get("delta.invariants")
            if not raw:
                continue
            expr = None
            if isinstance(raw, str):
                try:
                    env = json.loads(raw)
                    expr = (env.get("expression") or {}).get("expression")
                except ValueError:
                    expr = raw  # bare SQL string form
            if expr:
                out[f"invariant({f.name})"] = expr
        return out

    @property
    def write_constraints(self) -> dict[str, str]:
        """Everything a write must satisfy: CHECK constraints plus legacy
        column invariants — the single dict every write/DML path enforces."""
        return {**self.check_constraints, **self.column_invariants}

    @property
    def data_schema(self) -> T.StructType:
        """Schema of the parquet data files: partition columns are NOT
        materialized in data files (Delta convention; also noted by the
        reference tests, python/tests/test_predicate_typing.py:27-28)."""
        return T.StructType(
            [f for f in self.schema.fields if f.name not in self.partition_columns]
        )

    # -- column mapping (rename without rewriting data files) --------------

    def physical_of(self, logical: str) -> str:
        """Physical (file) name for a logical column; identity when the
        column has never been renamed or isn't in the schema (lets stats
        helpers stay tolerant of computed columns)."""
        for f in self.schema.fields:
            if f.name == logical:
                return physical_name(f)
        return logical

    def physical_names(self, cols) -> list[str]:
        return [self.physical_of(c) for c in cols]

    def logical_of(self, physical: str) -> str:
        for f in self.schema.fields:
            if physical_name(f) == physical:
                return f.name
        return physical


@dataclass
class TableState:
    version: int
    metadata: TableMetadata
    adds: list[AddAction]
    # SetTransaction watermarks (Delta ``txn`` action): appId -> highest
    # committed application-side version.  The idempotence handle for
    # exactly-once streaming sinks (foreachBatch replays after restart).
    txns: dict = field(default_factory=dict)
    # Latest ``protocol`` action (minReaderVersion/minWriterVersion, plus
    # readerFeatures/writerFeatures once table features are in play — the
    # first deletion-vector commit upgrades to 3/7 + "deletionVectors" so
    # stock readers know to honor the vectors).
    protocol: dict = field(
        default_factory=lambda: {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    # Timestamp of the newest REPLAYED commit (inCommitTimestamp preferred,
    # commitInfo.timestamp otherwise; None when the replay started past the
    # last commit, e.g. a checkpoint at the tip).  Feeds the in-commit-
    # timestamps monotonicity clamp without an extra log read per commit.
    last_commit_timestamp: int | None = None
    # Delta ``domainMetadata`` actions: domain -> configuration (JSON
    # string).  Row tracking keeps its id high-water mark in the
    # ``delta.rowTracking`` domain; a removed=true action deletes the key.
    domain_metadata: dict = field(default_factory=dict)
    # Unexpired ``remove`` tombstones (path -> remove-action dict).  The
    # protocol requires checkpoints to carry tombstones younger than
    # ``delta.deletedFileRetentionDuration`` so VACUUM on any reader keeps
    # working after log cleanup; a re-Add of the same path clears its
    # tombstone.  Expiry is applied at checkpoint-write time, not here.
    tombstones: dict = field(default_factory=dict)

    @property
    def row_id_high_water_mark(self) -> int:
        """Highest row id ever assigned (-1 before any assignment), from
        the ``delta.rowTracking`` domain."""
        raw = self.domain_metadata.get("delta.rowTracking")
        if not raw:
            return -1
        try:
            return int(json.loads(raw).get("rowIdHighWaterMark", -1))
        except (ValueError, TypeError):
            return -1


def _checkpoint_arrow_schema():
    """Delta protocol checkpoint schema (one action per row, struct per
    action type).  Field names/shapes follow the protocol's
    "Checkpoint Schema" section so delta-rs/delta-spark recognise the file."""
    import pyarrow as pa

    str_map = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("name", pa.string()),
                        ("description", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [("provider", pa.string()), ("options", str_map)]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("tags", str_map),
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                        ("baseRowId", pa.int64()),
                        ("defaultRowCommitVersion", pa.int64()),
                        ("clusteringProvider", pa.string()),
                    ]
                ),
            ),
            (
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("extendedFileMetadata", pa.bool_()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("tags", str_map),
                        # removes retain the removed file version's DV so
                        # any reader's VACUUM can reclaim the DV file after
                        # log cleanup (protocol "Add File and Remove File")
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            (
                "domainMetadata",
                pa.struct(
                    [
                        ("domain", pa.string()),
                        ("configuration", pa.string()),
                        ("removed", pa.bool_()),
                    ]
                ),
            ),
            # V2-checkpoint actions (protocol v2Checkpoint feature): the
            # top-level file carries ONE checkpointMetadata plus sidecar
            # pointers; file actions live in _sidecars/ parquet files.
            # Null in every classic (v1) checkpoint row.
            (
                "checkpointMetadata",
                pa.struct([("version", pa.int64()), ("tags", str_map)]),
            ),
            (
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
        ]
    )


def _as_dict(maybe_map) -> dict:
    """pyarrow returns map columns as [(k, v), ...]; normalise to dict."""
    if maybe_map is None:
        return {}
    if isinstance(maybe_map, dict):
        return maybe_map
    return dict(maybe_map)


def roll_adds(log: "DeltaLog", adds: dict[str, "AddAction"], version: int) -> None:
    """Advance a ``{path: AddAction}`` live-file map through commit
    ``version`` in place — the O(commit actions) alternative to a fresh
    ``read_state(at_version=...)`` replay for consumers that walk versions
    IN ORDER (change feeds, streaming planners).  Without it a K-version
    batch pays K full replays, each O(checkpoint + commits since) — at
    10^6 files that is the planner bottleneck of a CDF tail pass."""
    metadata = None
    for action in log.commit_actions(version):
        metadata, adds = DeltaLog._apply(action, metadata, adds)


def _dv_to_checkpoint(src: dict | None) -> dict | None:
    """Engine-internal deletion-vector descriptor -> the protocol struct a
    checkpoint row carries (shared by the add path and remove tombstones,
    so a DV-carrying remove round-trips through log cleanup and other
    engines' VACUUM can still reclaim the DV file)."""
    if src is None:
        return None
    if "storageType" in src and "storagePath" not in src:
        # standard protocol descriptor — checkpoint verbatim
        return {
            "storageType": src["storageType"],
            "pathOrInlineDv": src["pathOrInlineDv"],
            "offset": src.get("offset"),
            "sizeInBytes": src.get("sizeInBytes"),
            "cardinality": src.get("cardinality", 0),
        }
    # legacy sidecar: "p" with null offset marks it
    return {
        "storageType": "p",
        "pathOrInlineDv": src.get("storagePath"),
        "offset": None,
        "sizeInBytes": None,
        "cardinality": src.get("cardinality", 0),
    }


def _dv_from_checkpoint(dv: dict | None) -> dict | None:
    """Inverse of :func:`_dv_to_checkpoint` (None for an all-null struct —
    pyarrow materialises absent struct columns as {field: None})."""
    if dv is None or not dv.get("pathOrInlineDv"):
        return None
    if (
        dv.get("storageType") in ("u", "i")
        or dv.get("offset") is not None
        or dv.get("sizeInBytes") is not None
    ):
        # standard protocol descriptor — pass through.  (A standard "p"
        # vector may omit offset, but the protocol REQUIRES sizeInBytes;
        # only this engine's legacy sidecars null out both.)
        return {
            "storageType": dv.get("storageType"),
            "pathOrInlineDv": dv["pathOrInlineDv"],
            "offset": dv.get("offset"),
            "sizeInBytes": dv.get("sizeInBytes"),
            "cardinality": dv.get("cardinality", 0),
        }
    # legacy sidecar (this engine's earlier format, checkpointed as "p"
    # with null offset AND null sizeInBytes)
    return {
        "storagePath": dv["pathOrInlineDv"],
        "cardinality": dv.get("cardinality", 0),
    }


class DeltaLog:
    """Transaction log for one table directory (local path or URI)."""

    def __init__(self, table_path: str):
        self.fs, self.table_path = resolve(table_path)
        self.log_dir = self.fs.join(self.table_path, "_delta_log")

    CHECKPOINT_INTERVAL = 10

    # -- reading -----------------------------------------------------------

    def exists(self) -> bool:
        return bool(self._commit_versions())

    def _commit_versions(self) -> list[int]:
        out = []
        for name in self.fs.list_dir(self.log_dir):
            if name.endswith(".json") and len(name) == 25:
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_version(self) -> int:
        versions = self._commit_versions()
        return versions[-1] if versions else -1

    def _last_checkpoint_version(self) -> int | None:
        path = self.fs.join(self.log_dir, "_last_checkpoint")
        try:
            return int(json.loads(self.fs.read_text(path))["version"])
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            return None

    def _find_checkpoint_bytes(self, version: int) -> bytes | None:
        """Parquet checkpoint bytes at ``version``: the classic name
        (``<v>.checkpoint.parquet``) or a UUID-named V2 checkpoint
        (``<v>.checkpoint.<uuid>.parquet``)."""
        classic = self.fs.join(self.log_dir, f"{version:020d}.checkpoint.parquet")
        try:
            return self.fs.read_bytes(classic)
        except FileNotFoundError:
            pass
        prefix = f"{version:020d}.checkpoint."
        try:
            names = self.fs.list_dir(self.log_dir)
        except FileNotFoundError:
            return None
        for name in sorted(names):
            if (
                name.startswith(prefix)
                and name.endswith(".parquet")
                and name != f"{version:020d}.checkpoint.parquet"
            ):
                return self.fs.read_bytes(self.fs.join(self.log_dir, name))
        return None

    def _read_checkpoint_actions(self, version: int) -> list[dict] | None:
        """Actions of the checkpoint at ``version``; parquet (protocol
        layout, classic or V2 + sidecars) preferred, legacy JSON-lines
        fallback; None if absent."""
        data = self._find_checkpoint_bytes(version)
        if data is not None:
            import pyarrow.parquet as pq

            table = pq.read_table(io.BytesIO(data))
            actions: list[dict] = []
            rows = list(table.to_pylist())
            i = 0
            while i < len(rows):
                row = rows[i]
                i += 1
                if row.get("checkpointMetadata") is not None:
                    continue  # informational (v2 top-level marker)
                if row.get("sidecar") is not None:
                    # v2 sidecar: splice its file actions in-line
                    sc_path = self.fs.join(
                        self.log_dir, "_sidecars", row["sidecar"]["path"]
                    )
                    sc_tbl = pq.read_table(io.BytesIO(self.fs.read_bytes(sc_path)))
                    rows[i:i] = sc_tbl.to_pylist()
                    continue
                if row.get("protocol") is not None:
                    actions.append({"protocol": row["protocol"]})
                elif row.get("metaData") is not None:
                    m = dict(row["metaData"])
                    m["partitionColumns"] = list(m.get("partitionColumns") or [])
                    m["configuration"] = _as_dict(m.get("configuration"))
                    fmt = dict(m.get("format") or {})
                    fmt["options"] = _as_dict(fmt.get("options"))
                    m["format"] = fmt
                    actions.append({"metaData": m})
                elif row.get("txn") is not None:
                    actions.append({"txn": row["txn"]})
                elif row.get("add") is not None:
                    a = dict(row["add"])
                    a["partitionValues"] = _as_dict(a.get("partitionValues"))
                    dv = _dv_from_checkpoint(a.pop("deletionVector", None))
                    if dv is not None:
                        a["deletionVector"] = dv
                    tags = _as_dict(a.get("tags"))
                    a["tags"] = tags or None
                    actions.append({"add": a})
                elif row.get("remove") is not None:
                    r = dict(row["remove"])
                    r["partitionValues"] = _as_dict(r.get("partitionValues"))
                    dv = _dv_from_checkpoint(r.pop("deletionVector", None))
                    if dv is not None:
                        r["deletionVector"] = dv
                    tags = _as_dict(r.get("tags"))
                    r["tags"] = tags or None
                    actions.append({"remove": r})
                elif row.get("domainMetadata") is not None:
                    actions.append({"domainMetadata": dict(row["domainMetadata"])})
            return actions
        json_path = self.fs.join(self.log_dir, f"{version:020d}.checkpoint.json")
        try:
            text = self.fs.read_text(json_path)
        except FileNotFoundError:
            return None
        return [json.loads(line) for line in text.splitlines() if line.strip()]

    def read_state(self, at_version: int | None = None) -> TableState:
        """Replay the log.  With a checkpoint present, replay starts from the
        checkpointed state and covers only later commits — O(commits since
        checkpoint), the property that keeps log reads cheap on long-lived
        tables.

        ``at_version`` requests a historical snapshot (time travel,
        delta-rs ``load_version`` / Spark ``versionAsOf``): replay stops at
        that commit, and the checkpoint is only used if it is not newer than
        the requested version."""
        versions = self._commit_versions()
        if not versions:
            raise FileNotFoundError(f"no Delta log at {self.log_dir}")
        if at_version is not None:
            if at_version < versions[0] or at_version > versions[-1]:
                raise ValueError(
                    f"version {at_version} not in log range"
                    f" [{versions[0]}, {versions[-1]}]"
                )
            versions = [v for v in versions if v <= at_version]
        metadata: TableMetadata | None = None
        adds: dict[str, AddAction] = {}
        txns: dict[str, int] = {}
        proto: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
        domains: dict[str, str] = {}
        removes: dict[str, dict] = {}

        ckpt_version = self._last_checkpoint_version()
        replay_from = 0
        if ckpt_version is not None and (at_version is None or ckpt_version <= at_version):
            ckpt_actions = self._read_checkpoint_actions(ckpt_version)
            if ckpt_actions is not None:
                for action in ckpt_actions:
                    metadata, adds = self._apply(
                        action, metadata, adds, txns, proto, domains, removes
                    )
                replay_from = ckpt_version + 1

        last_ts: int | None = None
        for v in versions:
            if v < replay_from:
                continue
            text = self.fs.read_text(self.fs.join(self.log_dir, f"{v:020d}.json"))
            for line in text.splitlines():
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    ci = action["commitInfo"]
                    t = ci.get("inCommitTimestamp", ci.get("timestamp"))
                    if t is not None:
                        last_ts = int(t)
                metadata, adds = self._apply(
                    action, metadata, adds, txns, proto, domains, removes
                )
        if metadata is None:
            raise ValueError(f"Delta log at {self.log_dir} has no metaData action")
        return TableState(
            version=versions[-1],
            metadata=metadata,
            adds=list(adds.values()),
            txns=txns,
            protocol=proto,
            last_commit_timestamp=last_ts,
            domain_metadata=domains,
            tombstones=removes,
        )

    def commit_actions(self, version: int) -> list[dict]:
        """All actions of one commit, in file order (change-feed readers)."""
        text = self.fs.read_text(self.fs.join(self.log_dir, f"{version:020d}.json"))
        return [json.loads(line) for line in text.splitlines() if line.strip()]

    def history(self) -> list[dict]:
        """Commit history, newest first: [{version, timestamp, operation,
        operationParameters}] (Delta's DESCRIBE HISTORY shape)."""
        out = []
        for v in reversed(self._commit_versions()):
            info = {"version": v, "timestamp": None, "operation": None,
                    "operationParameters": {}, "operationMetrics": {}}
            for action in self.commit_actions(v):
                if "commitInfo" in action:
                    ci = action["commitInfo"]
                    info.update(
                        # inCommitTimestamp is authoritative when present
                        # (monotonic under multi-writer clock skew)
                        timestamp=ci.get(
                            "inCommitTimestamp", ci.get("timestamp")
                        ),
                        operation=ci.get("operation"),
                        operationParameters=ci.get("operationParameters", {}),
                        operationMetrics=ci.get("operationMetrics", {}),
                    )
                    break
            out.append(info)
        return out

    @staticmethod
    def _apply(action: dict, metadata, adds, txns=None, proto=None,
               domains=None, removes=None):
        if "domainMetadata" in action and domains is not None:
            dm = action["domainMetadata"]
            domain = dm.get("domain")
            if domain:
                if dm.get("removed"):
                    domains.pop(domain, None)
                else:
                    domains[domain] = dm.get("configuration", "")
            return metadata, adds
        if "protocol" in action and proto is not None:
            p = {k: v for k, v in action["protocol"].items() if v is not None}
            if p:
                proto.clear()
                proto.update(p)
            return metadata, adds
        if "txn" in action and txns is not None:
            t = action["txn"]
            app = t.get("appId")
            if app is not None:
                txns[app] = max(txns.get(app, -1), int(t.get("version", 0)))
            return metadata, adds
        if "metaData" in action:
            m = action["metaData"]
            metadata = TableMetadata(
                table_id=m["id"],
                schema=T.StructType.fromJson(json.loads(m["schemaString"])),
                partition_columns=list(m.get("partitionColumns", [])),
                configuration=dict(m.get("configuration", {}) or {}),
            )
        elif "add" in action:
            a = action["add"]
            stats = a.get("stats")
            if removes is not None:
                removes.pop(a["path"], None)
            adds[a["path"]] = AddAction(
                path=a["path"],
                size=a.get("size", 0),
                partition_values=a.get("partitionValues", {}),
                modification_time=a.get("modificationTime", 0),
                data_change=a.get("dataChange", True),
                stats=json.loads(stats) if isinstance(stats, str) and stats else (
                    stats if isinstance(stats, dict) else None
                ),
                deletion_vector=a.get("deletionVector"),
                base_row_id=(
                    int(a["baseRowId"]) if a.get("baseRowId") is not None else None
                ),
                default_row_commit_version=(
                    int(a["defaultRowCommitVersion"])
                    if a.get("defaultRowCommitVersion") is not None
                    else None
                ),
                tags=(_as_dict(a.get("tags")) or None) if a.get("tags") else None,
                clustering_provider=a.get("clusteringProvider"),
            )
        elif "remove" in action:
            r = action["remove"]
            dropped = adds.pop(r["path"], None)
            if removes is not None:
                # DV of the removed file version: from the remove action
                # itself when present, else inherited from the Add this
                # remove displaces — so the tombstone a checkpoint re-emits
                # keeps the descriptor and any reader's VACUUM can reclaim
                # the DV file after log cleanup.
                dv = r.get("deletionVector")
                if dv is None and dropped is not None:
                    dv = dropped.deletion_vector
                tags = _as_dict(r.get("tags")) or None
                if tags is None and dropped is not None:
                    tags = dropped.tags
                ext = r.get("extendedFileMetadata")
                if ext is None:
                    ext = bool(
                        r.get("partitionValues") is not None
                        or r.get("size") is not None
                        or dv is not None
                    )
                removes[r["path"]] = {
                    "path": r["path"],
                    "deletionTimestamp": r.get("deletionTimestamp"),
                    "dataChange": bool(r.get("dataChange", False)),
                    "extendedFileMetadata": ext,
                    "partitionValues": _as_dict(r.get("partitionValues")),
                    "size": r.get("size"),
                    "tags": tags,
                    "deletionVector": dv,
                }
        return metadata, adds

    def write_checkpoint(
        self, state: TableState | None = None, v2: bool = False
    ) -> str:
        """Consolidate current state into a protocol-layout parquet
        checkpoint + ``_last_checkpoint`` pointer.  Subsequent read_state
        calls replay only newer commits.

        ``v2=True`` writes a V2 checkpoint (protocol ``v2Checkpoint``
        reader-writer feature, declared in its own protocol commit first if
        the table hasn't yet): a UUID-named top-level file carrying ONE
        checkpointMetadata action plus a sidecar pointer, with every file
        action in a ``_sidecars/`` parquet.  The layout that matters at
        100 TB: the table-wide metadata (protocol/metaData/domains) reads
        without touching the (large) file manifest, and the manifest can
        shard into many sidecars readable in parallel."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if v2:
            from delta_sorter_spark.sources.delta_table import (
                _reader_writer_feature_upgrade,
            )

            def _declare(s):
                up = _reader_writer_feature_upgrade(s, "v2Checkpoint")
                return [up] if up is not None else []

            cur = state or self.read_state()
            if "v2Checkpoint" not in (cur.protocol.get("readerFeatures") or []):
                self.commit_with_retry(
                    _declare,
                    operation="UPGRADE PROTOCOL",
                    operation_params={"feature": "v2Checkpoint"},
                )
                state = None  # checkpoint the post-upgrade state

        state = state or self.read_state()
        ckpt_proto = dict(state.protocol)
        ckpt_proto.setdefault("minReaderVersion", 1)
        ckpt_proto.setdefault("minWriterVersion", 2)
        rows: list[dict] = [
            {"protocol": ckpt_proto},
            {
                "metaData": {
                    "id": state.metadata.table_id,
                    "name": None,
                    "description": None,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(state.metadata.schema.jsonValue()),
                    "partitionColumns": state.metadata.partition_columns,
                    "configuration": state.metadata.configuration,
                    "createdTime": None,
                }
            },
        ]
        for app, ver in sorted(state.txns.items()):
            rows.append({"txn": {"appId": app, "version": ver, "lastUpdated": None}})
        for add in state.adds:
            dv = _dv_to_checkpoint(add.deletion_vector)
            rows.append(
                {
                    "add": {
                        "path": add.path,
                        "partitionValues": add.partition_values,
                        "size": add.size,
                        "modificationTime": add.modification_time,
                        "dataChange": False,
                        "stats": json.dumps(add.stats) if add.stats else None,
                        "tags": add.tags or None,
                        "deletionVector": dv,
                        "baseRowId": add.base_row_id,
                        "defaultRowCommitVersion": add.default_row_commit_version,
                        "clusteringProvider": add.clustering_provider,
                    }
                }
            )
        # Unexpired remove tombstones: the protocol requires checkpoints to
        # carry removes younger than delta.deletedFileRetentionDuration
        # (default 1 week) so VACUUM-style reconciliation survives log
        # cleanup on ANY reader, not just this engine's orphan sweep.
        from delta_sorter_spark.sources.delta_table import (
            _parse_retention_interval,
        )

        retention_raw = (state.metadata.configuration or {}).get(
            "delta.deletedFileRetentionDuration"
        )
        retention_s = (
            _parse_retention_interval(retention_raw)
            if retention_raw
            else 7 * 86400.0
        )
        cutoff_ms = (time.time() - retention_s) * 1000.0
        for path in sorted(state.tombstones):
            r = state.tombstones[path]
            ts = r.get("deletionTimestamp")
            if ts is not None and ts < cutoff_ms:
                continue  # expired: reclaimable, drop from the checkpoint
            if r.get("deletionVector") is not None:
                r = dict(r)
                r["deletionVector"] = _dv_to_checkpoint(r["deletionVector"])
            rows.append({"remove": r})
        for domain, conf in sorted(state.domain_metadata.items()):
            rows.append(
                {
                    "domainMetadata": {
                        "domain": domain,
                        "configuration": conf,
                        "removed": False,
                    }
                }
            )
        n_actions = len(rows)
        if v2:
            # ALL file actions (add AND remove) belong in sidecars; the
            # top-level UUID file keeps only protocol/metaData/txn/domain
            # rows plus the checkpointMetadata + sidecar pointers.
            file_rows = [r for r in rows if "add" in r or "remove" in r]
            top_rows = [r for r in rows if "add" not in r and "remove" not in r]
            sc_name = f"{uuid.uuid4().hex}.parquet"
            sc_buf = io.BytesIO()
            pq.write_table(
                pa.Table.from_pylist(file_rows, schema=_checkpoint_arrow_schema()),
                sc_buf,
            )
            sc_bytes = sc_buf.getvalue()
            self.fs.makedirs(self.fs.join(self.log_dir, "_sidecars"))
            self.fs.write_bytes(
                self.fs.join(self.log_dir, "_sidecars", sc_name), sc_bytes
            )
            top_rows.append(
                {"checkpointMetadata": {"version": state.version, "tags": None}}
            )
            top_rows.append(
                {
                    "sidecar": {
                        "path": sc_name,
                        "sizeInBytes": len(sc_bytes),
                        "modificationTime": int(time.time() * 1000),
                    }
                }
            )
            rows = top_rows
            ckpt_path = self.fs.join(
                self.log_dir,
                f"{state.version:020d}.checkpoint.{uuid.uuid4().hex}.parquet",
            )
        else:
            ckpt_path = self.fs.join(
                self.log_dir, f"{state.version:020d}.checkpoint.parquet"
            )
        table = pa.Table.from_pylist(rows, schema=_checkpoint_arrow_schema())
        buf = io.BytesIO()
        pq.write_table(table, buf)
        self.fs.write_bytes(ckpt_path, buf.getvalue())
        ptr = json.dumps({"version": state.version, "size": n_actions})
        self.fs.write_text(self.fs.join(self.log_dir, "_last_checkpoint"), ptr)
        return ckpt_path

    def cleanup_metadata(
        self, retention_seconds: float = 30 * 86400.0, dry_run: bool = False
    ) -> dict:
        """Delta's log metadata cleanup (``delta.logRetentionDuration``):
        delete commit json and checkpoint files SUPERSEDED by a newer
        checkpoint, once older than the retention window.  At 100 TB a hot
        table accrues millions of commits; replay only ever needs the
        latest checkpoint plus the commits after it, so everything before
        the latest checkpoint is dead weight for every reader's listing.

        Safety rules, per Delta:
        - nothing at or after the LATEST checkpoint version is touched
          (including that checkpoint itself) — replay stays intact;
        - files younger than ``retention_seconds`` survive (an in-flight
          reader may still be resolving them);
        - V2 sidecars survive while ANY surviving UUID checkpoint
          references them.

        The documented trade is time travel: versions before the earliest
        retained commit become unreadable (same contract as VACUUM for
        data files).  Returns {"deleted", "kept", "cutoff_version"}."""
        import pyarrow.parquet as pq

        ckpt_version = self._last_checkpoint_version()
        if ckpt_version is None:
            return {"deleted": [], "kept": 0, "cutoff_version": None}
        # Never trust the _last_checkpoint pointer alone: a stale or corrupt
        # pointer (failed overwrite, out-of-band deletion on an object
        # store) would make this sweep destroy the only replayable history.
        # Verify the checkpoint bytes actually exist AND parse before
        # computing the doomed set.
        try:
            if self._read_checkpoint_actions(ckpt_version) is None:
                return {"deleted": [], "kept": 0, "cutoff_version": None}
        except Exception:
            return {"deleted": [], "kept": 0, "cutoff_version": None}
        now = time.time()
        try:
            entries = self.fs.list_files_recursive(self.log_dir)
        except FileNotFoundError:
            return {"deleted": [], "kept": 0, "cutoff_version": ckpt_version}

        def version_of(name: str) -> int | None:
            head = name.split(".", 1)[0]
            return int(head) if head.isdigit() and len(head) == 20 else None

        # sidecars referenced by ANY surviving checkpoint stay
        referenced: set[str] = set()
        keep_all_sidecars = False
        doomed, kept = [], 0
        # list_files_recursive yields log_dir-RELATIVE paths
        for rel, mtime in entries:
            name = rel.replace("\\", "/")
            if name.startswith("_sidecars/") or name == "_last_checkpoint":
                continue  # sidecars resolved below; pointer always kept
            v = version_of(name)
            is_log = name.endswith(".json") or ".checkpoint." in name or name.endswith(
                ".checkpoint.parquet"
            )
            if v is None or not is_log:
                kept += 1
                continue
            if v < ckpt_version and (now - mtime) >= retention_seconds:
                doomed.append(name)
            else:
                kept += 1
                if ".checkpoint." in name and name.endswith(".parquet") and not name.endswith(
                    ".checkpoint.parquet"
                ):
                    try:
                        tbl = pq.read_table(
                            io.BytesIO(self.fs.read_bytes(self.fs.join(self.log_dir, name)))
                        )
                        if "sidecar" in tbl.column_names:
                            for sc in tbl.column("sidecar").to_pylist():
                                if sc and sc.get("path"):
                                    referenced.add(sc["path"])
                    except Exception:
                        keep_all_sidecars = True  # unreadable survivor
        for rel, mtime in entries:
            rel = rel.replace("\\", "/")
            if not rel.startswith("_sidecars/"):
                continue
            sc_name = rel.split("/", 1)[1]
            if (
                not keep_all_sidecars
                and sc_name not in referenced
                and (now - mtime) >= retention_seconds
            ):
                doomed.append(rel)
            else:
                kept += 1
        if not dry_run:
            for rel in doomed:
                try:
                    self.fs.delete(self.fs.join(self.log_dir, rel))
                except FileNotFoundError:
                    pass
        return {"deleted": sorted(doomed), "kept": kept, "cutoff_version": ckpt_version}

    def maybe_checkpoint(self, version: int, configuration: dict | None = None) -> None:
        interval = self.CHECKPOINT_INTERVAL
        raw = (configuration or {}).get("delta.checkpointInterval")
        if raw is not None:
            try:
                interval = max(1, int(raw))
            except (TypeError, ValueError):
                pass  # malformed property: keep the engine default
        if version > 0 and version % interval == 0:
            # delta.checkpointPolicy=v2: automatic checkpoints use the
            # v2Checkpoint layout (sidecar'd file manifest) — the protocol
            # property stock writers key the same decision on
            v2 = (
                str((configuration or {}).get("delta.checkpointPolicy", ""))
                .strip()
                .lower()
                == "v2"
            )
            try:
                self.write_checkpoint(v2=v2)
            except Exception:  # checkpointing is an optimization, never fatal
                pass

    # -- writing -----------------------------------------------------------

    def create_table(
        self,
        schema: T.StructType,
        partition_columns: list[str] | None = None,
        configuration: dict | None = None,
    ) -> TableMetadata:
        self.fs.makedirs(self.log_dir)
        if self._commit_versions():
            raise FileExistsError(f"table already exists at {self.table_path}")
        meta = TableMetadata(
            table_id=str(uuid.uuid4()),
            schema=schema,
            partition_columns=list(partition_columns or []),
            configuration=dict(configuration or {}),
        )
        # VARIANT / TIMESTAMP_NTZ columns require their reader-writer table
        # features (a stock reader that ignored them would misread the
        # physical encodings).
        type_feats = schema_type_features(schema)
        protocol = (
            {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(type_feats),
                "writerFeatures": sorted(type_feats),
            }
            if type_feats
            else {"minReaderVersion": 1, "minWriterVersion": 2}
        )
        actions = [
            {"protocol": protocol},
            {
                "metaData": {
                    "id": meta.table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": meta.partition_columns,
                    "configuration": meta.configuration,
                    "createdTime": int(time.time() * 1000),
                }
            },
        ]
        ict = None
        if str(
            (meta.configuration or {}).get("delta.enableInCommitTimestamps", "")
        ).lower() == "true":
            ict = int(time.time() * 1000)  # born-enabled table
        self.commit(
            0, actions, operation="CREATE TABLE", operation_params={},
            in_commit_timestamp=ict,
        )
        return meta

    def version_at_timestamp(self, ts_millis: int) -> int:
        """Latest version whose commit timestamp <= ts (Spark's
        ``timestampAsOf``).  A timestamp past the newest commit resolves to
        the newest version (delta-rs behavior); one before the first commit
        raises."""
        best: int | None = None
        for h in reversed(self.history()):  # oldest first
            t = h.get("timestamp") or 0
            if t <= ts_millis:
                best = h["version"]
            else:
                break
        if best is None:
            raise ValueError(
                f"timestamp {ts_millis} precedes the first commit of {self.table_path}"
            )
        return best

    def commit(
        self,
        version: int,
        actions: list,
        operation: str = "WRITE",
        operation_params: dict | None = None,
        in_commit_timestamp: int | None = None,
    ) -> int:
        """Write one commit file atomically; raises DeltaCommitConflict if the
        version is taken (optimistic concurrency, Delta protocol's
        put-if-absent).

        ``in_commit_timestamp``: when the table has in-commit timestamps
        enabled (``delta.enableInCommitTimestamps``), the caller passes the
        monotonicity-clamped timestamp and commitInfo carries it as the
        protocol's ``inCommitTimestamp`` field (``timestamp`` is kept equal
        so pre-ICT readers see the same clock)."""
        self.fs.makedirs(self.log_dir)
        info = {
            "timestamp": (
                in_commit_timestamp
                if in_commit_timestamp is not None
                else int(time.time() * 1000)
            ),
            "operation": operation,
            "operationParameters": operation_params or {},
            "engineInfo": "delta-sorter-spark/0.1.0",
        }
        if in_commit_timestamp is not None:
            info["inCommitTimestamp"] = in_commit_timestamp
        # operationMetrics (DESCRIBE HISTORY parity): derived generically
        # from this commit's own actions — no call-site plumbing.  Values
        # are strings, Delta's serialization.
        serialized = [a.to_json() if hasattr(a, "to_json") else a for a in actions]
        n_add = n_rm = n_cdc = 0
        bytes_out = 0
        rows_out: int | None = 0
        for d in serialized:
            if "add" in d:
                n_add += 1
                bytes_out += int(d["add"].get("size") or 0)
                stats = d["add"].get("stats")
                if isinstance(stats, str):
                    try:
                        stats = json.loads(stats)
                    except ValueError:
                        stats = None
                n = (stats or {}).get("numRecords") if isinstance(stats, dict) else None
                if n is None:
                    rows_out = None  # unknown for >=1 file: omit the metric
                elif rows_out is not None:
                    rows_out += int(n)
            elif "remove" in d:
                n_rm += 1
            elif "cdc" in d:
                n_cdc += 1
        if n_add or n_rm or n_cdc:
            metrics = {
                "numOutputFiles": str(n_add),
                "numRemovedFiles": str(n_rm),
                "numOutputBytes": str(bytes_out),
            }
            if rows_out is not None and n_add:
                metrics["numOutputRows"] = str(rows_out)
            if n_cdc:
                metrics["numCdcFiles"] = str(n_cdc)
            info["operationMetrics"] = metrics
        lines = [json.dumps({"commitInfo": info})]
        for d in serialized:
            lines.append(json.dumps(d))
        target = self.fs.join(self.log_dir, f"{version:020d}.json")
        data = ("\n".join(lines) + "\n").encode("utf-8")
        try:
            self.fs.put_if_absent(target, data)
        except FileExistsError as exc:
            raise DeltaCommitConflict(f"version {version} already committed") from exc
        return version

    def commit_with_retry(
        self,
        build_actions,
        operation: str = "WRITE",
        operation_params: dict | None = None,
        max_attempts: int = 10,
    ) -> int:
        """Re-reads the latest version and retries on conflict.  The callable
        ``build_actions(state)`` may inspect fresh state to rebuild its
        actions (Delta-Spark's optimistic-retry loop; the reference errors out
        instead, lib.rs:876-884 — we do better, per SURVEY §4)."""
        for _ in range(max_attempts):
            state = self.read_state()
            actions = build_actions(state)
            ict = self._next_in_commit_timestamp(state, actions)
            try:
                version = self.commit(
                    state.version + 1, actions, operation, operation_params,
                    in_commit_timestamp=ict,
                )
                self.maybe_checkpoint(
                    version,
                    state.metadata.configuration if state.metadata else None,
                )
                return version
            except DeltaCommitConflict:
                time.sleep(0.05)
        raise DeltaCommitConflict(f"gave up after {max_attempts} attempts")

    def _next_in_commit_timestamp(self, state, actions) -> int | None:
        """The monotonic timestamp for the NEXT commit when in-commit
        timestamps apply, else None.  ICT applies when the current state
        enables ``delta.enableInCommitTimestamps`` OR this very commit's
        metaData turns it on (the enablement commit must itself carry the
        field, per the protocol).  Monotonicity: strictly greater than the
        predecessor's timestamp even if this writer's clock runs behind —
        the property timestampAsOf resolution depends on under multi-writer
        clock skew."""

        def _enabled(cfg: dict) -> bool:
            return str(
                (cfg or {}).get("delta.enableInCommitTimestamps", "")
            ).lower() == "true"

        enabled = _enabled(state.metadata.configuration)
        if not enabled:
            for a in actions:
                m = a.get("metaData") if isinstance(a, dict) else None
                if m is not None and _enabled(m.get("configuration")):
                    enabled = True
                    break
        if not enabled:
            return None
        prev = state.last_commit_timestamp
        if prev is None:
            # replay started past the tip (checkpoint at the latest
            # version): one O(1) read of the newest commit file
            for a in self.commit_actions(state.version):
                if "commitInfo" in a:
                    ci = a["commitInfo"]
                    t = ci.get("inCommitTimestamp", ci.get("timestamp"))
                    prev = int(t) if t is not None else None
                    break
        now = int(time.time() * 1000)
        return max(now, (prev or 0) + 1)
