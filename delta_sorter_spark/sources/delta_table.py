"""Spark-facing Delta table wrapper: load, stage-write, commit.

Read path (reference S1-S3, lib.rs:252-254, 792-800): table state comes from
the transaction log; the DataFrame is built from the *active file list* with
``basePath`` so Hive-style partition columns are reconstructed, then cast to
the log's schema (partition-value directory names are strings; the metadata
schema is authoritative).  Scoping a read to a partition passes the pruned
file list — file-level partition pruning driven by the log, the same pruning
delta-rs does for the reference.

Write path (reference S5/S6, lib.rs:812-829): Spark writes parquet to a
staging directory under ``_staging/<uuid>`` (partitioned writers emit
``col=val/...`` dirs), files are moved into the table root, and exact
per-file stats for the requested columns are computed from the staged files
with pyarrow (column-pruned read).  The reference sizes files by buffer
rotation (advisory); we size by ``maxRecordsPerFile`` estimated from target
bytes, which Catalyst enforces during the write itself.

Commit (reference S7, lib.rs:856-885): callers assemble Add/Remove actions
and commit through the log's optimistic put-if-absent.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import shutil
import urllib.parse
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sorter_spark.functions.localframe import local_df
from delta_sorter_spark.sources.delta_log import (
    AddAction,
    DeltaLog,
    TableMetadata,
    TableState,
    schema_contains_variant,
)

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _serialize_stat(value):
    """JSON-safe stats value (Delta stores stats as JSON strings)."""
    if value is None:
        return None
    if hasattr(value, "item") and type(value).__module__ == "numpy":
        value = value.item()  # numpy scalar -> python scalar
    if hasattr(value, "to_pydatetime"):
        value = value.to_pydatetime()  # pandas Timestamp
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    if isinstance(value, decimal.Decimal):
        return str(value)
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
        return str(value)
    return value


def parse_stat(value, dtype: T.DataType):
    """Parse a JSON stats value back into a comparable Python value."""
    if value is None:
        return None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(value)
    if isinstance(dtype, T.DecimalType):
        return decimal.Decimal(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)) and isinstance(value, str):
        return float(value)
    return value


def serialize_partition_value(value) -> str | None:
    """Partition value -> Delta-log string form (None stays None)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    return str(value)


def _partition_values_from_relpath(relpath: str) -> dict[str, str | None]:
    """Parse ``k=v/k2=v2/file.parquet`` into serialized partition values."""
    values: dict[str, str | None] = {}
    for seg in relpath.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        v = urllib.parse.unquote(v)
        values[k] = None if v == HIVE_NULL else v
    return values


def directed_label(nulls_first: bool, directions: Sequence[bool] | None) -> str:
    """keyStats entry label for an ordering: ``nullsFirst``/``nullsLast``
    for the all-ascending order (the default entries every write attests),
    with a ``:adda``-style direction suffix (one char per key column,
    a=asc / d=desc) for directed orderings."""
    label = "nullsFirst" if nulls_first else "nullsLast"
    if directions is not None and not all(directions):
        label += ":" + "".join("a" if d else "d" for d in directions)
    return label


def _stats_from_arrow(
    tbl,
    stat_columns: Sequence[str],
    num_records: int | None = None,
    attest_directions: Sequence[bool] | None = None,
) -> dict:
    """Exact stats (min/max/nullCount + attested key-tuple stats for both
    null placements) from an in-memory Arrow table.  Shared by the local
    write path (column-pruned file re-read) and the remote writer (stats
    from the very table it just wrote — zero extra IO).

    ``attest_directions`` additionally attests the summary under that
    per-column direction vector (compact with ``col:desc`` keys), so later
    DIRECTED validations get the metadata fast path too — a surface the
    reference only roadmaps (README.md:183)."""
    import pyarrow.compute as pc

    from delta_sorter_spark.functions.file_summary import summarize_key_frame

    num_records = tbl.num_rows if num_records is None else num_records
    present = [c for c in stat_columns if c in tbl.column_names]
    stats = {"numRecords": num_records, "minValues": {}, "maxValues": {}, "nullCount": {}}
    if present and num_records > 0:
        for c in present:
            arr = tbl.column(c)
            nulls = arr.null_count
            stats["nullCount"][c] = nulls
            if nulls < num_records:
                stats["minValues"][c] = _serialize_stat(pc.min(arr).as_py())
                stats["maxValues"][c] = _serialize_stat(pc.max(arr).as_py())
        # Exact key-tuple attestation for both null placements: later
        # validation of these columns becomes metadata-only (SURVEY §4's
        # improvement over the reference's full scans, lib.rs:609-665).
        pdf = tbl.select(present).to_pandas()
        key_stats = {"cols": present}
        orderings: list[Sequence[bool] | None] = [None]
        if (
            attest_directions is not None
            and not all(attest_directions)
            and len(attest_directions) == len(present)
        ):
            orderings.append(list(attest_directions))
        for dirs in orderings:
            for nulls_first in (True, False):
                s = summarize_key_frame(pdf, present, nulls_first, dirs)
                key_stats[directed_label(nulls_first, dirs)] = {
                    "minKey": [_serialize_stat(v) for v in s["minKey"]],
                    "maxKey": [_serialize_stat(v) for v in s["maxKey"]],
                    "ascending": s["ascending"],
                    "descents": s["descents"],
                }
        stats["keyStats"] = key_stats
    return stats


def _file_stats(
    path: str,
    stat_columns: Sequence[str],
    attest_directions: Sequence[bool] | None = None,
) -> dict:
    """Exact per-file stats via a column-pruned pyarrow read.

    Parquet footer min/max can be truncated for long strings, and the
    boundary check (V3) needs exact values, so we read just the stat columns.
    This replaces the reference's *full-file* DataFusion scan (lib.rs:609-665)
    with a pruned local read at write time — after which validation is pure
    metadata."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    num_records = pf.metadata.num_rows
    present = [c for c in stat_columns if c in pf.schema_arrow.names]
    if not present or num_records == 0:
        return {
            "numRecords": num_records,
            "minValues": {},
            "maxValues": {},
            "nullCount": {},
        }
    return _stats_from_arrow(
        pf.read(columns=present), stat_columns, num_records, attest_directions
    )


def _writer_feature_upgrade(state, new_features: set[str]) -> dict | None:
    """Protocol action declaring ``new_features`` as writer table features,
    or None when already declared.  Bumps minWriterVersion to 7 and
    enumerates every legacy writer feature the table already uses (the
    table-features completeness rule: a features protocol that dropped
    them would stop stock writers enforcing them).  The reader version is
    untouched — callers use this only for writer-side features."""
    p = state.protocol or {}
    feats = set(p.get("writerFeatures") or [])
    if new_features <= feats:
        return None
    feats |= set(new_features)
    cfg = state.metadata.configuration
    if any(k.startswith("delta.constraints.") for k in cfg):
        feats.add("checkConstraints")
    if cfg.get("delta.columnMapping.mode") in ("name", "id"):
        feats.add("columnMapping")
    if str(cfg.get("delta.appendOnly", "")).lower() == "true":
        feats.add("appendOnly")
    if str(cfg.get("delta.enableChangeDataFeed", "")).lower() == "true":
        feats.add("changeDataFeed")
    for f in state.metadata.schema.fields:
        md = f.metadata or {}
        if any(k.startswith("delta.identity.") for k in md):
            feats.add("identityColumns")
        if "delta.generationExpression" in md:
            feats.add("generatedColumns")
        if "delta.invariants" in md:
            feats.add("invariants")
    proto = {
        "minReaderVersion": p.get("minReaderVersion", 1),
        "minWriterVersion": max(7, p.get("minWriterVersion", 2)),
        "writerFeatures": sorted(feats),
    }
    if p.get("readerFeatures") is not None:
        proto["readerFeatures"] = sorted(p["readerFeatures"])
    return {"protocol": proto}


def stats_columns_for(
    meta: "TableMetadata",
    prop: str = "delta.dataSkippingStatsColumns",
) -> list[str]:
    """Table-configured zone-map columns (Delta's
    ``delta.dataSkippingStatsColumns``, comma-separated logical names).
    ``create(stat_columns=...)`` records them; every ``stage_write``
    unions them into its per-call stat columns.

    When the explicit list is absent, Delta's
    ``delta.dataSkippingNumIndexedCols`` is honored: the first N
    leaf-eligible schema columns (orderable scalars — no VARIANT, no
    nested/array/map/binary) get zone maps.  Unlike stock Delta this
    engine does NOT default N to 32 — stats are opt-in (write cost is
    explicit) — but a table that sets the property gets the stock
    behavior."""
    cfg = meta.configuration or {}
    raw = cfg.get(prop, "")
    cols = [c.strip() for c in raw.split(",") if c.strip()]
    if cols:
        return cols
    raw_n = cfg.get("delta.dataSkippingNumIndexedCols")
    if raw_n is None:
        return []
    try:
        n = int(str(raw_n).strip())
    except ValueError:
        return []  # malformed: keep the engine's opt-in default
    if n <= 0:
        return []
    out: list[str] = []
    for f in meta.schema.fields:
        if len(out) >= n:
            break
        if isinstance(
            f.dataType,
            (
                T.NumericType,
                T.StringType,
                T.DateType,
                T.TimestampType,
                T.TimestampNTZType,
                T.BooleanType,
            ),
        ):
            out.append(f.name)
    return out


def _parse_size_bytes(raw: str | None) -> int | None:
    """``delta.targetFileSize`` -> bytes.  Delta's syntax is a byte count
    as a string; size suffixes (b/kb/mb/gb, case-insensitive, 1024-based)
    are accepted for operator convenience.  Absent -> None (no cap).  A
    present-but-unparseable value raises so every later write doesn't
    silently ignore the operator's intent."""
    if raw is None or str(raw).strip() == "":
        return None
    s = str(raw).strip().lower()
    mult = 1
    for suffix, m in (("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)].strip(), m
            break
    try:
        n = int(s)
    except ValueError:
        raise ValueError(
            f"unparseable delta.targetFileSize {raw!r}: expected a byte "
            "count (optionally suffixed b/kb/mb/gb) — fix with "
            "set_table_properties({'delta.targetFileSize': '134217728'})"
        ) from None
    if n <= 0:
        raise ValueError(f"delta.targetFileSize must be positive, got {raw!r}")
    return n * mult


def _parse_retention_interval(raw: str | None) -> float:
    """``delta.deletedFileRetentionDuration`` -> seconds (Delta's
    ``interval N weeks|days|hours|minutes|seconds|milliseconds`` syntax;
    case-insensitive, singular or plural units).  Absent -> 0.0 (the engine
    default).  A present-but-unparseable value raises: silently treating
    ``interval 1 week`` (Delta's documented default) as ZERO retention
    would let vacuum delete files in-flight readers still reference."""
    if not raw:
        return 0.0
    prop = "delta.deletedFileRetentionDuration"
    repair = (
        f" — fix with set_table_properties({{{prop!r}:"
        " 'interval N <unit>'}})"
    )
    parts = str(raw).strip().lower().split()
    if len(parts) != 3 or parts[0] != "interval":
        raise ValueError(
            f"unparseable {prop} {raw!r}: expected"
            f" 'interval N <unit>'{repair}"
        )
    try:
        n = float(parts[1])
    except ValueError:
        raise ValueError(
            f"unparseable {prop} {raw!r}: non-numeric count{repair}"
        ) from None
    unit = parts[2].rstrip("s")
    seconds = {
        "week": 7 * 86400.0,
        "day": 86400.0,
        "hour": 3600.0,
        "minute": 60.0,
        "second": 1.0,
        "millisecond": 0.001,
    }
    if unit not in seconds:
        raise ValueError(
            f"unparseable {prop} {raw!r}: unknown unit"
            f" {parts[2]!r} (expected week/day/hour/minute/second/"
            f"millisecond){repair}"
        )
    return n * seconds[unit]


_READER_WRITER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    "typeWidening",
    "v2Checkpoint",
    "variantType",
}


def _reader_writer_feature_upgrade(state, feature: str) -> dict | None:
    """Protocol action declaring a READER-writer table feature (reader
    protocol 3 / writer 7, feature in BOTH lists), or None when already
    declared.  When the reader version first bumps to 3, the reader list
    enumerates every reader-relevant feature the table already uses (the
    same completeness rule _writer_feature_upgrade applies to writers)."""
    proto = dict(state.protocol or {})
    writer_up = _writer_feature_upgrade(state, {feature})
    if writer_up is not None:
        proto = writer_up["protocol"]
    reader_feats = set(proto.get("readerFeatures") or [])
    if feature in reader_feats and writer_up is None:
        return None
    reader_feats |= _READER_WRITER_FEATURES & set(proto.get("writerFeatures") or [])
    reader_feats.add(feature)
    return {
        "protocol": {
            "minReaderVersion": max(3, proto.get("minReaderVersion", 1)),
            "minWriterVersion": max(7, proto.get("minWriterVersion", 2)),
            "readerFeatures": sorted(reader_feats),
            "writerFeatures": sorted(set(proto.get("writerFeatures") or [])),
        }
    }


def _dv_keys(add: AddAction, sidecar: str) -> set[str]:
    """Candidate sidecar lookup keys for a file.  Normally just the
    table-relative ``add.path``; for shallow clones (absolute add.path) also
    the SOURCE-relative form, with the source root two levels above the
    sidecar (<src>/_deletion_vectors/<name>)."""
    keys = {add.path}
    if os.path.isabs(add.path):
        src_root = os.path.dirname(os.path.dirname(sidecar))
        keys.add(os.path.relpath(add.path, src_root).replace(os.sep, "/"))
    return keys


def _is_protocol_dv(dv: dict) -> bool:
    """True for protocol-shaped descriptors (storageType u/i/p + roaring
    bitmap payload); False for this engine's earlier sidecar formats
    ({"storagePath": ...} parquet datasets / JSON maps)."""
    return "storageType" in dv and "storagePath" not in dv


def read_dv_bytes(table_path: str, rel: str) -> bytes:
    """Read a deletion-vector payload addressed by ``rel`` — the ONE place
    that resolves all four locality cases, shared by the driver-side and
    executor-side decode paths:

    - ``rel`` is itself a remote URI (a shallow clone's "p" descriptor
      pointing into a remote SOURCE table): resolved through fs directly;
    - ``rel`` is an absolute local path (local clone source): opened as-is;
    - ``table_path`` is remote: ``rel`` joins under the table's store;
    - both local: plain join under the table directory."""
    from delta_sorter_spark.sources.fs import is_remote_uri, resolve

    if is_remote_uri(rel):
        parent, name = rel.rsplit("/", 1)
        fsobj, base = resolve(parent)
        return fsobj.read_bytes(fsobj.join(base, name))
    if os.path.isabs(rel):
        with open(rel, "rb") as fh:
            return fh.read()
    if is_remote_uri(table_path):
        fsobj, base = resolve(table_path)
        return fsobj.read_bytes(fsobj.join(base, rel))
    with open(os.path.join(table_path, rel), "rb") as fh:
        return fh.read()


def write_dv_bytes(table_path: str, rel: str, data: bytes) -> None:
    """Write a deletion-vector payload at ``rel`` under the table root —
    the write-side sibling of :func:`read_dv_bytes` (new vectors always
    land inside their own table, so only table locality matters).  Safe
    from executors: resolves fs per call."""
    from delta_sorter_spark.sources.fs import is_remote_uri, resolve

    if is_remote_uri(table_path):
        fsobj, base = resolve(table_path)
        fsobj.write_bytes(fsobj.join(base, rel), data)
    else:
        with open(os.path.join(table_path, rel), "wb") as fh:
            fh.write(data)


def _protocol_dv_positions(table_path: str, dv: dict) -> set[int]:
    """Decode a protocol-shaped deletion vector's positions (roaring.py)."""
    from delta_sorter_spark.sources.roaring import positions_from_descriptor

    return set(
        positions_from_descriptor(dv, lambda rel: read_dv_bytes(table_path, rel))
    )


def dv_sidecar_positions(table_path: str, add: AddAction) -> set[int]:
    """Deleted row positions for one file (empty if no DV).  Handles the
    standard Delta-protocol encoding (roaring bitmap bins, storageType
    u/i/p — sources/roaring.py) plus both legacy sidecar encodings: parquet
    ``(path, pos)`` datasets and the single-JSON map.
    Remote table URIs resolve the sidecar through sources/fs.py."""
    import json as _json

    from delta_sorter_spark.sources.fs import is_remote_uri, resolve

    if not add.deletion_vector:
        return set()
    if _is_protocol_dv(add.deletion_vector):
        return _protocol_dv_positions(table_path, add.deletion_vector)
    if is_remote_uri(table_path):
        import io as _io

        import pyarrow.parquet as _pq

        fsobj, base = resolve(table_path)
        sidecar = fsobj.join(base, add.deletion_vector["storagePath"])
        keys = _dv_keys(add, sidecar)
        part_names = [n for n in fsobj.list_dir(sidecar) if n.endswith(".parquet")]
        if part_names:  # parquet dataset directory
            out: set[int] = set()
            for n in part_names:
                tbl = _pq.read_table(
                    _io.BytesIO(fsobj.read_bytes(fsobj.join(sidecar, n))),
                    columns=["path", "pos"],
                )
                for path_val, pos in zip(
                    tbl["path"].to_pylist(), tbl["pos"].to_pylist()
                ):
                    if path_val in keys:
                        out.add(int(pos))
            return out
        positions = _json.loads(fsobj.read_text(sidecar))
        for k in [add.path, *keys]:
            if k in positions:
                return set(positions[k])
        return set()
    sidecar = os.path.join(table_path, add.deletion_vector["storagePath"])
    keys = _dv_keys(add, sidecar)
    if os.path.isdir(sidecar):  # parquet dataset
        import pyarrow.dataset as ds

        files = [
            os.path.join(sidecar, n)
            for n in os.listdir(sidecar)
            if n.endswith(".parquet")
        ]
        if not files:
            return set()
        dataset = ds.dataset(files, format="parquet")
        for k in keys:
            tbl = dataset.to_table(filter=ds.field("path") == k, columns=["pos"])
            if tbl.num_rows:
                return set(tbl["pos"].to_pylist())
        return set()
    with open(sidecar) as fh:
        positions = _json.load(fh)
    for k in [add.path, *keys]:
        if k in positions:
            return set(positions[k])
    return set()


class DeltaTable:
    """One Delta table, addressed by local path or object-store URI.

    URI support is split by plane (the reference's URI addressing,
    main.rs:13-15):

    - **metadata plane** (state/history/time travel/ALTER/commits) goes
      through ``DeltaLog`` + sources/fs.py and works against ``s3://``
      natively (conditional-PUT commits; moto-tested);
    - **validation** of remote tables also works end-to-end: the attested
      metadata fast path needs no data reads at all, and the scan path
      reads each file via pyarrow's native S3 filesystem from executors
      (``fs.pyarrow_open_input``) — no Spark connector jars required;
    - **bulk data plane** on ``s3://`` (and azure://, gs://) works
      end-to-end with NO connector jars: reads go through the Python Data
      Source (full snapshots, time travel, pruned file subsets via its
      ``files`` option, file-path and raw row-position columns via
      ``withFilePath``/``withPositions`` — so partition-aware compaction's
      log-driven pruning AND every DML verb work remotely), writes through
      the executor-side pyarrow/REST ``stage_write`` /
      ``write_parquet_dataset``.  ``memory://`` is metadata-plane only
      (per-process store)."""

    def __init__(self, spark: SparkSession, table_path: str):
        from delta_sorter_spark.sources.fs import is_remote_uri

        self.spark = spark
        self.is_remote = is_remote_uri(table_path)
        self.table_path = (
            table_path.rstrip("/") if self.is_remote else os.path.abspath(table_path)
        )
        self.log = DeltaLog(self.table_path)

    def _require_shared_remote_store(self, op: str) -> None:
        """The bulk data plane runs on EXECUTORS; only stores every process
        can reach qualify (s3/azure/gs).  memory:// is a per-process dict —
        an executor write would land in the python worker's memory and
        vanish, leaving committed Add actions that point at objects no
        reader can see — so it stays a metadata/log-plane test backend."""
        if self.is_remote and not self.table_path.startswith(
            ("s3://", "azure://", "gs://")
        ):
            raise NotImplementedError(
                f"{op} on {self.table_path!r}: bulk data-plane IO needs a "
                "cross-process object store (s3://, azure://, gs://); "
                "memory:// is a per-process store for metadata-plane tests "
                "(executor-side data writes/reads would not be visible "
                "across processes)"
            )

    def _require_local(self, op: str) -> None:
        if self.is_remote:
            raise NotImplementedError(
                f"{op} on remote table URI {self.table_path!r}: the bulk data "
                "plane reads/writes parquet through Spark, which needs the "
                "scheme's filesystem connector jars (not present in this "
                "environment); metadata operations and validate-only work "
                "natively"
            )

    # -- creation ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        table_path: str,
        df: DataFrame,
        partition_columns: Sequence[str] | None = None,
        stat_columns: Sequence[str] | None = None,
        generated_columns: dict[str, tuple[str, str]] | None = None,
        identity_columns: dict[str, tuple[int, int]] | None = None,
    ) -> "DeltaTable":
        """Create a new table from a DataFrame (test/fixture convenience —
        the reference creates tables via delta-rs writers in its tests).

        ``generated_columns`` maps name -> (DDL type, SQL expression) — the
        Delta protocol's generated columns (``delta.generationExpression``
        in the field metadata).  They are computed from ``df`` here and on
        every later append where the writer omits them; a writer that DOES
        supply a value must supply the expression's value (enforced with the
        CHECK-constraint pass).  The canonical use is a derived partition
        key (e.g. a date extracted from a timestamp) that partition pruning
        can then use without every writer re-deriving it by hand.

        ``identity_columns`` maps name -> (start, step) — Delta's GENERATED
        ALWAYS AS IDENTITY.  Values are allocated engine-side on every
        append (writers must NOT supply them); uniqueness at scale comes
        from partition-offset allocation (no global coordination per row),
        so ids land on the start+k*step grid but with gaps, exactly Delta's
        contract.  The high watermark advances in the same commit as the
        data files, read from the new files' stats (zero extra jobs)."""
        table = cls(spark, table_path)
        partition_columns = list(partition_columns or [])
        gen = dict(generated_columns or {})
        ident = dict(identity_columns or {})
        fields = [
            f for f in df.schema.fields if f.name not in gen and f.name not in ident
        ]
        for name, (ddl, expr) in gen.items():
            dtype = T._parse_datatype_string(ddl)
            fields.append(
                T.StructField(
                    name, dtype, True, {"delta.generationExpression": expr}
                )
            )
            df = df.withColumn(name, F.expr(expr).cast(dtype))
        for name, (start, step) in ident.items():
            if step == 0:
                raise ValueError("identity step must be non-zero")
            fields.append(
                T.StructField(
                    name,
                    T.LongType(),
                    True,
                    {
                        "delta.identity.start": int(start),
                        "delta.identity.step": int(step),
                        "delta.identity.highWaterMark": int(start) - int(step),
                    },
                )
            )
        schema = T.StructType(fields)
        stat_columns = list(stat_columns or []) + [
            c for c in ident if c not in (stat_columns or [])
        ]
        by_name = {f.name: f for f in schema.fields}
        bad = [
            c
            for c in stat_columns
            if c in by_name and schema_contains_variant(by_name[c].dataType)
        ]
        if bad:
            raise ValueError(
                f"VARIANT columns have no min/max ordering; cannot be stat "
                f"columns: {', '.join(bad)}"
            )
        # Persist the stat set as table configuration (Delta's
        # dataSkippingStatsColumns) so every later write — appends, DML
        # rewrites, compaction — keeps these zone maps without the call
        # site re-listing them (stage_write unions them in).
        configuration = (
            {cls.STATS_COLUMNS_PROP: ",".join(stat_columns)}
            if stat_columns
            else None
        )
        table.log.create_table(schema, partition_columns, configuration=configuration)
        df = table._assign_identity_columns(df, schema)
        adds = table.stage_write(df, stat_columns=stat_columns)
        meta_action = table._identity_meta_action(schema, adds, partition_columns)
        table.log.commit_with_retry(
            lambda state: ([meta_action] if meta_action else []) + list(adds),
            operation="WRITE",
            operation_params={"mode": "Append"},
        )
        return table

    @classmethod
    def convert_to_delta(
        cls,
        spark: SparkSession,
        table_path: str,
        stat_columns: Sequence[str] | None = None,
    ) -> "DeltaTable":
        """CONVERT TO DELTA: adopt an existing plain-parquet directory
        (flat or Hive-partitioned) in place — write a ``_delta_log`` whose
        first data commit Adds every existing parquet file; no data bytes
        move.  Schema and partition columns come from Spark's own parquet
        reader (partition-directory discovery types the partition keys).

        ``stat_columns`` computes per-file min/max zone maps during the
        convert (one footer-level read per file); omit them and run the
        cheaper path now, then CLI ``--attest`` later to make ordering
        validation metadata-only — the same backfill foreign-written
        tables use.

        Local paths only (the conversion enumerates and footer-reads files
        through the local fs; remote-URI adoption would ship bytes through
        the driver) — mirrors the reference's own local-first CLI."""
        from delta_sorter_spark.sources.fs import is_remote_uri

        if is_remote_uri(table_path):
            raise NotImplementedError(
                "convert_to_delta supports local paths only; copy or "
                "re-register remote data with create()/append()"
            )
        table = cls(spark, table_path)
        if table.log.exists():
            raise FileExistsError(
                f"{table_path} already has a _delta_log — nothing to convert"
            )
        data_files: list[str] = []
        for root, dirs, names in os.walk(table_path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for name in names:
                if name.endswith(".parquet") and not name.startswith(("_", ".")):
                    rel = os.path.relpath(os.path.join(root, name), table_path)
                    data_files.append(rel.replace(os.sep, "/"))
        if not data_files:
            raise FileNotFoundError(f"no parquet files under {table_path}")
        df = spark.read.option("basePath", table_path).parquet(table_path)
        schema = df.schema
        part_cols = sorted(
            {
                seg.partition("=")[0]
                for rel in data_files
                for seg in rel.split("/")[:-1]
                if "=" in seg
            }
        )
        stat_columns = list(stat_columns or [])
        configuration = (
            {cls.STATS_COLUMNS_PROP: ",".join(stat_columns)}
            if stat_columns
            else None
        )
        table.log.create_table(schema, part_cols, configuration=configuration)
        paths = [os.path.join(table_path, rel) for rel in data_files]
        stats_by_dest = (
            table._local_file_stats(paths, stat_columns, None)
            if stat_columns
            else {}
        )
        adds = [
            AddAction(
                path=rel,
                size=os.path.getsize(p),
                partition_values=_partition_values_from_relpath(rel),
                modification_time=int(os.path.getmtime(p) * 1000),
                data_change=True,
                stats=stats_by_dest.get(p),
            )
            for rel, p in zip(data_files, paths)
        ]
        table.log.commit_with_retry(
            lambda state: list(adds),
            operation="CONVERT",
            operation_params={"numFiles": str(len(adds))},
        )
        return table

    # -- identity columns (GENERATED ALWAYS AS IDENTITY) --------------------

    @staticmethod
    def _identity_fields(schema: T.StructType) -> dict[str, tuple[int, int, int]]:
        """name -> (start, step, highWaterMark) for identity fields."""
        out = {}
        for f in schema.fields:
            md = f.metadata or {}
            if "delta.identity.start" in md:
                start = int(md["delta.identity.start"])
                step = int(md.get("delta.identity.step", 1))
                hwm = int(md.get("delta.identity.highWaterMark", start - step))
                out[f.name] = (start, step, hwm)
        return out

    def _assign_identity_columns(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Allocate identity values above the watermark without global
        coordination: ``monotonically_increasing_id`` is unique within the
        write (partition ordinal in the high bits), so
        ``hwm + step * (mid + 1)`` is unique, on-grid, and > hwm for every
        row — the distributed-allocation contract (gaps allowed)."""
        for name, (_start, step, hwm) in self._identity_fields(schema).items():
            if name in df.columns:
                raise ValueError(
                    f"identity column {name!r} is GENERATED ALWAYS — "
                    "writers must not supply it"
                )
            df = df.withColumn(
                name,
                (
                    F.lit(hwm)
                    + F.lit(step) * (F.monotonically_increasing_id() + F.lit(1))
                ).cast("long"),
            )
        return df

    def _identity_meta_action(
        self,
        schema: T.StructType,
        adds: Sequence[AddAction],
        partition_columns: Sequence[str],
        configuration: dict | None = None,
    ) -> dict | None:
        """metaData action advancing identity high watermarks to the max
        value in the new files' stats (committed atomically with them)."""
        import json as _json
        import time as _time

        from delta_sorter_spark.sources.delta_log import physical_name

        ids = self._identity_fields(schema)
        if not ids:
            return None
        changed = False
        fields = []
        for f in schema.fields:
            md = dict(f.metadata or {})
            if f.name in ids:
                phys = physical_name(f)
                vals = [
                    int(a.stats["maxValues"][phys])
                    for a in adds
                    if a.stats and phys in a.stats.get("maxValues", {})
                ]
                if vals and max(vals) > ids[f.name][2]:
                    md["delta.identity.highWaterMark"] = max(vals)
                    changed = True
            fields.append(T.StructField(f.name, f.dataType, f.nullable, md))
        if not changed:
            return None
        meta = self.metadata
        return {
            "metaData": {
                "id": meta.table_id,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                "partitionColumns": list(partition_columns),
                "configuration": configuration
                if configuration is not None
                else meta.configuration,
                "createdTime": int(_time.time() * 1000),
            }
        }

    # -- state -------------------------------------------------------------

    def state(self, version: int | None = None) -> TableState:
        return self.log.read_state(at_version=version)

    @property
    def metadata(self) -> TableMetadata:
        return self.state().metadata

    def history(self) -> list[dict]:
        """Commit history, newest first (DESCRIBE HISTORY shape)."""
        return self.log.history()

    def detail(self, version: int | None = None) -> dict:
        """Table summary in Delta's DESCRIBE DETAIL shape — one dict from
        the replayed snapshot alone (zero scan tasks, no extra IO): id,
        location, partition columns, numFiles, sizeInBytes, properties,
        protocol, plus the engine's DV accounting (files carrying deletion
        vectors and the total soft-deleted row count)."""
        state = self.state(version=version)
        meta = state.metadata
        dv_files = 0
        dv_rows = 0
        for a in state.adds:
            dv = a.deletion_vector
            if dv:
                dv_files += 1
                dv_rows += int(dv.get("cardinality") or 0)
        return {
            "format": "delta",
            "id": meta.table_id,
            "location": self.table_path,
            "partitionColumns": list(meta.partition_columns),
            "numFiles": len(state.adds),
            "sizeInBytes": sum(a.size for a in state.adds),
            "properties": dict(meta.configuration or {}),
            "minReaderVersion": (state.protocol or {}).get(
                "minReaderVersion"
            ),
            "minWriterVersion": (state.protocol or {}).get(
                "minWriterVersion"
            ),
            "version": state.version,
            "numFilesWithDeletionVectors": dv_files,
            "numDeletedRecords": dv_rows,
            "tableFeatures": sorted(
                set((state.protocol or {}).get("readerFeatures") or [])
                | set((state.protocol or {}).get("writerFeatures") or [])
            ),
            "checkConstraints": dict(meta.check_constraints),
            "clusteringColumns": self.clustering_columns(state),
            "rowIdHighWaterMark": (
                state.row_id_high_water_mark
                if self.row_tracking_enabled(meta)
                else None
            ),
        }

    # -- read --------------------------------------------------------------

    def version_at_timestamp(self, ts) -> int:
        """Version active at a wall-clock time (Spark's ``timestampAsOf``).
        Accepts a datetime, an ``int`` in epoch millis, or a
        ``'YYYY-MM-DD HH:MM:SS'`` string (local time)."""
        import datetime as _dt

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            ts = int(ts.timestamp() * 1000)
        return self.log.version_at_timestamp(int(ts))

    def to_df(
        self,
        adds: Sequence[AddAction] | None = None,
        version: int | None = None,
        timestamp=None,
        where: str | None = None,
    ) -> DataFrame:
        """DataFrame over the active files (or an explicit pruned subset).

        ``version`` time-travels: the file list comes from replaying the log
        only up to that commit (Spark's ``versionAsOf`` / delta-rs
        ``load_version``) — O(log) metadata work, no data copies, because
        rewritten files are tombstoned rather than deleted until vacuum.
        ``timestamp`` is ``timestampAsOf``: resolved to the last version
        committed at or before that time, then identical.

        ``where`` applies a SQL predicate with STATS-BASED FILE SKIPPING
        (functions/skipping.py): files whose zone maps prove no row can
        match are never scheduled, then the predicate is re-applied exactly
        on the survivors — same result as ``.where(...)`` on a full scan,
        minus the tasks.  On a compact-sorted or z-ordered 100 TB table a
        selective range predicate drops to the few overlapping files."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass either version or timestamp, not both")
            version = self.version_at_timestamp(timestamp)
        if where is not None:
            # zone-map + Bloom pruning composed ONCE, in files_matching —
            # every planner (this read, the DML hit scans, the streaming
            # source) goes through the same stage order and fail-safety
            pruned = self.files_matching(where, version=version, adds=adds)
            # pass the pruned list as an explicit subset (pins the snapshot
            # on the remote path too), then re-apply the predicate exactly
            return self.to_df(adds=pruned, version=version).where(where)
        if self.is_remote:
            return self._to_df_remote(version=version, adds=adds)
        state = self.state(version=version)
        meta = state.metadata
        use = state.adds if adds is None else list(adds)
        if not use:
            return local_df(self.spark, [], meta.schema)
        plain = [a for a in use if not a.deletion_vector]
        dv = [a for a in use if a.deletion_vector]
        parts = []
        if plain:
            parts.append(self._read_files(plain, meta))
        if dv:
            parts.append(self._read_dv_files(dv, meta))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def files_matching(
        self, predicate: str, version: int | None = None, bloom: bool = True,
        adds: Sequence[AddAction] | None = None,
    ) -> list[AddAction]:
        """Active files whose zone maps (and, with ``bloom``, any registered
        Bloom indexes — operators/bloom_index.py) admit ``predicate`` — the
        planner's view of a pruned read (``to_df(where=...)`` delegates
        here, so the stage order and fail-safety live in ONE place).
        ``to_df(adds=table.files_matching(p)).where(p)`` is exactly
        ``to_df(where=p)``; exposed separately so maintenance code can
        reason about (or act on) the file subset itself, e.g. schedule a
        targeted rewrite of the files a hot predicate touches.  ``adds``
        restricts the pruning to an explicit candidate subset."""
        from delta_sorter_spark.functions.skipping import prune_adds

        state = self.state(version=version)
        kept = prune_adds(
            state.adds if adds is None else list(adds), predicate,
            state.metadata.schema, state.metadata.partition_columns,
        )
        if bloom:
            from delta_sorter_spark.operators.bloom_index import bloom_prune_adds

            kept = bloom_prune_adds(self, kept, predicate, state.metadata)
        return kept

    def stream_df(
        self,
        where: str | None = None,
        skip_change_commits: bool = False,
        change_feed: bool = False,
    ) -> DataFrame:
        """Streaming read of this table (``readStream`` through the Python
        Data Source), exactly-once composable with ``foreachBatch`` +
        ``append(txn_app_id=...)``.

        ``where`` filters with zone-map file skipping pushed into the
        source's planner (its ``where`` option prunes each micro-batch's
        new files by their log stats — functions/skipping.py) and the
        predicate re-applied exactly on the rows.  A CDC consumer watching
        one key range of a high-volume table schedules tasks only for the
        files that range can touch.  ``skip_change_commits`` maps to the
        source option of the same name (compaction rewrites skipped rather
        than erroring).  ``change_feed=True`` streams the CHANGE FEED
        instead (``readChangeFeed`` option): rows tagged
        ``_change_type``/``_commit_version`` with the
        ``operators/dml.table_changes`` semantics — exclusive with the
        other two parameters."""
        import json as _json

        from delta_sorter_spark.sources.fs import capture_aws_env
        from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

        try:
            self.spark.dataSource.register(DeltaStreamDataSource)
        except Exception:
            pass  # already registered
        reader = (
            self.spark.readStream.format("delta_sorter")
            .option("path", self.table_path)
            .option("awsEnv", _json.dumps(capture_aws_env()))
        )
        if change_feed:
            if skip_change_commits or where is not None:
                raise ValueError(
                    "change_feed=True cannot combine with where/"
                    "skip_change_commits"
                )
            return reader.option("readChangeFeed", "true").load()
        if skip_change_commits:
            reader = reader.option("skipChangeCommits", "true")
        if where is not None:
            reader = reader.option("where", where)
        df = reader.load()
        return df.where(where) if where is not None else df

    def _to_df_remote(
        self,
        version=None,
        adds=None,
        with_file_path=False,
        with_positions=False,
        extra_fields=None,
    ) -> DataFrame:
        """Remote read path: the Python Data Source scans file bytes via
        pyarrow's object-store filesystems on the workers (no connector
        jars).  A pruned ``adds`` subset ships as the source's ``files``
        option (JSON list of {path, partitionValues, deletionVector} spec
        objects) — the log-driven file pruning partition-aware compaction
        and DML rely on (reference lib.rs:795-809 scopes the same way via
        partition SQL)."""
        self._require_shared_remote_store("to_df")
        import json as _json

        from delta_sorter_spark.sources.fs import capture_aws_env
        from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

        try:
            self.spark.dataSource.register(DeltaStreamDataSource)
        except Exception:
            pass  # already registered
        reader = (
            self.spark.read.format("delta_sorter")
            .option("path", self.table_path)
            # the source's planner runs in a python worker without the
            # driver's current env — ship the AWS settings along
            .option("awsEnv", _json.dumps(capture_aws_env()))
        )
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        if with_file_path:
            # jar-free stand-in for F.input_file_name(), which is empty
            # under Python Data Sources (remote DML's file-hit detection)
            reader = reader.option("withFilePath", "true")
        if with_positions:
            # raw positional scan (file path + physical row index, DVs NOT
            # applied) — the jar-free parquet _metadata.row_index
            reader = reader.option("withPositions", "true")
        if extra_fields:
            # out-of-schema physical passthrough columns (e.g. materialized
            # row-tracking columns) — files lacking them yield NULLs
            reader = reader.option(
                "extraColumns",
                _json.dumps(T.StructType(list(extra_fields)).jsonValue()),
            )
        if adds is not None:
            # ship self-contained file specs (path + partition values + DV
            # descriptor), not bare paths: the planner then reads EXACTLY
            # these files without re-checking membership in the current
            # snapshot — matching local to_df(adds=...) semantics, so a
            # concurrent rewrite between planning and read is resolved at
            # commit time (ConcurrentRewriteError) instead of hard-aborting
            # the scan, and no extra log replay happens here
            by_path = {a.path: a for a in adds}
            specs = [
                {
                    "path": a.path,
                    "partitionValues": a.partition_values,
                    **(
                        {"deletionVector": a.deletion_vector}
                        if a.deletion_vector
                        else {}
                    ),
                }
                for a in (by_path[p] for p in sorted(by_path))
            ]
            reader = reader.option("files", _json.dumps(specs))
        return reader.load()

    def _base_for(self, add: AddAction) -> str:
        """Partition-discovery base for one file.  Relative adds live under
        this table; absolute adds (shallow clones) keep their source table's
        root, recovered by stripping the file name plus one ``k=v`` directory
        per partition value — so clones of clones and multi-source unions
        each read against the right base."""
        if not os.path.isabs(add.path):
            return self.table_path
        base = os.path.dirname(add.path)
        for _ in add.partition_values:
            base = os.path.dirname(base)
        return base

    def _physical_fields(self, meta) -> list[tuple[str, T.StructField]]:
        from delta_sorter_spark.sources.delta_log import physical_name

        return [(physical_name(f), f) for f in meta.schema.fields]

    def _read_files(self, adds: Sequence[AddAction], meta) -> DataFrame:
        # Read with the authoritative log schema: files written before a
        # schema evolution lack the newer columns and yield NULLs (exactly
        # Delta's mergeSchema read semantics), partition columns fill from
        # the directory values, and the footer-sampling schema pass is
        # skipped.  Files carry PHYSICAL column names (column mapping);
        # the final select casts and maps back to logical names.
        phys = self._physical_fields(meta)
        read_schema = T.StructType(
            [T.StructField(p, f.dataType, True) for p, f in phys]
        )
        groups: dict[str, list[str]] = {}
        for a in adds:
            groups.setdefault(self._base_for(a), []).append(
                os.path.join(self.table_path, a.path)
            )
        parts = []
        for base, files in groups.items():
            reader = self.spark.read.schema(read_schema)
            if meta.partition_columns:
                reader = reader.option("basePath", base)
            df = reader.parquet(*files)
            # Cast to the authoritative log schema (partition dirs are
            # strings; Spark's partition inference may disagree with the log).
            parts.append(
                df.select(*[F.col(p).cast(f.dataType).alias(f.name) for p, f in phys])
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def scan_with_positions(
        self, adds: Sequence[AddAction], meta=None, extra_fields=None
    ) -> DataFrame:
        """Raw scan of the given files with two extra columns: ``__file__``
        (absolute file URI) and ``__pos__`` (physical row index inside that
        file), from the native parquet ``_metadata`` column — vectorized
        and splittable, no Python in the row path.  NOTE: raw = existing
        deletion vectors are NOT applied here.  Remote tables take the
        Python Data Source's ``withPositions`` path (Arrow-vectorized,
        one task per file).  ``extra_fields``: out-of-schema physical
        passthrough columns (e.g. the materialized row-tracking columns);
        files lacking one yield NULLs on both paths."""
        if self.is_remote:
            from delta_sorter_spark.streaming.delta_source import FILE_COL, POS_COL

            df = self._to_df_remote(
                adds=adds, with_positions=True, extra_fields=extra_fields
            )
            base = self.table_path.rstrip("/") + "/"
            return df.withColumn(
                "__file__", F.concat(F.lit(base), F.col(FILE_COL))
            ).drop(FILE_COL).withColumnRenamed(POS_COL, "__pos__")
        meta = meta or self.metadata
        if extra_fields:
            meta = TableMetadata(
                table_id=meta.table_id,
                schema=T.StructType(
                    list(meta.schema.fields) + list(extra_fields)
                ),
                partition_columns=meta.partition_columns,
                configuration=meta.configuration,
            )
        phys = self._physical_fields(meta)
        read_schema = T.StructType(
            [T.StructField(p, f.dataType, True) for p, f in phys]
        )
        groups: dict[str, list[str]] = {}
        for a in adds:
            groups.setdefault(self._base_for(a), []).append(
                os.path.join(self.table_path, a.path)
            )
        parts = []
        for base, files in groups.items():
            reader = self.spark.read.schema(read_schema)
            if meta.partition_columns:
                reader = reader.option("basePath", base)
            parts.append(
                reader.parquet(*files).select(
                    F.col("_metadata.file_path").alias("__file__"),
                    F.col("_metadata.row_index").alias("__pos__"),
                    *[F.col(p).cast(f.dataType).alias(f.name) for p, f in phys],
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_deletion_vector(self, add: AddAction) -> set[int]:
        """Deleted row positions for one file (empty if no DV)."""
        return dv_sidecar_positions(self.table_path, add)

    def _roaring_positions_df(
        self,
        specs: Sequence[tuple[str, dict]],
        restrict: DataFrame | None = None,
    ) -> DataFrame:
        """(key, protocol DV descriptor) -> DataFrame(path=key, pos long).

        The roaring bins decode EXECUTOR-side (one task per batch of specs,
        local open or object-store GET); the driver only ships the O(files)
        spec list, so a wide merge-on-read scan never funnels deleted-row
        positions through one process.

        ``restrict`` (a single-column ``path`` DataFrame) filters the spec
        list BEFORE the decode stage — mapInPandas blocks predicate
        pushdown, so a caller that only needs a few files' positions (e.g.
        a one-row delete on a heavily-DV'd table) must prune here or pay a
        GET + bitmap decode for every vector in the table."""
        import json as _json

        from delta_sorter_spark.sources.fs import capture_aws_env

        table_path = self.table_path
        aws_env = capture_aws_env() if self.is_remote else None
        rows = [(k, _json.dumps(d)) for k, d in specs]

        def decode(batches):
            import json as _j

            import pandas as pd

            from delta_sorter_spark.sources.delta_table import read_dv_bytes
            from delta_sorter_spark.sources.fs import apply_aws_env
            from delta_sorter_spark.sources.roaring import positions_from_descriptor

            if aws_env:
                apply_aws_env(aws_env)

            def read(rel):
                return read_dv_bytes(table_path, rel)

            for b in batches:
                keys, poss = [], []
                for key, dvj in zip(b["path"], b["dv"]):
                    for pos in positions_from_descriptor(_j.loads(dvj), read):
                        keys.append(key)
                        poss.append(pos)
                yield pd.DataFrame(
                    {
                        "path": pd.Series(keys, dtype="object"),
                        "pos": pd.Series(poss, dtype="int64"),
                    }
                )

        df = local_df(self.spark, rows, "path string, dv string")
        if restrict is not None:
            df = df.join(restrict.select("path").distinct(), "path", "left_semi")
        n = max(1, min(len(rows), self.spark.sparkContext.defaultParallelism))
        return df.repartition(n).mapInPandas(decode, "path string, pos long")

    def _read_dv_files(
        self, adds: Sequence[AddAction], meta, keep_file_col: bool = False
    ) -> DataFrame:
        """Merge-on-read: scan files that carry a deletion vector and drop
        the deleted row positions.  Fully JVM-side — the scan exposes
        ``_metadata.row_index`` (native parquet row numbering, vectorized,
        splittable), and the DV positions arrive as an anti-join.  Parquet
        sidecars are read as a distributed dataset (positions never pass
        through the driver — a 1%-of-100TB delete stays executor-side);
        legacy JSON sidecars, which are small by construction, load
        driver-side.  AQE picks a broadcast anti-join when the DV side is
        small, which is the common case.

        ``keep_file_col=True`` retains the scan's ``__file__`` (absolute
        file URI from ``_metadata.file_path``).  Callers that need each
        row's origin file MUST use this rather than ``input_file_name()``
        on the result: the positional anti-join severs the file-scan
        lineage and input_file_name() silently yields '' there."""
        json_pairs: list[tuple[str, int]] = []  # (absolute file uri, row_index)
        pq_sidecars: dict[str, list[tuple[str, str]]] = {}  # sidecar -> (key, uri)
        roaring_specs: list[tuple[str, dict]] = []  # (uri, protocol descriptor)
        for a in adds:
            if not a.deletion_vector:
                continue
            uri = "file:" + os.path.join(self.table_path, a.path)
            if _is_protocol_dv(a.deletion_vector):
                roaring_specs.append((uri, a.deletion_vector))
                continue
            sp = a.deletion_vector["storagePath"]
            sidecar = os.path.join(self.table_path, sp)
            if os.path.isdir(sidecar):
                # both candidate keys: add.path verbatim (post-clone deletes
                # store it as-is) and the source-relative form (clone source
                # sidecars)
                for k in _dv_keys(add=a, sidecar=sidecar):
                    pq_sidecars.setdefault(sp, []).append((k, uri))
            else:
                json_pairs += [(uri, int(p)) for p in self.read_deletion_vector(a)]
        dv_parts: list[DataFrame] = []
        if json_pairs:
            dv_parts.append(
                F.broadcast(
                    local_df(self.spark, 
                        json_pairs, "__file__ string, __pos__ long"
                    )
                )
            )
        for sp, pairs in pq_sidecars.items():
            sdf = self.spark.read.parquet(os.path.join(self.table_path, sp))
            key_to_uri = local_df(self.spark, pairs, "path string, __file__ string")
            dv_parts.append(
                sdf.join(F.broadcast(key_to_uri), "path").select(
                    "__file__", F.col("pos").alias("__pos__")
                )
            )
        if roaring_specs:
            dv_parts.append(
                self._roaring_positions_df(roaring_specs).select(
                    F.col("path").alias("__file__"), F.col("pos").alias("__pos__")
                )
            )
        scan = self.scan_with_positions(adds, meta)
        cols = [F.col(f.name) for f in meta.schema.fields]
        if keep_file_col:
            cols = [F.col("__file__")] + cols
        if not dv_parts:
            return scan.select(*cols)
        dv_df = dv_parts[0]
        for p in dv_parts[1:]:
            dv_df = dv_df.unionByName(p)
        kept = scan.join(dv_df, ["__file__", "__pos__"], "left_anti")
        return kept.select(*cols)

    def input_files(self) -> list[str]:
        return [os.path.join(self.table_path, a.path) for a in self.state().adds]

    # -- write -------------------------------------------------------------

    def stage_write(
        self,
        df: DataFrame,
        stat_columns: Sequence[str] | None = None,
        target_file_size_bytes: int | None = None,
        data_change: bool = True,
        sorted_within_files: bool = False,
        schema: T.StructType | None = None,
        attest_directions: Sequence[bool] | None = None,
    ) -> list[AddAction]:
        """Write ``df``'s data as new parquet files inside the table directory
        and return their Add actions.  Does NOT commit — callers compose the
        commit with removes (reference rewrite_partition_tx, lib.rs:812-855).

        ``target_file_size_bytes`` is enforced via ``maxRecordsPerFile``
        estimated from the input's bytes-per-row; on a cluster this bounds
        output file size without an extra repartition (the sort's range
        partitioning already spread the data).

        ``schema`` overrides the log schema for the write — used by
        ``append(..., merge_schema=True)`` which commits the widened schema
        atomically with these files.

        Stat columns are the caller's union the table's configured
        ``delta.dataSkippingStatsColumns`` (set by ``create``), so EVERY
        write path — appends, compaction rewrites, copy-on-write DML —
        keeps the zone maps alive without each call site re-listing them.
        Without this, an UPDATE rewriting a file would silently drop the
        stats that to_df(where=...) and the DML planners prune on.
        """
        from delta_sorter_spark.sources.delta_log import physical_name

        configured = self.stats_columns()
        if configured:
            stat_columns = list(stat_columns or [])
            stat_columns += [c for c in configured if c not in stat_columns]
        if target_file_size_bytes is None:
            # delta.targetFileSize: the table-level default every write
            # path honors (appends, DML rewrites, compaction); an explicit
            # argument wins
            target_file_size_bytes = _parse_size_bytes(
                (self.metadata.configuration or {}).get("delta.targetFileSize")
            )
        if self.is_remote:
            return self._stage_write_remote(
                df,
                stat_columns=stat_columns,
                target_file_size_bytes=target_file_size_bytes,
                data_change=data_change,
                sorted_within_files=sorted_within_files,
                schema=schema,
                attest_directions=attest_directions,
            )
        meta = self.metadata
        part_cols = meta.partition_columns
        write_schema = schema if schema is not None else meta.schema
        data_cols = [f.name for f in write_schema.fields if f.name not in part_cols]
        staging = os.path.join(self.table_path, "_staging", uuid.uuid4().hex)

        # Files store PHYSICAL column names (column mapping): identical to
        # logical until a rename, after which new files keep writing the
        # original physical name so all file-level stats stay comparable.
        to_phys = {f.name: physical_name(f) for f in write_schema.fields}
        writer = df.select(
            *[F.col(c).alias(to_phys.get(c, c)) for c in part_cols + data_cols]
        ).write.mode("overwrite")
        if target_file_size_bytes:
            max_records = self._estimate_max_records(df, target_file_size_bytes)
            if max_records:
                writer = writer.option("maxRecordsPerFile", max_records)
        if part_cols:
            writer = writer.partitionBy(*[to_phys.get(c, c) for c in part_cols])
        writer.parquet(staging)

        adds: list[AddAction] = []
        stat_columns = [to_phys.get(c, c) for c in (stat_columns or [])]
        moved: list[tuple[str, str]] = []  # (dest abspath, table-relative path)
        for root, _dirs, names in os.walk(staging):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                rel = os.path.relpath(src, staging)
                dest = os.path.join(self.table_path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(src, dest)
                moved.append(
                    (dest, os.path.relpath(dest, self.table_path).replace(os.sep, "/"))
                )
        if schema_contains_variant(write_schema):
            # this pyarrow build cannot parse footers containing the VARIANT
            # logical type — stats come from Spark's own reader instead
            stats_by_dest = self._spark_file_stats(
                [d for d, _ in moved], stat_columns, attest_directions
            )
        else:
            stats_by_dest = self._local_file_stats(
                [d for d, _ in moved], stat_columns, attest_directions
            )
        for dest, relpath in moved:
            stats = stats_by_dest[dest]
            if sorted_within_files:
                stats["sortedBy"] = list(stat_columns)
            adds.append(
                AddAction(
                    path=relpath,
                    size=os.path.getsize(dest),
                    partition_values=_partition_values_from_relpath(relpath),
                    modification_time=int(os.path.getmtime(dest) * 1000),
                    data_change=data_change,
                    stats=stats,
                )
            )
        # Remove only THIS write's staging dir — concurrent partition
        # rewrites stage under sibling uuid dirs (lib.rs:209-224 concurrency).
        shutil.rmtree(staging, ignore_errors=True)
        try:
            os.rmdir(os.path.join(self.table_path, "_staging"))
        except OSError:
            pass  # other writers still staging
        return adds

    def cdf_enabled(self, metadata=None) -> bool:
        """True when ``delta.enableChangeDataFeed`` is set — DML verbs then
        materialize row-level change data (protocol ``cdc`` actions)."""
        meta = metadata if metadata is not None else self.metadata
        return (
            str(
                (meta.configuration or {}).get("delta.enableChangeDataFeed", "")
            ).lower()
            == "true"
        )

    def stage_cdc_write(self, df: DataFrame) -> list[dict]:
        """Write change rows (the table's columns plus ``_change_type``) as
        parquet under ``_change_data/`` and return the protocol ``cdc``
        actions (AddCDCFile) for the caller's commit.  CDC files are NOT
        part of table state (replay ignores them; checkpoints never carry
        them) — only change-feed readers open them, and VACUUM protects
        them while their commit json is still in the log.

        Cites the Delta protocol "Add CDC File" section: path,
        partitionValues, size, dataChange=false.  Partitioned tables lay
        change files out Hive-style like data files so a feed read prunes
        on partition values."""
        if self.is_remote:
            # capability gate (same plane as VARIANT): remote-URI staged
            # CDC writes need the remote writer path; enable CDF on remote
            # tables is refused rather than silently degraded
            raise NotImplementedError(
                "change-data-feed writes on remote table URIs are not "
                "supported; disable delta.enableChangeDataFeed or use a "
                "local path"
            )
        from delta_sorter_spark.sources.delta_log import physical_name

        meta = self.metadata
        part_cols = meta.partition_columns
        data_cols = [
            f.name for f in meta.schema.fields if f.name not in part_cols
        ]
        to_phys = {f.name: physical_name(f) for f in meta.schema.fields}
        staging = os.path.join(self.table_path, "_staging", uuid.uuid4().hex)
        cols = [
            F.col(c).alias(to_phys.get(c, c)) for c in part_cols + data_cols
        ]
        cols.append(F.col("_change_type"))
        writer = df.select(*cols).write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*[to_phys.get(c, c) for c in part_cols])
        writer.parquet(staging)
        actions: list[dict] = []
        for root, _dirs, names in os.walk(staging):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                rel = os.path.relpath(src, staging)
                dest = os.path.join(self.table_path, "_change_data", rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(src, dest)
                relpath = os.path.relpath(dest, self.table_path).replace(
                    os.sep, "/"
                )
                actions.append(
                    {
                        "cdc": {
                            "path": relpath,
                            "partitionValues": _partition_values_from_relpath(
                                relpath
                            ),
                            "size": os.path.getsize(dest),
                            "dataChange": False,
                        }
                    }
                )
        shutil.rmtree(staging, ignore_errors=True)
        try:
            os.rmdir(os.path.join(self.table_path, "_staging"))
        except OSError:
            pass
        return actions

    # Below this many staged files a driver-side column-pruned read beats a
    # Spark job round trip; at/above it, stats fan out as one distributed
    # job.  Crossover rationale: a pruned stat-column read of one freshly
    # written (page-cached) file is single-digit milliseconds, while one
    # Spark job costs a few hundred ms fixed — so ~64 sequential reads ≈
    # one job.  The 100 TB failure mode this guards (a strict compact
    # staging thousands of files serializing stat IO through the driver)
    # is far past the threshold either way.
    _DIST_STATS_MIN_FILES = 64

    def _local_file_stats(
        self,
        paths: Sequence[str],
        stat_columns: Sequence[str],
        attest_directions: Sequence[bool] | None,
    ) -> dict[str, dict]:
        """Per-file stats for freshly staged local files, keyed by path.

        Small writes read on the driver; larger writes fan the column-pruned
        pyarrow reads out as ONE Spark job over the file list (only O(files)
        stat rows return to the driver, never file data).  This keeps the
        engine's hottest write path — strict compact / partition rewrites /
        DML, the reference core's rewrite_partition_tx (lib.rs:812-855) —
        from serializing stat IO through a single process when a 100 TB
        rewrite stages tens of thousands of files.  Mirrors the remote
        writer, which computes stats executor-side from the Arrow tables it
        writes (``_stage_write_remote``)."""
        if len(paths) < self._DIST_STATS_MIN_FILES:
            return {p: _file_stats(p, stat_columns, attest_directions) for p in paths}
        import json as _json

        stat_cols = list(stat_columns)
        dirs = list(attest_directions) if attest_directions else None

        def compute(batches):
            import pandas as pd

            from delta_sorter_spark.sources.delta_table import _file_stats as fstats

            for b in batches:
                yield pd.DataFrame(
                    {
                        "path": b["path"],
                        "stats": [
                            _json.dumps(fstats(p, stat_cols, dirs))
                            for p in b["path"]
                        ],
                    }
                )

        n_slices = min(len(paths), self.spark.sparkContext.defaultParallelism)
        rows = (
            local_df(self.spark, [(p,) for p in paths], "path string")
            .repartition(n_slices)
            .mapInPandas(compute, "path string, stats string")
            .collect()
        )
        return {r["path"]: _json.loads(r["stats"]) for r in rows}

    def _spark_file_stats(
        self,
        paths: Sequence[str],
        stat_columns: Sequence[str],
        attest_directions: Sequence[bool] | None,
    ) -> dict[str, dict]:
        """Per-file stats via SPARK's parquet reader — the fallback for
        files whose footers this pyarrow build cannot parse (VARIANT
        logical type).  Stat columns are never variant (create() rejects
        that), so each file's stat frame collects through ``toArrow`` —
        a single-file, shuffle-free scan, collected in partition-index =
        byte-offset order, i.e. file order, which the keyStats descent
        attestation requires — and feeds the SAME summarizer as the
        pyarrow path, so the stats shape is identical."""
        out: dict[str, dict] = {}
        for p in paths:
            df = self.spark.read.parquet(p)
            present = [c for c in stat_columns if c in df.columns]
            if not present:
                out[p] = {
                    "numRecords": df.count(),
                    "minValues": {},
                    "maxValues": {},
                    "nullCount": {},
                }
                continue
            tbl = df.select(*present).toArrow()
            out[p] = _stats_from_arrow(
                tbl, list(stat_columns), tbl.num_rows, attest_directions
            )
        return out

    def _stage_write_remote(
        self,
        df: DataFrame,
        stat_columns: Sequence[str] | None = None,
        target_file_size_bytes: int | None = None,
        data_change: bool = True,
        sorted_within_files: bool = False,
        schema: T.StructType | None = None,
        attest_directions: Sequence[bool] | None = None,
    ) -> list[AddAction]:
        """Remote-URI write path: each Spark partition serializes itself to
        parquet in memory and PUTs the object straight from the executor via
        sources/fs.py (no Hadoop connector jars, no driver data transfer).
        Stats — including the exact key-tuple attestation — come from the
        Arrow table being written (zero extra IO).  Write-then-commit makes
        this protocol-safe under task retries: only objects referenced by
        the committed Add actions exist as far as readers are concerned;
        stray retry outputs are invisible and vacuumable."""
        self._require_shared_remote_store("stage_write")
        import json as _json
        import time as _time

        from pyspark.sql.pandas.types import to_arrow_type

        from delta_sorter_spark.sources.delta_log import physical_name

        meta = self.metadata
        part_cols = meta.partition_columns
        write_schema = schema if schema is not None else meta.schema
        if schema_contains_variant(write_schema):
            raise NotImplementedError(
                "VARIANT columns on remote URIs need a pyarrow build that "
                "understands the parquet VARIANT logical type (the remote "
                "plane serializes through arrow); local tables support them"
            )
        data_cols = [f.name for f in write_schema.fields if f.name not in part_cols]
        to_phys = {f.name: physical_name(f) for f in write_schema.fields}
        phys_part = [to_phys.get(c, c) for c in part_cols]
        phys_data = [to_phys.get(c, c) for c in data_cols]
        out = df.select(
            *[F.col(c).alias(to_phys.get(c, c)) for c in part_cols + data_cols]
        )
        stat_cols = [to_phys.get(c, c) for c in (stat_columns or [])]
        attest_dirs = list(attest_directions) if attest_directions else None
        # pin the parquet physical types to the logical schema (a pandas
        # round trip would otherwise write e.g. ns timestamps)
        arrow_types = {
            to_phys.get(f.name, f.name): to_arrow_type(f.dataType)
            for f in write_schema.fields
            if f.name in data_cols
        }
        table_path = self.table_path
        max_records = (
            self._estimate_max_records(df, target_file_size_bytes)
            if target_file_size_bytes
            else None
        )
        from delta_sorter_spark.sources.fs import capture_aws_env

        aws_env = capture_aws_env()

        def write_partition(batches):
            import io as _io
            import uuid as _uuid
            import urllib.parse as _up

            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            from delta_sorter_spark.sources.delta_table import (
                HIVE_NULL,
                _stats_from_arrow,
                serialize_partition_value,
            )
            from delta_sorter_spark.sources.fs import apply_aws_env, resolve

            apply_aws_env(aws_env)
            pdfs = list(batches)
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            if len(pdf) == 0:
                return
            fsobj, base = resolve(table_path)
            if phys_part:
                grouped = pdf.groupby(phys_part, dropna=False, sort=False)
                groups = [(k if isinstance(k, tuple) else (k,), g) for k, g in grouped]
            else:
                groups = [((), pdf)]
            out_rows = []
            target_schema = pa.schema(
                [(c, arrow_types[c]) for c in phys_data]
            )
            for keyvals, g in groups:
                pv: dict = {}
                segs = []
                for c, v in zip(phys_part, keyvals):
                    sv = serialize_partition_value(None if pd.isna(v) else v)
                    pv[c] = sv
                    segs.append(
                        f"{c}={HIVE_NULL if sv is None else _up.quote(sv, safe='')}"
                    )
                prefix = "/".join(segs) + "/" if segs else ""
                gdata = g[phys_data]
                step = max_records or len(gdata)
                for i in range(0, len(gdata), max(step, 1)):
                    chunk = gdata.iloc[i:i + step]
                    tbl = pa.Table.from_pandas(
                        chunk, preserve_index=False
                    ).cast(target_schema)
                    buf = _io.BytesIO()
                    pq.write_table(tbl, buf)
                    data = buf.getvalue()
                    rel = f"{prefix}part-{_uuid.uuid4().hex}.parquet"
                    fsobj.write_bytes(fsobj.join(base, rel), data)
                    out_rows.append(
                        {
                            "path": rel,
                            "size": len(data),
                            "stats": _json.dumps(
                                _stats_from_arrow(
                                    tbl, stat_cols,
                                    attest_directions=attest_dirs,
                                )
                            ),
                            "pv": _json.dumps(pv),
                        }
                    )
            yield pd.DataFrame(out_rows, columns=["path", "size", "stats", "pv"])

        rows = out.mapInPandas(
            write_partition, "path string, size long, stats string, pv string"
        ).collect()  # one row per WRITTEN FILE — O(files), not O(data)
        now_ms = int(_time.time() * 1000)
        adds: list[AddAction] = []
        for r in rows:
            stats = _json.loads(r["stats"])
            if sorted_within_files:
                stats["sortedBy"] = list(stat_cols)
            adds.append(
                AddAction(
                    path=r["path"],
                    size=int(r["size"]),
                    partition_values=_json.loads(r["pv"]),
                    modification_time=now_ms,
                    data_change=data_change,
                    stats=stats,
                )
            )
        return adds

    OPTIMIZE_WRITE_PROP = "delta.autoOptimize.optimizeWrite"

    def append(
        self,
        df: DataFrame,
        merge_schema: bool = False,
        stat_columns: Sequence[str] | None = None,
        txn_app_id: str | None = None,
        txn_version: int | None = None,
        return_committed: bool = False,
        optimize_write: bool | None = None,
    ) -> int | tuple[int, bool]:
        """Append rows, optionally evolving the schema (Delta's
        ``mergeSchema`` write): new columns in ``df`` widen the table schema
        in the SAME commit as the data files, so readers see either the old
        schema or (new schema + new data) — never a torn state.  Columns the
        table has but ``df`` lacks are filled with NULLs; new columns are
        nullable by construction, so old files read as NULL for them
        (to_df reads with the log schema).  Returns the commit version.

        ``txn_app_id``/``txn_version`` make the append IDEMPOTENT (Delta's
        SetTransaction action): if the log already records this appId at or
        past this version, the write is a no-op — the exactly-once handle
        for streaming foreachBatch sinks replaying a batch after restart.

        ``return_committed=True`` returns ``(version, committed)`` where
        ``committed`` says whether THIS call's build landed.  Callers doing
        exactly-once accounting need this flag, not the log: when a twin
        worker commits the same (appId, version) first, the loser's
        returned version carries a txn marker identical to its own, so
        re-reading the commit cannot distinguish winner from loser."""
        import json as _json
        import time as _time

        if (txn_app_id is None) != (txn_version is None):
            raise ValueError("txn_app_id and txn_version must be passed together")
        state0 = self.state()
        if (
            txn_app_id is not None
            and state0.txns.get(txn_app_id, -1) >= txn_version
        ):
            # already applied — skip before staging
            return (state0.version, False) if return_committed else state0.version
        meta = state0.metadata
        existing = {f.name for f in meta.schema.fields}
        extra = [f for f in df.schema.fields if f.name not in existing]
        if extra and not merge_schema:
            raise ValueError(
                f"DataFrame has columns not in the table schema: "
                f"{[f.name for f in extra]} (pass merge_schema=True to evolve)"
            )
        write_schema = meta.schema
        meta_action = None
        if extra:
            write_schema = T.StructType(
                list(meta.schema.fields)
                + [T.StructField(f.name, f.dataType, True) for f in extra]
            )
            meta_action = {
                "metaData": {
                    "id": meta.table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _json.dumps(write_schema.jsonValue()),
                    "partitionColumns": meta.partition_columns,
                    "configuration": meta.configuration,
                    "createdTime": int(_time.time() * 1000),
                }
            }
        gen = {
            f.name: f.metadata["delta.generationExpression"]
            for f in write_schema.fields
            if f.metadata and "delta.generationExpression" in f.metadata
        }
        defaults = {
            f.name: f.metadata["CURRENT_DEFAULT"]
            for f in write_schema.fields
            if f.metadata and "CURRENT_DEFAULT" in f.metadata
        }

        def fill(f):
            if f.name in df.columns:
                return F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in gen:  # generated: compute, don't NULL-fill
                return F.expr(gen[f.name]).cast(f.dataType).alias(f.name)
            if f.name in defaults:  # column DEFAULT (allowColumnDefaults)
                return F.expr(defaults[f.name]).cast(f.dataType).alias(f.name)
            return F.lit(None).cast(f.dataType).alias(f.name)

        df = self._assign_identity_columns(df, write_schema)
        filled = df.select(*[fill(f) for f in write_schema.fields])
        # writer-supplied values for generated columns must equal the
        # expression (same single-pass check as CHECK constraints)
        gen_checks = {
            f"generated column {name}": (
                f"CAST(({expr}) AS {write_schema[name].dataType.simpleString()})"
                f" <=> {name}"
            )
            for name, expr in gen.items()
            if name in df.columns
        }
        self._enforce_constraints(filled, {**meta.write_constraints, **gen_checks})
        alloc = self._identity_fields(write_schema)
        if alloc:
            stat_columns = list(stat_columns or []) + [
                c for c in alloc if c not in (stat_columns or [])
            ]
        # Optimized write for clustered tables (Delta's
        # delta.autoOptimize.optimizeWrite, param overrides the property):
        # the batch curve-lays ITSELF out and lands as its own (small)
        # ZCube, so ingest contributes clustering instead of deferring all
        # of it to OPTIMIZE — which then only merges partial cubes.  Costs
        # one shuffle of the batch (batch-sized, not table-sized).
        ow = optimize_write
        if ow is None:
            ow = str(
                (meta.configuration or {}).get(self.OPTIMIZE_WRITE_PROP, "")
            ).lower() == "true"
        cluster_cols = self.clustering_columns(state0) if ow else []
        if cluster_cols:
            from delta_sorter_spark.operators.cluster import COLS_TAG, _curve_layout

            # Size the curve shuffle to the BATCH, not the session default:
            # stage_write lands ~one file per partition, so letting the
            # layout fall back to spark.sql.shuffle.partitions (200) would
            # spray a small append into up to 200 tiny files — the opposite
            # of what optimizeWrite exists for (delta-spark likewise sizes
            # the shuffle to the batch).  The incoming plan's partition
            # count is a free upper bound on the batch's parallelism.
            n_in = max(1, filled.rdd.getNumPartitions())
            filled = _curve_layout(
                filled, cluster_cols, bits=8, num_partitions=n_in
            )
            stat_columns = list(stat_columns or []) + [
                c for c in cluster_cols if c not in (stat_columns or [])
            ]
        adds = self.stage_write(filled, stat_columns=stat_columns, schema=write_schema)
        if cluster_cols:
            import dataclasses as _dc

            zcube_id = uuid.uuid4().hex
            attest = ",".join(meta.physical_names(cluster_cols))
            adds = [
                _dc.replace(
                    a,
                    clustering_provider=self.CLUSTERING_PROVIDER,
                    tags={
                        **(a.tags or {}),
                        self.ZCUBE_TAG: zcube_id,
                        COLS_TAG: attest,
                    },
                )
                for a in adds
            ]
        identity_action = self._identity_meta_action(
            write_schema, adds, meta.partition_columns
        )
        if identity_action is not None:
            meta_action = identity_action  # supersedes (includes any evolution)
        params = {"mode": "Append"}
        if extra:
            params["mergeSchema"] = "true"

        class _AlreadyApplied(Exception):
            pass

        fresh_ids = [a for a in adds if a.base_row_id is None]

        def build(state):
            # txn race: another writer committed this (appId, version) after
            # our pre-staging check — drop our staged files, change nothing.
            if (
                txn_app_id is not None
                and state.txns.get(txn_app_id, -1) >= txn_version
            ):
                raise _AlreadyApplied
            # identity allocation is optimistic: if another writer advanced
            # a watermark we allocated from, our staged ids may collide —
            # fail rather than duplicate (single-allocator-per-table model).
            current = self._identity_fields(state.metadata.schema)
            for name, (_s, _st, hwm) in alloc.items():
                if name in current and current[name][2] != hwm:
                    raise ConcurrentRewriteError(
                        f"identity watermark of {name!r} moved concurrently"
                    )
            actions = ([meta_action] if meta_action else []) + list(adds)
            actions += self._fresh_row_id_actions(state, fresh_ids)
            if txn_app_id is not None:
                actions.append(
                    {"txn": {"appId": txn_app_id, "version": int(txn_version)}}
                )
            return actions

        try:
            version = self.log.commit_with_retry(
                build, operation="WRITE", operation_params=params
            )
            return (version, True) if return_committed else version
        except _AlreadyApplied:
            self.discard_files(adds)
            latest = self.log.latest_version()
            return (latest, False) if return_committed else latest

    # -- CHECK constraints (Delta protocol: delta.constraints.<name>) -------

    @staticmethod
    def _enforce_constraints(df: DataFrame, constraints: dict[str, str]) -> None:
        """Reject the write if any row violates any CHECK constraint.  SQL
        CHECK semantics: NULL predicate results pass; only FALSE violates.
        All constraints are counted in ONE aggregation job (not one scan per
        constraint); at scale this is a single extra pass over the incoming
        batch, before any file is staged."""
        if not constraints:
            return
        names = list(constraints)
        counts = df.select(
            *[
                F.sum(
                    F.when(
                        ~F.coalesce(F.expr(expr), F.lit(True)), F.lit(1)
                    ).otherwise(F.lit(0))
                ).alias(name)
                for name, expr in constraints.items()
            ]
        ).collect()[0]
        bad = {n: counts[n] for n in names if counts[n]}
        if bad:
            detail = ", ".join(
                f"{n} CHECK ({constraints[n]}): {c} row(s)" for n, c in bad.items()
            )
            raise ValueError(f"CHECK constraint violation — {detail}")

    def set_table_properties(
        self, props: dict, operation: str = "SET TBLPROPERTIES"
    ) -> int:
        """ALTER TABLE ... SET TBLPROPERTIES: merge ``props`` into table
        configuration in one metadata commit (a value of None removes the
        key).  Free-form keys per the Delta protocol; used by the bloom
        index registry and available for deployment-specific tagging.

        Interval-valued protocol properties are validated HERE, not only at
        use time: a malformed ``delta.deletedFileRetentionDuration`` would
        otherwise commit cleanly and then fail every later checkpoint write
        and vacuum on a table that was healthy when configured."""
        import json as _json
        import time as _time

        ret = props.get("delta.deletedFileRetentionDuration")
        if ret is not None:
            _parse_retention_interval(str(ret))  # raises with repair hint
        tfs = props.get("delta.targetFileSize")
        if tfs is not None:
            _parse_size_bytes(str(tfs))  # raises with repair hint
        enables_cdf = (
            str(props.get("delta.enableChangeDataFeed", "")).lower() == "true"
        )

        def actions(state):
            config = dict(state.metadata.configuration)
            for key, value in props.items():
                if value is None:
                    config.pop(key, None)
                else:
                    config[key] = str(value)
            acts = []
            if enables_cdf:
                # protocol rule: a stock writer must not touch a CDF table
                # without writing change data — declare the writer feature
                # in the same commit that flips the property
                upgrade = _writer_feature_upgrade(state, {"changeDataFeed"})
                if upgrade is not None:
                    acts.append(upgrade)
            return acts + [
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(
                            state.metadata.schema.jsonValue()
                        ),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            ]

        return self.log.commit_with_retry(
            actions,
            operation=operation,
            operation_params={"properties": sorted(props)},
        )

    def enable_in_commit_timestamps(self) -> int:
        """Enable the Delta protocol's in-commit timestamps (writer table
        feature ``inCommitTimestamp``, ``delta.enableInCommitTimestamps``):
        every later commit carries a MONOTONIC ``inCommitTimestamp`` in its
        commitInfo — strictly greater than the predecessor's even when a
        writer's clock runs behind — and ``timestampAsOf`` / DESCRIBE
        HISTORY resolve against it.  Without the feature, multi-writer
        clock skew can make commit timestamps non-monotonic and time travel
        by timestamp lands on the wrong version.

        The enablement commit itself carries the field (protocol rule), and
        the enablement-provenance properties record where the ICT era
        starts.  Returns the commit version; idempotent."""
        import json as _json
        import time as _time

        if str(
            self.metadata.configuration.get("delta.enableInCommitTimestamps", "")
        ).lower() == "true":
            return self.log.latest_version()

        def actions(state):
            config = dict(state.metadata.configuration)
            config["delta.enableInCommitTimestamps"] = "true"
            config["delta.inCommitTimestampEnablementVersion"] = str(
                state.version + 1
            )
            config["delta.inCommitTimestampEnablementTimestamp"] = str(
                int(_time.time() * 1000)
            )
            acts = []
            upgrade = _writer_feature_upgrade(state, {"inCommitTimestamp"})
            if upgrade is not None:
                acts.append(upgrade)
            acts.append(
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(
                            state.metadata.schema.jsonValue()
                        ),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            )
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="SET TBLPROPERTIES",
            operation_params={"properties": ["delta.enableInCommitTimestamps"]},
        )

    # -- Clustered tables (Delta ``clusteredTable`` writer feature) ----------

    CLUSTERING_DOMAIN = "delta.clustering"
    CLUSTERING_PROVIDER = "liquid"
    ZCUBE_TAG = "deltaSorter.zcubeId"

    def set_clustering_columns(self, cols: Sequence[str]) -> int:
        """Declare ``cols`` as the table's clustering columns (Delta clustered
        tables, a.k.a. liquid clustering): writer features ``clusteredTable``
        + ``domainMetadata`` and the ``delta.clustering`` domain holding the
        PHYSICAL column names, per the protocol's Clustered Table spec.

        Registration is metadata-only — existing files stay as they are
        (unclustered, i.e. no ``clusteringProvider``) and become candidates
        for the next :func:`~delta_sorter_spark.operators.cluster.optimize_clustered`,
        which is where the incremental layout work happens.  Appends keep
        landing unclustered (cheap ingest); OPTIMIZE folds them in.
        Idempotent for the same column list; pass a new list to re-cluster
        on different keys (existing ZCubes are treated as unclustered by the
        next OPTIMIZE because their attested clustering columns differ)."""
        import json as _json

        meta = self.metadata
        if meta.partition_columns:
            raise ValueError(
                "clustered tables replace Hive partitioning (Delta protocol: "
                "a clustered table must not be partitioned); this table "
                f"partitions by {', '.join(meta.partition_columns)}"
            )
        for c in cols:
            if c not in meta.schema.fieldNames():
                raise ValueError(f"clustering column not in schema: {c}")
        physical = [meta.physical_of(c) for c in cols]
        domain_conf = _json.dumps({"clusteringColumns": [[p] for p in physical]})
        if self.state().domain_metadata.get(self.CLUSTERING_DOMAIN) == domain_conf:
            return self.log.latest_version()

        def actions(state):
            if state.domain_metadata.get(self.CLUSTERING_DOMAIN) == domain_conf:
                return []  # already registered with the same columns
            acts = []
            upgrade = _writer_feature_upgrade(
                state, {"clusteredTable", "domainMetadata"}
            )
            if upgrade is not None:
                acts.append(upgrade)
            acts.append(
                {
                    "domainMetadata": {
                        "domain": self.CLUSTERING_DOMAIN,
                        "configuration": domain_conf,
                        "removed": False,
                    }
                }
            )
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="CLUSTER BY",
            operation_params={"clusterBy": list(cols)},
        )

    def clustering_columns(self, state=None) -> list[str]:
        """LOGICAL clustering column names from the ``delta.clustering``
        domain ([] when the table is not clustered)."""
        import json as _json

        state = state if state is not None else self.state()
        raw = state.domain_metadata.get(self.CLUSTERING_DOMAIN)
        if not raw:
            return []
        paths = _json.loads(raw).get("clusteringColumns", [])
        meta = state.metadata
        return [meta.logical_of(p[0]) for p in paths if p]

    # -- Row tracking (Delta ``rowTracking`` writer feature) -----------------

    ROW_TRACKING_DOMAIN = "delta.rowTracking"
    ROW_TRACKING_PROP = "delta.enableRowTracking"
    MAT_ROW_ID_PROP = "delta.rowTracking.materializedRowIdColumnName"
    MAT_ROW_VER_PROP = "delta.rowTracking.materializedRowCommitVersionColumnName"

    def row_tracking_enabled(self, meta: TableMetadata | None = None) -> bool:
        meta = meta if meta is not None else self.metadata
        return str(
            (meta.configuration or {}).get(self.ROW_TRACKING_PROP, "")
        ).lower() == "true"

    def enable_row_tracking(self) -> int:
        """Enable Delta row tracking: every row gets a STABLE id.  Fresh
        ids come from the Add's ``baseRowId`` + physical position; ids
        survive rewrites that copy rows (compaction, copy-on-write DELETE/
        UPDATE) through MATERIALIZED hidden columns that
        ``read_for_rewrite`` populates and readers coalesce first.  The
        id high-water mark lives in the ``delta.rowTracking``
        domainMetadata, bumped in the same commit as each assignment.

        One commit: protocol upgrade (writer features ``rowTracking`` +
        ``domainMetadata``), config (+ the materialized column names), a
        backfill re-Add of every existing file with its assigned
        ``baseRowId`` (dataChange=false, ids ordered by path), and the
        high-water mark.  Idempotent.  Requires every active file to carry
        ``numRecords`` stats (always true for this engine's writes)."""
        import dataclasses as _dc
        import json as _json
        import time as _time
        import uuid as _uuid

        if self.row_tracking_enabled():
            return self.log.latest_version()
        suffix = _uuid.uuid4().hex[:8]

        def actions(state):
            if str(
                (state.metadata.configuration or {}).get(
                    self.ROW_TRACKING_PROP, ""
                )
            ).lower() == "true":
                return []  # concurrent enablement: metadata no-op commit
            bad = [
                a.path
                for a in state.adds
                if (a.stats or {}).get("numRecords") is None
            ]
            if bad:
                raise ValueError(
                    "enable_row_tracking requires numRecords stats on every "
                    f"file; missing for {bad[:3]}"
                )
            acts = []
            upgrade = _writer_feature_upgrade(
                state, {"rowTracking", "domainMetadata"}
            )
            if upgrade is not None:
                acts.append(upgrade)
            config = dict(state.metadata.configuration)
            config[self.ROW_TRACKING_PROP] = "true"
            config.setdefault(self.MAT_ROW_ID_PROP, f"_row_id_col_{suffix}")
            config.setdefault(
                self.MAT_ROW_VER_PROP, f"_row_commit_version_col_{suffix}"
            )
            acts.append(
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(
                            state.metadata.schema.jsonValue()
                        ),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            )
            hwm = state.row_id_high_water_mark
            next_version = state.version + 1
            for a in sorted(state.adds, key=lambda x: x.path):
                if a.base_row_id is not None:
                    continue
                acts.append(
                    _dc.replace(
                        a,
                        base_row_id=hwm + 1,
                        default_row_commit_version=next_version,
                        data_change=False,
                    )
                )
                hwm += int(a.stats["numRecords"])
            acts.append(self._hwm_action(hwm))
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="SET TBLPROPERTIES",
            operation_params={"properties": [self.ROW_TRACKING_PROP]},
        )

    def _hwm_action(self, hwm: int) -> dict:
        import json as _json

        return {
            "domainMetadata": {
                "domain": self.ROW_TRACKING_DOMAIN,
                "configuration": _json.dumps({"rowIdHighWaterMark": int(hwm)}),
                "removed": False,
            }
        }

    def _fresh_row_id_actions(self, state, fresh_adds) -> list[dict]:
        """Assign fresh baseRowId/defaultRowCommitVersion to ``fresh_adds``
        IN PLACE (overwriting on commit retries, so a concurrent writer's
        high-water-mark bump is respected) and return the updated HWM
        domainMetadata action; [] when row tracking is off or nothing to
        assign.  Called inside commit builders with the fresh state."""
        if not self.row_tracking_enabled(state.metadata):
            return []
        hwm = state.row_id_high_water_mark
        next_version = state.version + 1
        assigned = 0
        for a in fresh_adds:
            n = (a.stats or {}).get("numRecords")
            if n is None:
                raise ValueError(
                    f"row tracking requires numRecords stats: {a.path}"
                )
            a.base_row_id = hwm + 1
            a.default_row_commit_version = next_version
            hwm += int(n)
            assigned += 1
        if not assigned:
            return []
        return [self._hwm_action(hwm)]

    def _materialized_row_cols(self, meta: TableMetadata) -> tuple[str, str]:
        cfg = meta.configuration or {}
        return cfg[self.MAT_ROW_ID_PROP], cfg[self.MAT_ROW_VER_PROP]

    def _read_with_row_ids(self, use, meta: TableMetadata) -> DataFrame:
        """Logical schema columns + the two MATERIALIZED row-tracking
        columns, populated: materialized value when the file carries one
        (rows copied by a preserving rewrite), else baseRowId + physical
        position / defaultRowCommitVersion.  DV-deleted rows excluded (the
        exclusion frame is deleted-cardinality-sized)."""
        from delta_sorter_spark.operators.dml import _rel_path_col

        mat_id, mat_ver = self._materialized_row_cols(meta)
        scan = self.scan_with_positions(
            use,
            meta,
            extra_fields=[
                T.StructField(mat_id, T.LongType(), True),
                T.StructField(mat_ver, T.LongType(), True),
            ],
        )
        base_map = local_df(self.spark, 
            [
                (a.path, a.base_row_id, a.default_row_commit_version)
                for a in use
            ],
            "__relp__ string, __base__ long, __ver__ long",
        )
        df = scan.withColumn("__relp__", _rel_path_col(self)).join(
            F.broadcast(base_map), "__relp__"
        )
        dv_pairs = [
            (a.path, int(p))
            for a in use
            if a.deletion_vector
            for p in self.read_deletion_vector(a)
        ]
        if dv_pairs:
            dead = local_df(self.spark, 
                dv_pairs, "__relp__ string, __pos__ long"
            )
            df = df.join(F.broadcast(dead), ["__relp__", "__pos__"], "left_anti")
        return df.select(
            *[F.col(f.name) for f in meta.schema.fields],
            F.coalesce(
                F.col(mat_id), F.col("__base__") + F.col("__pos__")
            ).alias(mat_id),
            F.coalesce(F.col(mat_ver), F.col("__ver__")).alias(mat_ver),
        )

    def to_df_with_row_ids(
        self, adds: Sequence[AddAction] | None = None, version: int | None = None
    ) -> DataFrame:
        """Table read with two extra columns: ``_row_id`` (stable row id)
        and ``_row_commit_version`` — Delta row-tracking reader semantics:
        materialized value first, else baseRowId + position."""
        state = self.state(version=version)
        meta = state.metadata
        if not self.row_tracking_enabled(meta):
            raise ValueError(
                "row tracking is not enabled — call enable_row_tracking()"
            )
        use = state.adds if adds is None else list(adds)
        mat_id, mat_ver = self._materialized_row_cols(meta)
        if not use:
            fields = list(meta.schema.fields) + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField("_row_commit_version", T.LongType(), True),
            ]
            return local_df(self.spark, [], T.StructType(fields))
        return (
            self._read_with_row_ids(use, meta)
            .withColumnRenamed(mat_id, "_row_id")
            .withColumnRenamed(mat_ver, "_row_commit_version")
        )

    def read_for_rewrite(self, adds: Sequence[AddAction], meta=None) -> DataFrame:
        """What a row-copying rewrite (compaction, copy-on-write DML) must
        read: the plain DV-applied ``to_df`` normally, or — with row
        tracking enabled — the row-id-carrying read whose materialized
        columns ride into ``stage_write(schema=rewrite_schema())`` so the
        copied rows KEEP their ids."""
        meta = meta if meta is not None else self.metadata
        if not self.row_tracking_enabled(meta):
            return self.to_df(adds=adds)
        return self._read_with_row_ids(list(adds), meta)

    def rewrite_schema(self, meta=None) -> T.StructType | None:
        """``stage_write``'s schema override for a row-id-preserving
        rewrite; None when row tracking is off (default write schema)."""
        meta = meta if meta is not None else self.metadata
        if not self.row_tracking_enabled(meta):
            return None
        mat_id, mat_ver = self._materialized_row_cols(meta)
        return T.StructType(
            list(meta.schema.fields)
            + [
                T.StructField(mat_id, T.LongType(), True),
                T.StructField(mat_ver, T.LongType(), True),
            ]
        )

    def add_check_constraint(self, name: str, expr: str) -> int:
        """ADD CONSTRAINT name CHECK (expr): validates ALL existing rows
        (one scan), then commits the constraint into table configuration so
        every later append enforces it.  Returns the commit version."""
        import json as _json
        import time as _time

        self._enforce_constraints(self.to_df(), {name: expr})

        def actions(state):
            config = dict(state.metadata.configuration)
            config[f"delta.constraints.{name}"] = expr
            return [
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(
                            state.metadata.schema.jsonValue()
                        ),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            ]

        return self.log.commit_with_retry(
            actions,
            operation="ADD CONSTRAINT",
            operation_params={"name": name, "expr": expr},
        )

    def drop_check_constraint(self, name: str) -> int:
        """DROP CONSTRAINT name.  Raises KeyError if absent."""
        import json as _json
        import time as _time

        if name not in self.metadata.check_constraints:
            raise KeyError(f"no CHECK constraint named {name!r}")

        def actions(state):
            config = {
                k: v
                for k, v in state.metadata.configuration.items()
                if k != f"delta.constraints.{name}"
            }
            return [
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(
                            state.metadata.schema.jsonValue()
                        ),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            ]

        return self.log.commit_with_retry(
            actions,
            operation="DROP CONSTRAINT",
            operation_params={"name": name},
        )

    # -- column mapping (RENAME COLUMN) ------------------------------------

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE ... RENAME COLUMN — metadata-only, zero data files
        touched (Delta column mapping, mode ``name``).  The field keeps its
        original PHYSICAL name via ``delta.columnMapping.physicalName``;
        existing files, their stats, and future writes all stay keyed by the
        physical name, so zone maps and attested key stats survive the
        rename.  Renaming partition columns or columns referenced by CHECK
        constraints / generation expressions is rejected (their expressions
        and directory layout embed the name)."""
        import json as _json
        import re as _re
        import time as _time

        def actions(state):
            meta = state.metadata
            names = [f.name for f in meta.schema.fields]
            if old not in names:
                raise KeyError(f"no column {old!r}")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            if old in meta.partition_columns:
                raise ValueError(
                    f"cannot rename partition column {old!r} (directory layout)"
                )
            word = _re.compile(rf"\b{_re.escape(old)}\b")
            for cname, expr in meta.check_constraints.items():
                if word.search(expr):
                    raise ValueError(
                        f"column {old!r} is referenced by CHECK constraint {cname!r}"
                    )
            fields = []
            for f in meta.schema.fields:
                md = dict(f.metadata or {})
                if "delta.generationExpression" in md and word.search(
                    md["delta.generationExpression"]
                ):
                    raise ValueError(
                        f"column {old!r} is referenced by generated column {f.name!r}"
                    )
                # enabling mapping pins EVERY field's physical name so later
                # renames of other columns behave identically
                md.setdefault("delta.columnMapping.physicalName", f.name)
                fields.append(
                    T.StructField(new if f.name == old else f.name, f.dataType, f.nullable, md)
                )
            config = dict(meta.configuration)
            config["delta.columnMapping.mode"] = "name"
            # configured stat columns track LOGICAL names — follow the rename
            if self.STATS_COLUMNS_PROP in config:
                config[self.STATS_COLUMNS_PROP] = ",".join(
                    new if c == old else c for c in self.stats_columns(meta)
                )
            return [
                {
                    "metaData": {
                        "id": meta.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                        "partitionColumns": meta.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            ]

        return self.log.commit_with_retry(
            actions,
            operation="RENAME COLUMN",
            operation_params={"from": old, "to": new},
        )

    def add_column(
        self,
        name: str,
        ddl_type: str,
        comment: str | None = None,
        default: str | None = None,
    ) -> int:
        """ALTER TABLE ... ADD COLUMN — metadata-only commit; the new field
        is nullable (existing files read as NULL for it, Delta semantics).
        ``default`` registers a column DEFAULT in the same commit (writer
        feature ``allowColumnDefaults``): later appends that omit the
        column fill it with the expression; existing rows still read NULL
        (defaults-for-future-writes, per Delta).  When column mapping is
        enabled the field gets a FRESH physical name (``col-<uuid>``), so
        re-adding a previously dropped name can never resurface the dropped
        column's bytes from old files."""
        import json as _json
        import time as _time

        dtype = T._parse_datatype_string(ddl_type)  # noqa: SLF001
        if default is not None:
            try:
                self.spark.range(1).select(F.expr(default).cast(dtype)).collect()
            except Exception as exc:
                raise ValueError(
                    f"invalid DEFAULT for {name!r}: {default!r} must be a "
                    f"column-free expression castable to {ddl_type} ({exc})"
                ) from None

        def actions(state):
            meta = state.metadata
            if name in [f.name for f in meta.schema.fields]:
                raise ValueError(f"column {name!r} already exists")
            md = {}
            if comment:
                md["comment"] = comment
            if default is not None:
                md["CURRENT_DEFAULT"] = default
            if meta.configuration.get("delta.columnMapping.mode") == "name":
                md["delta.columnMapping.physicalName"] = f"col-{uuid.uuid4().hex}"
            fields = list(meta.schema.fields) + [
                T.StructField(name, dtype, True, md or None)
            ]
            acts = []
            from delta_sorter_spark.sources.delta_log import schema_type_features

            for feat in sorted(schema_type_features(dtype)):
                upgrade = _reader_writer_feature_upgrade(state, feat)
                if upgrade is not None:
                    acts.append(upgrade)
            if default is not None:
                upgrade = _writer_feature_upgrade(state, {"allowColumnDefaults"})
                if upgrade is not None:
                    acts.append(upgrade)
            acts.append(
                {
                    "metaData": {
                        "id": meta.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                        "partitionColumns": meta.partition_columns,
                        "configuration": meta.configuration,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            )
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="ADD COLUMNS",
            operation_params={"column": name, "type": ddl_type},
        )

    def set_column_default(self, name: str, expr: str | None) -> int:
        """ALTER TABLE ... ALTER COLUMN SET/DROP DEFAULT (Delta writer
        feature ``allowColumnDefaults``, Spark's ``CURRENT_DEFAULT`` field
        metadata): later APPENDS that omit the column fill it with ``expr``
        instead of NULL.  Existing rows are untouched — Delta's contract is
        defaults-for-future-writes, no backfill.  ``expr`` must be a
        deterministic, column-free SQL expression castable to the column's
        type (validated here with a one-row evaluation).  ``None`` drops
        the default."""
        import json as _json
        import time as _time

        meta = self.metadata
        by_name = {f.name: f for f in meta.schema.fields}
        if name not in by_name:
            raise KeyError(f"no column {name!r}")
        fmd = dict(by_name[name].metadata or {})
        if expr is not None:
            if "delta.generationExpression" in fmd:
                raise ValueError(
                    f"column {name!r} is generated; it cannot also default"
                )
            if any(k.startswith("delta.identity.") for k in fmd):
                raise ValueError(
                    f"column {name!r} is an identity column; values are "
                    "engine-allocated, not defaulted"
                )
            dtype = by_name[name].dataType
            try:
                self.spark.range(1).select(
                    F.expr(expr).cast(dtype)
                ).collect()
            except Exception as exc:
                raise ValueError(
                    f"invalid DEFAULT for {name!r}: {expr!r} must be a "
                    f"column-free expression castable to "
                    f"{dtype.simpleString()} ({exc})"
                ) from None

        def actions(state):
            fields = []
            for f in state.metadata.schema.fields:
                if f.name != name:
                    fields.append(f)
                    continue
                md = dict(f.metadata or {})
                if expr is None:
                    md.pop("CURRENT_DEFAULT", None)
                else:
                    md["CURRENT_DEFAULT"] = expr
                fields.append(T.StructField(f.name, f.dataType, f.nullable, md or None))
            acts = []
            if expr is not None:
                upgrade = _writer_feature_upgrade(state, {"allowColumnDefaults"})
                if upgrade is not None:
                    acts.append(upgrade)
            acts.append(
                {
                    "metaData": {
                        "id": state.metadata.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                        "partitionColumns": state.metadata.partition_columns,
                        "configuration": state.metadata.configuration,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            )
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="CHANGE COLUMN",
            operation_params={"column": name, "default": expr},
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE ... DROP COLUMN — metadata-only (reads are log-schema
        driven, so the column vanishes without touching data files; the
        bytes go away physically when files are next rewritten).  Requires
        column mapping, which is enabled here exactly like RENAME does —
        every field's physical name gets pinned first — because without it
        a later ADD COLUMN of the same name would read the dropped bytes
        back out of old files.  Dropping partition columns or columns
        referenced by CHECK constraints / generation expressions is
        rejected."""
        import json as _json
        import re as _re
        import time as _time

        def actions(state):
            meta = state.metadata
            if name not in [f.name for f in meta.schema.fields]:
                raise KeyError(f"no column {name!r}")
            if len(meta.schema.fields) == 1:
                raise ValueError("cannot drop the only column")
            if name in meta.partition_columns:
                raise ValueError(
                    f"cannot drop partition column {name!r} (directory layout)"
                )
            word = _re.compile(rf"\b{_re.escape(name)}\b")
            for cname, expr in meta.check_constraints.items():
                if word.search(expr):
                    raise ValueError(
                        f"column {name!r} is referenced by CHECK constraint {cname!r}"
                    )
            fields = []
            for f in meta.schema.fields:
                md = dict(f.metadata or {})
                if f.name != name and "delta.generationExpression" in md and word.search(
                    md["delta.generationExpression"]
                ):
                    raise ValueError(
                        f"column {name!r} is referenced by generated column {f.name!r}"
                    )
                if f.name == name:
                    continue
                md.setdefault("delta.columnMapping.physicalName", f.name)
                fields.append(T.StructField(f.name, f.dataType, f.nullable, md))
            config = dict(meta.configuration)
            config["delta.columnMapping.mode"] = "name"
            # a dropped column leaves the configured stat set too
            if self.STATS_COLUMNS_PROP in config:
                config[self.STATS_COLUMNS_PROP] = ",".join(
                    c for c in self.stats_columns(meta) if c != name
                )
            return [
                {
                    "metaData": {
                        "id": meta.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                        "partitionColumns": meta.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            ]

        return self.log.commit_with_retry(
            actions,
            operation="DROP COLUMNS",
            operation_params={"column": name},
        )

    # Widenings the Delta ``typeWidening`` feature allows AND Spark's
    # parquet reader up-casts natively (SPARK-40876): every old file keeps
    # its narrower physical type and reads through the wider log schema.
    # (The spec's decimal/date promotions need reader-side rescale logic
    # this engine doesn't carry; they are rejected, not silently mangled.)
    _WIDENINGS = {
        "byte": {"short", "integer", "long", "double"},
        "short": {"integer", "long", "double"},
        "integer": {"long", "double"},
        "float": {"double"},
    }

    def widen_column(self, name: str, ddl_type: str) -> int:
        """ALTER TABLE ... ALTER COLUMN TYPE under the Delta ``typeWidening``
        table feature — metadata-only: the log schema gets the wider type,
        a ``delta.typeChanges`` entry on the field records the transition
        (protocol shape: fromType/toType/tableVersion), and existing files
        keep their narrower PHYSICAL type.  Reads up-cast at scan time on
        both planes (local: Spark's parquet reader; remote: the data
        source's arrow cast), file-level min/max stats re-parse under the
        wider type with order preserved (numeric widenings are monotone) so
        zone-map pruning and sortedness attestation stay valid, and every
        later write lands in the wider type."""
        import json as _json
        import time as _time

        new_type = T._parse_datatype_string(ddl_type)  # noqa: SLF001

        def actions(state):
            meta = state.metadata
            by_name = {f.name: f for f in meta.schema.fields}
            if name not in by_name:
                raise KeyError(f"no column {name!r}")
            if name in meta.partition_columns:
                raise ValueError(
                    f"cannot widen partition column {name!r}: partition "
                    "values parse from directory strings under the declared "
                    "type and existing directories keep the old rendering"
                )
            old = by_name[name].dataType
            if new_type == old:
                return []  # idempotent
            allowed = self._WIDENINGS.get(old.typeName(), set())
            if new_type.typeName() not in allowed:
                raise ValueError(
                    f"unsupported type change {old.simpleString()} -> "
                    f"{new_type.simpleString()}: typeWidening permits "
                    "byte->short->int->long, float->double, and "
                    "byte/short/int->double only"
                )
            fields = []
            for f in meta.schema.fields:
                if f.name != name:
                    fields.append(f)
                    continue
                md = dict(f.metadata or {})
                changes = list(md.get("delta.typeChanges", []))
                changes.append(
                    {
                        "fromType": old.typeName(),
                        "toType": new_type.typeName(),
                        "tableVersion": state.version + 1,
                    }
                )
                md["delta.typeChanges"] = changes
                fields.append(T.StructField(f.name, new_type, f.nullable, md))
            config = dict(meta.configuration)
            config["delta.enableTypeWidening"] = "true"
            acts = []
            # typeWidening is a READER-writer feature: old readers must not
            # misread the narrower physical files.
            upgrade = _reader_writer_feature_upgrade(state, "typeWidening")
            if upgrade is not None:
                acts.append(upgrade)
            acts.append(
                {
                    "metaData": {
                        "id": meta.table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _json.dumps(T.StructType(fields).jsonValue()),
                        "partitionColumns": meta.partition_columns,
                        "configuration": config,
                        "createdTime": int(_time.time() * 1000),
                    }
                }
            )
            return acts

        return self.log.commit_with_retry(
            actions,
            operation="CHANGE COLUMN",
            operation_params={"column": name, "type": ddl_type},
        )

    # -- shallow clone -----------------------------------------------------

    @classmethod
    def clone(
        cls, spark: SparkSession, source_path: str, dest_path: str
    ) -> "DeltaTable":
        """Shallow CLONE: a new table whose version-0 commit re-Adds the
        source's active files BY ABSOLUTE PATH — zero data copied, stats and
        deletion vectors carried over.  Writes to the clone land in its own
        directory; the clone's vacuum walks only its own directory, so
        source data files are never collected from the clone side.  The
        metadata-only pattern for 100 TB experimentation: branch, mutate,
        measure, drop."""
        src = cls(spark, source_path)
        state = src.state()
        meta = state.metadata
        dst = cls(spark, dest_path)
        if dst.log.exists():
            raise FileExistsError(f"table already exists at {dest_path}")
        config = dict(meta.configuration)
        # registered index specs (Bloom, ANN) are LAYOUT-LOCAL: their
        # datasets live under the source's directory and key the source's
        # RELATIVE file paths, while a clone re-Adds those files by
        # absolute path — a carried spec would probe/serve against nothing
        # (or fail on the missing dataset).  The clone starts index-less;
        # rebuild on the clone if needed (build is once-per-version).
        for key in list(config):
            if key.startswith(("deltasort.bloomIndex.", "deltasort.annIndex.")):
                del config[key]
        config["delta-sorter.clone.source"] = src.table_path
        config["delta-sorter.clone.sourceVersion"] = str(state.version)
        dst.log.create_table(meta.schema, meta.partition_columns, config)

        def actions(_state):
            out = []
            # carry the source's protocol: cloned config can reference
            # features (rowTracking, ICT, DVs) the default 1/2 protocol
            # would not declare to foreign writers
            if state.protocol and (
                state.protocol.get("minWriterVersion", 2) > 2
                or state.protocol.get("minReaderVersion", 1) > 1
            ):
                out.append({"protocol": dict(state.protocol)})
            for a in state.adds:
                dv = None
                if a.deletion_vector:
                    dv = dict(a.deletion_vector)
                    if _is_protocol_dv(dv):
                        # re-anchor the bin into the SOURCE table dir: "u"
                        # becomes an absolute-path "p" descriptor (the
                        # protocol's cross-directory form); "p"/"i" carry
                        if dv.get("storageType") == "u":
                            from delta_sorter_spark.sources.roaring import (
                                dv_uuid_path,
                            )

                            dv = {
                                "storageType": "p",
                                "pathOrInlineDv": os.path.join(
                                    src.table_path,
                                    dv_uuid_path(dv["pathOrInlineDv"]),
                                ),
                                "offset": dv.get("offset"),
                                "sizeInBytes": dv.get("sizeInBytes"),
                                "cardinality": dv.get("cardinality", 0),
                            }
                    else:
                        dv["storagePath"] = os.path.join(
                            src.table_path, dv["storagePath"]
                        )
                out.append(
                    AddAction(
                        path=os.path.join(src.table_path, a.path),
                        size=a.size,
                        partition_values=dict(a.partition_values),
                        modification_time=a.modification_time,
                        data_change=True,
                        stats=a.stats,
                        deletion_vector=dv,
                        base_row_id=a.base_row_id,
                        default_row_commit_version=a.default_row_commit_version,
                        # clustering attestation is a fact about the FILE
                        # (unlike index specs): the clone's identical files
                        # stay clustered, so its first OPTIMIZE is a no-op
                        tags=dict(a.tags) if a.tags else None,
                        clustering_provider=a.clustering_provider,
                    )
                )
            # carry the source's domain metadata — above all the row-id
            # high-water mark: without it a row-tracked clone would hand
            # out fresh ids from -1 and collide with the cloned rows'
            for domain, conf in sorted(state.domain_metadata.items()):
                out.append(
                    {
                        "domainMetadata": {
                            "domain": domain,
                            "configuration": conf,
                            "removed": False,
                        }
                    }
                )
            return out

        dst.log.commit_with_retry(
            actions,
            operation="CLONE",
            operation_params={
                "source": src.table_path,
                "sourceVersion": str(state.version),
                "isShallow": "true",
            },
        )
        return dst

    def _estimate_max_records(self, df: DataFrame, target_bytes: int) -> int | None:
        """bytes/row estimate from current table state (cheap, metadata-only);
        None when the table is empty (no basis for an estimate)."""
        state = self.state()
        total_bytes = sum(a.size for a in state.adds)
        total_rows = sum(
            (a.stats or {}).get("numRecords", 0) for a in state.adds if a.stats
        )
        if total_bytes <= 0 or total_rows <= 0:
            return None
        bytes_per_row = max(1.0, total_bytes / total_rows)
        return max(1, int(target_bytes / bytes_per_row))

    # -- commit ------------------------------------------------------------

    def commit_rewrite(
        self,
        adds: Sequence[AddAction],
        removes: Sequence,
        predicate: str | None = None,
        operation: str = "WRITE",
        txn_app_id: str | None = None,
        txn_version: int | None = None,
        extra_actions=None,
    ) -> int:
        """Overwrite-style commit: Remove(old) + Add(new), optionally scoped
        by a replaceWhere predicate recorded in commitInfo (reference
        lib.rs:862-885 records DeltaOperation::Write{Overwrite, predicate}).

        Conflict detection (beyond the reference, which assumes a single
        writer): on every attempt the fresh log state is checked — if any
        file this rewrite intends to Remove is no longer active, a concurrent
        writer already rewrote it, and blindly committing would DUPLICATE its
        rows (our Adds + theirs).  Raises ConcurrentRewriteError instead;
        callers treat it as "lost the race" and discard their staged files.

        ``txn_app_id``/``txn_version``: SetTransaction idempotence, same
        contract as ``append`` — if the log already records this appId at or
        past this version the rewrite is dropped (staged files discarded)."""
        if (txn_app_id is None) != (txn_version is None):
            raise ValueError("txn_app_id and txn_version must be passed together")
        params = {"mode": "Overwrite"}
        if predicate:
            params["predicate"] = predicate
        actions = list(extra_actions or []) + list(removes) + list(adds)
        # row tracking: fresh files get ids at COMMIT time (assignment is
        # re-done from each retry's state, so a concurrent writer's
        # high-water-mark bump is respected).  The fresh set is pinned here:
        # re-Adds that carried their ids in keep them.
        fresh_ids = [
            a for a in adds if isinstance(a, AddAction) and a.base_row_id is None
        ]

        class _AlreadyApplied(Exception):
            pass

        def build(state):
            if (
                txn_app_id is not None
                and state.txns.get(txn_app_id, -1) >= txn_version
            ):
                raise _AlreadyApplied
            active = {a.path: a for a in state.adds}

            def _dv_key(dv):
                # canonical identity across json/checkpoint parse shapes
                if not dv:
                    return None
                if "storagePath" in dv and "storageType" not in dv:
                    return ("legacy", dv.get("storagePath"))
                return (
                    dv.get("storageType"),
                    dv.get("pathOrInlineDv"),
                    dv.get("cardinality", 0),
                )

            gone, changed = [], []
            for r in removes:
                cur = active.get(r.path)
                if cur is None:
                    gone.append(r.path)
                    continue
                # DV-aware check: a path that is still active but was
                # re-Added since planning (new deletion vector, different
                # bytes) means our staged files were materialized from
                # stale data — committing would resurrect rows a
                # concurrent delete_where_dv just hid.
                src_mt = getattr(r, "source_modification_time", None)
                if src_mt is None:
                    continue  # legacy caller without a snapshot
                src_dv = getattr(r, "source_deletion_vector", None)
                if (
                    _dv_key(cur.deletion_vector) != _dv_key(src_dv)
                    or cur.modification_time != src_mt
                    or cur.size != r.size
                ):
                    changed.append(r.path)
            if gone:
                raise ConcurrentRewriteError(
                    f"files rewritten by a concurrent writer: {gone[:3]}"
                )
            if changed:
                raise ConcurrentRewriteError(
                    "files re-added (deletion vector / bytes changed) by a"
                    f" concurrent writer: {changed[:3]}"
                )
            out = actions + self._fresh_row_id_actions(state, fresh_ids)
            if txn_app_id is not None:
                out = out + [
                    {"txn": {"appId": txn_app_id, "version": int(txn_version)}}
                ]
            return out

        try:
            return self.log.commit_with_retry(
                build, operation=operation, operation_params=params
            )
        except _AlreadyApplied:
            self.discard_files(adds)
            return self.log.latest_version()

    STATS_COLUMNS_PROP = "delta.dataSkippingStatsColumns"

    def stats_columns(self, meta: TableMetadata | None = None) -> list[str]:
        """Table-configured zone-map columns — see
        :func:`stats_columns_for` (module-level so Spark-free contexts like
        the streaming sink's commit plane share the exact resolution)."""
        return stats_columns_for(
            meta if meta is not None else self.metadata,
            self.STATS_COLUMNS_PROP,
        )

    # -- metadata-only aggregates (zero-scan, from log stats) ---------------

    def stats_count(self, version: int | None = None) -> int | None:
        """Exact logical row count from the log alone — ZERO scan tasks.

        Every Add carries its physical ``numRecords`` (this engine's
        stage_write always writes it) and a deletion vector's ``cardinality``
        is the exact count of positions it hides, so

            count(*) = sum(numRecords) - sum(dv.cardinality)

        is exact even on heavily-DV'd tables.  Returns None when any active
        file lacks numRecords (foreign writer without stats) — callers fall
        back to ``to_df().count()``.  On a 100 TB / million-file table this
        answers the most common query there is at log-replay cost, the same
        way Delta/Databricks serve count(*) from the snapshot."""
        total = 0
        for a in self.state(version=version).adds:
            n = (a.stats or {}).get("numRecords")
            if n is None:
                return None
            total += int(n)
            if a.deletion_vector:
                total -= int(a.deletion_vector.get("cardinality", 0))
        return total

    def stats_min_max(
        self,
        column: str,
        version: int | None = None,
        trust_string_stats: bool = False,
    ):
        """Exact (min, max) of ``column`` from zone maps — zero scan — or
        None when the log cannot prove exactness.

        A file's contribution is its stats min/max (or its typed partition
        value for a partition column).  The fold is only EXACT when every
        file is trustworthy: stats present for the column (or all-null,
        which contributes nothing), ``tightBounds`` not false (a DV re-Add
        keeps loose bounds — the deleted row may have held the extremum),
        and no deletion vector.  Any untrustworthy file -> None (caller
        falls back to a real aggregation; a WRONG fast answer is never
        returned).  All-null across every file returns (None, None) — the
        SQL result of min/max over all NULLs.

        String/binary columns return None unless ``trust_string_stats``:
        the protocol lets writers TRUNCATE long string maxValues (widened
        past the true max), so a foreign-written table's string bounds may
        not be actual values.  This engine's own stage_write stats are
        always exact — pass True for tables this engine owns."""
        from delta_sorter_spark.functions.predicates import _parse_typed

        state = self.state(version=version)
        meta = state.metadata
        if column not in meta.schema.names:
            raise ValueError(f"stats_min_max: unknown column {column!r}")
        dtype = meta.schema[column].dataType
        if isinstance(dtype, (T.StringType, T.BinaryType)) and not trust_string_stats:
            return None
        md = meta.schema[column].metadata or {}
        phys = md.get("delta.columnMapping.physicalName", column)
        is_part = column in meta.partition_columns
        lo = hi = None
        for a in state.adds:
            stats = a.stats or {}
            n = stats.get("numRecords")
            if n == 0:
                continue
            if a.deletion_vector or stats.get("tightBounds") is False:
                return None
            if is_part:
                raw = (a.partition_values or {}).get(column)
                if raw is None or raw.lower() == "null":
                    continue  # all rows NULL on this column in this file
                fmin = fmax = _parse_typed(raw, dtype)
            else:
                if n is None:
                    return None
                nc = stats.get("nullCount", {}).get(phys)
                if phys not in stats.get("minValues", {}):
                    if nc is not None and nc == n:
                        continue  # provably all-null: contributes nothing
                    return None  # stats missing for a file with values
                try:
                    fmin = parse_stat(stats["minValues"][phys], dtype)
                    fmax = parse_stat(stats["maxValues"][phys], dtype)
                except (ValueError, TypeError):
                    return None
                if fmin is None or fmax is None:
                    return None
                if isinstance(fmin, float) and (
                    math.isnan(fmin) or math.isnan(fmax)
                ):
                    # NaN bounds poison the fold (every comparison is
                    # False) and Spark's min/max order NaN specially —
                    # refuse rather than risk a wrong extremum
                    return None
            try:
                lo = fmin if lo is None or fmin < lo else lo
                hi = fmax if hi is None or fmax > hi else hi
            except TypeError:
                return None
        return (lo, hi)

    def vacuum(
        self, dry_run: bool = False, retention_seconds: float | None = None
    ) -> list[str]:
        """Delete data files in the table directory that are no longer
        referenced by the log (tombstoned by rewrites, or orphaned by failed
        writers).  Returns the deleted (or would-delete) relative paths.

        ``retention_seconds`` skips recently-modified files so in-flight
        writers' staged-then-moved files aren't collected (Delta's VACUUM
        retention idea).  Default (None) honors the table's
        ``delta.deletedFileRetentionDuration`` property when set
        (``interval N days/hours/minutes``, Delta's syntax) and falls back
        to 0, which suits tests and single-writer use; pass an explicit
        value to override either way.

        Runs entirely through the fs layer (recursive listing + deletes),
        so the same sweep works on local paths and remote table URIs —
        closing the jar-free remote maintenance loop (compact -> validate
        -> vacuum)."""
        import time as _time

        state = self.state()
        if retention_seconds is None:
            retention_seconds = _parse_retention_interval(
                (state.metadata.configuration or {}).get(
                    "delta.deletedFileRetentionDuration"
                )
            )
        active = {a.path for a in state.adds}
        # deletion-vector payloads still referenced by an active Add:
        # protocol "u" descriptors resolve to their bin file; legacy JSON
        # sidecars are single files (exact match); legacy parquet sidecars
        # are DIRECTORIES of part files, protected by prefix
        from delta_sorter_spark.sources.roaring import dv_uuid_path

        dv_paths: set[str] = set()
        for a in state.adds:
            dv = a.deletion_vector
            if not dv:
                continue
            if _is_protocol_dv(dv):
                if dv.get("storageType") == "u":
                    dv_paths.add(dv_uuid_path(dv["pathOrInlineDv"]))
                # "p" is outside this table dir (clone source), "i" inline
            else:
                dv_paths.add(dv["storagePath"])
        active |= dv_paths
        # change-data files (protocol cdc actions) referenced by commit
        # jsons still in the log are readable feed history — protected
        # until cleanup_metadata drops those commits, after which they
        # become unreferenced and collectable (Delta's own CDC retention
        # story).  Only CDF-touched tables pay the log re-read.
        cfg_all = state.metadata.configuration or {}
        proto_feats = set(
            (state.protocol or {}).get("writerFeatures") or []
        )
        if (
            str(cfg_all.get("delta.enableChangeDataFeed", "")).lower()
            == "true"
            or "changeDataFeed" in proto_feats
        ):
            for v in self.log._commit_versions():
                for action in self.log.commit_actions(v):
                    if "cdc" in action and action["cdc"].get("path"):
                        active.add(action["cdc"]["path"])
        # registered index datasets (Bloom, ANN) are live metadata
        # (directories of parquet rows); unregistered ones — dropped or
        # replaced by a rebuild/refresh — fall through and get collected
        index_dirs: set[str] = set()
        for key, raw in (state.metadata.configuration or {}).items():
            if key.startswith(("deltasort.bloomIndex.", "deltasort.annIndex.")):
                try:
                    import json as _json

                    spec = _json.loads(raw)
                    if isinstance(spec, dict) and spec.get("path"):
                        index_dirs.add(str(spec["path"]))
                        # generational ANN layout: code parts + the
                        # manifest live in their own uuid dirs outside
                        # the base — protect every dir the spec names
                        # (dirs the spec no longer names are superseded
                        # and deliberately collectable)
                        for part in spec.get("codes_parts") or []:
                            if isinstance(part, dict) and part.get("dir"):
                                index_dirs.add(
                                    str(part["dir"]).rsplit("/codes", 1)[0]
                                )
                        if spec.get("files_dir"):
                            index_dirs.add(
                                str(spec["files_dir"]).rsplit("/files", 1)[0]
                            )
                except ValueError:
                    pass
        active_prefixes = tuple(
            p.rstrip("/") + "/" for p in (dv_paths | index_dirs)
        )
        fsobj = self.log.fs
        doomed: list[str] = []
        now = _time.time()
        entries = fsobj.list_files_recursive(self.table_path)
        # in-flight bloom-index builds: the dataset is written BEFORE the
        # commit that registers it, flagged by a _BUILDING marker the build
        # deletes on registration.  Protect marker-fresh directories so the
        # unregistered-write window can't be collected; a crashed build's
        # marker ages out and the leftovers become collectable.
        from delta_sorter_spark.operators.bloom_index import (
            BUILD_GRACE_SECONDS,
            BUILDING_MARKER,
        )

        building_grace = max(retention_seconds, BUILD_GRACE_SECONDS)
        for rel, mtime in entries:
            if (
                rel.startswith(("_bloom_index/", "_ann_index/"))
                and rel.rsplit("/", 1)[-1] == BUILDING_MARKER
                and now - mtime < building_grace
            ):
                active_prefixes += (rel.rsplit("/", 1)[0] + "/",)
        for rel, mtime in entries:
            top = rel.split("/", 1)[0]
            if top in ("_delta_log", "_staging"):
                continue
            in_dv_tree = rel.startswith("_deletion_vectors/")
            in_index_tree = rel.startswith(("_bloom_index/", "_ann_index/"))
            name = rel.rsplit("/", 1)[-1]
            is_dv_bin = name.startswith("deletion_vector_") and name.endswith(".bin")
            # data files everywhere; protocol DV bins; inside the legacy DV
            # and index trees EVERY file (sidecar payloads, _SUCCESS
            # markers, Hadoop .crc companions), so an orphaned dataset is
            # collected completely
            if not (
                name.endswith(".parquet") or in_dv_tree or in_index_tree or is_dv_bin
            ):
                continue
            if rel in active or rel.startswith(active_prefixes):
                continue
            if retention_seconds and now - mtime < retention_seconds:
                continue
            doomed.append(rel)
            if not dry_run:
                try:
                    fsobj.delete(fsobj.join(self.table_path, rel))
                except (OSError, FileNotFoundError):
                    pass
        if not dry_run and not self.is_remote:
            # drop now-empty orphaned sidecar directories (object stores
            # have no directories to prune)
            dv_root = os.path.join(self.table_path, "_deletion_vectors")
            for root, dirs, names in os.walk(dv_root, topdown=False):
                if not dirs and not names and root != dv_root:
                    try:
                        os.rmdir(root)
                    except OSError:
                        pass
        return doomed

    def read_parquet_dataset(
        self,
        dataset_rel: str,
        columns: list[str],
        ddl: str,
        isin: tuple[str, list] | None = None,
    ) -> DataFrame:
        """DataFrame over a parquet dataset directory inside the table
        (sidecars).  Local: the JVM parquet reader.  Remote: one
        Arrow-vectorized task per part object via pyarrow (no connector
        jars).  ``isin=(col, values)`` pushes a membership filter INTO the
        scan on both paths (parquet row-group stats skipping) — with the
        dataset written sorted/partitioned on that column, pruning reaches
        file granularity (the IVF codes-by-centroid serving shape)."""
        if not self.is_remote:
            df = self.spark.read.parquet(
                os.path.join(self.table_path, dataset_rel)
            )
            if isin is not None:
                df = df.where(F.col(isin[0]).isin(list(isin[1])))
            return df.select(*columns)
        from delta_sorter_spark.sources.fs import capture_aws_env, resolve

        fsobj, base = resolve(self.table_path)
        dataset_uri = fsobj.join(base, dataset_rel)
        parts = [n for n in fsobj.list_dir(dataset_uri) if n.endswith(".parquet")]
        if not parts:
            return local_df(self.spark, [], ddl)
        aws_env = capture_aws_env()
        cols = list(columns)
        flt = (isin[0], list(isin[1])) if isin is not None else None

        def rd(batches):
            import pandas as pd
            import pyarrow.parquet as pq

            from delta_sorter_spark.sources.fs import apply_aws_env, pyarrow_open_input

            apply_aws_env(aws_env)
            for b in batches:
                for name in b["name"]:
                    tbl = pq.read_table(
                        pyarrow_open_input(f"{dataset_uri}/{name}"),
                        columns=cols,
                        filters=(
                            [(flt[0], "in", flt[1])] if flt is not None else None
                        ),
                    )
                    yield tbl.to_pandas()

        files_df = local_df(self.spark, [(p,) for p in parts], "name string")
        return files_df.repartition(min(len(parts), 64)).mapInPandas(rd, ddl)

    def write_parquet_dataset(self, df: DataFrame, dataset_rel: str) -> None:
        """Write ``df`` as a parquet dataset directory inside the table.
        Local: the JVM writer.  Remote: each Spark partition serializes
        itself and PUTs one object from the executor (same plane as
        ``_stage_write_remote``); empty partitions write nothing."""
        dest = os.path.join(self.table_path, dataset_rel)
        if not self.is_remote:
            # dataset_rel is always a fresh uuid directory, so append ==
            # create; append (not errorifexists) tolerates a pre-created
            # _BUILDING vacuum-guard marker in the destination
            df.write.mode("append").parquet(dest)
            return
        self._require_shared_remote_store("write_parquet_dataset")
        from pyspark.sql.pandas.types import to_arrow_type

        from delta_sorter_spark.sources.fs import capture_aws_env

        aws_env = capture_aws_env()
        arrow_fields = [(f.name, to_arrow_type(f.dataType)) for f in df.schema.fields]

        def wr(batches):
            import io as _io
            import uuid as _uuid

            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            from delta_sorter_spark.sources.fs import apply_aws_env, resolve

            apply_aws_env(aws_env)
            pdfs = list(batches)
            n = 0
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                n = len(pdf)
                if n:
                    tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(
                        pa.schema(arrow_fields)
                    )
                    buf = _io.BytesIO()
                    pq.write_table(tbl, buf)
                    fsobj, base = resolve(dest)
                    fsobj.write_bytes(
                        f"{base}/part-{_uuid.uuid4().hex}.parquet", buf.getvalue()
                    )
            yield pd.DataFrame({"n": [n]})

        df.mapInPandas(wr, "n long").collect()  # drives the executor PUTs

    def delete_dataset(self, dataset_rel: str) -> None:
        """Remove a dataset directory (local tree or remote prefix)."""
        if not self.is_remote:
            import shutil as _shutil

            _shutil.rmtree(os.path.join(self.table_path, dataset_rel), ignore_errors=True)
            return
        from delta_sorter_spark.sources.fs import resolve

        fsobj, base = resolve(self.table_path)
        prefix = fsobj.join(base, dataset_rel)
        for rel, _m in fsobj.list_files_recursive(prefix):
            fsobj.delete(fsobj.join(prefix, rel))

    def discard_files(self, adds: Sequence[AddAction]) -> None:
        """Delete staged data files that will never be committed (loser of a
        concurrent rewrite race).  Goes through the fs layer so remote
        writers clean up too."""
        fsobj = self.log.fs
        for a in adds:
            try:
                fsobj.delete(fsobj.join(self.table_path, a.path))
            except (OSError, FileNotFoundError):
                pass


class ConcurrentRewriteError(Exception):
    """A concurrent writer removed files this transaction depends on."""
