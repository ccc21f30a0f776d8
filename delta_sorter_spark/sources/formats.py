"""Generic file-format sources/sinks beyond parquet/Delta.

The reference reads exactly one format (Delta-backed parquet,
crates/sorter-core/src/lib.rs:609-611); an engine used for data-pipeline work
also ingests raw CSV/JSON drops.  These wrappers keep the Spark-first
contract: schema is explicit (never inferred in production paths — inference
is a full extra pass over the data and yields drifting types), reads are
plain ``spark.read`` so Catalyst still prunes columns and pushes filters
where the format supports it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}

DEFAULT_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "mode": "FAILFAST"},
    "json": {"mode": "FAILFAST"},
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(f"cannot infer source format from {path!r}; pass fmt=")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a file source with an explicit schema.

    Without ``schema``, CSV/JSON fall back to Spark inference (extra pass;
    fine for exploration, not for the pipeline path)."""
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    opts = {**DEFAULT_OPTIONS.get(fmt, {}), **options}
    if opts:
        reader = reader.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    opts = {**DEFAULT_OPTIONS.get(fmt, {}), **options}
    opts.pop("mode", None)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if options:
        writer = writer.options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    catalog table.  Two tables bucketed the same way join WITHOUT an
    exchange — each task reads matching bucket files from both sides — which
    is the standing-shuffle eliminator for repeated big-big joins at scale
    (pay one shuffle at write time, never again at read).

    ``path`` makes it an external table at that location (otherwise the
    session's warehouse dir)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so callers can use the
    plain ``spark.sql`` surface (the SQL entry point the reference delegates
    to DataFusion, SURVEY §2.9)."""
    from delta_sorter_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a directory tree of opaque files (images/audio/video) as a
    DataFrame via Spark's built-in ``binaryFile`` source: one row per file
    with (path, modificationTime, length, content BINARY).

    This is the multimodal on-ramp at scale: listing and reads are
    distributed, ``pathGlobFilter`` prunes by extension server-side, and
    oversized payloads can be excluded up front (content stays NULL-free;
    rows over ``max_bytes`` are dropped, keeping executor memory bounded —
    route those through pointer columns instead, SURVEY §2.8 E5)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
