"""Public API: the reference's Python surface, Spark-native.

Mirrors ``deltasort`` (reference python/pysrc/deltasort/__init__.py:8-40 and
the PyO3 signatures python/src/lib.rs:29-79):

    SortOptimizer(uri).compact(sort_columns, target_file_size_bytes=None,
                               predicate=None, concurrency=None, dry_run=None,
                               repartition_by_sort_key=None, nulls="first")
    SortOptimizer(uri).validate(sort_columns, nulls="first")
        -> dict(checked_files, boundary_violations, details_sample)
        raises RuntimeError when boundary_violations > 0
        (reference __init__.py:33-40)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from delta_sorter_spark.operators.compact import (
    DEFAULT_CONCURRENCY,
    CompactMetrics,
    SortConfig,
    compact_with_sort,
)
from delta_sorter_spark.operators.validate import validate_global_order


def _nulls_first(nulls: str) -> bool:
    """Validate the nulls placement string (PyO3 does the same check,
    python/src/lib.rs:19-27)."""
    if nulls not in ("first", "last"):
        raise ValueError(f'nulls must be "first" or "last", got {nulls!r}')
    return nulls == "first"


def compact(
    table_uri: str,
    sort_columns: Sequence[str],
    target_file_size_bytes: int | None = None,
    predicate: str | None = None,
    concurrency: int | None = None,
    dry_run: bool | None = None,
    repartition_by_sort_key: bool | None = None,
    nulls: str = "first",
    zorder_columns: Sequence[str] | None = None,
    refresh_bloom_indexes: bool = False,
    single_job_threshold: int | None = 64,
    spark: SparkSession | None = None,
) -> CompactMetrics:
    from delta_sorter_spark.functions.keys import parse_sort_spec

    spark = spark or _default_spark()
    cols, ascending = parse_sort_spec(sort_columns)
    config = SortConfig(
        sort_columns=cols,
        target_file_size_bytes=target_file_size_bytes,
        predicate=predicate,
        concurrency=concurrency if concurrency is not None else DEFAULT_CONCURRENCY,
        dry_run=bool(dry_run),
        repartition_by_sort_key=bool(repartition_by_sort_key),
        nulls_first=_nulls_first(nulls),
        zorder_columns=list(zorder_columns) if zorder_columns else None,
        directions=None if all(ascending) else ascending,
        refresh_bloom_indexes=bool(refresh_bloom_indexes),
        single_job_threshold=single_job_threshold,
    )
    return compact_with_sort(spark, table_uri, config)


def validate(
    table_uri: str,
    sort_columns: Sequence[str],
    nulls: str = "first",
    version: int | None = None,
    spark: SparkSession | None = None,
) -> dict:
    from delta_sorter_spark.functions.keys import parse_sort_spec

    spark = spark or _default_spark()
    cols, ascending = parse_sort_spec(sort_columns)
    report = validate_global_order(
        spark,
        table_uri,
        cols,
        _nulls_first(nulls),
        version=version,
        directions=None if all(ascending) else ascending,
    )
    return report.to_dict()


def _default_spark() -> SparkSession:
    from delta_sorter_spark.session import get_spark

    return get_spark()


class SortOptimizer:
    """Reference SortOptimizer (python/pysrc/deltasort/__init__.py:8-40)."""

    def __init__(self, table_uri: str, spark: SparkSession | None = None):
        self.table_uri = table_uri
        self.spark = spark or _default_spark()

    def compact(self, sort_columns: Sequence[str], **kwargs) -> CompactMetrics:
        return compact(self.table_uri, sort_columns, spark=self.spark, **kwargs)

    def validate(self, sort_columns: Sequence[str], nulls: str = "first") -> dict:
        report = validate(self.table_uri, sort_columns, nulls=nulls, spark=self.spark)
        if report["boundary_violations"] > 0:
            # reference wrapper raises on violations (__init__.py:36-40)
            raise RuntimeError(
                f"table {self.table_uri} violates sort order: "
                f"{report['boundary_violations']} violations across "
                f"{report['checked_files']} files; sample: {report['details_sample'][:5]}"
            )
        return report
