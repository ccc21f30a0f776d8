"""delta_sorter_spark — a PySpark-native rebuild of G-Research/delta-sorter.

The reference (``/root/reference``, Rust on delta-rs + DataFusion) is a Delta
Lake table maintenance tool: compaction + global lexicographic ordering +
ordering validation.  This package re-expresses that capability surface
Spark-first (DataFrame/Catalyst), plus the LLM-data-pipeline extension
operators (dedup, similarity search, text analysis, multimodal columns)
required by the north star — all designed for 100 TB scale.

Public API mirrors the reference's Python surface
(reference: python/pysrc/deltasort/__init__.py:8-40):

    from delta_sorter_spark import SortOptimizer
    SortOptimizer(uri).compact(sort_columns, ...)
    SortOptimizer(uri).validate(sort_columns, nulls="first")
"""

from delta_sorter_spark.api import SortOptimizer, compact, validate
from delta_sorter_spark.operators.validate import ValidationReport

__all__ = ["SortOptimizer", "compact", "validate", "ValidationReport"]
__version__ = "0.1.0"
