"""The --changed-only oracle fast lane: operator edits map to the registry
queries that exercise them, so the local re-verify loop covers exactly the
blast radius of a change (the driver's ~50-query/round rotation is the
backstop, not the only gate).  No Spark session needed — the map is a
static source scan."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import (  # noqa: E402
    changed_queries,
    query_dependencies,
)


def test_dependency_map_covers_known_edges():
    deps = query_dependencies()
    # every registry query is mapped and depends on the entry module
    assert len(deps) >= 120
    assert all("__spark_entry__" in d for d in deps.values())
    assert "delta_sorter_spark.operators.dedup" in deps["e56_repeated_spans"]
    assert "delta_sorter_spark.operators.graph" in deps["e13_dup_clusters"]
    assert "delta_sorter_spark.operators.events_analytics" in deps["a46_scd2_compress"]
    # pure-SQL TPC-H queries must NOT claim operator deps they don't have
    assert "delta_sorter_spark.operators.dedup" not in deps["a1_pricing_summary"]


def test_dependency_map_is_transitive():
    deps = query_dependencies()
    # dedup.py references operators.skew (salted-join fallback) and
    # operators.ranking (sorted neighborhood) — editing either must
    # re-select the dedup queries even though the entry imports only dedup
    assert "delta_sorter_spark.operators.skew" in deps["e56_repeated_spans"]
    assert "delta_sorter_spark.operators.ranking" in deps["e58_sorted_neighborhood"]


def test_changed_paths_select_dependents():
    sel = changed_queries(["delta_sorter_spark/operators/graph.py"])
    assert "e13_dup_clusters" in sel and "e55_dedup_keep_best" in sel
    assert "a1_pricing_summary" not in sel

    # entry edit -> everything; unrelated file -> nothing
    assert len(changed_queries(["__spark_entry__.py"])) >= 120
    assert changed_queries(["README.md", "tests/test_dml.py"]) == set()

    # package __init__ edit selects by prefix
    sel = changed_queries(["delta_sorter_spark/operators/__init__.py"])
    assert "e56_repeated_spans" in sel
