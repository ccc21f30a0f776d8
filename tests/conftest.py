import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# ---------------------------------------------------------------------------
# Suite tiers.  `pytest -m "not slow"` is the FAST tier (the per-commit
# gate): the full-registry sf0.001 oracle parity check plus every unit
# suite — ~13 min idle-host.  `-m slow` adds the emulator (moto/Azurite
# protocol), streaming, hypothesis/property, tokenizer-reference-replay
# and stress/cross-validation tests (~30 min).  `make test` still runs
# everything.  Files (and a few individually heavy cross-checks) are
# marked here centrally so a new test lands in the right tier by its
# module, not by remembering a decorator.
# ---------------------------------------------------------------------------

SLOW_FILES = {
    "test_wordpiece.py",            # python-reference replays, minutes-scale
    "test_streaming.py",            # micro-batch drains with wall-clock waits
    "test_property_extensions.py",  # hypothesis
    "test_sorting_properties.py",   # hypothesis
    "test_fs_objectstore.py",       # moto S3 emulator e2e
    "test_fs_azure_gcs.py",         # Azure/GCS protocol emulation
    "test_graph_skew.py",           # skew stress
    "test_ann_index.py",            # lifecycle integration (oracle gate still covers q18-q20)
    "test_tpch_extra.py",           # adapted-TPC-H extras (oracle gate covers the a-queries)
    "test_delta_source.py",         # streaming data source drains
}
SLOW_TESTS = {
    "test_validate_and_compact.py::test_spark_check_path_matches_driver_path",
    "test_validate_and_compact.py::test_bin_pack_compact_coalesces_small_files",
    "test_validate_and_compact.py::test_concurrent_compacts_conflict_safe",
    # clustering integration variants: the fast tier keeps the core
    # register/optimize/converge/prune coverage; these stress interplay
    "test_liquid_clustering.py::test_concurrent_append_during_optimize_survives",
    "test_liquid_clustering.py::test_vacuum_collects_pre_cluster_files",
    "test_liquid_clustering.py::test_clone_carries_clustering",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        bare = f"{fname}::{item.name.split('[', 1)[0]}"
        if fname in SLOW_FILES or bare in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

# Executors' Python workers must be able to import delta_sorter_spark
# (mapInPandas closures in the validator). Must be set before JVM start.
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("delta-sorter-spark-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
