"""Driver-gate replica: every queries() entry must hash-match its DuckDB
oracle at sf0.001 (the driver runs the same compare at sf0.01 —
tools/oracle_check.py runs any SF standalone)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_match_oracle(spark):
    from oracle_check import run_checks

    failures = run_checks(spark, SF_DIR)
    assert not failures, failures


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries().keys()) >= set(e.oracle_sql().keys())
