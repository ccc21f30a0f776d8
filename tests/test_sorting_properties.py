"""Property-based compact/validate tests, porting the reference's hypothesis
suite (python/tests/test_sorting.py:20-63): for random single-column tables,

- validate succeeds iff Python sorted() agrees the input was sorted,
- compact then equals the sorted() oracle exactly,
- post-compact validate passes.

Strategies mirror the reference (test_sorting.py:15-19): ints, bools, finite
floats (NaN/inf excluded per :18), text.
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_sorter_spark.api import compact, validate
from delta_sorter_spark.sources.delta_table import DeltaTable

_settings = settings(
    max_examples=8,  # each example spins Spark jobs; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

STRATEGIES = {
    "long": st.integers(min_value=-10, max_value=10),
    "boolean": st.booleans(),
    "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "string": st.text(min_size=0, max_size=8),
}

_counter = [0]


def _roundtrip(spark, tmp_root, dtype, values):
    _counter[0] += 1
    path = os.path.join(tmp_root, f"prop_{dtype}_{_counter[0]}")
    df = spark.createDataFrame([(v,) for v in values], f"`values` {dtype}")
    DeltaTable.create(spark, path, df.coalesce(1))

    report = validate(path, ["values"], spark=spark)
    was_sorted = values == sorted(values)
    assert (report["boundary_violations"] == 0) == was_sorted

    compact(path, ["values"], spark=spark)
    got = [
        r["values"]
        for r in DeltaTable(spark, path).to_df().orderBy("values").collect()
    ]
    assert got == sorted(values)
    assert validate(path, ["values"], spark=spark)["boundary_violations"] == 0


@pytest.fixture(scope="module")
def tmp_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop_tables"))


@given(values=st.lists(STRATEGIES["long"], min_size=1, max_size=5))
@_settings
def test_sorting_property_int(spark, tmp_root, values):
    _roundtrip(spark, tmp_root, "long", values)


@given(values=st.lists(STRATEGIES["boolean"], min_size=1, max_size=5))
@_settings
def test_sorting_property_bool(spark, tmp_root, values):
    _roundtrip(spark, tmp_root, "boolean", values)


@given(values=st.lists(STRATEGIES["double"], min_size=1, max_size=5))
@_settings
def test_sorting_property_float(spark, tmp_root, values):
    _roundtrip(spark, tmp_root, "double", values)


@given(values=st.lists(STRATEGIES["string"], min_size=1, max_size=5))
@_settings
def test_sorting_property_string(spark, tmp_root, values):
    _roundtrip(spark, tmp_root, "string", values)
