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
from pyspark.sql import functions as F
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


# ---------------------------------------------------------------------------
# Per-column sort direction (reference roadmap README.md:183 — implemented
# here): compact + validate round trip with a mixed asc/desc spec.
# ---------------------------------------------------------------------------


def test_directed_compact_and_validate(spark, tmp_path):
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "dir")
    rows = [("A", 1), ("B", 3), ("A", 2), ("B", 1), ("A", 3), ("B", 2), (None, 9)]
    df = spark.createDataFrame(rows, "k string, v long")
    DeltaTable.create(spark, path, df.coalesce(1))

    # unsorted for the directed order -> violations
    before = validate(path, ["k", "v:desc"], spark=spark)
    assert before["boundary_violations"] >= 1

    compact(path, ["k", "v:desc"], repartition_by_sort_key=True, spark=spark)

    after = validate(path, ["k", "v:desc"], spark=spark)
    assert after["boundary_violations"] == 0
    # the data is genuinely (k asc, v desc): check physical row order
    got = [
        (r["k"], r["v"])
        for r in spark.read.parquet(*DeltaTable(spark, path).input_files())
        .withColumn("__f__", F.input_file_name())
        .collect()
    ]
    # nulls first (default), then k asc with v desc within k
    expect = [(None, 9), ("A", 3), ("A", 2), ("A", 1), ("B", 3), ("B", 2), ("B", 1)]
    assert got == expect
    # the ALL-ASC validation of the same table must now flag violations
    asc_report = validate(path, ["k", "v"], spark=spark)
    assert asc_report["boundary_violations"] >= 1


def test_directed_validate_multi_file_boundaries(spark, tmp_path):
    """Cross-file boundary semantics under a desc leading column: files are
    ordered by min key in the DIRECTED order and adjacent overlap is a
    violation."""
    from delta_sorter_spark.api import compact, validate
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "dirm")
    df = spark.range(0, 1000).select(F.col("id").alias("v"))
    DeltaTable.create(spark, path, df.repartition(4))
    assert validate(path, ["v:desc"], spark=spark)["boundary_violations"] >= 1
    compact(path, ["v:desc"], repartition_by_sort_key=True, spark=spark)
    assert validate(path, ["v:desc"], spark=spark)["boundary_violations"] == 0
    # and ascending validation sees the reversal
    assert validate(path, ["v"], spark=spark)["boundary_violations"] >= 1


def test_parse_sort_spec_errors():
    import pytest

    from delta_sorter_spark.functions.keys import parse_sort_spec

    assert parse_sort_spec(["a", "b:desc", "c:asc"]) == (
        ["a", "b", "c"],
        [True, False, True],
    )
    with pytest.raises(ValueError):
        parse_sort_spec(["a:sideways"])


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.integers(-3, 3)),
        ),
        min_size=1,
        max_size=12,
    ),
    nulls_first=st.booleans(),
    directions=st.tuples(st.booleans(), st.booleans()),
)
def test_directed_summaries_match_tuple_comparator(rows, nulls_first, directions):
    """Property: the vectorized directed file summary (pairwise descents +
    extreme rows) agrees with the driver-side tuple comparator on random
    data, for every direction/null-placement combination."""
    import functools

    import pandas as pd

    from delta_sorter_spark.functions.file_summary import summarize_key_frame
    from delta_sorter_spark.functions.keys import key_tuple_cmp

    dirs = list(directions)
    pdf = pd.DataFrame(rows, columns=["a", "b"], dtype="object")
    s = summarize_key_frame(pdf, ["a", "b"], nulls_first, dirs)

    cmp = functools.partial(key_tuple_cmp, nulls_first=nulls_first, directions=dirs)
    keys = [list(r) for r in rows]
    expected_descents = sum(
        1 for x, y in zip(keys, keys[1:]) if cmp(x, y) > 0
    )
    assert s["descents"] == expected_descents
    assert s["ascending"] == (expected_descents == 0)

    ordered = sorted(keys, key=functools.cmp_to_key(cmp))
    assert cmp(s["minKey"], ordered[0]) == 0
    assert cmp(s["maxKey"], ordered[-1]) == 0
