"""Golden-string tests for typed predicate rendering, ported from the
reference's Rust unit tests (lib.rs:1066-1105)."""

from pyspark.sql import types as T

from delta_sorter_spark.functions.predicates import (
    render_partition_predicate,
    validate_sort_columns,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("amount", T.DecimalType(10, 2)),
        T.StructField("country", T.StringType()),
        T.StructField("region", T.StringType()),
    ]
)


def test_predicate_typing_numbers_strings_null():
    # golden string from lib.rs:1091-1095
    pred = render_partition_predicate(
        {
            "id": "42",
            "active": "true",
            "amount": "1234.50",
            "country": "US",
            "region": "null",
        },
        SCHEMA,
    )
    assert (
        pred
        == '"active" = TRUE AND "amount" = 1234.50 AND "country" = \'US\' AND "id" = 42 AND "region" IS NULL'
    )


def test_unknown_type_quotes_as_string():
    # lib.rs:1098-1104: a column missing from the schema is quoted
    pred = render_partition_predicate({"mystery": "abc"}, SCHEMA)
    assert pred == '"mystery" = \'abc\''


def test_untyped_fallback_quotes_everything():
    pred = render_partition_predicate({"a": "5", "b": "x"}, schema=None)
    assert pred == '"a" = \'5\' AND "b" = \'x\''


def test_string_escaping():
    pred = render_partition_predicate({"s": "O'Brien"}, SCHEMA)
    assert pred == '"s" = \'O\'\'Brien\''


def test_null_case_insensitive():
    assert render_partition_predicate({"r": "NULL"}, SCHEMA) == '"r" IS NULL'
    assert render_partition_predicate({"r": None}, SCHEMA) == '"r" IS NULL'


def test_bool_unparsable_quoted():
    schema = T.StructType([T.StructField("b", T.BooleanType())])
    assert render_partition_predicate({"b": "yes"}, schema) == '"b" = \'yes\''
    assert render_partition_predicate({"b": "FALSE"}, schema) == '"b" = FALSE'


def test_int_unparsable_quoted():
    schema = T.StructType([T.StructField("i", T.IntegerType())])
    assert render_partition_predicate({"i": "4x2"}, schema) == '"i" = \'4x2\''


def test_decimal_rejects_other_chars():
    schema = T.StructType([T.StructField("d", T.DecimalType(10, 2))])
    assert render_partition_predicate({"d": "12.3e4"}, schema) == '"d" = \'12.3e4\''
    assert render_partition_predicate({"d": "+12.30"}, schema) == '"d" = +12.30'


def test_validate_sort_columns_error_lists_fields():
    import pytest

    with pytest.raises(ValueError, match="missing sort columns"):
        validate_sort_columns(SCHEMA, ["id", "nope"])
    validate_sort_columns(SCHEMA, ["id", "country"])  # no raise


def test_date_timestamp_literal_forms():
    """DATE/TIMESTAMP literal forms in typed predicates (reference roadmap
    README.md:183, quoted-string fallback there lib.rs:976-980)."""
    from pyspark.sql import types as T

    from delta_sorter_spark.functions.predicates import render_partition_predicate

    schema = T.StructType(
        [
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tn", T.TimestampNTZType()),
        ]
    )
    got = render_partition_predicate(
        {"d": "2024-03-01", "ts": "2024-03-01 12:30:00", "tn": "2024-03-01T06:00:00"},
        schema,
    )
    assert got == (
        '"d" = DATE \'2024-03-01\' AND "tn" = TIMESTAMP \'2024-03-01T06:00:00\''
        ' AND "ts" = TIMESTAMP \'2024-03-01 12:30:00\''
    )
    # unparseable values keep the reference's quoted-string fallback
    assert render_partition_predicate({"d": "not-a-date"}, schema) == "\"d\" = 'not-a-date'"


def test_date_partition_filter_expr_prunes(spark, tmp_path):
    """A date-partitioned table filtered via partition_filter_expr returns
    exactly the partition's rows (typed literal, not string compare)."""
    import datetime

    from delta_sorter_spark.functions.predicates import partition_filter_expr
    from delta_sorter_spark.sources.delta_table import DeltaTable

    path = str(tmp_path / "dpart")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 3, 1)), (2, datetime.date(2024, 3, 2))],
        "id long, d date",
    )
    DeltaTable.create(spark, path, df, partition_columns=["d"])
    t = DeltaTable(spark, path)
    got = t.to_df().where(
        partition_filter_expr({"d": "2024-03-01"}, t.metadata.schema)
    )
    assert [r["id"] for r in got.collect()] == [1]
