"""Small driver-side DataFrames without the per-action Python boundary.

``spark.createDataFrame(list_of_rows)`` in classic PySpark keeps the rows
PICKLED on the Python side: the resulting frame is backed by a Python RDD,
so EVERY action that evaluates it — a broadcast build, a coalesce(1)
parquet write, a count — spins up a Python worker to unpickle the rows
(measured ~5 s per action on this host, independent of row count; thread
dump shows the task blocked in ``BasePythonRunner$ReaderInputStream``).
The optimization guide's §4/§6 point applies to the DRIVER transfer too:
ship the rows to the JVM ONCE, as Arrow.

:func:`local_df` builds a ``pyarrow.Table`` from the rows and hands it to
``spark.createDataFrame`` (PySpark 4 accepts Arrow tables natively): the
data crosses to the JVM at creation time and later actions never touch
Python (measured ~0.1 s for the same writes).  Values round-trip
bit-exactly for the types the engine's small frames use (integers,
doubles, strings, binary, booleans, arrays/structs of those); for any
other type the helper falls back to the classic path rather than risk a
coercion difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SAFE_ATOMS = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.BinaryType,
    T.BooleanType,
)


def _arrow_safe(dt: T.DataType) -> bool:
    if isinstance(dt, _SAFE_ATOMS):
        return True
    if isinstance(dt, T.ArrayType):
        return _arrow_safe(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_arrow_safe(f.dataType) for f in dt.fields)
    return False


def _to_arrow_rows(value, dt: T.DataType):
    """Recursively shape a Python value for pyarrow (structs as dicts)."""
    if value is None:
        return None
    if isinstance(dt, T.ArrayType):
        return [_to_arrow_rows(v, dt.elementType) for v in value]
    if isinstance(dt, T.StructType):
        return {
            f.name: _to_arrow_rows(v, f.dataType)
            for f, v in zip(dt.fields, value)
        }
    return value


def local_df(spark: SparkSession, rows, schema: str | T.StructType) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that ships the rows as ONE
    Arrow table so no later action pays a Python-worker round trip.

    ``rows`` is a list of tuples/lists (structs may be tuples), ``schema``
    a DDL string or StructType.  Falls back to the classic path for types
    outside the engine's small-frame vocabulary (dates, timestamps,
    decimals, maps)."""
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    if not isinstance(st, T.StructType) or not all(
        _arrow_safe(f.dataType) for f in st.fields
    ):
        return spark.createDataFrame(rows, schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        arrays = []
        for i, f in enumerate(st.fields):
            col = [_to_arrow_rows(r[i], f.dataType) for r in rows]
            arrays.append(pa.array(col, type=to_arrow_type(f.dataType)))
        tbl = pa.Table.from_arrays(arrays, names=[f.name for f in st.fields])
        return spark.createDataFrame(tbl, st)
    except Exception:
        # never let the fast path change behavior — fall back verbatim
        return spark.createDataFrame(rows, schema)
