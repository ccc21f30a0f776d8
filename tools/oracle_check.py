"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row-count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)


def normalize(rows, colnames):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", repr(v)))
            elif isinstance(v, int):
                vals.append(("i", v))
            elif v is None:
                vals.append(("n",))
            else:
                try:
                    import decimal

                    if isinstance(v, decimal.Decimal):
                        vals.append(("f", repr(float(v))))
                        continue
                except Exception:
                    pass
                vals.append(("s", str(v)))
        out.append(tuple(vals))
    return sorted(out)


def run_checks(spark, sf_dir: str, only: set[str] | None = None) -> list[tuple[str, str]]:
    """Run the driver-style compare; returns [(query, problem)] failures."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for name in entrymod.__dict__.get("_ALL_TABLES", []) or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    queries = entrymod.queries()
    only = only or set()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            sn = normalize(srows, scols)
            dn = normalize(drows, dcols)
            if sn != dn:
                diff = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(p[:300] for p in problems)}")
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    failures = run_checks(spark, sf_dir, only)
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
