"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row-count, column names, and order-insensitive values.

Usage:
  python tools/oracle_check.py [sf_dir] [query ...]
  python tools/oracle_check.py --changed-only [sf_dir]

``--changed-only`` is the CI fast lane: it statically maps every registry
query to the ``delta_sorter_spark`` modules its callable (transitively)
touches, asks git which files changed (worktree vs HEAD, plus the last
commit), and re-verifies only the dependent queries — so an operator edit
gets its oracle re-check the same session instead of waiting out the
driver's ~50-query/round rotation.  An ``__spark_entry__.py`` change
selects everything (the registry itself moved)."""

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


_PKG_REF = r"delta_sorter_spark(?:\.\w+)+"


def _module_refs(modname: str) -> set[str]:
    """Dotted ``delta_sorter_spark.*`` names referenced in a module's source
    (covers both top-level and function-local imports)."""
    import importlib
    import inspect
    import re

    try:
        src = inspect.getsource(importlib.import_module(modname))
    except Exception:
        return set()
    return set(re.findall(_PKG_REF, src))


def query_dependencies() -> dict[str, set[str]]:
    """query id -> transitively-closed set of delta_sorter_spark modules its
    callable touches (static source scan; function-local imports included).
    Every query additionally depends on ``__spark_entry__`` itself."""
    import inspect
    import re

    import __spark_entry__ as entrymod

    closure_cache: dict[str, set[str]] = {}

    def close(mods: set[str]) -> set[str]:
        out: set[str] = set()
        stack = list(mods)
        while stack:
            m = stack.pop()
            if m in out:
                continue
            out.add(m)
            if m not in closure_cache:
                closure_cache[m] = _module_refs(m)
            stack.extend(closure_cache[m] - out)
        return out

    deps: dict[str, set[str]] = {}
    for name, fn in entrymod.queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        direct = set(re.findall(_PKG_REF, src))
        # every query flows through the entry module's shared loaders
        direct.add("delta_sorter_spark.sources.tables")
        deps[name] = close(direct) | {"__spark_entry__"}
    return deps


def _path_to_module(path: str) -> str | None:
    if path == "__spark_entry__.py":
        return "__spark_entry__"
    if path.startswith("delta_sorter_spark/") and path.endswith(".py"):
        mod = path[: -len(".py")].replace("/", ".")
        return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod
    return None


def changed_queries(changed_paths) -> set[str]:
    """Registry queries whose dependency closure intersects the changed
    files.  A prefix match handles package ``__init__`` edits (changing
    ``delta_sorter_spark/operators/__init__.py`` selects every query that
    touches any operators module)."""
    mods = {m for m in (_path_to_module(p) for p in changed_paths) if m}
    if not mods:
        return set()
    out = set()
    for q, ds in query_dependencies().items():
        if any(d == m or d.startswith(m + ".") for d in ds for m in mods):
            out.add(q)
    return out


def git_changed_paths(repo: str) -> list[str]:
    """Files changed in the worktree vs HEAD plus the last commit."""
    import subprocess

    paths: set[str] = set()
    for args in (["git", "diff", "--name-only", "HEAD"],
                 ["git", "diff", "--name-only", "HEAD~1..HEAD"]):
        try:
            res = subprocess.run(
                args, cwd=repo, capture_output=True, text=True, check=True
            )
            paths.update(l.strip() for l in res.stdout.splitlines() if l.strip())
        except subprocess.CalledProcessError:
            pass  # e.g. a repo with a single commit has no HEAD~1
    return sorted(paths)


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
    args = sys.argv[1:]
    changed_only = "--changed-only" in args
    if changed_only:
        args = [a for a in args if a != "--changed-only"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if changed_only:
        changed = git_changed_paths(REPO)
        only = changed_queries(changed)
        print(f"changed files: {len(changed)}; dependent queries: {len(only)}")
        if not only:
            print("nothing to re-verify")
            return 0
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
