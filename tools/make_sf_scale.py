"""Deterministic scale-up of the driver's sf0.1 fixture for scale-proof
benchmarks (VERDICT r7 #1): replicate each fact table K times with
key-space shifts so a generated sfN dir has N/0.1 the rows of sf0.1 with
the same schema, value distributions, and join relationships — derived
entirely from the existing read-only fixture (nothing invented).

The point is MEASURING how the engine's pruned/incremental paths scale
(zone-map reads, Bloom lookups, probed ANN, incremental OPTIMIZE), so
what matters is that key cardinalities and file counts grow ~K×, not
TPC-H dbgen fidelity.

Dimension tables (region/nation/customer/supplier/part) copy verbatim —
facts keep referencing them, exactly like raising TPC-H's SF.

Per-table specifics:
- lineitem/orders: orderkey shifted by K·(max+1) per replica — the
  upsert/Bloom key space really grows.
- documents: doc_id shifted; text gets a per-replica 2-word prefix so the
  LSH/near-dup workload keeps its duplicate RATE instead of gaining 9
  exact copies of every document.
- embeddings: vec_id shifted; the vector is rotated by r positions per
  replica r (norm-preserving, deterministic) so ANN centroids see new
  points, not 10 coincident copies.
- events: event_id/user_id shifted, timestamps kept — stream density
  scales, the windowing span stays.

Usage: python tools/make_sf_scale.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/sfscale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ("region", "nation", "customer", "supplier", "part")


def build(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(name: str, sql: str) -> None:
        dest = os.path.join(out, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    def src_tbl(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    for d in DIMS:
        write(d, f"SELECT * FROM {src_tbl(d)}")

    okey_shift = (
        con.execute(
            f"SELECT max(o_orderkey) + 1 FROM {src_tbl('orders')}"
        ).fetchone()[0]
    )
    reps = f"(SELECT unnest(range(0, {k})) AS r)"

    write(
        "orders",
        f"SELECT o_orderkey + r * {okey_shift} AS o_orderkey, o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM {src_tbl('orders')} CROSS JOIN {reps}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + r * {okey_shift} AS l_orderkey, l_partkey,"
        " l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM {src_tbl('lineitem')} CROSS JOIN {reps}",
    )

    did_shift = con.execute(
        f"SELECT max(doc_id) + 1 FROM {src_tbl('documents')}"
    ).fetchone()[0]
    # Per-replica WORD suffixing (not a prefix): every token of replica r
    # becomes token||r, so replicas share NO shingles with each other —
    # cross-replica pairs never become near-dups (a prefix-only variant
    # made every doc a 10-way near-dup cluster and blew the LSH candidate
    # count up 27x instead of 10x).  Within a replica both members of an
    # organic near-dup pair get the same transformation, so the corpus's
    # duplicate RATE is preserved — which is the property the LSH scaling
    # measurement needs.
    write(
        "documents",
        f"SELECT doc_id + r * {did_shift} AS doc_id,"
        " CASE WHEN r = 0 THEN text"
        " ELSE regexp_replace(text, '([a-z0-9]+)',"
        "      '\\1' || CAST(r AS VARCHAR), 'g') END AS text,"
        " lang, source,"
        " CASE WHEN r = 0 THEN n_chars ELSE len("
        "   regexp_replace(text, '([a-z0-9]+)',"
        "   '\\1' || CAST(r AS VARCHAR), 'g')) END AS n_chars"
        f" FROM {src_tbl('documents')} CROSS JOIN {reps}",
    )

    vid_shift = con.execute(
        f"SELECT max(vec_id) + 1 FROM {src_tbl('embeddings')}"
    ).fetchone()[0]
    dim = con.execute(
        f"SELECT len(embedding) FROM {src_tbl('embeddings')} LIMIT 1"
    ).fetchone()[0]
    # rotate by r: element i of replica r = embedding[(i + r) % dim + 1]
    write(
        "embeddings",
        f"SELECT vec_id + r * {vid_shift} AS vec_id,"
        f" list_transform(range(0, {dim}), i ->"
        f"   embedding[CAST((i + r) % {dim} + 1 AS INT)]) AS embedding,"
        " label"
        f" FROM {src_tbl('embeddings')} CROSS JOIN {reps}",
    )

    eid_shift = con.execute(
        f"SELECT max(event_id) + 1 FROM {src_tbl('events')}"
    ).fetchone()[0]
    uid_shift = con.execute(
        f"SELECT max(user_id) + 1 FROM {src_tbl('events')}"
    ).fetchone()[0]
    write(
        "events",
        f"SELECT event_id + r * {eid_shift} AS event_id, ts,"
        f" user_id + r * {uid_shift} AS user_id, event_type, value, props"
        f" FROM {src_tbl('events')} CROSS JOIN {reps}",
    )


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale/sf1"
    build(k, src, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
