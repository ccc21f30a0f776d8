"""Portable deterministic hashing shared by the Spark operators and the
DuckDB oracle SQL.

Everything here must produce IDENTICAL values in Spark SQL and DuckDB so the
driver's value-hash correctness gate can verify MinHash/SimHash/LSH operators
exactly (SURVEY §2.7 E1-E4 require oracle-checkable semantics; E2's MinHash
is seeded/deterministic).

The base primitive is md5 -> first 15 hex digits -> bigint (60 bits, fits
int64 in both engines):

    Spark : CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

MinHash permutations are affine maps ``(a*x + b) mod P`` over ``P = 2^31-1``
with x pre-reduced mod P so products stay below 2^62 (no int64 overflow in
either engine).  Parameters come from a fixed LCG seeded at 42 — pure Python,
reproducible, no numpy dependency in the SQL path.
"""

from __future__ import annotations

MERSENNE_P = (1 << 31) - 1  # 2147483647


def spark_md5_long_sql(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duckdb_md5_long_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs, 1 <= a < P, 0 <= b < P (LCG, seed 42)."""
    state = seed
    out = []

    def nxt() -> int:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return state

    for _ in range(k):
        a = 1 + nxt() % (MERSENNE_P - 1)
        b = nxt() % MERSENNE_P
        out.append((a, b))
    return out


def minhash_perm_sql(hash_expr: str, a: int, b: int) -> str:
    """SQL for one affine permutation of a 60-bit hash value; valid in both
    Spark SQL and DuckDB."""
    return f"(({a} * ({hash_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH over embeddings, rounded
    to 6 decimals so they can be embedded as SQL literals exactly."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(v), 6) for v in row] for row in planes]
