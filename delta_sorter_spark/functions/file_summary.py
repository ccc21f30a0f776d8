"""Vectorized per-file sort-key summaries (min/max tuple, monotonicity).

The reference computes these with a row-at-a-time loop over Arrow batches
(reference lib.rs:600-665: running min/max tuple + adjacent-row monotonicity,
early break at lib.rs:649-658).  We compute the same facts vectorized with
numpy over a pandas frame of just the key columns:

- ``pairwise_cmp``  — lexicographic compare of each row against the next
  (null-placement aware), one numpy pass per key column;
- exact **min/max key tuples** via successive filtering (argmin over a
  lexicographic order without sorting): O(rows x key_cols);
- intra-file violation count = number of descents (the reference records one
  violation per non-ascending *file*, lib.rs:500-509 — both counts are
  returned so the report can keep reference parity and the useful split).

Used in two places:
1. write path (``DeltaTable.stage_write``) to attest exact key stats into the
   Delta log, making later validation metadata-only;
2. validator scan path, inside a Pandas-UDF over the file list, for files
   that lack attested key stats (e.g. written by other engines).

Why not plain per-column min/max stats?  The minimum of a lexicographic
*tuple* is not the tuple of per-column minima — boundary checking needs the
actual extreme rows, which is exactly what the reference's scan produces.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd


def _null_mask(s: pd.Series) -> np.ndarray:
    return s.isna().to_numpy()


def _cmp_values(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise sign(a <=> b) for equal-length arrays of comparable,
    non-null values."""
    out = np.zeros(len(a), dtype=np.int8)
    out[a > b] = 1
    out[a < b] = -1
    return out


def pairwise_cmp(
    pdf: pd.DataFrame,
    sort_columns: Sequence[str],
    nulls_first: bool,
    directions: Sequence[bool] | None = None,
) -> np.ndarray:
    """sign(row[i] <=> row[i+1]) under the configured tuple ordering; length
    is ``len(pdf) - 1``.  A value of +1 at i means row i > row i+1 (a descent,
    i.e. a sortedness violation).  ``directions`` flips the value comparison
    for descending columns (null placement stays output-order)."""
    n = len(pdf)
    if n < 2:
        return np.zeros(0, dtype=np.int8)
    result = np.zeros(n - 1, dtype=np.int8)
    undecided = np.ones(n - 1, dtype=bool)
    null_rank, val_rank = (0, 1) if nulls_first else (1, 0)
    dirs = list(directions) if directions is not None else [True] * len(sort_columns)
    for col, asc in zip(sort_columns, dirs):
        if not undecided.any():
            break
        s = pdf[col]
        nulls = _null_mask(s)
        flags = np.where(nulls, null_rank, val_rank)
        f_a, f_b = flags[:-1], flags[1:]
        col_cmp = np.sign(f_a.astype(np.int8) - f_b.astype(np.int8)).astype(np.int8)
        # where flags tie and both are non-null, compare values
        both_vals = (f_a == f_b) & ~nulls[:-1] & ~nulls[1:]
        if both_vals.any():
            vals = s.to_numpy()
            idx = np.nonzero(both_vals)[0]
            vc = _cmp_values(vals[idx], vals[idx + 1])
            col_cmp[idx] = vc if asc else -vc
        result = np.where(undecided & (col_cmp != 0), col_cmp, result)
        undecided = undecided & (col_cmp == 0)
    return result


def _extreme_row_index(
    pdf: pd.DataFrame,
    sort_columns: Sequence[str],
    nulls_first: bool,
    want_max: bool,
    directions: Sequence[bool] | None = None,
) -> int:
    """Index of the lexicographically minimal/maximal row (in the configured
    file order), by successively narrowing the candidate set one key column
    at a time (no sort).  For a descending column the file-order maximum is
    the value-wise minimum."""
    mask = np.ones(len(pdf), dtype=bool)
    dirs = list(directions) if directions is not None else [True] * len(sort_columns)
    for col, asc in zip(sort_columns, dirs):
        if mask.sum() <= 1:
            break
        s = pdf[col]
        nulls = _null_mask(s)
        cand_nulls = mask & nulls
        cand_vals = mask & ~nulls
        # does the extreme lie among nulls or among values?
        null_extreme = (nulls_first and not want_max) or ((not nulls_first) and want_max)
        if null_extreme:
            if cand_nulls.any():
                mask = cand_nulls
                continue
        else:
            if not cand_vals.any():
                mask = cand_nulls
                continue
        if not cand_vals.any():
            mask = cand_nulls
            continue
        vals = s[cand_vals]
        want_value_max = want_max == asc
        target = vals.max() if want_value_max else vals.min()
        mask = cand_vals & (s == target).to_numpy()
    return int(np.nonzero(mask)[0][0])


def summarize_key_frame(
    pdf: pd.DataFrame,
    sort_columns: Sequence[str],
    nulls_first: bool,
    directions: Sequence[bool] | None = None,
) -> dict:
    """Exact summary of one file's key columns.

    Returns ``{"numRows", "minKey", "maxKey", "ascending", "descents"}`` where
    min/max keys are lists of raw python values (None for null), extreme in
    the CONFIGURED file order (per-column direction aware), and ``descents``
    counts adjacent-row violations in physical row order.
    """
    n = len(pdf)
    if n == 0:
        return {"numRows": 0, "minKey": None, "maxKey": None, "ascending": True, "descents": 0}
    pdf = pdf.reset_index(drop=True)

    def row_key(i: int) -> list:
        out = []
        for c in sort_columns:
            v = pdf[c].iloc[i]
            out.append(None if pd.isna(v) else v)
        return out

    cmps = pairwise_cmp(pdf, sort_columns, nulls_first, directions)
    descents = int((cmps == 1).sum())
    i_min = _extreme_row_index(pdf, sort_columns, nulls_first, want_max=False,
                               directions=directions)
    i_max = _extreme_row_index(pdf, sort_columns, nulls_first, want_max=True,
                               directions=directions)
    return {
        "numRows": n,
        "minKey": row_key(i_min),
        "maxKey": row_key(i_max),
        "ascending": descents == 0,
        "descents": descents,
    }
