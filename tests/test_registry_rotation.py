"""Pins the driver-budget rotation guarantee: the checker covers the first
~50 registry entries per round, so queries() must order (1) red latest
checks, (2) implementation-changed entries, (3) by staleness.  With a
109-query registry and a 50-entry budget this bounds every query's staleness
at <= 2 missed rounds (ceil(109/50) = 3-round full-coverage cycle)."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_info():
    last_round, red = {}, {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(p))
        except (OSError, ValueError):
            continue
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        for k, v in data.items():
            if isinstance(v, dict):
                last_round[k] = rnd
                red[k] = not (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match") is not False
                )
    return last_round, red


def test_rotation_invariant():
    keys = list(entry.queries())
    last_round, red = _latest_info()
    latest = max(last_round.values(), default=0)
    pos = {k: i for i, k in enumerate(keys)}
    recheck = set(entry._RECHECK_THIS_ROUND)

    reds = [k for k in keys if red.get(k)]
    stale = [
        k
        for k in keys
        if k not in recheck and not red.get(k) and last_round.get(k, -1) < latest
    ]
    fresh = [
        k
        for k in keys
        if k not in recheck and not red.get(k) and last_round.get(k, -1) == latest
    ]
    # reds lead everything; recheck + stale all precede every fresh entry
    if reds and (recheck or stale or fresh):
        assert max(pos[k] for k in reds) < min(
            pos[k] for k in [*recheck, *stale, *fresh] if k in pos
        )
    if fresh and (recheck or stale):
        front = [pos[k] for k in recheck if k in pos] + [pos[k] for k in stale]
        assert max(front) < min(pos[k] for k in fresh), (
            "a fresh-checked query precedes a stale one: rotation broken"
        )
    # stale entries are ordered oldest-latest-check first
    rounds_in_order = [last_round.get(k, -1) for k in stale]
    assert rounds_in_order == sorted(rounds_in_order)


def test_recheck_list_names_real_queries():
    keys = set(entry.queries())
    missing = [k for k in entry._RECHECK_THIS_ROUND if k not in keys]
    assert not missing, missing


def test_oracle_keys_match_queries():
    """Every query has an oracle (or a documented rows-only omission); no
    orphan oracle entries."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert not o - q, f"oracles without queries: {sorted(o - q)}"
