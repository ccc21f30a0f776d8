"""Unit tests for the vectorized per-file key summaries (min/max tuple,
monotonicity) against brute-force Python oracles."""

import random
from functools import cmp_to_key

import pandas as pd
import pytest

from delta_sorter_spark.functions.file_summary import pairwise_cmp, summarize_key_frame
from delta_sorter_spark.functions.keys import key_tuple_cmp


def brute_min_max(rows, nulls_first):
    ordered = sorted(rows, key=cmp_to_key(lambda a, b: key_tuple_cmp(a, b, nulls_first)))
    return list(ordered[0]), list(ordered[-1])


def brute_descents(rows, nulls_first):
    return sum(
        1 for a, b in zip(rows, rows[1:]) if key_tuple_cmp(a, b, nulls_first) > 0
    )


@pytest.mark.parametrize("nulls_first", [True, False])
@pytest.mark.parametrize("seed", range(8))
def test_random_frames_match_bruteforce(seed, nulls_first):
    rng = random.Random(seed)
    n = rng.randint(1, 40)
    rows = []
    for _ in range(n):
        a = rng.choice([None, rng.randint(-5, 5)])
        b = rng.choice([None, rng.choice("abcde")])
        rows.append((a, b))
    pdf = pd.DataFrame(rows, columns=["a", "b"]).astype({"a": "object", "b": "object"})
    s = summarize_key_frame(pdf, ["a", "b"], nulls_first)
    exp_min, exp_max = brute_min_max(rows, nulls_first)
    assert s["minKey"] == exp_min
    assert s["maxKey"] == exp_max
    assert s["descents"] == brute_descents(rows, nulls_first)
    assert s["ascending"] == (s["descents"] == 0)


def test_empty_frame():
    pdf = pd.DataFrame({"a": []})
    s = summarize_key_frame(pdf, ["a"], True)
    assert s == {"numRows": 0, "minKey": None, "maxKey": None, "ascending": True, "descents": 0}


def test_pairwise_cmp_basic():
    pdf = pd.DataFrame({"a": [1, 1, 2, 0], "b": ["x", "y", "a", "a"]})
    cmps = pairwise_cmp(pdf, ["a", "b"], True)
    assert list(cmps) == [-1, -1, 1]


def test_nulls_first_vs_last():
    pdf = pd.DataFrame({"a": [None, 1, 2]}, dtype="object")
    assert summarize_key_frame(pdf, ["a"], True)["ascending"] is True
    assert summarize_key_frame(pdf, ["a"], False)["ascending"] is False
    assert summarize_key_frame(pdf, ["a"], False)["minKey"] == [1]
    assert summarize_key_frame(pdf, ["a"], False)["maxKey"] == [None]


def test_timestamps():
    ts = pd.to_datetime(["2021-01-02", "2021-01-01", "2021-01-03"])
    pdf = pd.DataFrame({"t": ts})
    s = summarize_key_frame(pdf, ["t"], True)
    assert s["descents"] == 1
    assert s["minKey"][0] == pd.Timestamp("2021-01-01")
    assert s["maxKey"][0] == pd.Timestamp("2021-01-03")
