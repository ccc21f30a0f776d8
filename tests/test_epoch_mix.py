"""epoch_capped_mix (operators/sampling.py) vs a pure-Python iterative
water-filling reference: the windowed prefix formulation must equal the
sequential clamp-and-redistribute loop on any domain profile."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_sorter_spark.operators.sampling import epoch_capped_mix


def _py_waterfall(domains: dict, budget: int, epochs: int) -> dict:
    items = sorted(
        domains.items(), key=lambda kv: (kv[1][0] * epochs / kv[1][1], kv[0])
    )
    rem_b, rem_w = budget, sum(w for _, (_, w) in domains.items())
    out, boundary = {}, None
    for s, (n, w) in items:
        cap = n * epochs
        if boundary is None and cap * rem_w <= w * rem_b:
            out[s] = cap
            rem_b -= cap
            rem_w -= w
        else:
            boundary = (rem_b, rem_w)
            out[s] = max((w * rem_b) // rem_w, 0)
    return out


DOMAINS = st.dictionaries(
    st.sampled_from([f"s{i}" for i in range(8)]),
    st.tuples(st.integers(1, 40), st.integers(1, 9)),
    min_size=1,
    max_size=8,
)


@given(
    domains=DOMAINS,
    budget=st.integers(0, 400),
    epochs=st.integers(1, 4),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_epoch_capped_mix_matches_waterfall(spark, domains, budget, epochs):
    rows = []
    for s, (n, w) in domains.items():
        rows += [(s, w)] * n
    df = spark.createDataFrame(rows, "source string, wt long")
    got = {
        r["source"]: (r["alloc_docs"], r["epochs_milli"])
        for r in epoch_capped_mix(
            df, "source", budget, epochs, weight_expr="wt"
        ).collect()
    }
    exp = _py_waterfall(domains, budget, epochs)
    for s, (n, _) in domains.items():
        assert got[s][0] == exp[s], (s, domains, budget, epochs, got, exp)
        assert got[s][1] == (1000 * exp[s]) // n


def test_epoch_cap_binds_and_redistributes(spark):
    # 10-doc head domain, 100-doc tail; equal weight; budget 60, cap 2
    rows = [("head", 1)] * 10 + [("tail", 1)] * 100
    df = spark.createDataFrame(rows, "source string, wt long")
    got = {
        r["source"]: r.asDict()
        for r in epoch_capped_mix(df, "source", 60, 2, "wt").collect()
    }
    # uncapped proportional would be 30/30; head caps at 20, surplus -> tail
    assert got["head"]["capped"] is True
    assert got["head"]["alloc_docs"] == 20
    assert got["head"]["epochs_milli"] == 2000
    assert got["tail"]["capped"] is False
    assert got["tail"]["alloc_docs"] == 40
    assert got["tail"]["epochs_milli"] == 400


def test_zero_weight_domain_excluded_not_crashed(spark):
    """weight 0 is the exclude-this-domain config: alloc 0, never capped,
    no divide-by-zero under ANSI mode, surplus flows to weighted domains."""
    rows = [("keep", 2)] * 10 + [("skip", 0)] * 10
    df = spark.createDataFrame(rows, "source string, wt long")
    got = {
        r["source"]: r.asDict()
        for r in epoch_capped_mix(df, "source", 12, 3, "wt").collect()
    }
    assert got["skip"]["alloc_docs"] == 0
    assert got["skip"]["capped"] is False
    assert got["keep"]["alloc_docs"] == 12  # whole budget, under its cap 30
    # all-zero weights: everything allocates 0, nothing errors
    df0 = spark.createDataFrame([("a", 0), ("b", 0)], "source string, wt long")
    out = epoch_capped_mix(df0, "source", 5, 2, "wt").collect()
    assert all(r["alloc_docs"] == 0 for r in out)
