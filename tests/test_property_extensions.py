"""Property-based tests for the round-3 extension operators: BM25 scoring
against a pure-Python oracle, and resample_ffill against a reference
forward-fill — random small inputs, exact integer agreement."""

import math
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_settings = settings(
    max_examples=6,  # each example runs Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=6,
)


def _bm25_oracle(texts):
    """Pure-Python mirror of operators/retrieval.bm25_postings' integer
    formula (same fixed-point constants)."""
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in enumerate(texts)}
    n_docs = len(texts)
    total = sum(len(v) for v in toks.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        for t in set(ts):
            tf = ts.count(t)
            idf_bits = (n_docs // df[t]).bit_length() - 1
            d_ppm = 1_000_000 * tf + 300_000 + (900_000 * len(ts) * n_docs) // total
            tf_ppm = (2_200_000_000_000 * tf) // d_ppm
            out[(i, t)] = idf_bits * tf_ppm
    return out


@given(docs_strategy)
@_settings
def test_bm25_postings_match_python_oracle(spark, texts):
    from delta_sorter_spark.operators.retrieval import bm25_postings

    # skip corpora with zero tokens overall (total_len=0 -> no postings)
    if not any(t.strip() for t in texts):
        return
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["term_score"]
        for r in bm25_postings(df, "doc_id", "text").collect()
    }
    assert got == _bm25_oracle(texts)


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # minute offset
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(series_strategy)
@_settings
def test_resample_ffill_matches_python_oracle(spark, points):
    from delta_sorter_spark.operators.timeseries import resample_ffill

    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(minutes=m), v) for m, v in points]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    step = 120  # 2-minute grid
    got = {
        r["bucket_start"]: (r["value_ppm"], r["filled"])
        for r in resample_ffill(df, "k", "ts", "v", step_s=step).collect()
    }

    # python oracle: max ppm value per bucket, full grid, forward fill.
    # ntz timestamps are UTC wall-clock in this repo (session TZ pinned),
    # so the oracle must use UTC epoch math too — naive .timestamp() would
    # shift bucket keys by the OS timezone offset
    buckets = {}
    for m, v in points:
        dt = (base + timedelta(minutes=m)).replace(tzinfo=timezone.utc)
        b = (int(dt.timestamp()) // step) * step
        q = math.floor(v * 1_000_000)
        buckets[b] = max(buckets.get(b, q), q)
    lo, hi = min(buckets), max(buckets)
    expect = {}
    last = None
    for b in range(lo, hi + step, step):
        key = datetime.fromtimestamp(b, timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        if b in buckets:
            last = buckets[b]
            expect[key] = (last, 0)
        else:
            expect[key] = (last, 1)
    assert got == expect


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(  # per-document token lists over a tiny vocabulary, so cross-
        st.lists(  # document n-gram repeats actually occur
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_repeated_spans_match_python_oracle(spark, docs_tokens):
    """repeated_ngram_spans == a pure-Python reference: n-grams shared by
    >= 2 distinct docs, positions merged into maximal intervals."""
    from delta_sorter_spark.operators.dedup import repeated_ngram_spans

    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    # python oracle ------------------------------------------------------
    # NB: Spark's split('\s+') on an empty string yields [''], matching
    # " ".join([]) == "" -> [""]; replicate that tokenization exactly
    toks_by_doc = {i: (t.split(" ") if t else [""]) for i, t in rows}
    gram_docs = {}
    for i, toks in toks_by_doc.items():
        for p in range(max(0, len(toks) - n + 1)):
            gram_docs.setdefault(" ".join(toks[p : p + n]), set()).add(i)
    repeated = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = set()
    for i, toks in toks_by_doc.items():
        hits = sorted(
            p
            for p in range(max(0, len(toks) - n + 1))
            if " ".join(toks[p : p + n]) in repeated
        )
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + n)
            else:
                spans.append([p, p + n])
        expected |= {(i, s, e, e - s) for s, e in spans}
    # spark --------------------------------------------------------------
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in repeated_ngram_spans(df, "doc_id", "text", n=n, min_docs=2).collect()
    }
    assert got == expected


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 500)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 10),
)
def test_weighted_priority_sample_matches_python_oracle(spark, rows, k):
    """The sampled set equals the exact top-k of the integer priority
    formula replayed in pure Python (portable md5 hash, integer division,
    (priority desc, id asc) ordering)."""
    import hashlib

    from delta_sorter_spark.operators.sampling import weighted_priority_sample

    seed, scale = "prop-seed", 1_000_000

    def u(doc_id):
        h = int(hashlib.md5(f"{seed}{doc_id}".encode()).hexdigest()[:15], 16)
        return h % scale + 1

    prios = {i: ((w * 1_000_000) * scale) // u(i) for i, w in rows}
    expected = sorted(
        ((i, p) for i, p in prios.items() if p > 0),
        key=lambda t: (-t[1], t[0]),
    )[:k]

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["priority"])
        for r in weighted_priority_sample(
            df, "doc_id", "w", k=k, seed=seed, u_scale=scale
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .collect()
    ]
    assert got == expected


hh_strategy = st.lists(
    st.sampled_from([f"v{i}" for i in range(12)]), min_size=1, max_size=80
)


@given(vals=hh_strategy, k=st.integers(min_value=1, max_value=6),
       parts=st.integers(min_value=1, max_value=5))
@_settings
def test_heavy_hitters_matches_exact_counts(spark, vals, k, parts):
    """For ANY multiset, k, and partitioning, heavy_hitters returns exactly
    the values with count*(k+1) > N, with exact counts — the MG candidate
    pass may vary with partitioning but never loses a true hitter."""
    from collections import Counter

    from delta_sorter_spark.operators.sketches import heavy_hitters

    expected = {
        v: c for v, c in Counter(vals).items() if c * (k + 1) > len(vals)
    }
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(parts)
    got = {r["item"]: r["n"] for r in heavy_hitters(df, "tok", k=k).collect()}
    assert got == expected


@given(
    n_nodes=st.integers(min_value=1, max_value=7),
    edge_picks=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=0, max_size=14
    ),
    iters=st.integers(min_value=1, max_value=3),
)
@_settings
def test_pagerank_matches_python_fixedpoint_oracle(spark, n_nodes, edge_picks, iters):
    """graph.pagerank == the exact integer recurrence replayed in pure
    Python: BIGINT fixed-point masses, floor-division contributions,
    uniform dangling redistribution — equality is EXACT, any ordering or
    partitioning effect would break it."""
    from delta_sorter_spark.operators.graph import PR_SCALE, pagerank

    edges = sorted({(a % n_nodes, b % n_nodes) for a, b in edge_picks})
    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "id bigint")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "src bigint, dst bigint"
    ).limit(len(edges))  # empty-safe: limit(0) keeps the schema
    got = {
        r["id"]: r["rank_q"]
        for r in pagerank(nodes_df, edges_df, n_iters=iters).collect()
    }

    n = n_nodes
    base = (PR_SCALE * 15 // 100) // n
    ranks = {v: PR_SCALE // n for v in range(n)}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    for _ in range(iters):
        inc = {v: 0 for v in range(n)}
        for s, d in edges:
            inc[d] += ranks[s] // deg[s]
        dang = sum(rq for v, rq in ranks.items() if v not in deg)
        ranks = {v: base + (85 * (inc[v] + dang // n)) // 100 for v in range(n)}
    assert got == ranks


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["ab", "abc", "bca", "ca"]), min_size=1, max_size=5)
        .map(" ".join),
        min_size=1,
        max_size=5,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@_settings
def test_train_bpe_matches_python_reference(spark, docs, n_merges):
    """train_bpe == a pure-Python Sennrich reference on any corpus: same
    word-frequency table, same (count desc, pair asc) argmax, same greedy
    left-to-right merge — the full learned merge TABLE matches exactly."""
    from delta_sorter_spark.operators.textstats import train_bpe

    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, "text", n_merges=n_merges, min_count=1)
        .orderBy("merge_rank")
        .collect()
    ]

    freqs = {}
    for t in docs:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in freqs.items()}
    want = []
    for rank in range(n_merges):
        counts = {}
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = counts.get((toks[i], toks[i + 1]), 0) + c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, cnt))
        nv = {}
        for toks, c in vocab.items():
            out, pend = [], ""
            for x in toks:
                if pend == "":
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = ""
                else:
                    out.append(pend)
                    pend = x
            if pend:
                out.append(pend)
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["low", "lower", "new", "newest", "wide", "ab"]),
            min_size=1, max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    ),
    n_iters=st.integers(min_value=1, max_value=3),
    vocab_size=st.integers(min_value=4, max_value=20),
)
@_settings
def test_train_unigram_lm_matches_python_reference(spark, docs, n_iters, vocab_size):
    """train_unigram_lm == a pure-Python Viterbi hard-EM reference on any
    corpus: same seed vocabulary (top-N + single chars), same integer ppb
    probabilities, same DP with strict-greater shortest-last-piece ties —
    the full learned piece table (piece, n, prob_ppb) matches exactly."""
    from delta_sorter_spark.operators.textstats import train_unigram_lm

    L, W = 3, 16
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = sorted(
        (r["piece"], r["n"], r["prob_ppb"])
        for r in train_unigram_lm(
            df, "text", vocab_size=vocab_size, n_iters=n_iters,
            max_piece_len=L, max_word_len=W,
        ).collect()
    )

    wc = {}
    for t in docs:
        for w in t.lower().strip().split():
            if w:
                wc[w[:W]] = wc.get(w[:W], 0) + 1
    seed = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for piece_len in range(1, min(L, len(w) - i) + 1):
                p = w[i:i + piece_len]
                seed[p] = seed.get(p, 0) + n
    top = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = dict(top)
    for p, n in seed.items():
        if len(p) == 1:
            vocab[p] = n

    def with_ppb(v):
        t = sum(v.values())
        return {p: (n, max(n * 10**9 // t, 1)) for p, n in v.items()}

    V = with_ppb(vocab)
    for _ in range(n_iters):
        cnt = {}
        for w, wn in wc.items():
            n = len(w)
            best = [(-1.0, -1, "")] * (n + 1)
            best[0] = (1.0, -1, "")
            for j in range(1, n + 1):
                cand = (-1.0, -1, "")
                for piece_len in range(1, min(L, j) + 1):
                    i = j - piece_len + 1
                    pc = w[i - 1:j]
                    if pc not in V:
                        continue
                    sc = best[i - 1][0] * (float(V[pc][1]) / 1e9)
                    if sc > cand[0]:
                        cand = (sc, i - 1, pc)
                best[j] = cand
            pos = n
            while pos > 0:
                _, frm, pc = best[pos]
                cnt[pc] = cnt.get(pc, 0) + wn
                pos = frm
        kept = {
            p: cnt.get(p, 0)
            for p in V
            if cnt.get(p, 0) > 0 or len(p) == 1
        }
        V = with_ppb(kept)
    want = sorted((p, n, ppb) for p, (n, ppb) in V.items())
    assert got == want


@given(
    tgt=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 50)),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(st.integers(0, 12), st.integers(51, 99)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
    thresh=st.integers(60, 95),
)
@_settings
def test_merge_dv_equals_copy_on_write_merge(spark, tmp_path_factory, tgt, src, thresh):
    """For ANY target/source and clause mix, merge-on-read MERGE produces
    exactly the rows copy-on-write MERGE does — only the storage mechanics
    (DV + append vs rewrite) differ."""
    from delta_sorter_spark.operators.dml import merge, merge_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    tdf = spark.createDataFrame(tgt, "id long, amt long")
    sdf = spark.createDataFrame(src or [(999, 0)], "id long, amt long").limit(len(src))
    clauses = dict(
        when_matched_update={"amt": "t.amt + s.amt"},
        when_matched_delete=f"s.amt > {thresh}",
        matched_condition="s.amt % 2 = 0",
        when_not_matched_insert=True,
    )
    base = tmp_path_factory.mktemp("eq")
    cow = DeltaTable.create(spark, str(base / "cow"), tdf.coalesce(1))
    mor = DeltaTable.create(spark, str(base / "mor"), tdf.coalesce(1))
    merge(cow, sdf, ["id"], **clauses)
    merge_dv(mor, sdf, ["id"], **clauses)
    got_cow = sorted(tuple(r) for r in DeltaTable(spark, str(base / "cow")).to_df().collect())
    got_mor = sorted(tuple(r) for r in DeltaTable(spark, str(base / "mor")).to_df().collect())
    assert got_cow == got_mor


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-50, 50)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    pivot=st.integers(-10, 10),
)
@_settings
def test_update_where_dv_equals_copy_on_write_update(
    spark, tmp_path_factory, rows, pivot
):
    from delta_sorter_spark.operators.dml import update_where, update_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    df = spark.createDataFrame(rows, "id long, amt long")
    base = tmp_path_factory.mktemp("uq")
    cow = DeltaTable.create(spark, str(base / "cow"), df.coalesce(1))
    mor = DeltaTable.create(spark, str(base / "mor"), df.coalesce(1))
    pred, sets = f"amt > {pivot}", {"amt": "amt * 3 + 1"}
    update_where(cow, pred, sets)
    update_where_dv(mor, pred, sets)
    got_cow = sorted(tuple(r) for r in DeltaTable(spark, str(base / "cow")).to_df().collect())
    got_mor = sorted(tuple(r) for r in DeltaTable(spark, str(base / "mor")).to_df().collect())
    assert got_cow == got_mor


# ---------------------------------------------------------------------------
# line-level boilerplate dedup vs a pure-Python oracle
# ---------------------------------------------------------------------------

LINES = ["Subscribe Now", "copyright 2024", "body text", "x", "", "  pad  "]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(LINES), min_size=1, max_size=5).map("\n".join),
    min_size=1,
    max_size=6,
)


def _line_dedup_oracle(texts, min_docs, min_chars):
    """Pure-Python mirror of dedup.remove_repeated_lines semantics."""
    norm = lambda s: s.strip().lower()  # noqa: E731
    df = {}
    for txt in texts:
        for n in {norm(line) for line in txt.split("\n")}:
            if n and len(n) >= min_chars:
                df[n] = df.get(n, 0) + 1
    frequent = {n for n, c in df.items() if c >= min_docs}
    out = []
    for txt in texts:
        kept = [line for line in txt.split("\n") if norm(line) not in frequent]
        out.append(("\n".join(kept), len(txt.split("\n")) - len(kept)))
    return out


@given(corpus_strategy, st.integers(2, 3), st.integers(1, 4))
@_settings
def test_remove_repeated_lines_matches_python_oracle(
    spark, texts, min_docs, min_chars
):
    from delta_sorter_spark.operators.dedup import remove_repeated_lines

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r["id"]: (r["text"], r["lines_removed"])
        for r in remove_repeated_lines(
            df, "id", "text", min_docs=min_docs, min_chars=min_chars
        ).collect()
    }
    want = dict(enumerate(_line_dedup_oracle(texts, min_docs, min_chars)))
    assert got == want


# ---------------------------------------------------------------------------
# URL canonicalization vs a pure-Python oracle over randomized messy URLs
# ---------------------------------------------------------------------------


def _canon_oracle(url):
    """Pure-Python mirror of textstats.canonical_url's documented rules."""
    import re

    c = url.strip()
    c = re.sub(r"#.*$", "", c)
    q = c.find("?")
    base, query = (c[:q], c[q + 1:]) if q >= 0 else (c, "")
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", base)
    auth = m.group(1) if m else ""
    rest = base[len(auth):]
    auth = auth.lower()
    auth = re.sub(r"^(https?://)www\.", r"\1", auth)
    auth = re.sub(r"^(https://[^:/]*):443$", r"\1", auth)
    auth = re.sub(r"^(http://[^:/]*):80$", r"\1", auth)
    rest = re.sub(r"/+$", "", rest)
    params = sorted(
        p for p in query.split("&")
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)=", p)
    )
    return auth + rest + ("?" + "&".join(params) if params else "")


url_strategy = st.builds(
    lambda scheme, www, host, port, path, slash, params, frag: (
        scheme + www + host + port + path + slash
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    st.sampled_from(["http://", "https://", "HTTP://", "HTTPS://"]),
    st.sampled_from(["", "www.", "WWW."]),
    st.sampled_from(["ex.com", "Ex.COM", "a.b.org"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/a", "/a/b", "/A/b"]),
    st.sampled_from(["", "/", "//"]),
    st.lists(
        st.sampled_from(
            ["a=1", "b=2", "utm_source=x", "ref=r", "referrer=keep", ""]
        ),
        max_size=4,
    ),
    st.sampled_from(["", "#f", "#a#b"]),
)


@given(st.lists(url_strategy, min_size=1, max_size=8))
@_settings
def test_canonical_url_matches_python_oracle(spark, urls):
    from delta_sorter_spark.operators.textstats import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [_canon_oracle(u) for u in urls]


# ---------------------------------------------------------------------------
# KMV overlap sketch vs a pure-Python oracle
# ---------------------------------------------------------------------------


def _kmv_oracle(vals_a, vals_b, k, seed="kmv"):
    import hashlib

    def h(v):
        return int(hashlib.md5((v + seed).encode()).hexdigest()[:15], 16)

    sa = sorted({h(v) for v in vals_a})[:k]
    sb = sorted({h(v) for v in vals_b})[:k]
    u = sorted(set(sa) | set(sb))[:k]
    m = [x for x in u if x in set(sa) and x in set(sb)]
    return (len(u), len(m), 1_000_000 * len(m) // len(u), max(u))


@given(
    st.sets(st.text("abcdef", min_size=1, max_size=4), min_size=1, max_size=30),
    st.sets(st.text("abcdef", min_size=1, max_size=4), min_size=1, max_size=30),
    st.sampled_from([4, 16, 64]),
)
@_settings
def test_kmv_overlap_matches_python_oracle(spark, vals_a, vals_b, k):
    from delta_sorter_spark.operators.sketches import kmv_overlap

    a = spark.createDataFrame([(v,) for v in vals_a], "v string")
    b = spark.createDataFrame([(v,) for v in vals_b], "v string")
    r = kmv_overlap(a, b, "v", k=k).collect()[0]
    got = (r["k_union"], r["matches"], r["jaccard_ppm"], r["kth_union_hash"])
    assert got == _kmv_oracle(vals_a, vals_b, k)


# ---------------------------------------------------------------------------
# dsir_weights: hashed-bigram importance weights vs pure-Python DSIR mirror
# ---------------------------------------------------------------------------


def _dsir_oracle(rows, n, num_buckets):
    """Pure-Python mirror: (id -> (n_ngrams, dsir_bits)) with the same
    md5-bucket hashing and bit-length log surrogate."""
    import hashlib

    def bucket(g):
        return (int(hashlib.md5(g.encode()).hexdigest()[:15], 16)) % num_buckets

    def bits(x):
        return x.bit_length() - 1

    raw, tgt, per_doc = {}, {}, {}
    for doc_id, text, is_t in rows:
        toks = [t for t in __import__("re").split(r"\s+", text.strip().lower())]
        grams = [
            " ".join(toks[i : i + n])
            for i in range(len(toks) - n + 1)
        ] if len(toks) >= n else []
        grams = [g for g in grams if g != ""]
        bks = [bucket(g) for g in grams]
        per_doc[doc_id] = bks
        for b in bks:
            raw[b] = raw.get(b, 0) + 1
            if is_t:
                tgt[b] = tgt.get(b, 0) + 1
    out = {}
    for doc_id, bks in per_doc.items():
        if not bks:
            continue
        s = sum(bits(tgt.get(b, 0) + 1) - bits(raw[b] + 1) for b in bks)
        out[doc_id] = (len(bks), s)
    return out


@given(
    st.lists(
        st.tuples(
            st.text("ab cd", min_size=0, max_size=20),
            st.booleans(),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1, 2, 3]),
)
@_settings
def test_dsir_weights_matches_python_oracle(spark, docs, n):
    from delta_sorter_spark.operators.textstats import dsir_weights

    rows = [(i, text, t) for i, (text, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["dsir_bits"])
        for r in dsir_weights(
            df, "doc_id", "text", "t", n=n, num_buckets=64
        ).collect()
    }
    assert got == _dsir_oracle(rows, n, 64)


def test_dsir_weights_favors_target_lookalikes(spark):
    """Docs sharing the target slice's n-grams score higher than docs that
    don't — the resampling contract the weights exist for."""
    from delta_sorter_spark.operators.textstats import dsir_weights

    rows = (
        [(i, "high quality prose sample", True) for i in range(5)]
        + [(10, "high quality prose sample", False)]
        + [(11, "zz yy xx ww vv uu", False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = {
        r["doc_id"]: r["avg_bits"]
        for r in dsir_weights(df, "doc_id", "text", "t", n=2).collect()
    }
    assert out[10] > out[11]
