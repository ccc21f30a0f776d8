"""WordPiece train/encode (operators/textstats.train_wordpiece /
wordpiece_encode) vs a pure-Python Schuster-Nakajima reference: same
likelihood-score argmax with (score desc, left asc, right asc) ties, same
greedy merge fold, same longest-match-first encoding with [UNK] fallback."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_sorter_spark.operators.textstats import (
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocab,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_train(texts, n_merges, min_count):
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    words = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wf}
    out = []
    for rank in range(n_merges):
        pc, tc = Counter(), Counter()
        for w, toks in words.items():
            n = wf[w]
            for t in toks:
                tc[t] += n
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += n
        cands = [
            (cnt / (tc[a] * tc[b]), a, b, cnt)
            for (a, b), cnt in pc.items()
            if cnt >= min_count
        ]
        if not cands:
            break
        cands.sort(key=lambda x: (-x[0], x[1], x[2]))
        s, a, b, n = cands[0]
        ab = a + (b[2:] if b.startswith("##") else b)
        out.append((rank, a, b, ab, n, s))
        for w, toks in words.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            words[w] = new
    return out


def _py_encode(text, vset, unk="[UNK]", max_word_len=16):
    out = []
    for w in text.strip().lower().split():
        if not w:
            continue
        w = w[:max_word_len]
        pos, pcs, ok = 0, [], True
        while pos < len(w):
            best = None
            for ln in range(len(w) - pos, 0, -1):
                pc = w[pos:pos + ln] if pos == 0 else "##" + w[pos:pos + ln]
                if pc in vset:
                    best = (ln, pc)
                    break
            if best is None:
                ok = False
                break
            pcs.append(best[1])
            pos += best[0]
        out.extend(pcs if ok else [unk])
    return out


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["low", "lower", "lowest", "newer", "ab", "bca"]),
            min_size=1, max_size=6,
        ).map(" ".join),
        min_size=1, max_size=5,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
@_settings
def test_train_wordpiece_matches_python_reference(spark, docs, n_merges):
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"],
         r["pair_count"], r["score"])
        for r in train_wordpiece(df, "text", n_merges=n_merges, min_count=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _py_train(docs, n_merges, 1)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["low", "lower", "knew", "news", "zq"]),
            min_size=1, max_size=5,
        ).map(" ".join),
        min_size=1, max_size=4,
    ),
)
@_settings
def test_wordpiece_encode_matches_python_maxmatch(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    merges = train_wordpiece(df, "text", n_merges=3, min_count=1)
    vocab = wordpiece_vocab(df, "text", merges)
    vset = {r["piece"] for r in vocab.collect()}
    got = {
        r["id"]: list(r["pieces"])
        for r in wordpiece_encode(df, "doc_id", "text", vocab).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _py_encode(t, vset), (t, got[i])


def test_wordpiece_unk_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "low lower low")], "doc_id long, text string"
    )
    merges = train_wordpiece(df, "text", n_merges=2, min_count=1)
    vocab = wordpiece_vocab(df, "text", merges)
    out = wordpiece_encode(
        spark.createDataFrame([(0, "xyz low")], "doc_id long, text string"),
        "doc_id", "text", vocab,
    ).collect()[0]
    # 'xyz' has no 'x' piece in vocab -> single [UNK]
    assert out["pieces"][0] == "[UNK]"
    assert out["n_unk"] == 1
    assert out["n_pieces"] == len(out["pieces"])


def test_wordpiece_encode_reproduces_training_segmentation(spark):
    """Encoding the training corpus with the learned vocab reproduces each
    word as a valid segmentation (concatenation restores the word)."""
    df = spark.createDataFrame(
        [(0, "low lower lowest slow slower")], "doc_id long, text string"
    )
    merges = train_wordpiece(df, "text", n_merges=4, min_count=1)
    vocab = wordpiece_vocab(df, "text", merges)
    row = wordpiece_encode(df, "doc_id", "text", vocab).collect()[0]
    rebuilt = "".join(p[2:] if p.startswith("##") else " " + p
                      for p in row["pieces"]).strip()
    assert rebuilt == "low lower lowest slow slower"
    assert row["n_unk"] == 0
