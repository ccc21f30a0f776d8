"""Gopher / C4 quality rule sets (operators/quality.py): rule behavior on
crafted fixtures with the STRICT published defaults (the registry entries
e77/e78 relax knobs to fit the driver's punctuation-free corpus), plus a
pure-Python property mirror of the scalar rules."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_sorter_spark.operators.quality import (
    DEFAULT_GOPHER_THRESHOLDS,
    GOPHER_STOPWORDS,
    c4_clean,
    gopher_rules,
    gopher_scalar_stats,
)

GOOD_DOC = (
    "this is a perfectly normal document that should have enough words "
    "to pass the minimum word count rule easily. it contains the required "
    "stopwords and the mean word length is sane. sentences carry variety "
    "because repeated phrasing would trip the duplicate ngram fraction "
    "rules. different words keep appearing so nothing dominates the "
    "character mass of the text. quality filters of this kind were "
    "published with the gopher model and they remain a standard cleaning "
    "stage for web scale pretraining corpora today."
)


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_rules(df, "doc_id", "text", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_pass_and_word_rules(spark):
    rows = [
        (0, GOOD_DOC),
        (1, "too short to pass."),  # < 50 words
        (2, " ".join(["supercalifragilistic"] * 60)),  # mean word len > 10
        (3, ("# " * 30) + GOOD_DOC),  # symbol ratio > 0.1
        (4, " ".join(["123 456"] * 40)),  # alpha fraction 0, no stopwords
    ]
    got = _gopher(spark, rows)
    assert got[0]["gopher_pass"] is True
    assert got[1]["gopher_pass"] is False and got[1]["n_words"] < 50
    assert got[2]["gopher_pass"] is False and got[2]["mean_word_len"] > 10
    assert got[3]["gopher_pass"] is False
    assert got[3]["symbol_word_ratio"] > 0.1
    assert got[4]["alpha_word_frac"] == 0.0
    assert got[4]["stopword_hits"] == 0


def test_gopher_line_rules(spark):
    bulleted = "\n".join(["- bullet item with several words here"] * 9 + [GOOD_DOC])
    ellipsed = "\n".join(["a line trailing off..."] * 5 + [GOOD_DOC] * 5)
    duped = "\n".join(["an identical line of text appears here"] * 6
                      + [GOOD_DOC] * 4)  # 2 distinct lines of 10
    got = _gopher(spark, [(0, bulleted), (1, ellipsed), (2, duped)])
    assert got[0]["bullet_line_frac"] == 0.9  # exactly at threshold: passes
    assert got[1]["ellipsis_line_frac"] == 0.5
    assert got[1]["gopher_pass"] is False
    assert got[2]["dup_line_frac"] == 0.8
    assert got[2]["gopher_pass"] is False


def test_gopher_repetition_rules(spark):
    # one dominant bigram: "badger badger" repeated
    dominant = " ".join(["badger"] * 80) + " " + GOOD_DOC
    got = _gopher(spark, [(0, dominant), (1, GOOD_DOC)])
    assert got[0]["top_ngram_char_frac"] > 0.2
    assert got[0]["gopher_pass"] is False
    assert got[1]["top_ngram_char_frac"] <= 0.2
    # a duplicated 5-gram phrase army
    phrase = "the quick brown fox jumps"
    spam = " ".join([phrase] * 12) + " " + GOOD_DOC
    got2 = _gopher(spark, [(0, spam)])
    assert got2[0]["dup_ngram_char_frac"] > 0.15
    assert got2[0]["gopher_pass"] is False


def test_gopher_stopword_rule(spark):
    no_stop = " ".join(["walrus penguin otter ferret badger stoat"] * 12)
    got = _gopher(spark, [(0, no_stop), (1, GOOD_DOC)])
    assert got[0]["stopword_hits"] < 2 and got[0]["gopher_pass"] is False
    assert got[1]["stopword_hits"] >= 2
    assert set(DEFAULT_GOPHER_THRESHOLDS) >= {"min_stopword_hits"}
    assert len(GOPHER_STOPWORDS) == 8


def test_gopher_threshold_override(spark):
    got = _gopher(spark, [(0, "five words is too few.")],
                  thresholds={"min_words": 3, "min_stopword_hits": 0,
                              "min_mean_word_len": 1.0,
                              # 5-word docs: a single bigram dominates
                              "max_top_ngram_char_frac": 1.0,
                              "max_dup_ngram_char_frac": 1.0})
    assert got[0]["gopher_pass"] is True


def test_gopher_empty_and_whitespace(spark):
    got = _gopher(spark, [(0, ""), (1, "   \n  \n ")])
    for i in (0, 1):
        assert got[i]["n_words"] == 0
        assert got[i]["gopher_pass"] is False


def test_c4_strict_defaults(spark):
    doc = "\n".join(
        [
            "a good sentence with enough words to keep.",
            "short line.",  # < 5 words
            "no terminal punctuation on this line here",
            "a javascript warning line that would be dropped.",
            "another proper sentence closes the paragraph nicely!",
            "is this a kept question line too?",
        ]
    )
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    row = c4_clean(df, "doc_id", "text").collect()[0]
    assert row["n_lines"] == 6
    assert row["n_kept_lines"] == 3
    assert row["doc_kept"] is True
    kept = row["cleaned_text"].split("\n")
    assert kept == [
        "a good sentence with enough words to keep.",
        "another proper sentence closes the paragraph nicely!",
        "is this a kept question line too?",
    ]


def test_c4_document_rules(spark):
    rows = [
        (0, "lorem ipsum dolor sit amet fills this entire placeholder page."),
        (1, "a code page with braces { } that must be dropped entirely."),
        (2, "only two sentences live here. the second one ends now."),
        (3, "one good sentence. two good sentences! three good sentences?"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df, "doc_id", "text").collect()}
    assert got[0]["doc_kept"] is False  # lorem ipsum
    assert got[1]["doc_kept"] is False  # curly brace
    assert got[2]["doc_kept"] is False and got[2]["n_sentences"] == 2
    assert got[3]["doc_kept"] is True and got[3]["n_sentences"] == 3
    assert got[0]["cleaned_text"] is None


def test_c4_relaxed_knobs_match_registry_shape(spark):
    df = spark.createDataFrame(
        [(0, "six plain words without any punctuation")],
        "doc_id long, text string",
    )
    row = c4_clean(
        df, "doc_id", "text", min_sentences=0, require_terminal_punct=False
    ).collect()[0]
    assert row["doc_kept"] is True
    assert row["cleaned_text"] == "six plain words without any punctuation"


# --- pure-Python mirror of the scalar rules (property check) --------------

WORDS = st.lists(
    st.sampled_from(
        ["the", "of", "and", "badger", "supercalifragilistic", "a1",
         "123", "#", "x...", "…"]
    ),
    min_size=0,
    max_size=30,
)


def _py_scalars(text: str) -> dict:
    words = [w for w in text.strip().lower().split() if w]
    n = len(words)
    out = {"n_words": n}
    out["mean_word_len"] = (
        round(sum(len(w) for w in words) / n, 6) if n else None
    )
    sym = text.count("#") + text.count("...") + text.count("…")
    # replace-based counting is non-overlapping, same as the operator
    sym = (
        (len(text) - len(text.replace("#", "")))
        + (len(text) - len(text.replace("...", ""))) // 3
        + (len(text) - len(text.replace("…", "")))
    )
    out["symbol_word_ratio"] = round(sym / n, 6) if n else None
    alpha = sum(1 for w in words if any("a" <= c <= "z" for c in w))
    out["alpha_word_frac"] = round(alpha / n, 6) if n else None
    out["stopword_hits"] = sum(1 for s in GOPHER_STOPWORDS if s in words)
    return out


@given(rows=st.lists(WORDS, min_size=1, max_size=6))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gopher_scalars_property(spark, rows):
    data = [(i, " ".join(ws)) for i, ws in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_scalar_stats(df, "doc_id", "text").collect()
    }
    for i, text in data:
        exp = _py_scalars(text)
        for k, v in exp.items():
            g = got[i][k]
            assert g == pytest.approx(v) if isinstance(v, float) else g == v, (
                k, text, g, v
            )


def test_empty_doc_encode_contract(spark):
    """Tokenizer encode sides keep wordless documents represented
    (tokens/pieces = [], counts 0) instead of dropping the rows."""
    from delta_sorter_spark.operators.textstats import (
        bpe_encode,
        train_wordpiece,
        wordpiece_encode,
        wordpiece_vocab,
    )

    df = spark.createDataFrame(
        [(0, "low lower"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    bpe = {r["id"]: r for r in bpe_encode(df, "doc_id", "text", []).collect()}
    assert set(bpe) == {0, 1, 2}
    assert bpe[1]["tokens"] == [] and bpe[1]["n_tokens"] == 0
    merges = train_wordpiece(df, "text", n_merges=1, min_count=1)
    vocab = wordpiece_vocab(df, "text", merges)
    wp = {
        r["id"]: r
        for r in wordpiece_encode(df, "doc_id", "text", vocab).collect()
    }
    assert set(wp) == {0, 1, 2}
    assert wp[2]["pieces"] == [] and wp[2]["n_unk"] == 0


def test_html_extract_strips_markup(spark):
    from delta_sorter_spark.operators.quality import html_extract

    html = (
        '<html><head><title>My &amp; Title</title>'
        "<style>p{color:red}</style>"
        '<script type="text/javascript">if (x<2) { alert("hi"); }</script>'
        "</head><body><nav>Home &gt; Docs</nav><!-- hidden -->"
        "<h1>Heading One</h1><p>First paragraph with <b>bold</b> text.</p>"
        "<p>Second&nbsp;paragraph.</p><br><hr/>"
        "<ul><li>item one</li><li>item two</li></ul>"
        "<footer>&#39;quoted&#39;</footer></body></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "plain, no markup"), (3, None)], "id int, html string"
    )
    rows = {r["id"]: r for r in html_extract(df, "id", "html").collect()}
    r1 = rows[1]
    assert r1["title"] == "My & Title"
    # scripts/styles/comments gone — including the tag-breaking `x<2`
    assert "alert" not in r1["text"] and "color" not in r1["text"]
    assert "hidden" not in r1["text"]
    # block structure became lines; inline tags vanished in place
    lines = [l for l in r1["text"].split("\n") if l.strip()]
    assert lines == [
        "Home > Docs",
        "Heading One",
        "First paragraph with bold text.",
        "Second paragraph.",
        "item one",
        "item two",
        "'quoted'",
    ]
    assert r1["n_lines"] == 7 and r1["n_chars"] == len(r1["text"])
    # markup-free text passes through; NULL stays NULL
    assert rows[2]["text"] == "plain, no markup" and rows[2]["title"] is None
    assert rows[3]["text"] is None and rows[3]["n_lines"] is None


def test_html_extract_feeds_c4_clean(spark):
    """The crawl-pipeline composition: extract, then line-rules."""
    from delta_sorter_spark.operators.quality import c4_clean, html_extract

    html = (
        "<html><body><nav>a b</nav>"
        "<p>This is a long enough first sentence line.</p>"
        "<p>tiny</p>"
        "<p>Another sufficiently long kept line ends here.</p>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id int, html string")
    text = html_extract(df, "id", "html").select("id", "text")
    out = c4_clean(text, "id", "text", min_sentences=1).collect()[0]
    assert out["doc_kept"] and out["n_kept_lines"] == 2
    assert "tiny" not in out["cleaned_text"]
