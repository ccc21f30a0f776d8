"""Document-quality rule filters for pretraining pipelines: the Gopher
rule set (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1)
and C4-style line/document cleaning (Raffel et al. 2020, §2.2).

These complete the quality family next to :mod:`textstats` (which holds the
scoring primitives: token stats, repetition ratio, surprisal, hashed
classifier).  Here the product is the published *rule sets* as one-pass
operators: per document, every rule's measured value plus the combined
pass/fail verdict, so a pipeline can either filter on the verdict or audit
individual rules.

Scale posture: every per-document statistic is a pure column expression
over the text scan (split / filter / aggregate array functions — JVM-side,
whole-stage-codegen, zero Python).  The only shuffle in ``gopher_rules`` is
the n-gram repetition family: grams explode once (both n values tagged into
one explode), then two map-side-combinable aggregations keyed on
``(doc_id, gram)`` / ``doc_id`` — linear in corpus size, never quadratic,
skew bounded by the longest document.  ``c4_clean`` is shuffle-free.

Determinism: counts are integers, every fraction is ONE double division
rounded to 6 places, and the dominant-n-gram statistic is defined as a
tie-free ``max`` of products — so both operators hash-match a DuckDB oracle
bit-for-bit (driver entries e77/e78).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The eight "required word" stopwords from Gopher §A1.1: a document must
# contain at least min_stopword_hits of them to pass.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# First characters that mark a bullet line (Gopher drops docs where MORE
# THAN 90% of lines start with a bullet — max_bullet_line_frac below).
BULLET_CHARS = ["•", "‣", "▪", "-", "*"]

# Published Gopher thresholds (repetition family uses the thresholds for
# the n actually configured; defaults here are the n=2 "top" and n=5 "dup"
# rows of Rae et al. Table A1).
DEFAULT_GOPHER_THRESHOLDS: dict = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_ngram_char_frac": 0.20,
    "max_dup_ngram_char_frac": 0.15,
}

_WORDS = "filter(split(lower(trim({t})), '\\\\s+'), w -> w <> '')"
_LINES = "filter(transform(split({t}, '\\n'), l -> trim(l)), l -> l <> '')"


def _words_expr(text_col: str) -> str:
    return _WORDS.format(t=text_col)


def _lines_expr(text_col: str) -> str:
    return _LINES.format(t=text_col)


def _frac(num: Column, den: Column) -> Column:
    """ONE double division rounded to 6 places; NULL when the denominator
    is zero (the pass rule treats that via a definitively-false conjunct)."""
    return F.round(
        num.cast("double") / F.nullif(den, F.lit(0)).cast("double"), 6
    )


def gopher_scalar_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The shuffle-free Gopher rules: per-row word/line/character statistics
    as pure array expressions.  Columns: n_words, mean_word_len,
    symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, stopword_hits, dup_line_frac, dup_line_char_frac,
    norm_chars (the single-space-joined character count — the repetition
    family's denominator).

    Evaluation discipline (this function was 14x slower without it): the
    split arrays are let-bound through a one-element ``transform`` lambda
    (higher-order functions sit OUTSIDE whole-stage codegen's subexpression
    elimination, so repeating the split under every stat re-splits the text
    per stat — 8 stopword membership tests alone), and the counter struct
    reaches the output through ``inline()``: a generator evaluates its
    expression ONCE per row, where a plain projection would inline the
    struct into every field extraction and recompute ALL stats per column
    (SimplifyExtractValueOps cannot see through element_at(transform(...)))."""
    bullets = ", ".join(f"'{c}'" for c in BULLET_CHARS)
    contains = " + ".join(
        f"CAST(array_contains(s.w, '{sw}') AS INT)" for sw in GOPHER_STOPWORDS
    )
    w, li = "s.w", "s.li"
    counters = f"""
inline(transform(
  array(struct({_words_expr(text_col)} AS w, {_lines_expr(text_col)} AS li)),
  s -> struct(
    size({w}) AS n_words,
    aggregate({w}, 0L, (a, x) -> a + length(x)) AS word_chars,
    size({li}) AS n_lines,
    size(filter({li}, l -> substring(l, 1, 1) IN ({bullets})))
      AS bullet_lines,
    size(filter({li}, l -> l LIKE '%...' OR l LIKE '%…')) AS ellipsis_lines,
    size(filter({w}, x -> x rlike '[a-z]')) AS alpha_words,
    CAST({contains} AS INT) AS stop_hits,
    size(array_distinct({li})) AS distinct_lines,
    aggregate({li}, 0L, (a, x) -> a + length(x)) AS line_chars,
    aggregate(array_distinct({li}), 0L, (a, x) -> a + length(x))
      AS distinct_line_chars
  )))
"""
    # '#' and ellipsis occurrences (non-overlapping, left-to-right — both
    # engines' replace() agrees); Gopher's "symbol-to-word ratio"
    hash_cnt = F.length(text_col) - F.length(
        F.expr(f"replace({text_col}, '#', '')")
    )
    dots_cnt = (
        F.length(text_col)
        - F.length(F.expr(f"replace({text_col}, '...', '')"))
    ) / F.lit(3)
    uni_ell_cnt = F.length(text_col) - F.length(
        F.expr(f"replace({text_col}, '…', '')")
    )
    base = df.select(
        F.col(id_col),
        (hash_cnt + dots_cnt + uni_ell_cnt).cast("bigint").alias("__sym__"),
        F.expr(counters),
    )
    n_words, n_lines = F.col("n_words"), F.col("n_lines")
    line_chars = F.col("line_chars")
    return base.select(
        F.col(id_col),
        n_words,
        _frac(F.col("word_chars"), n_words).alias("mean_word_len"),
        _frac(F.col("__sym__"), n_words).alias("symbol_word_ratio"),
        _frac(F.col("bullet_lines"), n_lines).alias("bullet_line_frac"),
        _frac(F.col("ellipsis_lines"), n_lines).alias("ellipsis_line_frac"),
        _frac(F.col("alpha_words"), n_words).alias("alpha_word_frac"),
        F.col("stop_hits").cast("int").alias("stopword_hits"),
        _frac(n_lines - F.col("distinct_lines"), n_lines).alias(
            "dup_line_frac"
        ),
        _frac(line_chars - F.col("distinct_line_chars"), line_chars).alias(
            "dup_line_char_frac"
        ),
        (F.col("word_chars") + F.greatest(n_words - 1, F.lit(0))).alias(
            "norm_chars"
        ),
    )


def _tagged_grams_expr(text_col: str, top_n: int, dup_n: int) -> str:
    """One array of (tag, gram) structs carrying BOTH n-gram sizes, so the
    repetition family costs a single explode.

    The word array is let-bound through the outer one-element ``transform``
    (same discipline as :func:`gopher_scalar_stats`): referencing the split
    expression directly inside the per-position lambda re-evaluates it PER
    POSITION — O(words² · chars) per document, which made this explode the
    whole operator's cost at sf0.1."""

    def grams(n: int, tag: str) -> str:
        # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard short docs
        # with an explicit empty array instead
        body = (
            f"transform(sequence(1, size(ws) - {n - 1}),"
            f" i -> struct('{tag}' AS tag,"
            f" array_join(slice(ws, i, {n}), ' ') AS gram))"
        )
        empty = "cast(array() as array<struct<tag:string,gram:string>>)"
        return f"if(size(ws) < {n}, {empty}, {body})"

    return (
        f"element_at(transform(array({_words_expr(text_col)}),"
        f" ws -> concat({grams(top_n, 't')}, {grams(dup_n, 'd')})), 1)"
    )


def gopher_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher's repetition rules, the linear (explode + combine) way:

    - ``top_ngram_chars``: character coverage of the dominant ``top_n``-gram,
      defined tie-free as max over grams of occurrences × gram length
      (Rae et al. take the most-frequent gram and break count ties
      arbitrarily; the max-of-products form is order-independent, so it
      oracles).
    - ``dup_ngram_chars``: characters across ALL occurrences of duplicated
      ``dup_n``-grams (the standard open reimplementation of the
      "duplicate n-gram character fraction").

    One explode carries both n values tagged; both aggregations are
    map-side combinable."""
    grams = df.select(
        F.col(id_col),
        F.explode(F.expr(_tagged_grams_expr(text_col, top_n, dup_n))).alias(
            "g"
        ),
    ).select(id_col, F.col("g.tag").alias("tag"), F.col("g.gram").alias("gram"))
    counted = grams.groupBy(id_col, "tag", "gram").agg(
        F.count("*").alias("cnt")
    )
    chars = F.col("cnt") * F.length("gram")
    return counted.groupBy(id_col).agg(
        F.max(F.when(F.col("tag") == "t", chars)).alias("top_ngram_chars"),
        F.coalesce(
            F.sum(
                F.when((F.col("tag") == "d") & (F.col("cnt") > 1), chars)
            ),
            F.lit(0),
        ).alias("dup_ngram_chars"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ngram_n: int = 2,
    dup_ngram_n: int = 5,
    thresholds: dict | None = None,
) -> DataFrame:
    """The full Gopher quality rule set: per document, every rule's measured
    value plus ``gopher_pass`` (the conjunction under ``thresholds``,
    default :data:`DEFAULT_GOPHER_THRESHOLDS`).

    Output columns: (id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
    dup_line_frac, dup_line_char_frac, top_ngram_char_frac,
    dup_ngram_char_frac, gopher_pass)."""
    th = {**DEFAULT_GOPHER_THRESHOLDS, **(thresholds or {})}
    scalars = gopher_scalar_stats(df, id_col, text_col)
    ngrams = gopher_ngram_stats(df, id_col, text_col, top_ngram_n, dup_ngram_n)
    joined = scalars.join(ngrams, id_col, "left")
    top_frac = _frac(F.col("top_ngram_chars"), F.col("norm_chars"))
    dup_frac = _frac(
        F.coalesce(F.col("dup_ngram_chars"), F.lit(0)), F.col("norm_chars")
    )
    passed = (
        F.col("n_words").between(th["min_words"], th["max_words"])
        & F.col("mean_word_len").between(
            th["min_mean_word_len"], th["max_mean_word_len"]
        )
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= th["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_line_frac"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & (F.col("stopword_hits") >= th["min_stopword_hits"])
        & (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("dup_line_char_frac") <= th["max_dup_line_char_frac"])
        & (top_frac <= th["max_top_ngram_char_frac"])
        & (dup_frac <= th["max_dup_ngram_char_frac"])
    )
    return joined.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "stopword_hits",
        "dup_line_frac",
        "dup_line_char_frac",
        top_frac.alias("top_ngram_char_frac"),
        dup_frac.alias("dup_ngram_char_frac"),
        F.coalesce(passed, F.lit(False)).alias("gopher_pass"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2): line rules (keep lines
    with ≥ ``min_words_per_line`` words, ending in terminal punctuation
    ``. ! ? " '`` when ``require_terminal_punct``, and not mentioning
    "javascript"), then document rules (drop pages containing
    "lorem ipsum" or ``{``, or with fewer than ``min_sentences``
    sentence-ending marks after line filtering).

    Output: (id, n_lines, n_kept_lines, n_sentences, doc_kept,
    cleaned_text) — ``cleaned_text`` is the kept lines re-joined with
    newlines, NULL when the document is dropped.  Pure per-row array
    expressions: shuffle-free, whole-stage-codegen, trivially distributed.
    The punctuation/sentence knobs exist because rule sets are corpus
    config, not code — tests pin the strict C4 defaults."""
    li = _lines_expr(text_col)
    conds = [
        f"size(filter(split(l, '\\\\s+'), w -> w <> '')) >= "
        f"{int(min_words_per_line)}",
        "NOT contains(lower(l), 'javascript')",
    ]
    if require_terminal_punct:
        conds.append(
            "substring(l, length(l), 1) IN ('.', '!', '?', '\"', \"'\")"
        )
    kept = f"filter({li}, l -> {' AND '.join(conds)})"
    cleaned = F.expr(f"array_join({kept}, '\\n')")
    n_sentences = F.length(F.regexp_replace(cleaned, r"[^.!?]", ""))
    doc_kept = (
        ~F.expr(f"contains(lower({text_col}), 'lorem ipsum')")
        & ~F.expr(f"contains({text_col}, '{{')")
        & (n_sentences >= F.lit(int(min_sentences)))
        & (F.expr(f"size({kept})") > 0)
    )
    doc_kept = F.coalesce(doc_kept, F.lit(False))  # NULL text: dropped
    return df.select(
        F.col(id_col),
        F.expr(f"size({li})").alias("n_lines"),
        F.expr(f"size({kept})").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        doc_kept.alias("doc_kept"),
        F.when(doc_kept, cleaned).alias("cleaned_text"),
    )


# -- HTML / markup extraction -------------------------------------------------
# The step BEFORE c4_clean / gopher_rules in a real crawl pipeline: strip
# markup and boilerplate blocks from raw HTML so the quality rules see
# text, not tags (the C4 paper's preprocessing; trafilatura-lite).  Pure
# deterministic column expressions — regexp_replace chains, shuffle-free,
# whole-stage-codegen — so a DuckDB oracle can replay the exact pipeline.
#
# Regex dialect note: every pattern here must behave identically under
# Java regex (Spark) and RE2 (DuckDB), so NO backreferences (RE2 lacks
# them — the per-tag block patterns are expanded instead of using
# <(script|style)>.*?</\1>) and NO \s (Java includes \x0B, RE2 doesn't —
# explicit [ \t] / \n classes instead).

# non-content blocks dropped wholesale, innermost text and all
_HTML_DROP_TAGS = ("script", "style", "noscript", "template", "head")
# closing a block-level element is a line break
_HTML_BREAK_TAGS = (
    "p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header"
    "|footer|blockquote|pre|nav|aside|dd|dt|dl|figcaption|figure"
)
# minimal entity set, decoded in fixed order (&amp; LAST so &amp;lt;
# cannot double-decode)
_HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
]


def _html_text_col(html_col: str):
    """Column: plain text extracted from ``html_col`` (see html_extract)."""
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for tag in _HTML_DROP_TAGS:
        c = F.regexp_replace(c, rf"(?is)<{tag}(>|[ \t\n][^>]*>).*?</{tag}>", " ")
    c = F.regexp_replace(c, r"(?i)<(br|hr)([ \t\n][^>]*)?/?>", "\n")
    c = F.regexp_replace(c, rf"(?i)</({_HTML_BREAK_TAGS})>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"\r\n|\r", "\n")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n\n+", "\n\n")
    # trim() strips spaces only — newlines at the edges need the regex
    return F.regexp_replace(c, r"^[\n ]+|[\n ]+$", "")


def html_extract(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Markup extraction: (id, title, text, n_lines, n_chars) per document.

    ``title`` is the <title> content (entity-decoded, whitespace-
    collapsed; NULL when absent).  ``text`` is the visible text:
    script/style/noscript/template/head blocks and comments dropped
    wholesale, block-element closes and <br>/<hr> become newlines, every
    other tag stripped, the minimal HTML entity set decoded, whitespace
    normalized (runs of blanks to one space, blank-line runs to one blank
    line).  ``n_lines`` counts non-empty lines of ``text``; ``n_chars``
    its length.  Feed ``text`` into :func:`c4_clean` /
    :func:`gopher_rules` for the quality half of the crawl pipeline.

    At 100 TB: one projection over the corpus scan — no shuffle, no
    Python, no UDF; Catalyst keeps the whole chain in one codegen stage."""
    title_raw = F.regexp_extract(
        F.col(html_col), r"(?is)<title(>|[ \t\n][^>]*>)(.*?)</title>", 2
    )
    title = title_raw
    for ent, ch in _HTML_ENTITIES:
        title = F.replace(title, F.lit(ent), F.lit(ch))
    title = F.trim(F.regexp_replace(title, r"[ \t\n]+", " "))
    text = _html_text_col(html_col)
    n_lines = F.expr(
        "size(filter(split(__he_text__, '\\n'), l -> trim(l) <> ''))"
    )
    return (
        df.select(
            F.col(id_col),
            F.when(title != "", title).alias("title"),
            text.alias("__he_text__"),
        )
        .select(
            F.col(id_col),
            "title",
            F.col("__he_text__").alias("text"),
            n_lines.alias("n_lines"),
            F.length("__he_text__").alias("n_chars"),
        )
    )
