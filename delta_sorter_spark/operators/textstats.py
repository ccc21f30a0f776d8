"""Text analysis operators (north-star E4, SURVEY §2.8): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built from ``pyspark.sql.functions`` string/regex expressions
— JVM-side, whole-stage-codegen, no UDFs — and every expression has an exact
DuckDB equivalent so the driver's oracle verifies values bit-for-bit.

Note on language-ID: the heuristic scores marker-token hits per language and
argmaxes with a fixed tie order.  On the driver's synthetic corpus (shared
English-ish vocabulary across the ``lang`` labels) its *accuracy* is
meaningless — what the oracle verifies is the deterministic computation; on
a real corpus you would swap in real stopword lexicons (the operator shape
is the product, the lexicon is config).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from delta_sorter_spark.functions.localframe import local_df

PUNCT_CLASS = r"[.,!?;:]"
STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "are"]

# marker lexicons for the language-ID heuristic (config, not code)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}
LANG_TIE_ORDER = ["en", "de", "fr", "es"]


def n_tokens_expr(text_col: str) -> Column:
    return F.expr(f"size(split(lower(trim({text_col})), '\\\\s+'))")


def _count_matches(text_col: str, words: list[str]) -> Column:
    # double the backslashes: Spark SQL string literals process \b as
    # backspace, so the literal must read '\\b' to reach the regex engine
    pattern = r"\\b(" + "|".join(words) + r")\\b"
    return F.expr(f"size(regexp_extract_all(lower({text_col}), '{pattern}', 0))")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio)."""
    n_chars = F.length(F.col(text_col))
    n_tokens = n_tokens_expr(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_stop = _count_matches(text_col, STOPWORDS_EN)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars.cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 4).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, quality): a simple deterministic 0..1 composite — length band,
    low punctuation noise, some stopword signal.  The point is the operator
    shape (pure column expressions -> trivially distributed); the weights are
    config."""
    stats = token_stats(df, id_col, text_col)
    length_ok = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 5000)
    punct_ok = F.col("punct_ratio") <= 0.1
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(F.col("stopword_ratio") * F.lit(3.0), F.lit(0.3))
    )
    return stats.select(F.col(id_col), F.round(score, 4).alias("quality"))


def lang_guess_expr(text_col: str) -> Column:
    """Marker-token argmax with fixed tie order, as a single column expr."""
    scores = {
        lang: _count_matches(text_col, words) for lang, words in LANG_MARKERS.items()
    }
    # build CASE from the tie order: first lang whose score >= all later ones
    expr = None
    for i, lang in enumerate(LANG_TIE_ORDER):
        cond = None
        for other in LANG_TIE_ORDER[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if cond is None:
            expr = expr.otherwise(branch) if expr is not None else branch
        else:
            expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr


def lang_id(
    df: DataFrame, id_col: str, text_col: str, classifier=None
) -> DataFrame:
    """(id, lang_guess) language identification.

    ``classifier``: optional ``str -> str`` language-code callable (e.g. a
    fastText wrapper: ``lambda t: model.predict(t)[0][0][9:]``), applied
    via Arrow-batched mapInPandas — the same pluggable-hook rule as
    multimodal's ``decoder=``: the callable is pickled into the executor
    closure, so it must be importable/serializable.  Default (None) keeps
    the marker-token argmax with fixed tie order as a PURE COLUMN
    EXPRESSION — zero Python in the hot path, and exactly what the driver
    oracle replays — so deployments inject a real model without forking
    while the stub stays the verified contract."""
    if classifier is None:
        return df.select(
            F.col(id_col), lang_guess_expr(text_col).alias("lang_guess")
        )
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("lang_guess", T.StringType(), True)]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "lang_guess": [
                        classifier(t) if t is not None else None
                        for t in pdf["__text__"]
                    ],
                }
            )

    narrowed = df.select(F.col(id_col), F.col(text_col).alias("__text__"))
    return narrowed.mapInPandas(run, out_schema)


# BPE-ish pre-tokenizer: runs of letters, runs of digits, single
# non-alphanumeric symbols — the GPT-2-style split shape, restricted to an
# ASCII class so Java (Spark) and RE2 (DuckDB) regex engines agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_bpe_tokens, n_word_tokens, n_number_tokens, n_symbol_tokens):
    token counting under a BPE-ish regex pre-tokenizer (vs the whitespace
    tokenizer in ``token_stats``).  A real BPE vocab merge step would follow
    per-token; the counting/splitting shape here is the distributed part."""
    toks = F.expr(f"regexp_extract_all({text_col}, '{BPE_PATTERN}', 0)")
    n_words = F.expr(
        f"size(filter(regexp_extract_all({text_col}, '{BPE_PATTERN}', 0),"
        f" t -> t RLIKE '^[A-Za-z]'))"
    )
    n_numbers = F.expr(
        f"size(filter(regexp_extract_all({text_col}, '{BPE_PATTERN}', 0),"
        f" t -> t RLIKE '^[0-9]'))"
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        n_words.alias("n_word_tokens"),
        n_numbers.alias("n_number_tokens"),
        (F.size(toks) - n_words - n_numbers).alias("n_symbol_tokens"),
    )


def fingerprint_expr(text_col: str) -> Column:
    """64-bit hex digest of whitespace-normalized lowercased text."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return F.substring(F.md5(normalized), 1, 16)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint): 64-bit hex digest of whitespace-normalized
    lowercased text — the standard near-exact dedup key (E4 document
    fingerprinting; md5-based so the oracle reproduces it)."""
    return df.select(F.col(id_col), fingerprint_expr(text_col).alias("fingerprint"))


def document_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All per-document text features in ONE scan: (id, n_chars, n_tokens,
    punct_ratio, stopword_ratio, quality, lang_guess, fingerprint).

    This is the 100 TB shape for the text-analysis family: where
    ``token_stats``/``quality_score``/``lang_id``/``fingerprint`` each
    re-scan the corpus, a profile pipeline computes every feature as a column
    expression over a single pass — no joins, no extra shuffles, one
    projection node in the plan.  Feature semantics are identical to the
    individual operators (same rounding, same tie order)."""
    n_chars = F.length(F.col(text_col))
    n_tokens = n_tokens_expr(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_stop = _count_matches(text_col, STOPWORDS_EN)
    stage1 = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 4).alias("stopword_ratio"),
        lang_guess_expr(text_col).alias("lang_guess"),
        fingerprint_expr(text_col).alias("fingerprint"),
    )
    length_ok = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 5000)
    punct_ok = F.col("punct_ratio") <= 0.1
    quality = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(F.col("stopword_ratio") * F.lit(3.0), F.lit(0.3))
    )
    return stage1.withColumn("quality", F.round(quality, 4))


def top_terms(
    df: DataFrame, group_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k whitespace terms per group by frequency: (group, term, n, rank).

    The scale shape: explode -> groupBy(group, term) with map-side partial
    counts (the shuffle carries one row per distinct (group, term), not one
    per token), then a per-group top-k window over the already-aggregated
    counts.  Ties break on term ascending so results are deterministic."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    counts = toks.groupBy(group_col, "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("term"))
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition: fraction of word n-grams that are repeats
    (1 - distinct/total).  High values flag boilerplate/spam — a standard
    pretraining quality filter (e.g. Gopher's repetition rules).

    Pure per-row column arithmetic over the text scan — no shuffle, no UDF;
    the ratio is ONE final double division so it hash-matches any engine."""
    # words AND grams let-bound once per row, counters emitted through the
    # inline() generator (the quality.py evaluation discipline: lambdas sit
    # outside codegen subexpression elimination, and a projection would
    # inline the expensive expression into every extraction)
    words = f"split(lower(trim({text_col})), '\\\\s+')"
    counters = (
        f"inline(transform(array({words}), ws ->"
        f" element_at(transform("
        f"   array(transform(sequence(1, greatest(1, size(ws) - {n - 1})),"
        f"         i -> array_join(slice(ws, i, {n}), ' '))),"
        f"   gs -> struct(size(gs) AS total_ngrams,"
        f"                size(array_distinct(gs)) AS distinct_ngrams)"
        f" ), 1)))"
    )
    base = df.select(F.col(id_col), F.expr(counters))
    total = F.col("total_ngrams")
    distinct = F.col("distinct_ngrams")
    return base.select(
        F.col(id_col),
        total,
        distinct,
        F.round(
            F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6
        ).alias("rep_ratio"),
    )


def unigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-frequency document scoring — the zero-model cousin of a
    KenLM perplexity filter: score each document by how COMMON its tokens
    are in this very corpus.  Per token the contribution is
    floor(log2(corpus_count)) computed exactly as ``length(bin(cnt)) - 1``
    (integer bit length — bit-identical in any engine, unlike float log).
    Output: (id, n_tokens, sum_freq_bits, avg_freq_bits) where avg is the
    ONE double division.  Low avg = rare-token (surprising) text; high =
    boilerplate.

    Scale posture: tokens explode once; the vocabulary aggregate is
    map-side combinable and its result is vocab-sized (≪ corpus), so the
    count join broadcasts — the per-doc rollup is the only data shuffle.
    Token skew ("the" everywhere) lands on the broadcast side, not in a
    shuffle key."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("__tok__"),
    ).where(F.col("__tok__") != "")
    vocab = toks.groupBy("__tok__").agg(F.count("*").alias("__cnt__"))
    bits = F.length(F.bin(F.col("__cnt__"))) - 1
    return (
        toks.join(F.broadcast(vocab), "__tok__")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(bits.cast("bigint")).alias("sum_freq_bits"),
        )
        .withColumn(
            "avg_freq_bits",
            F.round(
                F.col("sum_freq_bits").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        )
    )


def bigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Bigram conditional-surprisal scoring — the quantized form of a
    KenLM-style perplexity filter (the CCNet quality gate), trained on
    this very corpus.  The SELF-trained member of the bigram-LM family:
    :func:`bigram_lm_counts` + :func:`bigram_lm_score` is the
    cross-corpus form (train on a trusted reference, score candidates),
    :func:`unigram_surprisal` the zero-context one.  Per bigram
    occurrence (w1, w2) the contribution is

        bits(C(w1·)) - bits(C(w1 w2))

    where ``C(w1·)`` counts w1 as a *bigram prefix* (the true Markov
    denominator — doc-final tokens don't dilute it), ``C(w1 w2)`` counts
    the bigram, and ``bits(n) = floor(log2(n))`` is computed exactly as
    ``length(bin(n)) - 1`` so the difference collapses to
    ``length(bin(c1)) - length(bin(c2))`` — an integer quantization of
    ``-log2 P(w2|w1)``, bit-identical in any engine (no float logs).

    Output: (id, n_bigrams, sum_cond_bits, avg_cond_bits) with ONE double
    division at the end.  High avg = improbable token transitions
    (gibberish, OCR noise, shuffled text); low = fluent/boilerplate.
    Docs with fewer than two tokens drop (no bigram evidence) — callers
    wanting them back left-join on the id.

    Scale posture: bigrams materialize once via an array-slice transform
    (no self-join, no positional window).  The prefix-count table is
    vocabulary-scale (≪ corpus) and broadcasts; the bigram-count table is
    bigram-TYPE-scale — too large to broadcast at 100 TB — so that join
    stays a shuffle join on (w1, w2), co-partitioned with the aggregation
    that produced it (exchange reuse) and AQE-skew-splittable on hot
    probe keys ("of the").  Deliberately NOT a window over
    partitionBy(w1): that would pin every "the …" bigram to one task.
    """
    ws = F.expr(f"filter(split(trim({text_col}), '\\\\s+'), w -> w <> '')")
    base = df.select(F.col(id_col), ws.alias("__ws__"))
    bg = base.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(__ws__, 1, greatest(size(__ws__) - 1, 0)),"
                " (w, i) -> struct(w AS w1, element_at(__ws__, i + 2) AS w2))"
            )
        ).alias("__bg__"),
    ).select(F.col(id_col), F.col("__bg__.w1").alias("w1"), F.col("__bg__.w2").alias("w2"))
    pref = bg.groupBy("w1").agg(F.count("*").alias("__c1__"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("__c2__"))
    bits = (F.length(F.bin(F.col("__c1__"))) - F.length(F.bin(F.col("__c2__")))).cast(
        "bigint"
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        .join(F.broadcast(pref), "w1")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(bits).alias("sum_cond_bits"),
        )
        .withColumn(
            "avg_cond_bits",
            F.round(
                F.col("sum_cond_bits").cast("double")
                / F.col("n_bigrams").cast("double"),
                6,
            ),
        )
    )


# ---------------------------------------------------------------------------
# PII / identifier scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------

# Default scrub patterns.  RE2-safe subset (no lookarounds, no backrefs) so
# Java regex (Spark) and RE2 (DuckDB oracle) agree on every match.  Ordered:
# each pattern is counted against, then masked out of, the text as left by
# the previous pattern — structured PII first, bare digit runs last so an
# already-masked email/IP never double-counts as an id number.
REDACT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "idnum": r"[0-9]+",
}


def _mask_token(name: str) -> str:
    # digit-free so a later digit-run pattern can never re-match a mask
    return "[" + "".join(ch for ch in name.upper() if not ch.isdigit()) + "]"


def redact(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    patterns: dict[str, str] | None = None,
    out_col: str = "clean",
) -> DataFrame:
    """Scrub identifier-like substrings from ``text_col``.

    Returns ``id_cols`` + ``out_col`` (text with each pattern replaced by its
    ``[NAME]`` token) + one ``n_<name>`` match count per pattern.  Pure
    column expressions (regexp_count/regexp_replace): zero shuffle, scales as
    a map-only pass at any corpus size.
    """
    patterns = patterns or REDACT_PATTERNS
    cur: Column = F.col(text_col)
    counts = []
    for name, pat in patterns.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, _mask_token(name))
    return df.select(*id_cols, cur.alias(out_col), *counts)


def redact_sql(text_expr: str, patterns: dict[str, str] | None = None) -> tuple[str, list[str]]:
    """DuckDB expressions mirroring :func:`redact`: returns (clean_expr,
    [count_expr AS n_<name>, ...]) with the same sequential masking order."""
    patterns = patterns or REDACT_PATTERNS
    cur = text_expr
    counts = []
    for name, pat in patterns.items():
        sq = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all({cur}, '{sq}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{sq}', '{_mask_token(name)}', 'g')"
    return cur, counts

def bigram_lm_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Count-based bigram language-model table: (w1, w2, n_bigram,
    n_context, prob_ppm) where prob_ppm = 1_000_000 * n(w1,w2) DIV n(w1) —
    the conditional next-token probability in integer parts-per-million, so
    the table is bit-identical across engines (no float division).

    The shape behind classic count-based LM scoring and data-quality
    surprisal features at corpus scale: one explode to bigrams, one counting
    aggregation (map-side combinable), and the context totals derive from
    the bigram counts themselves (vocab-sized, broadcast back) — the corpus
    text is read exactly once."""
    toks = df.select(
        F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("__ts__")
    )
    # Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather than an
    # empty array, so short texts must be guarded explicitly
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("__ts__") >= 2,
                F.expr(
                    "transform(sequence(1, size(__ts__) - 1),"
                    " i -> struct(element_at(__ts__, i) AS w1,"
                    "             element_at(__ts__, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("__b__")
    ).select("__b__.w1", "__b__.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    ctx = counts.groupBy("w1").agg(F.sum("n_bigram").alias("n_context"))
    return (
        counts.join(F.broadcast(ctx), "w1")
        .withColumn(
            "prob_ppm",
            F.expr("CAST(1000000 * n_bigram DIV n_context AS BIGINT)"),
        )
        .select("w1", "w2", "n_bigram", "n_context", "prob_ppm")
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, top_n: int | None = None
) -> DataFrame:
    """Corpus-scale byte-pair statistics — the counting step of a BPE
    tokenizer-training iteration: frequency of every adjacent CHARACTER
    pair, weighted by word frequency.  Output: (pair, n); ``top_n`` keeps
    the most frequent (ties to the lexicographically smaller pair) — the
    merge candidates.

    Scale shape: the corpus text is read ONCE into a word-frequency
    aggregation (map-side combinable, result is vocabulary-sized); the
    pair explode then runs over the DISTINCT vocabulary — orders of
    magnitude smaller than the corpus — so the quadratic-ish character
    work never touches raw text twice.  ``top_n`` compiles to
    TakeOrderedAndProject (per-partition local top-k, no single-partition
    exchange)."""
    words = df.select(
        F.explode(F.expr(f"split(lower(trim({text_col})), '\\\\s+')")).alias("w")
    ).where(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("wn"))
    pairs = vocab.select(
        "wn",
        F.explode(
            F.when(
                F.length("w") >= 2,
                F.expr(
                    "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(F.sum("wn").cast("bigint").alias("n"))
    if top_n is not None:
        out = out.orderBy(F.desc("n"), F.asc("pair")).limit(top_n)
    return out


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Full BPE tokenizer TRAINING loop (Sennrich, Haddow & Birch 2016) —
    the iterative merge-learning procedure, not just one counting step
    (:func:`bpe_pair_counts` is a single iteration's count).  Returns the
    learned merge table: (merge_rank, left, right, pair_count), the
    artifact a tokenizer ships.

    Classic algorithm, distributed: maintain the WORD-FREQUENCY table
    (vocabulary-scale, not corpus-scale) with each word as its current
    token array (characters + a ``</w>`` end-of-word marker); per merge:

    1. count adjacent token pairs weighted by word frequency (one explode
       + map-side-combined groupBy over the vocabulary);
    2. pick the argmax pair — ties broken (count desc, left asc, right
       asc) so the learned merge sequence is deterministic;
    3. rewrite every word's token array with the pair merged greedily
       left-to-right — a JVM-side ``aggregate`` fold carrying
       (emitted-tokens, pending-token), no Python boundary.

    Stops early when no pair reaches ``min_count``.  The corpus text is
    read ONCE (into the word-frequency aggregation); every iteration
    after that touches only the vocabulary table, lineage cut per round
    with ``localCheckpoint``.  This is inherently sequential-by-merge
    (each merge changes the next iteration's pair counts — the reason the
    driver contract carries it as a rows-only entry: no single SQL
    statement replays a data-dependent argmax loop), so per-merge cost is
    one vocabulary-scale job + a ONE-ROW collect; at 100 TB the
    vocabulary table is millions of rows against the corpus's billions,
    which is exactly how production distributed BPE trainers shape the
    loop.
    """
    words = (
        df.select(
            F.explode(F.expr(f"split(lower(trim({text_col})), '\\\\s+')")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(
            "wn",
            F.expr("concat(filter(split(w, ''), x -> x <> ''), array('</w>'))").alias(
                "toks"
            ),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            words.select(
                "wn",
                F.explode(
                    F.expr(
                        "transform(slice(toks, 1, size(toks) - 1),"
                        " (t, i) -> struct(t AS l, element_at(toks, i + 2) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wn").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((rank, a, b, n))
        ab = a + b
        zero = F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            F.lit("").alias("pend"),
        )

        def _make_step(a, b, ab):
            def step(acc, x):
                return (
                    F.when(
                        acc["pend"] == "",
                        F.struct(acc["out"].alias("out"), x.alias("pend")),
                    )
                    .when(
                        (acc["pend"] == F.lit(a)) & (x == F.lit(b)),
                        F.struct(
                            F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
                            F.lit("").alias("pend"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                            x.alias("pend"),
                        )
                    )
                )

            return step

        def fin(acc):
            return F.when(acc["pend"] == "", acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            )

        words = words.select(
            "wn", F.aggregate("toks", zero, _make_step(a, b, ab), fin).alias("toks")
        ).localCheckpoint(eager=True)
    return local_df(df.sparkSession, 
        merges, "merge_rank int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
) -> DataFrame:
    """Apply a learned BPE merge table (:func:`train_bpe`'s output, as a
    ``[(left, right), ...]`` list in rank order) to a corpus — the
    tokenizer's ENCODE side.  Output: (id, tokens array<string>,
    n_tokens), where each word is split to characters + ``</w>`` and the
    merges replay in rank order with the same greedy left-to-right fold
    the trainer used, so encoding the training corpus reproduces the
    trainer's final word segmentations exactly.

    Scale shape (the :func:`unigram_encode` discipline): the fold runs once
    per DISTINCT word — the same vocabulary-not-corpus insight the trainer
    exploits — with the merge table baked into the expression as literals
    (tokenizer-sized, not data-sized) and documents reassembled by
    posexplode + join + ordered collect.  The previous per-occurrence form
    re-folded every word instance (O(corpus tokens × merges)); this is
    O(vocabulary × merges) plus a word-scale join."""
    merge_list = [(str(a), str(b)) for a, b in merges]
    doc_words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(
                f"filter(split(lower(trim({text_col})), '\\\\s+'),"
                " x -> x <> '')"
            )
        ).alias("wpos", "w"),
    )
    words = doc_words.select("w").distinct()
    col = F.expr(
        "concat(filter(split(w, ''), x -> x <> ''), array('</w>'))"
    )
    for a, b in merge_list:
        ab = a + b
        zero = F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            F.lit("").alias("pend"),
        )

        def _make_step(a, b, ab):
            def step(acc, x):
                return (
                    F.when(
                        acc["pend"] == "",
                        F.struct(acc["out"].alias("out"), x.alias("pend")),
                    )
                    .when(
                        (acc["pend"] == F.lit(a)) & (x == F.lit(b)),
                        F.struct(
                            F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
                            F.lit("").alias("pend"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                            x.alias("pend"),
                        )
                    )
                )

            return step

        def _fin(acc):
            return F.when(acc["pend"] == "", acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            )

        col = F.aggregate(col, zero, _make_step(a, b, ab), _fin)
    segmented = words.select("w", col.alias("wtoks"))
    assembled = (
        doc_words.join(segmented, "w")
        .groupBy("id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(wpos, wtoks))),"
                " x -> x.wtoks))"
            ).alias("tokens")
        )
    )
    # documents with no words (empty/whitespace/NULL text) explode to zero
    # rows — join them back so every input row stays represented
    # (tokens=[], n_tokens=0), matching the per-occurrence form's contract
    return (
        df.select(F.col(id_col).alias("id"))
        .join(assembled, "id", "left")
        .select(
            "id",
            F.coalesce(
                F.col("tokens"), F.expr("CAST(array() AS array<string>)")
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """WordPiece tokenizer TRAINING (Schuster & Nakajima 2012; the BERT
    tokenizer) — the third classic subword family next to BPE
    (:func:`train_bpe`) and unigram-LM (:func:`train_unigram_lm`).  The
    loop is BPE's merge loop with a different objective: instead of the
    most FREQUENT adjacent pair, merge the pair with the highest
    likelihood gain ``score = count(pair) / (count(left) * count(right))``
    — pairs whose parts rarely occur apart.  Continuation tokens carry the
    ``##`` prefix (word → ``[c1, ##c2, ##c3, ...]``; a merge of
    ``(A, ##B)`` yields token ``A·B`` with A's prefix kept).

    Returns the merge table: (merge_rank, left, right, merged, pair_count,
    score).  Determinism: the score is ONE double division of exact
    integer counts (identical IEEE result in any engine); argmax ties
    break (score desc, left asc, right asc); rows below ``min_count``
    never merge.

    Scale posture mirrors :func:`train_bpe`: the corpus is read once into
    the word-frequency table; each merge costs one vocabulary-scale pair
    count + one vocabulary-scale token count (both map-side combinable)
    and a ONE-ROW collect; lineage is cut per round with
    ``localCheckpoint``.  The greedy merge application is the same
    JVM-side ``aggregate`` fold as BPE's — no Python in the loop."""
    words = (
        df.select(
            F.explode(
                F.expr(f"split(lower(trim({text_col})), '\\\\s+')")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(
            "wn",
            F.expr(
                "transform(filter(split(w, ''), x -> x <> ''),"
                " (c, i) -> IF(i = 0, c, concat('##', c)))"
            ).alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int, float]] = []
    for rank in range(int(n_merges)):
        pairs = (
            words.select(
                "wn",
                F.explode(
                    F.expr(
                        "transform(slice(toks, 1, size(toks) - 1),"
                        " (t, i) -> struct(t AS l, element_at(toks, i + 2) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wn").cast("bigint").alias("n"))
        )
        toks = (
            words.select("wn", F.explode("toks").alias("t"))
            .groupBy("t")
            .agg(F.sum("wn").cast("bigint").alias("tn"))
        )
        best = (
            pairs.where(F.col("n") >= int(min_count))
            .join(
                F.broadcast(toks.select(F.col("t").alias("l"),
                                        F.col("tn").alias("ln"))),
                "l",
            )
            .join(
                F.broadcast(toks.select(F.col("t").alias("r"),
                                        F.col("tn").alias("rn"))),
                "r",
            )
            .select(
                "l", "r", "n",
                (
                    F.col("n").cast("double")
                    / (F.col("ln") * F.col("rn")).cast("double")
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        score = float(best[0]["score"])
        ab = a + (b[2:] if b.startswith("##") else b)
        merges.append((rank, a, b, ab, n, score))
        zero = F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            F.lit("").alias("pend"),
        )

        def _make_step(a, b, ab):
            def step(acc, x):
                return (
                    F.when(
                        acc["pend"] == "",
                        F.struct(acc["out"].alias("out"), x.alias("pend")),
                    )
                    .when(
                        (acc["pend"] == F.lit(a)) & (x == F.lit(b)),
                        F.struct(
                            F.concat(acc["out"], F.array(F.lit(ab))).alias(
                                "out"
                            ),
                            F.lit("").alias("pend"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.concat(acc["out"], F.array(acc["pend"])).alias(
                                "out"
                            ),
                            x.alias("pend"),
                        )
                    )
                )

            return step

        def _fin(acc):
            return F.when(acc["pend"] == "", acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            )

        words = words.select(
            "wn",
            F.aggregate("toks", zero, _make_step(a, b, ab), _fin).alias(
                "toks"
            ),
        ).localCheckpoint(eager=True)
    return local_df(df.sparkSession, 
        merges,
        "merge_rank int, left string, right string, merged string,"
        " pair_count bigint, score double",
    )


def wordpiece_vocab(
    df: DataFrame, text_col: str, merges: DataFrame
) -> DataFrame:
    """The piece vocabulary a WordPiece ENCODER consumes: every initial
    character piece of the corpus (first-position chars bare, continuation
    chars ``##``-prefixed) plus every merged token from
    :func:`train_wordpiece`'s table.  One column: ``piece``."""
    chars = (
        df.select(
            F.explode(
                F.expr(f"split(lower(trim({text_col})), '\\\\s+')")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .select(
            F.explode(
                F.expr(
                    "transform(filter(split(w, ''), x -> x <> ''),"
                    " (c, i) -> IF(i = 0, c, concat('##', c)))"
                )
            ).alias("piece")
        )
        .distinct()
    )
    return chars.unionByName(
        merges.select(F.col("merged").alias("piece"))
    ).distinct()


def _wp_span_expr(L: int) -> str:
    """WordPiece candidate spans of a word: (start, len, piece) where
    non-initial positions carry the ``##`` continuation prefix."""
    return (
        f"flatten(transform(sequence(1, length(w)), i -> "
        f"transform(sequence(1, least({L}, length(w) - i + 1)), "
        f"l -> struct(i AS i, l AS l, "
        f"IF(i = 1, substring(w, i, l),"
        f" concat('##', substring(w, i, l))) AS pc))))"
    )


# Greedy longest-match-first (MaxMatch) fold: consume the word left to
# right, at each position taking the LONGEST vocabulary piece that matches;
# a position with no match marks the word unencodable (→ [unk]).  Each step
# consumes ≥1 character, so length(w) iterations always suffice.
_WP_MAXMATCH_EXPR = """
aggregate(
  sequence(1, length(w)),
  named_struct('pos', 1, 'pcs', CAST(array() AS array<string>), 'ok', true),
  (acc, x) -> CASE WHEN NOT acc.ok OR acc.pos > length(w) THEN acc
    ELSE CASE WHEN aggregate(
                 filter(spans, s -> s.i = acc.pos),
                 named_struct('l', -1, 'pc', ''),
                 (b, s) -> IF(s.l > b.l,
                              named_struct('l', s.l, 'pc', s.pc), b)
               ).l = -1
         THEN named_struct('pos', acc.pos, 'pcs', acc.pcs, 'ok', false)
         ELSE named_struct(
           'pos', acc.pos + aggregate(
                    filter(spans, s -> s.i = acc.pos),
                    named_struct('l', -1, 'pc', ''),
                    (b, s) -> IF(s.l > b.l,
                                 named_struct('l', s.l, 'pc', s.pc), b)).l,
           'pcs', concat(acc.pcs, array(aggregate(
                    filter(spans, s -> s.i = acc.pos),
                    named_struct('l', -1, 'pc', ''),
                    (b, s) -> IF(s.l > b.l,
                                 named_struct('l', s.l, 'pc', s.pc), b)).pc)),
           'ok', true)
         END
    END
)
"""


def wordpiece_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces,
    max_word_len: int = 16,
    unk: str = "[UNK]",
) -> DataFrame:
    """Apply a WordPiece vocabulary (:func:`wordpiece_vocab`'s output — a
    DataFrame with a ``piece`` column or a list of strings) to a corpus
    with the standard greedy longest-match-first (MaxMatch) algorithm —
    the BERT tokenizer's ENCODE side.  A word with an unmatchable position
    becomes the single ``unk`` piece (the WordPiece convention, unlike
    BPE's leave-as-chars).  Output: (id, pieces array<string>, n_pieces,
    n_unk) — words in document order, pieces in word order.

    Scale shape mirrors :func:`unigram_encode`: MaxMatch runs once per
    DISTINCT (truncated) word with the vocabulary broadcast; documents
    reassemble via posexplode + join + ordered collect."""
    spark = df.sparkSession
    if isinstance(pieces, DataFrame):
        piece_df = pieces.select("piece")
    else:
        piece_df = local_df(spark, 
            [(str(p),) for p in pieces], "piece string"
        )
    piece_df = piece_df.localCheckpoint(eager=True)
    L = (
        piece_df.agg(
            F.max(
                F.length(F.expr("regexp_replace(piece, '^##', '')"))
            )
        ).collect()[0][0]
        or 1
    )
    W = int(max_word_len)
    doc_words = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.expr(
                    f"filter(split(lower(trim({text_col})), '\\\\s+'),"
                    " x -> x <> '')"
                )
            ).alias("wpos", "w0"),
        )
        .select("id", "wpos", F.expr(f"substring(w0, 1, {W})").alias("w"))
    )
    words = doc_words.select("w").distinct()
    spans = (
        words.select("w", F.explode(F.expr(_wp_span_expr(L))).alias("s"))
        .select(
            "w",
            F.col("s.i").alias("i"),
            F.col("s.l").alias("l"),
            F.col("s.pc").alias("pc"),
        )
        .join(F.broadcast(piece_df.select(F.col("piece").alias("pc"))), "pc")
    )
    segmented = (
        # left join: a word may have NO in-vocab span at all (every
        # position unmatched) — it must still reach the fold to become unk
        words.join(
            spans.groupBy("w").agg(
                F.expr(
                    "sort_array(collect_list(struct(i, l, pc)))"
                ).alias("spans")
            ),
            "w",
            "left",
        )
        .withColumn(
            "spans",
            F.coalesce(
                F.col("spans"),
                F.expr(
                    "CAST(array() AS array<struct<i:int,l:int,pc:string>>)"
                ),
            ),
        )
        .withColumn("mm", F.expr(_WP_MAXMATCH_EXPR))
        .select(
            "w",
            F.when(F.col("mm.ok"), F.col("mm.pcs"))
            .otherwise(F.array(F.lit(unk)))
            .alias("wpcs"),
        )
    )
    assembled = (
        doc_words.join(segmented, "w")
        .groupBy("id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(wpos, wpcs))),"
                " x -> x.wpcs))"
            ).alias("pieces")
        )
    )
    # wordless documents stay represented (pieces=[], the bpe_encode rule)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(assembled, "id", "left")
        .select(
            "id",
            F.coalesce(
                F.col("pieces"), F.expr("CAST(array() AS array<string>)")
            ).alias("pieces"),
        )
        .withColumn("n_pieces", F.size("pieces").cast("bigint"))
        .withColumn(
            "n_unk",
            F.size(
                F.filter("pieces", lambda p: p == F.lit(unk))
            ).cast("bigint"),
        )
    )


def _uni_span_expr(L: int) -> str:
    """Candidate spans of a word: (start, len, end, piece) for every
    substring up to length L."""
    return (
        f"flatten(transform(sequence(1, length(w)), i -> "
        f"transform(sequence(1, least({L}, length(w) - i + 1)), "
        f"l -> struct(i AS i, l AS l, i + l - 1 AS ende, "
        f"substring(w, i, l) AS pc))))"
    )


# Viterbi DP fold over a word's candidate spans: acc[j+1] = best
# (score, frm, pc) for the j-char prefix; factor = double(ppb)/1e9,
# multiplied in span order (end asc, l asc), strict-greater comparison =
# shortest-last-piece tie break — the fixed order the oracles replay.
_UNI_DP_EXPR = """
aggregate(
  sequence(1, length(w)),
  array(named_struct('score', CAST(1.0 AS DOUBLE), 'frm', -1, 'pc', '')),
  (acc, j) -> concat(acc, array(
    aggregate(
      filter(spans, s -> s.ende = j),
      named_struct('score', CAST(-1.0 AS DOUBLE), 'frm', -1, 'pc', ''),
      (b, s) -> CASE WHEN element_at(acc, s.i).score
                          * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE))
                          > b.score
                     THEN named_struct(
                       'score', element_at(acc, s.i).score
                                * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE)),
                       'frm', s.i - 1, 'pc', s.pc)
                     ELSE b END
    )
  ))
)
"""

# Backtrack over the DP table: pieces emitted END-to-START (training only
# counts them; encode reverses for document order).
_UNI_BACK_EXPR = """
aggregate(
  sequence(1, length(w)),
  named_struct('pos', length(w), 'pcs', CAST(array() AS array<string>)),
  (acc, x) -> CASE WHEN acc.pos <= 0 THEN acc
              ELSE named_struct(
                'pos', element_at(best, acc.pos + 1).frm,
                'pcs', concat(acc.pcs, array(element_at(best, acc.pos + 1).pc)))
              END
).pcs
"""


def train_unigram_lm(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 64,
    n_iters: int = 3,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer TRAINING —
    the other classic subword family next to BPE (:func:`train_bpe`).
    Returns the learned piece table: (piece, n, prob_ppb), where ``n`` is
    the piece's count over the corpus' Viterbi-best segmentations after
    the final EM round and ``prob_ppb`` its integer parts-per-billion
    probability.

    Viterbi hard-EM, distributed and DETERMINISTIC down to the bit:

    1. Seed vocabulary: all substrings up to ``max_piece_len`` of the
       (frequency-weighted, ``max_word_len``-truncated) word table, top
       ``vocab_size`` by (count desc, piece asc), plus every single
       character (coverage guarantee — single chars are never pruned).
    2. E-step: per DISTINCT word, the best segmentation under current
       piece probabilities via a dynamic program expressed as ONE nested
       SQL ``aggregate`` fold (JVM whole-stage codegen, no Python, no
       per-position shuffle): candidate spans arrive sorted by
       (end, len), the fold keeps a strictly-greater winner, so ties go
       to the shortest last piece — a fixed order an oracle can replay.
    3. M-step: piece counts along the best paths (weighted by word
       frequency) -> integer probabilities ``(n * 1e9) // total``
       (floored at 1); pieces with zero count are pruned unless they are
       single characters.

    All probability arithmetic is integer until the DP product, and the
    product multiplies ``double(ppb)/1e9`` factors in a defined order —
    IEEE multiply/divide are exactly rounded, so DuckDB replays the same
    doubles bit-for-bit (the same discipline as e62/e66/e68; ``log`` is
    deliberately absent because libm logs are NOT reproducible across
    engines).

    Scale posture mirrors :func:`train_bpe`: the corpus is read once into
    the word-frequency table; every EM round costs one vocabulary-scale
    job (spans broadcast-join + per-word local DP + one map-side-combined
    count), lineage cut per round with ``localCheckpoint``."""
    L, W = int(max_piece_len), int(max_word_len)
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.expr(f"split(lower(trim({text_col})), '\\\\s+')")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .select(F.expr(f"substring(w, 1, {W})").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .localCheckpoint(eager=True)
    )
    # seed counts: every substring up to L, weighted by word frequency
    sub_expr = (
        f"flatten(transform(sequence(1, length(w)), i -> "
        f"transform(sequence(1, least({L}, length(w) - i + 1)), "
        f"l -> substring(w, i, l))))"
    )
    seed = (
        words.select("wn", F.explode(F.expr(sub_expr)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wn").cast("bigint").alias("n"))
    )
    top = seed.orderBy(F.desc("n"), F.asc("piece")).limit(int(vocab_size))
    chars = seed.where(F.length("piece") == 1)
    vocab = top.unionByName(chars).groupBy("piece").agg(F.max("n").alias("n"))

    def _with_ppb(v: DataFrame) -> DataFrame:
        total = v.agg(F.sum("n").alias("__t__"))
        return v.crossJoin(F.broadcast(total)).select(
            "piece", "n",
            F.greatest(
                F.expr("CAST(n * 1000000000 AS BIGINT) DIV __t__"),
                F.lit(1),
            ).cast("bigint").alias("prob_ppb"),
        )

    vocab = _with_ppb(vocab).localCheckpoint(eager=True)

    span_expr = _uni_span_expr(L)
    dp_expr = _UNI_DP_EXPR
    back_expr = _UNI_BACK_EXPR
    for _ in range(int(n_iters)):
        spans = (
            words.select("w", "wn", F.explode(F.expr(span_expr)).alias("s"))
            .select(
                "w", "wn",
                F.col("s.i").alias("i"), F.col("s.l").alias("l"),
                F.col("s.ende").alias("ende"), F.col("s.pc").alias("pc"),
            )
            .join(
                F.broadcast(vocab.select(F.col("piece").alias("pc"), "prob_ppb")),
                "pc",
            )
        )
        grouped = spans.groupBy("w", "wn").agg(
            F.expr(
                "sort_array(collect_list(struct(ende, l, i, pc, prob_ppb AS ppb)))"
            ).alias("spans")
        )
        paths = (
            grouped.withColumn("best", F.expr(dp_expr))
            .withColumn("pcs", F.expr(back_expr))
            .select("wn", F.explode("pcs").alias("piece"))
        )
        counts = paths.groupBy("piece").agg(
            F.sum("wn").cast("bigint").alias("n")
        )
        # prune zero-count pieces except single characters (coverage)
        kept = (
            vocab.select("piece")
            .join(counts, "piece", "left")
            .select(
                "piece", F.coalesce(F.col("n"), F.lit(0)).alias("n")
            )
            .where((F.col("n") > 0) | (F.length("piece") == 1))
        )
        vocab = _with_ppb(kept).localCheckpoint(eager=True)
    return vocab


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces,
    max_word_len: int = 16,
    unk: str = "<unk>",
) -> DataFrame:
    """Apply a learned unigram-LM piece table (:func:`train_unigram_lm`'s
    output — a DataFrame or ``[(piece, prob_ppb), ...]``) to a corpus —
    the tokenizer's ENCODE side.  Output: (id, pieces array<string>,
    n_pieces): per document, each whitespace word's Viterbi-best
    segmentation under the fixed piece probabilities, words in document
    order, pieces in word order.

    Single-character positions with no vocabulary entry segment as the
    ``unk`` piece (probability floor 1 ppb), so any corpus encodes — the
    SentencePiece unknown-piece convention.  Same DP, same tie order, and
    the same defined float-product order as training, so encoding the
    training corpus reproduces the trainer's segmentations exactly.

    Scale shape: the DP runs once per DISTINCT (truncated) word — never
    per occurrence — with the piece table broadcast; documents then
    reassemble by a posexplode + join + ordered collect (two exchanges,
    both word/document-scale)."""
    spark = df.sparkSession
    if isinstance(pieces, DataFrame):
        piece_df = pieces.select("piece", "prob_ppb")
    else:
        piece_df = local_df(spark, 
            [(str(p), int(q)) for p, q in pieces],
            "piece string, prob_ppb long",
        )
    piece_df = piece_df.localCheckpoint(eager=True)
    L = piece_df.agg(F.max(F.length("piece"))).collect()[0][0] or 1
    W = int(max_word_len)

    doc_words = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.expr(
                    f"filter(split(lower(trim({text_col})), '\\\\s+'),"
                    " x -> x <> '')"
                )
            ).alias("wpos", "w0"),
        )
        .select("id", "wpos", F.expr(f"substring(w0, 1, {W})").alias("w"))
    )
    words = doc_words.select("w").distinct()
    raw = words.select("w", F.explode(F.expr(_uni_span_expr(L))).alias("s")).select(
        "w",
        F.col("s.i").alias("i"), F.col("s.l").alias("l"),
        F.col("s.ende").alias("ende"), F.col("s.pc").alias("pc"),
    )
    vocab = F.broadcast(piece_df.select(F.col("piece").alias("pc"), "prob_ppb"))
    multi = raw.where(F.col("l") > 1).join(vocab, "pc")
    # single-char spans: unknown characters become the unk piece (ppb 1),
    # so every prefix stays reachable
    singles = (
        raw.where(F.col("l") == 1)
        .join(vocab, "pc", "left")
        .select(
            "w", "i", "l", "ende",
            F.when(F.col("prob_ppb").isNotNull(), F.col("pc"))
            .otherwise(F.lit(unk))
            .alias("pc"),
            F.coalesce(F.col("prob_ppb"), F.lit(1)).alias("prob_ppb"),
        )
    )
    spans = multi.select("w", "i", "l", "ende", "pc", "prob_ppb").unionByName(
        singles
    )
    segmented = (
        spans.groupBy("w")
        .agg(
            F.expr(
                "sort_array(collect_list(struct(ende, l, i, pc, prob_ppb AS ppb)))"
            ).alias("spans")
        )
        .withColumn("best", F.expr(_UNI_DP_EXPR))
        .withColumn("wpcs", F.reverse(F.expr(_UNI_BACK_EXPR)))
        .select("w", "wpcs")
    )
    return (
        doc_words.join(segmented, "w")
        .groupBy("id")
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(wpos, wpcs))),"
                " x -> x.wpcs))"
            ).alias("pieces")
        )
        .withColumn("n_pieces", F.size("pieces").cast("bigint"))
    )


def token_band_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lo_pct: int = 10,
    hi_pct: int = 90,
) -> DataFrame:
    """Outlier-length pruning: keep documents whose whitespace token count
    lies within the corpus [lo_pct, hi_pct] percentile band — the standard
    pretraining-data step that drops fragments and boilerplate dumps.

    Percentiles are EXACT integer reads off the token-length distribution
    (smallest length with 100*cum >= pct*n — the e41 histogram convention,
    bit-identical across engines; no float interpolation).  The
    distribution is one map-side-combined aggregate over lengths (at most
    a few thousand distinct values no matter the corpus size), the two
    cutoffs are a one-row aggregate broadcast back, and the filter is a
    column predicate — the corpus shuffles zero rows.  Output: the input
    rows (plus ``n_tokens``) inside the band."""
    from pyspark.sql import Window

    toks = df.withColumn("n_tokens", n_tokens_expr(text_col))
    counts = toks.groupBy("n_tokens").agg(F.count("*").alias("__c__"))
    # windows over the LENGTH DISTRIBUTION (distinct token counts), never
    # over corpus rows — single-partition is fine at that cardinality
    w_cum = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = counts.withColumn("__cum__", F.sum("__c__").over(w_cum)).withColumn(
        "__n__", F.sum("__c__").over(w_all)
    )
    band = cum.agg(
        F.min(
            F.when(100 * F.col("__cum__") >= lo_pct * F.col("__n__"), F.col("n_tokens"))
        ).alias("__lo__"),
        F.min(
            F.when(100 * F.col("__cum__") >= hi_pct * F.col("__n__"), F.col("n_tokens"))
        ).alias("__hi__"),
    )
    return (
        toks.crossJoin(F.broadcast(band))
        .where(F.col("n_tokens").between(F.col("__lo__"), F.col("__hi__")))
        .drop("__lo__", "__hi__")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Quantized TF-IDF: top-k characteristic terms per document with a
    float-free score, so results hash-match across engines (same trick as
    ``unigram_surprisal``: float log is engine-dependent in the last ulp,
    integer bit length is not).

    score(term, doc) = tf * floor(log2(N // df))   — tf = in-doc count,
    df = number of documents containing the term, N = corpus size; the idf
    factor is ``length(bin(N DIV df)) - 1``.  Ties break on (term ASC), so
    the rank is total.  Corpus-wide terms (df == N) score 0 but still rank.

    Scale posture: one token explode; the document-frequency aggregate is
    vocab-sized and broadcasts; the only data-scale shuffle is the per-doc
    (id, term) count.  The top-k window partitions by document — millions of
    tiny partitions, no skew.  Pass ``n_docs`` when the caller already knows
    the corpus size (the usual case in a pipeline that just aggregated it);
    otherwise it is derived in-plan as a one-row aggregate over the pruned
    id column and broadcast into the vocab-sized df table — no driver
    collect, no separate pre-pass job over the text."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__tok__"),
    ).where(F.col("__tok__") != "")
    tf = toks.groupBy(id_col, "__tok__").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("__tok__").agg(
        F.countDistinct(id_col).alias("df")
    )
    if n_docs is None:
        ndocs = df.select(F.countDistinct(id_col).cast("bigint").alias("__n__"))
        dfreq = dfreq.crossJoin(F.broadcast(ndocs))
    else:
        dfreq = dfreq.withColumn("__n__", F.lit(int(n_docs)).cast("bigint"))
    scored = (
        tf.join(F.broadcast(dfreq), "__tok__")
        .withColumn(
            "idf_bits",
            (F.length(F.bin(F.expr("__n__ DIV df"))) - 1).cast("bigint"),
        )
        .withColumn("score", (F.col("tf") * F.col("idf_bits")).cast("bigint"))
        .drop("__n__")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("__tok__").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("__tok__").alias("term"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score",
        )
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 65536,
    weights: DataFrame | None = None,
    portable_hash: bool = True,
) -> DataFrame:
    """Feature-hashed linear text classifier (fasttext-shaped quality
    scoring): hash word unigrams+bigrams into ``n_buckets``, dot the bucket
    counts with a weight vector, threshold at 0.

    ``weights`` is an optional (bucket BIGINT, weight BIGINT) table — the
    trained model — which broadcasts into the scoring join.  Sparse-model
    semantics: the inner join keeps only MODELED buckets, so with a trained
    ``weights`` table ``n_features`` counts weighted features only (not all
    hashed features), and a document whose features all miss the model is
    ABSENT from the output (callers wanting every document back should
    left-join the result against the id set and treat missing as
    score=0/label=0).  When omitted, a deterministic hash-derived weight
    stands in for every bucket — n_features then counts all features (the
    Spark-side plumbing — explode, bucket, broadcast-join, aggregate — is
    the product; the weight table is config).  All-integer arithmetic, so
    the DuckDB oracle verifies values exactly.

    Scale posture: one feature explode per document (2x token count), one
    map-side-combined groupBy(id) — no data-scale join (weights are
    bucket-count-sized and broadcast).  The md5-based portable hash is the
    per-feature hot cost; ``portable_hash=False`` switches to JVM
    ``xxhash64`` (several times faster at 100 TB, same bucketing quality)
    when DuckDB-oracle portability is not needed — a model trained on one
    hash must score with the same hash.  Output: (id, n_features, score,
    label)."""
    from delta_sorter_spark.functions.hashing import spark_md5_long_sql

    arr = "filter(split(lower(trim({t})), '\\\\s+'), x -> x != '')".format(t=text_col)
    # greatest(..., 0): slice() raises on negative length, so an empty or
    # whitespace-only document (size(arr) = 0) must degrade to zero bigrams,
    # not abort the job
    n_bi = f"greatest(size({arr}) - 1, 0)"
    feats = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"concat({arr}, zip_with(slice({arr}, 1, {n_bi}),"
                f" slice({arr}, 2, {n_bi}),"
                f" (a, b) -> concat(a, ' ', b)))"
            )
        ).alias("__feat__"),
    )
    h = (
        F.expr(spark_md5_long_sql("__feat__"))
        if portable_hash
        else F.xxhash64("__feat__")
    )
    bucketed = feats.select(
        F.col(id_col),
        # pmod, not %: xxhash64 is signed and buckets must be non-negative
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    if weights is not None:
        scored = bucketed.join(F.broadcast(weights), "bucket").select(
            F.col(id_col), F.col("weight")
        )
    else:
        scored = bucketed.select(
            F.col(id_col),
            (
                (F.col("bucket") * F.lit(2654435761)) % F.lit(2147483648) % 2001
                - 1000
            ).alias("weight"),
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_features"),
            F.sum("weight").cast("bigint").alias("score"),
        )
        .withColumn(
            "label", F.when(F.col("score") > 0, 1).otherwise(0).cast("bigint")
        )
    )


def bigram_lm_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str,
    text_col: str,
    backoff_bits: int = 20,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Score documents against a count-based bigram LM (the KenLM-style
    quality filter: train the model on a trusted reference corpus with
    :func:`bigram_lm_counts`, then rank candidate documents by how
    surprising the reference model finds them).

    Per-bigram surprisal is the integer bit-length surrogate
    ``floor(log2(1e6 / prob_ppm))`` (0 bits for a certain continuation, 19
    for a 1-ppm one); bigrams the model has never seen (or whose prob_ppm
    rounds to 0) cost ``backoff_bits``.  All-integer, so the DuckDB oracle
    verifies scores exactly.

    Output: (id, n_bigrams, total_bits, avg_bits_ppm) — higher avg = less
    reference-like; documents with fewer than two tokens have no bigrams
    and are absent.  Scale shape: one bigram explode over the candidates
    (the only corpus-scale work); the LM table is reference-corpus-bounded
    and broadcasts (set ``broadcast_lm=False`` for a giant model — the join
    falls back to a hash shuffle on (w1, w2))."""
    toks = df.select(
        F.col(id_col),
        F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("__ts__"),
    )
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("__ts__") >= 2,
                F.expr(
                    "transform(sequence(1, size(__ts__) - 1),"
                    " i -> struct(element_at(__ts__, i) AS w1,"
                    "             element_at(__ts__, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("__b__"),
    ).select(F.col(id_col), "__b__.w1", "__b__.w2")
    model = lm.select("w1", "w2", "prob_ppm")
    if broadcast_lm:
        model = F.broadcast(model)
    scored = pairs.join(model, ["w1", "w2"], "left").select(
        F.col(id_col),
        F.when(
            F.col("prob_ppm").isNull() | (F.col("prob_ppm") < 1),
            F.lit(backoff_bits),
        )
        .otherwise(F.expr("length(bin(1000000 div prob_ppm)) - 1"))
        .cast("bigint")
        .alias("__bits__"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("__bits__").cast("bigint").alias("total_bits"),
        )
        .withColumn(
            "avg_bits_ppm",
            F.expr("CAST(1000000 * total_bits DIV n_bigrams AS BIGINT)"),
        )
    )



def canonical_url(url: Column | str) -> Column:
    """Crawl-style URL canonicalization — the key-normalization step before
    dedup-by-URL in web-corpus pipelines (CommonCrawl-derived sets dedup on
    a canonical URL before any content hashing):

    - scheme and authority lowercased; a leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https)
    - the ``#fragment`` dropped
    - tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``ref``), the survivors SORTED so param order never
      splits a URL into two identities; an emptied query loses its ``?``
    - trailing slashes on the path stripped

    Pure column expressions (regexp + array ops, no UDF), deterministic,
    and restated exactly in the e71 DuckDB oracle."""
    c = F.trim(F.col(url) if isinstance(url, str) else url)
    c = F.regexp_replace(c, "#.*$", "")  # fragment
    base = F.substring_index(c, "?", 1)
    auth = F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    # path split is positional: everything after the authority
    rest = F.substring(base, F.length(auth) + 1, F.lit(1 << 30))
    auth = F.lower(auth)
    auth = F.regexp_replace(auth, "^(https?://)www\\.", "$1")
    auth = F.regexp_replace(auth, "^(https://[^:/]*):443$", "$1")
    auth = F.regexp_replace(auth, "^(http://[^:/]*):80$", "$1")
    rest = F.regexp_replace(rest, "/+$", "")
    # everything after the FIRST '?' (matching base's split — a literal
    # '?' inside the query is legal per RFC 3986 and must stay in it)
    query = F.when(
        F.instr(c, "?") > 0,
        F.substring(c, F.instr(c, "?") + 1, F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid|ref)="),
        )
    )
    return F.concat(
        auth,
        rest,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    ).alias("canonical_url")


def url_dedup_stats(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Group documents by canonical URL: (canonical_url, n_docs, keep_id)
    where keep_id is the smallest id — the crawl-dedup survivor rule.
    One map-side-combinable aggregation after the pure-expression
    canonicalization; nothing shuffles except the grouped partials."""
    return (
        df.select(
            F.col(id_col).alias("__id__"),
            canonical_url(F.col(url_col)),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("__id__").alias("keep_id"),
        )
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: str,
    n: int = 2,
    num_buckets: int = 1 << 14,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much more
    likely its hashed n-gram bag is under the TARGET slice's n-gram
    distribution than under the RAW corpus distribution.  ``target_pred``
    is a SQL predicate over ``df``'s columns selecting the target slice
    (e.g. ``"lang = 'en'"`` or a quality label); high scores = documents
    that look like the target.  The standard recipe then resamples by
    these weights — feed the output straight into
    :func:`delta_sorter_spark.operators.sampling.weighted_sample`.

    Per n-gram the log-likelihood-ratio contribution uses the integer
    bit-length surrogate of :func:`unigram_surprisal` (float log is
    engine-dependent in the last ulp):

        bits(cnt_target[h] + 1) - bits(cnt_raw[h] + 1)

    with ``bits(x) = length(bin(x)) - 1 = floor(log2 x)`` and ``h`` the
    portable md5 hash of the n-gram modulo ``num_buckets`` (the paper's
    hashed feature space — collisions are part of the model).  The +1 is
    add-one smoothing so empty target buckets contribute a well-defined
    penalty.  Output: (id, n_ngrams, dsir_bits, avg_bits) with ``avg_bits``
    the ONE double division — documents with no n-grams (fewer than ``n``
    tokens) are absent.

    Scale posture: the corpus text explodes to hashed n-grams exactly once
    and both count tables derive from that same frame (map-side combinable,
    results <= num_buckets rows each, broadcast back) — so the per-doc
    rollup is the only corpus-sized shuffle, and n-gram skew lands on the
    broadcast side, never in a shuffle key."""
    from delta_sorter_spark.functions.hashing import spark_md5_long_sql

    if n < 1:
        raise ValueError("n-gram order must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.expr(target_pred).cast("boolean").alias("__t__"),
        F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("__ts__"),
    )
    gram = F.when(
        F.size("__ts__") >= n,
        F.expr(
            f"transform(sequence(1, size(__ts__) - {n - 1}),"
            f" i -> array_join(slice(__ts__, i, {n}), ' '))"
        ),
    ).otherwise(F.expr("array()"))
    grams = (
        toks.select(F.col(id_col), "__t__", F.explode(gram).alias("__g__"))
        .where(F.col("__g__") != "")
        .withColumn(
            "__b__",
            F.expr(f"{spark_md5_long_sql('__g__')} % {num_buckets}"),
        )
    )
    # ONE aggregation pass builds both distributions (raw = all grams,
    # target = conditional count) — the corpus is never re-read to count
    # the target slice separately
    counts = grams.groupBy("__b__").agg(
        F.count("*").alias("__nr__"),
        F.count(F.when(F.col("__t__"), F.lit(1))).alias("__nt__"),
    )
    bits = lambda c: (F.length(F.bin(c)) - 1).cast("bigint")  # noqa: E731
    buckets = counts.select(
        "__b__",
        (bits(F.col("__nt__") + 1) - bits(F.col("__nr__") + 1)).alias("__w__"),
    )
    return (
        grams.join(F.broadcast(buckets), "__b__")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_ngrams"),
            F.sum("__w__").cast("bigint").alias("dsir_bits"),
        )
        .withColumn(
            "avg_bits",
            F.col("dsir_bits").cast("double") / F.col("n_ngrams").cast("double"),
        )
    )
