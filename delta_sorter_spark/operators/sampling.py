"""Dataset splitting and sequence packing for training-data pipelines.

Both operators are deterministic column expressions — rerunning on the same
data yields the same assignment on any cluster size (no ``rand()``, whose
per-partition streams change with partitioning), and both have exact DuckDB
oracle equivalents.

- ``hash_split``: md5-bucket each row into named splits by fractional
  weights.  The split is a pure function of the id, so late-arriving data
  joins the same split it would have gotten, and train/test never leak
  across reruns.
- ``pack_sequences``: assign documents to fixed-token-budget bins (context
  windows) by running-token-count order — the standard scan-order
  approximation of bin packing used for LLM pretraining batches.  One
  window over a deterministic order; at scale, partition the window by a
  shard column (e.g. date) so the running sum never funnels through one
  partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import spark_md5_long_sql


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    buckets: int = 1000,
    seed: str = "split-v1",
) -> DataFrame:
    """Append a ``split`` column: deterministic md5 bucketing of the id.

    ``seed`` is a salt string baked into the hash so different splits of the
    same table are independent."""
    total = sum(w for _, w in splits)
    bucket = F.expr(
        f"pmod({spark_md5_long_sql(f'concat(CAST({id_col} AS STRING), {seed!r})')}, {buckets})"
    )
    expr = None
    acc = 0.0
    for name, weight in splits[:-1]:
        acc += weight / total
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 1000,
    seed: str = "sample-v1",
) -> DataFrame:
    """Keep each row with a per-stratum probability — deterministically: a
    row survives iff ``md5(id || seed) % buckets < rate[stratum] *
    buckets``.  This is the domain-mixing primitive for training corpora
    (upweight curated sources, downsample crawl): purely expression-based,
    so it runs at scan time with no shuffle, and the SAME rows survive on
    any cluster size or rerun (no ``rand()``)."""
    bucket = F.expr(
        f"pmod({spark_md5_long_sql(f'concat(CAST({id_col} AS STRING), {seed!r})')},"
        f" {buckets})"
    )
    cut = None
    for val, r in rates.items():
        cond = F.col(stratum_col) == val
        thresh = F.lit(int(round(r * buckets)))
        cut = F.when(cond, thresh) if cut is None else cut.when(cond, thresh)
    default = F.lit(int(round(default_rate * buckets)))
    cut = default if cut is None else cut.otherwise(default)
    return df.where(bucket < cut)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-cut packing: documents (in id order, per shard) form
    one token stream; context windows of ``budget`` tokens are cut from it,
    and each document is assigned the window its tokens START in:
    ``bin = floor(running_tokens_before / budget)``.

    This is the standard GPT-style pretraining packing (documents straddle
    window boundaries rather than leaving padding).  Oversized documents are
    capped at one budget for accounting (chunking them is the tokenizer's
    job upstream).  Output adds (bin_id, bin_offset): where the doc's tokens
    begin within its window."""
    order = [F.col(id_col)]
    w = (
        Window.partitionBy(shard_col).orderBy(*order)
        if shard_col
        else Window.partitionBy().orderBy(*order)
    )
    frame = w.rowsBetween(Window.unboundedPreceding, -1)
    capped = F.least(F.col(token_col), F.lit(budget))
    before = F.coalesce(F.sum(capped).over(frame), F.lit(0))
    return (
        df.withColumn("__before__", before)
        .withColumn("bin_id", (F.col("__before__") / budget).cast("long"))
        .withColumn("bin_offset", F.pmod(F.col("__before__"), F.lit(budget)).cast("long"))
        .drop("__before__")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "shuf",
    n_shards: int = 64,
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering.

    Appends ``shard`` (md5 bucket of the id) and ``pos`` (rank of the salted
    hash within the shard): reading shards in order, each shard by ``pos``,
    yields a pseudo-random document order that is identical across reruns,
    cluster sizes, and engines — the property a resumable pretraining run
    needs from its data order.

    Scale shape: the rank is a per-shard window (n_shards independent
    partitions), never a global single-partition sort; at 100 TB pick
    n_shards ~ corpus_bytes / target_shard_bytes."""
    h_sql = spark_md5_long_sql(f"concat(CAST({id_col} AS STRING), {seed!r})")
    w = Window.partitionBy("shard").orderBy("__h__", id_col)
    return (
        df.withColumn("__h__", F.expr(h_sql))
        .withColumn("shard", F.pmod(F.col("__h__"), F.lit(n_shards)).cast("long"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h__")
    )

def domain_mix_plan(
    df: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    lang_col: str,
    budget: int = 10_000,
) -> DataFrame:
    """Per-domain corpus profile + proportional sample allocation — the
    planning step of domain-mixing for a training set.  For each domain:
    document count, distinct languages, total whitespace tokens, and an
    integer ``alloc`` = floor(budget * n_docs / N) (largest-remainder NOT
    applied: allocations are reproducible, sum <= budget, and each domain's
    share is monotone in its size).

    One aggregation, map-side combinable; the token count is a pure column
    expression (no explode — size(filter(split(...)))), so the scan stays in
    whole-stage codegen and the shuffle carries one row per domain."""
    tokens = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    ).cast("bigint")
    per_domain = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.col(lang_col)).alias("n_langs"),
        F.sum(tokens).alias("total_tokens"),
        F.min(F.col(id_col)).alias("min_doc_id"),
    )
    total = df.count()
    return per_domain.select(
        "source",
        "n_docs",
        "n_langs",
        "total_tokens",
        "min_doc_id",
        F.expr(f"CAST({int(budget)} * n_docs AS BIGINT) DIV {int(total)}").alias("alloc"),
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    budget: int,
    alpha_quarters: int = 2,
    seed: str = "temp-v1",
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual/mixture
    sampling rule of mBERT/XLM-R/mT5): sample domains with probability
    proportional to ``n_domain ** alpha`` so head domains shrink and tail
    domains survive, with ``alpha = alpha_quarters / 4`` (alpha 1 =
    proportional, 0 = uniform across domains; the common temperature
    tau = 2 is ``alpha_quarters=2``).

    Deterministic AND cross-engine exact despite the fractional power:
    alpha is restricted to quarters so ``n^alpha`` composes from IEEE-754
    ``sqrt`` (required correctly-rounded, unlike ``pow``) and exact double
    products — ``n^(1/4) = sqrt(sqrt(n))``, ``n^(3/4) = sqrt(n) *
    sqrt(sqrt(n))`` — then quantizes to a ppm BIGINT weight; every later
    step (share-of-budget allocation, per-domain keep rate, md5 row gate)
    is integer, so a SQL oracle replays the sample row-for-row.

    Per domain: ``m = (budget * w) DIV W`` target docs, kept via
    ``md5(id || seed) % 1e6 < rate_ppm`` with ``rate_ppm = min(1e6,
    m * 1e6 DIV n)`` — the same scan-time hash gate as
    :func:`stratified_sample`, now with rates DERIVED from corpus counts
    instead of hand-set.

    Scale shape: one map-side-combinable count per domain, the tiny rate
    table broadcast-joined back, and a scan-time filter — the corpus never
    shuffles.  Output: input columns + ``rate_ppm``.  The expected sample
    size tracks ``budget`` (floor rounding makes it a lower-bound-ish
    target, the hash gate adds binomial noise per domain)."""
    if not 0 <= alpha_quarters <= 4:
        raise ValueError("alpha_quarters must be in [0, 4] (alpha = quarters/4)")
    nd = "CAST(n_docs AS DOUBLE)"
    w_by_q = {
        0: "CAST(1000000 AS BIGINT)",
        1: f"CAST(floor(1000000 * sqrt(sqrt({nd}))) AS BIGINT)",
        2: f"CAST(floor(1000000 * sqrt({nd})) AS BIGINT)",
        3: f"CAST(floor(1000000 * (sqrt({nd}) * sqrt(sqrt({nd})))) AS BIGINT)",
        4: "CAST(1000000 AS BIGINT) * n_docs",
    }
    per_domain = (
        df.groupBy(F.col(source_col).alias("__src__"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("__wppm__", F.expr(w_by_q[alpha_quarters]))
    )
    total = per_domain.agg(F.sum("__wppm__").cast("bigint").alias("__W__"))
    rates = (
        per_domain.crossJoin(F.broadcast(total))
        .withColumn(
            "rate_ppm",
            F.expr(
                f"least(CAST(1000000 AS BIGINT),"
                f" (({int(budget)} * __wppm__) DIV __W__) * 1000000 DIV n_docs)"
            ),
        )
        .select("__src__", "rate_ppm")
    )
    gate = (
        f"pmod({spark_md5_long_sql(f'concat(CAST({id_col} AS STRING), {seed!r})')},"
        f" 1000000)"
    )
    return (
        df.join(
            F.broadcast(rates), df[source_col] == rates["__src__"]
        )
        .where(F.expr(gate) < F.col("rate_ppm"))
        .drop("__src__")
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_expr: str,
    k: int,
    seed: str = "wps-v1",
    u_scale: int = 1_000_000,
    w_scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the ``k``
    rows with the highest priority ``floor(w * w_scale) * u_scale / u``
    where ``u`` is a per-row integer in [1, u_scale] derived from the
    portable md5 hash of (seed, id) — Duffield/Lund/Thorup priority
    sampling with the RNG replaced by a seeded hash, so re-runs (and a SQL
    oracle) reproduce the sample exactly.  Rows with larger weights win
    proportionally more often; the all-integer priority makes cross-engine
    ordering exact, and the ``w_scale`` ppm quantization keeps FRACTIONAL
    weights (quality scores in (0, 1)) meaningful — a bare BIGINT cast
    would zero them and silently empty the sample.

    Scale posture: priorities are a map-side expression and the top-k
    compiles to TakeOrderedAndProject (per-partition local top-k, k rows per
    partition to the driver side of the sort) — no global sort, no single
    partition exchange.  Output: input columns + ``priority``.

    Weights must be positive; weights below 1/w_scale (and zero/negative)
    exclude the row."""
    hashed_expr = f"concat('{seed}', CAST({id_col} AS STRING))"
    u = f"(({spark_md5_long_sql(hashed_expr)}) % {u_scale}) + 1"
    # the DOUBLE cast avoids 32-bit wraparound on integer weight exprs and
    # is exact for w * w_scale < 2^53 (i.e. weights below ~9e6 at ppm scale)
    pri = F.expr(
        f"CAST(floor(CAST(({weight_expr}) AS DOUBLE) * {w_scale}) AS BIGINT)"
        f" * {u_scale} DIV ({u})"
    )
    return (
        df.withColumn("priority", pri)
        .where(F.col("priority") > 0)
        .orderBy(F.desc("priority"), F.col(id_col).asc())
        .limit(k)
    )


def epoch_capped_mix(
    df: DataFrame,
    source_col: str,
    budget: int,
    max_epochs: int,
    weight_expr: str = "1",
) -> DataFrame:
    """Epoch-capped domain mixing plan (the data-constrained-scaling rule of
    Muennighoff et al. 2023: repeating data beyond ~4 epochs stops helping,
    so a mixture must CAP per-domain repetition).  Allocate ``budget``
    documents across domains proportionally to ``weight_expr`` (a per-row
    SQL expression aggregated ``max`` per domain — weights are domain
    config), but never allocate more than ``max_epochs`` passes over a
    domain's actual documents; surplus budget from capped domains
    redistributes to uncapped ones, still weight-proportionally.

    The waterfall needs NO loop: sort domains by capacity-to-weight ratio
    ascending — the capped set is then always a prefix — and decide each
    domain against the budget/weight REMAINING after the prefix above it,
    via two window cumulative sums.  One aggregation + one window over
    domain-count rows; every quantity is integer (the clamp test
    cross-multiplies BIGINTs instead of comparing ratios), so the plan is
    bit-identical in any engine.

    Output per domain: (source, n_docs, weight, cap_docs, capped,
    alloc_docs, epochs_milli) where ``epochs_milli`` = 1000·alloc/n_docs
    floored.  Integer flooring leaves a remainder of up to one doc per
    domain unallocated — the same reproducibility-over-exhaustion
    convention as :func:`domain_mix_plan`."""
    B, E = int(budget), int(max_epochs)
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.max(F.expr(weight_expr)).cast("bigint").alias("weight"),
    )
    per = per.withColumn("cap_docs", F.col("n_docs") * E)
    # capped set is a prefix under cap/weight ascending (water-filling).
    # weight 0 is the "exclude this domain" config: its ratio is +inf (it
    # sorts last, outside the capped prefix, alloc 0) — spelled explicitly
    # because x/0 is NULL (nulls-FIRST under asc) or an ANSI error, both
    # of which would break the prefix property
    ratio = F.when(
        F.col("weight") <= 0, F.lit(float("inf"))
    ).otherwise(F.col("cap_docs").cast("double") / F.col("weight"))
    w = Window.orderBy(ratio.asc(), F.col("source").asc())
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    total_w = F.sum("weight").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum_cap = F.coalesce(F.sum("cap_docs").over(prior), F.lit(0))
    cum_w = F.coalesce(F.sum("weight").over(prior), F.lit(0))
    # The per-row prefix test is sound even past the capped prefix: cap/w is
    # non-decreasing, and removing an above-ratio element only lowers the
    # remaining budget/weight ratio, so once the test fails it stays false.
    staged = per.select(
        "source", "n_docs", "weight", "cap_docs",
        (
            (F.col("weight") > 0)  # weight 0 = excluded: never "capped"
            & (
                F.col("cap_docs") * (total_w - cum_w)
                <= F.col("weight") * (F.lit(B) - cum_cap)
            )
        ).alias("capped"),
    )
    # every uncapped domain shares the SAME post-prefix remainder: budget and
    # weight left after all capped domains (not its own row position)
    full = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rem_budget = F.lit(B) - F.coalesce(
        F.sum(F.when(F.col("capped"), F.col("cap_docs"))).over(full), F.lit(0)
    )
    rem_weight = F.sum("weight").over(full) - F.coalesce(
        F.sum(F.when(F.col("capped"), F.col("weight"))).over(full), F.lit(0)
    )
    staged = staged.select(
        "source", "n_docs", "weight", "cap_docs", "capped",
        rem_budget.alias("rem_budget"),
        rem_weight.alias("rem_weight"),
    )
    alloc = F.when(F.col("capped"), F.col("cap_docs")).otherwise(
        F.greatest(
            F.coalesce(
                F.expr(
                    "CAST(weight * rem_budget AS BIGINT)"
                    " DIV nullif(rem_weight, 0)"
                ),
                F.lit(0),
            ),
            F.lit(0),
        )
    )
    return staged.select(
        "source", "n_docs", "weight", "cap_docs", "capped",
        alloc.cast("bigint").alias("alloc_docs"),
    ).withColumn(
        "epochs_milli", F.expr("(1000 * alloc_docs) DIV n_docs")
    )
