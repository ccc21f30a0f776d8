"""Streaming-friendly frequency sketches (training-data pipeline surface —
the reference has no aggregation framework at all, SURVEY §2.9).

``count_min_sketch`` builds a Count-Min sketch (Cormode & Muthukrishnan 2005)
over a column: ``depth`` pairwise-independent hash rows x ``width`` buckets,
each cell counting the items that hash into it.  Estimated frequency of v is
``min_j cells[j][h_j(v)]`` — always an over-estimate, within ``eps * N`` with
probability ``1 - delta`` for ``width = e/eps``, ``depth = ln(1/delta)``.

Everything is hash-groupBy: one scan + one explode (depth replication) + one
shuffle of at most ``depth * width`` cells — the sketch is mergeable across
partitions by construction (cells add), which is what makes it the right
shape for 100 TB / streaming frequency estimation where exact per-key counts
would shuffle every distinct key.

Hashes are the portable md5-affine family from functions/hashing.py, so a
DuckDB oracle reproduces every cell exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import (
    minhash_params,
    minhash_perm_sql,
    spark_md5_long_sql,
)


def _bucket_sql(value_expr: str, a: int, b: int, width: int) -> str:
    base = spark_md5_long_sql(value_expr)
    return f"({minhash_perm_sql(base, a, b)} % {width})"


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) — depth*width cells at most.

    One scan; the depth-times replication happens via a generated array +
    explode, not repeated scans."""
    params = minhash_params(depth, seed)
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                F.expr(_bucket_sql(col, a, b, width)).alias("bucket"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Point-query the sketch for every distinct value of ``col``:
    (value, est_cnt).  est_cnt >= true count always (CM guarantee).

    The sketch side is tiny (depth*width rows) and is broadcast; the probe
    is one scan over distinct values."""
    params = minhash_params(depth, seed)
    values = df.select(F.col(col).alias("value")).distinct()
    probes = values.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        F.expr(_bucket_sql("value", a, b, width)).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )
        ).alias("c"),
    ).select("value", F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"])
    return joined.groupBy("value").agg(F.min("cnt").alias("est_cnt"))


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — mergeable approximate distinct count.
# At 100 TB exact COUNT(DISTINCT) shuffles every distinct key; HLL reduces a
# column to HLL_M max-registers (map-side combinable, unionable across
# partitions/streams) with ~1.04/sqrt(m) relative error.
#
# Portable construction (identical in Spark SQL and DuckDB, like the CMS
# above): 60-bit md5 hash -> low 6 bits pick the bucket, the remaining
# 54-bit substream w contributes rank = leading-zeros(w) + 1 = 55 -
# bit_length(w), computed via length(bin(w)) which both engines render
# minimally.  The estimator avoids float accumulation: each register's
# 2^-register term is scaled by 2^55 so the harmonic sum is an EXACT integer,
# and the single final double division is IEEE-correctly-rounded — hence
# bit-identical across engines.  No small/large-range corrections (they need
# ln(), whose last-ulp behavior is libm-specific); this is the raw HLL
# estimator, documented as such.
# ---------------------------------------------------------------------------

HLL_M = 64  # buckets (6 bits); relative error ~1.04/sqrt(64) = 13%
_HLL_SUB_BITS = 54  # 60-bit hash minus 6 bucket bits
_HLL_MAX_RANK = _HLL_SUB_BITS + 1  # rank when the whole substream is zero
HLL_ALPHA_NUM = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << _HLL_MAX_RANK)


def _hll_rank_sql(w: str) -> str:
    """Rank of substream ``w`` (leading zeros + 1 in a 54-bit field); valid
    in both Spark SQL and DuckDB."""
    return (
        f"CAST(CASE WHEN {w} = 0 THEN {_HLL_MAX_RANK}"
        f" ELSE {_HLL_MAX_RANK} - length(bin({w})) END AS BIGINT)"
    )


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """Reduce ``col`` to (bucket, register) max-registers — the mergeable HLL
    state (merge = groupBy(bucket).max(register)).  One scan, map-side
    combine, shuffle of at most HLL_M rows per partition."""
    h = spark_md5_long_sql(col)
    w = f"({h} DIV {HLL_M})"
    return (
        df.select(
            F.expr(f"CAST({h} % {HLL_M} AS BIGINT)").alias("bucket"),
            F.expr(_hll_rank_sql(w)).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Distinct-count estimate from HLL state: one row, ``est_distinct``.

    Harmonic sum computed exactly in integers (2^(55-register) per observed
    bucket, 2^55 per empty bucket), then a single double division."""
    agg = registers.agg(
        F.count("*").alias("n_obs"),
        F.sum(F.expr(f"CAST(power(2, {_HLL_MAX_RANK} - register) AS BIGINT)")).alias(
            "s_obs"
        ),
    )
    total = F.col("s_obs") + (F.lit(HLL_M) - F.col("n_obs")) * F.lit(1 << _HLL_MAX_RANK)
    return agg.select((F.lit(HLL_ALPHA_NUM) / total).alias("est_distinct"))


# ---------------------------------------------------------------------------
# Bloom filter — semi-join reduction (runtime-filter shape).  At 100 TB the
# classic move is: build a compact filter over the SMALL side's join keys,
# broadcast it, and drop non-matching fact rows BEFORE the shuffle — Spark's
# own runtime filters (spark.sql.optimizer.runtime.bloomFilter.enabled) do
# exactly this, but opaquely; this portable md5-affine construction is
# deterministic so the DuckDB oracle reproduces every bit and every false
# positive.  The bit set is mergeable (union of set bits).
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 8192  # ~5% FP at ~1.2k keys, k=3; still a trivial broadcast
BLOOM_K = 3


def bloom_bits(
    df: DataFrame,
    col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    seed: int = 42,
) -> DataFrame:
    """Build the filter over ``col``: distinct set bit positions (bit BIGINT).
    One scan + a <= m_bits-row distinct — mergeable across partitions,
    tables, or streams by plain union+distinct."""
    params = minhash_params(k, seed)
    h = spark_md5_long_sql(col)
    arms = F.array(
        *[
            F.expr(f"CAST({minhash_perm_sql(h, a, b)} % {m_bits} AS BIGINT)")
            for a, b in params
        ]
    )
    return df.select(F.explode(arms).alias("bit")).distinct()


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bits: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    seed: int = 42,
) -> DataFrame:
    """Keep only rows whose ``col`` MAY be in the set (all k bits present).
    The bit set collapses to one broadcast array row; the probe side stays
    fully distributed and un-shuffled — rows are dropped at scan time, which
    is the whole point of a runtime filter."""
    params = minhash_params(k, seed)
    h = spark_md5_long_sql(col)
    bitset = bits.agg(F.sort_array(F.collect_set("bit")).alias("__bits__"))
    probe = df.crossJoin(F.broadcast(bitset))
    cond = F.lit(True)
    for a, b in params:
        pos = f"CAST({minhash_perm_sql(h, a, b)} % {m_bits} AS BIGINT)"
        cond = cond & F.array_contains(F.col("__bits__"), F.expr(pos))
    return probe.where(cond).drop("__bits__")

def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: tuple = (50, 90, 99),
) -> DataFrame:
    """Mergeable histogram-sketch quantiles: bucket values by floor(value),
    count per (group, bucket) — a partial-aggregatable sketch whose union
    is just count addition — then read each percentile as the smallest
    bucket whose cumulative count covers it.  The comparison is pure
    integers (100*cum >= pct*n), so estimates are bit-identical across
    engines; floor of an IEEE double is deterministic too.

    The classic exact-quantile alternative needs a full sort per group;
    this is one map-side-combinable aggregation plus a window over the
    (bounded) bucket space — the right trade at 100 TB, with resolution
    set by the bucket width."""
    from pyspark.sql.window import Window

    counts = df.groupBy(
        F.col(group_col), F.floor(F.col(value_col)).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w))
    tot = counts.groupBy(group_col).agg(F.sum("c").alias("n"))
    j = cum.join(tot, group_col)
    aggs = [F.max("n").alias("n_events")] + [
        F.min(
            F.when(
                F.lit(100) * F.col("cum") >= F.lit(int(p)) * F.col("n"),
                F.col("bucket"),
            )
        ).alias(f"p{p}_bucket")
        for p in pcts
    ]
    return j.groupBy(group_col).agg(*aggs)


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the distinct-count sibling of the
# CMS frequency sketch above.
# ---------------------------------------------------------------------------


def hll_alpha_ppm(m: int) -> int:
    """The standard bias constant alpha_m = 0.7213 / (1 + 1.079/m) as an
    integer ppm — embedded as a LITERAL in both the Spark expression and
    the SQL oracle, so the estimate arithmetic stays integer/deterministic."""
    return int(round(1_000_000 * 0.7213 / (1 + 1.079 / m)))


def hll_grouped_registers(
    df: DataFrame,
    col: str,
    p: int = 9,
    q: int = 40,
    group_cols=(),
) -> DataFrame:
    """HyperLogLog register maxes per group: (group_cols..., register, rho).

    The portable 60-bit md5 hash splits into a ``p``-bit register index and
    a ``q``-bit suffix whose leading-zero count (+1) is rho — all via
    integer div/mod/bin-length, no floats, so a DuckDB oracle reproduces
    every register exactly.  One scan + one map-side-combined max shuffle of
    at most ``m = 2**p`` rows per group; registers merge across partitions
    (and across sketches) by max, the property that makes HLL the right
    distinct-count shape at 100 TB where exact counting shuffles every
    distinct key."""
    h = spark_md5_long_sql(col)
    m = 1 << p
    reg = f"pmod({h}, {m})"
    w = f"(({h}) div {m}) % {1 << q}"
    # rho = 1-indexed position of the suffix's leftmost 1-bit within q bits:
    # q - (bit_length(w) - 1); an all-zero suffix scores q + 1
    rho = f"CASE WHEN {w} = 0 THEN {q + 1} ELSE {q} - length(bin({w})) + 1 END"
    return (
        df.select(*group_cols, F.expr(reg).alias("register"), F.expr(rho).alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").cast("bigint").alias("rho"))
    )


def hll_grouped_estimate(
    registers: DataFrame,
    p: int = 9,
    group_cols=(),
    scale_pow: int = 50,
) -> DataFrame:
    """Raw HLL estimate per group from a register frame:
    (group_cols..., m, n_zero_registers, estimate).

    All-integer: each register contributes ``2**(scale_pow - rho)`` to the
    harmonic sum (absent registers count as rho=0 -> ``2**scale_pow``), and
    the estimate is ``alpha_ppm * m^2 * 2**scale_pow // (sum * 10^6)`` —
    one integer division, so Spark's parallel aggregation and a serial SQL
    oracle agree bit-for-bit.  The small-range linear-counting correction
    is intentionally omitted (it needs ln); n_zero_registers is emitted so
    callers can apply it."""
    m = 1 << p
    alpha = hll_alpha_ppm(m)
    term = F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {scale_pow} - rho) AS BIGINT)")
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("__present__"),
        F.sum(term).alias("__s__"),
    )
    # absent registers have rho = 0 -> they contribute 2**scale_pow each
    full_sum = (
        F.col("__s__")
        + (F.lit(m) - F.col("__present__")) * F.lit(1 << scale_pow)
    ).alias("__den__")
    num = f"CAST({alpha} AS DECIMAL(38,0)) * {m} * {m} * CAST({1 << scale_pow} AS DECIMAL(38,0))"
    return (
        agg.select(
            *group_cols,
            F.lit(m).cast("bigint").alias("m"),
            (F.lit(m) - F.col("__present__")).cast("bigint").alias(
                "n_zero_registers"
            ),
            full_sum,
        )
        # floor() (not a decimal->bigint cast, which DuckDB ROUNDS) keeps the
        # two engines' integer-division semantics identical
        .withColumn(
            "estimate",
            F.expr(
                f"CAST(floor(({num}) / (CAST(__den__ AS DECIMAL(38,0)) * 1000000))"
                " AS BIGINT)"
            ),
        )
        .drop("__den__")
    )


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (k counters), merged
    batch-wise with the mergeable-summaries rule (Agarwal et al. 2012):
    add counts, then if more than k counters survive, subtract the
    (k+1)-th largest count from all and drop the non-positive.  Each Arrow
    batch is folded in via vectorized ``value_counts`` — no per-row Python.

    Guarantee: within a partition holding N_i items, every value with
    frequency > N_i/(k+1) is present in that partition's summary, so (by
    averaging) the UNION of summaries is a superset of every value with
    global frequency > N/(k+1).  Output: (item, est) with est <= true
    count; at most k rows per input partition.

    This is the bounded-memory candidate pass for :func:`heavy_hitters` —
    the same shape as Spark's own ``DataFrame.stat.freqItems``, but with
    counts carried and the summary exposed for a exact second pass."""
    import pandas as pd

    out_schema = "item string, est bigint"

    def mg(batches):
        counters: "pd.Series | None" = None
        for pdf in batches:
            vc = pdf[col].dropna().astype(str).value_counts()
            if vc.empty:
                continue
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame(
                {"item": counters.index, "est": counters.astype("int64").values}
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, schema=out_schema
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """EXACT heavy hitters with bounded memory: every value whose count
    strictly exceeds N/(k+1), with its exact count — the two-pass
    Misra-Gries scheme (candidate summaries, then exact counts restricted
    to candidates).  Output: (item, n).

    Deterministic even though the CANDIDATE set depends on partitioning:
    candidates are always a superset of the true heavy hitters (the MG
    guarantee), the second pass counts candidates exactly, and the final
    filter keeps only true heavy hitters — spurious candidates drop out.

    Scale shape (vs a plain groupBy over 100 TB of tokens): the full
    groupBy shuffles every DISTINCT value (a web-scale vocabulary spills);
    here pass 1 shuffles at most k rows per partition, the candidate set
    broadcasts into a semi-join, and pass 2's groupBy aggregates only
    candidate rows — the vocabulary-scale shuffle never happens.  The
    corpus is scanned twice (same trade as the minhash accuracy audit);
    persist the input to pay one scan."""
    items = df.select(F.col(col).cast("string").alias("item"))
    cands = misra_gries_candidates(items, "item", k).select("item").distinct()
    total = items.agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    return (
        items.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") * (k + 1) > F.col("__n__"))
        .select("item", "n")
    )


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, seed: str = "kmv"
) -> DataFrame:
    """K-minimum-values sketch (Bar-Yossef et al. 2002): the ``k`` smallest
    DISTINCT 60-bit portable hashes of ``col``.  A k-row summary of an
    arbitrarily large set, mergeable by union-then-rekeep-k.

    Plan: one hash-distinct exchange over 8-byte keys (the e1 exact-dedup
    scale shape) + TakeOrderedAndProject — per-partition top-k combines
    map-side, so only k rows per partition ever move.  Deterministic:
    built on the same md5 family as MinHash/Bloom, identical in DuckDB."""
    h = F.expr(
        spark_md5_long_sql(f"concat(CAST(`{col}` AS STRING), '{seed}')")
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, col: str, k: int = 256, seed: str = "kmv"
) -> DataFrame:
    """Estimate the Jaccard overlap of two corpora WITHOUT joining them —
    the contamination / corpus-overlap screen at 100 TB: each side reduces
    to a k-row KMV sketch, and the estimate is computed from the sketches
    alone.  ``jaccard_ppm = |MinK(A∪B) ∩ sketch(A) ∩ sketch(B)| / |MinK(A∪B)|``
    (Beyer et al. 2007); distinct-cardinality estimates derive from
    ``kth_union_hash`` as (k-1)*2^60/h_k — left to the caller, the sketch
    outputs here are exact integers so the oracle can replicate them
    bit-for-bit.

    Returns one row: (k_union, matches, jaccard_ppm, kth_union_hash)."""
    sa = kmv_sketch(a, col, k, seed)
    sb = kmv_sketch(b, col, k, seed)
    union_k = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    both = sa.join(sb, "h", "left_semi")
    matched = union_k.join(both, "h", "left_semi")
    return (
        union_k.agg(
            F.count("*").cast("bigint").alias("k_union"),
            F.max("h").alias("kth_union_hash"),
        )
        .crossJoin(
            matched.agg(F.count("*").cast("bigint").alias("matches"))
        )
        .select(
            "k_union",
            "matches",
            F.expr("CAST(1000000 * matches DIV k_union AS BIGINT)").alias(
                "jaccard_ppm"
            ),
            "kth_union_hash",
        )
    )
