"""Driver contract for the spark-graft builder (PySpark target).

Every query here is one operator from SURVEY.md §2 (reference parity V1-V3 /
Q1-Q4 and the north-star extensions E1-E6), expressed Spark-first through
``delta_sorter_spark`` operators, with an exact DuckDB oracle.

Cross-engine determinism rules used throughout (validated empirically):
- md5 -> first 15 hex digits -> bigint is identical in both engines
  (delta_sorter_spark/functions/hashing.py);
- double folds via Spark ``aggregate``/``zip_with`` are bitwise-identical to
  DuckDB ``list_aggregate``/``list_transform`` (both fold left-to-right);
- money arithmetic aggregates in DECIMAL (exact) and casts the final value
  to DOUBLE;
- timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_sorter_spark.functions.hashing import (
    MERSENNE_P,
    duckdb_md5_long_sql,
    hyperplanes,
    minhash_params,
)
from delta_sorter_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from delta_sorter_spark.operators.joins import asof_join, range_join
from delta_sorter_spark.plans import tpch_extra
from delta_sorter_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_neardup_pairs,
)
from delta_sorter_spark.operators.textstats import (
    bpe_token_stats,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from delta_sorter_spark.functions.localframe import local_df
from delta_sorter_spark.sources.tables import load_table
from delta_sorter_spark.streaming.events import sessionize, windowed_event_counts

# ---------------------------------------------------------------------------
# shared tuning constants (must match between queries() and oracle_sql())
# ---------------------------------------------------------------------------

N_CHUNKS = 8  # simulated "files" for the validator queries (V1-V3)
MINHASH_K = 8
MINHASH_BANDS = 4
DOC_SUBSET_MOD = 5  # documents subset for minhash/simhash (100 docs)
JACCARD_SUBSET_MOD = 25  # documents subset for exact jaccard (20 docs)
JACCARD_THRESHOLD = 0.5
QUERY_VEC_MOD = 50  # embedding query subset (10 queries)
CDF_MOD = 10  # orderkey modulus for the scratch-table DML/CDF scenarios
TOPK = 5
EMB_DIM = 64
N_PLANES = 8
TPCH1_CUTOFF = "1998-09-02 00:00:00"
NEARDUP_THRESHOLD = 0.40  # embedding-cosine near-dup cut (59 pairs at sf0.01)
RANGE_LOWER_S = 1
RANGE_UPPER_S = 600

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_KEY = ["l_shipdate", "l_orderkey", "l_linenumber"]  # validator sort key


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem annotated with a simulated file id.

    The reference validates physical files; the driver's oracle runs on flat
    parquet views, so V1-V3 are expressed over deterministic simulated file
    chunks (l_orderkey % N) — identical computation shape, fully
    oracle-checkable.  The file-granular versions run against real Delta
    tables in tests/test_validate_and_compact.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % N_CHUNKS).alias("file_id"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )


# ---------------------------------------------------------------------------
# V1: per-file min/max sort-key tuple (reference lib.rs:600-665, A1)
# ---------------------------------------------------------------------------


def q_v1_file_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunks(spark, sf_dir)
    w_asc = Window.partitionBy("file_id").orderBy(*[F.asc(k) for k in _KEY])
    w_desc = Window.partitionBy("file_id").orderBy(*[F.desc(k) for k in _KEY])
    mn = (
        c.withColumn("rn", F.row_number().over(w_asc))
        .where(F.col("rn") == 1)
        .select(
            "file_id",
            F.date_format("l_shipdate", _TS_FMT_SPARK).alias("min_shipdate"),
            F.col("l_orderkey").alias("min_orderkey"),
        )
    )
    mx = (
        c.withColumn("rn", F.row_number().over(w_desc))
        .where(F.col("rn") == 1)
        .select(
            "file_id",
            F.date_format("l_shipdate", _TS_FMT_SPARK).alias("max_shipdate"),
            F.col("l_orderkey").alias("max_orderkey"),
        )
    )
    return mn.join(mx, "file_id")


_V1_SQL = f"""
WITH c AS (
  SELECT l_orderkey % {N_CHUNKS} AS file_id, l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
),
mn AS (
  SELECT file_id, l_shipdate, l_orderkey,
         row_number() OVER (PARTITION BY file_id
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
  FROM c
),
mx AS (
  SELECT file_id, l_shipdate, l_orderkey,
         row_number() OVER (PARTITION BY file_id
                            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM c
)
SELECT mn.file_id,
       strftime(mn.l_shipdate, '{_TS_FMT_DUCK}') AS min_shipdate,
       mn.l_orderkey AS min_orderkey,
       strftime(mx.l_shipdate, '{_TS_FMT_DUCK}') AS max_shipdate,
       mx.l_orderkey AS max_orderkey
FROM mn JOIN mx ON mn.file_id = mx.file_id AND mn.rn = 1 AND mx.rn = 1
"""


# ---------------------------------------------------------------------------
# V2: per-file sortedness via lag over in-file order (lib.rs:624-659, A2)
# ---------------------------------------------------------------------------


def q_v2_file_sortedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunks(spark, sf_dir)
    w = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber", "l_shipdate")
    flagged = c.withColumn("prev_ship", F.lag("l_shipdate").over(w))
    return (
        flagged.groupBy("file_id")
        .agg(
            F.sum(
                F.when(F.col("prev_ship") > F.col("l_shipdate"), 1).otherwise(0)
            ).alias("descents")
        )
        .select("file_id", "descents", (F.col("descents") == 0).alias("is_ascending"))
    )


_V2_SQL = f"""
WITH c AS (
  SELECT l_orderkey % {N_CHUNKS} AS file_id, l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
),
flagged AS (
  SELECT file_id, l_shipdate,
         lag(l_shipdate) OVER (PARTITION BY file_id
                               ORDER BY l_orderkey, l_linenumber, l_shipdate) AS prev_ship
  FROM c
)
SELECT file_id,
       CAST(sum(CASE WHEN prev_ship > l_shipdate THEN 1 ELSE 0 END) AS BIGINT) AS descents,
       sum(CASE WHEN prev_ship > l_shipdate THEN 1 ELSE 0 END) = 0 AS is_ascending
FROM flagged GROUP BY file_id
"""


# ---------------------------------------------------------------------------
# V3: cross-file boundary violations + combined count (lib.rs:578-598; Quirk 2)
# ---------------------------------------------------------------------------


def q_v3_boundary_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunks(spark, sf_dir)
    w_asc = Window.partitionBy("file_id").orderBy(*[F.asc(k) for k in _KEY])
    w_desc = Window.partitionBy("file_id").orderBy(*[F.desc(k) for k in _KEY])
    w_scan = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber", "l_shipdate")
    per_file = (
        c.withColumn("rn_min", F.row_number().over(w_asc))
        .withColumn("rn_max", F.row_number().over(w_desc))
        .withColumn("prev_ship", F.lag("l_shipdate").over(w_scan))
        .groupBy("file_id")
        .agg(
            F.min_by(F.struct("l_shipdate", "l_orderkey"), "rn_min").alias("mn"),
            F.min_by(F.struct("l_shipdate", "l_orderkey"), "rn_max").alias("mx"),
            F.sum(
                F.when(F.col("prev_ship") > F.col("l_shipdate"), 1).otherwise(0)
            ).alias("descents"),
        )
    )
    w_files = Window.orderBy(F.col("mn.l_shipdate"), F.col("mn.l_orderkey"))
    flagged = per_file.withColumn("prev_mx", F.lag("mx").over(w_files)).withColumn(
        "cross_violation",
        F.when(
            (F.col("prev_mx.l_shipdate") > F.col("mn.l_shipdate"))
            | (
                (F.col("prev_mx.l_shipdate") == F.col("mn.l_shipdate"))
                & (F.col("prev_mx.l_orderkey") > F.col("mn.l_orderkey"))
            ),
            1,
        ).otherwise(0),
    )
    return flagged.agg(
        F.count("*").alias("checked_files"),
        F.sum(F.when(F.col("descents") > 0, 1).otherwise(0)).alias("files_not_ascending"),
        F.sum("cross_violation").alias("cross_file_violations"),
        (
            F.sum(F.when(F.col("descents") > 0, 1).otherwise(0)) + F.sum("cross_violation")
        ).alias("boundary_violations"),
    )


_V3_SQL = f"""
WITH c AS (
  SELECT l_orderkey % {N_CHUNKS} AS file_id, l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
),
ranked AS (
  SELECT file_id, l_shipdate, l_orderkey,
         row_number() OVER (PARTITION BY file_id
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_min,
         row_number() OVER (PARTITION BY file_id
                            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn_max,
         lag(l_shipdate) OVER (PARTITION BY file_id
                               ORDER BY l_orderkey, l_linenumber, l_shipdate) AS prev_ship
  FROM c
),
per_file AS (
  SELECT file_id,
         min_by(l_shipdate, rn_min) AS mn_ship,
         min_by(l_orderkey, rn_min) AS mn_ok,
         min_by(l_shipdate, rn_max) AS mx_ship,
         min_by(l_orderkey, rn_max) AS mx_ok,
         sum(CASE WHEN prev_ship > l_shipdate THEN 1 ELSE 0 END) AS descents
  FROM ranked GROUP BY file_id
),
flagged AS (
  SELECT descents,
         CASE WHEN lag(mx_ship) OVER w > mn_ship
                OR (lag(mx_ship) OVER w = mn_ship AND lag(mx_ok) OVER w > mn_ok)
              THEN 1 ELSE 0 END AS cross_violation
  FROM per_file
  WINDOW w AS (ORDER BY mn_ship, mn_ok)
)
SELECT count(*) AS checked_files,
       CAST(sum(CASE WHEN descents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS files_not_ascending,
       CAST(sum(cross_violation) AS BIGINT) AS cross_file_violations,
       CAST(sum(CASE WHEN descents > 0 THEN 1 ELSE 0 END) + sum(cross_violation)
         AS BIGINT) AS boundary_violations
FROM flagged
"""


# ---------------------------------------------------------------------------
# Q1: global multi-column sort with rank (O1/C5, lib.rs:801-809)
# ---------------------------------------------------------------------------


def q_q1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-phase scalable global rank — a plain row_number() OVER (ORDER BY)
    # would be an Exchange SinglePartition (operators/ranking.py docstring)
    from delta_sorter_spark.operators.ranking import global_rank

    li = load_table(spark, sf_dir, "lineitem").select(*_KEY)
    ranked = global_rank(li, _KEY, rank_col="rn")
    return ranked.select(
        "rn",
        F.date_format("l_shipdate", _TS_FMT_SPARK).alias("shipdate"),
        "l_orderkey",
        "l_linenumber",
    )


_Q1_SQL = f"""
SELECT row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
       strftime(l_shipdate, '{_TS_FMT_DUCK}') AS shipdate,
       l_orderkey, l_linenumber
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Q2: per-partition sort (O2/P2, lib.rs:795-809)
# ---------------------------------------------------------------------------


def q_q2_partition_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(*[F.asc(k) for k in _KEY])
    return li.select(
        "l_returnflag",
        F.row_number().over(w).alias("rn"),
        "l_orderkey",
        "l_linenumber",
    )


_Q2_SQL = """
SELECT l_returnflag,
       row_number() OVER (PARTITION BY l_returnflag
                          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
       l_orderkey, l_linenumber
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Q3: partition inventory (A5, lib.rs:258-296)
# ---------------------------------------------------------------------------


def q_q3_partition_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunks(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % N_CHUNKS).alias("file_id"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("bytes_proxy"),
    )
    return li.groupBy("file_id").agg(
        F.count("*").alias("num_rows"),
        F.sum("bytes_proxy").cast("double").alias("estimated_bytes"),
    )


_Q3_SQL = f"""
SELECT l_orderkey % {N_CHUNKS} AS file_id,
       count(*) AS num_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS estimated_bytes
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q4: typed partition-predicate rendering (P2, lib.rs:898-983)
# ---------------------------------------------------------------------------


def q_q4_predicate_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    # synthesize a NULL partition value so the IS NULL branch is exercised
    name = F.when(F.col("n_regionkey") == 0, F.lit(None)).otherwise(F.col("n_name"))
    with_null = n.select("n_nationkey", name.alias("pname"), "n_regionkey")
    pred = F.concat(
        F.when(F.col("pname").isNull(), F.lit('"n_name" IS NULL')).otherwise(
            F.concat(
                F.lit('"n_name" = \''),
                F.regexp_replace(F.col("pname"), "'", "''"),
                F.lit("'"),
            )
        ),
        F.lit(' AND "n_regionkey" = '),
        F.col("n_regionkey").cast("string"),
    )
    return with_null.select("n_nationkey", pred.alias("predicate"))


_Q4_SQL = """
WITH w AS (
  SELECT n_nationkey,
         CASE WHEN n_regionkey = 0 THEN NULL ELSE n_name END AS pname,
         n_regionkey
  FROM nation
)
SELECT n_nationkey,
       (CASE WHEN pname IS NULL THEN '"n_name" IS NULL'
             ELSE '"n_name" = ''' || replace(pname, '''', '''''') || ''''
        END
        || ' AND "n_regionkey" = ' || CAST(n_regionkey AS VARCHAR)) AS predicate
FROM w
"""


# ---------------------------------------------------------------------------
# E1: exact dedup, keep-first (SURVEY §2.8 E1)
# ---------------------------------------------------------------------------


def q_e1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    deduped = exact_dedup(orders, ["o_custkey", "o_orderstatus"], "o_orderkey")
    return deduped.select("o_custkey", "o_orderstatus", "o_orderkey", "o_totalprice")


_E1_SQL = """
SELECT o_custkey, o_orderstatus,
       min(o_orderkey) AS o_orderkey,
       min_by(o_totalprice, o_orderkey) AS o_totalprice
FROM orders GROUP BY o_custkey, o_orderstatus
"""


# ---------------------------------------------------------------------------
# E2: MinHash signatures + LSH band candidates (seeded, deterministic)
# ---------------------------------------------------------------------------


def _doc_subset(spark: SparkSession, sf_dir: str, mod: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") % mod == 0)


def q_e2_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(
        _doc_subset(spark, sf_dir, DOC_SUBSET_MOD), "doc_id", "text", k=MINHASH_K
    )


def _duckdb_shingle_cte(mod: int, shingle_n: int = 3) -> str:
    return f"""
d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % {mod} = 0),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(1, len(t) - {shingle_n - 1})),
             i -> substr(t, i, {shingle_n})))) AS s
  FROM d
),
h AS (SELECT doc_id, {duckdb_md5_long_sql('s')} % {MERSENNE_P} AS x FROM sh)
"""


def _minhash_agg_sql() -> str:
    params = minhash_params(MINHASH_K)
    terms = [
        f"min(({a} * x + {b}) % {MERSENNE_P}) AS minhash_{j}"
        for j, (a, b) in enumerate(params)
    ]
    return ", ".join(terms)


_E2_SQL = f"""
WITH {_duckdb_shingle_cte(DOC_SUBSET_MOD)}
SELECT doc_id, {_minhash_agg_sql()}
FROM h GROUP BY doc_id
"""


def q_e3_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(
        _doc_subset(spark, sf_dir, DOC_SUBSET_MOD),
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
    )


def _band_match_sql() -> str:
    rows_per_band = MINHASH_K // MINHASH_BANDS
    clauses = []
    for b in range(MINHASH_BANDS):
        eqs = [
            f"a.minhash_{b * rows_per_band + r} = b.minhash_{b * rows_per_band + r}"
            for r in range(rows_per_band)
        ]
        clauses.append("(" + " AND ".join(eqs) + ")")
    return " OR ".join(clauses)


_E3_SQL = f"""
WITH {_duckdb_shingle_cte(DOC_SUBSET_MOD)},
sig AS (SELECT doc_id, {_minhash_agg_sql()} FROM h GROUP BY doc_id)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE {_band_match_sql()}
"""


# ---------------------------------------------------------------------------
# E4: SimHash fingerprints
# ---------------------------------------------------------------------------


def q_e4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_doc_subset(spark, sf_dir, DOC_SUBSET_MOD), "doc_id", "text", bits=16)


_E4_SQL = f"""
WITH d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
           WHERE doc_id % {DOC_SUBSET_MOD} = 0),
toks AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS tok FROM d),
h AS (SELECT doc_id, {duckdb_md5_long_sql('tok')} % 65536 AS hv FROM toks),
pos AS (SELECT doc_id, hv, unnest(generate_series(0, 15)) AS bit FROM h),
signed AS (SELECT doc_id, bit, 2 * ((hv >> bit) & 1) - 1 AS s FROM pos),
bitsum AS (SELECT doc_id, bit, sum(s) AS ssum FROM signed GROUP BY doc_id, bit),
bitval AS (SELECT doc_id,
                  CASE WHEN ssum > 0 THEN (1::BIGINT << bit) ELSE 0 END AS bv
           FROM bitsum)
SELECT doc_id, CAST(sum(bv) AS BIGINT) AS simhash FROM bitval GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# E5: exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def q_e5_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = ngram_jaccard_pairs(
        _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD),
        "doc_id",
        "text",
        threshold=JACCARD_THRESHOLD,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_E5_SQL = f"""
WITH {_duckdb_shingle_cte(JACCARD_SUBSET_MOD)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT id_a, id_b,
         CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# E6: brute-force top-k cosine similarity (exact baseline)
# ---------------------------------------------------------------------------


def q_e6_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = brute_force_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=TOPK
    )
    return out.select("query_id", "id", "rank", F.round("cosine", 6).alias("cosine"))


_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_SSQ = (
    "list_aggregate(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " 'sum')"
)

_E6_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id % {QUERY_VEC_MOD} = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS id,
         {_DOT.format(a='q.qe', b='e.embedding')}
           / (sqrt({_SSQ.format(a='q.qe')}) * sqrt({_SSQ.format(a='e.embedding')}))
           AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", round(cosine, 6) AS cosine
FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E7: ANN via sign-LSH buckets + exact rerank (the scale path)
# ---------------------------------------------------------------------------


def q_e7_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = ann_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=TOPK,
        n_planes=N_PLANES,
    )
    return out.select("query_id", "id", "rank", F.round("cosine", 6).alias("cosine"))


def _duckdb_bucket_sql(emb: str) -> str:
    planes = hyperplanes(EMB_DIM, N_PLANES)
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(f"CAST({v} AS DOUBLE)" for v in plane)
        dot = (
            f"list_aggregate(list_transform(list_zip({emb}, [{lits}]),"
            f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_E7_SQL = f"""
WITH c AS (SELECT vec_id AS id, embedding,
                  {_duckdb_bucket_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qe,
             {_duckdb_bucket_sql('embedding')} AS bucket
      FROM embeddings WHERE vec_id % {QUERY_VEC_MOD} = 0),
scored AS (
  SELECT q.query_id, c.id,
         {_DOT.format(a='q.qe', b='c.embedding')}
           / (sqrt({_SSQ.format(a='q.qe')}) * sqrt({_SSQ.format(a='c.embedding')}))
           AS cosine
  FROM c JOIN q ON c.bucket = q.bucket
  WHERE c.id <> q.query_id
),
ranked AS (
  SELECT query_id, id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", round(cosine, 6) AS cosine
FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E8-E11: text analysis (token stats, quality, lang-id, fingerprint)
# ---------------------------------------------------------------------------


def q_e8_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_E8_SQL = """
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text),
             '\\b(the|a|an|and|or|of|to|in|is|are)\\b')) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len,
       round(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio
FROM s
"""


def q_e9_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_E9_SQL = """
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text),
             '\\b(the|a|an|and|or|of|to|in|is|are)\\b')) AS n_stop
  FROM documents
),
r AS (
  SELECT doc_id,
         round(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
         round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
         n_tokens
  FROM s
)
SELECT doc_id,
       round((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END)
             + least(stopword_ratio * 3.0, 0.3), 4) AS quality
FROM r
"""


def q_e10_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _lang_score_sql(words: list[str]) -> str:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


def _build_lang_sql() -> str:
    from delta_sorter_spark.operators.textstats import LANG_MARKERS, LANG_TIE_ORDER

    scores = {lang: _lang_score_sql(words) for lang, words in LANG_MARKERS.items()}
    score_cols = ", ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    branches = []
    for i, lang in enumerate(LANG_TIE_ORDER):
        later = LANG_TIE_ORDER[i + 1 :]
        if not later:
            branches.append(f"ELSE '{lang}'")
        else:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in later)
            branches.append(f"WHEN {cond} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " END"
    return f"""
WITH s AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id, {case} AS lang_guess FROM s
"""


_E10_SQL = _build_lang_sql()


def q_e11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_E11_SQL = """
SELECT doc_id,
       substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16)
         AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# S1/S2: streaming-shaped aggregations (batch form; streaming in tests)
# ---------------------------------------------------------------------------


def q_s1_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


_S1_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def q_s2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"), gap="30 minutes")


_S2_SQL = f"""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM m
)
SELECT user_id,
       strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}') AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


def q_s3_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (streaming/events.enrich_stream) in its
    batch form: events pick up customer attributes via a broadcast of the
    dim table, then aggregate per market segment.  Events with no matching
    customer survive as segment NULL (left join) — the oracle checks that
    no rows are silently dropped."""
    from delta_sorter_spark.streaming.events import enrich_stream

    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        enrich_stream(events, dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


_S3_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# M1: multimodal binary-column plumbing (metadata path; decode in tests)
# ---------------------------------------------------------------------------


def q_m1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


_M1_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


# ---------------------------------------------------------------------------
# A1-A3: TPC-H-style analytics (the §2.9 surface Spark gives for free —
# demonstrated here so the engine's agg/join/top-k path is oracle-verified)
# ---------------------------------------------------------------------------


def q_a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # timestamp_ntz literal: session-timezone-invariant comparison
    filtered = li.where(F.col("l_shipdate") <= F.lit(TPCH1_CUTOFF).cast("timestamp_ntz"))
    return (
        filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice") * (1 - dec("l_discount")) * (1 + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
    )


_A1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
         AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{TPCH1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def q_a2_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    rev = (
        joined.groupBy("o_orderkey")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
    return rev


_A2_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_a3_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


_A3_SQL = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_a4_topk_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


_A4_SQL = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# E12: z-order (Morton) values — multi-dimensional clustering key
# ---------------------------------------------------------------------------


def q_e12_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.zorder import interleave_sql

    li = load_table(spark, sf_dir, "lineitem")
    z = F.expr(interleave_sql(["(l_partkey % 256)", "(l_suppkey % 256)"], 8))
    return (
        li.select(
            (F.col("l_partkey") % 256).alias("a"),
            (F.col("l_suppkey") % 256).alias("b"),
            z.alias("zval"),
        )
        .distinct()
    )


def _zorder_sql() -> str:
    from delta_sorter_spark.operators.zorder import interleave_sql

    z = interleave_sql(["(l_partkey % 256)", "(l_suppkey % 256)"], 8)
    return f"""
SELECT DISTINCT l_partkey % 256 AS a, l_suppkey % 256 AS b, {z} AS zval
FROM lineitem
"""


_E12_SQL = _zorder_sql()


# ---------------------------------------------------------------------------
# E13: near-dup clusters — connected components over the Jaccard pair graph
# ---------------------------------------------------------------------------


def q_e13_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.graph import connected_components

    docs = _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    comps = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id"
    )
    return comps.select(F.col("id").alias("doc_id"), "component")


_E13_SQL = f"""
WITH RECURSIVE {_duckdb_shingle_cte(JACCARD_SUBSET_MOD)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}
),
bidir AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT r.src, e.b FROM reach r JOIN bidir e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component
FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# E14: embedding-cosine near-duplicate pairs (the embedding-space dedup)
# ---------------------------------------------------------------------------


def q_e14_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=NEARDUP_THRESHOLD)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


_E14_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_DOT.format(a='a.embedding', b='b.embedding')}
             / (sqrt({_SSQ.format(a='a.embedding')})
                * sqrt({_SSQ.format(a='b.embedding')})), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DOT.format(a='a.embedding', b='b.embedding')}
        / (sqrt({_SSQ.format(a='a.embedding')})
           * sqrt({_SSQ.format(a='b.embedding')})) >= {NEARDUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# E15: IVF approximate nearest neighbor (iterative k-means quantizer — not
# SQL-expressible; the driver records the weaker rows-only check)
# ---------------------------------------------------------------------------


# The e15 oracle replays the ENTIRE iterative k-means in SQL: hash-seeded
# centroids, two Lloyd iterations with integer-quantized exact means (BIGINT
# sums are associative, so Spark's parallel aggregation and DuckDB's serial
# one produce bit-identical centroids), then the probed search + cosine
# rerank.  This is only possible because operators/ivf.py was built
# determinism-first — no RNG, no order-dependent float sums.

_IVF_K = 16
_IVF_PROBES = 4
_IVF_QSCALE = 1 << 20


def _duck_sq_l2(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
    )


def _duck_ivf_iter(prev: str, idx: int) -> str:
    """One Lloyd iteration as CTE text: assign to ``prev`` then re-center."""
    return f"""
a{idx} AS (
  SELECT vec_id, v, centroid FROM (
    SELECT c.vec_id, c.v, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN {prev} s) WHERE rn = 1
),
m{idx} AS (
  SELECT centroid, pos,
         CAST(sum(CAST(floor(v[pos] * {_IVF_QSCALE}) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) * {_IVF_QSCALE} AS DOUBLE) AS m
  FROM a{idx} CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM})) AS pos)
  GROUP BY centroid, pos
),
c{idx} AS (
  SELECT s.centroid, coalesce(n.cvec, s.cvec) AS cvec
  FROM {prev} s LEFT JOIN (SELECT centroid, list(m ORDER BY pos) AS cvec
                           FROM m{idx} GROUP BY centroid) n USING (centroid)
)"""


def q_e15_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = ivf_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=TOPK,
        n_centroids=16,
        n_probes=4,
    )
    return out.select("query_id", "id", "rank", F.round("cosine", 6).alias("cosine"))


_IVF_ASSIGN_CTE = f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
seeds AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM corpus))
  WHERE rn <= {_IVF_K}
),{_duck_ivf_iter('seeds', 1)},{_duck_ivf_iter('c1', 2)},
ca AS (
  SELECT vec_id, v, centroid FROM (
    SELECT c.vec_id, c.v, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN c2 s) WHERE rn = 1
)"""

_E15_SQL = f"""{_IVF_ASSIGN_CTE},
qa AS (
  SELECT vec_id, v, centroid FROM (
    SELECT c.vec_id, c.v, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN c2 s
    WHERE c.vec_id % {QUERY_VEC_MOD} = 0) WHERE rn <= {_IVF_PROBES}
),
scored AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS id,
         {_DOT.format(a='qa.v', b='ca.v')}
           / (sqrt({_SSQ.format(a='qa.v')}) * sqrt({_SSQ.format(a='ca.v')})) AS cosine
  FROM ca JOIN qa ON ca.centroid = qa.centroid AND ca.vec_id <> qa.vec_id
),
ranked AS (
  SELECT query_id, id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", round(cosine, 6) AS cosine
FROM ranked WHERE rn <= {TOPK}
"""



# ---------------------------------------------------------------------------
# E33: SemDeDup — semantic dedup within k-means clusters (Abbas et al. 2023).
# Shares the e15 oracle's full k-means replay CTE; the dedup itself is a
# within-cluster self-join with keep-lowest-id semantics.
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.40


def q_e33_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb,
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        n_centroids=_IVF_K,
        n_iters=2,
        threshold=SEMDEDUP_THRESHOLD,
    )
    return out.select(
        F.col("id").alias("vec_id"),
        "centroid",
        "dup_of",
        F.round("cosine", 6).alias("cosine"),
    )


_E33_SQL = f"""{_IVF_ASSIGN_CTE},
pairs AS (
  SELECT a.centroid, a.vec_id AS id, b.vec_id AS bid,
         {_DOT.format(a='a.v', b='b.v')}
           / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})) AS cosine
  FROM ca a JOIN ca b ON a.centroid = b.centroid AND a.vec_id > b.vec_id
),
hits AS (
  SELECT centroid, id, bid, cosine,
         row_number() OVER (PARTITION BY id ORDER BY bid) AS rn
  FROM pairs WHERE cosine >= {SEMDEDUP_THRESHOLD}
)
SELECT id AS vec_id, centroid, bid AS dup_of, round(cosine, 6) AS cosine
FROM hits WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# E34: corpus-unigram frequency scoring — float-free "perplexity" proxy
# (floor(log2(count)) as integer bit length; ONE final double division)
# ---------------------------------------------------------------------------


def q_e34_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return unigram_surprisal(docs, "doc_id", "text")


_E34_SQL = """
WITH t AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents)
  WHERE tok <> ''
),
vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
d AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(CAST(length(bin(cnt)) - 1 AS BIGINT)) AS BIGINT) AS sum_freq_bits
  FROM t JOIN vocab USING (tok)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_freq_bits,
       round(CAST(sum_freq_bits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS avg_freq_bits
FROM d
"""

# ---------------------------------------------------------------------------
# E16: BPE-ish regex token counting (vs whitespace tokens in E8)
# ---------------------------------------------------------------------------


def q_e16_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_E16_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_BPE_RE}') AS toks FROM documents
),
c AS (
  SELECT doc_id, len(toks) AS n_bpe_tokens,
         len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]'))) AS n_word_tokens,
         len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))) AS n_number_tokens
  FROM t
)
SELECT doc_id, n_bpe_tokens, n_word_tokens, n_number_tokens,
       n_bpe_tokens - n_word_tokens - n_number_tokens AS n_symbol_tokens
FROM c
"""


# ---------------------------------------------------------------------------
# M2: multimodal decode via Arrow-batched mapInPandas (md5-stub decode is
# deterministic, so even the Python-UDF path is oracle-verified)
# ---------------------------------------------------------------------------


def q_m2_decoded_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.multimodal import decode_assets

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return decode_assets(docs, "doc_id", "payload", "media_type")


_HEXBYTE = (
    "((strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(hx, {p1}, 1)) - 1))"
)

_M2_SQL = f"""
WITH h AS (SELECT doc_id, md5(text) AS hx, strlen(text) AS nb FROM documents)
SELECT doc_id AS id,
       'text/plain' AS media_type,
       CAST(nb AS BIGINT) AS n_bytes,
       CAST(16 + {_HEXBYTE.format(p=1, p1=2)} % 64 AS INT) AS width,
       CAST(16 + {_HEXBYTE.format(p=3, p1=4)} % 64 AS INT) AS height
FROM h
"""


def q_m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.frame_sample_plan):
    deterministic fake frame count from payload length, every-10th-frame
    index exploded 1->many — the real decoder slots into the same shape."""
    from delta_sorter_spark.operators.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = frame_sample_plan(docs, "doc_id", "payload", every_n=10)
    return out.select("id", F.col("frame_idx").cast("long").alias("frame_idx"))


_M3_SQL = """
WITH h AS (SELECT doc_id AS id, strlen(text) % 100 + 1 AS n_frames FROM documents)
SELECT id, unnest(range(0, CAST(n_frames AS BIGINT), 10)) AS frame_idx FROM h
"""


# ---------------------------------------------------------------------------
# A5: hierarchical aggregation via ROLLUP (grouping-sets surface)
# ---------------------------------------------------------------------------


def q_a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec).cast("double").alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


_A5_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# A6: as-of join — each event picks the most recent order of the same key
# (operators/joins.py union-and-carry-forward shape; DuckDB ASOF JOIN oracle)
# ---------------------------------------------------------------------------


def q_a6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    joined = asof_join(ev, orders, on="user_id", left_ts="ts", right_ts="o_orderdate")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        "o_orderkey",
        F.date_format("o_orderdate", _TS_FMT_SPARK).alias("o_orderdate"),
        "o_totalprice",
    )


_A6_SQL = f"""
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '{_TS_FMT_DUCK}') AS ts,
       o.o_orderkey,
       strftime(o.o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
       o.o_totalprice
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


# ---------------------------------------------------------------------------
# A7: set operations (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------


def q_a7_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    finished = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    both = building.intersect(finished).withColumn("tag", F.lit("both"))
    only_b = building.subtract(finished).withColumn("tag", F.lit("building_only"))
    return both.unionByName(only_b).select("tag", "custkey")


_A7_SQL = """
WITH b AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM b INTERSECT SELECT custkey FROM f)
UNION ALL
SELECT 'building_only' AS tag, custkey
FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM f)
"""


# ---------------------------------------------------------------------------
# A8: bucketized time-range join (same-key events within (+1s, +600s])
# ---------------------------------------------------------------------------


def q_a8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    left = ev.select(F.col("event_id").alias("left_id"), "user_id", F.col("ts").alias("lts"))
    right = ev.select(F.col("event_id").alias("right_id"), "user_id", F.col("ts").alias("rts"))
    out = range_join(
        left,
        right,
        "user_id",
        "lts",
        "rts",
        lower_s=RANGE_LOWER_S,
        upper_s=RANGE_UPPER_S,
        bucket_s=RANGE_UPPER_S,
    )
    return out.select("user_id", "left_id", "right_id")


_A8_SQL = f"""
SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE CAST(floor(epoch(r.ts)) AS BIGINT) - CAST(floor(epoch(l.ts)) AS BIGINT)
      BETWEEN {RANGE_LOWER_S} AND {RANGE_UPPER_S}
"""


# ---------------------------------------------------------------------------
# A10: plain spark.sql surface over registered views (the SQL entry point the
# reference delegates to DataFusion; ours is Catalyst via sources/formats.py)
# ---------------------------------------------------------------------------


def q_a10_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.sources.formats import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               count(DISTINCT c.c_custkey) AS n_customers,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_order_value
        FROM nation n
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name
        HAVING count(*) > 10
        """
    )


_A10_SQL = """
SELECT n.n_name,
       count(DISTINCT c.c_custkey) AS n_customers,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_order_value
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY n.n_name
HAVING count(*) > 10
"""


# ---------------------------------------------------------------------------
# E17/E18: Count-Min sketch build + point estimates (mergeable frequency
# sketch — the streaming/100TB substitute for exact per-key counts)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64


def q_e17_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import count_min_sketch

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    return count_min_sketch(ev, "uid", depth=CMS_DEPTH, width=CMS_WIDTH)


def q_e18_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import cms_estimate, count_min_sketch

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    sketch = count_min_sketch(ev, "uid", depth=CMS_DEPTH, width=CMS_WIDTH)
    return cms_estimate(ev, "uid", sketch, depth=CMS_DEPTH, width=CMS_WIDTH)


def _cms_cells_sql(value_sql: str, src: str) -> str:
    from delta_sorter_spark.functions.hashing import minhash_params, minhash_perm_sql

    params = minhash_params(CMS_DEPTH)
    hx = duckdb_md5_long_sql(value_sql)
    arms = [
        f"SELECT {j} AS depth, ({minhash_perm_sql(hx, a, b)} % {CMS_WIDTH}) AS bucket"
        f" FROM {src}"
        for j, (a, b) in enumerate(params)
    ]
    return " UNION ALL ".join(arms)


_E17_SQL = f"""
WITH v AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events),
cells AS ({_cms_cells_sql('uid', 'v')})
SELECT depth, bucket, count(*) AS cnt FROM cells GROUP BY depth, bucket
"""


def _cms_probe_sql() -> str:
    from delta_sorter_spark.functions.hashing import minhash_params, minhash_perm_sql

    params = minhash_params(CMS_DEPTH)
    hx = duckdb_md5_long_sql("value")
    arms = [
        f"SELECT value, {j} AS depth,"
        f" ({minhash_perm_sql(hx, a, b)} % {CMS_WIDTH}) AS bucket FROM dv"
        for j, (a, b) in enumerate(params)
    ]
    return " UNION ALL ".join(arms)


_E18_SQL = f"""
WITH v AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events),
cells AS ({_cms_cells_sql('uid', 'v')}),
sketch AS (SELECT depth, bucket, count(*) AS cnt FROM cells GROUP BY depth, bucket),
dv AS (SELECT DISTINCT uid AS value FROM v),
probes AS ({_cms_probe_sql()})
SELECT p.value, min(s.cnt) AS est_cnt
FROM probes p JOIN sketch s ON p.depth = s.depth AND p.bucket = s.bucket
GROUP BY p.value
"""


# ---------------------------------------------------------------------------
# E23/E24: HyperLogLog registers + estimate (mergeable approximate distinct —
# the 100 TB substitute for exact COUNT(DISTINCT); operators/sketches.py).
# The estimator's harmonic sum is an exact integer and the single final
# double division is IEEE-rounded, so the estimate is bit-identical to the
# DuckDB oracle.
# ---------------------------------------------------------------------------


def q_e23_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    return hll_registers(ev, "uid")


def _hll_regs_sql() -> str:
    from delta_sorter_spark.operators.sketches import HLL_M, _HLL_MAX_RANK

    hv = duckdb_md5_long_sql("uid")
    return f"""
v AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events),
h AS (SELECT {hv} AS hv FROM v),
r AS (SELECT CAST(hv % {HLL_M} AS BIGINT) AS bucket,
             CAST(CASE WHEN hv // {HLL_M} = 0 THEN {_HLL_MAX_RANK}
                  ELSE {_HLL_MAX_RANK} - length(bin(hv // {HLL_M})) END AS BIGINT)
               AS rank
      FROM h),
regs AS (SELECT bucket, max(rank) AS register FROM r GROUP BY bucket)"""


def _make_e23_sql() -> str:
    return f"WITH {_hll_regs_sql()}\nSELECT bucket, register FROM regs"


def q_e25_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import bloom_bits

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return bloom_bits(
        cust.select(F.col("c_custkey").cast("string").alias("ck")), "ck"
    )


def q_e26_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter shape: bloom over BUILDING customers' keys prunes the
    orders probe side before any join; n_bloom >= n_exact per priority, the
    surplus being the (deterministic) false positives."""
    from delta_sorter_spark.operators.sketches import bloom_bits, bloom_prefilter

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_custkey").cast("string").alias("ck")
    )
    bits = bloom_bits(cust.select(F.col("c_custkey").cast("string").alias("ck")), "ck")
    passed = bloom_prefilter(orders, "ck", bits)
    n_bloom = passed.groupBy("o_orderpriority").agg(F.count("*").alias("n_bloom"))
    n_exact = (
        orders.join(
            F.broadcast(cust.select(F.col("c_custkey").cast("string").alias("ck"))),
            "ck",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_exact"))
    )
    return n_bloom.join(n_exact, "o_orderpriority")


def _make_e25_e26_sql() -> tuple[str, str]:
    from delta_sorter_spark.functions.hashing import minhash_params, minhash_perm_sql
    from delta_sorter_spark.operators.sketches import BLOOM_K, BLOOM_M_BITS

    params = minhash_params(BLOOM_K)
    hx = duckdb_md5_long_sql("ck")
    arm_exprs = [
        f"({minhash_perm_sql(hx, a, b)} % {BLOOM_M_BITS})" for a, b in params
    ]
    arms = " UNION ALL ".join(
        f"SELECT CAST({e} AS BIGINT) AS bit FROM ck" for e in arm_exprs
    )
    bits_cte = f"""
ck AS (SELECT CAST(c_custkey AS VARCHAR) AS ck FROM customer
       WHERE c_mktsegment = 'BUILDING'),
bits AS (SELECT DISTINCT bit FROM ({arms}))"""
    e25 = f"WITH {bits_cte}\nSELECT bit FROM bits"
    probe_conds = " AND ".join(
        f"CAST({minhash_perm_sql(duckdb_md5_long_sql('o.ck'), a, b)} % {BLOOM_M_BITS} AS BIGINT)"
        " IN (SELECT bit FROM bits)"
        for a, b in params
    )
    e26 = f"""
WITH {bits_cte},
probe AS (SELECT o_orderpriority, CAST(o_custkey AS VARCHAR) AS ck FROM orders),
pass AS (SELECT o_orderpriority FROM probe o WHERE {probe_conds}),
nb AS (SELECT o_orderpriority, count(*) AS n_bloom FROM pass GROUP BY o_orderpriority),
ne AS (SELECT o_orderpriority, count(*) AS n_exact FROM probe o
       WHERE o.ck IN (SELECT ck FROM ck) GROUP BY o_orderpriority)
SELECT nb.o_orderpriority, nb.n_bloom, ne.n_exact
FROM nb JOIN ne ON nb.o_orderpriority = ne.o_orderpriority
"""
    return e25, e26


_E25_SQL, _E26_SQL = _make_e25_e26_sql()


def q_e24_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    est = hll_estimate(hll_registers(ev, "uid"))
    exact = ev.agg(F.countDistinct("uid").alias("exact_distinct"))
    return est.crossJoin(exact)  # 1x1 rows


def _make_e24_sql() -> str:
    from delta_sorter_spark.operators.sketches import HLL_ALPHA_NUM, HLL_M, _HLL_MAX_RANK

    return f"""
WITH {_hll_regs_sql()},
s AS (SELECT count(*) AS n_obs,
             sum(CAST(power(2, {_HLL_MAX_RANK} - register) AS BIGINT)) AS s_obs
      FROM regs)
SELECT {HLL_ALPHA_NUM!r} / (s_obs + ({HLL_M} - n_obs) * {1 << _HLL_MAX_RANK})
         AS est_distinct,
       (SELECT count(DISTINCT uid) FROM v) AS exact_distinct
FROM s
"""


# ---------------------------------------------------------------------------
# E19: salted two-stage distinct count (skew mitigation; equals the exact
# count distinct, which is exactly what the oracle verifies)
# ---------------------------------------------------------------------------


def q_e19_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.skew import salted_agg_count_distinct

    ev = load_table(spark, sf_dir, "events")
    return salted_agg_count_distinct(ev, "event_type", "user_id", salt_factor=8).select(
        F.col("event_type"), F.col("n_distinct")
    )


_E19_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A11: running total per user (window frame: ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------


def q_a11_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


_A11_SQL = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# A18: time-RANGE window frame — trailing 1-hour per-user aggregates.  Unlike
# a11's ROWS frame, a RANGE frame bounds state by event-time distance, the
# frame shape that stays O(window) memory per key at 100 TB regardless of
# event density; exact-DECIMAL sum keeps the oracle bitwise.
# ---------------------------------------------------------------------------

TRAIL_SECONDS = 3599  # [t-3599, t] = one hour inclusive


def q_a18_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-TRAIL_SECONDS, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("value_trailing_1h"),
    )


_A18_SQL = f"""
SELECT user_id, event_id,
       count(*) OVER w AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         AS value_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN {TRAIL_SECONDS} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# A12: exact quantiles per group (percentile == DuckDB quantile_cont,
# verified bitwise-identical: both linearly interpolate over sorted doubles)
# ---------------------------------------------------------------------------


def q_a12_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        F.max("o_totalprice").alias("mx"),
    )


_A12_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS median,
       quantile_cont(o_totalprice, 0.75) AS p75,
       max(o_totalprice) AS mx
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A13: pivot (long -> wide reshaping with an explicit, deterministic
# column list)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


def q_a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


_A13_SQL = f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# A14-A16: subquery surface — scalar subquery + anti join (TPC-H Q22 shape),
# correlated aggregate subquery (Q17 shape), EXISTS semi join (Q4 shape).
# The reference has no joins at all (SURVEY §2.9); these prove the decorrelated
# Spark forms match the literal subquery SQL the oracle runs.
# Division-free thresholds (bal*n > sum, qty*5*cnt < sum) keep every
# comparison in exact DECIMAL arithmetic on both engines.
# ---------------------------------------------------------------------------

INACTIVE_CUTOFF = "2000-07-01 00:00:00"
LATE_SHIP_DAYS = 60


def q_a14_inactive_vip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above the average positive balance (scalar
    subquery → broadcast one-row aggregate) with no recent orders (NOT EXISTS
    → left_anti join).  At scale both sides of the anti join shuffle on
    o_custkey/c_custkey; the one-row threshold is always a broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(bal).cast("decimal(28,2)").alias("bal_sum"),
            F.count("*").alias("bal_n"),
        )
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(INACTIVE_CUTOFF).cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(thresh))
        .where(bal * F.col("bal_n") > F.col("bal_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(bal).cast("double").alias("total_bal"),
        )
    )


_A14_SQL = f"""
WITH t AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS bal_sum,
         count(*) AS bal_n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, t
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * t.bal_n > t.bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF}')
GROUP BY c_mktsegment
"""


def q_a15_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lineitems whose quantity is below 20% of their part's
    average, decorrelated as a per-part aggregate joined back.  No broadcast
    hint: the aggregated side is ~|part| rows, so AQE broadcasts it at test
    scale but can fall back to a shuffle join when the dimension outgrows the
    threshold at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("qty_sum"),
        F.count("*").cast("decimal(10,0)").alias("qty_n"),
    )
    return (
        li.join(per_part, "l_partkey")
        .where(qty * F.lit(5) * F.col("qty_n") < F.col("qty_sum"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


_A15_SQL = """
WITH pa AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
         CAST(count(*) AS DECIMAL(10,0)) AS qty_n
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_returnflag,
       count(*) AS n_small,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pa.qty_n < pa.qty_sum
GROUP BY l.l_returnflag
"""


def q_a16_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders with EXISTS a lineitem shipped more than
    LATE_SHIP_DAYS after the order date, as a left_semi join (equi key +
    residual non-equi condition), counted per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


_A16_SQL = f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A17: TPC-H Q5 shape — six-way join with the same-nation (customer nation =
# supplier nation) constraint.  Exercises the supplier table, multi-way join
# ordering, and the mixed broadcast/shuffle strategy: region/nation/supplier
# are true small dims (broadcast hints); customer and orders joins are left
# unhinted so Catalyst/AQE picks shuffle strategies that survive 100 TB.
# ---------------------------------------------------------------------------


def q_a17_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


_A17_SQL = """
SELECT r.r_name, n.n_name,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
GROUP BY r.r_name, n.n_name
"""


# ---------------------------------------------------------------------------
# E22: winnowing rolling-hash fingerprints (partial-overlap dedup)
# ---------------------------------------------------------------------------

WINNOW_K = 5
WINNOW_WINDOW = 4


def q_e22_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import winnowing_fingerprints

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    return winnowing_fingerprints(
        docs, "doc_id", "text", k=WINNOW_K, window=WINNOW_WINDOW
    )


_E22_SQL = f"""
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
           WHERE doc_id % {DOC_SUBSET_MOD} = 0),
g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(1, len(t) - {WINNOW_K - 1}))) AS pos,
         t
  FROM d
),
h AS (
  SELECT doc_id, pos,
         {duckdb_md5_long_sql(f'substr(t, pos, {WINNOW_K})')} % {MERSENNE_P} AS hv
  FROM g
),
r AS (
  SELECT doc_id, pos,
         min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {WINNOW_WINDOW - 1} PRECEDING AND CURRENT ROW)
           AS mn
  FROM h
)
SELECT DISTINCT doc_id, mn AS fp
FROM r WHERE pos >= {WINNOW_WINDOW}
"""


# ---------------------------------------------------------------------------
# E20/E21: deterministic train/val/test split + token-budget sequence packing
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 1000
SPLIT_SEED = "split-v1"
PACK_BUDGET = 2048


def q_e20_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", buckets=SPLIT_BUCKETS, seed=SPLIT_SEED
    ).select("doc_id", "split")


_E20_SQL = f"""
WITH b AS (
  SELECT doc_id,
         {duckdb_md5_long_sql(f"CAST(doc_id AS VARCHAR) || '{SPLIT_SEED}'")}
           % {SPLIT_BUCKETS} AS bkt
  FROM documents
)
SELECT doc_id,
       CASE WHEN bkt < {int(0.8 * SPLIT_BUCKETS)} THEN 'train'
            WHEN bkt < {int(0.9 * SPLIT_BUCKETS)} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


TOP_TERMS_K = 3


def q_e28_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k terms per source (operators/textstats.py:top_terms): the
    explode -> partial-count -> per-group top-k window shape; the shuffle
    carries distinct (source, term) counts, never raw tokens."""
    from delta_sorter_spark.operators.textstats import top_terms

    docs = load_table(spark, sf_dir, "documents")
    return top_terms(docs, "source", "text", k=TOP_TERMS_K)


_E28_SQL = f"""
WITH t AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
c AS (SELECT source, term, count(*) AS n FROM t WHERE term <> ''
      GROUP BY source, term),
r AS (SELECT source, term, n,
             row_number() OVER (PARTITION BY source ORDER BY n DESC, term ASC)
               AS rank
      FROM c)
SELECT source, term, n, rank FROM r WHERE rank <= {TOP_TERMS_K}
"""


SAMPLE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.5}
SAMPLE_DEFAULT = 0.2
SAMPLE_SEED = "sample-v1"


def q_e27_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sample: per-source keep rates, deterministic md5 gate
    (operators/sampling.py:stratified_sample) — no shuffle, scan-time
    filter."""
    from delta_sorter_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "source", SAMPLE_RATES, default_rate=SAMPLE_DEFAULT,
        seed=SAMPLE_SEED,
    ).select("doc_id", "source")


def _make_e27_sql() -> str:
    arms = " ".join(
        f"WHEN source = '{v}' THEN {int(round(r * 1000))}"
        for v, r in SAMPLE_RATES.items()
    )
    bucket = duckdb_md5_long_sql(f"CAST(doc_id AS VARCHAR) || '{SAMPLE_SEED}'")
    return f"""
SELECT doc_id, source FROM documents
WHERE {bucket} % 1000 <
      CASE {arms} ELSE {int(round(SAMPLE_DEFAULT * 1000))} END
"""


def q_e21_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import pack_sequences
    from delta_sorter_spark.operators.textstats import n_tokens_expr

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", n_tokens_expr("text").alias("n_tokens")
    )
    packed = pack_sequences(
        docs, "doc_id", "n_tokens", budget=PACK_BUDGET, shard_col="source"
    )
    return packed.select("doc_id", "source", "n_tokens", "bin_id", "bin_offset")


_E21_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, source, n_tokens,
         coalesce(sum(least(n_tokens, {PACK_BUDGET}))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS before
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(before // {PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(before % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM b
"""


# ---------------------------------------------------------------------------
# P1: composite training-data pipeline — single-pass document profile ->
# fingerprint dedup (keep lowest doc_id) -> quality filter
# ---------------------------------------------------------------------------

QUALITY_CUT = 0.5


def q_p1_quality_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import document_profile

    docs = load_table(spark, sf_dir, "documents")
    prof = document_profile(docs, "doc_id", "text")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        prof.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("quality") >= QUALITY_CUT))
        .select("doc_id", "fingerprint", "quality", "lang_guess")
    )


def _build_p1_sql() -> str:
    from delta_sorter_spark.operators.textstats import LANG_MARKERS, LANG_TIE_ORDER

    score_cols = ", ".join(
        f"{_lang_score_sql(words)} AS s_{lang}" for lang, words in LANG_MARKERS.items()
    )
    branches = []
    for i, lang in enumerate(LANG_TIE_ORDER):
        later = LANG_TIE_ORDER[i + 1 :]
        if not later:
            branches.append(f"ELSE '{lang}'")
        else:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in later)
            branches.append(f"WHEN {cond} THEN '{lang}'")
    lang_case = "CASE " + " ".join(branches) + " END"
    return f"""
WITH s AS (
  SELECT doc_id,
         substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16)
           AS fingerprint,
         length(text) AS n_chars,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text),
             '\\b(the|a|an|and|or|of|to|in|is|are)\\b')) AS n_stop,
         {score_cols}
  FROM documents
),
r AS (
  SELECT doc_id, fingerprint,
         round(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
         round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
         n_tokens,
         {lang_case} AS lang_guess
  FROM s
),
q AS (
  SELECT doc_id, fingerprint, lang_guess,
         round((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END)
               + least(stopword_ratio * 3.0, 0.3), 4) AS quality,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM r
)
SELECT doc_id, fingerprint, quality, lang_guess
FROM q WHERE rn = 1 AND quality >= {QUALITY_CUT}
"""


_P1_SQL = _build_p1_sql()


# ---------------------------------------------------------------------------
# A9: promo revenue share per ship month (TPC-H Q14 shape: mid-size broadcast
# join + conditional aggregation)
# ---------------------------------------------------------------------------


def q_a9_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return (
        joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0)))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.round(F.col("promo_revenue") / F.col("total_revenue"), 6),
        )
    )


_A9_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
       round(CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A19: TPC-H Q7 shape — volume shipping between two nations.  Supplier nation
# and customer nation each arrive through their own broadcast of the 25-row
# nation dim; the fact-side joins (lineitem-orders, orders-customer) stay
# shuffle joins that scale.  Year comes from the ship date so the group key
# is (supp_nation, cust_nation, year).
# ---------------------------------------------------------------------------

SHIP_NATION_A = "NATION_1"
SHIP_NATION_B = "NATION_2"


def q_a19_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == SHIP_NATION_A)
        & (F.col("cust_nation") == SHIP_NATION_B)
    ) | (
        (F.col("supp_nation") == SHIP_NATION_B)
        & (F.col("cust_nation") == SHIP_NATION_A)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


_A19_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{SHIP_NATION_A}' AND n2.n_name = '{SHIP_NATION_B}')
   OR (n1.n_name = '{SHIP_NATION_B}' AND n2.n_name = '{SHIP_NATION_A}')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# A20: TPC-H Q8 shape — national market share.  For PROMO-type parts sold to
# customers in one region: the share of yearly revenue supplied by one
# nation.  Both aggregate legs stay exact DECIMAL; the share is ONE final
# double division (numerator/denominator cast to double first), which is the
# repo's cross-engine determinism rule for ratios.
# ---------------------------------------------------------------------------

MKT_REGION = "ASIA"
MKT_NATION = "NATION_3"
MKT_PART_TYPE = "PROMO"


def q_a20_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    # customer side resolves to a region (filter); supplier side to a nation
    # name (attribution).  part filter is pushed to the scan via broadcast.
    cn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("cn_key"), "n_regionkey")
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    r = F.broadcast(region.where(F.col("r_name") == MKT_REGION))
    p = F.broadcast(part.where(F.col("p_type") == MKT_PART_TYPE).select("p_partkey"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(F.lit(0)))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .withColumn(
            "mkt_share", F.round(F.col("nation_volume") / F.col("total_volume"), 6)
        )
    )


_A20_SQL = f"""
SELECT year(o.o_orderdate) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = '{MKT_NATION}'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE) AS nation_volume,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_volume,
       round(CAST(sum(CASE WHEN sn.n_name = '{MKT_NATION}'
                           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{MKT_PART_TYPE}'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = '{MKT_REGION}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A21: TPC-H Q9 shape — product-type profit by supplier nation and year.
# The testdata has no partsupp table, so cost is p_retailprice * quantity
# (same join/agg shape, different cost column).  All arithmetic stays in
# DECIMAL until the final double cast.
# ---------------------------------------------------------------------------

PROFIT_PART_SUBSTR = "gear"


def q_a21_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    profit = dec("l_extendedprice") * (1 - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    p = F.broadcast(
        part.where(F.col("p_name").contains(PROFIT_PART_SUBSTR)).select(
            "p_partkey", "p_retailprice"
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(profit).cast("double").alias("profit"),
        )
    )


_A21_SQL = f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%{PROFIT_PART_SUBSTR}%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A22: CUBE grouping sets — all 4 grouping combinations of (returnflag,
# linestatus) in one pass (map-side partials expand to the grouping sets;
# one shuffle).  GROUPING() flags disambiguate real NULL keys from subtotal
# rows, cast to INT on both engines.
# ---------------------------------------------------------------------------


def q_a22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n_items", "sum_qty")
    )


_A22_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# A36: explicit GROUPING SETS (asymmetric set list — not expressible as CUBE
# or ROLLUP): per (flag, status), per ship-year, and grand total in ONE pass
# (Spark expands the sets once, aggregates map-side; no multi-scan union).
# ---------------------------------------------------------------------------


def q_a36_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["ship_year"], []],
            "l_returnflag",
            "l_linestatus",
            "ship_year",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.grouping("ship_year").cast("int").alias("g_yr"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "l_returnflag", "l_linestatus", "ship_year",
            "g_rf", "g_ls", "g_yr", "n_items", "sum_price",
        )
    )


_A36_SQL = """
SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       CAST(GROUPING(year(l_shipdate)) AS INT) AS g_yr,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (year(l_shipdate)), ())
"""

# ---------------------------------------------------------------------------
# E29: int8-quantized top-k retrieval (operators/similarity.quantized_topk).
# The compression-for-scale variant of e6: vectors quantize to ints at scan
# time, scoring is an exact integer multiply-add (associative — no float
# summation-order hazards), ranking is fully deterministic.
# ---------------------------------------------------------------------------

QUANT_SCALE = 127


def q_e29_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.similarity import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    return quantized_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=TOPK, scale=QUANT_SCALE,
    )


_E29_SQL = f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS INT)) AS q
  FROM embeddings
),
qs AS (SELECT vec_id AS query_id, q AS qq FROM qz
       WHERE vec_id % {QUERY_VEC_MOD} = 0),
scored AS (
  SELECT qs.query_id, c.vec_id AS id,
         CAST(list_aggregate(list_transform(list_zip(qs.qq, c.q),
           p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)), 'sum')
           AS BIGINT) AS qdot
  FROM qz c CROSS JOIN qs
  WHERE c.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, id, qdot,
         row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", qdot
FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E30: benchmark decontamination — word n-gram collisions between corpus and
# a held-out eval subset (operators/dedup.decontaminate).  The eval n-gram
# set broadcasts; corpus text never shuffles.
# ---------------------------------------------------------------------------

DECON_N = 4
DECON_MOD = 97  # doc_id % 97 == 0 plays the role of the benchmark set


def q_e30_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % DECON_MOD == 0)
    corpus = docs.where(F.col("doc_id") % DECON_MOD != 0)
    return decontaminate(corpus, bench, "doc_id", "text", n=DECON_N)


_E30_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(1, len(ws) - {DECON_N - 1})),
           i -> array_to_string(ws[i:i + {DECON_N - 1}], ' '))) AS grams
  FROM w
),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} = 0),
cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} <> 0)
SELECT cg.doc_id AS doc_id, count(*) AS n_hits
FROM cg JOIN bg USING (gram)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# E31: intra-document repetition ratio (operators/textstats.repetition_stats)
# — duplicate word n-gram fraction, the Gopher-style boilerplate filter.
# ---------------------------------------------------------------------------

REP_N = 3


def q_e31_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text", n=REP_N)


_E31_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(1, len(ws) - {REP_N - 1})),
           i -> array_to_string(ws[i:i + {REP_N - 1}], ' ')) AS grams
  FROM w
)
SELECT doc_id,
       len(grams) AS total_ngrams,
       len(list_distinct(grams)) AS distinct_ngrams,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                   / CAST(len(grams) AS DOUBLE), 6) AS rep_ratio
FROM g
"""


# ---------------------------------------------------------------------------
# A23: customer revenue deciles over a deterministic total order (exact
# DECIMAL revenue desc, custkey tiebreak).  The total order comes from
# ranking.global_rank (two-phase range-partitioned rank — NO
# Exchange SinglePartition anywhere in the plan); the decile is then pure
# arithmetic on the rank: decile = (rank-1)*10 DIV n + 1, which splits rank
# space into 10 equal-width bands (the two-phase-friendly decile definition;
# band widths differ from SQL ntile's first-buckets-get-the-remainder
# allocation only when n % 10 != 0, and the oracle replays this formula).
# ---------------------------------------------------------------------------


def q_a23_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.ranking import global_rank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("revenue")
        )
    )
    ranked = global_rank(
        rev, ["revenue", "o_custkey"], rank_col="rn", directions=[False, True]
    )
    # n_customers is a one-row aggregate over the pinned rank input —
    # broadcast back, never a global window
    total = ranked.groupBy().agg(F.count("*").alias("__n__"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("decile", F.expr("CAST((rn - 1) * 10 DIV __n__ AS INT) + 1"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("revenue").cast("double").alias("total_revenue"),
        )
    )


_A23_SQL = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, revenue,
         row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rn,
         count(*) OVER () AS n
  FROM rev
)
SELECT CAST((rn - 1) * 10 // n AS INT) + 1 AS decile,
       count(*) AS n_customers,
       CAST(sum(revenue) AS DOUBLE) AS total_revenue
FROM ranked
GROUP BY decile
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# S4: hopping (sliding) windows — each event in 2 overlapping 1h windows
# ---------------------------------------------------------------------------


def q_s4_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.streaming.events import sliding_window_counts

    return sliding_window_counts(load_table(spark, sf_dir, "events"))


# window starts aligned to the 1970 epoch in both engines; every event falls
# in exactly two 30-min-aligned 1-hour windows: g and g-1800 seconds
_S4_SQL = f"""
WITH ex AS (
  SELECT event_type, value,
         unnest([g0, g0 - 1800]) AS wstart
  FROM (SELECT event_type, value,
               (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS g0
        FROM events)
)
SELECT strftime(make_timestamp(wstart * 1000000), '{_TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM ex GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# S5: streaming change feed — a REAL Structured Streaming drain of the
# Delta source's readChangeFeed mode, hash-checked.  Single-file scratch
# table makes the file-level feed fully deterministic: the initial
# snapshot feeds as inserts at the data-commit version (1), a
# copy-on-write DELETE feeds the whole file as deletes + the survivors as
# re-inserts (2), an append feeds as inserts (3) — the oracle states all
# four row groups relationally.
# ---------------------------------------------------------------------------


def q_s5_change_feed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    mod = F.col("o_orderkey") % CDF_MOD
    scratch = tempfile.mkdtemp(prefix="s5_cdf_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(mod < 8).coalesce(1),
        )
        out = os.path.join(scratch, "out")
        ck = os.path.join(scratch, "ck")

        def drain():
            q = (
                tbl.stream_df(change_feed=True)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        drain()  # initial snapshot
        delete_where(tbl, f"o_orderkey % {CDF_MOD} = 3")
        tbl.append(orders.where(mod == 8).coalesce(1))
        drain()  # change-feed tail
        res = spark.read.parquet(out).select(
            "o_orderkey", "o_orderstatus", "_change_type", "_commit_version"
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_S5_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % {CDF_MOD} < 8
)
SELECT o_orderkey, o_orderstatus, 'insert' AS _change_type,
       CAST(1 AS BIGINT) AS _commit_version FROM base
UNION ALL
SELECT o_orderkey, o_orderstatus, 'delete', CAST(2 AS BIGINT) FROM base
UNION ALL
SELECT o_orderkey, o_orderstatus, 'insert', CAST(2 AS BIGINT) FROM base
WHERE o_orderkey % {CDF_MOD} <> 3
UNION ALL
SELECT o_orderkey, o_orderstatus, 'insert', CAST(3 AS BIGINT)
FROM orders WHERE o_orderkey % {CDF_MOD} = 8
"""


# ---------------------------------------------------------------------------
# E32: chunk-level (paragraph-style) cross-document dedup profile
# ---------------------------------------------------------------------------

CHUNK_WORDS = 10


def q_e32_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import chunk_dedup_stats

    return chunk_dedup_stats(
        load_table(spark, sf_dir, "documents"), chunk_words=CHUNK_WORDS
    )


_E32_SQL = f"""
WITH c AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(1, CAST(len(string_split(text, ' ')) // {CHUNK_WORDS} AS BIGINT) + 1),
           i -> array_to_string(
                  list_slice(string_split(text, ' '),
                             (i - 1) * {CHUNK_WORDS} + 1,
                             (i - 1) * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')
         )) AS chunk
  FROM documents
), h AS (
  SELECT doc_id, source, {duckdb_md5_long_sql('chunk')} AS ch FROM c
), d AS (
  SELECT ch, count(DISTINCT doc_id) AS n_docs FROM h GROUP BY ch
)
SELECT source,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
FROM h JOIN d USING (ch)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# E35: PII / identifier scrubbing (regex redaction, zero-shuffle map pass)
# ---------------------------------------------------------------------------


def q_e35_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import redact

    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("text"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.lit("events").alias("src"),
        F.col("event_id").alias("rec_id"),
        F.col("props").alias("text"),
    )
    return redact(cust.unionByName(ev), ["src", "rec_id"], "text")


def _e35_sql() -> str:
    from delta_sorter_spark.operators.textstats import redact_sql

    clean, counts = redact_sql("text")
    counts_sql = ",\n       ".join(counts)
    return f"""
WITH u AS (
  SELECT 'customer' AS src, c_custkey AS rec_id, c_name AS text FROM customer
  UNION ALL
  SELECT 'events' AS src, event_id AS rec_id, props AS text FROM events
)
SELECT src, rec_id,
       {clean} AS clean,
       {counts_sql}
FROM u
"""


_E35_SQL = _e35_sql()


# ---------------------------------------------------------------------------
# E36: Hilbert-curve clustering value (higher-locality sibling of e12 z-order)
# ---------------------------------------------------------------------------

_HILBERT_BITS = 5  # 32x32 grid


def q_e36_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.zorder import hilbert_value_df

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.select(
        (F.col("l_partkey") % 32).alias("a"),
        (F.col("l_suppkey") % 32).alias("b"),
    ).distinct()
    return hilbert_value_df(cells, "a", "b", _HILBERT_BITS, out="hval")


def _e36_sql() -> str:
    from delta_sorter_spark.operators.zorder import hilbert_value_cte_sql

    return hilbert_value_cte_sql(
        "SELECT DISTINCT l_partkey % 32 AS a, l_suppkey % 32 AS b FROM lineitem",
        "a",
        "b",
        _HILBERT_BITS,
        ["a", "b"],
        out="hval",
    )


_E36_SQL = _e36_sql()


# ---------------------------------------------------------------------------
# A37: semi-structured JSON extraction (events.props) + aggregation
# ---------------------------------------------------------------------------


def q_a37_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column with an explicit schema (from_json stays
    JVM-side — no Python in the row path) and aggregate the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_A37_SQL = """
WITH p AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       count(DISTINCT k) AS n_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM p GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A38: remaining ranking-window surface — percent_rank / cume_dist /
# dense_rank / lag-with-default / running max, one pass per partition key
# ---------------------------------------------------------------------------


def q_a38_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    # compound ordering key makes every window function deterministic under
    # price ties (percent_rank/cume_dist divisions are then IEEE-identical
    # across engines)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
        F.lag("o_totalprice", 1, -1.0).over(w).alias("prev_price"),
        F.max("o_totalprice").over(wrun).alias("run_max"),
    )


_A38_SQL = """
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       dense_rank() OVER w AS dr,
       lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
       max(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS run_max
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# ---------------------------------------------------------------------------
# E37: reproducible global shuffle (training-data ordering)
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 16


def q_e37_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed="shuf", n_shards=_SHUF_SHARDS)


def _e37_sql() -> str:
    h = duckdb_md5_long_sql("concat(CAST(doc_id AS VARCHAR), 'shuf')")
    return f"""
WITH h AS (
  SELECT doc_id, {h} AS hv FROM documents
),
s AS (
  SELECT doc_id, hv, hv % {_SHUF_SHARDS} AS shard FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hv, doc_id) - 1
            AS BIGINT) AS pos
FROM s
"""


_E37_SQL = _e37_sql()


# ---------------------------------------------------------------------------
# E38: quantized TF-IDF top terms per document (float-free score:
# tf * floor(log2(N DIV df)) via integer bit length, ties broken on term)
# ---------------------------------------------------------------------------


def q_e38_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


_E38_SQL = """
WITH t AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents)
  WHERE tok <> ''
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
scored AS (
  SELECT doc_id, tok, tf, df,
         CAST(tf * (length(bin(CAST((SELECT n_docs FROM n) AS BIGINT) // df)) - 1)
              AS BIGINT) AS score
  FROM tf JOIN dfreq USING (tok)
),
ranked AS (
  SELECT doc_id, tok, tf, df, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok AS term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# E39: per-domain corpus profile + proportional sample allocation
# (domain-mixing plan; pure integer allocation, one aggregation)
# ---------------------------------------------------------------------------

_MIX_BUDGET = 10_000


def q_e39_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import domain_mix_plan

    docs = load_table(spark, sf_dir, "documents")
    return domain_mix_plan(docs, "source", "doc_id", "text", "lang", budget=_MIX_BUDGET)


_E39_SQL = f"""
WITH tot AS (SELECT count(*) AS n FROM documents)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id,
       CAST({_MIX_BUDGET} * count(*) // (SELECT n FROM tot) AS BIGINT) AS alloc
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# E40: fuzzy-dedup verification — exact Levenshtein over LSH candidate
# pairs, on a normalized 200-char prefix (bounds the DP per pair)
# ---------------------------------------------------------------------------

_E40_PREFIX = 200
_E40_MAXDIST = 130


def q_e40_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import edit_distance_verify

    return edit_distance_verify(
        _doc_subset(spark, sf_dir, DOC_SUBSET_MOD),
        "doc_id",
        "text",
        prefix=_E40_PREFIX,
        max_dist=_E40_MAXDIST,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
    )


_E40_SQL = f"""
WITH {_duckdb_shingle_cte(DOC_SUBSET_MOD)},
sig AS (SELECT doc_id, {_minhash_agg_sql()} FROM h GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {_band_match_sql()}
),
txt AS (
  SELECT doc_id, substr(lower(trim(text)), 1, {_E40_PREFIX}) AS t
  FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
)
SELECT id_a, id_b,
       CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS edit_distance
FROM cand
JOIN txt ta ON ta.doc_id = cand.id_a
JOIN txt tb ON tb.doc_id = cand.id_b
WHERE levenshtein(ta.t, tb.t) <= {_E40_MAXDIST}
"""


# ---------------------------------------------------------------------------
# E41: mergeable histogram-sketch quantiles per event_type (integer
# cumulative-coverage reads: 100*cum >= pct*n — bit-identical everywhere)
# ---------------------------------------------------------------------------


def q_e41_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    return histogram_quantiles(ev, "event_type", "value", pcts=(50, 90, 99))


_E41_SQL = """
WITH counts AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket, count(*) AS c
  FROM events GROUP BY event_type, bucket
),
cum AS (
  SELECT event_type, bucket, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM counts
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       min(CASE WHEN 100 * cum >= 50 * n THEN bucket END) AS p50_bucket,
       min(CASE WHEN 100 * cum >= 90 * n THEN bucket END) AS p90_bucket,
       min(CASE WHEN 100 * cum >= 99 * n THEN bucket END) AS p99_bucket
FROM cum GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# E42: sketch-accuracy audit — MinHash Jaccard estimate vs exact, computed
# only for LSH candidate pairs (the tuning loop for k/bands; the exact side
# never goes quadratic)
# ---------------------------------------------------------------------------


def q_e42_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import (
        minhash_estimate_vs_exact,
        minhash_signatures,
        shingles_expr,
    )

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    # Production shape: the audit serves from PERSISTED signatures/shingles
    # (here an in-memory persist; at scale a Delta table), so the raw corpus
    # is scanned once per cached input instead of re-derived per branch.
    sigs = minhash_signatures(docs, "doc_id", "text", MINHASH_K).persist()
    shingles = docs.select(
        "doc_id", F.explode(shingles_expr("text")).alias("shingle")
    ).persist()
    out = minhash_estimate_vs_exact(
        docs,
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        sigs=sigs,
        shingles=shingles,
    )
    # Materialize the (O(candidate-pairs)-sized) audit eagerly so the cached
    # inputs can be released NOW — otherwise the persisted sigs/shingles
    # blocks outlive this query for the rest of the session (e.g. across a
    # 120-query driver sweep).
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    shingles.unpersist()
    return out


def _match_count_sql() -> str:
    terms = [
        f"CASE WHEN a.minhash_{j} = b.minhash_{j} THEN 1 ELSE 0 END"
        for j in range(MINHASH_K)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_E42_SQL = f"""
WITH {_duckdb_shingle_cte(DOC_SUBSET_MOD)},
sig AS (SELECT doc_id, {_minhash_agg_sql()} FROM h GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {_band_match_sql()}
),
est AS (
  SELECT c.id_a, c.id_b, {_match_count_sql()} AS n_match
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
  GROUP BY c.id_a, c.id_b
)
SELECT e.id_a, e.id_b, e.n_match,
       round(CAST(e.n_match AS DOUBLE) / {MINHASH_K}, 6) AS est_jaccard,
       round(CAST(coalesce(i.i, 0) AS DOUBLE)
             / CAST(sa.n + sb.n - coalesce(i.i, 0) AS DOUBLE), 6) AS jaccard
FROM est e
LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
JOIN sizes sa ON sa.doc_id = e.id_a
JOIN sizes sb ON sb.doc_id = e.id_b
"""


# ---------------------------------------------------------------------------
# A39: CDC log compaction — latest event per user (SCD-1 materialization)
# ---------------------------------------------------------------------------


def q_a39_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    latest = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("last_ts_us"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


_A39_SQL = """
WITH r AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, epoch_us(ts) AS last_ts_us,
       event_type AS last_type, value AS last_value
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# P2: token-length band filter — drop length-outlier documents (fragments /
# boilerplate dumps) outside the corpus [p10, p90] token-count band; exact
# integer percentile reads, zero corpus shuffles
# ---------------------------------------------------------------------------


def q_p2_token_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import token_band_filter

    docs = load_table(spark, sf_dir, "documents")
    kept = token_band_filter(docs, "doc_id", "text", lo_pct=10, hi_pct=90)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


_P2_SQL = """
WITH t AS (
  SELECT source,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
),
counts AS (SELECT n_tokens, count(*) AS c FROM t GROUP BY n_tokens),
cum AS (
  SELECT n_tokens,
         sum(c) OVER (ORDER BY n_tokens
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS n
  FROM counts
),
band AS (
  SELECT min(CASE WHEN 100 * cum >= 10 * n THEN n_tokens END) AS lo,
         min(CASE WHEN 100 * cum >= 90 * n THEN n_tokens END) AS hi
  FROM cum
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens
FROM t, band
WHERE n_tokens BETWEEN lo AND hi
GROUP BY source
"""


# ---------------------------------------------------------------------------
# A40: ordered funnel (view -> click -> purchase, strictly-after semantics)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q_a40_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.events_analytics import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, "user_id", "ts", "event_type", FUNNEL_STEPS)


_A40_SQL = f"""
WITH t0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
t1 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t0 ON e.user_id = t0.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > t0.t
  GROUP BY e.user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > t1.t
  GROUP BY e.user_id
)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_name, count(*) AS n_users FROM t0
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', count(*) FROM t1
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', count(*) FROM t2
"""


# ---------------------------------------------------------------------------
# A41: retention cohorts (first-active-day cohort x day-offset triangle)
# ---------------------------------------------------------------------------


def q_a41_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.events_analytics import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"), "user_id", "ts")


_A41_SQL = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
),
a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', cohort, day) AS INT) AS offset_days,
       count(DISTINCT a.user_id) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY cohort, offset_days
"""


# ---------------------------------------------------------------------------
# E43: count-based bigram LM table (integer ppm conditional probabilities)
# ---------------------------------------------------------------------------


def q_e43_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import bigram_lm_counts

    return bigram_lm_counts(load_table(spark, sf_dir, "documents"), "text")


_E43_SQL = """
WITH toks AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS ts FROM documents
),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM toks
),
c AS (
  SELECT string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2,
         count(*) AS n_bigram
  FROM bi GROUP BY 1, 2
),
ctx AS (
  SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_context FROM c GROUP BY w1
)
SELECT w1, w2, n_bigram, n_context,
       CAST(1000000 * n_bigram // n_context AS BIGINT) AS prob_ppm
FROM c JOIN ctx USING (w1)
"""


# ---------------------------------------------------------------------------
# E44: ANN recall@k — sign-LSH approximate top-k scored against the exact
# brute-force top-k (integer ppm; the ANN parameter-tuning loop)
# ---------------------------------------------------------------------------


def q_e44_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.similarity import topk_recall

    exact = q_e6_topk_cosine(spark, sf_dir)
    approx = q_e7_ann_lsh(spark, sf_dir)
    return topk_recall(exact, approx, "query_id", "id", k=TOPK)


_E44_SQL = f"""
WITH exact AS (SELECT * FROM ({_E6_SQL}) __e),
approx AS (SELECT * FROM ({_E7_SQL}) __a)
SELECT count(DISTINCT e.query_id) AS n_queries,
       {TOPK} AS k,
       count(a.id) AS total_hits,
       CAST(1000000 * count(a.id) // count(*) AS BIGINT) AS recall_ppm
FROM exact e
LEFT JOIN approx a ON a.query_id = e.query_id AND a.id = e.id
"""


# ---------------------------------------------------------------------------
# E45: BM25 top-k lexical retrieval (integer fixed-point scoring; the search
# half of decontamination audits and targeted curation).  Queries are the
# first BM25_QUERY_WORDS words of every BM25_QUERY_MOD-th document; the
# document itself is excluded from its own hits.
# ---------------------------------------------------------------------------

BM25_QUERY_MOD = 37
BM25_QUERY_WORDS = 6
BM25_TOPK = 5


def q_e45_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % BM25_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                1,
                BM25_QUERY_WORDS,
            ),
            " ",
        ).alias("qtext"),
    )
    return bm25_topk(
        docs, queries, "doc_id", "text", "query_id", "qtext",
        k=BM25_TOPK, exclude_self=True,
    )


_E45_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
    FROM documents)
  WHERE tok <> ''
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
         (SELECT count(*) FROM toks) AS total_len
),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
posting AS (
  SELECT tf.doc_id, tf.tok,
         CAST(length(bin(CAST(n_docs // df AS BIGINT))) - 1 AS BIGINT)
           * CAST((2200000000000 * tf) //
               (1000000 * tf + 300000 + (900000 * dl * n_docs) // total_len)
             AS BIGINT) AS term_score
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (tok)
  CROSS JOIN stats
),
qt AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id,
           unnest(regexp_split_to_array(qtext, '\\s+')) AS tok
    FROM (
      SELECT doc_id AS query_id,
             array_to_string(
               list_slice(regexp_split_to_array(lower(trim(text)), '\\s+'),
                          1, {BM25_QUERY_WORDS}), ' ') AS qtext
      FROM documents WHERE doc_id % {BM25_QUERY_MOD} = 0))
  WHERE tok <> ''
),
scored AS (
  SELECT qt.query_id, p.doc_id, CAST(sum(p.term_score) AS BIGINT) AS score
  FROM posting p JOIN qt ON p.tok = qt.tok
  WHERE qt.query_id <> p.doc_id
  GROUP BY qt.query_id, p.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM scored
)
SELECT query_id, doc_id, CAST(rn AS BIGINT) AS rank, score
FROM ranked WHERE rn <= {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# E46: feature-hashed linear quality classifier — unigram+bigram buckets,
# integer weights, broadcastable model (textstats.hashed_linear_score)
# ---------------------------------------------------------------------------

CLS_BUCKETS = 65536


def q_e46_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_score(docs, "doc_id", "text", n_buckets=CLS_BUCKETS)


_E46_SQL = f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
feats AS (
  SELECT doc_id,
         unnest(ts || list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS feat
  FROM arr
),
w AS (
  SELECT doc_id,
         ({duckdb_md5_long_sql('feat')} % {CLS_BUCKETS})
           * 2654435761 % 2147483648 % 2001 - 1000 AS weight
  FROM feats
)
SELECT doc_id,
       count(*) AS n_features,
       CAST(sum(weight) AS BIGINT) AS score,
       CAST(CASE WHEN sum(weight) > 0 THEN 1 ELSE 0 END AS BIGINT) AS label
FROM w GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# A42: time-series gap fill — resample events onto an hourly grid with
# forward-fill (operators/timeseries.resample_ffill; ppm-quantized values)
# ---------------------------------------------------------------------------

RESAMPLE_STEP_S = 3600


def q_a42_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.timeseries import resample_ffill

    return resample_ffill(
        load_table(spark, sf_dir, "events"),
        "event_type", "ts", "value", step_s=RESAMPLE_STEP_S,
    )


_A42_SQL = f"""
WITH b AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {RESAMPLE_STEP_S})
           * {RESAMPLE_STEP_S} AS b,
         max(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM b GROUP BY 1),
grid AS (
  SELECT event_type,
         unnest(range(lo, hi + {RESAMPLE_STEP_S}, {RESAMPLE_STEP_S})) AS gb
  FROM span
),
j AS (
  SELECT g.event_type, g.gb, b.v
  FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.b = g.gb
)
SELECT event_type,
       strftime(make_timestamp(gb * 1000000), '{_TS_FMT_DUCK}') AS bucket_start,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY gb
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ppm,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
FROM j
"""


# ---------------------------------------------------------------------------
# E47: leakage-safe train/val/test split — near-dup clusters (e13's CC over
# the Jaccard pair graph) assigned to ONE split each via component hashing
# (graph.leakage_safe_split), so eval never sees a paraphrase of train.
# ---------------------------------------------------------------------------


def q_e47_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.graph import leakage_safe_split

    docs = _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    out = leakage_safe_split(
        docs.select("doc_id"), pairs, node_col="doc_id", seed=SPLIT_SEED
    )
    return out.select(F.col("id").alias("doc_id"), "component", "split")


_E47_SQL = f"""
WITH comps AS ({_E13_SQL}),
b AS (
  SELECT doc_id, component,
         {duckdb_md5_long_sql(f"CAST(component AS VARCHAR) || '{SPLIT_SEED}'")}
           % {SPLIT_BUCKETS} AS bkt
  FROM comps
)
SELECT doc_id, component,
       CASE WHEN bkt < {int(0.8 * SPLIT_BUCKETS)} THEN 'train'
            WHEN bkt < {int(0.9 * SPLIT_BUCKETS)} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# E48: RAG-style sliding-window chunking — overlapping word windows with
# stable hash chunk ids (dedup.sliding_chunks); the retrieval-index
# ingestion shape (tails kept, unlike dedup chunking)
# ---------------------------------------------------------------------------

RAG_CHUNK_WORDS = 12
RAG_STRIDE = 6


def q_e48_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import sliding_chunks

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    return sliding_chunks(
        docs, "doc_id", "text",
        chunk_words=RAG_CHUNK_WORDS, stride=RAG_STRIDE,
    )


_E48_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
),
s AS (
  SELECT doc_id, ws,
         unnest(list_distinct(
           range(1, greatest(len(ws) - {RAG_CHUNK_WORDS} + 1, 1) + 1,
                 {RAG_STRIDE})
           || [greatest(len(ws) - {RAG_CHUNK_WORDS} + 1, 1)])) AS cs
  FROM w
),
c AS (
  SELECT doc_id,
         {duckdb_md5_long_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(cs AS VARCHAR)")}
           AS chunk_id,
         CAST(cs AS BIGINT) AS chunk_start,
         array_to_string(list_slice(ws, cs, cs + {RAG_CHUNK_WORDS} - 1), ' ')
           AS chunk
  FROM s
)
SELECT doc_id, chunk_id, chunk_start, chunk FROM c WHERE chunk <> ''
"""


# ---------------------------------------------------------------------------
# E49: chunk-level BM25 retrieval — the composed RAG shape: sliding-window
# chunking (e48) feeds BM25 search (e45) as its corpus, queries are document
# openings; pure operator composition, no new code paths.
# ---------------------------------------------------------------------------

RAG_QUERY_MOD = 35  # doc subset (mod 5) ∩ every 7th -> 1 in 35 overall


def q_e49_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import sliding_chunks
    from delta_sorter_spark.operators.retrieval import bm25_topk

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    chunks = sliding_chunks(
        docs, "doc_id", "text",
        chunk_words=RAG_CHUNK_WORDS, stride=RAG_STRIDE,
    ).select(F.col("chunk_id").alias("cid"), "chunk")
    queries = docs.where(F.col("doc_id") % RAG_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5), " "
        ).alias("qtext"),
    )
    return bm25_topk(
        chunks, queries, "cid", "chunk", "query_id", "qtext", k=3
    )


_E49_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
),
sx AS (
  SELECT doc_id, ws,
         unnest(list_distinct(
           range(1, greatest(len(ws) - {RAG_CHUNK_WORDS} + 1, 1) + 1,
                 {RAG_STRIDE})
           || [greatest(len(ws) - {RAG_CHUNK_WORDS} + 1, 1)])) AS cs
  FROM w
),
chunks AS (
  SELECT {duckdb_md5_long_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(cs AS VARCHAR)")}
           AS cid,
         array_to_string(list_slice(ws, cs, cs + {RAG_CHUNK_WORDS} - 1), ' ')
           AS chunk
  FROM sx
  WHERE array_to_string(list_slice(ws, cs, cs + {RAG_CHUNK_WORDS} - 1), ' ') <> ''
),
toks AS (
  SELECT cid, tok FROM (
    SELECT cid, unnest(regexp_split_to_array(lower(trim(chunk)), '\\s+')) AS tok
    FROM chunks)
  WHERE tok <> ''
),
tf AS (SELECT cid, tok, count(*) AS tf FROM toks GROUP BY cid, tok),
dl AS (SELECT cid, count(*) AS dl FROM toks GROUP BY cid),
stats AS (
  SELECT (SELECT count(DISTINCT cid) FROM chunks) AS n_docs,
         (SELECT count(*) FROM toks) AS total_len
),
dfreq AS (SELECT tok, count(DISTINCT cid) AS df FROM toks GROUP BY tok),
posting AS (
  SELECT tf.cid, tf.tok,
         CAST(length(bin(CAST(n_docs // df AS BIGINT))) - 1 AS BIGINT)
           * CAST((2200000000000 * tf) //
               (1000000 * tf + 300000 + (900000 * dl * n_docs) // total_len)
             AS BIGINT) AS term_score
  FROM tf
  JOIN dl USING (cid)
  JOIN dfreq USING (tok)
  CROSS JOIN stats
),
qt AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id,
           unnest(regexp_split_to_array(qtext, '\\s+')) AS tok
    FROM (
      SELECT doc_id AS query_id,
             array_to_string(
               list_slice(regexp_split_to_array(lower(trim(text)), '\\s+'),
                          1, 5), ' ') AS qtext
      FROM documents
      WHERE doc_id % {DOC_SUBSET_MOD} = 0 AND doc_id % {RAG_QUERY_MOD} = 0))
  WHERE tok <> ''
),
scored AS (
  SELECT qt.query_id, p.cid, CAST(sum(p.term_score) AS BIGINT) AS score
  FROM posting p JOIN qt ON p.tok = qt.tok
  GROUP BY qt.query_id, p.cid
),
ranked AS (
  SELECT query_id, cid, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, cid) AS rn
  FROM scored
)
SELECT query_id, cid, CAST(rn AS BIGINT) AS rank, score
FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# E50: fuzzy decontamination — MinHash/LSH candidates BETWEEN the corpus
# (doc subset mod 2) and the benchmark subset (mod DECON_MOD); the
# paraphrase-tolerant complement to e30's exact n-gram overlap.
# ---------------------------------------------------------------------------

FUZZY_CORPUS_MOD = 2


def q_e50_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import fuzzy_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_decontaminate(
        docs.where(F.col("doc_id") % FUZZY_CORPUS_MOD == 0),
        docs.where(F.col("doc_id") % DECON_MOD == 0),
        "doc_id", "text",
        k=MINHASH_K, bands=MINHASH_BANDS,
    )


_E50_SQL = f"""
WITH {_duckdb_shingle_cte(FUZZY_CORPUS_MOD)},
csig AS (SELECT doc_id, {_minhash_agg_sql()} FROM h GROUP BY doc_id),
bd AS (SELECT doc_id, lower(text) AS t FROM documents
       WHERE doc_id % {DECON_MOD} = 0),
bsh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(1, len(t) - 2)),
             i -> substr(t, i, 3)))) AS s
  FROM bd
),
bh AS (SELECT doc_id, {duckdb_md5_long_sql('s')} % {MERSENNE_P} AS x FROM bsh),
bsig AS (SELECT doc_id, {_minhash_agg_sql()} FROM bh GROUP BY doc_id)
SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS bench_id
FROM csig a JOIN bsig b
  ON ({_band_match_sql()})
WHERE a.doc_id <> b.doc_id
"""


# ---------------------------------------------------------------------------
# E51: LM-based quality filtering — train the e43 bigram LM on a reference
# subset (doc_id % LM_REF_MOD == 0), score EVERY document's bigrams against
# it in integer surprisal bits (textstats.bigram_lm_score; the KenLM/CCNet
# filtering shape).
# ---------------------------------------------------------------------------

LM_REF_MOD = 3
LM_BACKOFF_BITS = 20


def q_e51_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import (
        bigram_lm_counts,
        bigram_lm_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    lm = bigram_lm_counts(docs.where(F.col("doc_id") % LM_REF_MOD == 0), "text")
    return bigram_lm_score(
        docs, lm, "doc_id", "text", backoff_bits=LM_BACKOFF_BITS
    )


_E51_SQL = f"""
WITH ref AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS ts
  FROM documents WHERE doc_id % {LM_REF_MOD} = 0
),
rbi AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM ref
),
c AS (
  SELECT string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2,
         count(*) AS n_bigram
  FROM rbi GROUP BY 1, 2
),
ctx AS (SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_context FROM c GROUP BY w1),
lm AS (
  SELECT w1, w2,
         CAST(1000000 * n_bigram // n_context AS BIGINT) AS prob_ppm
  FROM c JOIN ctx USING (w1)
),
d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ts
  FROM documents
),
db AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM d
),
dp AS (
  SELECT doc_id,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2
  FROM db
),
scored AS (
  SELECT dp.doc_id,
         CASE WHEN prob_ppm IS NULL OR prob_ppm < 1 THEN {LM_BACKOFF_BITS}
              ELSE length(bin(CAST(1000000 // prob_ppm AS BIGINT))) - 1
         END AS bits
  FROM dp LEFT JOIN lm ON dp.w1 = lm.w1 AND dp.w2 = lm.w2
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS total_bits,
       CAST(1000000 * CAST(sum(bits) AS BIGINT) // count(*) AS BIGINT)
         AS avg_bits_ppm
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# E52: shingle-containment near-dup pairs (the dedup case Jaccard misses:
# a small document embedded inside a much larger one)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.6


def q_e52_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD),
        "doc_id",
        "text",
        threshold=CONTAINMENT_THRESHOLD,
    )


_E52_SQL = f"""
WITH {_duckdb_shingle_cte(JACCARD_SUBSET_MOD)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / sa.n, 6) AS containment_a,
       round(CAST(i AS DOUBLE) / sb.n, 6) AS containment_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE greatest(CAST(i AS DOUBLE) / sa.n, CAST(i AS DOUBLE) / sb.n)
        >= {CONTAINMENT_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# E53: deterministic weighted sampling (priority sampling with a seeded
# hash in place of the RNG — the quality-weighted corpus subsample)
# ---------------------------------------------------------------------------

WPS_K = 50
WPS_SEED = "wps-v1"
WPS_USCALE = 1_000_000


def q_e53_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import weighted_priority_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_priority_sample(
        docs, "doc_id", "length(text)", k=WPS_K, seed=WPS_SEED, u_scale=WPS_USCALE
    )
    return out.select("doc_id", "priority")


WPS_WSCALE = 1_000_000

_E53_SQL = f"""
SELECT doc_id,
       CAST(floor(CAST(length(text) AS DOUBLE) * {WPS_WSCALE}) AS BIGINT) * {WPS_USCALE}
         // (({duckdb_md5_long_sql(f"concat('{WPS_SEED}', CAST(doc_id AS VARCHAR))")})
              % {WPS_USCALE} + 1) AS priority
FROM documents
WHERE CAST(floor(CAST(length(text) AS DOUBLE) * {WPS_WSCALE}) AS BIGINT) * {WPS_USCALE}
        // (({duckdb_md5_long_sql(f"concat('{WPS_SEED}', CAST(doc_id AS VARCHAR))")})
             % {WPS_USCALE} + 1) > 0
ORDER BY priority DESC, doc_id ASC
LIMIT {WPS_K}
"""


# ---------------------------------------------------------------------------
# E54: HyperLogLog distinct-count sketch (integer registers + integer
# estimate; exact distinct joined alongside as the accuracy readout)
# ---------------------------------------------------------------------------

HLL_P = 6
HLL_Q = 40
HLL_SCALE_POW = 50


def q_e54_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import (
        hll_grouped_estimate,
        hll_grouped_registers,
    )

    li = load_table(spark, sf_dir, "lineitem")
    regs = hll_grouped_registers(
        li, "CAST(l_orderkey AS STRING)", p=HLL_P, q=HLL_Q,
        group_cols=["l_returnflag"],
    )
    est = hll_grouped_estimate(
        regs, p=HLL_P, group_cols=["l_returnflag"], scale_pow=HLL_SCALE_POW
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag", "m", "n_zero_registers", "estimate", "exact_distinct"
    )


def _hll_oracle_sql() -> str:
    from delta_sorter_spark.operators.sketches import hll_alpha_ppm

    m = 1 << HLL_P
    alpha = hll_alpha_ppm(m)
    h = duckdb_md5_long_sql("CAST(l_orderkey AS VARCHAR)")
    w = f"(({h}) // {m}) % {1 << HLL_Q}"
    rho = (
        f"CASE WHEN {w} = 0 THEN {HLL_Q + 1}"
        f" ELSE {HLL_Q} - length(bin({w})) + 1 END"
    )
    return f"""
regs AS (
  SELECT l_returnflag, ({h}) % {m} AS register,
         CAST(max({rho}) AS BIGINT) AS rho
  FROM lineitem GROUP BY l_returnflag, register
),
agg AS (
  SELECT l_returnflag, count(*) AS present,
         sum(CAST(1 AS BIGINT) << ({HLL_SCALE_POW} - rho)) AS s
  FROM regs GROUP BY l_returnflag
),
est AS (
  SELECT l_returnflag,
         CAST({m} AS BIGINT) AS m,
         CAST({m} - present AS BIGINT) AS n_zero_registers,
         CAST(floor((CAST({alpha} AS DECIMAL(38,0)) * {m} * {m}
                     * CAST({1 << HLL_SCALE_POW} AS DECIMAL(38,0)))
                    / (CAST(s + ({m} - present) * CAST({1 << HLL_SCALE_POW} AS BIGINT)
                       AS DECIMAL(38,0)) * 1000000)) AS BIGINT) AS estimate
  FROM agg
)
SELECT e.l_returnflag, e.m, e.n_zero_registers, e.estimate,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct
FROM est e
JOIN (SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag) x USING (l_returnflag)
"""


_E54_SQL = "WITH " + _hll_oracle_sql()


# ---------------------------------------------------------------------------
# E55: quality-aware cluster dedup — keep the HIGHEST-scoring document per
# near-duplicate component (dedup_representatives keeps min id; production
# pipelines keep the best-quality copy)
# ---------------------------------------------------------------------------


def q_e55_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import ngram_jaccard_pairs
    from delta_sorter_spark.operators.graph import dedup_keep_best

    docs = _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=JACCARD_THRESHOLD
    )
    kept = dedup_keep_best(
        docs.withColumn("__len__", F.length("text").cast("bigint")),
        pairs.select("id_a", "id_b"),
        "doc_id",
        "__len__",
    )
    return kept.select("doc_id", F.col("__len__").alias("doc_len"))


_E55_SQL = f"""
WITH RECURSIVE {_duckdb_shingle_cte(JACCARD_SUBSET_MOD)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}
),
bidir AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT r.src, e.b FROM reach r JOIN bidir e ON r.dst = e.a
),
comp AS (
  SELECT src AS doc_id, min(dst) AS component
  FROM reach GROUP BY src
),
ranked AS (
  SELECT c.doc_id, c.component,
         CAST(length(dd.t) AS BIGINT) AS doc_len,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY length(dd.t) DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN d dd ON dd.doc_id = c.doc_id
)
SELECT doc_id, doc_len FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# E56/E57: substring-level dedup (Lee et al. 2022) — repeated n-gram span
# detection + span removal.  Document-level dedup keeps two different pages
# sharing a boilerplate paragraph; these find and strip the paragraph.
# ---------------------------------------------------------------------------

SPAN_N = 8
SPAN_MIN_DOCS = 2


def q_e56_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import repeated_ngram_spans

    docs = load_table(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, "doc_id", "text", n=SPAN_N, min_docs=SPAN_MIN_DOCS)


def _span_cte() -> str:
    n = SPAN_N
    return f"""
d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS gram
  FROM d, unnest(CASE WHEN len(toks) >= {n}
                      THEN generate_series(1, len(toks) - {n - 1})
                      ELSE [] END) AS t(i)
),
rep AS (SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= {SPAN_MIN_DOCS}),
hits AS (SELECT doc_id, pos, pos + {n} AS e FROM g JOIN rep USING (gram)),
flagged AS (
  SELECT doc_id, pos, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span
  FROM hits
),
numbered AS (
  SELECT doc_id, pos, e,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM flagged
),
spans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(e) AS BIGINT) AS span_end,
         CAST(max(e) - min(pos) AS BIGINT) AS span_tokens
  FROM numbered GROUP BY doc_id, span_id
)"""


_E56_SQL = f"""
WITH {_span_cte()}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
"""


def q_e57_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_ngram_spans,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = repeated_ngram_spans(
        docs, "doc_id", "text", n=SPAN_N, min_docs=SPAN_MIN_DOCS
    )
    out = remove_repeated_spans(docs, spans, "doc_id", "text")
    # limit the hashed payload: only docs that actually changed
    return out.where(F.col("tokens_removed") > 0).select(
        "doc_id", "text", "tokens_removed"
    )


_E57_SQL = f"""
WITH {_span_cte()},
tokpos AS (
  SELECT doc_id, i - 1 AS idx, toks[i] AS tok
  FROM d, unnest(generate_series(1, len(toks))) AS t(i)
),
kept AS (
  SELECT tp.doc_id, tp.idx, tp.tok
  FROM tokpos tp
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = tp.doc_id
                      AND tp.idx >= s.span_start AND tp.idx < s.span_end)
)
SELECT d.doc_id,
       coalesce((SELECT string_agg(tok, ' ' ORDER BY idx)
                 FROM kept k WHERE k.doc_id = d.doc_id), '') AS text,
       CAST(len(toks) - (SELECT count(*) FROM kept k
                         WHERE k.doc_id = d.doc_id) AS BIGINT) AS tokens_removed
FROM d
WHERE len(toks) > (SELECT count(*) FROM kept k WHERE k.doc_id = d.doc_id)
"""


# ---------------------------------------------------------------------------
# E58: sorted-neighborhood blocking (Hernandez & Stolfo) — rank-adjacent
# candidate pairs under a normalized blocking key; the record-linkage
# complement to LSH banding
# ---------------------------------------------------------------------------

SN_WINDOW = 3
SN_KEY_SPARK = "substring(lower(trim(text)), 1, 16)"
SN_KEY_DUCK = "substr(lower(trim(text)), 1, 16)"


def q_e58_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(docs, "doc_id", SN_KEY_SPARK, window=SN_WINDOW)


_E58_SQL = f"""
WITH ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY {SN_KEY_DUCK}, doc_id) AS rn
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(b.rn - a.rn AS BIGINT) AS dist
FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND {SN_WINDOW - 1}
"""


# ---------------------------------------------------------------------------
# E59: typo-tolerant record linkage — sorted-neighborhood candidates verified
# by Levenshtein edit distance (merge/purge with its verification stage;
# catches one-character edits that rewrite every covering shingle)
# ---------------------------------------------------------------------------

E59_VALUE_SPARK = "substring(lower(trim(text)), 1, 24)"
E59_VALUE_DUCK = "substr(lower(trim(text)), 1, 24)"
E59_MAX_DIST = 10


def q_e59_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import fuzzy_neighborhood_linkage

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_neighborhood_linkage(
        docs,
        "doc_id",
        SN_KEY_SPARK,
        E59_VALUE_SPARK,
        window=SN_WINDOW,
        max_dist=E59_MAX_DIST,
    )


_E59_SQL = f"""
WITH ranked AS (
  SELECT doc_id, {E59_VALUE_DUCK} AS val,
         row_number() OVER (ORDER BY {SN_KEY_DUCK}, doc_id) AS rn
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.val, b.val) AS BIGINT) AS edit_dist
FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND {SN_WINDOW - 1}
WHERE levenshtein(a.val, b.val) <= {E59_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# E60: product-quantization ANN (Jégou et al. 2011) — per-subspace codebooks
# via the deterministic integer-quantized k-means, ADC lookup-table search.
# The ANN MEMORY scale path: dim floats/vector -> m small ints.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces of EMB_DIM/PQ_M dims each
PQ_CODES = 8
_PQ_DSUB = EMB_DIM // PQ_M


def q_e60_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.ivf import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = pq_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=TOPK,
        m=PQ_M,
        n_codes=PQ_CODES,
        n_iters=2,
    )
    return out.select(
        "query_id",
        "id",
        "rank",
        F.round("approx_d", 6).alias("approx_d"),
        F.round("cosine", 6).alias("cosine"),
    )


def _duck_pq_iter(sub: str, prev: str, name: str, dsub: int) -> str:
    """One Lloyd iteration over subspace CTE ``sub``: assign to ``prev``,
    re-center with the same integer quantization as the Spark side."""
    return f"""
{name}_a AS (
  SELECT vec_id, v, centroid FROM (
    SELECT c.vec_id, c.v, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM {sub} c CROSS JOIN {prev} s) WHERE rn = 1
),
{name}_m AS (
  SELECT centroid, pos,
         CAST(sum(CAST(floor(v[pos] * {_IVF_QSCALE}) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) * {_IVF_QSCALE} AS DOUBLE) AS m
  FROM {name}_a CROSS JOIN (SELECT unnest(generate_series(1, {dsub})) AS pos)
  GROUP BY centroid, pos
),
{name} AS (
  SELECT s.centroid, coalesce(n.cvec, s.cvec) AS cvec
  FROM {prev} s LEFT JOIN (SELECT centroid, list(m ORDER BY pos) AS cvec
                           FROM {name}_m GROUP BY centroid) n USING (centroid)
)"""


def _duck_pq_subspace(j: int) -> str:
    """Full per-subspace pipeline: slice -> seed -> 2 Lloyd iterations ->
    corpus codes + query distance tables."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
sub{j} AS (
  SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus
),
seed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM sub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'sub{j}', f'seed{j}', f'cb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'sub{j}', f'cb{j}_1', f'cb{j}', _PQ_DSUB)},
code{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM sub{j} c CROSS JOIN cb{j} s) WHERE rn = 1
),
qt{j} AS (
  SELECT q.vec_id AS query_id, s.centroid AS code,
         {_duck_sq_l2('q.v', 's.cvec')} AS d
  FROM sub{j} q CROSS JOIN cb{j} s
  WHERE q.vec_id % {QUERY_VEC_MOD} = 0
)"""


_E60_SQL = f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),{','.join(_duck_pq_subspace(j) for j in range(PQ_M))},
scored AS (
  SELECT c0.vec_id AS id, q0.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM code0 c0
  {' '.join(f'JOIN code{j} c{j} ON c{j}.vec_id = c0.vec_id' for j in range(1, PQ_M))}
  JOIN qt0 q0 ON q0.code = c0.code
  {' '.join(f'JOIN qt{j} q{j} ON q{j}.code = c{j}.code AND q{j}.query_id = q0.query_id' for j in range(1, PQ_M))}
  WHERE c0.vec_id <> q0.query_id
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E62: IVF-PQ composed ANN — coarse inverted lists restrict candidates, ADC
# codes score them (the full production shape; no-residual variant).  The
# oracle replays the coarse 64-dim k-means AND all four subspace k-means.
# ---------------------------------------------------------------------------

IVFPQ_CENTROIDS = 16
IVFPQ_PROBES = 4


def q_e62_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.ivf import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = ivfpq_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=TOPK,
        m=PQ_M,
        n_codes=PQ_CODES,
        n_centroids=IVFPQ_CENTROIDS,
        n_probes=IVFPQ_PROBES,
        n_iters=2,
    )
    return out.select(
        "query_id",
        "id",
        "rank",
        F.round("approx_d", 6).alias("approx_d"),
        F.round("cosine", 6).alias("cosine"),
    )


def _e62_sql() -> str:
    coarse_seed = f"""
coarse_seed AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM corpus))
  WHERE rn <= {IVFPQ_CENTROIDS}
)"""
    code_joins = " ".join(
        f"JOIN code{j} c{j} ON c{j}.vec_id = cl.vec_id" for j in range(PQ_M)
    )
    qt_joins = " ".join(
        f"JOIN qt{j} q{j} ON q{j}.code = c{j}.code AND q{j}.query_id = qp.query_id"
        for j in range(PQ_M)
    )
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),{coarse_seed},{_duck_pq_iter('corpus', 'coarse_seed', 'coarse1', EMB_DIM)},{_duck_pq_iter('corpus', 'coarse1', 'coarse', EMB_DIM)},
clist AS (
  SELECT vec_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s
    WHERE c.vec_id % {QUERY_VEC_MOD} = 0) WHERE rn <= {IVFPQ_PROBES}
),{','.join(_duck_pq_subspace(j) for j in range(PQ_M))},
scored AS (
  SELECT cl.vec_id AS id, qp.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM clist cl
  JOIN qprobe qp ON qp.centroid = cl.centroid AND qp.query_id <> cl.vec_id
  {code_joins}
  {qt_joins}
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E61: BPE pair statistics — the counting step of a tokenizer-training
# iteration: adjacent character-pair frequencies weighted by word frequency,
# computed over the DISTINCT vocabulary (corpus text read once)
# ---------------------------------------------------------------------------

BPE_TOP_N = 100


def q_e61_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, "text", top_n=BPE_TOP_N)


_E61_SQL = f"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
vocab AS (SELECT w, count(*) AS wn FROM w WHERE w <> '' GROUP BY w),
expanded AS (
  SELECT w, wn, unnest(generate_series(1, length(w) - 1)) AS i FROM vocab
),
counts AS (
  SELECT substr(w, i, 2) AS pair, CAST(sum(wn) AS BIGINT) AS n
  FROM expanded GROUP BY pair
)
SELECT pair, n FROM counts ORDER BY n DESC, pair LIMIT {BPE_TOP_N}
"""


# ---------------------------------------------------------------------------
# A47: corpus profile (data card) — per-source doc/token/dup/lang rollup,
# the report a curation dashboard refreshes per corpus version
# ---------------------------------------------------------------------------


def q_a47_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import n_tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tokens_expr("text")).cast("bigint").alias("n_tokens"),
        F.countDistinct("text").cast("bigint").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text"))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


_A47_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
         AS n_tokens,
       CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# M4: multimodal embed -> ANN pipeline — binary payloads through the stub
# encoder (deterministic md5 pseudo-embeddings, the CLIP-call boundary) into
# exact top-k cosine.  End-to-end proof the multimodal plumbing feeds the
# similarity operators unchanged.
# ---------------------------------------------------------------------------

M4_K = 3
M4_QUERY_MOD = 25  # 20 query docs over the 100-doc asset subset


def q_m4_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.multimodal import embed_assets
    from delta_sorter_spark.operators.similarity import brute_force_topk

    assets = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    emb = embed_assets(assets, "doc_id", "payload")
    queries = emb.where(F.col("id") % M4_QUERY_MOD == 0)
    out = brute_force_topk(
        emb, queries, "id", "embedding", "id", "embedding", k=M4_K
    )
    return out.select(
        "query_id", "id", "rank", F.round("cosine", 6).alias("cosine")
    )


def _m4_component(j: int) -> str:
    hi = _HEXBYTE.format(p=4 * j + 1, p1=4 * j + 2)
    lo = _HEXBYTE.format(p=4 * j + 3, p1=4 * j + 4)
    return f"CAST(({hi}) * 256 + ({lo}) - 32768 AS DOUBLE)"


_M4_SQL = f"""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents
           WHERE doc_id % {DOC_SUBSET_MOD} = 0),
emb AS (
  SELECT doc_id AS id,
         [{', '.join(_m4_component(j) for j in range(8))}] AS v
  FROM h
),
q AS (SELECT id AS query_id, v AS qe FROM emb WHERE id % {M4_QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, e.id,
         {_DOT.format(a='q.qe', b='e.v')}
           / (sqrt({_SSQ.format(a='q.qe')}) * sqrt({_SSQ.format(a='e.v')}))
           AS cosine
  FROM emb e CROSS JOIN q
  WHERE e.id <> q.query_id
),
ranked AS (
  SELECT query_id, id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", round(cosine, 6) AS cosine
FROM ranked WHERE rn <= {M4_K}
"""


# ---------------------------------------------------------------------------
# M5: perceptual-hash image near-dup (operators/multimodal.py
# phash_near_dup) — the image-content dedup modality: thumbnail (pluggable
# decoder, md5-chain stub here) -> aHash -> banded candidate join -> exact
# Hamming verify.  The corpus unions a re-ingested copy of every 7th asset
# under a shifted id (the real scenario: one image ingested twice), so the
# pipeline surfaces those as hamming-0 pairs; random band collisions are
# killed by the Hamming cutoff.
# ---------------------------------------------------------------------------

M5_VARIANT_SHIFT = 1_000_000
M5_VARIANT_MOD = 7
M5_MAX_HAMMING = 8


def q_m5_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.multimodal import phash_near_dup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % M5_VARIANT_MOD == 0).select(
            (F.col("doc_id") + M5_VARIANT_SHIFT).alias("doc_id"), "text"
        )
    )
    assets = corpus.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return phash_near_dup(
        assets, "doc_id", "payload", max_hamming=M5_MAX_HAMMING
    )


def _m5_ctes(corpus_sql: str | None = None) -> str:
    """The perceptual-hash pipeline as composable CTE text: re-ingested
    corpus -> stub thumbnails -> aHash band words -> banded candidates ->
    Hamming-verified pairs (``phpairs``).  Shared by the m5 oracle, the
    p4 pipeline oracle, and (with a caller-supplied ``corpus_sql``) the
    tri-modal p7 oracle."""
    corpus_sql = corpus_sql or f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {M5_VARIANT_SHIFT} AS doc_id, text FROM documents
  WHERE doc_id % {M5_VARIANT_MOD} = 0"""
    return f"""corpus AS MATERIALIZED (
{corpus_sql}
),
px AS (
  SELECT doc_id,
         flatten(list_transform(range(0, 4), j ->
           list_transform(range(0, 16), i ->
             CAST(('0x' || substr(md5(text || CAST(j AS VARCHAR)),
                                  CAST(2 * i + 1 AS INT), 2))::BIGINT AS INT)
           ))) AS pixels
  FROM corpus
),
ah AS (
  SELECT doc_id, pixels, list_aggregate(pixels, 'sum') // 64 AS pxavg FROM px
),
bands AS MATERIALIZED (
  SELECT doc_id, list_transform(range(0, 4), b ->
    CAST(list_aggregate(list_transform(range(0, 16), i ->
      CASE WHEN pixels[CAST(16 * b + i + 1 AS INT)] > pxavg
           THEN (1 << CAST(i AS INT)) ELSE 0 END), 'sum') AS INT)) AS words
  FROM ah
),
ex AS (
  SELECT doc_id, b, words[CAST(b + 1 AS INT)] AS word
  FROM bands CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.b = b.b AND a.word = b.word AND a.doc_id < b.doc_id
),
phpairs AS (
  SELECT c.id_a, c.id_b,
         CAST(list_aggregate(list_transform(range(0, 4), k ->
           bit_count(xor(wa.words[CAST(k + 1 AS INT)],
                         wb.words[CAST(k + 1 AS INT)]))), 'sum') AS INT)
           AS hamming
  FROM cand c
  JOIN bands wa ON wa.doc_id = c.id_a
  JOIN bands wb ON wb.doc_id = c.id_b
  WHERE hamming <= {M5_MAX_HAMMING}
)"""


_M5_SQL = f"""
WITH {_m5_ctes()}
SELECT id_a, id_b, hamming FROM phpairs
"""


# ---------------------------------------------------------------------------
# M6: audio fingerprint near-dup (operators/multimodal.py audio_near_dup) —
# chromaprint-style OFFSET-TOLERANT matching: per-frame fingerprint words,
# word-equality candidates, per-pair best-alignment vote, aligned Hamming
# verify.  The stub fingerprints frame CONTENT (md5 of each 8-byte payload
# window), so the fixture's variants — the same document with a 16-char
# prefix — genuinely produce 2-frame-shifted fingerprints that only an
# offset-tolerant matcher finds.  The oracle replays the exact pipeline on
# the text form (payload = UTF-8 of ASCII text, so DuckDB's string md5
# equals Python's byte md5).
# ---------------------------------------------------------------------------

M6_VARIANT_SHIFT = 2_000_000
M6_VARIANT_MOD = 5
M6_PREFIX = "[clip-padding!]:"  # 16 chars = exactly 2 stub frames
M6_MIN_FRAMES = 8
M6_MAX_HPF = 4
M6_MAX_WORD_FREQ = 50


def q_m6_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.multimodal import audio_near_dup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % M6_VARIANT_MOD == 0).select(
            (F.col("doc_id") + M6_VARIANT_SHIFT).alias("doc_id"),
            F.concat(F.lit(M6_PREFIX), F.col("text")).alias("text"),
        )
    )
    assets = corpus.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return audio_near_dup(
        assets, "doc_id", "payload",
        min_matching_frames=M6_MIN_FRAMES,
        max_hamming_per_frame=M6_MAX_HPF,
        max_word_freq=M6_MAX_WORD_FREQ,
    )


def _frame_match_ctes(
    prefix: str,
    frames_range: str,
    frame_bytes: int,
    max_frames: int,
    min_frames: int,
    max_hpf: int,
    max_word_freq: int,
) -> str:
    """The m6/m7 offset-tolerant frame-sequence matcher as composable CTE
    text over an existing ``corpus(doc_id, text)`` CTE, ending in
    ``{prefix}pairs(id_a, id_b, "offset", matching_frames, hamming)``.
    ``frames_range`` is the DuckDB range() producing the frame indices
    (m6: fixed 0..15; m7: sampled every_n over the fake duration probe)."""
    p = prefix
    return f"""{p}fps AS MATERIALIZED (
  SELECT doc_id,
         list_transform({frames_range}, idx ->
           CAST(('0x' || substr(md5(substr(text,
                   CAST(idx * {frame_bytes} + 1 AS INT), {frame_bytes})),
                 1, 7))::BIGINT AS INT)) AS fp
  FROM corpus
),
{p}words AS (
  SELECT doc_id, CAST(k AS INT) AS frame, fp[CAST(k + 1 AS INT)] AS word
  FROM {p}fps CROSS JOIN (SELECT unnest(range(0, {max_frames})) AS k) t
  WHERE k < len(fp)
),
{p}hot AS (
  SELECT word FROM {p}words GROUP BY word
  HAVING count(DISTINCT doc_id) > {max_word_freq}
),
{p}cold AS (
  SELECT * FROM {p}words WHERE word NOT IN (SELECT word FROM {p}hot)
),
{p}votes AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.frame - b.frame AS "offset", count(*) AS votes
  FROM {p}cold a JOIN {p}cold b
    ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3
),
{p}best AS (
  SELECT id_a, id_b, "offset" FROM (
    SELECT id_a, id_b, "offset",
           row_number() OVER (PARTITION BY id_a, id_b
                              ORDER BY votes DESC, "offset" ASC) AS rk
    FROM {p}votes
  ) WHERE rk = 1
),
{p}aligned AS (
  SELECT b.id_a, b.id_b, b."offset",
         greatest(b."offset", 0) AS astart,
         greatest(-b."offset", 0) AS bstart,
         greatest(least(len(wa.fp) - greatest(b."offset", 0),
                        len(wb.fp) - greatest(-b."offset", 0)), 0) AS n_ov,
         wa.fp AS fa, wb.fp AS fb
  FROM {p}best b
  JOIN {p}fps wa ON wa.doc_id = b.id_a
  JOIN {p}fps wb ON wb.doc_id = b.id_b
),
{p}scored AS (
  SELECT id_a, id_b, "offset",
         len(list_filter(range(0, n_ov), k ->
           fa[CAST(astart + k + 1 AS INT)] = fb[CAST(bstart + k + 1 AS INT)]
         )) AS matching_frames,
         coalesce(CAST(list_aggregate(list_transform(range(0, n_ov), k ->
           bit_count(xor(fa[CAST(astart + k + 1 AS INT)],
                         fb[CAST(bstart + k + 1 AS INT)]))), 'sum') AS INT),
           0) AS hamming,
         n_ov
  FROM {p}aligned
),
{p}pairs AS (
  SELECT id_a, id_b, "offset", matching_frames, hamming
  FROM {p}scored
  WHERE matching_frames >= {min_frames}
    AND hamming <= {max_hpf} * n_ov
)"""


def _make_m6_sql() -> str:
    from delta_sorter_spark.operators.multimodal import (
        FP_FRAME_BYTES,
        FP_FRAMES,
    )

    prefix = M6_PREFIX.replace("'", "''")
    chain = _frame_match_ctes(
        "au", f"range(0, {FP_FRAMES})", FP_FRAME_BYTES, FP_FRAMES,
        M6_MIN_FRAMES, M6_MAX_HPF, M6_MAX_WORD_FREQ,
    )
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {M6_VARIANT_SHIFT} AS doc_id,
         '{prefix}' || text AS text
  FROM documents WHERE doc_id % {M6_VARIANT_MOD} = 0
),
{chain}
SELECT id_a, id_b, "offset", matching_frames, hamming FROM aupairs
"""


# ---------------------------------------------------------------------------
# P4: multimodal dedup pipeline — the composed image-curation verb: pHash
# near-dup pairs (m5) -> connected components over ALL assets -> keep the
# smallest id per cluster, reporting each multi-asset cluster's size and
# the payload bytes dedup saves.  One oracle replays the whole chain
# (thumbnail stub -> bands -> banded candidates -> Hamming pairs ->
# recursive reachability -> per-cluster aggregation).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# P5: lakehouse lifecycle composition — the round-7 protocol features
# interoperating in ONE hash-checked pipeline: clustered create (q21) ->
# OPTIMIZE -> widen the clustering key int->long (q22) -> beyond-int32
# append (lands unclustered) -> merge-on-read DV DELETE -> second OPTIMIZE
# (folds the append in, applies the DV physically, old cube untouched) ->
# V2 checkpoint (q24) -> fresh-reader aggregate.  Each feature is
# oracle-checked alone; this entry proves the COMPOSITION: a widened key
# flowing through curve re-layout, DV exclusion riding a rewrite, and a
# sidecar checkpoint replay of the result.
# ---------------------------------------------------------------------------

_P5_SHIFT = 3_000_000_000


def q_p5_lakehouse_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.cluster import optimize_clustered
    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("int").alias("k"),
        F.col("l_partkey").alias("p"),
        F.col("l_quantity").alias("qty"),
    )
    scratch = tempfile.mkdtemp(prefix="p5_life_")
    try:
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            li.where(F.col("k") % 3 < 2).repartition(3),
            stat_columns=["k", "p"],
        )
        tbl.set_clustering_columns(["k", "p"])
        m1 = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=4)
        assert m1["candidate_files"] == 3
        tbl.widen_column("k", "long")
        tbl.append(
            li.where(F.col("k") % 3 == 2)
            .select((F.col("k") + _P5_SHIFT).alias("k"), "p", "qty")
            .coalesce(1)
        )
        delete_where_dv(tbl, "k % 10 = 7")
        m2 = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=4)
        # only the append rewrites; the widened-key cube stays put
        assert m2["candidate_files"] == 1 and m2["stable_zcubes"] == 1
        tbl.log.write_checkpoint(v2=True)
        fresh = DeltaTable(spark, tbl.table_path)
        out = (
            fresh.to_df()
            .groupBy((F.col("k") % 4).alias("k_bucket"))
            .agg(
                F.count("*").alias("n_items"),
                F.max("k").alias("max_k"),
                F.sum(F.col("qty").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_P5_SQL = f"""
WITH lifecycle AS (
  SELECT CAST(l_orderkey AS BIGINT) AS k, l_quantity AS qty
  FROM lineitem WHERE l_orderkey % 3 < 2
  UNION ALL
  SELECT CAST(l_orderkey AS BIGINT) + {_P5_SHIFT}, l_quantity
  FROM lineitem WHERE l_orderkey % 3 = 2
)
SELECT k % 4 AS k_bucket,
       count(*) AS n_items,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lifecycle
WHERE k % 10 <> 7
GROUP BY 1
"""


def q_p4_multimodal_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.graph import connected_components
    from delta_sorter_spark.operators.multimodal import phash_near_dup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % M5_VARIANT_MOD == 0).select(
            (F.col("doc_id") + M5_VARIANT_SHIFT).alias("doc_id"), "text"
        )
    )
    assets = corpus.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    pairs = phash_near_dup(
        assets, "doc_id", "payload", max_hamming=M5_MAX_HAMMING
    ).select("id_a", "id_b")
    comps = connected_components(
        corpus.select("doc_id"), pairs, node_col="doc_id"
    )
    sized = corpus.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("nb"),
    )
    per = (
        comps.join(sized, comps["id"] == sized["doc_id"])
        .groupBy("component")
        .agg(
            F.count("*").cast("int").alias("cluster_size"),
            F.sum("nb").alias("tot"),
        )
        .where(F.col("cluster_size") >= 2)
    )
    # component = min reachable id = the kept asset; bytes saved = the
    # cluster's payload total minus the kept copy
    return (
        per.join(
            sized.select(
                F.col("doc_id").alias("component"),
                F.col("nb").alias("kept_nb"),
            ),
            "component",
        )
        .select(
            F.col("component").alias("kept_id"),
            "cluster_size",
            (F.col("tot") - F.col("kept_nb")).cast("bigint").alias(
                "dropped_bytes"
            ),
        )
    )


_P4_SQL = f"""
WITH RECURSIVE {_m5_ctes()},
bidir AS (
  SELECT id_a AS a, id_b AS b FROM phpairs
  UNION
  SELECT id_b AS a, id_a AS b FROM phpairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.src, e.b FROM reach r JOIN bidir e ON r.dst = e.a
),
comps AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
sized AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb FROM corpus),
per AS (
  SELECT c.component, CAST(count(*) AS INT) AS cluster_size,
         sum(s.nb) AS tot
  FROM comps c JOIN sized s USING (doc_id)
  GROUP BY c.component
)
SELECT p.component AS kept_id, p.cluster_size,
       CAST(p.tot - ks.nb AS BIGINT) AS dropped_bytes
FROM per p JOIN sized ks ON ks.doc_id = p.component
WHERE p.cluster_size >= 2
"""


# ---------------------------------------------------------------------------
# A43: per-source boilerplate report — where the repeated-span dedup bites.
# The curation dashboard number: which ingestion sources ship shared
# boilerplate, how many docs are affected, how many tokens it costs.
# ---------------------------------------------------------------------------


def q_a43_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import repeated_ngram_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=SPAN_N, min_docs=SPAN_MIN_DOCS)
    return (
        spans.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("docs_affected"),
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum("span_tokens").cast("bigint").alias("span_tokens"),
        )
    )


_A43_SQL = f"""
WITH {_span_cte()}
SELECT d2.source,
       CAST(count(DISTINCT s.doc_id) AS BIGINT) AS docs_affected,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(s.span_tokens) AS BIGINT) AS span_tokens
FROM spans s JOIN documents d2 ON d2.doc_id = s.doc_id
GROUP BY d2.source
"""


# ---------------------------------------------------------------------------
# A44: snapshot diff — row-level insert/update/delete classification between
# two relations (corpus-rebuild regression gate).  The Spark side computes
# the diff generically (full outer join + per-side content digests); the
# oracle states the ground truth of this query's constructed drift.
# ---------------------------------------------------------------------------

DIFF_MOD = 400


def q_a44_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.diff import diff_snapshots

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % DIFF_MOD != 0)
    new = orders.where(F.col("o_orderkey") % DIFF_MOD != 1).withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % DIFF_MOD == 2,
            F.concat(F.col("o_orderpriority"), F.lit("-REVISED")),
        ).otherwise(F.col("o_orderpriority")),
    )
    return diff_snapshots(old, new, ["o_orderkey"])


_A44_SQL = f"""
SELECT o_orderkey, 'insert' AS change FROM orders WHERE o_orderkey % {DIFF_MOD} = 0
UNION ALL
SELECT o_orderkey, 'delete' FROM orders WHERE o_orderkey % {DIFF_MOD} = 1
UNION ALL
SELECT o_orderkey, 'update' FROM orders WHERE o_orderkey % {DIFF_MOD} = 2
"""


# ---------------------------------------------------------------------------
# A45: SCD-2 validity intervals — change log -> dimension history (each row
# valid until the key's next change; open-ended current version)
# ---------------------------------------------------------------------------


def q_a45_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.events_analytics import validity_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    out = validity_intervals(ev, ["user_id"], ["ts", "event_id"])
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format("valid_to_ts", _TS_FMT_SPARK).alias("valid_to"),
        F.col("is_current").cast("boolean").alias("is_current"),
    )


_A45_SQL = f"""
SELECT user_id, event_id,
       strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{_TS_FMT_DUCK}') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM events
"""


# ---------------------------------------------------------------------------
# A46: SCD-2 compaction — collapse consecutive identical attribute rows into
# one validity interval per run (gaps-and-islands; the no-op-version cleanup
# a CDC re-sync feed needs before the history table is usable)
# ---------------------------------------------------------------------------


def q_a46_scd2_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.events_analytics import scd2_compress

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    out = scd2_compress(ev, ["user_id"], ["event_type"], ["ts", "event_id"])
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from_ts", _TS_FMT_SPARK).alias("valid_from"),
        F.col("valid_from_event_id").cast("long").alias("from_event_id"),
        F.date_format("valid_to_ts", _TS_FMT_SPARK).alias("valid_to"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("is_current").cast("boolean").alias("is_current"),
    )


_A46_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_attr
  FROM events
),
seg AS (
  SELECT *,
         SUM(CASE WHEN prev_attr IS DISTINCT FROM event_type THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM ordered
),
runs AS (
  SELECT user_id, event_type, seg_id,
         arg_min(ts, rn) AS from_ts,
         arg_min(event_id, rn) AS from_event_id,
         min(rn) AS first_rn,
         count(*) AS n_rows
  FROM seg GROUP BY user_id, event_type, seg_id
)
SELECT user_id, event_type,
       strftime(from_ts, '{_TS_FMT_DUCK}') AS valid_from,
       CAST(from_event_id AS BIGINT) AS from_event_id,
       strftime(lead(from_ts) OVER (PARTITION BY user_id ORDER BY first_rn),
                '{_TS_FMT_DUCK}') AS valid_to,
       CAST(n_rows AS BIGINT) AS n_rows,
       lead(first_rn) OVER (PARTITION BY user_id ORDER BY first_rn) IS NULL
         AS is_current
FROM runs
"""


# ---------------------------------------------------------------------------
# E63: hybrid retrieval — reciprocal-rank fusion of BM25 lexical top-k and
# exact dense top-k (retrieval.rrf_fuse), the RAG-serving ranking shape.
# Queries reuse the e45 derivation (every 37th doc's first 6 words) on the
# lexical side and the same ids' embeddings on the dense side.
# ---------------------------------------------------------------------------

RRF_K = 60


def q_e63_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.retrieval import bm25_topk, rrf_fuse
    from delta_sorter_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qtext = docs.where(F.col("doc_id") % BM25_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                1,
                BM25_QUERY_WORDS,
            ),
            " ",
        ).alias("qtext"),
    )
    lex = bm25_topk(
        docs, qtext, "doc_id", "text", "query_id", "qtext",
        k=BM25_TOPK, exclude_self=True,
    )
    qvec = emb.where(F.col("vec_id") % BM25_QUERY_MOD == 0)
    dense = brute_force_topk(
        emb, qvec, "vec_id", "embedding", "vec_id", "embedding", k=BM25_TOPK
    )
    return rrf_fuse(
        [
            lex.select("query_id", F.col("doc_id").alias("id"), "rank"),
            dense.select("query_id", "id", "rank"),
        ],
        "query_id",
        "id",
        k=BM25_TOPK,
        k_rrf=RRF_K,
    )


def _e63_sql() -> str:
    # lexical side: the e45 BM25 pipeline verbatim (same constants); dense
    # side: the e6 exact-cosine pipeline on the same query ids; fusion is
    # integer RRF (1e9 DIV (k_rrf + rank)) so the oracle matches bit-exact
    bm25_body = _E45_SQL.strip().removeprefix("WITH ")
    bm25_body = bm25_body[: bm25_body.rindex("SELECT query_id")].rstrip()
    return f"""
WITH {bm25_body},
lexr AS (
  SELECT query_id, doc_id AS id, rn AS r FROM ranked WHERE rn <= {BM25_TOPK}
),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id % {BM25_QUERY_MOD} = 0),
vscored AS (
  SELECT qv.query_id, e.vec_id AS id,
         {_DOT.format(a='qv.qe', b='e.embedding')}
           / (sqrt({_SSQ.format(a='qv.qe')}) * sqrt({_SSQ.format(a='e.embedding')}))
           AS cosine
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> qv.query_id
),
densr AS (
  SELECT query_id, id, r FROM (
    SELECT query_id, id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, id) AS r
    FROM vscored) WHERE r <= {BM25_TOPK}
),
contrib AS (
  SELECT query_id, id, 1000000000 // ({RRF_K} + r) AS c
  FROM (SELECT * FROM lexr UNION ALL SELECT * FROM densr)
),
fused AS (
  SELECT query_id, id, CAST(sum(c) AS BIGINT) AS rrf_score,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM contrib GROUP BY query_id, id
),
franked AS (
  SELECT query_id, id, rrf_score, n_lists,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, id) AS frn
  FROM fused
)
SELECT query_id, id, CAST(frn AS BIGINT) AS rank, rrf_score, n_lists
FROM franked WHERE frn <= {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# E64: exact heavy hitters over the token stream (sketches.heavy_hitters) —
# two-pass Misra-Gries: bounded-memory candidate summaries (k rows per
# partition shuffled, never the vocabulary), then exact counts restricted
# to candidates.  Output is deterministic (true heavy hitters + exact
# counts) even though the candidate set is partitioning-dependent, so the
# oracle is the plain exact GROUP BY the sketch avoids at scale.
# ---------------------------------------------------------------------------

HH_K = 30


def q_e64_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr("filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')")
        ).alias("tok")
    )
    return heavy_hitters(toks, "tok", k=HH_K)


_E64_SQL = f"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
    FROM documents)
  WHERE tok <> ''
),
counts AS (SELECT tok AS item, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok)
SELECT item, n FROM counts
WHERE n * {HH_K + 1} > (SELECT count(*) FROM toks)
"""


# ---------------------------------------------------------------------------
# E65: metadata-filtered exact vector search (similarity.filtered_topk) —
# per-label top-k; the filter turns the broadcast NLJ into a broadcast HASH
# join on the label key
# ---------------------------------------------------------------------------


def q_e65_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.similarity import filtered_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = filtered_topk(
        emb, queries, "vec_id", "embedding", "label",
        "vec_id", "embedding", k=TOPK,
    )
    return out.select(
        "query_id", "id", "rank", F.round("cosine", 6).alias("cosine")
    )


_E65_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label FROM embeddings
           WHERE vec_id % {QUERY_VEC_MOD} = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS id,
         {_DOT.format(a='q.qe', b='e.embedding')}
           / (sqrt({_SSQ.format(a='q.qe')}) * sqrt({_SSQ.format(a='e.embedding')}))
           AS cosine
  FROM embeddings e JOIN q ON e.label = q.label
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
  FROM scored
)
SELECT query_id, id, rn AS "rank", round(cosine, 6) AS cosine
FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# E66: LexRank-style document centrality (graph.pagerank over the similarity
# graph, Erkan & Radev 2004) — integer fixed-point power iteration, so the
# ITERATIVE distributed computation is hash-exact against a DuckDB oracle
# that replays the same three steps as chained CTEs.
# ---------------------------------------------------------------------------

CENTRALITY_THRESHOLD = 0.3
PR_ITERS = 3


def q_e66_doc_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.graph import pagerank

    docs = _doc_subset(spark, sf_dir, JACCARD_SUBSET_MOD)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=CENTRALITY_THRESHOLD
    ).select("id_a", "id_b")
    bidir = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    return pagerank(docs.select("doc_id"), bidir, node_col="doc_id", n_iters=PR_ITERS)


def _pr_iter_cte(k: int, scale: int, dp: int) -> str:
    """One DuckDB PageRank step: the exact integer recurrence of
    graph.pagerank (base + damped incoming + uniform dangling share)."""
    prev = f"r{k - 1}"
    return f"""r{k} AS (
  SELECT d0.doc_id AS id,
         CAST((({scale} * {100 - dp} // 100) // nn.n)
              + (({dp} * (COALESCE(inc.s, 0) + dang.dq // nn.n)) // 100)
              AS BIGINT) AS rq
  FROM d d0
  CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(sum(r.rq), 0) AS dq
              FROM {prev} r LEFT JOIN deg ON deg.a = r.id WHERE deg.a IS NULL) dang
  LEFT JOIN (SELECT e.b AS id, sum(r.rq // deg.dg) AS s
             FROM {prev} r JOIN deg ON deg.a = r.id JOIN bidir e ON e.a = r.id
             GROUP BY e.b) inc ON inc.id = d0.doc_id
)"""


def _e66_sql() -> str:
    from delta_sorter_spark.operators.graph import PR_SCALE

    iters = ",\n".join(_pr_iter_cte(k, PR_SCALE, 85) for k in range(1, PR_ITERS + 1))
    return f"""
WITH {_duckdb_shingle_cte(JACCARD_SUBSET_MOD)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {CENTRALITY_THRESHOLD}
),
bidir AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
deg AS (SELECT a, count(*) AS dg FROM bidir GROUP BY a),
nn AS (SELECT count(*) AS n FROM d),
r0 AS (SELECT doc_id AS id, CAST({PR_SCALE} // nn.n AS BIGINT) AS rq
       FROM d CROSS JOIN nn),
{iters}
SELECT id AS doc_id, rq AS rank_q FROM r{PR_ITERS}
"""


_E66_SQL = _e66_sql()


# ---------------------------------------------------------------------------
# E67: full BPE tokenizer training (textstats.train_bpe) — the iterative
# merge-learning loop, replayed for the oracle as BPE_MERGES chained CTE
# stages (the e62 k-means pattern): per stage, pair counts over the word
# table -> argmax by (count desc, left asc, right asc) -> greedy merge
# application.  The greedy left-to-right fold (Spark: F.aggregate carrying
# an (out, pending) struct) is expressed in DuckDB as a list_reduce whose
# string accumulator encodes ``out-tokens-chr(1)-joined || chr(2) || pend``
# — plain string replace can't replicate the fold (consumed boundaries
# block adjacent matches), a real accumulator can.  The suite additionally
# pins the operator against a pure-Python Sennrich reference
# (tests/test_property_extensions.py).  The oracle assumes all BPE_MERGES
# merges clear min_count=2, which holds on the fixed test corpus (top
# pair counts are in the hundreds).
# ---------------------------------------------------------------------------

BPE_MERGES = 8
_UNI_MAX_DOC_WORDS = 128  # word-soup docs cap at 99 words at every SF


def q_e67_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import train_bpe

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    return train_bpe(docs, "text", n_merges=BPE_MERGES, min_count=2)


def _e67_stages(carry_word: bool = False) -> list:
    """The BPE trainer's CTE chain (8 merge stages); ``carry_word`` keeps
    the word string alongside its token array so the e76 encode oracle can
    join documents back to their final segmentations — the merge selection
    itself is identical either way."""
    wc = "w, " if carry_word else ""
    stages = [f"""
wf AS (
  SELECT w, count(*) AS wn FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) WHERE w <> '' GROUP BY w
),
w0 AS (
  SELECT {wc}wn, list_append(regexp_extract_all(w, '.'), '</w>') AS toks FROM wf
)"""]
    for k in range(BPE_MERGES):
        stages.append(f"""
p{k} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(sum(wn) AS BIGINT) AS n
  FROM (
    SELECT wn,
      unnest(list_transform(list_slice(toks, 1, length(toks)-1),
                            (t, i) -> struct_pack(l := t, r := toks[i+1]))) AS pr
    FROM w{k}
  ) GROUP BY pr.l, pr.r
),
m{k} AS (SELECT l, r, n FROM p{k} ORDER BY n DESC, l ASC, r ASC LIMIT 1),
w{k + 1} AS (
  SELECT {wc}wn,
    list_filter(
      string_split(
        CASE WHEN split_part(acc, chr(2), 2) = ''
             THEN split_part(acc, chr(2), 1)
             ELSE split_part(acc, chr(2), 1) || chr(1) || split_part(acc, chr(2), 2)
        END, chr(1)),
      t -> t <> '') AS toks
  FROM (
    SELECT {wc}wn,
      list_reduce(
        list_prepend(chr(2), toks),
        (acc, x) -> CASE
          WHEN split_part(acc, chr(2), 2) = ''
            THEN split_part(acc, chr(2), 1) || chr(2) || x
          WHEN split_part(acc, chr(2), 2) = l AND x = r
            THEN split_part(acc, chr(2), 1) || chr(1) || l || r || chr(2)
          ELSE split_part(acc, chr(2), 1) || chr(1)
               || split_part(acc, chr(2), 2) || chr(2) || x
        END) AS acc
    FROM w{k} CROSS JOIN m{k}
  )
)""")
    return stages


def _e67_sql() -> str:
    final = "\nUNION ALL ".join(
        f'SELECT {k} AS merge_rank, l AS "left", r AS "right", n AS pair_count'
        f" FROM m{k}"
        for k in range(BPE_MERGES)
    )
    return "WITH " + ",".join(_e67_stages()) + "\n" + final


_E67_SQL = _e67_sql()


# ---------------------------------------------------------------------------
# E76: BPE ENCODE (operators/textstats.bpe_encode) — apply the trained
# merge table back to the training corpus, completing the BPE lifecycle
# (pair counts e61 -> train e67 -> encode e76) hash-checked end to end.
# The oracle chains the trainer replay with the word string carried, then
# joins documents back to their final segmentations.
# ---------------------------------------------------------------------------


def q_e76_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import bpe_encode, train_bpe

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(docs, "text", n_merges=BPE_MERGES, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    out = bpe_encode(docs, "doc_id", "text", merges)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.array_join("tokens", " ").alias("enc"),
    )


def _e76_sql() -> str:
    stages = _e67_stages(carry_word=True)
    stages.append(f"""
dwB AS (
  SELECT d.doc_id, r.i AS wpos, d.ws[CAST(r.i AS INT)] AS w
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS ws
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) d, range(1, {_UNI_MAX_DOC_WORDS}+1) r(i)
  WHERE r.i <= len(d.ws)
)""")
    return (
        "WITH " + ",".join(stages)
        + f"""
SELECT dw.doc_id,
       CAST(sum(len(s.toks)) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(s.toks ORDER BY dw.wpos)), ' ') AS enc
FROM dwB dw JOIN (SELECT w, toks FROM w{BPE_MERGES}) s USING (w)
GROUP BY dw.doc_id"""
    )


_E76_SQL = _e76_sql()


# ---------------------------------------------------------------------------
# E68: temperature-based domain rebalancing (sampling.temperature_mix) —
# p(domain) ∝ n^alpha with alpha in quarters, so the fractional power
# composes from IEEE correctly-rounded sqrt and the whole pipeline stays
# integer-exact for the oracle (weights -> budget shares -> ppm rates ->
# md5 row gate).
# ---------------------------------------------------------------------------

TEMP_BUDGET = 150
TEMP_SEED = "e68-temp"


def q_e68_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix(
        docs, "doc_id", "source", budget=TEMP_BUDGET, alpha_quarters=2,
        seed=TEMP_SEED,
    ).select("doc_id", "source", "rate_ppm")


def _e68_sql() -> str:
    gate = duckdb_md5_long_sql(f"CAST(doc_id AS VARCHAR) || '{TEMP_SEED}'")
    return f"""
WITH pd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
             CAST(floor(1000000 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS wppm
      FROM pd),
tot AS (SELECT CAST(sum(wppm) AS BIGINT) AS W FROM w),
rates AS (
  SELECT source,
         least(CAST(1000000 AS BIGINT),
               (({TEMP_BUDGET} * wppm) // W) * 1000000 // n_docs) AS rate_ppm
  FROM w CROSS JOIN tot
)
SELECT d.doc_id, d.source, r.rate_ppm
FROM documents d JOIN rates r ON d.source = r.source
WHERE {gate} % 1000000 < r.rate_ppm
"""


_E68_SQL = _e68_sql()


# ---------------------------------------------------------------------------
# E69/E70: line-level (paragraph) boilerplate dedup — the CCNet/RefinedWeb
# pipeline step (operators/dedup.repeated_lines / remove_repeated_lines).
# The synthetic documents are single-line word soup, so both sides first
# decorate them relationally with the boilerplate this operator exists to
# catch: a newsletter header on even doc_ids, a copyright footer on
# doc_id % 3 = 0.  Corpus-frequent normalized lines (>= LINE_MIN_DOCS
# docs, >= LINE_MIN_CHARS chars) are detected (e69) and removed in
# document order (e70) — including any whole-text bodies that repeat
# across the corpus' intentional duplicate documents, which is correct
# CCNet semantics (duplicate paragraphs go too).
# ---------------------------------------------------------------------------

LINE_MIN_DOCS = 3
LINE_MIN_CHARS = 4
_LINE_HEADER = "Subscribe To Our Newsletter Today"
_LINE_FOOTER = "Copyright 2024 Example Corp"


def _docs_with_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 2 == 0, F.lit(_LINE_HEADER)),
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_LINE_FOOTER)),
        ).alias("text"),
    )


_LINE_DOCS_CTE = f"""
docs AS (
  SELECT doc_id,
         concat_ws(chr(10),
                   CASE WHEN doc_id % 2 = 0
                        THEN '{_LINE_HEADER}' END,
                   text,
                   CASE WHEN doc_id % 3 = 0
                        THEN '{_LINE_FOOTER}' END) AS text
  FROM documents)
"""


# ---------------------------------------------------------------------------
# E72: corpus-overlap estimation via KMV sketches (operators/sketches.
# kmv_sketch / kmv_overlap) — the contamination screen that never joins the
# corpora: each side reduces to the k smallest distinct portable hashes and
# the Jaccard estimate is computed from the sketches alone.  Deterministic
# on the shared md5 family, so the oracle replicates every output integer
# bit-for-bit (unit tests pin the estimate's accuracy against exact).
# ---------------------------------------------------------------------------

KMV_K = 128
_KMV_A = "('src0', 'src1', 'src2', 'src3', 'src4')"
_KMV_B = "('src3', 'src4', 'src5', 'src6', 'src7')"


def q_e72_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sketches import kmv_overlap

    d = load_table(spark, sf_dir, "documents")
    a = d.where(f"source IN {_KMV_A}").select("text")
    b = d.where(f"source IN {_KMV_B}").select("text")
    return kmv_overlap(a, b, "text", k=KMV_K)


def _e72_sql() -> str:
    h = duckdb_md5_long_sql("concat(CAST(text AS VARCHAR), 'kmv')")
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM documents
            WHERE source IN {_KMV_A} AND text IS NOT NULL
            ORDER BY h LIMIT {KMV_K}),
hb AS (SELECT DISTINCT {h} AS h FROM documents
       WHERE source IN {_KMV_B} AND text IS NOT NULL
       ORDER BY h LIMIT {KMV_K}),
u AS (SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
      ORDER BY h LIMIT {KMV_K}),
m AS (SELECT u.h FROM u JOIN ha USING (h) JOIN hb USING (h))
SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS k_union,
       CAST((SELECT count(*) FROM m) AS BIGINT) AS matches,
       CAST(1000000 * (SELECT count(*) FROM m)
            // (SELECT count(*) FROM u) AS BIGINT) AS jaccard_ppm,
       (SELECT max(h) FROM u) AS kth_union_hash
"""


_E72_SQL = _e72_sql()


# ---------------------------------------------------------------------------
# E73: unigram-LM (SentencePiece-style) tokenizer training
# (textstats.train_unigram_lm) — the second classic subword family next to
# BPE (e67).  Viterbi hard-EM with integer parts-per-billion probabilities;
# the only floats are the DP's products of double(ppb)/1e9 factors in a
# defined order (IEEE multiply/divide are exactly rounded, so DuckDB
# replays them bit-for-bit — the e62/e66/e68 discipline; log is absent on
# purpose).  The oracle unrolls the per-word DP as chained CTE levels
# (one per prefix length, cumulative-union predecessor join, row_number
# (score DESC, l ASC) = the fold's strict-greater shortest-last-piece tie
# break) and the backtrack as chained walk steps.
# ---------------------------------------------------------------------------

UNI_VOCAB = 64
UNI_ITERS = 2
UNI_PIECE_LEN = 4
UNI_WORD_LEN = 16


def q_e73_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import train_unigram_lm

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    return train_unigram_lm(
        docs, "text", vocab_size=UNI_VOCAB, n_iters=UNI_ITERS,
        max_piece_len=UNI_PIECE_LEN, max_word_len=UNI_WORD_LEN,
    )


def _e73_ctes() -> list:
    """The unigram-LM trainer's full CTE chain (seed -> I EM rounds); the
    last CTE ``p{I}`` is the final piece table.  Shared verbatim by the
    e73 (train) and e75 (encode) oracles so the replayed trainer state is
    identical by construction."""
    V, I, L, W = UNI_VOCAB, UNI_ITERS, UNI_PIECE_LEN, UNI_WORD_LEN
    ctes = [f"""
wf AS MATERIALIZED (
  SELECT substr(w, 1, {W}) AS w, CAST(count(*) AS BIGINT) AS wn FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) WHERE w <> '' GROUP BY substr(w, 1, {W})
),
seed AS (
  SELECT piece, CAST(sum(wn) AS BIGINT) AS n FROM (
    SELECT wn, substr(w, i, l) AS piece
    FROM wf, range(1, {W}+1) r1(i), range(1, {L}+1) r2(l)
    WHERE i <= length(w) AND l <= least({L}, length(w) - i + 1)
  ) GROUP BY piece
),
v0 AS (
  SELECT piece, max(n) AS n FROM (
    SELECT piece, n FROM (SELECT piece, n FROM seed ORDER BY n DESC, piece ASC LIMIT {V})
    UNION ALL
    SELECT piece, n FROM seed WHERE length(piece) = 1
  ) GROUP BY piece
),
p0 AS (
  SELECT piece, n, greatest((n * 1000000000) // t, CAST(1 AS BIGINT)) AS ppb
  FROM v0 CROSS JOIN (SELECT CAST(sum(n) AS BIGINT) AS t FROM v0)
)"""]
    for k in range(I):
        ctes.append(f"""
sp{k} AS MATERIALIZED (
  SELECT s.w, s.wn, s.i, s.l, s.ende, s.pc, p.ppb
  FROM (
    SELECT wf.w, wf.wn, i, l, i + l - 1 AS ende, substr(wf.w, i, l) AS pc
    FROM wf, range(1, {W}+1) r1(i), range(1, {L}+1) r2(l)
    WHERE i <= length(wf.w) AND l <= least({L}, length(wf.w) - i + 1)
  ) s JOIN p{k} p ON p.piece = s.pc
),
ball{k}_0 AS (
  SELECT w, wn, 0 AS j, CAST(1.0 AS DOUBLE) AS score, -1 AS frm, '' AS pc
  FROM wf
)""")
        for j in range(1, W + 1):
            ctes.append(f"""
b{k}_{j} AS (
  SELECT w, wn, j, score, frm, pc FROM (
    SELECT s.w, s.wn, {j} AS j,
           b.score * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE)) AS score,
           s.i - 1 AS frm, s.pc,
           row_number() OVER (
             PARTITION BY s.w
             ORDER BY b.score * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE)) DESC,
                      s.l ASC
           ) AS rn
    FROM sp{k} s JOIN ball{k}_{j-1} b ON b.w = s.w AND b.j = s.i - 1
    WHERE s.ende = {j}
  ) WHERE rn = 1
),
ball{k}_{j} AS MATERIALIZED (
  SELECT * FROM ball{k}_{j-1} UNION ALL SELECT * FROM b{k}_{j}
)""")
        ctes.append(f"""
t{k}_0 AS (SELECT w, wn, length(w) AS pos FROM wf)""")
        for t in range(1, W + 1):
            ctes.append(f"""
e{k}_{t} AS (
  SELECT s.w, s.wn, b.pc, b.frm
  FROM t{k}_{t-1} s JOIN ball{k}_{W} b ON b.w = s.w AND b.j = s.pos
  WHERE s.pos > 0
),
t{k}_{t} AS (SELECT w, wn, frm AS pos FROM e{k}_{t})""")
        emits = " UNION ALL ".join(
            f"SELECT pc, wn FROM e{k}_{t}" for t in range(1, W + 1))
        ctes.append(f"""
cnt{k} AS (
  SELECT pc AS piece, CAST(sum(wn) AS BIGINT) AS n FROM ({emits}) GROUP BY pc
),
v{k + 1} AS (
  SELECT p.piece, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM p{k} p LEFT JOIN cnt{k} c ON c.piece = p.piece
  WHERE coalesce(c.n, 0) > 0 OR length(p.piece) = 1
),
p{k + 1} AS (
  SELECT piece, n, greatest((n * 1000000000) // t, CAST(1 AS BIGINT)) AS ppb
  FROM v{k + 1} CROSS JOIN (SELECT CAST(sum(n) AS BIGINT) AS t FROM v{k + 1})
)""")
    return ctes


def _e73_sql() -> str:
    return (
        "WITH " + ",".join(_e73_ctes())
        + f"\nSELECT piece, n, ppb AS prob_ppb FROM p{UNI_ITERS}"
    )


_E73_SQL = _e73_sql()


# ---------------------------------------------------------------------------
# E75: unigram-LM ENCODE (operators/textstats.unigram_encode) — apply the
# trained piece table back to the training corpus.  The oracle chains the
# full e73 trainer replay, then one more unrolled Viterbi pass under the
# final probabilities plus the per-document reassembly — so the whole
# tokenizer lifecycle (train -> encode) is hash-checked end to end.
# Single-char spans missing from the table fall back to the unk piece at
# ppb 1 (never hit here: single chars are never pruned from the vocab).
# ---------------------------------------------------------------------------

def q_e75_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import (
        train_unigram_lm,
        unigram_encode,
    )

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    pieces = train_unigram_lm(
        docs, "text", vocab_size=UNI_VOCAB, n_iters=UNI_ITERS,
        max_piece_len=UNI_PIECE_LEN, max_word_len=UNI_WORD_LEN,
    )
    out = unigram_encode(
        docs, "doc_id", "text", pieces.select("piece", "prob_ppb"),
        max_word_len=UNI_WORD_LEN,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_pieces",
        F.array_join("pieces", " ").alias("enc"),
    )


def _e75_sql() -> str:
    I, L, W = UNI_ITERS, UNI_PIECE_LEN, UNI_WORD_LEN
    ctes = list(_e73_ctes())
    # encode-pass spans under the FINAL piece table: multi-char spans must
    # match a piece (inner-join semantics); single-char spans keep an unk
    # fallback at ppb 1 — mirroring unigram_encode's span construction
    ctes.append(f"""
spE AS MATERIALIZED (
  SELECT s.w, s.i, s.l, s.ende,
         CASE WHEN p.piece IS NULL THEN '<unk>' ELSE s.pc END AS pc,
         coalesce(p.ppb, CAST(1 AS BIGINT)) AS ppb
  FROM (
    SELECT wf.w, i, l, i + l - 1 AS ende, substr(wf.w, i, l) AS pc
    FROM wf, range(1, {W}+1) r1(i), range(1, {L}+1) r2(l)
    WHERE i <= length(wf.w) AND l <= least({L}, length(wf.w) - i + 1)
  ) s LEFT JOIN p{I} p ON p.piece = s.pc
  WHERE s.l = 1 OR p.piece IS NOT NULL
),
ballE_0 AS (
  SELECT w, 0 AS j, CAST(1.0 AS DOUBLE) AS score, -1 AS frm, '' AS pc
  FROM wf
)""")
    for j in range(1, W + 1):
        ctes.append(f"""
bE_{j} AS (
  SELECT w, j, score, frm, pc FROM (
    SELECT s.w, {j} AS j,
           b.score * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE)) AS score,
           s.i - 1 AS frm, s.pc,
           row_number() OVER (
             PARTITION BY s.w
             ORDER BY b.score * (CAST(s.ppb AS DOUBLE) / CAST(1000000000 AS DOUBLE)) DESC,
                      s.l ASC
           ) AS rn
    FROM spE s JOIN ballE_{j-1} b ON b.w = s.w AND b.j = s.i - 1
    WHERE s.ende = {j}
  ) WHERE rn = 1
),
ballE_{j} AS MATERIALIZED (
  SELECT * FROM ballE_{j-1} UNION ALL SELECT * FROM bE_{j}
)""")
    ctes.append(f"""
tE_0 AS (SELECT w, length(w) AS pos FROM wf)""")
    for t in range(1, W + 1):
        ctes.append(f"""
eE_{t} AS (
  SELECT s.w, {t} AS t, b.pc, b.frm
  FROM tE_{t-1} s JOIN ballE_{W} b ON b.w = s.w AND b.j = s.pos
  WHERE s.pos > 0
),
tE_{t} AS (SELECT w, frm AS pos FROM eE_{t})""")
    emits = " UNION ALL ".join(
        f"SELECT w, t, pc FROM eE_{t}" for t in range(1, W + 1)
    )
    ctes.append(f"""
segE AS MATERIALIZED (
  SELECT w, list(pc ORDER BY t DESC) AS wpcs FROM ({emits}) GROUP BY w
),
dwE AS (
  SELECT d.doc_id, r.i AS wpos, substr(d.ws[CAST(r.i AS INT)], 1, {W}) AS w
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS ws
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) d, range(1, {_UNI_MAX_DOC_WORDS}+1) r(i)
  WHERE r.i <= len(d.ws)
)""")
    return (
        "WITH " + ",".join(ctes)
        + """
SELECT dw.doc_id,
       CAST(sum(len(s.wpcs)) AS BIGINT) AS n_pieces,
       array_to_string(flatten(list(s.wpcs ORDER BY dw.wpos)), ' ') AS enc
FROM dwE dw JOIN segE s USING (w)
GROUP BY dw.doc_id"""
    )


_E75_SQL = _e75_sql()


# ---------------------------------------------------------------------------
# E74: DSIR importance weights (operators/textstats.dsir_weights) — Data
# Selection via Importance Resampling (Xie et al. 2023): hashed-bigram
# likelihood ratio of a target slice (English docs) vs the raw corpus,
# with the integer bit-length log surrogate so the iterative-free pipeline
# is hash-exact cross-engine.  Feed into weighted_sample (e53) to resample.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1 << 14


def q_e74_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_weights(
        docs, "doc_id", "text", "lang = 'en'", n=2, num_buckets=DSIR_BUCKETS
    )
    return out.select(
        "doc_id", "n_ngrams", "dsir_bits",
        F.round("avg_bits", 6).alias("avg_bits"),
    )


_E74_SQL = f"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS t,
         string_split_regex(lower(trim(text)), '\\s+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, t,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS g
  FROM toks
),
bk AS (
  SELECT doc_id, t, {duckdb_md5_long_sql('g')} % {DSIR_BUCKETS} AS b
  FROM grams WHERE g <> ''
),
bu AS (
  SELECT b, (length(bin(CAST(count(*) FILTER (t) AS BIGINT) + 1)) - 1)
          - (length(bin(CAST(count(*) AS BIGINT) + 1)) - 1) AS w
  FROM bk GROUP BY b
)
SELECT bk.doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(sum(w) AS BIGINT) AS dsir_bits,
       round(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_bits
FROM bk JOIN bu USING (b)
GROUP BY bk.doc_id
"""


# ---------------------------------------------------------------------------
# E71: URL canonicalization + dedup-by-URL (operators/textstats.canonical_url
# / url_dedup_stats) — the crawl-pipeline key-normalization step.  The corpus
# has no URL column, so one is synthesized relationally with every mess the
# canonicalizer must undo (mixed case, www., :443, trailing slash, utm_*
# params, fragments, param-order variants); the ORACLE states the expected
# canonical form analytically from the generation formula, so any rule the
# operator gets wrong is a hash mismatch, not a shared bug.
# ---------------------------------------------------------------------------


def q_e71_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import url_dedup_stats

    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(
            F.when(k % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
                F.lit("https://")
            ),
            F.col("source"),
            F.lit(".com"),
            F.when(k % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/articles/"),
            (k % 40).cast("string"),
            F.when(k % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(
                k % 10 == 7, F.lit("?utm_campaign=x")  # query empties out
            )
            .when(
                k % 2 == 0,
                F.concat(
                    F.lit("?utm_source=feed&id="), (k % 5).cast("string")
                ),
            )
            .otherwise(F.concat(F.lit("?id="), (k % 5).cast("string"))),
            F.when(k % 5 == 0, F.lit("#top")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_dedup_stats(urls, "doc_id", "url")


_E71_SQL = """
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '.com/articles/'
         || CAST(doc_id % 40 AS VARCHAR)
         || CASE WHEN doc_id % 10 = 7 THEN ''
                 ELSE '?id=' || CAST(doc_id % 5 AS VARCHAR) END
           AS canonical_url
  FROM documents
)
SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keep_id
FROM urls GROUP BY canonical_url
"""


def q_e69_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import repeated_lines

    docs = _docs_with_boilerplate(spark, sf_dir)
    return repeated_lines(
        docs, "doc_id", "text",
        min_docs=LINE_MIN_DOCS, min_chars=LINE_MIN_CHARS,
    )


_E69_SQL = f"""
WITH {_LINE_DOCS_CTE},
d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
lines AS (
  SELECT doc_id, lower(trim(ls[i])) AS norm
  FROM d, unnest(generate_series(1, len(ls))) AS t(i)
)
SELECT norm AS line, count(DISTINCT doc_id) AS n_docs
FROM lines
WHERE norm <> '' AND length(norm) >= {LINE_MIN_CHARS}
GROUP BY norm
HAVING count(DISTINCT doc_id) >= {LINE_MIN_DOCS}
"""


def q_e70_remove_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.dedup import remove_repeated_lines

    docs = _docs_with_boilerplate(spark, sf_dir)
    out = remove_repeated_lines(
        docs, "doc_id", "text",
        min_docs=LINE_MIN_DOCS, min_chars=LINE_MIN_CHARS,
    )
    # limit the hashed payload: only docs that actually changed
    return out.where(F.col("lines_removed") > 0).select(
        "doc_id", "text", "lines_removed"
    )


_E70_SQL = f"""
WITH {_LINE_DOCS_CTE},
d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
lines AS (
  SELECT doc_id, i - 1 AS pos, ls[i] AS line, lower(trim(ls[i])) AS norm
  FROM d, unnest(generate_series(1, len(ls))) AS t(i)
),
freq AS (
  SELECT norm FROM lines
  WHERE norm <> '' AND length(norm) >= {LINE_MIN_CHARS}
  GROUP BY norm HAVING count(DISTINCT doc_id) >= {LINE_MIN_DOCS}
),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l
  WHERE l.norm NOT IN (SELECT norm FROM freq)
)
SELECT d.doc_id,
       coalesce((SELECT string_agg(line, chr(10) ORDER BY pos)
                 FROM kept k WHERE k.doc_id = d.doc_id), '') AS text,
       CAST(len(ls) - (SELECT count(*) FROM kept k
                       WHERE k.doc_id = d.doc_id) AS BIGINT) AS lines_removed
FROM d
WHERE len(ls) > (SELECT count(*) FROM kept k WHERE k.doc_id = d.doc_id)
"""


# ---------------------------------------------------------------------------
# Q5: change data feed (operators/dml.table_changes — the Delta CDF shape,
# previously suite-only).  The query builds a REAL Delta table: v0 creates
# from an orders subset, v1 is a merge-on-read DV delete, v2 appends — then
# feeds (0, latest].  The oracle states the expected change rows
# relationally, so the protocol path (log replay + DV-delta positions) is
# hash-checked end to end.  Result is eagerly pinned before the scratch
# table is removed.
# ---------------------------------------------------------------------------


def q_q5_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where_dv, table_changes
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q5_cdf_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % CDF_MOD < 8),
        )
        v0 = tbl.log.latest_version()                       # post-create
        delete_where_dv(tbl, f"o_orderkey % {CDF_MOD} = 3")       # v0 + 1
        tbl.append(orders.where(F.col("o_orderkey") % CDF_MOD == 8))  # v0 + 2
        out = table_changes(tbl, v0).select(
            "o_orderkey",
            "_change_type",
            (F.col("_commit_version") - v0).cast("bigint").alias("change_step"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q5_SQL = f"""
SELECT o_orderkey, 'delete' AS _change_type, CAST(1 AS BIGINT) AS change_step
FROM orders WHERE o_orderkey % {CDF_MOD} = 3
UNION ALL
SELECT o_orderkey, 'insert' AS _change_type, CAST(2 AS BIGINT) AS change_step
FROM orders WHERE o_orderkey % {CDF_MOD} = 8
"""


# ---------------------------------------------------------------------------
# Q8: MERGE with WHEN NOT MATCHED BY SOURCE (dml.merge full-sync clauses) —
# one statement exercising matched-update, insert, by-source delete, and
# by-source update against a REAL scratch Delta table; the oracle states the
# surviving rows relationally.
# ---------------------------------------------------------------------------

SYNC_MOD = 10


def q_q8_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import merge
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q8_sync_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % SYNC_MOD < 5),
            stat_columns=["o_orderkey"],
        )
        src = orders.where(
            (F.col("o_orderkey") % SYNC_MOD).isin(3, 4, 5)
        ).withColumn("o_orderstatus", F.lit("SRC"))
        merge(
            tbl,
            src,
            ["o_orderkey"],
            when_matched_update={"o_orderstatus": "s.o_orderstatus"},
            when_not_matched_insert=True,
            when_not_matched_by_source_delete=f"t.o_orderkey % {SYNC_MOD} = 0",
            when_not_matched_by_source_update={"o_orderstatus": "'STALE'"},
        )
        return tbl.to_df().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q8_SQL = f"""
WITH tgt AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
             WHERE o_orderkey % {SYNC_MOD} < 5),
src AS (SELECT o_orderkey, o_custkey, 'SRC' AS o_orderstatus FROM orders
        WHERE o_orderkey % {SYNC_MOD} IN (3, 4, 5))
SELECT t.o_orderkey, t.o_custkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN 'SRC' ELSE 'STALE' END
         AS o_orderstatus
FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
WHERE NOT (s.o_orderkey IS NULL AND t.o_orderkey % {SYNC_MOD} = 0)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus FROM src
WHERE o_orderkey % {SYNC_MOD} = 5
"""


# ---------------------------------------------------------------------------
# Q9: UPDATE ... SET ... WHERE (dml.update_where) — the remaining DML verb:
# only hit files rewritten, SET expressions evaluated over the OLD row.
# ---------------------------------------------------------------------------

UPD_MOD = 4


def q_q9_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import update_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q9_upd_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % UPD_MOD < 3),
            stat_columns=["o_orderkey"],
        )
        update_where(
            tbl,
            f"o_orderkey % {UPD_MOD} = 1",
            {"o_orderstatus": "'X'", "o_custkey": "o_custkey + 1000000"},
        )
        return tbl.to_df().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q9_SQL = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % {UPD_MOD} = 1 THEN o_custkey + 1000000
            ELSE o_custkey END AS o_custkey,
       CASE WHEN o_orderkey % {UPD_MOD} = 1 THEN 'X'
            ELSE o_orderstatus END AS o_orderstatus
FROM orders WHERE o_orderkey % {UPD_MOD} < 3
"""


# ---------------------------------------------------------------------------
# Q10: merge-on-read UPDATE (dml.update_where_dv) — DV positions + appended
# values in ONE commit, composed with a PRIOR DV delete overlapping the
# update predicate so the oracle also pins the no-resurrection rule
# (already-deleted rows must not come back as updated copies).
# ---------------------------------------------------------------------------


def q_q10_update_where_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where_dv, update_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q10_mor_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % UPD_MOD < 3),
            stat_columns=["o_orderkey"],
        )
        delete_where_dv(tbl, "o_orderkey % 8 = 5")  # overlaps the update pred
        update_where_dv(
            DeltaTable(spark, tbl.table_path),
            f"o_orderkey % {UPD_MOD} = 1",
            {"o_orderstatus": "'X'", "o_custkey": "o_custkey + 1000000"},
        )
        return (
            DeltaTable(spark, tbl.table_path).to_df().localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q10_SQL = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % {UPD_MOD} = 1 THEN o_custkey + 1000000
            ELSE o_custkey END AS o_custkey,
       CASE WHEN o_orderkey % {UPD_MOD} = 1 THEN 'X'
            ELSE o_orderstatus END AS o_orderstatus
FROM orders WHERE o_orderkey % {UPD_MOD} < 3 AND o_orderkey % 8 <> 5
"""


# ---------------------------------------------------------------------------
# Q11: merge-on-read MERGE (dml.merge_dv) — changed rows' positions into
# deletion vectors + updated/inserted values appended, one atomic commit;
# untouched matched rows keep their bytes.  Same relational semantics as a
# copy-on-write MERGE, so the oracle is a plain SQL statement.
# ---------------------------------------------------------------------------


def q_q11_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import merge_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q11_mor_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % SYNC_MOD < 5),
            stat_columns=["o_orderkey"],
        )
        src = orders.where(
            (F.col("o_orderkey") % SYNC_MOD).isin(3, 4, 5)
        ).withColumn("o_orderstatus", F.lit("SRC"))
        merge_dv(
            tbl,
            src,
            ["o_orderkey"],
            when_matched_update={"o_orderstatus": "s.o_orderstatus"},
            when_matched_delete=f"s.o_orderkey % {SYNC_MOD} = 4",
            when_not_matched_insert=True,
        )
        return (
            DeltaTable(spark, tbl.table_path).to_df().localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q11_SQL = f"""
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % {SYNC_MOD} = 3 THEN 'SRC'
            ELSE o_orderstatus END AS o_orderstatus
FROM orders
WHERE o_orderkey % {SYNC_MOD} < 5 AND o_orderkey % {SYNC_MOD} <> 4
UNION ALL
SELECT o_orderkey, o_custkey, 'SRC' AS o_orderstatus FROM orders
WHERE o_orderkey % {SYNC_MOD} = 5
"""


# ---------------------------------------------------------------------------
# Q12: stats-based file skipping (functions/skipping.py) — zone-map read
# path.  A range-clustered scratch Delta table is queried through
# to_df(where=...), which prunes files whose min/max stats exclude the
# predicate BEFORE any scan task is scheduled, then re-applies the predicate
# exactly.  Transparent by construction, so the oracle is the plain
# relational statement; the pruning itself is pinned by
# tests/test_skipping.py (file-count assertions + DuckDB soundness property).
# ---------------------------------------------------------------------------

# key range present at every test SF (sf0.001's lineitem reaches ~6000
# orderkeys, so a low range keeps the query non-empty everywhere)
SKIP_LO, SKIP_HI = 500, 1500


def q_q12_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    scratch = tempfile.mkdtemp(prefix="q12_skip_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            li.repartitionByRange(16, "l_orderkey")
            .sortWithinPartitions("l_orderkey"),
            stat_columns=["l_orderkey"],
        )
        out = tbl.to_df(
            where=(
                f"l_orderkey BETWEEN {SKIP_LO} AND {SKIP_HI}"
                " AND l_quantity >= 30"
            )
        ).select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q12_SQL = f"""
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
FROM lineitem
WHERE l_orderkey BETWEEN {SKIP_LO} AND {SKIP_HI} AND l_quantity >= 30
"""


# ---------------------------------------------------------------------------
# Q13: metadata-only aggregates — count(*)/min/max served from log stats
# with ZERO scan tasks (DeltaTable.stats_count / stats_min_max).  The count
# stays exact across a merge-on-read delete (numRecords minus DV
# cardinality); min/max come from the pre-delete snapshot (a DV'd file may
# have lost its extremum, so the live version correctly REFUSES the fast
# answer — pinned by tests/test_skipping.py).  The oracle restates both
# relationally.
# ---------------------------------------------------------------------------

STATSAGG_MOD = 10


def q_q13_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    scratch = tempfile.mkdtemp(prefix="q13_agg_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey"),
            stat_columns=["o_orderkey", "o_orderdate"],
        )
        v0 = tbl.log.latest_version()
        delete_where_dv(tbl, f"o_orderkey % {STATSAGG_MOD} = 3")
        n_live = tbl.stats_count()
        n_before = tbl.stats_count(version=v0)
        klo, khi = tbl.stats_min_max("o_orderkey", version=v0)
        dlo, dhi = tbl.stats_min_max("o_orderdate", version=v0)
        return local_df(
            spark,
            [(n_live, n_before, klo, khi, str(dlo), str(dhi))],
            "n_live long, n_before long, min_key long, max_key long,"
            " min_date string, max_date string",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q13_SQL = f"""
SELECT (SELECT count(*) FROM orders WHERE o_orderkey % {STATSAGG_MOD} <> 3)
         AS n_live,
       count(*) AS n_before,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key,
       CAST(min(o_orderdate) AS VARCHAR) AS min_date,
       CAST(max(o_orderdate) AS VARCHAR) AS max_date
FROM orders
"""


# ---------------------------------------------------------------------------
# Q14: Bloom-index point lookup (operators/bloom_index.py).  The table is
# clustered by l_shipdate, so an equality probe on l_orderkey scatters
# across every file and zone maps prune nothing; the per-file Bloom index
# proves the keys absent from most files and the read scans only the hit
# files (the skipping itself is pinned by tests/test_bloom_index.py — the
# oracle checks the rows are exactly right anyway).
# ---------------------------------------------------------------------------

BLOOM_KEYS = (7, 311, 1234)


def q_q14_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.bloom_index import build_bloom_index
    from delta_sorter_spark.sources.delta_table import DeltaTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )
    scratch = tempfile.mkdtemp(prefix="q14_bloom_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            li.repartitionByRange(16, "l_shipdate")
            .sortWithinPartitions("l_shipdate"),
            stat_columns=["l_shipdate"],
        )
        build_bloom_index(tbl, "l_orderkey")
        keys = ", ".join(str(k) for k in BLOOM_KEYS)
        out = tbl.to_df(where=f"l_orderkey IN ({keys})").select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q14_SQL = f"""
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
FROM lineitem
WHERE l_orderkey IN ({", ".join(str(k) for k in BLOOM_KEYS)})
"""


# ---------------------------------------------------------------------------
# Q6: RESTORE TO VERSION AS OF (operators/dml.restore) — metadata-only
# time-travel restore, hash-checked through the exact scenario that found
# the DV-restore bug: create, merge-on-read DV delete, append, then
# restore to the post-create version.  The read-back must equal the
# ORIGINAL subset — the appended file tombstoned AND the deletion vector
# cleared (same-path re-Add replaces the DV in log replay).
# ---------------------------------------------------------------------------


def q_q6_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where_dv, restore
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q6_restore_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % CDF_MOD < 8),
        )
        v0 = tbl.log.latest_version()
        delete_where_dv(tbl, f"o_orderkey % {CDF_MOD} = 3")
        tbl.append(orders.where(F.col("o_orderkey") % CDF_MOD == 8))
        restore(tbl, v0)
        return tbl.to_df().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q6_SQL = f"""
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % {CDF_MOD} < 8
"""


# ---------------------------------------------------------------------------
# Q7: generated partition column (delta.generationExpression) — the derived
# year partitions the table; the append OMITS the column and the engine
# computes it from the stored expression.  The read-back is hash-checked, so
# generation-at-create, expression round-trip through schemaString metadata,
# and generation-on-append are all under the driver gate.
# ---------------------------------------------------------------------------


def q_q7_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    scratch = tempfile.mkdtemp(prefix="q7_gen_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % CDF_MOD < 8),
            partition_columns=["o_year"],
            generated_columns={
                "o_year": ("string", "CAST(year(o_orderdate) AS STRING)")
            },
        )
        # writer omits o_year -> computed from the logged expression
        tbl.append(orders.where(F.col("o_orderkey") % CDF_MOD == 8))
        out = tbl.to_df().select(
            "o_orderkey",
            F.date_format("o_orderdate", _TS_FMT_SPARK).alias("o_orderdate"),
            "o_year",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q7_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
       CAST(year(o_orderdate) AS VARCHAR) AS o_year
FROM orders WHERE o_orderkey % {CDF_MOD} < 8 OR o_orderkey % {CDF_MOD} = 8
"""


# ---------------------------------------------------------------------------
# Q15: CHECK constraints (delta.constraints.<name>) — protocol-convention
# table property, enforced on every data-changing write path (append and
# all DML verbs).  The query commits a constraint, fires one VIOLATING
# update and one VIOLATING append (both must reject atomically — no
# partial commit), then applies a passing update; the hash check proves
# rejected statements left zero trace while the accepted one landed.
# ---------------------------------------------------------------------------


def q_q15_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import update_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q15_chk_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % CDF_MOD < 8),
            stat_columns=["o_orderkey"],
        )
        tbl.add_check_constraint("price_pos", "o_totalprice > 0")
        try:  # violating UPDATE: must reject without committing anything
            update_where(
                tbl, f"o_orderkey % {CDF_MOD} = 3", {"o_totalprice": "-1.0"}
            )
            raise AssertionError("constraint violation not rejected")
        except ValueError:
            pass
        try:  # violating append: same
            tbl.append(
                spark.createDataFrame(
                    [(1, -5.0)], "o_orderkey long, o_totalprice double"
                )
            )
            raise AssertionError("constraint violation not rejected")
        except ValueError:
            pass
        update_where(  # passing UPDATE applies
            tbl, f"o_orderkey % {CDF_MOD} = 5",
            {"o_totalprice": "o_totalprice + 10.0"},
        )
        return tbl.to_df().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q15_SQL = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % {CDF_MOD} = 5 THEN o_totalprice + 10.0
            ELSE o_totalprice END AS o_totalprice
FROM orders WHERE o_orderkey % {CDF_MOD} < 8
"""


# ---------------------------------------------------------------------------
# Q16: row tracking (rowTracking + domainMetadata writer features) — stable
# row ids across DML and compaction.  The scratch table is ONE sorted file,
# so the backfill's baseRowId+position ids equal the o_orderkey rank and
# the whole flow is deterministic: enable -> copy-on-write DELETE (survivor
# ids keep) -> DV UPDATE (id keeps, version bumps) -> strict compaction
# (layout reshuffles, materialized ids survive).  The oracle recomputes the
# ids as a rank over the ORIGINAL subset, proving end-to-end stability.
# ---------------------------------------------------------------------------


def q_q16_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.api import compact
    from delta_sorter_spark.operators.dml import delete_where, update_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q16_rt_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % CDF_MOD < 8)
            .orderBy("o_orderkey")
            .coalesce(1),
            stat_columns=["o_orderkey"],
        )
        tbl.enable_row_tracking()
        delete_where(tbl, f"o_orderkey % {CDF_MOD} = 3")
        update_where_dv(
            tbl, f"o_orderkey % {CDF_MOD} = 5", {"o_orderstatus": "'U'"}
        )
        compact(
            tbl.table_path, sort_columns=["o_orderstatus", "o_orderkey"],
            spark=spark, repartition_by_sort_key=True,
        )
        out = DeltaTable(spark, tbl.table_path).to_df_with_row_ids().select(
            "o_orderkey", "o_orderstatus", "_row_id"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q16_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS _row_id
  FROM orders WHERE o_orderkey % {CDF_MOD} < 8
)
SELECT o_orderkey,
       CASE WHEN o_orderkey % {CDF_MOD} = 5 THEN 'U' ELSE o_orderstatus END
         AS o_orderstatus,
       _row_id
FROM base WHERE o_orderkey % {CDF_MOD} <> 3
"""


# ---------------------------------------------------------------------------
# Q17: identity columns (GENERATED ALWAYS AS IDENTITY) — engine-side
# allocation with no global coordination, so per-row VALUES are not
# deterministic (Delta's contract allows gaps); what IS deterministic is the
# contract itself, which the query verifies for real and returns as one
# aggregate row: every id unique, on the start+k*step grid, at-or-above
# start; a second append allocates strictly above the first commit's ids
# (the high watermark advanced with the data); and the stored watermark
# covers the table max.  The oracle states the guaranteed outcome.
# ---------------------------------------------------------------------------


def q_q17_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    scratch = tempfile.mkdtemp(prefix="q17_id_")
    try:
        mod = F.col("o_orderkey") % CDF_MOD
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            orders.where(mod < 4),
            identity_columns={"row_sk": (100, 3)},
        )
        batch1_max = tbl.to_df().agg(F.max("row_sk")).collect()[0][0]
        tbl.append(orders.where((mod >= 4) & (mod < 8)))
        tbl = DeltaTable(spark, tbl.table_path)
        hwm = tbl._identity_fields(tbl.metadata.data_schema)["row_sk"][2]
        out = tbl.to_df().agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.countDistinct("row_sk") == F.count(F.lit(1))).alias(
                "ids_unique"
            ),
            F.bool_and(
                ((F.col("row_sk") - 100) % 3 == 0) & (F.col("row_sk") >= 100)
            ).alias("on_grid"),
            (
                F.min(
                    F.when(F.col("o_orderkey") % CDF_MOD >= 4, F.col("row_sk"))
                )
                > F.lit(int(batch1_max))
            ).alias("batches_ordered"),
            (F.lit(int(hwm)) >= F.max("row_sk")).alias("hwm_covers_max"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q17_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS ids_unique,
       TRUE AS on_grid,
       TRUE AS batches_ordered,
       TRUE AS hwm_covers_max
FROM orders WHERE o_orderkey % {CDF_MOD} < 8
"""


# ---------------------------------------------------------------------------
# Q21: clustered tables (liquid clustering, operators/cluster.py) — the
# incremental successor of sorted compaction.  Lifecycle under one oracle:
# create unclustered -> CLUSTER BY (l_orderkey, l_partkey) -> OPTIMIZE
# (Hilbert ZCube) -> two appends -> OPTIMIZE again (touches ONLY the new
# files; the stable cube survives, asserted in-line because DuckDB cannot
# see file layout).  The returned rows are a two-column-pruned aggregate
# read over the final table, so any row lost/duplicated/mangled by the
# rewrites breaks the hash.  The oracle replays the same aggregate over
# the same input rows — clustering must be invisible to query results.
# ---------------------------------------------------------------------------


def q_q21_liquid_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.cluster import optimize_clustered
    from delta_sorter_spark.sources.delta_table import DeltaTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    scratch = tempfile.mkdtemp(prefix="q21_lc_")
    try:
        mod = F.col("l_orderkey") % 4
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            li.where(mod < 2).repartition(4),
            stat_columns=["l_orderkey", "l_partkey"],
        )
        tbl.set_clustering_columns(["l_orderkey", "l_partkey"])
        m1 = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=4)
        assert not m1["noop"] and m1["candidate_files"] == 4
        tbl.append(li.where(mod == 2).coalesce(1))
        tbl.append(li.where(mod == 3).coalesce(1))
        m2 = optimize_clustered(tbl, min_zcube_bytes=0, num_partitions=4)
        # incrementality: the second OPTIMIZE touches only the two appends
        assert m2["candidate_files"] == 2 and m2["stable_zcubes"] >= 1
        assert optimize_clustered(tbl, min_zcube_bytes=0)["noop"]
        lo = tbl.to_df().agg(F.max("l_partkey")).collect()[0][0] // 4
        out = (
            tbl.to_df(where=f"l_orderkey % 2 = 1 AND l_partkey <= {lo}")
            .groupBy((F.col("l_partkey") % 8).alias("pk_bucket"))
            .agg(
                F.count("*").alias("n_items"),
                # decimal sums: order-insensitive exact arithmetic, cast out
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q21_SQL = """
SELECT l_partkey % 8 AS pk_bucket,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_orderkey % 2 = 1
  AND l_partkey <= (SELECT max(l_partkey) FROM lineitem) // 4
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q22: type widening (DeltaTable.widen_column, protocol typeWidening) —
# create with o_orderkey as INT32, widen the log schema to BIGINT
# (metadata-only; existing files keep their narrower physical type), then
# append keys beyond the int32 range.  The returned aggregate spans OLD
# (int32-physical) and NEW (int64-physical) files through one widened
# schema, so a mis-cast, a dropped file, or stats-pruning gone wrong under
# the widened type all break the hash.  The oracle replays the widen as an
# explicit CAST + UNION.
# ---------------------------------------------------------------------------

_Q22_SHIFT = 3_000_000_000  # > int32 max: only representable post-widen


def q_q22_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q22_tw_")
    try:
        mod = F.col("o_orderkey") % 4
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            orders.where(mod < 2)
            .select(
                F.col("o_orderkey").cast("int").alias("o_orderkey"),
                "o_totalprice",
            )
            .repartition(2),
            stat_columns=["o_orderkey"],
        )
        tbl.widen_column("o_orderkey", "long")
        tbl.append(
            orders.where(mod >= 2)
            .select(
                (F.col("o_orderkey") + _Q22_SHIFT).alias("o_orderkey"),
                "o_totalprice",
            )
            .coalesce(1)
        )
        # stats written under int32 must still prune under the widened type
        assert len(tbl.files_matching(f"o_orderkey >= {_Q22_SHIFT}")) == 1
        out = (
            tbl.to_df()
            .groupBy((F.col("o_orderkey") % 7).alias("key_bucket"))
            .agg(
                F.count("*").alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q22_SQL = f"""
WITH widened AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 4 < 2
  UNION ALL
  SELECT CAST(o_orderkey AS BIGINT) + {_Q22_SHIFT}, o_totalprice
  FROM orders WHERE o_orderkey % 4 >= 2
)
SELECT o_orderkey % 7 AS key_bucket,
       count(*) AS n_orders,
       CAST(max(o_orderkey) AS BIGINT) AS max_key,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM widened
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q23: VARIANT columns (protocol variantType) — events.props (a JSON string
# in the source parquet) ingests as a real VARIANT column via parse_json,
# lands in Delta files (Spark-reader stats fallback: this pyarrow build
# cannot parse VARIANT footers), survives an append, and serves typed
# extraction with variant_get.  The oracle extracts the same path from the
# raw JSON strings with DuckDB's JSON functions — a binary-encoding bug,
# a dropped file, or a mis-typed extraction all break the hash.
# ---------------------------------------------------------------------------


def q_q23_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.parse_json("props").alias("props")
    )
    scratch = tempfile.mkdtemp(prefix="q23_var_")
    try:
        mod = F.col("event_id") % 3
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            ev.where(mod < 2).repartition(2),
            stat_columns=["event_id"],
        )
        tbl.append(ev.where(mod == 2).coalesce(1))
        out = (
            tbl.to_df()
            .select(
                "event_type",
                "value",
                F.expr("variant_get(props, '$.k', 'long')").alias("k"),
            )
            .groupBy("event_type", (F.col("k") % 5).alias("k_bucket"))
            .agg(
                F.count("*").alias("n_events"),
                F.max("k").alias("max_k"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q23_SQL = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_bucket,
       count(*) AS n_events,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q24: V2 checkpoint lifecycle — appends -> copy-on-write DELETE -> V2
# checkpoint (UUID-named top-level + checkpointMetadata + sidecar-resident
# file manifest) -> more appends + a DV DELETE -> fresh-reader aggregate.
# The fresh reader replays THROUGH the v2 checkpoint (top file splices its
# sidecar back in) plus the newer commits; a manifest row lost to the
# sidecar split, a double-spliced add, or a stale _last_checkpoint all
# break the hash.  The oracle replays the surviving-row set relationally.
# ---------------------------------------------------------------------------


def q_q24_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where, delete_where_dv
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q24_v2_")
    try:
        mod = F.col("o_orderkey") % 4
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            orders.where(mod == 0).repartition(2),
            stat_columns=["o_orderkey"],
        )
        tbl.append(orders.where(mod == 1).coalesce(1))
        delete_where(tbl, "o_orderkey % 20 = 4")  # copy-on-write
        tbl.log.write_checkpoint(v2=True)
        tbl.append(orders.where(mod == 2).coalesce(1))
        delete_where_dv(tbl, "o_orderkey % 20 = 9")  # merge-on-read
        fresh = DeltaTable(spark, tbl.table_path)
        out = (
            fresh.to_df()
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q24_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 4 < 3
  AND o_orderkey % 20 NOT IN (4, 9)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q25: column DEFAULT values (allowColumnDefaults) — add a column with a
# DEFAULT, append batches that omit it (default fills) and one that
# supplies it (explicit wins), existing rows stay NULL (Delta's
# defaults-for-future-writes, no backfill).  The oracle replays the three
# write generations as a CASE over the key ranges.
# ---------------------------------------------------------------------------


def q_q25_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q25_def_")
    try:
        mod = F.col("o_orderkey") % 4
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            orders.where(mod == 0).repartition(2),
            stat_columns=["o_orderkey"],
        )
        tbl.add_column("ingest_src", "string", default="'web-2026'")
        tbl.append(orders.where(mod == 1).coalesce(1))  # default fills
        tbl.append(  # explicit value wins over the default
            orders.where(mod == 2)
            .select("o_orderkey", "o_totalprice", F.lit("batch").alias("ingest_src"))
            .coalesce(1)
        )
        out = (
            tbl.to_df()
            .groupBy("ingest_src")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q25_SQL = """
SELECT CASE o_orderkey % 4
         WHEN 0 THEN NULL          -- pre-default rows: no backfill
         WHEN 1 THEN 'web-2026'    -- omitted column: default fills
         ELSE 'batch'              -- explicit value wins
       END AS ingest_src,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 4 < 3
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q26: log metadata cleanup — 12 appends cross the checkpoint cadence, then
# cleanup_metadata deletes every commit json superseded by the latest
# checkpoint; the fresh reader must replay the FULL state from checkpoint +
# surviving commits alone.  A row lost with the deleted log files, or a
# cleanup that touched a replay-critical file, breaks the hash.
# ---------------------------------------------------------------------------


def q_q26_log_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q26_lc_")
    try:
        mod = F.col("o_orderkey") % 15
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            orders.where(mod == 0).coalesce(1),
            stat_columns=["o_orderkey"],
        )
        for i in range(1, 13):  # versions 2..13; auto-checkpoint at 10
            tbl.append(orders.where(mod == i).coalesce(1))
        assert tbl.log._last_checkpoint_version() == 10
        r = tbl.log.cleanup_metadata(retention_seconds=0.0)
        assert r["deleted"] and tbl.log._commit_versions()[0] == 10
        fresh = DeltaTable(spark, tbl.table_path)
        out = (
            fresh.to_df()
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q26_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 15 <= 12
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# S7: streaming ingest into a CLUSTERED table — the events parquet streams
# one file per trigger through an exactly-once foreachBatch sink that
# appends with optimize_write=True, so every micro-batch lands as its own
# curve-laid ZCube (clustered ON ingest); a final OPTIMIZE merges the
# partial cubes into one.  Asserted in-line: all files clustered after the
# drain, one cube after the merge.  The oracle is the plain aggregate —
# streaming + clustering must be invisible to query results.
# ---------------------------------------------------------------------------


def q_s7_stream_clustered_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.cluster import cluster_status, optimize_clustered
    from delta_sorter_spark.sources.delta_table import DeltaTable

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="s7_sci_")
    try:
        seed = F.col("event_id") % 5 == 4
        src = os.path.join(scratch, "src")
        events.where(~seed).repartition(4).write.parquet(src)
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            events.where(seed).coalesce(1),
            stat_columns=["event_id", "user_id"],
        )
        tbl.set_clustering_columns(["event_id", "user_id"])
        optimize_clustered(tbl, min_zcube_bytes=0)  # seed cube

        def sink(batch_df, batch_id):
            tbl.append(
                batch_df,
                txn_app_id="s7-ingest",
                txn_version=batch_id,
                optimize_write=True,
            )

        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        st = cluster_status(tbl)
        assert st["unclustered_files"] == 0 and st["zcubes"] >= 2
        m = optimize_clustered(tbl, min_zcube_bytes=1 << 40)
        assert not m["noop"]
        assert cluster_status(tbl)["zcubes"] == 1
        out = (
            tbl.to_df()
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_S7_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# S6: stateful streaming dedup (streaming/events.streaming_dedup →
# dropDuplicatesWithinWatermark) driven through the REAL micro-batch engine:
# the events table is split into 4 files, streamed one file per trigger, so
# keys repeating across micro-batches must be dropped by cross-batch state.
# The horizon is table-spanning here so no state expires mid-drain and the
# output is exactly the distinct key set (the oracle); expiry behavior under
# short horizons is pinned separately in tests/test_streaming.py.  Output
# rows are returned as drained — duplicate leakage would be a row-count
# mismatch, not just a hash change.
# ---------------------------------------------------------------------------


def q_s6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.streaming.events import streaming_dedup

    events = load_table(spark, sf_dir, "events")
    scratch = tempfile.mkdtemp(prefix="s6_dedup_")
    try:
        src = os.path.join(scratch, "src")
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            # watermarks require session-tz TIMESTAMP, the parquet reads NTZ
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        deduped = streaming_dedup(
            stream, ["user_id", "event_type"], watermark="3650 days"
        ).select("user_id", "event_type")
        out = os.path.join(scratch, "out")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_S6_SQL = "SELECT DISTINCT user_id, event_type FROM events"


# ---------------------------------------------------------------------------
# E77: the full Gopher quality rule set (operators/quality.gopher_rules,
# Rae et al. 2021 §A1.1) — per document every rule's measured value plus the
# combined verdict.  The oracle replays all thirteen rules in DuckDB list
# SQL; the n-gram repetition family replays the explode + group-by exactly.
# ---------------------------------------------------------------------------

GOPHER_TOP_N, GOPHER_DUP_N = 2, 5


def q_e77_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.quality import gopher_rules

    return gopher_rules(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        top_ngram_n=GOPHER_TOP_N,
        dup_ngram_n=GOPHER_DUP_N,
    )


_STOPW = "','".join(["the", "be", "to", "of", "and", "that", "have", "with"])
_E77_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     w -> w <> '') AS words,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines,
         text
  FROM documents
), scal AS (
  SELECT doc_id,
         len(words) AS n_words,
         round(CAST(list_sum(list_transform(words, w -> length(w)))
               AS DOUBLE) / nullif(len(words), 0), 6) AS mean_word_len,
         round(CAST(length(text) - length(replace(text, '#', ''))
               + (length(text) - length(replace(text, '...', ''))) // 3
               + length(text) - length(replace(text, '…', '')) AS DOUBLE)
               / nullif(len(words), 0), 6) AS symbol_word_ratio,
         round(CAST(len(list_filter(lines,
                 l -> substring(l, 1, 1) IN ('•','‣','▪','-','*')))
               AS DOUBLE) / nullif(len(lines), 0), 6) AS bullet_line_frac,
         round(CAST(len(list_filter(lines,
                 l -> l LIKE '%...' OR l LIKE '%…'))
               AS DOUBLE) / nullif(len(lines), 0), 6) AS ellipsis_line_frac,
         round(CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
               AS DOUBLE) / nullif(len(words), 0), 6) AS alpha_word_frac,
         CAST(len(list_filter(['{_STOPW}'], s -> list_contains(words, s)))
              AS INT) AS stopword_hits,
         round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
               / nullif(len(lines), 0), 6) AS dup_line_frac,
         round(CAST(list_sum(list_transform(lines, l -> length(l)))
                    - list_sum(list_transform(list_distinct(lines),
                                              l -> length(l))) AS DOUBLE)
               / nullif(list_sum(list_transform(lines, l -> length(l))), 0),
               6) AS dup_line_char_frac,
         list_sum(list_transform(words, w -> length(w)))
           + greatest(len(words) - 1, 0) AS norm_chars
  FROM base
), grams AS (
  SELECT doc_id, 't' AS tag,
         unnest(list_transform(
           range(1, greatest(len(words) - {GOPHER_TOP_N - 1}, 0) + 1),
           i -> array_to_string(
                  list_slice(words, i, i + {GOPHER_TOP_N - 1}), ' ')))
           AS gram
  FROM base
  UNION ALL
  SELECT doc_id, 'd',
         unnest(list_transform(
           range(1, greatest(len(words) - {GOPHER_DUP_N - 1}, 0) + 1),
           i -> array_to_string(
                  list_slice(words, i, i + {GOPHER_DUP_N - 1}), ' ')))
  FROM base
), counted AS (
  SELECT doc_id, tag, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
), ng AS (
  SELECT doc_id,
         max(CASE WHEN tag = 't' THEN cnt * length(gram) END)
           AS top_ngram_chars,
         coalesce(sum(CASE WHEN tag = 'd' AND cnt > 1
                           THEN cnt * length(gram) END), 0)
           AS dup_ngram_chars
  FROM counted GROUP BY 1
)
SELECT s.doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
       dup_line_frac, dup_line_char_frac,
       round(CAST(top_ngram_chars AS DOUBLE) / nullif(norm_chars, 0), 6)
         AS top_ngram_char_frac,
       round(CAST(coalesce(dup_ngram_chars, 0) AS DOUBLE)
             / nullif(norm_chars, 0), 6) AS dup_ngram_char_frac,
       coalesce(n_words BETWEEN 50 AND 100000
         AND mean_word_len BETWEEN 3.0 AND 10.0
         AND symbol_word_ratio <= 0.1
         AND bullet_line_frac <= 0.9
         AND ellipsis_line_frac <= 0.3
         AND alpha_word_frac >= 0.8
         AND stopword_hits >= 2
         AND dup_line_frac <= 0.30
         AND dup_line_char_frac <= 0.20
         -- the operator tests the ROUNDED fractions (quality._frac rounds
         -- to 6 places before the threshold compare) — match it, or a true
         -- fraction in (0.2, 0.2000005] flips the pass bit between engines
         AND round(CAST(top_ngram_chars AS DOUBLE) / nullif(norm_chars, 0),
                   6) <= 0.20
         AND round(CAST(coalesce(dup_ngram_chars, 0) AS DOUBLE)
                   / nullif(norm_chars, 0), 6) <= 0.15, FALSE) AS gopher_pass
FROM scal s LEFT JOIN ng USING (doc_id)
"""


# ---------------------------------------------------------------------------
# E78: C4-style line/document cleaning (operators/quality.c4_clean, Raffel
# et al. 2020 §2.2).  The corpus is single-line punctuation-free word soup,
# so the registry call relaxes the terminal-punctuation / min-sentence knobs
# (rule sets are corpus config) to keep the hashed values non-trivial — the
# strict C4 defaults are pinned on crafted fixtures in tests/test_quality.py.
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5


def q_e78_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.quality import c4_clean

    return c4_clean(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        min_words_per_line=C4_MIN_WORDS,
        min_sentences=0,
        require_terminal_punct=False,
    )


_E78_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines
  FROM documents
), k AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
            len(list_filter(string_split_regex(l, '\\s+'), w -> w <> ''))
              >= {C4_MIN_WORDS}
            AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base
), c AS (
  SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines,
         array_to_string(kept, chr(10)) AS cleaned,
         coalesce(length(regexp_replace(array_to_string(kept, chr(10)),
                                        '[^.!?]', '', 'g')), 0)
           AS n_sentences,
         contains(lower(text), 'lorem ipsum') AS lorem,
         contains(text, '{{') AS brace
  FROM k
)
SELECT doc_id, n_lines, n_kept_lines, n_sentences,
       coalesce(NOT lorem AND NOT brace AND n_sentences >= 0
                AND n_kept_lines > 0, FALSE) AS doc_kept,
       CASE WHEN NOT lorem AND NOT brace AND n_sentences >= 0
                 AND n_kept_lines > 0
            THEN cleaned END AS cleaned_text
FROM c
"""


# ---------------------------------------------------------------------------
# E83: HTML/markup extraction (operators/quality.py html_extract) — the step
# BEFORE c4_clean/gopher_rules in a real crawl pipeline.  The documents
# fixture is already-clean text, so BOTH sides first wrap each document in
# the SAME deterministic markup (the _E83_WRAP fragment is valid Spark SQL
# AND DuckDB SQL verbatim), then the oracle replays html_extract's exact
# regexp_replace chain.  Every pattern is Java-regex/RE2 identical: no
# backreferences, no \s (explicit [ \t\n] classes).
# ---------------------------------------------------------------------------

_E83_WRAP = (
    "'<html><head><title>Doc &amp; ' || CAST(doc_id AS STRING) || '</title>'"
    " || '<style>p { color: red; }</style>'"
    " || '<script>if (n < 2) { x = \"a&b\"; }</script></head>'"
    " || '<body><nav>Home &gt; ' || lang || '</nav><!-- crawler: drop -->'"
    " || '<h1>' || source || '</h1><p>'"
    " || replace(text, '. ', '.</p><p>') || '</p>'"
    " || '<br/><footer>&quot;' || lang || '&quot; &#39;' || source ||"
    " '&#39;&nbsp;reserved</footer></body></html>'"
)


def q_e83_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.quality import html_extract

    docs = load_table(spark, sf_dir, "documents")
    html = docs.select("doc_id", F.expr(_E83_WRAP).alias("html"))
    return html_extract(html, "doc_id", "html")


def _e83_duck_exprs() -> tuple:
    """DuckDB (title_expr, text_expr) replaying html_extract's exact
    regexp chain over a column named ``html`` — shared by e83 and p6."""
    from delta_sorter_spark.operators.quality import (
        _HTML_BREAK_TAGS,
        _HTML_DROP_TAGS,
        _HTML_ENTITIES,
    )

    c = "regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g')"
    for t in _HTML_DROP_TAGS:
        c = (
            f"regexp_replace({c}, '(?is)<{t}(>|[ \\t\\n][^>]*>).*?</{t}>',"
            " ' ', 'g')"
        )
    c = f"regexp_replace({c}, '(?i)<(br|hr)([ \\t\\n][^>]*)?/?>', chr(10), 'g')"
    c = f"regexp_replace({c}, '(?i)</({_HTML_BREAK_TAGS})>', chr(10), 'g')"
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    t = (
        "regexp_extract(html,"
        " '(?is)<title(>|[ \\t\\n][^>]*>)(.*?)</title>', 2)"
    )
    for ent, ch in _HTML_ENTITIES:
        rep = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep}')"
        t = f"replace({t}, '{ent}', '{rep}')"
    c = f"regexp_replace({c}, '\\r\\n|\\r', chr(10), 'g')"
    c = f"regexp_replace({c}, '[ \\t]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n\\n+', chr(10) || chr(10), 'g')"
    c = f"regexp_replace({c}, '^[\\n ]+|[\\n ]+$', '', 'g')"
    t = f"nullif(trim(regexp_replace({t}, '[ \\t\\n]+', ' ', 'g')), '')"
    return t, c


def _make_e83_sql() -> str:
    t, c = _e83_duck_exprs()
    return f"""
WITH h AS (SELECT doc_id, {_E83_WRAP} AS html FROM documents),
e AS (SELECT doc_id, {t} AS title, {c} AS text FROM h)
SELECT doc_id, title, text,
       len(list_filter(string_split(text, chr(10)), l -> trim(l) <> ''))
         AS n_lines,
       length(text) AS n_chars
FROM e
"""


# ---------------------------------------------------------------------------
# E84: bigram conditional-surprisal LM scoring — the quantized KenLM-style
# perplexity filter (CCNet quality gate).  Per bigram occurrence the score is
# bits(C(w1-as-prefix)) - bits(C(w1 w2)) with bits(n) = floor(log2 n) as
# integer bin-length — no float logs, bit-identical across engines; the only
# double is the final avg division (round 6, the e34 convention).
# ---------------------------------------------------------------------------


def q_e84_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import bigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return bigram_surprisal(docs, "doc_id", "text")


_E84_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)),
                                 i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
    FROM base)
),
pref AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
bgc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
d AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CAST(length(bin(c1)) - length(bin(c2)) AS BIGINT))
              AS BIGINT) AS sum_cond_bits
  FROM bg JOIN bgc USING (w1, w2) JOIN pref USING (w1)
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_cond_bits,
       round(CAST(sum_cond_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
         AS avg_cond_bits
FROM d
"""


P6_MIRROR_SHIFT = 5_000_000


def q_p6_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-curation composition the round-8 extraction stage exists
    for: deterministic markup wrap -> html_extract -> C4 line cleaning
    (corpus-fit knobs, e78's) -> exact content dedup on the CLEANED text
    (keep-lowest doc_id).  Every stage is oracle-checked alone
    (e83/e78/e1-shape); this entry proves the COMPOSITION is exact."""
    from delta_sorter_spark.operators.dedup import exact_dedup
    from delta_sorter_spark.operators.quality import c4_clean, html_extract

    base = load_table(spark, sf_dir, "documents")
    # re-crawl mirror: every page ingested twice under a different id —
    # the wrapper differs (title/nav carry the id/lang) but the EXTRACTED
    # content is identical, so the dedup stage provably halves the corpus
    docs = base.unionByName(
        base.select(
            (F.col("doc_id") + P6_MIRROR_SHIFT).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    html = docs.select("doc_id", F.expr(_E83_WRAP).alias("html"))
    txt = html_extract(html, "doc_id", "html").select("doc_id", "text")
    cleaned = c4_clean(
        txt, "doc_id", "text",
        min_words_per_line=C4_MIN_WORDS,
        min_sentences=0,
        require_terminal_punct=False,
    )
    kept = cleaned.where("doc_kept").select(
        "doc_id", "n_kept_lines", "cleaned_text"
    )
    surv = exact_dedup(kept, ["cleaned_text"], "doc_id")
    return surv.select(
        "doc_id",
        "n_kept_lines",
        F.length("cleaned_text").alias("n_chars_clean"),
    )


def _make_p6_sql() -> str:
    _t, c = _e83_duck_exprs()
    return f"""
WITH corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + {P6_MIRROR_SHIFT} AS doc_id, text, lang, source
  FROM documents
),
h AS (SELECT doc_id, {_E83_WRAP} AS html FROM corpus),
ex AS (SELECT doc_id, {c} AS text FROM h),
base AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines
  FROM ex
), k AS (
  SELECT doc_id, text,
         list_filter(lines, l ->
            len(list_filter(string_split_regex(l, '\\s+'), w -> w <> ''))
              >= {C4_MIN_WORDS}
            AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base
), c AS (
  SELECT doc_id, len(kept) AS n_kept_lines,
         array_to_string(kept, chr(10)) AS cleaned,
         contains(lower(text), 'lorem ipsum') AS lorem,
         contains(text, '{{') AS brace
  FROM k
), s AS (
  SELECT doc_id, n_kept_lines, cleaned FROM c
  WHERE NOT lorem AND NOT brace AND n_kept_lines > 0
)
SELECT min(doc_id) AS doc_id,
       min_by(n_kept_lines, doc_id) AS n_kept_lines,
       length(cleaned) AS n_chars_clean
FROM s GROUP BY cleaned
"""


# ---------------------------------------------------------------------------
# E79/E80: WordPiece (Schuster & Nakajima 2012 — the BERT tokenizer), the
# THIRD subword family next to BPE (e61/e67/e76) and unigram-LM (e73/e75),
# hash-checked across its full train -> encode lifecycle.
#
# e79 TRAIN replays textstats.train_wordpiece as chained CTE stages (the
# e67 pattern): per stage, pair counts AND token counts over the word
# table -> argmax by likelihood score n/(n_l*n_r) (one double division of
# exact integers — identical IEEE result in both engines; ties (score
# desc, l, r)) -> the same string-accumulator list_reduce merge fold as
# e67, emitting the merged token with the right side's ## prefix dropped.
#
# e80 ENCODE replays greedy longest-match-first (MaxMatch): because the
# best piece at a position is INDEPENDENT of the greedy path, the oracle
# precomputes a best-span table (w, pos) -> (l, pc) and unrolls the walk
# as WP_STEPS chained LEFT-JOIN levels (the e73 unrolling pattern) — each
# level either consumes the best piece at the cursor, marks the word
# unencodable ([UNK]), or no-ops once past the word end.
# ---------------------------------------------------------------------------

WP_MERGES = 6
WP_STEPS = 16  # >= max word length (corpus words cap at 8 chars)


def q_e79_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import train_wordpiece

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    return train_wordpiece(docs, "text", n_merges=WP_MERGES, min_count=2)


def _e79_stages(carry_word: bool = False) -> list:
    """The WordPiece trainer's CTE chain; ``carry_word`` keeps the word
    string alongside its token array for the e80 encode oracle."""
    wc = "w, " if carry_word else ""
    stages = [f"""
wfW AS MATERIALIZED (
  SELECT w, count(*) AS wn FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) WHERE w <> '' GROUP BY w
),
y0 AS (
  SELECT {wc}wn,
         list_transform(regexp_extract_all(w, '.'),
                        (c, i) -> CASE WHEN i = 1 THEN c
                                       ELSE '##' || c END) AS toks
  FROM wfW
)"""]
    for k in range(WP_MERGES):
        stages.append(f"""
yp{k} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(sum(wn) AS BIGINT) AS n
  FROM (
    SELECT wn,
      unnest(list_transform(list_slice(toks, 1, length(toks)-1),
                            (t, i) -> struct_pack(l := t, r := toks[i+1]))) AS pr
    FROM y{k}
  ) GROUP BY pr.l, pr.r
),
yt{k} AS (
  SELECT t, CAST(sum(wn) AS BIGINT) AS tn
  FROM (SELECT wn, unnest(toks) AS t FROM y{k}) GROUP BY t
),
ym{k} AS (
  SELECT p.l, p.r, p.n,
         CAST(p.n AS DOUBLE) / CAST(tl.tn * tr.tn AS DOUBLE) AS score,
         p.l || CASE WHEN p.r LIKE '##%' THEN substring(p.r, 3)
                     ELSE p.r END AS merged
  FROM yp{k} p
  JOIN yt{k} tl ON tl.t = p.l
  JOIN yt{k} tr ON tr.t = p.r
  WHERE p.n >= 2
  ORDER BY score DESC, p.l ASC, p.r ASC LIMIT 1
),
y{k + 1} AS (
  SELECT {wc}wn,
    list_filter(
      string_split(
        CASE WHEN split_part(acc, chr(2), 2) = ''
             THEN split_part(acc, chr(2), 1)
             ELSE split_part(acc, chr(2), 1) || chr(1) || split_part(acc, chr(2), 2)
        END, chr(1)),
      t -> t <> '') AS toks
  FROM (
    SELECT {wc}wn,
      list_reduce(
        list_prepend(chr(2), toks),
        (acc, x) -> CASE
          WHEN split_part(acc, chr(2), 2) = ''
            THEN split_part(acc, chr(2), 1) || chr(2) || x
          WHEN split_part(acc, chr(2), 2) = l AND x = r
            THEN split_part(acc, chr(2), 1) || chr(1) || merged || chr(2)
          ELSE split_part(acc, chr(2), 1) || chr(1)
               || split_part(acc, chr(2), 2) || chr(2) || x
        END) AS acc
    FROM y{k} CROSS JOIN ym{k}
  )
)""")
    return stages


def _e79_sql() -> str:
    final = "\nUNION ALL ".join(
        f'SELECT {k} AS merge_rank, l AS "left", r AS "right", merged,'
        f" n AS pair_count, score FROM ym{k}"
        for k in range(WP_MERGES)
    )
    return "WITH " + ",".join(_e79_stages()) + "\n" + final


_E79_SQL = _e79_sql()


def q_e80_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.textstats import (
        train_wordpiece,
        wordpiece_encode,
        wordpiece_vocab,
    )

    docs = _doc_subset(spark, sf_dir, DOC_SUBSET_MOD)
    merges = train_wordpiece(docs, "text", n_merges=WP_MERGES, min_count=2)
    vocab = wordpiece_vocab(docs, "text", merges)
    out = wordpiece_encode(docs, "doc_id", "text", vocab)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_pieces",
        "n_unk",
        F.array_join("pieces", " ").alias("enc"),
    )


def _e80_sql() -> str:
    stages = _e79_stages()
    merged_union = " UNION ALL ".join(
        f"SELECT merged AS piece FROM ym{k}" for k in range(WP_MERGES)
    )
    stages.append(f"""
vocabW AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT unnest(list_transform(regexp_extract_all(w, '.'),
                  (c, i) -> CASE WHEN i = 1 THEN c ELSE '##' || c END))
           AS piece
    FROM wfW
    UNION ALL {merged_union}
  )
),
dwW AS MATERIALIZED (
  SELECT d.doc_id, r.i AS wpos, d.ws[CAST(r.i AS INT)] AS w
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS ws
    FROM documents WHERE doc_id % {DOC_SUBSET_MOD} = 0
  ) d, range(1, {_UNI_MAX_DOC_WORDS}+1) r(i)
  WHERE r.i <= len(d.ws)
),
uwW AS MATERIALIZED (SELECT DISTINCT w FROM dwW),
bsW AS MATERIALIZED (
  SELECT w, i, max(l) AS l,
         arg_max(pc, l) AS pc
  FROM (
    SELECT u.w, s.i, s.l,
           CASE WHEN s.i = 1 THEN substring(u.w, s.i, s.l)
                ELSE '##' || substring(u.w, s.i, s.l) END AS pc
    FROM uwW u, (SELECT a.i, b.l FROM range(1, {WP_STEPS}+1) a(i),
                       range(1, {WP_STEPS}+1) b(l)) s
    WHERE s.i <= length(u.w) AND s.l <= length(u.w) - s.i + 1
  ) sp
  WHERE pc IN (SELECT piece FROM vocabW)
  GROUP BY w, i
),
g0 AS (SELECT w, 1 AS pos, '' AS pcs, TRUE AS ok FROM uwW)""")
    for k in range(WP_STEPS):
        stages.append(f"""
g{k + 1} AS (
  SELECT g.w,
         CASE WHEN NOT g.ok OR g.pos > length(g.w) THEN g.pos
              WHEN b.l IS NULL THEN g.pos
              ELSE g.pos + b.l END AS pos,
         CASE WHEN NOT g.ok OR g.pos > length(g.w) THEN g.pcs
              WHEN b.l IS NULL THEN g.pcs
              ELSE g.pcs || chr(1) || b.pc END AS pcs,
         CASE WHEN NOT g.ok THEN FALSE
              WHEN g.pos > length(g.w) THEN TRUE
              WHEN b.l IS NULL THEN FALSE
              ELSE TRUE END AS ok
  FROM g{k} g LEFT JOIN bsW b ON b.w = g.w AND b.i = g.pos
)""")
    stages.append(f"""
segW AS (
  SELECT w,
         CASE WHEN ok THEN list_filter(string_split(pcs, chr(1)),
                                       t -> t <> '')
              ELSE ['[UNK]'] END AS wpcs
  FROM g{WP_STEPS}
)""")
    return (
        "WITH " + ",".join(stages)
        + """
SELECT dw.doc_id,
       CAST(sum(len(s.wpcs)) AS BIGINT) AS n_pieces,
       CAST(sum(len(list_filter(s.wpcs, p -> p = '[UNK]'))) AS BIGINT)
         AS n_unk,
       array_to_string(flatten(list(s.wpcs ORDER BY dw.wpos)), ' ') AS enc
FROM dwW dw JOIN segW s USING (w)
GROUP BY dw.doc_id"""
    )


_E80_SQL = _e80_sql()


# ---------------------------------------------------------------------------
# E81: epoch-capped domain mixing (sampling.epoch_capped_mix — the
# Muennighoff et al. 2023 data-constrained rule: cap per-domain repetition,
# redistribute surplus weight-proportionally).  The water-filling needs no
# loop — capped domains form a prefix under cap/weight ascending — so both
# engines replay it as two window passes over domain-count rows, all
# arithmetic integer (the clamp test cross-multiplies BIGINTs).  Domain
# weights derive deterministically from the source-name suffix so the
# uniform test corpus still exercises both the capped and uncapped branch.
# ---------------------------------------------------------------------------

ECM_BUDGET, ECM_EPOCHS = 600, 2
ECM_WEIGHT = (
    "1 + (CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 7)"
)


def q_e81_epoch_capped_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.sampling import epoch_capped_mix

    return epoch_capped_mix(
        load_table(spark, sf_dir, "documents"),
        "source",
        budget=ECM_BUDGET,
        max_epochs=ECM_EPOCHS,
        weight_expr=ECM_WEIGHT,
    )


_E81_SQL = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(max({ECM_WEIGHT}) AS BIGINT) AS weight,
         count(*) * {ECM_EPOCHS} AS cap_docs
  FROM documents GROUP BY source
), flagged AS (
  SELECT source, n_docs, weight, cap_docs,
         cap_docs * (sum(weight) OVER ()
                     - coalesce(sum(weight) OVER w_prior, 0))
           <= weight * ({ECM_BUDGET}
                        - coalesce(sum(cap_docs) OVER w_prior, 0)) AS capped
  FROM per
  WINDOW w_prior AS (ORDER BY CAST(cap_docs AS DOUBLE) / weight, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), rem AS (
  SELECT source, n_docs, weight, cap_docs, capped,
         {ECM_BUDGET} - coalesce(
           sum(CASE WHEN capped THEN cap_docs END) OVER (), 0) AS rem_budget,
         sum(weight) OVER () - coalesce(
           sum(CASE WHEN capped THEN weight END) OVER (), 0) AS rem_weight
  FROM flagged
)
SELECT source, n_docs, weight, cap_docs, capped,
       CAST(CASE WHEN capped THEN cap_docs
                 ELSE greatest((weight * rem_budget) // rem_weight, 0)
            END AS BIGINT) AS alloc_docs,
       (1000 * CAST(CASE WHEN capped THEN cap_docs
                         ELSE greatest((weight * rem_budget) // rem_weight, 0)
                    END AS BIGINT)) // n_docs AS epochs_milli
FROM rem
"""


# ---------------------------------------------------------------------------
# Q18: table-registered ANN index lifecycle (operators/ann_index.py) — the
# full production arc on a REAL scratch Delta table: build (train + encode
# + register) on half the embeddings -> append the other half -> refresh
# (frozen codebooks, O(new files)) -> copy-on-write DELETE -> refresh
# (rewritten files re-encoded, dropped files' codes discarded) -> serve.
# The oracle replays it relationally: codebooks trained on the BUILD half
# only (including rows deleted later — refresh never retrains), codes over
# exactly the LIVE rows, ADC top-k.  pq_assign's bit-identical re-encode is
# what makes the multi-step lifecycle one deterministic SQL statement.
# ---------------------------------------------------------------------------

ANN_DELETE_MOD = 10  # delete vec_id % 10 = 3 after the refresh


def q_q18_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="q18_ann_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
        )
        tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
        refresh_ann_index(tbl, "embedding")
        delete_where(tbl, f"vec_id % {ANN_DELETE_MOD} = 3")
        refresh_ann_index(tbl, "embedding")
        queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
        out = ann_topk(
            tbl, queries, "vec_id", "embedding", "embedding", k=TOPK
        ).select(
            "query_id",
            "id",
            "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _q18_subspace(j: int) -> str:
    """e60's per-subspace replay with the train/live split: codebooks from
    the BUILD-half subspace, codes over the LIVE rows only."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
tsub{j} AS (
  SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus WHERE vec_id % 2 = 0
),
lsub{j} AS (
  SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus
  WHERE vec_id % {ANN_DELETE_MOD} <> 3
),
seed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM tsub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'tsub{j}', f'seed{j}', f'cb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'tsub{j}', f'cb{j}_1', f'cb{j}', _PQ_DSUB)},
code{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM lsub{j} c CROSS JOIN cb{j} s) WHERE rn = 1
),
qt{j} AS (
  SELECT q.vec_id AS query_id, s.centroid AS code,
         {_duck_sq_l2('q.v', 's.cvec')} AS d
  FROM (SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus
        WHERE vec_id % {QUERY_VEC_MOD} = 0) q
  CROSS JOIN cb{j} s
)"""


def _q18_sql() -> str:
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS MATERIALIZED (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),{','.join(_q18_subspace(j) for j in range(PQ_M))},
scored AS (
  SELECT c0.vec_id AS id, q0.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM code0 c0
  {' '.join(f'JOIN code{j} c{j} ON c{j}.vec_id = c0.vec_id' for j in range(1, PQ_M))}
  JOIN qt0 q0 ON q0.code = c0.code
  {' '.join(f'JOIN qt{j} q{j} ON q{j}.code = c{j}.code AND q{j}.query_id = q0.query_id' for j in range(1, PQ_M))}
  WHERE c0.vec_id <> q0.query_id
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


_Q18_SQL = _q18_sql()


# ---------------------------------------------------------------------------
# Q28: row-level change data feed (delta.enableChangeDataFeed -> protocol
# cdc actions + _change_data/ files).  The scenario drives every CDC write
# path — append (synthesized insert), copy-on-write UPDATE (pre/post
# images), copy-on-write DELETE, merge-on-read DV DELETE — and returns the
# whole feed.  Row-level CDC is FILE-LAYOUT-INDEPENDENT (unlike the
# synthesized feed, which tags whole rewritten files), so the oracle can
# replay the exact row set relationally: each version's change rows are a
# pure function of the base table and the DML chain.
# ---------------------------------------------------------------------------


def q_q28_cdc_row_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import (
        delete_where,
        delete_where_dv,
        table_changes,
        update_where,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    scratch = tempfile.mkdtemp(prefix="q28_cdc_")
    try:
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            orders.where(F.col("o_orderkey") % 4 == 0).coalesce(2),
        )
        vbase = tbl.state().version  # feed everything after the create
        tbl.set_table_properties({"delta.enableChangeDataFeed": "true"})
        tbl.append(orders.where(F.col("o_orderkey") % 4 == 1).coalesce(2))
        update_where(  # cdc update_preimage/update_postimage
            tbl, "o_orderpriority = '1-URGENT'", {"price": "price * 2"}
        )
        delete_where(  # cdc row-level delete (copy-on-write)
            tbl, "o_orderstatus = 'F' AND o_orderkey % 8 = 0"
        )
        delete_where_dv(tbl, "o_orderkey % 10 = 3")  # cdc DV delete
        from pyspark.sql import Window

        # absolute commit numbers depend on engine bookkeeping commits;
        # the deterministic contract is the ORDER of the four data-changing
        # steps (append=1, update=2, delete=3, dv-delete=4) — q5's shape
        out = table_changes(tbl, vbase).select(
            "o_orderkey",
            F.round("price", 2).alias("price"),
            "_change_type",
            F.dense_rank()
            .over(Window.orderBy("_commit_version"))
            .alias("change_step"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q28_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
s1 AS (SELECT * FROM base WHERE o_orderkey % 4 = 1),
live3 AS (
  SELECT * FROM base WHERE o_orderkey % 4 = 0
  UNION ALL SELECT * FROM s1
),
live4 AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CASE WHEN o_orderpriority = '1-URGENT' THEN price * 2 ELSE price END
           AS price
  FROM live3
),
live5 AS (
  SELECT * FROM live4
  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 8 = 0)
)
SELECT o_orderkey, round(price, 2) AS price,
       'insert' AS _change_type, CAST(1 AS INT) AS change_step
FROM s1
UNION ALL
SELECT o_orderkey, round(price, 2), 'update_preimage', 2
FROM live3 WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, round(price * 2, 2), 'update_postimage', 2
FROM live3 WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, round(price, 2), 'delete', 3
FROM live4 WHERE o_orderstatus = 'F' AND o_orderkey % 8 = 0
UNION ALL
SELECT o_orderkey, round(price, 2), 'delete', 4
FROM live5 WHERE o_orderkey % 10 = 3
"""


# ---------------------------------------------------------------------------
# S9: native streaming sink — writeStream.format("delta_sorter") appends
# micro-batches through the pure-Python log plane (executor-staged parquet,
# one commit per batch, write-time stats, txnAppId exactly-once).  The
# drained table's aggregate must equal the batch recompute; the oracle is
# the plain SQL aggregate (streaming + the sink are invisible to results,
# the s7 pattern).
# ---------------------------------------------------------------------------


def q_s9_native_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.sources.delta_table import DeltaTable
    from delta_sorter_spark.streaming.delta_source import DeltaStreamDataSource

    spark.dataSource.register(DeltaStreamDataSource)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="s9_sink_")
    try:
        src = os.path.join(scratch, "src")
        events.repartition(3).write.parquet(src)
        tbl = DeltaTable.create(
            spark,
            os.path.join(scratch, "t"),
            events.limit(0).coalesce(1),
            stat_columns=["event_id"],
        )
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("delta_sorter")
            .option("path", tbl.table_path)
            .option("txnAppId", "s9-sink")
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # the sink's write-time stats must be live (zone maps on event_id)
        assert all(
            "event_id" in (a.stats or {}).get("minValues", {})
            for a in tbl.state().adds
            if (a.stats or {}).get("numRecords", 0) > 0
        )
        out = (
            tbl.to_df()
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                    4,
                ).alias("sum_value"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_S9_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS sum_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P8: multi-hop CDC apply (the medallion bronze->silver shape) — the
# canonical change-feed consumer: a downstream mirror is maintained purely
# by applying the upstream's change feed, one MERGE + DELETE pair per
# commit, in commit order (order matters: a row updated then deleted must
# end deleted).  The upstream DML chain exercises every feed fidelity —
# append (synthesized inserts), CoW UPDATE (images), DV DELETE (row-level
# deletes).  The oracle replays the chain relationally on the base table:
# the mirror must equal the upstream's final state exactly.
# ---------------------------------------------------------------------------


def q_p8_cdc_multihop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import (
        delete_where_dv,
        merge,
        table_changes,
        update_where,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    scratch = tempfile.mkdtemp(prefix="p8_hop_")
    try:
        bronze = DeltaTable.create(
            spark,
            os.path.join(scratch, "bronze"),
            orders.where(F.col("o_orderkey") % 4 == 0).coalesce(2),
        )
        bronze.set_table_properties({"delta.enableChangeDataFeed": "true"})
        vbase = bronze.state().version
        # silver starts as a copy of bronze's current state
        silver = DeltaTable.create(
            spark, os.path.join(scratch, "silver"), bronze.to_df().coalesce(2)
        )
        # upstream DML chain
        bronze.append(orders.where(F.col("o_orderkey") % 4 == 1).coalesce(2))
        update_where(
            bronze, "o_orderpriority = '1-URGENT'", {"price": "price * 2"}
        )
        delete_where_dv(bronze, "o_orderkey % 10 = 3")
        # apply the feed commit by commit (a driver loop over COMMITS —
        # O(history), never O(rows))
        feed = table_changes(bronze, vbase).localCheckpoint(eager=True)
        versions = sorted(
            r["_commit_version"]
            for r in feed.select("_commit_version").distinct().collect()
        )
        cols = ["o_orderkey", "o_orderstatus", "o_orderpriority", "price"]
        for v in versions:
            batch = feed.where(F.col("_commit_version") == v)
            upserts = batch.where(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select(*cols)
            merge(
                silver, upserts, ["o_orderkey"],
                when_matched_update={c: f"s.{c}" for c in cols[1:]},
            )
            deletes = batch.where(F.col("_change_type") == "delete").select(
                *cols
            )
            merge(
                silver, deletes, ["o_orderkey"],
                when_matched_delete="true",
                when_not_matched_insert=False,
            )
        out = silver.to_df().select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("price", 2).alias("price"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_P8_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       round(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice AS DOUBLE) * 2
                  ELSE CAST(o_totalprice AS DOUBLE) END, 2) AS price
FROM orders
WHERE o_orderkey % 4 IN (0, 1) AND o_orderkey % 10 <> 3
"""


# ---------------------------------------------------------------------------
# Q29: CDF-driven incremental materialized view (continuous aggregate).
# The rollup table is maintained purely from the change feed — initial
# load, an append, a row-level UPDATE (preimage leaves the aggregate,
# postimage enters) and a DELETE — never re-reading source history; the
# oracle recomputes the same aggregate from the FINAL state in one SQL
# statement, pinning the incremental-view-maintenance contract:
# maintenance from deltas must equal recompute from scratch.
# ---------------------------------------------------------------------------


def q_q29_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where, update_where
    from delta_sorter_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        incremental_rollup_cdc,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="q29_ivm_")
    try:
        src = DeltaTable.create(
            spark,
            os.path.join(scratch, "src"),
            events.where(F.col("event_id") % 2 == 0).coalesce(2),
            stat_columns=["event_id"],
        )
        src.set_table_properties({"delta.enableChangeDataFeed": "true"})
        rollup = DeltaTable.create(
            spark,
            os.path.join(scratch, "ru"),
            local_df(spark, [], ROLLUP_SCHEMA),
        )
        r = incremental_rollup_cdc(src, rollup, 0)
        src.append(events.where(F.col("event_id") % 2 == 1).coalesce(2))
        r = incremental_rollup_cdc(src, rollup, r["source_version"])
        update_where(src, "event_id % 7 = 3", {"value": "value * 2"})
        delete_where(src, "event_id % 5 = 0")
        incremental_rollup_cdc(src, rollup, r["source_version"])
        out = (
            rollup.to_df()
            .where(F.col("n_events") > 0)
            .select(
                "window_start",
                "event_type",
                "n_events",
                F.round("total_value", 4).alias("total_value"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q29_SQL = """
WITH final AS (
  SELECT ts, event_type,
         CASE WHEN event_id % 7 = 3 THEN value * 2 ELSE value END AS value
  FROM events
  WHERE event_id % 5 <> 0
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS total_value
FROM final GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q30: CONVERT TO DELTA — adopt a plain Hive-partitioned parquet directory
# in place (no data bytes move), then prove the adopted table is fully
# operational: partition-pruned read, DML delete, and an aggregate over
# the final state.  The oracle replays the same slice + delete + aggregate
# over the base table — adoption must be invisible to results.
# ---------------------------------------------------------------------------


def q_q30_convert_to_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    scratch = tempfile.mkdtemp(prefix="q30_conv_")
    try:
        plain = os.path.join(scratch, "plain")
        orders.where(F.col("o_orderkey") % 3 == 0).repartition(
            4
        ).write.partitionBy("o_orderstatus").parquet(plain)
        tbl = DeltaTable.convert_to_delta(
            spark, plain, stat_columns=["o_orderkey"]
        )
        delete_where(tbl, "o_orderkey % 9 = 0")
        out = (
            tbl.to_df(where="o_orderstatus = 'F'")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(
                    F.sum(F.col("price").cast("decimal(18,2)")).cast("double"),
                    2,
                ).alias("total_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_Q30_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS total_price
FROM orders
WHERE o_orderkey % 3 = 0 AND o_orderkey % 9 <> 0 AND o_orderstatus = 'F'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# S8: streaming ingest with continuous ANN-index freshness — the contract a
# live retrieval corpus needs: the registered index never lags the table by
# more than one micro-batch.  Seed half the embeddings, build the PQ index,
# then stream the other half through the REAL micro-batch engine
# (maxFilesPerTrigger=1) with foreachBatch doing exactly-once append + an
# O(new) generational refresh_ann_index IN THE SAME BATCH; finish with the
# q18 DV-delete + refresh and serve the same queries.  Final state is
# byte-identical to q18's (codebooks frozen at build over the even half,
# codes over live rows), so the oracle is _Q18_SQL verbatim — what the hash
# pins is that per-batch incremental maintenance converges to the same
# index a batch rebuild-from-scratch scenario reaches.  The generational
# property is asserted structurally: one codes part per refresh, none
# rewritten.
# ---------------------------------------------------------------------------


def q_s8_stream_ann_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_specs,
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="s8_annf_")
    try:
        src = os.path.join(scratch, "src")
        emb.where(F.col("vec_id") % 2 == 1).repartition(3).write.parquet(src)
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
        )

        def sink(batch_df, batch_id):
            tbl.append(
                batch_df.coalesce(1),
                txn_app_id="s8-ingest",
                txn_version=batch_id,
            )
            refresh_ann_index(tbl, "embedding")

        q = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # generational layout: build part + one part per micro-batch refresh
        spec = ann_specs(tbl)["embedding"]
        assert len(spec["codes_parts"]) >= 4, spec["codes_parts"]
        delete_where(tbl, f"vec_id % {ANN_DELETE_MOD} = 3")
        refresh_ann_index(tbl, "embedding")
        queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
        out = ann_topk(
            tbl, queries, "vec_id", "embedding", "embedding", k=TOPK
        ).select(
            "query_id",
            "id",
            "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# M8: cross-modal retrieval (the CLIP-retrieval curation/eval shape) — text
# query -> pluggable text-tower stub (multimodal.embed_texts, md5-chain
# pseudo-embedding in the ASSET embedding space) -> registered ANN top-k
# over the asset-embedding table (ann_index.ann_topk: PQ build + ADC
# serving, codes-width candidate scan) -> join back asset metadata
# (source/lang from documents; vec_id aligns with doc_id in the fixture).
# The oracle replays the whole chain relationally: chained-md5 text
# embedding, normalized corpus, deterministic PQ training (seed + 2 Lloyd
# iterations), ADC scoring of the text queries, exact-cosine attach.
# ---------------------------------------------------------------------------

M8_QUERY_MOD = 50  # text-query subset: every 50th document


def q_m8_crossmodal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
    )
    from delta_sorter_spark.operators.multimodal import embed_texts
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    scratch = tempfile.mkdtemp(prefix="m8_xmodal_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"), emb.coalesce(2)
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
        )
        qtexts = docs.where(F.col("doc_id") % M8_QUERY_MOD == 0).select(
            "doc_id", "text"
        )
        qemb = embed_texts(qtexts, "doc_id", "text", dim=EMB_DIM)
        out = ann_topk(tbl, qemb, "id", "embedding", "embedding", k=TOPK)
        meta = docs.select(
            F.col("doc_id").alias("id"), "source", "lang"
        )
        res = out.join(meta, "id").select(
            "query_id",
            "id",
            "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
            "source",
            "lang",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_M8_HEXB = (
    "((strpos('0123456789abcdef', substr({c}, {p}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr({c}, {p1}, 1)) - 1))"
)


def _m8_text_component(i: int) -> str:
    """Component i of the chained-md5 text embedding: digest i//8 (h1..h8),
    signed 16-bit from hex bytes 4j+1..4j+4 of that digest."""
    c, j = f"h{i // 8 + 1}", i % 8
    hi = _M8_HEXB.format(c=c, p=4 * j + 1, p1=4 * j + 2)
    lo = _M8_HEXB.format(c=c, p=4 * j + 3, p1=4 * j + 4)
    return f"CAST(({hi}) * 256 + ({lo}) - 32768 AS DOUBLE)"


def _m8_subspace(j: int) -> str:
    """q18's per-subspace PQ replay, full-corpus train/live (one build, no
    refresh), with the query tables built from the TEXT embeddings."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
sub{j} AS (
  SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus
),
seed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM sub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'sub{j}', f'seed{j}', f'cb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'sub{j}', f'cb{j}_1', f'cb{j}', _PQ_DSUB)},
code{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM sub{j} c CROSS JOIN cb{j} s) WHERE rn = 1
),
qt{j} AS (
  SELECT q.query_id, s.centroid AS code,
         {_duck_sq_l2('q.v', 's.cvec')} AS d
  FROM (SELECT query_id, v[{lo}:{hi}] AS v FROM qnorm) q
  CROSS JOIN cb{j} s
)"""


def _m8_sql() -> str:
    digests = "\n".join(
        f", md5(h{i - 1}) AS h{i}" if i > 1 else ""
        for i in range(2, EMB_DIM // 8 + 1)
    )
    comps = ", ".join(_m8_text_component(i) for i in range(EMB_DIM))
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS MATERIALIZED (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),
qh AS (
  SELECT doc_id AS query_id, md5(text) AS h1
         {digests}
  FROM documents WHERE doc_id % {M8_QUERY_MOD} = 0
),
qraw AS (
  SELECT query_id, [{comps}] AS v FROM qh
),
qnorm AS MATERIALIZED (
  SELECT query_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM qraw
),{','.join(_m8_subspace(j) for j in range(PQ_M))},
scored AS (
  SELECT c0.vec_id AS id, q0.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM code0 c0
  {' '.join(f'JOIN code{j} c{j} ON c{j}.vec_id = c0.vec_id' for j in range(1, PQ_M))}
  JOIN qt0 q0 ON q0.code = c0.code
  {' '.join(f'JOIN qt{j} q{j} ON q{j}.code = c{j}.code AND q{j}.query_id = q0.query_id' for j in range(1, PQ_M))}
  WHERE c0.vec_id <> q0.query_id
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine,
       d.source, d.lang
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN qnorm b ON b.query_id = r.query_id
JOIN documents d ON d.doc_id = r.id
WHERE r.rn <= {TOPK}
"""


_M8_SQL = _m8_sql()


# ---------------------------------------------------------------------------
# M7: video near-dup (operators/multimodal.py video_near_dup) — frame-
# sampled window fingerprints (pure SQL: md5+conv over payload windows at
# frame_sample_plan's sampled indices, NO Python at all for the highest-
# volume modality) feeding the SAME offset-tolerant aligned matcher as m6.
# Variants trim exactly one sampled stride (every_n frames x frame bytes =
# 80 chars) off the front, so true clips align at offset ±1.
# ---------------------------------------------------------------------------

M7_VARIANT_SHIFT = 4_000_000
M7_VARIANT_MOD = 4
M7_EVERY_N = 10
M7_MIN_FRAMES = 2
M7_MAX_HPF = 4
M7_MAX_WORD_FREQ = 50


def q_m7_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.multimodal import video_near_dup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % M7_VARIANT_MOD == 0).select(
            (F.col("doc_id") + M7_VARIANT_SHIFT).alias("doc_id"),
            F.expr("substring(text, 81)").alias("text"),
        )
    )
    assets = corpus.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return video_near_dup(
        assets, "doc_id", "payload",
        every_n=M7_EVERY_N,
        min_matching_frames=M7_MIN_FRAMES,
        max_hamming_per_frame=M7_MAX_HPF,
        max_word_freq=M7_MAX_WORD_FREQ,
    )


def _m7_frames_range() -> str:
    return (
        f"range(0, CAST(length(text) % 100 AS BIGINT) + 1, {M7_EVERY_N})"
    )


def _make_m7_sql() -> str:
    from delta_sorter_spark.operators.multimodal import VIDEO_FRAME_BYTES

    chain = _frame_match_ctes(
        "vd", _m7_frames_range(), VIDEO_FRAME_BYTES, 16,
        M7_MIN_FRAMES, M7_MAX_HPF, M7_MAX_WORD_FREQ,
    )
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {M7_VARIANT_SHIFT} AS doc_id, substr(text, 81) AS text
  FROM documents WHERE doc_id % {M7_VARIANT_MOD} = 0
),
{chain}
SELECT id_a, id_b, "offset", matching_frames, hamming FROM vdpairs
"""


# ---------------------------------------------------------------------------
# P7: tri-modal asset dedup — ONE corpus carrying exact re-uploads (image
# signal: m5's pHash), prefix-padded clips (audio signal: m6's aligned
# matcher), and front-trimmed clips (video signal: m7's sampled-frame
# matcher); the three pair sets union into one near-dup graph, connected
# components pick the keeper, and the report prices the bytes dedup
# saves.  Each modality's matcher is oracle-checked alone (m5/m6/m7);
# this entry proves the cross-modal COMPOSITION — a cluster formed by
# DIFFERENT signals (the mirror links via all three, the clips via one
# each) still resolves to a single keeper.
# ---------------------------------------------------------------------------

P7_MOD = 6
P7_SHIFT_IMG = 6_000_000   # exact mirror: all three signals fire
P7_SHIFT_AUD = 7_000_000   # 16-char prefix pad: audio alignment only
P7_SHIFT_VID = 8_000_000   # 80-char front trim: video alignment only


def q_p7_asset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.graph import connected_components
    from delta_sorter_spark.operators.multimodal import (
        audio_near_dup,
        phash_near_dup,
        video_near_dup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sel = docs.where(F.col("doc_id") % P7_MOD == 0)
    corpus = (
        docs
        .unionByName(sel.select(
            (F.col("doc_id") + P7_SHIFT_IMG).alias("doc_id"), "text"))
        .unionByName(sel.select(
            (F.col("doc_id") + P7_SHIFT_AUD).alias("doc_id"),
            F.concat(F.lit(M6_PREFIX), F.col("text")).alias("text")))
        .unionByName(sel.select(
            (F.col("doc_id") + P7_SHIFT_VID).alias("doc_id"),
            F.expr("substring(text, 81)").alias("text")))
    )
    assets = corpus.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    img = phash_near_dup(
        assets, "doc_id", "payload", max_hamming=M5_MAX_HAMMING
    ).select("id_a", "id_b")
    aud = audio_near_dup(
        assets, "doc_id", "payload",
        min_matching_frames=M6_MIN_FRAMES,
        max_hamming_per_frame=M6_MAX_HPF,
        max_word_freq=M6_MAX_WORD_FREQ,
    ).select("id_a", "id_b")
    vid = video_near_dup(
        assets, "doc_id", "payload",
        every_n=M7_EVERY_N,
        min_matching_frames=M7_MIN_FRAMES,
        max_hamming_per_frame=M7_MAX_HPF,
        max_word_freq=M7_MAX_WORD_FREQ,
    ).select("id_a", "id_b")
    pairs = img.unionByName(aud).unionByName(vid).dropDuplicates(
        ["id_a", "id_b"]
    )
    comps = connected_components(
        corpus.select("doc_id"), pairs, node_col="doc_id"
    )
    sized = corpus.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("nb"),
    )
    per = (
        comps.join(sized, comps["id"] == sized["doc_id"])
        .groupBy("component")
        .agg(
            F.count("*").cast("int").alias("cluster_size"),
            F.sum("nb").alias("tot"),
        )
        .where(F.col("cluster_size") >= 2)
    )
    return (
        per.join(
            sized.select(
                F.col("doc_id").alias("component"),
                F.col("nb").alias("kept_nb"),
            ),
            "component",
        )
        .select(
            F.col("component").alias("kept_id"),
            "cluster_size",
            (F.col("tot") - F.col("kept_nb")).cast("bigint").alias(
                "dropped_bytes"
            ),
        )
    )


def _make_p7_sql() -> str:
    from delta_sorter_spark.operators.multimodal import (
        FP_FRAME_BYTES,
        FP_FRAMES,
        VIDEO_FRAME_BYTES,
    )

    prefix = M6_PREFIX.replace("'", "''")
    corpus_sql = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {P7_SHIFT_IMG} AS doc_id, text FROM documents
  WHERE doc_id % {P7_MOD} = 0
  UNION ALL
  SELECT doc_id + {P7_SHIFT_AUD} AS doc_id, '{prefix}' || text AS text
  FROM documents WHERE doc_id % {P7_MOD} = 0
  UNION ALL
  SELECT doc_id + {P7_SHIFT_VID} AS doc_id, substr(text, 81) AS text
  FROM documents WHERE doc_id % {P7_MOD} = 0"""
    au = _frame_match_ctes(
        "au", f"range(0, {FP_FRAMES})", FP_FRAME_BYTES, FP_FRAMES,
        M6_MIN_FRAMES, M6_MAX_HPF, M6_MAX_WORD_FREQ,
    )
    vd = _frame_match_ctes(
        "vd", _m7_frames_range(), VIDEO_FRAME_BYTES, 16,
        M7_MIN_FRAMES, M7_MAX_HPF, M7_MAX_WORD_FREQ,
    )
    return f"""
WITH RECURSIVE {_m5_ctes(corpus_sql)},
{au},
{vd},
allpairs AS (
  SELECT id_a, id_b FROM phpairs
  UNION
  SELECT id_a, id_b FROM aupairs
  UNION
  SELECT id_a, id_b FROM vdpairs
),
bidir AS (
  SELECT id_a AS a, id_b AS b FROM allpairs
  UNION
  SELECT id_b AS a, id_a AS b FROM allpairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.src, e.b FROM reach r JOIN bidir e ON r.dst = e.a
),
comps AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
sized AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb FROM corpus),
per AS (
  SELECT c.component, CAST(count(*) AS INT) AS cluster_size,
         sum(s.nb) AS tot
  FROM comps c JOIN sized s USING (doc_id)
  GROUP BY c.component
)
SELECT p.component AS kept_id, p.cluster_size,
       CAST(p.tot - ks.nb AS BIGINT) AS dropped_bytes
FROM per p JOIN sized ks ON ks.doc_id = p.component
WHERE p.cluster_size >= 2
"""


def q_q27_ann_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18's exact lifecycle with `compact_ann_index` inserted after the
    final refresh: build (train half) -> append -> refresh -> copy-on-write
    DELETE -> refresh -> COMPACT (generational parts consolidated into one
    fresh dataset, old dirs vacuum-able) -> serve.  The oracle is q18's
    SQL verbatim — compaction MUST be invisible to every served value
    (frozen codebooks copied, authoritative codes preserved bit-for-bit).
    A vacuum between compact and serve also proves the new dataset is the
    one protected."""
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        compact_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.operators.dml import delete_where
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="q27_ann_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
        )
        tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
        refresh_ann_index(tbl, "embedding")
        delete_where(tbl, f"vec_id % {ANN_DELETE_MOD} = 3")
        refresh_ann_index(tbl, "embedding")
        info = compact_ann_index(tbl, "embedding")
        assert info["parts_in"] >= 2, info  # there WERE parts to fold
        tbl.vacuum()  # superseded generational dirs collectable NOW
        queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
        out = ann_topk(
            tbl, queries, "vec_id", "embedding", "embedding", k=TOPK
        ).select(
            "query_id",
            "id",
            "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# Q19: IVF-PQ registered index — q18's lifecycle with a coarse quantizer
# (build with n_centroids, refresh keeps new rows in FROZEN inverted lists,
# serve scans only each query's probed lists).  The oracle adds the coarse
# replay to q18's: coarse centroids trained on the BUILD half, live rows
# assigned to lists, queries probed, ADC restricted to matching lists.
# ---------------------------------------------------------------------------


def q_q19_ann_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="q19_ann_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
            n_centroids=IVFPQ_CENTROIDS,
        )
        tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
        refresh_ann_index(tbl, "embedding")
        queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
        out = ann_topk(
            tbl, queries, "vec_id", "embedding", "embedding",
            k=TOPK, n_probes=IVFPQ_PROBES,
        ).select(
            "query_id",
            "id",
            "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _q19_subspace(j: int) -> str:
    """q18's train/live split per subspace, without the delete filter
    (q19's lifecycle is build -> append -> refresh -> probed serve)."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
tsub{j} AS (
  SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus WHERE vec_id % 2 = 0
),
seed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM tsub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'tsub{j}', f'seed{j}', f'cb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'tsub{j}', f'cb{j}_1', f'cb{j}', _PQ_DSUB)},
code{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM (SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus) c
    CROSS JOIN cb{j} s) WHERE rn = 1
),
qt{j} AS (
  SELECT q.vec_id AS query_id, s.centroid AS code,
         {_duck_sq_l2('q.v', 's.cvec')} AS d
  FROM (SELECT vec_id, v[{lo}:{hi}] AS v FROM corpus
        WHERE vec_id % {QUERY_VEC_MOD} = 0) q
  CROSS JOIN cb{j} s
)"""


def _q19_sql() -> str:
    coarse_seed = f"""
coarse_seed AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM train))
  WHERE rn <= {IVFPQ_CENTROIDS}
)"""
    code_joins = " ".join(
        f"JOIN code{j} c{j} ON c{j}.vec_id = cl.vec_id" for j in range(PQ_M)
    )
    qt_joins = " ".join(
        f"JOIN qt{j} q{j} ON q{j}.code = c{j}.code AND q{j}.query_id = qp.query_id"
        for j in range(PQ_M)
    )
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS MATERIALIZED (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),
train AS (SELECT vec_id, v FROM corpus WHERE vec_id % 2 = 0),{coarse_seed},{_duck_pq_iter('train', 'coarse_seed', 'coarse1', EMB_DIM)},{_duck_pq_iter('train', 'coarse1', 'coarse', EMB_DIM)},
clist AS (
  SELECT vec_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s
    WHERE c.vec_id % {QUERY_VEC_MOD} = 0) WHERE rn <= {IVFPQ_PROBES}
),{','.join(_q19_subspace(j) for j in range(PQ_M))},
scored AS (
  SELECT cl.vec_id AS id, qp.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM clist cl
  JOIN qprobe qp ON qp.centroid = cl.centroid AND qp.query_id <> cl.vec_id
  {code_joins}
  {qt_joins}
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


_Q19_SQL = _q19_sql()


# ---------------------------------------------------------------------------
# P3: round-6 curation pipeline composed end-to-end under ONE oracle —
# C4 line cleaning (corpus-fit knobs) -> Gopher rule gate (corpus-fit
# thresholds) -> exact fingerprint dedup keep-lowest -> epoch-capped
# domain-mixing plan over the survivors.  Each stage is oracle-checked
# alone (e78/e77/p1-shape/e81); this entry proves they COMPOSE exactly.
# ---------------------------------------------------------------------------

P3_GOPHER_TH = {
    "min_stopword_hits": 1,
    "min_mean_word_len": 2.0,
    "max_top_ngram_char_frac": 1.0,
    "max_dup_ngram_char_frac": 1.0,
}
P3_BUDGET, P3_EPOCHS = 300, 2


def q_p3_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.quality import c4_clean, gopher_rules
    from delta_sorter_spark.operators.sampling import epoch_capped_mix
    from delta_sorter_spark.operators.textstats import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    kept = c4_clean(
        docs, "doc_id", "text",
        min_words_per_line=5, min_sentences=0, require_terminal_punct=False,
    ).where("doc_kept").select("doc_id")
    docs = docs.join(kept, "doc_id")
    passed = gopher_rules(
        docs, "doc_id", "text", thresholds=P3_GOPHER_TH
    ).where("gopher_pass").select("doc_id")
    docs = docs.join(passed, "doc_id")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    survivors = (
        fingerprint(docs, "doc_id", "text")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )
    return epoch_capped_mix(
        docs.join(survivors, "doc_id").select("doc_id", "source"),
        "source",
        budget=P3_BUDGET,
        max_epochs=P3_EPOCHS,
        weight_expr=ECM_WEIGHT,
    )


def _p3_sql() -> str:
    # stage 1: e78's kept-docs predicate (relaxed: no terminal punct, no
    # sentence minimum -> doc kept iff >=1 line with >=5 words, no
    # javascript line, no lorem ipsum, no brace)
    c4 = f"""
c4kept AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           len(list_filter(
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)), l -> l <> ''),
             l -> len(list_filter(string_split_regex(l, '\\s+'),
                                  w -> w <> '')) >= 5
                  AND NOT contains(lower(l), 'javascript'))) AS n_kept,
           contains(lower(text), 'lorem ipsum') AS lorem,
           contains(text, '{{') AS brace
    FROM documents
  ) WHERE n_kept > 0 AND NOT lorem AND NOT brace
)"""
    # stage 2: the Gopher gate under P3 thresholds — scalar rules only need
    # words/lines; the repetition conjuncts are disabled (threshold 1.0
    # can still fail if the raw fraction exceeds 1.0? no: dup_ngram_chars
    # counts every occurrence of duplicated grams, which can exceed
    # norm_chars — so replay them too, rounded, exactly like e77)
    gopher = f"""
gwords AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     w -> w <> '') AS words,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines
  FROM c4kept
),
gscal AS (
  SELECT doc_id, source, text, words,
         len(words) AS n_words,
         round(CAST(list_sum(list_transform(words, w -> length(w)))
               AS DOUBLE) / nullif(len(words), 0), 6) AS mean_word_len,
         round(CAST(length(text) - length(replace(text, '#', ''))
               + (length(text) - length(replace(text, '...', ''))) // 3
               + length(text) - length(replace(text, '…', '')) AS DOUBLE)
               / nullif(len(words), 0), 6) AS symbol_word_ratio,
         round(CAST(len(list_filter(lines,
                 l -> substring(l, 1, 1) IN ('•','‣','▪','-','*')))
               AS DOUBLE) / nullif(len(lines), 0), 6) AS bullet_line_frac,
         round(CAST(len(list_filter(lines,
                 l -> l LIKE '%...' OR l LIKE '%…'))
               AS DOUBLE) / nullif(len(lines), 0), 6) AS ellipsis_line_frac,
         round(CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
               AS DOUBLE) / nullif(len(words), 0), 6) AS alpha_word_frac,
         CAST(len(list_filter(['{_STOPW}'], s -> list_contains(words, s)))
              AS INT) AS stopword_hits,
         round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
               / nullif(len(lines), 0), 6) AS dup_line_frac,
         round(CAST(list_sum(list_transform(lines, l -> length(l)))
                    - list_sum(list_transform(list_distinct(lines),
                                              l -> length(l))) AS DOUBLE)
               / nullif(list_sum(list_transform(lines, l -> length(l))), 0),
               6) AS dup_line_char_frac,
         list_sum(list_transform(words, w -> length(w)))
           + greatest(len(words) - 1, 0) AS norm_chars
  FROM gwords
),
ggrams AS (
  SELECT doc_id, 't' AS tag,
         unnest(list_transform(
           range(1, greatest(len(words) - {GOPHER_TOP_N - 1}, 0) + 1),
           i -> array_to_string(
                  list_slice(words, i, i + {GOPHER_TOP_N - 1}), ' ')))
           AS gram
  FROM gscal
  UNION ALL
  SELECT doc_id, 'd',
         unnest(list_transform(
           range(1, greatest(len(words) - {GOPHER_DUP_N - 1}, 0) + 1),
           i -> array_to_string(
                  list_slice(words, i, i + {GOPHER_DUP_N - 1}), ' ')))
  FROM gscal
),
gng AS (
  SELECT doc_id,
         max(CASE WHEN tag = 't' THEN cnt * length(gram) END)
           AS top_ngram_chars,
         coalesce(sum(CASE WHEN tag = 'd' AND cnt > 1
                           THEN cnt * length(gram) END), 0)
           AS dup_ngram_chars
  FROM (SELECT doc_id, tag, gram, count(*) AS cnt
        FROM ggrams GROUP BY 1, 2, 3) GROUP BY 1
),
gpass AS (
  SELECT s.doc_id, s.source, s.text
  FROM gscal s LEFT JOIN gng USING (doc_id)
  WHERE coalesce(s.n_words BETWEEN 50 AND 100000
    AND s.mean_word_len BETWEEN {P3_GOPHER_TH['min_mean_word_len']} AND 10.0
    AND s.symbol_word_ratio <= 0.1
    AND s.bullet_line_frac <= 0.9
    AND s.ellipsis_line_frac <= 0.3
    AND s.alpha_word_frac >= 0.8
    AND s.stopword_hits >= {P3_GOPHER_TH['min_stopword_hits']}
    AND s.dup_line_frac <= 0.30
    AND s.dup_line_char_frac <= 0.20
    AND round(CAST(top_ngram_chars AS DOUBLE) / nullif(norm_chars, 0), 6)
        <= {P3_GOPHER_TH['max_top_ngram_char_frac']}
    AND round(CAST(coalesce(dup_ngram_chars, 0) AS DOUBLE)
              / nullif(norm_chars, 0), 6)
        <= {P3_GOPHER_TH['max_dup_ngram_char_frac']}, FALSE)
)"""
    # stage 3: exact fingerprint dedup keep-lowest (e11's fingerprint)
    dedup = """
survivors AS (
  SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (
             PARTITION BY substr(md5(lower(regexp_replace(trim(text),
                                           '\\s+', ' ', 'g'))), 1, 16)
             ORDER BY doc_id) AS rn
    FROM gpass
  ) WHERE rn = 1
)"""
    # stage 4: e81's windowed water-filling over the survivors
    mix = f"""
per AS (
  SELECT source, count(*) AS n_docs,
         CAST(max({ECM_WEIGHT}) AS BIGINT) AS weight,
         count(*) * {P3_EPOCHS} AS cap_docs
  FROM survivors GROUP BY source
), flagged AS (
  SELECT source, n_docs, weight, cap_docs,
         weight > 0 AND cap_docs * (sum(weight) OVER ()
                     - coalesce(sum(weight) OVER w_prior, 0))
           <= weight * ({P3_BUDGET}
                        - coalesce(sum(cap_docs) OVER w_prior, 0)) AS capped
  FROM per
  WINDOW w_prior AS (ORDER BY CAST(cap_docs AS DOUBLE) / weight, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), rem AS (
  SELECT source, n_docs, weight, cap_docs, capped,
         {P3_BUDGET} - coalesce(
           sum(CASE WHEN capped THEN cap_docs END) OVER (), 0) AS rem_budget,
         sum(weight) OVER () - coalesce(
           sum(CASE WHEN capped THEN weight END) OVER (), 0) AS rem_weight
  FROM flagged
)
SELECT source, n_docs, weight, cap_docs, capped,
       CAST(CASE WHEN capped THEN cap_docs
                 ELSE greatest((weight * rem_budget) // rem_weight, 0)
            END AS BIGINT) AS alloc_docs,
       (1000 * CAST(CASE WHEN capped THEN cap_docs
                         ELSE greatest((weight * rem_budget) // rem_weight, 0)
                    END AS BIGINT)) // n_docs AS epochs_milli
FROM rem"""
    return "WITH " + c4[1:] + "," + gopher[1:] + "," + dedup[1:] + "," + mix[1:]


_P3_SQL = _p3_sql()


# ---------------------------------------------------------------------------
# E82: residual IVF-PQ (ivf.ivfpq_residual_topk — the classic Jégou 2011
# form; e62 is the no-residual variant).  PQ codebooks train on and codes
# quantize x - coarse_centroid(x); each probe scores with ADC tables from
# ITS residual q - centroid.  The oracle replays the coarse k-means, the
# per-element residual subtraction, all subspace k-means over RESIDUALS,
# and the per-(query, probe) table scoring — the deepest relational replay
# in the registry.  (On the driver's random embeddings residuals cannot
# help recall — no cluster structure — so recall superiority is pinned on
# a CLUSTERED fixture in tests/test_ivf.py; this entry verifies exactness.)
# ---------------------------------------------------------------------------


def q_e82_residual_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_sorter_spark.operators.ivf import ivfpq_residual_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
    out = ivfpq_residual_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        dim=EMB_DIM, k=TOPK, m=PQ_M, n_codes=PQ_CODES,
        n_centroids=IVFPQ_CENTROIDS, n_probes=IVFPQ_PROBES, n_iters=2,
    )
    return out.select(
        "query_id", "id", "rank",
        F.round("approx_d", 6).alias("approx_d"),
        F.round("cosine", 6).alias("cosine"),
    )


def _e82_ressub(j: int) -> str:
    """Subspace-j residual k-means + codes + per-(query, probe) tables."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
rsub{j} AS (
  SELECT vec_id, rv[{lo}:{hi}] AS v FROM rescorp
),
rseed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM rsub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'rsub{j}', f'rseed{j}', f'rcb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'rsub{j}', f'rcb{j}_1', f'rcb{j}', _PQ_DSUB)},
rcode{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM rsub{j} c CROSS JOIN rcb{j} s) WHERE rn = 1
),
rqt{j} AS (
  SELECT qr.query_id, qr.pcent, s.centroid AS code,
         {_duck_sq_l2(f'qr.qrv[{lo}:{hi}]', 's.cvec')} AS d
  FROM qres qr CROSS JOIN rcb{j} s
)"""


def _e82_sql() -> str:
    coarse_seed = f"""
coarse_seed AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM corpus))
  WHERE rn <= {IVFPQ_CENTROIDS}
)"""
    dim_range = f"range(1, {EMB_DIM} + 1)"
    code_joins = " ".join(
        f"JOIN rcode{j} c{j} ON c{j}.vec_id = cl.vec_id" for j in range(PQ_M)
    )
    qt_joins = " ".join(
        f"JOIN rqt{j} q{j} ON q{j}.code = c{j}.code"
        f" AND q{j}.query_id = qp.query_id AND q{j}.pcent = cl.centroid"
        for j in range(PQ_M)
    )
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS MATERIALIZED (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),{coarse_seed},{_duck_pq_iter('corpus', 'coarse_seed', 'coarse1', EMB_DIM)},{_duck_pq_iter('corpus', 'coarse1', 'coarse', EMB_DIM)},
clist AS MATERIALIZED (
  SELECT vec_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s) WHERE rn = 1
),
rescorp AS MATERIALIZED (
  SELECT c.vec_id, cl.centroid,
         list_transform({dim_range}, i -> c.v[CAST(i AS INT)]
                                          - s.cvec[CAST(i AS INT)]) AS rv
  FROM corpus c JOIN clist cl USING (vec_id) JOIN coarse s USING (centroid)
),
qprobe AS (
  SELECT vec_id AS query_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s
    WHERE c.vec_id % {QUERY_VEC_MOD} = 0) WHERE rn <= {IVFPQ_PROBES}
),
qres AS MATERIALIZED (
  SELECT qp.query_id, qp.centroid AS pcent,
         list_transform({dim_range}, i -> c.v[CAST(i AS INT)]
                                          - s.cvec[CAST(i AS INT)]) AS qrv
  FROM qprobe qp
  JOIN corpus c ON c.vec_id = qp.query_id
  JOIN coarse s ON s.centroid = qp.centroid
),{','.join(_e82_ressub(j) for j in range(PQ_M))},
scored AS (
  SELECT cl.vec_id AS id, qp.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM clist cl
  JOIN qprobe qp ON qp.centroid = cl.centroid AND qp.query_id <> cl.vec_id
  {code_joins}
  {qt_joins}
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


_E82_SQL = _e82_sql()


# ---------------------------------------------------------------------------
# Q20: residual IVF-PQ REGISTERED index lifecycle — q19's arc (build on
# half -> append -> refresh -> probed serve) under e82's residual math:
# coarse + residual subspace codebooks train on the BUILD half only,
# refresh residualizes appended rows against the FROZEN coarse and encodes
# with the FROZEN codebooks, serving scores each probe with ITS residual's
# ADC tables.
# ---------------------------------------------------------------------------


def q_q20_ann_residual_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from delta_sorter_spark.operators.ann_index import (
        ann_topk,
        build_ann_index,
        refresh_ann_index,
    )
    from delta_sorter_spark.sources.delta_table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="q20_ann_")
    try:
        tbl = DeltaTable.create(
            spark, os.path.join(scratch, "t"),
            emb.where(F.col("vec_id") % 2 == 0).coalesce(2),
        )
        build_ann_index(
            tbl, "embedding", "vec_id", EMB_DIM,
            m=PQ_M, n_codes=PQ_CODES, n_iters=2,
            n_centroids=IVFPQ_CENTROIDS, residual=True,
        )
        tbl.append(emb.where(F.col("vec_id") % 2 == 1).coalesce(2))
        refresh_ann_index(tbl, "embedding")
        queries = emb.where(F.col("vec_id") % QUERY_VEC_MOD == 0)
        out = ann_topk(
            tbl, queries, "vec_id", "embedding", "embedding",
            k=TOPK, n_probes=IVFPQ_PROBES,
        ).select(
            "query_id", "id", "rank",
            F.round("approx_d", 6).alias("approx_d"),
            F.round("cosine", 6).alias("cosine"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _q20_ressub(j: int) -> str:
    """Subspace-j residual codebooks trained on the BUILD half's residuals,
    codes over every live row's residual."""
    lo, hi = j * _PQ_DSUB + 1, (j + 1) * _PQ_DSUB
    return f"""
trsub{j} AS (
  SELECT vec_id, rv[{lo}:{hi}] AS v FROM rescorp WHERE vec_id % 2 = 0
),
rsub{j} AS (
  SELECT vec_id, rv[{lo}:{hi}] AS v FROM rescorp
),
rseed{j} AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM trsub{j}))
  WHERE rn <= {PQ_CODES}
),{_duck_pq_iter(f'trsub{j}', f'rseed{j}', f'rcb{j}_1', _PQ_DSUB)},{_duck_pq_iter(f'trsub{j}', f'rcb{j}_1', f'rcb{j}', _PQ_DSUB)},
rcode{j} AS (
  SELECT vec_id, centroid AS code FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM rsub{j} c CROSS JOIN rcb{j} s) WHERE rn = 1
),
rqt{j} AS (
  SELECT qr.query_id, qr.pcent, s.centroid AS code,
         {_duck_sq_l2(f'qr.qrv[{lo}:{hi}]', 's.cvec')} AS d
  FROM qres qr CROSS JOIN rcb{j} s
)"""


def _q20_sql() -> str:
    coarse_seed = f"""
coarse_seed AS (
  SELECT CAST(rn - 1 AS INT) AS centroid, v AS cvec FROM (
    SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT vec_id, v,
             {duckdb_md5_long_sql('CAST(vec_id AS VARCHAR)')} % {MERSENNE_P} AS h
      FROM train))
  WHERE rn <= {IVFPQ_CENTROIDS}
)"""
    dim_range = f"range(1, {EMB_DIM} + 1)"
    code_joins = " ".join(
        f"JOIN rcode{j} c{j} ON c{j}.vec_id = cl.vec_id" for j in range(PQ_M)
    )
    qt_joins = " ".join(
        f"JOIN rqt{j} q{j} ON q{j}.code = c{j}.code"
        f" AND q{j}.query_id = qp.query_id AND q{j}.pcent = cl.centroid"
        for j in range(PQ_M)
    )
    return f"""
WITH corpus0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS MATERIALIZED (
  SELECT vec_id, list_transform(v, x -> x / sqrt({_SSQ.format(a='v')})) AS v
  FROM corpus0
),
train AS (SELECT vec_id, v FROM corpus WHERE vec_id % 2 = 0),{coarse_seed},{_duck_pq_iter('train', 'coarse_seed', 'coarse1', EMB_DIM)},{_duck_pq_iter('train', 'coarse1', 'coarse', EMB_DIM)},
clist AS MATERIALIZED (
  SELECT vec_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s) WHERE rn = 1
),
rescorp AS MATERIALIZED (
  SELECT c.vec_id, cl.centroid,
         list_transform({dim_range}, i -> c.v[CAST(i AS INT)]
                                          - s.cvec[CAST(i AS INT)]) AS rv
  FROM corpus c JOIN clist cl USING (vec_id) JOIN coarse s USING (centroid)
),
qprobe AS (
  SELECT vec_id AS query_id, centroid FROM (
    SELECT c.vec_id, s.centroid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_duck_sq_l2('c.v', 's.cvec')}, s.centroid) AS rn
    FROM corpus c CROSS JOIN coarse s
    WHERE c.vec_id % {QUERY_VEC_MOD} = 0) WHERE rn <= {IVFPQ_PROBES}
),
qres AS MATERIALIZED (
  SELECT qp.query_id, qp.centroid AS pcent,
         list_transform({dim_range}, i -> c.v[CAST(i AS INT)]
                                          - s.cvec[CAST(i AS INT)]) AS qrv
  FROM qprobe qp
  JOIN corpus c ON c.vec_id = qp.query_id
  JOIN coarse s ON s.centroid = qp.centroid
),{','.join(_q20_ressub(j) for j in range(PQ_M))},
scored AS (
  SELECT cl.vec_id AS id, qp.query_id,
         {' + '.join(f'q{j}.d' for j in range(PQ_M))} AS approx_d
  FROM clist cl
  JOIN qprobe qp ON qp.centroid = cl.centroid AND qp.query_id <> cl.vec_id
  {code_joins}
  {qt_joins}
),
ranked AS (
  SELECT query_id, id, approx_d,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d, id) AS rn
  FROM scored
)
SELECT r.query_id, r.id, r.rn AS "rank", round(r.approx_d, 6) AS approx_d,
       round({_DOT.format(a='a.v', b='b.v')}
         / (sqrt({_SSQ.format(a='a.v')}) * sqrt({_SSQ.format(a='b.v')})), 6) AS cosine
FROM ranked r
JOIN corpus a ON a.vec_id = r.id
JOIN corpus b ON b.vec_id = r.query_id
WHERE r.rn <= {TOPK}
"""


_Q20_SQL = _q20_sql()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validator's V1 per-file min/max over sf0.001."""
    return q_v1_file_minmax(spark, "/root/testdata/sf0.001")


# Queries whose IMPLEMENTATION changed this round: they must re-enter the
# driver-check budget even if their latest driver row is fresh and green.
# Round 5: e58 (single-exchange lead-window rewrite), a45 (full-tuple
# valid_to + row-existence is_current), e55 (type-agnostic tie-break),
# e42 (eager materialize + unpersist), e56/e57 (hits-join refactor behind
# the salt_factor hook), m2/m4 (pluggable decoder/embedder hooks),
# e59 (payload-carry rewrite: values ride the blocking windows).
_RECHECK_THIS_ROUND = [
    # round 9: drain the driver-staleness tail in ONE round (VERDICT r8
    # item #2) — every query whose latest driver row is r4 or r5 (42 of
    # them, fits the ~50 budget).  Pinning them to tier 1 stops this
    # round's NEW queries (tier 2, never-checked, last_round=-1) from
    # jumping the queue ahead of the stale tail.
    # -- last checked r4:
    "e33_semantic_dedup",
    "e52_containment_pairs",
    "e53_weighted_sample",
    "e54_hll_distinct",
    "m1_binary_meta",
    # -- last checked r5:
    "a36_grouping_sets",
    "a37_json_props",
    "a38_rank_windows",
    "a45_scd2_intervals",
    "a46_scd2_compress",
    "a47_corpus_profile",
    "a6_asof_join",
    "a8_range_join",
    "e23_hll_registers",
    "e24_hll_estimate",
    "e25_bloom_bits",
    "e26_bloom_prefilter",
    "e27_stratified_sample",
    "e28_top_terms",
    "e30_decontaminate",
    "e35_redaction",
    "e47_leakage_safe_split",
    "e56_repeated_spans",
    "e57_remove_spans",
    "e58_sorted_neighborhood",
    "e59_fuzzy_linkage",
    "e60_pq_ann",
    "e61_bpe_pairs",
    "e62_ivfpq_ann",
    "e63_hybrid_rrf",
    "e64_heavy_hitters",
    "e65_filtered_topk",
    "e66_doc_centrality",
    "e68_temperature_mix",
    "e69_repeated_lines",
    "e70_remove_lines",
    "e71_url_dedup",
    "e72_corpus_overlap",
    "m2_decoded_assets",
    "m4_embed_topk",
    "q6_restore",
    "q7_generated_columns",
    # round 9: compact grew the single-job many-partition mode (threshold
    # dispatch) — recheck the partition-sort contract query (the verdict's
    # own done-bar for the fix is "q2 hash unchanged").  The OTHER
    # changed-implementation queries (q5/s5 change feed, p5/q26 checkpoint
    # replay) keep their r7/r8 green rows and the per-commit sf0.001 local
    # gate: with SEVEN never-checked queries this round — e84, m8, s8,
    # q28, q29, q30, p8 — first-time driver rows take the remaining
    # budget: 42 stale + q2 + 7 new = 50 exactly.
    "q2_partition_sort",
]


def _registry_order(names) -> list[str]:
    """Driver-budget rotation: the checker covers the FIRST ~50 registry
    entries, so order queries (1) red at their latest driver check, (2)
    implementation-changed this round (_RECHECK_THIS_ROUND), (3) by
    staleness — never-checked first, then oldest latest-check round — with
    the name as a deterministic tiebreak.  Computed from the repo's
    CORRECTNESS_r*.json files at call time, so the rotation guarantee holds
    every round without hand-reordering (tests/test_registry_rotation.py
    pins the invariant)."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _rexp

    root = _os.path.dirname(_os.path.abspath(__file__))
    join = _os.path.join
    last_round: dict[str, int] = {}
    red: dict[str, bool] = {}
    for p in sorted(_glob.glob(join(root, "CORRECTNESS_r*.json"))):
        m = _rexp.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in data.items():
            if not isinstance(v, dict):
                continue
            last_round[k] = rnd
            red[k] = not (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            )
    recheck = set(_RECHECK_THIS_ROUND)

    def key(name: str):
        tier = 0 if red.get(name) else (1 if name in recheck else 2)
        return (tier, last_round.get(name, -1), name)

    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_unordered()
    return {k: base[k] for k in _registry_order(base.keys())}


def _queries_unordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registration order is arbitrary — queries() re-sorts through
    # _registry_order for driver-budget rotation.  Duplicate keys from the
    # tpch_extra splat keep their first position per dict semantics.
    return {
        # --- tier 1: red in round 2, oracle cast fixed ---
        "e29_quantized_topk": q_e29_quantized_topk,
        "e32_chunk_dedup": q_e32_chunk_dedup,
        "a26_shipmode_priority": tpch_extra.QUERIES["a26_shipmode_priority"],
        # --- tier 2: no driver row yet (past the r2 budget) ---
        "v2_file_sortedness": q_v2_file_sortedness,
        "v3_boundary_check": q_v3_boundary_check,
        "e34_unigram_surprisal": q_e34_unigram_surprisal,
        "e17_cms_sketch": q_e17_cms_sketch,
        "e18_cms_estimate": q_e18_cms_estimate,
        "e19_salted_distinct": q_e19_salted_distinct,
        "a11_running_total": q_a11_running_total,
        "a13_pivot": q_a13_pivot,
        # --- tier 3: new in round 3 (never checked) ---
        "e42_minhash_accuracy": q_e42_minhash_accuracy,
        "a39_latest_events": q_a39_latest_events,
        "p2_token_band": q_p2_token_band,
        "a40_funnel": q_a40_funnel,
        "a41_retention": q_a41_retention,
        "e43_bigram_lm": q_e43_bigram_lm,
        "e44_ann_recall": q_e44_ann_recall,
        "e45_bm25_topk": q_e45_bm25_topk,
        "e46_hashed_classifier": q_e46_hashed_classifier,
        "a42_resample_ffill": q_a42_resample_ffill,
        "e47_leakage_safe_split": q_e47_leakage_safe_split,
        "e48_sliding_chunks": q_e48_sliding_chunks,
        "e49_chunk_retrieval": q_e49_chunk_retrieval,
        "e50_fuzzy_decontaminate": q_e50_fuzzy_decontaminate,
        "e51_lm_quality": q_e51_lm_quality,
        # changed implementation this round -> recheck inside the budget
        "a23_revenue_deciles": q_a23_revenue_deciles,
        "e38_tfidf_terms": q_e38_tfidf_terms,
        # --- tier 4: round-1 greens, not re-confirmed since ---
        "v1_file_minmax": q_v1_file_minmax,
        "q1_global_sort": q_q1_global_sort,
        "q2_partition_sort": q_q2_partition_sort,
        "q3_partition_inventory": q_q3_partition_inventory,
        "q4_predicate_render": q_q4_predicate_render,
        "q5_change_feed": q_q5_change_feed,
        "q6_restore": q_q6_restore,
        "q7_generated_columns": q_q7_generated_columns,
        "q8_merge_full_sync": q_q8_merge_full_sync,
        "q9_update_where": q_q9_update_where,
        "q10_update_where_dv": q_q10_update_where_dv,
        "q11_merge_dv": q_q11_merge_dv,
        "q12_data_skipping": q_q12_data_skipping,
        "q13_stats_agg": q_q13_stats_agg,
        "q14_bloom_lookup": q_q14_bloom_lookup,
        "q15_check_constraints": q_q15_check_constraints,
        "q16_row_tracking": q_q16_row_tracking,
        "q17_identity": q_q17_identity,
        "q21_liquid_clustering": q_q21_liquid_clustering,
        "q22_type_widening": q_q22_type_widening,
        "q23_variant_events": q_q23_variant_events,
        "q24_v2_checkpoint": q_q24_v2_checkpoint,
        "q25_column_defaults": q_q25_column_defaults,
        "p5_lakehouse_lifecycle": q_p5_lakehouse_lifecycle,
        "q26_log_cleanup": q_q26_log_cleanup,
        "s7_stream_clustered_ingest": q_s7_stream_clustered_ingest,
        "e1_exact_dedup": q_e1_exact_dedup,
        "e2_minhash_sig": q_e2_minhash_sig,
        "e3_lsh_candidates": q_e3_lsh_candidates,
        "e4_simhash": q_e4_simhash,
        "e5_ngram_jaccard": q_e5_ngram_jaccard,
        "e6_topk_cosine": q_e6_topk_cosine,
        "e7_ann_lsh": q_e7_ann_lsh,
        "e8_token_stats": q_e8_token_stats,
        "e9_quality": q_e9_quality,
        "e10_lang_id": q_e10_lang_id,
        "e11_fingerprint": q_e11_fingerprint,
        "e12_zorder": q_e12_zorder,
        "e13_dup_clusters": q_e13_dup_clusters,
        "e14_embedding_neardup": q_e14_embedding_neardup,
        "e15_ivf_ann": q_e15_ivf_ann,
        "e33_semantic_dedup": q_e33_semantic_dedup,
        "e16_bpe_tokens": q_e16_bpe_tokens,
        "m1_binary_meta": q_m1_binary_meta,
        "m2_decoded_assets": q_m2_decoded_assets,
        "a1_pricing_summary": q_a1_pricing_summary,
        "a2_top_revenue_orders": q_a2_top_revenue_orders,
        "a3_regional_revenue": q_a3_regional_revenue,
        "a4_topk_per_priority": q_a4_topk_per_priority,
        "a5_rollup": q_a5_rollup,
        "a7_set_ops": q_a7_set_ops,
        "a9_promo_revenue": q_a9_promo_revenue,
        "e20_hash_split": q_e20_hash_split,
        "e21_pack_sequences": q_e21_pack_sequences,
        "e22_winnowing": q_e22_winnowing,
        "a12_quantiles": q_a12_quantiles,
        "a14_inactive_vip": q_a14_inactive_vip,
        # --- tier 5: round-2 greens (freshest driver rows) ---
        "e38_tfidf_terms": q_e38_tfidf_terms,
        "e39_domain_mix": q_e39_domain_mix,
        "e40_edit_distance": q_e40_edit_distance,
        "e41_histogram_quantiles": q_e41_histogram_quantiles,
        "a15_small_qty_revenue": q_a15_small_qty_revenue,
        "a16_late_ship_priority": q_a16_late_ship_priority,
        "a17_local_supplier_volume": q_a17_local_supplier_volume,
        "a19_volume_shipping": q_a19_volume_shipping,
        "a20_market_share": q_a20_market_share,
        "a21_product_profit": q_a21_product_profit,
        "a22_cube": q_a22_cube,
        "a36_grouping_sets": q_a36_grouping_sets,
        "a23_revenue_deciles": q_a23_revenue_deciles,
        "e30_decontaminate": q_e30_decontaminate,
        "e31_repetition": q_e31_repetition,
        "e23_hll_registers": q_e23_hll_registers,
        "e24_hll_estimate": q_e24_hll_estimate,
        "a18_trailing_window": q_a18_trailing_window,
        "e25_bloom_bits": q_e25_bloom_bits,
        "e27_stratified_sample": q_e27_stratified_sample,
        "e28_top_terms": q_e28_top_terms,
        "e26_bloom_prefilter": q_e26_bloom_prefilter,
        "p1_quality_dedup_pipeline": q_p1_quality_dedup_pipeline,
        "s4_sliding_windows": q_s4_sliding_windows,
        "s5_change_feed_stream": q_s5_change_feed_stream,
        "m3_frame_sample": q_m3_frame_sample,
        "e35_redaction": q_e35_redaction,
        "e36_hilbert": q_e36_hilbert,
        "a37_json_props": q_a37_json_props,
        "a38_rank_windows": q_a38_rank_windows,
        "e37_shuffle": q_e37_shuffle,
        **tpch_extra.QUERIES,
        "s1_event_windows": q_s1_event_windows,
        "s2_sessionize": q_s2_sessionize,
        "s3_enriched_events": q_s3_enriched_events,
        "a6_asof_join": q_a6_asof_join,
        "a8_range_join": q_a8_range_join,
        "a10_sql_surface": q_a10_sql_surface,
        # round-4 additions
        "e52_containment_pairs": q_e52_containment_pairs,
        "e53_weighted_sample": q_e53_weighted_sample,
        "e54_hll_distinct": q_e54_hll_distinct,
        "e55_dedup_keep_best": q_e55_dedup_keep_best,
        "e56_repeated_spans": q_e56_repeated_spans,
        "e57_remove_spans": q_e57_remove_spans,
        "e58_sorted_neighborhood": q_e58_sorted_neighborhood,
        "e59_fuzzy_linkage": q_e59_fuzzy_linkage,
        "e60_pq_ann": q_e60_pq_ann,
        "e61_bpe_pairs": q_e61_bpe_pairs,
        "e62_ivfpq_ann": q_e62_ivfpq_ann,
        "e63_hybrid_rrf": q_e63_hybrid_rrf,
        "e64_heavy_hitters": q_e64_heavy_hitters,
        "e65_filtered_topk": q_e65_filtered_topk,
        "e66_doc_centrality": q_e66_doc_centrality,
        "e67_bpe_train": q_e67_bpe_train,
        "e68_temperature_mix": q_e68_temperature_mix,
        "e69_repeated_lines": q_e69_repeated_lines,
        "e70_remove_lines": q_e70_remove_lines,
        "e71_url_dedup": q_e71_url_dedup,
        "e72_corpus_overlap": q_e72_corpus_overlap,
        "e73_unigram_train": q_e73_unigram_train,
        "e74_dsir_weights": q_e74_dsir_weights,
        "e77_gopher_rules": q_e77_gopher_rules,
        "e78_c4_clean": q_e78_c4_clean,
        "e83_html_extract": q_e83_html_extract,
        "e84_bigram_surprisal": q_e84_bigram_surprisal,
        "s8_stream_ann_freshness": q_s8_stream_ann_freshness,
        "q28_cdc_row_level": q_q28_cdc_row_level,
        "q29_incremental_rollup": q_q29_incremental_rollup,
        "q30_convert_to_delta": q_q30_convert_to_delta,
        "p8_cdc_multihop": q_p8_cdc_multihop,
        "s9_native_sink": q_s9_native_sink,
        "p6_crawl_pipeline": q_p6_crawl_pipeline,
        "s6_stream_dedup": q_s6_stream_dedup,
        "e79_wordpiece_train": q_e79_wordpiece_train,
        "e80_wordpiece_encode": q_e80_wordpiece_encode,
        "e81_epoch_capped_mix": q_e81_epoch_capped_mix,
        "q18_ann_index": q_q18_ann_index,
        "q19_ann_ivf_index": q_q19_ann_ivf_index,
        "p3_curation_pipeline": q_p3_curation_pipeline,
        "e82_residual_ivfpq": q_e82_residual_ivfpq,
        "q20_ann_residual_index": q_q20_ann_residual_index,
        "e75_unigram_encode": q_e75_unigram_encode,
        "e76_bpe_encode": q_e76_bpe_encode,
        "a47_corpus_profile": q_a47_corpus_profile,
        "m4_embed_topk": q_m4_embed_topk,
        "m5_phash_near_dup": q_m5_phash_near_dup,
        "m6_audio_near_dup": q_m6_audio_near_dup,
        "m7_video_near_dup": q_m7_video_near_dup,
        "m8_crossmodal_topk": q_m8_crossmodal_topk,
        "p7_asset_dedup": q_p7_asset_dedup,
        "q27_ann_compaction": q_q27_ann_compaction,
        "p4_multimodal_dedup_pipeline": q_p4_multimodal_dedup_pipeline,
        "a43_span_report": q_a43_span_report,
        "a44_snapshot_diff": q_a44_snapshot_diff,
        "a45_scd2_intervals": q_a45_scd2_intervals,
        "a46_scd2_compress": q_a46_scd2_compress,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "v1_file_minmax": _V1_SQL,
        "v2_file_sortedness": _V2_SQL,
        "v3_boundary_check": _V3_SQL,
        "q1_global_sort": _Q1_SQL,
        "q2_partition_sort": _Q2_SQL,
        "q3_partition_inventory": _Q3_SQL,
        "q4_predicate_render": _Q4_SQL,
        "q5_change_feed": _Q5_SQL,
        "q6_restore": _Q6_SQL,
        "q7_generated_columns": _Q7_SQL,
        "q8_merge_full_sync": _Q8_SQL,
        "q9_update_where": _Q9_SQL,
        "q10_update_where_dv": _Q10_SQL,
        "q11_merge_dv": _Q11_SQL,
        "q12_data_skipping": _Q12_SQL,
        "q13_stats_agg": _Q13_SQL,
        "q14_bloom_lookup": _Q14_SQL,
        "q15_check_constraints": _Q15_SQL,
        "q16_row_tracking": _Q16_SQL,
        "q17_identity": _Q17_SQL,
        "q21_liquid_clustering": _Q21_SQL,
        "q22_type_widening": _Q22_SQL,
        "q23_variant_events": _Q23_SQL,
        "q24_v2_checkpoint": _Q24_SQL,
        "q25_column_defaults": _Q25_SQL,
        "p5_lakehouse_lifecycle": _P5_SQL,
        "q26_log_cleanup": _Q26_SQL,
        "s7_stream_clustered_ingest": _S7_SQL,
        "e1_exact_dedup": _E1_SQL,
        "e2_minhash_sig": _E2_SQL,
        "e3_lsh_candidates": _E3_SQL,
        "e4_simhash": _E4_SQL,
        "e5_ngram_jaccard": _E5_SQL,
        "e6_topk_cosine": _E6_SQL,
        "e7_ann_lsh": _E7_SQL,
        "e8_token_stats": _E8_SQL,
        "e9_quality": _E9_SQL,
        "e10_lang_id": _E10_SQL,
        "e11_fingerprint": _E11_SQL,
        "e12_zorder": _E12_SQL,
        "e13_dup_clusters": _E13_SQL,
        "e14_embedding_neardup": _E14_SQL,
        "e15_ivf_ann": _E15_SQL,  # full iterative k-means replayed in SQL
        "e33_semantic_dedup": _E33_SQL,  # same k-means replay + cluster self-join
        "e34_unigram_surprisal": _E34_SQL,
        "e38_tfidf_terms": _E38_SQL,
        "e39_domain_mix": _E39_SQL,
        "e40_edit_distance": _E40_SQL,
        "e41_histogram_quantiles": _E41_SQL,
        "e42_minhash_accuracy": _E42_SQL,
        "a39_latest_events": _A39_SQL,
        "p2_token_band": _P2_SQL,
        "a40_funnel": _A40_SQL,
        "a41_retention": _A41_SQL,
        "e43_bigram_lm": _E43_SQL,
        "e44_ann_recall": _E44_SQL,
        "e45_bm25_topk": _E45_SQL,
        "e46_hashed_classifier": _E46_SQL,
        "a42_resample_ffill": _A42_SQL,
        "e47_leakage_safe_split": _E47_SQL,
        "e48_sliding_chunks": _E48_SQL,
        "e49_chunk_retrieval": _E49_SQL,
        "e50_fuzzy_decontaminate": _E50_SQL,
        "e51_lm_quality": _E51_SQL,
        "e52_containment_pairs": _E52_SQL,
        "e53_weighted_sample": _E53_SQL,
        "e54_hll_distinct": _E54_SQL,
        "e55_dedup_keep_best": _E55_SQL,
        "e56_repeated_spans": _E56_SQL,
        "e57_remove_spans": _E57_SQL,
        "e58_sorted_neighborhood": _E58_SQL,
        "e59_fuzzy_linkage": _E59_SQL,
        "e60_pq_ann": _E60_SQL,
        "e61_bpe_pairs": _E61_SQL,
        "e62_ivfpq_ann": _e62_sql(),
        "e63_hybrid_rrf": _e63_sql(),
        "e64_heavy_hitters": _E64_SQL,
        "e65_filtered_topk": _E65_SQL,
        "e66_doc_centrality": _E66_SQL,
        "e67_bpe_train": _E67_SQL,
        "e68_temperature_mix": _E68_SQL,
        "e69_repeated_lines": _E69_SQL,
        "e70_remove_lines": _E70_SQL,
        "e71_url_dedup": _E71_SQL,
        "e72_corpus_overlap": _E72_SQL,
        "e73_unigram_train": _E73_SQL,
        "e74_dsir_weights": _E74_SQL,
        "e77_gopher_rules": _E77_SQL,
        "e78_c4_clean": _E78_SQL,
        "e83_html_extract": _make_e83_sql(),
        "e84_bigram_surprisal": _E84_SQL,
        "s8_stream_ann_freshness": _Q18_SQL,
        "q28_cdc_row_level": _Q28_SQL,
        "q29_incremental_rollup": _Q29_SQL,
        "q30_convert_to_delta": _Q30_SQL,
        "p8_cdc_multihop": _P8_SQL,
        "s9_native_sink": _S9_SQL,
        "p6_crawl_pipeline": _make_p6_sql(),
        "s6_stream_dedup": _S6_SQL,
        "e79_wordpiece_train": _E79_SQL,
        "e80_wordpiece_encode": _E80_SQL,
        "e81_epoch_capped_mix": _E81_SQL,
        "q18_ann_index": _Q18_SQL,
        # compaction must be invisible to serving: q27's oracle IS q18's SQL
        "q27_ann_compaction": _Q18_SQL,
        "q19_ann_ivf_index": _Q19_SQL,
        "p3_curation_pipeline": _P3_SQL,
        "e82_residual_ivfpq": _E82_SQL,
        "q20_ann_residual_index": _Q20_SQL,
        "e75_unigram_encode": _E75_SQL,
        "e76_bpe_encode": _E76_SQL,
        "a47_corpus_profile": _A47_SQL,
        "m4_embed_topk": _M4_SQL,
        "m5_phash_near_dup": _M5_SQL,
        "m6_audio_near_dup": _make_m6_sql(),
        "m7_video_near_dup": _make_m7_sql(),
        "m8_crossmodal_topk": _M8_SQL,
        "p7_asset_dedup": _make_p7_sql(),
        "p4_multimodal_dedup_pipeline": _P4_SQL,
        "a43_span_report": _A43_SQL,
        "a44_snapshot_diff": _A44_SQL,
        "a45_scd2_intervals": _A45_SQL,
        "a46_scd2_compress": _A46_SQL,
        "e16_bpe_tokens": _E16_SQL,
        "s1_event_windows": _S1_SQL,
        "s2_sessionize": _S2_SQL,
        "s3_enriched_events": _S3_SQL,
        "m1_binary_meta": _M1_SQL,
        "m2_decoded_assets": _M2_SQL,
        "a1_pricing_summary": _A1_SQL,
        "a2_top_revenue_orders": _A2_SQL,
        "a3_regional_revenue": _A3_SQL,
        "a4_topk_per_priority": _A4_SQL,
        "a5_rollup": _A5_SQL,
        "a6_asof_join": _A6_SQL,
        "a7_set_ops": _A7_SQL,
        "a8_range_join": _A8_SQL,
        "a9_promo_revenue": _A9_SQL,
        "a10_sql_surface": _A10_SQL,
        "e17_cms_sketch": _E17_SQL,
        "e18_cms_estimate": _E18_SQL,
        "e19_salted_distinct": _E19_SQL,
        "e20_hash_split": _E20_SQL,
        "e21_pack_sequences": _E21_SQL,
        "e22_winnowing": _E22_SQL,
        "a11_running_total": _A11_SQL,
        "a12_quantiles": _A12_SQL,
        "a13_pivot": _A13_SQL,
        "a14_inactive_vip": _A14_SQL,
        "a15_small_qty_revenue": _A15_SQL,
        "a16_late_ship_priority": _A16_SQL,
        "a17_local_supplier_volume": _A17_SQL,
        "a19_volume_shipping": _A19_SQL,
        "a20_market_share": _A20_SQL,
        "a21_product_profit": _A21_SQL,
        "a22_cube": _A22_SQL,
        "a36_grouping_sets": _A36_SQL,
        "a23_revenue_deciles": _A23_SQL,
        "e29_quantized_topk": _E29_SQL,
        "e30_decontaminate": _E30_SQL,
        "e31_repetition": _E31_SQL,
        "e23_hll_registers": _make_e23_sql(),
        "e24_hll_estimate": _make_e24_sql(),
        "a18_trailing_window": _A18_SQL,
        "e25_bloom_bits": _E25_SQL,
        "e27_stratified_sample": _make_e27_sql(),
        "e28_top_terms": _E28_SQL,
        "e26_bloom_prefilter": _E26_SQL,
        "p1_quality_dedup_pipeline": _P1_SQL,
        "s4_sliding_windows": _S4_SQL,
        "s5_change_feed_stream": _S5_SQL,
        "e32_chunk_dedup": _E32_SQL,
        "m3_frame_sample": _M3_SQL,
        "e35_redaction": _E35_SQL,
        "e36_hilbert": _E36_SQL,
        "a37_json_props": _A37_SQL,
        "a38_rank_windows": _A38_SQL,
        "e37_shuffle": _E37_SQL,
        **tpch_extra.ORACLES,
    }
