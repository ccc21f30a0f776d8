"""Physical-plan audit for every driver-contract query: extracts the
scale-relevant properties (scan pruning, pushed filters, join strategies,
exchange counts, codegen coverage, Python boundaries) and writes PLANS.md.

Usage: python tools/plan_report.py [sf_dir]

This is the repo's standing answer to "would this plan survive a 100x
scale-up?": cartesian products, missing pushdown, or sort-merge joins where
a broadcast was intended show up as a diff in PLANS.md.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

# Queries where an all-pairs shape is the INTENDED exact/verification path
# (the scale path is the blocked/bucketed sibling operator).
EXPECTED_ALLPAIRS = {
    "e5_ngram_jaccard",       # exact Jaccard verification path
    "e6_topk_cosine",         # exact top-k baseline (queries broadcast)
    "e29_quantized_topk",     # same broadcast all-pairs shape as e6, int8 scores
    "e14_embedding_neardup",  # exact near-dup verification path
    "e15_ivf_ann",            # broadcast cross join vs 16 constant centroids
    "e60_pq_ann",             # ADC scoring broadcasts the query+table side (e6 shape); encode is the same constant-centroid cross join as e15
    "e62_ivfpq_ann",          # coarse assign + codes are constant-centroid cross joins (e15 shape); candidates restricted by the centroid equi-join
    "e33_semantic_dedup",     # same k-means assignment cross join as e15
    "a14_inactive_vip",       # scalar-subquery threshold: NLJ vs ONE agg row
    "e24_hll_estimate",       # 1x1 cross join of two single-row aggregates
    "e26_bloom_prefilter",    # one-row collected-bitset broadcast to probe side
    "a25_important_stock",    # one-row grand-total broadcast (division-free Q11)
    "a27_top_supplier",       # one-row max-revenue broadcast (Q15 scalar max)
    "a23_revenue_deciles",    # one-row customer-count broadcast (decile divisor)
    "p2_token_band",          # one-row [p10, p90] band broadcast (filter cutoffs)
    "e38_tfidf_terms",        # one-row n_docs broadcast into the vocab table
    "e66_doc_centrality",     # one-row dangling-mass aggregate broadcast per PageRank iteration
    "e68_temperature_mix",    # one-row total-weight aggregate broadcast into the rate table
    "e44_ann_recall",         # contains e6's exact brute-force side by design
    "e45_bm25_topk",          # one-row (n_docs, total_len) stats broadcast
    "e49_chunk_retrieval",    # same BM25 one-row stats broadcast over chunks
    "m4_embed_topk",          # e6's exact brute-force shape over stub embeddings
    "e63_hybrid_rrf",         # dense side is e6's exact broadcast all-pairs; lexical side carries e45's one-row stats broadcast
    "e64_heavy_hitters",      # one-row total-count broadcast into the threshold filter
    "e72_corpus_overlap",     # 1x1 cross join of two single-row sketch aggregates (e24 shape)
    "q18_ann_index",          # codes-only serve: ADC tables broadcast the query+codebook side (e60 shape); exact cosine joins the shortlist back to the table (BHJ)
    "m8_crossmodal_topk",     # q18's flat ADC serve shape driven by text-query embeddings (the cross join broadcasts ~10 query rows)
    "q27_ann_compaction",     # q18's serve shape from the compacted single-part dataset
    "q19_ann_ivf_index",      # probe assignment + ADC tables are one-row packed-codebook broadcasts (e62 shape); candidates restricted by the centroid equi-join over a probe-pruned codes scan
    "e82_residual_ivfpq",     # residual IVF-PQ: same constant-broadcast shapes as e62 plus the residual coarse join; candidates restricted by the centroid equi-join
    "q20_ann_residual_index", # registered residual lifecycle: e82's serve shape from persisted datasets
}


def strip_cached_subtrees(plan: str) -> str:
    """Drop every InMemoryRelation node and its nested child lines: those
    describe how a cache WAS populated, not what this plan executes — the
    runtime reads the cache via the InMemoryTableScan leaf (which stays and
    is counted in the `cached` column).  Counting the nested FileScans
    would misreport a cache-served query (e.g. e42) as re-scanning its
    inputs once per branch."""
    out, skip_indent = [], None
    for line in plan.splitlines():
        m = re.search(r"[+:]- ", line)
        indent = m.start() if m else -1
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def audit(plan: str) -> dict:
    plan = strip_cached_subtrees(plan)
    return {
        "scans": plan.count("FileScan"),
        "cached": plan.count("InMemoryTableScan"),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "exchanges": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "nlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "python": ("ArrowEvalPython" in plan)
        or ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-report")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit of every driver-contract query",
        "",
        f"Generated by `tools/plan_report.py` at `{sf_dir}` (initial plans,",
        "pre-AQE).  Columns: LIVE file scans (cache-population subtrees",
        "excluded), cache reads (InMemoryTableScan), filter pushdown reached",
        "the scan, exchange (shuffle/broadcast) operators, broadcast-hash /",
        "sort-merge / nested-loop-or-cartesian joins, Arrow/Pandas boundary",
        "present.  (Codegen spans are not visible in pre-AQE plan strings.)",
        "",
        "Nested-loop entries are the *intended exact all-pairs verification"
        " paths* (e5/e6/e14); their scale siblings (e3 banding, e7 LSH, blocked"
        " near-dup) bucket first; e15's cross join is against 16 constant"
        " centroid rows, not data x data; a14's is a one-row scalar-subquery"
        " threshold broadcast.",
        "",
        "Lifecycle queries (q15-q25, m-series composites) return eagerly"
        " checkpointed frames, so their rows show the REPLAY's plan (trivial),"
        " not the lifecycle's — those shapes are audited where they live:"
        " clustering OPTIMIZE is one repartitionByRange(curve) exchange +"
        " per-range sort over ONLY candidate files (operators/cluster.py),"
        " the strict-sort write shape with the Hilbert/Morton value as key.",
        "",
        "| query | scans | cached | pushdown | exch | BHJ | SMJ | NLJ/cart | python |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    problems = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        lines.append(
            f"| {name} | {a['scans']} | {a['cached']} |"
            f" {'y' if a['pushed'] else '-'} |"
            f" {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['nlj']} |"
            f" {'y' if a['python'] else '-'} |"
        )
        if a["nlj"] and name not in EXPECTED_ALLPAIRS:
            problems.append(f"{name}: unexpected nested-loop/cartesian join")
        print(f"{name}: {a}")
    if problems:
        lines += ["", "## PROBLEMS", ""] + [f"- {p}" for p in problems]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"\n{len(problems)} problems; wrote PLANS.md")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
