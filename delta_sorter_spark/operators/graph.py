"""Connected components over near-duplicate pair graphs (the step that turns
E2's candidate pairs into dedup *clusters*: every component keeps one
canonical representative).

Implemented as iterative min-label propagation with DataFrame joins — the
Pregel-lite pattern:

    label(v) <- min(label(v), min over neighbors' labels)   # propagate
    label(v) <- min(label(v), label(label(v)))              # pointer jump

repeated until fixpoint.  The pointer-jump step halves the remaining
distance to the component minimum each round, so convergence needs
O(log diameter) rounds — robust even for the long-chain components that
plain propagation (O(diameter)) crawls through.  Near-dup graphs are
overwhelmingly short-diameter clusters, so typical runs still finish in a
handful of rounds.  Each round is ONE Spark job: the per-round change
count rides along as a flag column summed from the freshly checkpointed
labels (no separate old-vs-new comparison join), and ``localCheckpoint``
cuts the lineage so plans don't grow with iteration count.

The result is deterministic (unique fixpoint: every node labeled with the
minimum node id reachable from it), which makes the operator
oracle-checkable via a recursive CTE in DuckDB (see __spark_entry__
``e13_dup_clusters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Right-sizing for the per-iteration edge caches (guide §2.2 "fewer, larger
# partitions" + VERDICT r9 #1): an edge row is two BIGINTs (~16-50 bytes in
# memory), so 2M rows/partition keeps cached partitions in the tens-of-MB
# band.  The iteration loops below scan their cached edge frame several
# times per round; without this, a tiny similarity graph inherits
# 2 x spark.sql.shuffle.partitions partitions from its union/distinct
# lineage and every round schedules hundreds of near-empty tasks (measured:
# e66_doc_centrality ran 1284 tasks at local[32] for a 5k-node graph, and
# the driver's 8-core bench beat its 32-core bench 3.2 s vs 12.5 s on the
# same code).  Large graphs are untouched: coalesce never increases the
# partition count, so at 100 TB the cache keeps its layout.
EDGE_ROWS_PER_PARTITION = 2_000_000


def _rightsize_cached_edges(df: DataFrame, n_rows: int) -> DataFrame:
    """Re-cache an already-materialized edge frame at a row-count-derived
    partition count.  ``df`` must be persisted and counted; the returned
    frame is persisted (cache-to-cache coalesce — one cheap pass, no
    recompute of the edge-generation lineage) and replaces it."""
    parts = df.rdd.getNumPartitions()
    target = max(1, min(parts, -(-n_rows // EDGE_ROWS_PER_PARTITION)))
    if target >= parts:
        return df
    sized = df.coalesce(target).persist()
    sized.count()
    df.unpersist()
    return sized


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    edge_a: str = "id_a",
    edge_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) where component = min node id reachable via edges.

    ``nodes`` must contain every vertex (isolated vertices form singleton
    components); ``edges`` is undirected (one row per pair, either order).
    """
    # Persist the symmetrized edge list ONCE: it is joined every iteration,
    # and without the cache the edge-GENERATION lineage upstream (e.g. a
    # minhash -> banding -> verification candidate pipeline) re-executes
    # per round — the same per-iteration re-execution pagerank() below had
    # before its edge cache.  The result labels are localCheckpointed each
    # round, so releasing the cache on return is safe.
    bidir = (
        edges.select(F.col(edge_a).alias("src"), F.col(edge_b).alias("dst"))
        .unionByName(edges.select(F.col(edge_b).alias("src"), F.col(edge_a).alias("dst")))
        .distinct()
        .persist()
    )
    # materialize the cache once and right-size it: every iteration scans
    # it 3x (neighbor-min join feeds it; the two label joins rescan labels),
    # and the union lineage otherwise leaves 2 x shuffle.partitions
    # near-empty cached partitions driving per-round task counts (§2.2)
    bidir = _rightsize_cached_edges(bidir, bidir.count())
    labels = nodes.select(F.col(node_col).alias("id"), F.col(node_col).alias("component"))
    for _ in range(max_iterations):
        neighbor_min = (
            bidir.join(labels, bidir.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
            (
                F.coalesce(F.col("nmin"), F.col("component")) < F.col("component")
            ).cast("long").alias("__chg__"),
        )
        # pointer jump: label(v) <- label(label(v)).  Every label is a node
        # id whose OWN label is at most as large (labels only decrease and
        # were propagated along paths), so jumping stays within the
        # component and halves the remaining distance to its minimum.
        ptr = stepped.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        jumped = stepped.join(
            ptr, stepped.component == ptr.pid, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))
            ).alias("component"),
            (
                F.col("__chg__")
                + (
                    F.coalesce(F.col("pcomp"), F.col("component"))
                    < F.col("component")
                ).cast("long")
            ).alias("__chg__"),
        )
        jumped = jumped.localCheckpoint(eager=True)
        # changed-count folds into a scan of the partitions the checkpoint
        # just materialized — no second shuffle join against the old labels
        changed = jumped.agg(F.sum("__chg__").alias("c")).first()["c"] or 0
        labels = jumped.drop("__chg__")
        if changed == 0:
            break
    bidir.unpersist()
    return labels


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    edge_a: str = "id_a",
    edge_b: str = "id_b",
) -> DataFrame:
    """Keep one row per near-duplicate cluster (the minimum id); rows not in
    any pair survive as their own singleton component."""
    comps = connected_components(
        df.select(F.col(id_col)), pairs, node_col=id_col, edge_a=edge_a, edge_b=edge_b
    )
    keep = comps.where(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def leakage_safe_split(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    edge_a: str = "id_a",
    edge_b: str = "id_b",
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: str = "split-v1",
    max_iterations: int = 25,
) -> DataFrame:
    """Train/val/test assignment that keeps every near-duplicate cluster in
    ONE split: independent per-document hashing leaks paraphrases of the
    training set into eval, so the split key must be the connected
    component, not the document.

    Output: (id, component, split) — join back onto the corpus by id.
    Deterministic end-to-end (md5 bucketing of the component id, the same
    scheme as sampling.hash_split), so re-running on an unchanged pair
    graph reproduces the split exactly."""
    from delta_sorter_spark.operators.sampling import hash_split

    comps = connected_components(
        nodes, edges, node_col=node_col, edge_a=edge_a, edge_b=edge_b,
        max_iterations=max_iterations,
    )
    return hash_split(comps, "component", splits=splits, seed=seed)


PR_SCALE = 10**12  # fixed-point scale for integer PageRank mass


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list — (id, rank_q).

    The curation use is LexRank/TextRank-style centrality (Erkan & Radev
    2004; Mihalcea & Tarau 2004): run it over a document SIMILARITY graph
    (each near-dup pair as an edge in both directions) and the rank scores
    which documents are most central to a cluster — e.g. pick the canonical
    page of a template family, or weight web-corpus sampling by host-graph
    authority.

    All arithmetic is integer fixed-point so the iterative distributed
    computation is bit-reproducible in ANY engine (the same trick as the
    k-means in operators/ivf.py): ranks are BIGINT masses summing to
    ``scale``; one step is

        rank'(v) = base + (damping_pct * (incoming(v) + dangling DIV N)) DIV 100
        incoming(v) = sum over in-edges (u,v) of rank(u) DIV outdeg(u)

    with ``base = (scale * (100-damping_pct) DIV 100) DIV N`` and
    ``dangling`` the summed mass of zero-outdegree nodes (redistributed
    uniformly, the standard dangling-node treatment).  Every operation is
    BIGINT ``DIV``/``+``/``*`` — associative and order-independent — so a
    DuckDB oracle replaying the same iterations matches hash-exact (see
    __spark_entry__ ``e66_doc_centrality``).  The floor divisions leak
    ≤ 1 ulp of mass per term per iteration; with scale 1e12 the relative
    quantization error is ~1e-9 per step, far under any ranking use.

    Scale shape: each iteration is one equi-join of the rank vector with
    the (outdeg-annotated) edge list on ``src``, one ``groupBy(dst)`` with
    map-side partial sums, and one left join back onto the node set — all
    hash-partitioned on node id, O(edges) per iteration, no all-pairs
    anywhere.  The dangling term is a single-row aggregate broadcast back
    in.  ``localCheckpoint`` cuts lineage each round (the rank vector
    feeds two consumers), so plans don't grow with ``n_iters``; the raw
    edge frame is persisted once for the loop — degree and edge+degree
    views derive from that cache — and unpersisted before return (safe:
    the checkpointed result no longer references it).

    ``nodes`` must contain every vertex; edges whose src is not a node
    still contribute (callers should restrict edges to the node set).
    """
    n = nodes.count()
    out_schema_nodes = nodes.select(F.col(node_col).alias("id"))
    if n == 0:
        return out_schema_nodes.withColumn("rank_q", F.lit(0).cast("long"))
    base = (scale * (100 - damping_pct) // 100) // n
    init_q = scale // n
    # The raw edge frame persists ONCE: deg (per-iteration dangling
    # anti-join) and eb (contribution join) both derive from the cache, so
    # the possibly-expensive edge-generation lineage upstream (e.g. a
    # similarity-pair pipeline) executes exactly one time no matter how
    # many iterations or consumers follow (measured 38 s -> pair-gen cost
    # on the e66 similarity graph at sf0.1).
    ed = edges.select(
        F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
    ).persist()
    # materialize + right-size the cache before the loop: each iteration
    # derives deg and eb from it (2-3 scans/round), so a tiny graph's
    # 2 x shuffle.partitions union lineage would otherwise schedule
    # hundreds of near-empty tasks per round (§2.2; see constant above)
    ed = _rightsize_cached_edges(ed, ed.count())
    deg = ed.groupBy("__src__").agg(F.count(F.lit(1)).alias("__deg__"))
    eb = ed.join(deg, "__src__")
    ranks = out_schema_nodes.withColumn("rank_q", F.lit(init_q).cast("long"))
    for _ in range(n_iters):
        contrib = (
            ranks.join(eb, ranks["id"] == eb["__src__"])
            .select(
                F.col("__dst__").alias("id"),
                F.expr("rank_q DIV __deg__").alias("__c__"),
            )
            .groupBy("id")
            .agg(F.sum("__c__").alias("__in__"))
        )
        dangling = ranks.join(
            deg, ranks["id"] == deg["__src__"], "left_anti"
        ).agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("long").alias("__dq__"))
        ranks = (
            ranks.select("id")
            .join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                F.expr(
                    f"CAST({base} + ({damping_pct} * (coalesce(__in__, CAST(0 AS BIGINT))"
                    f" + __dq__ DIV {n})) DIV 100 AS BIGINT)"
                ).alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    ed.unpersist()
    return ranks.select(F.col("id").alias(node_col), "rank_q")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    edge_a: str = "id_a",
    edge_b: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster dedup: keep, per near-duplicate cluster, the
    row with the HIGHEST ``score_col`` (ties: smallest id) — the production
    refinement of :func:`dedup_representatives`, which keeps the minimum id
    regardless of quality.  A dedup pass that discards the well-formatted
    canonical page and keeps its boilerplate-laden mirror loses training
    value; scoring the representative fixes that.

    Components come from :func:`connected_components` (min-label +
    pointer-jumping, O(log diameter) rounds); the per-cluster argmax is a
    two-stage aggregation — per-component ``max(score)``, then ``min(id)``
    restricted to max-score rows — so the tie-break is TYPE-AGNOSTIC (string
    / UUID ids work; a ``-id`` negation trick would silently cast non-numeric
    ids to null and break ties nondeterministically).  Both aggregations and
    the join key the same ``component`` column, so Catalyst reuses one
    exchange of the scored corpus; each stage carries map-side-combined
    partials — never a row_number window over raw rows.  Components whose
    scores are all NULL still keep their smallest id (null-safe equality).
    Output: the surviving rows of ``df``."""
    comps = connected_components(
        df.select(F.col(id_col)), pairs, node_col=id_col, edge_a=edge_a, edge_b=edge_b
    )
    scored = df.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("__score__")
    ).join(comps, "id")
    mx = scored.groupBy("component").agg(F.max("__score__").alias("__mx__"))
    best = (
        scored.join(mx, "component")
        .where(F.col("__score__").eqNullSafe(F.col("__mx__")))
        .groupBy("component")
        .agg(F.min("id").alias("keep_id"))
    )
    return df.join(
        best.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )
