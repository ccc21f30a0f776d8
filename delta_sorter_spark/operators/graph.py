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
    bidir = (
        edges.select(F.col(edge_a).alias("src"), F.col(edge_b).alias("dst"))
        .unionByName(edges.select(F.col(edge_b).alias("src"), F.col(edge_a).alias("dst")))
        .distinct()
    )
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
