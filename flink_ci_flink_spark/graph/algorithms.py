"""Graph algorithms on DataFrames (Gelly-library parity, SURVEY.md §2.13).

Reference: `flink-libraries/flink-gelly/.../graph/Graph.java` + algorithms in
`graph/library/` (ConnectedComponents, SingleSourceShortestPaths,
LabelPropagation, PageRank in linkanalysis/). The reference runs these on
BSP-style delta iterations; the Spark-first equivalent is the GraphFrames
pattern — a driver loop of join + groupBy ("aggregateMessages"), letting
Catalyst/AQE plan each superstep. We port the algorithm RESULTS, not the BSP
machinery.

Conventions: vertices DataFrame with column `id` (+ optional attributes);
edges DataFrame with `src`, `dst` (+ optional `weight`). Edges are treated
as directed; pass both directions for undirected semantics (helper below).

Scale notes: each superstep is one shuffle on the join key. For long chains
Spark's lineage grows — `localCheckpoint` every few iterations truncates it
(the same role as Flink's iteration-intermediate materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 1


def undirect(edges: DataFrame) -> DataFrame:
    """Add reversed edges (undirected interpretation)."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        *[c for c in edges.columns if c not in ("src", "dst")],
    )
    return edges.unionByName(rev)


def _maybe_checkpoint(df: DataFrame, i: int) -> DataFrame:
    if (i + 1) % CHECKPOINT_EVERY == 0:
        return df.localCheckpoint(eager=True)
    return df


def connected_components(
    vertices: DataFrame | None, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Min-label propagation: component = min vertex id reachable.

    Ref: `graph/library/ConnectedComponents.java` (scatter-gather min-id).
    Converges in O(diameter) supersteps; early-exits when no label changes.
    ``vertices=None`` derives the vertex set from the (materialized) edges —
    preferred when the edge list has an expensive upstream, since a separate
    vertices DataFrame would re-execute that lineage. Output: (id, component)."""
    # Materialize the edge list once: every superstep re-executes its
    # lineage otherwise (an expensive upstream — e.g. a similarity join —
    # would run once per iteration).
    e = undirect(edges.select("src", "dst")).localCheckpoint(eager=True)
    if vertices is None:
        vertices = e.select(F.col("src").alias("id")).distinct()
    labels = vertices.select(F.col("id"), F.col("id").alias("component"))
    for i in range(max_iter):
        msgs = (
            e.join(labels, e.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        new_labels = _maybe_checkpoint(new_labels, i)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Classic PageRank, `iterations` fixed supersteps.

    Ref: `graph/library/linkanalysis/PageRank.java`. Dangling-node mass is
    redistributed uniformly each step (sum(rank) stays 1). Output: (id, rank)."""
    n = vertices.count()
    edges = edges.localCheckpoint(eager=True)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).localCheckpoint(
        eager=True
    )
    ranks = vertices.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(out_deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            vertices.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        ranks = _maybe_checkpoint(ranks, i)
    return ranks


def sssp(
    edges: DataFrame, source, max_iter: int = 10, weight_col: str | None = "weight"
) -> DataFrame:
    """Single-source shortest paths (≤ max_iter hops), Bellman-Ford supersteps.

    Ref: `graph/library/SingleSourceShortestPaths.java`. Output: (id, dist)
    for reachable vertices only."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.cast("double").alias("w")).localCheckpoint(
        eager=True
    )
    dists = e.select(F.lit(source).alias("id"), F.lit(0.0).alias("dist")).distinct()
    for i in range(max_iter):
        relaxed = (
            e.join(dists, e.src == dists.id)
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        new_dists = (
            dists.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        new_dists = _maybe_checkpoint(new_dists, i)
        # converged when no distance improved and no new vertex appeared
        if (
            new_dists.alias("n")
            .join(dists.alias("o"), "id", "left")
            .filter(
                F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist"))
            )
            .limit(1)
            .count()
            == 0
        ):
            dists = new_dists
            break
        dists = new_dists
    return dists


def label_propagation(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 5
) -> DataFrame:
    """Community detection by iterative majority label (deterministic
    tie-break: smallest label wins).

    Ref: `graph/library/LabelPropagation.java`. Output: (id, label)."""
    e = undirect(edges.select("src", "dst")).localCheckpoint(eager=True)
    labels = vertices.select("id", F.col("id").alias("label"))
    for i in range(max_iter):
        # self-vote included: pure synchronous LPA oscillates on symmetric
        # structures (e.g. a single edge swaps labels forever)
        msgs = (
            e.join(labels, e.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
            .unionByName(labels.select("id", "label"))
        )
        counts = msgs.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
        majority = (
            counts.groupBy("id")
            .agg(F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("new_label"))
        )
        labels = (
            labels.join(majority, "id", "left")
            .select("id", F.coalesce("new_label", "label").alias("label"))
        )
        labels = _maybe_checkpoint(labels, i)
    return labels


def degrees(edges: DataFrame) -> DataFrame:
    """in/out/total degree per vertex (Graph.inDegrees:963/outDegrees:926/
    getDegrees:974)."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count on the undirected simple graph
    (TriangleEnumerator analog). Returns a 1-row DataFrame (n_triangles)."""
    e = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("b"))
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["a", "c"])
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
