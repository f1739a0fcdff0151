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

#: Instrumentation written by connected_components on every run:
#: {"supersteps": int, "superstep_secs": [float, ...]} — read by bench.py
#: to attribute scale-up to iteration count vs per-superstep cost.
LAST_CC_STATS: dict = {}


def undirect(edges: DataFrame) -> DataFrame:
    """Add reversed edges (undirected interpretation).

    Single-pass formulation: each input row explodes into its forward and
    reversed twin. The union-with-self form this replaces executed the
    edge list's upstream TWICE past the last reusable exchange — for an
    expensive edge construction (e.g. the jaccard similarity join) that
    was a full extra pass over the pair aggregation at any scale (the
    same fix `containment_pairs` got for its fwd/rev union)."""
    cols = edges.columns
    extra = [c for c in cols if c not in ("src", "dst")]
    fwd = F.struct(F.col("src"), F.col("dst"))
    rev = F.struct(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select(
        F.explode(F.array(fwd, rev)).alias("__e"), *[F.col(c) for c in extra]
    ).select(
        *[
            F.col(f"__e.{c}") if c in ("src", "dst") else F.col(c)
            for c in cols
        ]
    )


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
    import time as _time

    e = undirect(edges.select("src", "dst")).localCheckpoint(eager=True)
    LAST_CC_STATS.clear()
    LAST_CC_STATS.update({"supersteps": 0, "superstep_secs": []})
    start = 0
    if vertices is None and max_iter <= 0:
        # r12 ADVICE: the fused first superstep below PROPAGATES once; with
        # max_iter=0 the contract is identity labels without propagation
        # (matching the explicit-vertices path, whose loop never runs)
        return e.select(F.col("src").alias("id")).distinct().select(
            "id", F.col("id").alias("component")
        )
    if vertices is None:
        # Fused first superstep: before any propagation every label IS the
        # vertex id, so the neighbor message is the neighbor id itself and
        # superstep 1 collapses to ONE aggregation over the checkpointed
        # edges — labels(v) = min(v, min neighbor id) — with the vertex
        # set falling out of the same groupBy. This replaces the old
        # vertices-distinct shuffle PLUS the first superstep's edge⋈labels
        # join (the explicit-vertices path keeps the generic first step:
        # caller-supplied isolated vertices must surface as their own
        # components).
        _t0 = _time.perf_counter()
        new_labels = e.groupBy("src").agg(F.min("dst").alias("__mn")).select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__mn")).alias("component"),
            (F.least(F.col("src"), F.col("__mn")) != F.col("src")).alias(
                "__changed"
            ),
        )
        new_labels = _maybe_checkpoint(new_labels, 0)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        LAST_CC_STATS["supersteps"] = 1
        LAST_CC_STATS["superstep_secs"].append(
            round(_time.perf_counter() - _t0, 3)
        )
        if changed == 0:
            return labels
        start = 1
    else:
        labels = vertices.select(F.col("id"), F.col("id").alias("component"))
    for i in range(start, max_iter):
        _t0 = _time.perf_counter()
        # Self-rows union neighbor-messages into ONE aggregation: min(val)
        # is least(old component, min over neighbors) and max(old) recovers
        # the unique self row's previous component for the changed flag —
        # so the superstep is one join + one groupBy (the old shape joined
        # labels TWICE: once to send messages, once to merge them back,
        # i.e. an extra vertex-table exchange per superstep at any scale).
        nbr = e.join(labels, e.src == labels.id).select(
            F.col("dst").alias("id"),
            F.lit(None).cast(labels.schema["component"].dataType).alias("old"),
            F.col("component").alias("val"),
        )
        self_rows = labels.select(
            "id", F.col("component").alias("old"), F.col("component").alias("val")
        )
        # carry the changed flag in-row: the convergence probe is then a
        # plain filter over the checkpointed partitions instead of a
        # labels-vs-new-labels join (one shuffle less per superstep)
        new_labels = (
            self_rows.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("val").alias("component"), F.max("old").alias("old"))
            .select(
                "id",
                "component",
                (F.col("component") != F.col("old")).alias("__changed"),
            )
        )
        new_labels = _maybe_checkpoint(new_labels, i)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        LAST_CC_STATS["supersteps"] = i + 1
        LAST_CC_STATS["superstep_secs"].append(
            round(_time.perf_counter() - _t0, 3)
        )
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
        # dangling mass folds in as a 1-row broadcast aggregate — no driver
        # action per superstep (the loop stays lazy between checkpoints)
        dangling = (
            ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        )
        ranks = (
            vertices.select("id")
            .join(contribs, "id", "left")
            .join(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("__dangling") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
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


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    initial_state,
    send_msg,
    agg_msg,
    update,
    max_iter: int = 10,
) -> DataFrame:
    """Generic vertex-centric iteration (Gelly
    `Graph.runVertexCentricIteration` / `pregel/VertexCentricIteration.java`).

    The BSP contract re-expressed as one shuffle per superstep:

    - ``initial_state``: Column over the vertex attributes -> ``state``.
    - ``send_msg``: Column evaluated over each edge joined with its source
      vertex's ``state`` (edge attribute columns are in scope); the value is
      delivered to the edge's ``dst``.
    - ``agg_msg``: aggregate Column over the received ``msg`` values
      (Gelly's combiner, e.g. ``F.min("msg")``).
    - ``update``: Column over (``state``, aggregated ``msg`` — NULL when no
      message arrived) -> next ``state``.

    Runs exactly ``max_iter`` supersteps (algorithms wanting early exit use
    the specialized functions above, which add a convergence probe).
    Output: (id, state)."""
    e = edges.localCheckpoint(eager=True)
    v = vertices.select("id", initial_state.alias("state"))
    for i in range(max_iter):
        msgs = (
            e.join(v, e.src == v.id)
            .select(F.col("dst").alias("id"), send_msg.alias("msg"))
            .groupBy("id")
            .agg(agg_msg.alias("msg"))
        )
        v = (
            v.join(msgs, "id", "left")
            .select("id", update.alias("state"))
        )
        v = _maybe_checkpoint(v, i)
    return v


def community_detection(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    delta: float = 0.5,
) -> DataFrame:
    """Community detection with hop attenuation
    (`graph/library/CommunityDetection.java`, Leung et al. 2009).

    Like label propagation, but each vertex carries (label, score): a vertex
    adopts the incoming label with the highest summed score (edge-weighted;
    deterministic tie-break: smallest label), and the adopted label's score
    attenuates by ``delta`` per hop — so labels lose influence with distance
    and large communities stop swallowing everything, which plain LPA can't
    express. Output: (id, label)."""
    e = undirect(edges.select("src", "dst", *(["weight"] if "weight" in edges.columns else [])))
    w = F.col("weight").cast("double") if "weight" in e.columns else F.lit(1.0)
    e = e.select("src", "dst", w.alias("w")).localCheckpoint(eager=True)
    state = vertices.select(
        "id", F.col("id").alias("label"), F.lit(1.0).alias("score")
    )
    for i in range(iterations):
        # deliver (label, score·w) to each neighbor, plus a self-vote with
        # the current (label, score) — pure synchronous updates oscillate on
        # symmetric structures otherwise; sum per candidate label
        label_scores = (
            e.join(state, e.src == state.id)
            .select(F.col("dst").alias("id"), "label", (F.col("score") * F.col("w")).alias("s"))
            .unionByName(state.select("id", "label", F.col("score").alias("s")))
            .groupBy("id", "label")
            .agg(F.sum("s").alias("sum_score"), F.max("s").alias("best_in"))
        )
        winner = label_scores.groupBy("id").agg(
            F.max_by(
                F.struct("label", "best_in"),
                F.struct(F.col("sum_score"), (-F.col("label")).alias("neg")),
            ).alias("win")
        )
        state = (
            state.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("win.label"), F.col("label")).alias("label"),
                # hop attenuation applies when the label TRAVELS: a vertex
                # adopting a new label takes the strongest incoming copy's
                # score minus delta; re-confirming its current label keeps
                # the score (otherwise every label decays to 0 and ties
                # collapse to min-id — CC, not communities)
                F.when(
                    F.col("win").isNotNull() & (F.col("win.label") != F.col("label")),
                    F.greatest(F.col("win.best_in") - F.lit(delta), F.lit(0.0)),
                )
                .otherwise(F.col("score"))
                .alias("score"),
            )
        )
        state = _maybe_checkpoint(state, i)
    return state.select("id", "label")


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


def hits(
    vertices: DataFrame, edges: DataFrame, iterations: int = 10
) -> DataFrame:
    """HITS hubs & authorities (`graph/library/linkanalysis/HITS.java`):
    auth(v) = Σ hub(u) over u→v, hub(v) = Σ auth(w) over v→w, each step
    L2-normalized. Normalizers fold in as 1-row broadcast aggregates (no
    driver action per superstep). Output: (id, hub, auth)."""
    edges = edges.localCheckpoint(eager=True)
    scores = vertices.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    for i in range(iterations):
        auth_new = (
            edges.join(scores, edges.src == scores.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        a = (
            vertices.select("id")
            .join(auth_new, "id", "left")
            .select("id", F.coalesce(F.col("auth_raw"), F.lit(0.0)).alias("auth_raw"))
        )
        a_norm = a.agg(F.sqrt(F.sum(F.col("auth_raw") ** 2)).alias("__an"))
        a = a.join(F.broadcast(a_norm)).select(
            "id",
            F.when(F.col("__an") > 0, F.col("auth_raw") / F.col("__an"))
            .otherwise(F.lit(0.0))
            .alias("auth"),
        )
        # Materialize the normalized auth HALF-step: the hub aggregation,
        # its normalizer, and the iteration checkpoint would otherwise
        # each re-execute this lineage (with its nested 1-row broadcast)
        # — measured 20x superstep cost vs pagerank without this.
        a = a.localCheckpoint(eager=True)
        hub_new = (
            edges.join(a, edges.dst == a.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("hub_raw"))
        )
        h = (
            vertices.select("id")
            .join(hub_new, "id", "left")
            .select("id", F.coalesce(F.col("hub_raw"), F.lit(0.0)).alias("hub_raw"))
        )
        h_norm = h.agg(F.sqrt(F.sum(F.col("hub_raw") ** 2)).alias("__hn"))
        h = h.join(F.broadcast(h_norm)).select(
            "id",
            F.when(F.col("__hn") > 0, F.col("hub_raw") / F.col("__hn"))
            .otherwise(F.lit(0.0))
            .alias("hub"),
        )
        scores = _maybe_checkpoint(h.join(a, "id").select("id", "hub", "auth"), i)
    return scores


def adamic_adar(edges: DataFrame) -> DataFrame:
    """Adamic-Adar link-prediction scores
    (`graph/library/similarity/AdamicAdar.java`): for each vertex pair
    (u, w) sharing a neighbor v, score += 1/ln(deg(v)), over the
    undirected graph. One self-join on the shared neighbor — cost bounded
    by Σ deg(v)², the standard formulation (Gelly shades the same way).
    Output: (u, w, score), u < w. Input edges are canonicalized to a
    distinct simple graph first (src<dst distinct, like `jaccard_index`),
    so duplicate or already-bidirectional edge lists do not inflate
    degrees or scores."""
    und = undirect(
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    nbr = und.select(F.col("src").alias("v"), F.col("dst").alias("n"))
    pairs = (
        nbr.alias("a")
        .join(nbr.alias("b"), "v")
        .filter(F.col("a.n") < F.col("b.n"))
        .join(deg, "v")
        .filter(F.col("deg") > 1)
    )
    return (
        pairs.groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("w"))
        .agg(F.sum(F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("score"))
    )


def summarize(vertices: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Graph summarization (`graph/library/Summarization.java`): collapse
    vertices sharing a `value` into one summary vertex; edges aggregate to
    (src_value, dst_value, count). Pure relational — two group-bys."""
    v_sum = vertices.groupBy("value").agg(F.count(F.lit(1)).alias("n_vertices"))
    vv = vertices.select(F.col("id"), F.col("value"))
    e_sum = (
        edges.join(vv.withColumnRenamed("id", "src").withColumnRenamed("value", "src_value"), "src")
        .join(vv.withColumnRenamed("id", "dst").withColumnRenamed("value", "dst_value"), "dst")
        .groupBy("src_value", "dst_value")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return v_sum, e_sum


def _oriented(edges: DataFrame, direction: str) -> DataFrame:
    """Edge set oriented for message flow: OUT sends src->dst (as stored),
    IN reverses, ALL sends both ways (Gelly EdgeDirection semantics)."""
    if direction == "OUT":
        return edges
    rev = edges.withColumn("__s", F.col("dst")).withColumn(
        "dst", F.col("src")
    ).withColumn("src", F.col("__s")).drop("__s")
    if direction == "IN":
        return rev
    if direction == "ALL":
        return edges.unionByName(rev)
    raise ValueError(f"direction must be OUT/IN/ALL, got {direction!r}")


def scatter_gather_iteration(
    vertices: DataFrame,
    edges: DataFrame,
    initial_state,
    scatter_msg,
    gather_agg,
    gather_update,
    max_iter: int = 10,
    direction: str = "OUT",
) -> DataFrame:
    """Gelly scatter-gather iteration (`Graph.runScatterGatherIteration`,
    `Graph.java:1730`; `spargel/ScatterGatherIteration.java`).

    ScatterFunction = ``scatter_msg`` (a Column over each oriented edge
    joined with its source vertex ``state``, delivered to ``dst``);
    GatherFunction = ``gather_agg`` + ``gather_update``. ``direction``
    maps `ScatterGatherConfiguration.setDirection` (OUT/IN/ALL).

    Gelly's three iteration models differ in user-function granularity,
    not execution — all three lower to the same one-shuffle-per-superstep
    BSP loop here, so this delegates to `pregel()` over the oriented edge
    set (equivalence asserted in tests/test_graph.py)."""
    return pregel(
        vertices,
        _oriented(edges, direction),
        initial_state,
        scatter_msg,
        gather_agg,
        gather_update,
        max_iter,
    )


def gather_sum_apply_iteration(
    vertices: DataFrame,
    edges: DataFrame,
    initial_state,
    gather,
    sum_agg,
    apply_update,
    max_iter: int = 10,
) -> DataFrame:
    """Gelly gather-sum-apply iteration (`Graph.runGatherSumApplyIteration`,
    `Graph.java:1778`; `gsa/GatherSumApplyIteration.java`).

    GatherFunction = ``gather`` evaluated per in-edge of each vertex over
    the NEIGHBOR's ``state`` and the edge attributes (GSA gathers over
    in-neighbors: the edge src is the neighbor, the value lands on dst);
    SumFunction = ``sum_agg``; ApplyFunction = ``apply_update`` (receives
    the summed value as ``msg``, NULL when a vertex had no in-edges).
    Same BSP lowering as `pregel()` — see scatter_gather_iteration."""
    return pregel(
        vertices, edges, initial_state, gather, sum_agg, apply_update, max_iter
    )


def jaccard_index(edges: DataFrame) -> DataFrame:
    """Jaccard-index vertex similarity
    (`graph/library/similarity/JaccardIndex.java`): for each vertex pair
    (u, w) sharing at least one neighbor, ``shared / union`` of their
    neighborhoods, union = deg(u) + deg(w) - shared. Same shared-neighbor
    self-join shape as `adamic_adar` (cost Σ deg(v)²), plus two degree
    joins; all counts exact integers. Output: (u, w, shared_n, union_n,
    score), u < w. Input edges are canonicalized to a distinct simple
    graph first (src<dst distinct), so duplicate or already-bidirectional
    edge lists do not inflate degrees or shared counts."""
    und = undirect(
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    nbr = und.select(F.col("src").alias("v"), F.col("dst").alias("n"))
    shared = (
        nbr.alias("a")
        .join(nbr.alias("b"), "v")
        .filter(F.col("a.n") < F.col("b.n"))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_n"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("__du"))
    dw = deg.select(F.col("v").alias("w"), F.col("deg").alias("__dw"))
    return (
        shared.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            "shared_n",
            (F.col("__du") + F.col("__dw") - F.col("shared_n"))
            .cast("long")
            .alias("union_n"),
            (
                F.col("shared_n").cast("double")
                / (F.col("__du") + F.col("__dw") - F.col("shared_n"))
            ).alias("score"),
        )
    )


def vertex_triangles(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts (the TriangleListing →
    per-vertex fold of `library/clustering/undirected`). One wedge join +
    one closing join on the canonicalized undirected edge set, then each
    triangle (a < b < c) credits its three corners."""
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
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex
    (`library/clustering/undirected/LocalClusteringCoefficient.java`):
    triangles(v) / C(deg(v), 2) over the undirected simple graph —
    vertices with degree < 2 score 0 (Gelly emits 0 there too). Output:
    (id, degree, n_triangles, local_cc)."""
    und = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    deg = (
        undirect(und)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    vt = vertex_triangles(und)
    possible = F.col("degree") * (F.col("degree") - 1) / 2
    return (
        deg.join(vt, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.coalesce("n_triangles", F.lit(0)) / possible,
            )
            .otherwise(F.lit(0.0))
            .alias("local_cc"),
        )
    )


def global_clustering_stats(edges: DataFrame) -> DataFrame:
    """Global + average clustering coefficient, 1 row
    (`library/clustering/undirected/{Global,Average}ClusteringCoefficient`):
    global = 3*triangles / triplets (triplets = Σ C(deg, 2)); average =
    mean local coefficient over ALL vertices — degree<2 vertices score 0
    but stay in the denominator, matching
    `AverageClusteringCoefficient.java`'s sum/vertexCount. Three bounded
    aggregates over the degree/triangle frames."""
    cc = clustering_coefficients(edges)
    return cc.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1) / 2)
        .cast("long")
        .alias("n_triplets"),
        (F.sum("n_triangles") / 3).cast("long").alias("n_triangles"),
        (
            F.sum("n_triangles")
            / F.sum(F.col("degree") * (F.col("degree") - 1) / 2)
        ).alias("global_cc"),
        (F.sum("local_cc") / F.count(F.lit(1))).alias("average_cc"),
    )


def vertex_metrics(edges: DataFrame) -> DataFrame:
    """Graph summary metrics, 1 row
    (`library/metric/undirected/VertexMetrics.java`): vertex/edge counts,
    degree sum/max, triplet count — the cheap profile pass Gelly offers
    before running anything expensive. Fully lazy: n_edges is derived
    inside the single aggregation (sum_degree == 2*n_edges on the
    canonicalized simple graph), so there is no eager second scan and the
    returned frame stays consistent under re-evaluation."""
    und = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    deg = (
        undirect(und)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    zero = F.lit(0).cast("long")
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        # coalesce: F.sum over zero rows is NULL; an empty graph must
        # report 0 counts (and not NULL-poison the triadic census math)
        F.coalesce((F.sum("degree") / 2).cast("long"), zero).alias("n_edges"),
        F.coalesce(F.sum("degree").cast("long"), zero).alias("sum_degree"),
        F.coalesce(F.max("degree").cast("long"), zero).alias("max_degree"),
        F.coalesce(
            F.sum(F.col("degree") * (F.col("degree") - 1) / 2).cast("long"),
            zero,
        ).alias("n_triplets"),
    )


def triadic_census(edges: DataFrame) -> DataFrame:
    """Undirected triadic census, 1 row
    (`library/clustering/undirected/TriadicCensus.java`): counts of
    vertex triples by internal edge count. Closed-form from the three
    bounded aggregates (n, m, triplets, triangles) — no O(n³) pass:
    t3 = triangles; t2 = triplets - 3*t3; t1 = m*(n-2) - 2*triplets +
    3*t3; t0 = C(n,3) - t1 - t2 - t3."""
    und = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    stats = global_clustering_stats(und)
    counts = vertex_metrics(und)
    zero = F.lit(0).cast("long")
    return (
        counts.crossJoin(
            # the clustering aggregates are NULL over an empty graph
            # (F.sum of no rows); zero them so the census math stays 0
            stats.select(
                F.coalesce("n_triplets", zero).alias("__tp"),
                F.coalesce("n_triangles", zero).alias("n_triangles"),
            )
        )
        .select(
            (
                F.col("n_vertices")
                * (F.col("n_vertices") - 1)
                * (F.col("n_vertices") - 2)
                / 6
            )
            .cast("long")
            .alias("__total"),
            "n_vertices",
            "n_edges",
            "__tp",
            "n_triangles",
        )
        .select(
            (
                F.col("__total")
                - (
                    F.col("n_edges") * (F.col("n_vertices") - 2)
                    - 2 * F.col("__tp")
                    + 3 * F.col("n_triangles")
                )
                - (F.col("__tp") - 3 * F.col("n_triangles"))
                - F.col("n_triangles")
            )
            .cast("long")
            .alias("t0"),
            (
                F.col("n_edges") * (F.col("n_vertices") - 2)
                - 2 * F.col("__tp")
                + 3 * F.col("n_triangles")
            )
            .cast("long")
            .alias("t1"),
            (F.col("__tp") - 3 * F.col("n_triangles")).cast("long").alias("t2"),
            F.col("n_triangles").cast("long").alias("t3"),
        )
    )


def triangle_listing(edges: DataFrame) -> DataFrame:
    """Enumerate each triangle once as (v0 < v1 < v2)
    (`graph/library/TriangleEnumerator.java` — Schank/Wagner style
    wedge-join enumeration). Same two joins as `vertex_triangles`, but
    returning the triangles themselves rather than the per-corner fold.
    Scale: the wedge join is bounded per vertex by C(deg, 2); heavy-hub
    graphs pair this with a degree cap upstream."""
    e = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    e1 = e.select(F.col("src").alias("v0"), F.col("dst").alias("v1"))
    e2 = e.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    wedges = e1.join(e2, "v1")
    closing = e.select(F.col("src").alias("v0"), F.col("dst").alias("v2"))
    return wedges.join(closing, ["v0", "v2"]).select("v0", "v1", "v2")


def edge_metrics(edges: DataFrame) -> DataFrame:
    """Graph summary metrics over edge triplets, 1 row
    (`library/metric/undirected/EdgeMetrics.java:140-229`): per vertex v,
    ``low_degree`` counts incident edges where v is the LOW-ORDER endpoint
    (smaller degree, ties by smaller id); then

    - triangle triplets at v = C(low_degree, 2)
    - rectangle triplets at v = C(low_degree, 2) + low_degree·high_degree

    summed and maxed over vertices. These bound the work of
    triangle/rectangle listing algorithms — the profile Gelly computes to
    size those jobs. Two shuffles (degree agg + per-vertex low count);
    output: (triangle_triplet_count, rectangle_triplet_count,
    maximum_triangle_triplets, maximum_rectangle_triplets)."""
    und = (
        undirect(edges.select("src", "dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    both = undirect(und)  # each vertex sees every incident edge once
    deg = both.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    d_src = deg.select(F.col("id").alias("src"), F.col("degree").alias("ds"))
    d_dst = deg.select(F.col("id").alias("dst"), F.col("degree").alias("dt"))
    low_flag = (
        (F.col("ds") < F.col("dt"))
        | ((F.col("ds") == F.col("dt")) & (F.col("src") < F.col("dst")))
    ).cast("long")
    per_vertex = (
        both.join(d_src, "src")
        .join(d_dst, "dst")
        .groupBy("src")
        .agg(
            F.first("ds").alias("degree"),
            F.sum(low_flag).alias("low_degree"),
        )
        .select(
            "src",
            (F.col("low_degree") * (F.col("low_degree") - 1) / 2)
            .cast("long")
            .alias("tri_triplets"),
            (
                F.col("low_degree") * (F.col("low_degree") - 1) / 2
                + F.col("low_degree") * (F.col("degree") - F.col("low_degree"))
            )
            .cast("long")
            .alias("rect_triplets"),
        )
    )
    zero = F.lit(0).cast("long")
    return per_vertex.agg(
        F.coalesce(F.sum("tri_triplets").cast("long"), zero).alias(
            "triangle_triplet_count"
        ),
        F.coalesce(F.sum("rect_triplets").cast("long"), zero).alias(
            "rectangle_triplet_count"
        ),
        F.coalesce(F.max("tri_triplets").cast("long"), zero).alias(
            "maximum_triangle_triplets"
        ),
        F.coalesce(F.max("rect_triplets").cast("long"), zero).alias(
            "maximum_rectangle_triplets"
        ),
    )
