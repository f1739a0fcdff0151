"""Graph algorithm semantics on hand-checkable graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toy_graph(spark):
    """Two components: a triangle {0,1,2} and an edge {10,11}; isolated 20."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in [0, 1, 2, 10, 11, 20]], "id long")
    return vertices, edges


def test_connected_components(spark, toy_graph):
    from flink_ci_flink_spark.graph import connected_components

    vertices, edges = toy_graph
    got = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_pagerank_matches_power_iteration(spark, toy_graph):
    import numpy as np

    from flink_ci_flink_spark.graph import pagerank

    vertices, edges = toy_graph
    got = {r.id: r.rank for r in pagerank(vertices, edges, iterations=15).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6

    ids = [0, 1, 2, 10, 11, 20]
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    E = [(0, 1), (1, 2), (2, 0), (10, 11)]
    out_deg = {v: 0 for v in ids}
    for s, _ in E:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(15):
        contrib = np.zeros(n)
        for s, t in E:
            contrib[idx[t]] += r[idx[s]] / out_deg[s]
        dangling = sum(r[idx[v]] for v in ids if out_deg[v] == 0)
        r = (1 - d) / n + d * dangling / n + d * contrib
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_sssp_weighted(spark):
    from flink_ci_flink_spark.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    got = {r.id: r.dist for r in sssp(edges, source=0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_label_propagation_communities(spark, toy_graph):
    from flink_ci_flink_spark.graph import label_propagation

    vertices, edges = toy_graph
    got = {r.id: r.label for r in label_propagation(vertices, edges, max_iter=5).collect()}
    # triangle converges to one label; pair converges to one label
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[10], got[11]}) == 1
    assert got[20] == 20


def test_triangle_count(spark, toy_graph):
    from flink_ci_flink_spark.graph import triangle_count

    _, edges = toy_graph
    assert triangle_count(edges).first().n_triangles == 1


def test_hits_matches_numpy(spark):
    """HITS hub/auth vectors == numpy power iteration with L2 normalization."""
    import numpy as np

    from flink_ci_flink_spark.graph import hits

    edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]
    n = 5
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits(vdf, edf, iterations=8).collect()}

    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(8):
        a = A.T @ h
        a = a / np.linalg.norm(a) if np.linalg.norm(a) else a
        h = A @ a
        h = h / np.linalg.norm(h) if np.linalg.norm(h) else h
    for i in range(n):
        assert abs(got[i][0] - h[i]) < 1e-9 and abs(got[i][1] - a[i]) < 1e-9


def test_adamic_adar_matches_bruteforce(spark):
    """AA scores == brute-force python over common neighbors."""
    import math
    from collections import defaultdict

    from flink_ci_flink_spark.graph import adamic_adar

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.w): r.score for r in adamic_adar(edf).collect()}

    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    want = defaultdict(float)
    for v, ns in nbrs.items():
        if len(ns) <= 1:
            continue
        for u in ns:
            for w in ns:
                if u < w:
                    want[(u, w)] += 1.0 / math.log(len(ns))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_summarize(spark):
    from flink_ci_flink_spark.graph import summarize

    vdf = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "id long, value string"
    )
    edf = spark.createDataFrame([(0, 2), (1, 2), (0, 1), (2, 3)], "src long, dst long")
    v_sum, e_sum = summarize(vdf, edf)
    assert {(r.value, r.n_vertices) for r in v_sum.collect()} == {("a", 2), ("b", 2)}
    assert {(r.src_value, r.dst_value, r.n_edges) for r in e_sum.collect()} == {
        ("a", "b", 2),
        ("a", "a", 1),
        ("b", "b", 1),
    }


def test_pregel_min_id_matches_connected_components(spark, toy_graph):
    """The generic vertex-centric surface reproduces CC when programmed with
    the min-id scatter/gather — same contract Gelly's VertexCentricIteration
    users rely on."""
    from flink_ci_flink_spark.graph import connected_components, pregel
    from flink_ci_flink_spark.graph.algorithms import undirect

    vertices, edges = toy_graph
    got = pregel(
        vertices,
        undirect(edges),
        initial_state=F.col("id"),
        send_msg=F.col("state"),
        agg_msg=F.min("msg"),
        update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=6,
    )
    want = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert {r.id: r.state for r in got.collect()} == want


def test_community_detection_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge must resolve to two labels."""
    from flink_ci_flink_spark.graph import community_detection

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], "src long, dst long")
    vertices = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "id long"
    )
    got = {r.id: r.label for r in community_detection(vertices, edges, iterations=6).collect()}
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    assert got[0] != got[10]


def test_scatter_gather_equals_pregel_and_cc(spark, toy_graph):
    """runScatterGatherIteration parity (`Graph.java:1730`): the min-id
    program over direction=ALL equals connected components; OUT vs
    ALL orientation differ on a directed chain."""
    from flink_ci_flink_spark.graph import (
        connected_components,
        scatter_gather_iteration,
    )

    vertices, edges = toy_graph
    got = scatter_gather_iteration(
        vertices,
        edges,
        initial_state=F.col("id"),
        scatter_msg=F.col("state"),
        gather_agg=F.min("msg"),
        gather_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=6,
        direction="ALL",
    )
    want = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert {r.id: r.state for r in got.collect()} == want

    # directed chain 0->1->2: OUT propagates min ids forward only
    chain_v = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    chain_e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = scatter_gather_iteration(
        chain_v, chain_e,
        initial_state=F.col("id"),
        scatter_msg=F.col("state"),
        gather_agg=F.min("msg"),
        gather_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=3, direction="OUT",
    )
    assert {r.id: r.state for r in out.collect()} == {0: 0, 1: 0, 2: 0}
    rev = scatter_gather_iteration(
        chain_v, chain_e,
        initial_state=F.col("id"),
        scatter_msg=F.col("state"),
        gather_agg=F.min("msg"),
        gather_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=3, direction="IN",
    )
    assert {r.id: r.state for r in rev.collect()} == {0: 0, 1: 1, 2: 2}


def test_gather_sum_apply_sssp_matches_specialized(spark):
    """runGatherSumApplyIteration parity (`Graph.java:1778`): the GSA SSSP
    program (gather = neighbor dist + edge weight, sum = min, apply =
    min(state, msg)) reproduces the specialized sssp() distances."""
    from flink_ci_flink_spark.graph import gather_sum_apply_iteration, sssp

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    vertices = spark.createDataFrame([(i,) for i in range(4)], "id long")
    INF = float("inf")
    got_df = gather_sum_apply_iteration(
        vertices,
        edges,
        initial_state=F.when(F.col("id") == 0, 0.0).otherwise(F.lit(INF)),
        gather=F.col("state") + F.col("weight"),
        sum_agg=F.min("msg"),
        apply_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=6,
    )
    got = {r.id: r.state for r in got_df.collect() if r.state != INF}
    want = {r.id: r.dist for r in sssp(edges, 0).collect()}
    assert got == want == {0: 0.0, 1: 1.0, 2: 3.0, 3: 4.0}


def test_clustering_metrics_vs_bruteforce(spark):
    """Jaccard index, local/global clustering coefficients, vertex
    metrics, and the triadic census all match an itertools brute force on
    a small known graph (house + tail: triangles, a bridge, a pendant)."""
    import collections
    import itertools

    from flink_ci_flink_spark.graph import (
        clustering_coefficients,
        global_clustering_stats,
        jaccard_index,
        triadic_census,
        vertex_metrics,
    )

    E = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 4)]
    edges = spark.createDataFrame(E, "src long, dst long")
    adj = collections.defaultdict(set)
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    V = sorted(adj)

    def tri(v):
        return sum(1 for a, b in itertools.combinations(adj[v], 2) if b in adj[a])

    for r in clustering_coefficients(edges).collect():
        d, t = len(adj[r.id]), tri(r.id)
        assert (r.degree, r.n_triangles) == (d, t)
        want = t / (d * (d - 1) / 2) if d >= 2 else 0.0
        assert abs(r.local_cc - want) < 1e-12

    got = {(r.u, r.w): (r.shared_n, r.union_n) for r in jaccard_index(edges).collect()}
    for u, w in itertools.combinations(V, 2):
        sh = len(adj[u] & adj[w])
        if sh:
            assert got[(u, w)] == (sh, len(adj[u]) + len(adj[w]) - sh)
    # duplicate + reversed edges must not inflate degrees / shared counts
    noisy = spark.createDataFrame(
        E + [(b, a) for a, b in E] + E[:3], "src long, dst long"
    )
    assert {
        (r.u, r.w): (r.shared_n, r.union_n) for r in jaccard_index(noisy).collect()
    } == got

    cnt = [0] * 4
    for t3 in itertools.combinations(V, 3):
        cnt[sum(1 for a, b in itertools.combinations(t3, 2) if b in adj[a])] += 1
    row = triadic_census(edges).collect()[0]
    assert (row.t0, row.t1, row.t2, row.t3) == tuple(cnt)

    vm = vertex_metrics(edges).collect()[0]
    assert (vm.n_vertices, vm.n_edges, vm.sum_degree, vm.max_degree) == (5, 6, 12, 3)
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in V)
    g = global_clustering_stats(edges).collect()[0]
    assert (g.n_triplets, g.n_triangles) == (wedges, cnt[3])
    assert abs(g.global_cc - 3 * cnt[3] / wedges) < 1e-12
    # Gelly AverageClusteringCoefficient divides by the TOTAL vertex
    # count; degree<2 vertices contribute 0 but stay in the denominator.
    def lcc(v):
        d = len(adj[v])
        return tri(v) / (d * (d - 1) / 2) if d >= 2 else 0.0

    assert abs(g.average_cc - sum(lcc(v) for v in V) / len(V)) < 1e-12


def test_vertex_metrics_and_census_empty_graph(spark):
    """An empty edge frame reports ZERO counts (F.sum over no rows is NULL
    without the coalesce), and the closed-form triadic census stays
    non-NULL: 0 vertices -> all four triad counts 0."""
    from flink_ci_flink_spark.graph import triadic_census, vertex_metrics

    empty = spark.createDataFrame([], "src long, dst long")
    vm = vertex_metrics(empty).collect()[0]
    assert (vm.n_vertices, vm.n_edges, vm.sum_degree, vm.max_degree,
            vm.n_triplets) == (0, 0, 0, 0, 0)
    tc = triadic_census(empty).collect()[0]
    assert (tc.t0, tc.t1, tc.t2, tc.t3) == (0, 0, 0, 0)


def test_triangle_listing_and_edge_metrics_vs_bruteforce(spark):
    """triangle_listing enumerates exactly the brute-force triangle set;
    edge_metrics matches a literal recount of the per-vertex low-order
    triplet formulas (EdgeMetrics.java:212-213). Graph: K4 + pendant +
    disconnected edge — degree ties and low-degree asymmetry."""
    from itertools import combinations

    from flink_ci_flink_spark.graph import edge_metrics, triangle_listing

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    adj: dict[int, set[int]] = {}
    for s, d in raw:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want_tris = {
        (a, b, c)
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    }
    got_tris = {(r.v0, r.v1, r.v2) for r in triangle_listing(edges).collect()}
    assert got_tris == want_tris
    # brute-force EdgeMetrics
    deg = {v: len(ns) for v, ns in adj.items()}
    tri_sum = rect_sum = tri_max = rect_max = 0
    for v, ns in adj.items():
        low = sum(
            1
            for u in ns
            if deg[v] < deg[u] or (deg[v] == deg[u] and v < u)
        )
        high = deg[v] - low
        t = low * (low - 1) // 2
        r = t + low * high
        tri_sum += t
        rect_sum += r
        tri_max = max(tri_max, t)
        rect_max = max(rect_max, r)
    row = edge_metrics(edges).collect()[0]
    assert (
        row.triangle_triplet_count,
        row.rectangle_triplet_count,
        row.maximum_triangle_triplets,
        row.maximum_rectangle_triplets,
    ) == (tri_sum, rect_sum, tri_max, rect_max)
    # empty graph: zeros, not nulls
    empty = spark.createDataFrame([], "src long, dst long")
    z = edge_metrics(empty).collect()[0]
    assert tuple(z) == (0, 0, 0, 0)


def test_undirect_single_pass_plan(spark, toy_graph):
    """r12 optimization: `undirect` must be a single-branch explode, not a
    union-with-self — the union form executed an expensive edge upstream
    twice past the last reusable exchange (measured: the jaccard pair
    aggregation ran once per union branch in graph_dedup_clusters)."""
    from flink_ci_flink_spark.graph import undirect

    _, edges = toy_graph
    und = undirect(edges)
    plan = und._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan
    # rows are unchanged vs the union formulation
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    want = sorted(map(tuple, edges.unionByName(rev).collect()))
    assert sorted(map(tuple, und.collect())) == want
    # extra columns ride through with their values intact
    w = edges.withColumn("weight", F.col("src") + F.col("dst"))
    got = sorted(map(tuple, undirect(w).collect()))
    want_w = sorted(
        [(s, d, x) for s, d, x in [(r.src, r.dst, r.weight) for r in w.collect()]]
        + [(d, s, x) for s, d, x in [(r.src, r.dst, r.weight) for r in w.collect()]]
    )
    assert got == want_w


def test_cc_superstep_single_join(spark, toy_graph):
    """r12 optimization: each CC superstep is ONE join + ONE aggregation
    (self-rows unioned with neighbor messages), not the old
    join-aggregate-join shape that exchanged the vertex table twice per
    superstep. Pinned via the superstep plan assembled exactly as
    connected_components builds it."""
    from flink_ci_flink_spark.graph import connected_components, undirect

    vertices, edges = toy_graph
    # semantics unchanged on a graph with an isolated vertex
    got = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_near_dup_edge_materialize_small_end_guard(spark, monkeypatch):
    """r12 verdict #8: the eager localCheckpoint in the multi-traversal
    edge materialization assumes a small end. The guard warns loudly past
    the bound (exercised by shrinking it to 0) and stays silent at the
    default; rows are identical either way."""
    import warnings

    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.queries import graph_q

    t = load_tables(spark, "/root/testdata/sf0.001")
    with warnings.catch_warnings():
        # silent at the default bound — pin only the contract under test
        # (an unrelated Deprecation/FutureWarning from a dependency bump
        # must not fail this)
        warnings.simplefilter("error", RuntimeWarning)
        base = {
            (r.src, r.dst)
            for r in graph_q._near_dup_edges_materialized(t).collect()
        }
    monkeypatch.setattr(graph_q, "_EDGE_MATERIALIZE_WARN", 0)
    with pytest.warns(RuntimeWarning, match="small-end bound"):
        guarded = {
            (r.src, r.dst)
            for r in graph_q._near_dup_edges_materialized(t).collect()
        }
    assert guarded == base


def test_connected_components_max_iter_zero_identity(spark):
    """r12 ADVICE: with vertices=None and max_iter=0 the contract is
    identity labels WITHOUT propagation (matching the explicit-vertices
    path, whose superstep loop never runs)."""
    from flink_ci_flink_spark.graph.algorithms import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {
        r.id: r.component
        for r in connected_components(None, edges, max_iter=0).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3}
