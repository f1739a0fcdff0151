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
