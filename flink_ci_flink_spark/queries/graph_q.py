"""Graph-algorithm queries (Gelly parity, SURVEY.md §2.13).

The near-dup graph (3-gram Jaccard ≥ 0.5 pairs over `documents`) doubles as
a real dedup workflow: connected components of the similarity graph =
duplicate clusters → pick the canonical doc per cluster. Oracles use
recursive CTEs (tiny, sparse graph → bounded recursion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.graph import connected_components, degrees, sssp, triangle_count
from flink_ci_flink_spark.pipeline import jaccard_pairs
from flink_ci_flink_spark.queries.registry import query

#: Shared SQL for the near-dup edge list (mirror of pipe_jaccard_pairs).
_EDGES_SQL = r"""
    toks AS (
      SELECT doc_id, list_filter(str_split_regex(text, '\s+'), x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(generate_series(1, len(t) - 2),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s FROM toks
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS ni
      FROM sh a JOIN sh b USING (s)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT src, dst FROM inter
      JOIN sizes sa ON sa.doc_id = src
      JOIN sizes sb ON sb.doc_id = dst
      WHERE ni * 1.0 / (sa.n + sb.n - ni) >= 0.5
    )
"""


def _near_dup_edges_materialized(t) -> "DataFrame":
    """The near-dup edge list, materialized ONCE per query build.

    Multi-traversal graph operators (wedge joins, triangle closing, degree
    joins) read the edge list 2-4 times; each lazy traversal would re-run
    the full tokenize+shingle+pair similarity join (executed scans audit:
    documents x3-x5 per query). The pairs table is threshold-filtered and
    tiny relative to the corpus, so the eager localCheckpoint is the
    bounded AllPairs build-the-index-once step, the same pattern
    connected_components applies internally. Single-traversal CC queries
    keep the lazy form (CC checkpoints the undirected edges itself).

    Small-end guard (r12 verdict #8): the checkpoint blocks are
    MEMORY_AND_DISK (localCheckpoint's default) so a pathological
    mass-near-duplicate corpus spills to executor-local disk rather than
    OOM; past `_EDGE_MATERIALIZE_WARN` edges we warn loudly — at that
    size the traversals should move to a parquet-backed staging write
    with lineage-free re-reads instead of pinned blocks."""
    edges = (
        jaccard_pairs(t.documents, threshold=0.5)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    n = edges.count()  # cheap: reads the just-materialized blocks
    if n > _EDGE_MATERIALIZE_WARN:
        import warnings

        warnings.warn(
            f"_near_dup_edges_materialized: {n} edges exceed the "
            f"{_EDGE_MATERIALIZE_WARN}-row small-end bound for pinned "
            "localCheckpoint blocks; stage the edge list to parquet",
            RuntimeWarning,
            stacklevel=2,
        )
    return edges


#: localCheckpoint small-end bound for the materialized near-dup edge list
#: (r12 verdict #8); ~10M (src, dst) rows ≈ 160 MB of block storage.
_EDGE_MATERIALIZE_WARN = 10_000_000


@query(
    "graph_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), verts AS (
      SELECT DISTINCT src AS id FROM undirected
    ), reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN undirected u ON u.src = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id
    """,
    group="graph",
)
def graph_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup similarity graph = duplicate
    clusters. Ref: `graph/library/ConnectedComponents.java` (min-id
    scatter-gather); the full Gelly-style driver-loop implementation is
    flink_ci_flink_spark/graph/algorithms.py. Only docs appearing in ≥1
    near-dup pair are returned (the interesting ones).

    Scale profile (bench-measured, superstep instrumentation in
    `algorithms.LAST_CC_STATS`): the CC loop itself is flat — 2 supersteps
    at both sf0.1 and sf1, ~1.5s total — so the observed ~7x wall-clock for
    10x data lives entirely in the upstream jaccard edge-construction join,
    where hot-shingle posting lists are still under the `max_postings=500`
    cap at these SFs and pair counts grow superlinearly with density. At
    100 TB the cap binds and the edge join reverts to linear growth."""
    t = load_tables(spark, sf_dir)
    edges = jaccard_pairs(t.documents, threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    # vertices derived inside connected_components from the checkpointed
    # edges — a separate verts DataFrame would re-run the similarity join
    return connected_components(None, edges).select(
        F.col("id").alias("doc_id"), "component"
    )


@query(
    "graph_degrees_triangles",
    oracle=f"""
    WITH {_EDGES_SQL},
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
      SELECT src AS id, COUNT(*) AS degree FROM undirected GROUP BY src
    ), tri AS (
      SELECT COUNT(*) AS n_triangles FROM
        (SELECT src AS a, dst AS b FROM undirected WHERE src < dst) e1
        JOIN (SELECT src AS b, dst AS c FROM undirected WHERE src < dst) e2 USING (b)
        JOIN (SELECT src AS a, dst AS c FROM undirected WHERE src < dst) e3 USING (a, c)
      WHERE e1.a < e1.b
    )
    SELECT id, degree, (SELECT n_triangles FROM tri) AS n_triangles
    FROM deg
    """,
    group="graph",
)
def graph_degrees_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex degrees + global triangle count on the near-dup graph.
    Ref: `Graph.getDegrees:974`, `graph/library/TriangleEnumerator`."""
    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    deg = degrees(edges).select(
        "id", F.col("degree").cast("long").alias("degree")
    )
    tri = triangle_count(edges)
    return deg.crossJoin(F.broadcast(tri))


@query(
    "graph_sssp_nations",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             CAST(ABS(a.n_nationkey - b.n_nationkey) AS DOUBLE) AS weight
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
      UNION ALL
      SELECT a.n_nationkey, b.n_nationkey, 10.0
      FROM nation a JOIN nation b
        ON b.n_nationkey = a.n_nationkey + 1
    ), walk(id, dist, hops) AS (
      SELECT 0, CAST(0.0 AS DOUBLE), 0
      UNION
      SELECT e.dst, walk.dist + e.weight, walk.hops + 1
      FROM walk JOIN edges e ON e.src = walk.id
      WHERE walk.hops < 8
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
    group="graph",
)
def graph_sssp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths (≤8 hops) over a deterministic weighted
    nation graph (intra-region cliques + successor chain links).
    Ref: `graph/library/SingleSourceShortestPaths.java`."""
    t = load_tables(spark, sf_dir)
    n = t.nation.select("n_nationkey", "n_regionkey")
    a, b = n.alias("a"), n.alias("b")
    intra = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
        F.abs(F.col("a.n_nationkey") - F.col("b.n_nationkey")).cast("double").alias("weight"),
    )
    chain = a.join(b, F.col("b.n_nationkey") == F.col("a.n_nationkey") + 1).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
        F.lit(10.0).alias("weight"),
    )
    edges = intra.unionByName(chain)
    return sssp(edges, source=0, max_iter=8)


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_EDGES_SQL},
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
      SELECT src AS v, COUNT(*) AS degree FROM undirected GROUP BY src
    ), nbr AS (
      SELECT src AS v, dst AS n FROM undirected
    )
    SELECT a.n AS u, b.n AS w,
           FLOOR(SUM(1.0 / LN(degree)) * 1e6 + 0.5) / 1e6 AS score
    FROM nbr a JOIN nbr b USING (v) JOIN deg USING (v)
    WHERE a.n < b.n AND degree > 1
    GROUP BY u, w
    """,
    group="graph",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the near-dup graph
    (`graph/library/similarity/AdamicAdar.java`): candidate pairs share a
    neighbor, weighted 1/ln(deg(shared))."""
    from flink_ci_flink_spark.graph import adamic_adar

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    return adamic_adar(edges).select(
        "u",
        "w",
        (F.floor(F.col("score") * 1e6 + F.lit(0.5)) / F.lit(1e6)).alias("score"),
    )


@query(
    "graph_summarize_sources",
    oracle=f"""
    WITH {_EDGES_SQL},
    e_sum AS (
      SELECT ds.source AS src_value, dd.source AS dst_value, COUNT(*) AS n_edges
      FROM edges
      JOIN documents ds ON ds.doc_id = edges.src
      JOIN documents dd ON dd.doc_id = edges.dst
      GROUP BY 1, 2
    ), v_sum AS (
      SELECT source, COUNT(*) AS n_vertices FROM documents GROUP BY source
    )
    SELECT src_value, dst_value, n_edges, n_vertices AS src_group_size
    FROM e_sum JOIN v_sum ON source = src_value
    """,
    group="graph",
)
def graph_summarize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph summarization (`graph/library/Summarization.java`): collapse
    the near-dup graph by document source — summary edges carry pair counts,
    summary vertices carry group sizes."""
    from flink_ci_flink_spark.graph import summarize

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    vertices = t.documents.select(
        F.col("doc_id").alias("id"), F.col("source").alias("value")
    )
    v_sum, e_sum = summarize(vertices, edges)
    return e_sum.join(
        F.broadcast(v_sum.withColumnRenamed("value", "src_value")), "src_value"
    ).select(
        "src_value",
        "dst_value",
        "n_edges",
        F.col("n_vertices").alias("src_group_size"),
    )


def _minhash_cc_oracle() -> str:
    from flink_ci_flink_spark.queries.pipeline_q import _BANDS_SQL, _MINHASH_BASE

    base = _MINHASH_BASE.replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        base
        + f""", banded AS ({_BANDS_SQL}),
    pairs AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    undirected AS (
      SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ), verts AS (
      SELECT DISTINCT src AS id FROM undirected
    ), reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN undirected u ON u.src = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id
    """
    )


@query(
    "graph_dedup_clusters_minhash",
    oracle=_minhash_cc_oracle(),
    group="graph",
)
def graph_dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over MINHASH-LSH candidate edges — the edge
    construction a 100 TB dedup pass actually runs (one band-key shuffle,
    bucket-capped; vs the exact-jaccard inverted-index join of
    `graph_dedup_clusters`, whose postings join dominates its sf1 cost).
    Same min-id CC loop; the oracle replays the full MinHash(32)/LSH(8x4)
    construction AND the recursive-CTE components."""
    from flink_ci_flink_spark.pipeline.dedup import minhash_lsh_pairs

    t = load_tables(spark, sf_dir)
    edges = minhash_lsh_pairs(t.documents, num_hashes=32, bands=8).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return connected_components(None, edges).select(
        F.col("id").alias("doc_id"), "component"
    )


@query(
    "graph_gsa_sssp_nations",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             CAST(ABS(a.n_nationkey - b.n_nationkey) AS DOUBLE) AS weight
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
      UNION ALL
      SELECT a.n_nationkey, b.n_nationkey, 10.0
      FROM nation a JOIN nation b
        ON b.n_nationkey = a.n_nationkey + 1
    ), walk(id, dist, hops) AS (
      SELECT 0, CAST(0.0 AS DOUBLE), 0
      UNION
      SELECT e.dst, walk.dist + e.weight, walk.hops + 1
      FROM walk JOIN edges e ON e.src = walk.id
      WHERE walk.hops < 8
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
    group="graph",
)
def graph_gsa_sssp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME shortest-path problem as graph_sssp_nations, programmed
    through the gather-sum-apply iteration surface
    (`Graph.runGatherSumApplyIteration`, `Graph.java:1778`): gather =
    neighbor distance + edge weight, sum = MIN, apply = min(state, msg).
    8 GSA supersteps = Bellman-Ford over <= 8-edge walks — exactly the
    recursive oracle's hop bound, so the two surfaces share it."""
    from flink_ci_flink_spark.graph import gather_sum_apply_iteration

    t = load_tables(spark, sf_dir)
    n = t.nation.select("n_nationkey", "n_regionkey")
    a, b = n.alias("a"), n.alias("b")
    intra = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
        F.abs(F.col("a.n_nationkey") - F.col("b.n_nationkey")).cast("double").alias("weight"),
    )
    chain = a.join(b, F.col("b.n_nationkey") == F.col("a.n_nationkey") + 1).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
        F.lit(10.0).alias("weight"),
    )
    edges = intra.unionByName(chain)
    vertices = n.select(F.col("n_nationkey").alias("id"))
    INF = float("inf")
    out = gather_sum_apply_iteration(
        vertices,
        edges,
        initial_state=F.when(F.col("id") == 0, 0.0).otherwise(F.lit(INF)),
        gather=F.col("state") + F.col("weight"),
        sum_agg=F.min("msg"),
        apply_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=8,
    )
    return out.filter(F.col("state") != INF).select(
        "id", F.col("state").alias("dist")
    )


@query(
    "graph_sg_min_id_nations",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
    ), und AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), walk(v, reach, hops) AS (
      SELECT n_nationkey, n_nationkey, 0 FROM nation
      UNION
      SELECT walk.v, e.dst, walk.hops + 1
      FROM walk JOIN und e ON e.src = walk.reach
      WHERE walk.hops < 4
    )
    SELECT v AS id, MIN(reach) AS min_id FROM walk GROUP BY v
    """,
    group="graph",
)
def graph_sg_min_id_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather iteration surface (`Graph.runScatterGatherIteration`,
    `Graph.java:1730`, direction=ALL): the min-id program over the
    intra-region nation cliques. 4 supersteps = min id within the 4-hop
    neighborhood — the recursive oracle replays exactly that hop bound
    (cliques converge in 1, the bound keeps semantics exact, not
    convergence-dependent)."""
    from flink_ci_flink_spark.graph import scatter_gather_iteration

    t = load_tables(spark, sf_dir)
    n = t.nation.select("n_nationkey", "n_regionkey")
    a, b = n.alias("a"), n.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
    )
    vertices = n.select(F.col("n_nationkey").alias("id"))
    out = scatter_gather_iteration(
        vertices,
        edges,
        initial_state=F.col("id"),
        scatter_msg=F.col("state"),
        gather_agg=F.min("msg"),
        gather_update=F.least(F.col("state"), F.coalesce(F.col("msg"), F.col("state"))),
        max_iter=4,
        direction="ALL",
    )
    return out.select("id", F.col("state").alias("min_id"))


_UND_SQL = """
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), deg AS (
      SELECT src AS v, COUNT(*) AS degree FROM undirected GROUP BY src
    ), canon AS (
      SELECT src, dst FROM undirected WHERE src < dst
    ), tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM canon e1
      JOIN canon e2 ON e1.dst = e2.src
      JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )"""


@query(
    "graph_jaccard_index",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_UND_SQL},
    nbr AS (SELECT src AS v, dst AS n FROM undirected)
    SELECT a.n AS u, b.n AS w,
           CAST(COUNT(*) AS BIGINT) AS shared_n,
           CAST(du.degree + dw.degree - COUNT(*) AS BIGINT) AS union_n,
           FLOOR(COUNT(*) * 1e6 / (du.degree + dw.degree - COUNT(*)) + 0.5) / 1e6
             AS score
    FROM nbr a JOIN nbr b USING (v)
    JOIN deg du ON du.v = a.n
    JOIN deg dw ON dw.v = b.n
    WHERE a.n < b.n
    GROUP BY u, w, du.degree, dw.degree
    """,
    group="graph",
)
def graph_jaccard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-index vertex similarity over the near-dup graph
    (`graph/library/similarity/JaccardIndex.java`): shared/union
    neighborhood ratio per co-neighbor pair — exact integer counts, one
    shared-neighbor self-join bounded by Σ deg(v)²."""
    from flink_ci_flink_spark.graph import jaccard_index

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    j = jaccard_index(edges)
    return j.select(
        "u",
        "w",
        "shared_n",
        "union_n",
        (
            F.floor(F.col("shared_n") * 1e6 / F.col("union_n") + F.lit(0.5)) / 1e6
        ).alias("score"),
    )


@query(
    "graph_clustering_coeffs",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_UND_SQL},
    vt AS (
      SELECT v, COUNT(*) AS nt FROM (
        SELECT UNNEST([a, b, c]) AS v FROM tri) GROUP BY v
    )
    SELECT d.v AS id, CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(vt.nt, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
             FLOOR(COALESCE(vt.nt, 0) * 1e6
                   / (d.degree * (d.degree - 1) / 2.0) + 0.5) / 1e6
           ELSE 0.0 END AS local_cc
    FROM deg d LEFT JOIN vt ON vt.v = d.v
    """,
    group="graph",
)
def graph_clustering_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per vertex of the near-dup graph
    (`library/clustering/undirected/LocalClusteringCoefficient.java`):
    triangles(v) / C(deg v, 2) — one wedge join + one closing join, then
    each triangle credits its three corners."""
    from flink_ci_flink_spark.graph import clustering_coefficients

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    cc = clustering_coefficients(edges)
    return cc.select(
        "id",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.floor(
                F.col("n_triangles")
                * 1e6
                / (F.col("degree") * (F.col("degree") - 1) / 2.0)
                + F.lit(0.5)
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("local_cc"),
    )


@query(
    "graph_vertex_metrics",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_UND_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST((SELECT COUNT(*) FROM canon) AS BIGINT) AS n_edges,
           CAST(SUM(degree) AS BIGINT) AS sum_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree,
           CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS n_triplets
    FROM deg
    """,
    group="graph",
)
def graph_vertex_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profile metrics of the near-dup graph, 1 row
    (`library/metric/undirected/VertexMetrics.java`): vertex/edge counts,
    degree sum/max, connected-triplet count — three bounded aggregates."""
    from flink_ci_flink_spark.graph import vertex_metrics

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    return vertex_metrics(edges)


@query(
    "graph_triadic_census",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_UND_SQL},
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS tp
      FROM deg
    ), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM canon),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t3 FROM tri)
    SELECT CAST(n * (n - 1) * (n - 2) / 6
                - (m * (n - 2) - 2 * tp + 3 * t3)
                - (tp - 3 * t3) - t3 AS BIGINT) AS t0,
           CAST(m * (n - 2) - 2 * tp + 3 * t3 AS BIGINT) AS t1,
           CAST(tp - 3 * t3 AS BIGINT) AS t2,
           t3
    FROM agg, m, t
    """,
    group="graph",
)
def graph_triadic_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected triadic census of the near-dup graph, 1 row
    (`library/clustering/undirected/TriadicCensus.java`): triples of
    vertices classified by internal edge count, closed-form from the
    bounded degree/triangle aggregates — no O(n³) enumeration."""
    from flink_ci_flink_spark.graph import triadic_census

    t = load_tables(spark, sf_dir)
    edges = _near_dup_edges_materialized(t)
    return triadic_census(edges)


#: Canonical (src < dst) nations graph shared by the iterative-community
#: queries: region cliques + an inter-region key chain (simple graph — the
#: chain clause excludes same-region pairs the clique already covers).
_NATION_EDGES_SQL = """
    canon AS (
      SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      UNION ALL
      SELECT CAST(a.n_nationkey AS BIGINT), CAST(b.n_nationkey AS BIGINT)
      FROM nation a JOIN nation b
        ON b.n_nationkey = a.n_nationkey + 1 AND a.n_regionkey <> b.n_regionkey
    ), und AS (
      SELECT src, dst FROM canon UNION ALL SELECT dst AS src, src AS dst FROM canon
    )"""


def _nation_community_graph(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir)
    n = t.nation.select("n_nationkey", "n_regionkey")
    a, b = n.alias("a"), n.alias("b")
    intra = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").cast("long").alias("src"),
        F.col("b.n_nationkey").cast("long").alias("dst"),
    )
    chain = a.join(
        b,
        (F.col("b.n_nationkey") == F.col("a.n_nationkey") + 1)
        & (F.col("a.n_regionkey") != F.col("b.n_regionkey")),
    ).select(
        F.col("a.n_nationkey").cast("long").alias("src"),
        F.col("b.n_nationkey").cast("long").alias("dst"),
    )
    vertices = n.select(F.col("n_nationkey").cast("long").alias("id"))
    return vertices, intra.unionByName(chain)


def _lpa_oracle(iters: int) -> str:
    """Unroll `label_propagation`'s majority-vote supersteps into chained
    CTEs (self-vote included; tie-break = max count then min label —
    ROW_NUMBER(cnt DESC, label ASC) is exactly Spark's
    max_by(label, struct(cnt, -label)))."""
    sql = "WITH " + _NATION_EDGES_SQL.strip() + ",\n"
    sql += "    lab0 AS (SELECT CAST(n_nationkey AS BIGINT) AS id, CAST(n_nationkey AS BIGINT) AS label FROM nation)"
    for k in range(1, iters + 1):
        p = k - 1
        sql += f""",
    votes{k} AS (
      SELECT e.dst AS id, l.label FROM und e JOIN lab{p} l ON e.src = l.id
      UNION ALL SELECT id, label FROM lab{p}
    ), cnt{k} AS (
      SELECT id, label, COUNT(*) AS cnt FROM votes{k} GROUP BY id, label
    ), lab{k} AS (
      SELECT id, label FROM (
        SELECT id, label,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
        FROM cnt{k}) t WHERE rn = 1
    )"""
    sql += f"\nSELECT id, label FROM lab{iters}"
    return sql


@query("graph_label_propagation", oracle=_lpa_oracle(3), group="graph")
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly LabelPropagation (`graph/library/LabelPropagation.java`) on
    the nations community graph (region cliques + inter-region chain):
    3 synchronous majority-vote supersteps with the deterministic
    smallest-label tie-break and a self-vote (pure synchronous LPA
    oscillates on symmetric structures). One shuffle per superstep; the
    oracle unrolls the identical votes→counts→argmax pipeline per
    iteration (`graph/algorithms.py::label_propagation`)."""
    from flink_ci_flink_spark.graph import label_propagation

    vertices, edges = _nation_community_graph(spark, sf_dir)
    out = label_propagation(vertices, edges, max_iter=3)
    return out.select(F.col("id").cast("long").alias("id"), F.col("label").cast("long").alias("label"))


def _cd_oracle(iters: int, delta: float = 0.5) -> str:
    """Unroll `community_detection`'s hop-attenuation supersteps: summed
    label scores (self-vote included), winner by (sum_score, min label),
    adopted-label score = strongest incoming copy minus delta (floored at
    0), re-confirmed label keeps its score. Scores stay multiples of
    2^-1, so double arithmetic is exact in both engines."""
    sql = "WITH " + _NATION_EDGES_SQL.strip() + ",\n"
    sql += (
        "    st0 AS (SELECT CAST(n_nationkey AS BIGINT) AS id,"
        " CAST(n_nationkey AS BIGINT) AS label,"
        " CAST(1.0 AS DOUBLE) AS score FROM nation)"
    )
    for k in range(1, iters + 1):
        p = k - 1
        sql += f""",
    votes{k} AS (
      SELECT e.dst AS id, s.label, s.score AS s
      FROM und e JOIN st{p} s ON e.src = s.id
      UNION ALL SELECT id, label, score AS s FROM st{p}
    ), ls{k} AS (
      SELECT id, label, SUM(s) AS sum_score, MAX(s) AS best_in
      FROM votes{k} GROUP BY id, label
    ), win{k} AS (
      SELECT id, label AS wlabel, best_in FROM (
        SELECT id, label, best_in,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY sum_score DESC, label ASC) AS rn
        FROM ls{k}) t WHERE rn = 1
    ), st{k} AS (
      SELECT s.id, w.wlabel AS label,
             CASE WHEN w.wlabel <> s.label
                  THEN GREATEST(w.best_in - {delta}, 0.0)
                  ELSE s.score END AS score
      FROM st{p} s JOIN win{k} w ON w.id = s.id
    )"""
    sql += f"\nSELECT id, label FROM st{iters}"
    return sql


@query("graph_community_detection", oracle=_cd_oracle(3), group="graph")
def graph_community_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly CommunityDetection (`graph/library/CommunityDetection.java`,
    Leung et al. 2009 hop attenuation) on the nations community graph:
    each vertex carries (label, score); it adopts the incoming label with
    the highest summed score (tie-break smallest label), and a label's
    score attenuates by delta=0.5 per hop it travels — distant labels
    lose influence, which plain LPA cannot express. 3 supersteps, one
    shuffle each; the oracle unrolls the identical
    score-sum→argmax→attenuate pipeline
    (`graph/algorithms.py::community_detection`)."""
    from flink_ci_flink_spark.graph import community_detection

    vertices, edges = _nation_community_graph(spark, sf_dir)
    out = community_detection(vertices, edges, iterations=3, delta=0.5)
    return out.select(F.col("id").cast("long").alias("id"), F.col("label").cast("long").alias("label"))


@query(
    "graph_triangle_listing",
    oracle=f"""
    WITH {_NATION_EDGES_SQL.strip()}
    SELECT a.src AS v0, a.dst AS v1, b.dst AS v2
    FROM canon a
    JOIN canon b ON b.src = a.dst
    JOIN canon c ON c.src = a.src AND c.dst = b.dst
    """,
    group="graph",
)
def graph_triangle_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly TriangleEnumerator (`graph/library/TriangleEnumerator.java`)
    on the nations community graph: every triangle listed exactly once as
    an ordered (v0 < v1 < v2) triple via the wedge join + closing-edge
    join (`graph/algorithms.py::triangle_listing`). The region cliques
    contribute C(5,3) triangles each; the inter-region chain adds the
    cross ones."""
    from flink_ci_flink_spark.graph import triangle_listing

    _, edges = _nation_community_graph(spark, sf_dir)
    return triangle_listing(edges)


@query(
    "graph_edge_metrics",
    oracle=f"""
    WITH {_NATION_EDGES_SQL.strip()},
    deg AS (SELECT src AS id, COUNT(*) AS degree FROM und GROUP BY src),
    pv AS (
      SELECT u.src AS id, MIN(ds.degree) AS degree,
             SUM(CASE WHEN ds.degree < dt.degree
                       OR (ds.degree = dt.degree AND u.src < u.dst)
                      THEN 1 ELSE 0 END) AS low_degree
      FROM und u
      JOIN deg ds ON ds.id = u.src
      JOIN deg dt ON dt.id = u.dst
      GROUP BY u.src
    ), triplets AS (
      SELECT low_degree * (low_degree - 1) // 2 AS t,
             low_degree * (low_degree - 1) // 2
               + low_degree * (degree - low_degree) AS r
      FROM pv
    )
    SELECT CAST(SUM(t) AS BIGINT) AS triangle_triplet_count,
           CAST(SUM(r) AS BIGINT) AS rectangle_triplet_count,
           CAST(MAX(t) AS BIGINT) AS maximum_triangle_triplets,
           CAST(MAX(r) AS BIGINT) AS maximum_rectangle_triplets
    FROM triplets
    """,
    group="graph",
)
def graph_edge_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly EdgeMetrics (`library/metric/undirected/EdgeMetrics.java`)
    on the nations community graph: triangle/rectangle triplet counts and
    per-vertex maxima from each vertex's low-order incident-edge count —
    the work-bounding profile Gelly computes before triangle/rectangle
    listing (`graph/algorithms.py::edge_metrics`; two shuffles, 1-row
    output)."""
    from flink_ci_flink_spark.graph import edge_metrics

    _, edges = _nation_community_graph(spark, sf_dir)
    return edge_metrics(edges)


def _hits_oracle(iterations: int = 4) -> str:
    """Unrolled HITS iteration chain (fixed superstep count, like the
    pagerank recursive-CTE oracle but with the two interleaved
    normalized aggregations per step unrolled into plain CTEs)."""
    steps = [
        """edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT a.n_nationkey AS src, b.n_nationkey AS dst
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
        WHERE a.n_nationkey < b.n_nationkey
           OR b.n_nationkey = (SELECT MIN(c.n_nationkey) FROM nation c
                               WHERE c.n_regionkey = a.n_regionkey)
      )
    )""",
        "verts AS MATERIALIZED (SELECT n_nationkey AS id FROM nation)",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM verts)",
    ]
    for i in range(1, iterations + 1):
        p = f"h{i - 1}"
        steps += [
            f"a{i}_c AS MATERIALIZED (SELECT e.dst AS id, SUM(h.hub) AS raw"
            f" FROM edges e JOIN {p} h ON h.id = e.src GROUP BY e.dst)",
            f"a{i}_f AS MATERIALIZED (SELECT v.id, COALESCE(c.raw, 0) AS raw"
            f" FROM verts v LEFT JOIN a{i}_c c ON c.id = v.id)",
            f"a{i}_n AS MATERIALIZED (SELECT SQRT(SUM(raw*raw)) AS nn FROM a{i}_f)",
            f"a{i} AS MATERIALIZED (SELECT id, CASE WHEN nn > 0 THEN raw / nn ELSE 0 END"
            f" AS auth FROM a{i}_f, a{i}_n)",
            f"h{i}_c AS MATERIALIZED (SELECT e.src AS id, SUM(a.auth) AS raw"
            f" FROM edges e JOIN a{i} a ON a.id = e.dst GROUP BY e.src)",
            f"h{i}_f AS MATERIALIZED (SELECT v.id, COALESCE(c.raw, 0) AS raw"
            f" FROM verts v LEFT JOIN h{i}_c c ON c.id = v.id)",
            f"h{i}_n AS MATERIALIZED (SELECT SQRT(SUM(raw*raw)) AS nn FROM h{i}_f)",
            f"h{i} AS MATERIALIZED (SELECT id, CASE WHEN nn > 0 THEN raw / nn ELSE 0 END"
            f" AS hub FROM h{i}_f, h{i}_n)",
        ]
    return (
        "WITH " + ",\n".join(steps) + f"""
    SELECT h.id, FLOOR(h.hub*1e6 + 0.5)/1e6 AS hub,
           FLOOR(a.auth*1e6 + 0.5)/1e6 AS auth
    FROM h{iterations} h JOIN a{iterations} a ON a.id = h.id
    """
    )


@query("graph_hits_nations", oracle=_hits_oracle(4), group="graph")
def graph_hits_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (4 L2-normalized supersteps) over the same
    directed dangling-free nation graph as graph_pagerank_nations —
    closing the Gelly linkanalysis pair (`linkanalysis/HITS.java`; the
    iterative loop is `graph/algorithms.py::hits`, normalizers folded in
    as 1-row broadcast aggregates so no driver action per superstep). The
    fixed-superstep chain is SQL-expressible, so the oracle unrolls the
    identical 4 iterations; both sides floor-round to 6dp."""
    from flink_ci_flink_spark.graph import hits

    t = load_tables(spark, sf_dir)
    n = t.nation.select("n_nationkey", "n_regionkey")
    head = n.groupBy("n_regionkey").agg(F.min("n_nationkey").alias("head_key"))
    a = n.alias("a")
    b = n.join(F.broadcast(head), "n_regionkey").alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey"))
        & (
            (F.col("a.n_nationkey") < F.col("b.n_nationkey"))
            | (F.col("b.n_nationkey") == F.col("b.head_key"))
        ),
    ).select(
        F.col("a.n_nationkey").cast("long").alias("src"),
        F.col("b.n_nationkey").cast("long").alias("dst"),
    )
    verts = n.select(F.col("n_nationkey").cast("long").alias("id"))
    out = hits(verts, edges, iterations=4)
    return out.select(
        "id",
        (F.floor(F.col("hub") * 1e6 + F.lit(0.5)) / 1e6).alias("hub"),
        (F.floor(F.col("auth") * 1e6 + F.lit(0.5)) / 1e6).alias("auth"),
    )


@query(
    "graph_dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), verts AS (
      SELECT DISTINCT src AS id FROM undirected
    ), reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN undirected u ON u.src = reach.id
    ), comp AS (
      SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
    ), qt AS (
      SELECT doc_id,
             CAST(len(list_filter(str_split_regex(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT c.component,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(q.n_tokens * 1000000000 + c.doc_id) % 1000000000
                AS BIGINT) AS canonical_doc
    FROM comp c JOIN qt q USING (doc_id)
    GROUP BY c.component
    """,
    group="graph",
)
def graph_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection for near-dup clusters: connected
    components over the 3-gram Jaccard >= 0.5 graph, then each cluster
    keeps its LONGEST document (token count, doc_id tie-break) as the
    canonical survivor — the policy a real curation pass uses (keep the
    most complete copy), vs graph_dedup_clusters' arbitrary min-id.
    Arg-max is encoded as max(n_tokens*1e9 + doc_id) — one exact-integer
    partial-aggregable MAX, no per-cluster sort
    (ref: `graph/library/ConnectedComponents.java` + curation extension)."""
    from flink_ci_flink_spark.pipeline.text import token_count

    t = load_tables(spark, sf_dir)
    edges = jaccard_pairs(t.documents, threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(None, edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    qt = t.documents.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    enc = F.col("n_tokens") * F.lit(1000000000) + F.col("doc_id")
    return (
        comp.join(qt, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.max(enc) % 1000000000).cast("bigint").alias("canonical_doc"),
        )
    )


def _semantic_clusters_oracle() -> str:
    """Nested-WITH composition: the fixed-point kNN oracle at k=1 gives
    every vector's single nearest neighbor; MUTUAL pairs (a's NN is b and
    b's NN is a) become undirected edges; recursive min-id components."""
    from flink_ci_flink_spark.queries.pipeline_q import _knn_fp_oracle_sql

    knn1 = _knn_fp_oracle_sql(k=1)
    return f"""
    WITH RECURSIVE nn1 AS ({knn1}),
    edges AS (
      SELECT a.query_id AS src, a.neighbor_id AS dst
      FROM nn1 a JOIN nn1 b
        ON b.query_id = a.neighbor_id AND b.neighbor_id = a.query_id
      WHERE a.query_id < a.neighbor_id
    ), undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), verts AS (
      SELECT DISTINCT src AS id FROM undirected
    ), reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN undirected u ON u.src = reach.id
    )
    SELECT id AS vec_id, MIN(r) AS component
    FROM reach GROUP BY id
    """


@query(
    "graph_semantic_clusters",
    oracle=_semantic_clusters_oracle(),
    group="graph",
)
def graph_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster discovery over the EMBEDDING corpus: mutual-
    nearest-neighbor edges (a and b are each other's single nearest
    neighbor through the fixed-point kNN join — the parameter-free edge
    rule that avoids a similarity threshold) + the same min-id
    connected-components loop the dedup clusters run. The whole chain —
    integer k-means training, probing, top-1 ranking, the mutuality join,
    and the iterative CC — is one hash-checked oracle (recursive CTE).
    Edge construction is the bucketed kNN join (one cell-key shuffle,
    ~sqrt(n) parallelism); CC is the constant-superstep Pregel loop
    (`graph/algorithms.py::connected_components`)."""
    from flink_ci_flink_spark.pipeline.similarity import knn_join

    t = load_tables(spark, sf_dir)
    nn1 = knn_join(
        t.embeddings, k=1, fixed_point=True, cell_cap=64
    ).select("query_id", "neighbor_id")
    b = nn1.select(
        F.col("query_id").alias("nb_query"),
        F.col("neighbor_id").alias("nb_neighbor"),
    )
    edges = (
        nn1.join(
            b,
            (F.col("nb_query") == F.col("neighbor_id"))
            & (F.col("nb_neighbor") == F.col("query_id")),
        )
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
        )
    )
    return connected_components(None, edges).select(
        F.col("id").alias("vec_id"), "component"
    )


def _canonical_by_model_oracle() -> str:
    """Composition oracle: the recursive-CTE near-dup components AND the
    unrolled perceptron training share one statement; the canonical pick
    replays the same (score DESC, doc_id DESC) window rank."""
    from flink_ci_flink_spark.pipeline.classifier import (
        TEXT_FEATURES_SQL,
        perceptron_cte_parts,
    )
    from flink_ci_flink_spark.queries.pipeline_q import _perceptron_label_sql

    parts, final, dotf = perceptron_cte_parts(
        TEXT_FEATURES_SQL, _perceptron_label_sql(), iterations=3
    )
    ptrain = ",\n    ".join(parts)
    return f"""
    WITH RECURSIVE {_EDGES_SQL},
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), verts AS (
      SELECT DISTINCT src AS id FROM undirected
    ), reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT u.dst, reach.r FROM reach JOIN undirected u ON u.src = reach.id
    ), comp AS (
      SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
    ),
    {ptrain},
    scored AS (
      SELECT doc_id, CAST({dotf} AS BIGINT) AS score
      FROM feat CROSS JOIN {final} w
    )
    SELECT component, n_docs, canonical_doc, canonical_score FROM (
      SELECT c.component, c.doc_id AS canonical_doc, s.score AS canonical_score,
             CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_docs,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY s.score DESC, c.doc_id DESC) AS rn
      FROM comp c JOIN scored s USING (doc_id))
    WHERE rn = 1
    """


@query(
    "graph_canonical_by_model",
    oracle=_canonical_by_model_oracle(),
    group="graph",
)
def graph_canonical_by_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-scored canonical selection — the trained-classifier successor
    to graph_dedup_canonical's keep-longest policy: near-dup clusters
    (connected components over the 3-gram Jaccard >= 0.5 graph) each keep
    the member the IN-ENGINE-TRAINED quality perceptron scores highest
    (doc_id DESC tie-break) — "keep the best copy as judged by the model",
    the policy a production curation pass actually wants. Training (3
    exact-integer gradient aggregates), component discovery, and the
    canonical window rank compose into ONE hash-checked statement: the
    oracle re-runs the recursive CC AND re-trains the model from scratch.
    Scores may be negative, so arg-max is a window rank, not the
    integer-encoding trick (which needs non-negative keys)."""
    from pyspark.sql import Window

    from flink_ci_flink_spark.pipeline.classifier import (
        perceptron_score,
        perceptron_train,
        text_feature_exprs,
    )

    t = load_tables(spark, sf_dir)
    edges = jaccard_pairs(t.documents, threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(None, edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    label = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    w = perceptron_train(t.documents, text_feature_exprs(), label, iterations=3)
    scored = perceptron_score(t.documents, text_feature_exprs(), w).select(
        "doc_id", "score"
    )
    joined = comp.join(scored, "doc_id")
    wcomp = Window.partitionBy("component")
    wrank = wcomp.orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        joined.withColumn("n_docs", F.count(F.lit(1)).over(wcomp))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("doc_id").alias("canonical_doc"),
            F.col("score").alias("canonical_score"),
        )
    )
