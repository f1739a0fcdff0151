"""Graph library (Gelly parity): DataFrame-iteration algorithms."""

from flink_ci_flink_spark.graph.algorithms import (  # noqa: F401
    adamic_adar,
    clustering_coefficients,
    community_detection,
    connected_components,
    degrees,
    gather_sum_apply_iteration,
    global_clustering_stats,
    hits,
    jaccard_index,
    label_propagation,
    pagerank,
    pregel,
    scatter_gather_iteration,
    sssp,
    summarize,
    triadic_census,
    triangle_count,
    undirect,
    vertex_metrics,
    vertex_triangles,
)
