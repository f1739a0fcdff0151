"""Graph library (Gelly parity): DataFrame-iteration algorithms."""

from flink_ci_flink_spark.graph.algorithms import (  # noqa: F401
    adamic_adar,
    community_detection,
    connected_components,
    degrees,
    gather_sum_apply_iteration,
    hits,
    label_propagation,
    pagerank,
    pregel,
    scatter_gather_iteration,
    sssp,
    summarize,
    triangle_count,
    undirect,
)
