"""Graph library (Gelly parity): DataFrame-iteration algorithms."""

from flink_ci_flink_spark.graph.algorithms import (  # noqa: F401
    adamic_adar,
    community_detection,
    connected_components,
    degrees,
    hits,
    label_propagation,
    pagerank,
    pregel,
    sssp,
    summarize,
    triangle_count,
    undirect,
)
