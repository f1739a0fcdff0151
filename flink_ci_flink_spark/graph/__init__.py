"""Graph library (Gelly parity): DataFrame-iteration algorithms."""

from flink_ci_flink_spark.graph.algorithms import (  # noqa: F401
    connected_components,
    degrees,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
    undirect,
)
