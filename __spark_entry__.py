"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``flink_ci_flink_spark``; this module is a thin view
over its query registry (one entry per implemented operator, SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from flink_ci_flink_spark.queries import QUERIES  # noqa: E402

FLAGSHIP = "tpch_q3_shipping_priority"

# The driver samples a prefix of queries() for its sf0.01 correctness check.
# The prefix is rotated each round: a handful of per-group anchors stay (so
# the sample always spans tpch/relational/window/pipeline/graph/cep/udf/
# tpcds), every oracle whose final aggregate was re-cast to BIGINT this
# round is included to prove the fix driver-green, and the remaining slots
# go to queries never driver-checked in any prior round (cumulative proven
# set grows monotonically; rounds 1-3 covered 76/140).
_PRIORITY = [
    # group anchors, driver-green in prior rounds (tpch/pipe/cep/udf remain
    # spanned by the never-checked rows below)
    "tpch_q3_shipping_priority",
    "sessionize_ordinal",
    "graph_dedup_clusters",
    # round-4 features, never driver-checked: temporal-join SQL + sketches
    "flinksql_temporal_join",
    "pipe_hll_distinct",
    "pipe_kmv_distinct",
    "pipe_countmin_freq",
    # HUGEINT-cast oracles (r3 reds + latent class) — prove green
    "pipe_simhash",
    "tpcds_shape_frequent_best",
    "tpch_q11_important_stock",
    "tpcds_shape_returns_above_avg",
    "tpcds_shape_channel_rollup",
    "tpcds_shape_cross_year_parts",
    "tpcds_shape_rank_over_rollup",
    "tpcds_shape_yoy_growth",
    "tpcds_shape_union_channel_agg",
    "tpcds_shape_cumulative_crossover",
    "tpcds_shape_full_outer_overlap",
    "tpcds_shape_moving_dev",
    "tpcds_shape_grouping_rank",
    "tpcds_shape_pivot_months",
    "tpcds_shape_net_after_returns",
    "tpcds_shape_channel_band",
    "tpcds_shape_anti_ratio",
    "tpcds_shape_revenue_bands",
    # never driver-checked before round 4
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "pipe_boilerplate_screen",
    "tpch_q20_potential_promotion",
    "map_construct_explode",
    "null_safe_comparison",
    "pipe_quantized_ann",
    "pipe_pq_ann",
    "over_count_distinct",
    "pipe_redact_pii",
    "pipe_repetition_filters",
    "pipe_contamination_overlap",
    "pipe_chunk_documents",
    "pipe_semdedup",
    "pipe_cosine_near_dup",
    "pipe_decode_bmp",
    "graph_degrees_triangles",
    "graph_sssp_nations",
    "pipe_bpe_train",
    "cep_error_burst",
    "udf_python_udtf",
    "udf_cogroup",
    "fn_json",
]


def _ordered_names() -> list[str]:
    pri = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(pri)]
    return pri + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
