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
# correctness check. Round-8 prefix: (1) the six queries added THIS round
# (line dedup, BM25, hybrid rerank, quantile screens, DESC secondary
# ordering), (2) every query whose code path changed this round — the
# cep_stream_replay compiled path + ident fix (all CEP names), the
# pipeline_sql view cleanup, and the spread_small_scan repartition that
# now sits under the dedup/tfidf/bm25 chokepoints — then (3) a
# re-validation tail of the longest-unchecked names (latest green row r2,
# then r3).
_PRIORITY = [
    # -- (1) round-8 additions / changes, never driver-proven --
    "pipe_knn_join_scaled",  # NEW fixed-point training + full hash oracle
    "pipe_cluster_balanced_sample",
    "pipe_embedding_outliers",
    "pipe_ann_recall",
    "pipe_pq_trained_ann",
    "pipe_ivfpq_ann",
    "pipe_ivfpq_store_probe",
    "pipe_temperature_mix",
    "pipe_embedding_curation",
    "pipe_hard_negatives",
    "pipe_ivfpq_recall",
    "graph_semantic_clusters",
    "streaming_centroid_refresh_replay",
    "streaming_quantile_histogram_replay",
    "streaming_ivfpq_ingest_replay",
    "streaming_interval_join_replay",
    "streaming_semi_join_replay",
    "streaming_broadcast_rules_replay",
    "streaming_cdc_agg_replay",
    "streaming_outer_join_replay",
    "streaming_full_outer_join_replay",
    "streaming_dropdup_watermark_replay",
    "streaming_complete_agg_replay",
    "streaming_manifest_sink_replay",
    "streaming_restart_recovery_replay",
    "streaming_hll_distinct_replay",
    "streaming_countmin_replay",
    "graph_dedup_canonical",
    "pipe_audio_features",
    "catalog_column_stats",
    "graph_hits_nations",
    "lookup_join_async",
    "streaming_heavy_hitters_replay",
    "streaming_minhash_ingest_replay",
    "streaming_line_dedup_replay",
    "pipe_zorder_layout",
    "pipe_heavy_hitters",
    "pipe_e2e_curation_v2",
    "pipe_line_dedup",
    "pipe_bm25_topk",
    "pipe_hybrid_rerank",
    "pipe_quality_quantile_screen",
    "pipe_quality_screen_scaled",
    "cep_mr_desc_secondary",
    # -- (2) code paths changed this round --
    "cep_mr_prev_stream_replay",
    "pipe_sql_front_door",
    "cep_mr_secondary_order",
    "pipe_jaccard_prefix",
    "pipe_tfidf_top_terms",
    "graph_dedup_clusters",
    # -- (3) re-validation: oldest-proven first (r2 then r3) --
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
