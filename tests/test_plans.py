"""Plan-property regression tests — the Blink planner's golden-plan tests
(`flink-table-planner-blink/src/test/resources/.../plan/`) re-expressed as
property assertions over Catalyst physical plans: pushdown reaches the
scan, small dims broadcast, map-only operators stay exchange-free, and the
single-scan restructures stay single-scan. Runs at sf0.001 (plan shape is
SF-independent)."""

from __future__ import annotations

from flink_ci_flink_spark.plans import facts
from flink_ci_flink_spark.queries import QUERIES

from tests.conftest import SF_DIR


def _final_plan(df) -> str:
    """Executed AQE-final plan text only (the `== Initial Plan ==` section
    repeats every node and would double scan/exchange counts)."""
    df.collect()
    txt = df._jdf.queryExecution().executedPlan().toString()
    return txt.split("== Initial Plan ==")[0]


def test_tpch_q3_pushdown_and_broadcast(spark):
    df = QUERIES["tpch_q3_shipping_priority"].fn(spark, SF_DIR)
    txt = _final_plan(df)
    f = facts(df)
    assert f.has_pushed_filters
    assert "BroadcastHashJoin" in txt
    assert "*(" in txt  # whole-stage-codegen'd spans


def test_redact_pii_is_map_only(spark):
    txt = _final_plan(QUERIES["pipe_redact_pii"].fn(spark, SF_DIR))
    assert "Exchange" not in txt


def test_span_dedup_single_scan(spark):
    """The one-corpus-scan restructure: window-over-hash screen instead of
    groupBy + join-back. A second scan sneaking in means the corpus gets
    re-tokenized — 2x the dominant cost at 100 TB."""
    txt = _final_plan(QUERIES["pipe_span_dedup"].fn(spark, SF_DIR))
    assert txt.count("Scan parquet") == 1


def test_chunk_documents_no_shuffle(spark):
    txt = _final_plan(QUERIES["pipe_chunk_documents"].fn(spark, SF_DIR))
    assert "Exchange" not in txt


def test_scan_schema_pruned_for_calc(spark):
    f = facts(QUERIES["calc_project_filter"].fn(spark, SF_DIR))
    schemas = f.scan_schema()
    assert schemas, "expected a parquet scan with ReadSchema"
    # projection pruning: the 16-column lineitem scan must be narrowed
    assert all(s.count(",") < 12 for s in schemas)
