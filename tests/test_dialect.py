"""Flink SQL dialect shim: string-rewrite unit tests (execution parity is
covered by the flinksql_* oracle queries in test_oracle_parity)."""

from __future__ import annotations

import pytest

from flink_ci_flink_spark.dialect import translate


def test_tumble_rewrite():
    got = translate(
        "SELECT TUMBLE_START(ts, INTERVAL '6' HOUR) AS ws, COUNT(*) n "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '6' HOUR)"
    )
    assert "window(ts, '6 hours')" in got
    assert "window.start AS ws" in got
    assert "TUMBLE" not in got.upper()


def test_hop_swaps_argument_order():
    got = translate(
        "SELECT HOP_END(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR) "
        "FROM events GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)"
    )
    # Flink (slide=5m, size=1h) -> Spark window(ts, size, slide)
    assert "window(ts, '1 hours', '5 minutes')" in got
    assert "window.end" in got


def test_session_rewrite():
    got = translate(
        "SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) s "
        "FROM events GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id"
    )
    assert "session_window(ts, '30 minutes')" in got
    assert "session_window.start s" in got


def test_passthrough_untouched():
    sql = "SELECT a <> b, `weird col` FROM t WHERE x BETWEEN 1 AND 2"
    assert translate(sql) == sql


def test_rowtime_auxiliary_rejected():
    with pytest.raises(ValueError, match="TUMBLE_ROWTIME"):
        translate("SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) FROM events")


def test_match_recognize_delegates(spark, sf_dir):
    """A MATCH_RECOGNIZE statement through the dialect front door returns
    the same rows as calling the CEP SQL parser directly."""
    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.cep.match_recognize import match_recognize_sql
    from flink_ci_flink_spark.dialect import flink_sql

    load_tables(spark, sf_dir).events.createOrReplaceTempView("events")
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      MEASURES FIRST(A.ts) AS start_ts, LAST(B.ts) AS end_ts
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A B)
      DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'
    )
    """
    via_dialect = {tuple(r) for r in flink_sql(spark, sql).collect()}
    direct = {tuple(r) for r in match_recognize_sql(spark, sql).collect()}
    assert via_dialect == direct and via_dialect


def test_case_insensitive():
    got = translate("select tumble_start(ts, interval '1' day) from e group by tumble(ts, interval '1' day)")
    assert "window(ts, '1 days')" in got
    assert "window.start" in got
