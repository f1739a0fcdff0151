"""Reference-dialect SQL queries: Flink group-window SQL text executed
verbatim through the `dialect.flink_sql` shim (TUMBLE/HOP/SESSION grouping
functions + `_START` auxiliaries rewritten to Spark's window TVFs).

These intentionally reuse the SAME oracles as the DataFrame-API window
queries (`window_tumble` / `window_hop` / `window_session_native`), proving
the SQL-text front door produces identical results to the native API."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.dialect import flink_sql
from flink_ci_flink_spark.queries.registry import query


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load_tables(spark, sf_dir).events.createOrReplaceTempView("events")


@query(
    "flinksql_tumble",
    oracle="""
    SELECT CAST(FLOOR(EPOCH(ts) / 21600) * 21600 AS BIGINT) AS ws_s,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
    group="dialect",
)
def flinksql_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TUMBLE group-window SQL, verbatim
    (`FlinkSqlOperatorTable` TUMBLE/TUMBLE_START; planner
    `LogicalWindowAggregateRuleBase`), run through the dialect shim."""
    _events_view(spark, sf_dir)
    return flink_sql(
        spark,
        """
        SELECT unix_timestamp(TUMBLE_START(ts, INTERVAL '6' HOUR)) AS ws_s,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '6' HOUR), event_type
        """,
    )


@query(
    "flinksql_hop",
    oracle="""
    SELECT ws_s, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM (
      SELECT (CAST(FLOOR((EPOCH(ts) - 43200) / 21600) AS BIGINT) + 1 + u.i) * 21600 AS ws_s,
             value
      FROM events
      CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS i) u
      WHERE (CAST(FLOOR((EPOCH(ts) - 43200) / 21600) AS BIGINT) + 1 + u.i)
            <= CAST(FLOOR(EPOCH(ts) / 21600) AS BIGINT)
    )
    GROUP BY ws_s
    """,
    group="dialect",
)
def flinksql_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP group-window SQL, verbatim — note the shim swaps Flink's
    (slide, size) argument order into Spark's (size, slide)."""
    _events_view(spark, sf_dir)
    return flink_sql(
        spark,
        """
        SELECT unix_timestamp(
                 HOP_START(ts, INTERVAL '6' HOUR, INTERVAL '12' HOUR)) AS ws_s,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM events
        GROUP BY HOP(ts, INTERVAL '6' HOUR, INTERVAL '12' HOUR)
        """,
    )


@query(
    "flinksql_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_s,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total
    FROM sessions
    GROUP BY user_id, sid
    """,
    group="dialect",
)
def flinksql_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION group-window SQL, verbatim (gap-merge semantics identical to
    the native session_window path)."""
    _events_view(spark, sf_dir)
    return flink_sql(
        spark,
        """
        SELECT user_id,
               unix_timestamp(SESSION_START(ts, INTERVAL '30' MINUTE)) AS session_start_s,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total
        FROM events
        GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
        """,
    )


@query(
    "flinksql_temporal_join",
    oracle="""
    SELECT c.event_id, c.user_id,
           CAST(FLOOR(EPOCH(c.ts)) AS BIGINT) AS ts_s,
           ROUND(p.value, 3) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    group="dialect",
)
def flinksql_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's temporal table join SQL, verbatim: `JOIN dim FOR
    SYSTEM_TIME AS OF fact.t ON ...` (FLIP-132 syntax; planner rule
    `LogicalCorrelateToJoinFromTemporalTableRule`, runtime
    `TemporalRowTimeJoinOperator.java:71` — latest version at-or-before the
    fact row's time, inner semantics drop version-less facts). The dialect
    shim routes the join block through `operators.joins.asof_join` (union +
    forward-fill, one shuffle) and rewrites the rest of the statement.
    DuckDB's native ASOF JOIN (inner) is the oracle."""
    t = load_tables(spark, sf_dir)
    t.events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    ).createOrReplaceTempView("clicks")
    t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).createOrReplaceTempView("purchases")
    return flink_sql(
        spark,
        """
        SELECT c.event_id, c.user_id,
               unix_timestamp(c.ts) AS ts_s,
               ROUND(p.value, 3) AS purchase_value
        FROM clicks AS c
        JOIN purchases FOR SYSTEM_TIME AS OF c.ts AS p
          ON c.user_id = p.user_id
        """,
        versioned={"purchases": "ts"},
    )


@query(
    "flinksql_temporal_fn",
    oracle="""
    SELECT c.event_id, c.user_id,
           CAST(FLOOR(EPOCH(c.ts)) AS BIGINT) AS ts_s,
           ROUND(p.value, 3) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    group="dialect",
)
def flinksql_temporal_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELEASE-NATIVE temporal-join surface of the reference: Flink
    1.11 predates FOR SYSTEM_TIME joins — users register a temporal table
    FUNCTION (`Table.createTemporalTableFunction(timeAttribute, key)`,
    `TemporalTableFunction.java:35`) and join with
    `FROM fact f, LATERAL TABLE (Rates(f.ts)) AS r WHERE f.k = r.k`.
    The dialect registry mirrors createTemporalTableFunction; the rewrite
    executes the same asof_join plan as the FLIP-132 path, so both the
    1.11 syntax and the successor syntax run on one operator. Same DuckDB
    ASOF oracle as `flinksql_temporal_join` — same semantics, the
    release's own spelling."""
    from flink_ci_flink_spark.dialect import create_temporal_table_function

    t = load_tables(spark, sf_dir)
    t.events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    ).createOrReplaceTempView("clicks")
    t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).createOrReplaceTempView("purchases")
    create_temporal_table_function(
        "LatestPurchase", "purchases", time_attribute="ts", primary_key="user_id"
    )
    return flink_sql(
        spark,
        """
        SELECT c.event_id, c.user_id,
               unix_timestamp(c.ts) AS ts_s,
               ROUND(p.value, 3) AS purchase_value
        FROM clicks AS c, LATERAL TABLE (LatestPurchase(c.ts)) AS p
        WHERE c.user_id = p.user_id
        """,
    )
