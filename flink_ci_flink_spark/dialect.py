"""Flink SQL dialect shim: run the reference's SQL text on Spark.

A user of the reference writes group-window SQL with the TUMBLE/HOP/SESSION
grouping functions and their `_START`/`_END`/`_ROWTIME` auxiliaries
(reference: `FlinkSqlOperatorTable.java` group window functions,
`LogicalWindowAggregateRuleBase` planner rewrite, Table API `Tumble.java` /
`Slide.java` / `Session.java`). Spark expresses the same windows with the
`window()` / `session_window()` TVFs in GROUP BY and a struct-typed window
column. `flink_sql()` rewrites the Flink spellings to the Spark ones and
executes — so the reference's own query text runs unchanged.

Rewrite table (case-insensitive; `INTERVAL 'n' UNIT` durations):

| Flink                          | Spark                              |
|--------------------------------|------------------------------------|
| TUMBLE(ts, size)               | window(ts, '<size>')               |
| HOP(ts, slide, size)           | window(ts, '<size>', '<slide>')    |
| SESSION(ts, gap)               | session_window(ts, '<gap>')        |
| TUMBLE_START/END(args)         | window.start / window.end          |
| HOP_START/END(args)            | window.start / window.end          |
| SESSION_START/END(args)        | session_window.start / .end        |
| x <> y, `quoted`               | passthrough (shared syntax)        |

`*_ROWTIME`/`*_PROCTIME` auxiliaries and processing-time windows are not
expressible (no per-row processing-time in the micro-batch model) and raise.
Statements containing MATCH_RECOGNIZE are delegated to
`cep.match_recognize.match_recognize_sql` (its own parser + NFA/compiled
execution), so one front door covers both surfaces.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_UNITS = {"SECOND": "seconds", "MINUTE": "minutes", "HOUR": "hours", "DAY": "days"}

_INTERVAL = r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?"


def _dur(n: str, unit: str) -> str:
    return f"{n} {_UNITS[unit.upper()]}"


def _rewrite_aux(sql: str) -> str:
    """TUMBLE_START(ts, size) → window.start etc. The auxiliary's arguments
    repeat the grouping's window spec, so they carry no extra information —
    Spark's struct field is the rewrite."""

    def aux(fn_prefix: str, spark_col: str, sql_text: str) -> str:
        pat = re.compile(
            rf"\b{fn_prefix}_(START|END|ROWTIME|PROCTIME)\s*\(" r"[^()]*\)",
            re.IGNORECASE,
        )

        def sub(m: re.Match) -> str:
            kind = m.group(1).upper()
            if kind in ("ROWTIME", "PROCTIME"):
                raise ValueError(
                    f"{fn_prefix}_{kind} is not expressible on Spark "
                    "(no per-row time attribute in the micro-batch model)"
                )
            return f"{spark_col}.{kind.lower()}"

        return pat.sub(sub, sql_text)

    sql = aux("TUMBLE", "window", sql)
    sql = aux("HOP", "window", sql)
    sql = aux("SESSION", "session_window", sql)
    return sql


def _rewrite_group_windows(sql: str) -> str:
    # TUMBLE(col, INTERVAL 'n' UNIT) -> window(col, 'n units')
    sql = re.sub(
        rf"\bTUMBLE\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window({m.group(1)}, '{_dur(m.group(2), m.group(3))}')",
        sql,
        flags=re.IGNORECASE,
    )
    # HOP(col, INTERVAL slide, INTERVAL size) -> window(col, size, slide)
    # (argument order differs: Flink is (slide, size), Spark is (size, slide))
    sql = re.sub(
        rf"\bHOP\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)",
        lambda m: (
            f"window({m.group(1)}, '{_dur(m.group(4), m.group(5))}', "
            f"'{_dur(m.group(2), m.group(3))}')"
        ),
        sql,
        flags=re.IGNORECASE,
    )
    # SESSION(col, INTERVAL gap) -> session_window(col, gap)
    sql = re.sub(
        rf"\bSESSION\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"session_window({m.group(1)}, '{_dur(m.group(2), m.group(3))}')",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def translate(sql: str) -> str:
    """Rewrite Flink group-window SQL text to Spark SQL text (pure string →
    string; no session needed). Auxiliaries first so `TUMBLE_START(` is
    consumed before the bare `TUMBLE(` rule could see it."""
    return _rewrite_group_windows(_rewrite_aux(sql))


def flink_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute reference-dialect SQL on Spark (see module docstring).
    Tables must already be registered as views (e.g. via
    `catalog.load_tables(...).events.createOrReplaceTempView("events")`)."""
    if re.search(r"\bMATCH_RECOGNIZE\b", sql, re.IGNORECASE):
        from flink_ci_flink_spark.cep.match_recognize import match_recognize_sql

        return match_recognize_sql(spark, sql)
    return spark.sql(translate(sql))
