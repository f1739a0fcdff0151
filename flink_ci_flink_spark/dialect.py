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


def _rewrite_lateral_table(sql: str) -> str:
    """`LATERAL TABLE(f(args))` (the reference's table-function invocation,
    `SqlToOperationConverter` correlate handling) → Spark's `LATERAL f(args)`.
    Trailing `[AS] T(c1, ...)` aliases and the `LEFT JOIN ... ON TRUE` form
    are shared syntax and pass through. Balanced-paren scan — the argument
    can itself contain calls."""
    out = []
    i = 0
    pat = re.compile(r"\bLATERAL\s+TABLE\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i : m.start()])
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parentheses in LATERAL TABLE(...)")
        out.append("LATERAL " + sql[m.end() : j - 1].strip())
        i = j


def translate(sql: str) -> str:
    """Rewrite Flink group-window SQL text to Spark SQL text (pure string →
    string; no session needed). Auxiliaries first so `TUMBLE_START(` is
    consumed before the bare `TUMBLE(` rule could see it."""
    return _rewrite_lateral_table(_rewrite_group_windows(_rewrite_aux(sql)))


def flink_sql(
    spark: SparkSession, sql: str, versioned: dict[str, str] | None = None
) -> DataFrame:
    """Execute reference-dialect SQL on Spark (see module docstring).
    Tables must already be registered as views (e.g. via
    `catalog.load_tables(...).events.createOrReplaceTempView("events")`).

    ``versioned``: version-time column per versioned table, for temporal
    (`FOR SYSTEM_TIME AS OF`) joins against tables not declared via
    `flink_ddl` (a DDL-declared table's WATERMARK column is used
    automatically, matching the reference's "event-time attribute of the
    versioned table" rule)."""
    if re.search(r"\bMATCH_RECOGNIZE\b", sql, re.IGNORECASE):
        from flink_ci_flink_spark.cep.match_recognize import match_recognize_sql

        return match_recognize_sql(spark, sql)
    if re.search(r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", sql, re.IGNORECASE):
        sql = _rewrite_temporal_join(spark, sql, versioned or {})
    if _TEMPORAL_FN_REGISTRY and re.search(
        r"\bLATERAL\s+TABLE\b", sql, re.IGNORECASE
    ):
        sql = _rewrite_temporal_table_function(spark, sql)
    return spark.sql(translate(sql))


# ---------------------------------------------------------------------------
# Temporal table join: JOIN dim FOR SYSTEM_TIME AS OF fact.t AS d ON ...
# Ref: `LogicalCorrelateToJoinFromTemporalTableRule` + runtime
# `TemporalRowTimeJoinOperator.java:71` (latest right-side version with
# version-time <= the left row's time, per join key; javadoc :50-69). Flink
# syntax: FLIP-132 `FOR SYSTEM_TIME AS OF <left time attribute>`. Spark has
# no ASOF join in SQL, so the join block executes through
# `operators.joins.asof_join` (union + forward-fill — one shuffle, no cross
# product) and the surrounding statement is rewritten to select from the
# joined view.
# ---------------------------------------------------------------------------

_TEMPORAL_RE = re.compile(
    r"FROM\s+`?(\w+)`?(?:\s+AS)?\s+(\w+)\s+"
    r"(LEFT\s+)?JOIN\s+`?(\w+)`?\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(\w+)\.(\w+)\s+(?:AS\s+)?(\w+)\s+"
    r"ON\s+(.+?)(?=\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|UNION)\b|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_TEMPORAL_SEQ = [0]


def _rewrite_temporal_join(
    spark: SparkSession, sql: str, versioned: dict[str, str]
) -> str:
    from flink_ci_flink_spark.operators.joins import asof_join

    m = _TEMPORAL_RE.search(sql)
    if not m:
        raise ValueError(
            "FOR SYSTEM_TIME AS OF present but the join block does not match "
            "the supported shape: FROM fact [AS] f [LEFT] JOIN dim "
            "FOR SYSTEM_TIME AS OF f.t [AS] d ON f.k = d.k [AND ...]"
        )
    ltab, lalias, left_kw, rtab, of_alias, of_col, ralias, on_text = m.groups()
    if of_alias.lower() != lalias.lower():
        raise ValueError(
            f"FOR SYSTEM_TIME AS OF must reference the left table's time "
            f"attribute ({lalias}.<col>), got {of_alias}.{of_col}"
        )
    # versioned table's version-time column: explicit map, else DDL WATERMARK
    rtime = versioned.get(rtab)
    if rtime is None and rtab in _DDL_REGISTRY:
        wm = _DDL_REGISTRY[rtab].get("watermark")
        rtime = wm[0] if wm else None
    if rtime is None:
        raise ValueError(
            f"versioned table {rtab!r} needs a version-time column: declare "
            "it via flink_ddl with a WATERMARK clause or pass "
            "versioned={'" + rtab + "': '<time_col>'}"
        )

    left_keys, right_keys = [], []
    for cond in re.split(r"\bAND\b", on_text, flags=re.IGNORECASE):
        cm = re.match(r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", cond)
        if not cm:
            raise ValueError(f"unsupported temporal-join ON condition: {cond!r}")
        a_al, a_col, b_al, b_col = cm.groups()
        if a_al.lower() == lalias.lower() and b_al.lower() == ralias.lower():
            left_keys.append(a_col), right_keys.append(b_col)
        elif a_al.lower() == ralias.lower() and b_al.lower() == lalias.lower():
            left_keys.append(b_col), right_keys.append(a_col)
        else:
            raise ValueError(f"ON condition references unknown alias: {cond!r}")

    left_df, right_df = spark.table(ltab), spark.table(rtab)
    # align right key names onto the left's (asof_join joins on shared names)
    for rk, lk in zip(right_keys, left_keys):
        if rk != lk:
            right_df = right_df.withColumnRenamed(rk, lk)
    rvals = [c for c in right_df.columns if c not in left_keys and c != rtime]
    clash = set(rvals) & {c for c in left_df.columns if c not in left_keys}
    if clash:
        raise ValueError(
            f"column name collision between fact and versioned table: "
            f"{sorted(clash)} — alias them apart before the temporal join"
        )
    joined = asof_join(
        left_df,
        right_df,
        on=left_keys,
        left_time=of_col,
        right_time=rtime,
        right_values=rvals,
        how="left" if left_kw else "inner",
    )
    _TEMPORAL_SEQ[0] += 1
    view = f"__temporal_join_{_TEMPORAL_SEQ[0]}"
    joined.createOrReplaceTempView(view)
    rewritten = sql[: m.start()] + f"FROM {view} AS {lalias} " + sql[m.end() :]
    # the versioned side's columns now live on the joined view
    return re.sub(
        rf"\b{ralias}\.", f"{lalias}.", rewritten, flags=re.IGNORECASE
    )


# ---------------------------------------------------------------------------
# DDL translation: CREATE TABLE ... WITH ('connector' = ...) → Spark readers.
# Ref: flink-table SQL DDL (`SqlCreateTable.java`), factory options of the
# filesystem / kafka / datagen connectors. The reference's catalog DDL maps
# onto Spark reader + temp-view registration; WATERMARK FOR clauses become
# withWatermark on streaming reads.
# ---------------------------------------------------------------------------

_TYPE_REWRITES = [
    (r"\bTIMESTAMP_LTZ\s*(\(\d+\))?", "TIMESTAMP"),
    (r"\bTIMESTAMP\s*(\(\d+\))?", "TIMESTAMP"),
    (r"\bTIME\s*(\(\d+\))?\b", "STRING"),  # no TIME type in Spark
    (r"\bBYTES\b", "BINARY"),
    (r"\bROW\s*<", "STRUCT<"),
    (r"\bMULTISET\s*<", "MAP<"),
]


def _spark_type(flink_type: str) -> str:
    t = flink_type.strip()
    for pat, rep in _TYPE_REWRITES:
        t = re.sub(pat, rep, t, flags=re.IGNORECASE)
    return t


def _split_top_level(body: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in body:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


def parse_ddl(ddl: str) -> dict:
    """Parse a reference-dialect CREATE TABLE into {name, columns, computed,
    watermark, options}. Columns are (name, spark_type); computed columns
    are (name, sql_expr); watermark is (column, 'n units') or None."""
    m = re.match(
        r"\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r"`?([\w.]+)`?\s*\((.*)\)\s*WITH\s*\((.*?)\)\s*;?\s*$",
        ddl,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("not a CREATE TABLE ... WITH (...) statement")
    name, body, opts_s = m.group(1), m.group(2), m.group(3)
    columns: list[tuple[str, str]] = []
    computed: list[tuple[str, str]] = []
    watermark = None
    for item in _split_top_level(body):
        item = item.strip()
        if not item:
            continue
        wm = re.match(
            rf"WATERMARK\s+FOR\s+`?(\w+)`?\s+AS\s+`?\w+`?\s*-\s*{_INTERVAL}",
            item,
            re.IGNORECASE,
        )
        if wm:
            watermark = (wm.group(1), _dur(wm.group(2), wm.group(3)))
            continue
        if re.match(r"(PRIMARY\s+KEY|CONSTRAINT)\b", item, re.IGNORECASE):
            continue  # advisory in the reference's connectors; no-op here
        cm = re.match(r"`?(\w+)`?\s+AS\s+(.+)$", item, re.IGNORECASE | re.DOTALL)
        if cm:
            expr = cm.group(2).strip()
            if re.search(r"\bPROCTIME\s*\(\s*\)", expr, re.IGNORECASE):
                raise ValueError(
                    "PROCTIME() computed columns are not expressible "
                    "(no per-row processing time in the micro-batch model)"
                )
            computed.append((cm.group(1), expr))
            continue
        nm, _, ty = item.partition(" ")
        columns.append((nm.strip("`"), _spark_type(ty)))
    options = dict(
        re.findall(r"'([^']+)'\s*=\s*'([^']*)'", opts_s)
    )
    return {
        "name": name,
        "columns": columns,
        "computed": computed,
        "watermark": watermark,
        "options": options,
    }


def flink_ddl(spark: SparkSession, ddl: str, streaming: bool = False) -> DataFrame:
    """Execute a reference-dialect CREATE TABLE: build the matching Spark
    reader (filesystem → read/readStream of the declared format, kafka →
    the option-mapped kafka source, datagen → rate source), apply computed
    columns and the WATERMARK clause (streaming), and register the result
    as a temp view under the table name. Returns the DataFrame."""
    from pyspark.sql import functions as F

    spec = parse_ddl(ddl)
    opts = spec["options"]
    connector = opts.get("connector", "filesystem").lower()
    schema_ddl = ", ".join(f"`{n}` {t}" for n, t in spec["columns"])

    if connector == "filesystem":
        fmt = opts.get("format", "parquet").lower()
        path = opts["path"]
        if streaming:
            df = spark.readStream.schema(schema_ddl).format(fmt).load(path)
        else:
            import os

            if os.path.exists(path):
                df = spark.read.schema(schema_ddl).format(fmt).load(path)
            else:
                # sink-table declaration: nothing to read yet — register an
                # empty, schema-correct view; flink_insert writes to it
                df = spark.createDataFrame([], schema_ddl)
    elif connector == "kafka":
        from flink_ci_flink_spark.sources import read_kafka

        df = read_kafka(spark, opts, streaming=streaming)
    elif connector == "datagen":
        rps = int(opts.get("rows-per-second", 10))
        if streaming:
            df = spark.readStream.format("rate").option("rowsPerSecond", rps).load()
        else:
            df = spark.range(int(opts.get("number-of-rows", 1000)))
    else:
        raise ValueError(f"unsupported connector {connector!r} (doc-note scope)")

    _DDL_REGISTRY[spec["name"]] = spec
    for cname, expr in spec["computed"]:
        df = df.withColumn(cname, F.expr(expr))
    if streaming and spec["watermark"] is not None:
        col, delay = spec["watermark"]
        df = df.withWatermark(col, delay)
    df.createOrReplaceTempView(spec["name"])
    return df


#: DDL-registered table specs (name → parse_ddl dict) so INSERT INTO can
#: resolve a sink's connector/options. Process-wide, like a catalog.
_DDL_REGISTRY: dict[str, dict] = {}


def flink_insert(spark: SparkSession, sql: str) -> None:
    """Execute a reference-dialect INSERT INTO/OVERWRITE statement against a
    table previously declared with `flink_ddl`: the SELECT runs through
    `flink_sql` (group-window rewrites included) and the rows land in the
    sink the DDL's connector options describe — filesystem writes the
    declared format, `print` shows on the driver, `blackhole` materializes
    and discards (the reference's test sinks). Ref: `SqlToOperationConverter`
    INSERT handling + filesystem/print/blackhole table factories."""
    m = re.match(
        r"\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?`?([\w.]+)`?\s+(.*)$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("not an INSERT INTO/OVERWRITE statement")
    mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
    name, select = m.group(2), m.group(3)
    spec = _DDL_REGISTRY.get(name)
    if spec is None:
        raise ValueError(f"table {name!r} was not declared via flink_ddl")
    df = flink_sql(spark, select)
    connector = spec["options"].get("connector", "filesystem").lower()
    if connector == "filesystem":
        fmt = spec["options"].get("format", "parquet").lower()
        df.write.mode(mode).format(fmt).save(spec["options"]["path"])
    elif connector == "print":
        df.show(truncate=False)
    elif connector == "blackhole":
        df.foreach(lambda _row: None)
    else:
        raise ValueError(f"unsupported sink connector {connector!r}")


# ---------------------------------------------------------------------------
# Temporal table FUNCTIONS — the reference release's own temporal-join
# surface (Flink 1.11 predates FOR SYSTEM_TIME joins; users call
# `Table.createTemporalTableFunction(timeAttribute, primaryKey)`
# (`TemporalTableFunction.java:35`) and join with
# `FROM fact f, LATERAL TABLE (Rates(f.ts)) AS r WHERE f.k = r.k`).
# The registry mirrors createTemporalTableFunction; the rewrite executes
# the same asof_join as the FOR SYSTEM_TIME path and folds the versioned
# side into the fact view. The WHERE's key-equality predicate survives as
# `f.k = f.k` — a tautology that (exactly like the reference's equi-join)
# still drops NULL-keyed fact rows.
# ---------------------------------------------------------------------------

_TEMPORAL_FN_REGISTRY: dict[str, tuple[str, str, str]] = {}


def create_temporal_table_function(
    name: str, table: str, time_attribute: str, primary_key: str
) -> None:
    """Register `name` as a temporal table function over view `table`
    (`Table.createTemporalTableFunction` analog): at lookup time t it
    yields the latest version (max `time_attribute` <= t) per
    `primary_key`."""
    _TEMPORAL_FN_REGISTRY[name.lower()] = (table, time_attribute, primary_key)


def _sub_outside_literals(pattern: str, repl: str, sql: str) -> str:
    """re.sub applied only to identifier context — segments outside
    single-quoted SQL string literals (a literal like 'r.name' must not
    be rewritten)."""
    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(
        p if i % 2 else re.sub(pattern, repl, p, flags=re.IGNORECASE)
        for i, p in enumerate(parts)
    )


def _rewrite_temporal_table_function(spark: SparkSession, sql: str) -> str:
    """Rewrite every registered-function `f, LATERAL TABLE (Fn(f.t)) AS r`
    occurrence (looped — a query may join several temporal functions);
    unregistered LATERAL TABLEs are left for translate()'s UDTF path."""
    from flink_ci_flink_spark.operators.joins import asof_join

    pat = re.compile(
        r"FROM\s+`?(\w+)`?(?:\s+AS)?\s+(\w+)\s*,\s*"
        r"LATERAL\s+TABLE\s*\(\s*(\w+)\s*\(\s*(\w+)\.(\w+)\s*\)\s*\)"
        r"(?:\s+AS)?\s+(\w+)",
        re.IGNORECASE,
    )
    for _ in range(10):  # safety cap; each pass folds one occurrence
        m = next(
            (
                mm
                for mm in pat.finditer(sql)
                if mm.group(3).lower() in _TEMPORAL_FN_REGISTRY
            ),
            None,
        )
        if m is None:
            return sql
        ltab, lalias, fn, of_alias, of_col, ralias = m.groups()
        if of_alias.lower() != lalias.lower():
            raise ValueError(
                f"temporal table function argument must be the fact's time "
                f"attribute ({lalias}.<col>), got {of_alias}.{of_col}"
            )
        rtab, rtime, rkey = _TEMPORAL_FN_REGISTRY[fn.lower()]
        left_df, right_df = spark.table(ltab), spark.table(rtab)
        if rkey not in left_df.columns:
            raise ValueError(
                f"temporal table function join key {rkey!r} must exist on the "
                f"fact table (shared-name equi-key, as in the reference's "
                "WHERE f.k = r.k)"
            )
        # expose the matched version's time attribute too (a `r.<rtime>`
        # reference in SELECT must resolve), unless its name collides with
        # a fact column — then the fold cannot disambiguate
        rvals = [c for c in right_df.columns if c not in (rkey, rtime)]
        if rtime not in left_df.columns:
            rvals.append(rtime)
        elif re.search(rf"\b{ralias}\.{rtime}\b", sql, re.IGNORECASE):
            raise ValueError(
                f"cannot fold {ralias}.{rtime}: the versioned side's time "
                f"attribute collides with a fact column of the same name — "
                "rename one side"
            )
        joined = asof_join(
            left_df,
            right_df,
            on=[rkey],
            left_time=of_col,
            right_time=rtime,
            right_values=rvals,
            how="inner",
        )
        _TEMPORAL_SEQ[0] += 1
        view = f"__temporal_fn_{_TEMPORAL_SEQ[0]}"
        joined.createOrReplaceTempView(view)
        rewritten = sql[: m.start()] + f"FROM {view} AS {lalias}" + sql[m.end() :]
        sql = _sub_outside_literals(rf"\b{ralias}\.", f"{lalias}.", rewritten)
    raise ValueError("too many temporal table function joins in one statement")
