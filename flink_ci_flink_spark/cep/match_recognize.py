"""MATCH_RECOGNIZE-style helper over the CEP engine.

Reference: SQL `MATCH_RECOGNIZE` compiles onto the CEP NFA
(`StreamExecMatch.scala:68`, runtime glue flink-table-runtime-blink
`operators/match/`). Spark SQL has no MATCH_RECOGNIZE; this helper exposes
the same model as a DataFrame transform without parser work:

    match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern="A B+ C",
        define={
            "A": lambda e: e["event_type"] == "click",
            "B": lambda e: e["event_type"] == "view",
            "C": lambda e: e["event_type"] == "purchase",
        },
        measures={
            "first_a": ("A", "first", "event_id"),
            "n_b": ("B", "count", None),
            "last_c": ("C", "last", "event_id"),
        },
        within=3600,
        after_match="skip_past_last",   # SKIP PAST LAST ROW (SQL default)
        output_schema="user_id long, first_a long, n_b long, last_c long",
    )

Pattern grammar: variables separated by spaces; quantifiers `?` (optional),
`+` (one-or-more, bounded), `{m}` / `{m,n}`. Contiguity between variables is
strict (MATCH_RECOGNIZE rows are consecutive within the partition).
"""

from __future__ import annotations

import ast
import inspect
import re
from collections.abc import Callable

from pyspark.sql import DataFrame

from flink_ci_flink_spark.operators.grouped import sort_exprs
from flink_ci_flink_spark.cep.operator import (
    cep,
    cep_stream,
    cep_stream_replay,
    measure_select,
)
from flink_ci_flink_spark.cep.pattern import (
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    Pattern,
)

_TOKEN = re.compile(r"^(\w+)(\?|\+|\*|\{(\d+)(,(\d+))?\})?$")


def _is_iterative(fn: Callable) -> bool:
    """Callables taking (event, ctx) are IterativeConditions."""
    try:
        return len(inspect.signature(fn).parameters) >= 2
    except (TypeError, ValueError):
        return False


def compile_pattern(
    pattern: str,
    define: dict[str, Callable[[dict], bool]],
    within: float | None = None,
    after_match: str = SKIP_PAST_LAST,
    max_repeat: int = 16,
    define_expr: dict[str, str] | None = None,
) -> Pattern:
    """Compile a MATCH_RECOGNIZE pattern string into a Pattern.

    ``define_expr`` optionally maps variables to equivalent Spark SQL
    boolean expressions — with every variable expr'd, fixed patterns take
    the compiled lead() plan and variable ones still get JVM-side predicate
    evaluation (cep/compiled.py, cep/operator.py).

    ``define`` callables taking two arguments ``(event, ctx)`` are treated
    as iterative conditions (`IterativeCondition.java` parity) and attached
    via `Pattern.where_iterative` — ctx is a `cep.nfa.MatchContext`."""
    define_expr = define_expr or {}
    p: Pattern | None = None
    for tok in pattern.split():
        m = _TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad pattern token {tok!r}")
        name, quant = m.group(1), m.group(2)
        pred = define.get(name)
        expr = define_expr.get(name)
        ctx_pred = None
        if pred is not None and _is_iterative(pred):
            pred, ctx_pred = None, pred
        if p is None:
            p = Pattern.begin(name, pred, expr=expr)
        else:
            p = p.next(name, pred, expr=expr)
        if ctx_pred is not None:
            p = p.where_iterative(ctx_pred)
        # MATCH_RECOGNIZE rows are consecutive within the partition, so
        # quantified variables repeat strictly (consecutive) — unlike the
        # Pattern API, where loop repeats default to relaxed contiguity.
        if quant == "?":
            p = p.optional_()
        elif quant == "+":
            p = p.times(1, max_repeat).consecutive_()
        elif quant == "*":
            p = p.times(1, max_repeat).optional_().consecutive_()
        elif quant and quant.startswith("{"):
            lo = int(m.group(3))
            hi = int(m.group(5)) if m.group(5) else lo
            p = p.times(lo, hi).consecutive_()
    assert p is not None, "empty pattern"
    if within is not None:
        p = p.within(within)
    return p.after_match_skip(after_match)


#: single measure-evaluation implementation lives in operator.measure_select
_measure_select = measure_select


def match_recognize(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    pattern: str,
    define: dict[str, Callable[[dict], bool]],
    measures: dict[str, tuple],
    output_schema: str,
    within: float | None = None,
    after_match: str = SKIP_PAST_LAST,
    streaming: bool = False,
    delay_seconds: float = 0.0,
    define_expr: dict[str, str] | None = None,
    rows_per_match: str = "one",
) -> DataFrame:
    """One row per match (default), with MEASURES computed per pattern
    variable; ``rows_per_match="all"`` emits ALL ROWS PER MATCH (payload +
    per-row CLASSIFIER + match_seq + RUNNING measures — beyond reference
    parity: `StreamExecMatch.scala:192` throws on this mode).

    Pass ``define_expr`` (variable -> Spark SQL boolean expr) to unlock the
    compiled lead() plan for fixed-length patterns and JVM predicate
    pushdown otherwise."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    pat = compile_pattern(pattern, define, within, after_match, define_expr=define_expr)
    if rows_per_match == "all":
        if streaming:
            raise NotImplementedError(
                "ALL ROWS PER MATCH is batch-only (the streaming operator "
                "emits one row per closed match)"
            )
        from flink_ci_flink_spark.cep.compiled import try_compile_all_rows
        from flink_ci_flink_spark.cep.operator import all_rows_select

        payload = [
            c for c in df.columns if c not in keys and not c.startswith("__")
        ]
        compiled = try_compile_all_rows(
            df, pat, keys, order_by, measures, payload, output_schema
        )
        if compiled is not None:
            return compiled
        flat = all_rows_select(measures, keys, payload)
        return cep(
            df, pat, keys, order_by, None, output_schema, flat_select=flat
        )
    select = _measure_select(measures, keys)
    if streaming:
        return cep_stream(
            df, pat, keys, order_by, select, output_schema, delay_seconds
        )
    if all(st.expr is not None for st in pat.stages):
        return cep(df, pat, keys, order_by, select, output_schema, measures=measures)
    return cep(df, pat, keys, order_by, select, output_schema)


# ---------------------------------------------------------------------------
# SQL-text front end: parse a `... FROM t MATCH_RECOGNIZE (...)` statement
# into the DataFrame transform above (reference: Flink's MATCH_RECOGNIZE SQL
# clause, `StreamExecMatch.scala:68`; Calcite does the parse there).
# ---------------------------------------------------------------------------

_SECTION_RE = re.compile(
    r"\b(PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW\s+PER\s+MATCH|"
    r"ALL\s+ROWS\s+PER\s+MATCH|AFTER\s+MATCH|PATTERN|WITHIN|DEFINE)\b",
    re.I,
)
_MEASURE_RE = re.compile(
    r"^(?:(FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(\w+)\.(\w+|\*)\s*\)|(\w+)\.(\w+))"
    r"\s+AS\s+(\w+)$",
    re.I | re.S,
)
_INTERVAL_RE = re.compile(r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?", re.I)
_INTERVAL_UNITS = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0}
_SKIP_MAP = {
    "SKIP PAST LAST ROW": (SKIP_PAST_LAST, None),
    "SKIP TO NEXT ROW": (NO_SKIP, None),
}


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


# -- DEFINE navigation / aggregate support ----------------------------------
# Reference: MATCH_RECOGNIZE DEFINE may navigate (`PREV`/`NEXT` physical over
# the partition, `FIRST`/`LAST` logical over the match) and aggregate over a
# variable's rows so far; the reference evaluates these via IterativeCondition
# on its NFA (`Pattern.java:156` where(IterativeCondition),
# `StreamExecMatch.scala:68`, runtime `flink-table-runtime-blink/.../
# operators/match/`). Spark-first split:
#   - PREV/NEXT are exactly lag()/lead() — rewritten to precomputed JVM
#     window columns, keeping the define row-local (and the fully-compiled
#     lead() plan reachable for fixed-length patterns);
#   - FIRST/LAST/aggregates depend on the in-flight match attempt, so they
#     compile to a sandboxed Python predicate over `cep.nfa.MatchContext`
#     and run on the NFA path (the reference's own mechanism).

_NAV_FN = re.compile(
    r"\b(PREV|NEXT|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*(?:,\s*(\d+))?\s*\)", re.I
)
_AGG_FN = re.compile(r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\(\s*(\w+)\.(\w+|\*)\s*\)", re.I)
_LOGICAL_FN = re.compile(r"\b(FIRST|LAST|SUM|COUNT|AVG|MIN|MAX)\s*\(", re.I)
_PHYSICAL_FN = re.compile(r"\b(PREV|NEXT)\s*\(", re.I)
_UNSUPPORTED_SQL = re.compile(
    r"\b(CASE|WHEN|BETWEEN|IN|LIKE|EXISTS|SELECT|CAST)\b", re.I
)


def _rewrite_physical_nav(expr: str, nav_specs: list[tuple]) -> str:
    """Replace PREV/NEXT(V.col[, n]) with a generated lag/lead column name
    (physical navigation ignores the variable qualifier — it offsets over
    the input partition). Appends (colname, lag|lead, src, n) to nav_specs."""

    def repl(m):
        fn, col = m.group(1).upper(), m.group(3)
        n = int(m.group(4)) if m.group(4) else 1
        kind = "lag" if fn == "PREV" else "lead"
        name = f"__nav_{kind}{n}_{col}"
        spec = (name, kind, col, n)
        if spec not in nav_specs:
            nav_specs.append(spec)
        return name

    return _NAV_FN.sub(
        lambda m: repl(m) if m.group(1).upper() in ("PREV", "NEXT") else m.group(0),
        expr,
    )


def _translate_ctx_define(cur_var: str, expr: str, variables: list[str]) -> Callable:
    """Compile a DEFINE expression with logical navigation / aggregates into
    a ``(row, ctx) -> bool`` predicate over `cep.nfa.MatchContext`.

    Supported grammar: comparisons and arithmetic over column refs
    (``V.col`` / bare ``col``), literals, AND/OR/NOT, IS [NOT] NULL, and
    PREV/NEXT/FIRST/LAST/SUM/COUNT/AVG/MIN/MAX calls. The translated Python
    expression is AST-validated against a strict whitelist (names ``row`` /
    ``ctx``, MatchContext method calls only) before compilation — nothing
    outside those two locals is reachable. SQL three-valued logic: any NULL
    (None) in a comparison makes the predicate false."""
    if _UNSUPPORTED_SQL.search(expr):
        raise NotImplementedError(
            f"unsupported SQL construct in DEFINE: {expr!r}"
        )
    placeholders: dict[str, str] = {}

    def stash(snippet: str) -> str:
        key = f"__PH{len(placeholders)}X"
        placeholders[key] = snippet
        return key

    s = expr
    # protect string literals first (SQL single-quoted == Python)
    s = re.sub(r"'[^']*'", lambda m: stash(m.group(0)), s)

    def nav_repl(m):
        fn, var, col = m.group(1).upper(), m.group(2), m.group(3)
        n = int(m.group(4)) if m.group(4) else (1 if fn in ("PREV", "NEXT") else 0)
        if fn == "PREV":
            return stash(f"ctx.prev_val({col!r}, {n})")
        if fn == "NEXT":
            return stash(f"ctx.next_val({col!r}, {n})")
        if fn == "FIRST":
            return stash(f"ctx.first({var!r}, {col!r}, {n})")
        return stash(f"ctx.last({var!r}, {col!r}, {n})")

    s = _NAV_FN.sub(nav_repl, s)

    def agg_repl(m):
        fn, var, col = m.group(1).lower(), m.group(2), m.group(3)
        if fn == "count":
            return stash(f"ctx.agg('count', {var!r})")
        if col == "*":
            raise ValueError(f"{fn.upper()}(V.*) is only valid for COUNT")
        return stash(f"ctx.agg({fn!r}, {var!r}, {col!r})")

    s = _AGG_FN.sub(agg_repl, s)

    s = s.replace("<>", "!=")
    s = re.sub(r"(?<![<>=!])=(?!=)", "==", s)
    s = re.sub(r"\bIS\s+NOT\s+NULL\b", " is not None", s, flags=re.I)
    s = re.sub(r"\bIS\s+NULL\b", " is None", s, flags=re.I)
    s = re.sub(r"\bAND\b", " and ", s, flags=re.I)
    s = re.sub(r"\bOR\b", " or ", s, flags=re.I)
    s = re.sub(r"\bNOT\b", " not ", s, flags=re.I)
    s = re.sub(r"\bTRUE\b", "True", s, flags=re.I)
    s = re.sub(r"\bFALSE\b", "False", s, flags=re.I)
    s = re.sub(r"\bNULL\b", "None", s, flags=re.I)

    def qual_repl(m):
        var, col = m.group(1), m.group(2)
        if var == cur_var:
            return stash(f"row[{col!r}]")
        if var in variables:
            # SQL: a bare other-variable reference in DEFINE means the LAST
            # row mapped to that variable so far
            return stash(f"ctx.last({var!r}, {col!r})")
        raise ValueError(f"unknown pattern variable {var!r} in DEFINE: {expr!r}")

    s = re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", qual_repl, s)

    def bare_repl(m):
        tok = m.group(0)
        if tok.startswith("__PH") or tok in (
            "and", "or", "not", "is", "None", "True", "False",
        ):
            return tok
        return stash(f"row[{tok!r}]")

    s = re.sub(r"\b[A-Za-z_]\w*\b", bare_repl, s)
    for key, snippet in placeholders.items():
        s = s.replace(key, snippet)

    tree = ast.parse(s, mode="eval")
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in ("row", "ctx"):
            raise ValueError(f"disallowed name {node.id!r} in DEFINE: {expr!r}")
        if isinstance(node, ast.Attribute) and node.attr not in (
            "prev_val", "next_val", "first", "last", "agg",
        ):
            raise ValueError(f"disallowed attribute {node.attr!r} in DEFINE")
        if isinstance(node, ast.Call) and not isinstance(node.func, ast.Attribute):
            raise ValueError("only MatchContext method calls allowed in DEFINE")

    code = compile(tree, "<match_recognize-define>", "eval")

    def pred(row, ctx, _code=code):
        try:
            v = eval(_code, {"__builtins__": {}}, {"row": row, "ctx": ctx})
        except TypeError:
            return False  # NULL in comparison/arithmetic -> unknown -> false
        return bool(v) if v is not None else False

    return pred


def parse_match_recognize_sql(sql: str) -> dict:
    """Parse the supported MATCH_RECOGNIZE grammar into plain pieces.

    Supported (the reference's common surface): PARTITION BY cols, ORDER BY
    the ascending time attribute plus secondary tie-break columns in either
    direction (`StreamExecMatch.scala:68` sort spec), MEASURES with
    FIRST/LAST/COUNT/SUM/AVG/MIN/MAX(V.f | V.*), bare V.f (= FIRST), and
    CLASSIFIER() / FIRST|LAST(CLASSIFIER()), ONE ROW PER MATCH, ALL ROWS
    PER MATCH (batch; payload + per-row CLASSIFIER + match_seq + RUNNING
    measures — beyond reference parity, `StreamExecMatch.scala:192` throws
    on it), AFTER MATCH
    SKIP {PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] V}, PATTERN with
    ? + * {m}/{m,n} quantifiers, WITHIN INTERVAL 'n' unit, DEFINE with
    row-local predicates, PREV/NEXT physical navigation (compiled to
    lag/lead columns), FIRST/LAST logical navigation, running aggregates
    (SUM/COUNT/AVG/MIN/MAX over a variable), and cross-variable references
    (bare ``A.f`` in B's DEFINE = LAST(A.f), per SQL).
    Not supported (loud errors): ALL ROWS PER MATCH on streams,
    CASE/BETWEEN/IN/LIKE/subqueries inside navigated DEFINEs, NEXT physical
    navigation in the STREAMING operator (future-dependent — a lead()
    reference can point past the frontier; PREV streams fine via the
    `cep_stream_replay` foreachBatch re-plan, and logical navigation and
    aggregates stream on the NFA state operator)."""
    m = re.search(r"MATCH_RECOGNIZE\s*\(", sql, re.I)
    if not m:
        raise ValueError("no MATCH_RECOGNIZE clause found")
    start, depth, i = m.end(), 1, m.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError("unbalanced parentheses in MATCH_RECOGNIZE clause")
    body = sql[start : i - 1]
    tbl = re.search(r"\bFROM\s+(\w+)\s+MATCH_RECOGNIZE", sql, re.I)

    pieces = _SECTION_RE.split(body)
    sections: dict[str, str] = {}
    for hdr, content in zip(pieces[1::2], pieces[2::2]):
        sections[re.sub(r"\s+", " ", hdr.upper())] = content.strip()
    rows_per_match = "all" if "ALL ROWS PER MATCH" in sections else "one"
    for required in ("PARTITION BY", "ORDER BY", "MEASURES", "PATTERN", "DEFINE"):
        if required not in sections:
            raise ValueError(f"MATCH_RECOGNIZE clause missing {required}")

    # ORDER BY: time attribute first (MUST be ascending — the reference's
    # sort spec requires the leading field to be the ascending time
    # attribute, `StreamExecMatch.scala:68`), then optional secondary
    # tie-break columns in either direction; a DESC secondary is encoded
    # as the "col DESC" spec the operator layer's `order_spec` convention
    # understands (threads into the compiled lead()/row_number() windows,
    # grouped_apply's partition sort, and the streaming buffer sort).
    order_parts = [c.strip() for c in sections["ORDER BY"].split(",") if c.strip()]
    order_cols: list[str] = []
    for pos, part in enumerate(order_parts):
        is_desc = bool(re.search(r"\s+DESC\s*$", part, re.I))
        if is_desc and pos == 0:
            raise NotImplementedError(
                "MATCH_RECOGNIZE ORDER BY: the leading column is the time "
                "attribute and must be ascending (secondary columns may be "
                "DESC)"
            )
        name = re.sub(r"\s+(ASC|DESC)\s*$", "", part, flags=re.I).strip()
        order_cols.append(f"{name} DESC" if is_desc else name)
    if not order_cols:
        raise ValueError("MATCH_RECOGNIZE ORDER BY lists no columns")
    order_by: str | list[str] = (
        order_cols if len(order_cols) > 1 else order_cols[0]
    )

    measures: dict[str, tuple] = {}
    for part in _split_top_level(sections["MEASURES"]):
        mc = re.match(
            r"^(?:(FIRST|LAST)\s*\(\s*CLASSIFIER\s*\(\s*\)\s*\)|CLASSIFIER\s*\(\s*\))"
            r"\s+AS\s+(\w+)$",
            part,
            re.I,
        )
        if mc:
            kind = (
                "classifier_first"
                if (mc.group(1) or "").upper() == "FIRST"
                else "classifier"
            )
            measures[mc.group(2)] = ("*", kind, None)
            continue
        mm = _MEASURE_RE.match(part)
        if not mm:
            raise ValueError(f"unsupported measure: {part!r}")
        if mm.group(1):
            kind, var, field = mm.group(1).lower(), mm.group(2), mm.group(3)
            if field == "*" and kind != "count":
                # Only COUNT(V.*) is meaningful; SUM(V.*) etc. would later
                # surface as a bare KeyError during schema inference.
                raise ValueError(
                    f"unsupported measure: {part!r} — '*' is only valid in "
                    "COUNT(var.*)"
                )
            field = None if field == "*" else field
            if kind == "count" and field is not None:
                field = None  # COUNT(V.f) counts matched rows, same as V.*
        else:
            kind, var, field = "first", mm.group(4), mm.group(5)
        measures[mm.group(6)] = (var, kind, field)

    after_match, skip_stage = SKIP_PAST_LAST, None  # SQL default
    if "AFTER MATCH" in sections:
        text = re.sub(r"\s+", " ", sections["AFTER MATCH"].upper()).strip()
        if text in _SKIP_MAP:
            after_match, skip_stage = _SKIP_MAP[text]
        else:
            ms = re.match(r"SKIP TO (FIRST|LAST) (\w+)$", text)
            if not ms:
                raise ValueError(f"unsupported AFTER MATCH: {text!r}")
            after_match = SKIP_TO_FIRST if ms.group(1) == "FIRST" else SKIP_TO_LAST
            # variable case matters; recover it from the raw text
            skip_stage = sections["AFTER MATCH"].split()[-1]

    pattern = sections["PATTERN"].strip()
    if not (pattern.startswith("(") and pattern.endswith(")")):
        raise ValueError("PATTERN must be parenthesized")
    pattern = pattern[1:-1].strip()

    within = None
    if "WITHIN" in sections:
        mi = _INTERVAL_RE.search(sections["WITHIN"])
        if not mi:
            raise ValueError(f"unsupported WITHIN: {sections['WITHIN']!r}")
        within = int(mi.group(1)) * _INTERVAL_UNITS[mi.group(2).lower()]

    variables = [re.match(r"\w+", tok).group(0) for tok in pattern.split()]
    define_expr: dict[str, str] = {}
    define_ctx: dict[str, Callable] = {}
    nav_specs: list[tuple] = []
    for part in _split_top_level(sections["DEFINE"]):
        md = re.match(r"^(\w+)\s+AS\s+(.*)$", part, re.I | re.S)
        if not md:
            raise ValueError(f"unsupported DEFINE entry: {part!r}")
        var, expr = md.group(1), md.group(2).strip()
        # route: logical navigation / aggregates / cross-variable references
        # need the in-flight match -> ctx predicate on the NFA; PREV/NEXT
        # alone are physical -> lag/lead column rewrite, stays row-local/JVM
        stripped_calls = _NAV_FN.sub(" ", _AGG_FN.sub(" ", expr))
        other_var_ref = any(
            re.search(rf"\b{v}\.", stripped_calls) for v in variables if v != var
        )
        if _LOGICAL_FN.search(expr) or other_var_ref:
            define_ctx[var] = _translate_ctx_define(var, expr, variables)
            define_expr[var] = None
            continue
        if _PHYSICAL_FN.search(expr):
            expr = _rewrite_physical_nav(expr, nav_specs)
        # strip remaining (own-variable) qualifiers — the predicate is now
        # row-local; all qualifiers see the current row's columns
        for v in variables:
            expr = re.sub(rf"\b{v}\.", "", expr)
        define_expr[var] = expr
    for v in variables:
        # a pattern variable with no DEFINE entry matches any row (SQL spec)
        define_expr.setdefault(v, None if v in define_ctx else "true")

    return {
        "table": tbl.group(1) if tbl else None,
        "partition_by": [c.strip() for c in sections["PARTITION BY"].split(",")],
        "order_by": order_by,
        "measures": measures,
        "after_match": after_match,
        "skip_stage": skip_stage,
        "pattern": pattern,
        "within": within,
        "define_expr": define_expr,
        "define_ctx": define_ctx,
        "nav_specs": nav_specs,
        "rows_per_match": rows_per_match,
    }


def match_recognize_sql(
    source,
    sql: str,
    streaming: bool = False,
    delay_seconds: float = 0.0,
    max_repeat: int = 64,
) -> DataFrame:
    """Run a MATCH_RECOGNIZE SQL statement as a DataFrame transform.

    ``source`` is the input DataFrame, or a SparkSession (the FROM table is
    then resolved via ``spark.table``). Output schema is inferred: partition
    columns keep their input types; FIRST/LAST measures take the field's
    type; COUNT is bigint; SUM widens integers to bigint, floats to double.

    Every DEFINE predicate is a SQL expression, so fixed-length strict
    patterns compile to the pure lead() window plan and variable-length ones
    get JVM-side predicate evaluation (`cep/compiled.py`, `cep/operator.py`)
    — the SQL front end never falls back to Python predicates."""
    parsed = parse_match_recognize_sql(sql)
    if isinstance(source, DataFrame):
        df = source
    else:
        if parsed["table"] is None:
            raise ValueError("no FROM table in statement and no DataFrame given")
        df = source.table(parsed["table"])

    keys = parsed["partition_by"]
    streaming_nav = False
    if parsed["nav_specs"]:
        # PREV/NEXT physical navigation == lag()/lead() over the partition —
        # precomputed JVM-side so the DEFINE stays row-local (and fixed
        # patterns keep the fully-compiled lead() plan)
        if streaming:
            # PREV works on streams via the foreachBatch re-plan wrapper
            # (cep_stream_replay: nav lag columns recomputed over the
            # whole buffered suffix each micro-batch, so navigation
            # reaches across batch boundaries). NEXT stays rejected: a
            # lead() reference is future-dependent — the frontier rule
            # cannot make a match final while its nav target may not have
            # arrived.
            if any(kind == "lead" for _c, kind, _s, _n in parsed["nav_specs"]):
                raise NotImplementedError(
                    "NEXT navigation in streaming MATCH_RECOGNIZE is "
                    "future-dependent and not supported; PREV is"
                )
            # buffer pruning keeps only extra_tail_rows rows below the
            # frontier as lag context; a retained tail row recomputes its
            # PREV over the PRUNED buffer, so a real PREV value can become
            # NULL mid-stream. NULL-rejecting comparisons (<, >, =, <=,
            # >=, <>) are immune — the spurious NULL makes the predicate
            # false, same as a prune that dropped the row. 'IS NULL' or a
            # negated predicate over a nav column would spuriously MATCH
            # at the prune boundary, diverging from the one-shot batch
            # answer — reject loudly instead of answering wrong.
            nav_cols = [c for c, _k, _s, _n in parsed["nav_specs"]]
            for _var, dexpr in parsed["define_expr"].items():
                if not dexpr:
                    continue
                for c in nav_cols:
                    if re.search(rf"\b{c}\s+IS\s+NULL\b", dexpr, re.I) or re.search(
                        rf"\bNOT\s*\([^)]*\b{c}\b", dexpr, re.I
                    ):
                        raise NotImplementedError(
                            "streaming MATCH_RECOGNIZE DEFINE predicates "
                            "must be NULL-rejecting on PREV references: "
                            "'IS NULL' / NOT(...) over a navigation value "
                            "can spuriously match at the buffer-prune "
                            f"boundary (predicate: {dexpr!r})"
                        )
            streaming_nav = True
        else:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            _ob = parsed["order_by"]
            _ob = [_ob] if isinstance(_ob, str) else list(_ob)
            w = Window.partitionBy(*keys).orderBy(*sort_exprs(_ob))
            for colname, kind, src, n in parsed["nav_specs"]:
                fn = F.lag if kind == "lag" else F.lead
                df = df.withColumn(colname, fn(src, n).over(w))
    # logical navigation / aggregates run fine on the streaming NFA: the
    # state payload preserves value types (operator._jsonable), and ctx
    # predicates evaluate over the buffered, ordered per-key events

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    int_types = {"tinyint", "smallint", "int", "bigint"}
    cols = []
    for c in keys:
        cols.append(f"{c} {types[c]}")
    payload_cols = [
        c for c in df.columns if c not in keys and not c.startswith("__")
    ]
    if parsed["rows_per_match"] == "all":
        # ALL ROWS: payload columns + implicit per-row CLASSIFIER and
        # MATCH_NUMBER precede the (RUNNING-semantics) measures
        for c in payload_cols:
            cols.append(f"{c} {types[c]}")
        cols.append("classifier string")
        cols.append("match_seq bigint")
    for out_name, (var, kind, field) in parsed["measures"].items():
        if kind in ("classifier", "classifier_first"):
            t = "string"
        elif kind == "count":
            t = "bigint"
        elif kind == "sum":
            t = "bigint" if types[field] in int_types else "double"
        elif kind == "avg":
            t = "double"
        else:
            t = types[field]
        cols.append(f"{out_name} {t}")
    output_schema = ", ".join(cols)

    pat = compile_pattern(
        parsed["pattern"],
        define=parsed["define_ctx"],
        within=parsed["within"],
        after_match=parsed["after_match"],
        max_repeat=max_repeat,
        define_expr=parsed["define_expr"],
    )
    if parsed["skip_stage"] is not None:
        pat = pat.after_match_skip(parsed["after_match"], parsed["skip_stage"])
    if parsed["rows_per_match"] == "all":
        if streaming:
            raise NotImplementedError(
                "ALL ROWS PER MATCH is batch-only (the streaming operator "
                "emits one row per closed match)"
            )
        from flink_ci_flink_spark.cep.compiled import try_compile_all_rows
        from flink_ci_flink_spark.cep.operator import all_rows_select

        compiled = try_compile_all_rows(
            df, pat, keys, parsed["order_by"], parsed["measures"],
            payload_cols, output_schema,
        )
        if compiled is not None:
            return compiled
        flat = all_rows_select(parsed["measures"], keys, payload_cols)
        return cep(
            df, pat, keys, parsed["order_by"], None, output_schema,
            flat_select=flat,
        )
    select = _measure_select(parsed["measures"], keys)
    if streaming:
        if streaming_nav:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            def prepare(bdf: DataFrame) -> DataFrame:
                _ob = parsed["order_by"]
                _ob = [_ob] if isinstance(_ob, str) else list(_ob)
                w = Window.partitionBy(*keys).orderBy(*sort_exprs(_ob))
                out = bdf
                for colname, kind, src, n in parsed["nav_specs"]:
                    fn = F.lag if kind == "lag" else F.lead
                    out = out.withColumn(colname, fn(src, n).over(w))
                return out

            return cep_stream_replay(
                df,
                pat,
                keys,
                parsed["order_by"],
                select,
                output_schema,
                measures=parsed["measures"],
                delay_seconds=delay_seconds,
                prepare=prepare,
                extra_tail_rows=max(
                    n for _c, _k, _s, n in parsed["nav_specs"]
                ),
            )
        return cep_stream(
            df, pat, keys, parsed["order_by"], select, output_schema, delay_seconds
        )
    return cep(
        df, pat, keys, parsed["order_by"], select, output_schema,
        measures=parsed["measures"],
    )
