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

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

from flink_ci_flink_spark.cep.operator import cep, cep_stream
from flink_ci_flink_spark.cep.pattern import (
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    Pattern,
)

_TOKEN = re.compile(r"^(\w+)(\?|\+|\*|\{(\d+)(,(\d+))?\})?$")

#: measure kinds: (variable, kind, field) — kind in first/last/count/sum_field
_MEASURE_FNS = {
    "first": lambda events, idxs, field: events[idxs[0]][field],
    "last": lambda events, idxs, field: events[idxs[-1]][field],
    "count": lambda events, idxs, field: len(idxs),
    "sum": lambda events, idxs, field: sum(events[i][field] for i in idxs),
}


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
    evaluation (cep/compiled.py, cep/operator.py)."""
    define_expr = define_expr or {}
    p: Pattern | None = None
    for tok in pattern.split():
        m = _TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad pattern token {tok!r}")
        name, quant = m.group(1), m.group(2)
        pred = define.get(name)
        expr = define_expr.get(name)
        if p is None:
            p = Pattern.begin(name, pred, expr=expr)
        else:
            p = p.next(name, pred, expr=expr)
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


def _measure_select(measures: dict[str, tuple], keys: list[str]):
    def select(key_tuple, match, events):
        out = {k: key_tuple[i] for i, k in enumerate(keys)}
        for out_name, (var, kind, field) in measures.items():
            idxs = match.groups.get(var, [])
            out[out_name] = _MEASURE_FNS[kind](events, idxs, field) if idxs else None
        return out

    return select


def match_recognize(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str,
    pattern: str,
    define: dict[str, Callable[[dict], bool]],
    measures: dict[str, tuple],
    output_schema: str,
    within: float | None = None,
    after_match: str = SKIP_PAST_LAST,
    streaming: bool = False,
    delay_seconds: float = 0.0,
    define_expr: dict[str, str] | None = None,
) -> DataFrame:
    """One row per match, with MEASURES computed per pattern variable.

    Pass ``define_expr`` (variable -> Spark SQL boolean expr) to unlock the
    compiled lead() plan for fixed-length patterns and JVM predicate
    pushdown otherwise."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    pat = compile_pattern(pattern, define, within, after_match, define_expr=define_expr)
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
    r"^(?:(FIRST|LAST|COUNT|SUM)\s*\(\s*(\w+)\.(\w+|\*)\s*\)|(\w+)\.(\w+))\s+AS\s+(\w+)$",
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


def parse_match_recognize_sql(sql: str) -> dict:
    """Parse the supported MATCH_RECOGNIZE grammar into plain pieces.

    Supported (the reference's common surface): PARTITION BY cols, ORDER BY
    one ascending column, MEASURES with FIRST/LAST/COUNT/SUM(V.f | V.*) or
    bare V.f (= FIRST), ONE ROW PER MATCH, AFTER MATCH SKIP {PAST LAST ROW |
    TO NEXT ROW | TO [FIRST|LAST] V}, PATTERN with ? + * {m}/{m,n}
    quantifiers, WITHIN INTERVAL 'n' unit, DEFINE V AS <row-local SQL bool>.
    Not supported (loud errors): ALL ROWS PER MATCH, CLASSIFIER(),
    aggregate-referencing DEFINE (LAST(B.x) etc.)."""
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
    if "ALL ROWS PER MATCH" in sections:
        raise NotImplementedError("ALL ROWS PER MATCH is not supported (ONE ROW PER MATCH only)")
    for required in ("PARTITION BY", "ORDER BY", "MEASURES", "PATTERN", "DEFINE"):
        if required not in sections:
            raise ValueError(f"MATCH_RECOGNIZE clause missing {required}")

    order_by = sections["ORDER BY"].strip()
    if "," in order_by or re.search(r"\bDESC\b", order_by, re.I):
        raise NotImplementedError("ORDER BY supports a single ascending column")

    measures: dict[str, tuple] = {}
    for part in _split_top_level(sections["MEASURES"]):
        if re.search(r"CLASSIFIER\s*\(", part, re.I):
            raise NotImplementedError("CLASSIFIER() measures are not supported")
        mm = _MEASURE_RE.match(part)
        if not mm:
            raise ValueError(f"unsupported measure: {part!r}")
        if mm.group(1):
            kind, var, field = mm.group(1).lower(), mm.group(2), mm.group(3)
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
    for part in _split_top_level(sections["DEFINE"]):
        md = re.match(r"^(\w+)\s+AS\s+(.*)$", part, re.I | re.S)
        if not md:
            raise ValueError(f"unsupported DEFINE entry: {part!r}")
        var, expr = md.group(1), md.group(2).strip()
        if re.search(r"\b(FIRST|LAST|PREV|NEXT)\s*\(", expr, re.I):
            raise NotImplementedError("DEFINE with navigation/aggregates is not supported (row-local predicates only)")
        # strip `V.` qualifiers — predicates are row-local, all variables
        # see the same row's columns
        for v in variables:
            expr = re.sub(rf"\b{v}\.", "", expr)
        define_expr[var] = expr
    for v in variables:
        # a pattern variable with no DEFINE entry matches any row (SQL spec)
        define_expr.setdefault(v, "true")

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
    }


def match_recognize_sql(
    source,
    sql: str,
    streaming: bool = False,
    delay_seconds: float = 0.0,
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

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    int_types = {"tinyint", "smallint", "int", "bigint"}
    cols = []
    for c in parsed["partition_by"]:
        cols.append(f"{c} {types[c]}")
    for out_name, (var, kind, field) in parsed["measures"].items():
        if kind == "count":
            t = "bigint"
        elif kind == "sum":
            t = "bigint" if types[field] in int_types else "double"
        else:
            t = types[field]
        cols.append(f"{out_name} {t}")
    output_schema = ", ".join(cols)

    pat = compile_pattern(
        parsed["pattern"],
        define={},
        within=parsed["within"],
        after_match=parsed["after_match"],
        define_expr=parsed["define_expr"],
    )
    if parsed["skip_stage"] is not None:
        pat = pat.after_match_skip(parsed["after_match"], parsed["skip_stage"])
    keys = parsed["partition_by"]
    select = _measure_select(parsed["measures"], keys)
    if streaming:
        return cep_stream(
            df, pat, keys, parsed["order_by"], select, output_schema, delay_seconds
        )
    return cep(
        df, pat, keys, parsed["order_by"], select, output_schema,
        measures=parsed["measures"],
    )
