"""Scalar function surface: the reference's SQL builtin library on Spark.

Reference: `flink-table-common/.../functions/BuiltInFunctionDefinitions.java`
(portable set), `flink-table-planner-blink/.../functions/sql/
FlinkSqlOperatorTable.java` (Blink extras), runtime impls
`flink-table-runtime-blink/.../runtime/functions/SqlFunctionUtils.java`,
`SqlDateTimeUtils.java`.

Nearly the whole surface maps 1:1 onto `pyspark.sql.functions` (JVM-side,
codegen'd — listed in FLINK_TO_SPARK below as parity evidence). The handful
with no Spark builtin are implemented here as thin Column expressions (still
JVM-side — no Python UDFs) and registered as SQL functions by
`register_all(spark)`.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

#: Flink builtin -> Spark builtin (same semantics; aliases noted).
#: Functions implemented in this module are marked "custom:<name>".
FLINK_TO_SPARK = {
    # comparison / logic
    "=": "=", "<>": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<=",
    "AND": "and", "OR": "or", "NOT": "not",
    "IS NULL": "isNull", "IS NOT NULL": "isNotNull",
    "IS TRUE": "= true", "IS FALSE": "= false",
    "IS DISTINCT FROM": "is distinct from",
    "BETWEEN": "between", "IN": "isin", "LIKE": "like", "SIMILAR": "rlike",
    "IF": "when/otherwise", "CASE": "when", "COALESCE": "coalesce",
    "NULLIF": "nullif", "GREATEST": "greatest", "LEAST": "least",
    # string
    "CHAR_LENGTH": "length", "CHARACTER_LENGTH": "length",
    "INIT_CAP": "initcap", "UPPER": "upper", "LOWER": "lower",
    "SUBSTRING": "substring", "SUBSTR": "substr", "POSITION": "instr",
    "OVERLAY": "overlay", "CONCAT": "concat", "CONCAT_WS": "concat_ws",
    "LPAD": "lpad", "RPAD": "rpad", "LTRIM": "ltrim", "RTRIM": "rtrim",
    "TRIM": "trim", "REPEAT": "repeat", "REPLACE": "replace",
    "REGEXP": "rlike", "REGEXP_EXTRACT": "regexp_extract",
    "REGEXP_REPLACE": "regexp_replace",
    "FROM_BASE64": "unbase64", "TO_BASE64": "base64",
    "UUID": "uuid", "ASCII": "ascii", "CHR": "char",
    "DECODE": "decode", "ENCODE": "encode",
    "INSTR": "instr", "LEFT": "left", "RIGHT": "right", "LOCATE": "locate",
    "PARSE_URL": "parse_url", "REVERSE": "reverse",
    "SPLIT_INDEX": "custom:split_index",
    "STR_TO_MAP": "str_to_map",
    "IS_ALPHA": "custom:is_alpha", "IS_DECIMAL": "custom:is_decimal",
    "IS_DIGIT": "custom:is_digit",
    "MD5": "md5", "SHA1": "sha1", "SHA2": "sha2", "SHA224": "sha2(224)",
    "SHA256": "sha2(256)", "SHA384": "sha2(384)", "SHA512": "sha2(512)",
    "HASH_CODE": "custom:hash_code",
    # math
    "+": "+", "-": "-", "*": "*", "/": "/", "%": "pmod",
    "ABS": "abs", "CEIL": "ceil", "FLOOR": "floor", "EXP": "exp",
    "LN": "ln", "LOG": "log", "LOG2": "log2", "LOG10": "log10",
    "POWER": "power", "SQRT": "sqrt", "MOD": "mod",
    "SIN": "sin", "COS": "cos", "TAN": "tan", "COT": "cot",
    "ASIN": "asin", "ACOS": "acos", "ATAN": "atan", "ATAN2": "atan2",
    "SINH": "sinh", "COSH": "cosh", "TANH": "tanh",
    "DEGREES": "degrees", "RADIANS": "radians", "SIGN": "signum",
    "ROUND": "round", "PI": "lit(math.pi)", "E": "lit(math.e)",
    "RAND": "rand", "RAND_INTEGER": "floor(rand()*n)",
    "BIN": "bin", "HEX": "hex", "TRUNCATE": "custom:truncate",
    # temporal
    "EXTRACT": "extract", "CURRENT_DATE": "current_date",
    "CURRENT_TIME": "current_timestamp", "CURRENT_TIMESTAMP": "current_timestamp",
    "LOCALTIME": "localtimestamp", "LOCALTIMESTAMP": "localtimestamp",
    "NOW": "now", "TEMPORAL_OVERLAPS": "custom:temporal_overlaps",
    "TIMESTAMPDIFF": "timestampdiff", "DATE_FORMAT": "date_format",
    "CONVERT_TZ": "convert_timezone", "FROM_UNIXTIME": "from_unixtime",
    "UNIX_TIMESTAMP": "unix_timestamp", "TO_DATE": "to_date",
    "TO_TIMESTAMP": "to_timestamp", "QUARTER": "quarter",
    "FLOOR(ts TO unit)": "date_trunc", "CEIL(ts TO unit)": "custom:ceil_ts",
    # collections / constructors
    "ARRAY": "array", "MAP": "map", "ROW": "struct",
    "CARDINALITY": "size", "ELEMENT": "element_at(_, 1)", "AT": "element_at",
    "FLATTEN": "flatten", "GET": "getField",
    # casts
    "CAST": "cast", "REINTERPRET_CAST": "cast",
    # aggregate-adjacent scalar helpers (SUM0 = null-as-zero sum)
    "SUM0": "custom:sum0", "INCR_SUM": "custom:sum0",
    # SQL/JSON (Flink 1.15+; BuiltInFunctionDefinitions JSON_* entries,
    # runtime flink-table-runtime/.../functions/SqlJsonUtils.java)
    "JSON_VALUE": "get_json_object", "JSON_QUERY": "custom:json_query",
    "JSON_EXISTS": "custom:json_exists", "JSON_STRING": "custom:json_string",
    "JSON_OBJECT": "custom:json_object", "JSON_ARRAY": "custom:json_array",
    "JSON_OBJECTAGG": "custom:json_objectagg",
    "JSON_ARRAYAGG": "custom:json_arrayagg",
    "IS JSON": "custom:is_json",
}


def split_index(col, delim: str, idx: int) -> Column:
    """Flink SPLIT_INDEX(str, delim, idx) — 0-based; NULL when out of range.

    Ref: `SqlFunctionUtils.java` splitIndex. Spark: element_at over split
    (1-based, hence idx+1); literal delimiter is regex-escaped.
    """
    import re as _re

    parts = F.split(col, _re.escape(delim))
    return F.when(F.size(parts) > idx, F.element_at(parts, idx + 1))


def is_alpha(col) -> Column:
    """Flink IS_ALPHA: every char alphabetic, non-empty. Ref: SqlFunctionUtils.isAlpha."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")).rlike(
        r"\A[A-Za-z]+\Z"
    )


def is_digit(col) -> Column:
    """Flink IS_DIGIT: every char a digit, non-empty."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")).rlike(
        r"\A[0-9]+\Z"
    )


def is_decimal(col) -> Column:
    """Flink IS_DECIMAL: string parses as a decimal number."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit("")).rlike(r"\A[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)\Z")


def hash_code(col) -> Column:
    """Flink HASH_CODE(str) → 32-bit hash. Spark's murmur3 `hash` (different
    constants than the JVM String.hashCode the reference uses — documented
    divergence; stable within this engine)."""
    return F.hash(col)


def sum0(col) -> Column:
    """SUM0: sum that returns 0 (not NULL) on empty/all-null input.
    Ref: aggfunctions `Sum0AggFunction.java`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c), F.lit(0).cast("double"))


def truncate(col, scale: int = 0) -> Column:
    """Flink TRUNCATE(x, d): toward zero at d decimals (Spark has no builtin)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10.0**scale
    return (
        F.when(c >= 0, F.floor(c * factor) / factor).otherwise(F.ceil(c * factor) / factor)
    )


def temporal_overlaps(s1, e1, s2, e2) -> Column:
    """(s1,e1) OVERLAPS (s2,e2) — half-open interval intersection test."""
    return (s1 <= e2) & (s2 <= e1)


def ceil_ts(col, unit: str) -> Column:
    """CEIL(ts TO unit): round a timestamp up to the unit boundary."""
    c = F.col(col) if isinstance(col, str) else col
    floored = F.date_trunc(unit, c)
    return F.when(c == floored, c).otherwise(
        floored + F.expr(f"INTERVAL 1 {unit}")
    )


def epoch_seconds(df, col) -> Column:
    """Seconds-since-epoch (double, microsecond precision) for a timestamp
    column of EITHER flavor — TIMESTAMP or TIMESTAMP_NTZ.

    ``CAST(ts AS DOUBLE)`` is illegal for TIMESTAMP_NTZ (and parquet written
    with isAdjustedToUTC=false reads back as NTZ under Spark's default
    inferTimestampNTZ). For NTZ we diff from the NTZ epoch — timezone-free,
    matching DuckDB's ``EPOCH(naive_ts)`` exactly. Needs the DataFrame to
    inspect the column's type; pure JVM expression either way."""
    from pyspark.sql.types import TimestampNTZType

    name = col if isinstance(col, str) else None
    if name is not None and isinstance(df.schema[name].dataType, TimestampNTZType):
        return (
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{name}`)"
            ).cast("double")
            / F.lit(1e6)
        )
    c = F.col(name) if name is not None else col
    return c.cast("double")


# ---------------------------------------------------------------------------
# SQL/JSON function family (Flink 1.15+).
# Ref: BuiltInFunctionDefinitions JSON_VALUE/JSON_QUERY/JSON_EXISTS/
# JSON_STRING/JSON_OBJECT/JSON_ARRAY/JSON_OBJECTAGG/JSON_ARRAYAGG + IS JSON;
# runtime flink-table-runtime/.../functions/SqlJsonUtils.java. All pure JVM
# expressions (Jackson-backed to_json / get_json_object) — no Python UDFs.
# ---------------------------------------------------------------------------


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_value(col, path: str) -> Column:
    """JSON_VALUE(json, path): extract a SCALAR as its string value
    (unquoted — '"hi"' -> 'hi'), NULL when absent. Spark's get_json_object
    has exactly these semantics for scalar paths."""
    return F.get_json_object(_c(col), path)


def json_query(col, path: str) -> Column:
    """JSON_QUERY(json, path): extract an OBJECT/ARRAY subtree as JSON text.
    Spark's get_json_object returns the compact JSON of non-scalar matches;
    scalar matches come back unquoted (JSON_VALUE flavor) — use json_value
    for scalars, as Flink's WITHOUT ARRAY WRAPPER default returns NULL
    there anyway."""
    return F.get_json_object(_c(col), path)


def json_exists(col, path: str) -> Column:
    """JSON_EXISTS(json, path). Divergence note: a path whose value is JSON
    null reads as absent here (get_json_object returns NULL for both);
    Flink distinguishes them. FALSE (not NULL) on missing input, matching
    Flink's FALSE ON ERROR default."""
    return F.get_json_object(_c(col), path).isNotNull()


def json_string(col) -> Column:
    """JSON_STRING(any): serialize one value to JSON text (strings quoted
    and escaped, numerics bare). Spark's to_json refuses bare scalars, so
    wrap in a 1-element array and strip the brackets — escaping inside is
    identical."""
    arr = F.to_json(F.array(_c(col)))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def json_object(*pairs, on_null: str = "null") -> Column:
    """JSON_OBJECT('k1', v1, 'k2', v2, ...): construct a JSON object.
    ``on_null='null'`` (Flink/SQL-standard default NULL ON NULL) keeps null
    fields as JSON null; ``'absent'`` drops them (ABSENT ON NULL)."""
    cols = []
    for i, p in enumerate(pairs):
        cols.append(F.lit(p) if i % 2 == 0 else _c(p))
    return F.to_json(
        F.named_struct(*cols),
        {"ignoreNullFields": "true" if on_null == "absent" else "false"},
    )


def json_array(*cols, on_null: str = "absent") -> Column:
    """JSON_ARRAY(v1, v2, ...): construct a JSON array. Default ABSENT ON
    NULL (SQL standard / Flink): null elements are dropped; ``'null'``
    keeps them as JSON nulls."""
    arr = F.array(*[_c(c) for c in cols])
    if on_null == "absent":
        arr = F.filter(arr, lambda x: x.isNotNull())
    return F.to_json(arr, {"ignoreNullFields": "false"})


def json_objectagg(key, value) -> Column:
    """JSON_OBJECTAGG(KEY k VALUE v): aggregate rows into one JSON object.
    Key order is unspecified in Flink; here entries are SORTED BY KEY so the
    result is deterministic (and oracle-checkable) under any partitioning —
    the collect_list -> array_sort -> map_from_entries chain keeps
    everything JVM-side."""
    return F.to_json(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct(_c(key), _c(value)))))
    )


def json_arrayagg(col, *, sort: bool = True) -> Column:
    """JSON_ARRAYAGG(v): aggregate rows into one JSON array. Element order
    is unspecified in Flink; sorted here for cross-partitioning determinism
    (pass sort=False for arrival order in a single-partition stream)."""
    lst = F.collect_list(_c(col))
    return F.to_json(F.array_sort(lst) if sort else lst)


def is_json(col) -> Column:
    """value IS JSON: does the string parse as JSON? get_json_object('$')
    round-trips any valid document and returns NULL on malformed input."""
    return F.get_json_object(_c(col), "$").isNotNull()


def register_all(spark: SparkSession) -> None:
    """Expose the custom functions to SQL text via small expression rewrites.

    These register as SQL-callable names so `spark.sql` queries can use the
    Flink spellings. All remain JVM expressions (no Python execution).
    """
    dual = [
        ("split_index", "(str STRING, delim STRING, idx INT)",
         "CASE WHEN size(split(str, delim)) > idx THEN split(str, delim)[idx] END"),
        ("is_alpha", "(s STRING)", r"coalesce(s, '') rlike '\\A[A-Za-z]+\\Z'"),
        ("is_digit", "(s STRING)", r"coalesce(s, '') rlike '\\A[0-9]+\\Z'"),
        ("is_decimal", "(s STRING)",
         r"coalesce(s, '') rlike '\\A[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)\\Z'"),
        ("hash_code", "(s STRING)", "hash(s)"),
    ]
    for name, args, body in dual:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{args} RETURNS "
                  f"{'BOOLEAN' if name.startswith('is_') else ('INT' if name == 'hash_code' else 'STRING')} "
                  f"RETURN {body}")
