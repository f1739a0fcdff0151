"""Scalar-function coverage queries (SURVEY.md §2.9) with DuckDB oracles.

Each query exercises a function family over real tables. Where the two
engines' builtins differ in spelling or semantics, the oracle emulates the
reference semantics explicitly (noted inline):
- DuckDB CAST(double AS INT) rounds; the reference (and Spark) truncate →
  oracle uses TRUNC.
- DuckDB regexp_replace is first-match by default → 'g' flag.
- DuckDB dayofweek/dow is 0=Sunday; Spark's is 1=Sunday → +1 in oracle.
- sign(): DuckDB returns INT, Spark DOUBLE → cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.functions import is_alpha, is_decimal, is_digit, split_index, truncate
from flink_ci_flink_spark.queries.registry import query


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           LENGTH(p_name)                          AS name_len,
           UPPER(p_brand)                          AS brand_u,
           LOWER(p_type)                           AS type_l,
           SUBSTRING(p_name, 3, 5)                 AS name_sub,
           CONCAT_WS('|', p_brand, p_type)         AS brand_type,
           LPAD(p_brand, 12, '*')                  AS brand_lpad,
           RPAD(p_brand, 12, '#')                  AS brand_rpad,
           TRIM(CONCAT('  ', p_brand, ' '))        AS brand_trim,
           REPLACE(p_type, 'ANODIZED', 'AN.')      AS type_repl,
           REVERSE(p_brand)                        AS brand_rev,
           LEFT(p_name, 4)                         AS name_left,
           RIGHT(p_name, 4)                        AS name_right,
           REPEAT(p_brand, 2)                      AS brand_rep,
           ASCII(p_brand)                          AS brand_ascii,
           STRPOS(p_type, 'D')                     AS pos_d,
           CASE WHEN LEN(STRING_SPLIT(p_name, ' ')) > 1
                THEN STRING_SPLIT(p_name, ' ')[2] END AS name_word2,
           CASE WHEN LEN(STRING_SPLIT(p_type, ' ')) > 1
                THEN STRING_SPLIT(p_type, ' ')[2] END AS type_word2
    FROM part WHERE p_partkey % 7 = 0
    """,
    group="functions",
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String builtins. Ref: BuiltInFunctionDefinitions.java string section;
    runtime `SqlFunctionUtils.java`. SPLIT_INDEX is our custom op (0-based;
    oracle uses 1-based SPLIT_PART)."""
    t = load_tables(spark, sf_dir)
    p = t.part.filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 3, 5).alias("name_sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "#").alias("brand_rpad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.replace(F.col("p_type"), F.lit("ANODIZED"), F.lit("AN.")).alias("type_repl"),
        F.reverse("p_brand").alias("brand_rev"),
        F.left(F.col("p_name"), F.lit(4)).alias("name_left"),
        F.right(F.col("p_name"), F.lit(4)).alias("name_right"),
        F.repeat("p_brand", 2).alias("brand_rep"),
        F.ascii("p_brand").alias("brand_ascii"),
        F.instr("p_type", "D").alias("pos_d"),
        split_index(F.col("p_name"), " ", 1).alias("name_word2"),
        # out-of-range → NULL (reference SPLIT_INDEX semantics; p_type is
        # single-word in this corpus)
        split_index(F.col("p_type"), " ", 1).alias("type_word2"),
    )


@query(
    "fn_string_regex_predicates",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1)             AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g')        AS name_novowel,
           (p_type LIKE 'PROMO%')                             AS is_promo,
           REGEXP_MATCHES(p_type, '^[A-Z ]+$')                AS type_upper_only,
           REGEXP_MATCHES(p_brand, '^[A-Za-z]+$')             AS brand_alpha,
           REGEXP_MATCHES(CAST(p_size AS VARCHAR), '^[0-9]+$') AS size_digit,
           REGEXP_MATCHES(CAST(p_retailprice AS VARCHAR),
                          '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$') AS price_decimal
    FROM part WHERE p_partkey % 11 = 0
    """,
    group="functions",
)
def fn_string_regex_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + predicate functions incl. custom IS_ALPHA / IS_DIGIT / IS_DECIMAL.
    Ref: `SqlLikeUtils.java`, SqlFunctionUtils.isAlpha/isDigit/isDecimal."""
    t = load_tables(spark, sf_dir)
    p = t.part.filter(F.col("p_partkey") % 11 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_novowel"),
        F.col("p_type").like("PROMO%").alias("is_promo"),
        F.col("p_type").rlike(r"\A[A-Z ]+\Z").alias("type_upper_only"),
        is_alpha("p_brand").alias("brand_alpha"),
        is_digit(F.col("p_size").cast("string")).alias("size_digit"),
        is_decimal(F.col("p_retailprice").cast("string")).alias("price_decimal"),
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT n_nationkey,
           MD5(n_name)                       AS name_md5,
           SHA256(n_name)                    AS name_sha256,
           TO_BASE64(ENCODE(n_name))         AS name_b64,
           HEX(n_nationkey)                  AS key_hex
    FROM nation
    """,
    group="functions",
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encode functions (MD5/SHA2/BASE64/HEX).
    Ref: BuiltInFunctionDefinitions MD5/SHA*/TO_BASE64; SqlFunctionUtils."""
    t = load_tables(spark, sf_dir)
    return t.nation.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2("n_name", 256).alias("name_sha256"),
        F.base64(F.col("n_name").cast("binary")).alias("name_b64"),
        F.upper(F.hex("n_nationkey")).alias("key_hex"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           ABS(p_retailprice - 1500)                        AS abs_diff,
           CAST(CEIL(p_retailprice / 100) AS BIGINT)        AS price_ceil,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT)       AS price_floor,
           ROUND(p_retailprice * 1.1, 2)                    AS price_up,
           ROUND(POWER(p_size, 2), 4)                       AS size_sq,
           ROUND(SQRT(p_size), 8)                           AS size_sqrt,
           ROUND(LN(p_retailprice), 8)                      AS price_ln,
           ROUND(LOG10(p_retailprice), 8)                   AS price_log10,
           ROUND(LOG2(p_size), 8)                           AS size_log2,
           ROUND(EXP(p_size / 50.0), 8)                     AS size_exp,
           CAST(SIGN(p_retailprice - 1500) AS DOUBLE)       AS price_sign,
           p_size % 7                                       AS size_mod,
           ROUND(SIN(p_size), 8)  AS size_sin,
           ROUND(COS(p_size), 8)  AS size_cos,
           ROUND(ATAN2(p_size, 10), 8) AS size_atan2,
           ROUND(DEGREES(p_size / 10.0), 8) AS size_deg,
           ROUND(RADIANS(p_size), 8) AS size_rad,
           GREATEST(p_size, 25)  AS size_hi,
           LEAST(p_size, 25)     AS size_lo,
           TRUNC(p_retailprice * 100) / 100 AS price_trunc2
    FROM part WHERE p_partkey % 13 = 0
    """,
    group="functions",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math builtins (+ custom TRUNCATE). Ref: BuiltInFunctionDefinitions math
    section. Transcendentals rounded to 8 dp (identical libm on this platform,
    rounding guards ulp drift)."""
    t = load_tables(spark, sf_dir)
    p = t.part.filter(F.col("p_partkey") % 13 == 0)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1500).alias("abs_diff"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_ceil"),
        F.floor(F.col("p_retailprice") / 100).alias("price_floor"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_up"),
        F.round(F.pow("p_size", F.lit(2)), 4).alias("size_sq"),
        F.round(F.sqrt("p_size"), 8).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 8).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 8).alias("price_log10"),
        F.round(F.log2("p_size"), 8).alias("size_log2"),
        F.round(F.exp(F.col("p_size") / 50.0), 8).alias("size_exp"),
        F.signum(F.col("p_retailprice") - 1500).alias("price_sign"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(F.sin("p_size"), 8).alias("size_sin"),
        F.round(F.cos("p_size"), 8).alias("size_cos"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 8).alias("size_atan2"),
        F.round(F.degrees(F.col("p_size") / 10.0), 8).alias("size_deg"),
        F.round(F.radians("p_size"), 8).alias("size_rad"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
        truncate(F.col("p_retailprice"), 2).alias("price_trunc2"),
    )


@query(
    "fn_temporal",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)   AS y,
           EXTRACT(month FROM o_orderdate)  AS m,
           EXTRACT(day FROM o_orderdate)    AS d,
           QUARTER(o_orderdate)             AS q,
           DAYOFWEEK(o_orderdate) + 1       AS dow_spark,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL 90 DAY    AS due_date,
           CAST(o_orderdate AS DATE)        AS order_day,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders WHERE o_orderkey % 17 = 0
    """,
    group="functions",
)
def fn_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal builtins. Ref: `SqlDateTimeUtils.java` (extract/format/
    floor-to-unit/diff). DuckDB dow is 0=Sunday vs Spark 1=Sunday → +1 in
    oracle."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderkey") % 17 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_spark"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.to_date("o_orderdate").alias("order_day"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).cast(
            "long"
        ).alias("days_to_y2k"),
    )


@query(
    "fn_conditional_cast",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                       AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), '?')  AS status_or_q,
           IF(o_orderpriority = '1-URGENT', 1, 0)     AS is_urgent,
           CAST(TRUNC(o_totalprice) AS BIGINT)        AS price_int,
           CAST(o_orderkey AS VARCHAR)                AS key_str,
           TRY_CAST(o_orderstatus AS INT)             AS bad_cast
    FROM orders WHERE o_orderkey % 23 = 0
    """,
    group="functions",
)
def fn_conditional_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IF + cast matrix (truncating double→int like the
    reference; DuckDB CAST rounds → oracle uses TRUNC). Ref: ScalarOperatorGens
    cast codegen."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderkey") % 23 == 0)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("?")).alias("status_or_q"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_cast"),
    )


@query(
    "fn_collections",
    oracle="""
    SELECT n_nationkey,
           TO_JSON([n_nationkey, n_regionkey])              AS keys_arr,
           LEN([n_nationkey, n_regionkey])                  AS arr_len,
           [n_nationkey, n_regionkey][1]                    AS arr_first,
           TO_JSON(FLATTEN([[n_nationkey], [n_regionkey]])) AS arr_flat,
           {'nk': n_nationkey, 'rk': n_regionkey}.nk        AS row_get,
           MAP(['nk'], [n_nationkey])['nk'][1]              AS map_at
    FROM nation WHERE n_nationkey % 3 = 0
    """,
    group="functions",
)
def fn_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection constructors/accessors: ARRAY/MAP/ROW, CARDINALITY, AT,
    ELEMENT, FLATTEN, GET. Ref: BuiltInFunctionDefinitions collections section."""
    t = load_tables(spark, sf_dir)
    n = t.nation.filter(F.col("n_nationkey") % 3 == 0)
    arr = F.array(F.col("n_nationkey"), F.col("n_regionkey"))
    return n.select(
        "n_nationkey",
        # JSON-serialized so the driver's hash comparator can digest the column
        # (raw arrays are unhashable pandas-side); semantics covered by pytest.
        F.to_json(arr).alias("keys_arr"),
        F.size(arr).cast("long").alias("arr_len"),
        F.element_at(arr, 1).alias("arr_first"),
        F.to_json(
            F.flatten(F.array(F.array("n_nationkey"), F.array("n_regionkey")))
        ).alias("arr_flat"),
        F.struct(F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk"))
        .getField("nk")
        .alias("row_get"),
        F.element_at(F.create_map(F.lit("nk"), F.col("n_nationkey")), "nk").alias("map_at"),
    )


@query(
    "fn_json",
    oracle="""
    WITH agg AS (
      SELECT n_regionkey,
             '{' || string_agg(to_json(n_name) || ':' || to_json(n_nationkey),
                               ',' ORDER BY n_name) || '}'      AS oa,
             to_json(list(n_nationkey ORDER BY n_nationkey))     AS aa
      FROM nation GROUP BY n_regionkey
    )
    SELECT n.n_name,
           json_object('name', n.n_name, 'rkey', n.n_regionkey,
                       'maybe', NULLIF(n.n_regionkey, 0))        AS obj,
           json_extract_string(
             json_object('name', n.n_name, 'rkey', n.n_regionkey,
                         'maybe', NULLIF(n.n_regionkey, 0)), '$.name') AS jv,
           CAST(json_extract(
             json_object('ks', [n.n_nationkey, n.n_regionkey]), '$.ks')
             AS VARCHAR)                                         AS jq,
           (json_extract(
             json_object('name', n.n_name, 'rkey', n.n_regionkey,
                         'maybe', NULLIF(n.n_regionkey, 0)), '$.rkey')
             IS NOT NULL)                                        AS je_hit,
           (json_extract(
             json_object('name', n.n_name, 'rkey', n.n_regionkey,
                         'maybe', NULLIF(n.n_regionkey, 0)), '$.nope')
             IS NOT NULL)                                        AS je_miss,
           to_json(n.n_nationkey)                                AS js_num,
           to_json(n.n_name)                                     AS js_str,
           to_json(list_filter([n.n_nationkey, NULLIF(n.n_regionkey, 0)],
                               x -> x IS NOT NULL))              AS ja,
           json_valid(json_object('name', n.n_name, 'rkey', n.n_regionkey,
                                  'maybe', NULLIF(n.n_regionkey, 0))) AS valid,
           json_valid(n.n_name)                                  AS invalid,
           a.oa, a.aa
    FROM nation n JOIN agg a USING (n_regionkey)
    """,
    group="functions",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL/JSON function family (Flink 1.15+): JSON_OBJECT (NULL ON NULL
    default — the 'maybe' field stays as JSON null for region 0),
    JSON_VALUE (scalar, unquoted), JSON_QUERY (subtree as JSON text),
    JSON_EXISTS (FALSE ON ERROR), JSON_STRING (scalar serialization),
    JSON_ARRAY (ABSENT ON NULL default — null element dropped), IS JSON,
    and the two aggregates JSON_OBJECTAGG / JSON_ARRAYAGG (sorted for
    cross-partition determinism). Ref: BuiltInFunctionDefinitions JSON_*;
    runtime SqlJsonUtils.java. All Jackson-backed JVM expressions."""
    from flink_ci_flink_spark.functions.scalar import (
        is_json,
        json_array,
        json_arrayagg,
        json_exists,
        json_object,
        json_objectagg,
        json_query,
        json_string,
        json_value,
    )

    t = load_tables(spark, sf_dir)
    n = t.nation
    maybe = F.when(F.col("n_regionkey") != 0, F.col("n_regionkey"))
    obj = json_object(
        "name", F.col("n_name"), "rkey", F.col("n_regionkey"), "maybe", maybe
    )
    obj2 = json_object("ks", F.array(F.col("n_nationkey"), F.col("n_regionkey")))
    agg = n.groupBy("n_regionkey").agg(
        json_objectagg("n_name", "n_nationkey").alias("oa"),
        json_arrayagg("n_nationkey").alias("aa"),
    )
    return n.join(F.broadcast(agg), "n_regionkey").select(
        "n_name",
        obj.alias("obj"),
        json_value(obj, "$.name").alias("jv"),
        json_query(obj2, "$.ks").alias("jq"),
        json_exists(obj, "$.rkey").alias("je_hit"),
        json_exists(obj, "$.nope").alias("je_miss"),
        json_string(F.col("n_nationkey")).alias("js_num"),
        json_string(F.col("n_name")).alias("js_str"),
        json_array(F.col("n_nationkey"), maybe).alias("ja"),
        is_json(obj).alias("valid"),
        is_json(F.col("n_name")).alias("invalid"),
        "oa",
        "aa",
    )
