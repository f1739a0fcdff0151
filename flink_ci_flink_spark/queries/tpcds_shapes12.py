"""TPC-DS-shaped queries, batch 12 — four more distinctive planner
features from the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`)
not yet exercised by batches 1-11:

- `tpcds_shape_intersect_prefix_gate` ~ q8: a LITERAL value list
  INTERSECTed with a derived qualifying set, the intersection used as a
  SUBSTRING-keyed semi-join gate on the fact aggregation (q8's
  zip-prefix list INTERSECT preferred-customer zips gating store
  revenue).
- `tpcds_shape_second_fact_band_gate` ~ q37/q82: dimension DETAIL rows
  gated by an aggregate band on a SECOND fact role (q37's inventory
  quantity-on-hand BETWEEN band in a date window) AND a semi-join
  against the sales role — two semantically distinct fact passes
  feeding one detail output.
- `tpcds_shape_rollup_of_means` ~ q18/q27: the ROLLUP report of MEANS —
  numeric averages (not sums) recomputed at every rollup level with
  GROUPING() markers (q18's avg demographics rollup over
  state/county/...), NULLIF-guarded and 6dp-rounded on both engines.
- `tpcds_shape_cross_dim_disjunct` ~ q45: the OR that spans TWO
  DIFFERENT dimensions — one disjunct a literal predicate on a customer
  attribute substring, the other an IN-subquery against part keys
  (q45's zip-list OR item-subquery) — so neither side alone can gate
  the scan; aggregated per customer nation.

Scale notes: the q8 gate is a tiny two-set intersection broadcast
against the dim chain; q37/q82's two fact roles each shuffle once on
the part key (band agg + semi), detail join broadcast; the rollup of
means is one Expand aggregate; q45's subquery side becomes a broadcast
left-join marker so the cross-dimension OR evaluates row-side on one
fact scan. Money in exact integer cents; means ROUND(x*1.0/NULLIF(n,0),
6) on both engines; deterministic output keys throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda: F.floor(  # noqa: E731
    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
).cast("long")
_CENT_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"

_Q8_LIST = ("1", "3", "5", "7", "12", "18", "21", "24")


@query(
    "tpcds_shape_intersect_prefix_gate",
    oracle=f"""
    WITH literal_suffixes AS (
      SELECT * FROM (VALUES {", ".join(f"('{s}')" for s in _Q8_LIST)})
        AS v(suffix)
    ), preferred AS (
      SELECT substr(n_name, 8) AS suffix
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > 5000
      GROUP BY 1
      HAVING COUNT(*) >= 3
    ), gate AS (
      SELECT suffix FROM literal_suffixes
      INTERSECT
      SELECT suffix FROM preferred
    )
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE substr(n_name, 8) IN (SELECT suffix FROM gate)
    GROUP BY n_name
    ORDER BY nation
    """,
    group="tpcds",
)
def tpcds_intersect_prefix_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 shape: a literal value list INTERSECTed with a derived
    qualifying set (nation suffixes having >= 3 high-balance customers
    — q8's preferred-customer zips), the intersection gating the fact
    aggregate through a SUBSTRING key semi-join. The gate is a tiny
    intersection (broadcast semi-join on the derived suffix); revenue
    aggregates per supplier nation on one fact scan. Ref:
    `TpcdsTestProgram.java:57-69` (variant 8)."""
    t = load_tables(spark, sf_dir)
    suffix = F.substring(F.col("n_name"), 8, 100)
    literal = spark.createDataFrame(
        [(s,) for s in _Q8_LIST], ["suffix"]
    )
    preferred = (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("c_acctbal") > 5000)
        .groupBy(suffix.alias("suffix"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("suffix")
    )
    gate = literal.intersect(preferred)
    return (
        t.lineitem.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(gate),
            suffix == F.col("suffix"),
            "left_semi",
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_CENT()).cast("long").alias("cents"),
        )
        .orderBy("nation")
    )


@query(
    "tpcds_shape_second_fact_band_gate",
    oracle="""
    WITH availability AS (
      SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) BETWEEN 200 AND 2000
    ), sold_urgent AS (
      SELECT DISTINCT l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT p_partkey, p_name, p_brand,
           CAST(availability.total_qty AS BIGINT) AS total_qty
    FROM part
    JOIN availability ON p_partkey = availability.pk
    WHERE p_partkey IN (SELECT pk FROM sold_urgent)
    ORDER BY p_partkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_second_fact_band_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37/q82 shape: dimension DETAIL rows gated by an aggregate
    BAND on a second fact role (q37's inventory quantity-on-hand
    BETWEEN band inside a date window; here the part's shipped total in
    1997) AND a semi-join against the sales role (sold in at least one
    urgent order). The two fact passes are semantically distinct roles
    (exactly q37's inventory + catalog_sales split); each shuffles once
    on the part key and the dim detail joins broadcast. Deterministic:
    ORDER BY the unique part key. Ref: `TpcdsTestProgram.java:57-69`
    (variants 37, 82)."""
    t = load_tables(spark, sf_dir)
    availability = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty").between(200, 2000))
    )
    sold_urgent = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("l_partkey").alias("upk"))
    )
    return (
        t.part.join(
            availability, F.col("p_partkey") == F.col("pk")
        )
        .join(
            sold_urgent,
            F.col("p_partkey") == F.col("upk"),
            "left_semi",
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


@query(
    "tpcds_shape_rollup_of_means",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority,
           GROUPING(c_mktsegment) AS g_seg,
           GROUPING(o_orderpriority) AS g_pri,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(CAST(l_quantity AS BIGINT)) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_qty,
           ROUND(SUM({_CENT_SQL}) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
    """,
    group="tpcds",
)
def tpcds_rollup_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q18/q27 shape: the ROLLUP report of MEANS — numeric
    averages recomputed at every rollup level (q18/q27 emit avg
    quantity/list-price/coupon per state -> county -> total), with
    GROUPING() level markers. Means are NULLIF-guarded
    ROUND(sum*1.0/count, 6) on both engines (integer sums underneath, so
    the division is the only float step and rounds identically). One
    Expand aggregate, broadcast dims — no per-level rescans. Ref:
    `TpcdsTestProgram.java:57-69` (variants 18, 27)."""
    t = load_tables(spark, sf_dir)
    n = F.count(F.lit(1))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping("c_mktsegment").alias("g_seg"),
            F.grouping("o_orderpriority").alias("g_pri"),
            n.cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_quantity").cast("long")) * 1.0
                / F.nullif(n, F.lit(0)),
                6,
            ).alias("avg_qty"),
            F.round(
                F.sum(_CENT()) * 1.0 / F.nullif(n, F.lit(0)), 6
            ).alias("avg_cents"),
        )
    )


@query(
    "tpcds_shape_cross_dim_disjunct",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE right(c_name, 2) IN ('01', '23', '45', '67', '89')
       OR l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_brand IN ('Brand#1', 'Brand#2'))
    GROUP BY n_name
    ORDER BY nation
    """,
    group="tpcds",
)
def tpcds_cross_dim_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 shape: the OR spanning TWO DIFFERENT dimensions — one
    disjunct a literal predicate on a customer-attribute substring
    (q45's zip-prefix list), the other an IN-subquery against part keys
    (q45's item subquery) — so neither side alone can gate the scan.
    Spark-first: the subquery side becomes a broadcast LEFT-JOIN marker
    (match -> non-null key) so the cross-dimension disjunction evaluates
    row-side on ONE fact scan, then aggregates per customer nation.
    Ref: `TpcdsTestProgram.java:57-69` (variant 45)."""
    t = load_tables(spark, sf_dir)
    brand_parts = t.part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    ).select(F.col("p_partkey").alias("bpk"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == F.col("bpk"),
            "left",
        )
        .filter(
            F.substring(F.col("c_name"), -2, 2).isin(
                "01", "23", "45", "67", "89"
            )
            | F.col("bpk").isNotNull()
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_CENT()).cast("long").alias("cents"),
        )
        .orderBy("nation")
    )
