"""TPC-DS-shaped queries, batch 10 — three more distinctive planner shapes
from the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`),
mapped onto the synthetic schema like batches 1-9:

- `tpcds_shape_above_avg_of_sums` ~ q24a/b: detail rows of an aggregate
  kept when they exceed a multiple of the AVG OF THE AGGREGATE ITSELF —
  q24's ``HAVING sum(netpaid) > (SELECT 0.05 * avg(netpaid) FROM
  ssales)``. The average-of-sums scalar derives from the SAME grouped
  table as the detail rows (one fact scan via exchange reuse: the
  threshold filter touches only aggregate outputs and the scalar joins
  as a conditionless 1-row broadcast). The compare is cross-multiplied
  in EXACT arithmetic — ``c * n > mult * total`` — in decimal(38,0) /
  HUGEINT because cents-sums times pair-counts pass int64 near 100 TB
  (the round-10 `a80ce16` hardening discipline applied at birth).
- `tpcds_shape_disjunctive_bands` ~ q13/q48: the OR-of-conjunctions
  predicate where every disjunct ties a DIMENSION attribute to a
  MEASURE band (segment x quantity-band x discount-band); survivors
  aggregate exact integer moments per band. One fact scan, broadcast
  dim join, the disjunction evaluated row-side (no unions).
- `tpcds_shape_cross_nation_basket` ~ q46/q68: the attribute-pair
  INEQUALITY basket report — per order, lineitem revenue split into
  same-nation and cross-nation supplier cents (supplier nation vs the
  ordering customer's nation, two dim joins meeting in one row-level
  comparison), keeping orders whose cross-nation cents exceed their
  same-nation cents (both positive), detail rows ordered + limited
  (q46/q68 emit the changed-city order detail the same way).

Scale notes: q24's grouped table is (customer x part)-sized and its
scalar is a 1-row re-aggregation riding the same exchange; q13 is
map-side-evaluable predicates into one partial-aggregable groupBy; the
basket report is two broadcastable dim joins plus one (order, customer)
groupBy — no shape scans the fact more than once.
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


@query(
    "tpcds_shape_above_avg_of_sums",
    oracle=f"""
    WITH s AS (
      SELECT o_custkey AS ck, l_partkey AS pk,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), thr AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS total
      FROM s
    )
    SELECT ck, pk, cents
    FROM s, thr
    WHERE CAST(cents AS HUGEINT) * n > 3 * total
    ORDER BY ck, pk
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_above_avg_of_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24a/b shape: (customer, part) revenue detail kept when it
    exceeds 3x the AVERAGE of all (customer, part) revenues — the
    avg-of-the-aggregate-itself scalar threshold. cents > 3 * total / n
    is cross-multiplied to ``cents * n > 3 * total`` in decimal(38,0)
    (HUGEINT oracle): exact, and safe where cents-sums x pair-counts
    overflow int64 at 100 TB. The scalar (n, total) re-aggregates the
    SAME grouped table the detail rows come from; the filter references
    only aggregate outputs, so both branches share one
    scan->join->agg(ck, pk) exchange (one fact scan, plan-tested). Ref:
    `TpcdsTestProgram.java:57-69` (variants 24a/b)."""
    t = load_tables(spark, sf_dir)
    s = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .agg(F.sum(_CENT()).cast("long").alias("cents"))
    )
    thr = s.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("total"),
    )
    return (
        s.join(F.broadcast(thr))
        .filter(
            F.col("cents").cast("decimal(38,0)") * F.col("n")
            > F.lit(3) * F.col("total")
        )
        .select("ck", "pk", "cents")
        .orderBy("ck", "pk")
        .limit(100)
    )


@query(
    "tpcds_shape_disjunctive_bands",
    oracle=f"""
    SELECT CASE
             WHEN c_mktsegment = 'BUILDING' THEN 'building_small'
             WHEN c_mktsegment = 'MACHINERY' THEN 'machinery_mid'
             ELSE 'automobile_large' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS sum_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'
           AND l_quantity BETWEEN 1 AND 15
           AND l_discount BETWEEN 0.02 AND 0.06)
       OR (c_mktsegment = 'MACHINERY'
           AND l_quantity BETWEEN 16 AND 35
           AND l_discount BETWEEN 0.04 AND 0.08)
       OR (c_mktsegment = 'AUTOMOBILE'
           AND l_quantity BETWEEN 36 AND 50
           AND l_discount BETWEEN 0.00 AND 0.04)
    GROUP BY 1
    ORDER BY 1
    """,
    group="tpcds",
)
def tpcds_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13/q48 shape: OR-of-conjunction predicates, each disjunct
    tying a dimension attribute to measure bands (segment x quantity x
    discount), aggregated as exact integer moments per surviving band.
    Row-side disjunction on one fact scan — no per-branch unions. Ref:
    `TpcdsTestProgram.java:57-69` (variants 13, 48)."""
    t = load_tables(spark, sf_dir)
    seg = F.col("c_mktsegment")
    qty = F.col("l_quantity")
    disc = F.col("l_discount")
    b1 = (seg == "BUILDING") & qty.between(1, 15) & disc.between(0.02, 0.06)
    b2 = (seg == "MACHINERY") & qty.between(16, 35) & disc.between(0.04, 0.08)
    b3 = (
        (seg == "AUTOMOBILE")
        & qty.between(36, 50)
        & disc.between(0.00, 0.04)
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(b1 | b2 | b3)
        .groupBy(
            F.when(seg == "BUILDING", F.lit("building_small"))
            .when(seg == "MACHINERY", F.lit("machinery_mid"))
            .otherwise(F.lit("automobile_large"))
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(qty.cast("long")).cast("long").alias("sum_qty"),
            F.sum(_CENT()).cast("long").alias("sum_cents"),
        )
        .orderBy("band")
    )


@query(
    "tpcds_shape_cross_nation_basket",
    oracle=f"""
    WITH baskets AS (
      SELECT o_orderkey, o_custkey,
             CAST(SUM(CASE WHEN s_nationkey = c_nationkey
                           THEN {_CENT_SQL} ELSE 0 END) AS BIGINT)
               AS same_cents,
             CAST(SUM(CASE WHEN s_nationkey <> c_nationkey
                           THEN {_CENT_SQL} ELSE 0 END) AS BIGINT)
               AS cross_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    )
    SELECT o_orderkey, o_custkey, same_cents, cross_cents
    FROM baskets
    WHERE same_cents > 0 AND cross_cents > same_cents
    ORDER BY o_orderkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_cross_nation_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46/q68 shape: the attribute-pair INEQUALITY basket report —
    per order, revenue split into same-nation vs cross-nation supplier
    cents (supplier nation compared against the ordering customer's
    nation in-row), keeping orders whose cross-nation spend beats their
    same-nation spend, emitted as ordered + limited detail (q46/q68's
    changed-city output shape). Ref: `TpcdsTestProgram.java:57-69`
    (variants 46, 68)."""
    t = load_tables(spark, sf_dir)
    same = F.col("s_nationkey") == F.col("c_nationkey")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum(F.when(same, _CENT()).otherwise(0))
            .cast("long")
            .alias("same_cents"),
            F.sum(F.when(~same, _CENT()).otherwise(0))
            .cast("long")
            .alias("cross_cents"),
        )
        .filter(
            (F.col("same_cents") > 0)
            & (F.col("cross_cents") > F.col("same_cents"))
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
