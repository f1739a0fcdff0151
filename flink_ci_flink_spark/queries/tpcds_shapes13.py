"""TPC-DS-shaped queries, batch 13 — the last distinctive planner
features from the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`)
not yet exercised by batches 1-12. With these four, every TPC-DS query
number maps to a registered shape (the remaining numbers are planner-
identical to covered shapes — the full 103-variant mapping table lives
in COVERAGE.md):

- `tpcds_shape_measure_dim_disjunct` ~ q15: the disjunction whose arms
  span DIMENSION attributes AND the FACT MEASURE itself (q15's
  `zip-prefix IN list OR state IN list OR cs_sales_price > 500`) — the
  measure arm means no dimension gate can ever prefilter the fact scan;
  the OR must evaluate row-side after the join.
- `tpcds_shape_group_avg_return_detail` ~ q30/q81: customer DETAIL rows
  kept when their return total exceeds 1.2x the average per-customer
  return total of their group (q30's 1.2x state average over web
  returns, detail output) — q1's correlated-avg threshold PLUS the
  detail join-back, here folded into ONE customer scan by carrying the
  functionally-dependent detail columns through the per-customer
  aggregate.
- `tpcds_shape_geo_mismatch_brand` ~ q19: the brand report gated by an
  INEQUALITY between attributes reached through TWO-LEVEL dimension
  chains on BOTH sides (q19's customer-zip-substr <> store-zip-substr;
  here customer region vs supplier region, each via its nation), with
  the group key on a THIRD dimension (part brand). Same in-row
  attribute-pair comparison family as q46/q68's basket split, but as an
  aggregate-gate over doubled dim chains, not a per-order pivot.
- `tpcds_shape_multi_measure_means` ~ q7/q26 (also the planner shape of
  q42/q52/q55's group-topn reports): ONE pass computing means of FOUR
  different measures under a combined dimension gate (q7's
  demographics+promo filter; means of quantity / list price / coupon /
  sales price), 6dp NULLIF-guarded division over exact integer sums.

Scale notes: every shape is one fact scan with broadcast dims; the
q30/q81 group average re-aggregates the per-customer table (small,
keyed by custkey) and broadcasts a 25-row per-nation threshold back;
its `ret > 1.2 * avg` compare is cross-multiplied to
``ret * 10 * n > 12 * total`` in decimal(38,0)/HUGEINT (cents-sums
times customer-counts pass int64 near 100 TB — the round-10 `a80ce16`
discipline). Money in exact integer cents, rates in exact basis
points, deterministic output keys throughout.
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
    "tpcds_shape_measure_dim_disjunct",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE right(c_name, 2) IN ('00', '11', '22', '33', '44')
       OR c_mktsegment = 'BUILDING'
       OR {_CENT_SQL} > 550000
    GROUP BY n_name
    ORDER BY nation
    """,
    group="tpcds",
)
def tpcds_measure_dim_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15 shape: the disjunction spanning dimension attributes
    AND the fact measure itself (q15's `zip IN list OR state IN list OR
    cs_sales_price > 500`). Because one arm references the measure, no
    dimension-side gate can prefilter the scan — unlike q45 (both arms
    dim-side) or q13/q48 (dim x measure conjunctions), the planner must
    keep the OR row-side after the join and still push nothing. One
    fact scan, broadcast dims, exact integer cents. Ref:
    `TpcdsTestProgram.java:57-69` (variant 15)."""
    t = load_tables(spark, sf_dir)
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
        .filter(
            F.substring(F.col("c_name"), -2, 2).isin(
                "00", "11", "22", "33", "44"
            )
            | (F.col("c_mktsegment") == "BUILDING")
            | (_CENT() > 550000)
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_CENT()).cast("long").alias("cents"),
        )
        .orderBy("nation")
    )


@query(
    "tpcds_shape_group_avg_return_detail",
    oracle=f"""
    WITH per_cust AS (
      SELECT c_custkey, c_name, c_acctbal, c_nationkey,
             SUM({_CENT_SQL}) AS ret_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
    ), nat_thr AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(ret_cents) AS HUGEINT) AS total
      FROM per_cust
      GROUP BY 1
    )
    SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
           CAST(ret_cents AS BIGINT) AS ret_cents
    FROM per_cust
    JOIN nat_thr USING (c_nationkey)
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(ret_cents AS HUGEINT) * 10 * n > 12 * total
    ORDER BY c_custkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_group_avg_return_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30/q81 shape: customer DETAIL rows kept when their return
    total exceeds 1.2x the average per-customer return total of their
    nation (q30's 1.2x state-average over web returns with full customer
    detail output). q1's correlated threshold PLUS the detail join-back
    — folded into ONE customer scan by carrying the functionally-
    dependent detail columns (name, acctbal) through the per-customer
    groupBy; the per-nation threshold re-aggregates the small keyed
    table and broadcasts ~25 rows back. `ret > 1.2 * total/n` is
    cross-multiplied to ``ret * 10 * n > 12 * total`` in decimal(38,0)
    (HUGEINT oracle) — exact, and safe where cents-sums x customer-
    counts pass int64 at 100 TB. Deterministic: ORDER BY the unique
    customer key. Ref: `TpcdsTestProgram.java:57-69` (variants 30, 81)."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .agg(F.sum(_CENT()).alias("ret_cents"))
    )
    dec = "decimal(38,0)"
    nat_thr = per_cust.groupBy(
        F.col("c_nationkey").alias("t_nationkey")
    ).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("ret_cents").cast(dec).alias("total"),
    )
    # eqNullSafe on both downstream joins: plain equality would infer an
    # isnotnull(c_nationkey) pushdown into the detail branch only, making
    # the two per_cust branches non-identical and defeating the shared
    # scan->join->agg exchange (the documented ColumnPruning/isnotnull
    # trap — see pipeline/text.py::pmi_collocations).
    return (
        per_cust.join(
            F.broadcast(nat_thr),
            F.col("c_nationkey").eqNullSafe(F.col("t_nationkey")),
        )
        .filter(
            F.col("ret_cents").cast(dec) * 10 * F.col("n")
            > 12 * F.col("total")
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey").eqNullSafe(F.col("n_nationkey")),
        )
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            F.col("ret_cents").cast("long").alias("ret_cents"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "tpcds_shape_geo_mismatch_brand",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    JOIN part ON l_partkey = p_partkey
    WHERE cr.r_name <> sr.r_name
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    group="tpcds",
)
def tpcds_geo_mismatch_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape: the brand report gated by an INEQUALITY between
    attributes reached through TWO-LEVEL dimension chains on BOTH sides
    (q19 keeps sales where the customer's zip-substr differs from the
    store's — "bought away from home"; here the customer's region name
    vs the supplier's, each via its nation), grouped by a THIRD
    dimension (part brand). Same in-row attribute-pair comparison family
    as q46/q68's basket pivot, but as a plain aggregate gate over
    doubled dim chains — both nation/region roles broadcast twice under
    distinct aliases, one fact scan. Ref: `TpcdsTestProgram.java:57-69`
    (variant 19)."""
    t = load_tables(spark, sf_dir)
    cust_geo = (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", F.col("r_name").alias("c_region"))
    )
    supp_geo = (
        t.supplier.join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", F.col("r_name").alias("s_region"))
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_geo), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_geo), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_region") != F.col("s_region"))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_CENT()).cast("long").alias("cents"),
        )
        .orderBy("p_brand")
    )


_BP = lambda c: F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")  # noqa: E731


@query(
    "tpcds_shape_multi_measure_means",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(CAST(l_quantity AS BIGINT)) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_qty,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                 * 1.0 / NULLIF(COUNT(*), 0), 6) AS avg_price_cents,
           ROUND(SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT))
                 * 1.0 / NULLIF(COUNT(*), 0), 6) AS avg_disc_bp,
           ROUND(SUM(CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT))
                 * 1.0 / NULLIF(COUNT(*), 0), 6) AS avg_tax_bp
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    group="tpcds",
)
def tpcds_multi_measure_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7/q26 shape: ONE pass computing means of FOUR different
    measures (q7's avg quantity / list price / coupon amount / sales
    price) under a combined dimension gate (q7's demographics + promo
    filter — here order priority x market segment), reported per item
    attribute. Also the planner shape of q42/q52/q55's group-and-order
    reports (same star agg, fewer measures). Means are NULLIF-guarded
    ROUND(sum*1.0/count, 6) over exact integer sums (cents / basis
    points), so both engines divide identical integers. One fact scan,
    broadcast dims. Ref: `TpcdsTestProgram.java:57-69` (variants 7, 26;
    planner shape also 42, 52, 55)."""
    t = load_tables(spark, sf_dir)
    n = F.count(F.lit(1))
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    mean6 = lambda s: F.round(s * 1.0 / F.nullif(n, F.lit(0)), 6)  # noqa: E731
    return (
        t.lineitem.join(
            t.orders.filter(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                t.customer.filter(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            n.cast("long").alias("n_lines"),
            mean6(F.sum(F.col("l_quantity").cast("long"))).alias("avg_qty"),
            mean6(F.sum(cents)).alias("avg_price_cents"),
            mean6(F.sum(_BP("l_discount"))).alias("avg_disc_bp"),
            mean6(F.sum(_BP("l_tax"))).alias("avg_tax_bp"),
        )
        .orderBy("p_brand")
    )
