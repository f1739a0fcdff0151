"""TPC-DS-shaped queries, batch 7 — six more distinctive planner shapes
from the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`),
mapped onto the synthetic schema like batches 1-6:

- `tpcds_shape_class_revenue_ratio` ~ q98/q12/q20: per-item revenue as a
  share of its CLASS total via a ratio-to-parent window
  (`SUM(SUM(rev)) OVER (PARTITION BY class)`), date-window scan filter,
  share threshold kept exact by cross-multiplying (`cents * 50 >
  class_cents` is "share > 2%" with no division).
- `tpcds_shape_repeat_purchase_range` ~ q72: the date-RANGE non-equi
  join — fact self-joined on an equi key (customer) plus a bounded date
  band (follow-up order within 30 days), aggregated per month.
- `tpcds_shape_multi_supplier_orders` ~ q95: the derived-set semi + anti
  — orders whose lineitems came from >= 2 DISTINCT suppliers (min/max
  short-circuit, no COUNT(DISTINCT)), LEFT SEMI against it, LEFT ANTI
  against orders with any returned line, aggregated by priority.
- `tpcds_shape_monthly_avg_dev` ~ q53/q63/q89: monthly sums compared to
  the brand's OWN yearly average via a plain partition window (the
  lag/lead-free sibling of batch 5's q47/q57 neighbor shape); the "more
  than 10% off the mean" filter is `10 * |s*n - total| > total`, exact.
- `tpcds_shape_quarter_growth_chain` ~ q31: two channels' quarter-over-
  quarter growth RATIOS compared across two consecutive transitions
  (q1->q2 and q2->q3) — conditional-aggregation pivot to one row per
  nation, ratio comparisons cross-multiplied.
- `tpcds_shape_excess_discount` ~ q32/q92: the correlated scalar-
  aggregate filter — lineitems whose discount exceeds 1.3x the average
  discount of the SAME part over the same 90-day window, fused to a
  partition window over one scan instead of a rescan subquery; single
  scalar output row.

Scale notes: the ratio-to-parent window shuffles once on class and the
window is key-local; the range self-join is an equi hash join on custkey
(per-customer order counts are bounded — the band filter runs inside the
join, never a cross product); the q95 shape's derived set is one groupBy
on orderkey with min/max (map-side combinable) and both semi/anti joins
reuse the orderkey partitioning; the deviation and growth shapes are
hundreds-of-groups aggregates with broadcast dims; excess-discount is
one scan, one window on partkey, one global agg — the q32 rescan
subquery is fused away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda: F.floor(  # noqa: E731
    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
).cast("long")
_CENT_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
_PRI = ("1-URGENT", "2-HIGH")


@query(
    "tpcds_shape_class_revenue_ratio",
    oracle=f"""
    WITH sales AS (
      SELECT p_type AS class, p_partkey AS partkey, {_CENT_SQL} AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-03-01'
        AND p_size < 25
    ), item AS (
      SELECT class, partkey,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(SUM(SUM(cents)) OVER (PARTITION BY class) AS BIGINT)
               AS class_cents
      FROM sales GROUP BY class, partkey
    )
    SELECT class, partkey, cents, class_cents
    FROM item
    WHERE cents * 50 > class_cents
    ORDER BY class, partkey
    """,
    group="tpcds",
)
def tpcds_class_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98/q12/q20 shape: ratio-to-parent — per-item revenue within
    a 60-day ship window, its class total via `SUM(SUM(cents)) OVER
    (PARTITION BY class)`, keeping items above a 2% share by
    cross-multiplying (`cents * 50 > class_cents`) so no division ever
    materializes. One shuffle on class; the window is key-local on the
    same exchange. Ref: `TpcdsTestProgram.java:57-69` (variants 12/20/98)."""
    t = load_tables(spark, sf_dir)
    sales = (
        t.lineitem.join(
            F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-03-01"))
            & (F.col("p_size") < 25)
        )
        .select(
            F.col("p_type").alias("class"),
            F.col("p_partkey").alias("partkey"),
            _CENT().alias("cents"),
        )
    )
    item = (
        sales.groupBy("class", "partkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .withColumn(
            "class_cents",
            F.sum("cents").over(Window.partitionBy("class")).cast("long"),
        )
    )
    return item.filter(F.col("cents") * 50 > F.col("class_cents")).orderBy(
        "class", "partkey"
    )


@query(
    "tpcds_shape_repeat_purchase_range",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
             o_orderkey AS okey
      FROM orders
    )
    SELECT CAST(year(a.d) * 100 + month(a.d) AS BIGINT) AS ym,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(date_diff('day', a.d, b.d)) AS BIGINT) AS gap_days,
           CAST(COUNT(DISTINCT a.custkey) AS BIGINT) AS n_customers
    FROM o a JOIN o b
      ON a.custkey = b.custkey
     AND b.d > a.d AND b.d <= a.d + INTERVAL 30 DAY
    WHERE year(a.d) = 1996
    GROUP BY 1
    ORDER BY ym
    """,
    group="tpcds",
)
def tpcds_repeat_purchase_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 shape: the bounded date-RANGE non-equi join — orders
    self-joined on customer with the follow-up order falling in a 30-day
    band after the first. The join is an equi HASH join on custkey with
    the band as a residual filter (per-customer order counts are bounded,
    so the in-bucket pair work is linear-ish; never a cross product), then
    a per-month aggregate of pair counts and gap days — all integers.
    Ref: `TpcdsTestProgram.java:57-69` (variant 72)."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("d"),
    )
    a = o.filter(F.year("d") == 1996).alias("a")
    b = o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.custkey") == F.col("b.custkey"))
        & (F.col("b.d") > F.col("a.d"))
        & (F.col("b.d") <= F.date_add(F.col("a.d"), 30)),
    )
    return (
        pairs.groupBy(
            (F.year("a.d") * 100 + F.month("a.d")).cast("long").alias("ym")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.datediff(F.col("b.d"), F.col("a.d")))
            .cast("long")
            .alias("gap_days"),
            F.countDistinct(F.col("a.custkey")).alias("n_customers"),
        )
        .orderBy("ym")
    )


@query(
    "tpcds_shape_multi_supplier_orders",
    oracle="""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING MIN(l_suppkey) <> MAX(l_suppkey)
    ), returned AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE year(o_orderdate) = 1996
      AND o_orderkey IN (SELECT l_orderkey FROM multi)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM returned)
    GROUP BY priority
    ORDER BY priority
    """,
    group="tpcds",
)
def tpcds_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: derived-set semi + anti over the same fact —
    orders whose lineitems shipped from >= 2 DISTINCT suppliers (the
    min(suppkey) != max(suppkey) short-circuit replaces COUNT(DISTINCT):
    map-side combinable and exact for the >= 2 predicate) and with NO
    returned line — both per-orderkey predicates computed in ONE
    aggregation whose survivors LEFT SEMI join to orders, rolled up by
    priority. Ref: `TpcdsTestProgram.java:57-69` (variant 95)."""
    t = load_tables(spark, sf_dir)
    # The semi set (>= 2 distinct suppliers) and the anti set (any
    # returned line) are BOTH per-orderkey aggregates of the same fact —
    # folded into one aggregation whose HAVING covers both predicates
    # (executed scans lineitem:2 -> 1; the semi+anti pair collapses to a
    # single semi join riding the same orderkey partitioning).
    keep = (
        t.lineitem.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("mn"),
            F.max("l_suppkey").alias("mx"),
            F.max(
                F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("__ret"),
        )
        .filter((F.col("mn") != F.col("mx")) & (F.col("__ret") == 0))
        .select("l_orderkey")
    )
    base = t.orders.filter(F.year("o_orderdate") == 1996).join(
        keep, F.col("o_orderkey") == keep.l_orderkey, "left_semi"
    )
    return (
        base.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("priority")
    )


@query(
    "tpcds_shape_monthly_avg_dev",
    oracle=f"""
    WITH monthly AS (
      SELECT p_brand AS brand,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE year(o_orderdate) = 1996
      GROUP BY brand, mo
    ), w AS (
      SELECT brand, mo, cents,
             CAST(SUM(cents) OVER (PARTITION BY brand) AS BIGINT) AS total,
             CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS n_months
      FROM monthly
    )
    SELECT brand, mo, cents, total, n_months
    FROM w
    WHERE 10 * abs(cents * n_months - total) > total
    ORDER BY brand, mo
    """,
    group="tpcds",
)
def tpcds_monthly_avg_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53/q63/q89 shape: monthly sums vs the brand's own yearly
    average via a plain partition window (no lag/lead — that sibling is
    batch 5's `deviation_with_neighbors`); "more than 10% off the mean"
    stays exact as `10 * |cents*n - total| > total`. One groupBy on
    (brand, month), one key-local window on brand, dims broadcast.
    Ref: `TpcdsTestProgram.java:57-69` (variants 53/63/89)."""
    t = load_tables(spark, sf_dir)
    monthly = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.year("o_orderdate") == 1996)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(F.sum(_CENT()).cast("long").alias("cents"))
    )
    w = Window.partitionBy("brand")
    dev = monthly.select(
        "brand",
        "mo",
        "cents",
        F.sum("cents").over(w).cast("long").alias("total"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_months"),
    )
    return dev.filter(
        10 * F.abs(F.col("cents") * F.col("n_months") - F.col("total"))
        > F.col("total")
    ).orderBy("brand", "mo")


@query(
    "tpcds_shape_quarter_growth_chain",
    oracle=f"""
    WITH sales AS (
      SELECT n_name AS nation,
             CAST(quarter(o_orderdate) AS BIGINT) AS q,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_pri,
             {_CENT_SQL} AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1996 AND quarter(o_orderdate) <= 3
    ), piv AS (
      SELECT nation,
             CAST(SUM(CASE WHEN is_pri AND q = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS pri_q1,
             CAST(SUM(CASE WHEN is_pri AND q = 2 THEN cents ELSE 0 END)
                  AS BIGINT) AS pri_q2,
             CAST(SUM(CASE WHEN is_pri AND q = 3 THEN cents ELSE 0 END)
                  AS BIGINT) AS pri_q3,
             CAST(SUM(CASE WHEN NOT is_pri AND q = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS std_q1,
             CAST(SUM(CASE WHEN NOT is_pri AND q = 2 THEN cents ELSE 0 END)
                  AS BIGINT) AS std_q2,
             CAST(SUM(CASE WHEN NOT is_pri AND q = 3 THEN cents ELSE 0 END)
                  AS BIGINT) AS std_q3
      FROM sales GROUP BY nation
    )
    SELECT nation, pri_q1, pri_q2, pri_q3, std_q1, std_q2, std_q3
    FROM piv
    WHERE pri_q1 > 0 AND pri_q2 > 0 AND std_q1 > 0 AND std_q2 > 0
      AND CAST(pri_q2 AS HUGEINT) * std_q1 > CAST(std_q2 AS HUGEINT) * pri_q1
      AND CAST(pri_q3 AS HUGEINT) * std_q2 > CAST(std_q3 AS HUGEINT) * pri_q2
    ORDER BY nation
    """,
    group="tpcds",
)
def tpcds_quarter_growth_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: two channels' quarter-over-quarter growth ratios
    compared across two CONSECUTIVE transitions (q1->q2 and q2->q3) —
    the channel x quarter matrix is a conditional-aggregation pivot to
    ONE row per nation (no self-joins), and both ratio comparisons
    (pri_growth > std_growth) are cross-multiplied with positivity
    guards, so the whole chain is exact integer math. Ref:
    `TpcdsTestProgram.java:57-69` (variant 31)."""
    t = load_tables(spark, sf_dir)
    sales = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .filter(
            (F.year("o_orderdate") == 1996) & (F.quarter("o_orderdate") <= 3)
        )
        .select(
            F.col("n_name").alias("nation"),
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.col("o_orderpriority").isin(*_PRI).alias("is_pri"),
            _CENT().alias("cents"),
        )
    )

    def cell(pri: bool, q: int, name: str):
        cond = (F.col("is_pri") == pri) & (F.col("q") == q)
        return (
            F.sum(F.when(cond, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
        )

    piv = sales.groupBy("nation").agg(
        cell(True, 1, "pri_q1"),
        cell(True, 2, "pri_q2"),
        cell(True, 3, "pri_q3"),
        cell(False, 1, "std_q1"),
        cell(False, 2, "std_q2"),
        cell(False, 3, "std_q3"),
    )
    # Growth cross-multiplies compare PRODUCTS of two channel-quarter
    # sums — two ~1e14-cent operands at 100 TB overflow int64 (the SF1
    # rung caught exactly this), so the comparison runs in decimal(38,0)
    # (HUGEINT in the oracle); emitted columns stay BIGINT.
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return piv.filter(
        (F.col("pri_q1") > 0)
        & (F.col("pri_q2") > 0)
        & (F.col("std_q1") > 0)
        & (F.col("std_q2") > 0)
        & (dec("pri_q2") * dec("std_q1") > dec("std_q2") * dec("pri_q1"))
        & (dec("pri_q3") * dec("std_q2") > dec("std_q3") * dec("pri_q2"))
    ).orderBy("nation")


@query(
    "tpcds_shape_excess_discount",
    oracle="""
    WITH win AS (
      SELECT l_partkey,
             CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS d_bp,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
    ), stat AS (
      SELECT l_partkey, d_bp, price_cents,
             CAST(SUM(d_bp) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_bp,
             CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n
      FROM win
    )
    SELECT CAST(SUM(price_cents) AS BIGINT) AS excess_cents,
           CAST(COUNT(*) AS BIGINT) AS n_excess
    FROM stat
    WHERE 10 * d_bp * n > 13 * sum_bp
    """,
    group="tpcds",
)
def tpcds_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32/q92 shape: the correlated scalar-aggregate filter —
    lineitems whose discount exceeds 1.3x the average discount of the
    SAME part over the same 90-day window. The classic rescan subquery is
    fused to ONE scan + a partition window on partkey; `d > 1.3 * avg`
    becomes `10 * d_bp * n > 13 * sum_bp` in integer basis points (no
    floating average). Single scalar output row, like q32's
    "excess discount amount". Ref: `TpcdsTestProgram.java:57-69`
    (variants 32/92)."""
    t = load_tables(spark, sf_dir)
    win = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    ).select(
        "l_partkey",
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("d_bp"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    w = Window.partitionBy("l_partkey")
    stat = win.select(
        "d_bp",
        "price_cents",
        F.sum("d_bp").over(w).cast("long").alias("sum_bp"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
    )
    return stat.filter(
        10 * F.col("d_bp") * F.col("n") > 13 * F.col("sum_bp")
    ).agg(
        F.sum("price_cents").cast("long").alias("excess_cents"),
        F.count(F.lit(1)).alias("n_excess"),
    )
