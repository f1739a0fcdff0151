"""TPC-DS-shaped queries on the synthetic star schema.

The reference's operative SQL-breadth bar is 103/103 TPC-DS variants
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`,
tolerance comparator `utils/TpcdsResultComparator.java:54`). The schema here
has no store/catalog/web channels, so these queries reproduce the PLANNER
SHAPES that distinguish TPC-DS from TPC-H — multi-CTE reuse, channel UNION
ALL + ROLLUP reports, decorrelated max-of-sum subqueries, correlated
above-average filters, rank-over-rollup — against the synthetic tables:

- `tpcds_shape_returns_above_avg` ~ q1 (correlated avg-per-group subquery)
- `tpcds_shape_channel_rollup`    ~ q5/q77 (channel UNION ALL + ROLLUP)
- `tpcds_shape_cross_year_parts`  ~ q14 (CTE of items present across
  periods, reused by the main query)
- `tpcds_shape_frequent_best`     ~ q23 (two CTE filters: frequent items +
  best customers via max-of-sum scalar threshold)
- `tpcds_shape_rank_over_rollup`  ~ q67 (ROLLUP + RANK window, top-k)

Money sums use exact integer cents per the repo-wide parity rule.

Scale: every CTE materializes as its own shuffle stage with partial-final
aggregation; the scalar thresholds (max-of-sum, per-nation averages) join
back as 1-row/small broadcasts; semi-joins carry only keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731
_CENT_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


@query(
    "tpcds_shape_returns_above_avg",
    oracle=f"""
    WITH cust_returns AS (
      SELECT c_custkey, c_nationkey, SUM({_CENT_SQL}) AS ret_cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_nationkey
    ), nat_avg AS (
      SELECT c_nationkey, AVG(ret_cents) AS avg_ret FROM cust_returns GROUP BY 1
    )
    SELECT c_custkey, ret_cents
    FROM cust_returns JOIN nat_avg USING (c_nationkey)
    WHERE ret_cents > 1.2 * avg_ret
    ORDER BY ret_cents DESC, c_custkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 shape: customers whose returns exceed 1.2x their nation's
    average — the correlated aggregate subquery, decorrelated into a
    group-avg joined back on the correlation key."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cust_returns = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(cents).alias("ret_cents"))
    )
    nat_avg = cust_returns.groupBy("c_nationkey").agg(
        F.avg("ret_cents").alias("avg_ret")
    )
    return (
        cust_returns.join(F.broadcast(nat_avg), "c_nationkey")
        .filter(F.col("ret_cents") > F.lit(1.2) * F.col("avg_ret"))
        .select("c_custkey", "ret_cents")
        .orderBy(F.desc("ret_cents"), "c_custkey")
        .limit(100)
    )


@query(
    "tpcds_shape_channel_rollup",
    oracle=f"""
    WITH sales AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'priority' ELSE 'standard' END AS channel,
             n_name, {_CENT_SQL} AS cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT channel, n_name, SUM(cents) AS sales_cents, COUNT(*) AS n_sales
    FROM sales
    GROUP BY ROLLUP(channel, n_name)
    """,
    group="tpcds",
)
def tpcds_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5/q77 shape: per-channel sales report with ROLLUP subtotals
    and a grand total (Catalyst Expand)."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sales = (
        t.lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "priority"
            )
            .otherwise("standard")
            .alias("channel"),
            "n_name",
            _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cents"),
        )
    )
    return sales.rollup("channel", "n_name").agg(
        F.sum("cents").alias("sales_cents"), F.count(F.lit(1)).alias("n_sales")
    )


@query(
    "tpcds_shape_cross_year_parts",
    oracle=f"""
    WITH persistent AS (
      SELECT l_partkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_partkey
      HAVING COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) >= 4
    )
    SELECT p_brand, SUM({_CENT_SQL}) AS revenue_cents, COUNT(*) AS n_items
    FROM lineitem
    JOIN persistent USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    group="tpcds",
)
def tpcds_cross_year_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape: a CTE of items present across every sales period
    (here: parts sold in >= 4 distinct years) semi-joined back into the
    main aggregate."""
    t = load_tables(spark, sf_dir)
    persistent = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_partkey")
        .agg(F.countDistinct(F.year("o_orderdate")).alias("n_years"))
        .filter(F.col("n_years") >= 4)
        .select("l_partkey")
    )
    return (
        t.lineitem.join(persistent, "l_partkey", "left_semi")
        .join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(
                _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@query(
    "tpcds_shape_frequent_best",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, SUM({_CENT_SQL}) AS spend_cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY o_custkey
    ), best AS (
      SELECT o_custkey FROM spend
      WHERE spend_cents > 0.5 * (SELECT MAX(spend_cents) FROM spend)
    ), frequent AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40
    )
    SELECT COUNT(*) AS n_rows, SUM({_CENT_SQL}) AS total_cents
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN best     ON best.o_custkey = orders.o_custkey
    JOIN frequent ON frequent.l_partkey = lineitem.l_partkey
    """,
    group="tpcds",
)
def tpcds_frequent_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 shape: two CTE filters — frequently-sold items and best
    customers (spend above half the max spend, a max-of-sum scalar
    subquery) — intersected in the final aggregate. The scalar max joins as
    a 1-row broadcast; both filters apply as semi-joins."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    spend = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("spend_cents"))
    )
    max_spend = spend.agg(F.max("spend_cents").alias("max_spend"))
    best = (
        spend.join(F.broadcast(max_spend))
        .filter(F.col("spend_cents") > F.lit(0.5) * F.col("max_spend"))
        .select("o_custkey")
    )
    frequent = (
        t.lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 40)
        .select("l_partkey")
    )
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(best.withColumnRenamed("o_custkey", "bk"), F.col("o_custkey") == F.col("bk"), "left_semi")
        .join(frequent.withColumnRenamed("l_partkey", "fk"), F.col("l_partkey") == F.col("fk"), "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).alias("total_cents"),
        )
    )


@query(
    "tpcds_shape_rank_over_rollup",
    oracle=f"""
    WITH agg AS (
      SELECT n_name,
             EXTRACT(year FROM o_orderdate) AS o_year,
             c_mktsegment,
             SUM({_CENT_SQL}) AS sales_cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      GROUP BY n_name, ROLLUP(EXTRACT(year FROM o_orderdate), c_mktsegment)
    )
    SELECT n_name, o_year, c_mktsegment, sales_cents, rk
    FROM (
      SELECT *, RANK() OVER (
        PARTITION BY n_name
        ORDER BY sales_cents DESC, COALESCE(o_year, -1), COALESCE(c_mktsegment, '')
      ) AS rk
      FROM agg
    )
    WHERE rk <= 3
    """,
    group="tpcds",
)
def tpcds_rank_over_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: ROLLUP aggregate (year, segment within nation)
    then RANK over each nation's rows, keeping the top 3 — Expand feeding a
    window (WindowGroupLimit applies the rk<=3 early)."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            "c_mktsegment",
            cents.alias("cents"),
        )
    )
    # GROUP BY n_name, ROLLUP(o_year, c_mktsegment) == grouping sets
    agg = (
        base.groupingSets(
            [
                ["n_name", "o_year", "c_mktsegment"],
                ["n_name", "o_year"],
                ["n_name"],
            ],
            "n_name",
            "o_year",
            "c_mktsegment",
        )
        .agg(F.sum("cents").alias("sales_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("sales_cents"),
        F.coalesce(F.col("o_year"), F.lit(-1)),
        F.coalesce(F.col("c_mktsegment"), F.lit("")),
    )
    return (
        agg.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "o_year", "c_mktsegment", "sales_cents", "rk")
    )
