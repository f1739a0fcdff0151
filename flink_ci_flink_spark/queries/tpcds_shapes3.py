"""TPC-DS-shaped queries, batch 3 — remaining distinctive planner paths.

Reference bar: 103/103 TPC-DS variants
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`).
Batches 1–2 cover rollups, CTE reuse/fusion, window deviation, pivots,
fact-role chains, set-op unions and band filters. This batch adds:

- `tpcds_shape_percentile_report`  — sort-based aggregate path:
  PERCENTILE_CONT quartiles per group (exact-integer cents make the
  interpolation bit-identical across engines: frac ∈ {0,.25,.5,.75} and
  integer endpoints are exactly representable, so `lo + (hi-lo)*frac`
  is exact in both).
- `tpcds_shape_histogram_buckets`  ~ q6-style scalar-subquery compare:
  global min/max (1-row aggregate broadcast) drives equal-width
  bucketing of every order — scalar subquery feeding row-level compute.
- `tpcds_shape_topn_intersection`  ~ q49/q74 flavor: the same fact
  scanned for two consecutive years, ranked independently, and the
  top-50 sets intersected (rank-filter branches joined on the key).
- `tpcds_shape_exists_over_avg`    ~ q23/q1 flavor: correlated EXISTS
  against the row's own group aggregate ("an order worth more than 2×
  the customer's average"), decorrelated to one aggregate + join; the
  comparison is cross-multiplied to stay in exact integers.
- `tpcds_shape_first_purchase_cohort` ~ q... new-customer cohort: first
  purchase month per customer (min-aggregate), joined back to the fact
  to report cohort size and first-month revenue per month.

Scale notes: percentile quartiles are the only sort-heavy agg (inherent);
the histogram's min/max is a 1-row broadcast (no driver action); the
top-n intersection ranks two *filtered* branches so each shuffles only
its year's slice; the cohort join is key-partitioned on o_custkey and
reuses the first aggregate's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_TP_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
def _tp_cents():
    return F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")


@query(
    "tpcds_shape_percentile_report",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, {_TP_CENTS} AS cents FROM orders
    ), c AS (
      SELECT c_nationkey AS nk, cents
      FROM o JOIN customer ON c_custkey = o_custkey
    )
    SELECT nk,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) AS p25,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY cents) AS p50,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY cents) AS p75,
           CAST(MAX(cents) AS BIGINT) AS mx
    FROM c
    GROUP BY nk
    """,
    group="tpcds",
)
def tpcds_percentile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile report per nation over exact order cents — the sort-based
    aggregate path (PERCENTILE_CONT). Integer cents endpoints + quarter
    fractions make the linear interpolation bit-identical across engines."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select("o_custkey", _tp_cents().alias("cents"))
    c = o.join(F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
               F.col("c_custkey") == F.col("o_custkey"))
    return (
        c.groupBy(F.col("c_nationkey").cast("long").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("percentile(cents, 0.25)").alias("p25"),
            F.expr("percentile(cents, 0.5)").alias("p50"),
            F.expr("percentile(cents, 0.75)").alias("p75"),
            F.max("cents").alias("mx"),
        )
    )


@query(
    "tpcds_shape_histogram_buckets",
    oracle=f"""
    WITH o AS (
      SELECT {_TP_CENTS} AS cents FROM orders
    ), bounds AS (
      SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM o
    )
    SELECT LEAST(9, CAST(FLOOR((cents - lo) * 10.0 / (hi - lo)) AS BIGINT))
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM o, bounds
    GROUP BY 1
    """,
    group="tpcds",
)
def tpcds_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 10-bucket histogram of order values: the global min/max
    scalar aggregate broadcast into a row-level bucket expression (q6-style
    scalar-subquery-feeds-filter shape), then one partial-final count/sum."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select(_tp_cents().alias("cents"))
    bounds = o.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("cents") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo"))),
    ).cast("long")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


@query(
    "tpcds_shape_topn_intersection",
    oracle=f"""
    WITH y96 AS (
      SELECT o_custkey, SUM({_TP_CENTS}) AS cents
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      GROUP BY 1
      QUALIFY row_number() OVER (ORDER BY cents DESC, o_custkey) <= 50
    ), y97 AS (
      SELECT o_custkey, SUM({_TP_CENTS}) AS cents
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1997
      GROUP BY 1
      QUALIFY row_number() OVER (ORDER BY cents DESC, o_custkey) <= 50
    )
    SELECT y96.o_custkey AS custkey,
           CAST(y96.cents AS BIGINT) AS cents_1996,
           CAST(y97.cents AS BIGINT) AS cents_1997
    FROM y96 JOIN y97 ON y96.o_custkey = y97.o_custkey
    """,
    group="tpcds",
)
def tpcds_topn_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in the top-50 by revenue in BOTH 1996 and 1997: the fact
    scanned per year slice (filter pushed to the scan), ranked
    independently (global top-n → single-partition rank over 50+ rows
    only after per-year aggregation), then an equi-join of the two small
    ranked sets (broadcast)."""
    t = load_tables(spark, sf_dir)

    def year_top(yr: int) -> DataFrame:
        agg = (
            t.orders.filter(F.year("o_orderdate") == yr)
            .groupBy("o_custkey")
            .agg(F.sum(_tp_cents()).alias("cents"))
        )
        w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
        return (
            agg.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 50)
            .drop("__rn")
        )

    a = year_top(1996).withColumnRenamed("cents", "cents_1996")
    b = year_top(1997).withColumnRenamed("cents", "cents_1997")
    return (
        a.join(F.broadcast(b), "o_custkey")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("cents_1996").cast("bigint"),
            F.col("cents_1997").cast("bigint"),
        )
    )


@query(
    "tpcds_shape_exists_over_avg",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name
    FROM customer c
    WHERE EXISTS (
      SELECT 1
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND {_TP_CENTS.replace('o_totalprice', 'o.o_totalprice')}
              * (SELECT COUNT(*) FROM orders o3
                 WHERE o3.o_custkey = c.c_custkey)
            > 2 * (SELECT SUM({_TP_CENTS.replace('o_totalprice', 'o2.o_totalprice')})
                   FROM orders o2 WHERE o2.o_custkey = c.c_custkey)
    )
    """,
    group="tpcds",
)
def tpcds_exists_over_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one order worth more than 2× their own
    average (correlated EXISTS against the row's own group aggregate —
    q23/q1 flavor). Decorrelated Spark plan: one per-customer aggregate
    (max, sum, count) and the comparison cross-multiplied into exact
    integers (`max*n > 2*sum`) — no float boundary, no correlated rescan."""
    t = load_tables(spark, sf_dir)
    per = (
        t.orders.select("o_custkey", _tp_cents().alias("cents"))
        .groupBy("o_custkey")
        .agg(
            F.max("cents").alias("mx"),
            F.sum("cents").alias("sm"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("mx") * F.col("n") > 2 * F.col("sm"))
    )
    return (
        t.customer.join(per, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


@query(
    "tpcds_shape_first_purchase_cohort",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY 1
    )
    SELECT f.cohort,
           CAST(COUNT(DISTINCT f.o_custkey) AS BIGINT) AS n_new_customers,
           CAST(SUM({_TP_CENTS.replace('o_totalprice', 'o.o_totalprice')})
                AS BIGINT) AS first_month_cents
    FROM firsts f
    JOIN orders o
      ON o.o_custkey = f.o_custkey
     AND date_trunc('month', o.o_orderdate) = f.cohort
    GROUP BY 1
    """,
    group="tpcds",
)
def tpcds_first_purchase_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-customer cohorts: first purchase month per customer
    (min-aggregate), joined back to the fact on (custkey, month) to count
    cohort size and first-month revenue. Both the aggregate and the join
    hash-partition on o_custkey, so the join reuses the aggregate's
    exchange (no second fact shuffle)."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("omonth"),
        _tp_cents().alias("cents"),
    )
    firsts = (
        o.groupBy("o_custkey")
        .agg(F.min("omonth").alias("cohort"))
        .withColumnRenamed("o_custkey", "f_custkey")
    )
    return (
        o.join(
            firsts,
            (F.col("o_custkey") == F.col("f_custkey"))
            & (F.col("omonth") == F.col("cohort")),
        )
        .groupBy("cohort")
        .agg(
            F.count_distinct("f_custkey").cast("bigint").alias("n_new_customers"),
            F.sum("cents").cast("bigint").alias("first_month_cents"),
        )
    )
