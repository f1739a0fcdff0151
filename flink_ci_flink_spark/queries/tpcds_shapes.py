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
- `tpcds_shape_multi_bucket_counts` ~ q88 (scalar COUNT subqueries fused
  into one conditional-aggregation scan)
- `tpcds_shape_yoy_growth`        ~ q11/q74 (year-over-year ratio via CTE
  self-join on the customer key)
- `tpcds_shape_union_channel_agg` ~ q33/q56 (three channel branches
  UNION ALL'd into one item aggregate)
- `tpcds_shape_cumulative_crossover` ~ q51 (two cumulative window series
  joined on the date axis, crossover filter)
- `tpcds_shape_full_outer_overlap` ~ q97 (FULL OUTER channel-overlap
  census by null-pattern)
- `tpcds_shape_threeway_intersect` ~ q38/q87 (chained INTERSECT of
  distinct key sets → count)
- `tpcds_shape_exists_either`     ~ q10/q35 (EXISTS AND (EXISTS OR
  EXISTS), the OR decorrelated to a union semi-join)
- `tpcds_shape_having_count_between` ~ q34/q73 (HAVING COUNT BETWEEN
  band, join back to the dimension, second HAVING)

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
      SELECT c_custkey, c_nationkey, CAST(SUM({_CENT_SQL}) AS BIGINT) AS ret_cents
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
    SELECT channel, n_name, CAST(SUM(cents) AS BIGINT) AS sales_cents, COUNT(*) AS n_sales
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
    SELECT p_brand, CAST(SUM({_CENT_SQL}) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items
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
    SELECT COUNT(*) AS n_rows, CAST(SUM({_CENT_SQL}) AS BIGINT) AS total_cents
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
    # Materialize the per-customer spend aggregate once: the scalar max
    # and the best-customer filter both consume it, and Catalyst does not
    # reuse the aggregation exchange across the broadcast boundary — the
    # fact join otherwise executes twice (executed scans lineitem 4 -> 3,
    # orders 3 -> 2; the remaining three lineitem roles are semantically
    # distinct: spend, frequency, detail). Customer-cardinality rows of
    # (key, long) — the small end, like the trainers' model collects.
    spend = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("spend_cents"))
        .localCheckpoint(eager=True)
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
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS sales_cents
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


@query(
    "tpcds_shape_multi_bucket_counts",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)  AS b1,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS b2,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS b3,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS b4,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS b5
    """,
    group="tpcds",
)
def tpcds_multi_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: a row of independent scalar COUNT subqueries over
    disjoint buckets. Spark-first: ONE scan with conditional aggregation —
    the plan TPC-DS engines rewrite q88 into (5 scans fused to 1)."""
    t = load_tables(spark, sf_dir)

    def bucket(lo, hi, name):
        return F.sum(
            (F.col("l_quantity").between(lo, hi)).cast("long")
        ).alias(name)

    return t.lineitem.agg(
        bucket(1, 10, "b1"),
        bucket(11, 20, "b2"),
        bucket(21, 30, "b3"),
        bucket(31, 40, "b4"),
        bucket(41, 50, "b5"),
    )


@query(
    "tpcds_shape_yoy_growth",
    oracle=f"""
    WITH yearly AS (
      SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
             SUM({_CENT_SQL}) AS spend_cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    )
    SELECT a.o_custkey,
           CAST(a.spend_cents AS BIGINT) AS spend_1996,
           CAST(b.spend_cents AS BIGINT) AS spend_1997,
           FLOOR(b.spend_cents * 1e6 / a.spend_cents + 0.5) / 1e6 AS growth
    FROM yearly a JOIN yearly b
      ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
    WHERE a.spend_cents > 0 AND b.spend_cents > a.spend_cents
    ORDER BY growth DESC, a.o_custkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11/q74 shape: per-customer year-over-year spend ratio. The
    SQL (and the oracle text) is a self-join of a yearly CTE on the
    customer key; the Spark-first plan FUSES the two CTE references into
    one conditional-aggregation pass — the per-side year filters push
    below any shared exchange and split the subplans, so a literal
    self-join rescans the fact per side (measured), while the fused form
    is one scan + one shuffle. Presence of a year == its spend > 0 (every
    line has positive price), so the inner-join semantics survive."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    yr = F.year("o_orderdate")
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1996, cents).otherwise(0)).alias("spend_1996"),
            F.sum(F.when(yr == 1997, cents).otherwise(0)).alias("spend_1997"),
        )
        .filter(
            (F.col("spend_1996") > 0) & (F.col("spend_1997") > F.col("spend_1996"))
        )
        .select(
            "o_custkey",
            "spend_1996",
            "spend_1997",
            (
                F.floor(
                    F.col("spend_1997") * F.lit(1e6) / F.col("spend_1996") + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("growth"),
        )
        .orderBy(F.desc("growth"), "o_custkey")
        .limit(100)
    )


@query(
    "tpcds_shape_union_channel_agg",
    oracle=f"""
    WITH by_part AS (
      SELECT l_partkey, {_CENT_SQL} AS cents, o_orderpriority
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ), u AS (
      SELECT l_partkey, cents FROM by_part WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT l_partkey, cents FROM by_part WHERE o_orderpriority = '2-HIGH'
      UNION ALL
      SELECT l_partkey, cents FROM by_part WHERE o_orderpriority = '5-LOW'
    )
    SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS total_cents, COUNT(*) AS n
    FROM u JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    group="tpcds",
)
def tpcds_union_channel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q33/q56 shape: three per-channel CTE branches UNION ALL'd into
    one aggregate by item attribute (each branch filters the same base CTE)."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    by_part = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_partkey", cents.alias("cents"), "o_orderpriority")
    )
    branches = [
        by_part.filter(F.col("o_orderpriority") == p).select("l_partkey", "cents")
        for p in ("1-URGENT", "2-HIGH", "5-LOW")
    ]
    u = branches[0].unionByName(branches[1]).unionByName(branches[2])
    return (
        u.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n"))
        .orderBy("p_brand")
    )


@query(
    "tpcds_shape_cumulative_crossover",
    oracle=f"""
    WITH daily AS (
      SELECT c_mktsegment, CAST(o_orderdate AS DATE) AS d,
             SUM({_CENT_SQL}) AS cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY 1, 2
    ), cume AS (
      SELECT c_mktsegment, d,
             SUM(cents) OVER (PARTITION BY c_mktsegment ORDER BY d) AS cum_cents
      FROM daily
    )
    SELECT b.d, CAST(b.cum_cents AS BIGINT) AS building_cum,
           CAST(m.cum_cents AS BIGINT) AS machinery_cum
    FROM (SELECT d, cum_cents FROM cume WHERE c_mktsegment = 'BUILDING') b
    JOIN (SELECT d, cum_cents FROM cume WHERE c_mktsegment = 'MACHINERY') m
      USING (d)
    WHERE b.cum_cents > m.cum_cents
    ORDER BY b.d
    """,
    group="tpcds",
)
def tpcds_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: two cumulative (running-sum window) series joined on
    the date axis, keeping days where one series has crossed the other."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    daily = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        .groupBy("c_mktsegment", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("d")
    cume = daily.select(
        "c_mktsegment", "d", F.sum("cents").over(w).alias("cum_cents")
    )
    b = cume.filter(F.col("c_mktsegment") == "BUILDING").select(
        "d", F.col("cum_cents").alias("building_cum")
    )
    m = cume.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "d", F.col("cum_cents").alias("machinery_cum")
    )
    return (
        b.join(m, "d")
        .filter(F.col("building_cum") > F.col("machinery_cum"))
        .orderBy("d")
    )


@query(
    "tpcds_shape_full_outer_overlap",
    oracle=f"""
    WITH prio AS (
      SELECT o_custkey AS ck, SUM({_CENT_SQL}) AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    ), std AS (
      SELECT o_custkey AS ck, SUM({_CENT_SQL}) AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    )
    SELECT
      CAST(SUM(CASE WHEN p.ck IS NOT NULL AND s.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
      CAST(SUM(CASE WHEN p.ck IS NOT NULL AND s.ck IS NULL     THEN 1 ELSE 0 END) AS BIGINT) AS priority_only,
      CAST(SUM(CASE WHEN p.ck IS NULL     AND s.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS standard_only
    FROM prio p FULL OUTER JOIN std s ON p.ck = s.ck
    """,
    group="tpcds",
)
def tpcds_full_outer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape: channel-overlap census via FULL OUTER JOIN of two
    per-channel aggregates, counted by null-pattern."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    prio = (
        joined.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(F.col("o_custkey").alias("pk"))
        .agg(F.sum(cents).alias("p_cents"))
    )
    std = (
        joined.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(F.col("o_custkey").alias("sk"))
        .agg(F.sum(cents).alias("s_cents"))
    )
    fo = prio.join(std, prio.pk == std.sk, "full_outer")
    return fo.agg(
        F.sum(
            (F.col("pk").isNotNull() & F.col("sk").isNotNull()).cast("long")
        ).alias("both_channels"),
        F.sum(
            (F.col("pk").isNotNull() & F.col("sk").isNull()).cast("long")
        ).alias("priority_only"),
        F.sum(
            (F.col("pk").isNull() & F.col("sk").isNotNull()).cast("long")
        ).alias("standard_only"),
    )


@query(
    "tpcds_shape_threeway_intersect",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
    )
    """,
    group="tpcds",
)
def tpcds_threeway_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38/q87 shape: customers active in ALL THREE periods via a
    chained INTERSECT of distinct key sets, then a global count.

    Catalyst plans INTERSECT as left-semi joins over distinct inputs —
    key-only shuffles; at 100 TB each branch prunes to one column before
    the join. Ref: TPC-DS q38 (`TpcdsTestProgram.java:57-69` runs it)."""
    t = load_tables(spark, sf_dir)

    def year_keys(y: int) -> DataFrame:
        return (
            t.orders.filter(F.year("o_orderdate") == y)
            .select("o_custkey")
            .distinct()
        )

    return (
        year_keys(1996)
        .intersect(year_keys(1997))
        .intersect(year_keys(1998))
        .agg(F.count(F.lit(1)).alias("n_loyal"))
    )


@query(
    "tpcds_shape_exists_either",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND EXTRACT(year FROM o.o_orderdate) = 1997
      )
      AND (
        EXISTS (
          SELECT 1 FROM orders o2
          WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 450000
        )
        OR EXISTS (
          SELECT 1 FROM lineitem l JOIN orders o3 ON l.l_orderkey = o3.o_orderkey
          WHERE o3.o_custkey = c.c_custkey AND l.l_quantity > 45
        )
      )
    GROUP BY c_mktsegment
    """,
    group="tpcds",
)
def tpcds_exists_either(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10/q35 shape: demographic counts of customers with activity
    in a base period AND presence in EITHER of two other relations —
    EXISTS AND (EXISTS OR EXISTS).

    The OR of two EXISTS decorrelates to a semi-join against the UNION of
    the two key sets (Catalyst can't OR two semi-joins directly); the union
    branches are key-only, so the extra shuffle carries one column.
    Ref: TPC-DS q10 (`TpcdsTestProgram.java:57-69`)."""
    t = load_tables(spark, sf_dir)
    active_1997 = (
        t.orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    )
    big_spenders = (
        t.orders.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    )
    bulk_buyers = (
        t.lineitem.filter(F.col("l_quantity") > 45)
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey")
    )
    either = big_spenders.unionByName(bulk_buyers)
    return (
        t.customer.join(
            active_1997, F.col("c_custkey") == active_1997.o_custkey, "left_semi"
        )
        .join(either, F.col("c_custkey") == either.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "tpcds_shape_having_count_between",
    oracle="""
    WITH bulky AS (
      SELECT o_orderkey, o_custkey
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_custkey
      HAVING COUNT(*) BETWEEN 6 AND 7
    )
    SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_bulky
    FROM bulky JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 2
    """,
    group="tpcds",
)
def tpcds_having_count_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: orders whose item count falls in a band
    (HAVING COUNT BETWEEN), joined back to the customer dimension, then a
    second HAVING over the per-customer count of such orders.

    Two partial-final count aggregations; the order→customer join carries
    only (orderkey, custkey) after the first HAVING prunes. Ref: TPC-DS
    q34 (`TpcdsTestProgram.java:57-69`)."""
    t = load_tables(spark, sf_dir)
    bulky = (
        t.orders.join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items").between(6, 7))
    )
    return (
        bulky.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("n_bulky"))
        .filter(F.col("n_bulky") >= 2)
    )
