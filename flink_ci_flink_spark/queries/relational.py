"""Operator-family coverage queries: SURVEY.md §2.2-2.8 (batch SQL surface).

One named query per operator family, each with an exact DuckDB oracle twin.
Reference analogs cited per query. All outputs are deterministic (unique
tie-breaks on every ordering/limit; floats rounded identically both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.operators import deduplicate, top_n
from flink_ci_flink_spark.queries.registry import query


# ---------------------------------------------------------------- calc ----
@query(
    "calc_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charge,
           CASE WHEN l_discount >= 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
           COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag,
           UPPER(l_linestatus) AS status_u
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    group="calc",
)
def calc_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused project+filter (Calc). Ref: `BatchExecCalc.scala`,
    codegen `CalcCodeGenerator.scala` — in Spark this whole block is one
    WholeStageCodegen span over the parquet scan with both predicates pushed."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 4
        ).alias("charge"),
        F.when(F.col("l_discount") >= 0.05, "HIGH").otherwise("LOW").alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias("flag"),
        F.upper("l_linestatus").alias("status_u"),
    )


# --------------------------------------------------------------- joins ----
@query(
    "join_left_outer_agg",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    """,
    group="join",
)
def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + agg (join-condition pushdown on the right side).
    Ref: `HashJoinOperator.java:58` left-outer mode."""
    t = load_tables(spark, sf_dir)
    orders_f = t.orders.filter(F.col("o_orderstatus") == "F")
    return (
        t.customer.join(orders_f, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full_outer_counts",
    oracle="""
    WITH l AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
         r AS (SELECT l_orderkey, l_quantity FROM lineitem WHERE l_orderkey % 5 = 0)
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS left_missing,
           COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS right_missing,
           ROUND(SUM(COALESCE(l_quantity, 0)), 2) AS qty_sum
    FROM l FULL OUTER JOIN r ON o_orderkey = l_orderkey
    """,
    group="join",
)
def join_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with unmatched rows on both sides.
    Ref: `SortMergeFullOuterJoinIterator.java`."""
    t = load_tables(spark, sf_dir)
    l = t.orders.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_totalprice")
    r = t.lineitem.filter(F.col("l_orderkey") % 5 == 0).select("l_orderkey", "l_quantity")
    j = l.join(r, l.o_orderkey == r.l_orderkey, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("left_missing"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("right_missing"),
        F.round(F.sum(F.coalesce(F.col("l_quantity"), F.lit(0.0))), 2).alias("qty_sum"),
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS unmatched
    FROM (SELECT * FROM lineitem WHERE l_quantity > 49) li
    RIGHT JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    group="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join. Ref: `HashJoinType.java` right-outer variant."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_quantity") > 49)
    return (
        li.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"), "right")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("unmatched"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    group="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (IN/EXISTS lowering).
    Ref: `HashJoinType.java` semi, `ReplaceIntersectWithSemiJoinRule.scala`."""
    t = load_tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'P')
    """,
    group="join",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS lowering). Ref: `HashJoinType.java` anti,
    `ReplaceMinusWithAntiJoinRule.scala`."""
    t = load_tables(spark, sf_dir)
    p = t.orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return t.customer.join(
        p, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    group="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product. Ref: `CrossDriver.java`, `DataSet.cross` (DataSet.java:1056)."""
    t = load_tables(spark, sf_dir)
    return t.region.select("r_name").crossJoin(t.nation.select("n_name"))


@query(
    "join_theta_nonequi",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey > r.r_regionkey
    GROUP BY r.r_name
    """,
    group="join",
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join → broadcast nested-loop in Spark.
    Ref: `BatchExecNestedLoopJoin.scala`, `NestedLoopJoinCodeGenerator.scala`."""
    t = load_tables(spark, sf_dir)
    r = t.region.select("r_regionkey", "r_name")
    n = t.nation.select("n_regionkey")
    return (
        r.join(n, n.n_regionkey > r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# ---------------------------------------------------------------- aggs ----
@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    group="agg",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the Expand node. Ref: `DecomposeGroupingSetsRule.scala`,
    `BatchExecExpand.scala`."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_rollup_cube",
    oracle="""
    WITH r AS (
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus) AS g1, GROUPING(o_orderpriority) AS g2,
             COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)),
         c AS (
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus) AS g1, GROUPING(o_orderpriority) AS g2,
             COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority))
    SELECT 'rollup' AS src, * FROM r UNION ALL SELECT 'cube' AS src, * FROM c
    """,
    group="agg",
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE (DataFrame API) unioned. Ref: grouping-sets decompose."""
    t = load_tables(spark, sf_dir)
    aggs = [
        F.grouping("o_orderstatus").alias("g1"),
        F.grouping("o_orderpriority").alias("g2"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ]
    r = (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(*aggs)
        .select(F.lit("rollup").alias("src"), "*")
    )
    c = (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(*aggs)
        .select(F.lit("cube").alias("src"), "*")
    )
    return r.unionByName(c)


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS nd_supp,
           COUNT(DISTINCT l_partkey) AS nd_part,
           CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sum_d_line,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    group="agg",
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates (Expand-based planning).
    Ref: `SplitAggregateRule.scala`, distinct-agg support in `GroupAggFunction.java:44`."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.countDistinct("l_partkey").alias("nd_part"),
        F.sum_distinct(F.col("l_linenumber").cast("long")).alias("sum_d_line"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_POP(l_extendedprice), 4)  AS std_pop,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_samp,
           ROUND(VAR_POP(l_discount), 8)          AS v_pop,
           ROUND(VAR_SAMP(l_discount), 8)         AS v_samp,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS med_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_p, ROUND(MAX(l_extendedprice), 2) AS max_p
    FROM lineitem GROUP BY l_linestatus
    """,
    group="agg",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Ref: aggfunctions `*VarPop/VarSamp/StddevPop/
    StddevSamp*` (flink-table-planner-blink functions/aggfunctions)."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_linestatus").agg(
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("std_pop"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_samp"),
        F.round(F.var_pop("l_discount"), 8).alias("v_pop"),
        F.round(F.var_samp("l_discount"), 8).alias("v_samp"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("med_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_p"),
        F.round(F.max("l_extendedprice"), 2).alias("max_p"),
    )


@query(
    "agg_collect_listagg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS names_csv,
           TO_JSON(LIST_SORT(LIST(DISTINCT n_name))) AS names_arr,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    group="agg",
)
def agg_collect_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / COLLECT. Ref: `ListAggFunction.java`, `CollectAggFunction.java`."""
    t = load_tables(spark, sf_dir)
    return t.nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("names_csv"),
        # to_json keeps the driver's hash comparator happy (raw arrays are
        # unhashable on the pandas side); the list semantics stay intact.
        F.to_json(F.sort_array(F.collect_set("n_name"))).alias("names_arr"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT c_nationkey,
           MIN_BY(c_name, c_acctbal) AS poorest,
           MAX_BY(c_name, c_acctbal) AS richest,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
    group="agg",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minBy/maxBy (DataSet.java:523,559; FirstValue/LastValue agg analogs).
    c_acctbal is unique per group in the corpus → deterministic."""
    t = load_tables(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


# ------------------------------------------------------- over windows ----
@query(
    "over_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk,
           LEAD(o_orderkey) OVER w AS next_key,
           LAG(o_orderkey)  OVER w AS prev_key
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    group="over",
)
def over_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + offset over-window functions.
    Ref: `RankAggFunction.java`, `DenseRankAggFunction.java`,
    `RowNumberAggFunction.java`, `LeadLagAggFunction.java`;
    batch over operator `BufferDataOverWindowOperator.java`."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ws = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(ws).alias("rnk"),
        F.dense_rank().over(ws).alias("drnk"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    )


@query(
    "over_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice
                 RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW), 2) AS range_sum
    FROM orders
    WHERE o_custkey % 20 = 0
    """,
    group="over",
)
def over_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS and RANGE over-window frames.
    Ref: `RowSlidingOverFrame.java`, `RangeSlidingOverFrame.java`,
    `UnboundedOverWindowFrame.java` (operators/over/frame/)."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_custkey") % 20 == 0)
    wt = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wv = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(wt.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(wt.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
        F.round(
            F.sum("o_totalprice").over(wv.rangeBetween(-50000, 0)), 2
        ).alias("range_sum"),
    )


# ----------------------------------------------------- sort/limit/topn ----
@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 5
    """,
    group="sort",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit + offset (TakeOrderedAndProject).
    Ref: `SortLimitOperator.java:39`, `LimitOperator.java:32`."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .offset(5)
        .limit(15)
    )


@query(
    "topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 3
    """,
    group="rank",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per key via the top_n operator.
    Ref: `AppendOnlyTopNFunction.java:46`, `RankOperator.java:35`."""
    t = load_tables(spark, sf_dir)
    out = top_n(
        t.customer,
        ["c_mktsegment"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        3,
    )
    return out.select(
        "c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "rn"
    )


@query(
    "dedup_keep_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
    group="dedup",
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-last deduplication per key.
    Ref: `DeduplicateKeepLastRowFunction.java:36`, `StreamExecDeduplicateRule`."""
    t = load_tables(spark, sf_dir)
    return deduplicate(
        t.orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        keep="last",
    )


# ------------------------------------------------------------- set ops ----
@query(
    "setop_union",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000)
    SELECT 'all' AS src, k FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
    UNION ALL
    SELECT 'dist' AS src, k FROM (SELECT k FROM a UNION SELECT k FROM b)
    """,
    group="setop",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + UNION DISTINCT. Ref: `BatchExecUnion.scala`, Table.union
    (Table.java:690,706)."""
    t = load_tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = t.orders.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k"))
    u_all = a.union(b).select(F.lit("all").alias("src"), "k")
    u_dist = a.union(b).distinct().select(F.lit("dist").alias("src"), "k")
    return u_all.unionByName(u_dist)


@query(
    "setop_intersect_except",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
    SELECT 'i' AS src, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT 'ia' AS src, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'e' AS src, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    UNION ALL
    SELECT 'ea' AS src, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    """,
    group="setop",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT [ALL] / EXCEPT [ALL]. Ref: `ReplaceIntersectWithSemiJoinRule.scala`,
    `RewriteIntersectAllRule.scala`, `ReplaceMinusWithAntiJoinRule.scala`,
    `RewriteMinusAllRule.scala`."""
    t = load_tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = t.orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return (
        a.intersect(b).select(F.lit("i").alias("src"), "k")
        .unionByName(a.intersectAll(b).select(F.lit("ia").alias("src"), "k"))
        .unionByName(a.subtract(b).select(F.lit("e").alias("src"), "k"))
        .unionByName(a.exceptAll(b).select(F.lit("ea").alias("src"), "k"))
    )


# ----------------------------------------------------------- subqueries ----
@query(
    "subquery_in_exists",
    oracle="""
    SELECT 'in' AS src, c_custkey FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    UNION ALL
    SELECT 'exists' AS src, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 450000)
    UNION ALL
    SELECT 'notin' AS src, c_custkey FROM customer
    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey <> 2)
    """,
    group="subquery",
)
def subquery_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / EXISTS / NOT IN subqueries (Catalyst RewritePredicateSubquery).
    Ref: `FlinkSubQueryRemoveRule.scala`, `ConvertToNotInOrInRule.scala`."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'in' AS src, c_custkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        UNION ALL
        SELECT 'exists' AS src, c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000)
        UNION ALL
        SELECT 'notin' AS src, c_custkey FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey <> 2)
        """
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    group="subquery",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in predicate. Ref: subquery rewrite program
    (`FlinkSubQueryRemoveRule.scala:38`)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


# ------------------------------------------------------ lateral / UDTF ----
@query(
    "explode_lateral_words",
    oracle="""
    SELECT word, COUNT(*) AS freq
    FROM (SELECT UNNEST(STR_SPLIT_REGEX(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 25
    """,
    group="udtf",
)
def explode_lateral_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral table function (UDTF) via explode: tokenize documents.
    Ref: `TableFunction.java:139`, `Table.joinLateral` (Table.java:476)."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(25)
    )


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    group="pivot",
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (spread rows to columns). No direct reference operator — Table API
    composes it; included for DataFrame surface completeness."""
    t = load_tables(spark, sf_dir)
    p = (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "values_inline",
    oracle="""
    SELECT k, CAST(v AS DOUBLE) * 2 AS v2
    FROM (VALUES (1, 10.0), (2, 20.5), (3, -1.5)) AS t(k, v)
    """,
    group="scan",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES source. Ref: `ValuesInputFormat.java:37`."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.5), (3, -1.5)], "k int, v double")
    return df.select("k", (F.col("v") * 2).alias("v2"))


@query(
    "over_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           FIRST_VALUE(maybe_key IGNORE NULLS) OVER w AS first_urgent_key,
           NTILE(4) OVER w AS quartile,
           FLOOR(PERCENT_RANK() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
           FLOOR(CUME_DIST()    OVER w * 1e6 + 0.5) / 1e6 AS cume
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey END AS maybe_key
      FROM orders WHERE o_custkey % 25 = 0
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    group="over",
)
def over_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value over-window functions: FIRST_VALUE / LAST_VALUE (full frame),
    FIRST_VALUE IGNORE NULLS, NTILE, PERCENT_RANK, CUME_DIST.
    Ref: `FirstValueAggFunction.java`, `LastValueAggFunction.java`
    (+ ...WithRetract variants), `NTILEAggFunction`/`PercentRank`/`CumeDist`
    in `flink-table-runtime-blink/.../functions/aggregate/` and the blink
    over-window codegen."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_custkey") % 25 == 0).select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_orderkey")).alias(
            "maybe_key"
        ),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.first("maybe_key", ignorenulls=True).over(w).alias("first_urgent_key"),
        F.ntile(4).over(w).alias("quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "over_range_interval_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY d
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_30d_cents
    FROM (
      SELECT o_custkey, o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS d
      FROM orders WHERE o_custkey % 15 = 0
    )
    """,
    group="over",
)
def over_range_interval_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: 30-day trailing spend per customer — the
    RANGE BETWEEN INTERVAL '30' DAY PRECEDING shape, expressed on an
    epoch-day order key (Spark's classic-API rangeBetween takes long
    bounds; day-difference keys keep the frame exact).
    Ref: `RangeSlidingOverFrame.java`, RowTimeRangeBoundedPrecedingFunction
    (the streaming twin already covered by streaming_bounded_over)."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_custkey") % 15 == 0).select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("cents").over(w).alias("trailing_30d_cents"),
    )
