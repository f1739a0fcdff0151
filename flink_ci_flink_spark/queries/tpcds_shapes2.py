"""TPC-DS-shaped queries, batch 2 — planner shapes not covered by batch 1.

Reference bar: 103/103 TPC-DS variants
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`).
Batch 1 (`tpcds_shapes.py`) covers correlated-avg, rollups, CTE reuse,
max-of-sum thresholds, bucket fusion, YoY self-joins, set ops and
EXISTS-OR decorrelation. This module adds the remaining distinctive
planner features, each mapped to the TPC-DS query it imitates:

- `tpcds_shape_moving_dev`      ~ q47/q57 (window moving-average deviation
  with lag/lead neighbor columns over a monthly aggregate)
- `tpcds_shape_grouping_rank`   ~ q36/q70 (ROLLUP + GROUPING() inside the
  RANK partition key — lochierarchy ranking)
- `tpcds_shape_pivot_months`    ~ q66 (wide month-pivot report: one scan,
  12 conditional-sum columns via groupBy().pivot())
- `tpcds_shape_quarter_share`   ~ q31 (one quarterly CTE self-joined across
  consecutive periods, growth-ratio comparison between two segments)
- `tpcds_shape_sale_return_rebuy` ~ q29/q17 (fact^3: sold, returned,
  re-purchased quantities chained through part+customer)
- `tpcds_shape_net_after_returns` ~ q93 (per-line net quantity after
  subtracting returned lines, summed per customer)
- `tpcds_shape_channel_band`    ~ q58 (three single-channel aggregates
  joined where each is within 10% of their average)
- `tpcds_shape_dual_rank_union` ~ q49 (per-channel ratio with two rank
  orders, rank<=10 filter on either, UNION of channels)
- `tpcds_shape_anti_ratio`      ~ q78 (fact LEFT ANTI fact — lines with no
  return for the same (part, customer) — then a yearly ratio)
- `tpcds_shape_part_or_filter`  ~ q41 (dimension-only correlated COUNT
  with an OR-heavy predicate, decorrelated to an agg + semi-join)
- `tpcds_shape_revenue_bands`   ~ q54/q98 (aggregate-of-aggregate:
  per-customer revenue bucketed into bands, customers counted per band)
- `tpcds_shape_before_after_band` ~ q21 (before/after pivot-date split with
  a [2/3, 3/2] ratio band filter)
- `tpcds_shape_scalar_ratio`    ~ q90 (one-row ratio of two scalar counts,
  fused into a single conditional-aggregation scan)

Money sums use exact integer cents; ratios are floor-rounded to 6dp on
both sides; every rank/LIMIT ordering carries a unique tiebreak
(repo-wide parity rules).

Scale notes: all aggregates are partial-final; dims (nation, part slices)
broadcast; self-joins of a CTE share one exchange via an explicit
repartition on the join key; the pivot compiles to a single
conditional-aggregation scan (no per-month passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731
_CENT_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
_R6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731


@query(
    "tpcds_shape_moving_dev",
    oracle=f"""
    WITH monthly AS (
      SELECT c_nationkey AS nk,
             EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mo,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3
    ), v AS (
      SELECT nk, yr, mo, cents,
             AVG(cents) OVER (PARTITION BY nk, yr) AS yr_avg,
             LAG(cents)  OVER (PARTITION BY nk ORDER BY yr, mo) AS prev_cents,
             LEAD(cents) OVER (PARTITION BY nk ORDER BY yr, mo) AS next_cents
      FROM monthly
    )
    SELECT nk, yr, mo, cents, prev_cents, next_cents,
           FLOOR(ABS(cents - yr_avg) * 1e6 / yr_avg + 0.5) / 1e6 AS dev
    FROM v
    WHERE yr_avg > 0 AND ABS(cents - yr_avg) > 0.1 * yr_avg
    ORDER BY dev DESC, nk, yr, mo
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_moving_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q57 shape: monthly sales per nation, flag months deviating
    >10% from the nation-year average, carrying the neighbor months via
    LAG/LEAD — one aggregate feeding two window specs (one partition-only,
    one ordered) computed in a single Window stage pair."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    monthly = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w_avg = Window.partitionBy("nk", "yr")
    w_seq = Window.partitionBy("nk").orderBy("yr", "mo")
    v = monthly.select(
        "nk",
        "yr",
        "mo",
        "cents",
        F.avg("cents").over(w_avg).alias("yr_avg"),
        F.lag("cents").over(w_seq).alias("prev_cents"),
        F.lead("cents").over(w_seq).alias("next_cents"),
    )
    return (
        v.filter(
            (F.col("yr_avg") > 0)
            & (F.abs(F.col("cents") - F.col("yr_avg")) > 0.1 * F.col("yr_avg"))
        )
        .select(
            "nk",
            "yr",
            "mo",
            "cents",
            "prev_cents",
            "next_cents",
            _R6(F.abs(F.col("cents") - F.col("yr_avg")) / F.col("yr_avg")).alias("dev"),
        )
        .orderBy(F.desc("dev"), "nk", "yr", "mo")
        .limit(100)
    )


@query(
    "tpcds_shape_grouping_rank",
    oracle=f"""
    WITH agg AS (
      SELECT n_name, c_mktsegment,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS sales_cents,
             GROUPING(n_name) + GROUPING(c_mktsegment) AS lochierarchy,
             GROUPING(c_mktsegment) AS g_seg
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      GROUP BY ROLLUP(n_name, c_mktsegment)
    )
    SELECT n_name, c_mktsegment, sales_cents, lochierarchy,
           RANK() OVER (
             PARTITION BY lochierarchy, CASE WHEN g_seg = 1 THEN NULL ELSE n_name END
             ORDER BY sales_cents DESC, COALESCE(c_mktsegment, ''), COALESCE(n_name, '')
           ) AS rk
    FROM agg
    ORDER BY lochierarchy DESC, n_name NULLS FIRST, rk
    """,
    group="tpcds",
)
def tpcds_grouping_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36/q70 shape: ROLLUP(nation, segment) with the GROUPING()
    level ("lochierarchy") as part of the RANK partition — segments rank
    within their nation, nations rank among nations. Exercises grouping()
    metadata flowing from the Expand into a window partition key."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.sum(cents).alias("sales_cents"),
            (F.grouping("n_name") + F.grouping("c_mktsegment")).alias("lochierarchy"),
            F.grouping("c_mktsegment").alias("g_seg"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_seg") == 1, F.lit(None)).otherwise(F.col("n_name")),
    ).orderBy(
        F.desc("sales_cents"),
        F.coalesce(F.col("c_mktsegment"), F.lit("")),
        F.coalesce(F.col("n_name"), F.lit("")),
    )
    return (
        agg.withColumn("rk", F.rank().over(w))
        .select("n_name", "c_mktsegment", "sales_cents", "lochierarchy", "rk")
        .orderBy(F.desc("lochierarchy"), F.asc_nulls_first("n_name"), "rk")
    )


@query(
    "tpcds_shape_pivot_months",
    oracle=f"""
    SELECT n_name,
      CAST(SUM(CASE WHEN mo = 1  THEN cents ELSE 0 END) AS BIGINT) AS m01,
      CAST(SUM(CASE WHEN mo = 2  THEN cents ELSE 0 END) AS BIGINT) AS m02,
      CAST(SUM(CASE WHEN mo = 3  THEN cents ELSE 0 END) AS BIGINT) AS m03,
      CAST(SUM(CASE WHEN mo = 4  THEN cents ELSE 0 END) AS BIGINT) AS m04,
      CAST(SUM(CASE WHEN mo = 5  THEN cents ELSE 0 END) AS BIGINT) AS m05,
      CAST(SUM(CASE WHEN mo = 6  THEN cents ELSE 0 END) AS BIGINT) AS m06,
      CAST(SUM(CASE WHEN mo = 7  THEN cents ELSE 0 END) AS BIGINT) AS m07,
      CAST(SUM(CASE WHEN mo = 8  THEN cents ELSE 0 END) AS BIGINT) AS m08,
      CAST(SUM(CASE WHEN mo = 9  THEN cents ELSE 0 END) AS BIGINT) AS m09,
      CAST(SUM(CASE WHEN mo = 10 THEN cents ELSE 0 END) AS BIGINT) AS m10,
      CAST(SUM(CASE WHEN mo = 11 THEN cents ELSE 0 END) AS BIGINT) AS m11,
      CAST(SUM(CASE WHEN mo = 12 THEN cents ELSE 0 END) AS BIGINT) AS m12
    FROM (
      SELECT n_name, EXTRACT(month FROM o_orderdate) AS mo, {_CENT_SQL} AS cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
    group="tpcds",
)
def tpcds_pivot_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: wide monthly report — sales pivoted into 12 columns
    per nation for one year. Spark-first: groupBy().pivot() with explicit
    month values compiles to ONE conditional-aggregation scan (PivotFirst /
    cased sums), not 12 passes."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .select("n_name", F.month("o_orderdate").alias("mo"), cents.alias("cents"))
    )
    pivoted = (
        base.groupBy("n_name")
        .pivot("mo", list(range(1, 13)))
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("c"))
    )
    renamed = pivoted.select(
        "n_name",
        *[F.coalesce(F.col(str(m)), F.lit(0)).alias(f"m{m:02d}") for m in range(1, 13)],
    )
    return renamed.orderBy("n_name")


@query(
    "tpcds_shape_quarter_share",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             EXTRACT(quarter FROM o_orderdate) AS qtr,
             SUM({_CENT_SQL}) AS cents
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY 1, 2, 3
    )
    SELECT b1.nk,
           FLOOR(b2.cents * 1e6 / b1.cents + 0.5) / 1e6 AS bldg_growth,
           FLOOR(m2.cents * 1e6 / m1.cents + 0.5) / 1e6 AS mach_growth
    FROM q b1 JOIN q b2 ON b1.nk = b2.nk AND b1.seg = 'BUILDING'  AND b2.seg = 'BUILDING'  AND b1.qtr = 1 AND b2.qtr = 2
              JOIN q m1 ON b1.nk = m1.nk AND m1.seg = 'MACHINERY' AND m1.qtr = 1
              JOIN q m2 ON b1.nk = m2.nk AND m2.seg = 'MACHINERY' AND m2.qtr = 2
    WHERE b1.cents > 0 AND m1.cents > 0
      AND b2.cents * 1.0 / b1.cents > m2.cents * 1.0 / m1.cents
    ORDER BY b1.nk
    """,
    group="tpcds",
)
def tpcds_quarter_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: one quarterly CTE referenced four times (two
    segments x two consecutive quarters), nations where the BUILDING
    segment grew faster than MACHINERY. The oracle keeps the literal
    4-way CTE self-join; the Spark-first plan FUSES the four references
    into one conditional-aggregation pass (per-side seg/qtr filters push
    below any shared exchange and split the subplans, so a literal
    self-join rescans the fact four times — measured). Inner-join
    presence of a (seg, qtr) row == its sum > 0 (every line has positive
    price), enforced explicitly on all four slots."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    seg, qtr = F.col("c_mktsegment"), F.quarter("o_orderdate")

    def slot(seg_v: str, qtr_v: int, name: str):
        cond = (seg == seg_v) & (qtr == qtr_v)
        return F.sum(F.when(cond, cents).otherwise(0)).alias(name)

    per_nk = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
            & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        .groupBy(F.col("c_nationkey").cast("long").alias("nk"))
        .agg(
            slot("BUILDING", 1, "b1"),
            slot("BUILDING", 2, "b2"),
            slot("MACHINERY", 1, "m1"),
            slot("MACHINERY", 2, "m2"),
        )
    )
    return (
        per_nk.filter(
            (F.col("b1") > 0)
            & (F.col("b2") > 0)
            & (F.col("m1") > 0)
            & (F.col("m2") > 0)
            & (F.col("b2") / F.col("b1") > F.col("m2") / F.col("m1"))
        )
        .select(
            "nk",
            _R6(F.col("b2") / F.col("b1")).alias("bldg_growth"),
            _R6(F.col("m2") / F.col("m1")).alias("mach_growth"),
        )
        .orderBy("nk")
    )


@query(
    "tpcds_shape_sale_return_rebuy",
    oracle="""
    WITH sold AS (
      SELECT l_partkey AS pk, o_custkey AS ck, SUM(l_quantity) AS qty_sold,
             MIN(o_orderdate) AS first_sale
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag <> 'R'
      GROUP BY 1, 2
    ), returned AS (
      SELECT l_partkey AS pk, o_custkey AS ck, SUM(l_quantity) AS qty_ret
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2
    )
    SELECT s.pk, s.ck,
           CAST(s.qty_sold AS BIGINT) AS qty_sold,
           CAST(r.qty_ret AS BIGINT) AS qty_ret
    FROM sold s JOIN returned r ON s.pk = r.pk AND s.ck = r.ck
    WHERE s.qty_sold > r.qty_ret
    ORDER BY s.pk, s.ck
    LIMIT 200
    """,
    group="tpcds",
)
def tpcds_sale_return_rebuy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q29/q17 shape: the same fact scanned as two roles (sold vs
    returned lines) chained through (part, customer) — customers who kept
    buying a part beyond what they returned. Two partial aggregates of one
    fact joined on a compound key; quantities are exact integers here so
    the comparison is hash-stable."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    sold = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck"))
        .agg(F.sum("l_quantity").alias("qty_sold_d"))
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck"))
        .agg(F.sum("l_quantity").alias("qty_ret_d"))
    )
    return (
        sold.join(returned, ["pk", "ck"])
        .filter(F.col("qty_sold_d") > F.col("qty_ret_d"))
        .select(
            "pk",
            "ck",
            F.col("qty_sold_d").cast("long").alias("qty_sold"),
            F.col("qty_ret_d").cast("long").alias("qty_ret"),
        )
        .orderBy("pk", "ck")
        .limit(200)
    )


@query(
    "tpcds_shape_net_after_returns",
    oracle=f"""
    SELECT o_custkey,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity END) AS BIGINT)
             AS net_qty,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE {_CENT_SQL} END) AS BIGINT)
             AS net_cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity END) > 0
    ORDER BY net_cents DESC, o_custkey
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_net_after_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape: effective (net-of-returns) customer activity —
    returned lines contribute zero, everything else its quantity/revenue;
    a single conditional-aggregation scan with HAVING, no second fact
    instance needed (returns are flagged in-row in this schema)."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    is_keep = F.col("l_returnflag") != "R"
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(is_keep, F.col("l_quantity")).otherwise(0))
            .cast("long")
            .alias("net_qty"),
            F.sum(F.when(is_keep, cents).otherwise(0)).alias("net_cents"),
        )
        .filter(F.col("net_qty") > 0)
        .orderBy(F.desc("net_cents"), "o_custkey")
        .limit(100)
    )


@query(
    "tpcds_shape_channel_band",
    oracle=f"""
    WITH by_pri AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN {_CENT_SQL} ELSE 0 END) AS BIGINT) AS c_urgent,
             CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN {_CENT_SQL} ELSE 0 END) AS BIGINT) AS c_high,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                      THEN {_CENT_SQL} ELSE 0 END) AS BIGINT) AS c_rest
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1
    )
    SELECT pk, c_urgent, c_high, c_rest
    FROM by_pri
    WHERE c_urgent > 0 AND c_high > 0 AND c_rest > 0
      AND c_urgent BETWEEN 0.9 * (c_urgent + c_high + c_rest) / 3.0
                       AND 1.1 * (c_urgent + c_high + c_rest) / 3.0
      AND c_high   BETWEEN 0.9 * (c_urgent + c_high + c_rest) / 3.0
                       AND 1.1 * (c_urgent + c_high + c_rest) / 3.0
      AND c_rest   BETWEEN 0.9 * (c_urgent + c_high + c_rest) / 3.0
                       AND 1.1 * (c_urgent + c_high + c_rest) / 3.0
    ORDER BY pk
    """,
    group="tpcds",
)
def tpcds_channel_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape: items whose revenue is balanced (within +-10% of
    the three-channel average) across all three "channels" (order-priority
    classes here). q58 writes three channel CTEs joined pairwise; the
    Spark-first plan fuses them into one conditional-aggregation pass over
    the fact — same answer, one shuffle instead of three plus joins."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))

    def chan(cond, name):
        return F.sum(F.when(cond, cents).otherwise(0)).alias(name)

    pri = F.col("o_orderpriority")
    by_pri = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            chan(pri == "1-URGENT", "c_urgent"),
            chan(pri == "2-HIGH", "c_high"),
            chan(~pri.isin("1-URGENT", "2-HIGH"), "c_rest"),
        )
    )
    avg3 = (F.col("c_urgent") + F.col("c_high") + F.col("c_rest")) / 3.0
    in_band = lambda c: c.between(0.9 * avg3, 1.1 * avg3)  # noqa: E731
    return (
        by_pri.filter(
            (F.col("c_urgent") > 0)
            & (F.col("c_high") > 0)
            & (F.col("c_rest") > 0)
            & in_band(F.col("c_urgent"))
            & in_band(F.col("c_high"))
            & in_band(F.col("c_rest"))
        )
        .orderBy("pk")
    )


@query(
    "tpcds_shape_dual_rank_union",
    oracle=f"""
    WITH per_part AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 'priority' ELSE 'standard' END AS channel,
             l_partkey AS pk,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS ret_qty,
             SUM(l_quantity) AS tot_qty,
             SUM(CASE WHEN l_returnflag = 'R' THEN {_CENT_SQL} ELSE 0 END) AS ret_cents,
             SUM({_CENT_SQL}) AS tot_cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2
      HAVING SUM(l_quantity) > 0 AND SUM({_CENT_SQL}) > 0
    ), ranked AS (
      SELECT channel, pk,
             FLOOR(ret_qty   * 1e6 / tot_qty   + 0.5) / 1e6 AS qty_ratio,
             FLOOR(ret_cents * 1e6 / tot_cents + 0.5) / 1e6 AS amt_ratio,
             RANK() OVER (PARTITION BY channel ORDER BY ret_qty   * 1.0 / tot_qty, pk)   AS qty_rk,
             RANK() OVER (PARTITION BY channel ORDER BY ret_cents * 1.0 / tot_cents, pk) AS amt_rk
      FROM per_part
    )
    SELECT channel, pk, qty_ratio, amt_ratio, qty_rk, amt_rk
    FROM ranked
    WHERE qty_rk <= 10 OR amt_rk <= 10
    ORDER BY channel, qty_rk, amt_rk, pk
    """,
    group="tpcds",
)
def tpcds_dual_rank_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: per-channel "worst return ratio" report with TWO
    rank orders (quantity ratio and amount ratio) over the same partition,
    keeping rows in either top-10 — two window functions sharing one sort
    exchange, OR-filtered. pk breaks rank ties deterministically."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    is_ret = F.col("l_returnflag") == "R"
    per_part = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "priority"
            )
            .otherwise("standard")
            .alias("channel"),
            F.col("l_partkey").alias("pk"),
        )
        .agg(
            F.sum(F.when(is_ret, F.col("l_quantity")).otherwise(0)).alias("ret_qty"),
            F.sum("l_quantity").alias("tot_qty"),
            F.sum(F.when(is_ret, cents).otherwise(0)).alias("ret_cents"),
            F.sum(cents).alias("tot_cents"),
        )
        .filter((F.col("tot_qty") > 0) & (F.col("tot_cents") > 0))
    )
    w_qty = Window.partitionBy("channel").orderBy(
        F.col("ret_qty") / F.col("tot_qty"), "pk"
    )
    w_amt = Window.partitionBy("channel").orderBy(
        F.col("ret_cents") / F.col("tot_cents"), "pk"
    )
    return (
        per_part.select(
            "channel",
            "pk",
            _R6(F.col("ret_qty") / F.col("tot_qty")).alias("qty_ratio"),
            _R6(F.col("ret_cents") / F.col("tot_cents")).alias("amt_ratio"),
            F.rank().over(w_qty).alias("qty_rk"),
            F.rank().over(w_amt).alias("amt_rk"),
        )
        .filter((F.col("qty_rk") <= 10) | (F.col("amt_rk") <= 10))
        .orderBy("channel", "qty_rk", "amt_rk", "pk")
    )


@query(
    "tpcds_shape_anti_ratio",
    oracle=f"""
    WITH no_ret AS (
      SELECT l_partkey AS pk, o.o_custkey AS ck,
             EXTRACT(year FROM o_orderdate) AS yr,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem r JOIN orders ro ON ro.o_orderkey = r.l_orderkey
        WHERE r.l_returnflag = 'R'
          AND r.l_partkey = l.l_partkey AND ro.o_custkey = o.o_custkey
      )
      GROUP BY 1, 2, 3
    )
    SELECT a.pk, a.ck, a.cents AS cents_1996, b.cents AS cents_1997,
           FLOOR(b.cents * 1e6 / a.cents + 0.5) / 1e6 AS ratio
    FROM no_ret a JOIN no_ret b ON a.pk = b.pk AND a.ck = b.ck
    WHERE a.yr = 1996 AND b.yr = 1997 AND a.cents > 0
    ORDER BY ratio DESC, a.pk, a.ck
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_anti_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: activity on (part, customer) pairs that have NEVER
    had a return, then the 1997/1996 spend ratio per surviving pair. The
    NOT EXISTS is decorrelated all the way into the pivot aggregation
    itself (a per-group conditional max over the return flag) — one pass
    over the fact join instead of the earlier anti-join against a second
    scan of the same join; the year pivot is fused into the same
    conditional aggregate (q78's CTE-per-year self-join, decorrelated).
    Anti-join operator coverage lives in `tpcds_shape_exists_not_exists`
    / `tpch_q21/q22` / `window_dedup`, which keep the join form."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li = t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    yr = F.year("o_orderdate")
    # The NOT EXISTS anti-join is folded into the pivot aggregation as a
    # conditional max: a (pk, ck) group survives iff NO line in it ever
    # carried returnflag 'R' — exactly the set the anti-join kept, but in
    # ONE pass over the fact join (was: the lineitem x orders join built
    # twice — once for the returned-key set, once for the anti probe —
    # i.e. 2 scans of each fact + a distinct + an anti-join shuffle;
    # guide §2.4 remove shuffles outright).
    return (
        li.select(
            F.col("l_partkey").alias("pk"),
            F.col("o_custkey").alias("ck"),
            yr.alias("yr"),
            cents.alias("cents"),
            F.col("l_returnflag"),
        )
        .groupBy("pk", "ck")
        .agg(
            F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
                "cents_1996"
            ),
            F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0)).alias(
                "cents_1997"
            ),
            F.max(
                F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
            ).alias("__any_ret"),
        )
        .filter(
            (F.col("__any_ret") == 0)
            & (F.col("cents_1996") > 0)
            & (F.col("cents_1997") > 0)
        )
        .select(
            "pk",
            "ck",
            "cents_1996",
            "cents_1997",
            _R6(F.col("cents_1997") / F.col("cents_1996")).alias("ratio"),
        )
        .orderBy(F.desc("ratio"), "pk", "ck")
        .limit(100)
    )


@query(
    "tpcds_shape_part_or_filter",
    oracle="""
    SELECT DISTINCT p_name
    FROM part p1
    WHERE p_brand IN (
      SELECT p_brand FROM part p2
      WHERE (p2.p_type = 'ECONOMY'  AND p2.p_size BETWEEN 1 AND 5)
         OR (p2.p_type = 'STANDARD' AND p2.p_size BETWEEN 10 AND 15)
         OR (p2.p_type = 'PROMO'    AND p2.p_size BETWEEN 20 AND 25)
    )
    AND p_retailprice BETWEEN 940 AND 960
    ORDER BY p_name
    LIMIT 100
    """,
    group="tpcds",
)
def tpcds_part_or_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape: a dimension-only query — parts in a price band
    whose BRAND contains at least one part satisfying an OR-heavy
    type/size predicate. The correlated IN decorrelates to a broadcast
    semi-join of part against its own filtered brand projection."""
    t = load_tables(spark, sf_dir)
    or_pred = (
        ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(1, 5))
        | ((F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 15))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(20, 25))
    )
    qual_brands = t.part.filter(or_pred).select("p_brand")
    return (
        t.part.filter(F.col("p_retailprice").between(940, 960))
        .join(F.broadcast(qual_brands), "p_brand", "left_semi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(100)
    )


@query(
    "tpcds_shape_revenue_bands",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, SUM({_CENT_SQL}) AS rev_cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1
    )
    SELECT CAST(FLOOR(rev_cents / 5000000) AS BIGINT) AS band,
           COUNT(*) AS n_customers,
           CAST(SUM(rev_cents) AS BIGINT) AS band_cents
    FROM per_cust
    GROUP BY 1
    ORDER BY band
    """,
    group="tpcds",
)
def tpcds_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54/q98 shape: aggregate-of-aggregate — per-customer lifetime
    revenue bucketed into $50k bands, customers counted per band. Two
    chained shuffles where the second input is already tiny; the band
    expression stays integer (cents / 5_000_000) for hash stability."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_cust = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    return (
        per_cust.groupBy(
            F.floor(F.col("rev_cents") / 5000000).cast("long").alias("band")
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("rev_cents").alias("band_cents"),
        )
        .orderBy("band")
    )


@query(
    "tpcds_shape_before_after_band",
    oracle="""
    WITH per_supp AS (
      SELECT l_suppkey,
             SUM(CASE WHEN l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_before,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_after
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT l_suppkey,
           CAST(qty_before AS BIGINT) AS qty_before,
           CAST(qty_after  AS BIGINT) AS qty_after
    FROM per_supp
    WHERE qty_before > 0 AND qty_after > 0
      AND qty_after * 1.0 / qty_before BETWEEN 2.0/3.0 AND 3.0/2.0
    ORDER BY l_suppkey
    """,
    group="tpcds",
)
def tpcds_before_after_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape: per-supplier inventory shipped before vs after a
    pivot date, keeping suppliers whose after/before ratio stays within
    [2/3, 3/2] — the conditional split + band filter, one scan, one
    shuffle (quantities are exact integers in this corpus)."""
    t = load_tables(spark, sf_dir)
    pivot = F.lit("1997-07-01")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.when(F.col("l_shipdate") < pivot, F.col("l_quantity")).otherwise(0))
        .cast("long")
        .alias("qty_before"),
        F.sum(F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity")).otherwise(0))
        .cast("long")
        .alias("qty_after"),
    )
    ratio = F.col("qty_after") / F.col("qty_before")
    return (
        per_supp.filter(
            (F.col("qty_before") > 0)
            & (F.col("qty_after") > 0)
            & ratio.between(2.0 / 3.0, 3.0 / 2.0)
        )
        .orderBy("l_suppkey")
    )


@query(
    "tpcds_shape_scalar_ratio",
    oracle="""
    SELECT CASE WHEN pm_cnt = 0 THEN NULL
                ELSE FLOOR(am_cnt * 1e6 / pm_cnt + 0.5) / 1e6 END AS am_pm_ratio
    FROM (
      SELECT SUM(CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 1 ELSE 0 END) AS am_cnt,
             SUM(CASE WHEN EXTRACT(hour FROM ts) >= 12 THEN 1 ELSE 0 END) AS pm_cnt
      FROM events
      WHERE event_type IN ('click', 'view')
    )
    """,
    group="tpcds",
)
def tpcds_scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape: one-row report dividing two scalar subquery counts
    (AM vs PM activity). q90 runs two separate scalar subqueries; the fused
    plan computes both counts in a single conditional-aggregation scan and
    divides — the rewrite every TPC-DS engine applies."""
    t = load_tables(spark, sf_dir)
    ev = t.events.filter(F.col("event_type").isin("click", "view"))
    hr = F.hour("ts")
    agg = ev.agg(
        F.sum(F.when(hr < 12, 1).otherwise(0)).alias("am_cnt"),
        F.sum(F.when(hr >= 12, 1).otherwise(0)).alias("pm_cnt"),
    )
    return agg.select(
        F.when(
            F.col("pm_cnt") == 0, F.lit(None).cast("double")
        )
        .otherwise(F.floor(F.col("am_cnt") * 1e6 / F.col("pm_cnt") + F.lit(0.5)) / 1e6)
        .alias("am_pm_ratio")
    )
