"""TPC-DS-shaped queries, batch 5 — four more distinctive planner shapes
toward the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`),
mapped onto the synthetic schema like batches 1-4:

- `tpcds_shape_cov_pair` ~ q39: per-(supplier, month) coefficient of
  variation of quantity, self-joined on CONSECUTIVE months where BOTH
  sides exceed the CV threshold — the inventory "unstable demand" pair
  report. CV > 0.3 is evaluated entirely in integer moments
  (100·n·(n·Σq² − (Σq)²) > 9·(Σq)²·(n−1) — sample variance
  cross-multiplied), so the pair SET is exact.
- `tpcds_shape_rank_position_join` ~ q44: best-sellers and worst-sellers
  ranked independently, then joined ON RANK POSITION (rank i's best vs
  rank i's worst) — two TakeOrdered branches meeting on a tiny key.
- `tpcds_shape_week_over_year` ~ q2/q59: day-of-week pivot per ISO week,
  self-joined with the SAME week one year later, keeping weeks whose
  Sunday revenue grew — the classic calendar-aligned self-join.
- `tpcds_shape_order_count_exists` ~ q16/q94: COUNT(DISTINCT orders) +
  revenue over orders with lines from >= 2 suppliers (correlated EXISTS
  on a different key) and NO returned line (NOT EXISTS) in a date band.

Scale notes: the CV aggregate is one partial-aggregable groupBy on
(supplier, month) — pair join on month+1 is key-local; q44's two rankings
are distributed TakeOrdered (limit 10) joined on a 10-row key; the
week-over-year join keys on (year, week) — hundreds of groups; q16's
EXISTS/NOT EXISTS decorrelate to per-order aggregates (one shuffle on
orderkey), and the final distinct-count is over the surviving key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731
_CENT_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


@query(
    "tpcds_shape_cov_pair",
    oracle="""
    WITH m AS (
      SELECT l_suppkey,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS sq2
      FROM lineitem
      WHERE year(l_shipdate) = 1997
      GROUP BY 1, 2
    ), flagged AS (
      SELECT * FROM m
      WHERE n > 1 AND 100 * n * (n * sq2 - sq * sq) > 9 * sq * sq * (n - 1)
    )
    SELECT a.l_suppkey AS suppkey,
           a.ym AS ym1, b.ym AS ym2,
           a.n AS n1, a.sq AS sq1, a.sq2 AS sq21,
           b.n AS n2, b.sq AS sq2_, b.sq2 AS sq22
    FROM flagged a
    JOIN flagged b
      ON a.l_suppkey = b.l_suppkey AND b.ym = a.ym + 1
    ORDER BY suppkey, ym1
    """,
    group="tpcds",
)
def tpcds_cov_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape (inventory coefficient-of-variation pairs): per
    (supplier, month) quantity moments; months where sample-CV > 0.3 —
    cross-multiplied into exact integer moments so no stdev/sqrt float ever
    materializes — self-joined on the consecutive month. One
    partial-aggregable groupBy, then a key-local join on (supplier,
    month+1). Ref: `TpcdsTestProgram.java:57-69` (variants 39a/39b)."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity").cast("long")
    m = (
        t.lineitem.filter(F.year("l_shipdate") == 1997)
        .groupBy(
            "l_suppkey",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ym"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q).cast("long").alias("sq"),
            F.sum(q * q).cast("long").alias("sq2"),
        )
    )
    flagged = m.filter(
        (F.col("n") > 1)
        & (
            100 * F.col("n") * (F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq"))
            > 9 * F.col("sq") * F.col("sq") * (F.col("n") - 1)
        )
    )
    a, b = flagged.alias("a"), flagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("b.ym") == F.col("a.ym") + 1),
        )
        .select(
            F.col("a.l_suppkey").alias("suppkey"),
            F.col("a.ym").alias("ym1"),
            F.col("b.ym").alias("ym2"),
            F.col("a.n").alias("n1"),
            F.col("a.sq").alias("sq1"),
            F.col("a.sq2").alias("sq21"),
            F.col("b.n").alias("n2"),
            F.col("b.sq").alias("sq2_"),
            F.col("b.sq2").alias("sq22"),
        )
        .orderBy("suppkey", "ym1")
    )


@query(
    "tpcds_shape_rank_position_join",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ), best AS (
      SELECT l_partkey, cents,
             row_number() OVER (ORDER BY cents DESC, l_partkey ASC) AS rnk
      FROM rev
    ), worst AS (
      SELECT l_partkey, cents,
             row_number() OVER (ORDER BY cents ASC, l_partkey ASC) AS rnk
      FROM rev
    )
    SELECT CAST(b.rnk AS BIGINT) AS rnk,
           b.l_partkey AS best_part, b.cents AS best_cents,
           w.l_partkey AS worst_part, w.cents AS worst_cents
    FROM best b JOIN worst w ON b.rnk = w.rnk
    WHERE b.rnk <= 10
    ORDER BY rnk
    """,
    group="tpcds",
)
def tpcds_rank_position_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 shape (best/worst performers joined ON RANK POSITION):
    part revenue ranked ascending and descending independently, rank i's
    best joined to rank i's worst. Executed as two distributed TakeOrdered
    top-10s (sort+limit, never a global window over the full part set)
    meeting on a 10-row join key. Ref: `TpcdsTestProgram.java:57-69`
    (variant 44)."""
    t = load_tables(spark, sf_dir)
    rev = t.lineitem.groupBy("l_partkey").agg(
        F.sum(_CENT(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("cents")
    )
    top_b = rev.orderBy(F.col("cents").desc(), F.col("l_partkey").asc()).limit(10)
    top_w = rev.orderBy(F.col("cents").asc(), F.col("l_partkey").asc()).limit(10)
    wb = Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
    ww = Window.orderBy(F.col("cents").asc(), F.col("l_partkey").asc())
    best = top_b.select(
        F.row_number().over(wb).cast("long").alias("rnk"),
        F.col("l_partkey").alias("best_part"),
        F.col("cents").alias("best_cents"),
    )
    worst = top_w.select(
        F.row_number().over(ww).cast("long").alias("rnk"),
        F.col("l_partkey").alias("worst_part"),
        F.col("cents").alias("worst_cents"),
    )
    return (
        best.join(F.broadcast(worst), "rnk")
        .select("rnk", "best_part", "best_cents", "worst_part", "worst_cents")
        .orderBy("rnk")
    )


@query(
    "tpcds_shape_week_over_year",
    oracle=f"""
    WITH li AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
             CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
             {_CENT_SQL} AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE year(o_orderdate) IN (1997, 1998)
        AND weekofyear(o_orderdate) BETWEEN 2 AND 50
    ), wkagg AS (
      SELECT yr, wk,
             CAST(SUM(CASE WHEN dow = 1 THEN cents ELSE 0 END) AS BIGINT) AS sun,
             CAST(SUM(CASE WHEN dow = 2 THEN cents ELSE 0 END) AS BIGINT) AS mon,
             CAST(SUM(CASE WHEN dow = 7 THEN cents ELSE 0 END) AS BIGINT) AS sat
      FROM li GROUP BY yr, wk
    )
    SELECT a.wk AS wk,
           a.sun AS sun1, b.sun AS sun2,
           a.mon AS mon1, b.mon AS mon2,
           a.sat AS sat1, b.sat AS sat2
    FROM wkagg a
    JOIN wkagg b ON b.wk = a.wk AND a.yr = 1997 AND b.yr = 1998
    WHERE b.sun > a.sun
    ORDER BY wk
    """,
    group="tpcds",
)
def tpcds_week_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2/q59 shape (day-of-week pivot self-joined across a one-year
    calendar shift): per (year, ISO week) conditional-sum pivot of revenue
    into weekday columns, week w of 1997 joined to week w of 1998, keeping
    weeks whose Sunday revenue grew. Weeks 2-50 only, so ISO-week/calendar-
    year boundary rows can't differ between engines. Both years pivot out
    of ONE partial-aggregable week-keyed groupBy (presence flags replace
    the calendar self-join — one fact pass instead of two). Ref:
    `TpcdsTestProgram.java:57-69` (variants 2, 59)."""
    t = load_tables(spark, sf_dir)
    li = (
        t.lineitem.join(
            t.orders, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .filter(
            F.year("o_orderdate").isin(1997, 1998)
            & F.weekofyear("o_orderdate").between(2, 50)
        )
        .select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.weekofyear("o_orderdate").cast("long").alias("wk"),
            F.dayofweek("o_orderdate").cast("long").alias("dow"),
            _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "cents"
            ),
        )
    )
    # The calendar self-join is folded into ONE week-keyed pivot: the
    # (yr, wk) aggregate was keyed 1:1 per year slice, so joining week w
    # of 1997 to week w of 1998 equals pivoting both years' weekday sums
    # into one row and keeping weeks present in BOTH years (presence =
    # conditional max over the year). The two filtered aggregate branches
    # otherwise re-executed the fact join (executed scans lineitem:2,
    # orders:2 -> 1 each; guide §2.4).
    def dsum(y, d, name):
        return (
            F.sum(
                F.when(
                    (F.col("yr") == y) & (F.col("dow") == d), F.col("cents")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(name)
        )

    def present(y, name):
        return F.max(
            F.when(F.col("yr") == y, F.lit(1)).otherwise(F.lit(0))
        ).alias(name)

    wk_pivot = li.groupBy("wk").agg(
        dsum(1997, 1, "sun1"), dsum(1998, 1, "sun2"),
        dsum(1997, 2, "mon1"), dsum(1998, 2, "mon2"),
        dsum(1997, 7, "sat1"), dsum(1998, 7, "sat2"),
        present(1997, "__a"), present(1998, "__b"),
    )
    return (
        wk_pivot.filter(
            (F.col("__a") == 1)
            & (F.col("__b") == 1)
            & (F.col("sun2") > F.col("sun1"))
        )
        .select("wk", "sun1", "sun2", "mon1", "mon2", "sat1", "sat2")
        .orderBy("wk")
    )


@query(
    "tpcds_shape_order_count_exists",
    oracle=f"""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ret,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS order_count,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM orders JOIN per_order ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1997
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND n_supp >= 2
      AND n_ret = 0
    """,
    group="tpcds",
)
def tpcds_order_count_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16/q94 shape (distinct-order count under EXISTS on a
    different key + NOT EXISTS returns): urgent 1997 orders whose lines
    come from >= 2 distinct suppliers (the correlated EXISTS "shipped from
    another warehouse", decorrelated to a per-order distinct count) and
    with NO returned line (the NOT EXISTS, decorrelated to a zero-count).
    One shuffle on orderkey for the per-order aggregate; the date/priority
    filters push to the orders scan; final 1-row rollup. Ref:
    `TpcdsTestProgram.java:57-69` (variants 16, 94)."""
    t = load_tables(spark, sf_dir)
    per_order = t.lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_ret"),
        F.sum(_CENT(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("cents"),
    )
    return (
        t.orders.filter(
            (F.year("o_orderdate") == 1997)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .join(per_order, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 0))
        .agg(
            F.count(F.lit(1)).cast("long").alias("order_count"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


@query(
    "tpcds_shape_band_distinct_stats",
    oracle=f"""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, {_CENT_SQL} AS cents
      FROM lineitem
    )
    SELECT
      CAST(COUNT(CASE WHEN q BETWEEN 1 AND 15 THEN 1 END) AS BIGINT) AS n1,
      CAST(COUNT(DISTINCT CASE WHEN q BETWEEN 1 AND 15 THEN q END)
           AS BIGINT) AS d1,
      CAST(SUM(CASE WHEN q BETWEEN 1 AND 15 THEN cents ELSE 0 END)
           AS BIGINT) AS c1,
      CAST(COUNT(CASE WHEN q BETWEEN 16 AND 30 THEN 1 END) AS BIGINT) AS n2,
      CAST(COUNT(DISTINCT CASE WHEN q BETWEEN 16 AND 30 THEN q END)
           AS BIGINT) AS d2,
      CAST(SUM(CASE WHEN q BETWEEN 16 AND 30 THEN cents ELSE 0 END)
           AS BIGINT) AS c2,
      CAST(COUNT(CASE WHEN q BETWEEN 31 AND 50 THEN 1 END) AS BIGINT) AS n3,
      CAST(COUNT(DISTINCT CASE WHEN q BETWEEN 31 AND 50 THEN q END)
           AS BIGINT) AS d3,
      CAST(SUM(CASE WHEN q BETWEEN 31 AND 50 THEN cents ELSE 0 END)
           AS BIGINT) AS c3
    FROM li
    """,
    group="tpcds",
)
def tpcds_band_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q28 shape: one row of per-band (count, COUNT DISTINCT, sum)
    stats — q88's fused-scan twist plus the DISTINCT aggregates that force
    the planner's expand/partial-distinct machinery (Spark rewrites the
    three distinct conditions into one Expand + two-stage aggregate; the
    reference runs six separate scans). Ref: `TpcdsTestProgram.java:57-69`
    (variant 28)."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity").cast("long")
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li = t.lineitem.select(q.alias("q"), cents.alias("cents"))

    def band(lo, hi, i):
        inb = F.col("q").between(lo, hi)
        return [
            F.count(F.when(inb, F.lit(1))).cast("long").alias(f"n{i}"),
            F.countDistinct(F.when(inb, F.col("q"))).cast("long").alias(f"d{i}"),
            F.sum(F.when(inb, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"c{i}"),
        ]

    return li.agg(*(band(1, 15, 1) + band(16, 30, 2) + band(31, 50, 3)))


@query(
    "tpcds_shape_yoy_net_decline",
    oracle=f"""
    WITH net AS (
      SELECT p_brand,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN -CAST(l_quantity AS BIGINT)
                           ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
               AS net_qty,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -{_CENT_SQL}
                           ELSE {_CENT_SQL} END) AS BIGINT) AS net_cents
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey
      WHERE year(o_orderdate) IN (1997, 1998)
      GROUP BY 1, 2
    )
    SELECT a.p_brand AS brand,
           a.net_qty AS qty1, b.net_qty AS qty2,
           a.net_cents AS cents1, b.net_cents AS cents2
    FROM net a
    JOIN net b ON a.p_brand = b.p_brand AND a.yr = 1997 AND b.yr = 1998
    WHERE b.net_qty < a.net_qty
    ORDER BY brand
    """,
    group="tpcds",
)
def tpcds_yoy_net_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape (year-over-year decline NET OF RETURNS): per-brand
    yearly quantity/revenue where returned lines SUBTRACT (q75's
    sales-minus-returns union folded into one signed conditional
    aggregate), and both years pivoted out of ONE brand-keyed aggregate
    (presence flags replace the decline self-join — one fact pass instead
    of two) keeping brands whose net quantity declined. Ref:
    `TpcdsTestProgram.java:57-69` (variants 75, 74)."""
    t = load_tables(spark, sf_dir)
    qty = F.col("l_quantity").cast("long")
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    sign = F.when(F.col("l_returnflag") == "R", F.lit(-1)).otherwise(F.lit(1))
    # Year self-join folded into ONE brand-keyed pivot (the (brand, yr)
    # aggregate is 1:1 per year slice, so the decline join equals pivoting
    # both years into one row and keeping brands present in both years) —
    # the two filtered branches otherwise re-executed the three-table fact
    # join (executed scans lineitem/orders:2 -> 1 each; guide §2.4).
    yr = F.year("o_orderdate")

    def ysum(y, expr, name):
        return (
            F.sum(F.when(yr == y, expr).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
        )

    def present(y, name):
        return F.max(F.when(yr == y, F.lit(1)).otherwise(F.lit(0))).alias(name)

    pivot = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(yr.isin(1997, 1998))
        .groupBy("p_brand")
        .agg(
            ysum(1997, sign * qty, "qty1"),
            ysum(1998, sign * qty, "qty2"),
            ysum(1997, sign * cents, "cents1"),
            ysum(1998, sign * cents, "cents2"),
            present(1997, "__a"),
            present(1998, "__b"),
        )
    )
    return (
        pivot.filter(
            (F.col("__a") == 1)
            & (F.col("__b") == 1)
            & (F.col("qty2") < F.col("qty1"))
        )
        .select(
            F.col("p_brand").alias("brand"), "qty1", "qty2", "cents1", "cents2"
        )
        .orderBy("brand")
    )


@query(
    "tpcds_shape_delay_band_pivot",
    oracle="""
    SELECT o_orderpriority AS priority,
      CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
               THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                    BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                    BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
               THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    group="tpcds",
)
def tpcds_delay_band_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q62/q99 shape (fulfillment-latency band pivot): the
    order-to-ship delay in days bucketed into 30/60/90/90+ bands and
    pivoted as conditional counts per priority class (the synthetic
    schema's ship-mode analogue) — date ARITHMETIC feeding the CASE
    pivot, not calendar columns. One partial-aggregable groupBy over 5
    groups; the day-diff is computed in the scan projection. Ref:
    `TpcdsTestProgram.java:57-69` (variants 62, 99)."""
    t = load_tables(spark, sf_dir)
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond, name):
        return (
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
        )

    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            band(d <= 30, "d30"),
            band(d.between(31, 60), "d60"),
            band(d.between(61, 90), "d90"),
            band(d > 90, "d90plus"),
        )
        .orderBy("priority")
    )


@query(
    "tpcds_shape_conditional_scalar_report",
    oracle=f"""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, {_CENT_SQL} AS cents,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS full_cents
      FROM lineitem
    )
    SELECT
      CASE WHEN COUNT(CASE WHEN q BETWEEN 1 AND 15 THEN 1 END) > 1000
           THEN CAST(FLOOR(SUM(CASE WHEN q BETWEEN 1 AND 15
                                    THEN full_cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 1 AND 15 THEN 1 END)) AS BIGINT)
           ELSE CAST(FLOOR(SUM(CASE WHEN q BETWEEN 1 AND 15
                                    THEN cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 1 AND 15 THEN 1 END)) AS BIGINT)
      END AS r1,
      CASE WHEN COUNT(CASE WHEN q BETWEEN 16 AND 30 THEN 1 END) > 1000
           THEN CAST(FLOOR(SUM(CASE WHEN q BETWEEN 16 AND 30
                                    THEN full_cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 16 AND 30 THEN 1 END)) AS BIGINT)
           ELSE CAST(FLOOR(SUM(CASE WHEN q BETWEEN 16 AND 30
                                    THEN cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 16 AND 30 THEN 1 END)) AS BIGINT)
      END AS r2,
      CASE WHEN COUNT(CASE WHEN q BETWEEN 31 AND 50 THEN 1 END) > 1000
           THEN CAST(FLOOR(SUM(CASE WHEN q BETWEEN 31 AND 50
                                    THEN full_cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 31 AND 50 THEN 1 END)) AS BIGINT)
           ELSE CAST(FLOOR(SUM(CASE WHEN q BETWEEN 31 AND 50
                                    THEN cents ELSE 0 END) * 1.0
                / COUNT(CASE WHEN q BETWEEN 31 AND 50 THEN 1 END)) AS BIGINT)
      END AS r3
    FROM li
    """,
    group="tpcds",
)
def tpcds_conditional_scalar_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 shape (the CASE-of-scalar-subqueries report): per quantity
    band, IF the band's row count clears a threshold report its mean FULL
    price, ELSE its mean DISCOUNTED price — q9's fifteen scalar subqueries
    fused into ONE scan of conditional aggregates feeding the CASE
    expressions (floor'd rational means: bigint/bigint double division is
    IEEE correctly-rounded, so the report is engine-exact). Ref:
    `TpcdsTestProgram.java:57-69` (variant 9)."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity").cast("long")
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    full = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    li = t.lineitem.select(
        q.alias("q"), cents.alias("cents"), full.alias("full_cents")
    )

    def report(lo, hi, name):
        inb = F.col("q").between(lo, hi)
        n = F.count(F.when(inb, F.lit(1)))
        sfull = F.sum(F.when(inb, F.col("full_cents")).otherwise(F.lit(0)))
        sdisc = F.sum(F.when(inb, F.col("cents")).otherwise(F.lit(0)))
        return (
            F.when(n > 1000, F.floor(sfull * F.lit(1.0) / n))
            .otherwise(F.floor(sdisc * F.lit(1.0) / n))
            .cast("long")
            .alias(name)
        )

    return li.agg(
        report(1, 15, "r1"), report(16, 30, "r2"), report(31, 50, "r3")
    )


@query(
    "tpcds_shape_disjunctive_in",
    oracle=f"""
    WITH big_buyers AS (
      SELECT o_custkey
      FROM orders
      GROUP BY o_custkey
      HAVING SUM(o_totalprice) > 1000000
    )
    SELECT n_name,
           CAST(SUM({_CENT_SQL}) AS BIGINT) AS sales_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE n_name IN ('FRANCE', 'GERMANY', 'JAPAN')
       OR o_custkey IN (SELECT o_custkey FROM big_buyers)
    GROUP BY n_name
    ORDER BY n_name
    """,
    group="tpcds",
)
def tpcds_disjunctive_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 shape (a LITERAL IN-list OR'd with a SUBQUERY IN): keep
    rows in a fixed dimension set OR whose key appears in a derived set —
    the disjunction defeats simple pushdown (neither branch alone filters
    the scan), so the planner must evaluate the literal branch post-join
    and the subquery branch as a join against the derived key set. Spark
    expresses the subquery side as a left-semi flag join (broadcast — the
    big-buyer set is aggregate-bounded) and the disjunction as one filter.
    Ref: `TpcdsTestProgram.java:57-69` (variant 45)."""
    t = load_tables(spark, sf_dir)
    big = (
        t.orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("__tot"))
        .filter(F.col("__tot") > 1000000)
        .select("o_custkey", F.lit(1).alias("__big"))
    )
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(big), "o_custkey", "left")
        .filter(
            F.col("n_name").isin("FRANCE", "GERMANY", "JAPAN")
            | F.col("__big").isNotNull()
        )
        .groupBy("n_name")
        .agg(
            F.sum(cents).cast("long").alias("sales_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "tpcds_shape_deviation_with_neighbors",
    oracle=f"""
    WITH m AS (
      SELECT l_suppkey,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem
      WHERE year(l_shipdate) = 1997
      GROUP BY 1, 2
    ), y AS (
      SELECT l_suppkey, CAST(SUM(cents) AS BIGINT) AS ytot,
             CAST(COUNT(*) AS BIGINT) AS nmon
      FROM m GROUP BY 1
    ), w AS (
      SELECT m.*,
             lag(cents)  OVER (PARTITION BY l_suppkey ORDER BY ym) AS prev_c,
             lead(cents) OVER (PARTITION BY l_suppkey ORDER BY ym) AS next_c
      FROM m
    )
    SELECT w.l_suppkey AS suppkey, w.ym, w.cents,
           CAST(COALESCE(w.prev_c, -1) AS BIGINT) AS prev_cents,
           CAST(COALESCE(w.next_c, -1) AS BIGINT) AS next_cents,
           y.ytot, y.nmon
    FROM w JOIN y ON y.l_suppkey = w.l_suppkey
    WHERE 10 * ABS(w.cents * y.nmon - y.ytot) > y.ytot
    ORDER BY suppkey, ym
    """,
    group="tpcds",
)
def tpcds_deviation_with_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q57 shape (months deviating from the yearly mean,
    reported WITH their lag/lead neighbor months): monthly revenue per
    supplier, the supplier-year aggregate joined back, months whose
    deviation from the mean exceeds 10% kept — the mean comparison
    cross-multiplied to exact integers (|m·nmon − Y|·10 > Y, no division)
    — each with its previous/next month via window lag/lead (NULL edges
    coalesced to -1 on both engines). One groupBy + one key-local window
    + a broadcast-sized year join. Ref: `TpcdsTestProgram.java:57-69`
    (variants 47, 57)."""
    t = load_tables(spark, sf_dir)
    cents = _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    m = (
        t.lineitem.filter(F.year("l_shipdate") == 1997)
        .groupBy(
            "l_suppkey",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ym"),
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    y = m.groupBy("l_suppkey").agg(
        F.sum("cents").cast("long").alias("ytot"),
        F.count(F.lit(1)).cast("long").alias("nmon"),
    )
    wspec = Window.partitionBy("l_suppkey").orderBy("ym")
    w = m.select(
        "l_suppkey",
        "ym",
        "cents",
        F.coalesce(F.lag("cents").over(wspec), F.lit(-1))
        .cast("long")
        .alias("prev_cents"),
        F.coalesce(F.lead("cents").over(wspec), F.lit(-1))
        .cast("long")
        .alias("next_cents"),
    )
    return (
        w.join(F.broadcast(y), "l_suppkey")
        .filter(
            10 * F.abs(F.col("cents") * F.col("nmon") - F.col("ytot"))
            > F.col("ytot")
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "ym",
            "cents",
            "prev_cents",
            "next_cents",
            "ytot",
            "nmon",
        )
        .orderBy("suppkey", "ym")
    )
