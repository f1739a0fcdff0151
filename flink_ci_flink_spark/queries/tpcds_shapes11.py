"""TPC-DS-shaped queries, batch 11 — the five distinctive planner shapes
the round-11 verdict named as the remaining gap toward the reference's
103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`),
mapped onto the synthetic schema like batches 1-10:

- `tpcds_shape_return_lag_bands` ~ q50: the SALE-to-RETURN fact-to-fact
  join with the day lag between the two events bucketed into band
  counts — store_sales joined to store_returns on (item, ticket) with
  `return_date - sale_date` pivoted per store. Here: non-returned
  lines self-joined to returned lines on (order, part), the ship-date
  lag banded per the RETURN line's supplier nation.
- `tpcds_shape_promo_scalar_ratio` ~ q61: the promotional/total revenue
  ratio of two independently-gated scalar aggregates sharing a common
  dimension chain — fused into ONE conditional-aggregation pass (the
  promo gate rides a CASE, not a second scan), division NULLIF-guarded
  and rounded identically on both engines.
- `tpcds_shape_null_channel_union` ~ q76: the NULL-dimension-key union
  report — per channel, fact rows whose dimension lookup came back
  NULL (a real outer-join NULL, not a sentinel) counted and summed per
  year, UNION ALL across channels, grouped over the union.
- `tpcds_shape_threeway_return_ratio` ~ q83: three per-channel return
  aggregates, each gated by the SAME shared date subset (a date
  subquery reused three times), joined three-way on the item with each
  channel's share of the three-channel total. Spark side fuses the
  three channel CTEs into one conditional aggregation over one fact
  pass (the q58-family rewrite); the oracle keeps q83's literal
  three-CTE + three-way-join formulation — same answer.
- `tpcds_shape_demographic_band_lookup` ~ q84/q85: the multi-dimension
  lookup chain (fact -> orders -> customer -> nation -> region) with
  DISJUNCTIVE demographic band predicates, each disjunct tying an
  account-balance band to a quantity band (q85's household-demographic
  x sales-band OR-chains), aggregated as NULLIF-guarded rounded means
  per reason class.

Scale notes: the q50 self-join shuffles both fact sides on the same
(order, part) key — co-partitioned, no replication; q61 is one scan +
one 1-row aggregate; q76's three outer joins broadcast their restricted
dims (map-side, no shuffle before the final 15-group aggregate); q83 is
one fact pass + a broadcast date subset; q84/85 is row-side disjunction
into a 5-group aggregate. Money stays in exact integer cents; every
ratio is ROUND(x * 1.0 / NULLIF(y, 0), 6) on both engines; every ORDER
BY carries group-key-complete (deterministic) keys.
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
    "tpcds_shape_return_lag_bands",
    oracle="""
    WITH sale AS (
      SELECT l_orderkey AS ok, l_partkey AS pk, l_shipdate AS sale_d
      FROM lineitem WHERE l_returnflag <> 'R'
    ), ret AS (
      SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
             l_shipdate AS ret_d
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT n_name AS nation,
      CAST(SUM(CASE WHEN date_diff('day', sale_d, ret_d) <= 0
               THEN 1 ELSE 0 END) AS BIGINT) AS before_sale,
      CAST(SUM(CASE WHEN date_diff('day', sale_d, ret_d) BETWEEN 1 AND 30
               THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      CAST(SUM(CASE WHEN date_diff('day', sale_d, ret_d) BETWEEN 31 AND 60
               THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      CAST(SUM(CASE WHEN date_diff('day', sale_d, ret_d) BETWEEN 61 AND 90
               THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      CAST(SUM(CASE WHEN date_diff('day', sale_d, ret_d) > 90
               THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
    FROM ret
    JOIN sale ON ret.ok = sale.ok AND ret.pk = sale.pk
    JOIN supplier ON ret.sk = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
    group="tpcds",
)
def tpcds_return_lag_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50 shape: the sale-to-return day-lag band pivot — a
    fact-to-fact join (q50's store_sales x store_returns on item +
    ticket; here non-returned x returned lines on order + part) with
    the day lag between the two events bucketed into band counts per
    the return supplier's nation. Both fact sides shuffle on the SAME
    (order, part) key — co-partitioned join, no replication — and the
    dim chain broadcasts. Two fact scans are semantically required
    (two distinct fact roles, exactly q50's two fact tables). Ref:
    `TpcdsTestProgram.java:57-69` (variant 50)."""
    t = load_tables(spark, sf_dir)
    sale = t.lineitem.filter(F.col("l_returnflag") != "R").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").alias("sale_d"),
    )
    ret = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_shipdate").alias("ret_d"),
    )
    lag = F.datediff(F.col("ret_d"), F.col("sale_d"))

    def band(cond, name):
        return (
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
        )

    return (
        ret.join(sale, ["ok", "pk"])
        .join(F.broadcast(t.supplier), F.col("sk") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            band(lag <= 0, "before_sale"),
            band(lag.between(1, 30), "d30"),
            band(lag.between(31, 60), "d60"),
            band(lag.between(61, 90), "d90"),
            band(lag > 90, "d90plus"),
        )
        .orderBy("nation")
    )


@query(
    "tpcds_shape_promo_scalar_ratio",
    oracle=f"""
    WITH gated AS (
      SELECT {_CENT_SQL} AS cents, p_type
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
           AS BIGINT) AS promo_cents,
      CAST(SUM(cents) AS BIGINT) AS total_cents,
      ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) * 100.0
            / NULLIF(SUM(cents), 0), 6) AS promo_pct
    FROM gated
    """,
    group="tpcds",
)
def tpcds_promo_scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape: promotional revenue as a share of total revenue
    — q61 writes TWO independently-gated scalar subqueries (promotional
    sales / all sales, same store+customer+date chain) and divides.
    The promo gate is the only delta, so both scalars fuse into ONE
    conditional-aggregation pass over one fact scan; the division is
    NULLIF-guarded (NULL, not error, when the window is empty — the
    q61 divide contract flagged by the round-11 brief) and rounded to
    6dp identically on both engines. Ref: `TpcdsTestProgram.java:57-69`
    (variant 61)."""
    t = load_tables(spark, sf_dir)
    gated = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(
            F.broadcast(
                t.customer.filter(F.col("c_mktsegment") == "BUILDING")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select(_CENT().alias("cents"), "p_type")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0)
    )
    total = F.sum("cents")
    return gated.agg(
        promo.cast("bigint").alias("promo_cents"),
        total.cast("bigint").alias("total_cents"),
        F.round(promo * 100.0 / F.nullif(total, F.lit(0)), 6).alias(
            "promo_pct"
        ),
    )


@query(
    "tpcds_shape_null_channel_union",
    oracle=f"""
    WITH part_ch AS (
      SELECT 'part' AS channel, YEAR(l_shipdate) AS yr,
             COUNT(*) AS n_null, SUM({_CENT_SQL}) AS cents
      FROM lineitem
      LEFT JOIN (SELECT p_partkey FROM part WHERE p_size > 40) dim
        ON l_partkey = dim.p_partkey
      WHERE dim.p_partkey IS NULL
      GROUP BY 2
    ), supp_ch AS (
      SELECT 'supplier' AS channel, YEAR(l_shipdate) AS yr,
             COUNT(*) AS n_null, SUM({_CENT_SQL}) AS cents
      FROM lineitem
      LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000) dim
        ON l_suppkey = dim.s_suppkey
      WHERE dim.s_suppkey IS NULL
      GROUP BY 2
    ), cust_ch AS (
      SELECT 'customer' AS channel, YEAR(l_shipdate) AS yr,
             COUNT(*) AS n_null, SUM({_CENT_SQL}) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN (SELECT c_custkey FROM customer
                 WHERE c_mktsegment = 'BUILDING') dim
        ON o_custkey = dim.c_custkey
      WHERE dim.c_custkey IS NULL
      GROUP BY 2
    )
    SELECT channel, yr, CAST(n_null AS BIGINT) AS n_null,
           CAST(cents AS BIGINT) AS cents
    FROM (SELECT * FROM part_ch UNION ALL
          SELECT * FROM supp_ch UNION ALL
          SELECT * FROM cust_ch)
    ORDER BY channel, yr
    """,
    group="tpcds",
)
def tpcds_null_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape: the NULL-dimension-key union report — per
    channel, fact rows whose dimension lookup produced a REAL outer-join
    NULL (part lookup restricted to large sizes, supplier lookup to
    high balances, customer lookup to one segment) counted and summed
    per ship year, UNION ALL'd with channel literals and grouped over
    the union. Each branch's restricted dim BROADCASTS (left outer,
    map-side, no pre-agg shuffle); the anti-semantics stay written as
    outer-join + IS NULL because that is q76's planner shape. Ref:
    `TpcdsTestProgram.java:57-69` (variant 76)."""
    t = load_tables(spark, sf_dir)

    def channel(fact, dim, key_l, key_r, tag):
        return (
            fact.join(
                F.broadcast(dim), F.col(key_l) == F.col(key_r), "left"
            )
            .filter(F.col(key_r).isNull())
            .groupBy(F.year("l_shipdate").alias("yr"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_null"),
                F.sum(_CENT()).cast("long").alias("cents"),
            )
            .select(F.lit(tag).alias("channel"), "yr", "n_null", "cents")
        )

    part_ch = channel(
        t.lineitem,
        t.part.filter(F.col("p_size") > 40).select("p_partkey"),
        "l_partkey",
        "p_partkey",
        "part",
    )
    supp_ch = channel(
        t.lineitem,
        t.supplier.filter(F.col("s_acctbal") > 5000).select("s_suppkey"),
        "l_suppkey",
        "s_suppkey",
        "supplier",
    )
    cust_ch = channel(
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        ),
        t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey"
        ),
        "o_custkey",
        "c_custkey",
        "customer",
    )
    return (
        part_ch.unionAll(supp_ch)
        .unionAll(cust_ch)
        .orderBy("channel", "yr")
    )


@query(
    "tpcds_shape_threeway_return_ratio",
    oracle="""
    WITH shared_dates AS (
      SELECT DISTINCT o_orderdate AS d
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ), rets AS (
      SELECT l_partkey AS pk, o_orderstatus AS st,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate IN (SELECT d FROM shared_dates)
    ), ch_f AS (
      SELECT pk, SUM(q) AS qty FROM rets WHERE st = 'F' GROUP BY pk
    ), ch_o AS (
      SELECT pk, SUM(q) AS qty FROM rets WHERE st = 'O' GROUP BY pk
    ), ch_p AS (
      SELECT pk, SUM(q) AS qty FROM rets WHERE st = 'P' GROUP BY pk
    )
    SELECT ch_f.pk AS pk,
           CAST(ch_f.qty AS BIGINT) AS qty_f,
           CAST(ch_o.qty AS BIGINT) AS qty_o,
           CAST(ch_p.qty AS BIGINT) AS qty_p,
           ROUND(ch_f.qty * 100.0
                 / NULLIF(ch_f.qty + ch_o.qty + ch_p.qty, 0), 6) AS share_f,
           ROUND(ch_o.qty * 100.0
                 / NULLIF(ch_f.qty + ch_o.qty + ch_p.qty, 0), 6) AS share_o,
           ROUND(ch_p.qty * 100.0
                 / NULLIF(ch_f.qty + ch_o.qty + ch_p.qty, 0), 6) AS share_p
    FROM ch_f
    JOIN ch_o ON ch_f.pk = ch_o.pk
    JOIN ch_p ON ch_f.pk = ch_p.pk
    ORDER BY pk
    LIMIT 50
    """,
    group="tpcds",
)
def tpcds_threeway_return_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q83 shape: three per-channel return aggregates (order
    status F/O/P standing in for store/catalog/web returns), every
    channel gated by the SAME shared date subset (q83's d_week_seq
    subquery, reused across all three CTEs), three-way joined on the
    item with each channel's percentage of the three-channel total.
    q83 writes three CTEs + two joins (three fact passes); the
    Spark-first plan fuses them into ONE conditional aggregation over
    one fact pass — the three-way INNER join semantics survive as
    `min(count per channel) > 0` filters on the aggregate outputs —
    with the broadcast date subset riding the same scan. Same rows,
    one shuffle. Ref: `TpcdsTestProgram.java:57-69` (variant 83)."""
    t = load_tables(spark, sf_dir)
    shared_dates = (
        t.orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
    )
    rets = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(shared_dates),
            F.col("o_orderdate") == F.col("d"),
            "left_semi",
        )
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("o_orderstatus").alias("st"),
            F.col("l_quantity").cast("long").alias("q"),
        )
    )

    def ch(status, qty_name, n_name):
        return [
            F.sum(F.when(F.col("st") == status, F.col("q")).otherwise(0))
            .cast("long")
            .alias(qty_name),
            F.sum(F.when(F.col("st") == status, 1).otherwise(0)).alias(
                n_name
            ),
        ]

    fused = rets.groupBy("pk").agg(
        *ch("F", "qty_f", "n_f"), *ch("O", "qty_o", "n_o"),
        *ch("P", "qty_p", "n_p")
    )
    total = F.col("qty_f") + F.col("qty_o") + F.col("qty_p")
    return (
        fused.filter(
            (F.col("n_f") > 0) & (F.col("n_o") > 0) & (F.col("n_p") > 0)
        )
        .select(
            "pk",
            "qty_f",
            "qty_o",
            "qty_p",
            F.round(
                F.col("qty_f") * 100.0 / F.nullif(total, F.lit(0)), 6
            ).alias("share_f"),
            F.round(
                F.col("qty_o") * 100.0 / F.nullif(total, F.lit(0)), 6
            ).alias("share_o"),
            F.round(
                F.col("qty_p") * 100.0 / F.nullif(total, F.lit(0)), 6
            ).alias("share_p"),
        )
        .orderBy("pk")
        .limit(50)
    )


@query(
    "tpcds_shape_demographic_band_lookup",
    oracle=f"""
    SELECT o_orderpriority AS reason,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(CAST(l_quantity AS BIGINT)) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_qty,
           ROUND(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_disc_pct,
           ROUND(SUM({_CENT_SQL}) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS avg_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE l_returnflag = 'R'
      AND r_name IN ('EUROPE', 'ASIA')
      AND ((c_acctbal BETWEEN 0 AND 3000
            AND l_quantity BETWEEN 1 AND 20)
        OR (c_acctbal > 3000 AND c_acctbal <= 6000
            AND l_quantity BETWEEN 21 AND 35)
        OR (c_acctbal > 6000
            AND l_quantity BETWEEN 36 AND 50))
    GROUP BY o_orderpriority
    ORDER BY reason
    """,
    group="tpcds",
)
def tpcds_demographic_band_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-DS q84/q85 shape: the multi-dimension lookup chain (fact ->
    orders -> customer -> nation -> region, q84's income-band household
    lookup) with q85's DISJUNCTIVE band predicates — each OR-disjunct
    ties a customer account-balance band to a quantity band — over
    returned lines only, reporting NULLIF-guarded 6dp means per reason
    class (q85 reports avg quantity/fee/refund per return reason). All
    four dims broadcast; the disjunction evaluates row-side into a
    5-group aggregate — one fact scan, no unions. Ref:
    `TpcdsTestProgram.java:57-69` (variants 84, 85)."""
    t = load_tables(spark, sf_dir)
    bal = F.col("c_acctbal")
    qty = F.col("l_quantity")
    bands = (
        (bal.between(0, 3000) & qty.between(1, 20))
        | ((bal > 3000) & (bal <= 6000) & qty.between(21, 35))
        | ((bal > 6000) & qty.between(36, 50))
    )
    n = F.count(F.lit(1))
    disc_pct = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t.region.filter(F.col("r_name").isin("EUROPE", "ASIA"))
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(bands)
        .groupBy(F.col("o_orderpriority").alias("reason"))
        .agg(
            n.cast("long").alias("n_lines"),
            F.round(
                F.sum(qty.cast("long")) * 1.0 / F.nullif(n, F.lit(0)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(disc_pct) * 1.0 / F.nullif(n, F.lit(0)), 6
            ).alias("avg_disc_pct"),
            F.round(
                F.sum(_CENT()) * 1.0 / F.nullif(n, F.lit(0)), 6
            ).alias("avg_cents"),
        )
        .orderBy("reason")
    )
