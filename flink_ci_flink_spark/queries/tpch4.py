"""TPC-H q2/q8/q11/q13/q16/q20/q21 adaptations (reduced schema).

The synthetic schema has no partsupp table, so the part-supplier relation is
derived from lineitem (`l_partkey`,`l_suppkey` pairs, unit-cost/quantity
aggregates) — the planner shapes these queries exercise (correlated min
subquery, market-share ratio over a two-level join tree, scalar-subquery
threshold, outer-join count distribution, distinct-count with NOT IN,
nested HAVING-vs-total comparison, multi-EXISTS/NOT-EXISTS self-joins) are
preserved. Reference: the TPC-H e2e kit
`flink-end-to-end-tests/flink-tpch-test/.../TpchDataGenerator.java:37` and
modified queries under `test-scripts/test-data/tpch/modified-query/`.

Money math follows the q9 rule (`tpch3.py`): per-row integer-cent
truncation before summing, so both engines sum exactly; ratios of exact
integer sums are rounded with the portable floor(x*1e6+0.5)/1e6 formula on
both sides.

Scale (100 TB): the derived ps relation aggregates lineitem with one
shuffle on (l_partkey, l_suppkey); every dimension join below it is a
broadcast; correlated mins become per-partkey window functions on the
already-shuffled relation (no second scan); the q21 EXISTS/NOT-EXISTS pair
becomes one semi- plus one anti-join, both shuffling on l_orderkey only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query

_CENT = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
               AS ps_supplycost_cents
      FROM lineitem GROUP BY 1, 2
    ), eur AS (
      SELECT p_partkey, p_name, s_acctbal, s_name, n_name, ps_supplycost_cents,
             MIN(ps_supplycost_cents) OVER (PARTITION BY p_partkey) AS min_cost
      FROM part
      JOIN ps       ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE p_size <= 12 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost_cents
    FROM eur WHERE ps_supplycost_cents = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    group="tpch",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier: correlated-min subquery decorrelated to a
    per-partkey window min over the region-filtered part-supplier relation.
    ps derives from lineitem (min unit cost in exact cents)."""
    t = load_tables(spark, sf_dir)
    ps = (
        t.lineitem.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(
                _CENT(F.col("l_extendedprice") / F.col("l_quantity"))
            ).alias("ps_supplycost_cents")
        )
    )
    part = t.part.filter((F.col("p_size") <= 12) & (F.col("p_type") == "LARGE"))
    eur_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    eur = (
        ps.join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(eur_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eur.withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "ps_supplycost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH base AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
               AS volume_cents,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           FLOOR(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume_cents ELSE 0 END)
                 * 1e6 / SUM(volume_cents) + 0.5) / 1e6 AS mkt_share
    FROM base GROUP BY o_year ORDER BY o_year
    """,
    group="tpch",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: two-level join tree (customer region filter,
    supplier nation in the numerator) with an exact-cents volume ratio."""
    t = load_tables(spark, sf_dir)
    am_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = t.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = t.orders.filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    base = (
        t.lineitem.join(
            F.broadcast(t.part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(am_nations), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _CENT(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume_cents"
            ),
            "supp_nation",
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume_cents")).otherwise(F.lit(0)))
    return (
        base.groupBy("o_year")
        .agg(
            (F.floor(num * F.lit(1e6) / F.sum("volume_cents") + F.lit(0.5)) / F.lit(1e6)).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey,
             CAST(FLOOR(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT)
               AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ), tot AS (SELECT SUM(value_cents) AS total FROM ps)
    SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM ps, tot
    GROUP BY ps_partkey, tot.total
    HAVING SUM(value_cents) > 0.002 * tot.total
    ORDER BY value_cents DESC, ps_partkey
    """,
    group="tpch",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock: per-part value vs a scalar-subquery threshold
    (fraction of the nation total). The total joins back as a 1-row
    broadcast, keeping the plan lazy and single-scan per branch."""
    t = load_tables(spark, sf_dir)
    nat_supp = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    ps = (
        t.lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            _CENT(F.col("l_extendedprice") * F.col("l_quantity")).alias("value_cents"),
        )
    )
    per_part = ps.groupBy("ps_partkey").agg(F.sum("value_cents").alias("value_cents"))
    total = per_part.agg(F.sum("value_cents").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.lit(0.002) * F.col("total"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    group="tpch",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: left outer join with an extra
    join-side predicate (the o_comment NOT LIKE of stock q13 becomes an
    order-priority filter), double aggregation."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q16_parts_supplier_relationship",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    group="tpch",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship: distinct part-supplier pairs, NOT IN
    anti-join against flagged suppliers (acctbal<0 replaces the comment
    LIKE '%Complaints%'), distinct-count aggregate."""
    t = load_tables(spark, sf_dir)
    ps = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    part = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ), part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part_total USING (l_partkey)
        WHERE qty > 0.5 * total_qty
      )
    ORDER BY s_name, s_suppkey
    """,
    group="tpch",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion: nested grouped subqueries — suppliers of
    NATION_5 who shipped more than half of a 'small%' part's 1995 volume
    (the availqty>half-of-shipments predicate of stock q20, re-expressed
    over the lineitem-derived relation). IN becomes a semi-join."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(t.part.filter(F.col("p_name").like("small%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        shipped.join(part_total, "l_partkey")
        .filter(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
    )
    nat_supp = t.supplier.join(
        F.broadcast(t.nation.filter(F.col("n_name") == "NATION_5")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        nat_supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    JOIN nation      ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_9'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    group="tpch",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting: the multi-EXISTS/NOT-EXISTS
    self-join planner path (stock q21's receipt>commit lateness becomes
    shipdate > orderdate + 60 days), decorrelated into ONE per-order
    supplier summary. Per order, g(s) = max shipdate of supplier s; then
      EXISTS(other supplier)            ⟺ n_supp > 1
      NOT EXISTS(other shipped later)   ⟺ max{g(s): s ≠ s1} <= l1.shipdate
    and max-excluding-one-group is the top-2 trick: top1.g if top1.s ≠ s1
    else top2.g (tie at the top: both hold the max, so either branch reads
    the same value). The old shape joined the FULL lineitem detail twice
    more (semi + anti, each a detail-sized shuffle on l_orderkey); the
    summary is one aggregate whose window + final pivot ride the same
    l_orderkey exchange, and lineitem executes 2 scans instead of 3."""
    t = load_tables(spark, sf_dir)
    nat_supp = t.supplier.join(
        F.broadcast(t.nation.filter(F.col("n_name") == "NATION_9")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li3 = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    # per-(order, supplier) max shipdate — the l_orderkey-only repartition
    # lets the (ok, sk) aggregate AND the per-order top-2 pivot below ride
    # ONE exchange (HashPartitioning(ok) satisfies both aggregates'
    # clustered distributions)
    g = (
        li3.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("__g"))
    )
    # top-2 per order by (g, suppkey) desc: the collect_list is bounded by
    # the order's distinct-supplier count (≤ lines per order — the same
    # per-parent bound the span/segment tables carry on one row), so the
    # buffer can never exceed one order's size at any corpus scale
    per_order = (
        g.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__n_supp"),
            F.slice(
                F.reverse(F.array_sort(F.collect_list(F.struct("__g", "l_suppkey")))),
                1,
                2,
            ).alias("__top2"),
        )
        .select(
            "l_orderkey",
            "__n_supp",
            F.col("__top2")[0]["__g"].alias("__g1"),
            F.col("__top2")[0]["l_suppkey"].alias("__s1"),
            F.element_at("__top2", 2)["__g"].alias("__g2"),
        )
    )
    l1 = (
        li3.join(
            t.orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .join(F.broadcast(nat_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "s_name")
    )
    survivors = l1.join(per_order, "l_orderkey").filter(
        (F.col("__n_supp") > 1)
        & F.when(
            F.col("__s1") != F.col("l_suppkey"),
            F.col("__g1") <= F.col("l_shipdate"),
        ).otherwise(F.col("__g2") <= F.col("l_shipdate"))
    )
    return (
        survivors.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
