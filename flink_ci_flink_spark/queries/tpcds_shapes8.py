"""TPC-DS-shaped queries, batch 8 — three more distinctive planner shapes
from the reference's 103-variant bar
(`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:57-69`),
mapped onto the synthetic schema like batches 1-7:

- `tpcds_shape_dual_ratio_ranks` ~ q49: per-channel "worst return ratio"
  report ranked by TWO different ratios (quantity ratio and amount
  ratio), keeping items in the top-10 of EITHER ranking. The ratios are
  divisions of exact integer sums (IEEE-identical in both engines) used
  ONLY as ordering keys with a deterministic id tie-break; everything
  emitted is an integer.
- `tpcds_shape_below_supplier_avg` ~ q65: the cross-LEVEL aggregate
  compare — per (supplier, part) revenue kept when it falls at or below
  10% of that supplier's AVERAGE per-part revenue; `rev <= 0.1 * avg`
  is `10 * rev * n <= total` cross-multiplied over a supplier window,
  exact.
- `tpcds_shape_top_region_rollup` ~ q70: rank-in-rollup with a RANKED
  SUBQUERY driving the partition filter — the top-2 regions by total
  revenue are computed first (dense ranked, deterministic), the fact is
  LEFT SEMI joined to them, and the surviving rows roll up through
  ROLLUP(region, nation) with GROUPING()-aware lochierarchy ranks.

Scale notes: q49's two window ranks share one (channel) partitioning
after a single (channel, part) aggregate; q65 is one groupBy plus a
key-local supplier window (dims broadcast); q70's ranked subquery is a
5-row aggregate (regions) broadcast back as a semi-join — the rollup
itself is Spark's native partial-aggregable rollup.
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
    "tpcds_shape_dual_ratio_ranks",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_pri,
             l_partkey AS partkey,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS ret_qty,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_qty,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_CENT_SQL}
                           ELSE 0 END) AS BIGINT) AS ret_cents,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS sold_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) = 1996
      GROUP BY 1, 2
      HAVING SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
    ), ranked AS (
      SELECT is_pri, partkey, ret_qty, sold_qty, ret_cents, sold_cents,
             ROW_NUMBER() OVER (PARTITION BY is_pri
               ORDER BY ret_qty * 1.0 / sold_qty DESC, partkey ASC)
               AS qty_rank,
             ROW_NUMBER() OVER (PARTITION BY is_pri
               ORDER BY ret_cents * 1.0 / sold_cents DESC, partkey ASC)
               AS amt_rank
      FROM base
    )
    SELECT CASE WHEN is_pri THEN 'pri' ELSE 'std' END AS channel,
           partkey, ret_qty, sold_qty, ret_cents, sold_cents,
           CAST(qty_rank AS BIGINT) AS qty_rank,
           CAST(amt_rank AS BIGINT) AS amt_rank
    FROM ranked
    WHERE qty_rank <= 10 OR amt_rank <= 10
    ORDER BY channel, partkey
    """,
    group="tpcds",
)
def tpcds_dual_ratio_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: per-channel worst-returns report ranked by TWO
    ratios (returned/sold quantity and returned/sold amount) with a
    top-10-of-EITHER keep. The ratio divisions (exact integer sums cast
    to double) are ordering keys only — IEEE division is identical in
    both engines, and partkey breaks ties deterministically; both window
    ranks reuse ONE (channel) partitioning after a single aggregate.
    Ref: `TpcdsTestProgram.java:57-69` (variant 49)."""
    t = load_tables(spark, sf_dir)
    ret = F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("o_orderdate") == 1996)
        .groupBy(
            F.col("o_orderpriority").isin(*_PRI).alias("is_pri"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(ret * F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("ret_qty"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sold_qty"),
            F.sum(ret * _CENT()).cast("long").alias("ret_cents"),
            F.sum(_CENT()).cast("long").alias("sold_cents"),
        )
        .filter(F.col("ret_qty") > 0)
    )
    w_qty = Window.partitionBy("is_pri").orderBy(
        (F.col("ret_qty").cast("double") / F.col("sold_qty")).desc(),
        F.col("partkey").asc(),
    )
    w_amt = Window.partitionBy("is_pri").orderBy(
        (F.col("ret_cents").cast("double") / F.col("sold_cents")).desc(),
        F.col("partkey").asc(),
    )
    ranked = base.select(
        "*",
        F.row_number().over(w_qty).cast("long").alias("qty_rank"),
        F.row_number().over(w_amt).cast("long").alias("amt_rank"),
    )
    return (
        ranked.filter((F.col("qty_rank") <= 10) | (F.col("amt_rank") <= 10))
        .select(
            F.when(F.col("is_pri"), F.lit("pri")).otherwise(F.lit("std")).alias(
                "channel"
            ),
            "partkey",
            "ret_qty",
            "sold_qty",
            "ret_cents",
            "sold_cents",
            "qty_rank",
            "amt_rank",
        )
        .orderBy("channel", "partkey")
    )


@query(
    "tpcds_shape_below_supplier_avg",
    oracle=f"""
    WITH sp AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             CAST(SUM({_CENT_SQL}) AS BIGINT) AS cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ), w AS (
      SELECT suppkey, partkey, cents,
             CAST(SUM(cents) OVER (PARTITION BY suppkey) AS BIGINT) AS total,
             CAST(COUNT(*) OVER (PARTITION BY suppkey) AS BIGINT) AS n_parts
      FROM sp
    )
    SELECT s_name, w.partkey, cents, total, n_parts
    FROM w JOIN supplier ON w.suppkey = s_suppkey
    WHERE 10 * cents * n_parts <= total
    ORDER BY s_name, w.partkey
    """,
    group="tpcds",
)
def tpcds_below_supplier_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: the cross-LEVEL aggregate compare — (supplier,
    part) revenue kept when at or below 10% of the supplier's AVERAGE
    per-part revenue, i.e. `10 * rev * n <= total` cross-multiplied over
    a supplier partition window (no division, no rescan of the fact —
    q65's min-of-avg subquery fuses to the window). Supplier dim
    broadcast for the name. Ref: `TpcdsTestProgram.java:57-69`
    (variant 65)."""
    t = load_tables(spark, sf_dir)
    sp = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.sum(_CENT()).cast("long").alias("cents"))
    )
    w = Window.partitionBy("suppkey")
    scored = sp.select(
        "*",
        F.sum("cents").over(w).cast("long").alias("total"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_parts"),
    ).filter(10 * F.col("cents") * F.col("n_parts") <= F.col("total"))
    return (
        scored.join(
            F.broadcast(t.supplier), F.col("suppkey") == F.col("s_suppkey")
        )
        .select("s_name", "partkey", "cents", "total", "n_parts")
        .orderBy("s_name", "partkey")
    )


@query(
    "tpcds_shape_top_region_rollup",
    oracle=f"""
    WITH fact AS (
      SELECT r_name AS region, n_name AS nation, {_CENT_SQL} AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE year(o_orderdate) = 1996
    ), top_regions AS (
      SELECT region FROM (
        SELECT region,
               ROW_NUMBER() OVER (ORDER BY SUM(cents) DESC, region ASC) AS rr
        FROM fact GROUP BY region) t
      WHERE rr <= 2
    ), rolled AS (
      SELECT region, nation,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(GROUPING(region) * 2 + GROUPING(nation) AS BIGINT)
               AS lochierarchy
      FROM fact
      WHERE region IN (SELECT region FROM top_regions)
      GROUP BY ROLLUP(region, nation)
    )
    SELECT region, nation, cents, lochierarchy,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN lochierarchy = 0 THEN region END
             ORDER BY cents DESC, nation ASC NULLS FIRST,
                      region ASC NULLS FIRST) AS BIGINT)
             AS rank_within_parent
    FROM rolled
    ORDER BY lochierarchy DESC, region NULLS FIRST, nation NULLS FIRST
    """,
    group="tpcds",
)
def tpcds_top_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q70 shape: rank-in-rollup with a RANKED-SUBQUERY partition
    filter — the top-2 regions by total revenue come from a tiny ranked
    aggregate (broadcast back as a LEFT SEMI join), the surviving fact
    rolls up through ROLLUP(region, nation), and each rollup level ranks
    within its parent (GROUPING()-derived lochierarchy, deterministic
    tie-breaks). Ref: `TpcdsTestProgram.java:57-69` (variant 70)."""
    t = load_tables(spark, sf_dir)
    fact = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .filter(F.year("o_orderdate") == 1996)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            _CENT().alias("cents"),
        )
    )
    # Pre-aggregate the fact chain ONCE to (region, nation) partials —
    # sum is associative, so the rollup over the partials and the top-2
    # region ranking are both exactly the originals, but the six-way fact
    # join no longer executes once per consumer (executed scans
    # lineitem/orders:2 -> 1 each). The partial table is region x nation
    # rows, checkpointed so both consumers read the materialized copy.
    base = (
        fact.groupBy("region", "nation")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint(eager=True)
    )
    top = (
        base.groupBy("region")
        .agg(F.sum("cents").alias("tot"))
        .select(
            "region",
            F.row_number()
            .over(Window.orderBy(F.col("tot").desc(), F.col("region").asc()))
            .alias("rr"),
        )
        .filter(F.col("rr") <= 2)
        .select("region")
    )
    rolled = (
        base.join(F.broadcast(top), "region", "left_semi")
        .rollup("region", "nation")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            (F.grouping("region") * 2 + F.grouping("nation"))
            .cast("long")
            .alias("lochierarchy"),
        )
    )
    # region is the FINAL tie-break: in the lochierarchy=1 partition
    # nation is NULL on every row, so a cents tie between the two
    # surviving regions would otherwise make row_number nondeterministic
    # in both engines (round-10 ADVICE item #4).
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("region")),
    ).orderBy(
        F.col("cents").desc(),
        F.col("nation").asc_nulls_first(),
        F.col("region").asc_nulls_first(),
    )
    return rolled.select(
        "region",
        "nation",
        "cents",
        "lochierarchy",
        F.row_number().over(w).cast("long").alias("rank_within_parent"),
    ).orderBy(
        F.col("lochierarchy").desc(),
        F.col("region").asc_nulls_first(),
        F.col("nation").asc_nulls_first(),
    )
