"""Skew-mitigation utilities: salted aggregation and salted joins.

Reference analogs: the Blink planner's skew handling — distinct-agg split
(`SplitAggregateRule.scala`, knob `table.optimizer.distinct-agg.split.enabled`
`OptimizerConfigOptions.java:57`) and two-phase aggregation
(`TwoStageOptimizedAggregateRule.scala`). Spark's AQE covers *join* skew
automatically (`spark.sql.adaptive.skewJoin.enabled`, on in our session);
these helpers cover the cases AQE cannot re-plan:

- `salted_agg`: hot grouping keys (e.g. one key holding 10% of 100 TB) —
  adds a random-ish salt derived from a uniform column, aggregates
  (key, salt) partially, then merges per key. Two shuffles, each balanced.
- `salted_broadcast_left`: hot join keys where the small side fits in
  memory after replication — replicates the small side per salt.

Both are semantics-preserving for algebraic aggregates (sum/count/min/max)
and shown correct in tests/test_skew.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn, partial_alias) per supported aggregate.
_MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-level aggregation for skewed keys.

    ``aggs``: output_name -> (agg_fn_name, input_col) with agg_fn in
    sum/count/min/max. ``salt_source``: any roughly-uniform column to derive
    the salt from (defaults to a deterministic hash of all non-key columns'
    first, i.e. pass one explicitly for production use).
    """
    if salt_source is None:
        non_key = [c for c in df.columns if c not in keys]
        salt_source = F.col(non_key[0])
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_source), F.lit(n_salts)))

    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    merge_exprs = [
        _MERGEABLE[fn](f"__p_{out}").alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's hot keys, replicate the
    small side once per salt, join on (key, salt). Spark's AQE usually does
    this automatically; use when AQE is off or the skew is in a later stage
    AQE can't split."""
    big_s = big.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return big_s.join(F.broadcast(small_r), [on, "__salt"], how).drop("__salt")


def split_distinct_agg(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    n_buckets: int = 16,
    out_name: str | None = None,
) -> DataFrame:
    """Exact two-level COUNT(DISTINCT) for skewed grouping keys — the
    `SplitAggregateRule.scala` rewrite (knob
    `table.optimizer.distinct-agg.split.enabled`,
    `OptimizerConfigOptions.java:57`).

    Level 1 groups by (keys, hash(distinct_col) % N): bucketing by the
    DISTINCT column (not by a salt) makes each bucket's distinct-value set
    disjoint, so per-bucket distinct counts ADD exactly; level 2 sums
    them. A hot grouping key's distinct expansion is spread over N
    reducers instead of one. Both shuffles are balanced; result is exact,
    not approximate.
    """
    out = out_name or f"distinct_{distinct_col}"
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_buckets))
    partial = df.groupBy(
        *[F.col(k) for k in keys], bucket.alias("__bucket")
    ).agg(F.count_distinct(distinct_col).alias("__pd"))
    return partial.groupBy(*keys).agg(
        F.sum("__pd").cast("bigint").alias(out)
    )
