"""Deterministic output sharding for training-data export.

North-star extension (training-data pipeline): a curated corpus is written
as N shards that downstream dataloaders stream independently, so shard
assignment must be (a) deterministic across reruns, (b) balanced by token
budget, (c) computable without funneling data through one node.

Two policies:

- `hash_shards` — shard = md5-derived hash(id) % n. Map-only, zero
  shuffle; at 100 TB the law of large numbers balances token totals to
  within a fraction of a percent. The default export path.

- `balanced_shards` — exact greedy round-robin by descending weight
  (longest-processing-time order): global rank r over (weight DESC, id)
  -> shard = (r - 1) % n. Ranking is computed with the distributed
  two-phase idiom, NOT a single-partition window: repartitionByRange on
  the sort key gives globally ordered partitions, each partition ranks
  locally (window partitioned by spark_partition_id), and the per-
  partition row counts — at most `spark.sql.shuffle.partitions` rows —
  are collected and broadcast back as cumulative offsets. The global rank
  (offset + local rank) depends only on the total order, not on where
  range boundaries fall, so the assignment is deterministic under any
  partitioning. Use for small N / final rebalancing passes where exact
  balance matters more than the extra range shuffle.

Reference scope note: the reference (Flink 1.11) partitions sinks by key
or round-robin per subtask (`DataStream.partitionCustom`,
`rebalance` — flink-streaming-java); the token-budget-balanced policy is
the LLM-export extension of that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Map-only deterministic shard assignment: md5(id) % n_shards."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("bigint"))


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact round-robin by descending weight via distributed ranking.

    Equivalent to ROW_NUMBER() OVER (ORDER BY weight DESC, id) -> (rn-1)
    % n_shards, but never moves the corpus to one partition: range-
    repartition on the sort key, rank within partitions, offset by the
    (tiny, collected) cumulative partition counts.
    """
    from pyspark.sql import Window

    ordered = df.repartitionByRange(
        F.col(weight_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    win = Window.partitionBy("__pid").orderBy(
        F.col(weight_col).desc(), F.col(id_col).asc()
    )
    # materialize the ranked frame ONCE: the counts collect below and the
    # returned DataFrame both read the checkpointed partitions instead of
    # re-executing the range shuffle + sort twice
    local = ordered.withColumn(
        "__lrn", F.row_number().over(win)
    ).localCheckpoint(eager=True)
    # bounded collect: one row per shuffle partition (<= 32 in tests,
    # <= a few thousand on a real cluster) — never corpus rows
    counts = {
        r["__pid"]: r["cnt"]
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[
                x
                for pid in sorted(offsets)
                for x in (F.lit(pid), F.lit(offsets[pid]))
            ]
        ),
        F.col("__pid"),
    )
    return (
        local.withColumn("__grn", off_expr + F.col("__lrn"))
        .withColumn(
            "shard", ((F.col("__grn") - 1) % n_shards).cast("bigint")
        )
        .drop("__pid", "__lrn", "__grn")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    compression: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Export with hash sharding: one parquet directory per shard
    (partitioned write -> downstream readers prune to their shard).

    Training-export knobs: ``compression`` defaults to zstd (the archival
    ratio/speed point for write-once corpora); ``max_records_per_file``
    caps rows per output file so dataloader work units stay uniform — at
    100 TB this, not partition count, is what controls shard-file
    granularity."""
    w = hash_shards(df, n_shards, id_col).write.partitionBy("shard").mode(
        "overwrite"
    ).option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def _interleave_sql(bx: str, by: str, bits: int, div: str) -> str:
    """Bit-interleave SQL text using only integer div/mod/multiply —
    identical arithmetic in Spark SQL (``div``) and DuckDB (``//``), so
    the oracle replays z-values exactly: bit i of ``bx`` lands at 2i, bit
    i of ``by`` at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"(({bx} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({by} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bounds: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Z-order (Morton) clustering key over two integer dimensions — the
    multi-dimensional data-layout pass: sorting/range-partitioning the
    output by ``zval`` co-locates rows that are close in BOTH dimensions,
    so per-file min/max statistics become tight rectangles and a scan
    with a predicate on EITHER dimension skips ~(1 - 1/2^bits) of the
    files, where a single-column sort helps only its own column.

    Each dimension is affinely quantized to ``bits`` bits from its global
    [min, max] (a map-side-combinable aggregate; the 4 bounds are a
    bounded model collect, same as the k-means centroid collects), then
    bit-interleaved with pure integer div/mod arithmetic — deterministic
    and engine-portable, no UDF. Adds ``zval`` (bigint, < 4^bits).

    Reference scope: training-data-layout extension (the reference's
    sinks partition by key hash or round-robin only —
    `DataStream.partitionCustom`); z-order is the standard lakehouse
    companion for multi-dimensional scan pruning.
    """
    top = (1 << bits) - 1
    if bounds is None:
        row = df.agg(
            F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
        ).collect()[0]
        bounds = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
    minx, maxx, miny, maxy = bounds
    out = df.withColumn(
        "__bx",
        F.expr(
            f"(({x_col} - {minx}L) * {top}L) div {max(maxx - minx, 1)}L"
        ),
    ).withColumn(
        "__by",
        F.expr(
            f"(({y_col} - {miny}L) * {top}L) div {max(maxy - miny, 1)}L"
        ),
    )
    return out.withColumn(
        "zval",
        F.expr(_interleave_sql("__bx", "__by", bits, "div")).cast("bigint"),
    ).drop("__bx", "__by")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_shards: int,
    bits: int = 8,
    bounds: tuple[int, int, int, int] | None = None,
) -> None:
    """Materialize the z-ordered layout: range-partition on ``zval`` into
    ``n_shards`` output files, sorted by ``zval`` within each, so parquet
    footer min/max stats on both source dimensions are tight per file.
    One range shuffle (sampled boundaries), then a local sort — never a
    global single-partition sort."""
    keyed = zorder_key(df, x_col, y_col, bits, bounds)
    (
        keyed.repartitionByRange(n_shards, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
