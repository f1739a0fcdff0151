"""Training-export sequence packing: concat-and-chunk documents into
fixed-size context windows.

The standard LLM pretraining export (GPT-2/3 style, Brown et al.
2005.14165 §2.3 "during training we pack multiple documents into a single
context"): documents are concatenated in a deterministic order and the
token stream is cut every ``budget`` tokens; a document that straddles a
cut contributes to both neighboring packs. The reference engine has no
such operator (its batch surface stops at SQL); this is part of the
data-pipeline surface a 100 TB curation deployment needs alongside dedup
and sampling.

Scale design: packing is SHARD-LOCAL — documents are routed to
``(source, shard)`` groups by a deterministic key hash and each group
packs independently. A global concat order would force a single total
order (one partition); shard-local packing is what production exporters
do anyway (each writer task packs its own shard), keeps every window
partition independent, and stays deterministic: the pack assignment
depends only on (hash, doc_id) order within the shard, not on
parallelism. One shuffle to the shard key, window cumsum inside the
shard, optional second shuffle for per-pack stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_ci_flink_spark.pipeline.sampling import sample_hash60


def shard_of(key: Column, n_shards: int, seed: str = "pack") -> Column:
    """Deterministic shard id in [0, n_shards) from the 60-bit key hash."""
    return F.pmod(sample_hash60(key, seed), F.lit(n_shards)).cast("int")


def pack_assignments(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: str = "pack",
) -> DataFrame:
    """Per-document pack spans: each doc gets ``(shard, first_pack,
    last_pack, start_off)`` where packs are ``budget``-token windows of the
    shard's concatenated token stream, ordered by (hash, key) within the
    ``(source, shard)`` group.

    ``start_off`` is the doc's offset in the concatenated stream;
    ``first_pack = start_off div budget``; ``last_pack = (start_off +
    n_tokens - 1) div budget`` (empty docs take their boundary pack).
    """
    h = sample_hash60(F.col(key_col), seed)
    d = docs.withColumn("__shard", shard_of(F.col(key_col), n_shards, seed))
    w = Window.partitionBy(source_col, "__shard").orderBy(h.asc(), F.col(key_col).asc())
    cum = F.sum(token_col).over(w).cast("long")
    start = (cum - F.col(token_col)).cast("long")
    b = int(budget)
    # exact long `div` (not double floor-division): packs stay correct at
    # any cumulative offset, including past 2^53
    return d.select(
        F.col(key_col),
        F.col(source_col),
        F.col("__shard").alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
        start.alias("start_off"),
        F.greatest(cum - 1, start).alias("__end"),
    ).select(
        key_col,
        source_col,
        "shard",
        "n_tokens",
        "start_off",
        F.expr(f"start_off div {b}").alias("first_pack"),
        F.expr(f"__end div {b}").alias("last_pack"),
    )


def pack_stats(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: str = "pack",
) -> DataFrame:
    """Per-pack export stats: explode each doc's pack span, then aggregate
    ``(source, shard, pack)`` → docs touching the pack and tokens landing
    in it (every non-final pack totals exactly ``budget`` — the packing
    invariant a training loader relies on).

    Plan shape: shard shuffle + in-shard window (pack_assignments), an
    explode that emits ``(last_pack - first_pack + 1)`` rows per doc
    (≈1 for docs shorter than the budget), one shuffle to the pack key.
    """
    a = pack_assignments(
        docs, budget, n_shards, source_col, key_col, token_col, seed
    )
    spans = a.select(
        source_col,
        "shard",
        "start_off",
        "n_tokens",
        F.explode(F.sequence("first_pack", "last_pack")).alias("pack"),
    )
    end = F.col("start_off") + F.col("n_tokens")
    pack_lo = F.col("pack") * budget
    pack_hi = pack_lo + budget
    tok_in_pack = F.least(end, pack_hi) - F.greatest(F.col("start_off"), pack_lo)
    return (
        spans.withColumn("__tok", F.greatest(tok_in_pack, F.lit(0)).cast("long"))
        .groupBy(source_col, "shard", "pack")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("pack_tokens"),
        )
    )
