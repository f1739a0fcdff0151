"""Deterministic sampling operators for training-data curation.

Beyond the reference's own surface (north-star extension): a large-scale
pipeline needs *reproducible* sampling — re-running the job on the same
corpus must select the same rows, regardless of partitioning, task
scheduling, or cluster size. Engine-native `df.sample()` cannot promise
that (row order is partition-dependent), so every operator here derives
its randomness from a 60-bit md5-based hash of a stable row key:

    u60(key) = int(md5(key || ':' || seed)[:15 hex], 16)   ∈ [0, 2^60)

which is identical in any engine (the DuckDB oracles compute the same
expression), making even the *sampled row set* exactly oracle-checkable.

Scale notes (100 TB):
- `hash_sample` / `stratified_sample` are map-only filters — no shuffle,
  fully pushed into the scan stage, linear in corpus size.
- `sample_k_per_stratum` is one shuffle on the stratum key (rank over
  hash order) — the same cost as any per-group top-k.
- `token_budget_mix` adds one tiny per-source aggregate (broadcast back);
  the corpus-side pass stays map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — the hash domain; thresholds are compared as exact BIGINTs when
#: the rate is a Python-side constant.
HASH_DOMAIN = 1 << 60


def sample_hash60(key: Column, seed: str = "s0") -> Column:
    """Deterministic uniform 60-bit hash of a row key (portable: md5 hex)."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + seed))), 1, 15),
        16,
        10,
    ).cast("long")


def hash60_sql(key_sql: str, seed: str = "s0") -> str:
    """The exact DuckDB expression for :func:`sample_hash60`."""
    return (
        f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':{seed}'), 1, 15) "
        "AS BIGINT)"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-hash falls below
    ``rate`` of the hash domain. Exact-integer comparison (no float), so the
    selected set is bit-reproducible across engines, partitionings, and
    cluster sizes. Map-only — no shuffle.

    Reference analogue: `DataSet.sample()` /
    `flink-java/src/main/java/org/apache/flink/api/java/utils/DataSetUtils.java`
    (sampleWithSize) — those are RNG-based and scheduling-dependent; this is
    the reproducible variant a curation pipeline actually wants.
    """
    threshold = int(rate * HASH_DOMAIN)
    return df.where(sample_hash60(F.col(key_col), seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. per-source quotas: keep 100% of
    wiki, 10% of crawl). One CASE expression over the same deterministic
    hash — still map-only, no shuffle.
    """
    h = sample_hash60(F.col(key_col), seed)
    expr: Column = F.lit(int(default_rate * HASH_DOMAIN))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * HASH_DOMAIN))
        ).otherwise(expr)
    return df.where(h < expr)


def sample_k_per_stratum(
    df: DataFrame, stratum_col: str, key_col: str, k: int, seed: str = "s0"
) -> DataFrame:
    """Uniform-without-replacement sample of exactly ``min(k, n)`` rows per
    stratum: rank rows by deterministic hash within each stratum and keep
    the first ``k``. Equivalent to a distributed reservoir sample but
    reproducible. One shuffle on the stratum key.
    """
    h = sample_hash60(F.col(key_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def token_budget_mix(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: str = "s0",
) -> DataFrame:
    """Weighted dataset mixing toward a token budget: each source ``s`` gets
    ``token_budget * weights[s]`` tokens; its sampling rate is
    ``min(1, share_s / total_tokens_s)``. Rows are then kept by the
    deterministic hash at that rate — so the *expected* token count hits the
    budget share while the selected set stays reproducible.

    Plan: per-source token totals (tiny aggregate) broadcast-joined back,
    then the map-only hash filter — the full-corpus pass never shuffles.
    Returns the kept rows plus the per-source ``mix_rate`` applied.
    """
    totals = docs.groupBy(source_col).agg(F.sum(token_col).alias("__tot"))
    wmap = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(float(w)))]
    )
    rates = totals.select(
        F.col(source_col),
        F.least(
            F.lit(1.0),
            F.lit(float(token_budget))
            * F.coalesce(wmap[F.col(source_col)], F.lit(0.0))
            / F.col("__tot").cast("double"),
        ).alias("mix_rate"),
    )
    u = sample_hash60(F.col(key_col), seed).cast("double") / F.lit(float(HASH_DOMAIN))
    return (
        docs.join(F.broadcast(rates), source_col)
        .where(u < F.col("mix_rate"))
    )


def dsir_scores(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The scoring stage of :func:`dsir_select`: (id, score) for every RAW
    document (target docs define the model and are excluded). Factored out
    so composites can re-rank an already-gated candidate set."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan
    from flink_ci_flink_spark.pipeline.text import token_hash, tokens

    t = tokens(text_col)
    base = spread_small_scan(docs).select(
        F.col(id_col), is_target.alias("__tgt"), t.alias("__t")
    )
    # Non-distinct bigrams (bag features — shingles_from_tokens dedups, DSIR
    # must not); guarded like it against Spark's backward sequence(1, 0).
    arr = F.col("__t")
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    posts = base.select(
        F.col(id_col),
        F.col("__tgt"),
        F.explode(F.concat(arr, bigrams)).alias("__g"),
    ).select(
        id_col,
        "__tgt",
        (token_hash(F.col("__g")) % F.lit(n_buckets)).alias("__b"),
    )
    # ONE execution of the tokenize + n-gram explode (r13): the bucket
    # model, the global totals, and the per-doc scoring all derive from a
    # single (id, tgt, bucket) occurrence-count aggregate — its exchange
    # is reused across the three branches (the grouping keys each branch
    # ignores cannot be pruned, so the subtrees stay identical and AQE
    # shares the stage; guide §2.4). The old shape re-ran the explode per
    # consumer. Identical integers: per-bucket/global counts are sums of
    # the per-(doc, bucket) counts, and the score's per-occurrence sum of
    # (lam - 1e6) groups into __c * (lam - 1e6).
    pb = posts.groupBy(id_col, "__tgt", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tgt_c = F.when(F.col("__tgt"), F.col("__c")).otherwise(F.lit(0))
    raw_c = F.when(F.col("__tgt"), F.lit(0)).otherwise(F.col("__c"))
    model = pb.groupBy("__b").agg(
        F.sum(tgt_c).cast("long").alias("__ct"),
        F.sum(raw_c).cast("long").alias("__cr"),
    )
    # global totals re-aggregate the ≤ n_buckets-row model (per-bucket
    # sums partition the occurrences), not pb — a second consumer of pb
    # would rebuild its exchange
    tots = model.agg(
        F.sum("__ct").cast("long").alias("__tt"),
        F.sum("__cr").cast("long").alias("__tr"),
    )
    lam = F.floor(
        (
            F.lit(1e6)
            * (F.col("__ct") + 1).cast("double")
            * (F.col("__tr") + F.lit(n_buckets))
        )
        / ((F.col("__cr") + 1).cast("double") * (F.col("__tt") + F.lit(n_buckets)))
    ).cast("long")
    weights = model.crossJoin(F.broadcast(tots)).select(
        "__b", lam.alias("__lam")
    )
    # the raw-docs gate references the aggregate output __c (value-neutral:
    # counts are >= 1) so Catalyst cannot split the conjunct and push the
    # source predicate below pb's exchange into the scan — a pushed filter
    # makes the scoring branch's subtree differ from the model branch's
    # and defeats the exchange reuse (the r11/r12 anti-pruning idiom the
    # scan pins in tests/test_plans.py rely on)
    raw_gate = F.when(F.col("__c") > 0, ~F.col("__tgt")).otherwise(F.lit(False))
    return (
        pb.filter(raw_gate)
        .join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__c") * (F.col("__lam") - F.lit(1000000)))
            .cast("long")
            .alias("score")
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    n_keep: int = 100,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection via hashed n-gram importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — public literature). A small TARGET slice of the corpus
    (``is_target`` predicate — e.g. a curated domain) defines the
    distribution to match; every RAW document is scored by how much more
    likely its hashed-n-gram bag is under the target model than under the
    raw model, and the top ``n_keep`` raw documents are selected.

    Features are hashed unigrams + bigrams (the paper's n<=2 bag), bucketed
    to ``n_buckets`` via the portable 60-bit md5 token hash. Both models are
    add-1-smoothed bucket counts. Following the repo's rational-weight
    convention (`text.py::bm25_topk`), the per-bucket log-likelihood-ratio
    is replaced by the integer-scaled likelihood ratio

        lam(b) = floor(1e6 * (ct+1) * (tot_r + B) / ((cr+1) * (tot_t + B)))

    and a document's importance score is ``sum(lam - 1e6)`` over its n-gram
    occurrences (ratio 1 contributes 0; to first order 1e6*sum(ln r)). Every
    step is integer inputs through IEEE correctly-rounded double ops, so the
    score — and the selected SET — is bit-identical in the DuckDB oracle.
    Selection is the deterministic top-k variant of the paper's Gumbel
    resampling (rank by weight; reproducible across cluster sizes).

    Scale shape (100 TB): the bucket model is ONE partial-aggregable
    groupBy over <= n_buckets keys; the weight table (<= n_buckets rows) and
    the 1-row totals BROADCAST back onto the postings; the per-doc score is
    a second partial-aggregable sum; the final top-k is a distributed
    TakeOrdered (sort + limit), never a global single-partition window —
    rank is assigned by a window over the n_keep survivors only.

    Returns (doc_id, score, rank) for the n_keep highest-scoring raw docs.
    """
    scored = dsir_scores(docs, is_target, n_buckets, text_col, id_col)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(n_keep)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.select(
        id_col, "score", F.row_number().over(w).cast("long").alias("rank")
    )


def temperature_mix(
    docs: DataFrame,
    token_budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: str = "s0",
) -> DataFrame:
    """Temperature-based dataset mixing at alpha = 0.5: source weights
    derive from the CORPUS itself as ``w_s = sqrt(tokens_s) / sum_t
    sqrt(tokens_t)`` — the standard multilingual/multi-domain temperature
    resampling that upweights tail sources relative to their natural share
    (alpha=1 is proportional, alpha->0 uniform; sqrt is the common middle).
    Rates then follow `token_budget_mix`'s mechanics: rate_s = min(1,
    budget * w_s / tokens_s), rows kept by the deterministic 60-bit hash.

    alpha is FIXED at 0.5 because SQRT is an IEEE correctly-rounded
    operation on both engines (bit-reproducible in a SQL oracle), while
    general ``pow(x, alpha)`` is only ~1-ulp accurate and may differ
    between libm implementations. The denominator sums the per-source
    sqrt terms in SORTED order (FP addition is order-sensitive; sources
    are few). Plan: ONE tiny aggregate whose k rows come to the driver
    (the model-sized collect), rates inlined as a CASE literal, then a
    map-only hash filter — two corpus scans total, no join, no shuffle
    on the filter pass."""
    import math

    totals = docs.groupBy(source_col).agg(
        F.sum(token_col).cast("long").alias("__tot")
    )
    rows = totals.collect()  # one row per source: the model-sized collect
    # Sources with zero/NULL token totals contribute nothing to the mix
    # (rate 0 via the CASE's otherwise) and would divide by zero below.
    rows = [r for r in rows if r["__tot"] is not None and r["__tot"] > 0]
    if not rows:
        return docs.select("*", F.lit(0.0).alias("mix_rate")).where(F.lit(False))
    den = 0.0
    for v in sorted(math.sqrt(float(r["__tot"])) for r in rows):
        den += v  # ascending left fold == oracle's list_sum(list_sort(...))
    rate_expr = None
    for r in rows:
        tot = float(r["__tot"])
        rate = min(1.0, float(token_budget) * (math.sqrt(tot) / den) / tot)
        branch = F.when(
            F.col(source_col) == F.lit(r[source_col]), F.lit(rate)
        )
        rate_expr = branch if rate_expr is None else rate_expr.when(
            F.col(source_col) == F.lit(r[source_col]), F.lit(rate)
        )
    rate_expr = rate_expr.otherwise(F.lit(0.0)).alias("mix_rate")
    u = sample_hash60(F.col(key_col), seed).cast("double") / F.lit(
        float(HASH_DOMAIN)
    )
    return docs.select("*", rate_expr).where(u < F.col("mix_rate"))
