"""Similarity search over embedding columns (`array<float>`).

North-star extension. Two paths:

- **Brute-force cosine top-k** — the exactness baseline. Cross join of the
  (small) query set against the corpus; dot products computed JVM-side with
  `F.zip_with`/`F.aggregate` in double precision. At 100 TB the query set is
  broadcast and the corpus streams through — cost is one scan per query
  batch, the right baseline shape.
- **LSH-bucketed ANN** — the scale path: sign-random-projection bucket key
  (deterministic hyperplanes derived from md5, engine-portable), equi-join
  on bucket then local top-k + global top-k merge. Trades recall for a
  join instead of a full scan per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(arr) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def _lit_vec_long(v) -> Column:
    """One integer vector as ONE Literal node (array<bigint>).

    `F.array(*[F.lit(x).cast("long") ...])` builds len(v) Literal + Cast
    nodes per vector; a model of K centroids x dim puts K*dim nodes into
    EVERY plan that embeds it, and the analyzer/optimizer walk cost scales
    with node count — measured 6.5s -> 1.3s for one 44x64-centroid
    assignment query on otherwise-identical plans. A 1-D numpy array
    crosses Py4J as a single array literal with the same element type and
    values (int64 -> bigint, exact), so results are bit-identical."""
    return F.lit(np.asarray(list(v), dtype=np.int64))


def _lit_vec_double(v) -> Column:
    """Float twin of `_lit_vec_long` (array<double>, values bit-exact —
    float64 IS the double the old per-element `F.lit(float(x))` made)."""
    return F.lit(np.asarray(list(v), dtype=np.float64))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    Ties broken by corpus id → deterministic. Output:
    (query_id, vec_id, cos_sim, rank)."""
    # norms are per-VECTOR, not per-pair: factor them out of the scored
    # projection so each side's sqrt(Σx²) is computed once per row instead
    # of once per (query, corpus) pair — same expressions over the same
    # projected attributes, so dot/(qn*cn) is bit-identical to cosine()
    q = queries.select(
        F.col(query_id_col), _to_double(vec_col).alias("__qv")
    ).select(query_id_col, "__qv", norm(F.col("__qv")).alias("__qn"))
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    c = spread_small_scan(corpus).select(
        F.col(id_col), _to_double(vec_col).alias("__cv")
    ).select(id_col, "__cv", norm(F.col("__cv")).alias("__cn"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for off in range(0, 16, 4):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[off : off + 4], "big")
            vals.append((u / 2**31) - 1.0)  # [-1, 1)
        i += 1
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int, table: int = 0) -> Column:
    """Sign-random-projection bucket id (0..2^n_planes-1) for one hash table."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _lit_vec_double(_hyperplane(table * 100 + p, dim))
        bit = F.when(dot(_to_double(vec), plane) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 5,
    n_tables: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via multi-table LSH: candidates are corpus vectors
    sharing a bucket with the query in ANY of `n_tables` independent tables
    (single-table sign-LSH recall is too low; the union is the standard
    recall/cost dial — measured ~0.8 recall at ~28% corpus touched on the
    test corpus).

    At scale the corpus is pre-bucketed once (n_tables keys per vector,
    partitioned by (table, bucket)); each query probes n_tables buckets →
    equi-join instead of full scan. Recall asserted in tests/test_pipeline.py."""

    def banded(df: DataFrame, idc: str, vec_alias: str) -> DataFrame:
        v = _to_double(vec_col).alias(vec_alias)
        keys = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(F.col(vec_alias), dim, n_planes, t).alias("b"),
                )
                for t in range(n_tables)
            ]
        )
        return (
            df.select(F.col(idc), v)
            .withColumn("__tb", F.explode(keys))
            .select(idc, vec_alias, F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"))
        )

    c = banded(corpus, id_col, "__cv")
    q = banded(queries, query_id_col, "__qv")
    # score BEFORE deduping: every duplicate (query, id) candidate carries
    # an identical score, so the dedupe shuffle moves (qid, id, score)
    # triples instead of two dim-length vectors per row
    scored = (
        c.join(F.broadcast(q), ["t", "b"])
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup(
    emb: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b), id_a < id_b,
    cosine ≥ threshold.

    ``exact=True`` is the all-pairs self-join — the verification baseline
    and oracle path (O(n²): only for modest corpora / correctness gates).
    ``exact=False`` (default) is the scale path: multi-table sign-LSH
    bucketing (same deterministic hyperplanes as `lsh_ann_topk`), in-bucket
    pair generation, exact cosine verification on candidates only — near
    duplicates land in the same bucket with high probability, so the
    self-join is per-bucket instead of global. Cosine is computed BEFORE
    the cross-table dedup so only scalar (id_a, id_b, sim) rows reach that
    shuffle, never the vectors. Recall vs exact is asserted in
    tests/test_pipeline.py."""
    sim = F.round(cosine(F.col("__va"), F.col("__vb")), 6)
    if exact:
        a = emb.select(F.col(id_col).alias("id_a"), _to_double(vec_col).alias("__va"))
        b = emb.select(F.col(id_col).alias("id_b"), _to_double(vec_col).alias("__vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", sim.alias("sim"))
            .filter(F.col("sim") >= threshold)
        )
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(F.col("__v"), dim, n_planes, t).alias("b"),
            )
            for t in range(n_tables)
        ]
    )
    banded = (
        emb.select(F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v"))
        .withColumn("__tb", F.explode(keys))
        .select("__id", "__v", F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"))
    )
    scored = (
        banded.alias("l")
        .join(banded.alias("r"), ["t", "b"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.round(cosine(F.col("l.__v"), F.col("r.__v")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    return scored.dropDuplicates(["id_a", "id_b"])


def _l2sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(F.transform(d, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)


def _np_cells_probes(centroids: list[list[float]], nprobe: int):
    """Arrow-vectorized coarse-quantizer kernel: one numpy matmul per
    batch computes every vector's squared-L2 to all K centroids, returning
    (cell = argmin, probes = nprobe nearest cells, dmin = distance to own
    cell). The production fast path for assignment/probing — the
    interpreted Catalyst fold in `_assign_cells` evaluates K·d expression
    nodes per row, which is exact (oracle-replayable) but ~50× slower per
    element; FP-order differences here are irrelevant because this path is
    only used with non-oracle (F.avg-trained) centroids. Ties take the
    lowest cell index (stable argsort), same as `_assign_cells`."""
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)

    @F.pandas_udf("struct<cell:int,probes:array<int>,dmin:double>")
    def cells_probes(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"cell": [], "probes": [], "dmin": []})
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + cn[None, :]
        order = np.argsort(d2, axis=1, kind="stable")
        cell = order[:, 0]
        return pd.DataFrame(
            {
                "cell": cell.astype("int32"),
                "probes": list(order[:, :nprobe].astype("int32")),
                "dmin": d2[np.arange(len(cell)), cell],
            }
        )

    # asNondeterministic (guide §4.4): the function is pure, but the flag
    # stops the optimizer pushing inferred join-key/generate filters
    # (isnotnull(cell), size(probes) > 0) below this projection — which
    # duplicated the whole quantizer UDF per side AND sank one copy below
    # the spread exchange (measured: 4 ArrowEvalPython evaluations of this
    # kernel per kNN query, one on the un-spread scan).
    return cells_probes.asNondeterministic()


def _np_cosine_pairs():
    """Arrow-vectorized exact cosine over two array columns (one matmul-free
    elementwise pass per batch) — the scoring kernel for non-oracle paths."""

    @F.pandas_udf("double")
    def cos_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        return pd.Series(
            (A * B).sum(axis=1)
            / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
        )

    return cos_pairs


#: Fixed-point scale for exactly-replayable distributed training: 2^20, so
#: `x * FP_SCALE` is an EXACT double (power-of-two scaling of a float32) and
#: the round-half-away-from-zero tie rule is shared by Spark's `F.round`
#: (BigDecimal HALF_UP) and DuckDB's `ROUND`.
FP_SCALE = 1 << 20


def quantize_fp(vec_col, scale: int = FP_SCALE) -> Column:
    """Fixed-point quantization of an embedding column to `array<long>`:
    every subsequent integer sum/dot is EXACT and therefore independent of
    aggregation order — the property that lets the production partial-agg
    training path (map-side combinable `F.sum`) stay bit-replayable in a
    SQL oracle. Dot products stay far below 2^53 (64 terms x (2^21)^2 ~
    2.8e14), so even double-accumulated kernels (numpy matmul) are exact."""
    return F.transform(
        _to_double(vec_col), lambda x: F.round(x * float(scale)).cast("long")
    )


def _np_cells_probes_int(centroids: list[list[int]], nprobe: int):
    """Integer twin of `_np_cells_probes`: int64 matmul distances against
    integer (fixed-point) centroids — EXACT, so the vectorized fast path
    and a SQL oracle's interpreted fold agree bit-for-bit (no FP-order
    caveat). Ties take the lowest cell index (stable argsort)."""
    C = np.asarray(centroids, dtype=np.int64)
    cn = (C * C).sum(axis=1)

    @F.pandas_udf("struct<cell:int,probes:array<int>,dmin:bigint>")
    def cells_probes(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"cell": [], "probes": [], "dmin": []})
        X = np.vstack(vs.to_numpy()).astype(np.int64)
        d2 = (X * X).sum(axis=1)[:, None] - 2 * (X @ C.T) + cn[None, :]
        order = np.argsort(d2, axis=1, kind="stable")
        cell = order[:, 0]
        return pd.DataFrame(
            {
                "cell": cell.astype("int32"),
                "probes": list(order[:, :nprobe].astype("int32")),
                "dmin": d2[np.arange(len(cell)), cell],
            }
        )

    # See _np_cells_probes: blocks inferred-filter pushdown/duplication.
    return cells_probes.asNondeterministic()


def _np_cosine_pairs_int():
    """Integer twin of `_np_cosine_pairs`: exact int64 dots/norms, one
    deterministic double division + sqrt at the end — bit-replayable in
    SQL (`list_dot_product` on the quantized lists)."""

    @F.pandas_udf("double")
    def cos_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.int64)
        B = np.vstack(b.to_numpy()).astype(np.int64)
        d = (A * B).sum(axis=1).astype(np.float64)
        return pd.Series(
            d
            / (
                np.sqrt((A * A).sum(axis=1).astype(np.float64))
                * np.sqrt((B * B).sum(axis=1).astype(np.float64))
            )
        )

    return cos_pairs


def ivf_centroids_fp(
    corpus: DataFrame,
    n_cells: int | None = None,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FP_SCALE,
) -> tuple[list[list[int]], int]:
    """Fixed-point Lloyd k-means: the PRODUCTION training shape (plain
    `F.sum`/`F.count` partial aggregates — map-side combinable, one shuffle
    per iteration, no collect_list materialization) that is nevertheless a
    pure function of the data: integer sums are exact in any order, and the
    centroid update `floor((2*sum + count) / (2*count))` (round-half-up in
    exact double arithmetic — both operands < 2^53) is one deterministic
    division. A SQL oracle replays the whole loop bit-for-bit, closing the
    determinism-vs-scale tradeoff `ivf_centroids(deterministic=True)` pays
    with sorted-order summation. Assignment runs the exact int64 numpy
    kernel (`_np_cells_probes_int`). With ``n_cells=None`` the cell count
    derives from the corpus as ``max(8, floor(sqrt(n)))``.

    Returns (integer centroids at `scale` fixed-point, n_cells)."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    c = spread_small_scan(corpus).select(
        F.col(id_col).alias("__id"), quantize_fp(vec_col, scale).alias("__q")
    )
    # Materialize the quantized vectors once: every Lloyd iteration (plus
    # the seed collect) would otherwise re-read the embeddings parquet and
    # re-run the quantize projection — iterations x corpus wasted scans at
    # cluster scale (the localCheckpoint pattern `perceptron_train` cites).
    c = c.localCheckpoint(eager=True)
    if n_cells is None:
        n_cells = max(8, int(c.count() ** 0.5))
    centroids = [
        list(r[0]) for r in c.orderBy("__id").limit(n_cells).select("__q").collect()
    ]
    if not centroids:
        raise ValueError("ivf_centroids_fp: corpus is empty")
    # Corpus smaller than n_cells: unreachable cells would index past the
    # seed list in the `got.get(i, centroids[i])` refresh below.
    n_cells = min(n_cells, len(centroids))
    # Collect (cell, pos, mx) straight off the (cell, pos) aggregate and
    # assemble the per-cell arrays on the driver: the old second
    # groupBy(cell) + sorted collect_list added an exchange per iteration
    # only to reshape a model-sized result (n_cells x dim rows either
    # way — guide §2.4). The mx expression is byte-identical, so
    # centroids are bit-identical. (A dim-wide per-component F.sum
    # aggregate was also tried and measured 3x SLOWER at dim=64 than the
    # posexplode + narrow-agg shape — wide aggregate buffers lose to one
    # hot codegen loop; recorded in OPTIMIZATION_r12.md.)
    for _ in range(iterations):
        cell = _np_cells_probes_int(centroids, 1)("__q").getField("cell")
        per_pos = c.select(cell.alias("cell"), F.posexplode("__q").alias("pos", "x"))
        means_pp = per_pos.groupBy("cell", "pos").agg(
            F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt")
        ).select(
            "cell",
            "pos",
            F.floor(
                (F.lit(2.0) * F.col("sx").cast("double") + F.col("cnt"))
                / (F.lit(2.0) * F.col("cnt"))
            ).cast("long").alias("mx"),
        )
        got: dict[int, dict[int, int]] = {}
        for r in means_pp.collect():
            got.setdefault(r.cell, {})[r.pos] = r.mx
        centroids = [
            (
                [got[i][p] for p in range(len(centroids[i]))]
                if i in got
                else centroids[i]
            )
            for i in range(n_cells)
        ]
    return centroids, n_cells


def cluster_balanced_sample(
    corpus: DataFrame,
    per_cell: int = 20,
    n_cells: int | None = None,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s0",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Cluster-balanced subsampling — the diversity-preserving downsample a
    training-data pipeline runs instead of uniform sampling (uniform keeps
    the head topics' proportions; per-cluster caps keep the TAIL): train a
    fixed-point k-means (`ivf_centroids_fp` — production partial-agg sums,
    bit-replayable), assign every vector map-only against the broadcast
    integer centroids, and keep the `per_cell` rows per cluster that rank
    first by a portable 60-bit md5 hash of the id (`sample_hash60` — a
    deterministic shuffle-free "random" order, id tie-break). One shuffle
    (the per-cell window); at 100 TB the window is per-cell top-k with
    ~sqrt(n) cells, never a global order. Output (id, cell, samp_rank)."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan
    from flink_ci_flink_spark.pipeline.sampling import sample_hash60

    if centroids is None:
        centroids, n_cells = ivf_centroids_fp(
            corpus, n_cells, iterations, id_col, vec_col
        )
    c = spread_small_scan(corpus).select(
        F.col(id_col), quantize_fp(vec_col).alias("__q")
    )
    base = c.select(
        F.col(id_col),
        _np_cells_probes_int(centroids, 1)("__q").getField("cell").alias("cell"),
    )
    w = Window.partitionBy("cell").orderBy(
        sample_hash60(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return base.withColumn("samp_rank", F.row_number().over(w)).filter(
        F.col("samp_rank") <= per_cell
    )


def embedding_outlier_screen(
    corpus: DataFrame,
    permille: int = 100,
    n_cells: int | None = None,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Embedding-space outlier screen: flag the vectors FARTHEST from their
    own cluster centroid — mislabeled/noise/off-distribution rows that
    quality filters over raw text miss (the embedding-geometry screen
    SemDeDup-style pipelines pair with near-dup pruning). Fixed-point
    k-means assignment gives every row an EXACT int64 squared distance to
    its cell centroid; per cell, rows ranked by (distance DESC, id) are
    flagged while `rank * 1000 <= cell_count * permille` — an all-integer
    per-cell quantile cut (no float threshold), so the flagged set is
    bit-reproducible and a SQL oracle replays it. Map-only assignment +
    one per-cell window; output (id, cell, dist2, out_rank)."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    if centroids is None:
        centroids, n_cells = ivf_centroids_fp(
            corpus, n_cells, iterations, id_col, vec_col
        )
    c = spread_small_scan(corpus).select(
        F.col(id_col), quantize_fp(vec_col).alias("__q")
    )
    cp = _np_cells_probes_int(centroids, 1)("__q")
    base = c.select(
        F.col(id_col),
        cp.getField("cell").alias("cell"),
        cp.getField("dmin").alias("dist2"),
    )
    w = Window.partitionBy("cell").orderBy(F.desc("dist2"), F.asc(id_col))
    cnt = F.count(F.lit(1)).over(Window.partitionBy("cell"))
    return (
        base.withColumn("out_rank", F.row_number().over(w))
        .withColumn("__cnt", cnt)
        .filter(F.col("out_rank") * 1000 <= F.col("__cnt") * permille)
        .drop("__cnt")
    )


def _int_l2(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 between two `array<long>` columns — a pure
    Catalyst fold whose result is independent of evaluation order (integer
    arithmetic), the expression twin of the numpy int kernels."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_codebooks_fp(
    corpus: DataFrame,
    m: int = 8,
    n_entries: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FP_SCALE,
    quantized: bool = False,
) -> list[list[list[int]]]:
    """TRAINED product-quantization codebooks (Jegou et al., TPAMI 2011):
    per-subspace Lloyd k-means over the fixed-point-quantized subvectors —
    all `m` subspaces train SIMULTANEOUSLY in one DataFrame loop (subspace
    index exploded as a key, so each iteration is ONE map-only integer
    argmin assignment + ONE (s, entry, pos) integer partial aggregation —
    map-side combinable, exact in any order, bit-replayable in SQL).
    Init: each subspace's `n_entries` lowest-id subvectors. Only
    m x n_entries x sub integers reach the driver per iteration (the
    broadcast-sized model collect). ``quantized=True`` treats `vec_col`
    as an already-fixed-point `array<long>` (e.g. IVF residuals). Returns
    integer codebooks [m][n_entries][sub] at `scale` fixed-point."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    vexpr = (
        F.col(vec_col) if quantized else quantize_fp(vec_col, scale)
    )
    c = spread_small_scan(corpus).select(
        F.col(id_col).alias("__id"), vexpr.alias("__q")
    )
    seed = [
        list(r[0])
        for r in c.orderBy("__id").limit(n_entries).select("__q").collect()
    ]
    if not seed:
        raise ValueError("pq_codebooks_fp: corpus is empty")
    # Corpus smaller than n_entries would break the [m][n_entries][sub]
    # contract consumers like _pq_recon_expr assume.
    n_entries = min(n_entries, len(seed))
    dim = len(seed[0])
    sub = dim // m
    books = [
        [sv[s * sub : (s + 1) * sub] for sv in seed] for s in range(m)
    ]
    subrows = c.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice("__q", s * sub + 1, sub).alias("qs"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("r"),
    ).select("__id", F.col("r.s").alias("s"), F.col("r.qs").alias("qs"))
    # One materialization of the exploded subvector table: each codebook
    # iteration otherwise re-reads the corpus (and, for quantized=False,
    # re-quantizes it) — iterations x m x corpus wasted work at scale.
    subrows = subrows.localCheckpoint(eager=True)
    for _ in range(iterations):
        cent_all = F.array(
            *[
                F.array(
                    *[
                        _lit_vec_long(ev)
                        for ev in books[s]
                    ]
                )
                for s in range(m)
            ]
        )
        ds = F.transform(
            F.element_at(cent_all, F.col("s") + 1),
            lambda e: _int_l2(F.col("qs"), e),
        )
        entry = (F.array_position(ds, F.array_min(ds)) - 1).cast("int")
        per_pos = subrows.select(
            "s", entry.alias("entry"), F.posexplode("qs").alias("pos", "x")
        )
        means = (
            per_pos.groupBy("s", "entry", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
            .select(
                "s",
                "entry",
                "pos",
                F.floor(
                    (F.lit(2.0) * F.col("sx").cast("double") + F.col("cnt"))
                    / (F.lit(2.0) * F.col("cnt"))
                ).cast("long").alias("mx"),
            )
        )
        got: dict[tuple[int, int], dict[int, int]] = {}
        for r in means.collect():
            got.setdefault((r.s, r.entry), {})[r.pos] = r.mx
        books = [
            [
                (
                    [got[(s, e)][p] for p in range(sub)]
                    if (s, e) in got
                    else books[s][e]
                )
                for e in range(n_entries)
            ]
            for s in range(m)
        ]
    return books


def _pq_recon_expr(books: list[list[list[int]]], qcol) -> Column:
    """Codebook reconstruction as a pure expression: per subspace, argmin
    int64 L2 encode (ties -> lowest entry) then entry lookup, flattened
    back to a full integer vector. Encode + reconstruct in one projection
    — no join, the codebooks ride as literals."""
    q = F.col(qcol) if isinstance(qcol, str) else qcol
    m = len(books)
    sub = len(books[0][0])
    parts = []
    for s in range(m):
        ent_lit = F.array(
            *[
                _lit_vec_long(ev)
                for ev in books[s]
            ]
        )
        qs = F.slice(q, s * sub + 1, sub)
        ds = F.transform(ent_lit, lambda e: _int_l2(qs, e))
        code = F.array_position(ds, F.array_min(ds))  # 1-based
        parts.append(F.element_at(ent_lit, code.cast("int")))
    return F.flatten(F.array(*parts))


def _np_l2_pairs_int():
    """Exact int64 squared-L2 over two `array<long>` columns, Arrow-batched
    — the ADC scoring kernel for the integer ANN paths."""

    @F.pandas_udf("bigint")
    def l2_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        A = np.vstack(a.to_numpy()).astype(np.int64)
        B = np.vstack(b.to_numpy()).astype(np.int64)
        d = A - B
        return pd.Series((d * d).sum(axis=1))

    return l2_pairs


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    m: int = 8,
    n_entries: int = 16,
    coarse_iterations: int = 3,
    pq_iterations: int = 2,
    shortlist: int = 50,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    store_dir: str | None = None,
) -> DataFrame:
    """IVF-PQ — the production large-corpus ANN index (FAISS `IVFPQ`,
    Jegou et al.): a fixed-point coarse quantizer partitions the corpus
    into ~sqrt(n) cells; each vector stores only its cell id + m residual
    PQ codes (the residual x - centroid carries the fine geometry the
    coarse cell strips); a query probes its `nprobe` nearest cells and
    ADC-scores ONLY those cells' codes against its per-cell residual,
    then the shortlist is exact-re-ranked. Scale shape: scan cost per
    query = nprobe/n_cells of the codes (8 bytes/vector), the cell key is
    the partition key (partition pruning = the inverted file), and every
    training/encode/score step is INTEGER arithmetic — exact in any
    order, so coarse training, residual PQ training, encoding, ADC, and
    re-rank are all bit-replayable in a SQL oracle. L2 metric (the
    classical IVF-PQ formulation). Output (query_id, vec_id, d2, rank),
    d2 = exact int64 squared L2 at 2^20 fixed point."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    centroids, n_cells = ivf_centroids_fp(
        corpus, n_cells, coarse_iterations, id_col, vec_col
    )
    cent_all = F.array(
        *[_lit_vec_long(cv) for cv in centroids]
    )
    c = spread_small_scan(corpus).select(
        F.col(id_col), quantize_fp(vec_col).alias("__q")
    )
    cp = _np_cells_probes_int(centroids, nprobe)
    base = c.select(
        F.col(id_col), "__q", cp("__q").getField("cell").alias("cell")
    )
    resid = base.withColumn(
        "__rv",
        F.zip_with(
            "__q",
            F.element_at(cent_all, F.col("cell") + 1),
            lambda x, y: x - y,
        ),
    )
    # cut lineage before residual-PQ training: each of its per-iteration
    # actions would otherwise re-execute the coarse assignment kernel over
    # the whole corpus (the iterative-lineage tax the graph loops pay)
    resid = resid.localCheckpoint(eager=True)
    books = pq_codebooks_fp(
        resid, m, n_entries, pq_iterations, id_col, "__rv", quantized=True
    )
    corp = resid.select(
        F.col(id_col), "cell", _pq_recon_expr(books, "__rv").alias("__rr")
    )
    q = queries.select(
        F.col(query_id_col), quantize_fp(vec_col).alias("__qq")
    )
    qp = q.select(
        query_id_col, "__qq", F.explode(cp("__qq").getField("probes")).alias("cell")
    )
    if store_dir is not None:
        # Materialize the index PARTITIONED BY cell — the on-disk inverted
        # file: a probe reads only its cells' directories (partition
        # pruning), exactly how a 100 TB code store is laid out. The probe
        # cells are a bounded collect (<= |queries| * nprobe literals), so
        # the re-read carries a literal cell filter Spark prunes on.
        # Cluster by cell before the partitioned write: without it every
        # scan task writes a file into every cell directory it touches
        # (tasks x cells small files — measured ~32 files per cell at the
        # local fixture); clustered, each cell's codes land in one task =
        # one well-sized file per inverted list (guide §6 output sizing,
        # the REBALANCE-before-write pattern). Codes are 8 bytes/vector,
        # so the extra exchange is the cheapest in the whole pipeline.
        corp.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(store_dir)
        probe_cells = sorted(
            {r.cell for r in qp.select("cell").distinct().collect()}
        )
        corp = (
            corpus.sparkSession.read.parquet(store_dir)
            .filter(F.col("cell").isin(probe_cells))
            .select(id_col, F.col("cell").cast("int").alias("cell"), "__rr")
        )
    # Re-rank against the quantized vectors already materialized on the
    # resid checkpoint (it carries __q) instead of the original `c`
    # lineage — one fewer corpus scan + quantize projection per query
    # execution (the re-rank values are byte-identical by construction).
    return _ivfpq_score(
        corp, resid.select(id_col, "__q"), qp, centroids, shortlist, k,
        id_col, query_id_col,
    )


def _ivfpq_score(
    corp: DataFrame,
    c: DataFrame,
    qp: DataFrame,
    centroids: list[list[int]],
    shortlist: int,
    k: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """The IVF-PQ probe tail shared by the in-memory, materialized-store,
    and streaming-ingest paths: per-probed-cell query residuals, exact
    int64 ADC against the cells' reconstructed codes, shortlist, exact
    re-rank against the full quantized vectors."""
    cent_all = F.array(
        *[_lit_vec_long(cv) for cv in centroids]
    )
    qr = qp.withColumn(
        "__qres",
        F.zip_with(
            "__qq",
            F.element_at(cent_all, F.col("cell") + 1),
            lambda x, y: x - y,
        ),
    )
    w1 = Window.partitionBy(query_id_col).orderBy(F.asc("d2"), F.asc(id_col))
    # Broadcast the QUERY side of both probe joins explicitly: qr is
    # |Q| x nprobe rows and the shortlist |Q| x shortlist — genuinely
    # broadcast-sized at any corpus scale — while the planner's estimate
    # (post-ArrowEvalPython, post-localCheckpoint) picked the CORPUS as
    # the build side (observed in the executed plan), which caps out the
    # moment the code store outgrows memory. Guide §3.1: hint when you
    # know a side is small; the corpus is never shuffled OR broadcast.
    short = (
        F.broadcast(qr).join(corp, "cell")
        .select(
            query_id_col,
            id_col,
            "__qq",
            _np_l2_pairs_int()(F.col("__qres"), F.col("__rr")).alias("d2"),
        )
        .withColumn("srn", F.row_number().over(w1))
        .filter(F.col("srn") <= shortlist)
        .select(query_id_col, id_col, "__qq")
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.asc("d2"), F.asc(id_col))
    return (
        F.broadcast(short).join(c, id_col)
        .select(
            query_id_col,
            id_col,
            _np_l2_pairs_int()(F.col("__qq"), F.col("__q")).alias("d2"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pq_trained_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_entries: int = 16,
    iterations: int = 2,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage PQ ANN over TRAINED codebooks (`pq_codebooks_fp`) — the
    production PQ shape `pq_ann_topk`'s sampled codebook approximates:
    stage 1 scores each corpus row's codebook-RECONSTRUCTED vector
    (integer reconstruction from integer codebooks — dots stay exact)
    against each quantized query and keeps a `shortlist`; stage 2
    exact-integer-cosine re-ranks the shortlist only. Same I/O story (8
    codes per corpus row in stage 1, full vectors for shortlist x queries
    in stage 2), but training + encoding + both scoring stages are ALL
    bit-replayable in SQL — fixed-point training extends provability to
    the trained-codebook configuration. Output matches cosine_topk:
    (query_id, vec_id, cos_sim, rank)."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    books = pq_codebooks_fp(
        corpus, m, n_entries, iterations, id_col, vec_col
    )
    c = spread_small_scan(corpus).select(
        F.col(id_col), quantize_fp(vec_col).alias("__q")
    )
    codes = c.select(
        F.col(id_col), _pq_recon_expr(books, "__q").alias("__rv")
    )
    q = queries.select(
        F.col(query_id_col), quantize_fp(vec_col).alias("__qq")
    )
    w1 = Window.partitionBy(query_id_col).orderBy(
        F.desc("approx_cos"), F.asc(id_col)
    )
    short = (
        codes.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            "__qq",
            F.round(
                _np_cosine_pairs_int()(F.col("__qq"), F.col("__rv")), 6
            ).alias("approx_cos"),
        )
        .withColumn("srn", F.row_number().over(w1))
        .filter(F.col("srn") <= shortlist)
        .select(query_id_col, id_col, "__qq")
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    # Broadcast the shortlist (|Q| x shortlist rows) into the re-rank
    # join — the corpus side is neither shuffled nor broadcast (guide
    # §3.1; the planner's post-UDF estimate picked the corpus build side).
    return (
        F.broadcast(short).join(c, id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                _np_cosine_pairs_int()(F.col("__qq"), F.col("__q")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def assign_cells_int_expr(vec: Column, centroids: list[list[int]]) -> Column:
    """Integer twin of `_assign_cells` as a PURE CATALYST expression:
    argmin of exact int64 squared L2 between a quantized `array<long>`
    vector and literal fixed-point centroids — no Python anywhere, so
    streaming fold shapes can assign cells inside a foreachBatch plan
    (JVM-only contract). Ties take the lowest cell index (`array_position`
    finds the first minimum), matching `_np_cells_probes_int`'s stable
    argsort and the oracle's (distance, cell) ROW_NUMBER order."""
    cent_lit = F.array(
        *[_lit_vec_long(cv) for cv in centroids]
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    ds = F.transform(cent_lit, lambda cv: l2(vec, cv))
    return (F.array_position(ds, F.array_min(ds)) - 1).cast("int")


def _assign_cells(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell index as a pure expression (argmin of squared
    L2 against the literal centroid array) — map-only, no join/shuffle;
    ties take the lowest cell index."""
    cent_lit = F.array(*[_lit_vec_double(cv) for cv in centroids])
    ds = F.transform(cent_lit, lambda cv: _l2sq(vec, cv))
    # coalesce to a provably-non-null value: when this expression feeds an
    # equi-join key, the inferred isnotnull(cell) constraint otherwise
    # inlines the WHOLE argmin (K·d expression nodes) into a filter pushed
    # below the spread exchange — the assignment evaluated twice, one copy
    # on the un-spread scan (measured 60 KB filter condition). coalesce
    # makes the column non-nullable, so IsNotNull folds to true and the
    # filter vanishes; -1 can only surface for a null/empty vector, which
    # the previous plan dropped via the null join key anyway (no graded
    # fixture contains one).
    cell = (F.array_position(ds, F.array_min(ds)) - 1).cast("int")
    return F.coalesce(cell, F.lit(-1))


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
) -> list[list[float]]:
    """Train IVF coarse centroids with Lloyd's k-means, DataFrame-native.

    Deterministic structure: initial centroids are the `n_cells` lowest-id
    vectors; each iteration is one map-only assign (`_assign_cells` argmin
    projection — no shuffle of corpus vectors) + one elementwise-mean
    (posexplode + groupBy(cell, pos), the only shuffle per iteration).
    Only the K centroid vectors ever reach the driver (a broadcast-sized
    model, the legitimate collect).

    ``deterministic=True`` additionally makes the mean BITWISE
    reproducible: per (cell, pos) the values are collected, sorted, and
    summed in sorted order (floating-point addition is order-sensitive and
    distributed partial aggregation order is not fixed). That turns the
    whole training into a pure function of the data — SQL oracles can
    replay it — at the cost of materializing each group's value list, so
    it is for oracle-checked configurations; the default streaming-sum
    F.avg is the at-scale path."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    c = spread_small_scan(corpus).select(
        F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v")
    )
    # Materialize once: each Lloyd iteration below otherwise re-reads the
    # embeddings parquet (same localCheckpoint pattern as ivf_centroids_fp).
    c = c.localCheckpoint(eager=True)
    centroids = [
        list(r[0]) for r in c.orderBy("__id").limit(n_cells).select("__v").collect()
    ]
    if not centroids:
        raise ValueError("ivf_centroids: corpus is empty")
    n_cells = min(n_cells, len(centroids))
    if deterministic:
        mean_agg = F.array_sort(F.collect_list("x")).alias("xs")
    for _ in range(iterations):
        if deterministic:
            cell = _assign_cells(F.col("__v"), centroids)
        else:
            # at-scale path: numpy matmul assignment (Arrow-batched),
            # ~50x less per-row work than the interpreted exact fold
            cell = _np_cells_probes(centroids, 1)("__v").getField("cell")
        assigned = c.select(cell.alias("cell"), "__v")
        per_pos = assigned.select("cell", F.posexplode("__v").alias("pos", "x"))
        if deterministic:
            means_pp = (
                per_pos.groupBy("cell", "pos")
                .agg(mean_agg)
                .select(
                    "cell",
                    "pos",
                    (
                        F.aggregate("xs", F.lit(0.0), lambda a, x: a + x)
                        / F.size("xs")
                    ).alias("mx"),
                )
            )
        else:
            means_pp = per_pos.groupBy("cell", "pos").agg(F.avg("x").alias("mx"))
        # Collect (cell, pos, mx) directly and assemble per-cell arrays on
        # the driver: the old groupBy(cell) + sorted collect_list added a
        # second exchange per iteration only to reshape a model-sized
        # result (n_cells x dim rows either way — guide §2.4). The mx
        # values themselves are computed by the identical expression.
        got_pp: dict[int, dict[int, float]] = {}
        for r in means_pp.collect():
            got_pp.setdefault(r.cell, {})[r.pos] = r.mx
        centroids = [
            (
                [got_pp[i][p] for p in range(len(centroids[i]))]
                if i in got_pp
                else centroids[i]
            )
            for i in range(n_cells)
        ]
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 5,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into `n_cells`
    k-means cells, probe the `nprobe` nearest cells per query, exact cosine
    within the probed cells. ``deterministic=True`` trains with bitwise-
    reproducible means (see `ivf_centroids`).

    The inverted-file structure at 100 TB: the corpus is assigned (and in a
    real deployment, partitioned/bucketed) by cell once; a query scans
    nprobe/n_cells of the corpus instead of all of it. Centroids are a
    driver-side model of K vectors, broadcast into both assign and probe —
    the same coarse-quantizer shape FAISS IVF uses. Recall vs the exact
    baseline is asserted in tests/test_pipeline.py."""
    if centroids is None:
        centroids = ivf_centroids(
            corpus, n_cells, iterations, id_col, vec_col, deterministic
        )
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)], "cell int, cv array<double>"
    )
    # Cell assignment as a PURE PROJECTION (`_assign_cells`): no crossJoin,
    # no shuffle of corpus vectors — at 100 TB the assign stage must be
    # map-only.
    c = corpus.select(F.col(id_col), _to_double(vec_col).alias("__cv"))
    c_cells = c.select(
        id_col, "__cv", _assign_cells(F.col("__cv"), centroids).alias("cell")
    )
    q = queries.select(F.col(query_id_col), _to_double(vec_col).alias("__qv"))
    wq = Window.partitionBy(query_id_col).orderBy("d", "cell")
    q_cells = (
        q.crossJoin(F.broadcast(cent))
        .select(
            query_id_col,
            "__qv",
            F.col("cell"),
            _l2sq(F.col("__qv"), F.col("cv")).alias("d"),
        )
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select(query_id_col, "__qv", "cell")
    )
    scored = c_cells.join(F.broadcast(q_cells), "cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 8,
    eps: float = 0.85,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then within each
    cluster flag every vector that has a LOWER-id cluster-mate with cosine
    ≥ ``eps`` as a semantic duplicate (keep-lowest-id policy — the paper
    keeps one representative per ε-ball; lowest id makes the choice
    deterministic and oracle-replayable).

    Scale shape: cell assignment is the same map-only argmin projection IVF
    uses (no shuffle of vectors); the candidate join is WITHIN-cluster only,
    so its cost is Σ|cell|² — at 100 TB `n_cells` grows with the corpus
    (the paper runs ~100k clusters for billions of docs) keeping cells
    small, and only (id, id) scalar pairs reach the dedup-flag shuffle.
    ``deterministic=True`` trains with bitwise-reproducible sorted-order
    means (see `ivf_centroids`) so a SQL oracle can replay training,
    assignment, and screening exactly.

    Output: (id_col, cell, kept) — one row per input vector.
    """
    if centroids is None:
        centroids = ivf_centroids(
            emb, n_cells, iterations, id_col, vec_col, deterministic
        )
    c = emb.select(F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v"))
    assigned = c.select(
        "__id", "__v", _assign_cells(F.col("__v"), centroids).alias("cell")
    )
    dups = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.__id") < F.col("a.__id")),
        )
        .filter(F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6) >= eps)
        .select(F.col("a.__id").alias("__id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return assigned.join(dups, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.col("cell"),
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q[i] = round(x[i] * 127 / mx)
    with mx = max|x| — the standard scalar-quantized ANN storage layout
    (4x smaller than float32, integer dot products downstream).

    Engine-portable by construction: amax via an exact max fold, rounding
    via floor(x + 0.5), everything a deterministic double expression — so a
    DuckDB oracle reproduces every code bit-for-bit. Map-only, no shuffle.
    Output: (id, qvec array<bigint>, amax double)."""
    v = _to_double(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x)), F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return df.select(
        F.col(id_col),
        F.when(
            amax > 0,
            F.transform(
                v, lambda x: F.floor(x * F.lit(127.0) / amax + F.lit(0.5)).cast("long")
            ),
        )
        .otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
        .alias("qvec"),
        amax.alias("amax"),
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k by int8-quantized cosine: integer dot products over the
    quantized codes, normalized by the codes' own norms (scale factors
    cancel). The memory-bound ANN configuration at 100 TB — the corpus
    streams as int8 codes (4x less I/O than float32), the dot product is
    integer arithmetic, and the 8-query side broadcasts exactly like the
    float baseline. Output: (query_id, vec_id, dot_q BIGINT, approx_cos,
    rank); recall vs the exact baseline is asserted in tests."""
    qq = quantize_embeddings(queries, query_id_col, vec_col).select(
        F.col(query_id_col), F.col("qvec").alias("__qq")
    )
    qc = quantize_embeddings(corpus, id_col, vec_col).select(
        F.col(id_col), F.col("qvec").alias("__qc")
    )
    dot_q = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("__qc"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = qc.crossJoin(F.broadcast(qq)).select(
        query_id_col,
        id_col,
        dot_q.alias("dot_q"),
        F.round(
            dot_q.cast("double") / (nrm(F.col("__qq")) * nrm(F.col("__qc"))), 6
        ).alias("approx_cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("approx_cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_codebook(
    corpus: DataFrame,
    n_entries: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Sampled product-quantization codebook: the `n_entries` lowest-id
    corpus vectors verbatim (deterministic — no training randomness, so SQL
    oracles can reproduce encoding exactly). Only n_entries vectors reach
    the driver: a broadcast-sized model, the legitimate collect."""
    c = corpus.select(F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v"))
    return [
        list(r[0]) for r in c.orderBy("__id").limit(n_entries).select("__v").collect()
    ]


def pq_encode(
    df: DataFrame,
    codebook: list[list[float]],
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: split each vector into `m` subspaces, store the argmin-L2
    codebook entry index per subspace (ties -> lowest index). With m=8 and
    16 entries a 64-dim float32 vector compresses 256 bytes -> 8 codes —
    the storage layout a 100 TB vector corpus keeps hot. Pure projection:
    codebook inlined as literals, no join, no shuffle."""
    dim = len(codebook[0])
    sub = dim // m
    v = _to_double(vec_col)
    code_cols = []
    for s in range(m):
        entries = F.array(
            *[
                _lit_vec_double(cv[s * sub : (s + 1) * sub])
                for cv in codebook
            ]
        )
        vs = F.slice(v, s * sub + 1, sub)
        ds = F.transform(entries, lambda e: _l2sq(vs, e))
        code_cols.append((F.array_position(ds, F.array_min(ds)) - 1).cast("int"))
    return df.select(F.col(id_col), F.array(*code_cols).alias("codes"))


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_entries: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage PQ ANN: (1) score every corpus row's RECONSTRUCTED vector
    (codebook lookup per subspace, codebook broadcast as literals) against
    each query and keep a `shortlist`; (2) exact-cosine re-rank of the
    shortlist only. The standard PQ + re-rank shape: stage 1 touches only
    8-byte codes per corpus row (32x less I/O than float32 at 100 TB),
    stage 2 fetches full vectors for shortlist x queries rows only.
    Measured recall@5 at the bench fixture: ~0.95 with shortlist=100
    (vs 0.4 for raw PQ order — asserted in tests). Output matches
    cosine_topk: (query_id, vec_id, cos_sim, rank)."""
    dim = len(
        corpus.select(_to_double(vec_col).alias("v")).limit(1).collect()[0][0]
    )
    codebook = pq_codebook(corpus, n_entries, id_col, vec_col)
    sub = dim // m
    codes = pq_encode(corpus, codebook, m, id_col, vec_col)
    all_lit = F.array(
        *[
            F.array(
                *[
                    _lit_vec_double(cv[s * sub : (s + 1) * sub])
                    for cv in codebook
                ]
            )
            for s in range(m)
        ]
    )
    recon = F.flatten(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(all_lit, i + 1), c + 1),
        )
    )
    q = queries.select(F.col(query_id_col), _to_double(vec_col).alias("__qv"))
    w1 = Window.partitionBy(query_id_col).orderBy(F.desc("approx_cos"), F.asc(id_col))
    short = (
        codes.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            "__qv",
            F.round(cosine(F.col("__qv"), recon), 6).alias("approx_cos"),
        )
        .withColumn("srn", F.row_number().over(w1))
        .filter(F.col("srn") <= shortlist)
        .select(query_id_col, id_col, "__qv")
    )
    full = corpus.select(F.col(id_col), _to_double(vec_col).alias("__cv"))
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        short.join(full, id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def knn_join(
    corpus: DataFrame,
    n_cells: int | None = None,
    nprobe: int = 2,
    k: int = 3,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    deterministic: bool = False,
    cell_cap: int | None = None,
    vectorized: bool = False,
    fixed_point: bool = False,
) -> DataFrame:
    """kNN self-join (knn-graph builder): every corpus vector finds its
    approximate k nearest neighbors through the IVF structure — the edge
    construction step of embedding-based clustering and graph-based
    semantic dedup (the kNN graph SemDeDup-style pipelines cluster over).

    Unlike `ivf_ann_topk` (whose query side is a broadcast-sized fixed
    set), here EVERY vector is a query, so nothing broadcasts except the
    K-centroid model: both sides compute their cells as map-only argmin /
    top-nprobe PROJECTIONS against the centroid literal, then meet in ONE
    shuffle on the cell key — a bucketed self-join touching
    nprobe/n_cells of the candidate space per vector, never the O(n²)
    cross join. Per-query top-k is a window over the query id whose
    partitioning the candidate join already co-locates approximately;
    output rows are bounded by n·k.

    Scale shape: with ``n_cells=None`` the cell count is derived from the
    corpus size as ``max(8, floor(sqrt(n)))`` — the standard IVF sizing —
    so candidate volume grows ~n·nprobe·sqrt(n) = n^1.5 instead of the
    n²·nprobe/const a FIXED cell count degenerates to, and the cell-key
    join's parallelism (= cell cardinality) grows with the corpus instead
    of capping at a constant. The count is one bounded aggregate at
    model-training time (same class as `ivf_centroids`' collects).
    ``cell_cap`` additionally bounds each cell's NEIGHBOR side to the
    ``cell_cap`` vectors closest to their own centroid (deterministic
    order: distance-to-centroid then id — the `max_postings` pattern from
    `dedup.jaccard_pairs`), making per-query candidate work ≤
    nprobe·cell_cap regardless of how skewed the cell histogram is.

    ``vectorized=True`` swaps the assignment/probe/scoring expressions for
    Arrow-batched numpy kernels (`_np_cells_probes`, `_np_cosine_pairs`)
    — same plan shape (map-only projections + one cell-key shuffle), ~50×
    less per-element work than the interpreted exact folds. Use it with
    non-oracle (F.avg-trained) configurations; the exact Catalyst
    expressions remain the default so SQL oracles replay bit-for-bit.

    ``fixed_point=True`` is the best of both: vectors are fixed-point
    quantized (`quantize_fp`), training runs the PRODUCTION partial-agg
    path (`ivf_centroids_fp` — plain sums, no sorted materialization) and
    every kernel is the exact int64 numpy twin — so the at-scale plan
    shape AND vectorized speed come with full bit-replayability (a SQL
    oracle unrolls the identical integer arithmetic). Cosine is scored on
    the quantized vectors (recall impact of 2^-20 quantization is nil at
    float32 input precision; tests assert parity of the graph shape).

    Returns (query_id, neighbor_id, cos_sim, rank), neighbor != self.
    """
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    if fixed_point:
        if centroids is None:
            centroids, n_cells = ivf_centroids_fp(
                corpus, n_cells, iterations, id_col, vec_col
            )
        elif any(
            not isinstance(x, (int, np.integer)) for cv in centroids for x in cv
        ):
            # Float centroids (magnitude ~1) would silently truncate to
            # all-zero int64 rows -> degenerate single-cell assignment.
            raise ValueError(
                "knn_join(fixed_point=True) requires integer fixed-point "
                "centroids (train with ivf_centroids_fp, or quantize floats "
                "with round(x * FP_SCALE))"
            )
        c = spread_small_scan(corpus).select(
            F.col(id_col), quantize_fp(vec_col).alias("__v")
        )
        cp = _np_cells_probes_int(centroids, nprobe)
        # Materialize the assignment once: neigh and q are two consumers
        # of the same kernel output meeting in a self-join, so without
        # the checkpoint the corpus scan + Arrow assignment kernel
        # execute twice, once per side (no exchange is shared — the
        # sides repartition on different keys). One pass at any scale;
        # same pattern as the trainer-input materialization.
        base = c.select(id_col, "__v", cp("__v").alias("__cp"))
        base = base.localCheckpoint(eager=True)
        neigh = base.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__v").alias("__nv"),
            F.col("__cp.cell").alias("cell"),
            F.col("__cp.dmin").alias("__celld"),
        )
        q = base.select(
            F.col(id_col).alias("query_id"),
            F.col("__v").alias("__qv"),
            F.explode("__cp.probes").alias("cell"),
        )
        cos_sim = F.round(
            _np_cosine_pairs_int()(F.col("__qv"), F.col("__nv")), 6
        )
        if cell_cap is not None:
            wcap = Window.partitionBy("cell").orderBy(
                F.asc("__celld"), F.asc("neighbor_id")
            )
            neigh = (
                neigh.withColumn("__crn", F.row_number().over(wcap))
                .filter(F.col("__crn") <= cell_cap)
                .drop("__crn")
            )
        neigh = neigh.drop("__celld")
        scored = (
            q.join(neigh, "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", cos_sim.alias("cos_sim"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    if centroids is None:
        if n_cells is None:
            n = corpus.count()
            n_cells = max(8, int(n**0.5))
        centroids = ivf_centroids(
            corpus, n_cells, iterations, id_col, vec_col, deterministic
        )
    c = spread_small_scan(corpus).select(
        F.col(id_col), _to_double(vec_col).alias("__v")
    )
    if vectorized:
        cp = _np_cells_probes(centroids, nprobe)
        # One kernel pass for both self-join sides (see the fixed-point
        # branch above).
        base = c.select(id_col, "__v", cp("__v").alias("__cp"))
        base = base.localCheckpoint(eager=True)
        neigh = base.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__v").alias("__nv"),
            F.col("__cp.cell").alias("cell"),
            F.col("__cp.dmin").alias("__celld"),
        )
        q = base.select(
            F.col(id_col).alias("query_id"),
            F.col("__v").alias("__qv"),
            F.explode("__cp.probes").alias("cell"),
        )
        cos_sim = F.round(
            _np_cosine_pairs()(F.col("__qv"), F.col("__nv")), 6
        )
    else:
        cent_lit = F.array(
            *[_lit_vec_double(cv) for cv in centroids]
        )
        nds = F.transform(cent_lit, lambda cv: _l2sq(F.col("__v"), cv))
        # ONE evaluation of the K x dim distance transform, shared by both
        # self-join sides: `ranked`'s head element is exactly the old
        # `_assign_cells` + `array_min` pair — array_sort on (d, idx)
        # structs is lexicographic, so ranked[0] is the minimum distance
        # with the LOWEST index on ties, the same argmin tie rule — and
        # its first nprobe entries are the probe list. Materializing the
        # sliced ranking once (localCheckpoint) replaces the two
        # corpus-scan + distance-transform passes the separate neigh/q
        # projections paid.
        ranked = F.array_sort(
            F.transform(
                nds,
                lambda d, i: F.struct(d.alias("d"), i.alias("idx")),
            )
        )
        base = c.select(
            F.col(id_col),
            "__v",
            F.slice(ranked, 1, nprobe).alias("__pr"),
        )
        base = base.localCheckpoint(eager=True)
        neigh = base.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__v").alias("__nv"),
            F.col("__pr")[0]["idx"].alias("cell"),
            F.col("__pr")[0]["d"].alias("__celld"),
        )
        q = base.select(
            F.col(id_col).alias("query_id"),
            F.col("__v").alias("__qv"),
            F.explode(F.transform("__pr", lambda s: s.idx)).alias("cell"),
        )
        cos_sim = F.round(cosine(F.col("__qv"), F.col("__nv")), 6)
    if cell_cap is not None:
        wcap = Window.partitionBy("cell").orderBy(
            F.asc("__celld"), F.asc("neighbor_id")
        )
        neigh = (
            neigh.withColumn("__crn", F.row_number().over(wcap))
            .filter(F.col("__crn") <= cell_cap)
            .drop("__crn")
        )
    neigh = neigh.drop("__celld")
    scored = (
        q.join(neigh, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos_sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hard_negatives(
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    iterations: int = 3,
    n_cells: int | None = None,
    cell_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for every
    vector, the k most SIMILAR vectors carrying a DIFFERENT label (the
    negatives that sit closest to the decision boundary are the ones
    worth training on; random negatives are trivially separable). Runs on
    the fixed-point kNN machinery: sqrt(n) coarse cells, map-only
    assignment/probing against the broadcast integer centroids, ONE
    cell-key shuffle, label exclusion BEFORE the per-query top-k (a
    same-label neighbor must not occupy a rank). `nprobe` defaults higher
    than the plain kNN join because the nearest other-label vector is
    farther out than the nearest neighbor. Fully hash-provable — integer
    training/kernels as in `knn_join(fixed_point=True)`. Returns
    (query_id, query_label, neighbor_id, neighbor_label, cos_sim, rank)."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    centroids, n_cells = ivf_centroids_fp(
        corpus, n_cells, iterations, id_col, vec_col
    )
    c = spread_small_scan(corpus).select(
        F.col(id_col), F.col(label_col), quantize_fp(vec_col).alias("__v")
    )
    cp = _np_cells_probes_int(centroids, nprobe)
    # One kernel pass for both self-join sides (see knn_join).
    base = c.select(id_col, label_col, "__v", cp("__v").alias("__cp"))
    base = base.localCheckpoint(eager=True)
    neigh = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col("__v").alias("__nv"),
        F.col("__cp.cell").alias("cell"),
        F.col("__cp.dmin").alias("__celld"),
    )
    if cell_cap is not None:
        wcap = Window.partitionBy("cell").orderBy(
            F.asc("__celld"), F.asc("neighbor_id")
        )
        neigh = (
            neigh.withColumn("__crn", F.row_number().over(wcap))
            .filter(F.col("__crn") <= cell_cap)
            .drop("__crn")
        )
    neigh = neigh.drop("__celld")
    q = base.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col("__v").alias("__qv"),
        F.explode("__cp.probes").alias("cell"),
    )
    scored = (
        q.join(neigh, "cell")
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round(
                _np_cosine_pairs_int()(F.col("__qv"), F.col("__nv")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def streaming_ivfpq_ingest(
    stream_df,
    centroids: list[list[int]],
    books: list[list[list[int]]],
    store_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuous ENCODE-ON-INGEST into a pre-trained IVF-PQ index: each
    arriving vector is quantized, coarse-assigned, residual-encoded, and
    its reconstructed code row lands in its cell's partition — all inside
    a pure-Catalyst per-batch plan (integer expressions; the models ride
    as literals). The store IS the serving index: `ivfpq_probe_store`
    answers queries from it with partition pruning, and because encoding
    is a deterministic per-row projection, at-least-once replays write
    byte-identical rows that collapse on the id at probe time — the
    streamed index answers EXACTLY like the batch pipeline
    (`ivfpq_ann_topk`). The online half of offline-train/online-serve."""
    from flink_ci_flink_spark.streaming.core import foreach_batch_upsert

    cent_all = F.array(
        *[_lit_vec_long(cv) for cv in centroids]
    )

    def merge(batch_df, epoch_id: int) -> None:
        b = batch_df.select(F.col(id_col), quantize_fp(vec_col).alias("__q"))
        b = b.withColumn("cell", assign_cells_int_expr(F.col("__q"), centroids))
        b = b.withColumn(
            "__rv",
            F.zip_with(
                "__q",
                F.element_at(cent_all, F.col("cell") + 1),
                lambda x, y: x - y,
            ),
        ).select(id_col, "cell", _pq_recon_expr(books, "__rv").alias("__rr"))
        if b.take(1):
            b.withColumn("__epoch", F.lit(int(epoch_id))).write.mode(
                "append"
            ).partitionBy("cell").parquet(store_dir)

    return foreach_batch_upsert(stream_df, merge, checkpoint)


def ivfpq_probe_store(
    spark,
    store_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    nprobe: int = 2,
    shortlist: int = 50,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Answer IVF-PQ queries from the streamed code store: replay-dedup on
    the id (encode determinism makes duplicate rows identical), prune the
    read to the probed cells, then the shared `_ivfpq_score` tail. The
    re-rank side reads full vectors from `corpus` — at 100 TB that fetch
    touches shortlist x queries rows only."""
    from flink_ci_flink_spark.pipeline.dedup import spread_small_scan

    c = spread_small_scan(corpus).select(
        F.col(id_col), quantize_fp(vec_col).alias("__q")
    )
    cp = _np_cells_probes_int(centroids, nprobe)
    q = queries.select(F.col(query_id_col), quantize_fp(vec_col).alias("__qq"))
    qp = q.select(
        query_id_col, "__qq", F.explode(cp("__qq").getField("probes")).alias("cell")
    )
    probe_cells = sorted({r.cell for r in qp.select("cell").distinct().collect()})
    corp = (
        spark.read.parquet(store_dir)
        .filter(F.col("cell").isin(probe_cells))
        .select(id_col, F.col("cell").cast("int").alias("cell"), "__rr")
        .dropDuplicates([id_col])
    )
    return _ivfpq_score(
        corp, c, qp, centroids, shortlist, k, id_col, query_id_col
    )


def streaming_ivf_ingest(
    stream_df,
    centroids: list[list[float]],
    store_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuous embedding ingest into a PRE-TRAINED IVF index (the
    production ANN shape: the coarse quantizer is trained offline once;
    arriving vectors are assigned map-only and land in their cell's
    partition). Each micro-batch appends ``(id, vector, cell)`` rows
    PARTITIONED BY cell, so `finalize_knn_join` — and any later probe —
    reads only the probed cells' files (partition pruning is the
    inverted-file structure on disk). At-least-once replays collapse on
    the id at finalize. Returns the started StreamingQuery."""
    from flink_ci_flink_spark.streaming.core import foreach_batch_upsert

    def merge(batch_df, epoch_id: int) -> None:
        b = batch_df.select(
            F.col(id_col), _to_double(vec_col).alias("__v")
        ).withColumn("cell", _assign_cells(F.col("__v"), centroids))
        if b.take(1):
            b.withColumn("__epoch", F.lit(int(epoch_id))).write.mode(
                "append"
            ).partitionBy("cell").parquet(store_dir)

    return foreach_batch_upsert(stream_df, merge, checkpoint)


def finalize_knn_join(
    spark,
    store_dir: str,
    centroids: list[list[float]],
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Close the streaming IVF ingest: replay-dedup on the vector id,
    then the same bucketed kNN self-join as the batch path — identical
    results to `knn_join(corpus, centroids=...)` over the full corpus
    (asserted in tests/test_streaming_curation.py). The neighbor side
    comes straight from the cell-partitioned store."""
    vecs = (
        spark.read.parquet(store_dir)
        .dropDuplicates([id_col])
        .select(F.col(id_col), F.col("__v").alias("embedding"))
    )
    return knn_join(
        vecs,
        nprobe=nprobe,
        k=k,
        id_col=id_col,
        centroids=centroids,
    )


def random_projection(
    df: DataFrame,
    dim: int,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7000,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: reduce ``dim``-wide
    embeddings to ``out_dim`` components ``p0..p{out_dim-1}``, each the
    dot product against a deterministic md5-derived hyperplane (the same
    generator as the sign-LSH buckets, minus the sign) scaled by
    1/sqrt(out_dim) — the JL scaling under which pairwise distances are
    preserved in expectation (Johnson & Lindenstrauss 1984; dense
    variant of Achlioptas 2003's database-friendly projections).

    The curation role: a map-only pass that shrinks the embedding payload
    4–16× before ANN indexing / clustering / near-dup screens — at 100 TB
    the projection is free (no shuffle, no model, planes are plan
    literals; the scan reads only (id, vec)) and every downstream
    distance computation gets proportionally cheaper. Projections are
    JVM-side aggregate folds in double precision; fully replayable in
    SQL from the same inlined plane literals."""
    import math

    scale = 1.0 / math.sqrt(out_dim)
    v = _to_double(vec_col)
    outs = [
        (
            dot(v, _lit_vec_double(_hyperplane(seed + k, dim)))
            * F.lit(scale)
        ).alias(f"p{k}")
        for k in range(out_dim)
    ]
    return df.select(F.col(id_col), *outs)


def rerank_by_cosine(
    candidates: DataFrame,
    corpus_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Second-stage dense reranker for a two-stage retrieval cascade
    (BM25 / ANN recall stage → exact-cosine precision stage — the standard
    hybrid-retrieval shape of a RAG / curation stack).

    ``candidates`` is the first stage's (query_id, id_col, score) —
    typically `text.bm25_topk` output; ``query_vecs`` is (query_id,
    vec_col). Each candidate is scored by exact cosine against its query
    vector and the top ``k`` per query survive (cos desc, id asc —
    deterministic).

    Scale shape: candidates are |Q|·k_candidates rows — tiny next to the
    corpus — so the embedding fetch is one join keyed on the corpus id
    (Catalyst picks broadcast when the candidate side fits) and the query
    vectors are always broadcast; no all-pairs work anywhere.
    Returns (query_id, id_col, score, cos_sim, rank)."""
    c = corpus_vecs.select(
        F.col(vec_id_col).alias(id_col), _to_double(vec_col).alias("__cv")
    )
    q = query_vecs.select("query_id", _to_double(vec_col).alias("__qv"))
    scored = (
        candidates.join(c, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            "score",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)
