"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k. The query side is small and
  broadcast; the corpus is scanned once — at 100 TB this is one pass, no
  shuffle (rank via per-query window over the (tiny) #queries x #corpus
  candidate set is replaced by groupBy-topk aggregation).
- ``lsh_topk``: random-hyperplane LSH — signature = sign bits of dot
  products with seeded gaussian hyperplanes; candidates bucket-join on
  signature prefix bands, then exact re-rank. Probing b bands of w bits
  costs #corpus x b rows of shuffle, never #queries x #corpus.

Cosine is computed with built-in higher-order functions (zip_with +
aggregate) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def cosine_expr(a: str, b: str, decimals: int = 6):
    """round(dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))), decimals) as a Column.

    Elements are cast to double BEFORE multiply/accumulate: float32 products
    accumulated in float32 drift up to ~1e-6 (enough to flip the 6th
    decimal), while double math agrees bit-for-bit with DuckDB's
    list_cosine_similarity over DOUBLE[] (verified: identical 6-decimal
    values on the test embeddings). Fold order is index order."""
    ad = F.col(a).cast("array<double>")
    bd = F.col(b).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    nb = F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    return F.round(dot / (F.sqrt(na) * F.sqrt(nb)), decimals)


def cosine_pairs_udf():
    """Arrow-batched pairwise cosine: round(dot/(|a||b|), 6) over two
    array columns, one vectorized numpy pass per batch. Same double math
    and rounding as ``cosine_expr`` (dot-product error ~1e-15 << the 6th
    decimal, so the two agree after rounding), but ~10x faster when the
    pair count is large — the HOF fold is interpreted per element, which
    dominated the LSH dedup verify stage (measured 22s -> ~4s on 2M
    candidate pairs x 64 dims)."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series(np.zeros(0))
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        return pd.Series(np.round(dots / (na * nb), 6))

    return cos


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Returns
    (query_id, neighbor_id, cosine, rank). Ties broken by neighbor id."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv"))
    scored = (
        c.join(F.broadcast(q))
        .withColumn("cosine", cosine_expr("__cv", "__qv"))
        .drop("__cv", "__qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(float).tolist()


def signature_udf(spark, planes: list[list[float]], decimals: int | None = None):
    """Vectorized hyperplane signature: bit i = 1 iff dot(vec, plane_i) > 0,
    packed into a bigint.

    Implemented as an Arrow-batched pandas UDF doing ONE numpy matmul per
    batch — a per-bit fold of higher-order-function aggregates builds a
    1000+-node expression tree that Catalyst analyzes/interprets per element
    (measured 200s+ on 500 rows); the matmul path is milliseconds.

    ``decimals``: round each dot product before taking its sign. The sign
    of a raw double dot depends on summation order in the last ulp;
    rounding first (to e.g. 6 decimals) makes the signature reproducible
    against an engine that folds in a different order (the same protocol
    as ``cosine_expr``), which is what lets an LSH entry carry an exact
    DuckDB oracle."""

    planes_m = np.asarray(planes, dtype=np.float64)  # [bits, dim]
    bc = spark.sparkContext.broadcast(planes_m)

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        m = bc.value
        out = np.zeros(len(vecs), dtype=np.int64)
        if len(vecs):
            mat = np.stack(vecs.to_numpy())  # [n, dim]
            dots = mat.astype(np.float64) @ m.T
            if decimals is not None:
                dots = np.round(dots, decimals)
            bits = dots > 0  # [n, bits]
            out = (bits * (1 << np.arange(m.shape[0], dtype=np.int64))).sum(axis=1)
        return pd.Series(out)

    return sig


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 5,
    sample_rows: int = 50_000,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means on a driver-collected sample: returns L2-normalized
    centroids [n_cells, dim]. Deterministic (seeded init, argmax ties ->
    lowest index). The sample bound keeps the driver footprint constant at
    any corpus scale; centroid quality depends on rows seen, not corpus
    size.

    The sample is drawn via orderBy(rand(seed)).limit(n) — Spark plans this
    as TakeOrderedAndProject (per-partition top-n + merge, no full sort), so
    every partition contributes uniformly. A plain ``limit(n)`` would take
    the first partitions only, which at real scale means one source or time
    range — biased centroids exactly when the corpus is partition-skewed."""
    pdf = (
        corpus.select(vec_col)
        .orderBy(F.rand(seed))
        .limit(sample_rows)
        .toPandas()
    )
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return kmeans_np(mat, n_cells, seed, iters)


def kmeans_np(mat: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Pure-numpy spherical k-means on an in-memory matrix (the fit step
    shared by the Spark sampling path above and the oracle entry, which
    must reproduce the same centroids without a SparkSession)."""
    mat = mat.astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_cells = min(n_cells, len(mat))
    cents = mat[rng.choice(len(mat), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
            else:  # re-seed empty cell deterministically
                cents[c] = mat[rng.randint(len(mat))]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 5,
    centroids: np.ndarray | None = None,
    decimals: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: spherical-k-means cells; each query
    probes its ``n_probe`` nearest centroids; exact cosine re-rank within
    probed cells. ``centroids``: inject a precomputed [n_cells, dim]
    L2-normalized matrix instead of fitting here. ``decimals``: round
    centroid dots before argmax/argsort (ties -> lowest cell), making
    assignment and probing engine-reproducible for an exact oracle.

    Scale path: cell assignment is one narrow scan (Arrow-batched argmax
    matmul, centroids broadcast); candidate selection is an equi-join of the
    corpus against a tiny broadcast (query, cell) probe list — shuffle-free.
    At 100 TB the corpus would be WRITTEN partitioned by cell id
    (partitionBy('__cell')), making each probe a partition-pruned read of
    n_probe/n_cells of the data instead of a full scan."""
    spark = corpus.sparkSession
    cents = centroids if centroids is not None else kmeans_centroids(corpus, vec_col, n_cells, seed)
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        c = bc.value
        out = np.zeros(len(vecs), dtype=np.int32)
        if len(vecs):
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = mat @ c.T
            if decimals is not None:
                dots = np.round(dots, decimals)
            out = np.argmax(dots, axis=1).astype(np.int32)
        return pd.Series(out)

    corpus_cells = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cell", cell_of(F.col("__cv")))

    # probe list: tiny (queries x n_probe), computed on the driver
    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qmat = np.stack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qmat @ cents.T
    if decimals is not None:
        sims = np.round(sims, decimals)
    probes = np.argsort(-sims, axis=1, kind="stable")[:, : min(n_probe, cents.shape[0])]
    probe_rows = [
        (int(qid), int(cell))
        for qid, row in zip(q_pdf[query_id_col], probes)
        for cell in row
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, __cell int")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )

    cand = (
        corpus_cells.join(F.broadcast(probe_df), "__cell")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "__cv", "__qv")
    )
    scored = cand.withColumn("cosine", cosine_expr("__cv", "__qv")).drop("__cv", "__qv")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 5,
    centroids: np.ndarray | None = None,
    decimals: int | None = None,
) -> np.ndarray:
    """Materialize the IVF layout the in-memory ``ivf_topk`` docstring
    promises: assign every vector to its nearest spherical-k-means cell
    (Arrow-batched argmax matmul, centroids broadcast) and WRITE the
    corpus hive-partitioned by ``cell`` — one directory per cell.
    Centroids persist as ``_centroids.npy`` beside the parquet tree.

    This is the 100 TB serving shape: a probe of n_probe cells becomes a
    partition-pruned scan (the plan shows PartitionFilters on ``cell``,
    asserted in tests/test_pipeline.py) reading n_probe/n_cells of the
    data — nothing else is opened, let alone scanned."""
    spark = corpus.sparkSession
    cents = centroids if centroids is not None else kmeans_centroids(corpus, vec_col, n_cells, seed)
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        c = bc.value
        out = np.zeros(len(vecs), dtype=np.int32)
        if len(vecs):
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = mat @ c.T
            if decimals is not None:
                dots = np.round(dots, decimals)
            out = np.argmax(dots, axis=1).astype(np.int32)
        return pd.Series(out)

    (
        corpus.select(id_col, vec_col)
        .withColumn("cell", cell_of(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    import os

    np.save(os.path.join(path, "_centroids.npy"), cents)
    return cents


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_probe: int = 8,
    decimals: int | None = None,
) -> DataFrame:
    """ANN top-k over a persisted IVF index (``ivf_write_index``): compute
    each query's n_probe nearest centroids on the driver (tiny matmul),
    scan ONLY those cells via a partition filter (``cell IN (...)`` prunes
    directories before any I/O), then broadcast-join the probe list and
    exact-cosine re-rank — identical math to the in-memory ``ivf_topk``
    given the same centroids (asserted in tests)."""
    import os

    cents = np.load(os.path.join(path, "_centroids.npy"))
    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qmat = np.stack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qmat @ cents.T
    if decimals is not None:
        sims = np.round(sims, decimals)
    probes = np.argsort(-sims, axis=1, kind="stable")[:, : min(n_probe, cents.shape[0])]
    probe_rows = [
        (int(qid), int(cell))
        for qid, row in zip(q_pdf[query_id_col], probes)
        for cell in row
    ]
    needed_cells = sorted({c for _, c in probe_rows})

    corpus_cells = spark.read.parquet(path).filter(F.col("cell").isin(needed_cells))
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cell int")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    cand = (
        corpus_cells.withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "__cv")
        .join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "__cv", "__qv")
    )
    scored = cand.withColumn("cosine", cosine_expr("__cv", "__qv")).drop("__cv", "__qv")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    bits: int = 16,
    bands: int = 4,
    seed: int = 11,
    dim: int = 64,
    decimals: int | None = None,
) -> DataFrame:
    """ANN top-k: hyperplane signatures banded into ``bands`` blocks;
    candidates = corpus rows sharing >= 1 block with the query; exact cosine
    re-rank of candidates. Recall rises with bands (multiprobe).
    ``decimals``: see signature_udf — set (e.g. 6) for engine-reproducible
    signatures, enabling an exact oracle."""
    planes = _hyperplanes(dim, bits, seed)
    width = bits // bands
    sig = signature_udf(corpus.sparkSession, planes, decimals=decimals)

    def banded(df: DataFrame, idc: str, vc: str, out_id: str) -> DataFrame:
        s = df.withColumn("__sig", sig(F.col(vc)))
        return s.select(
            F.col(idc).alias(out_id),
            F.col(vc),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("block"),
                            F.shiftright(F.col("__sig"), bi * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                            .alias("key"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(out_id, vc, "bb.block", "bb.key")

    cb = banded(corpus, id_col, vec_col, "neighbor_id").withColumnRenamed(vec_col, "__cv")
    qb = banded(queries, query_id_col, query_vec_col, "query_id").withColumnRenamed(query_vec_col, "__qv")
    cand = (
        cb.join(F.broadcast(qb), ["block", "key"])
        .select("query_id", "neighbor_id", "__cv", "__qv")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine_expr("__cv", "__qv")).drop("__cv", "__qv")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


_KNN_SCHEMA = "vec_id long, neighbor_id long, cosine double, rank int"


def knn_graph(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
    driver_rows: int = 20_000,
) -> DataFrame:
    """Exact k-NN graph: for EVERY vector, its top-k neighbors by cosine
    (self excluded; ties -> lowest neighbor id). The k-NN graph is the
    substrate for SemDeDup-style semantic clustering and graph-based
    pruning of training corpora.

    Same three measured regimes as ``embedding_dup_pairs`` (driver matmul /
    broadcast matmul via mapInPandas / see below), because the naive
    crossJoin + per-row cosine HOF was measured at 464s for 12.5M pairs
    while the matmul path is seconds. Cosines are rounded to 6 decimals
    BEFORE ranking so the (cosine desc, neighbor asc) order is
    engine-reproducible.

    Beyond ``max_broadcast_rows`` the exact graph is quadratic and the
    right tool is the approximate route (``ivf_topk_from_index`` probes a
    partition-pruned index; ``lsh_topk`` buckets by hyperplane signature)
    — this function raises rather than silently launching an n^2 job.
    """
    import pandas as pd

    spark = df.sparkSession
    n = df.count()
    if n > max_broadcast_rows:
        raise ValueError(
            f"knn_graph is exact/quadratic; corpus has {n} rows > "
            f"{max_broadcast_rows}. Use ivf_topk_from_index or lsh_topk."
        )

    pdf_all = df.select(id_col, vec_col).toPandas()
    ids = pdf_all[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(pdf_all[vec_col].to_numpy()).astype(np.float64)
    # epsilon guard (same as kmeans_np/ivf_topk): a zero-norm embedding must
    # yield cosine 0, not NaN (NaN would silently drop that row's neighbors
    # and diverge from the SQL oracle)
    norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)

    def _topk_block(bids: np.ndarray, bm: np.ndarray, bnorms: np.ndarray) -> "pd.DataFrame":
        sims = np.round((bm @ mat.T) / (bnorms[:, None] * norms[None, :]), 6)
        # exclude self by id (not by position: block rows vs full columns)
        sims[bids[:, None] == ids[None, :]] = -np.inf
        rows = []
        for r in range(sims.shape[0]):
            # order by (-cosine, neighbor_id): lexsort keys are last-first.
            # Drop non-finite entries (the self slot) BEFORE taking top-k so
            # ranks are dense (1..k) like the oracle's ROW_NUMBER — filtering
            # after enumerate gapped ranks whenever the corpus had <= k rows.
            order = np.lexsort((ids, -sims[r]))
            order = order[np.isfinite(sims[r, order])][:k]
            for rank, j in enumerate(order, start=1):
                rows.append((int(bids[r]), int(ids[j]), float(sims[r, j]), rank))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cosine", "rank"])

    if n <= driver_rows:
        out = _topk_block(ids, mat, norms)
        return spark.createDataFrame(out, schema=_KNN_SCHEMA)

    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def blocks(batches):
        nonlocal_ids, nonlocal_mat, nonlocal_norms = bc.value
        for b in batches:
            bm = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            bids = b[id_col].to_numpy(dtype=np.int64)
            bnorms = np.maximum(np.linalg.norm(bm, axis=1), 1e-12)
            sims = np.round(
                (bm @ nonlocal_mat.T) / (bnorms[:, None] * nonlocal_norms[None, :]), 6
            )
            sims[bids[:, None] == nonlocal_ids[None, :]] = -np.inf
            rows = []
            for r in range(sims.shape[0]):
                order = np.lexsort((nonlocal_ids, -sims[r]))
                order = order[np.isfinite(sims[r, order])][:k]
                for rank, j in enumerate(order, start=1):
                    rows.append(
                        (int(bids[r]), int(nonlocal_ids[j]), float(sims[r, j]), rank)
                    )
            yield pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cosine", "rank"])

    # cluster-width fan-out, not a constant (the driver benches at several
    # core counts; a production cluster is not 32-wide). Per-row outputs
    # depend only on the broadcast corpus, so the partition count never
    # changes the emitted neighbor set.
    width = spark.sparkContext.defaultParallelism
    return df.select(id_col, vec_col).repartition(width).mapInPandas(blocks, schema=_KNN_SCHEMA)


# ------------------------------------------------------------------ PQ (ANN)
def kmeans_l2_np(mat: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Plain (euclidean) k-means, deterministic numpy — the PQ codebook
    fit. Unlike ``kmeans_np`` above there is NO row normalization: PQ
    quantizes raw subvectors, not directions."""
    mat = mat.astype(np.float64)
    rng = np.random.RandomState(seed)
    k = min(k, len(mat))
    cents = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                cents[c] = mat[rng.randint(len(mat))]
    return cents


def pq_fit(mat: np.ndarray, m: int = 8, k: int = 16, seed: int = 5) -> np.ndarray:
    """Product-quantization codebooks: split the dim-D vectors into ``m``
    contiguous subspaces and fit an independent ``k``-code euclidean
    codebook per subspace. Returns [m, k, D/m]. The fit runs on a bounded
    sample (here: the collected matrix) — at 100 TB you fit on a few
    hundred thousand sampled rows; ENCODING is the corpus-sized job and
    that is map-only."""
    n, D = mat.shape
    assert D % m == 0, (D, m)
    dsub = D // m
    return np.stack(
        [kmeans_l2_np(mat[:, j * dsub : (j + 1) * dsub], k, seed + j) for j in range(m)]
    )


def _pq_d2(x: np.ndarray, cents: np.ndarray, decimals: int | None) -> np.ndarray:
    """Squared L2 between rows of x [N,d] and codes [k,d] via the
    engine-reproducible expansion ROUND(xx - 2*xc + cc, decimals) — the
    same fixed combination the SQL oracle writes, so assignment ties break
    identically."""
    xx = (x * x).sum(-1)[:, None]
    cc = (cents * cents).sum(-1)[None, :]
    xc = x @ cents.T
    d2 = (xx - 2 * xc) + cc
    return np.round(d2, decimals) if decimals is not None else d2


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int | None = None,
) -> DataFrame:
    """Encode every vector to m uint8 codes (argmin distance per subspace,
    ties -> lowest code): Arrow-batched mapInPandas, codebooks broadcast —
    the corpus-sized PQ job, map-only, 32x compression at m=8/k=16 over
    64 float32 dims."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    m, k, dsub = codebooks.shape

    def run(batches):
        cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                d2 = _pq_d2(mat[:, j * dsub : (j + 1) * dsub], cb[j], decimals)
                codes[:, j] = np.argmin(d2, axis=1)  # first minimum = lowest code
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes.tolist())}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        run, schema="vec_id long, codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    decimals: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k: queries stay exact, the corpus is its
    codes. Per query an [m, k] distance table is built once; scoring a
    corpus vector is m table lookups + a sum — THE trick that makes
    billion-vector scans memory- and compute-cheap. Plan shape: encode is
    map-only; scoring is one mapInPandas over the encoded corpus with the
    tiny query tables broadcast; top-k is a per-query window."""
    spark = corpus.sparkSession
    m, kk, dsub = codebooks.shape
    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qmat = np.stack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    qids = q_pdf[query_id_col].to_numpy()
    tables = np.stack(
        [
            np.stack(
                [_pq_d2(qmat[:, j * dsub : (j + 1) * dsub], codebooks[j], decimals)[i]
                 for j in range(m)]
            )
            for i in range(len(qmat))
        ]
    )  # [n_q, m, k]
    bc = spark.sparkContext.broadcast((qids, tables))
    encoded = pq_encode(corpus, codebooks, id_col, vec_col, decimals)

    def score(batches):
        ids, tabs = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # [N, m]
            rows = []
            for qi, qid in enumerate(ids):
                t = tabs[qi]  # [m, k]
                adc = t[np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
                if decimals is not None:
                    adc = np.round(adc, decimals)
                for nid, s in zip(pdf["vec_id"].to_numpy(), adc):
                    rows.append((int(qid), int(nid), float(s)))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc"])

    scored = encoded.mapInPandas(score, schema="query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    decimals: int | None = None,
) -> DataFrame:
    """IVF-PQ — the production billion-vector index (FAISS's default
    shape): a coarse quantizer routes each vector to a cell; within cells,
    vectors live as PQ codes. A query probes its n_probe nearest cells and
    ADC-scores ONLY those cells' codes.

    One mapInPandas pass builds the full index row (cell id + m codes) —
    at 100 TB this is the single corpus read, written partitioned by cell
    (see ``ivf_write_index``); the probe is then a partition-pruned read
    of n_probe/n_cells of the data and scoring touches bytes, not floats.
    Candidate selection is an equi-join against a tiny broadcast
    (query, cell) list; nothing is ever #queries x #corpus."""
    spark = corpus.sparkSession
    m, kk, dsub = codebooks.shape
    bc = spark.sparkContext.broadcast((centroids, codebooks))

    def index_rows(batches):
        cents, cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = unit @ cents.T
            if decimals is not None:
                dots = np.round(dots, decimals)
            cells = np.argmax(dots, axis=1).astype(np.int32)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                d2 = _pq_d2(mat[:, j * dsub : (j + 1) * dsub], cb[j], decimals)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells,
                    "codes": list(codes.tolist()),
                }
            )

    index = corpus.select(id_col, vec_col).mapInPandas(
        index_rows, schema="vec_id long, cell int, codes array<int>"
    )

    # probe list + per-query ADC tables: tiny, driver-side
    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qmat = np.stack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    qunit = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qunit @ centroids.T
    if decimals is not None:
        sims = np.round(sims, decimals)
    probes = np.argsort(-sims, axis=1, kind="stable")[:, : min(n_probe, len(centroids))]
    probe_rows = [
        (int(qid), int(c))
        for qid, row in zip(q_pdf[query_id_col], probes)
        for c in row
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cell int")
    tables = {
        int(qid): np.stack(
            [_pq_d2(qmat[i : i + 1, j * dsub : (j + 1) * dsub], codebooks[j], decimals)[0]
             for j in range(m)]
        )
        for i, qid in enumerate(q_pdf[query_id_col])
    }
    tab_bc = spark.sparkContext.broadcast(tables)

    cand = index.join(F.broadcast(probe_df), "cell").select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "codes"
    )

    def score(batches):
        tabs = tab_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())
            out = np.empty(len(pdf))
            for qid in np.unique(pdf["query_id"].to_numpy()):
                mask = (pdf["query_id"] == qid).to_numpy()
                t = tabs[int(qid)]
                adc = t[np.arange(codes.shape[1])[None, :], codes[mask]].sum(axis=1)
                out[mask] = np.round(adc, decimals) if decimals is not None else adc
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc": out,
                }
            )

    scored = cand.mapInPandas(score, schema="query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfpq_write_index(
    corpus: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int | None = None,
) -> None:
    """Materialize the IVF-PQ serving layout: one mapInPandas pass over
    the corpus emits (vec_id, cell, codes) and WRITES it hive-partitioned
    by cell — the float vectors never persist, only m small ints per row
    (32x smaller at m=8/k=16 over 64 float32 dims). Quantizers persist as
    .npy beside the parquet tree. This is the single corpus read of an
    index build at 100 TB."""
    import os

    import json
    import shutil
    import uuid

    # build into a side tree and swap: a REBUILD over an existing index
    # (the drift-triggered maintenance path) must never wipe the old
    # sidecars before the corpus-sized parquet write finishes — a crash
    # in that window would leave codes with no codebooks (bricked index),
    # the same discipline the delete path follows
    tmp = path + f".new-{uuid.uuid4().hex[:8]}"
    (
        _ivfpq_encode(corpus, centroids, codebooks, id_col, vec_col, decimals)
        .write.partitionBy("cell")
        .parquet(tmp)
    )
    np.save(os.path.join(tmp, "_centroids.npy"), centroids)
    np.save(os.path.join(tmp, "_codebooks.npy"), codebooks)
    # the build's own cell balance, measured from the just-written codes
    # (ONE bytes-only scan of the side tree — the same ivfpq_imbalance the
    # maintain loop measures with, so anchor and signal can never diverge
    # — before the swap so the meta is crash-consistent): the anchor for
    # maintain's absolute drift policy, "rebuild when imbalance exceeds
    # ratio x what THIS fit achieved", which catches slow drift accrued
    # across many small ingests that each pass the per-ingest check
    spark = corpus.sparkSession
    try:
        imbalance_at_build = ivfpq_imbalance(spark, tmp)
    except Exception as e:
        # an empty corpus writes a partitioned dir with no part files and
        # the Spark-fallback read fails schema inference — refuse cleanly
        # (an empty index is unreadable everywhere else too) and drop the
        # side tree
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            "refusing to build an IVF-PQ index over an empty corpus "
            "(no code rows written)"
        ) from e
    if imbalance_at_build == 0.0:
        # footer-based counts return 0.0 for a rowless tree instead of
        # raising (n > 0 implies factor >= 1 by Cauchy-Schwarz, so 0.0
        # is unambiguous) — same refusal as the read-failure path above
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            "refusing to build an IVF-PQ index over an empty corpus "
            "(no code rows written)"
        )
    # decimals is part of the encoding config exactly like the quantizers:
    # append must reuse it or borderline vectors drift from a rebuild
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump(
            {"decimals": decimals, "imbalance_at_build": imbalance_at_build}, fh
        )
    if os.path.exists(path):
        old = path + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


def _ivfpq_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str,
    vec_col: str,
    decimals: int | None,
) -> DataFrame:
    """(vec_id, cell, codes) rows for a vector batch under FIXED
    quantizers — shared by the full build and the incremental append, so
    both paths provably assign identical codes to identical vectors."""
    spark = corpus.sparkSession
    m, kk, dsub = codebooks.shape
    bc = spark.sparkContext.broadcast((centroids, codebooks))

    def index_rows(batches):
        cents, cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = unit @ cents.T
            if decimals is not None:
                dots = np.round(dots, decimals)
            cells = np.argmax(dots, axis=1).astype(np.int32)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                d2 = _pq_d2(mat[:, j * dsub : (j + 1) * dsub], cb[j], decimals)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells,
                    "codes": list(codes.tolist()),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        index_rows, schema="vec_id long, cell int, codes array<int>"
    )


_META_AUTO = "auto"


_IVFPQ_CODES_SCHEMA = "vec_id long, codes array<int>, cell int"


def _ivfpq_read(spark, path: str):
    """Read the IVF-PQ codes tree with its FIXED schema (declared by the
    encode mapInPandas and preserved by every rewrite; ``cell`` is the
    int partition column) — no footer-inference job per read."""
    return spark.read.schema(_IVFPQ_CODES_SCHEMA).parquet(path)


def ivfpq_append_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int | None | str = _META_AUTO,
    validate: bool = False,
) -> None:
    """Incremental index maintenance (FAISS ``IndexIVFPQ.add`` analog):
    encode ONLY the new vectors under the index's SAVED quantizers and
    append their code files into the existing cell partitions — O(|new
    batch|) work however large the index, the nightly-ingest path that
    makes a billion-vector index maintainable without rebuilds. Because
    the quantizers are loaded from the index (never refit), the appended
    codes are bit-identical to what a full rebuild over the union would
    assign, so probes return exactly the rebuilt index's answers — the
    append entry shares the rebuild's oracle on that argument. Quantizer
    drift (cells that grow unbalanced as the distribution shifts) is the
    signal to schedule a REBUILD; that decision is the caller's, exactly
    as in FAISS.

    ``decimals`` defaults to the value the INDEX was built with (read
    from the _meta.json sidecar — it is part of the encoding config
    exactly like the quantizers, so a caller-remembered argument would
    be a silent drift hazard); pass an explicit value only to override.
    New ids must not already be indexed (an upsert deletes first);
    ``validate=True`` enforces it with one broadcast semi-join against
    the code rows — index-sized, so off by default exactly as in FAISS,
    which also trusts the caller here."""
    import json
    import os

    if validate:
        clash = (
            new_vectors.sparkSession.read.parquet(path)
            .join(
                F.broadcast(
                    new_vectors.select(F.col(id_col).alias("vec_id")).distinct()
                ),
                "vec_id",
            )
            .select("vec_id").limit(1).collect()
        )
        if clash:
            raise ValueError(
                f"vec_id {clash[0]['vec_id']} is already indexed — append "
                "requires new ids; delete first for an upsert"
            )
    if decimals == _META_AUTO:
        meta_path = os.path.join(path, "_meta.json")
        if not os.path.exists(meta_path):
            raise ValueError(
                f"no _meta.json at {path} — this index predates the "
                "encoding-config sidecar, so the build's decimals cannot "
                "be recovered; pass decimals= explicitly (a silent guess "
                "would drift appended codes from a rebuild)"
            )
        with open(meta_path) as fh:
            decimals = json.load(fh).get("decimals")
    centroids = np.load(os.path.join(path, "_centroids.npy"))
    codebooks = np.load(os.path.join(path, "_codebooks.npy"))
    (
        _ivfpq_encode(new_vectors, centroids, codebooks, id_col, vec_col, decimals)
        # batch-sized shuffle keyed like the layout (see the BM25 append):
        # unrepartitioned, the append fans out to #batch-partitions x
        # #cells files and every later probe/maintain pays the open cost
        .repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


def _ivfpq_delete_stats(index, ids_df, broadcast_ids: bool) -> tuple[int, int]:
    """(victims found, survivor rows) in ONE pass over the code rows: a
    left join against the victim ids feeds both the distinct-victim count
    (countDistinct, not row count — a precondition-violating double-append
    can leave duplicate rows per id, and the contract counts VECTORS) and
    the survivor-row count that guards the empty-index refusal. The
    previous shape paid a second scan (``remaining.limit(1).count()``)
    for a bit the same scan already knows."""
    hit = ids_df.withColumn("_hit", F.lit(True))
    if broadcast_ids:
        hit = F.broadcast(hit)
    row = (
        index.join(hit, "vec_id", "left")
        .agg(
            F.countDistinct(
                F.when(F.col("_hit"), F.col("vec_id"))
            ).alias("n_del"),
            F.count(F.when(F.col("_hit").isNull(), F.lit(1))).alias("n_rem"),
        )
        .collect()[0]
    )
    return int(row["n_del"] or 0), int(row["n_rem"] or 0)


def ivfpq_delete_from_index(
    spark,
    path: str,
    vec_ids: list[int] | None = None,
    victims: DataFrame | None = None,
    id_col: str = "vec_id",
) -> int:
    """Delete vectors from the persisted IVF-PQ index (FAISS
    ``remove_ids`` analog): anti-join the victim ids out of the code
    rows in ONE index-sized pass (codes are bytes — this never touches
    float vectors or any corpus-scale table) and swap the rewritten
    cell-partitioned tree in. Victims are given EITHER as an id list
    (``vec_ids``, the FAISS-shaped API, broadcast-joined) OR as a
    DataFrame (``victims`` — any frame whose ``id_col`` column holds the
    victim ids, e.g. the result of a predicate over the corpus). The
    DataFrame form never routes ids through the driver, so a
    delete-by-predicate matching a corpus fraction stays fully
    distributed (join strategy left to AQE — such a side must not be
    forced broadcast). Quantizers are untouched, so the surviving
    rows are byte-identical to a fresh build over the survivors and
    probes return exactly the rebuilt index's answers. Batch ids, call
    once; duplicate victim ids are deduped. Deleting EVERY vector
    is refused before any mutation (an empty partitioned write leaves a
    schema-less dir — drop the index dir instead). Returns the number of
    distinct vectors removed."""
    import os
    import shutil

    from naru_spark.pipeline.retrieval import _swap_in

    if (vec_ids is None) == (victims is None):
        raise ValueError("pass exactly one of vec_ids= or victims=")
    if victims is not None:
        # pin ONE evaluation of the caller's plan (count + anti-join are
        # separate jobs; a non-deterministic victims frame evaluated twice
        # would count one draw and delete another). Eager localCheckpoint
        # severs lineage: a lost block fails loudly, never re-draws.
        # lazy pin: the delete-stats aggregate (the first action over
        # the ids) materializes the checkpoint — same guarantee, one
        # fewer Spark job per delete
        ids_df = victims.select(
            F.col(id_col).cast("long").alias("vec_id")
        ).distinct().localCheckpoint(eager=False)
        broadcast_ids = False  # corpus-fraction side: AQE picks the strategy
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in set(vec_ids)], "vec_id long"
        )
        broadcast_ids = True
    try:
        index = _ivfpq_read(spark, path)
        n_del, n_rem = _ivfpq_delete_stats(index, ids_df, broadcast_ids)
        if n_del == 0:
            return 0
        join_side = F.broadcast(ids_df) if broadcast_ids else ids_df
        remaining = index.join(join_side, "vec_id", "left_anti").select(
            "vec_id", "codes", "cell"  # original schema order
        )
        if n_rem == 0:
            raise ValueError(
                "delete would remove every indexed vector — an empty "
                "partitioned index is unreadable; drop the index dir instead"
            )

        # the quantizer/meta sidecars must be COPIED INTO the replacement
        # tree BEFORE the rename: if the sidecars only existed in process
        # memory during the swap, a crash in that window would leave codes
        # on disk with no codebooks to decode them — a bricked index
        sidecars = [
            f for f in ("_centroids.npy", "_codebooks.npy", "_meta.json")
            if os.path.exists(os.path.join(path, f))
        ]

        def write_with_sidecars(df: DataFrame, tmp: str) -> None:
            df.write.partitionBy("cell").parquet(tmp)
            for f in sidecars:
                shutil.copy2(os.path.join(path, f), os.path.join(tmp, f))

        # repartition by the layout key before the partitioned rewrite
        # (same discipline as the BM25 merge path): otherwise the survivor
        # tree fans out to #scan-partitions x #cells files and every later
        # probe/maintain pays the open/footer overhead
        _swap_in(remaining.repartition("cell"), path, writer=write_with_sidecars)
        return n_del
    finally:
        if victims is not None:
            # best-effort: per-micro-batch delete/upsert loops must not
            # accumulate checkpointed id blocks
            ids_df.unpersist()


def _ivfpq_cell_counts(spark, path: str) -> list[int]:
    """Per-cell row counts of the persisted index. ``cell`` is the hive
    partition column, so the counts are pure parquet-footer METADATA —
    read driver-locally (num_rows per file, zero data pages touched) when
    the tree is local, exactly the ``_read_sidecar_rows`` discipline: a
    distributed job to fetch what the footers already hold is pure
    scheduling overhead, and the maintain loop pays it per micro-batch.
    Spark fallback (one bytes-only scan) for object-store paths. Exact
    integers either way, so every caller stays engine-deterministic."""
    import os

    if os.path.isdir(path):
        try:
            import pyarrow.parquet as pq

            counts = []
            for d in os.listdir(path):
                if not d.startswith("cell="):
                    continue
                sub = os.path.join(path, d)
                c = 0
                for f in os.listdir(sub):
                    if f.endswith(".parquet"):
                        c += pq.ParquetFile(
                            os.path.join(sub, f)
                        ).metadata.num_rows
                counts.append(c)
            return counts
        except Exception:  # noqa: BLE001 — any local-read surprise: use Spark
            pass
    rows = (
        _ivfpq_read(spark, path)
        .groupBy("cell").agg(F.count("*").alias("c"))
        .collect()
    )
    return [int(r["c"]) for r in rows]


def ivfpq_imbalance(spark, path: str) -> float:
    """FAISS ``imbalance_factor`` over the persisted index: ``k * sum(c_i^2)
    / n^2`` where ``c_i`` are per-cell row counts and ``k`` the CONFIGURED
    cell count (from the saved centroids — empty cells count, exactly as in
    FAISS). 1.0 = perfectly uniform; k = everything in one cell. Counts
    come from parquet footers (``_ivfpq_cell_counts``) — exact integers,
    no data read, so the factor is engine-deterministic."""
    import os

    k = int(np.load(os.path.join(path, "_centroids.npy")).shape[0])
    counts = _ivfpq_cell_counts(spark, path)
    n = sum(counts)
    if n == 0:
        return 0.0
    return k * sum(c * c for c in counts) / (n * n)


def ivfpq_upsert_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Upsert = delete-then-append, the FAISS/Lucene update idiom made one
    call: batch ids already indexed are anti-joined out (one bytes-only
    index pass; ids never touch the driver), then the WHOLE batch is
    encoded under the saved quantizers and appended O(|batch|). Codes are
    bit-identical to a rebuild over (index - replaced + batch), so probes
    match a fresh build — the same shared-oracle argument as append and
    delete, composed. Returns how many existing vectors were replaced.

    A batch covering EVERY indexed id (the full re-embedding refresh) is
    legal here even though the bare delete refuses it: the index is
    rebuilt from the batch under the SAVED quantizers via the crash-safe
    side-tree swap, so the transient empty tree never exists.

    The replace path is FUSED: survivors and the encoded batch land in
    ONE partitioned side-tree write (identical rows to the former
    delete-rewrite-then-append, one fewer index write + commit per
    call — the maintain loop pays this per micro-batch)."""
    import json
    import os
    import shutil

    from naru_spark.pipeline.retrieval import _swap_in

    spark = batch.sparkSession
    # pin ONE evaluation of the batch's id set (same discipline as the
    # delete path): the ids feed the stats agg AND the survivor anti-join
    # lazy pin: materialized by the delete-stats aggregate (first action)
    ids_df = batch.select(
        F.col(id_col).cast("long").alias("vec_id")
    ).distinct().localCheckpoint(eager=False)
    try:
        index = _ivfpq_read(spark, path)
        n_replaced, n_rem = _ivfpq_delete_stats(index, ids_df, False)
        if n_replaced == 0:
            # nothing to expunge: pure O(|batch|) append, no rewrite
            ivfpq_append_index(batch, path, id_col=id_col, vec_col=vec_col)
            return 0
        with open(os.path.join(path, "_meta.json")) as fh:
            decimals = json.load(fh).get("decimals")
        centroids = np.load(os.path.join(path, "_centroids.npy"))
        codebooks = np.load(os.path.join(path, "_codebooks.npy"))
        if n_rem == 0:
            # full refresh — route through the build so _meta.json is
            # re-stamped with the fresh tree's own imbalance anchor
            ivfpq_write_index(
                batch, path, centroids, codebooks,
                id_col=id_col, vec_col=vec_col, decimals=decimals,
            )
            return n_replaced
        encoded = _ivfpq_encode(
            batch, centroids, codebooks, id_col, vec_col, decimals
        )
        remaining = index.join(ids_df, "vec_id", "left_anti").select(
            "vec_id", "codes", "cell"  # original schema order
        )
        sidecars = [
            f for f in ("_centroids.npy", "_codebooks.npy", "_meta.json")
            if os.path.exists(os.path.join(path, f))
        ]

        def write_with_sidecars(df: DataFrame, tmp: str) -> None:
            df.write.partitionBy("cell").parquet(tmp)
            for f in sidecars:
                shutil.copy2(os.path.join(path, f), os.path.join(tmp, f))

        # one shuffle keyed like the layout (the delete path's own
        # discipline), one side-tree write carrying survivors + batch
        _swap_in(
            remaining.unionByName(encoded).repartition("cell"),
            path, writer=write_with_sidecars,
        )
        return n_replaced
    finally:
        # per-micro-batch upsert loops must not accumulate checkpointed
        # id blocks
        ids_df.unpersist()


def ivfpq_maintain_index(
    batch: DataFrame,
    path: str,
    corpus: DataFrame,
    refit,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_ratio: float = 1.25,
    policy: str = "ingest",
    recall_queries: DataFrame | None = None,
    recall_k: int = 10,
    recall_n_probe: int = 8,
    min_recall: float = 0.9,
) -> dict:
    """The index-maintenance decision loop, composed from the lifecycle
    pieces: UPSERT the batch (delete-then-append under the saved
    quantizers), measure cell imbalance before and after (two bytes-only
    scans of code rows — the ``imbalance_factor`` signal the stats entry
    exposes), and when the ingest drifted the distribution enough that
    ``after > rebuild_ratio * before``, REBUILD: refit quantizers via the
    caller's ``refit(corpus) -> (centroids, codebooks)`` and rewrite the
    index from ``corpus`` (the authoritative current vector set — codes
    cannot be decoded back to floats, so a rebuild needs the source, just
    as FAISS ``train`` does; sample inside ``refit`` at scale). The
    rebuild reuses the index's saved ``decimals`` from _meta.json and
    writes through the side-tree swap, so a crash mid-rebuild leaves the
    pre-rebuild index intact and serving.

    Two trigger policies:

    - ``policy="ingest"`` (default): rebuild when THIS ingest moved the
      imbalance past ``rebuild_ratio`` times its pre-ingest value. Pure
      per-batch signal — but slow drift accrued across many small
      batches never fires it.
    - ``policy="build"``: rebuild when the post-ingest imbalance exceeds
      ``rebuild_ratio`` times ``imbalance_at_build`` — the value the
      CURRENT fit achieved on its own training set, persisted in
      _meta.json by every build/rebuild. Cumulative, so slow drift
      eventually trips it; anchored to the live fit's own quality, so it
      does not depend on an absolute constant. Raises if the index
      predates the sidecar field (a guessed anchor would be a silent
      policy change) — rebuild once to stamp it.

    QUALITY trigger (``recall_queries``): imbalance is a COST signal —
    drift that keeps cells balanced but moves vectors into regions the
    saved PQ codebooks quantize badly degrades answers while imbalance
    stays flat. When a fixed probe-query set is given, the post-ingest
    index's recall@``recall_k`` is evaluated against exact brute force
    over ``corpus`` (``ann_recall_at_k``; cost bounded by the small
    fixed query set — ONE corpus pass for the exact side, and the
    queries × k join), and mean recall below ``min_recall`` fires the
    same rebuild even when the imbalance check passed. This is the
    FAISS-operations pairing: imbalance for shard cost, recall-decay for
    answer quality.

    Returns ``{"action": "rebuild"|"upsert", "imbalance_before": b,
    "imbalance_after": a, "imbalance_final": f, "baseline": anchor,
    "n_replaced": r, "trigger": None|"imbalance"|"recall",
    "recall": mean_recall_or_None}``. ``imbalance_before`` is None under
    ``policy="build"`` — that policy's baseline is the _meta.json anchor,
    so the pre-ingest index scan is skipped. ``imbalance_after`` is the
    POST-INGEST, PRE-REBUILD measurement — the value the trigger
    compared (kept so callers can audit the decision).
    ``imbalance_final`` is the state the call left behind: equal to
    ``imbalance_after`` on upsert, and on rebuild the
    ``imbalance_at_build`` the rebuild just stamped into _meta.json
    (measured on the side tree before the swap — no extra scan).
    ``recall`` is the PRE-REBUILD measurement that was compared (None
    when not evaluated: no query set, or the imbalance trigger already
    fired). Monitoring should chart ``imbalance_final`` and
    ``recall``."""
    import json
    import os

    if policy not in ("ingest", "build"):
        raise ValueError(f"unknown policy {policy!r} (ingest|build)")
    spark = batch.sparkSession
    meta_path = os.path.join(path, "_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if policy == "build" and meta.get("imbalance_at_build") is None:
        # fail fast BEFORE mutating anything
        raise ValueError(
            f"no imbalance_at_build in {path}/_meta.json — this index "
            "predates the balance sidecar; rebuild once to stamp it "
            "before using policy='build'"
        )
    # the pre-ingest scan only feeds the "ingest" policy's baseline; under
    # "build" the anchor comes from _meta.json, so skipping the scan saves
    # one index pass per batch (the streaming ingest entry pays this per
    # micro-batch). Reported as None in the result dict in that case.
    before = ivfpq_imbalance(spark, path) if policy == "ingest" else None
    n_replaced = ivfpq_upsert_index(batch, path, id_col=id_col, vec_col=vec_col)
    # re-read meta AFTER the upsert: a full-refresh batch routes through
    # ivfpq_write_index, which re-stamps imbalance_at_build — the anchor
    # must be the one on disk, not a stale pre-refresh value
    with open(meta_path) as fh:
        meta = json.load(fh)
    baseline = meta["imbalance_at_build"] if policy == "build" else before
    after = ivfpq_imbalance(spark, path)
    action, final, trigger, recall = "upsert", after, None, None
    if after > rebuild_ratio * baseline:
        trigger = "imbalance"
    elif recall_queries is not None:
        # quality signal: the balanced-but-stale-codes drift the
        # imbalance check is blind to. Exact side reads the source
        # corpus (codes cannot be decoded back), approx side probes the
        # post-ingest index — both bounded by the fixed query set.
        exact = brute_force_topk(
            corpus, recall_queries, k=recall_k, id_col=id_col, vec_col=vec_col
        )
        approx = ivfpq_topk_from_index(
            spark, path, recall_queries, k=recall_k,
            n_probe=recall_n_probe, decimals=meta.get("decimals"),
        )
        row = (
            ann_recall_at_k(exact, approx, recall_k)
            .agg(F.avg("recall").alias("r")).collect()[0]
        )
        recall = float(row["r"]) if row["r"] is not None else 0.0
        if recall < min_recall:
            trigger = "recall"
    if trigger is not None:
        centroids, codebooks = refit(corpus)
        ivfpq_write_index(
            corpus, path, centroids, codebooks,
            id_col=id_col, vec_col=vec_col, decimals=meta.get("decimals"),
        )
        action = "rebuild"
        # the rebuild measured its own imbalance on the side tree and
        # stamped it — reuse it as the post-call state, no extra scan
        with open(meta_path) as fh:
            final = json.load(fh)["imbalance_at_build"]
    return {
        "action": action,
        "imbalance_before": before,
        "imbalance_after": after,
        "imbalance_final": final,
        "baseline": baseline,
        "n_replaced": n_replaced,
        "trigger": trigger,
        "recall": recall,
    }


def ann_recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Recall@k — THE deployment metric for an ANN index (FAISS's
    benchmark standard): per query, the fraction of the exact top-k the
    approximate ranking recovered. One equi-join on (query_id,
    neighbor_id) + a bounded per-query count, so it costs queries x k
    rows however large the corpus — cheap enough to run continuously as
    the QUALITY signal beside the maintain loop's imbalance COST signal
    (drift that survives the imbalance check still shows up here as
    recall decay). Queries the approximate index missed entirely still
    report (recall 0.0) via the left join from the exact side."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def ivfpq_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_probe: int = 8,
    decimals: int | None = None,
    candidate_filter: DataFrame | None = None,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF-PQ index: probe list computed
    driver-side from the saved centroids, the scan reads ONLY the probed
    cell directories (PartitionFilters — plan-asserted in tests) and only
    CODES (bytes, not floats), then per-query ADC tables score candidates.
    Identical results to the in-memory ``ivfpq_topk`` given the same
    quantizers — which is what lets this entry share its oracle.

    ``candidate_filter`` (a DataFrame with a ``vec_id`` column): FILTERED
    ANN search, the vector-DB metadata-filter case. Candidates are
    PRE-FILTERED — semi-joined against the allowed set BEFORE the
    per-query top-k — so every returned neighbor is allowed AND the k
    results are the best allowed ones (post-filtering a top-k would
    silently return fewer than k and lose recall). The semi-join runs on
    the probed cells' code rows only; AQE picks the join strategy."""
    import os

    centroids = np.load(os.path.join(path, "_centroids.npy"))
    codebooks = np.load(os.path.join(path, "_codebooks.npy"))
    m, kk, dsub = codebooks.shape

    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    qmat = np.stack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    qunit = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qunit @ centroids.T
    if decimals is not None:
        sims = np.round(sims, decimals)
    probes = np.argsort(-sims, axis=1, kind="stable")[:, : min(n_probe, len(centroids))]
    probe_rows = [
        (int(qid), int(c))
        for qid, row in zip(q_pdf[query_id_col], probes)
        for c in row
    ]
    needed = sorted({c for _, c in probe_rows})
    tables = {
        int(qid): np.stack(
            [_pq_d2(qmat[i : i + 1, j * dsub : (j + 1) * dsub], codebooks[j], decimals)[0]
             for j in range(m)]
        )
        for i, qid in enumerate(q_pdf[query_id_col])
    }
    tab_bc = spark.sparkContext.broadcast(tables)

    index = _ivfpq_read(spark, path).filter(F.col("cell").isin(needed))
    if candidate_filter is not None:
        index = index.join(
            candidate_filter.select("vec_id").distinct(), "vec_id", "semi"
        )
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cell int")
    cand = index.join(F.broadcast(probe_df), "cell").select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "codes"
    )

    def score(batches):
        tabs = tab_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())
            out = np.empty(len(pdf))
            for qid in np.unique(pdf["query_id"].to_numpy()):
                mask = (pdf["query_id"] == qid).to_numpy()
                t = tabs[int(qid)]
                adc = t[np.arange(codes.shape[1])[None, :], codes[mask]].sum(axis=1)
                out[mask] = np.round(adc, decimals) if decimals is not None else adc
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc": out,
                }
            )

    scored = cand.mapInPandas(score, schema="query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfpq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    k_refine: int = 30,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    decimals: int | None = None,
) -> DataFrame:
    """IVF-PQ with the standard exact re-rank refine stage (FAISS
    ``IndexRefineFlat``): the quantized ADC pass produces a SHORTLIST of
    ``k_refine > k`` candidates per query, whose float vectors are then
    fetched and scored with EXACT cosine; the final top-k ranks on the
    exact score. ADC error (product-quantization distortion) can reorder
    true neighbors near the cutoff — refining a 3x shortlist recovers most
    of that recall while still touching only ``k_refine`` float vectors
    per query instead of the whole corpus.

    100 TB shape: stage 1 is ``ivfpq_topk`` (partition-pruned byte reads);
    stage 2 broadcasts the tiny (query, neighbor) shortlist into ONE
    corpus scan that fetches just the shortlisted vectors (a broadcast
    semi-join — never a #queries x #corpus product), and the exact cosine
    is JVM-side ``cosine_expr``. Composition argument for the oracle:
    with probe-all + k_refine = |corpus| this reduces to brute force;
    the shipped config's shortlist membership is itself oracle-verified
    (same CTE as ``similarity_topk_ivfpq``), so the refine stage only
    re-scores rows both engines agree on."""
    shortlist = ivfpq_topk(
        corpus, queries, centroids, codebooks,
        k=k_refine, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        decimals=decimals,
    ).select("query_id", "neighbor_id")

    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    ).join(F.broadcast(shortlist), "neighbor_id")
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qvec")
    )
    scored = cand.join(F.broadcast(qv), "query_id").withColumn(
        "cosine", cosine_expr("__nvec", "__qvec", decimals if decimals is not None else 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection — the standard dimensional
    pre-reduction in front of ANN / clustering / dedup at scale (project
    once, then every downstream pairwise op costs out_dim instead of d).
    The Gaussian matrix is drawn ONCE from a seeded numpy RNG and scaled
    by 1/sqrt(out_dim), so E[|Px - Py|^2] = |x - y|^2 (distance-preserving
    in expectation; the JL tail bound is statistically gated in tests).

    Execution is one Arrow-batched mapInPandas matmul per partition —
    map-only, zero shuffle, the projection matrix broadcast in the
    closure (KBs). Output is LONG form (vec_id, dim, value) with values
    rounded to ``decimals`` — engine-independent (the oracle inlines the
    same matrix and replays each output dim as a literal inner product).

    ``projection_matrix(in_dim, out_dim, seed)`` exposes the exact matrix
    for the oracle/tests."""
    spark = emb.sparkSession
    in_dim = len(emb.select(vec_col).first()[0])
    P = projection_matrix(in_dim, out_dim, seed)
    bc = spark.sparkContext.broadcast(P)

    def project(batches):
        M = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = np.round(mat @ M, decimals)
            n, d = out.shape
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), d),
                    "dim": np.tile(np.arange(d, dtype=np.int32), n),
                    "value": out.reshape(-1),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        project, schema="vec_id long, dim int, value double"
    )


def projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """The deterministic JL matrix (in_dim x out_dim), float64: seeded
    standard normals scaled by 1/sqrt(out_dim). Shared by the Spark path,
    the oracle SQL generator, and the JL-bound test."""
    rng = np.random.RandomState(seed)
    return rng.randn(in_dim, out_dim) / np.sqrt(out_dim)
