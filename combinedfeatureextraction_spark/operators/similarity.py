"""Approximate-nearest-neighbor similarity search over embedding columns.

Two tiers:
 - ``brute_force_topk``: exact cosine top-k. The query side is broadcast
   (queries ≪ corpus always at 100 TB), so the corpus never shuffles —
   one scan, per-partition partial top-k via the window, AQE-coalesced.
 - ``lsh_topk``: random-hyperplane LSH. Hyperplanes are generated
   driver-side from a fixed seed; signatures for ALL tables are computed
   in one Arrow-batched numpy matmul per batch (see _bucket_udf for why
   not column expressions); candidates = same bucket in ≥1 of ``tables``
   hash tables; exact cosine re-rank inside buckets. Corpus is scanned
   once and shuffles only (id, table, bucket) tuples.

This is the engine's IVF/LSH "scale path" (task brief): recall tunable via
(bits, tables), exactness recovered as bits→0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from combinedfeatureextraction_spark.functions.arrays import cosine, cosine_fixed


def _bc(df: DataFrame, broadcast: bool) -> DataFrame:
    """Explicit broadcast hint under the small-query contract; identity
    (shuffle equi-join, AQE-planned) on the large-query fallback path."""
    return F.broadcast(df) if broadcast else df


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine per query. Output: (query_id, id, cos_sim,
    rank). Deterministic tie-break on corpus id. Pass ``dim`` to use the
    unrolled codegen cosine (hot-path form; identical values)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    cos = (
        cosine_fixed(vec_col, "_qvec", dim)
        if dim
        else cosine(F.col(vec_col), F.col("_qvec"))
    )
    scored = corpus.join(F.broadcast(q)).withColumn("cos_sim", cos)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def _bucket_map(planes: np.ndarray, id_col: str, vec_col: str):
    """mapInArrow function: (id, vec) batches → (id, vec, _bkts array<long>)
    with one numpy matmul per batch: (batch, dim) @ (dim, tables·bits),
    sign bits packed per table.

    Why mapInArrow and not column expressions or a pandas UDF: the
    per-plane dot product as literal arithmetic is tables·bits·dim
    (≈1500+) scalar terms — Janino spends ~10 s JIT-compiling the method —
    and interpreted higher-order lambdas inverse-scale at local[32]
    (CLAUDE.md). A pandas UDF ALSO inverse-scaled (measured 2.98 s at 8
    cores → 16 s at 32): Arrow→pandas materializes one numpy object PER
    ROW for a list column, and 32 workers allocating 2M small arrays
    contend on the allocator. mapInArrow reads the ListArray's contiguous
    values buffer and reshapes it (zero per-row objects); the id and vec
    columns pass through untouched Arrow buffers."""
    import pyarrow as pa

    tables, bits, dim = planes.shape
    flat = planes.reshape(tables * bits, dim).T.copy()  # (dim, tables·bits)
    weights = (2 ** np.arange(bits, dtype=np.int64)).reshape(1, 1, bits)

    def run(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vec = b.column(1)
            vals = pa.compute.list_flatten(vec).to_numpy(zero_copy_only=False)
            if len(vals) != n * dim:
                raise ValueError(
                    f"lsh bucketize: expected fixed dim {dim}, got "
                    f"{len(vals)} values for {n} rows"
                )
            d = vals.reshape(n, dim).astype(np.float64, copy=False) @ flat
            sig = ((d >= 0).reshape(n, tables, bits) * weights).sum(axis=2)
            offsets = pa.array(
                np.arange(0, (n + 1) * tables, tables, dtype=np.int32)
            )
            bkts = pa.ListArray.from_arrays(
                offsets, pa.array(sig.ravel().astype(np.int64))
            )
            # only (id, buckets) goes back out — re-serializing the vector
            # column through Arrow doubled the Python-boundary traffic
            yield pa.RecordBatch.from_arrays(
                [b.column(0), bkts], names=[id_col, "_bkts"]
            )

    return run


def _kmeans_centroids(
    sample: np.ndarray, n_lists: int, iters: int, seed: int
) -> np.ndarray:
    """Deterministic mini-kmeans on a driver-side sample (numpy Lloyd
    iterations). The coarse quantizer of an IVF index is small by design
    (≤ a few thousand centroids); training it on a bounded sample
    driver-side is the standard construction (FAISS-style)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cents = sample[idx].astype(np.float64)
    for _ in range(iters):
        d = sample @ cents.T  # cosine-ish: vectors assumed ~normalized
        assign = d.argmax(axis=1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def _ivf_assign_map(cents: np.ndarray, id_col: str, nprobe: int):
    """mapInArrow: (id, vec) → (id, _lists array<long>) — the nprobe
    nearest coarse centroids per vector (one matmul per batch)."""
    import pyarrow as pa

    n_lists, dim = cents.shape
    centsT = cents.T.copy()

    def run(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vals = pa.compute.list_flatten(b.column(1)).to_numpy(
                zero_copy_only=False
            )
            m = vals.reshape(n, dim).astype(np.float64, copy=False)
            d = m @ centsT  # (n, n_lists)
            k = min(nprobe, n_lists)
            top = np.argpartition(-d, k - 1, axis=1)[:, :k].astype(np.int64)
            offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
            lists = pa.ListArray.from_arrays(offsets, pa.array(top.ravel()))
            yield pa.RecordBatch.from_arrays(
                [b.column(0), lists], names=[id_col, "_lists"]
            )

    return run


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    n_lists: int = 64,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 42,
    train_sample: int = 10_000,
    kmeans_iters: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path beside LSH:
    a coarse kmeans quantizer (trained driver-side on a bounded sample)
    assigns every corpus vector to its nearest list; a query probes its
    ``nprobe`` nearest lists and exact-cosine re-ranks the union.

    Plan shape mirrors lsh_topk: corpus scanned twice, shuffled never
    (assignment via mapInArrow matmul emitting (id, lists); candidate
    vectors fetched by broadcast semi-join); recall is tuned by
    (n_lists, nprobe), exactness recovered as nprobe→n_lists.

    ``broadcast_queries`` is the SMALL-QUERY-SET contract made explicit:
    the default broadcasts the query buckets, pairs and vectors (all
    bounded by n_queries × nprobe × list size). When the probe set is
    too large to broadcast, pass False: every join becomes a shuffle
    equi-join (AQE-planned) — the assignment maps still emit only
    (id, list) tuples, and the only corpus-payload exchange is the
    candidate-subset fetch, which is unavoidable once neither side
    fits a broadcast. Identical results either way (pytest-pinned)."""
    # bounded driver-side training sample: limit() takes the first rows in
    # scan order — deterministic for a fixed file layout (FAISS-style
    # train-on-head); centroids only steer recall, never correctness (the
    # re-rank is exact)
    sample_pdf = (
        corpus.select(vec_col).limit(train_sample).toPandas()[vec_col]
    )
    sample = np.stack(sample_pdf.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cents = _kmeans_centroids(sample / norms, n_lists, kmeans_iters, seed)

    def assign(df: DataFrame, idc: str, probes: int) -> DataFrame:
        narrow = df.select(F.col(idc), F.col(vec_col))
        id_t = narrow.schema[idc].dataType.simpleString()
        mapped = narrow.mapInArrow(
            _ivf_assign_map(cents, idc, probes),
            f"{idc} {id_t}, _lists array<long>",
        )
        return mapped.select(idc, F.explode("_lists").alias("_list"))

    cb = assign(corpus, id_col, 1)  # corpus rows live in ONE list
    qb = assign(queries, query_id_col, nprobe)
    pairs = (
        cb.join(_bc(qb, broadcast_queries), "_list")
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    cand_ids = pairs.select(id_col).distinct()
    cand_vecs = corpus.select(id_col, vec_col).join(
        _bc(cand_ids, broadcast_queries), id_col, "left_semi"
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    scored = (
        cand_vecs.join(_bc(pairs, broadcast_queries), id_col)
        .join(_bc(q, broadcast_queries), query_id_col)
        .withColumn("cos_sim", cosine_fixed(vec_col, "_qvec", dim))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query in
    any table; exact cosine re-rank among candidates. Same output schema
    as brute_force_topk (rank over the candidate set).

    Plan shape (the 100 TB contract): the corpus is scanned twice and
    never shuffled — once through the Arrow matmul emitting only
    (id, buckets), once to fetch the (few) candidate vectors via a
    BROADCAST semi-join on the candidate-id set. Every join is broadcast;
    the only exchanges carry candidate-sized data (ids, pairs, the final
    re-rank window).

    ``broadcast_queries=False`` is the LARGE-probe-set fallback: when
    the query side (and so the pair/candidate sets) outgrows a
    broadcast, every join becomes a shuffle equi-join (AQE-planned) —
    bucket tuples shuffle by (_tbl, _bkt), and the only corpus-payload
    exchange is the candidate-subset fetch, unavoidable once neither
    join side fits a broadcast. Identical results either way
    (pytest-pinned)."""
    planes = _hyperplanes(dim, bits, tables, seed)

    def bucketize(df: DataFrame, idc: str) -> DataFrame:
        # ONE scan: all table buckets in one Arrow-batched matmul, then
        # posexplode — a per-table unionByName would re-scan (and
        # re-decode) the corpus `tables` times.
        narrow = df.select(F.col(idc), F.col(vec_col))
        id_t = narrow.schema[idc].dataType.simpleString()
        mapped = narrow.mapInArrow(
            _bucket_map(planes, idc, vec_col),
            f"{idc} {id_t}, _bkts array<long>",
        )
        return mapped.select(idc, F.posexplode("_bkts")).withColumnsRenamed(
            {"pos": "_tbl", "col": "_bkt"}
        )

    cb = bucketize(corpus, id_col)
    qb = bucketize(queries, query_id_col)
    pairs = (
        cb.join(_bc(qb, broadcast_queries), ["_tbl", "_bkt"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    # candidate vectors: broadcast semi-join — corpus scan #2, no shuffle
    cand_ids = pairs.select(id_col).distinct()
    cand_vecs = corpus.select(id_col, vec_col).join(
        _bc(cand_ids, broadcast_queries), id_col, "left_semi"
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    scored = (
        cand_vecs.join(_bc(pairs, broadcast_queries), id_col)
        .join(_bc(q, broadcast_queries), query_id_col)
        .withColumn("cos_sim", cosine_fixed(vec_col, "_qvec", dim))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
