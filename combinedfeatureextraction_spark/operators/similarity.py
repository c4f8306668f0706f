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
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query in
    any table; exact cosine re-rank among candidates. Same output schema
    as brute_force_topk (rank over the candidate set).

    Plan shape (the 100 TB contract): the corpus is scanned twice and
    never shuffled — once through the Arrow matmul emitting only
    (id, buckets), once to fetch the (few) candidate vectors via a
    BROADCAST semi-join on the candidate-id set. Every join is broadcast;
    the only exchanges carry candidate-sized data (ids, pairs, the final
    re-rank window)."""
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
        cb.join(F.broadcast(qb), ["_tbl", "_bkt"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    # candidate vectors: broadcast semi-join — corpus scan #2, no shuffle
    cand_ids = pairs.select(id_col).distinct()
    cand_vecs = corpus.select(id_col, vec_col).join(
        F.broadcast(cand_ids), id_col, "left_semi"
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    scored = (
        cand_vecs.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(q), query_id_col)
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
