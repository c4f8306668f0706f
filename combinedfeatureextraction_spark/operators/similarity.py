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

from combinedfeatureextraction_spark.functions.arrays import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine per query. Output: (query_id, id, cos_sim,
    rank). Deterministic tie-break on corpus id."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).withColumn(
        "cos_sim", cosine(F.col(vec_col), F.col("_qvec"))
    )
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


def _bucket_udf(planes: np.ndarray):
    """array<long> of LSH bucket ids (one per table) for a vector column —
    ONE numpy matmul per Arrow batch: (batch, dim) @ (dim, tables·bits),
    sign bits packed per table.

    Why a pandas UDF here and not column expressions: the per-plane dot
    product as literal arithmetic is tables·bits·dim (≈1500+) scalar terms
    — Janino spends multiple seconds JIT-compiling the generated method
    (measured: 9 s wall on a 2000-row input, all compile), and interpreted
    higher-order lambdas inverse-scale at local[32] (CLAUDE.md). A BLAS
    matmul amortized over 10k-row Arrow batches is the genuine scale path;
    per-batch Python overhead is negligible at that granularity."""
    tables, bits, dim = planes.shape
    flat = planes.reshape(tables * bits, dim).T.copy()  # (dim, tables·bits)
    weights = (2 ** np.arange(bits, dtype=np.int64)).reshape(1, 1, bits)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        d = m @ flat  # (n, tables·bits)
        b = (d >= 0).astype(np.int64).reshape(len(m), tables, bits)
        sigs = (b * weights).sum(axis=2)  # (n, tables)
        return pd.Series(list(sigs))

    return buckets


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
    as brute_force_topk (rank over the candidate set)."""
    planes = _hyperplanes(dim, bits, tables, seed)

    udf = _bucket_udf(planes)

    def bucketize(df: DataFrame, idc: str) -> DataFrame:
        # ONE scan: all table buckets in one Arrow-batched matmul, then
        # posexplode — the previous per-table unionByName re-scanned (and
        # re-decoded) the corpus `tables` times.
        return df.select(
            F.col(idc), F.col(vec_col), F.posexplode(udf(vec_col))
        ).withColumnsRenamed({"pos": "_tbl", "col": "_bkt"})

    cb = bucketize(corpus, id_col)
    qb = bucketize(queries, query_id_col).withColumnRenamed(vec_col, "_qvec")
    cands = (
        cb.join(F.broadcast(qb), ["_tbl", "_bkt"])
        .select(query_id_col, id_col, vec_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.withColumn("cos_sim", cosine(F.col(vec_col), F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
