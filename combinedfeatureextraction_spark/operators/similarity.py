"""Approximate-nearest-neighbor similarity search over embedding columns.

Two tiers:
 - ``brute_force_topk``: exact cosine top-k. The query side is broadcast
   (queries ≪ corpus always at 100 TB), so the corpus never shuffles —
   one scan, per-partition partial top-k via the window, AQE-coalesced.
 - ``lsh_topk``: random-hyperplane LSH. Hyperplanes are generated
   driver-side from a fixed seed and folded into the plan as literal
   arrays; each vector gets a signature bucket; candidates = same bucket
   in ≥1 of ``tables`` hash tables; exact cosine re-rank inside buckets.
   Corpus shuffles once on (table, bucket) — signatures only, vectors
   carried once.

This is the engine's IVF/LSH "scale path" (task brief): recall tunable via
(bits, tables), exactness recovered as bits→0.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


def _signature_expr(vec_col: str, planes: np.ndarray):
    """bucket id = sign-bit string of <v, h_j> for each hyperplane —
    built as literal-array dot products (JVM fold, no UDF)."""
    bits = []
    for j in range(planes.shape[0]):
        lit = F.array(*[F.lit(float(x)) for x in planes[j]])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + (b.cast("long") * F.lit(2**i))
    return out


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

    def bucketize(df: DataFrame, idc: str) -> DataFrame:
        rows = []
        for t in range(tables):
            rows.append(
                df.select(
                    F.col(idc),
                    F.col(vec_col),
                    F.lit(t).alias("_tbl"),
                    _signature_expr(vec_col, planes[t]).alias("_bkt"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

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
