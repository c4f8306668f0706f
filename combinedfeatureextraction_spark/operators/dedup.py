"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

These are first-class engine operators (not in the reference — they're the
corpus-scale counterpart of its overlap conflict-resolution J6 / last-wins
W9 semantics: among duplicate rows, one canonical winner is kept by an
explicit priority).

Scale design:
 - exact: one hash-shuffle on the content hash, map-side combinable.
 - MinHash/SimHash: signatures are pure JVM expressions over the shingle
   array (explode-free: higher-order funcs on the array), so signature
   computation is a shuffle-free projection; only the LSH band →
   candidate-pair stage shuffles, and it shuffles SIGNATURES (few bytes),
   never documents. Candidate verification joins back by id.
 - banding math: P(candidate | jaccard=s) = 1-(1-s^r)^b — choose (b, r)
   for the target threshold; defaults target ~0.8.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from combinedfeatureextraction_spark.operators.priority import last_wins


# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    tie_break: Sequence[Column],
) -> DataFrame:
    """Keep one row per distinct content (hash-groupBy): winner = first row
    under ``tie_break`` ordering. One shuffle on the 64-bit content hash."""
    h = F.xxhash64(*[F.col(c) for c in content_cols])
    return last_wins(df.withColumn("_h", h), ["_h"], tie_break).drop("_h")


# ------------------------------------------------------------- shingles

def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingle array, built array-side (no explode):
    transform over a 0..len-n index sequence."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.split(c, " ")
    k = F.size(ws) - (n - 1)  # number of shingles
    # Build by zipping shifted slices — NOT by indexing inside a transform
    # lambda: an outer expression referenced inside a lambda is re-evaluated
    # per element, turning shingling O(words²) per row (measured 20s+ for
    # 10k docs). Zipped slices evaluate split() only ~n times per row.
    sh = F.slice(ws, 1, F.greatest(k, F.lit(0)))
    for j in range(1, n):
        nxt = F.slice(ws, 1 + j, F.greatest(k, F.lit(0)))
        sh = F.zip_with(sh, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(sh)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold. Exact but quadratic per block —
    ``block_col`` (e.g. source / length bucket) bounds the self-join; use
    minhash_lsh_dedup for corpus scale. Output: (id_a, id_b, jaccard_sim),
    id_a < id_b."""
    sh = df.select(
        F.col(id_col), word_shingles(text_col, n).alias("_sh"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    a = sh.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
    )
    b = sh.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb"),
        *( [F.col(block_col).alias("_blkb")] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = cond & (F.col("_blk") == F.col("_blkb"))
    return (
        a.join(b, cond)
        .withColumn("jaccard_sim", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


# -------------------------------------------------------------- minhash

def hashed_shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    persist: bool = True,
) -> DataFrame:
    """(_id, _sh array<long>): distinct word-n-gram shingles hashed to
    64-bit longs — the shared base for signatures AND verification.
    Persisted by default because every downstream consumer (signature agg,
    both sides of the verify join) reuses it; at corpus scale you would
    materialize this to a table once per snapshot."""
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(text_col, n)).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("_h"))
        .groupBy("_id")
        .agg(F.collect_set("_h").alias("_sh"))
    )
    return sh.persist() if persist else sh


def minhash_signatures_from_sets(
    sh: DataFrame,
    num_hashes: int = 32,
) -> DataFrame:
    """(_id, _sig array<long>): min over hashed shingles of
    xxhash64(h, i). Explode of a long array (cheap) → num_hashes narrow
    min-aggregates with full map-side combine. (A nested-lambda array-fold
    formulation is shuffle-free but builds a Catalyst tree that falls out
    of codegen — measured ~50x slower.)"""
    ex = sh.select("_id", F.explode("_sh").alias("_h"))
    mins = ex.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    return minhash_signatures_from_sets(
        hashed_shingle_sets(df, id_col, text_col, n, persist=False), num_hashes
    )


def minhash_lsh_candidates_from_sets(
    sh: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH candidate pairs from hashed shingle sets: signature → ``bands``
    bands of r=num_hashes/bands rows; pairs sharing any band bucket are
    candidates. Only (id, band, band_hash) tuples shuffle — never documents.
    Output: distinct (id_a, id_b)."""
    r = num_hashes // bands
    sig = minhash_signatures_from_sets(sh, num_hashes)
    band_rows = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("_sig")[bi * r + j] for j in range(r)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "b.band", "b.bh")
    left = band_rows.select(F.col("_id").alias("id_a"), "band", "bh")
    right = band_rows.select(F.col("_id").alias("id_b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidates → exact-Jaccard verification → confirmed near-dup pairs
    (id_a, id_b, jaccard_sim).

    The hashed shingle sets are computed ONCE (persisted) and feed both
    the signature/banding stage and the two sides of the verify join;
    jaccard runs over long arrays (collision probability ~n²/2⁶⁴,
    negligible). Documents shuffle once, by id — never all-pairs."""
    sh = hashed_shingle_sets(df, id_col, text_col, n, persist=True)
    cands = minhash_lsh_candidates_from_sets(sh, num_hashes, bands)
    out = (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha")), "id_a"
        )
        .join(
            sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb")), "id_b"
        )
        .withColumn("jaccard_sim", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
    return out


# -------------------------------------------------------------- simhash

def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 2,
) -> DataFrame:
    """(id, _sig long): 64-bit SimHash — per bit, sign of Σ_shingles (±1).

    Same explode → groupBy shape as minhash_signatures: 64 narrow
    conditional sums with map-side combine, then the signature is
    assembled from the bit sums in one projection."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, ngram)).alias("_s"),
    ).select("_id", F.xxhash64("_s").alias("_h"))
    sums = ex.groupBy("_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("_id", sig.alias("_sig"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    ngram: int = 2,
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (a pair within
    hamming ≤ 3 of 64 bits must agree on ≥1 chunk — pigeonhole), verify
    with exact hamming. Output: (id_a, id_b, hamming)."""
    sigs = simhash_signatures(df, id_col, text_col, ngram)
    chunks = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("_sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sig", "c.chunk", "c.cv")
    left = chunks.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("_siga"), "chunk", "cv"
    )
    right = chunks.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("_sigb"), "chunk", "cv"
    )
    return (
        left.join(right, ["chunk", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("_siga"), F.col("_sigb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_iter: int = 20,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash+LSH pairs → connected
    components → canonical id per cluster (minimum id wins — W9 last-wins
    generalized to clusters). Output: (id, canonical_id) for EVERY input
    row; singletons map to themselves.

    This is the corpus-curation composite: at 100 TB the pair stage
    shuffles signatures only, the component stage shuffles (id, label)
    pairs only, and the final mapping joins back by id."""
    from combinedfeatureextraction_spark.operators.fixpoint import (
        connected_components,
    )

    pairs = minhash_lsh_dedup(
        df, id_col, text_col, n, num_hashes, bands, threshold
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(pairs, max_iter=max_iter).select(
        F.col("id").alias(id_col), F.col("component").alias("canonical_id")
    )
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .withColumn("canonical_id", F.coalesce("canonical_id", F.col(id_col)))
    )


# ------------------------------------------------ embedding near-dup

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Cosine ≥ threshold pairs (id_a, id_b, cos_sim). Exact within a block;
    LSH-bucketed variant in operators.similarity for corpus scale."""
    from combinedfeatureextraction_spark.functions.arrays import cosine

    cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(block_col)] if block_col else []
    )
    v = df.select(*cols)
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        *([F.col(block_col).alias("_blkb")] if block_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = cond & (F.col("_blk") == F.col("_blkb"))
    return (
        a.join(b, cond)
        .withColumn("cos_sim", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
