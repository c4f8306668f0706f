"""Corpus-curation pipeline: the training-data counterpart of the
flagship feature pipeline — one composite plan from raw documents to a
deduplicated, quality-filtered corpus plus a per-language manifest.

Stage shape (each stage is an operator this engine ships; the composite
is what a 100 TB data-curation run actually executes):

  1. text features AT SCAN (quality score, language-ID, token count —
     all single-pass codegen'd column expressions, §X5; the document
     fingerprint is attached to the post-dedup survivors via the native
     explode-shaped aggregate, never as a scan-side lambda fold)
  2. quality floor filter (F4; pushed to the scan by Catalyst)
  3. EXACT dedup on the content hash (A13 — one combinable shuffle)
  4. near-dup CLUSTERING (MinHash+LSH → connected components → canonical
     id; signatures-only shuffles) and canonical-winner selection (W9)
  5. outputs: the curated corpus + a (lang, stage-by-stage counts)
     manifest row set (K3 lineage discipline)

Scale notes: the text payload is read once; stages 2-4 operate on narrow
(id, hash/signature) projections; the only document-width shuffle is the
exact-dedup hash partition. Clustering consumes the capped LSH candidates
(degenerate boilerplate buckets degrade to star edges — see
operators.dedup._banded_candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from combinedfeatureextraction_spark.functions import text as X
from combinedfeatureextraction_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.25,
    min_tokens: int = 8,
    near_dup_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, manifest).

    ``curated``: one row per surviving document — id, text features, and
    the near-dup cluster's canonical id (== its own id for survivors).
    ``manifest``: per-language counts after each stage (n_raw, n_quality,
    n_exact, n_curated) — the run-lineage summary (K3)."""
    # Scan projection is pure codegen'd column math — NO interpreted
    # lambdas (CLAUDE.md: transform/aggregate chains inverse-scale at
    # local[32]); the fingerprint is attached to the (much smaller)
    # post-dedup survivor set below via the native explode-shaped
    # fingerprint_agg instead of riding the 100 TB scan as a lambda fold.
    feats = docs.select(
        F.col(id_col),
        F.col(text_col),
        X.lang_id(text_col).alias("lang_pred"),
        X.quality_score(text_col).alias("quality"),
        X.token_count(text_col).alias("n_tokens"),
    ).localCheckpoint(eager=False)
    # The checkpoint is load-bearing twice over (r06). (1) `feats` fans
    # out to FIVE consumers (the quality chain + four manifest counts);
    # without it each consumer re-runs the scan projection. (2) It keeps
    # the quality filter from being substituted below the projection:
    # Catalyst inlines the aliased trees into the pushed-down predicate,
    # and predicate evaluation has no cross-expression subexpression
    # sharing — measured 65 s vs 0.4 s at sf1.0 for the identical
    # projection evaluated as a predicate vs as a codegen'd projection.
    # At 100 TB this stage boundary is the materialized scored-corpus
    # table the composite's docstring already calls for.
    quality = feats.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    exact = exact_dedup(quality, [text_col], [F.col(id_col).asc()])
    clusters = dedup_clusters(
        exact,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=near_dup_threshold,
    )
    winners = (
        exact.join(clusters, id_col)
        .filter(F.col("canonical_id") == F.col(id_col))
        .drop("canonical_id")
        # winners fans out twice below (join left side + fingerprint_agg
        # input): without a checkpoint the exact-dedup window and the
        # cluster join would execute twice per action — same lazy-
        # localCheckpoint pattern as _banded_candidates' band rows.
        .localCheckpoint(eager=False)
    )
    curated = winners.join(
        X.fingerprint_agg(winners, id_col, text_col), id_col
    ).select(id_col, text_col, "lang_pred", "quality", "n_tokens", "fp")

    def _lang_counts(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("lang_pred").agg(F.count("*").alias(name))

    manifest = (
        _lang_counts(feats, "n_raw")
        .join(_lang_counts(quality, "n_quality"), "lang_pred", "left")
        .join(_lang_counts(exact, "n_exact"), "lang_pred", "left")
        .join(_lang_counts(curated, "n_curated"), "lang_pred", "left")
        .na.fill(0)
    )
    return curated, manifest
