"""Order-dependent per-entity window features: lag/lead, rolling stats,
coordinate rebasing, percent-rank, top-k.

Reference analogs (SURVEY.md §2.5/§2.6):
 - lag/lead   ≙ GLCM offset-1 co-occurrence (FeatureExtractor.py:500-519, W1)
 - rolling    ≙ disk-k dilation/erosion rank filters
               (extractioncodes/process_mc_features.py:83-89, W3)
 - rebase     ≙ `points[:,0] -= xMin` local-frame shift
               (FeatureExtractor.py:304-305, W7)
 - percent_rank ≙ histogram equalization CDF (FeatureExtractor.py:334, A12)
 - top-k      ≙ max-of-labels / sampling (FeatureExtractor.py:541, O4)

Scale notes: every operator here is ONE shuffle (hash-partition by the
entity key) followed by an in-partition sort — Spark's window exec keeps it
a single exchange and all expressions stay inside whole-stage codegen. At
100 TB the entity key (doc_id/user_id) is high-cardinality, so partitions
stay balanced; skew within a single hot entity is bounded because window
frames are row-bounded (no whole-partition materialization beyond the
frame buffer).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def entity_window(keys: Sequence[str], order: Sequence[str | Column]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def with_lag_lead(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order: Sequence[str],
    offsets: Sequence[int] = (1,),
    prefix: str | None = None,
) -> DataFrame:
    """lag/lead(value, k) per entity, ordered by the time axis.

    Offset-1 pairing is the 1-D analog of the reference's GLCM
    `graycomatrix(img, [1], [0])` neighbor pairing (FeatureExtractor.py:510).
    """
    p = prefix or value
    w = entity_window(keys, order)
    for k in offsets:
        df = df.withColumn(f"{p}_lag_{k}", F.lag(value, k).over(w))
        df = df.withColumn(f"{p}_lead_{k}", F.lead(value, k).over(w))
    return df


def with_rolling_stats(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order: Sequence[str],
    preceding: int = 4,
    following: int = 0,
    stats: Sequence[str] = ("mean", "std", "min", "max", "sum", "count"),
    prefix: str | None = None,
) -> DataFrame:
    """Rolling frame aggregates over rowsBetween(-preceding, following).

    A symmetric frame (preceding==following>0) with min/max is exactly the
    reference's morphological erosion/dilation rank filter
    (extractioncodes/process_mc_features.py:83-89): max over a k-neighborhood.
    ``std`` is population std — numpy ``np.nanstd`` parity
    (FeatureExtractor.py:592).
    """
    p = prefix or value
    w = entity_window(keys, order).rowsBetween(-preceding, following)
    c = F.col(value)
    exprs = {
        "mean": F.avg(c),
        "std": F.stddev_pop(c),
        "min": F.min(c),
        "max": F.max(c),
        "sum": F.sum(c),
        "count": F.count(c),
    }
    for s in stats:
        df = df.withColumn(f"{p}_roll_{s}", exprs[s].over(w))
    return df


def with_rebased_order(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    out: str = "ts_rebased",
) -> DataFrame:
    """ts - min(ts) per entity — the local-frame coordinate shift
    (FeatureExtractor.py:304-305). Unbounded min over an unordered window:
    one shuffle, no sort needed."""
    w = Window.partitionBy(*keys)
    return df.withColumn(out, F.col(ts) - F.min(ts).over(w))


def with_percent_rank(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    out: str = "pct_rank",
) -> DataFrame:
    """CDF / rank transform per entity — histogram equalization analog
    (`exposure.equalize_hist`, FeatureExtractor.py:334)."""
    w = Window.partitionBy(*keys).orderBy(F.col(value))
    return df.withColumn(out, F.percent_rank().over(w))


def topk_per_entity(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    out: str = "rank",
) -> DataFrame:
    """Deterministic top-k per entity via row_number (O4).

    Pass fully tie-broken ``order`` columns for determinism. rank<=k filter
    happens before any downstream shuffle so AQE can prune early.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(out, F.row_number().over(w)).filter(F.col(out) <= k)
