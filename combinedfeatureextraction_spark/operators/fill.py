"""Forward-fill / backfill and distance-to-boundary.

Reference analogs (SURVEY.md W8/W2):
 - forward-fill ≙ the remainder-mask priority cascade: pixels not claimed by
   any sub-compartment inherit the previous/default class
   (FeatureExtractor.py:322-378, esp. :374,:377-378).
 - distance-to-boundary ≙ `cv2.distanceTransform`: distance of each fg pixel
   to the nearest bg pixel (FeatureExtractor.py:394;
   extract_reference_features.py:406,427). In 1-D that's min(distance to
   previous boundary, distance to next boundary) = a forward pass + a
   backward pass of `last(..., ignorenulls)`.

Scale: each direction is one window pass; both passes share the same
hash-partitioning on the entity key, so Spark plans ONE exchange and two
in-partition sorts (asc + desc) — no second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from combinedfeatureextraction_spark.functions.timeutil import epoch_seconds


def forward_fill(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ts: str,
    out: str | None = None,
) -> DataFrame:
    """last non-null value at-or-before each row (W8 backfill operator)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out or f"{value}_ffill", F.last(value, ignorenulls=True).over(w))


def backward_fill(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ts: str,
    out: str | None = None,
) -> DataFrame:
    """first non-null value at-or-after each row."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return df.withColumn(out or f"{value}_bfill", F.first(value, ignorenulls=True).over(w))


def distance_to_boundary(
    df: DataFrame,
    boundary: Column,
    keys: Sequence[str],
    ts: str,
    out: str = "dist_to_boundary",
    two_sided: bool = True,
) -> DataFrame:
    """Per row: |ts - ts of nearest row where ``boundary`` is true|, in
    seconds (double). NULL when no boundary exists on that side (both sides
    for two_sided). 1-D distance transform (W2): forward-fill the boundary
    ts, mirror with a backward fill, take the least non-null.
    """
    t = epoch_seconds(ts)
    b_ts = F.when(boundary, t)
    w_fwd = (
        Window.partitionBy(*keys).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_b = F.last(b_ts, ignorenulls=True).over(w_fwd)
    d_prev = t - prev_b
    if not two_sided:
        return df.withColumn(out, d_prev)
    w_bwd = (
        Window.partitionBy(*keys).orderBy(ts).rowsBetween(0, Window.unboundedFollowing)
    )
    next_b = F.first(b_ts, ignorenulls=True).over(w_bwd)
    d_next = next_b - t
    return df.withColumn(out, F.least(d_prev, d_next))
