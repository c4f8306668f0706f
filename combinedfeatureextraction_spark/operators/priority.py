"""Priority-cascade / last-wins conflict resolution.

Reference analogs (SURVEY.md W9/J6/W8):
 - ordered paint, later class overwrites earlier (`fillPoly` in class
   order, extract_ffpe_features.py:32,186-232; overlap demotion
   xml_to_mask_minmax.py:202-215) → row_number over
   (cell key, priority desc) == 1.
 - remainder fallback: anything unclaimed gets the default class
   (FeatureExtractor.py:377-378) → coalesce with a default literal.

Scale: a single window shuffle on the conflict key; with AQE the skewed
"popular cell" partitions split automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_wins(
    df: DataFrame,
    keys: Sequence[str],
    priority: Sequence[Column],
    keep: str = "rn",
) -> DataFrame:
    """Keep exactly one row per key: the highest-priority one (W9/J6).
    ``priority`` must be a total order (add a unique id as final
    tie-breaker) for deterministic output."""
    w = Window.partitionBy(*keys).orderBy(*priority)
    return (
        df.withColumn(keep, F.row_number().over(w))
        .filter(F.col(keep) == 1)
        .drop(keep)
    )


def priority_cascade(
    conditions: Sequence[tuple[Column, Column]],
    default: Column,
) -> Column:
    """First-matching-class assignment with a remainder fallback (W8):
    when(c1, v1).when(c2, v2)...otherwise(default)."""
    expr = None
    for cond, val in conditions:
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return default if expr is None else expr.otherwise(default)
