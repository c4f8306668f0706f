"""NaN/Inf coalesce discipline.

The reference coalesces every emitted feature NaN/Inf → 0
(fextract/extractioncodes/FeatureExtractor.py:611-614 and :402-463):
numpy nan-aggregates can yield NaN (empty input) or Inf (ratio /0) and the
pipeline zeroes them before persisting. These helpers reproduce that
contract as column expressions so downstream allclose parity holds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_inf_to_zero(col: Column | str) -> Column:
    """NaN → 0, ±Inf → 0, NULL → 0 (FeatureExtractor.py:611-614)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | F.isnan(c) | (c == float("inf")) | (c == float("-inf")),
        F.lit(0.0),
    ).otherwise(c)


def safe_div(num: Column, den: Column) -> Column:
    """num/den with 0 when den==0/NULL — the reference's ratio guard
    (extract_reference_features.py:266-293 emits 0-able ratios)."""
    return nan_inf_to_zero(
        F.when(den.isNull() | (den == 0), F.lit(0.0)).otherwise(num / den)
    )
