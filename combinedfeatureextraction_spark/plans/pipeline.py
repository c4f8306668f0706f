"""The flagship end-to-end pipeline: point-in-time feature materialization
over the tokenized-sequence table.

Per-row feature vector (FIXTURES.md §B `features_rowlevel`):
  lag_1/lead_1 of n_tok, rolling mean/std/min/max over the trailing k rows,
  gap to previous row, gap-based session id + length, distance to the
  nearest session boundary, forward-filled state, and the as-of joined
  state_val from the `states` dimension — plus the UNTOUCHED `tokens`
  payload (byte-equality invariant).

Physical shape (the plan you want at 100 TB):
  scan (bucket-pruned) → ONE hash exchange on doc_id → in-partition sort
  by ts → every window feature evaluated in that single sorted pass →
  as-of union-merge reusing the same partitioning on the salted key →
  bucket-partitioned snapshot write. Per-entity windows never see the
  token payload (only n_tok/ts), so the wide array column rides the scan
  untouched and is written back verbatim.

Reference parity: this is the whole ExpandedGranular lifecycle
(FeatureExtractor.py §3.1 — fetch→filter→per-element features→aggregate→
sink) re-expressed as one declarative DataFrame lineage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from combinedfeatureextraction_spark.operators.asof import asof_join
from combinedfeatureextraction_spark.operators.fill import (
    distance_to_boundary,
    forward_fill,
)
from combinedfeatureextraction_spark.operators.sessionize import sessionize
from combinedfeatureextraction_spark.operators.window_features import (
    with_lag_lead,
    with_rolling_stats,
)
from combinedfeatureextraction_spark.operators.aggregates import (
    six_stat_hierarchy,
)

ROW_FEATURES = [
    "n_tok_lag_1",
    "n_tok_lead_1",
    "n_tok_roll_mean",
    "n_tok_roll_std",
    "n_tok_roll_min",
    "n_tok_roll_max",
    "gap_prev",
    "session_id",
    "dist_to_boundary",
    "asof_state_val",
]


def rowlevel_features(
    sequences: DataFrame,
    states: DataFrame | None = None,
    gap_seconds: float = 3600.0,
    roll_k: int = 4,
    asof_salt: int = 1,
    jumbo_n_tok: int = 4096,
) -> DataFrame:
    """Materialize the per-row feature vector. Column contract is fixed;
    tokens pass through untouched."""
    keys = ["doc_id"]
    df = sequences
    df = with_lag_lead(df, "n_tok", keys, ["ts"], offsets=(1,))
    df = with_rolling_stats(
        df, "n_tok", keys, ["ts"], preceding=roll_k, following=0,
        stats=("mean", "std", "min", "max"),
    )
    df = sessionize(df, keys, "ts", gap_seconds)
    df = df.withColumnRenamed("_gap_prev", "gap_prev")
    boundary = F.col("gap_prev").isNull() | (F.col("gap_prev") > F.lit(gap_seconds))
    df = distance_to_boundary(df, boundary, keys, "ts")
    # jumbo-row bailout (F8 skew guard, extract_reference_features.py:447):
    # heavy derived stats nulled for outlier payloads, row still emitted
    df = df.withColumn(
        "n_tok_roll_std",
        F.when(F.col("n_tok") > jumbo_n_tok, F.lit(None)).otherwise(
            F.col("n_tok_roll_std")
        ),
    )
    if states is not None:
        df = asof_join(
            df,
            states.withColumnRenamed("state_val", "asof_state_val"),
            keys=["source"],
            probe_ts="ts",
            build_ts="effective_ts",
            values=["asof_state_val"],
            salt=asof_salt,
        )
        df = forward_fill(df, "asof_state_val", ["doc_id"], "ts", out="state_ffill")
    return df


def hierarchy_aggregates(features: DataFrame) -> DataFrame:
    """Per-(doc) and per-(doc, source) 6-stat rollup of the row features —
    the A1×A2-A5 two-level hierarchy in one GROUPING SETS pass."""
    numeric = ["n_tok", "gap_prev", "dist_to_boundary"]
    return six_stat_hierarchy(features, numeric, "doc_id", "source")
