"""Enriched-row write-back — MERGE the narrow feature table onto the
payload table by key.

Reference analog (SURVEY.md K4): delete + re-POST annotations with
per-element `user` features attached (FeatureExtractor.py:618-636) — i.e.
overwrite the feature columns of existing rows keyed by element id.

Engine: with Iceberg this is ``MERGE INTO payload USING features ON keys
WHEN MATCHED THEN UPDATE``; without the Iceberg runtime (this sandbox) the
same semantics run as a key-join + full snapshot rewrite via
sources.catalog.write_snapshot. At 100 TB the join is co-partitioned when
both tables are bucketed by doc_id (zero-shuffle merge)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from combinedfeatureextraction_spark.sources.catalog import (
    iceberg_available,
    write_snapshot,
)


def merge_features(
    payload: DataFrame,
    features: DataFrame,
    keys: Sequence[str],
    out_path: str | None = None,
) -> DataFrame:
    """Attach feature columns to payload rows by key (left join — payload
    rows lacking features keep NULLs). Returns the merged frame; writes a
    snapshot when ``out_path`` given."""
    keys = list(keys)
    feat_only = features.select(
        *keys, *[c for c in features.columns if c not in payload.columns]
    )
    merged = payload.join(feat_only, keys, "left")
    if out_path is not None:
        write_snapshot(merged, out_path, partition_by=(), sort_within=tuple(keys))
    return merged


def merge_sql(spark: SparkSession, target: str, source: str, keys: Sequence[str]) -> str:
    """The Iceberg MERGE statement this pipeline issues when the catalog
    is present (kept here so the SQL surface is explicit and testable)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    stmt = (
        f"MERGE INTO {target} t USING {source} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    if iceberg_available(spark):
        spark.sql(stmt)
    return stmt
