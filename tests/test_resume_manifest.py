"""Checkpoint/resume: a killed run restarts at the first uncommitted
bucket, completed buckets are skipped (partition-pruned), and re-running a
finished run is a no-op (north-rule resumability)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from combinedfeatureextraction_spark.plans.manifest import ResumableRun
from combinedfeatureextraction_spark.sources.catalog import (
    BUCKET_COL,
    current_snapshot_id,
    read_snapshot,
    with_bucket,
    write_snapshot,
)


def test_snapshot_roundtrip(spark, seqs_df, tmp_path):
    df = with_bucket(seqs_df, "doc_id", 8)
    snap = write_snapshot(df, tmp_path / "tbl", partition_by=(BUCKET_COL,))
    assert current_snapshot_id(tmp_path / "tbl") == snap
    back = read_snapshot(spark, tmp_path / "tbl")
    assert back.count() == seqs_df.count()
    # bucket partition column survives for pruning
    assert BUCKET_COL in back.columns


def test_snapshot_incremental_and_time_travel(spark, seqs_df, tmp_path):
    """replace_partitions commits merge with the parent snapshot; old
    snapshot ids stay readable (time travel); CURRENT is atomic."""
    import pyspark.sql.functions as F2

    tbl = tmp_path / "tbl2"
    df = with_bucket(seqs_df, "doc_id", 8).cache()
    first = df.filter(F2.col(BUCKET_COL).isin([0, 1, 2]))
    rest = df.filter(~F2.col(BUCKET_COL).isin([0, 1, 2]))
    s1 = write_snapshot(first, tbl, mode="replace_partitions")
    s2 = write_snapshot(rest, tbl, mode="replace_partitions")
    assert current_snapshot_id(tbl) == s2
    # CURRENT = union of both snapshots
    assert read_snapshot(spark, tbl).count() == df.count()
    # time travel to s1: only the first three buckets existed
    assert read_snapshot(spark, tbl, snapshot_id=s1).count() == first.count()
    # re-writing a bucket replaces, not duplicates
    s3 = write_snapshot(
        first.filter(F2.col(BUCKET_COL) == 0), tbl, mode="replace_partitions"
    )
    assert current_snapshot_id(tbl) == s3
    assert read_snapshot(spark, tbl).count() == df.count()


def test_resume_skips_completed(spark, seqs_df, tmp_path):
    n_buckets = 8
    df = with_bucket(seqs_df, "doc_id", n_buckets).cache()
    all_buckets = list(range(n_buckets))
    out_dir = tmp_path / "out"

    run = ResumableRun(out_dir, "runA")
    # simulate a prior partial run: buckets 0-2 already committed
    for b in (0, 1, 2):
        run.commit_bucket(b, rows_in=0, rows_out=0, wall_ms=0.0)
    assert run.completed_buckets() == {0, 1, 2}
    assert run.pending_buckets(all_buckets) == [3, 4, 5, 6, 7]

    writes = []

    def write_fn(part):
        rows = part.count()
        writes.append(rows)
        return write_snapshot(part, out_dir / "tbl", partition_by=(BUCKET_COL,))

    res = run.run_pending(df, all_buckets, write_fn)
    assert res == {"processed": 5, "skipped": 3}
    # only pending buckets were written
    expected = df.filter(F.col(BUCKET_COL).isin([3, 4, 5, 6, 7])).count()
    assert writes == [expected]

    # second run: everything committed → no-op, no write
    res2 = run.run_pending(df, all_buckets, write_fn)
    assert res2 == {"processed": 0, "skipped": 8}
    assert len(writes) == 1

    # manifests carry lineage fields
    rec = json.loads((run.manifest_dir / "bucket=4.json").read_text())
    assert rec["status"] == "committed"
    assert rec["rows_in"] >= 0 and "snapshot_id" in rec

    run.write_run_metrics({"wall_ms": 123.0, "rows": int(df.count())})
    m = json.loads((run.manifest_dir / "run_metrics.json").read_text())
    assert m["run_id"] == "runA"


def test_expire_snapshots(spark, seqs_df, tmp_path):
    """Vacuum: unreferenced snapshots are deleted; retained snapshots keep
    time-traveling correctly, including data inherited from ancestors."""
    import pyspark.sql.functions as F2

    from combinedfeatureextraction_spark.sources.catalog import (
        expire_snapshots,
        list_snapshots,
    )

    tbl = tmp_path / "tbl_exp"
    df = with_bucket(seqs_df, "doc_id", 8).cache()
    s1 = write_snapshot(df, tbl, mode="overwrite")  # full table
    s2 = write_snapshot(  # replaces bucket 0 only — inherits rest from s1
        df.filter(F2.col(BUCKET_COL) == 0), tbl, mode="replace_partitions"
    )
    s3 = write_snapshot(  # replaces bucket 1 only
        df.filter(F2.col(BUCKET_COL) == 1), tbl, mode="replace_partitions"
    )
    total = df.count()
    expired = expire_snapshots(tbl, keep_last=2)
    # s1's data is still read by s2/s3 (buckets 2..7) → NOT expired
    assert expired == []
    assert read_snapshot(spark, tbl).count() == total
    assert read_snapshot(spark, tbl, snapshot_id=s2).count() == total

    # now fully overwrite: s1..s3 become unreachable from the new chain
    s4 = write_snapshot(df, tbl, mode="overwrite")
    s5 = write_snapshot(
        df.filter(F2.col(BUCKET_COL) == 2), tbl, mode="replace_partitions"
    )
    expired = expire_snapshots(tbl, keep_last=2)
    assert s1 in expired and s2 in expired and s3 in expired
    assert set(list_snapshots(tbl)) == {s4, s5}
    assert read_snapshot(spark, tbl).count() == total
    assert read_snapshot(spark, tbl, snapshot_id=s4).count() == total
    import pytest as _pt

    with _pt.raises(Exception):
        read_snapshot(spark, tbl, snapshot_id=s2)
