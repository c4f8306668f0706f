"""Fixpoint (connected components, geodesic reconstruct), debug sampling,
and merge write-back."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


def test_connected_components_matches_union_find(spark):
    from combinedfeatureextraction_spark.operators.fixpoint import (
        connected_components,
    )

    rng = np.random.default_rng(17)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 200, size=(150, 2))
    ]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _union_find_components(edges)
    assert got == want


def test_geodesic_reconstruct_runs(spark):
    from combinedfeatureextraction_spark.operators.fixpoint import (
        geodesic_reconstruct_1d,
    )

    pdf = pd.DataFrame(
        {
            "k": "a",
            "ts": range(8),
            "marker": [1.0, 5.0, 2.0, 0.0, 7.0, 3.0, 0.0, 4.0],
            "mask": [True, True, True, False, True, True, False, True],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        geodesic_reconstruct_1d(df, ["k"], "ts", "marker", "mask")
        .orderBy("ts")
        .toPandas()["reconstructed"]
        .tolist()
    )
    # runs: [0,1,2] -> max 5; [4,5] -> 7; [7] -> 4; masked-out rows None
    assert out[:3] == [5.0, 5.0, 5.0]
    assert out[3] is None or np.isnan(out[3])
    assert out[4:6] == [7.0, 7.0]
    assert out[7] == 4.0


def test_sample_entity_trace(spark, seqs_df, states_df, tmp_path):
    from combinedfeatureextraction_spark.plans.debug import sample_entity_trace
    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features

    feat = rowlevel_features(seqs_df, states_df)
    out = tmp_path / "trace.json"
    trace = sample_entity_trace(feat, seed=7, out_path=out)
    assert trace["n_rows"] == len(trace["rows"]) > 0
    # deterministic under the same seed
    trace2 = sample_entity_trace(feat, seed=7)
    assert trace2["entity"] == trace["entity"]
    disk = json.loads(out.read_text())
    assert disk["entity"] == trace["entity"]


def test_merge_writeback_roundtrip(spark, seqs_df, states_df, tmp_path):
    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features
    from combinedfeatureextraction_spark.plans.writeback import (
        merge_features,
        merge_sql,
    )

    feat = rowlevel_features(seqs_df, states_df, carry_payload=False)
    merged = merge_features(seqs_df, feat, ["doc_id", "seq_idx"])
    assert merged.count() == seqs_df.count()
    # payload survives the merge byte-equal
    a = (
        merged.select("doc_id", "seq_idx", "tokens")
        .orderBy("doc_id", "seq_idx")
        .toPandas()
    )
    b = (
        seqs_df.select("doc_id", "seq_idx", "tokens")
        .orderBy("doc_id", "seq_idx")
        .toPandas()
    )
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # feature column present and populated
    assert merged.filter(F.col("roll4_mean").isNull()).count() == 0
    stmt = merge_sql(spark, "t", "s", ["doc_id", "seq_idx"])
    assert "MERGE INTO" in stmt and "t.doc_id = s.doc_id" in stmt
