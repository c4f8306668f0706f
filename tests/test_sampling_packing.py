"""operators.sampling (deterministic md5 sampling) and operators.packing
(sequence packing) — the round-4 training-pipeline additions."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _docs(spark, n=400):
    return spark.createDataFrame(
        [
            (i, ["en", "de", "fr", "xx"][i % 4], f"src{i % 3}", 100 + (i * 37) % 900)
            for i in range(n)
        ],
        "doc_id long, lang string, source string, n_tok long",
    )


def _py_key(salt, *ids) -> float:
    s = "\x1f".join([str(salt), *map(str, ids)])
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) / float(1 << 48)


def test_sample_key_matches_hashlib(spark):
    """Portability contract: the Spark key equals python hashlib md5 —
    a third implementation besides Spark and the DuckDB oracle."""
    from combinedfeatureextraction_spark.operators.sampling import sample_key

    df = _docs(spark, 50).withColumn("u", sample_key(["doc_id"], salt=7))
    got = {r["doc_id"]: r["u"] for r in df.collect()}
    for i in range(50):
        assert abs(got[i] - _py_key(7, i)) < 1e-15, i


def test_deterministic_sample_reproducible_and_monotone(spark):
    from combinedfeatureextraction_spark.operators.sampling import (
        deterministic_sample,
    )

    docs = _docs(spark)
    a = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, ["doc_id"], 0.2, salt=3).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample(
            docs.repartition(7), ["doc_id"], 0.2, salt=3
        ).collect()
    )
    assert a == b  # partitioning-independent
    bigger = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, ["doc_id"], 0.5, salt=3).collect()
    )
    assert set(a) <= set(bigger)  # fraction sweep is monotone
    other = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, ["doc_id"], 0.2, salt=4).collect()
    )
    assert a != other  # salt redraws
    # keep rate within binomial noise (n=400, p=0.2 -> sd≈8)
    assert abs(len(a) - 80) < 40


def test_stratified_sample_per_stratum_fractions(spark):
    from combinedfeatureextraction_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _docs(spark)
    out = stratified_sample(
        docs, ["doc_id"], "lang",
        {"en": 1.0, "de": 0.0}, default_fraction=0.3, salt=1,
    ).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in out}
    assert counts.get("en") == 100  # fraction 1.0 keeps every row
    assert "de" not in counts  # fraction 0.0 keeps none
    for lang in ("fr", "xx"):  # default 0.3 of 100, binomial sd≈4.6
        assert 8 <= counts.get(lang, 0) <= 55


def test_pack_tokens_matches_greedy_cumsum(spark):
    from combinedfeatureextraction_spark.operators.packing import pack_tokens

    docs = _docs(spark)
    out = (
        pack_tokens(docs, ["source"], ["doc_id"], "n_tok", 1000)
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    for src, g in out.groupby("source"):
        off = 0
        for _, row in g.iterrows():
            assert row["start_offset"] == off
            assert row["bin_id"] == off // 1000
            assert row["bin_offset"] == off % 1000
            exp_span = row["n_tok"] > 0 and (
                (off + row["n_tok"] - 1) // 1000 > off // 1000
            )
            assert bool(row["spans_boundary"]) == exp_span, (src, row["doc_id"])
            off += row["n_tok"]


def test_pack_tokens_empty_rows_and_capacity_guard(spark):
    from combinedfeatureextraction_spark.operators.packing import pack_tokens

    df = spark.createDataFrame(
        [(0, 0), (1, 5), (2, 0), (3, 7)], "doc_id long, n_tok long"
    )
    out = (
        pack_tokens(df, [], ["doc_id"], "n_tok", 8)
        .toPandas()
        .sort_values("doc_id")
    )
    assert out["start_offset"].tolist() == [0, 0, 5, 5]
    # doc 3: offsets 5..11 straddle the 8-boundary; empty docs never span
    assert out["spans_boundary"].tolist() == [False, False, False, True]
    with pytest.raises(ValueError, match="capacity"):
        pack_tokens(df, [], ["doc_id"], "n_tok", 0)


def test_stratified_take_exact_quota_and_monotone(spark):
    from combinedfeatureextraction_spark.operators.sampling import (
        stratified_take,
    )

    docs = _docs(spark)
    out = stratified_take(docs, ["doc_id"], "lang", 25, salt=2)
    counts = {
        r["lang"]: r["count"]
        for r in out.groupBy("lang").count().collect()
    }
    assert counts == {"en": 25, "de": 25, "fr": 25, "xx": 25}
    # quota beyond stratum size keeps the whole stratum
    all_rows = stratified_take(docs, ["doc_id"], "lang", 1000, salt=2)
    assert all_rows.count() == 400
    # monotone: top-10 ⊆ top-25 at the same salt; partitioning-stable
    top10 = {
        r["doc_id"]
        for r in stratified_take(docs, ["doc_id"], "lang", 10, salt=2).collect()
    }
    top25 = {r["doc_id"] for r in out.collect()}
    assert top10 <= top25
    repart = {
        r["doc_id"]
        for r in stratified_take(
            docs.repartition(7), ["doc_id"], "lang", 25, salt=2
        ).collect()
    }
    assert repart == top25
