"""Deterministic synthetic-fixture generators for the engine's native
input table (FIXTURES.md §A):

    sequences(doc_id string, seq_idx int, ts timestamp,
              tokens array<int32>, n_tok int32, source string)
    states(source string, effective_ts timestamp, state_val double)

Determinism contract: every row is a pure function of (seed, doc index,
seq_idx) — independent of partitioning, row order, or cluster size — so
the same (seed, n_docs) always yields byte-identical token arrays. That is
what makes the tokens byte-equality invariant testable, and it's why the
DISTRIBUTED generator (mapInPandas over doc-index ranges) and the local
pandas generator produce identical tables.

Reference analogs: skewed rows-per-entity ≙ tubule≫artery layer skew
(fextract/extraction_utils/layer_dict.py); jumbo-row tail ≙ the >5000 px
crop bailout (extract_reference_features.py:447-448); ts ≙ the
`sort=updated` annotation order (FeatureExtractor.py:97).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SOURCES = ("web", "books", "code", "wiki", "forums", "papers")
SOURCE_W = (0.55, 0.20, 0.12, 0.08, 0.04, 0.01)
VOCAB = 50257
EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

STATES_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("effective_ts", T.TimestampType(), False),
        T.StructField("state_val", T.DoubleType(), False),
    ]
)


def _doc_rows(seed: int, doc_idx: int, mean_tok: float = 148.0) -> pd.DataFrame:
    """All rows for one doc — the deterministic unit of generation."""
    rng = np.random.default_rng([seed, doc_idx])
    # rows-per-entity: Zipf-ish heavy tail, clipped
    n_rows = int(min(rng.zipf(1.3), 500))
    source = SOURCES[rng.choice(len(SOURCES), p=SOURCE_W)]
    # n_tok: lognormal(µ=ln(mean)-σ²/2, σ=0.8) clipped [4, 8192]
    mu = np.log(mean_tok) - 0.32
    n_tok = np.clip(rng.lognormal(mu, 0.8, n_rows), 4, 8192).astype(np.int32)
    # ts = epoch + seq_idx·Δ(doc) + jitter; ~10% of steps get a big gap
    delta_s = float(rng.uniform(30, 600))
    steps = np.full(n_rows, delta_s) + rng.uniform(-5, 5, n_rows)
    gap_mask = rng.random(n_rows) < 0.10
    steps[gap_mask] += rng.uniform(3600, 7200, gap_mask.sum())
    steps[0] = abs(steps[0])
    ts = EPOCH + (np.cumsum(steps) * 1e6).astype("timedelta64[us]")
    tokens = [rng.integers(0, VOCAB, k, dtype=np.int32) for k in n_tok]
    return pd.DataFrame(
        {
            "doc_id": f"doc{doc_idx:08d}",
            "seq_idx": np.arange(n_rows, dtype=np.int32),
            "ts": ts,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
        }
    )


def sequences_pandas(n_docs: int, seed: int = 42, mean_tok: float = 148.0) -> pd.DataFrame:
    """Local (driver-side) generation — test fixtures and the golden
    numpy/pandas oracle both consume this."""
    return pd.concat(
        [_doc_rows(seed, i, mean_tok) for i in range(n_docs)], ignore_index=True
    )


def sequences_spark(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    mean_tok: float = 148.0,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed generation: doc-index ranges fan out via mapInPandas —
    the generator itself scales with the cluster, and per-doc determinism
    guarantees the result is independent of ``parallelism``."""
    par = parallelism or spark.sparkContext.defaultParallelism
    idx = spark.range(n_docs).repartition(par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for doc_idx in b["id"].tolist():
                yield _doc_rows(seed, int(doc_idx), mean_tok)

    return idx.mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def states_pandas(seed: int = 42, ticks_per_source: int = 200) -> pd.DataFrame:
    """Sparse irregular per-source state ticks (as-of join build side):
    a seeded random walk whose ticks straddle the probe ts range so both
    matched and unmatched (leakage-guard) cases occur."""
    frames = []
    for si, source in enumerate(SOURCES):
        rng = np.random.default_rng([seed, 7777, si])
        # start some sources before the epoch, some after (leakage cases)
        start_off = rng.uniform(-86400, 43200)
        gaps = rng.exponential(1800, ticks_per_source)
        ts = EPOCH + ((start_off + np.cumsum(gaps)) * 1e6).astype("timedelta64[us]")
        vals = np.cumsum(rng.normal(0, 1.0, ticks_per_source)) + 100.0
        frames.append(
            pd.DataFrame(
                {"source": source, "effective_ts": ts, "state_val": vals}
            )
        )
    return pd.concat(frames, ignore_index=True)


def states_spark(spark: SparkSession, seed: int = 42, ticks: int = 200) -> DataFrame:
    return spark.createDataFrame(states_pandas(seed, ticks), schema=STATES_SCHEMA)
