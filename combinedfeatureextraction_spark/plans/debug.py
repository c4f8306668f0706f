"""Golden-sample debug mode — the Test_Run analog.

Reference (SURVEY.md K6/O3): sample one random element, emit its feature
dict as JSON plus a visual side-by-side for human inspection
(FeatureExtractor.py:213-287). Engine version: seeded-random sample of one
entity, dump its full ordered feature trace as JSON for eyeballing /
golden-diffing."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_entity_trace(
    features: DataFrame,
    entity: str = "doc_id",
    ts: str = "ts",
    seed: int = 42,
    out_path: str | Path | None = None,
) -> dict:
    """Pick ONE entity via seeded rand (orderBy(rand(seed)).limit(1) — the
    reference's `random.choice`, FeatureExtractor.py:226-229), collect its
    rows ordered by ts, and return {entity, rows:[{col: val}...]}. Small by
    construction (one entity) — the only collect in the engine's plans."""
    picked = (
        features.select(entity)
        .distinct()
        .orderBy(F.rand(seed))
        .limit(1)
        .collect()[0][0]
    )
    rows = (
        features.filter(F.col(entity) == picked)
        .orderBy(ts)
        .toJSON()
        .collect()
    )
    trace = {"entity": picked, "n_rows": len(rows), "rows": [json.loads(r) for r in rows]}
    if out_path:
        Path(out_path).write_text(json.dumps(trace, indent=1, default=str))
    return trace
