"""Materialize the golden parquet fixtures (FIXTURES.md §B).

The golden is produced by the INDEPENDENT single-process numpy/pandas
oracle (tests/golden_oracle.py) over the deterministic `small` fixture —
never by the engine itself — and committed to git. The engine must then
reproduce it under numpy allclose (tests/test_golden_parquet.py).

Regenerate (only when the feature contract intentionally changes):
    python scripts/make_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

GOLDEN_DIR = REPO / "tests" / "golden"
N_DOCS = 120
SEED = 42


def main() -> None:
    from combinedfeatureextraction_spark.sources.fixtures import (
        sequences_pandas,
        states_pandas,
    )
    from golden_oracle import rowlevel_oracle

    seqs = sequences_pandas(N_DOCS, seed=SEED)
    states = states_pandas(seed=SEED)
    golden = rowlevel_oracle(seqs, states)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    out = GOLDEN_DIR / "features_rowlevel.parquet"
    golden.to_parquet(out, index=False)
    print(f"wrote {out}: {len(golden)} rows, {len(golden.columns)} cols")


if __name__ == "__main__":
    main()
