"""1-D watershed session splitting — the in-UDF peak/valley analog of the
reference's marker-based watershed (SURVEY.md W5).

Reference: fextract/extractioncodes/FeatureExtractor.py:346-354 —
``distance_transform_edt`` → ``peak_local_max`` → markers →
``watershed(-distance, markers, mask)``: a connected region is split into
one sub-object per distance peak, with boundaries at the valleys between
peaks. The 1-D sequence analog: within each session (connected run), local
maxima of the value series are the markers; the session splits at the
minimum between consecutive peaks. Rows up to and including the valley row
belong to the left peak's basin (deterministic tie: first minimal row).

Physically this is the SURVEY §7 plan of record for W5: an Arrow-batched
``applyInPandas`` per entity bucket — the fixpoint flood is genuinely
iterative in 2-D, but in 1-D it collapses to a vectorized peak/valley scan
(numpy, no per-row Python). Entities are hash-bucketed so high-cardinality
keys don't fragment Arrow batches (same pattern as asof._asof_cogroup).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def split_session_numpy(v: np.ndarray) -> np.ndarray:
    """Subsession ids (0-based) for one session's ordered values.

    Peaks = strict local maxima (plateaus count once, at their first row —
    ``peak_local_max`` footprint semantics collapse a flat top to one
    marker). 0 or 1 peak → no split. k peaks → k basins; boundary after
    the first minimal row strictly between consecutive peaks."""
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # peak = first row of a plateau (strict rise on the left / sequence
    # start) whose NEXT value change is a drop (or there is none). A
    # one-step lookahead would miscount a plateau that later RISES, so the
    # next nonzero step direction is backward-filled across plateaus.
    left = np.empty(n, dtype=bool)
    left[0] = True
    left[1:] = v[1:] > v[:-1]
    if n == 1:
        peaks = np.array([0])
    else:
        d = np.sign(np.diff(v))  # n-1 edges
        idx = np.arange(n - 1)
        pos = np.where(d != 0, idx, n - 1)  # sentinel: no change after
        nextpos = np.minimum.accumulate(pos[::-1])[::-1]
        nextdir = np.where(nextpos < n - 1, d[np.minimum(nextpos, n - 2)], 0.0)
        right = np.empty(n, dtype=bool)
        right[-1] = True
        right[:-1] = nextdir <= 0  # next change drops, or plateau to end
        peaks = np.flatnonzero(left & right)
    if len(peaks) <= 1:
        return np.zeros(n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    for k in range(len(peaks) - 1):
        a, b = peaks[k], peaks[k + 1]
        valley = a + 1 + int(np.argmin(v[a + 1 : b + 1]))
        # rows AFTER the valley belong to the next basin
        out[valley + 1 :] = k + 1
    return out


def watershed_split(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    session_col: str = "session_id",
    out: str = "subsession_id",
    bucket_count: int = 32,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Split every (entity, session) at value-valleys between value-peaks.

    Output: input columns + ``out`` (0-based subsession id within the
    session). One shuffle on the entity-hash bucket; inside a bucket the
    work is a vectorized numpy pass per session. ``tiebreak``: extra
    sort columns after ``ts`` — pass a unique id when ``ts`` can repeat
    within an entity, otherwise the within-tie order (and therefore the
    peak/valley scan) inherits nondeterministic shuffle order."""
    keys = list(keys)
    bucket = "__cfe_bucket"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType(), False)]
    )
    in_cols = df.columns

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [*keys, session_col, ts, *tiebreak], kind="mergesort"
        )
        sub = np.concatenate(
            [
                split_session_numpy(g[value].to_numpy(dtype=np.float64))
                for _, g in pdf.groupby([*keys, session_col], sort=False)
            ]
        ) if len(pdf) else np.zeros(0, dtype=np.int64)
        pdf = pdf.assign(**{out: sub})
        return pdf[in_cols + [out]]

    return (
        df.withColumn(bucket, F.pmod(F.xxhash64(*keys), F.lit(bucket_count)))
        .groupBy(bucket)
        .applyInPandas(lambda _, pdf: apply(pdf.drop(columns=[bucket])), schema)
    )
