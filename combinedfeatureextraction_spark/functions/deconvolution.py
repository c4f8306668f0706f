"""Log-space linear channel unmixing — the column-expression kill of the
reference's slowest code.

Reference (SURVEY.md X2): color deconvolution separates stains by solving
a 3×3 linear system in optical-density (log) space per pixel —
implemented there as a per-pixel Python ``for`` loop
(fextract/extraction_utils/PAS_deconvolution.py:67-89, the single slowest
kernel in the repo; stain matrix constants run_pathomic_fe.py:11-25).

Engine form — VALUE PARITY with the reference kernel
(PAS_deconvolution.py:72-89):
    OD_c  = -(maxval·log((x_c+1)/maxval)) / log(maxval)
    acc_j = Σ_c q[j,c]·OD_c        (q = inverse of the normalized matrix)
    out_j = round(min(exp(-(acc_j - maxval)·log(maxval)/maxval), maxval))
(round = floor(x+0.5), the reference's half-up). All plain codegen'd
column arithmetic — zero per-row Python, linear scan, no shuffle. The 3×3
inverse is computed once driver-side in numpy (constants fold into the
plan; the reference's hand-rolled elimination at :48-57 computes the same
inverse). The reference's degenerate zero-vector stain fixups (:21-40)
are out of scope — callers pass complete stain matrices.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column
from pyspark.sql import functions as F


def unmix_channels(
    channels: list[Column | str],
    stain_matrix: list[list[float]],
    maxval: float = 255.0,
) -> list[Column]:
    """Given N channel columns and an N×N stain matrix (rows = stains,
    unit-normalized), return N unmixed-channel columns."""
    cols = [F.col(c) if isinstance(c, str) else c for c in channels]
    m = np.asarray(stain_matrix, dtype=np.float64)
    # unit-normalize rows then invert, as the reference does
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    minv = np.linalg.inv(m / norms)
    logmax = float(np.log(maxval))
    od = [
        -(F.lit(maxval) * F.log((c.cast("double") + F.lit(1.0)) / F.lit(maxval)))
        / F.lit(logmax)
        for c in cols
    ]
    out = []
    for j in range(minv.shape[1]):
        acc = F.lit(0.0)
        for i in range(minv.shape[0]):
            acc = acc + F.lit(float(minv[i, j])) * od[i]
        raw = F.exp(-(acc - F.lit(maxval)) * F.lit(logmax) / F.lit(maxval))
        out.append(F.floor(F.least(raw, F.lit(maxval)) + F.lit(0.5)))
    return out


# the reference's H&E-ish default stain vectors (run_pathomic_fe.py:11-25)
DEFAULT_STAIN_MATRIX = [
    [0.644211, 0.716556, 0.266844],
    [0.092789, 0.954111, 0.283111],
    [0.759434, 0.268548, 0.592796],
]
