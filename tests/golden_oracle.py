"""Single-process numpy/pandas golden oracle for the row-level feature
vector (FIXTURES.md §B) — an INDEPENDENT reimplementation of the engine's
semantics (the reference's math per SURVEY.md §2), used for allclose
parity exactly like the reference's morphometrics bounds catalog would be.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rowlevel_oracle(
    seqs: pd.DataFrame,
    states: pd.DataFrame,
    gap_seconds: float = 3600.0,
    roll_ks: tuple[int, ...] = (4, 16, 64),
    lags: tuple[int, ...] = (1, 2, 3),
    jumbo_n_tok: int = 4096,
) -> pd.DataFrame:
    """Compute the same columns as plans.pipeline.rowlevel_features."""
    out = []
    states = states.sort_values("effective_ts", kind="mergesort")
    for doc_id, g in seqs.groupby("doc_id", sort=True):
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        n = g["n_tok"].astype("float64")
        ts = g["ts"].astype("int64") / 1e6  # epoch seconds
        r = pd.DataFrame({"doc_id": doc_id, "seq_idx": g["seq_idx"].values})
        for k in lags:
            r[f"n_tok_lag_{k}"] = n.shift(k)
            r[f"n_tok_lead_{k}"] = n.shift(-k)
        for k in roll_ks:
            w = n.rolling(k + 1, min_periods=1)
            r[f"roll{k}_mean"] = w.mean()
            r[f"roll{k}_std"] = w.std(ddof=0)
            r[f"roll{k}_min"] = w.min()
            r[f"roll{k}_max"] = w.max()
        r["tok_min"] = [float(np.min(t)) for t in g["tokens"]]
        r["tok_max"] = [float(np.max(t)) for t in g["tokens"]]
        gap_prev = ts - ts.shift(1)
        r["gap_prev"] = gap_prev
        boundary = gap_prev.isna() | (gap_prev >= gap_seconds)
        r["session_id"] = boundary.cumsum() - 1
        # distance to nearest boundary row (two-sided, seconds)
        b_ts = ts.where(boundary)
        d_prev = ts - b_ts.ffill()
        d_next = b_ts.bfill() - ts
        r["dist_to_boundary"] = np.fmin(d_prev, d_next)
        # jumbo bailout nulls the heavy stats
        for k in roll_ks:
            r.loc[g["n_tok"] > jumbo_n_tok, f"roll{k}_std"] = np.nan
        # as-of joined state per source
        src = g["source"].iloc[0]
        st = states[states["source"] == src]
        merged = pd.merge_asof(
            g[["ts"]],
            st[["effective_ts", "state_val"]],
            left_on="ts",
            right_on="effective_ts",
            direction="backward",
        )
        r["asof_state_val"] = merged["state_val"].values
        r["state_ffill"] = pd.Series(merged["state_val"].values).ffill().values
        out.append(r)
    return pd.concat(out, ignore_index=True)
