"""W5 watershed analog — independent-oracle parity + shape cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def oracle_split(v) -> list[int]:
    """Independent O(n²)-ish reference: peaks by explicit neighbor loops,
    boundaries at the first min strictly between consecutive peaks."""
    v = list(map(float, v))
    n = len(v)
    peaks = []
    for i in range(n):
        lo = v[i - 1] if i > 0 else float("-inf")
        is_left_up = v[i] > lo
        # plateau: walk right over equals; peak iff eventually drops/ends
        j = i
        while j + 1 < n and v[j + 1] == v[i]:
            j += 1
        is_right_down = j + 1 >= n or v[j + 1] < v[i]
        if is_left_up and is_right_down:
            peaks.append(i)
    if len(peaks) <= 1:
        return [0] * n
    bounds = []
    for a, b in zip(peaks, peaks[1:]):
        seg = v[a + 1 : b + 1]
        bounds.append(a + 1 + seg.index(min(seg)))
    out = []
    for i in range(n):
        out.append(sum(1 for x in bounds if i > x))
    return out


def test_split_session_numpy_cases():
    from combinedfeatureextraction_spark.operators.watershed import (
        split_session_numpy,
    )

    # monotone: single basin
    assert split_session_numpy(np.array([1.0, 2, 3, 4])).tolist() == [0] * 4
    # two peaks, valley at index 2
    assert split_session_numpy(
        np.array([1.0, 5, 2, 6, 1])
    ).tolist() == [0, 0, 0, 1, 1]
    # plateau top is ONE peak
    assert split_session_numpy(np.array([1.0, 5, 5, 5, 1])).tolist() == [0] * 5
    # empty / singleton
    assert split_session_numpy(np.array([])).tolist() == []
    assert split_session_numpy(np.array([3.0])).tolist() == [0]


def test_split_matches_independent_oracle():
    from combinedfeatureextraction_spark.operators.watershed import (
        split_session_numpy,
    )

    rng = np.random.default_rng(5)
    for trial in range(200):
        n = int(rng.integers(1, 40))
        # small integer values force plateaus and ties
        v = rng.integers(0, 6, size=n).astype(np.float64)
        got = split_session_numpy(v).tolist()
        want = oracle_split(v)
        assert got == want, (trial, v.tolist())


def test_watershed_split_spark(spark):
    from combinedfeatureextraction_spark.operators.sessionize import sessionize
    from combinedfeatureextraction_spark.operators.watershed import (
        watershed_split,
    )

    rng = np.random.default_rng(9)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=n),
            "ts": pd.to_datetime(
                np.sort(rng.uniform(0, 3e5, size=n)), unit="s"
            ).floor("us"),
            "v": rng.integers(0, 8, size=n).astype(np.float64),
        }
    )
    df = spark.createDataFrame(pdf)
    sess = sessionize(df, ["k"], "ts", 600.0)
    out = watershed_split(sess, ["k"], "ts", "v").toPandas()
    assert len(out) == n
    lab = out.sort_values(["k", "session_id", "ts"], kind="mergesort")
    for (_, _), g in lab.groupby(["k", "session_id"]):
        want = oracle_split(g["v"].tolist())
        assert g["subsession_id"].tolist() == want
    # subsessions are contiguous runs starting at 0
    for (_, _), g in lab.groupby(["k", "session_id"]):
        s = g["subsession_id"].to_numpy()
        assert s[0] == 0 and (np.diff(s) >= 0).all() and (np.diff(s) <= 1).all()
