"""GLCM texture stats (W1) — numpy closed-form parity + invariants.

The numpy oracle reimplements skimage ``graycoprops`` formulas
(reference FeatureExtractor.py:500-519 semantics) directly from the
definition so parity is against the math, not a library.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def glcm_numpy(levels_seq: np.ndarray, n_levels: int = 16) -> dict[str, float]:
    """Symmetric normed offset-1 co-occurrence stats of a 1-D level seq."""
    i, j = levels_seq[:-1], levels_seq[1:]
    P = np.zeros((n_levels, n_levels), dtype=np.float64)
    for a, b in zip(i, j):
        P[a, b] += 1
        P[b, a] += 1
    n = P.sum()
    if n == 0:
        return {}
    P /= n
    idx = np.arange(n_levels, dtype=np.float64)
    I, J = np.meshgrid(idx, idx, indexing="ij")
    contrast = float((P * (I - J) ** 2).sum())
    homogeneity = float((P / (1.0 + (I - J) ** 2)).sum())
    energy = float(np.sqrt((P**2).sum()))
    mu = float((P * I).sum())
    var = float((P * (I - mu) ** 2).sum())
    cov = float((P * (I - mu) * (J - mu)).sum())
    corr = 1.0 if var <= 0 else cov / var
    return {
        "contrast": contrast,
        "homogeneity": homogeneity,
        "energy": energy,
        "correlation": corr,
    }


@pytest.fixture(scope="module")
def level_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for ent in range(6):
        m = int(rng.integers(2, 400))
        lv = rng.integers(0, 16, size=m)
        for t, x in enumerate(lv):
            rows.append((f"e{ent}", t, int(x)))
    pdf = pd.DataFrame(rows, columns=["ent", "t", "lvl"])
    return spark.createDataFrame(pdf), pdf


def test_glcm_matches_numpy(level_df):
    from combinedfeatureextraction_spark.operators.texture import glcm_texture

    df, pdf = level_df
    got = (
        glcm_texture(df, "lvl", ["ent"], ["t"])
        .toPandas()
        .set_index("ent")
        .sort_index()
    )
    for ent, g in pdf.groupby("ent"):
        want = glcm_numpy(g.sort_values("t")["lvl"].to_numpy())
        if not want:
            assert ent not in got.index
            continue
        for k, v in want.items():
            assert got.loc[ent, k] == pytest.approx(v, abs=1e-9), (ent, k)


def test_glcm_constant_sequence(spark):
    """All-equal levels: contrast 0, homogeneity 1, energy 1, corr 1
    (σ²=0 convention — skimage returns 1 for a uniform patch)."""
    from combinedfeatureextraction_spark.operators.texture import glcm_texture

    df = spark.createDataFrame(
        pd.DataFrame({"ent": ["a"] * 5, "t": range(5), "lvl": [3] * 5})
    )
    row = glcm_texture(df, "lvl", ["ent"], ["t"]).collect()[0]
    assert row["contrast"] == 0.0
    assert row["homogeneity"] == pytest.approx(1.0)
    assert row["energy"] == pytest.approx(1.0)
    assert row["correlation"] == 1.0


def test_glcm_single_row_entity_absent(spark):
    from combinedfeatureextraction_spark.operators.texture import glcm_texture

    df = spark.createDataFrame(
        pd.DataFrame({"ent": ["a", "b", "b"], "t": [0, 0, 1], "lvl": [1, 2, 9]})
    )
    out = glcm_texture(df, "lvl", ["ent"], ["t"]).toPandas()
    assert set(out["ent"]) == {"b"}


def test_glcm_offset2_matches_numpy(level_df):
    """offset generalization: pairs at distance 2."""
    from combinedfeatureextraction_spark.operators.texture import glcm_texture

    df, pdf = level_df
    got = (
        glcm_texture(df, "lvl", ["ent"], ["t"], offset=2)
        .toPandas()
        .set_index("ent")
    )
    for ent, g in pdf.groupby("ent"):
        lv = g.sort_values("t")["lvl"].to_numpy()
        if len(lv) < 3:
            assert ent not in got.index
            continue
        i, j = lv[:-2], lv[2:]
        P = np.zeros((16, 16))
        for a, b in zip(i, j):
            P[a, b] += 1
            P[b, a] += 1
        P /= P.sum()
        idx = np.arange(16.0)
        I, J = np.meshgrid(idx, idx, indexing="ij")
        assert got.loc[ent, "contrast"] == pytest.approx(
            float((P * (I - J) ** 2).sum()), abs=1e-9
        )


def test_quantize_level_range(spark):
    from combinedfeatureextraction_spark.operators.texture import quantize_level

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"v": [-33.5, -0.1, 0.0, 0.9, 15.99, 16.0, 1e6]})
    )
    vals = [r[0] for r in df.select(quantize_level("v", 16)).collect()]
    assert all(0 <= x < 16 for x in vals)
    # floor(-0.1) = -1 -> 15; 16.0 -> 0
    assert vals[1] == 15 and vals[5] == 0


def test_component_moments_numpy(spark):
    """component_moments std/duration/range/aspect vs pandas groupby."""
    from combinedfeatureextraction_spark.operators.sessionize import (
        component_moments,
        sessionize,
    )

    rng = np.random.default_rng(11)
    n = 500
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=n),
            "ts": pd.to_datetime(
                np.sort(rng.uniform(0, 1e6, size=n)), unit="s"
            ).floor("us"),  # Spark timestamps are µs — drop pandas' ns part
            "v": rng.normal(10, 4, size=n),
        }
    )
    df = spark.createDataFrame(pdf)
    sess = sessionize(df, ["k"], "ts", 3600.0)
    got = (
        component_moments(sess, ["k"], "ts", "v")
        .toPandas()
        .set_index(["k", "session_id"])
        .sort_index()
    )
    lab = sess.select("k", "ts", "v", "session_id").toPandas()
    for (k, sid), g in lab.groupby(["k", "session_id"]):
        e = g["ts"].to_numpy().astype("datetime64[us]").astype("int64") / 1e6
        v = g["v"].to_numpy()
        dur = e.max() - e.min()
        rngv = v.max() - v.min()
        r = got.loc[(k, sid)]
        assert r["session_len"] == len(g)
        assert r["session_std"] == pytest.approx(np.std(v), abs=1e-9)
        assert r["session_duration"] == pytest.approx(dur, abs=1e-6)
        assert r["session_range"] == pytest.approx(rngv, abs=1e-9)
        want_asp = 0.0 if dur == 0 else rngv / dur
        assert r["session_aspect"] == pytest.approx(want_asp, rel=1e-9)
