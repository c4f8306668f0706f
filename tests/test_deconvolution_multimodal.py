"""Deconvolution column math vs a numpy oracle; multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def test_unmix_matches_numpy(spark):
    from combinedfeatureextraction_spark.functions.deconvolution import (
        DEFAULT_STAIN_MATRIX,
        unmix_channels,
    )

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame(
        {
            "r": rng.integers(0, 255, 200).astype(float),
            "g": rng.integers(0, 255, 200).astype(float),
            "b": rng.integers(0, 255, 200).astype(float),
        }
    )
    df = spark.createDataFrame(pdf)
    u = unmix_channels(["r", "g", "b"], DEFAULT_STAIN_MATRIX)
    got = (
        df.select(*[c.alias(f"u{i}") for i, c in enumerate(u)])
        .toPandas()
        .values
    )
    # numpy oracle: a direct vectorization of the reference loop
    # (PAS_deconvolution.py:72-89), including scaled OD, the -255 offset,
    # the 255 clip and the floor(x+0.5) rounding
    m = np.asarray(DEFAULT_STAIN_MATRIX)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    minv = np.linalg.inv(m)
    log255 = np.log(255.0)
    od = -(255.0 * np.log((pdf.values + 1.0) / 255.0)) / log255
    acc = od @ minv
    want = np.exp(-(acc - 255.0) * log255 / 255.0)
    want = np.floor(np.minimum(want, 255.0) + 0.5)
    assert np.array_equal(got, want)


def test_media_feature_plumbing(spark):
    from combinedfeatureextraction_spark.multimodal.binary import (
        extract_media_features,
        frame_sample_plan,
    )

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "media_type": ["image", "video", "video"],
            "payload": [b"abcdef", b"xyz", b""],
            "meta": [
                {"width": 2, "height": 3, "n_frames": 0, "sample_rate": 0},
                {"width": 4, "height": 4, "n_frames": 25, "sample_rate": 0},
                {"width": 1, "height": 1, "n_frames": 3, "sample_rate": 0},
            ],
        }
    )
    from combinedfeatureextraction_spark.multimodal.binary import MEDIA_SCHEMA

    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feats = extract_media_features(media, decode="fake").orderBy("media_id").toPandas()
    assert feats["byte_len"].tolist() == [6, 3, 1]
    assert np.isclose(feats["byte_mean"][0], np.frombuffer(b"abcdef", np.uint8).mean())
    assert all(len(e) == 8 for e in feats["fake_embedding"])

    frames = frame_sample_plan(media, every_n=10).orderBy("media_id", "frame_idx")
    got = [(r["media_id"], r["frame_idx"]) for r in frames.collect()]
    assert got == [(2, 0), (2, 10), (2, 20), (3, 0)]


def test_media_real_decode_raises(spark):
    import pytest

    from combinedfeatureextraction_spark.multimodal.binary import _decode_real

    with pytest.raises(NotImplementedError):
        _decode_real(b"x", "image")
