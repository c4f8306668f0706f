"""Color transforms (multimodal.color): HSV pinned against the stdlib
colorsys dual, LAB against published sRGB reference values, and the
masked-stats operator end-to-end through Spark."""

import colorsys

import numpy as np
import pandas as pd
import pytest


def test_rgb_to_hsv_matches_colorsys():
    from combinedfeatureextraction_spark.multimodal.color import (
        rgb_to_hsv_numpy,
    )

    rng = np.random.default_rng(37)
    px = rng.integers(0, 256, size=(200, 3)).astype(np.float64) / 255.0
    # force the tie/achromatic branches too
    px = np.vstack(
        [px, [[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5], [0.5, 0.5, 0.2],
              [0.2, 0.5, 0.5], [0.5, 0.2, 0.5]]]
    )
    got = rgb_to_hsv_numpy(px)
    want = np.array([colorsys.rgb_to_hsv(*p) for p in px])
    assert np.allclose(got, want, atol=1e-12)


def test_rgb_to_lab_reference_values():
    """Published CIELAB values for the sRGB primaries + white/black
    (D65, 2° observer) — the same values skimage.color.rgb2lab
    produces."""
    from combinedfeatureextraction_spark.multimodal.color import (
        rgb_to_lab_numpy,
    )

    cases = {
        (1.0, 1.0, 1.0): (100.0, 0.0, 0.0),
        (0.0, 0.0, 0.0): (0.0, 0.0, 0.0),
        (1.0, 0.0, 0.0): (53.24, 80.09, 67.20),
        (0.0, 1.0, 0.0): (87.74, -86.18, 83.18),
        (0.0, 0.0, 1.0): (32.30, 79.19, -107.86),
    }
    for rgb, want in cases.items():
        got = rgb_to_lab_numpy(np.array(rgb))
        assert np.allclose(got, want, atol=0.05), (rgb, got)


def _ppm6(w, h, pixels):
    return (f"P6\n{w} {h}\n255\n".encode()
            + bytes(v for px in pixels for v in px))


def _ppm5(w, h, vals):
    return f"P5\n{w} {h}\n255\n".encode() + bytes(vals)


def test_masked_color_stats_spark(spark):
    from combinedfeatureextraction_spark.multimodal.color import (
        masked_color_stats,
        rgb_to_lab_numpy,
    )

    # 2x3 image; mask selects the top row only
    pix = [(200, 40, 10), (10, 180, 70), (30, 30, 220),
           (255, 255, 255), (0, 0, 0), (128, 128, 128)]
    img = _ppm6(3, 2, pix)
    msk = _ppm5(3, 2, [255, 1, 255, 0, 0, 0])
    empty = _ppm5(3, 2, [0] * 6)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "payload": [img, img],
             "mask_payload": [msk, empty]}
        )
    )
    out = {r["media_id"]: r for r in
           masked_color_stats(media, space="lab").collect()}
    sel = rgb_to_lab_numpy(np.array(pix[:3], dtype=np.float64) / 255.0)
    assert out[1]["n_masked"] == 3
    assert np.isclose(out[1]["c1_mean"], sel[:, 0].mean())
    assert np.isclose(out[1]["c2_std"], sel[:, 1].std())
    # empty compartment -> reference's 0.0 convention
    assert out[2]["n_masked"] == 0 and out[2]["c1_mean"] == 0.0


def test_masked_color_stats_rejects_bad_space(spark):
    from combinedfeatureextraction_spark.multimodal.color import (
        masked_color_stats,
    )

    with pytest.raises(ValueError, match="space"):
        masked_color_stats(spark.range(1), space="xyz")
