"""X7 polygon rasterize — golden shapes + shoelace-area consistency +
Spark mapInPandas plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_rectangle_exact():
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        rasterize_polygon_numpy,
    )

    # axis-aligned 4x3 rectangle: every interior pixel center covered
    pts = np.array([[2, 1], [6, 1], [6, 4], [2, 4]])
    mask, x_min, y_min = rasterize_polygon_numpy(pts)
    assert (x_min, y_min) == (2, 1)
    assert mask.shape == (3, 4)
    assert mask.all() and mask.sum() == 12


def test_triangle_half_area():
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        rasterize_polygon_numpy,
    )

    pts = np.array([[0, 0], [40, 0], [0, 40]])
    mask, _, _ = rasterize_polygon_numpy(pts)
    # pixel area ≈ analytic 800, within half-perimeter discretization
    assert abs(int(mask.sum()) - 800) <= 80


def test_area_tracks_shoelace():
    """Random convex-ish polygons: pixel area ≈ shoelace area within a
    perimeter-order boundary band (rasterization discretization bound)."""
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        rasterize_polygon_numpy,
    )

    rng = np.random.default_rng(3)
    for _ in range(25):
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(10, 60)
        cx, cy = rng.uniform(70, 130, 2)
        pts = np.stack(
            [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
        ).astype(int)
        x, y = pts[:, 0].astype(float), pts[:, 1].astype(float)
        shoelace = abs(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        ) / 2.0
        mask, _, _ = rasterize_polygon_numpy(pts)
        per = np.sum(np.hypot(np.diff(np.r_[x, x[0]]), np.diff(np.r_[y, y[0]])))
        assert abs(int(mask.sum()) - shoelace) <= per + 4, (pts, shoelace)


def test_degenerate_polygons():
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        mask_features_numpy,
        rasterize_polygon_numpy,
    )

    assert rasterize_polygon_numpy(np.zeros((2, 2)))[0].size == 0
    # collinear: zero area
    assert mask_features_numpy(np.array([[0, 0], [5, 0], [9, 0]]))[0] == 0


def test_polygon_mask_features_spark(spark):
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        polygon_mask_features,
    )

    pdf = pd.DataFrame(
        {
            "pid": [1, 2, 3],
            "points": [
                [[2, 1], [6, 1], [6, 4], [2, 4]],  # 4x3 rect
                [[0, 0], [10, 0], [10, 10], [0, 10]],  # 10x10 square
                [[0, 0], [1, 0]],  # degenerate
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        polygon_mask_features(df, "points", ["pid"])
        .toPandas()
        .set_index("pid")
        .sort_index()
    )
    assert out.loc[1, "mask_area"] == 12
    assert (out.loc[1, "bbox_w"], out.loc[1, "bbox_h"]) == (4, 3)
    assert out.loc[1, "centroid_x"] == pytest.approx(4.0)
    assert out.loc[1, "centroid_y"] == pytest.approx(2.5)
    assert out.loc[2, "mask_area"] == 100
    assert out.loc[3, "mask_area"] == 0
