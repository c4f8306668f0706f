"""Polygon rasterization — the in-UDF payload-geometry path (SURVEY.md X7).

Reference: contours are rasterized to binary masks with cv2.fillPoly /
PIL polygon fill (fextract/extractioncodes/FeatureExtractor.py:313,
extraction_utils/xml_to_mask_minmax.py rasterizer) and the mask feeds
area / centroid / bbox features. cv2/PIL are not in this container, so
the fill is a self-contained numpy even-odd scanline rasterizer — the
same algorithm class fillPoly implements — wrapped in an Arrow-batched
``mapInPandas``. Geometry never becomes a Spark type: points arrive as
``array<array<int>>`` columns, masks live and die inside the UDF, and
only scalar features (area, bbox, centroid) come back — the SURVEY §1.1
"payload stays Arrow-side" contract.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def rasterize_polygon_numpy(points: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Even-odd scanline fill of a closed polygon.

    ``points``: (n, 2) int array of (x, y) vertices. Returns
    (mask, x_min, y_min) where mask is a bool[h, w] in the polygon's
    local frame (the reference's bbox-crop + rebase, FeatureExtractor.py:
    295-305). Pixel-center convention: pixel (r, c) is filled iff its
    center (x_min+c+0.5, y_min+r+0.5) is inside the polygon — matching
    matplotlib.path/cv2 up to boundary ties."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 3:
        return np.zeros((0, 0), dtype=bool), 0, 0
    x_min = int(np.floor(pts[:, 0].min()))
    y_min = int(np.floor(pts[:, 1].min()))
    w = int(np.ceil(pts[:, 0].max())) - x_min
    h = int(np.ceil(pts[:, 1].max())) - y_min
    if w <= 0 or h <= 0:
        return np.zeros((0, 0), dtype=bool), x_min, y_min
    mask = np.zeros((h, w), dtype=bool)
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for r in range(h):
        yc = y_min + r + 0.5
        # edges crossing the scanline (half-open [min, max) kills vertex
        # double-counting)
        crosses = ((y0 <= yc) & (y1 > yc)) | ((y1 <= yc) & (y0 > yc))
        if not crosses.any():
            continue
        xs = x0[crosses] + (yc - y0[crosses]) * (
            (x1[crosses] - x0[crosses]) / (y1[crosses] - y0[crosses])
        )
        xs = np.sort(xs)
        # fill between alternating crossing pairs
        for a, b in zip(xs[0::2], xs[1::2]):
            c0 = int(np.ceil(a - x_min - 0.5))
            c1 = int(np.floor(b - x_min - 0.5))
            if c1 >= c0:
                mask[r, max(c0, 0) : min(c1 + 1, w)] = True
    return mask, x_min, y_min


MASK_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("mask_area", T.LongType(), True),
        T.StructField("bbox_w", T.IntegerType(), True),
        T.StructField("bbox_h", T.IntegerType(), True),
        T.StructField("centroid_x", T.DoubleType(), True),
        T.StructField("centroid_y", T.DoubleType(), True),
    ]
)


def mask_features_numpy(points: np.ndarray) -> tuple:
    mask, x_min, y_min = rasterize_polygon_numpy(points)
    area = int(mask.sum())
    if area == 0:
        return 0, int(mask.shape[1]), int(mask.shape[0]), None, None
    rr, cc = np.nonzero(mask)
    return (
        area,
        int(mask.shape[1]),
        int(mask.shape[0]),
        float(cc.mean() + x_min + 0.5),
        float(rr.mean() + y_min + 0.5),
    )


def polygon_mask_features(
    df: DataFrame,
    points_col: str,
    id_cols: Sequence[str],
) -> DataFrame:
    """id_cols + (mask_area, bbox_w, bbox_h, centroid_x, centroid_y) per
    polygon row via mapInPandas — one rasterize per row inside the Arrow
    batch, masks never leave the UDF. Scale: a pure map (no shuffle);
    parallelism = input partitions."""
    id_fields = [df.schema[c] for c in id_cols]
    schema = T.StructType(list(id_fields) + list(MASK_FEATURES_SCHEMA.fields))
    cols = list(id_cols) + [points_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                mask_features_numpy(np.array([list(p) for p in pts]))
                if pts is not None and len(pts) >= 3
                else (0, 0, 0, None, None)
                for pts in pdf[points_col]
            ]
            f = pd.DataFrame(
                feats,
                columns=[x.name for x in MASK_FEATURES_SCHEMA.fields],
                index=pdf.index,
            )
            yield pd.concat([pdf[list(id_cols)], f], axis=1)

    return df.select(*cols).mapInPandas(run, schema)


# -------------------------------------------------- 2-D components

def label_components_numpy(
    mask: np.ndarray, connectivity: int = 4
) -> tuple[np.ndarray, int]:
    """2-D connected-component labeling of a bool mask (run-based
    union-find, two passes) — the in-UDF analog of the reference's
    per-structure sub-segmentation (FeatureExtractor.py:346-354 labels
    the split mask before per-compartment stats; scipy/skimage are not
    in this container, so the labeling is self-contained numpy).

    ``connectivity``: 4 (edge-adjacent, scipy.ndimage.label default) or
    8 (corner-adjacent, cv2 default). Returns (labels, n) with labels in
    1..n numbered by first raster-order appearance (deterministic) and 0
    for background. Row loop is O(h) python over ≤ bbox-height rows of a
    per-element mask — payload-local work inside the Arrow batch, never
    a Spark type."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int64)
    if h == 0 or w == 0:
        return labels, 0
    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> int:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        return ra

    prev_runs: list[tuple[int, int, int]] = []
    row8 = 1 if connectivity == 8 else 0
    for r in range(h):
        d = np.diff(np.concatenate(([0], mask[r].astype(np.int8), [0])))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        runs: list[tuple[int, int, int]] = []
        for c0, c1 in zip(starts, ends):
            lbl = -1
            for p0, p1, pl in prev_runs:
                # 4-conn: column ranges must overlap; 8-conn: touching
                # diagonally (±1 column) also connects
                if p0 < c1 + row8 and p1 + row8 > c0:
                    lbl = find(pl) if lbl < 0 else union(lbl, pl)
            if lbl < 0:
                lbl = len(parent)
                parent.append(lbl)
            labels[r, c0:c1] = lbl
            runs.append((int(c0), int(c1), lbl))
        prev_runs = runs
    if not parent:
        return labels, 0
    # resolve + renumber by first raster appearance
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int64)
    flat = labels[mask]
    flat = roots[flat]
    order = pd.unique(flat)
    remap = {int(root): i + 1 for i, root in enumerate(order)}
    labels[mask] = np.array([remap[int(x)] for x in flat], dtype=np.int64)
    return labels, len(order)


COMPONENT_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("mask_area", T.LongType(), True),
        T.StructField("n_components", T.IntegerType(), True),
        T.StructField("largest_area", T.LongType(), True),
        T.StructField("largest_cx", T.DoubleType(), True),
        T.StructField("largest_cy", T.DoubleType(), True),
        T.StructField("area_ratio", T.DoubleType(), True),
    ]
)


def component_features_numpy(points: np.ndarray, connectivity: int = 4) -> tuple:
    """Rasterize one polygon and label its 2-D components in the same
    in-UDF pass: even-odd fill of a self-intersecting polygon yields
    MULTIPLE disjoint regions, exactly the reference's split-then-measure
    shape. Returns (mask_area, n_components, largest_area, largest
    centroid x/y in world frame, largest/total area ratio)."""
    mask, x_min, y_min = rasterize_polygon_numpy(points)
    area = int(mask.sum())
    if area == 0:
        return 0, 0, 0, None, None, None
    labels, n = label_components_numpy(mask, connectivity)
    sizes = np.bincount(labels[mask], minlength=n + 1)[1:]
    # tie-break: argmax picks the lowest label = first raster appearance
    big = int(sizes.argmax()) + 1
    rr, cc = np.nonzero(labels == big)
    return (
        area,
        int(n),
        int(sizes[big - 1]),
        float(cc.mean() + x_min + 0.5),
        float(rr.mean() + y_min + 0.5),
        float(sizes[big - 1]) / float(area),
    )


def polygon_component_features(
    df: DataFrame,
    points_col: str,
    id_cols: Sequence[str],
    connectivity: int = 4,
) -> DataFrame:
    """id_cols + COMPONENT_FEATURES_SCHEMA per polygon row: rasterize →
    2-D connected components → per-component measurement, all inside ONE
    mapInPandas (masks and label arrays never leave the UDF). Pure map,
    no shuffle; parallelism = input partitions — the 100 TB shape is
    identical to polygon_mask_features."""
    id_fields = [df.schema[c] for c in id_cols]
    schema = T.StructType(list(id_fields) + list(COMPONENT_FEATURES_SCHEMA.fields))
    cols = list(id_cols) + [points_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                component_features_numpy(
                    np.array([list(p) for p in pts]), connectivity
                )
                if pts is not None and len(pts) >= 3
                else (0, 0, 0, None, None, None)
                for pts in pdf[points_col]
            ]
            f = pd.DataFrame(
                feats,
                columns=[x.name for x in COMPONENT_FEATURES_SCHEMA.fields],
                index=pdf.index,
            )
            yield pd.concat([pdf[list(id_cols)], f], axis=1)

    return df.select(*cols).mapInPandas(run, schema)
