"""Sub-compartment cascade (multimodal.subcompartment): primitive
pinning (equalize / holes / small objects) + cascade invariants."""

import numpy as np

from combinedfeatureextraction_spark.multimodal.subcompartment import (
    equalize_hist_masked,
    remove_small_holes_numpy,
    remove_small_objects_numpy,
    sub_compartment_masks_numpy,
)

PARAMS = [
    {"name": "nuclei", "threshold": 200, "min_size": 4},
    {"name": "eos", "threshold": 60, "min_size": 4},
    {"name": "luminal", "threshold": 255, "min_size": 0},
]


def test_equalize_hist_masked_exact_cdf():
    img = np.array([[10, 10, 50], [50, 50, 200]], dtype=np.uint8)
    mask = np.ones((2, 3), bool)
    out = equalize_hist_masked(img, mask)
    # cdf: 10 -> 2/6, 50 -> 5/6, 200 -> 1
    assert out[0, 0] == int(255 * 2 / 6)
    assert out[0, 2] == int(255 * 5 / 6)
    assert out[1, 2] == 255
    # mask restricts the CDF: with only the top row masked,
    # cdf(10)=2/3, cdf(50)=1 — and unmasked pixels still map
    out2 = equalize_hist_masked(img, np.array([[1, 1, 1], [0, 0, 0]], bool))
    assert out2[0, 0] == int(255 * 2 / 3)
    assert out2[1, 2] == 255  # 200 > all masked values -> cdf 1


def test_remove_small_objects_and_holes():
    m = np.zeros((7, 9), bool)
    m[1:5, 1:5] = True   # 16 px object with a hole
    m[2:4, 2:4] = False  # 4 px hole
    m[5, 7] = True       # 1 px speck
    kept = remove_small_objects_numpy(m, 5)
    assert not kept[5, 7] and kept[1, 1]
    filled = remove_small_holes_numpy(m, area_threshold=5)
    assert filled[2, 2] and not filled[0, 0]
    # hole >= threshold stays
    assert not remove_small_holes_numpy(m, area_threshold=4)[2, 2]
    # background touching the border is never a hole
    edge = np.ones((4, 4), bool)
    edge[0, 0] = False
    assert not remove_small_holes_numpy(edge, 10)[0, 0]


def _stripe_image(w1, w2, a, bb):
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :w1] = 20 + a
    img[:, w1 : w1 + w2] = (200, 100 + bb, 100 + bb)
    img[:, w1 + w2 :] = (220, 220, 220)
    return img


def test_cascade_matches_fixture_closed_form():
    """The q_subcompartment oracle's closed form, re-derived here per
    fixture row directly against the numpy cascade."""
    for v in range(60):
        w1, w2 = 2 + v % 3, 2 + v % 2
        img = _stripe_image(w1, w2, v % 20, v % 50)
        mask = np.ones((8, 8), bool)
        oh = sub_compartment_masks_numpy(img, mask, PARAMS)
        assert oh[..., 0].sum() == 8 * w1, v
        assert oh[..., 1].sum() == 8 * w2, v
        assert oh[..., 2].sum() == 8 * (8 - w1 - w2), v
        # one-hot partition of the mask: each masked pixel in EXACTLY one
        assert np.array_equal(oh.sum(axis=-1), mask.astype(np.int64))


def test_cascade_remainder_and_mask_respected():
    img = _stripe_image(3, 2, 5, 10)
    mask = np.zeros((8, 8), bool)
    mask[:4] = True  # only the top half is in-boundary
    oh = sub_compartment_masks_numpy(img, mask, PARAMS)
    # nothing outside the boundary mask is ever assigned
    assert not oh[4:].any()
    assert np.array_equal(oh.sum(axis=-1), mask.astype(np.int64))
    # min_size filters a too-small nuclei stripe into the remainder
    oh2 = sub_compartment_masks_numpy(
        img,
        mask,
        [
            {"name": "nuclei", "threshold": 200, "min_size": 50},
            {"name": "eos", "threshold": 60, "min_size": 4},
            {"name": "luminal", "threshold": 255, "min_size": 0},
        ],
    )
    assert oh2[..., 0].sum() == 0
    # the dropped nuclei pixels land in the LAST compartment (remainder):
    # 3 nuclei cols + 3 luminal cols, top 4 rows = 24 px
    assert oh2[..., 2].sum() == 24


def test_compartment_distance_transform_closed_form():
    """Full-height stripe masks have axis-aligned exact EDT — the
    q_subcompartment oracle's dval = min(r+1, 8-r, c+1, w-c)."""
    from combinedfeatureextraction_spark.multimodal.rasterize import (
        distance_transform_numpy,
    )

    for w in (2, 3, 4):
        sel = np.zeros((8, 8), bool)
        sel[:, 2 : 2 + w] = True
        d = distance_transform_numpy(sel)[sel].reshape(8, w)
        want = np.array(
            [[min(r + 1, 8 - r, c + 1, w - c) for c in range(w)]
             for r in range(8)],
            dtype=float,
        )
        assert np.array_equal(d, want), w


def _brute_glcm_props(gray):
    """Dense 256x256 symmetric normed GLCM + graycoprops formulas —
    independent dual of the sparse implementation."""
    P = np.zeros((256, 256))
    a = gray.astype(np.int64)
    for r in range(a.shape[0]):
        for c in range(a.shape[1] - 1):
            P[a[r, c], a[r, c + 1]] += 1
            P[a[r, c + 1], a[r, c]] += 1
    P /= P.sum()
    ii, jj = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    contrast = (P * (ii - jj) ** 2).sum()
    homog = (P / (1.0 + (ii - jj) ** 2)).sum()
    energy = np.sqrt((P * P).sum())
    pi = P.sum(axis=1)
    mu = (np.arange(256) * pi).sum()
    var = ((np.arange(256) - mu) ** 2 * pi).sum()
    pij = (P * ii * jj).sum()
    corr = 1.0 if var == 0 else (pij - mu * mu) / var
    return contrast, homog, corr, energy


def test_glcm_props_matches_dense_bruteforce():
    from combinedfeatureextraction_spark.multimodal.subcompartment import (
        glcm_props_numpy,
    )

    rng = np.random.default_rng(41)
    cases = [rng.integers(0, 256, size=(6, 9)).astype(np.uint8)
             for _ in range(4)]
    # middle stripe (two boundaries) + flat image (degenerate corr)
    mid = np.zeros((8, 8), np.uint8)
    mid[:, 3:6] = 130
    cases += [mid, np.full((5, 5), 7, np.uint8)]
    for g in cases:
        got = glcm_props_numpy(g)
        want = _brute_glcm_props(g)
        assert np.allclose(got, want, atol=1e-12), (got, want)


def test_morphology_axis_and_edge_cases():
    from combinedfeatureextraction_spark.multimodal.subcompartment import (
        _axis_lengths,
        _edge_perimeter,
    )

    # 1-px-wide line: minor axis 0 (reference's aspect=0 convention is
    # applied by the operator; here just pin the axis math)
    rr, cc = np.nonzero(np.ones((6, 1), bool))
    maj, mi = _axis_lengths(rr.astype(float), cc.astype(float))
    assert mi == 0.0 and abs(maj - 4 * np.sqrt(35 / 12.0)) < 1e-12
    # full square: equal axes; edge perimeter 2(h+w)
    sq = np.ones((8, 8), bool)
    rr, cc = np.nonzero(sq)
    maj, mi = _axis_lengths(rr.astype(float), cc.astype(float))
    assert abs(maj - mi) < 1e-9
    assert _edge_perimeter(sq) == 32
    ring = np.ones((5, 5), bool)
    ring[2, 2] = False
    assert _edge_perimeter(ring) == 20 + 4  # outer + the hole


def test_morphology_multi_nucleus_aspects():
    """Two separated nuclei rectangles -> count 2, mean/std of the two
    closed-form aspects, mean nuclear area."""
    import math

    from combinedfeatureextraction_spark.multimodal.rasterize import (
        label_components_numpy,
    )
    from combinedfeatureextraction_spark.multimodal.subcompartment import (
        _axis_lengths,
    )

    m = np.zeros((10, 12), bool)
    m[1:7, 1:3] = True   # 6x2
    m[2:6, 8:11] = True  # 4x3
    labels, n = label_components_numpy(m, 8)
    assert n == 2
    aspects = []
    for k in (1, 2):
        rr, cc = np.nonzero(labels == k)
        maj, mi = _axis_lengths(rr.astype(float), cc.astype(float))
        aspects.append(maj / mi)
    a1 = math.sqrt((36 - 1) / (4 - 1))   # 6x2: (h^2-1)/(w^2-1)
    a2 = math.sqrt((16 - 1) / (9 - 1))   # 4x3
    assert np.allclose(sorted(aspects), sorted([a1, a2]))
