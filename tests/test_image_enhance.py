"""Golden numpy checks for the image-enhancement family (box blur,
histogram equalization, Otsu, RLE): the plane helpers against naive
reimplementations, and the Spark operators end-to-end on tiny PNG
tables."""
import numpy as np
import pandas as pd
import pytest

from raster_tools_spark import codecs
from raster_tools_spark.functions.image_enhance import (
    _box_blur_plane,
    _equalize_plane,
    _otsu_threshold,
    box_blur_images,
    box_blur_stats,
    equalize_stats,
    otsu_stats,
    rle_stats,
)


def _plane(seed, h=13, w=17):
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    v = (seed + 7 * ii + 13 * jj) % 251
    v[(ii + jj) % 17 == 0] = 255
    return v.astype(np.uint8)


def test_box_blur_matches_naive_window():
    px = _plane(5)
    r = 2
    got = _box_blur_plane(px, r)
    h, w = px.shape
    for i in range(h):
        for j in range(w):
            win = px[
                max(i - r, 0): min(i + r + 1, h),
                max(j - r, 0): min(j + r + 1, w),
            ].astype(np.int64)
            assert got[i, j] == win.sum() // win.size, (i, j)


def test_box_blur_constant_image_is_identity():
    px = np.full((9, 9), 42, dtype=np.uint8)
    assert (_box_blur_plane(px, 3) == 42).all()


def test_equalize_golden_and_range():
    px = _plane(9)
    eq = _equalize_plane(px)
    flat = px.ravel()
    n = flat.size
    cdf = {v: int((flat <= v).sum()) for v in np.unique(flat)}
    cdf_min = cdf[int(flat.min())]
    for v in np.unique(flat):
        exp = (cdf[int(v)] - cdf_min) * 255 // (n - cdf_min)
        assert (eq[px == v] == exp).all()
    assert eq.min() >= 0 and eq.max() <= 255
    # equalization preserves value ORDER (monotone LUT)
    order = np.argsort(flat, kind="stable")
    assert (np.diff(eq.ravel()[order]) >= 0).all()


def test_equalize_constant_image_is_zero():
    px = np.full((6, 7), 200, dtype=np.uint8)
    assert (_equalize_plane(px) == 0).all()


def test_otsu_bimodal_separates_modes():
    px = np.concatenate(
        [np.full(500, 30, np.uint8), np.full(500, 220, np.uint8)]
    ).reshape(25, 40)
    t = _otsu_threshold(px)
    assert 30 <= t < 220


def test_otsu_matches_exhaustive_float_scan():
    px = _plane(3)
    hist = np.bincount(px.ravel(), minlength=256).astype(np.int64)
    n, st = int(hist.sum()), int((hist * np.arange(256)).sum())
    best_t, best = 0, -1.0
    c0 = s0 = 0
    for t in range(255):
        c0 += int(hist[t]); s0 += int(hist[t]) * t
        c1 = n - c0
        if c0 == 0 or c1 == 0:
            continue
        num = s0 * c1 - (st - s0) * c0
        score = float(num * num) / float(c0 * c1)
        if score > best:
            best, best_t = score, t
    assert _otsu_threshold(px) == best_t


def test_contrast_stretch_golden():
    from raster_tools_spark.functions.image_enhance import (  # noqa: F401
        contrast_stretch_stats,
    )
    px = _plane(7).astype(np.int64)
    cdf = np.cumsum(np.bincount(px.ravel(), minlength=256))
    n = px.size
    p_lo = int(np.argmax(cdf * 100 >= 2 * n))
    p_hi = int(np.argmax(cdf * 100 >= 98 * n))
    st = (np.clip(px, p_lo, p_hi) - p_lo) * 255 // max(p_hi - p_lo, 1)
    assert st.min() == 0 and st.max() == 255
    # monotone remap: ordering preserved
    order = np.argsort(px.ravel(), kind="stable")
    assert (np.diff(st.ravel()[order]) >= 0).all()
    # constant image: den guard keeps output all-zero
    flat = np.full((5, 5), 99, np.int64)
    c2 = np.cumsum(np.bincount(flat.ravel(), minlength=256))
    lo = int(np.argmax(c2 * 100 >= 2 * 25))
    hi = int(np.argmax(c2 * 100 >= 98 * 25))
    assert lo == hi == 99
    assert ((np.clip(flat, lo, hi) - lo) * 255 // max(hi - lo, 1) == 0).all()


def test_sobel_flat_image_has_zero_energy():
    from raster_tools_spark.functions.image_enhance import sobel_stats  # noqa
    p = np.full((8, 8), 9, np.uint8)
    gx = (p[:-2, 2:].astype(np.int64) + 2 * p[1:-1, 2:] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2])
    assert (gx == 0).all()


def test_sobel_vertical_step_detected():
    p = np.zeros((10, 10), np.uint8)
    p[:, 5:] = 100
    pp = p.astype(np.int64)
    gx = (pp[:-2, 2:] + 2 * pp[1:-1, 2:] + pp[2:, 2:]
          - pp[:-2, :-2] - 2 * pp[1:-1, :-2] - pp[2:, :-2])
    gy = (pp[2:, :-2] + 2 * pp[2:, 1:-1] + pp[2:, 2:]
          - pp[:-2, :-2] - 2 * pp[:-2, 1:-1] - pp[:-2, 2:])
    mag = np.abs(gx) + np.abs(gy)
    # the step column responds at full kernel weight, rows are silent
    assert mag.max() == 400 and (np.abs(gy) == 0).all()


def test_quadtree_constant_image_is_one_leaf():
    from raster_tools_spark.functions.image_enhance import (
        _quadtree_leaf_counts,
    )
    per = _quadtree_leaf_counts(np.ones((64, 64), np.int64))
    assert per == [1, 0, 0, 0, 0, 0, 0]


def test_quadtree_leaves_tile_the_image_exactly():
    from raster_tools_spark.functions.image_enhance import (
        _quadtree_leaf_counts,
    )
    rng_plane = (_plane(3, 60, 62) >= 128).astype(np.int64)
    per = _quadtree_leaf_counts(rng_plane)
    # every pixel belongs to exactly one leaf: sum of leaf areas
    # equals the pixel count IF leaves were full blocks; with clamped
    # borders areas shrink, so check the weaker exact invariant on a
    # full 64x64 plane instead
    full = (_plane(5, 64, 64) >= 128).astype(np.int64)
    per_full = _quadtree_leaf_counts(full)
    # reconstruct area: level l full blocks are (64>>l)^2 px
    assert sum(c * (64 >> l) ** 2 for l, c in enumerate(per_full)) == 64 * 64
    assert sum(per) > 0


def test_quadtree_quadrant_structure():
    from raster_tools_spark.functions.image_enhance import (
        _quadtree_leaf_counts,
    )
    p = np.zeros((64, 64), np.int64)
    p[:32, :32] = 1          # one uniform quadrant differs
    per = _quadtree_leaf_counts(p)
    assert per == [0, 4, 0, 0, 0, 0, 0]


@pytest.mark.usefixtures("spark")
def test_spark_operators_end_to_end(spark):
    planes = {f"im_{k}": _plane(11 * k + 1, 12 + k, 15 - k)
              for k in range(3)}
    pdf = pd.DataFrame(
        [(iid, codecs.png_encode(p), "png") for iid, p in planes.items()],
        columns=["image_id", "bytes", "fmt"],
    )
    images = spark.createDataFrame(pdf)

    from raster_tools_spark.functions.image_enhance import (
        _quadtree_leaf_counts,
        quadtree_stats,
        sobel_stats,
    )

    sob = {r["image_id"]: r for r in sobel_stats(images).collect()}
    qt = {r["image_id"]: r for r in quadtree_stats(images).collect()}
    for iid, p in planes.items():
        pp = p.astype(np.int64)
        gx = (pp[:-2, 2:] + 2 * pp[1:-1, 2:] + pp[2:, 2:]
              - pp[:-2, :-2] - 2 * pp[1:-1, :-2] - pp[2:, :-2])
        gy = (pp[2:, :-2] + 2 * pp[2:, 1:-1] + pp[2:, 2:]
              - pp[:-2, :-2] - 2 * pp[:-2, 1:-1] - pp[:-2, 2:])
        mag = np.abs(gx) + np.abs(gy)
        assert sob[iid]["edge_sum"] == int(mag.sum())
        per = _quadtree_leaf_counts((p >= 128).astype(np.int64))
        assert qt[iid]["n_leaves"] == sum(per)
        assert qt[iid]["comp_x1000"] == 1000 * p.size // sum(per)

    blur = {r["image_id"]: r for r in box_blur_stats(images, 2).collect()}
    eq = {r["image_id"]: r for r in equalize_stats(images).collect()}
    ot = {r["image_id"]: r for r in otsu_stats(images).collect()}
    rle = {r["image_id"]: r for r in rle_stats(images).collect()}
    for iid, p in planes.items():
        b = _box_blur_plane(p, 2)
        assert blur[iid]["blur_sum"] == int(b.sum())
        assert blur[iid]["n_px"] == p.size
        e = _equalize_plane(p)
        assert eq[iid]["eq_sum"] == int(e.sum())
        assert eq[iid]["n_levels"] == int(np.unique(e).size)
        t = _otsu_threshold(p)
        assert ot[iid]["otsu_t"] == t
        assert ot[iid]["n_fg"] == int((p > t).sum())
        breaks = np.ones(p.shape, bool)
        breaks[:, 1:] = p[:, 1:] != p[:, :-1]
        assert rle[iid]["n_runs"] == int(breaks.sum())
        assert rle[iid]["rle_bytes"] == 3 * int(breaks.sum())

    from raster_tools_spark.functions.image_enhance import (
        match_histograms,
        morph_gradient_stats,
    )
    from numpy.lib.stride_tricks import sliding_window_view

    mg = {r["image_id"]: r
          for r in morph_gradient_stats(images, 1).collect()}
    for iid, p in planes.items():
        pp = p.astype(np.int64)
        pmax = np.pad(pp, 1, constant_values=-1)
        pmin = np.pad(pp, 1, constant_values=1 << 20)
        grad = (sliding_window_view(pmax, (3, 3)).max((2, 3))
                - sliding_window_view(pmin, (3, 3)).min((2, 3)))
        assert mg[iid]["grad_sum"] == int(grad.sum())
        assert mg[iid]["n_flat"] == int((grad == 0).sum())

    # histogram matching: pair each image with itself -> identity map
    # (matched plane == original) is the exact-math litmus
    self_paired = spark.createDataFrame(
        pd.DataFrame(
            [(iid, codecs.png_encode(p), "png",
              codecs.png_encode(p), "png")
             for iid, p in planes.items()],
            columns=["image_id", "bytes", "fmt", "ref_bytes", "ref_fmt"],
        )
    )
    hm = {r["image_id"]: r
          for r in match_histograms(self_paired).collect()}
    for iid, p in planes.items():
        assert hm[iid]["m_sum"] == int(p.astype(np.int64).sum())
        assert hm[iid]["m_min"] == int(p.min())
        assert hm[iid]["m_max"] == int(p.max())

    # payload-emitting blur round-trips through the PNG codec
    out = {r["image_id"]: r for r in box_blur_images(images, 2).collect()}
    for iid, p in planes.items():
        dec = codecs.png_decode(bytes(out[iid]["bytes"]))
        assert (dec == _box_blur_plane(p, 2).astype(np.uint8)).all()
