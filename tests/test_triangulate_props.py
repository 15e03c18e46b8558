"""Hypothesis property tests for the Delaunay/linear-interpolation
kernel (functions/triangulate.py).  Triangulation-independent
invariants over random clouds:

- triangle count obeys Euler's bound and every triangle is
  non-degenerate with an empty circumcircle (the Delaunay condition);
- a planar z-field is reproduced exactly at triangle centroids;
- every interpolated value lies within [min z, max z] (barycentric
  convexity), and every data point reproduces its own value;
- nearest fallback returns an actual member value.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_tools_spark.functions.triangulate import (
    delaunay, griddata_linear_nearest, interp_linear,
)


def _cloud(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 100.0, (n, 2))


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(4, 120))
def test_delaunay_condition(seed, n):
    pts = _cloud(seed, n)
    tri = delaunay(pts)
    assert len(tri) >= 1
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    area2 = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    assert (np.abs(area2) > 1e-9).all()
    # empty-circumcircle spot check against every input point
    ab, ac = b - a, c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    ab2 = (ab ** 2).sum(1)
    ac2 = (ac ** 2).sum(1)
    ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / d
    uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / d
    cx, cy = a[:, 0] + ux, a[:, 1] + uy
    r2 = ux * ux + uy * uy
    dx = pts[:, 0][None, :] - cx[:, None]
    dy = pts[:, 1][None, :] - cy[:, None]
    inside = dx * dx + dy * dy < r2[:, None] * (1.0 - 1e-9)
    inside[np.arange(len(tri)), tri[:, 0]] = False
    inside[np.arange(len(tri)), tri[:, 1]] = False
    inside[np.arange(len(tri)), tri[:, 2]] = False
    assert not inside.any()


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 10_000), st.integers(5, 150),
    st.floats(-2, 2), st.floats(-2, 2), st.floats(-50, 50),
)
def test_planar_reproduction(seed, n, b, c, a):
    pts = _cloud(seed, n)
    z = a + b * pts[:, 0] + c * pts[:, 1]
    tri = delaunay(pts)
    cent = pts[tri].mean(axis=1)
    v = interp_linear(pts, z, cent[:, 0], cent[:, 1])
    expect = a + b * cent[:, 0] + c * cent[:, 1]
    scale = 1.0 + np.abs(expect)
    assert np.all(np.abs(v - expect) / scale < 1e-9)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(5, 150))
def test_convexity_and_exactness(seed, n):
    rng = np.random.default_rng(seed + 1)
    pts = _cloud(seed, n)
    z = rng.uniform(-7.0, 13.0, n)
    q = rng.uniform(-10.0, 110.0, (200, 2))
    v = interp_linear(pts, z, q[:, 0], q[:, 1])
    fin = np.isfinite(v)
    if fin.any():
        assert v[fin].min() >= z.min() - 1e-9
        assert v[fin].max() <= z.max() + 1e-9
    # data points reproduce themselves
    at = interp_linear(pts, z, pts[:, 0], pts[:, 1])
    assert np.allclose(at, z, atol=1e-9)
    # nearest fallback fills every query with a member value
    full = griddata_linear_nearest(pts, z, q[:, 0], q[:, 1])
    assert np.isfinite(full).all()
    assert np.isin(
        np.round(full[~fin], 12), np.round(z, 12)
    ).all()


def test_duplicate_points_guard():
    """XY duplicates are dropped keep-first before triangulation; a
    duplicated planar cloud still reproduces the plane."""
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 50, (60, 2))
    z = 2.0 + 0.5 * pts[:, 0] - 0.25 * pts[:, 1]
    dup_pts = np.vstack([pts, pts[:30]])
    dup_z = np.concatenate([z, z[:30] + 100.0])  # conflicting later z
    cent = pts[delaunay(pts)].mean(axis=1)  # strictly inside the hull
    v = griddata_linear_nearest(dup_pts, dup_z, cent[:, 0], cent[:, 1])
    expect = 2.0 + 0.5 * cent[:, 0] - 0.25 * cent[:, 1]
    assert np.allclose(v, expect, atol=1e-6)  # first z wins
