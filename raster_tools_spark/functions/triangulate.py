"""Delaunay triangulation + piecewise-linear ("griddata linear")
interpolation in pure numpy (SURVEY.md 2.7 interpolation family; the
reference interpolates per feature with scipy griddata at
roof.py:73-77, zvp2tif.py:66-77 -- scipy is not in this container).

Algorithm: Bowyer-Watson incremental insertion with a super-triangle,
deterministic insertion order (input order), and float64 in-circle
determinants.  The evaluation step assigns each query point to the
triangle with the largest minimum barycentric weight; queries whose
best weight is below ``-eps`` are outside the convex hull and return
NaN (callers fall back to nearest, as griddata's nearest method does).

The planar-reproduction property -- ANY valid triangulation of points
sampled from z = a + b*x + c*y reproduces the plane everywhere inside
the hull -- makes the interpolator oracle-checkable without fixing the
triangulation itself (see queries.grid_linear).

Per-feature use (the reference's own shape: one griddata call per
building footprint) keeps each triangulation local to one Spark task;
the distributed axis is the feature set, not the point cloud.
"""

from __future__ import annotations

import numpy as np


def _circumcircle(pts, tri):
    """Centers (m,2) and squared radii (m,) of triangle circumcircles."""
    a = pts[tri[:, 0]]
    b = pts[tri[:, 1]]
    c = pts[tri[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    # degenerate triangles get an empty circle (never broken by inserts)
    safe = np.where(d == 0.0, 1.0, d)
    ab2 = ab[:, 0] ** 2 + ab[:, 1] ** 2
    ac2 = ac[:, 0] ** 2 + ac[:, 1] ** 2
    ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / safe
    uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / safe
    cx = a[:, 0] + ux
    cy = a[:, 1] + uy
    r2 = np.where(d == 0.0, -1.0, ux * ux + uy * uy)
    return cx, cy, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n, 2) float64 -> (m, 3) int32 triangle vertex indices.

    Bowyer-Watson with a super-triangle; O(n * active-triangles), fine
    for the per-feature clouds (<= a few thousand points) this engine
    triangulates.  Duplicate points must be removed by the caller.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int32)

    # super-triangle comfortably containing everything
    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    span = float(max(mx[0] - mn[0], mx[1] - mn[1], 1.0))
    midx, midy = float((mn[0] + mx[0]) / 2), float((mn[1] + mx[1]) / 2)
    sup = np.array(
        [
            [midx - 20.0 * span, midy - 10.0 * span],
            [midx + 20.0 * span, midy - 10.0 * span],
            [midx, midy + 20.0 * span],
        ]
    )
    allp = np.vstack([pts, sup])
    tris = [(n, n + 1, n + 2)]

    for i in range(n):
        px, py = allp[i]
        t_arr = np.asarray(tris, dtype=np.int64)
        cx, cy, r2 = _circumcircle(allp, t_arr)
        dx = px - cx
        dy = py - cy
        bad = dx * dx + dy * dy <= r2
        if not bad.any():
            continue
        # boundary of the star-shaped cavity: edges appearing once
        edges: dict = {}
        for ti in np.nonzero(bad)[0]:
            a, b, c = tris[ti]
            for e in ((a, b), (b, c), (c, a)):
                key = (e[0], e[1]) if e[0] < e[1] else (e[1], e[0])
                if key in edges:
                    del edges[key]
                else:
                    edges[key] = e  # keep orientation of first sight
        tris = [t for ti, t in enumerate(tris) if not bad[ti]]
        for e in edges.values():
            tris.append((e[0], e[1], i))

    out = [t for t in tris if max(t) < n]
    return np.asarray(out, dtype=np.int32).reshape(-1, 3)


def interp_linear(
    points: np.ndarray,
    z: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    eps: float = 1e-9,
    chunk: int = 4096,
) -> np.ndarray:
    """Piecewise-linear interpolation of z at (qx, qy); NaN outside the
    convex hull.  Each query uses the triangle with the largest minimum
    barycentric weight, so points on shared edges are well-defined (the
    linear value agrees from both sides)."""
    pts = np.asarray(points, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    qx = np.asarray(qx, dtype=np.float64).ravel()
    qy = np.asarray(qy, dtype=np.float64).ravel()
    out = np.full(qx.size, np.nan)
    tri = delaunay(pts)
    if len(tri) == 0:
        return out

    a = pts[tri[:, 0]]
    b = pts[tri[:, 1]]
    c = pts[tri[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
        c[:, 0] - b[:, 0]
    ) * (a[:, 1] - c[:, 1])
    ok = det != 0.0
    safe = np.where(ok, det, 1.0)

    for s in range(0, qx.size, chunk):
        e = min(s + chunk, qx.size)
        dqx = qx[s:e, None] - c[None, :, 0]
        dqy = qy[s:e, None] - c[None, :, 1]
        w1 = (
            (b[None, :, 1] - c[None, :, 1]) * dqx
            + (c[None, :, 0] - b[None, :, 0]) * dqy
        ) / safe
        w2 = (
            (c[None, :, 1] - a[None, :, 1]) * dqx
            + (a[None, :, 0] - c[None, :, 0]) * dqy
        ) / safe
        w3 = 1.0 - w1 - w2
        minw = np.minimum(np.minimum(w1, w2), w3)
        minw[:, ~ok] = -np.inf
        best = np.argmax(minw, axis=1)
        rows = np.arange(e - s)
        good = minw[rows, best] >= -eps
        bt = tri[best[good]]
        out[s:e][good] = (
            w1[rows[good], best[good]] * z[bt[:, 0]]
            + w2[rows[good], best[good]] * z[bt[:, 1]]
            + w3[rows[good], best[good]] * z[bt[:, 2]]
        )
    return out


def nearest_values(
    points: np.ndarray,
    z: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    chunk: int = 2048,
) -> np.ndarray:
    """Nearest-point value per query; distance ties break to the LOWEST
    point index (deterministic, mirrored by the SQL oracle)."""
    pts = np.asarray(points, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    qx = np.asarray(qx, dtype=np.float64).ravel()
    qy = np.asarray(qy, dtype=np.float64).ravel()
    out = np.empty(qx.size)
    for s in range(0, qx.size, chunk):
        e = min(s + chunk, qx.size)
        dx = qx[s:e, None] - pts[None, :, 0]
        dy = qy[s:e, None] - pts[None, :, 1]
        d2 = dx * dx + dy * dy
        # argmin returns the FIRST minimum -> lowest index on ties
        out[s:e] = z[np.argmin(d2, axis=1)]
    return out


def griddata_linear_nearest(
    points: np.ndarray,
    z: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
) -> np.ndarray:
    """The reference's rasterize combo (roof.py:73-77): linear where
    defined, nearest outside the hull."""
    lin = interp_linear(points, z, qx, qy)
    nan = np.isnan(lin)
    if nan.any():
        lin[nan] = nearest_values(points, z, qx[nan], qy[nan])
    return lin
