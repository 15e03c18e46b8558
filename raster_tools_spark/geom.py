"""Vectorized planar geometry predicates (pure numpy; no shapely/GDAL).

Provides the exact-refinement half of the two-phase spatial join
(SURVEY.md J1/J2) and polygon->pixel-mask rasterization with GDAL
``RasterizeLayer`` center-inside semantics (zonal.py:80-87,
groups.py:115-135 in the reference burn a mask and select pixels whose
*centers* fall inside the geometry).

Containment convention (documented, deterministic): even-odd ray cast,
half-open so that for an axis-aligned rectangle a point is inside iff
``xmin <= x < xmax AND ymin <= y < ymax``.  Synthetic data places points
off polygon boundaries so the convention never decides a test case, but
it guarantees bit-identical results across partitionings (north rule).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from . import wkb as _wkb
from .grid import GeoTransform, CELL_SIZE


def _rings_of(wkb_bytes: bytes) -> List[np.ndarray]:
    """All rings of a polygon/multipolygon as a flat list (even-odd
    parity over the union of rings)."""
    gtype, payload = _wkb.parse(wkb_bytes)
    if gtype == _wkb.POLYGON:
        return payload
    if gtype == _wkb.MULTIPOLYGON:
        return [ring for poly in payload for ring in poly]
    raise ValueError("containment requires polygon or multipolygon")


def _edges_of_rings(rings: Sequence[np.ndarray]):
    """Stack ring edges into (x1, y1, x2, y2) arrays."""
    xs1, ys1, xs2, ys2 = [], [], [], []
    for ring in rings:
        xs1.append(ring[:-1, 0])
        ys1.append(ring[:-1, 1])
        xs2.append(ring[1:, 0])
        ys2.append(ring[1:, 1])
    return (
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def points_in_rings(px, py, rings, chunk=262144):
    """Even-odd PIP for arrays of points against a ring set.

    Returns a boolean array aligned with ``px``/``py``.  Vectorized over
    points x edges, chunked to bound memory.
    """
    px = np.asarray(px, dtype=np.float64).ravel()
    py = np.asarray(py, dtype=np.float64).ravel()
    x1, y1, x2, y2 = _edges_of_rings(rings)
    n_edges = x1.size
    if n_edges == 0:
        return np.zeros(px.shape, dtype=bool)

    out = np.zeros(px.size, dtype=bool)
    step = max(chunk // max(n_edges, 1), 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        for s in range(0, px.size, step):
            e = min(s + step, px.size)
            pyc = py[s:e, None]
            pxc = px[s:e, None]
            straddle = (y1[None, :] > pyc) != (y2[None, :] > pyc)
            xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
            cross = straddle & (pxc < xint)
            out[s:e] = (cross.sum(axis=1) & 1).astype(bool)
    return out


def points_in_wkb(px, py, wkb_bytes: bytes):
    """PIP of point arrays against a WKB polygon/multipolygon."""
    return points_in_rings(px, py, _rings_of(wkb_bytes))


def rasterize_mask(wkb_bytes: bytes, gt: GeoTransform, height: int, width: int):
    """Burn a polygon onto a ``height x width`` pixel grid.

    True where the *pixel center* is inside -- the reference's
    ``gdal.RasterizeLayer(..., burn_values=[1])`` default semantics
    (zonal.py:80-87).  ``gt`` anchors pixel (0, 0)'s outer corner.
    """
    p, a, b, q, c, d = gt
    jj, ii = np.meshgrid(
        np.arange(width, dtype=np.float64) + 0.5,
        np.arange(height, dtype=np.float64) + 0.5,
    )
    xs = p + a * jj + b * ii
    ys = q + c * jj + d * ii
    inside = points_in_wkb(xs.ravel(), ys.ravel(), wkb_bytes)
    return inside.reshape(height, width)


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of one ring."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(wkb_bytes: bytes) -> float:
    """Even-odd area of polygon/multipolygon: interior rings subtract
    regardless of their winding orientation."""
    gtype, payload = _wkb.parse(wkb_bytes)
    polys = [payload] if gtype == _wkb.POLYGON else payload
    total = 0.0
    for rings in polys:
        total += abs(ring_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area(hole))
    return total


def envelope(wkb_bytes: bytes):
    """(x1, x2, y1, y2) of any supported WKB geometry."""
    return _wkb.envelope(wkb_bytes)
