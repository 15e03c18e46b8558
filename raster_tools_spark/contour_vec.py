"""Footprint contour vectorization (reference contour.py): the data
mask, holes filled, polygonized at the 0.5 level between pixel centers
(GDAL ContourGenerateEx POLYGONIZE semantics).

Implementation: classic MARCHING SQUARES over the binary mask (level
0.5 means every crossing sits at the midpoint between adjacent pixel
centers), with the mask zero-padded one pixel so every contour closes,
then segment chaining into rings.  Pure numpy + dict chaining; the
Spark face in operators/contour_op.py runs it per tile (the
reference's own unit: one raster per invocation).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .fillnodata import fill_holes

# marching-squares segment table: case index is the 4-bit code
# (a<<3 | b<<2 | c<<1 | d) for corners a=(i,j) b=(i,j+1) c=(i+1,j+1)
# d=(i+1,j); entries connect edge midpoints T(op) R(ight) B(ottom)
# L(eft).  Saddles (5, 10) resolve to the standard two-segment split.
_T, _R, _B, _L = 0, 1, 2, 3
_SEGMENTS = {
    1: [(_L, _B)],
    2: [(_B, _R)],
    3: [(_L, _R)],
    4: [(_T, _R)],
    5: [(_L, _T), (_B, _R)],
    6: [(_T, _B)],
    7: [(_L, _T)],
    8: [(_T, _L)],
    9: [(_T, _B)],
    10: [(_T, _R), (_B, _L)],
    11: [(_T, _R)],
    12: [(_R, _L)],
    13: [(_R, _B)],
    14: [(_B, _L)],
}


def _edge_point(i: int, j: int, edge: int) -> Tuple[int, int]:
    """Midpoint of a cell edge in DOUBLED pixel coordinates (so every
    vertex is an exact integer key): cell corners are pixel centers
    (i, j)..(i+1, j+1)."""
    if edge == _T:
        return (2 * i, 2 * j + 1)
    if edge == _R:
        return (2 * i + 1, 2 * j + 2)
    if edge == _B:
        return (2 * i + 2, 2 * j + 1)
    return (2 * i + 1, 2 * j)


def mask_contours(
    mask: np.ndarray, fill: bool = True
) -> List[np.ndarray]:
    """Closed contour rings of the binary mask as (n, 2) arrays of
    PIXEL coordinates (row, col; pixel centers are integer positions,
    ring vertices sit on half-integers).

    ``fill=True`` (the footprint-contour semantics of contour.py:49)
    fills interior holes first; pass False to ALSO trace hole rings
    (overlay difference needs them -- a subtracted region strictly
    inside a feature must survive as an interior ring)."""
    m = np.asarray(mask, dtype=bool)
    if fill:
        m = fill_holes(m)
    p = np.pad(m, 1).astype(np.uint8)
    a = p[:-1, :-1]
    b = p[:-1, 1:]
    c = p[1:, 1:]
    d = p[1:, :-1]
    case = (a << 3) | (b << 2) | (c << 1) | d
    cells = np.nonzero((case > 0) & (case < 15))
    # adjacency of doubled-coordinate midpoints
    nxt: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for i, j in zip(*cells):
        for e1, e2 in _SEGMENTS[int(case[i, j])]:
            p1 = _edge_point(int(i), int(j), e1)
            p2 = _edge_point(int(i), int(j), e2)
            nxt.setdefault(p1, []).append(p2)
            nxt.setdefault(p2, []).append(p1)
    rings: List[np.ndarray] = []
    visited = set()
    for start in sorted(nxt):
        if start in visited:
            continue
        ring = [start]
        visited.add(start)
        cur = start
        prev = None
        while True:
            candidates = [
                q for q in nxt[cur] if q != prev and q not in visited
            ]
            if not candidates:
                break
            prev, cur = cur, candidates[0]
            ring.append(cur)
            visited.add(cur)
        arr = np.array(ring + [start], dtype=np.float64)
        # doubled padded coords -> pixel coords of the original mask
        arr = arr / 2.0 - 1.0
        if len(arr) >= 4:
            rings.append(arr)
    return rings
