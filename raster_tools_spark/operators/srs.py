"""Planar spatial-reference transforms for vector layers (SURVEY.md
missing-item: the reference reprojects feature geometries between
spatial reference systems before extraction/rasterization --
extract.py:574-580 ``geometry.Transform(osr.CoordinateTransformation
(sr, self.sr))`` and postgis.py:108-117.  This environment has no
PROJ, and the engine fixes one planar world CRS by design
(grid.py:36-44), so the re-expression covers the planar family:
every CRS is an affine frame (local -> world), and a CRS-to-CRS
transform is the exact 2x2-inverse composition inv(dst) o src --
which is what a projected-to-projected coordinate transformation is
once both sides are planar.

The transform itself runs as ONE Arrow-batched pandas UDF over the
WKB column (every ring transformed vectorized in numpy, geometry
types preserved), so a 10^12-row layer reprojects embarrassingly
parallel with no shuffle at all -- the scan partitioning is the
execution partitioning.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import wkb as _wkb
from ..grid import get_inverse

#: affine frame (a, b, tx, c, d, ty): world_x = a*x + b*y + tx,
#: world_y = c*x + d*y + ty
Affine = Tuple[float, float, float, float, float, float]

#: the engine's canonical world frame (identity)
WORLD: Affine = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def compose(outer: Affine, inner: Affine) -> Affine:
    """outer o inner as an affine frame."""
    a1, b1, tx1, c1, d1, ty1 = outer
    a2, b2, tx2, c2, d2, ty2 = inner
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        a1 * tx2 + b1 * ty2 + tx1,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        c1 * tx2 + d1 * ty2 + ty1,
    )


def inverse(frame: Affine) -> Affine:
    """Exact affine inverse (2x2 inverse via grid.get_inverse, the
    reference's own matrix-inverse helper, utils.py:13-16)."""
    a, b, tx, c, d, ty = frame
    ia, ib, ic, id_ = get_inverse(a, b, c, d)
    return (ia, ib, -(ia * tx + ib * ty),
            ic, id_, -(ic * tx + id_ * ty))


def crs_transform(src: Affine, dst: Affine) -> Affine:
    """Coordinates in ``src`` frame -> coordinates in ``dst`` frame
    (the osr.CoordinateTransformation(sr, self.sr) analog)."""
    return compose(inverse(dst), src)


def _apply(arr: np.ndarray, t: Affine) -> np.ndarray:
    a, b, tx, c, d, ty = t
    out = np.empty_like(arr)
    out[:, 0] = a * arr[:, 0] + b * arr[:, 1] + tx
    out[:, 1] = c * arr[:, 0] + d * arr[:, 1] + ty
    return out


def transform_wkb(payload: bytes, t: Affine) -> bytes:
    """Transform every coordinate of one WKB geometry, preserving the
    geometry type (Point/LineString/Polygon/MultiPolygon)."""
    gtype, data = _wkb.parse(payload)
    if gtype == _wkb.POINT:
        x, y = data
        a, b, tx, c, d, ty = t
        return _wkb.point_wkb(a * x + b * y + tx, c * x + d * y + ty)
    if gtype == _wkb.LINESTRING:
        return _wkb.linestring_wkb(_apply(data, t))
    if gtype == _wkb.POLYGON:
        rings = [_apply(r, t) for r in data]
        return _wkb.polygon_wkb(rings[0], rings[1:])
    if gtype == _wkb.MULTIPOLYGON:
        return _wkb.multipolygon_wkb(
            [
                _wkb.polygon_wkb(
                    _apply(p[0], t), [_apply(r, t) for r in p[1:]]
                )
                for p in data
            ]
        )
    raise ValueError(f"unsupported geometry type {gtype}")


def transform_layer(
    layer: DataFrame,
    src: Affine,
    dst: Affine = WORLD,
    wkb_col: str = "geom_wkb",
) -> DataFrame:
    """Reproject a vector layer's WKB geometries from the ``src``
    planar frame into the ``dst`` frame (the _prepare_geometry step of
    the reference's extract pipeline).  One vectorized pandas UDF, no
    shuffle; all other columns pass through untouched."""
    t = crs_transform(src, dst)

    @F.pandas_udf("binary")
    def tf(col: pd.Series) -> pd.Series:
        return col.map(lambda b: transform_wkb(bytes(b), t))

    return layer.withColumn(wkb_col, tf(F.col(wkb_col)))
