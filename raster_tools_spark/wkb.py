"""Minimal pure-numpy WKB codec (no shapely/GDAL in this environment).

Supports the geometry types the reference actually consumes: Point,
LineString, Polygon, MultiPolygon (2-D, little-endian) -- OGR WKB is the
reference's wire format everywhere (SURVEY.md section 1.2); the fast
numpy WKB construction mirrors raster_tools/vectors.py:161-196.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOLYGON = 6

_LE = b"\x01"


def point_wkb(x: float, y: float) -> bytes:
    return _LE + struct.pack("<Idd", POINT, x, y)


def linestring_wkb(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return _LE + struct.pack("<II", LINESTRING, len(arr)) + arr.tobytes()


def polygon_wkb(exterior, holes=()) -> bytes:
    """exterior / holes: sequences of (x, y); ring closure appended if
    missing (OGR closes rings)."""
    rings = [exterior] + list(holes)
    out = [_LE, struct.pack("<II", POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8")
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def box_wkb(x1: float, y1: float, x2: float, y2: float) -> bytes:
    """Axis-aligned rectangle polygon (counter-clockwise)."""
    return polygon_wkb([(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)])


def multipolygon_wkb(polygons: List[bytes]) -> bytes:
    return (
        _LE
        + struct.pack("<II", MULTIPOLYGON, len(polygons))
        + b"".join(polygons)
    )


def _parse_rings(buf: memoryview, off: int):
    (n_rings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=n_pts * 2, offset=off)
        rings.append(arr.reshape(n_pts, 2).astype(np.float64))
        off += n_pts * 16
    return rings, off


def parse(wkb: bytes):
    """Parse WKB -> (geom_type, payload).

    Point -> (x, y); LineString -> ndarray (n, 2);
    Polygon -> [ring ndarray, ...] (exterior first);
    MultiPolygon -> [[rings], [rings], ...].
    """
    buf = memoryview(wkb)
    byte_order = buf[0]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", buf, 1)
    gtype = gtype & 0xFF  # strip Z/M/SRID flags
    off = 5
    if gtype == POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return POINT, (x, y)
    if gtype == LINESTRING:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=n * 2, offset=off)
        return LINESTRING, arr.reshape(n, 2).astype(np.float64)
    if gtype == POLYGON:
        rings, _ = _parse_rings(buf, off)
        return POLYGON, rings
    if gtype == MULTIPOLYGON:
        (n_poly,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(n_poly):
            # each sub-polygon repeats the byte-order + type header
            (sub_t,) = struct.unpack_from("<I", buf, off + 1)
            if sub_t & 0xFF != POLYGON:
                raise ValueError("multipolygon member is not a polygon")
            rings, off2 = _parse_rings(buf, off + 5)
            polys.append(rings)
            off = off2
        return MULTIPOLYGON, polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def envelope(wkb: bytes) -> Tuple[float, float, float, float]:
    """(x1, x2, y1, y2) envelope, OGR GetEnvelope ordering
    (minx, maxx, miny, maxy)."""
    gtype, payload = parse(wkb)
    if gtype == POINT:
        x, y = payload
        return x, x, y, y
    if gtype == LINESTRING:
        xs, ys = payload[:, 0], payload[:, 1]
        return xs.min(), xs.max(), ys.min(), ys.max()
    if gtype == POLYGON:
        ext = payload[0]
        xs, ys = ext[:, 0], ext[:, 1]
        return xs.min(), xs.max(), ys.min(), ys.max()
    if gtype == MULTIPOLYGON:
        envs = np.array(
            [
                (
                    p[0][:, 0].min(),
                    p[0][:, 0].max(),
                    p[0][:, 1].min(),
                    p[0][:, 1].max(),
                )
                for p in payload
            ]
        )
        return (
            envs[:, 0].min(),
            envs[:, 1].max(),
            envs[:, 2].min(),
            envs[:, 3].max(),
        )
    raise ValueError(f"unsupported geometry type {gtype}")
