"""Curvilinear SRS transforms (operators/srs.py): the geographic <->
projected family the reference reaches through osr
(extract.py:574-580), re-expressed from the published closed forms
(EPSG:3857 spherical Mercator; Krueger-series ellipsoidal transverse
Mercator, Karney 2011).  Hardness comes from three independent angles:
nanometer round-trips, agreement with a DIFFERENT published series
(Snyder's), and the WKB polygon path through the Spark UDF.
"""
import numpy as np
import pytest

from raster_tools_spark import wkb
from raster_tools_spark.operators import srs


def test_webmerc_roundtrip_and_anchors():
    lon = np.array([-179.9, -3.2, 0.0, 5.71, 120.4])
    lat = np.array([-84.9, 12.3, 0.0, 52.1, 84.9])
    x, y = srs.webmerc_forward(lon, lat)
    lon2, lat2 = srs.webmerc_inverse(x, y)
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-12)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-12)
    # EPSG:3857 anchor: lon=180 maps to a*pi; equator maps to y=0
    x180, y0 = srs.webmerc_forward(np.array([180.0]), np.array([0.0]))
    assert abs(x180[0] - srs.WGS84_A * np.pi) < 1e-6
    assert abs(y0[0]) < 1e-9


def test_tm_roundtrip_nanometer():
    rng = np.random.default_rng(7)
    lon = 0.1 + rng.random(500) * 5.8       # zone 31 extent
    lat = -75.0 + rng.random(500) * 150.0
    e, n = srs.tm_forward(lon, lat)
    lon2, lat2 = srs.tm_inverse(e, n)
    # 1e-9 deg ~ 0.1 mm; the Krueger pair is far better than that
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-9)


def _snyder_tm(lon, lat, lon0=3.0, k0=0.9996,
               a=6378137.0, f=1 / 298.257223563):
    """Independent check implementation: Snyder, 'Map Projections --
    A Working Manual' (USGS PP 1395), eq. 8-9..8-13 -- a DIFFERENT
    truncated series from the engine's Krueger alphas."""
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = lam * np.cos(phi)
    M = a * (
        (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
        * np.sin(2 * phi)
        + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * np.sin(4 * phi)
        - (35 * e2 ** 3 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (A + (1 - T + C) * A ** 3 / 6
                  + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2)
                  * A ** 5 / 120)
    y = k0 * (M + N * np.tan(phi) * (
        A ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * A ** 4 / 24
        + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2) * A ** 6 / 720
    ))
    return 500000 + x, y


def test_tm_agrees_with_independent_snyder_series():
    rng = np.random.default_rng(11)
    lon = 0.3 + rng.random(200) * 5.4
    lat = 1.0 + rng.random(200) * 59.0
    e1, n1 = srs.tm_forward(lon, lat)
    e2, n2 = _snyder_tm(lon, lat)
    # Snyder's own truncation is the bound here (~mm within a zone)
    assert np.abs(e1 - e2).max() < 2e-3
    assert np.abs(n1 - n2).max() < 2e-3


def test_curvilinear_layer_polygon_path(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [(i, wkb.box_wkb(-10.0 + i, 5.0, -9.0 + i, 6.5))
            for i in range(8)]
    layer = spark.createDataFrame(rows, "feat_id long, geom_wkb binary")
    out = srs.transform_layer_curvilinear(layer, "geodetic->webmerc")
    got = {
        r["feat_id"]: wkb.envelope(bytes(r["geom_wkb"]))
        for r in out.collect()
    }
    for i in range(8):
        ex, _ = srs.webmerc_forward(
            np.array([-10.0 + i, -9.0 + i]), np.array([5.0, 5.0]))
        _, ey = srs.webmerc_forward(
            np.array([0.0, 0.0]), np.array([5.0, 6.5]))
        minx, maxx, miny, maxy = got[i]
        assert abs(minx - ex[0]) < 1e-9 and abs(maxx - ex[1]) < 1e-9
        assert abs(miny - ey[0]) < 1e-9 and abs(maxy - ey[1]) < 1e-9
