"""Planar CRS transforms: exact composition/inverse, every WKB
geometry branch, and bit-exact round trips on dyadic frames."""

import numpy as np

from raster_tools_spark import wkb
from raster_tools_spark.operators import srs

ROT = (0.0, -2.0, 1000.0, 2.0, 0.0, 500.0)
SHRUNK = (0.5, 0.0, 10.0, 0.0, 0.5, 20.0)


def test_inverse_and_compose_are_exact():
    t = srs.crs_transform(ROT, SHRUNK)
    back = srs.crs_transform(SHRUNK, ROT)
    ident = srs.compose(back, t)
    assert np.allclose(ident, srs.WORLD, atol=0, rtol=0)


def test_every_geometry_branch_round_trips():
    t = srs.crs_transform(ROT, SHRUNK)
    back = srs.crs_transform(SHRUNK, ROT)
    geoms = [
        wkb.point_wkb(3.0, -4.5),
        wkb.linestring_wkb([(0.0, 0.0), (1.5, 2.0), (-3.0, 0.25)]),
        wkb.polygon_wkb(
            [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0)],
            holes=[[(2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0)]],
        ),
        wkb.multipolygon_wkb([
            wkb.box_wkb(0.0, 0.0, 2.0, 2.0),
            wkb.box_wkb(5.0, 5.0, 7.5, 6.0),
        ]),
    ]
    for g in geoms:
        fwd = srs.transform_wkb(g, t)
        assert fwd != g
        rt = srs.transform_wkb(fwd, back)
        # dyadic frames: the round trip is bit-exact
        assert rt == g


def test_world_coordinates_match_by_hand():
    # src (x, y) -> world (-2y + 1000, 2x + 500)
    g = srs.transform_wkb(wkb.point_wkb(3.0, 7.0), srs.crs_transform(ROT, srs.WORLD))
    gtype, (x, y) = wkb.parse(g)
    assert (x, y) == (-14.0 + 1000.0, 6.0 + 500.0)


def test_layer_transform_is_shuffle_free(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"feat_id": [0, 1],
         "geom_wkb": [wkb.box_wkb(0, 0, 4, 4), wkb.point_wkb(1, 1)]}
    )
    layer = spark.createDataFrame(pdf)
    out = srs.transform_layer(layer, src=ROT)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r.feat_id: bytes(r.geom_wkb) for r in out.collect()}
    assert wkb.parse(rows[1])[1] == (998.0, 502.0)
