"""Properties of the pure-JVM vertex-table geometry operators:
one-pass Visvalingam keeps endpoints and drops exactly the
below-threshold interior vertices; shoelace centroids match closed
forms (rectangle center, triangle vertex mean) and the plan contains
no Python evaluation."""
import numpy as np
import pandas as pd
import pytest

from raster_tools_spark.operators.simplify import centroids, simplify_vw


def _verts_df(spark, pts, line_id=0):
    pdf = pd.DataFrame(
        [(line_id, s, int(x), int(y)) for s, (x, y) in enumerate(pts)],
        columns=["line_id", "seq", "x", "y"],
    )
    return spark.createDataFrame(pdf)


def test_vw_keeps_endpoints_and_drops_small_areas(spark):
    # zigzag: interior vertex k deviates with doubled-area 2*10*amp
    pts = [(0, 0), (10, 3), (20, 0), (30, 50), (40, 0), (50, 1), (60, 0)]
    out = simplify_vw(_verts_df(spark, pts), threshold2=200).collect()
    kept = [(r["x"], r["y"]) for r in sorted(out, key=lambda r: r["new_seq"])]
    # endpoints always survive
    assert kept[0] == (0, 0) and kept[-1] == (60, 0)
    # the big spike (area2 = |..| >= 200) survives, tiny wiggles drop
    assert (30, 50) in kept
    assert (50, 1) not in kept and (10, 3) not in kept
    # new_seq is dense from 0
    assert [r["new_seq"] for r in sorted(out, key=lambda r: r["new_seq"])] \
        == list(range(len(kept)))


def test_vw_threshold_zero_keeps_everything(spark):
    pts = [(i * 7, (i * i) % 13) for i in range(9)]
    out = simplify_vw(_verts_df(spark, pts), threshold2=0).collect()
    assert len(out) == 9


def test_vw_multiline_independence(spark):
    pdf = pd.concat(
        [
            pd.DataFrame(
                [(lid, s, s * 10, (s % 2) * (3 + lid * 40))
                 for s in range(5)],
                columns=["line_id", "seq", "x", "y"],
            )
            for lid in range(2)
        ]
    )
    out = simplify_vw(spark.createDataFrame(pdf), threshold2=150)
    counts = {r["line_id"]: r["n"] for r in
              out.groupBy("line_id").count().withColumnRenamed(
                  "count", "n").collect()}
    # line 0 amplitude 3 -> area2 = 2*10*2*3 = 120 < 150: interior drops
    # line 1 amplitude 43 -> area2 >= 150: all five survive
    assert counts[0] == 2 and counts[1] == 5


def _ring_df(spark, feat_rings):
    rows = []
    for fid, ring in feat_rings.items():
        for s, (x, y) in enumerate(ring):
            rows.append((fid, s, int(x), int(y)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["feat_id", "seq", "x", "y"])
    )


def test_centroid_rectangle_and_triangle(spark):
    rings = {
        0: [(2, 3), (12, 3), (12, 9), (2, 9)],          # rect, CCW
        1: [(0, 0), (6, 0), (0, 6)],                     # right triangle
        2: [(2, 9), (12, 9), (12, 3), (2, 3)],           # rect, CW
    }
    got = {r["feat_id"]: r for r in centroids(_ring_df(spark, rings)).collect()}
    assert got[0]["area"] == pytest.approx(60.0)
    assert (got[0]["cx"], got[0]["cy"]) == (pytest.approx(7.0),
                                            pytest.approx(6.0))
    assert got[1]["area"] == pytest.approx(18.0)
    assert got[1]["cx"] == pytest.approx(2.0)
    assert got[1]["cy"] == pytest.approx(2.0)
    # CW ring: negative signed area, same centroid
    assert got[2]["area"] == pytest.approx(-60.0)
    assert (got[2]["cx"], got[2]["cy"]) == (pytest.approx(7.0),
                                            pytest.approx(6.0))


def test_centroid_l_shape_against_numpy_decomposition(spark):
    # L = big rect minus notch; centroid by exact area-weighted split
    a, b, c, d = 40, 8, 16, 48
    ring = [(0, 0), (a, 0), (a, b), (c, b), (c, d), (0, d)]
    got = centroids(_ring_df(spark, {7: ring})).collect()[0]
    area_l = c * d + (a - c) * b
    cx = (c * d * (c / 2) + (a - c) * b * ((a + c) / 2)) / area_l
    cy = (c * d * (d / 2) + (a - c) * b * (b / 2)) / area_l
    assert got["area"] == pytest.approx(area_l)
    assert got["cx"] == pytest.approx(cx)
    assert got["cy"] == pytest.approx(cy)


def test_plans_are_pure_jvm(spark):
    df = _verts_df(spark, [(0, 0), (5, 5), (10, 0)])
    for plan_df in (simplify_vw(df, 10), centroids(
            df.withColumnRenamed("line_id", "feat_id"))):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapsInPandas" not in plan
