"""Footprint contour: hole filling + marching squares + Spark face."""

import numpy as np
import pandas as pd

from raster_tools_spark import codecs, contour_vec, wkb
from raster_tools_spark.fillnodata import fill_holes
from raster_tools_spark.grid import CELL_SIZE, pack_cell


class TestFillHoles:
    def test_hole_filled_pocket_kept_open(self):
        m = np.zeros((9, 9), dtype=bool)
        m[2:7, 2:7] = True
        m[4, 4] = False  # interior hole
        m[2, 4] = False  # pocket open to the outside via... no: edge
        out = fill_holes(m)
        assert out[4, 4]           # hole filled
        assert not out[0, 0]       # outside untouched
        # a notch connected to the border background stays open
        m2 = np.zeros((9, 9), dtype=bool)
        m2[2:7, 2:7] = True
        m2[0:4, 4] = ~m2[0:4, 4] * False  # carve a channel
        m2[0, 4] = m2[1, 4] = False
        m2[2, 4] = m2[3, 4] = False
        out2 = fill_holes(m2)
        assert not out2[3, 4]

    def test_matches_flood_oracle(self):
        rng = np.random.default_rng(3)
        m = rng.random((20, 25)) < 0.55
        out = fill_holes(m)
        # oracle: BFS background flood from the border
        from collections import deque

        h, w = m.shape
        outside = np.zeros_like(m)
        dq = deque()
        for i in range(h):
            for j in (0, w - 1):
                if not m[i, j] and not outside[i, j]:
                    outside[i, j] = True
                    dq.append((i, j))
        for j in range(w):
            for i in (0, h - 1):
                if not m[i, j] and not outside[i, j]:
                    outside[i, j] = True
                    dq.append((i, j))
        while dq:
            i, j = dq.popleft()
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ni, nj = i + di, j + dj
                if (
                    0 <= ni < h and 0 <= nj < w
                    and not m[ni, nj] and not outside[ni, nj]
                ):
                    outside[ni, nj] = True
                    dq.append((ni, nj))
        expected = m | ~outside & ~m | m
        expected = ~outside
        expected = m | (~m & ~outside)
        assert np.array_equal(out, expected)


class TestMarchingSquares:
    def test_rectangle_ring(self):
        m = np.zeros((12, 14), dtype=bool)
        m[3:8, 4:11] = True  # 5 x 7 pixel rectangle
        rings = contour_vec.mask_contours(m)
        assert len(rings) == 1
        ring = rings[0]
        assert np.array_equal(ring[0], ring[-1])  # closed
        # shoelace area: (h-1)*(w-1) core + boundary band - 4 cut
        # corners: for a solid a x b block the 0.5-level ring area is
        # (a)(b) - 2 (half-pixel band minus 4 * 1/8 corner cuts):
        x, y = ring[:, 1], ring[:, 0]
        area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        a, b = 5, 7
        expected = (a - 1 + 1) * (b - 1 + 1) - 2 + 1.5 - 1.0
        # exact value: core (a-1)(b-1) + edge half-band 2*((a-1)+(b-1))*0.5
        # + 4 corner triangles 1/8 each
        expected = (a - 1) * (b - 1) + ((a - 1) + (b - 1)) + 0.5
        assert abs(area - expected) < 1e-9
        # every data pixel center strictly inside the ring bbox
        assert ring[:, 0].min() == 2.5 and ring[:, 0].max() == 7.5
        assert ring[:, 1].min() == 3.5 and ring[:, 1].max() == 10.5

    def test_hole_is_filled_before_tracing(self):
        m = np.zeros((10, 10), dtype=bool)
        m[2:8, 2:8] = True
        m[4:6, 4:6] = False
        rings = contour_vec.mask_contours(m)
        assert len(rings) == 1  # hole filled -> single outer ring

    def test_two_components_two_rings(self):
        m = np.zeros((10, 16), dtype=bool)
        m[2:5, 2:6] = True
        m[6:9, 9:14] = True
        rings = contour_vec.mask_contours(m)
        assert len(rings) == 2


class TestContourTiles:
    def test_world_coordinates_and_area(self, spark):
        from raster_tools_spark.operators import contour_op

        px = np.full((256, 256), 255, dtype=np.uint8)
        px[10:20, 30:50] = 7  # 10 x 20 data block
        cid = int(pack_cell(10, 12, 34))
        tiles = spark.createDataFrame(
            pd.DataFrame(
                [(cid, codecs.png_encode(px), "png")],
                columns=["cell_id", "bytes", "fmt"],
            ),
            schema="cell_id long, bytes binary, fmt string",
        )
        rows = contour_op.contour_tiles(tiles).collect()
        assert len(rows) == 1
        r = rows[0]
        expected_px_area = (10 - 1) * (20 - 1) + (9 + 19) + 0.5
        assert abs(r.area - expected_px_area * CELL_SIZE * CELL_SIZE) < 1e-9
        gtype, payload = wkb.parse(bytes(r.geom_wkb))
        assert gtype == wkb.POLYGON


def test_footprint_formula_families():
    """Pin the closed forms the contour_footprint ORACLE relies on:
    for every fixture tile k, mask_contours on the composed rect
    union yields exactly the CASE-expression ring count, vertex
    count, and shoelace area of the SQL twin."""
    from raster_tools_spark.queries import _footprint_rects

    for k in range(12):
        mask = np.zeros((256, 256), dtype=bool)
        for r0, c0, h, w in _footprint_rects(k):
            mask[r0:r0 + h, c0:c0 + w] = True
        rings = contour_vec.mask_contours(mask)
        n_pts = sum(len(r) for r in rings)
        area = sum(
            0.5 * abs(np.sum(r[:-1, 1] * r[1:, 0] - r[1:, 1] * r[:-1, 0]))
            for r in rings
        )
        a, b = 5 + (3 * k) % 11, 4 + (5 * k) % 13
        c, d = 4 + k % 5, 3 + k % 6
        a2, w1 = 16 + k % 7, 3 + k % 3
        b2, h1 = 18 + k % 5, 4 + k % 3
        A, B = 10 + k % 5, 12 + k % 7
        m = k % 4
        exp = {
            0: (1, 2 * (a + b) + 1, a * b - 0.5),
            1: (2, 2 * (a + b) + 2 * (c + d) + 2, a * b + c * d - 1.0),
            2: (1, 2 * (a2 + b2) + 1,
                a2 * w1 + b2 * h1 - w1 * h1 - 0.5),
            3: (1, 2 * (A + B) + 1, A * B - 0.5),
        }[m]
        assert (len(rings), n_pts) == exp[:2], (k, m)
        assert abs(area - exp[2]) < 1e-9, (k, m)
