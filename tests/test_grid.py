"""Golden tests for the grid math -- the reference's get_indices
round/floor/ceil rules (raster_tools/utils.py:114-144) and the quadtree
key scheme."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_tools_spark import grid


REF_GT = grid.GeoTransform((200000.0, 1.0, 0.0, 400007.0, 0.0, -1.0))


class TestGetIndices:
    def test_round_mode(self):
        # envelope in fixture coordinates (fill/tests.py:47-52 grid)
        env = (200001.3, 200004.9, 400001.1, 400005.2)
        assert REF_GT.get_indices(env) == (1, 2, 5, 6)

    def test_inflate_mode_covers_envelope(self):
        env = (200001.3, 200004.9, 400001.1, 400005.2)
        x1, y1, x2, y2 = REF_GT.get_indices(env, inflate=True)
        assert (x1, y1, x2, y2) == (1, 1, 5, 6)
        # envelope fully inside [x1, x2) x [y1, y2) pixel window
        assert x1 <= (env[0] - 200000.0) and x2 >= (env[1] - 200000.0)

    def test_banker_rounding(self):
        # 0.5 offsets exercise Python 3 round-half-even, the exact
        # behavior of the reference under py3 (utils.py:130-135)
        env = (200000.5, 200002.5, 400004.5, 400006.5)
        X1, Y1, X2, Y2 = REF_GT.get_indices(env)
        assert X1 == round(0.5) == 0
        assert X2 == round(2.5) == 2
        assert Y1 == round(400007.0 - 400006.5)  # 0.5 -> 0
        assert Y2 == round(400007.0 - 400004.5)  # 2.5 -> 2

    def test_zero_dim_guard(self):
        # degenerate envelope: inflate must never produce empty window
        # (utils.py:138-143)
        env = (200001.0, 200001.0, 400003.0, 400003.0)
        x1, y1, x2, y2 = REF_GT.get_indices(env, inflate=True)
        assert x2 > x1 and y2 > y1

    def test_shifted_anchors_origin(self):
        env = (200001.3, 200004.9, 400001.1, 400005.2)
        sh = REF_GT.shifted(env, inflate=True)
        assert sh == (200001.0, 1.0, 0.0, 400006.0, 0.0, -1.0)

    def test_scaled(self):
        assert REF_GT.scaled(2, 3) == (200000.0, 2.0, 0.0, 400007.0, 0.0, -3.0)

    def test_get_window(self):
        env = (200001.3, 200004.9, 400001.1, 400005.2)
        w = REF_GT.get_window(env)
        assert w == {"xoff": 1, "yoff": 2, "xsize": 4, "ysize": 4}


class TestCells:
    def test_pack_roundtrip(self):
        for res in (7, 9, 11, 14):
            c = grid.pack_cell(res, 12345, 6789)
            assert tuple(int(v) for v in grid.unpack_cell(c)) == (
                res, 12345, 6789,
            )

    def test_cell_of_xy_bounds(self):
        c = grid.cell_of_xy(1000.0, grid.WORLD_TOP - 1000.0, 9)
        x1, x2, y1, y2 = grid.cell_bounds(c)
        assert x1 <= 1000.0 < x2
        assert y1 < grid.WORLD_TOP - 1000.0 <= y2

    def test_parent_contains_child(self):
        c = grid.cell_of_xy(3333.0, grid.WORLD_TOP - 7777.0, 11)
        p = grid.parent_cell(c)
        cx1, cx2, cy1, cy2 = grid.cell_bounds(c)
        px1, px2, py1, py2 = grid.cell_bounds(p)
        assert px1 <= cx1 and px2 >= cx2 and py1 <= cy1 and py2 >= cy2

    def test_covering_cells_exact(self):
        env = (0.0, 1000.0, grid.WORLD_TOP - 1000.0, grid.WORLD_TOP)
        cells = grid.covering_cells(env, 9)  # 256 m cells -> 4x4
        assert len(cells) == 16
        assert len(set(cells)) == 16
        assert grid.n_covering(env, 9) == 16

    def test_ring_and_disk(self):
        c = grid.cell_of_xy(5000.0, grid.WORLD_TOP - 5000.0, 9)
        assert len(grid.ring_cells(c, 1)) == 8
        assert len(grid.disk_cells(c, 2)) == 25
        assert grid.ring_cells(c, 0) == [int(c)]

    @given(
        st.integers(0, 2**13 - 1),
        st.integers(0, 2**13 - 1),
    )
    @settings(max_examples=200, deadline=None)
    def test_hilbert_bijective_sample(self, x, y):
        d1 = int(grid.hilbert_xy2d(13, x, y))
        # neighbors map to distinct distances
        d2 = int(grid.hilbert_xy2d(13, x, (y + 1) % 2**13))
        assert d1 != d2
        assert 0 <= d1 < 4**13

    def test_hilbert_locality(self):
        # adjacent cells along the curve are adjacent in space
        n = 64
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = grid.hilbert_xy2d(6, xs.ravel(), ys.ravel())
        order = np.argsort(d)
        px, py = xs.ravel()[order], ys.ravel()[order]
        steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert steps.max() == 1  # Hilbert curve: unit steps only


class TestAnchor:
    def test_anchor_on_tile_grid(self):
        x0, y_top = grid.anchor_of_phash(np.array([12345, 999999]))
        assert np.all(x0 % grid.TILE_SIZE == 0)
        assert np.all((grid.WORLD_TOP - y_top) % grid.TILE_SIZE == 0)

    def test_anchor_deterministic(self):
        a = grid.anchor_of_phash(np.array([42]))
        b = grid.anchor_of_phash(np.array([42]))
        assert a[0][0] == b[0][0] and a[1][0] == b[1][0]
