"""Shadow march goldens: a spike on flat ground casts a shadow of
hand-computable length along the sun diagonal."""

import numpy as np

from raster_tools_spark import shadow


def test_spike_shadow_length():
    # sun from NW (az 315), elevation 45 deg, 1 m/px: dz per diagonal
    # step = sqrt(2); a 10 m spike shadows ~7 diagonal steps
    m = 16
    size = 32
    padded = np.zeros((size + 2 * m, size + 2 * m))
    padded[m + 5, m + 5] = 10.0
    out = shadow.cast_shadow(
        padded, m, azimuth=315.0, elevation=45.0, m_per_px=1.0, mz=1000.0
    )
    dz = math_sqrt2 = 2 ** 0.5
    for k in range(1, 12):
        shadowed = out[5 + k, 5 + k] == 0
        expect = 10.0 - k * dz > 0  # view2 > view1 strictly
        assert shadowed == expect, f"k={k}"


def test_flat_ground_all_lit():
    m = 8
    padded = np.full((48, 48), 7.0)
    out = shadow.cast_shadow(padded, m, m_per_px=1.0)
    assert (out == 255).all()


def test_margin_px_reference_constants():
    # reference defaults: az 315, elev 57, 0.5 m/px, mz 367
    px = shadow.margin_px()
    # ms = 367 / tan(57deg) / 0.5 = ~476.7; |dx|*ms ~ 337.1
    assert px == 338


def test_kernel_in_halo_stencil(spark):
    import pandas as pd

    from raster_tools_spark import codecs
    from raster_tools_spark.grid import pack_cell, unpack_cell
    from raster_tools_spark.operators import focal

    TILE = 64
    g = np.zeros((2 * TILE, 2 * TILE), dtype=np.uint8)
    g[60, 60] = 200  # spike near the tile boundary: shadow crosses seam
    rows = []
    for ty in range(2):
        for tx in range(2):
            px = g[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            rows.append(
                (int(pack_cell(10, 10 + tx, 20 + ty)),
                 codecs.png_encode(px), "png")
            )
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell_id", "bytes", "fmt"])
    )
    margin = 16
    kern = shadow.shadow_kernel_factory(
        azimuth=315.0, elevation=45.0, m_per_px=1.0, mz=1000.0,
        margin=margin,
    )
    out = focal.halo_stencil(tiles, kern, margin=margin, tile_px=TILE)
    got = np.zeros_like(g)
    for r in out.collect():
        _, ix, iy = (int(v) for v in unpack_cell(r.cell_id))
        tx, ty = ix - 10, iy - 20
        got[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE] = (
            codecs.png_decode(bytes(r.bytes))
        )
    # the shadow must cross the tile seam at (64, 64)+ without a gap
    padded = np.pad(g.astype(np.float64), margin, mode="edge")
    exp = shadow.cast_shadow(
        padded, margin, azimuth=315.0, elevation=45.0, m_per_px=1.0,
        mz=1000.0,
    )
    np.testing.assert_array_equal(got, exp)
