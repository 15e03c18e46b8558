"""Deterministic synthetic data: the ``images`` table + vector layers.

FIXTURES.md sections 1-3: an Iceberg-style table of image+caption pairs
(image_id, bytes, w, h, fmt, caption, phash) plus polygon and line
layers.  Generation is pure -- every row is a function of its index and
a seed only (counter-based Philox RNG keyed per row), so the same rows
come out byte-identical regardless of partitioning or parallelism
(north rule) and the table can be regenerated on any executor instead of
being shipped.

``tiles_axis`` confines anchors to the top-left ``tiles_axis x
tiles_axis`` window of the canonical 4096x4096 tile grid so small-scale
tests get realistic join densities; at 10^12-row scale use the full
grid (tiles_axis=4096).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from . import codecs, wkb
from .grid import CELL_SIZE, TILE_SIZE, WORLD_TOP, _ANCHOR_MULT

DEFAULT_SEED = 42
DEFAULT_TILES_AXIS = 64  # 64 x 64 canonical tiles = 8.192 km square window

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)
POLYGONS_SCHEMA = (
    "feat_id long, name string, geom_wkb binary, category string, value int"
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 -- deterministic int64 mixer (public algorithm)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def phash_of_index(idx: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Row index -> phash (int64, non-negative)."""
    seed_mix = (
        np.asarray([seed], dtype=np.uint64) * np.uint64(0x5851F42D4C957F2D)
    )[0]
    mixed = _splitmix64(
        np.asarray(idx, dtype=np.int64).astype(np.uint64) + seed_mix
    )
    return (mixed >> np.uint64(1)).astype(np.int64)


def anchor_of_phash_windowed(phash: np.ndarray, tiles_axis: int):
    """phash -> (x0, y_top) anchor confined to a tiles_axis window.

    Same mixing as grid.anchor_of_phash (retile re-anchoring analog,
    raster_tools/retile.py:47 -> utils.py:82-92) with the tile index
    masked into the window.  tiles_axis must be a power of two.
    """
    p = np.asarray(phash, dtype=np.int64)
    mask = np.int64(tiles_axis - 1)
    mixed = (p * _ANCHOR_MULT) & np.int64((1 << 62) - 1)
    tx = (mixed >> np.int64(20)) & mask
    ty = (mixed >> np.int64(2)) & mask
    x0 = tx.astype(np.float64) * TILE_SIZE
    y_top = WORLD_TOP - ty.astype(np.float64) * TILE_SIZE
    return x0, y_top


def _image_pixels(phash: int, h: int, w: int) -> np.ndarray:
    """Deterministic tile content: seeded gradient + sinusoid + noise
    (FIXTURES.md section 1: 'deterministic function of phash')."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(phash)))
    ii, jj = np.meshgrid(
        np.arange(h, dtype=np.float64),
        np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    a, b = rng.uniform(0.2, 1.0, size=2)
    phase = rng.uniform(0, 2 * np.pi)
    base = (
        96.0
        + 48.0 * np.sin(2 * np.pi * (a * ii + b * jj) / 96.0 + phase)
        + 0.15 * (ii + jj)
    )
    noise = rng.normal(0.0, 3.0, size=(h, w))
    return np.clip(np.round(base + noise), 0, 255).astype(np.uint8)


def images_pdf(
    start: int,
    stop: int,
    seed: int = DEFAULT_SEED,
    tiles_axis: int = DEFAULT_TILES_AXIS,
    with_pixels: bool = True,
) -> pd.DataFrame:
    """Generate rows [start, stop) of the images table as pandas."""
    idx = np.arange(start, stop, dtype=np.int64)
    ph = phash_of_index(idx, seed)
    sel = _splitmix64(ph.astype(np.uint64))
    # mostly 256 px; some 250/100 edge tiles (rextract.py:143-152 clipped
    # blocks analog)
    size_pick = (sel % np.uint64(16)).astype(np.int64)
    w = np.where(size_pick == 0, 250, np.where(size_pick == 1, 100, 256))
    h = np.where(size_pick == 2, 250, np.where(size_pick == 3, 100, 256))
    fmt = np.where((sel >> np.uint64(8)) % np.uint64(4) == 0, "jpeg", "png")

    image_id = np.array([f"img_{i:012d}" for i in idx])
    caption = np.array(
        [
            f"synthetic caption for {img} phash {p} fmt {f}"
            for img, p, f in zip(image_id, ph, fmt)
        ]
    )
    if with_pixels:
        data = [
            codecs.encode(_image_pixels(int(p), int(hh), int(ww)), str(f))
            for p, hh, ww, f in zip(ph, h, w, fmt)
        ]
    else:
        data = [b""] * len(idx)
    return pd.DataFrame(
        {
            "image_id": image_id,
            "bytes": data,
            "w": w.astype(np.int32),
            "h": h.astype(np.int32),
            "fmt": fmt,
            "caption": caption,
            "phash": ph,
        }
    )


def images_df(
    spark,
    n: int,
    seed: int = DEFAULT_SEED,
    tiles_axis: int = DEFAULT_TILES_AXIS,
    with_pixels: bool = True,
    partitions: Optional[int] = None,
):
    """Distributed images table: spark.range -> mapInPandas generator.

    The generator runs on executors; each output row depends only on its
    ``id``, so the table is identical at any parallelism (north rule).
    """
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids from spark.range are contiguous per batch slice
            yield images_pdf(
                int(ids.min()),
                int(ids.max()) + 1,
                seed=seed,
                tiles_axis=tiles_axis,
                with_pixels=with_pixels,
            )

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Vector layers (FIXTURES.md section 2/3).
# ---------------------------------------------------------------------------

_CATEGORIES = np.array(["water", "crop", "urban", "forest", "road"])


def _poly_name(i: int) -> str:
    """base-26 + digits tile names (reindex.py:52-55 style)."""
    letters = ""
    v = i
    for _ in range(2):
        letters = chr(ord("a") + v % 26) + letters
        v //= 26
    return f"{letters}{i % 10}"


def polygons_pdf(
    m: int,
    seed: int = DEFAULT_SEED,
    tiles_axis: int = DEFAULT_TILES_AXIS,
    hot_every: int = 50,
) -> pd.DataFrame:
    """Polygon layer: rects + star polygons + a few huge hot polygons
    (skew drivers), confined to the same window as the images."""
    window = tiles_axis * TILE_SIZE
    rows = []
    for i in range(m):
        rng = np.random.Generator(
            np.random.Philox(key=np.uint64(seed * 1_000_003 + i))
        )
        cx = rng.uniform(0.02, 0.98) * window
        cy = WORLD_TOP - rng.uniform(0.02, 0.98) * window
        kind = i % 3
        if hot_every and i % hot_every == hot_every - 1:
            # hot polygon: covers a large fraction of the window
            half = rng.uniform(0.25, 0.45) * window
            geom = wkb.box_wkb(
                max(cx - half, 0.0),
                max(cy - half, WORLD_TOP - window),
                min(cx + half, window),
                min(cy + half, WORLD_TOP),
            )
        elif kind == 0:
            # axis-aligned rectangle, tile-index style (reindex.py:30-69)
            hw = rng.uniform(0.5, 4.0) * TILE_SIZE
            hh = rng.uniform(0.5, 4.0) * TILE_SIZE
            geom = wkb.box_wkb(cx - hw, cy - hh, cx + hw, cy + hh)
        else:
            # jittered star polygon (simple, non-self-intersecting)
            n_v = int(rng.integers(5, 12))
            angles = np.sort(rng.uniform(0, 2 * np.pi, n_v))
            radii = rng.uniform(0.4, 3.0, n_v) * TILE_SIZE
            xs = cx + radii * np.cos(angles)
            ys = cy + radii * np.sin(angles)
            geom = wkb.polygon_wkb(np.column_stack([xs, ys]))
        rows.append(
            (
                i,
                _poly_name(i),
                geom,
                str(_CATEGORIES[i % len(_CATEGORIES)]),
                int(rng.integers(1, 250)),
            )
        )
    return pd.DataFrame(
        rows, columns=["feat_id", "name", "geom_wkb", "category", "value"]
    )


def polygons_df(spark, m: int, seed: int = DEFAULT_SEED,
                tiles_axis: int = DEFAULT_TILES_AXIS, hot_every: int = 50):
    pdf = polygons_pdf(m, seed=seed, tiles_axis=tiles_axis,
                       hot_every=hot_every)
    return spark.createDataFrame(pdf, schema=POLYGONS_SCHEMA)


def lines_pdf(
    m: int, seed: int = DEFAULT_SEED, tiles_axis: int = DEFAULT_TILES_AXIS
) -> pd.DataFrame:
    """Polyline layer crossing multiple cells (line_up.py sampling
    semantics target, FIXTURES.md section 3)."""
    window = tiles_axis * TILE_SIZE
    rows = []
    for i in range(m):
        rng = np.random.Generator(
            np.random.Philox(key=np.uint64(seed * 7_000_003 + i))
        )
        n_v = int(rng.integers(3, 8))
        xs = np.cumsum(rng.uniform(-2, 4, n_v)) * TILE_SIZE
        ys = np.cumsum(rng.uniform(-3, 3, n_v)) * TILE_SIZE
        xs = np.clip(xs + rng.uniform(0, window), 0, window)
        ys = WORLD_TOP - np.clip(ys + rng.uniform(0, window), 0, window)
        rows.append((i, wkb.linestring_wkb(np.column_stack([xs, ys]))))
    return pd.DataFrame(rows, columns=["line_id", "geom_wkb"])
