"""Shadow march (SURVEY.md W4): directional iterative shift-compare.

Port of the reference's shadow casting (raster_tools/shadow.py:40-141):

- sun direction from ``azimuth``; per-step shift ``ds`` pixels along
  (dx, dy) and elevation drop ``dz = ds * tan(elevation) * m_per_px``;
- a pixel is shadowed when any sun-ward shifted-and-dropped elevation
  exceeds its own;
- march bounded by ``mz`` meters of relief (reference: 367 m, the
  Gerbrandy tower, shadow.py:65) -> bounded halo margin;
- pre-pass cross maximum filter widens shadows a little
  (shadow.py:126-127, ``generate_binary_structure(2, 1)`` = cross);
- early exit when an iteration adds no new shadow (shadow.py:133-140,
  including its accept-miss semantics -- goldens prove parity);
- output encoding True -> 0, False -> 255 (u1 wrap trick,
  shadow.py:141).

Distributed: the kernel runs over the focal halo exchange with
``margin = margin_px(...)`` -- the exact sun-ward data bound the
reference derives at shadow.py:64-66.
"""

from __future__ import annotations

import math

import numpy as np


def maximum_filter_cross(values: np.ndarray) -> np.ndarray:
    """Cross-footprint 3x3 maximum (binary_structure(2,1))."""
    p = np.pad(values, 1, mode="edge")
    h, w = values.shape
    out = values.copy()
    np.maximum(out, p[0:h, 1 : w + 1], out=out)
    np.maximum(out, p[2 : h + 2, 1 : w + 1], out=out)
    np.maximum(out, p[1 : h + 1, 0:w], out=out)
    np.maximum(out, p[1 : h + 1, 2 : w + 2], out=out)
    return out


def _params(azimuth: float, elevation: float, m_per_px: float):
    slope = math.tan(math.radians(elevation))
    dx = math.sin(math.radians(azimuth))
    dy = -math.cos(math.radians(azimuth))
    ds = 1 / max(abs(dx), abs(dy))
    dz = ds * slope * m_per_px
    return dx * ds, dy * ds, dz


def margin_px(
    azimuth: float = 315.0,
    elevation: float = 57.0,
    m_per_px: float = 0.5,
    mz: float = 367.0,
) -> int:
    """Sun-ward margin in pixels (shadow.py:64-66)."""
    slope = math.tan(math.radians(elevation))
    ms = mz / slope / m_per_px
    dx = math.sin(math.radians(azimuth))
    dy = -math.cos(math.radians(azimuth))
    return int(math.ceil(max(abs(dx * ms), abs(dy * ms))))


def cast_shadow(
    padded: np.ndarray,
    margin: int,
    azimuth: float = 315.0,
    elevation: float = 57.0,
    m_per_px: float = 0.5,
    mz: float = 367.0,
    early_exit: bool = True,
) -> np.ndarray:
    """Shadow mask for the center tile of a symmetric-padded array.

    Returns uint8: 0 = shadow, 255 = lit (reference encoding).

    ``early_exit=True`` reproduces the reference's stop-on-still
    iteration (shadow.py:136) -- a whole-raster property.  The
    DISTRIBUTED kernel must pass False: a tile whose first shadowed
    pixel lies several steps from the caster would otherwise stop at
    step 1 (the march is bounded by the margin regardless, so the cost
    is at most ``margin`` vectorized iterations).
    """
    dx, dy, dz = _params(azimuth, elevation, m_per_px)
    arr = maximum_filter_cross(padded.astype(np.float64))

    m = margin
    th = padded.shape[0] - 2 * m
    tw = padded.shape[1] - 2 * m
    view1 = arr[m : m + th, m : m + tw]
    target = np.zeros_like(view1, dtype=bool)

    it = 1
    while True:
        sx = int(round(it * dx))
        sy = int(round(it * dy))
        if abs(sx) > m or abs(sy) > m:
            break
        view2 = arr[m + sy : m + sy + th, m + sx : m + sx + tw] - it * dz
        index = np.logical_and(~target, view2 > view1)
        if early_exit and not index.any():
            break
        if it * dz > mz:
            break
        target[index] = True
        it += 1

    return target.astype("u1") + np.uint8(255)


def shadow_kernel_factory(
    azimuth: float = 315.0,
    elevation: float = 57.0,
    m_per_px: float = 0.5,
    mz: float = 367.0,
    margin: int | None = None,
):
    """Kernel for operators.focal.halo_stencil (expects padded -> full
    padded-shape output; the stencil crops the margin)."""
    def kernel(padded: np.ndarray) -> np.ndarray:
        m = margin if margin is not None else margin_px(
            azimuth, elevation, m_per_px, mz
        )
        core = cast_shadow(
            padded, m, azimuth, elevation, m_per_px, mz,
            early_exit=False,
        )
        out = np.full(padded.shape, 255, dtype=np.uint8)
        out[m : m + core.shape[0], m : m + core.shape[1]] = core
        return out

    return kernel
