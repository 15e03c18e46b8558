"""D8 flow kernels (SURVEY.md G1-G3), pure numpy.

Semantics ported from the reference's flow pipeline:

- course encoding + LUT tie resolution  <- flow/flow_dir.py:21-57
- ``calculate_flow_direction``          <- flow/flow_dir.py:77-158
  (drop kernels, LUT for positive drops, outward edges, iterative
  flat-area resolution)
- ``fill_simple_depressions``           <- flow/flow_fil.py:34-41
- ``accumulate``                        <- flow/flow_acc.py:29-89
  (pointer array B = flow[A], repeated advance + bincount)

scipy stand-ins: ``ndimage.correlate(values, kernel)`` with a
two-point kernel becomes an explicit shifted-difference on a
symmetric-padded array; 8-connected ``binary_erosion`` is a stacked
window AND.

The Spark face runs ``calculate_flow_direction`` per tile over the
focal halo exchange (operators/focal.py); flat areas wider than the
halo margin remain unresolved (0) exactly as the reference leaves
complex depressions at 0 (flow_dir.py:156-157) -- the staged-offset
multi-pass of flow_fil.py:169-184 is the cross-tile escalation path.
"""

from __future__ import annotations

import numpy as np

COURSES = np.array(
    [(64, 128, 1), (32, 0, 2), (16, 8, 4)], "u1"
)
INDICES = COURSES.nonzero()
NUMBERS = COURSES[INDICES][np.newaxis, ...]
OFFSETS = np.array(INDICES).transpose()[np.newaxis] - 1
WEIGHTS = 1 / np.sqrt(np.square(OFFSETS).sum(2))
VECTORS = OFFSETS * WEIGHTS[..., np.newaxis]
INVERSE = COURSES[tuple(-np.array(OFFSETS[0].T) + 1)][np.newaxis]


def get_look_up_table() -> np.ndarray:
    """flow_dir.py:40-56 verbatim (numpy-only already)."""
    encode = np.arange(256, dtype="u1")[:, np.newaxis]
    select = (encode & NUMBERS).astype(bool)[..., np.newaxis]
    result = (select * VECTORS).sum(1)[:, np.newaxis, :]
    common = (result * VECTORS).sum(2)
    fitted = np.where(
        common.any(1),
        (common * select[..., 0]).argmax(1),
        select[..., 0].argmax(1),
    )
    mapped = NUMBERS[0, fitted]
    mapped[0] = 0
    return mapped


def _correlate_two_point(values: np.ndarray, i: int, j: int, f: float):
    """ndimage.correlate(values, k) for k[i,j] = -f, k[1,1] = +f,
    mode='reflect' (== np.pad symmetric)."""
    p = np.pad(values, 1, mode="symmetric")
    h, w = values.shape
    neigh = p[i : i + h, j : j + w]
    return f * values - f * neigh


def _binary_erosion8(mask: np.ndarray) -> np.ndarray:
    """8-connected erosion, border False (structure=ones((3,3)))."""
    p = np.pad(mask, 1, mode="constant", constant_values=False)
    out = np.ones_like(mask)
    h, w = mask.shape
    for di in range(3):
        for dj in range(3):
            out &= p[di : di + h, dj : dj + w]
    return out


def _get_neighbours(indices):
    """flow_dir.py:34-38."""
    array1 = np.array(indices).transpose().reshape(-1, 1, 2)
    array8 = array1 + OFFSETS
    return tuple(array8.reshape(-1, 2).transpose())


def calculate_flow_direction(values: np.ndarray) -> np.ndarray:
    """flow_dir.py:77-158 with shift-based correlate."""
    values = np.asarray(values, dtype=np.float64)
    direction = np.zeros_like(values, dtype="u1")

    factor = np.zeros((3, 3))
    factor[INDICES] = WEIGHTS[0]

    best_drop = np.zeros_like(values)

    for i, j in zip(*factor.nonzero()):
        this_drop = _correlate_two_point(values, i, j, factor[i, j])

        same_drop = this_drop == best_drop
        direction[same_drop] += COURSES[i, j]

        more_drop = this_drop > best_drop
        direction[more_drop] = COURSES[i, j]
        best_drop[more_drop] = this_drop[more_drop]

    lut = get_look_up_table()
    some_drop = best_drop > 0
    direction[some_drop] = lut[direction[some_drop]]

    # outward edges (flow_dir.py:116-124)
    direction[0, -1] = 1
    direction[1:-1, -1] = 2
    direction[-1, -1] = 4
    direction[-1, 1:-1] = 8
    direction[-1, 0] = 16
    direction[1:-1, 0] = 32
    direction[0, 0] = 64
    direction[0, 1:-1] = 128

    # iterative flat-area resolution (flow_dir.py:126-154)
    while True:
        undefined = ~np.in1d(direction, NUMBERS).reshape(direction.shape)
        edges = undefined ^ _binary_erosion8(undefined)

        t_index1 = edges.nonzero()
        if len(t_index1[0]) == 0:
            break
        direction1 = direction[t_index1][:, np.newaxis]

        t_index8 = _get_neighbours(t_index1)
        # clip neighbour indices into the array (reference relies on
        # wrap-around semantics being masked out by b_index8c; explicit
        # clipping keeps identical selections for interior pixels)
        r8 = np.clip(t_index8[0], 0, values.shape[0] - 1)
        c8 = np.clip(t_index8[1], 0, values.shape[1] - 1)
        direction8 = direction[(r8, c8)].reshape(-1, 8)

        b_index8a = (direction1 & NUMBERS).astype(bool)
        b_index8b = np.in1d(direction8, NUMBERS).reshape(b_index8a.shape)
        b_index8c = direction8 != INVERSE
        b_index8 = np.logical_and.reduce([b_index8a, b_index8b, b_index8c])

        if not b_index8.any():
            break

        argmax = np.argmax(b_index8, axis=1)
        nonzero = b_index8.any(axis=1)
        superindex = (t_index1[0][nonzero], t_index1[1][nonzero])
        direction[superindex] = NUMBERS[0, argmax[nonzero]]

    direction[~np.in1d(direction, NUMBERS).reshape(direction.shape)] = 0
    return direction


def fill_simple_depressions(values: np.ndarray) -> np.ndarray:
    """flow_fil.py:34-41 (in-place; returns values)."""
    h, w = values.shape
    p = np.pad(values, 1, mode="edge")
    edge = np.full_like(values, np.inf, dtype=np.float64)
    for di in range(3):
        for dj in range(3):
            if di == 1 and dj == 1:
                continue
            np.minimum(edge, p[di : di + h, dj : dj + w], out=edge)
    locs = edge > values
    values[locs] = edge[locs]
    return values


def _get_traveled_all(courses: np.ndarray):
    """flow_acc.py:29-43."""
    height, width = courses.shape
    indices = (
        np.arange(height).repeat(width),
        np.tile(np.arange(width), height),
    )
    points = np.array(indices).transpose()
    encode = courses[indices][:, np.newaxis]
    select = (encode & NUMBERS).astype(bool)
    target = points + OFFSETS[0][select.argmax(1)]
    return tuple(target.transpose())


def accumulate(direction: np.ndarray) -> np.ndarray:
    """flow_acc.py:45-89 verbatim semantics."""
    size = direction.size
    height, width = direction.shape
    traveled = _get_traveled_all(direction)

    flow = np.empty(size + 1, dtype="i8")
    flow[-1] = size
    flow[:size] = np.where(
        np.logical_or.reduce(
            [
                direction.ravel() == 0,
                traveled[0] < 0,
                traveled[0] >= height,
                traveled[1] < 0,
                traveled[1] >= width,
            ]
        ),
        size,
        traveled[0] * width + traveled[1],
    )

    state = np.arange(size)
    flow[:-1][flow[flow[state]] == state] = size  # opposing dirs
    accumulation = np.zeros(size, "u8")

    while True:
        state = flow[state]
        state.sort()
        state = state[: np.searchsorted(state, size)]
        if not state.size:
            break
        accumulation += np.bincount(state, minlength=size).astype("u8")

    return accumulation.reshape(height, width)
