"""Streamline vectorization (SURVEY.md G7): raster flow direction +
accumulation -> stream polylines, per accumulation class.

Reference semantics (flow/flow_vec.py:51-114): for each accumulation
class [lo, hi), the cells in class form chains along the D8 pointer
field; chain STARTS are sources (class cells no class cell flows into)
and merges (class cells receiving more than one inflow); chain STOPS
are merges and sinks (cells whose flow leaves the raster or leaves the
class).  Each start is walked downstream to the first stop and yielded
as one polyline of pixel centers.  The reference runs this per index
tile over a 1-pixel-margined read -- the distributed face mirrors that
with the halo exchange (operators/flow_op.py).

This module is an independent implementation of those semantics:
pointer construction reuses flow.flow_targets, class membership /
start / stop sets are derived with plain numpy set algebra, and the
chain walk is an explicit generator.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

from .flow import flow_targets

# accumulation class bounds (flow_vec.py CLASSES)
CLASSES = ((2.0, 3.0), (3.0, 4.0), (4.0, 4.7), (4.7, 9.9))


def vectorize_streams(
    direction: np.ndarray,
    accumulation: np.ndarray,
    classes=CLASSES,
) -> Iterator[Tuple[float, np.ndarray]]:
    """Yield (class_lo, polyline) pairs; polyline is an (n, 2) array of
    (row, col) PIXEL indices into ``direction`` (centers; convert to
    world coordinates with the tile's geo transform downstream)."""
    h, w = direction.shape
    n = direction.size
    ptr = np.append(flow_targets(direction), n)
    idx = np.arange(n)
    mutual = ptr[ptr[idx]] == idx
    ptr[:n][mutual] = n  # opposing directions are sinks

    acc = accumulation.ravel()
    for lo, hi in classes:
        members = np.nonzero((acc >= lo) & (acc < hi))[0]
        if members.size == 0:
            continue
        member_set = set(members.tolist())
        downstream = ptr[members]
        leaving = downstream == n
        # class cells whose target is outside the class (but on-grid):
        # their targets terminate a chain ("promoting" in the ref)
        off_class = np.array(
            [d != n and d not in member_set for d in downstream],
            dtype=bool,
        )
        targets_in = set(
            d for d in downstream.tolist() if d != n and d in member_set
        )
        # sources: class cells nothing in-class flows into, that flow on
        sources = [
            m for m, d in zip(members.tolist(), downstream.tolist())
            if d != n and m not in targets_in
        ]
        # merges: class cells receiving >= 2 inflows from class cells
        counts = np.bincount(
            downstream[~leaving & ~off_class], minlength=n
        ) if (~leaving & ~off_class).any() else np.zeros(n, np.int64)
        merges = [m for m in members.tolist() if counts[m] > 1]
        sinks = set(members[leaving].tolist()) | set(
            downstream[off_class].tolist()
        )
        starts = sorted(set(sources) | set(merges))
        stops = set(merges) | sinks

        for s in starts:
            if s in sinks:
                continue
            line: List[int] = [s]
            cur = s
            for _ in range(n + 1):  # cycle guard
                cur = int(ptr[cur])
                line.append(cur)
                if cur in stops:
                    break
            a = np.array(line)
            yield float(lo), np.column_stack([a // w, a % w])
