"""G7 streamline vectorize: hand-built pointer fields with known
chains."""

import numpy as np

from raster_tools_spark import flow_vec


def _field(h, w):
    return np.zeros((h, w), dtype=np.uint8), np.zeros((h, w))


def test_single_chain():
    # a straight eastward stream along row 2: cells (2,1)..(2,5),
    # all in class [2,3); (2,5) flows east off a cell with acc below
    # class (termination by leaving the class)
    d, a = _field(6, 8)
    E = 2  # east bit
    for j in range(1, 6):
        d[2, j] = E
        a[2, j] = 2.5
    d[2, 6] = E
    a[2, 6] = 1.0  # off-class target terminates the chain
    out = list(flow_vec.vectorize_streams(d, a, classes=((2.0, 3.0),)))
    assert len(out) == 1
    lo, line = out[0]
    assert lo == 2.0
    # source (2,1) walked to the off-class stop (2,6)
    assert line[0].tolist() == [2, 1]
    assert line[-1].tolist() == [2, 6]
    assert len(line) == 6


def test_merge_splits_chains():
    # two tributaries meeting at (3,3), continuing east to the edge
    d, a = _field(7, 7)
    E, SE, NE = 2, 4, 1
    # north branch: (2,1)->(2,2)->SE->(3,3)
    d[2, 1] = E; d[2, 2] = SE
    # south branch: (4,1)->(4,2)->NE->(3,3)
    d[4, 1] = E; d[4, 2] = NE
    # main stem: (3,3)->(3,4)->(3,5)->(3,6) -> leaves grid east
    d[3, 3] = E; d[3, 4] = E; d[3, 5] = E; d[3, 6] = E
    for ij in [(2, 1), (2, 2), (4, 1), (4, 2), (3, 3), (3, 4), (3, 5),
               (3, 6)]:
        a[ij] = 2.5
    out = list(flow_vec.vectorize_streams(d, a, classes=((2.0, 3.0),)))
    # three chains: each tributary to the merge, merge to the grid edge
    assert len(out) == 3
    ends = sorted(tuple(l[-1]) for _, l in out)
    starts = sorted(tuple(l[0]) for _, l in out)
    assert starts == [(2, 1), (3, 3), (4, 1)]
    assert ends == [(3, 3), (3, 3), (3, 6)]


def test_opposing_directions_are_sinks():
    d, a = _field(3, 4)
    E, W = 2, 32
    d[1, 1] = E
    d[1, 2] = W  # 2-cycle with (1,1)
    a[1, 1] = a[1, 2] = 2.5
    out = list(flow_vec.vectorize_streams(d, a, classes=((2.0, 3.0),)))
    assert out == []  # both ends sink; no chain to walk


def test_class_partitioning():
    # one long stream whose accumulation grows: split across classes
    d, a = _field(4, 10)
    E = 2
    for j in range(1, 9):
        d[1, j] = E
        a[1, j] = 2.2 if j < 5 else 3.5
    out = list(flow_vec.vectorize_streams(d, a))
    los = sorted(lo for lo, _ in out)
    assert los == [2.0, 3.0]
    for lo, line in out:
        if lo == 2.0:
            assert line[0].tolist() == [1, 1]
            # walks one step past the class into its off-class target
            assert line[-1].tolist() == [1, 5]
        else:
            assert line[0].tolist() == [1, 5]
            assert line[-1].tolist() == [1, 9]
