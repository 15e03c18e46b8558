"""Foreign-PNG defiltering: the decoder must reconstruct scanlines
written with ANY spec filter (0 None, 1 Sub, 2 Up, 3 Average,
4 Paeth), not just the filter-0 stream the engine's own encoder
emits.  The test builds PNGs with an independent forward-filter
implementation straight from the PNG 1.2 spec pseudocode and checks
bit-exact reconstruction, per filter and with mixed filters per row.
"""
import struct
import zlib

import numpy as np
import pytest

from raster_tools_spark import codecs

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag, payload):
    body = tag + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(
        ">I", zlib.crc32(body)
    )


def _forward_filter(img: np.ndarray, filters) -> bytes:
    """Spec forward filtering (independent of the decoder's math):
    Filt(x) = Orig(x) - predictor, predictor per filter type."""
    if img.ndim == 2:
        h, w = img.shape
        nch, ctype = 1, 0
    else:
        h, w, nch = img.shape
        ctype = 2
    flat = img.reshape(h, w * nch).astype(np.int32)
    out = bytearray()
    for i in range(h):
        f = filters[i % len(filters)]
        out.append(f)
        row = flat[i]
        prev = flat[i - 1] if i > 0 else np.zeros(w * nch, np.int32)
        filt = np.empty(w * nch, np.int32)
        for x in range(w):
            s = x * nch
            for ch in range(nch):
                orig = int(row[s + ch])
                a = int(row[s - nch + ch]) if x > 0 else 0
                b = int(prev[s + ch])
                c = int(prev[s - nch + ch]) if x > 0 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                filt[s + ch] = (orig - pred) & 0xFF
        out.extend(filt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def _img(gray=True):
    rng = np.random.default_rng(31)
    if gray:
        return rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    return rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("gray", [True, False])
def test_single_filter_roundtrip(f, gray):
    img = _img(gray)
    got = codecs.png_decode(_forward_filter(img, [f]))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("gray", [True, False])
def test_mixed_filters_per_row(gray):
    img = _img(gray)
    got = codecs.png_decode(_forward_filter(img, [4, 3, 0, 2, 1]))
    assert np.array_equal(got, img)


def test_gradient_image_paeth():
    # smooth ramps are where Average/Paeth predictors actually engage
    gi, gj = np.mgrid[0:32, 0:48]
    img = ((gi * 3 + gj * 5) % 256).astype(np.uint8)
    got = codecs.png_decode(_forward_filter(img, [3, 4]))
    assert np.array_equal(got, img)
