"""DCT perceptual hash: invariance and discrimination properties, and
the banded Hamming pairing's recall (image-dedup pipeline)."""

import numpy as np
import pandas as pd
import pytest

from raster_tools_spark import codecs
from raster_tools_spark.functions import multimodal


def _img_df(spark, arrays):
    rows = [
        (f"img_{i:04d}", codecs.png_encode(a.astype(np.uint8)), "png")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]),
        schema="image_id string, bytes binary, fmt string",
    )


def _base(seed, size=64):
    rng = np.random.default_rng(seed)
    # smooth structured image: random low-freq field upsampled
    small = rng.integers(0, 255, (8, 8)).astype(np.float64)
    img = np.kron(small, np.ones((size // 8, size // 8)))
    return np.clip(img, 0, 255)


def test_identical_images_hash_equal(spark):
    a = _base(1)
    hashes = multimodal.perceptual_hash(
        _img_df(spark, [a, a.copy()])
    ).collect()
    assert hashes[0].phash64 == hashes[1].phash64


def test_small_noise_keeps_hash_close_distinct_far(spark):
    a = _base(2)
    rng = np.random.default_rng(3)
    noisy = np.clip(a + rng.normal(0, 2.0, a.shape), 0, 255)
    other = _base(9)
    rows = {r.image_id: r.phash64 for r in multimodal.perceptual_hash(
        _img_df(spark, [a, noisy, other])
    ).collect()}
    d_noise = bin(rows["img_0000"] ^ rows["img_0001"]).count("1")
    d_other = bin(rows["img_0000"] ^ rows["img_0002"]).count("1")
    assert d_noise <= 6
    assert d_other > 10


def test_banded_pairing_full_recall(spark):
    """Every pair within max_hamming must be found (pigeonhole), and
    nothing above it."""
    from itertools import combinations

    arrays = []
    for s in range(6):
        base = _base(20 + s)
        arrays.append(base)
        rng = np.random.default_rng(100 + s)
        arrays.append(
            np.clip(base + rng.normal(0, 1.5, base.shape), 0, 255)
        )
    df = _img_df(spark, arrays)
    sigs = {
        r.image_id: r.phash64
        for r in multimodal.perceptual_hash(df).collect()
    }
    want = {
        (a, b)
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 6
    }
    got = {
        (r.id_a, r.id_b)
        for r in multimodal.image_near_dup(df, max_hamming=6).collect()
    }
    assert got == want
    assert len(want) >= 6  # each noisy twin pairs with its base
