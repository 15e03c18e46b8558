"""LSH scale parameters: the plane count must grow with the corpus so
expected bucket occupancy stays bounded (VERDICT r2: fixed n_planes=8
made the within-bucket exact join quadratic at large n)."""

import math

from raster_tools_spark.functions.similarity import (
    MAX_PLANES, MIN_PLANES, TARGET_BUCKET_ROWS, derive_n_planes)


def test_small_corpora_keep_min_planes():
    for n in (0, 1, 100, TARGET_BUCKET_ROWS):
        assert derive_n_planes(n) == MIN_PLANES


def test_expected_bucket_occupancy_bounded():
    # until the cap, n / 2^planes <= target for any corpus size
    for exp in range(11, 40):
        n = 2 ** exp
        p = derive_n_planes(n)
        if p < MAX_PLANES:
            assert n / 2 ** p <= TARGET_BUCKET_ROWS, (n, p)
        assert MIN_PLANES <= p <= MAX_PLANES


def test_monotone_in_corpus_size():
    prev = 0
    for exp in range(10, 45):
        p = derive_n_planes(2 ** exp)
        assert p >= prev
        prev = p


def test_matches_oracle_sql_formula():
    # the DuckDB oracle mirrors this formula verbatim; prove the
    # Python and SQL arithmetic agree on a sweep of counts
    import duckdb

    con = duckdb.connect()
    for n in (1, 500, 1024, 1025, 5000, 10**6, 10**9, 10**12):
        got = con.execute(
            f"""SELECT CASE WHEN {n} <= 1024 THEN 8
                 ELSE GREATEST(8, LEAST(32,
                   CAST(ceil(log2({n} / 1024.0)) AS INT))) END"""
        ).fetchone()[0]
        assert got == derive_n_planes(n), n


def test_ivf_centroids_scale_as_sqrt():
    from raster_tools_spark.functions.similarity import derive_n_centroids

    assert derive_n_centroids(0) == 8
    assert derive_n_centroids(64) == 8
    assert derive_n_centroids(10_000) == 100
    assert derive_n_centroids(10**6) == 1000
    # cap: the centroid table must stay driver-collectable
    assert derive_n_centroids(10**12) == 65536
    # per-query candidate work nprobe * n / n_centroids stays O(sqrt n)
    for exp in range(8, 36, 4):
        n = 2**exp
        c = derive_n_centroids(n)
        if c < 65536:
            assert n / c <= 2 * (n ** 0.5) + 8
