"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline.  Dot products via
  JVM-side ``aggregate(zip_with(...))`` higher-order functions -- no
  Python in the loop; candidates restricted by an equi-join key when
  provided.
- LSH-bucketed ANN: deterministic random-hyperplane signs derived from
  (plane, dim) hashes; vectors sharing a signature bucket are compared
  exactly.  The scale path: bucket join replaces the cross join.

Norms are precomputed once per side.  At 10^12 scale the brute-force
path is only for small query sets (it is a broadcast nested-loop of
|Q| x |C|); the LSH path is the default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_q: str = "vec_id",
    id_c: str = "vec_id",
    vec_q: str = "embedding",
    vec_c: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (qid, cid, sim, rn) with sim rounded to 6 dp and
    deterministic tie-break on cid.
    """
    q = queries.select(
        F.col(id_q).alias("qid"), F.col(vec_q).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = candidates.select(
        F.col(id_c).alias("cid"), F.col(vec_c).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("cid"))
    # floor-scale, not round(): engines disagree on decimal-tie
    # rounding of doubles, floor of the identical quotient cannot
    scored = pairs.withColumn(
        "sim",
        F.floor(
            _dot(F.col("qv"), F.col("cv"))
            / (F.col("qn") * F.col("cn"))
            * 1000000.0
        )
        / 1000000.0,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "sim", "rn")
    )


def _ensure_sized(vectors: DataFrame, n_rows: int | None):
    """Sizing count without a second source scan: when the caller
    does not pass ``n_rows``, materialize the input once via an eager
    localCheckpoint so the count and the downstream pipeline share
    one materialization (otherwise a 100-TB corpus is scanned twice
    -- once by the eager count hidden in plan construction, once at
    execution).  localCheckpoint rather than persist: the blocks are
    released by the ContextCleaner when the DataFrame goes out of
    scope, instead of pinning executor storage for the application
    lifetime.  Large-scale callers should pass ``n_rows`` (e.g. from
    table stats) and skip the materialization entirely."""
    if n_rows is not None:
        return vectors, n_rows
    vectors = vectors.localCheckpoint(eager=True)
    return vectors, vectors.count()


TARGET_BUCKET_ROWS = 1024
MIN_PLANES = 8
MAX_PLANES = 32


def derive_n_planes(
    n_rows: int,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
    min_planes: int = MIN_PLANES,
    max_planes: int = MAX_PLANES,
) -> int:
    """Corpus-scaled hyperplane count: enough planes that the EXPECTED
    bucket holds <= ``target_bucket_rows`` vectors (buckets = 2^planes),
    so the within-bucket exact-cosine join stays O(n * target) instead
    of degrading toward O(n^2 / 2^const) at fixed plane count.  The
    formula is mirrored verbatim in the DuckDB oracle SQL
    (GREATEST/LEAST/ceil/log2), so derived counts stay a hard
    cross-engine check."""
    import math

    if n_rows <= target_bucket_rows:
        return min_planes
    return max(
        min_planes,
        min(max_planes,
            math.ceil(math.log2(n_rows / target_bucket_rows))),
    )


def _plane_matrix(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic hyperplane directions from closed-form integer
    arithmetic: w[p,d] = (((p*8191 + d) * 2654435761) mod 2^31) / 2^30
    - 1.0, an exact dyadic rational in [-1, 1).  Crucially this is
    SQL-expressible, so the DuckDB oracle reconstructs the identical
    planes and the bucket assignment is a HARD cross-engine check (the
    previous Philox-keyed planes could only ever be rows-only)."""
    p = np.arange(n_planes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    h = ((p * 8191 + d) * 2654435761) % (1 << 31)
    return h.astype(np.float64) / float(1 << 30) - 1.0


def lsh_band_sigs_udf(n_planes: int, dim: int, n_bands: int):
    """One signature per band; band ``b`` uses plane rows
    [b*n_planes, (b+1)*n_planes) of the shared closed-form matrix
    (minhash-style banding: a pair is a candidate if ANY band
    matches, trading extra candidates for recall)."""
    planes = _plane_matrix(n_bands * n_planes, dim)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        n = len(m)
        out = np.zeros((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            for p in range(n_planes):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(planes.shape[1]):
                    acc += m[:, d] * planes[b * n_planes + p, d]
                out[:, b] |= (acc > 0).astype(np.int64) << p
        return pd.Series(list(out))

    return sigs


def lsh_topk(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    n_bands: int = 2,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: exact cosine within each random-hyperplane bucket.

    ``n_planes=None`` (the default) derives the plane count from the
    corpus size so expected bucket occupancy stays bounded
    (derive_n_planes) -- a fixed plane count makes the within-bucket
    join quadratic at large n.  ``n_bands`` independent plane sets are
    probed and their candidates unioned (minhash-style banding) to
    recover recall lost to the larger plane count.  Pass ``n_rows``
    to skip the sizing count when the caller already knows it.  The
    join is an equi-join on (band, signature) -- the shape that scales
    (shuffle by bucket, no cross join).
    """
    if n_planes is None:
        vectors, n = _ensure_sized(vectors, n_rows)
        n_planes = derive_n_planes(n)
    sigs = lsh_band_sigs_udf(n_planes, dim, n_bands)
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("sigs", sigs(F.col("vec"))).withColumn(
        "n", _norm(F.col("vec"))
    ).select(
        "vid", "vec", "n",
        F.posexplode("sigs").alias("band", "sig"),
    )
    a = v.select(
        F.col("vid").alias("qid"), F.col("vec").alias("qv"),
        F.col("n").alias("qn"), "band", "sig",
    )
    b = v.select(
        F.col("vid").alias("cid"), F.col("vec").alias("cv"),
        F.col("n").alias("cn"), "band", "sig",
    )
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("qid") != F.col("cid"))
        # a pair matching in several bands must be scored once
        .dropDuplicates(["qid", "cid"])
    )
    scored = cand.withColumn(
        "sim",
        F.floor(
            _dot(F.col("qv"), F.col("cv"))
            / (F.col("qn") * F.col("cn"))
            * 1000000.0
        )
        / 1000000.0,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "sim", "rn")
    )


def _centroid_sims_udf(centroids: np.ndarray):
    """Cosine similarity of each vector to every centroid, accumulated
    in explicit dimension order (bit-identical to the oracle's
    list_sum).  Returns an array column of doubles in centroid order."""
    cents = centroids.astype(np.float64)
    cnorms = np.sqrt((cents * cents).sum(axis=1))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def sims(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        n = len(m)
        vnorm = np.zeros(n)
        for d in range(m.shape[1]):
            vnorm += m[:, d] * m[:, d]
        vnorm = np.sqrt(vnorm)
        out = np.empty((n, len(cents)))
        for k in range(len(cents)):
            acc = np.zeros(n)
            for d in range(m.shape[1]):
                acc += m[:, d] * cents[k, d]
            out[:, k] = acc / (vnorm * cnorms[k])
        return pd.Series(list(out))

    return sims


def derive_n_centroids(n_rows: int, min_centroids: int = 8,
                       max_centroids: int = 65536) -> int:
    """IVF list count ~ sqrt(n) (the standard IVF sizing): expected
    list length and probe cost are then both O(sqrt(n)) -- total work
    per query nprobe * n / n_centroids = O(sqrt(n)) instead of O(n).
    The centroid table itself stays collectable on the driver
    (sqrt(10^12) ~= 10^6 rows of a 64-dim vector ~= 256 MB at the
    extreme; cap and shard beyond that)."""
    import math

    if n_rows <= min_centroids * min_centroids:
        return min_centroids
    return max(
        min_centroids,
        min(max_centroids, int(math.isqrt(n_rows))),
    )


def ivf_topk(
    vectors: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: a coarse quantizer (the first ``n_centroids``
    vectors by id -- deterministic sampling) partitions the corpus into
    inverted lists; each query probes its ``nprobe`` nearest lists and
    ranks candidates by exact cosine.  The probe/list join is an
    equi-join on the cluster id -- the IVF shape that scales (shuffle
    by list, never all-pairs); recall < 1 by construction, raise
    ``nprobe`` to trade cost for recall.  ``n_centroids=None`` derives
    sqrt(n) lists (derive_n_centroids); pass ``n_rows`` to skip the
    sizing count."""
    if n_centroids is None:
        vectors, n = _ensure_sized(vectors, n_rows)
        n_centroids = derive_n_centroids(n)
    cents_rows = (
        vectors.select(F.col(id_col).alias("cid_c"),
                       F.col(vec_col).alias("cv"))
        .filter(F.col("cid_c") < n_centroids)
        .orderBy("cid_c")
        .collect()
    )
    centroids = np.stack([np.asarray(r.cv) for r in cents_rows])
    sims = _centroid_sims_udf(centroids)

    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("csims", sims(F.col("vec"))).withColumn(
        "n", _norm(F.col("vec"))
    )

    @F.pandas_udf(T.IntegerType())
    def assign(csims: pd.Series) -> pd.Series:
        m = np.stack(csims.to_numpy())
        return pd.Series(np.argmax(m, axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(csims: pd.Series) -> pd.Series:
        m = np.stack(csims.to_numpy())
        order = np.argsort(-m, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    lists = v.withColumn("cluster", assign(F.col("csims"))).select(
        F.col("vid").alias("cid"), F.col("vec").alias("cv2"),
        F.col("n").alias("cn"), "cluster",
    )
    queries = v.withColumn(
        "cluster", F.explode(probe(F.col("csims")))
    ).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qv"),
        F.col("n").alias("qn"), "cluster",
    )
    # no dedup needed: a candidate lives in exactly ONE inverted
    # list, so a (qid, cid) pair can only arise from the single probe
    # that equals the candidate's cluster
    cand = (
        queries.join(lists, "cluster")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "qv", "qn", "cid", "cv2", "cn")
    )
    scored = cand.withColumn(
        "sim",
        F.floor(
            _dot(F.col("qv"), F.col("cv2"))
            / (F.col("qn") * F.col("cn"))
            * 1000000.0
        )
        / 1000000.0,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "sim", "rn")
    )


def embedding_near_dup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int = 64,
    n_bands: int = 2,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH buckets
    (corpus-scaled plane count, same shape as lsh_topk)."""
    if n_planes is None:
        vectors, n = _ensure_sized(vectors, n_rows)
        n_planes = derive_n_planes(n)
    sigs = lsh_band_sigs_udf(n_planes, dim, n_bands)
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("sigs", sigs(F.col("vec"))).withColumn(
        "n", _norm(F.col("vec"))
    ).select(
        "vid", "vec", "n",
        F.posexplode("sigs").alias("band", "sig"),
    )
    a = v.select(F.col("vid").alias("doc_a"), F.col("vec").alias("va"),
                 F.col("n").alias("na"), "band", "sig")
    b = v.select(F.col("vid").alias("doc_b"), F.col("vec").alias("vb"),
                 F.col("n").alias("nb"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "sim",
            F.floor(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
                * 1000000.0
            )
            / 1000000.0,
        )
        .filter(F.col("sim") >= threshold)
        .select("doc_a", "doc_b", "sim")
    )
