"""Distinct-count sketching: the KMV (K Minimum Values) estimator.

The classic mergeable cardinality sketch (Bar-Yossef et al. 2002;
the bottom-k form of theta sketches): hash every value to a uniform
fraction, keep only the k smallest hashes per group, and estimate
|distinct| = (k-1) / kth_smallest_fraction.  Unlike HLL
implementations the estimate is a pure deterministic function of the
md5 hashes, so a SQL engine reproduces it BIT-EXACTLY -- which makes
the sketch itself oracle-checkable, not just its error bound.

Scale shape: one shuffle (rank within group by hash), k rows kept per
group, groups never materialize their full distinct sets.  Groups
with fewer than k distinct values return the EXACT count (the
estimator's standard small-set exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmv_distinct(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """Per-``key_col`` distinct-count estimate of ``val_col`` via a
    k-minimum-values sketch.  Returns (key, n_kept, estimate) where
    estimate is floor-scaled to 6 dp; n_kept < k certifies the exact
    branch.  The hash fraction is the first 15 hex chars of
    md5(value) over 16^15 -- exactly reproducible in any engine with
    md5."""
    h = F.conv(
        F.substring(F.md5(F.col(val_col).cast("string")), 1, 15),
        16, 10,
    ).cast("double") / float(16 ** 15)
    hashed = df.select(
        F.col(key_col).alias("key"), h.alias("h")
    ).dropDuplicates(["key", "h"])
    w = Window.partitionBy("key").orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return kept.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.floor(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            ).otherwise((k - 1) / F.max("h"))
            * 1000000.0
        ).alias("est_e6"),
    ).select(
        "key", "n_kept",
        (F.col("est_e6") / 1000000.0).alias("estimate"),
    )
