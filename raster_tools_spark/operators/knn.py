"""Grid-partitioned kNN via ring expansion (SURVEY.md J6).

The reference's kNN is a cKDTree over roof points (roof.py:136-158) and
a nearest-part search (upstream.py:185-191) -- single-process.  The
north rule's distributed form: candidates come from the query point's
own grid cell, expanding ring-by-ring until k neighbors are found and
provably correct (the kth distance is within the ring radius already
searched).

Implementation: iterative driver loop over radii; each pass is one
equi-join of unresolved queries x candidate cells + per-query top-k.
Rounds grow the Chebyshev radius geometrically, so a query in a sparse
region costs O(log R) joins, and each join shuffles only the unresolved
queries (shrinking every round).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..grid import cell_edge, disk_cells, pack_cell, unpack_cell


def _disk_udf(radius: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def disk(cell: pd.Series) -> pd.Series:
        return cell.map(lambda c: disk_cells(int(c), radius))

    return disk


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 4,
    res: int = 9,
    max_radius: int = 8,
    query_cols=("qid", "cx", "cy"),
    cand_cols=("cid", "cx", "cy"),
) -> DataFrame:
    """For each query point, the k nearest candidate points.

    ``queries``: (qid, cx, cy, cell) / ``candidates``: (cid, cx, cy,
    cell) with ``cell`` the packed grid cell at ``res``.  Distance is
    Euclidean; self-matches (qid == cid) are NOT excluded -- filter
    upstream if undesired.

    Correctness rule: a result set is final once the kth distance is <=
    ``radius * edge`` -- every unsearched cell lies farther than that.
    """
    edge = cell_edge(res)
    q = queries.select(
        F.col(query_cols[0]).alias("qid"),
        F.col(query_cols[1]).alias("qx"),
        F.col(query_cols[2]).alias("qy"),
        F.col("cell").alias("qcell"),
    )
    c = candidates.select(
        F.col(cand_cols[0]).alias("cid"),
        F.col(cand_cols[1]).alias("nx"),
        F.col(cand_cols[2]).alias("ny"),
        F.col("cell").alias("ccell"),
    )

    unresolved = q
    results = None
    radius = 1
    while radius <= max_radius:
        cand = (
            unresolved.withColumn(
                "probe", F.explode(_disk_udf(radius)(F.col("qcell")))
            )
            .join(c, F.col("probe") == F.col("ccell"))
            .withColumn(
                "dist",
                F.sqrt(
                    (F.col("qx") - F.col("nx")) ** 2
                    + (F.col("qy") - F.col("ny")) ** 2
                ),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("cid").asc()
        )
        topk = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", "qx", "qy", "qcell", "cid", "dist", "rn")
        )
        # final iff k found AND kth distance within the guaranteed ring
        per_q = topk.groupBy("qid").agg(
            F.count(F.lit(1)).alias("found"),
            F.max("dist").alias("kth"),
        )
        guarantee = float(radius) * edge
        done_q = per_q.filter(
            (F.col("found") == k) & (F.col("kth") <= guarantee)
        ).select("qid")
        if radius >= max_radius:
            # last round: accept whatever was found (bounded search)
            done_q = per_q.select("qid")
        batch = topk.join(done_q, "qid", "left_semi").select(
            "qid", "cid", "dist", "rn"
        )
        results = batch if results is None else results.unionByName(batch)
        unresolved = unresolved.join(done_q, "qid", "left_anti")
        unresolved = unresolved.localCheckpoint(eager=True)
        if unresolved.isEmpty():
            break
        radius *= 2
    return results


def knn_brute_force(
    queries_pdf: pd.DataFrame, candidates_pdf: pd.DataFrame, k: int = 4
) -> pd.DataFrame:
    """Test oracle: exact kNN via full distance matrix (numpy)."""
    qx = queries_pdf[["cx", "cy"]].to_numpy()
    cx = candidates_pdf[["cx", "cy"]].to_numpy()
    d = np.sqrt(((qx[:, None, :] - cx[None, :, :]) ** 2).sum(axis=2))
    rows = []
    cids = candidates_pdf["cid"].to_numpy()
    for qi, qid in enumerate(queries_pdf["qid"].to_numpy()):
        order = np.lexsort((cids, d[qi]))[:k]
        for rn, ci in enumerate(order, 1):
            rows.append((qid, cids[ci], float(d[qi, ci]), rn))
    return pd.DataFrame(rows, columns=["qid", "cid", "dist", "rn"])
