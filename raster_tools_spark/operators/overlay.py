"""Raster-space polygon overlay: union + difference (SURVEY.md O5/J8).

The reference's difference tool (difference.py:41-57) subtracts the
UnionCascaded of layer 2 from every layer-1 feature with OGR/GEOS
boolean ops.  This engine has no GEOS; the Spark-first re-expression
rasterizes both layers onto a shared pixel grid and does the boolean
algebra on masks -- union is a logical OR (free under rasterization),
difference is mask AND NOT.  Outputs are pixel/area statistics (the
engine's mask-space answer; vectorizing the remainder back to polygons
is flow_vec-style chain tracing and out of scope for the reference's
own use, which feeds areas downstream).

Distribution: candidate (cell, feature) pairs come from the standard
covering-cells explode at ``join_res``; each grid cell's window is
rasterized independently (masks never leave the task -- the shuffle
carries per-feature pixel counts only), then counts aggregate by
feature.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geom
from ..grid import GeoTransform, cell_bounds, cell_edge, covering_cells

JOIN_RES_DEFAULT = 9


def _cover_udf(res: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover(wkb_s: pd.Series) -> pd.Series:
        return wkb_s.map(
            lambda b: covering_cells(geom.envelope(bytes(b)), res)
        )

    return cover


def _cell_gt(cell_id: int, pixel: float):
    x1, _, _, y2 = cell_bounds(cell_id)
    return GeoTransform((float(x1), pixel, 0.0, float(y2), 0.0, -pixel))


def mask_difference_area(
    layer1: DataFrame,
    layer2: DataFrame,
    pixel: float = 4.0,
    join_res: int = JOIN_RES_DEFAULT,
) -> DataFrame:
    """Per layer-1 feature: pixels kept after subtracting the union of
    layer 2, on a ``pixel``-meter grid.  Returns (feat_id, total_px,
    kept_px, kept_area)."""
    npx = int(round(cell_edge(join_res) / pixel))

    c1 = layer1.withColumn(
        "cell", F.explode(_cover_udf(join_res)(F.col("geom_wkb")))
    ).select(F.col("feat_id"), F.col("geom_wkb").alias("wkb1"), "cell")
    c2 = layer2.withColumn(
        "cell", F.explode(_cover_udf(join_res)(F.col("geom_wkb")))
    ).select(F.col("geom_wkb").alias("wkb2"), "cell")

    # left join: layer-1 cells with no layer-2 candidate keep all px
    paired = c1.join(c2, "cell", "left")

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cell_id = int(pdf["cell"].iloc[0])
        gt = _cell_gt(cell_id, pixel)
        # burn the layer-2 union ONCE per cell (rasterized union == OR)
        union2 = np.zeros((npx, npx), dtype=bool)
        seen2 = set()
        for b in pdf["wkb2"]:
            if b is None:
                continue
            key = bytes(b)
            if key in seen2:
                continue
            seen2.add(key)
            union2 |= geom.rasterize_mask(key, gt, npx, npx)
        rows = []
        for feat_id, sub in pdf.groupby("feat_id", sort=False):
            m1 = geom.rasterize_mask(
                bytes(sub["wkb1"].iloc[0]), gt, npx, npx
            )
            total = int(m1.sum())
            kept = int((m1 & ~union2).sum())
            rows.append((int(feat_id), total, kept))
        return pd.DataFrame(
            rows, columns=["feat_id", "total_px", "kept_px"]
        )

    per = paired.groupBy("cell").applyInPandas(
        per_cell, schema="feat_id long, total_px long, kept_px long"
    )
    return per.groupBy("feat_id").agg(
        F.sum("total_px").alias("total_px"),
        F.sum("kept_px").alias("kept_px"),
        (F.sum("kept_px") * float(pixel * pixel)).alias("kept_area"),
    )


def mask_union_area(
    layer: DataFrame,
    pixel: float = 4.0,
    join_res: int = JOIN_RES_DEFAULT,
) -> DataFrame:
    """Total area covered by the layer (UnionCascaded semantics:
    overlaps counted once), on a ``pixel``-meter grid.  Returns one row
    (union_px, union_area)."""
    npx = int(round(cell_edge(join_res) / pixel))
    cells = layer.withColumn(
        "cell", F.explode(_cover_udf(join_res)(F.col("geom_wkb")))
    ).select("geom_wkb", "cell")

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cell_id = int(pdf["cell"].iloc[0])
        gt = _cell_gt(cell_id, pixel)
        union = np.zeros((npx, npx), dtype=bool)
        for b in pdf["geom_wkb"]:
            union |= geom.rasterize_mask(bytes(b), gt, npx, npx)
        return pd.DataFrame({"px": [int(union.sum())]})

    per = cells.groupBy("cell").applyInPandas(per_cell, schema="px long")
    return per.agg(
        F.sum("px").alias("union_px"),
        (F.sum("px") * float(pixel * pixel)).alias("union_area"),
    )
