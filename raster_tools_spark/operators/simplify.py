"""Vertex-table geometry operators, pure JVM (zero Python UDFs):
one-pass Visvalingam-Whyatt line simplification and shoelace polygon
centroids.

The reference exposes geometry simplification through OGR
(``raster_tools/vector.py``-family helpers call into GEOS); this
engine re-expresses both as window/aggregate plans over exploded
vertex tables -- the natural Spark shape, because a 100-TB vector
corpus arrives as billions of (feature, seq, x, y) rows and both
operators then need exactly ONE shuffle (hash by feature id) with
every expression inside whole-stage codegen.

Visvalingam here is the single-pass variant: each interior vertex's
effective triangle area (vs its immediate neighbors) is computed once
and vertices below the threshold are dropped together.  The classic
iterative variant recomputes areas after each removal; the one-pass
form is deterministic, embarrassingly parallel, and what you want on
a cluster (iterative VW is inherently sequential per line).  Doubled
areas (``2A``) keep everything in exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def simplify_vw(vertices: DataFrame, threshold2: int) -> DataFrame:
    """One-pass Visvalingam-Whyatt over (line_id, seq, x, y) rows.

    Keeps endpoints plus interior vertices whose doubled triangle
    area ``|cross(prev->cur, prev->next)|`` is >= ``threshold2``.
    Output: (line_id, new_seq, x, y) with new_seq re-densified.
    Plan: one hash shuffle on line_id; lag/lead + filter + row_number
    all run in the same window stage, fully codegen'd.
    """
    w = Window.partitionBy("line_id").orderBy("seq")
    xp, yp = F.lag("x").over(w), F.lag("y").over(w)
    xn, yn = F.lead("x").over(w), F.lead("y").over(w)
    area2 = F.abs(
        (F.col("x") - xp) * (yn - yp) - (xn - xp) * (F.col("y") - yp)
    )
    kept = vertices.withColumn("_a2", area2).filter(
        F.col("_a2").isNull() | (F.col("_a2") >= F.lit(threshold2))
    )
    return kept.select(
        "line_id",
        (F.row_number().over(w) - 1).cast("long").alias("new_seq"),
        "x",
        "y",
    )


def centroids(vertices: DataFrame) -> DataFrame:
    """Shoelace area + centroid over (feat_id, seq, x, y) rings.

    Rings are open (last vertex != first); the wrap-around edge is
    recovered with a full-partition ``first()`` window.  Cross terms
    and their sums are exact int64; the only floating step is the
    final division, which is a single IEEE op on exact integers --
    so results are bit-identical to any engine computing the same
    integer sums (the DuckDB oracle does).

    Output: (feat_id, area double, cx double, cy double), positive
    area for counter-clockwise rings.
    """
    w = Window.partitionBy("feat_id").orderBy("seq")
    wall = (
        Window.partitionBy("feat_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    xn = F.coalesce(F.lead("x").over(w), F.first("x").over(wall))
    yn = F.coalesce(F.lead("y").over(w), F.first("y").over(wall))
    cross = F.col("x") * yn - xn * F.col("y")
    terms = vertices.select(
        "feat_id",
        cross.alias("_cr"),
        ((F.col("x") + xn) * cross).alias("_sx"),
        ((F.col("y") + yn) * cross).alias("_sy"),
    )
    agg = terms.groupBy("feat_id").agg(
        F.sum("_cr").alias("_a2"),
        F.sum("_sx").alias("_gx"),
        F.sum("_sy").alias("_gy"),
    )
    return agg.select(
        "feat_id",
        (F.col("_a2").cast("double") / F.lit(2.0)).alias("area"),
        (F.col("_gx").cast("double")
         / (F.lit(3.0) * F.col("_a2").cast("double"))).alias("cx"),
        (F.col("_gy").cast("double")
         / (F.lit(3.0) * F.col("_a2").cast("double"))).alias("cy"),
    )
