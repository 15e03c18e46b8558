"""raster_tools_spark: a PySpark-native spatial-join + tiling engine.

From-scratch re-expression of nens/raster-tools semantics (reference at
/root/reference, cited per-module) over DataFrames of image+caption
tiles: quadtree grid keys, two-phase point-in-polygon joins, zonal
extraction, mosaics, rollups, kNN -- all DataFrame/SQL + Arrow UDFs,
no per-row Python.
"""

__version__ = "0.1.0"
