"""Zonal statistics: polygon x raster aggregation (SURVEY.md J4 + A1).

Reference semantics (raster_tools/zonal.py:28-123):

- pixels selected by burning the geometry onto the tile grid and keeping
  pixels whose center is inside (zonal.py:80-87);
- ``size``  = all selected pixels, ``count`` = selected pixels with data
  (value != nodata) -- the distinction at zonal.py:95,108-111;
- stats (min/max/mean/median/std/var/p<n>) computed over data pixels.

Spark-first shape (the reference's per-feature loop becomes one job):

1. bbox prejoin on covering cells (J2) pairs images with polygons;
2. ``mapInPandas`` decodes each paired tile ONCE, rasterizes the polygon
   mask, and emits a tiny partial-stats row (count, sum, sumsq, min,
   max, 256-bin histogram) -- the expensive pixel work happens map-side,
   mirroring the reference's blocked partial aggregation
   (ruimtekaart.py:214-233);
3. ``groupBy(feat_id)`` combines partials; exact percentiles come from
   the merged uint8 histogram (bit-exact vs np.percentile, no
   approx_percentile needed because the value domain is u8).

Per-pair partial rows are ~300 bytes vs ~64 KiB of pixels, so the
shuffle moves ~0.5% of the scanned data -- the property that keeps this
plan alive at 100 TB.
"""

from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs, geom
from ..grid import (
    CELL_SIZE,
    JOIN_RES,
    GeoTransform,
    covering_cells,
    n_covering,
)

NODATA_DEFAULT = 255  # dtype-max convention (extract.py:94-99, merge.py:59)


def percentile_from_hist(hist: np.ndarray, q: float) -> float:
    """Exact percentile of u8 data from its 256-bin histogram, matching
    np.percentile's default linear interpolation."""
    n = int(hist.sum())
    if n == 0:
        return float("nan")
    pos = q / 100.0 * (n - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    cum = np.cumsum(hist)
    v_lo = float(np.searchsorted(cum, lo + 1))
    v_hi = float(np.searchsorted(cum, hi + 1))
    return v_lo + (v_hi - v_lo) * (pos - lo)


def _image_cover_udf(res: int):
    """Covering cell ids of an image tile at ``res`` as a pure JVM
    array expression (closed_bottom=False -- pixel centers strictly
    interior).  Bit-for-bit the grid.covering_cells arithmetic
    (floor/ceil on IEEE doubles, same clamps, same pack), but
    whole-stage-codegen instead of an ArrowEvalPython hop: the former
    pandas UDF put a Python round trip on the full image scan of every
    zonal/retile pipeline (measured 2.9 s of flagship zonal's 5.8 s in
    the pre-decode candidate stage).  Returns a builder so call sites
    keep the ``_image_cover_udf(res)(x0, y_top, w, h)`` shape."""
    from ..grid import WORLD_TOP, cell_edge

    edge = float(cell_edge(res))
    n_axis = 1 << (res + 2)

    def cover(x0, y_top, w, h):
        jx1 = F.floor(x0 / F.lit(edge)).cast("long")
        jx2 = F.ceil((x0 + w * F.lit(CELL_SIZE)) / F.lit(edge)).cast(
            "long"
        )
        jy1 = F.floor((F.lit(WORLD_TOP) - y_top) / F.lit(edge)).cast(
            "long"
        )
        jy2 = F.ceil(
            (F.lit(WORLD_TOP) - (y_top - h * F.lit(CELL_SIZE)))
            / F.lit(edge)
        ).cast("long")
        jx2 = F.greatest(jx2, jx1 + 1)
        jy2 = F.greatest(jy2, jy1 + 1)
        jx1 = F.greatest(jx1, F.lit(0).cast("long"))
        jx2 = F.least(jx2, F.lit(n_axis).cast("long"))
        jy1 = F.greatest(jy1, F.lit(0).cast("long"))
        jy2 = F.least(jy2, F.lit(n_axis).cast("long"))
        packed = F.flatten(
            F.transform(
                F.sequence(jy1, jy2 - 1),
                lambda iy: F.transform(
                    F.sequence(jx1, jx2 - 1),
                    lambda ix: F.shiftleft(F.lit(res).cast("long"), 56)
                    .bitwiseOR(F.shiftleft(ix, 28))
                    .bitwiseOR(iy),
                ),
            )
        )
        # fully out-of-world tiles clamp to an empty range; sequence()
        # would count DOWN there, so guard with an empty array
        return F.when(
            (jx2 > jx1) & (jy2 > jy1), packed
        ).otherwise(F.array().cast("array<bigint>"))

    return cover


_PARTIAL_SCHEMA = (
    "feat_id long, size long, cnt long, s double, ss double, "
    "mn double, mx double, hist array<long>, decode_bytes long"
)


def _partials_stream(batches, expr: str | None = None):
    """Streaming partials over candidate pairs sorted by image_id:
    decode each image once (rows of an image are adjacent after
    sortWithinPartitions), parse each polygon's rings once per task.

    Partials are PRE-AGGREGATED per feat_id within the task before
    anything crosses back over Arrow: the finalize step is a pure
    commutative merge (sums, min/max, histogram adds), so collapsing
    the per-pair rows to one row per (task, feat) is result-identical
    while shrinking the Python->JVM return and the partials shuffle
    from O(pairs) rows x 256-long histograms to O(features) rows
    (guide 2.3: aggregate before you shuffle).  The accumulator is
    flushed if it ever exceeds ``_MAX_ACC_FEATS`` distinct features,
    so task memory stays bounded on enormous polygon layers.

    ``expr``: optional whitelisted band expression applied to the
    masked data vector before stats (A8 semantics, rgb_zonal.py:95-98);
    histogram/percentiles are raw-value only (u8 domain)."""
    cur_img = None
    px = None
    gt = None
    n_bytes = 0
    seen: set = set()
    ring_cache: dict = {}
    # feat_id -> [size, cnt, s, ss, mn, mx, hist, decode_bytes]
    acc: dict = {}

    def _flush():
        rows = [
            (fid, a[0], a[1], a[2], a[3],
             a[4] if a[1] else float("nan"),
             a[5] if a[1] else float("nan"),
             a[6], a[7])
            for fid, a in acc.items()
        ]
        acc.clear()
        return pd.DataFrame(
            rows,
            columns=[
                "feat_id", "size", "cnt", "s", "ss", "mn", "mx",
                "hist", "decode_bytes",
            ],
        )

    for pdf in batches:
        if len(pdf) == 0:
            continue
        for t in pdf.itertuples():
            if t.image_id != cur_img:
                cur_img = t.image_id
                px = codecs.decode(bytes(t.bytes), t.fmt)
                gt = GeoTransform(
                    (t.x0, CELL_SIZE, 0.0, t.y_top, 0.0, -CELL_SIZE)
                )
                n_bytes = len(bytes(t.bytes))
                seen = set()
            if t.feat_id in seen:  # pair dup via shared corner cells
                continue
            seen.add(t.feat_id)
            rings = ring_cache.get(t.feat_id)
            if rings is None:
                rings = geom._rings_of(bytes(t.geom_wkb))
                ring_cache[t.feat_id] = rings
            mask = geom.rasterize_mask_rings(
                rings, gt, px.shape[0], px.shape[1]
            )
            size = int(mask.sum())
            if size == 0:
                continue
            vals = px[mask]
            data = vals[vals != t.nodata]
            if data.dtype == np.uint8:
                hist = np.bincount(data, minlength=256).astype(np.int64)
            else:
                # non-u8 band (f4 DEM etc.): exact-histogram
                # percentiles are a u8-domain feature; mean/std/min/max
                # remain exact, median/p75/frac become NaN downstream
                hist = None
            if expr is not None and data.size:
                stat_data = eval_band_expr(expr, data)
            else:
                stat_data = data.astype(np.float64)
            a = acc.get(t.feat_id)
            if a is None:
                a = [0, 0, 0.0, 0.0, math.inf, -math.inf,
                     np.zeros(256, dtype=np.int64), 0]
                acc[t.feat_id] = a
            a[0] += size
            a[1] += int(data.size)
            a[2] += float(stat_data.sum(dtype=np.float64))
            a[3] += float((stat_data.astype(np.float64) ** 2).sum())
            if data.size:
                a[4] = min(a[4], float(stat_data.min()))
                a[5] = max(a[5], float(stat_data.max()))
            if hist is not None:
                a[6] += hist
            a[7] += n_bytes
            if len(acc) >= _MAX_ACC_FEATS:
                yield _flush()
        # batch boundary: keep accumulating (decode state carries over)
    if acc:
        yield _flush()


_MAX_ACC_FEATS = 65536


_EXPR_WHITELIST = {"v", "np", "clip", "sqrt", "log1p", "abs", "minimum",
                   "maximum", "where"}


def eval_band_expr(expr: str, values: np.ndarray) -> np.ndarray:
    """Whitelisted band expression over the masked pixel vector ``v``
    -- the safe re-expression of rgb_zonal's literal eval
    (rgb_zonal.py:95-98).  Only numpy ufuncs from the whitelist and the
    variable ``v`` are visible."""
    import ast

    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in _EXPR_WHITELIST:
            raise ValueError(f"name {node.id!r} not allowed in band expr")
        if isinstance(node, (ast.Attribute, ast.Call)):
            fn = node
            if isinstance(node, ast.Call):
                fn = node.func
            if isinstance(fn, ast.Attribute):
                if not (
                    isinstance(fn.value, ast.Name)
                    and fn.value.id == "np"
                    and fn.attr in _EXPR_WHITELIST
                ):
                    raise ValueError("only np.<whitelisted> calls allowed")
    ns = {"v": values.astype(np.float64), "np": np,
          "clip": np.clip, "sqrt": np.sqrt, "log1p": np.log1p,
          "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
          "where": np.where}
    return np.asarray(eval(compile(tree, "<band_expr>", "eval"), {"__builtins__": {}}, ns))


_FINAL_SCHEMA = (
    "feat_id long, size long, cnt long, mean double, std double, "
    "mn double, mx double, median double, p75 double, "
    "frac_in_range double"
)


def _finalize(pdf: pd.DataFrame, range_frac=None) -> pd.DataFrame:
    feat_id = pdf["feat_id"].iloc[0]
    size = int(pdf["size"].sum())
    cnt = int(pdf["cnt"].sum())
    hist = np.sum(np.stack(pdf["hist"].map(np.asarray)), axis=0)
    frac = float("nan")
    if cnt:
        s = float(pdf["s"].sum())
        ss = float(pdf["ss"].sum())
        mean = s / cnt
        # population std (np.std default, matching getattr(np, 'std'))
        var = max(ss / cnt - mean * mean, 0.0)
        std = math.sqrt(var)
        mn = float(pdf["mn"].min())
        mx = float(pdf["mx"].max())
        if int(hist.sum()) == cnt:
            med = percentile_from_hist(hist, 50.0)
            p75 = percentile_from_hist(hist, 75.0)
        else:  # non-u8 band: no exact histogram
            med = p75 = float("nan")
        if range_frac is not None and int(hist.sum()) == cnt:
            lo, hi = range_frac
            # green-factor style in-range fraction, exact from the u8
            # histogram (green_factor.py:176-193 semantics)
            frac = float(hist[lo : hi + 1].sum()) / cnt
    else:
        mean = std = mn = mx = med = p75 = float("nan")
    return pd.DataFrame(
        [(feat_id, size, cnt, mean, std, mn, mx, med, p75, frac)],
        columns=[
            "feat_id", "size", "cnt", "mean", "std", "mn", "mx",
            "median", "p75", "frac_in_range",
        ],
    )


_RGB_EXPR_WHITELIST = {"r", "g", "b", "np", "mean", "median", "sum",
                       "clip", "sqrt", "abs", "minimum", "maximum",
                       "where", "log1p", "std", "percentile"}


def eval_rgb_expr(expr: str, r, g, b) -> float:
    """AST-whitelisted per-feature calculation over the masked band
    vectors r/g/b (int64) -- the safe re-expression of rgb_zonal's
    ``eval(calculation)`` (rgb_zonal.py:95-98)."""
    import ast

    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in _RGB_EXPR_WHITELIST:
            raise ValueError(f"name {node.id!r} not allowed")
        if isinstance(node, (ast.Attribute, ast.Call)):
            fn = node.func if isinstance(node, ast.Call) else node
            if isinstance(fn, ast.Attribute):
                if not (
                    isinstance(fn.value, ast.Name)
                    and fn.value.id == "np"
                    and fn.attr in _RGB_EXPR_WHITELIST
                ):
                    raise ValueError("only np.<whitelisted> calls allowed")
    ns = {"r": r, "g": g, "b": b, "np": np}
    return float(
        eval(compile(tree, "<rgb_expr>", "eval"), {"__builtins__": {}}, ns)
    )


_RGB_PARTIAL_SCHEMA = (
    "feat_id long, image_id string, r array<long>, g array<long>, "
    "b array<long>"
)
_RGB_FINAL_SCHEMA = "feat_id long, n_px long, result double"


def rgb_zonal(
    images_cells: DataFrame,
    polygons: DataFrame,
    calculation: str,
    join_res: int = JOIN_RES,
    max_area: float = 1000.0,
) -> DataFrame:
    """Multi-band zonal calculation (SURVEY.md S2/A8,
    rgb_zonal.py:57-98): per polygon, evaluate an AST-whitelisted
    expression over the masked (r, g, b) int64 vectors of every
    overlapping RGB tile.  Polygons with area > ``max_area`` are
    skipped (rgb_zonal.py:74-76), as are polygons with no masked
    pixels; partials carry the masked band vectors (features are small
    by the guard) and are concatenated in image_id order so the result
    is partitioning-independent."""
    from .. import geom as _geom

    @F.pandas_udf("double")
    def area_udf(wkb_s: pd.Series) -> pd.Series:
        return wkb_s.map(lambda bb: _geom.area(bytes(bb)))

    polys = polygons.withColumn(
        "_area", area_udf(F.col("geom_wkb"))
    ).filter(F.col("_area") <= max_area).drop("_area")

    img = images_cells.withColumn(
        "icell",
        # explode_outer + null filter below: plain explode infers a
        # size()/isnotnull generate filter that would re-evaluate the
        # whole cover expression per conjunct in the scan stage
        F.explode_outer(
            _image_cover_udf(join_res)(
                F.col("x0"), F.col("y_top"), F.col("w"), F.col("h")
            )
        ),
    ).select(
        "image_id", "bytes", "fmt", "x0", "y_top", "icell"
    ).filter(F.col("icell").isNotNull())

    from .pip import _covering_udf

    pcells = polys.withColumn(
        "pcell", F.explode(_covering_udf(join_res)(F.col("geom_wkb")))
    ).select("feat_id", "geom_wkb", "pcell")
    cand = img.join(
        F.broadcast(pcells), img["icell"] == pcells["pcell"]
    ).select(
        "image_id", "bytes", "fmt", "x0", "y_top", "feat_id", "geom_wkb"
    )

    def partials(batches):
        cur_img = None
        px = None
        gt = None
        seen: set = set()
        for pdf in batches:
            rows = []
            for t in pdf.itertuples():
                if t.image_id != cur_img:
                    cur_img = t.image_id
                    px = codecs.decode(bytes(t.bytes), t.fmt)
                    gt = GeoTransform(
                        (t.x0, CELL_SIZE, 0.0, t.y_top, 0.0, -CELL_SIZE)
                    )
                    seen = set()
                if t.feat_id in seen:
                    continue
                seen.add(t.feat_id)
                mask = geom.rasterize_mask(
                    bytes(t.geom_wkb), gt, px.shape[0], px.shape[1]
                )
                if not mask.any():
                    continue
                sel = px[mask].astype(np.int64)  # (n, 3)
                rows.append(
                    (
                        t.feat_id,
                        t.image_id,
                        sel[:, 0].tolist(),
                        sel[:, 1].tolist(),
                        sel[:, 2].tolist(),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["feat_id", "image_id", "r", "g", "b"],
                )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id")
        r = np.concatenate([np.asarray(v) for v in pdf["r"]])
        g = np.concatenate([np.asarray(v) for v in pdf["g"]])
        b = np.concatenate([np.asarray(v) for v in pdf["b"]])
        if r.size == 0 or not (r.any() or g.any() or b.any()):
            # reference skips empty / all-zero reads
            return pd.DataFrame(columns=["feat_id", "n_px", "result"])
        return pd.DataFrame(
            {
                "feat_id": [int(pdf["feat_id"].iloc[0])],
                "n_px": [int(r.size)],
                "result": [eval_rgb_expr(calculation, r, g, b)],
            }
        )

    parts = cand.mapInPandas(partials, schema=_RGB_PARTIAL_SCHEMA)
    return parts.groupBy("feat_id").applyInPandas(
        finalize, schema=_RGB_FINAL_SCHEMA
    )


_FLOOR_PARTIAL_SCHEMA = "feat_id long, hist array<long>"
_FLOOR_SCHEMA = "feat_id long, ring_px long, floor_75 double"


def floor_level(
    images_cells: DataFrame,
    polygons: DataFrame,
    dist: float = 1.0,
    join_res: int = JOIN_RES,
    nodata: int = NODATA_DEFAULT,
    max_extent: float = 1000.0,
) -> DataFrame:
    """Buffer-ring floor level (SURVEY.md A6, bag2tif.py:83-127): per
    polygon, the 75th percentile of data pixels whose centers fall in
    the ``dist``-meter buffer RING around the geometry.  Geometries
    wider than ``max_extent`` are skipped (bag2tif.py:95-97), as are
    polygons with no data pixel in the ring (reference returns None).

    Same decode-once streaming-partials plan as zonal_stats; the only
    shuffle carries 256-bin histograms.
    """
    from .. import geom as _geom
    from ..grid import covering_cells as _cover

    def cover_udf(res, pad):
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def cover(wkb_s: pd.Series) -> pd.Series:
            out = []
            for b in wkb_s:
                env = _geom.envelope(bytes(b))
                if max(env[1] - env[0], env[3] - env[2]) > max_extent:
                    out.append([])  # reference skips huge geometries
                else:
                    out.append(_cover(env, res, pad=pad))
            return pd.Series(out)

        return cover

    img = images_cells.withColumn(
        "icell",
        # explode_outer + null filter below: plain explode infers a
        # size()/isnotnull generate filter that would re-evaluate the
        # whole cover expression per conjunct in the scan stage
        F.explode_outer(
            _image_cover_udf(join_res)(
                F.col("x0"), F.col("y_top"), F.col("w"), F.col("h")
            )
        ),
    ).select(
        "image_id", "bytes", "fmt", "x0", "y_top", "icell"
    ).filter(F.col("icell").isNotNull())
    pcells = polygons.withColumn(
        "pcell", F.explode(cover_udf(join_res, dist)(F.col("geom_wkb")))
    ).select("feat_id", "geom_wkb", "pcell")
    cand = img.join(
        F.broadcast(pcells), img["icell"] == pcells["pcell"]
    ).select(
        "image_id", "bytes", "fmt", "x0", "y_top", "feat_id", "geom_wkb"
    )

    def partials(batches):
        cur_img = None
        px = None
        gt = None
        seen: set = set()
        ring_cache: dict = {}
        for pdf in batches:
            rows = []
            for t in pdf.itertuples():
                if t.image_id != cur_img:
                    cur_img = t.image_id
                    px = codecs.decode(bytes(t.bytes), t.fmt)
                    gt = GeoTransform(
                        (t.x0, CELL_SIZE, 0.0, t.y_top, 0.0, -CELL_SIZE)
                    )
                    seen = set()
                if t.feat_id in seen:
                    continue
                seen.add(t.feat_id)
                rings = ring_cache.get(t.feat_id)
                if rings is None:
                    rings = geom._rings_of(bytes(t.geom_wkb))
                    ring_cache[t.feat_id] = rings
                mask = _geom.buffer_ring_mask(
                    rings, gt, px.shape[0], px.shape[1], dist
                )
                vals = px[mask]
                data = vals[vals != nodata]
                if data.size == 0:
                    continue
                rows.append(
                    (
                        t.feat_id,
                        np.bincount(data, minlength=256)
                        .astype(np.int64).tolist(),
                    )
                )
            if rows:
                yield pd.DataFrame(rows, columns=["feat_id", "hist"])

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        hist = np.sum(np.stack(pdf["hist"].map(np.asarray)), axis=0)
        cnt = int(hist.sum())
        return pd.DataFrame(
            {
                "feat_id": [int(pdf["feat_id"].iloc[0])],
                "ring_px": [cnt],
                "floor_75": [percentile_from_hist(hist, 75.0)],
            }
        )

    parts = cand.mapInPandas(partials, schema=_FLOOR_PARTIAL_SCHEMA)
    return parts.groupBy("feat_id").applyInPandas(
        finalize, schema=_FLOOR_SCHEMA
    )


def zonal_stats(
    images_cells: DataFrame,
    polygons: DataFrame,
    join_res: int = JOIN_RES,
    nodata: int = NODATA_DEFAULT,
    broadcast_polygons: bool = True,
    expr: str | None = None,
    range_frac=None,
) -> DataFrame:
    """Per-polygon pixel statistics over all overlapping image tiles.

    ``images_cells``: output of tile.assign_cells (needs x0, y_top, w, h,
    bytes, fmt).  Returns one row per feat_id with A1 stats.

    VALUE DOMAINS when ``expr`` is set: mean/std/mn/mx are computed over
    the EXPR-TRANSFORMED pixel values, while median/p75/frac_in_range
    always come from the RAW u8-value histogram (exact u8 percentiles
    are only possible in the raw domain).  One output row therefore
    mixes two domains under a band expression -- consumers needing
    expr-space percentiles must apply the expression upstream of the
    tile encode instead.

    ``broadcast_polygons=True`` (the default; polygon layers are the
    small side in the reference's workloads) broadcast-hash-joins the
    exploded polygon cells, so the IMAGE SIDE IS NEVER SHUFFLED OR
    SORTED: candidate pairs stream out of the scan with all pairs of an
    image contiguous (the explode+BHJ preserves row adjacency), and the
    only shuffle in the whole job is the tiny partial-stats groupBy.
    Set False for huge polygon layers -> shuffle equi-join + explicit
    repartition by image.
    """
    img = images_cells.withColumn(
        "icell",
        # explode_outer + null filter below: plain explode infers a
        # size()/isnotnull generate filter that would re-evaluate the
        # whole cover expression per conjunct in the scan stage
        F.explode_outer(
            _image_cover_udf(join_res)(
                F.col("x0"), F.col("y_top"), F.col("w"), F.col("h")
            )
        ),
    ).select(
        "image_id", "bytes", "fmt", "x0", "y_top", "w", "h", "icell"
    ).filter(F.col("icell").isNotNull())

    # one Python pass for envelope + covering cells (the pip operator's
    # consolidated meta UDF; hot_cover unbounded -- zonal has no
    # broadcast hot phase, every polygon enumerates its cells)
    from .pip import _poly_meta_udf

    # checkpoint the meta BEFORE field extraction: the broadcast build
    # and every extracted field otherwise re-run the pandas UDF (same
    # fix as pip_join's polygon meta)
    pcells = polygons.withColumn(
        "_pm", _poly_meta_udf(join_res, 1 << 30)(F.col("geom_wkb"))
    ).localCheckpoint(eager=False).select(
        "feat_id", "geom_wkb",
        F.explode("_pm.cells").alias("pcell"),
        F.col("_pm.ex1").alias("_ex1"), F.col("_pm.ex2").alias("_ex2"),
        F.col("_pm.ey1").alias("_ey1"), F.col("_pm.ey2").alias("_ey2"),
    )

    # candidate pairs; pair dedup happens inside the streaming UDF --
    # an image/polygon pair can arise from up to 4 shared corner cells.
    # The JVM-side predicate drops pairs BEFORE they pay a decode +
    # rasterize in the pandas stage.  It tests the PIXEL-CENTER
    # lattice against the envelope, not raw tile bounds: mask pixels
    # are center-inside, and centers sit CELL_SIZE/2 inside the tile
    # edge, so a tile merely TOUCHING the bbox (the closed-bottom
    # cover row, edge-adjacent tiles) can never contribute a pixel and
    # is dropped exactly, while any tile with a center inside the bbox
    # passes (closed comparisons keep boundary-center ties).
    half = CELL_SIZE * 0.5
    overlap = (
        (F.col("x0") + half <= F.col("_ex2"))
        & (F.col("x0") + F.col("w") * CELL_SIZE - half >= F.col("_ex1"))
        & (F.col("y_top") - F.col("h") * CELL_SIZE + half
           <= F.col("_ey2"))
        & (F.col("y_top") - half >= F.col("_ey1"))
    )
    if broadcast_polygons:
        cand = img.join(
            F.broadcast(pcells),
            (img["icell"] == pcells["pcell"]) & overlap,
        )
    else:
        cand = img.join(
            pcells, (img["icell"] == pcells["pcell"]) & overlap
        )
    cand = cand.select(
        "image_id", "bytes", "fmt", "x0", "y_top", "w", "h",
        "feat_id", "geom_wkb",
    ).withColumn("nodata", F.lit(nodata))

    if not broadcast_polygons:
        # shuffle path: co-locate and order pairs per image so the
        # streaming UDF still decodes each tile exactly once
        n_parts = images_cells.sparkSession.sparkContext.defaultParallelism
        cand = cand.repartition(n_parts, "image_id").sortWithinPartitions(
            "image_id"
        )
    partials = cand.mapInPandas(
        lambda it: _partials_stream(it, expr=expr), schema=_PARTIAL_SCHEMA
    )
    return (
        partials.groupBy("feat_id")
        .applyInPandas(
            lambda pdf: _finalize(pdf, range_frac=range_frac),
            schema=_FINAL_SCHEMA,
        )
    )
