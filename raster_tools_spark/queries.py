"""Driver-contract query catalog: Spark implementations + DuckDB oracle
SQL for the operators of SURVEY.md section 2, evaluated on the driver's
tables (/root/testdata/sf*/), plus rows-only spatial/image pipelines on
the deterministic synthetic tables.

Design rules for oracle-checked queries:
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded (4-6 dp) on BOTH sides;
- integer sums cast to BIGINT in DuckDB (its SUM(int) returns HUGEINT);
- timestamps compared as formatted strings (engine-TZ independence);
- synthetic geometry derives from driver columns via exact integer
  arithmetic then dyadic float math, so both engines compute identical
  doubles.

The spatial oracle queries re-derive the SAME grid/PIP math in pure
ANSI SQL (floor arithmetic on the quadtree grid), which checks the
engine's JVM-side cell expressions and the two-phase PIP join --
including the broadcast hot-polygon phase, exercised by nation 3's
oversized rectangle -- against an independent implementation.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import synth, wkb
from .functions import dedup as fdedup
from .functions import similarity as fsim
from .functions import text as ftext
from .operators import knn as op_knn
from .operators import mosaic as op_mosaic
from .operators import pip as op_pip
from .operators import tile as op_tile
from .operators import zonal as op_zonal
from .grid import WORLD_TOP

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col) -> F.Column:
    """Decimal-backed double sum: exact and order-independent, so Spark
    and DuckDB agree bit-for-bit regardless of aggregation order."""
    return F.sum(col.cast("decimal(30,6)")).cast("double")


def _ratio4(num, den) -> F.Column:
    """Deterministic 4-dp ratio: floor-scale instead of round().
    round() implementations disagree between engines on exact .5
    boundaries; floor of the identical quotient double cannot."""
    return F.floor(num / den * 10000.0) / 10000.0


# synthetic point cloud derived from events via exact integer math
_PX = "((event_id * 48271) % 8192) * 64.0 + 32.0"
_PY = f"{WORLD_TOP:.1f} - (((event_id * 69621) % 8192) * 64.0 + 32.0)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").selectExpr(
        "event_id", "value", f"{_PX} as cx", f"{_PY} as cy"
    )


# rectangle layer derived from nation keys (nation 3 is the oversized
# hot polygon driving the broadcast phase)
def _rect_params(n: int):
    rx = (n * 7919) % 56
    ry = (n * 104729) % 56
    w = 163840.0 if n == 3 else (1 + n % 4) * 4096.0
    h = 131072.0 if n == 3 else (1 + n % 3) * 4096.0
    x1 = rx * 8192.0
    y2 = WORLD_TOP - ry * 8192.0
    return x1, x1 + w, y2 - h, y2


def _rect_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    nk = [
        r.n_nationkey
        for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    ]
    rows = []
    for n in sorted(nk):
        x1, x2, y1, y2 = _rect_params(int(n))
        rows.append((int(n), wkb.box_wkb(x1, y1, x2, y2)))
    pdf = pd.DataFrame(rows, columns=["feat_id", "geom_wkb"])
    return spark.createDataFrame(pdf, schema="feat_id long, geom_wkb binary")


_RECT_SQL_CASES_X1 = (
    "CASE WHEN n_nationkey = 3 THEN ((n_nationkey*7919)%56)*8192.0 "
    "ELSE ((n_nationkey*7919)%56)*8192.0 END"
)


def _rects_sql() -> str:
    """DuckDB CTE producing the identical rectangles."""
    return f"""
    rects AS (
      SELECT n_nationkey AS feat_id,
             ((n_nationkey*7919)%56)*8192.0 AS x1,
             ((n_nationkey*7919)%56)*8192.0
               + CASE WHEN n_nationkey = 3 THEN 163840.0
                      ELSE (1 + n_nationkey%4)*4096.0 END AS x2,
             ({WORLD_TOP:.1f} - ((n_nationkey*104729)%56)*8192.0)
               - CASE WHEN n_nationkey = 3 THEN 131072.0
                      ELSE (1 + n_nationkey%3)*4096.0 END AS y1,
             {WORLD_TOP:.1f} - ((n_nationkey*104729)%56)*8192.0 AS y2
      FROM nation
    ),
    pts AS (
      SELECT event_id, value,
             {_PX} AS cx,
             {_PY} AS cy
      FROM events
    )
    """


def _pip_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn(
        "qk_r9", op_tile.cell_col(F.col("cx"), F.col("cy"), 9)
    ).withColumn("image_id", F.col("event_id").cast("string"))
    rects = _rect_polygons(spark, sf_dir)
    pairs = op_pip.pip_join(
        pts, rects, join_res=9, hot_cover=64,
        keep_cols=("image_id", "cx", "cy"), poly_cols=("feat_id",),
    )
    return pairs.select(
        F.col("image_id").cast("long").alias("event_id"), "feat_id"
    )


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- spatial core (oracle-checked) ---------------------------------

    def grid_assign(spark, sf_dir):
        pts = _points(spark, sf_dir)
        return pts.select(
            "event_id",
            op_tile.cell_col(F.col("cx"), F.col("cy"), 9).alias("cell9"),
            op_tile.cell_col(F.col("cx"), F.col("cy"), 10).alias("cell10"),
            op_tile.parent_cell_col(
                op_tile.cell_col(F.col("cx"), F.col("cy"), 9)
            ).alias("cell8"),
        )

    q["grid_assign"] = grid_assign

    def pip_rect(spark, sf_dir):
        return _pip_pairs(spark, sf_dir)

    q["pip_rect"] = pip_rect

    def zonal_rect(spark, sf_dir):
        pairs = _pip_pairs(spark, sf_dir)
        vals = _points(spark, sf_dir).select("event_id", "value")
        return (
            pairs.join(vals, "event_id")
            .groupBy("feat_id")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                _dsum(F.col("value")).alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
                _ratio4(_dsum(F.col("value")), F.count(F.lit(1)))
                .alias("avg_v"),
            )
        )

    q["zonal_rect"] = zonal_rect

    def quad_rollup(spark, sf_dir):
        pts = _points(spark, sf_dir).withColumn(
            "cell10", op_tile.cell_col(F.col("cx"), F.col("cy"), 10)
        )
        out = op_tile.quad_rollup(pts, "cell10", "value", levels=2)
        return out.select(
            F.col("cell").alias("cell8"),
            (F.floor(F.col("value") * 10000.0) / 10000.0).alias("mean_v"),
            F.col("n_px").alias("n"),
        )

    q["quad_rollup"] = quad_rollup

    # ---- relational re-expressions of section 2 operators --------------

    def mosaic_merge(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("cell_id"),
            F.col("l_linenumber").alias("layer"),
            F.when(F.col("l_discount") >= 0.02, F.col("l_quantity"))
            .alias("value"),
        )
        return op_mosaic.merge_last_wins(li)

    q["mosaic_merge"] = mosaic_merge

    def rebase_diff(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        base = li.filter(F.col("l_linenumber") == 1).select(
            F.col("l_orderkey").alias("cell_id"),
            F.col("l_quantity").alias("value"),
        )
        update = li.filter(F.col("l_linenumber") == 2).select(
            F.col("l_orderkey").alias("cell_id"),
            F.col("l_quantity").alias("value"),
        )
        return op_mosaic.rebase(base, update)

    q["rebase_diff"] = rebase_diff

    def reclass_lut(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        part = _t(spark, sf_dir, "part").select(
            "p_partkey",
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_class"),
        )
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("size_class")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                _dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue"),
            )
        )

    q["reclass_lut"] = reclass_lut

    def clamp_filter(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        clamped = ev.select(
            F.when(
                (F.col("value") >= 10.0) & (F.col("value") <= 90.0),
                F.col("value"),
            ).alias("v")
        )
        return clamped.agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("v").alias("n_active"),
            _dsum(F.col("v")).alias("sum_active"),
        )

    q["clamp_filter"] = clamp_filter

    def skip_empty(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.when(F.col("l_discount") >= 0.05, F.col("l_quantity"))
            .alias("v"),
        )
        return (
            li.groupBy("l_orderkey")
            .agg(F.count("v").alias("n_active"))
            .filter(F.col("n_active") > 0)
        )

    q["skip_empty"] = skip_empty

    def antijoin_resume(spark, sf_dir):
        orders = _t(spark, sf_dir, "orders")
        li = _t(spark, sf_dir, "lineitem")
        return orders.join(
            li.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
            "left_anti",
        ).select("o_orderkey", "o_orderstatus")

    q["antijoin_resume"] = antijoin_resume

    def semijoin_aoi(spark, sf_dir):
        cust = _t(spark, sf_dir, "customer")
        orders = _t(spark, sf_dir, "orders")
        return cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_semi",
        ).select("c_custkey", "c_mktsegment")

    q["semijoin_aoi"] = semijoin_aoi

    def interval_class(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        cls = (
            F.when(F.col("value") < 20.0, "low")
            .when(F.col("value") < 60.0, "mid")
            .when(F.col("value") < 90.0, "high")
            .otherwise("extreme")
        )
        return (
            ev.select(cls.alias("cls"), "value")
            .groupBy("cls")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                _dsum(F.col("value")).alias("sum_v"),
            )
        )

    q["interval_class"] = interval_class

    def topk_cells(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        return (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
            .limit(10)
        )

    q["topk_cells"] = topk_cells

    def second_smallest(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        w = Window.partitionBy("l_suppkey").orderBy(
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        return (
            li.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 2)
            .select("l_suppkey", F.col("l_extendedprice").alias("second_price"))
        )

    q["second_smallest"] = second_smallest

    def rank_along_line(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        w = Window.partitionBy("l_orderkey").orderBy(
            F.col("l_quantity").desc(), F.col("l_linenumber").asc()
        )
        return (
            li.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "l_orderkey",
                F.col("l_linenumber").alias("argmax_line"),
                F.col("l_quantity").alias("max_qty"),
            )
        )

    q["rank_along_line"] = rank_along_line

    def histogram(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))

    q["histogram"] = histogram

    def weighted_indicator(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        return (
            li.groupBy("l_orderkey")
            .agg(
                _ratio4(
                    _dsum(F.col("l_quantity") * F.col("l_extendedprice")),
                    _dsum(F.col("l_quantity")),
                ).alias("weighted_price")
            )
        )

    q["weighted_indicator"] = weighted_indicator

    def set_ops(spark, sf_dir):
        orders = _t(spark, sf_dir, "orders")
        a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        b = orders.filter(F.col("o_totalprice") > 100000.0).select("o_custkey")
        return a.intersect(b)

    q["set_ops"] = set_ops

    def dedup_rows(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        return (
            ev.select("user_id", "event_type")
            .distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )

    q["dedup_rows"] = dedup_rows

    def streaming_window_batch(spark, sf_dir):
        ev = _t(spark, sf_dir, "events")
        return (
            ev.withColumn(
                "hour", F.date_format(F.date_trunc("hour", "ts"),
                                      "yyyy-MM-dd HH")
            )
            .groupBy("hour", "event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                _dsum(F.col("value")).alias("sum_v"),
            )
        )

    q["streaming_window_batch"] = streaming_window_batch

    # ---- text / dedup / similarity (training-data pipeline) ------------

    def token_quality(spark, sf_dir):
        return ftext.quality_scores(_t(spark, sf_dir, "documents"))

    q["token_quality"] = token_quality

    def lang_id(spark, sf_dir):
        return ftext.lang_id(_t(spark, sf_dir, "documents"))

    q["lang_id"] = lang_id

    def fingerprint_dedup(spark, sf_dir):
        return fdedup.exact_dedup(_t(spark, sf_dir, "documents"))

    q["fingerprint_dedup"] = fingerprint_dedup

    def ngram_jaccard(spark, sf_dir):
        return fdedup.ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), threshold=0.1
        )

    q["ngram_jaccard"] = ngram_jaccard

    def minhash_lsh(spark, sf_dir):
        return fdedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))

    q["minhash_lsh"] = minhash_lsh

    def cosine_topk(spark, sf_dir):
        emb = _t(spark, sf_dir, "embeddings")
        return fsim.cosine_topk(
            emb.filter(F.col("vec_id") < 8), emb, k=5
        )

    q["cosine_topk"] = cosine_topk

    def running_sum(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        w = (
            Window.partitionBy("l_suppkey")
            .orderBy(
                F.col("l_shipdate").asc(),
                F.col("l_orderkey").asc(),
                F.col("l_linenumber").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast("decimal(30,6)"))
            .over(w)
            .cast("double")
            .alias("running_qty"),
        )

    q["running_sum"] = running_sum

    def topk_per_group(spark, sf_dir):
        cust = _t(spark, sf_dir, "customer")
        w = Window.partitionBy("c_mktsegment").orderBy(
            F.col("c_acctbal").desc(), F.col("c_custkey").asc()
        )
        return (
            cust.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        )

    q["topk_per_group"] = topk_per_group

    def range_join(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        part = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
        joined = li.join(
            F.broadcast(part),
            (F.col("l_quantity") >= F.col("p_size"))
            & (F.col("l_quantity") < F.col("p_size") + 3),
        )
        return joined.groupBy("p_partkey").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    q["range_join"] = range_join

    # ---- rows-only: image/synthetic pipelines (non-SQL-expressible) ----

    def dedup_clusters(spark, sf_dir):
        from .functions import graph

        pairs = fdedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))
        return graph.dedup_clusters(pairs)

    q["dedup_clusters"] = dedup_clusters

    def pip_polygon(spark, sf_dir):
        images = synth.images_df(
            spark, 400, tiles_axis=64, with_pixels=False
        )
        cells = op_tile.assign_cells(images, tiles_axis=64)
        polys = synth.polygons_df(spark, 40, tiles_axis=64)
        return op_pip.pip_join(cells, polys).select("image_id", "feat_id")

    q["pip_polygon"] = pip_polygon

    def zonal_image(spark, sf_dir):
        images = synth.images_df(spark, 250, tiles_axis=32)
        cells = op_tile.assign_cells(images, tiles_axis=32)
        polys = synth.polygons_df(spark, 25, tiles_axis=32)
        return op_zonal.zonal_stats(cells, polys)

    q["zonal_image"] = zonal_image

    def knn_grid(spark, sf_dir):
        pts = _points(spark, sf_dir).withColumn(
            "cell", op_tile.cell_col(F.col("cx"), F.col("cy"), 9)
        ).limit(2000)
        qdf = pts.selectExpr("event_id as qid", "cx", "cy", "cell").limit(100)
        cdf = pts.selectExpr("event_id as cid", "cx", "cy", "cell")
        return op_knn.knn_join(qdf, cdf, k=4, res=9)

    q["knn_grid"] = knn_grid

    def simhash_docs(spark, sf_dir):
        return fdedup.simhash(_t(spark, sf_dir, "documents"))

    q["simhash_docs"] = simhash_docs

    def lsh_ann(spark, sf_dir):
        emb = _t(spark, sf_dir, "embeddings")
        return fsim.lsh_topk(emb, k=5)

    q["lsh_ann"] = lsh_ann

    def image_features(spark, sf_dir):
        from .functions import multimodal

        images = synth.images_df(spark, 200, tiles_axis=32)
        return multimodal.image_features(images)

    q["image_features"] = image_features

    def retile_tiles(spark, sf_dir):
        from .operators import retile as op_retile

        images = synth.images_df(spark, 200, tiles_axis=16)
        cells = op_tile.assign_cells(images, tiles_axis=16)
        return op_retile.retile(cells).select(
            "cell_id", "n_sources", "active_px"
        )

    q["retile_tiles"] = retile_tiles

    def hillshade_tiles(spark, sf_dir):
        from .operators import focal, retile as op_retile

        images = synth.images_df(spark, 150, tiles_axis=8)
        cells = op_tile.assign_cells(images, tiles_axis=8)
        tiles = op_retile.retile(cells).select("cell_id", "bytes", "fmt")
        out = focal.halo_stencil(tiles, focal.hillshade_kernel, margin=1)
        return out.select("cell_id", F.md5(F.col("bytes")).alias("tile_md5"))

    q["hillshade_tiles"] = hillshade_tiles

    def flow_direction(spark, sf_dir):
        import numpy as np

        from . import flow
        from .operators import focal, retile as op_retile

        images = synth.images_df(spark, 120, tiles_axis=8)
        cells = op_tile.assign_cells(images, tiles_axis=8)
        tiles = op_retile.retile(cells).select("cell_id", "bytes", "fmt")

        def kernel(padded):
            return flow.calculate_flow_direction(
                padded.astype(np.float64)
            ).astype(np.uint8)

        out = focal.halo_stencil(tiles, kernel, margin=4)
        return out.select("cell_id", F.md5(F.col("bytes")).alias("dir_md5"))

    q["flow_direction"] = flow_direction

    def flow_accumulation(spark, sf_dir):
        import numpy as np
        import pandas as pd

        from . import codecs as _codecs, flow
        from .operators import retile as op_retile

        images = synth.images_df(spark, 120, tiles_axis=8)
        cells = op_tile.assign_cells(images, tiles_axis=8)
        tiles = op_retile.retile(cells).select("cell_id", "bytes", "fmt")

        def acc(batches):
            for pdf in batches:
                rows = []
                for t in pdf.itertuples():
                    dem = _codecs.decode(bytes(t.bytes), t.fmt).astype(
                        np.float64
                    )
                    flow.fill_simple_depressions(dem)
                    d = flow.calculate_flow_direction(dem)
                    a = flow.accumulate(d)
                    rows.append(
                        (t.cell_id, int(a.max()), float(a.mean()))
                    )
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["cell_id", "max_acc", "mean_acc"]
                    )

        return tiles.mapInPandas(
            acc, schema="cell_id long, max_acc long, mean_acc double"
        )

    q["flow_accumulation"] = flow_accumulation

    def shadow_march(spark, sf_dir):
        from . import shadow as shadow_mod
        from .operators import focal, retile as op_retile

        images = synth.images_df(spark, 120, tiles_axis=8)
        cells = op_tile.assign_cells(images, tiles_axis=8)
        tiles = op_retile.retile(cells).select("cell_id", "bytes", "fmt")
        kern = shadow_mod.shadow_kernel_factory(
            elevation=45.0, m_per_px=1.0, mz=100.0, margin=8
        )
        out = focal.halo_stencil(tiles, kern, margin=8)
        return out.select(
            "cell_id", F.md5(F.col("bytes")).alias("shadow_md5")
        )

    q["shadow_march"] = shadow_march

    def zonal_expr(spark, sf_dir):
        images = synth.images_df(spark, 200, tiles_axis=16)
        cells = op_tile.assign_cells(images, tiles_axis=16)
        polys = synth.polygons_df(spark, 20, tiles_axis=16)
        return op_zonal.zonal_stats(
            cells, polys, expr="clip(v * 2.0, 0, 400)",
            range_frac=(100, 160),
        )

    q["zonal_expr"] = zonal_expr

    def line_drape(spark, sf_dir):
        from .operators import lines as op_lines, retile as op_retile

        images = synth.images_df(spark, 150, tiles_axis=8)
        cells = op_tile.assign_cells(images, tiles_axis=8)
        tiles = op_retile.retile(cells)
        lines_pdf = synth.lines_pdf(30, tiles_axis=8)
        lines_df = spark.createDataFrame(
            lines_pdf, schema="line_id long, geom_wkb binary"
        )
        prof = op_lines.line_profile(lines_df, tiles, step=2.0)
        return op_lines.line_extremum(prof)

    q["line_drape"] = line_drape

    def streaming_parity(spark, sf_dir):
        from .streaming import windows as sw

        return sw.windowed_agg_batch(_t(spark, sf_dir, "events"))

    q["streaming_parity"] = streaming_parity

    def image_resize(spark, sf_dir):
        from .functions import multimodal

        images = synth.images_df(spark, 100, tiles_axis=32)
        return multimodal.resize(images, factor=2).select(
            "image_id", "w", "h"
        )

    q["image_resize"] = image_resize

    return q


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, on the pre-registered driver views)
# ---------------------------------------------------------------------------


def oracle_sql() -> Dict[str, str]:
    o: Dict[str, str] = {}
    top = f"{WORLD_TOP:.1f}"
    R9 = 9 << 56
    R10 = 10 << 56
    R8 = 8 << 56

    o["grid_assign"] = f"""
    WITH pts AS (
      SELECT event_id, {_PX} AS cx, {_PY} AS cy FROM events
    )
    SELECT event_id,
      {R9} + CAST(floor(cx/256.0) AS BIGINT) * 268435456
           + CAST(floor(({top} - cy)/256.0) AS BIGINT) AS cell9,
      {R10} + CAST(floor(cx/128.0) AS BIGINT) * 268435456
            + CAST(floor(({top} - cy)/128.0) AS BIGINT) AS cell10,
      {R8} + CAST(floor(cx/512.0) AS BIGINT) * 268435456
           + CAST(floor(({top} - cy)/512.0) AS BIGINT) AS cell8
    FROM pts
    """

    o["pip_rect"] = f"""
    WITH {_rects_sql()}
    SELECT p.event_id, r.feat_id
    FROM pts p JOIN rects r
      ON p.cx >= r.x1 AND p.cx < r.x2 AND p.cy >= r.y1 AND p.cy < r.y2
    """

    o["zonal_rect"] = f"""
    WITH {_rects_sql()}
    SELECT r.feat_id,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(p.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_v,
           MIN(p.value) AS min_v,
           MAX(p.value) AS max_v,
           floor(CAST(SUM(CAST(p.value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) * 10000.0) / 10000.0 AS avg_v
    FROM pts p JOIN rects r
      ON p.cx >= r.x1 AND p.cx < r.x2 AND p.cy >= r.y1 AND p.cy < r.y2
    GROUP BY r.feat_id
    """

    o["quad_rollup"] = f"""
    WITH pts AS (
      SELECT event_id, value, {_PX} AS cx, {_PY} AS cy FROM events
    )
    SELECT
      {R8} + CAST(floor(cx/512.0) AS BIGINT) * 268435456
           + CAST(floor(({top} - cy)/512.0) AS BIGINT) AS cell8,
      floor(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)/COUNT(value) * 10000.0) / 10000.0 AS mean_v,
      COUNT(value) AS n
    FROM pts GROUP BY 1
    """

    o["mosaic_merge"] = """
    WITH t AS (
      SELECT l_orderkey AS cell_id, l_linenumber AS layer,
             CASE WHEN l_discount >= 0.02 THEN l_quantity END AS value
      FROM lineitem
    ), active AS (SELECT * FROM t WHERE value IS NOT NULL)
    SELECT cell_id,
           arg_max(value, layer*1000000.0 + value) AS value,
           MAX(layer) AS top_layer,
           COUNT(*) AS n_layers
    FROM active GROUP BY cell_id
    """

    o["rebase_diff"] = """
    WITH base AS (
      SELECT l_orderkey AS cell_id, l_quantity AS value
      FROM lineitem WHERE l_linenumber = 1
    ), upd AS (
      SELECT l_orderkey AS cell_id, l_quantity AS value
      FROM lineitem WHERE l_linenumber = 2
    )
    SELECT u.cell_id, u.value
    FROM upd u LEFT JOIN base b ON u.cell_id = b.cell_id
    WHERE u.value IS DISTINCT FROM b.value
    """

    o["reclass_lut"] = """
    SELECT CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """

    o["clamp_filter"] = """
    WITH c AS (
      SELECT CASE WHEN value >= 10.0 AND value <= 90.0 THEN value END AS v
      FROM events
    )
    SELECT COUNT(*) AS n_total, COUNT(v) AS n_active,
           CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS sum_active
    FROM c
    """

    o["skip_empty"] = """
    SELECT l_orderkey, COUNT(CASE WHEN l_discount >= 0.05
                                  THEN l_quantity END) AS n_active
    FROM lineitem GROUP BY l_orderkey HAVING n_active > 0
    """

    o["antijoin_resume"] = """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """

    o["semijoin_aoi"] = """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """

    o["interval_class"] = """
    SELECT CASE WHEN value < 20.0 THEN 'low'
                WHEN value < 60.0 THEN 'mid'
                WHEN value < 90.0 THEN 'high'
                ELSE 'extreme' END AS cls,
           COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_v
    FROM events GROUP BY 1
    """

    o["topk_cells"] = """
    SELECT user_id, COUNT(*) AS cnt FROM events
    GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10
    """

    o["second_smallest"] = """
    SELECT l_suppkey, l_extendedprice AS second_price FROM (
      SELECT l_suppkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice ASC, l_orderkey ASC,
                        l_linenumber ASC) AS rn
      FROM lineitem
    ) WHERE rn = 2
    """

    o["rank_along_line"] = """
    SELECT l_orderkey, l_linenumber AS argmax_line,
           l_quantity AS max_qty FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """

    o["histogram"] = """
    SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    """

    o["weighted_indicator"] = """
    SELECT l_orderkey,
           floor(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) * 10000.0) / 10000.0
             AS weighted_price
    FROM lineitem GROUP BY l_orderkey
    """

    o["set_ops"] = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
    """

    o["dedup_rows"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT event_type, COUNT(*) AS n_users FROM d GROUP BY event_type
    """

    o["streaming_window_batch"] = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
           event_type, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_v
    FROM events GROUP BY 1, 2
    """

    o["token_quality"] = """
    SELECT doc_id,
      length(text) AS n_chars_m,
      CASE WHEN length(text) = 0 THEN 0
           ELSE length(text) - length(replace(text, ' ', '')) + 1
      END AS n_tokens,
      ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
            / length(text), 6) AS alpha_ratio,
      ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / (length(text) - length(replace(text, ' ', '')) + 1), 6)
        AS avg_word_len,
      ROUND(CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS stopword_ratio
    FROM documents
    """

    o["lang_id"] = """
    WITH p AS (
      SELECT doc_id, lang,
        CASE WHEN len(list_filter(string_split(text, ' '),
                     t -> t IN ('the','a','of','and','to'))) > 0
             THEN 'en' ELSE 'unk' END AS pred_lang
      FROM documents
    )
    SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY 1, 2
    """

    o["fingerprint_dedup"] = """
    SELECT md5(text) AS fp, MIN(doc_id) AS rep_doc_id,
           COUNT(*) AS n_dupes
    FROM documents GROUP BY 1
    """

    # mirrors functions/dedup.py's default-ON document-frequency guard
    # (max_df = max(16, 0.5 * n_docs)) so the prune itself is
    # oracle-checked, not just the happy path
    _shingles = """
    sh0 AS (
      SELECT DISTINCT doc_id,
        lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS lst FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(lst) - 2)) AS i)
    ),
    shkeep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= GREATEST(16, CAST(floor(
        0.5 * (SELECT COUNT(*) FROM documents)) AS BIGINT))
    ),
    sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0
      JOIN shkeep USING (shingle)
    )
    """

    o["ngram_jaccard"] = f"""
    WITH {_shingles},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.1
    """

    o["minhash_lsh"] = f"""
    WITH {_shingles},
    sig AS (
      SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle))
               AS minhash
      FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, CAST(floor(seed/2.0) AS INT) AS band,
             string_agg(minhash, ',' ORDER BY minhash) AS band_key
      FROM sig GROUP BY 1, 2
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """

    o["running_sum"] = """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty
    FROM lineitem
    """

    o["topk_per_group"] = """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer
    ) WHERE rn <= 3
    """

    o["range_join"] = """
    SELECT p_partkey, COUNT(*) AS cnt
    FROM lineitem JOIN part
      ON l_quantity >= p_size AND l_quantity < p_size + 3
    GROUP BY p_partkey
    """

    o["cosine_topk"] = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < 8),
    c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    scored AS (
      SELECT qid, cid,
        floor(
          list_sum(list_transform(range(1, len(qv)+1),
            i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qv,
               x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(cv,
               x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
          * 1000000.0) / 1000000.0 AS sim
      FROM q CROSS JOIN c WHERE qid != cid
    )
    SELECT qid, cid, sim, rn FROM (
      SELECT qid, cid, sim,
             row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, cid ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """

    return o
