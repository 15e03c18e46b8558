"""spark-submit driver: the flagship tiles+PIP+zonal pipeline, loaded
from the --py-files zip (no repo checkout needed on executors).

Run via scripts/submit_example.sh; prints one JSON line with row
counts and throughput, mirroring bench.py's flagship workload.
"""

import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    spark = SparkSession.builder.appName("raster-tools-spark").getOrCreate()
    from raster_tools_spark import synth
    from raster_tools_spark.operators import pip as op_pip
    from raster_tools_spark.operators import tile as op_tile
    from raster_tools_spark.operators import zonal as op_zonal

    n_images = 5000
    tiles_axis = 256
    images = synth.images_df(spark, n_images, tiles_axis=tiles_axis)
    cells = op_tile.assign_cells(images, tiles_axis=tiles_axis)
    polys = synth.polygons_df(spark, 100, tiles_axis=tiles_axis)

    t0 = time.time()
    pairs = op_pip.pip_join(cells, polys)
    n_pairs = pairs.count()
    zonal = op_zonal.zonal_stats(cells, polys)
    n_feats = zonal.count()
    dt = time.time() - t0

    print(
        json.dumps(
            {
                "images": n_images,
                "pip_pairs": n_pairs,
                "zonal_feats": n_feats,
                "secs": round(dt, 2),
                "tiles_per_sec": round(n_images / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
