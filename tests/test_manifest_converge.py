"""Resume convergence: a pending unit that produces ZERO output rows
still gets a manifest row (rows=0), so replays skip it instead of
re-processing it forever (ADVICE round-1, manifest.py)."""

import pandas as pd
from pyspark.sql import functions as F

from raster_tools_spark import manifest


def test_empty_unit_gets_manifest_row(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    man_dir = str(tmp_path / "man")
    work = spark.createDataFrame(
        pd.DataFrame({"unit": [1, 2, 3], "v": [10, 20, 30]}),
        schema="unit long, v long",
    )

    calls = []

    def process(pending):
        calls.append(pending.count())
        # unit 2 yields no output at all (e.g. all tiles skip-empty)
        return pending.filter(F.col("unit") != 2)

    inc1 = manifest.run_with_manifest(
        spark, work, "unit", process, out_dir, man_dir, "job"
    ).toPandas().set_index("unit")
    assert sorted(inc1.index) == [1, 2, 3]
    assert inc1.loc[2, "rows"] == 0
    assert inc1.loc[1, "rows"] == 1

    # replay: nothing pending -> process not called again
    manifest.run_with_manifest(
        spark, work, "unit", process, out_dir, man_dir, "job"
    )
    assert calls == [3]
