"""fix_nodata repair operator (reference srtm/fix_nodata.py): the
oracle query checks counts/sums; this checks the byte-level contract
the oracle cannot see -- clean rasters pass through BYTE-IDENTICAL
(the reference leaves clean files untouched on disk), dirty ones
re-encode losslessly."""

import numpy as np

from raster_tools_spark import codecs
from raster_tools_spark.operators import repair as op_repair


def test_skip_and_rewrite(spark):
    clean = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    dirty = np.array([[1.0, -32767.0], [-32767.0, 4.0]], np.float32)
    df = spark.createDataFrame(
        [
            ("a", codecs.rawz_encode(clean), "rawz", 0.0),
            ("b", codecs.rawz_encode(dirty), "rawz", 0.0),
            ("c", codecs.rawz_encode(clean), "rawz", -1.0),
        ],
        "image_id string, bytes binary, fmt string, nodata double",
    )
    out = {r.image_id: r for r in op_repair.fix_nodata(df).collect()}

    # clean + already-on-target nodata: byte-identical passthrough
    assert out["a"].changed == 0 and out["a"].n_fixed == 0
    assert bytes(out["a"].bytes) == codecs.rawz_encode(clean)

    # sentinel pixels rewritten to the new nodata
    assert out["b"].changed == 1 and out["b"].n_fixed == 2
    got = codecs.rawz_decode(bytes(out["b"].bytes))
    assert (got == np.array([[1.0, 0.0], [0.0, 4.0]], np.float32)).all()

    # clean pixels but wrong nodata value: metadata-only rewrite
    assert out["c"].changed == 1 and out["c"].n_fixed == 0
    assert out["c"].nodata == 0.0
    assert (codecs.rawz_decode(bytes(out["c"].bytes)) == clean).all()


def test_i2_dtype_path(spark):
    """The reference's actual SRTM dtype is i2 with the -32767
    sentinel; the rawz path must round-trip it."""
    dirty = np.array([[100, -32767], [7, -32767]], np.int16)
    df = spark.createDataFrame(
        [("s", codecs.rawz_encode(dirty), "rawz", 0.0)],
        "image_id string, bytes binary, fmt string, nodata double",
    )
    r = op_repair.fix_nodata(df).collect()[0]
    got = codecs.rawz_decode(bytes(r.bytes))
    assert got.dtype == np.int16
    assert (got == np.array([[100, 0], [7, 0]], np.int16)).all()
    assert r.n_fixed == 2 and r.changed == 1
