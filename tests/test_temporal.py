"""AS-OF join: inclusive/exclusive semantics, NULL before the first
right row, and the single-shuffle plan shape."""

import datetime as dt

import pandas as pd

from raster_tools_spark.functions import temporal


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", _ts(5)), (2, "a", _ts(10)), (3, "a", _ts(15)),
             (4, "b", _ts(10)), (5, "b", _ts(2))],
            columns=["id", "k", "ts"],
        ),
        schema="id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [("a", _ts(10), 100.0), ("a", _ts(12), 120.0),
             ("b", _ts(3), 30.0)],
            columns=["k", "ts", "rate"],
        ),
        schema="k string, ts timestamp, rate double",
    )
    return left, right


def test_asof_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = {r.id: r.rate for r in temporal.asof_join(
        left, right, "k", "ts", ["rate"]
    ).collect()}
    assert out[1] is None          # before any 'a' rate
    assert out[2] == 100.0         # equal ts matches (inclusive)
    assert out[3] == 120.0         # latest preceding
    assert out[4] == 30.0
    assert out[5] is None          # before the 'b' rate


def test_asof_exclusive(spark):
    left, right = _frames(spark)
    out = {r.id: r.rate for r in temporal.asof_join(
        left, right, "k", "ts", ["rate"], inclusive=False
    ).collect()}
    assert out[2] is None          # equal ts excluded
    assert out[3] == 120.0


def test_asof_is_single_shuffle(spark):
    left, right = _frames(spark)
    plan = temporal.asof_join(left, right, "k", "ts", ["rate"])\
        ._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange on the key, no join operator
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_kmv_sketch_accuracy_and_exact_branch(spark):
    """KMV: exact below k, ~1/sqrt(k) relative error above it, and
    duplicates never inflate the estimate."""
    import pandas as pd

    from raster_tools_spark.functions.sketch import kmv_distinct

    rows = (
        [("small", f"u{i}") for i in range(20)]
        + [("small", "u3")] * 5                      # dups
        + [("big", f"v{i}") for i in range(5000)]
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v"]),
        schema="k string, v string",
    )
    out = {r.key: r for r in kmv_distinct(df, "k", "v", k=64).collect()}
    assert out["small"].n_kept == 20
    assert out["small"].estimate == 20.0             # exact branch
    assert out["big"].n_kept == 64
    # (k-1)/kth-min: ~12.5% rel error at k=64; allow 3 sigma
    assert abs(out["big"].estimate - 5000) / 5000 < 0.4
