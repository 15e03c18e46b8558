"""Driver contract for the spark-graft builder (PySpark target).

entry: flagship tiles+PIP-join workload on /root/testdata/sf0.001 --
points derived from events anchored on the engine grid, rectangle
polygon layer (incl. one oversized hot polygon), two-phase PIP join,
zonal aggregation.

queries()/oracle_sql(): operator catalog from SURVEY.md section 2 plus
the training-data pipeline (dedup/similarity/text/multimodal); see
raster_tools_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from raster_tools_spark import queries as q

    return q.queries()["zonal_rect"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raster_tools_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from raster_tools_spark import queries as q

    return q.oracle_sql()
