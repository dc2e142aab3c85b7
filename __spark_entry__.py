"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md E1) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2
(collected from the package registry; keys are operator IDs).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate;
queries without an entry get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lake_satellite_image_etl_spark.plans.flagship import flagship as _flagship
from lake_satellite_image_etl_spark.registry import load_all

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return dict(load_all()[0])


def oracle_sql() -> dict[str, str]:
    return dict(load_all()[1])
