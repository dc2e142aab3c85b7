"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md E1) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lake_satellite_image_etl_spark.plans import flagship as _flagship

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    q: dict[str, QueryFn] = {}
    q["flagship_catalog"] = _flagship.flagship
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_catalog": _flagship.FLAGSHIP_ORACLE_SQL,
    }
