"""Query registry: the single source for the driver contract.

Every operator module registers its demonstration queries (and, when
SQL-expressible, the DuckDB oracle) with the ``@query`` decorator;
``__spark_entry__`` just re-exports the collected dicts. Keys are the
operator IDs from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: modules that register queries on import
_MODULES = (
    "lake_satellite_image_etl_spark.plans.entry_queries",
    "lake_satellite_image_etl_spark.plans.pipeline",
    "lake_satellite_image_etl_spark.operators.filters",
    "lake_satellite_image_etl_spark.operators.joins",
    "lake_satellite_image_etl_spark.operators.aggregates",
    "lake_satellite_image_etl_spark.operators.topk",
    "lake_satellite_image_etl_spark.operators.setops",
    "lake_satellite_image_etl_spark.operators.incremental",
    "lake_satellite_image_etl_spark.operators.windows",
    "lake_satellite_image_etl_spark.operators.dedup",
    "lake_satellite_image_etl_spark.operators.similarity",
    "lake_satellite_image_etl_spark.operators.geometry",
    "lake_satellite_image_etl_spark.operators.sampling",
    "lake_satellite_image_etl_spark.functions.scalars",
    "lake_satellite_image_etl_spark.functions.text",
    "lake_satellite_image_etl_spark.functions.vectors",
    "lake_satellite_image_etl_spark.multimodal.raster",
    "lake_satellite_image_etl_spark.multimodal.images",
    "lake_satellite_image_etl_spark.multimodal.audio",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    for mod in _MODULES:
        try:
            import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate only the listed module itself being absent (not
            # built yet) — a broken *transitive* import inside an
            # existing module must raise, or typos would silently drop
            # queries from the driver contract.
            if not (e.name == mod or mod.startswith(e.name + ".")):
                raise
    return QUERIES, ORACLES
