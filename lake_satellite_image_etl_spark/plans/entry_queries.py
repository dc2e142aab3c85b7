"""Registers the composed plans with the query registry."""

from __future__ import annotations

from lake_satellite_image_etl_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    flagship,
)
from lake_satellite_image_etl_spark.registry import query

query("flagship_catalog", oracle=FLAGSHIP_ORACLE_SQL)(flagship)
