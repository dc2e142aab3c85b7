"""lake_satellite_image_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL (``kgmcquate/lake-satellite-image-etl``,
see ``/root/reference/src/app/main.py``) as distributed Spark DataFrame
plans, plus the large-scale training-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) the reference's
domain implies at 100 TB scale.

Design principles (see SURVEY.md §7):

* Everything relational is a native DataFrame plan so Catalyst can push
  filters/projections to the parquet scan, reorder joins, and pick
  broadcast vs sort-merge (with AQE at runtime).
* Python only runs inside Arrow-batched pandas UDFs / mapInPandas, and
  only for kernels the built-ins cannot express (raster decode,
  point-in-polygon); every relational filter is applied *before* those
  stages because Catalyst will not push predicates through a UDF.
* No driver-side loops over data: the reference's ThreadPoolExecutor
  fan-out (main.py:493-498) becomes partition parallelism.
"""

from lake_satellite_image_etl_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
