"""Bucketed (co-located) joins — the 100 TB shuffle-elimination
primitive (SURVEY.md §4 'Join reordering / strategy', build plan
phase 5).

A fact-to-fact equi-join normally shuffles BOTH sides on the join key
every query. Writing the tables bucketed (``bucketBy(n, key)`` +
``sortBy(key)``) pre-partitions them on disk once; any later join on
the bucket key scans co-located buckets and sort-merge-joins with NO
Exchange in the plan (asserted in tests/test_bucketing.py). At 100 TB
this converts the dominant per-query cost — shuffling the fact table —
into a one-time write cost, which is the standard layout for
repeatedly-joined fact tables (orders ⨝ lineitem here; catalog ⨝
images in the reference's domain).

Rules for the layout to pay off:
- both sides bucketed by the SAME key into the SAME bucket count;
- one file per bucket (repartition before write) or Spark re-sorts;
- bucket count sized so one bucket of the larger table fits an
  executor's memory at target scale (e.g. 100 TB / 4096 buckets ≈
  25 GB per bucket pre-compression — size up accordingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed+sorted by the join key (one file per
    bucket via repartition, so later scans need no re-sort)."""
    (
        df.repartition(n_buckets, bucket_key)
        .write.mode(mode)
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two co-bucketed tables — plans as a SortMergeJoin over
    the bucketed scans with no ShuffleExchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
