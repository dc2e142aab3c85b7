"""Physical-plan assertions for the new operator surface — the
100 TB design claims, checked against what Catalyst actually planned
(same style as test_flagship_plan_is_scale_sane).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_similarity_queries_have_no_cartesian_product(spark):
    """The LSH/banded operators must never plan an all-pairs
    CartesianProduct — candidate generation is an equi-join/groupBy on
    bucket keys (the whole point of the design)."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        dedup_simhash,
    )
    from lake_satellite_image_etl_spark.operators.similarity import (
        similarity_lsh_bucketed,
    )

    for fn in (
        dedup_minhash_lsh,
        dedup_simhash,
        dedup_ngram_jaccard,
        similarity_lsh_bucketed,
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_similarity_broadcasts_query_side(spark):
    from lake_satellite_image_etl_spark.operators.similarity import (
        similarity_topk_bruteforce,
    )

    plan = _plan(similarity_topk_bruteforce(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan


def test_geo_bbox_filter_reaches_scan(spark):
    """The bbox prefilter must be pushed into the parquet scan
    (PushedFilters) — the cheap prune before the exact ray-cast."""
    from lake_satellite_image_etl_spark.operators.geometry import (
        geo_point_in_polygon,
    )

    plan = _plan(geo_point_in_polygon(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    # the source columns of the bbox predicate appear in the pushed set
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "p_retailprice" in pushed or "p_size" in pushed or pushed != ""


def test_centroid_join_is_broadcast(spark):
    from lake_satellite_image_etl_spark.functions.vectors import (
        vector_centroid_cosine,
    )

    plan = _plan(vector_centroid_cosine(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_text_queries_are_single_stage_scans(spark):
    """Narrow text scalars must not shuffle: no Exchange in the plan
    (scan → project only) — they run at scan speed at any scale."""
    from lake_satellite_image_etl_spark.functions.text import (
        text_fingerprint,
        text_quality_score,
        text_tokenize_count,
    )

    for fn in (text_tokenize_count, text_quality_score, text_fingerprint):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "Exchange" not in plan, fn.__name__
