"""Sampled-eval code path for the n² harness exact sides (VERDICT
r12 item 3): `eval_sample_den` turns dq_ann_recall_eval /
dq_knn_recall_eval into |sample|-bounded measurements — the knob the
"runs on a SAMPLE at 100 TB" contract in both docstrings now resolves
to. These tests pin (a) the sampled estimate is close to the full
number on the fixture, (b) the sample is real (strictly fewer
queries/vectors, exact-pair counts = k × sample size), and (c) the
sampled kNN exact side actually switches SHAPE to the distributed
broadcast-stream plan instead of the one-group Arrow gram."""

from __future__ import annotations

from lake_satellite_image_etl_spark.operators.similarity import (
    KNN_K,
    TOP_K,
    dq_ann_recall_eval,
    dq_knn_recall_eval,
)

SF = "/root/testdata/sf0.01"


def _row(df):
    return df.collect()[0].asDict()


def test_ann_recall_sampled_close_to_full(spark):
    full = _row(dq_ann_recall_eval(spark, SF))
    samp = _row(dq_ann_recall_eval(spark, SF, eval_sample_den=2))
    # the sample is a strict, non-empty subset of the query set
    assert 0 < samp["n_queries"] < full["n_queries"]
    # both sides are top-k complete over the sampled queries
    assert samp["exact_pairs"] == samp["n_queries"] * TOP_K
    assert samp["ann_pairs"] == samp["n_queries"] * TOP_K
    # unbiased-estimate contract: fixture values 0.85 vs 0.88
    assert abs(samp["recall_at_k"] - full["recall_at_k"]) <= 0.08


def test_knn_recall_sampled_close_to_full(spark):
    full = _row(dq_knn_recall_eval(spark, SF))
    samp = _row(dq_knn_recall_eval(spark, SF, eval_sample_den=2))
    assert 0 < samp["n_vectors"] < full["n_vectors"]
    assert samp["exact_edges"] == samp["n_vectors"] * KNN_K
    # graph side filtered to the same sampled vec_ids, still k-complete
    assert samp["graph_edges"] == samp["n_vectors"] * KNN_K
    # fixture: 0.808805 sampled vs 0.806667 full
    assert abs(samp["graph_recall"] - full["graph_recall"]) <= 0.05


def test_knn_sampled_is_deterministic(spark):
    a = _row(dq_knn_recall_eval(spark, SF, eval_sample_den=3))
    b = _row(dq_knn_recall_eval(spark, SF, eval_sample_den=3))
    assert a == b


def test_knn_sampled_exact_side_is_distributed(spark):
    """The sampled path must NOT be the one-group Arrow gram (that
    shape collects the corpus into a single Arrow batch — right at
    fixture scale, unshippable at 100 TB): it streams candidates
    through mapInPandas against the collected bounded sample. The
    full path keeps the gram."""
    sampled_plan = dq_knn_recall_eval(
        spark, SF, eval_sample_den=2
    )._jdf.queryExecution().executedPlan().toString()
    # the only FlatMapGroupsInPandas in EITHER plan is the registered
    # graph KERNEL's per-cell gram (production path, unchanged): the
    # sampled exact side streams candidates through MapInPandas, and
    # since r16 (VERDICT r15 item 3) the FULL exact side is a
    # MapInPandas stream too — query rows over a hash repartition
    # against the broadcast id-sorted corpus matrix, instead of the
    # single-task one-group gram that drew the per-core throttling
    # lottery.
    full_plan = dq_knn_recall_eval(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert full_plan.count("FlatMapGroupsInPandas") == sampled_plan.count(
        "FlatMapGroupsInPandas"
    )
    assert "MapInPandas" in sampled_plan
    assert "MapInPandas" in full_plan


def test_knn_sampled_cap_trips(spark):
    """The collected sample is a bounded model artifact: past
    EVAL_SAMPLE_CAP the harness must refuse loudly, not collect."""
    import pytest

    from lake_satellite_image_etl_spark.operators import similarity

    old = similarity.EVAL_SAMPLE_CAP
    similarity.EVAL_SAMPLE_CAP = 10
    try:
        # den=5 (used nowhere else in this session): the sample
        # broadcast memoizes per (path, den) on SUCCESS, so a den
        # another test already built would memo-hit past the
        # monkeypatched cap; a cold den runs the guarded compute —
        # and the raise is NOT memoized, per the memo contract
        with pytest.raises(ValueError, match="EVAL_SAMPLE_CAP|cap 10"):
            dq_knn_recall_eval(spark, SF, eval_sample_den=5).collect()
    finally:
        similarity.EVAL_SAMPLE_CAP = old


def test_dedup_recall_sampled_close_to_full(spark):
    """The dedup eval's `eval_sample_den` (VERDICT r13 item 5): the
    sampled row measures over pairs whose lower doc_id is in the md5
    sample — a strict non-empty subset with recall/precision ε-close
    to the full numbers."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        dq_dedup_recall_eval,
    )

    full = _row(dq_dedup_recall_eval(spark, SF))
    samp = _row(dq_dedup_recall_eval(spark, SF, eval_sample_den=2))
    assert 0 < samp["truth_pairs"] < full["truth_pairs"]
    assert 0 < samp["candidate_pairs"] < full["candidate_pairs"]
    assert (
        abs(samp["banding_recall"] - full["banding_recall"]) <= 0.10
    )
    # precision's denominator is the fixture's ~96-pair candidate
    # set; a 1/2 sample keeps ~48 pairs, and near-dup pairs cluster
    # on shared docs (correlated sampling), so the ε here is the
    # estimator's fixture-scale variance (measured 0.58 vs 0.78),
    # not an accuracy contract — at real corpus sizes the sample is
    # thousands of pairs and the estimate tightens as 1/√n.
    assert (
        abs(samp["candidate_precision"] - full["candidate_precision"])
        <= 0.25
    )


def test_dedup_recall_sampled_is_deterministic(spark):
    from lake_satellite_image_etl_spark.operators.dedup import (
        dq_dedup_recall_eval,
    )

    a = _row(dq_dedup_recall_eval(spark, SF, eval_sample_den=3))
    b = _row(dq_dedup_recall_eval(spark, SF, eval_sample_den=3))
    assert a == b


def test_registered_sampled_siblings_measure_a_real_subset(spark):
    """The REGISTERED den=4 `_sampled` entries (VERDICT r13 item 2)
    must produce a genuine sampled measurement — a strict non-empty
    ~1/4 subset of the full query set, k-complete on both sides,
    recall ε-close to the full number. (Value agreement with DuckDB
    is the oracle gate's job; an earlier form of this test compared
    the sibling against the base call it delegates to — tautological,
    r14 review.) Fixture: kNN 127/500 vectors, recall 0.8058 vs
    0.8067 full; ANN 2/10 queries, 0.90 vs 0.88."""
    from lake_satellite_image_etl_spark.operators.similarity import (
        KNN_K,
        TOP_K,
        dq_ann_recall_eval_sampled,
        dq_knn_recall_eval_sampled,
    )

    full_knn = _row(dq_knn_recall_eval(spark, SF))
    s_knn = _row(dq_knn_recall_eval_sampled(spark, SF))
    assert 0 < s_knn["n_vectors"] < full_knn["n_vectors"]
    frac = s_knn["n_vectors"] / full_knn["n_vectors"]
    assert 1 / 8 <= frac <= 1 / 2  # md5-uniform quarter, 2x slack
    assert s_knn["exact_edges"] == s_knn["n_vectors"] * KNN_K
    assert s_knn["graph_edges"] == s_knn["n_vectors"] * KNN_K
    assert s_knn["hits"] <= s_knn["exact_edges"]
    assert abs(s_knn["graph_recall"] - full_knn["graph_recall"]) <= 0.05

    full_ann = _row(dq_ann_recall_eval(spark, SF))
    s_ann = _row(dq_ann_recall_eval_sampled(spark, SF))
    assert 0 < s_ann["n_queries"] < full_ann["n_queries"]
    assert s_ann["exact_pairs"] == s_ann["n_queries"] * TOP_K
    assert s_ann["ann_pairs"] == s_ann["n_queries"] * TOP_K
    # the fixture keeps 2 of 10 stride-queries, so per-query recall
    # granularity is 0.1 — the ε here is sample-size, not accuracy
    assert abs(s_ann["recall_at_k"] - full_ann["recall_at_k"]) <= 0.25


def test_registered_dedup_sampled_sibling_measures_a_real_subset(spark):
    """The REGISTERED dedup `_sampled` entry (VERDICT r14 item 3,
    completing the item-2 pattern for all three eval harnesses) must
    produce a genuine sampled measurement: a strict non-empty subset
    of the full truth-pair population (pairs whose doc_a md5 bucket
    ≡ 0 mod den), counts internally consistent, and — structurally —
    recall 1.0 whenever the full recall is 1.0, because the sampled
    truth pairs are a subset of the full ones and the candidate side
    is the same banded kernel post-filtered on the same predicate.
    (Value agreement with DuckDB is the oracle gate's job.) Fixture:
    2/25 truth pairs, recall 1.0 vs 1.0."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        dq_dedup_recall_eval,
        dq_dedup_recall_eval_sampled,
    )

    full = _row(dq_dedup_recall_eval(spark, SF))
    s = _row(dq_dedup_recall_eval_sampled(spark, SF))
    assert 0 < s["truth_pairs"] < full["truth_pairs"]
    assert 0 < s["candidate_pairs"] < full["candidate_pairs"]
    assert s["true_positives"] <= s["truth_pairs"]
    assert s["true_positives"] <= s["candidate_pairs"]
    assert s["missed_pairs"] == s["truth_pairs"] - s["true_positives"]
    if full["banding_recall"] == 1.0:
        assert s["banding_recall"] == 1.0


def test_knn_sampled_empty_sample_degrades_gracefully(spark):
    """A den larger than any md5 bucket hits must produce the
    harness family's degenerate row (counts 0, recall NULL), not an
    np.stack crash at construction (r13 review finding)."""
    row = _row(dq_knn_recall_eval(spark, SF, eval_sample_den=10**9))
    assert row == {
        "n_vectors": 0,
        "exact_edges": 0,
        "graph_edges": 0,
        "hits": 0,
        "graph_recall": None,
    }
