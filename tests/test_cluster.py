"""Convergence tests for the label-propagation connected-components
pass behind dedup_cluster_assign (VERDICT r2 flagged the old fixed
4-hop bound: diameter > 4 components got split cluster ids)."""

from __future__ import annotations


def _components(spark, undirected_pairs):
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.operators.dedup import (
        label_propagate_components,
    )

    pairs = spark.createDataFrame(undirected_pairs, "src long, dst long")
    edges = pairs.union(pairs.select(F.col("dst"), F.col("src")))
    return {
        r["node"]: r["label"]
        for r in label_propagate_components(edges).collect()
    }


def test_diameter_six_chain_is_one_cluster(spark):
    """1-2-3-4-5-6-7 (diameter 6) must converge to a single cluster
    labeled by the minimum node — the case a fixed 4-hop unroll
    splits."""
    chain = [(i, i + 1) for i in range(1, 7)]
    labels = _components(spark, chain)
    assert labels == {n: 1 for n in range(1, 8)}


def test_two_components_and_reversed_chain(spark):
    """Min label must flow AGAINST edge orientation too (the input is
    symmetrized), and separate components must keep separate ids."""
    pairs = [(12, 11), (11, 10), (10, 9)] + [(20, 21), (21, 22)]
    labels = _components(spark, pairs)
    assert labels == {9: 9, 10: 9, 11: 9, 12: 9, 20: 20, 21: 20, 22: 20}


def test_round_cap_exhaustion_warns(spark, monkeypatch):
    """Exiting via CLUSTER_MAX_ROUNDS with labels still moving must be
    observable, not silent (ADVICE r3): cap a diameter-6 chain at 2
    rounds and expect the non-convergence RuntimeWarning."""
    import warnings

    from lake_satellite_image_etl_spark.operators import dedup

    monkeypatch.setattr(dedup, "CLUSTER_MAX_ROUNDS", 2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _components(spark, [(i, i + 1) for i in range(1, 7)])
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "not converged" in str(w.message)
        for w in caught
    )
