"""SemDeDup quality: the oracle gate proves ``dedup_semantic_cells``
computes its own spec exactly; these tests pin the spec's relationship
to the exact all-pairs baseline at the SAME cosine threshold —
soundness (every flagged dup is a true cosine dup), within-cell
completeness (no same-cell baseline pair is missed), and the measured
cross-cell recall loss that is the price of cluster blocking.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def baseline_pairs(spark):
    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_embedding_cosine,
    )

    return {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, SF_ORACLE).collect()
    }


@pytest.fixture(scope="module")
def semantic(spark):
    from lake_satellite_image_etl_spark.operators.similarity import (
        dedup_semantic_cells,
    )

    return {
        r["vec_id"]: r for r in dedup_semantic_cells(spark, SF_ORACLE).collect()
    }


def test_soundness_every_flagged_dup_is_a_true_dup(semantic, baseline_pairs):
    flagged = [r for r in semantic.values() if r["is_dup"]]
    assert flagged, "fixture produced no semantic dups — threshold drifted"
    for r in flagged:
        assert (r["keeper"], r["vec_id"]) in baseline_pairs
        assert semantic[r["keeper"]]["cell"] == r["cell"]


def test_within_cell_completeness(semantic, baseline_pairs):
    """Every baseline dup pair whose ends share a cell must be caught,
    and the keeper can only be an even-smaller in-cell partner."""
    for a, b in baseline_pairs:
        if semantic[a]["cell"] == semantic[b]["cell"]:
            assert semantic[b]["is_dup"]
            assert semantic[b]["keeper"] <= a


def test_cross_cell_recall(semantic, baseline_pairs):
    """Cluster blocking only ever LOSES cross-cell pairs; the caught
    set is a subset of the baseline's higher-id dup ends, and on the
    fixture the cells retain a usable fraction of them."""
    dup_high = {b for _, b in baseline_pairs}
    caught = {v for v, r in semantic.items() if r["is_dup"]}
    assert caught <= dup_high
    recall = len(caught) / len(dup_high)
    assert recall >= 0.3, f"semantic recall collapsed: {recall:.3f}"


def test_canonical_keep_policy_nonvacuous(spark):
    """dedup_canonical_keep must actually drop something on the
    fixture (a broken pair graph would mark everything keep=True and
    still hash-match a broken oracle) and must keep the LONGEST
    member of every non-trivial cluster."""
    from tests.conftest import SF_ORACLE

    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_canonical_keep,
    )

    rows = dedup_canonical_keep(spark, SF_ORACLE).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    dropped = [r for r in rows if not r["keep"]]
    assert dropped, "no document dropped — pair graph vacuous"
    for members in by_cluster.values():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1
        best = max(members, key=lambda r: (r["doc_len"], -r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def test_incremental_assign_frozen_codebook(spark):
    """The frozen-codebook contract: assigning the new tranche must
    not change what the OLD corpus' codebook is — re-running the
    full-corpus assignment and the incremental one must agree on the
    new vectors' cells whenever the full-corpus codebook was trained
    on everything EXCEPT that the incremental one excludes them from
    training. Here we assert the cheap invariants: every new vector
    gets exactly one cell, cells span > 1 distinct label (geometry
    engaged), and no old vector appears in the output."""
    from tests.conftest import SF_ORACLE

    from lake_satellite_image_etl_spark.operators.similarity import (
        INCR_TRANCHE_MOD,
        similarity_incremental_assign,
    )

    rows = similarity_incremental_assign(spark, SF_ORACLE).collect()
    assert len(rows) == len({r["vec_id"] for r in rows})
    assert all(
        r["vec_id"] % INCR_TRANCHE_MOD == INCR_TRANCHE_MOD - 1 for r in rows
    )
    assert len({r["cell"] for r in rows}) > 1


def test_dedup_recall_eval_meaningful(spark):
    """The eval harness must measure a non-degenerate corpus: ground
    truth exists (else recall divides by zero and the entry is
    vacuous) and the 12x2 banding geometry holds its theoretical
    S-curve floor on it — at jac >= 0.8 the candidate probability is
    1-(1-0.8^2)^12 ~ 0.995, so measured banding recall must be high
    (measured 1.0 on the fixture; floor 0.9 with margin)."""
    from tests.conftest import SF_ORACLE

    from lake_satellite_image_etl_spark.operators.dedup import (
        dq_dedup_recall_eval,
    )

    row = dq_dedup_recall_eval(spark, SF_ORACLE).collect()[0]
    assert row["truth_pairs"] > 0, "no ground-truth pairs — vacuous eval"
    assert row["banding_recall"] >= 0.9, row
    assert 0 < row["candidate_precision"] <= 1.0


def test_dedup_recall_eval_degenerate_corpus_matches_oracle(spark, tmp_path):
    """ADVICE r11: on a DEGENERATE corpus — a single document, so no
    truth pairs AND no candidate pairs exist — the Spark kernel and
    the DuckDB oracle must emit the identical row: counts 0 (not the
    NULL that sum() over an empty union returns) and ratios NULL on
    both sides (NULLIF / guarded division), instead of hash-diverging
    on sum-vs-count(*) and divide-by-zero semantics. Run as a real
    differential comparison, not just a Spark-side shape check."""
    from tools.compare import compare_frames, duckdb_con

    from lake_satellite_image_etl_spark import registry
    from lake_satellite_image_etl_spark.operators.dedup import (
        dq_dedup_recall_eval,
    )

    df = spark.createDataFrame(
        [(1, "a solitary document with no duplicate partner anywhere")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "degen")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    spark_pdf = dq_dedup_recall_eval(spark, d).toPandas()
    [r] = spark_pdf.to_dict("records")
    assert (r["truth_pairs"], r["candidate_pairs"], r["true_positives"]) == (
        0,
        0,
        0,
    ), r

    _, oracles = registry.load_all()
    oracle_pdf = (
        duckdb_con(d).execute(oracles["dq_dedup_recall_eval"]).fetchdf()
    )
    res = compare_frames("dq_dedup_recall_eval[degenerate]", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_cluster_safe_split_prevents_leakage(spark):
    """The point of sample_cluster_safe_split: (a) every near-dup
    cluster lives wholly inside one split; (b) the flat doc-hash
    split WOULD have torn at least one cluster across train and eval
    on this fixture — i.e. the operator prevents a leakage that
    actually occurs, not a hypothetical one; (c) proportions stay
    near the 80/10/10 contract."""
    from tests.conftest import SF_ORACLE

    from lake_satellite_image_etl_spark.operators.sampling import (
        sample_cluster_safe_split,
        sample_train_test_split,
    )

    rows = sample_cluster_safe_split(spark, SF_ORACLE).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())

    flat = {
        r["doc_id"]: r["split"]
        for r in sample_train_test_split(spark, SF_ORACLE).collect()
    }
    members = {}
    for r in rows:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    multi = [m for m in members.values() if len(m) > 1]
    assert multi, "no multi-member clusters — fixture vacuous"
    torn = [m for m in multi if len({flat[d] for d in m}) > 1]
    assert torn, (
        "flat doc-hash split tore no cluster — the cluster-safe "
        "operator would be demonstrating nothing on this fixture"
    )

    frac_train = sum(r["split"] == "train" for r in rows) / len(rows)
    assert 0.6 <= frac_train <= 0.95
