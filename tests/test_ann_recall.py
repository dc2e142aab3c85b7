"""ANN quality: measured recall of the approximate similarity paths.

The oracle gate proves each path computes ITS OWN spec exactly
(deterministic candidates, exact re-rank); recall is the orthogonal
question — how much of the TRUE neighborhood the candidate generation
retains. Two very different regimes, both pinned:

* IVF (label-seeded + one Lloyd refinement, 5 probes) — recall on
  the fixture's brute-force top-5 (weak neighbors, cos ≈ 0.2-0.4) is
  ~0.88; the fixture codebook has only 10 cells, so 5 probes scan
  ~half the corpus here, but the probe fraction is N_PROBE/√n at
  scale (cell count scales, probe logic doesn't).
* Sign-LSH recall is a function of neighbor SIMILARITY: per plane the
  disagreement probability is θ/π, so for the fixture's weak top-5
  (θ ≈ 70-80°) bucket agreement is near-random and recall is
  legitimately tiny even with radius-1 multi-probe (measured 0.08) —
  that is the documented physics of the method, not a bug. For the
  vectors LSH exists to find — the planted near-dups at cos ≈ 0.97
  (θ ≈ 14°, per-plane flip ≈ 0.08) — the pair must land within the
  multi-probe radius almost always; THAT is the load-bearing recall
  and it is asserted high.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_ORACLE


def _topk_pairs(spark, name):
    from lake_satellite_image_etl_spark import registry

    qs, _ = registry.load_all()
    return {
        (r["query_id"], r["candidate_id"])
        for r in qs[name](spark, SF_ORACLE).collect()
    }


@pytest.fixture(scope="module")
def exact_pairs(spark):
    return _topk_pairs(spark, "similarity_topk_bruteforce")


def test_ivf_probe_recall(spark, exact_pairs):
    got = _topk_pairs(spark, "similarity_ivf_probe")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"IVF recall@5 below floor: {recall:.3f}"


def test_ivf_scaled_recall(spark, exact_pairs):
    """The SCALE-geometry IVF entry (320 cells, 32 probes ≈ 10% of
    the corpus scanned vs the 10-cell entry's ~50%) must hold the
    same recall floor — measured 0.88, fully deterministic (integer
    codebook, fixed planes)."""
    got = _topk_pairs(spark, "similarity_ivf_scaled")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"scaled IVF recall@5 below floor: {recall:.3f}"


def test_ivf_pq_composed_recall(spark, exact_pairs):
    """IVF-PQ composition: router recall × ADC+rerank recall.
    Measured 0.86 (router alone 0.88 — the compressed-domain scan
    loses one borderline pair to quantization before the exact
    rerank). Deterministic; floor 0.8."""
    got = _topk_pairs(spark, "similarity_ivf_pq")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"IVF-PQ recall@5 below floor: {recall:.3f}"


def test_lsh_bucketed_weak_neighbor_recall_floor(spark, exact_pairs):
    """Weak-neighbor recall is expected to be small; the floor only
    guards against the candidate join going EMPTY (geometry bug)."""
    got = _topk_pairs(spark, "similarity_lsh_bucketed")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.04, f"LSH weak-neighbor recall collapsed: {recall:.3f}"


SCALE_EMB = "/root/repo/.scratch/sfscale/embeddings.parquet"


def test_lsh_strong_pairs_are_multiprobe_reachable():
    """The load-bearing LSH recall: TRUE near-dup pairs (the scale
    fixture plants 600 at cos ≈ 0.995; the driver fixture's strongest
    pair is only cos 0.51) must land within Hamming distance 1 of each
    other's bucket — reachable by the radius-1 multi-probe — almost
    always (theory at cos 0.995: per-plane flip p = θ/π ≈ 0.032,
    P(Ham ≤ 1) = (1-p)^8 + 8p(1-p)^7 ≈ 0.97)."""
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(SCALE_EMB):
        from tools.gen_scale_fixture import main as gen

        gen()

    from lake_satellite_image_etl_spark.functions.vectors import QUANT
    from lake_satellite_image_etl_spark.operators.similarity import PLANES
    from tools.gen_scale_fixture import N_PLANTED_PAIRS

    tbl = pq.read_table(SCALE_EMB, columns=["embedding"])
    qv = np.round(
        np.array(tbl["embedding"].to_pylist(), dtype=np.float64) * QUANT
    ).astype(np.int64)
    planes = np.array(PLANES, dtype=np.int64)
    bits = (qv @ planes.T >= 0).astype(np.int64)
    buckets = (bits << np.arange(planes.shape[0])).sum(axis=1)

    # planted pairs: the last N_PLANTED_PAIRS vectors are jittered
    # copies of earlier vectors — recover each partner by argmax
    # cosine (unambiguous at cos ≈ 0.995)
    norms = np.sqrt((qv * qv).sum(axis=1).astype(np.float64))
    unit = qv / norms[:, None]
    dst = np.arange(len(qv) - N_PLANTED_PAIRS, len(qv))
    sims = unit[dst] @ unit.T  # (600, n)
    sims[np.arange(len(dst)), dst] = -1.0
    partners = sims.argmax(axis=1)
    assert (sims.max(axis=1) >= 0.98).mean() >= 0.95

    ham = np.array(
        [
            bin(int(buckets[d]) ^ int(buckets[p])).count("1")
            for d, p in zip(dst, partners)
        ]
    )
    reachable = (ham <= 1).mean()
    assert reachable >= 0.85, (
        f"only {reachable:.2f} of planted near-dup pairs within "
        f"multi-probe radius"
    )


def test_pq_adc_recall(spark, exact_pairs):
    """PQ+ADC with the FAISS-standard 8-bit sub-codebooks and a
    40-deep exact re-rank: measured recall@5 = 0.92 on the fixture's
    (weak, cos 0.2-0.4) true neighborhoods. Floor with margin."""
    got = _topk_pairs(spark, "similarity_pq_adc")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.85, f"PQ ADC recall@5 below floor: {recall:.3f}"


@pytest.fixture(scope="module")
def exact_graph_edges(spark):
    """Brute-force kNN graph ground truth: every vector's top-KNN_K
    exact-cosine neighbors over the SAME quantized domain the entry
    computes on (round(x*QUANT) ints), built in numpy."""
    from lake_satellite_image_etl_spark.functions.vectors import QUANT
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.similarity import KNN_K

    rows = (
        read_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.rint(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * QUANT
    ).astype(np.int64)
    nrm = np.sqrt((x * x).sum(1).astype(np.float64))
    cos = (x @ x.T).astype(np.float64) / (nrm[:, None] * nrm[None, :])
    np.fill_diagonal(cos, -np.inf)
    order = np.argsort(-cos, axis=1, kind="stable")[:, :KNN_K]
    return {
        (ids[i], ids[j]) for i in range(len(ids)) for j in order[i]
    }


def test_knn_graph_multiprobe_recall_floor(spark, exact_graph_edges):
    """Graph recall vs the exact all-pairs kNN graph, pinned (r9
    item 1b closed — previously no floor existed for this entry).
    Measured on the sf0.01 fixture: 0.279 single-probe → 0.458
    (probes=2) → 0.690 (probes=4, the registered dial) — multi-probe
    recovers the cross-cell neighbors single-cell restriction misses
    by construction. The absolute level is the documented
    weak-neighbor physics (true fixture neighbors sit at cos 0.2-0.4
    and scatter across the 10-cell codebook near-randomly, same
    regime as the LSH floor test above); the floor pins the
    multi-probe gain with margin."""
    got = _topk_pairs_graph(spark)
    recall = len(got & exact_graph_edges) / len(exact_graph_edges)
    assert recall >= 0.60, f"kNN-graph recall below floor: {recall:.3f}"


def _topk_pairs_graph(spark):
    from lake_satellite_image_etl_spark.operators.similarity import (
        similarity_knn_graph,
    )

    return {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity_knn_graph(spark, SF_ORACLE).collect()
    }


def test_knn_graph_blocked_gram_is_exact(spark, monkeypatch):
    """The hot-cell guard (r9 item 1a): forcing the gram row-block
    down to ~single-row blocks (KNN_GRAM_BLOCK_ELEMS=64 « any cell's
    member count) must reproduce the default output EDGE-FOR-EDGE —
    blocking changes memory shape, never arithmetic. This is the
    skewed-cell scenario: with 64-element blocks every cell behaves
    as if it were past the cap."""
    import lake_satellite_image_etl_spark.operators.similarity as S

    def edge_set():
        return {
            (r["vec_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
            for r in S.similarity_knn_graph(spark, SF_ORACLE).collect()
        }

    base = edge_set()
    monkeypatch.setattr(S, "KNN_GRAM_BLOCK_ELEMS", 64)
    blocked = edge_set()
    assert blocked == base and len(base) > 0


def test_autocells_oracle_geometry_in_sync(spark):
    """similarity_ivf_autocells derives its cell count from the live
    corpus while its DuckDB oracle bakes the derived value for the
    sf0.01 fixture (IVF_AUTO_BITS_SF001). This guard recomputes the
    derivation against the actual fixture — if the fixture ever
    drifts (row count / label count), this fails loudly instead of
    the driver row hash-mismatching mysteriously."""
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.functions.vectors import qvec_of
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.similarity import (
        IVF_AUTO_BITS_SF001,
        derive_seed_bits,
    )

    q = (
        read_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label", qvec_of(F.col("embedding")).alias("qv"))
        .filter(F.col("qv").isNotNull())
    )
    row = q.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("label").alias("l")
    ).collect()[0]
    assert derive_seed_bits(row["n"], row["l"]) == IVF_AUTO_BITS_SF001


def test_ivf_autocells_recall(spark, exact_pairs):
    """Derived-geometry IVF (40 cells at the fixture, 32 probes) must
    hold the same recall floor as the pinned-geometry entries."""
    got = _topk_pairs(spark, "similarity_ivf_autocells")
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"autocells IVF recall@5 below floor: {recall:.3f}"
