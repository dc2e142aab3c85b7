"""Unit contract of bench.py's calibration merge + normalization
(VERDICT r14 item 4) — pure functions, no Spark, no subprocesses.
The driver and the judge both read `value_normalized` and `spread`
off BENCH_r{N}; this pins the arithmetic those fields come from."""

from __future__ import annotations

import bench


def _cal(groupby, matmul):
    return {
        "jvm_startup_sec": 10.0,
        "spark_groupby_20m_sec": {"min": min(groupby), "max": max(groupby)},
        "numpy_matmul_1500_sec": {"min": min(matmul), "max": max(matmul)},
        "spark_groupby_samples": groupby,
        "numpy_matmul_samples": matmul,
    }


def test_merge_spans_both_runs_and_takes_median_basis():
    pre = _cal([8.0, 1.3, 1.0], [1.2, 0.4, 0.02])
    post = _cal([0.9, 0.65, 0.7], [0.5, 0.03, 0.02])
    m = bench._merge_calibration(pre, post)
    # top-level keys keep the r14 shape, spanning BOTH runs
    assert m["spark_groupby_20m_sec"] == {"min": 0.65, "max": 8.0}
    assert m["numpy_matmul_1500_sec"] == {"min": 0.02, "max": 1.2}
    # spread + basis over WARM samples only (ADVICE r15): the first
    # groupBy sample of each child is the structural fresh-JVM
    # warmup, so it is dropped — warm samples are
    # [1.3, 1.0] + [0.65, 0.7], sorted [0.65, 0.7, 1.0, 1.3]:
    # spread 1.3/0.65, basis index 2 = 1.0
    assert m["spread"] == round(1.3 / 0.65, 2)
    assert m["spread_basis"] == "warm"
    norm = m["normalization"]
    assert norm["basis_groupby_sec"] == 1.0
    assert norm["factor"] == round(bench.NOMINAL_GROUPBY_SEC / 1.0, 4)
    assert m["pre"] is pre and m["post"] is post


def test_merge_empty_and_one_sided():
    assert bench._merge_calibration({}, {}) == {}
    pre = _cal([1.0, 0.8, 0.9], [0.02, 0.02, 0.02])
    m = bench._merge_calibration(pre, {})
    assert m["spark_groupby_20m_sec"] == {"min": 0.8, "max": 1.0}
    assert m["normalization"]["basis_groupby_sec"] == 0.9
    assert "post" not in m


def test_merge_r14_shape_without_sample_lists():
    """A calibration child that predates the sample lists (or a
    truncated payload) still merges: min/max fallback keeps the
    spread, and normalization is simply absent rather than wrong."""
    pre = {
        "spark_groupby_20m_sec": {"min": 1.0, "max": 6.0},
        "numpy_matmul_1500_sec": {"min": 0.02, "max": 1.0},
    }
    m = bench._merge_calibration(pre, {})
    assert m["spark_groupby_20m_sec"] == {"min": 1.0, "max": 6.0}
    assert m["spread"] == 6.0
    assert m["spread_basis"] == "all"
    assert "normalization" not in m


def test_spread_decides_min_of_2_threshold():
    """The isolated min-of-2 trigger reads the merged spread against
    ISOLATED_MIN_OF_2_SPREAD — pin the constant so a silent change
    shows up here."""
    assert bench.ISOLATED_MIN_OF_2_SPREAD == 3.0
    quiet = bench._merge_calibration(
        _cal([0.7, 0.65, 0.68], [0.02, 0.02, 0.02]), {}
    )
    # loud must be loud in the WARM samples (ADVICE r15): a first-
    # sample-only outlier is JVM warmup, not box bimodality, and no
    # longer triggers min-of-2
    loud = bench._merge_calibration(
        _cal([7.0, 6.0, 0.9], [1.2, 0.4, 0.02]), {}
    )
    warmup_only = bench._merge_calibration(
        _cal([8.0, 1.0, 0.9], [0.02, 0.02, 0.02]), {}
    )
    assert warmup_only["spread"] <= bench.ISOLATED_MIN_OF_2_SPREAD
    assert quiet["spread"] <= bench.ISOLATED_MIN_OF_2_SPREAD
    assert loud["spread"] > bench.ISOLATED_MIN_OF_2_SPREAD
