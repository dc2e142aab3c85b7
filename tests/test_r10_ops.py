"""Invariants of the round-10 batch-2 operators beyond the oracle
gate: mergeable aggregate states, exact weighted median on a
hand-checked case, fuzzy-blocking candidate bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_merge_agg_states_is_lossless(spark):
    """Splitting rows arbitrarily and merging the partials must equal
    the single-pass aggregate (the view-maintenance invariant)."""
    from lake_satellite_image_etl_spark.operators.incremental import (
        merge_agg_states,
    )

    rows = [
        ("a", "2024-01", 100), ("a", "2024-01", -30),
        ("a", "2024-02", 7), ("b", "2024-01", 5), ("b", "2024-01", 5),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, month string, c long"
    )

    def state(d):
        return d.groupBy("event_type", "month").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("cents"),
            F.min("c").cast("long").alias("min_cents"),
            F.max("c").cast("long").alias("max_cents"),
        )

    whole = {tuple(r) for r in state(df).collect()}
    s1 = state(df.where(F.col("c") > 0))
    s2 = state(df.where(F.col("c") <= 0))
    merged = {tuple(r) for r in merge_agg_states(s1, s2).collect()}
    assert merged == whole
    # three-way split, one part empty
    s3 = state(df.where(F.lit(False)))
    merged3 = {
        tuple(r) for r in merge_agg_states(s1, s2, s3).collect()
    }
    assert merged3 == whole


def test_weighted_median_hand_case(spark, tmp_path):
    """values 10,20,30 with weights 1,1,3 → cumw 1,2,5, total 5:
    low weighted median = first v with 2*cumw >= 5 → 30. With
    weights 1,2,1: cumw 1,3,4, total 4 → 2*3 >= 4 → 20."""
    from lake_satellite_image_etl_spark.operators.aggregates import (
        agg_weighted_median,
    )

    for weights, want in [((1, 1, 3), 3000), ((1, 2, 1), 2000)]:
        df = spark.createDataFrame(
            [("X", float(v), float(w)) for v, w in zip((10, 20, 30), weights)],
            "l_returnflag string, l_extendedprice double, l_quantity double",
        )
        d = str(tmp_path / f"li_{weights[1]}")
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = agg_weighted_median(spark, d).collect()
        assert [(r[0], r[1]) for r in got] == [("X", want)]


def test_fuzzy_blocking_bounds_candidates(spark):
    """Pairs crossing blocks are never compared, even at distance 1;
    matches inside a block respect the levenshtein threshold."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_fuzzy_blocked,
    )

    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000002"),   # dist 1 from #1, same block
        (3, "Customer#000000013"),   # dist 2 from #1 AND #2, same block
        (4, "Customer#000001001"),   # dist 1 from #1, DIFFERENT block
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    got = {r["c_custkey"]: (r["n_fuzzy"], r["nearest_key"])
           for r in dedup_fuzzy_blocked(spark, d).collect()}
    assert got == {1: (1, 2), 2: (1, 1)}


def test_mann_whitney_identity_and_hand_case(spark, tmp_path):
    """u2_a + u2_b = 2*n_a*n_b always; hand case with ties:
    A = [1, 2], B = [2, 3]: midranks 1, 2.5, 2.5, 4 →
    R_A = 3.5, U_A = R_A - n(n+1)/2 = 0.5 → u2_a = 1, u2_b = 7."""
    from lake_satellite_image_etl_spark.operators.profiling import (
        MWU_GROUP_A,
        MWU_GROUP_B,
        stats_mann_whitney,
    )

    rows = [
        (MWU_GROUP_A, 0.01), (MWU_GROUP_A, 0.02),
        (MWU_GROUP_B, 0.02), (MWU_GROUP_B, 0.03),
        ("other", 99.0),   # must be ignored
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    d = str(tmp_path / "mwu")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    [r] = stats_mann_whitney(spark, d).collect()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["u2_a"], r["u2_b"]) == (1, 7)
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]


def test_contrastive_negatives_exclusions_and_determinism(spark, tmp_path):
    """Every emitted negative differs from its anchor in both id and
    source; at most NEG_PER_ANCHOR slots per anchor; two runs draw
    the identical pair set (hash determinism)."""
    from lake_satellite_image_etl_spark.operators.sampling import (
        NEG_PER_ANCHOR,
        sample_contrastive_negatives,
    )

    rows = [(i, f"src{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    d = str(tmp_path / "neg")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sample_contrastive_negatives(spark, d).collect()
    assert got, "no negatives drawn"
    src = {i: f"src{i % 3}" for i in range(30)}
    per_anchor = {}
    for r in got:
        assert r["neg_id"] != r["anchor_id"]
        assert src[r["neg_id"]] != src[r["anchor_id"]]
        assert 0 <= r["neg_id"] < 30
        per_anchor[r["anchor_id"]] = per_anchor.get(r["anchor_id"], 0) + 1
    assert max(per_anchor.values()) <= NEG_PER_ANCHOR
    again = sample_contrastive_negatives(spark, d).collect()
    key = lambda r: (r["anchor_id"], r["slot"], r["neg_id"])
    assert sorted(map(key, got)) == sorted(map(key, again))


def test_rake_hand_case(spark, tmp_path):
    """'x y the x a z' → candidates [x y], [x], [z]:
    freq x=2, y=1, z=1; deg x=2+1=3, y=2, z=1 →
    scores (×1e6): x=1.5e6, y=2e6, z=1e6;
    phrases: 'x y'=3.5e6, 'x'=1.5e6, 'z'=1e6."""
    from lake_satellite_image_etl_spark.functions.text import (
        text_rake_keyphrases,
    )

    df = spark.createDataFrame(
        [(1, "x y the x a z")], "doc_id long, text string"
    )
    d = str(tmp_path / "rake")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = [
        (r["phrase"], r["n_occurrences"], r["score_scaled"])
        for r in text_rake_keyphrases(spark, d).collect()
    ]
    assert got == [("x y", 1, 3_500_000), ("x", 1, 1_500_000),
                   ("z", 1, 1_000_000)]


def test_k_anonymity_negative_balance_banding(spark, tmp_path):
    """-0.5 and +0.5 balance bands must differ (sign carried), and the
    class-size histogram must account for every customer exactly
    once."""
    from lake_satellite_image_etl_spark.operators.profiling import (
        dq_k_anonymity,
    )

    rows = [
        # nation 1, seg X: 6 customers at ~+1500.00 → one class of 6
        *[(i, 1, 1500.0 + i * 0.001, "X") for i in range(6)],
        # nation 1, seg X but NEGATIVE ~-1500 → separate class of 2
        (10, 1, -1500.0, "X"), (11, 1, -1500.5, "X"),
        # singleton
        (12, 2, 10.0, "Y"),
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_acctbal double,"
        " c_mktsegment string"
    )
    d = str(tmp_path / "kanon")
    df.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    got = {r["class_size"]: (r["n_classes"], r["n_customers"],
                             r["is_anonymous"])
           for r in dq_k_anonymity(spark, d).collect()}
    assert got == {6: (1, 6, True), 2: (1, 2, False), 1: (1, 1, False)}
    assert sum(nc for _, nc, _ in got.values()) == len(rows)


def test_cusum_hand_case(spark, tmp_path):
    """Series [1, 5, 1, 5] over 4 days (T=12, nd=4):
    deviations x*4-12 = [-8, 8, -8, 8] → S' = [0, 8, 0, 8];
    drift iff S' > 12 → never here. A spike day [1,1,1,13] (T=16):
    deviations [-12,-12,-12,36] → S' = [0,0,0,36] → 36 > 16 →
    drift on day 4."""
    import datetime

    from lake_satellite_image_etl_spark.operators.profiling import (
        stats_cusum_drift,
    )

    def run(counts, sub):
        rows = []
        eid = 0
        for i, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid,
                     datetime.datetime(2024, 1, 1 + i, 12, 0, 0),
                     1, "purchase", 1.0)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double",
        )
        d = str(tmp_path / sub)
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = stats_cusum_drift(spark, d).orderBy("day").collect()
        return [(r["n_events"], r["cusum_count_days"], r["is_drift"])
                for r in out]

    assert run([1, 5, 1, 5], "a") == [
        (1, 0, False), (5, 8, False), (1, 0, False), (5, 8, False)]
    assert run([1, 1, 1, 13], "b") == [
        (1, 0, False), (1, 0, False), (1, 0, False), (13, 36, True)]


def test_linear_attribution_conserves_cents(spark):
    """Total credited cents must equal total purchase cents exactly
    (integer remainders assigned, never dropped)."""
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.analytics import (
        analytics_attribution_linear,
    )

    out = analytics_attribution_linear(spark, SF_ORACLE)
    credited = out.agg(F.sum("credited_cents")).collect()[0][0]
    ev = read_table(spark, SF_ORACLE, "events")
    total = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert credited == total, (credited, total)
