"""Count-min sketch invariants beyond the oracle gate."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_cms_never_underestimates_and_is_tight_for_some_key(spark):
    from lake_satellite_image_etl_spark.operators.sketches import (
        sketch_count_min,
    )

    rows = sketch_count_min(spark, SF_ORACLE).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows), "CMS underestimated"
    # with d=4 rows, at least some keys should estimate exactly
    assert any(r["overcount"] == 0 for r in rows)


def test_loglog_registers_merge_as_max_and_estimate_is_bounded(spark):
    """The LogLog sketch must be a mergeable monoid: registers built
    from two disjoint halves of the stream, merged with max(), must
    equal the registers built from the whole stream — that property is
    what lets 1000 executors (or 30 daily jobs) sketch independently.
    Estimate quality: m=32 gives ~1.04/sqrt(32) ≈ 18% std error; allow
    3 sigma."""
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.sketches import (
        LL_M,
        LL_RMAX,
        sketch_distinct_loglog,
    )

    ev = read_table(spark, SF_ORACLE, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.expr(f"hv div {LL_M}")
    rho = (
        F.when(
            F.col("hv") >= LL_M,
            F.least(F.bit_count((w.bitwiseAND(-w)) - 1) + 1, F.lit(LL_RMAX)),
        )
        .otherwise(0)
        .cast("int")
    )

    def regs(df):
        return {
            (r["event_type"], r["j"]): r["r"]
            for r in df.select(
                "event_type", "user_id", hv.alias("hv")
            )
            .distinct()
            .select(
                "event_type",
                (F.col("hv") % LL_M).alias("j"),
                rho.alias("rho"),
            )
            .groupBy("event_type", "j")
            .agg(F.max("rho").alias("r"))
            .collect()
        }

    whole = regs(ev)
    h1 = regs(ev.filter(F.col("event_id") % 2 == 0))
    h2 = regs(ev.filter(F.col("event_id") % 2 == 1))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole

    out = sketch_distinct_loglog(spark, SF_ORACLE).collect()
    assert out
    for r in out:
        rel = abs(r["estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.55, (r["event_type"], r["estimate"], r["n_exact"])
