"""Data-profiling operators — the Deequ/Great-Expectations-style
one-pass table summary every ingestion pipeline runs before trusting
a new drop: per-column row/null/distinct counts, numeric extents and
mean, string extents. (The reference has no profiler; this is part of
the large-scale pipeline block, like stats_histogram in
aggregates.py.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

#: profiled columns of ``orders``: (name, kind). Numeric values also
#: get a canonical string form so NULL/distinct accounting is uniform
#: across kinds; o_totalprice goes through DECIMAL(18,2) so the
#: canonical string is engine-independent (raw double→string
#: formatting is not).
PROFILE_COLS = (
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
)


def _sql_melt() -> str:
    parts = []
    for name, kind in PROFILE_COLS:
        if name == "o_totalprice":
            val_str = f"({name}::DECIMAL(18,2))::VARCHAR"
            num_val = name
        elif kind == "num":
            val_str = f"{name}::VARCHAR"
            num_val = f"{name}::DOUBLE"
        else:
            val_str = name
            num_val = "NULL::DOUBLE"
        parts.append(
            f"SELECT '{name}' AS col_name, '{kind}' AS kind, "
            f"{val_str} AS val_str, {num_val} AS num_val FROM orders"
        )
    return " UNION ALL ".join(parts)


@query(
    "profile_table_stats",
    oracle=f"""
    -- one-pass table profile in long form: melt each profiled column
    -- to (col_name, kind, canonical string, numeric value), then one
    -- aggregate per column.
    WITH m AS ({_sql_melt()})
    SELECT col_name,
           count(*) AS n_rows,
           sum(CASE WHEN val_str IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_nulls,
           count(DISTINCT val_str) AS n_distinct,
           round(min(num_val), 2) AS min_num,
           round(max(num_val), 2) AS max_num,
           round(avg(num_val), 6) AS mean_num,
           min(CASE WHEN kind = 'str' THEN val_str END) AS min_str,
           max(CASE WHEN kind = 'str' THEN val_str END) AS max_str
    FROM m GROUP BY col_name
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler — per-column rows / nulls / exact distincts /
    extents / mean for a declared column list, in one aggregation
    pass (the summary a data-quality gate checks before a 100 TB drop
    is admitted downstream).

    Plan: melt-then-aggregate. Each row explodes into |cols| narrow
    (col_name, value) rows BEFORE the shuffle — no per-column scans,
    no Expand from multiple DISTINCT aggregates (one distinct per
    group key instead of k independent distinct columns). The shuffle
    key is col_name (|cols| groups); partial aggregation collapses
    everything except the distinct stream map-side. At 100 TB: one
    scan, shuffle volume ≈ distinct values only; swap
    ``approx_count_distinct`` into the same plan when exact
    cardinality isn't required."""
    o = read_table(spark, sf_dir, "orders")
    structs = []
    for name, kind in PROFILE_COLS:
        if name == "o_totalprice":
            val_str = F.col(name).cast("decimal(18,2)").cast("string")
            num_val = F.col(name)
        elif kind == "num":
            val_str = F.col(name).cast("string")
            num_val = F.col(name).cast("double")
        else:
            val_str = F.col(name)
            num_val = F.lit(None).cast("double")
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.lit(kind).alias("kind"),
                val_str.alias("val_str"),
                num_val.alias("num_val"),
            )
        )
    m = o.select(F.explode(F.array(*structs)).alias("c")).select("c.*")
    return m.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val_str").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.countDistinct("val_str").alias("n_distinct"),
        F.round(F.min("num_val"), 2).alias("min_num"),
        F.round(F.max("num_val"), 2).alias("max_num"),
        F.round(F.avg("num_val"), 6).alias("mean_num"),
        F.min(F.when(F.col("kind") == "str", F.col("val_str"))).alias(
            "min_str"
        ),
        F.max(F.when(F.col("kind") == "str", F.col("val_str"))).alias(
            "max_str"
        ),
    )


@query(
    "dq_check_rules",
    oracle="""
    -- declarative data-quality suite in long form: three row-level
    -- rules evaluated in ONE scan (conditional counts) plus one
    -- referential-integrity rule (anti-join count), each reported as
    -- (rule, n_checked, n_violations, passed).
    WITH rowrules AS (
        SELECT 'totalprice_positive' AS rule, count(*) AS n_checked,
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orderdate_in_range', count(*),
               sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                          OR o_orderdate >= TIMESTAMP '1999-01-01'
                        THEN 1 ELSE 0 END)::BIGINT
        FROM orders
        UNION ALL
        SELECT 'status_in_domain', count(*),
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END)::BIGINT
        FROM orders
    ),
    fk AS (
        SELECT 'custkey_fk_exists' AS rule,
               (SELECT count(*) FROM orders) AS n_checked,
               count(*)::BIGINT AS n_violations
        FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM (SELECT * FROM rowrules UNION ALL SELECT * FROM fk)
    """,
)
def dq_check_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule suite (the Deequ/Great-Expectations check
    stage): three row-level constraints — positivity, date range,
    categorical domain — evaluated as conditional sums in ONE scan of
    the fact table, plus a referential-integrity rule as a left-anti
    join against the dimension's key column. Long-form output, one
    row per rule, so a 100 TB nightly gate is |rules| rows.

    Scale: the row rules cost one pass regardless of rule count
    (they're columns of the same aggregate); the FK rule broadcasts
    the dimension's pruned key column. This composes with
    profile_table_stats (metrics) the way production DQ stacks pair
    profiles with checks."""
    o = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")

    def rule(name: str, viol) -> DataFrame:
        return o.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias(
                "n_violations"
            ),
        )

    rowrules = (
        rule("totalprice_positive", F.col("o_totalprice") <= 0)
        .unionByName(
            rule(
                "orderdate_in_range",
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("1999-01-01").cast("timestamp")
                ),
            )
        )
        .unionByName(
            rule(
                "status_in_domain",
                ~F.col("o_orderstatus").isin("O", "F", "P"),
            )
        )
    )
    n_orders = o.agg(F.count(F.lit(1)).alias("n_checked"))
    fk = (
        o.join(
            F.broadcast(cust.select("c_custkey").distinct()),
            o["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.lit("custkey_fk_exists").alias("rule"),
            "n_checked",
            "n_violations",
        )
    )
    return rowrules.unionByName(fk).select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


#: KS drift split: days 1-15 of the event month vs the rest.
KS_SPLIT_DAY = 16


@query(
    "stats_ks_drift",
    oracle=f"""
    -- two-sample Kolmogorov-Smirnov drift statistic per event type:
    -- value distribution of days < {KS_SPLIT_DAY} vs the rest.
    -- EXACT-INTEGER form: the ECDF gap at value v is
    -- |cum_a*n_b - cum_b*n_a| / (n_a*n_b); the numerator is a BIGINT,
    -- so max() runs over integers and the ONLY floating-point step is
    -- the final correctly-rounded divide — no fp-comparison drift
    -- between engines.
    WITH tagged AS (
        SELECT event_type, value,
               CASE WHEN extract(day FROM ts) < {KS_SPLIT_DAY}
                    THEN 1 ELSE 0 END AS in_a
        FROM events
    ),
    vc AS (
        SELECT event_type, value,
               sum(in_a)::BIGINT AS ca, sum(1 - in_a)::BIGINT AS cb
        FROM tagged GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, value,
               sum(ca) OVER (PARTITION BY event_type ORDER BY value)
                   AS cum_a,
               sum(cb) OVER (PARTITION BY event_type ORDER BY value)
                   AS cum_b,
               sum(ca) OVER (PARTITION BY event_type) AS n_a,
               sum(cb) OVER (PARTITION BY event_type) AS n_b
        FROM vc
    )
    SELECT event_type,
           max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
           max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_scaled,
           round(max(abs(cum_a * n_b - cum_b * n_a))::DOUBLE
                 / (max(n_a) * max(n_b)), 6) AS ks_d
    FROM cum GROUP BY event_type
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift statistic — the distribution-shift monitor a
    production feature/data pipeline runs between time slices (here:
    first half of the month vs the rest, per event type). KS needs the
    max ECDF gap over the merged support; computed in EXACT integers
    (|cum_a·n_b − cum_b·n_a|, divided once at the end) so engines
    agree bit-for-bit.

    Scale shape: one shuffle to the per-(type, value) count table
    (collapses duplicate values), one type-partitioned window over
    that table (sorted within each type partition in parallel; at
    100 TB you pre-bin values to bound the table — the same plan with
    a floor() on the key), one final max per type. No global sort, no
    fp accumulation-order hazards."""
    from pyspark.sql import Window as _W

    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") < KS_SPLIT_DAY, 1)
        .otherwise(0)
        .alias("in_a"),
    )
    vc = tagged.groupBy("event_type", "value").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
    )
    w_cum = (
        _W.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    w_all = _W.partitionBy("event_type").rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing
    )
    cum = vc.select(
        "event_type",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"),
    )
    gap = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return cum.groupBy("event_type").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.max(gap).cast("long").alias("d_scaled"),
        F.round(
            F.max(gap).cast("double") / (F.max("n_a") * F.max("n_b")), 6
        ).alias("ks_d"),
    )


#: robust z-score geometry: |0.6745·(x − med)/MAD| > MAD_Z flags an
#: outlier; folded into one literal bound factor so both engines run
#: the identical op chain (MAD_Z / 0.6745 pre-rounded).
MAD_Z_BOUND = 5.189
#: coarse value bands for the scale-safe exact per-type median ranks.
MAD_BAND = 10.0


@query(
    "stats_robust_anomaly",
    oracle=f"""
    -- robust anomaly detection per event type: exact MEDIAN (avg of
    -- the middle one/two order statistics — no engine-specific
    -- quantile interpolation), MAD (median absolute deviation, same
    -- construction over |x − med|), and the count of robust-z
    -- outliers (|x − med| > {MAD_Z_BOUND} * MAD). The
    -- median-of-medians chain is all rank arithmetic + one two-term
    -- average, so both engines agree bit-for-bit.
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS rnk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type, max(n) AS n, avg(value) AS med
        FROM r WHERE rnk IN ((n - 1) // 2, n // 2)
        GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, abs(e.value - m.med) AS adev, e.event_id,
               m.med, m.n
        FROM events e JOIN med m USING (event_type)
    ),
    r2 AS (
        SELECT event_type, adev, med, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY adev, event_id) - 1 AS rnk
        FROM d
    ),
    mad AS (
        SELECT event_type, max(n) AS n, max(med) AS med,
               avg(adev) AS mad
        FROM r2 WHERE rnk IN ((n - 1) // 2, n // 2)
        GROUP BY event_type
    )
    SELECT d.event_type, max(mad.n) AS n,
           round(max(mad.med), 6) AS median,
           round(max(mad.mad), 6) AS mad,
           sum(CASE WHEN d.adev > {MAD_Z_BOUND} * mad.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def stats_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (median/MAD, the outlier monitor that
    doesn't blow up on its own outliers like mean/std does): per event
    type, the exact median, the median absolute deviation, and the
    robust-z outlier count at |x − med| > {MAD_Z_BOUND}·MAD.

    Scale shape: the oracle's per-type rank windows sort a whole type
    in one task; the engine computes the SAME order statistics with
    the banded decomposition — coarse {MAD_BAND}-wide value bands give
    a bounded (type, band) count table, its per-type cumulative
    offsets broadcast back, row_number runs within (type, band) in
    parallel — run twice (values, then deviations). Medians come from
    selecting the two middle ranks, never from sorting a partition."""
    from pyspark.sql import Window as _W

    ev = read_table(spark, sf_dir, "events")

    def banded_middle(df, valcol: str, keep_cols: list[str]):
        """avg of the middle one/two order statistics of `valcol` per
        event_type, via the banded global-rank decomposition."""
        banded = df.withColumn(
            "band", F.floor(F.col(valcol) / MAD_BAND)
        )
        counts = banded.groupBy("event_type", "band").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w_off = (
            _W.partitionBy("event_type")
            .orderBy("band")
            .rowsBetween(_W.unboundedPreceding, -1)
        )
        w_all = _W.partitionBy("event_type").rowsBetween(
            _W.unboundedPreceding, _W.unboundedFollowing
        )
        offs = counts.select(
            "event_type",
            "band",
            F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        w_tie = _W.partitionBy("event_type", "band").orderBy(
            valcol, "event_id"
        )
        ranked = banded.join(F.broadcast(offs), ["event_type", "band"]).select(
            "event_type",
            valcol,
            "n",
            *keep_cols,
            (F.row_number().over(w_tie) - 1 + F.col("off")).alias("rnk"),
        )
        mid = ranked.filter(
            (F.col("rnk") == F.expr("(n - 1) div 2"))
            | (F.col("rnk") == F.expr("n div 2"))
        )
        return mid.groupBy("event_type").agg(
            F.max("n").alias("n"), F.avg(valcol).alias("mid")
        )

    med = banded_middle(ev.select("event_type", "event_id", "value"), "value", [])
    d = (
        ev.select("event_type", "event_id", "value")
        .join(F.broadcast(med.select("event_type", F.col("mid").alias("med"))), "event_type")
        .withColumn("adev", F.abs(F.col("value") - F.col("med")))
    )
    mad = banded_middle(
        d.select("event_type", "event_id", "adev"), "adev", []
    ).select("event_type", "n", F.col("mid").alias("mad"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("med"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > MAD_Z_BOUND * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "profile_dedup_summary",
    oracle="""
    -- per-source duplication report — the dashboard number a corpus
    -- team watches per ingest: how many docs, how many distinct
    -- contents (md5), the duplicate rate, and the largest duplicate
    -- cluster per source.
    WITH h AS (
        SELECT source, md5(text) AS ch FROM documents
    ),
    g AS (
        SELECT source, ch, count(*)::BIGINT AS n FROM h GROUP BY 1, 2
    )
    SELECT source,
           sum(n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_distinct,
           (sum(n) - count(*))::BIGINT AS n_dup_docs,
           round((sum(n) - count(*))::DOUBLE / sum(n), 6) AS dup_rate,
           max(n)::BIGINT AS max_cluster
    FROM g GROUP BY source
    """,
)
def profile_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report — the summary view over
    `dedup_exact_hash`'s groups that an ingest dashboard actually
    shows: document count, distinct contents, duplicate rate, and the
    largest duplicate cluster, per source.

    Scale shape: one groupBy on (source, content-hash) — the shuffle
    carries (hash, count) pairs, never text — then a |sources|-row
    rollup. Same plan skeleton as dedup_exact_hash with the reporting
    aggregation on top."""
    docs = read_table(spark, sf_dir, "documents")
    g = (
        docs.select("source", F.md5("text").alias("ch"))
        .groupBy("source", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n"), 6
        ).alias("dup_rate"),
        F.max("n").cast("long").alias("max_cluster"),
    )


#: Benford expected first-digit frequencies log10(1 + 1/d), inlined
#: as literals so neither engine's log implementation is in the
#: comparison path
BENFORD_EXPECTED = {
    d: round(math.log10(1 + 1 / d), 8) for d in range(1, 10)
}
_SQL_BENFORD_CASE = "CASE " + " ".join(
    f"WHEN digit = {d} THEN {p}" for d, p in BENFORD_EXPECTED.items()
) + " END"


@query(
    "dq_benford_first_digit",
    oracle=f"""
    -- Benford's-law audit over order totals: the classic
    -- fabricated-data / aggregation-bug detector — natural
    -- multi-scale amounts follow P(d) = log10(1 + 1/d); a flat or
    -- spiked first-digit histogram flags synthetic or truncated
    -- values. First digit via INTEGER string math (floor then
    -- leading character) so no engine log/format call is in the
    -- comparison path; expected frequencies are inlined literals.
    WITH d AS (
        SELECT CAST(substring(CAST(floor(o_totalprice)::BIGINT
                                   AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::BIGINT AS total FROM c)
    SELECT c.digit, c.n,
           round(c.n::DOUBLE / t.total, 6) AS observed_frac,
           {_SQL_BENFORD_CASE} AS expected_frac,
           round(c.n::DOUBLE / t.total - ({_SQL_BENFORD_CASE}), 6)
               AS deviation
    FROM c CROSS JOIN t
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    forensic data-quality check that catches fabricated amounts,
    unit-mixups, and truncation bugs: naturally-occurring multi-scale
    values follow P(d) = log10(1+1/d), so a flat histogram (synthetic
    uniform data — as here) or a spike at one digit is a red flag the
    profiler surfaces per digit as observed-vs-expected deviation.

    Scale shape: one narrow integer map (floor → leading digit) and a
    9-row aggregate with map-side combine; the total is a 1-row
    broadcast. Runs at scan speed on any table size — the cheapest
    audit in the DQ suite."""
    ords = read_table(spark, sf_dir, "orders")
    expected = F.create_map(
        *[
            x
            for d, p in BENFORD_EXPECTED.items()
            for x in (F.lit(d), F.lit(p))
        ]
    )
    d = ords.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("observed_frac"),
            expected[F.col("digit")].alias("expected_frac"),
            F.round(
                F.col("n") / F.col("total") - expected[F.col("digit")], 6
            ).alias("deviation"),
        )
    )


#: chi² contribution scale: contributions are reported as
#: floor(contrib * 10^6) in exact integer arithmetic.
CHI2_SCALE = 10**6


@query(
    "stats_chi2_independence",
    oracle=f"""
    -- Pearson chi-squared test of independence between order priority
    -- and lineitem return flag, in EXACT integers (the stats_ks_drift
    -- rule): per cell, with diff = obs*N - r*c (BIGINT), the
    -- contribution (obs-E)^2/E with E = r*c/N equals
    -- diff^2 / (N*r*c); scaled by {CHI2_SCALE} and floor-divided in
    -- 128-bit so both engines agree bit-for-bit. The expected count
    -- is reported as floor(r*c*{CHI2_SCALE}/N).
    WITH joined AS (
        SELECT o.o_orderpriority AS pri, l.l_returnflag AS mode
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    obs AS (SELECT pri, mode, count(*)::BIGINT AS n_obs
            FROM joined GROUP BY 1, 2),
    rt AS (SELECT pri, sum(n_obs)::BIGINT AS r FROM obs GROUP BY 1),
    ct AS (SELECT mode, sum(n_obs)::BIGINT AS c FROM obs GROUP BY 1),
    tot AS (SELECT sum(n_obs)::BIGINT AS n FROM obs)
    SELECT o.pri AS o_orderpriority, o.mode AS l_returnflag, o.n_obs,
           ((rt.r::HUGEINT * ct.c * {CHI2_SCALE}) // tot.n)::BIGINT
               AS expected_scaled,
           (((o.n_obs * tot.n - rt.r * ct.c)::HUGEINT
             * (o.n_obs * tot.n - rt.r * ct.c)::HUGEINT
             * {CHI2_SCALE})
            // (tot.n::HUGEINT * rt.r * ct.c))::BIGINT
               AS chi2_contrib_scaled
    FROM obs o
    JOIN rt ON rt.pri = o.pri
    JOIN ct ON ct.mode = o.mode
    CROSS JOIN tot
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence audit between two categorical columns
    (order priority × return flag) — the categorical-drift /
    feature-correlation screen a training-data pipeline runs before
    trusting a segmentation. All arithmetic is exact integers:
    diff = obs·N − r·c stays in BIGINT, diff² and the final
    floor-divide run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so
    no float summation order can split the engines.

    Numeric envelope: diff ≤ N², so BIGINT diff needs N ≤ ~3·10⁹
    observations and DECIMAL(38,0) diff² needs N ≤ ~10⁹·√10. Past
    that (a 10¹²-row contingency base), switch to the rescaled form —
    E_scaled = r·c·SCALE // N first, then (obs·SCALE − E_scaled)² //
    (E_scaled·SCALE) — whose squares stay ≤ 10³⁶; the floor lands in
    a different place, so the oracle must be rewritten in lockstep.

    Scale shape: one shuffle to the (priority, mode) cell table
    (partial map-side agg collapses the fact join's output early);
    the margins are two aggregates OVER THE CELL TABLE (≤ |pri|·|mode|
    rows, constant), joined back broadcast. The fact join itself is a
    plain equi-join that AQE plans; nothing downstream of the first
    aggregate depends on data volume."""
    ords = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    joined = li.join(
        ords, li["l_orderkey"] == ords["o_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("pri"),
        F.col("l_returnflag").alias("mode"),
    )
    obs = joined.groupBy("pri", "mode").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    rt = obs.groupBy("pri").agg(F.sum("n_obs").cast("long").alias("r"))
    ct = obs.groupBy("mode").agg(F.sum("n_obs").cast("long").alias("c"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "mode")
        .crossJoin(F.broadcast(tot))
        .withColumn("diff", F.expr("n_obs * n - r * c"))
    )
    return cells.select(
        F.col("pri").alias("o_orderpriority"),
        F.col("mode").alias("l_returnflag"),
        "n_obs",
        # widened: r·c·SCALE wraps LongType once r·c passes ~9·10¹²
        # (a tighter bound than the diff envelope in the docstring)
        F.expr(
            f"CAST(CAST(r AS DECIMAL(38,0)) * c * {CHI2_SCALE}"
            f" AS DECIMAL(38,0)) div CAST(n AS DECIMAL(38,0))"
        ).alias("expected_scaled"),
        F.expr(
            f"CAST(CAST(diff AS DECIMAL(38,0)) * CAST(diff AS DECIMAL(38,0))"
            f" * {CHI2_SCALE} AS DECIMAL(38,0))"
            f" div CAST(CAST(n AS DECIMAL(38,0)) * r * c AS DECIMAL(38,0))"
        ).alias("chi2_contrib_scaled"),
    )


#: Mann-Whitney groups: the two event types whose value
#: distributions are compared, and the coarse cents band width for
#: the scale-safe cumulative rank.
MWU_GROUP_A = "click"
MWU_GROUP_B = "purchase"
MWU_BAND = 100_000


@query(
    "stats_mann_whitney",
    oracle=f"""
    -- exact Mann-Whitney U (rank-sum) test between the
    -- '{MWU_GROUP_A}' and '{MWU_GROUP_B}' event-value distributions,
    -- the nonparametric complement to analytics_ab_ttest. Midranks
    -- handled exactly by DOUBLING: a row of value v has
    -- 2*midrank = 2*below(v) + eq(v) + 1 (all integers), so
    -- 2*R_A = sum over values of cntA(v)*(2*below(v)+eq(v)+1) and
    -- 2*U_A = 2*R_A - n_A*(n_A+1) stay in BIGINT with no .5
    -- fractions crossing an engine boundary. Invariant:
    -- u2_a + u2_b = 2*n_a*n_b.
    WITH pts AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN event_type = '{MWU_GROUP_A}' THEN 1 ELSE 0 END
                   AS is_a
        FROM events
        WHERE event_type IN ('{MWU_GROUP_A}', '{MWU_GROUP_B}')
    ),
    ct AS (
        SELECT cents, sum(is_a)::BIGINT AS ca,
               (count(*) - sum(is_a))::BIGINT AS cb
        FROM pts GROUP BY 1
    ),
    cum AS (
        SELECT cents, ca, cb,
               COALESCE(sum(ca + cb) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS below
        FROM ct
    ),
    tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM ct),
    r AS (
        SELECT sum(ca * (2 * below + (ca + cb) + 1))::BIGINT AS r2a,
               sum(cb * (2 * below + (ca + cb) + 1))::BIGINT AS r2b
        FROM cum
    )
    SELECT tot.na AS n_a, tot.nb AS n_b,
           (r.r2a - tot.na * (tot.na + 1))::BIGINT AS u2_a,
           (r.r2b - tot.nb * (tot.nb + 1))::BIGINT AS u2_b
    FROM r CROSS JOIN tot
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between two event
    types' value distributions — the distribution-shift test that
    works when t-test normality doesn't hold, run corpus-wide with no
    global sort. Ties use midranks, made exact by doubling
    (2·midrank = 2·below + eq + 1 — integers all the way; the
    u2_a + u2_b = 2·n_a·n_b identity is asserted in tests).

    Numeric envelope: the doubled rank sum reaches ~2n², so BIGINT
    holds exactly for n ≤ ~2·10⁹ compared rows per test; beyond that,
    widen the two rank-sum aggregates to DECIMAL(38,0) (safe to
    ~10¹⁸ rows) with the oracle's HUGEINT already matching.

    Scale shape: raw rows collapse map-side to a VALUE-COMPRESSED
    (cents → per-group count) table; the cumulative below(v) count
    runs over that compressed table. Here the compressed table is
    small enough for one ordered window; at 100 TB cardinality the
    same banded decomposition as agg_weighted_median drops in (per-
    band totals + broadcast offsets + intra-band windows) — the rank
    arithmetic is unchanged. The final U assembly is a 1-row
    reduction."""
    from pyspark.sql import Window as _W

    ev = read_table(spark, sf_dir, "events")
    pts = ev.where(
        F.col("event_type").isin(MWU_GROUP_A, MWU_GROUP_B)
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == MWU_GROUP_A, 1)
        .otherwise(0)
        .alias("is_a"),
    )
    ct = pts.groupBy("cents").agg(
        F.sum("is_a").cast("long").alias("ca"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("cb"),
    )
    # banded cumulative "rows strictly below v": bounded per-band
    # totals -> broadcast running offsets -> intra-band window
    banded = ct.withColumn("b", F.expr(f"cents div {MWU_BAND}"))
    btot = banded.groupBy("b").agg(F.sum(F.col("ca") + F.col("cb")).alias("bw"))
    w_off = _W.orderBy("b").rowsBetween(_W.unboundedPreceding, -1)
    boffs = btot.select(
        "b", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("boff")
    )
    w_in = (
        _W.partitionBy("b")
        .orderBy("cents")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    cum = banded.join(F.broadcast(boffs), "b").select(
        "cents",
        "ca",
        "cb",
        (
            F.col("boff")
            + F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w_in), F.lit(0))
        ).alias("below"),
    )
    mid2 = 2 * F.col("below") + (F.col("ca") + F.col("cb")) + 1
    r = cum.agg(
        F.sum(F.col("ca") * mid2).cast("long").alias("r2a"),
        F.sum(F.col("cb") * mid2).cast("long").alias("r2b"),
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    return r.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        (F.col("r2a") - F.col("na") * (F.col("na") + 1))
        .cast("long")
        .alias("u2_a"),
        (F.col("r2b") - F.col("nb") * (F.col("nb") + 1))
        .cast("long")
        .alias("u2_b"),
    )


@query(
    "dq_reconcile_order_totals",
    oracle="""
    -- ledger reconciliation: per order, the header total vs the sum
    -- of its line amounts, reported as a mismatch histogram over
    -- (sign, percent band, has_lines). Sign is split out and the
    -- band computed on ABS values because engines disagree on
    -- NEGATIVE integer division (DuckDB // floors, Spark div
    -- truncates) — abs keeps floor == trunc. Exact cents throughout.
    WITH ls AS (
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS line_cents
        FROM lineitem GROUP BY 1
    ),
    rec AS (
        SELECT CAST(round(o.o_totalprice * 100) AS BIGINT)
                   - COALESCE(ls.line_cents, 0) AS diff,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS oc,
               ls.l_orderkey IS NOT NULL AS has_lines
        FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END
               AS sign,
           ((ABS(diff) * 100) // GREATEST(oc, 1))::BIGINT AS pct_band,
           has_lines,
           count(*)::BIGINT AS n_orders,
           sum(ABS(diff))::BIGINT AS sum_abs_diff_cents
    FROM rec GROUP BY 1, 2, 3
    """,
)
def dq_reconcile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger reconciliation audit — header totals vs the sum of
    their detail lines, the books-balance check every warehouse runs
    after ingest (and which catches partial loads, double-applied
    deltas, and unit drift). Output is a bounded histogram over
    (mismatch sign, |mismatch| as percent-of-header band, has_lines) —
    orphan headers (no lines at all) surface as their own rows
    instead of hiding inside a big band.

    Exactness: cents are integers; the sign is split out and the band
    computed on ABS values because the engines disagree on negative
    integer division (DuckDB ``//`` floors, Spark ``div`` truncates
    toward zero) — on non-negative operands the two coincide.

    Scale shape: one map-side-partial sum per order over the fact
    table (its natural key, usually the table's bucketing key → zero
    extra shuffle), one equi-join to headers, then a constant-width
    groupBy over ≤ a few hundred (sign, band, has_lines) cells."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "line_cents"
        )
    )
    rec = o.join(ls, o["o_orderkey"] == ls["l_orderkey"], "left").select(
        (
            F.round(F.col("o_totalprice") * 100).cast("long")
            - F.coalesce(F.col("line_cents"), F.lit(0))
        ).alias("diff"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("oc"),
        F.col("l_orderkey").isNotNull().alias("has_lines"),
    )
    return rec.select(
        F.when(F.col("diff") > 0, 1)
        .when(F.col("diff") < 0, -1)
        .otherwise(0)
        .alias("sign"),
        F.expr("(ABS(diff) * 100) div GREATEST(oc, 1)").alias("pct_band"),
        "has_lines",
        F.col("diff"),
    ).groupBy("sign", "pct_band", "has_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.abs(F.col("diff"))).cast("long").alias("sum_abs_diff_cents"),
    )


#: k-anonymity threshold and the quasi-identifier generalization:
#: account balance coarsened to 1000-unit bands (the generalization
#: step that trades precision for anonymity).
KANON_K = 5
KANON_BAL_BAND = 100_000  # cents


@query(
    "dq_k_anonymity",
    oracle=f"""
    -- k-anonymity audit (k = {KANON_K}) over the quasi-identifier
    -- (nation, market segment, balance band): per equivalence-class
    -- size, how many classes and customers sit at that size, and
    -- whether the size meets k. A release is k-anonymous iff no row
    -- with is_anonymous = false exists; the histogram shows HOW FAR
    -- off it is (classes of size 1 are re-identifiable outright).
    -- Balance banded on exact cents (ABS before the floor-divide —
    -- DuckDB // floors, Spark div truncates on negatives).
    WITH qi AS (
        SELECT c_nationkey AS nation, c_mktsegment AS seg,
               CASE WHEN c_acctbal < 0 THEN -1 ELSE 1 END
                 * (CAST(ABS(round(c_acctbal * 100)) AS BIGINT)
                    // {KANON_BAL_BAND}) AS bal_band
        FROM customer
    ),
    classes AS (
        SELECT nation, seg, bal_band, count(*)::BIGINT AS class_size
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT class_size,
           count(*)::BIGINT AS n_classes,
           (class_size * count(*))::BIGINT AS n_customers,
           class_size >= {KANON_K} AS is_anonymous
    FROM classes GROUP BY 1
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over a generalized
    quasi-identifier — the privacy gate a dataset release runs before
    publication: group by (nation, market segment, balance band),
    then report the equivalence-class SIZE distribution and whether
    each size clears k = {KANON_K}. Classes of size 1 are outright
    re-identifiable; the histogram quantifies the suppression or
    further generalization still needed.

    Exactness: the balance generalization runs on integer cents with
    ABS before the floor-divide (sign re-applied), sidestepping the
    floor-vs-truncate divergence on negative integer division.

    Scale shape: two map-side-partial aggregations (rows → classes →
    size histogram); output width is bounded by the largest class
    size, not data volume. No joins, no windows — the audit costs one
    scan at any scale."""
    cust = read_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        (
            F.when(F.col("c_acctbal") < 0, -1).otherwise(1)
            * F.expr(
                f"CAST(ABS(round(c_acctbal * 100)) AS BIGINT)"
                f" div {KANON_BAL_BAND}"
            )
        ).alias("bal_band"),
    )
    classes = qi.groupBy("nation", "seg", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        (F.col("class_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_customers"),
        (F.col("class_size") >= KANON_K).alias("is_anonymous"),
    )


@query(
    "stats_cusum_drift",
    oracle="""
    -- one-sided CUSUM drift detector over the daily purchase-count
    -- series, in exact integers WITHOUT a mean division: with nd
    -- days and total events T, the classic S_t = max(0, S_{t-1} +
    -- (x_t - mean)) rescales by nd to S'_t = max(0, S'_{t-1} +
    -- x_t*nd - T) (units: count-days). Drift flags when S' exceeds
    -- T (i.e., one full mean-day of accumulated excess). The
    -- recursion runs over the CALENDAR (nd rows), never the event
    -- data — a recursive CTE here, a JVM fold on the engine side.
    WITH RECURSIVE daily AS (
        SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    idx AS (
        SELECT day, x,
               row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER ()::BIGINT AS nd,
               sum(x) OVER ()::BIGINT AS t
        FROM daily
    ),
    run(rn, day, x, s, nd, t) AS (
        SELECT rn, day, x, greatest(0, x * nd - t), nd, t
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.rn, i.day, i.x,
               greatest(0, r.s + i.x * i.nd - i.t), i.nd, i.t
        FROM run r JOIN idx i ON i.rn = r.rn + 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x AS n_events,
           s::BIGINT AS cusum_count_days,
           s > t AS is_drift
    FROM run
    """,
)
def stats_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection over the daily purchase-count
    series — the sequential change detector monitoring pipelines run
    on ingest volumes. Division-free exact form: S'_t = max(0,
    S'_{t-1} + x_t·nd − T) (the classic deviation-from-mean CUSUM
    rescaled by the day count), drift when S' > T.

    Scale shape: the event data collapses to the CALENDAR first (one
    partial-agg shuffle to ≤ nd daily rows); the inherently-serial
    CUSUM recursion then folds over that bounded series inside ONE
    JVM higher-order `aggregate` (array ≤ nd elements — bounded by
    elapsed days, never by data volume). This is the general pattern
    for recursive time-series ops (EWMA, state machines) on Spark:
    reduce relationally, recurse over the reduction. The oracle runs
    the same recursion as a recursive CTE over the same nd rows.

    Numeric envelope: x·nd ≤ T·nd and S' ≤ T·nd, so BIGINT holds to
    T·nd ≈ 9·10¹⁸ — e.g. 10¹⁴ events over 30 000 days."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("ds"),
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("t"),
    )
    folded = series.select(
        "t",
        F.expr(
            """
            aggregate(
                ds,
                struct(CAST(0 AS BIGINT) AS s,
                       CAST(array() AS array<struct<day:string,
                            x:bigint, s:bigint>>) AS out),
                (acc, d) -> struct(
                    greatest(CAST(0 AS BIGINT), acc.s + d.x * nd - t) AS s,
                    array_append(acc.out,
                        struct(d.day AS day, d.x AS x,
                               greatest(CAST(0 AS BIGINT),
                                        acc.s + d.x * nd - t) AS s))
                        AS out),
                acc -> acc.out
            )
            """
        ).alias("run"),
    )
    return folded.select(
        F.explode("run").alias("r"), F.col("t")
    ).select(
        F.col("r.day").alias("day"),
        F.col("r.x").alias("n_events"),
        F.col("r.s").alias("cusum_count_days"),
        (F.col("r.s") > F.col("t")).alias("is_drift"),
    )


#: EWMA smoothing factor as an exact rational: alpha = 1/EWMA_DEN.
EWMA_DEN = 4


@query(
    "stats_ewma_trend",
    oracle=f"""
    -- integer EWMA baseline over the daily purchase-count series:
    -- s_1 = x_1; s_t = (({EWMA_DEN} - 1) * s_(t-1) + x_t) // {EWMA_DEN}
    -- (alpha = 1/{EWMA_DEN}; floor at every step, all values
    -- non-negative so floor == trunc on both engines). Reported per
    -- day with the residual x_t - s_t — the trend/seasonality
    -- baseline monitoring pipelines subtract before alerting. Same
    -- reduce-then-recurse contract as stats_cusum_drift: the
    -- recursion runs over the CALENDAR, never the event data.
    WITH RECURSIVE daily AS (
        SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    idx AS (
        SELECT day, x, row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    run(rn, day, x, s) AS (
        SELECT rn, day, x, x FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.rn, i.day, i.x,
               (({EWMA_DEN} - 1) * r.s + i.x) // {EWMA_DEN}
        FROM run r JOIN idx i ON i.rn = r.rn + 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x AS n_events,
           s::BIGINT AS ewma, (x - s)::BIGINT AS residual
    FROM run
    """,
)
def stats_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA trend baseline over the daily purchase-count
    series (α = 1/{EWMA_DEN}, floor at each step — exact and
    engine-identical since every value is non-negative), with the
    per-day residual that anomaly alerting thresholds. Pairs with
    `stats_cusum_drift` as the two standard sequential monitors.

    Scale shape: identical reduce-then-recurse contract — the event
    data collapses relationally to ≤ nd calendar rows, then the
    inherently-serial smoothing folds over that bounded series in one
    JVM `aggregate`; the oracle runs the same recursion as a
    recursive CTE. The recursion NEVER touches event-scale data."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("ds")
    )
    folded = series.select(
        F.expr(
            f"""
            aggregate(
                ds,
                struct(CAST(-1 AS BIGINT) AS s,
                       CAST(array() AS array<struct<day:string,
                            x:bigint, s:bigint>>) AS out),
                (acc, d) -> struct(
                    CASE WHEN acc.s < 0 THEN d.x
                         ELSE (({EWMA_DEN} - 1) * acc.s + d.x)
                              div {EWMA_DEN} END AS s,
                    array_append(acc.out,
                        struct(d.day AS day, d.x AS x,
                               CASE WHEN acc.s < 0 THEN d.x
                                    ELSE (({EWMA_DEN} - 1) * acc.s + d.x)
                                         div {EWMA_DEN} END AS s)) AS out),
                acc -> acc.out
            )
            """
        ).alias("run")
    )
    return folded.select(F.explode("run").alias("r")).select(
        F.col("r.day").alias("day"),
        F.col("r.x").alias("n_events"),
        F.col("r.s").alias("ewma"),
        (F.col("r.x") - F.col("r.s")).alias("residual"),
    )
