"""Event-analytics operators over the ``events`` fact table —
funnel progression and cohort retention, the two queries every
product-analytics engine (ClickHouse ``windowFunnel``, Amplitude/
Mixpanel cohort grids) treats as primitives. Both are pure
relational compositions here: conditional aggregation + self-joins
on the user key, fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.caching import persist_bounded
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

#: funnel stage sequence and the end-to-end completion window.
FUNNEL_STAGES = ("click", "view", "purchase")
FUNNEL_WINDOW_HOURS = 6


@query(
    "analytics_window_funnel",
    oracle=f"""
    -- greedy earliest-match funnel (ClickHouse windowFunnel
    -- semantics, strictly increasing timestamps): stage 1 anchors at
    -- the user's EARLIEST click; each later stage is the earliest
    -- strictly-later event of its type still inside the anchor's
    -- {FUNNEL_WINDOW_HOURS}-hour window. Users without a click are
    -- not in the funnel.
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
    ),
    s2 AS (
        SELECT s1.user_id, t1, min(e.ts) AS t2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.user_id AND e.event_type = '{FUNNEL_STAGES[1]}'
         AND e.ts > t1 AND e.ts <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
        GROUP BY s1.user_id, t1
    ),
    s3 AS (
        SELECT s2.user_id, t1, t2, min(e.ts) AS t3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.user_id AND e.event_type = '{FUNNEL_STAGES[2]}'
         AND e.ts > t2 AND e.ts <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
        GROUP BY s2.user_id, t1, t2
    )
    SELECT user_id, t1, t2, t3,
           1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
             + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS stages
    FROM s3
    """,
)
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel progression — how far each user advances through
    click → view → purchase inside a {FUNNEL_WINDOW_HOURS}-hour window
    anchored at their earliest click (greedy earliest-match, the
    ClickHouse ``windowFunnel`` contract).

    Plan: one pre-aggregation per stage, each shuffled on the SAME
    user_id key — the anchor aggregate is |users| rows, and every
    later stage joins the (small) survivor set back to the
    stage-filtered scan (filter pushed to parquet), so work shrinks
    monotonically down the funnel. At 100 TB the stage filters prune
    the fact scan per stage and no state beyond |users| exists."""
    ev = read_table(spark, sf_dir, "events")
    window = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    e2 = ev.filter(F.col("event_type") == FUNNEL_STAGES[1]).select(
        F.col("user_id").alias("u2"), F.col("ts").alias("ts2")
    )
    s2 = (
        s1.join(
            e2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("ts2") > F.col("t1"))
            & (F.col("ts2") <= F.col("t1") + window),
            "left",
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts2").alias("t2"))
    )
    e3 = ev.filter(F.col("event_type") == FUNNEL_STAGES[2]).select(
        F.col("user_id").alias("u3"), F.col("ts").alias("ts3")
    )
    s3 = (
        s2.join(
            e3,
            (F.col("u3") == F.col("user_id"))
            & (F.col("ts3") > F.col("t2"))
            & (F.col("ts3") <= F.col("t1") + window),
            "left",
        )
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("ts3").alias("t3"))
    )
    return s3.select(
        "user_id",
        "t1",
        "t2",
        "t3",
        (
            F.lit(1)
            + F.col("t2").isNotNull().cast("int")
            + F.col("t3").isNotNull().cast("int")
        )
        .cast("long")
        .alias("stages"),
    )


@query(
    "analytics_cohort_retention",
    oracle="""
    -- daily cohort retention grid: users cohorted by the calendar
    -- day of their first-ever event; a cell counts distinct cohort
    -- members active offset days later (day granularity fits the
    -- fixture's 30-day span; production swaps 'day' for 'week').
    WITH first_seen AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day,
                        date_trunc('day', e.ts)) AS day_offset
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT cohort_day, day_offset,
           count(*)::BIGINT AS n_active
    FROM activity GROUP BY cohort_day, day_offset
    """,
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the activity grid behind every retention
    chart: users cohorted by first-seen day, each (cohort,
    day-offset) cell counting distinct members active that day.

    Plan: first-seen is one user_id aggregate; the activity join
    shuffles the fact table on user_id ONCE (the cohort side is
    |users| rows — broadcastable when dims allow, AQE decides); the
    grid aggregate is a distinct-then-count on (user, cohort, offset),
    whose distinct collapses map-side. The output is |cohorts| ×
    |offsets| — tiny at any input scale."""
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@query(
    "analytics_event_transitions",
    oracle="""
    -- first-order Markov transition matrix over per-user event
    -- sequences: count (prev_type -> type) pairs and the row-
    -- normalized transition probability.
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               count(*) AS n
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM c
    """,
)
def analytics_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition (Markov) matrix — the user-path analytics
    primitive behind flow visualizations and next-action models:
    per-user chronological lag pairs, counted and row-normalized into
    transition probabilities.

    Plan: ONE corpus shuffle (the per-user sequence window on the
    same high-cardinality user key SCD2 uses), then the transition
    count collapses to |event_types|² rows — the normalizing window
    runs on that tiny table. At 100 TB the sequence shuffle is the
    irreducible cost (any sequence model needs the per-entity order);
    everything after is negligible."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    c = (
        o.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = _W.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wn), 6
        ).alias("p_transition"),
    )


@query(
    "analytics_ab_ttest",
    oracle="""
    -- Welch's two-sample t-test between every pair of event types on
    -- `value` — the A/B significance readout. Sufficient statistics
    -- are DECIMAL-exact sums (like agg_exact_corr), so mean/variance
    -- are fixed-op-order rationals and the t statistic / Welch df are
    -- engine-identical doubles.
    WITH s AS (
        SELECT event_type,
               count(*)::BIGINT AS n,
               sum(value::DECIMAL(18,6)) AS s1,
               sum((value::DECIMAL(18,6)) * (value::DECIMAL(18,6))) AS s2
        FROM events GROUP BY 1
    ),
    st AS (
        SELECT event_type, n,
               s1::DOUBLE / n AS mean,
               (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n) / (n - 1)
                   AS var
        FROM s
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS n_a, b.n AS n_b,
           round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 4) AS t_stat,
           round(pow(a.var / a.n + b.var / b.n, 2)
                 / (pow(a.var / a.n, 2) / (a.n - 1)
                    + pow(b.var / b.n, 2) / (b.n - 1)), 2) AS welch_df
    FROM st a JOIN st b ON a.event_type < b.event_type
    """,
)
def analytics_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test over every event-type pair — the experiment
    readout (is `purchase` value really different from `click`
    value?) computed fully inside the engine. Exactness follows
    `agg_exact_corr`: DECIMAL sufficient statistics make the sums
    exact regardless of aggregation order; the t statistic and Welch
    degrees of freedom are then a fixed chain of IEEE ops.

    Scale shape: ONE pass over events collapses to a |types|-row
    stats table (map-side partial aggregation); the pair join and
    test arithmetic run on that tiny table. This is how A/B readouts
    stay O(scan) at any event volume."""
    ev = read_table(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dv).alias("s1"),
        F.sum(dv * dv).alias("s2"),
    )
    st = s.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = st.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_ra"),
        F.col("var").alias("var_a"),
    )
    b = st.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_rb"),
        F.col("var").alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.round("mean_ra", 6).alias("mean_a"),
            F.round("mean_rb", 6).alias("mean_b"),
            F.round(
                (F.col("mean_ra") - F.col("mean_rb"))
                / F.sqrt(se_a + se_b),
                4,
            ).alias("t_stat"),
            F.round(
                F.pow(se_a + se_b, 2)
                / (
                    F.pow(se_a, 2) / (F.col("n_a") - 1)
                    + F.pow(se_b, 2) / (F.col("n_b") - 1)
                ),
                2,
            ).alias("welch_df"),
        )
    )


@query(
    "stats_linear_regression",
    oracle="""
    -- per-group OLS: extendedprice ~ quantity within each return
    -- flag. Values quantized to integer cents (the agg_exact_corr
    -- recipe) so every sufficient statistic is an exact integer sum;
    -- slope and R² are scale-invariant, the intercept is de-scaled
    -- once at the end. The estimator arithmetic is then a fixed IEEE
    -- chain identical on both engines.
    WITH q AS (
        SELECT l_returnflag,
               round(l_quantity * 100)::BIGINT AS x,
               round(l_extendedprice * 100)::BIGINT AS y
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * y)::BIGINT AS sxy,
               sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2
        FROM q GROUP BY 1
    ),
    st AS (
        SELECT l_returnflag, n, sx::DOUBLE AS sx, sy::DOUBLE AS sy,
               sxy::DOUBLE AS sxy, sx2::DOUBLE AS sx2, sy2::DOUBLE AS sy2
        FROM s
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx)
                 / n / 100, 4) AS intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS r2
    FROM st
    """,
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (price ~ quantity by return
    flag): slope, intercept, R² from one aggregation pass — the
    regression readout next to `agg_exact_corr`, same exactness
    recipe: integer-cent sufficient statistics are aggregation-order-
    proof,
    the closed-form estimators are then a fixed IEEE chain.

    Scale shape: one scan collapsing map-side to |groups| rows of six
    statistics; the estimator arithmetic is driver-free column math
    on that tiny table. This is why closed-form stats beat iterative
    fits at 100 TB whenever the model allows it."""
    li = read_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    # sums in DECIMAL(38,0): cents-squared sums pass int64 around
    # ~100 K rows (the agg_exact_corr sizing note) — decimal128 keeps
    # them exact at any scale factor
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sx2"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("sy2"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy2 = F.col("sy2").cast("double")
    cov_n = n * sxy - sx * sy
    var_n = n * sx2 - sx * sx
    slope = cov_n / var_n
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n / 100, 4).alias("intercept"),
        F.round(
            F.pow(cov_n, 2) / (var_n * (n * sy2 - sy * sy)), 6
        ).alias("r2"),
    )


#: Markov steady-state geometry: scaled-integer mass (bit-exact
#: supersteps, same rule as graph_pagerank) and the iteration count.
MKV_SCALE = 10**12
MKV_ITERS = 8


def _mkv_oracle() -> str:
    rounds = []
    for k in range(MKV_ITERS):
        rounds.append(
            f"""r{k + 1} AS (
        SELECT e.dst AS node,
               sum((r{k}.r::HUGEINT * e.c) // o.co)::BIGINT AS r
        FROM r{k} JOIN e ON e.src = r{k}.node JOIN o USING (src)
        GROUP BY 1
    )"""
        )
    rounds_sql = ",\n    ".join(rounds)
    return f"""
    -- steady-state distribution of the per-user event-type Markov
    -- chain: {MKV_ITERS} power-iteration supersteps over the
    -- row-normalized transition counts, in SCALED INTEGERS (floor
    -- division, the graph_pagerank rule) so every superstep is
    -- bit-exact across engines. Start uniform; the truncated mass
    -- per round is deterministic and identical on both sides.
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    e AS (
        SELECT event_type AS src, nxt AS dst, count(*)::BIGINT AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    o AS (SELECT src, sum(c)::BIGINT AS co FROM e GROUP BY 1),
    t AS (SELECT DISTINCT event_type AS node FROM events),
    r0 AS (
        SELECT node,
               ({MKV_SCALE} // (SELECT count(*) FROM t))::BIGINT AS r
        FROM t
    ),
    {rounds_sql}
    SELECT node AS event_type, r AS pi_scaled,
           round(r::DOUBLE / {MKV_SCALE}, 6) AS pi
    FROM r{MKV_ITERS}
    """


@query("analytics_markov_steady_state", oracle=_mkv_oracle())
def analytics_markov_steady_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Steady-state distribution of the user-behavior Markov chain —
    where the event stream settles in the long run (the
    `analytics_event_transitions` matrix taken to its fixed point by
    {MKV_ITERS} power-iteration rounds). Mass is a SCALED INTEGER and
    every superstep uses floor division, so the iteration is bit-exact
    across engines — the graph_pagerank exactness rule applied to a
    row-stochastic chain.

    Plan: the transition table is built once behind a plan-lazy
    bounded persist ({MKV_ITERS} joins never re-read events) and the
    supersteps compose into ONE lazy plan (r16, guide §1.2/§2.4 —
    the graph_pagerank rationale: a FIXED small round count over
    |types|-bounded state makes the former per-round eager
    localCheckpoint pure overhead, one driver-blocking job +
    materialization per round). The uniform start mass rides a
    1-row broadcast count into the plan instead of a driver-side
    ``t.count()``, so construction runs zero Spark jobs; integer
    ``div`` arithmetic is unchanged."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    e = persist_bounded(
        seq.groupBy(
            F.col("event_type").alias("src"), F.col("nxt").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    o = e.groupBy("src").agg(F.sum("c").cast("long").alias("co"))
    eo = persist_bounded(e.join(o, "src"))
    t = ev.select(F.col("event_type").alias("node")).distinct()
    consts = t.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    ranks = t.crossJoin(F.broadcast(consts)).select(
        "node", F.expr(f"{MKV_SCALE}L div nn").cast("long").alias("r")
    )
    for _ in range(MKV_ITERS):
        ranks = (
            ranks.join(eo, ranks["node"] == eo["src"])
            .select(
                F.col("dst").alias("node"),
                # 128-bit product: r ≤ {MKV_SCALE} and c is a raw
                # transition count, so r·c wraps LongType once any
                # cell passes ~9·10⁶ transitions — silent at scale
                F.expr(
                    "CAST(CAST(r AS DECIMAL(38,0)) * c AS DECIMAL(38,0))"
                    " div CAST(co AS DECIMAL(38,0))"
                ).alias("m"),
            )
            .groupBy("node")
            .agg(F.sum("m").cast("long").alias("r"))
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("r").alias("pi_scaled"),
        F.round(F.col("r").cast("double") / MKV_SCALE, 6).alias("pi"),
    )


@query(
    "analytics_new_vs_returning",
    oracle="""
    -- daily new vs returning actives — the growth-accounting split
    -- every product dashboard opens with: a user is NEW on their
    -- first-ever active day, RETURNING on later active days.
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    first_seen AS (
        SELECT user_id, min(d) AS d0 FROM ud GROUP BY 1
    )
    SELECT strftime(ud.d, '%Y-%m-%d') AS day,
           sum(CASE WHEN ud.d = f.d0 THEN 1 ELSE 0 END)::BIGINT
               AS new_users,
           sum(CASE WHEN ud.d > f.d0 THEN 1 ELSE 0 END)::BIGINT
               AS returning_users,
           count(*)::BIGINT AS active_users
    FROM ud JOIN first_seen f USING (user_id)
    GROUP BY ud.d
    """,
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split — growth accounting's first chart.
    First-seen day per user is one aggregation; tagging each user-day
    against it is a broadcast join (the first-seen table is |users|
    rows of two columns — broadcastable far beyond any fixture, and at
    true 100 TB user counts the SAME plan degrades gracefully to a
    shuffle join on user_id).

    Scale shape: events collapse to distinct user-days map-side; two
    aggregations and one join, all keyed small."""
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ud.join(F.broadcast(first_seen), "user_id")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.when(F.col("d") == F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("d") > F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
            F.count(F.lit(1)).cast("long").alias("active_users"),
        )
    )


#: market-basket affinity: pairs must co-occur in at least this many
#: orders to be reported
BASKET_MIN_SUPPORT = 2


@query(
    "analytics_market_basket",
    oracle=f"""
    -- market-basket pair affinity (the co-purchase table behind
    -- "customers also bought"): support = orders containing BOTH
    -- parts, lift = support·|orders| / (freq_a·freq_b) — lift > 1
    -- means the pair co-occurs more than independence predicts.
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM b a JOIN b b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    s AS (
        SELECT part_a, part_b, count(*)::BIGINT AS support
        FROM p GROUP BY 1, 2
    ),
    item AS (SELECT l_partkey, count(*)::BIGINT AS freq FROM b GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM b)
    SELECT s.part_a, s.part_b, s.support,
           ia.freq AS freq_a, ib.freq AS freq_b,
           round(s.support::DOUBLE * n.n_orders
                 / (ia.freq * ib.freq), 6) AS lift
    FROM s
    JOIN item ia ON ia.l_partkey = s.part_a
    JOIN item ib ON ib.l_partkey = s.part_b
    CROSS JOIN n
    WHERE s.support >= {BASKET_MIN_SUPPORT}
    """,
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity — co-purchased part pairs with
    support ≥ {BASKET_MIN_SUPPORT} orders and their lift vs
    independence, the first stage of every frequent-itemset /
    recommendation pipeline (the A-Priori k=2 pass).

    Scale shape: baskets collapse to sorted part arrays (one exchange
    on the order key, map-side combined), pairs expand IN MEMORY per
    basket (pair_combos HOF — expansion bounded by C(basket, 2), never
    a table self-join), and the support count shuffles (part_a,
    part_b, 1) rows with partial aggregation. The item-frequency side
    is |parts| rows — left UNHINTED so AQE broadcasts it when its
    runtime size fits under autoBroadcastJoinThreshold and falls back
    to a shuffled join when a 100 TB corpus has 10^7-10^8 distinct
    items (an unconditional broadcast hint there would be a driver
    OOM; only the 1-row order count keeps a static hint). An order with a
    pathological basket would explode combinatorially; real A-Priori
    caps basket size the same way the df-cap guards the shingle
    index (baskets here max at 13 parts)."""
    from lake_satellite_image_etl_spark.operators.dedup import pair_combos

    li = read_table(spark, sf_dir, "lineitem")
    # one distinct pass computed once: the basket table feeds three
    # consumers (baskets, item frequencies, the order count). Bounded
    # lazy persist (r13): even a LAZY localCheckpoint submits a Spark
    # job at construction in PySpark 4.1 (measured in the sweep), so
    # the registry persist is the only jobless multi-consumer cut.
    b = persist_bounded(li.select("l_orderkey", "l_partkey").distinct())
    baskets = (
        b.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("m"))
        .filter(F.size("m") >= 2)
    )
    supp = (
        baskets.select(F.explode(pair_combos(F.col("m"))).alias("p"))
        .groupBy(
            F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    item = b.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    n = b.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("freq").alias("freq_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("freq").alias("freq_b")
    )
    return (
        supp.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            "freq_a",
            "freq_b",
            # cast BEFORE the multiply, mirroring the oracle's
            # support::DOUBLE * n_orders — exact int64 support*n_orders
            # diverges from the double product in the 6th rounded
            # decimal once it exceeds 2^53 (real at 100 TB scale)
            F.round(
                F.col("support").cast("double") * F.col("n_orders")
                / (F.col("freq_a") * F.col("freq_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "analytics_rfm_segmentation",
    oracle="""
    -- RFM customer segmentation — the standard lifecycle scoring:
    -- quintile scores for Recency (days since last order, anchored
    -- at the corpus max date so the result is deterministic),
    -- Frequency (order count) and Monetary (total spend), plus the
    -- classic segment labels marketing pipelines key campaigns on.
    -- ntile tie order is pinned by the (metric, custkey) sort.
    WITH per_cust AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders))
                   AS recency_days,
               count(*)::BIGINT AS frequency,
               round(sum(o_totalprice), 4) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT custkey, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days ASC, custkey)
                   AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, custkey)
                   AS f_score,
               ntile(5) OVER (ORDER BY monetary DESC, custkey)
                   AS m_score
        FROM per_cust
    )
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal_lapsing'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the lifecycle scoring every growth/CRM pipeline derives campaigns
    from: per-customer quintile scores on days-since-last-order
    (anchored at the corpus max date for determinism), order count,
    and total spend, composed into the classic segment labels.

    Scale shape: orders collapse to |customers| rows first (map-side
    combined groupBy); the three ntile windows then run on that
    BOUNDED table. Global ntile is a single-partition sort of
    |customers| rows — at 100 TB replace it with the banded
    equi-depth decomposition (`stats_equidepth_histogram`'s count
    tables give the same quintile edges without a global sort); the
    hash-pinned tie order makes both forms pick identical scores."""
    ords = read_table(spark, sf_dir, "orders")
    anchor = ords.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        ords.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("mx"), F.max("o_orderdate")).cast("long").alias(
                "recency_days"
            ),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum("o_totalprice"), 4).alias("monetary"),
        )
    )
    wr = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    wm = Window.orderBy(F.desc("monetary"), F.asc("custkey"))
    scored = per_cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion"
        )
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk"
        )
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


#: attribution lookback: a purchase is attributed to the user's most
#: recent click/view at most this many days before it.
ATTR_LOOKBACK_DAYS = 7
ATTR_TOUCH_TYPES = ("click", "view")


@query(
    "analytics_attribution",
    oracle=f"""
    -- last-touch revenue attribution: each purchase is credited to
    -- the user's most recent click/view within {ATTR_LOOKBACK_DAYS}
    -- days (channel = that event's type), else 'unattributed'.
    -- Revenue in exact integer cents; the touch→purchase gap in
    -- exact integer MICROSECONDS (the fixture's ts has sub-second
    -- precision, and epoch() floats would diverge from Spark's
    -- whole-second unix_timestamp), summed as BIGINT.
    WITH tagged AS (
        SELECT user_id, ts, event_type, value,
               CASE WHEN event_type IN ('click', 'view')
                    THEN event_type END AS touch
        FROM events
    ),
    carried AS (
        SELECT user_id, ts, event_type, value,
               last_value(touch IGNORE NULLS) OVER w AS last_touch,
               last_value(CASE WHEN touch IS NOT NULL THEN ts END
                          IGNORE NULLS) OVER w AS last_touch_ts
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    purchases AS (
        SELECT CASE WHEN last_touch_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(last_touch_ts)
                         <= {ATTR_LOOKBACK_DAYS}::BIGINT * 86400000000
                    THEN last_touch ELSE 'unattributed' END AS channel,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN last_touch_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(last_touch_ts)
                         <= {ATTR_LOOKBACK_DAYS}::BIGINT * 86400000000
                    THEN epoch_us(ts) - epoch_us(last_touch_ts)
                    ELSE 0 END AS gap_us
        FROM carried WHERE event_type = 'purchase'
    )
    SELECT channel, count(*)::BIGINT AS n_purchases,
           sum(cents)::BIGINT AS revenue_cents,
           sum(gap_us)::BIGINT AS total_gap_us
    FROM purchases GROUP BY 1
    """,
)
def analytics_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution — credit every purchase to the
    user's most recent click/view within the lookback window, the
    canonical "carry the last non-null over an ordered partition"
    shape (`last(..., ignorenulls)` running window). Revenue is summed
    in exact integer cents and the touch→purchase gap in exact epoch
    MICROSECONDS (unix_micros / epoch_us — whole-second truncation
    would silently disagree on sub-second fixtures), so the small
    aggregate is bit-stable cross-engine. Numeric envelope: the
    per-channel gap SUM holds ~9·10¹⁸ µs ≈ 10¹³ purchases at a 1-day
    mean gap; a corpus past that reports mean gap (sum widened to
    DECIMAL(38,0)) rather than the raw total.

    Scale shape: ONE shuffle — the user-partitioned sort for the
    running window (the same partitioning a sessionizer uses; at
    100 TB the events table is already bucketed by user_id and the
    exchange disappears). Everything after the window is a
    constant-width global aggregate with map-side partials. This is
    the join-free formulation: the naive as-of self-join of purchases
    against touches costs a second shuffle and a range predicate;
    carrying state through one sorted pass is strictly cheaper and
    exactly matches join_point_in_time's semantics."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.col("event_type")
    )
    carried = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.last(
            F.when(touch.isNotNull(), F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_touch_ts"),
    )
    gap = F.unix_micros("ts") - F.unix_micros("last_touch_ts")
    in_window = F.col("last_touch_ts").isNotNull() & (
        gap <= ATTR_LOOKBACK_DAYS * 86400 * 1_000_000
    )
    purchases = carried.where(F.col("event_type") == "purchase").select(
        F.when(in_window, F.col("last_touch"))
        .otherwise("unattributed")
        .alias("channel"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(in_window, gap).otherwise(0).cast("long").alias("gap_us"),
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
    )


#: HHI fixed-point scale: the index is reported as
#: floor(HHI * 10^8) where HHI = sum of squared revenue shares.
HHI_SCALE = 10**8


@query(
    "analytics_hhi_concentration",
    oracle=f"""
    -- Herfindahl-Hirschman concentration of customer revenue within
    -- each market segment (the antitrust / account-concentration
    -- metric: 1/n = perfectly even, 1 = single account). HHI =
    -- sum(x_i^2)/X^2 computed exactly: per-customer cents sums in
    -- BIGINT, squares and the final scaled divide in HUGEINT —
    -- floor(sum(x^2)*{HHI_SCALE}/X^2) is bit-stable cross-engine.
    WITH cust_rev AS (
        SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT seg AS c_mktsegment,
           count(*)::BIGINT AS n_customers,
           sum(cents)::BIGINT AS total_cents,
           ((sum(cents::HUGEINT * cents) * {HHI_SCALE})
               // (sum(cents)::HUGEINT * sum(cents)))::BIGINT
               AS hhi_scaled
    FROM cust_rev GROUP BY 1
    """,
)
def analytics_hhi_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per market segment —
    the account-concentration metric behind "how dependent is this
    segment on its biggest customers" (1/n = even, 10^8-scaled 1 =
    single account). Everything exact: per-customer revenue in integer
    cents, Σx² and the scaled divide in DECIMAL(38,0)/HUGEINT.

    Scale shape: one (segment, customer) partial-agg shuffle collapses
    the fact table; the segment rollup is a second partial-agg over
    |customers| rows; output is |segments| rows. Numeric envelope:
    Σx² ≤ X² and X·√SCALE must fit DECIMAL(38,0) → X ≤ 10¹⁵ cents
    (10 trillion dollars per segment) before the rescaled form is
    needed."""
    o = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cust_rev = (
        o.join(cust, o["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_custkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("seg", "k")
        .agg(F.sum("c").alias("cents"))
    )
    return cust_rev.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr(
            f"CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents)"
            f" * {HHI_SCALE} AS DECIMAL(38,0))"
            f" div CAST(CAST(sum(cents) AS DECIMAL(38,0)) * sum(cents)"
            f" AS DECIMAL(38,0))"
        )
        .cast("long")
        .alias("hhi_scaled"),
    ).select(
        F.col("seg").alias("c_mktsegment"),
        "n_customers",
        "total_cents",
        "hhi_scaled",
    )


@query(
    "analytics_attribution_linear",
    oracle=f"""
    -- linear (equal-split) multi-touch attribution: every purchase's
    -- revenue is split equally across ALL of the user's click/view
    -- touches in the preceding {ATTR_LOOKBACK_DAYS} days; integer
    -- division leaves a remainder of at most n_touches-1 cents,
    -- assigned to the EARLIEST touch (ties by event_id) so credit is
    -- exactly conserved: sum(credited) == sum(purchase cents),
    -- asserted in tests. Purchases with no touch credit
    -- 'unattributed' in full.
    WITH p AS (
        SELECT event_id AS pid, user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, ts, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT p.pid, p.cents, t.tid, t.event_type,
               row_number() OVER (PARTITION BY p.pid
                                  ORDER BY t.ts, t.tid) AS rnk,
               count(*) OVER (PARTITION BY p.pid) AS n
        FROM p JOIN t ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND epoch_us(p.ts) - epoch_us(t.ts)
             <= {ATTR_LOOKBACK_DAYS}::BIGINT * 86400000000
    ),
    credits AS (
        SELECT event_type AS channel,
               cents // n + CASE WHEN rnk = 1
                                 THEN cents % n ELSE 0 END AS credit
        FROM j
        UNION ALL
        SELECT 'unattributed', cents
        FROM p WHERE pid NOT IN (SELECT pid FROM j)
    )
    SELECT channel, count(*)::BIGINT AS n_credits,
           sum(credit)::BIGINT AS credited_cents
    FROM credits GROUP BY 1
    """,
)
def analytics_attribution_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear (equal-split) multi-touch attribution — the
    complementary model to ``analytics_attribution``'s last-touch:
    every click/view inside the {ATTR_LOOKBACK_DAYS}-day lookback
    shares the purchase's revenue equally. Exact by construction:
    integer cents split with the ≤ n−1-cent remainder assigned to the
    earliest touch (ties by event_id), so total credited cents equal
    total purchase cents — conservation is asserted in tests, not
    hoped for (naive float splits leak cents).

    Scale shape: ONE equi-join on user_id with the lookback as a
    residual range predicate (the as-of-join family's plan), then two
    windows partitioned by purchase id — bounded by a purchase's
    touch count, never by data volume; the channel rollup is a
    constant-width aggregate. The anti-join for unattributed
    purchases reuses the join's left side."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("tu") == F.col("pu"))
        & (F.col("tts") <= F.col("pts"))
        & (
            F.unix_micros("pts") - F.unix_micros("tts")
            <= ATTR_LOOKBACK_DAYS * 86400 * 1_000_000
        ),
    )
    w_rnk = _W.partitionBy("pid").orderBy("tts", "tid")
    w_n = _W.partitionBy("pid")
    ranked = j.select(
        "pid",
        "cents",
        "channel",
        F.row_number().over(w_rnk).alias("rnk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    credits = ranked.select(
        "channel",
        (
            F.expr("cents div n")
            + F.when(F.col("rnk") == 1, F.expr("cents % n")).otherwise(0)
        ).alias("credit"),
    )
    unattributed = (
        p.join(j.select("pid").distinct(), "pid", "left_anti")
        .select(F.lit("unattributed").alias("channel"),
                F.col("cents").alias("credit"))
    )
    return credits.unionByName(unattributed).groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum("credit").cast("long").alias("credited_cents"),
    )
