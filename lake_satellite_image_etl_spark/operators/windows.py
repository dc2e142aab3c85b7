"""Time windows over the events stream-analog table (SURVEY.md §2.9 EXT).

Batch forms of the Structured Streaming windows: ``F.window`` produces
the identical bucketing the streaming engine uses, so these plans are
copy-pasteable into a ``readStream`` pipeline (see streaming/ingest.py)
— the watermark is the only addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query


@query(
    "window_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT tumbling window: 1-hour buckets × event_type."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle="""
    -- Spark's sliding window semantics: an event at ts belongs to every
    -- 1h window whose 15-min-aligned start is in (ts-1h, ts].
    SELECT time_bucket(INTERVAL 15 MINUTE, e.ts) - (k.k * INTERVAL 15 MINUTE)
               AS window_start,
           count(*) AS n,
           round(sum(e.value), 4) AS total_value
    FROM events e CROSS JOIN range(4) k(k)
    GROUP BY 1
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT sliding window: 1 hour long, sliding 15 minutes — each event
    lands in 4 windows. Spark expands this without a self-join."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


@query(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           rank() OVER w AS price_rank,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
           round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_next,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
               ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT analytic window functions (rank/lag/lead/running sum) — all
    four share ONE window spec, so the plan sorts each partition once.
    One shuffle on the partition key; the per-key deterministic
    tie-break (orderkey) keeps lag/lead engine-independent."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.rank().over(w).alias("price_rank"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_prev"),
        F.round(
            F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2
        ).alias("delta_next"),
        F.round(F.sum("o_totalprice").over(wsum), 2).alias("running_total"),
    )


@query(
    "window_session",
    oracle="""
    -- Sessionization: a session breaks when the per-user gap > 30 min.
    WITH gaps AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM gaps
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT session window (30-min gap), batch form.

    Built from lag + cumulative-sum — one shuffle on user_id, identical
    result to streaming ``session_window(ts, '30 minutes')`` on this
    data. Returns per-session extent and aggregates.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Same ordering as `w` so both window functions share ONE sort (a
    # differently-ordered cumulative window would add a second sort of
    # every partition) — and the tie-break makes session numbering
    # deterministic when timestamps collide.
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Gap test at full microsecond precision (unix_micros), matching the
    # oracle's ts - lag(ts) > INTERVAL comparison — a cast('long') diff
    # would truncate to whole seconds and split 1800.4s gaps differently.
    gaps = ev.withColumn(
        "is_start",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > 1_800_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = gaps.withColumn("session_no", F.sum("is_start").over(wsum))
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ).drop("session_no")


@query(
    "window_gap_fill",
    oracle="""
    -- time-series resample + gap fill: hourly buckets per user over
    -- the user's own [first, last] span; missing hours appear with
    -- n_events=0 and the last observed value carried forward (LOCF).
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               count(*) AS n_events,
               round(sum(value), 6) AS obs_value
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    )
    SELECT g.user_id, g.bucket,
           coalesce(o.n_events, 0) AS n_events,
           last_value(o.obs_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket = g.bucket
    """,
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT time-series gap fill — resample each user's event stream to
    a dense hourly grid (missing hours materialized with n_events=0)
    and forward-fill the last observed hourly value (LOCF), the
    standard densify step before any per-entity time-series model.

    Plan: every stage — the hourly pre-aggregate, the per-user span,
    the grid↔observation join, and the LOCF window — is keyed on
    user_id, so Catalyst plans ONE exchange and reuses it end to end.
    The dense grid is generated by ``sequence()`` + ``explode`` from
    the 2-column span table (narrow, no shuffle), so grid size is
    bounded by hours-of-span per user, independent of event volume:
    at 100 TB the pre-aggregate collapses the fact table first and
    everything after operates on |users × active-hours| rows. A
    pathological always-on key costs its span in hours, not its event
    count."""
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("obs_value"),
    )
    span = obs.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("obs_value", ignorenulls=True).over(w).alias(
                "filled_value"
            ),
        )
    )


#: EMA smoothing factor for window_ema
EMA_ALPHA = 0.2


@query(
    "window_ema",
    oracle=f"""
    -- exponential moving average per user, CLOSED FORM: the recursive
    -- e_i = a*v_i + (1-a)*e_(i-1) with e_1 = v_1 unrolls to
    -- e_n = (1-a)^(n-1)*v_1 + sum_(i=2..n) a*(1-a)^(n-i)*v_i —
    -- a weighted sum, so the sequential recurrence becomes one
    -- window rank + one aggregate (no iteration, no UDF).
    WITH r AS (
        SELECT user_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id, max(n) AS n_events,
           round(sum(value * CASE WHEN rn = 1
                 THEN power(1 - {EMA_ALPHA}, n - 1)
                 ELSE {EMA_ALPHA} * power(1 - {EMA_ALPHA}, n - rn)
           END), 6) AS ema
    FROM r GROUP BY user_id
    """,
)
def window_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of each user's event values — the
    time-series smoothing primitive that LOOKS inherently sequential
    (e_i depends on e_{i-1}) but unrolls to a weighted sum, turning
    the recurrence into rank + aggregate.

    Plan: the rank window and the weighted-sum aggregate share the
    user_id partitioning — ONE shuffle total. This is the general
    trick for linear recurrences at 100 TB: closed-form the
    dependency so each row's contribution is independent, and the
    engine parallelizes freely; the alternative (collect_list + fold,
    or applyInPandas) serializes each key's history through one task
    and caps parallelism at |keys|."""
    ev = read_table(spark, sf_dir, "events")
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    decay = 1 - EMA_ALPHA
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(decay), F.col("n") - 1)
    ).otherwise(EMA_ALPHA * F.pow(F.lit(decay), F.col("n") - F.col("rn")))
    return r.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.round(F.sum(F.col("value") * weight), 6).alias("ema"),
    )


@query(
    "window_rolling_range",
    oracle="""
    -- TIME-RANGE rolling window (not row-count): at each event, the
    -- count and value-sum of the SAME user's events in the trailing
    -- 7 days — frame membership is defined by timestamps, so ties and
    -- gaps behave correctly where a ROWS frame would not.
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_7d,
           round(sum(value) OVER w, 4) AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling aggregates per user — the RANGE-frame
    window (frame bounded by event-time distance, not row count):
    the feature-engineering primitive behind "activity in the last N
    days" model features and rate-limit counters.

    Plan: one shuffle + sort on (user_id, ts); the range frame is
    evaluated with a sliding two-pointer over each sorted partition —
    no self-join (the naive e1⋈e2 ON ts BETWEEN formulation is a
    range join that explodes quadratically on active keys). Spark
    needs the ORDER BY key numeric for rangeBetween, so the frame is
    expressed in epoch MICROseconds — exactly the 7-day interval the
    oracle states in timestamp terms."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 4).alias("sum_7d"),
    )


#: trailing window length (days) for the sliding distinct-user count.
SLIDE_DISTINCT_DAYS = 7


@query(
    "window_sliding_distinct",
    oracle=f"""
    -- trailing-{SLIDE_DISTINCT_DAYS}-day DISTINCT active users per
    -- day — the DAU/WAU-style metric COUNT(DISTINCT) OVER RANGE that
    -- SQL engines refuse (distinct is not frame-mergeable). Exact
    -- decomposition: collapse to distinct (user, day) rows, explode
    -- each into the {SLIDE_DISTINCT_DAYS} trailing report days it
    -- covers, then count DISTINCT users per report day.
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    span AS (SELECT min(d) AS d_lo, max(d) AS d_hi FROM ud),
    cover AS (
        SELECT ud.user_id, ud.d + off::INT AS rep_day
        FROM ud, unnest(generate_series(0, {SLIDE_DISTINCT_DAYS - 1}))
                     AS u(off), span
        WHERE ud.d + off::INT <= span.d_hi
    )
    SELECT strftime(rep_day, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS active_{SLIDE_DISTINCT_DAYS}d
    FROM cover GROUP BY 1
    """,
)
def window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{SLIDE_DISTINCT_DAYS}-day distinct active users per
    day (the WAU curve). COUNT(DISTINCT) over a sliding RANGE frame is
    unsupported in every SQL engine because distinct doesn't merge
    across frames; the scale-correct decomposition: dedupe to
    (user, day) rows first (the big shuffle, heavily collapsed
    map-side), explode each into the ≤{SLIDE_DISTINCT_DAYS} report
    days it covers, count distinct per day. Work is
    |user-days| × {SLIDE_DISTINCT_DAYS}, independent of raw event
    volume — events collapse before the fan-out."""
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    hi = ud.agg(F.max("d").alias("d_hi"))
    cover = (
        ud.crossJoin(F.broadcast(hi))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(SLIDE_DISTINCT_DAYS - 1))
            ).alias("off"),
            "d",
            "d_hi",
        )
        .select(
            "user_id", F.date_add(F.col("d"), F.col("off")).alias("rep_day"),
            "d_hi",
        )
        .filter(F.col("rep_day") <= F.col("d_hi"))
    )
    return cover.groupBy(
        F.date_format("rep_day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count_distinct("user_id").alias(
            f"active_{SLIDE_DISTINCT_DAYS}d"
        )
    )


@query(
    "window_ohlc_bars",
    oracle="""
    -- hourly OHLC bars per event type — the time-bar compaction every
    -- time-series store ships (open/close = value at the min/max
    -- (ts, event_id) in the bucket, ties broken by event_id, so the
    -- bar is deterministic even with colliding timestamps).
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS bar,
               epoch_us(ts) AS tus, event_id, value
        FROM events
    ),
    o AS (
        SELECT event_type, bar, value AS open FROM b
        QUALIFY row_number() OVER (PARTITION BY event_type, bar
                                   ORDER BY tus, event_id) = 1
    ),
    c AS (
        SELECT event_type, bar, value AS close FROM b
        QUALIFY row_number() OVER (PARTITION BY event_type, bar
                                   ORDER BY tus DESC, event_id DESC) = 1
    ),
    agg AS (
        SELECT event_type, bar,
               count(*)::BIGINT AS n,
               min(value) AS low, max(value) AS high,
               round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS volume
        FROM b GROUP BY 1, 2
    )
    SELECT agg.event_type, strftime(agg.bar, '%Y-%m-%d %H:00') AS bar,
           n, open, high, low, close, volume
    FROM agg JOIN o USING (event_type, bar) JOIN c USING (event_type, bar)
    """,
)
def window_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open-high-low-close) bars per event type — the
    standard time-series downsampling for dashboards and backtests.
    Open/close are the values at the earliest/latest (ts, event_id)
    in the bucket — min_by/max_by over an ordering STRUCT, which
    partial-aggregates map-side, instead of a row_number window that
    would sort every bucket. Volume sums in DECIMAL so bar totals are
    aggregation-order-exact.

    Scale shape: ONE groupBy on (type, hour) with full map-side
    combine — no window, no sort; exactly how a 100 TB tick stream
    compacts to bars."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        F.unix_micros("ts").alias("tus"),
        "event_id",
        "value",
    )
    okey = F.struct("tus", "event_id")
    agg = b.groupBy("event_type", "bar").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("volume"),
        F.expr("min_by(value, struct(tus, event_id))").alias("open"),
        F.expr("max_by(value, struct(tus, event_id))").alias("close"),
    )
    return agg.select(
        "event_type",
        F.date_format("bar", "yyyy-MM-dd HH:00").alias("bar"),
        "n",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@query(
    "window_activity_streaks",
    oracle="""
    -- longest consecutive-day activity streak per user — the classic
    -- gaps-and-islands readout (retention teams live on this).
    -- Island id = day - row_number(): constant within a consecutive
    -- run, integer-exact.
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY d) AS INT) AS grp
        FROM ud
    ),
    runs AS (
        SELECT user_id, grp, count(*)::BIGINT AS len,
               min(d) AS run_start
        FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           max(len) AS longest_streak,
           count(*)::BIGINT AS n_streaks,
           strftime(min(run_start), '%Y-%m-%d') AS first_active_day
    FROM runs GROUP BY user_id
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day streak per user (plus streak count and
    first active day) — the gaps-and-islands pattern: within a user's
    sorted distinct days, ``day − row_number()`` is constant exactly
    across a consecutive run, so runs fall out of one groupBy. Same
    trick `multimodal_audio_vad`'s segmenter uses on frames, here on
    the calendar.

    Scale shape: events collapse to distinct (user, day) rows first
    (the big map-side-combined shuffle); the island window partitions
    by user — bounded per-partition work, fully parallel across
    users."""
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("d").alias("run_start"),
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.date_format(F.min("run_start"), "yyyy-MM-dd").alias(
            "first_active_day"
        ),
    )


@query(
    "window_time_weighted_avg",
    oracle="""
    -- time-weighted average (TWAP) of `value` per (user, day): each
    -- reading is held until the next one (last reading held to day
    -- end), so irregular sampling can't bias the mean toward chatty
    -- periods. Durations are EXACT integer microseconds (epoch_us);
    -- the one double division happens last.
    WITH s AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               epoch_us(ts) AS t_us,
               coalesce(
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id),
                   epoch_us(CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP))
               ) AS t_next_us
        FROM events
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           count(*)::BIGINT AS n_readings,
           sum(t_next_us - t_us)::BIGINT AS covered_us,
           round(sum(value * (t_next_us - t_us))
                     / sum(t_next_us - t_us), 6) AS twap
    FROM s GROUP BY user_id, day
    """,
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of `value` per (user, day) — the
    correct mean for irregularly-sampled state readings (sensor
    values, account balances, queue depths): each reading is weighted
    by how long it was CURRENT (held until the next reading; the last
    one held to day end), so a burst of samples in one minute counts
    for one minute, not for most of the average. Durations are exact
    integer microseconds end to end; the single double division is the
    final step.

    Scale shape: one shuffle on (user, day) shared by the lead()
    window and the aggregate — Catalyst plans a single exchange+sort.
    Day keys bound every partition's span, so state never grows with
    history; this is also the batch twin of a streaming session
    holdover (lead == the next micro-batch's arrival)."""
    ev = read_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    day_end_us = F.unix_micros(
        F.date_add(day, 1).cast("timestamp")
    )
    s = ev.select(
        "user_id",
        day.alias("day"),
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.coalesce(
            F.lead(F.unix_micros("ts")).over(w), day_end_us
        ).alias("t_next_us"),
    )
    dt = F.col("t_next_us") - F.col("t_us")
    return (
        s.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_readings"),
            F.sum(dt).cast("long").alias("covered_us"),
            F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias(
                "twap"
            ),
        )
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_readings",
            "covered_us",
            "twap",
        )
    )


@query(
    "window_interpolate_linear",
    oracle="""
    -- hourly resample with LINEAR interpolation — the sensor-grade
    -- sibling of window_gap_fill's LOCF: a missing hour gets the
    -- value on the straight line between its previous and next
    -- observed buckets (time-weighted by integer hour offsets, so
    -- the only float ops are the same interpolation arithmetic on
    -- both engines). Observed buckets keep their own (rounded) mean.
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(avg(value), 6) AS obs_value
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.bucket, o.obs_value,
               epoch_us(g.bucket) // 3600000000 AS t
        FROM grid g LEFT JOIN obs o
          ON o.user_id = g.user_id AND o.bucket = g.bucket
    ),
    ctx AS (
        SELECT user_id, bucket, obs_value, t,
               last_value(obs_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_prev,
               last_value(CASE WHEN obs_value IS NOT NULL THEN t END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS t_prev,
               first_value(obs_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS v_next,
               first_value(CASE WHEN obs_value IS NOT NULL THEN t END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS t_next
        FROM j
    )
    SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           obs_value IS NOT NULL AS observed,
           -- floor(x*1e6 + 0.5)/1e6 instead of round(): Spark's
           -- round() goes through the double's SHORTEST decimal repr
           -- (BigDecimal.valueOf), so 32.55781249999999715 prints as
           -- "32.5578125" and HALF_UP kicks it UP while a true-value
           -- round keeps it down — the floor form is the identical
           -- IEEE op sequence on both engines (values are >= 0 here)
           floor((CASE WHEN obs_value IS NOT NULL THEN obs_value
                       ELSE v_prev + (v_next - v_prev)
                            * ((t - t_prev)::DOUBLE / (t_next - t_prev))
                  END) * 1000000 + 0.5) / 1000000 AS value
    FROM ctx
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation per user — the
    standard sensor/metric regridding (LOCF's sibling,
    `window_gap_fill`): each missing hour gets the straight-line
    value between its neighboring observations, time-weighted on
    exact integer hour offsets; only the interpolation arithmetic is
    float, and it is the identical expression on both engines.

    Scale shape: events collapse to (user, hour) buckets map-side,
    the per-user grid explodes from a 2-row span (bounded by span
    hours), and all four IGNORE-NULLS context windows share ONE
    (user, bucket) sort — Catalyst plans a single exchange+sort for
    the whole context block. State never exceeds a user's span."""
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.avg("value"), 6).alias("obs_value"))
    span = obs.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    j = grid.join(obs, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        "obs_value",
        (F.unix_micros("bucket") / F.lit(3600000000)).cast("long").alias(
            "t"
        ),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward context runs on a DESCENDING running frame: Spark's
    # (CURRENT ROW, UNBOUNDED FOLLOWING) frame recomputes its
    # aggregate from scratch per row — O(span^2) per user, measured
    # 13.8 s at sf0.1 — while last(ignorenulls) over bucket-DESC with
    # UNBOUNDED PRECEDING is the incremental running form (1.9 s)
    # and returns the identical nearest-following observation.
    wfd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t_obs = F.when(F.col("obs_value").isNotNull(), F.col("t"))
    ctx = j.select(
        "user_id",
        "bucket",
        "obs_value",
        "t",
        F.last("obs_value", ignorenulls=True).over(wb).alias("v_prev"),
        F.last(t_obs, ignorenulls=True).over(wb).alias("t_prev"),
        F.last("obs_value", ignorenulls=True).over(wfd).alias("v_next"),
        F.last(t_obs, ignorenulls=True).over(wfd).alias("t_next"),
    )
    interp = F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * (
        (F.col("t") - F.col("t_prev")).cast("double")
        / (F.col("t_next") - F.col("t_prev"))
    )
    return ctx.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.col("obs_value").isNotNull().alias("observed"),
        (
            F.floor(
                F.when(F.col("obs_value").isNotNull(), F.col("obs_value"))
                .otherwise(interp)
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("value"),
    )
