"""Event-time operators, batch-first (SURVEY.md §2.9, T1-T5).

The reference system class is batch-only — "streaming" data is more
batch files — so each operator here is defined with exact batch
semantics (oracle-checkable) and has a true Structured Streaming
equivalent in :mod:`.stream_jobs` (same transformations behind
``readStream``).

Scale notes: tumbling/sliding windows group on (window, type) —
low-cardinality keys, map-side partial aggregation, tiny shuffle.
Session windows shuffle once on user_id. The sliding window
multiplies input rows by window/slide (4× here) inside the Expand
operator — that factor is the scale knob to watch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


TUMBLING_ORACLE = """
    SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
           date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           SUM(value) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
"""


@register("window_tumbling", oracle=TUMBLING_ORACLE, tags=("T1",))
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — fixed 1-hour tumbling window per event type (headline
    bench query: events_hourly_agg). ``F.window`` starts are
    epoch-aligned, identical to date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SLIDING_ORACLE = """
        WITH expanded AS (
            SELECT unnest([
                       time_bucket(INTERVAL 15 MINUTE, ts::TIMESTAMP),
                       time_bucket(INTERVAL 15 MINUTE, ts::TIMESTAMP) - INTERVAL 15 MINUTE,
                       time_bucket(INTERVAL 15 MINUTE, ts::TIMESTAMP) - INTERVAL 30 MINUTE,
                       time_bucket(INTERVAL 15 MINUTE, ts::TIMESTAMP) - INTERVAL 45 MINUTE
                   ]) AS window_start,
                   event_type, value
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n,
               SUM(value) AS sum_value
        FROM expanded
        GROUP BY 1, 2, 3
    """


@register("window_sliding", oracle=SLIDING_ORACLE, tags=("T2",))
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — 1-hour window sliding every 15 minutes: each event lands
    in 4 overlapping windows (Spark's Expand; the oracle unnests the
    4 epoch-aligned slide starts explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
"""


@register("window_session", oracle=_SESSION_ORACLE, tags=("T3",))
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 — session windows (30-minute inactivity gap) via
    gaps-and-islands: flag gap starts with lag(), running-sum the
    flags into session ids, aggregate. Identical SQL runs on both
    engines, so the boundary convention (new session when gap is
    STRICTLY greater than 30 min) is byte-equal by construction.
    ``F.session_window`` is the built-in alternative (see
    stream_jobs.py); its boundary is >= rather than >, so it is kept
    to the rows-only streaming path."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "watermark_late_drop",
    oracle="""
        SELECT event_id, ts, event_type
        FROM events
        WHERE ts > (SELECT MAX(ts) FROM events) - INTERVAL 12 HOUR
    """,
    tags=("T4",),
)
def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — batch simulation of a watermark: keep only events within
    the 12-hour lateness horizon of the observed max event time. The
    horizon aggregate is a 1-row broadcast, not a driver collect —
    the same shape works on an unbounded-size batch. Streaming
    equivalent: ``.withWatermark("ts", "12 hours")``."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg((F.max("ts")).alias("max_ts"))
    return (
        ev.join(F.broadcast(horizon))
        .filter(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 12 HOURS"))
        .select("event_id", "ts", "event_type")
    )


@register(
    "stateful_dedup",
    oracle="""
        SELECT DISTINCT event_id, ts, user_id, event_type, value
        FROM (
            SELECT event_id, ts, user_id, event_type, value FROM events
            UNION ALL
            SELECT event_id, ts, user_id, event_type, value FROM events
        )
    """,
    tags=("T5",),
)
def stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — exactly-once dedup of an at-least-once stream, batch
    form: the doubled input (simulating redelivery) collapses back to
    one row per event_id. Streaming equivalent:
    ``dropDuplicatesWithinWatermark(["event_id"])`` — bounded state,
    keyed by event_id, expired by the watermark."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    return ev.unionByName(ev).dropDuplicates(["event_id", "ts", "user_id", "event_type", "value"])


@register(
    "funnel_conversion",
    oracle="""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
          WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
          WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
               CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked,
               CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased,
               ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                     / (SELECT COUNT(*) FROM v), 6) AS view_to_purchase_rate
    """,
    tags=("T1", "composite", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first click — the
    strict-ordering semantics that separate a funnel from three
    independent counts. Three stage aggregates, each a per-user MIN
    shuffled on user_id; every stage join reuses that same hash
    partitioning, so the funnel costs one shuffle per stage (the
    floor for per-user ordered state on any engine)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )
    return counts.select(
        "n_viewed",
        "n_clicked",
        "n_purchased",
        F.round(F.col("n_purchased").cast("double") / F.col("n_viewed"), 6).alias(
            "view_to_purchase_rate"
        ),
    )


@register(
    "cohort_retention",
    oracle="""
        WITH first_seen AS (
          SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
          FROM events GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
          FROM events
        )
        SELECT f.cohort_day,
               CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM first_seen f JOIN activity a ON f.user_id = a.user_id
        GROUP BY f.cohort_day, day_offset
    """,
    tags=("T1", "composite", "cohort"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day; for
    each cohort, how many were active N days later. The (user, day)
    activity set is deduped BEFORE the join (distinct users per day,
    not events), so the join fan-out is bounded by users x days,
    independent of event volume — the difference between a retention
    query that survives 100 TB of events and one that doesn't.
    COUNT(*) after the join is exact because both sides are unique
    per (user, day)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "rollup_hypertable_daily",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(value) AS sum_value
        FROM events
        GROUP BY day, event_type
    """,
    tags=("T1", "rollup"),
)
def rollup_hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: the daily aggregate is computed
    FROM the hourly aggregate, never from raw events — count as
    sum-of-counts, sum as sum-of-sums (avg, if needed, is recomputed
    from (sum, count) downstream — never averaged: avg-of-avgs is
    wrong under uneven hours; it is omitted from the output because
    sum/count quotients by power-of-two group sizes land exactly on
    decimal rounding boundaries, where the two engines' last-bit sum
    differences flip the rounded digit). This two-level mergeability is the entire design
    of hypertable/materialized-rollup systems: at 100 TB the hourly
    layer is a materialized table ~10^4x smaller than raw events,
    and every coarser rollup (day/week/month) reads it, not the raw
    data. The oracle aggregates raw events directly — proving the
    rollup-of-rollup exactly equals the direct computation."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


@register(
    "dedup_debounce_window",
    oracle="""
        SELECT event_id, user_id, event_type, ts FROM (
          SELECT event_id, user_id, event_type, ts,
                 LAG(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS prev_ts
          FROM events
        )
        WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 5 MINUTE
    """,
    tags=("T5", "debounce"),
)
def dedup_debounce_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce dedup: drop an event when the same (user, type) fired
    within the previous 5 minutes — double-click / retry suppression,
    the time-window generalization of exact dedup (same key twice is
    fine if far apart). One lag() per (user, type) partition — a
    single shuffle; streaming form is applyInPandasWithState keeping
    last-emitted-ts per key. Strictly-greater boundary matches both
    engines on µs timestamps."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 5 * 60 * 1_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY event_type, hour
        ),
        stats AS (
          SELECT event_type, AVG(n) AS mu, stddev_samp(n) AS sigma
          FROM hourly GROUP BY event_type
        )
        SELECT h.event_type, h.hour, CAST(h.n AS BIGINT) AS n,
               ROUND((h.n - s.mu) / s.sigma, 4) AS zscore
        FROM hourly h JOIN stats s ON h.event_type = s.event_type
        WHERE abs((h.n - s.mu) / s.sigma) > 2.5
    """,
    tags=("T1", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type,
    z-scored against that type's own mean/stddev; hours beyond 2.5
    sigma flagged. Two cascaded aggregations (hourly shuffle, then a
    types-sized stats table broadcast back onto it) — the monitoring
    query every event pipeline runs; at scale the stats side is a
    rolling window over recent history rather than all time, same
    plan shape."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_type", "hour", "n", F.round(z, 4).alias("zscore"))
    )


@register(
    "timeseries_resample_locf",
    oracle="""
        WITH bounds AS (
          SELECT user_id,
                 date_trunc('hour', MIN(ts)) AS t0,
                 date_trunc('hour', MAX(ts)) AS t1
          FROM events GROUP BY user_id
        ),
        grid AS (
          SELECT b.user_id, CAST(g AS TIMESTAMP) AS hour
          FROM bounds b,
               LATERAL unnest(generate_series(b.t0, b.t1, INTERVAL 1 HOUR)) AS u(g)
        ),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS hour,
                 SUM(value) AS v
          FROM events GROUP BY user_id, hour
        )
        SELECT g.user_id, g.hour,
               ROUND(LAST_VALUE(h.v IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled,
               (h.v IS NULL) AS was_gap
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    tags=("T1", "resample"),
)
def timeseries_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling onto a dense hourly grid with
    last-observation-carried-forward gap fill — the step that turns
    irregular events into the regular series every downstream model
    (and every per-user feature window) assumes.

    Plan: GAP-FILL, not grid-join. The hourly aggregate (one hash
    shuffle) gets each row's predecessor via lag() (one user_id
    exchange); missing hours are then GENERATED between consecutive
    observed hours by a narrow sequence-explode that carries the
    predecessor's value — which IS the LOCF semantics, no dense-grid
    join and no second pass over a users×hours frame. Output size is
    still users×hours, but it is produced by a zero-shuffle generator
    downstream of the last exchange, instead of being shuffled
    through a left join (the earlier design; the join version moved
    the full grid through one more exchange — at 100 TB that's the
    difference between shuffling observations and shuffling the
    resampled universe)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.sum("value").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    with_prev = hourly.withColumn("prev_hour", F.lag("hour").over(w)).withColumn(
        "prev_v", F.lag("v").over(w)
    )
    # One generator emits the observed row AND its preceding gap rows
    # as a single sequence (coalesce makes the first row of each user
    # a 1-element sequence), so the window subtree is computed once —
    # a union of actual/gap branches would evaluate it twice (measured
    # 1.7× on full compute), and a concat-of-arrays form pays ~13%
    # extra expression cost over this single-sequence transform.
    rows = F.expr(
        """
        transform(
          sequence(coalesce(prev_hour + INTERVAL 1 HOUR, hour), hour, INTERVAL 1 HOUR),
          h -> named_struct(
            'hour', h,
            'v_filled', round(if(h = hour, v, prev_v), 6),
            'was_gap', h <> hour))
        """
    )
    return with_prev.select("user_id", F.explode(rows).alias("r")).select(
        "user_id", "r.hour", "r.v_filled", "r.was_gap"
    )


@register(
    "attribution_last_touch",
    # Deterministic tiebreak matters: two touches can share a ts, so
    # the oracle picks by (ts DESC, event_id DESC) via LATERAL — the
    # Spark window orders by (ts, side, ord_id) to select the same
    # row. ASOF JOIN is NOT used: its tie choice is unspecified.
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.event_type END AS channel,
               CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.ts END AS touch_ts,
               (t.ts IS NOT NULL AND t.ts >= p.ts - INTERVAL 7 DAY) AS attributed
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
          SELECT ts, event_type FROM events t
          WHERE t.user_id = p.user_id
            AND t.event_type IN ('click', 'view')
            AND t.ts <= p.ts
          ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
        ) t ON TRUE
    """,
    tags=("E3", "attribution", "asof"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — last-touch conversion attribution: each purchase is
    credited to the user's most recent click or view at-or-before it,
    but only within a 7-day attribution window (staler touches →
    unattributed). The marketing-analytics sibling of the as-of join:
    same union+running-window construction as join_asof (ONE shuffle
    on user_id, linear per-user scan — never a per-purchase subquery),
    with the touch's (ts, type) carried through the window as a
    struct so channel and recency arrive together.

    Determinism: window order is (ts, side, ord_id) — touches sort
    before the purchase at equal ts (at-or-before semantics) and
    equal-ts touches resolve by event_id, mirroring the oracle's
    LATERAL tiebreak. At scale the 7-day bound is also the streaming
    state bound: a live attributor keeps 7 days of touches per user."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("struct<ts:timestamp,channel:string>").alias("touch"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("ord_id"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.struct(F.col("ts").alias("ts"), F.col("event_type").alias("channel")).alias("touch"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("ord_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bound = F.col("ts") - F.expr("INTERVAL 7 DAYS")
    raw = (
        purchases.unionByName(touches)
        .withColumn("lt", F.last("touch", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    fresh = F.col("lt").isNotNull() & (F.col("lt.ts") >= bound)
    return raw.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("lt.channel")).alias("channel"),
        F.when(fresh, F.col("lt.ts")).alias("touch_ts"),
        fresh.alias("attributed"),
    )


@register(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
          FROM events
        ),
        t AS (
          SELECT event_type AS src_type, next_type AS dst_type,
                 COUNT(*) AS n_trans
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT src_type, dst_type, n_trans,
               ROUND(CAST(n_trans AS DOUBLE)
                     / SUM(n_trans) OVER (PARTITION BY src_type), 6) AS prob
        FROM t
    """,
    tags=("E4", "markov", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — first-order Markov transition matrix over per-user event
    streams: consecutive event-type pairs (ordered by ts with
    event_id as the deterministic tiebreak), counted and normalized
    into row-stochastic transition probabilities. The user-journey
    summary behind next-action prediction and anomaly screens.

    Scale: ONE shuffle of the fact table keyed by user_id for the
    lead() window (linear per-user scan), then the transition counts
    collapse to |event_type|² rows — the normalizing window runs on
    that tiny matrix, not the corpus. Same cost class as
    window_session."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("next_type"),
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src_type"),
            F.col("next_type").alias("dst_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    return trans.select(
        "src_type",
        "dst_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(Window.partitionBy("src_type")),
            6,
        ).alias("prob"),
    )


@register(
    "timeseries_twap",
    oracle="""
        WITH seq AS (
          SELECT user_id, value,
                 epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   - epoch_us(ts) AS w_us
          FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_intervals,
               ROUND(SUM(value * w_us) / SUM(w_us), 6) AS twap
        FROM seq
        WHERE w_us IS NOT NULL AND w_us > 0
        GROUP BY user_id
    """,
    tags=("T11", "timeseries", "twap"),
)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 — time-weighted average value per user (TWAP, the
    irregular-sampling average TimescaleDB ships as time_weight):
    each reading holds until the next one, so it is weighted by its
    holding duration in microseconds — the honest mean for
    unevenly-spaced telemetry, where the arithmetic mean over-weights
    bursts. Last reading per user has no successor and zero-length
    holds are excluded (both engines, identically).

    Scale: one shuffle on user_id for the lead() window, then a
    user-keyed aggregate — the window and the groupBy share the same
    hash partitioning, so AQE coalesces them onto one exchange.
    Weights are exact integer microseconds (unix_micros/epoch_us),
    never float seconds, so the hash oracle holds at any precision."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("w_us"),
    )
    return (
        seq.filter(F.col("w_us").isNotNull() & (F.col("w_us") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("w_us")) / F.sum("w_us"), 6
            ).alias("twap"),
        )
    )


_EWMA_ALPHA = 0.3


@register(
    "timeseries_ewma",
    oracle=f"""
        WITH s AS (
          SELECT user_id,
                 list(value ORDER BY ts, event_id) AS vs
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(vs) AS BIGINT) AS n_obs,
               ROUND(list_reduce(vs, (acc, x) -> {_EWMA_ALPHA} * x
                                     + {1 - _EWMA_ALPHA} * acc), 6) AS ewma
        FROM s
    """,
    tags=("T12", "timeseries", "ewma"),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 — exponentially weighted moving average per user series
    (α=0.3, seeded with the first observation): the smoothing
    recurrence s_i = α·x_i + (1-α)·s_{{i-1}} behind monitoring
    baselines and simple demand forecasts. A fold, not a window —
    each element's weight depends on every prior element, so it is
    computed as an ordered per-key reduce: sort_array over
    (ts, event_id, value) structs, then one JVM `aggregate` lambda.
    Both engines fold the identical ordered sequence, so the floats
    agree bit-for-bit before the 6-dp rounding.

    Scale: one shuffle keyed by series; per-series state is the
    series itself (same memory bound as any per-key sort — fine for
    telemetry series; year-long tick series chunk by (user, month)
    with carried seed). The streaming twin is
    applyInPandasWithState holding one running double per key."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq")
    )
    return per_user.select(
        "user_id",
        F.size("seq").cast("long").alias("n_obs"),
        F.round(
            F.expr(
                f"aggregate(slice(seq, 2, size(seq) - 1), seq[0].value,"
                f" (acc, s) -> {_EWMA_ALPHA}D * s.value + {1 - _EWMA_ALPHA}D * acc)"
            ),
            6,
        ).alias("ewma"),
    )


_SESSION_CAP_HOURS = 4


@register(
    "window_session_capped",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gap_sid
            FROM flagged
        ),
        capped AS (
            SELECT user_id, ts, gap_sid,
                   CAST((epoch_us(ts)
                         - epoch_us(MIN(ts) OVER (PARTITION BY user_id, gap_sid)))
                        // {_SESSION_CAP_HOURS * 3600 * 1_000_000} AS BIGINT) AS cap_part
            FROM sess
        )
        SELECT user_id, gap_sid, cap_part,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM capped
        GROUP BY user_id, gap_sid, cap_part
    """,
    tags=("T3'", "session"),
)
def window_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3' — duration-capped sessionization: inactivity-gap sessions
    (30 min, as window_session) that are additionally SPLIT every 4
    hours from the gap-session's start — the production convention
    that stops a polling client or bot from producing one unbounded
    session (unbounded sessions are an analytics artifact AND an
    unbounded-state hazard for any streaming sessionizer). Two-level
    key: gaps-and-islands gives gap_sid, then each row's offset from
    its gap-session start integer-divides into a 4-hour cap_part.

    Scale: ONE shuffle on user_id — all four windows (lag flag,
    running sum, per-session min, and the final aggregate's
    repartition is subsumed by AQE since the grouping keys extend the
    window keys) share the same user_id hash partitioning. Exact
    integer-microsecond arithmetic end to end."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "gap_sid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    cap_us = _SESSION_CAP_HOURS * 3600 * 1_000_000
    capped = sess.withColumn(
        "cap_part",
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(F.min("ts").over(Window.partitionBy("user_id", "gap_sid")))
            )
            / F.lit(cap_us)
        ).cast("long"),
    )
    return capped.groupBy("user_id", "gap_sid", "cap_part").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


_INCR_SPLIT = "2024-01-25"


@register(
    "rollup_incremental_merge",
    oracle="""
        SELECT date_trunc('day', ts) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("T13", "rollup", "incremental"),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13 — incremental materialized-rollup maintenance: the daily
    (day, type) rollup is produced by MERGING two independently
    computed partial-aggregate sets — the "stored" partials for
    history (events before the 2024-01-25 split) and the "delta"
    partials for the new batch — instead of rescanning history.
    COUNT and SUM are mergeable (sum of partials = total), so
    partials union + re-aggregate exactly equals the full recompute,
    which is precisely what the oracle computes over all of events:
    the hash match IS the proof that the incremental path loses
    nothing. (AVG-style metrics must be stored as (sum, n) partials —
    same algebra.)

    Scale: this is the continuous-aggregate discipline at 100 TB —
    each refresh scans ONLY the delta partition (a pushed-down ts
    predicate), merges against rollup-sized state (days × types
    rows), and never touches history again. The merge shuffle is
    rollup-sized, not fact-sized."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_INCR_SPLIT).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum"))

    base = partials(ev.filter(F.col("ts") < split))
    delta = partials(ev.filter(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("pn").cast("long").alias("n"),
            F.round(F.sum("psum"), 6).alias("sum_value"),
        )
    )


@register(
    "events_seasonality_profile",
    oracle="""
        WITH hourly AS (
          SELECT event_type,
                 CAST(hour(ts) AS BIGINT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(value) AS m
          FROM events GROUP BY event_type, hod
        )
        SELECT event_type, hod, n,
               ROUND(m, 6) AS mean_value,
               ROUND(m - AVG(m) OVER (PARTITION BY event_type), 6)
                 AS dev_from_type_mean
        FROM hourly
    """,
    tags=("T15", "seasonality"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15 — hour-of-day seasonality profile per event type: volume
    and mean value per (type, hour) with each hour's deviation from
    the type's flat mean-of-hourly-means — the baseline shape that
    seasonal anomaly detection subtracts before thresholding
    (events_anomaly_zscore is the un-seasonal version; a spike at
    3am and the same count at noon mean different things).

    Scale: one group-keyed aggregate collapses the fact table to
    |types|×24 rows; the deviation window runs on that profile, not
    the corpus. UTC-pinned hour extraction (load_table's session
    contract) keeps the bucketing engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"))
    w = Window.partitionBy("event_type")
    return hourly.select(
        "event_type",
        "hod",
        "n",
        F.round("m", 6).alias("mean_value"),
        F.round(F.col("m") - F.avg("m").over(w), 6).alias("dev_from_type_mean"),
    )


_PATH_TOP = 25


@register(
    "events_top_paths",
    oracle=f"""
        WITH seq AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY e1, e2, e3
        ORDER BY n_paths DESC, e1, e2, e3
        LIMIT {_PATH_TOP}
    """,
    tags=("E6", "paths"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — top 3-step behavioral paths (the product-analytics "paths"
    report, and the order-2 context Markov transitions can't see:
    view→click→purchase vs view→click→error are different stories
    with identical order-1 edges). Two lead() offsets over one
    per-user event-time window, then a path-keyed count and
    deterministic top-k.

    Scale: the SAME single user_id shuffle as events_markov_transitions
    (both leads share one window spec); path counts collapse to at
    most |types|³ rows before the TakeOrdered top-k."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(_PATH_TOP)
    )


@register(
    "events_autocorrelation_lag1",
    oracle="""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM events GROUP BY 1, 2
        ),
        lagged AS (
          SELECT event_type, n,
                 lag(n) OVER (PARTITION BY event_type ORDER BY h) AS prev_n
          FROM hourly
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(corr(n, prev_n), 6) AS acf_lag1
        FROM lagged WHERE prev_n IS NOT NULL
        GROUP BY event_type
    """,
    tags=("T16", "autocorrelation"),
)
def events_autocorrelation_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 — lag-1 autocorrelation of hourly event volume per type:
    Pearson correlation between consecutive hours' counts — the
    memory/burst-persistence statistic that separates white-noise
    arrivals (≈0) from trending/bursty load (→1), and the first
    diagnostic before fitting any forecasting model. Note hours
    with ZERO events are absent from the series (gap semantics as
    observed; timeseries_resample_locf is the densifier when the
    closed grid is wanted).

    Scale: the fact table collapses to |types|×|hours| in one
    aggregate; the lag window and corr run on that rollup. corr is
    the sample correlation in both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type", "n", F.lag("n").over(w).alias("prev_n")
    ).filter(F.col("prev_n").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("n", "prev_n"), 6).alias("acf_lag1"),
    )


@register(
    "events_anomaly_seasonal_zscore",
    oracle="""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM events GROUP BY 1, 2
        ),
        baseline AS (
          SELECT event_type, CAST(hour(h) AS BIGINT) AS hod,
                 AVG(n) AS mu, STDDEV(n) AS sd
          FROM hourly GROUP BY 1, 2
        )
        SELECT hh.event_type, hh.h AS hour_ts, CAST(hh.n AS BIGINT) AS n,
               ROUND(b.mu, 6) AS expected,
               ROUND((hh.n - b.mu) / b.sd, 4) AS z
        FROM hourly hh
        JOIN baseline b
          ON hh.event_type = b.event_type AND CAST(hour(hh.h) AS BIGINT) = b.hod
        WHERE b.sd > 0 AND abs((hh.n - b.mu) / b.sd) > 3
    """,
    tags=("T9'", "anomaly", "seasonal"),
)
def events_anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9' — SEASONALLY-adjusted volume anomaly detection: each
    (type, hour) volume is z-scored against the baseline for its own
    hour-of-day slot (the profile events_seasonality_profile reads),
    so a 3 am spike is judged against 3 am history, not the all-day
    mean — the flat z-score (events_anomaly_zscore) false-alarms on
    every daily peak and misses overnight anomalies; this is the one
    that pages correctly. |z| > 3 with a per-slot sample guard.

    Scale: the corpus collapses to |types|×|hours| in one aggregate;
    the baseline is a second aggregate over that rollup (|types|×24
    rows, broadcast back). Nothing re-touches the fact table."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    baseline = hourly.groupBy(
        "event_type", F.hour("h").cast("long").alias("hod")
    ).agg(F.avg("n").alias("mu"), F.stddev("n").alias("sd"))
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        hourly.withColumn("hod", F.hour("h").cast("long"))
        .join(F.broadcast(baseline), ["event_type", "hod"])
        .filter((F.col("sd") > 0) & (F.abs(z) > 3))
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.col("n").cast("long").alias("n"),
            F.round("mu", 6).alias("expected"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
        WITH hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS hour, SUM(value) AS v
          FROM events GROUP BY 1, 2
        ),
        wp AS (
          SELECT user_id, hour, v,
                 lag(hour) OVER w AS ph, lag(v) OVER w AS pv
          FROM hourly
          WINDOW w AS (PARTITION BY user_id ORDER BY hour)
        ),
        expanded AS (
          SELECT user_id,
                 unnest(list_transform(
                   generate_series(coalesce(ph + INTERVAL 1 HOUR, hour), hour,
                                   INTERVAL 1 HOUR),
                   g -> struct_pack(
                     h := g,
                     vf := CAST(ROUND(CAST(CASE WHEN g = hour THEN v
                                 ELSE pv + (v - pv)
                                      * (epoch_us(g) - epoch_us(ph))
                                      / (epoch_us(hour) - epoch_us(ph)) END
                                 AS DECIMAL(28, 10)), 6) AS DOUBLE),
                     gap := g <> hour))) AS r
          FROM wp
        )
        SELECT user_id, r.h AS hour, r.vf AS v_filled, r.gap AS was_gap
        FROM expanded
    """,
    tags=("T10'", "resample", "interpolate"),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10' — dense hourly resampling with LINEAR interpolation: gap
    hours take the time-weighted blend of their surrounding
    observations instead of LOCF's step function — the resampler for
    continuous signals (gauges, prices) where carry-forward bias
    matters. Identical gap-fill plan shape to timeseries_resample_locf
    (its docstring explains why generation beats a grid join at
    scale): one hourly aggregate, one lag() exchange, then a
    zero-shuffle generator emits each observation plus its preceding
    gap rows; the interpolation fraction uses exact integer
    microseconds and the arithmetic order matches the oracle exactly,
    so the blended doubles are bit-identical across engines BEFORE
    rounding. The final round goes through DECIMAL(28,10): half-gap
    blends of short-decimal inputs land EXACTLY on 6-dp midpoints,
    where Spark (shortest-decimal-string HALF_UP) and DuckDB (binary
    double) disagree — rounding the identical 10-dp decimal first
    makes the tie-break identical too (measured: systematic ±1e-6
    mismatches without it)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.sum("value").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    with_prev = hourly.withColumn("prev_hour", F.lag("hour").over(w)).withColumn(
        "prev_v", F.lag("v").over(w)
    )
    rows = F.expr(
        """
        transform(
          sequence(coalesce(prev_hour + INTERVAL 1 HOUR, hour), hour, INTERVAL 1 HOUR),
          h -> named_struct(
            'hour', h,
            'v_filled', CAST(round(CAST(if(h = hour, v,
                prev_v + (v - prev_v)
                  * (unix_micros(h) - unix_micros(prev_hour))
                  / (unix_micros(hour) - unix_micros(prev_hour)))
                AS DECIMAL(28, 10)), 6) AS DOUBLE),
            'was_gap', h <> hour))
        """
    )
    return with_prev.select("user_id", F.explode(rows).alias("r")).select(
        "user_id", "r.hour", "r.v_filled", "r.was_gap"
    )


@register(
    "events_active_users",
    oracle="""
        WITH ud AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        dau AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
        ),
        spread AS (
          SELECT DISTINCT ud.user_id, ud.day + g.i * INTERVAL 1 DAY AS w_day
          FROM ud, LATERAL unnest(generate_series(0, 6)) AS g(i)
        ),
        wau AS (
          SELECT w_day AS day, CAST(COUNT(*) AS BIGINT) AS wau
          FROM spread GROUP BY w_day
        )
        SELECT d.day, d.dau, w.wau,
               ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day
    """,
    tags=("E9", "engagement"),
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 — DAU / trailing-7-day WAU / stickiness per day, the
    engagement dashboard headline. Exact rolling distinct counts via
    the FORWARD-SPREAD trick: a COUNT(DISTINCT) over a sliding range
    frame has no partial-aggregatable form, so instead each (user,
    active-day) fact is emitted into the 7 window END-days it
    contributes to, deduped, and counted per day — turning the
    rolling distinct into two plain hash aggregates that map-side
    combine. (Days whose 7-day window starts before the corpus are
    reported as observed — the leading ramp-in convention.)

    Scale: the fact table dedups to (user, day) once; the spread is
    a ×7 narrow generate + distinct (bounded fan-out, the same
    expansion discipline as window_sliding's Expand); both counts
    are day-keyed aggregates. At 100 TB the (user, day) dedup is the
    only corpus-sized shuffle; HLL sketches (agg_hll_mergeable) are
    the one-pass approximate alternative."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> day + make_interval(0, 0, 0, i))")
        ).alias("w_day"),
    ).distinct()
    wau = spread.groupBy(F.col("w_day").alias("day")).agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


_ROLL_MED_N = 10  # rolling frame: current row + 9 preceding


@register(
    "timeseries_rolling_median",
    oracle=f"""
        SELECT event_id, user_id, ts,
               ROUND(median(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_ROLL_MED_N - 1} PRECEDING AND CURRENT ROW), 6)
                 AS rolling_median
        FROM events
    """,
    tags=("T17", "robust", "rolling"),
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17 — rolling median over the trailing 10 observations per
    user: the robust alternative to a moving average (one spike
    cannot move it — the despiking filter monitoring pipelines run
    before alerting). Spark has no median window aggregate, so the
    frame's values are collected per row (bounded: ≤ 10 elements),
    sorted, and the interpolating median is read off the sorted
    array — semantically identical to DuckDB's windowed
    quantile_cont median.

    Scale: one user_id shuffle for the window; per-row state is the
    bounded frame (10 doubles), so memory is O(frame), not
    O(partition). A percentile_approx-over-window variant relaxes to
    sketches when frames grow unbounded."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_MED_N - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    med = F.expr(
        "CASE WHEN size(frame) % 2 = 1 THEN frame[CAST(size(frame) / 2 AS INT)] "
        "ELSE (frame[size(frame) div 2 - 1] + frame[size(frame) div 2]) / 2 END"
    )
    return (
        ev.select("event_id", "user_id", "ts", arr.alias("frame"))
        .select("event_id", "user_id", "ts", F.round(med, 6).alias("rolling_median"))
    )


_FUNNEL_WINDOW_H = 1


@register(
    "funnel_conversion_windowed",
    oracle=f"""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL {_FUNNEL_WINDOW_H} HOUR
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL {_FUNNEL_WINDOW_H} HOUR
          GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
               CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1h,
               CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_1h,
               ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                     / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
               ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                     / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
    """,
    tags=("E1'", "funnel", "windowed"),
)
def funnel_conversion_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1' — conversion funnel with a per-step TIMEOUT: click counts
    only within 1 hour of the user's first view, purchase within 1
    hour of that click — the product-analytics convention (a
    purchase three weeks later is a different journey, and the
    unbounded funnel silently over-credits; funnel_conversion is the
    unbounded sibling). Each stage anchors on the PREVIOUS stage's
    earliest qualifying timestamp, so the chain is three per-user
    MIN aggregates, each joined forward to gate the next stage's
    candidate events.

    Scale: three conditional aggregates over the fact table, all
    keyed by user_id — with AQE the stage joins reuse one hash
    partitioning; stage tables shrink monotonically (funnel
    property), so each later join is smaller. The per-step bound is
    also the streaming state bound, exactly as in
    attribution_last_touch."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_1h"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_1h"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click_1h",
            "n_purchase_1h",
            F.round(F.col("n_click_1h").cast("double") / F.col("n_view"), 6).alias(
                "view_to_click"
            ),
            F.round(
                F.col("n_purchase_1h").cast("double") / F.col("n_click_1h"), 6
            ).alias("click_to_purchase"),
        )
    )


_BURST_GAP_S = 300  # system-wide quiet period that ends a burst


@register(
    "events_activity_bursts",
    oracle=f"""
        WITH f AS (
          SELECT ts, event_id, user_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL {_BURST_GAP_S} SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (ORDER BY ts, event_id)
        ),
        isl AS (
          SELECT ts, event_id, user_id,
                 SUM(is_new) OVER (ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid
          FROM f
        )
        SELECT CAST(MIN(event_id) AS BIGINT) AS burst_id,
               MIN(ts) AS burst_start,
               MAX(ts) AS burst_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
        FROM isl GROUP BY bid
    """,
    tags=("T3''", "bursts", "islands"),
)
def events_activity_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEM-WIDE activity bursts — sessionization with NO
    partitioning key (a {_BURST_GAP_S}-second quiet period across the
    whole event stream ends a burst): the incident/traffic-spike
    segmentation an ops dashboard draws, and the canonical
    global-islands problem. Runs through ``global_islands``
    (sorts.py): per-time-bucket local islands + a declarative
    census chain-merge (two bounded windows + a broadcast remap
    join, no driver state) — the oracle computes the identical
    islands with the single-partition window the engine refuses
    to run over the corpus.
    Per burst: first event id (the stable key), bounds, event and
    distinct-user counts, exact integer-microsecond duration.

    Scale: full-stream work is two bucket-keyed passes (the output
    window and the narrow 3-long-per-row census pass); the census
    chain-merge windows run over one row per non-empty time bucket
    regardless of event volume — at the 6-hour bucket width that is
    ~1.5k rows per year, ~15k per decade, inside the ~10^4–10^5-row
    bound the calendar-exception rule in ``operators/windows.py``
    documents (this op carries the allowlist entry). Escape hatch
    past the bound: raise ``bucket_us`` (census rows shrink
    linearly) — merge correctness is bucket-size-independent. The
    per-burst aggregate shuffles on island keys — burst-sized
    groups, AQE-splittable if one burst dominates."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import (
        global_islands,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "event_id", "user_id")
    isl = global_islands(
        ev,
        "ts",
        ["event_id"],
        gap_us=_BURST_GAP_S * 1_000_000,
        bucket_us=6 * 3600 * 1_000_000,
    )
    return isl.groupBy("__island").agg(
        F.min("event_id").cast("long").alias("burst_id"),
        F.min("ts").alias("burst_start"),
        F.max("ts").alias("burst_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    ).drop("__island")


@register(
    "events_hourly_percentile_bands",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95,
               ROUND(quantile_cont(value, 0.99), 6) AS p99,
               ROUND(MAX(value), 6) AS p100
        FROM events GROUP BY 1
    """,
    tags=("T1", "percentiles", "slo"),
)
def events_hourly_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly latency/value percentile bands (p50/p95/p99/max) — the
    SLO dashboard query. EXACT interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, hash-identical at
    6 dp), computed per hour group so each task holds one hour's
    values — the honest exact-percentile bound (text_stats' same
    note). At 100 TB with fat hours, swap to ``percentile_approx``
    (mergeable t-digest, rows-only check) or pre-bucket values the
    way agg_histogram does; the per-group shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("p100"),
    )


@register(
    "events_cusum_changepoint",
    # Hourly means and the (mu, h) thresholds are rounded to 6 dp
    # BEFORE the recursion, so both engines fold identical numbers:
    # Spark's array-accumulator aggregate and DuckDB's recursive CTE
    # run the same strict left-to-right recurrence.
    oracle="""
        WITH RECURSIVE hourly AS (
          SELECT date_trunc('hour', ts) AS hour, ROUND(AVG(value), 6) AS x
          FROM events GROUP BY 1
        ),
        series AS (
          SELECT hour, x,
                 CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS idx
          FROM hourly
        ),
        params AS (
          SELECT ROUND(AVG(x), 6) AS mu,
                 ROUND(0.5 * stddev_samp(x), 6) AS k,
                 ROUND(4 * stddev_samp(x), 6) AS h
          FROM series
        ),
        cusum AS (
          SELECT CAST(0 AS BIGINT) AS idx, CAST(0 AS DOUBLE) AS s
          UNION ALL
          SELECT c.idx + 1,
                 greatest(0, c.s + se.x - p.mu - p.k)
          FROM cusum c
          JOIN series se ON se.idx = c.idx + 1
          CROSS JOIN params p
        )
        SELECT se.hour, se.x,
               ROUND(c.s, 6) AS cusum,
               c.s > p.h AS flagged
        FROM cusum c JOIN series se ON se.idx = c.idx
        CROSS JOIN params p
    """,
    tags=("T9''", "cusum", "changepoint"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point monitor over hourly means (Page
    1954): S_t = max(0, S_{t-1} + (x_t - mu)), flagged when S_t
    exceeds h = 2 sigma — the drift detector that catches slow level
    shifts z-score anomaly checks miss (events_anomaly_zscore's
    complement; a small persistent bias accumulates in S while never
    tripping a per-point z test). The recurrence is inherently
    sequential, so it runs ONCE over the calendar-bounded hourly
    rollup: Spark folds the sorted series with an array-accumulator
    aggregate expression, DuckDB's oracle runs the identical
    recurrence as a recursive CTE — both over 6-dp-rounded inputs,
    so the folds are bit-identical.

    Scale: the fact table reduces to the hourly rollup first (the
    only corpus-sized shuffle); the fold's input is bounded by the
    calendar, NOT the corpus — ~8.8k hours/year, ~10^5 per decade,
    within the ~10^4–10^5-row cap of the calendar-bounded exception
    class centralized in ``operators/windows.py`` (the single
    collect_list row here is ≈1.6 MB/decade of doubles). Escape
    hatch past the cap: the same recurrence as keyed streaming state
    (stream_ewma_stateful's applyInPandasWithState shape, one (s,)
    double per series) or per-epoch segmented folds stitched like
    ``global_islands`` stitches bucket boundaries."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    params = hourly.agg(
        F.round(F.avg("x"), 6).alias("mu"),
        F.round(0.5 * F.stddev_samp("x"), 6).alias("k"),
        F.round(4 * F.stddev_samp("x"), 6).alias("h"),
    )
    packed = hourly.agg(
        F.array_sort(F.collect_list(F.struct("hour", "x"))).alias("sx")
    ).crossJoin(F.broadcast(params))
    folded = packed.select(
        F.expr(
            """
            aggregate(sx, CAST(array() AS ARRAY<DOUBLE>),
              (acc, e) -> concat(acc, array(greatest(0D,
                coalesce(try_element_at(acc, -1), 0D) + e.x - mu - k))))
            """
        ).alias("ss"),
        "sx",
        "h",
    )
    return folded.select(
        F.posexplode(F.arrays_zip("sx", "ss")).alias("i", "z"), F.col("h")
    ).select(
        F.col("z.sx.hour").alias("hour"),
        F.col("z.sx.x").alias("x"),
        F.round(F.col("z.ss"), 6).alias("cusum"),
        (F.col("z.ss") > F.col("h")).alias("flagged"),
    )


@register(
    "funnel_step_latency",
    oracle="""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
          WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
          WHERE e.event_type = 'purchase' GROUP BY e.user_id
        ),
        deltas AS (
          SELECT 'view->click' AS step,
                 epoch_us(c.t_click) - epoch_us(v.t_view) AS d_us
          FROM v JOIN c ON v.user_id = c.user_id
          UNION ALL
          SELECT 'click->purchase',
                 epoch_us(p.t_purchase) - epoch_us(c.t_click)
          FROM c JOIN p ON c.user_id = p.user_id
        )
        SELECT step,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(quantile_cont(CAST(d_us AS DOUBLE), 0.5) / 60e6, 6) AS p50_min,
               ROUND(quantile_cont(CAST(d_us AS DOUBLE), 0.9) / 60e6, 6) AS p90_min,
               ROUND(AVG(CAST(d_us AS DOUBLE)) / 60e6, 6) AS mean_min
        FROM deltas GROUP BY step
    """,
    tags=("E1''", "funnel", "latency"),
)
def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step-transition latency — the timing half of funnel
    analysis (funnel_conversion counts WHO converts; this measures
    HOW LONG each step takes): per ordered step pair
    (view→click→purchase, strictly-after first-touch semantics
    matching funnel_conversion exactly), the median / p90 / mean
    transition time in minutes — the numbers that locate WHERE the
    funnel leaks (a slow step precedes an abandoned one).

    Scale: three user-keyed min-aggregates + two user-keyed joins
    (the funnel_conversion shape) produce one delta row per
    converting user per step; the exact percentile groups by step —
    2 groups, each holding converting-user-count values, with the
    usual percentile_approx swap documented for extreme scale.
    Integer-microsecond deltas cast to double identically in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d1 = v.join(c, "user_id").select(
        F.lit("view->click").alias("step"),
        (F.unix_micros("t_click") - F.unix_micros("t_view")).alias("d_us"),
    )
    d2 = c.join(p, "user_id").select(
        F.lit("click->purchase").alias("step"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias("d_us"),
    )
    deltas = d1.unionByName(d2)
    return deltas.groupBy("step").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.expr("percentile(CAST(d_us AS DOUBLE), 0.5)") / 60e6, 6).alias("p50_min"),
        F.round(F.expr("percentile(CAST(d_us AS DOUBLE), 0.9)") / 60e6, 6).alias("p90_min"),
        F.round(F.avg(F.col("d_us").cast("double")) / 60e6, 6).alias("mean_min"),
    )


_SLO_TARGET = 0.999  # 99.9% non-error events


@register(
    "events_error_budget_burn",
    oracle=f"""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                   AS n_err
          FROM events GROUP BY 1
        )
        SELECT hour, n, n_err,
               ROUND(CAST(n_err AS DOUBLE) / n, 6) AS err_rate,
               ROUND((CAST(n_err AS DOUBLE) / n) / {1 - _SLO_TARGET}, 6)
                 AS burn_rate,
               (CAST(n_err AS DOUBLE) / n) / {1 - _SLO_TARGET} > 1.0 AS burning
        FROM hourly
    """,
    tags=("T1''", "slo", "errors"),
)
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn rate per hour: with a {_SLO_TARGET:.1%}
    SLO the allowance is {1 - _SLO_TARGET:.1%} errors; burn rate =
    observed error rate / allowance (burn > 1 consumes budget faster
    than the SLO window replenishes it — the Google-SRE multiwindow
    alert's core quantity). Pairs with events_hourly_percentile_bands
    (latency SLIs) for the full SLO dashboard.

    Scale: ONE map-side-partial conditional aggregate per hour —
    the cheapest shape in the engine; rates are exact rationals of
    identical integer counts, rounded at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_err"),
    )
    rate = F.col("n_err").cast("double") / F.col("n")
    burn = rate / (1 - _SLO_TARGET)
    return hourly.select(
        "hour",
        "n",
        "n_err",
        F.round(rate, 6).alias("err_rate"),
        F.round(burn, 6).alias("burn_rate"),
        (burn > 1.0).alias("burning"),
    )


_ATTR_WINDOW_DAYS = 7


@register(
    "attribution_position_based",
    # Weights are exact integer micro-credits (floor division), so the
    # per-(channel, role) sums are integers — no float summation-order
    # hazard. Position ties resolve by (ts, event_id) in both engines.
    oracle=f"""
        WITH u AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
                 CASE WHEN event_type IN ('click', 'view') THEN event_type END AS channel
          FROM events WHERE event_type IN ('purchase', 'click', 'view')
        ),
        nxt AS (
          SELECT *,
                 FIRST_VALUE(CASE WHEN side = 1 THEN ts END IGNORE NULLS) OVER w AS p_ts,
                 FIRST_VALUE(CASE WHEN side = 1 THEN event_id END IGNORE NULLS) OVER w AS p_eid
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        ),
        tt AS (
          SELECT channel, ts, event_id, p_eid FROM nxt
          WHERE side = 0 AND p_ts IS NOT NULL
            AND ts >= p_ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
        ),
        pos AS (
          SELECT channel, p_eid,
                 COUNT(*) OVER (PARTITION BY p_eid) AS n,
                 ROW_NUMBER() OVER (PARTITION BY p_eid ORDER BY ts, event_id) AS rn
          FROM tt
        ),
        credited AS (
          SELECT channel, p_eid,
                 CASE WHEN n = 1 THEN 'only'
                      WHEN rn = 1 THEN 'first'
                      WHEN rn = n THEN 'last'
                      ELSE 'middle' END AS role,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN rn = 1 OR rn = n THEN 400000
                      ELSE CAST((200000 - ((200000 % (n - 2)) + (n - 2)) % (n - 2)) / (n - 2) AS BIGINT)
                      END AS credit
          FROM pos
        )
        SELECT channel, role,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(credit) AS BIGINT) AS credit_micros,
               CAST(COUNT(DISTINCT p_eid) AS BIGINT) AS n_conversions
        FROM credited
        GROUP BY channel, role
    """,
    tags=("E3'", "attribution", "multi-touch"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3' — position-based (U-shaped) multi-touch attribution: every
    click/view credits the user's NEXT purchase at-or-after it within
    a {_ATTR_WINDOW_DAYS}-day window; credit splits 40% to the first
    touch, 40% to the last, and the remaining 20% evenly across the
    middle (1 touch → 100%, 2 → 50/50). Complements the single-touch
    `attribution_last_touch` with the path-aware model marketing
    teams actually budget against; output is the per-(channel, role)
    credit ledger.

    Determinism: credits are integer MICRO-credits with floor
    division (200000 div (n-2) via the positive-modulo identity, so
    Spark's `div` and any truncation convention agree) — sums are
    exact integers in both engines. Touch→conversion assignment uses
    the same union+forward-window construction as the as-of family:
    one shuffle on user_id, `first(..., ignorenulls)` over the
    forward frame — never a per-touch subquery. The per-conversion
    position window partitions by purchase id (conversion-sized
    groups). Scale: two partitioned windows + one small aggregate;
    the {_ATTR_WINDOW_DAYS}-day bound is the streaming state bound,
    exactly as for last-touch."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("purchase", "click", "view")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("side"),
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")).alias("channel"),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_struct = F.when(
        F.col("side") == 1, F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("eid"))
    )
    nxt = base.withColumn("p", F.first(p_struct, ignorenulls=True).over(fwd))
    tt = nxt.filter(
        (F.col("side") == 0)
        & F.col("p").isNotNull()
        & (F.col("ts") >= F.col("p.ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS"))
    ).select("channel", "ts", "event_id", F.col("p.eid").alias("p_eid"))
    per_conv = Window.partitionBy("p_eid")
    pos = tt.select(
        "channel",
        "p_eid",
        F.count(F.lit(1)).over(per_conv).alias("n"),
        F.row_number().over(per_conv.orderBy("ts", "event_id")).alias("rn"),
    )
    n, rn = F.col("n"), F.col("rn")
    role = (
        F.when(n == 1, "only")
        .when(rn == 1, "first")
        .when(rn == n, "last")
        .otherwise("middle")
    )
    credit = (
        F.when(n == 1, F.lit(1000000))
        .when(n == 2, F.lit(500000))
        .when((rn == 1) | (rn == n), F.lit(400000))
        .otherwise(F.expr("200000 div (n - 2)"))
    ).cast("long")
    return (
        pos.select("channel", "p_eid", role.alias("role"), credit.alias("credit"))
        .groupBy("channel", "role")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit").alias("credit_micros"),
            F.count_distinct("p_eid").alias("n_conversions"),
        )
    )


_HOLT_H = 3  # forecast horizon (months)


def _fd10_duck(n: str) -> str:
    """DuckDB exact floor-divide-by-10 for possibly-negative BIGINTs:
    positive-modulo identity, so no engine's truncation convention
    matters (the numerator is made exactly divisible first)."""
    return f"((({n}) - (((({n}) % 10) + 10) % 10)) // 10)"


def _fd10_spark(n: str) -> str:
    """Spark twin of :func:`_fd10_duck` (pmod + integer div)."""
    return f"((({n}) - pmod(({n}), 10)) div 10)"


# Holt's linear recurrence in integer cents, alpha=0.2, beta=0.3:
#   l_t = floor((2*x_t + 8*(l + b)) / 10)
#   b_t = floor((3*(l_t - l) + 7*b) / 10)
_HOLT_L_DUCK = _fd10_duck("2 * m.cents + 8 * (h.l + h.b)")
_HOLT_B_DUCK = _fd10_duck(f"3 * ({_HOLT_L_DUCK} - h.l) + 7 * h.b")
_HOLT_L_SPARK = _fd10_spark("2 * e.cents + 8 * (element_at(acc, -1).l + element_at(acc, -1).b)")
_HOLT_B_SPARK = _fd10_spark(f"3 * ({_HOLT_L_SPARK} - element_at(acc, -1).l) + 7 * element_at(acc, -1).b")


@register(
    "timeseries_holt_forecast",
    oracle=f"""
        WITH RECURSIVE m AS (
          SELECT month, cents,
                 CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS idx
          FROM (
            SELECT date_trunc('month', o_orderdate) AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
            FROM orders GROUP BY 1
          )
        ),
        holt AS (
          SELECT idx, cents, CAST(cents AS BIGINT) AS l,
                 CAST(0 AS BIGINT) AS b, CAST(NULL AS BIGINT) AS f
          FROM m WHERE idx = 1
          UNION ALL
          SELECT h.idx + 1, m.cents,
                 {_HOLT_L_DUCK},
                 {_HOLT_B_DUCK},
                 h.l + h.b
          FROM holt h JOIN m ON m.idx = h.idx + 1
        )
        SELECT m.month, CAST(m.cents AS BIGINT) AS actual_cents,
               h.f AS fitted_cents, 'fit' AS kind
        FROM holt h JOIN m ON m.idx = h.idx
        UNION ALL
        SELECT last.month + g.h * INTERVAL 1 MONTH,
               CAST(NULL AS BIGINT),
               last.l + g.h * last.b,
               'forecast'
        FROM (
          SELECT h.l, h.b, m.month FROM holt h
          JOIN m ON m.idx = h.idx
          WHERE h.idx = (SELECT MAX(idx) FROM m)
        ) last
        CROSS JOIN (SELECT unnest(generate_series(1, {_HOLT_H})) AS h) g
    """,
    tags=("T18", "timeseries", "forecast", "holt"),
)
def timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18 — Holt's linear-trend exponential smoothing over the
    monthly revenue series (alpha=0.2, beta=0.3, init l_1=x_1,
    b_1=0), emitting the one-step-ahead fit per observed month plus
    a {_HOLT_H}-month forecast — the trend-aware successor to the
    plain EWMA (`timeseries_ewma`) and the baseline forecaster a
    reporting stack ships first.

    Determinism: the series is EXACT INTEGER CENTS — monthly revenue
    sums as DECIMAL(18,2) (decimal addition is exact and
    order-insensitive, unlike double) — and the recurrence uses the
    floor-divide-by-10 positive-modulo identity, so Spark's fold and
    DuckDB's recursive CTE produce bit-identical BIGINT states; no
    float enters the pipeline at all. Like the CUSUM monitor above,
    the recurrence is inherently sequential, so it folds ONCE over
    the calendar-bounded monthly rollup (~10^2 rows/decade — the
    exception class in ``operators/windows.py``; the corpus-sized
    work is the one groupBy(month) shuffle). Escape hatch past the
    bound: keyed streaming state (stream_ewma_stateful's shape with
    (l, b) per series)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").alias("cents")
    )
    packed = monthly.agg(
        F.array_sort(F.collect_list(F.struct("month", "cents"))).alias("sx")
    ).select(
        "sx",
        F.expr(
            f"""
            aggregate(sx, CAST(array() AS ARRAY<STRUCT<l: BIGINT, b: BIGINT>>),
              (acc, e) -> concat(acc, array(
                CASE WHEN size(acc) = 0
                  THEN named_struct('l', e.cents, 'b', CAST(0 AS BIGINT))
                  ELSE named_struct('l', {_HOLT_L_SPARK}, 'b', {_HOLT_B_SPARK})
                END)))
            """
        ).alias("st"),
    ).cache()  # 1-row frame, two consumers (fit rows + forecast rows) — one orders scan, not two
    fits = packed.select(
        F.posexplode(F.arrays_zip("sx", "st")).alias("i", "z"), F.col("st")
    ).select(
        F.col("z.sx.month").alias("month"),
        F.col("z.sx.cents").alias("actual_cents"),
        F.when(
            F.col("i") > 0,
            F.element_at("st", F.col("i")).getField("l")
            + F.element_at("st", F.col("i")).getField("b"),
        ).alias("fitted_cents"),
        F.lit("fit").alias("kind"),
    )
    forecasts = packed.select(
        F.element_at("sx", -1).getField("month").alias("last_month"),
        F.element_at("st", -1).getField("l").alias("l"),
        F.element_at("st", -1).getField("b").alias("b"),
        F.explode(F.sequence(F.lit(1), F.lit(_HOLT_H))).alias("h"),
    ).select(
        F.add_months("last_month", F.col("h")).cast("timestamp").alias("month"),
        F.lit(None).cast("long").alias("actual_cents"),
        (F.col("l") + F.col("h") * F.col("b")).alias("fitted_cents"),
        F.lit("forecast").alias("kind"),
    )
    return fits.unionByName(forecasts)


_SEQ_PATTERN = "v+cp"  # one-or-more views, then a click, then a purchase


@register(
    "events_sequence_pattern",
    oracle=f"""
        WITH seq AS (
          SELECT user_id,
                 string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(s) AS BIGINT) AS seq_len,
               CAST(len(regexp_extract_all(s, '{_SEQ_PATTERN}')) AS BIGINT) AS n_funnels,
               CAST(len(regexp_extract(s, '^(.*?{_SEQ_PATTERN})', 1)) AS BIGINT)
                 AS first_funnel_end
        FROM seq
    """,
    tags=("E10", "cep", "pattern", "sequence"),
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 — sequence pattern matching over per-user event streams:
    the MATCH_RECOGNIZE / CEP capability Spark SQL lacks, expressed
    batch-first. Each user's events collapse (in exact (ts, event_id)
    event-time order) to a string of event-type initials — the five
    types start with distinct letters, so the alphabet is lossless —
    and the funnel pattern ``{_SEQ_PATTERN}`` (one-or-more views,
    then a click, then a purchase) is evaluated as a REGEX over that
    string: per user the non-overlapping match count, the end
    position of the first completed funnel (0 = never), and the
    sequence length. Leftmost-non-overlapping greedy semantics and
    lazy ``.*?`` prefixes agree between Java regex and RE2, and every
    output is an integer — nothing to round.

    This is the batch form of the CEP automaton: the symbol string
    IS the NFA input tape, built with one hash shuffle on user_id
    (sort_array over collect_list — per-task memory bounded by one
    user's history, the secondary-sort contract) and scanned
    JVM-side by codegen'd regexp functions — no UDFs, no per-event
    state machine in Python. At unbounded scale the same pattern
    runs as the streaming twin's keyed automaton (carry the NFA
    state + tail fragment per user in ``applyInPandasWithState``);
    batch retention windows keep per-user strings bounded here."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ini")).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr("transform(sort_array(collect_list(e)), x -> x.ini)"), ""
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.size(F.expr(f"regexp_extract_all(s, '{_SEQ_PATTERN}', 0)")).cast("long").alias(
            "n_funnels"
        ),
        F.length(F.regexp_extract("s", f"^(.*?{_SEQ_PATTERN})", 1)).cast("long").alias(
            "first_funnel_end"
        ),
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
