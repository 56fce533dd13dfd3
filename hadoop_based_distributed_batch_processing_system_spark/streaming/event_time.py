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


@register(
    "window_sliding",
    oracle="""
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
    """,
    tags=("T2",),
)
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
