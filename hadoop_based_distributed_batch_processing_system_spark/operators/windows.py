"""Window-function operators (SURVEY.md §2.5, W1-W4).

Extension surface: the MR class needs the secondary-sort idiom
(composite key + custom partitioner + grouping comparator) to get
anything window-like; Spark gives analytic windows natively.

Scale notes: every window here partitions by a key (customer /
user) — one shuffle, per-partition sort, streaming frame evaluation.
An un-partitioned window (``Window.orderBy`` alone) serializes the
whole dataset through one task and is banned by engine convention.

THE UNPARTITIONED-WINDOW RULE (single source of truth — the fleet
plan audit in ``tests/test_plans.py`` enforces it from the allowlist
below):

    No operator may plan a Window fed by a SinglePartition exchange
    unless the window's INPUT is an already-reduced rollup whose row
    count is bounded by a calendar/domain cardinality — never by the
    corpus. The cap: ~10^4 rows (centuries of months, years of days,
    the distinct-degree support of a graph). Anything keyed by an
    entity (customer, user, document, order) or by fine-grained time
    that grows with the corpus MUST use the two-phase bucketed
    recipes in ``operators/sorts.py`` (``bucketed_rank_cumsum``,
    ``global_islands``) instead — ``partitioner_range`` (round 7)
    and the four ranking ops (round 6) are the worked conversions.

Allowlisted operators and the bound that justifies each; the audit
asserts this list is exact (no unlisted offender, no rotted entry):
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

# THE WINDOW-GROUP-LIMIT RULE (enforced by the fleet plan audit in
# tests/test_plans.py from the list below): a rank/row_number window
# used only as a top-k filter must stand ALONE on its window spec —
# Catalyst then plans WindowGroupLimit, a map-side partial top-k that
# forwards at most k rows per (group, input partition) to the shuffle
# (the bounded heap a hand-written sketch keeps, derived by the
# optimizer). Adding ANY second window function on the same spec
# (count/sum-over-partition is the classic) silently disables the
# rewrite and every row crosses the shuffle again; before this audit,
# only a bench regression would notice. Operators whose scale
# contract DEPENDS on the rewrite (k-min sketches, per-group top-k):
# the audit asserts each still plans WindowGroupLimit, and that the
# list stays exact (an unlisted op gaining the node must be added so
# the dependency is documented).
WINDOW_GROUP_LIMIT_EXPECTED = {
    "agg_mode_deterministic",       # rank-1 filter over (key, value) counts
    "sketch_kmv_distinct",          # k-min hash per source = the sketch heap
    "agg_quantile_sketch_kmv",      # k-min row-hash sample per group
    "win_rank",                     # rank <= 3 filter per customer
    "win_rank_limited",             # the W1 canonical top-k rank filter
    "topk_per_group",               # row_number <= k per group
    "dedup_latest_per_key",         # row_number = 1 latest-version filter
    "sample_reservoir_per_group",   # k smallest md5 = deterministic reservoir
    "pipeline_corpus_curation_v2",  # exact-dedup keeper = rank-1 per hash
    "pipeline_corpus_curation_v3",  # same keeper stage inside the v3 fuse
    "sim_search_ann_lsh",           # per-bucket candidate cap before GEMM
    "knn_label_vote",               # top-k neighbors per query row
    "knn_label_vote_ann",           # same vote over the ANN candidate set
    "text_tfidf_topterms",          # top-terms-per-doc rank filter
    "text_naive_bayes_lang",        # argmax class = rank-1 per doc
    "graph_label_propagation",      # per-node label argmax = rank-1, every round
    "sample_weighted_reservoir",    # A-ES top-k key per source = weighted reservoir
}

# See module docstring: window input must be a calendar/domain-bounded
# rollup (≲10^4 rows), never corpus-sized.
UNPARTITIONED_WINDOW_ALLOWED = {
    "monthly_growth_rates": (
        "input = one row per (month), LAG over the monthly revenue rollup; "
        "bound = months in the order horizon (~10^2 per decade)"
    ),
    "monthly_seasonal_decomposition": (
        "input = one row per month, centered-MA window over the monthly "
        "rollup; bound = months (~10^2)"
    ),
    "orders_gmv_daily_7dma": (
        "input = one row per day, 7-row moving average over the daily GMV "
        "rollup; bound = days in the horizon (~10^3 per few years)"
    ),
    "graph_degree_distribution": (
        "input = one row per DISTINCT degree value, cumulative share over "
        "the degree histogram; bound = max degree support (≤ sqrt(edges) "
        "distinct values in practice, ~10^3)"
    ),
    "dq_benford_first_digit": (
        "input = one row per leading digit, chi2-total sum over the "
        "9-row digit rollup; bound = 9 by construction"
    ),
    "events_activity_bursts": (
        "global_islands census chain-merge: input = one row per "
        "non-empty time bucket (time-range/bucket_us, ~10^3-10^4 per "
        "decade at 6-h buckets), two window passes resolve cross-"
        "bucket island merges; the corpus-sized island window itself "
        "stays bucket-partitioned (asserted in "
        "test_global_islands_island_window_plan)"
    ),
    "join_interval_overlap_binned": (
        "same global_islands census chain-merge, over the error-event "
        "incident stream; bound = non-empty 6-h buckets in the events "
        "horizon"
    ),
}


@register(
    "win_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rk, drk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   RANK()       OVER w AS rk,
                   DENSE_RANK() OVER w AS drk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        )
        WHERE rk <= 3
    """,
    tags=("W1",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — rank/dense_rank per partition, top-3 per customer.
    Spark has no QUALIFY; the filter-on-derived-column rewrite is
    the validated equivalent (SURVEY §3.2)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.rank().over(w))
        .withColumn("drk", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "win_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts,
               date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us,
               LEAD(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W2",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — inter-event gap (lag) and next event type (lead) per
    user. Gap computed in exact integer microseconds so both engines
    agree bit-for-bit."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
               COUNT(*) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
        FROM orders
    """,
    tags=("W3",),
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — running total with an explicit ROWS frame. The total
    order within each partition is fully deterministic (date + key),
    so float accumulation order — and hence the result — is
    reproducible across engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum("o_totalprice").over(w).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "win_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey, day_num,
               SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day_num
                                       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS spend_30d,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day_num
                              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day_num
            FROM orders
        )
    """,
    tags=("W4",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — RANGE frame over a numeric order key: trailing-30-day
    spend per customer. The value-based frame means rows with equal
    day_num share a frame (unlike ROWS) — which also makes the float
    sum order-independent per frame boundary set."""
    w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, 0)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "day_num", F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp"))
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        F.sum("o_totalprice").over(w).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
    )


@register(
    "win_distribution",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("W1", "W5"),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — distribution window functions: NTILE quartiles,
    percent_rank and cume_dist per status partition. All three ride
    ONE sort per partition (same window spec → one WindowExec);
    o_orderkey in the ORDER BY makes frame positions — and therefore
    every output — deterministic across engines. The shape behind
    percentile-bucketing features (spend quartiles, freshness
    deciles) in feature pipelines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "win_first_last_ignore_nulls",
    oracle="""
        SELECT event_id, user_id,
               FIRST_VALUE(v IGNORE NULLS) OVER w AS first_real_value,
               LAST_VALUE(v IGNORE NULLS) OVER w AS running_last_value
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W2", "ignore-nulls"),
)
def win_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with IGNORE NULLS over a running frame — the
    gap-fill idiom: error events carry no value (NULLed here), and
    every row sees the user's first real reading plus the
    most-recent real reading at-or-before it (last-observation-
    carried-forward). One window sort per user; the same frame
    serves both functions."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("v", ignorenulls=True).over(w).alias("first_real_value"),
        F.last("v", ignorenulls=True).over(w).alias("running_last_value"),
    )


@register(
    "win_rank_limited",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   RANK() OVER w AS rk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        )
        WHERE rk <= 3
        ORDER BY o_custkey, rk, o_orderkey
        LIMIT 100
    """,
    tags=("W1",),
)
def win_rank_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1, baseline shape — rank per customer, top-3, LIMIT 100: the
    exact query BASELINE.md's `window_rank_orders` row times. The
    unlimited variant above returns every customer's top-3 (~35k rows
    at sf0.1), so its wall-clock is dominated by result transfer, not
    the window — this one is the like-for-like bench row. The limit
    rides a deterministic (custkey, rank, orderkey) order so both
    engines pick identical rows."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk", "o_orderkey")
        .limit(100)
    )


@register(
    "win_moving_avg_time",
    oracle="""
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      OVER w AS DOUBLE) / (100.0 * COUNT(*) OVER w)
                 AS avg_1h,
               COUNT(*) OVER w AS n_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("W4'", "time-window"),
)
def win_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4' — TIME-based moving aggregate: per user, the trailing
    1-HOUR average of value at every event — the event-time sibling
    of W4's numeric range frame, and the feature-engineering staple
    ("activity in the last hour") that tumbling windows can't express
    (every row gets its own trailing frame, not a bucketed one).

    Determinism (the r17 sf0.1 sweep lesson): the frame key is EXACT
    epoch MICROSECONDS on both engines — the old second-granular key
    paired Spark's unix_timestamp (floor) with DuckDB's
    CAST(epoch(ts) AS BIGINT) (round-half-even), so a row whose
    fractional second rounded up sat in different frames and n_1h
    itself diverged on boundary rows. And the average derives from an
    exact integer cents window SUM with ONE double division, no
    ROUND: Spark slides its frame sum incrementally while DuckDB
    re-sums, a different float path that ties at the 6-dp boundary;
    integer window sums are exact under any accumulation order.

    Scale: one shuffle on user_id + a per-user linear scan with a
    sliding two-pointer frame — no self-join, no explode; the
    streaming equivalent bounds state at 1 hour of events per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    n = F.count(F.lit(1)).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.sum(cents).over(w).cast("double") / (F.lit(100.0) * n)).alias(
            "avg_1h"
        ),
        n.alias("n_1h"),
    )
