"""Aggregation operators (SURVEY.md §2.4, A1-A6).

Reference-class parity: the reduce phase with map-side combiners
(Dean & Ghemawat OSDI'04 §4.3). Spark's ``groupBy().agg()`` compiles
to a partial/final ``HashAggregateExec`` pair automatically — the
combiner is built in, there is nothing to hand-schedule.

Scale notes: all group-bys here key on low-cardinality columns
(returnflag×linestatus = 6 groups; priorities = 5), so the shuffle
after partial aggregation moves only #groups × #partitions rows —
the pattern that survives a 100× scale-up. ``agg_count_distinct``
is the expensive one (exact distinct forces a shuffle on the distinct
key); ``agg_approx_distinct`` is the scale path (one pass, HLL
sketch, no second shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
    load_table,
    spread_small_scan,
)

# The flagship: TPC-H Q1 pricing summary (filter → 6-group agg → 8 aggregates).
# Determinism (r17 sf0.1 sweep class): every money column derives from
# an EXACT integer-scaled SUM with one final IEEE division — price is
# 2 dp (cents), disc_price 4 dp, charge 6 dp by TPC-H construction, so
# the scaled per-row values are exact integers, the sums are
# order-insensitive, and both engines divide identical integers.
# Quantities are integral doubles (exact under summation to 2^53), so
# SUM/AVG(l_quantity) are already deterministic. Same column names and
# double types as the classic Q1 — only the float noise is gone.
PRICING_SUMMARY_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * 10000) AS BIGINT))
                AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / (100 * COUNT(*)) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
                AS DOUBLE) / (100 * COUNT(*)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register("agg_group", oracle=PRICING_SUMMARY_ORACLE, tags=("A1",))
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — hash group-by with sum/avg/count (TPC-H Q1 shape).
    Partial aggregation (the MR combiner) happens map-side
    automatically; only 6 groups cross the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(F.round(price * 100).cast("long")).cast("double") / 100)
            .alias("sum_base_price"),
            (
                F.sum(F.round(price * (1 - disc) * 10000).cast("long"))
                .cast("double") / 10000
            ).alias("sum_disc_price"),
            (
                F.sum(
                    F.round(price * (1 - disc) * (1 + tax) * 1000000)
                    .cast("long")
                ).cast("double") / 1000000
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (
                F.sum(F.round(price * 100).cast("long")).cast("double")
                / (F.lit(100) * F.count(F.lit(1)))
            ).alias("avg_price"),
            (
                F.sum(F.round(disc * 100).cast("long")).cast("double")
                / (F.lit(100) * F.count(F.lit(1)))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("A2",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — keyless grand-total aggregate (TPC-H Q6 shape). Partial
    sums per partition, single-row final merge — no wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        # exact ten-thousandths (price 2 dp x discount 2 dp): the
        # global double SUM at 1e8 magnitude is accumulation-order
        # noise at the 6-dp canon boundary (r17 sf0.1 sweep class)
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount") * 10000
                ).cast("long")
            ).cast("double")
            / 10000
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("A3",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — exact distinct count per group (the two-round MR
    pattern). Spark plans this as expand + two aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_count_distinct_global",
    oracle="SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs FROM orders",
    tags=("A3",),
)
def agg_count_distinct_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3, global shape — single exact COUNT(DISTINCT) with no
    grouping: the exact query BASELINE.md's `distinct_customers` row
    times (the grouped variant above does strictly more work, so the
    bench compares this one against that row like-for-like)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(F.countDistinct("o_custkey").alias("n_custs"))


@register("agg_approx_distinct", tags=("A4",))  # rows-only: HLL sketches differ across engines
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — approximate distinct (HyperLogLog++). The 100 TB path for
    distinct counting: one pass, fixed-size sketch, mergeable across
    partitions, no distinct-key shuffle. Invariant-checked in pytest
    (within 5% of exact)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_custs"),
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5a — hierarchical rollup: (flag, status), (flag), ()."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5b — full cube over both grouping dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("A5",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5c — explicit grouping sets: per-flag and per-status totals
    in one pass (a single Expand + aggregate, not two jobs)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_collect",
    oracle="""
        SELECT lang,
               array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
    """,
    tags=("A6",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-group value buffering (collect_set), canonicalized
    with sort_array so output is deterministic and oracle-comparable.
    The MR analogue is a reducer that materializes its value iterator
    — bounded here by the small per-group distinct domain.

    The sorted set is serialized with array_join because the verify
    driver's canonicalizer hashes scalar cells only (list cells raise
    ``unhashable type`` — the one red row in CORRECTNESS_r01)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register("agg_approx_quantile", tags=("A4", "quantile"))  # rows-only: sketch-based, engine-specific
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4' — approximate percentiles via ``percentile_approx``
    (KLL/GK-style mergeable sketch): p50/p95/p99 of order totals per
    status in ONE pass with map-side partial sketches — the 100 TB
    path where exact percentile (full sort or value buffering per
    group) is off the table. Accuracy set to 10k (~0.01% rank
    error); pytest invariant pins each value within 1% rank of the
    exact percentile."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_stats_moments",
    oracle="""
        SELECT l_returnflag,
               ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
               ROUND(var_samp(l_extendedprice), 2) AS var_price,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(skewness(l_extendedprice)
                     * (COUNT(*) - 2) / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS skew_price,
               ROUND(kurtosis_pop(l_extendedprice), 6) AS kurt_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("A1", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregate family: stddev/variance (sample),
    correlation, covariance, skewness, kurtosis per group. All are
    single-pass mergeable aggregates (sum of powers / co-moments
    partial-aggregated map-side, combined associatively) — the same
    combiner discipline as SUM, so one shuffle of tiny partial states
    regardless of input size. Spark and DuckDB both use sample
    (n-1) normalization for stddev/var/covar; Spark's skewness /
    kurtosis are POPULATION moments while DuckDB's defaults are
    sample-corrected, so the oracle uses kurtosis_pop and rescales
    skewness by (n-2)/sqrt(n(n-1)) — verified equal at 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.skewness("l_extendedprice"), 6).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("kurt_price"),
    )


_HIST_BINS = 20


@register(
    "agg_histogram",
    oracle=f"""
        WITH b AS (
          SELECT CAST(least(floor(o_totalprice / (SELECT (MAX(o_totalprice) + 0.000001) / {_HIST_BINS} FROM orders)),
                      {_HIST_BINS - 1}) AS INTEGER) AS bin
          FROM orders
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY bin
    """,
    tags=("A1", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over a numeric column: bin width from a
    1-row MAX aggregate (broadcast scalar), then floor-divide +
    group. Two passes over the scan but both are columnar min/max +
    hash agg; the scalar never leaves the JVM. The +1e-6 on the max
    keeps the max row in the last bin under pure floor arithmetic
    (identical in both engines, no branch on the boundary)."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    width = o.agg(((F.max("o_totalprice") + 0.000001) / _HIST_BINS).alias("w"))
    return (
        o.crossJoin(F.broadcast(width))
        .select(
            F.least(
                F.floor(F.col("o_totalprice") / F.col("w")), F.lit(_HIST_BINS - 1)
            ).cast("int").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_exact_median",
    oracle="""
        SELECT l_returnflag,
               ROUND(median(l_extendedprice), 6) AS median_price,
               ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A4", "quantile"),
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p95 per group via Spark's `percentile` (exact,
    interpolating — same definition as DuckDB quantile_cont/median).
    Exact percentiles buffer each group's values on the reducer —
    fine for bounded groups, and exactly why the sketch-based
    `agg_approx_quantile` (mergeable, bounded-memory) is the 100 TB
    default; this operator is the ground truth it is tested
    against."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95_price"),
    )


@register(
    "agg_min_max_by",
    oracle="""
        SELECT o_orderstatus,
               arg_min(o_orderkey, o_totalprice) AS cheapest_order,
               arg_max(o_orderkey, o_totalprice) AS priciest_order,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("A1", "argminmax"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates: the key of the extreme row, not
    the extreme value — one pass, mergeable (carry (value, key) pairs
    through partial aggregation), where the naive formulation is a
    self-join back onto the min/max. o_totalprice is unique per
    status group at this corpus (doubles from a continuous range), so
    the arg is deterministic; with ties, pair the target with a
    unique tiebreak column instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_bool_any_every",
    oracle="""
        SELECT l_returnflag,
               bool_or(l_discount > 0.09) AS any_deep_discount,
               bool_and(l_quantity >= 1) AS every_qty_positive,
               CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_tax_free
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("A1", "bool"),
)
def agg_bool_any_every(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates — any()/every() per group plus a FILTER'd
    count: the data-quality assertion shape (does ANY row violate X /
    do ALL rows satisfy Y), one pass, mergeable partials like every
    other aggregate here. The FILTER clause spelling avoids the
    CASE-WHEN-1-ELSE-0-SUM contortion."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bool_and(F.col("l_quantity") >= 1).alias("every_qty_positive"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
    )


@register(
    "agg_bitwise",
    oracle="""
        SELECT o_orderstatus,
               bit_and(o_orderkey) AS key_and,
               bit_or(o_orderkey) AS key_or,
               bit_xor(o_orderkey) AS key_xor
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("A1", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR fold per group) — the flag-mask
    merge shape: OR accumulates capability bits, AND detects
    universally-set bits, XOR gives order-independent parity (a poor
    man's checksum usable as a cheap cross-engine content fingerprint
    on key sets). All three are associative+commutative, so partial
    aggregation applies as usual."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@register(
    "agg_rollup_grouping_id",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
               SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A5", "grouping"),
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with GROUPING() indicators — the disambiguation the
    plain rollup lacks: an output NULL can mean 'subtotal across this
    column' or 'the data really was NULL'; grouping() = 1 only for
    the former. Any consumer routing subtotal rows (report layers,
    cube caches) needs these bits, and they come free from the same
    Expand operator."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum("l_quantity").alias("sum_qty"),
    )


@register(
    "agg_string_concat",
    oracle="""
        SELECT lang,
               string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv
        FROM documents
        GROUP BY lang
    """,
    tags=("A6", "listagg"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg — ordered, delimited concatenation per
    group. Spark has no direct string_agg; the equivalent is
    sort_array(collect_set(...)) + array_join — and the explicit sort
    is NOT optional: unordered concatenation is nondeterministic
    across partitions/runs (the classic flaky-report bug; DuckDB's
    ORDER BY clause inside the aggregate exists for the same
    reason)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources_csv")
    )


@register(
    "agg_count_distinct_salted",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    tags=("A3", "skew"),
)
def agg_count_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3'' — two-stage salted exact distinct count, the rewrite for
    skewed groups: a plain per-key COUNT(DISTINCT) funnels each hot
    key's whole distinct set through one task. Stage 1 splits every
    key into 16 sub-keys by HASHING THE VALUE (each distinct value
    lands in exactly one salt bucket, so per-bucket distinct counts
    are disjoint); stage 2 sums the 16 partial counts per key. Both
    stages are ordinary hash aggs with partial aggregation — the hot
    key's work now spreads over 16 tasks. The oracle is the plain
    single-stage distinct, proving the rewrite exact."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", F.pmod(F.xxhash64("user_id"), F.lit(16)).alias("salt")
    ).agg(F.countDistinct("user_id").alias("part_distinct"))
    return salted.groupBy("event_type").agg(
        F.sum("part_distinct").alias("n_users")
    )


@register("agg_hll_mergeable", tags=("A4", "sketch"))  # rows-only: sketch estimates are engine-specific
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4'''' — mergeable DataSketches HLL (Spark 4 ``hll_sketch_agg``
    family), the property that makes sketches THE 100 TB distinct
    path: per-shard sketches union into the global answer without
    touching raw data again. Here: one HLL sketch per order status,
    then the three sketches union into a corpus-wide estimate — so
    the output carries both levels plus the exact counts, and the
    pytest invariant pins per-group AND unioned estimates within 5%
    of exact. (The union estimate is NOT bit-identical to a
    sketch-of-the-whole — the union gadget's internal representation
    differs from a directly-built HLL_4 sketch; measured 1488 vs 1492
    at sf0.01 — both sit within the same error bound.)
    ``approx_count_distinct`` (A4) gives one-shot estimates; this
    surface gives you the stored, re-unionable sketch — what
    incremental rollups persist between batches."""
    orders = load_table(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return per_group.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").alias("est_custs"),
        "exact_custs",
    ).unionByName(
        per_group.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_custs"),
        ).select(
            F.lit("ALL").alias("o_orderstatus"),
            "est_custs",
            F.lit(None).cast("long").alias("exact_custs"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
        FROM orders
        GROUP BY o_orderstatus
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    """,
    tags=("A3", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3''' — EXACT distinct counting via mergeable bitmaps
    (``bitmap_construct_agg``/``bitmap_or_agg``, Spark 3.5+): each
    group builds a fixed-width bitmap of its key positions; bitmaps
    OR together losslessly, so the corpus-wide distinct count comes
    from merging the per-group bitmaps — NO second pass over data and
    no re-shuffle on the key. The exact counterpart of the HLL sketch
    path (A4''''): same merge shape, zero error, at the cost of
    bitmap width scaling with the key domain (fine for dense int
    keys like custkey; HLL wins on unbounded/string domains). The
    oracle recomputes both levels with plain COUNT(DISTINCT),
    proving bitmap counting exact.

    The bucket dimension is mandatory: ``bitmap_bit_position`` is a
    position WITHIN a 32k-key bucket (``bitmap_bucket_number``), so
    bitmaps must be built per (group, bucket) and the counts summed —
    collapsing buckets makes distinct keys collide (custkey 0 and 1
    share position 0 across buckets; measured off-by-one per group)."""
    orders = load_table(spark, sf_dir, "orders")
    per_bucket = orders.groupBy(
        "o_orderstatus", F.expr("bitmap_bucket_number(o_custkey)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"))
    per_group = per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_custs")
    )
    overall = (
        per_bucket.groupBy("bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
        .agg(F.sum("c").alias("n_custs"))
        .select(F.lit("ALL").alias("o_orderstatus"), "n_custs")
    )
    return per_group.unionByName(overall)


@register(
    "agg_regression_stats",
    oracle="""
        SELECT l_returnflag,
               regr_slope(l_extendedprice, l_quantity)      AS slope,
               regr_intercept(l_extendedprice, l_quantity)  AS intercept,
               corr(l_extendedprice, l_quantity)            AS price_qty_corr,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("A8", "regression"),
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8' — the SQL linear-regression aggregate family: per-group
    OLS slope/intercept of price on quantity plus correlation — the
    in-engine version of the fit-a-trend step every metrics pipeline
    runs (no mllib, no driver-side math; one hash agg with partial
    merge, the same shuffle shape as any sum). DuckDB implements the
    identical ANSI regr_* family, so the whole fit is value-checked
    cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("regr_slope(l_extendedprice, l_quantity)").alias("slope"),
        F.expr("regr_intercept(l_extendedprice, l_quantity)").alias("intercept"),
        F.corr("l_extendedprice", "l_quantity").alias("price_qty_corr"),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
    )


@register(
    "agg_winsorized_stats",
    oracle="""
        WITH cuts AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS p05,
                 quantile_cont(value, 0.95) AS p95
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               ROUND(cuts.p05, 6) AS p05,
               ROUND(cuts.p95, 6) AS p95,
               ROUND(AVG(e.value), 6) AS mean_raw,
               ROUND(AVG(LEAST(GREATEST(e.value, cuts.p05), cuts.p95)), 6)
                 AS mean_winsorized
        FROM events e JOIN cuts ON e.event_type = cuts.event_type
        GROUP BY e.event_type, cuts.p05, cuts.p95
    """,
    tags=("A4''", "robust", "winsorize"),
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-at-percentile) robust mean per group — the
    outlier-resistant aggregate metric pipelines report next to the
    raw mean (a single fat-finger value cannot move it). Two passes:
    exact p05/p95 per group (Spark `percentile`, same interpolating
    definition as DuckDB quantile_cont), broadcast the
    |groups|-sized cutoff table back, clip and average. Exact
    percentiles buffer per-group values like agg_exact_median — the
    sketch-based approx_percentile swaps in above memory bounds, at
    the cost of the hash oracle.

    Scale: fact table scanned twice (percentile pass + clipped
    mean); both aggregates are group-keyed hash shuffles, the cutoff
    join broadcasts. A one-pass variant exists (t-digest style) but
    is approximate by nature."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(
                F.avg(F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))), 6
            ).alias("mean_winsorized"),
        )
        .select(
            "event_type",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "mean_raw",
            "mean_winsorized",
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
        SELECT lang, source AS mode_source, n
        FROM (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY COUNT(*) DESC, source) AS rn
          FROM documents GROUP BY lang, source
        ) WHERE rn = 1
    """,
    tags=("A13", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group (most frequent source per lang):
    count + windowed argmax with the value itself as tiebreak.
    Spark 4 ships a native `mode()` aggregate but leaves ties
    engine-internal (whichever value the final merge saw first) — a
    direct cross-engine hash mismatch; the count+row_number form
    pins ties explicitly and costs the same two group-keyed hash
    shuffles, the second over the already-collapsed (group, value)
    counts. At scale the windowed argmax runs on count-table-sized
    data, and a max_by(struct(n, value)) variant folds it into one
    aggregate when the tiebreak can ride inside the struct ordering."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "source")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("mode_source"), "n")
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
        WITH gaps AS (
          SELECT event_type,
                 epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
          FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS mean_gap_us,
               ROUND(median(gap_us), 6) AS median_gap_us,
               ROUND(quantile_cont(gap_us, 0.95), 6) AS p95_gap_us
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
    tags=("T14", "timeseries", "interarrival"),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 — inter-arrival time distribution per event type (mean /
    median / p95 gap): the burstiness profile behind rate-limit
    sizing, anomaly thresholds (events_anomaly_zscore consumes a
    mean; tail percentiles catch what means hide), and arrival-
    process modeling. Gaps via lag() in exact integer microseconds;
    exact interpolating percentiles (same definition both engines).

    Scale: one shuffle keyed by the window partition, then a
    group-keyed aggregate over gap rows; exact percentiles buffer
    per-group — the approx_percentile sketch swaps in above memory
    bounds, as agg_approx_quantile documents."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    # mean = exact integer SUM, ONE double division, NO round: the
    # integer sum is exact under any accumulation order and the
    # single division is deterministic IEEE on both engines — while
    # both avg() (per-element double accumulation, order-sensitive)
    # and a final ROUND(x, 6) (DuckDB's multiplies by 1e6 past 2^53
    # at these magnitudes and corrupts ulps) re-diverge it (caught by
    # the r17 sf0.001 cross-scale sweep)
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias(
            "mean_gap_us"
        ),
        F.round(F.expr("percentile(gap_us, 0.5)"), 6).alias("median_gap_us"),
        F.round(F.expr("percentile(gap_us, 0.95)"), 6).alias("p95_gap_us"),
    )


@register(
    "ab_test_welch_t",
    oracle="""
        WITH g AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
                 value
          FROM events WHERE event_type = 'purchase'
        ),
        s AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(value) AS m, VAR_SAMP(value) AS v
          FROM g GROUP BY grp
        ),
        w AS (
          SELECT a.n AS n_a, b.n AS n_b, a.m AS m_a, b.m AS m_b,
                 a.v / a.n AS se2_a, b.v / b.n AS se2_b
          FROM (SELECT * FROM s WHERE grp = 'A') a,
               (SELECT * FROM s WHERE grp = 'B') b
        )
        SELECT n_a, n_b,
               ROUND(m_a, 6) AS mean_a,
               ROUND(m_b, 6) AS mean_b,
               ROUND((m_a - m_b) / sqrt(se2_a + se2_b), 6) AS t_stat,
               ROUND(power(se2_a + se2_b, 2)
                     / (power(se2_a, 2) / (n_a - 1) + power(se2_b, 2) / (n_b - 1)),
                     6) AS df_welch
        FROM w
    """,
    tags=("A15", "abtest", "stats"),
)
def ab_test_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — Welch's unequal-variance t statistic
    with Welch–Satterthwaite degrees of freedom over purchase values,
    arms assigned by user_id parity (the deterministic stand-in for
    an experiment-assignment column). This is the analysis every
    experimentation platform runs per metric: two mergeable moment
    sets (n, mean, sample variance) per arm, then pure scalar
    arithmetic — the fact table is scanned once, shuffled once on
    the 2-value arm key, and the test statistic assembles from a
    2-row frame. Rounded at 6 dp so partial-aggregation summation
    order cannot flip the hash.

    Scale: identical cost to agg_stats_moments; thousands of
    metrics × arms stay one wide aggregate each."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = (
        ev.select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"), "value"
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = s.filter(F.col("grp") == "A").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), (F.col("v") / F.col("n")).alias("se2_a")
    )
    b = s.filter(F.col("grp") == "B").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), (F.col("v") / F.col("n")).alias("se2_b")
    )
    se2 = F.col("se2_a") + F.col("se2_b")
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("se2_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("se2_b"), 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@register(
    "chi_square_independence",
    oracle="""
        WITH obs AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
                 event_type,
                 CAST(COUNT(*) AS DOUBLE) AS o
          FROM events GROUP BY grp, event_type
        ),
        tot AS (SELECT SUM(o) AS n FROM obs),
        rm AS (SELECT grp, SUM(o) AS r FROM obs GROUP BY grp),
        cm AS (SELECT event_type, SUM(o) AS c FROM obs GROUP BY event_type)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((SELECT COUNT(*) - 1 FROM rm)
                    * (SELECT COUNT(*) - 1 FROM cm) AS BIGINT) AS dof,
               ROUND(SUM(power(obs.o - rm.r * cm.c / tot.n, 2)
                         / (rm.r * cm.c / tot.n)), 6) AS chi2
        FROM obs
        JOIN rm ON obs.grp = rm.grp
        JOIN cm ON obs.event_type = cm.event_type
        CROSS JOIN tot
    """,
    tags=("A16", "stats", "chi2"),
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between experiment arm
    (user_id parity) and event_type — the categorical sibling of
    ab_test_welch_t (sample-ratio-mismatch checks and guardrail
    metrics are exactly this test). The contingency table is one
    group-keyed aggregate; expected counts come from its row/column
    marginals (grouped re-aggregates of the tiny table) and the
    statistic assembles with two broadcast joins — the fact table is
    scanned ONCE and everything after is |arms|×|types|-sized.

    Scale: the observed-counts aggregate is the only corpus-touching
    stage; marginals and the chi² sum are contingency-table-sized at
    any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
            "event_type",
        )
        .groupBy("grp", "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    obs = obs.localCheckpoint(eager=True)  # tiny; avoids triple fact scans
    rm = obs.groupBy("grp").agg(F.sum("o").alias("r"))
    cm = obs.groupBy("event_type").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    n_r = rm.count()
    n_c = cm.count()
    e = F.col("r") * F.col("c") / F.col("n")
    return (
        obs.join(F.broadcast(rm), "grp")
        .join(F.broadcast(cm), "event_type")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.lit((n_r - 1) * (n_c - 1)).cast("long").alias("dof"),
            F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        )
    )


_CM_D = 4   # count-min hash rows
_CM_W = 64  # count-min columns per row

# Portable column hash: first md5 byte of 'cm{i}|word', mod W — the
# engine-neutral nibble arithmetic used across the fleet.
_CM_COL_SPARK = (
    "pmod(16 * (instr('0123456789abcdef', substr(md5(concat('cm', CAST({i} AS STRING), '|', word)), 1, 1)) - 1)"
    " + instr('0123456789abcdef', substr(md5(concat('cm', CAST({i} AS STRING), '|', word)), 2, 1)) - 1, "
    + str(_CM_W)
    + ")"
)
_CM_COL_DUCK = (
    "((16 * (strpos('0123456789abcdef', substr(md5('cm' || CAST({i} AS VARCHAR) || '|' || word), 1, 1)) - 1)"
    " + strpos('0123456789abcdef', substr(md5('cm' || CAST({i} AS VARCHAR) || '|' || word), 2, 1)) - 1) % "
    + str(_CM_W)
    + ")"
)


@register(
    "agg_countmin_sketch",
    # The sketch is DETERMINISTIC (md5-derived cells), so unlike HLL
    # this sketch op is fully hash-oracled: DuckDB rebuilds the same
    # 4x64 cell table and takes the same per-word minima.
    oracle="WITH wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY word), "
    "cells AS (SELECT row_id, col_id, SUM(n) AS cell FROM ("
    + " UNION ALL ".join(
        f"SELECT {i} AS row_id, {_CM_COL_DUCK.format(i=i)} AS col_id, n FROM wc"
        for i in range(_CM_D)
    )
    + ") GROUP BY row_id, col_id), "
    "probes AS ("
    + " UNION ALL ".join(
        f"SELECT word, n, {i} AS row_id, {_CM_COL_DUCK.format(i=i)} AS col_id FROM wc"
        for i in range(_CM_D)
    )
    + ") "
    "SELECT p.word, MIN(p.n) AS true_n, CAST(MIN(c.cell) AS BIGINT) AS cm_estimate, "
    "CAST(MIN(c.cell) - MIN(p.n) AS BIGINT) AS overestimate "
    "FROM probes p JOIN cells c ON p.row_id = c.row_id AND p.col_id = c.col_id "
    "GROUP BY p.word",
    tags=("A4", "sketch", "countmin"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus word stream — the mergeable
    frequency sketch (Cormode & Muthukrishnan 2005) behind heavy-
    hitter monitoring at stream scale: 4 hash rows × 64 columns,
    each word incrementing one cell per row; a point estimate is the
    MINIMUM of its 4 cells and NEVER underestimates. The sketch here
    is verified end-to-end: cells and estimates are deterministic
    functions of the corpus (portable md5 column hashing), so the
    DuckDB oracle rebuilds the identical sketch — unlike HLL, whose
    internals are engine-private (agg_hll_mergeable is rows-only).

    Scale: the word stream reduces by ONE map-side-partial groupBy;
    sketch construction aggregates the vocab-sized count table into
    exactly D×W = 256 cells (mergeable: cells of two corpus shards
    ADD — the same property that makes the sketch a streaming/
    partial-agg citizen); estimates join the bounded probe set
    against 256 cells. Nothing here scales with corpus size except
    the first wordcount shuffle. Probing every vocab word (done here
    to measure the overestimate distribution) is a test-scale act;
    production probes heavy hitters only."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = None
    for i in range(_CM_D):
        r = wc.select(
            "word",
            "n",
            F.lit(i).alias("row_id"),
            F.expr(_CM_COL_SPARK.format(i=i)).cast("long").alias("col_id"),
        )
        rows = r if rows is None else rows.unionByName(r)
    cells = rows.groupBy("row_id", "col_id").agg(F.sum("n").alias("cell"))
    return (
        rows.join(cells, ["row_id", "col_id"])
        .groupBy("word")
        .agg(
            F.min("n").alias("true_n"),
            F.min("cell").cast("long").alias("cm_estimate"),
            (F.min("cell") - F.min("n")).cast("long").alias("overestimate"),
        )
    )


_HLLP_M = 64       # portable-HLL register count (2^6)
_HLLP_ALPHA = 0.709  # standard alpha for m=64

# rho = 1-based position of the first 1-bit in the 48-bit value drawn
# from md5 hex chars 3..14, computed with STRING arithmetic (regexp
# leading-zero count + a nibble CASE) — exact in both engines, no
# float log2 anywhere. Bucket = first md5 byte % 64.
_HLLP_BUCKET_SPARK = (
    "pmod(16 * (instr('0123456789abcdef', substr(md5(CAST(k AS STRING)), 1, 1)) - 1)"
    " + instr('0123456789abcdef', substr(md5(CAST(k AS STRING)), 2, 1)) - 1, 64)"
)
_HLLP_BUCKET_DUCK = (
    "((16 * (strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1)"
    " + strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1) % 64)"
)
_HLLP_RHO_SPARK = """
    CAST(CASE WHEN vhex = '000000000000' THEN 49
         ELSE 4 * length(regexp_extract(vhex, '^0*', 0))
              + CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1
                     WHEN nib >= 2 THEN 2 ELSE 3 END + 1
    END AS INT)
"""
_HLLP_RHO_DUCK = """
    CAST(CASE WHEN vhex = '000000000000' THEN 49
         ELSE 4 * len(regexp_extract(vhex, '^0*'))
              + CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1
                     WHEN nib >= 2 THEN 2 ELSE 3 END + 1
    END AS INTEGER)
"""


@register(
    "agg_hll_portable",
    oracle=f"""
        WITH keys AS (SELECT o_custkey AS k FROM orders),
        h AS (
          SELECT {_HLLP_BUCKET_DUCK} AS bucket,
                 substr(md5(CAST(k AS VARCHAR)), 3, 12) AS vhex,
                 strpos('0123456789abcdef',
                        substr(substr(md5(CAST(k AS VARCHAR)), 3, 12),
                               len(regexp_extract(substr(md5(CAST(k AS VARCHAR)), 3, 12), '^0*')) + 1, 1)) - 1
                   AS nib
          FROM keys
        ),
        regs AS (
          SELECT bucket, MAX({_HLLP_RHO_DUCK}) AS r
          FROM h GROUP BY bucket
        ),
        est AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                 {_HLLP_ALPHA} * 64.0 * 64.0
                   / (SUM(POW(2.0, -r)) + (64 - COUNT(*))) AS e_raw
          FROM regs
        ),
        truth AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_distinct FROM orders)
        SELECT CAST(64 AS INTEGER) AS m,
               est.n_buckets_used,
               ROUND(CASE WHEN est.e_raw <= 2.5 * 64 AND est.n_buckets_used < 64
                          THEN 64.0 * ln(64.0 / (64 - est.n_buckets_used))
                          ELSE est.e_raw END, 6) AS estimate,
               truth.true_distinct,
               ROUND(ABS(CASE WHEN est.e_raw <= 2.5 * 64 AND est.n_buckets_used < 64
                              THEN 64.0 * ln(64.0 / (64 - est.n_buckets_used))
                              ELSE est.e_raw END - truth.true_distinct)
                     / truth.true_distinct, 6) AS rel_error
        FROM est, truth
    """,
    tags=("A4", "sketch", "hll"),
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog (Flajolet et al. 2007) over distinct
    customers: 64 registers, bucket + first-one-bit position (rho)
    derived from md5 hex with pure STRING arithmetic (regexp
    leading-zero count + a nibble CASE — no float log2, whose
    rounding at power-of-two boundaries would diverge between
    engines), harmonic-mean estimate with the standard small-range
    linear-counting correction. The engine-internal sketch
    (agg_approx_distinct / agg_hll_mergeable) is rows-only by
    necessity; this construction makes the approximate-distinct
    ALGORITHM itself hash-checkable: registers are exact integers in
    both engines, so estimate and relative error match to 6 dp.

    Scale: registers are MAX-mergeable (the map-side combine IS the
    sketch merge — one 64-row aggregate regardless of input size);
    the true-distinct column is test-scale ground truth, dropped in
    production. Estimate quality: ±~13% expected at m=64 (1.04/√64),
    reported directly as rel_error."""
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    h = orders.select(
        F.expr(_HLLP_BUCKET_SPARK).alias("bucket"),
        F.expr("substr(md5(CAST(k AS STRING)), 3, 12)").alias("vhex"),
    ).withColumn(
        "nib",
        F.expr(
            "instr('0123456789abcdef', substr(vhex, length(regexp_extract(vhex, '^0*', 0)) + 1, 1)) - 1"
        ),
    )
    regs = h.groupBy("bucket").agg(F.max(F.expr(_HLLP_RHO_SPARK)).alias("r"))
    est = regs.agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        (
            F.lit(_HLLP_ALPHA * 64.0 * 64.0)
            / (F.sum(F.pow(F.lit(2.0), -F.col("r"))) + (64 - F.count(F.lit(1))))
        ).alias("e_raw"),
    )
    truth = load_table(spark, sf_dir, "orders").agg(
        F.count_distinct("o_custkey").alias("true_distinct")
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * 64) & (F.col("n_buckets_used") < 64),
        64.0 * F.log(64.0 / (64 - F.col("n_buckets_used"))),
    ).otherwise(F.col("e_raw"))
    return est.crossJoin(F.broadcast(truth)).select(
        F.lit(64).cast("int").alias("m"),
        "n_buckets_used",
        F.round(corrected, 6).alias("estimate"),
        "true_distinct",
        F.round(F.abs(corrected - F.col("true_distinct")) / F.col("true_distinct"), 6).alias(
            "rel_error"
        ),
    )


_KMV_K = 16  # small enough that the estimator branch (not just exact
           # mode) engages even at the sf0.01 driver scale (~25 docs/source)
_KMV_U = 1 << 48  # hash universe: 48 bits from md5 hex chars 1..12

# DuckDB has no conv(hex, 16, 10): build the 48-bit value as an explicit
# 12-nibble positional sum (generated, not hand-typed). Spark uses
# conv() — test_llm_pipeline pins that both produce identical values.
_KMV_V_DUCK = " + ".join(
    f"CAST({16 ** (11 - i)} AS BIGINT) * "
    f"(strpos('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1)"
    for i in range(12)
)
_KMV_V_SPARK = "CAST(conv(substr(md5(text), 1, 12), 16, 10) AS BIGINT)"


@register(
    "sketch_kmv_distinct",
    # Everything is exact integer arithmetic on md5-derived 48-bit
    # values: k-th order statistics, floor divisions of positive
    # BIGINTs, saturating subtraction — bit-identical across engines.
    oracle=f"""
        WITH hv AS (
          SELECT DISTINCT source, {_KMV_V_DUCK} AS v FROM documents
        ),
        ranked AS (
          SELECT source, v,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn
          FROM hv
        ),
        kept AS (SELECT * FROM ranked WHERE rn <= {_KMV_K}),
        est AS (
          SELECT source,
                 CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                      ELSE ({_KMV_K - 1} * {_KMV_U}) // MAX(CASE WHEN rn = {_KMV_K} THEN v END)
                      END AS BIGINT) AS est
          FROM kept GROUP BY source
        ),
        srcs AS (SELECT DISTINCT source FROM documents),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b
          FROM srcs a JOIN srcs b ON a.source < b.source
        ),
        members AS (
          SELECT p.source_a, p.source_b, kv.v
          FROM pairs p JOIN kept kv ON kv.source = p.source_a OR kv.source = p.source_b
          GROUP BY 1, 2, 3
        ),
        uranked AS (
          SELECT source_a, source_b, v,
                 ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY v) AS rn
          FROM members
        ),
        uest AS (
          SELECT source_a, source_b,
                 CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                      ELSE ({_KMV_K - 1} * {_KMV_U}) // MAX(CASE WHEN rn = {_KMV_K} THEN v END)
                      END AS BIGINT) AS est_union
          FROM uranked WHERE rn <= {_KMV_K} GROUP BY 1, 2
        )
        SELECT u.source_a, u.source_b,
               ea.est AS est_a, eb.est AS est_b, u.est_union,
               greatest(CAST(0 AS BIGINT), ea.est + eb.est - u.est_union) AS est_intersect
        FROM uest u
        JOIN est ea ON ea.source = u.source_a
        JOIN est eb ON eb.source = u.source_b
    """,
    tags=("A4", "sketch", "kmv", "theta", "cross-source"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — KMV (k-minimum-values / theta) distinct sketches with SET
    OPERATIONS: per-source distinct-document estimates plus pairwise
    union and intersection estimates — the sketch family member HLL
    cannot provide (HLL unions but never intersects; KMV's kept
    sample supports both), and the cheap first answer to "how much
    does source A overlap source B?" before running the exact
    `dedup_cross_source_matrix`. Estimator: with v_k the k-th
    smallest 48-bit hash, D ≈ (k-1)·U/v_k (Beyer et al. 2007,
    unbiased); below k values the sketch IS the exact set. The union
    sketch is the k smallest of the two kept sets' union (valid
    because the k smallest of A ∪ B is a subset of kept_A ∪ kept_B);
    intersection via inclusion-exclusion, clamped at 0.

    Fully hash-oracled (unlike the engine-internal approx_distinct):
    hashes are md5-derived integers, estimates are floor divisions
    of positive BIGINTs — deterministic in both engines.

    Scale: one distinct-shuffle on (source, v), then per-source
    k-min via the canonical rank-filter — and because the window
    carries ONLY row_number (no count-over-partition beside it),
    Catalyst plans WindowGroupLimit: a map-side partial top-k per
    source BEFORE the shuffle, i.e. the bounded k-min heap a
    hand-written sketch keeps, derived by the optimizer. Everything
    after `kept` is sketch-sized: ≤ k rows per source, pair
    expansion via an EXPLODED equi-join on source (never an OR-join)
    against a broadcast pair list — |sources|²·k rows total,
    independent of corpus size."""
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    hv = docs.select("source", F.expr(_KMV_V_SPARK).alias("v")).distinct()
    by_src = Window.partitionBy("source")
    # rank-only window (no count-over-partition beside it): Catalyst
    # plans WindowGroupLimit, a map-side partial top-k per source
    # BEFORE the shuffle — the bounded k-min heap a hand-written
    # sketch would keep. Exact mode needs no full count: fewer than k
    # kept rows means the kept set IS the whole set.
    ranked = hv.select(
        "source", "v", F.row_number().over(by_src.orderBy("v")).alias("rn")
    )
    kept = ranked.filter(F.col("rn") <= _KMV_K)

    def _estimate(grouped):
        n_kept = F.count(F.lit(1))
        return grouped.agg(
            F.when(n_kept < _KMV_K, n_kept)
            .otherwise(F.expr(f"{(_KMV_K - 1) * _KMV_U} div max(CASE WHEN rn = {_KMV_K} THEN v END)"))
            .cast("long")
            .alias("est"),
        )

    est = _estimate(kept.groupBy("source"))
    srcs = docs.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
    )
    members = (
        pairs.select(
            "source_a", "source_b",
            F.explode(F.array("source_a", "source_b")).alias("source"),
        )
        .join(broadcast(kept.select("source", "v")), "source")
        .select("source_a", "source_b", "v")
        .distinct()
    )
    by_pair = Window.partitionBy("source_a", "source_b")
    uranked = members.select(
        "source_a",
        "source_b",
        "v",
        F.row_number().over(by_pair.orderBy("v")).alias("rn"),
    )
    uest = _estimate(uranked.filter(F.col("rn") <= _KMV_K).groupBy("source_a", "source_b")).withColumnRenamed(
        "est", "est_union"
    )
    out = (
        uest.join(est.withColumnRenamed("source", "source_a").withColumnRenamed("est", "est_a"), "source_a")
        .join(est.withColumnRenamed("source", "source_b").withColumnRenamed("est", "est_b"), "source_b")
    )
    return out.select(
        "source_a",
        "source_b",
        "est_a",
        "est_b",
        "est_union",
        F.greatest(F.lit(0).cast("long"), F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersect"
        ),
    )


_QKMV_K = 64
# quantiles as exact rationals; sample index = ceil(num*n/den) via
# integer (a + b - 1) div b — no float q*n (0.9*10 = 9.000...002 would
# ceil differently per engine)
_QKMV_QS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))


@register(
    "agg_quantile_sketch_kmv",
    oracle=f"""
        WITH hv AS (
          SELECT l_returnflag AS flag, l_extendedprice AS val,
                 md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS h
          FROM lineitem
        ),
        kept AS (
          SELECT flag, val FROM (
            SELECT flag, val, ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) AS rn
            FROM hv
          ) WHERE rn <= {_QKMV_K}
        ),
        ordered AS (
          SELECT flag, val,
                 ROW_NUMBER() OVER (PARTITION BY flag ORDER BY val, flag) AS vr,
                 COUNT(*) OVER (PARTITION BY flag) AS n
          FROM kept
        )
        SELECT flag, CAST(MAX(n) AS BIGINT) AS n_sample,
               {", ".join(
                   f"MAX(CASE WHEN vr = (({num} * n + {den} - 1) // {den}) THEN val END) AS est_{name}"
                   for name, num, den in _QKMV_QS
               )}
        FROM ordered GROUP BY flag
    """,
    tags=("A4''", "sketch", "quantile", "kmv"),
)
def agg_quantile_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4'' — MERGEABLE deterministic quantile sketch: per group keep
    the {_QKMV_K} rows whose md5 row-key hash is smallest (a uniform
    sample chosen by hash order, so two sketches merge by union +
    re-rank exactly like `sketch_kmv_distinct`), then read quantile
    estimates as type-1 order statistics of the sample. The
    hash-oracled member of the quantile family: `agg_approx_quantile`
    (engine-internal KLL) stays rows-only by nature, this one is
    deterministic end-to-end — hash order fixes the sample, sample
    indices are exact integer ceilings (never float q*n, whose
    last-ulp error flips ceil() between engines), and estimates are
    SELECTED input values, never interpolated.

    Scale: the hash-rank window carries only row_number, so Catalyst
    plans WindowGroupLimit — each partition forwards at most k rows
    per group to the shuffle (the mergeable-sketch property, derived
    by the optimizer). The value-rank stage runs on ≤ k rows per
    group. Error: rank error O(1/sqrt(k)) like any uniform-sample
    quantile; raise k for tighter bands.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the md5-per-row keying and the
    WindowGroupLimit pre-filter serialized on one core locally;
    interleaved A/B 0.90 vs 1.57 s median at sf0.1. The hash sample
    is partitioning-independent (md5 over the unique row key has no
    ties), so the result is identical. ``sketch_kmv_distinct``
    measured a wash under the same A/B and stays stock."""
    li = spread_small_scan(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    hv = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("val"),
        F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))).alias("h"),
    )
    kept = (
        hv.withColumn(
            "rn", F.row_number().over(Window.partitionBy("flag").orderBy("h"))
        )
        .filter(F.col("rn") <= _QKMV_K)
        .select("flag", "val")
    )
    by_flag = Window.partitionBy("flag")
    ordered = kept.select(
        "flag",
        "val",
        F.row_number().over(by_flag.orderBy("val", "flag")).alias("vr"),
        F.count(F.lit(1)).over(by_flag).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_sample")] + [
        F.max(
            F.when(
                F.col("vr") == F.expr(f"({num} * n + {den - 1}) div {den}"), F.col("val")
            )
        ).alias(f"est_{name}")
        for name, num, den in _QKMV_QS
    ]
    return ordered.groupBy("flag").agg(*aggs)


@register(
    "dq_benford_first_digit",
    oracle="""
        WITH obs AS (
          SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                      AS BIGINT) AS digit,
                 COUNT(*) AS n
          FROM orders WHERE o_totalprice >= 1
          GROUP BY 1
        ),
        tot AS (SELECT SUM(n) AS nt FROM obs)
        SELECT CAST(digit AS INT) AS digit,
               CAST(n AS BIGINT) AS n_obs,
               ROUND(nt * (ln(digit + 1) - ln(digit)) / ln(10), 6) AS n_expected,
               ROUND(power(n - nt * (ln(digit + 1) - ln(digit)) / ln(10), 2)
                     / (nt * (ln(digit + 1) - ln(digit)) / ln(10)), 6) AS chi2_term,
               ROUND(SUM(power(n - nt * (ln(digit + 1) - ln(digit)) / ln(10), 2)
                         / (nt * (ln(digit + 1) - ln(digit)) / ln(10))) OVER (), 6)
                 AS chi2_total
        FROM obs CROSS JOIN tot
    """,
    tags=("DQ", "benford", "fraud", "stats"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ — Benford's-law first-digit screen over order totals (the
    classic forensic-accounting / synthetic-data smell test, public
    method — Benford 1938, Nigrini's audit usage): observed leading
    digits of ⌊o_totalprice⌋ vs the Benford expectation
    ``P(d) = log10(1 + 1/d)``, per-digit χ² terms and the total χ²
    (9-cell goodness of fit, 8 dof). A pipeline runs this as a drift
    / fabrication alarm on monetary feeds: conforming feeds score
    low; generated or truncated data lights up (the TPC-H-ish corpus
    itself scores astronomically — uniform-ish totals are exactly
    what Benford flags; the operator's value is the COMPARISON over
    time, and the test pins the corpus's known signature).

    Portability: the leading digit comes from the INTEGER part's
    string form (bigint→string is identical in every engine — never
    stringify a DOUBLE, whose shortest-roundtrip form differs), and
    the expectation uses ``(ln(d+1) − ln d)/ln 10`` — lns of small
    integers, the portable float discipline; χ² is assembled from
    those plus integer counts and rounded at 6 dp.

    Scale: one scan, one map-side-combining 9-row groupBy; the total
    rides a broadcast 1-row scalar (allowlisted); the χ²-total
    window runs over the 9-row rollup — the domain-bounded window
    contract."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    obs = (
        orders.select(
            F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("nt"))
    p = (F.log(F.col("digit") + 1) - F.log("digit")) / F.log(F.lit(10))
    exp_n = F.col("nt") * p
    term = F.pow(F.col("n") - exp_n, 2) / exp_n
    w = Window.partitionBy()  # 9-row rollup — domain-bounded, never corpus
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n_obs"),
            F.round(exp_n, 6).alias("n_expected"),
            F.round(term, 6).alias("chi2_term"),
            F.round(F.sum(term).over(w), 6).alias("chi2_total"),
        )
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
