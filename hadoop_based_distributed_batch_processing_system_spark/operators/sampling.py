"""Sampling and reshaping operators (SURVEY.md §2.11 scale
discipline + training-data-pipeline surface).

Sampling at 100 TB must be DETERMINISTIC and repeatable — a pipeline
re-run (or a late-arriving partition) has to select the same rows, so
`rand()`-based `df.sample` is the wrong tool for lineage-stable
subsets. The operators here sample by content hash: a row is in the
sample iff a hex prefix of `md5(key)` falls below a threshold. That
predicate is a plain filter — it pushes down, costs no shuffle, needs
no RNG state, and is expressible identically in any engine (so the
DuckDB oracle proves the selection itself, not just aggregates of
it).

Pivot/unpivot cover the wide↔long reshapes every feature-extraction
pipeline ends with. Pivot is a single hash aggregation over
(group, spread) pairs — no extra shuffle vs a plain group-by when the
spread values are enumerated up front (passing the value list skips
Spark's extra distinct-scan job).

Reference parity: the reference system class samples by emitting a
subset in user map code (`[REF-EMPTY]`, SURVEY.md §0) — hash-mod
selection is the canonical MapReduce idiom for it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

# hex prefix < '1a' ⇒ 26/256 ≈ 10.2% of keys, uniformly (md5 is
# uniform over hex chars); 2 chars of prefix keeps the string compare
# cheap while bounding selection granularity at 1/256.
_P10 = "1a"

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def hash_bucket(col_expr) -> "F.Column":
    """First two hex chars of md5 — a deterministic 256-bucket hash
    identical across engines (md5 of the same string is the same
    lowercase hex everywhere)."""
    return F.substring(F.md5(col_expr), 1, 2)


@register(
    "sample_hash_deterministic",
    oracle=f"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price
        FROM lineitem
        WHERE substring(md5(l_orderkey || '|' || l_linenumber), 1, 2) < '{_P10}'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("P5", "sampling"),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of lineitem by content hash of the
    primary key, then the Q1-shape summary over the sample. The
    sample predicate is a pushable filter (no shuffle, no RNG): the
    SAME rows are selected on every run, on any engine, under any
    partitioning — which is what makes downstream experiments
    reproducible and incremental re-runs consistent at 100 TB. The
    oracle runs the identical predicate in DuckDB, proving the
    selection itself is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(hash_bucket(key) < _P10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sample_stratified_deterministic",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) <
              CASE event_type
                WHEN 'error' THEN 'ff'
                WHEN 'purchase' THEN '80'
                ELSE '1a'
              END
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("P5", "sampling"),
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-stratum rates (errors
    kept ~100%, purchases ~50%, the high-volume rest ~10%) via a
    CASE'd threshold on the same md5 bucket. This is the standard
    class-rebalancing read for training pipelines: one pushed-down
    filter, no `sampleBy` RNG, and rare strata survive re-runs
    bit-identically. (`ff` keeps 254/256 of errors — the two top
    buckets fold out so the threshold stays a strict compare in both
    engines.)"""
    ev = load_table(spark, sf_dir, "events")
    thresh = (
        F.when(F.col("event_type") == "error", F.lit("ff"))
        .when(F.col("event_type") == "purchase", F.lit("80"))
        .otherwise(F.lit(_P10))
    )
    return (
        ev.filter(hash_bucket(F.col("event_id").cast("string")) < thresh)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "pivot_event_type_daily",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    tags=("A7", "pivot"),
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: daily event counts spread into one column per
    event type. The spread values are passed explicitly, which (a)
    skips the extra distinct-scan job Spark otherwise runs to learn
    them and (b) fixes the output schema — both mandatory at scale
    (an unenumerated pivot on a high-cardinality column is a schema
    explosion). One hash aggregation; missing cells filled to 0 to
    match COUNT FILTER semantics."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    wide = (
        ev.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )
    total = sum((F.col(t) for t in _EVENT_TYPES[1:]), F.col(_EVENT_TYPES[0]))
    return wide.withColumn("total", total.cast("long")).orderBy("day")


@register(
    "unpivot_metrics_long",
    oracle="""
        WITH wide AS (
          SELECT l_returnflag,
                 CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE) / 100 AS sum_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_rows
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, metric, value FROM (
          SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
          UNION ALL
          SELECT l_returnflag, 'sum_price', sum_price FROM wide
          UNION ALL
          SELECT l_returnflag, 'n_rows', n_rows FROM wide
        )
        ORDER BY l_returnflag, metric
    """,
    tags=("A7", "unpivot"),
)
def unpivot_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): a per-flag metrics row becomes one
    (flag, metric, value) row per metric via ``DataFrame.unpivot`` —
    a zero-shuffle generate step (each input row expands in place),
    the inverse reshape of the pivot above and the standard form for
    feature stores and plotting pipelines."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        # exact cents, one division (r17 sf0.1 sweep class: the raw
        # double SUM at 1e9 magnitude is order-sensitive at 6 dp);
        # sum_qty is integral-exact, n_rows a count — no ROUND needed
        # anywhere, the values are true to the data
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("double") / 100
        ).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "n_rows"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "metric")
    )


@register(
    "sample_train_val_test",
    oracle="""
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (
          SELECT n_chars,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        )
        GROUP BY split
    """,
    tags=("L8", "split"),
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment by md5 hex
    range of the document key ('cc' = 204/256 ≈ 80%, 'e6' = 230/256
    ≈ 90%). Lineage-stable: a doc's split never changes as the corpus
    grows (no RNG, no global count), so no eval example ever leaks
    into training across pipeline re-runs — the property random
    splits lose the moment data arrives incrementally. Pure
    expression, pushes down, zero shuffle before the audit agg."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        docs.select(
            "n_chars",
            F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test").alias("split"),
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "sample_class_weights",
    oracle="""
        WITH counts AS (
          SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
        ),
        total AS (SELECT SUM(n) AS t, COUNT(*) AS k FROM counts)
        SELECT c.label, CAST(c.n AS BIGINT) AS n,
               ROUND(CAST(t.t AS DOUBLE) / (t.k * c.n), 6) AS weight
        FROM counts c CROSS JOIN total t
    """,
    tags=("L8", "weights"),
)
def sample_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced'
    convention: total / (n_classes * n_label)) — the rebalancing
    factor a training pipeline joins back onto examples of skewed
    classes. Two tiny aggregates + a broadcast scalar; the weight
    table is classes-sized, so the join back onto 100 TB of examples
    is a broadcast, never a shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("k"))
    return counts.crossJoin(F.broadcast(total)).select(
        "label",
        "n",
        F.round(F.col("t").cast("double") / (F.col("k") * F.col("n")), 6).alias("weight"),
    )


_RESERVOIR_K = 16


@register(
    "sample_reservoir_per_group",
    oracle=f"""
        SELECT event_id, event_type, ROUND(value, 6) AS value
        FROM (
          SELECT event_id, event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                 ) AS rn
          FROM events
        )
        WHERE rn <= {_RESERVOIR_K}
    """,
    tags=("P5", "sampling", "reservoir"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample: exactly 16 uniform rows per
    event_type, selected by ranking each stratum on the md5 of its
    primary key — the deterministic replacement for per-group
    reservoir sampling (same rows every run, any partitioning, any
    engine; classic reservoir RNG state can't promise that). The
    rate-based sampler above keeps a FRACTION per stratum; this keeps
    a COUNT — what eval-set builders and per-class debug dumps need.

    Scale: one hash shuffle on the stratum key; the per-group sort
    ranks by a hash, so no value ordering is materialized and the
    output is bounded at k × |strata| rows regardless of corpus
    size. Skewed strata are one AQE skew-split away, exactly like
    topk_per_group."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select("event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RESERVOIR_K)
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
    )


# 16-bit hash fraction from the first 4 md5 nibbles — engine-portable
_H16_SPARK = (
    "(4096 * (instr('0123456789abcdef', substr(md5(concat('bal|', CAST(vec_id AS STRING))), 1, 1)) - 1)"
    " + 256 * (instr('0123456789abcdef', substr(md5(concat('bal|', CAST(vec_id AS STRING))), 2, 1)) - 1)"
    " + 16 * (instr('0123456789abcdef', substr(md5(concat('bal|', CAST(vec_id AS STRING))), 3, 1)) - 1)"
    " + (instr('0123456789abcdef', substr(md5(concat('bal|', CAST(vec_id AS STRING))), 4, 1)) - 1))"
)
_H16_DUCK = (
    "(4096 * (strpos('0123456789abcdef', substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 1, 1)) - 1)"
    " + 256 * (strpos('0123456789abcdef', substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 2, 1)) - 1)"
    " + 16 * (strpos('0123456789abcdef', substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 3, 1)) - 1)"
    " + (strpos('0123456789abcdef', substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 4, 1)) - 1))"
)


@register(
    "sample_balanced_downsample",
    oracle=f"""
        WITH counts AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label
        ),
        mn AS (SELECT MIN(n) AS n_min FROM counts),
        kept AS (
          SELECT e.label
          FROM embeddings e
          JOIN counts c ON e.label = c.label, mn
          WHERE {_H16_DUCK}
                < CAST(floor(65536.0 * mn.n_min / c.n) AS BIGINT)
        ),
        after AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_after FROM kept GROUP BY label)
        SELECT c.label, c.n AS n_before, COALESCE(a.n_after, 0) AS n_after,
               mn.n_min AS target_n,
               ROUND(CAST(COALESCE(a.n_after, 0) AS DOUBLE) / c.n, 6) AS achieved_ratio
        FROM counts c LEFT JOIN after a ON c.label = a.label, mn
    """,
    tags=("L8", "balance", "downsample"),
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced DOWNSAMPLING — the action that pairs with
    sample_class_weights' reweighting alternative: majority classes
    are thinned toward the minority-class size by a DETERMINISTIC
    per-class hash threshold (keep when the example's 16-bit md5
    fraction < floor(65536·n_min/n_c)), so the sample is reproducible
    row-by-row across runs and engines — no RNG, no sort, no
    per-class limit() (whose row choice is partition-order-dependent
    and unstable at scale). Report: per class, before/after counts,
    the minority target, and the achieved keep ratio.

    Scale: counts are one tiny aggregate; the filter is a narrow map
    against a broadcast classes-sized threshold table; nothing
    shuffles the corpus. Expected |n_after - n_min| is the binomial
    fluctuation of a 16-bit threshold (~√n), the standard price of
    stateless deterministic sampling."""
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("n_min"))
    thr = F.floor(65536.0 * F.col("n_min") / F.col("n")).cast("long")
    kept = (
        emb.join(F.broadcast(counts), "label")
        .crossJoin(F.broadcast(mn))
        .filter(F.expr(_H16_SPARK) < thr)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        counts.join(kept, "label", "left")
        .crossJoin(F.broadcast(mn))
        .select(
            "label",
            F.col("n").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.col("n_min").alias("target_n"),
            F.round(F.coalesce("n_after", F.lit(0)).cast("double") / F.col("n"), 6).alias(
                "achieved_ratio"
            ),
        )
    )


_WRES_K = 5  # weighted sample size per source
# 48-bit hash -> uniform in (0, 1]: u = (h+1)/2^48. The A-ES key
# u^(1/w) is rank-equivalent to ln(u)/w = (ln(h+1) - ln(2^48))/w —
# two ln's of INTEGER arguments (the portable float discipline);
# 2^48 spelled as its integer literal so both engines take ln of
# the same exact int.
_WRES_H_SPARK = "CAST(conv(substr(md5(concat('wres|', CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
_WRES_H_DUCK = " + ".join(
    f"CAST({16 ** (11 - i)} AS BIGINT) * "
    f"(strpos('0123456789abcdef', substr(md5('wres|' || CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    for i in range(12)
)


@register(
    "sample_weighted_reservoir",
    oracle=f"""
        WITH d AS (
          SELECT source, doc_id,
                 len(string_split(text, ' ')) AS w,
                 {_WRES_H_DUCK} AS h
          FROM documents
        ),
        keyed AS (
          SELECT source, doc_id, w,
                 ROUND((ln(h + 1) - ln(281474976710656)) / w, 6) AS skey
          FROM d
        )
        SELECT source, doc_id, CAST(w AS BIGINT) AS n_tokens, skey
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY source ORDER BY skey DESC, doc_id
                 ) AS rn
          FROM keyed
        )
        WHERE rn <= {_WRES_K}
    """,
    tags=("P5", "L8", "sampling", "weighted", "reservoir"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, {_WRES_K} docs per
    source, weight = token count — the Efraimidis–Spirakis A-ES
    scheme (IPL 2006, public method): each item draws a uniform u
    and is ranked by ``u^(1/w)``; the top-k by that key are EXACTLY
    a weighted sample without replacement. The training-data use is
    sampling documents proportional to length/quality without a
    second pass or RNG state.

    Determinism discipline (the ``sample_reservoir_per_group``
    contract, extended to weights): u comes from a 48-bit md5 of the
    salted primary key, so the same rows win every run, on any
    partitioning, in any engine. The key is compared as
    ``ln(u)/w = (ln(h+1) − ln(2^48))/w`` — monotone in ``u^(1/w)``,
    two ``ln``s of integer arguments, one division by the integer
    weight — rounded to 6 dp BEFORE ranking with doc_id tiebreak
    (round-before-argmax, the portable-float tie discipline; the
    rounding coarsens keys by <1e-6, and any such tie resolves the
    same way in both engines).

    Scale: one hash shuffle on source; the rank window function
    stands alone on its spec, so Spark plans WindowGroupLimit — the
    map-side partial top-k keeps per-task state at k rows per
    stratum (audit-enforced); output bounded at k × |sources|."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("w"),
        F.expr(_WRES_H_SPARK).alias("h"),
    ).select(
        "source",
        "doc_id",
        "w",
        F.round(
            (F.log(F.col("h") + 1) - F.log(F.lit(281474976710656))) / F.col("w"), 6
        ).alias("skey"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("skey"), F.asc("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _WRES_K)
        .select("source", "doc_id", F.col("w").cast("long").alias("n_tokens"), "skey")
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
