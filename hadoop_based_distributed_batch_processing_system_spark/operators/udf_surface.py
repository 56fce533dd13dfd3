"""User-defined compute surface (SURVEY.md §2.10, X1-X5).

The Mapper/Reducer API is the reference class's ENTIRE extensibility
surface (public MapReduce contract). The Spark mapping:

- Mapper  → vectorized ``pandas_udf`` scalar / ``mapInPandas`` (X1)
- Reducer → ``applyInPandas`` grouped map / GROUPED_AGG UDAF (X2, X3')
- Combiner → automatic partial aggregation; NO user surface needed
- flatMap/UDTF → ``mapInPandas`` emitting >1 row per input (X4)
- Partitioner → ``repartition(n, key)`` / ``repartitionByRange`` (X5)

Scale notes: every UDF here crosses Python↔JVM via Arrow batches —
the only operators in the engine that move data out of the JVM.
Row-at-a-time ``F.udf`` is banned in this codebase (10-100× slower;
SURVEY §2.11 discipline). Each oracle re-expresses the UDF logic in
SQL, proving the Python path computes exactly what the declarative
path would — the differential test that matters for custom code.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "udf_mapper_vectorized",
    oracle="""
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(n_chars * 2 AS DOUBLE) AS chars_x2
        FROM documents
    """,
    tags=("X1",),
)
def udf_mapper_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — the Mapper: record → record, as an Arrow-vectorized
    scalar pandas UDF (one Python call per batch, not per row)."""

    @pandas_udf("int")
    def n_tokens(text: pd.Series) -> pd.Series:
        return (text.str.count(" ") + 1).astype("int32")

    @pandas_udf("double")
    def double_it(x: pd.Series) -> pd.Series:
        return x * 2.0

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        n_tokens("text").alias("n_tokens"),
        double_it(F.col("n_chars").cast("double")).alias("chars_x2"),
    )


@register(
    "udf_reducer_grouped",
    oracle="""
        SELECT l_returnflag,
               SUM(l_quantity)      AS sum_qty,
               AVG(l_extendedprice) AS avg_price,
               COUNT(*)             AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("X2",),
)
def udf_reducer_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — the Reducer: (key, all values) → records, as
    ``applyInPandas``: each group arrives as one pandas DataFrame.
    Spark shuffles on the key exactly like the MR framework would.
    (For big skewed groups prefer GROUPED_AGG or native aggs — a
    whole group must fit in one task's memory here.)"""

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "sum_qty": [pdf["l_quantity"].sum()],
                "avg_price": [pdf["l_extendedprice"].mean()],
                "n": [len(pdf)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        reduce_group, "l_returnflag string, sum_qty double, avg_price double, n long"
    )


@register(
    "udf_grouped_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_extendedprice * l_quantity) / SUM(l_quantity) AS wavg_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("X2",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2' — custom UDAF as a GROUPED_AGG pandas UDF: quantity-
    weighted average price. Unlike applyInPandas this composes inside
    a normal ``agg()`` with other aggregates and gets partial-merge
    treatment per batch."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wavg("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@register(
    "udf_flatmap",
    oracle="""
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE lang = 'en'
    """,
    tags=("X4",),
)
def udf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — flatMap/UDTF: one input row → many output rows via
    ``mapInPandas`` (iterator of batches in, iterator of batches
    out — constant memory regardless of partition size)."""

    def explode_tokens(batches):
        for pdf in batches:
            tokens = pdf["text"].str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(tokens.str.len()),
                    "token": [t for toks in tokens for t in toks],
                }
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en").select("doc_id", "text")
    return docs.mapInPandas(explode_tokens, "doc_id long, token string")


@register(
    "partitioner_hash",
    # The bucket census IS hash-checkable: md5 is the same function in
    # every engine, unlike Spark's shuffle murmur3. Physical placement
    # (each bucket lands in exactly one partition) stays pytest-pinned
    # via spark_partition_id — it is not SQL-visible by nature.
    oracle="""
        SELECT substring(md5(CAST(user_id AS VARCHAR)), 1, 1) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("X5",),
)
def partitioner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5a — the Partitioner: hash-route rows by a PORTABLE key
    (first hex char of md5(user_id) → 16 buckets), the engine-neutral
    analogue of the MR hash partitioner. ``repartition(8, bucket)``
    performs the actual physical routing (same-bucket rows always
    co-located — the invariant test asserts one partition per bucket
    and no row lost); the returned per-bucket histogram is computed
    on the routed frame and hash-checked against DuckDB running the
    identical md5 arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.withColumn("bucket", F.substring(F.md5(F.col("user_id").cast("string")), 1, 1))
    routed = bucketed.repartition(8, "bucket")
    return (
        routed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("bucket")
    )


@register(
    "partitioner_range",
    # Spark's repartitionByRange draws its boundaries from reservoir
    # sampling — engine-specific, so per-PARTITION counts can never
    # hash-match another engine. The oracle-checked census therefore
    # uses the portable exact equal-height split (NTILE over the total
    # order); the sampled physical partitioner itself is exercised in
    # the same plan and its span-disjointness is pytest-pinned.
    oracle="""
        WITH ranked AS (
          SELECT ts, CAST(NTILE(8) OVER (ORDER BY ts, event_id) AS BIGINT) AS bucket
          FROM events
        )
        SELECT bucket, MIN(ts) AS min_ts, MAX(ts) AS max_ts,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM ranked GROUP BY bucket ORDER BY bucket
    """,
    tags=("X5",),
)
def partitioner_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5b — range partitioner (``repartitionByRange`` = MR
    TotalOrderPartitioner): contiguous ts ranges per partition.
    The plan routes through the real sampled range partitioner, then
    computes the portable equal-height census (NTILE(8) over the
    total order, deterministic (ts, event_id) tiebreak) that DuckDB
    can replicate exactly.

    NTILE here is DERIVED from ``bucketed_rank_cumsum``'s two-phase
    global row number — NO single-partition window anywhere in the
    plan (the round-6 lesson: a bare ``NTILE(k) OVER (ORDER BY ts)``
    funnels the whole events table through one task; this input grows
    with the corpus, so unlike the calendar-bounded rollup windows it
    MUST use the bucketed recipe). With n total rows, k tiles,
    q = n div k, r = n mod k, NTILE's exact assignment for global row
    number rn is: the first r tiles take q+1 rows, the rest take q —
    a closed-form projection of (rn, n), bit-identical to the window
    function in both engines."""
    from .sorts import bucketed_rank_cumsum

    ev = load_table(spark, sf_dir, "events")
    routed = ev.repartitionByRange(8, "ts", "event_id")
    with_us = routed.withColumn("__ts_us", F.unix_micros(F.col("ts")))
    ranked, n_total, _ = bucketed_rank_cumsum(with_us, "__ts_us", ["event_id"])
    k = 8
    q, r = divmod(int(n_total), k)
    head = r * (q + 1)  # rows covered by the first r (fat) tiles
    rn = F.col("__rn")
    if q == 0:  # fewer rows than tiles: rn IS the tile
        bucket = rn
    else:
        # integer `div`, not double division + cast: keeps the whole
        # tile assignment in BIGINT math like the Holt/credit recipes
        # (a double quotient loses integer precision past 2^53 rows)
        bucket = (
            F.when(rn <= head, F.expr(f"(__rn - 1) div {q + 1}") + 1)
            .otherwise(F.lit(r) + F.expr(f"(__rn - 1 - {head}) div {q}") + 1)
        )
    return (
        ranked.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("bucket")
    )


@register(
    "udtf_tokenize_lateral",
    oracle="""
        SELECT d.doc_id, t.token, t.pos
        FROM (SELECT doc_id, text FROM documents WHERE lang = 'de') d,
             LATERAL (
               SELECT unnest(string_split(d.text, ' ')) AS token,
                      CAST(unnest(generate_series(0, len(string_split(d.text, ' ')) - 1)) AS INTEGER) AS pos
             ) t
    """,
    tags=("X4", "udtf"),
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4' — a REAL Python UDTF (Spark 4 ``@udtf``): one input row →
    many output rows with per-row Python state, consumed via LATERAL
    join in SQL. This is the table-function half of the Mapper
    contract (``explode``/``mapInPandas`` cover the common cases;
    a UDTF adds arbitrary generator logic + the SQL surface).
    ``useArrow=True`` plans it as ArrowEvalPythonUDTF — rows still
    cross one at a time through ``eval`` (inherent to the UDTF
    contract), but transport is Arrow-batched, keeping the fleet-wide
    no-BatchEvalPython plan audit clean. Shown on the small 'de'
    slice."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield t, i

    spark.udtf.register("hbdbps_tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("hbdbps_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM (SELECT doc_id, text FROM hbdbps_docs_udtf WHERE lang = 'de') d,
             LATERAL hbdbps_tokenize_udtf(d.text) t
        """
    )


@register(
    "counters_job_audit",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_seen,
               CAST(COUNT(*) FILTER (WHERE json_extract(props, '$.k') IS NOT NULL) AS BIGINT) AS n_valid_props,
               CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS n_negative_value
        FROM events
    """,
    tags=("X6", "counters"),
)
def counters_job_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — the Hadoop COUNTERS surface: user code increments named
    counters while a job runs; the framework merges them and hands
    totals to the driver. Spark's equivalent is accumulators — here
    a vectorized ``mapInPandas`` audit pass counts rows seen, rows
    with parseable JSON props, and negative values, each into its
    own LongAccumulator, merged task→driver exactly like MR counter
    aggregation (and, like MR counters, only trustworthy from ACTIONS
    on non-retried stages — this runs one deliberate pass). The
    totals come back as a 1-row DataFrame; the oracle recomputes the
    same counts declaratively, proving the side-channel exact.

    The JSON-validity predicate is evaluated JVM-side
    (``get_json_object``) before the pandas pass, so the accumulator
    updates are whole-column sums — no per-row Python loop."""
    import pandas as pd

    sc = spark.sparkContext
    n_seen = sc.accumulator(0)
    n_valid = sc.accumulator(0)
    n_neg = sc.accumulator(0)

    ev = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"), "value"
    )

    def audit(batches):
        for pdf in batches:
            n_seen.add(len(pdf))
            n_valid.add(int(pdf["has_k"].sum()))
            n_neg.add(int((pdf["value"] < 0).sum()))
            yield pd.DataFrame({"ok": [True]})

    ev.mapInPandas(audit, "ok boolean").count()  # the action that runs the counters
    return spark.createDataFrame(
        [(n_seen.value, n_valid.value, n_neg.value)],
        "n_seen long, n_valid_props long, n_negative_value long",
    )


_LANG_NAMES = {
    "en": "English",
    "de": "German",
    "fr": "French",
    "es": "Spanish",
}


@register(
    "udf_broadcast_dictionary",
    oracle="""
        SELECT CASE lang
                 WHEN 'en' THEN 'English'
                 WHEN 'de' THEN 'German'
                 WHEN 'fr' THEN 'French'
                 WHEN 'es' THEN 'Spanish'
                 ELSE 'Unknown'
               END AS lang_name,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang_name
    """,
    tags=("X1", "X7", "broadcast"),
)
def udf_broadcast_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — the Hadoop DistributedCache pattern: a side dictionary
    shipped once per executor (``sc.broadcast``), consulted inside a
    vectorized mapper instead of joined. Right shape when the lookup
    is a small in-memory dict and the semantics are richer than an
    equi-join (defaults, normalization, code). The pandas UDF does a
    whole-column ``Series.map`` against ``bc.value`` — one Arrow
    batch per task, no per-row Python. The oracle re-expresses the
    same lookup as a CASE, proving broadcast-lookup ≡ declarative
    mapping."""
    bc = spark.sparkContext.broadcast(_LANG_NAMES)

    @pandas_udf("string")
    def lang_name(s: pd.Series) -> pd.Series:
        return s.map(bc.value).fillna("Unknown")

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(lang_name(F.col("lang")).alias("lang_name"))
        .groupBy("lang_name")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "udf_mapper_arrow",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
        FROM lineitem
        WHERE l_quantity >= 45
    """,
    tags=("X1", "arrow"),
)
def udf_mapper_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1' — the Mapper surface at the lowest Python overhead:
    ``mapInArrow`` hands each task raw ``pyarrow.RecordBatch``es (no
    pandas conversion at all) and streams batches back. Right level
    when the per-batch work is itself Arrow-native (compute kernels,
    flight puts, tokenizers with Arrow bindings). Here: filter +
    charge computation via pyarrow.compute — zero-copy in, one
    allocation out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge_batches(batches):
        for batch in batches:
            mask = pc.greater_equal(batch.column("l_quantity"), pa.scalar(45.0))
            kept = batch.filter(mask)
            price = kept.column("l_extendedprice")
            charge = pc.multiply(
                pc.multiply(price, pc.subtract(pa.scalar(1.0), kept.column("l_discount"))),
                pc.add(pa.scalar(1.0), kept.column("l_tax")),
            )
            yield pa.RecordBatch.from_arrays(
                [kept.column("l_orderkey"), kept.column("l_linenumber"), pc.round(charge, 6)],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    return li.mapInArrow(
        charge_batches, "l_orderkey long, l_linenumber int, charge double"
    )


@register(
    "observe_query_metrics",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice), 4) AS revenue
        FROM lineitem
        WHERE l_quantity >= 25
        GROUP BY l_returnflag
    """,
    tags=("X6", "observe"),
)
def observe_query_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6' — the modern MR-counters: ``df.observe`` attaches named
    aggregate metrics (rows seen, rows matching a predicate) to a
    query's OWN execution — collected as a side effect of the action,
    no second pass, no accumulator plumbing. The data-quality hook at
    scale: every production job observes its input/kept/dropped
    counts for free. The observed metrics are driver-side metadata;
    the returned DataFrame (and its oracle) is the main result."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("rows_kept"),
    )
    return (
        observed.filter(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
    )


_MG_CAPACITY = 64  # summary slots per partition
_MG_TOPK = 10


@register("topk_heavy_hitters_mg", tags=("A4", "O2", "sketch"))  # rows-only: approximate by design
def topk_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k heavy hitters via per-partition Misra-Gries
    summaries — the one-pass answer to "which user_ids dominate this
    100 TB event log" WITHOUT shuffling on the (possibly billions-
    cardinality) key:

    1. each partition folds its rows into a 64-slot Misra-Gries
       summary (mapInPandas over Arrow batches; counts decremented
       when the summary overflows — the classic streaming bound);
    2. only #partitions × 64 candidate rows shuffle (key-agnostic,
       tiny), merged by a hash agg;
    3. merged estimates are under-counts with error <= n/capacity per
       partition, so any key with true frequency > n/64 is guaranteed
       present (pytest pins this superset property plus exact
       agreement on the test corpus).

    The exact equivalent (groupBy(user).count().orderBy.limit) ships
    every distinct key through a shuffle; this ships a constant."""

    def mg_partition(batches):
        counts: dict[int, int] = {}
        for pdf in batches:
            for uid in pdf["user_id"].to_numpy():
                uid = int(uid)
                if uid in counts:
                    counts[uid] += 1
                elif len(counts) < _MG_CAPACITY:
                    counts[uid] = 1
                else:
                    dead = []
                    for k in counts:
                        counts[k] -= 1
                        if counts[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counts[k]
        yield pd.DataFrame(
            {"user_id": list(counts.keys()), "est_count": list(counts.values())}
        )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    summaries = ev.mapInPandas(mg_partition, "user_id long, est_count long")
    return (
        summaries.groupBy("user_id")
        .agg(F.sum("est_count").alias("est_count"))
        .orderBy(F.desc("est_count"), "user_id")
        .limit(_MG_TOPK)
    )


@register(
    "udtf_polymorphic_analyze",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    tags=("X4''", "udtf", "polymorphic"),
)
def udtf_polymorphic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4'' — POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the
    output schema is not declared statically but computed at plan
    time from the call's constant argument — here a comma-separated
    key list that becomes one output column per requested JSON key.
    This is the official extension point for schema-producing table
    functions (CSV/JSON flatteners, pivot-like spreads) where the
    shape depends on parameters; the static-returnType variant is
    udtf_tokenize_lateral. eval() stays a generator; the registered
    call extracts key 'k' from events.props, and the oracle checks
    the values against DuckDB's native json_extract.

    Scale: per-row Python is inherent to the UDTF contract (this is
    the API-surface demo; bulk JSON extraction uses the JVM
    get_json_object path of fn_json). Serialization is pickle by
    MEASUREMENT (r17): Spark 4.1's Arrow UDTF path was 8× slower on
    this row shape, and the plan audit treats UDTF nodes as their own
    kind — per-row under either spelling — so the choice is free."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField, StructType

    try:
        from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    except ImportError:  # pragma: no cover - API location fallback
        from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult  # type: ignore

    # r17 (guide §1 measure-first): useArrow=True was 8× SLOWER here —
    # measured 12.6 s vs 1.5 s pickle, A/B'd twice back-to-back at
    # sf0.1 — Spark 4.1's Arrow UDTF serializer pays a per-row batch
    # construction that dwarfs pickle for this 1-column row shape
    # (the guide's own caveat: useArrow on a UDTF only changes
    # serialization, eval stays per-row either way). Values are
    # integers/None, so the pickle path's type coercion is exact.
    @udtf(useArrow=False)
    class ParseKeys:
        @staticmethod
        def analyze(props: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
            names = [k.strip() for k in str(keys.value).split(",")]
            return AnalyzeResult(
                schema=StructType([StructField(n, LongType()) for n in names])
            )

        def __init__(self):
            # eval() runs per row by UDTF contract (guide §4.1); keep
            # the per-row body minimal — the key list is a plan-time
            # constant, so split it once per instance, not per row
            # (r17: measured ~2.2x on the 100k-row corpus together
            # with the single-lookup rewrite below)
            self._keys_src = None
            self._keys: list[str] = []
            self._loads = __import__("json").loads

        def eval(self, props, keys):
            if keys != self._keys_src:
                self._keys_src = keys
                self._keys = [k for k in str(keys).split(",")]
            try:
                d = self._loads(props) if props else {}
            except ValueError:
                d = {}
            out = []
            for k in self._keys:
                v = d.get(k)
                out.append(int(v) if isinstance(v, (int, float)) else None)
            yield tuple(out)

    spark.udtf.register("hbdbps_parse_keys_udtf", ParseKeys)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("hbdbps_events_udtf")
    return spark.sql(
        """
        SELECT e.event_id, t.k
        FROM hbdbps_events_udtf e,
             LATERAL hbdbps_parse_keys_udtf(e.props, 'k') t
        """
    )
