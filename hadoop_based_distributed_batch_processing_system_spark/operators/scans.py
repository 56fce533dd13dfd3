"""Scan / source / sink operators (SURVEY.md §2.1, S1-S4).

Reference-class parity: HDFS ``FileInputFormat`` full scans (S1),
map-side projection (S2), ``TextInputFormat`` line reads (S3),
``OutputFormat`` part-file writes (S4) — all public Hadoop API
surface (the reference tree itself was empty; SURVEY.md §0).

Scale notes: S1/S2 ride Spark's vectorized parquet reader; column
pruning in S2 reaches the scan (``ReadSchema`` shows only the
projected columns — asserted in tests/test_plans.py). At 100 TB the
same code reads a multi-file table directory with
``maxPartitionBytes``-sized splits; nothing here is single-file.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import corpus_tag, load_table, sink_parquet


@register(
    "scan_parquet",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("S1",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — full-table parquet scan, all columns."""
    return load_table(spark, sf_dir, "nation")


@register(
    "scan_projected",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    tags=("S2",),
)
def scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — column-pruned scan: the projection is pushed into the
    parquet reader (ReadSchema contains only these two columns)."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


def _text_export_dir(sf_dir: str) -> str:
    tag = corpus_tag(sf_dir)
    return os.path.join(tempfile.gettempdir(), f"hbdbps_text_export_{tag}")


@register(
    "scan_text_lines",
    # corpus text is newline-free (verified), so lines == documents and
    # the text roundtrip IS oracle-expressible (order-insensitive hash)
    oracle="SELECT text AS value, CAST(length(text) AS INTEGER) AS line_len FROM documents",
    tags=("S3",),
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — line-oriented text read (the TextInputFormat equivalent).

    Exports ``documents.text`` to newline-delimited text once, then
    reads it back with ``spark.read.text`` — one row per line, column
    ``value`` — and computes per-line lengths. Rows-only check: the
    text roundtrip is not expressible against the parquet oracle.
    """
    out = _text_export_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        # newline-free corpus text → one doc per line
        docs.select("text").coalesce(4).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.select(
        F.col("value"),
        F.length("value").alias("line_len"),
    )


@register(
    "sink_parquet_roundtrip",
    # the re-read frame must equal the aggregate that was written — the
    # oracle recomputes it from the source table, proving the
    # partitioned write+read cycle lossless value-by-value
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("S4",),
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — partitioned parquet sink + re-read.

    Writes a per-(returnflag, linestatus) aggregate partitioned by
    ``l_returnflag`` (hive-style directories — the layout that enables
    partition pruning on re-read at scale), reads it back, and returns
    the re-read frame. The pytest asserts the roundtrip is lossless.
    """
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_sink_parquet_{tag}")
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )
    sink_parquet(agg, out, partition_by=["l_returnflag"])
    back = spark.read.parquet(out)
    return back.select("l_returnflag", "l_linestatus", "n", "sum_qty")


@register(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("S3", "csv"),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3' — CSV source: export nation once to header'd CSV
    part-files, read it back with an EXPLICIT schema (never
    inferSchema at scale — it triggers a full extra pass). The oracle
    is the parquet table itself, proving the text roundtrip lossless.
    """
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_csv_{corpus_tag(sf_dir)}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        load_table(spark, sf_dir, "nation").write.mode("overwrite").option("header", "true").csv(out)
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", "true"
    ).csv(out)


@register(
    "scan_json",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    tags=("S3", "json"),
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3'' — JSON-lines source: export customer once to NDJSON,
    read back with an explicit schema. Doubles survive because both
    writer and reader use round-trip float representations. NDJSON is
    splittable line-wise, so at 100 TB this parallelizes like any
    text input — but parquet stays the engine's preferred format
    (columnar pruning, pushdown, 5-10× smaller)."""
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_json_{corpus_tag(sf_dir)}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        load_table(spark, sf_dir, "customer").write.mode("overwrite").json(out)
    return spark.read.schema(
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).json(out).select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@register(
    "scan_orc",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 6) AS s_acctbal
        FROM supplier
    """,
    tags=("S3", "orc"),
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3''' — ORC source/sink roundtrip: export supplier once to
    ORC (Spark's second native columnar format — same vectorized
    reader, predicate pushdown, and split planning as parquet), read
    it back with an explicit schema. Oracle is the parquet original:
    the columnar re-encode is lossless. In a 100 TB estate this is
    the interop path for Hive-era ORC warehouses."""
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_orc_{corpus_tag(sf_dir)}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return (
        spark.read.schema("s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
        .orc(out)
        .select("s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 6).alias("s_acctbal"))
    )


@register(
    "compact_small_files",
    # Hash oracle: the compacted re-read must reproduce the source
    # row count + an exact int64 content checksum, AND the file
    # counts 64→4 are data (computed by listing the sink dirs), so a
    # layout change breaks the hash too. sum(event_id) is an exact
    # integer fold — order-independent across engines.
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
               64 AS files_before, 4 AS files_after
        FROM events
    """,
    tags=("S4", "compaction"),
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4'' — small-file compaction: the standing maintenance job of
    any 100 TB estate (streaming sinks and partitioned writes breed
    kB-sized part-files; each costs a task + an open at read time).
    Simulates the problem (events fragmented into 64 part-files),
    then compacts by rewriting through ``coalesce(4)`` — a NARROW
    dependency: files are concatenated partition-wise with no
    shuffle, unlike ``repartition`` which would pay one. Returns
    row count + exact content checksum from the COMPACTED re-read
    plus measured before/after file counts — all four hash-checked
    (the oracle recomputes content from the source and pins the
    64→4 layout)."""
    tag = corpus_tag(sf_dir)
    frag = os.path.join(tempfile.gettempdir(), f"hbdbps_frag_{tag}")
    compacted = os.path.join(tempfile.gettempdir(), f"hbdbps_compacted_{tag}")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        ev.repartition(64).write.mode("overwrite").parquet(frag)
    small = spark.read.parquet(frag)
    small.coalesce(4).write.mode("overwrite").parquet(compacted)

    def _nfiles(d: str) -> int:
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_event_id"),
        F.lit(_nfiles(frag)).cast("int").alias("files_before"),
        F.lit(_nfiles(compacted)).cast("int").alias("files_after"),
    )


@register(
    "sink_partition_pruned",
    # Hash oracle: the pruned re-read must equal the same aggregate
    # computed directly on the source table. The pruning itself (a
    # PartitionFilter, other types' directories never opened) is a
    # plan property, asserted in tests/test_plans.py.
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 6) AS sum_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY event_type
    """,
    tags=("S4", "pruning"),
)
def sink_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4' — hive-partitioned sink + pruned re-read: events written
    ``partitionBy(event_type)``, then read back filtered to one type.
    The filter becomes a PartitionFilter (directory pruning — the
    other four types' files are never opened), the 100 TB layout for
    any re-read keyed by a low-cardinality column. Plan-asserted in
    tests/test_plans.py; the re-read aggregate hash-matches the same
    aggregate computed straight from the source table."""
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_sink_part_{tag}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        sink_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


@register(
    "scan_schema_evolution",
    oracle="""
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders
        WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderkey % 2 = 1
    """,
    tags=("S1", "schema-evolution"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across batches: batch 1 was written BEFORE a
    column existed (2 columns), batch 2 after (3 columns). Reading
    the directory with ``mergeSchema=true`` unions the footers into
    the widest schema and null-fills the missing column — the
    standard additive-evolution path for long-lived parquet datasets
    (no rewrite of old files; at 100 TB you never backfill). The
    oracle reconstructs the same frame with an explicit NULL-padded
    UNION ALL."""
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_schema_evo_{tag}")
    orders = load_table(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(out, "_SUCCESS_BOTH")):
        orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
        orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
        open(os.path.join(out, "_SUCCESS_BOTH"), "w").close()
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "batch=1"), os.path.join(out, "batch=2")
    )
    return merged.select("o_orderkey", "o_totalprice", "o_orderpriority")


CODEC_MATRIX = ("snappy", "gzip", "zstd", "uncompressed")


def codec_sink_dir(sf_dir: str, codec: str) -> str:
    """On-disk location of one codec's sink output (content-tagged so
    a regenerated corpus never serves stale files). Exposed so the
    size-ordering invariant test can audit bytes without re-running
    the writes."""
    return os.path.join(tempfile.gettempdir(), f"hbdbps_codec_{codec}_{corpus_tag(sf_dir)}")


@register(
    "sink_compression_codecs",
    # Hash oracle: each codec's RE-READ must reproduce the recomputed
    # aggregate totals. Totals use COUNT and SUM(l_quantity) — sums of
    # integral doubles are exact in any summation order, so the values
    # are bit-identical across engines (unlike l_extendedprice sums).
    # On-disk byte sizes are writer-version-specific and stay in the
    # pytest invariant (uncompressed >= every codec), not the oracle.
    oracle="""
        WITH g AS (
          SELECT l_returnflag, l_linestatus, l_shipdate,
                 CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY 1, 2, 3
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(n) AS BIGINT) AS total_n,
                 SUM(sum_qty) AS total_qty
          FROM g
        )
        SELECT c.codec, s.n_rows, s.total_n, s.total_qty
        FROM (VALUES ('gzip'), ('snappy'), ('uncompressed'), ('zstd')) AS c(codec)
        CROSS JOIN s ORDER BY c.codec
    """,
    tags=("S4", "codec"),
)
def sink_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec matrix for the parquet sink: the same aggregate written
    with snappy / gzip / zstd / uncompressed, each RE-READ and
    summarized — the returned per-codec totals hash-match the oracle
    recomputing them from the source table, proving every codec's
    write+read cycle lossless. Codec choice is a pure storage/CPU
    trade (zstd ~ gzip ratio at snappy-class decode speed) — at
    100 TB the scan is usually IO-bound, so the codec IS the scan
    speed. Size ordering is pytest-pinned via :func:`codec_sink_dir`."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus", "l_shipdate")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )
    per_codec = []
    for codec in CODEC_MATRIX:
        out = codec_sink_dir(sf_dir, codec)
        agg.write.mode("overwrite").option("compression", codec).parquet(out)
        back = spark.read.parquet(out).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n").alias("total_n"),
            F.sum("sum_qty").alias("total_qty"),
        )
        per_codec.append(back.select(F.lit(codec).alias("codec"), "n_rows", "total_n", "total_qty"))
    out_df = per_codec[0]
    for nxt in per_codec[1:]:
        out_df = out_df.unionByName(nxt)
    return out_df.orderBy("codec")


@register(
    "join_dynamic_partition_pruning",
    oracle="""
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(e.value), 6) AS sum_value
        FROM events e
        JOIN (SELECT DISTINCT event_type FROM events WHERE event_type LIKE 'p%') d
          ON e.event_type = d.event_type
        GROUP BY e.event_type
    """,
    tags=("J2", "pruning", "dpp"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a hive-partitioned
    table (partitioned by event_type) joined to a dimension whose
    filter is only known at runtime — Spark inserts a dynamic pruning
    subquery into the fact scan, so only the partitions matching the
    dim's surviving keys are ever listed/opened. THE mechanism that
    makes star-schema joins against a date/type-partitioned 100 TB
    fact read 1% of the data instead of 100%. Plan-asserted
    (dynamicpruningexpression on the scan); reuses the
    sink_partition_pruned dataset as the partitioned fact."""
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_sink_part_{tag}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        sink_parquet(ev, out, partition_by=["event_type"])
    fact = spark.read.parquet(out)
    dim = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").like("p%"))
        .select("event_type")
        .distinct()
        .withColumnRenamed("event_type", "d_type")
    )
    return (
        fact.join(dim, fact.event_type == dim.d_type)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


_PYDS_ROWS = 10_000


@register(
    "scan_python_datasource",
    oracle=f"""
        SELECT g AS event_id,
               CAST(g % 10 AS INTEGER) AS bucket,
               ROUND(sqrt(g + 1.0), 6) AS value
        FROM generate_series(0, {_PYDS_ROWS - 1}) t(g)
    """,
    tags=("S8", "custom-source"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — custom Python Data Source (Spark 4 ``pyspark.sql.
    datasource``): the InputFormat-style extensibility surface. A
    pure-Python source declares schema + partition planning + per-
    partition readers; the scan parallelizes one task per
    ``InputPartition`` with Arrow-batched row transfer, and composes
    under Catalyst like any relation. The demo source's cells are
    closed-form functions of event_id, so the entire custom-source
    path is hash-checked against a DuckDB generate_series oracle
    (10k rows over 8 partitions). ``sf_dir`` is unused — the source
    is the data."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.pyds import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", str(_PYDS_ROWS))
        .option("partitions", "8")
        .load()
    )


@register(
    "sink_python_datasource",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("S8''", "custom-sink"),
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8'' — custom PYTHON SINK (Spark 4 ``DataSourceWriter``), the
    OutputFormat half of the extensibility pair: each task writes a
    private temp file and returns a commit message; the driver-side
    ``commit`` runs only after ALL tasks succeed, atomically renaming
    temps into place and dropping ``_SUCCESS`` — a failed/speculative
    task can never leave a partial file visible (FileOutputCommitter's
    contract, in pure Python). Verified end-to-end: a deterministic
    orders projection goes out through the sink, comes back via
    ``spark.read.json``, and must hash-equal the direct SQL oracle."""
    import os
    import shutil
    import tempfile

    from hadoop_based_distributed_batch_processing_system_spark.sources.pyds import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_pysink_{tag}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        shutil.rmtree(out, ignore_errors=True)
        (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 100 == 0)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.format("jsonl_sink")
            .option("path", out)
            .mode("append")
            .save()
        )
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    return back.select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "scan_json_corrupt_records",
    # Corruption is deterministic (every event_id % 97 == 0 line is
    # mangled), so the oracle derives the same report straight from
    # the source table: good rows aggregate per type, corrupt rows
    # collapse into one null-sum bucket.
    oracle="""
        SELECT event_type AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(value), 6) AS sum_value
        FROM events WHERE event_id % 97 <> 0
        GROUP BY event_type
        UNION ALL
        SELECT '__corrupt__', CAST(COUNT(*) AS BIGINT), NULL
        FROM events WHERE event_id % 97 = 0
    """,
    tags=("S3''", "json", "quality"),
)
def scan_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerant JSONL ingestion — the production
    reality of log pipelines: a JSONL batch where ~1% of lines are
    mangled is read under PERMISSIVE mode with a ``_corrupt_record``
    column, good rows aggregate per type, and broken lines are
    COUNTED (never silently dropped — the corrupt bucket is the
    data-quality signal that pages someone). FAILFAST/DROPMALFORMED
    are the same reader one option away.

    The staged file derives from events distributedly (to_json per
    row, every 97th key mangled before a text write), so both
    engines know exactly which lines are bad and the report is
    hash-oracled including the corrupt bucket.

    Scale: text write + schema-declared JSON scan are both
    splittable and linear; the aggregate is the usual map-side
    partial shape. Declaring the schema up front (never inferSchema)
    is what keeps a 100 TB JSON scan one-pass."""
    tag = corpus_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"hbdbps_jsonl_corrupt_{tag}")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    lines = ev.select(
        F.when(
            F.col("event_id") % 97 == 0,
            F.concat(F.lit("{corrupt!"), F.to_json(F.struct("event_id", "event_type", "value"))),
        )
        .otherwise(F.to_json(F.struct("event_id", "event_type", "value")))
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    schema = (
        "event_id long, event_type string, value double, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        back.select(
            F.when(F.col("_corrupt_record").isNotNull(), "__corrupt__")
            .otherwise(F.col("event_type"))
            .alias("bucket"),
            F.when(F.col("_corrupt_record").isNull(), F.col("value")).alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("v"), 6).alias("sum_value"),
        )
    )


# ---- minimal copy-on-write table format (commit log + snapshots) ----

_TLOG_RELATION_MEMO: dict = {}

_TLOG_VERSIONS = (
    # version -> live o_orderkey % 4 residues after replaying the log:
    # v0 adds A(%4=0) + B(%4=1); v1 adds C(%4=2); v2 removes B and
    # adds D(%4 IN (1,3)) — a compaction-style rewrite.
    (0, (0, 1)),
    (1, (0, 1, 2)),
    (2, (0, 1, 2, 3)),
)


@register(
    "table_log_time_travel",
    # Hash oracle: every snapshot's content is a pure function of the
    # deterministic file slices the log adds/removes, so DuckDB
    # recomputes each version straight from `orders` by residue set.
    # All aggregates are exact integers (cents via ROUND*100) —
    # order-independent across file groupings and engines.
    oracle="""
        SELECT v.version,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM (VALUES (0), (1), (2)) v(version)
        JOIN orders o
          ON (v.version = 0 AND o.o_orderkey % 4 IN (0, 1))
          OR (v.version = 1 AND o.o_orderkey % 4 IN (0, 1, 2))
          OR (v.version = 2)
        GROUP BY v.version
    """,
    tags=("S9", "lakehouse", "snapshot", "time-travel"),
)
def table_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — a MINIMAL copy-on-write table format, the Delta/Iceberg
    mechanism stripped to its core: data lives in immutable parquet
    files; a JSON COMMIT LOG (one file per version) records which
    files each commit adds and removes; a reader resolves any
    version's live file set by replaying the log up to that version
    and reads exactly those files. Three commits are synthesized over
    deterministic ``orders`` slices — append, append, and a
    compaction-style rewrite (remove one file, add a file covering a
    superset) — then ALL THREE snapshots are read back (time travel)
    and fingerprinted with exact-integer aggregates, hash-checked
    against recomputing each version straight from the source table.

    Scale: this is the metadata/data split that makes lakehouse
    tables work at 100 TB — the log is versions-sized (driver-bounded
    by design; real formats add checkpoint files when logs grow),
    resolution is a pure driver computation, and the data plane is
    ordinary parquet scans of ONLY the live files: time travel costs
    metadata, never a table copy. Readers never list directories
    (object-store listing is both slow and eventually consistent) —
    the log IS the source of truth, which is also what makes commits
    atomic: a snapshot either sees a commit's whole file set or none
    of it. The multi-version read uses the MANIFEST-STATS trick: each
    live file is scanned ONCE into per-file partial aggregates, and
    snapshots combine partials through a broadcast (version, file)
    membership join — files shared by several snapshots (most of
    them, under copy-on-write) are never re-read, the same reason
    real formats keep column stats in manifests."""
    import json

    tag = corpus_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), f"hbdbps_tablelog_{tag}")
    logd = os.path.join(root, "_log")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    if not os.path.exists(os.path.join(root, "_BUILT")):
        slices = {
            "A": F.col("o_orderkey") % 4 == 0,
            "B": F.col("o_orderkey") % 4 == 1,
            "C": F.col("o_orderkey") % 4 == 2,
            "D": (F.col("o_orderkey") % 4).isin(1, 3),
        }
        for name, pred in slices.items():
            orders.filter(pred).write.mode("overwrite").parquet(
                os.path.join(root, f"file_{name}")
            )
        os.makedirs(logd, exist_ok=True)
        commits = [
            {"add": ["file_A", "file_B"], "remove": []},
            {"add": ["file_C"], "remove": []},
            {"add": ["file_D"], "remove": ["file_B"]},
        ]
        for v, c in enumerate(commits):
            with open(os.path.join(logd, f"{v:06d}.json"), "w") as fh:
                json.dump(c, fh)
        open(os.path.join(root, "_BUILT"), "w").close()

    def live_files(version: int) -> list[str]:
        live: set[str] = set()
        for v in range(version + 1):
            c = json.load(open(os.path.join(logd, f"{v:06d}.json")))
            live -= set(c["remove"])
            live |= set(c["add"])
        return sorted(os.path.join(root, f) for f in live)

    membership = [
        (version, os.path.basename(path))
        for version, _residues in _TLOG_VERSIONS
        for path in live_files(version)
    ]
    every_file = sorted({os.path.join(root, f) for _v, f in membership})
    # ONE relation over the union of live files (one listing, one scan
    # job — separate per-file relations each pay plan-time listing +
    # footer reads), MEMOIZED like load_table's source relations: the
    # file set is immutable by construction (copy-on-write — a commit
    # never rewrites a live file), so caching the relation is exactly
    # the metadata caching real formats do, and re-listing per query
    # would pay driver-side listing + schema inference every run.
    memo_key = (spark.sparkContext.applicationId, *every_file)
    if memo_key not in _TLOG_RELATION_MEMO:
        _TLOG_RELATION_MEMO[memo_key] = spark.read.parquet(*every_file)
    partials = (
        _TLOG_RELATION_MEMO[memo_key]
        .withColumn("file", F.regexp_extract(F.input_file_name(), r"(file_[A-Z])/", 1))
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("pc"),
            F.min("o_orderkey").cast("long").alias("pmin"),
            F.max("o_orderkey").cast("long").alias("pmax"),
        )
    )
    mem = spark.createDataFrame(membership, "version int, file string")
    return (
        partials.join(F.broadcast(mem), "file")
        .groupBy("version")
        .agg(
            F.sum("pn").alias("n_rows"),
            F.sum("pc").alias("sum_cents"),
            F.min("pmin").alias("min_key"),
            F.max("pmax").alias("max_key"),
        )
        .select("version", "n_rows", "sum_cents", "min_key", "max_key")
    )


@register(
    "table_log_incremental_read",
    # Hash oracle: each commit's add/remove file sets map to residue
    # predicates over `orders`, so DuckDB recomputes every change set
    # from the source. Exact-integer fingerprints only.
    oracle="""
        WITH chg AS (
          SELECT 1 AS version, 'add' AS side, o_orderkey, o_totalprice
          FROM orders WHERE o_orderkey % 4 = 2
          UNION ALL
          SELECT 2, 'add', o_orderkey, o_totalprice
          FROM orders WHERE o_orderkey % 4 IN (1, 3)
          UNION ALL
          SELECT 2, 'remove', o_orderkey, o_totalprice
          FROM orders WHERE o_orderkey % 4 = 1
        )
        SELECT version, side,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM chg GROUP BY version, side
    """,
    tags=("S9'", "lakehouse", "cdc", "incremental"),
)
def table_log_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9' — INCREMENTAL consumption of the commit-log table (the
    sibling of ``table_log_time_travel``): a downstream consumer that
    has processed version k-1 asks "what changed at version k?" and
    reads ONLY that commit's added and removed files — the
    change-data-feed pattern every lakehouse streaming source builds
    on (process deltas, never re-scan the table). Per commit ≥1 the
    operator fingerprints the added rows and the removed rows with
    exact-integer aggregates, hash-checked against recomputing each
    change set from the source table.

    Scale: the work is proportional to the CHANGE, not the table —
    commit 1 reads one file, commit 2 reads two (one added, one
    removed), and the 100-TB table behind them is never touched. The
    log tells the consumer exactly which files to read (no listing,
    no diffing of snapshots — the remove entries make deletes
    first-class, which snapshot-diffing would have to reconstruct by
    anti-join). Reuses the table directory ``table_log_time_travel``
    synthesizes; builds it if absent so the two operators are
    independently runnable."""
    import json

    tag = corpus_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), f"hbdbps_tablelog_{tag}")
    logd = os.path.join(root, "_log")
    if not os.path.exists(os.path.join(root, "_BUILT")):
        table_log_time_travel(spark, sf_dir)  # synthesizes the dir + log

    commits = sorted(f for f in os.listdir(logd) if f.endswith(".json"))
    out = None
    for v, cname in enumerate(commits):
        if v == 0:
            continue  # version 0 bootstraps the table; no prior consumer state
        c = json.load(open(os.path.join(logd, cname)))
        for side, files in (("add", c["add"]), ("remove", c["remove"])):
            if not files:
                continue
            paths = tuple(os.path.join(root, f) for f in files)
            # immutable change files — memoize the relation like the
            # time-travel sibling (re-listing per run pays driver-side
            # listing + schema inference for data that cannot change)
            memo_key = (spark.sparkContext.applicationId, *paths)
            if memo_key not in _TLOG_RELATION_MEMO:
                _TLOG_RELATION_MEMO[memo_key] = spark.read.parquet(*paths)
            chg = _TLOG_RELATION_MEMO[memo_key]
            agg = chg.agg(
                F.lit(v).cast("int").alias("version"),
                F.lit(side).alias("side"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
            ).select("version", "side", "n_rows", "sum_cents")
            out = agg if out is None else out.unionAll(agg)
    return out
