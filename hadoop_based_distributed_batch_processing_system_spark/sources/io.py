"""Sources and sinks.

The reference system class reads files from a distributed FS via
InputFormats and writes part-files via OutputFormats (Hadoop
``FileInputFormat``/``TextInputFormat``/``OutputFormat`` — public
Hadoop API surface; SURVEY.md §2.1). Here the equivalents are
columnar Parquet scans (vectorized reader, predicate pushdown and
column pruning for free) and ``DataFrameWriter`` sinks.

All table loading funnels through :func:`load_table` — the single
place that knows the one ingest quirk in the test corpus: the
physical encoding of ``events.ts`` has changed across corpus
regenerations (TIMESTAMP(NANOS) in early corpora, TIMESTAMP(MICROS,
isAdjustedToUTC=false) today; see FIXTURES.md), so the encoding is
PROBED from the parquet footer per corpus — never assumed.

Scale notes:
- One parquet file per table locally; at 100 TB each "table" is a
  directory of many files — ``spark.read.parquet`` takes either, and
  ``spark.sql.files.maxPartitionBytes`` (default 128 MB) controls the
  split granularity. Nothing here assumes single-file inputs.
- ``Tables`` caches nothing and collects nothing; each attribute
  access returns a fresh lazy DataFrame so Catalyst sees the full
  plan from scan to sink.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def corpus_tag(sf_dir: str) -> str:
    """Content fingerprint of a corpus directory for /tmp cache keys:
    hash of the absolute path plus (name, size, mtime) of every
    parquet file. Caches keyed by this are stale-proof — regenerating
    a corpus in place, or pointing at a same-basename corpus at a
    different path, changes the tag and forces a fresh export
    (basename-only keys silently served stale data)."""
    import glob
    import hashlib
    import os

    h = hashlib.sha256(os.path.abspath(sf_dir).encode())
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


# (abspath, size, mtime_ns) -> ("timestamp", unit, tz-aware) | ("int64",)
# Keyed on file identity so an in-place corpus regeneration re-probes.
_TS_SPEC_CACHE: dict = {}

# Per-session scan cache: SparkSession -> {(abspath, size, mtime_ns): DataFrame}.
# A DataFrame is an immutable lazy plan, so handing the same scan node to
# every caller is semantically free, and it skips the per-call file
# listing + footer schema inference of spark.read.parquet (~100-150 ms
# per query at bench scale) — the catalog-table workflow, where schema
# and file index are resolved once, not per query. Weak-keyed so a
# stopped session's cache dies with it; file-identity keys make an
# in-place corpus regeneration miss cleanly.
import weakref

_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def events_ts_spec(sf_dir: str) -> tuple:
    """Probe the physical parquet type of ``events.ts`` from the file
    footer (pyarrow — no Spark session needed, no data read).

    Returns ``("timestamp", unit, tz_aware)`` with unit in
    {"s","ms","us","ns"}, or ``("int64",)`` for a raw long column.
    The corpus has been regenerated mid-build once already (NANOS →
    MICROS between rounds 2 and 3), so nothing downstream may assume
    an encoding: batch and stream ingest both branch on this probe.

    ``events.parquet`` may be a single file (the local corpus) or a
    DIRECTORY of part-files (every table at 100 TB): for a directory,
    one part-file's footer speaks for all — a table whose parts
    disagree on the ts encoding is corrupt upstream of this engine.
    """
    import glob
    import os

    path = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    spec = _TS_SPEC_CACHE.get(key)
    if spec is None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                raise FileNotFoundError(f"no parquet part-files under {path}")
            probe = parts[0]
        t = pq.ParquetFile(probe).schema_arrow.field("ts").type
        if pa.types.is_timestamp(t):
            spec = ("timestamp", t.unit, t.tz is not None)
        else:
            spec = ("int64",)
        _TS_SPEC_CACHE[key] = spec
    return spec


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test-corpus table as a DataFrame.

    ``events.ts``'s physical encoding is probed per corpus
    (:func:`events_ts_spec`) and normalized to a µs-precision
    TimestampType instant, which is what the DuckDB oracle's naive
    TIMESTAMP hashes to under a UTC session timezone:

    - TIMESTAMP(NANOS): Spark 4.x refuses to read it natively
      ([PARQUET_TYPE_ILLEGAL]); the legacy flag makes it arrive as
      nanos-since-epoch LONG, truncated here to µs with integer
      division (double division would round the low µs up for ~half
      the values; DuckDB truncates).
    - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): arrives as
      TIMESTAMP_NTZ; cast to TimestampType under the UTC session TZ
      is a lossless wall-clock→instant reinterpretation.
    - already UTC-adjusted, or raw INT64 (treated as µs): passthrough.

    Confs are set at runtime so externally built sessions (the verify
    driver's) work too.
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    cache = _SCAN_CACHE.setdefault(spark, {})
    df = cache.get(key)
    if df is not None:
        return df

    if name == "events":
        spec = events_ts_spec(sf_dir)
        # the NTZ→instant cast (and any ts rendering) must agree with
        # the naive-UTC oracle regardless of the host/session TZ
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if spec[0] == "timestamp" and spec[1] == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, T.TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            elif isinstance(ts_type, T.LongType):
                # raw int64 with no logical annotation: µs since epoch
                df = df.withColumn("ts", F.timestamp_micros(F.col("ts")))
    else:
        df = spark.read.parquet(path)
    cache[key] = df
    return df


class Tables:
    """Lazy accessor for all corpus tables: ``Tables(spark, sf).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise AttributeError(f"unknown table: {name}")
        return load_table(self._spark, self._sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL path."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sink_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Write a DataFrame as parquet part-files (the OutputFormat
    equivalent). ``partition_by`` produces hive-style directory
    partitioning — the 100 TB layout for anything re-read by a
    partition-key predicate (enables partition pruning)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (header on). Row-oriented text output ≈ the reference
    class's TextOutputFormat part-files."""
    df.write.mode(mode).option("header", "true").csv(path)
