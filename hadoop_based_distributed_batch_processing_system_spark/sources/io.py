"""Sources and sinks.

The reference system class reads files from a distributed FS via
InputFormats and writes part-files via OutputFormats (Hadoop
``FileInputFormat``/``TextInputFormat``/``OutputFormat`` — public
Hadoop API surface; SURVEY.md §2.1). Here the equivalents are
columnar Parquet scans (vectorized reader, predicate pushdown and
column pruning for free) and ``DataFrameWriter`` sinks.

All table loading funnels through :func:`load_table` — the single
place that knows the one ingest quirk in the test corpus
(``events.ts`` is parquet TIMESTAMP(NANOS); see FIXTURES.md).

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test-corpus table as a DataFrame.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    4.x refuses to read natively ([PARQUET_TYPE_ILLEGAL]). The legacy
    flag makes it arrive as nanos-since-epoch LONG; truncating to µs
    reproduces exactly what the DuckDB oracle's µs-precision TIMESTAMP
    does (hash-verified in SURVEY.md §1.2). The conf is set at runtime
    so externally built sessions (the verify driver's) work too.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer division, NOT `/1000` (double division rounds the low
        # microsecond up for ~half the values; DuckDB truncates)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


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
