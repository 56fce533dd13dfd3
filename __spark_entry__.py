"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the
``hadoop_based_distributed_batch_processing_system_spark`` package;
this module only adapts its operator registry to the driver's
three-function surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import REGISTRY, load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shape
    pricing summary (filter → group-by → 8 aggregates) on lineitem."""
    load_all()
    return REGISTRY["agg_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries (sketches, sinks,
    partitioning, streaming) get the driver's rows-only check."""
    load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
