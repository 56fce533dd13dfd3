"""Sort / limit / top-k operators (SURVEY.md §2.6, O1-O3).

Reference-class parity: total-order sort is the TeraSort /
``TotalOrderPartitioner`` pattern (public Hadoop surface); top-k and
secondary-sort-per-key are canonical MR idioms.

Scale notes:
- O1 ``orderBy`` range-partitions by sampled split points — the same
  idea as TotalOrderPartitioner, built in. A full global sort of
  100 TB is a deliberate act; everything else here avoids it.
- O2 compiles to ``TakeOrderedAndProject``: per-partition top-k
  heaps, then a k-sized merge on the driver — no global sort, no
  full shuffle. This is THE way to take top-k at scale.
- O3 shuffles once on the group key and sorts within partitions —
  never globally.
- Engine convention (SURVEY §4.3): every LIMIT carries a unique
  tiebreaker in its ORDER BY, otherwise ties make output
  nondeterministic across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "sort_global",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    tags=("O1",),
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — global total-order sort (range-partitioned, TeraSort
    pattern)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@register(
    "topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("O2",),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — ORDER BY + LIMIT k → ``TakeOrderedAndProject`` (per-
    partition heaps + driver merge of k rows; no global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    tags=("O3",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — k best per key (the MR secondary-sort pattern): one
    shuffle on the group key, per-partition sort, early filter."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
