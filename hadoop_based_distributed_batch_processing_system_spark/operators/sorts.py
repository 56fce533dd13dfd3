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


@register(
    "secondary_sort_user_timeline",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS timeline
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("O3", "secondary-sort"),
)
def secondary_sort_user_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3' — the literal MapReduce SECONDARY SORT translation: route
    all rows of a key to one partition (``repartition(key)``), sort
    each partition by (key, ts, event_id) (``sortWithinPartitions``
    — the shuffle's sort phase, never a global sort), then a single
    forward scan per partition emits each user's event-type timeline
    in time order. The scan is ``mapInPandas`` with carry-over state
    between Arrow batches, because one user's run of rows may span a
    batch boundary — exactly the reduce()-iterator contract the
    reference class gives user code. Oracle: ordered ``string_agg``
    proves both the grouping and the within-key order."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")

    def scan(batches):
        carry_uid = None
        carry_types: list[str] = []
        carry_n = 0
        for pdf in batches:
            for uid, grp in pdf.groupby("user_id", sort=False):
                types = list(grp["event_type"])
                if uid == carry_uid:
                    carry_types.extend(types)
                    carry_n += len(types)
                else:
                    if carry_uid is not None:
                        yield pd.DataFrame(
                            {"user_id": [carry_uid], "n_events": [carry_n], "timeline": [">".join(carry_types)]}
                        )
                    carry_uid, carry_types, carry_n = uid, types, len(types)
        if carry_uid is not None:
            yield pd.DataFrame(
                {"user_id": [carry_uid], "n_events": [carry_n], "timeline": [">".join(carry_types)]}
            )

    return (
        ev.repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(scan, "user_id long, n_events long, timeline string")
        .orderBy("user_id")
    )
