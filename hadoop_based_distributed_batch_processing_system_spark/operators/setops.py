"""Set operations and row dedup (SURVEY.md §2.7, U1-U3).

Reference-class parity: UNION ALL is file concatenation of job
outputs; distinct/dedup is the canonical identity-map + identity-
reduce MR job.

Scale notes: ``distinct``/``intersect``/``except`` all shuffle on
the full row — project to the minimal column set FIRST (done in every
operator here) so the shuffle carries only the needed bytes.
``dedup_latest_per_key`` is the deterministic replacement for
``dropDuplicates([key])`` (which keeps an arbitrary row and is
therefore unreproducible across runs — banned by engine convention).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "union_all",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    """,
    tags=("U1",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1a — bag union (duplicates kept), by column name."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    return a.unionByName(b)


@register(
    "union_distinct",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    """,
    tags=("U1",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1b — set union (one distinct shuffle on the projected row)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    return a.unionByName(b).distinct()


@register(
    "intersect_distinct",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("U2",),
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2a — set intersection (customers with both open and closed
    orders)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "except_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("U2",),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2b — multiset difference (bag semantics preserved)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "dedup_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem",
    tags=("U3",),
)
def dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3a — distinct over a projection (the identity-MR dedup job).
    Project-then-distinct: the shuffle carries 3 columns, not 11."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_suppkey").distinct()


@register(
    "dedup_latest_per_key",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
    tags=("U3",),
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3b — keep exactly one deterministic row per key (latest order
    per customer, ties broken by key). The reproducible form of
    ``dropDuplicates([key])``."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "union_by_name_evolution",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, NULL FROM orders
        WHERE o_orderkey % 3 = 1
    """,
    tags=("U1", "schema-evolution"),
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tolerant union (`unionByName(allowMissingColumns=True)`):
    the newer branch carries an extra column, the older branch gets it
    null-filled — and columns match BY NAME, not position (positional
    UNION with drifted schemas is another classic silent-corruption
    bug; by-name is the safe default for long-lived pipelines). Same
    additive-evolution semantics as the mergeSchema parquet read, at
    the plan level instead of the storage level."""
    o = load_table(spark, sf_dir, "orders")
    new_branch = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old_branch = o.filter(F.col("o_orderkey") % 3 == 1).select("o_orderkey", "o_totalprice")
    return new_branch.unionByName(old_branch, allowMissingColumns=True)


@register(
    "intersect_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("U2",),
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2c — MULTISET intersection: each customer appears
    min(#open-orders, #closed-orders) times, where the distinct
    variant above collapses to one row. Spark plans both as the same
    left-semi-style shuffle; ALL semantics just keep per-key counts
    (an Expand + aggregate under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)
