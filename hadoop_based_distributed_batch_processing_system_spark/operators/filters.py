"""Projection / filter / predicate operators (SURVEY.md §2.2, P1-P4).

Reference-class parity: the map phase of MapReduce — per-record
compute (P1), predicate filtering (P2), distributed grep (P3 — the
canonical MapReduce demo, Dean & Ghemawat OSDI'04 §2.1), LIKE
matching (P4).

Scale notes: every predicate here is a Catalyst-native expression, so
it is pushed into the parquet scan (``PushedFilters`` — asserted in
tests/test_plans.py) and evaluated inside whole-stage codegen. No
shuffle is involved in any of these operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS disc_price,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
               l_quantity * l_extendedprice AS gross
        FROM lineitem
    """,
    tags=("P1",),
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — derived-column projection (map-side compute)."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (price * (1 - disc)).alias("disc_price"),
        (price * (1 - disc) * (1 + tax)).alias("charge"),
        (F.col("l_quantity") * price).alias("gross"),
    )


@register(
    "filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_discount > 0.05
          AND l_returnflag IN ('A', 'R')
          AND l_shipdate IS NOT NULL
          AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
    tags=("P2",),
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — conjunctive predicate: BETWEEN + comparison + IN + null
    check + timestamp bound. All five push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "filter_regex",
    oracle=r"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE regexp_matches(text, 'scan\s+\w+\s+fast')
    """,
    tags=("P3",),
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — distributed grep (the canonical MapReduce example:
    emit lines matching a pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(r"scan\s+\w+\s+fast")).select("doc_id", "lang", "n_chars")


@register(
    "filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_name LIKE '%red%' AND p_brand NOT LIKE '%9'
    """,
    tags=("P4",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — SQL LIKE / NOT LIKE string matching. StartsWith/contains
    LIKE shapes push down to parquet as string filters."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%red%") & ~F.col("p_brand").like("%9")).select(
        "p_partkey", "p_name", "p_brand"
    )
