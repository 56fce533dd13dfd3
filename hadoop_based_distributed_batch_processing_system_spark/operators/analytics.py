"""Composite analytics queries — full TPC-H-shaped workloads over the
reduced star schema (the corpus omits partsupp and some columns, so
each query keeps its canonical TPC-H *shape* with adapted
predicates). These are the chained-MapReduce-jobs workloads the
reference class runs as hand-assembled pipelines; here each is ONE
declarative plan Catalyst optimizes end-to-end (join reordering,
pushdown through joins, partial aggregation below the final sort).

Q1/Q3/Q5/Q6 shapes live in aggregates.py / joins.py; this module adds
the semi-join, disjunctive-predicate, conditional-aggregation, and
scalar-subquery shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "q4_late_shipping_priority",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
    """,
    tags=("J4", "A1", "composite"),
)
def q4_late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — order-priority checking: orders in a window having
    at least one line shipped after the order date (EXISTS → left-semi
    join; the fact side never duplicates, no distinct needed)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q10_returned_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("J7", "O2", "composite"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — top-20 customers by returned-item revenue: 4-way
    join (nation broadcast), filters pushed to both fact scans,
    aggregate, TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag
    """,
    tags=("A1", "F3", "composite"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — conditional aggregation (CASE inside SUM) after a
    fact-fact join with a pushed date-range filter."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle="""
        SELECT 100.0 * SUM(CASE WHEN p.p_name LIKE 'red%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)) AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("A2", "P4", "composite"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — global ratio aggregate over a month of shipments:
    part side broadcast, the CASE'd numerator and denominator computed
    in one pass (no second scan or self-join)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0 * F.sum(F.when(F.col("p_name").like("red%"), rev).otherwise(0.0)) / F.sum(rev)
            ).alias("promo_pct")
        )
    )


@register(
    "q19_disjunctive_brackets",
    oracle="""
        SELECT SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 10 AND l.l_quantity <= 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    tags=("P2", "A2", "composite"),
)
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — disjunctive bracket predicates across both join
    sides: Catalyst extracts the common p_partkey equi-key so the
    OR-of-ANDs stays a broadcast-hash join with a post-join filter,
    and pushes the p_brand/p_size disjunction to the part scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (p.p_brand == "Brand#1") & p.p_size.between(1, 15) & l.l_quantity.between(1, 20)
    ) | (
        (p.p_brand == "Brand#2") & p.p_size.between(10, 30) & l.l_quantity.between(10, 35)
    ) | (
        (p.p_brand == "Brand#3") & p.p_size.between(20, 50) & l.l_quantity.between(20, 50)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
        SELECT c.c_mktsegment, COUNT(*) AS n_custs, SUM(c.c_acctbal) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
          )
        GROUP BY c.c_mktsegment
    """,
    tags=("J4", "A2", "composite"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — scalar-subquery threshold + anti join: customers
    with above-average positive balance and no pending ('P') orders.
    The scalar average is one tiny aggregate broadcast into the
    filter; the NOT EXISTS is a left-anti join (no row duplication,
    no distinct) with the status filter pushed below it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("t"))
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("t"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"), F.sum("c_acctbal").alias("total_bal")
    )


@register(
    "pipeline_training_data_prep",
    oracle="""
        WITH filtered AS (
          SELECT doc_id, text, lang, n_chars,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
          WHERE lang IN ('en', 'de', 'fr')
            AND len(string_split(text, ' ')) >= 5
        ),
        deduped AS (
          SELECT lang, n_tokens, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
          FROM filtered
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_chars), 6) AS avg_chars
        FROM deduped
        WHERE rn = 1
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("L1", "L6", "composite", "pipeline"),
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's reason to exist, as ONE plan: a training-data
    prep pipeline — language filter → minimum-length quality gate →
    exact dedup (keep lowest doc_id per content hash) → per-language
    corpus stats. The reference class runs this as 3-4 chained jobs
    with materialized intermediates; declared as a single DataFrame
    chain, Catalyst pushes the lang/length filters into the scan and
    the dedup window rides the same hash shuffle as the final
    aggregation's partial combine. Counts removed duplicates as a
    quality metric alongside kept-doc token totals."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    filtered = (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        .filter(F.col("lang").isin("en", "de", "fr") & (F.col("n_tokens") >= 5))
    )
    wd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    wc = Window.partitionBy(F.md5("text"))
    deduped = filtered.withColumn("rn", F.row_number().over(wd)).withColumn(
        "n_copies", F.count(F.lit(1)).over(wc)
    )
    return (
        deduped.filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum(F.col("n_copies") - 1).alias("n_dups_removed"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@register(
    "upsert_cdc_apply",
    oracle="""
        WITH changes AS (
          -- updates: every 10th order re-priced; inserts: every 100th key offset past the keyspace
          SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice, 'update' AS op
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 100000000, o_custkey, 1.0, 'insert'
          FROM orders WHERE o_orderkey % 100 = 0
        ),
        merged AS (
          SELECT o_orderkey, o_custkey, o_totalprice, src,
                 ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY pri) AS rn
          FROM (
            SELECT o_orderkey, o_custkey, o_totalprice, 'cdc' AS src, 0 AS pri FROM changes
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice, 'base', 1 FROM orders
          )
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE src = 'cdc') AS BIGINT) AS n_from_cdc,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM merged WHERE rn = 1
    """,
    tags=("J2", "cdc", "composite"),
)
def upsert_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert (MERGE INTO semantics, engine-level): apply a
    change set — updates for existing keys, inserts for new ones —
    onto a base snapshot, newest-wins per key. Implemented as
    union + one row_number window over the key (one hash shuffle),
    the standard formulation when the table format has no native
    MERGE; at 100 TB the same plan works partition-wise against a
    hive-partitioned base so only touched partitions rewrite. The
    change set here is derived deterministically from the base so
    both engines build the identical input. Returns audit totals
    (row count, rows taken from CDC, post-merge sum)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice"))
    )
    inserts = o.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit(1.0).alias("o_totalprice"),
    )
    changes = updates.union(inserts).withColumn("src", F.lit("cdc")).withColumn("pri", F.lit(0))
    base = o.withColumn("src", F.lit("base")).withColumn("pri", F.lit(1))
    w = Window.partitionBy("o_orderkey").orderBy("pri")
    merged = changes.union(base).withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("src") == "cdc", 1)).alias("n_from_cdc"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )
