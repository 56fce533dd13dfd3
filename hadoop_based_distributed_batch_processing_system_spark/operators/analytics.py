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
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import bucketed_rank_cumsum
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
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
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
        # exact integer cents (r17 sf0.1 sweep: the double SUM tied at
        # the 6-dp canon boundary): the per-row product is identical
        # IEEE on both engines; the integer sum is order-insensitive
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
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
    the dedup is ONE min_by aggregation on the content hash — a
    declarative aggregate, so identical texts collapse MAP-SIDE in
    the partial-combine before the shuffle (the window+rank form
    would sort every copy through the exchange first; the oracle
    keeps that form — the kept row per hash, lowest doc_id, is
    identical). Counts removed duplicates as a quality metric
    alongside kept-doc token totals."""
    docs = load_table(spark, sf_dir, "documents")
    filtered = (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        .filter(F.col("lang").isin("en", "de", "fr") & (F.col("n_tokens") >= 5))
    )
    deduped = (
        filtered.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min_by(
                F.struct("lang", "n_tokens", "n_chars"), F.col("doc_id")
            ).alias("keep"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep.lang", "keep.n_tokens", "keep.n_chars", "n_copies")
    )
    return (
        deduped.groupBy("lang")
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
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_price
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
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4).alias("total_price"),
    )


@register(
    "q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 4) AS revenue
        FROM (
          SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                 CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
              OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
            AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J7", "composite"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — volume shipping between two trading nations, by
    supplier nation x customer nation x ship year. The nation pair
    disjunction sits ABOVE two independent dimension joins; both
    nation joins broadcast, so only the lineitem->orders->customer
    chain shuffles (fact keys). At 100 TB the date filter prunes at
    the scan and the pair predicate cuts the fact stream before the
    wide joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        pair.withColumn("l_year", F.year("l_shipdate"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
        FROM (
          SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 ns.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          JOIN region r ON nc.n_regionkey = r.r_regionkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_name LIKE '%widget%'
        )
        GROUP BY o_year
    """,
    tags=("J7", "A1", "composite"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — national market share: of all 'widget' volume sold
    to ASIA customers, the fraction supplied by NATION_3 per order
    year. Conditional aggregation (share = CASE'd sum / total sum)
    over a 7-way star join; every dimension broadcasts, the fact
    chain shuffles once per fact-fact key. The share division happens
    post-aggregation on grouped rows (cheap)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    asia_nations = nat.join(F.broadcast(region), nat.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
        FROM (
          SELECT ns.n_name AS nation,
                 CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * 0.5 * l.l_quantity AS amount
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          WHERE p.p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
    """,
    tags=("J7", "A1", "composite"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — product-type profit by nation and year. The corpus
    has no partsupp, so supply cost is proxied as half the part's
    retail price (deterministic, both engines compute it from the
    same column). LIKE-filtered part dim broadcasts; profit expression
    is pure columnar arithmetic inside whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.5 * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("amount", amount)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
        WITH pv AS (
          SELECT l.l_partkey,
                 SUM(l.l_extendedprice * (1 - l.l_discount)) AS val
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_name IN ('NATION_4', 'NATION_7')
          GROUP BY l.l_partkey
        )
        SELECT l_partkey, ROUND(val, 4) AS part_value
        FROM pv
        WHERE val > (SELECT SUM(val) * 0.001 FROM pv)
    """,
    tags=("A1", "composite", "scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — important stock: parts whose revenue (restricted
    to two supplier nations) exceeds a fraction of the TOTAL such
    revenue. The scalar subquery is a 1-row aggregate broadcast-cross-
    joined against the grouped rows — the aggregated input is computed
    once and reused for both sides at the DataFrame level (the
    fraction threshold compares group rows against their own grand
    total)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_7")
    ).select("n_nationkey")
    nation_supp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select("s_suppkey")
    pv = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == nation_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"))
    )
    total = pv.agg((F.sum("val") * 0.001).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.round("val", 4).alias("part_value"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("J3", "A1", "composite"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — customer order-count distribution: LEFT join with
    a predicate ON THE JOIN CONDITION (not a post-filter — customers
    with only urgent orders must still appear with count 0), per-
    customer count, then the distribution of those counts. Two
    cascaded aggregations; the second groups on the first's output so
    it re-shuffles a tiny intermediate."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 4) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("A1", "composite", "scalar-subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — top supplier by quarterly revenue, via a scalar
    MAX subquery over a derived revenue view (the TPC-H CREATE VIEW
    step becomes a reused DataFrame). The max is a 1-row broadcast;
    no window needed, and ties are returned (not LIMIT 1) exactly as
    the spec requires."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 19, 25, 49)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("J4", "A3", "composite"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — parts/supplier relationship: distinct supplier
    count per (brand, type, size) bucket, excluding a blacklist of
    suppliers via NOT IN -> broadcast anti join (null-safe here
    because s_suppkey is a PK, never null). The distinct-count rides
    a single hash shuffle on the group keys with partial distinct
    merging map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 25, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < 0.2 * (
            SELECT AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey
          )
    """,
    tags=("A1", "composite", "correlated-subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — small-quantity-order revenue with a CORRELATED
    AVG subquery per part. Decorrelated the standard way: compute
    avg(l_quantity) per part once as an aggregate, join it back to
    the brand-filtered lines, filter below-threshold rows, global
    sum. The per-part average must run over ALL lineitems (not just
    the brand's) to match the correlation semantics — the brand
    filter applies only to the outer side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    brand_lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return (
        brand_lines.join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, SUM(l.l_quantity) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    tags=("J4", "A1", "O2", "composite"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape — large-volume orders: IN-subquery with HAVING
    becomes an aggregate -> semi join; the winning orders then join
    customer and re-aggregate line quantities. Top-100 by price with
    the orderkey tiebreaker (deterministic LIMIT across engines).
    The HAVING aggregate and the final per-order sum reuse the same
    l_orderkey shuffle partitioning."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq")).filter(F.col("sq") > 250).select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_orderkey")), F.col("l_orderkey") == F.col("big_orderkey"), "inner")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        WITH late AS (
          SELECT DISTINCT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        ),
        all_supp AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (
          SELECT 1 FROM all_supp a
          WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM late l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        GROUP BY s.s_name
    """,
    tags=("J4", "composite"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers who kept orders waiting: in finished
    orders, the supplier was late (shipped >60 days after order) in a
    multi-supplier order where NO OTHER supplier was late. The corpus
    lacks commit/receipt dates, so 'late' is defined against
    o_orderdate (same definition on both engines). EXISTS -> left-semi
    on (order, other-supplier), NOT EXISTS -> left-anti on the late
    set; both sides derive from the same distinct (order, supplier)
    projection so the shuffles share partitioning."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_supp = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
    has_other = l1.join(
        all_supp,
        (F.col("ok") == all_supp.l_orderkey) & (F.col("sk") != all_supp.l_suppkey),
        "left_semi",
    )
    no_other_late = has_other.join(
        late,
        (F.col("ok") == late.l_orderkey) & (F.col("sk") != late.l_suppkey),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        no_other_late.join(F.broadcast(supp), F.col("sk") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q3_SQL = """
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
"""


@register("sql_catalog_query", oracle=_Q3_SQL, tags=("entry3", "sql"))
def sql_catalog_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry 3 of the lifecycle (SURVEY §3.2): the SQL-string path.
    All ten tables are registered as temp views and the query is ONE
    ANSI-SQL string through Spark's parser — the exact same text runs
    as the DuckDB oracle, so this also pins Spark/DuckDB SQL-dialect
    compatibility for the join/agg/sort/limit core. Same Catalyst
    pipeline as the DataFrame path after parsing; the deterministic
    o_orderkey tiebreaker makes LIMIT stable across engines."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


@register(
    "sql_parameterized",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice >= 100000.0
        GROUP BY o_orderpriority
    """,
    tags=("entry3", "sql"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named parameters): the query text
    contains :status / :min_price placeholders bound server-side —
    no string interpolation, no injection surface, and the parsed
    plan is cacheable across bindings. The productionized form of
    ad-hoc SQL in a multi-tenant engine."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_price": 100000.0},
    )


@register(
    "scd2_history_build",
    oracle="""
        WITH versions AS (
          SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from
          FROM orders
          UNION ALL
          SELECT o_orderkey, o_totalprice * 1.1, o_orderdate + INTERVAL 30 DAY
          FROM orders WHERE o_orderkey % 5 = 0
          UNION ALL
          SELECT o_orderkey, o_totalprice * 1.2, o_orderdate + INTERVAL 60 DAY
          FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT o_orderkey,
               ROUND(price, 4) AS price,
               valid_from,
               LEAD(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from) AS valid_to,
               (LEAD(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from) IS NULL) AS is_current
        FROM versions
    """,
    tags=("W2", "composite", "scd2"),
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build — the warehouse ETL staple: a pile of
    versioned records per key becomes validity intervals
    [valid_from, valid_to) with exactly one open (is_current) row per
    key. One lead() window over (key, version-ts) — a single shuffle
    on the key, no self-join (the naive interval build joins each
    version to its successor). The version set is derived
    deterministically from orders so both engines construct identical
    input. Downstream point-in-time lookups become a BETWEEN filter —
    at scale, partition the history table by valid_to bucket so
    current-state reads prune all closed history."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    v0 = o.select("o_orderkey", F.col("o_totalprice").alias("price"), F.col("o_orderdate").alias("valid_from"))
    v1 = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("price"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("valid_from"),
    )
    v2 = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.2).alias("price"),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("valid_from"),
    )
    versions = v0.union(v1).union(v2)
    w = Window.partitionBy("o_orderkey").orderBy("valid_from")
    return versions.select(
        "o_orderkey",
        F.round("price", 4).alias("price"),
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH unit AS (
          SELECT l.l_partkey, l.l_suppkey,
                 MIN(l.l_extendedprice / l.l_quantity) AS unit_price
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA'
          GROUP BY l.l_partkey, l.l_suppkey
        ),
        best AS (
          SELECT l_partkey, MIN(unit_price) AS min_price FROM unit GROUP BY l_partkey
        )
        SELECT p.p_partkey, p.p_name, u.l_suppkey AS s_suppkey,
               ROUND(u.unit_price, 6) AS unit_price
        FROM unit u
        JOIN best b ON u.l_partkey = b.l_partkey AND u.unit_price = b.min_price
        JOIN part p ON p.p_partkey = u.l_partkey
        WHERE p.p_size = 25 AND p.p_type = 'SMALL'
    """,
    tags=("J7", "composite", "correlated-subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — minimum-cost supplier: for each qualifying part,
    the ASIA supplier(s) offering the minimum unit price (corpus has
    no partsupp; unit price is derived from lineitem). The correlated
    MIN subquery decorrelates into: per-(part, supplier) MIN, then
    per-part MIN, then an equality join-back that keeps ties — the
    same two-aggregate + join-on-value shape Catalyst produces for
    the SQL form. Part filter broadcasts last: the price computation
    is part-filter-independent, so at 100 TB you materialize the
    unit-price table once and reuse it across part predicates."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    asia_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey")
    )
    unit = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == asia_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = unit.groupBy(F.col("l_partkey").alias("b_partkey")).agg(F.min("unit_price").alias("min_price"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    return (
        unit.join(best, (unit.l_partkey == best.b_partkey) & (unit.unit_price == best.min_price))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey", "p_name",
            F.col("l_suppkey").alias("s_suppkey"),
            F.round("unit_price", 6).alias("unit_price"),
        )
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > 50
        )
    """,
    tags=("J4", "composite"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — promotion-eligible suppliers: the nested-IN chain
    (suppliers ∈ {supplied a red part in 1996 in bulk}). Both IN
    subqueries become semi joins: parts filter broadcasts into the
    lineitem scan, the HAVING aggregate keys on (supplier, part), and
    the outer IN collapses to a distinct-supplier semi join against
    the supplier table. No decorrelation needed — the whole chain is
    pipeline-able and every intermediate shrinks."""
    red_parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    bulk = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(F.broadcast(bulk), supp.s_suppkey == bulk.l_suppkey, "left_semi")


_RCTE_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('MONTH', MIN(o_orderdate)) AS m_min,
             date_trunc('MONTH', MAX(o_orderdate)) AS m_max
      FROM {orders}
    ),
    -- the recursive member must NOT re-reference bounds: Spark inlines
    -- a referenced CTE into every iteration, re-running the min/max
    -- aggregate (a full orders scan) per month of the span — measured
    -- ~80 scans, 13.5s → 0.6s at sf0.01. Carrying m_max along in the
    -- spine rows keeps each iteration a 1-row frame.
    spine(m, m_max) AS (
      SELECT m_min, m_max FROM bounds
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, m_max FROM spine WHERE m < m_max
    ),
    monthly AS (
      SELECT date_trunc('MONTH', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(o_totalprice) AS revenue
      FROM {orders} GROUP BY 1
    )
    SELECT spine.m AS month_start,
           COALESCE(monthly.n_orders, 0) AS n_orders,
           COALESCE(monthly.revenue, 0.0) AS revenue
    FROM spine LEFT JOIN monthly ON spine.m = monthly.m
"""


@register(
    "sql_recursive_cte_spine",
    oracle=_RCTE_SQL.format(orders="orders"),
    tags=("SQL", "recursive"),
)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4) — a monthly calendar spine generated by
    recursion over the orders date span, left-joined to monthly order
    aggregates so gap months appear as explicit zero rows (the dense-
    grid discipline reporting pipelines need; the LOCF resampler does
    the same with ``sequence``, this one exercises the WITH RECURSIVE
    SQL surface itself). Identical SQL text runs on both engines —
    the whole query IS its oracle.

    Scale: recursion depth = #months (~84 for the corpus span), far
    under the 100-level default limit; each iteration is a 1-row
    frame, so the recursive union is driver-cheap regardless of table
    size — the heavy lifting stays in the one monthly aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("hbdbps_rcte_orders")
    return spark.sql(_RCTE_SQL.format(orders="hbdbps_rcte_orders"))


_DQ_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "dq_profile_lineitem",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_val,
               CAST(MAX({c}) AS DOUBLE) AS max_val
        FROM lineitem
        """
        for c in _DQ_COLS
    ),
    tags=("DQ", "profile"),
)
def dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling — the audit every ingestion pipeline
    runs before trusting a batch: per-column null count, distinct
    count, and min/max range, for all columns in ONE scan (a single
    wide aggregate; the oracle's per-column UNION ALL scans once per
    column — the Spark shape is #cols times cheaper), then unpivoted
    to one row per column with ``stack``. At 100 TB the wide-agg
    shape is the only viable one: profiling must not multiply scans
    of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _DQ_COLS:
        aggs += [
            F.sum(F.isnull(c).cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_expr = "stack({n}, {args}) AS (col_name, n_nulls, n_distinct, min_val, max_val)".format(
        n=len(_DQ_COLS),
        args=", ".join(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _DQ_COLS
        ),
    )
    return wide.select("n_rows", F.expr(stack_expr)).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
    )


@register(
    "catalog_managed_table_roundtrip",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(o_totalprice) AS total
        FROM orders
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'MANUAL-APPEND', CAST(1 AS BIGINT), 0.0
    """,
    tags=("catalog", "sql"),
)
def catalog_managed_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse/catalog layer: ``saveAsTable`` writes a MANAGED
    parquet table into the metastore (spark-warehouse/), ``INSERT
    INTO`` appends through the catalog, and the final read goes by
    table NAME, not path — the lifecycle a multi-tenant engine
    offers over raw file sinks (ownership, schema-on-catalog, DROP
    cleans storage). The oracle recomputes write + append from the
    source table, proving the whole catalog cycle lossless.

    Scale: a managed table is just a parquet directory with catalog
    metadata — partitioned/bucketed variants behave like the path
    sinks (S4'), so nothing here changes shape with data size."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import corpus_tag

    tbl = f"hbdbps_managed_{corpus_tag(sf_dir)}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total"))
    )
    agg.write.mode("overwrite").saveAsTable(tbl)
    spark.sql(f"INSERT INTO {tbl} VALUES ('MANUAL-APPEND', 1, 0.0)")
    out = spark.table(tbl).localCheckpoint(eager=True)  # detach from the table before DROP
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return out


@register(
    "cache_two_phase_reuse",
    oracle="""
        WITH f AS (
          SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        )
        SELECT 'by_flag' AS phase, l_returnflag AS k,
               CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS s
        FROM f GROUP BY l_returnflag
        UNION ALL
        SELECT 'by_status', l_linestatus,
               CAST(COUNT(*) AS BIGINT), SUM(l_quantity)
        FROM f GROUP BY l_linestatus
    """,
    tags=("cache", "iterative"),
)
def cache_two_phase_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage reuse via ``cache()`` — the headline difference from a
    MapReduce system, where every job re-reads the DFS: one filtered
    frame is materialized once in executor memory and TWO aggregation
    phases read it back (InMemoryTableScan, plan-asserted in tests)
    instead of re-scanning parquet. The pattern behind every
    iterative workload here (pagerank caches its edge list the same
    way). Materializes eagerly so the cache can be unpersisted before
    returning — no state leaks into the driver's shared session."""
    filtered = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    filtered.cache()
    try:
        by_flag = filtered.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        ).select(F.lit("by_flag").alias("phase"), F.col("l_returnflag").alias("k"), "n", "s")
        by_status = filtered.groupBy("l_linestatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        ).select(F.lit("by_status").alias("phase"), F.col("l_linestatus").alias("k"), "n", "s")
        return by_flag.unionAll(by_status).localCheckpoint(eager=True)
    finally:
        filtered.unpersist()


# Declarative expectation rules: (rule_name, SQL predicate that GOOD
# rows satisfy). The predicate strings are engine-portable ANSI and
# are compiled verbatim into both the Spark plan and the oracle.
_DQ_RULES = (
    ("quantity_in_domain", "l_quantity BETWEEN 1 AND 50"),
    ("discount_in_domain", "l_discount BETWEEN 0.0 AND 0.1"),
    ("tax_in_domain", "l_tax BETWEEN 0.0 AND 0.08"),
    ("price_positive", "l_extendedprice > 0"),
    ("returnflag_valid", "l_returnflag IN ('A', 'N', 'R')"),
    ("status_flag_consistent", "NOT (l_linestatus = 'O' AND l_returnflag IN ('A', 'R'))"),
)


@register(
    "dq_expectations",
    oracle="WITH checked AS (SELECT "
    + ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE NOT ({pred})) AS BIGINT) AS v{i}"
        for i, (_, pred) in enumerate(_DQ_RULES)
    )
    + ", CAST(COUNT(*) AS BIGINT) AS n_checked FROM lineitem) "
    + " UNION ALL ".join(
        f"""
        SELECT '{name}' AS rule_name, n_checked, v{i} AS n_violations,
               ROUND(1.0 - CAST(v{i} AS DOUBLE) / n_checked, 6) AS pass_rate
        FROM checked
        """
        for i, (name, _) in enumerate(_DQ_RULES)
    ),
    tags=("DQ", "expectations"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation checking (the Deequ/Great-Expectations
    verification shape): a rule set of domain/consistency predicates
    is evaluated over lineitem in ONE wide aggregate — each rule
    becomes a conditional count, so the batch is scanned exactly once
    no matter how many expectations the suite carries — then unpivoted
    to the per-rule audit report (rule, checked, violations,
    pass-rate) a pipeline gates its publish step on.

    Scale: identical discipline to dq_profile_lineitem — rules must
    never multiply scans of the fact table; N rules cost N counters
    inside one map-side-partial aggregate (a 1-row shuffle). The
    rule predicates are portable ANSI strings compiled verbatim into
    both engines, so the report is hash-oracled end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    counters = [
        F.sum(F.when(~F.expr(pred), 1).otherwise(0)).cast("long").alias(f"v{i}")
        for i, (_, pred) in enumerate(_DQ_RULES)
    ]
    checked = li.agg(*counters, F.count(F.lit(1)).cast("long").alias("n_checked"))
    stack = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(_DQ_RULES))
    return checked.select(
        F.expr(f"stack({len(_DQ_RULES)}, {stack}) AS (rule_name, n_violations)"),
        "n_checked",
    ).select(
        "rule_name",
        "n_checked",
        "n_violations",
        F.round(1.0 - F.col("n_violations").cast("double") / F.col("n_checked"), 6).alias(
            "pass_rate"
        ),
    )


# Deterministic synthetic "new snapshot" of orders, derived from the
# table itself so both engines build byte-identical inputs: keys
# divisible by 97 are deleted, keys ≡ 3 (mod 89) get a 10% price
# change, and keys ≡ 5 (mod 101) are re-inserted as NEW rows under a
# negated key (guaranteed absent from the old snapshot).
_DIFF_OLD = (
    "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents "
    "FROM orders"
)
# the price bump is +10% HALF-UP in EXACT integer cents —
# (cents*11 + 5) DIV 10 — because ROUND(price * 1.1, 2) ties at the
# half-cent whenever cents % 10 = 5, and Java (shortest-repr HALF_UP)
# and C (true-value) break those ties differently (the r17 sf0.1
# cross-scale sweep caught exactly that: .455 -> .46 on Spark, .45 on
# DuckDB)
_DIFF_NEW = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 3
                THEN (cents * 11 + 5) // 10 ELSE cents END AS cents
    FROM old WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT -o_orderkey AS o_orderkey, cents
    FROM old WHERE o_orderkey % 101 = 5
"""


@register(
    "table_diff_snapshots",
    oracle=f"""
        WITH old AS ({_DIFF_OLD}), new AS ({_DIFF_NEW})
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS diff_status,
               o.cents AS old_cents,
               n.cents AS new_cents
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.cents <> n.cents
    """,
    tags=("CDC", "diff"),
)
def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the audit primitive behind CDC validation,
    reconciliation jobs, and "what changed since yesterday" reports:
    full-outer-join two table versions on the primary key and
    classify every key as added / removed / changed (unchanged rows
    are filtered out, so the output is delta-sized). The comparison
    here is on the value column directly; for wide tables the same
    plan compares a single md5 row-fingerprint per side so the
    shuffle carries (key, hash) only — the shape is identical.

    The "new" snapshot is derived deterministically from orders
    itself (drops, price changes, key-negated inserts) so both
    engines diff byte-identical inputs without a second stored table.

    Scale: one co-partitioned full outer join on the key — both
    sides shuffle once; with bucketed/sorted snapshots (the layout a
    nightly-snapshot pipeline would choose) the exchange disappears
    entirely, as join_bucketed_colocated demonstrates. Output is
    bounded by the churn rate, not the table."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # +10% HALF-UP in exact integer cents (see _DIFF_NEW's note): the
    # numerator stays < 2^53, so the DIV is exact on both engines
    changed_cents = F.when(
        F.col("o_orderkey") % 89 == 3,
        F.expr("(cents * 11 + 5) DIV 10"),
    ).otherwise(F.col("cents"))
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .select("o_orderkey", changed_cents.alias("cents"))
        .unionByName(
            old.filter(F.col("o_orderkey") % 101 == 5).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), "cents"
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .otherwise("changed")
    )
    return joined.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.cents") != F.col("n.cents"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        status.alias("diff_status"),
        F.col("o.cents").alias("old_cents"),
        F.col("n.cents").alias("new_cents"),
    )


@register(
    "scd2_point_in_time_join",
    # Probe ts = o_orderdate + 45 days: between the +30 and +60
    # version boundaries, so keys divisible by 5 resolve to their v1
    # price and the rest to v0 — a real discriminating lookup.
    oracle="""
        WITH versions AS (
          SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from
          FROM orders
          UNION ALL
          SELECT o_orderkey, o_totalprice * 1.1, o_orderdate + INTERVAL 30 DAY
          FROM orders WHERE o_orderkey % 5 = 0
          UNION ALL
          SELECT o_orderkey, o_totalprice * 1.2, o_orderdate + INTERVAL 60 DAY
          FROM orders WHERE o_orderkey % 10 = 0
        ),
        probes AS (
          SELECT o_orderkey, o_orderdate + INTERVAL 45 DAY AS probe_ts FROM orders
        )
        SELECT p.o_orderkey, p.probe_ts, ROUND(v.price, 4) AS price_asof
        FROM probes p
        LEFT JOIN LATERAL (
          SELECT price FROM versions v
          WHERE v.o_orderkey = p.o_orderkey AND v.valid_from <= p.probe_ts
          ORDER BY v.valid_from DESC LIMIT 1
        ) v ON TRUE
    """,
    tags=("W2", "scd2", "asof"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against SCD2 history — the read side of
    scd2_history_build: each probe (key, as-of ts) resolves to the
    version valid at that instant. NOT a per-probe subquery and NOT
    a BETWEEN range join: versions and probes union into one stream,
    one shuffle on the key, and a running last(version) window
    resolves every probe in a single linear pass — the same
    construction as join_asof, which is exactly what a PIT lookup is.
    Versions sort before probes at equal ts (inclusive as-of).

    Scale: training-data pipelines run this shape constantly
    (point-in-time-correct feature joins against feature-store
    history — lookahead leakage is the bug this join exists to
    prevent). Cost = one key-hash shuffle of probes+versions,
    however wide the history."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    versions = (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("vts"),
        )
        .union(
            o.filter(F.col("o_orderkey") % 5 == 0).select(
                "o_orderkey",
                (F.col("o_totalprice") * 1.1).alias("price"),
                (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("vts"),
            )
        )
        .union(
            o.filter(F.col("o_orderkey") % 10 == 0).select(
                "o_orderkey",
                (F.col("o_totalprice") * 1.2).alias("price"),
                (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("vts"),
            )
        )
        .select("o_orderkey", "vts", F.struct("price").alias("ver"), F.lit(0).alias("side"))
    )
    probes = o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")).alias("vts"),
        F.lit(None).cast("struct<price:double>").alias("ver"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("o_orderkey")
        .orderBy("vts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        versions.unionByName(probes)
        .withColumn("asof", F.last("ver", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "o_orderkey",
            F.col("vts").alias("probe_ts"),
            F.round(F.col("asof.price"), 4).alias("price_asof"),
        )
    )


_BASKET_MIN_PAIR = 3  # min co-occurrence count for a rule
_BASKET_TOP = 50


@register(
    "market_basket_rules",
    oracle=f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1996-01-01'
        ),
        n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM li),
        item AS (SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS c FROM li GROUP BY l_partkey),
        pair AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(COUNT(*) AS DOUBLE) AS c_ab
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= {_BASKET_MIN_PAIR}
        )
        SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
               CAST(c_ab AS BIGINT) AS n_both,
               ROUND(c_ab / n_orders.n, 6) AS support,
               ROUND(c_ab / ia.c, 6) AS confidence_a_b,
               ROUND(c_ab * n_orders.n / (ia.c * ib.c), 6) AS lift
        FROM pair
        JOIN item ia ON ia.l_partkey = part_a
        JOIN item ib ON ib.l_partkey = part_b
        CROSS JOIN n_orders
        ORDER BY lift DESC, part_a, part_b
        LIMIT {_BASKET_TOP}
    """,
    tags=("M1", "basket", "rules"),
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (frequent size-2 itemsets over
    1995 orders): pair support, confidence(A→B) and lift, top-50 by
    lift — the recommendation/affinity primitive. The pair stream is
    the SAME bounded per-order self-join as triangle_count (per-order
    line counts ≤ 7, so pair generation is linear in the fact
    table); a minimum-support HAVING prunes the rule set before the
    stats joins, which is what keeps rule mining tractable — rules
    below support are noise AND cost.

    Scale: order self-join shuffles on l_orderkey; item/pair counts
    are key-hashed aggregates; the item-count joins run on the
    pruned rule set. Apriori's insight (size-k itemsets need
    frequent size-k-1) appears here as the support prune."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.agg(F.countDistinct("l_orderkey").cast("double").alias("n"))
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("double").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c_ab"))
        .filter(F.col("c_ab") >= _BASKET_MIN_PAIR)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("n_both"),
            F.round(F.col("c_ab") / F.col("n"), 6).alias("support"),
            F.round(F.col("c_ab") / F.col("c_a"), 6).alias("confidence_a_b"),
            F.round(F.col("c_ab") * F.col("n") / (F.col("c_a") * F.col("c_b")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


@register(
    "customer_pareto_share",
    oracle="""
        WITH rev AS (
          SELECT o_custkey, SUM(o_totalprice) AS r
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, r,
                 SUM(r) OVER (ORDER BY r DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r,
                 row_number() OVER (ORDER BY r DESC, o_custkey) AS rn,
                 SUM(r) OVER () AS total_r,
                 COUNT(*) OVER () AS n_cust
          FROM rev
        )
        SELECT CAST(MIN(rn) AS BIGINT) AS n_top_customers,
               ROUND(CAST(MIN(rn) AS DOUBLE) / MIN(n_cust), 6) AS customer_fraction,
               ROUND(MIN(cum_r) / MIN(total_r), 6) AS revenue_share
        FROM ranked WHERE cum_r >= 0.8 * total_r
    """,
    tags=("M2", "pareto"),
)
def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration (the 80/20 readout): the smallest set of
    top customers whose cumulative revenue crosses 80%, reported as
    (count, customer fraction, exact share at the crossing) — the
    concentration metric behind key-account risk and long-tail
    strategy. Deterministic cumsum order (revenue DESC, custkey).

    Scale: the fact table reduces to the per-customer aggregate
    first, and the Lorenz cumsum runs through
    ``bucketed_rank_cumsum`` (sorts.py) — per-bucket windows plus a
    bucket-totals prefix sum — NOT an unpartitioned window, so no
    task ever holds more than one revenue bucket. The global count
    and revenue total fall out of the same bounded bucket-stats
    pass (≤ n_buckets rows on the driver)."""
    rev = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("r")
    )
    numbered, n_cust, total_r = bucketed_rank_cumsum(
        rev, "r", ["o_custkey"], value_col="r", descending=True
    )
    ranked = numbered.select(
        F.col("__rn").alias("rn"), F.col("__cum").alias("cum_r")
    )
    return (
        ranked.filter(F.col("cum_r") >= 0.8 * total_r)
        .agg(
            F.min("rn").cast("long").alias("n_top_customers"),
            F.round(F.min("rn").cast("double") / F.lit(n_cust), 6).alias(
                "customer_fraction"
            ),
            F.round(F.min("cum_r") / F.lit(total_r), 6).alias("revenue_share"),
        )
    )


@register(
    "cohort_ltv_curve",
    oracle="""
        WITH firsts AS (
          SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort_month
          FROM orders GROUP BY o_custkey
        ),
        sized AS (
          SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS n_customers
          FROM firsts GROUP BY cohort_month
        ),
        rev AS (
          SELECT f.cohort_month,
                 CAST(datediff('month', f.cohort_month,
                               date_trunc('month', o.o_orderdate)) AS BIGINT) AS age_months,
                 SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rc
          FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
          GROUP BY 1, 2
        )
        SELECT r.cohort_month, r.age_months, s.n_customers,
               CAST(SUM(r.rc) OVER (PARTITION BY r.cohort_month ORDER BY r.age_months
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / (100.0 * s.n_customers) AS cum_ltv_per_customer
        FROM rev r JOIN sized s ON r.cohort_month = s.cohort_month
    """,
    tags=("E7", "cohort", "ltv"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — cohort lifetime-value curves: customers grouped by
    first-order month, cumulative revenue per customer tracked by
    cohort age in months — the LTV grid growth teams read
    (cohort_retention's revenue-weighted sibling; retention counts
    who came back, LTV sums what they spent).

    Scale: first-order months are one customer-keyed aggregate; the
    revenue join shuffles the fact table ONCE on custkey; everything
    after (cohort×age cells, the cumulative window, the cohort-size
    join) runs on rollup-sized data. Month arithmetic on truncated
    dates is exact integers in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    sized = firsts.groupBy("cohort_month").agg(F.count(F.lit(1)).alias("n_customers"))
    rev = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
            )
            .cast("long")
            .alias("age_months"),
        )
        # exact integer cents through the cumulative window (r17
        # sf0.1 sweep: the double running SUM tied at the 6-dp canon
        # boundary); ONE double division at display, no ROUND
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rc")
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(sized, "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            "n_customers",
            (
                F.sum("rc").over(w).cast("double")
                / (F.lit(100.0) * F.col("n_customers"))
            ).alias("cum_ltv_per_customer"),
        )
    )


@register(
    "monthly_growth_rates",
    oracle="""
        WITH m AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT month, revenue, n_orders,
               ROUND((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month), 6) AS mom_growth
        FROM m
    """,
    tags=("E8", "reporting"),
)
def monthly_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — the month-over-month growth report: monthly revenue and
    order counts with MoM percentage change via lag() — the KPI
    table every reporting layer materializes. The lag window runs
    unpartitioned ON THE MONTHLY ROLLUP (#months rows — a few dozen
    at any corpus size), which is the honest counterexample to the
    "no unpartitioned windows" rule: the input is bounded by the
    calendar, not the data — the exception class is centralized
    (rule, cap, allowlist) in ``operators/windows.py``
    ``UNPARTITIONED_WINDOW_ALLOWED``, which the fleet plan audit
    enforces. Revenue rounded to 4 dp before the
    ratio so both engines difference identical values."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        "revenue",
        "n_orders",
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w)) / F.lag("revenue").over(w), 6
        ).alias("mom_growth"),
    )


_CURATE_MAX_BITS = 12.0


@register(
    "pipeline_corpus_curation_v2",
    oracle=f"""
        WITH dd AS (
          SELECT doc_id, text, lang
          FROM (
            SELECT doc_id, text, lang,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
          ) WHERE rn = 1
        ),
        tok AS (
          SELECT doc_id, lang, u.w
          FROM dd, LATERAL unnest(string_split(text, ' ')) AS u(w)
        ),
        vocab AS (
          SELECT w, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM tok) AS p
          FROM tok GROUP BY w
        ),
        scored AS (
          SELECT t.doc_id, t.lang,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 -SUM(ln(v.p)) / COUNT(*) / ln(2) AS bits
          FROM tok t JOIN vocab v ON t.w = v.w
          GROUP BY t.doc_id, t.lang
        ),
        gated AS (SELECT * FROM scored WHERE bits <= {_CURATE_MAX_BITS}),
        per_lang AS (
          SELECT lang,
                 CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 ROUND(AVG(bits), 4) AS avg_bits
          FROM gated GROUP BY lang
        ),
        tot AS (SELECT SUM(n_tokens) AS total, COUNT(*) AS n_langs FROM per_lang)
        SELECT lang, n_docs_kept, n_tokens, avg_bits,
               ROUND(LEAST(1.0, (tot.total / tot.n_langs) / n_tokens), 6)
                 AS sample_weight,
               CAST(ROUND(n_tokens
                    * LEAST(1.0, (tot.total / tot.n_langs) / n_tokens), 0) AS BIGINT)
                 AS expected_tokens
        FROM per_lang, tot
    """,
    tags=("L1", "L6'", "L19", "composite", "pipeline"),
)
def pipeline_corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation v2, ONE declarative plan chaining three of the
    engine's pipeline stages end to end: exact dedup (keep lowest
    doc_id per content hash) → statistical quality gate (per-doc
    unigram bits/token under the DEDUPED corpus's own LM — the model
    must be fit after dedup or duplicated boilerplate poisons its
    probabilities) → uniform-token mixing weights over what survives,
    reported per language with expected post-sampling token counts.
    This is the recipe card a pre-training data run executes; v1
    (pipeline_training_data_prep) is the heuristic-era version.

    Scale: dedup is one md5-keyed window; the LM fit is one token agg
    + one vocab-keyed join (broadcast-or-shuffle per vocab size, as
    text_unigram_logprob_score documents); the mixing math runs on a
    |langs|-row frame with a 1-row totals broadcast. No stage
    materializes an intermediate — Catalyst fuses the whole recipe."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    dd = docs.withColumn("rn", rn).filter(F.col("rn") == 1).select("doc_id", "text", "lang")
    tok = dd.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    total_tokens = tok.count()
    vocab = tok.groupBy("w").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(total_tokens))).alias("p")
    )
    scored = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum(F.log("p")) / F.count(F.lit(1)) / F.lit(float(__import__("math").log(2)))).alias(
                "bits"
            ),
        )
    )
    per_lang = (
        scored.filter(F.col("bits") <= _CURATE_MAX_BITS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.avg("bits"), 4).alias("avg_bits"),
        )
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    weight = F.least(F.lit(1.0), (F.col("total") / F.col("n_langs")) / F.col("n_tokens"))
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs_kept",
        "n_tokens",
        "avg_bits",
        F.round(weight, 6).alias("sample_weight"),
        F.round(F.col("n_tokens") * weight, 0).cast("long").alias("expected_tokens"),
    )


@register(
    "parts_abc_classification",
    oracle="""
        WITH rev AS (
          SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS r
          FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
          SELECT l_partkey, r,
                 SUM(r) OVER (ORDER BY r DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   / SUM(r) OVER () AS cum_share
          FROM rev
        )
        SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(SUM(r), 4) AS revenue
        FROM ranked
        GROUP BY 1
    """,
    tags=("M3", "abc", "inventory"),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — ABC inventory classification: parts ranked by revenue,
    classed A (first 80% of cumulative share), B (to 95%), C (tail) —
    the stock-control segmentation that decides cycle-count frequency
    and safety stock per class. Deterministic cumsum order (revenue
    DESC, partkey); boundary parts belong to the class their OWN
    cumulative share reaches, both engines identically.

    Scale: the fact table reduces to per-part revenue first; the
    Lorenz cumsum runs through ``bucketed_rank_cumsum`` (sorts.py)
    — per-bucket windows + bucket-totals prefix sum, never an
    unpartitioned window — so the part dimension can outgrow one
    sort partition freely; the class report is 3 rows."""
    rev = load_table(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    numbered, _n, total_r = bucketed_rank_cumsum(
        rev, "r", ["l_partkey"], value_col="r", descending=True
    )
    ranked = numbered.select(
        "l_partkey", "r", (F.col("__cum") / F.lit(total_r)).alias("cum_share")
    )
    abc = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("r"), 4).alias("revenue"),
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
        WITH rev AS (
          SELECT s.s_nationkey, l.l_suppkey,
                 SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        ),
        shares AS (
          SELECT s_nationkey, r / SUM(r) OVER (PARTITION BY s_nationkey) AS share
          FROM rev
        )
        SELECT n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               ROUND(SUM(share * share) * 10000, 4) AS hhi
        FROM shares sh JOIN nation n ON sh.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    tags=("M4", "concentration", "hhi"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — Herfindahl–Hirschman supplier concentration per nation
    (sum of squared revenue shares × 10000, the antitrust scale:
    <1500 competitive, >2500 concentrated): the supply-chain-risk
    readout for single-supplier exposure. One fact-table join+agg to
    per-(nation, supplier) revenue; shares via a nation-partitioned
    window over that supplier-sized rollup; nation dim broadcasts
    for names.

    Scale: the only corpus-sized work is the lineitem⋈supplier agg
    (supplier dim broadcasts); everything after runs on
    |suppliers|-sized data. Share squaring before rounding keeps the
    float work identical in both engines (same rollup values, same
    window sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    share = F.col("r") / F.sum("r").over(Window.partitionBy("s_nationkey"))
    return (
        rev.select("s_nationkey", share.alias("share"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")) * 10000, 4).alias("hhi"),
        )
    )


@register(
    "customer_gini_coefficient",
    oracle="""
        WITH rev AS (
          SELECT o_custkey, SUM(o_totalprice) AS r FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT r, CAST(row_number() OVER (ORDER BY r, o_custkey) AS BIGINT) AS i
          FROM rev
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(2.0 * SUM(i * r) / (COUNT(*) * SUM(r))
                     - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
        FROM ranked
    """,
    tags=("M5", "inequality", "gini"),
)
def customer_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — Gini coefficient of customer revenue (0 = perfectly even,
    1 = one customer is everything): the single-number inequality
    companion to customer_pareto_share's 80/20 readout, computed by
    the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-
    sorted revenues with a deterministic tiebreak. Ranks come from
    ``bucketed_rank_cumsum`` (sorts.py) — the two-phase bucketed
    numbering, NOT a single-partition global window — so the rank
    pass runs one bucket per task even when the customer table
    outgrows one sort partition; ranks are exact integers, so the
    distributed form is bit-identical to the global window."""
    rev = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("r")
    )
    numbered, _n, _tot = bucketed_rank_cumsum(rev, "r", ["o_custkey"])
    ranked = numbered.select("r", F.col("__rn").alias("i"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.cast("long").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("r")) / (n * F.sum("r")) - (n + 1.0) / n, 6
        ).alias("gini"),
    )


@register(
    "pipeline_corpus_curation_v3",
    oracle="""
        WITH dd AS (
          SELECT doc_id, text, lang, source
          FROM (
            SELECT doc_id, text, lang, source,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
          ) WHERE rn = 1
        ),
        sh3 AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2])))) AS sh
          FROM dd WHERE len(string_split(text, ' ')) >= 3
        ),
        bench AS (SELECT DISTINCT sh FROM sh3 WHERE doc_id % 10 = 0),
        contaminated AS (
          SELECT t.doc_id FROM sh3 t JOIN bench USING (sh)
          WHERE t.doc_id % 10 <> 0
          GROUP BY t.doc_id
          HAVING COUNT(DISTINCT t.sh) >= 10
        ),
        kept AS (
          SELECT d.* FROM dd d
          WHERE d.doc_id % 10 <> 0
            AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        grams AS (
          SELECT k.doc_id, CAST(u.x AS BIGINT) AS pos,
                 md5(array_to_string(string_split(k.text, ' ')[u.x + 1 : u.x + 5], ' ')) AS gh
          FROM kept k, LATERAL unnest(generate_series(0, len(string_split(k.text, ' ')) - 5)) AS u(x)
          WHERE len(string_split(k.text, ' ')) >= 5
        ),
        dupg AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) > 1),
        hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (gh)),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN prev IS NULL OR pos - prev > 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
          FROM (SELECT doc_id, pos,
                       LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM hits)
        ),
        rep AS (
          SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS repeated_tokens
          FROM (SELECT doc_id, span_id, MAX(pos) - MIN(pos) + 5 AS n_tok
                FROM isl GROUP BY doc_id, span_id)
          GROUP BY doc_id
        ),
        raw AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_raw
                FROM documents GROUP BY source),
        per_doc AS (
          SELECT k.source,
                 CAST(len(string_split(k.text, ' ')) AS BIGINT) AS n_tokens,
                 COALESCE(r.repeated_tokens, 0) AS repeated
          FROM kept k LEFT JOIN rep r ON k.doc_id = r.doc_id
        ),
        rpt AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(SUM(repeated) AS BIGINT) AS n_repeated_tokens,
                 CAST(SUM(n_tokens) - SUM(repeated) AS BIGINT) AS effective_tokens
          FROM per_doc GROUP BY source
        )
        SELECT raw.source, raw.n_docs_raw, rpt.n_docs_kept, rpt.n_tokens,
               rpt.n_repeated_tokens, rpt.effective_tokens,
               ROUND(CAST(rpt.n_repeated_tokens AS DOUBLE) / rpt.n_tokens, 6)
                 AS cut_ratio
        FROM raw JOIN rpt ON raw.source = rpt.source
    """,
    tags=("L1", "L15", "L2'''''", "composite", "pipeline"),
)
def pipeline_corpus_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation v3 — ONE declarative plan chaining this
    round's machinery end to end, the way a pre-training data run
    composes it: exact dedup (keep lowest doc_id per content hash) →
    benchmark decontamination (drop training docs sharing >=10
    distinct 3-shingles with the held-out set — a thresholded overlap
    score, stricter pipelines use >0 as decontaminate_against_benchmark
    does — and the held-out docs themselves) → cross-document repeated-span accounting over what
    SURVIVES (spans must be recomputed post-filter: dropped docs'
    grams must not mark survivors as duplicated) → per-source report
    of raw/kept doc counts, token counts, repeated-token mass, and
    the effective token budget after span cutting. v2 covers the
    LM-quality/mixing half; v3 covers the dedup/contamination half.

    Scale: every stage is the already-audited shape — md5-keyed
    window, hashed-shingle broadcast join (lambda-bound token
    hashes, 8-byte keys), df>1 gram groupBy reusing its own key
    partitioning, per-doc islands, and two source-keyed aggregates.
    Catalyst fuses the recipe; nothing materializes driver-side."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    # dd/kept/grams each feed MULTIPLE consumers below; Spark re-executes
    # common subplans per consumer (no automatic CTE reuse), so without
    # caching the md5 dedup window would run 4x and gram hashing 2x —
    # at scale that is 4 extra full-corpus shuffles. cache() collapses
    # every reuse into one InMemoryRelation scan.
    dd = (
        docs.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source")
        .cache()
    )
    sh3 = dd.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                """array_distinct(
                     aggregate(array(split(text, ' ')), CAST(array() AS ARRAY<BIGINT>),
                       (acc, ts) -> aggregate(
                         array(transform(ts, t -> xxhash64(t))),
                         CAST(array() AS ARRAY<BIGINT>),
                         (a2, th) -> transform(sequence(0, size(th) - 3),
                                               i -> xxhash64(th[i], th[i+1], th[i+2])))))"""
            )
        ).alias("sh"),
    )
    bench = F.broadcast(sh3.filter(F.col("doc_id") % 10 == 0).select("sh").distinct())
    contaminated = (
        sh3.filter(F.col("doc_id") % 10 != 0)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("ns"))
        .filter(F.col("ns") >= 10)
        .select("doc_id")
    )
    kept = dd.filter(F.col("doc_id") % 10 != 0).join(
        contaminated, "doc_id", "left_anti"
    ).cache()

    grams = kept.filter(F.size(F.split("text", " ")) >= 5).select(
        "doc_id",
        F.posexplode(
            F.expr(
                """aggregate(array(transform(split(text, ' '), tk -> xxhash64(tk))),
                     CAST(array() AS ARRAY<BIGINT>),
                     (acc, th) -> transform(sequence(0, size(th) - 5),
                       i -> xxhash64(th[i], th[i+1], th[i+2], th[i+3], th[i+4])))"""
            )
        ).alias("pos", "gh"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "gh").cache()
    dupg = grams.groupBy("gh").agg(F.count_distinct("doc_id").alias("nd")).filter(F.col("nd") > 1)
    hits = grams.join(dupg.select("gh"), "gh").select("doc_id", "pos")
    wd = W.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "is_new",
        F.when(F.lag("pos").over(wd).isNull() | (F.col("pos") - F.lag("pos").over(wd) > 1), 1).otherwise(0),
    ).withColumn("span_id", F.sum("is_new").over(wd.rowsBetween(W.unboundedPreceding, W.currentRow)))
    rep = (
        isl.groupBy("doc_id", "span_id")
        .agg((F.max("pos") - F.min("pos") + 5).alias("n_tok"))
        .groupBy("doc_id")
        .agg(F.sum("n_tok").cast("long").alias("repeated"))
    )

    per_doc = (
        kept.select("doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .join(rep, "doc_id", "left")
        .select("source", "n_tokens", F.coalesce("repeated", F.lit(0)).alias("repeated"))
    )
    rpt = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("repeated").cast("long").alias("n_repeated_tokens"),
        (F.sum("n_tokens") - F.sum("repeated")).cast("long").alias("effective_tokens"),
    )
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs_raw"))
    return raw.join(rpt, "source").select(
        "source",
        "n_docs_raw",
        "n_docs_kept",
        "n_tokens",
        "n_repeated_tokens",
        "effective_tokens",
        F.round(F.col("n_repeated_tokens").cast("double") / F.col("n_tokens"), 6).alias(
            "cut_ratio"
        ),
    )


@register(
    "monthly_seasonal_decomposition",
    oracle="""
        WITH m AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 CAST(month(o_orderdate) AS INTEGER) AS moy,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2
        ),
        tr AS (
          SELECT month, moy, cents,
                 CASE WHEN COUNT(*) OVER w = 13
                      THEN 2 * SUM(cents) OVER w
                           - FIRST_VALUE(cents) OVER w
                           - LAST_VALUE(cents) OVER w
                 END AS e
          FROM m
          WINDOW w AS (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        ),
        si AS (
          SELECT moy,
                 CAST(SUM(24 * cents - e) AS DOUBLE)
                   / (COUNT(*) * 2400.0) AS seasonal
          FROM tr WHERE e IS NOT NULL GROUP BY moy
        )
        SELECT tr.month,
               CAST(tr.cents AS DOUBLE) / 100.0 AS revenue,
               CAST(tr.e AS DOUBLE) / 2400.0 AS trend,
               si.seasonal,
               CAST(tr.cents AS DOUBLE) / 100.0
                 - CAST(tr.e AS DOUBLE) / 2400.0 - si.seasonal AS residual
        FROM tr JOIN si ON tr.moy = si.moy
    """,
    tags=("E8'", "timeseries", "decomposition"),
)
def monthly_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue
    (the moving-average method of every intro forecasting text):
    trend = 13-month CENTERED moving average with half-weighted
    endpoints (the standard even-period 2x12 MA), seasonal index =
    mean detrended value per month-of-year, residual = the rest —
    the decomposition a demand-planning team reads before fitting
    anything fancier. Edge months (no full 13-month window) carry a
    NULL trend and are excluded from the seasonal fit, exactly as
    the textbook method prescribes.

    Scale: the fact table reduces to the monthly rollup FIRST; the
    centered-MA window runs unpartitioned ON THE ROLLUP — bounded by
    the calendar (allowlisted in ``operators/windows.py``
    ``UNPARTITIONED_WINDOW_ALLOWED``), not by data volume.

    Determinism (the sf0.1 lesson, completed r17 after a sf0.001
    cross-scale sweep caught the residue): EVERYTHING displayed
    derives from exact integers with ONE double division — monthly
    revenue as integer cents (order-insensitive), the 2x12 centered
    MA numerator e = 2*S13 - first - last kept integer, the seasonal
    index as SUM(24*cents - e) over n*2400 (one division of exact
    ints), and NO ROUND anywhere: Java's ROUND (BigDecimal shortest-
    repr HALF_UP) and C's (true-value) disagree whenever a quotient's
    shortest decimal lands on a 5-tie, so rounding identical doubles
    is itself a divergence source. Identical integer inputs + one
    IEEE division per value = bit-identical doubles on both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.month("o_orderdate").alias("moy"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("month").rowsBetween(-6, 6)
    tr = m.select(
        "month",
        "moy",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 13,
            2 * F.sum("cents").over(w)
            - F.first("cents").over(w)
            - F.last("cents").over(w),
        ).alias("e"),
    )
    si = (
        tr.filter(F.col("e").isNotNull())
        .groupBy("moy")
        .agg(
            (
                F.sum(24 * F.col("cents") - F.col("e")).cast("double")
                / (F.count(F.lit(1)) * 2400.0)
            ).alias("seasonal")
        )
    )
    revenue = F.col("cents").cast("double") / 100.0
    trend = F.col("e").cast("double") / 2400.0
    return tr.join(si, "moy").select(
        "month",
        revenue.alias("revenue"),
        trend.alias("trend"),
        "seasonal",
        (revenue - trend - F.col("seasonal")).alias("residual"),
    )


@register(
    "parts_xyz_classification",
    oracle="""
        WITH monthly AS (
          SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
                 SUM(l_quantity) AS q
          FROM lineitem GROUP BY 1, 2
        ),
        stats AS (
          SELECT l_partkey,
                 CAST(COUNT(*) AS BIGINT) AS n_months,
                 ROUND(AVG(q), 6) AS mean_q,
                 ROUND(COALESCE(stddev_samp(q), 0), 6) AS sd_q
          FROM monthly GROUP BY l_partkey
        ),
        classed AS (
          SELECT l_partkey, n_months, mean_q, sd_q,
                 ROUND(sd_q / mean_q, 6) AS cv,
                 CASE WHEN sd_q / mean_q < 0.5 THEN 'X'
                      WHEN sd_q / mean_q < 1.0 THEN 'Y'
                      ELSE 'Z' END AS xyz_class
          FROM stats
        )
        SELECT xyz_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(AVG(cv), 6) AS avg_cv,
               ROUND(AVG(mean_q), 6) AS avg_monthly_qty
        FROM classed GROUP BY xyz_class
    """,
    tags=("M3'", "xyz", "inventory"),
)
def parts_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — ABC's canonical
    companion (parts_abc_classification ranks by VALUE, XYZ ranks by
    PREDICTABILITY): coefficient of variation of monthly demand per
    part, classed X (CV<0.5, steady — forecast and automate), Y
    (<1.0, seasonal-ish), Z (erratic — safety stock or make-to-order).
    The ABC×XYZ grid is the planning matrix stock policies hang off.

    Scale: the fact table reduces to (part, month) demand in ONE
    shuffle; per-part stats and the 3-row class report are
    part-dimension aggregates. CV thresholds compare the same
    6-dp-rounded ratio in both engines; single-month parts get
    sd=0 → X (COALESCE both sides)."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(F.sum("l_quantity").alias("q"))
    stats = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.avg("q"), 6).alias("mean_q"),
        F.round(F.coalesce(F.stddev_samp("q"), F.lit(0.0)), 6).alias("sd_q"),
    )
    cv = F.col("sd_q") / F.col("mean_q")
    classed = stats.select(
        "mean_q",
        F.round(cv, 6).alias("cv"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz_class"),
    )
    return classed.groupBy("xyz_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("cv"), 6).alias("avg_cv"),
        F.round(F.avg("mean_q"), 6).alias("avg_monthly_qty"),
    )


@register(
    "scd2_history_compaction",
    # Four synthetic versions per key at +0/30/60/90 days whose price
    # level floor((key+k)/2) % 2 REPEATS for adjacent k on most keys —
    # genuine no-op updates, so compaction has real work to do. Prices
    # quantize by floor (ROUND ties at the half-cent split engines:
    # Spark HALF_UP vs DuckDB half-even — 19/37500 rows diverged).
    oracle="""
        WITH versions AS (
          SELECT o_orderkey,
                 o_orderdate + k.k * INTERVAL 30 DAY AS valid_from,
                 floor(o_totalprice * (10 + ((k.k + o_orderkey) // 2 % 2))) / 10
                   AS price
          FROM orders, LATERAL unnest(generate_series(0, 3)) AS k(k)
        ),
        runs AS (
          SELECT o_orderkey, valid_from, price,
                 SUM(CASE WHEN prev_price IS NULL OR prev_price <> price
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY o_orderkey ORDER BY valid_from
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          FROM (
            SELECT o_orderkey, valid_from, price,
                   LAG(price) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
                     AS prev_price
            FROM versions
          )
        ),
        compacted AS (
          SELECT o_orderkey, run_id, MIN(price) AS price,
                 MIN(valid_from) AS valid_from,
                 CAST(COUNT(*) AS BIGINT) AS n_merged
          FROM runs GROUP BY o_orderkey, run_id
        )
        SELECT o_orderkey, price, valid_from,
               LEAD(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
                 AS valid_to,
               n_merged
        FROM compacted
    """,
    tags=("W2''", "scd2", "compaction"),
)
def scd2_history_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version-chain compaction — the CDC hygiene job that keeps
    history tables honest: upstream feeds emit NO-OP updates (same
    value, new timestamp), bloating the chain and breaking
    change-count metrics; compaction merges each run of consecutive
    equal-valued versions into one validity interval (gaps-and-
    islands PARTITIONED BY key, break on value change), then
    re-derives valid_to by lead(). Output carries n_merged so the
    audit can report how much of the feed was no-ops. Composes with
    scd2_history_build (which builds from events) and
    scd2_point_in_time_join (which reads the result).

    Scale: one key-partitioned window pass over the version table +
    one per-run aggregate on the same key partitioning — never a
    global window; prices quantize by floor (unambiguous in IEEE,
    unlike ROUND's half-cent ties) so equality is engine-exact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    versions = o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        "o_totalprice",
        "o_orderdate",
    ).select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("make_interval(0, 0, 0, k * 30)")).alias("valid_from"),
        (
            F.floor(
                F.col("o_totalprice")
                * (10 + (F.floor((F.col("k") + F.col("o_orderkey")) / 2) % 2))
            )
            / 10
        ).alias("price"),
    )
    wk = Window.partitionBy("o_orderkey").orderBy("valid_from")
    runs = versions.withColumn("prev_price", F.lag("price").over(wk)).withColumn(
        "run_id",
        F.sum(
            F.when(
                F.col("prev_price").isNull() | (F.col("prev_price") != F.col("price")), 1
            ).otherwise(0)
        ).over(wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    compacted = runs.groupBy("o_orderkey", "run_id").agg(
        F.min("price").alias("price"),
        F.min("valid_from").alias("valid_from"),
        F.count(F.lit(1)).alias("n_merged"),
    )
    return compacted.select(
        "o_orderkey",
        "price",
        "valid_from",
        F.lead("valid_from").over(Window.partitionBy("o_orderkey").orderBy("valid_from")).alias(
            "valid_to"
        ),
        "n_merged",
    )


_DUP_PAY_DAYS = 30
_DUP_PAY_BIN_S = _DUP_PAY_DAYS * 86400


@register(
    "orders_duplicate_payment_detector",
    # Ground truth: brute-force self-join on (custkey, amount) with the
    # date-window predicate; the engine must find exactly these pairs
    # via time-bin blocking.
    oracle=f"""
        SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
               CAST(floor(a.o_totalprice / 5000) * 5000 AS BIGINT) AS amount_band,
               CAST(datediff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
                 AS days_apart
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND floor(a.o_totalprice / 5000) = floor(b.o_totalprice / 5000)
         AND a.o_orderkey < b.o_orderkey
         AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= {_DUP_PAY_DAYS}
    """,
    tags=("M6", "fraud", "duplicates"),
)
def orders_duplicate_payment_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection — the AP/fraud audit staple: two
    orders by the SAME customer in the SAME $5000 amount band within
    {_DUP_PAY_DAYS} days are double-charge suspects (band matching,
    not exact equality — real double-charges drift by fees/FX, and
    this corpus's synthetic prices are near-unique doubles). The temporal
    window makes this a band join; the scale plan blocks on
    (custkey, amount, 30-day time bin) with the probe side exploded
    to bins {{b-1, b, b+1}} (join_range_binned's recipe — any pair
    within the window shares an adjacent bin), then verifies the
    exact date predicate per candidate — never the full per-customer
    self-join whose fan-out is unbounded for busy accounts.

    Scale: the shuffle carries (custkey, amount, bin) keys —
    candidates are bounded by per-(cust, amount, bin) multiplicity;
    the brute per-customer join the oracle runs as ground truth
    degrades quadratically on exactly the hub accounts a fraud
    system cares most about."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    binned = o.withColumn(
        "bin",
        F.expr(f"datediff(o_orderdate, TIMESTAMP '1970-01-01') div {_DUP_PAY_DAYS}"),
    ).withColumn("band", F.floor(F.col("o_totalprice") / 5000))
    probe = binned.select(
        "o_custkey",
        "o_orderkey",
        "band",
        "o_orderdate",
        F.explode(F.expr("array(bin - 1, bin, bin + 1)")).alias("bin"),
    )
    a, b = probe.alias("a"), binned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(
            F.abs(F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))) <= _DUP_PAY_DAYS
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            (F.col("a.band") * 5000).alias("amount_band"),
            F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate")).cast("long").alias(
                "days_apart"
            ),
        )
        .dropDuplicates(["key_a", "key_b"])
    )


@register(
    "orders_gmv_daily_7dma",
    oracle="""
        WITH daily AS (
          SELECT date_trunc('day', o_orderdate) AS day,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS gmv,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT day, gmv, n_orders,
               ROUND(AVG(gmv) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS gmv_7dma,
               CAST(COUNT(*) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS window_days
        FROM daily
    """,
    tags=("E8''", "reporting", "movingavg"),
)
def orders_gmv_daily_7dma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily GMV with the trailing 7-day moving average — the
    revenue-dashboard headline that smooths day-of-week cycles
    (monthly_growth_rates' daily sibling; window_days exposes the
    ramp-in so the first 6 days read honestly). Rounded before
    averaging so both engines smooth identical values.

    Scale: the fact table reduces to the daily rollup first; the
    trailing window runs unpartitioned ON THE ROLLUP — bounded by
    the calendar (allowlisted in ``operators/windows.py``
    ``UNPARTITIONED_WINDOW_ALLOWED``), not by data."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4).alias("gmv"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "gmv",
        "n_orders",
        F.round(F.avg("gmv").over(w), 4).alias("gmv_7dma"),
        F.count(F.lit(1)).over(w).alias("window_days"),
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
