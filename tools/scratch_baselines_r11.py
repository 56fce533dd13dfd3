"""Round-11 baseline measurements (BASELINE.md method: one shared
session, shuffle=8, warm-up + best-of-3 collect) for the new rows'
like-for-like plain forms, where one exists:
- table_log_merge_upsert plain: recompute the post-merge snapshot from
  the SOURCE table by the merge-spec predicates (derivable only for
  these synthetic commits).
- table_log_schema_evolution plain: union-with-NULL recompute from the
  source (same caveat).
Run AFTER the engine ops have built their /tmp tables."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.session import get_spark
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

SF = "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
spark = get_spark(app_name="hbdbps-baselines-r11")
spark.sparkContext.setLogLevel("ERROR")
REG = load_all()


def best3(build):
    build().collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        build().collect()
        best = min(best, time.perf_counter() - t0)
    return best


def plain_merge():
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    merged = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(
            (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 4).isin(0, 2),
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")).alias("p"),
    ).unionAll(
        o.filter(F.col("o_orderkey") % 7 == 0).select(
            (-F.col("o_orderkey")).alias("k"), F.col("o_totalprice").alias("p")
        )
    )
    return (
        merged.select(
            F.when(F.col("k") < 0, F.lit(-1)).otherwise(F.col("k") % 4).cast("int").alias("bucket"),
            "k", "p",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("p") * 100).cast("long")).alias("sum_cents"),
            F.min("k").cast("long").alias("min_key"),
            F.max("k").cast("long").alias("max_key"),
        )
    )


def plain_schema():
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    snap = o.select(
        "o_orderkey", "o_totalprice", F.lit(None).cast("int").alias("o_flag")
    ).unionAll(
        o.filter(F.col("o_orderkey") % 5 == 2).select(
            "o_orderkey", "o_totalprice", (F.col("o_orderkey") % 2).cast("int").alias("o_flag")
        )
    )
    return (
        snap.select(F.coalesce("o_flag", F.lit(-1)).cast("int").alias("flag_bucket"), "o_orderkey", "o_totalprice")
        .groupBy("flag_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
    )


for name in ["table_log_merge_upsert", "table_log_schema_evolution",
             "table_log_incremental_read", "sim_search_ann_ivf_persisted", "sim_search_ann_ivf"]:
    t = best3(lambda n=name: REG[n].fn(spark, SF))
    print(f"engine {name}: {t:.3f}s")
print(f"plain merge recompute: {best3(plain_merge):.3f}s")
print(f"plain schema recompute: {best3(plain_schema):.3f}s")
spark.stop()
