"""Round-12 A/B for the one-job CoW rewrite (BASELINE.md §Round-12):
the per-affected-file write loop (the r11 form, reconstructed) vs the
staged single partitionBy(tgt) write (`_tlog_staged_write`).

Two fixtures, both sf0.1, fresh root per run, best-of-3:

  merge   — the real MERGE spec on the 4-slice table (2 affected
            files + 1 insert group). Measured: loop 0.995 s ->
            staged 0.624 s.
  files16 — a synthetic 16-file-group table, every group affected by
            the update join (the shape a real merge at scale has).
            Measured: loop 4.28 s -> staged 0.43 s (10x; the gap is
            linear in the affected-file count by construction).

Run:  python tools/scratch_ab_staged_rewrite_r12.py merge|files16
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

from hadoop_based_distributed_batch_processing_system_spark.operators import scans as S
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-staged-rewrite")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")


def bench(label, build, variants):
    for name, fn in variants:
        ts = []
        for _ in range(3):
            root = tempfile.mkdtemp(prefix=f"ab_{label}_{name}_")
            shutil.rmtree(root)
            build(root)
            t0 = time.perf_counter()
            fn(root)
            ts.append(time.perf_counter() - t0)
            shutil.rmtree(root, ignore_errors=True)
        print(label, name, [round(t, 3) for t in ts], "best", round(min(ts), 3))


def run_merge():
    spec = S._TLOG_MERGE_SPEC
    updates = orders.filter(
        (F.col("o_orderkey") % spec["update_every"] == 0)
        & (F.col("o_orderkey") % 4).isin(*spec["update_residues"])
    ).select("o_orderkey", (F.col("o_totalprice") + spec["price_bump"]).alias("new_price"))

    def loop_apply(root):  # the r11 shape, reconstructed
        base = S._tlog_latest_version(root)
        live = S._tlog_live_files(root, base)
        rel = S._tlog_relation(spark, live).withColumn(
            "file", F.regexp_extract(F.input_file_name(), S._TLOG_FILE_RE, 1)
        )
        affected = sorted(
            r["file"]
            for r in rel.join(F.broadcast(updates), "o_orderkey")
            .select("file").distinct().collect()
        )
        add = []
        for fname in affected:
            rw = (
                rel.filter(F.col("file") == fname).drop("file")
                .join(F.broadcast(updates), "o_orderkey", "left")
                .select("o_orderkey", F.coalesce("new_price", "o_totalprice").alias("o_totalprice"))
            )
            rw.write.mode("overwrite").parquet(os.path.join(root, f"{fname}_m1"))
            add.append(f"{fname}_m1")
        ins = orders.filter(F.col("o_orderkey") % spec["insert_every"] == 0).select(
            (-F.col("o_orderkey")).alias("o_orderkey"), "o_totalprice"
        )
        ins.write.mode("overwrite").parquet(os.path.join(root, "file_I_m1"))
        S._tlog_commit(root, add=add + ["file_I_m1"], remove=list(affected), base_version=base)

    bench(
        "merge",
        lambda root: S._tlog_build(spark, SF, root),
        [("loop", loop_apply), ("staged", lambda r: S._tlog_apply_merge(spark, SF, r))],
    )


def run_files16():
    ng = 16
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1.0).alias("new_price")
    )

    def build(root):
        os.makedirs(os.path.join(root, "_log"))
        for g in range(ng):
            orders.filter(F.col("o_orderkey") % ng == g).write.parquet(
                os.path.join(root, f"file_s{g}")
            )
        S._tlog_commit(root, add=[f"file_s{g}" for g in range(ng)], remove=[], base_version=-1)

    def loop(root):
        for g in range(ng):
            rel = spark.read.parquet(os.path.join(root, f"file_s{g}"))
            (
                rel.join(F.broadcast(updates), "o_orderkey", "left")
                .select("o_orderkey", F.coalesce("new_price", "o_totalprice").alias("o_totalprice"))
                .write.parquet(os.path.join(root, f"file_s{g}_m1"))
            )

    def staged(root):
        rel = spark.read.parquet(*[os.path.join(root, f"file_s{g}") for g in range(ng)])
        out = (
            rel.withColumn(
                "tgt",
                F.concat(F.regexp_extract(F.input_file_name(), S._TLOG_FILE_RE, 1), F.lit("_m1")),
            )
            .join(F.broadcast(updates), "o_orderkey", "left")
            .select("tgt", "o_orderkey", F.coalesce("new_price", "o_totalprice").alias("o_totalprice"))
        )
        S._tlog_staged_write(out, root, [f"file_s{g}_m1" for g in range(ng)])

    bench("files16", build, [("loop", loop), ("staged", staged)])


if __name__ == "__main__":
    {"merge": run_merge, "files16": run_files16}[sys.argv[1]]()
