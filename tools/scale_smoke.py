#!/usr/bin/env python
"""One-off SCALE-UP SMOKE (VERDICT r16 #7): every committed BENCH is
sf0.1 (600k-row lineitem) and /root/testdata tops out there, so the
100 TB story rested entirely on plan audits. This script materializes
an ~sf1-EQUIVALENT corpus as the union of N key-shifted copies of
sf0.1 (each copy's keys offset into a disjoint range, so joins stay
per-copy and fan-out scales linearly — dims stay fixed-size, as they
do on a real lake), times the 10 BASELINE.md headline queries at both
scales, and reports the wall-clock ratio per query. A ratio well
above N on a fixed local[*] box flags a scale cliff (partition-count,
skew, driver materialization) the sf0.1 plan audit can't see; a
ratio near or below N is the linear-scan regime behaving.

Writes SCALE_SMOKE_r{N}.json and prints the ratio table.

Usage: python tools/scale_smoke.py [--copies 10]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import ACTION, _next_round, jvm_canary, run_action  # noqa: E402

SRC = "/root/testdata/sf0.1"

# keys shifted per copy into disjoint ranges (offset = copy * (max+1))
# so each copy is a self-contained TPC-H-ish world: joins match only
# within a copy, group cardinalities scale with data, dims are shared
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region"]  # fixed-size at any lake scale

# the 10 BASELINE.md headline queries (the per-round committed set)
HEADLINE10 = [
    "agg_group",
    "join_shipping_priority",
    "join_multiway",
    "agg_global",
    "agg_count_distinct_global",
    "win_rank_limited",
    "topk",
    "window_tumbling",
    "fn_json",
    "dedup_exact",
]

# documents' text is IDENTICAL across copies by construction, so
# dedup_exact sees a ~(N-1)/N duplicate rate — a harsher (and
# realistic) dedup workload, recorded here so the ratio row is read
# as "10x input, 90% dup rate", not as an anomaly.
NOTES = {
    "dedup_exact": "copies share text: ~90% duplicate rate at 10 copies",
}


def build_scaled(spark, dst: str, copies: int) -> None:
    import pyspark.sql.functions as F

    os.makedirs(dst, exist_ok=True)
    for table, keys in SHIFT_COLS.items():
        out = os.path.join(dst, f"{table}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        offsets = {
            k: int(v) + 1
            for k, v in df.agg(
                *[F.max(k).alias(k) for k in keys]
            ).collect()[0].asDict().items()
        }
        parts = []
        for i in range(copies):
            cp = df
            for k, span in offsets.items():
                cp = cp.withColumn(k, F.col(k) + F.lit(i * span))
            parts.append(cp)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(out)
        print(f"[scale_smoke] built {table} x{copies}", file=sys.stderr)
    for dim in DIMS:
        out = os.path.join(dst, f"{dim}.parquet")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            spark.read.parquet(os.path.join(SRC, f"{dim}.parquet")).write.mode(
                "overwrite"
            ).parquet(out)


def time_query(spark, spec, sf_dir: str, action: str) -> float:
    run_action(spec.fn(spark, sf_dir), action)  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_action(spec.fn(spark, sf_dir), action)
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    copies = 10
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    # r18 (VERDICT r17 #6): --queries lets the smoke cover named rows
    # beyond the headline 10 — used to take the iterative graph
    # operators' scaling floor from assertion to measurement.
    queries = HEADLINE10
    if "--queries" in sys.argv:
        queries = sys.argv[sys.argv.index("--queries") + 1].split(",")
    dst = os.path.join("/tmp", f"hbdbps_scale_x{copies}")

    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="hbdbps-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, dst, copies)

    run_action(jvm_canary(spark), "collect")
    t0 = time.perf_counter()
    run_action(jvm_canary(spark), "collect")
    canary = round(time.perf_counter() - t0, 4)

    rows = {}
    for name in queries:
        spec = registry[name]
        action = ACTION.get(name, "collect")
        base = time_query(spark, spec, SRC, action)
        scaled = time_query(spark, spec, dst, action)
        rows[name] = {
            "sf0_1_sec": base,
            "scaled_sec": scaled,
            "ratio": round(scaled / base, 2) if base > 0 else None,
            **({"note": NOTES[name]} if name in NOTES else {}),
        }
        print(
            f"[scale_smoke] {name}: {base}s -> {scaled}s "
            f"(x{rows[name]['ratio']})",
            file=sys.stderr,
            flush=True,
        )

    payload = {
        "metric": "headline10_scale_ratio",
        "copies": copies,
        "src_sf": 0.1,
        "equivalent_sf": round(0.1 * copies, 2),
        "calibration_jvm_canary": canary,
        "queries": rows,
        "provenance": {
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "shuffle_partitions": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"),
            "pid": os.getpid(),
        },
    }
    out = os.path.join(HERE, f"SCALE_SMOKE_r{_next_round()}.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: payload[k] for k in ("metric", "copies", "equivalent_sf")}))
    for n, r in rows.items():
        print(f"{n}: {r['sf0_1_sec']} -> {r['scaled_sec']} (x{r['ratio']})")
    print(f"[scale_smoke] wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
