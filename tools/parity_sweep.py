#!/usr/bin/env python
"""Cross-scale ORACLE PARITY SWEEP: re-run every SQL-oracled registry
entry differentially against DuckDB at an arbitrary scale factor —
the same comparison the driver and tests/test_oracle_parity.py make
at sf0.01, but at a DIFFERENT data size, where accumulation-order
and rounding-boundary divergences invisible at one scale surface
(the r17 sweep at sf0.001 caught two last-ulp bugs this way:
events_inter_arrival_stats and monthly_seasonal_decomposition).

The quadratic ground-truth queries (documented brute-force oracles
whose design scale is the 500-doc corpus) run at their design scale
regardless of --sf-dir, and the substitution is printed — no silent
caps.

Usage: python tools/parity_sweep.py [--sf-dir /root/testdata/sf0.1]
Exit code 1 if any query mismatches.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# O(n^2)-by-contract ground truths: documents grows 10x at sf0.1 and
# the exact pair shapes take hours — same override set as bench_full
SF_OVERRIDE = {
    "dedup_ngram_jaccard": "/root/testdata/sf0.01",
    "dedup_connected_components": "/root/testdata/sf0.01",
    "dedup_cluster_keep_best": "/root/testdata/sf0.01",
    "dedup_cross_source_matrix": "/root/testdata/sf0.01",
    "dedup_embedding_cosine": "/root/testdata/sf0.01",
    "dedup_allpairs_prefix": "/root/testdata/sf0.01",
    # found by profiling every oracle at sf0.1 with an interrupt
    # watchdog (r17 surplus): these two ORACLES are super-linear —
    # the brute-force Jaccard ground truth (quadratic pairs) and the
    # recursive-CTE connected components (iterations x edges in one
    # SQL recursion); each ran >45 min against sf0.1 while every
    # other oracle finished the whole sweep in ~4 min. The SPARK
    # side of both is swept at full scale by bench_full.
    "dedup_minhash_lsh": "/root/testdata/sf0.01",
    "graph_cc_twophase": "/root/testdata/sf0.01",
}


def main() -> None:
    import faulthandler
    import signal

    # a wedged sweep answers `kill -USR1 <pid>` with a full Python
    # stack dump to stderr — diagnosis without killing the run
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    from pyspark.sql import SparkSession

    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    import tests.oracle as o

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = [s for s in load_all().values() if s.oracle is not None]
    fails: list[tuple[str, str]] = []
    t0 = time.time()
    for i, spec in enumerate(specs):
        q_sf = SF_OVERRIDE.get(spec.name, sf_dir)
        if q_sf != sf_dir:
            print(f"[parity_sweep] {spec.name}: design-scale override -> {q_sf}",
                  file=sys.stderr)
        t_spec = time.time()
        print(f"[parity_sweep] -> {i} {spec.name}", file=sys.stderr, flush=True)
        try:
            o.compare(spark, spec, q_sf)
        except Exception as e:
            fails.append((spec.name, f"{type(e).__name__}: {e}"[:300]))
        dt = time.time() - t_spec
        if dt > 10:
            # surface the expensive rows as they happen — a wedge is
            # attributable immediately instead of post-mortem
            print(f"[parity_sweep] slow: {spec.name} {dt:.0f}s",
                  file=sys.stderr, flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"[parity_sweep] {i + 1}/{len(specs)} "
                f"elapsed {round(time.time() - t0)}s fails {len(fails)}",
                file=sys.stderr, flush=True,
            )
    print(
        f"[parity_sweep] DONE {len(specs)} specs at {sf_dir}: "
        f"{len(specs) - len(fails)} pass, {len(fails)} fail "
        f"({round(time.time() - t0)}s)"
    )
    for n, e in fails:
        print(f"FAIL {n}: {e}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
