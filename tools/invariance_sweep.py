#!/usr/bin/env python
"""PARTITIONING-INVARIANCE SWEEP: run every registry query twice —
under 32 and under 2 shuffle partitions — and canon-compare the two
results. A mismatch means the query's output depends on Spark's
accumulation/merge order (the float-divergence class the r17
cross-scale sweeps surfaced; see tests/test_float_determinism.py),
caught here WITHOUT DuckDB and regardless of whether the spec has an
oracle — so rows-only entries get checked too.

Entries whose algorithms are merge-shape-dependent BY CONTRACT
(Misra-Gries summaries, reservoir/partition-census shapes) are
allowlisted with the reason printed — no silent caps.

Usage: python tools/invariance_sweep.py [--sf-dir /root/testdata/sf0.01]
Exit 1 if any non-allowlisted query varies.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# merge-shape-dependent BY CONTRACT — their pinned tests bound the
# error instead (sketch invariants, census shapes)
BY_NATURE = {
    "topk_heavy_hitters_mg": "Misra-Gries summary depends on merge shape",
    "stream_topk_mg_stateful": "Misra-Gries summary depends on merge shape",
    "sink_sorted_runs": "audits physical sort-run file layout",
    "sample_weighted_reservoir": "reservoir merge order changes the draw",
}
# (partitioner_hash / partitioner_range are NOT allowlisted: their
# censuses use explicit repartition(N, key) counts, independent of the
# shuffle conf — the sweep proved them invariant.)

# O(n^2)-by-contract ground truths: same design-scale override as the
# parity sweep
SF_OVERRIDE = {
    "dedup_ngram_jaccard": "/root/testdata/sf0.001",
    "dedup_connected_components": "/root/testdata/sf0.001",
    "dedup_cluster_keep_best": "/root/testdata/sf0.001",
    "dedup_cross_source_matrix": "/root/testdata/sf0.001",
    "dedup_embedding_cosine": "/root/testdata/sf0.001",
    "dedup_allpairs_prefix": "/root/testdata/sf0.001",
}


def main() -> None:
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)
    sf_dir = "/root/testdata/sf0.01"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    from pyspark.sql import SparkSession

    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from tests.oracle import canon_frame

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = list(load_all().values())
    fails: list[tuple[str, str]] = []
    skipped = 0
    t0 = time.time()
    conf = "spark.sql.shuffle.partitions"
    for i, spec in enumerate(specs):
        if spec.name in BY_NATURE:
            skipped += 1
            print(
                f"[invariance_sweep] by-nature skip: {spec.name} "
                f"({BY_NATURE[spec.name]})",
                file=sys.stderr, flush=True,
            )
            continue
        q_sf = SF_OVERRIDE.get(spec.name, sf_dir)
        if q_sf != sf_dir:
            print(
                f"[invariance_sweep] {spec.name}: design-scale override "
                f"-> {q_sf}",
                file=sys.stderr, flush=True,
            )
        t_spec = time.time()
        try:
            spark.conf.set(conf, "32")
            wide = canon_frame(spec.fn(spark, q_sf).toPandas())
            spark.conf.set(conf, "2")
            narrow = canon_frame(spec.fn(spark, q_sf).toPandas())
            if wide != narrow:
                n_bad = sum(1 for a, b in zip(wide[1], narrow[1]) if a != b)
                fails.append(
                    (spec.name,
                     f"cols_equal={wide[0] == narrow[0]} "
                     f"differing_rows~{n_bad}/{len(wide[1])}")
                )
                print(f"[invariance_sweep] VARIES: {spec.name}",
                      file=sys.stderr, flush=True)
        except Exception as e:
            fails.append((spec.name, f"{type(e).__name__}: {e}"[:200]))
            print(f"[invariance_sweep] ERROR: {spec.name}",
                  file=sys.stderr, flush=True)
        finally:
            spark.conf.set(conf, "32")
        dt = time.time() - t_spec
        if dt > 15:
            print(f"[invariance_sweep] slow: {spec.name} {dt:.0f}s",
                  file=sys.stderr, flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"[invariance_sweep] {i + 1}/{len(specs)} "
                f"elapsed {round(time.time() - t0)}s fails {len(fails)}",
                file=sys.stderr, flush=True,
            )
    print(
        f"[invariance_sweep] DONE {len(specs)} specs at {sf_dir}: "
        f"{len(specs) - len(fails) - skipped} invariant, {len(fails)} vary, "
        f"{skipped} by-nature ({round(time.time() - t0)}s)"
    )
    for n, e in fails:
        print(f"VARIES {n}: {e}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
