#!/usr/bin/env python
"""Round-17 scratch A/B: time a subset of bench queries under extra
Spark confs (passed as a JSON dict in $AB_CONFS). Same methodology as
bench.py (1 warm-up + best of 3, same actions). Prints one JSON line.

Usage:
  AB_CONFS='{"spark.driver.memory":"4g"}' python tools/scratch_ab_conf_r17.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    confs = json.loads(os.environ.get("AB_CONFS", "{}"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"

    from pyspark.sql import SparkSession

    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    # get_spark + extra confs (driver-memory style confs must be set
    # before the JVM launches, which builder.config achieves here
    # because no prior session exists in this process)
    builder_confs = dict(confs)
    if builder_confs:
        b = SparkSession.builder
        for k, v in builder_confs.items():
            b = b.config(k, v)
    spark = get_spark(app_name="hbdbps-ab")
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    timings: dict[str, float] = {}
    timings["calibration_jvm_canary"] = bench._measure_canary(spark)
    for name in names:
        fn = registry[name].fn
        action = bench.ACTION.get(name, "collect")
        bench.run_action(fn(spark, sf_dir), action)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            bench.run_action(fn(spark, sf_dir), action)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(v for k, v in timings.items() if k != "calibration_jvm_canary"), 4)
    print(json.dumps({"confs": confs, "total": total, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
