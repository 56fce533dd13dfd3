#!/usr/bin/env python
"""Round-17 profiler: per bench query, count the Spark JOBS its
single execution launches (build + action), plus wall seconds. Jobs
are the unit of scheduling overhead at sf0.1 (~60-120 ms each), so
time >> jobs x floor flags genuine compute; time ~= jobs x floor
flags fixed-overhead-bound operators that only restructuring (fewer
actions/rounds) can speed up.

Usage: python tools/job_count_profile.py [name ...]   (default: all HEADLINE)
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"
    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    registry = load_all()
    if not names:
        names = [n for n in bench.HEADLINE if n in registry]
    spark = get_spark(app_name="hbdbps-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    out = {}
    for name in names:
        fn = registry[name].fn
        action = bench.ACTION.get(name, "collect")
        # warm-up (plan + IO cache + any one-time table pre-build)
        bench.run_action(fn(spark, sf_dir), action)
        group = f"prof:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        bench.run_action(fn(spark, sf_dir), action)
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        out[name] = {"sec": round(dt, 3), "jobs": len(jobs)}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL", json.dumps({
        "sec": round(sum(v["sec"] for v in out.values()), 2),
        "jobs": sum(v["jobs"] for v in out.values()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
