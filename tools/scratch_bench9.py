"""One-off round-9 scratch: engine timings for the three new ops at sf0.1."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NAMES = sys.argv[1:] or ["dedup_allpairs_prefix", "graph_hits", "feature_woe_iv"]
reg = load_all()
spark = get_spark(app_name="scratch-bench9")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for n in NAMES:
    print("RUNNING", n, flush=True)
    fn = reg[n].fn
    fn(spark, SF).collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF).collect()
        best = min(best, time.perf_counter() - t0)
    out[n] = round(best, 3)
print(json.dumps(out))
spark.stop()
