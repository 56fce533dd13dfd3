"""DuckDB timings for the new ops' own oracle SQL at sf0.1 (best-of-3)."""
import sys, time, json, duckdb, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all

SF = "/root/testdata/sf0.1"
reg = load_all()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
out = {}
for n in sys.argv[1:]:
    sql = reg[n].oracle
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    out[n] = round(best * 1000)
print(json.dumps(out))
