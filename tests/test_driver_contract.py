"""The verify driver imports __spark_entry__ into its OWN plain
SparkSession — no engine confs, no UTC pin, no nanos flag. Engine
sessions in this suite would mask a missing runtime conf (the events
TIMESTAMP(NANOS) trap), so this test runs the contract in a fresh
subprocess with a deliberately unconfigured session."""

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as se

rows = se.entry(spark).collect()
assert len(rows) >= 1, "entry() returned no rows"
qs, osql = se.queries(), se.oracle_sql()
assert set(osql) <= set(qs), "oracle keys must be a subset of query keys"
assert len(qs) >= 150, f"registry shrank: {len(qs)}"
# the queries most sensitive to session state: events-nanos ingest,
# streaming (symlink staging + memory sink), conf-snapshotting bloom,
# catalog writes
sf = "/root/testdata/sf0.001"
for name in ["window_tumbling", "stream_window_tumbling", "join_bloom_filtered",
             "catalog_managed_table_roundtrip", "fn_datetime"]:
    n = len(qs[name](spark, sf).collect())
    assert n > 0, f"{name} returned 0 rows"
print("DRIVER-CONTRACT-OK", len(qs), len(osql))
"""


def test_entry_contract_in_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "DRIVER-CONTRACT-OK" in proc.stdout
