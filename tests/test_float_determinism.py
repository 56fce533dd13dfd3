"""Order-insensitivity pins for the float-determinism fixes.

The r17 cross-scale sweeps found 13 queries whose displayed floats
depended on accumulation order or engine rounding conventions
(SURVEY §7 round-17 surplus). Each was rewritten to derive every
float from exact integer-scaled sums with one final IEEE division
(or exact integer frame keys). The property that establishes is
PARTITIONING-INVARIANCE: the canonical result must be bit-identical
no matter how Spark splits the data. These tests pin that directly —
the same query under 2 vs 32 shuffle partitions (and a repartitioned
input) must canon-compare equal — so an order-sensitive float
sneaking back in fails here without needing DuckDB or a second
corpus scale."""

import pytest

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import canon_frame

# every spec rewritten in the r17 determinism pass
FIXED = [
    "events_inter_arrival_stats",
    "monthly_seasonal_decomposition",
    "join_shuffle_hash_hint",
    "join_bloom_filtered",
    "win_moving_avg_time",
    "q19_disjunctive_brackets",
    "table_diff_snapshots",
    "cohort_ltv_curve",
    "agg_group",
    "agg_global",
    "join_broadcast",
    "unpivot_metrics_long",
]
# stream_moments_stateful is covered by its own oracle-parity row; its
# stateful drain is partition-order-free by the integer-triple algebra
# pinned in tests/test_streaming.py.


@pytest.mark.parametrize("name", FIXED)
def test_result_invariant_under_partitioning(spark, name):
    spec = load_all()[name]
    conf = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "32")
        wide = canon_frame(spec.fn(spark, SF_ORACLE).toPandas())
        spark.conf.set(conf, "2")
        narrow = canon_frame(spec.fn(spark, SF_ORACLE).toPandas())
    finally:
        spark.conf.set(conf, prev)
    assert wide[0] == narrow[0], f"{name}: column drift across partitioning"
    assert wide[1] == narrow[1], (
        f"{name}: values depend on partitioning — an order-sensitive "
        "float has crept back in (see tests/test_float_determinism.py "
        "docstring for the discipline)"
    )
