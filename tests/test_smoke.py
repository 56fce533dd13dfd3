"""Driver-contract smoke tests: entry() runs and returns rows; every
registered query (oracle or not) executes at sf0.001."""

import pytest

import __spark_entry__ as se
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_SMOKE

ALL_SPECS = list(load_all().values())


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_driver_surface_shapes():
    qs = se.queries()
    os_ = se.oracle_sql()
    assert qs, "queries() must be non-empty"
    assert set(os_) <= set(qs), "every oracle key must be a query key"


@pytest.mark.parametrize("spec", ALL_SPECS, ids=[s.name for s in ALL_SPECS])
def test_query_executes_smoke(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
