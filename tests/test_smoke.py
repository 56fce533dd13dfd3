"""Driver-contract smoke tests: entry() runs and returns rows; every
registered query (oracle or not) executes at sf0.001."""

import pytest

import __spark_entry__ as se
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_SMOKE

REG = load_all()
ALL_SPECS = list(REG.values())


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


def test_codec_matrix_row_identical_and_sized(spark):
    """sink_compression_codecs: every codec must hold the same rows;
    uncompressed must be at least as large on disk as any codec."""
    pdf = REG["sink_compression_codecs"].fn(spark, SF_SMOKE).toPandas()
    assert set(pdf["codec"]) == {"snappy", "gzip", "zstd", "uncompressed"}
    assert pdf["n_rows"].nunique() == 1
    unc = int(pdf.loc[pdf["codec"] == "uncompressed", "n_bytes"].iloc[0])
    for _, r in pdf.iterrows():
        assert r["n_bytes"] <= unc or r["codec"] == "uncompressed"
