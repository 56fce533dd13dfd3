"""The correctness gate, run locally: every registered query with an
oracle is differentially checked against DuckDB at sf0.01 — the same
comparison the verify driver performs."""

import pytest

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare

SPECS = [spec for spec in load_all().values() if spec.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec):
    compare(spark, spec, SF_ORACLE)
