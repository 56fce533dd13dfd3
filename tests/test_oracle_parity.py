"""The correctness gate, run locally: every registered query with an
oracle is differentially checked against DuckDB at sf0.01 — the same
comparison the verify driver performs."""

import pytest

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare

SPECS = [spec for spec in load_all().values() if spec.oracle is not None]

# Suite-budget overrides (the round-8 verdict's "smaller fixtures for
# heavy parity cases" discipline), measured r09 when the parity file
# alone cost 495 s:
# - "DOC_SUBSET": the O(n²)-shaped document-pair queries cost the same
#   at every driver scale (documents is 500 rows at sf0.001 AND
#   sf0.01) — 165 s total; they run on the reduced pair-preserving
#   fixture built in conftest (~8× fewer pairs, near-dup structure
#   intact, loud staleness guard). The driver still checks them at
#   sf0.01, and test_llm_pipeline keeps the sf0.01 ground-truth
#   equality tests for the pruned variants.
# - SF_SMOKE: the dense-grid timeseries queries ARE data-bound
#   (events shrinks 10× at sf0.001; 15 s + 12 s -> ~2 s each),
#   verified non-vacuous there (10,500 grid rows).
_DOC_SUBSET = "DOC_SUBSET"
_PARITY_SF_OVERRIDE = {
    "dedup_connected_components": _DOC_SUBSET,
    "dedup_cluster_keep_best": _DOC_SUBSET,
    "dedup_ngram_jaccard": _DOC_SUBSET,
    "dedup_cross_source_matrix": _DOC_SUBSET,
    "dedup_allpairs_prefix": _DOC_SUBSET,
    "dedup_minhash_lsh": _DOC_SUBSET,
    "timeseries_resample_locf": SF_SMOKE,
    "timeseries_interpolate_linear": SF_SMOKE,
}


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec, sf_doc_subset):
    sf = _PARITY_SF_OVERRIDE.get(spec.name, SF_ORACLE)
    if sf == _DOC_SUBSET:
        sf = sf_doc_subset
    compare(spark, spec, sf)
