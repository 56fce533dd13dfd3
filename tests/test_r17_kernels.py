"""Round-17 optimization-internals pins: the vectorized pair/kNN
kernels introduced by the r17 optimization round changed operator
INTERNALS (not results); these tests pin the internal invariants the
rewrites rely on, beyond the oracle-parity and recall pins that
already cover the outputs.

- block_pair_cosines: every unordered pair scored exactly once,
  canonically oriented — the no-dup/no-drop property the block-pair
  distribution must preserve for any block count.
- semantic-LSH bucket verify: cross-bucket duplicate rows are
  bit-identical, so the trailing distinct() collapses multiplicity
  exactly (the multiplicity-safety claim of the r17 rewrite).
- knn_label_vote: blocking-invariance — the exact per-block partial
  top-k merge yields the same votes under a different block count.
"""

import pyspark.sql.functions as F
import pytest

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

from tests.conftest import SF_ORACLE

REG = load_all()


def test_block_pair_cosines_scores_every_pair_exactly_once(spark):
    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        block_pair_cosines,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    pairs = block_pair_cosines(emb, -2.0).toPandas()  # threshold below any cosine
    assert len(pairs) == n * (n - 1) // 2, "pair multiset != all unordered pairs"
    assert (pairs["id_a"] < pairs["id_b"]).all(), "pairs not canonically oriented"
    assert len(pairs[["id_a", "id_b"]].drop_duplicates()) == len(pairs), "duplicate pair"


def test_semantic_lsh_cross_bucket_duplicates_are_bit_identical(spark):
    """Remove the trailing distinct and check that the only
    multiplicity in the bucket kernel's raw output is EXACT row
    duplication — same (id_a, id_b, cosine) doubles — never two
    different cosines for one pair (which would survive distinct()
    and break the subset-of-brute-force pin)."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        _semlsh_bucket_verify_kernel,
        _semlsh_sig_kernel,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    sig = emb.mapInPandas(
        _semlsh_sig_kernel(0), "vec_id long, band int, key int, side int"
    )
    vec = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    raw = (
        sig.join(vec, "vec_id")
        .groupBy("band", "key")
        .applyInPandas(
            _semlsh_bucket_verify_kernel(-2.0, False),
            "id_a long, id_b long, cosine double",
        )
        .toPandas()
    )
    per_pair = raw.groupby(["id_a", "id_b"])["cosine"].nunique()
    assert (per_pair == 1).all(), "a pair produced two distinct cosine doubles"
    assert (per_pair.index.get_level_values(0) < per_pair.index.get_level_values(1)).all()


@pytest.mark.parametrize("blocks", [3, 16])
def test_knn_label_vote_is_blocking_invariant(spark, monkeypatch, blocks):
    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_KNN_BLOCKS", blocks)
    got = sorted(
        map(tuple, REG["knn_label_vote"].fn(spark, SF_ORACLE).collect())
    )
    monkeypatch.setattr(sim, "_KNN_BLOCKS", 16)
    ref = sorted(
        map(tuple, REG["knn_label_vote"].fn(spark, SF_ORACLE).collect())
    )
    assert got == ref, f"votes changed under _KNN_BLOCKS={blocks}"
