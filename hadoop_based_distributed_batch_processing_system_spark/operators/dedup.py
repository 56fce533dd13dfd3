"""Deduplication operators over ``documents`` / ``embeddings``
(SURVEY.md §2.11 L1/L2 + SimHash and embedding-cosine near-dup).

Scale design (the 100 TB story, per operator):

- ``dedup_exact``        — hash-groupBy; one shuffle on md5, perfectly
  distributable, no skew (hashes are uniform).
- ``dedup_ngram_jaccard``— brute-force O(n²) pair join, kept ONLY as
  the ground-truth oracle shape under an explicit size guard; the
  scale path is the LSH operator below.
- ``dedup_minhash_lsh``  — the real thing: shingle → 16 MinHashes →
  8 bands of 2 → candidates via an equi-join on (band, signature)
  (shuffle on band keys, linear in candidates, never all-pairs) →
  exact-Jaccard verification of candidates only.
- ``dedup_simhash``      — 64-bit SimHash per doc (pure expression,
  no UDF), candidates via the pigeonhole trick: split the signature
  into 4×16-bit chunks; any pair within Hamming distance 3 must
  agree on ≥1 chunk, so an equi-join on (chunk_idx, chunk_val) finds
  all of them without an all-pairs comparison.
- ``dedup_embedding_cosine`` — guarded brute-force at test scale; at
  100 TB the ANN operator in similarity.py provides the blocked path.

All signatures are computed with JVM-side higher-order functions
(``transform``/``aggregate``/``xxhash64``) — zero Python UDFs, whole
pipeline stays in codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
    load_table,
    parquet_row_count,
    spread_small_scan,
)

# LSH parameters: 16 MinHashes in 8 bands of 2 rows. Collision
# probability at Jaccard s is 1-(1-s²)⁸: ≈0.90 at s=0.5, ≈0.9998 at
# s=0.8, ≈1 at s=0.9 — tuned for the ≥0.5 threshold used below.
_NUM_HASHES = 16
_BAND_ROWS = 2
_NUM_BANDS = _NUM_HASHES // _BAND_ROWS
_JACCARD_THRESHOLD = 0.5
# ceiling for the O(n^2) ground-truth operators; scale paths take over past it
_BRUTE_FORCE_BOUND = 100_000

_SHINGLE_WIDTH = 3


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct 3-word shingles; docs with <3 tokens have no
    shingle and are excluded (matching the oracle's WHERE).

    The token array is bound as a LAMBDA VARIABLE (fold over a
    1-element array — a pure-SQL `let`): lambda variables evaluate
    exactly once per row, whereas an aliased projection column gets
    re-INLINED into every reference by CollapseProject, so the naive
    `slice(split(text), i, 3)` form re-splits the text per shingle —
    O(tokens × text_len) per row, measured 2.7 s vs 0.3 s at
    sf0.1.

    r18: the raw scan is spread across cores when it arrives as an
    unsplittable single task (``spread_small_scan``, guide §2.6) —
    the shingling itself is the expensive stage and was serializing
    on one core locally; at scale the scan splits naturally and the
    spread is a no-op."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    return (
        docs.filter(F.size(toks) >= _SHINGLE_WIDTH)
        .select(
            "doc_id",
            F.expr(
                f"""array_distinct(
                  aggregate(array(split(text, ' ')), CAST(array() AS ARRAY<STRING>),
                    (acc, ts) -> transform(
                      sequence(1, size(ts) - {_SHINGLE_WIDTH - 1}),
                      i -> concat_ws(' ', slice(ts, i, {_SHINGLE_WIDTH})))))"""
            ).alias("sh"),
        )
    )


def _shingles_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct xxhash64'd 3-shingles (array<long>). The LSH
    internals never need the shingle text — hash each TOKEN once,
    then a shingle is one 3-long hash combine. Downstream arrays are
    8 bytes/element and set ops are integer compares. Jaccard over
    hashed shingles equals Jaccard over strings absent 64-bit
    collisions (~1e-13 here).

    Both the token array and the token-hash array are bound as
    LAMBDA VARIABLES (nested 1-element-array folds — pure-SQL
    `let`s): a lambda variable evaluates once per row, while an
    aliased projection column is re-INLINED into every reference by
    CollapseProject — the aliased form re-ran the whole token-hash
    transform per th[i] lookup, O(tokens²) hashing per row (measured
    4.7 s vs 0.3 s at sf0.1).

    r18: scan spread across cores when it arrives as a single
    unsplittable task (``spread_small_scan``, guide §2.6) — the
    token+shingle hashing serialized on one core locally; no-op at
    scale."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    return (
        docs.filter(F.size(toks) >= _SHINGLE_WIDTH)
        .select(
            "doc_id",
            F.expr(
                f"""array_distinct(
                  aggregate(array(split(text, ' ')), CAST(array() AS ARRAY<BIGINT>),
                    (acc, ts) -> aggregate(
                      array(transform(ts, t -> xxhash64(t))),
                      CAST(array() AS ARRAY<BIGINT>),
                      (acc2, th) -> transform(
                        sequence(0, size(th) - {_SHINGLE_WIDTH}),
                        i -> xxhash64(th[i], th[i+1], th[i+2])))))"""
            ).alias("sh"),
        )
    )


_ORACLE_SHINGLES = f"""
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - {_SHINGLE_WIDTH - 1}),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                     string_split(text, ' ')[i + 1],
                                     string_split(text, ' ')[i + 2]))) AS sh
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_SHINGLE_WIDTH}
"""


# Loud per-bucket ceiling for the in-bucket pair-verify kernels
# (VERDICT r17 #4, guide §5): a kernel-side bucket/block materializes
# in ONE task's memory and enumerates O(n²) pairs — the old join
# shapes spilled, a kernel cannot. A bucket past this cap means the
# corpus holds thousands of near-identical members in one LSH bucket /
# block; the fix at scale is upstream exact-dedup or bucket salting,
# not a silent OOM. 8192 members ⇒ ≤ 33.5M pairs ⇒ the pair arrays
# stay well under 1 GB per task.
_BUCKET_VERIFY_CAP = 8192


def _minhash_segment_verify():
    """Bucket-local exact-Jaccard verify (r18, the semantic-LSH
    bucket device carried to MinHash banding): consumes the
    hash-partitioned (band_idx, band_sig, doc_id, sh) membership
    stream — every bucket is whole within its partition because the
    upstream exchange partitions on exactly those keys — sorts the
    partition once, and enumerates each multi-member bucket's pairs
    with C-speed frozenset ops. ONE kernel call per partition (a
    per-GROUP applyInPandas was measured at ~2.7 ms/group × 2043
    groups = 5.6 s of pure per-group overhead at sf0.1).

    Exactness: len(a∩b)/len(a∪b) divides the SAME integers as the
    retired JVM ``array_intersect``/``array_union`` verify, so a pair
    colliding in several bands yields bit-identical rows and the
    trailing ``distinct()`` collapses the multiplicity exactly."""

    def run(batches):
        import numpy as np
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        order = np.lexsort((pdf["band_sig"].to_numpy(), pdf["band_idx"].to_numpy()))
        bi = pdf["band_idx"].to_numpy()[order]
        bs = pdf["band_sig"].to_numpy()[order]
        ids = pdf["doc_id"].to_numpy()[order]
        sh = pdf["sh"].to_numpy()[order]
        new = np.flatnonzero((bi[1:] != bi[:-1]) | (bs[1:] != bs[:-1])) + 1
        starts = np.concatenate(([0], new, [len(bi)]))
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n < 2:
                continue
            if n > _BUCKET_VERIFY_CAP:
                raise ValueError(
                    f"degenerate LSH bucket: (band_idx={bi[s]}, band_sig={bs[s]}) holds "
                    f"{n} members (> {_BUCKET_VERIFY_CAP} cap) — the corpus has that many "
                    "near-identical docs in one bucket; exact-dedup upstream or salt the band key"
                )
            sets = [frozenset(x) for x in sh[s:e]]
            gid = ids[s:e]
            for i in range(n):
                si = sets[i]
                li = len(si)
                for j in range(i + 1, n):
                    sj = sets[j]
                    inter = len(si & sj)
                    if not inter:
                        continue
                    jac = inter / (li + len(sj) - inter)
                    if jac >= _JACCARD_THRESHOLD:
                        a, b = gid[i], gid[j]
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(jac)
        yield pd.DataFrame(
            {
                "id_a": np.array(out_a, dtype="int64"),
                "id_b": np.array(out_b, dtype="int64"),
                "jaccard": np.array(out_j, dtype="float64"),
            }
        )

    return run


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    tags=("L1",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — exact dedup by content hash: group on md5(text), keep the
    smallest doc_id per group. One uniform-key shuffle; the classic
    dedup-MR pattern and the first pass of every training-data
    pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES})
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM tok a, tok b
          WHERE a.doc_id < b.doc_id
        )
        WHERE jaccard >= {_JACCARD_THRESHOLD}
    """,
    tags=("L2", "ground-truth"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup, brute force: all doc pairs, exact
    Jaccard on distinct 3-shingles, threshold 0.5.

    SIZE GUARD: O(n²) pairs — this shape is the ground truth for the
    LSH operator and is only valid at corpus sizes where n² fits a
    shuffle (raises beyond 100k docs). At scale use
    ``dedup_minhash_lsh``, which finds the same pairs via banding.

    r17 (guide §4.2, the ``block_pair_cosines`` layout): pairs come
    from B(B+1)/2 block-pair tasks whose kernels hold one frozenset
    per doc and intersect each pair ONCE in C-speed set ops, instead
    of a cartesian plan evaluating JVM ``array_intersect`` +
    ``array_union`` (each builds per-ROW hash sets — measured
    ~80 µs/pair) for every pair. Jaccard doubles are identical:
    len(a∩b)/len(a∪b) divides the same exact integers. Measured
    9.9 s → 1.9 s at the sf0.01 sweep scale;
    ``dedup_cross_source_matrix`` (8.9 s → 2.1 s) decorates this
    pair stream and inherits the win."""
    tok = _shingles(spark, sf_dir)
    n = tok.count()
    if n > _BRUTE_FORCE_BOUND:
        raise ValueError(f"brute-force jaccard guard: {n} docs would make {n * n // 2} pairs; use dedup_minhash_lsh")
    blocks = _BLOCK_PAIR_BLOCKS
    ab = (
        tok.select(
            "doc_id",
            "sh",
            # pmod, not %: sign-preserving % drops same-block pairs
            # among negative ids (ADVICE r17); identical for the
            # non-negative ids of this corpus.
            F.pmod(F.col("doc_id"), F.lit(blocks)).alias("own_blk"),
            F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("other_blk"),
        )
        .select(
            "doc_id",
            "sh",
            "own_blk",
            F.least("own_blk", "other_blk").alias("blk_lo"),
            F.greatest("own_blk", "other_blk").alias("blk_hi"),
        )
        .dropDuplicates(["doc_id", "blk_lo", "blk_hi"])
    )
    return ab.groupBy("blk_lo", "blk_hi").applyInPandas(
        _block_pair_jaccard_kernel(), "id_a long, id_b long, jaccard double"
    )


def _block_pair_jaccard_kernel():
    """One block-pair task of the brute-force Jaccard ground truth:
    frozensets per doc, each unordered pair intersected once in
    C-speed set ops (module-level so the loud pair-count guard is
    unit-testable without a Spark job)."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
        lo = int(pdf["blk_lo"].iloc[0])
        hi = int(pdf["blk_hi"].iloc[0])
        ids = pdf["doc_id"].to_numpy()
        own = pdf["own_blk"].to_numpy()
        if lo == hi:
            n_pairs = len(ids) * (len(ids) - 1) // 2
        else:
            n_pairs = int((own == lo).sum()) * int((own == hi).sum())
        if n_pairs > _BLOCK_PAIR_MAX_PAIRS:
            raise ValueError(
                f"block pair ({lo},{hi}) would enumerate {n_pairs} pairs "
                f"(> {_BLOCK_PAIR_MAX_PAIRS}) in one task — raise the block "
                "count or pre-dedup; refusing to materialize"
            )
        sets = [frozenset(sh) for sh in pdf["sh"]]
        if lo == hi:
            ai, bi = np.triu_indices(len(ids), k=1)
        else:
            la = np.where(own == lo)[0]
            lb = np.where(own == hi)[0]
            if not len(la) or not len(lb):
                return empty
            ai, bi = np.meshgrid(la, lb, indexing="ij")
            ai, bi = ai.ravel(), bi.ravel()
        if not len(ai):
            return empty
        out_a, out_b, out_j = [], [], []
        for i, j in zip(ai, bi):
            si, sj = sets[i], sets[j]
            inter = len(si & sj)
            if not inter:
                continue
            jac = inter / (len(si) + len(sj) - inter)
            if jac >= _JACCARD_THRESHOLD:
                a_id, b_id = ids[i], ids[j]
                if a_id > b_id:
                    a_id, b_id = b_id, a_id
                out_a.append(a_id)
                out_b.append(b_id)
                out_j.append(jac)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.array(out_a, dtype="int64"),
                "id_b": np.array(out_b, dtype="int64"),
                "jaccard": np.array(out_j, dtype="float64"),
            }
        )

    return run


@register(
    "dedup_minhash_lsh",
    # The oracle is the BRUTE-FORCE ground truth: at oracle scale the
    # banding has perfect recall on this corpus (pinned by
    # test_minhash_lsh_matches_ground_truth, P[miss] ≈ 2e-6 per planted
    # pair), and verification recomputes exact Jaccard, so the LSH path
    # must reproduce the exact result set, values included.
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES})
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM tok a, tok b
          WHERE a.doc_id < b.doc_id
        )
        WHERE jaccard >= {_JACCARD_THRESHOLD}
    """,
    tags=("L2",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — MinHash-LSH near-dedup, the 100 TB path:

    1. 3-word shingles per doc (narrow map);
    2. 16 MinHash slots: min over shingles of a salted xxhash64
       (pure expression — one pass over the shingle array per slot);
    3. 8 bands of 2 slots, band signature = xxhash64 of the pair;
    4. candidate pairs = equi-self-join on (band_idx, band_sig) —
       a hash shuffle on band keys, NEVER an all-pairs product;
    5. verify candidates with exact Jaccard; emit pairs ≥ 0.5.

    Output equals the brute-force operator's output minus LSH false
    negatives (P[miss] = (1-s²)⁸, ≈2e-6 at the s≥0.9 the corpus
    plants); the pytest invariant pins candidates ⊆ ground truth and
    recall on the planted near-dups."""
    tok = _shingles_hashed(spark, sf_dir)

    # r18 (guide §2.4/§4.2; the r17 semantic-LSH bucket pattern
    # carried to MinHash banding). The r17 shape paid FOUR
    # computations of the shingle pipeline — the band self-join
    # re-executed the whole 16-slot signature subtree for its second
    # side (+0.65 s of the 1.56 s total at sf0.1), and the verify
    # re-joined the shingle ARRAYS onto both sides of every
    # candidate. Now the corpus is scanned and shingled ONCE: the
    # signatures keep the shingle array alongside (the banding
    # explode carries it — a BOUNDED 8× of the shingle bytes, unlike
    # the retired per-CANDIDATE array attach, which duplicated
    # arrays per collision and is why the r12 note banned arrays in
    # the candidate shuffle), one exchange on (band_idx, band_sig)
    # makes every bucket whole within a partition, and a partition-
    # wise kernel enumerates + exact-verifies each bucket's pairs in
    # C-speed set ops. Candidate rule unchanged (pair ⟺ shared
    # (band, sig) bucket — same signatures, same salts), Jaccard
    # divides the same exact integers, cross-band duplicates are
    # bit-identical rows collapsed by distinct().
    # Measured (interleaved A/B, same session): old join form
    # 0.885 s median / new 0.813 s at sf0.1 with the scan spread in
    # place for both — the decisive local win is the spread (1.56 s
    # → ~0.8 s; the sig stage was serializing on the 1-task scan);
    # this shape additionally removes 3 of the 4 corpus passes and
    # both per-candidate set-attach joins from the plan
    # (plans/r18/dedup_minhash_lsh_{before,after}.txt). A fully
    # vectorized numpy MinHash kernel (exact XXH64 reimplementation,
    # validated bit-identical on 100k values) was built and measured
    # SLOWER than the JVM sig fold once the scan was spread
    # (0.94 s median vs 0.81) — rejected, JVM sigs stay.
    sigs = tok.select(
        "doc_id",
        "sh",
        *[
            # Salt choice matters: multi-arg salting (xxhash64(h, i) /
            # xxhash64(i, h)) leaves the 16 slots argmin-correlated —
            # planted pairs get silently missed (measured). XORing a
            # per-slot odd constant into the INPUT before hashing does
            # decorrelate (each slot hashes a different 64-bit value
            # through full avalanche): pair sets identical to the
            # string-salted variant at sf0.01 and sf0.1, with perfect
            # recall vs brute force — at half the cost (no long→string
            # conversion + concat per shingle per slot; 3.2s→1.7s at
            # sf0.1).
            F.array_min(
                F.expr(
                    f"transform(sh, h -> xxhash64(h ^ "
                    f"{(0x9E3779B97F4A7C15 * (i + 1)) & 0x7FFFFFFFFFFFFFFF}L))"
                )
            ).alias(f"mh_{i}")
            for i in range(_NUM_HASHES)
        ],
    )
    memberships = sigs.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(*[f"mh_{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS)]).alias("band_sig"),
                    )
                    for b in range(_NUM_BANDS)
                ]
            )
        ).alias("band"),
    ).select("band.band_idx", "band.band_sig", "doc_id", "sh")
    return (
        memberships.repartition("band_idx", "band_sig")
        .mapInPandas(_minhash_segment_verify(), "id_a long, id_b long, jaccard double")
        .distinct()
    )


_SIMHASH_MAX_HAMMING = 3
_SIMHASH_CHUNKS = 4  # pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 16-bit chunks equal


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → 64-bit SimHash signature (per-bit majority vote over
    token xxhash64 bits, token multiset weighting).

    Implementation: explode token hashes, then 64 plain SUM
    aggregates (one per bit) in a single groupBy — flat columns keep
    the whole thing inside whole-stage codegen with map-side partial
    aggregation, vs. ~6× slower nested higher-order-function lambdas
    (interpreted per element). Bit j set iff ones-count > half the
    tokens; ties (2·ones == n) vote 0.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the per-token hashing and the
    64-column partial aggregation serialized on one core locally;
    exact integer sums, so partitioning cannot move the result."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    tok_hashes = docs.select(
        "doc_id", F.explode(F.expr("transform(split(text, ' '), t -> xxhash64(t))")).alias("h")
    )
    counts = tok_hashes.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"b{j}") for j in range(64)],
    )
    sig = " | ".join(f"IF(2 * b{j} > n, shiftleft(1L, {j}), 0L)" for j in range(64))
    return counts.select("doc_id", F.expr(sig).alias("sig"))


def _simhash_segment_verify(max_hamming: int):
    """Chunk-bucket SimHash verify (r18, the MinHash segment device):
    consumes the hash-partitioned (chunk_idx, chunk_val, doc_id, sig)
    membership stream — buckets whole per partition by the upstream
    exchange — and emits each multi-member bucket's pairs within the
    Hamming radius. Popcount is a vectorized SWAR fold over the
    xor'd signatures (exact integer bit math, identical to the JVM
    ``bit_count``), pairs are canonically oriented, and a pair
    sharing several chunks yields bit-identical rows for the
    trailing ``distinct()``. Replaces the chunk SELF-JOIN, whose
    broadcast build side re-executed the ENTIRE per-token signature
    pipeline a second time (no exchange reuse across a broadcast —
    verified in the before-plan: 2 scans, 6 HashAggregates)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        order = np.lexsort((pdf["chunk_val"].to_numpy(), pdf["chunk_idx"].to_numpy()))
        ci = pdf["chunk_idx"].to_numpy()[order]
        cv = pdf["chunk_val"].to_numpy()[order]
        ids = pdf["doc_id"].to_numpy()[order]
        sigs = pdf["sig"].to_numpy()[order]
        new = np.flatnonzero((ci[1:] != ci[:-1]) | (cv[1:] != cv[:-1])) + 1
        starts = np.concatenate(([0], new, [len(ci)]))
        out_a, out_b, out_h = [], [], []
        m1 = np.uint64(0x5555555555555555)
        m2 = np.uint64(0x3333333333333333)
        m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
        h01 = np.uint64(0x0101010101010101)
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n < 2:
                continue
            if n > _BUCKET_VERIFY_CAP:
                raise ValueError(
                    f"degenerate SimHash bucket: (chunk_idx={ci[s]}, chunk_val={cv[s]}) "
                    f"holds {n} members (> {_BUCKET_VERIFY_CAP} cap) — exact-dedup "
                    "upstream or widen the chunk"
                )
            ai, bi = np.triu_indices(n, k=1)
            gid = ids[s:e]
            gsig = sigs[s:e]
            x = (gsig[ai] ^ gsig[bi]).view(np.uint64)
            x = x - ((x >> np.uint64(1)) & m1)
            x = (x & m2) + ((x >> np.uint64(2)) & m2)
            x = (x + (x >> np.uint64(4))) & m4
            ham = ((x * h01) >> np.uint64(56)).astype(np.int64)
            keep = ham <= max_hamming
            if not keep.any():
                continue
            a = gid[ai[keep]]
            b = gid[bi[keep]]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_h.append(ham[keep])
        empty = np.array([], dtype="int64")
        yield pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else empty,
                "id_b": np.concatenate(out_b) if out_b else empty,
                "hamming": (np.concatenate(out_h) if out_h else empty).astype("int32"),
            }
        )

    return run


@register("dedup_simhash", tags=("L2", "simhash"))  # rows-only: bit-level hashing is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature per doc (per-bit majority
    vote over token xxhash64 bits — nested higher-order functions,
    no UDF), then pairs within Hamming distance 3.

    Candidate generation is the standard pigeonhole blocking: split
    each signature into 4 16-bit chunks; a pair with ≤3 differing
    bits must match on at least one whole chunk, so an equi-join on
    (chunk_idx, chunk_val) is exhaustive for the radius while staying
    a linear hash shuffle — the same plan shape at 5k docs and 5B."""
    sigs = simhash_signatures(spark, sf_dir)
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.expr(f"shiftrightunsigned(sig, {16 * c}) & 65535").alias("chunk_val"),
                    )
                    for c in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk"),
    ).select("doc_id", "sig", "chunk.chunk_idx", "chunk.chunk_val")

    # r18: chunk-bucket segment verify instead of the self-join —
    # the broadcast build side re-executed the whole signature
    # pipeline a second time (see _simhash_segment_verify).
    return (
        chunks.select("chunk_idx", "chunk_val", "doc_id", "sig")
        .repartition("chunk_idx", "chunk_val")
        .mapInPandas(
            _simhash_segment_verify(_SIMHASH_MAX_HAMMING),
            "id_a long, id_b long, hamming int",
        )
        .distinct()
    )


_COSINE_DUP_THRESHOLD = 0.3  # testdata embeddings are near-orthogonal random
# vectors (max pairwise cosine ≈ 0.51); a production near-dup pass would use
# ~0.95 — the threshold is a parameter, the plan shape is what's under test.


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        SELECT id_a, id_b, cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
          FROM embeddings a, embeddings b
          WHERE a.vec_id < b.vec_id
        )
        WHERE cosine >= {_COSINE_DUP_THRESHOLD}
    """,
    tags=("L2", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all vector pairs above a cosine
    threshold.

    SIZE GUARD: brute-force O(n²) — ground-truth shape only (raises
    beyond 100k vectors). The scale path is sim_search_ann_lsh's
    hyperplane bucketing followed by this same verification.

    r17 (guide §4.2, the ``sim_search_topk_blas`` block layout): the
    O(n²) per-pair interpreted zip_with/aggregate cosine fold is
    replaced by {_BLOCK_PAIR_BLOCKS}·({_BLOCK_PAIR_BLOCKS}+1)/2
    block-pair tasks whose kernels compute EXACTLY one row-wise
    ``einsum`` dot per pair — never a shape-dependent GEMM, so every
    cosine is a fixed-order 64-term reduction that depends only on
    the pair itself; the LSH rungs' verify kernels compute the
    IDENTICAL double for the same pair (bit-equality pytest-pinned).
    Measured 26.2 s (r16 full-sweep) → 1.5 s on the 2000-vector
    sf0.1 corpus (noop sink); data movement is O(n·B), each unordered
    pair scored in exactly one task, threshold applied in-kernel so
    only survivors leave Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    # guard on footer metadata (exact, no Spark job) — the knn_label_vote device
    n = parquet_row_count(sf_dir, "embeddings")
    if n > _BRUTE_FORCE_BOUND:
        raise ValueError(f"brute-force cosine guard: {n} vectors; use sim_search_ann_lsh")
    return block_pair_cosines(emb, _COSINE_DUP_THRESHOLD)


_BLOCK_PAIR_BLOCKS = 8
# Loud in-kernel ceilings (VERDICT r17 #4, guide §5): a block-pair /
# bucket task enumerates its pairs in ITS OWN memory — joins spilled,
# kernels cannot. 50M pairs keeps the id/cosine arrays ~1.2 GB; the
# per-pair einsum gathers are chunked so their transient copies stay
# ~1 GB regardless of pair count.
_BLOCK_PAIR_MAX_PAIRS = 50_000_000
_PAIR_EINSUM_CHUNK = 1_000_000


def block_pair_cosines(emb: DataFrame, threshold: float) -> DataFrame:
    """All-pairs exact cosines ≥ threshold over (vec_id, embedding),
    as B(B+1)/2 block-pair tasks with per-pair einsum dots (the
    deterministic sibling of ``sim_search_topk_blas``'s GEMM — same
    distribution, reproducible per-pair doubles)."""
    blocks = _BLOCK_PAIR_BLOCKS
    ab = (
        emb.select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
            # pmod, not %: Spark's % is sign-preserving, so a negative
            # vec_id would land in a block no pair enumeration covers
            # and its pairs would be silently dropped (ADVICE r17).
            # Identical to % for the non-negative ids of this corpus.
            F.pmod(F.col("vec_id"), F.lit(blocks)).alias("own_blk"),
            F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("other_blk"),
        )
        .select(
            "vec_id",
            "embedding",
            "own_blk",
            F.least("own_blk", "other_blk").alias("blk_lo"),
            F.greatest("own_blk", "other_blk").alias("blk_hi"),
        )
        .dropDuplicates(["vec_id", "blk_lo", "blk_hi"])
    )

    return ab.groupBy("blk_lo", "blk_hi").applyInPandas(
        _block_pair_cosine_kernel(threshold), "id_a long, id_b long, cosine double"
    )


def _block_pair_cosine_kernel(threshold: float):
    """One block-pair task of the exact all-pairs cosine layout
    (module-level so the loud pair-count guard is unit-testable
    without a Spark job)."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        lo = int(pdf["blk_lo"].iloc[0])
        hi = int(pdf["blk_hi"].iloc[0])
        own = pdf["own_blk"].to_numpy()
        # loud pair-count guard (VERDICT r17 #4, guide §5): the pair
        # arrays and the einsum gathers materialize in THIS task; a
        # degenerate block must raise, not OOM. 50M pairs ≈ 1.2 GB of
        # pair/index arrays with the gathers chunked below.
        if lo == hi:
            n = len(pdf)
            n_pairs = n * (n - 1) // 2
        else:
            n_pairs = int((own == lo).sum()) * int((own == hi).sum())
        if n_pairs > _BLOCK_PAIR_MAX_PAIRS:
            raise ValueError(
                f"block pair ({lo},{hi}) would enumerate {n_pairs} pairs "
                f"(> {_BLOCK_PAIR_MAX_PAIRS}) in one task — raise the block "
                "count or pre-dedup; refusing to materialize"
            )
        v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        nrm = np.sqrt(np.einsum("ij,ij->i", v, v))
        if lo == hi:
            ai, bi = np.triu_indices(len(ids), k=1)
        else:
            la = np.where(own == lo)[0]
            lb = np.where(own == hi)[0]
            if not len(la) or not len(lb):
                return empty
            ai, bi = np.meshgrid(la, lb, indexing="ij")
            ai, bi = ai.ravel(), bi.ravel()
        if not len(ai):
            return empty
        id_a = np.minimum(ids[ai], ids[bi])
        id_b = np.maximum(ids[ai], ids[bi])
        # chunked per-pair einsum: the v[ai]/v[bi] gathers are
        # (pairs × dim) copies — 64-dim float64 at 50M pairs would be
        # 2×24 GB unchunked. Chunking changes NOTHING numerically
        # (each pair's dot is the same fixed-order 64-term reduction
        # over its own two rows). Zero-norm vectors yield NaN cosines
        # and NaN >= threshold is False — degenerate vectors are
        # DELIBERATELY excluded from the pair stream (ADVICE r17;
        # pre-r17 they surfaced via NaN-sorts-high in the topk twin).
        cos = np.empty(len(ai), dtype=np.float64)
        for s in range(0, len(ai), _PAIR_EINSUM_CHUNK):
            e = s + _PAIR_EINSUM_CHUNK
            cos[s:e] = np.einsum("ij,ij->i", v[ai[s:e]], v[bi[s:e]]) / (
                nrm[ai[s:e]] * nrm[bi[s:e]]
            )
        keep = cos >= threshold
        return pd.DataFrame(
            {"id_a": id_a[keep], "id_b": id_b[keep], "cosine": cos[keep]}
        )

    return run


_CC_MAX_ITERS = 20

_ORACLE_PAIRS = f"""
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM tok a, tok b
          WHERE a.doc_id < b.doc_id
        )
        WHERE jaccard >= {_JACCARD_THRESHOLD}
"""


@register(
    "dedup_connected_components",
    oracle=f"""
        WITH RECURSIVE
        tok AS ({_ORACLE_SHINGLES}),
        pairs AS ({_ORACLE_PAIRS}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        reach AS (
          SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, reach.r FROM edges e, reach WHERE e.v = reach.u
        )
        SELECT u AS doc_id,
               CAST(MIN(r) AS BIGINT) AS component,
               (u = MIN(r)) AS is_canonical
        FROM reach GROUP BY u ORDER BY doc_id
    """,
    tags=("L2", "components"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2' — duplicate CLUSTERS, not just pairs: near-dup pairs form
    a graph; the dedup decision needs its connected components (keep
    one canonical doc per component — pairwise keep-the-smaller drops
    too much when A~B~C but A≁C). Components via iterative min-label
    propagation: each round every vertex takes the min label among
    itself and its neighbors (one join + one groupBy per round),
    converging in diameter(G) rounds — dup clusters are shallow, so
    this is 2-4 rounds in practice; a hard cap guards pathology. The
    same alternating-join shape is how large-star/small-star CC runs
    on planet-scale graphs. Edges here come from the exact-Jaccard
    pairs so DuckDB can oracle the fixpoint with a recursive CTE."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF("u", "v")
    edges = edges.repartition(32, "v").cache()

    labels = edges.select(F.col("u")).distinct().select("u", F.col("u").alias("label")).cache()
    for _ in range(_CC_MAX_ITERS):
        neighbor = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"), "inner")
            .select(F.col("e.u").alias("u"), F.col("l.label").alias("label"))
        )
        # localCheckpoint (not cache): truncates lineage so round k's
        # plan doesn't embed rounds 1..k-1 — planner cost per round
        # stays flat (cache short-circuits execution but the analyzer
        # still walks the whole accumulated logical plan each round).
        new_labels = (
            labels.select("u", "label").union(neighbor)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    return labels.select(
        F.col("u").alias("doc_id"),
        F.col("label").alias("component"),
        (F.col("u") == F.col("label")).alias("is_canonical"),
    ).orderBy("doc_id")


_CONTAINMENT_DF_CAP = 100  # drop stop-shingles appearing in more docs
_CONTAINMENT_THRESHOLD = 0.5


@register(
    "dedup_containment",
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES}),
        posting AS (
          SELECT doc_id, u.s FROM tok, LATERAL unnest(sh) AS u(s)
        ),
        dfc AS (SELECT s, COUNT(*) AS df FROM posting GROUP BY s),
        kept AS (
          SELECT p.doc_id, p.s
          FROM posting p JOIN dfc ON p.s = dfc.s
          WHERE dfc.df <= {_CONTAINMENT_DF_CAP}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, n_shared,
               ROUND(CAST(n_shared AS DOUBLE) / na.n, 6) AS cont_a_in_b,
               ROUND(CAST(n_shared AS DOUBLE) / nb.n, 6) AS cont_b_in_a
        FROM pairs
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE greatest(CAST(n_shared AS DOUBLE) / na.n,
                       CAST(n_shared AS DOUBLE) / nb.n) >= {_CONTAINMENT_THRESHOLD}
    """,
    tags=("L2''", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection — |A∩B| / |A| over 3-word
    shingle sets, the asymmetric sibling of Jaccard that catches a
    SHORT document embedded inside a LONG one (quotes, wrapped
    reposts, boilerplate-padded copies), which symmetric Jaccard
    dilutes below threshold. Pairs are generated from an inverted
    shingle index (posting-list equi-self-join), never doc×doc, with
    a document-frequency cap of 100: shingles appearing in more
    docs are boilerplate whose posting lists would otherwise square —
    the cap bounds per-shingle join fan-out, is applied identically
    to numerator AND denominator (containment over informative
    shingles), and is compiled into the oracle too, so the report is
    hash-exact.

    Scale: posting lists shuffle on the shingle key (df-capped
    fan-out ≤ 100²-pairs per shingle); per-doc set sizes are a
    doc-keyed aggregate; scores join on pair ids. Same equi-join
    discipline as dedup_minhash_lsh — for corpora where even capped
    postings are too wide, MinHash the kept shingles first and run
    this as the verify stage.

    The index keys are 64-bit xxhash64'd shingles, not strings (the
    dedup_minhash_lsh trick): postings shuffle 8-byte keys instead
    of ~30-byte text ×2 sides, and the df/pair aggregates hash longs
    — measured 12.5s → ~2s at sf0.1. Counts equal the oracle's
    string-keyed counts absent 64-bit collisions (~1e-13 at any df
    the cap admits). The capped posting table is cached: it feeds
    the size aggregate and both sides of the pair join, and
    recomputing it means re-splitting every document three times."""
    sh = _shingles_hashed(spark, sf_dir)
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    dfc = posting.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        posting.join(dfc.filter(F.col("df") <= _CONTAINMENT_DF_CAP), "s")
        .select("doc_id", "s")
        .cache()
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    cont_a = F.col("n_shared").cast("double") / F.col("n_a")
    cont_b = F.col("n_shared").cast("double") / F.col("n_b")
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .filter(F.greatest(cont_a, cont_b) >= _CONTAINMENT_THRESHOLD)
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(cont_a, 6).alias("cont_a_in_b"),
            F.round(cont_b, 6).alias("cont_b_in_a"),
        )
    )


_PREFIX_PROBE = 64  # chars of shared prefix that make a candidate pair
_PREFIX_DF_CAP = 100


@register(
    "dedup_prefix_truncation",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, text, len(text) AS n
          FROM documents WHERE len(text) >= {_PREFIX_PROBE}
        ),
        sig AS (
          SELECT doc_id, text, n, md5(substr(text, 1, {_PREFIX_PROBE})) AS h
          FROM d
        ),
        dfc AS (SELECT h, COUNT(*) AS df FROM sig GROUP BY h),
        kept AS (
          SELECT s.* FROM sig s JOIN dfc ON s.h = dfc.h
          WHERE dfc.df <= {_PREFIX_DF_CAP}
        )
        SELECT a.doc_id AS id_short, b.doc_id AS id_long,
               CAST(a.n AS BIGINT) AS len_short, CAST(b.n AS BIGINT) AS len_long
        FROM kept a JOIN kept b
          ON a.h = b.h
         AND (a.n < b.n OR (a.n = b.n AND a.doc_id < b.doc_id))
        WHERE substr(b.text, 1, a.n) = a.text
    """,
    tags=("L2''''", "truncation"),
)
def dedup_prefix_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate detection: document A duplicates a PREFIX
    of document B (crawler re-fetches cut at different byte limits,
    feed items vs full articles) — invisible to Jaccard once the
    longer doc's tail dilutes the union, and distinct from
    containment's unordered-set view because the match here is exact
    ordered text. Candidates = equi-join on the md5 of the first 64
    chars (a doc and its truncations MUST agree there), with the
    same document-frequency cap discipline as dedup_containment
    against boilerplate openings; each candidate pair then verifies
    the full prefix equality once. Equal-length pairs (exact full
    dups) keep the lower doc_id as "short".

    Scale: the signature shuffle carries (doc_id, 16-byte hash);
    only the df-capped candidate pairs ever move text, and the
    verify is one substr compare per pair. Same inverted-index
    shape as every other dedup scale path here — never doc×doc."""
    docs = load_table(spark, sf_dir, "documents")
    sig = (
        docs.filter(F.length("text") >= _PREFIX_PROBE)
        .select(
            "doc_id",
            "text",
            F.length("text").alias("n"),
            F.md5(F.substring("text", 1, _PREFIX_PROBE)).alias("h"),
        )
    )
    dfc = sig.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    kept = sig.join(dfc.filter(F.col("df") <= _PREFIX_DF_CAP), "h").cache()
    a = kept.select(
        F.col("h"), F.col("doc_id").alias("id_short"), F.col("text").alias("t_a"), F.col("n").alias("n_a")
    )
    b = kept.select(
        F.col("h").alias("hb"), F.col("doc_id").alias("id_long"), F.col("text").alias("t_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(
            b,
            (F.col("h") == F.col("hb"))
            & (
                (F.col("n_a") < F.col("n_b"))
                | ((F.col("n_a") == F.col("n_b")) & (F.col("id_short") < F.col("id_long")))
            ),
        )
        .filter(F.expr("substring(t_b, 1, n_a) = t_a"))
        .select(
            "id_short",
            "id_long",
            F.col("n_a").cast("long").alias("len_short"),
            F.col("n_b").cast("long").alias("len_long"),
        )
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES}),
        posting AS (
          SELECT doc_id, u.s FROM tok, LATERAL unnest(sh) AS u(s)
        ),
        dfc AS (SELECT s, COUNT(*) AS df FROM posting GROUP BY s)
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               ROUND(AVG(CASE WHEN dfc.df = 1 THEN 1.0 ELSE 0.0 END), 6)
                 AS novelty
        FROM posting p JOIN dfc ON p.s = dfc.s
        GROUP BY p.doc_id
    """,
    tags=("L21", "novelty", "pipeline"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21 — corpus novelty score: the fraction of a document's
    3-shingles that appear NOWHERE else in the corpus — the
    uniqueness/diversity signal corpus curation balances against
    quality (boilerplate scores ~0, genuinely novel text ~1; dedup
    removes copies, this measures how much un-copied content a doc
    contributes). Exactly the inverted-index + document-frequency
    machinery of dedup_containment, re-aggregated per document.

    Scale: one shingle-keyed shuffle for the df table, one doc-keyed
    aggregate — built on ``_shingles_hashed`` (token-hash once, one
    3-long combine per shingle, 8-byte keys through the shuffle; the
    string-keyed form re-derives each shingle from the raw text and
    ships ~30-byte keys). No pair join at all — novelty is a per-doc
    statistic. Collision risk at 2⁶⁴ is ~(k²/2⁶⁵): nil for any real
    corpus, and the sf0.01 hash oracle pins the hashed path to the
    exact-string ground truth.

    r18 (guide §2.3/§2.4): the corpus-sized JOIN-BACK is gone. The
    old shape broadcast the full df table onto every posting row and
    re-shuffled the joined corpus stream by doc_id just to count
    df==1 hits per doc. But a df==1 shingle's posting list IS its
    owner doc — so the df aggregate carries ``min(doc_id)`` alongside
    the count, the singleton rows group straight to their owner, and
    the denominator reads off the shingle array directly. What
    remains corpus-sized is only the unavoidable posting→df exchange;
    the owner exchange carries singleton-shingle rows only and the
    final join is doc-sized broadcast. Exact integers and the
    identical ROUND(uniq/n, 6) division, so the result is
    bit-identical (verified row-for-row vs the old form; parity ×3
    SFs). Also fixes this row's inverse core-scaling (PERF_r17 ratio
    0.32 → 0.91): the allocation-heavy joined stream was what
    thrashed 32 concurrent tasks in the shared local heap."""
    sh = _shingles_hashed(spark, sf_dir)
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    uniq = (
        posting.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    totals = sh.select("doc_id", F.size("sh").cast("long").alias("n_shingles"))
    return totals.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.round(
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("double")
            / F.col("n_shingles").cast("double"),
            6,
        ).alias("novelty"),
    )


@register(
    "dedup_cluster_keep_best",
    oracle=f"""
        WITH RECURSIVE
        tok AS ({_ORACLE_SHINGLES}),
        pairs AS ({_ORACLE_PAIRS}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        reach AS (
          SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, reach.r FROM edges e, reach WHERE e.v = reach.u
        ),
        comp AS (
          SELECT u AS doc_id, CAST(MIN(r) AS BIGINT) AS component
          FROM reach GROUP BY u
        )
        SELECT doc_id, component, n_chars,
               (rn = 1) AS keep
        FROM (
          SELECT c.doc_id, c.component, d.n_chars,
                 row_number() OVER (PARTITION BY c.component
                                    ORDER BY d.n_chars DESC, c.doc_id) AS rn
          FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        )
    """,
    tags=("L2", "components", "keep-best"),
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection over near-dup clusters — the
    decision step production dedup actually runs: within each
    connected component of the near-dup graph, KEEP the highest-
    quality member (longest text here, doc_id as tiebreak) and drop
    the rest. Min-id canonicals (dedup_connected_components) are the
    graph primitive; this composes them with a document attribute so
    the survivor is chosen on merit — the difference between
    "dedup ran" and "the best copy survived".

    Scale: component labels come from the iterative min-label
    propagation (join+groupBy per round, localCheckpoint-truncated);
    the keep decision adds one broadcast-sized join onto the
    cluster-member rows and a per-component window over dup-cluster-
    sized groups. Everything outside the clusters never shuffles."""
    labels = dedup_connected_components(spark, sf_dir).select("doc_id", "component")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    from pyspark.sql import Window as W

    w = W.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    return (
        labels.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "component", "n_chars", (F.col("rn") == 1).alias("keep"))
    )


_SPAN_N = 5  # repeated-span gram width (tokens)


@register(
    "dedup_repeated_ngram_spans",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(u.x AS BIGINT) AS pos,
                 md5(array_to_string(t[u.x + 1 : u.x + {_SPAN_N}], ' ')) AS gh
          FROM toks, LATERAL unnest(generate_series(0, len(t) - {_SPAN_N})) AS u(x)
          WHERE len(t) >= {_SPAN_N}
        ),
        dup AS (
          SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) > 1
        ),
        hits AS (
          SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
        ),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN prev IS NULL OR pos - prev > 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
          FROM (
            SELECT doc_id, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hits
          )
        )
        SELECT doc_id,
               MIN(pos) AS span_start,
               MAX(pos) + {_SPAN_N - 1} AS span_end,
               CAST(MAX(pos) - MIN(pos) + {_SPAN_N} AS BIGINT) AS n_tokens
        FROM isl GROUP BY doc_id, span_id
    """,
    tags=("L2", "spans", "exact-substring"),
)
def dedup_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection — the exact-substring
    dedup shape of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al., 2022), re-expressed for Spark: instead of a
    suffix array, every token {_SPAN_N}-gram is hashed and grams seen
    in MORE THAN ONE document are mapped back to their positions;
    runs of consecutive duplicated positions merge into maximal spans
    (the byte ranges one would cut or downweight before training).
    Output: one row per (doc, span) with token offsets and covered
    token count.

    Scale: gram construction is a JVM transform over the token array
    with the token-hash array bound as a LAMBDA VARIABLE (the
    let-binding discipline of _shingles_hashed — each token hashed
    once, one 5-long combine per gram; the naive md5-of-sliced-string
    form re-derives every gram from raw text and ships 32-byte hex
    keys, measured 2.5× slower at sf0.1); the duplicated-gram filter
    is one groupBy on 8-byte keys with map-side partial aggregation;
    the join back reuses the same key partitioning; span merging is
    gaps-and-islands PARTITIONED BY doc — no global window anywhere.
    Gram hashes are uniform, so no skew; the df>1 HAVING bound means
    boilerplate grams (headers, licenses) fan out in the join — at
    100 TB, cap postings per gram like dedup_containment's _DF_CAP
    (dropping ultra-common grams only widens spans conservatively)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    grams = (
        docs.filter(F.size("t") >= _SPAN_N)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"""aggregate(array(transform(t, tk -> xxhash64(tk))),
                          CAST(array() AS ARRAY<BIGINT>),
                          (acc, th) -> transform(
                            sequence(0, size(th) - {_SPAN_N}),
                            i -> xxhash64(th[i], th[i+1], th[i+2], th[i+3], th[i+4])))"""
                )
            ).alias("pos", "gh"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "gh")
        .cache()  # feeds both the df>1 filter and the join-back; without
        # this Spark re-runs gram hashing per consumer (no CTE reuse)
    )
    dup = grams.groupBy("gh").agg(F.count_distinct("doc_id").alias("nd")).filter(F.col("nd") > 1)
    hits = grams.join(dup.select("gh"), "gh").select("doc_id", "pos")
    wd = W.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "is_new",
        F.when(F.lag("pos").over(wd).isNull() | (F.col("pos") - F.lag("pos").over(wd) > 1), 1).otherwise(0),
    ).withColumn("span_id", F.sum("is_new").over(wd.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return isl.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (_SPAN_N - 1)).alias("span_end"),
        (F.max("pos") - F.min("pos") + _SPAN_N).cast("long").alias("n_tokens"),
    ).drop("span_id")


_WINNOW_W = 4  # winnowing window (in grams)


@register(
    "text_winnowing_fingerprints",
    # Gram hashes are PORTABLE 48-bit md5 prefixes (Spark conv() ==
    # DuckDB fold over hex nibbles), so the selected fingerprint
    # VALUES — not just their counts — hash-match across engines.
    oracle=f"""
        WITH g AS (
          SELECT doc_id,
                 list_transform(
                   list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 2),
                     i -> md5(concat_ws(' ', string_split(text, ' ')[i],
                                             string_split(text, ' ')[i + 1],
                                             string_split(text, ' ')[i + 2]))),
                   h -> list_reduce(
                          list_transform(generate_series(1, 12),
                            p -> CAST(strpos('0123456789abcdef', substr(h, p, 1)) - 1 AS BIGINT)),
                          (a, b) -> a * 16 + b)) AS gh
          FROM documents
          WHERE len(string_split(text, ' ')) >= {_WINNOW_W + 2}
        ),
        fp AS (
          SELECT doc_id,
                 CAST(len(gh) - {_WINNOW_W - 1} AS BIGINT) AS n_windows,
                 list_distinct(list_transform(
                   generate_series(0, len(gh) - {_WINNOW_W}),
                   j -> list_min(gh[j + 1 : j + {_WINNOW_W}]))) AS fps
          FROM g
        )
        SELECT doc_id, n_windows,
               CAST(len(fps) AS BIGINT) AS n_fingerprints,
               CAST(list_min(fps) AS BIGINT) AS fp_min,
               ROUND(CAST(len(fps) AS DOUBLE) / n_windows, 6) AS density
        FROM fp
    """,
    tags=("L2", "winnowing", "fingerprints"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — the MOSS copy-detection selector): slide a {_WINNOW_W}-gram
    window over the document's 3-gram hash stream and keep each
    window's MINIMUM hash. The guarantee: any shared substring of
    ≥ {_WINNOW_W + 2} tokens between two documents shares a selected
    fingerprint, while only ~2/(w+1) of grams are kept — position-
    robust copy detection at a fraction of full-gram storage (the
    fingerprints feed the same inverted-index join as
    dedup_containment). Output per doc: window count, distinct
    fingerprints, the minimum fingerprint, selection density
    (expected ≈ 2/(w+1)).

    Scale: the whole selection is ONE narrow JVM expression (token
    array and gram-hash array bound as lambda variables — the
    let-binding discipline); no shuffle until the per-doc aggregate
    projection, which is the row itself. Portable 48-bit md5-prefix
    gram hashes keep the selected VALUES engine-identical.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the md5-per-gram selection
    serialized on one core locally; interleaved A/B 0.56 vs 1.17 s
    median at sf0.1. Exact integers, partitioning-safe."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    fps_expr = f"""
        aggregate(array(split(text, ' ')), CAST(array() AS ARRAY<BIGINT>),
          (acc, ts) -> aggregate(
            array(transform(sequence(1, size(ts) - 2),
                  i -> CAST(conv(substr(md5(concat_ws(' ', ts[i-1], ts[i], ts[i+1])), 1, 12), 16, 10) AS BIGINT))),
            CAST(array() AS ARRAY<BIGINT>),
            (a2, gh) -> transform(sequence(0, size(gh) - {_WINNOW_W}),
                                  j -> array_min(slice(gh, j + 1, {_WINNOW_W})))))
    """
    base = docs.filter(F.size(toks) >= _WINNOW_W + 2).select(
        "doc_id",
        F.array_distinct(F.expr(fps_expr)).alias("fps"),
        (F.size(toks) - 2 - (_WINNOW_W - 1)).cast("long").alias("n_windows"),
    )
    return base.select(
        "doc_id",
        "n_windows",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").cast("long").alias("fp_min"),
        F.round(F.size("fps").cast("double") / F.col("n_windows"), 6).alias("density"),
    )


_WINNOW_PAIR_MIN = 3   # shared fingerprints to call a candidate pair
_WINNOW_DF_CAP = 100   # drop boilerplate fingerprints above this df


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
        WITH g AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 2),
                     i -> md5(concat_ws(' ', string_split(text, ' ')[i],
                                             string_split(text, ' ')[i + 1],
                                             string_split(text, ' ')[i + 2]))),
                   h -> list_reduce(
                          list_transform(generate_series(1, 12),
                            p -> CAST(strpos('0123456789abcdef', substr(h, p, 1)) - 1 AS BIGINT)),
                          (a, b) -> a * 16 + b))) AS gh
          FROM documents
          WHERE len(string_split(text, ' ')) >= {_WINNOW_W + 2}
        ),
        fp AS (
          SELECT doc_id, u.f
          FROM (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(0, len(gh) - {_WINNOW_W}),
                     j -> list_min(gh[j + 1 : j + {_WINNOW_W}]))) AS fps
            FROM (
              SELECT doc_id,
                     list_transform(
                       list_transform(
                         generate_series(1, len(string_split(text, ' ')) - 2),
                         i -> md5(concat_ws(' ', string_split(text, ' ')[i],
                                                 string_split(text, ' ')[i + 1],
                                                 string_split(text, ' ')[i + 2]))),
                       h -> list_reduce(
                              list_transform(generate_series(1, 12),
                                p -> CAST(strpos('0123456789abcdef', substr(h, p, 1)) - 1 AS BIGINT)),
                              (a, b) -> a * 16 + b)) AS gh
              FROM documents
              WHERE len(string_split(text, ' ')) >= {_WINNOW_W + 2}
            )
          ), LATERAL unnest(fps) AS u(f)
        ),
        kept AS (
          SELECT f FROM fp GROUP BY f
          HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_WINNOW_DF_CAP}
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared_fp
          FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
          JOIN kept k ON a.f = k.f
          GROUP BY 1, 2
          HAVING COUNT(*) >= {_WINNOW_PAIR_MIN}
        )
        SELECT id_a, id_b, n_shared_fp FROM pairs
    """,
    tags=("L2", "winnowing", "pairs"),
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-based near-dup candidate pairs — the MOSS pipeline's
    second half: the selected fingerprints (text_winnowing_fingerprints)
    feed a df-capped inverted index; documents sharing ≥{_WINNOW_PAIR_MIN}
    fingerprints become candidate pairs. The winnowing guarantee makes
    this sensitive to LOCALIZED copying (any ≥{_WINNOW_W + 2}-token
    shared run leaves a shared fingerprint) that whole-document
    Jaccard/MinHash dilutes away — the complementary detector beside
    dedup_minhash_lsh (global similarity) and dedup_containment
    (subset relations). Fingerprints seen in >{_WINNOW_DF_CAP} docs
    are boilerplate and dropped, exactly dedup_containment's cap
    discipline.

    Scale: candidates come from an EQUI-join on 8-byte fingerprint
    keys — the posting list shuffle is ~2/(w+1) the size of a
    full-gram index, which is the entire point of winnowing; the
    df cap bounds per-key fan-out, so no key explodes the join.

    r18: scan spread (``spread_small_scan``) — same single-task-scan
    fix as the fingerprint op; interleaved A/B 1.08 vs 1.21 s median
    at sf0.1. Exact integers, partitioning-safe."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    fps_expr = f"""
        aggregate(array(split(text, ' ')), CAST(array() AS ARRAY<BIGINT>),
          (acc, ts) -> aggregate(
            array(transform(sequence(1, size(ts) - 2),
                  i -> CAST(conv(substr(md5(concat_ws(' ', ts[i-1], ts[i], ts[i+1])), 1, 12), 16, 10) AS BIGINT))),
            CAST(array() AS ARRAY<BIGINT>),
            (a2, gh) -> transform(sequence(0, size(gh) - {_WINNOW_W}),
                                  j -> array_min(slice(gh, j + 1, {_WINNOW_W})))))
    """
    fp = (
        docs.filter(F.size(toks) >= _WINNOW_W + 2)
        .select("doc_id", F.explode(F.array_distinct(F.expr(fps_expr))).alias("f"))
        .cache()  # feeds the df filter and both join sides
    )
    kept = (
        fp.groupBy("f")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _WINNOW_DF_CAP))
        .select("f")
    )
    a = fp.join(kept, "f").alias("a")
    b = fp.join(kept, "f").alias("b")
    return (
        a.join(b, (F.col("a.f") == F.col("b.f")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= _WINNOW_PAIR_MIN)
    )


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES}),
        pairs AS ({_ORACLE_PAIRS}),
        src AS (SELECT doc_id, source FROM documents)
        SELECT LEAST(sa.source, sb.source) AS source_a,
               GREATEST(sa.source, sb.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM pairs p
        JOIN src sa ON p.id_a = sa.doc_id
        JOIN src sb ON p.id_b = sb.doc_id
        GROUP BY 1, 2
    """,
    tags=("L2", "forensics", "matrix"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — corpus forensics on the
    near-dup graph: which source pairs share near-duplicate content
    (Jaccard ≥ {_JACCARD_THRESHOLD} pairs, the LSH family's verified
    output), with source pairs canonicalized (least, greatest) so
    A→B and B→A land in one cell. Off-diagonal mass means
    cross-source syndication/mirroring (fix at the crawler);
    diagonal mass means within-source churn (fix at dedup). This is
    the report that decides WHERE dedup effort goes.

    Scale: the pair stream comes from the banded LSH path at scale
    (here the guarded exact generator, so the oracle is exact); the
    source decoration is two broadcast-joinable id→source lookups;
    the matrix is |sources|² at most. Nothing beyond the pair
    generator touches corpus-sized data."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


# --- portable SimHash: the hash-oracled twin of dedup_simhash ---
# 48-bit signature (12 md5 hex chars per token), 4 chunks of 12 bits.
# Pigeonhole still holds: hamming <= 3 differing bits can touch at
# most 3 of the 4 chunks, so every qualifying pair agrees on >= 1
# whole chunk and the equi-join on (chunk_idx, chunk_val) is
# exhaustive for the radius.
_SIMHASH_P_BITS = 48
_SIMHASH_P_CHUNK_BITS = 12
# per-token 48-bit value from the first 12 md5 hex nibbles: Spark has
# conv(hex, 16, 10); DuckDB builds the same value as an explicit
# positional nibble sum (the sketch_kmv_distinct idiom).
_SIMHASH_P_V_DUCK = " + ".join(
    f"CAST({16 ** (11 - i)} AS BIGINT) * "
    f"(strpos('0123456789abcdef', substr(md5(t), {i + 1}, 1)) - 1)"
    for i in range(12)
)
_SIMHASH_P_V_SPARK = "CAST(conv(substr(md5(t), 1, 12), 16, 10) AS BIGINT)"

_SIMHASH_P_SUMS_DUCK = ", ".join(
    f"SUM((v >> {j}) & 1) AS b{j}" for j in range(_SIMHASH_P_BITS)
)
_SIMHASH_P_SIG_DUCK = " + ".join(
    f"(CASE WHEN 2 * b{j} > n THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for j in range(_SIMHASH_P_BITS)
)


@register(
    "dedup_simhash_portable",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, {_SIMHASH_P_V_DUCK} AS v
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        ),
        cnt AS (
          SELECT doc_id, COUNT(*) AS n, {_SIMHASH_P_SUMS_DUCK}
          FROM tok GROUP BY doc_id
        ),
        sigs AS (SELECT doc_id, CAST({_SIMHASH_P_SIG_DUCK} AS BIGINT) AS sig FROM cnt),
        chunks AS (
          SELECT doc_id, sig, g.c AS chunk_idx,
                 (sig >> ({_SIMHASH_P_CHUNK_BITS} * g.c)) & {(1 << _SIMHASH_P_CHUNK_BITS) - 1} AS chunk_val
          FROM sigs, (SELECT unnest(generate_series(0, {_SIMHASH_CHUNKS - 1})) AS c) g
        )
        SELECT id_a, id_b, hamming FROM (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM chunks a JOIN chunks b
            ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
               AND a.doc_id < b.doc_id
        )
        WHERE hamming <= {_SIMHASH_MAX_HAMMING}
    """,
    tags=("L2", "simhash", "portable"),
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE SimHash near-dup — the hash-oracled twin of
    ``dedup_simhash``: identical plan shape (per-bit majority vote →
    pigeonhole chunk blocking → verified Hamming radius), but the
    per-token bit planes come from md5 hex instead of engine-private
    xxhash64, so signatures, candidate sets, and Hamming distances
    are bit-identical in Spark and DuckDB and the operator carries a
    full value-hash oracle (the same portabilization that turned HLL
    and count-min from rows-only into hash-checked:
    agg_hll_portable / agg_countmin_sketch).

    48-bit signature (12 md5 nibbles per token via ``conv``), 4
    chunks of 12 bits: a pair within Hamming distance 3 can touch at
    most 3 chunks, so matching on >= 1 whole chunk via an EQUI-join
    on (chunk_idx, chunk_val) is exhaustive for the radius — a
    linear hash shuffle, never all-pairs, the same plan at 5k docs
    and 5B.

    Scale: token explode -> ONE map-side-combining groupBy with 48
    flat SUM columns (whole-stage codegen; the nested-HOF form
    measures ~6x slower — see simhash_signatures' note); chunk
    explode is x4; candidate volume is bounded by bucket collision
    counts exactly as in the xxhash64 variant.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the md5-per-token stage serialized
    on one core locally; exact integer sums, partitioning-safe."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("t"),
    ).select("doc_id", F.expr(_SIMHASH_P_V_SPARK).alias("v"))
    cnt = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.expr(f"shiftright(v, {j}) & 1")).alias(f"b{j}")
            for j in range(_SIMHASH_P_BITS)
        ],
    )
    sig_expr = " + ".join(
        f"IF(2 * b{j} > n, {1 << j}L, 0L)" for j in range(_SIMHASH_P_BITS)
    )
    sigs = cnt.select("doc_id", F.expr(sig_expr).alias("sig"))
    mask = (1 << _SIMHASH_P_CHUNK_BITS) - 1
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.expr(
                            f"shiftrightunsigned(sig, {_SIMHASH_P_CHUNK_BITS * c}) & {mask}"
                        ).alias("chunk_val"),
                    )
                    for c in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk"),
    ).select("doc_id", "sig", "chunk.chunk_idx", "chunk.chunk_val")
    # r18: chunk-bucket segment verify instead of the self-join — the
    # broadcast build side re-executed the ENTIRE md5-per-token
    # signature pipeline a second time (before-plan: 2 scans, 6
    # HashAggregates; after: 1 scan, 4 — the signature agg and the
    # trailing distinct, partial+final each). The SWAR popcount is
    # the same exact integer bit math as the JVM bit_count, so pairs,
    # hamming values, and the distinct() collapse are identical
    # (oracle parity ×3 SFs).
    return (
        chunks.select("chunk_idx", "chunk_val", "doc_id", "sig")
        .repartition("chunk_idx", "chunk_val")
        .mapInPandas(
            _simhash_segment_verify(_SIMHASH_MAX_HAMMING),
            "id_a long, id_b long, hamming int",
        )
        .distinct()
    )


@register(
    "dedup_allpairs_prefix",
    # Oracle is the brute-force ground truth: prefix filtering is an
    # EXACT pruning (no false negatives by the prefix-filter theorem),
    # and verification recomputes exact Jaccard, so the result set
    # must equal the all-pairs scan, values included.
    oracle=f"""
        WITH tok AS ({_ORACLE_SHINGLES})
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM tok a, tok b
          WHERE a.doc_id < b.doc_id
        )
        WHERE jaccard >= {_JACCARD_THRESHOLD}
    """,
    tags=("L2", "allpairs", "prefix-filter"),
)
def dedup_allpairs_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — EXACT set-similarity self-join via prefix filtering
    (AllPairs / PPJoin family, Bayardo et al. WWW'07 — public paper;
    re-derived here over the documents fixture).

    The third strategy beside brute force (ground truth, O(n²)) and
    MinHash-LSH (approximate): exact results WITHOUT the all-pairs
    product.

    1. 3-word shingles per doc (same sets as the brute-force op);
    2. global token order = ascending document frequency (rarest
       first, shingle text as tie-break) — one groupBy over the
       exploded shingles, joined back per token;
    3. prefix of a size-s set under Jaccard threshold t = its first
       ``s - ceil(t*s) + 1`` tokens in that order. Prefix-filter
       theorem: if J(r,s) >= t, the first common token in the global
       order lies inside BOTH prefixes (else one side alone caps the
       overlap at ceil(t*|r|) - 1 < t*|r∪s|), so candidates =
       equi-self-join of exploded PREFIXES on token;
    4. length filter inside the join: min(sz) >= t * max(sz)
       (J >= t forces t*|r∪s| >= t*max);
    5. verify the candidate set with exact Jaccard; emit pairs >= t.

    Internals run on xxhash64'd shingles (8-byte array elements,
    integer set ops — the ``_shingles_hashed`` discipline): Jaccard
    over hashed shingles equals Jaccard over strings absent 64-bit
    collisions (~1e-13 here), and the VALUES are integer-count
    ratios, so the brute-force string oracle still hash-matches.
    The global order becomes (freq, hash) — any consistent total
    order is valid for the prefix theorem.

    Scale: the candidate join is an equi-join on prefix tokens — a
    hash shuffle, never a cartesian. Rarest-first ordering puts the
    highest-frequency (skew-heavy) tokens OUTSIDE the prefixes, so
    the per-token collision lists stay short; cost is sum over prefix
    tokens of (list length choose 2), the AllPairs bound. The ordered
    arrays (the op's only reused frame — prefixes AND verification
    read it) are materialized once via ``localCheckpoint`` rather
    than ``cache()``: checkpoint blocks are reference-GC'd by the
    ContextCleaner when the caller drops the frame, while a cache()
    here pinned ~150 MB of shingle arrays for the session lifetime
    and starved later operators' broadcast builds in the shared
    local JVM (the global_islands ownership rule, operators/
    sorts.py). Everything is JVM-side built-ins — no UDFs."""
    t = _JACCARD_THRESHOLD
    tok = _shingles_hashed(spark, sf_dir)
    ex = tok.select("doc_id", F.explode("sh").alias("token"))
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # Rebuild each doc's shingle set as an array ORDERED by (freq,
    # token): sort_array on struct sorts field-wise, giving every doc
    # the same shared global order. collect_list is unordered — the
    # sort_array AFTER collection is what makes it deterministic.
    # Single materialization point (see docstring for ownership).
    ordered = (
        ex.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(freq, token))), s -> s.token)").alias("toks")
        )
        .withColumn("sz", F.size("toks"))
        .withColumn("plen", F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1))
        .localCheckpoint(eager=True)
    )
    pref = ordered.select(
        "doc_id",
        "sz",
        F.posexplode(F.expr("slice(toks, 1, CAST(plen AS INT))")).alias("pos", "token"),
    )
    pa = pref.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"),
        (F.col("pos") + 1).alias("ia"), "token",
    )
    pb = pref.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"),
        (F.col("pos") + 1).alias("ib"), "token",
    )
    # PPJoin positional filter (Xiao et al. WWW'08, public paper):
    # both arrays share the global order, so the pair's FIRST common
    # token has positions (min ia, min ib) — and every other common
    # token sits strictly after it on both sides, so
    # overlap <= 1 + min(sz_a - ia, sz_b - ib). J >= t forces
    # overlap >= t/(1+t)·(sz_a+sz_b); pairs whose upper bound misses
    # that are dropped BEFORE the array-intersect verification (the
    # first common token of a qualifying pair is itself a prefix
    # token, so min over prefix matches finds it — lossless).
    # Measured at sf0.1: 310k raw candidates -> the positional
    # survivors only, verification was 2.98 s of the op's 3.9 s.
    candidates = (
        pa.join(
            pb,
            (pa.token == pb.token)
            & (pa.id_a < pb.id_b)
            & (F.least("sz_a", "sz_b") >= F.lit(t) * F.greatest("sz_a", "sz_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.min("ia").alias("fa"), F.min("ib").alias("fb"),
            F.min("sz_a").alias("sz_a"), F.min("sz_b").alias("sz_b"),
        )
        .filter(
            F.lit(1) + F.least(F.col("sz_a") - F.col("fa"), F.col("sz_b") - F.col("fb"))
            >= F.lit(t / (1 + t)) * (F.col("sz_a") + F.col("sz_b"))
        )
        .select("id_a", "id_b")
    )
    # Verification reuses the ordered arrays — same elements as the
    # raw shingle sets, so intersect/union counts are unchanged.
    sha = ordered.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("sh_a"))
    shb = ordered.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(sha, "id_a")
        .join(shb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---- semantic (embedding-space) near-dedup, LSH-blocked ------------
#
# SemDeDup-shaped (Abbas et al. 2023 use k-means clusters; the blocking
# idea is the same): candidate pairs come from shared random-hyperplane
# buckets, verification is the exact cosine — completing the L2
# symmetry: ngram-jaccard brute force ↔ minhash-LSH :: embedding-cosine
# brute force (dedup_embedding_cosine) ↔ THIS.

_SEMLSH_BANDS = 12
_SEMLSH_BITS = 6  # planes per band; band key ∈ [0, 2^6)
_SEMLSH_DIM = 64


def _semlsh_planes() -> list[list[float]]:
    """±1 Rademacher hyperplanes, derived from md5 of a fixed seed
    string — no RNG, the same 72×64 matrix on every run and in both
    engines (the literals are embedded in the Spark expression AND the
    DuckDB oracle, so collision behavior is bit-identical)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"semlsh:{p}:{j}".encode()).digest()[0] >= 128 else -1.0
            for j in range(_SEMLSH_DIM)
        ]
        for p in range(_SEMLSH_BANDS * _SEMLSH_BITS)
    ]


def _semlsh_oracle() -> str:
    planes_values = ", ".join(
        f"({p + 1}, [" + ", ".join(f"{x:.1f}" for x in row) + "])"
        for p, row in enumerate(_semlsh_planes())
    )
    cos = _SEM_ORACLE_COS.format(a="x.v", b="y.v")
    return f"""
        WITH pl(pid, pv) AS (VALUES {planes_values}),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (
          SELECT v.vec_id, t.b,
                 CAST(SUM(CASE WHEN list_dot_product(v.v, pl.pv) > 0
                          THEN 1 << ({_SEMLSH_BITS - 1} - (pl.pid - 1 - t.b * {_SEMLSH_BITS}))
                          ELSE 0 END) AS BIGINT) AS key
          FROM v, generate_series(0, {_SEMLSH_BANDS - 1}) AS t(b), pl
          WHERE pl.pid BETWEEN t.b * {_SEMLSH_BITS} + 1 AND (t.b + 1) * {_SEMLSH_BITS}
          GROUP BY v.vec_id, t.b
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM sig a JOIN sig b ON a.b = b.b AND a.key = b.key AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine FROM (
          SELECT c.id_a, c.id_b, {cos} AS cosine
          FROM cand c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
        ) WHERE cosine >= {_COSINE_DUP_THRESHOLD}
    """


_SEM_ORACLE_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "dedup_semantic_lsh",
    oracle=_semlsh_oracle(),
    tags=("L2", "embedding", "semantic", "lsh"),
)
def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC near-dedup at scale — the embedding-space sibling of
    ``dedup_minhash_lsh`` (SemDeDup's blocking idea with hyperplane
    buckets instead of k-means clusters): candidate pairs must share
    at least one of {_SEMLSH_BANDS} banded random-hyperplane buckets
    ({_SEMLSH_BITS} sign bits per band), then the EXACT cosine
    verifies each candidate against the threshold — so precision is
    1.0 by construction and only recall is approximate. This corpus's
    embeddings are near-orthogonal random vectors (max pairwise
    cosine ≈0.5), so the dup threshold sits at the documented
    toy-scale {_COSINE_DUP_THRESHOLD} where banding recall is the
    curve's LOW end (~0.50 vs brute force, pytest-pinned); at a
    production semantic-dup threshold (cosine ≥0.9) the identical
    configuration collides true pairs with p ≈
    1-(1-(1-acos(0.9)/pi)^{_SEMLSH_BITS})^{_SEMLSH_BANDS} ≈ 0.997 —
    banding is built for the high-similarity regime.

    Scale: signatures are pure JVM folds (the vector let-bound ONCE —
    72 zip_with dots per row, no Python); candidates come from ONE
    hash shuffle on (band, key) — never an all-pairs product (the
    brute-force twin ``dedup_embedding_cosine`` carries the size
    guard); verification is one dot per candidate with norms
    precomputed per side. Bucket fan-out is the standard LSH lever:
    more bits per band cuts candidates geometrically, more bands buys
    recall linearly in cost. Carrying the vector through the
    {_SEMLSH_BANDS}-way explode is the same trade as
    ``sim_search_ann_lsh``; at extreme dims, ship ids and re-join
    vectors at verify time instead."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_lsh_pairs(emb, _COSINE_DUP_THRESHOLD)


def _semlsh_sig_kernel(probe_bits: int = 0):
    """Vectorized signature kernel (r17 optimization — guide §4.2):
    per Arrow batch, ONE float64 GEMM of (batch × {_SEMLSH_DIM}) @
    ({_SEMLSH_DIM} × {_SEMLSH_BANDS * _SEMLSH_BITS}) replaces the
    interpreted 72-lambda JVM fold; sign bits fold MSB-first into the
    {_SEMLSH_BANDS} band keys exactly as the retired JVM fold did.
    Sign-safe: plane entries are ±1.0 so per-element products are
    EXACT; only the summation order differs from the strict left
    fold, and the corpus margins dwarf it (measured min |dot| across
    all three SFs: 2.7e-6 vs ~1e-13 worst-case 64-term reassociation
    error; zero sign mismatches fold-vs-GEMM at sf0.001/0.01/0.1).
    Emits one NARROW bucket-membership row per (vector, band) — ids
    and keys only; the vector attaches in the JVM afterwards — and
    with ``probe_bits=1`` additionally the {_SEMLSH_BITS}+1
    asymmetric probe rows (side=1) whose keys sit at Hamming
    distance ≤1, key itself included."""
    import numpy as np

    planes = np.array(_semlsh_planes())  # (bands*bits) x dim
    weights = 2 ** np.arange(_SEMLSH_BITS - 1, -1, -1)  # MSB-first

    def sig(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (v @ planes.T > 0).astype(np.int64)
            keys = bits.reshape(len(v), _SEMLSH_BANDS, _SEMLSH_BITS) @ weights
            n = len(v)
            ids = pdf["vec_id"].to_numpy()
            band = np.tile(np.arange(_SEMLSH_BANDS, dtype=np.int32), n)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, _SEMLSH_BANDS),
                    "band": band,
                    "key": keys.reshape(-1).astype(np.int32),
                    "side": np.zeros(n * _SEMLSH_BANDS, dtype=np.int32),
                }
            )
            if probe_bits:
                flips = np.array([0] + [1 << j for j in range(_SEMLSH_BITS)])
                pkeys = keys.reshape(-1, 1) ^ flips  # (n*bands) x (bits+1)
                m = len(flips)
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(np.repeat(ids, _SEMLSH_BANDS), m),
                        "band": np.repeat(band, m),
                        "key": pkeys.reshape(-1).astype(np.int32),
                        "side": np.ones(n * _SEMLSH_BANDS * m, dtype=np.int32),
                    }
                )

    return sig


def _semlsh_bucket_verify_kernel(threshold: float, probe: bool):
    """In-bucket candidate + verify kernel (r17): one (band, key)
    bucket per call; pairs are enumerated and their EXACT cosines
    computed with row-wise ``einsum`` gathers — never a BLAS GEMM, so
    each pair's dot is a fixed-order 64-term reduction that depends
    only on the pair's own two vectors. A pair colliding in several
    buckets therefore produces BIT-IDENTICAL (id_a, id_b, cosine)
    rows, and the outer ``distinct()`` collapses them exactly — the
    multiplicity-safe analogue of the old dedup-before-verify order.
    ``probe=True`` applies the asymmetric multiprobe rule: pairs are
    (exact member × probe member) with exact.vec_id < probe.vec_id."""
    import numpy as np

    def run(pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        if len(pdf) > _BUCKET_VERIFY_CAP:
            raise ValueError(
                f"degenerate LSH bucket: (band={pdf['band'].iloc[0]}, key={pdf['key'].iloc[0]}) "
                f"holds {len(pdf)} members (> {_BUCKET_VERIFY_CAP} cap) — the corpus has that "
                "many near-identical vectors in one bucket; exact-dedup upstream or add band bits"
            )
        v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        nrm = np.sqrt(np.einsum("ij,ij->i", v, v))
        if probe:
            ex = np.where(pdf["side"].to_numpy() == 0)[0]
            pr = np.where(pdf["side"].to_numpy() == 1)[0]
            if not len(ex) or not len(pr):
                return empty
            ai, bi = np.meshgrid(ex, pr, indexing="ij")
            ai, bi = ai.ravel(), bi.ravel()
            keep = ids[ai] < ids[bi]
            ai, bi = ai[keep], bi[keep]
            id_a, id_b = ids[ai], ids[bi]
        else:
            ai, bi = np.triu_indices(len(ids), k=1)
            id_a = np.minimum(ids[ai], ids[bi])
            id_b = np.maximum(ids[ai], ids[bi])
        if not len(ai):
            return empty
        cos = np.einsum("ij,ij->i", v[ai], v[bi]) / (nrm[ai] * nrm[bi])
        keep = cos >= threshold
        return pd.DataFrame(
            {"id_a": id_a[keep], "id_b": id_b[keep], "cosine": cos[keep]}
        )

    return run


def semantic_lsh_pairs(
    emb: DataFrame, threshold: float, probe_bits: int = 0
) -> DataFrame:
    """The banding+verify core of ``dedup_semantic_lsh``, reusable at
    any threshold over any (vec_id, embedding) frame — the pytest
    production-regime pin (recall ≥ 0.95 at cosine ≥ 0.9 on planted
    near-duplicate twins, VERDICT r10 item 5) drives this directly.
    ``probe_bits = 1`` enables 1-bit MULTIPROBE: one side of the
    candidate join also probes the {_SEMLSH_BITS} keys at Hamming
    distance 1 per band (asymmetric probing — a pair whose band keys
    differ by ≤1 bit collides through either side's flip), trading
    ~{_SEMLSH_BITS + 1}× probe rows for a second chance at every
    near-miss band."""
    # r17 rewrite (guide §4.2/§8, the ``sim_search_ann_lsh`` bucketed
    # pattern): ONE shuffle on (band, key) carries each vector once
    # per bucket membership — O(n·bands·dim) bytes — and each bucket
    # task enumerates its own pairs and verifies them with row-wise
    # ``einsum`` gathers in the same kernel. The r12 narrow-shuffle
    # form shipped only ids through the band join but then re-joined
    # BOTH vectors onto every CANDIDATE row for the verify —
    # O(candidates·dim) bytes through two joins and the Python
    # boundary, 374 MB vs 12 MB at sf0.1 (candidates ≈ 17× n·bands
    # here), and the interpreted zip_with/aggregate cosine fold on
    # top. Measured 3.41 s → 1.77 s exact / 4.9 s (r16 sweep) →
    # 1.76 s multiprobe at sf0.1 (noop sink); plan (plans/r17/): the
    # old shape's two per-candidate vector-attach BroadcastHashJoins
    # and the interpreted fold projection are gone — what remains is
    # ONE vec_id vector attach (broadcast when it fits), the
    # (band, key) bucket Exchange, and the final distinct's
    # Exchange. The candidate rule, the set, and
    # the 6dp-canonical cosines are unchanged (per-pair einsum is
    # orientation- and bucket-independent, so cross-bucket duplicate
    # rows are bit-identical and ``distinct()`` collapses them the
    # way the old dedup-before-verify order did).
    sig = emb.select("vec_id", "embedding").mapInPandas(
        _semlsh_sig_kernel(probe_bits), "vec_id long, band int, key int, side int"
    )
    # attach the exact-widened float64 vector per membership row in
    # the JVM (AQE broadcasts the vector table when it fits; at scale
    # this is one vec_id equi-join) — keeps the Python boundary
    # narrow on the way out of the signature kernel
    vec = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    return (
        sig.join(vec, "vec_id")
        .groupBy("band", "key")
        .applyInPandas(
            _semlsh_bucket_verify_kernel(threshold, probe_bits > 0),
            "id_a long, id_b long, cosine double",
        )
        .distinct()
    )


def _semlsh_multiprobe_oracle() -> str:
    """The exact-band oracle plus the 1-bit probe expansion on one
    side (DuckDB ``xor``) — candidate rule: same band, keys at
    Hamming distance <= 1."""
    planes_values = ", ".join(
        f"({p + 1}, [" + ", ".join(f"{x:.1f}" for x in row) + "])"
        for p, row in enumerate(_semlsh_planes())
    )
    cos = _SEM_ORACLE_COS.format(a="x.v", b="y.v")
    return f"""
        WITH pl(pid, pv) AS (VALUES {planes_values}),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (
          SELECT v.vec_id, t.b,
                 CAST(SUM(CASE WHEN list_dot_product(v.v, pl.pv) > 0
                          THEN 1 << ({_SEMLSH_BITS - 1} - (pl.pid - 1 - t.b * {_SEMLSH_BITS}))
                          ELSE 0 END) AS BIGINT) AS key
          FROM v, generate_series(0, {_SEMLSH_BANDS - 1}) AS t(b), pl
          WHERE pl.pid BETWEEN t.b * {_SEMLSH_BITS} + 1 AND (t.b + 1) * {_SEMLSH_BITS}
          GROUP BY v.vec_id, t.b
        ),
        probes AS (
          SELECT s.vec_id, s.b,
                 CAST(xor(s.key, CASE WHEN f.i = 0 THEN 0
                                      ELSE (1 << (f.i - 1)) END) AS BIGINT) AS pkey
          FROM sig s, generate_series(0, {_SEMLSH_BITS}) AS f(i)
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, p.vec_id AS id_b
          FROM sig a JOIN probes p
            ON a.b = p.b AND a.key = p.pkey AND a.vec_id < p.vec_id
        )
        SELECT id_a, id_b, cosine FROM (
          SELECT c.id_a, c.id_b, {cos} AS cosine
          FROM cand c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
        ) WHERE cosine >= {_COSINE_DUP_THRESHOLD}
    """


@register(
    "dedup_semantic_lsh_multiprobe",
    oracle=_semlsh_multiprobe_oracle(),
    tags=("L2", "embedding", "semantic", "lsh", "multiprobe"),
)
def dedup_semantic_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-sem' — 1-bit MULTIPROBE semantic LSH (VERDICT r10 item 5's
    recall lever, as its own operator beside the exact-band form):
    one side of the candidate join also probes each band key's
    {_SEMLSH_BITS} Hamming-distance-1 neighbors, so a pair whose
    6-bit band keys differ by a single flipped hyperplane still
    collides — the standard multiprobe trade (Lv et al., VLDB'07:
    probe nearby buckets instead of adding tables/bands). At the
    toy-scale 0.3 threshold this lifts recall from ~0.47 to ~0.9
    (pytest-pinned ≥ 0.9, superset-of-exact-band also pinned) for
    ~{_SEMLSH_BITS + 1}× probe-side rows — cheaper than the
    equivalent-recall alternative of ~4× more bands, which would
    multiply SIGNATURE storage, not just join fan-in. Precision
    stays 1.0: every candidate is verified with the exact cosine.

    Scale: identical plan shape to the exact-band form — signatures
    are JVM folds, candidates come from ONE (band, key) hash
    shuffle; the probe explode multiplies rows into that shuffle by
    a constant 7, and the verify stage is bounded by Hamming-≤1
    collision volume. The honest cost curve, measured at sf0.1: THIS
    corpus's near-orthogonal toy regime is multiprobe's worst case —
    per-bit collision p≈0.59 puts ~95% of all pairs within one flip
    of some band, so the verify stage approaches brute force (21.8 s
    vs 23.2 s all-pairs; the recall is what's bought: 0.97 vs 0.50).
    In the mid-similarity regimes multiprobe exists for (cos
    0.6–0.8, paraphrase-range mining) per-band flip probability is
    far lower and candidates stay sparse; and at a production 0.9
    threshold exact banding already collides at p≈0.997, so the
    probe side should simply be turned off — probe_bits is a
    per-workload dial, not a default. The intended mid regime now has
    a MEASURED point (VERDICT r11 item 8, pytest-pinned): planted
    twins at cos ≈ 0.70 mined at threshold 0.65 — exact-band recall
    0.84 → multiprobe 1.00, verify-stage volume 3697 → 14657 of
    19900 all-pairs (under brute force even over this worst-case
    near-orthogonal background; a real paraphrase-range corpus's
    background collides far less)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_lsh_pairs(emb, _COSINE_DUP_THRESHOLD, probe_bits=1)


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
