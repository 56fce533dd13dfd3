"""Invariant tests for the rows-only LLM-pipeline operators (the
ones whose semantics are hash-dependent or approximate by design, so
the DuckDB differential check doesn't apply — SURVEY.md §5.5)."""

import pytest

import pyspark.sql.functions as F

from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import simhash_signatures
from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import pair_cosine, with_norm
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

# The O(n²) ground-truth arms (brute-force jaccard / all-pairs Hamming)
# run on the pair-preserving reduced documents fixture (conftest
# sf_doc_subset): engine-vs-engine EQUALITY is corpus-size-independent,
# the planted near-dup structure survives intact, and the driver still
# hash-checks every operator at full sf0.01 each round. Measured r09:
# these five tests cost 78 s of the file's 129 s at sf0.01.

REG = load_all()


def _pairset(pdf):
    return set(map(tuple, pdf[["id_a", "id_b"]].values.tolist()))


def test_minhash_lsh_matches_ground_truth(spark, sf_doc_subset):
    """LSH candidates, post-verification, must equal the brute-force
    Jaccard pairs: verification kills false positives exactly, and at
    the corpus's planted similarity (s >= 0.9) the per-pair miss
    probability is (1-s^2)^8 ~= 2e-6 — and the hashing is
    deterministic, so the outcome is fixed."""
    lsh = _pairset(REG["dedup_minhash_lsh"].fn(spark, sf_doc_subset).toPandas())
    truth = _pairset(REG["dedup_ngram_jaccard"].fn(spark, sf_doc_subset).toPandas())
    assert lsh == truth


def test_minhash_lsh_jaccard_above_threshold(spark):
    pdf = REG["dedup_minhash_lsh"].fn(spark, SF_ORACLE).toPandas()
    assert (pdf["jaccard"] >= 0.5).all()
    assert (pdf["id_a"] < pdf["id_b"]).all()


def test_allpairs_prefix_matches_ground_truth(spark, sf_doc_subset):
    """Prefix filtering is EXACT (no false negatives): the
    prefix-filter theorem guarantees any pair with Jaccard >= t
    shares a token inside both rarest-first prefixes, and
    verification recomputes exact Jaccard — so the result must equal
    the brute-force all-pairs scan, pair-for-pair."""
    pruned = _pairset(REG["dedup_allpairs_prefix"].fn(spark, sf_doc_subset).toPandas())
    truth = _pairset(REG["dedup_ngram_jaccard"].fn(spark, sf_doc_subset).toPandas())
    assert pruned == truth


def test_simhash_blocking_is_exhaustive(spark, sf_doc_subset):
    """The 4x16-bit chunk equi-join must find EXACTLY the pairs a
    brute-force all-pairs Hamming scan finds (pigeonhole: <=3
    differing bits can't touch all 4 chunks)."""
    blocked = _pairset(REG["dedup_simhash"].fn(spark, sf_doc_subset).toPandas())
    sigs = simhash_signatures(spark, sf_doc_subset)
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = _pairset(
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.sig ^ b.sig)").alias("hamming"),
        )
        .filter("hamming <= 3")
        .toPandas()
    )
    assert blocked == brute


def test_simhash_near_dups_cover_planted_pairs(spark, sf_doc_subset):
    """SimHash at radius 3 should rediscover most of the planted
    near-duplicate pairs the exact-Jaccard ground truth finds."""
    sim = _pairset(REG["dedup_simhash"].fn(spark, sf_doc_subset).toPandas())
    truth = _pairset(REG["dedup_ngram_jaccard"].fn(spark, sf_doc_subset).toPandas())
    assert len(sim & truth) >= len(truth) * 0.5


def test_semantic_lsh_subset_and_recall(spark):
    """dedup_semantic_lsh vs the brute-force cosine twin: every found
    pair must BE a true pair with the identical cosine value
    (precision 1.0 — the exact verify), and banding recall at the
    toy-scale threshold stays above a floor (measured 0.500 at
    sf0.01: 495 of 990 true pairs collide through 12 bands × 6 bits;
    deterministic — the planes are md5-fixed)."""
    found = REG["dedup_semantic_lsh"].fn(spark, SF_ORACLE).toPandas()
    truth = REG["dedup_embedding_cosine"].fn(spark, SF_ORACLE).toPandas()
    tmap = {(r.id_a, r.id_b): r.cosine for r in truth.itertuples()}
    for r in found.itertuples():
        assert (r.id_a, r.id_b) in tmap, f"non-true pair emitted: {r}"
        assert r.cosine == tmap[(r.id_a, r.id_b)], "cosine differs from brute force"
    recall = len(found) / len(truth)
    assert recall >= 0.45, f"semantic-LSH recall degraded: {recall}"


def test_ann_lsh_recall_against_brute_force(spark):
    """Deterministic hyperplanes → fixed recall. Measured 0.514 at
    sf0.01 (each vector's true top-1 found within ANN top-5 through
    16 buckets + 1-bit multiprobe); pin a margin below."""
    emb = with_norm(load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding"))
    a, b = emb.alias("a"), emb.alias("b")
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    bf1 = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("q_id"), F.col("b.vec_id").alias("n_id"), pair_cosine().alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("q_id", "n_id")
        .toPandas()
    )
    truth = dict(zip(bf1.q_id, bf1.n_id))
    ann = REG["sim_search_ann_lsh"].fn(spark, SF_ORACLE).toPandas()
    got: dict = {}
    for r in ann.itertuples():
        got.setdefault(r.q_id, set()).add(r.n_id)
    recall = sum(1 for q, n in truth.items() if n in got.get(q, set())) / len(truth)
    assert recall >= 0.45, f"ANN recall degraded: {recall}"


def test_ann_lsh_shape_invariants(spark):
    pdf = REG["sim_search_ann_lsh"].fn(spark, SF_ORACLE).toPandas()
    assert (pdf["rk"] >= 1).all() and (pdf["rk"] <= 5).all()
    assert not (pdf["q_id"] == pdf["n_id"]).any()
    # no (q, neighbor) duplicates despite multiprobe
    assert not pdf.duplicated(["q_id", "n_id"]).any()


def test_blas_topk_matches_exact_topk(spark):
    """The blocked-GEMM brute force must return the identical top-100
    pair list as the expression-fold version. Its cosine column is
    ROUNDed to 6dp for the hash oracle (selection still on raw
    values), so values may differ from the unrounded exact path by up
    to half a rounding step — not a computation divergence."""
    import numpy as np

    exact = REG["sim_search_topk"].fn(spark, SF_ORACLE).toPandas()
    blas = REG["sim_search_topk_blas"].fn(spark, SF_ORACLE).toPandas()
    assert list(map(tuple, exact[["id_a", "id_b"]].values.tolist())) == list(
        map(tuple, blas[["id_a", "id_b"]].values.tolist())
    )
    assert float(np.abs(exact["cosine"].values - blas["cosine"].values).max()) <= 5.01e-7


def test_decode_dispatch_routes_all_modalities(spark):
    """The sniff-and-route decode stage (round 9's replacement for the
    retired fake-decode stubs): every document decodes through a REAL
    codec picked by payload magic, deterministically, with per-kind
    invariants that mirror each synth's value ranges."""
    one = REG["mm_decode_dispatch"].fn(spark, SF_ORACLE).toPandas().sort_values("doc_id").reset_index(drop=True)
    two = REG["mm_decode_dispatch"].fn(spark, SF_ORACLE).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert one.equals(two)
    assert len(one) == load_table(spark, SF_ORACLE, "documents").count()
    assert set(one["kind"]) == {"image", "audio", "video"}
    # two image containers behind one kind: BMP (3-channel, small dims)
    # and baseline JPEG (grayscale, 8-px-multiple dims) — the split
    # proves routing is magic-driven, not kind-driven
    img = one[one["kind"] == "image"]
    bmp = img[img["n_channels"] == 3]
    jpg = img[img["n_channels"] == 1]
    assert len(bmp) and len(jpg)
    assert bmp["width"].between(4, 16).all() and bmp["height"].between(3, 11).all()
    assert (jpg["width"] % 8 == 0).all() and (jpg["height"] % 8 == 0).all()
    assert (img["n_frames"] == 1).all() and (img["duration_ms"] == 0).all()
    aud = one[one["kind"] == "audio"]
    assert aud["width"].isna().all() and aud["height"].isna().all()
    assert aud["n_channels"].between(1, 2).all()
    assert aud["n_frames"].between(400, 1000).all() and (aud["duration_ms"] > 0).all()
    vid = one[one["kind"] == "video"]
    assert vid["n_frames"].between(2, 6).all() and (vid["duration_ms"] > 0).all()


def test_decode_dispatch_rejects_unknown_magic():
    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        decode_bmp,
        decode_gif_frames,
    )

    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(60))  # header-sized but wrong magic
    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF87a" + bytes(20))  # pre-89a not synthed


def test_ann_ivf_recall_against_brute_force(spark):
    """IVF (farthest-first seeds on a hash-deterministic sketch, 10
    sketch-side Lloyd iterations + ONE distributed polish step,
    nprobe=6) should comfortably beat the
    LSH variant's recall on this corpus. Fully deterministic: the
    sketch is the smallest-xxhash64 slice, farthest-first ties break
    by index, Lloyd is exact arithmetic. Measured 0.792 at sf0.01
    after the round-10 retraining (stride+1-step+nprobe4 history:
    0.596); floor pinned with a drift margin."""
    emb = with_norm(load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding"))
    a, b = emb.alias("a"), emb.alias("b")
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    bf1 = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("q_id"), F.col("b.vec_id").alias("n_id"), pair_cosine().alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("q_id", "n_id")
        .toPandas()
    )
    truth = dict(zip(bf1.q_id, bf1.n_id))
    ann = REG["sim_search_ann_ivf"].fn(spark, SF_ORACLE).toPandas()
    got: dict = {}
    for r in ann.itertuples():
        got.setdefault(r.q_id, set()).add(r.n_id)
    recall = sum(1 for q, n in truth.items() if n in got.get(q, set())) / len(truth)
    assert recall >= 0.7, f"IVF recall degraded: {recall}"


def test_ann_ivf_shape_invariants(spark):
    pdf = REG["sim_search_ann_ivf"].fn(spark, SF_ORACLE).toPandas()
    assert (pdf["rk"] >= 1).all() and (pdf["rk"] <= 5).all()
    assert not (pdf["q_id"] == pdf["n_id"]).any()
    assert not pdf.duplicated(["q_id", "n_id"]).any()


def test_connected_components_agree_with_unionfind(spark, sf_doc_subset):
    """Spark label propagation must produce exactly the components a
    driver-side union-find builds from the same pair list."""
    pairs = REG["dedup_ngram_jaccard"].fn(spark, sf_doc_subset).select("id_a", "id_b").collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {
        r.doc_id: r.component
        for r in REG["dedup_connected_components"].fn(spark, sf_doc_subset).collect()
    }
    assert got == want


def test_connected_components_one_canonical_per_component(spark):
    pdf = REG["dedup_connected_components"].fn(spark, SF_ORACLE).toPandas()
    per_comp = pdf.groupby("component")["is_canonical"].sum()
    assert (per_comp == 1).all()
    assert (pdf["component"] <= pdf["doc_id"]).all()


def test_knn_ann_agreement_and_recall(spark):
    """knn_label_vote_ann: deterministic (fixed hyperplanes), so its
    quality floor is pinned: the ANN candidate set must recover most
    of the exact top-10 neighborhood, and predictions must mostly
    agree with the exact classifier. (Agreement < 1.0 is expected —
    near-50/50 votes flip when one neighbor differs.)"""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window
    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import with_norm
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    exact_pred = {r.q_id: r.pred_label for r in REG["knn_label_vote"].fn(spark, SF_ORACLE).collect()}
    ann_pred = {r.q_id: r.pred_label for r in REG["knn_label_vote_ann"].fn(spark, SF_ORACLE).collect()}
    assert set(ann_pred) == set(exact_pred)  # every query classified
    agree = sum(1 for q in exact_pred if ann_pred[q] == exact_pred[q]) / len(exact_pred)
    assert agree >= 0.6, f"prediction agreement {agree}"


def test_mm_feature_extract_shape_and_determinism(spark):
    """Stubbed feature extractor: fixed dim, values in [0,1), and
    bit-identical across runs (md5-derived — no RNG)."""
    a = REG["mm_feature_extract_stub"].fn(spark, SF_ORACLE).toPandas().sort_values("doc_id")
    b = REG["mm_feature_extract_stub"].fn(spark, SF_ORACLE).toPandas().sort_values("doc_id")
    # features is the driver-safe serialized form: comma-joined exact
    # byte values (x*256 of the dyadic floats)
    av = a["features"].map(lambda s: [int(t) / 256.0 for t in s.split(",")])
    bv = b["features"].map(lambda s: [int(t) / 256.0 for t in s.split(",")])
    assert (av.map(len) == 8).all()
    assert av.map(lambda v: all(0 <= x < 1 for x in v)).all()
    assert list(map(list, av)) == list(map(list, bv))


def test_knn_broadcast_guard_raises(spark, monkeypatch):
    """The exact kNN classifier broadcasts the query side; beyond the
    bound it must refuse and point at the ANN variant instead of
    shipping a multi-GB broadcast."""
    from hadoop_based_distributed_batch_processing_system_spark.operators import similarity

    monkeypatch.setattr(similarity, "_KNN_BROADCAST_BOUND", 0)
    with pytest.raises(ValueError, match="broadcast guard"):
        REG["knn_label_vote"].fn(spark, SF_ORACLE)


def test_bucket_topk_kernel_keeps_k_after_self_filter():
    """In a probe's own bucket the self-match must not evict a real
    neighbor: with k_partial=2 and 3 non-self candidates, both slots
    survive the q_id != n_id filter."""
    import numpy as np
    import pandas as pd

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _bucket_topk_kernel,
    )

    kernel = _bucket_topk_kernel(2)
    v = np.eye(4, dtype=np.float64)
    # query 0 lives in the bucket with itself and 3 neighbors; its own
    # vector has cosine 1.0 and would win any top-k slot.
    left = pd.DataFrame({"q_id": [0], "qv": [v[0] + 0.1]})
    right = pd.DataFrame({"n_id": [0, 1, 2, 3], "nv": [v[0] + 0.1, v[0], v[1], v[2]]})
    out = kernel(left, right)
    real = out[out["q_id"] != out["n_id"]]
    assert len(real) == 2, f"self-match evicted a neighbor: {out}"


def test_wav_decode_rms_and_determinism():
    """The WAV path is a real codec round-trip: synth → RIFF bytes →
    parse. RMS of the decoded PCM must sit near amplitude/sqrt(2)
    (sine), and synthesis must be bit-deterministic."""
    import math

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        _WAV_AMP,
        decode_wav,
        synth_wav_bytes,
    )

    for doc_id in [0, 1, 7, 123, 9999]:
        b1, b2 = synth_wav_bytes(doc_id), synth_wav_bytes(doc_id)
        assert b1 == b2 and b1[:4] == b"RIFF" and b1[8:12] == b"WAVE"
        sr, n_ch, n_frames, dur_ms, rms = decode_wav(b1)
        assert sr in (8000, 16000, 22050, 44100)
        assert n_ch == 1 + doc_id % 2
        assert n_frames == 400 + (doc_id % 7) * 100
        assert dur_ms == (n_frames * 1000) // sr
        expected = _WAV_AMP / 32768.0 / math.sqrt(2)
        assert abs(rms - expected) / expected < 0.02, (doc_id, rms, expected)


def test_jl_projection_distance_distortion(spark):
    """JL with 16 Rademacher dims: pairwise distances on sampled
    pairs must survive within a loose distortion envelope (the bound
    is probabilistic; 16 dims at eps~0.75 leaves generous slack, and
    the matrix is fixed so this cannot flake)."""
    import numpy as np

    proj = REG["embed_random_projection"].fn(spark, SF_ORACLE).orderBy("vec_id").limit(50).toPandas()
    emb = (
        load_table(spark, SF_ORACLE, "embeddings")
        .orderBy("vec_id")
        .limit(50)
        .toPandas()
    )
    high = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    low = proj[[c for c in proj.columns if c.startswith("proj_")]].to_numpy()
    rng_pairs = [(i, j) for i in range(0, 50, 7) for j in range(i + 1, 50, 11)]
    ratios = []
    for i, j in rng_pairs:
        dh = np.linalg.norm(high[i] - high[j])
        dl = np.linalg.norm(low[i] - low[j])
        if dh > 1e-9:
            ratios.append(dl / dh)
    ratios = np.array(ratios)
    assert 0.25 < ratios.mean() < 1.75, f"JL mean distortion off: {ratios.mean()}"
    assert (ratios > 0.05).all(), "JL collapsed a pair to near-zero"


def test_brute_force_guards_raise(spark, monkeypatch):
    """Every O(n^2) ground-truth operator must refuse above its bound
    and name its scale path in the error."""
    from hadoop_based_distributed_batch_processing_system_spark.operators import dedup, similarity

    monkeypatch.setattr(dedup, "_BRUTE_FORCE_BOUND", 0)
    monkeypatch.setattr(similarity, "_BRUTE_FORCE_BOUND", 0)
    with pytest.raises(ValueError, match="dedup_minhash_lsh"):
        REG["dedup_ngram_jaccard"].fn(spark, SF_ORACLE)
    with pytest.raises(ValueError, match="guard"):
        REG["dedup_embedding_cosine"].fn(spark, SF_ORACLE)
    with pytest.raises(ValueError, match="sim_search_ann_lsh"):
        REG["sim_search_topk"].fn(spark, SF_ORACLE)


def test_pack_sequences_invariants(spark):
    """Packing invariants: offsets are a per-source running total of
    token counts in doc_id order; pack_offset < budget; pack_ids are
    contiguous from 0 per source; total packed tokens equals the sum
    of doc token counts (nothing dropped or double-packed)."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.text import _PACK_BUDGET

    pdf = (
        REG["pack_sequences_concat_chunk"].fn(spark, SF_ORACLE)
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    assert (pdf["pack_offset"] < _PACK_BUDGET).all()
    assert (pdf["pack_offset"] == pdf["stream_offset"] % _PACK_BUDGET).all()
    assert (pdf["pack_id"] == pdf["stream_offset"] // _PACK_BUDGET).all()
    for _, g in pdf.groupby("source"):
        # running total: offset[i] = offset[i-1] + n_tokens[i-1]
        expect = g["n_tokens"].cumsum().shift(1, fill_value=0)
        assert (g["stream_offset"].values == expect.values).all()
        assert g["pack_id"].iloc[0] == 0
        # pack ids never skip: consecutive docs differ by at most
        # ceil(n_tokens/budget) packs and are monotone
        diffs = g["pack_id"].diff().dropna()
        assert (diffs >= 0).all()
    docs = load_table(spark, SF_ORACLE, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    assert int(pdf["n_tokens"].sum()) == docs.agg(F.sum("n")).collect()[0][0]


def test_bmp_decode_roundtrip_and_padding():
    """The BMP path is a real codec round-trip: synth → struct-packed
    container → parse. Exercises every stride class (3*w % 4 in
    {0,1,2,3}), verifies header fields, the bottom-up row flip (the
    top-left pixel is the LAST stored row), and closed-form channel
    sums against an independent Python recomputation."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        decode_bmp,
        synth_bmp_bytes,
    )

    for doc_id in [0, 1, 2, 3, 7, 12, 123, 9999]:
        b1, b2 = synth_bmp_bytes(doc_id), synth_bmp_bytes(doc_id)
        assert b1 == b2 and b1[:2] == b"BM"
        w, h, bpp, file_size, sr, sg, sb, tlr = decode_bmp(b1)
        assert (w, h, bpp) == (4 + doc_id % 13, 3 + doc_id % 9, 24)
        assert file_size == len(b1) == 54 + ((3 * w + 3) // 4 * 4) * h
        exp_r = sum((doc_id * 3 + 7 * x + 13 * y) % 256 for x in range(w) for y in range(h))
        exp_g = sum((doc_id * 5 + x + 7 * y) % 256 for x in range(w) for y in range(h))
        exp_b = sum((doc_id + 2 * x + 3 * y) % 256 for x in range(w) for y in range(h))
        assert (sr, sg, sb) == (exp_r, exp_g, exp_b), doc_id
        assert tlr == doc_id * 3 % 256  # image (0,0) — bottom-up flip proven


def test_png_decode_roundtrip_filters_and_crc():
    """The PNG path is a real compressed-codec round-trip: zlib IDAT,
    verified CRCs, and per-row filter cycling so every predictor
    (None/Sub/Up/Average/Paeth) is exercised. A corrupted byte must
    fail the CRC check, and pixel sums must match the closed form."""
    import pytest

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        decode_png,
        synth_png_bytes,
    )

    for doc_id in [0, 1, 2, 3, 4, 7, 12, 123, 9999]:
        b = synth_png_bytes(doc_id)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, depth, ctype, n_chunks, sr, sg, sb, tlr = decode_png(b)
        assert (w, h, depth, ctype, n_chunks) == (3 + doc_id % 11, 2 + doc_id % 7, 8, 2, 3)
        exp_r = sum((doc_id * 3 + 7 * x + 13 * y) % 256 for x in range(w) for y in range(h))
        exp_g = sum((doc_id * 5 + x + 7 * y) % 256 for x in range(w) for y in range(h))
        exp_b = sum((doc_id + 2 * x + 3 * y) % 256 for x in range(w) for y in range(h))
        assert (sr, sg, sb, tlr) == (exp_r, exp_g, exp_b, doc_id * 3 % 256), doc_id

    # bit-flip inside the IDAT payload → CRC failure, not silent garbage
    b = bytearray(synth_png_bytes(42))
    b[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|PNG"):
        decode_png(bytes(b))


def test_gif_lzw_roundtrip_including_width_growth_and_reset():
    """The GIF LZW pair must round-trip arbitrary index streams,
    including streams long enough to force every code-width bump up
    to 12 bits and the 4096-entry table reset, plus the KwKwK case
    (a code that references the entry being defined)."""
    import random

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rng = random.Random(7)
    for n, alpha, mcs in [(1, 4, 2), (10, 4, 2), (60, 16, 4), (5000, 4, 2), (60000, 8, 3)]:
        seq = [rng.randrange(alpha) for _ in range(n)]
        assert list(_lzw_decode_gif(_lzw_encode_gif(seq, mcs), mcs)) == seq, (n, alpha)
    # highly repetitive stream drives the KwKwK path immediately
    seq = [0, 1] * 50
    assert list(_lzw_decode_gif(_lzw_encode_gif(seq, 2), 2)) == seq
    # 200k symbols over a 2-symbol alphabet crosses 4096 codes (reset)
    seq = [rng.randrange(2) for _ in range(200_000)]
    assert list(_lzw_decode_gif(_lzw_encode_gif(seq, 2), 2)) == seq


def test_gif_container_decode_matches_closed_form():
    """decode_gif_frames on synth_gif_bytes must recover dimensions,
    frame count, accumulated presentation timestamps, and palette-
    mapped channel sums exactly — and reject a truncated container."""
    import pytest

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        decode_gif_frames,
        synth_gif_bytes,
    )

    for doc_id in [0, 1, 2, 3, 4, 7, 12, 123, 9999]:
        b = synth_gif_bytes(doc_id)
        assert b[:6] == b"GIF89a" and b[-1] == 0x3B
        w, h, nf, frames = decode_gif_frames(b)
        assert (w, h, nf) == (3 + doc_id % 8, 2 + doc_id % 5, 2 + doc_id % 5)
        nc = 1 << (2 + doc_id % 3)
        delay = 4 + doc_id % 7
        assert len(frames) == nf
        for fid, pts, sr, sg, sb in frames:
            assert pts == fid * delay * 10
            idx = [(doc_id + 2 * x + 3 * y + 5 * fid) % nc for y in range(h) for x in range(w)]
            assert sr == sum((doc_id * 3 + i * 11) % 256 for i in idx), (doc_id, fid)
            assert sg == sum((doc_id * 5 + i * 17) % 256 for i in idx), (doc_id, fid)
            assert sb == sum((doc_id + i * 23) % 256 for i in idx), (doc_id, fid)

    with pytest.raises(ValueError, match="GIF"):
        decode_gif_frames(b"NOTAGIF" + bytes(40))


def test_global_islands_matches_single_window_reference(spark):
    """global_islands (bucketed + boundary-chain merge) must produce
    EXACTLY the islands a global single-partition window would: the
    crafted stream has islands fully inside a bucket, an island
    crossing one boundary, and one chaining through several buckets
    (every bucket-boundary gap small), plus a gap that lands exactly
    ON a boundary."""
    import pyspark.sql.functions as F

    from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import (
        global_islands,
    )

    GAP = 100  # us
    BKT = 1000  # us
    # timestamps in us (as timestamps): islands by the GAP rule:
    # [10,50,120], [400], [950,1040,...,1990 step 90 → chains buckets],
    # [5000]
    chain = list(range(950, 2000, 90))
    # 7800|7950 = a 2-island bucket (gap 150 > GAP) whose SECOND island
    # is continued by the next bucket (8040-7950 = 90 <= GAP): the
    # remap must target (bucket 7, lid 2), not the bucket's first
    # island — the n_isl>1 head-resolution path.
    us_list = [10, 50, 120, 400] + chain + [5000, 7800, 7950, 8040, 8130, 9500]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(us_list)], "event_id long, us long"
    ).select("event_id", F.timestamp_micros(F.col("us")).alias("ts"))

    out = global_islands(df, "ts", ["event_id"], gap_us=GAP, bucket_us=BKT)
    got = {
        tuple(sorted(r["ids"]))
        for r in out.groupBy("__island").agg(F.collect_list("event_id").alias("ids")).collect()
    }

    # single-window reference computed in plain python
    ref, cur = [], []
    prev = None
    for i, u in enumerate(us_list):
        if prev is not None and u - prev > GAP:
            ref.append(tuple(cur))
            cur = []
        cur.append(i)
        prev = u
    ref.append(tuple(cur))
    assert got == set(ref), (got, ref)


def test_countmin_never_underestimates_and_merges(spark):
    """Count-min invariants beyond the hash oracle: estimates are
    >= true counts everywhere (one-sided error), and the sketch is
    MERGEABLE — cells built from two corpus halves add up to the
    full-corpus cells (the property that makes it a partial-agg /
    streaming citizen)."""
    import pyspark.sql.functions as F

    out = REG["agg_countmin_sketch"].fn(spark, SF_ORACLE)
    bad = out.filter(F.col("overestimate") < 0).count()
    assert bad == 0
    # at least one word must collide somewhere for the test to bite
    assert out.count() > 0

    # mergeability: rebuild cells from doc_id halves and compare sums
    from hadoop_based_distributed_batch_processing_system_spark.operators.aggregates import (
        _CM_COL_SPARK,
        _CM_D,
    )

    docs = load_table(spark, SF_ORACLE, "documents")

    def cells_of(df):
        wc = (df.select(F.explode(F.split("text", " ")).alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
        rows = None
        for i in range(_CM_D):
            r = wc.select(F.lit(i).alias("row_id"),
                          F.expr(_CM_COL_SPARK.format(i=i)).cast("long").alias("col_id"), "n")
            rows = r if rows is None else rows.unionByName(r)
        return rows.groupBy("row_id", "col_id").agg(F.sum("n").alias("cell"))

    full = {(r["row_id"], r["col_id"]): r["cell"] for r in cells_of(docs).collect()}
    lo = cells_of(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    hi = cells_of(docs.filter(F.col("doc_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(lo) + list(hi):
        k = (r["row_id"], r["col_id"])
        merged[k] = merged.get(k, 0) + r["cell"]
    assert merged == full


def test_pq_adc_recall_and_determinism(spark):
    """PQ sanity beyond the hash oracle: deterministic output, probe
    excluded, ADC distances non-negative and non-decreasing, and
    recall vs exact quantized-L2 top-10 at the level this untrained
    (first-16-vectors) codebook achieves on this corpus (>= 2/10;
    production trains the codebook with Lloyd iterations and
    re-ranks survivors exactly)."""
    import math

    a = REG["sim_search_pq"].fn(spark, SF_ORACLE).collect()
    b = REG["sim_search_pq"].fn(spark, SF_ORACLE).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    dists = [r["adc_dist"] for r in a]
    assert dists == sorted(dists) and dists[0] >= 0

    emb = load_table(spark, SF_ORACLE, "embeddings").collect()
    qv = {r["vec_id"]: [math.floor(x * 64) for x in r["embedding"]] for r in emb}
    pid = min(qv)
    p = qv[pid]
    assert pid not in {r["vec_id"] for r in a}
    exact = sorted(
        ((sum((x - y) ** 2 for x, y in zip(v, p)), k) for k, v in qv.items() if k != pid)
    )[:10]
    overlap = {r["vec_id"] for r in a} & {k for _, k in exact}
    assert len(overlap) >= 2, overlap


def test_bpe_train_matches_sequential_reference(spark):
    """The distributed merge loop reproduces a straightforward
    sequential BPE trainer (greedy left-to-right merge application,
    count-desc + lexicographic argmax) exactly, rank by rank."""
    from collections import Counter

    from hadoop_based_distributed_batch_processing_system_spark.operators.text import _BPE_MERGES

    out = (
        REG["bpe_train_merges"].fn(spark, SF_ORACLE).toPandas().sort_values("merge_rank")
    )
    toks = (
        load_table(spark, SF_ORACLE, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .count()
        .toPandas()
    )
    vocab = {w: (list(w), int(c)) for w, c in zip(toks["w"], toks["count"])}
    expect = []
    for r in range(1, _BPE_MERGES + 1):
        pc = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((r, a, b, a + b, n))
        for w, (syms, c) in vocab.items():
            merged = []
            for s in syms:
                if merged and merged[-1] == a and s == b:
                    merged[-1] = a + b
                else:
                    merged.append(s)
            vocab[w] = (merged, c)
    got = [tuple(x) for x in out[["merge_rank", "sym_left", "sym_right", "merged", "n"]].itertuples(index=False)]
    assert got == expect


def test_jpeg_decode_roundtrip_dc_closed_form():
    """The JPEG path is a real entropy-codec round-trip: canonical
    Huffman tables rebuilt from the file's own DHT segments, byte
    stuffing, DC prediction with EXTEND, zigzag dequant and the float
    IDCT. DC-only constant blocks make every decoded pixel closed-form
    (128 + 2*dcq with the uniform Q=16 table)."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg_bytes,
    )

    for doc_id in [0, 1, 2, 3, 5, 11, 31, 32, 123, 9999]:
        bw, bh = 2 + doc_id % 4, 1 + doc_id % 3
        w, h, nb, sp, tl, ldc = decode_jpeg(synth_jpeg_bytes(doc_id))
        exp_sum = sum(
            64 * (128 + 2 * (((doc_id + 5 * b) % 32) - 16)) for b in range(bw * bh)
        )
        assert (w, h, nb) == (bw * 8, bh * 8, bw * bh), doc_id
        assert sp == exp_sum, doc_id
        assert tl == 128 + 2 * ((doc_id % 32) - 16), doc_id
        assert ldc == ((doc_id + 5 * (bw * bh - 1)) % 32) - 16, doc_id


def test_jpeg_nonzero_ac_path_matches_numpy_idct():
    """The general AC entropy path — run/size symbols, a >15 zero run
    forcing ZRL, negative coefficients exercising EXTEND on both DC
    and AC — must decode to exactly the NumPy IDCT reference of the
    same quantized coefficients. This is the half of the decoder the
    DC-only hash oracle cannot reach."""
    import numpy as np

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        _JPEG_Q,
        _jpeg_idct_2d,
        decode_jpeg,
        synth_jpeg_from_blocks,
    )

    blocks = []
    # block 0: dense low-frequency ACs, mixed signs
    b0 = [0] * 64
    b0[0], b0[1], b0[8], b0[9], b0[2] = 5, 3, -4, 2, -7
    blocks.append(b0)
    # block 1: negative DC delta + an AC after a 17-zero run (ZRL path)
    b1 = [0] * 64
    b1[0] = -9
    # zigzag index 20 (natural 40) leaves a run > 15 after index 2
    b1[40], b1[16] = 6, -1
    blocks.append(b1)
    # block 2: max-size-ish coefficients at the tail of the zigzag
    b2 = [0] * 64
    b2[0], b2[63] = 12, -3
    blocks.append(b2)
    payload = synth_jpeg_from_blocks(blocks, bw=3, bh=1)
    w, h, nb, sp, tl, ldc, got = decode_jpeg(payload, return_blocks=True)
    assert (w, h, nb) == (24, 8, 3)
    for blk, px in zip(blocks, got):
        coef = np.array(blk, dtype=float).reshape(8, 8) * _JPEG_Q
        ref = np.clip(np.round(_jpeg_idct_2d(coef) + 128), 0, 255).astype(int)
        assert (px == ref).all()


def test_semantic_lsh_production_threshold_recall(spark):
    """The PRODUCTION-regime pin (VERDICT r10 item 5): BASELINE.md
    claims band-collision p ≈ 0.997 for true semantic duplicates
    (cosine ≥ 0.9) — this plants 100 deterministic near-duplicate
    twins (cos(v, twin) = 1/sqrt(1 + 0.35²) ≈ 0.944, built from the
    corpus's own vectors plus a fixed-size orthogonal nudge) and
    requires the banded pipeline at threshold 0.9 to recover ≥ 95%
    of them. The toy-threshold floor (0.45 at cosine 0.3, test
    above) is the documented LOW end of the same banding curve."""
    import numpy as np

    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        semantic_lsh_pairs,
    )
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    base = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .filter("vec_id < 100")
        .toPandas()
        .sort_values("vec_id")
    )
    eps = 0.35
    rows = []
    for vec_id, emb in zip(base["vec_id"], base["embedding"]):
        v = np.asarray(emb, dtype=np.float64)
        vn = v / np.linalg.norm(v)
        # deterministic reference direction, orthogonalized against v
        r = np.cos(np.arange(v.size) * (int(vec_id) + 2.0))
        o = r - (r @ vn) * vn
        twin = vn + eps * (o / np.linalg.norm(o))
        rows.append((int(vec_id), [float(x) for x in vn]))
        rows.append((int(vec_id) + 1_000_000, [float(x) for x in twin]))
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    found = semantic_lsh_pairs(emb_df, 0.9).toPandas()
    planted = {(int(i), int(i) + 1_000_000) for i in base["vec_id"]}
    hits = {(r.id_a, r.id_b) for r in found.itertuples()} & planted
    recall = len(hits) / len(planted)
    assert recall >= 0.95, f"production-threshold banding recall: {recall}"
    # every planted hit carries the exact verified cosine
    expect = 1.0 / np.sqrt(1.0 + eps * eps)
    for r in found.itertuples():
        if (r.id_a, r.id_b) in planted:
            assert abs(r.cosine - expect) < 1e-9


def test_ann_ivf_persisted_recall_and_no_retrain(spark, monkeypatch):
    """The persisted-index query path must (a) keep the per-call
    trainer's recall floor, and (b) actually SERVE from the persisted
    index: after the build exists, the trainer is poisoned — any
    retrain attempt fails the test."""
    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim

    # ensure the index is built, then poison the trainer
    sim._ivf_index_build(spark, SF_ORACLE)

    def _poisoned(*a, **k):
        raise AssertionError("persisted path retrained the IVF index")

    monkeypatch.setattr(sim, "_ivf_train_centroids", _poisoned)
    ann = REG["sim_search_ann_ivf_persisted"].fn(spark, SF_ORACLE).toPandas()
    assert (ann["rk"] >= 1).all() and (ann["rk"] <= 5).all()
    assert not (ann["q_id"] == ann["n_id"]).any()

    emb = with_norm(load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding"))
    a, b = emb.alias("a"), emb.alias("b")
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    bf1 = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("q_id"), F.col("b.vec_id").alias("n_id"), pair_cosine().alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("q_id", "n_id")
        .toPandas()
    )
    truth = dict(zip(bf1.q_id, bf1.n_id))
    got: dict = {}
    for r in ann.itertuples():
        got.setdefault(r.q_id, set()).add(r.n_id)
    recall = sum(1 for q, n in truth.items() if n in got.get(q, set())) / len(truth)
    assert recall >= 0.7, f"persisted-IVF recall degraded: {recall}"


def test_semantic_lsh_multiprobe_mid_similarity_regime(spark):
    """The regime multiprobe EXISTS for (VERDICT r11 item 8): 100
    deterministic twins planted at cos ≈ 0.70, mined at threshold
    0.65. Measured on this fixture: exact banding recalls 0.84,
    1-bit multiprobe 1.00, for a candidate (verify-stage) volume of
    3697 → 14657 of 19900 all-pairs — the probe factor is bounded by
    the constant 1+bits, and the verify stage stays BELOW brute
    force even over this worst-case near-orthogonal background. The
    pins are slightly slack against corpus regeneration."""
    import numpy as np

    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        _SEMLSH_BITS,
        semantic_lsh_pairs,
    )
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    base = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .filter("vec_id < 100")
        .toPandas()
        .sort_values("vec_id")
    )
    target_cos = 0.70
    eps = float(np.sqrt(1.0 / target_cos**2 - 1.0))
    rows = []
    for vec_id, emb in zip(base["vec_id"], base["embedding"]):
        v = np.asarray(emb, dtype=np.float64)
        vn = v / np.linalg.norm(v)
        r = np.cos(np.arange(v.size) * (int(vec_id) + 2.0))
        o = r - (r @ vn) * vn
        twin = vn + eps * (o / np.linalg.norm(o))
        rows.append((int(vec_id), [float(x) for x in vn]))
        rows.append((int(vec_id) + 1_000_000, [float(x) for x in twin]))
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = {(int(i), int(i) + 1_000_000) for i in base["vec_id"]}
    thr = 0.65

    def recall(probe_bits):
        found = semantic_lsh_pairs(emb_df, thr, probe_bits=probe_bits).toPandas()
        return len({(r.id_a, r.id_b) for r in found.itertuples()} & planted) / len(planted)

    r_exact, r_probe = recall(0), recall(1)
    assert r_probe >= 0.95, f"multiprobe mid-regime recall: {r_probe}"
    assert r_probe > r_exact, "the probe side must buy recall here"
    assert r_exact >= 0.5, f"exact-band sanity floor: {r_exact}"
    # cost: threshold -1 keeps every candidate -> verify-stage volume
    cand_exact = semantic_lsh_pairs(emb_df, -1.0, probe_bits=0).count()
    cand_probe = semantic_lsh_pairs(emb_df, -1.0, probe_bits=1).count()
    all_pairs = len(rows) * (len(rows) - 1) // 2
    assert cand_probe < all_pairs, "multiprobe verify must stay below brute force"
    assert cand_probe <= (1 + _SEMLSH_BITS) * cand_exact, "probe factor exceeded 1+bits"


def test_semantic_lsh_multiprobe_superset_and_recall(spark):
    """1-bit multiprobe must find every exact-band pair PLUS the
    near-miss bands: superset of the exact-band result, recall vs
    brute force >= 0.9 at the toy threshold (measured 0.966 —
    deterministic: same md5 planes, same corpus), precision 1.0 by
    the exact-cosine verify."""
    mp = REG["dedup_semantic_lsh_multiprobe"].fn(spark, SF_ORACLE).toPandas()
    ex = REG["dedup_semantic_lsh"].fn(spark, SF_ORACLE).toPandas()
    truth = REG["dedup_embedding_cosine"].fn(spark, SF_ORACLE).toPandas()
    mset = {(r.id_a, r.id_b) for r in mp.itertuples()}
    eset = {(r.id_a, r.id_b) for r in ex.itertuples()}
    tmap = {(r.id_a, r.id_b): r.cosine for r in truth.itertuples()}
    assert eset <= mset, "multiprobe lost exact-band pairs"
    for r in mp.itertuples():
        assert (r.id_a, r.id_b) in tmap and r.cosine == tmap[(r.id_a, r.id_b)]
    assert len(mset) / len(tmap) >= 0.9, f"multiprobe recall: {len(mset)/len(tmap)}"


def test_ann_ivf_delta_appends_without_retrain(spark, monkeypatch):
    """Incremental index maintenance (VERDICT r12 item 6): the delta
    append must NOT retrain (trainer poisoned after the base build),
    the delta commit must be a pure add on the index log, and the
    query path must find every appended vector's base twin at rank 1
    with cosine ~1 (the freshness contract: data appended a commit
    ago is findable without a rebuild) — which also pins base+delta
    recall at 1.0 on the delta batch, at or above any base floor."""
    import json
    import os

    import shutil

    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
    )

    # fresh index root: the drift test (and any crashed prior run)
    # legitimately leaves delta commits behind — the single-delta log
    # assertion below needs a deterministic starting state
    shutil.rmtree(sim._ivf_index_root(SF_ORACLE), ignore_errors=True)
    sim._ivf_index_build(spark, SF_ORACLE)

    def _poisoned(*a, **k):
        raise AssertionError("delta append retrained the IVF index")

    monkeypatch.setattr(sim, "_ivf_train_centroids", _poisoned)
    root = sim._ivf_index_append_delta(spark, SF_ORACLE)
    latest = _tlog_latest_version(root)
    delta_commits = [
        json.load(open(os.path.join(root, "_log", f"{v:06d}.json")))
        for v in range(latest + 1)
    ]
    deltas = [
        c for c in delta_commits
        if any(n.startswith("file_postings_delta") for n in c["add"])
    ]
    assert len(deltas) == 1
    assert deltas[0]["remove"] == []  # pure append: base generation intact

    ann = REG["sim_search_ann_ivf_delta"].fn(spark, SF_ORACLE).toPandas()
    assert (ann["rk"] >= 1).all() and (ann["rk"] <= 5).all()
    top1 = ann[ann.rk == 1].set_index("q_id")
    n_delta = (
        load_table(spark, SF_ORACLE, "embeddings")
        .filter(F.col("vec_id") % sim._IVF_DELTA_MOD == 3)
        .count()
    )
    assert len(top1) == n_delta  # every appended vector is served
    twins = (
        (top1.index - sim._IVF_DELTA_OFFSET == top1.n_id)
        | (top1.cosine > 0.999999)
    ).mean()
    assert twins == 1.0, f"delta freshness degraded: twin@1 = {twins}"


def test_ann_ivf_delta_drift_triggers_generation_rebuild(spark, monkeypatch):
    """Past the drift threshold the append path must hand off to the
    full generation rebuild instead of stacking deltas (the
    ingest→OPTIMIZE loop applied to the index)."""
    import shutil

    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim

    # fresh root: an already-committed delta is ADOPTED before the
    # threshold is consulted (its threshold was evaluated when it
    # landed), so the drift decision needs a delta-free log
    shutil.rmtree(sim._ivf_index_root(SF_ORACLE), ignore_errors=True)
    root = sim._ivf_index_build(spark, SF_ORACLE)
    called = {}

    def _fake_refresh(spark_, sf_dir_):
        called["yes"] = True
        return root

    monkeypatch.setattr(sim, "_ivf_index_refresh", _fake_refresh)
    monkeypatch.setattr(sim, "_IVF_DELTA_REBUILD_FRACTION", 0.0)
    got = sim._ivf_index_append_delta(spark, SF_ORACLE)
    assert called.get("yes") and got == root


def test_ann_ivf_delta_multibatch_and_rebuild_folds(spark, monkeypatch):
    """Multi-batch delta maintenance (VERDICT r13 item 4 + ADVICE
    r13): two distinct append batches land as their OWN idempotent
    delta commits against one generation, both findable at rank 1;
    a drift-triggered rebuild then retrains a new generation AND
    FOLDS every outstanding batch back in against the new centroids
    — the appended vectors must not vanish, and the maintenance loop
    must converge (re-running the registry path after the rebuild
    adopts the folded delta instead of retraining again)."""
    import os
    import shutil

    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
    )

    root = sim._ivf_index_root(SF_ORACLE)
    shutil.rmtree(root, ignore_errors=True)
    sim._ivf_index_build(spark, SF_ORACLE)

    def _live():
        return {
            os.path.basename(p)
            for p in _tlog_live_files(root, _tlog_latest_version(root))
        }

    def _gen(live):
        return next(
            int(n.rsplit("_g", 1)[1])
            for n in live
            if n.startswith("file_centroids")
        )

    def _poisoned(*a, **k):
        raise AssertionError("delta append retrained the IVF index")

    monkeypatch.setattr(sim, "_ivf_train_centroids", _poisoned)
    sim._ivf_index_append_delta(spark, SF_ORACLE, batch=0)
    sim._ivf_index_append_delta(spark, SF_ORACLE, batch=1)
    live = _live()
    gen = _gen(live)
    assert {
        f"file_postings_delta_g{gen}_b0",
        f"file_postings_delta_g{gen}_b1",
    } <= live
    # idempotence per batch: a replayed append commits nothing
    v_before = _tlog_latest_version(root)
    os.unlink(os.path.join(root, "_DELTA_b1"))  # lost stamp: must adopt
    sim._ivf_index_append_delta(spark, SF_ORACLE, batch=1)
    assert _tlog_latest_version(root) == v_before
    # batch 1's vectors are findable at rank 1 (freshness across batches)
    top1 = (
        sim._ivf_serve_base_plus_delta(
            spark, root, sim._ivf_delta_frame(spark, SF_ORACLE, batch=1)
        )
        .filter("rk = 1")
        .toPandas()
        .set_index("q_id")
    )
    twins = (
        (top1.index - 2 * sim._IVF_DELTA_OFFSET == top1.n_id)
        | (top1.cosine > 0.999999)
    ).mean()
    assert twins == 1.0, f"batch-1 freshness degraded: twin@1 = {twins}"

    # drift: a rebuild must retrain (poison lifted) and FOLD b0+b1+b2
    monkeypatch.undo()
    monkeypatch.setattr(sim, "_IVF_DELTA_REBUILD_FRACTION", 0.0)
    sim._ivf_index_append_delta(spark, SF_ORACLE, batch=2)
    live2 = _live()
    gen2 = _gen(live2)
    assert gen2 > gen, "drift must hand off to a full generation rebuild"
    assert {
        f"file_postings_delta_g{gen2}_b0",
        f"file_postings_delta_g{gen2}_b1",
        f"file_postings_delta_g{gen2}_b2",
    } <= live2, "rebuild must fold every outstanding batch into the new generation"
    assert not any(f"_g{gen}_" in n for n in live2), "old generation must be gone"
    # convergence: the registry path (batch 0) now ADOPTS its folded
    # delta — no retrain-per-invocation loop (trainer re-poisoned)
    monkeypatch.setattr(sim, "_ivf_train_centroids", _poisoned)
    v_after = _tlog_latest_version(root)
    sim._ivf_index_append_delta(spark, SF_ORACLE, batch=0)
    assert _tlog_latest_version(root) == v_after
    # and batch 0 is still served, rank-1 fresh, through the new gen
    top1 = (
        sim._ivf_serve_base_plus_delta(
            spark, root, sim._ivf_delta_frame(spark, SF_ORACLE, batch=0)
        )
        .filter("rk = 1")
        .toPandas()
        .set_index("q_id")
    )
    twins = (
        (top1.index - sim._IVF_DELTA_OFFSET == top1.n_id)
        | (top1.cosine > 0.999999)
    ).mean()
    assert twins == 1.0, f"fold lost appended vectors: twin@1 = {twins}"
    # leave a clean root: later registry runs must not union this
    # test's extra batches
    shutil.rmtree(root, ignore_errors=True)


def test_ann_ivf_vacuum_reclaims_superseded_generation(spark):
    """Generation-aware index vacuum (r15): after the forced retrain,
    only generation 1 is live; g0's bytes are gone and recorded in
    _VACUUMED; time travel below the horizon fails with the vacuum's
    descriptive error; and the served result equals the plain
    persisted op's (deterministic training -> identical centroids on
    both roots — vacuum must be invisible to answers)."""
    import os

    import pytest

    import hadoop_based_distributed_batch_processing_system_spark.operators.similarity as sim
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
    )
    from hadoop_based_distributed_batch_processing_system_spark.registry import (
        load_all,
    )

    registry = load_all()
    got = sorted(
        map(
            tuple,
            registry["sim_search_ann_ivf_vacuumed"].fn(spark, SF_ORACLE).collect(),
        )
    )
    root = sim._ivf_vacuum_root(SF_ORACLE)
    latest = _tlog_latest_version(root)
    assert latest == 1
    live = {os.path.basename(p) for p in _tlog_live_files(root, 1)}
    assert live == {"file_centroids_g1", "file_postings_g1"}
    on_disk = {d for d in os.listdir(root) if d.startswith("file_")}
    assert on_disk == live  # superseded generation bytes reclaimed
    vac = set(open(os.path.join(root, "_VACUUMED")).read().split())
    assert vac == {"file_centroids_g0", "file_postings_g0"}
    with pytest.raises(RuntimeError, match="vacuumed"):
        _tlog_live_files(root, 0)
    want = sorted(
        map(
            tuple,
            registry["sim_search_ann_ivf_persisted"].fn(spark, SF_ORACLE).collect(),
        )
    )
    assert got == want


def test_ann_ivf_quantized_recall_and_scan_fraction(spark):
    """The hash-oracled quantized IVF (VERDICT r15 #7) must stay an
    honest ANN: recall@10 vs the exact quantized brute force holds a
    floor (measured 0.9 at sf0.01, 1.0 at sf0.001), and the probed
    lists cover strictly less than the corpus (nprobe=2 of K=8 — a
    'quantized IVF' that scanned everything would be a brute force
    wearing the name)."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _IVFQ_DIM,
        _IVFQ_K,
        _IVFQ_NPROBE,
        _IVFQ_SCALE,
        _IVFQ_TOPK,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
            f"* {_IVFQ_SCALE}) AS BIGINT))"
        ).alias("qv"),
    )
    probe = base.orderBy("vec_id").limit(1).collect()[0]
    pv, pid = list(probe["qv"]), probe["vec_id"]
    pv_sql = "array(" + ", ".join(str(x) for x in pv) + ")"
    d2 = (
        f"aggregate(sequence(0, {_IVFQ_DIM} - 1), CAST(0 AS BIGINT), "
        f"(a, d) -> a + (qv[d] - {pv_sql}[d]) * (qv[d] - {pv_sql}[d]))"
    )
    exact = {
        r["vec_id"]
        for r in base.filter(F.col("vec_id") != pid)
        .select("vec_id", F.expr(d2).alias("d"))
        .orderBy("d", "vec_id")
        .limit(_IVFQ_TOPK)
        .collect()
    }
    ann_df = REG["sim_search_ann_ivf_quantized"].fn(spark, SF_ORACLE)
    ann = {r["vec_id"] for r in ann_df.collect()}
    recall = len(ann & exact) / _IVFQ_TOPK
    assert recall >= 0.7, f"quantized-IVF recall degraded: {recall}"
    assert _IVFQ_NPROBE < _IVFQ_K  # scan fraction strictly < 1
    # monotone exact scores: the ANN's own results are true distances
    dists = [r["q_dist"] for r in ann_df.collect()]
    assert dists == sorted(dists) and len(dists) == _IVFQ_TOPK


def test_ivfq_persisted_prunes_lists_and_generations_vacuum(spark, tmp_path):
    """Persisted quantized index pins: (a) the serve plan touches
    ONLY the probed clusters' list groups (file-level pruning —
    nprobe of K groups, via inputFiles); (b) repeat invocations serve
    the stamped index without rebuilding (index file mtimes stable);
    (c) a retrain is an atomic add+remove commit producing a NEW
    generation, and vacuum below it makes the old generation's
    time travel fail descriptively — the float index family's
    generation discipline on the hash-oracled rung."""
    import os
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _IVFQ_K,
        _IVFQ_NPROBE,
        _ivfq_index_build,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
        _tlog_vacuum,
    )
    from tests.conftest import SF_ORACLE

    root = str(tmp_path / "ivfq")
    _ivfq_index_build(spark, SF_ORACLE, root)
    assert _tlog_latest_version(root) == 0  # generation 0

    # (b) no rebuild on re-entry
    mtimes = {
        p: os.stat(p).st_mtime_ns
        for p in _tlog_live_files(root, 0)
    }
    _ivfq_index_build(spark, SF_ORACLE, root)
    assert mtimes == {p: os.stat(p).st_mtime_ns for p in mtimes}

    # (a) the registry op (shared /tmp root) prunes to nprobe lists
    ann = REG["sim_search_ann_ivf_quantized_persisted"].fn(spark, SF_ORACLE)
    touched = {
        m.group(1)
        for f in ann.inputFiles()
        if (m := re.search(r"/(file_qlist\d+_g\d+)/", f))
    }
    assert len(touched) == _IVFQ_NPROBE
    assert _IVFQ_NPROBE < _IVFQ_K
    assert len(ann.collect()) == 10

    # (c) force a retrain on the private root: stale stamp -> new
    # generation as one add+remove commit; vacuum retires gen 0
    os.unlink(os.path.join(root, "_BUILT"))
    _ivfq_index_build(spark, SF_ORACLE, root)
    assert _tlog_latest_version(root) == 1
    g1 = {os.path.basename(p) for p in _tlog_live_files(root, 1)}
    assert all(n.endswith("_g1") for n in g1)
    deleted = _tlog_vacuum(root, retain_version=1)
    assert deleted and all(n.endswith("_g0") for n in deleted)
    with pytest.raises(RuntimeError, match="vacuumed"):
        _tlog_live_files(root, 0)


def test_ivfq_delta_is_add_only_and_served_with_base(spark):
    """Quantized-delta pins: the append is ONE add-only commit of
    per-cluster delta groups assigned under the BASE generation's
    centroids (no retrain — centroid group mtime stable), and the
    serve plan reads base AND delta groups for the probed clusters
    only."""
    import json
    import os
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _IVFQ_NPROBE,
        _ivfq_delta_root,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
    )
    from tests.conftest import SF_ORACLE

    ann = REG["sim_search_ann_ivf_quantized_delta"].fn(spark, SF_ORACLE)
    root = _ivfq_delta_root(SF_ORACLE)
    head = _tlog_latest_version(root)
    assert head == 1  # gen-0 build + one delta commit
    c = json.load(open(os.path.join(root, "_log", "000001.json")))
    assert c["remove"] == [] and c["add"]
    assert all(g.startswith("file_qdlist") for g in c["add"])
    touched = {
        m.group(1)
        for f in ann.inputFiles()
        if (m := re.search(r"/(file_qd?list\d+_[^/]+)/", f))
    }
    base_touched = {t for t in touched if t.startswith("file_qlist")}
    delta_touched = {t for t in touched if t.startswith("file_qdlist")}
    assert len(base_touched) == _IVFQ_NPROBE  # every probed cluster's base
    assert delta_touched  # and its delta groups where the batch landed
    clusters = {
        int(re.match(r"file_qd?list(\d+)_", t).group(1)) for t in touched
    }
    assert len(clusters) == _IVFQ_NPROBE
    assert len(ann.collect()) == 10


def test_ivfq_compaction_folds_debt_as_datachange_false(spark):
    """Quantized-index compaction pins: (a) the fold commit is
    dataChange:false and removes every folded base+delta group while
    adding one merged group per debt-carrying cluster; (b) after the
    fold, the serve plan touches exactly nprobe groups again (the
    delta read debt is paid); (c) per-cluster row counts are
    conserved through the fold; (d) re-compacting is a no-op."""
    import os
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _IVFQ_NPROBE,
        _ivfq_compact_root,
        _ivfq_index_compact,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
    )
    from tests.conftest import SF_ORACLE

    ann = REG["sim_search_ann_ivf_quantized_compacted"].fn(spark, SF_ORACLE)
    root = _ivfq_compact_root(SF_ORACLE)
    head = _tlog_latest_version(root)
    assert head == 2  # build, delta, fold
    import json

    c = json.load(open(os.path.join(root, "_log", "000002.json")))
    assert c.get("dataChange") is False
    assert all(g.startswith("file_qdlist") or g.startswith("file_qlist")
               for g in c["remove"])
    assert any(g.startswith("file_qdlist") for g in c["remove"])
    assert all(re.match(r"file_qlist\d+_m2$", g) for g in c["add"])
    # (b) nprobe groups, no delta groups in the plan
    touched = {
        m.group(1)
        for f in ann.inputFiles()
        if (m := re.search(r"/(file_qd?list\d+_[^/]+)/", f))
    }
    assert len(touched) == _IVFQ_NPROBE
    assert not any(t.startswith("file_qdlist") for t in touched)
    # (c) row conservation: v2 live lists hold v1's union
    def rows_at(v):
        lists = [
            p for p in _tlog_live_files(root, v)
            if "list" in os.path.basename(p)
        ]
        return spark.read.parquet(*lists).count()

    assert rows_at(2) == rows_at(1)
    # (d) idempotence: nothing left to fold
    assert _ivfq_index_compact(spark, root) == head


def test_ivfq_drift_rebuild_trigger_both_sides(spark, tmp_path):
    """Drift-rebuild pins: (a) below the threshold nothing happens —
    no commit, no file churn; (b) above it, ONE add+remove commit
    publishes generation 1 with RESEEDED centroids over base ∪ delta
    and (c) a second sweep is a no-op (drift resets to 0 — the delta
    groups retired into the new generation); (d) vacuum then retires
    generation 0 and its time travel fails descriptively."""
    import os

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _ivfq_drift,
        _ivfq_index_append_delta,
        _ivfq_index_build,
        _ivfq_maybe_rebuild,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
        _tlog_vacuum,
    )
    from tests.conftest import SF_ORACLE

    root = str(tmp_path / "ivfqr")
    _ivfq_index_build(spark, SF_ORACLE, root)
    # (a) no delta yet: drift 0, no-op
    rebuilt, drift, v = _ivfq_maybe_rebuild(spark, root)
    assert (rebuilt, drift, v) == (False, 0.0, 0)
    _ivfq_index_append_delta(spark, SF_ORACLE, root)
    drift = _ivfq_drift(root)
    assert drift > 0.05  # the 1/17 slice exceeds the dial
    # a HIGHER threshold: still a no-op (the dial is honored)
    rebuilt, _d, v = _ivfq_maybe_rebuild(spark, root, threshold=0.5)
    assert not rebuilt and v == 1
    # (b) the real trigger
    rebuilt, _d, v = _ivfq_maybe_rebuild(spark, root)
    assert rebuilt and v == 2
    live = {os.path.basename(p) for p in _tlog_live_files(root, 2)}
    assert all(n.endswith("_g2") for n in live)
    assert not any(n.startswith("file_qdlist") for n in live)
    # (c) drift reset: a second sweep does nothing
    assert _ivfq_maybe_rebuild(spark, root) == (False, 0.0, 2)
    # (d) vacuum retires the superseded generations
    deleted = _tlog_vacuum(root, retain_version=2)
    assert deleted
    with pytest.raises(RuntimeError, match="vacuumed"):
        _tlog_live_files(root, 0)


def test_ivfq_vacuumed_retention_floor_and_refusal(spark):
    """VERDICT r16 #5 pins for `sim_search_ann_ivf_quantized_vacuumed`
    (what the hash can't see): (a) the lifecycle ends with generation
    0 and the delta groups physically reclaimed while every head
    group survives; (b) time travel below the horizon refuses with
    the vacuum's descriptive error — on BOTH pre-head versions; (c)
    the catalog's head pin resolves whole (the retention floor's
    contract: whatever is pinned is readable); (d) the served result
    is identical to the rebuilt rung's (vacuum is invisible to
    answers — same retrain, same corpus); (e) re-entry is a stamped
    no-op (head file mtimes stable)."""
    import os

    from hadoop_based_distributed_batch_processing_system_spark.operators.lakehouse import (
        _tlog_catalog_latest,
        _tlog_catalog_read,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_latest_version,
        _tlog_live_files,
    )
    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _ivfq_apply_vac,
    )

    root, cat = _ivfq_apply_vac(spark, SF_ORACLE)
    head = _tlog_latest_version(root)
    assert head == 2

    # (a) superseded groups reclaimed, head groups intact
    live = {os.path.basename(p) for p in _tlog_live_files(root, head)}
    assert all(n.endswith("_g2") for n in live)
    for stale in ("file_qcent_g0", "file_qlist0_g0", "file_qdlist0_b1"):
        assert not os.path.exists(os.path.join(root, stale)), stale
    assert all(os.path.isdir(os.path.join(root, n)) for n in live)

    # (b) refusal below the horizon — descriptive, not path-not-found
    for v in (0, 1):
        with pytest.raises(RuntimeError, match="vacuumed"):
            _tlog_live_files(root, v)

    # (c) the catalog pin advanced with the retrain and resolves whole
    assert _tlog_catalog_latest(cat) == 1
    pin = _tlog_catalog_read(cat)["qidx"]
    assert pin["version"] == head
    assert spark.read.parquet(*_tlog_live_files(root, pin["version"])).count() > 0

    # (d) vacuum invisible to answers: equal to the rebuilt rung
    vac = REG["sim_search_ann_ivf_quantized_vacuumed"].fn(spark, SF_ORACLE)
    rbl = REG["sim_search_ann_ivf_quantized_rebuilt"].fn(spark, SF_ORACLE)
    assert [tuple(r) for r in vac.collect()] == [tuple(r) for r in rbl.collect()]

    # (e) stamped re-entry: no rewrite
    mtimes = {
        p: os.stat(p).st_mtime_ns for p in _tlog_live_files(root, head)
    }
    _ivfq_apply_vac(spark, SF_ORACLE)
    assert mtimes == {p: os.stat(p).st_mtime_ns for p in mtimes}


def test_ivfq_vacuumed_serve_prunes_to_probed_lists(spark):
    """S9-bkt-era pruning pin for the vacuumed rung: after the
    retrain+vacuum lifecycle the serve plan touches ONLY the probed
    clusters' generation-2 list groups (nprobe of K, via inputFiles) —
    retention added zero read amplification."""
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.similarity import (
        _IVFQ_K,
        _IVFQ_NPROBE,
    )

    ann = REG["sim_search_ann_ivf_quantized_vacuumed"].fn(spark, SF_ORACLE)
    touched = {
        m.group(1)
        for f in ann.inputFiles()
        if (m := re.search(r"/(file_q[d]?list\d+_[^/]+)/", f))
    }
    assert len(touched) == _IVFQ_NPROBE < _IVFQ_K
    assert all(t.endswith("_g2") for t in touched)  # head generation only
