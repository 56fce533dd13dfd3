"""Invariant tests for the feature-engineering operators (the hash
oracle in tests/test_oracle_parity.py is the primary check; these pin
the semantic properties a hash can't express)."""

import numpy as np
import pyspark.sql.functions as F

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

REG = load_all()


def test_feature_hashing_mass_conservation(spark):
    """Every token lands in exactly one bucket: per-doc vector sums
    equal the doc's token count, and the vector is always 32 long."""
    feats = REG["feature_hashing"].fn(spark, SF_ORACLE)
    # features is the driver-safe serialized form: comma-joined longs
    vec = F.expr("transform(split(features, ','), x -> CAST(x AS BIGINT))")
    checked = feats.select(
        "doc_id",
        F.size(vec).alias("dim"),
        F.expr(
            "aggregate(transform(split(features, ','), x -> CAST(x AS BIGINT)),"
            " CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("mass"),
    )
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens")
    )
    joined = checked.join(docs, "doc_id").toPandas()
    assert (joined["dim"] == 32).all()
    assert (joined["mass"] == joined["n_tokens"]).all()


def test_target_encoding_loo_excludes_own_row(spark):
    """The encoding must NOT equal the plain category mean (that's the
    leak); removing the own row shifts every encoding, and encodings
    within a category differ across rows with different targets."""
    enc = REG["target_encoding_loo"].fn(spark, SF_ORACLE).toPandas()
    ev = load_table(spark, SF_ORACLE, "events").select("event_id", "event_type", "value").toPandas()
    merged = enc.merge(ev, on="event_id", suffixes=("", "_src"))
    cat_mean = merged.groupby("event_type_src" if "event_type_src" in merged else "event_type")[
        "value"
    ].transform("mean")
    # leakage check: te_value is not simply the category mean
    assert (np.abs(merged["te_value"] - cat_mean) > 1e-12).any()
    # rows with distinct targets in the same category get distinct encodings
    g = merged.groupby("event_type").agg(nv=("value", "nunique"), ne=("te_value", "nunique"))
    assert (g["ne"] >= g["nv"] - 1).all()  # injective up to smoothing collisions


def test_embed_standardize_unit_moments(spark):
    """After standardization every dimension has mean ~0 and
    population std ~1 (up to the 6dp output rounding)."""
    z = REG["embed_standardize"].fn(spark, SF_ORACLE).toPandas()
    # z is serialized 6-dp fixed point; parse back to floats
    mat = np.stack(
        z["z"].map(lambda s: [int(t) / 1e6 for t in s.split(",")]).to_numpy()
    )
    assert mat.shape[1] == 64
    assert np.abs(mat.mean(axis=0)).max() < 1e-5
    assert np.abs(mat.std(axis=0) - 1.0).max() < 1e-5


def test_repetition_score_bounds_and_known_case(spark):
    pdf = REG["text_repetition_score"].fn(spark, SF_ORACLE).toPandas()
    assert ((pdf["dup_ratio"] >= 0) & (pdf["dup_ratio"] < 1)).all()
    assert ((pdf["top_token_ratio"] > 0) & (pdf["top_token_ratio"] <= 1)).all()
    # distinct + dup fractions are consistent: dup = 1 - distinct/total
    recon = 1.0 - pdf["n_distinct"] / pdf["n_tokens"]
    assert np.abs(recon - pdf["dup_ratio"]).max() < 1e-6


def test_attribution_respects_window_and_channels(spark):
    att = REG["attribution_last_touch"].fn(spark, SF_ORACLE).toPandas()
    attributed = att[att["attributed"]]
    assert set(attributed["channel"].unique()) <= {"click", "view"}
    # touch is at-or-before the purchase and within 7 days
    delta = attributed["ts"] - attributed["touch_ts"]
    assert (delta.dt.total_seconds() >= 0).all()
    assert (delta.dt.total_seconds() <= 7 * 86400).all()
    # unattributed rows carry no channel
    assert att[~att["attributed"]]["channel"].isna().all()


def test_moving_avg_time_frame_counts(spark):
    """n_1h counts only events in the trailing hour — spot-check by
    recomputing for one user in pandas."""
    res = REG["win_moving_avg_time"].fn(spark, SF_ORACLE).toPandas()
    uid = res["user_id"].iloc[0]
    sub = res[res["user_id"] == uid].sort_values("ts").reset_index(drop=True)
    ev = load_table(spark, SF_ORACLE, "events").filter(F.col("user_id") == int(uid)).toPandas()
    ev = ev.sort_values("ts").reset_index(drop=True)
    for _, row in sub.sample(min(20, len(sub)), random_state=0).iterrows():
        in_frame = ev[
            (ev["ts"] <= row["ts"]) & (ev["ts"] >= row["ts"] - np.timedelta64(3600, "s"))
        ]
        assert len(in_frame) == row["n_1h"]
        assert abs(in_frame["value"].mean() - row["avg_1h"]) < 1e-5


def test_attribution_position_credit_conservation(spark):
    """Per-conversion credit sums to exactly 1.0 for n<=2 touches and
    to 1.0 minus the bounded floor loss for n>=3; role ledger is
    internally consistent (first/last pair counts match, 'only' rows
    carry full credit)."""
    led = REG["attribution_position_based"].fn(spark, SF_ORACLE).toPandas()
    roles = dict(zip(zip(led["channel"], led["role"]), led["credit_micros"]))
    # 'only' touches: one per conversion, full credit
    only = led[led["role"] == "only"]
    assert (only["credit_micros"] == only["n_touches"] * 1_000_000).all()
    # every conversion has exactly one first and one last (n>=2 paths)
    firsts = led[led["role"] == "first"]["n_conversions"].sum()
    lasts = led[led["role"] == "last"]["n_conversions"].sum()
    assert firsts == lasts
    # global credit never exceeds conversions x 1.0, and floor loss is
    # bounded by 1 micro per middle touch
    n_conv = (
        led[led["role"] == "only"]["n_conversions"].sum()
        + led[led["role"].isin(["first"])]["n_conversions"].sum()
    )
    total = led["credit_micros"].sum()
    middle_touches = led[led["role"] == "middle"]["n_touches"].sum()
    assert total <= n_conv * 1_000_000
    assert total >= n_conv * 1_000_000 - middle_touches * (1_000_000 // 5)


def test_holt_forecast_structure(spark):
    """Fit rows = observed months (first month has no one-step-ahead
    fit), forecast rows extend the trend linearly: the h-step values
    lie exactly on l_T + h*b_T."""
    out = REG["timeseries_holt_forecast"].fn(spark, SF_ORACLE).toPandas()
    fits = out[out["kind"] == "fit"].sort_values("month").reset_index(drop=True)
    fc = out[out["kind"] == "forecast"].sort_values("month").reset_index(drop=True)
    assert len(fc) == 3
    assert fits["fitted_cents"].isna().iloc[0] and fits["fitted_cents"].notna().iloc[1:].all()
    assert fc["actual_cents"].isna().all()
    # forecasts are affine in h: second differences vanish
    d = fc["fitted_cents"].diff().dropna()
    assert d.nunique() == 1


def test_ndcg_bounds_and_ideal(spark):
    """NDCG in [0, 1]; DCG never beats the ideal ordering's DCG."""
    out = REG["eval_ndcg_at_k"].fn(spark, SF_ORACLE).toPandas()
    assert (out["ndcg_at_k"] >= 0).all() and (out["ndcg_at_k"] <= 1.0).all()
    assert (out["dcg"] <= out["idcg"] + 1e-9).all()


def test_naive_bayes_beats_chance(spark):
    """The trained classifier must beat the 1/|langs| chance rate on
    the held-out split (the corpus langs differ in token mix)."""
    out = REG["text_naive_bayes_lang"].fn(spark, SF_ORACLE).toPandas()
    n_langs = out["true_lang"].nunique()
    acc = out["correct"].mean()
    assert acc > 1.0 / n_langs + 0.05, f"accuracy {acc} vs chance {1 / n_langs}"
    # predictions only ever name trained classes
    assert set(out["pred_lang"]) <= set(out["true_lang"])


def test_kmv_estimates_near_truth(spark):
    """KMV estimates land within the k=16 sketch's error envelope of
    the exact per-source distinct counts, and set-op outputs respect
    basic sketch algebra."""
    out = REG["sketch_kmv_distinct"].fn(spark, SF_ORACLE).toPandas()
    exact = (
        load_table(spark, SF_ORACLE, "documents")
        .groupBy("source")
        .agg(F.count_distinct(F.md5("text")).alias("nd"))
        .toPandas()
        .set_index("source")["nd"]
    )
    for col_src, col_est in [("source_a", "est_a"), ("source_b", "est_b")]:
        sub = out[[col_src, col_est]].drop_duplicates()
        for _, r in sub.iterrows():
            truth = exact[r[col_src]]
            assert 0.35 * truth <= r[col_est] <= 3.0 * truth, (r[col_src], r[col_est], truth)
    assert (out["est_intersect"] >= 0).all()
    # union estimates carry their own (independent) sketch noise, so
    # est_union vs est_a+est_b is NOT an identity — check the union
    # estimate against the EXACT union instead, same envelope
    sets = (
        load_table(spark, SF_ORACLE, "documents")
        .select("source", F.md5("text").alias("h"))
        .toPandas()
        .groupby("source")["h"]
        .apply(set)
    )
    for _, r in out.iterrows():
        true_union = len(sets[r["source_a"]] | sets[r["source_b"]])
        assert 0.35 * true_union <= r["est_union"] <= 3.0 * true_union


def test_bfs_hops_frontier_property(spark):
    """BFS correctness the hash can't express: hop-0 rows are exactly
    the seed suppliers, and every hop-h node (h >= 1) touches at least
    one hop-(h-1) node through an edge."""
    out = REG["graph_bfs_hops"].fn(spark, SF_ORACLE).toPandas()
    assert out["hops"].between(0, 3).all()
    seeds = set(out[out["hops"] == 0]["node"])
    sup = load_table(spark, SF_ORACLE, "supplier").filter(F.col("s_nationkey") == 0).toPandas()
    assert seeds == set(sup["s_suppkey"] * 2 + 1)
    orders = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey").toPandas()
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_suppkey").toPandas()
    pairs = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    import collections

    adj = collections.defaultdict(set)
    for c, s in zip(pairs["o_custkey"] * 2, pairs["l_suppkey"] * 2 + 1):
        adj[c].add(s)
        adj[s].add(c)
    hop_of = dict(zip(out["node"], out["hops"]))
    for node, h in hop_of.items():
        if h > 0:
            assert any(hop_of.get(nb, 99) == h - 1 for nb in adj[node]), (node, h)


def test_kcore_peel_fixpoint_and_validity(spark):
    """k-core correctness the hash can't express: the fixed-round
    peel has CONVERGED at oracle scale (the last unrolled round
    removes nothing — every peel_round label sits strictly below the
    round budget), every graph node appears exactly once, and a
    sequential reference peel produces the identical layer labels."""
    import collections

    from hadoop_based_distributed_batch_processing_system_spark.operators.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    out = REG["graph_kcore_peel"].fn(spark, SF_ORACLE).toPandas()
    assert out["peel_round"].max() < _KCORE_ROUNDS, "peel did not converge in budget"
    orders = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey").toPandas()
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_suppkey").toPandas()
    pairs = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    adj = collections.defaultdict(set)
    for c, s in set(zip(pairs["o_custkey"] * 2, pairs["l_suppkey"] * 2 + 1)):
        adj[c].add(s)
        adj[s].add(c)
    assert sorted(out["node"]) == sorted(adj)  # each node labeled once
    # sequential simultaneous-peel reference
    alive = set(adj)
    expect = {}
    for r in range(1, _KCORE_ROUNDS + 1):
        bad = {v for v in alive if sum(1 for u in adj[v] if u in alive) < _KCORE_K}
        for v in bad:
            expect[v] = r
        alive -= bad
    for v in alive:
        expect[v] = 0
    got = dict(zip(out["node"], out["peel_round"]))
    assert got == expect


def test_quantile_sketch_order_and_membership(spark):
    """Sketch estimates are real input values, ordered, and inside
    each group's [min, max]."""
    out = REG["agg_quantile_sketch_kmv"].fn(spark, SF_ORACLE).toPandas()
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("val")
    ).toPandas()
    for _, r in out.iterrows():
        vals = set(li[li["flag"] == r["flag"]]["val"])
        ests = [r["est_p25"], r["est_p50"], r["est_p75"], r["est_p90"]]
        assert ests == sorted(ests)
        for e in ests:
            assert e in vals
        assert r["n_sample"] <= 64
