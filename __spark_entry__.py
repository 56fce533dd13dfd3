"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the
``hadoop_based_distributed_batch_processing_system_spark`` package;
this module only adapts its operator registry to the driver's
three-function surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import REGISTRY, load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies queries in dict order and has a bounded budget
# (round 1: exactly the first 50). Registration order is rotated each
# round so every registry entry lands on the driver's scoreboard:
# queries never driver-verified come first (highest-risk first), and
# queries already green in a past CORRECTNESS_r{N}.json go last (they
# stay registered — local parity tests guard them against regression).
# Past-round results are read from the CORRECTNESS files themselves, so
# the rotation maintains itself round over round.


# Events blast radius: every query whose result depends on events.ts.
# The corpus regenerated between rounds 2 and 3 (ts NANOS → MICROS) and
# all of these either errored, produced wrong answers, or carry stale
# green rows measured against the OLD corpus. Rounds ≤ 3 therefore
# cannot attest them: their pre-r4 CORRECTNESS rows are ignored below
# so each re-earns a driver row against today's corpus + fixed ingest.
_EVENTS_TAINTED_BEFORE_ROUND = 4
_EVENTS_TAINTED = {
    "sink_partition_pruned", "compact_small_files", "join_dynamic_partition_pruning",
    "join_asof", "agg_count_distinct_salted", "topk_heavy_hitters_mg",
    "pivot_event_type_daily", "win_lag_lead", "win_first_last_ignore_nulls",
    "secondary_sort_user_timeline", "fn_map", "fn_json", "fn_json_struct",
    "fn_variant", "fn_xml", "window_tumbling", "window_sliding", "window_session",
    "watermark_late_drop", "stateful_dedup", "dedup_debounce_window",
    "events_anomaly_zscore", "timeseries_resample_locf", "rollup_hypertable_daily",
    "funnel_conversion", "cohort_retention", "stream_window_tumbling",
    "stream_window_sliding", "stream_window_session", "stream_stateful_dedup",
    "stream_stateful_user_totals", "stream_static_join", "stream_stream_join",
    "stream_foreach_batch_upsert", "stream_append_closed_windows",
    "stream_file_sink_exactly_once", "partitioner_hash", "partitioner_range",
    "counters_job_audit", "sql_catalog_query", "sql_parameterized",
}


def _verified_past_rounds() -> list[str]:
    """Names with a passing driver row in any past CORRECTNESS file:
    hash-verified (rows+schema+hash all true), or a clean rows-only
    run (err == 'no_oracle') for a query that STILL has no oracle — a
    query that has since gained an oracle was never hash-checked, so
    it re-enters the front for a hash-verified row. ERROR rows never
    count, nor do events-tainted rows from before round 4 (stale
    corpus). First-seen order preserved."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    verified: list[str] = []
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict) or name in verified:
                continue
            if name in _EVENTS_TAINTED and rnd < _EVENTS_TAINTED_BEFORE_ROUND:
                continue
            hash_pass = rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
            rows_only_ok = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and (name not in REGISTRY or REGISTRY[name].oracle is None)
            )
            if hash_pass or rows_only_ok:
                verified.append(name)
    return verified

# Hand-curated head of the never-verified set: the entries the next
# driver window should reach first (highest value / recently fixed).
# Never-verified entries missing from this list still precede all
# verified ones — they follow in registration order. Entries below
# that have since earned a green driver row are filtered out by
# _ordered_names, so stale listing here is harmless (the list is the
# PRIORITY among whatever remains unverified, not a status record).
_PRIORITY_WINDOW = [
    # --- ROUND 7 state: the 50-slot window holds EXACTLY the 50
    # never-attested entries (42 carried from round 6 + 8 round-7
    # additions at the end of this list), every one hash-oracled and
    # dry-run green at sf0.01 (~97 s total). After the round-7 driver
    # run, zero never-attested entries remain and the window reverts
    # to pure refresh duty: _REFRESH_TAIL first, then the oldest
    # greens in first-seen order. Round-8 additions should register
    # EARLY in the round and count window slots before exceeding ~50.
    # Rewritten this round (two-phase bucketed ranking) — prove ASAP — 4
    "customer_gini_coefficient", "customer_pareto_share",
    "parts_abc_classification", "eval_auc_rank_sum",
    # New this round: 2nd REAL modality (stdlib BMP codec) — 1
    "mm_decode_real_image",
    # Stateful streaming twins (applyInPandasWithState) — 2
    "stream_ewma_stateful", "stream_markov_stateful",
    # Round-5 joins batch — 4
    "join_asof_nearest", "fuzzy_join_delete1", "spatial_grid_join",
    "join_interval_overlap_binned",
    # Scans / stats aggregates — 6
    "scan_json_corrupt_records", "agg_winsorized_stats",
    "agg_mode_deterministic", "events_inter_arrival_stats",
    "ab_test_welch_t", "chi_square_independence",
    # Window / UDTF / sampling — 4
    "win_moving_avg_time", "udtf_polymorphic_analyze",
    "sample_hash_deterministic", "sample_reservoir_per_group",
    # Analytics batch — 6 (the 4 ranking ops above belong here too)
    "dq_expectations", "table_diff_snapshots", "scd2_point_in_time_join",
    "market_basket_rules", "cohort_ltv_curve", "monthly_growth_rates",
    "supplier_concentration_hhi",
    # Dedup / text tail — 7
    "dedup_prefix_truncation", "text_ngram_novelty",
    "dedup_cluster_keep_best", "doc_chunk_sliding",
    "text_repetition_score", "corpus_mixing_weights",
    # Features / graph — 3
    "target_encoding_loo", "user_rfm_segments", "graph_degree_distribution",
    # Event-time batch — 13
    "attribution_last_touch", "timeseries_twap", "timeseries_ewma",
    "window_session_capped", "rollup_incremental_merge",
    "events_seasonality_profile", "events_top_paths",
    "events_autocorrelation_lag1", "events_anomaly_seasonal_zscore",
    "timeseries_interpolate_linear", "events_active_users",
    "timeseries_rolling_median", "funnel_conversion_windowed",
    # --- positions 51+: round-7 front (low risk / stub plumbing)
    "mm_decode_real_png", "dedup_repeated_ngram_spans", "eval_calibration_bins",
    "agg_countmin_sketch", "text_zipf_fit", "sim_search_pq",
    "pipeline_corpus_curation_v3", "stream_countmin_stateful",
    "privacy_l_diversity", "agg_hll_portable", "events_activity_bursts",
    "logreg_embeddings", "eval_spearman_rank_corr", "stream_hll_stateful",
    "sample_balanced_downsample", "monthly_seasonal_decomposition",
    "stream_bloom_stateful", "text_winnowing_fingerprints",
    "dedup_winnowing_pairs", "events_hourly_percentile_bands",
    "entity_resolution_names", "doc_bm25_topk", "text_rake_keywords",
    "events_cusum_changepoint", "parts_xyz_classification",
    "scd2_history_compaction", "funnel_step_latency",
    "orders_duplicate_payment_detector", "text_js_divergence_sources",
    "corpus_health_report", "dedup_cross_source_matrix",
    "graph_link_prediction_jaccard", "sim_search_hybrid_rrf",
    "events_error_budget_burn", "orders_gmv_daily_7dma",
    "doc_length_buckets", "text_flesch_readability",
    "lang_id_confusion_matrix", "mm_binary_metadata", "mm_decode_stub",
    "mm_frame_sample",
    # --- round-7 additions (hash-oracled, verify this round)
    "mm_decode_real_gif",
    "attribution_position_based", "timeseries_holt_forecast",
    "eval_ndcg_at_k", "text_naive_bayes_lang", "sketch_kmv_distinct",
    "graph_bfs_hops", "agg_quantile_sketch_kmv", "stream_kmv_stateful",
    # remaining never-verified entries follow in registration order
]

# Verified-but-stale rows worth re-earning when the never-verified
# front leaves spare slots in the driver's 50-query window: the two
# approx sketches still carry r01 rows (pre-regeneration era — they
# don't read events, so not tainted, but a fresh row costs nothing).
# Placed immediately after the never-verified front, before the rest
# of the verified back (which follows in first-seen order, i.e. the
# oldest green rows refresh first as slots free up round over round).
_REFRESH_TAIL = [
    "agg_approx_distinct",
    "agg_approx_quantile",
]


def _ordered_names() -> list[str]:
    verified = _verified_past_rounds()
    front = [n for n in _PRIORITY_WINDOW if n in REGISTRY and n not in verified]
    placed = set(front) | set(verified)
    middle = [n for n in REGISTRY if n not in placed]
    refresh = [n for n in _REFRESH_TAIL if n in REGISTRY and n in verified]
    back = [n for n in verified if n in REGISTRY and n not in refresh]
    return front + middle + refresh + back


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shape
    pricing summary (filter → group-by → 8 aggregates) on lineitem."""
    load_all()
    return REGISTRY["agg_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    rotated verification-priority order (see _ordered_names)."""
    load_all()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries (sketches, sinks,
    partitioning, streaming) get the driver's rows-only check."""
    load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
