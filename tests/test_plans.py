"""Physical-plan assertions (SURVEY.md §4.2): prove the operators
compile to the plans the 100 TB design depends on — filters pushed
into the parquet scan, column pruning, broadcast joins for dims,
partial aggregation, TakeOrderedAndProject top-k, and NO cartesian
products in the blocked/LSH operators."""

import pyspark.sql.functions as F

from hadoop_based_distributed_batch_processing_system_spark.plans.inspect import (
    physical_plan as plan_of,
    plan_facts,
)
from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

REG = load_all()


def test_filter_pushed_to_parquet_scan(spark):
    """P2: the predicate must reach the scan (PushedFilters), not run
    as a post-scan Filter only."""
    plan = plan_of(REG["filter_pred"].fn(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan or "LessThan" in plan


def test_projection_prunes_scan_schema(spark):
    """S2: a 2-column projection must read a 2-column ReadSchema."""
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    (schema_line,) = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert "l_orderkey" in schema_line and "l_quantity" in schema_line
    assert "l_comment" not in schema_line and "l_extendedprice" not in schema_line


def test_dim_join_broadcasts(spark):
    """J2: nation/region dims must come in as BroadcastHashJoin, not
    a shuffled join."""
    plan = plan_of(REG["join_broadcast"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_groupby_does_partial_aggregation(spark):
    """A1: two HashAggregate nodes (partial map-side + final) — the
    MR combiner, for free."""
    plan = plan_of(REG["agg_group"].fn(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2


def test_topk_is_take_ordered(spark):
    """O2: orderBy+limit must compile to TakeOrderedAndProject — a
    per-partition heap, never a global sort."""
    plan = plan_of(REG["topk"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_agg_query_runs_whole_stage_codegen(spark):
    """(codegen mode — AQE's pre-execution simple/formatted plans
    don't show WSCG spans until the final plan materializes)"""
    plan = plan_of(REG["agg_group"].fn(spark, SF_SMOKE), "codegen")
    assert "WholeStageCodegen" in plan


def test_minhash_lsh_has_no_cartesian(spark):
    """L2 scale contract: candidate generation is an equi-join on
    band keys — the plan must contain no cartesian/nested-loop join
    at any size."""
    plan = plan_of(REG["dedup_minhash_lsh"].fn(spark, SF_SMOKE), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_has_no_cartesian(spark):
    plan = plan_of(REG["dedup_simhash"].fn(spark, SF_SMOKE), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_candidates_are_equi_join(spark):
    """L3 scale contract: ANN probes join data on bucket equality."""
    plan = plan_of(REG["sim_search_ann_lsh"].fn(spark, SF_SMOKE), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_query_probe_is_broadcast(spark):
    """The 1-row probe side of query search must broadcast — the
    corpus is never shuffled for a single-vector query."""
    plan = plan_of(REG["sim_search_query_topk"].fn(spark, SF_SMOKE), "simple")
    assert "Broadcast" in plan


def test_bucketed_join_has_zero_exchanges(spark):
    """J1' contract: with both sides bucketed on the join key, the
    sort-merge join AND the orderkey-grained aggregation need no
    shuffle at all — not one Exchange node in the whole plan."""
    plan = plan_of(REG["join_bucketed_colocated"].fn(spark, SF_SMOKE))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_partitioned_sink_reread_prunes_directories(spark):
    """S4' contract: a filter on the partition column of a
    hive-partitioned sink must become a PartitionFilter (directory
    pruning), not a data filter."""
    REG["sink_partition_pruned"].fn(spark, SF_SMOKE).collect()  # ensure written
    import os, tempfile

    from hadoop_based_distributed_batch_processing_system_spark.sources.io import corpus_tag

    out = os.path.join(tempfile.gettempdir(), f"hbdbps_sink_part_{corpus_tag(SF_SMOKE)}")
    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = plan_of(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_type" in pf[0]


def test_partition_pruned_counts_match_source(spark):
    pruned = REG["sink_partition_pruned"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("event_type") == "purchase")
    assert pruned[0]["n"] == ev.count()


def test_events_filter_partition_epoch_pushdown(spark):
    """Predicates on events reach the scan through whatever ts
    normalization the probed corpus encoding required."""
    ev = load_table(spark, SF_SMOKE, "events")
    plan = plan_of(ev.filter(F.col("user_id") == 7))
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:200]


def test_events_ts_range_predicate_pushes_to_scan(spark):
    """100 TB property: a ts-range predicate must reach the parquet
    scan as a PushedFilter (row-group pruning), not stay a post-scan
    data filter. For the micros-NTZ corpus, Catalyst rewrites the
    predicate through the NTZ→timestamp cast (UTC session TZ makes it
    bijective); for a nanos corpus the raw-long column can't take a
    timestamp pushdown, so this only asserts on natively-read ts."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import events_ts_spec

    spec = events_ts_spec(SF_SMOKE)
    if not (spec[0] == "timestamp" and spec[1] != "ns"):
        import pytest

        pytest.skip(f"ts not natively readable ({spec}); pushdown N/A")
    ev = load_table(spark, SF_SMOKE, "events")
    plan = plan_of(ev.filter(F.col("ts") >= F.lit("2024-01-05")))
    pushed = plan.split("PushedFilters")[1][:200]
    assert "GreaterThanOrEqual(ts" in pushed, pushed


def test_doc_chunking_is_zero_shuffle(spark):
    """doc_chunk_sliding must be a narrow map (split/sequence/explode/
    slice) — no Exchange anywhere; chunk rows stay in their source
    doc's partition."""
    plan = plan_of(REG["doc_chunk_sliding"].fn(spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_tpch_star_composites_broadcast_dims(spark):
    """Q7/Q8/Q9: every dimension (nation/supplier/part/region) must
    broadcast; only the fact chain may shuffle."""
    for name in ("q7_volume_shipping", "q8_market_share", "q9_product_profit"):
        plan = plan_of(REG[name].fn(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_shuffle_hash_hint_overrides_sort_merge(spark):
    """The SHUFFLE_HASH hint must actually flip the physical join."""
    plan = plan_of(REG["join_shuffle_hash_hint"].fn(spark, SF_SMOKE))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sorted_runs_are_disjoint_and_complete(spark):
    """sink_sorted_runs: file ranges must be disjoint and ordered
    (file i's max <= file i+1's min) and cover every input row."""
    pdf = REG["sink_sorted_runs"].fn(spark, SF_SMOKE).toPandas()
    n_src = REG["scan_parquet"].fn(spark, SF_SMOKE).count() if "scan_parquet" in REG else None
    for i in range(len(pdf) - 1):
        assert pdf.iloc[i]["max_price"] <= pdf.iloc[i + 1]["min_price"]
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
    assert pdf["n_rows"].sum() == load_table(spark, SF_SMOKE, "orders").count()


def test_dynamic_partition_pruning_subquery_present(spark):
    """join_dynamic_partition_pruning: the fact scan must carry a
    dynamicpruning expression (runtime partition filter from the dim
    side), not scan every partition."""
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        REG["join_dynamic_partition_pruning"].fn(spark, SF_SMOKE).explain(True)
    assert "dynamicpruning" in buf.getvalue().lower()


def test_range_binned_join_is_hash_not_nested_loop(spark):
    """J6': the binned rewrite must plan as a hash/sort-merge join on
    the bin key — a BroadcastNestedLoopJoin would mean the rewrite
    failed and the O(n^2) plan is back."""
    plan = plan_of(REG["join_range_binned"].fn(spark, SF_SMOKE))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # an actual equi join on jbin


def test_jl_projection_is_narrow_map(spark):
    """L13': the projection is 16 fold expressions over one scan —
    zero Exchange nodes, zero Python workers in the plan."""
    plan = plan_of(REG["embed_random_projection"].fn(spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF evaluation node


def test_heavy_hitters_shuffles_constant_rows(spark):
    """MG heavy hitters: the only wide op may be the summary merge —
    the events scan itself must not repartition/exchange on user_id
    before the mapInPandas pass."""
    plan = plan_of(REG["topk_heavy_hitters_mg"].fn(spark, SF_SMOKE))
    before_python = plan.split("MapInPandas")[0] if "MapInPandas" in plan else plan
    # no exchange upstream of the summary stage (scan feeds Python directly)
    assert "Exchange hashpartitioning(user_id" not in before_python


def test_bloom_filter_injected_into_fact_scan(spark):
    """Runtime bloom-filter pruning: under the injection confs the
    fact side must carry a bloom_filter_agg/might_contain pair."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.joins import (
        _BLOOM_CONFS,
        _bloom_join_frame,
    )

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        plan = plan_of(_bloom_join_frame(spark, SF_SMOKE))
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert "bloom_filter_agg" in plan, "bloom filter was not injected"


# Operators allowed to plan a cartesian/broadcast-nested-loop join.
# Two legitimate classes; anything NEW that shows up here is a scale
# regression and must either be fixed or justified in this table.
_NESTED_LOOP_ALLOWED = {
    # intentional cartesian / guarded brute-force ground truth
    "join_cross": "J5: the cartesian operator itself",
    # dedup_ngram_jaccard (+ its cross_source_matrix decorator),
    # dedup_embedding_cosine, sim_search_topk and knn_label_vote left
    # this list in r17: the brute-force pair scans now distribute as
    # block-pair / block-union kernel tasks (no cartesian plan)
    # 1-row scalar broadcasts (min/max, totals, probe vectors) — the
    # nested loop's build side is a single row by construction
    "agg_histogram": "broadcasts 1-row global min/max for bin width",
    "ml_decision_stump": "broadcasts the 1-row argmax-split scalar",
    "sample_class_weights": "broadcasts 1-row global total",
    "target_encoding_loo": "broadcasts 1-row global target mean",
    "embed_standardize": "broadcasts 1-row per-dimension stats frame",
    "q22_idle_rich_customers": "TPC-H Q22 scalar avg-acctbal subquery",
    "q11_important_parts": "TPC-H Q11 scalar threshold subquery",
    # dedup_connected_components left the list when its label loop
    # switched to localCheckpoint: the returned plan now starts from
    # the materialized final labels, so the 1-row convergence scalar
    # no longer appears in it.
    "sim_search_query_topk": "broadcasts the single probe vector",
    "multimodal_join": "broadcasts the single probe vector",
    "agg_hll_portable": "1-row estimate frame x 1-row true-distinct frame",
    "logreg_embeddings": "64-row model x 1-row train-accuracy scalar",
    "sample_balanced_downsample": "broadcasts the 1-row minority-count scalar",
    "doc_bm25_topk": "broadcasts the 1-row (N, avgdl) corpus stats scalar",
    "events_cusum_changepoint": "broadcasts the 1-row (mu, k, h) params scalar",
    "sim_search_hybrid_rrf": "broadcasts the 1-row probe vector and corpus-stats scalars",
    "text_tfidf_topterms": "broadcasts 1-row corpus doc count",
    "watermark_late_drop": "broadcasts 1-row max event time (the watermark)",
    "sim_search_ann_ivf_quantized": "broadcasts the K=8-row centroid frame (bounded model state)",
    "funnel_conversion": "broadcasts 1-row cohort baseline scalar",
    "triangle_count": "broadcasts two 1-row scalars (edge count, triangle count) onto the 1-row stats frame",
    "graph_hits": "broadcasts the two 1-row L1-total scalars for the final normalization",
    "text_pmi_collocations": "broadcasts the 1-row global bigram total N",
    "feature_quantile_binning": "broadcasts the 1-row quartile-boundary frame",
    "dq_benford_first_digit": "broadcasts the 1-row grand total onto the 9-digit rollup",
    "corpus_mixing_weights": "broadcasts the 1-row corpus totals (total tokens, n_langs)",
    "ab_test_welch_t": "assembles the test statistic from two 1-row arm-moment frames",
    "chi_square_independence": "broadcasts the 1-row grand total onto the contingency table",
    "market_basket_rules": "broadcasts the 1-row distinct-order count for support normalization",
    "pipeline_corpus_curation_v2": "broadcasts the 1-row mixing totals onto the per-language frame",
    "funnel_conversion_windowed": "assembles the report from three 1-row stage counts",
    "text_naive_bayes_lang": (
        "broadcasts the |langs|-row class-totals and 1-row (V, N) frames onto "
        "the per-doc grid — the dense doc x class scoring NB requires; bounded "
        "by the class count, never the corpus"
    ),
    "privacy_t_closeness": (
        "broadcasts the 1-row grand total onto the per-(group, band) "
        "counts; all distribution joins are equi-joins"
    ),
    "sketch_kmv_distinct": (
        "source-pair list via a < self-join of the distinct-sources frame "
        "(|sources|^2 rows, sketch metadata, corpus-independent); the "
        "corpus-sized work upstream is all equi-joins"
    ),
}

# Eager-on-call operators (streams, sinks, driver-side collects) are
# exercised elsewhere; building their "plan" would execute them.
_PLAN_SWEEP_SKIP_PREFIX = ("stream_", "sink_", "compact_")
_PLAN_SWEEP_SKIP = {
    "counters_job_audit", "join_bloom_filtered", "rownum_scalable_global",
    "sim_search_ann_ivf", "kmeans_embeddings", "pca_power_iteration_top1",
    "sim_search_ann_ivf_persisted",  # builds/publishes the index on call

    "bpe_train_merges",  # 10 driver-side argmax jobs (iterative trainer)
    "graph_kcore_peel",  # per-round localCheckpoints execute on build
    "graph_cc_twophase",  # per-round checkpoints + convergence counts execute on build
    "table_log_time_travel",  # synthesizes the table dir + commit log on build
    "table_log_incremental_read",  # may synthesize the table dir on build
    "table_log_merge_upsert",  # runs the CoW merge commit (writes + discovery collect) on build
    "table_log_schema_evolution",  # commits the wider-schema append on build
    "table_log_compact_commit", "table_log_vacuum_retention",  # rewrite/delete files on build
    "table_log_deletion_vectors",  # commits the DV sidecar on build
    "table_log_compact_materialize_dv",  # DV commit + materializing compaction on build
    "table_log_stats_pruned_read",  # may run the compaction commit on build
    "table_log_zorder_pruned_read",  # runs the Z-order compaction commit on build
    "table_log_time_travel_as_of",  # synthesizes the table dir + commit log on build
    "table_log_restore",  # runs the DV + double-restore lifecycle on build
    "table_log_delete_where", "table_log_update_set",  # run the DML commits on build
    "table_log_cdc_dml",  # runs the DML commits on build (change-feed read of them)
    "table_log_cdc_restore",  # runs the DV + double-restore lifecycle on build
    "sim_search_ann_ivf_delta",  # builds the index + appends the delta commit on call
    "table_log_wap_publish",  # runs the stage/audit/publish lifecycle on build
    "table_log_cdc_images",  # runs the DML lifecycle on build (image read of it)
    "table_log_multi_asof",  # builds both tables + the DML lifecycle on build
    "table_log_compact_trigger",  # appends + fires the compaction on build
    "table_log_rollup_incremental",  # drains the ingest + consumes the feed on build
    "table_log_clone_shallow",  # clones + appends + binds the local DV on build
    "table_log_ts_pruned_read",  # drains the ingest + clusters on build
    "table_log_check_constraint",  # adds the constraint + appends on build
    "table_log_cdc_images_lineage",  # builds the row-tracked lifecycle on build
    "table_log_partition_evolution",  # lands both layouts + the spec change on build
    "table_log_multi_table_txn",  # runs both transactions on build
    "stream_ingest_schema_evolution",  # runs the two-phase drain on build
    "table_log_history",  # synthesizes the table dir + commit log on build
    "table_log_column_mapping",  # runs the rename/drop lifecycle on build
    "table_log_colmap_delete",  # runs the mapping lifecycle + the DV delete on build
    "table_log_clone_deepen",  # clones, deepens, and vacuums the source on build
    "table_log_catalog_txn",  # publishes both legs + the catalog swap on build
    "table_log_catalog_asof",  # shares the catalog-txn lifecycle on build
    "sim_search_ann_ivf_vacuumed",  # trains two index generations + vacuums on call
    "observe_query_metrics", "mr_wordcount",
    "mr_grep_map_only", "upsert_cdc_apply", "sql_catalog_query",
    "sql_parameterized", "catalog_managed_table_roundtrip",
    "cache_two_phase_reuse",
}

# Building an operator's DataFrame is the expensive part of a fleet
# sweep (several ops run bounded driver-stat jobs inside fn()). Three
# sweep tests share this per-op memo so each op builds ONCE per
# session: (schema, simple plan string, PlanFacts).
_FLEET_CACHE: dict[str, tuple] = {}


def _fleet_entry(spark, name, spec):
    if name not in _FLEET_CACHE:
        df = spec.fn(spark, SF_SMOKE)
        _FLEET_CACHE[name] = (df.schema, plan_of(df, "simple"), plan_facts(df))
    return _FLEET_CACHE[name]


def test_no_unapproved_nested_loop_joins(spark):
    """Fleet-wide scale audit, one plan sweep, two properties:

    1. no operator may plan a cartesian or broadcast-nested-loop join
       unless it is on the documented allowlist (guarded brute force
       or 1-row scalar broadcast);
    2. NO operator may plan a row-at-a-time Python UDF
       (BatchEvalPython) — Arrow-batched nodes (ArrowEvalPython,
       MapInPandas, FlatMapGroupsInPandas & co.) are the only Python
       allowed in any plan, per the repo-wide vectorization rule."""
    flagged, row_udfs = [], []
    for name, spec in REG.items():
        if name.startswith(_PLAN_SWEEP_SKIP_PREFIX) or name in _PLAN_SWEEP_SKIP:
            continue
        _, _, facts = _fleet_entry(spark, name, spec)
        if facts.has_cartesian:
            flagged.append(name)
        if facts.has_row_python:
            row_udfs.append(name)
    assert not row_udfs, f"row-at-a-time Python UDF plans (banned): {row_udfs}"
    unapproved = [n for n in flagged if n not in _NESTED_LOOP_ALLOWED]
    assert not unapproved, f"new nested-loop/cartesian plans: {unapproved}"
    # and the allowlist must not rot: every entry still plans one
    gone = [n for n in _NESTED_LOOP_ALLOWED if n in REG and n not in flagged]
    assert not gone, f"allowlist entries no longer nested-loop (prune them): {gone}"


def test_cache_reuse_plans_in_memory_scan(spark):
    """cache_two_phase_reuse: both aggregation phases must read the
    cached relation (InMemoryTableScan), not re-scan parquet."""
    import pyspark.sql.functions as F

    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    filtered = load_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    filtered.cache()
    try:
        agg = filtered.groupBy("l_returnflag").count()
        plan = plan_of(agg)
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    finally:
        filtered.unpersist()


def test_pack_sequences_single_exchange(spark):
    """L9' contract: packing is one window cumsum partitioned by
    source — exactly one shuffle, no global sort."""
    plan = plan_of(REG["pack_sequences_concat_chunk"].fn(spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan.lower()


def test_unigram_score_broadcasts_vocab(spark):
    """L6'' contract: the vocab joins back onto the token stream as a
    BROADCAST (word types, not corpus rows); the token stream itself
    is never broadcast."""
    plan = plan_of(REG["text_unigram_logprob_score"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_python_datasource_plans_as_scan(spark):
    """S8 contract: the custom Python source plans as a batch scan
    relation (one task per InputPartition), not a driver-side
    collect/parallelize."""
    df = REG["scan_python_datasource"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "PythonDataSource" in plan or "BatchScan" in plan, plan[:500]
    assert df.rdd.getNumPartitions() == 8


def test_feature_hashing_is_all_jvm_single_shuffle(spark):
    """L16: the bucket hash is expression-side (no Python eval nodes)
    and the only exchange is the doc_id aggregation."""
    plan = plan_of(REG["feature_hashing"].fn(spark, SF_SMOKE), "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan


def test_target_encoding_broadcasts_global_mean(spark):
    """L17: the global mean arrives via broadcast (never a
    partition-all window); the category stats are one window
    exchange over event_type."""
    plan = plan_of(REG["target_encoding_loo"].fn(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Window") >= 1
    # no single-partition window: the only Window sort is per event_type
    assert "SinglePartition" not in plan.split("Window")[0]


def test_embed_standardize_stats_one_pass_broadcast(spark):
    """L13''': 128 moments reduce to a 1-row stats frame broadcast
    back; the transform itself adds no extra shuffle of the corpus."""
    plan = plan_of(REG["embed_standardize"].fn(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_attribution_single_user_shuffle(spark):
    """E3: the as-of construction is one user_id window — no
    per-purchase subquery join, no nested loop."""
    plan = plan_of(REG["attribution_last_touch"].fn(spark, SF_SMOKE), "simple")
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan


def test_locf_gap_fill_has_no_grid_join(spark):
    """T10: the rewrite must not join a dense grid back — one agg
    exchange + one window exchange, a generator, and NO join node."""
    plan = plan_of(REG["timeseries_resample_locf"].fn(spark, SF_SMOKE), "simple")
    assert "Join" not in plan, plan
    assert "Generate" in plan  # the sequence-explode gap filler
    assert plan.count("Exchange") <= 2, plan

def test_triangle_count_joins_are_hash_equi(spark):
    """The wedge enumeration and closing-edge joins must be hash
    equi-joins on node keys; the only nested-loop nodes allowed are
    the two 1-row scalar broadcasts assembling the audit row."""
    plan = plan_of(REG["triangle_count"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_containment_uses_inverted_index_not_cartesian(spark):
    """dedup_containment pairs come from the posting-list equi-join —
    never doc×doc."""
    plan = plan_of(REG["dedup_containment"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_pair_counts_partial_agg_and_topk(spark):
    """The pair groupBy must partial-aggregate map-side (alphabet²
    keys collapse in the map task) and the top-64 must be a
    TakeOrderedAndProject heap, not a global sort."""
    plan = plan_of(REG["bpe_pair_counts"].fn(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_bigram_score_is_all_jvm(spark):
    """The bigram LM scorer must stay whole-JVM (array-index bigrams,
    no Python) and join the model via equi-joins."""
    plan = plan_of(REG["text_bigram_logprob_score"].fn(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ewma_single_exchange(spark):
    """The per-series fold needs exactly one shuffle (the user_id
    groupBy); the ordered reduce itself is a JVM lambda, no Python."""
    plan = plan_of(REG["timeseries_ewma"].fn(spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


def test_dq_expectations_single_scan(spark):
    """N expectation rules must cost ONE scan of the fact table —
    conditional counters in one wide aggregate, never a scan per
    rule."""
    plan = plan_of(REG["dq_expectations"].fn(spark, SF_SMOKE), "simple")
    assert plan.count("Scan parquet") == 1


def test_markov_reuses_user_partitioning(spark):
    """events_markov_transitions: the lead() window shuffles on
    user_id once; the transition-matrix aggregate and its normalizing
    window run on |event_type|²-sized data (2 more exchanges at most,
    all tiny)."""
    plan = plan_of(REG["events_markov_transitions"].fn(spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") <= 3
    assert "CartesianProduct" not in plan


def test_capped_session_single_exchange(spark):
    """T3' contract: gap-flag lag, running-sum, per-session min and
    the final aggregate all share the user_id hash partitioning —
    exactly one shuffle."""
    plan = plan_of(REG["window_session_capped"].fn(spark, SF_SMOKE), "simple")
    assert plan.count("Exchange") == 1, plan


def test_incremental_rollup_prunes_delta_scan(spark):
    """T13 contract: the delta partials scan carries the ts split as
    a pushed-down parquet predicate (at scale: partition pruning),
    and the merge re-aggregate is partial-agg'd."""
    plan = plan_of(REG["rollup_incremental_merge"].fn(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for partials and merge


def test_kmeans_assignment_is_jvm_narrow_map(spark):
    """ML1 contract: per-iteration assignment must be a literal-model
    JVM expression (no Python eval nodes, no join against a centroid
    table) and re-estimation one hash aggregate — probed on the final
    returned plan plus a hand-built assignment stage."""
    df = REG["kmeans_embeddings"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_no_complex_toplevel_output_types(spark):
    """Driver-canonicalizer contract: the verify driver's result
    hasher crashes on list/struct/map CELLS (CORRECTNESS_r01's
    agg_collect: `unhashable type: 'list'`), so NO registered query
    may output a complex top-level column — vectors serialize to
    exact fixed-point strings (feature_hashing, embed_standardize,
    embed_label_centroids, kmeans_embeddings, mm_feature_extract_stub
    set the pattern). DECIMAL is banned for the same serialized-hash
    reason: no DuckDB oracle ever yields one, and the driver hashes the
    serialized cell, so Decimal('0.000006') != 6e-06 even when the
    loose numeric compare passes (ml_decision_stump's r09 hash FAIL —
    a bare 1.0 literal in an F.expr parses as DECIMAL(2,1) and drags
    the whole expression into decimal arithmetic; write 1.0D).
    Streaming ops are asserted through their
    memory-sink outputs in test_streaming; eager ops execute once at
    smoke scale here, lazy ops cost analysis only."""
    offenders = {}
    for name, spec in REG.items():
        if name.startswith("stream_"):
            continue
        schema, _, _ = _fleet_entry(spark, name, spec)
        complex_cols = {
            f.name: f.dataType.typeName()
            for f in schema.fields
            if f.dataType.typeName() in ("array", "struct", "map")
            or f.dataType.typeName().startswith("decimal")
        }
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, f"complex/decimal top-level output columns (driver cannot hash): {offenders}"


def test_plan_facts_api_extracts_structure(spark):
    """plans.inspect unit contract: the facts object must agree with
    the raw plan text on a known query (broadcast star join with
    pushed filters and partial aggregation)."""
    from hadoop_based_distributed_batch_processing_system_spark.plans.inspect import (
        assert_scalable,
    )

    df = REG["join_multiway"].fn(spark, SF_SMOKE)
    facts = assert_scalable(df)  # must not raise: equi-join star query
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
    assert facts.n_scans >= 5  # 6-table star
    assert facts.does_partial_aggregation
    assert facts.pushed_filters and any("r_name" in p for p in facts.pushed_filters)
    assert not facts.has_cartesian and not facts.has_row_python


def test_no_unapproved_single_partition_windows(spark):
    """FLEET-WIDE unpartitioned-window audit (the generalization of
    round 6's hand-picked ranking check): no operator may plan a
    Window fed by a SinglePartition exchange unless it is on the
    calendar-bounded allowlist centralized in ``operators/windows.py``
    (the single source of truth for the rule, the cap, and each
    entry's justification). Corpus-sized global ordering must go
    through the two-phase bucketed recipes (``bucketed_rank_cumsum``,
    ``global_islands``) — ``partitioner_range`` and the four ranking
    ops are the worked conversions and are implicitly asserted clean
    here. Anti-rot: allowlisted entries that stop planning the
    single-partition window must be pruned."""
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.windows import (
        UNPARTITIONED_WINDOW_ALLOWED,
    )

    def has_single_partition_window(plan: str) -> bool:
        # children print BELOW their parent: the first Exchange after
        # each Window node is the one feeding its sort. A final 1-row
        # global aggregate legitimately uses SinglePartition; a Window
        # over one is the trap. The split must NOT break at
        # WindowGroupLimit nodes (a partial top-k, not a window sort),
        # or a fragment's first Exchange can belong to a different
        # operator subtree and mis-attribute offenders.
        for frag in re.split(r"\bWindow\b(?!GroupLimit)", plan)[1:]:
            m = re.search(r"Exchange (\S+)", frag)
            if m is not None and m.group(1).startswith("SinglePartition"):
                return True
        return False

    offenders = []
    for name, spec in REG.items():
        if name.startswith(_PLAN_SWEEP_SKIP_PREFIX) or name in _PLAN_SWEEP_SKIP:
            continue
        _, plan, _ = _fleet_entry(spark, name, spec)
        if has_single_partition_window(plan):
            offenders.append(name)
    unapproved = [n for n in offenders if n not in UNPARTITIONED_WINDOW_ALLOWED]
    assert not unapproved, f"new single-partition-window plans: {unapproved}"
    gone = [n for n in UNPARTITIONED_WINDOW_ALLOWED if n in REG and n not in offenders]
    assert not gone, f"allowlist entries no longer single-partition (prune them): {gone}"


def test_window_group_limit_discipline(spark):
    """FLEET-WIDE WindowGroupLimit audit — the third plan discipline
    (after no-cartesian and no-single-partition-window), previously
    docstring-only: every operator whose scale contract depends on
    the map-side partial top-k (rank window standing ALONE on its
    spec) must still plan a WindowGroupLimit node, or its k-min
    sketch / per-group top-k silently degrades to a full shuffle.
    Anti-rot both ways: a listed op losing the node is a regression;
    an unlisted op gaining it must be added so the dependency is
    documented (the list lives in operators/windows.py beside the
    unpartitioned-window rule)."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.windows import (
        WINDOW_GROUP_LIMIT_EXPECTED,
    )

    have = set()
    for name, spec in REG.items():
        if name.startswith(_PLAN_SWEEP_SKIP_PREFIX) or name in _PLAN_SWEEP_SKIP:
            continue
        _, plan, _ = _fleet_entry(spark, name, spec)
        if "WindowGroupLimit" in plan:
            have.add(name)
    lost = sorted(WINDOW_GROUP_LIMIT_EXPECTED - have)
    assert not lost, (
        f"operators that LOST WindowGroupLimit (a second window function "
        f"on the rank spec disables the partial top-k): {lost}"
    )
    gained = sorted(have - WINDOW_GROUP_LIMIT_EXPECTED)
    assert not gained, (
        f"operators newly planning WindowGroupLimit — add them to "
        f"WINDOW_GROUP_LIMIT_EXPECTED in operators/windows.py: {gained}"
    )


def test_window_group_limit_mechanism(spark):
    """The optimizer behavior the audit relies on, pinned directly: a
    rank window ALONE on its spec plans WindowGroupLimit; the same
    rank with a count-over-partition beside it does NOT (every row
    crosses the shuffle). If Spark ever changes either direction,
    this fails before the fleet audit starts lying."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from hadoop_based_distributed_batch_processing_system_spark.plans.inspect import plan_facts
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    spec = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    alone = li.withColumn("rn", F.row_number().over(spec)).filter(F.col("rn") <= 5)
    assert plan_facts(alone).n_window_group_limits >= 1
    beside = (
        li.withColumn("rn", F.row_number().over(spec))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")))
        .filter(F.col("rn") <= 5)
    )
    assert plan_facts(beside).n_window_group_limits == 0


def test_global_islands_island_window_plan(spark):
    """``global_islands`` is one lazy plan since round 10 (the census
    chain-merge and remap are declarative — no driver collect, no
    checkpoint, no literal-map rebuild), so the fleet sweeps see the
    whole recipe through its consumers. Pin the recipe's OWN
    contracts directly: (a) the corpus-sized island window is
    partitioned by the time bucket (no SinglePartition exchange may
    feed it); (b) the remap applies as a BROADCAST hash join with no
    cartesian/row-Python; (c) the census branch's second stream pass
    is the NARROW one — column pruning must strip the caller's
    payload columns from its scan (only ts + tiebreak reach it)."""
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import (
        _islands_bucketed_window,
        global_islands,
    )

    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_id", "user_id")
    pre = _islands_bucketed_window(
        ev, "ts", ["event_id"], gap_us=900 * 1_000_000, bucket_us=6 * 3600 * 1_000_000
    )
    plan = plan_of(pre)
    assert "Window" in plan  # the frame under audit really holds the window
    for frag in re.split(r"\bWindow\b(?!GroupLimit)", plan)[1:]:
        m = re.search(r"Exchange (\S+)", frag)
        assert m is None or not m.group(1).startswith("SinglePartition"), plan
    facts = plan_facts(pre)
    assert not facts.has_cartesian and not facts.has_row_python

    full = global_islands(
        ev, "ts", ["event_id"], gap_us=900 * 1_000_000, bucket_us=6 * 3600 * 1_000_000
    )
    fplan = plan_of(full)
    ffacts = plan_facts(full)
    assert not ffacts.has_cartesian and not ffacts.has_row_python
    assert "BroadcastHashJoin" in fplan, fplan
    # The census branch re-scans the stream (different pruned columns
    # block exchange reuse — deliberate; see the recipe docstring),
    # and that scan must be the narrow one: its ReadSchema carries
    # only ts + event_id, never user_id (the caller payload).
    import re as _re

    # Assert the PROPERTY, not the scan count (ADVICE r10: pinning
    # len(schemas) == 2 broke on any benign planner change): at least
    # one scan must be the pruned census branch — ts (+ the island
    # key) without the caller payload column.
    schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", fplan)
    narrow = [s for s in schemas if "user_id" not in s and "ts" in s]
    assert narrow, f"no user_id-free census scan found in {schemas}"


def test_table_log_bucketed_join_has_zero_exchanges(spark):
    """S9-bkt contract (VERDICT r16 #3): bucket(key, 8) carried as
    table-log metadata buys the same plan the session-catalog variant
    gets — sort-merge join PLUS the key-grained aggregation with not
    one Exchange node, across a snapshot spanning two commits."""
    plan = plan_of(REG["table_log_bucketed_join"].fn(spark, SF_SMOKE))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
