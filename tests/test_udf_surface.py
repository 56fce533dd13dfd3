"""Invariant tests for the rows-only partitioner operators and the
approx-distinct sketch."""

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE

REG = load_all()


def test_partitioner_hash_invariants(spark):
    import pyspark.sql.functions as F

    hist = REG["partitioner_hash"].fn(spark, SF_ORACLE).toPandas()
    ev = load_table(spark, SF_ORACLE, "events")
    assert hist["n_rows"].sum() == ev.count()  # no row lost
    # same key never in two buckets → per-bucket distinct users sum to global
    assert hist["n_users"].sum() == ev.select("user_id").distinct().count()
    # PHYSICAL routing invariant (not SQL-visible, so pytest-only):
    # after repartition(8, bucket), a bucket never straddles partitions
    placement = (
        ev.withColumn("bucket", F.substring(F.md5(F.col("user_id").cast("string")), 1, 1))
        .repartition(8, "bucket")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("bucket")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .toPandas()
    )
    assert (placement["n_pids"] == 1).all()


def test_partitioner_range_invariants(spark):
    import pyspark.sql.functions as F

    hist = REG["partitioner_range"].fn(spark, SF_ORACLE).toPandas().sort_values("bucket")
    ev = load_table(spark, SF_ORACLE, "events")
    assert hist["n_rows"].sum() == ev.count()
    # NTILE equal-height split: bucket sizes differ by at most 1
    assert hist["n_rows"].max() - hist["n_rows"].min() <= 1
    spans = list(zip(hist["min_ts"], hist["max_ts"]))
    for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
        assert nxt_min >= prev_max  # ranges ordered and non-overlapping
    # PHYSICAL range partitioner invariant: repartitionByRange spans
    # are themselves ordered and non-overlapping (sampled boundaries
    # are engine-specific, hence pytest-only)
    phys = (
        ev.repartitionByRange(8, "ts", "event_id")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))
        .toPandas()
        .sort_values("min_ts")
    )
    pspans = list(zip(phys["min_ts"], phys["max_ts"]))
    for (_, prev_max), (nxt_min, _) in zip(pspans, pspans[1:]):
        assert nxt_min >= prev_max


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r.o_orderstatus: r.approx_custs
        for r in REG["agg_approx_distinct"].fn(spark, SF_ORACLE).collect()
    }
    exact = {r.o_orderstatus: r.n_custs for r in REG["agg_count_distinct"].fn(spark, SF_ORACLE).collect()}
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex < 0.05, f"{k}: approx {approx[k]} vs exact {ex}"


def test_scan_text_roundtrip_counts(spark):
    lines = REG["scan_text_lines"].fn(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    assert lines.count() == docs.count()


def test_sink_parquet_roundtrip_lossless(spark):
    back = REG["sink_parquet_roundtrip"].fn(spark, SF_SMOKE).toPandas()
    li = load_table(spark, SF_SMOKE, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").count().toPandas()
    assert len(back) == len(agg)
    assert int(back["n"].sum()) == li.count()


def test_approx_quantile_within_rank_tolerance(spark):
    """percentile_approx at accuracy 10000 must land within ~1% rank
    of the exact interpolated percentile."""
    import pyspark.sql.functions as F

    approx = {r.o_orderstatus: r for r in REG["agg_approx_quantile"].fn(spark, SF_ORACLE).collect()}
    o = load_table(spark, SF_ORACLE, "orders")
    exact = {
        r.o_orderstatus: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for status, ex in exact.items():
        for p in ["p50", "p95", "p99"]:
            assert abs(getattr(approx[status], p) - getattr(ex, p)) / getattr(ex, p) < 0.02, (
                status, p, getattr(approx[status], p), getattr(ex, p))


def test_compaction_preserves_rows_and_reduces_files(spark):
    row = REG["compact_small_files"].fn(spark, SF_ORACLE).collect()[0]
    ev = load_table(spark, SF_ORACLE, "events")
    assert row["n_rows"] == ev.count()
    assert row["files_after"] < row["files_before"]
    assert row["files_after"] <= 4


def test_counters_match_declarative_counts(spark):
    """Accumulator totals must equal the same counts computed
    declaratively in one Spark aggregate."""
    import pyspark.sql.functions as F

    got = REG["counters_job_audit"].fn(spark, SF_ORACLE).collect()[0]
    ev = load_table(spark, SF_ORACLE, "events")
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.get_json_object("props", "$.k").isNotNull(), 1)).alias("v"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
    ).collect()[0]
    assert (got["n_seen"], got["n_valid_props"], got["n_negative_value"]) == (want["n"], want["v"], want["neg"])


def test_heavy_hitters_superset_and_agreement(spark):
    """Misra-Gries guarantee: every key with true count > n/capacity
    survives the per-partition summaries; on the test corpus the
    merged top-k must match the exact top-k set."""
    import pyspark.sql.functions as F

    from hadoop_based_distributed_batch_processing_system_spark.operators.udf_surface import (
        _MG_CAPACITY,
        _MG_TOPK,
    )

    approx = REG["topk_heavy_hitters_mg"].fn(spark, SF_ORACLE).toPandas()
    ev = load_table(spark, SF_ORACLE, "events")
    n = ev.count()
    exact = (
        ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").limit(_MG_TOPK).toPandas()
    )
    exact_all = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    # superset guarantee for guaranteed-frequent keys
    guaranteed = set(exact_all[exact_all > n / _MG_CAPACITY].index)
    assert guaranteed <= set(approx["user_id"]), "MG lost a guaranteed heavy hitter"
    # estimates never exceed true counts (MG under-counts)
    for _, row in approx.iterrows():
        assert row["est_count"] <= exact_all[row["user_id"]]


def test_hll_mergeable_tolerance(spark):
    """Per-group HLL estimates within 5% of exact, and the
    union-of-parts estimate within 5% of the exact corpus-wide
    distinct count. (Union is NOT bit-identical to sketch-of-whole —
    the union gadget's representation differs from a direct HLL_4
    build — but both must land inside the same error bound.)"""
    out = {r.o_orderstatus: r for r in REG["agg_hll_mergeable"].fn(spark, SF_ORACLE).collect()}
    for status, row in out.items():
        if status == "ALL":
            continue
        assert abs(row.est_custs - row.exact_custs) / row.exact_custs < 0.05, (status, row)
    exact_whole = load_table(spark, SF_ORACLE, "orders").select("o_custkey").distinct().count()
    assert abs(out["ALL"].est_custs - exact_whole) / exact_whole < 0.05
