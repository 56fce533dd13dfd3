"""Invariant tests for the streaming path (rows-only operators) and
batch/stream equivalence."""

import pyspark.sql.functions as F

from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle import canon_frame

REG = load_all()


def test_stream_tumbling_equals_batch(spark):
    batch = REG["window_tumbling"].fn(spark, SF_SMOKE).toPandas()
    stream = REG["stream_window_tumbling"].fn(spark, SF_SMOKE).toPandas()
    assert canon_frame(batch) == canon_frame(stream)


def test_stream_dedup_is_exact(spark):
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    n_events = load_table(spark, SF_SMOKE, "events").count()
    out = REG["stream_stateful_dedup"].fn(spark, SF_SMOKE)
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_watermark_drop_keeps_recent_only(spark):
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    kept = REG["watermark_late_drop"].fn(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    rows = kept.collect()
    assert rows, "horizon filter must keep something"
    assert all((max_ts - r.ts).total_seconds() <= 12 * 3600 for r in rows)


def test_session_window_invariants(spark):
    sess = REG["window_session"].fn(spark, SF_SMOKE).toPandas()
    assert (sess["n_events"] >= 1).all()
    assert (sess["session_end"] >= sess["session_start"]).all()
    # sessions of one user never overlap
    for _, g in sess.groupby("user_id"):
        g = g.sort_values("session_start")
        starts, ends = g["session_start"].tolist(), g["session_end"].tolist()
        for prev_end, nxt_start in zip(ends, starts[1:]):
            assert nxt_start > prev_end


def test_file_sink_rerun_is_exactly_once(spark):
    """Running the checkpointed file-sink query twice must not
    duplicate a single row — the batch commit log makes the second
    drain a no-op."""
    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
    from tests.conftest import SF_ORACLE

    REG = load_all()
    first = REG["stream_file_sink_exactly_once"].fn(spark, SF_ORACLE).count()
    second = REG["stream_file_sink_exactly_once"].fn(spark, SF_ORACLE).count()
    n_src = load_table(spark, SF_ORACLE, "events").count()
    assert first == second == n_src


def test_stream_topk_mg_bounds_and_determinism(spark):
    """The live Misra-Gries top-k's sketch guarantees (it is rows-only
    by nature — slot contents depend on micro-batch boundaries):
    (1) every estimate is an UNDER-count of the true per-(type, user)
    frequency; (2) any user with true frequency > n_type/k is
    guaranteed a slot (the classic MG bound, preserved under the
    mergeable-summaries reduction the kernel applies); (3) at most k
    slots per key; (4) a re-run over the same batch layout is
    byte-identical."""
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table
    from hadoop_based_distributed_batch_processing_system_spark.streaming.stream_jobs import (
        _SMG_SLOTS,
    )
    from tests.conftest import SF_ORACLE

    one = REG["stream_topk_mg_stateful"].fn(spark, SF_ORACLE).toPandas()
    two = REG["stream_topk_mg_stateful"].fn(spark, SF_ORACLE).toPandas()
    assert canon_frame(one) == canon_frame(two)
    assert one.groupby("event_type").size().max() <= _SMG_SLOTS

    exact = (
        load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    merged = one.merge(exact, on=["event_type", "user_id"], how="left")
    assert merged["n"].notna().all()  # every slot holds a real key
    assert (merged["est_count"] <= merged["n"]).all()
    totals = exact.groupby("event_type")["n"].sum()
    for et, grp in exact.groupby("event_type"):
        heavy = set(grp[grp["n"] > totals[et] / _SMG_SLOTS]["user_id"])
        present = set(one[one["event_type"] == et]["user_id"])
        assert heavy <= present, (et, heavy - present)
