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
