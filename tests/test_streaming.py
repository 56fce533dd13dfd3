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


def test_mv_live_catches_up_on_new_source_commits(spark, tmp_path):
    """The live MV's second drain RESUMES from its stream checkpoint:
    a DV DELETE landing on the source after the first drain folds
    into the view incrementally (one new view commit, the bootstrap
    and earlier folds untouched), and the view decrements exactly."""
    import json
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_build,
        _tlog_commit,
        _tlog_latest_version,
        _tlog_live_files,
        _tlog_relation,
    )
    from hadoop_based_distributed_batch_processing_system_spark.streaming.stream_jobs import (
        _tlog_mv_live_drain,
    )
    from tests.conftest import SF_SMOKE

    src = tempfile.mkdtemp(prefix="hbdbps_mvl_src_")
    shutil.rmtree(src)
    mv = str(tmp_path / "mv")
    try:
        _tlog_build(spark, SF_SMOKE, src)  # 3 commits, no DML
        _tlog_mv_live_drain(spark, src, mv)
        assert _tlog_latest_version(mv) == 2
        before = {
            r["bucket"]: (r["n"], r["sum_cents"])
            for r in _tlog_relation(
                spark, _tlog_live_files(mv, 2)
            ).collect()
        }
        boot_mtime = os.stat(
            os.path.join(mv, "file_mv_v0", "_SUCCESS")
        ).st_mtime_ns

        # a DELETE lands on the source AFTER the first drain
        doomed = (
            spark.read.parquet(os.path.join(src, "file_D"))
            .filter(F.col("o_orderkey") % 9 == 3)
            .select("o_orderkey")
        )
        n_doomed = doomed.count()
        cents_doomed = (
            spark.read.parquet(os.path.join(src, "file_D"))
            .filter(F.col("o_orderkey") % 9 == 3)
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("c")
            )
            .collect()[0]["c"]
        )
        doomed.coalesce(1).write.parquet(os.path.join(src, "dv_file_D_v3"))
        _tlog_commit(
            src, add=[], remove=[], base_version=2,
            dv={"file_D": "dv_file_D_v3"},
        )
        _tlog_mv_live_drain(spark, src, mv)  # resumes, folds only v3
        assert _tlog_latest_version(mv) == 3
        assert (
            os.stat(os.path.join(mv, "file_mv_v0", "_SUCCESS")).st_mtime_ns
            == boot_mtime
        ), "resume re-ran the bootstrap"
        after = {
            r["bucket"]: (r["n"], r["sum_cents"])
            for r in _tlog_relation(
                spark, _tlog_live_files(mv, 3)
            ).collect()
        }
        # the doomed keys live in file_D's residues (1, 3)
        lost_n = sum(before[b][0] - after.get(b, (0, 0))[0] for b in before)
        lost_c = sum(before[b][1] - after.get(b, (0, 0))[1] for b in before)
        assert lost_n == n_doomed and lost_c == cents_doomed
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_mv_live_folds_commits_landing_mid_drain(spark, tmp_path, monkeypatch):
    """The r15-queue's remaining half of the live-MV item: a source
    DELETE committed WHILE the drain is processing (injected after the
    first fold commit, before processAllAvailable returns) must be
    picked up by the same drain — the stream sees the new offset and
    folds the decrement; the final view equals the composed state."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from hadoop_based_distributed_batch_processing_system_spark.operators import scans
    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_build,
        _tlog_commit,
        _tlog_latest_version,
        _tlog_live_files,
        _tlog_relation,
    )
    from hadoop_based_distributed_batch_processing_system_spark.streaming.stream_jobs import (
        _tlog_mv_live_drain,
    )
    from tests.conftest import SF_SMOKE

    src = tempfile.mkdtemp(prefix="hbdbps_mvrace_src_")
    shutil.rmtree(src)
    mv = str(tmp_path / "mv")
    try:
        _tlog_build(spark, SF_SMOKE, src)  # 3 commits
        doomed = (
            spark.read.parquet(os.path.join(src, "file_C"))
            .filter(F.col("o_orderkey") % 13 == 5)
            .select("o_orderkey")
        )
        n_doomed = doomed.count()
        assert n_doomed > 0
        doomed.coalesce(1).write.parquet(os.path.join(src, "dv_file_C_v3"))

        real = scans._tlog_commit_rebase
        state = {"injected": False}

        def inject_after_first_fold(root, **kw):
            v = real(root, **kw)
            if not state["injected"] and root == mv:
                state["injected"] = True
                # a concurrent writer lands a DV DELETE on the SOURCE
                # while the drain is mid-flight
                _tlog_commit(
                    src, add=[], remove=[], base_version=2,
                    dv={"file_C": "dv_file_C_v3"},
                )
            return v

        monkeypatch.setattr(scans, "_tlog_commit_rebase", inject_after_first_fold)
        _tlog_mv_live_drain(spark, src, mv)
        monkeypatch.undo()
        assert state["injected"], "the race never fired"
        assert _tlog_latest_version(mv) == 3  # boot + 2 base folds + the DELETE
        total = (
            _tlog_relation(spark, _tlog_live_files(mv, 3))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        want = (
            spark.read.parquet(
                *(os.path.join(src, g) for g in ("file_A", "file_C", "file_D"))
            ).count()
            - n_doomed
        )
        assert total == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
