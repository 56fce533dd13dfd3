"""Lakehouse workflow operators over the table-log format
(SURVEY.md §2.1 S9 family, round-14 extension): WRITE-AUDIT-PUBLISH
staging branches, row-level CDC pre/post images, consistent
cross-table as-of reads, and the metadata-driven compaction trigger —
the SURVEY §7 round-13 candidate queue items (a), (b), (d), (e).

The commit-log kernel (OCC protocol, staged writes, DV replay,
manifest stats, change units) lives in ``operators/scans.py``; this
module composes WORKFLOWS on top of it, the way Delta/Iceberg layer
WAP and CDF on their core log. Everything here follows the package's
table-log disciplines: own root per mutating lifecycle, flock + spec
stamp idempotence, one staged write job per statement, one OCC commit
per atomic change, exact-integer fingerprints in every oracle.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import (
    interpolate_docstrings,
    register,
)
from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
    corpus_tag,
    load_table,
)
from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
    _TLOG_FILE_RE,
    _tlog_build,
    _tlog_commit_rebase,
    _tlog_dml_fingerprint,
    _tlog_latest_version,
    _tlog_live_files,
    _tlog_staged_write_with_stats,
)


# --- WRITE-AUDIT-PUBLISH (S9-wap) -----------------------------------------

# The audited append: a deterministic orders slice (oracle-expressible).
_TLOG_WAP_PRED = "o_orderkey % 10 = 3"
_TLOG_WAP_BRANCH = "audit"


def _tlog_wap_root(sf_dir: str) -> str:
    # own root: WAP publishes commits onto its table's log (own-root rule)
    return os.path.join(
        tempfile.gettempdir(), f"hbdbps_tablelogwap_{corpus_tag(sf_dir)}"
    )


def _tlog_branch_path(root: str, branch: str, version: int) -> str:
    return os.path.join(root, "_log", f"_branch_{branch}", f"{version:06d}.json")


def _tlog_wap_stage(
    df: DataFrame, root: str, group: str, branch: str = _TLOG_WAP_BRANCH
) -> dict:
    """WRITE: stage an append on a BRANCH ref — the data file group is
    written (one staged-write job, manifest stats observed in the same
    pass) and a branch commit file records it OUTSIDE the main log's
    numbered sequence, so no main reader can resolve it: the staged
    snapshot is visible only through the branch ref. This is Iceberg's
    WAP branch / Delta's un-committed staging reduced to the package's
    POSIX-dir log: data invisibility-until-referenced is the commit
    protocol's own rule, so staging needs no extra machinery — only a
    commit file that main's resolver never reads. Returns the branch
    payload (also on disk)."""
    import json
    import threading

    base = _tlog_latest_version(root)
    promoted, stats = _tlog_staged_write_with_stats(
        df.withColumn("tgt", F.lit(group)), root, [group]
    )
    payload = {
        "add": promoted,
        "remove": [],
        "stats": stats,
        "base": base,
        "branch": branch,
    }
    bpath = _tlog_branch_path(root, branch, base + 1)
    os.makedirs(os.path.dirname(bpath), exist_ok=True)
    tmp = f"{bpath}.{os.getpid()}.{threading.get_ident()}.tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, bpath)
    return payload


def _tlog_wap_audit(spark: SparkSession, root: str, payload: dict) -> list[str]:
    """AUDIT: validate the staged snapshot BEFORE anything can read it.
    Checks run over the branch's DELTA (the added files — audit cost is
    change-proportional, the property that makes WAP affordable on a
    100-TB table): (a) the append is non-empty, (b) no NULL keys,
    (c) every price is positive (the table's CHECK constraint), and
    (d) the data agrees with the manifest stats recorded at write time
    (a writer whose stats lie would poison every stats-pruned read).
    One bounded agg job over only the staged bytes. Returns the list
    of violations — empty means publishable."""
    failures: list[str] = []
    files = [os.path.join(root, g) for g in payload["add"]]
    per_group = {
        r["g"]: r
        for r in spark.read.parquet(*files)
        .withColumn("g", F.regexp_extract(F.input_file_name(), _TLOG_FILE_RE, 1))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_orderkey").isNull().cast("int")).alias("null_keys"),
            F.min("o_totalprice").alias("plo"),
            F.min("o_orderkey").alias("klo"),
            F.max("o_orderkey").alias("khi"),
        )
        .collect()
    }
    for g in payload["add"]:
        r = per_group.get(g)
        if r is None or not r["n"]:
            failures.append(f"audit: staged group {g} is empty")
            continue
        if r["null_keys"]:
            failures.append(f"audit: {r['null_keys']} NULL keys in {g}")
        if r["plo"] is not None and r["plo"] <= 0:
            failures.append(
                f"audit: CHECK(o_totalprice > 0) violated in {g} (min {r['plo']})"
            )
        bounds = payload["stats"].get(g, {}).get("o_orderkey")
        if bounds and [r["klo"], r["khi"]] != bounds:
            failures.append(
                f"audit: manifest stats disagree with data for {g}: "
                f"recorded {bounds}, observed [{r['klo']}, {r['khi']}]"
            )
    return failures


def _tlog_wap_abort(root: str, payload: dict, branch: str = _TLOG_WAP_BRANCH) -> None:
    """A failed audit DISCARDS the branch: the branch ref is dropped
    and the staged (never-referenced) data groups are reclaimed. Main
    was never touched — that is the entire point of WAP."""
    import shutil

    bpath = _tlog_branch_path(root, branch, payload["base"] + 1)
    if os.path.exists(bpath):
        os.unlink(bpath)
    for g in payload["add"]:
        shutil.rmtree(os.path.join(root, g), ignore_errors=True)


def _tlog_wap_publish(
    spark: SparkSession, root: str, payload: dict, branch: str = _TLOG_WAP_BRANCH
) -> int:
    """PUBLISH: promote the audited branch commit onto main through
    the full OCC rebase protocol. The staged change is a blind append
    (read set empty — it derives from nothing in the table), so main
    commits that landed while the audit ran commute and the publish
    rebases over them; only a concurrent claim of the same group name
    is a true conflict. The branch ref is retired after the publish
    (real formats fast-forward the branch; with a single staged commit
    the two are the same operation). Re-publishing is idempotent: an
    already-live group short-circuits (covers a crash between the
    commit and the ref retire), and two sessions racing the identical
    publish fall to same-commit adoption."""
    latest = _tlog_latest_version(root)
    live = {os.path.basename(p) for p in _tlog_live_files(root, latest)}
    if set(payload["add"]) <= live:
        # already published (e.g. a crash between the commit and the
        # branch-ref retire): publishing is idempotent — retire the
        # ref and report the head that carries the groups
        bpath = _tlog_branch_path(root, branch, payload["base"] + 1)
        if os.path.exists(bpath):
            os.unlink(bpath)
        return latest
    failures = _tlog_wap_audit(spark, root, payload)
    if failures:
        raise RuntimeError(
            "refusing to publish an unaudited/failed branch: " + "; ".join(failures)
        )
    v = _tlog_commit_rebase(
        root,
        add=payload["add"],
        remove=[],
        base_version=_tlog_latest_version(root),
        read_set=set(),
        stats=payload["stats"] or None,
    )
    bpath = _tlog_branch_path(root, branch, payload["base"] + 1)
    if os.path.exists(bpath):
        os.unlink(bpath)
    return v


_TLOG_WAP_SPEC = {"impl": 1, "pred": _TLOG_WAP_PRED, "branch": _TLOG_WAP_BRANCH}


def _tlog_apply_wap(spark: SparkSession, sf_dir: str, root: str) -> None:
    """Run the WAP lifecycle once per table dir (flock + stamp): a BAD
    candidate (negated prices — violates the CHECK constraint) is
    staged and must FAIL its audit, leaving main byte-identical; then
    the GOOD slice stages, audits clean, and publishes as v3. Both
    sides of the gate are exercised on the table the registry reads."""
    import fcntl
    import json

    stamp_file = os.path.join(root, "_WAP")
    stamp = json.dumps(_TLOG_WAP_SPEC, sort_keys=True)

    def _ok() -> bool:
        try:
            return open(stamp_file).read() == stamp
        except OSError:
            return False

    if _ok():
        return
    lock_fh = open(os.path.join(root, ".lock"), "w")
    fcntl.flock(lock_fh, fcntl.LOCK_EX)
    try:
        if _ok():
            return
        if _tlog_latest_version(root) != 2:
            # mutations from a superseded spec on this root: wipe and
            # rebuild the base (the DML recovery discipline). The
            # build takes this same flock, so release around it.
            import shutil

            for entry in os.listdir(root):
                if entry == ".lock":
                    continue
                p = os.path.join(root, entry)
                shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
            fcntl.flock(lock_fh, fcntl.LOCK_UN)
            _tlog_build(spark, sf_dir, root)
            fcntl.flock(lock_fh, fcntl.LOCK_EX)
            if _ok():
                return
        if _tlog_latest_version(root) == 2:
            slice_df = (
                load_table(spark, sf_dir, "orders")
                .filter(F.expr(_TLOG_WAP_PRED))
                .select("o_orderkey", "o_totalprice")
            )
            # the bad candidate: constraint-violating prices
            bad = _tlog_wap_stage(
                slice_df.withColumn("o_totalprice", -F.col("o_totalprice")),
                root,
                "file_wap_bad",
            )
            bad_failures = _tlog_wap_audit(spark, root, bad)
            if not bad_failures:
                raise RuntimeError(
                    "WAP audit let a constraint-violating append through"
                )
            _tlog_wap_abort(root, bad)
            if _tlog_latest_version(root) != 2:
                raise RuntimeError(
                    "WAP abort left main mutated — staging leaked into the log"
                )
            good = _tlog_wap_stage(slice_df, root, "file_wap_good")
            _tlog_wap_publish(spark, root, good)
        tmp = os.path.join(root, f"._WAP.{os.getpid()}.tmp")
        with open(tmp, "w") as fh:
            fh.write(stamp)
        os.replace(tmp, stamp_file)
    finally:
        fcntl.flock(lock_fh, fcntl.LOCK_UN)
        lock_fh.close()


@register(
    "table_log_wap_publish",
    # Hash oracle: main's head after the lifecycle is the source plus
    # the audited slice — and NOTHING from the bad candidate (whose
    # negated prices would shift sum_cents if any row leaked).
    oracle=f"""
        WITH t AS (
          SELECT o_orderkey, o_totalprice FROM orders
          UNION ALL
          SELECT o_orderkey, o_totalprice FROM orders WHERE {_TLOG_WAP_PRED}
        )
        SELECT CAST(o_orderkey % 4 AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM t GROUP BY 1
    """,
    tags=("S9-wap", "lakehouse", "write-audit-publish", "branch", "occ"),
)
def table_log_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9-wap — WRITE-AUDIT-PUBLISH (SURVEY §7 candidate (b)): the
    production pattern for gating data quality at the commit boundary.
    WRITE stages an append on a BRANCH ref — data files land (staged
    write + manifest stats in one job) and a branch commit file
    records them outside the main log's numbered sequence, so main
    readers cannot resolve the staged snapshot. AUDIT validates the
    branch's delta (non-empty, no NULL keys, CHECK(o_totalprice > 0),
    data-vs-manifest-stats agreement) in one bounded agg over only the
    staged bytes. PUBLISH promotes the audited payload onto main
    through the OCC rebase protocol (a blind append: empty read set,
    commutes with concurrent main commits) and retires the branch.
    The lifecycle exercises BOTH gates on the registry table: a
    constraint-violating candidate (negated prices) must fail its
    audit and abort with main byte-identical, then the good slice
    publishes as v3. Failed-audit isolation, publish idempotence
    (same-commit adoption), and publish-vs-append concurrency are
    pytest-pinned.

    Scale: WAP's cost model is what makes it viable at 100 TB —
    staging is the write you were doing anyway, the audit reads only
    the delta (never the table), and publish is one metadata commit.
    The branch ref mechanism adds zero read-path cost: invisibility-
    until-referenced is already the commit protocol's rule.

    Engine divergence note: Iceberg WAP keeps the branch after
    publish (fast-forward); here a published branch is retired —
    with single-commit branches the two are equivalent, and retiring
    keeps the ref namespace from growing unboundedly."""
    root = _tlog_build(spark, sf_dir, _tlog_wap_root(sf_dir))
    _tlog_apply_wap(spark, sf_dir, root)
    return _tlog_dml_fingerprint(spark, root)


interpolate_docstrings(globals())
