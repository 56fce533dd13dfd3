import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# --- Reduced documents fixture for the brute-force-shaped parity cases.
#
# `documents` is 500 rows at BOTH sf0.001 and sf0.01 (measured r09), so
# the O(n²) dedup parity tests cost the same (~20–40 s each) at every
# driver scale — 165 s of the parity file's 495 s. This fixture keeps
# every near-dup PAIR MEMBER (union of the jaccard / containment /
# portable-simhash oracle pairs at sf0.01, extracted 2026-08-15) plus a
# deterministic background slice, cutting the pair count ~8× while the
# pair structure under test survives intact. Non-document tables are
# symlinked from sf0.01. If the driver regenerates the corpus the
# member list goes stale — the fixture then fails LOUDLY (pair-count
# assertion) rather than silently attesting a near-empty subset;
# re-extract the list with the command in the assertion message.
_DOC_SUBSET_MEMBERS = [
    5, 8, 26, 31, 38, 44, 45, 52, 56, 58, 61, 70, 72, 76, 87, 92, 98,
    107, 111, 120, 134, 142, 152, 156, 166, 178, 180, 185, 216, 221,
    228, 230, 244, 245, 251, 257, 264, 267, 271, 274, 280, 285, 290,
    293, 295, 301, 302, 310, 315, 320, 323, 326, 330, 332, 334, 354,
    355, 374, 377, 378, 383, 387, 389, 393, 395, 397, 413, 420, 421,
    435, 444, 446, 447, 450, 453, 455, 456, 458, 457, 462, 465, 466,
    486,
]
_DOC_SUBSET_BACKGROUND = 100  # lowest non-member doc_ids added as filler
SF_DOC_SUBSET_DIR = "/tmp/hbdbps_doc_subset_sf001"


def _build_doc_subset() -> str:
    """Materialize the reduced-documents sf dir (idempotent, keyed on
    the source parquet's size+mtime so a regenerated corpus rebuilds)."""
    src = f"{SF_ORACLE}/documents.parquet"
    st = os.stat(src)
    stamp = f"{st.st_size}-{int(st.st_mtime)}-{len(_DOC_SUBSET_MEMBERS)}"
    stamp_file = os.path.join(SF_DOC_SUBSET_DIR, ".stamp")
    if os.path.exists(stamp_file) and open(stamp_file).read() == stamp:
        return SF_DOC_SUBSET_DIR
    os.makedirs(SF_DOC_SUBSET_DIR, exist_ok=True)
    # Serialize concurrent pytest sessions (ADVICE r09): without the
    # lock both sessions redo the full DuckDB build, and the loser can
    # crash creating symlinks the winner already made. The artifact
    # promotion below stays atomic regardless (os.replace / temp-name
    # symlink), so the lock is an efficiency+tidiness guard, not the
    # correctness mechanism — a second process entering after the
    # winner releases just hits the stamp fast-path.
    import fcntl

    lock_fh = open(os.path.join(SF_DOC_SUBSET_DIR, ".lock"), "w")
    fcntl.flock(lock_fh, fcntl.LOCK_EX)
    try:
        if os.path.exists(stamp_file) and open(stamp_file).read() == stamp:
            return SF_DOC_SUBSET_DIR
        return _build_doc_subset_locked(src, stamp, stamp_file)
    finally:
        fcntl.flock(lock_fh, fcntl.LOCK_UN)
        lock_fh.close()


def _build_doc_subset_locked(src: str, stamp: str, stamp_file: str) -> str:
    import duckdb
    ids = ",".join(map(str, _DOC_SUBSET_MEMBERS))
    con = duckdb.connect()
    # write under a per-process name, promote atomically: two pytest
    # sessions may build concurrently and readers must never see a
    # half-written parquet
    tmp = f"{SF_DOC_SUBSET_DIR}/.documents.{os.getpid()}.parquet"
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}'
          WHERE doc_id IN ({ids})
             OR doc_id IN (SELECT doc_id FROM '{src}'
                           WHERE doc_id NOT IN ({ids})
                           ORDER BY doc_id LIMIT {_DOC_SUBSET_BACKGROUND})
          ORDER BY doc_id
        ) TO '{tmp}' (FORMAT PARQUET)
        """
    )
    os.replace(tmp, f"{SF_DOC_SUBSET_DIR}/documents.parquet")
    n_pairs = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                  string_split(text, ' ')[i+1],
                                  string_split(text, ' ')[i+2]))) AS sh
          FROM '{SF_DOC_SUBSET_DIR}/documents.parquet'
          WHERE len(string_split(text, ' ')) >= 3
        )
        SELECT COUNT(*) FROM tok a, tok b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
        """
    ).fetchone()[0]
    assert n_pairs >= 10, (
        f"doc-subset fixture holds only {n_pairs} near-dup pairs — the corpus "
        "regenerated and tests/conftest.py:_DOC_SUBSET_MEMBERS is stale; "
        "re-extract it (union of id_a/id_b from the dedup_ngram_jaccard, "
        "dedup_containment and dedup_simhash_portable oracles at sf0.01)."
    )
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        dst = os.path.join(SF_DOC_SUBSET_DIR, f"{t}.parquet")
        if not os.path.lexists(dst):
            # temp-name + os.replace: atomic like the parquet above,
            # immune to a concurrent creator (ADVICE r09 TOCTOU note)
            tmp_link = f"{dst}.{os.getpid()}.tmp"
            os.symlink(f"{SF_ORACLE}/{t}.parquet", tmp_link)
            os.replace(tmp_link, dst)
    with open(stamp_file, "w") as fh:
        fh.write(stamp)
    return SF_DOC_SUBSET_DIR


@pytest.fixture(scope="session")
def sf_doc_subset():
    return _build_doc_subset()


@pytest.fixture(scope="session")
def spark():
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    spark = get_spark(app_name="hbdbps-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
