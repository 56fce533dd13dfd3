"""Corpus-drift guard: assert the measured physical reality of
/root/testdata against what FIXTURES.md documents and the engine
assumes.

The corpus was silently regenerated mid-build once (between rounds 2
and 3: events.ts flipped from TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
isAdjustedToUTC=false)), which broke 42 queries at the driver. These
tests make the NEXT regeneration fail loudly in one obvious place
instead of as a scatter of DATATYPE_MISMATCH errors.

Footer-only checks (pyarrow): no Spark session, so this module runs
in milliseconds and is safe to put first in the suite.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
    KNOWN_EVENTS_TS_SPECS,
    TABLES,
    events_ts_spec,
)

SF_DIRS = [d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)]

# row counts per FIXTURES.md (measured; driver-generated, seed-stable)
EXPECTED_ROWS = {
    "sf0.001": {"region": 5, "nation": 25, "supplier": 10, "customer": 150,
                "part": 200, "orders": 1_500, "lineitem": 6_000, "events": 1_000,
                "documents": 500, "embeddings": 500},
    "sf0.01": {"region": 5, "nation": 25, "supplier": 100, "customer": 1_500,
               "part": 2_000, "orders": 15_000, "lineitem": 60_000, "events": 10_000,
               "documents": 500, "embeddings": 500},
    "sf0.1": {"region": 5, "nation": 25, "supplier": 1_000, "customer": 15_000,
              "part": 20_000, "orders": 150_000, "lineitem": 600_000, "events": 100_000,
              "documents": 5_000, "embeddings": 2_000},
}

EVENTS_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

# full physical schemas, measured 2026-08-13 (arrow type spellings).
# A drift here means the corpus regenerated with different types —
# re-measure, update FIXTURES.md, and adjust any affected ingest.
EXPECTED_SCHEMAS = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"), ("n_regionkey", "int32")],
    "customer": [("c_custkey", "int64"), ("c_name", "string"), ("c_nationkey", "int32"),
                 ("c_acctbal", "double"), ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "int64"), ("s_name", "string"), ("s_nationkey", "int32"),
                 ("s_acctbal", "double")],
    "part": [("p_partkey", "int64"), ("p_name", "string"), ("p_brand", "string"),
             ("p_type", "string"), ("p_size", "int32"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "int64"), ("o_custkey", "int64"), ("o_orderstatus", "string"),
               ("o_totalprice", "double"), ("o_orderdate", "timestamp[us]"),
               ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "int64"), ("l_partkey", "int64"), ("l_suppkey", "int64"),
                 ("l_linenumber", "int32"), ("l_quantity", "double"),
                 ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp[us]")],
    "events": [("event_id", "int64"), ("ts", "timestamp[us]"), ("user_id", "int64"),
               ("event_type", "string"), ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "int64"), ("text", "string"), ("lang", "string"),
                  ("source", "string"), ("n_chars", "int64")],
    "embeddings": [("vec_id", "int64"), ("embedding", "list<element: float>"),
                   ("label", "int32")],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_all_tables_present(sf_dir):
    for t in TABLES:
        assert os.path.exists(f"{sf_dir}/{t}.parquet"), f"missing {t} in {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_row_counts_match_fixtures(sf_dir):
    sf = os.path.basename(sf_dir)
    expected = EXPECTED_ROWS.get(sf)
    if expected is None:
        pytest.skip(f"no documented counts for {sf}")
    measured = {t: pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata.num_rows for t in TABLES}
    assert measured == expected, (
        f"{sf}: corpus row counts drifted from FIXTURES.md — "
        f"re-measure and update docs + this test"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_events_schema_and_ts_encoding(sf_dir):
    """The engine's ingest branches on the probed ts encoding; this
    pins (a) probe output == footer reality, (b) the encoding is one
    the engine has a handled branch for, (c) column set is stable."""
    schema = pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow
    assert schema.names == EVENTS_COLUMNS, f"events columns drifted: {schema.names}"

    t = schema.field("ts").type
    spec = events_ts_spec(sf_dir)
    if pa.types.is_timestamp(t):
        assert spec == ("timestamp", t.unit, t.tz is not None)
        assert t.unit in ("s", "ms", "us", "ns"), f"unhandled ts unit {t.unit}"
    else:
        assert pa.types.is_int64(t), f"unhandled ts physical type {t} — add an ingest branch"
        assert spec[0] == "int64" and spec[1] in ("s", "ms", "us", "ns")
    # The allowed set names every encoding EVER measured in a corpus
    # generation (FIXTURES.md); today's is ("timestamp","us",False).
    # If this fails, the corpus silently regenerated a THIRD time —
    # probe-based ingest should still adapt (that's the point), but
    # re-measure, update FIXTURES.md, and extend KNOWN_EVENTS_TS_SPECS.
    assert spec in KNOWN_EVENTS_TS_SPECS, (
        f"events.ts encoding {spec} is not in the FIXTURES.md-pinned set "
        f"{sorted(KNOWN_EVENTS_TS_SPECS)} — corpus regenerated again"
    )
    assert spec == ("timestamp", "us", False), (
        f"events.ts encoding changed to {spec}; ingest auto-adapts but "
        f"FIXTURES.md needs re-measuring"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_all_table_schemas_match_fixtures(sf_dir):
    for t, expected in EXPECTED_SCHEMAS.items():
        schema = pq.ParquetFile(f"{sf_dir}/{t}.parquet").schema_arrow
        measured = [(f.name, str(f.type)) for f in schema]
        assert measured == expected, (
            f"{os.path.basename(sf_dir)}/{t}: physical schema drifted — "
            f"measured {measured}"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_other_timestamp_columns_native(sf_dir):
    """orders/lineitem timestamps must be Spark-4-native (not NANOS);
    the engine reads them without special-casing."""
    for table, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        t = pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow.field(col).type
        assert pa.types.is_timestamp(t) and t.unit != "ns", f"{table}.{col} is {t}"


def test_probe_memoization_is_stale_proof(tmp_path):
    """Regenerating a corpus in place (same path, new mtime) must
    re-probe — the cache key includes size+mtime_ns."""
    import pyarrow.parquet as pqw

    d = tmp_path / "corpus"
    d.mkdir()
    p = d / "events.parquet"
    tbl_us = pa.table({"ts": pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))})
    pqw.write_table(tbl_us, p)
    assert events_ts_spec(str(d)) == ("timestamp", "us", False)

    tbl_ns = pa.table({"ts": pa.array([1], type=pa.timestamp("ns"))})
    pqw.write_table(tbl_ns, p)
    os.utime(p, ns=(os.stat(p).st_mtime_ns + 1, os.stat(p).st_mtime_ns + 1))
    assert events_ts_spec(str(d)) == ("timestamp", "ns", False)


def test_int64_ts_unit_classified_from_footer_stats(tmp_path):
    """An UNANNOTATED int64 ts column must have its epoch unit read
    off the footer min-statistic, never assumed µs — the one raw-long
    encoding seen historically was ns, so a silent µs assumption would
    be 1000× wrong. Out-of-domain values must raise, not guess."""
    import pyarrow.parquet as pqw

    base_s = 1_717_200_000  # 2024-06-01 epoch-seconds
    for unit, scale in (("s", 1), ("ms", 10**3), ("us", 10**6), ("ns", 10**9)):
        d = tmp_path / f"corpus_{unit}"
        d.mkdir()
        tbl = pa.table({"ts": pa.array([base_s * scale, base_s * scale + 5], type=pa.int64())})
        pqw.write_table(tbl, d / "events.parquet")
        assert events_ts_spec(str(d)) == ("int64", unit)

    d = tmp_path / "corpus_bogus"
    d.mkdir()
    tbl = pa.table({"ts": pa.array([42], type=pa.int64())})
    pqw.write_table(tbl, d / "events.parquet")
    with pytest.raises(ValueError, match="no epoch unit"):
        events_ts_spec(str(d))


def test_directory_table_inplace_rewrite_reprobes(tmp_path):
    """100 TB layout hazard: rewriting part-files IN PLACE with
    unchanged names leaves the directory's own size/mtime unchanged.
    The cache key must aggregate part-file stats (like corpus_tag), so
    the rewrite misses the ts-spec cache and re-probes."""
    import pyarrow.parquet as pqw

    d = tmp_path / "corpus" / "events.parquet"
    d.mkdir(parents=True)
    p = d / "part-00000.parquet"
    tbl_us = pa.table({"ts": pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))})
    pqw.write_table(tbl_us, p)
    sf_dir = str(tmp_path / "corpus")
    dir_stat = os.stat(d)
    assert events_ts_spec(sf_dir) == ("timestamp", "us", False)

    tbl_ns = pa.table({"ts": pa.array([1], type=pa.timestamp("ns"))})
    pqw.write_table(tbl_ns, p)
    os.utime(p, ns=(os.stat(p).st_mtime_ns + 1, os.stat(p).st_mtime_ns + 1))
    # restore the directory's own stat to simulate an unchanged dir inode
    os.utime(d, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    assert events_ts_spec(sf_dir) == ("timestamp", "ns", False)


def test_probe_handles_directory_tables(tmp_path, spark):
    """100 TB layout: a 'table' is a DIRECTORY of part-files. The
    footer probe must probe a part-file, and load_table must read the
    directory (spark.read.parquet takes either)."""
    import pyarrow.parquet as pqw

    from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

    d = tmp_path / "corpus" / "events.parquet"
    d.mkdir(parents=True)
    for i in range(2):
        tbl = pa.table({
            "event_id": pa.array([2 * i, 2 * i + 1], type=pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i, 1_700_000_000_500_000 + i],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1, 2], type=pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        })
        pqw.write_table(tbl, d / f"part-{i:05d}.parquet")
    sf_dir = str(tmp_path / "corpus")
    assert events_ts_spec(sf_dir) == ("timestamp", "us", False)
    df = load_table(spark, sf_dir, "events")
    assert df.count() == 4
    assert str(df.schema["ts"].dataType) == "TimestampType()"
