"""Local mirror of the driver's DuckDB differential check.

Runs a registered query's Spark DataFrame and its DuckDB oracle SQL
over the same parquet files and compares row-count, column names, and
an order-insensitive canonical form of every row (floats rounded to
6 dp, timestamps at µs precision, arrays recursed)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from hadoop_based_distributed_batch_processing_system_spark.sources.io import TABLES

NULL = "<NULL>"


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_cell(v):
    if v is None:
        return NULL
    if isinstance(v, (np.floating, float)):
        v = float(v)
        if math.isnan(v):
            return NULL
        return f"{round(v, 6):.6f}"
    if isinstance(v, Decimal):
        # Type-faithful on purpose: the driver hashes the SERIALIZED
        # cell, so a Spark DecimalType column fails its hash check even
        # when numerically equal to the oracle's double (the r09
        # ml_decision_stump miss — this mirror used to coerce Decimal
        # to float and stayed green while the driver went red). Tag the
        # type so a decimal-vs-double leak fails LOCALLY too.
        return f"dec:{round(float(v), 6):.6f}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return NULL
    try:
        if pd.isna(v):
            return NULL
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    # itertuples, not iterrows: same cell values (verified identical
    # across float/int/bool/str/ts/date/Decimal/array/None/NaT), ~9x
    # faster — iterrows builds a Series per row, and on full-table
    # results (600k-row window/sort queries at sf0.1) that Series
    # construction dominated the whole differential sweep
    rows = [
        tuple(canon_cell(v) for v in t)
        for t in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def compare(spark, spec, sf_dir: str) -> None:
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()

    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(odf)
    assert scols == ocols, f"{spec.name}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), f"{spec.name}: row count spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        # hoist the sets: building set(orows) INSIDE the comprehension
        # re-hashed the full result per row — O(n^2) on a 600k-row
        # mismatch, which presented as an unkillable wedge instead of
        # a failure (caught by SIGUSR1 stack dump, r17 surplus)
        oset, sset = set(orows), set(srows)
        diff_s = [r for r in srows if r not in oset][:5]
        diff_o = [r for r in orows if r not in sset][:5]
        raise AssertionError(f"{spec.name}: value mismatch\n spark-only={diff_s}\n oracle-only={diff_o}")
