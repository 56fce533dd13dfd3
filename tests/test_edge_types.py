"""Pins for the DECIMAL/DST edge-type operators (VERDICT r14 #8):
the parquet side-fixture must carry a REAL decimal physical type, the
decimal pipeline must be bit-exact, and the DST buckets must show the
spring-forward gap and fall-back doubling — independent of the
session timezone."""

import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


def test_decimal_fixture_is_physically_decimal(spark):
    """The side-fixture's parquet footer must declare DECIMAL(18,2) —
    a double in disguise would make the 'decimal round-trip' claim
    false even while sums happened to agree."""
    import pyarrow.parquet as pq

    from hadoop_based_distributed_batch_processing_system_spark.operators.edge_types import (
        _decimal_fixture,
    )

    root = _decimal_fixture(spark, SF_SMOKE)
    part = next(
        os.path.join(root, "decimals", f)
        for f in os.listdir(os.path.join(root, "decimals"))
        if f.endswith(".parquet")
    )
    schema = pq.read_schema(part)
    assert str(schema.field("price_dec").type) == "decimal128(18, 2)"
    assert str(schema.field("qty_dec").type) == "decimal128(3, 0)"
    # and the Spark read agrees
    d = spark.read.parquet(os.path.join(root, "decimals"))
    assert dict(d.dtypes)["price_dec"] == "decimal(18,2)"


def test_decimal_sum_is_exact_not_float(spark):
    """The grouped decimal sum equals the integer-cents sum EXACTLY —
    the invariant a double accumulator only approximates."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.edge_types import (
        _decimal_fixture,
    )
    from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
        load_table,
    )

    root = _decimal_fixture(spark, SF_SMOKE)
    d = spark.read.parquet(os.path.join(root, "decimals"))
    dec_cents = (d.agg(F.sum("price_dec")).first()[0]) * 100
    int_cents = (
        load_table(spark, SF_SMOKE, "orders")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")))
        .first()[0]
    )
    assert int(dec_cents) == int_cents
    assert dec_cents == int(dec_cents)  # no fractional residue at all


def test_dst_buckets_gap_and_doubling_under_any_session_tz(spark):
    """The two pathological civil hours, pinned under THREE session
    timezones (UTC, New York itself, Tokyo): 02:xx on 03-10 must not
    exist; 01:xx on 11-03 must carry exactly the rows of two UTC
    hours. Identical output across session zones proves the operator
    never consults the session clock."""
    from hadoop_based_distributed_batch_processing_system_spark.registry import (
        load_all,
    )

    registry = load_all()
    fn = registry["window_dst_boundary"].fn
    prev = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            results[tz] = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert results["UTC"] == results["America/New_York"] == results["Asia/Tokyo"]
    rows = {(d, h): (n, s) for d, h, n, s in results["UTC"]}
    # spring forward: hour 2 does not exist on 03-10
    assert ("03-10", 2) not in rows
    assert ("03-10", 1) in rows and ("03-10", 3) in rows
    # fall back: hour 1 on 11-03 carries two UTC hours' worth — it
    # must strictly exceed every other hour of that morning
    n_1 = rows[("11-03", 1)][0]
    assert n_1 > rows[("11-03", 0)][0]
    assert n_1 > rows[("11-03", 2)][0]
    # row conservation: folding hours must rearrange rows, never
    # drop or duplicate them — the fall stream's buckets sum to the
    # full order count
    total = sum(n for (d, _), (n, _) in rows.items() if d == "11-03")
    n_orders = (
        spark.read.parquet(
            os.path.join(SF_SMOKE, "orders.parquet")
        ).count()
    )
    assert total == n_orders  # the fall stream loses nothing


def test_dst_spring_stream_conserves_rows(spark):
    """Row conservation on the spring side too: the gap hour moves
    rows to hour 3, it must not drop them."""
    from hadoop_based_distributed_batch_processing_system_spark.registry import (
        load_all,
    )

    registry = load_all()
    rows = sorted(
        map(
            tuple,
            registry["window_dst_boundary"].fn(spark, SF_SMOKE).collect(),
        )
    )
    n_orders = spark.read.parquet(
        os.path.join(SF_SMOKE, "orders.parquet")
    ).count()
    spring_total = sum(n for d, h, n, s in rows if d == "03-10")
    assert spring_total == n_orders
