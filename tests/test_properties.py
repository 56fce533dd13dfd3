"""Property-based tests (hypothesis) for pure-expression helpers —
no SparkSession needed, so these run in milliseconds and explore the
input space instead of pinning single examples."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import (
    _morton_expr,
    _morton_spread,
)


def _py_spread(v: int) -> int:
    out = 0
    for bit in range(16):
        if v & (1 << bit):
            out |= 1 << (2 * bit)
    return out


def _duck_eval(expr_sql: str) -> int:
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {expr_sql}").fetchone()[0]
    finally:
        con.close()


@settings(max_examples=50, deadline=None)
@given(v=st.integers(min_value=0, max_value=65535))
def test_morton_spread_matches_bitwise_reference(v):
    """The mask-shift cascade must equal the naive bit-by-bit spread
    for every 16-bit input."""
    got = _duck_eval(_morton_spread(str(v), lambda x, n: f"({x} << {n})"))
    assert got == _py_spread(v)


@settings(max_examples=50, deadline=None)
@given(a=st.integers(min_value=0, max_value=65535), b=st.integers(min_value=0, max_value=65535))
def test_morton_interleave_is_injective_and_ordered(a, b):
    """Interleaving must be reversible (bits land in disjoint even/odd
    positions) and preserve per-dimension ordering on shared prefixes."""
    z = _duck_eval(_morton_expr(str(a), str(b), lambda x, n: f"({x} << {n})"))
    assert z == _py_spread(a) | (_py_spread(b) << 1)
    # de-interleave recovers both inputs
    back_a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    back_b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (back_a, back_b) == (a, b)


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
        min_size=2,
        max_size=40,
    )
)
def test_binned_band_pairing_matches_bruteforce(vals):
    """The binned band-join recipe (bin=floor(v/W), probe bins
    {b-1,b,b+1}, exact filter) must find EXACTLY the brute-force band
    pairs for arbitrary value sets — pure-python model of
    join_range_binned's key logic."""
    import math

    W = 5.0
    items = list(enumerate(vals))
    brute = {
        (i, j)
        for i, vi in items
        for j, vj in items
        if i < j and abs(vi - vj) <= W
    }
    bins = {i: math.floor(v / W) for i, v in items}
    binned = set()
    for i, vi in items:
        for probe in (bins[i] - 1, bins[i], bins[i] + 1):
            for j, vj in items:
                if i < j and bins[j] == probe and abs(vi - vj) <= W:
                    binned.add((i, j))
                if j < i and bins[j] == probe and abs(vi - vj) <= W:
                    binned.add((j, i))
    assert binned == brute


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=300),
    cap=st.integers(min_value=2, max_value=8),
)
def test_misra_gries_guarantees(xs, cap):
    """Pure-python model of the MG summary in topk_heavy_hitters_mg:
    (a) every key with count > n/cap survives; (b) estimates never
    exceed true counts."""
    counts = {}
    for x in xs:
        if x in counts:
            counts[x] += 1
        elif len(counts) < cap:
            counts[x] = 1
        else:
            dead = []
            for k in counts:
                counts[k] -= 1
                if counts[k] == 0:
                    dead.append(k)
            for k in dead:
                del counts[k]
    true = {}
    for x in xs:
        true[x] = true.get(x, 0) + 1
    n = len(xs)
    for k, c in true.items():
        if c > n / cap:
            assert k in counts, f"guaranteed-frequent key {k} lost (count {c}, n {n}, cap {cap})"
    for k, est in counts.items():
        assert est <= true[k], f"MG over-counted {k}: {est} > {true[k]}"
