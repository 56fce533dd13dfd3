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
