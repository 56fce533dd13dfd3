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


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=120,
    ),
    n_buckets=st.integers(min_value=1, max_value=16),
    descending=st.booleans(),
)
def test_bucketed_rank_recipe_matches_global_sort(vals, n_buckets, descending):
    """Pure-python model of bucketed_rank_cumsum's key logic: equal-
    width value buckets + per-bucket local ranks + bucket-count offset
    prefix sums must reproduce the exact global (value, key) ranks and
    running sums for arbitrary inputs, bucket counts, and direction —
    including all-equal values (zero span) and boundary landings."""
    import math

    items = list(enumerate(vals))  # key = index (unique tiebreak)
    lo, hi = min(vals), max(vals)
    span = float(hi) - float(lo)
    # mirror the operator's subnormal guard: span/n can underflow to
    # 0.0 while span > 0 (hypothesis-found) — a zero width divides by
    # zero; 1.0 degrades to one bucket, which stays correct
    width = span / n_buckets
    if width <= 0:
        width = 1.0

    def bkt(v):
        raw = (float(hi) - v) / width if descending else (v - float(lo)) / width
        return min(math.floor(raw), n_buckets - 1)

    order = sorted(items, key=lambda kv: (-kv[1] if descending else kv[1], kv[0]))
    global_rank = {k: i + 1 for i, (k, _v) in enumerate(order)}
    global_cum = {}
    acc = 0.0
    for k, v in order:
        acc += v
        global_cum[k] = acc

    # recipe: per-bucket local order + exclusive prefix offsets
    from collections import defaultdict
    buckets = defaultdict(list)
    for k, v in items:
        buckets[bkt(v)].append((k, v))
    rn_off, cum_off = {}, {}
    acc_n, acc_s = 0, 0.0
    for b in sorted(buckets):
        rn_off[b], cum_off[b] = acc_n, acc_s
        acc_n += len(buckets[b])
        acc_s += sum(v for _k, v in buckets[b])
    for b, members in buckets.items():
        members.sort(key=lambda kv: (-kv[1] if descending else kv[1], kv[0]))
        local_cum = 0.0
        for i, (k, v) in enumerate(members):
            local_cum += v
            assert rn_off[b] + i + 1 == global_rank[k], (b, k)
            # float sums: recipe groups additions differently from the
            # sequential global sum; allow per-element rounding slack
            assert abs((cum_off[b] + local_cum) - global_cum[k]) <= 1e-6 * (
                1.0 + abs(global_cum[k])
            )


@settings(max_examples=200, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=80),
    gap_us=st.integers(min_value=1, max_value=150),
    bucket_us=st.integers(min_value=1, max_value=300),
)
def test_global_islands_recipe_matches_sequential(gaps, gap_us, bucket_us):
    """Pure-python model of global_islands: per-time-bucket local
    islands + first/last boundary-chain merge must equal the
    sequential single-pass islands for arbitrary streams, gap
    thresholds, and bucket widths — including islands chaining
    through many buckets, empty buckets, and gaps landing exactly on
    the threshold (<= merges, > splits)."""
    ts = []
    t = 0
    for g in gaps:
        t += g
        ts.append(t)

    # sequential reference
    ref, cur, prev = [], [], None
    for x in ts:
        if prev is not None and x - prev > gap_us:
            ref.append(tuple(cur))
            cur = []
        cur.append(x)
        prev = x
    ref.append(tuple(cur))

    # recipe: local islands per bucket
    from collections import defaultdict
    by_bkt = defaultdict(list)
    for x in ts:
        by_bkt[x // bucket_us].append(x)
    local = {}  # (bkt, lid) -> [members]
    summary = []
    for b in sorted(by_bkt):
        members = sorted(by_bkt[b])
        lid, prev_x = 0, None
        for x in members:
            if prev_x is None or x - prev_x > gap_us:
                lid += 1
                local[(b, lid)] = []
            local[(b, lid)].append(x)
            prev_x = x
        summary.append((b, members[0], members[-1], lid))
    head = {}
    prev_row = None
    for b, first, last, n_isl in summary:
        if prev_row is not None and first - prev_row[2] <= gap_us:
            pk = (prev_row[0], prev_row[3])
            head[(b, 1)] = head.get(pk, pk)
        prev_row = (b, first, last, n_isl)
    merged = defaultdict(list)
    for key, members in local.items():
        merged[head.get(key, key)].extend(members)
    got = {tuple(sorted(v)) for v in merged.values()}
    assert got == {tuple(sorted(i)) for i in ref}

    # Round 10 replaced the sequential head-map scan with a DECLARATIVE
    # census resolution (two window passes — sorts.py:global_islands);
    # model THAT algorithm here too so the hypothesis sweep covers the
    # shipped logic, not just its predecessor: buckets whose first
    # island merges backward form CHAINS (run of merge_prev), and the
    # head key for a merging bucket is the last island of the nearest
    # PRECEDING chain bucket with >1 islands, else (chain head, 1).
    merge_prev = {}
    prev_row = None
    for b, first, last, n_isl in summary:
        merge_prev[b] = prev_row is not None and first - prev_row[2] <= gap_us
        prev_row = (b, first, last, n_isl)
    head2 = {}
    chain_head = None
    last_big = None  # (bkt, n_isl) of nearest preceding >1-island bucket IN CHAIN
    for b, first, last, n_isl in summary:
        if not merge_prev[b]:
            chain_head, last_big = b, None
        else:
            head2[(b, 1)] = last_big if last_big is not None else (chain_head, 1)
        if n_isl > 1:
            last_big = (b, n_isl)
    assert head2 == head, (head2, head)  # window resolution ≡ sequential scan
    merged2 = defaultdict(list)
    for key, members in local.items():
        merged2[head2.get(key, key)].extend(members)
    assert {tuple(sorted(v)) for v in merged2.values()} == {tuple(sorted(i)) for i in ref}


@settings(max_examples=50, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=30
    )
)
def test_holt_integer_recurrence_matches_reference(xs):
    """The Holt fold's floor-div-by-10 identity (used verbatim in both
    engines) must equal a plain Python floor-division reference on any
    integer series, including negative levels/trends."""
    from hadoop_based_distributed_batch_processing_system_spark.streaming.event_time import (
        _fd10_duck,
    )

    # reference fold
    l, b = xs[0], 0
    ref = [(l, b)]
    for x in xs[1:]:
        f = l + b
        l_new = (2 * x + 8 * f) // 10
        b_new = (3 * (l_new - l) + 7 * b) // 10
        l, b = l_new, b_new
        ref.append((l, b))
    # DuckDB evaluation of the shipped expression, step by step
    con = duckdb.connect()
    try:
        l, b = xs[0], 0
        for i, x in enumerate(xs[1:], start=1):
            # bare literals parse as INT32 in DuckDB; the real oracle's
            # operands are BIGINT columns, so cast the substitutions
            bl = lambda v: f"CAST({v} AS BIGINT)"
            l_expr = _fd10_duck(f"2 * {bl(x)} + 8 * ({bl(l)} + {bl(b)})")
            l_new = con.execute(f"SELECT CAST({l_expr} AS BIGINT)").fetchone()[0]
            b_expr = _fd10_duck(f"3 * ({bl(l_new)} - {bl(l)}) + 7 * {bl(b)}")
            b_new = con.execute(f"SELECT CAST({b_expr} AS BIGINT)").fetchone()[0]
            l, b = l_new, b_new
            assert (l, b) == ref[i], (i, (l, b), ref[i])
    finally:
        con.close()


@settings(max_examples=100, deadline=None)
@given(
    a=st.sets(st.integers(min_value=0, max_value=10**6), max_size=60),
    b=st.sets(st.integers(min_value=0, max_value=10**6), max_size=60),
    k=st.integers(min_value=1, max_value=20),
)
def test_kmv_union_of_kept_sets_is_kept_set_of_union(a, b, k):
    """The union-sketch validity claim in sketch_kmv_distinct: the k
    smallest of kept_k(A) ∪ kept_k(B) equal the k smallest of A ∪ B —
    so merging sketches loses nothing."""
    kept = lambda s: sorted(s)[:k]
    assert sorted(set(kept(a)) | set(kept(b)))[:k] == kept(a | b)


@settings(max_examples=50, deadline=None)
@given(s=st.text(min_size=0, max_size=40))
def test_kmv_nibble_sum_equals_hex_prefix_value(s):
    """The generated 12-nibble positional sum (DuckDB side) must equal
    int(md5(text)[:12], 16) — the value Spark's conv() produces."""
    import hashlib

    from hadoop_based_distributed_batch_processing_system_spark.operators.aggregates import (
        _KMV_V_DUCK,
    )

    con = duckdb.connect()
    try:
        got = con.execute(
            f"SELECT {_KMV_V_DUCK} FROM (SELECT ? AS text)", [s]
        ).fetchone()[0]
    finally:
        con.close()
    assert got == int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=1, max_value=500))
def test_position_attribution_weights_account_exactly(n):
    """The 40/20/40 integer micro-credit schedule: per-conversion total
    is exactly 1e6 for n<=2 and 8e5 + (n-2)*floor(2e5/(n-2)) for n>=3
    (floor loss < n-2 micros), with first/last fixed at 4e5."""
    if n == 1:
        weights = [1_000_000]
    elif n == 2:
        weights = [500_000, 500_000]
    else:
        mid = 200_000 // (n - 2)
        weights = [400_000] + [mid] * (n - 2) + [400_000]
    total = sum(weights)
    assert total <= 1_000_000
    assert 1_000_000 - total < max(n - 2, 1)


@given(s=st.text(alphabet="vcpse", max_size=300), cut=st.integers(min_value=0, max_value=300))
@settings(max_examples=400, deadline=None)
def test_funnel_automaton_equals_regex_and_is_batch_splittable(s, cut):
    """The streaming CEP automaton must (a) agree with the regex the
    batch operator and the DuckDB oracle use — non-overlapping match
    count AND first-completion end position — and (b) be insensitive
    to where a micro-batch boundary falls (state carry correctness):
    running the symbols in two chunks equals running them in one."""
    import re

    from hadoop_based_distributed_batch_processing_system_spark.streaming.stream_jobs import (
        funnel_automaton_step,
    )

    one = funnel_automaton_step(s, 0, 0, 0, 0)
    m = re.search(r"^(.*?v+cp)", s)
    assert one[0] == len(s)
    assert one[2] == len(re.findall(r"v+cp", s))
    assert one[3] == (len(m.group(1)) if m else 0)

    cut = min(cut, len(s))
    mid = funnel_automaton_step(s[:cut], 0, 0, 0, 0)
    two = funnel_automaton_step(s[cut:], *mid)
    assert two == one


@given(
    blocks=st.lists(
        st.builds(
            dict,
            dc=st.integers(min_value=-128, max_value=127),
            acs=st.lists(
                st.tuples(
                    st.integers(min_value=1, max_value=63),
                    st.integers(min_value=-511, max_value=511).filter(lambda v: v != 0),
                ),
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=150, deadline=None)
def test_jpeg_entropy_codec_fuzz_roundtrip(blocks):
    """Fuzz the whole baseline-JPEG entropy path: random quantized
    blocks (DC anywhere in category range, up to 8 random-position
    random-sign ACs — covering runs 0..62, ZRL, EOB and EXTEND on
    both tables) must encode to a valid scan and decode to exactly
    the NumPy IDCT reference of the same coefficients."""
    import numpy as np

    from hadoop_based_distributed_batch_processing_system_spark.operators.multimodal import (
        _JPEG_Q,
        _jpeg_idct_2d,
        decode_jpeg,
        synth_jpeg_from_blocks,
    )

    blks = []
    for b in blocks:
        blk = [0] * 64
        blk[0] = b["dc"]
        for pos, val in b["acs"]:
            blk[pos] = val
        blks.append(blk)
    payload = synth_jpeg_from_blocks(blks, bw=len(blks), bh=1)
    w, h, nb, _sp, _tl, last_dc, got = decode_jpeg(payload, return_blocks=True)
    assert (w, h, nb) == (8 * len(blks), 8, len(blks))
    assert last_dc == blks[-1][0]
    for blk, px in zip(blks, got):
        coef = np.array(blk, dtype=float).reshape(8, 8) * _JPEG_Q
        ref = np.clip(np.round(_jpeg_idct_2d(coef) + 128), 0, 255).astype(int)
        assert (px == ref).all()


@settings(max_examples=200, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=120,
    )
)
def test_twophase_cc_alternation_matches_union_find(edges):
    """Pure-python model of graph_cc_twophase's large-star/small-star
    alternation (the exact emission rules the Spark operator runs) vs
    union-find ground truth on arbitrary random multigraphs — star
    chains, cliques, isolated pairs, parallel edges, long paths. Also
    pins the convergence bound the operator's loud cap relies on
    (components here are <= 41 nodes, so 16 alternations is generous)."""
    E = {(max(u, v), min(u, v)) for u, v in edges if u != v}
    if not E:
        return

    # ground truth
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in E:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for n in parent:
        truth.setdefault(find(n), set()).add(n)
    truth_sets = {frozenset(s | {c}) for c, s in truth.items()}

    # star alternation — mirrors operators/graph.py:graph_cc_twophase
    cur = set(E)
    for _round in range(16):
        old = cur
        for step in ("large", "small"):
            adj: dict = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            new = set()
            for u, nbrs in adj.items():
                m = min(nbrs | {u})
                if step == "large":
                    for v in nbrs:
                        if v > u:
                            new.add((v, m))
                else:
                    for v in nbrs:
                        if v < u and v != m:
                            new.add((v, m))
                    if u != m:
                        new.add((u, m))
            cur = new
        if cur == old:
            break
    else:
        raise AssertionError("no convergence in 16 alternations")

    got: dict = {}
    for a, b in cur:
        got.setdefault(b, set()).add(a)
    got_sets = {frozenset(s | {c}) for c, s in got.items()}
    assert got_sets == truth_sets, (sorted(map(sorted, got_sets)), sorted(map(sorted, truth_sets)))
    # terminal state is a star forest: every child maps straight to
    # its component min, and no center appears as a child
    children = {a for a, _b in cur}
    centers = {b for _a, b in cur}
    assert not (children & centers)


# ---- commit-log table format kernel (S9): model-based resolution ----

@st.composite
def _rebase_writer_sequences(draw):
    """A sequence of writers against one table, each committing from a
    possibly-STALE base (lag 0-3 versions behind head at its turn):
    a blind APPEND, a REMOVE of a file live at its base (read_set =
    that file), or a DV-ONLY commit binding a deletion vector to a
    live file (add=[], remove=[] — ADVICE r12: these are logical
    writes to their target and must participate in conflict
    detection like any other touch)."""
    n = draw(st.integers(min_value=2, max_value=10))
    return [
        (
            draw(st.integers(min_value=0, max_value=3)),  # base lag
            draw(st.sampled_from(["append", "remove", "dv"])),  # commit shape
            draw(st.integers(min_value=0, max_value=5)),  # which live file
        )
        for _ in range(n)
    ]


@settings(max_examples=30, deadline=None)
@given(seq=_rebase_writer_sequences())
def test_rebase_serializability_matches_model(seq):
    """_tlog_commit_rebase must admit EXACTLY the writers a
    serializability model admits: a writer succeeds iff no commit
    after its base touched a file its change derived from (blind
    appends always succeed via rebase); every success's change
    applies; every rejection raises the true-conflict error and
    changes nothing."""
    import os
    import shutil
    import tempfile

    import pytest as _pytest

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        TableLogConflictError,
        _tlog_commit,
        _tlog_commit_rebase,
        _tlog_latest_version,
        _tlog_live_files,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_rebase_prop_")
    try:
        os.makedirs(os.path.join(root, "_log"))
        _tlog_commit(root, add=["file_base0", "file_base1"], remove=[], base_version=-1)
        touched_at: list[set] = [set()]  # per version, files its commit touched
        live = {"file_base0", "file_base1"}
        counter = 0
        for lag, shape, pick in seq:
            head = _tlog_latest_version(root)
            base = max(0, head - lag)
            base_live = {
                os.path.basename(p) for p in _tlog_live_files(root, base)
            }
            add, remove, dv, read_set = [], [], None, set()
            if shape == "dv" and base_live:
                # DV-only commit: binds a sidecar to a base-live file
                # — a LOGICAL write to that file (ADVICE r12)
                target = sorted(base_live)[pick % len(base_live)]
                dv, read_set = {target: f"dv_{target}_w{counter}"}, {target}
            else:
                add = [f"file_w{counter}"]
                if shape == "remove" and base_live:
                    target = sorted(base_live)[pick % len(base_live)]
                    remove, read_set = [target], {target}
            counter += 1
            # model: conflict iff any commit in (base, head] touched us
            # — where "touched" includes DV bindings on a file
            ours = read_set | set(remove) | set(add) | set((dv or {}).keys())
            model_conflict = any(
                touched_at[v] & ours for v in range(base + 1, head + 1)
            )
            # (a stale remove of an already-removed file is conflict
            # by this same rule: its remover touched it)
            if model_conflict:
                with _pytest.raises(TableLogConflictError, match="true write conflict"):
                    _tlog_commit_rebase(
                        root, add=add, remove=remove, dv=dv,
                        base_version=base, read_set=read_set,
                    )
                # rejected: no commit, no new version
            else:
                v = _tlog_commit_rebase(
                    root, add=add, remove=remove, dv=dv,
                    base_version=base, read_set=read_set,
                )
                assert v == head + 1
                live = (live - set(remove)) | set(add)
                touched_at.append(ours)
        assert {
            os.path.basename(p)
            for p in _tlog_live_files(root, _tlog_latest_version(root))
        } == live
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def _tlog_histories(draw):
    """A random commit history: each commit adds fresh file names and
    removes a subset of the then-live set (the CoW invariant — a
    commit never adds a name that ever existed before, mirroring
    content-addressed file naming)."""
    n_commits = draw(st.integers(min_value=1, max_value=9))
    history, live, counter = [], set(), 0
    for _ in range(n_commits):
        n_add = draw(st.integers(min_value=0, max_value=3))
        add = [f"file_g{counter + i}" for i in range(n_add)]
        counter += n_add
        remove = sorted(
            f for f in sorted(live) if live and draw(st.booleans())
        )
        live = (live - set(remove)) | set(add)
        # optional per-commit state maps: a DV binding on some
        # still-live file, stats bounds on an added file
        dv = {}
        if live and draw(st.booleans()):
            target = draw(st.sampled_from(sorted(live)))
            dv[target] = f"dv_{target}_v{len(history)}"
        stats = {}
        if add and draw(st.booleans()):
            stats[add[0]] = {"k": [len(history), len(history) + 10]}
        history.append({"add": add, "remove": remove, "dv": dv, "stats": stats})
    return history


@settings(max_examples=30, deadline=None)
@given(history=_tlog_histories())
def test_tablelog_resolution_matches_model_replay(history):
    """_tlog_commit + _tlog_live_files (with whatever checkpoints the
    cadence wrote) must equal a plain dict-replay model at EVERY
    version — the format kernel's core invariant. Vacuum at a random
    horizon then deletes exactly the model's unreferenced files,
    retained versions still resolve, and sub-horizon versions that
    lost files raise the retention error."""
    import os
    import shutil
    import tempfile

    import pytest as _pytest

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_commit,
        _tlog_commit_ts,
        _tlog_live_dvs,
        _tlog_live_files,
        _tlog_live_stats,
        _tlog_vacuum,
        _tlog_version_as_of,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_tlog_prop_")
    try:
        os.makedirs(os.path.join(root, "_log"))
        model_live: list[set] = []
        model_dv: list[dict] = []
        model_stats: list[dict] = []
        live: set = set()
        dv: dict = {}
        stats: dict = {}
        for v, c in enumerate(history):
            for f in c["add"]:  # data dirs must exist for vacuum to delete
                os.makedirs(os.path.join(root, f), exist_ok=True)
            got = _tlog_commit(
                root,
                add=c["add"],
                remove=c["remove"],
                base_version=v - 1,
                dv=c["dv"] or None,
                stats=c["stats"] or None,
            )
            assert got == v
            live = (live - set(c["remove"])) | set(c["add"])
            for f in c["remove"]:
                dv.pop(f, None)
                stats.pop(f, None)
            dv.update(c["dv"])
            stats.update(c["stats"])
            model_live.append(set(live))
            model_dv.append(dict(dv))
            model_stats.append(dict(stats))
        latest = len(history) - 1
        for v in range(latest + 1):
            assert {
                os.path.basename(p) for p in _tlog_live_files(root, v)
            } == model_live[v], f"version {v} diverged from model"
            assert _tlog_live_dvs(root, v) == model_dv[v], f"dv state diverged at v{v}"
            assert _tlog_live_stats(root, v) == model_stats[v], f"stats diverged at v{v}"
        # commit stamps: strictly monotonic with gaps >= 2, and as-of
        # floor-resolution agrees with the stamp sequence
        ts = [_tlog_commit_ts(root, v) for v in range(latest + 1)]
        assert all(b >= a + 2 for a, b in zip(ts, ts[1:]))
        for v, t in enumerate(ts):
            assert _tlog_version_as_of(root, t) == v
            if v < latest:
                assert _tlog_version_as_of(root, ts[v + 1] - 1) == v
        assert _tlog_version_as_of(root, ts[-1] + 1000) == latest
        # vacuum at the latest horizon: exactly the unreferenced names go
        referenced = model_live[latest]
        ever = {f for c in history for f in c["add"]}
        deleted = set(_tlog_vacuum(root, retain_version=latest))
        assert deleted == ever - referenced
        assert {
            os.path.basename(p) for p in _tlog_live_files(root, latest)
        } == referenced
        for v in range(latest):
            if model_live[v] - referenced:
                with _pytest.raises(RuntimeError, match="vacuum"):
                    _tlog_live_files(root, v)
            else:
                assert {
                    os.path.basename(p) for p in _tlog_live_files(root, v)
                } == model_live[v]
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=30, deadline=None)
@given(history=_tlog_histories(), data=st.data())
def test_restore_matches_model_at_any_target(history, data):
    """RESTORE promoted to a property: against ANY commit history
    (adds, removes, DV bindings, stats) and ANY target version, one
    `_tlog_restore` commit must make head's ENTIRE replayed state —
    live files, DV bindings, stats bounds — equal the target
    snapshot's, and a second restore by TIMESTAMP back to the
    pre-restore head must round-trip it. This is the touch-to-reset
    discipline under adversarial state: a kept file whose sidecar
    state differs in either direction must reset, identical state
    must survive untouched."""
    import os
    import shutil
    import tempfile

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_commit,
        _tlog_commit_ts,
        _tlog_live_dvs,
        _tlog_live_files,
        _tlog_live_stats,
        _tlog_restore,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_restore_prop_")
    try:
        os.makedirs(os.path.join(root, "_log"))
        model_live, model_dv, model_stats = [], [], []
        live, dv, stats = set(), {}, {}
        for v, c in enumerate(history):
            _tlog_commit(
                root, add=c["add"], remove=c["remove"], base_version=v - 1,
                dv=c["dv"] or None, stats=c["stats"] or None,
            )
            live = (live - set(c["remove"])) | set(c["add"])
            for f in c["remove"]:
                dv.pop(f, None)
                stats.pop(f, None)
            dv.update(c["dv"])
            stats.update(c["stats"])
            model_live.append(set(live))
            model_dv.append(dict(dv))
            model_stats.append(dict(stats))
        latest = len(history) - 1
        target = data.draw(st.integers(min_value=0, max_value=latest))

        def state(v):
            return (
                {os.path.basename(p) for p in _tlog_live_files(root, v)},
                _tlog_live_dvs(root, v),
                _tlog_live_stats(root, v),
            )

        v1 = _tlog_restore(root, to_version=target)
        assert v1 == latest + 1
        assert state(v1) == (model_live[target], model_dv[target], model_stats[target])
        # round-trip BY TIMESTAMP back to the pre-restore head
        v2 = _tlog_restore(root, to_ts=_tlog_commit_ts(root, latest))
        assert v2 == v1 + 1
        assert state(v2) == (model_live[latest], model_dv[latest], model_stats[latest])
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def _tlog_feed_histories(draw):
    """Commit histories WITH row content, restricted to the format's
    own writer discipline: file groups carry disjoint key ranges; a
    plain DV (re)bind only GROWS its doomed set (the delete_where
    no-resurrection rule — every sparse re-delete unions prior doomed
    keys); binding SHRINKS travel as state-reset TOUCH pairs (the same
    file removed and re-added in one commit with the new binding —
    restore's mechanism), which may also resurrect everything by
    touching with no binding."""
    n_commits = draw(st.integers(min_value=1, max_value=6))
    history, live, doomed, counter = [], {}, {}, 0

    def fresh_file(n_keys):
        nonlocal counter
        name = f"file_p{counter}"
        keys = list(range(counter * 100, counter * 100 + n_keys))
        counter += 1
        return name, keys

    # commit 0 always adds at least one file (the bootstrap snapshot)
    for v in range(n_commits):
        shapes = ["add"]
        if live:
            shapes += ["remove", "dv", "touch"]
        shape = draw(st.sampled_from(shapes)) if v else "add"
        add, remove, dv = {}, [], {}
        if shape == "add":
            for _ in range(draw(st.integers(min_value=1, max_value=2))):
                name, keys = fresh_file(draw(st.integers(min_value=1, max_value=5)))
                add[name] = keys
        elif shape == "remove":
            remove = [draw(st.sampled_from(sorted(live)))]
        elif shape == "dv":
            f = draw(st.sampled_from(sorted(live)))
            grown = set(doomed.get(f, ())) | set(
                draw(st.sets(st.sampled_from(live[f])))
            )
            dv[f] = sorted(grown)
        else:  # touch: remove+add same file, binding reset to ANY subset
            f = draw(st.sampled_from(sorted(live)))
            remove, add = [f], {f: None}  # None: data unchanged
            new_doomed = draw(st.sets(st.sampled_from(live[f]))) if draw(
                st.booleans()
            ) else set()
            if new_doomed:
                dv[f] = sorted(new_doomed)
        history.append({"add": add, "remove": remove, "dv": dv})
        for f in remove:
            if f not in add:
                live.pop(f, None)
            doomed.pop(f, None)
        for f, keys in add.items():
            if keys is not None:
                live[f] = keys
        for f, ks in dv.items():
            doomed[f] = set(ks)
    return history


@settings(max_examples=25, deadline=None)
@given(history=_tlog_feed_histories(), data=st.data())
def test_feed_replay_reconstructs_every_snapshot(history, data):
    """The DV-complete change-feed CONTRACT as a property (VERDICT r13
    item 1): for ANY commit history the format's writers can produce —
    appends, file removes, grow-only DV (re)bindings, state-reset
    touch pairs, and a final RESTORE to a random target — replaying
    the feed's row transitions (removes then adds, per commit) on top
    of the bootstrap snapshot reconstructs the table's LIVE CONTENT at
    every single version. No Spark involved: the simple feed reader is
    pure pyarrow, so this runs as a fast model test."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_commit,
        _tlog_restore,
    )
    from hadoop_based_distributed_batch_processing_system_spark.sources.pyds import (
        TableLogFeedStreamReader,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_feed_prop_")
    try:
        os.makedirs(os.path.join(root, "_log"))

        def write_group(name, keys):
            d = os.path.join(root, name)
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "o_orderkey": pa.array(keys, pa.int64()),
                        "o_totalprice": pa.array(
                            [k + 0.5 for k in keys], pa.float64()
                        ),
                    }
                ),
                os.path.join(d, "part-0.parquet"),
            )

        file_keys: dict[str, list[int]] = {}
        live: set = set()
        binding: dict[str, list[int]] = {}
        model_content: list[dict[int, float]] = []

        def content():
            out = {}
            for f in live:
                dead = set(binding.get(f, ()))
                for k in file_keys[f]:
                    if k not in dead:
                        out[k] = k + 0.5
            return out

        for v, c in enumerate(history):
            dv_payload = {}
            for f, ks in c["dv"].items():
                sidecar = f"dv_{f}_v{v}"
                write_group(sidecar, ks)
                dv_payload[f] = sidecar
            for f, keys in c["add"].items():
                if keys is not None:
                    write_group(f, keys)
                    file_keys[f] = keys
            _tlog_commit(
                root,
                add=sorted(c["add"]),
                remove=sorted(c["remove"]),
                base_version=v - 1,
                dv=dv_payload or None,
            )
            for f in c["remove"]:
                if f not in c["add"]:
                    live.discard(f)
                binding.pop(f, None)
            live |= set(c["add"])
            binding.update({f: ks for f, ks in c["dv"].items()})
            model_content.append(content())

        latest = len(history) - 1
        # a final RESTORE to any target composes with the feed too
        target = data.draw(st.integers(min_value=0, max_value=latest))
        _tlog_restore(root, to_version=target)
        model_content.append(model_content[target])

        reader = TableLogFeedStreamReader({"root": root})
        replica = dict(model_content[0])  # bootstrap = v0 snapshot
        for v in range(1, latest + 2):
            rows, _ = reader.read({"next": v})
            rows = list(rows)
            for _v, side, k, p in rows:
                if side == "remove":
                    replica.pop(k, None)
            for _v, side, k, p in rows:
                if side == "add":
                    replica[k] = p
            assert replica == model_content[v], (
                f"feed replay diverged at v{v}: "
                f"{sorted(replica)} != {sorted(model_content[v])}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_constraint_replay_matches_model_across_checkpoints(data):
    """CHECK constraints as replayed log state, as a property: for ANY
    sequence of commits carrying add/drop constraint maps (interleaved
    with plain data commits, crossing checkpoint boundaries), the
    resolved live set equals a dict fold — and resolution starting
    from a checkpoint that folded the key agrees with the full
    replay. Pure metadata: no Spark."""
    import json
    import os
    import shutil
    import tempfile

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _TLOG_CHECKPOINT_EVERY,
        _tlog_commit,
        _tlog_live_constraints,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_chk_prop_")
    try:
        os.makedirs(os.path.join(root, "_log"))
        names = ["a", "b", "c"]
        preds = ["x > 0", "x > 1", "y IS NOT NULL"]
        n = data.draw(st.integers(min_value=1, max_value=3 * _TLOG_CHECKPOINT_EVERY))
        model: dict[str, str] = {}
        models = []
        for v in range(n):
            kind = data.draw(st.sampled_from(["data", "add", "drop"]))
            cons = None
            if kind == "add":
                nm = data.draw(st.sampled_from(names))
                cons = {nm: data.draw(st.sampled_from(preds))}
            elif kind == "drop" and model:
                cons = {data.draw(st.sampled_from(sorted(model))): None}
            _tlog_commit(
                root,
                add=[f"file_p{v}"] if kind == "data" else [],
                remove=[],
                base_version=v - 1,
                constraints=cons,
            )
            for nm, pred in (cons or {}).items():
                if pred is None:
                    model.pop(nm, None)
                else:
                    model[nm] = pred
            models.append(dict(model))
        for v in range(n):
            assert _tlog_live_constraints(root, v) == models[v], f"v{v}"
        # checkpoints that folded the key agree with the full replay
        logd = os.path.join(root, "_log")
        for f in os.listdir(logd):
            if f.endswith(".checkpoint.json"):
                cp = json.load(open(os.path.join(logd, f)))
                assert cp["constraints"] == models[cp["version"]]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- column-mapping fold vs a pure-python model ---------------------------

_CMAP_OPS = st.lists(
    st.one_of(
        # rename field 1 or 2 to a fresh name drawn from a small pool
        st.tuples(
            st.just("rename"),
            st.integers(min_value=1, max_value=3),
            st.sampled_from(["k", "price", "amount", "qty", "v2"]),
        ),
        # drop a field id (no-op if absent)
        st.tuples(st.just("drop"), st.integers(min_value=1, max_value=3), st.none()),
        # add a data group carrying a physical binding for fields 1..3
        st.tuples(st.just("add"), st.integers(min_value=1, max_value=3), st.none()),
        # remove the most recently added live group (no-op if none)
        st.tuples(st.just("remove"), st.just(0), st.none()),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=30, deadline=None)
@given(ops=_CMAP_OPS)
def test_colmap_fold_matches_model_across_checkpoints(ops):
    """The column-mapping replay (`_tlog_live_colmap`, replace-fold)
    and the physical-binding replay (`colphys` via `_tlog_replay_map`,
    merge-fold with remove-drops) must agree with a pure-python model
    AT EVERY VERSION, through whatever checkpoints the commit cadence
    writes mid-sequence (every 4th commit folds both keys). Random
    interleavings of rename/drop/add/remove explore fold orders the
    single-lifecycle pytest cannot."""
    import json
    import os
    import tempfile

    from hadoop_based_distributed_batch_processing_system_spark.operators.scans import (
        _tlog_commit,
        _tlog_live_colmap,
        _tlog_replay_map,
    )

    root = tempfile.mkdtemp(prefix="hbdbps_cmprop_")
    try:
        os.makedirs(os.path.join(root, "_log"))
        # v0: bootstrap mapping with fields 1 and 2
        fields = {1: "a", 2: "b"}
        _tlog_commit(
            root, add=[], remove=[], base_version=-1,
            column_mapping={"fields": [
                {"id": i, "name": n} for i, n in sorted(fields.items())
            ]},
        )
        model_fields = [dict(fields)]  # per-version snapshots
        model_phys: list[dict] = [{}]
        live: list[str] = []
        next_g = 0
        v = 0
        for op, fid, name in ops:
            fields = dict(fields)
            phys = dict(model_phys[-1])
            add, remove, cm, cp = [], [], None, None
            if op == "rename" and fid in fields:
                fields[fid] = name
                cm = True
            elif op == "drop" and fid in fields:
                del fields[fid]
                cm = True
            elif op == "add":
                g = f"file_p{next_g}"
                next_g += 1
                binding = {str(i): f"phys_{fields.get(i, i)}" for i in (1, 2, 3)}
                add, cp = [g], {g: binding}
                phys[g] = binding
                live.append(g)
            elif op == "remove" and live:
                g = live.pop()
                remove = [g]
                phys.pop(g, None)
            else:
                continue  # structurally a no-op: commit nothing
            # the data dirs need not exist for fold-replay purposes,
            # but the checkpoint writer resolves live files; keep the
            # dirs real so _tlog_live_files can stat them
            for g in add:
                os.makedirs(os.path.join(root, g), exist_ok=True)
                open(os.path.join(root, g, "_SUCCESS"), "w").close()
            _tlog_commit(
                root, add=add, remove=remove, base_version=v,
                column_mapping=(
                    {"fields": [
                        {"id": i, "name": n} for i, n in sorted(fields.items())
                    ]}
                    if cm
                    else None
                ),
                colphys=cp,
            )
            v += 1
            model_fields.append(dict(fields))
            model_phys.append(phys)
        # verify EVERY version against the model (checkpoints at
        # v=3,7,11 fold the keys; versions after them replay deltas)
        for ver in range(v + 1):
            got = _tlog_live_colmap(root, ver)
            want = model_fields[ver]
            assert got is not None
            assert {f["id"]: f["name"] for f in got["fields"]} == want, ver
            assert _tlog_replay_map(root, ver, "colphys") == model_phys[ver], ver
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


# --- column-mapping predicate translation (ADVICE r15, pinned r16) ---------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_colmap_translate_is_simultaneous_substitution(data):
    """PROPERTY: the logical->physical predicate translation is a
    SIMULTANEOUS substitution — equivalent to tokenizing the predicate
    and mapping each identifier through the binding table exactly
    once. Holds under arbitrary permutation bindings (swaps, chains,
    cycles), which the old sequential re.sub loop violated whenever
    one field's logical name equaled another's physical name."""
    import re

    from hadoop_based_distributed_batch_processing_system_spark.operators.lakehouse import (
        _tlog_colmap_translate,
    )

    names = data.draw(
        st.lists(_ident, min_size=1, max_size=6, unique=True)
    )
    # physical spellings: a permutation of the SAME name pool plus
    # fresh names — maximizes swap/chain collisions
    pool = names + data.draw(
        st.lists(_ident, min_size=0, max_size=4, unique=True).filter(
            lambda xs: not set(xs) & set(names)
        )
    )
    phys = data.draw(st.permutations(pool))[: len(names)]
    fields = [{"id": i + 1, "name": n} for i, n in enumerate(names)]
    binding = {str(i + 1): p for i, p in enumerate(phys)}
    # a predicate mentioning every logical name (plus noise tokens)
    pred = " AND ".join(f"{n} > {i}" for i, n in enumerate(names))
    got = _tlog_colmap_translate(pred, fields, binding)
    # the specification: single-pass token mapping
    table = dict(zip(names, phys))
    want = re.sub(
        r"[a-z][a-z0-9_]*",
        lambda m: table.get(m.group(0), m.group(0)),
        pred,
    )
    # the uppercase AND keyword is invisible to both the translator's
    # \b-alternation and the spec tokenizer, so equality is strict
    assert got == want
    # ADVICE r16 #4: identifier-shaped tokens inside single-quoted
    # literals (including '' escapes) are NEVER respelled — extend
    # the same predicate with literal terms quoting a live logical
    # name and check against a literal-aware spec tokenizer
    lit = data.draw(st.sampled_from(names))
    pred2 = pred + f" AND note = '{lit}' AND tag = 'it''s {lit}'"
    got2 = _tlog_colmap_translate(pred2, fields, binding)
    want2 = re.sub(
        r"'(?:[^']|'')*'|[a-z][a-z0-9_]*",
        lambda m: (
            m.group(0)
            if m.group(0).startswith("'")
            else table.get(m.group(0), m.group(0))
        ),
        pred2,
    )
    assert got2 == want2
    assert f"'{lit}'" in got2  # the literal span survived byte-for-byte
