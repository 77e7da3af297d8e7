"""Property-based tests (hypothesis) for the hand-implemented codecs:
geohash encode/decode and the Avro OCF binary encoding — the two places
where a subtle bit-level bug could silently corrupt data at scale."""

from __future__ import annotations

import io
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_in_time_series_data_spark.functions import geohash as gh
from anomaly_detection_in_time_series_data_spark.sources import avro_fallback as av

lat = st.floats(min_value=-90, max_value=90, allow_nan=False)
lon = st.floats(min_value=-180, max_value=180, exclude_max=True, allow_nan=False)


@given(lat, lon)
@settings(max_examples=200, deadline=None)
def test_geohash_roundtrip_within_cell(la, lo):
    g = gh.encode(la, lo, 12)
    assert len(g) == 12 and all(c in gh._BASE32 for c in g)
    lat_lo, lat_hi, lon_lo, lon_hi = gh.decode_bounds(g)
    assert lat_lo <= la <= lat_hi
    assert lon_lo <= lo <= lon_hi
    # precision-12 cells are tiny
    assert lat_hi - lat_lo < 1e-6 and lon_hi - lon_lo < 1e-6


@given(lat, lon, st.integers(min_value=1, max_value=12))
@settings(max_examples=100, deadline=None)
def test_geohash_prefix_monotone(la, lo, k):
    # The k-char geohash is a prefix of the 12-char one (hierarchical cells).
    assert gh.encode(la, lo, 12).startswith(gh.encode(la, lo, k))


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_avro_zigzag_varint_roundtrip(n):
    buf = io.BytesIO()
    av._write_long(buf, n)
    r = av._Reader(buf.getvalue())
    assert r.read_long() == n


record = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.one_of(st.none(), st.text(max_size=40)),
        "x": st.one_of(
            st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)
        ),
        "flag": st.one_of(st.none(), st.booleans()),
        "tags": st.lists(st.text(max_size=8), max_size=4),
    }
)


@given(st.lists(record, max_size=20))
@settings(max_examples=50, deadline=None)
def test_avro_container_roundtrip(records):
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "x", "type": ["null", "double"]},
            {"name": "flag", "type": ["null", "boolean"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    data = av._encode_container(records, schema)
    r = av._Reader(data)
    assert r.read(4) == av.MAGIC
    # skip metadata map
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            r.read(r.read_long())
            r.read(r.read_long())
    r.read(16)
    out = []
    while r.pos < len(data):
        cnt = r.read_long()
        r.read_long()
        for _ in range(cnt):
            out.append(r.read_value(schema))
        r.read(16)
    assert out == records


@given(
    st.floats(min_value=-89.9, max_value=89.9),
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-89.9, max_value=89.9),
    st.floats(min_value=-179.9, max_value=179.9),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=200, deadline=None)
def test_region_boundary_bound_is_a_true_lower_bound(
    plat, plon, qlat, qlon, precision
):
    """For any probe and any point OUTSIDE the probe cell's 3x3
    neighborhood, the boundary bound must not exceed the haversine
    distance — the pruned-search acceptance rule
    (candidate_dist <= bound  =>  provably nearest) depends on it."""
    import math

    from anomaly_detection_in_time_series_data_spark.functions import geohash as gh

    cell = gh.encode(plat, plon, precision)
    region = {cell, *gh.neighbors(cell)}
    if gh.encode(qlat, qlon, precision) in region:
        return  # q inside the region: the bound makes no claim about it
    bound = gh.min_distance_to_region_boundary(plat, plon, cell)

    phi1, phi2 = math.radians(plat), math.radians(qlat)
    dphi = math.radians(qlat - plat)
    dlmb = math.radians(qlon - plon)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2
    )
    dist = 2 * 6371000.0 * math.asin(math.sqrt(a))
    assert bound <= dist + 1e-6


# ---------------------------------------------------------------------------
# Misra-Gries merge: the candidate-superset guarantee the two-pass heavy
# hitter relies on must hold for EVERY stream and EVERY batch split.
# ---------------------------------------------------------------------------

from anomaly_detection_in_time_series_data_spark.operators import sketches as sk  # noqa: E402


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=3, max_value=12),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_mg_merge_superset_guarantee(stream, capacity, batch_size):
    counters: dict = {}
    for i in range(0, len(stream), batch_size):
        batch: dict = {}
        for k in stream[i : i + batch_size]:
            batch[k] = batch.get(k, 0) + 1
        counters = sk._mg_merge(counters, batch, capacity)
        assert len(counters) <= capacity
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for k, c in true.items():
        if c * (capacity + 1) > n:  # freq > N/(capacity+1) must survive
            assert k in counters, (k, c, n, capacity)
        if k in counters:  # MG never overcounts
            assert counters[k] <= c


# ---------------------------------------------------------------------------
# Rollup partials: merging is invariant under ANY split of the rows into
# sub-aggregations (associativity/commutativity of the carried summaries).
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # minute bucket within the day
            st.integers(min_value=-99999, max_value=99999),  # value in cents
        ),
        min_size=2,
        max_size=60,
    ),
    st.randoms(),
)
@settings(max_examples=30, deadline=None)
def test_rollup_merge_split_invariance(rows, rng):
    """Pure-Python model of the decimal partial merge: any grouping of rows
    into partial summaries merges to the identical (n, s, ss, mn, mx)."""
    from decimal import Decimal

    def partial(rs):
        n = len(rs)
        s = sum(Decimal(v) / 100 for _, v in rs)
        ss = sum((Decimal(v) / 100) ** 2 for _, v in rs)
        mn = min(v / 100.0 for _, v in rs)
        mx = max(v / 100.0 for _, v in rs)
        return (n, s, ss, mn, mx)

    def merge(a, b):
        return (
            a[0] + b[0], a[1] + b[1], a[2] + b[2],
            min(a[3], b[3]), max(a[4], b[4]),
        )

    direct = partial(rows)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    cut = rng.randrange(1, len(shuffled))
    merged = merge(partial(shuffled[:cut]), partial(shuffled[cut:]))
    assert merged == direct


# --- round-7 exact-arithmetic helpers -------------------------------------


@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(min_value=1, max_value=2**31),
)
def test_pmod_floor_div_identity_matches_python(p, q):
    """The portable floor-division identity (p - ((p % q) + q) % q) / q
    used by `queries._fdiv` and the pca/mu oracles must equal Python's
    floor division for any sign of p — in EXACT integer arithmetic (the
    Spark-side caveat about / being double division past 2^53 is why
    the big-magnitude call sites use SQL `div`; this pins the algebra
    itself)."""
    pm = ((p % q) + q) % q
    assert (p - pm) % q == 0
    assert (p - pm) // q == p // q


@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=40))
@settings(max_examples=200)
def test_kadane_prefix_min_identity(xs):
    """best_burst_window's shuffle-free identity: for every j,
    max subarray ending at j = P_j - min(0, min_{k<j} P_k), so the global
    max over j equals the O(n^2) direct maximum."""
    pre = []
    s = 0
    for x in xs:
        s += x
        pre.append(s)
    best_direct = max(
        sum(xs[i:j + 1]) for i in range(len(xs)) for j in range(i, len(xs))
    )
    best_id = max(
        pre[j] - min([0] + pre[:j]) for j in range(len(xs))
    )
    assert best_id == best_direct


@given(st.lists(st.tuples(st.booleans(), st.booleans(), st.booleans(),
                          st.booleans()), min_size=1, max_size=60))
@settings(max_examples=100)
def test_shapley_lattice_weights_reduce_to_permutation_formula(rows):
    """The 12-row coalition-lattice components (weights 2/6, 1/6, 1/6,
    2/6 per channel) must reduce to the direct 3!-permutation Shapley
    average for ANY cohort table — the algebra
    shapley_attribution_components hard-codes."""
    from collections import defaultdict
    from fractions import Fraction
    from itertools import permutations

    cohorts = defaultdict(lambda: [0, 0])
    for c1, c2, c3, conv in rows:
        key = frozenset(
            ch for ch, on in (("a", c1), ("b", c2), ("c", c3)) if on
        )
        cohorts[key][0] += 1
        cohorts[key][1] += int(conv)

    def v(S):
        n, c = cohorts.get(frozenset(S), (0, 0))
        return Fraction(c, n) if n else Fraction(0)

    chans = ["a", "b", "c"]
    direct = {ch: Fraction(0) for ch in chans}
    for perm in permutations(chans):
        S = set()
        for ch in perm:
            direct[ch] += v(S | {ch}) - v(S)
            S.add(ch)
    direct = {ch: x / 6 for ch, x in direct.items()}

    lattice = {ch: Fraction(0) for ch in chans}
    for ch in chans:
        others = [o for o in chans if o != ch]
        subsets = [
            (frozenset(), 2), (frozenset({others[0]}), 1),
            (frozenset({others[1]}), 1), (frozenset(others), 2),
        ]
        for S, w in subsets:
            lattice[ch] += Fraction(w, 6) * (v(S | {ch}) - v(S))
    assert lattice == direct


# --- winding-number point-in-polygon (point_in_polygon_counts) ----------
# The query's integer winding predicate must agree with an independent
# even-odd ray-casting implementation on every point not exactly on an
# edge (the dart polygon is simple, so |winding| == crossing parity).

_DART = [(-80, -60), (0, 80), (80, -60), (0, -10)]


def _winding(px: int, py: int, poly) -> int:
    wn = 0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        d = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if y1 <= py < y2 and d > 0:
            wn += 1
        elif y2 <= py < y1 and d < 0:
            wn -= 1
    return wn


def _even_odd(px: int, py: int, poly) -> bool:
    # Independent formulation: count strict crossings of the rightward
    # ray using exact rational x-intersections (Fraction, no floats).
    from fractions import Fraction

    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xi = Fraction(x1) + Fraction(py - y1, y2 - y1) * (x2 - x1)
            if xi > px:
                inside = not inside
    return inside


def _on_edge(px: int, py: int, poly) -> bool:
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        d = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if d == 0 and min(x1, x2) <= px <= max(x1, x2) and (
            min(y1, y2) <= py <= max(y1, y2)
        ):
            return True
    return False


@given(st.integers(-120, 120), st.integers(-120, 120))
@settings(max_examples=500, deadline=None)
def test_winding_number_matches_even_odd_for_simple_polygon(px, py):
    from hypothesis import assume

    assume(not _on_edge(px, py, _DART))
    assert (_winding(px, py, _DART) != 0) == _even_odd(px, py, _DART)


# ---------------------------------------------------------------------------
# seasonal_difference_variance verdict algebra (fixed round 11)
# ---------------------------------------------------------------------------
#
# The emitted predicate must be the exact cross-multiplication of
#   s_dd/n_d - (s_d/n_d)^2  <  s_yy/n - (s_y/n)^2
# i.e.  (s_dd*n_d - s_d^2) * n^2  <  (s_yy*n - s_y^2) * n_d^2.
# The pre-round-11 form dropped a factor and flipped whenever the diff
# series had non-zero mean; pin the algebra against Fraction arithmetic,
# including the advisor's counterexample.


def _sdv_verdict(n_days, s_y, s_yy, n_diffs, s_d, s_dd):
    return (s_dd * n_diffs - s_d * s_d) * n_days * n_days < (
        s_yy * n_days - s_y * s_y
    ) * n_diffs * n_diffs


def test_sdv_counterexample_from_round10_advice():
    # n=9, s_y=9, s_yy=11, m=2, s_d=10, s_dd=50:
    # var_d = 50/2 - 25 = 0 < var_raw = 11/9 - 1 = 2/9 -> True;
    # the old predicate returned False here.
    assert _sdv_verdict(9, 9, 11, 2, 10, 50) is True
    old = (50 * 9 * 9 - 10 * 10 * 9) < (11 * 2 * 9 - 9 * 9 * 2)
    assert old is False  # documents the bug being pinned against


@given(
    st.lists(st.integers(0, 50), min_size=9, max_size=40),
)
@settings(max_examples=300, deadline=None)
def test_sdv_verdict_matches_fraction_variances(series):
    diffs = [series[i] - series[i - 7] for i in range(7, len(series))]
    n, m = len(series), len(diffs)
    s_y, s_yy = sum(series), sum(v * v for v in series)
    s_d, s_dd = sum(diffs), sum(v * v for v in diffs)
    var_raw = Fraction(s_yy, n) - Fraction(s_y, n) ** 2
    var_d = Fraction(s_dd, m) - Fraction(s_d, m) ** 2
    assert _sdv_verdict(n, s_y, s_yy, m, s_d, s_dd) == (var_d < var_raw)
