"""Round-6 operator properties: the algebraic identities behind the new
backlog operators, checked the cheap way (hypothesis over pure-Python
models) plus one Spark end-to-end invariant each."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark import queries as q


@given(st.lists(st.integers(min_value=-50, max_value=50), max_size=60))
@settings(max_examples=200, deadline=None)
def test_reflection_identity_matches_sequential_fold(deltas):
    """s_t = prefix_t - min(0, runmin(prefix)_t)  ==  the sequential
    fold s_t = max(0, s_{t-1} + d_t) — the identity `clamped_running_stock`
    rests on, over arbitrary integer delta sequences."""
    s = 0
    folded = []
    for d in deltas:
        s = max(0, s + d)
        folded.append(s)
    prefix = 0
    runmin = 0
    closed = []
    for d in deltas:
        prefix += d
        runmin = min(runmin, prefix)
        closed.append(prefix - min(runmin, 0))
    assert closed == folded


@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_largest_remainder_preserves_total_and_bounds(total, weights):
    """Hamilton allocation: sum == total exactly, and every share is
    floor or floor+1 of the exact proportional value."""
    wsum = sum(weights)
    base = [(total * w) // wsum for w in weights]
    rems = sorted(
        range(len(weights)),
        key=lambda i: (-((total * weights[i]) % wsum), i),
    )
    shortfall = total - sum(base)
    assert 0 <= shortfall < len(weights) or total == 0
    alloc = list(base)
    for i in rems[:shortfall]:
        alloc[i] += 1
    assert sum(alloc) == total
    for a, b in zip(alloc, base):
        assert a in (b, b + 1)


def test_allocation_sums_preserved_on_fixture(spark, sf_dir):
    """Spark end-to-end: every order's allocated cents sum EXACTLY to its
    total cents."""
    out = q.QUERIES["largest_remainder_allocation"](spark, sf_dir)
    bad = (
        out.groupBy("orderkey", "total_cents")
        .agg(F.sum("alloc_cents").alias("s"))
        .filter(F.col("s") != F.col("total_cents"))
        .count()
    )
    assert bad == 0


def test_distributed_rank_matches_naive_window(spark, sf_dir):
    """The two-phase rank's FULL output (not just the witness rows)
    equals the naive global window on the same data."""
    from pyspark.sql import Window

    from anomaly_detection_in_time_series_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_id", F.floor(F.col("value") * 1000.0).cast("bigint").alias("vm")
    )
    naive = v.withColumn(
        "rnk", F.row_number().over(Window.orderBy("vm", "event_id"))
    )
    witness = q.QUERIES["distributed_exact_rank"](spark, sf_dir)
    n = naive.select(
        F.col("event_id").alias("eid"), F.col("rnk").alias("naive_rnk")
    )
    joined = witness.join(n, witness["event_id"] == n["eid"], "left")
    assert joined.filter(F.col("naive_rnk").isNull()).count() == 0
    mism = joined.filter(F.col("rnk") != F.col("naive_rnk")).count()
    assert mism == 0


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_spc_cross_multiplied_sigma_gates_are_exact(counts):
    """The integer SPC gate (x*n - S)^2 > k^2 (n*Q - S^2) is EXACTLY the
    k-sigma test (x - mu)^2 > k^2 sigma^2 evaluated in rational
    arithmetic — the identity `spc_control_chart_rules` rests on, for
    both the 3-sigma and 2-sigma rules."""
    from fractions import Fraction

    n = len(counts)
    s = sum(counts)
    qq = sum(c * c for c in counts)
    mu = Fraction(s, n)
    var = Fraction(qq, n) - mu * mu
    for k2 in (4, 9):
        for x in counts:
            int_gate = (x * n - s) ** 2 > k2 * (n * qq - s * s)
            frac_gate = (Fraction(x) - mu) ** 2 > k2 * var
            assert int_gate == frac_gate


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=50)
)
@settings(max_examples=200, deadline=None)
def test_fano_rational_matches_var_over_mean(counts):
    """fano_num/fano_den == population variance / mean in exact rational
    arithmetic (whenever the mean is nonzero)."""
    from fractions import Fraction

    h = len(counts)
    s = sum(counts)
    qq = sum(c * c for c in counts)
    num, den = h * qq - s * s, h * s
    if s == 0:
        assert den == 0
        return
    mu = Fraction(s, h)
    var = Fraction(qq, h) - mu * mu
    assert Fraction(num, den) == var / mu


@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_record_days_window_formulation_matches_naive_scan(counts):
    """prev_max IS NULL OR cnt > prev_max picks exactly the strict
    running-extreme records of the sequence."""
    naive = []
    best = None
    for i, c in enumerate(counts):
        if best is None or c > best:
            naive.append(i)
            best = c
    windowed = [
        i
        for i, c in enumerate(counts)
        if i == 0 or c > max(counts[:i])
    ]
    assert windowed == naive


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_common_neighbor_union_derives_from_degrees(raw_edges):
    """|N(a) u N(b)| == deg(a) + deg(b) - |N(a) n N(b)| for NON-adjacent
    a, b in a simple graph — the degree-derived union denominator of
    `ann_graph_link_prediction` (adjacent pairs would need the -2
    correction; the query anti-joins them away first)."""
    edges = {(a, b) if a < b else (b, a) for a, b in raw_edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            cn = len(adj[a] & adj[b])
            union = len(adj[a] | adj[b])
            assert union == len(adj[a]) + len(adj[b]) - cn


@given(
    st.lists(
        st.integers(min_value=0, max_value=500_000), min_size=1, max_size=600
    )
)
@settings(max_examples=100, deadline=None)
def test_sorted_layout_scan_is_near_optimal(values):
    """Under the sorted layout the matching rows are contiguous, so the
    number of 256-row files a range scan touches is at most
    ceil(m/256) + 1 (the information-theoretic floor ceil(m/256) plus
    one boundary file) — the bound `zone_map_skipping_audit`
    demonstrates empirically."""
    lo, hi = 150_000, 200_000
    m = sum(lo <= v < hi for v in values)
    sv = sorted(values)
    files = [sv[i : i + 256] for i in range(0, len(sv), 256)]
    scanned = sum(1 for f in files if f[-1] >= lo and f[0] < hi)
    assert scanned <= -(-m // 256) + 1


def test_zone_map_sorted_layout_dominates_on_fixture(spark, sf_dir):
    """Spark end-to-end: the value-sorted layout never scans more files
    or rows than ingestion order, and both layouts agree on the exact
    number of matching rows (layout can't change the answer, only the
    I/O)."""
    out = {
        r["layout"]: r
        for r in q.QUERIES["zone_map_skipping_audit"](spark, sf_dir).collect()
    }
    ts, vo = out["ts_order"], out["value_order"]
    assert vo["n_files"] == ts["n_files"]
    assert vo["n_rows_matching"] == ts["n_rows_matching"]
    assert vo["n_files_scanned"] <= ts["n_files_scanned"]
    assert vo["n_rows_scanned"] <= ts["n_rows_scanned"]
    assert vo["n_rows_scanned"] >= vo["n_rows_matching"]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_tv_cross_product_matches_rational_total_variation(rows):
    """tv_num / tv_den == (1/2) sum_l |c_gl/n_g - c_l/n| in exact
    rational arithmetic, for every group — including languages absent
    from a group (the dense-grid term `t_closeness_audit` insists on)."""
    from collections import Counter
    from fractions import Fraction

    n = len(rows)
    group_of = Counter(g for g, _ in rows)
    lang_of = Counter(lang for _, lang in rows)
    cells = Counter(rows)
    for g, n_g in group_of.items():
        tv_num = sum(
            abs(cells.get((g, lang), 0) * n - c_l * n_g)
            for lang, c_l in lang_of.items()
        )
        tv_den = 2 * n_g * n
        tv = Fraction(1, 2) * sum(
            abs(
                Fraction(cells.get((g, lang), 0), n_g) - Fraction(c_l, n)
            )
            for lang, c_l in lang_of.items()
        )
        assert Fraction(tv_num, tv_den) == tv


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=80),
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_w1_cross_product_matches_rational_emd(xs, ys):
    """The cross-multiplied gap sum equals the exact 1-Wasserstein
    distance integral |F_x - F_y| dv between the two empirical
    distributions (quantile-coupling definition)."""
    from fractions import Fraction

    nx, ny = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    num = 0
    exact = Fraction(0)
    for v, nxt in zip(grid, grid[1:]):
        cx = sum(1 for x in xs if x <= v)
        cy = sum(1 for y in ys if y <= v)
        gap = nxt - v
        num += abs(cx * ny - cy * nx) * gap
        exact += abs(Fraction(cx, nx) - Fraction(cy, ny)) * gap
    assert Fraction(num, nx * ny) == exact
    # and the quantile-coupling definition agrees when sizes match
    if nx == ny:
        coupling = sum(abs(a - b) for a, b in zip(sorted(xs), sorted(ys)))
        assert exact * nx == coupling


def _haar_levels(xs):
    """Unnormalized Haar ladder (pure-python model): returns
    (detail_energies_per_level, final_approx_energy)."""
    energies = []
    cur = list(xs)
    for _ in range(3):
        a = [cur[i] + cur[i + 1] for i in range(0, len(cur) - 1, 2)]
        d = [cur[i] - cur[i + 1] for i in range(0, len(cur) - 1, 2)]
        energies.append(sum(v * v for v in d))
        cur = a
    return energies, sum(v * v for v in cur)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=16, max_size=16
    )
)
@settings(max_examples=200, deadline=None)
def test_haar_parseval_identity(xs):
    """Parseval for the unnormalized 3-level Haar ladder on a dyadic
    block: 8 * sum(x^2) == approx_l3 + detail_l3 + 2*detail_l2 +
    4*detail_l1 — the invariant that certifies `haar_wavelet_energy`
    loses nothing."""
    (e1, e2, e3), ae = _haar_levels(xs)
    assert 8 * sum(v * v for v in xs) == ae + e3 + 2 * e2 + 4 * e1


def test_haar_parseval_on_fixture(spark, sf_dir):
    """Spark e2e: the emitted energies satisfy Parseval against the raw
    first-16-days sum of squares per type."""
    from pyspark.sql import Window

    from anomaly_detection_in_time_series_data_spark.tables import load_table

    out = {
        r["event_type"]: r
        for r in q.QUERIES["haar_wavelet_energy"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("d")
    raw = {
        r["event_type"]: r["ss"]
        for r in daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 16)
        .groupBy("event_type")
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"))
        .collect()
    }
    for t, row in out.items():
        assert 8 * raw[t] == (
            row["approx_energy_l3"]
            + row["detail_energy_l3"]
            + 2 * row["detail_energy_l2"]
            + 4 * row["detail_energy_l1"]
        )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.booleans(),
        ),
        min_size=2,
        max_size=120,
    ),
    st.integers(min_value=0, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_gini_split_never_increases_impurity(rows, thr):
    """Gini is concave, so the weighted child impurity of ANY binary
    split is <= the parent impurity — checked on the exact rationals
    `gini_split_gain_deciles` emits (cross-multiplied, no floats)."""
    n = len(rows)
    p = sum(1 for _, y in rows if y)
    n_l = sum(1 for v, _ in rows if v <= thr)
    p_l = sum(1 for v, y in rows if v <= thr and y)
    n_r, p_r = n - n_l, p - p_l
    if n_l == 0 or n_r == 0:
        return
    weighted_num = 2 * (p_l * (n_l - p_l) * n_r + p_r * (n_r - p_r) * n_l)
    weighted_den = n_l * n_r * n
    parent_num = 2 * p * (n - p)
    parent_den = n * n
    assert weighted_num * parent_den <= parent_num * weighted_den


@given(
    st.lists(st.booleans(), min_size=1, max_size=100)
)
@settings(max_examples=200, deadline=None)
def test_runs_lag_change_count_equals_naive_runs(sides):
    """sum(side != lag(side)) with NULL-lag counting as a change equals
    the textbook run count (maximal same-side blocks)."""
    runs = 1 + sum(1 for a, b in zip(sides, sides[1:]) if a != b)
    lag_count = sum(
        1
        for i, s in enumerate(sides)
        if i == 0 or sides[i - 1] != s
    )
    assert lag_count == runs


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_double_average_ranks_give_exact_spearman(pairs):
    """Pearson on doubled average ranks equals Spearman-with-ties
    computed directly on (fractional) average ranks — scale invariance
    makes the integer doubling exact."""
    from fractions import Fraction

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
        ranks = [Fraction(0)] * len(vals)
        i = 0
        pos = 1
        svals = [vals[j] for j in order]
        while i < len(vals):
            j = i
            while j < len(vals) and svals[j] == svals[i]:
                j += 1
            avg = Fraction(pos + (pos + (j - i) - 1), 2)
            for k in range(i, j):
                ranks[order[k]] = avg
            pos += j - i
            i = j
        return ranks

    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    dx = [2 * r for r in rx]
    dy = [2 * r for r in ry]
    assert all(d.denominator == 1 for d in dx + dy)  # doubling is integral
    n = len(pairs)

    def moments(a, b):
        sab = sum(x * y for x, y in zip(a, b))
        return n * sab - sum(a) * sum(b)

    num_d = moments(dx, dy)
    num_f = moments(rx, ry)
    den_dx, den_fy = moments(dx, dx), moments(rx, rx)
    # doubled ranks scale num and each den by exactly 4
    assert num_d == 4 * num_f
    assert den_dx == 4 * den_fy


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=60), min_size=0, max_size=25),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_greedy_cover_rounds_match_reference_greedy(sets_):
    """The unrolled 3-round SQL shape (argmax, anti-join, repeat) equals
    the reference greedy max-coverage algorithm with (count desc, index
    asc) tie-breaks."""
    covered: set[int] = set()
    chosen: list[int] = []
    for _ in range(min(3, len(sets_))):
        best = None
        for i, s in enumerate(sets_):
            if i in chosen:
                continue
            marg = len(s - covered)
            key = (-marg, i)
            if best is None or key < best[0]:
                best = (key, i, marg)
        chosen.append(best[1])
        covered |= sets_[best[1]] - covered
    # the anti-join formulation: remaining pairs after removing winner's
    # tokens and winner's rows, then argmax again
    pairs = {(i, t) for i, s in enumerate(sets_) for t in s}
    picked: list[int] = []
    cov2: set[int] = set()
    for _ in range(min(3, len(sets_))):
        counts: dict[int, int] = {}
        for i, t in pairs:
            counts[i] = counts.get(i, 0) + 1
        for i in range(len(sets_)):
            if i not in picked:
                counts.setdefault(i, 0)
        best_i = min(counts, key=lambda i: (-counts[i], i))
        picked.append(best_i)
        won = {t for i, t in pairs if i == best_i}
        cov2 |= won
        pairs = {(i, t) for i, t in pairs if i != best_i and t not in won}
    assert picked == chosen and cov2 == covered


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), max_size=30
    ),
)
@settings(max_examples=200, deadline=None)
def test_join_delta_rule_is_lossless(orders, lines):
    """(O u dO) join (L u dL) == O|><|L u O|><|dL u dO|><|L u dO|><|dL as
    MULTISETS — the algebra `incremental_join_maintenance` executes (the
    boolean marks delta membership)."""
    from collections import Counter

    o_old = [k for k, d in orders if not d]
    o_new = [k for k, d in orders if d]
    l_old = [k for k, d in lines if not d]
    l_new = [k for k, d in lines if d]

    def join(os_, ls_):
        return Counter(
            (o, l) for o in os_ for l in ls_ if o == l
        )

    full = join(o_old + o_new, l_old + l_new)
    pieces = (
        join(o_old, l_old)
        + join(o_old, l_new)
        + join(o_new, l_old)
        + join(o_new, l_new)
    )
    assert full == pieces


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50)
)
@settings(max_examples=100, deadline=None)
def test_restatement_partition_is_exact(delays):
    """v1 + late_missed == final for ANY delay assignment — the report
    restatement audit is a partition, never an estimate."""
    run_deadline = 30 * 60  # minutes after day start, arbitrary
    v1 = sum(1 for d in delays if d < run_deadline)
    late = sum(1 for d in delays if d >= run_deadline)
    assert v1 + late == len(delays)


@given(
    st.lists(st.integers(min_value=-100, max_value=100), min_size=3, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_kdistance_rank_pick_is_third_best(dots):
    """row_number()=3 over dot DESC picks exactly the third-largest dot
    (with the deterministic ordering both engines share)."""
    ranked = sorted(dots, reverse=True)
    third = ranked[2]
    # emulate the window: stable rank over (dot desc, arrival order)
    order = sorted(range(len(dots)), key=lambda i: (-dots[i], i))
    assert dots[order[2]] == third


def test_mahalanobis_degenerate_covariance_emits_no_ranking(spark, tmp_path):
    """VERDICT r6 item 6: the det==0 guard needs a degenerate fixture, not
    just the guard expression.  A corpus whose first two embedding
    components are CONSTANT has a singular covariance matrix — the
    unguarded adjugate formula divides by zero and NaN/Inf scores would
    sort into the top-15.  The guarded query must return an EMPTY ranking
    (d2 NULL -> filtered), matching the oracle's mirrored CASE."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    spark.createDataFrame(
        [(i, [0.5, -0.25, float(i)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = q.QUERIES["mahalanobis_outliers_2d"](spark, str(tmp_path))
    assert out.count() == 0

    # Collinear (u = 2v + 0.25) is singular too, not just constant.
    # Power-of-two coordinates so the floor(x*1e6) micro-int domain
    # preserves the exact linear relation (1/64 and 0.25 are exact in
    # float32; i/64 * 1e6 = 15625*i with no rounding).
    spark.createDataFrame(
        [(i, [i / 32.0 + 0.25, i / 64.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    assert q.QUERIES["mahalanobis_outliers_2d"](spark, str(tmp_path)).count() == 0
