"""Round-7 wave: independent (brute-force / closed-form) twins for the new
queries, beyond the DuckDB oracle gate — each test recomputes the claimed
semantics a DIFFERENT way (pure-Python exact ints, numpy eigendecomposition,
O(n^2) reference scans) so a shared misunderstanding between the Spark query
and its SQL oracle cannot slip through both.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from anomaly_detection_in_time_series_data_spark import queries as q

SF = "/root/testdata/sf0.001"


def _theta_pairs_py(spark):
    """Brute-force theta-NN candidate pairs in pure Python ints."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    import math

    vecs = {
        r.vec_id: [math.floor(float(x) * 1000.0) for x in r.embedding]
        for r in emb
    }
    orth = {
        r.vec_id: "".join(
            "1" if float(x) >= 0 else "0" for x in r.embedding[:8]
        )
        for r in emb
    }
    ids = sorted(vecs)
    pairs = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if orth[a] == orth[b]:
                pairs[(a, b)] = sum(
                    x * y for x, y in zip(vecs[a], vecs[b])
                )
    return pairs


def test_reciprocal_best_match_vs_bruteforce(spark):
    pairs = _theta_pairs_py(spark)
    best: dict[int, tuple[int, int]] = {}
    for (a, b), dot in pairs.items():
        for s, t in ((a, b), (b, a)):
            cur = best.get(s)
            # order: dot desc, partner id asc
            if cur is None or (-dot, t) < (-cur[0], cur[1]):
                best[s] = (dot, t)
    expected = sorted(
        (a, b, best[a][0])
        for a in best
        for b in [best[a][1]]
        if a < b and best.get(b, (None, None))[1] == a
    )
    got = sorted(
        (r.vec_a, r.vec_b, r.dot_milli2)
        for r in q.QUERIES["reciprocal_best_match_pairs"](spark, SF).collect()
    )
    assert got == expected and len(got) > 0


def test_clustering_coefficient_vs_bruteforce(spark):
    pairs = _theta_pairs_py(spark)
    edges = {p for p, d in pairs.items() if d >= 250000}
    from collections import defaultdict

    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    expected = {}
    for v, ns in nbr.items():
        if len(ns) < 2:
            continue
        ns_sorted = sorted(ns)
        tri = sum(
            1
            for i, x in enumerate(ns_sorted)
            for y in ns_sorted[i + 1 :]
            if (min(x, y), max(x, y)) in edges
        )
        expected[v] = (len(ns), tri, 2 * tri, len(ns) * (len(ns) - 1))
    got = {
        r.vec_id: (r.degree, r.triangles, r.cc_num, r.cc_den)
        for r in q.QUERIES["clustering_coefficient_local"](
            spark, SF
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_lpa_matches_pure_python_rounds(spark):
    pairs = _theta_pairs_py(spark)
    edges = {p for p, d in pairs.items() if d >= 250000}
    from collections import Counter, defaultdict

    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    emb_ids = [
        r.vec_id
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id")
        .collect()
    ]
    label = {v: v for v in emb_ids}
    for _ in range(3):
        nxt = {}
        for v in emb_ids:
            if not nbr[v]:
                nxt[v] = label[v]
                continue
            c = Counter(label[u] for u in nbr[v])
            nxt[v] = min(
                c, key=lambda lab: (-c[lab], lab)
            )  # count desc, label asc
        label = nxt
    from collections import Counter as C2

    sizes = C2(label.values())
    m = len(edges)
    deg = {v: len(nbr[v]) for v in emb_ids}
    e_in = C2()
    for a, b in edges:
        if label[a] == label[b]:
            e_in[label[a]] += 1
    d_tot = C2()
    for v in emb_ids:
        d_tot[label[v]] += deg[v]
    expected = {
        lab: (
            sizes[lab],
            e_in.get(lab, 0),
            d_tot.get(lab, 0),
            4 * m * e_in.get(lab, 0) - d_tot.get(lab, 0) ** 2,
            4 * m * m,
        )
        for lab in sizes
    }
    got = {
        r.community: (r.n_members, r.e_internal, r.d_total, r.q_num_c, r.q_den)
        for r in q.QUERIES["lpa_communities_modularity"](spark, SF).collect()
    }
    assert got == expected
    # modularity of a partition is a well-formed rational in [-1/2, 1]
    Q = sum(Fraction(v[3], v[4]) for v in got.values())
    assert Fraction(-1, 2) <= Q <= 1


def test_hits_micro_matches_exact_linear_algebra(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter

    w = Counter((r.user_id, r.event_type) for r in rows)
    types = sorted({t for _, t in w})
    users = sorted({u for u, _ in w})
    a1 = {t: sum(w[(u, t)] for u in users) for t in types}
    h1 = {u: sum(w[(u, t)] * a1[t] for t in types) for u in users}
    a2 = {t: sum(w[(u, t)] * h1[u] for u in users) for t in types}
    h2 = {u: sum(w[(u, t)] * a2[t] for t in types) for u in users}
    got = q.QUERIES["hits_micro"](spark, SF).collect()
    auth = {r.node: r.score for r in got if r.kind == "authority"}
    hubs = {r.node: r.score for r in got if r.kind == "hub"}
    assert auth == a2
    top10 = dict(
        sorted(((str(u), h2[u]) for u in users), key=lambda kv: (-kv[1], kv[0]))[
            :10
        ]
    )
    assert hubs == top10


def _pca_reference_trace(sxx, syy, sxy):
    """Third, independent implementation of the exact 2-step iteration."""

    def fdiv(p, q):
        return (p - ((p % q) + q) % q) // q

    def half(x, y):
        rx, ry = sxx * x + sxy * y, sxy * x + syy * y
        mx = max(abs(rx), abs(ry))
        if mx == 0:
            return None, None
        d = max(1, mx // 1000000)
        return fdiv(rx, d), fdiv(ry, d)

    v = half(*half(1000000, 0))
    if v[0] < 0 or (v[0] == 0 and v[1] < 0):
        v = (-v[0], -v[1])
    return v


def test_pca_matches_exact_python_trace_on_fixture(spark):
    """Engine parity against a pure-Python big-int trace: the operator's
    contract is the exact 2-half-step iteration (the fixture's first two
    embedding dims are near-isotropic — eigengap ratio ~0.94 — so NO
    k-step method converges there; convergence is asserted on a
    well-separated synthetic spectrum in the next test)."""
    row = q.QUERIES["pca_top_component_micro"](spark, SF).collect()[0]
    assert (row.pc_x_micro, row.pc_y_micro) == _pca_reference_trace(
        row.sxx, row.syy, row.sxy
    )


def test_pca_converges_on_separated_spectrum(spark, tmp_path):
    np = pytest.importorskip("numpy")
    # Anisotropic 2-D cloud (principal axis along (2,1)), exactly
    # representable coordinates so quantization noise stays tiny.
    rng = [(i % 41) - 20 for i in range(400)]
    rows = [
        (i, [2.0 * t / 32.0 + (i % 7 - 3) / 64.0,
             1.0 * t / 32.0 - (i % 5 - 2) / 64.0])
        for i, t in enumerate(rng)
    ]
    import pyspark.sql.functions as _  # noqa: F401

    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    row = q.QUERIES["pca_top_component_micro"](spark, str(tmp_path)).collect()[0]
    S = np.array([[row.sxx, row.sxy], [row.sxy, row.syy]], dtype=float)
    vals, vecs = np.linalg.eigh(S)
    assert sorted(abs(vals))[0] / max(abs(vals)) < 0.2  # separated spectrum
    top = vecs[:, int(np.argmax(vals))]
    got = np.array([row.pc_x_micro, row.pc_y_micro], dtype=float)
    cos = abs(top @ got) / (np.linalg.norm(top) * np.linalg.norm(got))
    assert cos > 0.999, (cos, row)


def test_cdc_apply_identity_on_synthetic_changeset(spark):
    """apply(old, diff(old, new)) == new on data constructed to exercise
    ALL THREE ops at once (the fixture split may not contain deletes)."""
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "user_id long, event_type string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, "d")], "user_id long, event_type string"
    )
    j = old.withColumnRenamed("event_type", "old_type").join(
        new.withColumnRenamed("event_type", "new_type"), "user_id", "full_outer"
    )
    changeset = j.filter(
        F.col("old_type").isNull()
        | F.col("new_type").isNull()
        | (F.col("old_type") != F.col("new_type"))
    ).select(
        "user_id",
        F.when(F.col("old_type").isNull(), "insert")
        .when(F.col("new_type").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        "new_type",
    )
    ops = {r.user_id: r.op for r in changeset.collect()}
    assert ops == {1: "delete", 3: "update", 4: "insert"}
    survivors = old.join(changeset.select("user_id"), "user_id", "left_anti")
    upserts = changeset.filter(F.col("op") != "delete").select(
        "user_id", F.col("new_type").alias("event_type")
    )
    applied = {
        (r.user_id, r.event_type)
        for r in survivors.unionByName(upserts).collect()
    }
    assert applied == {(2, "b"), (3, "x"), (4, "d")}


def test_best_burst_window_vs_quadratic_reference(spark):
    rows = q.QUERIES["best_burst_window"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter, defaultdict

    daily = defaultdict(Counter)
    for r in ev:
        daily[r.event_type][r.ts.date()] += 1
    for out in rows:
        days = sorted(daily[out.event_type])
        D, N = len(days), sum(daily[out.event_type].values())
        dev = [daily[out.event_type][d] * D - N for d in days]
        # O(n^2) exact max subarray (must contain >= 1 element)
        best = None
        for i in range(len(dev)):
            s = 0
            for j in range(i, len(dev)):
                s += dev[j]
                if best is None or s > best[0] or (s == best[0] and days[j] < best[1]):
                    # tie on score -> earliest END day (matches row_number
                    # ordering score desc, day asc)
                    if best is None or s > best[0]:
                        best = (s, days[j])
        assert out.d_days == D and out.n_total == N
        assert (out.burst_score, out.burst_end_day) == best


def test_allen_relations_constructed_case(spark):
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    # One user, intervals engineered to hit 6 distinct relations.
    # (s, dur_minutes): sorted by s.
    iv = [
        (0, 10),   # A
        (20, 5),   # before (A ends 10 < 20)
        (25, 5),   # meets (ends 25 = 25)
        (27, 10),  # overlaps (27 < 30 < 37)
        (27, 3),   # wait — must keep input sorted by s; see below
    ]
    # Build explicit interval list sorted by (s, e): use values that keep
    # the lag pairing unambiguous.
    iv = [(0, 10), (20, 5), (25, 5), (27, 10), (27, 10), (27, 20), (50, 5)]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(minutes=s), float(d))
        for i, (s, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    one = df.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60.0).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    pairs = one.select(
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        F.lag("s").over(w).alias("sa"),
        F.lag("e").over(w).alias("ea"),
    ).filter(F.col("sa").isNotNull())
    sa, sb, ea, eb = (F.col(c) for c in ("sa", "sb", "ea", "eb"))
    relation = (
        F.when((sa == sb) & (ea == eb), "equals")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb) & (ea > eb), "started_by")
        .when(ea < sb, "before")
        .when(ea == sb, "meets")
        .when(ea == eb, "finished_by")
        .when(ea > eb, "contains")
        .otherwise("overlaps")
    )
    got = sorted(
        (r[0], r[1])
        for r in pairs.select(relation.alias("r"))
        .groupBy("r")
        .count()
        .collect()
    )
    # pairs: (A,B)=before, (B,C)=meets, (C,D)=overlaps(25+5=30 in 27..37),
    # (D,E)=equals, (E,F)=starts, (F,G)=before
    assert got == [("before", 2), ("equals", 1), ("meets", 1),
                   ("overlaps", 1), ("starts", 1)]


def test_shapley_components_reduce_to_exact_credits(spark):
    """The emitted components must reduce (in exact rational arithmetic)
    to the textbook 3-player Shapley values computed independently from
    per-user presence sets; efficiency (sum of credits = v(grand) - v(0))
    does NOT hold for the cohort-rate characteristic function, so the
    check is against the direct permutation formula."""
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict
    from itertools import permutations

    present = defaultdict(set)
    conv = defaultdict(int)
    for r in rows:
        if r.event_type in ("click", "view", "signup"):
            present[r.user_id].add(r.event_type)
        if r.event_type == "purchase":
            conv[r.user_id] = 1
    cohorts = defaultdict(lambda: [0, 0])
    for u in set(present) | set(conv):
        key = frozenset(present[u])
        cohorts[key][0] += 1
        cohorts[key][1] += conv.get(u, 0)

    def v(S):
        n, c = cohorts.get(frozenset(S), (0, 0))
        return Fraction(c, n) if n else Fraction(0)

    chans = ["click", "signup", "view"]
    phi = {c: Fraction(0) for c in chans}
    for perm in permutations(chans):
        S = set()
        for c in perm:
            phi[c] += v(S | {c}) - v(S)
            S.add(c)
    phi = {c: p / 6 for c, p in phi.items()}

    comp = q.QUERIES["shapley_attribution_components"](spark, SF).collect()
    got = defaultdict(lambda: Fraction(0))
    for r in comp:
        vw = Fraction(r.v_with_num, r.v_with_den) if r.v_with_den else Fraction(0)
        vo = Fraction(r.v_wo_num, r.v_wo_den) if r.v_wo_den else Fraction(0)
        got[r.channel] += Fraction(r.w_num, r.w_den) * (vw - vo)
    assert dict(got) == phi


def test_seasonal_dow_arithmetic_matches_python_weekday(spark):
    """(epoch_day + 3) % 7 must equal datetime.weekday() (Monday=0) —
    the independent check that the portable arithmetic dow is ISO."""
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter

    exp = Counter((r.event_type, r.ts.date().weekday()) for r in rows)
    got = {
        (r.event_type, r.dow_iso): (r.n_events, r.is_peak)
        for r in q.QUERIES["seasonal_dow_profile"](spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(exp)
    # peak day per type is the argmax (count desc, dow asc)
    for t in {k[0] for k in exp}:
        best = min(
            ((d, c) for (tt, d), c in exp.items() if tt == t),
            key=lambda dc: (-dc[1], dc[0]),
        )[0]
        peaks = [d for (tt, d), (_, p) in got.items() if tt == t and p]
        assert peaks == [best]


def test_user_longest_streaks_vs_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict

    days = defaultdict(set)
    for r in rows:
        days[r.user_id].add(r.ts.date().toordinal())
    expected = {}
    for u, ds in days.items():
        ds = sorted(ds)
        streaks = []
        cur = 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        expected[u] = (len(ds), max(streaks), len(streaks))
    got = {
        r.user_id: (r.n_active_days, r.longest_streak, r.n_streaks)
        for r in q.QUERIES["user_longest_streaks"](spark, SF).collect()
    }
    assert got == expected


def test_hourly_acf_lags_vs_pure_python(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter
    import datetime as dt

    hrs = Counter(r.ts.replace(minute=0, second=0, microsecond=0) for r in rows)
    lo, hi = min(hrs), max(hrs)
    series = []
    t = lo
    while t <= hi:
        series.append(hrs.get(t, 0))
        t += dt.timedelta(hours=1)
    expected = {}
    for L in (1, 2, 3, 6, 12, 24):
        xs, ys = series[:-L], series[L:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        expected[L] = (
            n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        )
    got = {
        r.lag: (r.n_pairs, r.r_num, r.den_x, r.den_y)
        for r in q.QUERIES["hourly_acf_lags"](spark, SF).collect()
    }
    assert got == expected


def test_truss_support_vs_bruteforce(spark):
    pairs = _theta_pairs_py(spark)
    edges = {p for p, d in pairs.items() if d >= 250000}
    from collections import defaultdict

    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    expected = {
        (a, b): len(nbr[a] & nbr[b]) for a, b in edges
    }
    got = {
        (r.vec_a, r.vec_b): r.support
        for r in q.QUERIES["truss_edge_support"](spark, SF).collect()
    }
    assert got == expected and len(got) > 0


def test_orthant_balance_totals_consistent(spark):
    out = q.QUERIES["orthant_balance_audit"](spark, SF).collect()
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out and all(r.total_vectors == n_emb for r in out)
    # candidate-pair identity per listed bucket
    for r in out:
        assert r.n_candidate_pairs == r.n_vectors * (r.n_vectors - 1) // 2
    # the listed heaviest buckets are ranked consistently
    sizes = [r.n_vectors for r in sorted(out, key=lambda r: r.rank)]
    assert sizes == sorted(sizes, reverse=True)


def test_lang_confusion_matrix_marginals(spark):
    out = q.QUERIES["lang_confusion_matrix"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert sum(r.n for r in out) == n_docs
    from collections import Counter

    label_counts = Counter(r.lang for r in docs.select("lang").collect())
    for lab in {r.label for r in out}:
        rows = [r for r in out if r.label == lab]
        assert sum(r.n for r in rows) == label_counts[lab]
        assert all(r.label_total == label_counts[lab] for r in rows)


def test_topk_membership_churn_vs_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter, defaultdict
    import datetime as dt

    wk = defaultdict(Counter)
    for r in rows:
        d = r.ts.date()
        monday = d - dt.timedelta(days=d.weekday())
        wk[monday][r.user_id] += 1
    tops = {
        w: {
            u
            for u, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        }
        for w, c in wk.items()
    }
    weeks = sorted(tops)
    expected = {}
    for a, b in zip(weeks, weeks[1:]):
        stay = len(tops[a] & tops[b])
        expected[a] = (
            len(tops[a]), len(tops[b]), stay,
            len(tops[a]) - stay, len(tops[b]) - stay,
            stay, len(tops[a] | tops[b]),
        )
    got = {}
    import datetime as dt2

    for r in q.QUERIES["topk_membership_churn"](spark, SF).collect():
        wdate = dt2.datetime.fromtimestamp(
            r.week_us / 1e6, dt2.timezone.utc
        ).date()
        got[wdate] = (
            r.n_a, r.n_b, r.n_stayed, r.n_dropped, r.n_entered,
            r.jaccard_num, r.jaccard_den,
        )
    assert got == expected


def test_business_days_formula_vs_python_calendar(spark):
    """The closed-form W(b+1)-W(a+1) must equal a literal Python loop
    over datetime.weekday() for the fixture's (order, ship) day pairs —
    the independent calendar check of the residue table."""
    import datetime as dt

    od = spark.read.parquet(f"{SF}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    first_ship = {}
    for r in li:
        d = r.l_shipdate.date()
        k = r.l_orderkey
        if k not in first_ship or d < first_ship[k]:
            first_ship[k] = d
    from collections import Counter

    exp = Counter()
    for r in od:
        if r.o_orderkey not in first_ship:
            continue
        a, b = r.o_orderdate.date(), first_ship[r.o_orderkey]
        if b >= a:
            n = sum(
                1
                for i in range(1, (b - a).days + 1)
                if (a + dt.timedelta(days=i)).weekday() < 5
            )
        else:
            n = -sum(
                1
                for i in range(1, (a - b).days + 1)
                if (b + dt.timedelta(days=i)).weekday() < 5
            )
        exp[n] += 1
    got = {
        r.business_days: r.n_orders
        for r in q.QUERIES["business_days_to_ship"](spark, SF).collect()
    }
    assert got == dict(exp)


def test_median_polish_reconstruction_identity(spark):
    """row_eff + col_eff + residual must reconstruct the original grid
    cell exactly, and the row medians of (v - row_eff) must be zero —
    the defining property of the first polish sweep."""
    rows = q.QUERIES["median_polish_micro"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter

    grid = Counter(
        (r.event_type, r.ts.date().weekday()) for r in ev
    )
    for r in rows:
        v = grid.get((r.event_type, r.dow_iso), 0)
        assert r.row_eff + r.col_eff + r.residual == v, r
    # per-row median of (residual + col_eff) is zero (7 cells, rank 4)
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r.residual + r.col_eff)
    for t, vals in by_type.items():
        assert sorted(vals)[3] == 0, (t, sorted(vals))


def test_copurchase_pairs_vs_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    pt = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    from collections import Counter, defaultdict
    from itertools import combinations

    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(pt[r.l_partkey])
    support = Counter()
    n_b = Counter()
    for brands in baskets.values():
        for b in brands:
            n_b[b] += 1
        for a, b in combinations(sorted(brands), 2):
            support[(a, b)] += 1
    n_orders = len(baskets)
    expected = sorted(
        support.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = q.QUERIES["copurchase_brand_pairs"](spark, SF).collect()
    assert [( (r.brand_a, r.brand_b), r.support) for r in got] == expected
    for r in got:
        assert (r.n_a, r.n_b, r.n_orders) == (
            n_b[r.brand_a], n_b[r.brand_b], n_orders
        )
        assert (r.lift_num, r.lift_den) == (
            r.support * n_orders, n_b[r.brand_a] * n_b[r.brand_b]
        )
