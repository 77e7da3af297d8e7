"""Round-4 operator invariants that the value-hash oracles cannot express:
bloom no-false-negatives, weighted-median definition, Theil-Sen breakdown
resistance, changepoint optimality vs a brute-force split scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every true member must be a candidate — a bloom filter may only
    err toward false positives. n_candidates >= n_members and every
    member key individually passes all-k-hit candidacy by construction
    (same hash on both sides); check the aggregate implication."""
    row = q.QUERIES["bloom_prejoin_fpr"](spark, sf_dir).collect()[0]
    assert row.n_candidates >= row.n_members
    assert row.n_false_pos == row.n_candidates - row.n_members
    assert 0 <= row.fp_rate <= 1.0
    # the filter can't set more bits than keys*k or the bitmap size
    assert row.n_bits_set <= min(row.n_keys * 4, 131072)


def test_weighted_median_definition(spark, sf_dir):
    """The weighted median w_m must satisfy the defining property:
    total weight at values <= w_m reaches half the total, and weight at
    values < w_m stays below half."""
    out = {
        r.l_returnflag: (r.w_median_cents, r.total_weight)
        for r in q.QUERIES["weighted_median_price"](spark, sf_dir).collect()
    }
    li = (
        __import__(
            "anomaly_detection_in_time_series_data_spark.tables",
            fromlist=["load_table"],
        )
        .load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100.0)
            .cast("bigint")
            .alias("cents"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
    )
    rows = li.collect()
    for flag, (wm, total) in out.items():
        grp = [(r.cents, r.w) for r in rows if r.l_returnflag == flag]
        assert total == sum(w for _, w in grp)
        at_or_below = sum(w for c, w in grp if c <= wm)
        below = sum(w for c, w in grp if c < wm)
        assert 2 * at_or_below >= total
        assert 2 * below < total


def test_theil_sen_resists_single_outlier(spark):
    """Corrupting ONE point of a clean linear series must leave the
    Theil-Sen slope on the true value while OLS moves: the estimator's
    whole reason to exist. Build a synthetic hourly series through the
    registered query's internals via a temp view is overkill — exercise
    the math shape directly with the same percentile-of-pair-slopes
    formulation."""
    pts = [(float(i), 2.0 * i + 1.0) for i in range(50)]
    pts[25] = (25.0, 1e6)  # one corrupted hour
    df = spark.createDataFrame(pts, ["x", "y"])
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
        ).alias("s")
    )
    ts = slopes.agg(F.percentile("s", 0.5)).collect()[0][0]
    assert abs(ts - 2.0) < 1e-6
    # OLS on the same data is pulled far off the true slope
    n = 50
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    ols = (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) ** 2)
    assert abs(ols - 2.0) > 10


def test_changepoint_split_is_optimal(spark, sf_dir):
    """The O(T) prefix-sum argmin must equal the brute-force best split:
    recompute SSE for every candidate split of every type's hourly
    series in Python and compare."""
    best = {
        r.event_type: (r.split_end_hr, round(r.sse_best, 4))
        for r in q.QUERIES["event_rate_changepoint"](spark, sf_dir).collect()
    }
    ev = (
        __import__(
            "anomaly_detection_in_time_series_data_spark.tables",
            fromlist=["load_table"],
        )
        .load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in ev:
        series.setdefault(r.event_type, []).append((r.hr, r.c))
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, c in pts]

        def sse(xs):
            n = len(xs)
            s1, s2 = sum(xs), sum(x * x for x in xs)
            return s2 - s1 * s1 / n

        cands = [
            (sse(cs[: i + 1]) + sse(cs[i + 1 :]), pts[i][0])
            for i in range(len(cs) - 1)
        ]
        bf = min(cands)
        assert best[et][0] == bf[1]
        assert abs(best[et][1] - round(bf[0], 4)) < 1e-6


def test_salted_query_matches_plain_groupby(spark, sf_dir):
    """salted_hot_key_agg must equal the unsalted groupBy exactly."""
    ev = __import__(
        "anomaly_detection_in_time_series_data_spark.tables",
        fromlist=["load_table"],
    ).load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: (r.n, r.total_milli, r.max_milli, r.min_user)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1000.0).cast("bigint")).alias(
                "total_milli"
            ),
            F.max(F.floor(F.col("value") * 1000.0).cast("bigint")).alias(
                "max_milli"
            ),
            F.min("user_id").alias("min_user"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n, r.total_milli, r.max_milli, r.min_user)
        for r in q.QUERIES["salted_hot_key_agg"](spark, sf_dir).collect()
    }
    assert plain == salted


def test_incremental_dedup_classifies_planted_duplicates(spark, tmp_path):
    """ADVICE r3: the fixture corpus has no duplicate texts, so the
    dup-of-existing and dup-within-batch classes were structurally
    untested. Plant duplicates that straddle the incoming/existing
    doc_id-salt boundary and assert both classes are counted exactly."""
    import hashlib

    def incoming(i: int) -> bool:
        return hashlib.md5(f"inc|{i}".encode()).hexdigest() >= "8"

    ids = list(range(400))
    inc_ids = [i for i in ids if incoming(i)]
    exist_ids = [i for i in ids if not incoming(i)]
    assert len(inc_ids) >= 3 and len(exist_ids) >= 1
    # T1: one existing copy + two incoming copies -> 2 dup_of_existing
    # T2: two incoming copies only -> 1 novel (lowest id) + 1 within-batch
    # T3: one unique incoming -> novel
    t1 = "alpha " * 20
    t2 = "bravo " * 20
    t3 = "charlie " * 20
    rows = [
        (exist_ids[0], t1, "en", "s1", len(t1)),
        (inc_ids[0], t1, "en", "s1", len(t1)),
        (inc_ids[1], t1, "en", "s1", len(t1)),
        (inc_ids[2], t2, "en", "s1", len(t2)),
        (inc_ids[3], t2, "en", "s1", len(t2)),
        (inc_ids[4], t3, "en", "s1", len(t3)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.source: r
        for r in q.QUERIES["incremental_dedup_report"](
            spark, str(tmp_path)
        ).collect()
    }
    r = out["s1"]
    assert r.n_incoming == 5
    assert r.n_dup_of_existing == 2
    assert r.n_dup_within_batch == 1
    assert r.n_novel == 2


def test_information_theory_bounds(spark, sf_dir):
    """MI and association measures must respect their theoretical
    bounds: 0 <= MI <= min(H_type, H_hour); 0 <= V <= 1; Gini in [0, 1);
    Mann-Whitney U in [0, n1*n2] with the tie-corrected z finite."""
    mi = q.QUERIES["event_mutual_information"](spark, sf_dir).collect()[0]
    assert 0.0 <= mi.mi_nats <= min(mi.h_type_nats, mi.h_hour_nats) + 1e-9
    v = q.QUERIES["cramers_v_association"](spark, sf_dir).collect()[0]
    assert 0.0 <= v.cramers_v <= 1.0
    assert v.chi2 >= 0.0
    for r in q.QUERIES["user_activity_gini"](spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0
    for r in q.QUERIES["mann_whitney_drift"](spark, sf_dir).collect():
        assert 0.0 <= r.u_stat <= r.n_base * r.n_cur
        assert abs(r.z) < 1e6


def test_benford_fractions_sum_to_one(spark, sf_dir):
    rows = q.QUERIES["benford_digit_drift"](spark, sf_dir).collect()
    assert len(rows) == 9
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.expected for r in rows) - 1.0) < 1e-3
    assert sum(r.n for r in rows) > 0


def test_trimmed_mean_is_between_bounds(spark, sf_dir):
    """A 5% symmetric trim keeps the estimate inside the untrimmed
    min/max and trims at most ~10% of rows (plus interpolation ties)."""
    for r in q.QUERIES["trimmed_mean_stats"](spark, sf_dir).collect():
        assert r.n_trimmed <= 0.11 * r.n
        # with a bounded-below fixture the trimmed mean is finite and
        # within an order of the plain mean
        assert abs(r.trimmed_mean_milli) <= abs(r.mean_milli) * 10 + 1e6


# ---------------------------------------------------------------------------
# Round-5 wave invariants
# ---------------------------------------------------------------------------


def test_grid_density_planted_blobs(spark):
    """Two dense blobs separated by empty grid cells become two distinct
    clusters; isolated points are noise (-1)."""
    import random

    from anomaly_detection_in_time_series_data_spark.queries import (
        _GRID_CW,
        _GRID_MINPTS,
    )
    from anomaly_detection_in_time_series_data_spark import queries as q

    cw = _GRID_CW / 1_000_000.0  # cell width in float units
    rows = []
    vid = 0
    # blob A centered in cell (4, 4); blob B in cell (40, 40) — far apart.
    for cx, cy in [(4, 4), (40, 40)]:
        for i in range(_GRID_MINPTS + 3):
            rows.append(
                (vid, [cx * cw + cw / 2 + i * 1e-9, cy * cw + cw / 2] + [0.0] * 62)
            )
            vid += 1
    rows.append((vid, [100 * cw, 100 * cw] + [0.0] * 62))  # isolated noise
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r.vec_id: r.cluster_id for r in
               q.QUERIES["grid_density_clusters"](spark, d).collect()}
    a = {out[i] for i in range(_GRID_MINPTS + 3)}
    b = {out[i] for i in range(_GRID_MINPTS + 3, 2 * (_GRID_MINPTS + 3))}
    assert len(a) == 1 and len(b) == 1 and a != b  # two distinct clusters
    assert out[vid] == -1  # the isolated point is noise


def test_leakage_safe_folds_planted_dup_same_fold(spark):
    """A planted near-dup pair must land in the SAME fold and the leakage
    audit must stay zero."""
    import os, tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q
    from anomaly_detection_in_time_series_data_spark.operators import dedup

    base = (
        "the quick brown fox jumps over the lazy dog while seventy "
        "three engineers review the training corpus for duplicate text "
        "and measure the exact jaccard similarity of every shingle set "
    ) * 3
    near = base.replace("lazy", "sleepy", 1)
    docs = [(1, base, "en", "web", len(base)), (2, near, "en", "web", len(near))]
    for i in range(3, 30):
        docs.append((i, f"unique document number {i} " * 12, "en", "web", 200))
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        # the pair really is a candidate + verified near-dup
        pairs = dedup.lsh_candidate_pairs(
            df, num_hashes=32, bands=8, portable=True
        )
        verified = dedup.jaccard_verify_counts(df, pairs, threshold=0.5)
        assert (1, 2) in {(r.id_a, r.id_b) for r in verified.collect()}
        out = q.QUERIES["leakage_safe_folds"](spark, d).collect()
    assert sum(r.n_docs for r in out) == 29
    assert all(r.leaked_pairs == 0 for r in out)
    # 29 docs but 28 groups: the dup pair shares one canonical
    assert sum(r.n_groups for r in out) == 28


def test_markov_stationary_mass_conserved_approximately(spark, sf_dir):
    """Truncating integer division can only LOSE micro-mass, never create
    it; three iterations on a 5-type chain stay within 5*3 micros of 1e6."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = q.QUERIES["markov_stationary_micro"](spark, sf_dir).collect()
    total = sum(r.stationary_micro for r in rows)
    assert 1_000_000 - 5 * 3 * 5 <= total <= 1_000_000
    emp = sum(r.empirical_micro for r in rows)
    assert 1_000_000 - 5 <= emp <= 1_000_000


def test_stl_residual_reconstructs_series(spark, sf_dir):
    """trend + seasonal + resid must reconstruct n exactly (up to the 4dp
    output rounding) on every emitted day."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    for r in q.QUERIES["stl_lite_decomposition"](spark, sf_dir).collect():
        assert abs((r.trend + r.seasonal + r.resid) - r.n) < 2e-4, r


# ---------------------------------------------------------------------------
# Round-5 second-wave invariants (skyline / interval union / linkage /
# hotspot / Welch)
# ---------------------------------------------------------------------------


def _write_tables(spark, d, **tables):
    import os

    for name, (rows, cols) in tables.items():
        spark.createDataFrame(rows, cols).write.parquet(
            os.path.join(d, f"{name}.parquet")
        )


def test_skyline_pareto_planted(spark):
    """Hand-checkable frontier: same-price smaller size is dominated,
    equal (price, size) duplicates both survive, strictly dominated
    points drop."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    parts = [
        # (partkey, name, brand, type, size, retailprice)
        (1, "n1", "b", "t", 5, 10.0),   # dominated: part 2 same price, larger
        (2, "n2", "b", "t", 7, 10.0),   # frontier
        (3, "n3", "b", "t", 9, 12.0),   # frontier (dup with 4 — both stay)
        (4, "n4", "b", "t", 9, 12.0),   # frontier
        (5, "n5", "b", "t", 6, 11.0),   # dominated by 2 (cheaper, larger)
        (6, "n6", "b", "t", 8, 13.0),   # dominated by 3 (cheaper, larger)
    ]
    cols = ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, part=(parts, cols))
        out = q.QUERIES["skyline_parts_pareto"](spark, d).collect()
    assert {r.p_partkey for r in out} == {2, 3, 4}


def test_interval_union_merges_overlap_and_touch(spark):
    """Overlapping and exactly-touching intervals merge into one island;
    a gapped interval starts a new one; coverage is the union length."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    # value*60 = duration seconds: [0,600], [300,900] overlap,
    # [900,1200] touches (merges), [2000,2060] gapped.
    ev = [
        (1, t0, 7, "a", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=300), 7, "a", 10.0, "{}"),
        (3, t0 + dt.timedelta(seconds=900), 7, "a", 5.0, "{}"),
        (4, t0 + dt.timedelta(seconds=2000), 7, "a", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = q.QUERIES["interval_union_coverage"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 4
    assert r.n_islands == 2
    assert r.covered_us == (1200 + 60) * 1_000_000
    assert r.longest_us == 1200 * 1_000_000


def test_fuzzy_name_linkage_planted_digits(spark):
    """Names differing at exactly one digit pair up at that position and
    verify at Levenshtein distance 1; 2-digit differences never pair."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    names = [
        "Customer#000000001",  # pairs: with 002 (pos 9), 011 (pos 8), 101 (pos 7)
        "Customer#000000002",
        "Customer#000000011",
        "Customer#000000101",
        "Customer#000001999",  # no distance-1 partner
    ]
    cust = [(i, n, 0, 0.0, "SEG") for i, n in enumerate(names)]
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, customer=(cust, cols))
        out = {
            r.digit_pos: (r.n_pairs, r.n_lev1)
            for r in q.QUERIES["fuzzy_name_linkage"](spark, d).collect()
        }
    assert out == {7: (1, 1), 8: (1, 1), 9: (1, 1)}


def test_grid_hotspot_planted_cluster(spark):
    """A 20-point cell among singleton far-apart cells is hot; the
    singletons are not (exact integer cross-multiplied decision)."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = []
    vid = 0
    for _ in range(20):  # dense cell (0, 0): coords in [0, 0.05)
        rows.append((vid, [0.01, 0.01] + [0.0] * 62, 0))
        vid += 1
    for i in range(1, 31):  # 30 singletons, >= 2 cells apart pairwise
        rows.append((vid, [i * 0.15 + 0.01, i * 0.15 + 0.01] + [0.0] * 62, 0))
        vid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_tables(
            spark, d, embeddings=(rows, ["vec_id", "embedding", "label"])
        )
        out = {
            (r.cx, r.cy): (r.n, r.nbr_sum, r.nbr_cells, r.is_hot)
            for r in q.QUERIES["grid_hotspot_stencil"](spark, d).collect()
        }
    assert len(out) == 31
    n, nbr_sum, nbr_cells, is_hot = out[(0, 0)]
    assert (n, nbr_sum, nbr_cells) == (20, 20, 1) and is_hot
    assert all(not v[3] for k, v in out.items() if k != (0, 0))


def test_welch_t_flags_planted_mean_shift(spark):
    """A type whose mean doubles between halves drifts; a stationary type
    does not."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    for i in range(100):
        late = i >= 50
        ts = t0 + dt.timedelta(hours=i)
        ev.append((eid, ts, 1, "shifted", (200.0 if late else 100.0) + i % 5, "{}"))
        eid += 1
        ev.append((eid, ts, 2, "stable", 100.0 + i % 7, "{}"))
        eid += 1
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = {r.event_type: r for r in q.QUERIES["welch_t_drift"](spark, d).collect()}
    assert out["shifted"].drifted
    assert not out["stable"].drifted
    assert out["shifted"].n1 == out["shifted"].n2 == 50
    assert abs(out["shifted"].mean_shift - (-100.0)) < 0.01


def test_bitmap_overlap_exact_sets(spark):
    """Known user sets (incl. a 62-boundary user exercising bucket 1)
    produce exact distinct counts and intersections."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    for u in (1, 2, 62):  # type A; 62 lands in bucket 1, bit 0
        for _ in range(2):  # duplicates must not inflate (bit_or idempotent)
            ev.append((eid, t0, u, "A", 1.0, "{}"))
            eid += 1
    for u in (2, 62, 200):  # type B; shared = {2, 62}
        ev.append((eid, t0, u, "B", 1.0, "{}"))
        eid += 1
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = q.QUERIES["bitmap_segment_overlap"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.e_a, r.e_b) == ("A", "B")
    assert (r.users_a, r.users_b, r.shared_users) == (3, 3, 2)
    assert r.jaccard == 0.5  # 2 / (3 + 3 - 2)


def test_inverted_posting_lists_planted(spark):
    """Postings are sorted, deduped per doc, and df-ranked."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    docs = [
        (3, "beta alpha", "en", "web", 10),
        (1, "alpha beta beta", "en", "web", 15),  # beta twice: df counts once
        (2, "beta gamma", "en", "web", 10),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, documents=(docs, cols))
        out = {r.term: r for r in q.QUERIES["inverted_posting_lists"](spark, d).collect()}
    assert out["beta"].df == 3 and out["beta"].postings == "1,2,3"
    assert out["alpha"].df == 2 and out["alpha"].postings == "1,3"
    assert out["gamma"].df == 1 and out["gamma"].postings == "2"
    assert out["beta"].span == 2


def test_linear_interp_straight_line(spark):
    """A two-hour gap between observations 1.0 and 4.0 interpolates to
    exactly 2.0 and 3.0; observed hours pass through unchanged."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=3), 1, "a", 4.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = sorted(
            q.QUERIES["linear_interp_gap_fill"](spark, d).collect(),
            key=lambda r: r.hr,
        )
    assert [r.v_filled for r in out] == [1.0, 2.0, 3.0, 4.0]
    assert [r.interpolated for r in out] == [False, True, True, False]


def test_prefix_filter_finds_exact_jaccard_pairs(spark):
    """The prefix filter must find EVERY pair with shingle-Jaccard >= 0.6
    (zero false negatives) and nothing below — checked against an
    in-test brute force."""
    import itertools
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 2
    texts = {
        1: base,
        2: base.replace("sigma", "SIGMA2"),      # near-dup of 1
        3: base.replace("alpha", "A3").replace("pi", "P3"),  # near-dup
        4: "totally different words " * 10,
        5: "another unrelated document entirely " * 8,
    }

    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    expect = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.6:
            expect.add((a, b))
    assert expect  # the fixture really contains qualifying pairs

    docs = [(i, t, "en", "web", len(t)) for i, t in texts.items()]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, documents=(docs, cols))
        got = {
            (r.id_a, r.id_b)
            for r in q.QUERIES["prefix_filter_jaccard_join"](spark, d).collect()
        }
    assert got == expect


def test_golden_record_survivorship_rules(spark):
    """A planted 3-doc near-dup cluster merges with field-level rules:
    longest text wins the content field (tiebreak lowest doc_id), modal
    source wins provenance (tiebreak source asc)."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    base = (
        "the quick brown fox jumps over the lazy dog while seventy "
        "three engineers review the training corpus for duplicate text "
        "and measure the exact jaccard similarity of every shingle set "
    ) * 3
    longer = base + "with one extra trailing sentence appended here "
    near = base.replace("lazy", "sleepy", 1)
    docs = [
        (1, base, "en", "web", len(base)),
        (2, longer, "en", "crawl", len(longer)),  # longest -> golden
        (3, near, "en", "web", len(near)),        # web is modal (2 of 3)
    ]
    for i in range(4, 30):
        docs.append((i, f"unique document number {i} " * 12, "en", "web", 200))
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, documents=(docs, cols))
        out = q.QUERIES["golden_record_survivorship"](spark, d).collect()
    clusters = {r.cluster_id: r for r in out}
    assert 1 in clusters  # min-id canonical of the planted trio
    r = clusters[1]
    assert r.n_members == 3
    assert r.golden_doc_id == 2          # longest text wins
    assert r.golden_n_chars == len(longer)
    assert r.modal_source == "web"       # 2 of 3 members
    assert r.total_chars == len(base) + len(longer) + len(near)


def test_event_lateness_audit_planted(spark):
    """Arrival order (event_id) vs event time: one 15-minute-late and one
    5-minute-late event are counted correctly against the running
    high-water mark."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "a", 1.0, "{}"),
        # arrives after the hwm=30m event, 15 min behind it
        (3, t0 + dt.timedelta(minutes=15), 1, "a", 1.0, "{}"),
        # 5 min behind the (unchanged) hwm
        (4, t0 + dt.timedelta(minutes=25), 1, "a", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=40), 1, "a", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = q.QUERIES["event_lateness_audit"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 5
    assert r.n_late == 2
    assert r.n_beyond_10m == 1  # only the 15-minute-late event
    assert r.max_late_us == 15 * 60 * 1_000_000
    assert r.total_late_us == 20 * 60 * 1_000_000


def test_kcore_peels_pendant_chain(spark):
    """A triangle (2-core) survives peeling; a pendant chain hanging off
    it peels away round by round."""
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    base = (
        "the quick brown fox jumps over the lazy dog while seventy "
        "three engineers review the training corpus for duplicate text "
    ) * 4
    # triangle: 1-2-3 mutually near-dup; pendant chain: 4 similar to 3 only
    docs = [
        (1, base, "en", "web", len(base)),
        (2, base.replace("lazy", "sleepy", 1), "en", "web", 1),
        (3, base.replace("quick", "rapid", 1), "en", "web", 1),
    ]
    for i in range(5, 40):
        docs.append((i, f"unique filler document number {i} " * 10, "en", "web", 1))
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, documents=(docs, cols))
        out = {r.doc_id: r.core_degree for r in
               q.QUERIES["kcore_micro_peel"](spark, d).collect()}
    assert set(out) == {1, 2, 3}       # the triangle is the 2-core
    assert all(v == 2 for v in out.values())


def test_rolling_wau_window_semantics(spark):
    """WAU at day d counts distinct users over days [d-6, d] exactly,
    including users whose bucket has no row on day d."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    # day 0: users 1, 2; day 3: user 62 (bucket 1); day 8: user 1 again.
    for day, users in ((0, (1, 2)), (3, (62,)), (8, (1,))):
        for u in users:
            ev.append((eid, t0 + dt.timedelta(days=day), u, "a", 1.0, "{}"))
            eid += 1
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        day0 = int(t0.timestamp()) * 1_000_000
        out = {
            (r.day_us - day0) // 86_400_000_000: (r.dau, r.wau)
            for r in q.QUERIES["rolling_wau_bitmap"](spark, d).collect()
        }
    assert out[0] == (2, 2)
    assert out[3] == (1, 3)   # users 1, 2 (day 0) still in window + user 62
    # day 8: day 0 fell out of [2, 8]; user 62 (day 3) still in; user 1 back
    assert out[8] == (1, 2)


def test_cuped_removes_covariate_variance(spark, sf_dir):
    """CUPED invariants on the fixture: rho2 in [0, 1]; arm counts
    partition the users; adjusted means shift by theta*(arm pre-mean
    delta) — both arms move in opposite directions around mean_y."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    out = {r.arm: r for r in q.QUERIES["cuped_adjusted_ab"](spark, sf_dir).collect()}
    assert set(out) == {"A", "B"}
    r = out["A"]
    assert 0.0 <= r.var_reduction <= 1.0
    for arm in out.values():
        # the adjustment is a finite translation, not a blow-up
        assert abs(arm.mean_y_cuped - arm.mean_y) < abs(arm.mean_y) + 1e6


def test_quantile_normalize_rank_preservation(spark, sf_dir):
    """Per type: 20 bins, counts sum to the type's row count, and the
    reference bin means are monotone nondecreasing in q (rank order is
    preserved by construction)."""
    from anomaly_detection_in_time_series_data_spark import queries as q
    from anomaly_detection_in_time_series_data_spark.tables import load_table

    rows = q.QUERIES["quantile_normalize_sources"](spark, sf_dir).collect()
    per_type = {}
    ref = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
        ref[r.q] = r.ref_mean
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    for t, rs in per_type.items():
        assert len(rs) == 20, t
        means = [r.bin_mean for r in sorted(rs, key=lambda r: r.q)]
        assert means == sorted(means), t  # per-type bin means monotone
    rvals = [ref[q] for q in sorted(ref)]
    assert rvals == sorted(rvals)  # pooled reference monotone too


def test_asof_nearest_picks_closer_side(spark):
    """An event between two orders matches the closer one; exact ties go
    backward; one-sided cases fall back to the available side."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 10)
    orders = [
        (100, 7, "O", 10.0, t0, "1-URGENT"),
        (200, 7, "O", 10.0, t0 + dt.timedelta(days=10), "1-URGENT"),
    ]
    ocols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"]
    ev = [
        # 3 days after first order, 7 before second -> backward (100)
        (1, t0 + dt.timedelta(days=3), 7, "a", 1.0, "{}"),
        # 7 after / 3 before -> forward (200)
        (2, t0 + dt.timedelta(days=7), 7, "a", 1.0, "{}"),
        # exact midpoint (5/5) -> tie goes backward (100)
        (3, t0 + dt.timedelta(days=5), 7, "a", 1.0, "{}"),
        # before the first order -> forward only (200... nearest is 100 fwd)
        (4, t0 - dt.timedelta(days=2), 7, "a", 1.0, "{}"),
        # user with no orders -> null
        (5, t0, 8, "a", 1.0, "{}"),
    ]
    ecols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, ecols), orders=(orders, ocols))
        out = {r.event_id: (r.nearest_orderkey, r.gap_us)
               for r in q.QUERIES["asof_join_nearest_order"](spark, d).collect()}
    day = 86_400_000_000
    assert out[1] == (100, 3 * day)
    assert out[2] == (200, 3 * day)
    assert out[3] == (100, 5 * day)   # tie -> backward
    assert out[4] == (100, 2 * day)   # only a forward match exists
    assert out[5] == (None, None)


def test_mmr_prefers_diverse_over_redundant(spark, sf_dir):
    """MMR output: 5 distinct ranks and vec_ids; the rank-1 pick is the
    plain top-1 by relevance; later picks may deviate from the pure
    relevance order (that is the point), but every pick comes from the
    top-20 candidate pool."""
    from anomaly_detection_in_time_series_data_spark import queries as q
    from anomaly_detection_in_time_series_data_spark.tables import load_table
    from anomaly_detection_in_time_series_data_spark.operators import similarity

    out = sorted(
        q.QUERIES["mmr_diversified_topk"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in out}) == 5
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter("vec_id = 0")
    top = similarity.cosine_topk(emb, probe, k=20).collect()
    by_rel = sorted(top, key=lambda r: (-r.cosine_sim, r.neighbor_id))
    assert out[0].vec_id == by_rel[0].neighbor_id  # first pick = top-1
    pool = {r.neighbor_id for r in top}
    assert all(r.vec_id in pool for r in out)


def test_metric_attribution_shares_sum_to_one(spark, sf_dir):
    """Segment shares of the total change must sum to exactly 1 and the
    pre/post totals reconcile per segment."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = q.QUERIES["metric_change_attribution"](spark, sf_dir).collect()
    assert abs(sum(r.share_of_change for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.delta_milli == r.post_milli - r.pre_milli


def test_growth_accounting_identities(spark, sf_dir):
    """Per day: active = new + retained + resurrected; day-over-day
    active deltas reconcile as new + resurrected - churned; day one is
    all-new."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = sorted(
        q.QUERIES["growth_accounting_daily"](spark, sf_dir).collect(),
        key=lambda r: r.day_us,
    )
    assert rows[0].n_new == rows[0].n_active  # first day: everyone is new
    prev = None
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected, r
        if prev is not None and r.day_us - prev.day_us == 86_400_000_000:
            assert (
                r.n_active - prev.n_active
                == r.n_new + r.n_resurrected - r.n_churned
            ), r
        prev = r


def test_oof_encoding_excludes_own_fold(spark, sf_dir):
    """Out-of-fold means must differ from the whole-category mean
    wherever the fold is a strict subset, and reconstruct it exactly:
    sv_cat = oof_mean*(n_cat-n_fold)*1000 + sv_fold for every row."""
    from collections import defaultdict

    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = q.QUERIES["oof_target_encoding"](spark, sf_dir).collect()
    by_cat = defaultdict(list)
    for r in rows:
        by_cat[(r.event_type, r.hod)].append(r)
    assert by_cat
    for cat, rs in by_cat.items():
        n_cat = sum(r.n_fold for r in rs)
        for r in rs:
            if r.oof_mean is None:
                assert n_cat == r.n_fold  # single-fold category
            else:
                assert n_cat > r.n_fold


def test_ndcg_mrr_ranges_and_consistency(spark, sf_dir):
    """NDCG and MRR in [0, 1]; zero-hit probes score exactly 0; a probe
    whose hits fill a prefix of the list has NDCG exactly 1."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = q.QUERIES["retrieval_ndcg_mrr"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.ndcg5 <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        if r.n_rel == 0:
            assert r.ndcg5 == 0.0 and r.mrr == 0.0
        else:
            assert r.ndcg5 > 0.0 and r.mrr > 0.0
        if r.mrr == 1.0 and r.n_rel == 5:
            assert r.ndcg5 == 1.0


def test_multitouch_decay_weights(spark):
    """Planted journey: touches at 6h, 18h and 30h before the purchase
    earn exact halving weights 1e6, 5e5, 25e4; credits normalize to 1
    per purchase; a touch outside 72h earns nothing."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 10)
    ev = [
        (1, t0 - dt.timedelta(hours=6), 7, "view", 1.0, "{}"),
        (2, t0 - dt.timedelta(hours=18), 7, "click", 1.0, "{}"),
        (3, t0 - dt.timedelta(hours=30), 7, "signup", 1.0, "{}"),
        (4, t0 - dt.timedelta(hours=100), 7, "view", 1.0, "{}"),  # too old
        (5, t0, 7, "purchase", 50.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = {r.channel: r for r in
               q.QUERIES["multitouch_attribution"](spark, d).collect()}
    assert set(out) == {"view", "click", "signup"}
    assert out["view"].total_weight_micro == 1_000_000   # age 0 (6h < 12h)
    assert out["click"].total_weight_micro == 500_000    # age 1
    assert out["signup"].total_weight_micro == 250_000   # age 2
    total = 1_000_000 + 500_000 + 250_000
    assert abs(out["view"].credit - 1_000_000 / total) < 1e-12
    assert abs(sum(r.credit for r in out.values()) - 1.0) < 1e-12


def test_kappa_bounds_and_confusion_totals(spark, sf_dir):
    """Kappa <= p_agree identity-side checks: confusion counts sum to n,
    kappa in [-1, 1] when defined, and perfect agreement gives kappa 1."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    rows = q.QUERIES["detector_agreement_kappa"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
        assert 0.0 <= r.p_agree <= 1.0
        if r.kappa is not None:
            assert -1.0 <= r.kappa <= 1.0
            if r.p_agree == 1.0:
                assert r.kappa == 1.0


def test_peak_concurrency_planted_overlap(spark):
    """Three overlapping intervals peak at 3; a touching interval (starts
    exactly when another ends, exclusive end) does NOT raise the peak."""
    import datetime as dt
    import tempfile

    from anomaly_detection_in_time_series_data_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        # [0, 600), [60, 660), [120, 720): all three open during [120, 600)
        (1, t0, 1, "a", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=60), 1, "a", 10.0, "{}"),
        (3, t0 + dt.timedelta(seconds=120), 1, "a", 10.0, "{}"),
        # starts exactly at 600 (the first ends there) -> still peak 3
        (4, t0 + dt.timedelta(seconds=600), 1, "a", 10.0, "{}"),
        (5, t0, 1, "b", 0.0, "{}"),  # zero-length claim: occupies nothing
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    with tempfile.TemporaryDirectory() as d:
        _write_tables(spark, d, events=(ev, cols))
        out = {r.event_type: r for r in
               q.QUERIES["peak_concurrency"](spark, d).collect()}
    assert "b" not in out  # zero-length intervals drop entirely
    r = out["a"]
    assert r.peak == 3
    assert r.n_intervals == 4
    import calendar
    t0_us = calendar.timegm(t0.timetuple()) * 1_000_000
    assert r.first_peak_us == t0_us + 120 * 1_000_000


def test_recs_coverage_bounds(spark, sf_dir):
    """Coverage in (0, 1]; recommended items <= catalog; total recs =
    probes x k; Gini in [0, 1)."""
    from anomaly_detection_in_time_series_data_spark import queries as q

    r = q.QUERIES["recs_coverage_popularity"](spark, sf_dir).collect()[0]
    assert r.n_recs == 50 * 5
    assert 0 < r.n_recommended_items <= r.catalog_size
    assert 0.0 < r.coverage <= 1.0
    assert 0.0 <= r.gini < 1.0
