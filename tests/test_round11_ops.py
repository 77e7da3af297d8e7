"""Round-11 operator tests: identity and independent-replica checks for
the rank-test family (oracle parity alone can be same-bug vacuous — these
pin the MATH against numpy/Fraction computations and cross-query
consistency)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from anomaly_detection_in_time_series_data_spark import queries as q

SF = "/root/testdata/sf0.001"


def _events_cents() -> pd.DataFrame:
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = t.to_pandas()
    # the house money rule: decimal(18,2) * 100 -> bigint cents
    df["cents"] = (
        df["value"].map(lambda v: int(round(float(v) * 100)))
    ).astype("int64")
    return df[["event_type", "cents"]]


def test_kruskal_wallis_identity_and_numpy_replica(spark):
    rows = {
        r.event_type: r
        for r in q.QUERIES["kruskal_wallis_value_ranks"](spark, SF).collect()
    }
    n_total = next(iter(rows.values())).n_total
    # identity: doubled tie-averaged ranks over 1..N sum to N(N+1)
    assert sum(r.r2_sum for r in rows.values()) == n_total * (n_total + 1)
    assert sum(r.n_i for r in rows.values()) == n_total

    # independent numpy replica: scipy-style average ranks via argsort
    df = _events_cents()
    vals = df["cents"].to_numpy()
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype="float64")
    sv = vals[order]
    i = 0
    pos = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
        pos += j - i
        i = j
    df["r2"] = (2 * ranks).astype("int64")  # doubled avg rank is integer
    rep = df.groupby("event_type")["r2"].sum()
    for et, r in rows.items():
        assert r.r2_sum == int(rep[et]), et
    # tie sum replica
    _, counts = np.unique(vals, return_counts=True)
    tie = int((counts.astype("int64") ** 3 - counts).sum())
    assert next(iter(rows.values())).tie_sum == tie


def test_friedman_identity(spark):
    rows = q.QUERIES["friedman_type_rank_blocks"](spark, SF).collect()
    assert rows, "friedman emitted no rows"
    k = rows[0].k_treatments
    n_blocks = rows[0].n_blocks
    assert all(r.n_blocks == n_blocks and r.k_treatments == k for r in rows)
    assert len(rows) == k
    # within each block sum(2r) over treatments = k(k+1)
    assert sum(r.r2_sum for r in rows) == n_blocks * k * (k + 1)


def test_cochran_q_numpy_replica(spark):
    rows = {
        r.event_type: r
        for r in q.QUERIES["cochran_q_detectors"](spark, SF).collect()
    }
    df = _events_cents()
    n_all = len(df)
    s_all = int(df["cents"].sum())
    g = df.groupby("event_type")["cents"].agg(["count", "sum"])
    for et, r in rows.items():
        sub = df[df["event_type"] == et]["cents"].to_numpy().astype("int64")
        la = (sub > 15000).astype("int64")
        lb = (sub * int(g.loc[et, "count"]) > int(g.loc[et, "sum"])).astype(
            "int64"
        )
        lc = (sub * n_all > s_all).astype("int64")
        L = la + lb + lc
        ga, gb, gc = int(la.sum()), int(lb.sum()), int(lc.sum())
        assert (r.g_a, r.g_b, r.g_c) == (ga, gb, gc), et
        assert r.sum_l == int(L.sum()) and r.sum_l_sq == int((L * L).sum())
        assert r.q_num == 2 * (
            3 * (ga * ga + gb * gb + gc * gc) - (ga + gb + gc) ** 2
        )
        assert r.q_den == 3 * int(L.sum()) - int((L * L).sum())
        assert r.q_num >= 0 and r.q_den >= 0  # Cauchy-Schwarz / L<=3


def test_somers_d_consistent_with_gamma(spark):
    """Somers' D and Goodman-Kruskal gamma run the same contingency grid:
    their concordant/discordant counts must be identical, and D's
    denominator must exceed gamma's by exactly the tied-Y-only pairs."""
    d = q.QUERIES["somers_d_priority_band"](spark, SF).collect()[0]
    gm = q.QUERIES["goodman_kruskal_gamma_ordinal"](spark, SF).collect()[0]
    assert (d.concordant, d.discordant) == (gm.concordant, gm.discordant)
    assert d.d_num == gm.gamma_num
    assert d.d_den == gm.gamma_den + d.tied_y_only
    assert d.tied_x_only >= 0 and d.tied_y_only >= 0


def test_cross_modal_join_totals(spark):
    """Bucket totals must partition the joined corpus: every document
    whose shard key hits an image id is counted exactly once, and the
    media count partitions the 16 image rows."""
    rows = q.QUERIES["cross_modal_brightness_text"](spark, SF).collect()
    assert sum(r.n_media for r in rows) == 16
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).to_pandas()
    image_ids = {i for i in range(48) if i % 3 == 0}
    expect_docs = int((docs["doc_id"] % 48).isin(image_ids).sum())
    assert sum(r.n_docs for r in rows) == expect_docs


def test_brown_forsythe_numpy_replica(spark):
    rows = {
        r.event_type: r
        for r in q.QUERIES["brown_forsythe_components"](spark, SF).collect()
    }
    df = _events_cents()
    for et, r in rows.items():
        v = np.sort(df[df["event_type"] == et]["cents"].to_numpy())
        n = len(v)
        med2 = int(v[(n - 1) // 2]) + int(v[n // 2])  # doubled avg median
        dev2 = np.abs(2 * v - med2)
        assert r.n_i == n and r.med2 == med2, et
        assert r.dev2_sum == int(dev2.sum())
        assert r.dev2_sq_sum == int((dev2 * dev2).sum())


def test_jonckheere_numpy_bruteforce(spark):
    rows = q.QUERIES["jonckheere_ordered_trend"](spark, SF).collect()
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    t["grp"] = t["o_orderpriority"].str[0].astype("int64")
    t["c"] = t["o_totalprice"].map(
        lambda v: int(round(float(v) * 100))
    ).astype("int64")
    groups = {g: s["c"].to_numpy() for g, s in t.groupby("grp")}
    assert len(rows) == len(groups) * (len(groups) - 1) // 2
    for r in rows:
        lo, hi = groups[r.grp_low], groups[r.grp_high]
        assert (r.n_low, r.n_high) == (len(lo), len(hi))
        below = (lo[:, None] < hi[None, :]).sum()
        ties = (lo[:, None] == hi[None, :]).sum()
        assert r.u2 == 2 * int(below) + int(ties), (r.grp_low, r.grp_high)


def test_wilcoxon_signed_rank_identity_and_replica(spark):
    rows = q.QUERIES["wilcoxon_signed_rank_pairs"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) ordered type pairs
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    df = t.to_pandas()
    df["d"] = (
        df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    )
    daily = df.groupby(["event_type", "d"]).size()
    for r in rows:
        # identity: doubled signed ranks partition n(n+1)
        n = r.n_nonzero
        assert r.w2_plus + r.w2_minus == n * (n + 1), (r.type_a, r.type_b)
        # numpy replica of W+ with tie-averaged ranks
        a = daily[r.type_a]
        b = daily[r.type_b]
        common = a.index.intersection(b.index)
        diff = (a[common] - b[common]).to_numpy()
        diff = diff[diff != 0]
        assert len(diff) == n
        ad = np.abs(diff)
        order = np.argsort(ad, kind="stable")
        r2 = np.empty(len(ad), dtype="int64")
        sv = ad[order]
        i, pos = 0, 1
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r2[order[i:j]] = 2 * pos + (j - i) - 1  # 2*avg of pos..pos+t-1
            pos += j - i
            i = j
        assert r.w2_plus == int(r2[diff > 0].sum())
        assert r.w2_minus == int(r2[diff < 0].sum())


def test_unseen_bigram_mass_numpy_replica(spark):
    from collections import Counter

    rows = {
        r.source: r
        for r in q.QUERIES["unseen_bigram_mass_estimates"](spark, SF).collect()
    }
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    by_src: dict = {}
    for src, text in zip(docs["source"], docs["text"]):
        t = (text or "").strip()
        if not t:
            continue
        toks = t.split(" ")
        c = by_src.setdefault(src, Counter())
        for a, b in zip(toks, toks[1:]):
            c[a + " " + b] += 1
    assert set(rows) == set(by_src)
    for src, c in by_src.items():
        r = rows[src]
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        assert (r.n_bigrams, r.distinct_bigrams) == (sum(c.values()), len(c))
        assert (r.f1, r.f2) == (f1, f2), src
        assert r.chao1_num == 2 * (f2 + 1) * len(c) + f1 * (f1 - 1)
        assert r.chao1_den == 2 * (f2 + 1)
        # richness floor never below observed distinct
        assert r.chao1_num >= r.chao1_den * r.distinct_bigrams


def test_gamma_grid_fold_matches_bruteforce(spark):
    """goodman_kruskal_gamma_ordinal's grid x grid fold (and therefore
    Somers' D's shared counts) against a direct O(n^2) pair count over
    the raw orders — the replica the round-10 query never had."""
    gm = q.QUERIES["goodman_kruskal_gamma_ordinal"](spark, SF).collect()[0]
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    pri = t["o_orderpriority"].str[0].astype("int64").to_numpy()
    band = (
        t["o_totalprice"]
        .map(lambda v: int(round(float(v) * 100)) // 5_000_000)
        .astype("int64")
        .to_numpy()
    )
    dp = np.sign(pri[:, None] - pri[None, :])
    db = np.sign(band[:, None] - band[None, :])
    conc = int(((dp * db) > 0).sum()) // 2  # unordered pairs
    disc = int(((dp * db) < 0).sum()) // 2
    assert (gm.concordant, gm.discordant) == (conc, disc)
    assert gm.gamma_num == conc - disc and gm.gamma_den == conc + disc
