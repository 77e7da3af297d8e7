"""Triangle counting / clustering coefficients (operators/graph.py)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark.operators import graph


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "id_a long, id_b long"
    )


def _naive_node_triangles(pairs):
    es = {tuple(sorted(p)) for p in pairs}
    nodes = {n for e in es for n in e}
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return tri


def test_k4_plus_pendant(spark):
    # K4 has 4 triangles, each node in 3; the pendant node is in none.
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    pairs = k4 + [(4, 99)]
    out = {r["node"]: r for r in graph.node_triangle_counts(_edges_df(spark, pairs)).collect()}
    assert {n: out[n]["n_triangles"] for n in out} == {1: 3, 2: 3, 3: 3, 4: 3, 99: 0}
    assert out[1]["clustering"] == 1.0  # K4 interior: fully connected
    assert out[4]["degree"] == 4 and out[4]["clustering"] == 0.5  # 3 of C(4,2)=6
    assert out[99]["clustering"] == 0.0


def test_random_graph_matches_naive(spark):
    rng = random.Random(13)
    nodes = list(range(40))
    pairs = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(160)
    }
    got = {
        r["node"]: r["n_triangles"]
        for r in graph.node_triangle_counts(_edges_df(spark, pairs)).collect()
    }
    assert got == _naive_node_triangles(pairs)


def test_triangle_free_graph(spark):
    # A cycle of length 5 (odd, >3): triangle-free, every degree 2.
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    rows = graph.node_triangle_counts(_edges_df(spark, pairs)).collect()
    assert all(r["n_triangles"] == 0 and r["degree"] == 2 for r in rows)


# ---------------------------------------------------------------------------
# PageRank (sorted-fold iterative pattern)
# ---------------------------------------------------------------------------


def _naive_pagerank(pairs, iters=3, damping=0.85):
    und = {}
    for a, b in pairs:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    n = len(und)
    pr = {v: 1.0 / n for v in und}
    for _ in range(iters):
        nxt = {}
        for v in und:
            # source-sorted left fold, exactly like the operator
            acc = 0.0
            for u in sorted(u for u in und if v in und[u]):
                acc = acc + pr[u] / len(und[u])
            nxt[v] = (1.0 - damping) / n + damping * acc
        pr = nxt
    return pr


def test_pagerank_matches_naive_fold_bitexact(spark):
    # star (hub 0) + a pendant path: asymmetric degrees, so ranks differ
    pairs = [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7)]
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank_sorted_fold(_edges_df(spark, pairs)).collect()
    }
    want = _naive_pagerank(pairs)
    assert set(got) == set(want)
    for v in want:  # bit-exact: identical fold order, identical arithmetic
        assert got[v] == want[v], (v, got[v], want[v])
    # hub outranks leaves
    assert got[0] == max(got.values())


def test_pagerank_mass_and_isolated_pair(spark):
    # two disjoint K2s: symmetric, every node ends at exactly 1/4
    pairs = [(1, 2), (3, 4)]
    rows = graph.pagerank_sorted_fold(_edges_df(spark, pairs)).collect()
    assert len(rows) == 4
    assert all(abs(r["pr"] - 0.25) < 1e-15 for r in rows)


def test_pagerank_empty_edges_returns_empty(spark):
    # ADVICE r3: an empty near-dup graph must yield an empty frame, not
    # ZeroDivisionError from 1/n
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = graph.pagerank_sorted_fold(empty)
    assert out.columns == ["node", "degree", "pr"]
    assert out.count() == 0


def test_pagerank_iters5_checkpoint_branch(spark):
    # exercises the (it+1) % 5 == 0 lineage-bounding localCheckpoint branch
    # (dead at the default iters=3); mass is conserved regardless
    pairs = [(0, i) for i in range(1, 5)] + [(4, 5)]
    rows = graph.pagerank_sorted_fold(_edges_df(spark, pairs), iters=5).collect()
    assert len(rows) == 6
    assert abs(sum(r["pr"] for r in rows) - 1.0) < 1e-9
