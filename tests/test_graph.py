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
