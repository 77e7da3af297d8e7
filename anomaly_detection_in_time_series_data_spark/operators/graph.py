"""Graph analytics over pairwise-similarity edges.

Complements the dedup pipeline's connected components
(`dedup.connected_components`): triangle counts and clustering
coefficients are the standard local-density diagnostics for a near-dup
graph — a high-triangle neighborhood is a true duplicate cluster, a
low-triangle high-degree node is usually a templated/boilerplate hub
that chains unrelated docs into one giant component.

Triangle counting uses degree orientation (the classic distributed
formulation): orient every undirected edge from the endpoint with the
smaller (degree, id) to the larger. Every triangle then has exactly one
"apex" node with two outgoing oriented edges, so counting (wedge ⋈
closing-edge) finds each triangle exactly once, and a node's out-degree
is bounded by O(sqrt(|E|)) on any graph — the wedge join never explodes
on skewed (hub) nodes the way a naive neighbor self-join does. Shuffles:
two broadcast-joins against the (small) degree table + one equi-join of
wedges against oriented edges.

No analogue in the reference repo (it has no graph surface at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """(node, degree) from an undirected edge list with one row per edge."""
    und = edges.select(F.col(a).alias("node")).unionAll(
        edges.select(F.col(b).alias("node"))
    )
    return und.groupBy("node").agg(F.count("*").alias("degree"))


def orient_by_degree(
    edges: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """Orient each undirected edge low->(degree, id) high. Returns (u, v)."""
    deg = degrees(edges, a, b)
    e = (
        edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .join(F.broadcast(deg.selectExpr("node AS x", "degree AS dx")), "x")
        .join(F.broadcast(deg.selectExpr("node AS y", "degree AS dy")), "y")
    )
    fwd = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    return e.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("v"),
    )


def node_triangle_counts(
    edges: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """Per-node triangle participation counts: (node, degree, n_triangles,
    clustering) where clustering = 2T / (d(d-1)) for d >= 2.

    Wedge generation self-joins oriented edges on the apex; the closing
    check is an equi-join against the oriented edge set (orientation makes
    the closing edge's direction deterministic: both wedge tips are
    (degree, id)-greater than the apex, so the closing edge runs from the
    smaller tip to the larger)."""
    o = orient_by_degree(edges, a, b).cache()
    w1 = o.selectExpr("u AS apex", "v AS t1")
    w2 = o.selectExpr("u AS apex", "v AS t2")
    wedges = w1.join(w2, "apex").filter(F.col("t1") < F.col("t2"))
    # closing edge: oriented (t1, t2) or (t2, t1) — orientation sorts by
    # (degree, id), not id, so check the undirected pair via a canonical key.
    closing = o.select(
        F.least("u", "v").alias("t1"), F.greatest("u", "v").alias("t2")
    )
    tris = wedges.join(closing, ["t1", "t2"]).select(
        F.col("apex").alias("n1"), F.col("t1").alias("n2"), F.col("t2").alias("n3")
    )
    per_node = (
        tris.selectExpr("n1 AS node")
        .unionAll(tris.selectExpr("n2 AS node"))
        .unionAll(tris.selectExpr("n3 AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = degrees(edges, a, b)
    d = F.col("degree").cast("double")
    return (
        deg.join(per_node, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)))
        .withColumn(
            "clustering",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("n_triangles").cast("double") / (d * (d - 1.0)),
            ).otherwise(F.lit(0.0)),
        )
    )


def pagerank_sorted_fold(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected edge list — the canonical ITERATIVE
    join-aggregate pattern on Spark (each iteration: contribution join +
    per-node reduce; Catalyst/AQE replan each round, the rank frame stays
    partitioned by node so only the edge join shuffles).

    Determinism discipline: a node's incoming contributions are summed as
    an explicit LEFT FOLD over the source-sorted contribution list
    (``aggregate`` over ``sort_array(collect_list(...))``) instead of an
    engine-ordered float sum, so every iteration's doubles are
    bit-identical to a DuckDB twin that folds ``list(... ORDER BY src)``
    with ``list_reduce`` — hash-exact after any number of iterations.
    On an undirected graph every node has out-degree >= 1, so there is no
    dangling-mass term.

    Returns (node, degree, pr). Fixed ``iters`` keeps the oracle an
    unrolled CTE; convergence looping at scale would instead check the
    L1 delta between iterations (same plan per round).
    """
    und = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    # The edge frame is referenced by every iteration (deg + 3 contribution
    # joins): without truncation the upstream edge derivation (e.g. the
    # shingle inverted-index join) re-executes per reference — measured
    # 4.2s -> ~1.6s at sf0.1 with the checkpoint. localCheckpoint is the
    # standard iterative-algorithm move: materialize the loop invariant
    # once and cut the lineage so plans don't grow with iteration count.
    und = und.localCheckpoint(eager=False)
    deg = und.groupBy("src").agg(F.count("*").alias("degree"))
    n = deg.count()  # scalar fetch: node count only
    if n == 0:
        # empty graph (e.g. no near-dup pairs above threshold): return an
        # empty (node, degree, pr) frame instead of dividing by zero
        return deg.select(
            F.col("src").alias("node"),
            "degree",
            F.lit(0.0).alias("pr"),
        )
    pr = deg.select(
        F.col("src").alias("node"), "degree", F.lit(1.0 / n).alias("pr")
    )
    for it in range(iters):
        contrib = und.join(
            pr.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.struct(
                F.col("src"), (F.col("pr") / F.col("degree")).alias("c")
            ).alias("sc"),
        )
        folded = contrib.groupBy("node").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list("sc")), lambda x: x["c"]
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_in")
        )
        pr = folded.join(deg.withColumnRenamed("src", "node"), "node").select(
            "node",
            "degree",
            (F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("_in")).alias(
                "pr"
            ),
        )
        if (it + 1) % 5 == 0:  # bound lineage depth for long runs
            pr = pr.localCheckpoint(eager=False)
    return pr
