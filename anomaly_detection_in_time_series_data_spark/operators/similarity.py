"""Embedding similarity search (training-data pipeline).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  Probe set broadcast against the corpus; per-row dot product via
  ``F.aggregate``/``zip_with`` (JVM higher-order functions, no UDF);
  top-k per probe via window row_number.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Probes
  only compare against corpus vectors sharing a hash bucket (multi-probe
  over ``num_tables`` independent tables), turning the O(N*M) scan into
  bucket-local joins.

At 100 TB the corpus side stays partitioned; only probes (small) broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    Returns (probe_id, neighbor_id, cosine_sim). Excludes self-matches.
    The probe side is broadcast (it is the small side by construction), so
    the corpus is scanned exactly once with no shuffle before the per-probe
    top-k window.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("_pvec"),
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine(F.col("_pvec"), F.col("_cvec")))
        .drop("_cvec", "_pvec")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _hyperplanes(dim: int, num_planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state, no seed
    drift across cluster sizes): components from a splitmix-style integer
    hash mapped to [-1, 1]."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            x = (table * 1_000_003 + p * 10_007 + d) * 0x9E3779B97F4A7C15 % (1 << 64)
            x ^= x >> 31
            x = x * 0xBF58476D1CE4E5B9 % (1 << 64)
            x ^= x >> 29
            row.append((x / float(1 << 64)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-hash bucket id for one LSH table: bit i = sign(vec . plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(w)) for w in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each vector lands in one bucket per table; candidates are corpus rows
    sharing any (table, bucket) with the probe. The candidate join is an
    equi-join on (table, bucket) — bucket-local, never all-pairs. Recall
    grows with num_tables; cost with bucket occupancy (2^num_planes buckets).
    """
    def bucketed(df: DataFrame, out_id: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        rows = []
        for t in range(num_tables):
            planes = _hyperplanes(dim, num_planes, t)
            rows.append(
                F.struct(F.lit(t).alias("table"), lsh_bucket(vec, planes).alias("bucket"))
            )
        return df.select(
            F.col(id_col).alias(out_id),
            vec.alias(f"_{out_id}_vec"),
            F.explode(F.array(*rows)).alias("tb"),
        ).select(out_id, f"_{out_id}_vec", "tb.table", "tb.bucket")

    cb = bucketed(corpus, "neighbor_id")
    pb = bucketed(probes, "probe_id")
    cand = (
        cb.join(pb, on=["table", "bucket"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", "_probe_id_vec", "_neighbor_id_vec")
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine_sim", cosine(F.col("_probe_id_vec"), F.col("_neighbor_id_vec"))
    ).select("probe_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Classic two-level ANN: KMeans(nlist) partitions the corpus into cells;
    each probe searches only its ``nprobe`` nearest cells. The cell
    assignment is a one-off batch job whose output would be persisted
    (partitioned by cell) in production; the probe-side search is an
    equi-join on cell id — at 100 TB it scans nprobe/nlist of the corpus
    instead of all of it, with partition pruning doing the skipping if the
    corpus is stored partitioned by cell.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn(
        "_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="_v", predictionCol="_cell").fit(
        feat
    )
    assigned = model.transform(feat).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        F.col("_cell"),
    )
    centers = [
        [float(x) for x in np.asarray(c.toArray() if hasattr(c, "toArray") else c)]
        for c in model.clusterCenters()
    ]
    # nprobe nearest cells per probe: squared distance to each centroid as
    # column expressions over the broadcast (tiny) centroid list.
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("_pvec"),
    )
    dist_cells = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("_pvec"),
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centers)
        ]
    )
    probe_cells = p.withColumn(
        "_cells", F.slice(F.array_sort(dist_cells), 1, nprobe)
    ).select(
        "probe_id", "_pvec", F.explode(F.col("_cells.cell")).alias("_cell")
    )
    cand = probe_cells.join(assigned, on="_cell").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine_sim", cosine(F.col("_pvec"), F.col("_cvec"))
    ).select("probe_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_near_pairs_gemm(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All-pairs cosine near-duplicate pairs via blocked matrix multiply.

    The per-pair expression formulation (crossJoin + aggregate lambda) is
    O(N^2 * d) scalar ops inside codegen — correct but ~50x slower than
    BLAS. Here the full normalized matrix (N x d float64; 100k x 64 ≈
    50 MB) is broadcast to every worker once, and each partition GEMMs its
    own row-block against it (``block @ all.T``), emitting only pairs
    above threshold with id_a < id_b. Same exact arithmetic per pair
    (float64 dot), so the verdict against any margin-separated threshold
    matches the expression formulation bit-for-bit at the flag level.

    Beyond broadcast reach (N*d > ~1e9), shard the broadcast side into
    column blocks and union the per-shard outputs — the row-block x
    col-block grid is the standard distributed GEMM; LSH/IVF bucketing
    (``lsh_topk`` / ``ivf_topk``) remains the sub-quadratic path.
    """
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, F.col(vec_col).cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    normed = mat / norms[:, None]
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(normed)

    def block_pairs(iterator):
        all_ids = b_ids.value
        all_mat = b_mat.value
        for pdf in iterator:
            idx = pdf["_row"].to_numpy()
            sims = all_mat[idx] @ all_mat.T  # (block, N)
            bi, bj = np.nonzero(sims > threshold)
            ia = all_ids[idx[bi]]
            ib = all_ids[bj]
            keep = ia < ib
            yield pd.DataFrame({"vec_id_a": ia[keep], "vec_id_b": ib[keep]})

    n = len(ids)
    rows_df = spark.range(n).select(F.col("id").cast("int").alias("_row"))
    return rows_df.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        block_pairs, "vec_id_a long, vec_id_b long"
    )
