"""Model-based anomaly scoring tests (SURVEY.md §2.10) on the embeddings
fixture plus a planted-outlier frame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark.operators import models


@pytest.fixture(scope="module")
def planted(spark):
    # Two non-degenerate clusters (centers -2 and +2, per-dim jitter) plus
    # one far outlier; k=2 fits the clusters, the outlier stays in the tail.
    import math

    rows = []
    for i in range(99):
        center = -2.0 if i % 2 == 0 else 2.0
        rows.append(
            (i, [center + 0.3 * math.sin(i * 13.7 + d) for d in range(8)])
        )
    # Moderate outlier: far enough to flag, near enough that giving it its
    # own k-means cluster / GMM component is not loss-optimal.
    rows.append((99, [6.0] * 8))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_scores_flag_planted_outlier(planted):
    out = models.kmeans_anomaly_scores(planted, k=2, quantile=0.98)
    flagged = {r.vec_id for r in out.collect() if r.is_anomaly}
    assert 99 in flagged
    top = out.orderBy(F.col("anomaly_score").desc()).first()
    assert top.vec_id == 99


def test_gmm_scores_flag_planted_outlier(planted):
    out = models.gmm_anomaly_scores(planted, k=2, quantile=0.02)
    bottom = out.orderBy(F.col("log_likelihood")).first()
    assert bottom.vec_id == 99


def test_scores_on_fixture_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = models.kmeans_anomaly_scores(emb, k=4, quantile=0.95)
    n = out.count()
    flagged = out.filter("is_anomaly").count()
    assert n == emb.count()
    assert 0 < flagged <= int(n * 0.10)  # ~5% above the 95th percentile
