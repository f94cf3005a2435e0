"""KMeans coarse quantizer over the embeddings table (MLlib).

The IVF similarity path (operators/similarity.ivf_topk) needs a cell
assignment; the driver data ships one (``label``), and
operators/similarity.centroid_assign derives one from it.  This module is the
from-scratch alternative: train MLlib KMeans on the raw vectors (seed-pinned,
distributed Lloyd iterations) and use the model as the quantizer — the actual
IVF-index build step a production system runs.

Also doubles as the engine's unsupervised-ML surface (the reference only has
a supervised regression, SURVEY §2.11), on the same MLlib Pipeline stack.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


@dataclass
class QuantizerResult:
    model: KMeansModel
    assigned: DataFrame  # input columns + `cell`
    inertia: float  # training cost (sum of squared distances)
    silhouette: float


def train_quantizer(
    embeddings: DataFrame, k: int = 10, vec_col: str = "embedding"
) -> QuantizerResult:
    """Train a k-cell quantizer and assign every vector to its cell.

    The array<float> column converts to an MLlib vector JVM-side
    (``array_to_vector`` — no Python round-trip); training is MLlib's
    distributed KMeans.
    """
    featurized = embeddings.withColumn("features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=k, seed=SEED, featuresCol="features", predictionCol="cell")
    model = km.fit(featurized)
    assigned = model.transform(featurized).drop("features")
    silhouette = ClusteringEvaluator(
        featuresCol="features", predictionCol="cell", metricName="silhouette"
    ).evaluate(model.transform(featurized))
    return QuantizerResult(
        model=model,
        assigned=assigned,
        inertia=model.summary.trainingCost,
        silhouette=silhouette,
    )
