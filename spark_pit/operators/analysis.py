"""Analysis plane (SURVEY.md §2.9: iAnalysis / MarkvCluster → MLlib).

The reference wraps sklearn eagerly per call (`iAnalysis.kmeans`
feature.py:4779-4807, PCA feature.py:4952-4960, correlation matrix for MCL
feature.py:5083-5094). Spark-first mapping: ``pyspark.ml`` estimators over
an assembled vector column, and plain ``corr`` aggregates for the
correlation plane. sklearn-only clusterers (Agglomerative/Spectral/DBSCAN/
MeanShift/APC) have no distributed equivalent and stay out of scope
(documented gap, SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assemble(df: DataFrame, vec_col: str):
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))


def kmeans_clusters(
    df: DataFrame, id_col: str, vec_col: str, k: int = 4, seed: int = 42
) -> DataFrame:
    """iAnalysis.kmeans (feature.py:4779-4792) → ml.clustering.KMeans.
    Returns (id, cluster)."""
    from pyspark.ml.clustering import KMeans

    feats = _assemble(df, vec_col)
    model = KMeans(k=k, seed=seed, featuresCol="__features").fit(feats)
    return model.transform(feats).select(id_col, F.col("prediction").alias("cluster"))


def pca_embeddings(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> DataFrame:
    """Notebook second pass (ESM_embed.ipynb:592-594 PCA(100)) →
    ml.feature.PCA. Returns (id, pca array<double>)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array

    feats = _assemble(df, vec_col)
    model = PCA(k=k, inputCol="__features", outputCol="__pca").fit(feats)
    return model.transform(feats).select(
        id_col, vector_to_array("__pca").alias("pca")
    )


def channel_correlation(df: DataFrame, cols: list[str]) -> DataFrame:
    """MarkvCluster's correlation-matrix seed (feature.py:5083-5094) as a
    long-format pairwise Pearson table over numeric channels — one
    aggregation, partial-aggregated before the single shuffle."""
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.corr(a, b).alias(f"{a}__{b}"))
    wide = df.agg(*aggs)
    pairs = None
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            row = wide.select(
                F.lit(a).alias("ch_a"), F.lit(b).alias("ch_b"),
                F.col(f"{a}__{b}").alias("pearson"),
            )
            pairs = row if pairs is None else pairs.unionByName(row)
    return pairs
