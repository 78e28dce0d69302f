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


def gmm_clusters(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3, seed: int = 42
) -> DataFrame:
    """iAnalysis.GM (feature.py:4809-4822, sklearn GaussianMixture) →
    ml.clustering.GaussianMixture. Returns (id, cluster, max_prob) —
    the hard assignment plus its posterior, mirroring the reference's
    fit_predict surface. Init is platform-dependent → rows-only query."""
    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.functions import vector_to_array

    feats = _assemble(df, vec_col)
    model = GaussianMixture(k=k, seed=seed, featuresCol="__features").fit(feats)
    return model.transform(feats).select(
        id_col,
        F.col("prediction").alias("cluster"),
        F.round(F.array_max(vector_to_array("probability")), 6).alias("max_prob"),
    )


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


def bisecting_kmeans_clusters(
    df: DataFrame, id_col: str, vec_col: str, k: int = 4, seed: int = 42
) -> DataFrame:
    """The distributed analogue of the reference's sklearn Agglomerative
    clustering row (feature.py:4824-4836): MLlib BisectingKMeans — a
    hierarchical (divisive rather than agglomerative) clusterer, the MLlib
    answer to hierarchy-shaped clustering at scale. Returns (id, cluster)."""
    from pyspark.ml.clustering import BisectingKMeans

    feats = _assemble(df, vec_col)
    model = BisectingKMeans(k=k, seed=seed, featuresCol="__features").fit(feats)
    return model.transform(feats).select(id_col, F.col("prediction").alias("cluster"))


def pic_clusters(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    weight: str = "v",
    k: int = 2,
    max_iter: int = 20,
) -> DataFrame:
    """The distributed analogue of the reference's sklearn SpectralClustering
    row (feature.py:4852-4864): MLlib PowerIterationClustering — literally
    the power-iteration approximation of spectral clustering on an affinity
    graph. Input: symmetric weighted edges; returns (node, cluster)."""
    from pyspark.ml.clustering import PowerIterationClustering

    aff = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("double").alias("weight"),
    )
    pic = PowerIterationClustering(k=k, maxIter=max_iter, weightCol="weight")
    return pic.assignClusters(aff).select(
        F.col("id").alias("node"), F.col("cluster")
    )


def lda_topics(
    df: DataFrame, id_col: str, vec_col: str, k: int = 2, seed: int = 42
) -> DataFrame:
    """iAnalysis.LDA (feature.py:4968-4981, sklearn LatentDirichletAllocation
    over the descriptor matrix) → ml.clustering.LDA over a nonnegative
    count-vector column. Returns (id, topic, topic_weight) for the argmax
    topic — the reference's transform() surface reduced to its hard
    assignment + weight."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.functions import vector_to_array

    feats = _assemble(df, vec_col)
    model = LDA(k=k, seed=seed, maxIter=20, featuresCol="__features").fit(feats)
    out = model.transform(feats).withColumn(
        "__t", vector_to_array("topicDistribution")
    )
    return out.select(
        id_col,
        F.expr("array_position(__t, array_max(__t)) - 1").cast("int").alias("topic"),
        F.round(F.array_max("__t"), 6).alias("topic_weight"),
    )


def mean_shift_1d(
    points: DataFrame,
    entity: str,
    node_id: str,
    coord: str,
    bandwidth: float,
    n_iter: int = 8,
) -> DataFrame:
    """MeanShift analogue (reference iAnalysis MeanShift, sklearn row
    feature.py:4838-4864 family) on the engine's 1-D coordinate space:
    every point's position iterates to the mean of the ORIGINAL points
    within ``bandwidth`` (flat kernel), K fixed steps; points whose modes
    land in the same bandwidth-scale decimal bucket form a cluster
    (min node id = label).

    Cross-engine determinism, same discipline as eigenvector_centrality:
    original coordinates quantize once to DECIMAL(18,6) so every
    neighborhood mean is an exact decimal sum / count, and each iterate is
    re-quantized to DECIMAL(18,9) — the unrolled MATERIALIZED-CTE oracle
    reproduces every step bit-for-bit. Per step: one banded equi-join (the
    rangejoin trick, never a nested loop) + one partial-agg shuffle."""
    h = float(bandwidth)
    base = points.select(
        F.col(entity).alias("__e"),
        F.col(coord).cast("decimal(18,6)").alias("x"),
    ).withColumn("__b2", F.floor(F.col("x").cast("double") / h).cast("long"))
    cur = points.select(
        entity,
        F.col(node_id).alias("node"),
        F.col(coord).cast("decimal(18,6)").cast("decimal(18,9)").alias("q"),
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        qb = cur.withColumn(
            "__jb",
            F.explode(
                F.array(
                    F.floor(F.col("q").cast("double") / h).cast("long") - 1,
                    F.floor(F.col("q").cast("double") / h).cast("long"),
                    F.floor(F.col("q").cast("double") / h).cast("long") + 1,
                )
            ),
        )
        near = qb.join(
            base,
            (F.col(entity) == F.col("__e")) & (F.col("__jb") == F.col("__b2")),
        ).where(
            F.abs(F.col("x").cast("double") - F.col("q").cast("double")) <= h
        )
        cur = (
            near.groupBy(entity, "node")
            .agg(F.sum("x").alias("__s"), F.count(F.lit(1)).alias("__c"))
            .select(
                entity, "node",
                (F.col("__s").cast("double") / F.col("__c"))
                .cast("decimal(18,9)").alias("q"),
            )
            .localCheckpoint(eager=False)
        )
    labeled = cur.withColumn("__mb", F.col("q").cast("decimal(18,3)"))
    lab = labeled.groupBy(entity, "__mb").agg(F.min("node").alias("cluster"))
    return (
        labeled.join(lab, [entity, "__mb"])
        .select(
            entity, "node",
            F.round(F.col("q").cast("double"), 6).alias("mode"),
            "cluster",
        )
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


def mcl_clusters(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    weight: str = "v",
    inflation: float = 2.0,
    max_iter: int = 12,
    prune: float = 1e-4,
    tol: float = 1e-5,
) -> DataFrame:
    """Markov clustering (MarkvCluster, feature.py:5083-5154) as sparse COO
    DataFrame iterations — the distributed re-expression of the reference's
    dense numpy expand/inflate loop:

    - expand  = M @ M  → join on the contraction index + groupBy sum
      (shuffle-partitioned on the key; pruning keeps the matrix sparse so
      the join stays far below the dense N^3)
    - inflate = elementwise v^r then column re-normalization (groupBy sum +
      join-divide)
    - converge on max |delta| (full-outer join) or max_iter; each iteration
      localCheckpoints to truncate lineage (driver loop over a bounded
      iteration count — the canonical Spark shape for iterative algorithms)

    Input: symmetric weighted edge list (i, j, v>=0); self-loops are added
    (MCL requirement). Output: (node, cluster) with cluster = min attractor
    row over the node's column — deterministic.
    """
    spark = edges.sparkSession
    m = edges.select(
        F.col(src).alias("i"), F.col(dst).alias("j"), F.col(weight).cast("double").alias("v")
    )
    nodes = m.select(F.col("i").alias("n")).union(m.select("j")).distinct()
    loops = nodes.select(F.col("n").alias("i"), F.col("n").alias("j"), F.lit(1.0).alias("v"))
    m = m.where(F.col("v") > 0).unionByName(loops).groupBy("i", "j").agg(F.max("v").alias("v"))

    def colnorm(mm: DataFrame) -> DataFrame:
        tot = mm.groupBy("j").agg(F.sum("v").alias("__t"))
        return mm.join(tot, "j").select("i", "j", (F.col("v") / F.col("__t")).alias("v"))

    cur = colnorm(m).localCheckpoint()
    for _ in range(max_iter):
        a = cur.select(F.col("i"), F.col("j").alias("k"), F.col("v").alias("va"))
        b = cur.select(F.col("i").alias("k"), F.col("j"), F.col("v").alias("vb"))
        sq = (
            a.join(b, "k")
            .groupBy("i", "j")
            .agg(F.sum(F.col("va") * F.col("vb")).alias("v"))
        )
        infl = sq.select("i", "j", F.pow("v", inflation).alias("v"))
        nxt = colnorm(infl).where(F.col("v") > prune)
        nxt = colnorm(nxt).localCheckpoint()  # renormalize after pruning
        delta = (
            nxt.select("i", "j", F.col("v").alias("vn"))
            .join(cur.select("i", "j", F.col("v").alias("vo")), ["i", "j"], "full_outer")
            .select(
                F.abs(F.coalesce("vn", F.lit(0.0)) - F.coalesce("vo", F.lit(0.0))).alias("d")
            )
            .agg(F.max("d"))
            .first()[0]
        )
        cur = nxt
        if delta is not None and delta < tol:
            break
    return cur.groupBy("j").agg(F.min("i").alias("cluster")).select(
        F.col("j").alias("node"), "cluster"
    )
