"""Analysis plane (SURVEY.md §2.9: iAnalysis / MarkvCluster → MLlib).

The reference wraps sklearn eagerly per call (`iAnalysis.kmeans`
feature.py:4779-4807, PCA feature.py:4952-4960, correlation matrix for MCL
feature.py:5083-5094). Spark-first mapping: ``pyspark.ml`` estimators over
an assembled vector column, and plain ``corr`` aggregates for the
correlation plane. The sklearn-only clusterer rows each get a distributed
analogue: BisectingKMeans (Agglomerative), PIC (Spectral),
graph.dbscan_clusters (DBSCAN), mean_shift_1d (MeanShift) and
affinity_propagation_grouped (APC)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    try:
        model = PCA(k=k, inputCol="__features", outputCol="__pca").fit(feats)
    except Exception:
        # one retry: MLlib .fit has flaked transiently under long-session
        # executor contention (round-3/4 observation — clean in isolation
        # and on immediate rerun both times)
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

    Cross-engine determinism (round-3 hardening): iterates are quantized
    to INT64 NANO-UNITS — ``qn = floor(mean·10⁹ + 0.5)`` — built only
    from IEEE double ops (multiply, add, floor) that are correctly
    rounded identically in Spark and DuckDB, and exact integer
    arithmetic. The previous DECIMAL(18,9) requantization relied on
    double→decimal CASTs, which Spark performs on the double's SHORTEST
    DECIMAL REPR (BigDecimal.valueOf) while DuckDB rounds the exact
    binary value — divergent whenever a quotient's shortest repr ends on
    a rounding boundary (~1e-7 of divisions; 29 hits out of 800k at
    sf0.1, invisible at the smaller gate scales). Neighborhood sums stay
    exact DECIMAL(18,6); only sums and counts ever cross the
    double/decimal line, both correctly rounded. Per step: one banded
    equi-join (the rangejoin trick, never a nested loop) + one
    partial-agg shuffle."""
    h = float(bandwidth)
    base = points.select(
        F.col(entity).alias("__e"),
        F.col(coord).cast("decimal(18,6)").alias("x"),
    ).withColumn("__b2", F.floor(F.col("x").cast("double") / h).cast("long"))
    cur = points.select(
        entity,
        F.col(node_id).alias("node"),
        F.floor(
            F.col(coord).cast("decimal(18,6)").cast("double") * F.lit(1e9) + F.lit(0.5)
        ).cast("long").alias("qn"),
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        q = (F.col("qn").cast("double") / F.lit(1e9))
        qb = cur.withColumn(
            "__jb",
            F.explode(
                F.array(
                    F.floor(q / h).cast("long") - 1,
                    F.floor(q / h).cast("long"),
                    F.floor(q / h).cast("long") + 1,
                )
            ),
        )
        near = qb.join(
            base,
            (F.col(entity) == F.col("__e")) & (F.col("__jb") == F.col("__b2")),
        ).where(
            F.abs(
                F.col("x").cast("double") - F.col("qn").cast("double") / F.lit(1e9)
            ) <= h
        )
        cur = (
            near.groupBy(entity, "node")
            .agg(F.sum("x").alias("__s"), F.count(F.lit(1)).alias("__c"))
            .select(
                entity, "node",
                F.floor(
                    F.col("__s").cast("double") / F.col("__c") * F.lit(1e9) + F.lit(0.5)
                ).cast("long").alias("qn"),
            )
            .localCheckpoint(eager=False)
        )
    # cluster bucket = nano units rounded half-up to MILLI units; mode =
    # nano rounded half-up to MICRO units — pure integer arithmetic, the
    # final /1e6 is one correctly-rounded IEEE divide of an exact integer
    labeled = cur.withColumn(
        "__mb",
        F.floor((F.col("qn") + F.lit(500_000)) / F.lit(1_000_000.0)).cast("long"),
    )
    lab = labeled.groupBy(entity, "__mb").agg(F.min("node").alias("cluster"))
    return (
        labeled.join(lab, [entity, "__mb"])
        .select(
            entity, "node",
            (
                F.floor((F.col("qn") + F.lit(500)) / F.lit(1_000.0)).cast("double")
                / F.lit(1e6)
            ).alias("mode"),
            "cluster",
        )
    )


def affinity_propagation_1d(
    points: DataFrame,
    entity: str,
    node_id: str,
    coord: str,
    n_iter: int = 10,
) -> DataFrame:
    """Affinity Propagation analogue (the reference's last sklearn-only
    clusterer row, feature.py:4838-4864 family) on the 1-D coordinate:
    similarity s(i,k) = −(xᵢ−x_k)², preference = the LOWER MEDIAN of the
    off-diagonal similarities (sklearn's default is the median; the lower
    median is the deterministic order statistic both engines compute
    identically — no two-middle averaging), K damped message-passing
    rounds (λ=1/2):

      r(i,k) ← s(i,k) − max_{k'≠k}(a(i,k') + s(i,k'))
      a(i,k) ← min(0, r(k,k) + Σ_{i'∉{i,k}} max(0, r(i',k))),
      a(k,k) ← Σ_{i'≠k} max(0, r(i',k))

    exemplars = {k : r(k,k)+a(k,k) > 0}; every point joins its
    max-similarity exemplar (ties → smallest k; no exemplar → the entity's
    min node id, one cluster).

    EVERY quantity stays exact DECIMAL: squared diffs, sums, maxes, and the
    λ=1/2 damping are closed under decimal arithmetic, and the one place a
    digit must be dropped — requantizing the halved messages back to scale
    9 — uses ``round(x, 9)``, which BOTH engines define as half away from
    zero on decimals. (A plain CAST rescale would NOT work: Spark casts
    round half-up but DuckDB casts round half-EVEN, and λ=1/2 manufactures
    exact .5 ties constantly — measured divergence.) The message matrix is
    O(N²) per entity (AP is inherently quadratic — the reference's own
    per-graph regime); each round is two join+window passes
    shuffle-partitioned on the entity key.

    ROLE: cross-engine exactness witness, not the production path. AP
    state is entity-local, so global rounds buy nothing but K shuffles and
    K Catalyst re-plans (measured: ~2 s/round on a trivial fixture, and
    driver-side planning grows superlinearly past ~20 rounds even with
    per-round ``localCheckpoint``). Use
    :func:`affinity_propagation_grouped` — the same recurrence in scaled
    int64 inside one ``applyInPandas`` — for converged clustering;
    test_pairs_r2 proves the two agree row-for-row at equal n_iter."""
    def tight(s: int) -> str:
        return f"decimal({s + 13},{s})"

    x = points.select(
        F.col(entity).alias("e"),
        F.col(node_id).alias("i"),
        F.col(coord).cast("decimal(18,6)").alias("xi"),
    )
    y = x.select(F.col("e"), F.col("i").alias("k"), F.col("xi").alias("xk"))
    d = F.col("xi") - F.col("xk")
    sim = x.join(y, "e").select(
        "e", "i", "k", (-(d * d)).cast("decimal(16,9)").alias("s")
    )
    # lower median of off-diagonal similarities: rank the exact decimals
    # (ties broken by (i,k) for full determinism) and take row ⌈n/2⌉
    off = sim.where(F.col("i") != F.col("k"))
    wrank = Window.partitionBy("e").orderBy("s", "i", "k")
    ranked = off.withColumn("__rn", F.row_number().over(wrank)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("e"))
    )
    pref = ranked.where(
        F.col("__rn") == F.ceil(F.col("__n") / 2).cast("int")
    ).select("e", F.col("s").alias("p"))
    s_df = (
        sim.join(F.broadcast(pref), "e")
        .select(
            "e", "i", "k",
            F.when(F.col("i") == F.col("k"), F.col("p")).otherwise(F.col("s"))
            .cast("decimal(16,9)").alias("s"),
        )
        .localCheckpoint()
    )
    msgs = s_df.select(
        "e", "i", "k",
        F.lit(0).cast(tight(9)).alias("r"),
        F.lit(0).cast(tight(9)).alias("a"),
    )
    half = F.lit("0.5").cast("decimal(2,1)")
    zero = F.lit(0).cast(tight(9))
    wi = Window.partitionBy("e", "i")
    for _ in range(n_iter):
        cur = msgs.join(s_df, ["e", "i", "k"])
        # argmax_k of a+s with smallest-k tie-break, plus the runner-up value
        cur = cur.withColumn("__v", (F.col("a") + F.col("s")).cast(tight(9)))
        cur = cur.withColumn(
            "__m1",
            F.max(F.struct(F.col("__v").alias("v"), (-F.col("k")).alias("nk"))).over(wi),
        )
        arg1 = -F.col("__m1.nk")
        max1 = F.col("__m1.v")
        cur = cur.withColumn(
            "__m2",
            F.max(F.when(F.col("k") != arg1, F.col("__v"))).over(wi),
        )
        rnew = (
            F.col("s") - F.when(F.col("k") == arg1, F.col("__m2")).otherwise(max1)
        ).cast(tight(9))
        rsum = (F.col("r") + rnew).cast(tight(9))
        # damping + the ONLY digit drop: round(x, 9) = half away from zero
        # in BOTH engines (cast rescale would tie-break differently)
        cur = cur.withColumn("r", F.round(rsum * half, 9).cast(tight(9)))
        # availability: per k, the positive-responsibility pool
        rp = F.when(
            (F.col("i") != F.col("k")) & (F.col("r") > 0), F.col("r")
        ).otherwise(zero)
        cur = cur.withColumn("__rp", rp)
        pool = cur.groupBy("e", "k").agg(
            F.sum("__rp").cast(tight(9)).alias("__pool")
        )
        rkk = cur.where(F.col("i") == F.col("k")).select(
            "e", "k", F.col("r").alias("__rkk")
        )
        cur = cur.join(pool, ["e", "k"]).join(rkk, ["e", "k"])
        inner = (F.col("__rkk") + F.col("__pool") - F.col("__rp")).cast(tight(9))
        anew = F.when(F.col("i") == F.col("k"), F.col("__pool")).otherwise(
            F.least(zero, inner)
        )
        asum = (F.col("a") + anew).cast(tight(9))
        msgs = cur.select(
            "e", "i", "k", "r",
            F.round(asum * half, 9).cast(tight(9)).alias("a"),
        ).localCheckpoint()
    diag = msgs.where(F.col("i") == F.col("k"))
    exemplars = diag.where((F.col("r") + F.col("a")) > 0).select(
        "e", F.col("k").alias("ex")
    )
    cand = (
        s_df.join(exemplars.withColumnRenamed("ex", "k"), ["e", "k"])
        .groupBy("e", "i")
        .agg(F.max(F.struct(F.col("s").alias("v"), (-F.col("k")).alias("nk"))).alias("__b"))
        .select("e", "i", (-F.col("__b.nk")).alias("cluster"))
    )
    fallback = x.groupBy("e").agg(F.min("i").alias("__fb"))
    out = (
        x.select("e", "i")
        .join(cand, ["e", "i"], "left")
        .join(F.broadcast(fallback), "e")
        .select(
            F.col("e").alias(entity),
            F.col("i").alias("node"),
            F.coalesce("cluster", F.col("__fb")).alias("cluster"),
        )
    )
    # exemplars label themselves even if a non-self similarity ties
    return out.join(
        exemplars.select(F.col("e").alias(entity), F.col("ex").alias("node"),
                         F.lit(True).alias("__isx")),
        [entity, "node"], "left",
    ).select(
        entity, "node",
        F.when(F.col("__isx"), F.col("node")).otherwise(F.col("cluster"))
        .alias("cluster"),
    )


def affinity_propagation_grouped(
    points: DataFrame,
    entity: str,
    node_id: str,
    coord: str,
    n_iter: int = 60,
) -> DataFrame:
    """The SCALE path for Affinity Propagation: identical semantics to
    :func:`affinity_propagation_1d` (same similarities, lower-median
    preference, λ=1/2 damping, round-half-away-from-zero requantization to
    scale 9, same tie-breaks), but the message matrix never leaves the
    entity's task. AP is per-entity-quadratic with entity-local state, so
    the right 100 TB plan is ONE shuffle (``groupBy(entity)``) and the full
    K-round message loop inside an Arrow batch — not K global shuffle
    rounds. The kernel runs the exact decimal recurrence in scaled int64
    (scale-9 fixed point): add/sub/max/sum are closed, and the single
    halving digit-drop is ``(|v|+1)//2`` with the sign restored — bit-equal
    to ``round(x*0.5, 9)`` on decimals. test_analysis cross-checks this
    kernel against the global decimal-DataFrame variant row-for-row.

    ``n_iter=60``: λ=1/2 message passing oscillates through a
    many-exemplar phase for the first few dozen rounds (a float reference
    run shows the same trajectory — every near-centre point self-exemplar
    at round 30, converged two-exemplar state from round ~60; sklearn's
    own default is max_iter=200 with a 15-round convergence window).
    Iterations are entity-local NumPy, so extra rounds cost microseconds,
    unlike the global variant where each round is a shuffle.

    Scaled-int64 bounds: coords quantize at scale 6, so |s|·10⁹ < 10¹⁶ for
    coordinate spreads below ~3·10³, and per-round sums stay under 2⁶³ for
    entities below ~400 points — the reference's own per-protein regime
    (feature.py:4838-4864 runs sklearn AP on one feature matrix in memory).
    """
    import numpy as np
    import pandas as pd

    def _halve(v):
        # round(v*0.5, 9) at scale 9 == half away from zero on odd ints
        a = np.abs(v)
        return np.sign(v) * ((a + 1) // 2)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__i", kind="mergesort")
        ids = pdf["__i"].to_numpy(np.int64)
        n = len(ids)
        if n == 1:
            return pd.DataFrame({"__e": pdf["__e"].iloc[:1],
                                 "node": ids, "cluster": ids})
        # xi at scale 6 (round-half-away, matching decimal(18,6) cast)
        x6 = np.round(pdf["__x"].to_numpy(np.float64) * 10**6).astype(np.int64)
        d = x6[:, None] - x6[None, :]
        s12 = -(d.astype(np.int64) ** 2)  # scale 12, exact
        # cast decimal(·,12) -> decimal(16,9): drop 3 digits half away from zero
        a12 = np.abs(s12)
        S = -((a12 + 500) // 1000)  # scale 9; s12 is ≤ 0 throughout
        # lower median of off-diagonal similarities, ties by (i,k):
        # ordering by value then row-id is total because duplicate values
        # compare equal — position ⌈m/2⌉ of the sorted values
        off = np.sort(S[~np.eye(n, dtype=bool)])
        p = off[(len(off) + 1) // 2 - 1]
        np.fill_diagonal(S, p)
        R = np.zeros((n, n), np.int64)
        A = np.zeros((n, n), np.int64)
        for _ in range(n_iter):
            V = A + S
            # per row: max and argmax (smallest k on ties), plus runner-up
            arg1 = np.argmax(V, axis=1)  # first occurrence = smallest k
            max1 = V[np.arange(n), arg1]
            V2 = V.copy()
            V2[np.arange(n), arg1] = np.iinfo(np.int64).min
            max2 = V2.max(axis=1)
            comp = np.where(np.arange(n)[None, :] == arg1[:, None],
                            max2[:, None], max1[:, None])
            R = _halve(R + (S - comp))
            RP = np.where((~np.eye(n, dtype=bool)) & (R > 0), R, 0)
            pool = RP.sum(axis=0)  # per column k
            rkk = np.diag(R).copy()
            inner = rkk[None, :] + pool[None, :] - RP
            Anew = np.minimum(0, inner)
            np.fill_diagonal(Anew, pool)
            A = _halve(A + Anew)
        ex = np.flatnonzero(np.diag(R) + np.diag(A) > 0)
        if len(ex) == 0:
            lab = np.full(n, ids.min())
        else:
            best = ex[np.argmax(S[:, ex], axis=1)]  # ties -> smallest k
            lab = ids[best]
            lab[ex] = ids[ex]
        return pd.DataFrame({"__e": pdf["__e"].iloc[:1].repeat(n).reset_index(drop=True),
                             "node": ids, "cluster": lab})

    ent_type = points.schema[entity].dataType.simpleString()
    out_schema = f"__e {ent_type}, node bigint, cluster bigint"
    src = points.select(
        F.col(entity).alias("__e"),
        F.col(node_id).cast("long").alias("__i"),
        F.col(coord).cast("double").alias("__x"),
    )
    return (
        src.groupBy("__e")
        .applyInPandas(kern, out_schema)
        .withColumnRenamed("__e", entity)
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


def agglomerative_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    n_sample: int = 500,
    seed: int = 42,
) -> DataFrame:
    """TRUE agglomerative hierarchical clustering (reference iAnalysis
    Agglomerative, feature.py:4824-4836 — sklearn AgglomerativeClustering,
    average linkage), closing the round-2 gap where BisectingKMeans stood
    in as a divisive analogue. Honest scale shape, same as tsne_sample:
    the algorithm is O(n²) memory / O(n³) time with a global merge order
    — no faithful distributed form — so a seeded rank-deterministic
    bounded sample (xxhash64 order, partitioning-invariant) comes to the
    driver and is clustered by exact Lance–Williams average-linkage
    merges; everything upstream (sampling, vector assembly) stays
    distributed. Fully deterministic — the algorithm itself has NO random
    state (ties broken by smallest cluster index pair), so unlike the
    EM-family fixtures no seed search is needed for the pinned oracle.

    Returns (id, cluster) with cluster = the MIN member id of the merged
    cluster (canonical labels, same convention as the fixture pins); id
    dtype passes through unchanged."""
    import numpy as np

    ranked = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
    )
    rows = ranked.collect()  # bounded by n_sample — the documented trade
    ids = [r[0] for r in rows]
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    n = len(ids)
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, cluster {id_type}"
    if n == 0:
        return spark.createDataFrame([], schema)
    # pairwise euclidean distances; clusters merge by smallest average
    # inter-cluster distance, Lance-Williams update keeps it exact
    D = np.sqrt(np.maximum(np.square(X[:, None, :] - X[None, :, :]).sum(-1), 0.0))
    np.fill_diagonal(D, np.inf)
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    active = sorted(members)
    while len(active) > k:
        sub = D[np.ix_(active, active)]
        flat = int(np.argmin(sub))
        ai, aj = divmod(flat, len(active))
        if ai > aj:
            ai, aj = aj, ai
        ci, cj = active[ai], active[aj]  # merge cj into ci
        ni, nj = len(members[ci]), len(members[cj])
        for o in active:
            if o in (ci, cj):
                continue
            D[ci, o] = D[o, ci] = (ni * D[ci, o] + nj * D[cj, o]) / (ni + nj)
        D[cj, :] = np.inf
        D[:, cj] = np.inf
        members[ci].extend(members.pop(cj))
        active.remove(cj)
    out = []
    for c in active:
        canon = min(ids[i] for i in members[c])
        for i in members[c]:
            out.append((ids[i], canon))
    return spark.createDataFrame(out, schema)


def tsne_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sample: int = 1000,
    perplexity: float = 10.0,
    n_iter: int = 300,
    seed: int = 42,
) -> DataFrame:
    """t-SNE (the reference's last DR row, iAnalysis.TSNE family alongside
    PCA feature.py:4952-4960) as a BOUNDED-SAMPLE visualization operator —
    the honest scale shape: t-SNE is O(N²) with a global KL objective and
    has no faithful distributed form, and its product is a scatter plot,
    so at 100 TB you take a seeded bounded sample to the driver, embed it,
    and keep everything upstream (the sampling, the vector assembly)
    distributed. The embedding itself is a self-contained NumPy
    implementation (exact affinities with per-point perplexity calibration,
    early exaggeration, momentum gradient descent) — deterministic given
    the seed, no sklearn. Returns (id, ts1, ts2) for the sampled rows.

    The sample is rank-deterministic: xxhash64(id, seed) orders the table
    and the first n_sample rows win, so the same inputs always embed the
    same subset regardless of partitioning. Ids are returned AS STRINGS
    in every branch (the output schema is `{id_col} string` — a plot
    legend key, not a join key); pass pre-cast string ids to keep dtypes
    round-trippable."""
    import numpy as np

    ranked = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
    )
    rows = ranked.collect()  # bounded by n_sample — the documented trade
    ids = [r[0] for r in rows]
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    n = len(ids)
    spark = df.sparkSession
    if n < 3:
        # stringify like the main path so both branches agree on the
        # declared `{id_col} string` schema for non-string id columns
        out = [(str(i), 0.0, 0.0) for i in ids]
        return spark.createDataFrame(out, f"{id_col} string, ts1 double, ts2 double")

    # pairwise affinities with per-point beta calibrated to the perplexity
    D = np.square(X[:, None, :] - X[None, :, :]).sum(-1)
    logU = np.log(min(perplexity, (n - 1) / 3.0))
    P = np.zeros((n, n))
    for i in range(n):
        lo, hi, beta = 0.0, np.inf, 1.0
        Di = np.delete(D[i], i)
        for _ in range(50):
            w = np.exp(-Di * beta)
            sw = w.sum()
            if sw <= 0:
                H, p = 0.0, w
            else:
                p = w / sw
                H = -np.sum(p * np.log(np.maximum(p, 1e-300)))
            if abs(H - logU) < 1e-5:
                break
            if H > logU:
                lo, beta = beta, beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi, beta = beta, (lo + beta) / 2
        P[i, np.arange(n) != i] = p
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    rng = np.random.default_rng(seed)
    Y = rng.normal(0.0, 1e-4, size=(n, 2))
    dY = np.zeros_like(Y)
    for it in range(n_iter):
        px = P * (4.0 if it < 50 else 1.0)  # early exaggeration
        num = 1.0 / (1.0 + np.square(Y[:, None] - Y[None, :]).sum(-1))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        G = 4.0 * (((px - Q) * num)[:, :, None] * (Y[:, None] - Y[None, :])).sum(1)
        mom = 0.5 if it < 250 else 0.8
        dY = mom * dY - 100.0 * G
        Y = Y + dY
        Y = Y - Y.mean(0)
    out = [(str(i), round(float(y[0]), 6), round(float(y[1]), 6))
           for i, y in zip(ids, Y)]
    return spark.createDataFrame(out, f"{id_col} string, ts1 double, ts2 double")


def gmm_clusters_em(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    seed: int = 42,
    n_iter: int = 60,
    reg_covar: float = 1e-6,
    group_col: str | None = None,
) -> DataFrame:
    """Full-covariance Gaussian-mixture EM with a NumPy/LAPACK kernel
    (iAnalysis.GM semantics, feature.py:4809-4822 — sklearn-style
    random-responsibility init, E/M steps, posterior argmax), grouped
    applyInPandas over a partition key so each bounded group's EM runs
    vectorized in one Arrow batch.

    WHY THIS EXISTS BESIDE ``gmm_clusters`` (MLlib): MLlib's
    GaussianMixture computes each component's covariance constants through
    the pure-Java f2j LAPACK ``dsyev``, which can spin WITHOUT TERMINATING
    on EM-trajectory covariances — jstack-confirmed twice in round 3 on
    8-D inputs and AGAIN in round 4 on the 3-D-hardened fixture
    (Dlascl/Dsyev RUNNABLE forever inside
    MultivariateGaussian.calculateCovarianceConstants). A non-terminating
    gate query is worse than any accuracy trade, so the PINNED fixture
    query runs THIS kernel — NumPy's LAPACK (OpenBLAS) dsyev/cholesky has
    no such failure mode — while ``gmm_clusters`` remains the
    MLlib-surface rows-only query at sf scale, OUTSIDE every gate window.

    Deterministic: np.random.default_rng(seed) k-means++ init, fixed
    iteration count, float64 throughout. Returns (id, cluster, max_prob).

    ``group_col`` keys the EM per group — the distributed shape (one
    bounded mixture fit per entity across executors, like
    affinity_propagation_grouped); None fits ONE mixture over the whole
    input in a single Arrow batch, which is only for bounded fixtures.
    The at-scale single-mixture path over unbounded rows remains MLlib
    ``gmm_clusters``.
    """
    import numpy as np
    import pandas as pd

    gcols = [group_col] if group_col else []
    out_schema = ", ".join(
        [f"{c} string" for c in gcols]
        + [f"{id_col} long", "cluster int", "max_prob double"]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(pdf["__v"].to_numpy())
        n, d = X.shape
        rng = np.random.default_rng(seed)
        # k-means++ seeding (sklearn's GaussianMixture default init is
        # kmeans-based for the same reason): flat random responsibilities
        # start every component at the global mean and EM merges/splits
        # well-separated blobs; distance-weighted seeding picks one point
        # per separated mode with overwhelming probability
        centers = [X[rng.integers(n)]]
        for _ in range(1, k):
            d2 = np.min(
                [((X - c) ** 2).sum(axis=1) for c in centers], axis=0
            )
            centers.append(X[rng.choice(n, p=d2 / d2.sum())])
        d2all = np.stack(
            [((X - c) ** 2).sum(axis=1) for c in centers], axis=1
        )
        resp = np.zeros((n, k))
        resp[np.arange(n), d2all.argmin(axis=1)] = 1.0
        log_prob = np.zeros((n, k))
        for _ in range(n_iter):
            # M step
            nk = resp.sum(axis=0) + 1e-10
            means = (resp.T @ X) / nk[:, None]
            covs = np.empty((k, d, d))
            for j in range(k):
                diff = X - means[j]
                covs[j] = (resp[:, j][:, None] * diff).T @ diff / nk[j]
                covs[j].flat[:: d + 1] += reg_covar
            weights = nk / n
            # E step (log-space, Cholesky — no eigensolver anywhere)
            for j in range(k):
                L = np.linalg.cholesky(covs[j])
                y = np.linalg.solve(L, (X - means[j]).T)
                maha = (y * y).sum(axis=0)
                logdet = 2.0 * np.log(np.diag(L)).sum()
                log_prob[:, j] = (
                    np.log(weights[j])
                    - 0.5 * (d * np.log(2 * np.pi) + logdet + maha)
                )
            mx = log_prob.max(axis=1, keepdims=True)
            p = np.exp(log_prob - mx)
            resp = p / p.sum(axis=1, keepdims=True)
        out = {c: pdf[c].to_numpy() for c in gcols}
        out[id_col] = pdf[id_col].to_numpy()
        out["cluster"] = resp.argmax(axis=1).astype("int32")
        out["max_prob"] = np.round(resp.max(axis=1), 6)
        return pd.DataFrame(out)

    if group_col:
        prepped = df.select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        return prepped.groupBy(group_col).applyInPandas(fit, out_schema)
    prepped = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__g", F.lit(0))
    return prepped.groupBy("__g").applyInPandas(fit, out_schema).drop("__g")


def sketch_accuracy_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    rsd: float = 0.05,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-vs-exact audit for the two estimators a 100 TB pipeline
    substitutes for exact global answers: HyperLogLog++ distinct counts
    (approx_count_distinct — one pass, constant memory, vs the exact
    count-distinct shuffle) and Greenwald-Khanna approximate quantiles
    (percentile_approx — vs the exact full-sort percentile). Emits both
    answers plus boolean within-tolerance verdicts; the pinned oracle
    asserts the exact values bit-for-bit and the verdicts TRUE, so a
    sketch regression (or a wrong rsd/accuracy plumb-through) flips the
    gate without pinning the engine's sketch internals."""
    exact_q = [float(q) for q in quantiles]
    agg = df.agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct"),
        F.approx_count_distinct(key_col, rsd).cast("long").alias("hll_distinct"),
        F.expr(
            f"percentile({value_col}, array({','.join(str(q) for q in exact_q)}))"
        ).alias("__pe"),
        F.percentile_approx(
            value_col, F.array(*[F.lit(q) for q in exact_q]), F.lit(accuracy)
        ).alias("__pa"),
    )
    hll_ok = (
        F.abs(F.col("hll_distinct") - F.col("exact_distinct"))
        <= F.col("exact_distinct") * 3 * rsd
    ).alias("hll_within_3rsd")
    # GK bound: rank error <= 1/accuracy of n — compare VALUES at a loose
    # relative tolerance instead (value-space bound needs the density;
    # 1% holds with huge margin on the test distributions)
    q_ok = F.aggregate(
        F.zip_with(
            F.col("__pe").cast("array<double>"),
            F.col("__pa").cast("array<double>"),
            lambda e, a: (F.abs(e - a) <= F.abs(e) * 0.01 + F.lit(1e-9)),
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    ).alias("quantiles_within_1pct")
    return agg.select("exact_distinct", hll_ok, q_ok)
