"""Embedding pipeline (§2.10 analogue) + analysis plane (§2.9 MLlib)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_pit.operators.analysis import (
    channel_correlation,
    kmeans_clusters,
    pca_embeddings,
)
from spark_pit.operators.embed import embed_documents


def test_embed_deterministic_and_normalized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = embed_documents(docs, "doc_id", "text", dim=32).toPandas().set_index("doc_id")
    b = embed_documents(docs, "doc_id", "text", dim=32).toPandas().set_index("doc_id")
    assert len(a) == docs.count()
    for did in a.index[:50]:
        np.testing.assert_array_equal(a.loc[did, "embedding"], b.loc[did, "embedding"])
    norms = np.array([np.linalg.norm(v) for v in a["embedding"]])
    nonempty = a["n_tokens"].to_numpy() > 0
    np.testing.assert_allclose(norms[nonempty], 1.0, rtol=1e-5)


def test_embed_token_budget_batching(spark, sf_dir):
    """Tiny budget still embeds every doc (budget slices, never drops)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    out = embed_documents(docs, "doc_id", "text", dim=16, max_tokens=8)
    assert out.count() == 100


def test_kmeans_and_pca_shapes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    km = kmeans_clusters(emb, "vec_id", "embedding", k=4, seed=42).toPandas()
    assert len(km) == emb.count()
    assert set(km["cluster"]) <= {0, 1, 2, 3}
    pca = pca_embeddings(emb, "vec_id", "embedding", k=8).toPandas()
    assert len(pca) == emb.count()
    assert all(len(v) == 8 for v in pca["pca"])


def test_channel_correlation_bounds(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "value", F.length("props").cast("double").alias("plen")
    )
    out = channel_correlation(ev, ["value", "plen"]).toPandas()
    assert len(out) == 1
    assert abs(out["pearson"].iloc[0]) <= 1.0


def test_quantize_embeddings_roundtrip(spark, sf_dir):
    """int8 codes stay in [-127, 127], reconstruction error is bounded by
    scale/2 per component, and the scalar report agrees with a NumPy
    recomputation."""
    import numpy as np

    from spark_pit.operators.embed import (
        quantization_error_stats,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = quantize_embeddings(emb, "vec_id", "embedding").toPandas()
    assert q["qvec"].map(lambda a: max(abs(int(x)) for x in a)).max() <= 127
    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    for _, row in q.iterrows():
        x = src[row["vec_id"]]
        rec = np.array([int(c) for c in row["qvec"]]) * row["scale"]
        assert np.abs(x - rec).max() <= row["scale"] / 2 + 1e-12
    stats = quantization_error_stats(emb, "vec_id", "embedding").toPandas()
    assert (stats["max_abs_err"] <= stats["scale_r"] / 2 + 1e-9).all()
    assert (stats["mse"] >= 0).all() and len(stats) == 50


def test_agglomerative_sample_hand_cases(spark):
    """Average-linkage merges: line points [0,1,10,11] at k=2 split into
    the two pairs; canonical label = min member id; id dtype passes
    through (long in, long out)."""
    import pandas as pd

    from spark_pit.operators.analysis import agglomerative_sample

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2, 3, 4], "embedding": [[0.0], [1.0], [10.0], [11.0]]})
    )
    out = agglomerative_sample(df, "vec_id", "embedding", k=2).toPandas()
    lab = dict(zip(out["vec_id"], out["cluster"]))
    assert lab == {1: 1, 2: 1, 3: 3, 4: 3}
    assert out["cluster"].dtype.kind == "i"


def test_agglomerative_recovers_blobs(spark):
    from spark_pit.datagen import blobs_table
    from spark_pit.operators.analysis import agglomerative_sample

    emb = blobs_table(spark, n_blobs=3, per_blob=20)
    out = agglomerative_sample(emb, "vec_id", "embedding", k=3).toPandas()
    got = out.groupby("cluster")["vec_id"].apply(lambda s: sorted(s)).to_dict()
    assert got == {0: list(range(20)), 20: list(range(20, 40)), 40: list(range(40, 60))}


def test_gmm_em_kernel_recovers_blobs_all_seeds(spark):
    """Round-4 incident fix: the NumPy/Cholesky EM kernel (no f2j dsyev —
    MLlib's GaussianMixture hung a second time, in-gate) recovers the
    blob partition with posterior 1.0 for every seed tried, unlike the
    MLlib EM whose 8-D seeds stalled in merged/split optima."""
    from spark_pit.datagen import blobs_table
    from spark_pit.operators.analysis import gmm_clusters_em

    emb = blobs_table(spark)
    truth = emb.select("vec_id", "blob").toPandas()
    for seed in (3, 42):
        out = gmm_clusters_em(emb, "vec_id", "embedding", k=4, seed=seed).toPandas()
        j = out.merge(truth, on="vec_id")
        assert j.groupby("blob")["cluster"].nunique().max() == 1, seed
        assert j["cluster"].nunique() == 4, seed
        assert j["max_prob"].min() > 0.999, seed


def test_gmm_em_kernel_grouped_path(spark):
    """group_col fits one bounded mixture per group across executors (the
    distributed shape); per-group recovery matches the single-group fit."""
    from pyspark.sql import functions as F

    from spark_pit.datagen import blobs_table
    from spark_pit.operators.analysis import gmm_clusters_em

    emb = blobs_table(spark).withColumn(
        "grp", (F.col("blob") < 2).cast("string")
    )
    out = gmm_clusters_em(
        emb, "vec_id", "embedding", k=2, seed=42, group_col="grp"
    ).toPandas()
    truth = emb.select("vec_id", "blob", "grp").toPandas()
    j = out.merge(truth, on=["vec_id", "grp"])
    assert len(j) == 160
    for g, sub in j.groupby("grp"):
        assert sub.groupby("blob")["cluster"].nunique().max() == 1, g
        assert sub["cluster"].nunique() == 2, g
        assert sub["max_prob"].min() > 0.999, g


def test_sketch_accuracy_stats(spark):
    """HLL++ and GK sketches agree with their exact twins within the
    documented tolerances on a 10k-row frame with 137 distinct keys."""
    import pandas as pd

    from spark_pit.operators.analysis import sketch_accuracy_stats

    pdf = pd.DataFrame(
        {
            "k": [i % 137 for i in range(10000)],
            "v": [(i * 7919 % 10007) / 10.0 for i in range(10000)],
        }
    )
    out = sketch_accuracy_stats(
        spark.createDataFrame(pdf), "k", "v"
    ).collect()[0]
    assert out["exact_distinct"] == 137
    assert out["hll_within_3rsd"] is True
    assert out["quantiles_within_1pct"] is True
