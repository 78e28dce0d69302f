"""Measure the star-form dedup recall trade on a planted corpus (round-6
verdict ask #3: the dedup_clusters docstring states the star-candidate
bound; this puts a NUMBER on it).

Protocol:
  1. datagen.neardup_corpus plants duplicate clusters whose members sit at
     known token-set Jaccard levels (J = (L−m)/(L+m) exactly, swept
     0.95 → 0.45) over a background of near-orthogonal docs.
  2. Ground truth = EXACT all-pairs token Jaccard via one token equi-join
     (no trust in the construction: accidental background pairs count too).
  3. dedup_clusters(threshold=0.5) → pair recall per true-J bucket: a
     truth pair is recalled iff both docs land in the same component.
     minhash_dedup_mark(threshold=0.5) → doc recall per bucket: a doc with
     any smaller-id partner at J ≥ 0.5 must be marked is_dup.
  4. Reference: the banding S-curve p(J) = 1 − (1 − J^r)^b (b=4, r=4) —
     candidate probability for a single pair; the star form can only lose
     pairs ON TOP of that (member–min below threshold) and only regain
     them transitively through components.

Usage: python tools/measure_dedup_recall.py [--clusters 40] [--background 800]
       [--threshold 0.5] [--markdown]
Prints one JSON line per true-J bucket plus a summary line; --markdown
emits the BENCH.md table instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def exact_truth_pairs(docs, min_j: float):
    """All-pairs exact distinct-token Jaccard ≥ min_j via token equi-join —
    the same token definition the minhash pipeline verifies with."""
    from spark_pit.operators.dedup import _distinct_tokens

    toks = _distinct_tokens(docs, "doc_id", "text")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.select(F.col("doc_id").alias("id_a"), "tok")
    b = toks.select(F.col("doc_id").alias("id_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "j_true",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .where(F.col("j_true") >= min_j)
        .select("id_a", "id_b", "j_true")
    )


def measure(spark, n_clusters: int, n_background: int, threshold: float,
            seed: int = 11, buckets=(0.5, 0.6, 0.7, 0.8, 0.9, 1.0),
            n_hashes: int = 16, bands: int = 4, rows_per_band: int = 4):
    from spark_pit.datagen import neardup_corpus
    from spark_pit.operators.dedup import dedup_clusters, minhash_dedup_mark

    docs = neardup_corpus(
        spark, n_clusters=n_clusters, n_background=n_background, seed=seed
    ).localCheckpoint()
    truth = exact_truth_pairs(docs, threshold).localCheckpoint()

    comp = dedup_clusters(
        docs, "doc_id", "text", threshold=threshold,
        n_hashes=n_hashes, bands=bands, rows_per_band=rows_per_band,
    )
    ca = comp.select(F.col("doc_id").alias("id_a"), F.col("canonical_id").alias("c_a"))
    cb = comp.select(F.col("doc_id").alias("id_b"), F.col("canonical_id").alias("c_b"))
    pair_hits = (
        truth.join(ca, "id_a").join(cb, "id_b")
        .withColumn("hit", (F.col("c_a") == F.col("c_b")).cast("int"))
    )

    mark = minhash_dedup_mark(
        docs, "doc_id", "text", threshold=threshold,
        n_hashes=n_hashes, rows_per_band=rows_per_band,
    )
    # a doc owed a mark: has any smaller-id partner at J >= threshold;
    # bucket it by its BEST (max) true J
    owed = truth.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.max("j_true").alias("j_best")
    )
    doc_hits = owed.join(mark.select("doc_id", "is_dup"), "doc_id").withColumn(
        "hit", F.col("is_dup").cast("int")
    )

    def bucketize(df, jcol):
        edges = list(buckets)
        expr = F.when(F.col(jcol) >= edges[-2], f"[{edges[-2]},{edges[-1]}]")
        for lo, hi in zip(edges[:-2][::-1], edges[1:-1][::-1]):
            expr = expr.when(F.col(jcol) >= lo, f"[{lo},{hi})")
        return df.withColumn("bucket", expr)

    out = []
    pr = {
        r["bucket"]: r
        for r in bucketize(pair_hits, "j_true")
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"), F.sum("hit").alias("hits"))
        .collect()
    }
    dr = {
        r["bucket"]: r
        for r in bucketize(doc_hits, "j_best")
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"), F.sum("hit").alias("hits"))
        .collect()
    }
    b, r_ = bands, rows_per_band
    for lo, hi in zip(buckets[:-1], buckets[1:]):
        key = f"[{lo},{hi})" if hi != buckets[-1] else f"[{lo},{hi}]"
        jmid = (lo + min(hi, 1.0)) / 2
        p_band = 1 - (1 - jmid ** r_) ** b
        row = {
            "bucket": key,
            "truth_pairs": pr[key]["n"] if key in pr else 0,
            "cluster_pair_recall": round(pr[key]["hits"] / pr[key]["n"], 4) if key in pr else None,
            "owed_docs": dr[key]["n"] if key in dr else 0,
            "mark_doc_recall": round(dr[key]["hits"] / dr[key]["n"], 4) if key in dr else None,
            "banding_p_mid": round(p_band, 4),
        }
        out.append(row)
    totals = {
        "threshold": threshold,
        "docs": docs.count(),
        "truth_pairs_total": truth.count(),
        "pair_recall_total": round(
            pair_hits.agg(F.sum("hit")).first()[0] / max(1, pair_hits.count()), 4
        ),
        "mark_recall_total": round(
            doc_hits.agg(F.sum("hit")).first()[0] / max(1, doc_hits.count()), 4
        ),
    }
    return out, totals


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=40)
    ap.add_argument("--background", type=int, default=800)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from spark_pit.session import get_spark

    spark = get_spark(app_name="dedup_recall", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rows, totals = measure(
        spark, args.clusters, args.background, args.threshold, args.seed,
        n_hashes=args.hashes, bands=args.bands,
        rows_per_band=args.rows_per_band,
    )
    totals["banding"] = f"{args.hashes} hashes = {args.bands} bands x {args.rows_per_band} rows"

    if args.markdown:
        print("| true J bucket | truth pairs | dedup_clusters pair recall | "
              "owed docs | dedup_mark doc recall | banding p(J_mid) |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['bucket']} | {r['truth_pairs']} | "
                  f"{r['cluster_pair_recall']} | {r['owed_docs']} | "
                  f"{r['mark_doc_recall']} | {r['banding_p_mid']} |")
        print()
        print(json.dumps(totals))
    else:
        for r in rows:
            print(json.dumps(r))
        print(json.dumps(totals))


if __name__ == "__main__":
    main()
