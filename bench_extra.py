"""Per-query isolation bench (guide §1.4) — bench.py is FROZEN for driver
measurement, so all round-7 optimization measurements run here. Mirrors
bench.py's session config and query construction exactly, but:

- runs only the queries named on the command line (default: all headline)
- times each with the noop sink, configurable warm/repeat counts
- optionally dumps .explain("formatted") per query to a directory

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--warm 1] [--repeat 1] [--plan-dir plans/r07 --plan-suffix _before] \
        [query ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_bench_set(spark, cpus: int):
    """The same headline query set bench.py runs, built the same way."""
    from pyspark.sql import functions as F

    from spark_pit.operators.pit import pit_features_bucketed
    from spark_pit.queries import EVENT_VOCAB, QUERIES

    repl = int(os.environ.get("SPARK_GRAFT_REPL", "64"))
    buckets_env = os.environ.get("SPARK_GRAFT_BUCKETS")
    n_buckets_flagship = int(buckets_env) if buckets_env else cpus * 8
    n_buckets_image = int(buckets_env) if buckets_env else cpus * 4

    def _events(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if repl > 1:
            ev = ev.repartition(cpus * 2)
            ev = ev.withColumn("__r", F.explode(F.lit(list(range(repl))))).select(
                (F.col("user_id").cast("long")
                 + F.col("__r").cast("long") * F.lit(1_000_000_000)).alias("user_id"),
                "ts", "event_id", "event_type", "value",
            )
        return ev

    def flagship(spark, sf_dir):
        ev = _events(spark, sf_dir)
        snaps = ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("snapshot_ts"),
            F.col("event_id").alias("snapshot_id"),
        )
        return pit_features_bucketed(
            ev, snaps, entity="user_id", ts="ts", numeric_col="value",
            token_col="event_type", vocab=EVENT_VOCAB, gap_seconds=1800, width=5,
            num_buckets=n_buckets_flagship,
        )

    img_dir = os.environ.get("SPARK_GRAFT_IMG_DIR", "/tmp/spark_pit_bench_images")
    img_repl = int(os.environ.get("SPARK_GRAFT_IMG_REPL", "8"))

    def _ensure_images(spark):
        if not os.path.exists(f"{img_dir}/images.parquet"):
            from spark_pit.datagen import images_table, snapshots_table

            images_table(spark, n_entities=2000, n_rows=100_000, seed=42).write.mode(
                "overwrite"
            ).parquet(f"{img_dir}/images.parquet")
            snapshots_table(
                spark, n_entities=2000, snaps_per_entity=8, seed=42
            ).write.mode("overwrite").parquet(f"{img_dir}/snapshots.parquet")

    def _img_amplify(df):
        if img_repl <= 1:
            return df
        df = df.repartition(cpus * 2)
        df = df.withColumn("__r", F.explode(F.lit(list(range(img_repl)))))
        df = df.withColumn(
            "image_id",
            F.concat(F.col("__r").cast("string"), F.lit("#"), F.col("image_id")),
        )
        return df.drop("__r")

    def image_flagship(spark, sf_dir):
        from spark_pit.pipeline import image_pit_features

        _ensure_images(spark)
        return image_pit_features(
            _img_amplify(spark.read.parquet(f"{img_dir}/images.parquet")),
            _img_amplify(spark.read.parquet(f"{img_dir}/snapshots.parquet")),
            num_buckets=n_buckets_image,
        )

    return {
        "flagship": flagship,
        "image_flagship": image_flagship,
        "asof_join": QUERIES["asof_join"],
        "sessionize": QUERIES["sessionize"],
        "window_composition": QUERIES["window_composition"],
        "lagk_pairs": QUERIES["lagk_pairs"],
        "autocorr": QUERIES["autocorr"],
        "asdc": QUERIES["asdc"],
        "ksc_triad": QUERIES["ksc_triad"],
        "minhash_dedup_mark": QUERIES["minhash_dedup_mark"],
        "dedup_clusters": QUERIES["dedup_clusters"],
        "embedding_neardup": QUERIES["embedding_neardup"],
        "pricing_summary": QUERIES["pricing_summary"],
        "revenue_by_nation": QUERIES["revenue_by_nation"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all headline)")
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--registry", action="store_true",
                    help="look up non-headline names in the full QUERIES registry")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"

    from spark_pit.session import get_spark

    spark = get_spark(
        app_name="spark_pit_bench_extra",
        master=master,
        shuffle_partitions=max(cpus * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_set = build_bench_set(spark, cpus)
    if args.registry:
        from spark_pit.queries import QUERIES

        for n in args.queries:
            if n not in bench_set and n in QUERIES:
                bench_set[n] = QUERIES[n]
    names = args.queries or list(bench_set)

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = bench_set[name]
        df = fn(spark, sf_dir)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plan_dir, f"{name}{args.plan_suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        for _ in range(args.warm):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            _force(fn(spark, sf_dir))
        runs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench:{name}:{i}")
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
        print(json.dumps({"query": name, "runs": runs, "best": min(runs) if runs else None}),
              flush=True)

    print(json.dumps({
        "metric": "isolation",
        "sf": sf_dir,
        "cpus": cpus,
        "best": {k: (min(v) if v else None) for k, v in timings.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
