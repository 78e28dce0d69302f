"""Materialize the amplified image+snapshot scaling input once, so both
bench_scaling legs scan the SAME on-disk input (many parquet splits)
instead of regenerating it inside the measured job. `bytes` is dropped —
the PIT pipeline never reads it (PLANS.md scan_cols audit).

Usage: python tools/materialize_scaling_input.py --repl 64 --out DIR
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=64)
    ap.add_argument("--out", required=True)
    ap.add_argument("--src", default="/tmp/spark_pit_bench_images")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_pit.session import get_spark

    spark = get_spark(app_name="materialize_scaling_input",
                      master="local[8]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{args.src}/images.parquet"):
        from spark_pit.datagen import images_table, snapshots_table

        images_table(spark, n_entities=2000, n_rows=100_000, seed=42).write.mode(
            "overwrite"
        ).parquet(f"{args.src}/images.parquet")
        snapshots_table(spark, n_entities=2000, snaps_per_entity=8, seed=42).write.mode(
            "overwrite"
        ).parquet(f"{args.src}/snapshots.parquet")

    def amplify(df):
        df = df.repartition(16)
        df = df.withColumn("__r", F.explode(F.lit(list(range(args.repl)))))
        df = df.withColumn(
            "image_id",
            F.concat(F.col("__r").cast("string"), F.lit("#"), F.col("image_id")),
        )
        return df.drop("__r")

    imgs = spark.read.parquet(f"{args.src}/images.parquet").drop("bytes")
    amplify(imgs).repartition(64).write.mode("overwrite").parquet(
        f"{args.out}/images.parquet"
    )
    snaps = spark.read.parquet(f"{args.src}/snapshots.parquet")
    amplify(snaps).repartition(64).write.mode("overwrite").parquet(
        f"{args.out}/snapshots.parquet"
    )
    spark.stop()


if __name__ == "__main__":
    main()
