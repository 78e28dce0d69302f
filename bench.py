"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Event-table rows/sec is also reported inside "queries" as
"flagship_rows_per_sec" for the north-rule metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from spark_pit.operators.pit import pit_features_cursor
    from spark_pit.queries import EVENT_VOCAB, QUERIES
    from spark_pit.session import get_spark

    spark = get_spark(
        app_name="spark_pit_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()

    def flagship(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        snaps = ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("snapshot_ts"),
            F.col("event_id").alias("snapshot_id"),
        )
        return pit_features_cursor(
            ev, snaps, entity="user_id", ts="ts", numeric_col="value",
            token_col="event_type", vocab=EVENT_VOCAB, gap_seconds=1800, width=5,
        )

    bench_set = {
        "flagship": flagship,
        "asof_join": QUERIES["asof_join"],
        "sessionize": QUERIES["sessionize"],
        "window_composition": QUERIES["window_composition"],
        "lagk_pairs": QUERIES["lagk_pairs"],
        "autocorr": QUERIES["autocorr"],
        "asdc": QUERIES["asdc"],
        "pricing_summary": QUERIES["pricing_summary"],
        "revenue_by_nation": QUERIES["revenue_by_nation"],
    }

    timings: dict[str, float] = {}
    for name, fn in bench_set.items():
        df = fn(spark, sf_dir)
        _force(df)  # warm: JIT, file listing, broadcast (excluded from timing)
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    timings["flagship_rows_per_sec"] = round(n_events / max(timings["flagship"], 1e-9), 1)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": int(cpus),
                "event_rows": n_events,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
