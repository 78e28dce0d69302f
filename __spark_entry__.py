"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship fused point-in-time pipeline (spark_pit.operators.pit)
queries()    — operator registry (spark_pit.queries.QUERIES)
oracle_sql() — DuckDB oracles   (spark_pit.queries.ORACLES)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fused single-pass PIT feature pipeline (as-of +
    lag/lead + sessionize + backfill + trailing composition + rolling mean)
    over sf0.001 events with purchase events as the snapshot stream."""
    from pyspark.sql import functions as F

    from spark_pit.operators.pit import pit_features_bucketed
    from spark_pit.queries import EVENT_VOCAB

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    snaps = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("snapshot_ts"),
        F.col("event_id").alias("snapshot_id"),
    )
    return pit_features_bucketed(
        ev, snaps, entity="user_id", ts="ts",
        numeric_col="value", token_col="event_type", vocab=EVENT_VOCAB,
        gap_seconds=1800, width=5, num_buckets=32,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_pit.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spark_pit.queries import ORACLES

    return dict(ORACLES)
