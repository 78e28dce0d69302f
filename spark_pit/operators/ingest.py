"""Ingest-side utilities (SURVEY.md §2.1).

- ``equal_length_stats`` — `sequence_with_equal_length` (feature.py:115-131):
  global min/max/distinct-count of per-entity timeline lengths + the
  equal-length flag the per-position descriptors gate on.
- ``zip_index_join`` — `add_samples_label` (feature.py:426-430): positional
  join of a label table onto samples. Spark has no positional join;
  the idiomatic re-expression is rank-align: row_number over an explicit
  deterministic order on both sides, then an equi-join on the rank.
- ``infer_stream_type`` — `check_sequence_type` (feature.py:133-162):
  sample-based alphabet classification (the reference samples <= 100
  sequences); driver-side decision over a bounded sample, like
  spark.read.json schema inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equal_length_stats(df: DataFrame, entity: str) -> DataFrame:
    lens = df.groupBy(entity).agg(F.count(F.lit(1)).alias("__n"))
    return lens.agg(
        F.min("__n").alias("min_len"),
        F.max("__n").alias("max_len"),
        F.countDistinct("__n").alias("distinct_lens"),
        (F.countDistinct("__n") == 1).alias("equal_length"),
    )


def zip_index_join(
    left: DataFrame,
    right: DataFrame,
    left_order: str,
    right_order: str,
) -> DataFrame:
    """Positional join: i-th row of left (by left_order) gets the i-th row
    of right (by right_order). Inner on the shared rank."""
    lw = Window.orderBy(left_order)
    rw = Window.orderBy(right_order)
    lr = left.withColumn("__rank", F.row_number().over(lw))
    rr = right.withColumn("__rank", F.row_number().over(rw))
    return lr.join(rr, "__rank").drop("__rank")


def infer_stream_type(
    df: DataFrame,
    token_col: str,
    known_vocabs: dict[str, set[str]],
    sample_rows: int = 100,
) -> str:
    """Classify the token alphabet from a bounded sample (reference samples
    <=100 sequences, feature.py:137). Returns the first vocab name whose set
    covers every sampled token, else 'unknown'."""
    sampled = [
        r[0] for r in df.select(token_col).dropna().limit(sample_rows).collect()
    ]
    toks = set(sampled)
    for name, vocab in known_vocabs.items():
        if toks <= vocab:
            return name
    return "unknown"
