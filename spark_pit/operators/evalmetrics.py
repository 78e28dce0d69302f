"""Distributed model-evaluation metrics (the training-eval plane).

A 100 TB training pipeline scores held-out shards continuously; these are
the metrics it aggregates, expressed as pure window/agg plans (no UDFs, no
driver collect) so they run per group (time bucket, data source, label
slice) at any cardinality:

- ``auc_by_group`` — exact ROC-AUC via the Mann–Whitney U rank statistic
  with midrank tie handling: AUC = (Σ ranks(positives) − P(P+1)/2)/(P·N).
  Two window passes over one (group, score) sort; bit-identical across
  engines because every term is integer until the final single divide.
- ``calibration_bins`` — reliability-diagram bins: per (group, bin)
  count, mean predicted score (int64 micro-units) and empirical positive
  rate (micro-units), with the bin edge convention floor(score·B) clamped
  to B−1 so score=1.0 lands in the last bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-group ROC-AUC (Mann–Whitney with midranks).

    Midranks: every row's rank is the AVERAGE row_number of its (group,
    score) tie class — computed as one avg window over the row_number
    window, both on the same (group, score) sort, so ONE sort exchange
    total. The AUC numerator 2·Σmidrank(pos) − P(P+1) stays integer
    (2·avg of integers over a tie class is an integer sum ×2 — exact),
    and the one float op is the final divide by 2·P·N, correctly rounded
    everywhere. Groups with no positives or no negatives yield null.

    Returns (group, n_pos, n_neg, auc_micro) with auc_micro =
    floor(AUC·10⁶ + 0.5) — the engine-portable int64 surface."""
    # 2*midrank over a tie class of consecutive integers [a..b] is exactly
    # a+b = min(rn)+max(rn): pure integer arithmetic, no intermediate
    # double (sum(rn)*2/count routes through a float64 division whose
    # mantissa runs out near n(n+1) > 2^53, i.e. per-group tie classes of
    # ~9.5e7 rows — min+max never does). Same w_tie windows, same single
    # sort exchange.
    w_rn = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col("__y").asc()
    )
    w_tie = Window.partitionBy(group_col, score_col)
    base = df.select(
        F.col(group_col),
        F.col(score_col),
        F.col(label_col).cast("int").alias("__y"),
    ).withColumn("__rn", F.row_number().over(w_rn))
    base = base.withColumn(
        "__mid2",
        (F.min("__rn").over(w_tie) + F.max("__rn").over(w_tie))
        .cast("long"),
    )
    agg = base.groupBy(group_col).agg(
        F.sum("__y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__mid2"))).cast("long").alias("__s2"),
    )
    num = F.col("__s2") - F.col("n_pos") * (F.col("n_pos") + 1)
    auc = num / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        group_col, "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(auc * 1_000_000 + F.lit(0.5)).cast("long"),
        ).alias("auc_micro"),
    )


def calibration_bins(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins per group: bin = min(floor(score·B), B−1),
    emitting count, mean predicted score and empirical positive rate as
    int64 micro-units (sums exact, one final divide each). ONE shuffle."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    s_us = F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)).cast("long")
    y = F.col(label_col).cast("long")
    return (
        df.select(F.col(group_col), b.alias("bin"), s_us.alias("__s"), y.alias("__y"))
        .groupBy(group_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("__s") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long").alias("mean_score_micro"),
            F.floor(F.sum("__y") * 1_000_000 / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long").alias("pos_rate_micro"),
        )
    )
