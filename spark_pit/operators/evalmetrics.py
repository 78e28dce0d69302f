"""Distributed model-evaluation metrics (the training-eval plane).

A 100 TB training pipeline scores held-out shards continuously; these are
the metrics it aggregates, expressed as pure window/agg plans (no UDFs, no
driver collect) so they run per group (time bucket, data source, label
slice) at any cardinality:

- ``auc_by_group`` — exact ROC-AUC via the Mann–Whitney U rank statistic
  with midrank tie handling: AUC = (Σ ranks(positives) − P(P+1)/2)/(P·N).
  Two window passes over one (group, score) sort; bit-identical across
  engines because every term is integer until the final single divide.
- ``pr_auc_by_group`` — exact tie-grouped average precision (the
  imbalanced-data default beside ROC-AUC): thresholds are the DISTINCT
  scores descending, AP = Σ_i ΔR_i · P_i with P_i = TP_i/(TP_i+FP_i),
  ΔR_i = Δtp_i/n_pos — the step-function AP that never depends on
  tie-break order. All arithmetic is integer (decimal-128 intermediates,
  integral ``div``) under a DEFINED per-term nano-unit quantization, so
  the int64 micro-unit output is bit-identical across engines.
- ``calibration_bins`` — reliability-diagram bins: per (group, bin)
  count, mean predicted score (int64 micro-units) and empirical positive
  rate (micro-units), with the bin edge convention floor(score·B) clamped
  to B−1 so score=1.0 lands in the last bin.
- ``brier_ece_by_group`` — exact Brier score + expected calibration
  error per group over the defined micro-unit quantization of the score.
  The per-bin count CANCELS in ECE (Σ_b (n_b/N)·|Σs−10⁶Σy|/n_b =
  Σ_b|Σs−10⁶Σy| / N), so both metrics are pure integer sums until one
  final rounded divide each — bit-identical across engines. One data
  shuffle on (group, bin); the bin→group reduction is over B rows/group.
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


def pr_auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-group PR-AUC (tie-grouped average precision).

    Definition (tie-safe, order-free): thresholds are the distinct
    scores in descending order; at threshold i, TP_i/FP_i count
    positives/negatives with score ≥ threshold_i, and

        AP = Σ_i (Δtp_i / n_pos) · (TP_i / (TP_i + FP_i))

    — the step-function AP over score-tie blocks, so it NEVER depends on
    how a sort breaks ties (a rank-based AP does). Groups with no
    positives yield null; with no negatives AP is exactly 1.

    Exactness contract: every term is integer. Per threshold,
    term_nano_i = round_half_up(Δtp_i·TP_i·10⁹ / (TP_i+FP_i)) computed
    as (2a+b) div (2b) in decimal-128 (Spark integral ``div`` → long;
    the oracle's HUGEINT ``//`` mirrors it), summed as int64 (≤
    n_pos·10⁹, order-free), then pr_auc_micro =
    round_half_up(Σ/(n_pos·1000)). The only quantization is the defined
    per-term nano rounding (|error| ≤ 0.5·T/n_pos nano-units for T
    thresholds) — bit-identical across engines at any cardinality.

    Plan: groupBy(group, score) with map-side partial aggregation
    collapses the full table to distinct thresholds BEFORE any wide
    stage; the running-TP window and final per-group agg then run on
    that reduced set (second exchange is over thresholds, not rows).

    Returns (group, n_pos, n_neg, pr_auc_micro)."""
    thr = (
        df.select(
            F.col(group_col),
            F.col(score_col),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy(group_col, score_col)
        .agg(
            F.sum("__y").alias("__dp"),
            (F.count(F.lit(1)) - F.sum("__y")).alias("__dn"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc())
    cum = thr.withColumn("__tp", F.sum("__dp").over(w)).withColumn(
        "__k", F.sum(F.col("__dp") + F.col("__dn")).over(w)
    )
    term = F.expr(
        "(2 * CAST(__dp AS DECIMAL(38,0)) * __tp * 1000000000 + __k)"
        " div (2 * CAST(__k AS DECIMAL(38,0)))"
    )
    agg = cum.groupBy(group_col).agg(
        F.sum("__dp").cast("long").alias("n_pos"),
        F.sum("__dn").cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__dp") > 0, term)).cast("long").alias("__s"),
    )
    return agg.select(
        group_col, "n_pos", "n_neg",
        F.when(
            F.col("n_pos") > 0,
            F.expr(
                "(2 * CAST(__s AS DECIMAL(38,0)) + CAST(n_pos AS DECIMAL(38,0)) * 1000)"
                " div (2 * CAST(n_pos AS DECIMAL(38,0)) * 1000)"
            ),
        ).cast("long").alias("pr_auc_micro"),
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


def brier_ece_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Exact per-group Brier score + expected calibration error.

    Contract: both metrics are defined over the micro-quantized score
    s_us = floor(score·10⁶ + 0.5) — the same defined quantization the
    rest of the eval plane uses (|score − s_us/10⁶| ≤ 5e-7, so the
    quantization error on Brier is < 1e-6 absolute).

        brier = Σ (s_us − 10⁶·y)² / (N·10¹²)
        ece   = Σ_b (n_b/N) · |mean_b(s_us) − 10⁶·mean_b(y)| / 10⁶
              = Σ_b |A_b − 10⁶·P_b| / (N·10⁶)        (the n_b cancel)

    with A_b = Σ_bin s_us, P_b = Σ_bin y, bins = min(floor(score·B), B−1)
    per group (the calibration_bins edge convention). Every sum is a
    decimal-128 integer; the ONLY float-free rounding is the final
    round-half-up integral div into int64 micro-units — bit-identical
    across engines at any cardinality (per-row (s_us−10⁶y)² ≤ 10¹²
    would overflow an int64 sum near 9.2M rows/group; decimal-128
    doesn't).

    Plan: one shuffle on (group, bin) with map-side partial aggregation;
    the second exchange reduces ≤B rows per group. Returns
    (group, n, brier_micro, ece_micro)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    s_us = F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)).cast("long")
    y = F.col(label_col).cast("long")
    per_bin = (
        df.select(F.col(group_col), b.alias("__b"), s_us.alias("__s"), y.alias("__y"))
        .groupBy(group_col, "__b")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__s").cast("decimal(38,0)")).alias("__a"),
            F.sum("__y").alias("__p"),
            F.sum(
                ((F.col("__s") - F.col("__y") * 1_000_000)
                 * (F.col("__s") - F.col("__y") * 1_000_000))
                .cast("decimal(38,0)")
            ).alias("__q"),
        )
    )
    agg = per_bin.groupBy(group_col).agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum("__q").alias("__sq"),
        F.sum(F.abs(F.col("__a") - F.col("__p").cast("decimal(38,0)") * 1_000_000))
        .alias("__dev"),
    )
    return agg.select(
        group_col, "n",
        F.expr(
            "CAST((2 * CAST(__sq AS DECIMAL(38,0)) + CAST(n AS DECIMAL(38,0)) * 1000000)"
            " div (2 * CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("brier_micro"),
        F.expr(
            "CAST((2 * CAST(__dev AS DECIMAL(38,0)) + CAST(n AS DECIMAL(38,0)))"
            " div (2 * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("ece_micro"),
    )
