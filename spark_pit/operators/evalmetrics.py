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
- ``ks_by_group`` — exact two-sample Kolmogorov–Smirnov statistic
  between the positive and negative score distributions:
  KS = max_t |F_pos(t) − F_neg(t)| = max_t |cp_t·n_neg − cn_t·n_pos| /
  (n_pos·n_neg), evaluated only at the distinct scores (where the step
  CDFs change). Integer until the final single divide.
- ``ndcg_by_group`` — exact NDCG@k per query group under a DEFINED
  integer position-weight table w_i = round(10⁹/log2(i+1)) computed
  once on the driver and shared verbatim with the SQL oracle, so no
  engine ever evaluates a transcendental on data.
- ``lift_by_decile`` — the gain/lift chart: score-descending NTILE
  deciles with per-decile positive counts, cumulative capture rate and
  lift vs the group base rate, all int64 micro-units.
- ``spearman_by_group`` — exact-rank Spearman correlation (the
  monotonic feature-target screen): Pearson over doubled midranks,
  which are pure integers (min+max of the tie-class row_numbers), so
  every sum is a decimal-128 integer; the final sqrt/divide runs on
  correctly-rounded IEEE doubles identically in any engine.
- ``chi2_by_group`` — exact-count chi-square independence + Cramér's V
  between two categorical columns, via χ² = N·(Σ O²/(R·C) − 1) with a
  DEFINED per-cell nano rounding (the pr_auc convention) — the input
  collapses to distinct cells before any wide stage.
- ``retrieval_at_k`` — the top-k retrieval triple: precision@k,
  recall@k and reciprocal rank per query group, exact rationals under
  the engine-portable (score desc, item asc) total ranking, one
  window + one agg on a single exchange.
- ``ab_test_stats`` — the experimentation readout: per experiment,
  both arms' exact counts, the conversion-rate lift in micro-units
  (sign-safe integral rounding) and the pooled two-proportion z
  statistic (an explicitly-parenthesized IEEE double expression both
  engines evaluate identically from the same exact integers).
"""

from __future__ import annotations

import math

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


def ks_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-group two-sample KS statistic (pos vs neg scores).

    KS = max over thresholds t of |F_pos(t) − F_neg(t)| where F is the
    empirical CDF (inclusive). The max is attained at a distinct score,
    so the plan first collapses the table to per-(group, score) tie
    blocks with map-side partial aggregation (the same reduction
    pr_auc_by_group uses), then one cumulative window over the distinct
    thresholds. Per threshold the deviation cp·n_neg − cn·n_pos is a
    decimal-128 integer (cp·n_neg can exceed int64 beyond ~3B rows/
    group); the ONLY float-free rounding is the final round-half-up
    integral div into int64 micro-units — bit-identical across engines.
    Groups lacking a class yield null.

    Plan: ONE data shuffle on (group, score); the threshold window and
    totals window share the group partitioning (no second exchange).

    Contract: ``score_col`` must be NON-NULL (same hazard q_spearman
    documents — the threshold window sorts ascending, and Spark orders
    NULLS FIRST while DuckDB's ORDER BY defaults NULLS LAST, so nullable
    scores would produce engine-divergent cumulative CDFs; registry
    inputs are non-null derivations).

    Returns (group, n_pos, n_neg, ks_micro)."""
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
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    w_all = Window.partitionBy(group_col)
    cum = (
        thr.withColumn("__cp", F.sum("__dp").over(w))
        .withColumn("__cn", F.sum("__dn").over(w))
        .withColumn("__np", F.sum("__dp").over(w_all))
        .withColumn("__nn", F.sum("__dn").over(w_all))
    )
    dev = F.abs(
        F.col("__cp").cast("decimal(38,0)") * F.col("__nn")
        - F.col("__cn").cast("decimal(38,0)") * F.col("__np")
    )
    agg = cum.groupBy(group_col).agg(
        F.max("__np").cast("long").alias("n_pos"),
        F.max("__nn").cast("long").alias("n_neg"),
        F.max(dev).alias("__d"),
    )
    return agg.select(
        group_col, "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "CAST((2 * CAST(__d AS DECIMAL(38,0)) * 1000000"
                " + CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            ),
        ).alias("ks_micro"),
    )


def ndcg_weights_nano(k: int) -> list[int]:
    """The DEFINED integer DCG position-weight table: w_i =
    round_half_up(10⁹ / log2(i+1)) for rank i = 1..k. Computed once on
    the driver with Python floats and embedded as a literal in BOTH the
    Spark plan and the SQL oracle, so neither engine evaluates log2 on
    data — the metric is exact over this table by definition."""
    return [int(math.floor(1e9 / math.log2(i + 1) + 0.5)) for i in range(1, k + 1)]


def ndcg_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact per-group NDCG@k with integer relevances.

    DCG@k ranks items by (score desc, item asc) — the item tiebreak
    makes the ranking total and engine-portable — and sums
    rel_i · w_i over the top k with the defined integer nano-weight
    table (``ndcg_weights_nano``). IDCG@k sums the same weights over
    the k largest relevances (rel desc, item asc; the tiebreak cannot
    change IDCG since tied relevances contribute symmetrically).
    ndcg_micro = round_half_up(dcg_nano·10⁶ / idcg_nano) — every term
    an int64 (rel·w ≤ rel_max·10⁹; k terms), one final integral div.
    Groups with zero total relevance in the ideal top-k yield null.

    Plan: one exchange on the group key; the two row_number windows
    (scored order, ideal order) share it — two sorts, no second
    shuffle. Top-k filters cut the frame to ≤2k rows/group before the
    final agg.

    Returns (group, n_items, dcg_nano, idcg_nano, ndcg_micro)."""
    weights = ndcg_weights_nano(k)
    warr = F.array(*[F.lit(w) for w in weights])
    base = df.select(
        F.col(group_col),
        F.col(score_col),
        F.col(rel_col).cast("long").alias("__rel"),
        F.col(item_col).alias("__item"),
    )
    w_score = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col("__item").asc()
    )
    w_ideal = Window.partitionBy(group_col).orderBy(
        F.col("__rel").desc(), F.col("__item").asc()
    )
    ranked = base.withColumn("__r1", F.row_number().over(w_score)).withColumn(
        "__r2", F.row_number().over(w_ideal)
    )
    dcg = F.when(
        F.col("__r1") <= k, F.col("__rel") * F.element_at(warr, F.col("__r1"))
    ).otherwise(F.lit(0))
    idcg = F.when(
        F.col("__r2") <= k, F.col("__rel") * F.element_at(warr, F.col("__r2"))
    ).otherwise(F.lit(0))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(dcg).cast("long").alias("dcg_nano"),
        F.sum(idcg).cast("long").alias("idcg_nano"),
    )
    return agg.select(
        group_col, "n_items", "dcg_nano", "idcg_nano",
        F.when(
            F.col("idcg_nano") > 0,
            F.expr(
                "CAST((2 * CAST(dcg_nano AS DECIMAL(38,0)) * 1000000"
                " + CAST(idcg_nano AS DECIMAL(38,0)))"
                " div (2 * CAST(idcg_nano AS DECIMAL(38,0))) AS BIGINT)"
            ),
        ).alias("ndcg_micro"),
    )


def lift_by_decile(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Per-group gain/lift chart over score-descending NTILE deciles.

    Rows are ranked by (score desc, tiebreak asc) — the unique tiebreak
    makes NTILE engine-portable (both Spark and ANSI SQL distribute the
    N % tiles remainder to the FIRST buckets). Per decile: n, n_pos,
    cumulative positives captured, and

        capture_micro = round(cum_pos·10⁶ / P)
        lift_micro    = round(n_pos·N·10⁶ / (n·P))

    with P/N the group totals — integer (decimal-128 products) until
    the one integral div each. Groups with P = 0 yield null metrics.

    Plan: one exchange on the group key; the NTILE window, the decile
    agg and the cumulative/total windows all share it.

    Returns (group, decile, n, n_pos, capture_micro, lift_micro)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    per = (
        df.select(
            F.col(group_col),
            F.col(score_col),
            F.col(tiebreak_col),
            F.col(label_col).cast("long").alias("__y"),
        )
        .withColumn("decile", F.ntile(n_tiles).over(w))
        .groupBy(group_col, "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
    )
    w_cum = Window.partitionBy(group_col).orderBy(F.col("decile").asc())
    w_all = Window.partitionBy(group_col)
    cum = (
        per.withColumn("__cum", F.sum("n_pos").over(w_cum))
        .withColumn("__P", F.sum("n_pos").over(w_all))
        .withColumn("__N", F.sum("n").over(w_all))
    )
    return cum.select(
        group_col, "decile", "n", "n_pos",
        F.when(
            F.col("__P") > 0,
            F.expr(
                "CAST((2 * CAST(__cum AS DECIMAL(38,0)) * 1000000 + __P)"
                " div (2 * CAST(__P AS DECIMAL(38,0))) AS BIGINT)"
            ),
        ).alias("capture_micro"),
        F.when(
            F.col("__P") > 0,
            F.expr(
                "CAST((2 * CAST(n_pos AS DECIMAL(38,0)) * __N * 1000000"
                " + CAST(n AS DECIMAL(38,0)) * __P)"
                " div (2 * CAST(n AS DECIMAL(38,0)) * __P) AS BIGINT)"
            ),
        ).alias("lift_micro"),
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact-rank per-group Spearman correlation.

    Spearman ρ is Pearson over midranks. Doubled midranks are pure
    integers (2·midrank of a tie class = min(rn)+max(rn) — the
    auc_by_group identity), so Σa, Σb, Σa², Σb², Σab are all exact
    decimal-128 integers; ρ = (n·Σab − Σa·Σb) /
    √((n·Σa² − (Σa)²)·(n·Σb² − (Σb)²)) — the doubling cancels. The
    final steps (decimal→double casts, one sqrt, one divide, the
    floor(·10⁶+½)) are correctly-rounded IEEE operations on identical
    inputs, hence bit-identical across engines — the auc_by_group
    final-divide convention. Groups where either column is constant
    (zero variance) yield null.

    Plan: one exchange on the group key; the two row_number windows
    (x order, y order) and the four tie-class windows all share it —
    sorts, no second shuffle — and the final agg reduces per group.

    Returns (group, n, rho_micro)."""
    w_x = Window.partitionBy(group_col).orderBy(F.col(x_col).asc())
    w_y = Window.partitionBy(group_col).orderBy(F.col(y_col).asc())
    w_tx = Window.partitionBy(group_col, x_col)
    w_ty = Window.partitionBy(group_col, y_col)
    base = (
        df.select(F.col(group_col), F.col(x_col), F.col(y_col))
        .withColumn("__rx", F.row_number().over(w_x))
        .withColumn("__ry", F.row_number().over(w_y))
        .withColumn(
            "__a",
            (F.min("__rx").over(w_tx) + F.max("__rx").over(w_tx)).cast("long"),
        )
        .withColumn(
            "__b",
            (F.min("__ry").over(w_ty) + F.max("__ry").over(w_ty)).cast("long"),
        )
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(F.col("__a"))).alias("__sa"),
        F.sum(d(F.col("__b"))).alias("__sb"),
        F.sum(d(F.col("__a")) * F.col("__a")).alias("__saa"),
        F.sum(d(F.col("__b")) * F.col("__b")).alias("__sbb"),
        F.sum(d(F.col("__a")) * F.col("__b")).alias("__sab"),
    )
    num = F.col("n") * F.col("__sab") - F.col("__sa") * F.col("__sb")
    vx = F.col("n") * F.col("__saa") - F.col("__sa") * F.col("__sa")
    vy = F.col("n") * F.col("__sbb") - F.col("__sb") * F.col("__sb")
    rho = num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
    return agg.select(
        group_col, "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(rho * 1_000_000 + F.lit(0.5)).cast("long"),
        ).alias("rho_micro"),
    )


def chi2_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact-count per-group chi-square independence + Cramér's V
    between two categorical columns (the categorical feature screen).

    Uses χ² = N·(Σ_cells O²/(R·C) − 1): observed cell counts O, row
    totals R, column totals C are exact integers from ONE groupBy that
    collapses the table to its distinct cells before any wide stage.
    Each cell contributes term_nano = round_half_up(O²·10⁹/(R·C))
    (decimal-128 integral div — the pr_auc per-term convention, the
    ONLY quantization), so χ²_nano = N·(Σterms − 10⁹) is integer;
    chi2_micro = round_half_up(χ²_nano/1000). Cramér's V =
    √(χ²/(N·min(r−1, c−1))) follows with one correctly-rounded
    sqrt/divide on doubles (bit-identical across engines). Groups
    where either column is constant yield null V.

    Plan: one data shuffle to cells; the R/C windows and the final agg
    run on the reduced cell set (two small exchanges). The two
    countDistincts expand over cells, never over raw rows.

    Returns (group, n, chi2_micro, cramers_v_micro)."""
    cells = (
        df.select(F.col(group_col), F.col(x_col), F.col(y_col))
        .groupBy(group_col, x_col, y_col)
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    w_x = Window.partitionBy(group_col, x_col)
    w_y = Window.partitionBy(group_col, y_col)
    with_tot = cells.withColumn("__r", F.sum("__o").over(w_x)).withColumn(
        "__c", F.sum("__o").over(w_y)
    )
    term = F.expr(
        "(2 * CAST(__o AS DECIMAL(38,0)) * __o * 1000000000"
        " + CAST(__r AS DECIMAL(38,0)) * __c)"
        " div (2 * CAST(__r AS DECIMAL(38,0)) * __c)"
    )
    agg = with_tot.groupBy(group_col).agg(
        F.sum("__o").cast("long").alias("n"),
        F.countDistinct(x_col).cast("long").alias("__nx"),
        F.countDistinct(y_col).cast("long").alias("__ny"),
        F.sum(term).cast("decimal(38,0)").alias("__s"),
    )
    chi2_nano = F.col("n") * (F.col("__s") - F.lit(1_000_000_000))
    dof = F.least(F.col("__nx") - 1, F.col("__ny") - 1)
    v = F.sqrt(
        F.greatest(chi2_nano.cast("double") / 1e9, F.lit(0.0))
        / (F.col("n") * dof).cast("double")
    )
    return agg.select(
        group_col, "n",
        # clamp before the div: per-cell rounding can leave χ²_nano a few
        # nano-units NEGATIVE when the true χ² is 0, and integral division
        # of negatives is engine-divergent (Spark div truncates, SQL //
        # floors) — the clamp keeps both engines on the positive branch
        F.expr(
            "CAST((2 * greatest(CAST(n AS DECIMAL(38,0)) * (__s - 1000000000),"
            " CAST(0 AS DECIMAL(38,0))) + 1000)"
            " div (2000) AS BIGINT)"
        ).alias("chi2_micro"),
        F.when(
            dof > 0, F.floor(v * 1_000_000 + F.lit(0.5)).cast("long")
        ).alias("cramers_v_micro"),
    )


def retrieval_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact per-query precision@k, recall@k and reciprocal rank.

    Items are ranked by (score desc, item asc) — the unique item
    tiebreak makes the ranking total and engine-portable. With binary
    relevance: hits = relevant items in the top k, total = relevant
    items anywhere, first = rank of the first relevant item;

        precision_micro = round(hits·10⁶ / k)
        recall_micro    = round(hits·10⁶ / total)      (null if total=0)
        rr_micro        = round(10⁶ / first) if first ≤ k else 0
                                                        (null if total=0)

    — all integer until one integral div each (MRR is the caller's
    average of rr_micro over query groups). ONE exchange on the group
    key shared by the ranking window and the final agg.

    Returns (group, n_items, n_rel, hits_at_k, precision_micro,
    recall_micro, rr_micro)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col("__item").asc()
    )
    base = df.select(
        F.col(group_col),
        F.col(score_col),
        F.col(rel_col).cast("long").alias("__rel"),
        F.col(item_col).alias("__item"),
    ).withColumn("__rn", F.row_number().over(w))
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__rel").cast("long").alias("n_rel"),
        F.sum(F.when(F.col("__rn") <= k, F.col("__rel")).otherwise(F.lit(0)))
        .cast("long").alias("hits_at_k"),
        F.min(F.when(F.col("__rel") == 1, F.col("__rn"))).cast("long")
        .alias("__first"),
    )
    return agg.select(
        group_col, "n_items", "n_rel", "hits_at_k",
        F.expr(
            f"CAST((2 * CAST(hits_at_k AS DECIMAL(38,0)) * 1000000 + {k})"
            f" div (2 * {k}) AS BIGINT)"
        ).alias("precision_micro"),
        F.when(
            F.col("n_rel") > 0,
            F.expr(
                "CAST((2 * CAST(hits_at_k AS DECIMAL(38,0)) * 1000000 + n_rel)"
                " div (2 * CAST(n_rel AS DECIMAL(38,0))) AS BIGINT)"
            ),
        ).alias("recall_micro"),
        F.when(F.col("n_rel") == 0, F.lit(None).cast("long"))
        .when(
            F.col("__first") <= k,
            F.expr(
                "CAST((2 * CAST(1000000 AS DECIMAL(38,0)) + __first)"
                " div (2 * CAST(__first AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("rr_micro"),
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


def ab_test_stats(
    df: DataFrame,
    exp_col: str,
    arm_col: str,
    conv_col: str,
) -> DataFrame:
    """Per-experiment two-proportion readout (the A/B dashboard row).

    ONE shuffle: a conditional-sum aggregate on the experiment key
    yields both arms' exact (n, conversions). From those integers:

        lift_micro = round_half_up(10⁶·(x1/n1 − x0/n0))
                   = floor_div(2·(x1·n0 − x0·n1)·10⁶ + n0·n1, 2·n0·n1)

    — sign-safe (the numerator is negative when treatment loses;
    floor-div is emulated via pmod so Spark's truncating ``div``
    matches SQL's flooring ``//`` at any sign) — and the pooled
    two-proportion z statistic

        z = (x1/n1 − x0/n0) / sqrt(p·(1−p)·(1/n0 + 1/n1)),
        p = (x0+x1)/(n0+n1)

    evaluated as an explicitly-parenthesized IEEE double expression:
    every operand is an exact int64 cast (correctly rounded), every
    op (div, mul, sub, sqrt) is correctly rounded, and BOTH engines
    evaluate the identical tree — so z_micro = floor(z·10⁶ + ½) is
    bit-identical (the spearman/cramers_v convention). Null when an
    arm is empty or the pooled rate is degenerate (se = 0).

    Returns (experiment, n0, x0, n1, x1, lift_micro, z_micro)."""
    arm = F.col(arm_col).cast("long")
    y = F.col(conv_col).cast("long")
    agg = df.groupBy(exp_col).agg(
        F.sum(F.lit(1) - arm).cast("long").alias("n0"),
        F.sum(F.when(arm == 0, y).otherwise(F.lit(0))).cast("long").alias("x0"),
        F.sum(arm).cast("long").alias("n1"),
        F.sum(F.when(arm == 1, y).otherwise(F.lit(0))).cast("long").alias("x1"),
    )
    lift = F.expr(
        "CAST(((2 * (CAST(x1 AS DECIMAL(38,0)) * n0 - CAST(x0 AS DECIMAL(38,0)) * n1)"
        " * 1000000 + CAST(n0 AS DECIMAL(38,0)) * n1)"
        " - pmod(2 * (CAST(x1 AS DECIMAL(38,0)) * n0 - CAST(x0 AS DECIMAL(38,0)) * n1)"
        " * 1000000 + CAST(n0 AS DECIMAL(38,0)) * n1,"
        " 2 * CAST(n0 AS DECIMAL(38,0)) * n1))"
        " div (2 * CAST(n0 AS DECIMAL(38,0)) * n1) AS BIGINT)"
    )
    z = F.expr(
        "floor(((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
        " - (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)))"
        " / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
        " * (1.0 - (CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)))"
        " * ((1.0 / CAST(n0 AS DOUBLE)) + (1.0 / CAST(n1 AS DOUBLE))))"
        " * 1000000 + 0.5)"
    ).cast("long")
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    se_pos = (F.col("x0") + F.col("x1") > 0) & (
        F.col("x0") + F.col("x1") < F.col("n0") + F.col("n1")
    )
    return agg.select(
        exp_col, "n0", "x0", "n1", "x1",
        F.when(ok, lift).alias("lift_micro"),
        F.when(ok & se_pos, z).alias("z_micro"),
    )


def confusion_at_threshold(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-group confusion matrix at a decision threshold (score ≥ t →
    positive), with precision / recall / F1 in int64 micro-units — the
    fixed-operating-point companion to the threshold-free AUC/PR-AUC.

    All counts come from ONE conditional-sum aggregate; the three
    ratios are exact rationals with one round-half-up integral div each
    (F1 = 2·tp / (2·tp + fp + fn) — computed from the integer counts,
    never from the rounded precision/recall). Null where the
    denominator is empty (no predicted positives / no actual positives
    / no tp at all for F1 when tp+fp+fn = 0).

    Returns (group, tp, fp, fn, tn, precision_micro, recall_micro,
    f1_micro)."""
    pred = (F.col(score_col) >= F.lit(threshold)).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.sum(pred * y).cast("long").alias("tp"),
        F.sum(pred * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - pred) * y).cast("long").alias("fn"),
        F.sum((1 - pred) * (1 - y)).cast("long").alias("tn"),
    )

    def ratio(num: str, den: str):
        return F.expr(
            f"CAST((2 * CAST({num} AS DECIMAL(38,0)) * 1000000 + ({den}))"
            f" div (2 * CAST(({den}) AS DECIMAL(38,0))) AS BIGINT)"
        )

    return agg.select(
        group_col, "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0, ratio("tp", "tp + fp"))
        .alias("precision_micro"),
        F.when(F.col("tp") + F.col("fn") > 0, ratio("tp", "tp + fn"))
        .alias("recall_micro"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            ratio("2 * tp", "2 * tp + fp + fn"),
        ).alias("f1_micro"),
    )
