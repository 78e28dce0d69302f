"""Dataset-drift monitoring and split hygiene for a continuously
refreshed training corpus.

A 100 TB pipeline re-ingests shards daily; before a shard joins the
training mix it is compared against the blessed reference distribution,
and entities are assigned to folds so no entity ever leaks across a
train/validation boundary:

- ``tv_drift_by_group`` — exact total-variation distance between the
  reference-period and current-period categorical distributions, per
  monitored slice: TV = ½ Σ_v |p_ref(v) − p_cur(v)|. Over the common
  denominator, TV = Σ_v |c_ref(v)·N_cur − c_cur(v)·N_ref| /
  (2·N_ref·N_cur) — every term a decimal-128 integer until the final
  single rounded divide. TV is the metric of choice here over
  PSI/KL because it is exactly computable (no logs) and bounded [0, 1].
- ``group_kfold_stats`` — deterministic entity-level k-fold assignment
  via the repo's portable md5-fold (fold = fold16(md5(entity‖salt)) %
  k, reproducible across engines and runs), with per-fold row/entity/
  positive counts so balance is auditable. Because the fold is a pure
  function of the entity key, no entity ever appears in two folds —
  the group-k-fold property that prevents within-entity leakage.
- ``gini_diversity_by_group`` — exact Gini impurity of the category
  mix per slice (1 − Σp²), the corpus-diversity screen; exactly
  computable where Shannon entropy is not.
- ``oof_target_encode`` — the out-of-fold target-encoding TABLE:
  per (category, fold), the target count/mean computed over the OTHER
  folds only (leave-one-fold-out), built on the same md5-fold entity
  assignment — the serving artifact that lets a training job encode a
  fold without ever seeing its own labels.
- ``data_profile`` — exact per-column data-quality audit (rows, nulls,
  distinct values) over a declared column list, unpivoted into one
  (column, value) aggregation pass.

Both are single-shuffle plans with map-side partial aggregation; no
UDFs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tv_drift_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    period_col: str,
) -> DataFrame:
    """Exact per-group total-variation drift between two periods.

    ``period_col`` must be 0 (reference) / 1 (current) — in production a
    time-window flag like ``(ts >= snapshot_ts).cast("int")``. The plan
    aggregates once on (group, value) with map-side combine (the full
    table collapses to the distinct category values before the wide
    stage), attaches the per-group totals with an unbounded window on
    the SAME partitioning (no second exchange), and reduces. A group
    missing either period yields null.

    Returns (group, n_ref, n_cur, tv_micro) with
    tv_micro = round_half_up(10⁶ · Σ|c_ref·N_cur − c_cur·N_ref| /
    (2·N_ref·N_cur))."""
    p = F.col(period_col).cast("long")
    per_val = (
        df.select(F.col(group_col), F.col(value_col), p.alias("__p"))
        .groupBy(group_col, value_col)
        .agg(
            F.sum(F.lit(1) - F.col("__p")).alias("__cr"),
            F.sum("__p").alias("__cc"),
        )
    )
    return tv_from_counts(per_val, group_col)


def tv_from_counts(per_val: DataFrame, group_col: str) -> DataFrame:
    """The TV reduction over a pre-aggregated (group, value, __cr, __cc)
    count table — shared by the batch operator above and the streaming
    drift monitor (whose per-(group, value) period counts a built-in
    streaming aggregation maintains incrementally across micro-batches).
    Runs on the collapsed distinct-category set."""
    w_all = Window.partitionBy(group_col)
    tot = per_val.withColumn("__nr", F.sum("__cr").over(w_all)).withColumn(
        "__nc", F.sum("__cc").over(w_all)
    )
    dev = F.abs(
        F.col("__cr").cast("decimal(38,0)") * F.col("__nc")
        - F.col("__cc").cast("decimal(38,0)") * F.col("__nr")
    )
    agg = tot.groupBy(group_col).agg(
        F.max("__nr").cast("long").alias("n_ref"),
        F.max("__nc").cast("long").alias("n_cur"),
        F.sum(dev).alias("__d"),
    )
    return agg.select(
        group_col, "n_ref", "n_cur",
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            F.expr(
                "CAST((CAST(__d AS DECIMAL(38,0)) * 1000000"
                " + CAST(n_ref AS DECIMAL(38,0)) * n_cur)"
                " div (2 * CAST(n_ref AS DECIMAL(38,0)) * n_cur) AS BIGINT)"
            ),
        ).alias("tv_micro"),
    )


def gini_diversity_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact per-group Gini impurity of a categorical distribution —
    the diversity screen a corpus-mix dashboard tracks (1 − Σp², the
    probability two draws differ; 0 = monoculture, →1 = uniform over
    many categories). Chosen over Shannon entropy because it is exactly
    computable: gini_micro = round_half_up(10⁶·(N² − Σc²)/N²) — every
    term a decimal-128 integer, one integral div.

    Plan: one (group, value) partial-agg shuffle collapses to distinct
    categories; the per-group reduction runs on that set.

    Returns (group, n, n_categories, gini_micro)."""
    per = (
        df.select(F.col(group_col), F.col(value_col))
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = per.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias("__sc2"),
    )
    return agg.select(
        group_col, "n", "n_categories",
        F.expr(
            "CAST((2 * (CAST(n AS DECIMAL(38,0)) * n - __sc2) * 1000000"
            " + CAST(n AS DECIMAL(38,0)) * n)"
            " div (2 * CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("gini_micro"),
    )


def assign_group_fold(
    df: DataFrame,
    entity_col: str,
    k: int,
    salt: str = "gkf",
    out: str = "fold",
) -> DataFrame:
    """Attach the deterministic entity-level fold column: fold =
    fold16(md5(entity‖salt)) % k (first 15 hex digits of md5 parsed as
    an integer — always non-negative, < 2⁶⁰, portable across engines).
    Zero-shuffle projection; the fold is a pure function of the entity
    key, so every row of an entity lands in the same fold by
    construction."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(entity_col).cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn(out, (h % k).cast("int"))


def group_kfold_stats(
    df: DataFrame,
    entity_col: str,
    label_col: str,
    k: int,
    salt: str = "gkf",
) -> DataFrame:
    """Per-fold balance audit of the deterministic group-k-fold split:
    (fold, n_rows, n_entities, n_pos). One shuffle (the groupBy on the
    k-row fold key; the distinct-entity count is a two-level partial
    aggregate Spark plans without an extra pass over the input).

    At 100 TB the output is k rows — the audit query a training job
    runs before trusting a split."""
    with_fold = assign_group_fold(df, entity_col, k, salt=salt)
    return (
        with_fold.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(entity_col).cast("long").alias("n_entities"),
            F.sum(F.col(label_col).cast("long")).cast("long").alias("n_pos"),
        )
    )


def oof_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    entity_col: str,
    k: int,
    salt: str = "gkf",
) -> DataFrame:
    """Out-of-fold target-encoding table (leave-one-fold-out).

    Folds come from the deterministic md5 entity assignment
    (``assign_group_fold``), so an entity's rows never inform the
    encoding its own fold consumes — the standard leak-safe mean
    encoding for k-fold training, as a (category, fold) TABLE the
    training job joins in (k·|categories| rows, the serving artifact).

    Targets are quantized to int64 micro-units (floor(t·10⁶ + ½) —
    the defined quantization the eval plane shares); per-fold sums are
    decimal-128 integers; oof_mean_micro = round_half_up(
    (SUM_cat − sum_fold)/(CNT_cat − cnt_fold)) — one integral div.
    A (category, fold) whose complement is empty yields null mean.

    Plan: ONE data shuffle — groupBy(category, fold) with map-side
    partial aggregation collapses the table to k rows per category;
    the category-total windows run on that reduced set.

    Contract: ``target_col`` must be NON-NULL. Counts are over all rows
    while the sum skips nulls, so a nullable target would bias oof means
    toward zero — filter nulls upstream (the registry inputs are non-null
    derivations; the frozen SQL oracle shares the all-rows denominator,
    so the operator documents rather than silently rewrites the
    contract).

    Returns (category, fold, n_in_fold, oof_count, oof_mean_micro)."""
    t_us = F.floor(F.col(target_col) * 1_000_000 + F.lit(0.5)).cast("long")
    with_fold = assign_group_fold(
        df.select(F.col(cat_col), F.col(entity_col), t_us.alias("__t")),
        entity_col, k, salt=salt,
    )
    per = with_fold.groupBy(cat_col, "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_fold"),
        F.sum(F.col("__t").cast("decimal(38,0)")).alias("__s"),
    )
    w_all = Window.partitionBy(cat_col)
    tot = per.withColumn("__cnt", F.sum("n_in_fold").over(w_all)).withColumn(
        "__sum", F.sum("__s").over(w_all)
    )
    oof_cnt = (F.col("__cnt") - F.col("n_in_fold")).cast("long")
    return tot.select(
        cat_col, "fold", "n_in_fold",
        oof_cnt.alias("oof_count"),
        # round_half_up for EITHER sign of the target sum: floor-div
        # emulated as (x - pmod(x, y)) div y (Spark div truncates; the
        # subtraction makes the division exact), mirroring SQL's
        # floor-semantics // in the oracle
        F.when(
            oof_cnt > 0,
            F.expr(
                "CAST(((2 * (CAST(__sum AS DECIMAL(38,0)) - __s)"
                " + (__cnt - n_in_fold))"
                " - pmod(2 * (CAST(__sum AS DECIMAL(38,0)) - __s)"
                " + (__cnt - n_in_fold),"
                " 2 * (CAST(__cnt AS DECIMAL(38,0)) - n_in_fold)))"
                " div (2 * (CAST(__cnt AS DECIMAL(38,0)) - n_in_fold))"
                " AS BIGINT)"
            ),
        ).alias("oof_mean_micro"),
    )


def data_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column data-quality audit: row count, null count and
    distinct-value count for each declared column, computed in ONE
    unpivoted pass (stack to (column, value-as-string) rows, then one
    aggregation with map-side partials). Values are profiled on their
    STRING form — callers pass integer/string columns or pre-quantized
    numerics, keeping the form engine-portable (float formatting is
    not). The exact countDistinct is the oracle-checkable form; the
    constant-memory substitute at the 100 TB tier is the HLL++ sketch
    audit (analysis.sketch_vs_exact).

    Returns (col_name, n_rows, n_null, n_distinct)."""
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        # names are interpolated into the stack() selectExpr below — a
        # quote/backtick would break out of its literal (advice r6 fix)
        raise ValueError(f"data_profile: column names may not contain quotes/backticks: {bad}")
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    unpiv = df.selectExpr(f"stack({len(cols)}, {pairs}) AS (col_name, value)")
    return unpiv.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long").alias("n_null"),
        F.countDistinct("value").cast("long").alias("n_distinct"),
    )
