"""Autocorrelation / sequence-order descriptor family (SURVEY.md §2.5) on a
numeric per-event channel: NMBroto, Moran, Geary, AC (autocovariance), CC
(cross-covariance), and the SOC lagged-squared-distance sum.

Reference formulas (feature.py:1428-1668, 2149-2196) computed per entity at
lags n = 1..nlags. Declarative plan: one lead() per lag over the shared
entity window, then a single groupBy(entity) with all lag aggregates — one
sort exchange + one partial-agg shuffle total, independent of nlags.

Output LONG: (entity, lag, <metrics...>) so the schema is nlag-independent
and SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pit.operators.windows import entity_window


def autocorr_long(
    df: DataFrame,
    entity: str,
    ts: str,
    value_col: str,
    nlags: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per (entity, lag): nmbroto, moran, geary, ac, soc — NaN-safe.

    nmbroto = sum(x_j * x_{j+n}) / (L-n)                    feature.py:1428-1485
    ac      = sum((x_j - m)(x_{j+n} - m)) / (L-n)           feature.py:1620-1668
    moran   = ac / (sum((x_j - m)^2) / L)                   feature.py:1487-1548
    geary   = (L-1)/(2(L-n)) * sum((x_j - x_{j+n})^2) / ss  feature.py:1550-1610
    soc     = sum((x_j - x_{j+n})^2) / (L-n)                feature.py:2149-2196
              (squared property-distance analogue)
    """
    w = entity_window(entity, ts, tiebreak)
    # Cross-engine determinism: the input is quantized ONCE to
    # decimal(18,6) (a binary double is never exactly on a decimal rounding
    # boundary, so Spark and DuckDB quantize identically), every sum is then
    # EXACT decimal arithmetic (order-independent), and all final formulas
    # run in double over bit-identical inputs. Centered statistics use the
    # algebraic forms (sum(xy) - m*Sx - m*Sy + n*m^2 etc.) so the mean never
    # enters a data-length summation. Without this, float partial-sum order
    # diverged from the oracle at sf0.1.
    xd = F.col(value_col).cast("decimal(18,6)")
    base = df.select(
        entity, ts, *([tiebreak] if tiebreak else []), value_col
    ).withColumn("__x", xd)
    for n in range(1, nlags + 1):
        base = base.withColumn(f"__lead{n}", F.lead("__x", n).over(w))

    # whole-entity stats fold into the SAME groupBy the lag sums use —
    # the former partitionBy-only Window pass buffered every partition a
    # second time for three values the aggregate computes for free
    # (round 7; identical decimal sums, order-independent)
    aggs = [
        F.count("__x").alias("L"),
        F.sum("__x").cast("double").alias("sx_all"),
        F.sum(F.col("__x") * F.col("__x")).cast("double").alias("sxx_all"),
    ]
    x = F.col("__x")
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = y.isNotNull() & x.isNotNull()
        aggs += [
            F.sum(F.when(valid, 1).otherwise(0)).alias(f"cnt{n}"),
            F.sum(F.when(valid, x)).cast("double").alias(f"px{n}"),
            F.sum(F.when(valid, y)).cast("double").alias(f"py{n}"),
            F.sum(F.when(valid, x * y)).cast("double").alias(f"xy{n}"),
            F.sum(F.when(valid, x * x)).cast("double").alias(f"pxx{n}"),
            F.sum(F.when(valid, y * y)).cast("double").alias(f"pyy{n}"),
        ]
    wide = base.groupBy(entity).agg(*aggs)
    stack_expr = "stack({n}, {args}) as (lag, cnt, px, py, xy, pxx, pyy)".format(
        n=nlags,
        args=", ".join(
            f"{n}, cnt{n}, px{n}, py{n}, xy{n}, pxx{n}, pyy{n}"
            for n in range(1, nlags + 1)
        ),
    )
    long = wide.select(entity, "L", "sx_all", "sxx_all", F.expr(stack_expr)).where(
        F.col("cnt") > 0
    )
    L = F.col("L")
    cnt = F.col("cnt")
    m = F.col("sx_all") / L
    ss = F.col("sxx_all") - L * m * m
    cov = F.col("xy") - m * F.col("py") - m * F.col("px") + cnt * m * m
    sqd = F.col("pxx") + F.col("pyy") - 2 * F.col("xy")
    return long.select(
        entity,
        "lag",
        (F.col("xy") / cnt).alias("nmbroto"),
        (cov / cnt).alias("ac"),
        F.when(ss > 0, (cov / cnt) / (ss / L)).alias("moran"),
        F.when(ss > 0, (L - 1) / (2.0 * cnt) * sqd / ss).alias("geary"),
        (sqd / cnt).alias("soc"),
    )


def cross_cov_long(
    df: DataFrame,
    entity: str,
    ts: str,
    col1: str,
    col2: str,
    nlags: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """CC analogue (feature.py:1670-1721): cross-covariance of two numeric
    channels at lags 1..nlags: sum((x1_j - m1)(x2_{j+n} - m2)) / (L-n).
    Output (entity, lag, cc).

    Cross-engine determinism (same scheme as autocorr_long): both channels
    quantized once to decimal(18,6), all sums exact decimal, centered form
    expanded algebraically so the means never enter a data-length sum."""
    w = entity_window(entity, ts, tiebreak)
    base = (
        df.select(entity, ts, *([tiebreak] if tiebreak else []), col1, col2)
        .withColumn("__a", F.col(col1).cast("decimal(18,6)"))
        .withColumn("__b", F.col(col2).cast("decimal(18,6)"))
    )
    for n in range(1, nlags + 1):
        base = base.withColumn(f"__lead{n}", F.lead("__b", n).over(w))
    a = F.col("__a")
    # whole-entity stats in the same groupBy (round 7, as autocorr_long)
    aggs = [
        F.count(F.lit(1)).alias("L"),
        F.sum("__a").cast("double").alias("sa"),
        F.sum("__b").cast("double").alias("sb"),
    ]
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = a.isNotNull() & y.isNotNull()
        aggs += [
            F.sum(F.when(valid, 1).otherwise(0)).alias(f"cnt{n}"),
            F.sum(F.when(valid, a)).cast("double").alias(f"pa{n}"),
            F.sum(F.when(valid, y)).cast("double").alias(f"pb{n}"),
            F.sum(F.when(valid, a * y)).cast("double").alias(f"ab{n}"),
        ]
    wide = base.groupBy(entity).agg(*aggs)
    stack_expr = "stack({n}, {args}) as (lag, cnt, pa, pb, ab)".format(
        n=nlags, args=", ".join(f"{n}, cnt{n}, pa{n}, pb{n}, ab{n}" for n in range(1, nlags + 1))
    )
    long = wide.select(entity, "L", "sa", "sb", F.expr(stack_expr)).where(F.col("cnt") > 0)
    m1 = F.col("sa") / F.col("L")
    m2 = F.col("sb") / F.col("L")
    cc = (F.col("ab") - m1 * F.col("pb") - m2 * F.col("pa") + F.col("cnt") * m1 * m2) / F.col("cnt")
    return long.select(entity, "lag", cc.alias("cc"))
