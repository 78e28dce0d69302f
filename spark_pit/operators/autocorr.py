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

from pyspark.sql import DataFrame, Window
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
    ent_stats = Window.partitionBy(entity)
    base = (
        df.select(entity, ts, *( [tiebreak] if tiebreak else [] ), value_col)
        .withColumn("__m", F.avg(value_col).over(ent_stats))
        .withColumn("__L", F.count(F.lit(1)).over(ent_stats))
        .withColumn(
            "__ss",
            F.sum((F.col(value_col) - F.col("__m")) * (F.col(value_col) - F.col("__m"))).over(
                ent_stats
            ),
        )
    )
    for n in range(1, nlags + 1):
        base = base.withColumn(f"__lead{n}", F.lead(value_col, n).over(w))

    # ONE aggregation carrying every lag's partial sums (the per-lag-union
    # form recomputes base once per lag — nlags shuffles), then stack-unpivot
    # and finish the arithmetic per row.
    x = F.col(value_col)
    aggs = [F.first("__L").alias("L"), F.first("__ss").alias("ss")]
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = y.isNotNull()
        aggs += [
            F.sum(F.when(valid, 1).otherwise(0)).alias(f"cnt{n}"),
            F.sum(F.when(valid, x * y)).alias(f"xy{n}"),
            F.sum(F.when(valid, (x - F.col("__m")) * (y - F.col("__m")))).alias(f"cov{n}"),
            F.sum(F.when(valid, (x - y) * (x - y))).alias(f"sqd{n}"),
        ]
    wide = base.groupBy(entity).agg(*aggs)
    stack_expr = "stack({n}, {args}) as (lag, cnt, xy, cov, sqd)".format(
        n=nlags,
        args=", ".join(f"{n}, cnt{n}, xy{n}, cov{n}, sqd{n}" for n in range(1, nlags + 1)),
    )
    long = wide.select(entity, "L", "ss", F.expr(stack_expr)).where(F.col("cnt") > 0)
    ss = F.col("ss")
    cnt = F.col("cnt")
    L = F.col("L")
    return long.select(
        entity,
        "lag",
        (F.col("xy") / cnt).alias("nmbroto"),
        (F.col("cov") / cnt).alias("ac"),
        F.when(ss > 0, (F.col("cov") / cnt) / (ss / L)).alias("moran"),
        F.when(ss > 0, (L - 1) / (2.0 * cnt) * F.col("sqd") / ss).alias("geary"),
        (F.col("sqd") / cnt).alias("soc"),
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
    Output (entity, lag, cc)."""
    w = entity_window(entity, ts, tiebreak)
    ent = Window.partitionBy(entity)
    base = (
        df.select(entity, ts, *([tiebreak] if tiebreak else []), col1, col2)
        .withColumn("__m1", F.avg(col1).over(ent))
        .withColumn("__m2", F.avg(col2).over(ent))
    )
    for n in range(1, nlags + 1):
        base = base.withColumn(f"__lead{n}", F.lead(col2, n).over(w))
    aggs = []
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = y.isNotNull()
        aggs += [
            F.sum(F.when(valid, 1).otherwise(0)).alias(f"cnt{n}"),
            F.sum(F.when(valid, (F.col(col1) - F.col("__m1")) * (y - F.col("__m2")))).alias(f"s{n}"),
        ]
    wide = base.groupBy(entity).agg(*aggs)
    stack_expr = "stack({n}, {args}) as (lag, cnt, s)".format(
        n=nlags, args=", ".join(f"{n}, cnt{n}, s{n}" for n in range(1, nlags + 1))
    )
    return (
        wide.select(entity, F.expr(stack_expr))
        .where(F.col("cnt") > 0)
        .select(entity, "lag", (F.col("s") / F.col("cnt")).alias("cc"))
    )
