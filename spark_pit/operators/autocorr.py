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

    per_lag = []
    x = F.col(value_col)
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = y.isNotNull()
        cnt = F.sum(F.when(valid, 1).otherwise(0))
        sum_xy = F.sum(F.when(valid, x * y))
        sum_cov = F.sum(F.when(valid, (x - F.col("__m")) * (y - F.col("__m"))))
        sum_sqd = F.sum(F.when(valid, (x - y) * (x - y)))
        L = F.first("__L")
        ss = F.first("__ss")
        per_lag.append(
            base.groupBy(entity)
            .agg(
                F.lit(n).alias("lag"),
                (sum_xy / cnt).alias("nmbroto"),
                (sum_cov / cnt).alias("ac"),
                F.when(ss > 0, (sum_cov / cnt) / (ss / L)).alias("moran"),
                F.when(ss > 0, (L - 1) / (2.0 * cnt) * sum_sqd / ss).alias("geary"),
                (sum_sqd / cnt).alias("soc"),
                cnt.alias("n_pairs"),
            )
            .where(F.col("n_pairs") > 0)
        )

    out = per_lag[0]
    for p in per_lag[1:]:
        out = out.unionByName(p)
    return out.drop("n_pairs")


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
    parts = []
    for n in range(1, nlags + 1):
        y = F.col(f"__lead{n}")
        valid = y.isNotNull()
        cnt = F.sum(F.when(valid, 1).otherwise(0))
        s = F.sum(F.when(valid, (F.col(col1) - F.col("__m1")) * (y - F.col("__m2"))))
        parts.append(
            base.groupBy(entity)
            .agg(F.lit(n).alias("lag"), (s / cnt).alias("cc"), cnt.alias("__n"))
            .where(F.col("__n") > 0)
            .drop("__n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
