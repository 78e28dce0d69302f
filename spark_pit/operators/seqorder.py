"""Sequence-order coupling family (SURVEY.md §2.5 tail): SOCNumber, QSOrder,
PAAC re-expressed on event streams.

The reference computes, per entity, coupling statistics of a token series
with its lag-n shift through a token-pair distance function d(a,b), then
combines them with token counts under a weight w:

- `_SOCNumber` (feature.py:2149-2196): tau_n = sum_j d(s_j, s_{j+n})^2
  for n = 1..nlag (the reference divides by (L-n) only in the returned
  feature; the QSOrder tau uses the raw sum — both shapes are kept).
- `_QSOrder` (feature.py:2198-2269): for each token t,
  comp_t = count_t / (1 + w * sum(tau)); for each lag n,
  soq_n = w * tau_n / (1 + w * sum(tau)).
- `_PAAC` (feature.py:2274-2326): theta_n = mean_j R(s_j, s_{j+n}) with
  R = squared property difference; comp_t = count_t / (1 + w * sum(theta)),
  pse_n = w * theta_n / (1 + w * sum(theta)).

d(a,b) here is derived from a broadcast token → property table:
d(a,b)^2 = (p(a) − p(b))^2 — the same structure as the reference's
Schneider-Wrede / Grantham matrices, with our own table (the reference's
data files are missing from the repo, SURVEY.md meta-fact 2).

All plans are lead() windows + groupBy aggregates — one shuffle on the
entity key, partial aggregation before the exchange, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pit.operators.encode import property_channel
from spark_pit.operators.windows import entity_window


def _lag_sq_diff(
    df: DataFrame,
    entity: str,
    ts: str,
    token_col: str,
    table: dict[str, float],
    nlag: int,
    tiebreak: str | None,
) -> DataFrame:
    """Long frame (entity, lag, sq) of squared property differences between
    each event and its lag-n successor, n = 1..nlag."""
    d = property_channel(df.select(entity, ts, *([tiebreak] if tiebreak else []), token_col),
                         token_col, table, "p")
    w = entity_window(entity, ts, tiebreak)
    # all lags from ONE window pass (one sort+exchange), then unpivot with
    # stack — the per-lag-union form costs nlag scans and nlag shuffles
    wide = d.select(
        entity,
        *[
            F.pow(F.col("p") - F.lead("p", n).over(w), 2).alias(f"sq{n}")
            for n in range(1, nlag + 1)
        ],
    )
    stack_expr = "stack({n}, {args}) as (lag, sq)".format(
        n=nlag, args=", ".join(f"{n}, sq{n}" for n in range(1, nlag + 1))
    )
    return wide.select(entity, F.expr(stack_expr)).where(F.col("sq").isNotNull())


def soc_number(
    df: DataFrame,
    entity: str,
    ts: str,
    token_col: str,
    table: dict[str, float],
    nlag: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """(entity, lag, soc) with soc = sum(d^2)/(L - lag), the `_SOCNumber`
    returned feature (feature.py:2183-2189 divides by len - n)."""
    sq = _lag_sq_diff(df, entity, ts, token_col, table, nlag, tiebreak)
    return sq.groupBy(entity, "lag").agg(
        (F.sum("sq") / F.count(F.lit(1))).alias("soc")
    )


def qso_order(
    df: DataFrame,
    entity: str,
    ts: str,
    token_col: str,
    table: dict[str, float],
    vocab: list[str],
    nlag: int = 3,
    weight: float = 0.1,
    theta_mean: bool = False,
) -> DataFrame:
    """QSOrder/PAAC combined long output: rows (entity, feature, val) where
    feature is ``comp_<token>`` or ``tau_<lag>``. ``theta_mean=False`` is
    QSOrder (tau = raw sum, feature.py:2237-2244); ``theta_mean=True`` is
    PAAC (theta = mean, feature.py:2300-2309)."""
    sq = _lag_sq_diff(df, entity, ts, token_col, table, nlag, tiebreak=None)
    agg = F.avg("sq") if theta_mean else F.sum("sq")
    tau = sq.groupBy(entity, "lag").agg(agg.alias("tau"))
    tau_tot = tau.groupBy(entity).agg(F.sum("tau").alias("tau_sum"))

    counts = df.groupBy(entity, token_col).agg(F.count(F.lit(1)).alias("cnt"))
    comp = (
        counts.join(tau_tot, entity)
        .where(F.col(token_col).isin(vocab))
        .select(
            entity,
            F.concat(F.lit("comp_"), F.col(token_col)).alias("feature"),
            (F.col("cnt") / (1.0 + F.lit(weight) * F.col("tau_sum"))).alias("val"),
        )
    )
    soq = (
        tau.join(tau_tot, entity)
        .select(
            entity,
            F.concat(F.lit("tau_"), F.col("lag")).alias("feature"),
            (F.lit(weight) * F.col("tau") / (1.0 + F.lit(weight) * F.col("tau_sum"))).alias("val"),
        )
    )
    return comp.unionByName(soq)
