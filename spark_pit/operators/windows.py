"""Windowed per-entity operators: lag/lead, gap sessionization, backfill,
trailing-window composition (EAAC analogue), rolling numeric stats, and the
CTDD distribution-position descriptor.

All are pure window-function plans (JVM-side, whole-stage codegen). They share
one window partitioning — ``partitionBy(entity).orderBy(ts, tiebreak)`` — so
Catalyst collapses consecutive operators into a single sort+exchange; that is
the scale property that matters at 100 TB (one shuffle for the whole family).

Reference parity: SURVEY.md §2.4 (sliding windows feature.py:456-485),
§2.10 sessionization note, CTDD feature.py:1978-2050. Reference windows run
*forward* from each position; ours trail (rowsBetween(-(w-1), 0)) for zero
temporal leakage per the re-targeting contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from spark_pit.util import ts_us


def entity_window(entity: str, ts: str, tiebreak: str | None = None) -> WindowSpec:
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return Window.partitionBy(entity).orderBy(*order)


def with_lag_lead(
    df: DataFrame,
    entity: str,
    ts: str,
    cols: list[str],
    offsets: list[int] = (1,),
    tiebreak: str | None = None,
) -> DataFrame:
    """lag/lead channels (reference's lag-n shift, feature.py §2.5 inputs)."""
    w = entity_window(entity, ts, tiebreak)
    for c in cols:
        for n in offsets:
            df = df.withColumn(f"lag{n}_{c}", F.lag(c, n).over(w))
            df = df.withColumn(f"lead{n}_{c}", F.lead(c, n).over(w))
    return df


def with_session_id(
    df: DataFrame,
    entity: str,
    ts: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    out: str = "session_id",
) -> DataFrame:
    """Gap sessionization: new session when ts - lag(ts) > gap. Running sum
    of the break indicator over the entity window; 0-based ids."""
    w = entity_window(entity, ts, tiebreak)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(
        ts_us(ts) - F.lag(ts_us(ts)).over(w) > gap_seconds * 1_000_000, 1
    ).otherwise(0)
    return df.withColumn(out, F.sum(brk).over(cum))


def with_backfill(
    df: DataFrame,
    entity: str,
    ts: str,
    cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_bf",
) -> DataFrame:
    """last_value IGNORE NULLS over the trailing unbounded window."""
    w = entity_window(entity, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in cols:
        df = df.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return df


def with_window_composition(
    df: DataFrame,
    entity: str,
    ts: str,
    token_col: str,
    vocab: list[str],
    width: int = 5,
    tiebreak: str | None = None,
    prefix: str = "wc_",
) -> DataFrame:
    """EAAC analogue (feature.py:456-485): per event, frequency of each vocab
    token among the trailing `width` events (short head windows normalize by
    their true size). One conditional-sum window expression per token —
    stays in codegen, no UDF."""
    w = entity_window(entity, ts, tiebreak).rowsBetween(-(width - 1), Window.currentRow)
    size = F.count(F.lit(1)).over(w)
    for tok in vocab:
        df = df.withColumn(
            f"{prefix}{tok}",
            F.sum(F.when(F.col(token_col) == tok, 1).otherwise(0)).over(w) / size,
        )
    return df


def with_rolling_stats(
    df: DataFrame,
    entity: str,
    ts: str,
    col: str,
    width: int = 5,
    tiebreak: str | None = None,
) -> DataFrame:
    """Trailing-window mean/min/max of a numeric channel."""
    w = entity_window(entity, ts, tiebreak).rowsBetween(-(width - 1), Window.currentRow)
    return (
        df.withColumn(f"roll_mean_{col}", F.avg(col).over(w))
        .withColumn(f"roll_min_{col}", F.min(col).over(w))
        .withColumn(f"roll_max_{col}", F.max(col).over(w))
    )


def distribution_positions(
    df: DataFrame,
    entity: str,
    ts: str,
    token_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """CTDD analogue (feature.py:1978-2050): per (entity, token), the 1-based
    event position (as % of timeline length) at which the running count of
    that token first reaches ceil(q * total) for q in {first, .25, .5, .75, 1}.

    Plan: row_number over the entity window → running per-token count →
    per-(entity, token) conditional min-aggregation. Two shuffles (window +
    groupBy) sharing the entity key, so AQE reuses the exchange.
    """
    w = entity_window(entity, ts, tiebreak)
    wtok = Window.partitionBy(entity, token_col).orderBy(
        *([F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else []))
    )
    base = (
        df.withColumn("__pos", F.row_number().over(w))
        .withColumn("__L", F.count(F.lit(1)).over(Window.partitionBy(entity)))
        .withColumn("__cnt", F.row_number().over(wtok))
        .withColumn("__tot", F.count(F.lit(1)).over(Window.partitionBy(entity, token_col)))
    )
    qcols = []
    for name, q in (("p_first", None), ("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p100", 1.0)):
        target = F.lit(1) if q is None else F.ceil(F.lit(q) * F.col("__tot"))
        qcols.append(
            F.min(F.when(F.col("__cnt") == target, F.col("__pos") * 100.0 / F.col("__L"))).alias(name)
        )
    return base.groupBy(entity, token_col).agg(*qcols)
