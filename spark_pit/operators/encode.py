"""Per-position encoding expansion + normalization plane.

Reference parity (SURVEY.md §2.6, §2.9):
- ``positional_onehot`` — the XMAP family (`_binary` feature.py:626-653,
  `_binary_6bit/5bit/3bit`, `_AESNN3`, `_ZScale`, `_BLOSUM62`,
  `_OPF_*`): token → fixed numeric vector per position. One parameterized
  operator instead of 20 copies; the encoding table is a broadcast literal
  map. Pure projection — no shuffle, stays in whole-stage codegen.
- ``property_channel`` — token → scalar property (the standardized channel
  the autocorrelation family consumes, feature.py:1433-1460 loader).
- ``zscore_norm`` — iAnalysis ZScore (feature.py:5041-5057): per-entity
  (x − mean) / stddev_samp via one window aggregate.
- ``minmax_norm`` — iAnalysis MinMax (feature.py:5059-5081):
  (x − min) / (max − min) per entity; constant channels → null (the
  reference divides by zero there; we define null and document it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_onehot(
    df: DataFrame, token_col: str, vocab: list[str], prefix: str = "oh_"
) -> DataFrame:
    """One indicator column per vocab token (unknown tokens → all zeros,
    the reference's '-' → zero-vector convention at feature.py:640-644)."""
    for t in vocab:
        df = df.withColumn(
            f"{prefix}{t}", F.when(F.col(token_col) == t, 1).otherwise(0)
        )
    return df


def property_channel(
    df: DataFrame, token_col: str, table: dict[str, float], out: str
) -> DataFrame:
    """Broadcast-literal map lookup token → float (AAIndex-style property
    channel, feature.py:1281-1333). Unknown tokens → null."""
    mapping = F.create_map(
        *[x for k, v in table.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    return df.withColumn(out, mapping[F.col(token_col)])


def zscore_norm(df: DataFrame, entity: str, col: str, out: str | None = None) -> DataFrame:
    w = Window.partitionBy(entity)
    mu = F.avg(col).over(w)
    sd = F.stddev_samp(col).over(w)
    return df.withColumn(
        out or f"{col}_z",
        F.when(sd > 0, (F.col(col) - mu) / sd),
    )


def minmax_norm(df: DataFrame, entity: str, col: str, out: str | None = None) -> DataFrame:
    w = Window.partitionBy(entity)
    lo = F.min(col).over(w)
    hi = F.max(col).over(w)
    return df.withColumn(
        out or f"{col}_mm",
        F.when(hi > lo, (F.col(col) - lo) / (hi - lo)),
    )


def mean_impute(df: DataFrame, entity: str, col: str, out: str | None = None) -> DataFrame:
    """The reference's MinMax preamble (feature.py:5063-5070): NaN cells are
    filled with the column mean before scaling. Per-entity channel analogue:
    null/NaN → mean over the entity's non-null values. The mean is computed
    as exact-decimal sum / count (NOT float avg) so the fill value is
    summation-order-independent — bit-identical across engines and across
    partition layouts (the repo-wide determinism convention, see
    autocorr.py). One window aggregate, no shuffle beyond the entity
    partition."""
    w = Window.partitionBy(entity)
    x = F.col(col)
    missing = x.isNull() | F.isnan(x)
    clean = F.when(~missing, x)
    mean = (
        F.sum(clean.cast("decimal(18,6)")).over(w).cast("double")
        / F.count(clean).over(w)
    )
    return df.withColumn(out or f"{col}_filled", F.when(missing, mean).otherwise(x))
