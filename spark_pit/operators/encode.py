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


def positional_multihot(
    df: DataFrame,
    token_col: str,
    groups: list[tuple[str, str]],
    prefix: str = "opf_",
) -> DataFrame:
    """OVERLAPPING-group multi-hot — the OPF family as ONE parameterized
    table op (_OPF_10bit feature.py:2386-2418, _OPF_7bit_type_1/2/3
    2425-2514; tables shipped in alphabets.OPF_TABLES): one indicator
    column per property group, and a token sets EVERY group it belongs to
    (unlike positional_onehot's disjoint vocab). Tokens in no group (the
    reference's '-' pad) get all zeros, exactly like the reference's
    ``if aa in j`` loop. Pure literal-isin projection — no shuffle, stays
    in whole-stage codegen."""
    cols = [
        F.when(F.col(token_col).isin(list(members)), 1)
        .otherwise(0).alias(f"{prefix}{name}")
        for name, members in groups
    ]
    return df.select("*", *cols)


def property_channels(
    df: DataFrame,
    token_col: str,
    tables: dict[str, dict[str, float]],
    out: str = "props",
) -> DataFrame:
    """AAIndex-style MULTI-property selection in ONE projection
    (feature.py:1281-1333: the reference reads data/AAindex.txt, keeps the
    user-selected property rows, and emits every selected property per
    position): ``tables`` is the runtime-selected {channel → token→value}
    manifest, and the output column is ``array<double>`` with one slot per
    channel in dict order — one pass over the tokens instead of N
    property_channel calls. Literal broadcast maps, no shuffle, stays in
    whole-stage codegen. Unknown tokens → null slots (the reference skips
    non-alphabet chars upstream)."""
    slots = [
        F.create_map(
            *[x for k, v in tbl.items() for x in (F.lit(k), F.lit(float(v)))]
        )[F.col(token_col)]
        for tbl in tables.values()
    ]
    return df.withColumn(out, F.array(*slots))
