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


def robust_quantiles(
    df: DataFrame, entity: str, col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-entity exact linear-interpolated quantiles — the robust-scaling
    statistics pass (median/IQR feature normalization). Cross-engine
    determinism: the value is first quantized to int64 nano-units
    (floor(x·1e9 + 0.5) — the repo's mean_shift/surface_depth_3d rule), so
    both engines interpolate h = p·(n−1) between exact-integer neighbors:
    with p in quarters the fractional part g is a tiny dyadic and
    (b−a)·g is exact in double; the final /1e9 + round(6) is the same
    single operation on both sides. One partial-agg shuffle on the entity
    key (Spark percentile = sort-based exact agg, map-side partials)."""
    nano = F.floor(F.col(col) * 1e9 + F.lit(0.5)).cast("long")
    q = F.percentile(nano, F.array(*[F.lit(p) for p in probs]))
    agg = df.groupBy(entity).agg(
        F.count(col).alias("n"), q.alias("__q")
    )
    sel = [F.col(entity), F.col("n")]
    for i, p in enumerate(probs):
        name = f"p{int(round(p * 100)):02d}"
        sel.append(F.round(F.col("__q")[i] / 1e9, 6).alias(name))
    return agg.select(*sel)


def quantile_bin_stats(
    df: DataFrame,
    entity: str,
    col: str,
    tiebreak: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-entity equal-frequency feature discretization (the quantile
    binning a gradient-boosting / feature-store pipeline applies before
    training) with the per-bin cut statistics needed to replay the same
    binning at serving time.

    Bins are NTILE(B) over (value asc, tiebreak asc) — the unique
    tiebreak makes the ranking total, and NTILE's remainder rule (the
    first N % B buckets get the extra row) is the same in Spark and
    ANSI SQL, so the assignment is engine-portable. Per (entity, bin):
    count and the min/max value in int64 nano-units (exact elements, no
    interpolation — the bin EDGES a server replays are these maxima).

    Plan: ONE exchange on the entity key; the NTILE window and the
    (entity, bin) agg share it (the agg key is a superset of the window
    partition key, so Catalyst reuses the sort/exchange).

    Returns (entity, bin, n, lo_nano, hi_nano)."""
    nano = F.floor(F.col(col) * 1e9 + F.lit(0.5)).cast("long")
    base = df.where(F.col(col).isNotNull()).select(
        F.col(entity), F.col(tiebreak).alias("__t"), nano.alias("__v")
    )
    w = Window.partitionBy(entity).orderBy(
        F.col("__v").asc(), F.col("__t").asc()
    )
    return (
        base.withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy(entity, "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__v").alias("lo_nano"),
            F.max("__v").alias("hi_nano"),
        )
    )


def winsorize_stats(
    df: DataFrame, entity: str, col: str, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Per-entity winsorized mean — outlier-robust feature aggregation.
    Bounds are RANK-BASED (the ceil(p·n)-th smallest value, no
    interpolation) so they are exact elements; clipping then happens in
    int64 nano-units and the winsorized mean is an exact-integer sum over
    count, rounded to 6 — bit-identical across engines and partition
    layouts regardless of summation order.

    Plan: one (entity, value) sort under a row_number window, a per-entity
    conditional min/max partial agg picks both bound elements in the SAME
    pass (no second shuffle: the agg key equals the window partition key,
    so Catalyst reuses the exchange), then the bounds join back onto the
    entity stream (broadcastable: one row per entity) for the clip+sum."""
    nano = F.floor(F.col(col) * 1e9 + F.lit(0.5)).cast("long")
    base = df.where(F.col(col).isNotNull()).select(
        F.col(entity), nano.alias("__v")
    )
    w = Window.partitionBy(entity).orderBy(F.col("__v").asc())
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(entity))
    )
    klo = F.greatest(F.ceil(F.lit(lo) * F.col("__n")), F.lit(1))
    khi = F.greatest(F.ceil(F.lit(hi) * F.col("__n")), F.lit(1))
    bounds = (
        ranked.groupBy(entity)
        .agg(
            F.max(F.when(F.col("__rn") == klo, F.col("__v"))).alias("__blo"),
            F.max(F.when(F.col("__rn") == khi, F.col("__v"))).alias("__bhi"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    clipped = base.join(bounds, entity).select(
        F.col(entity), F.col("n"), F.col("__blo"), F.col("__bhi"),
        F.greatest(F.col("__blo"), F.least(F.col("__bhi"), F.col("__v"))).alias("__c"),
    )
    return clipped.groupBy(entity).agg(
        F.first("n").alias("n"),
        F.round(F.first("__blo") / 1e9, 6).alias("lo_bound"),
        F.round(F.first("__bhi") / 1e9, 6).alias("hi_bound"),
        F.round(F.sum("__c") / F.first("n") / 1e9, 6).alias("winsorized_mean"),
    )


def mad_by_group(
    df: DataFrame,
    entity: str,
    col: str,
) -> DataFrame:
    """Per-entity median absolute deviation — the robust sigma that
    completes the robust-scaling family (robust_quantiles gives the
    median/IQR, winsorize_stats the clipped mean; MAD is the
    outlier-resistant spread the feature store publishes alongside).

    Both statistics are RANK-BASED exact elements (the ceil(n/2)-th
    smallest — the lower median — first of the int64 nano-quantized
    value, then of |value − median|): no interpolation, no floats, so
    the result is bit-identical across engines and partition layouts.

    Plan: the winsorize_stats shape — one (entity, value) rank window
    picks the median in a per-entity conditional agg (the agg key
    equals the window partition key, so Catalyst reuses the exchange),
    the one-row-per-entity median table joins back (broadcastable),
    and a second rank window over the deviation picks the MAD.

    Returns (entity, n, median_nano, mad_nano)."""
    nano = F.floor(F.col(col) * 1e9 + F.lit(0.5)).cast("long")
    base = df.where(F.col(col).isNotNull()).select(
        F.col(entity), nano.alias("__v")
    )
    w = Window.partitionBy(entity).orderBy(F.col("__v").asc())
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(entity))
    )
    kmed = F.ceil(F.col("__n") / 2)
    med = ranked.groupBy(entity).agg(
        F.max(F.when(F.col("__rn") == kmed, F.col("__v"))).alias("median_nano"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = base.join(med, entity).select(
        F.col(entity), F.col("n"), F.col("median_nano"),
        F.abs(F.col("__v") - F.col("median_nano")).alias("__d"),
    )
    wd = Window.partitionBy(entity).orderBy(F.col("__d").asc())
    kmad = F.ceil(F.col("n") / 2)
    return (
        dev.withColumn("__rd", F.row_number().over(wd))
        .groupBy(entity)
        .agg(
            F.first("n").cast("long").alias("n"),
            F.first("median_nano").alias("median_nano"),
            F.max(F.when(F.col("__rd") == kmad, F.col("__d"))).alias("mad_nano"),
        )
    )
