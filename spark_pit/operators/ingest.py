"""Ingest-side utilities (SURVEY.md §2.1).

- ``equal_length_stats`` — `sequence_with_equal_length` (feature.py:115-131):
  global min/max/distinct-count of per-entity timeline lengths + the
  equal-length flag the per-position descriptors gate on.
- ``zip_index_join`` — `add_samples_label` (feature.py:426-430): positional
  join of a label table onto samples. Spark has no positional join;
  the idiomatic re-expression is rank-align: row_number over an explicit
  deterministic order on both sides, then an equi-join on the rank.
- ``infer_stream_type`` — `check_sequence_type` (feature.py:133-162):
  sample-based alphabet classification (the reference samples <= 100
  sequences); driver-side decision over a bounded sample, like
  spark.read.json schema inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def read_fasta(spark, path: str) -> DataFrame:
    """Distributed FASTA reader — the reference's entry point
    (`read_fasta`, feature.py:75-113: parses '>name|label|training' headers,
    uppercases the sequence, strips whitespace). Spark-first shape:
    ``spark.read.text(lineSep='>')`` splits the file into one ROW PER
    RECORD at the '>' delimiter, so multi-line sequences never straddle row
    boundaries and the parse is pure column expressions (no UDF, no
    wholeTextFiles driver funnel). Splittable/compressed inputs and
    multi-file globs come free from the text source.

    Returns (name, label, training, sequence); label defaults to '0' and
    training to true when the header carries no '|' fields, mirroring the
    reference's defaults (feature.py:96-103)."""
    raw = spark.read.text(path, lineSep=">")
    rec = raw.where(F.length(F.trim(F.col("value"))) > 0)
    # F.get (not getItem): missing header fields are NULL, not an ANSI
    # out-of-bounds error
    header = F.get(F.split(F.col("value"), "\n", 2), 0)
    body = F.get(F.split(F.col("value"), "\n", 2), 1)
    fields = F.split(header, r"\|")
    return rec.select(
        F.trim(F.get(fields, 0)).alias("name"),
        F.coalesce(F.trim(F.get(fields, 1)), F.lit("0")).alias("label"),
        F.coalesce(F.trim(F.get(fields, 2)) == "training", F.lit(True)).alias(
            "training"
        ),
        F.upper(F.regexp_replace(F.coalesce(body, F.lit("")), r"\s", "")).alias(
            "sequence"
        ),
    ).where(F.length("sequence") > 0)


def equal_length_stats(df: DataFrame, entity: str) -> DataFrame:
    lens = df.groupBy(entity).agg(F.count(F.lit(1)).alias("__n"))
    return lens.agg(
        F.min("__n").alias("min_len"),
        F.max("__n").alias("max_len"),
        F.countDistinct("__n").alias("distinct_lens"),
        (F.countDistinct("__n") == 1).alias("equal_length"),
    )


def zip_index_join(
    left: DataFrame,
    right: DataFrame,
    left_order: str,
    right_order: str,
) -> DataFrame:
    """Positional join: i-th row of left (by left_order) gets the i-th row
    of right (by right_order). Inner on the shared rank.

    The global row_number is semantically REQUIRED (the reference's
    add_samples_label zips a sequence file with a label file by line
    position — a total order, feature.py:64-77) and is the one deliberate
    global window in the repo: its use case is label metadata, far below
    data scale. If both sides ever were 100 TB-shaped, the same contract
    is implementable shuffle-free as a two-pass per-partition offset
    prefix sum (count rows per partition, broadcast cumulative offsets,
    add partition-local positions) — kept out because the window form is
    bit-exact against the SQL oracle and the small-side case is real."""
    lw = Window.orderBy(left_order)
    rw = Window.orderBy(right_order)
    lr = left.withColumn("__rank", F.row_number().over(lw))
    rr = right.withColumn("__rank", F.row_number().over(rw))
    return lr.join(rr, "__rank").drop("__rank")


def infer_stream_type(
    df: DataFrame,
    token_col: str,
    known_vocabs: dict[str, set[str]],
    sample_rows: int = 100,
) -> str:
    """Classify the token alphabet from a bounded sample (reference samples
    <=100 sequences, feature.py:137). Returns the first vocab name whose set
    covers every sampled token, else 'unknown'."""
    sampled = [
        r[0] for r in df.select(token_col).dropna().limit(sample_rows).collect()
    ]
    toks = set(sampled)
    for name, vocab in known_vocabs.items():
        if toks <= vocab:
            return name
    return "unknown"


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "s1",
) -> DataFrame:
    """Deterministic hash-threshold sampling — the training-data sampling
    primitive (reproducible across runs, partitionings, AND engines,
    unlike ``df.sample`` whose output depends on partition layout): keep a
    row iff md5(id || salt) mod 10^6 < fraction·10^6. The md5-fold is the
    repo's portable-hash convention (textstats.tok_hash), so a DuckDB
    oracle selects the exact same rows. Changing ``salt`` draws an
    independent sample; complements (train/holdout) come free from the
    threshold split."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
            16, 10,
        ).cast("long")
        % 1_000_000
    )
    return df.where(bucket < int(fraction * 1_000_000))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing for training
    corpora): each stratum keeps its own hash-threshold fraction; strata
    absent from ``fractions`` keep ``default_fraction``. Same portable-hash
    row selection as :func:`deterministic_sample` — fully oracle-able, no
    shuffle (a scan-side filter; Catalyst pushes the strata disjuncts)."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
            16, 10,
        ).cast("long")
        % 1_000_000
    )
    thresh = F.lit(int(default_fraction * 1_000_000))
    for k, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col).cast("string") == k, F.lit(int(frac * 1_000_000))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def temperature_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    salt: str = "t1",
) -> DataFrame:
    """Temperature-based domain rebalancing — the standard pretraining
    data-mixing pass (multilingual/domain alpha-sampling): groups are
    downsampled toward proportions ∝ count^alpha, keeping the smallest
    group intact. Per-group keep fraction f_g = (c_min / c_g)^(1-alpha):
    alpha=1 keeps everything, alpha=0 equalizes every group down to the
    smallest. Row selection is the repo's deterministic md5-fold threshold
    (engine- and partitioning-independent; same convention as
    :func:`deterministic_sample`).

    Scale: one partial-agg shuffle over the group key produces the
    (tiny, one-row-per-domain) weight table, broadcast back onto the
    scan — the corpus itself is never re-shuffled. alpha=0.5 computes
    f_g via sqrt, which is IEEE-correctly-rounded in both Spark and
    DuckDB, so thresholds are bit-identical cross-engine; other alphas
    go through pow (documented: pow may differ by 1 ulp across libm
    implementations, so oracle thresholds could flip a boundary row).
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    w = counts.crossJoin(F.broadcast(cmin))
    ratio = F.col("__cmin").cast("double") / F.col("__c")
    if alpha == 1.0:
        frac = F.lit(1.0)
    elif alpha == 0.5:
        frac = F.sqrt(ratio)
    else:
        frac = F.pow(ratio, 1.0 - alpha)
    w = w.select(
        group_col,
        F.floor(frac * 1_000_000).cast("long").alias("__thresh"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % 1_000_000
    )
    return (
        df.join(F.broadcast(w), group_col)
        .where(bucket < F.col("__thresh"))
        .drop("__thresh")
    )
