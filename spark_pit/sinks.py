"""Export sinks (SURVEY.md §2.1: to_csv/to_tsv feature.py:3867-3881,
to_svm feature.py:3883-3894, to_arff feature.py:3896-3907, plus the parquet
embedding sink replacing the notebooks' per-id .pt files).

All writers stay distributed (df.write); ARFF needs a header block that
Spark's text sink can't prepend, so the header lands as a sidecar
``_arff_header`` file — a reader concatenates header + part files. The
reference materializes a single local file; at 100 TB a single file is not
an option, so directory-of-parts is the defined behavior."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def write_tsv(df: DataFrame, path: str, header: bool = True) -> None:
    write_csv(df, path, sep="\t", header=header)


def write_libsvm(df: DataFrame, path: str, label_col: str, vec_col: str) -> None:
    """libsvm `label i:val` lines (to_svm feature.py:3883-3894) via the
    built-in source; vec_col is array<numeric>."""
    from pyspark.ml.functions import array_to_vector

    out = df.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    out.write.mode("overwrite").format("libsvm").save(path)


def write_arff(df: DataFrame, path: str, relation: str = "spark_pit") -> None:
    """ARFF (to_arff feature.py:3896-3907): numeric attributes from the
    schema, data as comma rows. Header in `<path>/_arff_header`, data parts
    in `<path>/data/`."""
    cols = df.columns
    lines = [f"@relation {relation}", ""]
    for f_ in df.schema.fields:
        typ = "numeric" if f_.dataType.simpleString() in (
            "int", "bigint", "double", "float", "smallint", "tinyint", "decimal"
        ) else "string"
        lines.append(f"@attribute {f_.name} {typ}")
    lines += ["", "@data"]
    body = df.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("line")
    )
    body.write.mode("overwrite").text(os.path.join(path, "data"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_arff_header"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def write_embeddings(df: DataFrame, path: str, id_col: str, vec_col: str) -> None:
    """Embedding sink: one parquet dataset keyed by id with array<float>
    (replaces ESM_embed.ipynb's torch.save-per-id and the .npy matrix sinks
    — SURVEY.md §2.1 embedding sink rows)."""
    df.select(id_col, F.col(vec_col).cast("array<float>").alias(vec_col)).write.mode(
        "overwrite"
    ).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Catalog-bucketed parquet table — the co-located-join storage layout
    (SURVEY.md §4 / the 100 TB shuffle-minimization lever): two tables
    bucketed by the same key and count join/aggregate with ZERO exchange
    on that key; pre-sorting the buckets also drops the sort from
    sort-merge joins. The engine's own runtime bucketing (pmod(xxhash64))
    covers one job's internal shuffles; THIS persists the partitioning so
    every downstream job inherits it — the Spark answer to the "reuse a
    partitioning across stages" rule. tests/test_sinks_ingest proves the
    exchange-free plan."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
