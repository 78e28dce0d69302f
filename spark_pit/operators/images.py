"""Multimodal (image) payload operators.

The Spark-side plumbing is the point (schema, Arrow batching, partition
hygiene): binary payloads stream executor-side through mapInPandas in Arrow
batches; the `bytes` column is consumed HERE and never survives into any
shuffle (SURVEY.md §7 hard-point 3 — project it away, join stats back by key).

Decoding uses the self-contained codecs (spark_pit.codecs). In production
the decode call is the only line that changes (swap for libjpeg/Pillow);
batch shape, schema, and plan stay identical. Analogue of the reference's
embedding-notebook batching (SURVEY.md §2.10): model-per-executor becomes
codec-per-executor, token budget becomes Arrow maxRecordsPerBatch.

phash-derived features are pure JVM expressions (bit_count, shifts) — the
numeric lag/autocorrelation channels of the north rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pit.codecs import decode_image

DECODE_STATS_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "mean_r double, mean_g double, mean_b double, std_gray double, decode_ok boolean"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image channel means + gray std from the decoded pixels.

    mapInPandas (iterator form): the codec table is bound once per Python
    worker; each Arrow batch of (id, fmt, bytes) yields one stats batch.
    Output carries no binary — downstream shuffles stay light.
    """
    cols = images.select("image_id", "fmt", "w", "h", "bytes")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "w": batch["w"],
                "h": batch["h"],
            }
            mr, mg, mb, sg, ok = [], [], [], [], []
            for data, fmt in zip(batch["bytes"], batch["fmt"]):
                try:
                    img = decode_image(bytes(data), fmt).astype(np.float64)
                    means = img.mean(axis=(0, 1))
                    mr.append(means[0]); mg.append(means[1]); mb.append(means[2])
                    sg.append(float(img.mean(axis=2).std()))
                    ok.append(True)
                except Exception:
                    mr.append(np.nan); mg.append(np.nan); mb.append(np.nan)
                    sg.append(np.nan); ok.append(False)
            out.update(
                mean_r=np.round(mr, 6), mean_g=np.round(mg, 6),
                mean_b=np.round(mb, 6), std_gray=np.round(sg, 6), decode_ok=ok,
            )
            yield pd.DataFrame(out)

    return cols.mapInPandas(extract, schema=DECODE_STATS_SCHEMA)


def phash_features(images: DataFrame, id_col: str = "image_id", phash_col: str = "phash") -> DataFrame:
    """phash-derived numeric channels (JVM-only): bit population count,
    per-nibble values (16 long-format rows per image), and the top/bottom
    half hamming asymmetry. These feed the autocorrelation family as the
    numeric per-event channels (SURVEY.md §2.5 mapping)."""
    p = F.col(phash_col)
    base = images.select(
        F.col(id_col),
        p.alias("phash"),
        F.bit_count(p).alias("popcount"),
        F.bit_count(p.bitwiseAND(F.lit(0xFFFFFFFF))).alias("pop_lo32"),
    ).withColumn("pop_hi32", F.col("popcount") - F.col("pop_lo32"))
    return base


def phash_nibbles(images: DataFrame, id_col: str = "image_id", phash_col: str = "phash") -> DataFrame:
    """Long-format nibble expansion: (id, nibble_idx 0..15, nibble 0..15).
    posexplode of a transform — the XMAP per-position-encoding shape
    (SURVEY.md §2.6) applied to the hash axis."""
    nibbles = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.shiftright(F.col(phash_col), (i * 4).cast("int")).bitwiseAND(F.lit(15)),
    )
    return images.select(
        F.col(id_col), F.posexplode(nibbles).alias("nibble_idx", "nibble")
    )


def fidelity_check(images: DataFrame) -> DataFrame:
    """Decode → re-encode → byte-compare for lossless formats; decode-ok +
    idempotent re-encode for the lossy stand-in. The PSNR-vs-original gate
    lives in tests (original pixels known there); at pipeline level this is
    the per-row integrity audit written to the manifest."""
    cols = images.select("image_id", "fmt", "bytes")

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_pit.codecs import encode_image

        for batch in batches:
            ids, fmts, ok, exact = [], [], [], []
            for image_id, fmt, data in zip(batch["image_id"], batch["fmt"], batch["bytes"]):
                ids.append(image_id)
                fmts.append(fmt)
                try:
                    img = decode_image(bytes(data), fmt)
                    re = encode_image(img, fmt)
                    ok.append(True)
                    # lossless must round-trip exactly; the lossy stand-in is
                    # quantization-idempotent so it round-trips exactly too
                    exact.append(re == bytes(data))
                except Exception:
                    ok.append(False)
                    exact.append(False)
            yield pd.DataFrame(
                {"image_id": ids, "fmt": fmts, "decode_ok": ok, "reencode_exact": exact}
            )

    return cols.mapInPandas(
        check, schema="image_id string, fmt string, decode_ok boolean, reencode_exact boolean"
    )
