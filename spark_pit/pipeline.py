"""The north-rule flagship composed end-to-end over the image+caption table
(input_hint schema: image_id, bytes, w, h, fmt, caption, phash + event_ts).

Channel derivation happens BEFORE any shuffle and projects `bytes` away
(SURVEY.md §7 hard point 3: the ~MB-scale binary column must never ride an
exchange; Catalyst column pruning then keeps it out of the scan entirely —
verified by tools/explain_audit.py ReadSchema):

- phash_pop   = popcount(phash)            (pHash-derived numeric, JVM bit_count)
- caption_len = length(caption)            (caption feature)
- aspect      = w / h                      (shape stat)
- fmt         = the token channel

The fused bucketed PIT kernel then emits leakage-free as-of matches,
lag/lead, session ids, backfill, rolling mean and trailing fmt-composition
per (image_id, event_ts). Golden-fixture parity for this exact pipeline is
pinned in tests/golden/ (north rule: "golden feature-table fixtures").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pit.operators.pit import pit_features_bucketed

FMT_VOCAB = ["gif", "jpeg", "png", "webp"]


def image_channels(images: DataFrame, with_pixel_stats: bool = False) -> DataFrame:
    """Derive numeric/token channels; `bytes` is pruned here, pre-shuffle.

    ``with_pixel_stats=True`` additionally decodes the payload executor-side
    (iterator mapInPandas, Arrow-batched) and emits mean luminance + gray
    std — the decode happens BEFORE any exchange, so the binary column
    never rides a shuffle either way."""
    if not with_pixel_stats:
        return images.select(
            "image_id",
            "event_ts",
            F.bit_count("phash").cast("double").alias("phash_pop"),
            F.length("caption").cast("double").alias("caption_len"),
            (F.col("w") / F.col("h")).alias("aspect"),
            "fmt",
        )

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    schema = (
        "image_id string, event_ts timestamp_ntz, phash_pop double, "
        "caption_len double, aspect double, fmt string, "
        "mean_lum double, std_gray double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_pit.codecs import decode_image

        for b in batches:
            lum, sg = [], []
            for data, fmt in zip(b["bytes"], b["fmt"]):
                try:
                    img = decode_image(bytes(data), fmt).astype(np.float64)
                    lum.append(float(img.mean()))
                    sg.append(float(img.mean(axis=2).std()))
                except Exception:
                    lum.append(np.nan)
                    sg.append(np.nan)
            yield pd.DataFrame(
                {
                    "image_id": b["image_id"],
                    "event_ts": b["event_ts"],
                    "phash_pop": np.array(
                        [bin(int(p) & ((1 << 64) - 1)).count("1") for p in b["phash"]],
                        dtype=np.float64,
                    ),
                    "caption_len": b["caption"].str.len().astype(float),
                    "aspect": b["w"].astype(float) / b["h"].astype(float),
                    "fmt": b["fmt"],
                    "mean_lum": np.round(lum, 6),
                    "std_gray": np.round(sg, 6),
                }
            )

    return images.select(
        "image_id", "event_ts", "bytes", "w", "h", "fmt", "caption", "phash"
    ).mapInPandas(extract, schema=schema)


def image_pit_features(
    images: DataFrame,
    snapshots: DataFrame,
    gap_seconds: int = 7200,
    width: int = 5,
    num_buckets: int = 64,
    hot_threshold: int | None = None,
    chunk_seconds: int = 86400,
    with_pixel_stats: bool = False,
) -> DataFrame:
    """Per (image_id, event_ts): as-of snapshot match + windowed features on
    the phash channel + trailing fmt composition, plus the caption/aspect
    channels carried through.

    ``hot_threshold`` routes image_ids with more events than the threshold
    through the salted time-chunk path (north_rule: "Skew on hot image_ids
    is broken via salted repartitioning") — output identical either way
    (tests/test_skew equivalence + the shared golden fixture).

    ``num_buckets`` sizing: target ~50k-row pandas buckets at the job's
    DATA scale (rows/50k), never a core multiple — core-derived counts
    produce few large buckets whose last scheduling wave idles most of an
    executor's cores behind one straggler (round-5 measurement, BENCH.md:
    32→128 buckets on 6.4M rows took the 8-core kernel from 640k to 796k
    rows/s and the 2→8 equal-pressure scaling from 0.74 to 0.86–0.94).
    Buckets ≫ total cores is the invariant; at 100 TB that's ~2M buckets,
    which AQE schedules without issue."""
    ch = image_channels(images, with_pixel_stats=with_pixel_stats)
    snaps = snapshots.select("image_id", "snapshot_ts", "snapshot_id")
    extra_cols = ["caption_len", "aspect"] + (
        ["mean_lum", "std_gray"] if with_pixel_stats else []
    )
    if hot_threshold is not None:
        from pyspark.sql import Window

        from spark_pit.operators.skew import pit_features_salted

        # the salted path needs ONE unique per-entity key for the extras
        # join, so it materializes a row_number uid; (image_id, event_ts)
        # is NOT unique (the generator deliberately emits timestamp
        # collisions for as-of tie tests)
        uid_w = Window.partitionBy("image_id").orderBy(
            "event_ts", "fmt", "phash_pop", "caption_len", "aspect"
        )
        ch = ch.withColumn("uid", F.row_number().over(uid_w))
        fused = pit_features_salted(
            ch, snaps,
            entity="image_id", ts="event_ts",
            numeric_col="phash_pop", token_col="fmt", vocab=FMT_VOCAB,
            gap_seconds=gap_seconds, width=width,
            chunk_seconds=chunk_seconds, hot_threshold=hot_threshold,
            tiebreak="uid",
        )
        extra = ch.select("image_id", "uid", *extra_cols)
        return fused.join(extra, ["image_id", "uid"]).drop("uid")
    # bucketed path: extra channels ride through the kernel (passthrough,
    # no extras join) and the deterministic tiebreak is the channel columns
    # THEMSELVES — same total order a row_number uid would give, without the
    # extra per-entity sort exchange the uid window used to cost
    fused = pit_features_bucketed(
        ch, snaps,
        entity="image_id", ts="event_ts",
        numeric_col="phash_pop", token_col="fmt", vocab=FMT_VOCAB,
        gap_seconds=gap_seconds, width=width, num_buckets=num_buckets,
        tiebreak=["fmt", "phash_pop", "caption_len", "aspect"],
        passthrough=extra_cols,
    )
    return fused
