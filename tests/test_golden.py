"""Golden feature-table fixtures (north rule): the image-table flagship must
reproduce tests/golden/image_pit.parquet via numpy allclose, plus the
explicit zero-temporal-leakage check on the same pipeline."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "image_pit.parquet")


@pytest.fixture(scope="module")
def engine_out(spark):
    import tools.make_golden as mg

    return (
        mg.build(spark)
        .orderBy("image_id", "event_ts", "fmt", "phash_pop", "caption_len", "aspect")
        .toPandas().reset_index(drop=True)
    )


def test_matches_golden_allclose(engine_out):
    golden = pd.read_parquet(GOLDEN)
    assert list(golden.columns) == list(engine_out.columns)
    assert len(golden) == len(engine_out)
    for c in golden.columns:
        g, e = golden[c], engine_out[c]
        if c == "wc":
            np.testing.assert_allclose(
                np.vstack(g.to_numpy()), np.vstack(e.to_numpy()),
                rtol=1e-9, atol=1e-12, err_msg=c,
            )
        elif g.dtype.kind == "f":
            np.testing.assert_allclose(
                g.to_numpy(dtype=float), e.to_numpy(dtype=float),
                rtol=1e-9, atol=1e-12, equal_nan=True, err_msg=c,
            )
        else:
            assert g.astype(str).equals(e.astype(str)), c


def test_zero_temporal_leakage_image_pipeline(spark):
    """Perturb every event and snapshot strictly after a cut timestamp;
    features at or before the cut must be bit-identical (north rule:
    'zero temporal leakage')."""
    from spark_pit.datagen import images_table, snapshots_table
    from spark_pit.pipeline import image_pit_features

    images = images_table(spark, n_entities=20, n_rows=400, seed=7)
    snaps = snapshots_table(spark, n_entities=20, snaps_per_entity=6, seed=7)
    cut = images.agg(F.expr("percentile(unix_micros(cast(event_ts as timestamp_ltz)), 0.6)")).first()[0]
    cut_expr = F.unix_micros(F.col("event_ts").cast("timestamp_ltz")) <= F.lit(int(cut))
    snap_cut = F.unix_micros(F.col("snapshot_ts").cast("timestamp_ltz")) <= F.lit(int(cut))

    base = image_pit_features(images, snaps, num_buckets=4)
    # perturbation: drop all post-cut rows entirely (the strongest change)
    pert = image_pit_features(
        images.where(cut_expr), snaps.where(snap_cut), num_buckets=4
    )

    keep_cols = [c for c in base.columns if c not in ("lead1_phash_pop",)]
    a = (
        base.where(cut_expr).select(keep_cols)
        .orderBy("image_id", "event_ts", "fmt", "phash_pop", "caption_len", "aspect")
        .toPandas().reset_index(drop=True)
    )
    b = (
        pert.select(keep_cols)
        .orderBy("image_id", "event_ts", "fmt", "phash_pop", "caption_len", "aspect")
        .toPandas().reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in keep_cols:
        if c == "wc":
            np.testing.assert_allclose(
                np.vstack(a[c].to_numpy()), np.vstack(b[c].to_numpy()), err_msg=c
            )
        elif a[c].dtype.kind == "f":
            np.testing.assert_allclose(
                a[c].to_numpy(float), b[c].to_numpy(float), equal_nan=True, err_msg=c
            )
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), c
