"""Bucketed (segment-vectorized) fused kernel == per-entity cursor."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_pit.operators.pit import pit_features_bucketed, pit_features_cursor

VOCAB = ["click", "error", "purchase", "signup", "view"]


def _frames(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    snaps = ev.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts as snapshot_ts", "event_id as snapshot_id"
    )
    return ev, snaps


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    a = a.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    b = b.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        if c == "wc":
            np.testing.assert_allclose(
                np.vstack(a[c].to_numpy()), np.vstack(b[c].to_numpy()),
                rtol=1e-12, atol=1e-12, err_msg=c,
            )
        elif a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
                rtol=1e-12, atol=1e-12, equal_nan=True, err_msg=c,
            )
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), c


def test_bucketed_equals_cursor(spark, sf_dir):
    ev, snaps = _frames(spark, sf_dir)
    kw = dict(
        entity="user_id", ts="ts", numeric_col="value",
        token_col="event_type", vocab=VOCAB, gap_seconds=1800, width=5,
        tiebreak="event_id",
    )
    a = pit_features_cursor(ev, snaps, **kw).toPandas()
    b = pit_features_bucketed(ev, snaps, num_buckets=7, **kw).toPandas()
    _cmp(a, b)


def test_bucketed_single_bucket(spark, sf_dir):
    """Degenerate bucket count: every entity in one pandas batch."""
    ev, snaps = _frames(spark, sf_dir)
    kw = dict(
        entity="user_id", ts="ts", numeric_col="value",
        token_col="event_type", vocab=VOCAB, gap_seconds=1800, width=5,
        tiebreak="event_id",
    )
    a = pit_features_cursor(ev, snaps, **kw).toPandas()
    b = pit_features_bucketed(ev, snaps, num_buckets=1, **kw).toPandas()
    _cmp(a, b)


def test_bucketed_no_snapshots(spark, sf_dir):
    ev, _ = _frames(spark, sf_dir)
    empty = ev.where("1=0").selectExpr(
        "user_id", "ts as snapshot_ts", "event_id as snapshot_id"
    )
    out = pit_features_bucketed(
        ev, empty, entity="user_id", ts="ts", numeric_col="value",
        token_col="event_type", vocab=VOCAB, num_buckets=4,
    ).toPandas()
    assert out["asof_snapshot_id"].isna().all()
    assert len(out) == ev.count()
