"""As-of join semantics: strict-vs-nonstrict ties, null matches, and the
equality of the window-plan and merge-cursor implementations; plus the
zero-temporal-leakage property the north rule requires."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_pit.operators.asof import asof_join_cursor, asof_join_window


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b", "c"],
                "ts": [_t(5), _t(10), _t(20), _t(10), _t(10)],
                "eid": [1, 2, 3, 4, 5],
            }
        ),
        schema="k string, ts timestamp_ntz, eid long",
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "sts": [_t(10), _t(15), _t(30)],
                "sid": [100, 101, 102],
            }
        ),
        schema="k string, sts timestamp_ntz, sid long",
    )
    return left, right


def _collect(df):
    return {r["eid"]: r["asof_sid"] for r in df.collect()}


@pytest.mark.parametrize("impl", [asof_join_window, asof_join_cursor])
def test_strict_excludes_equal_ts(tiny, impl):
    left, right = tiny
    out = impl(left, right, ["k"], "ts", "sts", ["sid"], strict=True, right_order="sid")
    got = _collect(out)
    # eid=2 at ts=10 must NOT see the sid=100 snapshot at ts=10 (leakage)
    assert got == {1: None, 2: None, 3: 101, 4: None, 5: None}


@pytest.mark.parametrize("impl", [asof_join_window, asof_join_cursor])
def test_nonstrict_includes_equal_ts(tiny, impl):
    left, right = tiny
    out = impl(left, right, ["k"], "ts", "sts", ["sid"], strict=False, right_order="sid")
    got = _collect(out)
    assert got == {1: None, 2: 100, 3: 101, 4: None, 5: None}


def test_window_and_cursor_agree_on_real_data(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    snaps = ev.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts as snapshot_ts", "event_id as snapshot_id", "value as snap_value"
    )
    kw = dict(
        on=["user_id"], left_ts="ts", right_ts="snapshot_ts",
        value_cols=["snapshot_id", "snap_value"], strict=True, right_order="snapshot_id",
    )
    a = (
        asof_join_window(ev, snaps, **kw)
        .orderBy("event_id")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        asof_join_cursor(ev, snaps, **kw)
        .orderBy("event_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == ev.count()
    for c in ["asof_snapshot_id", "asof_snap_value", "asof_ts"]:
        pd.testing.assert_series_equal(a[c], b[c], check_dtype=False)


def test_zero_temporal_leakage(spark, sf_dir):
    """Perturb all snapshots after time T; features at events <= T must be
    bit-identical (BASELINE.json north_rule leakage clause)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    snaps = ev.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts as snapshot_ts", "event_id as snapshot_id", "value as snap_value"
    )
    cutoff = "2024-01-15 00:00:00"
    perturbed = snaps.withColumn(
        "snap_value",
        F.when(F.col("snapshot_ts") > cutoff, F.col("snap_value") * -999.0).otherwise(
            F.col("snap_value")
        ),
    )
    kw = dict(
        on=["user_id"], left_ts="ts", right_ts="snapshot_ts",
        value_cols=["snap_value"], strict=True, right_order="snapshot_id",
    )
    base = (
        asof_join_window(ev, snaps, **kw)
        .where(F.col("ts") <= cutoff)
        .orderBy("event_id")
        .toPandas()
    )
    pert = (
        asof_join_window(ev, perturbed, **kw)
        .where(F.col("ts") <= cutoff)
        .orderBy("event_id")
        .toPandas()
    )
    a = base["asof_snap_value"].to_numpy(dtype=float)
    b = pert["asof_snap_value"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
