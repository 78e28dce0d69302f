"""Salted skew handling: the time-chunked (salted) PIT path must be
bit-identical to the unsalted single-group cursor (north_rule: salted
repartitioning for hot image_ids; SURVEY.md §7 step 5)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_pit.operators.pit import pit_features_cursor
from spark_pit.operators.skew import hot_entities, pit_features_salted

VOCAB = ["view", "click", "purchase"]
EPOCH = dt.datetime(2024, 1, 1)


def _mk(spark, seed=7, n_hot=4000, n_cold=60):
    """One hot entity with a dense, NaN-pocked, session-gapped timeline plus
    a few cold entities; snapshots from the purchase events."""
    rng = np.random.default_rng(seed)
    rows = []
    t = 0.0
    for i in range(n_hot):
        # mix of sub-gap steps, exact-gap edges, and session breaks;
        # occasional sparse stretches so some time chunks hold 1 row
        step = rng.choice([5.0, 60.0, 1900.0, 90000.0], p=[0.6, 0.3, 0.08, 0.02])
        t += step
        rows.append(("hot", t, float(rng.normal()) if rng.random() > 0.15 else None,
                     VOCAB[int(rng.integers(0, 3))]))
    for e in range(3):
        tc = float(e) * 3.0
        for i in range(n_cold):
            tc += float(rng.choice([10.0, 2500.0], p=[0.8, 0.2]))
            rows.append((f"cold{e}", tc, float(rng.normal()) if rng.random() > 0.2 else None,
                         VOCAB[int(rng.integers(0, 3))]))
    pdf = pd.DataFrame(rows, columns=["user_id", "off", "value", "event_type"])
    pdf["ts"] = pdf["off"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    pdf["event_id"] = np.arange(len(pdf), dtype=np.int64)
    ev = spark.createDataFrame(pdf[["user_id", "ts", "value", "event_type", "event_id"]])
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    snaps = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("snapshot_ts"), F.col("event_id").alias("snapshot_id")
    )
    return ev, snaps


def _collect(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(["user_id", "ts"], kind="stable").reset_index(drop=True)


def _assert_same(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b)
    for col in a.columns:
        av, bv = a[col], b[col]
        if col == "wc":
            am = np.vstack(av.to_numpy())
            bm = np.vstack(bv.to_numpy())
            np.testing.assert_allclose(am, bm, rtol=1e-12, atol=1e-12, err_msg=col)
        elif av.dtype == object or str(av.dtype).startswith("datetime"):
            assert av.equals(bv), col
        else:
            np.testing.assert_allclose(
                av.to_numpy(dtype=np.float64),
                bv.to_numpy(dtype=np.float64),
                rtol=1e-12, atol=1e-12, equal_nan=True, err_msg=col,
            )


@pytest.mark.parametrize("chunk_seconds", [3600, 40000])
def test_salted_equals_unsalted_all_entities(spark, chunk_seconds):
    ev, snaps = _mk(spark)
    base = _collect(pit_features_cursor(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5,
    ))
    salted = _collect(pit_features_salted(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5, chunk_seconds=chunk_seconds,
    ))
    _assert_same(base, salted)


def test_hot_threshold_split_path(spark):
    ev, snaps = _mk(spark)
    hot = hot_entities(ev, "user_id", threshold=1000)
    assert hot == ["hot"]
    base = _collect(pit_features_cursor(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5,
    ))
    mixed = _collect(pit_features_salted(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5, chunk_seconds=7200, hot_threshold=1000,
    ))
    _assert_same(base, mixed)


def test_salted_fans_out_tasks(spark):
    """The salted plan must actually split the hot key across many groups."""
    ev, snaps = _mk(spark)
    from spark_pit.operators.skew import CHUNK
    from spark_pit.util import ts_us
    n_chunks = (
        ev.where(F.col("user_id") == "hot")
        .select(F.floor(ts_us("ts") / F.lit(3600 * 1_000_000)).alias(CHUNK))
        .distinct()
        .count()
    )
    assert n_chunks > 10


def test_morton_zorder_layout(spark):
    """Z-order: the interleave matches a bit-twiddling brute force, keys
    are unique when (x, y) are, and file ids are bounded + monotone in
    the key."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_pit.operators.skew import zorder_layout

    rows = [(i, (i * 37) % 65536, (i * 61) % 65536) for i in range(500)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "x", "y"]))
    out = zorder_layout(df, "x", "y", n_files=16, bits=16).toPandas()

    def brute(x, y):
        c = 0
        for i in range(16):
            c |= ((x >> i) & 1) << (2 * i)
            c |= ((y >> i) & 1) << (2 * i + 1)
        return c

    for _, r in out.iterrows():
        assert r["zorder_key"] == brute(int(r["x"]), int(r["y"]))
    assert out["file_id"].between(0, 15).all()
    s = out.sort_values("zorder_key")
    assert (s["file_id"].diff().dropna() >= 0).all()  # monotone buckets


def test_countmin_never_underestimates(spark):
    """CMS guarantee on an adversarial skewed key set: every estimate >=
    the exact count, the hot key's estimate is exact when its buckets are
    clean, and estimates are partitioning-invariant."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_pit.operators.skew import countmin_estimates

    keys = ["hot"] * 500 + [f"k{i}" for i in range(200)] * 2
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    est = countmin_estimates(df, "k", d=4, w=256).toPandas().set_index("k")
    exact = pd.Series(keys).value_counts()
    for k, n in exact.items():
        assert est.loc[k, "cm_est"] >= n, k
    # the hot key dominates: estimate within collision slack of exact
    assert est.loc["hot", "cm_est"] >= 500
    est2 = (
        countmin_estimates(df.repartition(7), "k", d=4, w=256)
        .toPandas().set_index("k")
    )
    assert (est["cm_est"].sort_index() == est2["cm_est"].sort_index()).all()


def test_countmin_detector_default_no_exact_groupby(spark, monkeypatch):
    """hot_detector defaults to "countmin": the exact full-key-space
    groupBy (hot_entities) must never run, detection must still find the
    hot key, and the routed output must equal the unsalted baseline."""
    import spark_pit.operators.skew as skew

    ev, snaps = _mk(spark)

    def boom(*a, **k):  # the exact detector is the thing we're replacing
        raise AssertionError("exact hot_entities called on the countmin path")

    monkeypatch.setattr(skew, "hot_entities", boom)
    base = _collect(pit_features_cursor(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5,
    ))
    mixed = _collect(skew.pit_features_salted(
        ev, snaps, "user_id", "ts", "value", "event_type", VOCAB,
        gap_seconds=1800, width=5, chunk_seconds=7200, hot_threshold=1000,
    ))
    _assert_same(base, mixed)


def test_countmin_detector_recall_and_sampled_plan(spark):
    """The CMS detector finds every truly hot key (never-underestimate +
    ~e^-50 sample miss probability), and its candidate scan is the
    SAMPLED plan (a Filter on the row hash), not a full-key distinct."""
    from spark_pit.operators.skew import hot_entities_countmin

    ev, _ = _mk(spark)
    hot = hot_entities_countmin(ev, "user_id", threshold=1000)
    assert hot == ["hot"]

    # threshold > oversample so the sample rate is real (denom=20): the
    # candidate branch must filter on the deterministic row hash before
    # any aggregate touches the key column.
    rate_denom = 1000 // 50
    row_hash = F.abs(F.xxhash64(*[F.col(c) for c in ev.columns]))
    cand = ev.where(row_hash % rate_denom == 0).select("user_id").distinct()
    # local-relation inputs get the filter constant-folded into the scan
    # (ConvertToLocalRelation), so assert on the analyzed plan where the
    # Filter node is still visible.
    plan = cand._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan and "Filter" in plan
    n_cand = cand.count()
    n_keys = ev.select("user_id").distinct().count()
    assert n_cand <= n_keys  # candidates never exceed the key space


def test_countmin_width_scales_with_data_not_constant(spark):
    """Round-5 regression (found at 51.2M rows): a FIXED sketch width has
    bias ~N/w, so past N ≈ w·threshold the detector flags EVERY key hot
    (767k false hots at sf0.1x512 — a 10-minute isin-routing hang). The
    effective width must grow with N/threshold so the bias stays at
    threshold/bias_factor."""
    from spark_pit.operators.skew import countmin_estimates, hot_entities_countmin

    # 1000 cold keys x 300 events (N=300k) + one hot key x 1200
    base = spark.range(300_000).select(
        (F.col("id") % 1000).cast("string").alias("k"),
        F.col("id").alias("payload"),
    )
    hot = spark.range(1200).select(
        F.lit("HOT").alias("k"), (F.col("id") + 1_000_000).alias("payload")
    )
    ev = base.unionByName(hot)

    # the OLD fixed-width behavior misfires: at w=1024 the per-row bias
    # (~294 expected) pushes cold 300-count keys past the 400 threshold
    # for whichever keys collide in all d rows (>10% of keys here; at the
    # production N/w ratios it was 100% of keys)
    est_fixed = countmin_estimates(ev.select("k"), "k", d=4, w=1024)
    n_fixed_hot = est_fixed.where(F.col("cm_est") > 400).count()
    assert n_fixed_hot > 100  # the failure mode this test pins

    # the autosized detector: exactly the one genuinely hot key
    got = hot_entities_countmin(ev, "k", threshold=400, w=1024)
    assert got == ["HOT"]


def test_countmin_detects_duplicate_row_hot_key(spark):
    """Regression (round-6 advice): a hot key made entirely of
    byte-identical replayed rows (the telemetry-dup scenario) must still
    be detected. Pre-fix the candidate sample hashed only column VALUES,
    so identical rows sampled all-or-none and the hot key was missed with
    probability ~(1 - 1/rate_denom) ~ 90% at defaults; post-fix each
    physical row samples independently (miss ~ e^-oversample)."""
    from spark_pit.operators.skew import hot_entities_countmin

    base = spark.range(100_000).select(
        (F.col("id") % 500).cast("string").alias("k"),
        F.col("id").alias("payload"),
    )
    # 2000 byte-identical rows for key DUP (same payload value every row)
    dup = spark.range(2000).select(
        F.lit("DUP").alias("k"), F.lit(-1).cast("long").alias("payload")
    )
    got = hot_entities_countmin(
        base.unionByName(dup), "k", threshold=500, w=8192
    )
    assert "DUP" in got
