"""Structured Streaming surface: session windows + custom stateful operator
over a file source with Trigger.AvailableNow, compared against batch."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_pit.catalog import iceberg_available, read_table
from spark_pit.streaming import streaming_pit_features, streaming_session_stats


def _stream_events(spark, sf_dir):
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}")  # directory containing events.parquet
        .where(F.col("event_id").isNotNull())
        .select("user_id", F.col("ts").cast("timestamp_ltz").alias("ts"), "value", "event_id")
    )


def _run_available_now(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name == "pitstate" else "append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_session_stats_matches_batch(spark, sf_dir, tmp_path):
    # stream side (append mode emits only watermark-closed sessions; with
    # AvailableNow over finite data the final watermark closes everything
    # except the tail sessions — compare on the common set)
    stream = streaming_session_stats(
        _stream_events(spark, sf_dir), "user_id", "ts", "value", gap="30 minutes"
    )
    _run_available_now(stream, tmp_path, "sessions")
    got = spark.sql("select * from sessions").toPandas()
    assert len(got) > 0
    # batch twin
    from spark_pit.operators.windows import with_session_id

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp_ltz").alias("ts"), "value", "event_id"
    )
    batch = (
        with_session_id(ev, "user_id", "ts", 1800, tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    bkey = {(r.user_id, r.n_events) for r in batch.itertuples()}
    # every streamed session must exist in the batch result with same size
    matched = sum(1 for r in got.itertuples() if (r.user_id, r.n_events) in bkey)
    assert matched >= 0.9 * len(got)


def test_streaming_stateful_backfill(spark, sf_dir, tmp_path):
    feats = streaming_pit_features(
        _stream_events(spark, sf_dir), "user_id", "ts", "value"
    )
    _run_available_now(feats, tmp_path, "pitstate")
    got = spark.sql("select * from pitstate").toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(got) == n_events
    # running_count per entity is a permutation of 1..n
    for _, g in got.groupby("user_id"):
        rc = np.sort(g["running_count"].to_numpy())
        assert (rc == np.arange(1, len(g) + 1)).all()


def test_streaming_asof_matches_batch(spark, sf_dir, tmp_path):
    """The stateful streaming as-of join must reproduce the batch
    strictly-before join exactly (AvailableNow over one file = ordered
    arrival, the documented correctness regime)."""
    from spark_pit.operators.asof import asof_join_window
    from spark_pit.streaming import streaming_asof_features

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}")  # directory scan picks up sibling tables
        .where(F.col("event_id").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ltz").alias("ts"),
            "event_id",
            (F.col("event_type") == "purchase").alias("is_snap"),
            F.when(F.col("event_type") == "purchase", F.col("event_id"))
            .alias("snapshot_id"),
        )
    )
    out = streaming_asof_features(raw, "user_id", "ts")
    q = (
        out.writeStream.format("memory").queryName("asofstate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_asof"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from asofstate").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    snaps = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("snapshot_ts"),
        F.col("event_id").alias("snapshot_id"),
    )
    events = ev.where(F.col("event_type") != "purchase").select("event_id", "user_id", "ts")
    want = (
        asof_join_window(
            events, snaps, ["user_id"], "ts", "snapshot_ts",
            ["snapshot_id"], strict=True, right_order="snapshot_id",
        )
        .select("event_id", F.col("asof_snapshot_id"))
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    # streaming emits only non-snapshot events
    assert len(got) == len(want)
    ga = got["asof_snapshot_id"].astype("Int64")
    wa = want["asof_snapshot_id"].astype("Int64")
    assert (ga.isna() == wa.isna()).all()
    assert (ga.dropna().to_numpy() == wa.dropna().to_numpy()).all()


def test_catalog_parquet_fallback(spark, sf_dir):
    assert not iceberg_available(spark)
    df = read_table(spark, f"{sf_dir}/events.parquet")
    assert df.count() > 0
    import pytest

    with pytest.raises(ValueError):
        read_table(spark, f"{sf_dir}/events.parquet", snapshot_id=1)


def test_streaming_dedup_drops_replayed_rows(spark, sf_dir, tmp_path):
    """A self-unioned stream (every event delivered twice) dedups back to
    the batch-distinct row set on the event_id key."""
    from spark_pit.streaming import streaming_dedup

    src = _stream_events(spark, sf_dir)
    doubled = src.union(_stream_events(spark, sf_dir))
    out = streaming_dedup(doubled, ["event_id"], "ts", watermark="1 hour")
    _run_available_now(out, tmp_path, "dedup")
    got = spark.sql("select * from dedup").toPandas()
    n_batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").distinct().count()
    )
    assert len(got) == n_batch
    assert got["event_id"].is_unique


def test_streaming_content_dedup(spark, sf_dir, tmp_path):
    """Same-text rows collapse to one arrival; the helper hash column does
    not leak into the output schema."""
    from spark_pit.streaming import streaming_content_dedup

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}")
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", "text",
                F.lit("2024-01-01 00:00:00").cast("timestamp_ltz").alias("ts"))
    )
    out = streaming_content_dedup(docs, "text", "ts", watermark="1 hour")
    _run_available_now(out, tmp_path, "cdedup")
    got = spark.sql("select * from cdedup").toPandas()
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text").distinct().count()
    )
    assert len(got) == n_distinct
    assert set(got.columns) == {"doc_id", "text", "ts"}


def test_streaming_asof_entity_with_no_snapshots(spark, tmp_path):
    """Regression (round-4 advice, streaming.py:126): an entity whose first
    micro-batch contains events but ZERO snapshots (and no carried state)
    must yield all-NA matches, not IndexError on the empty snapshot array."""
    from spark_pit.streaming import streaming_asof_features

    src_dir = tmp_path / "src"
    pdf = pd.DataFrame(
        {
            "user_id": ["nosnap", "nosnap", "hassnap", "hassnap"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:01", "2024-01-01 00:02",
                 "2024-01-01 00:01", "2024-01-01 00:02"]
            ),
            "event_id": [1, 2, 3, 4],
            "is_snap": [False, False, True, False],
            "snapshot_id": pd.array([pd.NA, pd.NA, 99, pd.NA], dtype="Int64"),
        }
    )
    df = spark.createDataFrame(pdf).select(
        "user_id", F.col("ts").cast("timestamp_ltz").alias("ts"),
        "event_id", "is_snap", F.col("snapshot_id").cast("long").alias("snapshot_id"),
    )
    df.write.parquet(str(src_dir))
    raw = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = streaming_asof_features(raw, "user_id", "ts")
    q = (
        out.writeStream.format("memory").queryName("asofempty")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_asofempty"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from asofempty").toPandas().set_index("event_id")
    # entity with no snapshot at all: both events unmatched (and no crash)
    assert pd.isna(got.loc[1, "asof_snapshot_id"])
    assert pd.isna(got.loc[2, "asof_snapshot_id"])
    # sibling entity unaffected: event after the snapshot matches it
    assert got.loc[4, "asof_snapshot_id"] == 99


def test_streaming_decayed_features_matches_batch(spark, sf_dir, tmp_path):
    """The stateful streaming decay operator must reproduce the batch
    decayed_features doubles BIT-exactly (power-of-two weights make both
    sides exact, so == not approx), including across micro-batch splits
    that land inside a half-life bucket."""
    from spark_pit.operators.windows import decayed_features
    from spark_pit.streaming import streaming_decayed_features

    src = _stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        F.pmod(F.floor(F.col("value") * 8).cast("long"), F.lit(1024)).alias("vq"),
    )
    out = streaming_decayed_features(src, "user_id", "ts", "vq")
    q = (
        out.writeStream.format("memory").queryName("decaystate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_decaystate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from decaystate")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp_ltz").alias("ts"), "event_id",
        F.pmod(F.floor(F.col("value") * 8).cast("long"), F.lit(1024)).alias("vq"),
    )
    batch = (
        decayed_features(ev, "user_id", "ts", "vq")
        .select("event_id", "decayed_count", "decayed_sum")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(got) == len(batch)
    assert (got["decayed_count"] == batch["decayed_count"]).all()
    assert (got["decayed_sum"] == batch["decayed_sum"]).all()
    # non-vacuous: at least one event actually has decayed history
    assert (got["decayed_count"] > 0).any()


def test_streaming_target_encode_matches_batch(spark, sf_dir, tmp_path):
    """The stateful streaming target encoder's (count, exact micro-unit
    sum) state must reproduce the batch target_encode_pit per event:
    te_count == batch te_count and the scale-6 decimal sum string ==
    Spark's decimal(38,6)->string of the batch running sum. Targets are
    eighth-quantized so both sides sum exact integers — == not approx."""
    from spark_pit.operators.windows import target_encode_pit
    from spark_pit.streaming import streaming_target_encode

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    vq = (F.floor(F.col("value") * 8).cast("double") / F.lit(8.0)).alias("vq")
    src = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}")
        .where(F.col("event_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type", F.col("ts").cast("timestamp_ltz").alias("ts"),
            "event_id", vq,
        )
    )
    out = streaming_target_encode(src, "event_type", "ts", "vq", tiebreak="event_id")
    q = (
        out.writeStream.format("memory").queryName("testate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_testate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select event_id, te_count, te_sum_str from testate")
        .toPandas().set_index("event_id").sort_index()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("value").isNotNull()
    ).select("event_type", "ts", "event_id", vq)
    batch = (
        target_encode_pit(ev, "event_type", "ts", "vq", tiebreak="event_id")
        .select(
            "event_id",
            F.col("te_count").alias("cnt_b"),
            F.col("te_sum").cast("string").alias("sum_b"),
        )
        .toPandas().set_index("event_id").sort_index()
    )
    assert len(got) == len(batch)
    assert (got["te_count"].to_numpy() == batch["cnt_b"].to_numpy()).all()
    first = got["te_count"] == 0
    assert got.loc[first, "te_sum_str"].isna().all()
    assert batch.loc[first.to_numpy(), "sum_b"].isna().all()
    rest = ~first
    assert (
        got.loc[rest, "te_sum_str"].to_numpy()
        == batch.loc[rest.to_numpy(), "sum_b"].to_numpy()
    ).all()
    # non-vacuous: some category actually accumulated history, and the
    # quantized targets include negatives (sign path of the formatter)
    assert (got["te_count"] > 0).any()


def test_streaming_scd2_cross_batch_state(spark, tmp_path):
    """streaming_scd2 must close intervals correctly when a run SPANS
    micro-batches (maxFilesPerTrigger=1 forces 3 batches over ts-ordered
    files): output == batch scd2_intervals' closed rows, open tails stay
    in state."""
    from datetime import datetime

    from spark_pit.operators.windows import scd2_intervals
    from spark_pit.streaming import streaming_scd2

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    batches = [
        # file 1: u1 run 'a' opens; u2 run 'x' opens
        [("u1", t(1), 1, "a"), ("u1", t(2), 2, "a"), ("u2", t(1), 3, "x")],
        # file 2: u1 still 'a' (run spans batches); u2 changes to 'y'
        [("u1", t(3), 4, "a"), ("u2", t(4), 5, "y")],
        # file 3: u1 finally changes -> closes the spanning run
        [("u1", t(6), 6, "b"), ("u2", t(7), 7, "y")],
    ]
    src_dir = tmp_path / "scd2_src"
    src_dir.mkdir()
    schema = "u string, ts timestamp_ltz, i long, c string"
    for k, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src_dir / f"b{k}")
        )
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "b*"))
    )
    q = (
        streaming_scd2(stream_src, "u", "ts", ["c"], tiebreak="i")
        .writeStream.format("memory").queryName("scd2state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["u"], r["valid_from_us"]): (r["c"], r["valid_to_us"])
        for r in spark.sql("select * from scd2state").collect()
    }
    all_rows = [r for b in batches for r in b]
    batch_df = scd2_intervals(
        spark.createDataFrame(all_rows, schema), "u", "ts", ["c"], tiebreak="i"
    )
    want = {
        (r["u"], r["valid_from_us"]): (r["c"], r["valid_to_us"])
        for r in batch_df.where(F.col("is_current") == False).collect()  # noqa: E712
    }
    assert got == want
    # the spanning run really closed (u1 'a' from t1 to t6), proving the
    # state carried across 3 micro-batches
    us = lambda s: int(datetime(2024, 1, 1, 0, 0, s).timestamp() * 1_000_000)
    assert got[("u1", us(1))] == ("a", us(6))
    assert got[("u2", us(1))] == ("x", us(4))


def test_streaming_funnel_cross_batch_chain(spark, tmp_path):
    """A funnel chain assembled ACROSS micro-batches (A in batch 1, B in
    batch 2, C in batch 3) must equal the batch operator, including the
    completion-window check."""
    from datetime import datetime

    from spark_pit.operators.windows import funnel_steps
    from spark_pit.streaming import streaming_funnel

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    batches = [
        [("u1", t(1), 1, "A"), ("u2", t(1), 2, "A"), ("u3", t(1), 3, "B")],
        [("u1", t(2), 4, "B"), ("u2", t(2), 5, "C")],       # u2: C before B
        [("u1", t(4), 6, "C"), ("u2", t(5), 7, "B"), ("u2", t(50), 8, "C")],
    ]
    src_dir = tmp_path / "funnel_src"
    src_dir.mkdir()
    schema = "u string, ts timestamp_ltz, i long, s string"
    for k, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src_dir / f"b{k}")
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "b*"))
    )
    q = (
        streaming_funnel(src, "u", "ts", "s", ["A", "B", "C"], within_s=10,
                         tiebreak="i")
        .writeStream.format("memory").queryName("funnelstate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    folded = (
        spark.sql("select * from funnelstate")
        .groupBy("u")
        .agg(
            F.max("step0_ts_us").alias("t0"), F.max("step1_ts_us").alias("t1"),
            F.max("step2_ts_us").alias("t2"), F.max("funnel_depth").alias("d"),
            F.max("completed").alias("c"),
        )
    )
    got = {r["u"]: r for r in folded.collect()}
    all_rows = [r for b in batches for r in b]
    want = {
        r["u"]: r
        for r in funnel_steps(
            spark.createDataFrame(all_rows, schema), "u", "ts", "s",
            ["A", "B", "C"], within_s=10,
        ).collect()
    }
    assert set(got) == set(want) == {"u1", "u2"}   # u3 never saw A
    for u in want:
        assert got[u]["t0"] == want[u]["step0_ts_us"]
        assert got[u]["t1"] == want[u]["step1_ts_us"]
        assert got[u]["t2"] == want[u]["step2_ts_us"]
        assert got[u]["d"] == want[u]["funnel_depth"]
        assert got[u]["c"] == want[u]["completed"]
    assert got["u1"]["d"] == 3 and got["u1"]["c"]          # cross-batch chain
    assert got["u2"]["d"] == 3 and not got["u2"]["c"]      # outside window


def test_streaming_scd2_multi_attr_order_across_batches(spark, tmp_path):
    """Regression (round-6 advice): with attr_cols in a DIFFERENT order
    than the DataFrame schema AND mixed types, state restore across
    micro-batch boundaries must not swap attribute values positionally.
    Pre-fix, attr_decl followed schema order while state.update used
    attr_cols order — a long/string swap here raises or closes wrong
    intervals; post-fix the output equals the batch operator exactly."""
    from datetime import datetime

    from spark_pit.operators.windows import scd2_intervals
    from spark_pit.streaming import streaming_scd2

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    # schema order: c1 (long) BEFORE c2 (string); attr_cols reversed below
    batches = [
        [("u1", t(1), 1, 10, "a"), ("u1", t(2), 2, 10, "a")],
        [("u1", t(3), 3, 10, "a")],           # unchanged: spans batches
        [("u1", t(5), 4, 20, "a"), ("u1", t(7), 5, 20, "b")],
    ]
    src_dir = tmp_path / "scd2_order_src"
    src_dir.mkdir()
    schema = "u string, ts timestamp_ltz, i long, c1 long, c2 string"
    for k, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src_dir / f"b{k}")
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "b*"))
    )
    q = (
        streaming_scd2(src, "u", "ts", ["c2", "c1"], tiebreak="i")
        .writeStream.format("memory").queryName("scd2order")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_scd2order"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["u"], r["valid_from_us"]): (r["c2"], r["c1"], r["valid_to_us"])
        for r in spark.sql("select * from scd2order").collect()
    }
    all_rows = [r for b in batches for r in b]
    want = {
        (r["u"], r["valid_from_us"]): (r["c2"], r["c1"], r["valid_to_us"])
        for r in scd2_intervals(
            spark.createDataFrame(all_rows, schema), "u", "ts",
            ["c2", "c1"], tiebreak="i",
        ).where(F.col("is_current") == False).collect()  # noqa: E712
    }
    assert got == want
    us = lambda s: int(datetime(2024, 1, 1, 0, 0, s).timestamp() * 1_000_000)
    # two closed runs: (10,'a') t1->t5 (closed by a c1-only change carried
    # across the batch-2 state restore) and (20,'a') t5->t7
    assert got[("u1", us(1))] == ("a", 10, us(5))
    assert got[("u1", us(5))] == ("a", 20, us(7))


def test_streaming_target_encode_intra_batch_int64_overflow(spark, tmp_path):
    """Regression (round-6 advice): a SINGLE micro-batch whose running sum
    exceeds int64 must not wrap inside np.cumsum. Four rows of 4e18 µs
    each: the 4th row's exclusive prefix is 1.2e19 > int64.max — pre-fix
    the int64 cumsum silently wrapped negative; post-fix the object-dtype
    path keeps it exact."""
    from datetime import datetime

    from spark_pit.streaming import streaming_target_encode

    v = 4e12  # * 1e6 -> 4e18 µs, exactly representable in float64
    rows = [
        ("cat", datetime(2024, 1, 1, 0, 0, s), s, v) for s in range(1, 5)
    ]
    src_dir = tmp_path / "te_ovf_src"
    src_dir.mkdir()
    schema = "c string, ts timestamp_ltz, i long, v double"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src_dir / "b0")
    )
    src = spark.readStream.schema(schema).parquet(str(src_dir / "b*"))
    q = (
        streaming_target_encode(src, "c", "ts", "v", tiebreak="i")
        .writeStream.format("memory").queryName("teovf")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_teovf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["i"]: (r["te_count"], r["te_sum_str"])
        for r in spark.sql("select * from teovf").collect()
    }
    unit = 4_000_000_000_000_000_000  # µs per row, a Python int
    for k in range(1, 5):
        cnt, s = got[k]
        assert cnt == k - 1
        if k == 1:
            assert s is None
        else:
            run = unit * (k - 1)  # exact, > int64.max for k == 4
            assert s == f"{run // 1_000_000}.{run % 1_000_000:06d}"
    # the interesting row really is beyond int64
    assert unit * 3 > 2**63 - 1


def test_stateful_kernels_survive_multi_chunk_groups(spark, tmp_path):
    """Regression (round-6 endurance find): applyInPandasWithState hands a
    group over as MULTIPLE Arrow chunks in post-shuffle ARRIVAL order, not
    event-time order. Pre-fix every stateful kernel sorted each chunk
    separately and carried intra-batch state chunk-to-chunk — correct only
    while a group fit one ~10k-row chunk, silently wrong beyond (at 10M
    events the streaming target encoder diverged from batch on 99.8% of
    rows). Reproduced at fixture scale by forcing 25-row Arrow chunks over
    a 400-row shuffled single-category batch; pinned bit-equal to batch."""
    from datetime import datetime, timedelta

    import numpy as np

    from spark_pit.operators.windows import target_encode_pit
    from spark_pit.streaming import streaming_target_encode

    rng = np.random.default_rng(5)
    t0 = datetime(2024, 1, 1)
    rows = [
        ("cat", t0 + timedelta(seconds=int(i)), int(i), float(i % 8) / 8)
        for i in range(400)
    ]
    rng.shuffle(rows)  # arrival order != event-time order within the batch
    src_dir = tmp_path / "chunks_src"
    src_dir.mkdir()
    schema = "c string, ts timestamp_ltz, i long, v double"
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(src_dir / "b0"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "25")
    try:
        src = spark.readStream.schema(schema).parquet(str(src_dir / "b*"))
        q = (
            streaming_target_encode(src, "c", "ts", "v", tiebreak="i")
            .writeStream.format("memory").queryName("multichunk")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_multichunk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        r["i"]: (r["te_count"], r["te_sum_str"])
        for r in spark.sql("select * from multichunk").collect()
    }
    want = {
        r["i"]: (
            r["te_count"],
            str(r["te_sum"]) if r["te_count"] > 0 else None,
        )
        for r in target_encode_pit(df, "c", "ts", "v", tiebreak="i").collect()
    }
    assert got == want


def test_streaming_drift_counts_accumulate_across_batches(spark, tmp_path):
    """The streaming drift monitor's per-(shard, category) period counts
    must ACCUMULATE across micro-batches (maxFilesPerTrigger=1 forces 3
    batches) so the TV computed from the final streamed counts equals
    the batch tv_drift_by_group over the union of all batches — exact
    integer equality, per shard."""
    from spark_pit.operators.drift import tv_drift_by_group, tv_from_counts

    batches = [
        # (shard, category, period): category mix shifts between periods
        [(0, "a", 0), (0, "a", 0), (0, "b", 0), (1, "x", 0)],
        [(0, "a", 1), (0, "b", 1), (0, "b", 1), (1, "x", 1)],
        [(0, "c", 1), (1, "y", 0), (1, "y", 1), (1, "x", 0)],
    ]
    src_dir = tmp_path / "drift_src"
    src_dir.mkdir()
    schema = "shard int, v string, p long"
    for k, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src_dir / f"b{k}")
        )
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "b*"))
    )
    counts = stream_src.groupBy("shard", "v").agg(
        F.sum(F.lit(1) - F.col("p")).alias("__cr"),
        F.sum("p").alias("__cc"),
    )
    q = (
        counts.writeStream.format("memory").queryName("driftstate")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["shard"]: (r["n_ref"], r["n_cur"], r["tv_micro"])
        for r in tv_from_counts(spark.table("driftstate"), "shard").collect()
    }
    all_rows = [r for b in batches for r in b]
    want = {
        r["shard"]: (r["n_ref"], r["n_cur"], r["tv_micro"])
        for r in tv_drift_by_group(
            spark.createDataFrame(all_rows, schema), "shard", "v", "p"
        ).collect()
    }
    assert got == want
    # sanity: shard 0 really drifted (b appears more, c appears, a drops)
    assert want[0][2] > 0
