"""funnel_steps + scd2_intervals: hand-built fixtures pin the edge
semantics (strict-after step ordering, window boundary, broken chains;
null-safe attr compare, open current interval)."""

from datetime import datetime

from pyspark.sql import functions as F

from spark_pit.operators.windows import funnel_steps, scd2_intervals


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _us(s):
    return int(datetime(2024, 1, 1, 0, 0, s).timestamp() * 1_000_000)


def test_funnel_strict_after_and_window(spark):
    rows = [
        # u1: clean A(1) -> B(2) -> C(3): depth 3, completed
        ("u1", _t(1), "A"), ("u1", _t(2), "B"), ("u1", _t(3), "C"),
        # u2: B BEFORE A — chain breaks at step 1: depth 1
        ("u2", _t(5), "B"), ("u2", _t(6), "A"), ("u2", _t(7), "C"),
        # u3: same-instant B as A — strict > rejects it; later B(9) used
        ("u3", _t(8), "A"), ("u3", _t(8), "B"), ("u3", _t(9), "B"),
        ("u3", _t(10), "C"),
        # u4: completes but OUTSIDE the 5s window
        ("u4", _t(1), "A"), ("u4", _t(2), "B"), ("u4", _t(30), "C"),
        # u5: no A at all — absent from output
        ("u5", _t(1), "B"), ("u5", _t(2), "C"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, s string")
    got = {
        r["u"]: r
        for r in funnel_steps(df, "u", "ts", "s", ["A", "B", "C"], within_s=5).collect()
    }
    assert set(got) == {"u1", "u2", "u3", "u4"}
    assert got["u1"]["funnel_depth"] == 3 and got["u1"]["completed"]
    assert got["u2"]["funnel_depth"] == 1 and not got["u2"]["completed"]
    assert got["u2"]["step1_ts_us"] is None
    # u3: B at t8 rejected (not strictly after A at t8), B at t9 taken
    assert got["u3"]["step1_ts_us"] == _us(9)
    assert got["u3"]["funnel_depth"] == 3 and got["u3"]["completed"]
    assert got["u4"]["funnel_depth"] == 3 and not got["u4"]["completed"]


def test_funnel_first_touch_uses_earliest_chain(spark):
    # two A's: chain anchors on the EARLIEST A, even though the later A
    # would also admit the B
    rows = [("u", _t(1), "A"), ("u", _t(4), "A"), ("u", _t(6), "B")]
    df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, s string")
    r = funnel_steps(df, "u", "ts", "s", ["A", "B"]).collect()[0]
    assert r["step0_ts_us"] == _us(1)
    assert r["step1_ts_us"] == _us(6)
    assert r["completed"]


def test_scd2_runs_collapse_and_current(spark):
    rows = [
        ("u1", _t(1), 1, "red"), ("u1", _t(2), 2, "red"),   # run 1
        ("u1", _t(3), 3, "blue"),                            # run 2
        ("u1", _t(4), 4, "red"),                             # run 3 (back)
        ("u2", _t(1), 5, None), ("u2", _t(2), 6, None),      # null==null: one run
        ("u2", _t(3), 7, "x"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, i int, c string")
    out = scd2_intervals(df, "u", "ts", ["c"], tiebreak="i").collect()
    by = {(r["u"], r["i"]): r for r in out}
    assert set(by) == {("u1", 1), ("u1", 3), ("u1", 4), ("u2", 5), ("u2", 7)}
    # half-open intervals chain exactly
    assert by[("u1", 1)]["valid_from_us"] == _us(1)
    assert by[("u1", 1)]["valid_to_us"] == _us(3)
    assert by[("u1", 3)]["valid_to_us"] == _us(4)
    assert by[("u1", 4)]["valid_to_us"] is None and by[("u1", 4)]["is_current"]
    # null-safe compare: the two null-attr rows are ONE run
    assert by[("u2", 5)]["valid_to_us"] == _us(3)
    assert not by[("u2", 5)]["is_current"]
    assert by[("u2", 7)]["is_current"]


def test_scd2_multi_attr_any_change_opens_run(spark):
    rows = [
        ("u", _t(1), 1, "a", 10), ("u", _t(2), 2, "a", 10),
        ("u", _t(3), 3, "a", 20),  # second attr changes
        ("u", _t(4), 4, "b", 20),  # first attr changes
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, i int, c string, v int")
    out = scd2_intervals(df, "u", "ts", ["c", "v"], tiebreak="i")
    assert [r["i"] for r in out.orderBy("valid_from_us").collect()] == [1, 3, 4]


def test_time_rollup_buckets_and_single_shuffle(spark):
    from spark_pit.operators.windows import time_rollup

    rows = [
        ("a", datetime(2024, 1, 1, 0, 30, 0), 1.25),
        ("a", datetime(2024, 1, 1, 0, 45, 0), -2.5),
        ("a", datetime(2024, 1, 1, 1, 15, 0), 4.0),
        ("b", datetime(2024, 1, 2, 3, 0, 0), 0.1),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = time_rollup(df, ["k"], "ts", "v", granularities_s=[3600, 86400])
    got = {(r["k"], r["granularity_s"], r["bucket_start_us"]): r for r in out.collect()}

    day0 = int(datetime(2024, 1, 1).timestamp() * 1_000_000)
    hr = 3_600_000_000
    # hourly: a splits 2+1; daily: a collapses to one bucket of 3
    assert got[("a", 3600, day0)]["n"] == 2
    assert got[("a", 3600, day0)]["sum_micro"] == 1_250_000 - 2_500_000
    assert got[("a", 3600, day0 + hr)]["n"] == 1
    assert got[("a", 86400, day0)]["n"] == 3
    assert got[("a", 86400, day0)]["min_micro"] == -2_500_000
    assert got[("a", 86400, day0)]["max_micro"] == 4_000_000
    assert got[("b", 86400, day0 + 24 * hr)]["n"] == 1

    # ONE shuffle: the granularity fan-out happens map-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # AQE wraps one exchange node


def test_scd2_reconstruction_property(spark):
    """Property (hypothesis-driven): for EVERY event, the SCD-2 interval
    covering its timestamp must carry that event's attr value — i.e. the
    interval table losslessly reconstructs point-in-time state."""
    from hypothesis import given, settings, strategies as st

    from spark_pit.operators.windows import scd2_intervals

    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["u1", "u2"]),
                st.integers(min_value=0, max_value=50),   # second offset
                st.sampled_from(["a", "b", None]),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(raw):
        # unique (entity, ts, i) per event via the index tiebreak
        rows = [
            (u, datetime(2024, 1, 1, 0, 0, sec), i, c)
            for i, (u, sec, c) in enumerate(raw)
        ]
        df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, i int, c string")
        ivs = scd2_intervals(df, "u", "ts", ["c"], tiebreak="i").collect()
        by_ent = {}
        for r in ivs:
            by_ent.setdefault(r["u"], []).append(r)
        # truth: the state AT instant t is the attr of the LAST event
        # at-or-before t in (ts, tiebreak) order — same-instant changes
        # resolve by tiebreak, so an event can be superseded at its own ts
        events_sorted = sorted(
            ((u, sec, i, c) for i, (u, sec, c) in enumerate(raw)),
            key=lambda r: (r[0], r[1], r[2]),
        )
        for u, sec, _, _ in events_sorted:
            state = [r[3] for r in events_sorted if r[0] == u and r[1] <= sec][-1]
            t = int(datetime(2024, 1, 1, 0, 0, sec).timestamp() * 1_000_000)
            covering = [
                r for r in by_ent[u]
                if r["valid_from_us"] <= t
                and (r["valid_to_us"] is None or t < r["valid_to_us"])
            ]
            assert len(covering) == 1, (u, sec, covering)
            assert covering[0]["c"] == state, (u, sec, state, by_ent[u])

    check()


def test_scd2_versions_feed_asof_join(spark):
    """Composition: the SCD-2 version table is the right side an as-of
    join consumes — asof_join_window (at-or-before) over the intervals'
    valid_from must return, for any probe instant, the same attr as the
    naive last-change-event-at-or-before lookup."""
    from spark_pit.operators.asof import asof_join_window
    from spark_pit.operators.windows import scd2_intervals

    rows = [
        ("u1", _t(1), 1, "red"), ("u1", _t(2), 2, "red"),
        ("u1", _t(5), 3, "blue"), ("u1", _t(9), 4, "red"),
        ("u2", _t(2), 5, "x"), ("u2", _t(4), 6, "y"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp_ntz, i int, c string")
    versions = scd2_intervals(df, "u", "ts", ["c"], tiebreak="i").select(
        "u", "valid_from_us", F.col("c").alias("attr"), "i"
    )
    probes = spark.createDataFrame(
        [("u1", _us(0)), ("u1", _us(1)), ("u1", _us(3)), ("u1", _us(5)),
         ("u1", _us(7)), ("u1", _us(20)), ("u2", _us(3)), ("u2", _us(4))],
        "u string, probe_us long",
    )
    joined = asof_join_window(
        probes, versions, on=["u"], left_ts="probe_us",
        right_ts="valid_from_us", value_cols=["attr"],
        strict=False, right_order="i",
    )
    got = {(r["u"], r["probe_us"]): r["asof_attr"] for r in joined.collect()}
    # naive truth: last change event at-or-before the probe
    events = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    for (u, p), attr in got.items():
        before = [r for r in events if r[0] == u
                  and int(r[1].timestamp() * 1e6) <= p]
        want = before[-1][3] if before else None
        assert attr == want, (u, p, attr, want)
    assert got[("u1", _us(0))] is None          # before any version
    assert got[("u1", _us(3))] == "red"
    assert got[("u1", _us(5))] == "blue"        # at-or-before sees the t5 open
    assert got[("u1", _us(20))] == "red"        # current open version
