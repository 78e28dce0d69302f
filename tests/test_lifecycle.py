"""cohort_retention / rfm_segments vs hand-computed references."""

from datetime import datetime, timedelta

import numpy as np

from spark_pit.operators.windows import cohort_retention, rfm_segments

WEEK = 604_800


def _t(day):
    return datetime(2024, 1, 1) + timedelta(days=day)


def test_cohort_retention_matrix(spark):
    # u1, u2 start week 0; u2 returns week 1; u3 starts week 1 and
    # returns week 2. Weekly buckets from the epoch.
    rows = [
        ("u1", _t(0)), ("u2", _t(1)), ("u2", _t(7)),
        ("u3", _t(8)), ("u3", _t(15)), ("u3", _t(16)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp_ntz")
    out = {
        (r["cohort_bucket"], r["age"]): (
            r["n_active"], r["n_events"], r["retained_micro"]
        )
        for r in cohort_retention(df, "user_id", "ts", bucket_s=WEEK).collect()
    }
    # cohort buckets are absolute week indices; compute them like the op
    w0 = int(datetime(2024, 1, 1).timestamp() * 1e6) // (WEEK * 10**6)
    w_of = lambda d: int(_t(d).timestamp() * 1e6) // (WEEK * 10**6)
    c0, c1 = w_of(0), w_of(8)
    assert c1 == c0 + 1
    assert out[(c0, 0)] == (2, 2, 1_000_000)       # u1, u2
    assert out[(c0, 1)] == (1, 1, 500_000)         # u2 retained 1/2
    assert out[(c1, 0)] == (1, 1, 1_000_000)       # u3
    assert out[(c1, 1)] == (1, 2, 1_000_000)       # u3 retained, 2 events
    assert len(out) == 4
    assert w0 == c0  # day 0 really is the cohort-0 anchor


def test_rfm_segments_monotone_coding(spark):
    # 8 users with strictly increasing frequency/monetary and strictly
    # decreasing recency: best user gets (4,4,4), worst (1,1,1), and
    # segment counts sum to the user count.
    rows = []
    for u in range(8):
        for e in range(u + 1):  # frequency u+1
            rows.append((f"u{u}", _t(u * 2 + e % 2), float(u + 1)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp_ntz, value double")
    out = rfm_segments(df, "user_id", "ts", "value").collect()
    total = sum(r["n_entities"] for r in out)
    assert total == 8
    codes = {(r["r_code"], r["f_code"], r["m_code"]) for r in out}
    # the most recent, most frequent, highest-value user exists
    assert (4, 4, 4) in codes
    # codes stay in the 1..4 range
    for r in out:
        assert 1 <= r["r_code"] <= 4 and 1 <= r["f_code"] <= 4 and 1 <= r["m_code"] <= 4


def test_rfm_matches_python_reference(spark):
    rng = np.random.default_rng(59)
    rows = []
    per_user = {}
    for u in range(25):
        k = int(rng.integers(1, 6))
        days = sorted(int(d) for d in rng.integers(0, 40, k))
        vals = [float(np.round(rng.uniform(1, 9), 2)) for _ in range(k)]
        for d, v in zip(days, vals):
            rows.append((f"u{u:02d}", _t(d), v))
        per_user[f"u{u:02d}"] = (days, vals)
    df = spark.createDataFrame(rows, "user_id string, ts timestamp_ntz, value double")
    got = {
        (r["r_code"], r["f_code"], r["m_code"]): r["n_entities"]
        for r in rfm_segments(df, "user_id", "ts", "value").collect()
    }

    us = lambda d: int(_t(d).timestamp() * 1e6)
    last = {u: us(max(ds)) for u, (ds, _) in per_user.items()}
    ref_ts = max(last.values())
    rec = {u: ref_ts - t for u, t in last.items()}
    freq = {u: len(ds) for u, (ds, _) in per_user.items()}
    mon = {
        u: sum(int(np.floor(v * 1e6 + 0.5)) for v in vs)
        for u, (_, vs) in per_user.items()
    }

    def cuts(vals):
        s = sorted(vals)
        n = len(s)
        out = []
        for p in (0.25, 0.5, 0.75):
            h = p * (n - 1)
            lo = int(np.floor(h))
            g = h - lo
            out.append(s[lo] + (s[min(lo + 1, n - 1)] - s[lo]) * g)
        return out

    def code(v, c):
        return 1 + sum(1 for x in c if v > x)

    cr, cf, cm = cuts(list(rec.values())), cuts(list(freq.values())), cuts(list(mon.values()))
    want = {}
    for u in per_user:
        key = (5 - code(rec[u], cr), code(freq[u], cf), code(mon[u], cm))
        want[key] = want.get(key, 0) + 1
    assert got == want
