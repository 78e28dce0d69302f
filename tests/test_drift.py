"""tv_drift_by_group / group_kfold_stats / quantile_bin_stats vs exact
Python references (integer TV arithmetic, md5-fold portability, NTILE
remainder rule)."""

import hashlib

import numpy as np

from spark_pit.operators.drift import (
    assign_group_fold,
    group_kfold_stats,
    tv_drift_by_group,
)
from spark_pit.operators.encode import quantile_bin_stats


def _ref_tv_micro(vals_ref, vals_cur):
    from collections import Counter

    cr, cc = Counter(vals_ref), Counter(vals_cur)
    nr, nc = len(vals_ref), len(vals_cur)
    if nr == 0 or nc == 0:
        return None
    d = sum(abs(cr[v] * nc - cc[v] * nr) for v in set(cr) | set(cc))
    # round_half_up(10^6 · d / (2·nr·nc))
    return (d * 10**6 + nr * nc) // (2 * nr * nc)


def test_tv_drift_matches_reference(spark):
    rng = np.random.default_rng(5)
    cats = list("abcde")
    rows, expect = [], {}
    for g in [0, 1]:
        ref = [cats[i] for i in rng.integers(0, 5, 120)]
        cur = [cats[i] for i in rng.integers(0, 4, 80)]  # 'e' vanishes
        expect[g] = _ref_tv_micro(ref, cur)
        rows += [(g, v, 0) for v in ref] + [(g, v, 1) for v in cur]
    rows += [(2, "a", 0), (2, "b", 0)]  # no current period -> null
    df = spark.createDataFrame(rows, "shard int, v string, period int")
    got = {
        r["shard"]: r["tv_micro"]
        for r in tv_drift_by_group(df, "shard", "v", "period").collect()
    }
    assert got == {**expect, 2: None}


def test_tv_drift_identical_distributions_is_zero(spark):
    rows = [(0, v, p) for p in (0, 1) for v in ["x", "x", "y"]]
    df = spark.createDataFrame(rows, "shard int, v string, period int")
    out = tv_drift_by_group(df, "shard", "v", "period").collect()[0]
    assert out["tv_micro"] == 0


def test_tv_drift_disjoint_supports_is_one(spark):
    rows = [(0, "a", 0), (0, "a", 0), (0, "b", 1), (0, "c", 1)]
    df = spark.createDataFrame(rows, "shard int, v string, period int")
    out = tv_drift_by_group(df, "shard", "v", "period").collect()[0]
    assert out["tv_micro"] == 1_000_000


def _py_fold(entity, salt, k):
    h = hashlib.md5(f"{entity}{salt}".encode()).hexdigest()[:15]
    return int(h, 16) % k


def test_assign_group_fold_matches_python_md5(spark):
    ids = [1, 7, 42, 999, 12345, 888888888888]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    got = {
        r["user_id"]: r["fold"]
        for r in assign_group_fold(df, "user_id", 5, salt="gkf").collect()
    }
    assert got == {i: _py_fold(i, "gkf", 5) for i in ids}


def test_group_kfold_never_splits_an_entity(spark):
    rng = np.random.default_rng(9)
    rows = [
        (int(u), int(y))
        for u in rng.integers(0, 50, 400)
        for y in [rng.integers(0, 2)]
    ]
    df = spark.createDataFrame(rows, "user_id long, label int")
    folded = assign_group_fold(df, "user_id", 4)
    per_user = folded.groupBy("user_id").agg(
        {"fold": "min"}
    ).collect()  # distinct folds per user checked via countDistinct below
    from pyspark.sql import functions as F

    nf = (
        folded.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(F.max("nf"))
        .collect()[0][0]
    )
    assert nf == 1 and len(per_user) == 50
    stats = group_kfold_stats(df, "user_id", "label", k=4).collect()
    assert sum(r["n_rows"] for r in stats) == 400
    assert sum(r["n_entities"] for r in stats) == 50
    assert sum(r["n_pos"] for r in stats) == sum(y for _, y in rows)


def _py_ntile(n, tiles):
    q, r = divmod(n, tiles)
    out = []
    for i in range(1, tiles + 1):
        out += [i] * (q + 1 if i <= r else q)
    return out


def test_quantile_bin_stats_matches_reference(spark):
    rng = np.random.default_rng(31)
    n = 53  # remainder rule: first 3 bins get 6 rows, rest 5
    vals = np.round(rng.uniform(-2, 2, n), 3)
    rows = [("e", float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "e string, value double, tb long")
    got = {
        r["bin"]: r
        for r in quantile_bin_stats(df, "e", "value", "tb", n_bins=10).collect()
    }
    nanos = sorted(
        (int(np.floor(v * 1e9 + 0.5)), i) for i, v in enumerate(vals)
    )
    tiles = _py_ntile(n, 10)
    per = {}
    for t, (v, _) in zip(tiles, nanos):
        lo, hi, c = per.get(t, (v, v, 0))
        per[t] = (min(lo, v), max(hi, v), c + 1)
    for t in range(1, 11):
        lo, hi, c = per[t]
        assert got[t]["n"] == c
        assert got[t]["lo_nano"] == lo and got[t]["hi_nano"] == hi
    # bins tile the sorted order: adjacent bins never overlap
    for t in range(1, 10):
        assert per[t][1] <= per[t + 1][0]


def test_gini_diversity_matches_reference(spark):
    from collections import Counter

    from spark_pit.operators.drift import gini_diversity_by_group

    rng = np.random.default_rng(43)
    rows, expect = [], {}
    for g in [0, 1]:
        vals = [f"c{i}" for i in rng.integers(0, 6, 150)]
        c = Counter(vals)
        n, sc2 = len(vals), sum(v * v for v in c.values())
        expect[g] = ((2 * (n * n - sc2) * 10**6 + n * n) // (2 * n * n), len(c))
        rows += [(g, v) for v in vals]
    rows += [(2, "only")] * 7  # monoculture -> gini 0
    df = spark.createDataFrame(rows, "shard int, v string")
    got = {
        r["shard"]: (r["gini_micro"], r["n_categories"])
        for r in gini_diversity_by_group(df, "shard", "v").collect()
    }
    assert got == {**expect, 2: (0, 1)}


def test_gini_two_equal_categories_is_half(spark):
    from spark_pit.operators.drift import gini_diversity_by_group

    rows = [(0, "a")] * 10 + [(0, "b")] * 10
    df = spark.createDataFrame(rows, "shard int, v string")
    assert gini_diversity_by_group(df, "shard", "v").collect()[0]["gini_micro"] == 500_000


def test_oof_target_encode_matches_reference_and_excludes_own_fold(spark):
    from collections import defaultdict

    from spark_pit.operators.drift import oof_target_encode

    rng = np.random.default_rng(47)
    rows = []
    for _ in range(240):
        cat = "xy"[rng.integers(0, 2)]
        uid = int(rng.integers(0, 30))
        t = float(np.round(rng.uniform(-3, 3), 2))  # negative targets too
        rows.append((cat, uid, t))
    df = spark.createDataFrame(rows, "cat string, user_id long, target double")
    got = {
        (r["cat"], r["fold"]): r
        for r in oof_target_encode(df, "cat", "target", "user_id", k=3).collect()
    }
    per = defaultdict(lambda: [0, 0])  # (cat, fold) -> [n, sum_micro]
    for cat, uid, t in rows:
        f = _py_fold(uid, "gkf", 3)
        tm = int(np.floor(t * 10**6 + 0.5))
        per[(cat, f)][0] += 1
        per[(cat, f)][1] += tm
    tot = defaultdict(lambda: [0, 0])
    for (cat, f), (n, s) in per.items():
        tot[cat][0] += n
        tot[cat][1] += s
    for (cat, f), (n, s) in per.items():
        oof_n = tot[cat][0] - n
        oof_s = tot[cat][1] - s
        num, den = 2 * oof_s + oof_n, 2 * oof_n
        want = num // den if oof_n else None  # floor div = round_half_up
        r = got[(cat, f)]
        assert r["n_in_fold"] == n and r["oof_count"] == oof_n
        assert r["oof_mean_micro"] == want, (cat, f)


def test_oof_single_fold_category_yields_null(spark):
    from spark_pit.operators.drift import oof_target_encode

    # one entity -> one fold -> complement empty -> null mean
    rows = [("solo", 7, 1.5), ("solo", 7, 2.5)]
    df = spark.createDataFrame(rows, "cat string, user_id long, target double")
    out = oof_target_encode(df, "cat", "target", "user_id", k=4).collect()
    assert len(out) == 1 and out[0]["oof_mean_micro"] is None
    assert out[0]["oof_count"] == 0


def test_data_profile_counts(spark):
    from spark_pit.operators.drift import data_profile

    rows = [
        ("a", 1, None),
        ("a", None, "p1"),
        ("b", 2, "p1"),
        (None, 2, "p2"),
    ]
    df = spark.createDataFrame(rows, "c1 string, c2 long, c3 string")
    got = {
        r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"])
        for r in data_profile(df, ["c1", "c2", "c3"]).collect()
    }
    assert got == {
        "c1": (4, 1, 2),   # a, b
        "c2": (4, 1, 2),   # 1, 2
        "c3": (4, 1, 2),   # p1, p2
    }


def test_data_profile_rejects_quoted_column_names(spark):
    # names are interpolated into the stack() selectExpr — a quote or
    # backtick would escape its literal (round-6 advice finding)
    import pytest

    from spark_pit.operators.drift import data_profile

    df = spark.createDataFrame([("x",)], "`it's` string")
    with pytest.raises(ValueError, match="quotes/backticks"):
        data_profile(df, ["it's"])


def test_mad_matches_reference_odd_and_even(spark):
    from spark_pit.operators.encode import mad_by_group

    rng = np.random.default_rng(53)

    def ref(vals):
        nanos = sorted(int(np.floor(v * 1e9 + 0.5)) for v in vals)
        n = len(nanos)
        med = nanos[(n + 1) // 2 - 1]  # lower median, ceil(n/2)-th smallest
        devs = sorted(abs(v - med) for v in nanos)
        return med, devs[(n + 1) // 2 - 1]

    rows, expect = [], {}
    for g, n in [("odd", 31), ("even", 24)]:
        vals = [float(v) for v in np.round(rng.uniform(-5, 5, n), 3)]
        expect[g] = ref(vals)
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "e string, value double")
    got = {
        r["e"]: (r["median_nano"], r["mad_nano"])
        for r in mad_by_group(df, "e", "value").collect()
    }
    assert got == expect


def test_mad_constant_column_is_zero(spark):
    from spark_pit.operators.encode import mad_by_group

    df = spark.createDataFrame([("c", 2.5)] * 9, "e string, value double")
    out = mad_by_group(df, "e", "value").collect()[0]
    assert out["mad_nano"] == 0 and out["median_nano"] == 2_500_000_000
