"""auc_by_group / calibration_bins vs NumPy reference implementations
(midrank ties, degenerate groups, bin-edge clamping)."""

import numpy as np

from spark_pit.operators.evalmetrics import auc_by_group, calibration_bins


def _ref_auc(scores, labels):
    """Mann–Whitney AUC with midranks, straight from the definition."""
    scores, labels = np.asarray(scores, float), np.asarray(labels, int)
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), float)
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # midrank of the tie class
        i = j
    p = labels.sum()
    n = len(labels) - p
    if p == 0 or n == 0:
        return None
    return (ranks[labels == 1].sum() - p * (p + 1) / 2) / (p * n)


def test_auc_matches_reference_with_ties(spark):
    rows = []
    rng = np.random.default_rng(3)
    data = {}
    for g in ["g1", "g2"]:
        scores = np.round(rng.uniform(0, 1, 60), 1)   # heavy ties at 1dp
        labels = (rng.uniform(0, 1, 60) < 0.4).astype(int)
        data[g] = (scores, labels)
        rows += [(g, float(s), int(y)) for s, y in zip(scores, labels)]
    # degenerate group: all positive -> null AUC
    rows += [("g3", 0.5, 1), ("g3", 0.7, 1)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r for r in auc_by_group(df, "g", "score", "label").collect()}
    for g in ["g1", "g2"]:
        want = _ref_auc(*data[g])
        assert got[g]["auc_micro"] == int(np.floor(want * 1e6 + 0.5)), g
        assert got[g]["n_pos"] == int(data[g][1].sum())
    assert got["g3"]["auc_micro"] is None
    assert got["g3"]["n_neg"] == 0


def test_auc_perfect_and_random_sanity(spark):
    # perfectly separated -> exactly 1.0; anti-separated -> 0.0
    rows = [("g", 0.1 * i, int(i >= 5)) for i in range(10)]
    rows += [("h", 0.1 * i, int(i < 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r["auc_micro"] for r in auc_by_group(df, "g", "score", "label").collect()}
    assert got["g"] == 1_000_000
    assert got["h"] == 0


def test_calibration_bins_edges_and_rates(spark):
    rows = [
        ("g", 0.04, 0), ("g", 0.06, 1),     # bin 0: rate 0.5
        ("g", 0.95, 1), ("g", 1.0, 1),      # score=1.0 clamps into bin 9
        ("g", 0.55, 0),                      # bin 5 alone
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["bin"]: r for r in calibration_bins(df, "g", "score", "label").collect()}
    assert set(got) == {0, 5, 9}
    assert got[0]["n"] == 2 and got[0]["pos_rate_micro"] == 500_000
    assert got[0]["mean_score_micro"] == 50_000
    assert got[9]["n"] == 2 and got[9]["pos_rate_micro"] == 1_000_000
    assert got[5]["pos_rate_micro"] == 0


def _ref_pr_auc(scores, labels):
    """Tie-grouped average precision straight from the definition:
    thresholds = distinct scores desc; AP = sum(dtp/P * TP/(TP+FP))."""
    scores, labels = np.asarray(scores, float), np.asarray(labels, int)
    p = int(labels.sum())
    if p == 0:
        return None
    ap, tp, k = 0.0, 0, 0
    for s in sorted(set(scores), reverse=True):
        m = scores == s
        dtp = int(labels[m].sum())
        tp += dtp
        k += int(m.sum())
        if dtp:
            ap += (dtp / p) * (tp / k)
    return ap


def test_pr_auc_matches_reference_with_ties(spark):
    from spark_pit.operators.evalmetrics import pr_auc_by_group

    rows, data = [], {}
    rng = np.random.default_rng(7)
    for g in ["g1", "g2"]:
        scores = np.round(rng.uniform(0, 1, 80), 1)   # heavy ties at 1dp
        labels = (rng.uniform(0, 1, 80) < 0.25).astype(int)
        data[g] = (scores, labels)
        rows += [(g, float(s), int(y)) for s, y in zip(scores, labels)]
    rows += [("g3", 0.5, 0), ("g3", 0.7, 0)]          # no positives -> null
    rows += [("g4", 0.5, 1), ("g4", 0.7, 1)]          # no negatives -> 1.0
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["pr_auc_micro"])
        for r in pr_auc_by_group(df, "g", "score", "label").collect()
    }
    for g in ["g1", "g2"]:
        s, y = data[g]
        want = _ref_pr_auc(s, y)
        # defined quantization: per-term nano round -> micro surface
        assert abs(got[g][2] - want * 1e6) <= 1.0, g
        assert got[g][0] == int(y.sum()) and got[g][1] == int((1 - y).sum())
    assert got["g3"][2] is None
    assert got["g4"][2] == 1_000_000


def test_pr_auc_perfect_and_worst_sanity(spark):
    from spark_pit.operators.evalmetrics import pr_auc_by_group

    # perfect separation -> AP = 1; positives all at the bottom ->
    # AP = (1/P) * sum_{i=1..P} i/(N_neg+i) (exact closed form)
    rows = [("p", float(i), int(i >= 50)) for i in range(100)]
    rows += [("w", float(i), int(i < 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {
        r["g"]: r["pr_auc_micro"]
        for r in pr_auc_by_group(df, "g", "score", "label").collect()
    }
    assert got["p"] == 1_000_000
    want_w = sum((i / (90 + i)) for i in range(1, 11)) / 10
    assert abs(got["w"] - want_w * 1e6) <= 1.0


def _ref_brier_ece(scores, labels, n_bins=10):
    """Brier + ECE straight from the operator's integer contract:
    micro-quantized scores, per-bin |sum(s) - 1e6*sum(y)| summed / N."""
    scores, labels = np.asarray(scores, float), np.asarray(labels, int)
    s_us = np.floor(scores * 1_000_000 + 0.5).astype(np.int64)
    n = len(scores)
    sq = int(np.sum((s_us - 1_000_000 * labels.astype(np.int64)) ** 2))
    brier_micro = (2 * sq + n * 1_000_000) // (2 * n * 1_000_000)
    bins = np.minimum(np.floor(scores * n_bins).astype(int), n_bins - 1)
    dev = 0
    for b in np.unique(bins):
        m = bins == b
        dev += abs(int(s_us[m].sum()) - 1_000_000 * int(labels[m].sum()))
    ece_micro = (2 * dev + n) // (2 * n)
    return brier_micro, ece_micro


def test_brier_ece_matches_reference(spark):
    from spark_pit.operators.evalmetrics import brier_ece_by_group

    rows, data = [], {}
    rng = np.random.default_rng(13)
    for g in ["g1", "g2"]:
        scores = np.round(rng.uniform(0, 1, 90), 2)
        labels = (rng.uniform(0, 1, 90) < scores * 0.8).astype(int)
        data[g] = (scores, labels)
        rows += [(g, float(s), int(y)) for s, y in zip(scores, labels)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {
        r["g"]: (r["n"], r["brier_micro"], r["ece_micro"])
        for r in brier_ece_by_group(df, "g", "score", "label").collect()
    }
    for g in ["g1", "g2"]:
        want = _ref_brier_ece(*data[g])
        assert got[g] == (90, want[0], want[1]), g
        # sanity vs the float definitions (quantization < 2 micro-units)
        s, y = data[g]
        assert abs(got[g][1] / 1e6 - np.mean((s - y) ** 2)) < 2e-6


def test_brier_ece_perfect_and_worst(spark):
    from spark_pit.operators.evalmetrics import brier_ece_by_group

    # perfectly calibrated hard classifier: score == label -> 0 / 0;
    # maximally wrong: score == 1 - label -> brier = ece = 1.
    rows = [("good", float(y), y) for y in (0, 1) for _ in range(5)]
    rows += [("bad", float(1 - y), y) for y in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r for r in brier_ece_by_group(df, "g", "score", "label").collect()}
    assert got["good"]["brier_micro"] == 0 and got["good"]["ece_micro"] == 0
    assert got["bad"]["brier_micro"] == 1_000_000
    assert got["bad"]["ece_micro"] == 1_000_000


# ---------------------------------------------------------------- round 6


def _ref_ks_micro(scores, labels):
    """Exact KS in integers: max |cp·N − cn·P| over distinct scores,
    then the same round-half-up integral divide the operator defines."""
    pairs = sorted(zip(scores, labels))
    from itertools import groupby

    cp = cn = 0
    devs = []
    p_tot = sum(1 for _, y in pairs if y == 1)
    n_tot = len(pairs) - p_tot
    for _, grp in groupby(pairs, key=lambda r: r[0]):
        grp = list(grp)
        cp += sum(1 for _, y in grp if y == 1)
        cn += sum(1 for _, y in grp if y == 0)
        devs.append(abs(cp * n_tot - cn * p_tot))
    if p_tot == 0 or n_tot == 0:
        return None
    d = max(devs)
    return (2 * d * 10**6 + p_tot * n_tot) // (2 * p_tot * n_tot)


def test_ks_matches_reference_with_ties(spark):
    from spark_pit.operators.evalmetrics import ks_by_group

    rng = np.random.default_rng(11)
    rows, expect = [], {}
    for g in ["g1", "g2"]:
        scores = np.round(rng.uniform(0, 1, 80), 1)  # heavy ties
        labels = (rng.uniform(0, 1, 80) < 0.35).astype(int)
        expect[g] = _ref_ks_micro([float(s) for s in scores], [int(y) for y in labels])
        rows += [(g, float(s), int(y)) for s, y in zip(scores, labels)]
    rows += [("g3", 0.2, 1), ("g3", 0.9, 1)]  # no negatives -> null
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r["ks_micro"] for r in ks_by_group(df, "g", "score", "label").collect()}
    assert got["g1"] == expect["g1"] and got["g2"] == expect["g2"]
    assert got["g3"] is None


def test_ks_perfect_separation_is_one(spark):
    from spark_pit.operators.evalmetrics import ks_by_group

    rows = [("g", 0.1 * i, 0) for i in range(5)] + [("g", 0.9 + 0.01 * i, 1) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = ks_by_group(df, "g", "score", "label").collect()[0]
    assert out["ks_micro"] == 1_000_000


def test_ndcg_matches_reference(spark):
    from spark_pit.operators.evalmetrics import ndcg_by_group, ndcg_weights_nano

    w = ndcg_weights_nano(10)
    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for g in ["q1", "q2"]:
        n = 25
        scores = np.round(rng.uniform(0, 1, n), 1)
        rels = rng.integers(0, 4, n)
        items = list(range(1000, 1000 + n))
        ranked = sorted(zip(scores, items, rels), key=lambda r: (-r[0], r[1]))
        dcg = sum(int(r) * w[i] for i, (_, _, r) in enumerate(ranked[:10]))
        ideal = sorted(rels, reverse=True)
        idcg = sum(int(r) * w[i] for i, r in enumerate(ideal[:10]))
        expect[g] = (2 * dcg * 10**6 + idcg) // (2 * idcg) if idcg > 0 else None
        rows += [
            (g, float(s), int(r), int(it))
            for s, r, it in zip(scores, rels, items)
        ]
    rows += [("q3", 0.5, 0, 1), ("q3", 0.6, 0, 2)]  # zero relevance -> null
    df = spark.createDataFrame(rows, "g string, score double, rel int, item long")
    got = {
        r["g"]: r["ndcg_micro"]
        for r in ndcg_by_group(df, "g", "score", "rel", "item", k=10).collect()
    }
    assert got == {**expect, "q3": None}


def test_ndcg_perfect_ranking_is_one(spark):
    from spark_pit.operators.evalmetrics import ndcg_by_group

    # score strictly increasing with relevance -> DCG == IDCG
    rows = [("q", float(r) / 4 + 0.1, r, i) for i, r in enumerate([3, 2, 2, 1, 0])]
    df = spark.createDataFrame(rows, "g string, score double, rel int, item long")
    out = ndcg_by_group(df, "g", "score", "rel", "item", k=10).collect()[0]
    assert out["ndcg_micro"] == 1_000_000


def _py_ntile(n, tiles):
    """Standard NTILE bucket sizes: first n % tiles buckets get the extra."""
    q, r = divmod(n, tiles)
    sizes = [(q + 1 if i < r else q) for i in range(tiles)]
    out = []
    for i, s in enumerate(sizes, start=1):
        out += [i] * s
    return out


def test_lift_deciles_matches_reference(spark):
    from spark_pit.operators.evalmetrics import lift_by_decile

    rng = np.random.default_rng(23)
    n = 97  # not divisible by 10: exercises the remainder rule
    scores = np.round(rng.uniform(0, 1, n), 2)
    labels = (rng.uniform(0, 1, n) < 0.3).astype(int)
    ids = list(range(n))
    rows = [("g", float(s), int(y), i) for s, y, i in zip(scores, labels, ids)]
    df = spark.createDataFrame(rows, "g string, score double, label int, tb long")
    got = {
        r["decile"]: r
        for r in lift_by_decile(df, "g", "score", "label", "tb", n_tiles=10).collect()
    }
    ranked = sorted(zip(scores, ids, labels), key=lambda r: (-r[0], r[1]))
    tiles = _py_ntile(n, 10)
    per = {}
    for t, (_, _, y) in zip(tiles, ranked):
        a, b = per.get(t, (0, 0))
        per[t] = (a + 1, b + int(y))
    p_tot, n_tot = sum(b for _, b in per.values()), n
    cum = 0
    for t in range(1, 11):
        nn, np_ = per[t]
        cum += np_
        assert got[t]["n"] == nn and got[t]["n_pos"] == np_
        assert got[t]["capture_micro"] == (2 * cum * 10**6 + p_tot) // (2 * p_tot)
        assert got[t]["lift_micro"] == (
            2 * np_ * n_tot * 10**6 + nn * p_tot
        ) // (2 * nn * p_tot)


def test_lift_deciles_zero_positives_is_null(spark):
    from spark_pit.operators.evalmetrics import lift_by_decile

    rows = [("g", 0.1 * i, 0, i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, score double, label int, tb long")
    out = lift_by_decile(df, "g", "score", "label", "tb", n_tiles=10).collect()
    assert all(r["capture_micro"] is None and r["lift_micro"] is None for r in out)


def _ref_spearman_micro(xs, ys):
    """Exact doubled-midrank Pearson, float only in the final step."""
    def mid2(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            for t in range(i, j):
                out[order[t]] = (i + 1) + j  # min(rn)+max(rn)
            i = j
        return out

    a, b = mid2(xs), mid2(ys)
    n = len(xs)
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(u * v for u, v in zip(a, b))
    vx, vy = n * saa - sa * sa, n * sbb - sb * sb
    if vx <= 0 or vy <= 0:
        return None
    import math

    rho = float(n * sab - sa * sb) / math.sqrt(float(vx) * float(vy))
    return math.floor(rho * 10**6 + 0.5)


def test_spearman_matches_reference_with_ties(spark):
    from spark_pit.operators.evalmetrics import spearman_by_group

    rng = np.random.default_rng(13)
    rows, expect = [], {}
    for g in ["g1", "g2"]:
        xs = [float(v) for v in np.round(rng.uniform(0, 1, 70), 1)]  # ties
        ys = [int(v) for v in rng.integers(0, 8, 70)]                # ties
        expect[g] = _ref_spearman_micro(xs, ys)
        rows += [(g, x, y) for x, y in zip(xs, ys)]
    rows += [("g3", 1.0, 1), ("g3", 1.0, 2)]  # constant x -> null
    df = spark.createDataFrame(rows, "g string, x double, y int")
    got = {r["g"]: r["rho_micro"] for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert got == {**expect, "g3": None}


def test_spearman_perfect_monotone(spark):
    from spark_pit.operators.evalmetrics import spearman_by_group

    rows = [("g", float(i), i * i) for i in range(1, 20)]
    rows += [("h", float(i), -i) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x double, y long")
    got = {r["g"]: r["rho_micro"] for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert got == {"g": 1_000_000, "h": -1_000_000}


def _ref_chi2(cells):
    """cells: dict (x, y) -> count. Returns (chi2_micro, v_micro) with
    the operator's defined per-cell nano rounding."""
    import math
    from collections import Counter

    r, c = Counter(), Counter()
    for (x, y), o in cells.items():
        r[x] += o
        c[y] += o
    n = sum(cells.values())
    s = sum(
        (2 * o * o * 10**9 + r[x] * c[y]) // (2 * r[x] * c[y])
        for (x, y), o in cells.items()
    )
    chi2_nano = n * (s - 10**9)
    chi2_micro = (2 * max(chi2_nano, 0) + 1000) // 2000
    dof = min(len(r) - 1, len(c) - 1)
    if dof <= 0:
        return chi2_micro, None
    v = math.sqrt(max(float(chi2_nano) / 1e9, 0.0) / float(n * dof))
    return chi2_micro, math.floor(v * 10**6 + 0.5)


def test_chi2_matches_reference(spark):
    from spark_pit.operators.evalmetrics import chi2_by_group

    rng = np.random.default_rng(17)
    rows, cells = [], {}
    for _ in range(300):
        x = "abc"[rng.integers(0, 3)]
        y = int(rng.integers(0, 2)) if x != "c" else 1  # dependence
        rows.append(("g", x, y))
        cells[(x, y)] = cells.get((x, y), 0) + 1
    df = spark.createDataFrame(rows, "g string, x string, y int")
    out = chi2_by_group(df, "g", "x", "y").collect()[0]
    chi2_micro, v_micro = _ref_chi2(cells)
    assert out["chi2_micro"] == chi2_micro
    assert out["cramers_v_micro"] == v_micro
    assert out["n"] == 300


def test_chi2_perfect_dependence_and_independence(spark):
    from spark_pit.operators.evalmetrics import chi2_by_group

    # x == y binary: V = 1. Product distribution: chi2 = 0 exactly.
    rows = [("d", str(i % 2), i % 2) for i in range(40)]
    rows += [("i", str(i % 2), (i // 2) % 2) for i in range(40)]
    rows += [("k", "only", i % 2) for i in range(10)]  # dof 0 -> null V
    df = spark.createDataFrame(rows, "g string, x string, y int")
    got = {r["g"]: r for r in chi2_by_group(df, "g", "x", "y").collect()}
    assert got["d"]["cramers_v_micro"] == 1_000_000
    assert got["i"]["chi2_micro"] == 0
    assert got["k"]["cramers_v_micro"] is None and got["k"]["chi2_micro"] == 0


def test_retrieval_at_k_matches_reference(spark):
    from spark_pit.operators.evalmetrics import retrieval_at_k

    rng = np.random.default_rng(41)
    rows, expect = [], {}
    for g in ["q1", "q2"]:
        n = 30
        scores = [float(s) for s in np.round(rng.uniform(0, 1, n), 1)]
        rels = [int(r) for r in (rng.uniform(0, 1, n) < 0.2)]
        items = list(range(n))
        ranked = sorted(zip(scores, items, rels), key=lambda r: (-r[0], r[1]))
        hits = sum(r for _, _, r in ranked[:10])
        total = sum(rels)
        first = next((i + 1 for i, (_, _, r) in enumerate(ranked) if r), None)
        prec = (2 * hits * 10**6 + 10) // 20
        rec = (2 * hits * 10**6 + total) // (2 * total) if total else None
        if total == 0:
            rr = None
        elif first <= 10:
            rr = (2 * 10**6 + first) // (2 * first)
        else:
            rr = 0
        expect[g] = (hits, prec, rec, rr)
        rows += [(g, s, r, i) for s, r, i in zip(scores, rels, items)]
    rows += [("q3", 0.5, 0, 1), ("q3", 0.9, 0, 2)]  # no relevant -> nulls
    df = spark.createDataFrame(rows, "g string, score double, rel int, item long")
    got = {
        r["g"]: (r["hits_at_k"], r["precision_micro"], r["recall_micro"], r["rr_micro"])
        for r in retrieval_at_k(df, "g", "score", "rel", "item", k=10).collect()
    }
    assert got == {**expect, "q3": (0, 0, None, None)}


def test_retrieval_rr_zero_when_first_hit_outside_k(spark):
    from spark_pit.operators.evalmetrics import retrieval_at_k

    # 12 items, only the lowest-scored one relevant -> rank 12 > k=10
    rows = [("q", float(i), 1 if i == 0 else 0, i) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, score double, rel int, item long")
    out = retrieval_at_k(df, "g", "score", "rel", "item", k=10).collect()[0]
    assert out["rr_micro"] == 0 and out["hits_at_k"] == 0
    assert out["recall_micro"] == 0 and out["n_rel"] == 1


def test_ab_test_matches_reference_including_negative_lift(spark):
    import math

    from spark_pit.operators.evalmetrics import ab_test_stats

    def ref(n0, x0, n1, x1):
        num = 2 * (x1 * n0 - x0 * n1) * 10**6 + n0 * n1
        den = 2 * n0 * n1
        lift = (num - ((num % den + den) % den)) // den  # true floor div
        if 0 < x0 + x1 < n0 + n1:
            p = (x0 + x1) / (n0 + n1)
            z = (x1 / n1 - x0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
            zm = math.floor(z * 10**6 + 0.5)
        else:
            zm = None
        return lift, zm

    cases = {
        "win":  (100, 10, 100, 20),   # treatment wins
        "lose": (80, 24, 120, 18),    # NEGATIVE lift
        "flat": (50, 5, 50, 5),
        "allconv": (10, 10, 10, 10),  # degenerate pooled rate -> z null
    }
    rows = []
    for g, (n0, x0, n1, x1) in cases.items():
        rows += [(g, 0, 1)] * x0 + [(g, 0, 0)] * (n0 - x0)
        rows += [(g, 1, 1)] * x1 + [(g, 1, 0)] * (n1 - x1)
    df = spark.createDataFrame(rows, "g string, arm int, conv int")
    got = {
        r["g"]: (r["n0"], r["x0"], r["n1"], r["x1"], r["lift_micro"], r["z_micro"])
        for r in ab_test_stats(df, "g", "arm", "conv").collect()
    }
    for g, (n0, x0, n1, x1) in cases.items():
        lift, zm = ref(n0, x0, n1, x1)
        assert got[g] == (n0, x0, n1, x1, lift, zm), g
    assert got["lose"][4] < 0  # the sign-safe branch really exercised


def test_confusion_matrix_matches_reference(spark):
    from spark_pit.operators.evalmetrics import confusion_at_threshold

    rng = np.random.default_rng(61)
    scores = [float(s) for s in np.round(rng.uniform(0, 1, 120), 2)]
    labels = [int(y) for y in (rng.uniform(0, 1, 120) < 0.3)]
    rows = [("g", s, y) for s, y in zip(scores, labels)]
    rows += [("empty_pos", 0.9, 0), ("empty_pos", 0.1, 0)]  # no actual pos
    rows += [("no_pred", 0.1, 1), ("no_pred", 0.2, 0)]      # no predicted pos
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r for r in confusion_at_threshold(df, "g", "score", "label", 0.5).collect()}

    tp = sum(1 for s, y in zip(scores, labels) if s >= 0.5 and y)
    fp = sum(1 for s, y in zip(scores, labels) if s >= 0.5 and not y)
    fn = sum(1 for s, y in zip(scores, labels) if s < 0.5 and y)
    tn = 120 - tp - fp - fn
    r = got["g"]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert r["precision_micro"] == (2 * tp * 10**6 + tp + fp) // (2 * (tp + fp))
    assert r["recall_micro"] == (2 * tp * 10**6 + tp + fn) // (2 * (tp + fn))
    assert r["f1_micro"] == (4 * tp * 10**6 + 2 * tp + fp + fn) // (2 * (2 * tp + fp + fn))
    assert got["empty_pos"]["recall_micro"] is None
    assert got["empty_pos"]["f1_micro"] == 0  # fp > 0 so denominator > 0
    assert got["no_pred"]["precision_micro"] is None
