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
