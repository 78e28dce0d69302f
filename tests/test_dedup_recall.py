"""Empirical star-form recall floors (round-6 verdict ask #3): the
dedup_clusters docstring states the star-candidate trade; this pins the
MEASURED recall on a planted corpus with exact token-Jaccard ground truth
so a regression in banding, star-edge generation, verification, or
connected components shows up as a recall drop, not a silent quality loss.

Corpus: datagen.neardup_corpus(25 clusters, 400 background, seed=11) —
fully deterministic, partitioning-invariant (exact arithmetic + md5-fold
hashing), so the measured numbers repeat bit-for-bit; floors sit a few
points under the measured values only to absorb intentional corpus tweaks.

Measured (tools/measure_dedup_recall.py, threshold 0.5; full curve and the
larger-corpus run in BENCH.md round 6):
  default 16 hashes = 4 bands x 4: pair recall [0.9,1]=0.965, [0.8,0.9)=
  0.908, total=0.669 — tracks the banding S-curve p(J)=1-(1-J^4)^4.
  64 hashes = 16 bands x 4: total pair recall 0.989 (the knob a 0.5
  threshold actually needs; this config only RUNS because round 6 made
  the seed table derive from n_hashes instead of truncating at 16).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from measure_dedup_recall import measure  # noqa: E402


def _by_bucket(rows):
    return {r["bucket"]: r for r in rows}


def test_default_banding_recall_floors(spark):
    rows, totals = measure(spark, 25, 400, 0.5, 11)
    b = _by_bucket(rows)
    assert totals["truth_pairs_total"] > 400           # the corpus is real
    assert b["[0.9,1.0]"]["cluster_pair_recall"] >= 0.93
    assert b["[0.8,0.9)"]["cluster_pair_recall"] >= 0.85
    assert b["[0.7,0.8)"]["cluster_pair_recall"] >= 0.65
    assert totals["pair_recall_total"] >= 0.60
    assert b["[0.9,1.0]"]["mark_doc_recall"] >= 0.93
    # transitivity bonus: clusters recall >= one-hop marking, per bucket
    for r in rows:
        if r["mark_doc_recall"] is not None:
            assert r["cluster_pair_recall"] >= r["mark_doc_recall"] - 0.05


def test_wide_banding_recovers_low_jaccard(spark):
    """16 bands x 4 rows (n_hashes=64): the banding config a 0.5 threshold
    needs — near-total recall everywhere; regression-guards the
    _minhash_seeds(n) derivation beyond the old 16-seed table."""
    rows, totals = measure(spark, 25, 400, 0.5, 11, n_hashes=64, bands=16)
    b = _by_bucket(rows)
    assert totals["pair_recall_total"] >= 0.95
    for bucket in ["[0.6,0.7)", "[0.7,0.8)", "[0.8,0.9)", "[0.9,1.0]"]:
        assert b[bucket]["cluster_pair_recall"] >= 0.95, bucket
    assert b["[0.5,0.6)"]["cluster_pair_recall"] >= 0.85
