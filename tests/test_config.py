"""import_parameters analogue (feature.py:321-329): JSON overrides with the
reference's parameter vocabulary and merge order."""

from __future__ import annotations

import json

from spark_pit.config import DEFAULTS, load_params, with_globals


def test_defaults():
    p = load_params()
    assert p.for_op("anything") == DEFAULTS


def test_reference_vocabulary_and_merge_order(tmp_path):
    cfg = tmp_path / "params.json"
    cfg.write_text(json.dumps({
        "globals": {"sliding_window": 9, "nlag": 5},
        "window_composition": {"sliding_window": 3},
        "lagk_pairs": {"kspace": 4},
        "lambda_tuples": {"lambdaValue": 7},
        "stride_pairs": {"g-gap": 3},
    }))
    p = load_params(str(cfg))
    # global override + alias translation
    assert p.get("autocorr", "width") == 9
    assert p.get("autocorr", "nlags") == 5
    # per-op beats global (reference merge order, feature.py:333-335)
    assert p.get("window_composition", "width") == 3
    # kspace=N -> gaps 0..N
    assert p.get("lagk_pairs", "gaps") == [0, 1, 2, 3, 4]
    assert p.get("lambda_tuples", "lam") == 7
    assert p.get("stride_pairs", "stride") == 3


def test_with_globals():
    p = with_globals(load_params(), width=11, hot_threshold=1000)
    assert p.get("x", "width") == 11
    assert p.get("x", "hot_threshold") == 1000
    assert p.get("x", "nlags") == DEFAULTS["nlags"]
