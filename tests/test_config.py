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


def test_psekraac_and_aaindex_reference_params(tmp_path):
    """Round 4: the PseKRAAC selection params (PseKRAAC_model, k-tuple,
    RAAC_clust — feature.py:237-240) and the ';'-packed aaindex manifest
    (feature.py:241) round-trip through the reference-shaped JSON into
    engine names, and the selected cluster table resolves."""
    import json

    from spark_pit.alphabets import psekraac_alphabet
    from spark_pit.config import load_params

    cfg = tmp_path / "p.json"
    cfg.write_text(json.dumps({
        "PseKRAAC": {"PseKRAAC_model": "lambda-correlation", "k-tuple": 3,
                     "RAAC_clust": 8, "psekraac_type": "5"},
        "AAIndex": {"aaindex": "z1;z2;z4"},
    }))
    p = load_params(str(cfg))
    assert p.get("PseKRAAC", "psekraac_model") == "lambda-correlation"
    assert p.get("PseKRAAC", "ktuple") == 3
    assert p.get("PseKRAAC", "raactype") == 8
    assert p.get("AAIndex", "aaindex") == ["z1", "z2", "z4"]
    amap = psekraac_alphabet(p.get("PseKRAAC", "psekraac_type"),
                             p.get("PseKRAAC", "raactype"))
    assert len(set(amap.values())) == 8
    # defaults match the reference's own defaults
    assert p.get("other", "raactype") == 2 and p.get("other", "ktuple") == 2
