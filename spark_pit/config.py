"""Engine parameter config (SURVEY.md §2.1 `import_parameters`,
feature.py:321-329): per-operator parameter dicts with global defaults,
overridable from the same JSON file shape the reference accepts
(``{"<operator>": {"<param>": value}}``).

The reference's parameter vocabulary maps onto the engine's:

| reference          | engine                         |
|--------------------|--------------------------------|
| sliding_window     | width (trailing window rows)   |
| kspace             | gaps (k-spaced pair offsets)   |
| nlag               | nlags (autocorrelation lags)   |
| weight             | weight (QSOrder/PAAC w)        |
| lambdaValue        | lam (lambda-tuple offset)      |
| g-gap              | stride (gapModel stride)       |
| PseKRAAC_model     | psekraac_model (g-gap/lambda)  |
| k-tuple            | ktuple (1, 2 or 3)             |
| RAAC_clust         | raactype (cluster-table pick)  |
| aaindex (';'-list) | aaindex (property manifest)    |
plus engine-only: gap_seconds (sessionization), chunk_seconds (salting),
num_buckets, hot_threshold, num_parts (manifest).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace

DEFAULTS: dict[str, object] = {
    "width": 5,
    "gaps": [0, 1, 2],
    "nlags": 3,
    "weight": 0.1,
    "lam": 2,
    "stride": 2,
    "gap_seconds": 1800,
    "chunk_seconds": 86400,
    "num_buckets": 256,
    "hot_threshold": None,
    "num_parts": 64,
    # PseKRAAC selection (reference feature.py:237-240 defaults): model
    # 'g-gap' | 'lambda-correlation', cluster-table choice for
    # alphabets.psekraac_alphabet(ptype, raactype), tuple size 1|2|3.
    # The reference defaults RAAC_clust to 1, which is NOT a key of any
    # type's AAGroup dict — its own dispatcher would reject it
    # (feature.py:2851-2855). Default 2 here (valid for every type);
    # documented reference-bug deviation per SURVEY meta-fact 4.
    "psekraac_model": "g-gap",
    "ktuple": 2,
    "raactype": 2,
    "psekraac_type": "1",
    # AAIndex property manifest (feature.py:241 'aaindex'): the runtime
    # property subset encode.property_channels projects in one pass
    "aaindex": ["z1", "z3", "z5"],
}

# reference parameter names → engine names (feature.py:191-242 vocabulary)
_REFERENCE_ALIASES = {
    "sliding_window": "width",
    "kspace": "gaps",
    "nlag": "nlags",
    "lambdaValue": "lam",
    "g-gap": "stride",
    "PseKRAAC_model": "psekraac_model",
    "k-tuple": "ktuple",
    "RAAC_clust": "raactype",
}


@dataclass(frozen=True)
class EngineParams:
    globals_: dict = field(default_factory=lambda: dict(DEFAULTS))
    per_op: dict = field(default_factory=dict)

    def for_op(self, op: str) -> dict:
        """Merged view: per-operator overrides win over globals — the same
        merge order as the reference (feature.py:333-335)."""
        merged = dict(self.globals_)
        merged.update(self.per_op.get(op, {}))
        return merged

    def get(self, op: str, name: str):
        return self.for_op(op).get(name)


def _normalize(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        key = _REFERENCE_ALIASES.get(k, k)
        if key == "gaps" and isinstance(v, int):
            v = list(range(v + 1))  # reference kspace=N means gaps 0..N
        if key == "aaindex" and isinstance(v, str):
            # reference packs the property list as ';'-separated ids
            v = [t for t in v.split(";") if t]
        out[key] = v
    return out


def load_params(path: str | None = None, overrides: dict | None = None) -> EngineParams:
    """Read the reference-shaped JSON (top-level keys = operator names,
    values = param dicts; a top-level "globals" dict overrides defaults)."""
    raw: dict = {}
    if path:
        with open(path) as fh:
            raw = json.load(fh)
    if overrides:
        raw = {**raw, **overrides}
    globals_ = dict(DEFAULTS)
    globals_.update(_normalize(raw.pop("globals", {})))
    per_op = {op: _normalize(v) for op, v in raw.items() if isinstance(v, dict)}
    return EngineParams(globals_=globals_, per_op=per_op)


def with_globals(params: EngineParams, **kw) -> EngineParams:
    g = dict(params.globals_)
    g.update(kw)
    return replace(params, globals_=g)
