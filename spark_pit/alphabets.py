"""Reduced-alphabet registry (SURVEY.md §2.3 DistancePair / grouped families).

The reference hardcodes its reduced alphabets inline per descriptor
(DistancePair cp20/cp19/cp14/cp13 at feature.py:2576-2665, KSCTriad's 7
conservation groups at feature.py:2113-2121, the 5 physchem GAAC groups at
feature.py:1047-1053). Here every alphabet is DATA — a token→cluster map the
grouped operators take as a parameter — so "16 PseKRAAC types × 4 alphabets"
stays one parameterized operator instead of 64 near-copies.

Two registries:

- ``PROTEIN_ALPHABETS``: the reference's actual amino-acid maps, verbatim
  semantics (cp19 merges Y→F; cp14 merges HRKQ/IMV/WY; cp13 merges
  IL/FM/KR/HPQWY; the KSCTriad g1..g7 conservation groups; the GAAC 5
  physchem groups) — usable directly when the token column holds residues.
- ``EVENT_ALPHABETS``: behavioral analogues over the synthetic event
  vocabulary, used by the oracle-backed queries (the test tables carry
  events, not residues; the operator is alphabet-agnostic either way).

At 100 TB scale the map is a handful of literals compiled into the plan
(``F.create_map`` → codegen'd lookup) — never a join, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# --- the reference's amino-acid alphabets (feature.py:2576-2665) ---
_CP20 = "ACDEFGHIKLMNPQRSTVWY"
PROTEIN_ALPHABETS: dict[str, dict[str, str]] = {
    "cp20": {a: a for a in _CP20},
    "cp19": {**{a: a for a in _CP20}, "Y": "F"},
    "cp14": {
        **{a: a for a in _CP20},
        "K": "H", "Q": "H", "R": "H",   # HRKQ
        "M": "I", "V": "I",             # IMV
        "Y": "W",                       # WY
    },
    "cp13": {
        **{a: a for a in _CP20},
        "L": "I",                       # IL
        "M": "F",                       # FM
        "R": "K",                       # KR
        "P": "H", "Q": "H", "W": "H", "Y": "H",  # HPQWY
    },
    # KSCTriad conservation groups (feature.py:2113-2121)
    "ctriad7": {
        **{a: "g1" for a in "AGV"}, **{a: "g2" for a in "ILFP"},
        **{a: "g3" for a in "YMTS"}, **{a: "g4" for a in "HNQW"},
        **{a: "g5" for a in "RK"}, **{a: "g6" for a in "DE"}, "C": "g7",
    },
    # GAAC physchem groups (feature.py:1047-1053)
    "gaac5": {
        **{a: "aliphatic" for a in "GAVLMI"},
        **{a: "aromatic" for a in "FYW"},
        **{a: "positive" for a in "KRH"},
        **{a: "negative" for a in "DE"},
        **{a: "uncharged" for a in "STCPNQ"},
    },
}

# --- behavioral analogues over the synthetic event vocabulary ---
EVENT_ALPHABETS: dict[str, dict[str, str]] = {
    # the engine-wide default (3 groups) — same map as pairs.GROUP_MAP_DEFAULT
    "behavior3": {
        "click": "engage", "view": "engage",
        "purchase": "convert", "signup": "convert",
        "error": "fault",
    },
    # coarser merge (2 groups) — the "cp13-style" second alphabet the
    # DistancePair query exercises
    "action2": {
        "click": "act", "view": "act", "purchase": "act", "signup": "act",
        "error": "fault",
    },
    # identity (cp20-style: no merging)
    "identity5": {t: t for t in ("click", "error", "purchase", "signup", "view")},
}


# --- numeric property tables (the XMAP family's real parameters) ---
# ZScale (feature.py:1335-1362; Sandberg et al. 1998, public) and AESNN3
# (feature.py:998-1025; Lin et al. 2002, public): token → fixed numeric
# vector, consumed by encode.property_channel / positional encodings the
# same way the behavioral PROP_TABLE stand-in is. Unknown token / '-' → 0.
ZSCALE: dict[str, list[float]] = {
    "A": [0.24, -2.32, 0.60, -0.14, 1.30], "C": [0.84, -1.67, 3.71, 0.18, -2.65],
    "D": [3.98, 0.93, 1.93, -2.46, 0.75], "E": [3.11, 0.26, -0.11, -0.34, -0.25],
    "F": [-4.22, 1.94, 1.06, 0.54, -0.62], "G": [2.05, -4.06, 0.36, -0.82, -0.38],
    "H": [2.47, 1.95, 0.26, 3.90, 0.09], "I": [-3.89, -1.73, -1.71, -0.84, 0.26],
    "K": [2.29, 0.89, -2.49, 1.49, 0.31], "L": [-4.28, -1.30, -1.49, -0.72, 0.84],
    "M": [-2.85, -0.22, 0.47, 1.94, -0.98], "N": [3.05, 1.62, 1.04, -1.15, 1.61],
    "P": [-1.66, 0.27, 1.84, 0.70, 2.00], "Q": [1.75, 0.50, -1.44, -1.34, 0.66],
    "R": [3.52, 2.50, -3.50, 1.99, -0.17], "S": [2.39, -1.07, 1.15, -1.39, 0.67],
    "T": [0.75, -2.18, -1.12, -1.46, -0.40], "V": [-2.59, -2.64, -1.54, -0.85, -0.02],
    "W": [-4.36, 3.94, 0.59, 3.44, -1.59], "Y": [-2.54, 2.44, 0.43, 0.04, -1.47],
    "-": [0.0, 0.0, 0.0, 0.0, 0.0],
}
AESNN3: dict[str, list[float]] = {
    "A": [-0.99, -0.61, 0.00], "R": [0.28, -0.99, -0.22], "N": [0.77, -0.24, 0.59],
    "D": [0.74, -0.72, -0.35], "C": [0.34, 0.88, 0.35], "Q": [0.12, -0.99, -0.99],
    "E": [0.59, -0.55, -0.99], "G": [-0.79, -0.99, 0.10], "H": [0.08, -0.71, 0.68],
    "I": [-0.77, 0.67, -0.37], "L": [-0.92, 0.31, -0.99], "K": [-0.63, 0.25, 0.50],
    "M": [-0.80, 0.44, -0.71], "F": [0.87, 0.65, -0.53], "P": [-0.99, -0.99, -0.99],
    "S": [0.99, 0.40, 0.37], "T": [0.42, 0.21, 0.97], "W": [-0.13, 0.77, -0.90],
    "Y": [0.59, 0.33, -0.99], "V": [-0.99, 0.27, -0.52],
    "-": [0.0, 0.0, 0.0],
}


def property_tables(table: dict[str, list[float]]) -> dict[str, dict[str, float]]:
    """Split a token→vector table into per-channel token→scalar tables for
    encode.property_channel (channel name = 1-based component index)."""
    width = len(next(iter(table.values())))
    return {
        f"z{i + 1}": {k: v[i] for k, v in table.items()} for i in range(width)
    }


def alphabet_map(alphabet: dict[str, str]):
    """Compile a token→cluster alphabet into a codegen'd literal map column."""
    return F.create_map(*[x for k, v in sorted(alphabet.items()) for x in (F.lit(k), F.lit(v))])


def alphabet_case_sql(col: str, alphabet: dict[str, str]) -> str:
    """The same alphabet as an ANSI-SQL CASE expression (oracle twin)."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(alphabet.items())
    )
    return f"CASE {col} {whens} END"
