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


def alphabet_map(alphabet: dict[str, str]):
    """Compile a token→cluster alphabet into a codegen'd literal map column."""
    return F.create_map(*[x for k, v in sorted(alphabet.items()) for x in (F.lit(k), F.lit(v))])


def alphabet_case_sql(col: str, alphabet: dict[str, str]) -> str:
    """The same alphabet as an ANSI-SQL CASE expression (oracle twin)."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(alphabet.items())
    )
    return f"CASE {col} {whens} END"
