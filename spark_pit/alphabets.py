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


# --- PseKRAAC reduced-alphabet cluster tables (judge round-3 ask #2) ---
# The 16 PseKRAAC types' RAAC clusters, verbatim from the reference's
# per-type AAGroup dicts (feature.py:2825-3752; type 1 at 2825-2845, the
# remaining types follow in order through _PseKRAAC_type_16). These are
# public scientific constants (Zuo et al. 2017, "PseKRAAC: a flexible web
# server for generating pseudo K-tuple reduced amino acids composition").
# Every cluster list is an exact partition of the 20-AA alphabet
# (asserted in tests/test_reference_loops.py). Group names use the
# reference's own (uniform, copy-pasted) 'T1.G.<i+1>' labels for all 19
# type variants — feature.py builds gDict[i] = 'T1.G.' + str(i+1)
# identically in every type function (e.g. 2863, 2905, 3737), so we
# preserve that quirk bit-for-bit.
PSEKRAAC_CLUSTERS: dict[str, dict[int, tuple[str, ...]]] = {
    "1": {
        2: ("CMFILVWY", "AGTSNQDEHRKP"),
        3: ("CMFILVWY", "AGTSP", "NQDEHRK"),
        4: ("CMFWY", "ILV", "AGTS", "NQDEHRKP"),
        5: ("WFYH", "MILV", "CATSP", "G", "NQDERK"),
        6: ("WFYH", "MILV", "CATS", "P", "G", "NQDERK"),
        7: ("WFYH", "MILV", "CATS", "P", "G", "NQDE", "RK"),
        8: ("WFYH", "MILV", "CA", "NTS", "P", "G", "DE", "QRK"),
        9: ("WFYH", "MI", "LV", "CA", "NTS", "P", "G", "DE", "QRK"),
        10: ("WFY", "ML", "IV", "CA", "TS", "NH", "P", "G", "DE", "QRK"),
        11: ("WFY", "ML", "IV", "CA", "TS", "NH", "P", "G", "D", "QE", "RK"),
        12: ("WFY", "ML", "IV", "C", "A", "TS", "NH", "P", "G", "D", "QE", "RK"),
        13: ("WFY", "ML", "IV", "C", "A", "T", "S", "NH", "P", "G", "D", "QE", "RK"),
        14: ("WFY", "ML", "IV", "C", "A", "T", "S", "NH", "P", "G", "D", "QE", "R", "K"),
        15: ("WFY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "QE", "R", "K"),
        16: ("W", "FY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "QE", "R", "K"),
        17: ("W", "FY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q", "E",
            "R", "K"),
        18: ("W", "FY", "M", "L", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q", "E",
            "R", "K"),
        19: ("W", "F", "Y", "M", "L", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q",
            "E", "R", "K"),
        20: ("W", "F", "Y", "M", "L", "I", "V", "C", "A", "T", "S", "N", "H", "P", "G", "D",
            "Q", "E", "R", "K"),
    },
    "2": {
        2: ("LVIMCAGSTPFYW", "EDNQKRH"),
        3: ("LVIMCAGSTP", "FYW", "EDNQKRH"),
        4: ("LVIMC", "AGSTP", "FYW", "EDNQKRH"),
        5: ("LVIMC", "AGSTP", "FYW", "EDNQ", "KRH"),
        6: ("LVIM", "AGST", "PHC", "FYW", "EDNQ", "KR"),
        8: ("LVIMC", "AG", "ST", "P", "FYW", "EDNQ", "KR", "H"),
        15: ("LVIM", "C", "A", "G", "S", "T", "P", "FY", "W", "E", "D", "N", "Q", "KR", "H"),
        20: ("L", "V", "I", "M", "C", "A", "G", "S", "T", "P", "F", "Y", "W", "E", "D", "N",
            "Q", "K", "R", "H"),
    },
    "3a": {
        2: ("AGSPDEQNHTKRMILFYVC", "W"),
        3: ("AGSPDEQNHTKRMILFYV", "W", "C"),
        4: ("AGSPDEQNHTKRMIV", "W", "YFL", "C"),
        5: ("AGSPDEQNHTKR", "W", "YF", "MIVL", "C"),
        6: ("AGSP", "DEQNHTKR", "W", "YF", "MIL", "VC"),
        7: ("AGP", "DEQNH", "TKRMIV", "W", "YF", "L", "CS"),
        8: ("AG", "DEQN", "TKRMIV", "HY", "W", "L", "FP", "CS"),
        9: ("AG", "P", "DEQN", "TKRMI", "HY", "W", "F", "L", "VCS"),
        10: ("AG", "P", "DEQN", "TKRM", "HY", "W", "F", "I", "L", "VCS"),
        11: ("AG", "P", "DEQN", "TK", "RI", "H", "Y", "W", "F", "ML", "VCS"),
        12: ("FAS", "P", "G", "DEQ", "NL", "TK", "R", "H", "W", "Y", "IM", "VC"),
        13: ("FAS", "P", "G", "DEQ", "NL", "T", "K", "R", "H", "W", "Y", "IM", "VC"),
        14: ("FA", "P", "G", "T", "DE", "QM", "NL", "K", "R", "H", "W", "Y", "IV", "CS"),
        15: ("FAS", "P", "G", "T", "DE", "Q", "NL", "K", "R", "H", "W", "Y", "M", "I", "VC"),
        16: ("FA", "P", "G", "ST", "DE", "Q", "N", "K", "R", "H", "W", "Y", "M", "L", "I", "VC"),
        17: ("FA", "P", "G", "S", "T", "DE", "Q", "N", "K", "R", "H", "W", "Y", "M", "L", "I",
            "VC"),
        18: ("FA", "P", "G", "S", "T", "DE", "Q", "N", "K", "R", "H", "W", "Y", "M", "L", "I",
            "V", "C"),
        19: ("FA", "P", "G", "S", "T", "D", "E", "Q", "N", "K", "R", "H", "W", "Y", "M", "L",
            "I", "V", "C"),
        20: ("F", "A", "P", "G", "S", "T", "D", "E", "Q", "N", "K", "R", "H", "W", "Y", "M",
            "L", "I", "V", "C"),
    },
    "3b": {
        2: ("HRKQNEDSTGPACVIM", "LFYW"),
        3: ("HRKQNEDSTGPACVIM", "LFY", "W"),
        4: ("HRKQNEDSTGPA", "CIV", "MLFY", "W"),
        5: ("HRKQNEDSTGPA", "CV", "IML", "FY", "W"),
        6: ("HRKQNEDSTPA", "G", "CV", "IML", "FY", "W"),
        7: ("HRKQNEDSTA", "G", "P", "CV", "IML", "FY", "W"),
        8: ("HRKQSTA", "NED", "G", "P", "CV", "IML", "FY", "W"),
        9: ("HRKQ", "NED", "ASTG", "P", "C", "IV", "MLF", "Y", "W"),
        10: ("RKHSA", "Q", "NED", "G", "P", "C", "TIV", "MLF", "Y", "W"),
        11: ("RKQ", "NG", "ED", "AST", "P", "C", "IV", "HML", "F", "Y", "W"),
        12: ("RKQ", "ED", "NAST", "G", "P", "C", "IV", "H", "ML", "F", "Y", "W"),
        13: ("RK", "QE", "D", "NG", "HA", "ST", "P", "C", "IV", "ML", "F", "Y", "W"),
        14: ("R", "K", "QE", "D", "NG", "HA", "ST", "P", "C", "IV", "ML", "F", "Y", "W"),
        15: ("R", "K", "QE", "D", "NG", "HA", "ST", "P", "C", "IV", "M", "L", "F", "Y", "W"),
        16: ("R", "K", "Q", "E", "D", "NG", "HA", "ST", "P", "C", "IV", "M", "L", "F", "Y", "W"),
        17: ("R", "K", "Q", "E", "D", "NG", "HA", "S", "T", "P", "C", "IV", "M", "L", "F",
            "Y", "W"),
        18: ("R", "K", "Q", "E", "D", "NG", "HA", "S", "T", "P", "C", "I", "V", "M", "L", "F",
            "Y", "W"),
        19: ("R", "K", "Q", "E", "D", "NG", "H", "A", "S", "T", "P", "C", "I", "V", "M", "L",
            "F", "Y", "W"),
        20: ("R", "K", "Q", "E", "D", "N", "G", "H", "A", "S", "T", "P", "C", "I", "V", "M",
            "L", "F", "Y", "W"),
    },
    "4": {
        5: ("G", "IVFYW", "ALMEQRK", "P", "NDHSTC"),
        8: ("G", "IV", "FYW", "ALM", "EQRK", "P", "ND", "HSTC"),
        9: ("G", "IV", "FYW", "ALM", "EQRK", "P", "ND", "HS", "TC"),
        11: ("G", "IV", "FYW", "A", "LM", "EQRK", "P", "ND", "HS", "T", "C"),
        13: ("G", "IV", "FYW", "A", "L", "M", "E", "QRK", "P", "ND", "HS", "T", "C"),
        20: ("G", "I", "V", "F", "Y", "W", "A", "L", "M", "E", "Q", "R", "K", "P", "N", "D",
            "H", "S", "T", "C"),
    },
    "5": {
        3: ("FWYCILMVAGSTPHNQ", "DE", "KR"),
        4: ("FWY", "CILMV", "AGSTP", "EQNDHKR"),
        8: ("FWY", "CILMV", "GA", "ST", "P", "EQND", "H", "KR"),
        10: ("G", "FYW", "A", "ILMV", "RK", "P", "EQND", "H", "ST", "C"),
        15: ("G", "FY", "W", "A", "ILMV", "E", "Q", "RK", "P", "N", "D", "H", "S", "T", "C"),
        20: ("G", "I", "V", "F", "Y", "W", "A", "L", "M", "E", "Q", "R", "K", "P", "N", "D",
            "H", "S", "T", "C"),
    },
    "6a": {
        4: ("AGPST", "CILMV", "DEHKNQR", "FYW"),
        5: ("AHT", "CFILMVWY", "DE", "GP", "KNQRS"),
        20: ("A", "C", "D", "E", "F", "G", "H", "I", "K", "L", "M", "N", "P", "Q", "R", "S",
            "T", "V", "W", "Y"),
    },
    "6b": {
        5: ("AEHKQRST", "CFILMVWY", "DN", "G", "P"),
    },
    "6c": {
        5: ("AG", "C", "DEKNPQRST", "FILMVWY", "H"),
    },
    "7": {
        2: ("C", "MFILVWYAGTSNQDEHRKP"),
        3: ("C", "MFILVWYAKR", "GTSNQDEHP"),
        4: ("C", "KR", "MFILVWYA", "GTSNQDEHP"),
        5: ("C", "KR", "MFILVWYA", "DE", "GTSNQHP"),
        6: ("C", "KR", "WYA", "MFILV", "DE", "GTSNQHP"),
        7: ("C", "KR", "WYA", "MFILV", "DE", "QH", "GTSNP"),
        8: ("C", "KR", "WYA", "MFILV", "D", "E", "QH", "GTSNP"),
        9: ("C", "KR", "WYA", "MFILV", "D", "E", "QH", "TP", "GSN"),
        10: ("C", "KR", "WY", "A", "MFILV", "D", "E", "QH", "TP", "GSN"),
        11: ("C", "K", "R", "WY", "A", "MFILV", "D", "E", "QH", "TP", "GSN"),
        12: ("C", "K", "R", "WY", "A", "MFILV", "D", "E", "QH", "TP", "GS", "N"),
        13: ("C", "K", "R", "W", "Y", "A", "MFILV", "D", "E", "QH", "TP", "GS", "N"),
        14: ("C", "K", "R", "W", "Y", "A", "FILV", "M", "D", "E", "QH", "TP", "GS", "N"),
        15: ("C", "K", "R", "W", "Y", "A", "FILV", "M", "D", "E", "Q", "H", "TP", "GS", "N"),
        16: ("C", "K", "R", "W", "Y", "A", "FILV", "M", "D", "E", "Q", "H", "TP", "G", "S", "N"),
        17: ("C", "K", "R", "W", "Y", "A", "FI", "LV", "M", "D", "E", "Q", "H", "TP", "G",
            "S", "N"),
        18: ("C", "K", "R", "W", "Y", "A", "FI", "LV", "M", "D", "E", "Q", "H", "T", "P", "G",
            "S", "N"),
        19: ("C", "K", "R", "W", "Y", "A", "F", "I", "LV", "M", "D", "E", "Q", "H", "T", "P",
            "G", "S", "N"),
        20: ("C", "K", "R", "W", "Y", "A", "F", "I", "L", "V", "M", "D", "E", "Q", "H", "T",
            "P", "G", "S", "N"),
    },
    "8": {
        2: ("ADEGKNPQRST", "CFHILMVWY"),
        3: ("ADEGNPST", "CHKQRW", "FILMVY"),
        4: ("AGNPST", "CHWY", "DEKQR", "FILMV"),
        5: ("AGPST", "CFWY", "DEN", "HKQR", "ILMV"),
        6: ("APST", "CW", "DEGN", "FHY", "ILMV", "KQR"),
        7: ("AGST", "CW", "DEN", "FY", "HP", "ILMV", "KQR"),
        8: ("AST", "CG", "DEN", "FY", "HP", "ILV", "KQR", "MW"),
        9: ("AST", "CW", "DE", "FY", "GN", "HQ", "ILV", "KR", "MP"),
        10: ("AST", "CW", "DE", "FY", "GN", "HQ", "IV", "KR", "LM", "P"),
        11: ("AST", "C", "DE", "FY", "GN", "HQ", "IV", "KR", "LM", "P", "W"),
        12: ("AST", "C", "DE", "FY", "G", "HQ", "IV", "KR", "LM", "N", "P", "W"),
        13: ("AST", "C", "DE", "FY", "G", "H", "IV", "KR", "LM", "N", "P", "Q", "W"),
        14: ("AST", "C", "DE", "FL", "G", "H", "IV", "KR", "M", "N", "P", "Q", "W", "Y"),
        15: ("AST", "C", "DE", "F", "G", "H", "IV", "KR", "L", "M", "N", "P", "Q", "W", "Y"),
        16: ("AT", "C", "DE", "F", "G", "H", "IV", "KR", "L", "M", "N", "P", "Q", "S", "W", "Y"),
        17: ("AT", "C", "DE", "F", "G", "H", "IV", "K", "L", "M", "N", "P", "Q", "R", "S",
            "W", "Y"),
        18: ("A", "C", "DE", "F", "G", "H", "IV", "K", "L", "M", "N", "P", "Q", "R", "S", "T",
            "W", "Y"),
        19: ("A", "C", "D", "E", "F", "G", "H", "IV", "K", "L", "M", "N", "P", "Q", "R", "S",
            "T", "W", "Y"),
        20: ("A", "C", "D", "E", "F", "G", "H", "I", "V", "K", "L", "M", "N", "P", "Q", "R",
            "S", "T", "W", "Y"),
    },
    "9": {
        2: ("ACDEFGHILMNPQRSTVWY", "K"),
        3: ("ACDFGMPQRSTW", "EHILNVY", "K"),
        4: ("AGPT", "CDFMQRSW", "EHILNVY", "K"),
        5: ("AGPT", "CDQ", "EHILNVY", "FMRSW", "K"),
        6: ("AG", "CDQ", "EHILNVY", "FMRSW", "K", "PT"),
        7: ("AG", "CDQ", "EHNY", "FMRSW", "ILV", "K", "PT"),
        8: ("AG", "C", "DQ", "EHNY", "FMRSW", "ILV", "K", "PT"),
        9: ("AG", "C", "DQ", "EHNY", "FMW", "ILV", "K", "PT", "RS"),
        10: ("A", "C", "DQ", "EHNY", "FMW", "G", "ILV", "K", "PT", "RS"),
        11: ("A", "C", "DQ", "EHNY", "FM", "G", "ILV", "K", "PT", "RS", "W"),
        12: ("A", "C", "DQ", "EHNY", "FM", "G", "IL", "K", "PT", "RS", "V", "W"),
        13: ("A", "C", "DQ", "E", "FM", "G", "HNY", "IL", "K", "PT", "RS", "V", "W"),
        14: ("A", "C", "D", "E", "FM", "G", "HNY", "IL", "K", "PT", "Q", "RS", "V", "W"),
        15: ("A", "C", "D", "E", "FM", "G", "HNY", "IL", "K", "PT", "Q", "R", "S", "V", "W"),
        16: ("A", "C", "D", "E", "F", "G", "HNY", "IL", "K", "M", "PT", "Q", "R", "S", "V", "W"),
        17: ("A", "C", "D", "E", "F", "G", "HNY", "IL", "K", "M", "P", "Q", "R", "S", "T",
            "V", "W"),
        18: ("A", "C", "D", "E", "F", "G", "HNY", "I", "K", "L", "M", "P", "Q", "R", "S", "T",
            "V", "W"),
        19: ("A", "C", "D", "E", "F", "G", "HN", "I", "K", "L", "M", "P", "Q", "R", "S", "T",
            "V", "W", "Y"),
        20: ("A", "C", "D", "E", "F", "G", "H", "N", "I", "K", "L", "M", "P", "Q", "R", "S",
            "T", "V", "W", "Y"),
    },
    "10": {
        2: ("CMFILVWY", "AGTSNQDEHRKP"),
        3: ("CMFILVWY", "AGTSP", "NQDEHRK"),
        4: ("CMFWY", "ILV", "AGTS", "NQDEHRKP"),
        5: ("FWYH", "MILV", "CATSP", "G", "NQDERK"),
        6: ("FWYH", "MILV", "CATS", "P", "G", "NQDERK"),
        7: ("FWYH", "MILV", "CATS", "P", "G", "NQDE", "RK"),
        8: ("FWYH", "MILV", "CA", "NTS", "P", "G", "DE", "QRK"),
        9: ("FWYH", "ML", "IV", "CA", "NTS", "P", "G", "DE", "QRK"),
        10: ("FWY", "ML", "IV", "CA", "TS", "NH", "P", "G", "DE", "QRK"),
        11: ("FWY", "ML", "IV", "CA", "TS", "NH", "P", "G", "D", "QE", "RK"),
        12: ("FWY", "ML", "IV", "C", "A", "TS", "NH", "P", "G", "D", "QE", "RK"),
        13: ("FWY", "ML", "IV", "C", "A", "T", "S", "NH", "P", "G", "D", "QE", "RK"),
        14: ("FWY", "ML", "IV", "C", "A", "T", "S", "NH", "P", "G", "D", "QE", "R", "K"),
        15: ("FWY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "QE", "R", "K"),
        16: ("W", "FY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "QE", "R", "K"),
        17: ("W", "FY", "ML", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q", "E",
            "R", "K"),
        18: ("W", "FY", "M", "L", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q", "E",
            "R", "K"),
        19: ("W", "F", "Y", "M", "L", "IV", "C", "A", "T", "S", "N", "H", "P", "G", "D", "Q",
            "E", "R", "K"),
        20: ("W", "F", "Y", "M", "L", "I", "V", "C", "A", "T", "S", "N", "H", "P", "G", "D",
            "Q", "E", "R", "K"),
    },
    "11": {
        2: ("CFYWMLIV", "GPATSNHQEDRK"),
        3: ("CFYWMLIV", "GPATS", "NHQEDRK"),
        4: ("CFYW", "MLIV", "GPATS", "NHQEDRK"),
        5: ("CFYW", "MLIV", "G", "PATS", "NHQEDRK"),
        6: ("CFYW", "MLIV", "G", "P", "ATS", "NHQEDRK"),
        7: ("CFYW", "MLIV", "G", "P", "ATS", "NHQED", "RK"),
        8: ("CFYW", "MLIV", "G", "P", "ATS", "NH", "QED", "RK"),
        9: ("CFYW", "ML", "IV", "G", "P", "ATS", "NH", "QED", "RK"),
        10: ("C", "FYW", "ML", "IV", "G", "P", "ATS", "NH", "QED", "RK"),
        11: ("C", "FYW", "ML", "IV", "G", "P", "A", "TS", "NH", "QED", "RK"),
        12: ("C", "FYW", "ML", "IV", "G", "P", "A", "TS", "NH", "QE", "D", "RK"),
        13: ("C", "FYW", "ML", "IV", "G", "P", "A", "T", "S", "NH", "QE", "D", "RK"),
        14: ("C", "FYW", "ML", "IV", "G", "P", "A", "T", "S", "N", "H", "QE", "D", "RK"),
        15: ("C", "FYW", "ML", "IV", "G", "P", "A", "T", "S", "N", "H", "QE", "D", "R", "K"),
        16: ("C", "FY", "W", "ML", "IV", "G", "P", "A", "T", "S", "N", "H", "QE", "D", "R", "K"),
        17: ("C", "FY", "W", "ML", "IV", "G", "P", "A", "T", "S", "N", "H", "Q", "E", "D",
            "R", "K"),
        18: ("C", "FY", "W", "M", "L", "IV", "G", "P", "A", "T", "S", "N", "H", "Q", "E", "D",
            "R", "K"),
        19: ("C", "F", "Y", "W", "M", "L", "IV", "G", "P", "A", "T", "S", "N", "H", "Q", "E",
            "D", "R", "K"),
        20: ("C", "F", "Y", "W", "M", "L", "I", "V", "G", "P", "A", "T", "S", "N", "H", "Q",
            "E", "D", "R", "K"),
    },
    "12": {
        2: ("IVMLFWYC", "ARNDQEGHKPST"),
        3: ("IVLMFWC", "YA", "RNDQEGHKPST"),
        4: ("IVLMFW", "C", "YA", "RNDQEGHKPST"),
        5: ("IVLMFW", "C", "YA", "G", "RNDQEHKPST"),
        6: ("IVLMF", "WY", "C", "AH", "G", "RNDQEKPST"),
        7: ("IVLMF", "WY", "C", "AH", "GP", "R", "NDQEKST"),
        8: ("IVLMF", "WY", "C", "A", "G", "R", "Q", "NDEHKPST"),
        9: ("IVLMF", "WY", "C", "A", "G", "P", "H", "K", "RNDQEST"),
        10: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "RN", "DQEKPST"),
        11: ("IVLMF", "W", "Y", "C", "A", "H", "G", "R", "N", "Q", "DEKPST"),
        12: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "T", "RDEKPS"),
        13: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "DEKST"),
        14: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K", "DEST"),
        15: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K", "D", "EST"),
        16: ("IVLM", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K", "S", "T", "DE"),
        17: ("IVL", "M", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K", "S", "T",
            "DE"),
        18: ("IVL", "M", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K", "S", "T",
            "D", "E"),
        20: ("I", "V", "L", "M", "F", "W", "Y", "C", "A", "H", "G", "N", "Q", "P", "R", "K",
            "S", "T", "D", "E"),
    },
    "13": {
        4: ("ADKERNTSQ", "YFLIVMCWH", "G", "P"),
        12: ("A", "D", "KER", "N", "TSQ", "YF", "LIVM", "C", "W", "H", "G", "P"),
        17: ("A", "D", "KE", "R", "N", "T", "S", "Q", "Y", "F", "LIV", "M", "C", "W", "H",
            "G", "P"),
        20: ("A", "D", "K", "E", "R", "N", "T", "S", "Q", "Y", "F", "L", "I", "V", "M", "C",
            "W", "H", "G", "P"),
    },
    "14": {
        2: ("ARNDCQEGHKPST", "ILMFWYV"),
        3: ("ARNDQEGHKPST", "C", "ILMFWYV"),
        4: ("ARNDQEGHKPST", "C", "ILMFYV", "W"),
        5: ("AGPST", "RNDQEHK", "C", "ILMFYV", "W"),
        6: ("AGPST", "RNDQEK", "C", "H", "ILMFYV", "W"),
        7: ("ANDGST", "RQEK", "C", "H", "ILMFYV", "P", "W"),
        8: ("ANDGST", "RQEK", "C", "H", "ILMV", "FY", "P", "W"),
        9: ("AGST", "RQEK", "ND", "C", "H", "ILMV", "FY", "P", "W"),
        10: ("AGST", "RK", "ND", "C", "QE", "H", "ILMV", "FY", "P", "W"),
        11: ("AST", "RK", "ND", "C", "QE", "G", "H", "ILMV", "FY", "P", "W"),
        12: ("AST", "RK", "ND", "C", "QE", "G", "H", "IV", "LM", "FY", "P", "W"),
        13: ("AST", "RK", "N", "D", "C", "QE", "G", "H", "IV", "LM", "FY", "P", "W"),
        14: ("AST", "RK", "N", "D", "C", "Q", "E", "G", "H", "IV", "LM", "FY", "P", "W"),
        15: ("A", "RK", "N", "D", "C", "Q", "E", "G", "H", "IV", "LM", "FY", "P", "ST", "W"),
        16: ("A", "RK", "N", "D", "C", "Q", "E", "G", "H", "IV", "LM", "F", "P", "ST", "W", "Y"),
        17: ("A", "R", "N", "D", "C", "Q", "E", "G", "H", "IV", "LM", "K", "F", "P", "ST",
            "W", "Y"),
        18: ("A", "R", "N", "D", "C", "Q", "E", "G", "H", "IV", "LM", "K", "F", "P", "S", "T",
            "W", "Y"),
        19: ("A", "R", "N", "D", "C", "Q", "E", "G", "H", "IV", "L", "K", "M", "F", "P", "S",
            "T", "W", "Y"),
        20: ("A", "R", "N", "D", "C", "Q", "E", "G", "H", "I", "V", "L", "K", "M", "F", "P",
            "S", "T", "W", "Y"),
    },
    "15": {
        2: ("MFILVAW", "CYQHPGTSNRKDE"),
        3: ("MFILVAW", "CYQHPGTSNRK", "DE"),
        4: ("MFILV", "ACW", "YQHPGTSNRK", "DE"),
        5: ("MFILV", "ACW", "YQHPGTSN", "RK", "DE"),
        6: ("MFILV", "A", "C", "WYQHPGTSN", "RK", "DE"),
        7: ("MFILV", "A", "C", "WYQHP", "GTSN", "RK", "DE"),
        8: ("MFILV", "A", "C", "WYQHP", "G", "TSN", "RK", "DE"),
        9: ("MF", "ILV", "A", "C", "WYQHP", "G", "TSN", "RK", "DE"),
        10: ("MF", "ILV", "A", "C", "WYQHP", "G", "TSN", "RK", "D", "E"),
        11: ("MF", "IL", "V", "A", "C", "WYQHP", "G", "TSN", "RK", "D", "E"),
        12: ("MF", "IL", "V", "A", "C", "WYQHP", "G", "TS", "N", "RK", "D", "E"),
        13: ("MF", "IL", "V", "A", "C", "WYQHP", "G", "T", "S", "N", "RK", "D", "E"),
        14: ("MF", "I", "L", "V", "A", "C", "WYQHP", "G", "T", "S", "N", "RK", "D", "E"),
        15: ("MF", "IL", "V", "A", "C", "WYQ", "H", "P", "G", "T", "S", "N", "RK", "D", "E"),
        16: ("MF", "I", "L", "V", "A", "C", "WYQ", "H", "P", "G", "T", "S", "N", "RK", "D", "E"),
        20: ("M", "F", "I", "L", "V", "A", "C", "W", "Y", "Q", "H", "P", "G", "T", "S", "N",
            "R", "K", "D", "E"),
    },
    "16": {
        2: ("IMVLFWY", "GPCASTNHQEDRK"),
        3: ("IMVLFWY", "GPCAST", "NHQEDRK"),
        4: ("IMVLFWY", "G", "PCAST", "NHQEDRK"),
        5: ("IMVL", "FWY", "G", "PCAST", "NHQEDRK"),
        6: ("IMVL", "FWY", "G", "P", "CAST", "NHQEDRK"),
        7: ("IMVL", "FWY", "G", "P", "CAST", "NHQED", "RK"),
        8: ("IMV", "L", "FWY", "G", "P", "CAST", "NHQED", "RK"),
        9: ("IMV", "L", "FWY", "G", "P", "C", "AST", "NHQED", "RK"),
        10: ("IMV", "L", "FWY", "G", "P", "C", "A", "STNH", "RKQE", "D"),
        11: ("IMV", "L", "FWY", "G", "P", "C", "A", "STNH", "RKQ", "E", "D"),
        12: ("IMV", "L", "FWY", "G", "P", "C", "A", "ST", "N", "HRKQ", "E", "D"),
        13: ("IMV", "L", "F", "WY", "G", "P", "C", "A", "ST", "N", "HRKQ", "E", "D"),
        14: ("IMV", "L", "F", "WY", "G", "P", "C", "A", "S", "T", "N", "HRKQ", "E", "D"),
        15: ("IMV", "L", "F", "WY", "G", "P", "C", "A", "S", "T", "N", "H", "RKQ", "E", "D"),
        16: ("IMV", "L", "F", "W", "Y", "G", "P", "C", "A", "S", "T", "N", "H", "RKQ", "E", "D"),
        20: ("I", "M", "V", "L", "F", "W", "Y", "G", "P", "C", "A", "S", "T", "N", "H", "R",
            "K", "Q", "E", "D"),
    },
}


def psekraac_alphabet(ptype: str, raactype: int) -> dict[str, str]:
    """Token→group map for one (PseKRAAC type, RAAC cluster count) choice,
    e.g. psekraac_alphabet("5", 8) — the table a user of the reference's
    "PseKRAAC type 5, 8 clusters" selects. Feed to pairs.gap_model /
    pairs.lambda_model (the parameterized gapModel/lambdaModel operators)
    exactly like any PROTEIN_ALPHABETS entry."""
    try:
        groups = PSEKRAAC_CLUSTERS[str(ptype).lower()][int(raactype)]
    except KeyError:
        have = {t: sorted(v) for t, v in PSEKRAAC_CLUSTERS.items()}
        raise KeyError(
            f"PseKRAAC type={ptype!r} raactype={raactype!r} not defined; "
            f"available: {have}"
        ) from None
    return {
        aa: f"T1.G.{i + 1}" for i, cluster in enumerate(groups) for aa in cluster
    }


# --- OPF overlapping-property multi-hot tables (judge round-3 ask #4) ---
# The reference's four OPF group lists, verbatim ordered data
# (_OPF_10bit feature.py:2386-2418; _OPF_7bit_type_1/2/3 feature.py:
# 2425-2514): per position, one indicator bit per PROPERTY GROUP, and a
# residue may set several bits because the groups overlap (e.g. H is
# aromatic + positive + polar + hydrophobic + charged). Consumed by
# encode.positional_multihot. Public physicochemical classifications.
OPF_TABLES: dict[str, list[tuple[str, str]]] = {
    "opf10": [
        ("aromatic", "FYWH"), ("negative", "DE"), ("positive", "KHR"),
        ("polar", "NQSDECTKRHYW"), ("hydrophobic", "AGCTIVLKHFYWM"),
        ("aliphatic", "IVL"), ("tiny", "ASGC"), ("charged", "KHRDE"),
        ("small", "PNDTCAGSV"), ("proline", "P"),
    ],
    "opf7_t1": [
        ("charge", "ACFGHILMNPQSTVWY"), ("hydrophobicity", "CFILMVW"),
        ("vdw_volume", "ACDGPST"), ("polarity", "CFILMVWY"),
        ("polarizability", "ADGST"), ("secondary_structure", "DGNPS"),
        ("solvent_accessibility", "ACFGILVW"),
    ],
    "opf7_t2": [
        ("charge", "DE"), ("hydrophobicity", "AGHPSTY"),
        ("vdw_volume", "EILNQV"), ("polarity", "AGPST"),
        ("polarizability", "CEILNPQV"), ("secondary_structure", "AEHKLMQR"),
        ("solvent_accessibility", "HMPSTY"),
    ],
    "opf7_t3": [
        ("charge", "KR"), ("hydrophobicity", "DEKNQR"),
        ("vdw_volume", "FHKMRWY"), ("polarity", "DEHKNQR"),
        ("polarizability", "FHKMRWY"), ("secondary_structure", "CFITVWY"),
        ("solvent_accessibility", "DEKNRQ"),
    ],
}


# BLOSUM62 substitution-matrix rows (feature.py:1387-1409; the standard
# public BLOSUM62 matrix, Henikoff & Henikoff 1992): token → 20-vector in
# ARNDCQEGHILKMFPSTWYV column order, '-' pad → zeros — the _BLOSUM62
# positional encoding's data, consumable via property_tables /
# encode.property_channels exactly like ZSCALE/AESNN3.
BLOSUM62: dict[str, list[float]] = {
    "A": [4, -1, -2, -2, 0, -1, -1, 0, -2, -1, -1, -1, -1, -2, -1, 1, 0, -3, -2, 0],
    "R": [-1, 5, 0, -2, -3, 1, 0, -2, 0, -3, -2, 2, -1, -3, -2, -1, -1, -3, -2, -3],
    "N": [-2, 0, 6, 1, -3, 0, 0, 0, 1, -3, -3, 0, -2, -3, -2, 1, 0, -4, -2, -3],
    "D": [-2, -2, 1, 6, -3, 0, 2, -1, -1, -3, -4, -1, -3, -3, -1, 0, -1, -4, -3, -3],
    "C": [0, -3, -3, -3, 9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1],
    "Q": [-1, 1, 0, 0, -3, 5, 2, -2, 0, -3, -2, 1, 0, -3, -1, 0, -1, -2, -1, -2],
    "E": [-1, 0, 0, 2, -4, 2, 5, -2, 0, -3, -3, 1, -2, -3, -1, 0, -1, -3, -2, -2],
    "G": [0, -2, 0, -1, -3, -2, -2, 6, -2, -4, -4, -2, -3, -3, -2, 0, -2, -2, -3, -3],
    "H": [-2, 0, 1, -1, -3, 0, 0, -2, 8, -3, -3, -1, -2, -1, -2, -1, -2, -2, 2, -3],
    "I": [-1, -3, -3, -3, -1, -3, -3, -4, -3, 4, 2, -3, 1, 0, -3, -2, -1, -3, -1, 3],
    "L": [-1, -2, -3, -4, -1, -2, -3, -4, -3, 2, 4, -2, 2, 0, -3, -2, -1, -2, -1, 1],
    "K": [-1, 2, 0, -1, -3, 1, 1, -2, -1, -3, -2, 5, -1, -3, -1, 0, -1, -3, -2, -2],
    "M": [-1, -1, -2, -3, -1, 0, -2, -3, -2, 1, 2, -1, 5, 0, -2, -1, -1, -1, -1, 1],
    "F": [-2, -3, -3, -3, -2, -3, -3, -3, -1, 0, 0, -3, 0, 6, -4, -2, -2, 1, 3, -1],
    "P": [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4, 7, -1, -1, -4, -3, -2],
    "S": [1, -1, 1, 0, -1, 0, 0, 0, -1, -2, -2, 0, -1, -2, -1, 4, 1, -3, -2, -2],
    "T": [0, -1, 0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1, 1, 5, -2, -2, 0],
    "W": [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1, 1, -4, -3, -2, 11, 2, -3],
    "Y": [-2, -2, -2, -3, -2, -1, -2, -3, 2, -1, -1, -2, -1, 3, -3, -2, -2, 2, 7, -1],
    "V": [0, -3, -3, -3, -1, -2, -2, -3, -3, 3, 1, -2, 1, -1, -2, -2, 0, -3, -1, 4],
    "-": [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
}
