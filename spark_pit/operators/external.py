"""Executor-local external-tool hook (SURVEY §2.8 closure path).

The reference shells out to scientific binaries the sandbox cannot ship —
msms for solvent-excluded-surface residue depth (reference
feature.py:4219-4240 via Bio.PDB ResidueDepth) and DSSP for SS8/SS3
secondary-structure annotation (feature.py:4087 via Bio.PDB DSSP). The
Spark-native analogues (`rangejoin.surface_depth_3d`, the synthetic ss8
state columns) are the certified in-sandbox fallbacks; this module is the
honest scale path for clusters where the binaries DO exist.

Shape: one `applyInPandas` per ENTITY (a protein structure is the tool's
natural invocation unit) — the group's rows are written to the tool's
input format in an executor-local temp dir, the binary runs as an
executor-local subprocess (no driver round-trip, no shared filesystem),
and its output is parsed back into the group's result rows. Tool
invocations parallelize exactly like any other task: 1000 executors run
1000 concurrent msms processes, and Spark's retry machinery covers tool
crashes (a non-zero exit raises, failing the task, which retries on
another executor).

Degrade contract: every wrapper probes the binary DRIVER-side at plan
build (fail fast, before any cluster work) and again EXECUTOR-side inside
the task (heterogeneous clusters), raising `ExternalToolUnavailable` with
a pointer at the certified fallback. Tests exercise the full subprocess +
parse plumbing with deterministic stand-in scripts, and the degrade path
with a missing binary (tests/test_external.py).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pandas as pd
from pyspark.sql import DataFrame


class ExternalToolUnavailable(RuntimeError):
    """The executor-local binary is absent; use the certified fallback."""


def resolve_tool(binary: str, fallback_hint: str) -> str:
    """Resolve ``binary`` to an executable path or raise
    ExternalToolUnavailable naming the in-engine fallback. Paths with a
    separator are checked directly; bare names go through PATH."""
    if os.sep in binary:
        if os.path.isfile(binary) and os.access(binary, os.X_OK):
            return binary
    else:
        found = shutil.which(binary)
        if found:
            return found
    raise ExternalToolUnavailable(
        f"external tool {binary!r} not found or not executable; "
        f"fallback: {fallback_hint}"
    )


def _run(argv: list[str], cwd: str) -> None:
    """Run the tool executor-side; surface a bounded stderr tail on
    failure so task logs carry the tool's own diagnostic."""
    proc = subprocess.run(
        argv, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=600,
    )
    if proc.returncode != 0:
        tail = proc.stderr.decode(errors="replace")[-2000:]
        raise RuntimeError(
            f"external tool failed ({argv[0]}, exit {proc.returncode}): {tail}"
        )


def run_tool_per_entity(
    df: DataFrame,
    entity: str,
    out_schema: str,
    invoke,
) -> DataFrame:
    """Generic hook: ``invoke(pdf, workdir) -> pd.DataFrame`` runs once
    per entity group inside `applyInPandas`, with an executor-local temp
    dir that is removed after the call. `invoke` writes the tool input,
    shells out via `_run`, parses the output. Keep the returned frame's
    columns matching ``out_schema``."""
    import tempfile

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        with tempfile.TemporaryDirectory(prefix="spark_pit_tool_") as wd:
            return invoke(pdf, wd)

    return df.groupBy(entity).applyInPandas(fn, out_schema)


def residue_depth_msms(
    df: DataFrame,
    entity: str,
    coords: tuple[str, str, str],
    id_col: str,
    radius_col: str | None = None,
    msms_bin: str = "msms",
    probe_radius: float = 1.5,
    density: float = 1.0,
) -> DataFrame:
    """True solvent-excluded-surface residue depth via an executor-local
    msms run (reference get_residue_depth, feature.py:4219-4240): per
    entity the atom cloud is written in msms's xyzr format, `msms -if in
    -of out` triangulates the SES, and each atom's depth is its minimum
    euclidean distance to the surface vertices (.vert file) — the exact
    definition Bio.PDB ResidueDepth computes, here distributed one
    structure per task.

    Raises ExternalToolUnavailable at plan build when msms is absent;
    the certified geometric fallback is rangejoin.surface_depth_3d."""
    resolved = resolve_tool(
        msms_bin,
        "spark_pit.operators.rangejoin.surface_depth_3d "
        "(certified circumscribed-sphere analogue)",
    )
    cx, cy, cz = coords
    ent_t = df.schema[entity].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{entity} {ent_t}, {id_col} {id_t}, depth double"

    def invoke(pdf: pd.DataFrame, wd: str) -> pd.DataFrame:
        import numpy as np

        # executor-side re-probe: driver and executors may differ
        resolve_tool(resolved, "rangejoin.surface_depth_3d")
        xyz = pdf[[cx, cy, cz]].to_numpy(dtype="float64")
        r = (
            pdf[radius_col].to_numpy(dtype="float64")
            if radius_col else np.full(len(pdf), 1.8)
        )
        inp = os.path.join(wd, "atoms.xyzr")
        with open(inp, "w") as fh:
            for (x, y, z), rad in zip(xyz, r):
                fh.write(f"{x:.6f} {y:.6f} {z:.6f} {rad:.3f}\n")
        _run(
            [resolved, "-if", inp, "-of", os.path.join(wd, "surf"),
             "-probe_radius", str(probe_radius), "-density", str(density)],
            wd,
        )
        # .vert: 3 header lines, then "x y z nx ny nz ..." per vertex
        verts = []
        with open(os.path.join(wd, "surf.vert")) as fh:
            for i, line in enumerate(fh):
                if i < 3:
                    continue
                parts = line.split()
                if len(parts) >= 3:
                    verts.append([float(parts[0]), float(parts[1]), float(parts[2])])
        v = np.asarray(verts, dtype="float64")
        if not len(v):
            depth = np.full(len(pdf), np.nan)
        else:
            # min distance atom -> surface vertex; structures are small
            # (thousands of atoms), the pairwise block is per-task local
            d2 = ((xyz[:, None, :] - v[None, :, :]) ** 2).sum(axis=2)
            depth = np.sqrt(d2.min(axis=1))
        return pd.DataFrame(
            {entity: pdf[entity], id_col: pdf[id_col], "depth": depth}
        )

    return run_tool_per_entity(
        df.select(entity, id_col, cx, cy, cz, *( [radius_col] if radius_col else [] )),
        entity, out_schema, invoke,
    )


def secondary_structure_dssp(
    df: DataFrame,
    entity: str,
    resi_col: str,
    coords: tuple[str, str, str],
    aa_col: str,
    dssp_bin: str = "mkdssp",
) -> DataFrame:
    """SS8 secondary-structure annotation via an executor-local DSSP run
    (reference feature.py:4087, Bio.PDB DSSP): per entity a minimal
    CA-trace PDB is written, `mkdssp in.pdb out.dssp` runs, and the SS8
    letter per residue number is parsed from the DSSP table (blank SS →
    'C' coil, the Bio.PDB convention). Downstream shell/SS-composition
    operators consume the ss8 column exactly as they consume the
    synthetic state columns today.

    Raises ExternalToolUnavailable when DSSP is absent; the certified
    fallback is the synthetic ss8 assignment used by the shell
    composition queries."""
    resolved = resolve_tool(
        dssp_bin,
        "synthetic ss8 state columns (certified shell-composition input)",
    )
    cx, cy, cz = coords
    ent_t = df.schema[entity].dataType.simpleString()
    resi_t = df.schema[resi_col].dataType.simpleString()
    out_schema = f"{entity} {ent_t}, {resi_col} {resi_t}, ss8 string"

    def invoke(pdf: pd.DataFrame, wd: str) -> pd.DataFrame:
        resolve_tool(resolved, "synthetic ss8 state columns")
        pdf = pdf.sort_values(resi_col, kind="stable")
        pdb = os.path.join(wd, "in.pdb")
        with open(pdb, "w") as fh:
            for i, row in enumerate(pdf.itertuples(index=False), start=1):
                resi = int(getattr(row, resi_col))
                aa3 = _AA3.get(str(getattr(row, aa_col)).upper(), "GLY")
                fh.write(
                    f"ATOM  {i:>5}  CA  {aa3} A{resi:>4}    "
                    f"{getattr(row, cx):8.3f}{getattr(row, cy):8.3f}"
                    f"{getattr(row, cz):8.3f}  1.00  0.00           C\n"
                )
            fh.write("END\n")
        out = os.path.join(wd, "out.dssp")
        _run([resolved, pdb, out], wd)
        ss_by_resi: dict[int, str] = {}
        in_table = False
        with open(out) as fh:
            for line in fh:
                if line.startswith("  #  RESIDUE"):
                    in_table = True
                    continue
                if in_table and len(line) > 16:
                    try:
                        resnum = int(line[5:10])
                    except ValueError:
                        continue  # chain breaks ('!') have no resnum
                    ss = line[16]
                    ss_by_resi[resnum] = ss if ss != " " else "C"
        return pd.DataFrame(
            {
                entity: pdf[entity],
                resi_col: pdf[resi_col],
                "ss8": [
                    ss_by_resi.get(int(r)) for r in pdf[resi_col]
                ],
            }
        )

    return run_tool_per_entity(
        df.select(entity, resi_col, cx, cy, cz, aa_col),
        entity, out_schema, invoke,
    )


# 1-letter -> 3-letter amino-acid codes for the minimal CA-trace PDB
_AA3 = {
    "A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE",
    "G": "GLY", "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU",
    "M": "MET", "N": "ASN", "P": "PRO", "Q": "GLN", "R": "ARG",
    "S": "SER", "T": "THR", "V": "VAL", "W": "TRP", "Y": "TYR",
}
