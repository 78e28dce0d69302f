"""Executor-local external-tool hook: full subprocess+parse plumbing via
deterministic stand-in binaries, and the degrade contract when the real
binary is absent (msms / DSSP are not shippable in this sandbox — the
stand-ins exercise every line of the hook except the tool's own math)."""

import os
import stat
import textwrap

import numpy as np
import pandas as pd
import pytest

from spark_pit.operators.external import (
    ExternalToolUnavailable,
    residue_depth_msms,
    secondary_structure_dssp,
)


def _mk_atoms(spark):
    rows = []
    rng = np.random.default_rng(7)
    for ent in ["p1", "p2"]:
        for i in range(8):
            x, y, z = rng.uniform(-5, 5, 3).round(3)
            rows.append((ent, i, float(x), float(y), float(z), 1.5 + 0.1 * i,
                         "ACDEFGHI"[i]))
    return spark.createDataFrame(
        rows, "ent string, atom_id int, x double, y double, z double, "
              "r double, aa string"
    )


def _write_exec(path: str, body: str) -> str:
    with open(path, "w") as fh:
        fh.write("#!/usr/bin/env python3\n" + textwrap.dedent(body))
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return path


FAKE_MSMS = """
    import sys
    # args: -if IN -of OUTPREFIX -probe_radius P -density D
    a = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    atoms = [list(map(float, l.split())) for l in open(a["-if"]) if l.strip()]
    with open(a["-of"] + ".vert", "w") as fh:
        fh.write("# fake msms vert\\n#\\n%d 0 0 0\\n" % len(atoms))
        for x, y, z, r in atoms:
            # one deterministic surface vertex per atom: shifted +r in x
            fh.write("%.6f %.6f %.6f 0 0 0\\n" % (x + r, y, z))
"""

FAKE_DSSP = """
    import sys
    pdb, out = sys.argv[1], sys.argv[2]
    resis = []
    for line in open(pdb):
        if line.startswith("ATOM"):
            resis.append(int(line[22:26]))
    with open(out, "w") as fh:
        fh.write("==== fake DSSP ====\\n")
        fh.write("  #  RESIDUE AA STRUCTURE\\n")
        for i, resnum in enumerate(resis, start=1):
            ss = "HGIEBTS "[resnum % 8]   # blank -> coil on the parse side
            fh.write("%5d%5d A X  %s\\n" % (i, resnum, ss))
"""


def test_residue_depth_msms_degrades_with_pointer(spark):
    atoms = _mk_atoms(spark)
    with pytest.raises(ExternalToolUnavailable, match="surface_depth_3d"):
        residue_depth_msms(
            atoms, "ent", ("x", "y", "z"), "atom_id",
            radius_col="r", msms_bin="no_such_msms_binary_xyz",
        )


def test_dssp_degrades_with_pointer(spark):
    atoms = _mk_atoms(spark)
    with pytest.raises(ExternalToolUnavailable, match="ss8"):
        secondary_structure_dssp(
            atoms, "ent", "atom_id", ("x", "y", "z"), "aa",
            dssp_bin="no_such_dssp_binary_xyz",
        )


def test_residue_depth_msms_fake_tool_end_to_end(spark, tmp_path):
    """The hook writes xyzr, invokes the (stand-in) binary executor-side,
    parses .vert, and emits min-distance depth per atom — verified
    against a NumPy recomputation of the stand-in's deterministic
    surface."""
    fake = _write_exec(str(tmp_path / "fake_msms"), FAKE_MSMS)
    atoms = _mk_atoms(spark)
    out = residue_depth_msms(
        atoms, "ent", ("x", "y", "z"), "atom_id", radius_col="r",
        msms_bin=fake,
    ).toPandas().set_index(["ent", "atom_id"]).sort_index()

    pdf = atoms.toPandas()
    for ent, grp in pdf.groupby("ent"):
        xyz = grp[["x", "y", "z"]].to_numpy()
        verts = xyz + np.c_[grp["r"].to_numpy(), np.zeros(len(grp)), np.zeros(len(grp))]
        d = np.sqrt(((xyz[:, None, :] - verts[None, :, :]) ** 2).sum(axis=2)).min(axis=1)
        got = out.loc[ent].sort_index()["depth"].to_numpy()
        want = pd.Series(d, index=grp["atom_id"].to_numpy()).sort_index().to_numpy()
        assert np.allclose(got, want, atol=1e-9)
    assert len(out) == len(pdf)


def test_dssp_fake_tool_end_to_end(spark, tmp_path):
    """PDB write -> subprocess -> DSSP-format parse, including the
    blank-SS -> 'C' coil convention."""
    fake = _write_exec(str(tmp_path / "fake_dssp"), FAKE_DSSP)
    atoms = _mk_atoms(spark)
    out = secondary_structure_dssp(
        atoms, "ent", "atom_id", ("x", "y", "z"), "aa", dssp_bin=fake,
    ).toPandas().set_index(["ent", "atom_id"]).sort_index()

    want_cycle = "HGIEBTS "
    for (ent, resi), row in out.iterrows():
        want = want_cycle[resi % 8]
        assert row["ss8"] == (want if want != " " else "C")
    assert len(out) == 16
    assert (out["ss8"] == "C").any()  # the blank->coil path actually ran
