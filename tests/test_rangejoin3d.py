"""3-D banded range join: the 27-cell composite-band equi-join must agree
with brute-force euclidean shell assignment, including points that sit in
diagonal neighbor cells and points just inside/outside the reach."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spark_pit.operators.rangejoin import shell_composition_3d


def test_shell_3d_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    shell_width, n_shells = 1.0, 3  # reach 3.0, cell size 3.0
    pts = []
    # deliberate geometry around probe (0,0,0): on-axis, diagonal-cell,
    # boundary-straddling, and out-of-reach points
    fixed = [
        (0.0, 0.0, 0.0),      # the probe itself → shell 0
        (0.5, 0.0, 0.0),      # shell 0
        (1.5, 0.0, 0.0),      # shell 1
        (2.9, 0.0, 0.0),      # shell 2
        (3.1, 0.0, 0.0),      # out (d > 3.0) but same/adjacent cell
        (2.0, 2.0, 0.0),      # d≈2.83 → shell 2, diagonal cell
        (1.8, 1.8, 1.8),      # d≈3.12 → out, diagonal cell
        (-1.2, 0.3, -0.4),    # negative coords (floor band correctness)
        (-2.95, -0.1, 0.0),   # d≈2.95 → shell 2, negative neighbor cell
    ]
    for i, (x, y, z) in enumerate(fixed):
        pts.append((1, i, "a" if i % 2 == 0 else "b", x, y, z))
    # random cloud, both entities
    for i, v in enumerate(rng.uniform(-5, 5, size=(60, 3))):
        pts.append((1 + i % 2, 100 + i, "c", *map(float, v)))
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["ent", "pid", "tok", "x", "y", "z"])
    )
    probes = df.where("pid == 0 or pid == 101").selectExpr(
        "ent", "pid as probe_id", "x", "y", "z"
    )
    out = shell_composition_3d(
        df, probes, entity="ent", coords=("x", "y", "z"), token_col="tok",
        probe_id="probe_id", shell_width=shell_width, n_shells=n_shells,
    ).toPandas()

    # brute force
    pdf = pd.DataFrame(pts, columns=["ent", "pid", "tok", "x", "y", "z"])
    want: dict[tuple, int] = {}
    for _, q in pdf[pdf["pid"].isin([0, 101])].iterrows():
        sub = pdf[pdf["ent"] == q["ent"]]
        d = np.sqrt(
            (sub["x"] - q["x"]) ** 2 + (sub["y"] - q["y"]) ** 2
            + (sub["z"] - q["z"]) ** 2
        )
        for tok, dist in zip(sub["tok"], d):
            if dist < shell_width * n_shells:
                key = (q["pid"], int(dist // shell_width), tok)
                want[key] = want.get(key, 0) + 1
    got = {
        (r.probe_id, r.shell, r.tok): r.n for r in out.itertuples()
    }
    assert got == want
    # freq normalizes within (probe, shell)
    sums = out.groupby(["probe_id", "shell"])["freq"].sum()
    assert np.allclose(sums, 1.0)


def test_half_exposure_3d_matches_brute_force(spark):
    """HSE (pseudo-CB orientation + half-space split) vs a per-node numpy
    brute force, including diagonal-cell neighbors, chain endpoints
    (skipped), and multi-entity isolation."""
    from spark_pit.operators.rangejoin import half_exposure_3d

    rng = np.random.default_rng(23)
    rows = []
    for ent in (1, 2):
        n = 25 if ent == 1 else 12
        coords = rng.uniform(-6, 6, size=(n, 3))
        for i, (x, y, z) in enumerate(coords):
            rows.append((ent, i, float(i), float(x), float(y), float(z)))
    pdf = pd.DataFrame(rows, columns=["ent", "nid", "ord", "x", "y", "z"])
    df = spark.createDataFrame(pdf)
    radius = 4.0
    out = half_exposure_3d(
        df, entity="ent", node_id="nid", coords=("x", "y", "z"),
        order_col="ord", radius=radius,
    ).toPandas().set_index(["ent", "node"]).sort_index()

    want = {}
    for ent, sub in pdf.groupby("ent"):
        sub = sub.sort_values(["ord", "nid"]).reset_index(drop=True)
        P = sub[["x", "y", "z"]].to_numpy()
        for i in range(1, len(sub) - 1):
            u = 2 * P[i] - P[i - 1] - P[i + 1]
            d = P - P[i]
            mask = (np.einsum("ij,ij->i", d, d) <= radius * radius)
            mask[i] = False
            dots = d[mask] @ u
            want[(ent, sub.loc[i, "nid"])] = (
                int((dots > 0).sum()), int((dots <= 0).sum()),
                round(float(np.sqrt(u @ u)), 6),
            )
    assert set(out.index) == set(want)
    for key, (up, down, un) in want.items():
        got = out.loc[key]
        assert got["hse_up"] == up and got["hse_down"] == down, key
        assert abs(got["u_norm"] - un) < 1e-9


def test_surface_depth_3d_matches_brute_force(spark):
    """Circumscribed-sphere depth: R − |p − centroid| per entity, centroid
    from int64 nano-unit sums (the cross-engine determinism discipline)."""
    from spark_pit.operators.rangejoin import surface_depth_3d

    rng = np.random.default_rng(31)
    rows = []
    for ent in (1, 2):
        for i, (x, y, z) in enumerate(rng.uniform(-3, 3, size=(15, 3))):
            rows.append((ent, i, float(x), float(y), float(z)))
    pdf = pd.DataFrame(rows, columns=["ent", "nid", "x", "y", "z"])
    out = (
        surface_depth_3d(spark.createDataFrame(pdf), "ent", ("x", "y", "z"))
        .toPandas().set_index(["ent", "nid"])
    )
    for ent, sub in pdf.groupby("ent"):
        P = sub[["x", "y", "z"]].to_numpy()
        c = np.floor(P * 1e9 + 0.5).sum(axis=0) / len(P) / 1e9
        d = np.sqrt(((P - c) ** 2).sum(axis=1))
        want = d.max() - d
        for j, nid in enumerate(sub["nid"]):
            assert abs(out.loc[(ent, nid), "depth"] - want[j]) < 1e-9
        # surface point exists (depth exactly 0 at the max-radius point)
        assert out.loc[ent]["depth"].min() == 0.0
