"""Banded range join + shell composition (SURVEY.md §2.8).

The reference's iStructure descriptors build, for every probe residue, the
set of residues within annular distance shells and aggregate composition
per shell (`AAC_type1` feature.py:4266-4290 over the per-probe distance
frame built at feature.py:4107-4121 — a full O(N^2) rebuild per probe).

Spark shape: a **banded equi-join**. A raw range predicate
``abs(p.v - x.v) < max_dist`` would execute as BroadcastNestedLoopJoin
(O(N*M)); instead each probe row is exploded into the fixed set of bands
its radius can reach (``max_dist / band_width + 1`` copies), the join runs
as a hash equi-join on (entity, band), and the true distance predicate
filters the few candidates inside matching bands. This is the standard
interval-bucketing trick (same as the minhash band join in dedup.py).

Here the 1-D coordinate is a numeric channel of the event (the engine's
analogue of the 3-D residue distance); the same plan generalizes to any
monotone banding key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shell_composition(
    points: DataFrame,
    probes: DataFrame,
    entity: str,
    coord: str,
    token_col: str,
    probe_id: str,
    shell_width: float,
    n_shells: int,
) -> DataFrame:
    """Per (probe, shell) token composition, shell s covering
    ``s*shell_width <= |probe.coord - point.coord| < (s+1)*shell_width``
    (annular, AAC_type1 semantics; the point at distance 0 — the probe
    itself — lands in shell 0 like the reference's self row).

    Returns (probe_id, shell, token, n, freq) — freq normalized within the
    (probe, shell) ball like feature.py:4284-4287.
    """
    max_dist = shell_width * n_shells
    band = shell_width  # band width = shell width keeps candidates tight

    pts = points.select(
        F.col(entity).alias("__pe"),
        F.col(coord).alias("__pv"),
        F.col(token_col).alias("__ptok"),
        F.floor(F.col(coord) / band).cast("long").alias("__pband"),
    )
    n_bands = int(max_dist / band) + 1
    prb = probes.select(
        F.col(entity).alias("__qe"),
        F.col(coord).alias("__qv"),
        F.col(probe_id).alias("probe_id"),
    ).withColumn(
        "__pband",
        F.explode(
            F.sequence(
                (F.floor(F.col("__qv") / band) - n_bands).cast("long"),
                (F.floor(F.col("__qv") / band) + n_bands).cast("long"),
            )
        ),
    )
    joined = prb.join(
        pts, (F.col("__qe") == F.col("__pe")) & (prb["__pband"] == pts["__pband"])
    ).select(
        "probe_id",
        F.col("__qe").alias(entity),
        F.col("__ptok").alias(token_col),
        F.abs(F.col("__qv") - F.col("__pv")).alias("__d"),
    ).where(F.col("__d") < max_dist)
    shelled = joined.withColumn(
        "shell", F.floor(F.col("__d") / F.lit(shell_width)).cast("int")
    )
    counts = shelled.groupBy("probe_id", entity, "shell", token_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    # entity in the partition: probe ids need only be unique per entity
    # (round-4 advice, rangejoin.py:196)
    tot = F.sum("n").over(Window.partitionBy(entity, "probe_id", "shell"))
    return counts.withColumn("freq", F.col("n") / tot)


def ball_composition(
    points: DataFrame,
    probes: DataFrame,
    entity: str,
    coord: str,
    token_col: str,
    probe_id: str,
    shell_width: float,
    n_shells: int,
) -> DataFrame:
    """Cumulative-ball variant (AAC_type2, feature.py:4292-4316): shell s
    counts every point with ``dist < (s+1)*shell_width`` — built as a
    running sum over the annular counts (one extra window, no second join).
    Returns (probe_id, entity, shell, token, n, freq)."""
    annular = shell_composition(
        points, probes, entity, coord, token_col, probe_id, shell_width, n_shells
    ).drop("freq")
    shells = annular.sparkSession.range(n_shells).select(
        F.col("id").cast("int").alias("ball")
    )
    # cumulative: ball b aggregates annular shells 0..b
    cum = (
        annular.join(F.broadcast(shells), annular["shell"] <= shells["ball"])
        .groupBy("probe_id", entity, "ball", token_col)
        .agg(F.sum("n").alias("n"))
        .withColumnRenamed("ball", "shell")
    )
    # entity in the partition: probe ids need only be unique per entity
    # (round-4 advice, rangejoin.py:196)
    tot = F.sum("n").over(Window.partitionBy(entity, "probe_id", "shell"))
    return cum.withColumn("freq", F.col("n") / tot)


def shell_composition_3d(
    points: DataFrame,
    probes: DataFrame,
    entity: str,
    coords: tuple[str, str, str],
    token_col: str,
    probe_id: str,
    shell_width: float,
    n_shells: int,
) -> DataFrame:
    """3-D euclidean annular shells — the EXACT reference geometry
    (feature.py:4115-4121 builds per-probe 3-D residue distances;
    AAC_type1 feature.py:4266-4290 aggregates per shell), generalizing
    the 1-D banded join: the composite cell key is
    ``(floor(x/c), floor(y/c), floor(z/c))`` with cell size c = reach =
    shell_width·n_shells, each probe is expanded to its 27 neighboring
    cells (3³ fixed copies — a constant, NOT data-dependent), and the
    join runs as ONE hash equi-join on (entity, cx, cy, cz); the true
    euclidean predicate (compared squared, sqrt only for the surviving
    rows' shell index) filters the candidates. No nested loop at any
    scale — the plan is the same single Exchange-on-key shape as every
    other banded join in this module. Returns
    (probe_id, entity, shell, token, n, freq) with AAC_type1's in-shell
    normalization."""
    cx, cy, cz = coords
    max_dist = shell_width * n_shells
    cell = max_dist
    spark = points.sparkSession
    offsets = spark.createDataFrame(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        "dx long, dy long, dz long",
    )
    pts = points.select(
        F.col(entity).alias("__pe"),
        F.col(cx).alias("__px"), F.col(cy).alias("__py"), F.col(cz).alias("__pz"),
        F.col(token_col).alias("__ptok"),
        F.floor(F.col(cx) / cell).cast("long").alias("__cx"),
        F.floor(F.col(cy) / cell).cast("long").alias("__cy"),
        F.floor(F.col(cz) / cell).cast("long").alias("__cz"),
    )
    prb = (
        probes.select(
            F.col(entity).alias("__qe"),
            F.col(cx).alias("__qx"), F.col(cy).alias("__qy"), F.col(cz).alias("__qz"),
            F.col(probe_id).alias("probe_id"),
        )
        .crossJoin(F.broadcast(offsets))
        .select(
            "__qe", "__qx", "__qy", "__qz", "probe_id",
            (F.floor(F.col("__qx") / cell).cast("long") + F.col("dx")).alias("__cx"),
            (F.floor(F.col("__qy") / cell).cast("long") + F.col("dy")).alias("__cy"),
            (F.floor(F.col("__qz") / cell).cast("long") + F.col("dz")).alias("__cz"),
        )
    )
    d2 = (
        (F.col("__qx") - F.col("__px")) * (F.col("__qx") - F.col("__px"))
        + (F.col("__qy") - F.col("__py")) * (F.col("__qy") - F.col("__py"))
        + (F.col("__qz") - F.col("__pz")) * (F.col("__qz") - F.col("__pz"))
    )
    joined = (
        prb.join(
            pts,
            (F.col("__qe") == F.col("__pe"))
            & (prb["__cx"] == pts["__cx"])
            & (prb["__cy"] == pts["__cy"])
            & (prb["__cz"] == pts["__cz"]),
        )
        .withColumn("__d2", d2)
        .where(F.col("__d2") < F.lit(max_dist * max_dist))
        .select(
            "probe_id",
            F.col("__qe").alias(entity),
            F.col("__ptok").alias(token_col),
            F.floor(F.sqrt(F.col("__d2")) / F.lit(shell_width)).cast("int").alias("shell"),
        )
    )
    counts = joined.groupBy("probe_id", entity, "shell", token_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    # entity in the partition: probe ids need only be unique per entity
    # (round-4 advice, rangejoin.py:196)
    tot = F.sum("n").over(Window.partitionBy(entity, "probe_id", "shell"))
    return counts.withColumn("freq", F.col("n") / tot)


def surface_depth(df: DataFrame, entity: str, coord: str, out: str = "depth") -> DataFrame:
    """Residue-depth analogue (reference get_residue_depth,
    feature.py:4476-4508, which shells out to the msms binary for the 3-D
    solvent-excluded surface — absent in this sandbox): in the engine's 1-D
    coordinate space the "surface" is the entity's min/max hull, so depth =
    min(x - min(x), max(x) - x) per entity. One window aggregate, no
    shuffle beyond the entity partition; swap the hull for the msms surface
    when the binary exists — the operator shape (per-point distance to the
    entity's boundary) is the same."""
    w = Window.partitionBy(entity)
    x = F.col(coord)
    return df.withColumn(
        out, F.least(x - F.min(coord).over(w), F.max(coord).over(w) - x)
    )


def half_exposure(
    df: DataFrame,
    entity: str,
    node_id: str,
    coord: str,
    radius: float,
) -> DataFrame:
    """Half-sphere-exposure analogue (reference get_HSE_CA/CB,
    feature.py:4510-4560, Bio.PDB HSExposure over 3-D half-spheres): per
    point, the neighbor counts within ``radius`` ABOVE vs BELOW it along
    the coordinate — the 1-D half-spaces. Same banded equi-join as
    contact_edges (hash join, never a nested loop), then one conditional
    aggregation. Returns (entity, node, hse_up, hse_down)."""
    pts = df.select(
        F.col(entity).alias("__e"),
        F.col(node_id).alias("n"),
        F.col(coord).alias("va"),
        F.floor(F.col(coord) / radius).cast("long").alias("__band"),
    )
    right = df.select(
        F.col(entity).alias("__e2"),
        F.col(node_id).alias("m"),
        F.col(coord).alias("vb"),
        F.floor(F.col(coord) / radius).cast("long").alias("__band2"),
    )
    expanded = pts.withColumn(
        "__jband",
        F.explode(F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)),
    )
    near = expanded.join(
        right,
        (F.col("__e") == F.col("__e2")) & (F.col("__jband") == F.col("__band2")),
    ).where(
        (F.col("n") != F.col("m")) & (F.abs(F.col("va") - F.col("vb")) <= radius)
    )
    counted = near.groupBy(F.col("__e").alias(entity), "n").agg(
        F.sum(F.when(F.col("vb") > F.col("va"), 1).otherwise(0)).alias("hse_up"),
        F.sum(F.when(F.col("vb") < F.col("va"), 1).otherwise(0)).alias("hse_down"),
    )
    base = df.select(F.col(entity), F.col(node_id).alias("n")).distinct()
    return (
        base.join(counted, [entity, "n"], "left")
        .na.fill({"hse_up": 0, "hse_down": 0})
        .select(entity, F.col("n").alias("node"), "hse_up", "hse_down")
    )


def half_exposure_3d(
    points: DataFrame,
    entity: str,
    node_id: str,
    coords: tuple[str, str, str],
    order_col: str,
    radius: float,
) -> DataFrame:
    """TRUE 3-D half-sphere exposure (reference get_HSE_CA,
    feature.py:4242-4250, Bio.PDB HSExposureCA semantics): per node i the
    orientation vector is the pseudo-CB direction derived from its chain
    neighbors, u_i = 2·p_i − p_prev − p_next (the vector pointing away
    from the local backbone bend; chain order = the entity timeline order
    here, ties broken on node id), and the neighbors within ``radius``
    split into the upper half-sphere (dot(q − p, u) > 0 ⇔ angle < 90°)
    vs the lower (dot ≤ 0, Biopython's angle ≥ 90° branch). Nodes
    missing either chain neighbor are skipped exactly like Biopython
    (HSExposureCA needs three consecutive CA positions).

    Spark shape: two lag/lead window functions for u (one entity-partition
    sort), then the SAME 27-neighbor-cell composite-band hash equi-join as
    shell_composition_3d (cell size = radius, 3³ fixed probe copies) with
    the squared-distance predicate — never a nested loop, one Exchange on
    (entity, cell). All classification arithmetic is fixed-order IEEE
    double (subtract/multiply/add), so an O(N²) SQL oracle reproduces the
    counts bit-exactly.

    Returns (entity, node, hse_up, hse_down, u_norm) — u_norm mirrors the
    reference's third HSE output column (feature.py:4247 value3).
    """
    cx, cy, cz = coords
    w = Window.partitionBy(entity).orderBy(order_col, node_id)
    oriented = points.select(
        F.col(entity).alias("__qe"),
        F.col(node_id).alias("node"),
        F.col(cx).alias("__qx"), F.col(cy).alias("__qy"), F.col(cz).alias("__qz"),
        (2 * F.col(cx) - F.lag(cx).over(w) - F.lead(cx).over(w)).alias("__ux"),
        (2 * F.col(cy) - F.lag(cy).over(w) - F.lead(cy).over(w)).alias("__uy"),
        (2 * F.col(cz) - F.lag(cz).over(w) - F.lead(cz).over(w)).alias("__uz"),
    ).where(F.col("__ux").isNotNull())
    cell = float(radius)
    spark = points.sparkSession
    offsets = spark.createDataFrame(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        "dx long, dy long, dz long",
    )
    prb = oriented.crossJoin(F.broadcast(offsets)).select(
        "__qe", "node", "__qx", "__qy", "__qz", "__ux", "__uy", "__uz",
        (F.floor(F.col("__qx") / cell).cast("long") + F.col("dx")).alias("__cx"),
        (F.floor(F.col("__qy") / cell).cast("long") + F.col("dy")).alias("__cy"),
        (F.floor(F.col("__qz") / cell).cast("long") + F.col("dz")).alias("__cz"),
    )
    pts = points.select(
        F.col(entity).alias("__pe"),
        F.col(node_id).alias("m"),
        F.col(cx).alias("__px"), F.col(cy).alias("__py"), F.col(cz).alias("__pz"),
        F.floor(F.col(cx) / cell).cast("long").alias("__cx"),
        F.floor(F.col(cy) / cell).cast("long").alias("__cy"),
        F.floor(F.col(cz) / cell).cast("long").alias("__cz"),
    )
    d2 = (
        (F.col("__px") - F.col("__qx")) * (F.col("__px") - F.col("__qx"))
        + (F.col("__py") - F.col("__qy")) * (F.col("__py") - F.col("__qy"))
        + (F.col("__pz") - F.col("__qz")) * (F.col("__pz") - F.col("__qz"))
    )
    dot = (
        (F.col("__px") - F.col("__qx")) * F.col("__ux")
        + (F.col("__py") - F.col("__qy")) * F.col("__uy")
        + (F.col("__pz") - F.col("__qz")) * F.col("__uz")
    )
    near = (
        prb.join(
            pts,
            (F.col("__qe") == F.col("__pe"))
            & (prb["__cx"] == pts["__cx"])
            & (prb["__cy"] == pts["__cy"])
            & (prb["__cz"] == pts["__cz"]),
        )
        .where(F.col("node") != F.col("m"))
        .withColumn("__d2", d2)
        .where(F.col("__d2") <= F.lit(radius * radius))
        .withColumn("__dot", dot)
    )
    counted = near.groupBy(F.col("__qe").alias(entity), "node").agg(
        F.sum(F.when(F.col("__dot") > 0, 1).otherwise(0)).alias("hse_up"),
        F.sum(F.when(F.col("__dot") <= 0, 1).otherwise(0)).alias("hse_down"),
    )
    u_norm = F.round(
        F.sqrt(
            F.col("__ux") * F.col("__ux")
            + F.col("__uy") * F.col("__uy")
            + F.col("__uz") * F.col("__uz")
        ), 6,
    )
    return (
        oriented.select(F.col("__qe").alias(entity), "node", u_norm.alias("u_norm"))
        .join(counted, [entity, "node"], "left")
        .na.fill({"hse_up": 0, "hse_down": 0})
        .select(entity, "node", "hse_up", "hse_down", "u_norm")
    )


def surface_depth_3d(
    df: DataFrame,
    entity: str,
    coords: tuple[str, str, str],
    out: str = "depth",
) -> DataFrame:
    """3-D residue-depth analogue (reference get_residue_depth,
    feature.py:4219-4240, Bio.PDB ResidueDepth over the msms
    solvent-excluded surface — the msms binary is absent, so the surface
    is approximated by the entity's circumscribed sphere): depth(p) =
    R − |p − c| with c the entity's 3-D centroid and R the max centroid
    distance among the entity's points (surface points → depth 0, the
    deepest point → R − min dist). Generalizes the 1-D hull-distance
    surface_depth to the same 3-D cloud the HSE/shell operators consume.

    Determinism discipline: the centroid means are exact int64 nano-unit
    sums / count (floor(x·10⁹ + 0.5) per point — NOT float avg, and NOT a
    double→decimal cast, whose shortest-repr vs exact-binary rounding
    diverges between engines on tie-adjacent mantissas: the mean_shift
    lesson), so they are partial-aggregation-order independent and
    bit-identical across engines; every downstream value (dist, max,
    depth) derives from those identical doubles with fixed-order IEEE
    arithmetic. Two window aggregates over the entity partition — no
    join, no extra shuffle."""
    cx, cy, cz = coords
    w = Window.partitionBy(entity)

    def dmean(c: str):
        nanos = F.floor(F.col(c) * 1e9 + 0.5).cast("long")
        return (
            F.sum(nanos).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
            / F.lit(1e9)
        )

    dist = F.sqrt(
        (F.col(cx) - F.col("__mx")) * (F.col(cx) - F.col("__mx"))
        + (F.col(cy) - F.col("__my")) * (F.col(cy) - F.col("__my"))
        + (F.col(cz) - F.col("__mz")) * (F.col(cz) - F.col("__mz"))
    )
    return (
        df.withColumn("__mx", dmean(cx))
        .withColumn("__my", dmean(cy))
        .withColumn("__mz", dmean(cz))
        .withColumn("__d", dist)
        .withColumn(out, F.max("__d").over(w) - F.col("__d"))
        .drop("__mx", "__my", "__mz", "__d")
    )
