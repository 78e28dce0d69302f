"""The Z-order layout's pruning payoff, asserted on real parquet files.

No Iceberg runtime ships in this sandbox (tests/test_streaming.py pins the
documented degrade), so the min/max file-skipping payoff is asserted the
engine-independent way: write the zorder_layout assignment as an actual
one-file-per-file_id parquet layout, read each file's footer min/max stats
with pyarrow — the exact metadata an Iceberg/Delta/parquet reader skips
on — and count which files a range query can touch, against a 1-D x-sorted
layout as the control. Plus the Spark-side plan asserts: the range
predicate reaches the scan (PushedFilters) and the layout-aware file_id
set prunes partitions (PartitionFilters)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spark_pit.operators.skew import zorder_files_for_box, zorder_layout

N_FILES, BITS = 64, 10
# y-selective, x-unselective box: the case 1-D x-sort cannot prune at all
X0, X1, Y0, Y1 = 0, 1023, 450, 549


def _grid(spark):
    # full 256x256 grid stepped by 4 over [0, 1024)^2
    return spark.range(256 * 256).select(
        ((F.col("id") % 256) * 4).cast("long").alias("x"),
        (F.floor(F.col("id") / 256) * 4).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _file_ranges(path):
    out = []
    for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {"x": None, "y": None}
        maxs = {"x": None, "y": None}
        for rg in range(md.num_row_groups):
            for c in ("x", "y"):
                st = md.row_group(rg).column(cols[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append((f, mins, maxs))
    return out


def _overlapping(ranges):
    return [
        f for f, mins, maxs in ranges
        if not (maxs["x"] < X0 or mins["x"] > X1 or maxs["y"] < Y0 or mins["y"] > Y1)
    ]


def test_zorder_layout_skips_files_where_linear_sort_cannot(spark, tmp_path):
    df = _grid(spark)

    zdir = str(tmp_path / "zorder")
    (
        zorder_layout(df, "x", "y", n_files=N_FILES, bits=BITS)
        .repartition("file_id")
        .write.partitionBy("file_id")
        .parquet(zdir)
    )
    ldir = str(tmp_path / "linear")
    df.repartitionByRange(N_FILES, "x").write.parquet(ldir)

    z_ranges = _file_ranges(zdir)
    l_ranges = _file_ranges(ldir)
    assert len(z_ranges) == N_FILES
    # range partitioner may leave a few sampled ranges empty (no file)
    assert len(l_ranges) >= N_FILES // 2

    z_touch, l_touch = _overlapping(z_ranges), _overlapping(l_ranges)
    # x-sorted files all span the full y range: zero skip on a y predicate
    assert len(l_touch) == len(l_ranges)
    # z-order tiles are 128x128 in (x,y): a 100-tall stripe touches at most
    # 2 tile-rows x 8 tile-cols = 16 of 64 files
    assert len(z_touch) <= 16
    # and the min/max derived set equals the layout-aware pruning helper
    want_ids = zorder_files_for_box(X0, X1, Y0, Y1, n_files=N_FILES, bits=BITS)
    assert len(z_touch) == len(want_ids)


def test_zorder_pruned_read_is_planned_and_correct(spark, tmp_path):
    df = _grid(spark)
    zdir = str(tmp_path / "zorder2")
    (
        zorder_layout(df, "x", "y", n_files=N_FILES, bits=BITS)
        .repartition("file_id")
        .write.partitionBy("file_id")
        .parquet(zdir)
    )
    ids = zorder_files_for_box(X0, X1, Y0, Y1, n_files=N_FILES, bits=BITS)
    back = spark.read.parquet(zdir)
    pred = (F.col("y") >= Y0) & (F.col("y") <= Y1)
    pruned = back.where(F.col("file_id").isin(ids) & pred)

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "file_id" in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(y" in plan

    # the pruning set is LOSSLESS: pruned read == full filtered read
    full = back.where(pred)
    assert pruned.count() == full.count() == 256 * 25
    assert (
        pruned.agg(F.sum("payload")).first()[0]
        == full.agg(F.sum("payload")).first()[0]
    )
