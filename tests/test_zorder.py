"""Z-order layout: the pruning claim, measured from parquet footers.

A 256×256 integer grid is written two ways — linearly sorted on x, and
z-ordered on (x, y) — and for each layout we count the row groups whose
min/max stats overlap a given predicate box. That count is exactly the
IO a stats-aware reader performs, so the assertion is the actual 100 TB
benefit, not a proxy.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from nabatshy_spark.sources.zorder import zorder_write


def _overlapping_row_groups(path: str, box: dict[str, tuple[float, float]]) -> int:
    """Row groups whose [min,max] intersects the box in EVERY dimension."""
    hits = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            cols = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }
            if all(
                cols[c].min <= hi and cols[c].max >= lo
                for c, (lo, hi) in box.items()
            ):
                hits += 1
    return hits


def _total_row_groups(path: str) -> int:
    return sum(
        pq.ParquetFile(f).metadata.num_row_groups
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    grid = spark.range(256 * 256).selectExpr(
        "cast(id % 256 as bigint) as x", "cast(id div 256 as bigint) as y"
    )
    linear = str(tmp_path / "linear")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(grid, zpath, ["x", "y"], bits=8, num_files=16)

    assert _total_row_groups(zpath) >= 16

    total_z = _total_row_groups(zpath)
    total_lin = _total_row_groups(linear)

    y_box = {"y": (100, 110)}
    z_y = _overlapping_row_groups(zpath, y_box)
    lin_y = _overlapping_row_groups(linear, y_box)
    # linear-on-x cannot prune a y-only predicate at all
    assert lin_y == total_lin
    assert z_y < lin_y / 2, f"z-order must prune y: {z_y} vs {lin_y}"

    # and it still prunes x — thin single-dimension slices get Morton's
    # ~sqrt locality, not a pure sort's, but never degrade to full scan
    x_box = {"x": (100, 110)}
    z_x = _overlapping_row_groups(zpath, x_box)
    assert z_x < total_z, "x predicate must still skip row groups"

    # the layout's point: the WORST dimension is bounded. Linear reads
    # 100% for its ignored dimension; z-order's worst dimension stays
    # well under that.
    assert max(z_x, z_y) < max(_overlapping_row_groups(linear, x_box), lin_y)

    # a box selective in both dimensions touches only the curve cells
    # around it
    box = {"x": (100, 110), "y": (100, 110)}
    assert _overlapping_row_groups(zpath, box) <= total_z / 4


def test_zorder_roundtrip_lossless(spark, tmp_path):
    grid = spark.range(1000).selectExpr("id as x", "(id * 7) % 1000 as y")
    path = str(tmp_path / "z")
    zorder_write(grid, path, ["x", "y"], bits=6, num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(r["x"] for r in back.collect()) == list(range(1000))
