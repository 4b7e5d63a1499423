"""Z-order clustered writes (sources/sinks.py:write_zordered): the
multi-column file-skipping layout. Verified at the parquet FOOTER level
via pyarrow — the min/max stats engines actually prune with — by
comparing how many granules a small 2-D query box overlaps under a
linear (x, y) sort vs the z-order layout of the same data."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.sources.sinks import write_zordered, zorder_value


def _granule_boxes(path):
    """(xmin, xmax, ymin, ymax) per parquet row group under path."""
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index("x"), names.index("y")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx, sy = g.column(xi).statistics, g.column(yi).statistics
            boxes.append((sx.min, sx.max, sy.min, sy.max))
    return boxes


def _overlaps(boxes, x0, x1, y0, y1):
    return sum(1 for (a, b, c, d) in boxes if not (b < x0 or a > x1 or d < y0 or c > y1))


def test_zorder_prunes_2d_boxes_better_than_linear_sort(spark, tmp_path):
    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit((1 << 31) - 1)) % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit((1 << 31) - 1)) % 10_000).alias("y"),
        F.col("id").alias("payload"),
    )
    linear_p, z_p = str(tmp_path / "linear"), str(tmp_path / "zord")
    # 256 granules: file-skipping benefits need granularity — at 64
    # coarse tiles the 2-D win exists but is under 2x (measured)
    (
        df.repartitionByRange(256, "x")
        .sortWithinPartitions("x", "y")
        .write.parquet(linear_p)
    )
    write_zordered(df, z_p, zorder_by=["x", "y"], bits=10, target_partitions=256)

    lb, zb = _granule_boxes(linear_p), _granule_boxes(z_p)
    assert len(lb) >= 128 and len(zb) >= 128  # both layouts produced many granules

    # total-row sanity: z-order rewrote the same data
    assert (
        spark.read.parquet(z_p).count()
        == spark.read.parquet(linear_p).count()
        == n
    )

    # a 10% x 10% query box: linear prunes on x only (y stats are wide
    # inside every x-slice); z-order must prune on BOTH dimensions
    cases = [(4000, 4999), (500, 1499), (8000, 8999)]
    for x0, x1 in cases:
        l = _overlaps(lb, x0, x1, x0, x1)
        z = _overlaps(zb, x0, x1, x0, x1)
        assert z * 2 <= l, f"box {x0}-{x1}: z-order {z} vs linear {l} granules"
    # and correctness of the layout transform: same rows back
    got = spark.read.parquet(z_p).agg(F.sum("payload")).first()[0]
    want = df.agg(F.sum("payload")).first()[0]
    assert got == want


def test_zorder_value_interleaves_bits(spark):
    rows = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "a long, b long").select(
        "a", "b", zorder_value([F.col("a"), F.col("b")], bits=2).alias("z")
    )
    got = {(r.a, r.b): r.z for r in rows.collect()}
    # interleave a bit0 -> z bit0, b bit0 -> z bit1, a bit1 -> z bit2, ...
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 0b1111


def test_zorder_constant_column_is_safe(spark, tmp_path):
    df = spark.range(100).select(F.lit(7).alias("x"), F.col("id").alias("y"))
    p = str(tmp_path / "const")
    write_zordered(df, p, zorder_by=["x", "y"], bits=6, target_partitions=4)
    assert spark.read.parquet(p).count() == 100

def test_zorder_bits_budget_enforced(spark):
    """bits * columns past 63 shifts into the long sign bit — the curve
    order silently breaks (high-bit rows sort first). Must refuse
    loudly (r11 sinks review)."""
    import pytest
    from pyspark.sql import functions as F

    from implementing_scds_in_hive_spark.sources.sinks import zorder_value

    with pytest.raises(ValueError, match="63-bit"):
        zorder_value([F.col(c) for c in "abcd"], bits=16)
    zorder_value([F.col(c) for c in "abcd"], bits=15)  # 60 bits: fine


def test_write_zordered_empty_and_all_null_inputs(spark, tmp_path):
    """Empty input / all-NULL zorder column has no bounds to normalize
    against — write unclustered instead of crashing on float(None)
    (r11 sinks review)."""
    from implementing_scds_in_hive_spark.sources.sinks import write_zordered

    empty = spark.createDataFrame([], "a long, b long")
    p1 = str(tmp_path / "empty")
    write_zordered(empty, p1, zorder_by=["a", "b"])
    assert spark.read.parquet(p1).count() == 0

    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b long"
    )
    p2 = str(tmp_path / "nulls")
    write_zordered(nulls, p2, zorder_by=["a", "b"])
    assert spark.read.parquet(p2).count() == 2
