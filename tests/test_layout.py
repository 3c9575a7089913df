"""Z-order layout: key correctness vs a Python reference, and the
actual pruning claim — parquet min/max stats skip more row groups on
the NON-leading dimension under a Z-order sort than under a
single-column sort."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.layout import (
    zorder_key,
    zorder_write,
)
from cassandra_data_migration_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _morton(x: int, y: int, bits: int = 8) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key(["x", "y"], bits=8)
    )
    for r in df.collect():
        assert r["z"] == _morton(r["x"], r["y"])


def _y_intersecting_row_groups(path: str, lo: int, hi: int) -> tuple[int, int]:
    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        ycol = next(
            i
            for i in range(len(md.schema))
            if md.schema.column(i).name == "y"
        )
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ycol).statistics
            total += 1
            if st.min < hi and st.max >= lo:
                hit += 1
    return hit, total


def test_zorder_layout_prunes_second_dimension(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        (F.abs(F.col("user_id")) % 256).alias("x"),
        (F.abs(F.floor(F.col("value"))).cast("long") % 256).alias("y"),
    )
    zpath = str(tmp_path / "zsorted")
    xpath = str(tmp_path / "xsorted")
    zorder_write(ev, zpath, ["x", "y"], bits=8, num_files=8)
    (
        ev.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    # box query on y alone: the x-sorted layout can prune nothing (y
    # spans the full range in every file); the z-sorted layout confines
    # low-y rows to the low-y quadrant files
    z_hit, z_total = _y_intersecting_row_groups(zpath, 0, 32)
    x_hit, x_total = _y_intersecting_row_groups(xpath, 0, 32)
    assert z_total >= 4 and x_total >= 4
    assert z_hit < x_hit
    # both layouts hold identical data
    a = spark.read.parquet(zpath).count()
    b = spark.read.parquet(xpath).count()
    assert a == b == ev.count()
