"""Z-order layout: bit-interleave correctness and the property the
layout exists for — every file bounded in BOTH dimensions, so
min/max stats prune point/range queries on either column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_processing_spark.sources.layout import (
    spread_bits16,
    z_value,
    zorder_layout,
)
from tests.conftest import SF001


def _file_stats(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(names.index(c)).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def test_spread_bits_reference_values(spark):
    df = spark.range(1).select(
        spread_bits16(F.lit(0xFFFF)).alias("a"),
        spread_bits16(F.lit(0b1011)).alias("b"),
        z_value(F.lit(3), F.lit(5)).alias("z"),
    )
    row = df.first()
    assert row.a == 0x55555555
    # 1011 -> 1_00_01_01 interleaved with zeros = 0b1000101
    assert row.b == 0b1000101
    # x=0b11 (even bits), y=0b101 (odd bits): z = 0b100111
    assert row.z == 0b100111


def test_zorder_layout_bounds_both_dims_and_prunes(spark, tmp_path):
    ev = spark.read.parquet(SF001 + "/events.parquet")
    path = str(tmp_path / "zev")
    zorder_layout(ev, "user_id", "value", path, n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    stats = _file_stats(path, ["user_id", "value"])
    assert len(stats) >= 6  # repartitionByRange honored
    gx = (
        min(s["user_id"][0] for s in stats),
        max(s["user_id"][1] for s in stats),
    )
    gy = (
        min(s["value"][0] for s in stats),
        max(s["value"][1] for s in stats),
    )
    span_x = gx[1] - gx[0]
    span_y = gy[1] - gy[0]
    # every file covers a bounded rectangle: area fraction well under
    # the ~1.0 a single-dim sort would leave on the other column
    fracs = []
    for s in stats:
        fx = (s["user_id"][1] - s["user_id"][0]) / span_x
        fy = (s["value"][1] - s["value"][0]) / span_y
        fracs.append(fx * fy)
    assert max(fracs) <= 0.6
    assert sum(fracs) / len(fracs) <= 0.4

    # pruning check: a central 10%x10% box query overlaps a minority
    # of files by min/max stats — the scan skips the rest
    qx = (gx[0] + 0.45 * span_x, gx[0] + 0.55 * span_x)
    qy = (gy[0] + 0.45 * span_y, gy[0] + 0.55 * span_y)
    hit = [
        s
        for s in stats
        if not (
            s["user_id"][1] < qx[0]
            or s["user_id"][0] > qx[1]
            or s["value"][1] < qy[0]
            or s["value"][0] > qy[1]
        )
    ]
    assert len(hit) <= len(stats) // 2
