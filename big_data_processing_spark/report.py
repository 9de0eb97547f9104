"""Analytics report rendering — the engine-side analog of the
reference's notebook charts, with zero plotting dependencies.

The reference renders a 2x2 matplotlib panel of daily series
(`/root/reference/notebooks/data_analysis.ipynb`: Daily Trip Count /
Daily Revenue / Average Trip Distance / Average Fare Amount) plus
group-by summary tables. This container has no matplotlib, so the
charts here are hand-emitted SVG — pure string assembly, no deps —
embedded in a single self-contained HTML file.

Scale stance: everything collected to the driver is a BOUNDED
aggregate (daily grain over the order-date span, or a small group
dimension) — the heavy lifting stays in Spark; the report layer
only formats a few hundred rows.
"""

from __future__ import annotations

import html
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_processing_spark.sources.catalog import load_table

_W, _H, _PAD = 420, 220, 40


def _scale(vals: Sequence[float], lo_px: float, hi_px: float):
    vmin, vmax = min(vals), max(vals)
    span = (vmax - vmin) or 1.0

    def to_px(v: float) -> float:
        return lo_px + (v - vmin) / span * (hi_px - lo_px)

    return to_px, vmin, vmax


def line_chart_svg(
    points: Sequence[tuple[str, float]], title: str, color: str = "#2563eb"
) -> str:
    """Single-series line chart as an SVG string. ``points`` are
    (x_label, y) pairs already in x order. An empty series renders a
    placeholder chart instead of raising from min()/max()."""
    if not points:
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
            f'height="{_H}"><text x="{_W / 2}" y="{_H / 2}" '
            f'text-anchor="middle" font-size="13">'
            f"{html.escape(title)}: no data</text></svg>"
        )
    ys = [p[1] for p in points]
    sy, vmin, vmax = _scale(ys, _H - _PAD, _PAD)
    n = max(len(points) - 1, 1)
    step = (_W - 2 * _PAD) / n
    pts = " ".join(
        f"{_PAD + i * step:.1f},{sy(y):.1f}" for i, (_, y) in enumerate(points)
    )
    first_x, last_x = points[0][0], points[-1][0]
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}">'
        f'<text x="{_W / 2}" y="18" text-anchor="middle" '
        f'font-size="13" font-weight="bold">{html.escape(title)}</text>'
        f'<line x1="{_PAD}" y1="{_H - _PAD}" x2="{_W - _PAD}" '
        f'y2="{_H - _PAD}" stroke="#999"/>'
        f'<line x1="{_PAD}" y1="{_PAD}" x2="{_PAD}" y2="{_H - _PAD}" '
        f'stroke="#999"/>'
        f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
        f'points="{pts}"/>'
        f'<text x="{_PAD - 4}" y="{_PAD + 4}" text-anchor="end" '
        f'font-size="10">{vmax:,.1f}</text>'
        f'<text x="{_PAD - 4}" y="{_H - _PAD}" text-anchor="end" '
        f'font-size="10">{vmin:,.1f}</text>'
        f'<text x="{_PAD}" y="{_H - _PAD + 14}" font-size="10">'
        f"{html.escape(str(first_x))}</text>"
        f'<text x="{_W - _PAD}" y="{_H - _PAD + 14}" text-anchor="end" '
        f'font-size="10">{html.escape(str(last_x))}</text>'
        f"</svg>"
    )


def bar_chart_svg(
    items: Sequence[tuple[str, float]], title: str, color: str = "#059669"
) -> str:
    """Horizontal bar chart as an SVG string."""
    h = _PAD + 24 * len(items) + 10
    _, _, vmax = _scale([v for _, v in items] + [0.0], 0, 1)
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{h}">',
        f'<text x="{_W / 2}" y="18" text-anchor="middle" font-size="13" '
        f'font-weight="bold">{html.escape(title)}</text>',
    ]
    for i, (label, v) in enumerate(items):
        y = _PAD + 24 * i
        w = (v / vmax if vmax else 0) * (_W - 150)
        out.append(
            f'<text x="96" y="{y + 12}" text-anchor="end" font-size="11">'
            f"{html.escape(str(label))}</text>"
            f'<rect x="100" y="{y}" width="{w:.1f}" height="16" '
            f'fill="{color}"/>'
            f'<text x="{100 + w + 4:.1f}" y="{y + 12}" font-size="10">'
            f"{v:,.1f}</text>"
        )
    out.append("</svg>")
    return "".join(out)


def daily_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily series behind the 2x2 panel — one scan of orders and
    one of lineitem, both pre-aggregated to the bounded daily grain
    before any driver collect."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_order_value"),
    )
    l = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.round(F.avg("l_quantity"), 3).alias("avg_quantity")
    )
    return o.join(l, "day", "left").orderBy("day")


def generate_report(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Write a self-contained HTML analytics report mirroring the
    reference notebook's panel (daily count / revenue / avg quantity
    / avg order value) plus group summaries. Returns ``out_path``."""
    daily = daily_order_stats(spark, sf_dir).collect()  # bounded: day grain
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 1).alias("revenue"))
        .orderBy(F.col("revenue").desc())
        .collect()
    )  # bounded: 5 segments
    status = (
        orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )

    day = [str(r.day) for r in daily]
    panels = [
        line_chart_svg(list(zip(day, [r.n_orders for r in daily])),
                       "Daily Order Count"),
        line_chart_svg(list(zip(day, [r.revenue for r in daily])),
                       "Daily Revenue", color="#dc2626"),
        line_chart_svg(
            list(zip(day, [r.avg_quantity or 0.0 for r in daily])),
            "Average Line Quantity", color="#7c3aed"),
        line_chart_svg(
            list(zip(day, [r.avg_order_value for r in daily])),
            "Average Order Value", color="#ea580c"),
    ]
    bars = [
        bar_chart_svg([(r.c_mktsegment, r.revenue) for r in seg],
                      "Revenue by Market Segment"),
        bar_chart_svg([(r.o_orderstatus, float(r.n)) for r in status],
                      "Orders by Status", color="#0891b2"),
    ]
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>Analytics report</title></head><body>"
        "<h1>Analytics report</h1>"
        f"<p>Source: {html.escape(sf_dir)} &middot; {len(daily)} days</p>"
        "<div>" + "".join(panels) + "</div><div>" + "".join(bars)
        + "</div></body></html>"
    )
    with open(out_path, "w") as fh:
        fh.write(doc)
    return out_path
