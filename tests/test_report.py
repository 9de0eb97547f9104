"""SVG/HTML report rendering (reference-notebook parity panel)."""

from __future__ import annotations

from big_data_processing_spark.report import (
    bar_chart_svg,
    daily_order_stats,
    generate_report,
    line_chart_svg,
)
from tests.conftest import SF0001


def test_chart_svg_shapes():
    svg = line_chart_svg([("a", 1.0), ("b", 3.0), ("c", 2.0)], "T<itle")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "T&lt;itle" in svg  # escaped
    assert "polyline" in svg
    bar = bar_chart_svg([("x", 5.0), ("y", 10.0)], "Bars")
    assert bar.count("<rect") == 2


def test_chart_svg_empty_series():
    # empty input renders a valid placeholder, never raises from
    # min()/max() on an empty sequence
    svg = line_chart_svg([], "Empty")
    assert svg.startswith("<svg") and "no data" in svg
    bar = bar_chart_svg([], "Empty bars")
    assert bar.startswith("<svg") and "<rect" not in bar


def test_daily_order_stats_bounded(spark):
    rows = daily_order_stats(spark, SF0001).collect()
    assert 0 < len(rows) <= 3700  # daily grain over the corpus span
    assert rows == sorted(rows, key=lambda r: r.day)
    assert all(r.n_orders > 0 for r in rows)


def test_generate_report_html(spark, tmp_path):
    out = generate_report(spark, SF0001, str(tmp_path / "report.html"))
    doc = open(out).read()
    assert doc.count("<svg") == 6  # 4 panel charts + 2 bar charts
    for title in (
        "Daily Order Count",
        "Daily Revenue",
        "Average Line Quantity",
        "Average Order Value",
        "Revenue by Market Segment",
        "Orders by Status",
    ):
        assert title in doc
