"""Report rendering (plans/report.py): well-formed SVG, marks match the
query data, deterministic bytes, dark-mode style block present, and the
generate_all_plots artifact set (the visualize.py:420+ analog)."""

import os
import re
import xml.etree.ElementTree as ET

from ocr_output_evaluation_spark.plans.report import (
    generate_all_plots,
    svg_bar_panel,
    svg_heatmap,
    svg_histogram,
)

SVG = "{http://www.w3.org/2000/svg}"


def _marks(svg: str, cls: str, tag: str = "path"):
    root = ET.fromstring(svg)
    return [e for e in root.iter(f"{SVG}{tag}") if e.get("class") == cls]


def test_svg_histogram_marks_and_vlines():
    bins = [(0.0, 0.25, 5), (0.25, 0.5, 12), (0.5, 0.75, 3), (0.75, 1.0, 0)]
    svg = svg_histogram(bins, "t", vlines=[(0.7, "low"), (0.9, "high")])
    assert len(_marks(svg, "series")) == 4
    root = ET.fromstring(svg)
    dashed = [e for e in root.iter(f"{SVG}line") if e.get("stroke-dasharray")]
    assert len(dashed) == 2
    titles = [t.text for t in root.iter(f"{SVG}title")]
    assert "[0.25, 0.5): 12" in titles
    # deterministic bytes
    assert svg == svg_histogram(bins, "t", vlines=[(0.7, "low"), (0.9, "high")])
    assert "prefers-color-scheme: dark" in svg


def test_svg_heatmap_cells_and_null_handling():
    svg = svg_heatmap(["a", "b"], ["x", "y", "z"], [[1.0, None, 3.0], [2.0, 2.5, 0.5]], "h")
    root = ET.fromstring(svg)
    rects = [e for e in root.iter(f"{SVG}rect") if (e.get("class") or "").startswith("q")]
    assert len(rects) == 5  # one colored cell per non-null value
    titles = [t.text for t in root.iter(f"{SVG}title")]
    assert "a / y: no data" in titles
    # extreme values land on the ramp ends
    classes = {e.get("class") for e in rects}
    assert "q0" in classes and "q12" in classes


def test_svg_bar_panel_annotations():
    svg = svg_bar_panel([("en", 10.0, "10 (50%)"), ("de", 10.0, None)], "langs")
    assert len(_marks(svg, "series")) == 2
    assert "10 (50%)" in svg


def test_svg_compare_panels_shared_scale():
    from ocr_output_evaluation_spark.plans.report import svg_compare_panels

    a = [(0.0, 0.5, 10), (0.5, 1.0, 2)]
    b = [(0.0, 0.5, 4), (0.5, 1.0, 1)]
    svg = svg_compare_panels([("sys-a", a), ("sys-b", b)], "cmp")
    root = ET.fromstring(svg)
    assert len(_marks(svg, "series")) == 4
    titles = [t.text for t in root.iter(f"{SVG}title")]
    assert "sys-a [0, 0.5): 10" in titles and "sys-b [0.5, 1): 1" in titles
    # shared y scale: sys-b's 4-count bar must be shorter than sys-a's 10-count


def test_svg_scatter_trend_marks_and_fit_line():
    from ocr_output_evaluation_spark.plans.report import svg_scatter_trend

    pts = [(0.0, 1.0, "a"), (1.0, 3.0, "b"), (2.0, 5.0, "c"), (3.0, 7.0, "d")]
    svg = svg_scatter_trend(pts, slope=2.0, intercept=1.0, r=1.0, title="s")
    root = ET.fromstring(svg)
    circles = [e for e in root.iter(f"{SVG}circle") if e.get("class") == "series"]
    assert len(circles) == 4
    titles = [t.text for t in root.iter(f"{SVG}title")]
    assert "b: (1, 3)" in titles
    # the dashed trend segment must pass through the perfectly-linear points:
    # its endpoints equal the scaled positions of (x_lo, y_lo) and (x_hi, y_hi)
    trend = [e for e in root.iter(f"{SVG}line") if e.get("stroke-dasharray")]
    assert len(trend) == 1
    t = trend[0]
    assert float(t.get("x1")) == float(circles[0].get("cx"))
    assert float(t.get("y1")) == float(circles[0].get("cy"))
    assert float(t.get("x2")) == float(circles[-1].get("cx"))
    assert float(t.get("y2")) == float(circles[-1].get("cy"))
    assert "r = 1.000" in svg
    assert svg == svg_scatter_trend(pts, slope=2.0, intercept=1.0, r=1.0, title="s")


def test_generate_all_plots_artifact_set(spark, sf_dir, tmp_path):
    out = generate_all_plots(spark, sf_dir, str(tmp_path / "report"))
    names = ("histogram", "heatmap", "langs", "compare", "scatter", "boxes", "pie")
    assert set(out) == {*names, "index"}
    for name in names:
        assert os.path.exists(out[name])
        ET.parse(out[name])  # well-formed
    idx = open(out["index"]).read()
    assert idx.count("<figure>") == 7
    # deterministic across renders on the same input
    out2 = generate_all_plots(spark, sf_dir, str(tmp_path / "report2"))
    for name in names:
        assert open(out[name]).read() == open(out2[name]).read()


def test_svg_box_panel_geometry():
    """Box spans p25..p75, whiskers p10..p90, median tick, min/max dots;
    shared scale across rows; tooltips carry all seven numbers."""
    from ocr_output_evaluation_spark.plans.report import svg_box_panel

    svg = svg_box_panel(
        [("en", 0.0, 10.0, 25.0, 50.0, 75.0, 90.0, 100.0),
         ("de", 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0)],
        "t", x_label="n_chars",
    )
    import xml.etree.ElementTree as ET
    ET.fromstring(svg)
    assert svg.count('<circle class="series"') == 4  # min+max per row
    assert "median 50" in svg and "p90 90" in svg
    # shared scale: en's box is wider than de's (50 vs 20 units of span)
    assert svg.count('<path class="series"') == 2


def test_svg_pie_slices_and_degenerate_forms():
    from ocr_output_evaluation_spark.plans.report import svg_pie
    import xml.etree.ElementTree as ET

    svg = svg_pie([("a", 3.0), ("b", 1.0), ("zero", 0.0)], "t")
    ET.fromstring(svg)
    assert svg.count("A ") == 2          # two arc slices; zero slice skipped
    assert "(75.0%)" in svg and "(25.0%)" in svg and "zero" not in svg
    # the 75% slice must take the long way round
    assert re.search(r'A [\d.]+ [\d.]+ 0 1 1', svg)
    # single-slice degenerates to a full circle, still legended
    one = svg_pie([("only", 5.0)], "t")
    ET.fromstring(one)
    assert "A " not in one and "<circle" in one and "(100%)" in one

