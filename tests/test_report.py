"""Report rendering (plans/report.py): well-formed SVG, marks match the
query data, deterministic bytes, dark-mode style block present, and the
generate_all_plots artifact set (the visualize.py:420+ analog)."""

import os
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
    names = ("histogram", "heatmap", "langs", "compare", "scatter")
    assert set(out) == {*names, "index"}
    for name in names:
        assert os.path.exists(out[name])
        ET.parse(out[name])  # well-formed
    idx = open(out["index"]).read()
    assert idx.count("<figure>") == 5
    # deterministic across renders on the same input
    out2 = generate_all_plots(spark, sf_dir, str(tmp_path / "report2"))
    for name in names:
        assert open(out[name]).read() == open(out2[name]).read()
