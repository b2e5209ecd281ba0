"""Report rendering — the reference's visualization layer, Spark-first.

The reference's largest file is matplotlib plotting (visualize.py, 861 LoC:
confidence histograms visualize.py:14-56, comparison panels, the
type×day heatmap visualize.py:728-750, generate_all_plots visualize.py:420+).
The rebuild keeps the DATA side in the engine (value_histogram /
event_dow_matrix / value_counts_lang are oracle-checked queries that
aggregate distributed) and renders the ARTIFACTS here as standalone SVG —
pure-Python string assembly, no plotting library in the container, fully
deterministic bytes (no timestamps, no RNG) so report outputs diff cleanly
across runs.

Scale note: rendering consumes only the few-row AGGREGATED frames (20 bins,
|event_types|×7 cells, |langs| rows) — the collect() here is the legitimate
small-result kind; all heavy lifting stayed in the distributed queries.

Design follows the project data-viz method: single-series charts carry one
hue (sequential blue ramp for magnitude, one categorical slot for bars — no
multi-hue categorical palette exists in this report set, so the
palette-validator gate does not arise); marks are thin with rounded data
ends and 2px surface gaps; identity is never color-alone (axis labels /
direct labels); ink uses text tokens, not series colors; light & dark are
both explicit (CSS custom properties + prefers-color-scheme inside the
SVG); every mark carries a native <title> tooltip.
"""

from __future__ import annotations

import html
import os

# Palette: one categorical blue + a blue sequential ramp, each with a
# dark-mode twin picked for >=4.5:1 ink contrast on both surfaces.
_LIGHT = {
    "surface": "#fcfcfb", "ink": "#0b0b0b", "ink2": "#52514e", "grid": "#e7e6e2",
    "series": "#2a78d6",
}
_DARK = {
    "surface": "#1a1a19", "ink": "#ffffff", "ink2": "#c3c2b7", "grid": "#383835",
    "series": "#3987e5",
}
_SEQ_LIGHT = [
    "#cde2fb", "#b7d3f6", "#9ec5f4", "#86b6ef", "#6da7ec", "#5598e7", "#3987e5",
    "#2a78d6", "#256abf", "#1c5cab", "#184f95", "#104281", "#0d366b",
]
# dark mode walks the same ramp from the dark end so "more" still reads as
# "more ink against the surface"
_SEQ_DARK = list(reversed(_SEQ_LIGHT))


def _style() -> str:
    seq_l = "".join(f".q{i}{{fill:{c}}}" for i, c in enumerate(_SEQ_LIGHT))
    seq_d = "".join(f".q{i}{{fill:{c}}}" for i, c in enumerate(_SEQ_DARK))
    return f"""<style>
    svg{{color-scheme:light}}
    .surface{{fill:{_LIGHT['surface']}}} .ink{{fill:{_LIGHT['ink']}}}
    .ink2{{fill:{_LIGHT['ink2']}}} .grid{{stroke:{_LIGHT['grid']}}}
    .series{{fill:{_LIGHT['series']}}} .vline{{stroke:{_LIGHT['ink2']}}}
    {seq_l}
    text{{font-family:system-ui,-apple-system,'Segoe UI',sans-serif}}
    @media (prefers-color-scheme: dark){{
      svg{{color-scheme:dark}}
      .surface{{fill:{_DARK['surface']}}} .ink{{fill:{_DARK['ink']}}}
      .ink2{{fill:{_DARK['ink2']}}} .grid{{stroke:{_DARK['grid']}}}
      .series{{fill:{_DARK['series']}}} .vline{{stroke:{_DARK['ink2']}}}
      {seq_d}
    }}
    </style>"""


def _esc(s: object) -> str:
    return html.escape(str(s), quote=True)


def _bar_path(x: float, y: float, w: float, h: float, r: float = 4.0) -> str:
    """Vertical bar anchored on the baseline with rounded TOP corners only
    (the rounded-data-end mark spec; the baseline end stays square)."""
    r = min(r, w / 2, h)
    return (
        f"M {x:.2f} {y + h:.2f} L {x:.2f} {y + r:.2f} "
        f"Q {x:.2f} {y:.2f} {x + r:.2f} {y:.2f} "
        f"L {x + w - r:.2f} {y:.2f} Q {x + w:.2f} {y:.2f} {x + w:.2f} {y + r:.2f} "
        f"L {x + w:.2f} {y + h:.2f} Z"
    )


def _hbar_path(x: float, y: float, w: float, h: float, r: float = 4.0) -> str:
    """Horizontal bar anchored at x with rounded RIGHT (data) end."""
    r = min(r, h / 2, w)
    return (
        f"M {x:.2f} {y:.2f} L {x + w - r:.2f} {y:.2f} "
        f"Q {x + w:.2f} {y:.2f} {x + w:.2f} {y + r:.2f} "
        f"L {x + w:.2f} {y + h - r:.2f} "
        f"Q {x + w:.2f} {y + h:.2f} {x + w - r:.2f} {y + h:.2f} "
        f"L {x:.2f} {y + h:.2f} Z"
    )


def svg_histogram(
    bins: list[tuple[float, float, int]],
    title: str,
    x_label: str = "value",
    y_label: str = "count",
    vlines: list[tuple[float, str]] | None = None,
    width: int = 720,
    height: int = 360,
) -> str:
    """(bin_start, bin_end, count) rows -> standalone SVG histogram.
    ``vlines`` are labeled dashed threshold markers (the reference's
    axvline(0.7)/axvline(0.9), visualize.py:30-32 — label + dash pattern
    carry the meaning, not color alone)."""
    bins = sorted(bins, key=lambda b: b[0])
    ml, mr, mt, mb = 56, 16, 44, 44
    pw, ph = width - ml - mr, height - mt - mb
    lo = bins[0][0] if bins else 0.0
    hi = bins[-1][1] if bins else 1.0
    span = (hi - lo) or 1.0
    peak = max((b[2] for b in bins), default=1) or 1
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    # recessive horizontal gridlines at 4 ticks + y labels
    for t in range(5):
        v = peak * t / 4
        y = mt + ph - ph * t / 4
        parts.append(
            f'<line class="grid" x1="{ml}" y1="{y:.1f}" x2="{width - mr}" y2="{y:.1f}" stroke-width="1"/>'
        )
        parts.append(
            f'<text class="ink2" x="{ml - 6}" y="{y + 4:.1f}" font-size="11" text-anchor="end">{v:g}</text>'
        )
    for b0, b1, n in bins:
        x = ml + (b0 - lo) / span * pw
        w = max((b1 - b0) / span * pw - 2.0, 1.0)  # 2px surface gap
        h = ph * n / peak
        y = mt + ph - h
        parts.append(
            f'<path class="series" d="{_bar_path(x, y, w, h)}">'
            f"<title>[{b0:g}, {b1:g}): {n}</title></path>"
        )
    for xv, label in vlines or []:
        x = ml + (xv - lo) / span * pw
        parts.append(
            f'<line class="vline" x1="{x:.1f}" y1="{mt}" x2="{x:.1f}" y2="{mt + ph}" '
            f'stroke-width="1.5" stroke-dasharray="5 4"/>'
        )
        parts.append(
            f'<text class="ink2" x="{x + 4:.1f}" y="{mt + 12}" font-size="11">{_esc(label)}</text>'
        )
    # x axis labels: lo, mid, hi
    for frac in (0.0, 0.5, 1.0):
        xv = lo + span * frac
        x = ml + pw * frac
        parts.append(
            f'<text class="ink2" x="{x:.1f}" y="{height - mb + 16}" font-size="11" '
            f'text-anchor="middle">{xv:g}</text>'
        )
    parts.append(
        f'<text class="ink2" x="{ml + pw / 2:.0f}" y="{height - 8}" font-size="11" '
        f'text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append(
        f'<text class="ink2" x="14" y="{mt + ph / 2:.0f}" font-size="11" text-anchor="middle" '
        f'transform="rotate(-90 14 {mt + ph / 2:.0f})">{_esc(y_label)}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_heatmap(
    row_labels: list[str],
    col_labels: list[str],
    matrix: list[list[float | None]],
    title: str,
    width: int = 720,
    cell_h: int = 34,
) -> str:
    """Sequential single-hue heatmap (the visualize.py:728-750 analog).
    None cells render as surface with an em-dash; every cell shows its value
    (identity/magnitude never color-alone)."""
    ml, mr, mt, mb = 110, 16, 44, 30
    n_r, n_c = len(row_labels), len(col_labels)
    pw = width - ml - mr
    cw = pw / max(n_c, 1)
    height = mt + cell_h * n_r + mb
    vals = [v for row in matrix for v in row if v is not None]
    vlo, vhi = (min(vals), max(vals)) if vals else (0.0, 1.0)
    vspan = (vhi - vlo) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    for j, cl in enumerate(col_labels):
        parts.append(
            f'<text class="ink2" x="{ml + cw * (j + 0.5):.1f}" y="{mt - 8}" font-size="11" '
            f'text-anchor="middle">{_esc(cl)}</text>'
        )
    for i, rl in enumerate(row_labels):
        y = mt + i * cell_h
        parts.append(
            f'<text class="ink2" x="{ml - 8}" y="{y + cell_h / 2 + 4:.1f}" font-size="11" '
            f'text-anchor="end">{_esc(rl)}</text>'
        )
        for j in range(n_c):
            v = matrix[i][j]
            x = ml + j * cw
            if v is None:
                parts.append(
                    f'<rect class="surface" x="{x + 1:.1f}" y="{y + 1}" width="{cw - 2:.1f}" '
                    f'height="{cell_h - 2}" rx="3"><title>{_esc(rl)} / {_esc(col_labels[j])}: '
                    f"no data</title></rect>"
                )
                parts.append(
                    f'<text class="ink2" x="{x + cw / 2:.1f}" y="{y + cell_h / 2 + 4}" '
                    f'font-size="11" text-anchor="middle">&#8212;</text>'
                )
                continue
            q = round((v - vlo) / vspan * (len(_SEQ_LIGHT) - 1))
            ink = "ink" if q < 7 else "surface"  # value stays readable on dark cells
            parts.append(
                f'<rect class="q{q}" x="{x + 1:.1f}" y="{y + 1}" width="{cw - 2:.1f}" '
                f'height="{cell_h - 2}" rx="3"><title>{_esc(rl)} / {_esc(col_labels[j])}: '
                f"{v:g}</title></rect>"
            )
            parts.append(
                f'<text class="{ink}" x="{x + cw / 2:.1f}" y="{y + cell_h / 2 + 4}" '
                f'font-size="10.5" text-anchor="middle">{v:.0f}</text>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_bar_panel(
    items: list[tuple[str, float, str | None]],
    title: str,
    width: int = 720,
    bar_h: int = 26,
) -> str:
    """Horizontal single-series bar panel (per-lang/per-source rollups —
    the comparison-panel analog). ``items``: (label, value, annotation)."""
    ml, mr, mt, mb = 90, 70, 44, 16
    pw = width - ml - mr
    height = mt + len(items) * (bar_h + 8) + mb
    peak = max((v for _, v, _ in items), default=1.0) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    for i, (label, v, note) in enumerate(items):
        y = mt + i * (bar_h + 8)
        w = pw * v / peak
        parts.append(
            f'<text class="ink2" x="{ml - 8}" y="{y + bar_h / 2 + 4}" font-size="11" '
            f'text-anchor="end">{_esc(label)}</text>'
        )
        parts.append(
            f'<path class="series" d="{_hbar_path(ml, y, max(w, 1.0), bar_h)}">'
            f"<title>{_esc(label)}: {v:g}</title></path>"
        )
        ann = f"{v:g}" if note is None else note
        parts.append(
            f'<text class="ink2" x="{ml + max(w, 1.0) + 6:.1f}" y="{y + bar_h / 2 + 4}" '
            f'font-size="11">{_esc(ann)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_compare_panels(
    panels: list[tuple[str, list[tuple[float, float, int]]]],
    title: str,
    x_label: str = "value",
    width: int = 720,
) -> str:
    """Side-by-side small multiples of single-series histograms on a SHARED
    x and y scale (the reference's comparison figure,
    visualize.py:57-110 plot_confidence_comparison: one subplot per OCR
    system). Identity is the panel title, not color — every panel wears the
    same hue, so no categorical palette (and no palette gate) arises."""
    n = max(len(panels), 1)
    pw_total = width
    panel_w = pw_total // n
    peak = max((c for _, bins in panels for _, _, c in bins), default=1) or 1
    lo = min((b[0] for _, bins in panels for b in bins), default=0.0)
    hi = max((b[1] for _, bins in panels for b in bins), default=1.0)
    span = (hi - lo) or 1.0
    height = 300
    ml, mr, mt, mb = 46, 8, 58, 36
    ph = height - mt - mb
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    for pi, (name, bins) in enumerate(panels):
        x0 = pi * panel_w + (ml if pi == 0 else 12)
        x1 = (pi + 1) * panel_w - mr
        pw = x1 - x0
        parts.append(
            f'<text class="ink2" x="{x0}" y="{mt - 10}" font-size="12" '
            f'font-weight="600">{_esc(name)}</text>'
        )
        for t in range(5):
            y = mt + ph - ph * t / 4
            parts.append(
                f'<line class="grid" x1="{x0}" y1="{y:.1f}" x2="{x1}" y2="{y:.1f}" stroke-width="1"/>'
            )
            if pi == 0:
                parts.append(
                    f'<text class="ink2" x="{x0 - 6}" y="{y + 4:.1f}" font-size="10" '
                    f'text-anchor="end">{peak * t / 4:g}</text>'
                )
        for b0, b1, cnt in sorted(bins):
            bx = x0 + (b0 - lo) / span * pw
            bw = max((b1 - b0) / span * pw - 2.0, 1.0)
            bh = ph * cnt / peak
            parts.append(
                f'<path class="series" d="{_bar_path(bx, mt + ph - bh, bw, bh)}">'
                f"<title>{_esc(name)} [{b0:g}, {b1:g}): {cnt}</title></path>"
            )
        for frac in (0.0, 1.0):
            xv = lo + span * frac
            parts.append(
                f'<text class="ink2" x="{x0 + pw * frac:.1f}" y="{height - mb + 14}" '
                f'font-size="10" text-anchor="middle">{xv:g}</text>'
            )
    parts.append(
        f'<text class="ink2" x="{width / 2:.0f}" y="{height - 8}" font-size="11" '
        f'text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_scatter_trend(
    points: list[tuple[float, float, str]],
    slope: float,
    intercept: float,
    r: float,
    title: str,
    x_label: str = "x",
    y_label: str = "y",
    width: int = 720,
    height: int = 400,
) -> str:
    """Scatter with a least-squares trend line — the reference's
    conf-vs-perplexity scatter (/root/reference/analyze_buckets.py:190-214,
    visualize.py:232-330). The DATA side stays distributed: ``points`` is a
    deterministic small sample (hash-order-limit, the R1 pattern) while
    slope/intercept/r come from the full-data closed-form aggregates
    (corr_trend — oracle-checked), exactly like the reference fits
    np.polyfit on all rows and plots a subset. ``points``: (x, y, label);
    single hue, trend carried by dash + annotation, never color alone."""
    ml, mr, mt, mb = 64, 16, 44, 48
    pw, ph = width - ml - mr, height - mt - mb
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    xlo, xhi = (min(xs), max(xs)) if xs else (0.0, 1.0)
    ylo, yhi = (min(ys), max(ys)) if ys else (0.0, 1.0)
    xspan = (xhi - xlo) or 1.0
    yspan = (yhi - ylo) or 1.0

    def sx(v: float) -> float:
        return ml + (v - xlo) / xspan * pw

    def sy(v: float) -> float:
        return mt + ph - (v - ylo) / yspan * ph

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    for t in range(5):
        yv = ylo + yspan * t / 4
        y = sy(yv)
        parts.append(
            f'<line class="grid" x1="{ml}" y1="{y:.1f}" x2="{width - mr}" y2="{y:.1f}" stroke-width="1"/>'
        )
        parts.append(
            f'<text class="ink2" x="{ml - 6}" y="{y + 4:.1f}" font-size="11" text-anchor="end">{yv:g}</text>'
        )
    for frac in (0.0, 0.5, 1.0):
        xv = xlo + xspan * frac
        parts.append(
            f'<text class="ink2" x="{sx(xv):.1f}" y="{height - mb + 16}" font-size="11" '
            f'text-anchor="middle">{xv:g}</text>'
        )
    for x, y, label in points:
        parts.append(
            f'<circle class="series" cx="{sx(x):.2f}" cy="{sy(y):.2f}" r="3.5" '
            f'fill-opacity="0.55"><title>{_esc(label)}: ({x:g}, {y:g})</title></circle>'
        )
    # trend segment clipped to the visible x-range (dash pattern + the r/fit
    # annotation carry the meaning, matching the vline convention)
    y0, y1 = intercept + slope * xlo, intercept + slope * xhi
    parts.append(
        f'<line class="vline" x1="{sx(xlo):.1f}" y1="{sy(y0):.1f}" '
        f'x2="{sx(xhi):.1f}" y2="{sy(y1):.1f}" stroke-width="1.5" '
        f'stroke-dasharray="6 4"><title>trend: y = {intercept:.4g} + {slope:.4g}·x'
        f"</title></line>"
    )
    parts.append(
        f'<text class="ink2" x="{width - mr}" y="{mt - 8}" font-size="11" '
        f'text-anchor="end">r = {r:.3f} &#183; y = {intercept:.4g} + {slope:.4g}&#183;x '
        f"&#183; n = {len(points)} plotted</text>"
    )
    parts.append(
        f'<text class="ink2" x="{ml + pw / 2:.0f}" y="{height - 8}" font-size="11" '
        f'text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append(
        f'<text class="ink2" x="14" y="{mt + ph / 2:.0f}" font-size="11" text-anchor="middle" '
        f'transform="rotate(-90 14 {mt + ph / 2:.0f})">{_esc(y_label)}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_box_panel(
    items: list[tuple[str, float, float, float, float, float, float, float]],
    title: str,
    x_label: str = "value",
    width: int = 720,
    row_h: int = 34,
) -> str:
    """Horizontal percentile box panel — the reference's percentile box
    plots (/root/reference/visualize.py:185-234 plot_percentile_ranges,
    :357-419, :536-710) re-expressed over the already-oracle-checked exact
    percentiles (group_moment_stats), one row per group on a shared scale.
    ``items``: (label, min, p10, p25, median, p75, p90, max) — box spans
    p25..p75 with a median tick, whiskers span p10..p90, min/max as dots.
    All geometry is deterministic arithmetic on the inputs."""
    ml, mr, mt, mb = 90, 24, 44, 34
    pw = width - ml - mr
    height = mt + len(items) * row_h + mb
    lo = min((it[1] for it in items), default=0.0)
    hi = max((it[7] for it in items), default=1.0)
    span = (hi - lo) or 1.0
    sx = lambda v: ml + (v - lo) / span * pw  # noqa: E731
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="{ml}" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    for t in range(5):
        x = ml + pw * t / 4
        parts.append(
            f'<line class="grid" x1="{x:.1f}" y1="{mt}" x2="{x:.1f}" '
            f'y2="{height - mb}" stroke-width="1"/>'
        )
        parts.append(
            f'<text class="ink2" x="{x:.1f}" y="{height - mb + 14}" font-size="10" '
            f'text-anchor="middle">{lo + span * t / 4:g}</text>'
        )
    for i, (label, mn, p10, p25, med, p75, p90, mx) in enumerate(items):
        cy = mt + i * row_h + row_h / 2
        bh = row_h - 14
        parts.append(
            f'<text class="ink2" x="{ml - 8}" y="{cy + 4:.1f}" font-size="11" '
            f'text-anchor="end">{_esc(label)}</text>'
        )
        tip = (
            f"{_esc(label)}: min {mn:g} · p10 {p10:g} · p25 {p25:g} · "
            f"median {med:g} · p75 {p75:g} · p90 {p90:g} · max {mx:g}"
        )
        parts.append(
            f'<line class="vline" x1="{sx(p10):.1f}" y1="{cy:.1f}" '
            f'x2="{sx(p90):.1f}" y2="{cy:.1f}" stroke-width="1.5"/>'
        )
        for wv in (p10, p90):
            parts.append(
                f'<line class="vline" x1="{sx(wv):.1f}" y1="{cy - bh / 2 + 3:.1f}" '
                f'x2="{sx(wv):.1f}" y2="{cy + bh / 2 - 3:.1f}" stroke-width="1.5"/>'
            )
        bw = max(sx(p75) - sx(p25), 1.0)
        parts.append(
            f'<path class="series" d="{_hbar_path(sx(p25), cy - bh / 2, bw, bh)}" '
            f'fill-opacity="0.55"><title>{tip}</title></path>'
        )
        parts.append(
            f'<line class="vline" x1="{sx(med):.1f}" y1="{cy - bh / 2:.1f}" '
            f'x2="{sx(med):.1f}" y2="{cy + bh / 2:.1f}" stroke-width="2.5"/>'
        )
        for dv in (mn, mx):
            parts.append(
                f'<circle class="series" cx="{sx(dv):.1f}" cy="{cy:.1f}" r="2.5">'
                f"<title>{tip}</title></circle>"
            )
    parts.append(
        f'<text class="ink2" x="{width / 2:.0f}" y="{height - 8}" font-size="11" '
        f'text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_pie(
    slices: list[tuple[str, float]],
    title: str,
    width: int = 560,
    height: int = 300,
) -> str:
    """Category-share pie — the reference's confidence-category pie
    (/root/reference/visualize.py:94-137 plot_confidence_categories) over
    already-oracle-checked counts (quality_buckets). Slices render
    clockwise from 12 o'clock in the given order, filled from the
    sequential ramp (spread for adjacent contrast), with a legend carrying
    label, value and percentage; zero/negative slices are skipped. A
    single non-zero slice degenerates to a full circle (the arc endpoints
    would coincide)."""
    import math

    live = [(lab, v) for lab, v in slices if v > 0]
    total = sum(v for _, v in live)
    cx, cy, r = height / 2, height / 2 + 10, height / 2 - 40
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {width} {height}" '
        f'role="img" aria-label="{_esc(title)}">',
        _style(),
        f'<rect class="surface" width="{width}" height="{height}"/>',
        f'<text class="ink" x="16" y="22" font-size="14" font-weight="600">{_esc(title)}</text>',
    ]
    n = len(live)
    qcls = lambda i: f"q{i * 12 // max(n - 1, 1)}" if n > 1 else "q12"  # noqa: E731
    if total > 0 and n == 1:
        lab, v = live[0]
        parts.append(
            f'<circle class="{qcls(0)}" cx="{cx:.1f}" cy="{cy:.1f}" r="{r:.1f}">'
            f"<title>{_esc(lab)}: {v:g} (100%)</title></circle>"
        )
    elif total > 0:
        acc = 0.0
        for i, (lab, v) in enumerate(live):
            a0 = -math.pi / 2 + 2 * math.pi * acc / total
            acc += v
            a1 = -math.pi / 2 + 2 * math.pi * acc / total
            x0, y0 = cx + r * math.cos(a0), cy + r * math.sin(a0)
            x1, y1 = cx + r * math.cos(a1), cy + r * math.sin(a1)
            large = 1 if (a1 - a0) > math.pi else 0
            parts.append(
                f'<path class="{qcls(i)}" d="M {cx:.2f} {cy:.2f} L {x0:.2f} {y0:.2f} '
                f'A {r:.2f} {r:.2f} 0 {large} 1 {x1:.2f} {y1:.2f} Z">'
                f"<title>{_esc(lab)}: {v:g} ({v / total * 100:.1f}%)</title></path>"
            )
    lx = height + 20
    for i, (lab, v) in enumerate(live):
        ly = 56 + i * 24
        pct = f" ({v / total * 100:.1f}%)" if total > 0 else ""
        parts.append(
            f'<rect class="{qcls(i)}" x="{lx}" y="{ly - 11}" width="14" height="14" rx="3"/>'
        )
        parts.append(
            f'<text class="ink2" x="{lx + 22}" y="{ly}" font-size="12">'
            f"{_esc(lab)}: {v:g}{pct}</text>"
        )
    parts.append("</svg>")
    return "\n".join(parts)


def generate_all_plots(spark, sf_dir: str, out_dir: str) -> dict:
    """The generate_all_plots analog (visualize.py:420+): run the (already
    oracle-checked) report queries and write the standard artifact set —
    histogram.svg, heatmap.svg, langs.svg + an index.html that inlines them.
    Returns {name: path}. Deterministic bytes for fixed input."""
    from .. import queries

    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}

    hist_rows = sorted(
        (r.bin_start, r.bin_end, r["count"])
        for r in queries.value_histogram(spark, sf_dir).collect()
    )
    hist = svg_histogram(
        hist_rows,
        "events.value distribution (20 bins over [0, 500])",
        x_label="value",
        vlines=[(350.0, "hot threshold")],
    )

    dow = sorted(queries.event_dow_matrix(spark, sf_dir).collect(), key=lambda r: r.event_type)
    days = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]
    heat = svg_heatmap(
        [r.event_type for r in dow],
        days,
        [[r[f"d{d}"] for d in range(7)] for r in dow],
        "mean events.value by type and day-of-week",
    )

    langs = sorted(queries.value_counts_lang(spark, sf_dir).collect(), key=lambda r: -r.cnt)
    bars = svg_bar_panel(
        [(r.lang, float(r.cnt), f"{r.cnt} ({r.pct:g}%)") for r in langs],
        "documents per language",
    )

    # comparison panels (visualize.py:57-110 analog): per-lang doc-length
    # distributions as small multiples over one grouped histogram pass
    from ..operators.histogram import histogram as hist_op
    from ..sources.io import read_table

    docs = read_table(spark, os.path.join(sf_dir, "documents.parquet"))
    grouped = hist_op(docs, "n_chars", nbins=12, lo=0.0, hi=600.0, group_cols=["lang"])
    by_lang: dict[str, list] = {}
    for r in grouped.collect():
        by_lang.setdefault(r.lang, []).append((r.bin_start, r.bin_end, r["count"]))
    top2 = sorted(by_lang, key=lambda k: -sum(c for _, _, c in by_lang[k]))[:2]
    compare = svg_compare_panels(
        [(lang, by_lang[lang]) for lang in top2],
        "document length distribution — top-2 languages",
        x_label="n_chars",
    )

    # scatter-with-trend (analyze_buckets.py:190-214 analog): trend/r from
    # the full-data closed-form aggregates (corr_trend, oracle-checked);
    # plotted points are a deterministic hash-order sample (R1 pattern —
    # no df.sample, no RNG, stable across runs and cluster sizes)
    from pyspark.sql import functions as F

    tr = queries.corr_trend(spark, sf_dir).collect()[0]
    pts = (
        read_table(spark, os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            F.xxhash64("l_orderkey", "l_linenumber", F.lit(42)).alias("_h"),
        )
        .orderBy("_h")
        .limit(250)
        .collect()
    )
    scatter = svg_scatter_trend(
        [
            (float(r.l_quantity), float(r.l_extendedprice), f"order {r.l_orderkey}/{r.l_linenumber}")
            for r in pts
        ],
        slope=float(tr.slope),
        intercept=float(tr.intercept),
        r=float(tr.pearson_r),
        title="l_quantity vs l_extendedprice — 250-point hash sample, full-data trend",
        x_label="l_quantity",
        y_label="l_extendedprice",
    )

    # percentile boxes (visualize.py:185-234 analog) from the exact,
    # oracle-checked percentiles; pie (visualize.py:94-137 analog) from the
    # oracle-checked bucket counts
    gm = sorted(queries.group_moment_stats(spark, sf_dir).collect(), key=lambda r: r.lang)
    boxes = svg_box_panel(
        [
            (r.lang, float(r.min_nc), float(r.p10_nc), float(r.p25_nc),
             float(r.median_nc), float(r.p75_nc), float(r.p90_nc), float(r.max_nc))
            for r in gm
        ],
        "documents.n_chars percentiles by language (p10-p90 whiskers, p25-p75 box)",
        x_label="n_chars",
    )
    qb = sorted(queries.quality_buckets(spark, sf_dir).collect(), key=lambda r: -r.n)
    pie = svg_pie(
        [(r.bucket, float(r.n)) for r in qb],
        "documents by quality bucket",
    )

    for name, svg in (
        ("histogram", hist), ("heatmap", heat), ("langs", bars), ("compare", compare),
        ("scatter", scatter), ("boxes", boxes), ("pie", pie),
    ):
        p = os.path.join(out_dir, f"{name}.svg")
        with open(p, "w") as f:
            f.write(svg)
        out[name] = p

    index = os.path.join(out_dir, "index.html")
    body = "\n".join(f"<figure>{open(p).read()}</figure>" for p in out.values())
    with open(index, "w") as f:
        f.write(
            "<!doctype html><meta charset='utf-8'><title>ooe-spark report</title>"
            "<style>body{margin:2rem auto;max-width:780px;background:Canvas;"
            "color-scheme:light dark}figure{margin:0 0 2rem 0}</style>\n" + body
        )
    out["index"] = index
    return out
