"""Static HTML error-analysis report (streamlit-free dashboard).

The reference dashboard is a Streamlit app (``dashboard.py:641-702``: WER
chart, S/D/I table, 12-category chart, diff browser). Streamlit is not in
this image, so the same views render to a single self-contained HTML file
(inline SVG bar charts, a sortable sample table, word-level diffs).
"""

from __future__ import annotations

import html
import json
from collections import Counter
from typing import Any, Dict, List


def _bar_chart_svg(items: List, width: int = 640, bar_h: int = 22) -> str:
    if not items:
        return "<p>(no data)</p>"
    max_v = max(v for _, v in items) or 1
    rows = []
    for i, (label, value) in enumerate(items):
        w = int((width - 220) * value / max_v)
        y = i * (bar_h + 6)
        rows.append(
            f'<text x="0" y="{y + 15}" font-size="12">{html.escape(str(label))}</text>'
            f'<rect x="200" y="{y}" width="{max(w, 1)}" height="{bar_h}" fill="#4a7fb5"/>'
            f'<text x="{205 + w}" y="{y + 15}" font-size="12">{value:.2f}</text>'
        )
    h = len(items) * (bar_h + 6)
    return f'<svg width="{width}" height="{h}">{"".join(rows)}</svg>'


def _diff_html(sample: Dict[str, Any]) -> str:
    parts = []
    for m in sample.get("mismatches", []):
        ref = " ".join(m["ref_words"]) or "∅"
        hyp = " ".join(m["hyp_words"]) or "∅"
        parts.append(
            f'<span class="diff" title="{html.escape(m.get("category") or "")}">'
            f'<del>{html.escape(ref)}</del>→<ins>{html.escape(hyp)}</ins></span>')
    return " ".join(parts) if parts else '<em>perfect</em>'


def render_report(analyses: List[Dict[str, Any]], title: str = "ASR error report",
                  path: str = "reports/report.html") -> str:
    import os

    n = len(analyses)
    total_ref = sum(a["ref_words"] for a in analyses) or 1
    total_err = sum(a["subs"] + a["dels"] + a["ins"] for a in analyses)
    corpus_wer = 100.0 * total_err / total_ref

    cats = Counter(
        m.get("category") or "OTHER"
        for a in analyses for m in a.get("mismatches", []))
    worst = sorted(analyses, key=lambda a: -a["wer"])[:50]

    def _audio_cell(a):
        asset = a.get("audio_asset")
        if not asset:
            return ""
        return f'<br><audio controls src="{html.escape(asset)}"></audio>'

    rows = "".join(
        f"<tr><td>{i}</td><td>{a['wer']:.1f}</td>"
        f"<td>{a['subs']}/{a['dels']}/{a['ins']}</td>"
        f"<td>{html.escape(a['ref'][:120])}{_audio_cell(a)}</td>"
        f"<td>{_diff_html(a)}</td></tr>"
        for i, a in enumerate(worst))

    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2em; max-width: 1100px; }}
table {{ border-collapse: collapse; width: 100%; font-size: 13px; }}
td, th {{ border: 1px solid #ddd; padding: 4px 8px; vertical-align: top; }}
del {{ color: #b44; }} ins {{ color: #2a7; text-decoration: none; }}
.diff {{ margin-right: .6em; white-space: nowrap; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<p><b>{n}</b> samples &middot; corpus WER <b>{corpus_wer:.2f}%</b>
 &middot; S/D/I {sum(a['subs'] for a in analyses)}/
{sum(a['dels'] for a in analyses)}/{sum(a['ins'] for a in analyses)}</p>
<h2>Error categories</h2>
{_bar_chart_svg(sorted(cats.items(), key=lambda kv: -kv[1]))}
<h2>Worst samples</h2>
<table><tr><th>#</th><th>WER%</th><th>S/D/I</th><th>reference</th>
<th>mismatches</th></tr>{rows}</table>
</body></html>"""

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(doc)
    return path


def main():  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("analyses_json", help="json list from analyze_manifest")
    ap.add_argument("--out", default="reports/report.html")
    args = ap.parse_args()
    with open(args.analyses_json) as f:
        analyses = json.load(f)
    print(render_report(analyses, path=args.out))


if __name__ == "__main__":
    main()
