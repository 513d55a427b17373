"""Interactive single-file HTML error-analysis dashboard (streamlit-free).

The reference dashboard is a 705-line Streamlit app (``dashboard.py``:
WER chart, S/D/I table, 12-category error chart, diff browser with
filters and inline audio playback). Streamlit is not in this image, so
the same interactions render into ONE self-contained HTML file with
vanilla JS: every sample is embedded as JSON and the browser does the
filtering (category drill-down by clicking a bar, WER range, free-text
search), sorting, pagination, a WER histogram, word-level diffs, and
audio playback — no server, no dependencies, works from ``file://``.
"""

from __future__ import annotations

import html
import json
from collections import Counter
from typing import Any, Dict, List


def _bar_chart_svg(items: List, width: int = 640, bar_h: int = 22) -> str:
    """Server-rendered category chart; each bar is a drill-down button."""
    if not items:
        return "<p>(no data)</p>"
    max_v = max(v for _, v in items) or 1
    rows = []
    for i, (label, value) in enumerate(items):
        w = int((width - 220) * value / max_v)
        y = i * (bar_h + 6)
        esc = html.escape(str(label))
        rows.append(
            f'<g class="catbar" data-cat="{esc}" style="cursor:pointer">'
            f'<text x="0" y="{y + 15}" font-size="12">{esc}</text>'
            f'<rect x="200" y="{y}" width="{max(w, 1)}" height="{bar_h}" fill="#4a7fb5"/>'
            f'<text x="{205 + w}" y="{y + 15}" font-size="12">{value:.0f}</text></g>'
        )
    h = len(items) * (bar_h + 6)
    return f'<svg width="{width}" height="{h}">{"".join(rows)}</svg>'


def _wer_histogram_svg(wers: List[float], width: int = 640,
                       height: int = 120) -> str:
    if not wers:
        return "<p>(no data)</p>"
    edges = [0, 5, 10, 20, 30, 50, 75, 100, 1e9]
    labels = ["0-5", "5-10", "10-20", "20-30", "30-50", "50-75", "75-100",
              ">100"]
    counts = [0] * (len(edges) - 1)
    for w in wers:
        for i in range(len(edges) - 1):
            if edges[i] <= w < edges[i + 1]:
                counts[i] += 1
                break
    max_c = max(counts) or 1
    bw = width // len(counts)
    bars = []
    for i, c in enumerate(counts):
        bh = int((height - 30) * c / max_c)
        x = i * bw
        bars.append(
            f'<rect x="{x + 4}" y="{height - 18 - bh}" width="{bw - 8}" '
            f'height="{max(bh, 1)}" fill="#7aa45e"/>'
            f'<text x="{x + bw // 2}" y="{height - 4}" font-size="10" '
            f'text-anchor="middle">{labels[i]}</text>'
            f'<text x="{x + bw // 2}" y="{height - 22 - bh}" font-size="10" '
            f'text-anchor="middle">{c}</text>')
    return f'<svg width="{width}" height="{height}">{"".join(bars)}</svg>'


_PAGE_JS = """
const PAGE = 25;
let state = {cat: "", q: "", wmin: 0, wmax: 1e9, sort: "wer", dir: -1, page: 0};
function diffHtml(s) {
  if (!s.mismatches || !s.mismatches.length) return "<em>perfect</em>";
  return s.mismatches.map(m => {
    const ref = (m.ref_words || []).join(" ") || "\\u2205";
    const hyp = (m.hyp_words || []).join(" ") || "\\u2205";
    const cat = m.category || "";
    return `<span class="diff" title="${esc(cat)}"><del>${esc(ref)}</del>\\u2192<ins>${esc(hyp)}</ins></span>`;
  }).join(" ");
}
function esc(t) { const d = document.createElement("div"); d.innerText = t == null ? "" : String(t); return d.innerHTML; }
function matches(s) {
  if (s.wer < state.wmin || s.wer > state.wmax) return false;
  if (state.cat && !(s.mismatches || []).some(m => (m.category || "OTHER") === state.cat)) return false;
  if (state.q) {
    const q = state.q.toLowerCase();
    if (!(s.ref || "").toLowerCase().includes(q) && !(s.hyp || "").toLowerCase().includes(q)) return false;
  }
  return true;
}
function render() {
  const rows = SAMPLES.map((s, i) => [s, i]).filter(([s]) => matches(s));
  rows.sort(([a], [b]) => state.dir * ((a[state.sort] ?? 0) > (b[state.sort] ?? 0) ? 1 : -1));
  const start = state.page * PAGE;
  const page = rows.slice(start, start + PAGE);
  document.getElementById("count").innerText =
    `${rows.length} / ${SAMPLES.length} samples` + (state.cat ? ` \\u00b7 category: ${state.cat}` : "");
  const frag = page.map(([s, i]) => `
    <tr><td>${i}</td><td>${s.wer.toFixed(1)}</td>
    <td>${s.subs}/${s.dels}/${s.ins}</td>
    <td>${esc((s.ref || "").slice(0, 160))}${s.audio_asset ? `<br><audio controls preload="none" src="${esc(s.audio_asset)}"></audio>` : ""}</td>
    <td>${diffHtml(s)}</td></tr>`).join("");
  document.getElementById("rows").innerHTML = frag;
  const pages = Math.max(1, Math.ceil(rows.length / PAGE));
  document.getElementById("page").innerText = `page ${state.page + 1}/${pages}`;
}
function init() {
  document.querySelectorAll(".catbar").forEach(g => g.addEventListener("click", () => {
    state.cat = state.cat === g.dataset.cat ? "" : g.dataset.cat; state.page = 0; render();
  }));
  document.getElementById("q").addEventListener("input", e => { state.q = e.target.value; state.page = 0; render(); });
  document.getElementById("wmin").addEventListener("input", e => { state.wmin = +e.target.value || 0; state.page = 0; render(); });
  document.getElementById("wmax").addEventListener("input", e => { state.wmax = e.target.value === "" ? 1e9 : +e.target.value; state.page = 0; render(); });
  document.getElementById("clear").addEventListener("click", () => { state = {...state, cat: "", q: "", wmin: 0, wmax: 1e9, page: 0};
    document.getElementById("q").value = ""; document.getElementById("wmin").value = ""; document.getElementById("wmax").value = ""; render(); });
  document.getElementById("prev").addEventListener("click", () => { if (state.page > 0) { state.page--; render(); } });
  document.getElementById("next").addEventListener("click", () => { state.page++; render(); });
  document.querySelectorAll("th[data-sort]").forEach(th => th.addEventListener("click", () => {
    const k = th.dataset.sort;
    state.dir = state.sort === k ? -state.dir : -1; state.sort = k; render();
  }));
  render();
}
document.addEventListener("DOMContentLoaded", init);
"""


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

    payload = json.dumps([
        {k: a.get(k) for k in ("wer", "subs", "dels", "ins", "ref", "hyp",
                               "mismatches", "audio_asset", "duration")}
        for a in analyses
    ]).replace("</", "<\\/")

    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2em; max-width: 1150px; }}
table {{ border-collapse: collapse; width: 100%; font-size: 13px; }}
td, th {{ border: 1px solid #ddd; padding: 4px 8px; vertical-align: top; }}
th[data-sort] {{ cursor: pointer; background: #f4f4f4; }}
del {{ color: #b44; }} ins {{ color: #2a7; text-decoration: none; }}
.diff {{ margin-right: .6em; white-space: nowrap; }}
.controls input {{ margin-right: 1em; }} button {{ margin-right: .5em; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<p><b>{n}</b> samples &middot; corpus WER <b>{corpus_wer:.2f}%</b>
 &middot; S/D/I {sum(a['subs'] for a in analyses)}/
{sum(a['dels'] for a in analyses)}/{sum(a['ins'] for a in analyses)}</p>
<h2>WER distribution</h2>
{_wer_histogram_svg([a['wer'] for a in analyses])}
<h2>Error categories <small>(click a bar to drill down)</small></h2>
{_bar_chart_svg(sorted(cats.items(), key=lambda kv: -kv[1]))}
<h2>Samples</h2>
<div class="controls">
  <input id="q" placeholder="search ref/hyp text">
  WER <input id="wmin" type="number" placeholder="min" style="width:4em">
  &ndash; <input id="wmax" type="number" placeholder="max" style="width:4em">
  <button id="clear">clear filters</button>
  <button id="prev">&laquo; prev</button><span id="page"></span>
  <button id="next">next &raquo;</button>
  <span id="count"></span>
</div>
<table><thead><tr><th>#</th><th data-sort="wer">WER% &#8597;</th>
<th data-sort="subs">S/D/I &#8597;</th><th>reference</th><th>mismatches</th>
</tr></thead><tbody id="rows"></tbody></table>
<script>const SAMPLES = {payload};</script>
<script>{_PAGE_JS}</script>
</body></html>"""

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(doc)
    return path


def main():  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("analyses_json",
                    help="json list from analyze_manifest, or a leaderboard "
                    "result JSONL (reference results/MODEL_*.jsonl layout)")
    ap.add_argument("--out", default="reports/report.html")
    args = ap.parse_args()
    if args.analyses_json.endswith(".jsonl"):
        from asr_postprocess.analyze_errors import (analyze_manifest,
                                                    load_results_jsonl)

        analyses = load_results_jsonl(args.analyses_json)
        # Bare {ref,hyp} records (no stored analysis) must be aligned
        # before rendering — render_report needs wer/subs/mismatches.
        todo = [(i, s) for i, s in enumerate(analyses)
                if "mismatches" not in s]
        for (i, _), a in zip(todo, analyze_manifest([s for _, s in todo])):
            analyses[i] = a
    else:
        with open(args.analyses_json) as f:
            analyses = json.load(f)
    print(render_report(analyses, path=args.out))


if __name__ == "__main__":
    main()
