"""Collect audio files for report samples (reference ``fetch_audio.py``).

The reference pulls audio for analyzed samples so the dashboard can play
them. Here: given an analyses JSON whose entries carry an ``audio`` path
(propagated from the eval manifest), copy the worst-N files into the report
assets directory and annotate each analysis with the relative path the HTML
dashboard embeds as an ``<audio>`` element.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Any, Dict, List


def fetch_audio(analyses: List[Dict[str, Any]], out_dir: str,
                top_n: int = 50) -> List[Dict[str, Any]]:
    os.makedirs(out_dir, exist_ok=True)
    ranked = sorted(range(len(analyses)),
                    key=lambda i: -analyses[i].get("wer", 0.0))
    for rank, idx in enumerate(ranked[:top_n]):
        a = analyses[idx]
        src = a.get("audio")
        if not src or not os.path.exists(src):
            continue
        dst_name = f"{rank:03d}_{os.path.basename(src)}"
        shutil.copyfile(src, os.path.join(out_dir, dst_name))
        # normpath first: a trailing slash would make basename "" and the
        # dashboard's relative <audio src> 404.
        a["audio_asset"] = os.path.join(
            os.path.basename(os.path.normpath(out_dir)), dst_name)
    return analyses


def main():  # pragma: no cover - thin CLI
    ap = argparse.ArgumentParser()
    ap.add_argument("analyses_json")
    ap.add_argument("--out-dir", default="reports/audio")
    ap.add_argument("--top-n", type=int, default=50)
    args = ap.parse_args()
    with open(args.analyses_json) as f:
        analyses = json.load(f)
    analyses = fetch_audio(analyses, args.out_dir, args.top_n)
    with open(args.analyses_json, "w") as f:
        json.dump(analyses, f, indent=2)
    print(f"audio assets in {args.out_dir}")


if __name__ == "__main__":
    main()
