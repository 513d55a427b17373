"""Per-sample error analysis: alignment, rule preclassification, LLM classes.

Behavior parity with the reference analyzer
(``asr_postprocess/analyze_errors.py``):

- texts are normalized with the leaderboard normalizers, aligned word-wise,
- adjacent non-equal alignment chunks bridged by <= ``max_gap`` equal words
  are merged into one mismatch span (``:180-221``),
- cheap deterministic rules classify the easy cases first — WORD_BOUNDARY
  (same letters, different segmentation), WORD_ORDER (same multiset),
  CLITIC_MARKER (language clitic tables), SPURIOUS_INSERTION, OMISSION
  (``preclassify``, ``:223-248``),
- the rest go to an LLM with the 12-category priority-list prompt
  (``:55-133``); the LLM is any ``callable(prompt) -> str`` returning JSON.
"""

from __future__ import annotations

import json
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional

from thewhisper_tpu.utils.normalizers import (
    BasicTextNormalizer,
    EnglishTextNormalizer,
)
from thewhisper_tpu.utils.wer import align_words, edit_stats

CATEGORIES = [
    "NUMBER_WORD", "WORD_BOUNDARY", "WORD_ORDER", "CLITIC_MARKER",
    "FUNCTION_WORD", "MORPHOLOGICAL", "SEMANTIC_CHANGE", "PHONETIC_SPELLING",
    "NAMED_ENTITY_OR_RARE", "SPURIOUS_INSERTION", "OMISSION", "OTHER",
]

# Apostrophe-stripped clitic fragments per language and the full forms they
# may stand in for (reference tables, analyze_errors.py:62-80).
CLITIC_TOKENS = {
    "en": {"s", "t", "d", "ll", "ve", "re", "m"},
    "fr": {"l", "d", "j", "m", "n", "c", "s", "t", "qu", "lorsqu", "jusqu",
           "puisqu", "quoiqu"},
    "it": {"l", "d", "un", "all", "dell", "sull", "dall", "nell", "quell",
           "gl"},
    "de": set(), "es": set(), "pt": set(),
}
CLITIC_FULL_FORMS = {
    "en": {"s": {"is", "has", "us"}, "t": {"not"}, "d": {"had", "would"},
           "ll": {"will", "shall"}, "ve": {"have"}, "re": {"are"},
           "m": {"am"}},
    "fr": {"l": {"le", "la"}, "d": {"de"}, "j": {"je"}, "m": {"me"},
           "n": {"ne"}, "c": {"ce"}, "s": {"se", "si"}, "t": {"te"},
           "qu": {"que", "qui"}, "lorsqu": {"lorsque"}, "jusqu": {"jusque"},
           "puisqu": {"puisque"}, "quoiqu": {"quoique"}},
    "it": {"l": {"lo", "la"}, "d": {"di", "da"}, "un": {"una", "uno"},
           "all": {"alla", "allo", "alle"},
           "dell": {"della", "dello", "delle"},
           "sull": {"sulla", "sullo", "sulle"},
           "dall": {"dalla", "dallo", "dalle"},
           "nell": {"nella", "nello", "nelle"},
           "quell": {"quella", "quello", "quelle"}, "gl": {"gli"}},
    "de": {}, "es": {}, "pt": {},
}

CLASSIFY_PROMPT = """You are analyzing ASR errors. You will receive a \
REFERENCE sentence, a HYPOTHESIS produced by an ASR system for the same \
audio, and a numbered list of MISMATCHES (aligned spans that differ). Both \
texts are pre-normalized (lowercase, no punctuation).

Classify each mismatch into exactly ONE of these categories, taking the \
FIRST that matches in priority order:
1. NUMBER_WORD - same numeric value spelled differently
2. CLITIC_MARKER - contraction/possessive/elision fragment vs full form
3. FUNCTION_WORD - article/preposition/conjunction/auxiliary/pronoun
4. MORPHOLOGICAL - inflected forms of the same lemma
5. SEMANTIC_CHANGE - both are real words with different meanings
6. PHONETIC_SPELLING - garbled/misspelled/near-identical spelling variant
7. NAMED_ENTITY_OR_RARE - proper noun / technical / rare word
8. SPURIOUS_INSERTION - extra hypothesis words, empty reference span
9. OMISSION - missing words, empty hypothesis span
10. OTHER - anything else

Respond with ONLY valid JSON of the form
{{"classifications": [{{"index": 0, "category": "..."}}, ...]}}

REFERENCE:
{ref}

HYPOTHESIS:
{hyp}

MISMATCHES:
{mismatches}
"""


def _normalizer(lang: str):
    return EnglishTextNormalizer() if lang == "en" else BasicTextNormalizer()


def merge_mismatches(ops: List, max_gap: int = 1) -> List[Dict[str, Any]]:
    """Group aligned ops into mismatch spans, bridging short equal runs.

    ``ops`` is the (op, ref_word, hyp_word) list from ``align_words``. Equal
    runs of <= max_gap words sandwiched between errors join the span.
    """
    # First collapse ops into typed chunks.
    chunks: List[Dict[str, Any]] = []
    for op, rw, hw in ops:
        kind = "equal" if op == "equal" else "diff"
        if chunks and chunks[-1]["kind"] == kind:
            if rw:
                chunks[-1]["ref"].append(rw)
            if hw:
                chunks[-1]["hyp"].append(hw)
        else:
            chunks.append({"kind": kind,
                           "ref": [rw] if rw else [],
                           "hyp": [hw] if hw else []})

    spans: List[Dict[str, Any]] = []
    i = 0
    while i < len(chunks):
        if chunks[i]["kind"] == "equal":
            i += 1
            continue
        ref = list(chunks[i]["ref"])
        hyp = list(chunks[i]["hyp"])
        j = i + 1
        while j < len(chunks):
            c = chunks[j]
            if c["kind"] == "equal":
                bridge = (len(c["ref"]) <= max_gap and j + 1 < len(chunks)
                          and chunks[j + 1]["kind"] == "diff")
                if not bridge:
                    break
                ref.extend(c["ref"])
                hyp.extend(c["ref"])   # bridge words are identical both sides
            else:
                ref.extend(c["ref"])
                hyp.extend(c["hyp"])
            j += 1
        spans.append({"ref_words": ref, "hyp_words": hyp})
        i = j
    return spans


def preclassify(span: Dict[str, Any], lang: str) -> Optional[str]:
    """Deterministic rules for the easy categories; None => needs the LLM."""
    rw = [w for w in span["ref_words"] if w]
    hw = [w for w in span["hyp_words"] if w]
    if not rw and not hw:
        return None
    if "".join(rw) == "".join(hw) and rw != hw:
        return "WORD_BOUNDARY"
    if rw and hw and rw != hw and sorted(rw) == sorted(hw) and len(rw) >= 2:
        return "WORD_ORDER"
    clitics = CLITIC_TOKENS.get(lang, set())
    full_forms = CLITIC_FULL_FORMS.get(lang, {})
    if not rw and len(hw) == 1 and hw[0] in clitics:
        return "CLITIC_MARKER"
    if not hw and len(rw) == 1 and rw[0] in clitics:
        return "CLITIC_MARKER"
    if len(rw) == 1 and len(hw) == 1:
        r, h = rw[0], hw[0]
        if r in clitics and h in full_forms.get(r, set()):
            return "CLITIC_MARKER"
        if h in clitics and r in full_forms.get(h, set()):
            return "CLITIC_MARKER"
    if not rw and hw:
        return "SPURIOUS_INSERTION"
    if rw and not hw:
        return "OMISSION"
    return None


def _parse_llm_json(text: str) -> Dict[int, str]:
    """Tolerant JSON extraction from an LLM reply."""
    match = re.search(r"\{.*\}", text, re.S)
    if not match:
        return {}
    try:
        data = json.loads(match.group(0))
    except json.JSONDecodeError:
        return {}
    out = {}
    items = data.get("classifications", [])
    if not isinstance(items, list):
        return {}
    for item in items:
        # Tolerant per-item too: non-dict entries and non-integer indices
        # are the LLM's problem, not a reason to abort the whole corpus.
        try:
            cat = str(item.get("category", "")).upper()
            idx = int(item.get("index", -1))
        except (AttributeError, TypeError, ValueError):
            continue
        if cat in CATEGORIES:
            out[idx] = cat
    return out


def analyze_pair(
    ref: str,
    hyp: str,
    lang: str = "en",
    llm: Optional[Callable[[str], str]] = None,
    max_gap: int = 1,
) -> Dict[str, Any]:
    """Full analysis of one (reference, hypothesis) pair.

    Returns normalized texts, WER stats, mismatch spans each tagged with a
    category (rules first, LLM for the rest, "OTHER" with ``llm=None``).
    """
    norm = _normalizer(lang)
    ref_n, hyp_n = norm(ref), norm(hyp)
    rw, hw = ref_n.split(), hyp_n.split()
    stats = edit_stats(rw, hw)
    spans = merge_mismatches(align_words(rw, hw), max_gap=max_gap)

    pending: List[int] = []
    for idx, span in enumerate(spans):
        cat = preclassify(span, lang)
        if cat is None:
            pending.append(idx)
        span["category"] = cat

    if pending and llm is not None:
        block = "\n".join(
            f"[{i}] REF: {' '.join(spans[p]['ref_words']) or '(empty)'} | "
            f"HYP: {' '.join(spans[p]['hyp_words']) or '(empty)'}"
            for i, p in enumerate(pending))
        reply = llm(CLASSIFY_PROMPT.format(
            ref=ref_n, hyp=hyp_n, mismatches=block))
        mapping = _parse_llm_json(reply)
        for i, p in enumerate(pending):
            spans[p]["category"] = mapping.get(i, "OTHER")
    else:
        for p in pending:
            spans[p]["category"] = "OTHER"

    return {
        "ref": ref_n, "hyp": hyp_n,
        "subs": stats["subs"], "dels": stats["dels"], "ins": stats["ins"],
        "ref_words": stats["ref_len"],
        "wer": 100.0 * stats["errors"] / max(stats["ref_len"], 1),
        "mismatches": spans,
    }


def analyze_manifest(
    samples: List[Dict[str, str]],
    lang: str = "en",
    llm: Optional[Callable[[str], str]] = None,
    workers: int = 4,
) -> List[Dict[str, Any]]:
    """Analyze many {"ref", "hyp"} pairs, LLM calls on a thread pool
    (reference :397-401)."""
    def one(s):
        return analyze_pair(s["ref"], s["hyp"], lang=lang, llm=llm)

    if llm is None or workers <= 1:
        return [one(s) for s in samples]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(one, samples))


def load_results_jsonl(path: str) -> List[Dict[str, Any]]:
    """Load a leaderboard-format result JSONL — the reference's published
    artifact layout (``results/MODEL_*_DATASET_*.jsonl``: ``text`` /
    ``pred_text`` / fractional ``wer`` / per-error ``errors`` records,
    reference ``analyze_errors.py:4`` and ``dashboard.py:3``) — into this
    module's analysis records, so a user migrating with existing result
    manifests feeds them straight into the dashboard and summaries.

    Records that already carry ``errors`` (the reference writes the key
    even when empty — a zero-WER line is a complete analysis) keep their
    stored alignment and categories verbatim, marked by the presence of
    ``mismatches`` in the output. Bare ``{"ref","hyp"}`` lines and
    ``text``/``pred_text`` lines WITHOUT stored errors come out as plain
    ``{"ref","hyp"}`` records for :func:`analyze_manifest` to align."""
    out: List[Dict[str, Any]] = []
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "pred_text" not in r and "hyp" in r:
            out.append(r)                       # already our schema
            continue
        if "errors" not in r:
            # Predictions only — needs alignment + classification.
            out.append({"ref": r.get("text", ""),
                        "hyp": r.get("pred_text", "")})
            continue
        mism = [{
            "ref_words": e.get("ref_words", []),
            "hyp_words": e.get("hyp_words", []),
            "category": e.get("category") or "OTHER",
        } for e in r.get("errors", [])]
        out.append({
            "ref": r.get("text_norm") or r.get("text", ""),
            "hyp": r.get("pred_text_norm") or r.get("pred_text", ""),
            "wer": 100.0 * float(r.get("wer", 0.0)),   # fractional -> %
            "subs": int(r.get("subs", 0)),
            "dels": int(r.get("dels", 0)),
            "ins": int(r.get("ins", 0)),
            "ref_words": int(r.get("ref_words", 0)),
            "duration": r.get("duration"),
            "mismatches": mism,
        })
    return out


def summarize(analyses: List[Dict[str, Any]], task: str) -> Dict[str, Any]:
    """Reference ``summary_<model>.json`` entry: category counts per task."""
    from collections import Counter

    cats = Counter(m.get("category") or "OTHER"
                   for a in analyses for m in a.get("mismatches", []))
    return {"task": task, "categories": dict(cats)}


def main():  # pragma: no cover - thin CLI
    import argparse
    import os

    ap = argparse.ArgumentParser(
        description="Analyze {ref,hyp} jsonl; write analyses json")
    ap.add_argument("manifest", help="jsonl with {'ref':..., 'hyp':...} or "
                    "a leaderboard result manifest (text/pred_text)")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--out", default="analyses.json")
    ap.add_argument("--summary", default=None,
                    help="also write reference-style category summary json")
    ap.add_argument("--use-llm", action="store_true",
                    help="classify hard cases with the configured LLM")
    args = ap.parse_args()

    samples = load_results_jsonl(args.manifest)
    # Per-record routing (a manifest may mix stored analyses with bare
    # predictions): records already carrying ``mismatches`` keep their
    # stored alignment/categories; the rest are aligned and classified
    # here. Output order matches the manifest.
    todo = [(i, s) for i, s in enumerate(samples) if "mismatches" not in s]
    n_stored = len(samples) - len(todo)
    analyses: List[Any] = list(samples)
    if todo:
        llm = None
        if args.use_llm:
            from asr_postprocess.llm import OpenAICompatClient

            llm = OpenAICompatClient()
        fresh = analyze_manifest([s for _, s in todo], lang=args.lang,
                                 llm=llm)
        for (i, _), a in zip(todo, fresh):
            analyses[i] = a
    with open(args.out, "w") as f:
        json.dump(analyses, f, indent=2)
    if args.summary:
        task = os.path.basename(args.manifest).rsplit(".", 1)[0]
        with open(args.summary, "w") as f:
            json.dump({task: summarize(analyses, task)}, f, indent=2)
    total_ref = sum(a["ref_words"] for a in analyses) or 1
    total_err = sum(a["subs"] + a["dels"] + a["ins"] for a in analyses)
    stored = f" ({n_stored} stored)" if n_stored else ""
    print(f"{len(analyses)} samples{stored}, corpus WER "
          f"{100.0 * total_err / total_ref:.2f}% -> {args.out}")


if __name__ == "__main__":
    main()
