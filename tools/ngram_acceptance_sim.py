"""Exact ngram-draft acceptance simulation on natural text (host-only).

The prompt-lookup drafting rule (engine/speculative.py::ngram_propose) is
a deterministic function of the emitted token sequence — so its
acceptance on any transcript can be computed EXACTLY without a model or
TPU: walk the greedy token sequence, at each round look up the most
recent earlier occurrence of the current bigram, take the following W
tokens as the draft, count how many match the true continuation.

This turns the round-2 "measured on repetitive output" caveat into an
honest expected-case number: run it on natural English text (here: the
plain-English prose of this repo's documentation, tokenized with the
real Whisper tokenizer) vs a repetitive transcript, and combine
tokens/round with the hardware-measured verify-round rate
(tools/spec_honesty_probe.py) to predict net tok/s.

Usage: python tools/ngram_acceptance_sim.py [--window 5]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simulate_device(tokens, p_len: int, w: int, two_tier: bool = False):
    """EXACT device-rule round simulation (engine/speculative.py).

    Unlike :func:`simulate` (which drafts from the finished sequence),
    this replicates what the device buffer actually contains mid-decode:
    slots beyond the current frontier are ZEROS, so a near-frontier
    bigram match drafts zeros and misses. On short-period repetitive
    output the optimistic rule overestimates tokens/round ~2.5x — which
    is precisely why the round-3 differential-rounds estimate read the
    ngram round at ~2.6x a step (the denominator was wrong, not the
    program).

    ``tokens``: prompt + generated (first ``p_len`` entries = prompt).
    ``two_tier=True`` simulates the improved lookup: prefer the most
    recent hit whose W-token continuation is fully written; fall back to
    the most recent partial hit.
    Returns (rounds, emitted, accepted_histogram[w+1]).
    """
    n = len(tokens)
    hist = [0] * (w + 1)
    rounds = 0
    frontier = p_len              # prefill wrote the first generated token
    while frontier < n - 1:
        feed = frontier
        prev, w0 = tokens[feed - 1], tokens[feed]
        best = best_full = None
        for j in range(feed - 2, 0, -1):
            if tokens[j] == prev and tokens[j + 1] == w0:
                if best is None:
                    best = j
                if j + w + 1 <= feed:
                    best_full = j
                    break         # most recent fully-written hit
                if not two_tier:
                    break         # legacy: most recent hit, full or not
        sel = (best_full if two_tier and best_full is not None else best)
        start = sel + 2 if sel is not None else feed
        drafts = [tokens[start + k] if start + k <= frontier else 0
                  for k in range(w)]
        m = 0
        for k, d in enumerate(drafts):
            if feed + 1 + k < n and tokens[feed + 1 + k] == d:
                m += 1
            else:
                break
        hist[m] += 1
        rounds += 1
        frontier += m + 1
    return rounds, n - 1 - p_len, hist


def simulate(tokens, w: int):
    """Replicates ngram_propose over a finished sequence.

    Returns (rounds, tokens_emitted, accepted_histogram[w+1]).
    Round semantics match the device loop: each round emits m accepted
    drafts + 1 bonus token (1..w+1 tokens/round)."""
    n = len(tokens)
    hist = [0] * (w + 1)
    rounds = 0
    pos = 1                       # first token emitted by prefill argmax
    while pos < n:
        prev, cur = tokens[pos - 1], tokens[pos]
        # Most recent earlier occurrence of the bigram (prev, cur).
        start = None
        for j in range(pos - 2, 0, -1):
            if tokens[j - 1] == prev and tokens[j] == cur:
                start = j + 1
                break
        if start is None:
            drafts = []           # device falls back to garbage -> 0 accepted
        else:
            drafts = tokens[start: start + w]
        m = 0
        for k, d in enumerate(drafts):
            if pos + 1 + k < n and tokens[pos + 1 + k] == d:
                m += 1
            else:
                break
        hist[m] += 1
        rounds += 1
        pos += m + 1              # m accepted + 1 bonus
    return rounds, n - 1, hist


def words_to_tokens(text: str, tokenizer=None):
    if tokenizer is not None:
        return tokenizer.encode(text, add_special_tokens=False)
    # Fallback: word-level ids (acceptance statistics are similar in
    # structure; subword tokenization only increases repetition).
    vocab = {}
    return [vocab.setdefault(wd, len(vocab))
            for wd in re.findall(r"[a-z']+", text.lower())]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=5)
    args = ap.parse_args()
    w = args.window

    # Natural prose: this repo's documentation (plain English sentences).
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    texts = []
    for f in ("README.md", "PARITY.md", "SURVEY.md"):
        p = os.path.join(root, f)
        if os.path.exists(p):
            raw = open(p, encoding="utf-8").read()
            raw = re.sub(r"```.*?```", " ", raw, flags=re.S)   # drop code
            raw = re.sub(r"[|`#*_\[\]()>-]", " ", raw)
            texts.append(raw)
    natural = " ".join(texts)

    # Repetitive transcript: a looping refrain (the round-2 headline's
    # best case — hallucination loops / repeated phrases).
    repetitive = ("the quick brown fox jumps over the lazy dog and then "
                  ) * 60

    tokenizer = None
    try:
        from transformers import WhisperTokenizerFast

        ckpt = os.environ.get("SIM_TOKENIZER")
        if ckpt:
            tokenizer = WhisperTokenizerFast.from_pretrained(ckpt)
    except Exception:
        pass

    for name, text in (("natural", natural), ("repetitive", repetitive)):
        toks = words_to_tokens(text, tokenizer)[:12000]
        # Device-exact rules (the numbers that predict real behavior);
        # shift ids by 1 so the device's zero-filled frontier cannot
        # alias a real token, and prepend a 4-token stand-in prompt.
        seq = [10**6, 10**6 + 1, 10**6 + 2, 10**6 + 3] + [t + 1 for t in toks]
        r2, e2, hist = simulate_device(seq, 4, w, two_tier=True)
        r1, e1, _ = simulate_device(seq, 4, w, two_tier=False)
        ro, eo, _ = simulate(toks, w)
        total = sum(hist)
        print(f"{name}: {len(toks)} tokens | two-tier {e2 / max(r2, 1):.2f} "
              f"tok/round | legacy rule {e1 / max(r1, 1):.2f} | "
              f"optimistic (finished-sequence) sim {eo / max(ro, 1):.2f} "
              f"(do not use for costing)")
        print("  two-tier accepted-draft histogram: "
              + " ".join(f"m={i}:{100 * c / total:.0f}%"
                         for i, c in enumerate(hist)))


if __name__ == "__main__":
    main()
