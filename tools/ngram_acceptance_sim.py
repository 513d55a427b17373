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
        rounds, emitted, hist = simulate(toks, w)
        tpr = emitted / max(rounds, 1)
        total = sum(hist)
        print(f"{name}: {len(toks)} tokens, {rounds} rounds, "
              f"{tpr:.2f} tokens/round (speedup ceiling {tpr:.2f}x at "
              f"equal round cost)")
        print("  accepted-draft histogram: "
              + " ".join(f"m={i}:{100 * c / total:.0f}%"
                         for i, c in enumerate(hist)))


if __name__ == "__main__":
    main()
