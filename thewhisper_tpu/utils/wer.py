"""Word/character error rate and alignment (no jiwer/evaluate dependency).

The reference computes WER/CER through the ``evaluate`` package and word
alignments through ``jiwer`` (``benchmark/eval_utils.py:44-60``,
``asr_postprocess/analyze_errors.py``); neither is installed here, so this
is a self-contained Levenshtein implementation returning the same numbers
plus the aligned operation list the error-analysis pipeline needs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def edit_stats(ref: Sequence, hyp: Sequence) -> Dict[str, int]:
    """Levenshtein S/D/I counts between two token sequences.

    Dispatches to the C++ host runtime (tokens interned to int32 ids) when
    available; pure-numpy fallback below.
    """
    from thewhisper_tpu.native_lib import edit_stats_native

    vocab: Dict = {}

    def intern(seq):
        out = np.empty(len(seq), dtype=np.int32)
        for i, tok in enumerate(seq):
            out[i] = vocab.setdefault(tok, len(vocab))
        return out

    native = edit_stats_native(intern(ref), intern(hyp))
    if native is not None:
        return native

    n, m = len(ref), len(hyp)
    # dp[i, j]: (cost, subs, dels, ins) packed as cost matrix + backtrace.
    cost = np.zeros((n + 1, m + 1), dtype=np.int32)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        prev = cost[i - 1]
        cur = cost[i]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            dele = prev[j] + 1
            ins = cur[j - 1] + 1
            cur[j] = min(sub, dele, ins)

    # Backtrace for S/D/I split.
    i, j = n, m
    subs = dels = ins = hits = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + (
                ref[i - 1] != hyp[j - 1]):
            if ref[i - 1] != hyp[j - 1]:
                subs += 1
            else:
                hits += 1
            i, j = i - 1, j - 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return {"subs": subs, "dels": dels, "ins": ins, "hits": hits,
            "ref_len": n, "hyp_len": m, "errors": subs + dels + ins}


def wer(references: Sequence[str], hypotheses: Sequence[str]) -> float:
    """Corpus WER over whitespace-tokenized texts (matches evaluate's wer)."""
    total_err = 0
    total_ref = 0
    for ref, hyp in zip(references, hypotheses):
        st = edit_stats(ref.split(), hyp.split())
        total_err += st["errors"]
        total_ref += st["ref_len"]
    return total_err / max(total_ref, 1)


def cer(references: Sequence[str], hypotheses: Sequence[str]) -> float:
    """Corpus CER over characters."""
    total_err = 0
    total_ref = 0
    for ref, hyp in zip(references, hypotheses):
        st = edit_stats(list(ref), list(hyp))
        total_err += st["errors"]
        total_ref += st["ref_len"]
    return total_err / max(total_ref, 1)


def align_words(ref: Sequence[str], hyp: Sequence[str]
                ) -> List[Tuple[str, str, str]]:
    """Aligned ops: (op, ref_word, hyp_word) with op in equal|sub|del|ins.

    The jiwer-style alignment the post-correction analyzer consumes.
    """
    n, m = len(ref), len(hyp)
    cost = np.zeros((n + 1, m + 1), dtype=np.int32)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost[i, j] = min(
                cost[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                cost[i - 1, j] + 1,
                cost[i, j - 1] + 1,
            )
    ops: List[Tuple[str, str, str]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + (
                ref[i - 1] != hyp[j - 1]):
            op = "sub" if ref[i - 1] != hyp[j - 1] else "equal"
            ops.append((op, ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            ops.append(("del", ref[i - 1], ""))
            i -= 1
        else:
            ops.append(("ins", "", hyp[j - 1]))
            j -= 1
    return ops[::-1]
