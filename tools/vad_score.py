"""Score a VAD weights file on the out-of-family holdout (quick loop
for recipe iteration — the full report is tools/vad_holdout_probe.py).

Usage: python tools/vad_score.py [weights.npz ...] [--clips N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thewhisper_tpu.streaming.vad import NeuralVAD                # noqa: E402
from thewhisper_tpu.streaming.vad_holdout import (                # noqa: E402
    N_NEG_KINDS,
    NEG_KIND_NAMES,
    holdout_corpus,
    holdout_negative,
)

EVAL_SEED = 20260818
WINDOW = NeuralVAD.WINDOW


def load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def score(params, clips, threshold=0.1, seed=EVAL_SEED):
    vad = NeuralVAD(params=params)
    tp = fp = fn = tn = 0
    for audio, labels, mask in holdout_corpus(seed, clips):
        vad.reset_states()
        for w in range(len(labels)):
            p = vad(audio[w * WINDOW: (w + 1) * WINDOW], 16000)
            if mask[w] == 0:
                continue
            fire = p > threshold
            if labels[w] > 0.5:
                tp += fire
                fn += not fire
            else:
                fp += fire
                tn += not fire
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec, (tp, fp, fn, tn)


def fa_by_family(params, clips_each, threshold=0.1):
    vad = NeuralVAD(params=params)
    rng = np.random.default_rng(EVAL_SEED + 1)
    rates = []
    for kind in range(N_NEG_KINDS):
        fires = total = 0
        for _ in range(clips_each):
            neg = holdout_negative(rng, 4.0, kind=kind)
            vad.reset_states()
            for w in range(len(neg) // WINDOW):
                fires += vad(neg[w * WINDOW: (w + 1) * WINDOW],
                             16000) > threshold
                total += 1
        rates.append(fires / max(total, 1))
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", nargs="+")
    ap.add_argument("--clips", type=int, default=80)
    ap.add_argument("--families", action="store_true")
    args = ap.parse_args()
    for path in args.weights:
        p, r, c = score(load(path), args.clips)
        print(f"{os.path.basename(path):40s} P {p:.3f} R {r:.3f} {c}",
              flush=True)
        if args.families:
            rates = fa_by_family(load(path), max(args.clips // 4, 8))
            worst = sorted(zip(rates, NEG_KIND_NAMES), reverse=True)[:3]
            print("   worst FA families: "
                  + ", ".join(f"{n} {v:.3f}" for v, n in worst), flush=True)


if __name__ == "__main__":
    main()
