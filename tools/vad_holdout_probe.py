"""Out-of-family VAD validation table (round-3 review #7).

Evaluates the shipped NeuralVAD against the EnergyVAD fallback on the
held-out generator family (``streaming/vad_holdout.py`` — Rosenberg-pulse
/ whispered speech over Karplus-Strong music, rain, applause, machinery,
wind, traffic) at the reference's 0.1 streaming gate, across the MUSAN
SNR protocol (clean-mix / 10 / 5 / 0 dB), plus a threshold sweep for
recalibration evidence. No real audio exists in this image; this is the
transfer test standing in for it.

Each corpus is generated once; both VADs' per-window probabilities are
recorded in a single pass so every threshold reads the same run.

Usage: python tools/vad_holdout_probe.py [--clips 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from thewhisper_tpu.streaming.vad import EnergyVAD, NeuralVAD  # noqa: E402
from thewhisper_tpu.streaming.vad_corpus import WINDOW  # noqa: E402
from thewhisper_tpu.streaming.vad_holdout import holdout_corpus  # noqa: E402

EVAL_SEED = 20260818       # never seen by tools/train_vad.py


def collect(clips, seed, snr_db=None):
    """One pass: (neural probs, energy probs, labels) over scored windows."""
    vn, ve = NeuralVAD(), EnergyVAD()
    pn, pe, ys = [], [], []
    for audio, labels, mask in holdout_corpus(seed, clips, snr_db=snr_db):
        vn.reset_states()
        ve.reset_states()
        for w in range(len(labels)):
            win = audio[w * WINDOW: (w + 1) * WINDOW]
            a, b = vn(win, 16000), ve(win, 16000)
            if mask[w] == 0:
                continue
            pn.append(a)
            pe.append(b)
            ys.append(labels[w])
    return np.asarray(pn), np.asarray(pe), np.asarray(ys, bool)


def pr(probs, ys, th):
    pred = probs > th
    tp = int(np.sum(pred & ys))
    fp = int(np.sum(pred & ~ys))
    fn = int(np.sum(~pred & ys))
    return (tp / max(tp + fp, 1), tp / max(tp + fn, 1),
            (tp, fp, fn, int(np.sum(~pred & ~ys))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=60)
    args = ap.parse_args()

    runs = {}
    for name, snr in (("random 0-25 dB", None), ("10 dB", 10.0),
                      ("5 dB", 5.0), ("0 dB", 0.0)):
        runs[name] = collect(args.clips, EVAL_SEED, snr)
        print(f"collected {name}: {len(runs[name][2])} scored windows",
              file=sys.stderr, flush=True)

    print("| SNR | NeuralVAD@0.1 P / R | EnergyVAD@0.1 P / R |")
    print("|---|---|---|")
    for name, (pn, pe, ys) in runs.items():
        p1, r1, c1 = pr(pn, ys, 0.1)
        p2, r2, c2 = pr(pe, ys, 0.1)
        print(f"| {name} | {p1:.3f} / {r1:.3f} | {p2:.3f} / {r2:.3f} |"
              f"   <!-- neural {c1} energy {c2} -->")

    print("\nNeuralVAD P/R curve (random-SNR mix):")
    pn, _, ys = runs["random 0-25 dB"]
    for th in (0.02, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9):
        p, r, c = pr(pn, ys, th)
        print(f"  th={th:.2f}: precision {p:.3f} recall {r:.3f} {c}")

    # Per-family false-accept rates on PURE negatives: which noise family
    # drives the precision loss at the production gate.
    from thewhisper_tpu.streaming.vad_holdout import (
        N_NEG_KINDS,
        NEG_KIND_NAMES,
        holdout_negative,
    )

    print("\nfalse-accept rate @0.1 by negative family "
          f"({max(args.clips // 3, 10)} clips each):")
    vn = NeuralVAD()
    rng = np.random.default_rng(EVAL_SEED + 1)
    for kind in range(N_NEG_KINDS):
        fires = total = 0
        for _ in range(max(args.clips // 3, 10)):
            neg = holdout_negative(rng, 4.0, kind=kind)
            vn.reset_states()
            n_win = len(neg) // WINDOW
            for w in range(n_win):
                fires += vn(neg[w * WINDOW: (w + 1) * WINDOW], 16000) > 0.1
                total += 1
        print(f"  {NEG_KIND_NAMES[kind]:22s}: {fires/max(total,1):.3f} "
              f"({fires}/{total})")


if __name__ == "__main__":
    main()
