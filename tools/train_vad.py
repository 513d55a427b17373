"""Train the NeuralVAD on the synthetic corpus; ship weights as npz.

Trains the exact architecture ``streaming/vad.py::NeuralVAD`` runs in
numpy (STFT features -> two k=3 convs -> LSTM -> sigmoid) with JAX on
CPU, using sequences of consecutive 512-sample windows so the LSTM learns
its streaming state. BCE loss, ambiguous boundary windows masked out.

Usage:
    python tools/train_vad.py [--steps 1200] [--out .../vad_weights.npz]

Reproducible: fixed seeds; ~2-4 min on CPU. The shipped weights at
``thewhisper_tpu/streaming/vad_weights.npz`` were produced by this script
with default arguments. Held-out accuracy is asserted in
``tests/test_vad.py``.
"""

import argparse
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

SEQ_WIN = 32          # windows per training sequence (~1 s; --seq-win)
FEAT = 64             # conv output channels (fixed; LSTM input width)
N_BINS = 129
N_FRAMES = 3


def init_params(rng: np.random.Generator, hidden: int = 64):
    def glorot(shape, fan_in, fan_out):
        s = np.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-s, s, shape).astype(np.float32)

    return {
        "conv1_w": glorot((64, N_BINS, 3), N_BINS * 3, 64),
        "conv1_b": np.zeros(64, np.float32),
        "conv2_w": glorot((64, 64, 3), 64 * 3, 64),
        "conv2_b": np.zeros(64, np.float32),
        "lstm_wx": glorot((FEAT, 4 * hidden), FEAT, 4 * hidden),
        "lstm_wh": glorot((hidden, 4 * hidden), hidden, 4 * hidden),
        "lstm_b": np.zeros(4 * hidden, np.float32),
        "out_w": glorot((hidden, 1), hidden, 1),
        "out_b": np.zeros(1, np.float32),
    }


def build_batches(seed: int, n_clips: int, seconds: float = 4.0,
                  seq_win: int = SEQ_WIN):
    """Corpus clips -> (X (N, seq_win, 512), y, mask) sequence arrays."""
    from thewhisper_tpu.streaming.vad_corpus import WINDOW, corpus

    xs, ys, ms = [], [], []
    for audio, labels, mask in corpus(seed, n_clips, seconds):
        n_win = len(labels)
        wins = audio.reshape(n_win, WINDOW)
        for s in range(0, n_win - seq_win + 1, seq_win):
            xs.append(wins[s: s + seq_win])
            ys.append(labels[s: s + seq_win])
            ms.append(mask[s: s + seq_win])
    return (np.stack(xs), np.stack(ys).astype(np.float32),
            np.stack(ms).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--clips", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pos-weight", type=float, default=2.0)
    ap.add_argument("--hidden", type=int, default=64,
                    help="LSTM width (inference infers it from lstm_b)")
    ap.add_argument("--seq-win", type=int, default=SEQ_WIN,
                    help="windows per training sequence (32 ~ 1 s; longer "
                         "sequences let the LSTM span a full pluck decay)")
    ap.add_argument("--mine", type=int, default=400,
                    help="clips per class to mine hard examples from "
                         "(0 disables)")
    ap.add_argument("--mine-steps", type=int, default=400)
    ap.add_argument("--out", default=os.path.join(
        _repo, "thewhisper_tpu", "streaming", "vad_weights.npz"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    print("generating corpus...", flush=True)
    t0 = time.time()
    seq_win = args.seq_win
    X, Y, M = build_batches(args.seed, args.clips, seq_win=seq_win)
    print(f"  {X.shape[0]} sequences of {seq_win} windows "
          f"({time.time() - t0:.1f}s); positive rate "
          f"{float((Y * M).sum() / max(M.sum(), 1)):.3f}", flush=True)

    hann = jnp.asarray(np.hanning(256).astype(np.float32))

    def features(wins):                       # (..., 512) -> (..., 129, 3)
        frames = jnp.stack([wins[..., o: o + 256] for o in (0, 128, 256)],
                           axis=-2)           # (..., 3, 256)
        mag = jnp.abs(jnp.fft.rfft(frames * hann, axis=-1))
        return jnp.log1p(mag).swapaxes(-1, -2)  # (..., 129, 3)

    def conv3(x, w, b):                       # x (..., Cin, T)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 1)])
        t = x.shape[-1]
        out = sum(jnp.einsum("oi,...it->...ot", w[:, :, k],
                             xp[..., k: k + t]) for k in range(3))
        return out + b[:, None]

    def forward(p, seqs):                     # seqs (B, T, 512) -> (B, T)
        f = features(seqs)                    # (B, T, 129, 3)
        h1 = jax.nn.relu(conv3(f, p["conv1_w"], p["conv1_b"]))
        h2 = jax.nn.relu(conv3(h1, p["conv2_w"], p["conv2_b"]))
        feat = h2.mean(axis=-1)               # (B, T, 64)

        def lstm_step(carry, x):
            h, c = carry
            gates = x @ p["lstm_wx"] + h @ p["lstm_wh"] + p["lstm_b"]
            i, fg, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        b = seqs.shape[0]
        hid = p["lstm_b"].shape[0] // 4
        init = (jnp.zeros((b, hid)), jnp.zeros((b, hid)))
        _, hs = jax.lax.scan(lstm_step, init, feat.swapaxes(0, 1))
        hs = hs.swapaxes(0, 1)                # (B, T, 64)
        return (hs @ p["out_w"])[..., 0] + p["out_b"][0]   # logits

    def loss_fn(p, seqs, y, m):
        logits = forward(p, seqs)
        bce = optax.sigmoid_binary_cross_entropy(logits, y)
        # Positive windows are ~25% of the corpus; upweight them so the
        # 0.1 streaming gate keeps recall (round-5: the out-of-family
        # failure flipped from precision to recall once negatives
        # broadened).
        w = m * (1.0 + (args.pos_weight - 1.0) * y)
        return (bce * w).sum() / jnp.maximum(w.sum(), 1.0)

    params = jax.tree.map(jnp.asarray, init_params(
        np.random.default_rng(1), hidden=args.hidden))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, seqs, y, m):
        l, g = jax.value_and_grad(loss_fn)(p, seqs, y, m)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    rng = np.random.default_rng(args.seed + 100)
    n = X.shape[0]
    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, n, args.batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(X[idx]), jnp.asarray(Y[idx]),
            jnp.asarray(M[idx]))
        if it % 100 == 0 or it == args.steps - 1:
            print(f"  step {it:5d} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # --- two-sided hard-example mining (round 5, VERDICT r4 #6) ------------
    # Mine the model's OWN failures at the production gate (0.1), from the
    # TRAINING families only (never the holdout — that would taint the
    # transfer eval): false ACCEPTS on negative-only clips, and false
    # REJECTS on labeled speech clips. One-sided negative mining (the
    # first round-5 attempt) bought precision 0.76->0.82 but pushed the
    # boundary into speech: recall fell 0.90->0.74. Fine-tuning on a
    # balanced mix of both failure sides moves the boundary, not its
    # bias.
    if args.mine > 0:
        print(f"mining hard examples from {args.mine} clips/side...",
              flush=True)
        from thewhisper_tpu.streaming.vad_corpus import (
            WINDOW,
            _channel_augment,
            make_clip,
            synth_negative,
            synth_negative_aug,
            synth_negative_aug2,
            synth_negative_aug3,
        )

        fwd = jax.jit(forward)
        mrng = np.random.default_rng(args.seed + 777)

        def batched_probs(cand):
            probs = np.zeros(cand.shape[:2], np.float32)
            for s in range(0, len(cand), 256):
                probs[s: s + 256] = jax.nn.sigmoid(
                    fwd(params, jnp.asarray(cand[s: s + 256])))
            return probs

        # False accepts: negative-only clips the model fires on.
        gens = (synth_negative, synth_negative_aug, synth_negative_aug2,
                synth_negative_aug3, synth_negative_aug3)
        cand = []
        for i in range(args.mine):
            neg = gens[int(mrng.integers(0, len(gens)))](mrng, 4.0)
            neg, _ = _channel_augment(mrng, neg,
                                      np.zeros(len(neg), np.float32))
            n_win = len(neg) // WINDOW
            wins = neg[: n_win * WINDOW].reshape(n_win, WINDOW)
            for s in range(0, n_win - seq_win + 1, seq_win):
                cand.append(wins[s: s + seq_win])
        cand = np.stack(cand)
        probs = batched_probs(cand)
        hard_neg = cand[(probs > 0.1).any(axis=1)]    # the production gate
        print(f"  {len(hard_neg)}/{len(cand)} negative sequences contain "
              "false accepts", flush=True)

        # False rejects: labeled clips with speech windows under the gate.
        xs, ys, ms = [], [], []
        for i in range(args.mine):
            audio, labels, mask = make_clip(mrng)
            n_win = len(labels)
            wins = audio[: n_win * WINDOW].reshape(n_win, WINDOW)
            for s in range(0, n_win - seq_win + 1, seq_win):
                xs.append(wins[s: s + seq_win])
                ys.append(labels[s: s + seq_win])
                ms.append(mask[s: s + seq_win])
        xs = np.stack(xs)
        ys, ms = np.stack(ys), np.stack(ms)
        probs = batched_probs(xs)
        miss = (probs < 0.1) & (ys > 0.5) & (ms > 0.5)
        sel = miss.any(axis=1)
        hard_pos, yp, mp = xs[sel], ys[sel], ms[sel]
        print(f"  {len(hard_pos)}/{len(xs)} speech sequences contain "
              "false rejects", flush=True)

        if len(hard_neg) and len(hard_pos):
            k = max(args.batch // 8, 1)   # k hard-neg + k hard-pos per batch
            for it in range(args.mine_steps):
                idx = rng.integers(0, n, args.batch - 2 * k)
                ni = rng.integers(0, len(hard_neg), k)
                pi = rng.integers(0, len(hard_pos), k)
                bx = np.concatenate([X[idx], hard_neg[ni], hard_pos[pi]])
                by = np.concatenate([Y[idx],
                                     np.zeros((k, seq_win), np.float32),
                                     yp[pi]])
                bm = np.concatenate([M[idx],
                                     np.ones((k, seq_win), np.float32),
                                     mp[pi]])
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(bx), jnp.asarray(by),
                    jnp.asarray(bm))
                if it % 100 == 0 or it == args.mine_steps - 1:
                    print(f"  mine step {it:5d} loss {float(loss):.4f}",
                          flush=True)

    out = {k: np.asarray(v, np.float32) for k, v in params.items()}
    np.savez(args.out, **out)
    print(f"wrote {args.out} "
          f"({sum(v.size for v in out.values())} params)")

    # Quick held-out check with the numpy inference path — on the
    # JUST-TRAINED weights (a bare NeuralVAD() would load the SHIPPED
    # file and silently validate the wrong model when --out differs).
    from thewhisper_tpu.streaming.vad import NeuralVAD
    from thewhisper_tpu.streaming.vad_corpus import WINDOW, corpus

    vad = NeuralVAD(params=out)
    tp = fp = fn = tn = 0
    for audio, labels, mask in corpus(args.seed + 999, 60):
        vad.reset_states()
        for w in range(len(labels)):
            prob = vad(audio[w * WINDOW: (w + 1) * WINDOW])
            if mask[w] == 0:
                continue
            pred = prob > 0.5
            if labels[w]:
                tp += pred
                fn += not pred
            else:
                fp += pred
                tn += not pred
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    print(f"held-out (thr 0.5): precision {prec:.3f} recall {rec:.3f} "
          f"(tp {tp} fp {fp} fn {fn} tn {tn})")


if __name__ == "__main__":
    main()
