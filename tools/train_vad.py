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

SEQ_WIN = 32          # windows per training sequence (~1 s)
HIDDEN = 64
N_BINS = 129
N_FRAMES = 3


def init_params(rng: np.random.Generator):
    def glorot(shape, fan_in, fan_out):
        s = np.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-s, s, shape).astype(np.float32)

    return {
        "conv1_w": glorot((64, N_BINS, 3), N_BINS * 3, 64),
        "conv1_b": np.zeros(64, np.float32),
        "conv2_w": glorot((64, 64, 3), 64 * 3, 64),
        "conv2_b": np.zeros(64, np.float32),
        "lstm_wx": glorot((HIDDEN, 4 * HIDDEN), HIDDEN, 4 * HIDDEN),
        "lstm_wh": glorot((HIDDEN, 4 * HIDDEN), HIDDEN, 4 * HIDDEN),
        "lstm_b": np.zeros(4 * HIDDEN, np.float32),
        "out_w": glorot((HIDDEN, 1), HIDDEN, 1),
        "out_b": np.zeros(1, np.float32),
    }


def build_batches(seed: int, n_clips: int, seconds: float = 4.0):
    """Corpus clips -> (X (N, SEQ_WIN, 512), y, mask) sequence arrays."""
    from thewhisper_tpu.streaming.vad_corpus import WINDOW, corpus

    xs, ys, ms = [], [], []
    for audio, labels, mask in corpus(seed, n_clips, seconds):
        n_win = len(labels)
        wins = audio.reshape(n_win, WINDOW)
        for s in range(0, n_win - SEQ_WIN + 1, SEQ_WIN):
            xs.append(wins[s: s + SEQ_WIN])
            ys.append(labels[s: s + SEQ_WIN])
            ms.append(mask[s: s + SEQ_WIN])
    return (np.stack(xs), np.stack(ys).astype(np.float32),
            np.stack(ms).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--clips", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
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
    X, Y, M = build_batches(args.seed, args.clips)
    print(f"  {X.shape[0]} sequences of {SEQ_WIN} windows "
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
        init = (jnp.zeros((b, HIDDEN)), jnp.zeros((b, HIDDEN)))
        _, hs = jax.lax.scan(lstm_step, init, feat.swapaxes(0, 1))
        hs = hs.swapaxes(0, 1)                # (B, T, 64)
        return (hs @ p["out_w"])[..., 0] + p["out_b"][0]   # logits

    def loss_fn(p, seqs, y, m):
        logits = forward(p, seqs)
        bce = optax.sigmoid_binary_cross_entropy(logits, y)
        return (bce * m).sum() / jnp.maximum(m.sum(), 1.0)

    params = jax.tree.map(jnp.asarray, init_params(np.random.default_rng(1)))
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
