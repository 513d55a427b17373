"""Synthetic labeled speech/non-speech corpus for VAD training + eval.

The reference gates streaming on the Silero VAD (reference
``streaming_pipeline.py:533-538,589-622``), whose weights cannot ship in
this offline build. Instead we *train* a Silero-shaped neural VAD
(``streaming/vad.py::NeuralVAD``, trainer ``tools/train_vad.py``) on a
fully synthetic corpus generated here, and evaluate precision/recall on a
held-out seed (``tests/test_vad.py``).

Positives are formant-synthesized speech: glottal pulse trains with a
jittered f0 contour driven through 2nd-order formant resonators (F1-F3 in
speech ranges), interleaved with unvoiced fricative bursts, shaped by a
syllabic envelope. Negatives cover silence, white/pink noise, mains hum
with harmonics, stationary tones, clicks, and filtered rumble. Positives
are mixed over negatives at SNRs from -2 to 30 dB. Per-512-sample-window
labels come from the known clean-speech activity, with ambiguous boundary
windows (20-80 % active) masked out of training loss and eval.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

SR = 16000
WINDOW = 512


def _resonator(x: np.ndarray, freq: float, bw: float, sr: int = SR) -> np.ndarray:
    """2nd-order IIR formant resonator (digital resonator form)."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    a1, a2 = -2 * r * np.cos(theta), r * r
    b0 = 1 - r
    y = np.empty_like(x)
    z1 = z2 = 0.0
    try:
        from scipy.signal import lfilter

        return lfilter([b0], [1.0, a1, a2], x).astype(np.float32)
    except Exception:  # pragma: no cover - scipy is in the image
        for i in range(len(x)):
            y[i] = b0 * x[i] - a1 * z1 - a2 * z2
            z2, z1 = z1, y[i]
        return y


def synth_speech(rng: np.random.Generator, seconds: float,
                 sr: int = SR) -> Tuple[np.ndarray, np.ndarray]:
    """Formant-synthesized pseudo-speech.

    Returns (audio, activity) where ``activity`` is a per-sample 0/1 mask
    of where speech energy actually is (the syllabic envelope support).
    """
    n = int(seconds * sr)
    audio = np.zeros(n, np.float32)
    activity = np.zeros(n, np.float32)
    t = 0
    while t < n:
        # Utterance of 1-8 syllables, then a pause.
        n_syll = int(rng.integers(1, 9))
        for _ in range(n_syll):
            dur = int(rng.uniform(0.08, 0.35) * sr)
            dur = min(dur, n - t)
            if dur <= 0:
                break
            voiced = rng.random() < 0.75
            if voiced:
                # Glottal pulse train with jittered f0 contour.
                f0 = rng.uniform(80, 300)
                drift = np.cumsum(rng.normal(0, 0.5, dur))
                phase = np.cumsum((f0 + drift) / sr)
                src = (np.mod(phase, 1.0) < 0.1).astype(np.float32)
                src += 0.02 * rng.standard_normal(dur).astype(np.float32)
                seg = np.zeros(dur, np.float32)
                for lo, hi, bw in ((250, 900, 80), (850, 2500, 120),
                                   (2300, 3500, 160)):
                    seg += _resonator(src, rng.uniform(lo, hi),
                                      rng.uniform(bw * 0.7, bw * 1.5), sr)
            else:
                # Fricative: high-passed noise burst.
                noise = rng.standard_normal(dur).astype(np.float32)
                seg = np.diff(noise, prepend=0.0).astype(np.float32)
            # Raised-cosine syllable envelope.
            env = 0.5 - 0.5 * np.cos(
                2 * np.pi * np.arange(dur) / max(dur - 1, 1))
            seg = seg * env.astype(np.float32)
            peak = np.abs(seg).max() + 1e-9
            seg = seg / peak * rng.uniform(0.3, 1.0)
            audio[t: t + dur] += seg
            activity[t: t + dur] = np.maximum(
                activity[t: t + dur], (env > 0.15).astype(np.float32))
            t += dur
            # Short intra-utterance gap.
            t += int(rng.uniform(0.0, 0.06) * sr)
        t += int(rng.uniform(0.15, 1.0) * sr)   # inter-utterance pause
    return audio, activity


def synth_negative(rng: np.random.Generator, seconds: float,
                   sr: int = SR) -> np.ndarray:
    """One non-speech clip.

    Kinds 0-5: silence / white / pink / hum / tones / clicks. Kinds 6-8
    are the deliberately *speech-confusable* hard negatives that set the
    precision of the sensitive 0.1 streaming gate: noise amplitude-
    modulated at syllabic rates (2-8 Hz — the envelope cue alone must not
    fire the VAD), frequency chirps, and music-like tone arpeggios with
    note-rate onsets.
    """
    n = int(seconds * sr)
    kind = rng.integers(0, 9)
    if kind == 0:      # near-silence with dither
        return (1e-4 * rng.standard_normal(n)).astype(np.float32)
    if kind == 1:      # white noise
        return (rng.uniform(0.02, 0.5)
                * rng.standard_normal(n)).astype(np.float32)
    if kind == 2:      # pink-ish noise (leaky integrator of white)
        from scipy.signal import lfilter

        w = rng.standard_normal(n).astype(np.float32)
        y = lfilter([0.02], [1.0, -0.98], w).astype(np.float32)
        y /= (np.abs(y).max() + 1e-9)
        return (rng.uniform(0.05, 0.5) * y).astype(np.float32)
    if kind == 3:      # mains hum + harmonics
        base = rng.choice([50.0, 60.0])
        tt = np.arange(n) / sr
        y = sum(rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * base * k * tt
                                               + rng.uniform(0, 6.28))
                for k in range(1, 6))
        y = np.asarray(y, np.float32)
        return (rng.uniform(0.05, 0.3) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 4:      # stationary tone(s) outside syllabic modulation
        tt = np.arange(n) / sr
        y = sum(np.sin(2 * np.pi * rng.uniform(300, 4000) * tt
                       + rng.uniform(0, 6.28))
                for _ in range(int(rng.integers(1, 4))))
        y = np.asarray(y, np.float32)
        return (rng.uniform(0.05, 0.4) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 5:      # clicks / impulsive transients
        y = np.zeros(n, np.float32)
        for _ in range(int(rng.integers(2, 12))):
            pos = int(rng.integers(0, max(n - 64, 1)))
            y[pos: pos + 64] = (rng.uniform(0.2, 0.9)
                                * np.exp(-np.arange(64) / 8.0)
                                * rng.standard_normal(64))
        return y
    tt = np.arange(n) / sr
    if kind == 6:      # syllabic-rate AM noise (envelope-only confuser)
        from scipy.signal import lfilter

        w = rng.standard_normal(n).astype(np.float32)
        if rng.random() < 0.5:                # band-limit like voiced energy
            w = lfilter([0.1], [1.0, -0.9], w).astype(np.float32)
        am = 0.5 - 0.5 * np.cos(
            2 * np.pi * rng.uniform(2.0, 8.0) * tt + rng.uniform(0, 6.28))
        y = (w * am.astype(np.float32))
        return (rng.uniform(0.1, 0.6) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 7:      # frequency chirps / sirens
        f0 = rng.uniform(200, 1500)
        f1 = rng.uniform(500, 4000)
        rate = rng.uniform(0.3, 3.0)
        sweep = f0 + (f1 - f0) * 0.5 * (1 - np.cos(2 * np.pi * rate * tt))
        y = np.sin(2 * np.pi * np.cumsum(sweep) / sr).astype(np.float32)
        return (rng.uniform(0.05, 0.4) * y).astype(np.float32)
    # kind == 8: music-like tone arpeggio with note-rate onsets
    y = np.zeros(n, np.float32)
    root = rng.uniform(110, 440)
    note_len = int(rng.uniform(0.1, 0.4) * sr)
    pos = 0
    while pos < n:
        dur = min(note_len, n - pos)
        f = root * 2 ** (rng.integers(0, 13) / 12.0)
        env = np.exp(-np.arange(dur) / (0.3 * sr))
        tone = sum(a * np.sin(2 * np.pi * f * k * np.arange(dur) / sr)
                   for k, a in ((1, 1.0), (2, 0.5), (3, 0.25)))
        y[pos: pos + dur] += (env * tone).astype(np.float32)
        pos += dur
    return (rng.uniform(0.1, 0.5) * y / (np.abs(y).max() + 1e-9)
            ).astype(np.float32)


def synth_speech_aug(rng: np.random.Generator, seconds: float,
                     sr: int = SR) -> Tuple[np.ndarray, np.ndarray]:
    """Training-AUGMENTATION speech family (round-4 transfer fix).

    The round-3 model trained on ``synth_speech`` alone transferred
    badly to out-of-family synthesis (``vad_holdout.py`` measured
    precision 0.64 / recall 0.86 at the 0.1 gate): the trainer had only
    rectangular pulse-train voicing with per-syllable FIXED formants.
    This family adds the missing acoustic dimensions with recipes
    distinct from BOTH the original corpus and the holdout evaluator:
    sawtooth glottal source, LINEAR formant ramps between two targets
    per syllable, and whisper-like unvoiced syllables (noise through the
    same formant ramps — no periodicity cue).
    """
    n = int(seconds * sr)
    audio = np.zeros(n, np.float32)
    activity = np.zeros(n, np.float32)
    t = int(rng.uniform(0.0, 0.2) * sr)
    while t < n:
        n_syll = int(rng.integers(1, 7))
        whisper_word = rng.random() < 0.2
        for _ in range(n_syll):
            dur = int(rng.uniform(0.08, 0.3) * sr)
            dur = min(dur, n - t)
            if dur <= 0:
                break
            tt = np.arange(dur)
            if whisper_word or rng.random() < 0.15:
                src = (0.5 * rng.standard_normal(dur)).astype(np.float32)
            else:
                f0 = rng.uniform(70, 320)
                contour = f0 * (1 + rng.uniform(-0.15, 0.15) * tt / max(dur, 1))
                phase = np.cumsum(contour / sr)
                src = (2.0 * np.mod(phase, 1.0) - 1.0).astype(np.float32)
                src += 0.03 * rng.standard_normal(dur).astype(np.float32)
            seg = np.zeros(dur, np.float32)
            for lo, hi, bw in ((250, 900, 80), (850, 2500, 120),
                               (2300, 3500, 160)):
                fa, fb = rng.uniform(lo, hi), rng.uniform(lo, hi)
                # Linear formant ramp: filter in two halves at the mean
                # of each half (cheap piecewise approximation).
                half = max(dur // 2, 1)
                bww = rng.uniform(bw * 0.7, bw * 1.5)
                seg[:half] += _resonator(src[:half], (3 * fa + fb) / 4,
                                         bww, sr)
                seg[half:] += _resonator(src[half:], (fa + 3 * fb) / 4,
                                         bww, sr)
            env = 0.5 - 0.5 * np.cos(
                2 * np.pi * np.arange(dur) / max(dur - 1, 1))
            seg = seg * env.astype(np.float32)
            seg = seg / (np.abs(seg).max() + 1e-9) * rng.uniform(0.3, 1.0)
            audio[t: t + dur] += seg
            activity[t: t + dur] = np.maximum(
                activity[t: t + dur], (env > 0.15).astype(np.float32))
            t += dur + int(rng.uniform(0.0, 0.05) * sr)
        t += int(rng.uniform(0.15, 0.9) * sr)
    return audio, activity


def synth_negative_aug(rng: np.random.Generator, seconds: float,
                       sr: int = SR) -> np.ndarray:
    """Training-AUGMENTATION negatives: impulsive-resonant and shot-noise
    families the original corpus lacked (see ``synth_speech_aug``) —
    struck bells (inharmonic decaying partials), crackle (sparse shots),
    sea waves (slow-AM lowpass noise), dual-tone signalling, and fast AM
    (20-80 Hz) harmonic buzz. Recipes differ from the holdout evaluator's
    (Karplus-Strong, rain, applause, machinery, wind, traffic)."""
    n = int(seconds * sr)
    kind = int(rng.integers(0, 5))
    tt = np.arange(n) / sr
    if kind == 0:     # struck bells: inharmonic partials, exp decay
        y = np.zeros(n, np.float32)
        for _ in range(int(rng.integers(1, 5))):
            p = int(rng.integers(0, max(n - sr // 2, 1)))
            dur = min(int(rng.uniform(0.3, 1.5) * sr), n - p)
            base = rng.uniform(200, 1200)
            sub = np.zeros(dur, np.float32)
            for ratio in (1.0, 2.32, 3.76, 5.4):
                sub += (rng.uniform(0.2, 1.0)
                        * np.sin(2 * np.pi * base * ratio
                                 * np.arange(dur) / sr)
                        ).astype(np.float32)
            y[p: p + dur] += sub * np.exp(
                -np.arange(dur) / (rng.uniform(0.1, 0.5) * sr))
        return (0.4 * y / (np.abs(y).max() + 1e-9)).astype(np.float32)
    if kind == 1:     # crackle: sparse shot noise
        y = np.zeros(n, np.float32)
        for p in rng.integers(0, max(n - 48, 1),
                              int(seconds * rng.uniform(20, 200))):
            y[p: p + 48] += (rng.uniform(0.1, 0.6)
                             * np.exp(-np.arange(48) / 10.0)
                             * rng.standard_normal(48))
        return y.astype(np.float32)
    if kind == 2:     # sea waves: very slow AM over lowpass noise
        from scipy.signal import lfilter

        w = rng.standard_normal(n).astype(np.float32)
        y = lfilter([0.08], [1.0, -0.92], w).astype(np.float32)
        am = 0.3 + 0.7 * (0.5 - 0.5 * np.cos(
            2 * np.pi * rng.uniform(0.05, 0.3) * tt + rng.uniform(0, 6.28)))
        y = y * am.astype(np.float32)
        return (rng.uniform(0.2, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 3:     # dual-tone signalling bursts
        y = np.zeros(n, np.float32)
        pos = 0
        while pos < n:
            dur = min(int(rng.uniform(0.1, 0.4) * sr), n - pos)
            f1, f2 = rng.uniform(600, 1000), rng.uniform(1200, 1700)
            y[pos: pos + dur] = (
                np.sin(2 * np.pi * f1 * np.arange(dur) / sr)
                + np.sin(2 * np.pi * f2 * np.arange(dur) / sr)
            ).astype(np.float32)
            pos += dur + int(rng.uniform(0.05, 0.5) * sr)
        return (rng.uniform(0.1, 0.4) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    # kind == 4: fast-AM harmonic buzz (too fast for syllabic rates)
    base = rng.uniform(60, 200)
    y = sum(rng.uniform(0.3, 1.0)
            * np.sin(2 * np.pi * base * k * tt + rng.uniform(0, 6.28))
            for k in range(1, 6))
    am = 1.0 + rng.uniform(0.3, 0.8) * np.sin(
        2 * np.pi * rng.uniform(20, 80) * tt)
    y = np.asarray(y * am, np.float32)
    return (rng.uniform(0.1, 0.4) * y / (np.abs(y).max() + 1e-9)
            ).astype(np.float32)


def synth_speech_aug2(rng: np.random.Generator, seconds: float,
                      sr: int = SR) -> Tuple[np.ndarray, np.ndarray]:
    """Round-5 training speech family: formant MOTION + source prosody.

    The round-4 recall loss on the out-of-family holdout traced to the
    trainer's positives having per-syllable FIXED formants (or a single
    linear ramp) and flat f0: real (and holdout) speech has continuous
    multi-target formant trajectories, f0 declination + vibrato, and
    word-onset plosive structure. This family adds those DIMENSIONS with
    recipes distinct from the holdout evaluator (random in-band formant
    targets instead of a vowel table; rectangular/triangular pulse mix
    instead of a Rosenberg pulse; trapezoid word envelopes instead of
    per-word raised cosine).
    """
    n = int(seconds * sr)
    audio = np.zeros(n, np.float32)
    activity = np.zeros(n, np.float32)
    f0_base = rng.uniform(75, 380)           # speaker register
    t = int(rng.uniform(0.0, 0.25) * sr)
    while t < n:
        dur = int(rng.uniform(0.25, 0.8) * sr)
        dur = min(dur, n - t)
        if dur <= int(0.06 * sr):
            break
        tt = np.arange(dur)
        whisper = rng.random() < 0.25
        if whisper:
            src = (0.5 * rng.standard_normal(dur)).astype(np.float32)
        else:
            # f0: declination + vibrato + jitter random walk.
            f0 = (f0_base * (1 - rng.uniform(0.03, 0.18) * tt / sr)
                  * (1 + 0.05 * np.sin(2 * np.pi * rng.uniform(3, 7)
                                       * tt / sr))
                  + np.cumsum(rng.normal(0, 0.4, dur)))
            f0 = np.clip(f0, 50, 450)
            phase = np.cumsum(f0 / sr)
            frac = np.mod(phase, 1.0)
            if rng.random() < 0.5:            # rectangular pulses
                src = (frac < rng.uniform(0.05, 0.3)).astype(np.float32)
            else:                             # triangular ramp source
                src = (1.0 - frac).astype(np.float32) ** 2
            # Shimmer: blockwise (10 ms) amplitude wobble.
            blk_s = int(0.01 * sr)
            n_blk = dur // blk_s + 1
            sh = 1 + 0.2 * rng.standard_normal(n_blk)
            src = src * np.repeat(sh, blk_s)[:dur].astype(np.float32)
            src += 0.02 * rng.standard_normal(dur).astype(np.float32)
        # Continuous multi-target formant trajectories (3-6 targets),
        # realized blockwise (16 ms resonators along the trajectory).
        n_targets = int(rng.integers(3, 7))
        knots = np.linspace(0, dur - 1, n_targets)
        seg = np.zeros(dur, np.float32)
        blk = int(0.016 * sr)
        trajs = []
        for lo, hi, bw in ((250, 900, 90), (850, 2500, 130),
                           (2300, 3500, 180)):
            targets = rng.uniform(lo, hi, n_targets)
            trajs.append((np.interp(tt, knots, targets), bw))
        for b0 in range(0, dur, blk):
            b1 = min(b0 + blk, dur)
            sub = src[b0:b1]
            for k, (traj, bw) in enumerate(trajs):
                seg[b0:b1] += _resonator(
                    sub, float(np.mean(traj[b0:b1])),
                    rng.uniform(bw * 0.7, bw * 1.4), sr) * (0.85 ** k)
        # Trapezoid word envelope; optional plosive closure + burst.
        env = np.ones(dur, np.float32)
        edge = max(int(rng.uniform(0.015, 0.03) * sr), 1)
        ramp = np.linspace(0, 1, edge, dtype=np.float32)
        env[:edge] *= ramp
        env[-edge:] *= ramp[::-1]
        if rng.random() < 0.35 and dur > int(0.08 * sr):
            closure = int(rng.uniform(0.02, 0.05) * sr)
            env[:closure] = 0.0
            bl = min(int(0.01 * sr), dur - closure)
            seg[closure: closure + bl] += (
                0.5 * np.diff(rng.standard_normal(bl + 1)).astype(np.float32)
                * np.exp(-np.arange(bl) / (0.004 * sr)))
        seg = seg * env
        seg = seg / (np.abs(seg).max() + 1e-9) * rng.uniform(0.25, 1.0)
        audio[t: t + dur] += seg
        activity[t: t + dur] = np.maximum(
            activity[t: t + dur], (env > 0.1).astype(np.float32))
        t += dur + int(rng.uniform(0.08, 0.7) * sr)
    return audio, activity


def synth_negative_aug2(rng: np.random.Generator, seconds: float,
                        sr: int = SR) -> np.ndarray:
    """Round-5 training negatives: the PRECISION killers (VERDICT r4 #6
    — out-of-family false accepts are the failing axis).

    - speech-shaped modulated noise: broadband noise through 2-3 FIXED
      speech-range resonators with a continuous 2-8 Hz sinusoidal AM —
      speech-band energy at syllabic rates, but no formant MOTION, no
      word-level silences, no onset structure (the cues that separate
      it from whispered-speech positives);
    - filtered-noise bursts at syllabic rates (fan/vent flutter);
    - reverberant tonal drones (smeared harmonic stacks);
    - plucked/struck harmonic notes at musical note rates (exp-decay
      HARMONIC stacks — the word-duration-scale decaying-envelope
      confuser; synthesis is additive, unlike string-model feedback
      delays, and harmonic, unlike the bell family's inharmonics).
    """
    n = int(seconds * sr)
    kind = int(rng.integers(0, 4))
    tt = np.arange(n) / sr
    if kind == 3:     # plucked harmonic notes
        y = np.zeros(n, np.float32)
        pos = int(rng.uniform(0, 0.2) * sr)
        while pos < n:
            dur = min(int(rng.uniform(0.15, 0.9) * sr), n - pos)
            f = rng.uniform(80, 900) * 2 ** (rng.integers(0, 13) / 12.0)
            k_t = np.arange(dur) / sr
            note = np.zeros(dur, np.float32)
            for h in range(1, 7):
                # Higher harmonics decay faster, like real plucks.
                note += (rng.uniform(0.3, 1.0) / h
                         * np.sin(2 * np.pi * f * h * k_t
                                  + rng.uniform(0, 6.28))
                         * np.exp(-k_t * (2.0 + 1.5 * h)
                                  / rng.uniform(0.2, 0.6))
                         ).astype(np.float32)
            atk = min(max(int(0.003 * sr), 1), dur)
            note[:atk] *= np.linspace(0, 1, atk, dtype=np.float32)
            y[pos: pos + dur] += note
            pos += int(rng.uniform(0.1, 0.6) * sr)
        return (rng.uniform(0.15, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 0:     # speech-shaped modulated noise
        src = rng.standard_normal(n).astype(np.float32)
        y = np.zeros(n, np.float32)
        for _ in range(int(rng.integers(2, 4))):
            y += _resonator(src, rng.uniform(300, 2800),
                            rng.uniform(100, 400), sr)
        am = 1.0 + rng.uniform(0.4, 0.95) * np.sin(
            2 * np.pi * rng.uniform(2.0, 8.0) * tt + rng.uniform(0, 6.28))
        y = y * am.astype(np.float32)
        return (rng.uniform(0.15, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 1:     # syllabic-rate filtered-noise flutter
        src = rng.standard_normal(n).astype(np.float32)
        y = _resonator(src, rng.uniform(400, 1500),
                       rng.uniform(200, 600), sr)
        rate = rng.uniform(3.0, 9.0)
        duty = rng.uniform(0.5, 0.9)
        gate = (np.mod(tt * rate, 1.0) < duty).astype(np.float32)
        # Soft edges so it isn't a click train.
        k = max(int(0.01 * sr), 1)
        gate = np.convolve(gate, np.ones(k, np.float32) / k, mode="same")
        y = y * (0.25 + 0.75 * gate)
        return (rng.uniform(0.15, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    # kind == 2: reverberant harmonic drone
    base = rng.uniform(100, 500)
    y = sum(rng.uniform(0.2, 1.0)
            * np.sin(2 * np.pi * base * k * tt + rng.uniform(0, 6.28))
            for k in range(1, 6))
    y = np.asarray(y, np.float32)
    y = _apply_reverb(rng, y, sr)
    return (rng.uniform(0.1, 0.4) * y / (np.abs(y).max() + 1e-9)
            ).astype(np.float32)


def synth_speech_aug3(rng: np.random.Generator, seconds: float,
                      sr: int = SR) -> Tuple[np.ndarray, np.ndarray]:
    """Round-5b training positives: SMOOTH glottal source + low-f0 bias.

    The round-5a failure table (tools/vad_score.py --families on the
    out-of-family holdout) put the recall loss almost entirely on VOICED
    speech (male 0.80 / female 0.84 vs whispered 0.96-0.99): every voiced
    source in the trainer was spectrally flat-ish (rectangular 10 %-duty
    pulses, sawtooth, triangle) while natural voicing — and the holdout's
    Rosenberg pulses — roll off ~-12 dB/oct. This family voices with a
    raised-cosine FLOW pulse differentiated per period (smooth flow
    derivative; not the holdout's piecewise rising/falling Rosenberg
    shape), samples the speaker register log-uniformly so low-f0 male
    voices are as common as high, and mixes in per-period aspiration.
    Formant motion reuses the aug2 trajectory machinery.
    """
    n = int(seconds * sr)
    audio = np.zeros(n, np.float32)
    activity = np.zeros(n, np.float32)
    f0_base = float(np.exp(rng.uniform(np.log(70.0), np.log(320.0))))
    t = int(rng.uniform(0.0, 0.25) * sr)
    while t < n:
        dur = int(rng.uniform(0.2, 0.8) * sr)
        dur = min(dur, n - t)
        if dur <= int(0.06 * sr):
            break
        tt = np.arange(dur)
        # f0: declination + jitter walk, clipped to the register.
        f0 = (f0_base * (1 - rng.uniform(0.02, 0.15) * tt / sr)
              + np.cumsum(rng.normal(0, 0.35, dur)))
        f0 = np.clip(f0, 55, 420)
        phase = np.cumsum(f0 / sr)
        frac = np.mod(phase, 1.0)
        # Raised-cosine glottal FLOW over the open phase, differentiated:
        # smooth closure -> steep spectral rolloff like real voicing.
        open_q = rng.uniform(0.4, 0.7)
        flow = np.where(frac < open_q,
                        0.5 - 0.5 * np.cos(2 * np.pi * frac / open_q),
                        0.0).astype(np.float32)
        src = np.diff(flow, prepend=0.0).astype(np.float32)
        # Per-period shimmer + aspiration mixed at a random breathiness.
        period_id = np.floor(phase).astype(np.int64)
        shim = (1.0 + 0.18 * rng.standard_normal(int(period_id.max()) + 2)
                ).astype(np.float32)
        src = src * shim[period_id]
        src += (rng.uniform(0.005, 0.08)
                * rng.standard_normal(dur).astype(np.float32))
        # Continuous formant trajectories (blockwise resonators).
        n_targets = int(rng.integers(2, 6))
        knots = np.linspace(0, dur - 1, max(n_targets, 2))
        seg = np.zeros(dur, np.float32)
        blk = int(0.016 * sr)
        trajs = []
        for lo, hi, bw in ((250, 900, 90), (850, 2500, 130),
                           (2300, 3500, 180)):
            targets = rng.uniform(lo, hi, max(n_targets, 2))
            trajs.append((np.interp(tt, knots, targets), bw))
        for b0 in range(0, dur, blk):
            b1 = min(b0 + blk, dur)
            sub = src[b0:b1]
            for k, (traj, bw) in enumerate(trajs):
                seg[b0:b1] += _resonator(
                    sub, float(np.mean(traj[b0:b1])),
                    rng.uniform(bw * 0.7, bw * 1.4), sr) * (0.85 ** k)
        env = np.ones(dur, np.float32)
        edge = max(int(rng.uniform(0.015, 0.035) * sr), 1)
        ramp = np.linspace(0, 1, edge, dtype=np.float32)
        env[:edge] *= ramp
        env[-edge:] *= ramp[::-1]
        seg = seg * env
        seg = seg / (np.abs(seg).max() + 1e-9) * rng.uniform(0.25, 1.0)
        audio[t: t + dur] += seg
        activity[t: t + dur] = np.maximum(
            activity[t: t + dur], (env > 0.1).astype(np.float32))
        t += dur + int(rng.uniform(0.08, 0.7) * sr)
    return audio, activity


def synth_negative_aug3(rng: np.random.Generator, seconds: float,
                        sr: int = SR) -> np.ndarray:
    """Round-5b training negatives: the three surviving false-accept
    families from the round-5a holdout table (KS plucks 67 % FA, aliased
    machinery 30 %, speech-shaped noise 23 % — all else < 3 %).

    - noisy-attack pitched plucks: a band-passed noise burst crossfading
      into an INHARMONIC additive decay (stiff-string partials
      f_k = f k sqrt(1 + B k^2)) — the plosive-onset-into-voiced-sustain
      pattern that makes plucked strings read as speech. Additive
      synthesis, unlike the holdout's feedback-delay Karplus-Strong.
    - aliased harmonic stacks: sample-hold decimation + bit-crush ON a
      pitched stack (the channel augment applies these to noise/speech,
      almost never to sustained harmonics).
    - walking-resonator speech-shaped noise: formant-range resonators
      whose centers RANDOM-WALK over noise with slow rectified-noise AM
      (aug2's version had FIXED resonators and sinusoidal AM).
    - detuned string-section drone: several detuned harmonic tones with
      slow random vibrato — sustained pitched content with motion but no
      syllabic envelope.
    """
    n = int(seconds * sr)
    kind = int(rng.integers(0, 4))
    tt = np.arange(n) / sr
    if kind == 0:     # noisy-attack inharmonic plucks
        y = np.zeros(n, np.float32)
        pos = int(rng.uniform(0, 0.2) * sr)
        while pos < n:
            dur = min(int(rng.uniform(0.2, 0.8) * sr), n - pos)
            f = rng.uniform(80, 700)
            B = rng.uniform(1e-5, 2e-3)          # inharmonicity
            k_t = np.arange(dur) / sr
            note = np.zeros(dur, np.float32)
            for h in range(1, 8):
                fk = f * h * np.sqrt(1 + B * h * h)
                if fk > sr / 2 - 200:
                    break
                note += (rng.uniform(0.3, 1.0) / h
                         * np.sin(2 * np.pi * fk * k_t
                                  + rng.uniform(0, 6.28))
                         * np.exp(-k_t * (1.5 + 1.2 * h)
                                  / rng.uniform(0.15, 0.5))
                         ).astype(np.float32)
            # Noisy attack: band-passed burst crossfaded over 5-30 ms.
            atk = min(int(rng.uniform(0.005, 0.03) * sr), dur)
            burst = _resonator(
                rng.standard_normal(atk).astype(np.float32),
                float(np.clip(f * rng.uniform(1, 6), 100, 6000)),
                rng.uniform(300, 1200), sr)
            fade = np.linspace(1, 0, atk, dtype=np.float32) ** 2
            note[:atk] = note[:atk] * (1 - fade) + burst * fade * \
                rng.uniform(0.5, 1.5)
            y[pos: pos + dur] += note
            pos += int(rng.uniform(0.12, 0.7) * sr)
        return (rng.uniform(0.15, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    if kind == 1:     # aliased harmonic stack
        base = rng.uniform(100, 800)
        y = np.asarray(sum(
            rng.uniform(0.2, 1.0)
            * np.sin(2 * np.pi * base * k * tt + rng.uniform(0, 6.28))
            for k in range(1, 7)), np.float32)
        if rng.random() < 0.5:                   # optional slow AM
            y *= (1.0 + rng.uniform(0.2, 0.6) * np.sin(
                2 * np.pi * rng.uniform(0.3, 4.0) * tt
                + rng.uniform(0, 6.28))).astype(np.float32)
        hold = int(rng.integers(2, 9))
        y = np.repeat(y[::hold], hold)[:n]
        if len(y) < n:
            y = np.pad(y, (0, n - len(y)))
        bits = int(rng.integers(3, 7))
        q = 2.0 ** (bits - 1)
        y = np.round(y / (np.abs(y).max() + 1e-9) * q) / q
        return (rng.uniform(0.1, 0.4) * y).astype(np.float32)
    if kind == 2:     # walking-resonator speech-shaped noise
        from scipy.signal import lfilter

        src = lfilter([rng.uniform(0.1, 0.5)], [1.0, -rng.uniform(0.5, 0.9)],
                      rng.standard_normal(n)).astype(np.float32)
        y = np.zeros(n, np.float32)
        blk = int(rng.uniform(0.02, 0.05) * sr)
        n_res = int(rng.integers(2, 5))
        centers = np.asarray([rng.uniform(250, 3200) for _ in range(n_res)])
        for b0 in range(0, n, blk):
            b1 = min(b0 + blk, n)
            centers = np.clip(
                centers * (1 + rng.normal(0, rng.uniform(0.02, 0.08), n_res)),
                250, 3500)
            for c in centers:
                y[b0:b1] += _resonator(src[b0:b1], float(c),
                                       rng.uniform(120, 250), sr)
        am_src = lfilter([0.01], [1.0, -0.999],
                         rng.standard_normal(n)).astype(np.float32)
        am = np.abs(am_src)
        am = am / (am.max() + 1e-9)
        y = y * (0.1 + 0.9 * am).astype(np.float32)
        return (rng.uniform(0.15, 0.5) * y / (np.abs(y).max() + 1e-9)
                ).astype(np.float32)
    # kind == 3: detuned string-section drone with slow random vibrato
    y = np.zeros(n, np.float32)
    base = rng.uniform(90, 500)
    for _ in range(int(rng.integers(2, 5))):
        f = base * rng.uniform(0.99, 1.01)
        vib = 1 + 0.01 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * tt
                                + rng.uniform(0, 6.28))
        ph = 2 * np.pi * np.cumsum(f * vib) / sr
        for h in range(1, 5):
            y += (rng.uniform(0.2, 1.0) / h
                  * np.sin(h * ph + rng.uniform(0, 6.28))).astype(np.float32)
    return (rng.uniform(0.1, 0.4) * y / (np.abs(y).max() + 1e-9)
            ).astype(np.float32)


def _apply_reverb(rng: np.random.Generator, x: np.ndarray,
                  sr: int = SR) -> np.ndarray:
    """Synthetic RIR: exponentially-decaying noise tail (RT60 0.1-0.5 s)
    over a direct-path impulse. FFT convolution, same length out."""
    rt60 = rng.uniform(0.1, 0.5)
    n_rir = int(rt60 * sr)
    tail = (rng.standard_normal(n_rir).astype(np.float32)
            * np.exp(-6.9 * np.arange(n_rir) / n_rir).astype(np.float32))
    rir = np.concatenate([np.ones(1, np.float32),
                          rng.uniform(0.05, 0.3) * tail])
    m = len(x) + len(rir) - 1
    nfft = 1 << (m - 1).bit_length()
    y = np.fft.irfft(np.fft.rfft(x, nfft) * np.fft.rfft(rir, nfft),
                     nfft)[: len(x)]
    return (y / (np.abs(y).max() + 1e-9) * (np.abs(x).max() + 1e-9)
            ).astype(np.float32)


def _channel_augment(rng: np.random.Generator, audio: np.ndarray,
                     act: np.ndarray, sr: int = SR
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Label-aware channel effects (round 5): reverb, clipping, mu-law
    codec, spectral tilt. Applied AFTER mixing, so the model learns
    channel invariance instead of memorizing clean generator spectra.
    Reverb smears speech energy past word ends, so the activity mask is
    re-derived from the processed signal's envelope inside originally-
    active regions (tails become ambiguous and fall to the 20-80 %
    boundary mask, never hard negatives)."""
    did_reverb = False
    if rng.random() < 0.25:
        audio = _apply_reverb(rng, audio, sr)
        did_reverb = True
    if rng.random() < 0.15:       # hard clipping
        c = rng.uniform(0.3, 0.8) * (np.abs(audio).max() + 1e-9)
        audio = np.clip(audio, -c, c)
    if rng.random() < 0.15:       # 8-bit mu-law codec round trip
        mu = 255.0
        peak = np.abs(audio).max() + 1e-9
        x = np.clip(audio / peak, -1, 1)
        comp = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        q = np.round(comp * 127.0) / 127.0
        audio = (np.sign(q) * ((1 + mu) ** np.abs(q) - 1) / mu
                 * peak).astype(np.float32)
    if rng.random() < 0.15:       # sample-hold decimation (alias images)
        hold = int(rng.integers(2, 8))
        audio = np.repeat(audio[::hold], hold)[: len(audio)]
        if len(audio) < len(act):
            audio = np.pad(audio, (0, len(act) - len(audio)))
    if rng.random() < 0.1:        # uniform bit-crush
        bits = int(rng.integers(4, 8))
        peak = np.abs(audio).max() + 1e-9
        q = 2.0 ** (bits - 1)
        audio = (np.round(audio / peak * q) / q * peak).astype(np.float32)
    if rng.random() < 0.2:        # first-order spectral tilt
        from scipy.signal import lfilter

        a = rng.uniform(-0.6, 0.6)
        audio = lfilter([1.0, a], [1.0], audio).astype(np.float32)
    if did_reverb and act.any():
        # Extend activity through the reverberant tail (~RT30) so smeared
        # speech energy is never labeled hard-negative.
        k = int(0.12 * sr)
        ext = np.convolve(act, np.ones(k, np.float32), mode="full")[:len(act)]
        act = np.maximum(act, 0.5 * (ext > 0).astype(np.float32))
    return audio, act


def make_clip(rng: np.random.Generator, seconds: float = 4.0,
              sr: int = SR) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One training/eval clip.

    Returns (audio, labels, mask) at 512-sample-window granularity:
    ``labels[w]`` is 1 if the window is mostly speech, ``mask[w]`` is 0 for
    ambiguous boundary windows (20-80 % active) excluded from loss/eval.

    Clips draw from the original generator family, the round-4
    augmentation family (``synth_speech_aug``/``synth_negative_aug``),
    the round-5a families (``synth_speech_aug2`` formant-motion
    positives, ``synth_negative_aug2`` precision negatives) and the
    round-5b families targeted at the measured holdout failures
    (``synth_speech_aug3`` smooth-glottal voiced, ``synth_negative_aug3``
    pitched plucks / aliased stacks), with channel augmentations
    (reverb/clip/codec/decimation/tilt) on top — the transfer recipe
    measured by ``tools/vad_holdout_probe.py``.
    """
    speech_present = rng.random() < 0.6
    rn = rng.random()
    # Round-5b mix: aug3 carries the measured false-accept families
    # (pitched plucks / aliased stacks / walking-resonator noise).
    noise_gen = (synth_negative_aug3 if rn < 0.35
                 else synth_negative_aug2 if rn < 0.55
                 else synth_negative_aug if rn < 0.775
                 else synth_negative)
    noise = noise_gen(rng, seconds, sr)
    if speech_present:
        r5s = rng.random()
        speech_gen = (synth_speech_aug3 if r5s < 0.35
                      else synth_speech_aug2 if r5s < 0.6
                      else synth_speech_aug if r5s < 0.8
                      else synth_speech)
        speech, act = speech_gen(rng, seconds, sr)
        # 30 % of mixes pinned low-SNR: the holdout recall loss grows
        # monotonically below 10 dB (0.91 @ 20 -> 0.815 @ 0).
        snr_db = (rng.uniform(-2.0, 8.0) if rng.random() < 0.3
                  else rng.uniform(-2.0, 30.0))
        p_s = float(np.mean(speech ** 2)) + 1e-12
        p_n = float(np.mean(noise ** 2)) + 1e-12
        noise = noise * np.sqrt(p_s / (p_n * 10 ** (snr_db / 10)))
        audio = speech + noise
    else:
        audio, act = noise, np.zeros(len(noise), np.float32)
    audio, act = _channel_augment(rng, audio, act, sr)
    n_win = len(audio) // WINDOW
    # Reverb-extended half-weight activity (0.5) lands in the ambiguous
    # band by construction; hard labels need > 0.5 mean activity.
    frac = act[: n_win * WINDOW].reshape(n_win, WINDOW).mean(axis=1)
    labels = (frac > 0.5).astype(np.float32)
    mask = ((frac < 0.2) | (frac > 0.8)).astype(np.float32)
    peak = np.abs(audio).max()
    if peak > 1.0:
        audio = audio / peak
    return audio[: n_win * WINDOW].astype(np.float32), labels, mask


def corpus(seed: int, n_clips: int, seconds: float = 4.0,
           sr: int = SR) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    for _ in range(n_clips):
        yield make_clip(rng, seconds, sr)
