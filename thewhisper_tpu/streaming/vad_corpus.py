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


def make_clip(rng: np.random.Generator, seconds: float = 4.0,
              sr: int = SR) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One training/eval clip.

    Returns (audio, labels, mask) at 512-sample-window granularity:
    ``labels[w]`` is 1 if the window is mostly speech, ``mask[w]`` is 0 for
    ambiguous boundary windows (20-80 % active) excluded from loss/eval.

    Clips draw 50/50 from the original generator family and the round-4
    augmentation family (``synth_speech_aug``/``synth_negative_aug``) —
    the transfer fix measured by ``tools/vad_holdout_probe.py``.
    """
    speech_present = rng.random() < 0.6
    use_aug = rng.random() < 0.5
    noise = (synth_negative_aug if use_aug else synth_negative)(
        rng, seconds, sr)
    if speech_present:
        speech, act = (synth_speech_aug if use_aug else synth_speech)(
            rng, seconds, sr)
        snr_db = rng.uniform(-2.0, 30.0)
        p_s = float(np.mean(speech ** 2)) + 1e-12
        p_n = float(np.mean(noise ** 2)) + 1e-12
        noise = noise * np.sqrt(p_s / (p_n * 10 ** (snr_db / 10)))
        audio = speech + noise
    else:
        audio, act = noise, np.zeros(len(noise), np.float32)
    n_win = len(audio) // WINDOW
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
