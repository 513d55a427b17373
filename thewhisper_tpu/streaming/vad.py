"""Voice activity detection with the Silero-compatible interface.

The reference loads Silero VAD from torch.hub at runtime
(``streaming_pipeline.py:533-538``) and calls it statefully on exact
512-sample windows at 16 kHz (``:589-622``), resetting via
``reset_states()`` (``:987-988``). This build has no network egress, so the
default is a self-contained spectral-energy VAD with the same call
contract: ``vad(chunk_512, sample_rate) -> float prob``, ``reset_states()``.

If Silero weights are available locally (torch.hub cache or an explicit
TorchScript file), ``make_vad`` wraps them behind the same interface.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class EnergyVAD:
    """Adaptive-noise-floor spectral energy VAD on 512-sample windows.

    Tracks a slowly rising noise floor (fast decay on quiet frames) and maps
    the band-limited SNR of the 300-3400 Hz speech band through a soft
    threshold. Stateful across calls like Silero: consecutive windows share
    the noise estimate; ``reset_states`` clears it.
    """

    WINDOW = 512

    def __init__(self, sample_rate: int = 16000, sensitivity: float = 2.0):
        self.sample_rate = sample_rate
        self.sensitivity = sensitivity
        n_fft = self.WINDOW
        freqs = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate)
        self._band = ((freqs >= 300.0) & (freqs <= 3400.0)).astype(np.float32)
        self._window = np.hanning(n_fft).astype(np.float32)
        self.reset_states()

    def reset_states(self) -> None:
        self._noise_floor: Optional[float] = None
        self._smoothed_prob = 0.0

    def __call__(self, chunk: np.ndarray, sample_rate: Optional[int] = None) -> float:
        x = np.asarray(chunk, dtype=np.float32).reshape(-1)
        if len(x) < self.WINDOW:
            x = np.pad(x, (0, self.WINDOW - len(x)))
        spec = np.abs(np.fft.rfft(x[: self.WINDOW] * self._window)) ** 2
        band_energy = float(np.sum(spec * self._band)) / self._band.sum()

        if self._noise_floor is None:
            self._noise_floor = band_energy + 1e-10
        elif band_energy < self._noise_floor:
            # Track down fast: quiet frames define the floor.
            self._noise_floor = 0.8 * self._noise_floor + 0.2 * band_energy
        else:
            # Drift up very slowly so sustained speech can't become "noise".
            self._noise_floor = 1.005 * self._noise_floor

        snr = band_energy / (self._noise_floor + 1e-10)
        raw = 1.0 - float(np.exp(-max(0.0, np.log10(max(snr, 1e-6))) * self.sensitivity))
        # Light smoothing mirrors Silero's temporal context.
        self._smoothed_prob = 0.6 * raw + 0.4 * self._smoothed_prob
        return float(np.clip(self._smoothed_prob, 0.0, 1.0))

    def item(self) -> float:  # pragma: no cover - API-shape compatibility
        return self._smoothed_prob


class _SileroWrapper:
    """Silero TorchScript model behind the EnergyVAD interface."""

    def __init__(self, model):
        import torch

        self._torch = torch
        self.model = model

    def reset_states(self) -> None:
        self.model.reset_states()

    def __call__(self, chunk: np.ndarray, sample_rate: int = 16000) -> float:
        t = self._torch.from_numpy(np.asarray(chunk, dtype=np.float32))
        return float(self.model(t, sample_rate).item())


def make_vad(kind: str = "auto", sample_rate: int = 16000):
    """Build a VAD: "energy" (default), "silero" (local weights), "auto"."""
    if kind in ("silero", "auto"):
        path = os.environ.get("SILERO_VAD_JIT", "")
        if path and os.path.exists(path):
            import torch

            return _SileroWrapper(torch.jit.load(path))
        if kind == "silero":
            raise FileNotFoundError(
                "Silero VAD requested but SILERO_VAD_JIT not set/found")
    return EnergyVAD(sample_rate=sample_rate)
