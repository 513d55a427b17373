"""Fine-tuning: teacher-forced cross-entropy + sharded optax train step.

The reference ships no training code (SURVEY section 2: "no training code"),
but its models ARE fine-tunes — the flexible-chunk 10/15/20/30 s checkpoints
were produced by fine-tuning Whisper on shorter windows (``README.md:251``).
This module provides that capability TPU-natively.

Sharding follows the placement-driven GSPMD pattern: ``params`` are
``device_put`` onto the (dp, tp) mesh via ``parallel.shard_params`` BEFORE
``optax`` init (``zeros_like`` moments inherit the shardings), the batch is
placed with ``P("dp", ...)``, and the plain-jitted step lets XLA propagate
shardings and insert the gradient psums over ICI — no hand-written
collectives anywhere.

Flexible-chunk fine-tuning recipe: load a checkpoint with
``position_mode="interpolate"`` at the target chunk length, then train on
windows of that length — the same initialization the NVIDIA reference path
uses for inference (``nvidia/asr_pipeline.py:15-27``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from thewhisper_tpu.config import WhisperArch
from thewhisper_tpu.models.whisper import decoder_train_forward, encoder_forward
from thewhisper_tpu.parallel.mesh import batch_sharding


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def cross_entropy_loss(
    logits: jnp.ndarray,        # (B, S, V) f32
    labels: jnp.ndarray,        # (B, S) int32
    mask: jnp.ndarray,          # (B, S) 0/1 — 0 on padding
) -> jnp.ndarray:
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def loss_fn(params, batch: Dict[str, jnp.ndarray], arch: WhisperArch,
            compute_dtype=jnp.float32, remat: bool = False) -> jnp.ndarray:
    """Batch: mel (B, n_mels, T), tokens (B, S), loss_mask (B, S).

    ``tokens`` holds the decoder input (prompt + transcript); the loss
    predicts ``tokens[:, 1:]`` from positions ``[:-1]`` under the mask
    (mask zeroes prompt and padding positions).

    ``remat=True`` rematerializes each transformer layer in the backward
    pass (``jax.checkpoint`` on the scanned layer bodies) — activation
    memory drops to the layer-boundary residual stream, the standard trade
    for fitting large-v3 (32+32 layers) fine-tunes on one 16 GB chip.
    """
    enc = encoder_forward(params, batch["mel"], arch, compute_dtype,
                          remat=remat)
    logits = decoder_train_forward(
        params, batch["tokens"][:, :-1], enc, arch, compute_dtype,
        remat=remat)
    return cross_entropy_loss(
        logits, batch["tokens"][:, 1:], batch["loss_mask"][:, 1:])


def decay_mask(params) -> Any:
    """Standard AdamW practice: decay matmul weights only — LayerNorm
    scales/biases and other 1-D params must not be pulled toward zero
    (doing so perturbs pretrained normalization statistics)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def init_train_state(params, learning_rate: float = 1e-5,
                     weight_decay: float = 0.01) -> Tuple[TrainState, Any]:
    """Build (state, tx). Shard ``params`` onto the mesh FIRST so the
    optimizer moments inherit the same shardings."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay,
                     mask=decay_mask)
    return TrainState(params, tx.init(params), jnp.int32(0)), tx


def make_train_step(arch: WhisperArch, tx, compute_dtype=jnp.float32,
                    donate: bool = True, remat: bool = False):
    """One jitted optimizer step: ``(state, batch) -> (state, loss)``."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, arch, compute_dtype, remat)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def place_batch(batch: Dict[str, jnp.ndarray], mesh) -> Dict[str, jnp.ndarray]:
    """Put a host batch onto the mesh, sharded over the dp axis."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, jnp.ndim(v)))
        for k, v in batch.items()
    }
