"""Draft distillation: train a small decoder to imitate the target's.

Completes the speculative-decoding story (engine/speculative.py): a
layer-skip draft is free but unadapted; distilling it against the target
decoder's logits raises draft/target greedy agreement — the acceptance
rate that decides the speculative speedup. This mirrors how
distil-whisper drafts are made (frozen shared encoder, shallow decoder
trained on the teacher's distribution), done TPU-natively with the same
sharded-step machinery as ``training.train``.

The teacher is frozen (``stop_gradient``); the student is a decoder-only
pytree (``{"decoder": ...}``, e.g. from
``engine.make_layer_skip_draft``). Both consume the SAME encoder states —
exactly the deployment condition in ``WhisperEngine``, where the draft's
cross-KV comes from the target's encoder output.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from thewhisper_tpu.config import WhisperArch
from thewhisper_tpu.models.whisper import decoder_train_forward, encoder_forward


class DistillState(NamedTuple):
    student: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def distill_loss_fn(
    student: Dict[str, Any],
    teacher: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],   # mel (B, n_mels, T), tokens (B, S)
    student_arch: WhisperArch,
    teacher_arch: WhisperArch,
    compute_dtype=jnp.float32,
    temperature: float = 2.0,
    remat: bool = False,
) -> jnp.ndarray:
    """Temperature-scaled KL(teacher || student) over teacher-forced
    positions, mean per token. ``batch["loss_mask"]`` (optional) zeroes
    padding positions.
    """
    enc = jax.lax.stop_gradient(encoder_forward(
        teacher, batch["mel"], teacher_arch, compute_dtype))
    tokens_in = batch["tokens"][:, :-1]
    t_logits = jax.lax.stop_gradient(decoder_train_forward(
        teacher, tokens_in, enc, teacher_arch, compute_dtype))
    s_logits = decoder_train_forward(
        student, tokens_in, enc, student_arch, compute_dtype, remat=remat)
    t_lp = jax.nn.log_softmax(t_logits / temperature, axis=-1)
    s_lp = jax.nn.log_softmax(s_logits / temperature, axis=-1)
    kl = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)    # (B, S-1)
    mask = batch.get("loss_mask")
    if mask is not None:
        m = mask[:, 1:]
        return (kl * m).sum() / jnp.maximum(m.sum(), 1.0) * temperature ** 2
    return kl.mean() * temperature ** 2


def greedy_agreement(
    student: Dict[str, Any],
    teacher: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    student_arch: WhisperArch,
    teacher_arch: WhisperArch,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fraction of teacher-forced positions where draft argmax == target
    argmax — the statistic the speculative acceptance rate tracks.

    ``batch["loss_mask"]`` (optional) restricts the mean to real
    transcript positions; without it, eot-padding runs would dominate
    (teacher and student trivially agree there) and inflate the number.
    """
    enc = encoder_forward(teacher, batch["mel"], teacher_arch, compute_dtype)
    tokens_in = batch["tokens"][:, :-1]
    t_logits = decoder_train_forward(
        teacher, tokens_in, enc, teacher_arch, compute_dtype)
    s_logits = decoder_train_forward(
        student, tokens_in, enc, student_arch, compute_dtype)
    agree = (jnp.argmax(t_logits, -1)
             == jnp.argmax(s_logits, -1)).astype(jnp.float32)
    mask = batch.get("loss_mask")
    if mask is not None:
        m = mask[:, 1:]
        return (agree * m).sum() / jnp.maximum(m.sum(), 1.0)
    return jnp.mean(agree)


def init_distill_state(student, learning_rate: float = 1e-4,
                       weight_decay: float = 0.0) -> Tuple[DistillState, Any]:
    # Materialize fresh buffers: a layer-skip student SHARES leaves
    # (embedding, norms) with the teacher, and the donated train-step
    # state must never alias the teacher argument (XLA rejects a buffer
    # that is both donated and read: `f(donate(a), a)`).
    from thewhisper_tpu.training.train import decay_mask

    student = jax.tree.map(jnp.array, student)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay,
                     mask=decay_mask)
    return DistillState(student, tx.init(student), jnp.int32(0)), tx


def make_distill_step(student_arch: WhisperArch, teacher_arch: WhisperArch,
                      tx, compute_dtype=jnp.float32, temperature: float = 2.0,
                      remat: bool = False, donate: bool = True):
    """One jitted step: ``(state, teacher, batch) -> (state, loss)``.

    The teacher rides as an argument (not a closure constant) so one
    compiled step serves checkpoint reloads without re-tracing.
    """

    def step(state: DistillState, teacher, batch):
        loss, grads = jax.value_and_grad(distill_loss_fn)(
            state.student, teacher, batch, student_arch, teacher_arch,
            compute_dtype, temperature, remat)
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_student = optax.apply_updates(state.student, updates)
        return DistillState(new_student, new_opt, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
