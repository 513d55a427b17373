"""Device mesh and sharding rules (dp x tp).

The reference has no distributed runtime at all (SURVEY 2.6: no
torch.distributed, no process groups); scaling here is expressed the TPU
way — a ``jax.sharding.Mesh`` with named axes and ``NamedSharding``
annotations on the param/batch pytrees, letting XLA GSPMD insert the ICI
collectives:

- ``dp``: batch data parallelism (the natural inference axis — the
  multi-stream server batch and the eval harness batch shard here).
- ``tp``: tensor parallelism over attention heads / MLP hidden dim for
  the Whisper matmuls — useful for large-batch serving and fine-tuning.

Weights are stored (in, out), layer-stacked with a leading L axis, so TP
specs are simply P(None, None, "tp") / P(None, "tp", None) per leaf.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices.

    Default split: tp=2 when the device count is even (attention heads of
    every Whisper size divide by 2), else tp=1.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if tp is None:
        # dp given alone is a pure-DP request: derive tp from it instead
        # of defaulting tp=2 (which rejected valid dp=n factorizations).
        tp = (n // dp if dp else
              2 if n % 2 == 0 and n >= 2 else 1)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({n})")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _attn_specs(prefix_dims: int) -> Dict[str, P]:
    """TP specs for an attention param group; leading dims unsharded."""
    n = (None,) * prefix_dims
    return {
        "q_w": P(*n, None, "tp"), "q_b": P(*n, "tp"),
        "k_w": P(*n, None, "tp"),
        "v_w": P(*n, None, "tp"), "v_b": P(*n, "tp"),
        "o_w": P(*n, "tp", None), "o_b": P(*n, None),
    }


def _mlp_specs(prefix_dims: int) -> Dict[str, P]:
    n = (None,) * prefix_dims
    return {
        "fc1_w": P(*n, None, "tp"), "fc1_b": P(*n, "tp"),
        "fc2_w": P(*n, "tp", None), "fc2_b": P(*n, None),
    }


def _ln_specs(prefix_dims: int) -> Dict[str, P]:
    n = (None,) * prefix_dims
    return {"scale": P(*n, None), "bias": P(*n, None)}


def param_pspecs() -> Dict[str, Any]:
    """PartitionSpec pytree matching ``models.whisper`` param layout."""
    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos_emb": P(),
            "layers": {
                "attn": _attn_specs(1),
                "ln1": _ln_specs(1), "ln2": _ln_specs(1),
                "mlp": _mlp_specs(1),
            },
            "ln_post": _ln_specs(0),
        },
        "decoder": {
            "token_emb": P(),
            "pos_emb": P(),
            "layers": {
                "self": _attn_specs(1),
                "cross": _attn_specs(1),
                "ln1": _ln_specs(1), "ln_cross": _ln_specs(1),
                "ln2": _ln_specs(1),
                "mlp": _mlp_specs(1),
            },
            "ln_post": _ln_specs(0),
        },
    }


def param_shardings(mesh: Mesh) -> Dict[str, Any]:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(),
        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel sharding for (B, T, d) encoder activations.

    Batch over ``dp``, **time over ``tp``**: LN / MLP / q-k-v-o projections
    run fully sharded along the sequence, and GSPMD inserts an all-gather
    of K/V per attention (blockwise-attention style — each shard's queries
    attend over the gathered full sequence). Use for long-audio encoder
    batches where a single chip's HBM cannot hold the (B, T, d)
    activations; pass to ``models.whisper.encoder_forward(act_sharding=…)``.
    The reference has no sequence parallelism (SURVEY §2.6) — long audio is
    time-domain chunked; this exists for the multi-chip serving path.
    """
    return NamedSharding(mesh, P("dp", "tp", None))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param pytree onto the mesh with TP shardings."""
    shardings = param_shardings(mesh)
    return jax.tree.map(jax.device_put, params, shardings)
