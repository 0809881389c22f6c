"""Device mesh + sharding rules (the framework's scaling layer).

The reference has NO model parallelism (SURVEY.md §2.3): its only scaling
lever is intra-request batching plus one remote GPU per job.  The TPU-native
equivalents built here:

- **data parallel** over VAD chunks: batch axis sharded over the ``data``
  mesh axis — the idiomatic replacement for ``batch_size`` and the path to
  the >=30x RT north star (segments are independent; ICI carries no
  activations, only the replicated-weight all-reduces XLA inserts).
- **tensor parallel** (``model`` axis): Megatron-style column/row sharding
  of attention and MLP weights for large-v3 at high batch, expressed as
  PartitionSpecs — XLA's SPMD partitioner inserts the ICI collectives.

Everything is annotation-driven (jax.sharding + NamedSharding); there is no
hand-written communication. See also training/train.py (dp+tp train step)
and __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """(data, model) mesh over the available devices.

    ``model_parallel`` splits heads/MLP across chips (use 1 unless HBM is
    tight — large-v3 bf16 weights are ~3 GB, SURVEY.md §2.3); remaining
    devices form the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_sharding_rules(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for Whisper params (Megatron-style TP).

    Per transformer block (leading axis = stacked layers, never sharded):
    - attention q/k/v: column-parallel (output dim over MODEL_AXIS)
    - attention o: row-parallel (input dim over MODEL_AXIS)
    - MLP fc1: column-parallel; fc2: row-parallel
    - embeddings/norms/conv: replicated (small)
    XLA inserts the all-reduces after o_w/fc2_w contractions.
    """
    def attn_spec():
        return {
            "q_w": P(None, None, MODEL_AXIS), "q_b": P(None, MODEL_AXIS),
            "k_w": P(None, None, MODEL_AXIS),
            "v_w": P(None, None, MODEL_AXIS), "v_b": P(None, MODEL_AXIS),
            "o_w": P(None, MODEL_AXIS, None), "o_b": P(None),
        }

    def block_spec(cross: bool):
        spec = {
            "ln1": {"g": P(None), "b": P(None)},
            "attn": attn_spec(),
            "ln2": {"g": P(None), "b": P(None)},
            "mlp": {
                "fc1_w": P(None, None, MODEL_AXIS),
                "fc1_b": P(None, MODEL_AXIS),
                "fc2_w": P(None, MODEL_AXIS, None),
                "fc2_b": P(None),
            },
        }
        if cross:
            spec["lnx"] = {"g": P(None), "b": P(None)}
            spec["xattn"] = attn_spec()
        return spec

    return {
        "encoder": {
            "pos": P(None),
            "conv1_w": P(None), "conv1_b": P(None),
            "conv2_w": P(None), "conv2_b": P(None),
            "blocks": block_spec(cross=False),
            "ln_post": {"g": P(None), "b": P(None)},
        },
        "decoder": {
            "tok_emb": P(None), "pos_emb": P(None),
            "blocks": block_spec(cross=True),
            "ln": {"g": P(None), "b": P(None)},
        },
    }


def sharding_pytree(params, mesh: Mesh):
    """NamedSharding pytree matching ``params``.

    Handles int8-quantized weights (ops/quant.py layout
    ``{"q": [..., K, N], "s": [..., N]}``): the int8 tensor inherits the
    weight's spec and the per-output-channel scale drops the contraction
    axis, so TP sharding works identically for bf16 and int8 checkpoints.
    """
    from ..ops.quant import is_quantized
    rules = param_sharding_rules(params)

    def resolve(p, rule):
        if isinstance(p, dict):
            if is_quantized(p):
                axes = list(rule)
                s_spec = P(*(axes[:-2] + axes[-1:])) if len(axes) >= 2 \
                    else rule
                return {"q": NamedSharding(mesh, rule),
                        "s": NamedSharding(mesh, s_spec)}
            # keys outside the template (custom heads, future params)
            # default to replicated rather than KeyError-ing the load
            return {k: resolve(v, rule.get(k, P())
                               if isinstance(rule, dict) else P())
                    for k, v in p.items()}
        if isinstance(rule, dict):   # template expected a subtree here
            rule = P()
        return NamedSharding(mesh, rule)

    return resolve(params, rules)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per param_sharding_rules."""
    return jax.tree.map(jax.device_put, params,
                        sharding_pytree(params, mesh))


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every leaf over the data axis;
    rank-0 leaves (scalars — e.g. a temperature) replicate."""
    def put(x):
        spec = (P(DATA_AXIS, *([None] * (x.ndim - 1)))
                if getattr(x, "ndim", 0) > 0 else P())
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
