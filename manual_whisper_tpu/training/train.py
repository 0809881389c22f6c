"""Sharded Whisper fine-tuning step (dp + tp over a jax Mesh).

The reference does no training, but a production transcription framework
needs domain fine-tuning (the reference compensates with prompt-engineering
and post-hoc term replacement — transcribe.py:39-40, 53-61; fine-tuning is
the principled fix).  This module also backs the multi-chip dry-run
(__graft_entry__.dryrun_multichip): a full train step jitted over a
(data, model) mesh exercises every sharding rule in parallel/mesh.py.

Loss: teacher-forced cross-entropy over decoder logits with label masking;
optimizer: optax adamw; remat on encoder blocks would come with long-form
training (not needed at 30 s windows).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.whisper import WhisperConfig, decoder_forward, encode


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def loss_fn(params, mel, tokens, loss_mask, cfg: WhisperConfig):
    """Cross entropy: predict tokens[:, 1:] from tokens[:, :-1]."""
    xa = encode(params, mel, cfg)
    logits, _ = decoder_forward(params, tokens[:, :-1], xa, cfg)
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: WhisperConfig, optimizer,
                    mesh: Optional[Mesh] = None):
    """Build a jitted train step; with a mesh, params/opt-state follow the
    tensor-parallel rules and the batch is sharded over the data axis."""

    def train_step(state: TrainState, mel, tokens, loss_mask
                   ) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, mel, tokens, loss_mask, cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    def train_step_tuple(state_tuple, mel, tokens, loss_mask):
        state = TrainState(*state_tuple)
        new_state, loss = train_step(state, mel, tokens, loss_mask)
        return (new_state.params, new_state.opt_state, new_state.step), loss

    if mesh is None:
        # donate the (params, opt_state, step) tuple: without donation the
        # step holds TWO copies of model+optimizer state at peak — a
        # large-v3 fine-tune OOMs a 16 GB chip purely on the duplicate
        jitted = jax.jit(train_step_tuple, donate_argnums=(0,))

        def run_local(state: TrainState, mel, tokens, loss_mask):
            new_tuple, loss = jitted(
                (state.params, state.opt_state, state.step),
                mel, tokens, loss_mask)
            return TrainState(*new_tuple), loss

        return run_local

    jitted = jax.jit(train_step_tuple, donate_argnums=(0,))

    def run(state: TrainState, mel, tokens, loss_mask):
        # Arguments arrive committed: params via parallel.shard_params
        # (tensor-parallel rules), optimizer moments inherit those shardings
        # from optimizer.init(sharded_params), batch via parallel.shard_batch
        # (data axis).  GSPMD propagates the shardings through the step and
        # inserts the ICI collectives (grad psum, TP all-reduces).
        with mesh:
            (new_p, new_o, new_step), loss = jitted(
                (state.params, state.opt_state, state.step),
                mel, tokens, loss_mask)
        return TrainState(new_p, new_o, new_step), loss

    return run
