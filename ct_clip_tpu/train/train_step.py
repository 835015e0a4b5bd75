"""The jitted CLIP pretraining step.

Maps the reference hot path (scripts/CTCLIPTrainer.py:233-263: autocast
forward with return_loss=True, backward, clip-grad 0.5, Adam step) onto a
single pjit-compiled function over the device mesh: batch sharded on `data`,
params replicated (or `model`-sharded for the big projection), gradient
reduction and negative-gathering inserted by XLA from the sharding
constraints.  bf16 compute / f32 params replaces torch autocast.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..models.ctclip import CTCLIP


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    vq: Any               # VQ codebook EMA state ("vq" collection)
    opt_state: Any
    temperature_grad_ok: bool = struct.field(pytree_node=False, default=True)


def create_train_state(model: CTCLIP, rng: jax.Array, sample_batch,
                       tx: optax.GradientTransformation) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1),
         "mlm": jax.random.fold_in(rng, 2), "ssl": jax.random.fold_in(rng, 3)},
        sample_batch["input_ids"], sample_batch["attention_mask"],
        sample_batch["video"], return_loss=True)
    params = variables["params"]
    vq = variables.get("vq", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, vq=vq,
                      opt_state=tx.init(params))


def make_train_step(model: CTCLIP, tx: optax.GradientTransformation,
                    cfg: TrainConfig) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).  Jit/pjit-ready:
    wrap with jax.jit(..., donate_argnums=0) and sharding constraints."""

    def loss_fn(params, vq, batch, rng):
        (loss), new_vars = model.apply(
            {"params": params, "vq": vq},
            batch["input_ids"], batch["attention_mask"], batch["video"],
            return_loss=True, train=True, deterministic=False,
            rngs={"dropout": rng, "mlm": jax.random.fold_in(rng, 1),
                  "ssl": jax.random.fold_in(rng, 2)}, mutable=["vq"])
        return loss, new_vars.get("vq", vq)

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        (loss, new_vq), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.vq, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "temperature": new_params["temperature"],
        }
        return dataclasses.replace(state, step=state.step + 1,
                                   params=new_params, vq=new_vq,
                                   opt_state=new_opt), metrics

    return step


def jit_train_step(step_fn: Callable, mesh: Mesh,
                   data_axis: str = "data") -> Callable:
    """Compile the step over the mesh: batch sharded on `data`, state
    replicated (param sharding is taken from the state's current placement)."""
    batch_sharding = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    def sharded_step(state, batch, rng):
        batch = jax.lax.with_sharding_constraint(
            batch, {k: batch_sharding for k in batch})
        return step_fn(state, batch, rng)

    return jax.jit(sharded_step, donate_argnums=(0,))
