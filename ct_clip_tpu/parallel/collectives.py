"""Explicit collective helpers (shard_map path).

The default training path relies on pjit + sharding constraints, letting XLA
insert all-gathers/psums.  This module provides the explicit equivalent of
the reference's hand-written autograd AllGather (CT_CLIP/ct_clip/
distributed.py:9-51 — written but never used by production): a differentiable
all-gather whose backward returns each device's gradient slice (psum-scatter),
for users who want per-device loss math under shard_map.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def all_gather_batch(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Differentiable all-gather along the batch dim.  jax.lax.all_gather is
    linear; its transpose is psum_scatter, which is exactly the reference
    AllGather.backward semantics (distributed.py:46-49)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def shard_map_loss_fn(loss_fn: Callable, mesh: Mesh, data_axis: str = "data"):
    """Wrap a per-device loss(text_latents, image_latents, temp) under
    shard_map with pod-wide negatives via all_gather_batch; returns the
    pmean'd scalar loss."""
    from jax import shard_map  # jax>=0.8 home (experimental is deprecated)

    def per_device(tl, il, temp):
        tl_g = all_gather_batch(tl, data_axis)
        il_g = all_gather_batch(il, data_axis)
        loss = loss_fn(tl_g, il_g, temp)
        return jax.lax.pmean(loss, data_axis)

    return shard_map(per_device, mesh=mesh,
                     in_specs=(P(data_axis), P(data_axis), P()),
                     out_specs=P())
