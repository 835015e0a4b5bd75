"""Device mesh construction and sharding rules.

The reference's distribution story is HF accelerate DDP/FSDP over NCCL
(scripts/CTCLIPTrainer.py:138-140, scripts/README.md:16-26).  The TPU-native
equivalent is a single jax.sharding.Mesh with a `data` axis (batch sharding;
gradient psum inserted by XLA) and an optional `model` axis used to shard the
294912x512 visual-latent projection and the attention-head dimension.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and the
same code runs over ICI within a slice / DCN across slices — collectives are
chosen by XLA from the device assignment, not by us (scaling-book recipe).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel_size)
    assert n % mp == 0, f"{n} devices not divisible by model_parallel_size={mp}"
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron TP: column-parallel kernels (output dim on `model`) feed
# row-parallel kernels (input dim on `model`); GSPMD inserts one psum after
# each row-parallel matmul.  Substrings match both the BERT tower
# (query/key/value -> attention_output_dense, intermediate -> output_dense)
# and the CTViT tower (to_q/to_kv -> to_out, ff wi -> wo).
_TP_COL = ("attention_self/query/kernel", "attention_self/key/kernel",
           "attention_self/value/kernel", "intermediate_dense/kernel",
           "attn/to_q/kernel", "attn/to_kv/kernel", "ff/wi/kernel")
_TP_ROW = ("attention_output_dense/kernel", "output_dense/kernel",
           "attn/to_out/kernel", "ff/wo/kernel")


def param_sharding_rules(path_str: str, cfg: MeshConfig,
                         shape=None, model_size: Optional[int] = None) -> P:
    """Parameter partition specs.  Always: the two huge visual-latent
    projections (294912 x 512 = 150M params each, ct_clip.py:564) shard
    their input dim over `model`.  With cfg.tensor_parallel: Megatron
    column/row sharding of the attention and FFN projections in both towers
    (skipped per-leaf when the dim doesn't divide model_size)."""
    if "to_visual_latent" in path_str and "kernel" in path_str:
        return P(cfg.model_axis, None)
    if cfg.tensor_parallel:
        def fits(d):  # unknown shape/size -> trust the caller
            return (shape is None or model_size is None
                    or shape[d] % model_size == 0)
        if any(path_str.endswith(s) for s in _TP_COL) and fits(-1):
            return P(None, cfg.model_axis)
        if any(path_str.endswith(s) for s in _TP_ROW) and fits(0):
            return P(cfg.model_axis, None)
    return P()


def fsdp_spec(shape, cfg: MeshConfig, axis_size: int, base: P = P()) -> P:
    """ZeRO-style spec: shard the largest dimension divisible by the data
    axis (skipping dims `base` already assigns to the model axis).  Returns
    `base` unchanged for small leaves (< cfg.fsdp_min_size elements) or when
    nothing divides."""
    if axis_size <= 1 or not shape or int(np.prod(shape)) < cfg.fsdp_min_size:
        return base
    entries = list(base) + [None] * (len(shape) - len(base))
    free = [d for d in range(len(shape))
            if entries[d] is None and shape[d] % axis_size == 0]
    if not free:
        return base
    d = max(free, key=lambda i: shape[i])
    entries[d] = cfg.data_axis
    return P(*entries)


def _full_spec(path, leaf, cfg: MeshConfig, axis_size: int,
               model_size: int) -> P:
    path_str = "/".join(str(getattr(k, "key", k)) for k in path)
    spec = param_sharding_rules(path_str, cfg, getattr(leaf, "shape", None),
                                model_size)
    if cfg.fsdp == "full":
        spec = fsdp_spec(getattr(leaf, "shape", ()), cfg, axis_size, spec)
    return spec


def shard_params(params, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Apply param_sharding_rules (plus fsdp="full" data sharding) across a
    pytree of parameters."""
    axis_size = mesh.shape[cfg.data_axis]
    model_size = mesh.shape[cfg.model_axis]

    def place(path, leaf):
        spec = _full_spec(path, leaf, cfg, axis_size, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Like shard_params but returns the NamedSharding pytree (for jit
    in_shardings/out_shardings)."""
    axis_size = mesh.shape[cfg.data_axis]
    model_size = mesh.shape[cfg.model_axis]

    def spec(path, leaf):
        return NamedSharding(mesh,
                             _full_spec(path, leaf, cfg, axis_size, model_size))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_opt_state(opt_state, params, mesh: Mesh,
                    cfg: MeshConfig = MeshConfig()):
    """ZeRO-1/2 equivalent: place every optimizer moment on the `data` axis
    (the optax Adam mu/nu subtrees mirror the params treedef, so a moment
    leaf's path suffix IS its param path).  Scalars (step counts) and leaves
    with no divisible dim stay replicated.  No-op when cfg.fsdp == "none"."""
    if cfg.fsdp == "none":
        return opt_state
    axis_size = mesh.shape[cfg.data_axis]
    model_size = mesh.shape[cfg.model_axis]

    pspecs = {}

    def record(path, leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        base = param_sharding_rules("/".join(keys), cfg, leaf.shape,
                                    model_size)
        pspecs[keys] = fsdp_spec(leaf.shape, cfg, axis_size, base)
        return leaf

    jax.tree_util.tree_map_with_path(record, params)

    def place(path, leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        for i in range(len(keys)):
            spec = pspecs.get(keys[i:])
            if spec is not None:
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, opt_state)
