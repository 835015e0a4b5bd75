"""Pallas TPU kernel: video -> patch-major relayout (and its inverse).

The CTViT patch embedding needs (b, F, H, W) voxels regrouped into
(b, t*h*w, pt*p*p) patch rows ('(c pt p1 p2)' order, ctvit.py:170).  XLA has
no good lowering for this: transpose forms tile-pad the tiny patch extents
(20, 20, 10) by 6-10x (10-23 GB HLO temps at production shape), and the flat
1-D gather runs element-at-a-time (~108 ms/volume, 83% of the zero-shot
step).

Mosaic supports only a restricted op set for vector relayouts (2-D
transposes, leading-dim reshapes, batched minor-dim transposes, lane-offset
masked stores — probed empirically; minor-dim reshape merges are rejected),
so each grid program processes a (pt, hb*p, W) slab as:
    per z-slice: slab.T -> lead-reshape (w, p2, hb*p) -> batched transpose
    -> 20 lane-offset stores into the (hb*w, pt*p*p) output rows.
All data stays in VMEM; the grid pipelines slab DMAs against the shuffles.

`rearrange_patches` carries a custom VJP whose backward is the exact inverse
kernel (scratch-buffer assembly + the reverse shuffles), so the op is fully
differentiable for training.  Kernels run in f32 (the consumer patch-LN is
f32 anyway); non-TPU backends, c != 1, or geometries violating the (8, 128)
block constraints fall back to an XLA gather with identical numerics
(tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_VMEM_BLOCK_BUDGET = 4 * 1024 * 1024


def _pick_hb(pt: int, p: int, h: int, w: int, sublane: int = 8) -> Optional[int]:
    """Rows-per-program along h: smallest hb with (hb*p) % sublane == 0 and
    (hb*w) % sublane == 0 (8 for f32 tiles, 16 for bf16) that divides h and
    fits VMEM."""
    for hb in range(1, h + 1):
        if h % hb:
            continue
        if (hb * p) % sublane or (hb * w) % sublane:
            continue
        blk = pt * hb * p * w * p * 4  # f32 in block
        if 2 * (2 * blk) > _VMEM_BLOCK_BUDGET * 4:  # generous: in+out, dbl buf
            continue
        return hb
    return None


def _kernel_dtype(dtype) -> jnp.dtype:
    """Run natively in bf16 when a bf16-legal block exists (halves the
    shuffle bytes — measured 4.3 -> 2.9 ms/volume at production shape,
    numerics exact since the relayout moves values untouched); otherwise
    compute via f32 blocks."""
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def _sublane_for(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _use_pallas(pt: int, p: int, h: int, w: int, channels: int = 1) -> bool:
    if channels != 1:
        return False
    if _pick_hb(pt, p, h, w) is None:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


# ---------------------------------------------------------------- kernels
def _fwd_kernel(x_ref, o_ref, *, pt, p, hb, w):
    # x_ref: (1, pt, hb*p, w*p); o_ref: (1, hb*w, pt*p*p)
    for z in range(pt):
        slab = x_ref[0, z]                      # (hb*p, w*p)
        t3 = slab.T.reshape(w, p, hb * p)       # [wi, p2, ph*p+p1]
        tt = t3.transpose(0, 2, 1)              # [wi, ph*p+p1, p2]
        for ph in range(hb):
            for p1 in range(p):
                col = z * p * p + p1 * p
                o_ref[0, ph * w:(ph + 1) * w, col:col + p] = \
                    tt[:, ph * p + p1, :]


def _inv_kernel(g_ref, o_ref, scratch, *, pt, p, hb, w):
    # g_ref: (1, hb*w, pt*p*p); o_ref: (1, pt, hb*p, w*p)
    # scratch: (w, hb*p, p) f32
    for z in range(pt):
        for ph in range(hb):
            for p1 in range(p):
                col = z * p * p + p1 * p
                scratch[:, ph * p + p1, :] = \
                    g_ref[0, ph * w:(ph + 1) * w, col:col + p]
        t3 = scratch[...].transpose(0, 2, 1)     # (w, p2, hb*p)
        o_ref[0, z] = t3.reshape(w * p, hb * p).T


def _pallas_rearrange(video: jnp.ndarray, pt: int, p: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, F, H, W = video.shape
    t, h, w = F // pt, H // p, W // p
    patch_dim = pt * p * p

    orig_dtype = video.dtype
    kdtype = _kernel_dtype(orig_dtype)
    hb = _pick_hb(pt, p, h, w, _sublane_for(kdtype))
    if hb is None:  # bf16 tiling infeasible for this geometry; f32 blocks
        kdtype = jnp.float32
        hb = _pick_hb(pt, p, h, w, 8)
    splits = h // hb
    video = video.astype(kdtype)
    kernel = functools.partial(_fwd_kernel, pt=pt, p=p, hb=hb, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b, t, splits),
        in_specs=[pl.BlockSpec((1, pt, hb * p, W),
                               lambda bi, ti, si: (bi, ti, si, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb * w, patch_dim),
                               lambda bi, ti, si: (bi, ti * splits + si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t * h * w, patch_dim), kdtype),
    )(video)
    return out.astype(orig_dtype)


def _pallas_unrearrange(patches: jnp.ndarray, pt: int, p: int,
                        F: int, H: int, W: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = patches.shape[0]
    t, h, w = F // pt, H // p, W // p
    patch_dim = pt * p * p

    orig_dtype = patches.dtype
    # the inverse shuffle needs a (1, n, p) -> (n, 1, p) vector shape cast
    # Mosaic only supports for 32-bit types — stays f32 (fwd runs bf16)
    kdtype = jnp.float32
    hb = _pick_hb(pt, p, h, w, 8)
    splits = h // hb
    patches = patches.astype(kdtype)
    kernel = functools.partial(_inv_kernel, pt=pt, p=p, hb=hb, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b, t, splits),
        in_specs=[pl.BlockSpec((1, hb * w, patch_dim),
                               lambda bi, ti, si: (bi, ti * splits + si, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, pt, hb * p, W),
                               lambda bi, ti, si: (bi, ti, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, F, H, W), kdtype),
        scratch_shapes=[pltpu.VMEM((w, hb * p, p), kdtype)],
    )(patches)
    return out.astype(orig_dtype)


# ------------------------------------------------------------ XLA fallback
def _perm_indices(F, H, W, pt, p) -> np.ndarray:
    t, h, w = F // pt, H // p, W // p
    ti, hi, wi, zi, p1, p2 = np.meshgrid(
        np.arange(t), np.arange(h), np.arange(w),
        np.arange(pt), np.arange(p), np.arange(p), indexing="ij")
    idx = ((ti * pt + zi) * H + (hi * p + p1)) * W + (wi * p + p2)
    return idx.reshape(-1).astype(np.int32)


def _gather_rearrange(video, pt, p):
    b, F, H, W = video.shape
    t, h, w = F // pt, H // p, W // p
    perm = jnp.asarray(_perm_indices(F, H, W, pt, p))
    flat = video.reshape(b, F * H * W)
    return jnp.take(flat, perm, axis=1).reshape(b, t * h * w, pt * p * p)


def _gather_unrearrange(patches, pt, p, F, H, W):
    b = patches.shape[0]
    perm = jnp.asarray(_perm_indices(F, H, W, pt, p))
    flat = patches.reshape(b, F * H * W)
    out = jnp.zeros((b, F * H * W), patches.dtype)
    return out.at[:, perm].set(flat).reshape(b, F, H, W)


# ------------------------------------------------------------- public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def rearrange_patches(video: jnp.ndarray, pt: int, p: int) -> jnp.ndarray:
    """(b, F, H, W) -> (b, t*h*w, pt*p*p) patch rows in (pt, p1, p2) order."""
    _, F, H, W = video.shape
    if _use_pallas(pt, p, H // p, W // p):
        return _pallas_rearrange(video, pt, p)
    return _gather_rearrange(video, pt, p)


def _rearrange_fwd(video, pt, p):
    return rearrange_patches(video, pt, p), video.shape


def _rearrange_bwd(pt, p, shape, g):
    b, F, H, W = shape
    if _use_pallas(pt, p, H // p, W // p):
        return (_pallas_unrearrange(g, pt, p, F, H, W),)
    return (_gather_unrearrange(g, pt, p, F, H, W),)


rearrange_patches.defvjp(_rearrange_fwd, _rearrange_bwd)
