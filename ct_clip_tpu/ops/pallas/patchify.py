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

from ._call import kernels_supported, mm_precision_for, pallas_call
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
        return kernels_supported()
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
    if hb is None:  # no legal block at all (tiny h/w): gather path
        return _gather_rearrange(video, pt, p)
    splits = h // hb
    video = video.astype(kdtype)
    kernel = functools.partial(_fwd_kernel, pt=pt, p=p, hb=hb, w=w)
    out = pallas_call(
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
    if hb is None:  # no legal block (tiny h/w): gather path
        return _gather_unrearrange(patches, pt, p, F, H, W)
    splits = h // hb
    patches = patches.astype(kdtype)
    kernel = functools.partial(_inv_kernel, pt=pt, p=p, hb=hb, w=w)
    out = pallas_call(
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


# ----------------------------------------------------- fused patch embed
# One kernel for the whole to_patch_emb chain (reference ctvit.py:170-175:
# Rearrange -> LayerNorm(patch_dim) -> Linear(patch_dim, dim) ->
# LayerNorm(dim)).  The relayout-only kernel above writes the (b, t*h*w,
# patch_dim) patch tensor to HBM (884 MB at production shape) and the LN +
# projection read it back twice more; fusing keeps each patch block in VMEM
# from shuffle to projection, so HBM traffic drops to video-in + tokens-out.
# Backward splits in two: a Pallas kernel accumulates the weight/LN grads
# (flash-style recompute per block), while d(video) — never needed in
# practice, the video is data — is composed in XLA from rearrange_patches'
# own VJP and DCE'd when unused.

_VMEM_LIMIT_EMBED = 64 * 1024 * 1024


def _embed_shuffle(x_ref, scratch, *, pt, p, hb, w):
    for z in range(pt):
        slab = x_ref[0, z]                      # (hb*p, w*p)
        t3 = slab.T.reshape(w, p, hb * p)
        tt = t3.transpose(0, 2, 1)
        for ph in range(hb):
            for p1 in range(p):
                col = z * p * p + p1 * p
                scratch[ph * w:(ph + 1) * w, col:col + p] = \
                    tt[:, ph * p + p1, :]


def _embed_kernel(x_ref, s1_ref, b1_ref, wi_ref, pb_ref, s2_ref, b2_ref,
                  o_ref, scratch, *, pt, p, hb, w, eps):
    _embed_shuffle(x_ref, scratch, pt=pt, p=p, hb=hb, w=w)
    dtype = wi_ref.dtype
    xf = scratch[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = ((xc * jax.lax.rsqrt(var + eps)) * s1_ref[...]
          + b1_ref[...]).astype(dtype)
    y = jnp.dot(xn, wi_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pb_ref[...].astype(dtype)
    yf = yb.astype(jnp.float32)
    mean2 = jnp.mean(yf, axis=-1, keepdims=True)
    yc = yf - mean2
    var2 = jnp.mean(yc * yc, axis=-1, keepdims=True)
    out = (yc * jax.lax.rsqrt(var2 + eps)) * s2_ref[...] + b2_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def _embed_bwd_kernel(x_ref, do_ref, s1_ref, b1_ref, wi_ref, pb_ref,
                      s2_ref, b2_ref,
                      dwi_ref, ds1_ref, db1_ref, dpb_ref, ds2_ref, db2_ref,
                      scratch, *, pt, p, hb, w, eps):
    from jax.experimental import pallas as pl

    _embed_shuffle(x_ref, scratch, pt=pt, p=p, hb=hb, w=w)
    dtype = wi_ref.dtype
    # forward recompute (numerics identical to _embed_kernel)
    xf = scratch[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd1 = jax.lax.rsqrt(var + eps)
    xhat1 = xc * rstd1
    xn = (xhat1 * s1_ref[...] + b1_ref[...]).astype(dtype)
    y = jnp.dot(xn, wi_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pb_ref[...].astype(dtype)
    yf = yb.astype(jnp.float32)
    mean2 = jnp.mean(yf, axis=-1, keepdims=True)
    yc = yf - mean2
    var2 = jnp.mean(yc * yc, axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = yc * rstd2

    do = do_ref[0].astype(jnp.float32)
    ds2 = jnp.sum(do * xhat2, axis=0, keepdims=True)
    db2 = jnp.sum(do, axis=0, keepdims=True)
    dxhat2 = do * s2_ref[...]
    m1 = jnp.mean(dxhat2, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat2 * xhat2, axis=-1, keepdims=True)
    dyb = rstd2 * (dxhat2 - m1 - xhat2 * m2)
    dpb = jnp.sum(dyb, axis=0, keepdims=True)
    dyb_b = dyb.astype(dtype)
    dwi = jax.lax.dot_general(xn, dyb_b, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxn = jax.lax.dot_general(dyb_b, wi_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds1 = jnp.sum(dxn * xhat1, axis=0, keepdims=True)
    db1 = jnp.sum(dxn, axis=0, keepdims=True)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) \
        & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        ds1_ref[...] = jnp.zeros_like(ds1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dpb_ref[...] = jnp.zeros_like(dpb_ref)
        ds2_ref[...] = jnp.zeros_like(ds2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dwi_ref[...] += dwi
    ds1_ref[...] += ds1
    db1_ref[...] += db1
    dpb_ref[...] += dpb
    ds2_ref[...] += ds2
    db2_ref[...] += db2


def _embed_grid(video, pt, p, compute_dtype):
    b, F, H, W = video.shape
    t, h, w = F // pt, H // p, W // p
    kdtype = _kernel_dtype(compute_dtype)
    hb = _pick_hb(pt, p, h, w, _sublane_for(kdtype))
    if hb is None:
        kdtype = jnp.float32
        hb = _pick_hb(pt, p, h, w, 8)
    return t, h, w, hb, kdtype


def _pallas_patch_embed(video, s1, b1, wi, pbias, s2, b2, pt, p, eps, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, F, H, W = video.shape
    t, h, w, hb, kdtype = _embed_grid(video, pt, p, dtype)
    splits = h // hb
    patch_dim = pt * p * p
    dim = wi.shape[1]
    sv = lambda a: pl.BlockSpec(a.shape, (lambda nd: lambda bi, ti, si:
                                          (0,) * nd)(a.ndim),
                                memory_space=pltpu.VMEM)
    weights = (s1.astype(jnp.float32)[None, :], b1.astype(jnp.float32)[None, :],
               wi.astype(dtype), pbias.astype(dtype)[None, :],
               s2.astype(jnp.float32)[None, :], b2.astype(jnp.float32)[None, :])
    out = pallas_call(
        functools.partial(_embed_kernel, pt=pt, p=p, hb=hb, w=w, eps=eps),
        mm_precision=mm_precision_for(dtype),
        grid=(b, t, splits),
        in_specs=[pl.BlockSpec((1, pt, hb * p, W),
                               lambda bi, ti, si: (bi, ti, si, 0),
                               memory_space=pltpu.VMEM)] +
                 [sv(a) for a in weights],
        out_specs=pl.BlockSpec((1, hb * w, dim),
                               lambda bi, ti, si: (bi, ti * splits + si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t * h * w, dim), dtype),
        scratch_shapes=[pltpu.VMEM((hb * w, patch_dim), kdtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_EMBED),
    )(video.astype(kdtype), *weights)
    return out


def _pallas_patch_embed_bwd(video, s1, b1, wi, pbias, s2, b2, do,
                            pt, p, eps, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, F, H, W = video.shape
    t, h, w, hb, kdtype = _embed_grid(video, pt, p, dtype)
    splits = h // hb
    patch_dim = pt * p * p
    dim = wi.shape[1]
    sv = lambda a: pl.BlockSpec(a.shape, (lambda nd: lambda bi, ti, si:
                                          (0,) * nd)(a.ndim),
                                memory_space=pltpu.VMEM)
    weights = (s1.astype(jnp.float32)[None, :], b1.astype(jnp.float32)[None, :],
               wi.astype(dtype), pbias.astype(dtype)[None, :],
               s2.astype(jnp.float32)[None, :], b2.astype(jnp.float32)[None, :])
    outs = [
        jax.ShapeDtypeStruct((patch_dim, dim), jnp.float32),   # dwi
        jax.ShapeDtypeStruct((1, patch_dim), jnp.float32),     # ds1
        jax.ShapeDtypeStruct((1, patch_dim), jnp.float32),     # db1
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # dpbias
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # ds2
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # db2
    ]
    dwi, ds1, db1, dpb, ds2, db2 = pallas_call(
        functools.partial(_embed_bwd_kernel, pt=pt, p=p, hb=hb, w=w, eps=eps),
        mm_precision=mm_precision_for(dtype),
        grid=(b, t, splits),
        in_specs=[pl.BlockSpec((1, pt, hb * p, W),
                               lambda bi, ti, si: (bi, ti, si, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, hb * w, dim),
                               lambda bi, ti, si: (bi, ti * splits + si, 0),
                               memory_space=pltpu.VMEM)] +
                 [sv(a) for a in weights],
        out_specs=[sv(o) for o in outs],
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((hb * w, patch_dim), kdtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_EMBED),
    )(video.astype(kdtype), do.astype(dtype), *weights)
    return (ds1[0].astype(s1.dtype), db1[0].astype(b1.dtype),
            dwi.astype(wi.dtype), dpb[0].astype(pbias.dtype),
            ds2[0].astype(s2.dtype), db2[0].astype(b2.dtype))


def _xla_patch_embed(video, s1, b1, wi, pbias, s2, b2, pt, p, eps, dtype):
    from ..norms import layer_norm

    patches = rearrange_patches(video, pt, p)
    x = layer_norm(patches, s1, b1, eps)
    y = jnp.einsum("bnp,pd->bnd", x.astype(dtype), wi.astype(dtype),
                   preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pbias.astype(dtype)
    return layer_norm(yb, s2, b2, eps).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_patch_embed(video, s1, b1, wi, pbias, s2, b2,
                      pt: int, p: int, eps: float = 1e-5,
                      dtype=jnp.bfloat16):
    """Whole to_patch_emb chain on (b, F, H, W) single-channel video:
    patchify -> LN(patch_dim; s1, b1) -> @wi + pbias -> LN(dim; s2, b2).
    Returns (b, t*h*w, dim) in the compute dtype."""
    _, F, H, W = video.shape
    if _use_pallas(pt, p, H // p, W // p) and dtype == jnp.bfloat16:
        return _pallas_patch_embed(video, s1, b1, wi, pbias, s2, b2,
                                   pt, p, eps, dtype)
    return _xla_patch_embed(video, s1, b1, wi, pbias, s2, b2,
                            pt, p, eps, dtype)


def _pe_fwd(video, s1, b1, wi, pbias, s2, b2, pt, p, eps, dtype):
    out = fused_patch_embed(video, s1, b1, wi, pbias, s2, b2,
                            pt, p, eps, dtype)
    return out, (video, s1, b1, wi, pbias, s2, b2)


# ------------------------------------------------- patch-ROW fused embed
# Same LN -> projection -> LN chain, but the input is already the
# (b, n_tokens, patch_dim) patch-row tensor — the ingest pipeline emits
# patch-major rows straight out of the fused preprocess (rearrange_patches
# as the last ingest stage), so the scored step never pays the lane-offset
# shuffle (~1.4 ms/volume at production shape).  Reference semantics are
# identical to to_patch_emb minus the Rearrange (ctvit.py:170-175).

def _rows_embed_math(xf, s1_ref, b1_ref, wi_ref, pb_ref, s2_ref, b2_ref,
                     *, eps, dtype):
    """(rows, patch_dim) f32 -> (rows, dim) f32: LN -> @wi + pb -> LN.
    Bit-identical math to _embed_kernel's post-shuffle section."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = ((xc * jax.lax.rsqrt(var + eps)) * s1_ref[...]
          + b1_ref[...]).astype(dtype)
    y = jnp.dot(xn, wi_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pb_ref[...].astype(dtype)
    yf = yb.astype(jnp.float32)
    mean2 = jnp.mean(yf, axis=-1, keepdims=True)
    yc = yf - mean2
    var2 = jnp.mean(yc * yc, axis=-1, keepdims=True)
    return (yc * jax.lax.rsqrt(var2 + eps)) * s2_ref[...] + b2_ref[...]


def _rows_kernel(x_ref, s1_ref, b1_ref, wi_ref, pb_ref, s2_ref, b2_ref,
                 o_ref, *, eps, dtype):
    xf = x_ref[0].astype(jnp.float32)
    out = _rows_embed_math(xf, s1_ref, b1_ref, wi_ref, pb_ref, s2_ref,
                           b2_ref, eps=eps, dtype=dtype)
    o_ref[0] = out.astype(o_ref.dtype)


def _rows_bwd_kernel(x_ref, do_ref, s1_ref, b1_ref, wi_ref, pb_ref,
                     s2_ref, b2_ref,
                     dx_ref, dwi_ref, ds1_ref, db1_ref, dpb_ref, ds2_ref,
                     db2_ref, *, eps, dtype):
    from jax.experimental import pallas as pl

    # forward recompute (numerics identical to _rows_kernel)
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd1 = jax.lax.rsqrt(var + eps)
    xhat1 = xc * rstd1
    s1 = s1_ref[...]
    xn = (xhat1 * s1 + b1_ref[...]).astype(dtype)
    y = jnp.dot(xn, wi_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pb_ref[...].astype(dtype)
    yf = yb.astype(jnp.float32)
    mean2 = jnp.mean(yf, axis=-1, keepdims=True)
    yc = yf - mean2
    var2 = jnp.mean(yc * yc, axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = yc * rstd2

    do = do_ref[0].astype(jnp.float32)
    ds2 = jnp.sum(do * xhat2, axis=0, keepdims=True)
    db2 = jnp.sum(do, axis=0, keepdims=True)
    dxhat2 = do * s2_ref[...]
    m1 = jnp.mean(dxhat2, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat2 * xhat2, axis=-1, keepdims=True)
    dyb = rstd2 * (dxhat2 - m1 - xhat2 * m2)
    dpb = jnp.sum(dyb, axis=0, keepdims=True)
    dyb_b = dyb.astype(dtype)
    dwi = jax.lax.dot_general(xn, dyb_b, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxn = jax.lax.dot_general(dyb_b, wi_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds1 = jnp.sum(dxn * xhat1, axis=0, keepdims=True)
    db1 = jnp.sum(dxn, axis=0, keepdims=True)
    # LN backward onto the rows themselves (rows are usually training data
    # and this grad is DCE'd, but the kernel stays a complete VJP)
    dxhat1 = dxn * s1
    n1 = jnp.mean(dxhat1, axis=-1, keepdims=True)
    n2 = jnp.mean(dxhat1 * xhat1, axis=-1, keepdims=True)
    dx_ref[0] = (rstd1 * (dxhat1 - n1 - xhat1 * n2)).astype(dx_ref.dtype)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        ds1_ref[...] = jnp.zeros_like(ds1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dpb_ref[...] = jnp.zeros_like(dpb_ref)
        ds2_ref[...] = jnp.zeros_like(ds2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dwi_ref[...] += dwi
    ds1_ref[...] += ds1
    db1_ref[...] += db1
    dpb_ref[...] += dpb
    ds2_ref[...] += ds2
    db2_ref[...] += db2


def _rows_block(n: int, patch_dim: int, fwd: bool) -> Optional[int]:
    """Rows per grid step: divides n, sublane-aligned, block fits VMEM
    (backward keeps several f32 (nb, patch_dim) temps alive)."""
    budget = 24 * 1024 * 1024 if fwd else 12 * 1024 * 1024
    for nb in (576, 512, 384, 256, 192, 128, 96, 64, 32, 16):
        if n % nb or nb % 16:
            continue
        if nb * patch_dim * 4 * (2 if fwd else 6) <= budget:
            return nb
    return None


def _use_pallas_rows(n: int, patch_dim: int, dim: int) -> bool:
    # patch_dim need not be lane-aligned: Mosaic pads the minor dim (4000 ->
    # 4096, 2.4% waste) and the row-wise LN statistics mask the padding.
    # Forward gate only — _re_bwd checks its own (2x tighter) block plan and
    # falls back to the XLA VJP when it has none, so inference keeps the
    # fused forward for shapes whose bwd plan doesn't fit.
    if patch_dim % 8 or dim % 128 or _rows_block(n, patch_dim, True) is None:
        return False
    try:
        return kernels_supported()
    except Exception:  # noqa: BLE001
        return False


def row_embed_train(rows, s1, b1, wi, pbias, s2, b2, eps, dtype):
    """XLA composition of the row embed (LN -> @wi + pbias -> LN) — the
    TRAINING path, and the CPU-identical twin the fused kernel is tested
    against.

    Load-bearing train-vs-infer split (models/ctvit.py embed_patches): under
    `jax.grad`, XLA stores the cheap LN residuals and reuses them in the
    backward, while `fused_row_embed`'s custom VJP would recompute the
    forward flash-style — slower fwd+bwd here because the recomputation is
    a full extra pass over the (b, n, 4000) rows.  Inference has no backward
    and wants the fused single-kernel pass instead.  Keep callers on this
    public name: the underscore twin `_xla_row_embed` is an internal detail
    of the VJP fallback."""
    from ..norms import layer_norm

    x = layer_norm(rows, s1, b1, eps)
    y = jnp.einsum("bnp,pd->bnd", x.astype(dtype), wi.astype(dtype),
                   preferred_element_type=jnp.float32)
    yb = y.astype(dtype) + pbias.astype(dtype)
    return layer_norm(yb, s2, b2, eps).astype(dtype)


_xla_row_embed = row_embed_train


def _rows_weights(s1, b1, wi, pbias, s2, b2, dtype):
    return (s1.astype(jnp.float32)[None, :], b1.astype(jnp.float32)[None, :],
            wi.astype(dtype), pbias.astype(dtype)[None, :],
            s2.astype(jnp.float32)[None, :], b2.astype(jnp.float32)[None, :])


def _pallas_row_embed(rows, s1, b1, wi, pbias, s2, b2, eps, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, patch_dim = rows.shape
    dim = wi.shape[1]
    nb = _rows_block(n, patch_dim, True)
    splits = n // nb
    sv = lambda a: pl.BlockSpec(a.shape, (lambda nd: lambda bi, si:
                                          (0,) * nd)(a.ndim),
                                memory_space=pltpu.VMEM)
    weights = _rows_weights(s1, b1, wi, pbias, s2, b2, dtype)
    return pallas_call(
        functools.partial(_rows_kernel, eps=eps, dtype=dtype),
        mm_precision=mm_precision_for(dtype),
        grid=(b, splits),
        in_specs=[pl.BlockSpec((1, nb, patch_dim),
                               lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM)] +
                 [sv(a) for a in weights],
        out_specs=pl.BlockSpec((1, nb, dim), lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_EMBED),
    )(rows, *weights)


def _pallas_row_embed_bwd(rows, s1, b1, wi, pbias, s2, b2, do, eps, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, patch_dim = rows.shape
    dim = wi.shape[1]
    nb = _rows_block(n, patch_dim, False)
    splits = n // nb
    sv = lambda a: pl.BlockSpec(a.shape, (lambda nd: lambda bi, si:
                                          (0,) * nd)(a.ndim),
                                memory_space=pltpu.VMEM)
    weights = _rows_weights(s1, b1, wi, pbias, s2, b2, dtype)
    outs = [
        jax.ShapeDtypeStruct((b, n, patch_dim), rows.dtype),   # drows
        jax.ShapeDtypeStruct((patch_dim, dim), jnp.float32),   # dwi
        jax.ShapeDtypeStruct((1, patch_dim), jnp.float32),     # ds1
        jax.ShapeDtypeStruct((1, patch_dim), jnp.float32),     # db1
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # dpbias
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # ds2
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # db2
    ]
    sx_in = pl.BlockSpec((1, nb, patch_dim), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM)
    sdo = pl.BlockSpec((1, nb, dim), lambda bi, si: (bi, si, 0),
                       memory_space=pltpu.VMEM)
    out_specs = [sx_in] + [sv(o) for o in outs[1:]]
    drows, dwi, ds1, db1, dpb, ds2, db2 = pallas_call(
        functools.partial(_rows_bwd_kernel, eps=eps, dtype=dtype),
        mm_precision=mm_precision_for(dtype),
        grid=(b, splits),
        in_specs=[sx_in, sdo] + [sv(a) for a in weights],
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(rows, do.astype(dtype), *weights)
    return (drows, ds1[0].astype(s1.dtype), db1[0].astype(b1.dtype),
            dwi.astype(wi.dtype), dpb[0].astype(pbias.dtype),
            ds2[0].astype(s2.dtype), db2[0].astype(b2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_row_embed(rows, s1, b1, wi, pbias, s2, b2,
                    eps: float = 1e-5, dtype=jnp.bfloat16):
    """to_patch_emb minus the Rearrange, on pre-shuffled patch rows:
    (b, n_tokens, patch_dim) -> LN(patch_dim) -> @wi + pbias -> LN(dim).
    Returns (b, n_tokens, dim) in the compute dtype (ctvit.py:170-175)."""
    _, n, patch_dim = rows.shape
    if _use_pallas_rows(n, patch_dim, wi.shape[1]) and dtype == jnp.bfloat16:
        return _pallas_row_embed(rows, s1, b1, wi, pbias, s2, b2, eps, dtype)
    return _xla_row_embed(rows, s1, b1, wi, pbias, s2, b2, eps, dtype)


def _re_fwd(rows, s1, b1, wi, pbias, s2, b2, eps, dtype):
    out = fused_row_embed(rows, s1, b1, wi, pbias, s2, b2, eps, dtype)
    return out, (rows, s1, b1, wi, pbias, s2, b2)


def _re_bwd(eps, dtype, res, g):
    rows, s1, b1, wi, pbias, s2, b2 = res
    _, n, patch_dim = rows.shape
    if (_use_pallas_rows(n, patch_dim, wi.shape[1])
            and _rows_block(n, patch_dim, False) is not None
            and dtype == jnp.bfloat16):
        return _pallas_row_embed_bwd(rows, s1, b1, wi, pbias, s2, b2, g,
                                     eps, dtype)
    _, vjp = jax.vjp(lambda *a: _xla_row_embed(*a, eps, dtype),
                     rows, s1, b1, wi, pbias, s2, b2)
    return vjp(g)


fused_row_embed.defvjp(_re_fwd, _re_bwd)


def _pe_bwd(pt, p, eps, dtype, res, g):
    video, s1, b1, wi, pbias, s2, b2 = res
    _, F, H, W = video.shape
    if _use_pallas(pt, p, H // p, W // p) and dtype == jnp.bfloat16:
        ds1, db1, dwi, dpb, ds2, db2 = _pallas_patch_embed_bwd(
            video, s1, b1, wi, pbias, s2, b2, g, pt, p, eps, dtype)
        # d(video) via the XLA composition (DCE'd when unused — the video
        # is training data in every production path)
        _, vjp = jax.vjp(lambda v: _xla_patch_embed(
            v, s1, b1, wi, pbias, s2, b2, pt, p, eps, dtype), video)
        dvideo, = vjp(g)
        return dvideo, ds1, db1, dwi, dpb, ds2, db2
    _, vjp = jax.vjp(lambda *a: _xla_patch_embed(*a, pt, p, eps, dtype),
                     video, s1, b1, wi, pbias, s2, b2)
    return vjp(g)


fused_patch_embed.defvjp(_pe_fwd, _pe_bwd)
