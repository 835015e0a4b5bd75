"""Pallas TPU kernel: fused QK-norm attention sublayer for tiny sequences.

Why: the CTViT temporal stage runs attention over (b*h*w=4608, n=24, 512)
with 8 heads of 32 dims (reference transformer_maskgit/attention.py:88-181
called from ctvit.py:301-303).  Neither standard XLA layout works well here:

  * fused-QKV + (b, n, h, dh) -> (b, h, n, dh) relayout: the relayout and the
    per-head (24, 32) score matmuls dominate — 11.6 ms per layer call at the
    production shape on v5e;
  * per-head projections (no relayout, ops/attention.py small-seq path):
    every projection matmul has a 32-wide minor dim, which pads to 128 MXU
    lanes (4x waste) and each of the 24 small HLO ops round-trips the
    (110592, *) activations through HBM — 8.0 ms per layer call.

This kernel fuses the whole sublayer — gamma-LN, q/kv projections, per-head
l2 QK-norm with learned scales, softmax attention, head merge, output
projection — into one pass: x is read from HBM once and the output written
once; all intermediates live in VMEM.  Two tricks make the tiny-head shapes
MXU-friendly:

  * sequence packing: g sequences of n tokens are stacked into one
    (g*n, dim) block, so every matmul has a large sublane extent; attention
    stays correct via a block-diagonal mask (token i attends j iff
    i//n == j//n) added to the (g*n, g*n) score matrix;
  * indicator-matmul head norms: per-head sum-of-squares is computed for all
    heads at once as (q*q) @ H with H[d, h] = [d//dh == h], and broadcast
    back with H^T — no (.., h, dh) reshapes or 32-wide lane reductions.

Measured on v5e at the production temporal shape (4608, 24, 512; 8 heads x
32): 8.0 ms -> 0.93 ms per layer call (8.6x; ~2.3x over the f32-score
speed-of-light for the projections alone).

Numerics match ops/attention.QKNormAttention's small-sequence path: bf16
matmuls with f32 accumulation, f32 LN statistics and softmax.  `kv` comes
from the PRE-norm input and `q` from the post-norm input (parity with the
reference, attention.py:139-143).  Falls back to identical-math XLA off-TPU
or for shapes that don't fit (tests/test_pallas.py).  The custom VJP
differentiates the XLA reference (flash-style recompute), so training uses
the fast forward everywhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ._call import kernels_supported, mm_precision_for, pallas_call

NEG_INF = -3.4028234663852886e38
_VMEM_BUDGET = 10 * 1024 * 1024
_EPS_L2 = 1e-12


def _xla_small_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout, *,
                      heads, dim_head, scale, dtype, residual=False):
    """XLA reference; same math as the Pallas kernel (and as the per-head
    loop in ops/attention.py, batched over heads)."""
    from ..norms import l2norm, layer_norm

    h, dh = heads, dim_head
    xn = layer_norm(x, gamma).astype(dtype)
    xc = x.astype(dtype)
    q = (xn @ wq.astype(dtype)).reshape(*x.shape[:-1], h, dh)
    kv = xc @ wkv.astype(dtype)
    k = kv[..., : h * dh].reshape(*x.shape[:-1], h, dh)
    v = kv[..., h * dh:].reshape(*x.shape[:-1], h, dh)
    q = l2norm(q) * q_scale.astype(q.dtype) * scale
    k = l2norm(k) * k_scale.astype(k.dtype)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v)
    out = out.reshape(*x.shape[:-1], h * dh)
    out = jnp.dot(out, wout.astype(dtype), preferred_element_type=jnp.float32)
    if residual:  # fold the transformer's `attn(x) + x` (one rounding)
        out = out + x.astype(jnp.float32)
    return out.astype(dtype)


def _kernel(x_ref, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref, wout_ref,
            mask_ref, ones_ref, o_ref, *, g, n, heads, dim_head,
            scale, dtype, residual):
    h, dh = heads, dim_head
    r = g * n
    dim = x_ref.shape[-1]
    x = x_ref[...].reshape(r, dim)

    # gamma-only LN in f32 (ops/norms.py layer_norm, eps 1e-5)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc0 = xf - mean
    var = jnp.mean(xc0 * xc0, axis=-1, keepdims=True)
    xn = (xc0 * jax.lax.rsqrt(var + 1e-5) * gamma_ref[...]).astype(dtype)
    xc = x.astype(dtype)

    q = jnp.dot(xn, wq_ref[...], preferred_element_type=jnp.float32
                ).astype(dtype)
    kv = jnp.dot(xc, wkv_ref[...], preferred_element_type=jnp.float32
                 ).astype(dtype)
    k = kv[:, : h * dh]
    v = kv[:, h * dh:]

    # per-head l2 norms for all heads at once: (q*q) @ H, H[d, j] = [d//dh == j]
    lane = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 0) // dh
    head = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 1)
    hmat = (lane == head).astype(jnp.float32)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qss = jnp.dot(qf * qf, hmat, preferred_element_type=jnp.float32)
    kss = jnp.dot(kf * kf, hmat, preferred_element_type=jnp.float32)
    qr = jax.lax.rsqrt(jnp.maximum(qss, _EPS_L2 * _EPS_L2))
    kr = jax.lax.rsqrt(jnp.maximum(kss, _EPS_L2 * _EPS_L2))
    qfac = jnp.dot(qr, hmat.T, preferred_element_type=jnp.float32)
    kfac = jnp.dot(kr, hmat.T, preferred_element_type=jnp.float32)
    qn = (qf * qfac * qs_ref[...]).astype(dtype)   # qs pre-tiled, incl. *scale
    kn = (kf * kfac * ks_ref[...]).astype(dtype)

    # Masked row-max softmax.  The block-diagonal sequence mask is folded in
    # as an additive -BIG before the row max, so (a) the shift is the max
    # over *allowed* columns only — exp of an in-block entry can never
    # underflow to an all-zero row no matter how large the learned QK-norm
    # scales grow (round-1 advisory: the old constant Cauchy-Schwarz shift
    # silently zeroed rows once max|qs|*max|ks| drifted above ~5), and (b)
    # masked entries sit at -BIG - rowmax -> exp == 0 exactly, so no
    # separate mask multiply is needed.  The softmax denominator comes off
    # the MXU as E @ ones, and the 1/denom renormalization happens on the
    # small (r, dh) output instead of the (r, r) weights.
    negmask = (mask_ref[...] - 1.0) * 3.0e38  # 0 in-block, -BIG out
    outs = []
    for hh in range(h):
        sl = slice(hh * dh, (hh + 1) * dh)
        sim = jax.lax.dot_general(qn[:, sl], kn[:, sl],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sim = sim + negmask
        rowmax = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - rowmax)
        denom = jnp.dot(e, ones_ref[...],
                        preferred_element_type=jnp.float32)[:, :1]
        pv = jnp.dot(e.astype(dtype), v[:, sl],
                     preferred_element_type=jnp.float32)
        outs.append((pv / denom).astype(dtype))
    merged = jnp.concatenate(outs, axis=-1)
    out = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
    if residual:  # x block already in VMEM (xf): saves the XLA `+ x` pass
        out = out + xf
    o_ref[...] = out.astype(o_ref.dtype).reshape(o_ref.shape)


def _vmem_need(g, n, dim, heads, dim_head):
    r = g * n
    hd = heads * dim_head
    io = 2 * (g * n * dim * 2) * 2          # x in + out, double-buffered
    weights = (dim * hd + dim * 2 * hd + hd * dim) * 2
    acts = r * dim * 4 * 2 + r * hd * 2 * 4  # LN f32 temps + q/kv
    scores = 3 * r * r * 4                   # sim + e + resident mask (f32)
    return io + weights + acts + scores


def _plan(b, n, dim, heads, dim_head) -> Optional[int]:
    if n >= 128 or n % 8 or dim % 128 or (heads * dim_head) % 128:
        return None
    if dim_head % 8 or (2 * heads * dim_head) % 128:
        return None
    try:
        if not kernels_supported():
            return None
    except Exception:  # noqa: BLE001
        return None
    # g trades score/PV waste (the masked (g*n, g*n) block-diagonal matmul
    # computes g x the useful FLOPs) against projection MXU utilization
    # (M = g*n rows) — on-chip sweep at the production temporal shape
    # (4608, 24, 512): g=16 ~= g=8 < g=4, and beats g=32 in the backward
    # by ~30% (tools/bench_small_attn.py)
    for g in (16, 8, 32, 4, 2, 1):
        if b % g == 0 and (g * n) % 8 == 0 \
                and _vmem_need(g, n, dim, heads, dim_head) <= _VMEM_BUDGET:
            return g
    return None


def _seq_mask(g: int, n: int, grid_layout: bool) -> jnp.ndarray:
    """Block-diagonal sequence mask over the packed (g*n) rows.  Row order
    is sequence-major ((seq, t): row = seq*n + t) for the transposed
    (b, n, dim) layout, and t-major ((t, seq): row = t*g + seq) for the
    native grid layout — only the row->sequence map changes, the kernel
    math is identical."""
    r = g * n
    i = jnp.arange(r, dtype=jnp.int32)
    seq = (i % g) if grid_layout else (i // n)
    return (seq[:, None] == seq[None, :]).astype(jnp.float32)


def _pallas_small_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout, g, *,
                         heads, dim_head, scale, dtype, residual=False,
                         grid_layout=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if grid_layout:
        b, n, S, dim = x.shape
    else:
        b, n, dim = x.shape
    dim_out = wout.shape[-1]
    cdt = dtype

    def full(a):
        return pl.BlockSpec(a.shape, (lambda nd: lambda *_i: (0,) * nd)(
            a.ndim), memory_space=pltpu.VMEM)

    # vectors go in as (1, d) 2-D blocks; scales pre-tiled across heads
    # (q_scale also folds in the fixed *8 logit scale)
    r = g * n
    mask = _seq_mask(g, n, grid_layout)
    weights = (gamma.astype(jnp.float32)[None, :], wq.astype(cdt),
               wkv.astype(cdt),
               (jnp.tile(q_scale.astype(jnp.float32), heads) * scale)[None, :],
               jnp.tile(k_scale.astype(jnp.float32), heads)[None, :],
               wout.astype(cdt), mask, jnp.ones((r, 8), jnp.float32))
    if grid_layout:
        # native (b, n, S, dim) grid: each block is g sequences read as 24
        # strided row-groups — the (b,t,h,w,d)->(b,h,w,t,d) transpose the
        # sequence-major layout needs never exists
        sx = pl.BlockSpec((1, n, g, dim), lambda bi, si: (bi, 0, si, 0),
                          memory_space=pltpu.VMEM)
        so = pl.BlockSpec((1, n, g, dim_out), lambda bi, si: (bi, 0, si, 0),
                          memory_space=pltpu.VMEM)
        grid = (b, S // g)
        out_shape = jax.ShapeDtypeStruct((b, n, S, dim_out), cdt)
    else:
        sx = pl.BlockSpec((g, n, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
        so = pl.BlockSpec((g, n, dim_out), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
        grid = (b // g,)
        out_shape = jax.ShapeDtypeStruct((b, n, dim_out), cdt)
    return pallas_call(
        functools.partial(_kernel, g=g, n=n, heads=heads, dim_head=dim_head,
                          scale=scale, dtype=cdt, residual=residual),
        mm_precision=mm_precision_for(cdt),
        grid=grid,
        in_specs=[sx] + [full(w) for w in weights],
        out_specs=so,
        out_shape=out_shape)(x, *weights)


def _bwd_kernel(x_ref, do_ref, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref,
                wout_ref, mask_ref, ones_ref,
                dx_ref, dwq_ref, dwkv_ref, dwout_ref, dgamma_ref, dqs_ref,
                dks_ref, *, g, n, heads, dim_head, dtype, residual,
                grid2d=False):
    """Full sublayer backward: recompute the forward in VMEM (flash-style),
    emit dx per block and accumulate the weight grads across the sequential
    grid steps.  Math follows the custom-VJP chain of _xla_small_qknorm;
    large (rows x dim) matmuls run with bf16 inputs + f32 accumulation, the
    tiny (r, r) attention matmuls in f32."""
    from jax.experimental import pallas as pl

    h, dh = heads, dim_head
    r = g * n
    dim = x_ref.shape[-1]
    hd = h * dh
    x = x_ref[...].reshape(r, dim)
    do = do_ref[...].reshape(r, dim).astype(jnp.float32)

    # ---- forward recompute ----
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc0 = xf - mean
    var = jnp.mean(xc0 * xc0, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = xc0 * rstd
    gammaf = gamma_ref[...]
    xn = (xhat * gammaf).astype(dtype)
    xc = x.astype(dtype)
    q = jnp.dot(xn, wq_ref[...], preferred_element_type=jnp.float32)
    kv = jnp.dot(xc, wkv_ref[...], preferred_element_type=jnp.float32)
    k = kv[:, :hd]
    v = kv[:, hd:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0) // dh
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    hmat = (lane == head).astype(jnp.float32)
    qss = jnp.dot(q * q, hmat, preferred_element_type=jnp.float32)
    kss = jnp.dot(k * k, hmat, preferred_element_type=jnp.float32)
    qr = jax.lax.rsqrt(jnp.maximum(qss, _EPS_L2 * _EPS_L2))
    kr = jax.lax.rsqrt(jnp.maximum(kss, _EPS_L2 * _EPS_L2))
    qfac = jnp.dot(qr, hmat.T, preferred_element_type=jnp.float32)
    kfac = jnp.dot(kr, hmat.T, preferred_element_type=jnp.float32)
    qhat = q * qfac
    khat = k * kfac
    sq = qs_ref[...]  # tiled (1, hd), includes *scale
    sk = ks_ref[...]
    qn = qhat * sq
    kn = khat * sk
    negmask = (mask_ref[...] - 1.0) * 3.0e38  # 0 in-block, -BIG out

    # ---- backward ----
    dmerged = jax.lax.dot_general(do, wout_ref[...].astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    merged_parts = []
    dq_parts, dk_parts, dv_parts = [], [], []
    for hh in range(h):
        sl = slice(hh * dh, (hh + 1) * dh)
        qn_h, kn_h, v_h = qn[:, sl], kn[:, sl], v[:, sl]
        sim = jax.lax.dot_general(qn_h, kn_h, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sim = sim + negmask
        rowmax = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - rowmax)
        denom = jnp.dot(e, ones_ref[...],
                        preferred_element_type=jnp.float32)[:, :1]
        p = e / denom
        merged_parts.append(jnp.dot(p, v_h,
                                    preferred_element_type=jnp.float32))
        dout_h = dmerged[:, sl]
        dv_parts.append(jax.lax.dot_general(
            p, dout_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(dout_h, v_h, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rs = jnp.dot(p * dp, ones_ref[...],
                     preferred_element_type=jnp.float32)[:, :1]
        dsim = p * (dp - rs)
        dqn = jnp.dot(dsim, kn_h, preferred_element_type=jnp.float32)
        dkn = jax.lax.dot_general(dsim, qn_h, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_parts.append(dqn)
        dk_parts.append(dkn)
    merged = jnp.concatenate(merged_parts, axis=-1)
    dqn_all = jnp.concatenate(dq_parts, axis=-1)
    dkn_all = jnp.concatenate(dk_parts, axis=-1)
    dv = jnp.concatenate(dv_parts, axis=-1)

    # qn = qhat * sq  ->  dqhat, d(sq); qhat = q * qfac (per-head l2norm)
    dqhat = dqn_all * sq
    dkhat = dkn_all * sk
    dqs_tile = jnp.sum(dqn_all * qhat, axis=0, keepdims=True)
    dks_tile = jnp.sum(dkn_all * khat, axis=0, keepdims=True)
    # du = qfac * (dqhat - qhat * <qhat, dqhat>_head); head dot via hmat
    qdot = jnp.dot(jnp.dot(qhat * dqhat, hmat,
                           preferred_element_type=jnp.float32), hmat.T,
                   preferred_element_type=jnp.float32)
    kdot = jnp.dot(jnp.dot(khat * dkhat, hmat,
                           preferred_element_type=jnp.float32), hmat.T,
                   preferred_element_type=jnp.float32)
    dq = qfac * (dqhat - qhat * qdot)
    dk = kfac * (dkhat - khat * kdot)

    dqb = dq.astype(dtype)
    dkv = jnp.concatenate([dk, dv], axis=-1).astype(dtype)
    dxn = jax.lax.dot_general(dqb, wq_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_kv = jax.lax.dot_general(dkv, wkv_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # LN backward (gamma-only): dxhat = dxn * gamma
    dxhat = dxn * gammaf
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)

    dx = dx_ln + dx_kv
    if residual:  # d(x + attn(x))/dx identity term
        dx = dx + do
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(dx_ref.shape)

    dob = do.astype(dtype)
    xnb = xn
    dwq = jax.lax.dot_general(xnb, dqb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwkv = jax.lax.dot_general(xc, dkv, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dwout = jax.lax.dot_general(merged.astype(dtype), dob,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dxn * xhat, axis=0, keepdims=True)

    # Zero the accumulators on the FIRST grid step only.  The grid-layout
    # variant runs a 2-D (b, S//g) grid: program_id(0)==0 alone would fire
    # on every si step of batch row 0, wiping prior contributions.
    first = pl.program_id(0) == 0
    if grid2d:
        first = jnp.logical_and(first, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwkv_ref[...] = jnp.zeros_like(dwkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dqs_ref[...] = jnp.zeros_like(dqs_ref)
        dks_ref[...] = jnp.zeros_like(dks_ref)

    dwq_ref[...] += dwq
    dwkv_ref[...] += dwkv
    dwout_ref[...] += dwout
    dgamma_ref[...] += dgamma
    dqs_ref[...] += dqs_tile
    dks_ref[...] += dks_tile


# Backward runs with the Mosaic scoped-vmem limit raised above the 16 MiB
# default (physical VMEM on v4/v5e is 128 MiB): the weight-grad accumulators
# count twice (output buffer + stack temp around the `+=`), and larger
# sequence-packing factors g mean fewer grid steps and fatter matmuls.
_VMEM_LIMIT_BWD = 64 * 1024 * 1024


def _vmem_need_bwd(g, n, dim, heads, dim_head):
    r = g * n
    hd = heads * dim_head
    io = 2 * 2 * (g * n * dim * 2) * 2       # x, do in + dx out, dbl-buffered
    weights = (dim * hd + dim * 2 * hd + hd * dim) * 2
    wgrads = 2 * (2 * dim * hd + 2 * dim * hd) * 4   # buffers + stack temps
    acts = 16 * r * dim * 4                  # f32 activation/grad temps
    scores = 8 * r * r * 4                   # sim/e/p/dp/dsim + mask + temps
    return io + weights + wgrads + acts + scores


def _plan_bwd(b, n, dim, heads, dim_head) -> Optional[int]:
    if _plan(b, n, dim, heads, dim_head) is None:
        return None
    # see _plan: the backward recomputes the score matrix, so block-diag
    # waste bites ~2.5x harder — g=16 measured fastest on-chip
    for g in (16, 8, 32, 4, 2, 1):
        if b % g == 0 and (g * n) % 8 == 0 \
                and _vmem_need_bwd(g, n, dim, heads, dim_head) \
                <= _VMEM_LIMIT_BWD - 16 * 1024 * 1024:
            return g
    return None


def _pallas_small_qknorm_bwd(x, gamma, wq, wkv, q_scale, k_scale, wout, do,
                             g, *, heads, dim_head, scale, dtype,
                             residual=False, grid_layout=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if grid_layout:
        b, n, S, dim = x.shape
    else:
        b, n, dim = x.shape
    hd = heads * dim_head
    r = g * n
    cdt = dtype
    mask = _seq_mask(g, n, grid_layout)
    qs_t = (jnp.tile(q_scale.astype(jnp.float32), heads) * scale)[None, :]
    ks_t = jnp.tile(k_scale.astype(jnp.float32), heads)[None, :]

    def full(a):
        return pl.BlockSpec(a.shape, (lambda nd: lambda *_i: (0,) * nd)(
            a.ndim), memory_space=pltpu.VMEM)

    weights = (gamma.astype(jnp.float32)[None, :], wq.astype(cdt),
               wkv.astype(cdt), qs_t, ks_t, wout.astype(cdt), mask,
               jnp.ones((r, 8), jnp.float32))
    if grid_layout:
        sx = pl.BlockSpec((1, n, g, dim), lambda bi, si: (bi, 0, si, 0),
                          memory_space=pltpu.VMEM)
        grid = (b, S // g)
        dx_shape = jax.ShapeDtypeStruct((b, n, S, dim), x.dtype)
    else:
        sx = pl.BlockSpec((g, n, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
        grid = (b // g,)
        dx_shape = jax.ShapeDtypeStruct((b, n, dim), x.dtype)
    outs = [
        dx_shape,                                            # dx
        jax.ShapeDtypeStruct((dim, hd), jnp.float32),        # dwq
        jax.ShapeDtypeStruct((dim, 2 * hd), jnp.float32),    # dwkv
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),        # dwout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),         # dgamma
        jax.ShapeDtypeStruct((1, hd), jnp.float32),          # dqs (tiled)
        jax.ShapeDtypeStruct((1, hd), jnp.float32),          # dks (tiled)
    ]
    out_specs = [sx] + [
        pl.BlockSpec(o.shape, (lambda nd: lambda *_i: (0,) * nd)(
            len(o.shape)), memory_space=pltpu.VMEM) for o in outs[1:]]
    dx, dwq, dwkv, dwout, dgamma, dqs_t, dks_t = pallas_call(
        functools.partial(_bwd_kernel, g=g, n=n, heads=heads,
                          dim_head=dim_head, dtype=cdt, residual=residual,
                          grid2d=grid_layout),
        mm_precision=mm_precision_for(cdt),
        grid=grid,
        in_specs=[sx, sx] + [full(w) for w in weights],
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD))(x, do, *weights)

    # untile the per-head scale grads; q grads fold back the fixed *scale
    dqs = (dqs_t.reshape(heads, dim_head).sum(0) * scale).astype(q_scale.dtype)
    dks = dks_t.reshape(heads, dim_head).sum(0).astype(k_scale.dtype)
    return (dx, dgamma[0].astype(gamma.dtype), dwq.astype(wq.dtype),
            dwkv.astype(wkv.dtype), dqs, dks, dwout.astype(wout.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_small_qknorm_attention(x, gamma, wq, wkv, q_scale, k_scale, wout,
                                 heads: int, dim_head: int, scale: float,
                                 dtype=jnp.bfloat16, residual: bool = False):
    """Fused LN -> q/kv proj -> per-head QK-l2norm -> attention -> out proj
    for small sequence lengths (the CTViT temporal stage).

    x: (b, n, dim) PRE-norm residual stream (q uses LN(x), k/v use raw x —
    reference attention.py:139-143).  Returns (b, n, wout.shape[-1]) in the
    compute dtype.  residual=True folds the transformer's `attn(x) + x`
    into the same pass (f32 accumulate, one rounding)."""
    g = _plan(x.shape[0], x.shape[1], x.shape[2], heads, dim_head)
    if g is not None:
        return _pallas_small_qknorm(x, gamma, wq, wkv, q_scale, k_scale,
                                    wout, g, heads=heads, dim_head=dim_head,
                                    scale=scale, dtype=dtype,
                                    residual=residual)
    return _xla_small_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout,
                             heads=heads, dim_head=dim_head, scale=scale,
                             dtype=dtype, residual=residual)


def _fwd(x, gamma, wq, wkv, q_scale, k_scale, wout, heads, dim_head, scale,
         dtype, residual):
    out = fused_small_qknorm_attention(x, gamma, wq, wkv, q_scale, k_scale,
                                       wout, heads, dim_head, scale, dtype,
                                       residual)
    return out, (x, gamma, wq, wkv, q_scale, k_scale, wout)


def _bwd(heads, dim_head, scale, dtype, residual, res, g):
    x, gamma, wq, wkv, q_scale, k_scale, wout = res
    gb = _plan_bwd(x.shape[0], x.shape[1], x.shape[2], heads, dim_head)
    if gb is not None:
        return _pallas_small_qknorm_bwd(x, gamma, wq, wkv, q_scale, k_scale,
                                        wout, g.astype(x.dtype), gb,
                                        heads=heads, dim_head=dim_head,
                                        scale=scale, dtype=dtype,
                                        residual=residual)
    _, vjp = jax.vjp(
        lambda *a: _xla_small_qknorm(*a, heads=heads, dim_head=dim_head,
                                     scale=scale, dtype=dtype,
                                     residual=residual),
        x, gamma, wq, wkv, q_scale, k_scale, wout)
    return vjp(g)


fused_small_qknorm_attention.defvjp(_fwd, _bwd)


# -------------------------------------------- native grid-layout variant
# The temporal stage's sequences are the t-columns of the (b, t, h*w, dim)
# token grid.  The sequence-major form above needs the caller to transpose
# to (b*h*w, t, dim) and back — two full (8, 24, 576, 512) layout copies
# per encode at production shape (~5 ms/step profiled).  This variant reads
# g t-columns per block STRAIGHT from the grid layout; only the row ->
# sequence map of the packing mask changes (see _seq_mask), the kernel body
# is shared.

def _plan_grid(b, n, S, dim, heads, dim_head) -> Optional[int]:
    if n >= 128 or n % 8 or dim % 128 or (heads * dim_head) % 128:
        return None
    if dim_head % 8 or (2 * heads * dim_head) % 128:
        return None
    try:
        if not kernels_supported():
            return None
    except Exception:  # noqa: BLE001
        return None
    # grid-layout blocks are (1, n, g, dim): g is the SECOND-MINOR dim of
    # the block, so it must be sublane-aligned itself (g % 8) or span the
    # whole S axis — (g * n) % 8 alone lowers fine sequence-major but is
    # rejected by Mosaic here (found by an on-chip g-sweep)
    for g in (16, 8, 32, 4, 2, 1):
        if S % g == 0 and (g % 8 == 0 or g == S) \
                and _vmem_need(g, n, dim, heads, dim_head) <= _VMEM_BUDGET:
            return g
    return None


def _plan_grid_bwd(b, n, S, dim, heads, dim_head) -> Optional[int]:
    if _plan_grid(b, n, S, dim, heads, dim_head) is None:
        return None
    for g in (16, 8, 32, 4, 2, 1):
        if S % g == 0 and (g % 8 == 0 or g == S) \
                and _vmem_need_bwd(g, n, dim, heads, dim_head) \
                <= _VMEM_LIMIT_BWD - 16 * 1024 * 1024:
            return g
    return None


def _xla_grid_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout, *,
                     heads, dim_head, scale, dtype, residual=False):
    """Fallback: transpose to sequence-major, run the reference math,
    transpose back (identical numerics; used off-TPU)."""
    b, n, S, dim = x.shape
    xs = x.transpose(0, 2, 1, 3).reshape(b * S, n, dim)
    out = _xla_small_qknorm(xs, gamma, wq, wkv, q_scale, k_scale, wout,
                            heads=heads, dim_head=dim_head, scale=scale,
                            dtype=dtype, residual=residual)
    return out.reshape(b, S, n, -1).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_small_qknorm_attention_grid(x, gamma, wq, wkv, q_scale, k_scale,
                                      wout, heads: int, dim_head: int,
                                      scale: float, dtype=jnp.bfloat16,
                                      residual: bool = False):
    """fused_small_qknorm_attention on the NATIVE (b, n, S, dim) grid:
    sequences run along axis 1 (n tokens each), S of them side by side.
    Returns (b, n, S, dim_out); no sequence-major tensor ever exists."""
    b, n, S, dim = x.shape
    g = _plan_grid(b, n, S, dim, heads, dim_head)
    if g is not None:
        return _pallas_small_qknorm(x, gamma, wq, wkv, q_scale, k_scale,
                                    wout, g, heads=heads, dim_head=dim_head,
                                    scale=scale, dtype=dtype,
                                    residual=residual, grid_layout=True)
    return _xla_grid_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout,
                            heads=heads, dim_head=dim_head, scale=scale,
                            dtype=dtype, residual=residual)


def _fwd_grid(x, gamma, wq, wkv, q_scale, k_scale, wout, heads, dim_head,
              scale, dtype, residual):
    out = fused_small_qknorm_attention_grid(
        x, gamma, wq, wkv, q_scale, k_scale, wout, heads, dim_head, scale,
        dtype, residual)
    return out, (x, gamma, wq, wkv, q_scale, k_scale, wout)


def _bwd_grid(heads, dim_head, scale, dtype, residual, res, g):
    x, gamma, wq, wkv, q_scale, k_scale, wout = res
    b, n, S, dim = x.shape
    gb = _plan_grid_bwd(b, n, S, dim, heads, dim_head)
    if gb is not None:
        return _pallas_small_qknorm_bwd(x, gamma, wq, wkv, q_scale, k_scale,
                                        wout, g.astype(x.dtype), gb,
                                        heads=heads, dim_head=dim_head,
                                        scale=scale, dtype=dtype,
                                        residual=residual, grid_layout=True)
    _, vjp = jax.vjp(
        lambda *a: _xla_grid_qknorm(*a, heads=heads, dim_head=dim_head,
                                    scale=scale, dtype=dtype,
                                    residual=residual),
        x, gamma, wq, wkv, q_scale, k_scale, wout)
    return vjp(g)


fused_small_qknorm_attention_grid.defvjp(_fwd_grid, _bwd_grid)
