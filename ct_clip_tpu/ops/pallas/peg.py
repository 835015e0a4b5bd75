"""Pallas TPU kernel: 3x3x3 depthwise conv (the PEG positional encoding).

The CTViT runs a PEG before every transformer layer: a depthwise 3^3 conv
over the (t, h, w) = 24^3 token grid with causal frame padding (reference
transformer_maskgit/attention.py:56-84).  XLA lowers the depthwise conv with
a channel-major layout, spending more time on the (b, 24, 24, 24, 512)
layout copies than on the conv itself (profiled: ~0.97 ms/call conv fusions
+ ~0.66 ms/call copies + ~1 ms/call weight-grad reduce fusions across the 8
instances = ~20 ms/step).

Forward: on TPU the grouped `lax.conv_general_dilated` (bf16 taps, f32
accumulation, bias + residual fused by XLA) measures 1.87 ms at production
shape vs 4.5 ms for a hand Pallas stencil and 2.7 ms for 27 pointwise
shifted multiply-adds (tools/bench_peg.py) — XLA's depthwise lowering wins,
so the forward uses it under a custom_vjp.

Backward: dx is the correlation with the flipped kernel == another
depthwise conv (of dout, pads complemented) and rides the same fast
grouped-conv lowering — hand-written under the custom_vjp, so XLA's
grouped-conv GRADIENT (silently all-zero kernel-grad when the batch dim is
sharded over a mesh axis — found by the tensor-parallel equivalence test,
and slow even when right) is never emitted.  Only dw (27, c) and dbias
stay in a Pallas stencil kernel: 27 shifted multiply-reduce taps over a
zero-padded VMEM block in the token-native (..., w, c) layout, accumulated
across sequential grid steps (recomputes nothing — the stencil needs only
x and dout).  Off-TPU everything falls back to the pointwise 27-tap form
(identical numerics to flax nn.Conv, trivially partitionable).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ._call import kernels_supported, pallas_call

_VMEM_LIMIT = 64 * 1024 * 1024


def _pads(causal: bool, causal_axis: int = 0) -> Tuple[Tuple[int, int], ...]:
    """Per-spatial-axis pads.  causal_axis selects which grid axis gets the
    causal (2, 0) pad: 0 = frames (the reference default,
    attention.py:56-84); 1 = the h axis — used by the temporal stage's
    native-layout path, where the reference's (b,h,w,t,d)->(b,t,h,w,d)
    memory reinterpretation (ctvit.py:299-303) is equivalent, for cubic
    grids, to rotating the kernel axes and moving the causal pad to h."""
    pads = [(1, 1), (1, 1), (1, 1)]
    if causal:
        pads[causal_axis] = (2, 0)
    return tuple(pads)


def xla_peg_conv(x, kernel, bias, causal: bool, residual: bool = False,
                 causal_axis: int = 0):
    """lax fallback == flax nn.Conv(3x3x3, feature_group_count=dim).

    Written as 27 shifted multiply-adds rather than
    `lax.conv_general_dilated(feature_group_count=dim)`: the grouped-conv
    form hits a GSPMD partitioning bug where the kernel-gradient comes back
    all-zero whenever the batch dim is sharded over a mesh axis (found by
    the tensor-parallel equivalence test; dx/db were unaffected).  The
    pointwise form partitions trivially.  Taps multiply in x.dtype (what
    the MXU-side Pallas kernel also sees) but accumulate in f32 with one
    final rounding, matching both the conv it replaced and the Pallas
    stencil's f32 accumulator.  residual=True returns x + conv(x) (the
    transformer's PEG residual, folded in so the sum rounds once)."""
    t, h, w = x.shape[1:4]
    (pt0, pt1), (ph0, ph1), (pw0, pw1) = _pads(causal, causal_axis)
    xp = jnp.pad(x, ((0, 0), (pt0, pt1), (ph0, ph1), (pw0, pw1), (0, 0)))
    kc = kernel.astype(x.dtype)
    out = x.astype(jnp.float32) if residual else None
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                term = (xp[:, dt:dt + t, dh:dh + h, dw:dw + w, :]
                        * kc[dt, dh, dw, 0]).astype(jnp.float32)
                out = term if out is None else out + term
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def lax_peg_conv(x, kernel, bias, causal: bool, residual: bool = False,
                 causal_axis: int = 0):
    """Grouped-conv forward: bf16 taps, f32 accumulation INSIDE the conv,
    output emitted in x.dtype (the conv always accumulates f32 internally
    on TPU).  The residual/bias adds then run in x.dtype — for bf16 that is
    1-2 ulp more rounding than the pointwise twin's single f32 rounding,
    but emitting bf16 straight from the conv halves the HBM traffic of the
    conv output + the relayout fusion behind it (measured 4.7 ms/step
    across the 16 train-step conv instances; on-chip tests compare at 2e-2
    rel).  Forward only; the custom_vjp below never differentiates it (see
    module docstring for why)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), _pads(causal, causal_axis),
        dimension_numbers=dn, feature_group_count=x.shape[-1])
    if residual:
        out = out + x
    return out + bias.astype(x.dtype)


def _plan(shape, dtype) -> Optional[int]:
    b, t, h, w, c = shape
    if c % 128 or dtype != jnp.bfloat16:
        return None
    if w % 8:
        return None
    cb = 128
    # Peak live set of the dw/db kernel: the f32 zero-padded block (xp),
    # one hoisted f32 kx-slice (xs), two full-size f32 arrays (do + prod
    # temp), and the two bf16 input blocks.
    thw = t * h * w
    need = (t + 2) * (h + 2) * (w + 2) * cb * 4 \
        + (t + 2) * (h + 2) * w * cb * 4 \
        + 2 * thw * cb * 4 + 2 * thw * cb * 2
    if need > _VMEM_LIMIT - 16 * 1024 * 1024:
        return None
    try:
        return cb if kernels_supported() else None
    except Exception:  # noqa: BLE001
        return None


def _taps(causal, causal_axis=0):
    (pt0, _), (ph0, _), (pw0, _) = _pads(causal, causal_axis)
    return pt0, ph0, pw0


def lax_peg_dx(do, kernel, causal: bool, residual: bool = False,
               causal_axis: int = 0):
    """dx = correlation of dout with the flipped kernel == grouped conv of
    dout with pads complemented (fwd pad (a, b) -> bwd pad (2-a, 2-b));
    residual adds the identity term.  Same lowering argument as the
    forward: XLA's depthwise conv beats the hand stencil, and this op is
    hand-written (never differentiated), so the grouped-conv grad bug
    cannot bite.  Emits do.dtype straight from the conv (f32 internal
    accumulation; see lax_peg_conv on the bandwidth/rounding trade)."""
    (pt0, pt1), (ph0, ph1), (pw0, pw1) = _pads(causal, causal_axis)
    kf = kernel[::-1, ::-1, ::-1].astype(do.dtype)
    dn = jax.lax.conv_dimension_numbers(do.shape, kf.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    dx = jax.lax.conv_general_dilated(
        do, kf, (1, 1, 1),
        ((2 - pt0, 2 - pt1), (2 - ph0, 2 - ph1), (2 - pw0, 2 - pw1)),
        dimension_numbers=dn, feature_group_count=do.shape[-1])
    if residual:
        dx = dx + do
    return dx


def _dw_kernel(do_ref, x_ref, dw_ref, db_ref, *, causal, causal_axis):
    from jax.experimental import pallas as pl

    t, h, w, cb = x_ref.shape[1:]
    pt0, ph0, pw0 = _taps(causal, causal_axis)
    do = do_ref[0].astype(jnp.float32)
    xp = jnp.pad(x_ref[0].astype(jnp.float32),
                 ((pt0, 2 - pt0), (ph0, 2 - ph0), (pw0, 2 - pw0), (0, 0)))
    dw_taps = [None] * 27
    for kx in range(3):
        xs = xp[:, :, kx:kx + w, :]
        for kz in range(3):
            for ky in range(3):
                prod = xs[kz:kz + t, ky:ky + h] * do
                dw_taps[(kz * 3 + ky) * 3 + kx] = jnp.sum(
                    prod.reshape(-1, cb), axis=0)
    dw = jnp.stack(dw_taps)                    # (27, cb)
    db = jnp.sum(do.reshape(-1, cb), axis=0)[None, :]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += dw
    db_ref[...] += db


def _pallas_peg_bwd(x, kernel, do, causal, cb, residual=False,
                    causal_axis=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, w, c = x.shape
    # dx rides the fast grouped-conv lowering; only the weight/bias grads
    # (which XLA's grouped-conv grad gets wrong under GSPMD and slow
    # otherwise) stay in the stencil kernel.
    dx = lax_peg_dx(do, kernel.astype(x.dtype), causal, residual,
                    causal_axis)
    # channel blocks OUTER, batch inner: the dw/db accumulator blocks are
    # indexed by channel only, so their visits must be consecutive in the
    # grid iteration for += to be well-defined
    sx = pl.BlockSpec((1, t, h, w, cb), lambda ci, bi: (bi, 0, 0, 0, ci),
                      memory_space=pltpu.VMEM)
    sdw = pl.BlockSpec((27, cb), lambda ci, bi: (0, ci),
                       memory_space=pltpu.VMEM)
    sdb = pl.BlockSpec((1, cb), lambda ci, bi: (0, ci),
                       memory_space=pltpu.VMEM)
    dw, db = pallas_call(
        functools.partial(_dw_kernel, causal=causal,
                          causal_axis=causal_axis),
        grid=(c // cb, b),
        in_specs=[sx, sx],
        out_specs=[sdw, sdb],
        out_shape=[jax.ShapeDtypeStruct((27, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(do, x)
    return dx, dw.reshape(3, 3, 3, 1, c), db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def peg_conv(x, kernel, bias, causal: bool = False, residual: bool = False,
             causal_axis: int = 0):
    """Depthwise 3x3x3 conv + bias over (b, t, h, w, c), causal frame pad.

    kernel: (3, 3, 3, 1, c) (flax Conv DHWIO layout for
    feature_group_count=c); bias: (c,).  residual=True computes
    x + conv(x) in one pass (the transformer PEG residual,
    transformer_maskgit/attention.py:313) — saves a full extra HBM
    read+write of the (b, t, h, w, c) activation per layer."""
    if _plan(x.shape, x.dtype) is not None:
        return lax_peg_conv(x, kernel, bias, causal, residual, causal_axis)
    return xla_peg_conv(x, kernel, bias, causal, residual, causal_axis)


def _peg_fwd(x, kernel, bias, causal, residual, causal_axis):
    return peg_conv(x, kernel, bias, causal, residual, causal_axis), \
        (x, kernel)


def _peg_bwd(causal, residual, causal_axis, res, g):
    x, kernel = res
    cb = _plan(x.shape, x.dtype)
    if cb is not None:
        dx, dw, db = _pallas_peg_bwd(x, kernel, g.astype(x.dtype), causal,
                                     cb, residual, causal_axis)
        return dx, dw.astype(kernel.dtype), db
    _, vjp = jax.vjp(lambda x_, k_, b_: xla_peg_conv(x_, k_, b_, causal,
                                                     residual, causal_axis),
                     x, kernel, jnp.zeros((x.shape[-1],), jnp.float32))
    dx, dw, _ = vjp(g)
    db = jnp.sum(g.astype(jnp.float32), axis=tuple(range(g.ndim - 1)))
    return dx, dw, db


peg_conv.defvjp(_peg_fwd, _peg_bwd)
