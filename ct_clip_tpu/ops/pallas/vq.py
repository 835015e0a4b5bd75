"""Pallas TPU kernels for the cosine-VQ hot paths (ops/vq.py).

Two kernels, both gridded over row blocks of the flattened token stream
(production shape: 110592 tokens x 512 dims against 8192 codes):

  * assignment: per block, l2-normalize rows in VMEM, one (m, 512) x
    (512, 8192) MXU matmul against the resident l2-normalized codebook,
    lane-argmax -> code ids.  The XLA path (`_chunked_argmax_sim`) runs the
    same math as a lax.map over 4096-row tiles whose (4096, 8192) f32
    similarity tiles round-trip HBM — ~5 ms of pure traffic per call.
  * EMA cluster stats: per block, rebuild the one-hot assignment from the
    ids with an iota compare (never materialized in HBM: 3.6 GB at
    production shape) and accumulate bins = sum(onehot) and
    embed_sum = onehot^T @ x_n across the sequential grid steps.

Normalization and accumulation run in f32 throughout.  In training
(exact=True) the similarity and EMA-sum matmuls use hi/lo bf16 operand
splits (3 MXU passes each) whose error is below plain-f32 reassociation
noise — single-pass bf16 operands would flip assignments whenever two
codes sit within bf16 rounding (~4e-3 relative) of a token, not just on
exact ties, and let the EMA codebook trajectory drift from the f32
reference (round-1 advisory); pure inference uses the single fast pass.
Falls back to the XLA path off-TPU or for non-conforming shapes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ._call import kernels_supported, pallas_call

_EPS_L2 = 1e-12
_VMEM_LIMIT = 64 * 1024 * 1024


def _plan(n: int, dim: int, k: int) -> Optional[int]:
    if dim % 128 or k % 128:
        return None
    try:
        if not kernels_supported():
            return None
    except Exception:  # noqa: BLE001
        return None
    for m in (512, 256, 128):
        if n % m:
            continue
        # sim block (m, k) f32 + resident f32 codebook + token-block temps
        if m * k * 4 + k * dim * 4 + 4 * m * dim * 4 \
                <= _VMEM_LIMIT - 16 * 1024 * 1024:
            return m
    return None


def _norm_rows(x_f32):
    sumsq = jnp.sum(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(jnp.maximum(sumsq, _EPS_L2 * _EPS_L2))


def _assign_kernel(x_ref, ebh_ref, ebl_ref, ids_ref, *, exact: bool,
                   raw_bf16: bool = False):
    dot_t = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if raw_bf16:
        # argmax_k cos(x, c_k) is invariant to the positive per-row scale
        # 1/|x|, and a bf16 input stream is exactly representable as the
        # lhs operand — so skip the row normalization entirely and use the
        # raw rows: the products x.c_hi / x.c_lo are then EXACT (no xl
        # term exists), making the 2-pass sim strictly tighter than the
        # 3-pass normalized form it replaces (16.4 -> ~11 ms per batch-8
        # training assignment; the per-row scale the reference applies
        # before its argmax, ctvit.py:188 via vector_quantize_pytorch
        # l2norm, cancels inside the argmax).
        xh = x_ref[...]
        sim = dot_t(xh, ebh_ref[...]) + dot_t(xh, ebl_ref[...]) if exact \
            else dot_t(xh, ebh_ref[...])
        ids_ref[...] = jnp.argmax(sim, axis=-1, keepdims=True
                                  ).astype(jnp.int32)
        return
    xn = _norm_rows(x_ref[...].astype(jnp.float32))
    xh = xn.astype(jnp.bfloat16)
    if exact:
        # f32-equivalent similarities in 3 bf16 MXU passes (hi/lo operand
        # split; the dropped lo*lo term is <= 2^-16 relative — below the
        # reassociation noise a plain f32 matmul carries itself, so the
        # argmax matches the f32 reference up to exact ties).  Mosaic has
        # no Precision.HIGH lowering and HIGHEST's 6 passes buy nothing
        # the argmax can see at double the cost (28 -> 14 ms per batch-8
        # training assignment).
        xl = (xn - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        sim = dot_t(xh, ebh_ref[...]) + dot_t(xh, ebl_ref[...]) \
            + dot_t(xl, ebh_ref[...])
    else:
        # one bf16 pass (~4e-3 relative); measured ~0.5% of assignments
        # flip on random tokens, all between codes whose similarities tie
        # within that margin — the fast pure-inference mode
        sim = dot_t(xh, ebh_ref[...])
    ids_ref[...] = jnp.argmax(sim, axis=-1, keepdims=True).astype(jnp.int32)


def pallas_assign(flat: jnp.ndarray, embed_n: jnp.ndarray,
                  m: int, exact: bool = True) -> jnp.ndarray:
    """argmax_k l2norm(flat) @ embed_n.T; flat (n, dim) raw (un-normalized),
    embed_n (k, dim) pre-l2-normalized.  Returns (n,) int32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, dim = flat.shape
    k = embed_n.shape[0]
    # codebook hi/lo bf16 split hoisted out of the kernel (one cheap XLA
    # pass per call instead of per grid step)
    ebf = embed_n.astype(jnp.float32)
    eb_hi = ebf.astype(jnp.bfloat16)
    eb_lo = (ebf - eb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sx = pl.BlockSpec((m, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    se = pl.BlockSpec((k, dim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    si = pl.BlockSpec((m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ids = pallas_call(
        functools.partial(_assign_kernel, exact=exact,
                          raw_bf16=flat.dtype == jnp.bfloat16),
        grid=(n // m,),
        in_specs=[sx, se, se], out_specs=si,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(flat, eb_hi, eb_lo)
    return ids[:, 0]


def _stats_kernel(x_ref, ids_ref, bins_ref, esum_ref, *, k):
    from jax.experimental import pallas as pl

    xn = _norm_rows(x_ref[...].astype(jnp.float32))
    m = xn.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
    onehot = (ids_ref[...] == lane).astype(jnp.float32)
    bins = jnp.sum(onehot, axis=0, keepdims=True)
    # f32-exact EMA sums in 2 bf16 MXU passes instead of HIGHEST's 6: the
    # one-hot lhs is exact in bf16, so splitting xn into bf16 hi/lo parts
    # (2 x 8 mantissa bits) makes every partial product carry all the
    # information the bf16 model stream has — x arrives as the bf16
    # residual stream, so xn's bits beyond hi+lo are normalization-division
    # residuals <= 2^-16 relative, below the f32 accumulation's own
    # reassociation noise over 1e5 terms (same argument as the assignment
    # kernel's dropped lo*lo term).  Measured 1.2e-7 rel vs HIGHEST;
    # 37 -> 23 -> ~18 ms per batch-8 stats at production shape.
    oh_b = onehot.astype(jnp.bfloat16)
    h1 = xn.astype(jnp.bfloat16)
    h2 = (xn - h1.astype(jnp.float32)).astype(jnp.bfloat16)
    esum = None
    for hp in (h1, h2):
        part = jax.lax.dot_general(oh_b, hp, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
        esum = part if esum is None else esum + part

    @pl.when(pl.program_id(0) == 0)
    def _():
        bins_ref[...] = jnp.zeros_like(bins_ref)
        esum_ref[...] = jnp.zeros_like(esum_ref)

    bins_ref[...] += bins
    esum_ref[...] += esum


def pallas_cluster_stats(flat: jnp.ndarray, ids: jnp.ndarray, k: int,
                         m: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(bins (k,), embed_sum (k, dim)) of l2norm(flat) grouped by ids."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, dim = flat.shape
    m = min(m, 256) if n % 256 == 0 else m  # cap onehot block at 256 rows
    sx = pl.BlockSpec((m, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    si = pl.BlockSpec((m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sb = pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    se = pl.BlockSpec((k, dim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bins, esum = pallas_call(
        functools.partial(_stats_kernel, k=k), grid=(n // m,),
        in_specs=[sx, si],
        out_specs=[sb, se],
        out_shape=[jax.ShapeDtypeStruct((1, k), jnp.float32),
                   jax.ShapeDtypeStruct((k, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(flat, ids[:, None].astype(jnp.int32))
    return bins[0], esum
