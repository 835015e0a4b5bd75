"""Pallas TPU kernel: fused softmax(q @ k^T + bias) @ v attention.

Why: the CTViT spatial stage runs attention over (b*24, heads=8, 576, 32).
Plain XLA materializes the f32 score tensor in HBM — (192, 8, 576, 576) f32
is ~2 GB written + read per layer at production shape (b=8), which makes the
encoder HBM-bound.  This kernel keeps the scores in VMEM, so HBM traffic
drops to the q/k/v/out tensors plus one bias fetch per head.

Measured on v5e at the production spatial-attention shape (192, 8, 576, 32):
XLA 19.8 ms -> 6.6 ms per layer call (3.0x), max |diff| ~2 bf16 ulps.

Design notes (all measured, not guessed):
  * k is pre-transposed in XLA to (b, h, d, n) so the score matmul contracts
    lanes-of-q against sublanes-of-kT (the MXU-native orientation; an
    in-kernel lanes x lanes contraction forces a slow Mosaic relayout).
  * grid is (h, b//g) with batch innermost: the (n, n) bias block's index map
    depends only on the head, so Mosaic skips its DMA on consecutive batch
    steps — the bias is fetched h times total, not h*b times.
  * g batch rows per grid step amortizes per-step DMA setup; g is capped by
    the ~16 MB/core VMEM (g * (qkv + scores) + bias, double-buffered).

Semantics match ops/attention._sdpa for the non-causal, unmasked case
(f32 score accumulation + f32 softmax): softmax(qk^T + bias)v with any
scaling (QK-norm, *8) already applied to q.  `fused_attention` carries a
custom VJP whose backward differentiates the XLA reference (flash-style
recompute).  Falls back to identical-numerics XLA off-TPU or for shapes that
don't fit (tests/test_pallas.py covers both paths).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ._call import (dot_precision, interpret_enabled, kernels_supported,
                    pallas_call)

_VMEM_BUDGET = 12 * 1024 * 1024  # headroom under the ~16 MB/core scoped limit


def _xla_attention(q, k, v, bias, key_bias=None):
    """Reference XLA path; numerics-identical to the kernel."""
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)
    if key_bias is not None:  # additive per-key bias (b, n), e.g. a pad mask
        sim = sim + key_bias.astype(jnp.float32)[:, None, None, :]
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def _vmem_need(g, n, d, itemsize, with_bias):
    d_pad = ((d + 127) // 128) * 128
    # q, v, out lane-padded to 128; kT block is (d, n) — unpadded for n >= 128
    per_step = g * (3 * n * d_pad * itemsize + d * n * itemsize + n * n * 4)
    bias_cost = n * n * 4 if with_bias else 0
    return 2 * per_step + bias_cost  # double-buffered steps + resident bias


def _pick_g(b, n, d, itemsize, with_bias) -> Optional[int]:
    for g in (8, 4, 2, 1):
        if b % g == 0 and _vmem_need(g, n, d, itemsize, with_bias) <= _VMEM_BUDGET:
            return g
    return None


def _plan(q_shape, itemsize, bias_shape):
    """Returns g (rows per grid step) or None for the XLA fallback."""
    b, h, n, d = q_shape
    if n < 128 or n % 8 or d % 8:
        return None
    if bias_shape is not None:
        if tuple(bias_shape[-2:]) != (n, n):
            return None
        if bias_shape[0] not in (1, b) or bias_shape[1] not in (1, h):
            return None
        if bias_shape[0] != 1:
            return None  # per-batch square bias: no residency win; use XLA
    g = _pick_g(b, n, d, itemsize, bias_shape is not None)
    if g is None:
        return None
    try:
        return g if kernels_supported() else None
    except Exception:  # noqa: BLE001
        return None


def _kernel(q_ref, kT_ref, v_ref, o_ref, *, g):
    for j in range(g):
        sim = jnp.dot(q_ref[j, 0], kT_ref[j, 0],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(q_ref, kT_ref))
        attn = jax.nn.softmax(sim, axis=-1).astype(v_ref.dtype)
        o_ref[j, 0] = jnp.dot(attn, v_ref[j, 0],
                              preferred_element_type=jnp.float32,
                              precision=dot_precision(attn, v_ref)
                              ).astype(o_ref.dtype)


def _kernel_kbias(q_ref, kT_ref, v_ref, kb_ref, o_ref, *, g):
    for j in range(g):
        sim = jnp.dot(q_ref[j, 0], kT_ref[j, 0],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(q_ref, kT_ref))
        sim = sim + kb_ref[j]  # (1, n) broadcasts over query rows
        attn = jax.nn.softmax(sim, axis=-1).astype(v_ref.dtype)
        o_ref[j, 0] = jnp.dot(attn, v_ref[j, 0],
                              preferred_element_type=jnp.float32,
                              precision=dot_precision(attn, v_ref)
                              ).astype(o_ref.dtype)


def _kernel_bias(q_ref, kT_ref, v_ref, b_ref, o_ref, *, g):
    for j in range(g):
        sim = jnp.dot(q_ref[j, 0], kT_ref[j, 0],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(q_ref, kT_ref))
        sim = sim + b_ref[0, 0]
        attn = jax.nn.softmax(sim, axis=-1).astype(v_ref.dtype)
        o_ref[j, 0] = jnp.dot(attn, v_ref[j, 0],
                              preferred_element_type=jnp.float32,
                              precision=dot_precision(attn, v_ref)
                              ).astype(o_ref.dtype)


def _pallas_attention(q, k, v, bias, g, key_bias=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    kT = jnp.swapaxes(k, -1, -2)
    sq = pl.BlockSpec((g, 1, n, d), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    sk = pl.BlockSpec((g, 1, d, n), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    if bias is None and key_bias is not None:
        # (b, 1, n) so the block's trailing dims equal the array dims
        skb = pl.BlockSpec((g, 1, n), lambda hi, bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
        return pallas_call(
            functools.partial(_kernel_kbias, g=g), grid=(h, b // g),
            in_specs=[sq, sk, sq, skb], out_specs=sq,
            out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype))(
                q, kT, v, key_bias.astype(jnp.float32)[:, None, :])
    if bias is None:
        return pallas_call(
            functools.partial(_kernel, g=g), grid=(h, b // g),
            in_specs=[sq, sk, sq], out_specs=sq,
            out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype))(q, kT, v)
    bh = bias.shape[1]
    sb = pl.BlockSpec((1, 1, n, n),
                      lambda hi, bi: (0, hi if bh > 1 else 0, 0, 0),
                      memory_space=pltpu.VMEM)
    return pallas_call(
        functools.partial(_kernel_bias, g=g), grid=(h, b // g),
        in_specs=[sq, sk, sq, sb], out_specs=sq,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype))(
            q, kT, v, bias.astype(jnp.float32))


_VMEM_LIMIT_BWD = 64 * 1024 * 1024


def _bwd_kernel_bias(q_ref, kT_ref, vT_ref, b_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, db_ref, *, g, bias_per_head):
    """Grid (h, b//g): recompute scores in VMEM, emit dq/dk/dv per block and
    accumulate dbias across the inner batch steps (the bias block is
    revisited on consecutive steps, so += is well-defined).  The grad
    matmuls take bf16 inputs with f32 accumulation — an f32 MXU pass is
    several times slower and the dP rounding is ~1e-3 relative."""
    from jax.experimental import pallas as pl

    hi, bi = pl.program_id(0), pl.program_id(1)
    db_fresh = (bi == 0) if bias_per_head else ((bi == 0) & (hi == 0))
    cdt = q_ref.dtype
    bias_blk = b_ref[0, 0]
    db_acc = None
    for j in range(g):
        q_ = q_ref[j, 0]
        kT = kT_ref[j, 0]
        vT = vT_ref[j, 0]
        do_ = do_ref[j, 0]
        sim = jnp.dot(q_, kT, preferred_element_type=jnp.float32,
                      precision=dot_precision(q_, kT)) + bias_blk
        attn = jax.nn.softmax(sim, axis=-1)
        dS = jnp.dot(do_, vT, preferred_element_type=jnp.float32,
                     precision=dot_precision(do_, vT))
        row = jnp.sum(dS * attn, axis=-1, keepdims=True)
        dP = attn * (dS - row)
        dPb = dP.astype(cdt)
        dq_ref[j, 0] = jax.lax.dot_general(
            dPb, kT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, kT)).astype(dq_ref.dtype)
        dk_ref[j, 0] = jax.lax.dot_general(
            dPb, q_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, q_)).astype(dk_ref.dtype)
        dv_ref[j, 0] = jax.lax.dot_general(
            attn.astype(cdt), do_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do_)).astype(dv_ref.dtype)
        db_acc = dP if db_acc is None else db_acc + dP

    @pl.when(db_fresh)
    def _():
        db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

    db_ref[0, 0] += db_acc


def _pick_g_bwd(b, n, d, itemsize):
    d_pad = ((d + 127) // 128) * 128
    for g in (16, 8, 4, 2, 1):
        if b % g:
            continue
        per_step = g * (6 * n * d_pad * itemsize + d * n * itemsize)
        scores = 5 * n * n * 4           # sim/attn/dS/dP + bf16 copies
        acc = 3 * n * n * 4              # resident bias + db buffer + temp
        if 2 * per_step + scores + acc <= _VMEM_LIMIT_BWD - 16 * 1024 * 1024:
            return g
    return 1


def _bwd_kernel_kbias(q_ref, kT_ref, vT_ref, kb_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dkb_ref, *, g):
    """Grid (b//g, h) — batch OUTER so the per-key-bias grad block (indexed
    by batch only) is revisited on consecutive head steps and can be
    accumulated with +=."""
    from jax.experimental import pallas as pl

    hi = pl.program_id(1)
    cdt = q_ref.dtype
    for j in range(g):
        q_ = q_ref[j, 0]
        kT = kT_ref[j, 0]
        vT = vT_ref[j, 0]
        do_ = do_ref[j, 0]
        sim = jnp.dot(q_, kT, preferred_element_type=jnp.float32,
                      precision=dot_precision(q_, kT)) + kb_ref[j]
        attn = jax.nn.softmax(sim, axis=-1)
        dS = jnp.dot(do_, vT, preferred_element_type=jnp.float32,
                     precision=dot_precision(do_, vT))
        row = jnp.sum(dS * attn, axis=-1, keepdims=True)
        dP = attn * (dS - row)
        dPb = dP.astype(cdt)
        dq_ref[j, 0] = jax.lax.dot_general(
            dPb, kT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, kT)).astype(dq_ref.dtype)
        dk_ref[j, 0] = jax.lax.dot_general(
            dPb, q_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, q_)).astype(dk_ref.dtype)
        dv_ref[j, 0] = jax.lax.dot_general(
            attn.astype(cdt), do_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do_)).astype(dv_ref.dtype)
        dkb_j = jnp.sum(dP, axis=0, keepdims=True)

        @pl.when(hi == 0)
        def _():
            dkb_ref[j] = jnp.zeros_like(dkb_ref[j])

        dkb_ref[j] += dkb_j


def _pallas_attention_bwd_kbias(q, k, v, key_bias, do):
    """Returns (dq, dk, dv, dkey_bias) for per-key bias (b, n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    kT = jnp.swapaxes(k, -1, -2)
    vT = jnp.swapaxes(v, -1, -2)
    g = _pick_g_bwd(b, n, d, q.dtype.itemsize)
    sq = pl.BlockSpec((g, 1, n, d), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((g, 1, d, n), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    skb = pl.BlockSpec((g, 1, n), lambda bi, hi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    dq, dk, dv, dkb = pallas_call(
        functools.partial(_bwd_kernel_kbias, g=g),
        grid=(b // g, h),
        in_specs=[sq, st, st, skb, sq],
        out_specs=[sq, sq, sq, skb],
        out_shape=[jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
                   jax.ShapeDtypeStruct((b, 1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD))(
        q, kT, vT, key_bias.astype(jnp.float32)[:, None, :], do)
    return dq, dk, dv, dkb[:, 0, :].astype(key_bias.dtype)


def _pallas_attention_bwd(q, k, v, bias, do):
    """Returns (dq, dk, dv, dbias-summed-over-batch) for bias (1, h, n, n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    kT = jnp.swapaxes(k, -1, -2)
    vT = jnp.swapaxes(v, -1, -2)
    bh = bias.shape[1]
    g = _pick_g_bwd(b, n, d, q.dtype.itemsize)
    sq = pl.BlockSpec((g, 1, n, d), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((g, 1, d, n), lambda hi, bi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    sb = pl.BlockSpec((1, 1, n, n),
                      lambda hi, bi: (0, hi if bh > 1 else 0, 0, 0),
                      memory_space=pltpu.VMEM)
    dq, dk, dv, db = pallas_call(
        functools.partial(_bwd_kernel_bias, g=g, bias_per_head=bh > 1),
        grid=(h, b // g),
        in_specs=[sq, st, st, sb, sq],
        out_specs=[sq, sq, sq, sb],
        out_shape=[jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
                   jax.ShapeDtypeStruct((1, bh, n, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD))(
        q, kT, vT, bias.astype(jnp.float32), do)
    return dq, dk, dv, db.astype(bias.dtype)


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    key_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """softmax(q @ k^T + bias + key_bias[:, None, None]) @ v, scores on-chip.

    q, k, v: (b, h, n, d) — any scaling already applied to q.
    bias: broadcastable (1, 1|h, n, n) additive score bias, or None.
    key_bias: additive per-key bias (b, n) (e.g. a -inf-style pad mask as
    used by BERT), or None.  bias and key_bias are mutually exclusive in the
    kernel path.
    """
    g = _plan(q.shape, q.dtype.itemsize,
              None if bias is None else bias.shape)
    if g is not None and not (bias is not None and key_bias is not None):
        if key_bias is None or key_bias.shape == (q.shape[0], q.shape[2]):
            return _pallas_attention(q, k, v, bias, g, key_bias)
    return _xla_attention(q, k, v, bias, key_bias)


def _fused_fwd(q, k, v, bias, key_bias):
    return fused_attention(q, k, v, bias, key_bias), (q, k, v, bias, key_bias)


def _fused_bwd(res, g):
    q, k, v, bias, key_bias = res
    n = q.shape[2]
    if (key_bias is None and bias is not None and bias.shape[0] == 1
            and _plan(q.shape, q.dtype.itemsize, bias.shape) is not None
            and 4 * n * n * 4 + 2 * n * n * 4 <= _VMEM_BUDGET):
        dq, dk, dv, db = _pallas_attention_bwd(q, k, v, bias, g)
        return dq, dk, dv, db, None
    if (bias is None and key_bias is not None
            and key_bias.shape == (q.shape[0], n)
            and _plan(q.shape, q.dtype.itemsize, None) is not None):
        dq, dk, dv, dkb = _pallas_attention_bwd_kbias(q, k, v, key_bias, g)
        return dq, dk, dv, None, dkb
    diff = [x for x in (bias, key_bias) if x is not None]
    _, vjp = jax.vjp(
        lambda q_, k_, v_, *rest: _xla_attention(
            q_, k_, v_,
            rest[0] if bias is not None else None,
            rest[-1] if key_bias is not None else None),
        q, k, v, *diff)
    grads = list(vjp(g))
    out = grads[:3]
    out.append(grads.pop(3) if bias is not None else None)
    out.append(grads.pop(3) if key_bias is not None else None)
    return tuple(out)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------- key-bias + dropout path
# The BERT tower trains with attention-probability dropout (HF BertModel
# parity, attention_probs_dropout_prob=0.1).  The XLA path materializes the
# (b, h, n, n) f32 scores AND a same-shaped dropout mask per layer — profiled
# at ~38 ms/step across the 12 layers.  These kernels keep everything in
# VMEM and draw the mask from the TPU PRNG, seeded deterministically from
# (seed, head, batch-row) so the backward regenerates the exact same mask
# without it ever existing in HBM.

def _drop_seed(seed_ref, hi, row):
    from jax.experimental.pallas import tpu as pltpu

    # prng_seed accepts at most 2 scalars — pack (head, row) into one
    pltpu.prng_seed(seed_ref[0], hi * 65536 + row)


def _drop_mask(shape, rate):
    from jax.experimental.pallas import tpu as pltpu

    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _kernel_kbias_drop(seed_ref, q_ref, kT_ref, v_ref, kb_ref, o_ref, *,
                       g, rate):
    from jax.experimental import pallas as pl

    hi, bi = pl.program_id(0), pl.program_id(1)
    for j in range(g):
        sim = jnp.dot(q_ref[j, 0], kT_ref[j, 0],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(q_ref, kT_ref))
        sim = sim + kb_ref[j]
        attn = jax.nn.softmax(sim, axis=-1)
        _drop_seed(seed_ref, hi, bi * g + j)
        attn = attn * _drop_mask(sim.shape, rate)
        o_ref[j, 0] = jnp.dot(attn.astype(v_ref.dtype), v_ref[j, 0],
                              preferred_element_type=jnp.float32,
                              precision=dot_precision(v_ref)
                              ).astype(o_ref.dtype)


def _bwd_kernel_kbias_drop(seed_ref, q_ref, kT_ref, vT_ref, kb_ref, do_ref,
                           dq_ref, dk_ref, dv_ref, dkb_ref, *, g, rate):
    from jax.experimental import pallas as pl

    hi, bi = pl.program_id(1), pl.program_id(0)
    cdt = q_ref.dtype
    for j in range(g):
        q_ = q_ref[j, 0]
        kT = kT_ref[j, 0]
        vT = vT_ref[j, 0]
        do_ = do_ref[j, 0]
        sim = jnp.dot(q_, kT, preferred_element_type=jnp.float32,
                      precision=dot_precision(q_, kT)) + kb_ref[j]
        attn = jax.nn.softmax(sim, axis=-1)
        _drop_seed(seed_ref, hi, bi * g + j)
        mask = _drop_mask(sim.shape, rate)
        attn_d = attn * mask
        dS_d = jnp.dot(do_, vT, preferred_element_type=jnp.float32,
                       precision=dot_precision(do_, vT))
        dattn = dS_d * mask
        row = jnp.sum(dattn * attn, axis=-1, keepdims=True)
        dP = attn * (dattn - row)
        dPb = dP.astype(cdt)
        dq_ref[j, 0] = jax.lax.dot_general(
            dPb, kT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, kT)).astype(dq_ref.dtype)
        dk_ref[j, 0] = jax.lax.dot_general(
            dPb, q_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dPb, q_)).astype(dk_ref.dtype)
        dv_ref[j, 0] = jax.lax.dot_general(
            attn_d.astype(cdt), do_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do_)).astype(dv_ref.dtype)
        dkb_j = jnp.sum(dP, axis=0, keepdims=True)

        @pl.when(hi == 0)
        def _():
            dkb_ref[j] = jnp.zeros_like(dkb_ref[j])

        dkb_ref[j] += dkb_j


def _pallas_attention_kbias_drop_impl(q, k, v, key_bias, seed, g, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    kT = jnp.swapaxes(k, -1, -2)
    # index maps take the prefetched-scalar ref as a trailing arg
    sq = pl.BlockSpec((g, 1, n, d), lambda hi, bi, *_: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    sk = pl.BlockSpec((g, 1, d, n), lambda hi, bi, *_: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    skb = pl.BlockSpec((g, 1, n), lambda hi, bi, *_: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(h, b // g),
        in_specs=[sq, sk, sq, skb], out_specs=sq)
    return pallas_call(
        functools.partial(_kernel_kbias_drop, g=g, rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD),
    )(seed, q, kT, v, key_bias.astype(jnp.float32)[:, None, :])


def _pallas_attention_kbias_drop_bwd(q, k, v, key_bias, seed, do, g, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    kT = jnp.swapaxes(k, -1, -2)
    vT = jnp.swapaxes(v, -1, -2)
    sq = pl.BlockSpec((g, 1, n, d), lambda bi, hi, *_: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((g, 1, d, n), lambda bi, hi, *_: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    skb = pl.BlockSpec((g, 1, n), lambda bi, hi, *_: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // g, h),
        in_specs=[sq, st, st, skb, sq],
        out_specs=[sq, sq, sq, skb])
    dq, dk, dv, dkb = pallas_call(
        functools.partial(_bwd_kernel_kbias_drop, g=g, rate=rate),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
                   jax.ShapeDtypeStruct((b, 1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BWD),
    )(seed, q, kT, vT, key_bias.astype(jnp.float32)[:, None, :], do)
    return dq, dk, dv, dkb[:, 0, :].astype(key_bias.dtype)


def _xla_attention_dropout(q, k, v, key_bias, rng, rate):
    """XLA fallback with jax.random dropout (different mask stream than the
    kernel — dropout only needs the right distribution, not bit parity)."""
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    if key_bias is not None:
        sim = sim + key_bias.astype(jnp.float32)[:, None, None, :]
    attn = jax.nn.softmax(sim, axis=-1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, attn.shape)
    attn = jnp.where(keep, attn, 0.0) / (1.0 - rate)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_kbias_dropout(q, k, v, key_bias, seed, rate: float):
    """softmax(q k^T + key_bias) with attention-prob dropout drawn from the
    TPU PRNG, seeded by (seed, head, batch-row) — identical mask in forward
    and backward, never materialized in HBM.

    q, k, v: (b, h, n, d) (scaling applied to q); key_bias: (b, n) additive;
    seed: (1,) int32; rate: static drop probability in (0, 1)."""
    b, h, n, d = q.shape
    # _drop_seed packs (head, row) as head*65536 + row into the second PRNG
    # word; rows beyond 65536 would collide streams across heads (production
    # b <= 192, far below the bound)
    assert b <= 65536, f"dropout PRNG packing requires b <= 65536, got {b}"
    # the in-kernel TPU PRNG has no interpret rule — real TPU only
    g = None if interpret_enabled() else _plan(q.shape, q.dtype.itemsize, None)
    if g is not None and key_bias.shape == (b, n):
        return _pallas_attention_kbias_drop_impl(q, k, v, key_bias, seed,
                                                 g, rate)
    rng = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    return _xla_attention_dropout(q, k, v, key_bias, rng, rate)


def _fused_drop_fwd(q, k, v, key_bias, seed, rate):
    return fused_attention_kbias_dropout(q, k, v, key_bias, seed, rate), \
        (q, k, v, key_bias, seed)


def _fused_drop_bwd(rate, res, g_out):
    q, k, v, key_bias, seed = res
    b, h, n, d = q.shape
    g = None if interpret_enabled() else _plan(q.shape, q.dtype.itemsize, None)
    if g is not None and key_bias.shape == (b, n):
        dq, dk, dv, dkb = _pallas_attention_kbias_drop_bwd(
            q, k, v, key_bias, seed, g_out, g, rate)
        return dq, dk, dv, dkb, None
    rng = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    _, vjp = jax.vjp(lambda q_, k_, v_, kb_: _xla_attention_dropout(
        q_, k_, v_, kb_, rng, rate), q, k, v, key_bias)
    return (*vjp(g_out), None)


fused_attention_kbias_dropout.defvjp(_fused_drop_fwd, _fused_drop_bwd)
