"""Pallas TPU kernel: fused QK-norm attention sublayer with per-head bias.

The CTViT spatial stage runs QK-norm attention over (b*t=192, n=576,
dim=512) with 8 heads of 32 dims and a continuous-position-bias (h, n, n)
score bias (reference transformer_maskgit/attention.py:88-181 called from
ctvit.py:291-295).  The previous decomposition — XLA projections, a
(b, n, h*dh) -> (b, h, n, dh) head relayout, then a scores-only Pallas
attention — spent ~12 ms/step in pure layout copies (profiled: the
bf16[192,576,8,32] transposes dominate the `copy` bucket).

This kernel fuses the whole sublayer, one (n, dim) slab per grid step:
gamma-LN, q/kv projections (kv from the PRE-norm residual stream, q from
the post-norm — parity with attention.py:139-143), per-head l2 QK-norm with
learned scales (indicator-matmul trick, see small_attention.py), per-head
softmax(q k^T + bias_h) v with the f32 bias resident in VMEM, head merge,
and output projection.  No head-major tensor ever exists, in HBM or VMEM.

The backward recomputes the forward per slab flash-style and accumulates
dbias (h, n, n) plus the weight/scale/gamma grads across sequential grid
steps (raised scoped-vmem limit; grad matmuls take bf16 inputs with f32
accumulation).  Falls back to identical-numerics XLA off-TPU or for shapes
that don't fit (tests/test_pallas.py)."""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ._call import kernels_supported, mm_precision_for, pallas_call

_EPS_L2 = 1e-12
_VMEM_LIMIT = 64 * 1024 * 1024


def _xla_spatial_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout, bias, *,
                        heads, dim_head, scale, dtype, residual=False):
    """XLA reference; same math as the kernel (and as ops/attention.py's
    large-sequence path for this configuration)."""
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
    sim = sim + bias.astype(jnp.float32)[None]
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v)
    out = out.reshape(*x.shape[:-1], h * dh)
    out = jnp.dot(out, wout.astype(dtype), preferred_element_type=jnp.float32)
    if residual:  # fold the transformer's `attn(x) + x` (one rounding)
        out = out + x.astype(jnp.float32)
    return out.astype(dtype)


def _plan(b, n, dim, heads, dim_head) -> Optional[bool]:
    hd = heads * dim_head
    if n < 128 or n % 8 or dim % 128 or hd % 128 or (2 * hd) % 128:
        return None
    if heads * n * n * 4 > 14 * 1024 * 1024:  # resident bias
        return None
    try:
        return True if kernels_supported() else None
    except Exception:  # noqa: BLE001
        return None


def _project_qknorm(x, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref, *,
                    heads, dim_head, dtype):
    """Shared fwd recompute: LN, projections, per-head l2 QK-norm.
    Returns (xn, qn, kn, v, qhat, khat, qfac, kfac, ln_residuals)."""
    h, dh = heads, dim_head
    hd = h * dh
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc0 = xf - mean
    var = jnp.mean(xc0 * xc0, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = xc0 * rstd
    xn = (xhat * gamma_ref[...]).astype(dtype)
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
    qn = (qhat * qs_ref[...]).astype(dtype)   # qs pre-tiled, incl. *scale
    kn = (khat * ks_ref[...]).astype(dtype)
    return (xn, xc, qn, kn, v, qhat, khat, qfac, kfac, hmat,
            xhat, rstd)


def _kernel(x_ref, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref, wout_ref,
            bias_ref, o_ref, *, heads, dim_head, dtype, residual):
    h, dh = heads, dim_head
    x = x_ref[0]
    (xn, xc, qn, kn, v, *_rest) = _project_qknorm(
        x, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref,
        heads=heads, dim_head=dim_head, dtype=dtype)
    outs = []
    for hh in range(h):
        sl = slice(hh * dh, (hh + 1) * dh)
        sim = jax.lax.dot_general(qn[:, sl], kn[:, sl],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[hh]
        mx = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - mx)
        den = jnp.sum(e, axis=-1, keepdims=True)
        pv = jnp.dot(e.astype(dtype), v[:, sl],
                     preferred_element_type=jnp.float32)
        outs.append((pv / den).astype(dtype))
    merged = jnp.concatenate(outs, axis=-1)
    out = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
    if residual:  # x slab already in VMEM: saves the XLA `+ x` pass
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, do_ref, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref,
                wout_ref, bias_ref,
                dx_ref, dwq_ref, dwkv_ref, dwout_ref, dgamma_ref, dqs_ref,
                dks_ref, dbias_ref, *, heads, dim_head, dtype, residual):
    from jax.experimental import pallas as pl

    h, dh = heads, dim_head
    hd = h * dh
    x = x_ref[0]
    do = do_ref[0].astype(jnp.float32)
    (xn, xc, qn, kn, v, qhat, khat, qfac, kfac, hmat, xhat,
     rstd) = _project_qknorm(
        x, gamma_ref, wq_ref, wkv_ref, qs_ref, ks_ref,
        heads=heads, dim_head=dim_head, dtype=dtype)
    gammaf = gamma_ref[...]
    sq = qs_ref[...]
    sk = ks_ref[...]

    dmerged = jax.lax.dot_general(do, wout_ref[...].astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    merged_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for hh in range(h):
        sl = slice(hh * dh, (hh + 1) * dh)
        qn_h, kn_h, v_h = qn[:, sl], kn[:, sl], v[:, sl]
        sim = jax.lax.dot_general(qn_h, kn_h, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[hh]
        mx = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - mx)
        den = jnp.sum(e, axis=-1, keepdims=True)
        p = e / den
        pb = p.astype(dtype)
        merged_parts.append(jnp.dot(pb, v_h,
                                    preferred_element_type=jnp.float32))
        dout_h = dmerged[:, sl]
        dv_parts.append(jax.lax.dot_general(
            pb, dout_h.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(dout_h.astype(dtype), v_h,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rs = jnp.sum(p * dp, axis=-1, keepdims=True)
        dsim = p * (dp - rs)
        dbias_ref[hh] += dsim
        dsb = dsim.astype(dtype)
        dq_parts.append(jnp.dot(dsb, kn_h,
                                preferred_element_type=jnp.float32))
        dk_parts.append(jax.lax.dot_general(
            dsb, qn_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    merged = jnp.concatenate(merged_parts, axis=-1)
    dqn_all = jnp.concatenate(dq_parts, axis=-1)
    dkn_all = jnp.concatenate(dk_parts, axis=-1)
    dv = jnp.concatenate(dv_parts, axis=-1)

    dqhat = dqn_all * sq
    dkhat = dkn_all * sk
    dqs_tile = jnp.sum(dqn_all * qhat, axis=0, keepdims=True)
    dks_tile = jnp.sum(dkn_all * khat, axis=0, keepdims=True)
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

    dxhat = dxn * gammaf
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx = dx_ln + dx_kv
    if residual:  # d(x + attn(x))/dx identity term
        dx = dx + do
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dob = do.astype(dtype)
    dwq = jax.lax.dot_general(xn, dqb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwkv = jax.lax.dot_general(xc, dkv, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dwout = jax.lax.dot_general(merged.astype(dtype), dob,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dxn * xhat, axis=0, keepdims=True)

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


def _weights(gamma, wq, wkv, q_scale, k_scale, wout, bias, heads, scale,
             dtype):
    qs_t = (jnp.tile(q_scale.astype(jnp.float32), heads) * scale)[None, :]
    ks_t = jnp.tile(k_scale.astype(jnp.float32), heads)[None, :]
    return (gamma.astype(jnp.float32)[None, :], wq.astype(dtype),
            wkv.astype(dtype), qs_t, ks_t, wout.astype(dtype),
            bias.astype(jnp.float32))


def _specs(b, n, dim, weights):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sx = pl.BlockSpec((1, n, dim), lambda bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    full = [pl.BlockSpec(w.shape, (lambda nd: lambda bi: (0,) * nd)(w.ndim),
                         memory_space=pltpu.VMEM) for w in weights]
    return sx, full


def _pallas_spatial(x, gamma, wq, wkv, q_scale, k_scale, wout, bias, *,
                    heads, dim_head, scale, dtype, residual=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, dim = x.shape
    weights = _weights(gamma, wq, wkv, q_scale, k_scale, wout, bias,
                       heads, scale, dtype)
    sx, full = _specs(b, n, dim, weights)
    return pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head,
                          dtype=dtype, residual=residual),
        mm_precision=mm_precision_for(dtype),
        grid=(b,),
        in_specs=[sx] + full,
        out_specs=sx,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *weights)


def _pallas_spatial_bwd(x, gamma, wq, wkv, q_scale, k_scale, wout, bias, do,
                        *, heads, dim_head, scale, dtype, residual=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, dim = x.shape
    hd = heads * dim_head
    weights = _weights(gamma, wq, wkv, q_scale, k_scale, wout, bias,
                       heads, scale, dtype)
    sx, full = _specs(b, n, dim, weights)
    outs = [
        jax.ShapeDtypeStruct((b, n, dim), x.dtype),            # dx
        jax.ShapeDtypeStruct((dim, hd), jnp.float32),          # dwq
        jax.ShapeDtypeStruct((dim, 2 * hd), jnp.float32),      # dwkv
        jax.ShapeDtypeStruct((hd, dim), jnp.float32),          # dwout
        jax.ShapeDtypeStruct((1, dim), jnp.float32),           # dgamma
        jax.ShapeDtypeStruct((1, hd), jnp.float32),            # dqs (tiled)
        jax.ShapeDtypeStruct((1, hd), jnp.float32),            # dks (tiled)
        jax.ShapeDtypeStruct(bias.shape, jnp.float32),         # dbias
    ]
    out_specs = [sx] + [
        pl.BlockSpec(o.shape, (lambda nd: lambda bi: (0,) * nd)(len(o.shape)),
                     memory_space=pltpu.VMEM) for o in outs[1:]]
    dx, dwq, dwkv, dwout, dgamma, dqs_t, dks_t, dbias = pallas_call(
        functools.partial(_bwd_kernel, heads=heads, dim_head=dim_head,
                          dtype=dtype, residual=residual),
        mm_precision=mm_precision_for(dtype),
        grid=(b,),
        in_specs=[sx, sx] + full,
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(x, do, *weights)
    dqs = (dqs_t.reshape(heads, dim_head).sum(0) * scale).astype(q_scale.dtype)
    dks = dks_t.reshape(heads, dim_head).sum(0).astype(k_scale.dtype)
    return (dx, dgamma[0].astype(gamma.dtype), dwq.astype(wq.dtype),
            dwkv.astype(wkv.dtype), dqs, dks, dwout.astype(wout.dtype),
            dbias.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_spatial_qknorm_attention(x, gamma, wq, wkv, q_scale, k_scale,
                                   wout, bias, heads: int, dim_head: int,
                                   scale: float, dtype=jnp.bfloat16,
                                   residual: bool = False):
    """Fused LN -> q/kv proj -> per-head QK-l2norm -> softmax(sim + bias_h)
    -> out proj for the CTViT spatial stage.

    x: (b, n, dim) PRE-norm residual stream; bias: (heads, n, n) f32 score
    bias (continuous position bias).  residual=True folds the transformer's
    `attn(x) + x` into the same pass (f32 accumulate, one rounding)."""
    if _plan(x.shape[0], x.shape[1], x.shape[2], heads, dim_head):
        return _pallas_spatial(x, gamma, wq, wkv, q_scale, k_scale, wout,
                               bias, heads=heads, dim_head=dim_head,
                               scale=scale, dtype=dtype, residual=residual)
    return _xla_spatial_qknorm(x, gamma, wq, wkv, q_scale, k_scale, wout,
                               bias, heads=heads, dim_head=dim_head,
                               scale=scale, dtype=dtype, residual=residual)


def _fwd(x, gamma, wq, wkv, q_scale, k_scale, wout, bias, heads, dim_head,
         scale, dtype, residual):
    out = fused_spatial_qknorm_attention(x, gamma, wq, wkv, q_scale,
                                         k_scale, wout, bias, heads,
                                         dim_head, scale, dtype, residual)
    return out, (x, gamma, wq, wkv, q_scale, k_scale, wout, bias)


def _bwd(heads, dim_head, scale, dtype, residual, res, g):
    x, gamma, wq, wkv, q_scale, k_scale, wout, bias = res
    if _plan(x.shape[0], x.shape[1], x.shape[2], heads, dim_head):
        return _pallas_spatial_bwd(x, gamma, wq, wkv, q_scale, k_scale,
                                   wout, bias, g.astype(x.dtype),
                                   heads=heads, dim_head=dim_head,
                                   scale=scale, dtype=dtype,
                                   residual=residual)
    _, vjp = jax.vjp(
        lambda *a: _xla_spatial_qknorm(*a, heads=heads, dim_head=dim_head,
                                       scale=scale, dtype=dtype,
                                       residual=residual),
        x, gamma, wq, wkv, q_scale, k_scale, wout, bias)
    return vjp(g)


fused_spatial_qknorm_attention.defvjp(_fwd, _bwd)
