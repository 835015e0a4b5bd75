"""Pallas TPU kernel: fused LayerNorm + GEGLU feed-forward.

One grid step computes `geglu(LN(x_block) @ wi) @ wo` for a block of rows
with the (wi, wo) weights resident in VMEM, so the (rows, 2*inner)
intermediate never round-trips HBM.  Measured at the CTViT FF shape
(110592 rows, 512 -> 2x1365 -> 512): XLA 8.0 ms -> 6.1 ms per call (1.3x;
the op is MXU-bound, the win is the eliminated intermediate traffic).

The gate/value projections are taken as separate weight views (a lane-split
of the fused (D, 2*inner) kernel at `inner` is not 128-aligned in-kernel, so
the split happens in XLA where it's free).  Exact (erf) GELU is used for
parity with torch F.gelu; Mosaic has no erf primitive, so the kernel uses
the Abramowitz-Stegun 7.1.26 rational approximation (|err| ~2e-6 in f32 —
three orders of magnitude below bf16 resolution).

`fused_geglu_ff` carries a custom VJP whose backward differentiates the XLA
reference (recompute).  Off-TPU or for non-conforming shapes it falls back
to identical-numerics XLA (tests/test_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..norms import layer_norm

_VMEM_BUDGET = 12 * 1024 * 1024


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 erf, |eps| ~2e-6 in f32 (in/out f32)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(g):
    g32 = g.astype(jnp.float32)
    return g32 * 0.5 * (1.0 + _erf_as(g32 * (2.0 ** -0.5)))


def _xla_ff(x, scale, bias, wia, wig, wo, eps):
    xn = layer_norm(x, scale, bias, eps)
    compute_dtype = wia.dtype
    a = jnp.dot(xn.astype(compute_dtype), wia,
                preferred_element_type=jnp.float32)
    g = jnp.dot(xn.astype(compute_dtype), wig,
                preferred_element_type=jnp.float32)
    # true erf here; the A&S form is only for Mosaic (no erf primitive)
    act = (a * jax.nn.gelu(g, approximate=False)).astype(compute_dtype)
    return jnp.dot(act, wo, preferred_element_type=jnp.float32).astype(x.dtype)


def _pick_m(n_rows, d, inner, itemsize):
    for m in (768, 512, 256, 128):
        if n_rows % m:
            continue
        need = 2 * (m * d * itemsize * 2            # x + out blocks
                    + 2 * m * inner * 4)            # a, g f32 temps
        need += (2 * d * inner + inner * d) * itemsize  # resident weights
        if need <= _VMEM_BUDGET:
            return m
    return None


def _plan(x_shape, d, inner, itemsize):
    n_rows = x_shape[0]
    if d % 128 or n_rows < 1024:
        return None
    m = _pick_m(n_rows, d, inner, itemsize)
    if m is None:
        return None
    try:
        return m if jax.devices()[0].platform == "tpu" else None
    except Exception:  # noqa: BLE001
        return None


def _kernel(x_ref, s_ref, b_ref, wa_ref, wg_ref, wo_ref, o_ref, *, eps):
    xn = layer_norm(x_ref[...], s_ref[...], b_ref[...], eps)
    xn = xn.astype(wa_ref.dtype)
    a = jnp.dot(xn, wa_ref[...], preferred_element_type=jnp.float32)
    g = jnp.dot(xn, wg_ref[...], preferred_element_type=jnp.float32)
    act = (a * _gelu_exact(g)).astype(wo_ref.dtype)
    o_ref[...] = jnp.dot(act, wo_ref[...],
                         preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_ff(x, scale, bias, wia, wig, wo, eps, m):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = x.shape
    inner = wia.shape[1]
    sx = pl.BlockSpec((m, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sv = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps), grid=(n_rows // m,),
        in_specs=[sx, sv((d,)), sv((d,)), sv((d, inner)), sv((d, inner)),
                  sv((inner, d))],
        out_specs=sx,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), x.dtype))(
            x, scale, bias, wia, wig, wo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_geglu_ff(x, scale, bias, wia, wig, wo, eps=1e-5):
    """geglu(LN(x; scale, bias) @ [wia|wig]) @ wo for 2-D x (rows, d)."""
    m = _plan(x.shape, x.shape[1], wia.shape[1], wia.dtype.itemsize)
    if m is not None:
        return _pallas_ff(x, scale, bias, wia, wig, wo, eps, m)
    return _xla_ff(x, scale, bias, wia, wig, wo, eps)


def _ff_fwd(x, scale, bias, wia, wig, wo, eps):
    return fused_geglu_ff(x, scale, bias, wia, wig, wo, eps), \
        (x, scale, bias, wia, wig, wo)


def _ff_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _xla_ff(*a, eps), *res)
    return vjp(g)


fused_geglu_ff.defvjp(_ff_fwd, _ff_bwd)
