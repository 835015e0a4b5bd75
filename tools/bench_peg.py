"""Micro-benchmark of PEG (3x3x3 depthwise conv) variants at production
shape (8, 24, 24, 24, 512) bf16 on the current backend.

Usage: python tools/bench_peg.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    np.asarray(jnp.ravel(x)[:4])  # device-side slice, tiny host copy


def timeit(name, fn, *args, iters=30):
    """Chain `iters` applications inside ONE jit: per-dispatch tunnel
    latency (~145 ms on this box) would otherwise swamp the figure."""
    import jax

    def chained(x_, *rest):
        def body(_, v):
            return fn(v, *rest)
        return jax.lax.fori_loop(0, iters, body, x_)

    cj = jax.jit(chained)
    out = cj(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        out = cj(*args)
        _sync(out)
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:36s} {best * 1e3:8.3f} ms", file=sys.stderr)
    return fn(*args), best


def main():
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.ops.pallas import peg as P

    b, t, h, w, c = 8, 24, 24, 24, 512
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, 3, 1, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    pallas_fn = lambda x_: P._pallas_peg(x_, kern, bias, True, 128, True)
    xla_fn = lambda x_: P.xla_peg_conv(x_, kern, bias, True, True)

    def conv_fn(x_):
        dn = jax.lax.conv_dimension_numbers(
            x_.shape, kern.shape, ("NDHWC", "DHWIO", "NDHWC"))
        out = jax.lax.conv_general_dilated(
            x_.astype(jnp.float32), kern.astype(jnp.float32),
            (1, 1, 1), ((2, 0), (1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=c)
        return (out + bias + x_.astype(jnp.float32)).astype(x_.dtype)

    def conv_bf16_fn(x_):
        dn = jax.lax.conv_dimension_numbers(
            x_.shape, kern.shape, ("NDHWC", "DHWIO", "NDHWC"))
        out = jax.lax.conv_general_dilated(
            x_, kern.astype(x_.dtype),
            (1, 1, 1), ((2, 0), (1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=c, preferred_element_type=jnp.float32)
        return (out + bias + x_.astype(jnp.float32)).astype(x_.dtype)

    o1, t1 = timeit("pallas stencil (current)", pallas_fn, x)
    o2, t2 = timeit("xla 27-tap pointwise", xla_fn, x)
    o3, t3 = timeit("lax depthwise conv f32", conv_fn, x)
    o4, t4 = timeit("lax depthwise conv bf16 taps", conv_bf16_fn, x)
    print("maxdiff pallas vs bf16 conv:",
          float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o4.astype(jnp.float32)))), file=sys.stderr)
    print("maxdiff pallas vs xla-tap:",
          float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32)))), file=sys.stderr)
    print("maxdiff pallas vs lax conv:",
          float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o3.astype(jnp.float32)))), file=sys.stderr)


if __name__ == "__main__":
    main()
