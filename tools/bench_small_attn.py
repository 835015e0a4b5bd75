"""Sweep the sequence-packing factor g for the temporal (small) attention
kernel at production shape (4608, 24, 512), fwd and bwd.

The block-diagonal packing computes a (g*n, g*n) score matrix of which only
the g diagonal (n, n) blocks are useful — score/PV FLOPs scale with g while
projection MXU utilization grows with g*n rows.  This sweep finds the
crossover.  Usage: python tools/bench_small_attn.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    if isinstance(x, (tuple, list)):
        x = x[0]
    np.asarray(jnp.ravel(x)[:4])


def timeit(name, fn, *args, iters=10):
    import jax

    cj = jax.jit(fn)
    try:
        out = cj(*args)
        _sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:150]}",
              file=sys.stderr)
        return None
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = cj(*args)
        _sync(out)
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best * 1e3:8.3f} ms", file=sys.stderr)
    return best


def main():
    import jax.numpy as jnp

    from ct_clip_tpu.ops.pallas import small_attention as SA

    b, n, dim = 4608, 24, 512
    h, dh = 8, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, dim) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(dim) + 0.5, jnp.float32)
    wq = jnp.asarray(rng.randn(dim, h * dh) * dim ** -0.5, jnp.float32)
    wkv = jnp.asarray(rng.randn(dim, 2 * h * dh) * dim ** -0.5, jnp.float32)
    qs = jnp.asarray(rng.rand(dh) + 0.5, jnp.float32)
    ks = jnp.asarray(rng.rand(dh) + 0.5, jnp.float32)
    wout = jnp.asarray(rng.randn(h * dh, dim) * (h * dh) ** -0.5, jnp.float32)
    do = jnp.asarray(rng.randn(b, n, dim) * 0.1, jnp.bfloat16)
    kw = dict(heads=h, dim_head=dh, scale=8.0, dtype=jnp.bfloat16,
              residual=True)
    args = (x, gamma, wq, wkv, qs, ks, wout)

    for g in (32, 16, 8, 4):
        timeit(f"fwd g={g}", lambda *a, g=g: SA._pallas_small_qknorm(
            *a, g, **kw), *args)
    for g in (64, 32, 16, 8, 4):
        timeit(f"bwd g={g}", lambda *a, g=g: SA._pallas_small_qknorm_bwd(
            *a[:-1], a[-1], g, **kw), *args, do)


if __name__ == "__main__":
    main()
