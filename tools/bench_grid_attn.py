"""On-chip micro-benchmark: temporal attention in the native grid layout
vs the sequence-major path (transpose -> packed kernel -> transpose back).

Production temporal shape: token grid (b, t, h*w, dim) = (8, 24, 576, 512),
8 heads x 32; the sequence-major form is (b*h*w, t, dim) = (4608, 24, 512).
Run on the chip:  python tools/bench_grid_attn.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

from ct_clip_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from ct_clip_tpu.ops.pallas.small_attention import (
    fused_small_qknorm_attention, fused_small_qknorm_attention_grid)

B, T, S, DIM, H, DH = 8, 24, 576, 512, 8, 32
HD = H * DH
SCALE = 8.0
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.time() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, S, DIM), DT)
    gamma = jnp.ones((DIM,), jnp.float32)
    wq = jnp.asarray(rng.randn(DIM, HD) * 0.05, DT)
    wkv = jnp.asarray(rng.randn(DIM, 2 * HD) * 0.05, DT)
    qs = jnp.asarray(rng.rand(DH) + 0.5, jnp.float32)
    ks = jnp.asarray(rng.rand(DH) + 0.5, jnp.float32)
    wout = jnp.asarray(rng.randn(HD, DIM) * 0.05, DT)
    w = (gamma, wq, wkv, qs, ks, wout)

    def seqmajor(x, *w):
        xs = x.transpose(0, 2, 1, 3).reshape(B * S, T, DIM)
        out = fused_small_qknorm_attention(xs, *w, H, DH, SCALE, DT, True)
        return out.reshape(B, S, T, DIM).transpose(0, 2, 1, 3)

    def grid(x, *w):
        return fused_small_qknorm_attention_grid(x, *w, H, DH, SCALE, DT,
                                                 True)

    for label, fn in (("grid", grid), ("seq-major", seqmajor)):
        fj = jax.jit(fn)
        t = timeit(fj, x, *w)
        print(f"[{label:9s}] fwd: {t:.2f} ms/call ({t/B:.2f} ms/vol)",
              flush=True)

        def loss(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))

        gj = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
        t = timeit(gj, x, *w, iters=10)
        print(f"[{label:9s}] fwd+bwd: {t:.2f} ms/call ({t/B:.2f} ms/vol)",
              flush=True)


if __name__ == "__main__":
    main()
