"""On-chip micro-benchmark for the fused spatial QK-norm attention sublayer.

Production CTViT spatial shape: (b*t, n, dim) = (192, 576, 512), 8 heads x 32
(batch 8 volumes).  Prints fwd / bwd per-call times for the Pallas kernel and
for component ablations (score+PV only, projections only) to locate the gap
to roofline.

Run on the chip:  python tools/bench_spatial_attn.py
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

from ct_clip_tpu.ops.pallas.spatial_attention import (
    fused_spatial_qknorm_attention)

B, N, DIM, H, DH = 192, 576, 512, 8, 32
HD = H * DH
SCALE = 8.0
DT = jnp.bfloat16


def _sync(out):
    """block_until_ready does not reliably block through the axon tunnel;
    materializing a tiny slice does (verify skill, round-1 finding)."""
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
    x = jnp.asarray(rng.randn(B, N, DIM), DT)
    gamma = jnp.ones((DIM,), jnp.float32)
    wq = jnp.asarray(rng.randn(DIM, HD) * 0.05, DT)
    wkv = jnp.asarray(rng.randn(DIM, 2 * HD) * 0.05, DT)
    qs = jnp.asarray(rng.rand(DH) + 0.5, jnp.float32)
    ks = jnp.asarray(rng.rand(DH) + 0.5, jnp.float32)
    wout = jnp.asarray(rng.randn(HD, DIM) * 0.05, DT)
    bias = jnp.asarray(rng.randn(H, N, N), jnp.float32)

    fwd = jax.jit(partial(fused_spatial_qknorm_attention, heads=H,
                          dim_head=DH, scale=SCALE, dtype=DT, residual=True))
    t = timeit(fwd, x, gamma, wq, wkv, qs, ks, wout, bias)
    print(f"fused fwd: {t:.2f} ms/call ({t/8:.2f} ms/vol)", flush=True)

    def loss(x, gamma, wq, wkv, qs, ks, wout, bias):
        return jnp.sum(fused_spatial_qknorm_attention(
            x, gamma, wq, wkv, qs, ks, wout, bias, H, DH, SCALE, DT,
            True).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6, 7)))
    t = timeit(grad, x, gamma, wq, wkv, qs, ks, wout, bias, iters=10)
    print(f"fused fwd+bwd: {t:.2f} ms/call ({t/8:.2f} ms/vol)", flush=True)

    # ---- ablations: raw matmul rooflines at these shapes ----
    q = jnp.asarray(rng.randn(B, N, HD), DT)
    k = jnp.asarray(rng.randn(B, N, HD), DT)
    v = jnp.asarray(rng.randn(B, N, HD), DT)

    @jax.jit
    def scores_only(q, k):
        qh = q.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
        return jnp.einsum("bhid,bhjd->bhij", qh, kh,
                          preferred_element_type=jnp.float32)

    t = timeit(scores_only, q, k)
    print(f"xla scores (incl head relayout): {t:.2f} ms")

    p = jnp.asarray(rng.rand(B, H, N, N), DT)

    @jax.jit
    def pv_only(p, v):
        vh = v.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
        return jnp.einsum("bhij,bhjd->bhid", p, vh,
                          preferred_element_type=jnp.float32)

    t = timeit(pv_only, p, v)
    print(f"xla pv (incl head relayout): {t:.2f} ms")

    w1 = jnp.asarray(rng.randn(DIM, HD) * 0.05, DT)
    w2 = jnp.asarray(rng.randn(DIM, 2 * HD) * 0.05, DT)
    w3 = jnp.asarray(rng.randn(HD, DIM) * 0.05, DT)

    @jax.jit
    def proj_only(x):
        a = jnp.einsum("bnd,dk->bnk", x, w1,
                       preferred_element_type=jnp.float32).astype(DT)
        b2 = jnp.einsum("bnd,dk->bnk", x, w2,
                        preferred_element_type=jnp.float32).astype(DT)
        c = jnp.einsum("bnk,kd->bnd", a, w3,
                       preferred_element_type=jnp.float32)
        return c + b2[..., :DIM]

    t = timeit(proj_only, x)
    print(f"xla projections: {t:.2f} ms")


if __name__ == "__main__":
    main()
