"""Split the fused patch-embed cost: relayout alone vs LN+proj+LN alone,
and the fused kernel at several hb (rows-per-program) choices.

Usage: python tools/bench_patchify2.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    np.asarray(jnp.ravel(x)[:4])


def timeit(name, fn, *args, iters=10):
    import jax

    cj = jax.jit(fn)
    out = cj(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = cj(*args)
        _sync(out)
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:38s} {best * 1e3:8.3f} ms", file=sys.stderr)
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.ops.pallas import patchify as PF
    from ct_clip_tpu.ops.norms import layer_norm

    b, F, H, W = 8, 240, 480, 480
    pt, p, dim = 10, 20, 512
    pd = pt * p * p
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(b, F, H, W) * 2 - 1, jnp.bfloat16)
    s1 = jnp.asarray(rng.rand(pd) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(pd) * 0.1, jnp.float32)
    wi = jnp.asarray(rng.randn(pd, dim) * pd ** -0.5, jnp.float32)
    pbias = jnp.asarray(rng.randn(dim) * 0.1, jnp.float32)
    s2 = jnp.asarray(rng.rand(dim) + 0.5, jnp.float32)
    b2 = jnp.asarray(rng.randn(dim) * 0.1, jnp.float32)
    eps = 1e-5

    patches = jnp.asarray(rng.rand(b, 13824, pd) * 2 - 1, jnp.bfloat16)

    def lnmm(pat):
        x = layer_norm(pat, s1, b1, eps)
        y = jnp.einsum("bnp,pd->bnd", x.astype(jnp.bfloat16),
                       wi.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16) + pbias.astype(jnp.bfloat16)
        return layer_norm(yb, s2, b2, eps).astype(jnp.bfloat16)

    timeit("relayout kernel alone", lambda v: PF._pallas_rearrange(v, pt, p),
           video)
    timeit("LN+proj+LN on patches (XLA)", lnmm, patches)
    timeit("fused embed (current hb)", lambda v: PF._pallas_patch_embed(
        v, s1, b1, wi, pbias, s2, b2, pt, p, eps, jnp.bfloat16), video)

    import ct_clip_tpu.ops.pallas.patchify as PFM
    orig = PFM._pick_hb
    for hb_force in (8, 12, 24):
        PFM._pick_hb = lambda *a, **k: hb_force
        try:
            timeit(f"fused embed (hb={hb_force})",
                   lambda v: PF._pallas_patch_embed(
                       v, s1, b1, wi, pbias, s2, b2, pt, p, eps,
                       jnp.bfloat16), video)
        except Exception as e:  # noqa: BLE001
            print(f"hb={hb_force}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
        finally:
            PFM._pick_hb = orig


if __name__ == "__main__":
    main()
