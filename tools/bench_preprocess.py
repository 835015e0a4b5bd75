"""On-chip breakdown of the device-side ingest pipeline at production
shapes: (Z, Y, X) int16 resident in HBM -> transpose -> fused preprocess
(HU rescale + trilinear resample + crop/pad) -> batch stack + bf16 cast.

Compares the gather-form resample (three 1D `take` lerps) against the
matmul form (per-axis (out, in) resample matrices on the MXU) at HIGHEST
and HIGH precision, and reports max|diff| vs the gather form.
Usage: python tools/bench_preprocess.py [Z ...]   (default 300)
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    np.asarray(jnp.ravel(x)[:4])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:44s} {best * 1e3:8.2f} ms", file=sys.stderr)
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.ops import resample as R
    from ct_clip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    zs = [int(a) for a in sys.argv[1:]] or [300]
    for z in zs:
        zb = ((z + 63) // 64) * 64
        rng = np.random.RandomState(0)
        raw = rng.randint(0, 2200, (zb, 512, 512)).astype(np.int16)
        raw[z:] = 0
        dv = jax.device_put(jnp.asarray(raw))
        _sync(dv)
        spacing = jnp.asarray([1.0, 0.75, 0.75], jnp.float32)
        true = jnp.asarray([z, 512, 512], jnp.int32)
        slope, icpt = jnp.float32(1.0), jnp.float32(-1024.0)
        print(f"--- Z={z} (bucket {zb})", file=sys.stderr)

        tr = jax.jit(lambda v: jnp.transpose(v, (0, 2, 1)))
        timeit("transpose int16 (Z,Y,X)->(Z,X,Y)", tr, dv)

        def pre(method):
            return jax.jit(partial(
                R.preprocess_volume, clip_before_resample=True,
                method=method))

        ref = None
        for method in ("gather", "matmul"):
            out, _ = timeit(
                f"preprocess_volume[{method}]", pre(method),
                tr(dv), spacing, slope, icpt, true)
            if ref is None:
                ref = np.asarray(out)
            else:
                d = np.abs(np.asarray(out) - ref)
                print(f"  max|diff| vs gather = {d.max():.2e}",
                      file=sys.stderr)

        # zyx direct path (relayout folded into the x contraction) at both
        # matmul precisions, plus the fused bf16 output the bench ships
        for prec in ("HIGHEST", "HIGH"):
            fn = jax.jit(partial(
                R.preprocess_volume, clip_before_resample=True,
                method="matmul", input_layout="zyx",
                matmul_precision=getattr(jax.lax.Precision, prec),
                out_dtype=jnp.bfloat16))
            out, _ = timeit(f"zyx matmul[{prec}] -> bf16", fn,
                            dv, spacing, slope, icpt, true)
            d = np.abs(np.asarray(out, np.float32) - ref)
            print(f"  max|diff| vs gather = {d.max():.2e}", file=sys.stderr)

        # batch-of-8 stack of bf16 outputs (the bench step glue)
        outs = [pre("matmul")(tr(dv), spacing, slope, icpt,
                              true).astype(jnp.bfloat16)] * 8
        stack = jax.jit(lambda *o: jnp.stack(o)[..., None])
        timeit("stack(8) bf16", stack, *outs)


if __name__ == "__main__":
    main()
