"""Small runtime utilities."""
from __future__ import annotations

import functools
import os
from pathlib import Path


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compile of the production
    tower takes minutes through the TPU tunnel; cached reloads are seconds."""
    import jax

    cache_dir = path or os.environ.get("JAX_CACHE_DIR",
                                       str(Path.home() / ".cache" / "jax_cache"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax naming
        pass


def stack_standard(xs, dtype=None):
    """Stack per-volume arrays into a batch in STANDARD (row-major) device
    layout.

    On TPU, plain `jnp.stack` of (13824, 4000) patch-row volumes picks the
    compact entry layout {1,2,0} (13824 lanes — no pad for a 4000-wide
    minor dim), and every consumer Pallas kernel then pays a full-tensor
    relayout copy back to standard inside the scored/train step (measured
    2.77 ms per batch-8 step, ~4 vol/s of zero-shot headline).  2-D arrays
    are standard either way; it is only the stacked 3-D batch that goes
    compact.  This helper jits the stack with a forced standard output
    layout so the batch is born in the layout the kernels consume —
    one write, no downstream copy.  Non-TPU backends: plain stack."""
    import jax
    import jax.numpy as jnp

    xs = list(xs)
    if jax.default_backend() != "tpu":
        out = jnp.stack(xs)
        return out if dtype is None else out.astype(dtype)
    dt = None if dtype is None else jnp.dtype(dtype).name
    return _stack_standard_jit(len(xs), xs[0].ndim + 1, dt)(*xs)


@functools.lru_cache(maxsize=64)
def _stack_standard_jit(n: int, ndim: int, dtype_name: str | None):
    """One cached jitted stack per (arity, rank, out dtype).

    A fresh `jax.jit(lambda ...)` per call never hits the trace/lower
    cache (each lambda is a new callable identity), so every production
    batch paid a full retrace+lower (~1 s through the chip tunnel) — the
    round-4 device-pipeline collapse 52 -> 7.7 vol/s.  The jit's own
    C++ fast path dispatches by input shape/dtype, so keying the factory
    on arity/rank/out-dtype alone is enough for cache-correctness."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(Layout(tuple(range(ndim))),
                 SingleDeviceSharding(jax.devices()[0]))

    # dtype cast rides the same jit: a separate .astype dispatch would
    # re-pick the compact layout and undo the forced one
    def stack(*vs):
        out = jnp.stack(vs)
        return out if dtype_name is None else out.astype(dtype_name)

    return jax.jit(stack, out_shardings=fmt)


def device_put_standard(x):
    """`jax.device_put` pinned to the STANDARD (row-major) layout.

    TPU device_put of a >=3-D host batch picks the compact layout (e.g.
    {1,2,0} for (8, 13824, 4000) bf16 patch rows), and the first kernel
    to consume it pays a full relayout inside the jitted step.  Feeding
    steps standard-layout batches measured 73.3 -> 70.5 ms per batch-8
    zero-shot step on v5e.  Non-TPU backends: plain device_put."""
    import jax

    if jax.default_backend() != "tpu":
        return jax.device_put(x)
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(Layout(tuple(range(x.ndim))),
                 SingleDeviceSharding(jax.devices()[0]))
    return jax.device_put(x, fmt)


def write_table(df, path) -> None:
    """Excel when openpyxl/xlsxwriter is available, CSV fallback — air-gapped
    parity with the reference's xlsx artifacts (scripts/zero_shot.py:161-165,
    scripts/CTCLIPTrainer.py:266-327)."""
    from pathlib import Path

    path = Path(path)
    try:
        df.to_excel(path, index=False)
    except Exception:  # noqa: BLE001 - missing engine
        df.to_csv(path.with_suffix(".csv"), index=False)


def tree_size_bytes(tree) -> int:
    import jax
    import numpy as np

    return sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))
