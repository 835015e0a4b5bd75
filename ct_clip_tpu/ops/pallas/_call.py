"""pallas_call wrapper that pins matmul precision to DEFAULT inside kernels.

Mosaic compiles kernel dots itself; a global
`jax.config.update("jax_default_matmul_precision", "highest")` (set e.g. by
test harnesses for exact f32 XLA comparisons) leaks into the kernel trace and
makes Mosaic reject bf16 dot_generals with "Bad lhs type".  bf16 kernel
numerics are pinned via operand dtypes + preferred_element_type; dots that
must stay true-f32 when fed f32 operands (DEFAULT runs those as one bf16
MXU pass) opt back in per-site with `precision=dot_precision(...)`.

Interpret mode: `set_interpret(True)` (or env CTCLIP_PALLAS_INTERPRET=1)
routes every kernel through `pl.pallas_call(interpret=True)` and makes the
plan gates treat kernels as available off-TPU, so grid/accumulation logic
(notably the hand-written backwards) is executable in CPU CI.  Callers must
`jax.clear_caches()` around a toggle — plans are resolved at trace time.
The in-kernel TPU PRNG (attention dropout) has no interpret rule and stays
TPU-only.

The pallas import stays lazy so CPU-only users never load Mosaic.
"""
from __future__ import annotations

import os

import jax

_interpret = False


def set_interpret(on: bool) -> None:
    global _interpret
    _interpret = on


def interpret_enabled() -> bool:
    return _interpret or os.environ.get("CTCLIP_PALLAS_INTERPRET", "") == "1"


def kernels_supported() -> bool:
    """True when Pallas kernels can execute here: a real TPU backend, or
    interpret mode (kernel logic run as regular JAX ops on any backend)."""
    if interpret_enabled():
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def dot_precision(*operands):
    """Per-dot precision inside a kernel body.  The wrapper below pins the
    trace-time default to DEFAULT (Mosaic rejects non-DEFAULT bf16 dots),
    but DEFAULT runs *f32* operands as a single bf16 MXU pass (~1e-1 abs
    error at n=256).  Dots whose numerics must track the operand dtype pass
    `precision=dot_precision(a, b)`: full f32 multi-pass when every operand
    is f32, DEFAULT otherwise."""
    import jax.numpy as jnp

    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def mm_precision_for(dtype) -> str:
    """Kernel-wide matmul precision for kernels whose dots all follow one
    compute dtype: "highest" keeps f32 configs true-f32 on the MXU,
    "default" is the only precision Mosaic accepts for bf16 dots."""
    import jax.numpy as jnp

    return "highest" if dtype == jnp.float32 else "default"


def pallas_call(*args, mm_precision: str = "default", **kwargs):
    from jax.experimental import pallas as pl

    if interpret_enabled():
        kwargs = {**kwargs, "interpret": True}
    inner = pl.pallas_call(*args, **kwargs)

    def call(*operands):
        with jax.default_matmul_precision(mm_precision):
            return inner(*operands)

    return call
