"""pallas_call wrapper that pins matmul precision to DEFAULT inside kernels.

Mosaic compiles kernel dots itself; a global
`jax.config.update("jax_default_matmul_precision", "highest")` (set e.g. by
test harnesses for exact f32 XLA comparisons) leaks into the kernel trace and
makes Mosaic reject bf16 dot_generals with "Bad lhs type".  Kernel numerics
are already pinned explicitly via operand dtypes + preferred_element_type,
so DEFAULT is always the correct precision inside a kernel.

The pallas import stays lazy so CPU-only users never load Mosaic.
"""
from __future__ import annotations

import jax


def pallas_call(*args, **kwargs):
    from jax.experimental import pallas as pl

    inner = pl.pallas_call(*args, **kwargs)

    def call(*operands):
        with jax.default_matmul_precision("default"):
            return inner(*operands)

    return call
