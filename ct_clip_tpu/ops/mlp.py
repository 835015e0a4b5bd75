"""GEGLU feedforward blocks.

Two conventions exist in the reference:
  * maskgit-style (transformer_maskgit/attention.py:39-52):
      inner = int(mult * 2/3 * dim);  LN -> Linear(dim, 2*inner, no bias)
      -> gelu(gate) * x -> Linear(inner, dim, no bias)
  * clip-style (CT_CLIP/ct_clip/ct_clip.py:175-194):
      inner = dim * mult;  Linear(dim, 2*inner, no bias) -> x * gelu(gate)
      -> ClipLayerNorm(inner) -> Linear(inner, dim, no bias)
      (wrapped in PreNorm by the caller, ct_clip.py:252-257)

torch chunk(2, dim=-1) order: first half = x, second half = gate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import ClipLayerNorm, StandardLayerNorm


def geglu(x: jnp.ndarray) -> jnp.ndarray:
    val, gate = jnp.split(x, 2, axis=-1)
    # torch F.gelu default is the exact erf formulation.
    return val * jax.nn.gelu(gate, approximate=False)


class MaskgitFeedForward(nn.Module):
    """transformer_maskgit/attention.py:44-52 (includes its own leading LN)."""

    dim: int
    mult: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # leading norm is a standard torch nn.LayerNorm (attention.py:47)
        inner = int(self.mult * (2.0 / 3.0) * self.dim)
        x = StandardLayerNorm(self.dim, name="norm")(x)
        x = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="wi")(x)
        x = geglu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="wo")(x)
        return x


class ClipFeedForward(nn.Module):
    """CT_CLIP/ct_clip/ct_clip.py:180-194 (no leading LN; caller PreNorms)."""

    dim: int
    mult: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        x = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="wi")(x)
        x = geglu(x)
        x = ClipLayerNorm(inner, name="norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="wo")(x)
        return x
