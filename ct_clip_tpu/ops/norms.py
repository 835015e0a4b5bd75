"""LayerNorm variants used across the two reference packages.

The reference has two gamma-only LayerNorms with subtly different numerics:
  * `transformer_maskgit/attention.py:28-35` — gamma param + zero-beta buffer,
    dispatched to F.layer_norm (eps 1e-5 always).
  * `CT_CLIP/ct_clip/ct_clip.py:107-116` — hand-rolled (x-mean)*rsqrt(var+eps)*g
    with dtype-dependent eps (1e-5 fp32 / 1e-3 otherwise).
Plus standard torch nn.LayerNorm (gamma+beta) inside CTViT's patch embedding
(`ctvit.py:170-175`) and HF BERT (eps 1e-12).

All are implemented as pure functions over explicit scale/bias so they fuse
cleanly under XLA; flax modules wrap them for parameter management.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def layer_norm(x: jnp.ndarray, scale: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-5) -> jnp.ndarray:
    """Standard last-axis layernorm computed in f32 for stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


class _GammaParam(nn.Module):
    """Parameter holder matching GammaLayerNorm's tree ({gamma}); lets a
    caller reuse the raw gamma (e.g. inside a fused Pallas kernel) while
    keeping checkpoint-identical parameter paths."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("gamma", nn.initializers.ones, (self.dim,))


class GammaLayerNorm(nn.Module):
    """Gamma-only LN (bias is an untrained zero buffer).

    Matches transformer_maskgit/attention.py:28-35."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return layer_norm(x, gamma, None, self.eps)


class ClipLayerNorm(nn.Module):
    """CT_CLIP's hand-rolled gamma-only LN with dtype-dependent eps
    (ct_clip.py:107-116).  Numerically identical to GammaLayerNorm in f32."""

    dim: int

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        return layer_norm(x, g, None, eps)


class StandardLayerNorm(nn.Module):
    """torch nn.LayerNorm equivalent: gamma + beta."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, scale, bias, self.eps)


def l2norm(t: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(t, dim=-1) equivalent (torch clamps the norm at eps=1e-12).

    Written via max(sum_sq, eps^2) BEFORE the sqrt so the backward is finite
    at t == 0 (jnp.linalg.norm's gradient at zero is 0/0 = NaN; exactly-zero
    q/k rows do occur — the -1-padded volume regions produce constant patches
    whose layer-normed embeddings are exactly zero at init)."""
    sumsq = jnp.sum(t * t, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sumsq, eps * eps))
    return t / norm
