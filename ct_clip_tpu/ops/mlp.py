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


class _LNParams(nn.Module):
    """Parameter holder matching StandardLayerNorm's tree ({scale, bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseKernel(nn.Module):
    """Parameter holder matching Dense(use_bias=False)'s tree ({kernel})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_features, self.features))


class MaskgitFeedForward(nn.Module):
    """transformer_maskgit/attention.py:44-52 (includes its own leading LN).

    The LN + both matmuls + exact-erf GEGLU run as one fused Pallas kernel on
    TPU when dropout is inactive (ops/pallas/ffn.py; the (rows, 2*inner)
    intermediate stays in VMEM); parameter tree is unchanged
    (norm/{scale,bias}, wi/kernel, wo/kernel)."""

    dim: int
    mult: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    residual: bool = False  # fold the transformer's `ff(x) + x` in-kernel

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # leading norm is a standard torch nn.LayerNorm (attention.py:47)
        inner = int(self.mult * (2.0 / 3.0) * self.dim)
        scale, bias = _LNParams(self.dim, name="norm")()
        wi = _DenseKernel(self.dim, inner * 2, name="wi")()
        wo = _DenseKernel(inner, self.dim, name="wo")()

        dropout_active = self.dropout > 0.0 and not deterministic
        if not dropout_active:
            from .pallas.ffn import fused_geglu_ff

            lead = x.shape[:-1]
            out = fused_geglu_ff(
                x.reshape(-1, self.dim),
                scale, bias,
                wi[:, :inner].astype(self.dtype),
                wi[:, inner:].astype(self.dtype),
                wo.astype(self.dtype), 1e-5, self.residual)
            return out.reshape(*lead, self.dim)

        from .norms import layer_norm

        x_in = x
        x = layer_norm(x, scale, bias)
        x = jnp.dot(x.astype(self.dtype), wi.astype(self.dtype))
        x = geglu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = jnp.dot(x.astype(self.dtype), wo.astype(self.dtype))
        return out + x_in if self.residual else out


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
