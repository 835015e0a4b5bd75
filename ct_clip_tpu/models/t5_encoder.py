"""TPU-native T5 v1.1 encoder (flax) for MaskGIT text conditioning.

The reference conditions its generative stack on a frozen HF torch
`google/t5-v1_1-base` encoder (transformer_maskgit/t5.py:18-104,
MaskGITTransformer.py:347-390).  This is the same architecture re-built
JAX-first so conditioning runs on-device inside the jitted sampling loop
instead of round-tripping through torch on the host:

  * RMS layer norm (no mean subtraction, no bias), f32 statistics.
  * Relative-position bucket bias (32 buckets, max distance 128,
    bidirectional), computed ONCE per call and shared across layers, like
    T5 shares the layer-0 embedding.
  * Unscaled dot-product attention (T5 folds the 1/sqrt(d) into the init)
    riding the fused Pallas attention path when shapes allow.
  * Gated-GELU feed-forward (v1.1) or ReLU (v1.0), selected by config.

`convert_hf_t5_encoder` maps an HF `T5EncoderModel` state_dict onto this
module's parameter tree (numerics parity-tested in tests/test_t5.py), so
`google/t5-v1_1-base` weights drop in when they are on disk.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_gelu: bool = True  # v1.1; False = v1.0 ReLU FFN
    dtype: Any = jnp.float32


def t5_base_v1_1() -> T5EncoderConfig:
    """google/t5-v1_1-base (t5.py:18: DEFAULT_T5_NAME)."""
    return T5EncoderConfig()


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5 bucket map: half the buckets for each sign, half of
    those exact small offsets, the rest log-spaced out to max_distance."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rel_f / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, large)


class T5RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (x * w).astype(self.dtype)


class T5SelfAttention(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, x, pos_bias, key_bias):
        from ..ops.pallas.attention import fused_attention

        cfg = self.cfg
        h, dk = cfg.num_heads, cfg.d_kv
        inner = h * dk
        dense = lambda name: nn.Dense(  # noqa: E731
            inner, use_bias=False, dtype=cfg.dtype, name=name)
        b, n, _ = x.shape
        # head-major (b, h, n, dk); q deliberately NOT scaled (T5 semantics)
        split = lambda t: t.reshape(b, n, h, dk).transpose(0, 2, 1, 3)  # noqa: E731
        q = split(dense("q")(x))
        k = split(dense("k")(x))
        v = split(dense("v")(x))
        out = fused_attention(q, k, v, bias=pos_bias, key_bias=key_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        name="o")(out)


class T5FeedForward(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda d, name: nn.Dense(  # noqa: E731
            d, use_bias=False, dtype=cfg.dtype, name=name)
        if cfg.gated_gelu:
            # v1.1: gelu_new(wi_0 x) * (wi_1 x) — tanh-approximated GELU
            gate = jax.nn.gelu(dense(cfg.d_ff, "wi_0")(x), approximate=True)
            x = gate * dense(cfg.d_ff, "wi_1")(x)
        else:
            x = jax.nn.relu(dense(cfg.d_ff, "wi")(x))
        return dense(cfg.d_model, "wo")(x)


class T5Encoder(nn.Module):
    """Token ids + mask -> final hidden states (pad rows NOT zeroed here;
    `encode_text`-style callers zero them, t5.py:96-104)."""

    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                     name="shared")(ids)

        n = ids.shape[1]
        pos = jnp.arange(n)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        # (n, n, h) -> (1, h, n, n), computed once, shared by every layer
        rel = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                       dtype=cfg.dtype, name="relative_attention_bias")(
            buckets)
        pos_bias = rel.transpose(2, 0, 1)[None]
        key_bias = None
        if mask is not None:
            key_bias = jnp.where(mask.astype(bool), 0.0, -1e9).astype(
                jnp.float32)

        for i in range(cfg.num_layers):
            y = T5RMSNorm(cfg.d_model, cfg.layer_norm_eps, cfg.dtype,
                          name=f"block_{i}_attn_norm")(x)
            x = x + T5SelfAttention(cfg, name=f"block_{i}_attn")(
                y, pos_bias, key_bias)
            y = T5RMSNorm(cfg.d_model, cfg.layer_norm_eps, cfg.dtype,
                          name=f"block_{i}_ff_norm")(x)
            x = x + T5FeedForward(cfg, name=f"block_{i}_ff")(y)

        return T5RMSNorm(cfg.d_model, cfg.layer_norm_eps, cfg.dtype,
                         name="final_norm")(x)


# ------------------------------------------------------------- HF converter

def convert_hf_t5_encoder(state_dict: Dict[str, Any],
                          cfg: T5EncoderConfig) -> Dict[str, Any]:
    """HF `T5EncoderModel.state_dict()` -> this module's params tree.
    torch Linear weights are (out, in); flax Dense kernels are (in, out)."""

    def arr(key, transpose=False):
        w = np.asarray(state_dict[key].detach().cpu().numpy()
                       if hasattr(state_dict[key], "detach")
                       else state_dict[key], np.float32)
        return w.T if transpose else w

    params: Dict[str, Any] = {
        "shared": {"embedding": arr("shared.weight")},
        "relative_attention_bias": {"embedding": arr(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight")},
        "final_norm": {"weight": arr("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        base = f"encoder.block.{i}"
        attn = {name: {"kernel": arr(
            f"{base}.layer.0.SelfAttention.{name}.weight", transpose=True)}
            for name in ("q", "k", "v", "o")}
        if cfg.gated_gelu:
            ff = {name: {"kernel": arr(
                f"{base}.layer.1.DenseReluDense.{name}.weight",
                transpose=True)} for name in ("wi_0", "wi_1", "wo")}
        else:
            ff = {name: {"kernel": arr(
                f"{base}.layer.1.DenseReluDense.{name}.weight",
                transpose=True)} for name in ("wi", "wo")}
        params[f"block_{i}_attn"] = attn
        params[f"block_{i}_ff"] = ff
        params[f"block_{i}_attn_norm"] = {
            "weight": arr(f"{base}.layer.0.layer_norm.weight")}
        params[f"block_{i}_ff_norm"] = {
            "weight": arr(f"{base}.layer.1.layer_norm.weight")}
    return {"params": jax.tree.map(jnp.asarray, params)}
