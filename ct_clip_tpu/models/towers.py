"""Fallback text/vision towers (CT_CLIP/ct_clip/ct_clip.py:290-385).

Production CT-CLIP always injects CXR-BERT + CTViT (scripts/run_train.py:9,17)
but the package capability includes built-in towers: `TextTransformer`
(token + abs-pos or rotary embeddings, optional prepended CLS token, causal
option) and a 2D `VisionTransformer` (patchify, pos emb, PatchDropout,
mean-pooled CLS prepend).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import ClipTransformer, rotary_freqs


class TextTransformer(nn.Module):
    """ct_clip.py:290-333."""

    dim: int
    num_tokens: int
    max_seq_len: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    rotary_pos_emb: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask=None, deterministic=True):
        b, n = token_ids.shape
        x = nn.Embed(self.num_tokens, self.dim, dtype=self.dtype,
                     name="token_emb")(token_ids)

        rot = None
        if self.rotary_pos_emb:
            # reference computes freqs for n+1 positions (ct_clip.py:322-324),
            # which only fits the non-causal CLS-prepended sequence; size the
            # freqs to the actual final length so causal+rotary also works.
            rot = rotary_freqs(n + (0 if self.causal else 1),
                               min(self.dim_head, 32))
        else:
            pos = nn.Embed(self.max_seq_len, self.dim, dtype=self.dtype,
                           name="abs_pos_emb")(jnp.arange(n))
            x = x + pos[None]

        if not self.causal:  # CLS token prepended (ct_clip.py:309,326-331)
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (self.dim,))
            cls_tokens = jnp.broadcast_to(cls[None, None, :].astype(x.dtype),
                                          (b, 1, self.dim))
            x = jnp.concatenate([cls_tokens, x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        return ClipTransformer(self.dim, depth=self.depth,
                               dim_head=self.dim_head, heads=self.heads,
                               causal=self.causal, dtype=self.dtype,
                               name="transformer")(
                                   x, rotary_pos_emb=rot,
                                   mask=mask if mask is None else mask.astype(bool),
                                   deterministic=deterministic)


def patch_dropout(rng, x, prob: float):
    """ct_clip.py:129-146: keep a random subset of max(1, n*(1-prob))
    patches per sample (training only)."""
    b, n, _ = x.shape
    num_keep = max(1, int(n * (1 - prob)))
    scores = jax.random.normal(rng, (b, n))
    _, keep = jax.lax.top_k(scores, num_keep)
    return jnp.take_along_axis(x, keep[..., None], axis=1)


class VisionTransformer(nn.Module):
    """2D fallback vision tower (ct_clip.py:335-385); returns
    (b, 1 + num_patches_kept, dim) with the mean-pooled CLS first."""

    dim: int
    image_size: int
    patch_size: int
    channels: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    patch_dropout_prob: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, keep_all_patches: bool = False,
                 deterministic: bool = True):
        # images: (b, H, W, c) channels-last
        b, H, W, c = images.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = images.reshape(b, h, p, w, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h * w, p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="to_tokens")(x)

        pos = nn.Embed(h * w, self.dim, dtype=self.dtype,
                       name="pos_emb")(jnp.arange(h * w))
        x = x + pos[None]

        if not deterministic and not keep_all_patches and self.patch_dropout_prob > 0:
            x = patch_dropout(self.make_rng("dropout"), x,
                              self.patch_dropout_prob)

        out = ClipTransformer(self.dim, depth=self.depth,
                              dim_head=self.dim_head, heads=self.heads,
                              dtype=self.dtype, name="transformer")(
                                  x, deterministic=deterministic)

        cls = jnp.mean(out, axis=1)
        cls = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_cls_tokens")(cls)
        return jnp.concatenate([cls[:, None, :], out], axis=1)
