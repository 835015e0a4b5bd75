"""CTViT: 3D factorized-attention ViT with a cosine-VQ bottleneck.

Capability parity with transformer_maskgit/ctvit.py:118-525 (production path:
`to_patch_emb` whole-volume patchify -> spatial transformer over each 24x24
plane with continuous position bias -> temporal transformer over each
24-frame column -> cosine VQ), plus a *working* decoder mirror (the
reference's decoder references modules never constructed, ctvit.py:325-335 —
dead code; here `with_decoder=True` builds the mirror for the VQGAN/MaskGIT
stack).

TPU-first mapping:
  * patchify = one reshape/transpose + a (b*13824, 4000)x(4000, 512) matmul
    — pure MXU work, no conv needed.
  * factorized attention = two batched attentions with tiny sequence lengths
    (576 and 24); batch dims (b*24 / b*576) keep the MXU busy.
  * VQ assignment = one (N, 512)x(512, 8192) matmul + argmax.
Input layout is channels-last (b, frames, H, W, c) as is natural for TPU;
the torch layout (b, c, f, H, W) is accepted via `from_torch_layout`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import CTViTConfig
from ..ops.attention import ContinuousPositionBias, MaskgitTransformer
from ..ops.norms import StandardLayerNorm
from ..ops.vq import CosineVQ


def from_torch_layout(video_bcfhw: jnp.ndarray) -> jnp.ndarray:
    """(b, c, f, H, W) -> (b, f, H, W, c)."""
    return jnp.transpose(video_bcfhw, (0, 2, 3, 4, 1))


class CTViT(nn.Module):
    config: CTViTConfig
    dtype: jnp.dtype = jnp.float32

    def patchify(self, video: jnp.ndarray) -> jnp.ndarray:
        """(b, f, H, W, c) -> (b, t, h, w, c*pt*p1*p2) with the reference's
        '(c pt p1 p2)' flattening order (ctvit.py:170) so converted torch
        patch-embedding weights apply unchanged."""
        cfg = self.config
        b, f, H, W, c = video.shape
        pt, p = cfg.temporal_patch_size, cfg.patch_size
        t, h, w = f // pt, H // p, W // p
        x = video.reshape(b, t, pt, h, p, w, p, c)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b t h w c pt p1 p2
        return x.reshape(b, t, h, w, c * pt * p * p)

    @nn.compact
    def __call__(self, video: jnp.ndarray, *, return_encoded_tokens: bool = True,
                 return_only_codebook_ids: bool = False, train: bool = False,
                 return_recons: bool = False, deterministic: bool = True):
        cfg = self.config
        assert video.shape[2] == cfg.image_size and video.shape[3] == cfg.image_size

        tokens = self.patchify(video.astype(self.dtype))
        patch_dim = tokens.shape[-1]
        tokens = StandardLayerNorm(patch_dim, name="patch_norm_in")(tokens)
        tokens = nn.Dense(cfg.dim, dtype=self.dtype, name="patch_proj")(tokens)
        tokens = StandardLayerNorm(cfg.dim, name="patch_norm_out")(tokens)

        tokens = self.encode(tokens, deterministic)
        b, t, h, w, d = tokens.shape

        flat = tokens.reshape(b, t * h * w, d)
        quantized, indices, commit_loss = CosineVQ(
            dim=cfg.dim, codebook_size=cfg.codebook_size, decay=cfg.vq_decay,
            commitment_weight=cfg.vq_commitment_weight, eps=cfg.vq_eps,
            name="vq")(flat, train=train)

        if return_only_codebook_ids:
            return indices.reshape(b, t, h, w)

        quantized = quantized.reshape(b, t, h, w, d)
        if return_encoded_tokens:
            return quantized

        if not cfg.with_decoder:
            return quantized, indices.reshape(b, t, h, w), commit_loss

        recon = self.decode(quantized, deterministic)
        if return_recons:
            return recon, indices.reshape(b, t, h, w), commit_loss
        return recon

    def encode(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Factorized encode (ctvit.py:282-307): spatial attention over each
        (h*w) plane, then temporal attention over each t column."""
        cfg = self.config
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        attn_bias = ContinuousPositionBias(
            dim=cfg.dim, heads=cfg.heads, num_dims=2,
            name="spatial_rel_pos_bias")(h, w)

        x = tokens.reshape(b * t, h * w, d)
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.spatial_depth, dim_head=cfg.dim_head,
            heads=cfg.heads, peg=True, peg_causal=True,
            attn_dropout=cfg.attn_dropout, ff_dropout=cfg.ff_dropout,
            dtype=self.dtype, name="enc_spatial_transformer")(
                x, video_shape=video_shape, attn_bias=attn_bias,
                deterministic=deterministic)
        x = x.reshape(b, t, h, w, d)

        # temporal: (b, t, h, w, d) -> (b*h*w, t, d); PEG inside sees the same
        # video_shape, reproducing the reference's memory reinterpretation
        # (ctvit.py:299-303) for checkpoint parity.
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.temporal_depth, dim_head=cfg.dim_head,
            heads=cfg.heads, peg=True, peg_causal=True,
            attn_dropout=cfg.attn_dropout, ff_dropout=cfg.ff_dropout,
            dtype=self.dtype, name="enc_temporal_transformer")(
                x, video_shape=video_shape, deterministic=deterministic)
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        return x

    def decode(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Mirror of encode (the reference's intended-but-dead decode,
        ctvit.py:309-351): temporal -> spatial -> to_pixels."""
        cfg = self.config
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        x = tokens.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.temporal_depth, dim_head=cfg.dim_head,
            heads=cfg.heads, peg=True, peg_causal=True, dtype=self.dtype,
            name="dec_temporal_transformer")(
                x, video_shape=video_shape, deterministic=deterministic)
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)

        attn_bias = ContinuousPositionBias(
            dim=cfg.dim, heads=cfg.heads, num_dims=2,
            name="dec_spatial_rel_pos_bias")(h, w)
        x = x.reshape(b * t, h * w, d)
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.spatial_depth, dim_head=cfg.dim_head,
            heads=cfg.heads, peg=True, peg_causal=True, dtype=self.dtype,
            name="dec_spatial_transformer")(
                x, video_shape=video_shape, attn_bias=attn_bias,
                deterministic=deterministic)
        x = x.reshape(b, t, h, w, d)

        pt, p, c = cfg.temporal_patch_size, cfg.patch_size, cfg.channels
        pix = nn.Dense(c * pt * p * p, dtype=self.dtype, name="to_pixels")(x)
        pix = pix.reshape(b, t, h, w, c, pt, p, p)
        pix = pix.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b t pt h p1 w p2 c
        return pix.reshape(b, t * pt, h * p, w * p, c)

    def decode_from_codebook_indices(self, variables, indices: jnp.ndarray,
                                     grid: Tuple[int, int, int]):
        """ctvit.py:274-276 equivalent; indices (b, N) or (b, t, h, w)."""
        embed = variables["vq"]["vq"]["embed"]
        t, h, w = grid
        codes = jnp.take(embed, indices.reshape(indices.shape[0], -1), axis=0)
        codes = codes.reshape(indices.shape[0], t, h, w, -1)
        return self.apply(variables, codes, method=self.decode)
