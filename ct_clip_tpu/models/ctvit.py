"""CTViT: 3D factorized-attention ViT with a cosine-VQ bottleneck.

Capability parity with transformer_maskgit/ctvit.py:118-525 (production path:
`to_patch_emb` whole-volume patchify -> spatial transformer over each 24x24
plane with continuous position bias -> temporal transformer over each
24-frame column -> cosine VQ), plus a *working* decoder mirror (the
reference's decoder references modules never constructed, ctvit.py:325-335 —
dead code; here `with_decoder=True` builds the mirror for the VQGAN/MaskGIT
stack).

TPU-first mapping:
  * patch embedding = fused reshape + pooled-LN + dot_general (see
    `embed_patches`) — no transposed patch tensor is ever materialized
    (tiny-minor-dim layouts get (8,128)-tile-padded 6-100x on TPU).
  * factorized attention = two batched attentions with tiny sequence lengths
    (576 and 24); batch dims (b*24 / b*576) keep the MXU busy.
  * VQ assignment = tiled (N, 512)x(512, 8192) matmuls + argmax (ops/vq.py).
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
from ..ops.mlp import _LNParams
from ..ops.vq import CosineVQ


def from_torch_layout(video_bcfhw: jnp.ndarray) -> jnp.ndarray:
    """(b, c, f, H, W) -> (b, f, H, W, c)."""
    return jnp.transpose(video_bcfhw, (0, 2, 3, 4, 1))


class CTViT(nn.Module):
    config: CTViTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        patch_dim = cfg.patch_dim
        self.patch_norm_in_scale = self.param("patch_norm_in_scale",
                                              nn.initializers.ones, (patch_dim,))
        self.patch_norm_in_bias = self.param("patch_norm_in_bias",
                                             nn.initializers.zeros, (patch_dim,))
        self.patch_proj_kernel = self.param("patch_proj_kernel",
                                            nn.initializers.lecun_normal(),
                                            (patch_dim, cfg.dim))
        self.patch_proj_bias = self.param("patch_proj_bias",
                                          nn.initializers.zeros, (cfg.dim,))
        # raw scale/bias holder (same param tree as StandardLayerNorm) so
        # the out-LN can live inside the fused patch-embed kernel
        self.patch_norm_out = _LNParams(cfg.dim, name="patch_norm_out")

        self.spatial_rel_pos_bias = ContinuousPositionBias(
            dim=cfg.dim, heads=cfg.heads, num_dims=2,
            name="spatial_rel_pos_bias")
        tkw = dict(dim=cfg.dim, dim_head=cfg.dim_head, heads=cfg.heads,
                   peg=True, peg_causal=True, attn_dropout=cfg.attn_dropout,
                   ff_dropout=cfg.ff_dropout, dtype=self.dtype,
                   remat=cfg.remat)
        self.enc_spatial_transformer = MaskgitTransformer(
            depth=cfg.spatial_depth, name="enc_spatial_transformer", **tkw)
        self.enc_temporal_transformer = MaskgitTransformer(
            depth=cfg.temporal_depth, name="enc_temporal_transformer", **tkw)
        self.vq = CosineVQ(dim=cfg.dim, codebook_size=cfg.codebook_size,
                           decay=cfg.vq_decay,
                           commitment_weight=cfg.vq_commitment_weight,
                           eps=cfg.vq_eps, axis_name=cfg.vq_axis_name,
                           exact_sim=cfg.vq_exact_sim, name="vq")

        if cfg.with_decoder:
            self.dec_spatial_rel_pos_bias = ContinuousPositionBias(
                dim=cfg.dim, heads=cfg.heads, num_dims=2,
                name="dec_spatial_rel_pos_bias")
            self.dec_temporal_transformer = MaskgitTransformer(
                depth=cfg.temporal_depth, name="dec_temporal_transformer", **tkw)
            self.dec_spatial_transformer = MaskgitTransformer(
                depth=cfg.spatial_depth, name="dec_spatial_transformer", **tkw)
            self.to_pixels = nn.Dense(cfg.patch_dim, dtype=self.dtype,
                                      name="to_pixels")

    # ------------------------------------------------------------- embedding
    @staticmethod
    def patch_permutation(num_frames: int, image_size: int, channels: int,
                          temporal_patch_size: int, patch_size: int):
        """Flat voxel permutation: patch-major order (t, h, w)x(c, pt, p1, p2)
        -> row-major (f, H, W, c) voxel indices.  Precomputed once (numpy)."""
        import numpy as np

        f, H = num_frames, image_size
        W, c = image_size, channels
        pt, p = temporal_patch_size, patch_size
        t, h, w = f // pt, H // p, W // p
        ti, hi, wi, ci, zi, p1, p2 = np.meshgrid(
            np.arange(t), np.arange(h), np.arange(w), np.arange(c),
            np.arange(pt), np.arange(p), np.arange(p), indexing="ij")
        idx = (((ti * pt + zi) * H + (hi * p + p1)) * W + (wi * p + p2)) * c + ci
        return idx.reshape(-1).astype(np.int32)

    def embed_patches(self, video: jnp.ndarray,
                      train: bool = False) -> jnp.ndarray:
        """Fused patchify + patch-LN + projection + LN:
        (b, f, H, W, c) -> (b, t, h, w, dim).

        A 3-D input (b, t*h*w, patch_dim) is accepted as pre-shuffled
        patch-major rows (the ingest pipeline's native output,
        ops/resample.py preprocess_to_patch_rows): the lane-offset patchify
        shuffle is skipped and the chain is one fused LN -> projection -> LN
        kernel.

        Replicates to_patch_emb (ctvit.py:170-175: Rearrange to
        '(c pt p1 p2)' patches -> LayerNorm(4000) -> Linear(4000, 512) ->
        LayerNorm(512)).  The rearrange is done as ONE flat gather with a
        precomputed permutation instead of reshape/transpose: any transposed
        layout whose minor dims are the tiny patch extents (20, 20, 10, 1)
        gets (8,128)-tile-padded 6-8x on TPU (measured 10.5-23 GB HLO temps
        at production shape vs 2 GB for the gather).  After the gather
        everything is dense (b, 13824, 4000) MXU work."""
        cfg = self.config
        pt, p = cfg.temporal_patch_size, cfg.patch_size
        s2, b2 = self.patch_norm_out()

        if video.ndim == 3:  # pre-shuffled patch rows
            from ..ops.pallas.patchify import fused_row_embed, row_embed_train

            b, n, patch_dim = video.shape
            assert patch_dim == cfg.patch_dim, \
                f"patch rows last dim {patch_dim} != {cfg.patch_dim}"
            t = cfg.num_frames // pt
            h = w = cfg.image_size // p
            assert n == t * h * w, f"patch rows {n} != {t}*{h}*{w}"
            # train: XLA composition stores/reuses residuals in backward;
            # infer: single fused kernel (see row_embed_train docstring)
            embed = row_embed_train if train else fused_row_embed
            tokens = embed(video, self.patch_norm_in_scale,
                           self.patch_norm_in_bias, self.patch_proj_kernel,
                           self.patch_proj_bias, s2, b2, 1e-5, self.dtype)
            return tokens.reshape(b, t, h, w, cfg.dim)

        b, f, H, W, c = video.shape
        t, h, w = f // pt, H // p, W // p
        if c == 1:
            from ..ops.pallas.patchify import (_xla_patch_embed,
                                               fused_patch_embed)

            if not train:
                # Inference: one Pallas kernel for the whole chain on TPU
                # (XLA composition with the relayout kernel elsewhere): each
                # patch block goes shuffle -> LN -> projection -> LN without
                # leaving VMEM, so the (b, t*h*w, 4000) patch tensor (884 MB
                # at production shape) never hits HBM.
                tokens = fused_patch_embed(
                    video[..., 0], self.patch_norm_in_scale,
                    self.patch_norm_in_bias, self.patch_proj_kernel,
                    self.patch_proj_bias, s2, b2, pt, p, 1e-5, self.dtype)
            else:
                # Training: relayout kernel + XLA LN/matmul — XLA stores the
                # patch tensor as a residual, so the backward reuses it
                # instead of re-shuffling (faster fwd+bwd than the fused
                # kernel, which would rebuild patches in its backward).
                tokens = _xla_patch_embed(
                    video[..., 0], self.patch_norm_in_scale,
                    self.patch_norm_in_bias, self.patch_proj_kernel,
                    self.patch_proj_bias, s2, b2, pt, p, 1e-5, self.dtype)
            return tokens.reshape(b, t, h, w, cfg.dim)

        from ..ops.norms import layer_norm

        perm = jnp.asarray(self.patch_permutation(f, H, c, pt, p))
        flat = video.reshape(b, f * H * W * c)
        patches = jnp.take(flat, perm, axis=1).reshape(b, t * h * w,
                                                       cfg.patch_dim)
        x = layer_norm(patches, self.patch_norm_in_scale,
                       self.patch_norm_in_bias)
        tokens = jnp.einsum("bnp,pd->bnd", x.astype(self.dtype),
                            self.patch_proj_kernel.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        tokens = (tokens.astype(self.dtype)
                  + self.patch_proj_bias.astype(self.dtype))
        tokens = layer_norm(tokens, s2, b2)
        return tokens.reshape(b, t, h, w, cfg.dim)

    # ----------------------------------------------------------------- main
    def __call__(self, video: jnp.ndarray, *, return_encoded_tokens: bool = False,
                 return_only_codebook_ids: bool = False, train: bool = False,
                 return_recons: bool = False, deterministic: bool = True,
                 spatial_bias: Optional[jnp.ndarray] = None):
        """Default (like the reference forward, ctvit.py:353-525) runs the
        full pipeline: encode -> VQ -> decode when a decoder exists (init
        with the default path to create decoder params), else returns
        (quantized, indices, commit_loss).  `return_encoded_tokens=True` is
        the production CLIP path (ct_clip.py:715)."""
        cfg = self.config
        if video.ndim != 3:  # 3-D = pre-shuffled patch rows (embed_patches)
            assert video.shape[2] == cfg.image_size \
                and video.shape[3] == cfg.image_size

        tokens = self.embed_patches(video.astype(self.dtype), train=train)
        tokens = self.encode(tokens, deterministic, spatial_bias)
        b, t, h, w, d = tokens.shape

        flat = tokens.reshape(b, t * h * w, d)
        quantized, indices, commit_loss = self.vq(flat, train=train)

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

    def compute_spatial_bias(self) -> jnp.ndarray:
        """The (heads, h*w, h*w) continuous-position-bias table.  A pure
        function of the CPB MLP params — inference callers can compute it
        once per weight load and pass it to encode/__call__ via
        `spatial_bias=`, hoisting the MLP + the offsets->pairs gather out
        of every scored step (~1 ms/step at production shape)."""
        hw = self.config.image_size // self.config.patch_size
        return self.spatial_rel_pos_bias(hw, hw)

    def _temporal_grid_path(self, b: int, t: int, h: int, w: int, d: int,
                            deterministic: bool) -> bool:
        """True when the temporal stage can run in the NATIVE (b, t, h*w, d)
        layout: cubic grid (the reference's PEG memory reinterpretation,
        ctvit.py:299-303, is then a pure axis relabeling — see PEG.rotated)
        and the grid attention kernel has a plan.  Skips the two full
        (b,h,w,t,d) layout copies per encode (~5 ms/step at production
        shape)."""
        cfg = self.config
        if not (t == h == w):
            return False
        if cfg.attn_dropout > 0 and not deterministic:
            return False  # in-kernel dropout is sequence-major only
        from ..ops.pallas.small_attention import _plan_grid

        # gate with the REAL batch: if _plan_grid ever grows a
        # batch-dependent constraint, the gate and the kernel's own re-plan
        # (fused_small_qknorm_attention_grid) must not desynchronize
        return _plan_grid(b, t, h * w, d, cfg.heads,
                          cfg.dim_head) is not None

    def encode(self, tokens: jnp.ndarray, deterministic: bool = True,
               spatial_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Factorized encode (ctvit.py:282-307): spatial attention over each
        (h*w) plane, then temporal attention over each t column."""
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        attn_bias = (spatial_bias if spatial_bias is not None
                     else self.spatial_rel_pos_bias(h, w))
        x = tokens.reshape(b * t, h * w, d)
        x = self.enc_spatial_transformer(x, video_shape=video_shape,
                                         attn_bias=attn_bias,
                                         deterministic=deterministic)

        if self._temporal_grid_path(b, t, h, w, d, deterministic):
            # native layout: (b*t, h*w, d) -> (b, t, h*w, d) is free; the
            # temporal transformer reads t-columns straight from the grid
            x = x.reshape(b, t, h * w, d)
            x = self.enc_temporal_transformer(x, video_shape=video_shape,
                                              deterministic=deterministic,
                                              grid_layout=True)
            return x.reshape(b, t, h, w, d)

        x = x.reshape(b, t, h, w, d)
        # temporal: (b, t, h, w, d) -> (b*h*w, t, d); PEG inside sees the same
        # video_shape, reproducing the reference's memory reinterpretation
        # (ctvit.py:299-303) for checkpoint parity.
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = self.enc_temporal_transformer(x, video_shape=video_shape,
                                          deterministic=deterministic)
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        return x

    def decode(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Mirror of encode (the reference's intended-but-dead decode,
        ctvit.py:309-351): temporal -> spatial -> to_pixels."""
        cfg = self.config
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        if self._temporal_grid_path(b, t, h, w, d, deterministic):
            x = tokens.reshape(b, t, h * w, d)
            x = self.dec_temporal_transformer(x, video_shape=video_shape,
                                              deterministic=deterministic,
                                              grid_layout=True)
            x = x.reshape(b, t, h, w, d)
        else:
            x = tokens.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
            x = self.dec_temporal_transformer(x, video_shape=video_shape,
                                              deterministic=deterministic)
            x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)

        attn_bias = self.dec_spatial_rel_pos_bias(h, w)
        x = x.reshape(b * t, h * w, d)
        x = self.dec_spatial_transformer(x, video_shape=video_shape,
                                         attn_bias=attn_bias,
                                         deterministic=deterministic)
        x = x.reshape(b, t, h, w, d)

        pt, p, c = cfg.temporal_patch_size, cfg.patch_size, cfg.channels
        pix = self.to_pixels(x)  # (b, t, h, w, c*pt*p*p) in (c pt p1 p2) order
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
        return self.apply(variables, codes, method=CTViT.decode)
