"""CTCLIP: dual-tower contrastive model (text BERT x CTViT image tower).

Capability parity with CT_CLIP/ct_clip/ct_clip.py:407-901:
  text: BERT last-hidden CLS token -> Linear(768->512, no bias) -> l2norm
        (ct_clip.py:685-686, 762-765, 771)
  image: CTViT encoded tokens (b,24,24,24,512) -> mean over temporal axis
        -> flatten (b, 294912) -> Linear(294912->512, no bias) -> l2norm
        (ct_clip.py:715-771)
  loss: bidirectional InfoNCE with learnable exp temperature, optional DCL
        diagonal masking, CLOOB extra projections, multiview aug batches
        (ct_clip.py:818-901)

TPU-native additions:
  * `encode_text` / `encode_image` expose the towers separately so zero-shot
    can cache the 36 prompt latents and batch volumes (fixes the reference's
    18x image-tower rerun, SURVEY.md §3.2).
  * the contrastive loss optionally all-gathers latents over the `data` mesh
    axis, so negatives scale with the pod — the capability the reference
    stubs but never uses (CT_CLIP/ct_clip/distributed.py).
  * the 294912->512 projection is a 150M-param matmul; with a `model` mesh
    axis its kernel is sharded on the input dim (see parallel/sharding.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import CTCLIPConfig
from ..ops.norms import l2norm
from .bert import BertModel
from .ctvit import CTViT

LOG_EPS = 1e-20  # reference log eps (ct_clip.py:45-46)


def contrastive_loss(text_latents: jnp.ndarray, image_latents: jnp.ndarray,
                     temp: jnp.ndarray, *, decoupled: bool = False,
                     image_to_text_latents: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     axis_name: Optional[str] = None):
    """Bidirectional InfoNCE in the reference's exp/diag/row-sum form
    (ct_clip.py:845-878), computed as a stable log-softmax (identical up to
    the reference's 1e-20 log eps).

    text_latents/image_latents: (m, b, d) / (n, b, d) l2-normalized multiview
    stacks (m=n=1 for the production path).  If `axis_name` is set, latents
    are all-gathered over that mesh axis so every device sees pod-wide
    negatives; gradients flow back through the gather (reduce-scatter).
    Returns (cl_loss, multiview_cl_loss).
    """
    if axis_name is not None:
        gather = lambda t: jax.lax.all_gather(t, axis_name, axis=1, tiled=True)
        text_latents = gather(text_latents)
        image_latents = gather(image_latents)
        if image_to_text_latents is not None:
            image_to_text_latents = tuple(map(gather, image_to_text_latents))

    m, b, _ = text_latents.shape
    n = image_latents.shape[0]
    t2i = jnp.einsum("mtd,nid->mnti", text_latents, image_latents,
                     preferred_element_type=jnp.float32) * temp
    if image_to_text_latents is not None:  # CLOOB extra projections
        tl_x, il_x = image_to_text_latents
        i2t = jnp.einsum("mtd,nid->mnit", tl_x, il_x,
                         preferred_element_type=jnp.float32) * temp
    else:
        i2t = jnp.swapaxes(t2i, -1, -2)

    t2i = t2i.reshape(m * n, b, b)
    i2t = i2t.reshape(m * n, b, b)

    def one_direction(sim):
        pos = jnp.diagonal(sim, axis1=-2, axis2=-1)  # (mn, b)
        if decoupled:  # DCL: drop positives from the denominator (ct_clip.py:865-867)
            eye = jnp.eye(b, dtype=bool)
            sim = jnp.where(eye[None], -jnp.inf, sim)
        denom = jax.nn.logsumexp(sim, axis=-1)  # (mn, b)
        return jnp.mean(denom - pos, axis=-1)  # (mn,)

    cl_losses = 0.5 * (one_direction(t2i) + one_direction(i2t))
    return cl_losses[0], cl_losses[1:]


def filip_loss(text_tokens: jnp.ndarray, image_tokens: jnp.ndarray,
               text_mask: jnp.ndarray, temp: jnp.ndarray, *,
               decoupled: bool = False,
               extra_tokens: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               axis_name: Optional[str] = None):
    """FILIP fine-grained contrastive loss (`use_all_token_embeds`).

    Capability note: the reference's own FILIP branch is unreachable — its
    adaptation flattens image tokens to 2D and CLS-pools text before the
    branch (ct_clip.py:740,763), so the `ndim == 3` asserts at
    ct_clip.py:750-751 can never hold.  This implements the upstream x-clip
    semantics the branch was written for (ct_clip.py:829-843): per-token
    similarities, text→image = masked mean over text tokens of the max image
    token sim; image→text = mean over image tokens of the max (mask-filled)
    text token sim, then the same exp/diag/row-sum InfoNCE form.

    text_tokens: (m, b, L, d); image_tokens: (n, b, I, d); text_mask: (m, b, L).
    Returns (cl_loss, multiview_cl_losses).
    """
    if axis_name is not None:
        gather = lambda t: jax.lax.all_gather(t, axis_name, axis=1, tiled=True)
        text_tokens, image_tokens = gather(text_tokens), gather(image_tokens)
        text_mask = gather(text_mask)
        if extra_tokens is not None:
            extra_tokens = tuple(map(gather, extra_tokens))

    m, b = text_tokens.shape[:2]
    n = image_tokens.shape[0]
    neg_big = jnp.finfo(jnp.float32).max

    sim = jnp.einsum("mxtd,nyid->mnxyti", text_tokens, image_tokens,
                     preferred_element_type=jnp.float32) * temp
    sim_i2t = sim
    if extra_tokens is not None:
        tl_x, il_x = extra_tokens
        sim_i2t = jnp.einsum("mxtd,nyid->mnxyti", tl_x, il_x,
                             preferred_element_type=jnp.float32) * temp

    mask = text_mask.astype(bool)[:, None, :, None, :]  # (m,1,x,1,t)
    # text -> image: max over image tokens, masked mean over text tokens
    # (ct_clip.py:836-838, masked_mean eps 1e-6 at :40-44)
    t2i_tok = jnp.max(sim, axis=-1)  # (m,n,x,y,t)
    t2i = (jnp.sum(jnp.where(mask, t2i_tok, 0.0), axis=-1)
           / jnp.clip(jnp.sum(mask, axis=-1), 1e-6))  # (m,n,x,y)
    # image -> text: mask-fill pad text tokens, max over text, mean over image
    # tokens (ct_clip.py:840-842); NOT transposed — matches the reference form.
    i2t = jnp.mean(jnp.max(jnp.where(mask[..., None], sim_i2t, -neg_big),
                           axis=-2), axis=-1)  # (m,n,x,y)

    def one_direction(s):
        s = s.reshape(m * n, b, b)
        pos = jnp.diagonal(s, axis1=-2, axis2=-1)
        if decoupled:
            s = jnp.where(jnp.eye(b, dtype=bool)[None], -jnp.inf, s)
        return jnp.mean(jax.nn.logsumexp(s, axis=-1) - pos, axis=-1)

    cl_losses = 0.5 * (one_direction(t2i) + one_direction(i2t))
    return cl_losses[0], cl_losses[1:]


class CTCLIP(nn.Module):
    """Dual-tower CLIP.  By default builds the production towers (HF-parity
    BERT + CTViT); pass `text_encoder` / `image_encoder` modules to inject
    custom towers — e.g. the fallback `TextTransformer`/`VisionTransformer`
    from models/towers.py, mirroring the reference's built-in towers used
    when no encoder is injected (ct_clip.py:468-489).  A custom text encoder
    must map (ids, mask) -> (b, n, dim_text) with a CLS-style token at
    position 0; a custom image encoder maps video -> (b, n, ...) tokens that
    are mean-pooled over axis 1 and flattened to dim_image."""

    config: CTCLIPConfig
    dtype: jnp.dtype = jnp.float32
    text_encoder: Optional[nn.Module] = None
    image_encoder: Optional[nn.Module] = None

    def setup(self):
        cfg = self.config
        if self.text_encoder is None:
            self.text_transformer = BertModel(cfg.bert, dtype=self.dtype,
                                              name="text_transformer")
        if self.image_encoder is None:
            self.visual_transformer = CTViT(cfg.ctvit, dtype=self.dtype,
                                            name="visual_transformer")
        dense = lambda name: nn.Dense(cfg.dim_latent, use_bias=False,
                                      dtype=self.dtype, name=name)
        self.to_text_latent = dense("to_text_latent")
        self.to_visual_latent = dense("to_visual_latent")
        # created unconditionally for checkpoint parity (ct_clip.py:580-582)
        self.to_text_latent_extra = dense("to_text_latent_extra")
        self.to_visual_latent_extra = dense("to_visual_latent_extra")
        self.temperature = self.param("temperature", nn.initializers.constant(
            self.config.temperature_init), ())

        # auxiliary SSL objectives, sharing the tower weights
        # (ct_clip.py:500-528; losses added at :892-895)
        if cfg.use_mlm:
            from .mlm import MLM

            self.mlm = MLM(
                encode_fn=lambda ids, m: self._text_tokens(ids, m, False),
                dim=cfg.dim_text, num_tokens=cfg.bert.vocab_size,
                pad_token_id=cfg.bert.pad_token_id, name="mlm")
        if cfg.use_visual_ssl:
            from .visual_ssl import SimCLR, SimSiam

            def image_embed(video):
                # NetWrapper hidden-layer tap (visual_ssl.py:141-203,
                # configured like ct_clip.py:444's visual_ssl_hidden_layer):
                # train=False keeps codebook EMA updates out of the SSL
                # augmented views; deterministic=False keeps dropout live.
                tap = cfg.visual_ssl_tap
                if self.image_encoder is not None:
                    tokens = self.image_encoder(video, deterministic=False)
                    return jnp.mean(tokens, axis=1)
                vt = self.visual_transformer
                tokens = vt.embed_patches(video.astype(vt.dtype), train=False)
                b, t, h, w, d = tokens.shape
                if tap == "spatial":  # spatial-transformer token output
                    bias = vt.spatial_rel_pos_bias(h, w)
                    x = tokens.reshape(b * t, h * w, d)
                    return vt.enc_spatial_transformer(
                        x, video_shape=(b, t, h, w), attn_bias=bias,
                        deterministic=False)
                x = vt.encode(tokens, deterministic=False)
                if tap == "pooled":  # temporal-mean pooled embedding
                    return jnp.mean(x.reshape(b, -1, d), axis=1)
                assert tap == "temporal", f"unknown visual_ssl_tap {tap!r}"
                return x  # temporal-transformer token output (pre-VQ)

            ssl_cls = SimSiam if cfg.visual_ssl_type == "simsiam" else SimCLR
            self.visual_ssl = ssl_cls(encode_fn=image_embed,
                                      dim=cfg.ctvit.dim, name="visual_ssl")

    def _text_tokens(self, input_ids, attention_mask, deterministic):
        if self.text_encoder is not None:
            return self.text_encoder(input_ids, attention_mask,
                                     deterministic=deterministic)
        enc_text, _ = self.text_transformer(input_ids, attention_mask,
                                            deterministic=deterministic)
        return enc_text

    def _image_tokens(self, video, train, deterministic, spatial_bias=None):
        if self.image_encoder is not None:
            return self.image_encoder(video, deterministic=deterministic)
        return self.visual_transformer(video, return_encoded_tokens=True,
                                       train=train,
                                       deterministic=deterministic,
                                       spatial_bias=spatial_bias)

    def encode_text(self, input_ids, attention_mask, deterministic=True,
                    return_encodings=False):
        enc_text = self._text_tokens(input_ids, attention_mask, deterministic)
        if return_encodings:
            return enc_text
        text_embeds = enc_text[:, 0]  # CLS pooling (ct_clip.py:762)
        return l2norm(self.to_text_latent(text_embeds))

    def encode_image(self, video, train=False, deterministic=True,
                     return_encodings=False, spatial_bias=None):
        """`spatial_bias`: optional precomputed CPB table
        (CTViT.compute_spatial_bias) — hoists the param-only bias MLP out
        of repeated inference steps."""
        enc_image = self._image_tokens(video, train, deterministic,
                                       spatial_bias)
        if return_encodings:
            return enc_image
        pooled = jnp.mean(enc_image, axis=1)  # temporal mean (ct_clip.py:724)
        flat = pooled.reshape(pooled.shape[0], -1)
        return l2norm(self.to_visual_latent(flat)), enc_image

    def __call__(self, input_ids, attention_mask, video, *,
                 return_loss: bool = False, return_latents: bool = False,
                 return_encodings: bool = False, train: bool = False,
                 num_batch_texts: int = 1, num_batch_images: int = 1,
                 text_to_image: bool = True, axis_name: Optional[str] = None,
                 deterministic: bool = True):
        """input_ids/attention_mask: ((m*b), L); video: ((n*b), f, H, W, c)
        channels-last.  Mirrors CTCLIP.forward (ct_clip.py:614-901)."""
        cfg = self.config

        enc_text = self._text_tokens(input_ids, attention_mask, deterministic)
        enc_image = self._image_tokens(video, train, deterministic)

        pooled = jnp.mean(enc_image, axis=1)
        image_embeds = pooled.reshape(pooled.shape[0], -1)

        if return_encodings:
            return enc_text, image_embeds

        if cfg.use_all_token_embeds:
            return self._filip_path(enc_text, enc_image, attention_mask,
                                    return_loss=return_loss,
                                    return_latents=return_latents,
                                    num_batch_texts=num_batch_texts,
                                    num_batch_images=num_batch_images,
                                    text_to_image=text_to_image,
                                    axis_name=axis_name,
                                    input_ids=input_ids, video=video)

        text_embeds = enc_text[:, 0]
        text_latents = l2norm(self.to_text_latent(text_embeds))
        image_latents = l2norm(self.to_visual_latent(image_embeds))

        extra = None
        if cfg.extra_latent_projection:
            extra = (l2norm(self.to_text_latent_extra(text_embeds)),
                     l2norm(self.to_visual_latent_extra(image_embeds)))

        if return_latents:
            if cfg.extra_latent_projection:
                return text_latents, image_latents, extra[0], extra[1]
            return text_latents, image_latents, enc_image

        temp = jnp.exp(self.temperature)

        if not return_loss:
            # zero-shot pair scoring: broadcast text batch against image batch
            # (ct_clip.py:805-807 einsum 'b d, b d -> b')
            tl, il = text_latents, image_latents
            if cfg.extra_latent_projection and not text_to_image:
                tl, il = extra
            return jnp.sum(tl * il, axis=-1) * temp

        m, n = num_batch_texts, num_batch_images
        tl = text_latents.reshape(m, -1, cfg.dim_latent)
        il = image_latents.reshape(n, -1, cfg.dim_latent)
        extra_mn = None
        if cfg.extra_latent_projection:
            extra_mn = (extra[0].reshape(m, -1, cfg.dim_latent),
                        extra[1].reshape(n, -1, cfg.dim_latent))

        cl_loss, multiview = contrastive_loss(
            tl, il, temp, decoupled=cfg.decoupled_contrastive_learning,
            image_to_text_latents=extra_mn,
            axis_name=axis_name if cfg.gather_negatives else None)

        return self._weighted_total(cl_loss, multiview, m, n,
                                    input_ids, attention_mask, video)

    def _weighted_total(self, cl_loss, multiview, m, n,
                        input_ids=None, attention_mask=None, video=None):
        """Weighted loss sum incl. the SSL aux losses (ct_clip.py:885-899).

        When use_mlm / use_visual_ssl are on, callers computing the loss must
        provide "mlm" / "ssl" rng streams (the trainer does)."""
        cfg = self.config
        is_multiview = (m > 1 or n > 1)
        multiview_weight = cfg.multiview_loss_weight if is_multiview else 0.0
        cl_weight = 1.0 - (cfg.text_ssl_loss_weight * float(cfg.use_mlm)
                           + cfg.image_ssl_loss_weight * float(cfg.use_visual_ssl)
                           + multiview_weight)
        loss = cl_loss * cl_weight
        if cfg.use_mlm and input_ids is not None:
            text_ssl = self.mlm(input_ids, attention_mask,
                                rng=self.make_rng("mlm"))
            loss = loss + text_ssl * cfg.text_ssl_loss_weight
        if cfg.use_visual_ssl and video is not None:
            assert video.ndim == 5, \
                "visual SSL needs the raw (b, f, H, W, c) video (3D augs); " \
                "feed volumes, not patch rows, when use_visual_ssl is on"
            image_ssl = self.visual_ssl(video, self.make_rng("ssl"))
            loss = loss + image_ssl * cfg.image_ssl_loss_weight
        if is_multiview:
            loss = loss + jnp.mean(multiview) * multiview_weight
        return loss

    def _filip_path(self, enc_text, enc_image, attention_mask, *, return_loss,
                    return_latents, num_batch_texts, num_batch_images,
                    text_to_image, axis_name, input_ids=None, video=None):
        """Fine-grained all-token-embeds path (FILIP; see `filip_loss`).

        Image tokens are the encoded VQ grid flattened over (t, h, w); the
        latent projections are applied per-token, so `dim_image` must equal
        the CTViT token dim (512) when `use_all_token_embeds` is on."""
        cfg = self.config
        text_tokens = enc_text[:, 1:] if cfg.text_has_cls_token else enc_text
        text_mask = (attention_mask[:, 1:] if cfg.text_has_cls_token
                     else attention_mask)
        image_tokens = enc_image.reshape(enc_image.shape[0], -1,
                                         enc_image.shape[-1])
        if cfg.visual_has_cls_token:
            image_tokens = image_tokens[:, 1:]

        text_latents = l2norm(self.to_text_latent(text_tokens))
        image_latents = l2norm(self.to_visual_latent(image_tokens))
        extra = None
        if cfg.extra_latent_projection:
            extra = (l2norm(self.to_text_latent_extra(text_tokens)),
                     l2norm(self.to_visual_latent_extra(image_tokens)))

        if return_latents:
            if cfg.extra_latent_projection:
                return text_latents, image_latents, extra[0], extra[1]
            return text_latents, image_latents, enc_image

        temp = jnp.exp(self.temperature)
        if not return_loss:
            # (ct_clip.py:801-803 einsum 'b t d, b i d -> b t i')
            tl, il = text_latents, image_latents
            if cfg.extra_latent_projection and not text_to_image:
                tl, il = extra
            return jnp.einsum("btd,bid->bti", tl, il,
                              preferred_element_type=jnp.float32) * temp

        m, n = num_batch_texts, num_batch_images
        resh = lambda t, k: t.reshape((k, -1) + t.shape[1:])
        cl_loss, multiview = filip_loss(
            resh(text_latents, m), resh(image_latents, n),
            resh(text_mask, m), temp,
            decoupled=cfg.decoupled_contrastive_learning,
            extra_tokens=None if extra is None else (resh(extra[0], m),
                                                     resh(extra[1], n)),
            axis_name=axis_name if cfg.gather_negatives else None)
        return self._weighted_total(cl_loss, multiview, m, n,
                                    input_ids, attention_mask, video)
