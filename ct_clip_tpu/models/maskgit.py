"""MaskGIT generative stack over CTViT codebook ids.

Capability parity with transformer_maskgit/MaskGITTransformer.py:
  * MaskGit (:103-211): bidirectional token transformer — token emb with a
    trailing [MASK] id, learned abs pos emb, 3D continuous position bias,
    PEG + cross-attention transformer, gradient-shrink (alpha 0.1), logits
    over the codebook; classifier-free guidance via cond-drop.
  * TokenCritic (:215-300) and SelfCritic (:305-334).
  * Training objective (:567-694): per-sample cosine mask schedule, CE on
    masked positions, optional critic BCE on real-vs-resampled tokens.
  * Iterative confidence sampling (:415-557): cosine remasking, gumbel
    sampling with annealed temperature, critic- or confidence-based scores,
    priming frames, CFG.

The reference's sampler is a python loop over 18 steps mutating tensors;
here the per-step forward is one jitted function and the loop is
`lax.fori_loop`-free python over a fixed small step count (each iteration is
device-bound work on static shapes, so XLA caches a single executable).
"""
from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import MaskGitConfig
from ..ops.attention import ContinuousPositionBias, MaskgitTransformer


def log(t, eps=1e-10):
    return jnp.log(t + eps)


def gumbel_sample(rng, logits, temperature=1.0, axis=-1):
    """gumbel_sample (MaskGITTransformer.py:86-92); temperature 0 ->
    greedy argmax."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=axis)
    noise = jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0)
    gumbel = -log(-log(noise))
    return jnp.argmax(logits / max(temperature, 1e-10) + gumbel, axis=axis)


def cosine_schedule_mask(rng, valid: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Training-time mask: per-row random step -> cos(t*pi/2) masking prob,
    sampled as a top-k subset of valid positions (MaskGITTransformer.py:
    628-641 + attention-mask-aware subset sampler)."""
    b, n = valid.shape
    r_step, r_pick = jax.random.split(rng)
    rand_step = jax.random.randint(r_step, (b,), 0, steps)
    prob = jnp.cos(rand_step.astype(jnp.float32) * math.pi * 0.5 / steps)

    scores = jax.random.uniform(r_pick, (b, n))
    scores = jnp.where(valid, scores, -1e9)
    order = jnp.argsort(-scores, axis=-1)
    ranks = jnp.zeros((b, n), jnp.int32)
    rows = jnp.arange(b)[:, None]
    ranks = ranks.at[rows, order].set(jnp.broadcast_to(jnp.arange(n)[None], (b, n)))
    num_valid = jnp.sum(valid, axis=-1, keepdims=True)
    quota = jnp.ceil(prob[:, None] * num_valid)
    return (ranks < quota) & valid


class MaskGit(nn.Module):
    config: MaskGitConfig
    num_tokens: int  # codebook size; mask_id == num_tokens
    dtype: jnp.dtype = jnp.float32

    @property
    def mask_id(self) -> int:
        return self.num_tokens

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray,
                 video_patch_shape: Tuple[int, int, int],
                 context: Optional[jnp.ndarray] = None,
                 text_mask: Optional[jnp.ndarray] = None,
                 video_mask: Optional[jnp.ndarray] = None,
                 cond_drop_rng: Optional[jax.Array] = None,
                 cond_drop_prob: float = 0.0,
                 return_embeds: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        b, n = token_ids.shape
        t, h, w = video_patch_shape

        if context is not None and text_mask is None:
            text_mask = jnp.any(context != 0, axis=-1)
        if context is not None and cond_drop_prob > 0:
            keep = jax.random.bernoulli(cond_drop_rng, 1.0 - cond_drop_prob, (b,))
            text_mask = keep[:, None] & text_mask

        x = nn.Embed(self.num_tokens + 1, cfg.dim, dtype=self.dtype,
                     name="token_emb")(token_ids)
        pos = nn.Embed(cfg.max_seq_len, cfg.dim, dtype=self.dtype,
                       name="pos_emb")(jnp.arange(n))
        x = x + pos[None]
        # gradient shrink (MaskGITTransformer.py:199)
        alpha = 0.1
        x = x * alpha + jax.lax.stop_gradient(x) * (1 - alpha)

        bias = ContinuousPositionBias(dim=cfg.dim_head, heads=cfg.heads,
                                      num_dims=3,
                                      name="continuous_pos_bias")(t, h, w)
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.depth, dim_context=cfg.t5_dim,
            dim_head=cfg.dim_head, heads=cfg.heads, peg=True,
            has_cross_attn=not cfg.unconditional, attn_num_null_kv=2,
            dtype=self.dtype, name="transformer")(
                x, video_shape=(b, t, h, w), attn_bias=bias, context=context,
                self_attn_mask=video_mask, cross_attn_context_mask=text_mask,
                deterministic=deterministic)
        if return_embeds:
            return x
        return nn.Dense(self.num_tokens, dtype=self.dtype, name="to_logits")(x)


class SelfCritic(nn.Module):
    """Critic head over the MaskGit's own embeddings — no separate tower
    (MaskGITTransformer.py:305-334, Nijkamp et al. self-critic).

    Shares the generator weights: its variables nest the trained MaskGit
    params under "maskgit" (see `wrap_variables`).  Same scoring interface
    as TokenCritic, so `sample_tokens(critic=...)` accepts either."""

    maskgit: MaskGit

    @nn.compact
    def __call__(self, token_ids, video_patch_shape, context=None,
                 text_mask=None, deterministic: bool = True):
        embeds = self.maskgit(token_ids, video_patch_shape, context=context,
                              text_mask=text_mask, return_embeds=True,
                              deterministic=deterministic)
        return nn.Dense(1, dtype=self.maskgit.dtype,
                        name="to_pred")(embeds)[..., 0]

    @staticmethod
    def wrap_variables(maskgit_variables, head_params):
        """Build SelfCritic variables from trained generator params + the
        critic head ({"to_pred": {...}} from SelfCritic init)."""
        return {"params": {"maskgit": maskgit_variables["params"],
                           "to_pred": head_params}}


class TokenCritic(nn.Module):
    """Scores each token as likely-fake (MaskGITTransformer.py:215-300)."""

    config: MaskGitConfig
    num_tokens: int
    has_cross_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, video_patch_shape, context=None,
                 text_mask=None, video_mask=None, cond_drop_rng=None,
                 cond_drop_prob: float = 0.0, deterministic: bool = True):
        cfg = self.config
        b, n = token_ids.shape
        t, h, w = video_patch_shape
        if context is not None and text_mask is None:
            text_mask = jnp.any(context != 0, axis=-1)
        if context is not None and cond_drop_prob > 0:
            keep = jax.random.bernoulli(cond_drop_rng, 1.0 - cond_drop_prob, (b,))
            text_mask = keep[:, None] & text_mask

        x = nn.Embed(self.num_tokens + 1, cfg.dim, dtype=self.dtype,
                     name="token_emb")(token_ids)
        pos = nn.Embed(cfg.max_seq_len, cfg.dim, dtype=self.dtype,
                       name="pos_emb")(jnp.arange(n))
        x = x + pos[None]
        x = MaskgitTransformer(
            dim=cfg.dim, depth=cfg.depth, dim_context=cfg.t5_dim,
            dim_head=cfg.dim_head, heads=cfg.heads, peg=True,
            has_cross_attn=self.has_cross_attn, dtype=self.dtype,
            name="transformer")(
                x, video_shape=(b, t, h, w), context=context,
                self_attn_mask=video_mask, cross_attn_context_mask=text_mask,
                deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype, name="to_logits")(x)[..., 0]


def forward_with_cond_scale(apply_fn, cond_scale: float, *args, **kwargs):
    """CFG: null + (cond - null) * scale (MaskGITTransformer.py:146-158)."""
    logits = apply_fn(*args, cond_drop_prob=0.0, **kwargs)
    if cond_scale == 1:
        return logits
    null_logits = apply_fn(*args, cond_drop_prob=1.0, **kwargs)
    return null_logits + (logits - null_logits) * cond_scale


def maskgit_train_loss(maskgit: MaskGit, variables, rng, codebook_ids,
                       video_patch_shape, context=None, text_mask=None,
                       video_mask=None, cond_drop_prob: float = 0.25,
                       steps: int = 18):
    """Masked-token CE (MaskGITTransformer.py:628-661)."""
    b = codebook_ids.shape[0]
    flat = codebook_ids.reshape(b, -1)
    n = flat.shape[1]
    valid = video_mask if video_mask is not None else jnp.ones((b, n), bool)
    r_mask, r_drop = jax.random.split(rng)
    mask = cosine_schedule_mask(r_mask, valid, steps)
    mask_id = maskgit.num_tokens
    masked = jnp.where(mask, mask_id, flat)

    logits = maskgit.apply(variables, masked, video_patch_shape,
                           context=context, text_mask=text_mask,
                           video_mask=valid, cond_drop_rng=r_drop,
                           cond_drop_prob=cond_drop_prob)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, flat[..., None], axis=-1)[..., 0]
    w = mask.astype(jnp.float32)
    return -jnp.sum(token_logp * w) / jnp.maximum(jnp.sum(w), 1.0), (masked, mask, logits)


def critic_train_loss(critic: TokenCritic, critic_vars, rng, codebook_ids,
                      logits, mask, video_patch_shape, context=None,
                      text_mask=None, sample_temperature: float = 1.0):
    """BCE real-vs-resampled (MaskGITTransformer.py:663-694)."""
    b = codebook_ids.shape[0]
    flat = codebook_ids.reshape(b, -1)
    r_samp, r_drop = jax.random.split(rng)
    pred_ids = gumbel_sample(r_samp, jax.lax.stop_gradient(logits),
                             sample_temperature)
    critic_input = jnp.where(mask, pred_ids, flat)
    scores = critic.apply(critic_vars, critic_input, video_patch_shape,
                          context=context, text_mask=text_mask,
                          cond_drop_rng=r_drop)
    labels = (flat != pred_ids).astype(jnp.float32)
    logp = jax.nn.log_sigmoid(scores)
    lognotp = jax.nn.log_sigmoid(-scores)
    return -jnp.mean(labels * logp + (1 - labels) * lognotp)


@lru_cache(maxsize=8)
def _sampler_fwd(maskgit: MaskGit, video_patch_shape: Tuple[int, int, int]):
    """Jitted generator forward for the sampler, cached across sample()
    calls (flax modules hash by value, so identical configs share the
    executable).  Repeated sample()/make_video() calls compile nothing."""

    @partial(jax.jit, static_argnames=("cond_drop_prob",))
    def fwd(variables, input_ids, context, text_mask, drop_rng,
            cond_drop_prob: float):
        return maskgit.apply(variables, input_ids, video_patch_shape,
                             context=context, text_mask=text_mask,
                             cond_drop_rng=drop_rng,
                             cond_drop_prob=cond_drop_prob)

    return fwd


@lru_cache(maxsize=8)
def _sampler_critic(critic, video_patch_shape: Tuple[int, int, int]):
    """Jitted critic scoring for the sampler (was un-jitted: one eager
    dispatch chain per demask step)."""

    @jax.jit
    def score(critic_vars, input_ids, context, text_mask):
        return critic.apply(critic_vars, input_ids, video_patch_shape,
                            context=context, text_mask=text_mask)

    return score


def sample_tokens(maskgit: MaskGit, variables, rng,
                  video_patch_shape: Tuple[int, int, int], batch_size: int = 1,
                  context=None, text_mask=None, steps: int = 18,
                  cond_scale: float = 3.0, starting_temperature: float = 0.9,
                  critic: Optional[TokenCritic] = None, critic_vars=None,
                  noise_K: float = 1.0,
                  prime_token_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Iterative confidence-based demasking (MaskGITTransformer.py:415-557).
    Returns (b, n) sampled codebook ids (excluding prime tokens)."""
    t, h, w = video_patch_shape
    prime_len = 0 if prime_token_ids is None else prime_token_ids.shape[-1]
    n = t * h * w - prime_len
    mask_id = maskgit.num_tokens

    ids = jnp.full((batch_size, n), mask_id, jnp.int32)
    mask = jnp.ones((batch_size, n), bool)
    scores = None

    fwd_jit = _sampler_fwd(maskgit, video_patch_shape)
    fwd = lambda input_ids, cond_drop_prob, drop_rng: fwd_jit(
        variables, input_ids, context, text_mask, drop_rng,
        cond_drop_prob=cond_drop_prob)
    critic_fn = (_sampler_critic(critic, video_patch_shape)
                 if critic is not None else None)

    for step in range(steps):
        rng, r_gumbel, r_drop, r_noise = jax.random.split(rng, 4)
        steps_til_x0 = steps - (step + 1)

        if step > 0 and scores is not None:
            frac = math.cos((step / steps) * math.pi * 0.5)
            k = max(int(round(n * frac)), 1)
            _, idx = jax.lax.top_k(scores, k)
            mask = jnp.zeros((batch_size, n), bool).at[
                jnp.arange(batch_size)[:, None], idx].set(True)

        ids = jnp.where(mask, mask_id, ids)
        input_ids = ids if prime_token_ids is None else jnp.concatenate(
            [prime_token_ids, ids], axis=-1)

        logits = fwd(input_ids, 0.0, r_drop)
        if cond_scale != 1 and context is not None:
            null_logits = fwd(input_ids, 1.0, r_drop)
            logits = null_logits + (logits - null_logits) * cond_scale
        if prime_len:
            logits = logits[:, prime_len:]

        temperature = starting_temperature * (steps_til_x0 / steps)
        pred_ids = gumbel_sample(r_gumbel, logits, temperature).astype(jnp.int32)
        ids = jnp.where(mask, pred_ids, ids)

        if step < steps - 1:
            if critic is not None:
                critic_in = ids if prime_token_ids is None else jnp.concatenate(
                    [prime_token_ids, ids], axis=-1)
                scores = critic_fn(critic_vars, critic_in, context, text_mask)
                if prime_len:
                    scores = scores[:, prime_len:]
                noise = noise_K * (jax.random.uniform(r_noise, scores.shape)
                                   - 0.5) * (steps_til_x0 / steps)
                scores = scores + noise
            else:
                probs = jax.nn.softmax(logits, axis=-1)
                conf = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]
                scores = jnp.where(mask, 1.0 - conf, -1e4)

    return ids
