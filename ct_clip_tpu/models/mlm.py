"""Masked-language-model auxiliary loss (CT_CLIP/ct_clip/mlm.py).

Semantics: sample ceil(mask_prob * seq_len) non-pad positions per row
(mlm.py:18-32 top-k-of-uniform sampler with excess clamping); of the masked
positions, `replace_prob` (0.9) are replaced with [MASK]; cross-entropy on
the masked positions only (labels elsewhere set to pad and ignored)
(mlm.py:68-109).  Off in production configs (use_mlm=False,
scripts/run_train.py:40) but a capability of the package.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def subset_mask_with_prob(rng, valid: jnp.ndarray, prob: float) -> jnp.ndarray:
    """Choose ceil(prob*seq_len) positions among `valid` per row, clamped to
    ceil(prob * num_valid) actual picks (mlm.py:18-32 semantics)."""
    b, n = valid.shape
    max_masked = math.ceil(prob * n)
    num_valid = jnp.sum(valid, axis=-1, keepdims=True)
    quota = jnp.ceil(prob * num_valid)  # per-row picks allowed

    scores = jax.random.uniform(rng, (b, n))
    scores = jnp.where(valid, scores, -1e9)
    _, idx = jax.lax.top_k(scores, max_masked)  # (b, max_masked)
    ranks = jnp.arange(max_masked)[None, :]
    keep = ranks < quota  # only the first `quota` picks count
    mask = jnp.zeros((b, n), bool)
    rows = jnp.arange(b)[:, None]
    return mask.at[rows, idx].set(keep)


class MLM(nn.Module):
    """Wraps a text encoder apply-fn producing hidden states; adds the
    to-logits head and the masking objective."""

    encode_fn: Callable  # (module scope) tokens, mask -> (b, n, dim) hidden
    dim: int
    num_tokens: int
    mask_prob: float = 0.15
    replace_prob: float = 0.9
    mask_token_id: int = 2
    pad_token_id: int = 0

    @nn.compact
    def __call__(self, seq: jnp.ndarray, attention_mask: jnp.ndarray,
                 rng: Optional[jax.Array] = None):
        if rng is None:
            rng = self.make_rng("mlm")
        rng_pos, rng_rep = jax.random.split(rng)

        valid = (seq != self.pad_token_id) & (attention_mask > 0)
        mask = subset_mask_with_prob(rng_pos, valid, self.mask_prob)

        replace = jax.random.bernoulli(rng_rep, self.replace_prob, seq.shape)
        masked_seq = jnp.where(mask & replace, self.mask_token_id, seq)
        labels = jnp.where(mask, seq, self.pad_token_id)

        hidden = self.encode_fn(masked_seq, attention_mask)
        logits = nn.Dense(self.num_tokens, name="to_logits")(hidden)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_logp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        weights = (labels != self.pad_token_id).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        return -jnp.sum(token_logp * weights) / denom
