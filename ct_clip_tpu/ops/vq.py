"""Cosine-similarity vector quantizer with EMA codebook.

Capability parity with `VectorQuantize(dim=512, codebook_size=8192,
use_cosine_sim=True)` as configured at transformer_maskgit/ctvit.py:188
(vector-quantize-pytorch cosine codebook: l2-normalized inputs and codes,
argmax dot-product assignment, EMA cluster updates, straight-through
estimator, MSE commitment loss).

TPU mapping: the assignment is a single (N, dim) x (dim, K) matmul on the MXU
followed by an argmax — for the production shape that is (b*13824, 512) x
(512, 8192), ideal MXU work.  The codebook is non-trainable state in the
"vq" flax collection, updated by EMA when `train=True`; cross-device
reduction of the EMA statistics uses `jax.lax.psum` over the data mesh axis
(the reference relies on per-device statistics only).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import l2norm

# Rows per tile of the assignment matmul.  The full (N, K) distance matrix at
# production shape (8*13824 tokens x 8192 codes, f32) is ~3.6 GB of HLO temp
# — chunking bounds it to (CHUNK, 8192) = 128 MB while keeping each tile a
# dense MXU matmul.
_ASSIGN_CHUNK = 4096


def _chunked_argmax_sim(flat_n: jnp.ndarray, embed_n: jnp.ndarray) -> jnp.ndarray:
    """argmax_k flat_n @ embed_n.T computed in row tiles via lax.map."""
    n = flat_n.shape[0]
    if n <= _ASSIGN_CHUNK:
        dist = jnp.einsum("nd,kd->nk", flat_n, embed_n,
                          preferred_element_type=jnp.float32)
        return jnp.argmax(dist, axis=-1)
    pad = (-n) % _ASSIGN_CHUNK
    padded = jnp.pad(flat_n, ((0, pad), (0, 0)))
    tiles = padded.reshape(-1, _ASSIGN_CHUNK, flat_n.shape[1])

    def one(tile):
        dist = jnp.einsum("nd,kd->nk", tile, embed_n,
                          preferred_element_type=jnp.float32)
        return jnp.argmax(dist, axis=-1)

    return jax.lax.map(one, tiles).reshape(-1)[:n]


def _chunked_cluster_stats(flat_n: jnp.ndarray, ind: jnp.ndarray,
                           codebook_size: int):
    """(bins, embed_sum) without materializing the full (N, K) one-hot
    (3.6 GB at production shape) — scan over row tiles, accumulate (K,) and
    (K, dim)."""
    n, d = flat_n.shape
    if n <= _ASSIGN_CHUNK:
        onehot = jax.nn.one_hot(ind, codebook_size, dtype=jnp.float32)
        return jnp.sum(onehot, axis=0), jnp.einsum(
            "nd,nk->kd", flat_n, onehot, preferred_element_type=jnp.float32)
    pad = (-n) % _ASSIGN_CHUNK
    padded = jnp.pad(flat_n, ((0, pad), (0, 0)))
    # padded rows get index -1 -> one_hot produces all-zero rows (no effect)
    ind_padded = jnp.pad(ind, (0, pad), constant_values=-1)
    tiles = padded.reshape(-1, _ASSIGN_CHUNK, d)
    ind_tiles = ind_padded.reshape(-1, _ASSIGN_CHUNK)

    def body(carry, xs):
        bins, esum = carry
        tile, ind_tile = xs
        onehot = jax.nn.one_hot(ind_tile, codebook_size, dtype=jnp.float32)
        bins = bins + jnp.sum(onehot, axis=0)
        esum = esum + jnp.einsum("nd,nk->kd", tile, onehot,
                                 preferred_element_type=jnp.float32)
        return (bins, esum), None

    init = (jnp.zeros((codebook_size,), jnp.float32),
            jnp.zeros((codebook_size, d), jnp.float32))
    (bins, esum), _ = jax.lax.scan(body, init, (tiles, ind_tiles))
    return bins, esum


class CosineVQ(nn.Module):
    dim: int
    codebook_size: int
    decay: float = 0.8
    commitment_weight: float = 1.0
    eps: float = 1e-5
    axis_name: Optional[str] = None  # psum EMA stats over this mesh axis
    # True -> the assignment similarities are true f32 on the MXU (matches
    # the f32 reference exactly; what EMA-codebook training parity needs).
    # False -> one bf16 MXU pass, ~4e-3 relative margin within which
    # near-tied codes can swap (measured ~0.5% of assignments on random
    # tokens), 6x faster.  None (default) -> exact when train=True, fast
    # for pure inference.
    exact_sim: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (..., dim). Returns (quantized, indices, commit_loss)."""
        embed_init = lambda rng: l2norm(
            jax.random.normal(rng, (self.codebook_size, self.dim), jnp.float32))
        embed_var = self.variable("vq", "embed", embed_init, self.make_rng("params")
                                  if self.is_initializing() else None)
        csize_var = self.variable("vq", "cluster_size",
                                  lambda *_: jnp.zeros((self.codebook_size,), jnp.float32),
                                  None)
        embed = embed_var.value

        shape = x.shape
        flat = x.reshape(-1, self.dim).astype(jnp.float32)
        embed_n = l2norm(embed)

        from .pallas.vq import _plan as _vq_plan
        from .pallas.vq import pallas_assign, pallas_cluster_stats

        m = _vq_plan(flat.shape[0], self.dim, self.codebook_size)
        if m is not None:
            # fused l2norm + MXU similarity + lane argmax; the normalized
            # token tensor never hits HBM (ops/pallas/vq.py).  stop_gradient:
            # the assignment is non-differentiable (argmax) and pallas_call
            # has no JVP rule — without it, linearizing the train step fails.
            # kernels take the raw (bf16) activations and cast/normalize
            # per-block in VMEM — the f32 `flat` copy is only for the XLA
            # loss terms below
            flat_raw = jax.lax.stop_gradient(x.reshape(-1, self.dim))
            exact = self.exact_sim if self.exact_sim is not None else train
            ind = pallas_assign(flat_raw, embed_n, m, exact=exact)
        else:
            ind = _chunked_argmax_sim(l2norm(flat), embed_n)
        quantize = jnp.take(embed, ind, axis=0)

        if train and not self.is_initializing():
            if m is not None:
                bins, embed_sum = pallas_cluster_stats(
                    flat_raw, ind, self.codebook_size, m)
            else:
                bins, embed_sum = _chunked_cluster_stats(
                    l2norm(flat), ind, self.codebook_size)
            if self.axis_name is not None:
                bins = jax.lax.psum(bins, self.axis_name)
                embed_sum = jax.lax.psum(embed_sum, self.axis_name)
            zero_mask = bins == 0
            safe_bins = jnp.where(zero_mask, 1.0, bins)
            embed_normalized = l2norm(embed_sum / safe_bins[:, None])
            embed_normalized = jnp.where(zero_mask[:, None], embed, embed_normalized)
            new_embed = embed * self.decay + embed_normalized * (1.0 - self.decay)
            new_csize = csize_var.value * self.decay + bins * (1.0 - self.decay)
            # EMA state must not carry gradients
            embed_var.value = jax.lax.stop_gradient(new_embed)
            csize_var.value = jax.lax.stop_gradient(new_csize)

        quantize = quantize.reshape(shape).astype(x.dtype)
        # straight-through estimator + commitment loss
        commit_loss = jnp.mean(
            (jax.lax.stop_gradient(quantize.astype(jnp.float32))
             - x.astype(jnp.float32)) ** 2) * self.commitment_weight
        quantize = x + jax.lax.stop_gradient(quantize - x)
        ind = ind.reshape(shape[:-1])
        return quantize, ind, commit_loss

    @staticmethod
    def lookup(embed: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
        """Codebook lookup for decode_from_codebook_indices (ctvit.py:274-276)."""
        return jnp.take(embed, indices, axis=0)
