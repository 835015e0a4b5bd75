"""Visual self-supervision auxiliary losses (CT_CLIP/ct_clip/visual_ssl.py).

SimSiam (visual_ssl.py:207-259) and SimCLR/NT-Xent (:263-299, loss :88-102)
over two augmented views of the volume, tapping a configurable layer of the
image tower.  Off in production (use_visual_ssl=False) but a package
capability.

Parity notes vs the reference:

* **Hidden-layer tap** — the reference wraps the tower in a `NetWrapper`
  that forward-hooks a configurable layer (`visual_ssl_hidden_layer`,
  visual_ssl.py:141-203) and flattens its output `'... d -> (...) d'`.
  Here the tap is the `encode_fn` the caller passes (models/ctclip.py
  builds it from `CTCLIPConfig.visual_ssl_tap`: the temporal-transformer
  token output by default, the spatial-transformer output, or the pooled
  embedding); `flatten_tap` reproduces the NetWrapper flatten.
* **Projector/predictor shapes** match exactly: the projector is
  `SimSiamMLP(dim, 256, hidden=4096)` — three bias-free Linears with
  BatchNorm+ReLU between and a final affine-free BatchNorm
  (visual_ssl.py:123-137); NetWrapper builds the SAME SimSiamMLP for
  SimCLR with `project_dim=128` (:175-179).  The SimSiam predictor is
  `MLP(256, 256, hidden=4096)` (:113-121, :228).  BatchNorm uses inline
  batch statistics (torch BN in training mode); running averages are not
  tracked because the SSL loss only ever runs in training.
* **Losses**: SimSiam `2 - 2*cos` with stop-grad targets, both directions
  summed then batch-meaned (visual_ssl.py:104-108, :237-259); SimCLR
  NT-Xent with self-similarity excluded and sum/n reduction (:88-102) —
  the -inf self-mask used here is mathematically identical to the
  reference's `logits[~eye].reshape(n, n-1)` row compaction.
* **Augmentations** — the reference's torchvision 2D pipeline
  (visual_ssl.py:24-45) does not apply to 3D volumes; `augment_volume`
  maps it: ColorJitter(brightness/contrast) -> random intensity
  scale+shift, RandomHorizontalFlip -> random H/W flips, RandomResizedCrop
  / GaussianBlur -> omitted (a 3D resized crop re-runs the resampler and a
  3D blur is a full conv — both documented deviations; the path is
  production-off).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norms import l2norm


def augment_volume(rng: jax.Array, video: jnp.ndarray) -> jnp.ndarray:
    """Random H/W flips + intensity scale/shift jitter; jit-safe,
    shape-preserving (3D mapping of visual_ssl.py:24-45, see module doc)."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    video = jnp.where(jax.random.bernoulli(r1), video[:, :, ::-1], video)
    video = jnp.where(jax.random.bernoulli(r2), video[:, :, :, ::-1], video)
    scale = 1.0 + 0.1 * jax.random.uniform(r3, (), minval=-1.0, maxval=1.0)
    shift = 0.05 * jax.random.uniform(r4, (), minval=-1.0, maxval=1.0)
    return video * scale + shift


def flatten_tap(x: jnp.ndarray) -> jnp.ndarray:
    """NetWrapper's `rearrange(representation, '... d -> (...) d')`
    (visual_ssl.py:200): token taps become (b*n, d) rows."""
    return x.reshape(-1, x.shape[-1])


class _BatchNorm(nn.Module):
    """torch BatchNorm1d in training mode: normalize over the row axis with
    the CURRENT batch statistics (running averages are irrelevant here —
    the SSL loss only runs in training)."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.var(xf, axis=0, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            out = out * scale + bias
        return out.astype(x.dtype)


class SimSiamMLP(nn.Module):
    """visual_ssl.py:123-137: Linear(no bias) -> BN -> ReLU, x2, then
    Linear(no bias) -> BN(affine=False).  hidden defaults to 4096."""

    projection_size: int = 256
    hidden: int = 4096

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(self.hidden, use_bias=False, name=f"fc{i}")(x)
            x = _BatchNorm(name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.projection_size, use_bias=False, name="out")(x)
        return _BatchNorm(affine=False, name="bn_out")(x)


class MLP(nn.Module):
    """visual_ssl.py:113-121: Linear -> BN -> ReLU -> Linear (with biases)."""

    projection_size: int = 256
    hidden: int = 4096

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc0")(x)
        x = _BatchNorm(name="bn0")(x)
        x = nn.relu(x)
        return nn.Dense(self.projection_size, name="out")(x)


def simsiam_loss(p1, z1, p2, z2) -> jnp.ndarray:
    """loss_fn = 2 - 2*cos with stop-grad targets, both directions summed,
    batch mean (visual_ssl.py:104-108 + SimSiam.forward :237-259)."""
    def d(p, z):
        return 2.0 - 2.0 * jnp.sum(l2norm(p)
                                   * l2norm(jax.lax.stop_gradient(z)),
                                   axis=-1)
    return jnp.mean(d(p1, z2) + d(p2, z1))


def nt_xent_loss(z1, z2, temperature: float = 0.1) -> jnp.ndarray:
    """SimCLR NT-Xent (visual_ssl.py:88-102): 2N-way softmax over cosine
    sims; the -inf self-mask equals the reference's eye-compaction."""
    z = l2norm(jnp.concatenate([z1, z2], axis=0))
    n = z.shape[0]
    sim = (z @ z.T) / temperature
    sim = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, sim)
    targets = jnp.concatenate([jnp.arange(n // 2) + n // 2,
                               jnp.arange(n // 2)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


class SimSiam(nn.Module):
    """encode_fn: video -> tap output (the NetWrapper equivalent,
    visual_ssl.py:141-203); token taps are flattened to (b*n, d) rows."""

    encode_fn: Callable
    dim: int
    projection_size: int = 256
    projection_hidden: int = 4096

    @nn.compact
    def __call__(self, video, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        v1, v2 = augment_volume(r1, video), augment_volume(r2, video)
        e1, e2 = flatten_tap(self.encode_fn(v1)), \
            flatten_tap(self.encode_fn(v2))
        proj = SimSiamMLP(self.projection_size, self.projection_hidden,
                          name="projector")
        pred = MLP(self.projection_size, self.projection_hidden,
                   name="predictor")
        z1, z2 = proj(e1), proj(e2)
        return simsiam_loss(pred(z1), z1, pred(z2), z2)


class SimCLR(nn.Module):
    """NetWrapper._get_projector builds the same SimSiamMLP for SimCLR,
    with project_dim=128 (visual_ssl.py:175-179, :263-299)."""

    encode_fn: Callable
    dim: int
    projection_size: int = 128
    projection_hidden: int = 4096
    temperature: float = 0.1

    @nn.compact
    def __call__(self, video, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        v1, v2 = augment_volume(r1, video), augment_volume(r2, video)
        e1, e2 = flatten_tap(self.encode_fn(v1)), \
            flatten_tap(self.encode_fn(v2))
        proj = SimSiamMLP(self.projection_size, self.projection_hidden,
                          name="projector")
        return nt_xent_loss(proj(e1), proj(e2), self.temperature)
