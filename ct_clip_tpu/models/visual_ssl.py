"""Visual self-supervision auxiliary losses (CT_CLIP/ct_clip/visual_ssl.py).

SimSiam (visual_ssl.py:207-259) and SimCLR/NT-Xent (:263-299, loss :88-102)
over two augmented views of the volume, tapping the image tower's latent.
Off in production (use_visual_ssl=False) but a package capability.

The reference's torchvision 2D augmentations don't apply to 3D volumes; here
augmentation is a jittable 3D pipeline (random flips + intensity jitter) and
projector/predictor MLPs follow the reference shapes.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norms import l2norm


def augment_volume(rng: jax.Array, video: jnp.ndarray) -> jnp.ndarray:
    """Random H/W flips + brightness jitter; jit-safe, shape-preserving."""
    r1, r2, r3 = jax.random.split(rng, 3)
    video = jnp.where(jax.random.bernoulli(r1), video[:, :, ::-1], video)
    video = jnp.where(jax.random.bernoulli(r2), video[:, :, :, ::-1], video)
    scale = 1.0 + 0.1 * jax.random.uniform(r3, (), minval=-1.0, maxval=1.0)
    return video * scale


class MLPHead(nn.Module):
    """projection/prediction MLP (visual_ssl.py:117-137 shapes)."""

    dim: int
    hidden: int
    out: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="out")(x)


def simsiam_loss(p1, z1, p2, z2) -> jnp.ndarray:
    """Negative cosine with stop-grad targets (visual_ssl.py:247-259)."""
    def d(p, z):
        return -jnp.mean(jnp.sum(l2norm(p) * l2norm(jax.lax.stop_gradient(z)),
                                 axis=-1))
    return 0.5 * (d(p1, z2) + d(p2, z1))


def nt_xent_loss(z1, z2, temperature: float = 0.1) -> jnp.ndarray:
    """SimCLR NT-Xent (visual_ssl.py:88-102): 2N-way softmax over cosine
    sims excluding self."""
    z = l2norm(jnp.concatenate([z1, z2], axis=0))
    n = z.shape[0]
    sim = (z @ z.T) / temperature
    sim = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, sim)
    targets = jnp.concatenate([jnp.arange(n // 2) + n // 2,
                               jnp.arange(n // 2)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


class SimSiam(nn.Module):
    """encode_fn: video -> (b, d) embedding (the NetWrapper hidden-layer tap
    equivalent, visual_ssl.py:141-203)."""

    encode_fn: Callable
    dim: int
    projection_size: int = 256
    projection_hidden: int = 4096

    @nn.compact
    def __call__(self, video, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        v1, v2 = augment_volume(r1, video), augment_volume(r2, video)
        e1, e2 = self.encode_fn(v1), self.encode_fn(v2)
        proj = MLPHead(self.dim, self.projection_hidden, self.projection_size,
                       num_layers=3, name="projector")
        pred = MLPHead(self.projection_size, self.projection_hidden // 8,
                       self.projection_size, name="predictor")
        z1, z2 = proj(e1), proj(e2)
        return simsiam_loss(pred(z1), z1, pred(z2), z2)


class SimCLR(nn.Module):
    encode_fn: Callable
    dim: int
    projection_size: int = 256
    temperature: float = 0.1

    @nn.compact
    def __call__(self, video, rng: jax.Array):
        r1, r2 = jax.random.split(rng)
        v1, v2 = augment_volume(r1, video), augment_volume(r2, video)
        e1, e2 = self.encode_fn(v1), self.encode_fn(v2)
        proj = MLPHead(self.dim, self.dim, self.projection_size,
                       name="projector")
        return nt_xent_loss(proj(e1), proj(e2), self.temperature)
