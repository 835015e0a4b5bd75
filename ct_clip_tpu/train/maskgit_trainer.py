"""MaskGIT transformer trainer.

Parity with transformer_maskgit/train_transformer.py:93-352: masked-token CE
loss over frozen-CTViT codebook ids, cosine-annealing-warmup-restarts LR,
grad accumulation, periodic sampling dumps and checkpoints.  Optionally
trains a TokenCritic jointly (MaskGITTransformer.py:663-694).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MaskGitConfig
from ..models.ctvit import CTViT
from ..models.maskgit import (MaskGit, TokenCritic, critic_train_loss,
                              maskgit_train_loss, sample_tokens)
from .checkpoint import CheckpointManager
from .optimizer import cawr_schedule, cosine_annealing_warmup_restarts, get_optimizer


@dataclass
class MaskGitTrainer:
    maskgit: MaskGit
    ctvit: CTViT
    ctvit_variables: Dict
    critic: Optional[TokenCritic] = None
    lr: float = 3e-4
    wd: float = 0.01
    max_grad_norm: Optional[float] = 0.5
    cond_drop_prob: float = 0.25
    critic_loss_weight: float = 1.0
    steps_schedule: int = 18
    first_cycle_steps: int = 10000
    warmup_steps: int = 500
    results_folder: str = "./results_maskgit"
    save_model_every: int = 2000
    seed: int = 42

    state: Dict = field(default_factory=dict)

    def __post_init__(self):
        self.schedule = cawr_schedule(
            first_cycle_steps=self.first_cycle_steps, max_lr=self.lr,
            min_lr=self.lr * 1e-2, warmup_steps=self.warmup_steps)
        self.results = Path(self.results_folder)
        self.results.mkdir(parents=True, exist_ok=True)
        self.ckpt = CheckpointManager(self.results / "checkpoints")
        # variables threaded as a jit argument (closure constants are
        # embedded via device->host fetches at lowering — see bench.py)
        enc = jax.jit(lambda vars_, v: self.ctvit.apply(
            vars_, v, return_only_codebook_ids=True))
        self._encode = lambda v: enc(self.ctvit_variables, v)

    def encode_ids(self, video: jnp.ndarray) -> jnp.ndarray:
        """Frozen CTViT -> codebook ids (train_transformer.py via
        MaskGITTransformer.forward :590-594)."""
        return self._encode(video)

    def init(self, codebook_ids: jnp.ndarray, grid, context=None):
        flat = codebook_ids.reshape(codebook_ids.shape[0], -1)
        variables = self.maskgit.init(jax.random.PRNGKey(self.seed), flat,
                                      grid, context=context)
        self.tx = get_optimizer(lr=self.lr, wd=self.wd,
                                max_grad_norm=self.max_grad_norm,
                                schedule=self.schedule)
        self.state = {
            "step": 0,
            "params": variables["params"],
            "opt_state": self.tx.init(variables["params"]),
        }
        if self.critic is not None:
            cvars = self.critic.init(jax.random.PRNGKey(self.seed + 1), flat,
                                     grid, context=context)
            self.state["critic_params"] = cvars["params"]
            self.state["critic_opt_state"] = self.tx.init(cvars["params"])

        mg, critic = self.maskgit, self.critic

        def step_fn(params, opt_state, rng, ids, context,
                    critic_params=None, critic_opt=None):
            def loss_fn(p):
                loss, aux = maskgit_train_loss(
                    mg, {"params": p}, rng, ids, grid, context=context,
                    cond_drop_prob=self.cond_drop_prob,
                    steps=self.steps_schedule)
                return loss, aux

            (loss, (masked, mask, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            closs = jnp.zeros(())
            if critic_params is not None:
                def c_loss_fn(cp):
                    return critic_train_loss(critic, {"params": cp},
                                             jax.random.fold_in(rng, 7), ids,
                                             logits, mask, grid,
                                             context=context)
                closs, cgrads = jax.value_and_grad(c_loss_fn)(critic_params)
                cupd, critic_opt = self.tx.update(cgrads, critic_opt,
                                                  critic_params)
                critic_params = optax.apply_updates(critic_params, cupd)
            return params, opt_state, loss, critic_params, critic_opt, closs

        self._step = jax.jit(step_fn)

    def train_step(self, codebook_ids: jnp.ndarray, grid,
                   context=None) -> Dict[str, float]:
        flat = codebook_ids.reshape(codebook_ids.shape[0], -1)
        if not self.state:
            self.init(codebook_ids, grid, context)
        s = self.state
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), s["step"])
        (s["params"], s["opt_state"], loss, cp, co, closs) = self._step(
            s["params"], s["opt_state"], rng, flat, context,
            s.get("critic_params"), s.get("critic_opt_state"))
        if cp is not None:
            s["critic_params"], s["critic_opt_state"] = cp, co
        s["step"] += 1
        if s["step"] % self.save_model_every == 0:
            self.ckpt.save(s["step"], {k: v for k, v in s.items()
                                       if k != "step"})
        return {"loss": float(loss), "critic_loss": float(closs),
                "lr": float(np.asarray(self.schedule(s["step"] - 1)))}

    def sample(self, grid, batch_size=1, context=None, steps=18,
               cond_scale=3.0, rng=None):
        """Periodic eval sampling (train_transformer.py:306) -> decoded video
        via the frozen CTViT decoder."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = sample_tokens(
            self.maskgit, {"params": self.state["params"]}, rng, grid,
            batch_size=batch_size, context=context, steps=steps,
            cond_scale=cond_scale,
            critic=self.critic,
            critic_vars=({"params": self.state["critic_params"]}
                         if self.critic is not None else None))
        return self.ctvit.decode_from_codebook_indices(
            self.ctvit_variables, ids, grid)
