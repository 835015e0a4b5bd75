"""Optimizers and LR schedules.

Reference behaviors reproduced:
  * get_optimizer (transformer_maskgit/optimizer.py:10-34): Adam when wd==0
    else AdamW with weight decay applied only to params of ndim >= 2,
    betas (0.9, 0.99), eps 1e-8.
  * cosine_lr (scripts/src/models/utils.py:19-32): linear warmup then cosine
    decay to 0 over the remaining steps.
  * CosineAnnealingWarmupRestarts (text_classifier/cosine_annealing_warmup.py,
    also scripts/CTCLIPTrainer.py:66-111 where it is defined but unused —
    the reference pretrains at constant lr 1.25e-6).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> dict:
    """Weight decay applies only to ndim>=2 params (optimizer.py:14-16)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def get_optimizer(lr: float, wd: float = 0.0, betas=(0.9, 0.99),
                  eps: float = 1e-8, max_grad_norm: Optional[float] = None,
                  schedule=None) -> optax.GradientTransformation:
    lr_or_schedule = schedule if schedule is not None else lr
    if wd == 0.0:
        opt = optax.adam(lr_or_schedule, b1=betas[0], b2=betas[1], eps=eps)
    else:
        opt = optax.adamw(lr_or_schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=wd, mask=decay_mask)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)


def cosine_lr_schedule(base_lr: float, warmup_length: int, steps: int):
    """scripts/src/models/utils.py:19-32: lr = base*(step+1)/warmup during
    warmup, then base * 0.5*(1+cos(pi*e/es)) with e = step-warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup_length, 1)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / es))
        return jnp.where(step < warmup_length, warm, cos)

    return schedule


def cawr_schedule(first_cycle_steps: int, max_lr: float, min_lr: float = 0.0,
                  warmup_steps: int = 0, gamma: float = 1.0):
    """Jit-friendly CosineAnnealingWarmupRestarts for fixed-length cycles
    (cycle_mult == 1); gamma decays the per-cycle max lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(step / first_cycle_steps)
        in_cycle = step - cycle * first_cycle_steps
        cur_max = max_lr * jnp.power(gamma, cycle)
        warm = (cur_max - min_lr) * in_cycle / max(warmup_steps, 1) + min_lr
        t = (in_cycle - warmup_steps) / max(first_cycle_steps - warmup_steps, 1)
        cos = min_lr + (cur_max - min_lr) * (1 + jnp.cos(jnp.pi * t)) / 2
        return jnp.where(in_cycle < warmup_steps, warm, cos)

    return schedule


def cosine_annealing_warmup_restarts(
        first_cycle_steps: int, cycle_mult: float = 1.0, max_lr: float = 0.1,
        min_lr: float = 0.001, warmup_steps: int = 0, gamma: float = 1.0):
    """CosineAnnealingWarmupRestarts as an optax-style schedule fn
    (text_classifier/cosine_annealing_warmup.py:5-87).  Implemented host-side
    per step (python ints) to keep the restart logic exact."""

    def schedule(step):
        step = int(step)
        cycle, cycle_steps, cycle_start = 0, first_cycle_steps, 0
        while step >= cycle_start + cycle_steps:
            cycle_start += cycle_steps
            cycle += 1
            cycle_steps = int(round(cycle_steps * cycle_mult)) if cycle_mult != 1.0 \
                else first_cycle_steps
        in_cycle = step - cycle_start
        cur_max = max_lr * (gamma ** cycle)
        if in_cycle < warmup_steps:
            return (cur_max - min_lr) * in_cycle / max(warmup_steps, 1) + min_lr
        t = (in_cycle - warmup_steps) / max(cycle_steps - warmup_steps, 1)
        return min_lr + (cur_max - min_lr) * (1 + math.cos(math.pi * t)) / 2

    return schedule


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.0) -> jnp.ndarray:
    """Label-smoothed cross entropy (scripts/src/models/utils.py:88-100):
    (1-s) * NLL(target) + s * mean(-logprobs), averaged over the batch."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def topk_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                  topk=(1,)) -> list:
    """Top-k correct counts (scripts/src/models/utils.py:35-38)."""
    order = jnp.argsort(-logits, axis=-1)
    out = []
    for k in topk:
        hit = jnp.any(order[:, :k] == targets[:, None], axis=-1)
        out.append(float(jnp.sum(hit)))
    return out
