"""Fine-tuning protocols: VocabFine and LiPro (ClassFine).

VocabFine (scripts/ct_vocabfine_train.py:22-176): end-to-end fine-tune of the
whole CLIP with a prompt-pair MSE objective — for each pathology, the pair
(true statement, contradicting statement) built from GT labels must softmax
to [1, 0].  The reference runs 18 sequential forwards per volume in 3 chunks
of 6 with backward per chunk; here all 36 distinct prompts are encoded ONCE
per step and scored against the batched image latents in one einsum — the
summed-chunk gradient (3 x mean over all pairs) is preserved exactly.

LiPro (scripts/ct_lipro_train.py:17-147): frozen CTCLIP backbone; image
latent -> ReLU -> Dropout(0.3) -> Linear(512 -> 18); BCE-with-logits with the
18 per-class pos_weights; AdamW + cosine_lr, grad clip 1.0.  A
latent-caching fast path trains the head on precomputed latents (the
backbone is frozen, so latents are constants — encode each volume once).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..config import PATHOLOGIES, CTCLIPConfig
from ..models.ctclip import CTCLIP
from ..inference.zero_shot import pathology_prompts

# reference pos_weights (ct_lipro_train.py:79-83)
LIPRO_POS_WEIGHTS = np.asarray([
    9.211362733, 2.384068466, 8.295479204, 32.8629776, 2.992233613,
    6.064870808, 3.176470588, 4.187083754, 3.022222222, 1.216071737,
    1.677849552, 3.152851834, 7.123261694, 18.16629381, 13.8480647,
    6.335045662, 10.81701149, 13.40695067], np.float32)


# --------------------------------------------------------------------------
# VocabFine
# --------------------------------------------------------------------------

def vocabfine_prompt_batch(tokenizer, pathologies: Sequence[str] = PATHOLOGIES,
                           max_length: int = 512) -> Dict[str, np.ndarray]:
    """Tokenize the 36 prompts: [p0 present, p0 absent, p1 present, ...].
    Note the reference appends a trailing space to each fine-tune prompt
    ("{p} is present. ") — preserved here (ct_vocabfine_train.py:100-104)."""
    prompts = []
    for p in pathologies:
        prompts.append(f"{p} is present. ")
        prompts.append(f"{p} is not present. ")
    return tokenizer(prompts, padding="max_length", truncation=True,
                     max_length=max_length)


def vocabfine_loss(model: CTCLIP, variables, prompt_ids, prompt_mask, video,
                   labels, train: bool = True, rngs=None, mutable=()):
    """labels: (B, 18) in {0,1}.  Returns (loss, new_mutable_vars)."""
    out = model.apply(
        variables, prompt_ids, prompt_mask, video, return_latents=True,
        train=train, deterministic=not train, rngs=rngs,
        mutable=list(mutable) if mutable else False)
    (text_latents, image_latents, _enc), new_vars = (out if mutable
                                                     else (out, {}))
    temp = jnp.exp(variables["params"]["temperature"])
    P = text_latents.shape[0] // 2
    pairs = text_latents.reshape(P, 2, -1)  # (18, {present, absent}, d)

    logits = jnp.einsum("bd,pkd->bpk", image_latents, pairs) * temp
    # order each pair as (true statement, false statement) given GT
    lab = labels.astype(jnp.int32)  # (B, P); 1 -> true statement is k=0
    true_first = jnp.stack([
        jnp.take_along_axis(logits, (1 - lab)[..., None], axis=-1)[..., 0],
        jnp.take_along_axis(logits, lab[..., None], axis=-1)[..., 0],
    ], axis=-1)  # (B, P, 2): [aligned, contradicting]
    probs = jax.nn.softmax(true_first, axis=-1)
    target = jnp.asarray([1.0, 0.0])
    # 3 chunks x mean-per-chunk summed == 3 x global mean (chunk sizes equal)
    loss = 3.0 * jnp.mean((probs - target) ** 2)
    return loss, new_vars


def make_vocabfine_step(model: CTCLIP, tx: optax.GradientTransformation,
                        mesh=None, data_axis: str = "data"):
    """One jitted full-model update.  With `mesh`, the volume/label batch is
    sharded over the data axis (the per-example prompt-pair loss needs no
    cross-example gather; XLA inserts the gradient psum) and params/moments
    keep their current placement — pair with `shard_params` /
    `shard_opt_state` for ZeRO-1 moments.  The reference fine-tune is
    single-GPU with DataParallel (ct_vocabfine_train.py:62)."""

    def step(params, vq, opt_state, prompt_ids, prompt_mask, video, labels, rng):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bs = NamedSharding(mesh, P(data_axis))
            video = jax.lax.with_sharding_constraint(video, bs)
            labels = jax.lax.with_sharding_constraint(labels, bs)

        def loss_fn(p):
            loss, new_vars = vocabfine_loss(
                model, {"params": p, "vq": vq}, prompt_ids, prompt_mask,
                video, labels, train=True, rngs={"dropout": rng},
                mutable=("vq",))
            return loss, new_vars.get("vq", vq)

        (loss, new_vq), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_vq, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 2))


# --------------------------------------------------------------------------
# LiPro (ClassFine)
# --------------------------------------------------------------------------

class LiProHead(nn.Module):
    """ReLU -> Dropout -> Linear(512 -> num_classes)
    (ct_lipro_train.py:25-32)."""

    num_classes: int = 18
    dropout: float = 0.3

    @nn.compact
    def __call__(self, latents, deterministic: bool = True):
        x = nn.relu(latents)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(x)


def bce_with_logits(logits, labels, pos_weight=None):
    """torch BCEWithLogitsLoss(pos_weight=...) semantics, mean reduction."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w_pos = 1.0 if pos_weight is None else pos_weight
    loss = -(w_pos * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(loss)


def make_lipro_latent_fn(model: CTCLIP, variables, mesh=None,
                         data_axis: str = "data") -> Callable:
    """Frozen-backbone latent extractor: video -> (B, dim_latent).  The
    reference passes a single-space text (" ") it then ignores
    (ct_lipro_train.py:96); only image latents feed the head.

    `variables` is threaded as a jit ARGUMENT: closing over the full weight
    tree would embed ~1.2 GB of MLIR constants via device->host fetches at
    lowering time (minutes through a chip tunnel, and an unshareable
    executable).

    With `mesh`, the video batch is sharded over the data axis so latent
    extraction for the whole dataset scales across chips (the reference
    wraps the frozen tower in DataParallel, ct_lipro_train.py:75)."""

    def latent_fn(vars_, video):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            video = jax.lax.with_sharding_constraint(
                video, NamedSharding(mesh, P(data_axis)))
        latents, _ = model.apply(vars_, video, method=CTCLIP.encode_image)
        return jax.lax.stop_gradient(latents)

    latent_fn = jax.jit(latent_fn)
    return lambda video: latent_fn(variables, video)


def make_lipro_step(head: LiProHead, tx: optax.GradientTransformation,
                    pos_weight=LIPRO_POS_WEIGHTS, max_grad_norm: float = 1.0):
    """Train step over precomputed latents (the fast path; numerically the
    same as reference since the backbone is frozen)."""
    pos_weight = jnp.asarray(pos_weight)
    clip = optax.clip_by_global_norm(max_grad_norm)

    def step(params, opt_state, latents, labels, rng):
        def loss_fn(p):
            logits = head.apply({"params": p}, latents, deterministic=False,
                                rngs={"dropout": rng})
            return bce_with_logits(logits, labels, pos_weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, _ = clip.update(grads, None)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def lipro_predict(head: LiProHead, head_params, latent_fn, video) -> np.ndarray:
    """Inference path (ct_lipro_inference.py:44-90): sigmoid of head logits."""
    latents = latent_fn(video)
    logits = head.apply({"params": head_params}, latents, deterministic=True)
    return np.asarray(jax.nn.sigmoid(logits))


def train_vocabfine(model: CTCLIP, variables, tokenizer, dataset, *,
                    lr: float = 1e-5, wd: float = 0.1, epochs: int = 1,
                    warmup_length: int = 500, batch_size: int = 1,
                    num_workers: int = 8, seed: int = 0,
                    compute_dtype=jnp.float32, max_steps: Optional[int] = None,
                    mesh=None, mesh_cfg=None):
    """End-to-end VocabFine harness (ct_vocabfine_train.py:22-176): every
    parameter trains (requires_grad=True for all, :46-50), AdamW + cosine_lr
    warmup schedule (:68-69), prompt-pair MSE via `vocabfine_loss`.

    TPU-native: the 36 prompts are tokenized once (they only depend on the
    pathology list; GT labels reorder pair elements inside the loss), volumes
    are batched, and the whole update is one jitted step.  With `mesh`
    (+ optional MeshConfig) the batch shards over the data axis and the
    full-model AdamW moments shard ZeRO-1 style via `shard_opt_state`.

    Returns (variables, history)."""
    from ..data.loader import VolumeLoader, preprocess_sample
    from .optimizer import cosine_lr_schedule

    prompts = vocabfine_prompt_batch(tokenizer)
    prompt_ids = jnp.asarray(prompts["input_ids"])
    prompt_mask = jnp.asarray(prompts["attention_mask"])

    steps_per_epoch = max(1, len(dataset) // batch_size)
    total = epochs * steps_per_epoch
    schedule = cosine_lr_schedule(lr, warmup_length, total)
    tx = optax.adamw(schedule, weight_decay=wd)
    params, vq = variables["params"], variables.get("vq", {})
    opt_state = tx.init(params)
    data_axis = "data"
    if mesh is not None:
        from ..config import MeshConfig
        from ..parallel.mesh import shard_opt_state, shard_params

        mesh_cfg = mesh_cfg or MeshConfig(fsdp="zero1")
        data_axis = mesh_cfg.data_axis
        params = shard_params(params, mesh, mesh_cfg)
        vq = jax.tree.map(
            lambda x: jax.device_put(x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())), vq)
        opt_state = shard_opt_state(opt_state, params, mesh, mesh_cfg)
    step_fn = make_vocabfine_step(model, tx, mesh=mesh, data_axis=data_axis)

    history = []
    step = 0
    for epoch in range(epochs):
        buf_v, buf_l = [], []
        for sample in VolumeLoader(dataset, num_workers=num_workers,
                                   prefetch=2 * batch_size, shuffle=True,
                                   seed=seed + epoch,
                                   raw_dtype=np.int16, raw_layout="zyx"):
            vol = preprocess_sample(sample, dataset.clip_before_resample,
                                    out_dtype=compute_dtype)
            buf_v.append(vol[..., None])
            buf_l.append(sample.meta.labels)
            if len(buf_v) < batch_size:
                continue
            video = jnp.stack(buf_v).astype(compute_dtype)
            labels = jnp.asarray(np.stack(buf_l))
            buf_v, buf_l = [], []
            params, vq, opt_state, loss = step_fn(
                params, vq, opt_state, prompt_ids, prompt_mask, video, labels,
                jax.random.fold_in(jax.random.PRNGKey(seed), step))
            history.append({"step": step, "epoch": epoch,
                            "loss": float(loss),
                            "lr": float(schedule(step))})
            step += 1
            if max_steps is not None and step >= max_steps:
                return {"params": params, "vq": vq}, history
    return {"params": params, "vq": vq}, history
