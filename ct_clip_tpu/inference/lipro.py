"""LiPro (ClassFine) end-to-end harness.

Parity with scripts/ct_lipro_train.py:40-147 (training loop over the infer
dataset with BCE pos-weights) and ct_lipro_inference.py:44-90 (sigmoid
probabilities -> npz + AUROC table).  The backbone is frozen, so volumes are
encoded ONCE into latents (cached) and the head trains on them — epochs cost
one matmul each instead of re-running the 3D tower (this is why the
reference quotes 0.5 s/volume for ClassFine; here the tower runs once per
volume total).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PATHOLOGIES
from ..models.ctclip import CTCLIP
from ..train.finetune import (LIPRO_POS_WEIGHTS, LiProHead,
                              make_lipro_latent_fn, make_lipro_step)


def encode_dataset_latents(model: CTCLIP, variables, dataset,
                           num_workers: int = 8,
                           compute_dtype=jnp.bfloat16):
    """One pass over the dataset -> (latents (N, d), labels (N, 18),
    accessions)."""
    from ..data.loader import VolumeLoader, preprocess_sample

    latent_fn = make_lipro_latent_fn(model, variables)
    latents, labels, names = [], [], []
    for sample in VolumeLoader(dataset, num_workers=num_workers, prefetch=4,
                               raw_dtype=np.int16, raw_layout="zyx"):
        vol = preprocess_sample(sample, dataset.clip_before_resample,
                                out_dtype=compute_dtype)
        lat = latent_fn(vol[None, ..., None])
        latents.append(np.asarray(lat[0], np.float32))
        labels.append(sample.meta.labels if sample.meta.labels is not None
                      else np.zeros(len(PATHOLOGIES), np.float32))
        names.append(sample.meta.accession)
    return np.stack(latents), np.stack(labels), names


def train_lipro(model: CTCLIP, variables, train_dataset, *,
                lr: float = 1e-3, wd: float = 0.01, epochs: int = 10,
                batch_size: int = 8, dropout: float = 0.3,
                pos_weight=LIPRO_POS_WEIGHTS, num_workers: int = 8,
                seed: int = 0,
                cached: Optional[Tuple[np.ndarray, np.ndarray]] = None):
    """Returns (head, head_params, history)."""
    if cached is None:
        latents, labels, _ = encode_dataset_latents(model, variables,
                                                    train_dataset,
                                                    num_workers)
    else:
        latents, labels = cached
    head = LiProHead(num_classes=labels.shape[1], dropout=dropout)
    params = head.init({"params": jax.random.PRNGKey(seed),
                        "dropout": jax.random.PRNGKey(seed + 1)},
                       jnp.asarray(latents[:1]),
                       deterministic=False)["params"]
    tx = optax.adamw(lr, weight_decay=wd)
    opt_state = tx.init(params)
    step = make_lipro_step(head, tx, pos_weight=pos_weight[: labels.shape[1]])

    rng = np.random.RandomState(seed)
    history = []
    n = len(latents)
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n, batch_size):
            idx = order[i: i + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(latents[idx]),
                jnp.asarray(labels[idx]),
                jax.random.PRNGKey(seed * 100000 + epoch * 1000 + i))
            losses.append(float(loss))
        history.append({"epoch": epoch, "loss": float(np.mean(losses))})
    return head, params, history


def evaluate_lipro(model: CTCLIP, variables, head: LiProHead, head_params,
                   dataset, results_folder: str, num_workers: int = 8,
                   pathologies: Sequence[str] = PATHOLOGIES) -> Dict:
    """ct_lipro_inference.py:44-90: sigmoid probs -> npz + AUROC table."""
    from ..evals.metrics import evaluate_internal

    latents, labels, names = encode_dataset_latents(model, variables, dataset,
                                                    num_workers)
    logits = head.apply({"params": head_params}, jnp.asarray(latents),
                        deterministic=True)
    probs = np.asarray(jax.nn.sigmoid(logits))

    out = Path(results_folder)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "labels_weights.npz", data=labels)
    np.savez(out / "predicted_weights.npz", data=probs)
    (out / "accessions.txt").write_text("\n".join(names) + "\n")
    df = evaluate_internal(probs, labels, list(pathologies), str(out))
    df.to_csv(out / "aurocs.csv", index=False)
    return {"predicted": probs, "labels": labels, "accessions": names,
            "aurocs": df}
