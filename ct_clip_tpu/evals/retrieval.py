"""Retrieval evaluations.

Parity with scripts/volume_to_volume_new.py (cosine-similarity top-k
label-overlap ratio, :76-105) and scripts/report_to_volume_new.py
(dot-product recall@K vs a random baseline, :48-80), operating on saved
latent arrays.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def volume_to_volume(image_latents: np.ndarray, labels: np.ndarray,
                     topk: Sequence[int] = (1, 5, 10)) -> Dict[int, float]:
    """For each volume, retrieve top-k most cosine-similar other volumes and
    report the mean label-overlap ratio (volume_to_volume_new.py:76-105)."""
    z = _l2(image_latents)
    sim = z @ z.T
    np.fill_diagonal(sim, -np.inf)
    order = np.argsort(-sim, axis=1)
    out = {}
    label_norm = labels.sum(axis=1)
    for k in topk:
        ratios = []
        for i in range(len(z)):
            neighbors = order[i, :k]
            inter = (labels[neighbors] * labels[i]).sum(axis=1)
            union = np.maximum(label_norm[neighbors] + label_norm[i] - inter, 1)
            ratios.append(float(np.mean(inter / union)))
        out[k] = float(np.mean(ratios))
    return out


def report_to_volume(text_latents: np.ndarray, image_latents: np.ndarray,
                     topk: Sequence[int] = (5, 10, 50, 100),
                     seed: int = 0) -> Dict[int, Tuple[float, float]]:
    """Recall@K of each report's own volume by dot-product ranking, paired
    with the random-ranking baseline (report_to_volume_new.py:48-80).
    Returns {k: (recall, random_baseline)}."""
    sim = text_latents @ image_latents.T
    n = sim.shape[0]
    ranks = np.argsort(-sim, axis=1)
    hit_rank = np.array([int(np.where(ranks[i] == i)[0][0]) for i in range(n)])
    rng = np.random.RandomState(seed)
    random_rank = rng.permutation(n)
    out = {}
    for k in topk:
        recall = float(np.mean(hit_rank < k))
        baseline = float(np.mean(random_rank < k))
        out[k] = (recall, baseline)
    return out
