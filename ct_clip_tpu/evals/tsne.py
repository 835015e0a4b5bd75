"""t-SNE latent analysis (scripts/tsne_latents.py:44-129): sklearn TSNE
(perplexity 30) over saved latents, scatter colored by pathology-count
bucket."""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def tsne_plot(latents: np.ndarray, labels: np.ndarray,
              out_path: Optional[str] = None, perplexity: float = 30.0,
              seed: int = 0) -> np.ndarray:
    """Returns the (N, 2) embedding; writes a PNG when out_path is given."""
    from sklearn.manifold import TSNE

    perplexity = min(perplexity, max(2.0, (len(latents) - 1) / 3))
    emb = TSNE(n_components=2, perplexity=perplexity, random_state=seed,
               init="pca").fit_transform(latents)
    if out_path is not None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            counts = labels.sum(axis=1)
            buckets = np.clip(counts, 0, 4)  # 0,1,2,3,4+ pathology buckets
            fig, ax = plt.subplots(figsize=(6, 6))
            sc = ax.scatter(emb[:, 0], emb[:, 1], c=buckets, cmap="viridis",
                            s=8, alpha=0.8)
            fig.colorbar(sc, label="# pathologies (clipped at 4)")
            ax.set_title("CT-CLIP image latents (t-SNE)")
            Path(out_path).parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(out_path, dpi=120)
            plt.close(fig)
        except Exception:
            pass
    return emb
