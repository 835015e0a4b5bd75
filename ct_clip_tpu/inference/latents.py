"""Latent export (scripts/forward_data.py:114-151 equivalent): for each
volume, save the text latent and the pre-pooling encoded token grid
(`enc_image_send`, ct_clip.py:722,792) as npz under
results/{text_latents,image_latents}/<accession>.npz."""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ctclip import CTCLIP


def export_latents(model: CTCLIP, variables: Dict, tokenizer, dataset,
                   results_folder: str, num_workers: int = 8,
                   max_text_len: int = 512,
                   target_shape=None) -> Dict[str, np.ndarray]:
    from ..data.loader import VolumeLoader, preprocess_sample

    out_dir = Path(results_folder)
    (out_dir / "image_latents").mkdir(parents=True, exist_ok=True)
    (out_dir / "text_latents").mkdir(parents=True, exist_ok=True)

    encode_image = jax.jit(lambda v, video: model.apply(
        v, video, method=CTCLIP.encode_image, return_encodings=True))
    encode_text = jax.jit(lambda v, i, m: model.apply(
        v, i, m, method=CTCLIP.encode_text))

    texts, images = {}, {}
    loader = VolumeLoader(dataset, num_workers=num_workers, prefetch=4,
                          raw_dtype=np.int16, raw_layout="zyx")
    for sample in loader:
        vol = preprocess_sample(
            sample, dataset.clip_before_resample,
            **({} if target_shape is None
               else {"target_shape": tuple(target_shape)}))
        enc_grid = encode_image(variables, vol[None, ..., None])
        enc = tokenizer([sample.meta.text], padding="max_length",
                        truncation=True, max_length=max_text_len)
        tl = encode_text(variables, jnp.asarray(enc["input_ids"]),
                         jnp.asarray(enc["attention_mask"]))
        acc = sample.meta.accession
        image_arr = np.asarray(enc_grid[0], np.float32)
        text_arr = np.asarray(tl[0], np.float32)
        np.savez(out_dir / "image_latents" / f"{acc}.npz", arr=image_arr)
        np.savez(out_dir / "text_latents" / f"{acc}.npz", arr=text_arr)
        texts[acc], images[acc] = text_arr, image_arr
    return {"text": texts, "image": images}
