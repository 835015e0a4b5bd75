"""Zero-shot 18-pathology classification.

Protocol parity with scripts/zero_shot.py:106-171: for each pathology, score
the prompt pair ("{p} is present.", "{p} is not present.") against the
volume and softmax over the pair; P(present) = probs[0].

TPU-native redesign (the reference reruns the image tower 18x per volume and
re-encodes all prompts per volume, SURVEY.md §3.2):
  1. encode all 36 prompts ONCE -> (18, 2, dim_latent) cached latents;
  2. encode each volume ONCE, in batches of B volumes per jit step;
  3. logits = image_latents @ prompt_latents^T * temp — one (B, 512) x
     (512, 36) matmul; softmax over each pair.
Per-volume work drops from 18 tower passes to 1/B of a batched pass.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATHOLOGIES, CTCLIPConfig
from ..models.ctclip import CTCLIP


def pathology_prompts(pathologies: Sequence[str] = PATHOLOGIES) -> List[str]:
    """36 prompts, ordered [p0 present, p0 absent, p1 present, ...]
    (zero_shot.py:134)."""
    out = []
    for p in pathologies:
        out.append(f"{p} is present.")
        out.append(f"{p} is not present.")
    return out


class ZeroShotClassifier:
    """Caches prompt latents; scores batched volumes.

    model/variables: a CTCLIP flax module + its {'params','vq'} variables.
    tokenizer: HF-call-compatible (data.tokenizer.WordPieceTokenizer).
    """

    def __init__(self, model: CTCLIP, variables: Dict, tokenizer,
                 pathologies: Sequence[str] = PATHOLOGIES,
                 max_text_len: int = 512, mesh=None, data_axis: str = "data"):
        """Pass a `jax.sharding.Mesh` to shard the volume batch over its
        `data_axis` — zero-shot throughput then scales with chips (each chip
        encodes batch/n_chips volumes; prompt latents are replicated)."""
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.pathologies = list(pathologies)
        self.max_text_len = max_text_len
        self.mesh = mesh
        self._prompt_latents = None
        self._spatial_bias = None

        # the CPB score-bias table is a pure function of the CPB MLP params:
        # compute it once per weight load instead of inside every scored
        # step (models/ctvit.py compute_spatial_bias)
        self._bias_fn = None
        if model.image_encoder is None:
            self._bias_fn = jax.jit(lambda vars_: model.apply(
                vars_, method=lambda m: m.visual_transformer
                .compute_spatial_bias()))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(mesh, P(data_axis))
            repl = NamedSharding(mesh, P())

            def encode_image(vars_, video, bias):
                video = jax.lax.with_sharding_constraint(video, batch_sharding)
                return model.apply(vars_, video, spatial_bias=bias,
                                   method=CTCLIP.encode_image)

            self._encode_image = jax.jit(encode_image,
                                         out_shardings=(batch_sharding, None))
            self._encode_text = jax.jit(
                lambda vars_, ids, mask: model.apply(
                    vars_, ids, mask, method=CTCLIP.encode_text),
                out_shardings=repl)
        else:
            self._encode_image = jax.jit(
                lambda vars_, video, bias: model.apply(
                    vars_, video, spatial_bias=bias,
                    method=CTCLIP.encode_image))
            self._encode_text = jax.jit(
                lambda vars_, ids, mask: model.apply(vars_, ids, mask,
                                                     method=CTCLIP.encode_text))

    def update_variables(self, variables: Dict) -> None:
        """Swap in fresh weights (e.g. between in-training mini-evals)
        WITHOUT recompiling: the jitted closures take variables as an
        argument, so only the cached prompt latents need recomputing."""
        self.variables = variables
        self._prompt_latents = None
        self._spatial_bias = None

    def prompt_latents(self) -> jnp.ndarray:
        """(num_pathologies, 2, dim_latent), computed once."""
        if self._prompt_latents is None:
            enc = self.tokenizer(pathology_prompts(self.pathologies),
                                 padding="max_length", truncation=True,
                                 max_length=self.max_text_len)
            lat = self._encode_text(self.variables,
                                    jnp.asarray(enc["input_ids"]),
                                    jnp.asarray(enc["attention_mask"]))
            self._prompt_latents = lat.reshape(len(self.pathologies), 2, -1)
        return self._prompt_latents

    def spatial_bias(self):
        if self._bias_fn is not None and self._spatial_bias is None:
            self._spatial_bias = self._bias_fn(self.variables)
        return self._spatial_bias

    def score_batch(self, videos: jnp.ndarray) -> np.ndarray:
        """videos: (B, f, H, W, c) preprocessed volumes ->
        (B, num_pathologies) P(present)."""
        image_latents, _ = self._encode_image(self.variables, videos,
                                              self.spatial_bias())
        return np.asarray(self.scores_from_latents(image_latents))

    def scores_from_latents(self, image_latents: jnp.ndarray) -> jnp.ndarray:
        prompts = self.prompt_latents()  # (P, 2, d)
        temp = jnp.exp(self.variables["params"]["temperature"])
        logits = jnp.einsum("bd,pkd->bpk", image_latents, prompts) * temp
        probs = jax.nn.softmax(logits, axis=-1)
        return probs[..., 0]  # P(present) (zero_shot.py:140-143)


def run_zero_shot(model: CTCLIP, variables: Dict, tokenizer, dataset,
                  results_folder: str, batch_size: int = 4,
                  num_workers: int = 8,
                  pathologies: Sequence[str] = PATHOLOGIES,
                  save_artifacts: bool = True,
                  mesh=None,
                  patch_rows: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Full CTClipInference.infer equivalent: iterate the dataset, score all
    volumes, dump npz + accession list + AUROC table (zero_shot.py:149-165).

    `patch_rows` (default: auto — on for TPU backends): preprocess emits the
    model's native patch-major rows written straight into the batch buffer
    slot (preprocess_rows_into: one dispatch/volume, no stack copy), so
    each scored step skips the patchify shuffle and the batch is born in
    its final layout."""
    import jax.numpy as jnp

    from ..data.loader import (VolumeLoader, preprocess_sample,
                               preprocess_sample_rows_into)
    from ..evals.metrics import evaluate_internal

    if patch_rows is None:  # auto: rows need the CTViT tower's embed path
        patch_rows = (jax.default_backend() == "tpu"
                      and model.image_encoder is None)
    vcfg = model.config.ctvit

    clf = ZeroShotClassifier(model, variables, tokenizer, pathologies,
                             mesh=mesh)
    loader = VolumeLoader(dataset, num_workers=num_workers,
                          prefetch=2 * batch_size,
                          raw_dtype=np.int16, raw_layout="zyx")

    preds, labels, names = [], [], []
    if patch_rows:
        from ..utils import device_put_standard

        n_tok = ((vcfg.num_frames // vcfg.temporal_patch_size)
                 * (vcfg.image_size // vcfg.patch_size) ** 2)
        dtype = getattr(model, "dtype", None) or jnp.float32
        # double buffer: the next batch's first slot write donates its
        # buffer while the previous batch's score may still read the other
        bufs = [device_put_standard(
            np.zeros((batch_size, n_tok, vcfg.patch_dim), dtype=dtype))
            for _ in range(2)]
        target = (vcfg.num_frames, vcfg.image_size, vcfg.image_size)
        bi, slot, metas = 0, 0, []
        for sample in loader:
            bufs[bi] = preprocess_sample_rows_into(
                bufs[bi], slot, sample, dataset.clip_before_resample,
                temporal_patch_size=vcfg.temporal_patch_size,
                patch_size=vcfg.patch_size, target_shape=target)
            slot += 1
            metas.append(sample.meta)
            if slot == batch_size:
                _score_batch(clf, bufs[bi], metas, preds, labels, names)
                bi ^= 1
                slot, metas = 0, []
        if metas:
            # tail batch: the unwritten slots hold the previous batch's rows
            # (or zeros) at the fixed jit shape; keep only the real rows
            _score_batch(clf, bufs[bi], metas, preds, labels, names)
    else:
        target = ((vcfg.num_frames, vcfg.image_size, vcfg.image_size)
                  if model.image_encoder is None else None)
        buf = []
        for sample in loader:
            vol = preprocess_sample(sample, dataset.clip_before_resample,
                                    out_dtype=getattr(model, "dtype", None),
                                    **({"target_shape": target}
                                       if target else {}))
            buf.append((vol[..., None], sample.meta))
            if len(buf) == batch_size:
                _flush(clf, buf, preds, labels, names)
                buf = []
        if buf:
            # pad the final partial batch to the fixed jit shape (avoids a
            # fresh compile for the tail), then keep only the real rows
            _flush(clf, buf, preds, labels, names, pad_to=batch_size)

    predicted = np.concatenate(preds) if preds else np.zeros((0, len(pathologies)))
    real = np.stack(labels) if labels else np.zeros((0, len(pathologies)))

    out = {"predicted": predicted, "labels": real, "accessions": names}
    if save_artifacts:
        plotdir = Path(results_folder)
        plotdir.mkdir(parents=True, exist_ok=True)
        np.savez(plotdir / "labels_weights.npz", data=real)
        np.savez(plotdir / "predicted_weights.npz", data=predicted)
        (plotdir / "accessions.txt").write_text("\n".join(names) + "\n")
        df = evaluate_internal(predicted, real, list(pathologies), str(plotdir))
        _write_table(df, plotdir / "aurocs.xlsx")
    return out


def _score_batch(clf, videos, metas, preds, labels, names):
    """Score a pre-assembled batch buffer; keep only the first len(metas)
    rows (tail batches reuse the fixed-shape buffer)."""
    preds.append(clf.score_batch(videos)[:len(metas)])
    for meta in metas:
        labels.append(meta.labels if meta.labels is not None
                      else np.zeros(len(clf.pathologies), np.float32))
        names.append(meta.accession)


def _flush(clf, buf, preds, labels, names, pad_to: Optional[int] = None):
    from ..utils import stack_standard

    vols = [v for v, _ in buf]
    n = len(vols)
    if pad_to is not None and n < pad_to:
        vols += [jnp.zeros(vols[0].shape, vols[0].dtype)] * (pad_to - n)
    # standard-layout batch: born in the layout the encode kernels consume
    # (a plain jnp.stack picks the compact {1,2,0} layout on TPU and the
    # scored step pays a full relayout copy every batch)
    videos = stack_standard(vols)
    preds.append(clf.score_batch(videos)[:n])
    for _, meta in buf:
        labels.append(meta.labels if meta.labels is not None
                      else np.zeros(len(clf.pathologies), np.float32))
        names.append(meta.accession)


def _write_table(df, path: Path):
    from ..utils import write_table

    write_table(df, path)
