"""MaskGITTransformer-equivalent orchestration: frozen CTViT + MaskGit
(+ optional TokenCritic) + text conditioning, with text-to-video sampling,
priming, and scene-chained `make_video`
(transformer_maskgit/MaskGITTransformer.py:336-721).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CTViTConfig
from .ctvit import CTViT
from .maskgit import MaskGit, TokenCritic, sample_tokens


@dataclass
class MaskGITPipeline:
    ctvit: CTViT
    ctvit_variables: Dict
    maskgit: MaskGit
    maskgit_variables: Dict
    critic: Optional[TokenCritic] = None
    critic_variables: Optional[Dict] = None
    # texts -> (b, n, d) embeddings with zeroed pad rows (models/t5.py)
    text_embed_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None
    steps: int = 18
    cond_scale: float = 3.0
    starting_temperature: float = 0.9

    def _grid_for_frames(self, num_frames: int) -> Tuple[int, int, int]:
        cfg: CTViTConfig = self.ctvit.config
        t = num_frames // cfg.temporal_patch_size
        return (t, cfg.patch_hw, cfg.patch_hw)

    def encode_ids(self, video: jnp.ndarray) -> jnp.ndarray:
        return self.ctvit.apply(self.ctvit_variables, video,
                                return_only_codebook_ids=True)

    def sample(self, *, num_frames: int, texts: Optional[Sequence[str]] = None,
               prime_frames: Optional[jnp.ndarray] = None, batch_size: int = 1,
               cond_scale: Optional[float] = None, rng=None) -> jnp.ndarray:
        """MaskGITTransformer.sample (:415-557): returns (b, f, H, W, c)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        context = None
        if texts is not None:
            assert self.text_embed_fn is not None, "need a text_embed_fn"
            context = jnp.asarray(self.text_embed_fn(list(texts)))
            batch_size = len(texts)

        prime_ids = None
        prime_num_frames = 0
        if prime_frames is not None:
            prime_ids = self.encode_ids(prime_frames)
            prime_ids = prime_ids.reshape(prime_ids.shape[0], -1)
            prime_num_frames = prime_frames.shape[1]

        grid = self._grid_for_frames(num_frames + prime_num_frames)
        ids = sample_tokens(
            self.maskgit, self.maskgit_variables, rng, grid,
            batch_size=batch_size, context=context, steps=self.steps,
            cond_scale=cond_scale if cond_scale is not None else self.cond_scale,
            starting_temperature=self.starting_temperature,
            critic=self.critic, critic_vars=self.critic_variables,
            prime_token_ids=prime_ids)
        if prime_ids is not None:
            ids = jnp.concatenate([prime_ids, ids], axis=-1)
        video = self.ctvit.decode_from_codebook_indices(
            self.ctvit_variables, ids, grid)
        if prime_num_frames:
            video = video[:, prime_num_frames:]
        return video

    def make_video(self, texts: List[str], num_frames,
                   prime_lengths) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Scene chaining (MaskGITTransformer.py:698-721): each scene is
        primed with the tail frames of the previous one."""
        num_scenes = len(texts)
        if not isinstance(num_frames, (tuple, list)):
            num_frames = (num_frames,) * num_scenes
        if not isinstance(prime_lengths, (tuple, list)):
            prime_lengths = (prime_lengths,) * (num_scenes - 1)
        prime_lengths = (*prime_lengths, 0)

        scenes: List[jnp.ndarray] = []
        video_prime = None
        for i, (text, scene_frames, next_prime) in enumerate(
                zip(texts, num_frames, prime_lengths)):
            video = self.sample(texts=[text], prime_frames=video_prime,
                                num_frames=scene_frames,
                                rng=jax.random.PRNGKey(i))
            scenes.append(video)
            if next_prime:
                video_prime = video[:, -next_prime:]
        return jnp.concatenate(scenes, axis=1), scenes
