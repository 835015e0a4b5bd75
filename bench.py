"""Headline benchmark: zero-shot 18-pathology inference throughput.

Reference baseline: ~1.5 s/volume on a single GPU (=0.667 vol/s,
/root/reference/README.md:46; BASELINE.md).  Target: >=10 vol/s/chip.

Measures the production-shape pipeline cost per volume on one chip:
CTViT image encode (480x480x240 volume, bf16) + latent projection +
36-prompt scoring, with prompt latents cached once (the TPU-native zero-shot
design, ct_clip_tpu/inference/zero_shot.py).  Text encoding is a one-time
cost amortized over the dataset and is excluded from the steady-state
per-volume figure (it is reported in stderr for visibility).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_VOL_PER_S = 1.0 / 1.5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from ct_clip_tpu import CTCLIPConfig
    from ct_clip_tpu.models import CTCLIP

    cfg = CTCLIPConfig()
    model = CTCLIP(cfg, dtype=jnp.bfloat16)

    batch = 8
    frames, size = cfg.ctvit.num_frames, cfg.ctvit.image_size
    rng = np.random.RandomState(0)

    print(f"[bench] init production CTCLIP on {jax.devices()[0]}", file=sys.stderr)
    ids = jnp.zeros((2, 512), jnp.int32)
    mask = jnp.ones((2, 512), jnp.int32)
    small_video = jnp.zeros((1, frames, size, size, 1), jnp.bfloat16)
    t0 = time.time()
    init = jax.jit(lambda rng: model.init(rng, ids, mask, small_video,
                                          return_loss=False))
    variables = init(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"[bench] init done in {time.time() - t0:.1f}s", file=sys.stderr)

    # one-time prompt latent cache (36 prompts)
    prompt_ids = jnp.asarray(rng.randint(0, cfg.bert.vocab_size, (36, 512)),
                             jnp.int32)
    prompt_mask = jnp.ones((36, 512), jnp.int32)
    encode_text = jax.jit(lambda v, i, m: model.apply(v, i, m,
                                                      method=CTCLIP.encode_text))
    t0 = time.time()
    prompts = encode_text(variables, prompt_ids, prompt_mask)
    jax.block_until_ready(prompts)
    t_text = time.time() - t0
    print(f"[bench] 36-prompt encode (one-time): {t_text:.2f}s", file=sys.stderr)
    prompts = prompts.reshape(18, 2, -1)

    temp = jnp.exp(variables["params"]["temperature"])

    def score(variables, video, prompts):
        latents, _ = model.apply(variables, video, method=CTCLIP.encode_image)
        logits = jnp.einsum("bd,pkd->bpk", latents, prompts) * temp
        return jax.nn.softmax(logits, axis=-1)[..., 0]

    score_jit = jax.jit(score)

    video = jnp.asarray(
        rng.rand(batch, frames, size, size, 1).astype(np.float32) * 2 - 1,
        jnp.bfloat16)

    # warmup / compile.  Sync via a host copy: through remote-tunnel
    # backends block_until_ready can return before execution finishes,
    # which would inflate the figure.
    t0 = time.time()
    out = score_jit(variables, video, prompts)
    np.asarray(out)
    print(f"[bench] compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 5
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = score_jit(variables, video, prompts)
        np.asarray(out)
        dt_round = time.time() - t0
        best = dt_round if best is None else min(best, dt_round)
    dt = best

    vol_per_s = batch * iters / dt
    print(f"[bench] {batch * iters} volumes in {dt:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "zero_shot_throughput",
        "value": round(vol_per_s, 2),
        "unit": "volumes/s/chip",
        "vs_baseline": round(vol_per_s / BASELINE_VOL_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
