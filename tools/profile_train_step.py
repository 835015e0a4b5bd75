"""Profile the production-shape CTCLIP train step and print a per-op cost
table (same xplane aggregation as profile_zero_shot.py).

Usage: python tools/profile_train_step.py [batch] [video|rows] [remat|noremat]
(rows = the production trainer's patch-row ingest format, default;
third arg "noremat" disables per-block rematerialization — the fused
sublayer kernels' custom VJPs already recompute flash-style internally,
so remat pays the forward twice more).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu import CTCLIPConfig, TrainConfig
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.train.optimizer import get_optimizer
    from ct_clip_tpu.train.train_step import (create_train_state,
                                              make_train_step)
    from ct_clip_tpu.utils import enable_compilation_cache
    from profile_zero_shot import report

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fmt = sys.argv[2] if len(sys.argv) > 2 else "rows"
    remat = (sys.argv[3] if len(sys.argv) > 3 else "remat") != "noremat"
    cfg = CTCLIPConfig()
    tcfg = TrainConfig(batch_size=batch, remat=remat,
                       compute_dtype="bfloat16")
    mcfg = cfg.replace(ctvit=cfg.ctvit.replace(remat=remat),
                      bert=cfg.bert.replace(remat=remat),
                      gather_negatives=False)
    model = CTCLIP(mcfg, dtype=jnp.bfloat16)
    frames, size = cfg.ctvit.num_frames, cfg.ctvit.image_size
    rng = np.random.RandomState(1)
    batch_data = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.bert.vocab_size, (batch, 512)), jnp.int32),
        "attention_mask": jnp.ones((batch, 512), jnp.int32),
        "video": jnp.asarray(rng.rand(batch, frames, size, size, 1) * 2 - 1,
                             jnp.bfloat16),
    }
    if fmt == "rows":
        v = cfg.ctvit
        n_tokens = (frames // v.temporal_patch_size) \
            * (size // v.patch_size) ** 2
        batch_data["video"] = jnp.asarray(
            rng.rand(batch, n_tokens, v.patch_dim) * 2 - 1, jnp.bfloat16)
    tx = get_optimizer(lr=tcfg.lr, wd=tcfg.wd,
                       max_grad_norm=tcfg.max_grad_norm)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0), batch_data, tx)
    step_fn = jax.jit(make_train_step(model, tx, tcfg), donate_argnums=(0,))
    state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(1))
    np.asarray(jnp.ravel(metrics["loss"]))
    print(f"compile+first {time.time() - t0:.0f}s", file=sys.stderr)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(2))
    np.asarray(jnp.ravel(metrics["loss"]))
    wall = (time.time() - t0) / iters
    print(f"wall: {wall * 1e3:.0f} ms/step", file=sys.stderr)

    tracedir = "/tmp/train_trace"
    os.system(f"rm -rf {tracedir}")
    jax.profiler.start_trace(tracedir)
    for _ in range(iters):
        state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(2))
    np.asarray(jnp.ravel(metrics["loss"]))
    jax.profiler.stop_trace()
    report(tracedir, iters, batch)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
