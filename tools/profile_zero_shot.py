"""Profile the production zero-shot score step and print a per-op cost table.

Captures a jax.profiler trace of N warm score_jit calls (the exact graph
bench.py times) and aggregates device-op durations from the xplane proto,
so the gap between the per-stage kernel sum and the end-to-end ms/volume is
attributable.  Usage:  python tools/profile_zero_shot.py [batch] [video|rows]
(rows = the production patch-row ingest format, bench.py's headline input).
"""
from __future__ import annotations

import glob
import gzip
import os
import sys
import time
from collections import defaultdict

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu import CTCLIPConfig
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fmt = sys.argv[2] if len(sys.argv) > 2 else "rows"
    cfg = CTCLIPConfig()
    model = CTCLIP(cfg, dtype=jnp.bfloat16)
    frames, size = cfg.ctvit.num_frames, cfg.ctvit.image_size
    rng = np.random.RandomState(0)

    ids = jnp.zeros((2, 512), jnp.int32)
    mask = jnp.ones((2, 512), jnp.int32)
    small = jnp.zeros((1, frames, size, size, 1), jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, ids, mask, small,
                                             return_loss=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    prompts = jnp.asarray(rng.rand(18, 2, cfg.dim_latent), jnp.bfloat16)
    temp = jnp.exp(variables["params"]["temperature"])

    # temp passed as an argument: a jit closure constant is embedded into
    # the MLIR module via a device->host fetch — minutes through the tunnel
    def score(variables, video, prompts, temp):
        latents, _ = model.apply(variables, video, method=CTCLIP.encode_image)
        logits = jnp.einsum("bd,pkd->bpk", latents, prompts) * temp
        return jax.nn.softmax(logits, axis=-1)[..., 0]

    score4 = jax.jit(score)
    score_jit = lambda v, vid, p: score4(v, vid, p, temp)
    if fmt == "rows":
        v = cfg.ctvit
        n_tokens = (frames // v.temporal_patch_size) \
            * (size // v.patch_size) ** 2
        video = jnp.asarray(rng.rand(batch, n_tokens, v.patch_dim) * 2 - 1,
                            jnp.bfloat16)
    else:
        video = jnp.asarray(rng.rand(batch, frames, size, size, 1) * 2 - 1,
                            jnp.bfloat16)

    t0 = time.time()
    np.asarray(score_jit(variables, video, prompts))
    print(f"compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = score_jit(variables, video, prompts)
    np.asarray(out)
    wall = time.time() - t0
    print(f"wall: {wall / iters * 1e3:.1f} ms/step  "
          f"{batch * iters / wall:.1f} vol/s", file=sys.stderr)

    tracedir = "/tmp/zs_trace"
    os.system(f"rm -rf {tracedir}")
    jax.profiler.start_trace(tracedir)
    for _ in range(iters):
        out = score_jit(variables, video, prompts)
    np.asarray(out)
    jax.profiler.stop_trace()

    report(tracedir, iters, batch)


def report(tracedir: str, iters: int, batch: int) -> None:
    """Aggregate device-op durations from the xplane proto (TPU plane)."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # moved in tf>=2.21
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        names = dict(plane.event_metadata)
        totals = defaultdict(float)
        total_ps = 0.0
        for line in plane.lines:
            if line.name == "XLA Modules":
                mod_ps = sum(ev.duration_ps for ev in line.events)
                print(f"  [modules line: {mod_ps / 1e9 / iters:.2f} ms/step "
                      f"incl. inter-op gaps]")
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and "XLA Modules" not in line.name:
                # op-level lines vary by version; accept op lines only
                pass
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = names[ev.metadata_id].name
                totals[name] += ev.duration_ps
                total_ps += ev.duration_ps
        if not totals:
            continue
        print(f"\n== plane: {plane.name}  "
              f"(device total {total_ps / 1e9 / iters:.2f} ms/step, "
              f"{total_ps / 1e9 / iters / batch:.2f} ms/vol)")
        # group by fusion-root prefix for readability
        grouped = defaultdict(float)
        for k, v in totals.items():
            grouped[k.split(".")[0]] += v
        for k, v in sorted(grouped.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {v / 1e9 / iters:8.3f} ms/step  {k}")
        if os.environ.get("PROFILE_TOP_OPS"):
            print("  -- top individual ops --")
            for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:80]:
                print(f"  {v / 1e9 / iters:8.3f} ms/step  {k[:160]}")


if __name__ == "__main__":
    main()
