"""Headline benchmark: zero-shot 18-pathology inference throughput.

Reference baseline: ~1.5 s/volume on a single GPU (=0.667 vol/s,
/root/reference/README.md:46; BASELINE.md).  Target: >=10 vol/s/chip.

Two figures:

1. `value` (headline, same metric as round 1): device-side cost per volume
   on one chip — CTViT image encode (480x480x240, bf16) + latent projection
   + 36-prompt scoring, prompt latents cached once (the TPU-native zero-shot
   design, ct_clip_tpu/inference/zero_shot.py).

2. `e2e_pipeline_vol_per_s`: the full production pipeline measured on real
   files — synthetic CT-RATE-shaped .nii.gz on disk -> VolumeLoader reader
   threads (gunzip + decode, int16 kept end-to-end) -> async host->HBM
   transfer -> fused device preprocess (HU rescale/resample/crop) -> batched
   encode + scoring.  On this box the host->device path is an ~85 MB/s
   tunnel, so e2e is transfer-bound (reported via `e2e_host_MBps`); on a
   real TPU VM host (PCIe, many cores) the same pipeline is device-bound.
   Skip with CTCLIP_BENCH_E2E=0; corpus is cached under /tmp across runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", e2e keys}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_VOL_PER_S = 1.0 / 1.5

# synthetic CT-RATE-shaped corpus: (Z, 512, 512) int16, stored = HU + 1024
E2E_VOLUMES = 8
E2E_Z = 300


def _make_corpus(root) -> None:
    """Write E2E_VOLUMES realistic .nii.gz + the three CSVs the dataset
    joins.  Content mimics a chest CT's compressibility: constant air
    background, a noisy soft-tissue cylinder (~45% body fraction) — gzip
    ratio and inflate cost land in the range of real CT-RATE files."""
    import csv
    import os

    from ct_clip_tpu.config import PATHOLOGIES
    from ct_clip_tpu.data.nifti import write_volume

    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    body = ((xx - 256) ** 2 / 230 ** 2 + (yy - 256) ** 2 / 180 ** 2) < 1.0
    base = np.full((E2E_Z, 512, 512), 24, np.int16)  # air: HU -1000
    tissue = (1050 + rng.randint(-60, 60, (E2E_Z, 512, 512))).astype(np.int16)
    base[:, body] = tissue[:, body]

    rows_r, rows_m, rows_l = [], [], []
    for i in range(E2E_VOLUMES):
        name = f"bench_{i}_a_1.nii.gz"
        vdir = os.path.join(root, "data", f"bench_{i}", f"bench_{i}_a")
        os.makedirs(vdir, exist_ok=True)
        vol = np.roll(base, rng.randint(0, E2E_Z), axis=0)
        write_volume(os.path.join(vdir, name), vol.transpose(1, 2, 0),
                     pixdim=(0.75, 0.75, 1.0))
        rows_r.append({"VolumeName": name, "Findings_EN": "Lungs are clear.",
                       "Impressions_EN": "Normal."})
        rows_m.append({"VolumeName": name, "XYSpacing": "[0.75, 0.75]",
                       "ZSpacing": "1.0", "RescaleSlope": "1",
                       "RescaleIntercept": "-1024"})
        rows_l.append({"VolumeName": name,
                       **{p: str(i % 2) for p in PATHOLOGIES}})
    for fname, rows in [("reports.csv", rows_r), ("metadata.csv", rows_m),
                        ("labels.csv", rows_l)]:
        with open(os.path.join(root, fname), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    Path(os.path.join(root, ".complete")).write_text(
        f"{E2E_VOLUMES} {E2E_Z}\n")


def bench_e2e(score_jit, variables, prompts, batch: int) -> dict:
    """Disk -> loader threads -> int16 h2d -> fused preprocess -> batched
    encode+score, steady state (second epoch; files page-cached, all
    compiles warm).  Mirrors the reference chain scripts/data.py:92-162 +
    zero_shot.py scoring, which the 1.5 s/vol baseline measures."""
    import os

    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.data import CTReportDatasetInfer
    from ct_clip_tpu.data.loader import VolumeLoader
    from ct_clip_tpu.ops.resample import preprocess_volume

    root = os.environ.get("CTCLIP_BENCH_CORPUS", "/tmp/ctclip_bench_corpus")
    marker = Path(root) / ".complete"
    if not (marker.exists()
            and marker.read_text().split() == [str(E2E_VOLUMES), str(E2E_Z)]):
        t0 = time.time()
        _make_corpus(root)
        print(f"[bench] corpus ({E2E_VOLUMES} vols) written in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)

    ds = CTReportDatasetInfer(os.path.join(root, "data"),
                              os.path.join(root, "reports.csv"),
                              os.path.join(root, "metadata.csv"),
                              os.path.join(root, "labels.csv"))
    assert len(ds) == E2E_VOLUMES, f"corpus mismatch: {len(ds)}"

    # decode-only throughput: loader threads, no device work.  zyx layout:
    # the gunzipped buffer is used as a zero-copy (Z, Y, X) view and the
    # in-plane transpose happens on device (saves a ~0.3 s host copy/vol).
    t0 = time.time()
    n_bytes = 0
    for s in VolumeLoader(ds, num_workers=2, prefetch=4,
                          raw_dtype=np.int16, raw_layout="zyx"):
        n_bytes += s.vol.nbytes
    t_decode = time.time() - t0
    decode_vps = E2E_VOLUMES / t_decode
    print(f"[bench] decode-only: {decode_vps:.2f} vol/s", file=sys.stderr)

    def run_epoch() -> float:
        loader = VolumeLoader(ds, num_workers=2, prefetch=4,
                              raw_dtype=np.int16, raw_layout="zyx")
        window, out = [], None
        t0 = time.time()
        for s in loader:
            dv = jax.device_put(s.vol)  # async int16 host->HBM
            pre = preprocess_volume(
                jnp.transpose(dv, (0, 2, 1)),  # (Z,Y,X) -> (Z,X,Y) on device
                jnp.asarray(s.spacing), jnp.float32(s.slope),
                jnp.float32(s.intercept),
                true_sizes=jnp.asarray(s.true_sizes[[0, 2, 1]]),
                clip_before_resample=True)
            window.append(pre)
            if len(window) == batch:
                video = jnp.stack(window)[..., None].astype(jnp.bfloat16)
                out = score_jit(variables, video, prompts)
                window = []
        np.asarray(out)  # host sync (block_until_ready unreliable via tunnel)
        return time.time() - t0

    t_warm = run_epoch()  # compiles the bucket-shape preprocess
    print(f"[bench] e2e warm epoch (incl preprocess compile): {t_warm:.1f}s",
          file=sys.stderr)
    t_run = min(run_epoch() for _ in range(2))
    e2e_vps = E2E_VOLUMES / t_run
    mbps = n_bytes / t_run / 1e6
    print(f"[bench] e2e: {E2E_VOLUMES} vols in {t_run:.1f}s = "
          f"{e2e_vps:.2f} vol/s ({mbps:.0f} MB/s host->device)",
          file=sys.stderr)
    return {
        "e2e_pipeline_vol_per_s": round(e2e_vps, 3),
        "e2e_vs_baseline": round(e2e_vps / BASELINE_VOL_PER_S, 2),
        "e2e_host_MBps": round(mbps, 1),
        "decode_vol_per_s": round(decode_vps, 2),
    }


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

    record = {
        "metric": "zero_shot_throughput",
        "value": round(vol_per_s, 2),
        "unit": "volumes/s/chip",
        "vs_baseline": round(vol_per_s / BASELINE_VOL_PER_S, 2),
    }
    if os.environ.get("CTCLIP_BENCH_E2E", "1") != "0":
        record.update(bench_e2e(score_jit, variables, prompts, batch))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
