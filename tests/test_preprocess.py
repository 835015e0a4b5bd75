"""Golden tests: fused device preprocessing vs the reference's torch pipeline
semantics (re-implemented here independently from SURVEY.md §2.3 / the
documented ordering, using torch CPU as the oracle for F.interpolate)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from ct_clip_tpu.ops import preprocess_batch, preprocess_volume


def torch_reference_pipeline(vol_xyz, z_spacing, xy_spacing, slope, intercept,
                             clip_before=False):
    """Reference semantics (scripts/data.py:92-162 / data_inference_nii.py:96-165):
    rescale -> [clip] -> transpose (2,0,1) -> trilinear resample to target
    spacing -> [clip] -> /1000 -> transpose back -> center crop/pad (480,480,240)
    pad -1 -> permute (2,0,1)."""
    img = slope * vol_xyz.astype(np.float64) + intercept
    if clip_before:
        img = np.clip(img, -1000, 1000)
    img = img.transpose(2, 0, 1)  # (Z, X, Y)
    t = torch.tensor(img)[None, None]
    current = (z_spacing, xy_spacing, xy_spacing)
    target = (1.5, 0.75, 0.75)
    new_shape = [int(t.shape[2 + i] * current[i] / target[i]) for i in range(3)]
    t = TF.interpolate(t, size=new_shape, mode="trilinear", align_corners=False)
    img = t[0, 0].numpy().transpose(1, 2, 0)  # (X', Y', Z')
    if not clip_before:
        img = np.clip(img, -1000, 1000)
    img = (img / 1000).astype(np.float32)

    t = torch.tensor(img)
    h, w, d = t.shape
    dh, dw, dd = 480, 480, 240
    hs, ws, ds = max((h - dh) // 2, 0), max((w - dw) // 2, 0), max((d - dd) // 2, 0)
    t = t[hs:min(hs + dh, h), ws:min(ws + dw, w), ds:min(ds + dd, d)]
    ph = (dh - t.shape[0]) // 2
    pw = (dw - t.shape[1]) // 2
    pd = (dd - t.shape[2]) // 2
    t = TF.pad(t, (pd, dd - t.shape[2] - pd, pw, dw - t.shape[1] - pw,
                   ph, dh - t.shape[0] - ph), value=-1)
    return t.permute(2, 0, 1).numpy()  # (240, 480, 480)


@pytest.mark.parametrize("shape,z_sp,xy_sp,clip_before", [
    ((50, 64, 40), 3.0, 1.4, False),   # upsample z, downsample-ish xy
    ((50, 64, 40), 3.0, 1.4, True),    # infer ordering
    ((30, 32, 36), 1.0, 0.5, False),   # downsample both
    ((40, 48, 44), 1.5, 0.75, False),  # identity spacing
])
def test_fused_preprocess_matches_torch(shape, z_sp, xy_sp, clip_before):
    rng = np.random.RandomState(7)
    # raw values roughly CT-like after rescale
    vol_xyz = rng.randint(-100, 3000, size=shape).astype(np.float32)
    slope, intercept = 1.0, -1024.0

    ref = torch_reference_pipeline(vol_xyz, z_sp, xy_sp, slope, intercept,
                                   clip_before)

    vol_zxy = vol_xyz.transpose(2, 0, 1)
    out = preprocess_volume(
        jnp.asarray(vol_zxy), jnp.asarray([z_sp, xy_sp, xy_sp], jnp.float32),
        jnp.float32(slope), jnp.float32(intercept),
        clip_before_resample=clip_before)
    out = np.asarray(out)
    assert out.shape == (240, 480, 480)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_preprocess_batch_vmaps_per_volume_metadata():
    rng = np.random.RandomState(8)
    vols = rng.randint(0, 2000, size=(2, 20, 24, 16)).astype(np.float32)
    spacings = np.array([[3.0, 1.0, 1.0], [2.0, 1.5, 1.5]], np.float32)
    slopes = np.array([1.0, 2.0], np.float32)
    intercepts = np.array([-1024.0, 0.0], np.float32)
    out = preprocess_batch(jnp.asarray(vols), jnp.asarray(spacings),
                           jnp.asarray(slopes), jnp.asarray(intercepts))
    assert out.shape == (2, 240, 480, 480)
    for i in range(2):
        ref = torch_reference_pipeline(vols[i].transpose(1, 2, 0),
                                       spacings[i][0], spacings[i][1],
                                       slopes[i], intercepts[i])
        np.testing.assert_allclose(np.asarray(out[i]), ref, atol=2e-5)


def test_shape_bucketing_with_true_sizes():
    """Padding the raw volume to a bucket shape + passing true_sizes must give
    the identical result as the exact-shape call (no recompiles per shape)."""
    rng = np.random.RandomState(9)
    vol = rng.randint(0, 2000, size=(37, 41, 29)).astype(np.float32)
    sp = jnp.asarray([2.0, 1.0, 1.0], jnp.float32)
    exact = preprocess_volume(jnp.asarray(vol), sp, jnp.float32(1.0),
                              jnp.float32(-1024.0))
    padded = np.zeros((48, 48, 32), np.float32)
    padded[:37, :41, :29] = vol
    bucketed = preprocess_volume(jnp.asarray(padded), sp, jnp.float32(1.0),
                                 jnp.float32(-1024.0),
                                 true_sizes=jnp.asarray([37, 41, 29], jnp.int32))
    np.testing.assert_allclose(np.asarray(bucketed), np.asarray(exact), atol=1e-6)


def test_pad_regions_are_minus_one():
    vol = np.full((10, 12, 8), 500.0, np.float32)
    out = np.asarray(preprocess_volume(
        jnp.asarray(vol), jnp.asarray([1.5, 0.75, 0.75], jnp.float32),
        jnp.float32(1.0), jnp.float32(0.0)))
    # tiny volume -> mostly padding
    assert (out == -1.0).mean() > 0.9
    center = out[120, 240, 240]
    assert abs(center - 0.5) < 1e-5


def test_matmul_method_matches_gather():
    """The MXU-form resample (per-axis (out, in) matrices) must agree with
    the take-form to f32 rounding, including bucketed zero-pad tails."""
    rng = np.random.RandomState(3)
    vol = rng.randint(-100, 3000, size=(64, 48, 56)).astype(np.float32)
    vol[50:] = 0.0  # bucket tail past true_sizes
    true = jnp.asarray([50, 48, 56], jnp.int32)
    args = (jnp.asarray(vol), jnp.asarray([2.0, 1.2, 1.2], jnp.float32),
            jnp.float32(1.0), jnp.float32(-1024.0))
    for clip_before in (False, True):
        g = preprocess_volume(*args, true_sizes=true,
                              clip_before_resample=clip_before,
                              method="gather")
        m = preprocess_volume(*args, true_sizes=true,
                              clip_before_resample=clip_before,
                              method="matmul")
        np.testing.assert_allclose(np.asarray(m), np.asarray(g), atol=2e-5)
        # zyx input layout: relayout folded into the x-axis contraction
        vol_zyx = jnp.transpose(args[0], (0, 2, 1))
        for meth in ("gather", "matmul"):
            z = preprocess_volume(vol_zyx, *args[1:], true_sizes=true,
                                  clip_before_resample=clip_before,
                                  method=meth, input_layout="zyx")
            np.testing.assert_allclose(np.asarray(z), np.asarray(g),
                                       atol=2e-5)


def test_patch_row_ingest_repeated_epochs():
    """Regression for the round-4 driver-bench crash: repeated epochs over
    the patch-row ingest chain (per-volume preprocess_to_patch_rows dispatch
    -> stack_standard batch -> jitted scored step, one sync per epoch) must
    produce identical results every epoch and must not grow the jitted-stack
    cache after warmup (the old fresh-jax.jit-per-call stack retraced every
    batch and its throwaway executables could be collected mid-flight,
    surfacing an async INVALID_ARGUMENT at the epoch sync).  Runs on every
    backend; on-chip runs exercise the forced-layout TPU path."""
    import jax
    import jax.numpy as jnp

    from ct_clip_tpu.ops.resample import preprocess_to_patch_rows
    from ct_clip_tpu.utils import _stack_standard_jit, stack_standard

    rng = np.random.RandomState(9)
    vols = [jnp.asarray(rng.randint(0, 2048, (60, 128, 128))
                        .astype(np.int16)) for _ in range(4)]
    spacing = jnp.asarray([3.0, 2.0, 2.0], jnp.float32)
    kw = dict(clip_before_resample=True, target_shape=(40, 80, 80),
              temporal_patch_size=10, patch_size=20, input_layout="zyx",
              out_dtype=jnp.bfloat16)

    score = jax.jit(lambda b: jnp.sum(b.astype(jnp.float32), axis=(1, 2)))

    def epoch():
        window = [preprocess_to_patch_rows(v, spacing, jnp.float32(1.0),
                                           jnp.float32(-1024.0), **kw)
                  for v in vols]
        rows = stack_standard(window)
        out = score(rows)
        return np.asarray(out)  # the epoch sync the r4 bench crashed in

    first = epoch()
    cache_after_warm = _stack_standard_jit.cache_info().currsize
    for _ in range(3):
        np.testing.assert_array_equal(epoch(), first)
    assert np.isfinite(first).all()
    assert _stack_standard_jit.cache_info().currsize == cache_after_warm


def test_preprocess_rows_into_matches_per_volume():
    """preprocess_rows_into (fused batch-slot ingest, donated buffer) fills
    each slot with exactly preprocess_to_patch_rows' output and leaves the
    other slots untouched."""
    import jax.numpy as jnp

    from ct_clip_tpu.ops.resample import (preprocess_rows_into,
                                          preprocess_to_patch_rows)

    rng = np.random.RandomState(6)
    kw = dict(clip_before_resample=True, target_shape=(40, 80, 80),
              temporal_patch_size=10, patch_size=20, input_layout="zyx")
    spacing = jnp.asarray([3.0, 2.0, 2.0], jnp.float32)
    vols = [jnp.asarray(rng.randint(0, 2048, (60, 128, 128))
                        .astype(np.int16)) for _ in range(3)]
    want = [preprocess_to_patch_rows(v, spacing, jnp.float32(1.0),
                                     jnp.float32(-1024.0),
                                     out_dtype=jnp.bfloat16, **kw)
            for v in vols]
    buf = jnp.zeros((3, want[0].shape[0], want[0].shape[1]), jnp.bfloat16)
    for i, v in enumerate(vols):
        buf = preprocess_rows_into(buf, i, v, spacing, jnp.float32(1.0),
                                   jnp.float32(-1024.0), **kw)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(buf[i], np.float32),
                                      np.asarray(want[i], np.float32))


def test_preprocess_to_patch_rows_matches_volume_path():
    """preprocess_to_patch_rows == preprocess_volume -> patchify: the
    shuffle moves values untouched (ingest-format equivalence)."""
    import jax.numpy as jnp

    from ct_clip_tpu.ops.pallas.patchify import rearrange_patches
    from ct_clip_tpu.ops.resample import (preprocess_to_patch_rows,
                                          preprocess_volume)

    rng = np.random.RandomState(5)
    vol = jnp.asarray(rng.randint(0, 2048, (60, 128, 128)).astype(np.float32))
    spacing = jnp.asarray([3.0, 2.0, 2.0], jnp.float32)
    kw = dict(clip_before_resample=True, target_shape=(40, 80, 80),
              input_layout="zyx")
    want_vol = preprocess_volume(vol, spacing, jnp.float32(1.0),
                                 jnp.float32(-1024.0), **kw)
    want = rearrange_patches(want_vol[None], 10, 20)[0]
    got = preprocess_to_patch_rows(vol, spacing, jnp.float32(1.0),
                                   jnp.float32(-1024.0),
                                   temporal_patch_size=10, patch_size=20,
                                   out_dtype=None, **kw)
    assert got.shape == (4 * 4 * 4, 10 * 20 * 20)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
