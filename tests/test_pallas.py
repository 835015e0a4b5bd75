"""Pallas kernel tests (run via interpret-capable CPU fallback paths +
numerical equivalence of the two implementations)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_tpu.ops.pallas.patchify import (_gather_rearrange,
                                             _gather_unrearrange,
                                             rearrange_patches)


def _ref_rearrange(video, pt, p):
    b, F, H, W = video.shape
    t, h, w = F // pt, H // p, W // p
    x = video.reshape(b, t, pt, h, p, w, p)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    return x.reshape(b, t * h * w, pt * p * p)


@pytest.mark.parametrize("shape,pt,p", [
    ((2, 8, 12, 12), 4, 6),
    ((1, 20, 40, 40), 10, 20),
])
def test_gather_rearrange_matches_reference(shape, pt, p):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(*shape).astype(np.float32))
    out = _gather_rearrange(video, pt, p)
    ref = _ref_rearrange(np.asarray(video), pt, p)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_unrearrange_is_inverse():
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.randn(2, 8, 12, 12).astype(np.float32))
    patches = _gather_rearrange(video, 4, 6)
    back = _gather_unrearrange(patches, 4, 6, 8, 12, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(video))


def test_rearrange_custom_vjp_gradient():
    """Gradient of sum(patches * w) must scatter w back to voxel order."""
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.randn(1, 4, 6, 6).astype(np.float32))
    wt = jnp.asarray(rng.randn(1, 2 * 2 * 2, 2 * 3 * 3).astype(np.float32))

    def f(v):
        return jnp.sum(rearrange_patches(v, 2, 3) * wt)

    g = jax.grad(f)(video)
    expect = _gather_unrearrange(wt, 2, 3, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), atol=1e-6)


def test_pallas_kernel_on_tpu_if_available():
    """When a TPU is present, the Pallas path must equal the gather path."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.patchify import _pallas_rearrange

    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.randn(1, 20, 40, 40).astype(np.float32))
    out = _pallas_rearrange(video, 10, 20)
    ref = _gather_rearrange(video, 10, 20)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
