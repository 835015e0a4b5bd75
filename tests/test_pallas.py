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
    # kernel-legal geometry (h=w=8, p=8: every tiling constraint satisfied)
    video = jnp.asarray(rng.randn(1, 4, 64, 64).astype(np.float32))
    out = _pallas_rearrange(video, 2, 8)
    ref = _gather_rearrange(video, 2, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # tiling-infeasible geometry (h=w=2, p=20) must fall back to the gather
    # path instead of crashing (regression: first on-chip suite run)
    video = jnp.asarray(rng.randn(1, 20, 40, 40).astype(np.float32))
    out = _pallas_rearrange(video, 10, 20)
    ref = _gather_rearrange(video, 10, 20)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# ---------------------------------------------------------------------------
# fused attention kernel (ops/pallas/attention.py)
# ---------------------------------------------------------------------------

def _attn_inputs(b=4, h=2, n=256, d=32, bias_shape=None, seed=5):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    bias = (jnp.asarray(rng.randn(*bias_shape).astype(np.float32))
            if bias_shape else None)
    return mk(), mk(), mk(), bias


def _mxu_atol(tight: float, loose: float) -> float:
    """CPU: the fused path IS the XLA reference -> exact-ish.  TPU: the
    Pallas kernel's MXU passes differ from the highest-precision XLA twin
    the conftest configures -> bf16-scale tolerance."""
    return loose if jax.devices()[0].platform == "tpu" else tight


def test_fused_attention_matches_xla_reference():
    from ct_clip_tpu.ops.pallas.attention import _xla_attention, fused_attention

    for bias_shape in (None, (1, 2, 256, 256), (1, 1, 256, 256)):
        q, k, v, bias = _attn_inputs(bias_shape=bias_shape)
        got = fused_attention(q, k, v, bias)
        ref = _xla_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=_mxu_atol(2e-5, 6e-2))


def test_fused_attention_grad_matches_xla():
    from ct_clip_tpu.ops.pallas.attention import _xla_attention, fused_attention

    q, k, v, bias = _attn_inputs(bias_shape=(1, 2, 256, 256))

    def loss_fused(q_, k_, v_, b_):
        return jnp.sum(fused_attention(q_, k_, v_, b_) ** 2)

    def loss_ref(q_, k_, v_, b_):
        return jnp.sum(_xla_attention(q_, k_, v_, b_) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b32).max(), 1.0)
        assert np.abs(a32 - b32).max() / denom < _mxu_atol(2e-4, 2e-2)


def test_fused_attention_plan_gating():
    """Shapes the kernel can't serve must route to XLA (plan None)."""
    from ct_clip_tpu.ops.pallas.attention import _plan

    assert _plan((4, 2, 24, 32), 2, None) is None          # n too small
    assert _plan((4, 2, 256, 32), 2, (4, 2, 256, 256)) is None  # per-batch bias
    assert _plan((4, 2, 250, 32), 2, None) is None          # n % 8
    assert _plan((4, 2, 256, 32), 2, (1, 2, 128, 256)) is None  # non-square


def test_fused_attention_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.attention import (_pallas_attention, _plan,
                                                  _xla_attention)

    b, h, n, d = 8, 8, 576, 32
    rng = np.random.RandomState(7)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) \
        .astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.randn(1, h, n, n).astype(np.float32))
    g = _plan(q.shape, 2, bias.shape)
    assert g is not None
    got = _pallas_attention(q, k, v, bias, g).astype(jnp.float32)
    ref = _xla_attention(q, k, v, bias).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


# ---------------------------------------------------------------------------
def _embed_args(shape=(2, 8, 12, 12), pt=4, p=6, dim=32, seed=5):
    rng = np.random.RandomState(seed)
    b, F, H, W = shape
    pd = pt * p * p
    video = jnp.asarray(rng.randn(*shape).astype(np.float32))
    s1 = jnp.asarray(rng.rand(pd).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(pd).astype(np.float32) * 0.01)
    wi = jnp.asarray((rng.randn(pd, dim) / np.sqrt(pd)).astype(np.float32))
    pb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    s2 = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    return video, s1, b1, wi, pb, s2, b2


def test_fused_patch_embed_matches_module_math():
    """fused_patch_embed == rearrange -> LN -> @wi + b -> LN composition."""
    from ct_clip_tpu.ops.norms import layer_norm
    from ct_clip_tpu.ops.pallas.patchify import (_gather_rearrange,
                                                 fused_patch_embed)

    args = _embed_args()
    video, s1, b1, wi, pb, s2, b2 = args
    got = fused_patch_embed(video, s1, b1, wi, pb, s2, b2, 4, 6, 1e-5,
                            jnp.float32)
    patches = _gather_rearrange(video, 4, 6)
    ref = layer_norm(layer_norm(patches, s1, b1) @ wi + pb, s2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(fused_patch_embed(
        *a, 4, 6, 1e-5, jnp.float32) ** 2), argnums=(0, 3))(*args)
    g2 = jax.grad(lambda v, w: jnp.sum(layer_norm(
        layer_norm(_gather_rearrange(v, 4, 6), s1, b1) @ w + pb,
        s2, b2) ** 2))(video, wi)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2), atol=1e-4)


def test_fused_patch_embed_kernels_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.patchify import (_pallas_patch_embed,
                                                 _pallas_patch_embed_bwd,
                                                 _xla_patch_embed)

    args = _embed_args(shape=(1, 20, 480, 480), pt=10, p=20, dim=128, seed=6)
    video, s1, b1, wi, pb, s2, b2 = args
    got = _pallas_patch_embed(video, s1, b1, wi, pb, s2, b2, 10, 20, 1e-5,
                              jnp.bfloat16).astype(jnp.float32)
    ref = _xla_patch_embed(video, s1, b1, wi, pb, s2, b2, 10, 20, 1e-5,
                           jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2)

    do = jnp.asarray(np.random.RandomState(7).randn(1, 2 * 24 * 24, 128)
                     .astype(np.float32)).astype(jnp.bfloat16)
    got_g = _pallas_patch_embed_bwd(video, s1, b1, wi, pb, s2, b2, do,
                                    10, 20, 1e-5, jnp.bfloat16)
    _, vjp = jax.vjp(lambda *a: _xla_patch_embed(*a, 10, 20, 1e-5,
                                                 jnp.bfloat16),
                     video, s1, b1, wi, pb, s2, b2)
    ref_g = vjp(do)[1:]  # skip dvideo
    for a, b_ in zip(got_g, ref_g):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = max(np.abs(b32).max(), 1.0)
        assert np.max(np.abs(a32 - b32)) / denom < 2e-2


def test_vq_kernels_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.norms import l2norm
    from ct_clip_tpu.ops.pallas.vq import (_plan, pallas_assign,
                                           pallas_cluster_stats)
    from ct_clip_tpu.ops.vq import (_chunked_argmax_sim,
                                    _chunked_cluster_stats)

    rng = np.random.RandomState(23)
    n, dim, k = 2048, 512, 1024
    flat = jnp.asarray(rng.randn(n, dim).astype(np.float32))
    embed_n = l2norm(jnp.asarray(rng.randn(k, dim).astype(np.float32)))
    m = _plan(n, dim, k)
    assert m is not None
    ids = pallas_assign(flat, embed_n, m)
    ref = _chunked_argmax_sim(l2norm(flat), embed_n)
    # bf16 similarity may flip exact ties; on random gaussians expect <<1%
    assert np.mean(np.asarray(ids) != np.asarray(ref)) < 0.01
    # raw-bf16 production path: normalization skipped (argmax is invariant
    # to the per-row scale), 2 exact MXU passes — same assignments as the
    # f32 normalized reference on the identical bf16 values
    flat_bf = flat.astype(jnp.bfloat16)
    ids_bf = pallas_assign(flat_bf, embed_n, m)
    ref_bf = _chunked_argmax_sim(l2norm(flat_bf.astype(jnp.float32)),
                                 embed_n)
    assert np.mean(np.asarray(ids_bf) != np.asarray(ref_bf)) < 0.001
    bins, esum = pallas_cluster_stats(flat, ids, k, m)
    rbins, resum = _chunked_cluster_stats(l2norm(flat), ids, k)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(rbins), atol=0.5)
    np.testing.assert_allclose(np.asarray(esum), np.asarray(resum),
                               atol=5e-2)


# fused GEGLU feed-forward kernel (ops/pallas/ffn.py)
# ---------------------------------------------------------------------------

def test_fused_geglu_ff_matches_module_math():
    """fused_geglu_ff fallback == LN -> x@wi -> geglu -> @wo reference."""
    from ct_clip_tpu.ops.mlp import geglu
    from ct_clip_tpu.ops.norms import layer_norm
    from ct_clip_tpu.ops.pallas.ffn import fused_geglu_ff

    rng = np.random.RandomState(11)
    n, d, inner = 64, 16, 20
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    scale = jnp.asarray(rng.rand(d).astype(np.float32))
    bias = jnp.asarray(rng.rand(d).astype(np.float32))
    wi = jnp.asarray((rng.randn(d, 2 * inner) * 0.2).astype(np.float32))
    wo = jnp.asarray((rng.randn(inner, d) * 0.2).astype(np.float32))

    got = fused_geglu_ff(x, scale, bias, wi[:, :inner], wi[:, inner:], wo)
    ref = geglu(layer_norm(x, scale, bias) @ wi) @ wo
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # gradient path (custom vjp recompute)
    g1 = jax.grad(lambda x_: jnp.sum(fused_geglu_ff(
        x_, scale, bias, wi[:, :inner], wi[:, inner:], wo) ** 2))(x)
    g2 = jax.grad(lambda x_: jnp.sum(
        (geglu(layer_norm(x_, scale, bias) @ wi) @ wo) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_erf_approximation_accuracy():
    from ct_clip_tpu.ops.pallas.ffn import _erf_as
    import scipy.special as sp

    x = np.linspace(-6, 6, 4001).astype(np.float32)
    got = np.asarray(_erf_as(jnp.asarray(x)))
    assert np.max(np.abs(got - sp.erf(x))) < 5e-6


def test_fused_ff_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.ffn import _pallas_ff, _plan, _xla_ff

    rng = np.random.RandomState(12)
    n, d, inner = 2048, 512, 1365
    x = jnp.asarray(rng.randn(n, d).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.rand(d).astype(np.float32))
    bias = jnp.asarray(rng.rand(d).astype(np.float32))
    wia = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    wig = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    wo = jnp.asarray((rng.randn(inner, d) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    m = _plan(x.shape, d, inner, 2)
    assert m is not None
    got = _pallas_ff(x, scale, bias, wia, wig, wo, 1e-5, m).astype(jnp.float32)
    ref = _xla_ff(x, scale, bias, wia, wig, wo, 1e-5).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2)


def test_fused_ff_bwd_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.ffn import (_pallas_ff_bwd, _pick_m_bwd,
                                            _xla_ff)

    rng = np.random.RandomState(21)
    n, d, inner = 2048, 512, 1365
    x = jnp.asarray(rng.randn(n, d).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.rand(d).astype(np.float32))
    bias = jnp.asarray(rng.rand(d).astype(np.float32))
    wia = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    wig = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    wo = jnp.asarray((rng.randn(inner, d) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    do = jnp.asarray(rng.randn(n, d).astype(np.float32)).astype(jnp.bfloat16)
    m = _pick_m_bwd(n, d, inner, 2)
    assert m is not None
    got = _pallas_ff_bwd(x, scale, bias, wia, wig, wo, do, 1e-5, m)
    _, vjp = jax.vjp(lambda *a: _xla_ff(*a, 1e-5), x, scale, bias, wia,
                     wig, wo)
    ref = vjp(do)
    for a, b_ in zip(got, ref):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = max(np.abs(b32).max(), 1.0)
        assert np.max(np.abs(a32 - b32)) / denom < 2e-2


def test_fused_attention_key_bias_matches_xla():
    from ct_clip_tpu.ops.pallas.attention import _xla_attention, fused_attention

    q, k, v, _ = _attn_inputs()
    rng = np.random.RandomState(9)
    key_bias = jnp.asarray(
        np.where(rng.rand(4, 256) < 0.2, -1e9, 0.0).astype(np.float32))
    got = fused_attention(q, k, v, key_bias=key_bias)
    ref = _xla_attention(q, k, v, None, key_bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=_mxu_atol(2e-5, 6e-2))

    g1 = jax.grad(lambda q_: jnp.sum(
        fused_attention(q_, k, v, key_bias=key_bias) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(
        _xla_attention(q_, k, v, None, key_bias) ** 2))(q)
    a32, b32 = np.asarray(g1, np.float32), np.asarray(g2, np.float32)
    denom = max(np.abs(b32).max(), 1.0)
    assert np.abs(a32 - b32).max() / denom < _mxu_atol(2e-4, 2e-2)


def test_fused_attention_bwd_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.attention import (_pallas_attention_bwd,
                                                  _xla_attention)

    b, h, n, d = 8, 8, 576, 32
    rng = np.random.RandomState(13)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) \
        .astype(jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()
    for bh in (h, 1):
        bias = jnp.asarray(rng.randn(1, bh, n, n).astype(np.float32))
        got = _pallas_attention_bwd(q, k, v, bias, do)
        _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
        ref = vjp(do)
        for a, b_ in zip(got, ref):
            a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
            scale = max(np.abs(b32).max(), 1.0)
            assert np.max(np.abs(a32 - b32)) / scale < 1.5e-2


def test_fused_attention_kbias_bwd_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.attention import (
        _pallas_attention_bwd_kbias, _xla_attention)

    b, h, n, d = 8, 12, 512, 64
    rng = np.random.RandomState(17)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) \
        .astype(jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()
    key_bias = jnp.asarray(
        np.where(rng.rand(b, n) < 0.2, -1e9, 0.0).astype(np.float32))
    got = _pallas_attention_bwd_kbias(q, k, v, key_bias, do)
    _, vjp = jax.vjp(lambda q_, k_, v_, kb_: _xla_attention(
        q_, k_, v_, None, kb_), q, k, v, key_bias)
    ref = vjp(do)
    for a, b_ in zip(got, ref):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        scale = max(np.abs(b32).max(), 1.0)
        assert np.max(np.abs(a32 - b32)) / scale < 1.5e-2


# ---------------------------------------------------------- small attention

def _small_attn_inputs(b=12, n=24, dim=128, heads=4, dh=32, dtype=jnp.float32):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, n, dim).astype(np.float32), dtype)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(dim).astype(np.float32))
    wq = jnp.asarray(rng.randn(dim, heads * dh).astype(np.float32) / np.sqrt(dim))
    wkv = jnp.asarray(rng.randn(dim, 2 * heads * dh).astype(np.float32) / np.sqrt(dim))
    qs = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    ks = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    wout = jnp.asarray(rng.randn(heads * dh, dim).astype(np.float32)
                       / np.sqrt(heads * dh))
    return x, gamma, wq, wkv, qs, ks, wout


def test_small_qknorm_xla_matches_module_path():
    """The batched XLA reference must equal QKNormAttention's per-head loop."""
    from ct_clip_tpu.ops.attention import QKNormAttention
    from ct_clip_tpu.ops.pallas.small_attention import _xla_small_qknorm

    b, n, dim, heads, dh = 6, 16, 64, 4, 16
    x, gamma, wq, wkv, qs, ks, wout = _small_attn_inputs(b, n, dim, heads, dh)
    mod = QKNormAttention(dim, dim_head=dh, heads=heads, dtype=jnp.float32)
    variables = {"params": {"norm": {"gamma": gamma},
                            "to_q": {"kernel": wq}, "to_kv": {"kernel": wkv},
                            "q_scale": qs, "k_scale": ks,
                            "to_out": {"kernel": wout}}}
    want = mod.apply(variables, x)
    got = _xla_small_qknorm(x, gamma, wq, wkv, qs, ks, wout, heads=heads,
                            dim_head=dh, scale=8.0, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_small_qknorm_grad_finite_and_matches():
    from ct_clip_tpu.ops.pallas.small_attention import (
        _xla_small_qknorm, fused_small_qknorm_attention)

    args = _small_attn_inputs(4, 8, 64, 2, 16)

    def f(fn, *a):
        return jnp.sum(fn(*a, heads=2, dim_head=16, scale=8.0,
                          dtype=jnp.float32) ** 2
                       if fn is _xla_small_qknorm else
                       fn(*a, 2, 16, 8.0, jnp.float32) ** 2)

    g1 = jax.grad(lambda *a: f(fused_small_qknorm_attention, *a),
                  argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g2 = jax.grad(lambda *a: f(_xla_small_qknorm, *a),
                  argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g1, g2):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_small_qknorm_plan_gating():
    from ct_clip_tpu.ops.pallas.small_attention import _plan

    on_tpu = jax.devices()[0].platform == "tpu"
    # production temporal shape: engages on TPU only
    assert (_plan(4608, 24, 512, 8, 32) is not None) == on_tpu
    # large sequence / misaligned dims: never engages
    assert _plan(4608, 576, 512, 8, 32) is None
    assert _plan(4608, 24, 96, 8, 32) is None   # dim % 128
    assert _plan(4608, 24, 512, 3, 32) is None  # h*dh % 128


def test_small_qknorm_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.small_attention import (
        _pallas_small_qknorm, _plan, _xla_small_qknorm)

    b, n, dim, heads, dh = 96, 24, 256, 8, 32
    args = _small_attn_inputs(b, n, dim, heads, dh, dtype=jnp.bfloat16)
    g = _plan(b, n, dim, heads, dh)
    assert g is not None
    got = _pallas_small_qknorm(*args, g, heads=heads, dim_head=dh, scale=8.0,
                               dtype=jnp.bfloat16)
    ref = _xla_small_qknorm(*args, heads=heads, dim_head=dh, scale=8.0,
                            dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)


def test_small_qknorm_large_scales_on_tpu_if_available():
    """Learned QK-norm scales well above init must not zero attention rows
    (round-1 advisory: the constant Cauchy-Schwarz softmax shift underflowed
    exp for rows whose true max logit sat far below the bound; the kernel now
    subtracts a masked per-row max)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.small_attention import (
        _pallas_small_qknorm, _plan, _xla_small_qknorm)

    b, n, dim, heads, dh = 96, 24, 256, 8, 32
    x, gamma, wq, wkv, qs, ks, wout = _small_attn_inputs(
        b, n, dim, heads, dh, dtype=jnp.bfloat16)
    qs, ks = qs * 4.0, ks * 4.0  # max|qs|*max|ks| >> 5: old shift underflowed
    args = (x, gamma, wq, wkv, qs, ks, wout)
    g = _plan(b, n, dim, heads, dh)
    got = np.asarray(_pallas_small_qknorm(*args, g, heads=heads, dim_head=dh,
                                          scale=8.0, dtype=jnp.bfloat16),
                     np.float32)
    ref = np.asarray(_xla_small_qknorm(*args, heads=heads, dim_head=dh,
                                       scale=8.0, dtype=jnp.bfloat16),
                     np.float32)
    # with sharp (near-one-hot) attention the outputs are O(1); rows must not
    # collapse to zero and must track the XLA softmax (bf16 exp of ~32-scale
    # logits amplifies rounding -> looser bound than the init-scale test)
    assert np.abs(got).max() > 0.1
    scale = max(np.abs(ref).max(), 1.0)
    assert np.max(np.abs(got - ref)) / scale < 0.15


# -------------------------------------------------------- spatial attention

def test_spatial_qknorm_xla_matches_module_path():
    """The fused-sublayer XLA reference must equal QKNormAttention's generic
    (head-relayout) path for the CPB-bias spatial configuration."""
    from ct_clip_tpu.ops.attention import QKNormAttention
    from ct_clip_tpu.ops.pallas.spatial_attention import _xla_spatial_qknorm

    b, n, dim, heads, dh = 3, 144, 64, 4, 16
    x, gamma, wq, wkv, qs, ks, wout = _small_attn_inputs(b, n, dim, heads, dh)
    rng = np.random.RandomState(11)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    mod = QKNormAttention(dim, dim_head=dh, heads=heads, dtype=jnp.float32,
                          num_null_kv=0)
    variables = {"params": {"norm": {"gamma": gamma},
                            "to_q": {"kernel": wq}, "to_kv": {"kernel": wkv},
                            "q_scale": qs, "k_scale": ks,
                            "to_out": {"kernel": wout}}}
    want = mod.apply(variables, x, None, None, bias)
    got = _xla_spatial_qknorm(x, gamma, wq, wkv, qs, ks, wout, bias,
                              heads=heads, dim_head=dh, scale=8.0,
                              dtype=jnp.float32)
    # on TPU the module path dispatches to the fused Pallas sublayer while
    # `want` is the XLA twin -> MXU-pass tolerance; on CPU both are XLA
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=_mxu_atol(2e-5, 2e-2))


def test_spatial_qknorm_kernels_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.spatial_attention import (
        _pallas_spatial, _pallas_spatial_bwd, _plan, _xla_spatial_qknorm)

    b, n, dim, heads, dh = 12, 256, 512, 8, 32
    x, gamma, wq, wkv, qs, ks, wout = _small_attn_inputs(
        b, n, dim, heads, dh, dtype=jnp.bfloat16)
    rng = np.random.RandomState(12)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    assert _plan(b, n, dim, heads, dh)
    kw = dict(heads=heads, dim_head=dh, scale=8.0, dtype=jnp.bfloat16)
    got = _pallas_spatial(x, gamma, wq, wkv, qs, ks, wout, bias, **kw)
    ref = _xla_spatial_qknorm(x, gamma, wq, wkv, qs, ks, wout, bias, **kw)
    g32, r32 = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.abs(g32 - r32).max() / max(np.abs(r32).max(), 1.0) < 2e-2

    do = jnp.asarray(rng.randn(b, n, dim).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    got_g = _pallas_spatial_bwd(x, gamma, wq, wkv, qs, ks, wout, bias, do,
                                **kw)
    _, vjp = jax.vjp(lambda *a: _xla_spatial_qknorm(*a, **kw),
                     x, gamma, wq, wkv, qs, ks, wout, bias)
    ref_g = vjp(do)
    for a, b_ in zip(got_g, ref_g):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = max(np.abs(b32).max(), 1e-6)
        assert np.abs(a32 - b32).max() / denom < 5e-2


# ------------------------------------------------- dropout attention kernel

def test_attention_dropout_xla_fallback_statistics():
    from ct_clip_tpu.ops.pallas.attention import (
        _xla_attention, fused_attention_kbias_dropout)

    b, h, n, d = 2, 2, 32, 16
    rng = np.random.RandomState(31)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    kb = jnp.zeros((b, n), jnp.float32)
    outs = [fused_attention_kbias_dropout(q, k, v, kb,
                                          jnp.asarray([s], jnp.int32), 0.5)
            for s in range(64)]
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    ref = np.asarray(_xla_attention(q, k, v, None, kb))
    # inverted dropout is unbiased: the seed-average approaches the
    # no-dropout output (64 seeds -> loose bound on the mean deviation)
    assert np.mean(np.abs(mean - ref)) < 0.12
    g = jax.grad(lambda v_: jnp.sum(fused_attention_kbias_dropout(
        q, k, v_, kb, jnp.asarray([3], jnp.int32), 0.5) ** 2))(v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_attention_dropout_kernel_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.attention import fused_attention_kbias_dropout

    b, h, n, d = 8, 12, 512, 64
    rng = np.random.RandomState(33)
    mk = lambda s=1.0: jnp.asarray((rng.randn(b, h, n, d) * s)
                                   .astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(0.3), mk(0.3), mk()
    kb = jnp.asarray(np.where(rng.rand(b, n) < 0.2, -1e9, 0.0)
                     .astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)
    f = jax.jit(lambda q_, k_, v_: fused_attention_kbias_dropout(
        q_, k_, v_, kb, seed, 0.1))
    o1, o2 = f(q, k, v), f(q, k, v)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # rate=0 must equal the no-dropout kernel path exactly
    from ct_clip_tpu.ops.pallas.attention import fused_attention
    o_nodrop = fused_attention_kbias_dropout(q, k, v, kb, seed, 1e-9)
    ref = fused_attention(q, k, v, key_bias=kb)
    np.testing.assert_allclose(np.asarray(o_nodrop, np.float32),
                               np.asarray(ref, np.float32), atol=0.15)
    # fwd/bwd mask identity: out is linear in v, so the directional
    # derivative from two forwards (same seed) must match the VJP
    dv_dir = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32) * 0.1,
                         jnp.bfloat16)
    do = jnp.ones((b, h, n, d), jnp.bfloat16)
    _, vjp = jax.vjp(lambda v_: fused_attention_kbias_dropout(
        q, k, v_, kb, seed, 0.1), v)
    dv, = vjp(do)
    jvp_num = jnp.sum((f(q, k, v + dv_dir).astype(jnp.float32)
                       - f(q, k, v).astype(jnp.float32)))
    jvp_vjp = jnp.sum(dv.astype(jnp.float32) * dv_dir.astype(jnp.float32))
    a, b_ = float(jvp_num), float(jvp_vjp)
    assert abs(a - b_) / max(abs(b_), 1.0) < 5e-2


# --------------------------------------------------------------- PEG stencil

def test_peg_conv_matches_nn_conv():
    """peg_conv XLA fallback == flax nn.Conv depthwise (both paddings)."""
    import flax.linen as fnn
    from ct_clip_tpu.ops.pallas.peg import peg_conv, xla_peg_conv

    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(2, 4, 6, 6, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 1, 8).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    for causal in (False, True):
        frame_pad = (2, 0) if causal else (1, 1)
        conv = fnn.Conv(8, kernel_size=(3, 3, 3), feature_group_count=8,
                        padding=(frame_pad, (1, 1), (1, 1)), use_bias=True)
        want = conv.apply({"params": {"kernel": kernel, "bias": bias}}, x)
        got = peg_conv(x, kernel, bias, causal)
        # rtol: the shifted multiply-add form accumulates the 27 taps in a
        # different order than lax.conv -> f32 reassociation noise on
        # O(100) grad values
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        g1 = jax.grad(lambda x_: jnp.sum(peg_conv(x_, kernel, bias,
                                                  causal) ** 2))(x)
        g2 = jax.grad(lambda x_: jnp.sum(conv.apply(
            {"params": {"kernel": kernel, "bias": bias}}, x_) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                                   rtol=1e-5)
        gk = jax.grad(lambda k_: jnp.sum(peg_conv(x, k_, bias,
                                                  causal) ** 2))(kernel)
        gk2 = jax.grad(lambda k_: jnp.sum(conv.apply(
            {"params": {"kernel": k_, "bias": bias}}, x) ** 2))(kernel)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2),
                                   atol=1e-4, rtol=1e-5)


def test_peg_kernels_on_tpu_if_available():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.peg import (_pallas_peg_bwd, _plan,
                                            lax_peg_conv, xla_peg_conv)

    rng = np.random.RandomState(43)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 128).astype(np.float32)) \
        .astype(jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 1, 128).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    do = jnp.asarray(rng.randn(2, 8, 8, 8, 128).astype(np.float32) * 0.1) \
        .astype(jnp.bfloat16)
    for causal in (False, True):
        cb = _plan(x.shape, x.dtype)
        assert cb is not None
        got = lax_peg_conv(x, kernel, bias, causal)
        ref = xla_peg_conv(x, kernel.astype(jnp.bfloat16), bias, causal)
        g32, r32 = np.asarray(got, np.float32), np.asarray(ref, np.float32)
        assert np.abs(g32 - r32).max() / max(np.abs(r32).max(), 1.0) < 2e-2
        dx, dw, db = _pallas_peg_bwd(x, kernel, do, causal, cb)
        _, vjp = jax.vjp(lambda x_, k_, b_: xla_peg_conv(
            x_, k_.astype(jnp.bfloat16), b_, causal), x, kernel, bias)
        rdx, rdw, rdb = vjp(do)
        for a, b_ in ((dx, rdx), (dw, rdw), (db, rdb)):
            a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
            denom = max(np.abs(b32).max(), 1e-6)
            assert np.abs(a32 - b32).max() / denom < 2e-2


def test_grid_qknorm_kernel_on_tpu_if_available():
    """Native grid-layout temporal attention (fwd + bwd) vs the
    sequence-major XLA reference, at a production-like sub-shape."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.small_attention import (
        _plan_grid, _plan_grid_bwd, _xla_grid_qknorm,
        fused_small_qknorm_attention_grid)

    b, n, S, dim, heads, dh = 2, 24, 64, 256, 8, 32
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(b, n, S, dim).astype(np.float32), jnp.bfloat16)
    _, gamma, wq, wkv, qs, ks, wout = _small_attn_inputs(4, n, dim, heads, dh)
    assert _plan_grid(b, n, S, dim, heads, dh) is not None
    assert _plan_grid_bwd(b, n, S, dim, heads, dh) is not None

    args = (x, gamma, jnp.asarray(wq, jnp.bfloat16),
            jnp.asarray(wkv, jnp.bfloat16), qs, ks,
            jnp.asarray(wout, jnp.bfloat16))
    got = fused_small_qknorm_attention_grid(*args, heads, dh, 8.0,
                                            jnp.bfloat16, True)
    want = _xla_grid_qknorm(*args, heads=heads, dim_head=dh, scale=8.0,
                            dtype=jnp.bfloat16, residual=True)
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(want, np.float32)).max()
    assert err < 0.05, err  # bf16 accumulate-order noise

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g1 = jax.grad(lambda *a: loss(
        lambda *b_: fused_small_qknorm_attention_grid(
            *b_, heads, dh, 8.0, jnp.bfloat16, True), *a),
        argnums=tuple(range(7)))(*args)
    g2 = jax.grad(lambda *a: loss(
        lambda *b_: _xla_grid_qknorm(*b_, heads=heads, dim_head=dh,
                                     scale=8.0, dtype=jnp.bfloat16,
                                     residual=True), *a),
        argnums=tuple(range(7)))(*args)
    for a, b_ in zip(g1, g2):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        rel = np.abs(a32 - b32).max() / max(np.abs(b32).max(), 1e-6)
        assert rel < 0.05, rel


def test_row_embed_kernel_on_tpu_if_available():
    """fused_row_embed Pallas fwd/bwd vs the XLA twin on the chip."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU")
    from ct_clip_tpu.ops.pallas.patchify import (_pallas_row_embed,
                                                 _pallas_row_embed_bwd,
                                                 _use_pallas_rows,
                                                 _xla_row_embed)

    rng = np.random.RandomState(13)
    b, n, pd, dim = 2, 1728, 4000, 512
    rows = jnp.asarray(rng.randn(b, n, pd).astype(np.float32), jnp.bfloat16)
    s1 = jnp.asarray(rng.rand(pd).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(pd).astype(np.float32) * 0.01)
    wi = jnp.asarray((rng.randn(pd, dim) / np.sqrt(pd)).astype(np.float32),
                     jnp.bfloat16)
    pb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01, jnp.bfloat16)
    s2 = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    assert _use_pallas_rows(n, pd, dim)
    got = _pallas_row_embed(rows, s1, b1, wi, pb, s2, b2, 1e-5, jnp.bfloat16)
    want = _xla_row_embed(rows, s1, b1, wi, pb, s2, b2, 1e-5, jnp.bfloat16)
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(want, np.float32)).max()
    assert err < 0.05, err

    do = jnp.asarray(rng.randn(b, n, dim).astype(np.float32), jnp.bfloat16)
    got_g = _pallas_row_embed_bwd(rows, s1, b1, wi, pb, s2, b2, do, 1e-5,
                                  jnp.bfloat16)
    _, vjp = jax.vjp(lambda *a: _xla_row_embed(*a, 1e-5, jnp.bfloat16),
                     rows, s1, b1, wi, pb, s2, b2)
    for a, b_ in zip(got_g, vjp(do)):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        rel = np.abs(a32 - b32).max() / max(np.abs(b32).max(), 1e-6)
        assert rel < 0.05, rel
