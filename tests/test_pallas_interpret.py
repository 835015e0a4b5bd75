"""Interpret-mode execution of the hand-written Pallas kernels (fwd + bwd).

`pl.pallas_call(interpret=True)` runs each grid step as regular JAX ops on
the host backend, so the kernels' grid iteration, accumulation-across-steps
and block indexing logic — notably the custom backwards, which CI's XLA
fallbacks never touch — are exercised without a TPU (round-1 advisory #4).

The in-kernel TPU PRNG (attention-prob dropout) has no interpret rule and
remains covered by tests/test_pallas.py's TPU-gated test only.

Shapes are the smallest each kernel's plan accepts (lane/sublane multiples),
keeping interpret-mode cost in CI negligible.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_tpu.ops.pallas import _call


@pytest.fixture(autouse=True, scope="module")
def _interpret_mode():
    _call.set_interpret(True)
    jax.clear_caches()  # plans are resolved at trace time
    yield
    _call.set_interpret(False)
    jax.clear_caches()


def _rel_err(a, b):
    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a32 - b32).max() / max(np.abs(b32).max(), 1e-6)


# ------------------------------------------------------- fused attention

def _attn_args(b=2, h=2, n=128, d=16, seed=3, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d).astype(np.float32), dtype)
    return mk(), mk(), mk(), rng


def test_attention_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.attention import (_pallas_attention,
                                                  _pallas_attention_bwd,
                                                  _plan, _xla_attention)

    q, k, v, rng = _attn_args()
    do = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    for bh in (q.shape[1], 1):
        bias = jnp.asarray(rng.randn(1, bh, q.shape[2], q.shape[2])
                           .astype(np.float32))
        g = _plan(q.shape, 4, bias.shape)
        assert g is not None  # interpret mode must open the kernel gate
        got = _pallas_attention(q, k, v, bias, g)
        ref = _xla_attention(q, k, v, bias)
        assert _rel_err(got, ref) < 1e-4

        got_g = _pallas_attention_bwd(q, k, v, bias, do)
        _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
        for a, b_ in zip(got_g, vjp(do)):
            assert _rel_err(a, b_) < 1e-3


def test_attention_kbias_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.attention import (
        _pallas_attention, _pallas_attention_bwd_kbias, _plan,
        _xla_attention)

    q, k, v, rng = _attn_args(seed=5)
    b, h, n, d = q.shape
    kb = jnp.asarray(np.where(rng.rand(b, n) < 0.2, -1e9, 0.0)
                     .astype(np.float32))
    do = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    g = _plan(q.shape, 4, None)
    assert g is not None
    got = _pallas_attention(q, k, v, None, g, key_bias=kb)
    ref = _xla_attention(q, k, v, None, kb)
    assert _rel_err(got, ref) < 1e-4

    got_g = _pallas_attention_bwd_kbias(q, k, v, kb, do)
    _, vjp = jax.vjp(lambda q_, k_, v_, kb_: _xla_attention(
        q_, k_, v_, None, kb_), q, k, v, kb)
    for a, b_ in zip(got_g, vjp(do)):
        assert _rel_err(a, b_) < 1e-3


# --------------------------------------------------------- fused GEGLU FF

def _ff_args(n=1024, d=128, inner=256, seed=7, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32), dtype)
    scale = jnp.asarray(rng.rand(d).astype(np.float32))
    bias = jnp.asarray(rng.rand(d).astype(np.float32))
    wia = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32), dtype)
    wig = jnp.asarray((rng.randn(d, inner) * 0.05).astype(np.float32), dtype)
    wo = jnp.asarray((rng.randn(inner, d) * 0.05).astype(np.float32), dtype)
    do = jnp.asarray(rng.randn(n, d).astype(np.float32), dtype)
    return x, scale, bias, wia, wig, wo, do


def test_ff_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.ffn import (_pallas_ff, _pallas_ff_bwd,
                                            _pick_m_bwd, _plan, _xla_ff)

    x, scale, bias, wia, wig, wo, do = _ff_args()
    m = _plan(x.shape, x.shape[1], wia.shape[1], 2)
    assert m is not None
    got = _pallas_ff(x, scale, bias, wia, wig, wo, 1e-5, m)
    ref = _xla_ff(x, scale, bias, wia, wig, wo, 1e-5)
    assert _rel_err(got, ref) < 2e-2  # bf16 blocks; A&S-erf vs true erf

    mb = _pick_m_bwd(x.shape[0], x.shape[1], wia.shape[1], 2)
    assert mb is not None
    got_g = _pallas_ff_bwd(x, scale, bias, wia, wig, wo, do, 1e-5, mb)
    _, vjp = jax.vjp(lambda *a: _xla_ff(*a, 1e-5),
                     x, scale, bias, wia, wig, wo)
    # dwa/dwg/dwo are accumulated across sequential grid steps — the logic
    # the advisory wanted executed off-TPU
    for a, b_ in zip(got_g, vjp(do)):
        assert _rel_err(a, b_) < 2e-2

    # residual=True: x + ff(x) folded into the same pass
    got_r = _pallas_ff(x, scale, bias, wia, wig, wo, 1e-5, m, residual=True)
    ref_r = _xla_ff(x, scale, bias, wia, wig, wo, 1e-5, residual=True)
    assert _rel_err(got_r, ref_r) < 2e-2
    got_gr = _pallas_ff_bwd(x, scale, bias, wia, wig, wo, do, 1e-5, mb,
                            residual=True)
    # the identity term: residual dx == plain dx + do (f32 accumulate)
    assert _rel_err(got_gr[0], got_g[0].astype(jnp.float32)
                    + do.astype(jnp.float32)) < 2e-2
    for a, b_ in zip(got_gr[1:], got_g[1:]):  # weight grads unchanged
        assert _rel_err(a, b_) < 1e-6


# ------------------------------------------------------ fused patch embed

def test_patch_embed_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.patchify import (_pallas_patch_embed,
                                                 _pallas_patch_embed_bwd,
                                                 _use_pallas,
                                                 _xla_patch_embed)

    rng = np.random.RandomState(11)
    shape, pt, p, dim = (1, 4, 64, 64), 2, 8, 128
    pd = pt * p * p
    video = jnp.asarray(rng.randn(*shape).astype(np.float32))
    s1 = jnp.asarray(rng.rand(pd).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(pd).astype(np.float32) * 0.01)
    wi = jnp.asarray((rng.randn(pd, dim) / np.sqrt(pd)).astype(np.float32))
    pb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    s2 = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    assert _use_pallas(pt, p, shape[2], shape[3], 1)
    got = _pallas_patch_embed(video, s1, b1, wi, pb, s2, b2, pt, p, 1e-5,
                              jnp.float32)
    ref = _xla_patch_embed(video, s1, b1, wi, pb, s2, b2, pt, p, 1e-5,
                           jnp.float32)
    assert _rel_err(got, ref) < 1e-3

    do = jnp.asarray(rng.randn(1, 2 * 8 * 8, dim).astype(np.float32))
    got_g = _pallas_patch_embed_bwd(video, s1, b1, wi, pb, s2, b2, do,
                                    pt, p, 1e-5, jnp.float32)
    _, vjp = jax.vjp(lambda *a: _xla_patch_embed(*a, pt, p, 1e-5,
                                                 jnp.float32),
                     video, s1, b1, wi, pb, s2, b2)
    for a, b_ in zip(got_g, vjp(do)[1:]):  # kernel skips dvideo
        assert _rel_err(a, b_) < 1e-2


def test_row_embed_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.patchify import (_pallas_row_embed,
                                                 _pallas_row_embed_bwd,
                                                 _use_pallas_rows,
                                                 _xla_row_embed)

    rng = np.random.RandomState(12)
    b, n, pd, dim = 2, 64, 128, 128
    rows = jnp.asarray(rng.randn(b, n, pd).astype(np.float32))
    s1 = jnp.asarray(rng.rand(pd).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(pd).astype(np.float32) * 0.01)
    wi = jnp.asarray((rng.randn(pd, dim) / np.sqrt(pd)).astype(np.float32))
    pb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    s2 = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    assert _use_pallas_rows(n, pd, dim)
    got = _pallas_row_embed(rows, s1, b1, wi, pb, s2, b2, 1e-5, jnp.float32)
    ref = _xla_row_embed(rows, s1, b1, wi, pb, s2, b2, 1e-5, jnp.float32)
    assert _rel_err(got, ref) < 1e-3

    do = jnp.asarray(rng.randn(b, n, dim).astype(np.float32))
    got_g = _pallas_row_embed_bwd(rows, s1, b1, wi, pb, s2, b2, do,
                                  1e-5, jnp.float32)
    _, vjp = jax.vjp(lambda *a: _xla_row_embed(*a, 1e-5, jnp.float32),
                     rows, s1, b1, wi, pb, s2, b2)
    for a, b_ in zip(got_g, vjp(do)):  # incl. drows (the kernel emits it)
        assert _rel_err(a, b_) < 1e-2


# ----------------------------------------------------------------- VQ

def test_vq_kernels_interpret():
    from ct_clip_tpu.ops.norms import l2norm
    from ct_clip_tpu.ops.pallas.vq import (_plan, pallas_assign,
                                           pallas_cluster_stats)
    from ct_clip_tpu.ops.vq import _chunked_argmax_sim, _chunked_cluster_stats

    rng = np.random.RandomState(13)
    n, dim, k = 512, 128, 128
    flat = jnp.asarray(rng.randn(n, dim).astype(np.float32))
    embed_n = l2norm(jnp.asarray(rng.randn(k, dim).astype(np.float32)))
    m = _plan(n, dim, k)
    assert m is not None
    ids = pallas_assign(flat, embed_n, m)
    ref = _chunked_argmax_sim(l2norm(flat), embed_n)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref))
    # raw-bf16 path: normalization skipped inside the kernel
    flat_bf = flat.astype(jnp.bfloat16)
    ids_bf = pallas_assign(flat_bf, embed_n, m)
    ref_bf = _chunked_argmax_sim(l2norm(flat_bf.astype(jnp.float32)),
                                 embed_n)
    np.testing.assert_array_equal(np.asarray(ids_bf), np.asarray(ref_bf))
    bins, esum = pallas_cluster_stats(flat, ids, k, m)
    rbins, resum = _chunked_cluster_stats(l2norm(flat), ids, k)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(rbins), atol=1e-3)
    np.testing.assert_allclose(np.asarray(esum), np.asarray(resum), atol=1e-3)


# ------------------------------------------------------ small attention

def test_small_qknorm_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.small_attention import (
        _pallas_small_qknorm, _pallas_small_qknorm_bwd, _plan,
        _xla_small_qknorm)

    b, n, dim, heads, dh = 16, 24, 128, 4, 32
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.randn(b, n, dim).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(dim).astype(np.float32))
    wq = jnp.asarray(rng.randn(dim, heads * dh).astype(np.float32)
                     / np.sqrt(dim))
    wkv = jnp.asarray(rng.randn(dim, 2 * heads * dh).astype(np.float32)
                      / np.sqrt(dim))
    qs = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    ks = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    wout = jnp.asarray(rng.randn(heads * dh, dim).astype(np.float32)
                       / np.sqrt(heads * dh))
    args = (x, gamma, wq, wkv, qs, ks, wout)
    g = _plan(b, n, dim, heads, dh)
    assert g is not None
    kw = dict(heads=heads, dim_head=dh, scale=8.0, dtype=jnp.float32)
    got = _pallas_small_qknorm(*args, g, **kw)
    ref = _xla_small_qknorm(*args, **kw)
    assert _rel_err(got, ref) < 1e-3

    do = jnp.asarray(rng.randn(b, n, dim).astype(np.float32) * 0.1)
    got_g = _pallas_small_qknorm_bwd(*args, do, g, **kw)
    _, vjp = jax.vjp(lambda *a: _xla_small_qknorm(*a, **kw), *args)
    for a, b_ in zip(got_g, vjp(do)):
        assert _rel_err(a, b_) < 1e-2

    # residual=True: x + attn(x) folded into the same pass
    got_r = _pallas_small_qknorm(*args, g, **kw, residual=True)
    ref_r = _xla_small_qknorm(*args, **kw, residual=True)
    assert _rel_err(got_r, ref_r) < 1e-3
    assert _rel_err(got_r, got + x) < 1e-3
    got_gr = _pallas_small_qknorm_bwd(*args, do, g, **kw, residual=True)
    assert _rel_err(got_gr[0], got_g[0] + do) < 1e-3  # identity term
    for a, b_ in zip(got_gr[1:], got_g[1:]):  # weight grads unchanged
        assert _rel_err(a, b_) < 1e-6


# ---------------------------------------------------- spatial attention

def test_spatial_qknorm_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.spatial_attention import (
        _pallas_spatial, _pallas_spatial_bwd, _plan, _xla_spatial_qknorm)

    b, n, dim, heads, dh = 2, 128, 128, 4, 32
    rng = np.random.RandomState(19)
    x = jnp.asarray(rng.randn(b, n, dim).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(dim).astype(np.float32))
    wq = jnp.asarray(rng.randn(dim, heads * dh).astype(np.float32)
                     / np.sqrt(dim))
    wkv = jnp.asarray(rng.randn(dim, 2 * heads * dh).astype(np.float32)
                      / np.sqrt(dim))
    qs = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    ks = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    wout = jnp.asarray(rng.randn(heads * dh, dim).astype(np.float32)
                       / np.sqrt(heads * dh))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    args = (x, gamma, wq, wkv, qs, ks, wout, bias)
    assert _plan(b, n, dim, heads, dh)
    kw = dict(heads=heads, dim_head=dh, scale=8.0, dtype=jnp.float32)
    got = _pallas_spatial(*args, **kw)
    ref = _xla_spatial_qknorm(*args, **kw)
    assert _rel_err(got, ref) < 1e-3

    do = jnp.asarray(rng.randn(b, n, dim).astype(np.float32) * 0.1)
    got_g = _pallas_spatial_bwd(*args, do, **kw)
    _, vjp = jax.vjp(lambda *a: _xla_spatial_qknorm(*a, **kw), *args)
    for a, b_ in zip(got_g, vjp(do)):
        assert _rel_err(a, b_) < 1e-2

    # residual=True: x + attn(x) folded into the same pass
    got_r = _pallas_spatial(*args, **kw, residual=True)
    ref_r = _xla_spatial_qknorm(*args, **kw, residual=True)
    assert _rel_err(got_r, ref_r) < 1e-3
    assert _rel_err(got_r, got + x) < 1e-3
    got_gr = _pallas_spatial_bwd(*args, do, **kw, residual=True)
    assert _rel_err(got_gr[0], got_g[0] + do) < 1e-3  # identity term
    for a, b_ in zip(got_gr[1:], got_g[1:]):  # weight grads unchanged
        assert _rel_err(a, b_) < 1e-6


# ------------------------------------------------------------ PEG stencil

def test_peg_fwd_bwd_interpret():
    from ct_clip_tpu.ops.pallas.peg import (_pallas_peg_bwd, _plan,
                                            lax_peg_conv, xla_peg_conv)

    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 128).astype(np.float32),
                    jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 1, 128).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    do = jnp.asarray(rng.randn(1, 4, 8, 8, 128).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    for causal in (False, True):
        cb = _plan(x.shape, x.dtype)
        assert cb is not None
        got = lax_peg_conv(x, kernel, bias, causal)
        ref = xla_peg_conv(x, kernel.astype(jnp.bfloat16), bias, causal)
        assert _rel_err(got, ref) < 2e-2
        dx, dw, db = _pallas_peg_bwd(x, kernel, do, causal, cb)
        _, vjp = jax.vjp(lambda x_, k_, b_: xla_peg_conv(
            x_, k_.astype(jnp.bfloat16), b_, causal), x, kernel, bias)
        # dw: kernel accumulates f32 across grid steps; the XLA vjp rounds
        # through bf16 -> bf16-scale tolerance (kernel is the tighter one)
        for a, b_ in zip((dx, dw, db), vjp(do)):
            assert _rel_err(a, b_) < 5e-2

        # residual=True: x + conv(x) folded into the same pass
        got_r = lax_peg_conv(x, kernel, bias, causal, residual=True)
        ref_r = xla_peg_conv(x, kernel.astype(jnp.bfloat16), bias, causal,
                             residual=True)
        assert _rel_err(got_r, ref_r) < 2e-2
        dxr, dwr, dbr = _pallas_peg_bwd(x, kernel, do, causal, cb,
                                        residual=True)
        _, vjp_r = jax.vjp(lambda x_, k_, b_: xla_peg_conv(
            x_, k_.astype(jnp.bfloat16), b_, causal, residual=True),
            x, kernel, bias)
        for a, b_ in zip((dxr, dwr, dbr), vjp_r(do)):
            assert _rel_err(a, b_) < 5e-2
        # the identity term: residual dx == plain dx + do exactly (f32 path)
        assert _rel_err(dxr, dx + do) < 2e-2


def test_grid_attention_matches_sequence_major_interpret():
    """fused_small_qknorm_attention_grid on the native (b, n, S, d) grid ==
    the sequence-major reference math (transpose + per-head XLA), fwd + bwd."""
    from ct_clip_tpu.ops.pallas.small_attention import (
        _plan_grid, _xla_grid_qknorm, fused_small_qknorm_attention_grid)

    rng = np.random.RandomState(17)
    b, n, S, dim, h, dh = 2, 8, 16, 128, 8, 16
    scale = 8.0
    x = jnp.asarray(rng.randn(b, n, S, dim).astype(np.float32))
    gamma = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    wq = jnp.asarray(rng.randn(dim, h * dh).astype(np.float32) * 0.1)
    wkv = jnp.asarray(rng.randn(dim, 2 * h * dh).astype(np.float32) * 0.1)
    qs = jnp.asarray(rng.rand(dh).astype(np.float32) + 0.5)
    ks = jnp.asarray(rng.rand(dh).astype(np.float32) + 0.5)
    wout = jnp.asarray(rng.randn(h * dh, dim).astype(np.float32) * 0.1)
    assert _plan_grid(b, n, S, dim, h, dh) is not None

    args = (x, gamma, wq, wkv, qs, ks, wout)
    got = fused_small_qknorm_attention_grid(*args, h, dh, scale,
                                            jnp.float32, True)
    want = _xla_grid_qknorm(*args, heads=h, dim_head=dh, scale=scale,
                            dtype=jnp.float32, residual=True)
    assert got.shape == (b, n, S, dim)
    assert _rel_err(got, want) < 1e-4

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g_got = jax.grad(lambda *a: loss(
        lambda *b_: fused_small_qknorm_attention_grid(
            *b_, h, dh, scale, jnp.float32, True), *a),
        argnums=tuple(range(7)))(*args)
    g_want = jax.grad(lambda *a: loss(
        lambda *b_: _xla_grid_qknorm(*b_, heads=h, dim_head=dh, scale=scale,
                                     dtype=jnp.float32, residual=True), *a),
        argnums=tuple(range(7)))(*args)
    for a, b_ in zip(g_got, g_want):
        assert _rel_err(a, b_) < 1e-3


def test_ctvit_native_temporal_layout_matches_transpose_path_interpret():
    """CTViT encode with the native (b, t, h*w, d) temporal path (rotated
    PEG + grid attention; active in interpret mode) == the transpose path
    (forced by disabling the grid plan)."""
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.models.ctvit import CTViT

    cfg = CTViTConfig(dim=128, codebook_size=16, image_size=32, patch_size=4,
                      temporal_patch_size=2, num_frames=16, spatial_depth=1,
                      temporal_depth=2, dim_head=16, heads=8)
    # grid: t = 16/2 = 8, h = w = 32/4 = 8 -> cubic (n=8 sublane multiple)
    model = CTViT(cfg)
    rng = np.random.RandomState(21)
    video = jnp.asarray(rng.randn(2, cfg.num_frames, cfg.image_size,
                                  cfg.image_size, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video)

    assert model.apply(variables, method=lambda m: m._temporal_grid_path(
        2, 8, 8, 8, cfg.dim, True))
    got = model.apply(variables, video, return_encoded_tokens=True)

    import ct_clip_tpu.models.ctvit as ctvit_mod
    orig = ctvit_mod.CTViT._temporal_grid_path
    try:
        ctvit_mod.CTViT._temporal_grid_path = \
            lambda self, *a, **k: False
        jax.clear_caches()
        want = model.apply(variables, video, return_encoded_tokens=True)
    finally:
        ctvit_mod.CTViT._temporal_grid_path = orig
        jax.clear_caches()
    assert _rel_err(got, want) < 1e-3

    # gradients flow through the grid path (rotated PEG + grid attention)
    def loss(params):
        out = model.apply({**variables, "params": params}, video,
                          return_encoded_tokens=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
