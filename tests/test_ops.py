"""Unit tests for core ops against independent torch/numpy references."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from ct_clip_tpu.ops import (CosineVQ, GammaLayerNorm, ClipLayerNorm,
                             StandardLayerNorm, QKNormAttention,
                             ContinuousPositionBias, MaskgitTransformer,
                             alibi_bias, geglu, l2norm)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 32).astype(np.float32)
    gamma = rng.randn(32).astype(np.float32)
    beta = rng.randn(32).astype(np.float32)

    ref = TF.layer_norm(torch.tensor(x), (32,), torch.tensor(gamma),
                        torch.tensor(beta)).numpy()
    m = StandardLayerNorm(32)
    params = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    out = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # gamma-only variant == torch layer_norm with zero bias
    ref2 = TF.layer_norm(torch.tensor(x), (32,), torch.tensor(gamma)).numpy()
    out2 = GammaLayerNorm(32).apply({"params": {"gamma": jnp.asarray(gamma)}},
                                    jnp.asarray(x))
    np.testing.assert_allclose(out2, ref2, atol=1e-5)

    # clip variant (hand-rolled biased-var form) agrees in f32
    out3 = ClipLayerNorm(32).apply({"params": {"g": jnp.asarray(gamma)}},
                                   jnp.asarray(x))
    np.testing.assert_allclose(out3, ref2, atol=1e-5)


def test_geglu_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 5, 16).astype(np.float32)
    xt = torch.tensor(x)
    val, gate = xt.chunk(2, dim=-1)
    ref = (val * TF.gelu(gate)).numpy()
    out = geglu(jnp.asarray(x))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_l2norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 9).astype(np.float32)
    ref = TF.normalize(torch.tensor(x), dim=-1).numpy()
    np.testing.assert_allclose(l2norm(jnp.asarray(x)), ref, atol=1e-6)


@pytest.mark.parametrize("heads", [8, 6])
def test_alibi_slopes_and_bias(heads):
    import math

    def ref_slopes(h):
        def p2(n):
            start = 2 ** (-2 ** -(math.log2(n) - 3))
            return [start * start ** i for i in range(n)]
        if math.log2(h).is_integer():
            return p2(h)
        c = 2 ** math.floor(math.log2(h))
        return p2(c) + p2(2 * c)[0::2][: h - c]

    i, j = 5, 9
    bias = np.asarray(alibi_bias(heads, i, j))
    assert bias.shape == (heads, i, j)
    slopes = ref_slopes(heads)
    # spot check: bias[h, a, b] = -|b - (j - i + a)| * slope[h]
    for h in range(heads):
        for a in range(i):
            for b in range(j):
                expect = -abs(b - (j - i + a)) * slopes[h]
                assert abs(bias[h, a, b] - expect) < 1e-6


def _np_qknorm_attention(x, params, heads, dim_head, scale=8.0, bias=None):
    """Independent numpy reference of transformer_maskgit attention semantics."""
    def ln(v, g):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * g

    def l2n(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    p = params
    xn = ln(x, p["norm"]["gamma"])
    q = xn @ p["to_q"]["kernel"]
    # reference quirk: to_kv sees the PRE-norm input for self-attention
    # (kv_input captured before x = self.norm(x), attention.py:136-141)
    kv = x @ p["to_kv"]["kernel"]
    k, v = np.split(kv, 2, axis=-1)
    b, n, _ = x.shape

    def heads_split(t):
        return t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = map(heads_split, (q, k, v))
    q = l2n(q) * p["q_scale"]
    k = l2n(k) * p["k_scale"]
    sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
    if bias is not None:
        sim = sim + bias
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = np.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    return out @ p["to_out"]["kernel"]


def test_qknorm_attention_matches_numpy_reference():
    rng = np.random.RandomState(3)
    dim, heads, dim_head, n, b = 32, 4, 8, 6, 2
    x = rng.randn(b, n, dim).astype(np.float32)
    m = QKNormAttention(dim, dim_head=dim_head, heads=heads)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize scales so the test is non-trivial
    p = jax.tree.map(lambda a: a, params["params"])
    p["q_scale"] = jnp.asarray(rng.rand(dim_head).astype(np.float32) + 0.5)
    p["k_scale"] = jnp.asarray(rng.rand(dim_head).astype(np.float32) + 0.5)
    out = m.apply({"params": p}, jnp.asarray(x))
    ref = _np_qknorm_attention(x, jax.tree.map(np.asarray, p), heads, dim_head)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_continuous_position_bias_manual():
    dim, heads = 16, 4
    m = ContinuousPositionBias(dim=dim, heads=heads, num_dims=2)
    h = w = 3
    params = m.init(jax.random.PRNGKey(0), h, w)
    out = m.apply(params, h, w)
    assert out.shape == (heads, h * w, h * w)

    # manual forward: signed-log rel coords through the MLP
    p = jax.tree.map(np.asarray, params["params"])
    grid = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                    axis=-1).reshape(-1, 2)
    rel = (grid[:, None, :] - grid[None, :, :]).astype(np.float32)
    rel = np.sign(rel) * np.log(np.abs(rel) + 1)

    def lrelu(v):
        return np.where(v > 0, v, 0.1 * v)

    y = lrelu(rel @ p["net_0"]["kernel"] + p["net_0"]["bias"])
    y = lrelu(y @ p["net_1"]["kernel"] + p["net_1"]["bias"])
    y = y @ p["net_out"]["kernel"] + p["net_out"]["bias"]
    ref = y.transpose(2, 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cosine_vq_roundtrip_and_ema():
    rng = np.random.RandomState(4)
    dim, K = 16, 32
    x = rng.randn(4, 10, dim).astype(np.float32)
    m = CosineVQ(dim=dim, codebook_size=K, decay=0.8)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    embed0 = np.asarray(variables["vq"]["embed"])
    # codebook initialized unit-norm
    np.testing.assert_allclose(np.linalg.norm(embed0, axis=-1), 1.0, atol=1e-5)

    quant, ind, commit = m.apply(variables, jnp.asarray(x))
    assert quant.shape == x.shape and ind.shape == x.shape[:-1]
    # eval path: quantize == embed[ind] exactly (straight-through adds x - x)
    np.testing.assert_allclose(np.asarray(quant), embed0[np.asarray(ind)], atol=1e-5)
    # assignment is argmax cosine similarity
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    expect_ind = (xn.reshape(-1, dim) @ embed0.T).argmax(-1).reshape(ind.shape)
    np.testing.assert_array_equal(np.asarray(ind), expect_ind)
    assert commit > 0

    # training updates EMA stats
    (_, _, _), updates = m.apply(variables, jnp.asarray(x), train=True,
                                 mutable=["vq"])
    embed1 = np.asarray(updates["vq"]["embed"])
    assert not np.allclose(embed1, embed0)
    # untouched codes decay toward themselves (unchanged), used codes move
    used = np.unique(np.asarray(ind))
    unused = np.setdiff1d(np.arange(K), used)
    np.testing.assert_allclose(embed1[unused], embed0[unused], atol=1e-6)


def test_vq_gradient_is_straight_through():
    dim, K = 8, 16
    m = CosineVQ(dim=dim, codebook_size=K)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 3, dim).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    def f(x):
        q, _, _ = m.apply(variables, x)
        return jnp.sum(q * 2.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(x), atol=1e-6)


def test_maskgit_transformer_shapes_and_peg_residual():
    dim, depth = 32, 2
    b, t, h, w = 2, 3, 4, 4
    m = MaskgitTransformer(dim=dim, depth=depth, heads=4, dim_head=8,
                           peg=True, peg_causal=True)
    x = jnp.asarray(np.random.RandomState(6).randn(b * t, h * w, dim)
                    .astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, video_shape=(b, t, h, w))
    out = m.apply(params, x, video_shape=(b, t, h, w))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cpb_expand_backward_matches_scatter():
    """_cpb_expand's matmul-form VJP (separable indicator matmuls, HIGHEST
    precision) must match the scatter-add gradient it replaced, for square,
    non-square and non-2D dims."""
    import jax

    from ct_clip_tpu.ops.attention import _cpb_expand, _cpb_index_map

    rng = np.random.RandomState(2)
    for dims in [(5, 7), (4, 4), (3, 5, 2)]:
        n_off = int(np.prod([2 * d - 1 for d in dims]))
        n = int(np.prod(dims))
        table = jnp.asarray(rng.randn(n_off, 8).astype(np.float32))
        g = jnp.asarray(rng.randn(n, n, 8).astype(np.float32))
        dt = jax.grad(lambda t: jnp.sum(_cpb_expand(t, dims) * g))(table)
        ref = np.zeros((n_off, 8), np.float32)
        np.add.at(ref, _cpb_index_map(dims).reshape(-1),
                  np.asarray(g).reshape(-1, 8))
        np.testing.assert_allclose(np.asarray(dt), ref, rtol=1e-5, atol=1e-4)


def test_cpb_unique_offset_gather_matches_full_grid():
    """CPB evaluated on unique offsets + gather == MLP over the full pair
    grid (the reference's formulation, attention.py:262-276)."""
    from ct_clip_tpu.ops.attention import (ContinuousPositionBias,
                                           relative_position_grid)

    mod = ContinuousPositionBias(dim=16, heads=3, num_dims=2)
    variables = mod.init(jax.random.PRNGKey(0), 5, 7)
    got = mod.apply(variables, 5, 7)

    rel = relative_position_grid((5, 7), True)
    p = variables["params"]

    def dense(x, w, b):
        return x @ w + b

    x = dense(rel, p["net_0"]["kernel"], p["net_0"]["bias"])
    x = jax.nn.leaky_relu(x, 0.1)
    x = dense(x, p["net_1"]["kernel"], p["net_1"]["bias"])
    x = jax.nn.leaky_relu(x, 0.1)
    x = dense(x, p["net_out"]["kernel"], p["net_out"]["bias"])
    ref = jnp.transpose(x, (2, 0, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_vq_ema_psum_under_shard_map_matches_global():
    """CosineVQ(axis_name=...) inside shard_map over the data axis must
    produce the same EMA codebook update as a single full-batch call: the
    per-shard cluster stats are psummed before the EMA step (round-1 weak
    #9; the reference's torch VQ sees the whole DDP batch per rank only,
    so this is strictly stronger)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map  # jax>=0.8 home (experimental is deprecated)

    dim, K, n = 8, 16, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, dim).astype(np.float32))

    m_global = CosineVQ(dim=dim, codebook_size=K, decay=0.8)
    variables = m_global.init(jax.random.PRNGKey(0), x)
    _, gstate = m_global.apply(variables, x, train=True, mutable=["vq"])

    m_sharded = CosineVQ(dim=dim, codebook_size=K, decay=0.8,
                         axis_name="data")
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))

    def step(vq_state, xs):
        _, new_state = m_sharded.apply(
            {"params": {}, "vq": vq_state}, xs, train=True, mutable=["vq"])
        return new_state["vq"]

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(), P("data")), out_specs=P())
    sstate = sharded(variables["vq"], x)
    np.testing.assert_allclose(np.asarray(sstate["embed"]),
                               np.asarray(gstate["vq"]["embed"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sstate["cluster_size"]),
                               np.asarray(gstate["vq"]["cluster_size"]),
                               atol=1e-5)


def test_ctvit_config_threads_vq_axis_name():
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.models.ctvit import CTViT

    cfg = CTViTConfig(dim=8, codebook_size=16, image_size=16, patch_size=8,
                      temporal_patch_size=2, num_frames=4, spatial_depth=1,
                      temporal_depth=1, dim_head=4, heads=2,
                      vq_axis_name="data")
    import jax

    model = CTViT(cfg)
    video = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size, 1))
    variables = model.init(jax.random.PRNGKey(0), video)
    bound = model.bind(variables)
    assert bound.vq.axis_name == "data"


def test_peg_conv_grads_survive_batch_sharding():
    """Regression: the grouped-conv (feature_group_count=dim) form of the
    PEG fallback returned an ALL-ZERO kernel gradient under GSPMD whenever
    the batch dim was sharded over a mesh axis (dx/db were fine).  The
    shifted multiply-add form must give identical grads sharded vs not."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ct_clip_tpu.ops.pallas.peg import peg_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4, 4, 4, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 1, 32).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)

    for causal in (True, False):
        def loss(x_, k_, b_):
            return jnp.sum(peg_conv(x_, k_, b_, causal) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        ref = g(x, k, b)
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            got = g(xs, jax.device_put(k, NamedSharding(mesh, P())),
                    jax.device_put(b, NamedSharding(mesh, P())))
        for name, a_, b_ in zip(("dx", "dk", "db"), ref, got):
            a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
            scale = max(np.abs(a_).max(), 1e-6)
            assert np.abs(a_ - b_).max() / scale < 1e-5, name


def test_ctvit_config_threads_vq_exact_sim():
    """vq_exact_sim: None (default) -> exact assignment in training only;
    the flag must reach the CosineVQ module (ops/vq.py)."""
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.models.ctvit import CTViT

    for flag in (None, True, False):
        cfg = CTViTConfig(dim=8, codebook_size=16, image_size=16, patch_size=8,
                          temporal_patch_size=2, num_frames=4, spatial_depth=1,
                          temporal_depth=1, dim_head=4, heads=2,
                          vq_exact_sim=flag)
        model = CTViT(cfg)
        video = jnp.zeros((1, cfg.num_frames, cfg.image_size,
                           cfg.image_size, 1))
        bound = model.bind(model.init(jax.random.PRNGKey(0), video))
        assert bound.vq.exact_sim == flag


def test_ctvit_precomputed_spatial_bias_matches_default():
    """compute_spatial_bias() passed back via spatial_bias= must reproduce
    the default path exactly (it is the same table, hoisted out of the
    scored step — models/ctvit.py compute_spatial_bias)."""
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.models.ctvit import CTViT

    cfg = CTViTConfig(dim=16, codebook_size=16, image_size=16, patch_size=8,
                      temporal_patch_size=2, num_frames=4, spatial_depth=2,
                      temporal_depth=1, dim_head=8, heads=2)
    model = CTViT(cfg)
    rng = np.random.RandomState(31)
    video = jnp.asarray(rng.randn(2, cfg.num_frames, cfg.image_size,
                                  cfg.image_size, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video)

    bias = model.apply(variables,
                       method=lambda m: m.compute_spatial_bias())
    hw = cfg.image_size // cfg.patch_size
    assert bias.shape == (cfg.heads, hw * hw, hw * hw)

    ref = model.apply(variables, video, return_encoded_tokens=True)
    got = model.apply(variables, video, return_encoded_tokens=True,
                      spatial_bias=bias)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ctvit_patch_rows_input_matches_video():
    """Pre-shuffled patch rows (the ingest pipeline's native output,
    ops/resample.preprocess_to_patch_rows) must encode identically to the
    (b, f, H, W, 1) video: the patchify shuffle moves values untouched and
    the rows path runs the same LN -> proj -> LN math."""
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.models.ctvit import CTViT
    from ct_clip_tpu.ops.pallas.patchify import rearrange_patches

    cfg = CTViTConfig(dim=16, codebook_size=16, image_size=16, patch_size=8,
                      temporal_patch_size=2, num_frames=4, spatial_depth=2,
                      temporal_depth=1, dim_head=8, heads=2)
    model = CTViT(cfg)
    rng = np.random.RandomState(33)
    video = jnp.asarray(rng.randn(2, cfg.num_frames, cfg.image_size,
                                  cfg.image_size, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video)

    rows = rearrange_patches(video[..., 0], cfg.temporal_patch_size,
                             cfg.patch_size)
    assert rows.shape == (2, cfg.patch_t * cfg.patch_hw ** 2,
                          cfg.patch_dim)

    ref = model.apply(variables, video, return_encoded_tokens=True)
    got = model.apply(variables, rows, return_encoded_tokens=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # training path (XLA rows embed) agrees too
    ref_t = model.apply(variables, video, return_encoded_tokens=True,
                        train=True, deterministic=True,
                        rngs={"dropout": jax.random.PRNGKey(1),
                              "vq": jax.random.PRNGKey(2)},
                        mutable=["vq"])[0]
    got_t = model.apply(variables, rows, return_encoded_tokens=True,
                        train=True, deterministic=True,
                        rngs={"dropout": jax.random.PRNGKey(1),
                              "vq": jax.random.PRNGKey(2)},
                        mutable=["vq"])[0]
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))


def test_rotated_peg_matches_memory_reinterpretation():
    """PEG.rotated: for cubic grids, the reference's (b,h,w,t,d)->(b,t,h,w,d)
    memory reinterpretation (ctvit.py:299-303) equals relabeling the grid
    axes (t,h,w)->(h,w,t) — i.e. the same conv with rotated kernel taps and
    the causal pad moved to h.  Equal up to f32 tap-accumulation order."""
    from ct_clip_tpu.ops.pallas.peg import xla_peg_conv

    rng = np.random.RandomState(3)
    b, n, d = 2, 4, 8
    y = jnp.asarray(rng.randn(b, n, n, n, d).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 1, d).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)

    for causal in (True, False):
        # reference path: temporal stream is (b*h*w, t, d)-ordered memory,
        # reinterpreted as (b,t,h,w,d) for the PEG (MaskgitTransformer)
        stream = y.transpose(0, 2, 3, 1, 4).reshape(b * n * n, n, d)
        grid = stream.reshape(b, n, n, n, d)
        out_grid = xla_peg_conv(grid, kernel, bias, causal, residual=True)
        out_stream = out_grid.reshape(b * n * n, n, d)
        want = out_stream.reshape(b, n, n, n, d).transpose(0, 3, 1, 2, 4)

        got = xla_peg_conv(y, jnp.transpose(kernel, (2, 0, 1, 3, 4)), bias,
                           causal, residual=True, causal_axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"causal={causal}")
