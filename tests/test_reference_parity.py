"""Parity against the REAL reference sources (not transcriptions).

These tests import the unmodified reference code from /root/reference via
tests/ref_shims.py (beartype/torchvision/vqpt shims + a CPU device proxy for
the hard-coded torch.device('cuda') calls), convert the live state dicts
through convert/torch_to_jax.py, and assert the JAX models match the actual
reference modules numerically:

  * transformer_maskgit.attention.Transformer (PEG + QK-norm attention + CPB
    bias + GEGLU FF, attention.py:280-333) vs ops.attention.MaskgitTransformer
  * transformer_maskgit.ctvit.CTViT full `return_encoded_tokens=True` forward
    AND the continuous pre-VQ encode() path (ctvit.py:282-307, 353-412)
    vs models.ctvit.CTViT
  * ct_clip.ct_clip.CTCLIP latents + InfoNCE/DCL loss (ct_clip.py:614-901)
    vs models.ctclip.CTCLIP — including the log-sum-exp-stable loss rewrite
    against the reference's literal exp/diag/row-sum form
  * a 5-step EMA trajectory of ops.vq.CosineVQ(train=True) vs the
    vector-quantize-pytorch==1.1.2 cosine codebook transcription
    (transformer_maskgit/setup.py:19 pin, configured at ctvit.py:188)

The earlier transcription tests (test_torch_parity_ctvit / _ctclip) remain
as fast smoke tests; these are the authoritative parity evidence.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_shims import (  # noqa: E402  (same-dir test helper)
    load_reference_ctclip, load_reference_maskgit)

# tiny geometry: every structural feature active, CPU-fast
DIM, HEADS, DIM_HEAD = 16, 2, 8
IMAGE, PATCH, TPATCH, FRAMES = 16, 8, 2, 4
DEPTH_S, DEPTH_T, CODEBOOK = 2, 2, 32
DIM_TEXT, DIM_LATENT = 32, 24
DIM_IMAGE = (IMAGE // PATCH) ** 2 * DIM


def _jax_tree(params):
    return jax.tree_util.tree_map(jnp.asarray, params)


def _tiny_real_ctvit(seed=0):
    _, ctvit_mod = load_reference_maskgit()
    torch.manual_seed(seed)
    vit = ctvit_mod.CTViT(
        dim=DIM, codebook_size=CODEBOOK, image_size=IMAGE, patch_size=PATCH,
        temporal_patch_size=TPATCH, spatial_depth=DEPTH_S,
        temporal_depth=DEPTH_T, dim_head=DIM_HEAD, heads=HEADS, channels=1,
        use_vgg_and_gan=False).eval()
    # non-trivial learned QK scales so the QK-norm scaling path is exercised
    with torch.no_grad():
        for mod in vit.modules():
            if hasattr(mod, "q_scale"):
                mod.q_scale.mul_(torch.rand_like(mod.q_scale) + 0.5)
                mod.k_scale.mul_(torch.rand_like(mod.k_scale) + 0.5)
    return vit


def _my_ctvit_cfg():
    from ct_clip_tpu import CTViTConfig

    return CTViTConfig(dim=DIM, codebook_size=CODEBOOK, image_size=IMAGE,
                       patch_size=PATCH, temporal_patch_size=TPATCH,
                       num_frames=FRAMES, spatial_depth=DEPTH_S,
                       temporal_depth=DEPTH_T, dim_head=DIM_HEAD, heads=HEADS,
                       vq_exact_sim=True)


def test_real_transformer_block_parity():
    """One real Transformer block (attention.py:280-333) — PEG, QK-norm
    self-attention with CPB bias, GEGLU FF, final gamma-LN — against
    MaskgitTransformer with converted weights."""
    from ct_clip_tpu.convert.torch_to_jax import (
        maskgit_transformer_from_torch)
    from ct_clip_tpu.ops.attention import MaskgitTransformer

    attention_mod, _ = load_reference_maskgit()
    torch.manual_seed(3)
    ref = attention_mod.Transformer(
        DIM, depth=2, dim_head=DIM_HEAD, heads=HEADS, peg=True,
        peg_causal=True).eval()
    cpb = attention_mod.ContinuousPositionBias(dim=DIM, heads=HEADS).eval()

    b, t, h, w = 2, 2, 2, 2
    x = torch.randn(b * t, h * w, DIM)
    with torch.no_grad():
        bias = cpb(h, w)
        want = ref(x, video_shape=(b, t, h, w), attn_bias=bias).numpy()

    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params = maskgit_transformer_from_torch(sd, "t", depth=2)
    model = MaskgitTransformer(dim=DIM, depth=2, dim_head=DIM_HEAD,
                               heads=HEADS, peg=True, peg_causal=True)
    got = model.apply({"params": _jax_tree(params)}, jnp.asarray(x.numpy()),
                      video_shape=(b, t, h, w),
                      attn_bias=jnp.asarray(bias.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_real_ctvit_encoder_parity():
    """The real CTViT forward (ctvit.py:353-412, return_encoded_tokens=True)
    and the continuous pre-VQ encode() path (ctvit.py:282-307) against the
    JAX CTViT with the real state dict converted."""
    from ct_clip_tpu.convert.torch_to_jax import ctvit_params_from_torch
    from ct_clip_tpu.models.ctvit import CTViT, from_torch_layout

    vit = _tiny_real_ctvit()
    video_t = torch.randn(2, 1, FRAMES, IMAGE, IMAGE)
    with torch.no_grad():
        want = vit(video_t, return_encoded_tokens=True).numpy()
        tokens_ref = vit.to_patch_emb(video_t)
        want_pre_vq = vit.encode(tokens_ref).numpy()

    cfg = _my_ctvit_cfg()
    params, vq_state = ctvit_params_from_torch(vit.state_dict(), cfg)
    model = CTViT(cfg)
    variables = {"params": _jax_tree(params), "vq": _jax_tree(vq_state)}
    video_j = from_torch_layout(jnp.asarray(video_t.numpy()))

    got = model.apply(variables, video_j, return_encoded_tokens=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)

    # continuous (pre-VQ) features: quantized outputs are codebook lookups,
    # so identical indices would mask sub-threshold encoder divergence
    tokens = model.apply(variables, video_j.astype(jnp.float32),
                         method=CTViT.embed_patches)
    pre_vq = model.apply(variables, tokens, method=CTViT.encode)
    np.testing.assert_allclose(np.asarray(pre_vq), want_pre_vq,
                               atol=1e-4, rtol=1e-4)


def _real_tiny_ctclip(dcl: bool):
    from transformers import BertConfig as HFC, BertModel as HFM

    ctclip_mod = load_reference_ctclip()
    vit = _tiny_real_ctvit(seed=1)
    torch.manual_seed(11)
    bert = HFM(HFC(vocab_size=64, hidden_size=DIM_TEXT, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=40, hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0)).eval()
    clip = ctclip_mod.CTCLIP(
        image_encoder=vit, text_encoder=bert, dim_text=DIM_TEXT,
        dim_image=DIM_IMAGE, dim_latent=DIM_LATENT,
        decoupled_contrastive_learning=dcl).eval()
    with torch.no_grad():
        clip.temperature.fill_(0.3)
    return clip


@pytest.mark.parametrize("dcl", [False, True])
def test_real_ctclip_latents_and_loss_parity(dcl):
    """Real CTCLIP.forward (ct_clip.py:614-901): latent projections
    (return_latents=True) and the contrastive loss — including the DCL
    variant (ct_clip.py:866-869) — against the JAX CTCLIP."""
    from types import SimpleNamespace

    from ct_clip_tpu import BertConfig, CTCLIPConfig
    from ct_clip_tpu.convert.torch_to_jax import ctclip_params_from_torch
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.models.ctvit import from_torch_layout

    clip = _real_tiny_ctclip(dcl)

    rng = np.random.RandomState(7)
    ids = rng.randint(3, 64, size=(3, 12))
    mask = np.ones_like(ids)
    ids[:, 8:], mask[:, 8:] = 0, 0
    text = SimpleNamespace(input_ids=torch.tensor(ids),
                           attention_mask=torch.tensor(mask))
    video_t = torch.randn(3, 1, FRAMES, IMAGE, IMAGE)
    cpu = torch.device("cpu")

    with torch.no_grad():
        want_tl, want_il, _ = clip(text, video_t, cpu, return_latents=True)
        want_loss = float(clip(text, video_t, cpu, return_loss=True))

    cfg = CTCLIPConfig(
        dim_text=DIM_TEXT, dim_image=DIM_IMAGE, dim_latent=DIM_LATENT,
        decoupled_contrastive_learning=dcl, ctvit=_my_ctvit_cfg(),
        bert=BertConfig(vocab_size=64, hidden_size=DIM_TEXT,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=40,
                        hidden_dropout=0.0, attention_dropout=0.0))
    variables = _jax_tree(ctclip_params_from_torch(clip.state_dict(), cfg))
    model = CTCLIP(cfg)
    video_j = from_torch_layout(jnp.asarray(video_t.numpy()))

    got = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask), video_j,
                      return_latents=True)
    np.testing.assert_allclose(np.asarray(got[0]), want_tl.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), want_il.numpy(), atol=1e-4)

    got_loss = float(model.apply(variables, jnp.asarray(ids),
                                 jnp.asarray(mask), video_j,
                                 return_loss=True))
    assert got_loss == pytest.approx(want_loss, abs=2e-5)


def test_vq_ema_trajectory_matches_vqpt_112():
    """5 training steps of CosineVQ must track the vector-quantize-pytorch
    1.1.2 cosine codebook (ref_shims transcription; ctvit.py:188 config):
    embed EMA (decay 0.8, l2-normalized cluster means, zero bins frozen),
    cluster-size EMA on raw bins, straight-through output, and MSE
    commitment loss, step for step."""
    from vector_quantize_pytorch import VectorQuantize  # ref_shims shim

    from ct_clip_tpu.ops.vq import CosineVQ

    dim, k, n = 8, 16, 64
    torch.manual_seed(5)
    tvq = VectorQuantize(dim=dim, codebook_size=k, use_cosine_sim=True)
    tvq.train()

    model = CosineVQ(dim=dim, codebook_size=k)
    x0 = jnp.zeros((n, dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    # start both from the torch init codebook
    vq_state = {"embed": jnp.asarray(tvq.codebook.numpy().copy()),
                "cluster_size": jnp.asarray(
                    tvq._codebook.cluster_size.numpy().copy())}
    del variables

    rng = np.random.RandomState(3)
    for step in range(5):
        x = rng.randn(n, dim).astype(np.float32) * 2.0
        with torch.no_grad():
            want_q, want_ind, want_loss = tvq(torch.tensor(x))

        (got_q, got_ind, got_loss), mut = model.apply(
            {"vq": vq_state}, jnp.asarray(x), train=True, mutable=["vq"])
        vq_state = mut["vq"]

        np.testing.assert_array_equal(np.asarray(got_ind), want_ind.numpy(),
                                      err_msg=f"step {step} assignment")
        np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                                   atol=1e-5, err_msg=f"step {step} quantize")
        assert float(got_loss) == pytest.approx(float(want_loss), abs=1e-5), \
            f"step {step} commitment loss"
        np.testing.assert_allclose(
            np.asarray(vq_state["embed"]), tvq.codebook.numpy(),
            atol=1e-5, err_msg=f"step {step} embed EMA")
        np.testing.assert_allclose(
            np.asarray(vq_state["cluster_size"]),
            tvq._codebook.cluster_size.numpy(),
            atol=1e-5, err_msg=f"step {step} cluster_size EMA")


def test_visual_ssl_heads_and_losses_parity():
    """models.visual_ssl projector/predictor/losses vs the REAL
    ct_clip.visual_ssl module (visual_ssl.py:88-137): same weights -> same
    projections (BN in training mode = batch statistics), same loss values."""
    from ref_shims import load_reference_visual_ssl

    from ct_clip_tpu.models.visual_ssl import (MLP, SimSiamMLP, nt_xent_loss,
                                               simsiam_loss)

    ref = load_reference_visual_ssl()
    rng = np.random.RandomState(7)
    dim, hidden, proj = 24, 48, 16
    x = rng.randn(10, dim).astype(np.float32)

    # --- SimSiamMLP: Linear(no bias)+BN+ReLU x2 + Linear(no bias)+BN(no aff)
    tm = ref.SimSiamMLP(dim, proj, hidden).train()
    with torch.no_grad():
        for m in tm:
            if isinstance(m, torch.nn.Linear):
                m.weight.copy_(torch.randn_like(m.weight) * 0.2)
            if isinstance(m, torch.nn.BatchNorm1d) and m.affine:
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
        want = tm(torch.from_numpy(x)).numpy()

    jm = SimSiamMLP(projection_size=proj, hidden=hidden)
    params = {
        "fc0": {"kernel": jnp.asarray(tm[0].weight.detach().numpy().T)},
        "bn0": {"scale": jnp.asarray(tm[1].weight.detach().numpy()),
                "bias": jnp.asarray(tm[1].bias.detach().numpy())},
        "fc1": {"kernel": jnp.asarray(tm[3].weight.detach().numpy().T)},
        "bn1": {"scale": jnp.asarray(tm[4].weight.detach().numpy()),
                "bias": jnp.asarray(tm[4].bias.detach().numpy())},
        "out": {"kernel": jnp.asarray(tm[6].weight.detach().numpy().T)},
    }
    got = jm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # --- MLP (predictor): Linear+BN+ReLU+Linear with biases
    tp = ref.MLP(proj, proj, hidden).train()
    with torch.no_grad():
        for m in tp:
            if isinstance(m, torch.nn.Linear):
                m.weight.copy_(torch.randn_like(m.weight) * 0.2)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
            if isinstance(m, torch.nn.BatchNorm1d):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
        z = rng.randn(10, proj).astype(np.float32)
        want_p = tp(torch.from_numpy(z)).numpy()
    jp = MLP(projection_size=proj, hidden=hidden)
    pparams = {
        "fc0": {"kernel": jnp.asarray(tp[0].weight.detach().numpy().T),
                "bias": jnp.asarray(tp[0].bias.detach().numpy())},
        "bn0": {"scale": jnp.asarray(tp[1].weight.detach().numpy()),
                "bias": jnp.asarray(tp[1].bias.detach().numpy())},
        "out": {"kernel": jnp.asarray(tp[3].weight.detach().numpy().T),
                "bias": jnp.asarray(tp[3].bias.detach().numpy())},
    }
    got_p = jp.apply({"params": pparams}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=2e-5)

    # --- SimSiam loss: (loss_fn(p1, z2.detach) + loss_fn(p2, z1.detach)).mean
    p1, z1 = rng.randn(6, proj), rng.randn(6, proj)
    p2, z2 = rng.randn(6, proj), rng.randn(6, proj)
    t = lambda a: torch.from_numpy(a.astype(np.float32))
    want_l = (ref.loss_fn(t(p1), t(z2).detach())
              + ref.loss_fn(t(p2), t(z1).detach())).mean().item()
    got_l = float(simsiam_loss(jnp.asarray(p1, jnp.float32),
                               jnp.asarray(z1, jnp.float32),
                               jnp.asarray(p2, jnp.float32),
                               jnp.asarray(z2, jnp.float32)))
    assert abs(got_l - want_l) < 1e-5

    # --- NT-Xent: the -inf self-mask == the reference's eye compaction
    q, k = rng.randn(6, proj).astype(np.float32), \
        rng.randn(6, proj).astype(np.float32)
    # reference applies it to already-projected (not renormalized) vectors;
    # ours l2-normalizes inside — feed pre-normalized inputs to compare the
    # masking/reduction math itself
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    kn = k / np.linalg.norm(k, axis=-1, keepdims=True)
    want_x = ref.nt_xent_loss(t(qn), t(kn), temperature=0.1).item()
    got_x = float(nt_xent_loss(jnp.asarray(qn), jnp.asarray(kn), 0.1))
    assert abs(got_x - want_x) < 1e-5
