"""Whole-model torch-transcription parity for CTCLIP zero-shot.

Closes the last gap between "the ops are right" and "CT-CLIP_v2.pt will
reproduce AUROC": a complete reference-layout CTCLIP state dict — HF BERT
text tower + the full CTViT encoder transcription (from
test_torch_parity_ctvit) + both latent projections + the CLOOB extras + the
temperature scalar (CT_CLIP/ct_clip/ct_clip.py:587-597) — is pushed through
`ctclip_params_from_torch` and the zero-shot pair-softmax probabilities
(ct_clip.py:762-771 text path, :715-771 image path, scripts/zero_shot.py:
134-143 scoring) must match the torch transcription end to end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from test_torch_parity_ctvit import (  # noqa: E402  (same-dir test module)
    DIM, FRAMES, IMAGE, PATCH, TPATCH, TCTViT)

DIM_TEXT, DIM_LATENT = 32, 24
DIM_IMAGE = (IMAGE // PATCH) ** 2 * DIM  # post-temporal-pool flattened grid
N_PATHOLOGIES = 2


def _hf_tiny_bert():
    from transformers import BertConfig as HFC, BertModel as HFM

    hf = HFM(HFC(vocab_size=64, hidden_size=DIM_TEXT, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=40, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0))
    hf.eval()
    return hf


class TCTCLIP(nn.Module):
    """Reference CTCLIP forward, zero-shot slice (ct_clip.py:614-807):
    text = BERT last-hidden CLS -> to_text_latent -> l2norm; image = CTViT
    encoded tokens -> temporal mean -> flatten -> to_visual_latent -> l2norm;
    CLOOB extra projections present as in every reference checkpoint
    (ct_clip.py:580-582).  Attribute names reproduce the checkpoint's
    state-dict key layout."""

    def __init__(self):
        super().__init__()
        self.text_transformer = _hf_tiny_bert()
        self.visual_transformer = TCTViT()
        self.to_text_latent = nn.Linear(DIM_TEXT, DIM_LATENT, bias=False)
        self.to_visual_latent = nn.Linear(DIM_IMAGE, DIM_LATENT, bias=False)
        self.to_text_latent_extra = nn.Linear(DIM_TEXT, DIM_LATENT, bias=False)
        self.to_visual_latent_extra = nn.Linear(DIM_IMAGE, DIM_LATENT,
                                                bias=False)
        self.temperature = nn.Parameter(torch.tensor(0.3))

    def encode_text(self, ids, mask):
        hidden = self.text_transformer(input_ids=ids,
                                       attention_mask=mask).last_hidden_state
        emb = hidden[:, 0]  # CLS pooling (ct_clip.py:762)
        return (F.normalize(self.to_text_latent(emb), dim=-1),
                F.normalize(self.to_text_latent_extra(emb), dim=-1))

    def encode_image(self, video):
        tokens = self.visual_transformer(video)  # (b, t, h, w, d)
        pooled = tokens.mean(dim=1)  # temporal mean (ct_clip.py:724)
        flat = pooled.reshape(pooled.shape[0], -1)
        return (F.normalize(self.to_visual_latent(flat), dim=-1),
                F.normalize(self.to_visual_latent_extra(flat), dim=-1))


def test_ctclip_zero_shot_matches_torch_transcription():
    from ct_clip_tpu import BertConfig, CTCLIPConfig, CTViTConfig
    from ct_clip_tpu.convert.torch_to_jax import ctclip_params_from_torch
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.models.ctvit import from_torch_layout

    torch.manual_seed(7)
    tmodel = TCTCLIP().eval()

    rng = np.random.RandomState(7)
    # 4 prompts (2 pathologies x present/absent), padded like real prompts
    ids = rng.randint(3, 64, size=(2 * N_PATHOLOGIES, 12))
    mask = np.ones_like(ids)
    ids[:, 8:], mask[:, 8:] = 0, 0
    video_t = torch.randn(2, 1, FRAMES, IMAGE, IMAGE)

    with torch.no_grad():
        tl, tl_x = tmodel.encode_text(torch.tensor(ids), torch.tensor(mask))
        il, il_x = tmodel.encode_image(video_t)
        temp = tmodel.temperature.exp()
        logits = torch.einsum(
            "bd,pkd->bpk", il, tl.reshape(N_PATHOLOGIES, 2, -1)) * temp
        ref_probs = logits.softmax(dim=-1)[..., 0].numpy()

    cfg = CTCLIPConfig(
        dim_text=DIM_TEXT, dim_image=DIM_IMAGE, dim_latent=DIM_LATENT,
        extra_latent_projection=True,
        # vq_exact_sim: bit-parity needs the f32 assignment at inference too
        # (the production default is the bf16 single-pass, which may flip
        # near-tie codes — ops/vq.py:128)
        ctvit=CTViTConfig(dim=DIM, codebook_size=32, image_size=IMAGE,
                          patch_size=PATCH, temporal_patch_size=TPATCH,
                          num_frames=FRAMES, spatial_depth=2,
                          temporal_depth=2, dim_head=8, heads=2,
                          vq_exact_sim=True),
        bert=BertConfig(vocab_size=64, hidden_size=DIM_TEXT,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=40,
                        hidden_dropout=0.0, attention_dropout=0.0))
    variables = ctclip_params_from_torch(tmodel.state_dict(), cfg)
    variables = {k: jnp.asarray(v) if not isinstance(v, dict) else v
                 for k, v in variables.items()}
    model = CTCLIP(cfg)

    video_j = from_torch_layout(jnp.asarray(video_t.numpy()))
    got = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                      video_j, return_latents=True)
    got_tl, got_il, got_tl_x, got_il_x = (np.asarray(g) for g in got)

    # all four latent projections value-match the transcription
    np.testing.assert_allclose(got_tl, tl.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_il, il.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_tl_x, tl_x.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_il_x, il_x.numpy(), atol=1e-4)

    # and the zero-shot pair-softmax probabilities match end to end
    temp_j = jnp.exp(variables["params"]["temperature"])
    logits_j = jnp.einsum("bd,pkd->bpk", got_il,
                          got_tl.reshape(N_PATHOLOGIES, 2, -1)) * temp_j
    got_probs = np.asarray(jax.nn.softmax(logits_j, axis=-1)[..., 0])
    np.testing.assert_allclose(got_probs, ref_probs, atol=1e-4)
