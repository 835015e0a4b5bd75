"""Converter tests: a synthetic torch-layout state dict (reference key names,
transformer_maskgit/ctvit.py + HF BertModel + ct_clip.py layouts) must map
onto exactly the parameter tree the flax models create."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_tpu.convert.torch_to_jax import (bert_params_from_torch,
                                              ctclip_params_from_torch,
                                              ctvit_params_from_torch)
from ct_clip_tpu.models import CTCLIP, CTViT


def _vit_cfg():
    return CTViTConfig(dim=32, codebook_size=16, image_size=16, patch_size=8,
                       temporal_patch_size=2, spatial_depth=2,
                       temporal_depth=2, dim_head=8, heads=4, num_frames=4)


def synth_ctvit_sd(cfg: CTViTConfig, prefix="", rng=None):
    """Reference CTViT state dict with correct shapes (torch layouts)."""
    rng = rng or np.random.RandomState(0)
    r = lambda *s: rng.randn(*s).astype(np.float32)
    pd, d = cfg.patch_dim, cfg.dim
    sd = {
        f"{prefix}to_patch_emb.1.weight": r(pd),
        f"{prefix}to_patch_emb.1.bias": r(pd),
        f"{prefix}to_patch_emb.2.weight": r(d, pd),
        f"{prefix}to_patch_emb.2.bias": r(d),
        f"{prefix}to_patch_emb.3.weight": r(d),
        f"{prefix}to_patch_emb.3.bias": r(d),
        f"{prefix}spatial_rel_pos_bias.net.0.0.weight": r(d, 2),
        f"{prefix}spatial_rel_pos_bias.net.0.0.bias": r(d),
        f"{prefix}spatial_rel_pos_bias.net.1.0.weight": r(d, d),
        f"{prefix}spatial_rel_pos_bias.net.1.0.bias": r(d),
        f"{prefix}spatial_rel_pos_bias.net.2.weight": r(cfg.heads, d),
        f"{prefix}spatial_rel_pos_bias.net.2.bias": r(cfg.heads),
        f"{prefix}vq._codebook.embed": r(cfg.codebook_size, d),
        f"{prefix}vq._codebook.cluster_size": np.zeros(cfg.codebook_size, np.float32),
    }
    inner = cfg.dim_head * cfg.heads
    ffi = int(4 * (2 / 3) * d)
    for stack, depth in [("enc_spatial_transformer", cfg.spatial_depth),
                         ("enc_temporal_transformer", cfg.temporal_depth)]:
        sd[f"{prefix}{stack}.norm_out.gamma"] = r(d)
        for i in range(depth):
            lp = f"{prefix}{stack}.layers.{i}"
            sd[f"{lp}.0.dsconv.weight"] = r(d, 1, 3, 3, 3)
            sd[f"{lp}.0.dsconv.bias"] = r(d)
            sd[f"{lp}.1.norm.gamma"] = r(d)
            sd[f"{lp}.1.to_q.weight"] = r(inner, d)
            sd[f"{lp}.1.to_kv.weight"] = r(inner * 2, d)
            sd[f"{lp}.1.to_out.weight"] = r(d, inner)
            sd[f"{lp}.1.q_scale"] = r(cfg.dim_head)
            sd[f"{lp}.1.k_scale"] = r(cfg.dim_head)
            sd[f"{lp}.1.null_kv"] = np.zeros((cfg.heads, 0, cfg.dim_head), np.float32)
            sd[f"{lp}.3.0.weight"] = r(d)
            sd[f"{lp}.3.0.bias"] = r(d)
            sd[f"{lp}.3.1.weight"] = r(ffi * 2, d)
            sd[f"{lp}.3.4.weight"] = r(d, ffi)
    return sd


def synth_bert_sd(cfg: BertConfig, prefix="", rng=None):
    rng = rng or np.random.RandomState(1)
    r = lambda *s: rng.randn(*s).astype(np.float32)
    hs, im = cfg.hidden_size, cfg.intermediate_size
    sd = {
        f"{prefix}embeddings.word_embeddings.weight": r(cfg.vocab_size, hs),
        f"{prefix}embeddings.position_embeddings.weight": r(cfg.max_position_embeddings, hs),
        f"{prefix}embeddings.token_type_embeddings.weight": r(cfg.type_vocab_size, hs),
        f"{prefix}embeddings.LayerNorm.weight": r(hs),
        f"{prefix}embeddings.LayerNorm.bias": r(hs),
        f"{prefix}pooler.dense.weight": r(hs, hs),
        f"{prefix}pooler.dense.bias": r(hs),
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}encoder.layer.{i}."
        for name in ["attention.self.query", "attention.self.key",
                     "attention.self.value", "attention.output.dense"]:
            sd[f"{lp}{name}.weight"] = r(hs, hs)
            sd[f"{lp}{name}.bias"] = r(hs)
        sd[f"{lp}attention.output.LayerNorm.weight"] = r(hs)
        sd[f"{lp}attention.output.LayerNorm.bias"] = r(hs)
        sd[f"{lp}intermediate.dense.weight"] = r(im, hs)
        sd[f"{lp}intermediate.dense.bias"] = r(im)
        sd[f"{lp}output.dense.weight"] = r(hs, im)
        sd[f"{lp}output.dense.bias"] = r(hs)
        sd[f"{lp}output.LayerNorm.weight"] = r(hs)
        sd[f"{lp}output.LayerNorm.bias"] = r(hs)
    return sd


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_ctvit_converter_matches_init_tree():
    cfg = _vit_cfg()
    model = CTViT(cfg)
    video = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size, 1))
    variables = model.init(jax.random.PRNGKey(0), video)

    params, vq = ctvit_params_from_torch(synth_ctvit_sd(cfg), cfg)
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    assert _tree_shapes(vq) == _tree_shapes(variables["vq"])
    # converted weights actually run
    out = model.apply({"params": params, "vq": vq}, video,
                      return_encoded_tokens=True)
    assert out.shape == (1, 2, 2, 2, cfg.dim)
    assert np.isfinite(np.asarray(out)).all()


def test_full_ctclip_converter():
    vit_cfg = _vit_cfg()
    bert_cfg = BertConfig(vocab_size=32, hidden_size=24, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=48,
                          max_position_embeddings=16)
    hw = vit_cfg.image_size // vit_cfg.patch_size
    cfg = CTCLIPConfig(dim_text=24, dim_image=hw * hw * vit_cfg.dim,
                       dim_latent=12, ctvit=vit_cfg, bert=bert_cfg)

    rng = np.random.RandomState(2)
    r = lambda *s: rng.randn(*s).astype(np.float32)
    sd = {}
    sd.update(synth_ctvit_sd(vit_cfg, prefix="visual_transformer.", rng=rng))
    sd.update(synth_bert_sd(bert_cfg, prefix="text_transformer.", rng=rng))
    sd["to_text_latent.weight"] = r(cfg.dim_latent, cfg.dim_text)
    sd["to_visual_latent.weight"] = r(cfg.dim_latent, cfg.dim_image)
    sd["to_text_latent_extra.weight"] = r(cfg.dim_latent, cfg.dim_text)
    sd["to_visual_latent_extra.weight"] = r(cfg.dim_latent, cfg.dim_image)
    sd["temperature"] = np.asarray(1.0, np.float32)

    variables = ctclip_params_from_torch(sd, cfg)
    model = CTCLIP(cfg)
    video = jnp.zeros((2, vit_cfg.num_frames, vit_cfg.image_size,
                       vit_cfg.image_size, 1))
    ids = jnp.zeros((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    init_vars = model.init(jax.random.PRNGKey(0), ids, mask, video,
                           return_loss=True)
    assert _tree_shapes(variables["params"]) == _tree_shapes(init_vars["params"])
    loss = model.apply(variables, ids, mask, video, return_loss=True)
    assert np.isfinite(float(loss))
