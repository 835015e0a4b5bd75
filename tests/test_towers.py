"""Fallback built-in towers (ct_clip.py:290-385) standalone and injected
into CTCLIP (the reference's no-external-encoder capability)."""
import numpy as np

import jax
import jax.numpy as jnp

from ct_clip_tpu import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_tpu.models import CTCLIP
from ct_clip_tpu.models.towers import (TextTransformer, VisionTransformer,
                                       patch_dropout)


def test_text_transformer_cls_prepend_and_shapes():
    model = TextTransformer(dim=32, num_tokens=50, max_seq_len=16, depth=2,
                            dim_head=8, heads=4)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 10)))
    v = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (2, 11, 32)  # CLS prepended
    assert "cls_token" in v["params"]


def test_text_transformer_rotary_and_causal():
    model = TextTransformer(dim=32, num_tokens=50, max_seq_len=16, depth=1,
                            dim_head=8, heads=4, causal=True,
                            rotary_pos_emb=True)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 50, (2, 10)))
    v = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (2, 10, 32)  # causal: no CLS prepend
    assert "abs_pos_emb" not in v["params"]
    # causality: changing a later token must not affect earlier outputs
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % 50)
    out2 = model.apply(v, ids2)
    assert np.allclose(np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]),
                       atol=1e-5)


def test_patch_dropout_keeps_expected_count():
    x = jnp.asarray(np.random.RandomState(2).randn(3, 16, 8).astype(np.float32))
    kept = patch_dropout(jax.random.PRNGKey(0), x, 0.5)
    assert kept.shape == (3, 8, 8)
    # kept rows are a subset of input rows
    for b in range(3):
        src = {tuple(np.round(r, 5)) for r in np.asarray(x[b])}
        for r in np.asarray(kept[b]):
            assert tuple(np.round(r, 5)) in src


def test_vision_transformer_shapes_and_dropout_path():
    model = VisionTransformer(dim=32, image_size=32, patch_size=8, channels=1,
                              depth=1, dim_head=8, heads=4,
                              patch_dropout_prob=0.5)
    imgs = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 1)
                       .astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(v, imgs)
    assert out.shape == (2, 1 + 16, 32)  # CLS + 4x4 patches
    out_tr = model.apply(v, imgs, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_tr.shape == (2, 1 + 8, 32)  # half the patches kept


def test_ctclip_with_injected_fallback_towers():
    """CTCLIP built from the fallback towers — loss + pair scoring work."""
    dim = 32
    text_tower = TextTransformer(dim=dim, num_tokens=64, max_seq_len=16,
                                 depth=1, dim_head=8, heads=4)
    image_tower = VisionTransformer(dim=dim, image_size=32, patch_size=8,
                                    channels=1, depth=1, dim_head=8, heads=4,
                                    patch_dropout_prob=0.0)
    cfg = CTCLIPConfig(dim_text=dim, dim_image=dim, dim_latent=16,
                       gather_negatives=False,
                       ctvit=CTViTConfig(dim=8, image_size=8, patch_size=8,
                                         temporal_patch_size=1, num_frames=1,
                                         spatial_depth=1, temporal_depth=1),
                       bert=BertConfig(vocab_size=64, hidden_size=dim,
                                       num_hidden_layers=1,
                                       num_attention_heads=4,
                                       intermediate_size=64))
    model = CTCLIP(cfg, text_encoder=text_tower, image_encoder=image_tower)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(0, 64, (2, 10)))
    mask = jnp.ones((2, 10), jnp.int32)
    imgs = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), ids, mask, imgs, return_loss=True)
    # no production towers built when encoders are injected
    assert "text_transformer" not in v["params"]
    assert "visual_transformer" not in v["params"]
    loss = model.apply(v, ids, mask, imgs, return_loss=True)
    assert np.isfinite(float(loss))
    scores = model.apply(v, ids, mask, imgs, return_loss=False)
    assert scores.shape == (2,)
