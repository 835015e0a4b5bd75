"""GenerateCT data layer + MaskGIT pipeline orchestration + latent export."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_tpu.config import BertConfig, CTViTConfig, MaskGitConfig
from ct_clip_tpu.data.generatect import (VideoDataset, VideoTextDataset,
                                         VideoTextDatasetSuperres,
                                         resize_video)
from ct_clip_tpu.data.nifti import write_volume


def _write_corpus(tmp_path, n=2, z=30, manufacturer=None, smooth=False):
    rng = np.random.RandomState(0)
    for i in range(n):
        if smooth:
            gx, gy, gz = np.meshgrid(np.linspace(0, 1, 20),
                                     np.linspace(0, 1, 22),
                                     np.linspace(0, 1, z), indexing="ij")
            vol = (500 + 900 * gx + 300 * gy + 200 * gz).astype(np.int16)
        else:
            vol = rng.randint(0, 2000, size=(20, 22, z)).astype(np.int16)
        nii = tmp_path / f"scan_{i}.nii.gz"
        write_volume(nii, vol)
        meta = {"RescaleSlope": 1.0, "RescaleIntercept": -1024.0}
        if manufacturer:
            meta["Manufacturer"] = manufacturer
        (tmp_path / f"scan_{i}.json").write_text(json.dumps(meta))


def test_resize_video_matches_torch_trilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    vid = rng.randn(13, 17, 19).astype(np.float32)
    out = resize_video(vid, (8, 12, 16))
    ref = F.interpolate(torch.tensor(vid)[None, None], size=(8, 12, 16),
                        mode="trilinear", align_corners=False)[0, 0].numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_videotext_dataset_normalization_and_flip(tmp_path):
    _write_corpus(tmp_path, n=1)
    ds = VideoTextDataset(str(tmp_path), num_frames=10, image_size=16)
    assert len(ds) == 1
    s = ds[0]
    assert s.video.shape == (10, 16, 16)
    assert s.video.min() >= -1.0 and s.video.max() <= 1.0

    # PNMS flips slice order (videotextdataset.py:100-106)
    flip_dir = tmp_path / "pnms"
    flip_dir.mkdir()
    _write_corpus(flip_dir, n=1, manufacturer="PNMS")
    ds_f = VideoTextDataset(str(flip_dir), num_frames=10, image_size=16)
    np.testing.assert_allclose(ds_f[0].video, s.video[::-1], atol=1e-6)


def test_superres_pair_same_normalization(tmp_path):
    # smooth volume: downsampled high-res must closely match the low-res view
    _write_corpus(tmp_path, n=1, smooth=True)
    ds = VideoTextDatasetSuperres(str(tmp_path), num_frames=8, low_size=8,
                                  high_size=16)
    low, high = ds[0]
    assert low.video.shape == (8, 8, 8)
    assert high.video.shape == (8, 16, 16)
    # downsampling the high-res view must land near the low-res view —
    # both go through the same HU rescale/flip/clip normalization
    down = resize_video(high.video, (8, 8, 8))
    assert float(np.abs(down - low.video).mean()) < 0.02


def test_video_dataset_slice_filter(tmp_path):
    _write_corpus(tmp_path, n=1, z=30)    # below min 100
    sub = tmp_path / "big"
    sub.mkdir()
    _write_corpus(sub, n=1, z=120)
    ds = VideoDataset(str(tmp_path), num_frames=6, image_size=8,
                      min_slices=100, max_slices=600)
    assert len(ds) == 1
    assert ds[0].shape == (6, 8, 8)


@pytest.fixture(scope="module")
def tiny_stack():
    from ct_clip_tpu.models import CTViT, MaskGit

    cfg = CTViTConfig(dim=16, codebook_size=32, image_size=16, patch_size=8,
                      temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
                      dim_head=8, heads=2, num_frames=4, with_decoder=True)
    ctvit = CTViT(cfg)
    video = jnp.zeros((1, 4, 16, 16, 1))
    cv = ctvit.init(jax.random.PRNGKey(0), video)

    mcfg = MaskGitConfig(dim=16, depth=1, dim_head=8, heads=2,
                         max_seq_len=64, t5_dim=16)
    mg = MaskGit(mcfg, num_tokens=cfg.codebook_size)
    ids = jnp.zeros((1, 8), jnp.int32)
    ctx = jnp.zeros((1, 3, 16))
    mv = mg.init(jax.random.PRNGKey(1), ids, (2, 2, 2), context=ctx)
    return cfg, ctvit, cv, mg, mv


def test_pipeline_sample_and_make_video(tiny_stack):
    from ct_clip_tpu.models.pipeline import MaskGITPipeline

    cfg, ctvit, cv, mg, mv = tiny_stack

    def embed(texts):
        rng = np.random.RandomState(len(texts))
        return rng.randn(len(texts), 3, 16).astype(np.float32)

    pipe = MaskGITPipeline(ctvit=ctvit, ctvit_variables=cv, maskgit=mg,
                           maskgit_variables=mv, text_embed_fn=embed,
                           steps=2, cond_scale=1.5)
    video = pipe.sample(num_frames=4, texts=["a"], rng=jax.random.PRNGKey(0))
    assert video.shape == (1, 4, 16, 16, 1)

    full, scenes = pipe.make_video(["a", "b"], num_frames=2, prime_lengths=2)
    assert len(scenes) == 2
    assert full.shape[1] == 4  # 2 scenes x 2 frames


def test_bert_text_embedder_contract():
    from ct_clip_tpu.data.tokenizer import WordPieceTokenizer
    from ct_clip_tpu.models import BertModel
    from ct_clip_tpu.models.t5 import bert_text_embedder

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "lung", "clear"]
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(vocab))
        path = f.name
    tok = WordPieceTokenizer(path)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=8,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=16, max_position_embeddings=16,
                     with_pooler=False)
    model = BertModel(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    embed = bert_text_embedder(model, v, tok, max_length=16)
    out = embed(["lung clear", "clear"])
    assert out.shape == (2, 16, 8)
    # pad rows zeroed (the t5.py:101-103 contract)
    enc = tok(["lung clear", "clear"], padding="max_length", truncation=True,
              max_length=16)
    mask = np.asarray(enc["attention_mask"])
    assert np.all(out[mask == 0] == 0)
    os.unlink(path)


def test_run_zero_shot_patch_rows_matches_volume_path(tmp_path):
    """run_zero_shot with patch_rows=True (fused batch-slot ingest,
    preprocess_sample_rows_into + double buffer, incl. a tail batch) must
    produce the same predictions as the volume-input path."""
    from tests.test_data import _make_dataset
    from tests.test_training import tiny_cfg
    from ct_clip_tpu.data import CTReportDatasetInfer
    from ct_clip_tpu.data.tokenizer import WordPieceTokenizer
    from ct_clip_tpu.inference import run_zero_shot
    from ct_clip_tpu.models import CTCLIP

    data, reports, meta, labels = _make_dataset(tmp_path, n=3,
                                                with_labels=True)
    ds = CTReportDatasetInfer(data, reports, meta, labels)

    cfg = tiny_cfg(gather_negatives=False)
    ct = cfg.ctvit.replace(image_size=32, patch_size=8, num_frames=16,
                           temporal_patch_size=4, dim=8, codebook_size=16,
                           dim_head=4, heads=2)
    hw = ct.image_size // ct.patch_size
    cfg = cfg.replace(ctvit=ct, dim_image=hw * hw * ct.dim, dim_latent=8)
    model = CTCLIP(cfg)
    ids = jnp.zeros((1, 12), jnp.int32)
    video = jnp.zeros((1, 16, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids),
                           video, return_loss=False)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "is", "present",
             "not", "##ly"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = WordPieceTokenizer(str(vp))

    # batch 2 over 3 volumes -> one full batch + a tail batch
    outs = {}
    for rows in (False, True):
        outs[rows] = run_zero_shot(model, variables, tok, ds,
                                   str(tmp_path / f"zs_{rows}"),
                                   batch_size=2, num_workers=1,
                                   save_artifacts=False, patch_rows=rows)
    assert outs[True]["accessions"] == outs[False]["accessions"]
    assert outs[True]["predicted"].shape == (3, 18)
    np.testing.assert_allclose(outs[True]["predicted"],
                               outs[False]["predicted"], atol=2e-5)


def test_export_latents(tmp_path):
    """forward_data.py equivalent: text latent + pre-pool token grid npz."""
    from tests.test_training import tiny_cfg  # reuse tiny config factory
    from ct_clip_tpu.data import CTReportDatasetInfer
    from ct_clip_tpu.data.tokenizer import WordPieceTokenizer
    from ct_clip_tpu.inference.latents import export_latents
    from ct_clip_tpu.models import CTCLIP
    from tests.test_data import _make_dataset

    data, reports, meta, labels = _make_dataset(tmp_path, n=2,
                                                with_labels=True)
    ds = CTReportDatasetInfer(data, reports, meta, labels)

    cfg = tiny_cfg(gather_negatives=False)
    # small preprocess target grid (export_latents target_shape override)
    # keeps this CPU-fast; the production default is (240, 480, 480)
    ct = cfg.ctvit.replace(image_size=32, patch_size=8, num_frames=16,
                           temporal_patch_size=4, dim=8, codebook_size=16,
                           dim_head=4, heads=2)
    hw = ct.image_size // ct.patch_size
    cfg = cfg.replace(ctvit=ct, dim_image=hw * hw * ct.dim, dim_latent=8)
    model = CTCLIP(cfg)
    ids = jnp.zeros((1, 12), jnp.int32)
    video = jnp.zeros((1, 16, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids),
                           video, return_loss=False, return_latents=True)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "findings",
             "impression", "for", "volume"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = WordPieceTokenizer(str(vp))

    out = export_latents(model, variables, tok, ds, str(tmp_path / "lat"),
                         num_workers=1, max_text_len=12,
                         target_shape=(16, 32, 32))
    assert set(out["text"]) == {"vol_0", "vol_1"}
    t = ct.num_frames // ct.temporal_patch_size
    for acc, arr in out["image"].items():
        assert arr.shape == (t, hw, hw, ct.dim)
        saved = np.load(tmp_path / "lat" / "image_latents" / f"{acc}.npz")["arr"]
        np.testing.assert_array_equal(saved, arr)
