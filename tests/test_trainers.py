"""CTViT (VQGAN-style) and MaskGIT trainer integration tests."""
import numpy as np

import jax
import jax.numpy as jnp

from ct_clip_tpu.config import CTViTConfig, MaskGitConfig
from ct_clip_tpu.models import CTViT, MaskGit, TokenCritic
from ct_clip_tpu.train.ctvit_trainer import (CTViTTrainer, ema_update,
                                             group_by_frame_count)
from ct_clip_tpu.train.maskgit_trainer import MaskGitTrainer

VIT = CTViTConfig(dim=16, codebook_size=12, image_size=16, patch_size=8,
                  temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
                  dim_head=4, heads=2, num_frames=4, with_decoder=True)


def _video(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, VIT.num_frames, VIT.image_size,
                                 VIT.image_size, 1).astype(np.float32))


def test_ctvit_trainer_reduces_recon_loss(tmp_path):
    trainer = CTViTTrainer(CTViT(VIT), lr=3e-3, ema_update_every=1,
                           results_folder=str(tmp_path), save_model_every=5,
                           save_results_every=1000)
    video = _video()
    losses = [trainer.train_step(video)["recon_loss"] for _ in range(8)]
    assert losses[-1] < losses[0]
    # EMA params differ from live params but share structure
    assert jax.tree.structure(trainer.state["ema_params"]) == \
        jax.tree.structure(trainer.state["params"])
    # recon dump writes a nifti
    trainer.dump_reconstruction(video)
    assert list(tmp_path.glob("recon_*.nii.gz"))


def test_ctvit_trainer_with_discriminator(tmp_path):
    trainer = CTViTTrainer(CTViT(VIT), lr=1e-3, use_discr=True,
                           generator_steps=2, results_folder=str(tmp_path))
    logs = trainer.train_step(_video())
    assert "discr_loss" in logs and np.isfinite(logs["discr_loss"])


def test_ema_update():
    a = {"w": jnp.ones(3)}
    b = {"w": jnp.zeros(3)}
    out = ema_update(a, b, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_group_by_frame_count():
    items = [10, 10, 20, 10, 20]
    batches = list(group_by_frame_count(items, key=lambda x: x, batch_size=2))
    flat = [i for b in batches for i in b]
    assert sorted(flat) == [0, 1, 2, 3, 4]
    for b in batches:
        counts = {items[i] for i in b}
        assert len(counts) == 1  # same bucket within a batch


def test_maskgit_trainer_step_and_sample(tmp_path):
    vit = CTViT(VIT)
    video = _video()
    vit_vars = vit.init(jax.random.PRNGKey(0), video)
    gcfg = MaskGitConfig(dim=16, depth=1, dim_head=4, heads=2, max_seq_len=32,
                         t5_dim=8, unconditional=True)
    trainer = MaskGitTrainer(MaskGit(gcfg, num_tokens=VIT.codebook_size), vit,
                             vit_vars, lr=1e-3, first_cycle_steps=10,
                             warmup_steps=2, results_folder=str(tmp_path))
    ids = trainer.encode_ids(video)
    grid = tuple(ids.shape[1:])
    logs = [trainer.train_step(ids, grid) for _ in range(3)]
    assert all(np.isfinite(l["loss"]) for l in logs)
    assert logs[0]["lr"] < logs[2]["lr"] <= trainer.lr * (1 + 1e-5)  # warmup

    out = trainer.sample(grid, batch_size=1, steps=2)
    assert out.shape == (1, VIT.num_frames, VIT.image_size, VIT.image_size, 1)


def test_maskgit_trainer_with_critic(tmp_path):
    vit = CTViT(VIT)
    video = _video()
    vit_vars = vit.init(jax.random.PRNGKey(0), video)
    gcfg = MaskGitConfig(dim=16, depth=1, dim_head=4, heads=2, max_seq_len=32,
                         t5_dim=8, unconditional=True)
    critic = TokenCritic(gcfg, num_tokens=VIT.codebook_size)
    trainer = MaskGitTrainer(MaskGit(gcfg, num_tokens=VIT.codebook_size), vit,
                             vit_vars, critic=critic, lr=1e-3,
                             results_folder=str(tmp_path))
    ids = trainer.encode_ids(video)
    grid = tuple(ids.shape[1:])
    logs = trainer.train_step(ids, grid)
    assert np.isfinite(logs["critic_loss"]) and logs["critic_loss"] > 0


def test_ctclip_trainer_e2e_with_auto_resume(tmp_path):
    """The main pretraining harness end-to-end on a tiny synthetic corpus:
    loop + metrics JSONL + mini zero-shot eval + Orbax ckpt, then a fresh
    trainer auto-resumes from the latest checkpoint (self-healing restart,
    SURVEY.md §5 failure-recovery gap in the reference)."""
    import jax.numpy as jnp
    import numpy as np

    from tests.test_data import _make_dataset, VOCAB
    from ct_clip_tpu import (BertConfig, CTCLIPConfig, CTViTConfig,
                             TrainConfig)
    from ct_clip_tpu.data import (CTReportDataset, CTReportDatasetInfer,
                                  WordPieceTokenizer)
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.train import CTClipTrainer

    data, reports, meta, labels = _make_dataset(tmp_path, n=2,
                                                with_labels=True)
    train_ds = CTReportDataset(data, reports, meta, percent=100)
    valid_ds = CTReportDatasetInfer(data, reports, meta, labels)
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n")
    tok = WordPieceTokenizer(str(vocab_path))

    ctvit = CTViTConfig(dim=8, codebook_size=16, image_size=32,
                        patch_size=16, temporal_patch_size=4,
                        num_frames=8, spatial_depth=1, temporal_depth=1,
                        dim_head=4, heads=2)
    bert = BertConfig(vocab_size=len(VOCAB), hidden_size=8,
                      num_hidden_layers=1, num_attention_heads=2,
                      intermediate_size=16, max_position_embeddings=512)
    hw = ctvit.image_size // ctvit.patch_size
    cfg = CTCLIPConfig(dim_text=8, dim_image=hw * hw * ctvit.dim,
                       dim_latent=8, ctvit=ctvit, bert=bert,
                       gather_negatives=False)
    tcfg = TrainConfig(batch_size=1, lr=1e-4, num_train_steps=2,
                       save_results_every=2, save_model_every=2,
                       compute_dtype="float32")

    def cheap_preprocess(sample, clip_before):
        from ct_clip_tpu.data.generatect import resize_video
        vol = np.clip(sample.vol + sample.intercept, -1000, 1000) / 1000.0
        return jnp.asarray(resize_video(vol, (8, 32, 32)).astype(np.float32))

    trainer = CTClipTrainer(CTCLIP(cfg), tok, train_dataset=train_ds,
                            valid_dataset=valid_ds, config=tcfg,
                            results_folder=str(tmp_path / "run"),
                            num_workers=1, preprocess_fn=cheap_preprocess)
    state = trainer.train()
    assert int(state.step) == 2
    metrics = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    assert len(metrics) >= 2
    evals = list((tmp_path / "run").glob("mini_eval_step*.*"))
    assert evals, "mini zero-shot eval CSV missing"
    assert trainer.ckpt.latest_step == 2

    # fresh trainer resumes from the checkpoint and continues to step 3
    trainer2 = CTClipTrainer(CTCLIP(cfg), tok, train_dataset=train_ds,
                             valid_dataset=None,
                             config=tcfg.replace(num_train_steps=3),
                             results_folder=str(tmp_path / "run"),
                             num_workers=1, preprocess_fn=cheap_preprocess)
    state2 = trainer2.train()
    assert int(state2.step) == 3


def test_ctclip_trainer_patch_rows_mesh_matches_volume_loss(tmp_path):
    """CTClipTrainer's patch-rows ingest (patch_rows=True: preprocess emits
    (n_tokens, patch_dim) rows, stacked per batch and sharded over the mesh
    `data` axis) must reproduce the volume-input path's training loss on the
    8-virtual-device CPU mesh — the multi-device coverage of the trainer
    auto-mode (trainer.py patch_rows; ref: scripts/CTCLIPTrainer.py:178-193
    prepared-dataloader equivalent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_data import _make_dataset, VOCAB
    from ct_clip_tpu import TrainConfig
    from ct_clip_tpu.data import CTReportDataset, WordPieceTokenizer
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.train import CTClipTrainer

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest)")

    data, reports, meta, _ = _make_dataset(tmp_path, n=8)
    train_ds = CTReportDataset(data, reports, meta, percent=100)
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n")
    tok = WordPieceTokenizer(str(vocab_path))

    cfg = _tiny_clip_cfg()
    tcfg = TrainConfig(batch_size=8, lr=1e-4, num_train_steps=1,
                       save_results_every=100, save_model_every=100,
                       compute_dtype="float32")

    def run(patch_rows, folder):
        trainer = CTClipTrainer(CTCLIP(cfg), tok, train_dataset=train_ds,
                                config=tcfg, results_folder=str(folder),
                                num_workers=1, patch_rows=patch_rows)
        batch = next(trainer._batches())
        v = cfg.ctvit
        n_tok = ((v.num_frames // v.temporal_patch_size)
                 * (v.image_size // v.patch_size) ** 2)
        if patch_rows:
            assert batch["video"].shape == (8, n_tok, v.patch_dim)
        else:
            assert batch["video"].shape == (8, v.num_frames, v.image_size,
                                            v.image_size, 1)
        with trainer.mesh:
            trainer._init_state(batch)
            rng = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed), 0)
            state, metrics = trainer.step_fn(trainer.state, batch, rng)
        return float(metrics["loss"])

    loss_rows = run(True, tmp_path / "rows")
    loss_vol = run(False, tmp_path / "vol")
    assert np.isfinite(loss_rows)
    np.testing.assert_allclose(loss_rows, loss_vol, rtol=2e-5, atol=2e-5)


def _tiny_clip_cfg():
    from ct_clip_tpu import BertConfig, CTCLIPConfig, CTViTConfig

    ctvit = CTViTConfig(dim=8, codebook_size=16, image_size=32, patch_size=16,
                        temporal_patch_size=4, num_frames=8, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=2)
    bert = BertConfig(vocab_size=32, hidden_size=8, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=16,
                      max_position_embeddings=512)
    hw = ctvit.image_size // ctvit.patch_size
    return CTCLIPConfig(dim_text=8, dim_image=hw * hw * ctvit.dim,
                        dim_latent=8, ctvit=ctvit, bert=bert,
                        gather_negatives=False)


def test_trainconfig_remat_rewires_towers(tmp_path):
    """TrainConfig(remat=True) must actually flip the per-block jax.checkpoint
    toggles on both towers (round-1 regression: the rewiring block was dead
    code inside the batch generator; reference toggle ct_clip.py:64-74)."""
    from ct_clip_tpu import TrainConfig
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.train import CTClipTrainer

    cfg = _tiny_clip_cfg()
    model = CTCLIP(cfg)
    assert not model.config.ctvit.remat and not model.config.bert.remat
    trainer = CTClipTrainer(model, tokenizer=None, train_dataset=None,
                            config=TrainConfig(remat=True),
                            results_folder=str(tmp_path))
    assert trainer.model.config.ctvit.remat
    assert trainer.model.config.bert.remat
    # without the flag the model passes through untouched (same object)
    trainer2 = CTClipTrainer(model, tokenizer=None, train_dataset=None,
                             config=TrainConfig(remat=False),
                             results_folder=str(tmp_path))
    assert trainer2.model is model


def test_mini_eval_reuses_compiled_classifier(tmp_path):
    """The second _mini_eval must not build fresh jit closures: the hoisted
    ZeroShotClassifier is reused with swapped weights, so the image-tower
    compile count stays at 1 across evals (round-1 weakness: a fresh
    classifier per eval recompiled the full tower every 100 steps)."""
    from tests.test_data import _make_dataset, VOCAB
    from ct_clip_tpu import TrainConfig
    from ct_clip_tpu.data import CTReportDataset, CTReportDatasetInfer, \
        WordPieceTokenizer
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.train import CTClipTrainer

    data, reports, meta, labels = _make_dataset(tmp_path, n=2,
                                                with_labels=True)
    train_ds = CTReportDataset(data, reports, meta, percent=100)
    valid_ds = CTReportDatasetInfer(data, reports, meta, labels)
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n")
    tok = WordPieceTokenizer(str(vocab_path))

    cfg = _tiny_clip_cfg().replace(bert=_tiny_clip_cfg().bert.replace(
        vocab_size=len(VOCAB)))
    tcfg = TrainConfig(batch_size=1, lr=1e-4, num_train_steps=4,
                       save_results_every=2, save_model_every=100,
                       compute_dtype="float32")

    def cheap_preprocess(sample, clip_before):
        from ct_clip_tpu.data.generatect import resize_video
        vol = np.clip(sample.vol + sample.intercept, -1000, 1000) / 1000.0
        return jnp.asarray(resize_video(vol, (8, 32, 32)).astype(np.float32))

    trainer = CTClipTrainer(CTCLIP(cfg), tok, train_dataset=train_ds,
                            valid_dataset=valid_ds, config=tcfg,
                            results_folder=str(tmp_path / "run"),
                            num_workers=1, preprocess_fn=cheap_preprocess)
    trainer.train()  # 4 steps -> mini-eval at steps 2 and 4
    evals = list((tmp_path / "run").glob("mini_eval_step*.*"))
    assert len(evals) == 2, "expected two mini evals"
    clf = trainer._zero_shot
    assert clf is not None
    # one traced/compiled instance of each eval closure across both evals
    assert clf._encode_image._cache_size() == 1
    assert clf._encode_text._cache_size() == 1
