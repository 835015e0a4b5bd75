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
