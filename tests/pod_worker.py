"""Worker for the true 2-process pod test (launched by test_pod_2proc.py).

Each process calls `jax.distributed.initialize` against a shared local
coordinator, sees 4 local + 8 global CPU devices, and runs the REAL
multi-host path: disjoint loader shards -> `assemble_global_batch` with
genuinely non-addressable remote shards -> the shared pjit train step ->
a collective Orbax checkpoint into a shared results folder, with host-side
artifacts gated on process 0 (parallel/multihost.py; reference capability:
`accelerate launch` multi-node, scripts/README.md:16-26).

Usage: python pod_worker.py <process_id> <port> <corpus_dir> <out_dir>
"""
import json
import os
import sys


def main() -> None:
    pid, port, corpus, out_dir = (int(sys.argv[1]), sys.argv[2],
                                  sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid,
                               local_device_ids=list(range(4)))
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp

    from ct_clip_tpu import BertConfig, CTCLIPConfig, CTViTConfig, TrainConfig
    from ct_clip_tpu.data import CTReportDataset, WordPieceTokenizer
    from ct_clip_tpu.data.generatect import resize_video
    from ct_clip_tpu.models import CTCLIP
    from ct_clip_tpu.parallel.multihost import (is_main_process,
                                                shard_indices_for_process)
    from ct_clip_tpu.train import CTClipTrainer

    # disjoint strided epoch split (the DistributedSampler contract)
    shard = shard_indices_for_process(list(range(4)))

    vocab_path = os.path.join(corpus, "vocab.txt")
    n_vocab = len(open(vocab_path).read().splitlines())
    tok = WordPieceTokenizer(vocab_path)
    train_ds = CTReportDataset(os.path.join(corpus, "data"),
                               os.path.join(corpus, "reports.csv"),
                               os.path.join(corpus, "meta.csv"), percent=100)

    ctvit = CTViTConfig(dim=8, codebook_size=16, image_size=32,
                        patch_size=16, temporal_patch_size=4, num_frames=8,
                        spatial_depth=1, temporal_depth=1, dim_head=4,
                        heads=2)
    bert = BertConfig(vocab_size=n_vocab, hidden_size=8, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=16,
                      max_position_embeddings=512)
    hw = ctvit.image_size // ctvit.patch_size
    cfg = CTCLIPConfig(dim_text=8, dim_image=hw * hw * ctvit.dim,
                       dim_latent=8, ctvit=ctvit, bert=bert)
    # batch 8 = one row per device of the 8-wide data axis (4 local rows)
    tcfg = TrainConfig(batch_size=8, lr=1e-4, num_train_steps=2,
                       save_results_every=1000, save_model_every=2,
                       compute_dtype="float32")

    def cheap_preprocess(sample, clip_before):
        vol = np.clip(sample.vol + sample.intercept, -1000, 1000) / 1000.0
        return jnp.asarray(resize_video(vol, (8, 32, 32)).astype(np.float32))

    trainer = CTClipTrainer(CTCLIP(cfg), tok, train_dataset=train_ds,
                            config=tcfg, results_folder=os.path.join(
                                out_dir, "run"),
                            num_workers=1, preprocess_fn=cheap_preprocess)
    state = trainer.train(auto_resume=False)
    assert int(state.step) == 2

    # one extra collective step on a fresh global batch: both processes see
    # the SAME replicated loss from the same pjit computation (donates
    # trainer.state — training is over)
    batch = next(trainer._batches())
    local_rows = sum(
        int(np.prod(s.data.shape[:1]))
        for s in batch["video"].addressable_shards)
    with trainer.mesh:
        _, metrics = trainer.step_fn(
            trainer.state, batch, jax.random.PRNGKey(123))
        extra_loss = float(metrics["loss"])

    json.dump({
        "process": pid,
        "is_main": bool(is_main_process()),
        "shard": [int(i) for i in shard],
        "local_batch_rows": local_rows,
        "extra_loss": extra_loss,
        "ckpt_step": int(trainer.ckpt.latest_step),
    }, open(os.path.join(out_dir, f"result_{pid}.json"), "w"))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
