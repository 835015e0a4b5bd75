"""CTClipTrainer: the contrastive pretraining harness.

Parity with scripts/CTCLIPTrainer.py:113-348 — infinite shuffled dataloader,
tokenize to 512, forward+backward with grad-clip 0.5 and Adam at constant
lr 1.25e-6, periodic mini zero-shot eval on validation volumes with AUROC
dump, periodic checkpointing — mapped TPU-first:

  * host threads only read/gunzip NIfTI; the voxel math is the fused device
    preprocess kernel (ops/resample.py);
  * the train step is one jit-compiled function over the mesh (batch sharded
    on `data`, pod-wide negatives via all-gather, bf16 compute);
  * checkpoints are sharded Orbax, metrics stream to JSONL, and
    jax.profiler traces can be captured around any step window
    (SURVEY.md §5 tracing gap).
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATHOLOGIES, CTCLIPConfig, TrainConfig
from ..utils import stack_standard
from ..data.datasets import CTReportDataset, CTReportDatasetInfer
from ..data.loader import VolumeLoader, preprocess_sample
from ..models.ctclip import CTCLIP
from ..parallel.mesh import make_mesh, shard_opt_state, shard_params
from .checkpoint import CheckpointManager
from .optimizer import get_optimizer
from .train_step import TrainState, create_train_state, make_train_step


class MetricLogger:
    """JSONL metrics stream + stdout (reference prints only,
    CTCLIPTrainer.py:264)."""

    def __init__(self, path: Optional[str] = None, quiet: bool = False):
        self.path = Path(path) if path else None
        self.quiet = quiet
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        if self.path:
            # open-per-record: writes are rare relative to step time and the
            # stream stays leak-free without trainer teardown hooks
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if not self.quiet:
            msg = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in metrics.items())
            print(f"step {step}: {msg}", flush=True)


class CTClipTrainer:
    def __init__(self, model: CTCLIP, tokenizer, *,
                 train_dataset: CTReportDataset,
                 valid_dataset: Optional[CTReportDatasetInfer] = None,
                 config: TrainConfig = TrainConfig(),
                 results_folder: str = "./results",
                 num_workers: int = 8,
                 profile_steps: Optional[tuple] = None,
                 preprocess_fn=None,
                 patch_rows: Optional[bool] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.cfg = config
        if config.remat and not (model.config.ctvit.remat
                                 and model.config.bert.remat):
            # enable per-block jax.checkpoint on both towers; parameter
            # structure is unchanged so converted/restored weights still fit
            # (reference toggle: CT_CLIP/ct_clip/ct_clip.py:64-74)
            mcfg = model.config.replace(
                ctvit=model.config.ctvit.replace(remat=True),
                bert=model.config.bert.replace(remat=True))
            self.model = CTCLIP(mcfg, dtype=model.dtype)
        self.train_ds = train_dataset
        self.valid_ds = valid_dataset
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.num_workers = num_workers
        self.profile_steps = profile_steps
        # RawSample -> (d, h, w) device array; default is the fused
        # production kernel.  Override for custom geometries/pipelines.
        # patch_rows (auto on TPU unless the model needs the raw video):
        # ingest emits patch-major rows, so every train step skips the
        # patchify shuffle (~1.4 ms/volume; paid once here instead).
        import jax as _jax
        if patch_rows is None:
            patch_rows = (_jax.default_backend() == "tpu"
                          and preprocess_fn is None
                          and self.model.image_encoder is None
                          and not self.model.config.use_visual_ssl)
        self.patch_rows = patch_rows
        # boolean, not a bound-method identity check: `self._preprocess is
        # self._rows_preprocess` is ALWAYS False (each attribute access
        # builds a fresh bound method) — found in round-5 review
        self._rows_ingest = patch_rows and preprocess_fn is None
        if self._rows_ingest:
            self._preprocess = self._rows_preprocess
        else:
            self._preprocess = preprocess_fn or self._default_preprocess

        self.mesh = make_mesh(config.mesh)
        self.tx = get_optimizer(lr=config.lr, wd=config.wd,
                                max_grad_norm=config.max_grad_norm)
        self.step_fn = None  # compiled lazily on first batch
        self.state: Optional[TrainState] = None
        # host-side artifacts come from process 0 only; checkpoints stay
        # collective (Orbax writes every host's shards, parallel/multihost.py)
        from ..parallel.multihost import is_main_process
        self._is_main = is_main_process()
        self.logger = MetricLogger(
            self.results_folder / "metrics.jsonl" if self._is_main else None,
            quiet=not self._is_main)
        self.ckpt = CheckpointManager(self.results_folder / "checkpoints")
        self._zero_shot = None  # hoisted eval classifier, compiled once

    def _model_target_shape(self):
        # the fused preprocess must emit exactly the geometry the image
        # tower consumes (production: 240, 480, 480)
        vcfg = self.model.config.ctvit
        return (vcfg.num_frames, vcfg.image_size, vcfg.image_size)

    def _default_preprocess(self, sample, clip_before_resample: bool):
        # int16 zyx raw samples: relayout + model-dtype cast ride the fused
        # preprocess; halves the host->device bytes vs scaled f32
        return preprocess_sample(sample, clip_before_resample,
                                 out_dtype=self.cfg.dtype,
                                 target_shape=self._model_target_shape())

    def _rows_preprocess(self, sample, clip_before_resample: bool):
        # patch-major rows: the patchify shuffle runs once at ingest
        from ..data.loader import preprocess_sample_rows

        vcfg = self.model.config.ctvit
        return preprocess_sample_rows(
            sample, clip_before_resample, out_dtype=self.cfg.dtype,
            temporal_patch_size=vcfg.temporal_patch_size,
            patch_size=vcfg.patch_size,
            target_shape=self._model_target_shape())

    # ------------------------------------------------------------------ data
    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite batches: host read -> device preprocess -> stack.

        Multi-host (after `jax.distributed.initialize()`): every process
        loads a disjoint `batch_size / process_count` slice of each global
        batch and the global sharded arrays are assembled with
        `jax.make_array_from_process_local_data` — the same jitted step
        then runs unmodified (parallel/multihost.py)."""
        from ..parallel.multihost import (assemble_global_batch,
                                          local_batch_size, process_count,
                                          process_index)

        pc = process_count()
        local_bs = local_batch_size(self.cfg.batch_size, pc)
        loader = VolumeLoader(self.train_ds, num_workers=self.num_workers,
                              prefetch=2 * local_bs, shuffle=True,
                              infinite=True, seed=self.cfg.seed,
                              process_index=process_index(),
                              process_count=pc,
                              raw_dtype=np.int16, raw_layout="zyx")
        if self._rows_ingest and pc == 1:
            yield from self._row_batches(loader, local_bs)
            return
        buf_v, buf_t = [], []
        for sample in loader:
            vol = self._preprocess(sample, self.train_ds.clip_before_resample)
            # rows ingest keeps the (n_tokens, patch_dim) shape; volumes get
            # the trailing channel dim the model's 5-D input expects
            buf_v.append(vol if self.patch_rows else vol[..., None])
            buf_t.append(sample.meta.text)
            if len(buf_v) == local_bs:
                enc = self.tokenizer(buf_t, padding="max_length",
                                     truncation=True, max_length=512)
                if pc > 1:
                    local = {
                        "video": np.stack([np.asarray(v) for v in buf_v])
                        .astype(self.cfg.dtype),
                        "input_ids": np.asarray(enc["input_ids"], np.int32),
                        "attention_mask": np.asarray(enc["attention_mask"],
                                                     np.int32),
                    }
                    yield assemble_global_batch(local, self.mesh,
                                                self.cfg.mesh.data_axis)
                else:
                    yield {
                        # standard-layout batch (see utils.stack_standard:
                        # plain stack goes compact on TPU and the train
                        # step pays a relayout copy of the 885 MB rows)
                        "video": stack_standard(buf_v, self.cfg.dtype),
                        "input_ids": jnp.asarray(enc["input_ids"]),
                        "attention_mask": jnp.asarray(enc["attention_mask"]),
                    }
                buf_v, buf_t = [], []

    def _row_batches(self, loader, local_bs: int):
        """Single-process patch-rows ingest, fused: each volume's rows are
        written straight into a (donated) batch-buffer slot
        (data/loader.preprocess_sample_rows_into) — one dispatch per volume,
        no host window + per-batch stack.  Triple-buffered so a slot write
        never donates a buffer the in-flight train step still reads."""
        import numpy as np

        from ..data.loader import preprocess_sample_rows_into
        from ..utils import device_put_standard

        vcfg = self.model.config.ctvit
        n_tok = ((vcfg.num_frames // vcfg.temporal_patch_size)
                 * (vcfg.image_size // vcfg.patch_size) ** 2)
        bufs = [device_put_standard(
            np.zeros((local_bs, n_tok, vcfg.patch_dim),
                     dtype=self.cfg.dtype)) for _ in range(3)]
        bi, slot, buf_t = 0, 0, []
        for sample in loader:
            bufs[bi] = preprocess_sample_rows_into(
                bufs[bi], slot, sample,
                self.train_ds.clip_before_resample,
                temporal_patch_size=vcfg.temporal_patch_size,
                patch_size=vcfg.patch_size,
                target_shape=self._model_target_shape())
            slot += 1
            buf_t.append(sample.meta.text)
            if slot == local_bs:
                enc = self.tokenizer(buf_t, padding="max_length",
                                     truncation=True, max_length=512)
                yield {
                    "video": bufs[bi],
                    "input_ids": jnp.asarray(enc["input_ids"]),
                    "attention_mask": jnp.asarray(enc["attention_mask"]),
                }
                bi = (bi + 1) % 3
                slot, buf_t = 0, []

    # ----------------------------------------------------------------- setup
    def _init_state(self, batch) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = create_train_state(self.model, jax.random.PRNGKey(self.cfg.seed),
                                   batch, self.tx)
        # every leaf gets an explicit mesh placement: params per the sharding
        # rules, optimizer moments following the params (tx.init on the
        # already-sharded tree), scalars/VQ replicated.  Explicit committed
        # shardings make Orbax restores land on the same layout, so resumed
        # states feed the jitted step without device conflicts.
        params = shard_params(state.params, self.mesh, self.cfg.mesh)
        # fsdp="zero1"/"full" additionally spreads the Adam moments over the
        # data axis (ZeRO; the reference's `accelerate launch --use_fsdp`)
        opt_state = shard_opt_state(self.tx.init(params), params,
                                    self.mesh, self.cfg.mesh)
        state = state.replace(params=params, opt_state=opt_state)
        repl = NamedSharding(self.mesh, P())

        def place(x):  # leaves without a mesh placement become replicated
            if isinstance(getattr(x, "sharding", None), NamedSharding):
                return x
            return jax.device_put(x, repl)

        self.state = jax.tree.map(place, state)
        raw_step = make_train_step(self.model, self.tx, self.cfg)
        # pin the output state to the input placement — otherwise e.g.
        # replicated params + zero1-sharded updates let GSPMD emit sharded
        # params, and the drifted placement recompiles the step once
        state_shardings = jax.tree.map(lambda x: x.sharding, self.state)
        self.step_fn = jax.jit(raw_step, donate_argnums=(0,),
                               out_shardings=(state_shardings, None))

    def load(self, step: Optional[int] = None) -> int:
        assert self.state is not None, "call train() or init on a batch first"
        self.state = self.ckpt.restore(self.state, step)
        return int(self.state.step)

    # ----------------------------------------------------------------- train
    def train(self, num_steps: Optional[int] = None, eval_fn=None,
              auto_resume: bool = True) -> TrainState:
        """Runs the loop.  `auto_resume=True` makes restarts self-healing:
        if checkpoints exist under the results folder, training silently
        continues from the latest one (the failure-recovery behavior the
        reference lacks — its resume is manual, SURVEY.md §5)."""
        num_steps = num_steps or self.cfg.num_train_steps
        batches = self._batches()
        t_last = time.time()
        with self.mesh:
            for batch in batches:
                if self.state is None:
                    self._init_state(batch)
                    if auto_resume and self.ckpt.latest_step is not None:
                        self.state = self.ckpt.restore(self.state)
                        self.logger.log(int(self.state.step),
                                        resumed_from=int(self.state.step))
                step = int(self.state.step)
                if step >= num_steps:
                    break
                if self.profile_steps and step == self.profile_steps[0]:
                    jax.profiler.start_trace(str(self.results_folder / "trace"))
                rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), step)
                self.state, metrics = self.step_fn(self.state, batch, rng)
                if self.profile_steps and step == self.profile_steps[1]:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()

                now = time.time()
                self.logger.log(step, loss=float(metrics["loss"]),
                                grad_norm=float(metrics["grad_norm"]),
                                temperature=float(metrics["temperature"]),
                                step_time=now - t_last)
                t_last = now

                next_step = step + 1
                if next_step % self.cfg.save_results_every == 0:
                    self._mini_eval(next_step, eval_fn)
                if next_step % self.cfg.save_model_every == 0:
                    self.ckpt.save(next_step, self.state)
        self.ckpt.wait()  # join any in-flight async checkpoint write
        return self.state

    # ------------------------------------------------------------------ eval
    def _mini_eval(self, step: int, eval_fn=None, num_volumes: int = 10):
        """In-training zero-shot AUROC on a few validation volumes
        (CTCLIPTrainer.py:266-327)."""
        if eval_fn is not None:
            eval_fn(self, step)
            return
        if self.valid_ds is None or len(self.valid_ds) == 0:
            return
        from ..evals.metrics import evaluate_internal
        from ..inference.zero_shot import ZeroShotClassifier

        variables = {"params": self.state.params, "vq": self.state.vq}
        if self._zero_shot is None:
            # compile the eval towers ONCE; later evals only swap weights
            # (fresh per-eval jit closures cost a full recompile — minutes
            # at production shape, CTCLIPTrainer.py:266-327 equivalent)
            self._zero_shot = ZeroShotClassifier(self.model, variables,
                                                 self.tokenizer)
        else:
            self._zero_shot.update_variables(variables)
        clf = self._zero_shot
        preds, labels = [], []
        loader = VolumeLoader(self.valid_ds, num_workers=self.num_workers,
                              prefetch=4, raw_dtype=np.int16,
                              raw_layout="zyx")
        for i, sample in enumerate(loader):
            if i >= num_volumes:
                break
            vol = self._preprocess(sample, self.valid_ds.clip_before_resample)
            batched = (vol[None] if self.patch_rows
                       else vol[None, ..., None])
            preds.append(clf.score_batch(batched.astype(self.cfg.dtype))[0])
            labels.append(sample.meta.labels)
        if not preds:
            return
        # compute above runs on every process (params are mesh-sharded, so
        # the jitted towers are collective); artifacts come from process 0
        if not self._is_main:
            return
        df = evaluate_internal(np.stack(preds), np.stack(labels),
                               list(PATHOLOGIES))
        # xlsx artifact like the reference's in-training eval
        # (CTCLIPTrainer.py:266-327 writes aurocs_..xlsx); CSV fallback when
        # no Excel engine is installed
        from ..utils import write_table

        write_table(df, self.results_folder / f"mini_eval_step{step}.xlsx")
        self.logger.log(step, mini_eval_mean_auc=float(df["mean_auc"].iloc[0]))
