"""RadBERT multilabel report classifier training/inference/eval.

Parity with text_classifier/: RadBertClassifier (classifier.py:5-18) =
RoBERTa pooler -> Linear(768 -> 18); CTDataset CSV reports with optional
sentence-shuffle augmentation (dataset.py:21-63, augmentation.py:6-52);
ModelTrainer epoch loop with BCEWithLogits, sigmoid @ 0.5, macro/micro F1 +
accuracy per epoch, best-loss checkpointing, early stopping
(model_trainer.py:27-220); AdamW 2e-5 with no-decay groups for bias/LN
params (train.py:97-140); inference to CSV (infer.py:94-154); offline
multilabel metrics (eval.py:8-66).
"""
from __future__ import annotations

import csv
import random
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PATHOLOGIES, RadBertConfig
from ..models.bert import RadBertClassifier
from .finetune import bce_with_logits

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def sentence_shuffle(text: str, rng: random.Random, prob: float = 0.5) -> str:
    """TextAugment equivalent (augmentation.py:6-52): with prob, shuffle the
    sentence order."""
    if rng.random() >= prob:
        return text
    sents = [s for s in _SENT_SPLIT.split(text) if s]
    rng.shuffle(sents)
    return " ".join(sents)


class ReportClassificationDataset:
    """CSV of report text + 18 label columns (text_classifier/dataset.py)."""

    def __init__(self, csv_path: str, text_column: str = "report",
                 pathologies: Sequence[str] = PATHOLOGIES,
                 augment_prob: float = 0.0, seed: int = 0):
        self.rows: List[Dict] = []
        self.pathologies = list(pathologies)
        with open(csv_path, newline="", encoding="utf-8") as f:
            for row in csv.DictReader(f):
                text = row.get(text_column) or row.get("Findings_EN", "")
                labels = np.asarray([float(row.get(p, 0) or 0)
                                     for p in self.pathologies], np.float32)
                self.rows.append({"text": str(text), "labels": labels})
        self.augment_prob = augment_prob
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.rows)

    def batches(self, tokenizer, batch_size: int, max_length: int = 512,
                shuffle: bool = True, augment: bool = False,
                seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self.rows)))
        if shuffle:
            random.Random(seed).shuffle(order)
        for i in range(0, len(order), batch_size):
            chunk = [self.rows[j] for j in order[i: i + batch_size]]
            texts = [sentence_shuffle(r["text"], self.rng, self.augment_prob)
                     if augment else r["text"] for r in chunk]
            enc = tokenizer(texts, padding="max_length", truncation=True,
                            max_length=max_length)
            yield {"input_ids": np.asarray(enc["input_ids"]),
                   "attention_mask": np.asarray(enc["attention_mask"]),
                   "labels": np.stack([r["labels"] for r in chunk])}


def no_decay_mask(params):
    """AdamW no-decay groups for bias / LayerNorm params
    (text_classifier/train.py:104-113)."""
    def is_decay(path, _leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        return not any(t in name for t in ("bias", "ln_", "_ln", "layernorm"))
    return jax.tree_util.tree_map_with_path(is_decay, params)


@dataclass
class TextClassifierTrainer:
    model: RadBertClassifier
    tokenizer: object
    lr: float = 2e-5
    wd: float = 0.01
    batch_size: int = 32
    max_epochs: int = 100
    early_stop_patience: int = 100
    threshold: float = 0.5
    seed: int = 0
    # optional per-epoch LR schedule (text_classifier/train.py:126-140;
    # stepped once per epoch like model_trainer.py:66-72):
    #   "cawr" — CosineAnnealingWarmupRestarts over epochs
    #   "rlop" — ReduceLROnPlateau on the monitored (valid) loss
    scheduler: Optional[str] = None
    cawr_first_cycle: int = 200   # train.py:115 cycle_step
    cawr_warmup: int = 50         # train.py:114 w_steps
    cawr_min_lr: float = 2e-7     # train.py:122
    rlop_factor: float = 0.1      # train.py:125
    rlop_patience: int = 25
    rlop_min_lr: float = 2e-6

    params: Optional[Dict] = None
    opt_state: Optional[Dict] = None
    history: List[Dict] = field(default_factory=list)

    def __post_init__(self):
        if self.scheduler not in (None, "cawr", "rlop"):
            raise ValueError(f"unknown scheduler {self.scheduler!r}")
        # unit-lr AdamW; the traced per-epoch lr scales the updates, which is
        # exactly optax.adamw(lr) (wd is inside the scaled term there too)
        self.tx = optax.adamw(1.0, weight_decay=self.wd, mask=no_decay_mask)
        self._step = None
        self._rlop_lr = self.lr
        self._rlop_best = float("inf")
        self._rlop_bad = 0

    def _epoch_lr(self, epoch: int) -> float:
        """LR in effect for this epoch (schedulers advance per epoch)."""
        if self.scheduler == "cawr":
            from .optimizer import cosine_annealing_warmup_restarts

            return float(cosine_annealing_warmup_restarts(
                first_cycle_steps=self.cawr_first_cycle, max_lr=self.lr,
                min_lr=self.cawr_min_lr,
                warmup_steps=self.cawr_warmup)(epoch))
        if self.scheduler == "rlop":
            return self._rlop_lr
        return self.lr

    def _rlop_step(self, monitored: float) -> None:
        """torch ReduceLROnPlateau(mode='min', factor, patience, min_lr)
        semantics with the default rel threshold 1e-4."""
        if monitored < self._rlop_best * (1.0 - 1e-4):
            self._rlop_best, self._rlop_bad = monitored, 0
        else:
            self._rlop_bad += 1
            if self._rlop_bad > self.rlop_patience:
                self._rlop_lr = max(self._rlop_lr * self.rlop_factor,
                                    self.rlop_min_lr)
                self._rlop_bad = 0

    def _init(self, batch):
        self.params = self.model.init(
            jax.random.PRNGKey(self.seed), jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]))["params"]
        self.opt_state = self.tx.init(self.params)

        def step(params, opt_state, ids, mask, labels, rng, lr):
            def loss_fn(p):
                logits = self.model.apply({"params": p}, ids, mask,
                                          deterministic=False,
                                          rngs={"dropout": rng})
                return bce_with_logits(logits, labels)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = jax.jit(step)
        self._predict = jax.jit(
            lambda p, ids, mask: jax.nn.sigmoid(
                self.model.apply({"params": p}, ids, mask)))

    def train(self, train_ds: ReportClassificationDataset,
              valid_ds: Optional[ReportClassificationDataset] = None,
              epochs: Optional[int] = None) -> Dict:
        from sklearn.metrics import accuracy_score, f1_score

        best_loss, best_params, bad_epochs = float("inf"), None, 0
        epochs = epochs or self.max_epochs
        for epoch in range(epochs):
            losses = []
            lr_now = jnp.asarray(self._epoch_lr(epoch), jnp.float32)
            for bi, batch in enumerate(train_ds.batches(
                    self.tokenizer, self.batch_size, shuffle=True,
                    augment=train_ds.augment_prob > 0, seed=self.seed + epoch)):
                if self.params is None:
                    self._init(batch)
                rng = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                         epoch * 100000 + bi)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(batch["input_ids"]),
                    jnp.asarray(batch["attention_mask"]),
                    jnp.asarray(batch["labels"]), rng, lr_now)
                losses.append(float(loss))

            record = {"epoch": epoch, "train_loss": float(np.mean(losses)),
                      "lr": float(lr_now)}
            if valid_ds is not None and len(valid_ds):
                probs, labels = self.predict_dataset(valid_ds)
                preds = (probs >= self.threshold).astype(int)
                record.update(
                    valid_loss=float(bce_with_logits(
                        jnp.asarray(np.log(np.clip(probs, 1e-7, 1 - 1e-7) /
                                           np.clip(1 - probs, 1e-7, 1))),
                        jnp.asarray(labels))),
                    f1_macro=float(f1_score(labels, preds, average="macro",
                                            zero_division=0)),
                    f1_micro=float(f1_score(labels, preds, average="micro",
                                            zero_division=0)),
                    accuracy=float(accuracy_score(labels.flatten(),
                                                  preds.flatten())))
                monitored = record["valid_loss"]
            else:
                monitored = record["train_loss"]
            self.history.append(record)
            if self.scheduler == "rlop":  # stepped on the epoch's test loss
                self._rlop_step(monitored)  # (model_trainer.py:70-72)

            if monitored < best_loss:
                best_loss, bad_epochs = monitored, 0
                best_params = jax.tree.map(np.asarray, self.params)
            else:
                bad_epochs += 1
                if bad_epochs >= self.early_stop_patience:
                    break
        if best_params is not None:
            self.params = best_params
        return {"best_loss": best_loss, "history": self.history}

    def predict_dataset(self, ds: ReportClassificationDataset):
        probs, labels = [], []
        for batch in ds.batches(self.tokenizer, self.batch_size,
                                shuffle=False):
            p = self._predict(self.params, jnp.asarray(batch["input_ids"]),
                              jnp.asarray(batch["attention_mask"]))
            probs.append(np.asarray(p))
            labels.append(batch["labels"])
        return np.concatenate(probs), np.concatenate(labels)

    def infer_to_csv(self, ds: ReportClassificationDataset, out_csv: str):
        """text_classifier/infer.py:94-154: write inferred labels CSV."""
        probs, _ = self.predict_dataset(ds)
        preds = (probs >= self.threshold).astype(int)
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["report"] + list(ds.pathologies))
            for row, pred in zip(ds.rows, preds):
                w.writerow([row["text"]] + pred.tolist())


def multilabel_report(y_true: np.ndarray, y_prob: np.ndarray,
                      pathologies: Sequence[str] = PATHOLOGIES,
                      threshold: float = 0.5) -> Dict:
    """text_classifier/eval.py:8-66: confusion matrices + per-class report."""
    from sklearn.metrics import (classification_report,
                                 multilabel_confusion_matrix)
    y_pred = (y_prob >= threshold).astype(int)
    return {
        "confusion": multilabel_confusion_matrix(y_true, y_pred),
        "report": classification_report(y_true, y_pred,
                                        target_names=list(pathologies),
                                        zero_division=0, output_dict=True),
    }
