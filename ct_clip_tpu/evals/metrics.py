"""Evaluation metrics library.

Parity with scripts/eval.py (evaluate_internal per-class ROC-AUC dataframe
:160-203, plot_roc/plot_pr :58-158, Youden-J operating point :104-113,
bootstrap + compute_cis percentile CIs :268-333) and the
scripts/bootstrap_values.py driver (per-class ROC-distance threshold search
:22-52, 1000 bootstrap iterations -> AUROC/F1/acc/precision tables
:105-167).  numpy/sklearn only — no device code.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                             precision_recall_curve, roc_auc_score, roc_curve)


def choose_operating_point(fpr: np.ndarray, tpr: np.ndarray,
                           thresholds: np.ndarray) -> Tuple[float, float, float]:
    """Youden-J maximizing threshold (eval.py:104-113): max(tpr - fpr)."""
    j = tpr - fpr
    idx = int(np.argmax(j))
    return float(thresholds[idx]), float(fpr[idx]), float(tpr[idx])


def roc_distance_threshold(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """bootstrap_values.py:22-52: threshold minimizing distance to the (0,1)
    ROC corner."""
    fpr, tpr, thr = roc_curve(y_true, y_score)
    dist = np.sqrt((1 - tpr) ** 2 + fpr ** 2)
    return float(thr[int(np.argmin(dist))])


def plot_roc(y_true: np.ndarray, y_score: np.ndarray, name: str,
             plot_dir: Optional[str] = None) -> float:
    """ROC curve plot + AUC (eval.py:58-113).  Plot is skipped when the
    class is degenerate or plotting is unavailable."""
    if len(np.unique(y_true)) < 2:
        return float("nan")
    auc = roc_auc_score(y_true, y_score)
    if plot_dir is not None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fpr, tpr, _ = roc_curve(y_true, y_score)
            fig, ax = plt.subplots(figsize=(5, 5))
            ax.plot(fpr, tpr, label=f"AUC {auc:.3f}")
            ax.plot([0, 1], [0, 1], "k--", lw=0.5)
            ax.set_xlabel("FPR"); ax.set_ylabel("TPR")
            ax.set_title(name); ax.legend()
            fig.savefig(Path(plot_dir) / f"roc_{name.replace(' ', '_')}.png",
                        dpi=100)
            plt.close(fig)
        except Exception:
            pass
    return float(auc)


def plot_pr(y_true: np.ndarray, y_score: np.ndarray, name: str,
            plot_dir: Optional[str] = None) -> None:
    """Precision-recall curve plot (eval.py:116-158)."""
    if plot_dir is None or len(np.unique(y_true)) < 2:
        return
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        prec, rec, _ = precision_recall_curve(y_true, y_score)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(rec, prec)
        ax.set_xlabel("Recall"); ax.set_ylabel("Precision"); ax.set_title(name)
        fig.savefig(Path(plot_dir) / f"pr_{name.replace(' ', '_')}.png", dpi=100)
        plt.close(fig)
    except Exception:
        pass


def evaluate_internal(predicted: np.ndarray, real: np.ndarray,
                      pathologies: Sequence[str],
                      plot_dir: Optional[str] = None) -> pd.DataFrame:
    """Per-class AUROC dataframe (eval.py:160-203): one row, one column per
    '{pathology}_auc' plus mean."""
    aucs = {}
    for i, name in enumerate(pathologies):
        auc = plot_roc(real[:, i], predicted[:, i], name, plot_dir)
        plot_pr(real[:, i], predicted[:, i], name, plot_dir)
        aucs[f"{name}_auc"] = [auc]
    vals = [v[0] for v in aucs.values() if not np.isnan(v[0])]
    aucs["mean_auc"] = [float(np.mean(vals)) if vals else float("nan")]
    return pd.DataFrame(aucs)


def evaluate_external(predicted: np.ndarray, real: np.ndarray,
                      pathologies: Sequence[str],
                      label_map: Dict[str, str],
                      external_pathologies: Sequence[str],
                      plot_dir: Optional[str] = None) -> pd.DataFrame:
    """External-dataset eval with label remapping (eval.py:206-265): score
    columns are remapped through `label_map` onto the external label set."""
    aucs = {}
    ext_index = {name: i for i, name in enumerate(external_pathologies)}
    for i, name in enumerate(pathologies):
        mapped = label_map.get(name)
        if mapped is None or mapped not in ext_index:
            continue
        j = ext_index[mapped]
        auc = plot_roc(real[:, j], predicted[:, i], mapped, plot_dir)
        aucs[f"{mapped}_auc"] = [auc]
    vals = [v[0] for v in aucs.values() if not np.isnan(v[0])]
    aucs["mean_auc"] = [float(np.mean(vals)) if vals else float("nan")]
    return pd.DataFrame(aucs)


def bootstrap_metric(y_true: np.ndarray, y_score: np.ndarray, metric,
                     n_samples: int = 1000, seed: int = 97) -> np.ndarray:
    """Percentile bootstrap of a metric (eval.py:268-311)."""
    rng = np.random.RandomState(seed)
    n = len(y_true)
    out = []
    for _ in range(n_samples):
        idx = rng.randint(0, n, n)
        try:
            out.append(metric(y_true[idx], y_score[idx]))
        except ValueError:
            continue
    return np.asarray(out)


def compute_cis(samples: np.ndarray, alpha: float = 0.05) -> Tuple[float, float, float]:
    """(lower, mid, upper) percentile CI (eval.py:313-333)."""
    lower = float(np.percentile(samples, 100 * alpha / 2))
    upper = float(np.percentile(samples, 100 * (1 - alpha / 2)))
    return lower, float(np.mean(samples)), upper


def bootstrap_report(predicted: np.ndarray, real: np.ndarray,
                     pathologies: Sequence[str], n_samples: int = 1000,
                     seed: int = 97) -> Dict[str, pd.DataFrame]:
    """bootstrap_values.py:105-167: per-class threshold at min ROC distance,
    then bootstrap AUROC / weighted-F1 / accuracy / precision with CIs."""
    thresholds = {}
    tables: Dict[str, List] = {"auroc": [], "f1": [], "accuracy": [], "precision": []}
    for i, name in enumerate(pathologies):
        y, s = real[:, i], predicted[:, i]
        if len(np.unique(y)) < 2:
            for key in tables:
                tables[key].append((name, np.nan, np.nan, np.nan))
            continue
        thr = roc_distance_threshold(y, s)
        thresholds[name] = thr
        yhat = (s >= thr).astype(int)

        metrics = {
            "auroc": lambda yt, ys: roc_auc_score(yt, ys),
            "f1": lambda yt, ys: f1_score(yt, (ys >= thr).astype(int),
                                          average="weighted"),
            "accuracy": lambda yt, ys: accuracy_score(yt, (ys >= thr).astype(int)),
            "precision": lambda yt, ys: precision_score(
                yt, (ys >= thr).astype(int), zero_division=0),
        }
        for key, fn in metrics.items():
            samples = bootstrap_metric(y, s, fn, n_samples, seed)
            lo, mid, hi = compute_cis(samples)
            tables[key].append((name, lo, mid, hi))

    return {key: pd.DataFrame(rows, columns=["pathology", "ci_lower", "mean",
                                             "ci_upper"])
            for key, rows in tables.items()}
