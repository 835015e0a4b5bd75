"""CLI smoke tests over tiny synthetic data (the reference's L6 entry-script
surface, reshaped into `python -m ct_clip_tpu.cli <subcommand>`)."""
import csv
import json
import pickle

import numpy as np
import pytest

from ct_clip_tpu.cli import main
from ct_clip_tpu.config import PATHOLOGIES

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "pleural", "effusion",
         "is", "present", "not", "no", "lung", "nodule", "findings", "normal",
         "chest", "ct", "."]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_cli_bootstrap(tmp_path):
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 2, (30, 18))
    pred = np.clip(labels + rng.randn(30, 18) * 0.3, 0, 1)
    np.savez(tmp_path / "labels.npz", data=labels)
    np.savez(tmp_path / "pred.npz", data=pred)
    main(["bootstrap", "--predicted", str(tmp_path / "pred.npz"),
          "--labels", str(tmp_path / "labels.npz"),
          "--results", str(tmp_path / "boot"), "--samples", "10"])
    out = {p.name for p in (tmp_path / "boot").glob("*.csv")}
    assert "bootstrap_auroc.csv" in out
    assert "bootstrap_f1.csv" in out


def test_cli_retrieval_and_tsne(tmp_path, capsys):
    rng = np.random.RandomState(1)
    img_dir = tmp_path / "latents" / "image_latents"
    txt_dir = tmp_path / "latents" / "text_latents"
    img_dir.mkdir(parents=True)
    txt_dir.mkdir(parents=True)
    n = 12
    for i in range(n):
        np.savez(img_dir / f"acc{i:02d}.npz", arr=rng.randn(8).astype(np.float32))
        np.savez(txt_dir / f"acc{i:02d}.npz", arr=rng.randn(8).astype(np.float32))
    labels = rng.randint(0, 2, (n, 18))
    np.savez(tmp_path / "labels.npz", data=labels)

    main(["retrieval", "--latents", str(tmp_path / "latents"),
          "--labels-npz", str(tmp_path / "labels.npz")])
    cap = capsys.readouterr().out
    assert "volume-to-volume" in cap and "report-to-volume" in cap

    main(["tsne", "--latents", str(img_dir),
          "--labels-npz", str(tmp_path / "labels.npz"),
          "--out", str(tmp_path / "tsne.png")])
    emb = np.load(tmp_path / "tsne.npz")["emb"]
    assert emb.shape == (n, 2)


def _write_reports_csv(path, n=8, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, ["report"] + list(PATHOLOGIES))
        w.writeheader()
        for i in range(n):
            text = ("pleural effusion is present." if i % 2
                    else "normal chest ct. no lung nodule.")
            row = {"report": text}
            row.update({p: int(rng.rand() < 0.4) for p in PATHOLOGIES})
            w.writerow(row)


def test_cli_radbert_train_infer_eval(tmp_path, vocab_file, monkeypatch):
    """Tiny RadBERT: train 1 epoch -> pickle -> infer csv -> eval json."""
    import ct_clip_tpu.cli as cli
    from ct_clip_tpu.config import RadBertConfig

    # shrink the model for test speed
    orig = RadBertConfig

    def tiny_cfg(vocab_size):
        return orig(vocab_size=vocab_size, hidden_size=16,
                    num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=32)

    monkeypatch.setattr("ct_clip_tpu.config.RadBertConfig", tiny_cfg)
    reports = tmp_path / "reports.csv"
    _write_reports_csv(reports)
    head = tmp_path / "radbert.pkl"
    main(["--vocab", vocab_file, "radbert-train", "--reports", str(reports),
          "--epochs", "1", "--batch-size", "4", "--out", str(head)])
    assert head.exists()
    with open(head, "rb") as f:
        assert "params" in pickle.load(f)

    out_csv = tmp_path / "inferred.csv"
    main(["--vocab", vocab_file, "radbert-infer", "--reports", str(reports),
          "--head", str(head), "--out", str(out_csv)])
    rows = list(csv.DictReader(open(out_csv)))
    assert len(rows) == 8 and set(PATHOLOGIES) <= set(rows[0])

    out_json = tmp_path / "report.json"
    main(["--vocab", vocab_file, "radbert-eval", "--reports", str(reports),
          "--head", str(head), "--out", str(out_json)])
    rep = json.loads(out_json.read_text())
    assert PATHOLOGIES[0] in rep
