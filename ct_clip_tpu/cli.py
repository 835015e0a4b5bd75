"""Command-line entry points (reference L6: scripts/run_train.py,
run_zero_shot.py, run_forward_data.py, ct_vocabfine_train.py,
ct_lipro_train.py, ct_lipro_inference.py, text_classifier/{train,infer,eval}
— which are edit-the-source configs; here: one typed config + CLI flags).

Usage:
  python -m ct_clip_tpu.cli train      --data-train ... --reports-train ...
  python -m ct_clip_tpu.cli zero-shot  --data ... --labels ... --ckpt ...
  python -m ct_clip_tpu.cli export-latents ...
  python -m ct_clip_tpu.cli lipro-train / lipro-infer ...
  python -m ct_clip_tpu.cli vocabfine ...
  python -m ct_clip_tpu.cli radbert-train / radbert-infer ...
  python -m ct_clip_tpu.cli bootstrap  --predicted ... --labels ...
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _common_model(args):
    import jax.numpy as jnp

    from .config import CTCLIPConfig
    from .models import CTCLIP

    cfg = CTCLIPConfig()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = CTCLIP(cfg, dtype=dtype)
    return cfg, model


def _load_variables(args, cfg, model):
    if args.ckpt and args.ckpt.endswith(".pt"):
        from .convert.torch_to_jax import load_ctclip_checkpoint

        return load_ctclip_checkpoint(args.ckpt, cfg)
    if args.ckpt:
        from .train.checkpoint import load_variables

        return load_variables(args.ckpt)
    import jax
    import jax.numpy as jnp

    print("[warn] no --ckpt given; random init", file=sys.stderr)
    ids = jnp.zeros((1, 512), jnp.int32)
    video = jnp.zeros((1, cfg.ctvit.num_frames, cfg.ctvit.image_size,
                       cfg.ctvit.image_size, 1))
    return model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids), video,
                      return_loss=False, return_latents=True)


def _tokenizer(args):
    from .data import load_tokenizer

    return load_tokenizer(vocab_path=args.vocab)


def cmd_train(args):
    from .config import TrainConfig
    from .data import CTReportDataset, CTReportDatasetInfer
    from .train import CTClipTrainer

    cfg, model = _common_model(args)
    tok = _tokenizer(args)
    train_ds = CTReportDataset(args.data_train, args.reports_train,
                               args.meta_train)
    valid_ds = None
    if args.data_valid:
        valid_ds = CTReportDatasetInfer(args.data_valid, args.reports_valid,
                                        args.meta_valid, args.labels)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                       num_train_steps=args.steps)
    trainer = CTClipTrainer(model, tok, train_dataset=train_ds,
                            valid_dataset=valid_ds, config=tcfg,
                            results_folder=args.results,
                            num_workers=args.workers)
    if args.resume:
        trainer.load()
    trainer.train()


def cmd_zero_shot(args):
    from .data import CTReportDatasetInfer
    from .inference import run_zero_shot

    cfg, model = _common_model(args)
    variables = _load_variables(args, cfg, model)
    tok = _tokenizer(args)
    ds = CTReportDatasetInfer(args.data, args.reports, args.meta, args.labels)
    out = run_zero_shot(model, variables, tok, ds, args.results,
                        batch_size=args.batch_size, num_workers=args.workers)
    print(f"scored {len(out['accessions'])} volumes -> {args.results}")


def cmd_export_latents(args):
    from .data import CTReportDatasetInfer
    from .inference.latents import export_latents

    cfg, model = _common_model(args)
    variables = _load_variables(args, cfg, model)
    tok = _tokenizer(args)
    ds = CTReportDatasetInfer(args.data, args.reports, args.meta, args.labels)
    export_latents(model, variables, tok, ds, args.results,
                   num_workers=args.workers)


def cmd_bootstrap(args):
    from .config import PATHOLOGIES
    from .evals import bootstrap_report

    predicted = np.load(args.predicted)["data"]
    labels = np.load(args.labels)["data"]
    tables = bootstrap_report(predicted, labels, list(PATHOLOGIES),
                              n_samples=args.samples)
    out = Path(args.results)
    out.mkdir(parents=True, exist_ok=True)
    for name, df in tables.items():
        df.to_csv(out / f"bootstrap_{name}.csv", index=False)
    print(f"wrote bootstrap tables to {out}")


def cmd_vocabfine(args):
    from .data import CTReportDatasetInfer
    from .train.checkpoint import save_variables
    from .train.finetune import train_vocabfine

    cfg, model = _common_model(args)
    variables = _load_variables(args, cfg, model)
    tok = _tokenizer(args)
    ds = CTReportDatasetInfer(args.data, args.reports, args.meta, args.labels)
    variables, history = train_vocabfine(
        model, variables, tok, ds, lr=args.lr, wd=args.wd,
        epochs=args.epochs, warmup_length=args.warmup,
        batch_size=args.batch_size, num_workers=args.workers)
    out = Path(args.results)
    out.mkdir(parents=True, exist_ok=True)
    save_variables(str(out / "vocabfine_ckpt"), variables)
    print(f"final loss {history[-1]['loss']:.6f} -> {out}")


def cmd_lipro_train(args):
    import pickle

    from .data import CTReportDatasetInfer
    from .inference.lipro import train_lipro

    cfg, model = _common_model(args)
    variables = _load_variables(args, cfg, model)
    ds = CTReportDatasetInfer(args.data, args.reports, args.meta, args.labels)
    head, head_params, history = train_lipro(
        model, variables, ds, lr=args.lr, wd=args.wd, epochs=args.epochs,
        batch_size=args.batch_size, num_workers=args.workers)
    out = Path(args.results)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "lipro_head.pkl", "wb") as f:
        pickle.dump({"params": head_params,
                     "num_classes": head.num_classes,
                     "dropout": head.dropout}, f)
    print(f"final loss {history[-1]['loss']:.6f} -> {out}")


def cmd_lipro_infer(args):
    import pickle

    from .data import CTReportDatasetInfer
    from .inference.lipro import evaluate_lipro
    from .train.finetune import LiProHead

    cfg, model = _common_model(args)
    variables = _load_variables(args, cfg, model)
    with open(args.head, "rb") as f:
        saved = pickle.load(f)
    head = LiProHead(num_classes=saved["num_classes"],
                     dropout=saved["dropout"])
    ds = CTReportDatasetInfer(args.data, args.reports, args.meta, args.labels)
    out = evaluate_lipro(model, variables, head, saved["params"], ds,
                         args.results, num_workers=args.workers)
    print(f"scored {len(out['accessions'])} volumes -> {args.results}")


def cmd_retrieval(args):
    from .evals.retrieval import report_to_volume, volume_to_volume

    def load_dir(d):
        names = sorted(Path(d).glob("*.npz"))
        return [n.stem for n in names], np.stack(
            [np.load(n)["arr"] for n in names])

    accs, image = load_dir(Path(args.latents) / "image_latents")
    image = image.reshape(len(accs), -1)
    if args.labels_npz:
        labels = np.load(args.labels_npz)["data"]
        print("volume-to-volume:", volume_to_volume(image, labels))
    text_dir = Path(args.latents) / "text_latents"
    if text_dir.exists():
        _, text = load_dir(text_dir)
        print("report-to-volume:", report_to_volume(text, image))


def cmd_tsne(args):
    from .evals.tsne import tsne_plot

    names = sorted(Path(args.latents).glob("*.npz"))
    lat = np.stack([np.load(n)["arr"].reshape(-1) for n in names])
    labels = (np.load(args.labels_npz)["data"] if args.labels_npz
              else np.zeros((len(lat), 1)))
    emb = tsne_plot(lat, labels, out_path=args.out)
    np.savez(Path(args.out).with_suffix(".npz"), emb=emb)
    print(f"t-SNE embedding ({emb.shape}) -> {args.out}")


def cmd_convert(args):
    """Torch .pt checkpoint -> Orbax variables (one-time migration for users
    of the published CT-CLIP_v2.pt weights)."""
    from .convert.torch_to_jax import load_ctclip_checkpoint
    from .train.checkpoint import save_variables

    cfg, model = _common_model(args)
    variables = load_ctclip_checkpoint(args.pt, cfg)
    save_variables(args.out, variables)
    print(f"converted {args.pt} -> {args.out}")


def cmd_reconstruct(args):
    from .config import CTViTConfig
    from .data.generatect import VideoDataset
    from .models import CTViT
    from .train import reconstruct_dataset
    from .train.checkpoint import load_variables

    import jax
    import jax.numpy as jnp

    cfg = CTViTConfig(with_decoder=True)
    model = CTViT(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.ckpt:
        variables = load_variables(args.ckpt)
    else:
        print("[warn] no --ckpt; random init", file=sys.stderr)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, cfg.num_frames, cfg.image_size,
                                          cfg.image_size, 1)))
    ds = VideoDataset(args.data, num_frames=cfg.num_frames,
                      image_size=cfg.image_size)
    written = reconstruct_dataset(model, variables, ds, args.results,
                                  max_items=args.max_items)
    print(f"wrote {len(written)} reconstructions -> {args.results}")


def cmd_recompress(args):
    """Rewrite a corpus of .nii/.nii.gz as indexed multi-member gzip (still
    valid .nii.gz for any reader) whose members inflate in parallel — a
    one-time preparation that unlocks intra-file parallel decode in
    VolumeLoader (data/nifti._read_bytes; the reference's serial nibabel
    load is scripts/data.py:93-94)."""
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from . import native

    if not native.available() and not native.build():
        sys.exit("native library unavailable and build failed "
                 "(needs g++ + zlib)")
    root = Path(args.data)
    paths = ([root] if root.is_file()
             else sorted(p for pat in ("*.nii.gz", "*.nii")
                         for p in root.rglob(pat)))
    if not paths:
        sys.exit(f"no .nii/.nii.gz under {root}")
    ncpu = os.cpu_count() or 1
    jobs = args.jobs or max(1, ncpu // 2)
    inner = max(1, ncpu // jobs)  # spare cores go into each file's deflate

    def one(p: Path):
        dst = Path(args.out) / p.relative_to(root) if args.out else p
        dst.parent.mkdir(parents=True, exist_ok=True)
        tmp = dst.with_suffix(dst.suffix + ".tmp")
        n = native.recompress(str(p), str(tmp),
                              chunk_bytes=args.chunk_mb << 20,
                              level=args.level, threads=inner)
        os.replace(tmp, dst)  # atomic: never leaves a half-written volume
        return p, n

    t0 = time.time()
    total = 0
    with ThreadPoolExecutor(max_workers=jobs) as pool:
        for p, n in pool.map(one, paths):
            total += n
            if args.verbose:
                print(f"  {p} ({n / 1e6:.0f} MB raw)")
    dt = time.time() - t0
    print(f"recompressed {len(paths)} volumes ({total / 1e9:.2f} GB raw) "
          f"in {dt:.1f}s ({total / dt / 1e6:.0f} MB/s)")


def cmd_radbert_train(args):
    from .config import RadBertConfig
    from .models import RadBertClassifier
    from .train.text_classifier import (ReportClassificationDataset,
                                        TextClassifierTrainer)

    tok = _tokenizer(args)
    cfg = RadBertConfig(vocab_size=tok.vocab_size)
    trainer = TextClassifierTrainer(RadBertClassifier(cfg), tok, lr=args.lr,
                                    batch_size=args.batch_size,
                                    scheduler=args.scheduler)
    train_ds = ReportClassificationDataset(args.reports,
                                           augment_prob=args.augment)
    valid_ds = (ReportClassificationDataset(args.reports_valid)
                if args.reports_valid else None)
    result = trainer.train(train_ds, valid_ds, epochs=args.epochs)
    if args.out:
        import pickle
        with open(args.out, "wb") as f:
            pickle.dump({"params": trainer.params}, f)
    print(f"best loss {result['best_loss']:.4f}")


def _radbert_from_ckpt(args):
    import pickle

    from .config import RadBertConfig
    from .models import RadBertClassifier
    from .train.text_classifier import TextClassifierTrainer

    tok = _tokenizer(args)
    cfg = RadBertConfig(vocab_size=tok.vocab_size)
    trainer = TextClassifierTrainer(RadBertClassifier(cfg), tok)
    with open(args.head, "rb") as f:
        saved = pickle.load(f)
    # initialize jitted fns, then install trained params
    from .train.text_classifier import ReportClassificationDataset
    ds = ReportClassificationDataset(args.reports)
    batch = next(ds.batches(tok, 1, shuffle=False))
    trainer._init(batch)
    trainer.params = saved["params"]
    return trainer, ds


def cmd_radbert_infer(args):
    trainer, ds = _radbert_from_ckpt(args)
    trainer.infer_to_csv(ds, args.out)
    print(f"wrote inferred labels -> {args.out}")


def cmd_radbert_eval(args):
    import json

    from .train.text_classifier import multilabel_report

    trainer, ds = _radbert_from_ckpt(args)
    probs, labels = trainer.predict_dataset(ds)
    rep = multilabel_report(labels, probs)
    Path(args.out).write_text(json.dumps(rep["report"], indent=2))
    print(f"wrote classification report -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser("ct_clip_tpu")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--vocab", help="CXR-BERT vocab.txt path")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--data-train", required=True)
    t.add_argument("--reports-train", required=True)
    t.add_argument("--meta-train", required=True)
    t.add_argument("--data-valid"); t.add_argument("--reports-valid")
    t.add_argument("--meta-valid"); t.add_argument("--labels")
    t.add_argument("--results", default="results")
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--lr", type=float, default=1.25e-6)
    t.add_argument("--steps", type=int, default=100001)
    t.add_argument("--workers", type=int, default=8)
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    z = sub.add_parser("zero-shot")
    z.add_argument("--data", required=True); z.add_argument("--reports", required=True)
    z.add_argument("--meta", required=True); z.add_argument("--labels", required=True)
    z.add_argument("--ckpt"); z.add_argument("--results", default="inference_zeroshot")
    z.add_argument("--batch-size", type=int, default=4)
    z.add_argument("--workers", type=int, default=8)
    z.set_defaults(fn=cmd_zero_shot)

    e = sub.add_parser("export-latents")
    for name in ["--data", "--reports", "--meta", "--labels"]:
        e.add_argument(name, required=True)
    e.add_argument("--ckpt"); e.add_argument("--results", default="latents")
    e.add_argument("--workers", type=int, default=8)
    e.set_defaults(fn=cmd_export_latents)

    b = sub.add_parser("bootstrap")
    b.add_argument("--predicted", required=True)
    b.add_argument("--labels", required=True)
    b.add_argument("--results", default="bootstrap")
    b.add_argument("--samples", type=int, default=1000)
    b.set_defaults(fn=cmd_bootstrap)

    vf = sub.add_parser("vocabfine")
    for name in ["--data", "--reports", "--meta", "--labels"]:
        vf.add_argument(name, required=True)
    vf.add_argument("--ckpt"); vf.add_argument("--results", default="vocabfine")
    vf.add_argument("--lr", type=float, default=1e-5)
    vf.add_argument("--wd", type=float, default=0.1)
    vf.add_argument("--warmup", type=int, default=500)
    vf.add_argument("--epochs", type=int, default=1)
    vf.add_argument("--batch-size", type=int, default=1)
    vf.add_argument("--workers", type=int, default=8)
    vf.set_defaults(fn=cmd_vocabfine)

    lt = sub.add_parser("lipro-train")
    for name in ["--data", "--reports", "--meta", "--labels"]:
        lt.add_argument(name, required=True)
    lt.add_argument("--ckpt"); lt.add_argument("--results", default="lipro")
    lt.add_argument("--lr", type=float, default=1e-3)
    lt.add_argument("--wd", type=float, default=0.01)
    lt.add_argument("--epochs", type=int, default=10)
    lt.add_argument("--batch-size", type=int, default=8)
    lt.add_argument("--workers", type=int, default=8)
    lt.set_defaults(fn=cmd_lipro_train)

    li = sub.add_parser("lipro-infer")
    for name in ["--data", "--reports", "--meta", "--labels", "--head"]:
        li.add_argument(name, required=True)
    li.add_argument("--ckpt"); li.add_argument("--results", default="lipro_infer")
    li.add_argument("--workers", type=int, default=8)
    li.set_defaults(fn=cmd_lipro_infer)

    rv = sub.add_parser("retrieval")
    rv.add_argument("--latents", required=True,
                    help="dir with image_latents/ and text_latents/")
    rv.add_argument("--labels-npz")
    rv.set_defaults(fn=cmd_retrieval)

    ts = sub.add_parser("tsne")
    ts.add_argument("--latents", required=True, help="dir of latent .npz files")
    ts.add_argument("--labels-npz")
    ts.add_argument("--out", default="tsne.png")
    ts.set_defaults(fn=cmd_tsne)

    cv = sub.add_parser("convert")
    cv.add_argument("--pt", required=True, help="torch .pt checkpoint")
    cv.add_argument("--out", required=True, help="orbax output path")
    cv.set_defaults(fn=cmd_convert)

    rc = sub.add_parser("reconstruct")
    rc.add_argument("--data", required=True)
    rc.add_argument("--ckpt")
    rc.add_argument("--results", default="reconstructions")
    rc.add_argument("--max-items", type=int)
    rc.set_defaults(fn=cmd_reconstruct)

    rz = sub.add_parser("recompress",
                        help="rewrite .nii.gz corpus as indexed gzip "
                             "(parallel-inflatable; still valid .nii.gz)")
    rz.add_argument("--data", required=True, help="file or directory tree")
    rz.add_argument("--out", help="output root (default: rewrite in place)")
    rz.add_argument("--jobs", type=int, help="concurrent files "
                                             "(default: cores/2)")
    rz.add_argument("--chunk-mb", type=int, default=4,
                    help="uncompressed bytes per gzip member")
    rz.add_argument("--level", type=int, default=6, help="deflate level")
    rz.add_argument("--verbose", action="store_true")
    rz.set_defaults(fn=cmd_recompress)

    r = sub.add_parser("radbert-train")
    r.add_argument("--reports", required=True)
    r.add_argument("--reports-valid")
    r.add_argument("--lr", type=float, default=2e-5)
    r.add_argument("--batch-size", type=int, default=32)
    r.add_argument("--epochs", type=int, default=10)
    r.add_argument("--augment", type=float, default=0.0)
    r.add_argument("--scheduler", choices=["cawr", "rlop"], default=None,
                   help="per-epoch LR schedule (text_classifier/train.py:"
                        "126-140)")
    r.add_argument("--out", help="pickle path for trained params")
    r.set_defaults(fn=cmd_radbert_train)

    ri = sub.add_parser("radbert-infer")
    ri.add_argument("--reports", required=True)
    ri.add_argument("--head", required=True)
    ri.add_argument("--out", default="inferred.csv")
    ri.set_defaults(fn=cmd_radbert_infer)

    re_ = sub.add_parser("radbert-eval")
    re_.add_argument("--reports", required=True)
    re_.add_argument("--head", required=True)
    re_.add_argument("--out", default="radbert_report.json")
    re_.set_defaults(fn=cmd_radbert_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
