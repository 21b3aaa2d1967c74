"""Audio fine-tune evaluation CLI.

Counterpart of ``python DT/FT_audio_task.py --SEED --IS_BASE --IS_CAPTIONED
--DATASET --FOLD --EPOCHS --LR --BATCH_SIZE`` (reference
DT/FT_audio_task.py): exported AST tower + projection head + fresh classifier
(:129-145), fold-based train/test split (ESC-50 5 folds, UrbanSound8K 10
folds, :51-127), MultiStep LR schedule (:292), accuracy into METRIC_AUD.json.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.data.audio import extract_fbank
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.common import (
    AudioClassifier, finetune_classifier, init_from_export,
)
from synergy_tpu.eval.data import load_audio_dataset
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import set_seed, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Audio fine-tune evaluation")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--DATASET", type=str, default="esc50",
                   choices=["esc50", "urbansound8k"])
    p.add_argument("--FOLD", type=int, default=1)
    p.add_argument("--EPOCHS", type=int, default=3)
    p.add_argument("--LR", type=float, default=1e-4)
    p.add_argument("--BATCH_SIZE", type=int, default=16)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--metric_path", type=str,
                   default=metrics_io.METRIC_FILES["ft_audio"])
    p.add_argument("--tiny", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    set_seed(args.SEED)
    cfg = CLIPConfig.tiny() if args.tiny else (
        CLIPConfig.base() if args.IS_BASE else CLIPConfig.large())

    ds = load_audio_dataset(args.DATASET, args.data_root, seed=args.SEED)
    test_mask = ds.folds == args.FOLD
    fbanks = np.stack([
        np.asarray(extract_fbank(w))[: cfg.audio.max_length,
                                     : cfg.audio.num_mel_bins]
        for w in ds.waves])
    train_x, train_y = fbanks[~test_mask], ds.labels[~test_mask]
    test_x, test_y = fbanks[test_mask], ds.labels[test_mask]

    model = AudioClassifier(cfg.audio, len(ds.label_names), cfg.projection_dim)
    sample = jnp.zeros((1, cfg.audio.max_length, cfg.audio.num_mel_bins))
    params = model.init(jax.random.PRNGKey(args.SEED), sample)["params"]
    tag = size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params = init_from_export(params, args.ckpt_dir, tag, "audio")

    metrics = finetune_classifier(
        model, params, (train_x,), train_y, (test_x,), test_y,
        epochs=args.EPOCHS, batch_size=args.BATCH_SIZE, lr=args.LR,
        seed=args.SEED,
        schedule_milestones=tuple(range(2, args.EPOCHS, 2)) or None,
        log_prefix=f"[ft_audio:{args.DATASET}]")
    acc = metrics["accuracy"]
    print(f"[ft_audio] {args.DATASET} fold={args.FOLD} accuracy={acc:.2f}"
          + (" (synthetic data)" if ds.synthetic else ""))
    metrics_io.save_metric(args.metric_path, tag,
                           f"{args.DATASET}_fold{args.FOLD}", args.SEED,
                           {"accuracy": acc})
    return metrics


if __name__ == "__main__":
    main()
