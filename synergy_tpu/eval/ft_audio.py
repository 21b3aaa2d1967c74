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
from synergy_tpu.data.audio import (
    FRAME_LENGTH, HOP_LENGTH, audio_augment, extract_fbank,
    log_mel_fbank_ragged,
)
from synergy_tpu.eval import metrics_io
from synergy_tpu.eval.common import (
    AudioClassifier, finetune_classifier, init_from_export,
)
from synergy_tpu.eval.data import load_audio_dataset
from synergy_tpu.train.checkpoint import size_tag
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool


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
    p.add_argument("--augment", type=str2bool, default=True,
                   help="train-fold waveform augmentation, re-drawn every "
                        "epoch (reference FT_audio_task.py:75-82: "
                        "audio_augment(noise 0.001, shift 0.1, stretch 0.15, "
                        "shuffle, apply 0.333); eval folds are clean)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    set_seed(args.SEED)
    cfg = CLIPConfig.tiny() if args.tiny else (
        CLIPConfig.base() if args.IS_BASE else CLIPConfig.large())

    ds = load_audio_dataset(args.DATASET, args.data_root, seed=args.SEED)
    test_mask = ds.folds == args.FOLD

    def fbank_of(w):
        return np.asarray(extract_fbank(w))[: cfg.audio.max_length,
                                            : cfg.audio.num_mel_bins]

    test_x = np.stack([fbank_of(w) for w, m in zip(ds.waves, test_mask) if m])
    test_y = ds.labels[test_mask]
    train_y = ds.labels[~test_mask]
    host_batch_fn = None
    if args.augment:
        # keep raw train waveforms; augment + fbank per batch so each epoch
        # sees fresh augmentations, like the reference Dataset __getitem__
        train_waves = np.empty(int((~test_mask).sum()), dtype=object)
        for i, w in enumerate(w for w, m in zip(ds.waves, test_mask) if not m):
            train_waves[i] = np.asarray(w, np.float32)
        train_x = (train_waves,)
        # fixed waveform width: samples that fill max_length fbank frames
        # (frames past that are truncated by the extractor anyway)
        n_fixed = FRAME_LENGTH + (cfg.audio.max_length - 1) * HOP_LENGTH

        def host_batch_fn(arrays, rng):
            """Augment on host (reference params), fbank on device in one
            batched ragged call (no per-length recompiles)."""
            padded = np.zeros((len(arrays[0]), n_fixed), np.float32)
            lengths = np.zeros(len(arrays[0]), np.int32)
            for i, w in enumerate(arrays[0]):
                aug = audio_augment(
                    w, sr=16000, noise_rate=0.001, shift_rate=0.1,
                    stretch_rate=0.15, is_shuffle=True, apply_rate=0.333,
                    rng=rng)[:n_fixed]
                padded[i, : len(aug)] = aug
                lengths[i] = len(aug)
            fb = log_mel_fbank_ragged(jnp.asarray(padded),
                                      jnp.asarray(lengths),
                                      max_frames=cfg.audio.max_length)
            return (fb[..., : cfg.audio.num_mel_bins],)
    else:
        train_x = (np.stack([fbank_of(w) for w, m in zip(ds.waves, test_mask)
                             if not m]),)

    model = AudioClassifier(cfg.audio, len(ds.label_names), cfg.projection_dim)
    sample = jnp.zeros((1, cfg.audio.max_length, cfg.audio.num_mel_bins))
    params = jax.jit(model.init)(jax.random.PRNGKey(args.SEED), sample)["params"]
    tag = size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params, weights_prov = init_from_export(params, args.ckpt_dir, tag,
                                            "audio")

    metrics = finetune_classifier(
        model, params, train_x, train_y, (test_x,), test_y,
        epochs=args.EPOCHS, batch_size=args.BATCH_SIZE, lr=args.LR,
        seed=args.SEED, host_batch_fn=host_batch_fn,
        schedule_milestones=tuple(range(2, args.EPOCHS, 2)) or None,
        log_prefix=f"[ft_audio:{args.DATASET}]")
    acc = metrics["accuracy"]
    print(f"[ft_audio] {args.DATASET} fold={args.FOLD} accuracy={acc:.2f}"
          + (" (synthetic data)" if ds.synthetic else ""))
    metrics_io.save_metric(
        args.metric_path, tag, f"{args.DATASET}_fold{args.FOLD}", args.SEED,
        {"accuracy": acc},
        provenance=f"weights={weights_prov}; "
                   f"data={'synthetic' if ds.synthetic else 'real'}")
    return metrics


if __name__ == "__main__":
    main()
